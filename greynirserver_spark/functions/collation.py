"""Icelandic locale collation — the reference's people-list sort.

The reference sorts person names with ``locale.strxfrm`` under the
``is_IS`` locale (routes/people.py:96-104), which orders the Icelandic
alphabet

    a á b c d ð e é f g h i í j k l m n o ó p q r s t u ú v w x y ý þ æ ö

— accented vowels AFTER their base letter, ð after d, and þ/æ/ö at the
end (plain byte/UTF-8 order gets every one of those wrong: 'ð' sorts
after 'z', 'á' after 'z', etc.).

Spark-first: Spark 4's ICU collation support expresses this as a column
collation — ``collate(col, 'is')`` — so the sort stays a plain JVM sort
with collated comparisons; no UDF, no driver-side strxfrm. For engines
without ICU collations a deterministic ``translate``-based key gives the
same primary-strength order for the Icelandic alphabet (documented
fallback, tested equal on the alphabet fixture).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

__all__ = ["icelandic_collation_key", "sort_icelandic", "people_sorted"]

# the Icelandic alphabet in collation order (lower case; primary strength)
ICELANDIC_ALPHABET = "aábcdðeéfghiíjklmnoóprstuúvxyýþæö"
# reference order incl. the loan letters the is_IS locale interleaves:
# c/q/w slot after their base neighbours and z lands between ý and þ
# (the post-1973 alphabet dropped z, but is_IS still collates it there
# — a raw-codepoint z would otherwise sort after ö, at the very end)
_FULL_ORDER = "aábcdðeéfghiíjklmnoópqrstuúvwxyýzþæö"
# ascending ASCII weights (printable, ordered) for the fallback key
_WEIGHTS = "".join(chr(ord("A") + i) for i in range(len(_FULL_ORDER)))

# memoized per session: the probe costs one tiny Spark job, and paying
# it on EVERY sort call puts a collect() on the serving path
_COLLATE_PROBE: dict = {}


def _has_collate(spark) -> bool:
    key = id(spark)
    hit = _COLLATE_PROBE.get(key)
    if hit is not None:
        return hit
    try:
        spark.range(1).select(
            F.collate(F.lit("a"), "is")
        ).collect()
        ok = True
    except Exception:
        ok = False
    if len(_COLLATE_PROBE) > 16:
        _COLLATE_PROBE.clear()  # sessions come and go in test runs
    _COLLATE_PROBE[key] = ok
    return ok


def icelandic_collation_key(col, spark=None) -> Column:
    """A column expression that sorts in Icelandic order.

    Uses the ICU collation when the session supports it (Spark 4:
    ``collate(col, 'is')``); otherwise a primary-strength fallback key
    (lower-case fold + alphabet-ordered ``translate``). Both are pure
    JVM expressions — whole-stage codegen keeps the sort distributed.
    """
    c = F.col(col) if isinstance(col, str) else col
    if spark is not None and not _has_collate(spark):
        return F.translate(F.lower(c), _FULL_ORDER, _WEIGHTS)
    return F.collate(c, "is")


def sort_icelandic(df: DataFrame, col: str, *tiebreak: str) -> DataFrame:
    """ORDER BY *col* under Icelandic collation (+ deterministic
    tiebreak columns)."""
    key = icelandic_collation_key(col, df.sparkSession)
    return df.orderBy(key.asc(), *[F.asc(t) for t in tiebreak])


def people_sorted(names: DataFrame, name_col: str = "name") -> DataFrame:
    """The reference's people listing (routes/people.py:96-104): distinct
    names sorted with Icelandic collation, ties broken bytewise for
    determinism."""
    return sort_icelandic(
        names.select(name_col).distinct(), name_col, name_col
    )
