"""Tokenization, stem/category normalization and the index filter.

Re-expresses the reference's term pipeline Spark-first:

* the indexable category set (reference ``settings.py:53-55``),
* the (stem, category) no-index stoplist (reference ``config/Index.conf:11-89``),
* the 64-char stem cap (reference ``db/models.py:466``, ``article.py:339-341``),
* bag-of-words key normalization
  ``stem.lower().replace("-","").replace(" ","_") + "/" + cat``
  (reference ``vectors/builder.py:80-82``).

The tokenizer itself stays entirely JVM-side (``lower`` / ``regexp_replace``
/ ``split`` / ``explode`` — whole-stage-codegen, no Python in the hot path).
The reference delegates morphology to the external Greynir/BÍN packages;
here the (stem -> category) mapping is a broadcast vocabulary dimension
table, which is exactly how a dictionary-backed lemmatizer should look on a
1000-executor cluster: a small broadcast dim joined map-side, never a UDF.
"""

from __future__ import annotations

from typing import Optional

from pyspark.sql import Column, DataFrame, SparkSession, functions as F

__all__ = [
    "CATEGORIES_TO_INDEX",
    "NOINDEX_PAIRS",
    "MAX_WORD_LEN",
    "TOKEN_SPLIT_RE",
    "PY_TOKEN_SPLIT_RE",
    "normalized_term",
    "tokenize_marked_text",
    "tokenize_plain_text",
    "apply_index_filter",
]

# Word categories that are indexed (reference settings.py:53-55)
CATEGORIES_TO_INDEX = frozenset(
    ("kk", "kvk", "hk", "person_kk", "person_kvk", "entity", "lo", "so")
)

# Maximum indexed stem length (reference db/models.py:466)
MAX_WORD_LEN = 64

# (stem, category) pairs excluded from the index
# (reference config/Index.conf:11-89)
_NOINDEX_SO = (
    "vera verða ætla telja segja geta hefja gera þurfa hafa eiga koma fara "
    "taka fá munu skulu vilja halda gefa sjá mega ná láta finna bera reyna "
    "standa leggja setja"
).split()
_NOINDEX_LO = (
    "stór lítill mikill margur langur stuttur einn eins fyrstur annar þriðji "
    "fjórði síður fyrri síðari næstur svona ýmislegur nýr"
).split()
_NOINDEX_HK = "ár es mál lán land Ísland tweet".split()
_NOINDEX_KK = "maður dagur".split()
_NOINDEX_KVK = "mynd vika".split()

NOINDEX_PAIRS = tuple(
    [(w, "so") for w in _NOINDEX_SO]
    + [(w, "lo") for w in _NOINDEX_LO]
    + [(w, "hk") for w in _NOINDEX_HK]
    + [(w, "kk") for w in _NOINDEX_KK]
    + [(w, "kvk") for w in _NOINDEX_KVK]
)

# Any Unicode letter or ASCII digit keeps a token together; everything
# else splits. \p{L} (not an explicit Icelandic char class) for two
# reasons: web text carries every script, and Java's regex engine runs
# predefined property classes ~35x faster than custom classes containing
# non-ASCII chars (measured 0.9s vs 32.7s over 200MB of text). RE2
# (DuckDB oracle) supports the same syntax.
TOKEN_SPLIT_RE = r"[^\p{L}0-9]+"

# Python's re module has no \p{L}; [\W_]+ is the equivalent splitter for
# driver-side query parsing and the NumPy oracles (\w = unicode letters +
# digits + underscore; we additionally split on '_'). Divergence is
# possible only for non-ASCII digits, which the token pipeline never
# emits.
PY_TOKEN_SPLIT_RE = r"[\W_]+"

# Paragraph markers are structure, not content: strip them before
# tokenizing ([[...]] format produced by extraction.py)
_MARKER_RE = r"\[\[|\]\]"


def normalized_term(stem: Column, cat: Column) -> Column:
    """Bag-of-words key: lower, drop '-', spaces -> '_', append '/cat'
    (reference vectors/builder.py:80-82). Pure JVM expression."""
    s = F.lower(stem)
    s = F.replace(s, F.lit("-"), F.lit(""))
    s = F.replace(s, F.lit(" "), F.lit("_"))
    return F.concat(s, F.lit("/"), cat)


def _explode_tokens(df: DataFrame, text_col: str, strip_markers: bool) -> DataFrame:
    """text -> one row per token (JVM-side, codegen-friendly)."""
    txt = F.lower(F.col(text_col))
    if strip_markers:
        txt = F.regexp_replace(txt, _MARKER_RE, " ")
    toks = F.split(txt, TOKEN_SPLIT_RE)
    return (
        df.withColumn("token", F.explode(toks))
        .where((F.length("token") >= 1))
        .drop(text_col)
    )


def tokenize_marked_text(
    df: DataFrame,
    vocab: Optional[DataFrame] = None,
    text_col: str = "text",
    default_cat: str = "entity",
) -> DataFrame:
    """Tokenize ``[[...]]``-marked extracted text into (doc cols..., stem, cat).

    *vocab* is the broadcast (stem, cat) dimension (the dictionary-lemmatizer
    analog). Unknown tokens get *default_cat* — the reference similarly
    classifies out-of-vocabulary capitalized tokens as entities
    (nertokenizer.py).
    """
    toks = _explode_tokens(df, text_col, strip_markers=True)
    if vocab is not None:
        toks = toks.join(
            F.broadcast(vocab.select(F.col("stem").alias("token"), "cat")),
            on="token",
            how="left",
        ).withColumn("cat", F.coalesce(F.col("cat"), F.lit(default_cat)))
    else:
        toks = toks.withColumn("cat", F.lit(default_cat))
    return toks.withColumnRenamed("token", "stem")


def tokenize_plain_text(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Tokenize plain text (the ``documents`` table) into (doc cols..., term).

    No category dimension — term == token. This variant is intentionally
    expressible 1:1 in ANSI SQL so DuckDB can oracle-check the whole
    downstream index + BM25 pipeline.
    """
    return _explode_tokens(df, text_col, strip_markers=False).withColumnRenamed(
        "token", "term"
    )


def apply_index_filter(
    toks: DataFrame, spark: Optional[SparkSession] = None
) -> DataFrame:
    """Drop non-indexed categories, stoplisted (stem, cat) pairs and
    over-long stems (reference article.py:324-343), then add the
    normalized ``term`` column.

    The stoplist is a tiny broadcast anti-join — map-side, no shuffle.
    """
    spark = spark or toks.sparkSession
    noindex = spark.createDataFrame(
        [(s.lower(), c) for s, c in NOINDEX_PAIRS], "stem string, cat string"
    )
    return (
        toks.where(F.col("cat").isin(*sorted(CATEGORIES_TO_INDEX)))
        .where(F.length("stem") <= MAX_WORD_LEN)
        .join(F.broadcast(noindex), on=["stem", "cat"], how="left_anti")
        .withColumn("term", normalized_term(F.col("stem"), F.col("cat")))
    )
