"""Icelandic string utilities (reference `utility.py`).

* `icelandic_asciify` (utility.py:147-184): map Icelandic letters to
  ASCII equivalents (single-char ones in one `translate`, the
  multi-char þ→th / æ→ae family via `regexp_replace`), then strip any
  remaining non-ASCII.  Pure JVM expressions — no UDF.
* `icequote` (utility.py:187-189): Icelandic-style „quotes“.
"""

from __future__ import annotations

from pyspark.sql import Column, functions as F

__all__ = ["icelandic_asciify", "icequote",
           "ASCIIFY_ONE_CHAR", "ASCIIFY_MULTI"]

# 1:1 replacements (utility.py:153-174, minus the multi-char ones)
ASCIIFY_ONE_CHAR = {
    "ð": "d", "Ð": "D", "á": "a", "Á": "A", "ú": "u", "Ú": "U",
    "í": "i", "Í": "I", "é": "e", "É": "E", "ó": "o", "Ó": "O",
    "ý": "y", "Ý": "Y", "ö": "o", "Ö": "O",
}
# 1:N replacements
ASCIIFY_MULTI = (("þ", "th"), ("Þ", "TH"), ("æ", "ae"), ("Æ", "AE"))


def icelandic_asciify(col) -> Column:
    out = F.translate(
        col,
        "".join(ASCIIFY_ONE_CHAR.keys()),
        "".join(ASCIIFY_ONE_CHAR.values()),
    )
    for src, dst in ASCIIFY_MULTI:
        out = F.regexp_replace(out, src, dst)
    # Remove any remaining non-ASCII chars (utility.py:182)
    return F.regexp_replace(out, "[^\\x00-\\x7F]", "")


def icequote(col) -> Column:
    return F.concat(F.lit("„"), F.trim(col), F.lit("“"))
