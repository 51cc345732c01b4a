"""The reference's /people surface as relational plans.

* `recent_persons` (/root/reference/routes/people.py:52-104): the
  reference scans up to 2N person mentions in recency order, keeps one
  title per name under the `is_better_title` rule (:67-77 — a short
  title beats an over-long one; among short titles longer is better;
  among over-long titles shorter is better; first-scanned wins ties),
  and STOPS once N distinct names have appeared.  Here the sequential
  scan is re-expressed as a distributed top-2N
  (`TakeOrderedAndProject`) followed by windows over those <=2N rows
  only — every window partition is bounded by the page size, never the
  corpus, so the plan is identical at 10^12 mentions.
* `top_persons` (:107-150): person stems with at least two name parts,
  deduplicated per article, counted over a recency window and ranked.
  The reference sorts by count only (unstable); a name tiebreak makes
  the output deterministic.

Both operators take a MENTIONS table (name/title/url/ts[, gender]) —
the reference reads its `persons`/`words` tables, which its processors
populate; the driver entry synthesizes an equivalent table from
orders x customer so the DuckDB oracle can mirror the whole plan.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F
from pyspark.sql.window import Window

__all__ = ["recent_persons", "top_persons"]

MAX_TITLE_LENGTH = 64          # routes/people.py:45
RECENT_PERSONS_LENGTH = 50     # routes/people.py:44
TOP_PERSONS_LENGTH = 20        # routes/people.py:48


def recent_persons(mentions: DataFrame, limit: int = RECENT_PERSONS_LENGTH,
                   max_title_len: int = MAX_TITLE_LENGTH) -> DataFrame:
    """(name, title, url): one row per recently-mentioned person with
    their best title.

    Scan order is total (ts desc, url, name, title) so the sequential
    semantics are reproducible; the early-termination rule ("stop once
    `limit` distinct names are seen") becomes a cutoff at the first
    occurrence of the limit-th name.  The `is_better_title` preference
    is a total order, so the reference's replace-if-better loop
    converges to the window minimum under
    (is_long ASC, len-if-long/-len-if-short ASC, scan position ASC)."""
    scan = [F.desc("ts"), F.asc("url"), F.asc("name"), F.asc("title")]
    cand = mentions.orderBy(*scan).limit(2 * limit)
    w_rn = Window.orderBy(*scan)
    w_name = Window.partitionBy("name")
    w_all = Window.partitionBy()
    ranked = (
        cand.withColumn("rn", F.row_number().over(w_rn))
        .withColumn("rn_first", F.min("rn").over(w_name))
        .withColumn("name_rank",
                    F.dense_rank().over(Window.orderBy("rn_first")))
        .withColumn(
            "cutoff",
            F.max(F.when(F.col("name_rank") == limit,
                         F.col("rn_first"))).over(w_all),
        )
    )
    scanned = ranked.where(
        F.col("rn") <= F.coalesce(F.col("cutoff"), F.lit(1 << 62)))
    tlen = F.length("title")
    islong = (tlen >= max_title_len).cast("int")
    pref = Window.partitionBy("name").orderBy(
        islong.asc(),
        F.when(tlen >= max_title_len, tlen).otherwise(-tlen).asc(),
        F.asc("rn"),
    )
    return (
        scanned.withColumn("pk", F.row_number().over(pref))
        .where(F.col("pk") == 1)
        .select("name", "title", "url")
        .orderBy("name")
    )


def top_persons(words: DataFrame, limit: int = TOP_PERSONS_LENGTH,
                days: int = 1) -> DataFrame:
    """(name, gender, n_articles): person mentions with >=2 name parts,
    distinct per article, counted over the trailing `days` window
    (anchored at the table's max timestamp so the result is a pure
    function of the data) and ranked (count desc, name asc)."""
    latest = words.agg(F.max("ts").alias("t1"))
    recent = (
        words.crossJoin(F.broadcast(latest))
        .where(F.col("ts") > F.date_sub(F.col("t1"), days))
        .where(F.col("name").like("% %"))
        .select("name", "gender", "url")
        .distinct()
    )
    return (
        recent.groupBy("name", "gender")
        .agg(F.count("*").cast("long").alias("n_articles"))
        .orderBy(F.desc("n_articles"), F.asc("name"))
        .limit(limit)
    )
