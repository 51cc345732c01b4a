"""Title/definition answer ranking — the reference's "who is X" scorer
(`/root/reference/queries/builtin.py:225-335`) as one relational plan.

Semantics reproduced exactly:

* mention weight (builtin.py:245-258): the 5 newest mentions each
  contribute `14 / (1 + log4(age_days + 4))`; a single-mention answer
  is divided by e.
* length weight (:239-241): `min(e * ln(len(answer)), 10)`.
* cross-mention bonuses (:267-312): for each pair of answers where one
  is contained in the other as whole words, both gain
  `0.20 * mw(other) / crosses` (crosses counted per higher-ranked
  answer in mention-weight order, capped at 5), EXCEPT the
  "fyrrverandi" rule: an ex-prefixed answer takes `0.35 * mw(other)`
  un-decayed instead of granting the plain bonus to its counterpart.
* cutoff (:322-326): if more than 4 answers and the 5th has multiple
  source articles, single-source answers are dropped.

Determinism deltas from the reference (documented, mirrored in the
oracle): `now` anchors at the table's max timestamp, and every sort
gains an `answer` tiebreak (the reference relies on Python dict
order).

Scale shape: the per-answer top-5 is a window over the mention table
(standard distributed top-k-per-key); the pairwise containment pass is
a self-join of the ANSWER list — bounded by the per-query candidate
set in the reference's usage, so it broadcasts.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, functions as F
from pyspark.sql.window import Window

__all__ = ["prioritize_titles", "EX_WORDS"]

MAX_MENTIONS = 5         # builtin.py:94
MAXLEN_ANSWER = 20       # builtin.py:84
CUTOFF_AFTER = 4         # builtin.py:89
CROSS_MENTION_FACTOR = 0.20
EX_MENTION_FACTOR = 0.35
EX_WORDS = ("fyrrverandi", "fv.", "fráfarandi", "áður", "þáverandi",
            "fyrrum")    # builtin.py:283


def _padded(col):
    return F.concat(F.lit(" "), F.lower(col), F.lit(" "))


def _contained(needle, haystack):
    """Whole-word containment (builtin.py:232-234)."""
    return F.instr(_padded(haystack), _padded(needle)) > 0


def _is_ex(col):
    cond = F.lit(False)
    for w in EX_WORDS:
        cond = cond | _contained(F.lit(w), col)
    return cond


def prioritize_titles(mentions: DataFrame, limit: int = MAXLEN_ANSWER,
                      ) -> DataFrame:
    """(rank, answer, score, n_articles, newest_url) from a mention
    table (answer, url, ts)."""
    anchor = mentions.agg(F.max("ts").alias("now"))
    w_new = Window.partitionBy("answer").orderBy(
        F.desc("ts"), F.asc("url"))
    newest = (
        mentions.crossJoin(F.broadcast(anchor))
        .withColumn("rn", F.row_number().over(w_new))
    )
    decay = 14.0 / (
        1.0 + F.log(F.greatest(
            F.lit(0), F.datediff(F.col("now"), F.col("ts"))
        ).cast("double") + 4.0) / math.log(4.0)
    )
    per_answer = (
        newest.groupBy("answer")
        .agg(
            F.sum(F.when(F.col("rn") <= MAX_MENTIONS, decay)).alias("mw0"),
            F.sum(F.when(F.col("rn") <= MAX_MENTIONS, 1)
                  .cast("long")).alias("n_m"),
            F.countDistinct("url").cast("long").alias("n_articles"),
            F.min(F.when(F.col("rn") == 1, F.col("url"))).alias(
                "newest_url"),
        )
        .withColumn(
            "mw",
            F.when(F.col("n_m") == 1, F.col("mw0") / math.e)
            .otherwise(F.col("mw0")),
        )
        .withColumn(
            "base",
            F.col("mw")
            + F.least(F.lit(math.e) * F.log(F.length("answer")),
                      F.lit(10.0)),
        )
        .withColumn("is_ex", _is_ex(F.col("answer")))
        .withColumn(
            "mw_rank",
            # rank over the ROUNDED weight: answers with identical
            # mention patterns are exact ties in both engines instead
            # of float-association coin flips
            F.row_number().over(Window.orderBy(
                F.desc(F.round("mw", 6)), F.asc("answer"))),
        )
    )
    a = per_answer.select(
        F.col("answer").alias("a_i"), F.col("mw").alias("mw_i"),
        F.col("is_ex").alias("ex_i"), F.col("mw_rank").alias("r_i"))
    b = per_answer.select(
        F.col("answer").alias("a_j"), F.col("mw").alias("mw_j"),
        F.col("is_ex").alias("ex_j"), F.col("mw_rank").alias("r_j"))
    pairs = (
        a.join(F.broadcast(b), F.col("r_i") < F.col("r_j"))
        .where(_contained(F.col("a_i"), F.col("a_j"))
               | _contained(F.col("a_j"), F.col("a_i")))
        .withColumn(
            "crosses",
            F.row_number().over(
                Window.partitionBy("r_i").orderBy("r_j")),
        )
        .where(F.col("crosses") <= MAX_MENTIONS)
    )
    to_i = pairs.select(
        F.col("a_i").alias("answer"),
        (
            F.when(F.col("ex_i") & ~F.col("ex_j"),
                   F.col("mw_j") * EX_MENTION_FACTOR).otherwise(0.0)
            + F.when(~(F.col("ex_j") & ~F.col("ex_i")),
                     F.col("mw_j") * CROSS_MENTION_FACTOR
                     / F.col("crosses")).otherwise(0.0)
        ).alias("bonus"),
    )
    to_j = pairs.select(
        F.col("a_j").alias("answer"),
        (
            F.when(~(F.col("ex_i") & ~F.col("ex_j")),
                   F.col("mw_i") * CROSS_MENTION_FACTOR
                   / F.col("crosses")).otherwise(0.0)
            + F.when(F.col("ex_j") & ~F.col("ex_i"),
                     F.col("mw_i") * EX_MENTION_FACTOR).otherwise(0.0)
        ).alias("bonus"),
    )
    bonuses = to_i.unionByName(to_j).groupBy("answer").agg(
        F.sum("bonus").alias("bonus"))
    scored = (
        per_answer.join(bonuses, "answer", "left")
        .withColumn("score",
                    F.col("base") + F.coalesce(F.col("bonus"), F.lit(0.0)))
        .withColumn(
            "final_rank",
            F.row_number().over(Window.orderBy(
                F.desc(F.round("score", 4)), F.asc("answer"))),
        )
    )
    # cutoff rule: >4 answers and the 5th has multiple sources =>
    # drop single-source answers (1-row broadcast flag)
    flag = scored.agg(
        F.max(F.when((F.col("final_rank") == CUTOFF_AFTER + 1)
                     & (F.col("n_articles") > 1), 1)
              .otherwise(0)).alias("cut"))
    kept = (
        scored.crossJoin(F.broadcast(flag))
        .where((F.col("cut") == 0) | (F.col("n_articles") > 1))
    )
    w_final = Window.orderBy(F.desc(F.round("score", 4)),
                             F.asc("answer"))
    return (
        kept.orderBy(F.desc(F.round("score", 4)), F.asc("answer"))
        .limit(limit)
        .withColumn("rank", F.row_number().over(w_final).cast("long"))
        .select("rank", "answer", F.round("score", 4).alias("score"),
                "n_articles", "newest_url")
    )
