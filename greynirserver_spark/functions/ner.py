"""Dictionary-backed entity recognition over token streams.

The reference's ``nertokenizer.py:45-283`` scans the token stream with a
DB-backed longest-match lookahead: multi-token entity names from the
``entities`` table are merged into single ENTITY tokens. Spark-first
re-expression: the entity dictionary is a broadcast dimension keyed on
first token; candidate starts are found with one broadcast join; the
remaining tokens of each candidate are verified positionally with
self-joins on (doc_id, pos+i) — longest match wins, exactly like the
reference's lookahead, but set-at-a-time instead of a Python scanner.

Supports names up to 3 tokens (covers the reference's person/entity
name shapes; extending is one more join per extra token).
"""

from __future__ import annotations

from typing import List, Tuple

from pyspark.sql import DataFrame, SparkSession, functions as F

__all__ = ["recognize_entities", "tokens_with_positions"]


def tokens_with_positions(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """(doc_id, pos, token): position-preserving tokenization (posexplode
    over the split array — order guaranteed by construction)."""
    from ..tokenization import MAX_WORD_LEN, TOKEN_SPLIT_RE

    arr = F.filter(
        F.split(F.lower(F.col(text_col)), TOKEN_SPLIT_RE),
        lambda x: (F.length(x) >= 1) & (F.length(x) <= MAX_WORD_LEN),
    )
    return docs.select("doc_id", F.posexplode(arr).alias("pos", "token"))


def recognize_entities(
    docs: DataFrame,
    entities: List[Tuple[str, str]],
    text_col: str = "text",
) -> DataFrame:
    """(doc_id, pos, entity, entity_id): every occurrence of a dictionary
    entity, longest match winning on overlaps.

    *entities*: list of (entity_id, name); names are 1-3 tokens,
    matched case-insensitively on the token stream (the reference
    lower-cases via a functional index, db/models.py:396).
    """
    spark = docs.sparkSession
    toks = tokens_with_positions(docs, text_col)

    rows = []
    for eid, name in entities:
        parts = name.lower().split()
        if not 1 <= len(parts) <= 3:
            raise ValueError(f"entity names must be 1-3 tokens: {name!r}")
        parts = parts + [None] * (3 - len(parts))
        rows.append((eid, name, len([p for p in parts if p]), *parts))
    dim = spark.createDataFrame(
        rows, "entity_id string, entity string, n int, "
              "w1 string, w2 string, w3 string"
    )

    # candidates: broadcast join on the first word
    cand = toks.join(
        F.broadcast(dim), toks["token"] == dim["w1"], "inner"
    ).select("doc_id", "pos", "entity_id", "entity", "n", "w2", "w3")

    # verify word 2 and 3 positionally
    t2 = toks.select(
        F.col("doc_id").alias("d2"), F.col("pos").alias("p2"),
        F.col("token").alias("tok2"),
    )
    cand = cand.join(
        t2,
        (F.col("doc_id") == F.col("d2")) & (F.col("p2") == F.col("pos") + 1),
        "left",
    ).where((F.col("n") < 2) | (F.col("tok2") == F.col("w2"))).drop(
        "d2", "p2"
    )
    t3 = toks.select(
        F.col("doc_id").alias("d3"), F.col("pos").alias("p3"),
        F.col("token").alias("tok3"),
    )
    cand = cand.join(
        t3,
        (F.col("doc_id") == F.col("d3")) & (F.col("p3") == F.col("pos") + 2),
        "left",
    ).where((F.col("n") < 3) | (F.col("tok3") == F.col("w3"))).drop(
        "d3", "p3"
    )

    # longest match wins where spans overlap at the same start; and a
    # longer match starting earlier swallows shorter ones inside it
    from pyspark.sql.window import Window

    w_start = Window.partitionBy("doc_id", "pos").orderBy(F.desc("n"))
    best = (
        cand.withColumn("rk", F.row_number().over(w_start))
        .where(F.col("rk") == 1)
        .select("doc_id", "pos", "entity", "entity_id", "n")
    )
    # suppress matches fully inside an earlier longer match
    inside = best.alias("a").join(
        best.alias("b"),
        (F.col("a.doc_id") == F.col("b.doc_id"))
        & (F.col("b.pos") < F.col("a.pos"))
        & (F.col("b.pos") + F.col("b.n") > F.col("a.pos")),
        "left_semi",
    )
    return (
        best.join(inside, ["doc_id", "pos"], "left_anti")
        .select("doc_id", "pos", "entity", "entity_id")
    )
