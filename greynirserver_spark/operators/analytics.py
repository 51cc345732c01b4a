"""The reference's wider analytics query surface, re-expressed on Spark.

Each function mirrors a concrete reference query (file:line cited) over
the generic test tables (events / documents / TPC-H-ish), so the same
*operator shapes* are exercised: zero-filled date spines, co-occurrence
self-joins, latest-per-key windows, HAVING-style filtered aggs, top-N
with deterministic tie-breaks.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F
from pyspark.sql.window import Window

from .textops import document_postings

__all__ = [
    "events_daily_spine",
    "latest_event_per_user",
    "top_users_by_active_days",
    "related_terms",
    "term_article_count",
    "pricing_summary",
    "nation_order_counts",
]


def _events(spark: SparkSession, sf_dir: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/events.parquet")


def events_daily_spine(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Daily event counts with a zero-filled calendar spine.

    Reference: WordFrequencyQuery's generate_series day buckets LEFT
    JOINed to counts with coalesce(0) (db/sql.py:418-439). The spine is
    sequence()/explode — no Python, no driver loop.
    """
    ev = _events(spark, sf_dir)
    bounds = ev.agg(
        F.min(F.to_date("ts")).alias("d0"), F.max(F.to_date("ts")).alias("d1")
    )
    spine = bounds.select(
        F.explode(F.sequence("d0", "d1")).alias("day")
    )
    daily = ev.groupBy(F.to_date("ts").alias("day")).agg(
        F.count("*").cast("long").alias("cnt")
    )
    return (
        spine.join(daily, "day", "left")
        .select(
            # ISO string day: identical representation across engines
            F.date_format("day", "yyyy-MM-dd").alias("day"),
            F.coalesce("cnt", F.lit(0)).alias("n_events"),
        )
    )


def latest_event_per_user(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Latest row per key — the reference emulates this with
    ORDER BY ts DESC LIMIT 1 per client (queries/__init__.py:757-769);
    here it is one window pass. Tie-break on event_id for determinism."""
    ev = _events(spark, sf_dir)
    w = Window.partitionBy("user_id").orderBy(
        F.desc("ts"), F.desc("event_id")
    )
    return (
        ev.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") == 1)
        .select("user_id", "event_id", "ts", "event_type")
    )


def top_users_by_active_days(
    spark: SparkSession, sf_dir: str, min_days: int = 2, limit: int = 25
) -> DataFrame:
    """Top users by distinct active days — the top-persons-by-mentions
    shape (routes/people.py:107-150): COUNT(DISTINCT day), HAVING-style
    filter, deterministic top-N."""
    ev = _events(spark, sf_dir)
    return (
        ev.groupBy("user_id")
        .agg(F.countDistinct(F.to_date("ts")).cast("long").alias("active_days"))
        .where(F.col("active_days") >= min_days)
        .orderBy(F.desc("active_days"), F.asc("user_id"))
        .limit(limit)
    )


def related_terms(
    docs: DataFrame, root_term: str, limit: int = 21
) -> DataFrame:
    """Co-occurrence: terms appearing in documents that contain
    *root_term*, ranked by summed tf. Reference: RelatedWordsQuery's
    words self-join (db/sql.py:291-302), top-21.

    Shape: semi-join to the doc set (no payload carried), then re-join
    postings. The root term's doc set can be huge for head terms — at
    scale the semi-join side is broadcast when small, salted otherwise.
    """
    postings = document_postings(docs)
    doc_set = postings.where(F.col("term") == root_term).select("doc_id")
    return (
        postings.join(doc_set, "doc_id", "left_semi")
        .where(F.col("term") != root_term)
        .groupBy("term")
        .agg(F.sum("tf").cast("long").alias("cnt"))
        .orderBy(F.desc("cnt"), F.asc("term"))
        .limit(limit)
    )


def term_article_count(docs: DataFrame, terms: list) -> DataFrame:
    """How many documents contain any of *terms* — the ArticleCount
    semi-join (db/sql.py:341-348): distinct doc count, 1 row."""
    postings = document_postings(docs)
    return postings.where(F.col("term").isin(terms)).agg(
        F.countDistinct("doc_id").cast("long").alias("n_docs")
    )


def pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1-shaped pricing summary over lineitem: grouped conditional
    aggregation (the reference's gender-pivot shape, db/sql.py:64-78).
    All measures rounded for cross-engine comparison."""
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    return (
        li.where(F.col("l_shipdate") <= F.lit("1998-09-02"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
            F.round(F.sum("l_extendedprice"), 2).alias("sum_base_price"),
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("sum_disc_price"),
            F.count("*").cast("long").alias("count_order"),
        )
        .orderBy("l_returnflag", "l_linestatus")
    )


def nation_order_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Orders per nation with zero-fill: dims broadcast, LEFT JOIN kept
    left-outer so empty nations show 0 (ChartsQuery shape,
    db/sql.py:101-112)."""
    nation = spark.read.parquet(f"{sf_dir}/nation.parquet")
    cust = spark.read.parquet(f"{sf_dir}/customer.parquet")
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    per_cust = orders.groupBy("o_custkey").agg(
        F.count("*").cast("long").alias("n_orders")
    )
    per_nation = (
        cust.join(per_cust, cust.c_custkey == per_cust.o_custkey, "left")
        .groupBy("c_nationkey")
        .agg(F.sum(F.coalesce("n_orders", F.lit(0))).cast("long").alias("n_orders"))
    )
    return (
        F.broadcast(nation.select("n_nationkey", "n_name"))
        .join(per_nation, nation.n_nationkey == per_nation.c_nationkey, "left")
        .select(
            "n_name",
            F.coalesce("n_orders", F.lit(0)).cast("long").alias("n_orders"),
        )
        .orderBy("n_name")
    )
