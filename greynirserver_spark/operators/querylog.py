"""Query-log analytics — the reference's /stats query dashboard
(routes/stats.py::query_stats_data, :233-330) over the Router's own
query log.

The Router appends one JSON record per executed query
(`query/router.py::_log_query`, mirroring the reference's ``queries``
table, queries/__init__.py:1352-1378).  These operators read that log
back as a DataFrame and compute the dashboard's three panels:

* ``query_stats_daily`` — per-day query count + distinct query count
  over a zero-filled day spine (QueryCountQuery.period; the
  reference's "unique" series counts distinct CLIENTS, which the
  sandbox log has no analog for — distinct query strings stand in,
  documented here).  The spine is ``sequence``/``explode`` like
  `analytics.events_daily_spine` — no driver loop over days (the
  reference loops a SQL query per day, :247-260; one grouped plan
  replaces all of them).
* ``qtype_distribution`` — query count + share per qtype
  (QueryTypesQuery, :269-276).
* ``top_queries`` — most frequent query strings with mean latency
  (the top-answers panel, :324-330), deterministic tie-break.

At scale the log is an append-only metrics table (Iceberg append per
batch — see `_log_query`'s docstring); every operator here is one
partial-agg groupBy over it.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession, functions as F

__all__ = [
    "load_query_log", "query_stats_daily", "qtype_distribution",
    "top_queries",
]

_SCHEMA = ("ts double, q string, qtype string, k long, n_rows long, "
           "wall_ms long")


def load_query_log(spark: SparkSession, store_root: str) -> DataFrame:
    """The store's query log as (ts, q, qtype, k, n_rows, wall_ms);
    empty (0 rows, right schema) when nothing was logged yet."""
    d = os.path.join(store_root, "_querylog")
    if not os.path.isdir(d) or not any(
        f.startswith("q-") for f in os.listdir(d)
    ):
        return spark.createDataFrame([], _SCHEMA)
    return spark.read.schema(_SCHEMA).json(os.path.join(d, "q-*.json"))


def query_stats_daily(log: DataFrame, num_days: int = 7) -> DataFrame:
    """(day, n_queries, n_unique): zero-filled daily counts for the
    *num_days* days ending at the log's newest record (the reference
    anchors at "today"; an offline log anchors at its own max ts so
    the result is deterministic)."""
    bounds = log.agg(
        F.max(F.to_date(F.timestamp_seconds("ts"))).alias("d1")
    )
    spine = bounds.select(
        F.explode(
            F.sequence(
                F.date_sub("d1", num_days - 1), F.col("d1")
            )
        ).alias("day")
    ).where(F.col("day").isNotNull())
    daily = (
        log.groupBy(F.to_date(F.timestamp_seconds("ts")).alias("day"))
        .agg(
            F.count("*").cast("long").alias("n_queries"),
            F.countDistinct("q").cast("long").alias("n_unique"),
        )
    )
    return (
        spine.join(daily, "day", "left")
        .select(
            F.date_format("day", "yyyy-MM-dd").alias("day"),
            F.coalesce("n_queries", F.lit(0)).alias("n_queries"),
            F.coalesce("n_unique", F.lit(0)).alias("n_unique"),
        )
        .orderBy("day")
    )


def qtype_distribution(log: DataFrame) -> DataFrame:
    """(qtype, n, share): the dashboard's pie-chart panel."""
    per = log.groupBy("qtype").agg(F.count("*").cast("long").alias("n"))
    tot = per.agg(F.sum("n").cast("double").alias("total"))
    return (
        per.crossJoin(F.broadcast(tot))
        .select(
            "qtype", "n",
            F.round(F.col("n") / F.col("total"), 6).alias("share"),
        )
        .orderBy(F.desc("n"), "qtype")
    )


def top_queries(log: DataFrame, limit: int = 20) -> DataFrame:
    """(q, n, mean_wall_ms): most frequent query strings with mean
    serving latency, tie-broken lexicographically."""
    return (
        log.groupBy("q")
        .agg(
            F.count("*").cast("long").alias("n"),
            F.round(F.avg("wall_ms"), 2).alias("mean_wall_ms"),
        )
        .orderBy(F.desc("n"), "q")
        .limit(limit)
    )
