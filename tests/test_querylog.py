"""Query-log analytics vs the reference's /stats dashboard panels."""

import json
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from greynirserver_spark.operators.querylog import (
    load_query_log,
    qtype_distribution,
    query_stats_daily,
    top_queries,
)

DAY = 86400.0
T0 = 1787000000.0  # fixed anchor


def _write_log(root, records):
    d = os.path.join(root, "_querylog")
    os.makedirs(d, exist_ok=True)
    for i, rec in enumerate(records):
        with open(os.path.join(d, f"q-{i:06d}.json"), "w") as f:
            f.write(json.dumps(rec) + "\n")


def _rec(ts, q, qtype, wall_ms=100, n_rows=5):
    return dict(ts=ts, q=q, qtype=qtype, k=10, n_rows=n_rows,
                wall_ms=wall_ms)


def test_daily_spine_zero_filled(spark, tmp_path):
    root = str(tmp_path / "store")
    _write_log(root, [
        _rec(T0, "a", "Search"),
        _rec(T0, "b", "Search"),
        _rec(T0 - 2 * DAY, "a", "Search"),
        # the day in between has NO queries -> must appear with 0
    ])
    log = load_query_log(spark, root)
    rows = query_stats_daily(log, num_days=4).collect()
    assert len(rows) == 4
    assert [r["n_queries"] for r in rows] == [0, 1, 0, 2]
    assert [r["n_unique"] for r in rows] == [0, 1, 0, 2]
    # ISO day strings, ascending
    days = [r["day"] for r in rows]
    assert days == sorted(days)


def test_qtype_distribution_and_top_queries(spark, tmp_path):
    root = str(tmp_path / "store")
    _write_log(root, [
        _rec(T0, "hot query", "Search", wall_ms=100),
        _rec(T0, "hot query", "Search", wall_ms=300),
        _rec(T0, "cold", "RelatedWords", wall_ms=50),
        _rec(T0, "arith", "Arithmetic", wall_ms=10),
    ])
    log = load_query_log(spark, root)
    dist = {r["qtype"]: (r["n"], r["share"])
            for r in qtype_distribution(log).collect()}
    assert dist["Search"] == (2, 0.5)
    assert dist["Arithmetic"] == (1, 0.25)
    top = top_queries(log, limit=2).collect()
    assert top[0]["q"] == "hot query" and top[0]["n"] == 2
    assert top[0]["mean_wall_ms"] == 200.0


def test_empty_log_is_empty_frame(spark, tmp_path):
    log = load_query_log(spark, str(tmp_path / "nothing"))
    assert log.count() == 0
    assert query_stats_daily(log).count() == 0
    assert qtype_distribution(log).count() == 0


def test_router_written_log_roundtrips(spark, tmp_path):
    """Records the live Router writes are readable by the analytics."""
    from greynirserver_spark.corpus import generate_pages_pdf
    from greynirserver_spark.plans.lineage import build_index_checkpointed
    from greynirserver_spark.query.router import Router

    pages = spark.createDataFrame(generate_pages_pdf(60))
    store = build_index_checkpointed(
        spark, pages, str(tmp_path / "ql"), n_shards=2, block_size=32
    )
    r = Router(spark, store, log_queries=True)
    r.execute("Hvað er 2 plús 2?")
    r.execute("newest articles")
    log = load_query_log(spark, store.root)
    dist = {x["qtype"]: x["n"] for x in qtype_distribution(log).collect()}
    assert dist == {"Arithmetic": 1, "NewestArticles": 1}
