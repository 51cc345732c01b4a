"""Link-graph PageRank: numpy pin, mass conservation, dangling nodes,
host-edge derivation, and the iterative plan's shape."""
import numpy as np
import pytest
from pyspark.sql import functions as F

from greynirserver_spark.operators.linkgraph import host_edges, pagerank

EDGES = [
    (0, 1), (0, 2), (1, 2), (2, 0), (3, 2), (3, 4),
    (4, 0), (5, 0), (5, 1), (5, 6), (6, 3),
    (7, 0),  # 8 is dst-only => dangling
    (3, 8),
]


def _numpy_pagerank(edges, damping=0.85, iterations=12):
    nodes = sorted({u for e in edges for u in e})
    idx = {u: i for i, u in enumerate(nodes)}
    n = len(nodes)
    deg = np.zeros(n)
    for s, _ in edges:
        deg[idx[s]] += 1
    r = np.full(n, 1.0 / n)
    for _ in range(iterations):
        contrib = np.zeros(n)
        for s, d in edges:
            contrib[idx[d]] += r[idx[s]] / deg[idx[s]]
        dmass = r[deg == 0].sum()
        r = (1 - damping) / n + damping * (contrib + dmass / n)
    return {u: r[idx[u]] for u in nodes}


def test_pagerank_matches_numpy_pin(spark):
    edges = spark.createDataFrame(EDGES, "src long, dst long")
    got = {r.node: r.rank for r in pagerank(edges, iterations=12).collect()}
    want = _numpy_pagerank(EDGES, iterations=12)
    assert set(got) == set(want)
    for node in want:
        assert got[node] == pytest.approx(want[node], abs=1e-12), node
    # dangling treatment conserves total mass exactly
    assert sum(got.values()) == pytest.approx(1.0, abs=1e-9)


def test_pagerank_dangling_absorbs_and_redistributes(spark):
    # star into a sink: without dangling redistribution the sink would
    # hold ~all mass; with it, spokes keep the teleport+redistribution
    edges = spark.createDataFrame(
        [(i, 99) for i in range(5)], "src long, dst long")
    got = {r.node: r.rank for r in pagerank(edges, iterations=20).collect()}
    want = _numpy_pagerank([(i, 99) for i in range(5)], iterations=20)
    for node in want:
        assert got[node] == pytest.approx(want[node], abs=1e-12)
    assert got[99] > got[0] > 0
    assert sum(got.values()) == pytest.approx(1.0, abs=1e-9)


def test_pagerank_zero_iterations_is_uniform(spark):
    edges = spark.createDataFrame(EDGES, "src long, dst long")
    got = pagerank(edges, iterations=0).collect()
    n = len({u for e in EDGES for u in e})
    assert all(r.rank == pytest.approx(1.0 / n) for r in got)


def test_pagerank_empty_edges(spark):
    edges = spark.createDataFrame([], "src long, dst long")
    assert pagerank(edges, iterations=3).collect() == []


def test_host_edges_from_links(spark):
    links = spark.createDataFrame(
        [
            ("https://a.is/x", "https://b.is/y"),
            ("https://a.is/x2", "https://b.is/z"),   # parallel => one
            ("https://a.is/x", "https://a.is/nav"),  # self-host => drop
            ("https://b.is/y", "https://c.is/"),
        ],
        "url string, link string",
    )
    got = sorted((r.src, r.dst) for r in host_edges(links).collect())
    assert got == [("a.is", "b.is"), ("b.is", "c.is")]


def test_pagerank_plan_no_cartesian(spark):
    """The 1-row dangling fold must enter as a broadcast nested-loop,
    never a CartesianProduct over data rows."""
    edges = spark.createDataFrame(EDGES, "src long, dst long")
    out = pagerank(edges, iterations=2)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan


def test_pagerank_validates_checkpoint_every(spark):
    import pytest as _pytest

    from greynirserver_spark.operators.linkgraph import pagerank

    edges = spark.createDataFrame(
        [(1, 2)], "src long, dst long")
    with _pytest.raises(ValueError):
        pagerank(edges, iterations=2, checkpoint_every=0)
