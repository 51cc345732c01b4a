"""Link-graph centrality: PageRank over a web corpus's link structure.

The reference crawls link-by-link (``/root/reference/fetcher.py:324-376``
spiders child URLs) but never *scores* the graph it walks. A
Common-Crawl-scale training pipeline does: link-based centrality is the
standard host/page quality prior (the original PageRank use case, Brin &
Page 1998; Common Crawl itself publishes host-level ranks computed this
way), fed into corpus sampling weights alongside the content-quality
gates in ``operators/cleaning.py``.

Scale shape: one iteration = one join (ranks → edges on ``src``) + one
aggregation (contributions grouped by ``dst``) — both shuffles on the
same key family, AQE-coalesced; dangling mass and the teleport term are
1-row aggregates folded in via a broadcast cross join (never a driver
round-trip inside the loop). The plan is truncated with an eager
``localCheckpoint`` every iteration — the same iterative-relational
idiom as near-dup clustering (``dedup.py``) — so ten iterations cost ten
bounded stages, not one exponentially-nested plan. At 10^12 pages the
state is one (node, rank) row per page, partitioned by node: linear,
skew-tolerant (a hub's fan-IN is a groupBy, its fan-OUT a map-side
divide).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

__all__ = ["pagerank", "host_edges"]


def host_edges(links: DataFrame) -> DataFrame:
    """(src, dst) host-level edges from :func:`..sources.pages.
    extract_links` output (url → link rows): the practical grain for
    quality priors — page-level graphs reward boilerplate nav links,
    host graphs reward actual cross-site citation. Self-edges (intra-
    host nav) are dropped; parallel edges collapse to one."""
    from ..sources.pages import host_of

    return (
        links.select(host_of(F.col("url")).alias("src"),
                     host_of(F.col("link")).alias("dst"))
        .where((F.col("src") != F.col("dst"))
               & (F.col("src") != "") & (F.col("dst") != ""))
        .distinct()
    )


def pagerank(
    edges: DataFrame,
    damping: float = 0.85,
    iterations: int = 10,
    checkpoint_every: int = 1,
) -> DataFrame:
    """(node, rank) — power-iteration PageRank over ``(src, dst)``
    edges, with the textbook dangling-node treatment: a node with no
    out-edges spreads its rank uniformly over ALL nodes each step, so
    total rank mass stays exactly 1 and the result matches the
    stochastic-matrix formulation (what the nested-CTE oracle and the
    numpy pin compute).

    rank'(v) = (1-d)/N + d * (sum_{u->v} rank(u)/deg(u)
                              + dangling_mass/N)

    Fixed iteration count (no convergence collect in the loop);
    ``checkpoint_every`` controls how often the growing iterative plan
    is truncated. Deterministic up to float summation order.
    """
    if iterations < 0:
        raise ValueError("iterations must be >= 0")
    if checkpoint_every < 1:
        raise ValueError("checkpoint_every must be >= 1")
    e = edges.select("src", "dst").where(
        F.col("src").isNotNull() & F.col("dst").isNotNull()
    ).distinct()
    nodes = (
        e.select(F.col("src").alias("node"))
        .union(e.select(F.col("dst").alias("node")))
        .distinct()
    )
    n_nodes = nodes.count()
    if n_nodes == 0:
        return nodes.withColumn("rank", F.lit(0.0))
    deg = e.groupBy(F.col("src").alias("node")).agg(
        F.count("*").cast("double").alias("deg")
    )
    # (node, deg) with deg NULL for dangling nodes — one wide state row
    state = nodes.join(deg, "node", "left").withColumn(
        "rank", F.lit(1.0 / n_nodes)
    ).localCheckpoint(eager=True)

    for it in range(iterations):
        dangling = state.where(F.col("deg").isNull()).agg(
            F.coalesce(F.sum("rank"), F.lit(0.0)).alias("dmass")
        )
        contrib = (
            e.join(
                state.select(F.col("node").alias("src"), "rank", "deg"),
                "src",
            )
            .groupBy(F.col("dst").alias("node"))
            .agg(F.sum(F.col("rank") / F.col("deg")).alias("contrib"))
        )
        state = (
            state.select("node", "deg")
            .join(contrib, "node", "left")
            .crossJoin(F.broadcast(dangling))
            .withColumn(
                "rank",
                F.lit((1.0 - damping) / n_nodes)
                + F.lit(damping)
                * (
                    F.coalesce(F.col("contrib"), F.lit(0.0))
                    + F.col("dmass") / F.lit(float(n_nodes))
                ),
            )
            .select("node", "deg", "rank")
        )
        if (it + 1) % checkpoint_every == 0 or it == iterations - 1:
            state = state.localCheckpoint(eager=True)
    return state.select("node", "rank")
