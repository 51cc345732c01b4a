"""Zero-copy federated search: query N index stores AS ONE.

``merge_stores`` (plans/lineage.py) is the batch composition path —
physically fold stores and re-bake. This module is the SERVING
composition path: score every store with the GLOBAL corpus statistics
(summed df, summed doc counts, exact global avgdl from the carried
``total_doclen``) so the federated ranking equals a search over the
physically merged store (test-pinned by url+score), without moving a
byte of index data.

Why this matters at 10^12 docs: partition builds produce one store per
crawl slice; merging is a full re-bake you schedule, federation is
what you serve with in the meantime — and it is exactly Lucene's
multi-reader / distributed-IDF discipline (stats exchanged at query
open, scoring local to each shard-store).

Statistics convention matches the single-store serving layer: df and
n_docs count the BAKED universe (tombstoned docs still count until
their store's rebuild purges them); tombstones are excluded from the
RESULTS per store. A term's federated df is gated on the (shared)
``min_df`` — stores must agree on it, like :func:`merge_stores`.
"""

from __future__ import annotations

from typing import Dict, List, Optional, Sequence, Tuple

from pyspark.sql import SparkSession, functions as F

from ..plans.lineage import IndexStore, read_store_meta

__all__ = ["federated_term_stats", "federated_search",
           "FederatedSearcher"]


def federated_term_stats(
    spark: SparkSession,
    stores: Sequence[IndexStore],
    terms: Sequence[str],
    per_store_df: Optional[list] = None,
) -> Tuple[Dict[str, float], int, float]:
    """(term -> GLOBAL idf, global n_docs, global avgdl) across
    *stores* — the query-open stats exchange. Per store this is a
    term-pruned point read on the log-structured term_counts view plus
    the 1-row corpus; cost is O(stores × query terms), never O(vocab).
    Terms whose SUMMED df stays below the shared min_df are omitted
    (the merged store would never bake blocks for them).

    *per_store_df* (optional, caller-supplied empty list) receives one
    ``{term: local_df}`` dict per store, in store order — the signal
    :func:`federated_search` uses to detect local-pruning skew (a term
    under a store's LOCAL floor has no baked blocks there even when its
    global df qualifies it)."""
    import math

    from ..operators.postings import load_term_counts

    terms_u = sorted({t.lower() for t in terms})
    if not stores:
        raise ValueError("no stores")
    min_dfs = {int(read_store_meta(s)["min_df"]) for s in stores}
    if len(min_dfs) != 1:
        raise ValueError(
            f"min_df mismatch across stores: {sorted(min_dfs)} — "
            "federated scoring needs one pruning floor (see merge_stores)"
        )
    min_df = min_dfs.pop()
    df_sum: Dict[str, int] = {}
    n_docs = 0
    total_dl = 0
    for s in stores:
        crow = spark.read.parquet(s.corpus).collect()[0]
        n_docs += int(crow["n_docs"])
        if "total_doclen" in crow.asDict():
            total_dl += int(crow["total_doclen"])
        else:
            # legacy corpus row (no total_doclen): recover the EXACT
            # integer total from doc_stats — reconstructing it from the
            # rounded avgdl double drifts the federated avgdl away from
            # the physically merged store's integer-sum value and
            # quietly voids rank identity for mixed-vintage store sets
            # (advice r5). One sum over the store's doc_stats, paid
            # only by legacy stores at query open.
            total_dl += int(
                spark.read.parquet(s.doc_stats)
                .agg(F.sum("doclen"))
                .collect()[0][0]
                or 0
            )
        if not terms_u:
            if per_store_df is not None:
                per_store_df.append({})
            continue
        tc = (
            load_term_counts(spark, s.term_counts)
            .where(F.col("term").isin(terms_u))
            .select("term", "df")
            .collect()
        )
        if per_store_df is not None:
            per_store_df.append({r["term"]: int(r["df"]) for r in tc})
        for r in tc:
            df_sum[r["term"]] = df_sum.get(r["term"], 0) + int(r["df"])
    if n_docs == 0:
        return {}, 0, 0.0
    avgdl = total_dl / n_docs
    idfs = {
        t: math.log((n_docs - d + 0.5) / (d + 0.5) + 1.0)
        for t, d in df_sum.items()
        if d >= min_df
    }
    return idfs, n_docs, avgdl


def federated_search(
    spark: SparkSession,
    stores: Sequence[IndexStore],
    terms: Sequence[str],
    k: int = 10,
) -> List[Tuple[str, float]]:
    """[(url, score)] — BM25 top-k over the UNION of *stores*, ranked
    exactly as a search over their physical merge (``merge_stores``)
    would rank it: every store's WAND sweep runs with the federated
    idf/avgdl via the exact-stats ``term_idf`` override (the same
    mechanism that serves appended-unrebuilt stores), so block-baked
    per-store stats never leak into the scores.

    Results key on url (doc ids are store-local): a url present in
    several stores keeps its highest-scoring copy (ties: the copy is
    identical anyway — same global stats, same text ⇒ same score).
    Tombstones are excluded per store via the anti-joined doc_map with
    the capped-overfetch discipline (k + min(n_tomb, 3k) per store).

    Local-pruning skew (advice r5): a term whose LOCAL df in one store
    is below min_df has no baked blocks there even when its global
    (summed) df qualifies it, so that store's WAND sweep would silently
    drop the term's contribution while the physical merge re-bakes and
    scores it. Such stores are detected from the stats exchange's
    per-store counts and routed through the exact raw-postings scorer
    (``bm25_score_exact`` with the federated idf/avgdl — the same
    mechanism the boolean path always uses), whose term-sorted float64
    fold is bit-identical to the WAND scorer; all other stores keep the
    fast pruned sweep.
    """
    from ..operators.bm25 import bm25_score_exact
    from ..operators.wand import wand_topk

    local_dfs: list = []
    idfs, n_docs, avgdl = federated_term_stats(
        spark, stores, terms, per_store_df=local_dfs
    )
    if not idfs:
        return []
    min_df = int(read_store_meta(stores[0])["min_df"])
    corpus = spark.createDataFrame(
        [(n_docs, float(avgdl))], "n_docs long, avgdl double"
    )
    terms_u = sorted(idfs)
    # store index -> True when some globally-qualified term is present
    # locally (df > 0) but under the store's baked floor (df < min_df)
    exposed = [
        any(0 < ld.get(t, 0) < min_df for t in terms_u)
        for ld in local_dfs
    ]
    tstats = spark.createDataFrame(
        [(t, float(v)) for t, v in sorted(idfs.items())],
        "term string, idf double",
    )

    def one_store(si_s):
        si, s = si_s
        n_tomb = 0
        tomb = None
        if s.has("tombstones"):
            t = spark.read.parquet(s.tombstones).select("doc_id")
            n_tomb = t.count()
            tomb = t if n_tomb else None
        kk = k + min(n_tomb, 3 * k)
        if exposed[si]:
            scored = bm25_score_exact(
                spark.read.parquet(s.postings), tstats,
                spark.read.parquet(s.doc_stats), corpus, terms_u,
            )
            hits = (
                scored.orderBy(F.desc("score"), F.asc("doc_id"))
                .limit(kk)
            )
        else:
            hits = wand_topk(
                s.load_segments(spark), terms_u, corpus, kk, term_idf=idfs
            )
        dm = spark.read.parquet(s.doc_map).select("doc_id", "url")
        if tomb is not None:
            dm = dm.join(tomb, "doc_id", "left_anti")
        return hits.join(dm, "doc_id").select("url", "score").collect()

    # SCATTER concurrently: each store's query is an independent Spark
    # job chain, so federated latency is max(store), not sum(stores) —
    # on a real cluster the slices' executors work in parallel anyway
    merged: Dict[str, float] = {}
    for rows in _scatter(one_store, list(enumerate(stores))):
        for r in rows:
            u, sc = r["url"], float(r["score"])
            if u not in merged or sc > merged[u]:
                merged[u] = sc
    out = sorted(merged.items(), key=lambda kv: (-kv[1], kv[0]))
    return out[:k]


def _scatter(fn, stores):
    """Run *fn* over the stores concurrently (Spark job submission is
    thread-safe; the scheduler interleaves the independent job chains).
    Results come back in store order so url-dedup stays deterministic."""
    from concurrent.futures import ThreadPoolExecutor

    if len(stores) == 1:
        return [fn(stores[0])]
    with ThreadPoolExecutor(max_workers=min(len(stores), 8)) as ex:
        return list(ex.map(fn, stores))


class FederatedSearcher:
    """Interactive serving over N stores as one.

    * :meth:`search` — the global-stats BM25 path
      (:func:`federated_search`), rank-identical to the physical merge;
    * :meth:`phrase` / :meth:`near` — STAT-FREE measures (phrase tf /
      proximity tf are doc-local), so per-store serving through each
      store's own :class:`~.searcher.Searcher` (all its guard rails:
      capped fetch, distributed fallback, tombstone discipline, TTL
      cache) merges exactly; results key on url, ties break on url.

    * :meth:`boolean` — MUST/SHOULD/MUST_NOT with the merged store's
      semantics reproduced per store: gate and scoring terms prune on
      the GLOBAL df (from the stats exchange, so a must term under the
      global floor empties the result exactly like the merged store's
      indexed-vocab gate), the presence gate and scoring run over each
      store's RAW postings (immune to local-slice pruning skew), and
      scores use the global idf/avgdl. Exact but job-chain-served —
      the recall path, like the single-store synonym fallback.
    """

    def __init__(self, spark: SparkSession, stores, **searcher_kwargs):
        from .searcher import Searcher

        self.spark = spark
        self.stores = list(stores)
        if not self.stores:
            raise ValueError("no stores")
        min_dfs = {int(read_store_meta(s)["min_df"]) for s in self.stores}
        if len(min_dfs) != 1:
            raise ValueError(
                f"min_df mismatch across stores: {sorted(min_dfs)}"
            )
        self._searchers = [
            Searcher(spark, s, **searcher_kwargs) for s in self.stores
        ]

    def search(self, terms: Sequence[str], k: int = 10):
        return federated_search(self.spark, self.stores, terms, k)

    def _merge_counts(self, per_store: List[List[tuple]], k: int):
        merged: Dict[str, int] = {}
        for store, rows in zip(self.stores, per_store):
            if not rows:
                continue
            ids = [int(d) for d, _ in rows]
            urls = {
                int(r["doc_id"]): r["url"]
                for r in self.spark.read.parquet(store.doc_map)
                .where(F.col("doc_id").isin(ids))
                .select("doc_id", "url")
                .collect()
            }
            for d, tf in rows:
                u = urls[int(d)]
                if u not in merged or tf > merged[u]:
                    merged[u] = int(tf)
        out = sorted(merged.items(), key=lambda kv: (-kv[1], kv[0]))
        return out[:k]

    def phrase(self, words: Sequence[str], k: int = 10):
        """[(url, phrase_tf)] over the union of stores."""
        return self._merge_counts(
            _scatter(lambda s: s.phrase(words, k), self._searchers), k
        )

    def near(self, words: Sequence[str], window: int = 8, k: int = 10):
        """[(url, prox_tf)] over the union of stores."""
        return self._merge_counts(
            _scatter(lambda s: s.near(words, window=window, k=k),
                     self._searchers), k
        )

    def boolean(
        self,
        must: Sequence[str],
        should: Sequence[str] = (),
        must_not: Sequence[str] = (),
        k: int = 10,
    ) -> List[Tuple[str, float]]:
        """[(url, score)] — boolean retrieval over the union, rank-
        identical to the merged store's ``Searcher.boolean`` (pinned)."""
        from ..operators.bm25 import bm25_score_exact

        must = sorted({t.lower() for t in must})
        should = sorted({t.lower() for t in should})
        must_not = sorted({t.lower() for t in must_not})
        all_terms = sorted(set(must) | set(should) | set(must_not))
        idfs, n_docs, avgdl = federated_term_stats(
            self.spark, self.stores, all_terms
        )
        # the merged store's MUST gate runs over its indexed (global
        # df >= min_df) vocabulary: an unindexed must term can never
        # reach count == len(must) there, so it empties here too
        if any(t not in idfs for t in must):
            return []
        score_terms = [t for t in sorted(set(must) | set(should))
                       if t in idfs]
        # NOT terms below the global floor have no blocks in the merged
        # store — they must have no effect here either
        not_terms = [t for t in must_not if t in idfs]
        corpus = self.spark.createDataFrame(
            [(n_docs, float(avgdl))], "n_docs long, avgdl double"
        )
        tstats = self.spark.createDataFrame(
            [(t, float(v)) for t, v in sorted(idfs.items())],
            "term string, idf double",
        )
        def one_store(store: IndexStore):
            postings = self.spark.read.parquet(store.postings)
            if store.has("tombstones"):
                tomb = self.spark.read.parquet(store.tombstones).select(
                    "doc_id"
                )
                postings = postings.join(tomb, "doc_id", "left_anti")
            scored = bm25_score_exact(
                postings, tstats,
                self.spark.read.parquet(store.doc_stats),
                corpus, score_terms,
            )
            if must:
                gate = (
                    postings.where(F.col("term").isin(must))
                    .groupBy("doc_id")
                    .agg(F.countDistinct("term").alias("nm"))
                    .where(F.col("nm") == len(must))
                    .select("doc_id")
                )
                scored = scored.join(gate, "doc_id")
            if not_terms:
                ex = (
                    postings.where(F.col("term").isin(not_terms))
                    .select("doc_id")
                    .distinct()
                )
                scored = scored.join(ex, "doc_id", "left_anti")
            return (
                scored.orderBy(F.desc("score"), F.asc("doc_id"))
                .limit(k)
                .join(
                    self.spark.read.parquet(store.doc_map)
                    .select("doc_id", "url"),
                    "doc_id",
                )
                .select("url", "score")
                .collect()
            )

        merged: Dict[str, float] = {}
        for rows in _scatter(one_store, self.stores):
            for r in rows:
                u, sc = r["url"], float(r["score"])
                if u not in merged or sc > merged[u]:
                    merged[u] = sc
        out = sorted(merged.items(), key=lambda kv: (-kv[1], kv[0]))
        return out[:k]
