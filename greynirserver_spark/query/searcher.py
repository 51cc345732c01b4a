"""Low-latency BM25 serving over the segment store.

Two serving shapes exist for the same store (both rank-identical to the
exact scorer):

* ``wand_topk`` (operators/wand.py) — fully distributed; right when
  queries are batched or the matched posting volume is huge.
* :class:`Searcher` (this module) — single-query interactive path: the
  term-pruned, column-pruned parquet scan fetches only the matched
  blocks (a few KB for typical queries thanks to row-group stats), and
  the same interval-sweep block-max pruner scores them in-process.
  This is the analog of the reference's resident simserver process
  (vectors/simserver.py) — except the "index in memory" is replaced by
  pruned reads of an immutable columnar store, so it needs no 16-minute
  cold start (reference simserver.py:376-377) and no refresh protocol.

Guard rails for the interactive path:

* **fetch cap** — a head-term query at web scale can match more block
  rows than a driver should ever hold; above ``max_fetch_blocks`` the
  query transparently falls back to the distributed ``wand_topk`` plan
  (executors score, only top-k rows return). The default (5,000
  blocks) is set at the measured crossover: at 1M pages, head-term
  in-process scoring ran ~980ms p50 while distributed WAND ran ~500ms
  (BENCH.md round 4), so fetches past a few thousand blocks belong on
  the executors.
* **TTL result cache with snapshot invalidation** — mirrors the
  reference's query cache keyed on question + expiry
  (queries/__init__.py:1295-1324): entries expire after ``cache_ttl_s``,
  and any change of the store's segment snapshot (detected by mtime)
  clears the cache and re-opens the scan, so a re-committed index never
  serves stale answers within a process.
* **tombstone cap** — a delete backlog up to ``tombstone_driver_cap``
  ids is excluded by an in-driver set filter (zero per-query jobs);
  above it the backlog never leaves the executors: results are
  anti-joined distributed, and a query whose capped overfetch is
  swallowed by the filter falls to an EXACT distributed terminal plan
  (anti-joined postings / pre-top-k positional exclusion) instead of
  escalating the overfetch to k + n_tombstones.
"""

from __future__ import annotations

import os
import time
from collections import OrderedDict
from typing import List, Optional, Sequence, Tuple

import pandas as pd

from pyspark.sql import SparkSession, functions as F

from ..operators.wand import shard_topk_pandas, wand_topk
from ..plans.lineage import IndexStore

__all__ = ["Searcher"]


def _segments_version(store: IndexStore) -> float:
    """Cheap snapshot marker: newest mtime under the segments AND
    tombstones directories (a delete must invalidate query caches even
    though it touches no segment file). On Iceberg this would be the
    table's current snapshot id."""
    latest = 0.0
    for path in (store.segments, store.tombstones,
                 store.segments_backfill):
        try:
            with os.scandir(path) as it:
                for e in it:
                    latest = max(latest, e.stat().st_mtime)
        except FileNotFoundError:
            pass
    return latest


def _token_index_keys(text: str):
    """(original_tokens, index_keys) for *text* under the exact
    normalization the indexer applies (plans/pipeline.query_to_terms):
    lowercase token → vocabulary category → index filter → normalized
    ``stem/cat`` key; filtered tokens key to None but KEEP their
    display form, so snippet windows show the real prose."""
    import re as _re

    from ..corpus import vocabulary
    from ..tokenization import (
        CATEGORIES_TO_INDEX,
        MAX_WORD_LEN,
        NOINDEX_PAIRS,
        PY_TOKEN_SPLIT_RE,
    )

    vocab = vocabulary()
    cat_map = dict(zip(vocab["stem"], vocab["cat"]))
    noindex = {(s.lower(), c) for s, c in NOINDEX_PAIRS}
    toks: List[str] = []
    keys: List[Optional[str]] = []
    for tok in _re.split(PY_TOKEN_SPLIT_RE, text):
        if not tok:
            continue
        toks.append(tok)
        low = tok.lower()
        if len(low) > MAX_WORD_LEN:
            keys.append(None)
            continue
        cat = cat_map.get(low, "entity")
        if cat not in CATEGORIES_TO_INDEX or (low, cat) in noindex:
            keys.append(None)
        else:
            keys.append(
                low.replace("-", "").replace(" ", "_") + "/" + cat
            )
    return toks, keys


def _kwic_window(text: str, qset: set, width: int) -> str:
    """The ``2*width+1``-token window centered on a query-term match
    covering the most distinct query terms (ties → earliest); matched
    tokens wrapped in ``**``. Head of the document when nothing
    matches (a tombstone-filtered or stats-drifted edge)."""
    toks, keys = _token_index_keys(text)
    if not toks:
        return ""
    centers = [i for i, t in enumerate(keys) if t in qset]
    if not centers:
        lo, hi = 0, min(len(toks), 2 * width + 1)
    else:
        best_i, best_n = centers[0], -1
        for i in centers:
            n = len(
                {t for t in keys[max(0, i - width): i + width + 1]
                 if t in qset}
            )
            if n > best_n:
                best_i, best_n = i, n
        lo = max(0, best_i - width)
        hi = min(len(toks), best_i + width + 1)
    out = [
        f"**{toks[j]}**" if keys[j] in qset else toks[j]
        for j in range(lo, hi)
    ]
    return " ".join(out)


class Searcher:
    """Interactive top-k search over a persisted :class:`IndexStore`."""

    def __init__(
        self,
        spark: SparkSession,
        store: IndexStore,
        cache_size: int = 256,
        cache_ttl_s: float = 300.0,
        max_fetch_blocks: int = 5_000,
        version_check_interval_s: float = 1.0,
        tombstone_driver_cap: int = 100_000,
    ) -> None:
        self.spark = spark
        self.store = store
        self._cache_size = cache_size
        self._cache_ttl_s = cache_ttl_s
        self._max_fetch_blocks = max_fetch_blocks
        self._tombstone_driver_cap = tombstone_driver_cap
        self._version_check_interval_s = version_check_interval_s
        self._last_version_check = float("-inf")
        self._cache: OrderedDict[Tuple, Tuple[float, List[Tuple[int, float]]]]
        self._cache = OrderedDict()
        self._open()

    def _open(self) -> None:
        from ..operators.posindex import load_positional_block_counts

        self._segments = self.store.load_segments(self.spark)
        self._corpus_df = self.store.load(self.spark, "corpus")
        self._positions = (
            self.store.load(self.spark, "positions")
            if self.store.has("positions") else None
        )
        # store-maintained heavy-term summary: the distributed phrase
        # fallback's memory guard decides from this dict, no count job
        self._block_counts = load_positional_block_counts(self.store.root)
        # exact-stats serving: while un-rebuilt delta segments exist
        # (appends since the last rebuild), baked block idf mixes
        # vintages — look up the CURRENT idf for each query's terms
        # and rescale (pre-rebuild ranking becomes exact, not
        # approximate). A fresh or rebuilt store: baked stats ARE
        # current, no lookup job runs — the common path pays nothing.
        # The signal is the append/rebuild-owned dirty marker, NOT
        # has_runs: standalone count-store compaction folds the runs
        # without refreshing the delta blocks (plans/lineage.py).
        from ..plans.lineage import stats_need_rescale

        self._exact_stats = stats_need_rescale(self.store)
        self._idf_cache: dict = {}
        self._doc_map_df = None  # snippets' stored-fields handle, lazy
        self._doc_map_url_df = None  # collapsed/host handle, lazy
        from ..plans.lineage import read_store_meta

        try:
            self._min_df = int(read_store_meta(self.store)["min_df"])
        except (FileNotFoundError, KeyError):
            self._min_df = 1  # meta-less store: expansion gate off
        # tombstoned docs are excluded by overfetch-and-filter until the
        # next rebuild purges them. The driver-side id set is CAPPED
        # (round-4 verdict item #1): a GDPR-scale delete backlog (10^8
        # urls before the next rebuild) must not be collect()ed into
        # serving-driver memory — above the cap the set stays on the
        # executors (`_tomb_df`) and exclusion runs as distributed
        # anti-joins (the Router shape), with an exact distributed
        # terminal plan instead of unbounded overfetch escalation.
        self._tombstones: frozenset = frozenset()
        self._tomb_df = None
        self._n_tombstones = 0
        if self.store.has("tombstones"):
            tomb = self.store.load(self.spark, "tombstones").select(
                "doc_id"
            )
            # one probe job either way: fetch cap+1 rows — if they all
            # fit, that WAS the collect (the common case pays no
            # separate count); only an over-cap backlog pays the count
            cap = self._tombstone_driver_cap
            head = tomb.limit(cap + 1).collect()
            if len(head) <= cap:
                self._n_tombstones = len(head)
                self._tombstones = frozenset(
                    int(r["doc_id"]) for r in head
                )
            else:
                self._n_tombstones = tomb.count()
                self._tomb_df = tomb
        crow = self._corpus_df.collect()[0]
        self.avgdl = float(crow["avgdl"])
        self.n_docs = int(crow["n_docs"])
        self._version = _segments_version(self.store)

    def _check_snapshot(self) -> None:
        # throttled: stat-scanning the segment directory per QUERY is a
        # metadata-service hot-spot at scale; the version is trusted for
        # version_check_interval_s (staleness bound, reference-style)
        now = time.monotonic()
        if now - self._last_version_check < self._version_check_interval_s:
            return
        self._last_version_check = now
        v = _segments_version(self.store)
        if v != self._version:
            self._cache.clear()
            self._open()

    def _term_idf(self, terms) -> "dict | None":
        """Current global idf per query term (None when baked stats are
        exact — no appends since compaction). Cached per term; the
        cache dies with the snapshot (_open)."""
        if not self._exact_stats:
            return None
        from ..plans.lineage import lookup_term_idf

        missing = [t for t in terms if t not in self._idf_cache]
        if missing:
            if len(self._idf_cache) > 100_000:
                self._idf_cache.clear()  # bound a long-lived session
            found = lookup_term_idf(
                self.spark, self.store, missing, corpus=self._corpus_df
            )
            for t in missing:
                self._idf_cache[t] = found.get(t)  # None = pruned/absent
        return {
            t: self._idf_cache[t]
            for t in terms
            if self._idf_cache.get(t) is not None
        }

    @staticmethod
    def _overfetch_plan(k: int, n_tomb: int) -> List[int]:
        """Overfetch sizes to try in order: capped first (bounds both
        the fetch and any downstream re-rank), full k+n_tomb only when
        the capped pass is exhausted by the tombstone filter."""
        capped = k + min(n_tomb, 3 * k)
        full = k + n_tomb
        return [capped] if capped >= full else [capped, full]

    def _tombstone_plan(self, k: int) -> List[int]:
        """Above the driver cap the full k+n_tomb escalation rung is
        unbounded (a 10^8 backlog would turn every query into a 10^8
        top-k heap); serve one capped rung and let the exact
        distributed terminal plan handle the pathological fill-miss."""
        if self._tomb_df is not None:
            return [k + 3 * k]
        return self._overfetch_plan(k, self._n_tombstones)

    def _filter_tombstones(self, result: list) -> list:
        """Drop tombstoned ids from a ≤kk-row result: an in-driver set
        filter below the cap; above it ONE small anti-join job on the
        bounded result rows — the backlog itself never reaches the
        driver."""
        if not result:
            return result
        if self._tomb_df is None:
            if self._tombstones:
                return [
                    r for r in result if r[0] not in self._tombstones
                ]
            return result
        ids = self.spark.createDataFrame(
            [(int(r[0]),) for r in result], "doc_id long"
        )
        alive = {
            row["doc_id"]
            for row in ids.join(
                self._tomb_df, "doc_id", "left_anti"
            ).collect()
        }
        return [r for r in result if r[0] in alive]

    def _search_exact_excluding(
        self, terms_u: List[str], k: int
    ) -> List[Tuple[int, float]]:
        """Terminal plan for an above-cap delete backlog that swallowed
        the capped overfetch: score the anti-joined postings exactly —
        fully distributed, no overfetch at any backlog size, and
        rank-identical to the segment path (both read the same
        always-current derived term stats)."""
        from ..operators.bm25 import bm25_topk_exact

        postings = self.store.load(self.spark, "postings").join(
            self._tomb_df, "doc_id", "left_anti"
        )
        rows = bm25_topk_exact(
            postings,
            self.store.load(self.spark, "term_stats"),
            self.store.load(self.spark, "doc_stats"),
            self._corpus_df,
            terms_u,
            k,
        ).collect()
        return [(int(r["doc_id"]), float(r["score"])) for r in rows]

    def search(self, terms: Sequence[str], k: int = 10) -> List[Tuple[int, float]]:
        """[(doc_id, score)] — deterministic (score desc, doc_id asc)."""
        self._check_snapshot()
        key = (tuple(sorted(set(terms))), k)
        now = time.monotonic()
        hit = self._cache.get(key)
        if hit is not None:
            inserted, result = hit
            if now - inserted <= self._cache_ttl_s:
                self._cache.move_to_end(key)
                return result
            del self._cache[key]
        terms_u = sorted(set(terms))
        if not terms_u:
            return []
        # overfetch so tombstone-filtered results still fill k — CAPPED
        # (round-3 advice): a large delete backlog must not inflate
        # every query's k linearly, so fetch k + min(n_tomb, 3k) first
        # and escalate to the full k + n_tomb only if the filter
        # actually exhausts the results (rare: >3k of the top hits
        # tombstoned)
        term_idf = self._term_idf(terms_u)
        if term_idf is not None:
            terms_u = sorted(term_idf)
            if not terms_u:
                return []
        index_dry = False
        for kk in self._tombstone_plan(k):
            matched = self._segments.where(F.col("term").isin(terms_u))
            # one fetch job, capped: if the cap+1-th block exists the
            # matched volume is too big for the driver — fall back to
            # the distributed plan (executors score, only top-k return)
            pdf = matched.limit(self._max_fetch_blocks + 1).toPandas()
            if len(pdf) > self._max_fetch_blocks:
                rows = wand_topk(
                    self._segments, terms_u, self._corpus_df, kk,
                    term_idf=term_idf,
                ).collect()
                result = [
                    (int(r["doc_id"]), float(r["score"])) for r in rows
                ]
            elif len(pdf) == 0:
                result = []
            else:
                # score each shard independently (blocks of one shard
                # share a doc range), merge, global top-k
                tops = [
                    shard_topk_pandas(g, kk, self.avgdl, term_idf=term_idf)
                    for _, g in pdf.groupby("shard", sort=False)
                ]
                allhits = pd.concat(tops, ignore_index=True)
                allhits = allhits.sort_values(
                    ["score", "doc_id"], ascending=[False, True],
                    kind="mergesort",
                ).head(kk)
                result = list(
                    zip(
                        allhits["doc_id"].astype(int),
                        allhits["score"].astype(float),
                    )
                )
            n_found = len(result)
            result = self._filter_tombstones(result)
            index_dry = n_found < kk
            if len(result) >= k or index_dry:
                break  # filled k, or the index itself ran dry
        if self._tomb_df is not None and len(result) < k and not index_dry:
            result = self._search_exact_excluding(terms_u, k)
        result = result[:k]
        self._cache[key] = (now, result)
        if len(self._cache) > self._cache_size:
            self._cache.popitem(last=False)
        return result

    def _boolean_exact_excluding(
        self,
        must: List[str],
        should: List[str],
        must_not: List[str],
        k: int,
    ) -> List[Tuple[int, float]]:
        """Terminal plan for boolean queries under an above-cap delete
        backlog: gate + score the anti-joined postings exactly, fully
        distributed (the boolean analog of _search_exact_excluding).
        Gate over the indexed vocabulary (term_stats is the df>=min_df
        derived view): an unindexed must term can never reach
        count == len(must), so the strict-AND-over-index semantics of
        wand.boolean_topk fall out of the join itself."""
        from ..operators.bm25 import bm25_score_exact

        ts = self.store.load(self.spark, "term_stats")
        postings = self.store.load(self.spark, "postings").join(
            self._tomb_df, "doc_id", "left_anti"
        )
        score_terms = sorted(set(must) | set(should))
        scored = bm25_score_exact(
            postings, ts, self.store.load(self.spark, "doc_stats"),
            self._corpus_df, score_terms,
        )
        if must:
            gate = (
                postings.where(F.col("term").isin(must))
                .join(F.broadcast(ts.where(F.col("term").isin(must))
                                  .select("term")), "term")
                .groupBy("doc_id")
                .agg(F.countDistinct("term").alias("nm"))
                .where(F.col("nm") == len(must))
                .select("doc_id")
            )
            scored = scored.join(gate, "doc_id")
        if must_not:
            ex = (
                postings.where(F.col("term").isin(must_not))
                .join(F.broadcast(ts.where(F.col("term").isin(must_not))
                                  .select("term")), "term")
                .select("doc_id")
                .distinct()
            )
            scored = scored.join(ex, "doc_id", "left_anti")
        rows = (
            scored.orderBy(F.desc("score"), F.asc("doc_id"))
            .limit(k)
            .collect()
        )
        return [(int(r["doc_id"]), float(r["score"])) for r in rows]

    def boolean(
        self,
        must: Sequence[str],
        should: Sequence[str] = (),
        must_not: Sequence[str] = (),
        k: int = 10,
    ) -> List[Tuple[int, float]]:
        """Boolean (MUST/SHOULD/MUST_NOT) top-k: [(doc_id, score)],
        deterministic (score desc, doc_id asc). Same guard rails as
        :meth:`search` — capped in-process fetch with the per-shard
        gated scorer (wand.shard_boolean_pandas), distributed
        wand.boolean_topk above the cap, tombstone overfetch rungs,
        exact distributed terminal for an above-cap delete backlog,
        TTL cache. Gate semantics over the indexed (df >= min_df)
        vocabulary, like any pruned index."""
        from ..operators.wand import boolean_topk, shard_boolean_pandas

        self._check_snapshot()
        must = sorted({t.lower() for t in must})
        should = sorted({t.lower() for t in should} - set(must))
        must_not = sorted({t.lower() for t in must_not})
        if not (must or should):
            return []
        key = ("bool", tuple(must), tuple(should), tuple(must_not), k)
        now = time.monotonic()
        hit = self._cache.get(key)
        if hit is not None:
            inserted, result = hit
            if now - inserted <= self._cache_ttl_s:
                self._cache.move_to_end(key)
                return result
            del self._cache[key]
        scan_terms = sorted(set(must) | set(should) | set(must_not))
        term_idf = self._term_idf(scan_terms)
        if term_idf is not None:
            # exact-stats serving: a globally pruned must term means the
            # scratch index holds no postings for it — strict AND: empty
            if any(t not in term_idf for t in must):
                return []
            should = [t for t in should if t in term_idf]
            must_not = [t for t in must_not if t in term_idf]
            scan_terms = sorted(set(must) | set(should) | set(must_not))
        index_dry = False
        for kk in self._tombstone_plan(k):
            matched = self._segments.where(F.col("term").isin(scan_terms))
            pdf = matched.limit(self._max_fetch_blocks + 1).toPandas()
            if len(pdf) > self._max_fetch_blocks:
                rows = boolean_topk(
                    self._segments, must, self._corpus_df,
                    should=should, must_not=must_not, k=kk,
                    term_idf=term_idf,
                ).collect()
                result = [
                    (int(r["doc_id"]), float(r["score"])) for r in rows
                ]
            elif len(pdf) == 0:
                result = []
            else:
                tops = [
                    shard_boolean_pandas(
                        g.reset_index(drop=True), must, should, kk,
                        self.avgdl, must_not=must_not, term_idf=term_idf,
                    )
                    for _, g in pdf.groupby("shard", sort=False)
                ]
                allhits = pd.concat(tops, ignore_index=True)
                allhits = allhits.sort_values(
                    ["score", "doc_id"], ascending=[False, True],
                    kind="mergesort",
                ).head(kk)
                result = list(
                    zip(
                        allhits["doc_id"].astype(int),
                        allhits["score"].astype(float),
                    )
                )
            n_found = len(result)
            result = self._filter_tombstones(result)
            index_dry = n_found < kk
            if len(result) >= k or index_dry:
                break
        if self._tomb_df is not None and len(result) < k and not index_dry:
            result = self._boolean_exact_excluding(
                must, should, must_not, k
            )
        result = result[:k]
        self._cache[key] = (now, result)
        if len(self._cache) > self._cache_size:
            self._cache.popitem(last=False)
        return result

    def prefix(
        self, prefix: str, k: int = 10, max_expand: int = 32
    ) -> List[Tuple[int, float]]:
        """Trailing-wildcard ``prefix*`` top-k: [(doc_id, score)].
        In-process path pays ZERO extra jobs for the expansion: the
        capped fetch pulls every block whose term starts with the
        prefix, df per term is summed from block ``n_docs`` in pandas,
        the cap keeps the max_expand highest-df terms (df desc, term
        asc — wand.prefix_topk's exact rewrite rule), and the SAME
        fetched frame restricted to the expansion feeds the interval-
        sweep scorer. Above the fetch cap: distributed
        wand.prefix_topk. Same tombstone rungs/terminal as search."""
        self._check_snapshot()
        prefix = prefix.lower()
        if not prefix:
            return []
        key = ("prefix", prefix, k, max_expand)
        now = time.monotonic()
        hit = self._cache.get(key)
        if hit is not None:
            inserted, result = hit
            if now - inserted <= self._cache_ttl_s:
                self._cache.move_to_end(key)
                return result
            del self._cache[key]
        index_dry = False
        expansion: List[str] = []
        for kk in self._tombstone_plan(k):
            matched = self._segments.where(
                F.col("term").startswith(prefix)
            )
            pdf = matched.limit(self._max_fetch_blocks + 1).toPandas()
            if len(pdf) > self._max_fetch_blocks:
                # distributed: expand against the dictionary (one tiny
                # LIKE-pruned agg), then WAND with exact-stats idf for
                # the expansion when the store has un-rebuilt appends
                erows = (
                    self._segments.where(F.col("term").startswith(prefix))
                    .groupBy("term")
                    .agg(F.sum("n_docs").cast("long").alias("df"))
                    .where(F.col("df") >= self._min_df)
                    .orderBy(F.desc("df"), F.asc("term"))
                    .limit(int(max_expand))
                    .collect()
                )
                expansion = [r["term"] for r in erows]
                term_idf = self._term_idf(expansion)
                if term_idf is not None:
                    expansion = sorted(term_idf)
                if not expansion:
                    result = []
                else:
                    rows = wand_topk(
                        self._segments, expansion, self._corpus_df, kk,
                        term_idf=term_idf,
                    ).collect()
                    result = [
                        (int(r["doc_id"]), float(r["score"]))
                        for r in rows
                    ]
                expansion = sorted(expansion)
            elif len(pdf) == 0:
                result = []
            else:
                dfs = (
                    pdf.groupby("term")["n_docs"].sum().reset_index()
                )
                # min_df expansion gate (see wand.prefix_topk)
                dfs = dfs[dfs["n_docs"] >= self._min_df]
                dfs = dfs.sort_values(
                    ["n_docs", "term"], ascending=[False, True],
                    kind="mergesort",
                ).head(int(max_expand))
                expansion = sorted(dfs["term"].tolist())
                sub = pdf[pdf["term"].isin(expansion)]
                term_idf = self._term_idf(expansion)
                if term_idf is not None:
                    expansion = sorted(term_idf)
                    sub = sub[sub["term"].isin(expansion)]
                if not len(sub):
                    result = []
                else:
                    tops = [
                        shard_topk_pandas(
                            g.reset_index(drop=True), kk, self.avgdl,
                            term_idf=term_idf,
                        )
                        for _, g in sub.groupby("shard", sort=False)
                    ]
                    allhits = pd.concat(tops, ignore_index=True)
                    allhits = allhits.sort_values(
                        ["score", "doc_id"], ascending=[False, True],
                        kind="mergesort",
                    ).head(kk)
                    result = list(
                        zip(
                            allhits["doc_id"].astype(int),
                            allhits["score"].astype(float),
                        )
                    )
            n_found = len(result)
            result = self._filter_tombstones(result)
            index_dry = n_found < kk
            if len(result) >= k or index_dry:
                break
        if self._tomb_df is not None and len(result) < k and not index_dry:
            if not expansion:
                # recompute the expansion from the derived term stats
                # (one tiny distributed agg: LIKE-pruned, LIMITed)
                ts = self.store.load(self.spark, "term_stats")
                erows = (
                    ts.where(F.col("term").startswith(prefix))
                    .orderBy(F.desc("df"), F.asc("term"))
                    .limit(int(max_expand))
                    .select("term")
                    .collect()
                )
                expansion = sorted(r["term"] for r in erows)
            result = (
                self._search_exact_excluding(expansion, k)
                if expansion else []
            )
        result = result[:k]
        self._cache[key] = (now, result)
        if len(self._cache) > self._cache_size:
            self._cache.popitem(last=False)
        return result

    def _boolean_phrase_exact_excluding(
        self, phrases, must, should, must_not, k: int
    ) -> List[Tuple[int, float]]:
        """Terminal plan for phrase-clause boolean under an above-cap
        delete backlog: boolean gates + exact scoring over anti-joined
        postings (the _boolean_exact_excluding shape), phrase gates
        from the positional segments with the backlog excluded
        distributed (pre-top-k anti-join inside the positional op)."""
        from ..operators.bm25 import bm25_score_exact
        from ..operators.posindex import phrase_match_counts_segments

        ts = self.store.load(self.spark, "term_stats")
        postings = self.store.load(self.spark, "postings").join(
            self._tomb_df, "doc_id", "left_anti"
        )
        scored = bm25_score_exact(
            postings, ts, self.store.load(self.spark, "doc_stats"),
            self._corpus_df, sorted(set(must) | set(should)),
        )
        if must:
            gate = (
                postings.where(F.col("term").isin(must))
                .join(F.broadcast(ts.where(F.col("term").isin(must))
                                  .select("term")), "term")
                .groupBy("doc_id")
                .agg(F.countDistinct("term").alias("nm"))
                .where(F.col("nm") == len(must))
                .select("doc_id")
            )
            scored = scored.join(gate, "doc_id")
        if must_not:
            ex = (
                postings.where(F.col("term").isin(must_not))
                .select("doc_id").distinct()
            )
            scored = scored.join(ex, "doc_id", "left_anti")
        for p in phrases:
            # membership gate: unordered counts — no global sort of a
            # common phrase's full match set
            ids = phrase_match_counts_segments(
                self._positions, self.spark, list(p),
                block_counts=self._block_counts,
                exclude_docs=self._tomb_df,
            ).select("doc_id")
            scored = scored.join(ids, "doc_id")
        rows = (
            scored.orderBy(F.desc("score"), F.asc("doc_id"))
            .limit(k)
            .collect()
        )
        return [(int(r["doc_id"]), float(r["score"])) for r in rows]

    def boolean_phrase(
        self,
        phrases,
        must: Sequence[str] = (),
        should: Sequence[str] = (),
        must_not: Sequence[str] = (),
        k: int = 10,
    ) -> List[Tuple[int, float]]:
        """Boolean + exact-phrase-clause top-k: [(doc_id, score)].
        In-process path: ONE capped fetch per store (scan-term BM25
        blocks + phrase-word positional blocks), per-shard phrase gate
        (phrase_counts_pandas) feeding the gated boolean kernel;
        distributed wand.boolean_phrase_topk above either cap; tombstone
        rungs with an exact distributed terminal. Requires a store
        built ``with_positions=True``."""
        from ..operators.posindex import phrase_counts_pandas
        from ..operators.wand import (
            boolean_phrase_topk,
            shard_boolean_pandas,
        )

        if self._positions is None:
            raise ValueError(
                "store has no positional segments "
                "(build with with_positions=True)"
            )
        self._check_snapshot()
        phrases = [[w.lower() for w in p] for p in phrases if p]
        must = sorted({t.lower() for t in must})
        should = sorted({t.lower() for t in should} - set(must))
        must_not = sorted({t.lower() for t in must_not})
        if not (phrases and (must or should)):
            return []
        key = ("boolph", tuple(tuple(p) for p in phrases),
               tuple(must), tuple(should), tuple(must_not), k)
        now = time.monotonic()
        hit = self._cache.get(key)
        if hit is not None:
            inserted, result = hit
            if now - inserted <= self._cache_ttl_s:
                self._cache.move_to_end(key)
                return result
            del self._cache[key]
        scan_terms = sorted(set(must) | set(should) | set(must_not))
        term_idf = self._term_idf(scan_terms)
        if term_idf is not None:
            if any(t not in term_idf for t in must):
                return []
            should = [t for t in should if t in term_idf]
            must_not = [t for t in must_not if t in term_idf]
            # recompute after the prune (as boolean() does): fetching a
            # globally pruned head term's blocks wastes I/O and can
            # needlessly push the capped fetch over _max_fetch_blocks
            scan_terms = sorted(set(must) | set(should) | set(must_not))
        phrase_words = sorted({w for p in phrases for w in p})
        import numpy as np

        index_dry = False
        for kk in self._tombstone_plan(k):
            seg_pdf = (
                self._segments.where(F.col("term").isin(scan_terms))
                .limit(self._max_fetch_blocks + 1).toPandas()
            )
            pos_pdf = (
                self._positions.where(F.col("term").isin(phrase_words))
                .limit(self._max_fetch_blocks + 1).toPandas()
            )
            if (len(seg_pdf) > self._max_fetch_blocks
                    or len(pos_pdf) > self._max_fetch_blocks):
                rows = boolean_phrase_topk(
                    self._segments, self._positions, self._corpus_df,
                    phrases, must=must, should=should,
                    must_not=must_not, k=kk, term_idf=term_idf,
                ).collect()
                result = [
                    (int(r["doc_id"]), float(r["score"])) for r in rows
                ]
            elif len(seg_pdf) == 0 or len(pos_pdf) == 0:
                result = []
            else:
                pos_by_shard = dict(tuple(pos_pdf.groupby("shard")))
                tops = []
                for shard, g in seg_pdf.groupby("shard", sort=False):
                    r = pos_by_shard.get(shard)
                    if r is None:
                        continue
                    gd = None
                    for p in phrases:
                        gm = phrase_counts_pandas(r, p)
                        ids = np.sort(
                            gm["doc_id"].to_numpy(np.int64)
                        )
                        gd = ids if gd is None else gd[
                            np.isin(gd, ids, assume_unique=True)
                        ]
                        if not gd.size:
                            break
                    if gd is None or not gd.size:
                        continue
                    tops.append(
                        shard_boolean_pandas(
                            g.reset_index(drop=True), must, should,
                            kk, self.avgdl, must_not=must_not,
                            term_idf=term_idf, gate_docs=gd,
                        )
                    )
                if tops:
                    allhits = pd.concat(tops, ignore_index=True)
                    allhits = allhits.sort_values(
                        ["score", "doc_id"], ascending=[False, True],
                        kind="mergesort",
                    ).head(kk)
                    result = list(
                        zip(
                            allhits["doc_id"].astype(int),
                            allhits["score"].astype(float),
                        )
                    )
                else:
                    result = []
            n_found = len(result)
            result = self._filter_tombstones(result)
            index_dry = n_found < kk
            if len(result) >= k or index_dry:
                break
        if self._tomb_df is not None and len(result) < k and not index_dry:
            result = self._boolean_phrase_exact_excluding(
                phrases, must, should, must_not, k
            )
        result = result[:k]
        self._cache[key] = (now, result)
        if len(self._cache) > self._cache_size:
            self._cache.popitem(last=False)
        return result

    def search_page(
        self, terms: Sequence[str], page_size: int = 10,
        offset: int = 0,
    ) -> List[Tuple[int, float]]:
        """Paged results: page at *offset* = the ``offset+page_size``
        top-k with the head sliced off (Lucene searchAfter-by-refetch;
        the TTL cache serves repeated walks). Deep offsets are
        deliberately not optimized — deep paging a 10^12-doc index is
        an anti-pattern; batch jobs are the bulk-export path."""
        if offset < 0 or page_size <= 0:
            raise ValueError("offset >= 0 and page_size > 0 required")
        return self.search(terms, offset + page_size)[offset:]

    def facets(
        self, terms: Sequence[str], facet: str = "domain", k: int = 10
    ) -> List[Tuple[str, int]]:
        """[(facet_value, doc_count)] over the ANY-of match set — the
        aggregation panel a search UI renders next to the hit list
        (Lucene/Solr facets; the reference's per-source article
        grouping, routes/news.py:62-96). ``facet='domain'`` groups by
        the url host from ``doc_map``; any other name must be a
        ``doc_map`` column. The match set is the decode-only compressed
        scan (operators/facets.py::facet_counts_segments — never
        scores); tombstones are excluded DISTRIBUTED (anti-join), so a
        mass-delete backlog cannot skew the counts or the driver."""
        self._check_snapshot()
        tl = sorted({t.lower() for t in terms})
        if not tl:
            return []
        key = ("facets", tuple(tl), facet, k)
        now = time.monotonic()
        hit = self._cache.get(key)
        if hit is not None:
            inserted, result = hit
            if now - inserted <= self._cache_ttl_s:
                self._cache.move_to_end(key)
                return result
            del self._cache[key]
        from ..operators.facets import facet_counts_segments

        dim = self.store.load(self.spark, "doc_map")
        if facet == "domain" and "domain" not in dim.columns:
            from ..sources.pages import host_of

            dim = dim.withColumn("domain", host_of(F.col("url")))
        if self._tomb_df is not None:
            dim = dim.join(self._tomb_df, "doc_id", "left_anti")
        elif self._tombstones:
            tomb = self.spark.createDataFrame(
                [(int(d),) for d in self._tombstones], "doc_id long"
            )
            dim = dim.join(tomb, "doc_id", "left_anti")
        rows = facet_counts_segments(
            self._segments, dim, tl, facet, k
        ).collect()
        result = [(r["facet"], int(r["doc_count"])) for r in rows]
        while len(self._cache) >= self._cache_size:
            self._cache.popitem(last=False)
        self._cache[key] = (now, result)
        return result

    def synonym(
        self, groups: Sequence[Sequence[str]], k: int = 10
    ) -> List[Tuple[int, float]]:
        """[(doc_id, score)] — SynonymQuery retrieval: each *group* of
        terms scores as ONE pseudo-term (summed tf, any-member df, one
        idf + saturation), the correct expansion semantics for
        synonyms/inflections (corpus twin:
        ``textops.bm25_synonym_topk``, which documents why).

        Served as the EXACT distributed path over the store's raw
        postings (the ``_boolean_exact_excluding`` shape): group tf/df
        are query-time aggregates, so there is no baked per-group
        block_max to drive a WAND sweep — and synonym expansion is the
        long-tail recall query, not the hot path. Stats follow the
        serving convention every other path uses: group df counts the
        BAKED posting universe (so a singleton group scores identically
        to :meth:`search` even under a delete backlog), and tombstoned
        docs are excluded from the RESULTS by anti-join, with stats
        drift resolved at rebuild. Group df is gated on the store's own
        ``min_df``."""
        from ..operators.textops import (
            normalize_synonym_groups,
            synonym_group_scores,
        )

        norm = normalize_synonym_groups(groups)
        if all(len(g) == 1 for g in norm):
            # degenerate query (no real group): the WAND serving path
            # is rank-identical (pinned) and several times faster
            return self.search([g[0] for g in norm], k)
        self._check_snapshot()
        key = ("synonym", tuple(tuple(g) for g in norm), k)
        now = time.monotonic()
        hit = self._cache.get(key)
        if hit is not None:
            inserted, result = hit
            if now - inserted <= self._cache_ttl_s:
                self._cache.move_to_end(key)
                return result
            del self._cache[key]
        # in-process path: member-term-pruned block fetch, exact group
        # fold over the decoded raw tf/dl streams (rank-identical to
        # the distributed path — test-pinned). The scored match set is
        # COMPLETE, so tombstones filter exactly with no overfetch.
        members = sorted({t for g in norm for t in g})
        from ..operators.wand import synonym_topk_pandas

        matched = self._segments.where(F.col("term").isin(members))
        pdf = matched.limit(self._max_fetch_blocks + 1).toPandas()
        # NOTE: an empty fetch does NOT short-circuit to [] — every
        # member could be present-but-pruned (term df < min_df while
        # the group's fold over raw postings still scores), which the
        # coverage guard below routes to the distributed exact path,
        # same as any other uncovered member (advice r5).
        # coverage guard: segments are df-pruned at bake time but the
        # group fold's semantics (and the distributed path) include
        # sub-min_df member terms from the RAW postings. A member with
        # no fetched blocks is either absent from the corpus (fold
        # unaffected) or present-but-pruned (fold would under-count) —
        # indistinguishable from here, so any uncovered member routes
        # to the distributed exact path.
        covered = set(pdf["term"].unique())
        if set(members) <= covered and len(pdf) <= self._max_fetch_blocks:
            scored_all = synonym_topk_pandas(
                pdf, norm, self.n_docs, self.avgdl, min_df=self._min_df
            )
            # capped-overfetch tombstone discipline (the search shape):
            # filter only the head, never ship the whole match set to
            # the anti-join under a mass-delete backlog
            kk = k + min(self._n_tombstones, 3 * k)
            result = self._filter_tombstones(scored_all[:kk])
            if len(result) >= k or kk >= len(scored_all):
                result = result[:k]
                while len(self._cache) >= self._cache_size:
                    self._cache.popitem(last=False)
                self._cache[key] = (now, result)
                return result
            # backlog swallowed the capped head: exact distributed
            # terminal below (anti-joined before the top-k cut)
        scored = synonym_group_scores(
            self.spark,
            self.store.load(self.spark, "postings"),
            self.store.load(self.spark, "doc_stats"),
            self._corpus_df,
            norm,
            min_df=self._min_df,
        )
        if self._tomb_df is not None:
            scored = scored.join(self._tomb_df, "doc_id", "left_anti")
        elif self._tombstones:
            tomb = self.spark.createDataFrame(
                [(int(d),) for d in self._tombstones], "doc_id long"
            )
            scored = scored.join(tomb, "doc_id", "left_anti")
        rows = (
            scored.orderBy(F.desc("score"), F.asc("doc_id"))
            .limit(k)
            .collect()
        )
        result = [(int(r["doc_id"]), float(r["score"])) for r in rows]
        while len(self._cache) >= self._cache_size:
            self._cache.popitem(last=False)
        self._cache[key] = (now, result)
        return result

    def suggest(self, prefix: str, k: int = 10) -> List[Tuple[str, int]]:
        """[(term, df)] — query completion from the index's OWN
        vocabulary (the term_stats derived view): terms starting with
        *prefix*, most-frequent first (df desc, term asc). One
        prefix-pushed scan over the stats store, TTL-cached; corpus
        twin: ``textops.suggest_terms``."""
        p = (prefix or "").lower()
        if not p:
            raise ValueError("empty prefix")
        self._check_snapshot()
        key = ("suggest", p, k)
        now = time.monotonic()
        hit = self._cache.get(key)
        if hit is not None:
            inserted, result = hit
            if now - inserted <= self._cache_ttl_s:
                self._cache.move_to_end(key)
                return result
            del self._cache[key]
        rows = (
            self.store.load(self.spark, "term_stats")
            .where(F.col("term").startswith(p))
            .orderBy(F.desc("df"), F.asc("term"))
            .limit(k)
            .select("term", "df")
            .collect()
        )
        result = [(r["term"], int(r["df"])) for r in rows]
        while len(self._cache) >= self._cache_size:
            self._cache.popitem(last=False)
        self._cache[key] = (now, result)
        return result

    def search_collapsed(
        self, terms: Sequence[str], k: int = 10, per_domain: int = 2
    ) -> List[Tuple[int, str, float]]:
        """[(doc_id, domain, score)] — :meth:`search` with site
        collapse: at most *per_domain* hits per url host, the result
        diversification a web-search page applies so one mirror-heavy
        host cannot monopolize it (corpus twin:
        ``textops.bm25_topk_source_collapsed``).

        Overfetch-and-collapse: fetch a growing prefix of the ranked
        list (``search`` brings its own tombstone/cache/fallback guard
        rails), resolve hosts with a doc_id-pruned ``doc_map`` point
        read, keep greedily under the cap, and double the fetch until
        k survive or the index runs dry — the ranked prefix property
        makes the greedy cap exact for the documents it has seen."""
        per_domain = max(int(per_domain), 1)
        tl = sorted({t.lower() for t in terms})
        if not tl:
            return []
        self._check_snapshot()
        key = ("collapsed", tuple(tl), k, per_domain)
        now = time.monotonic()
        hit = self._cache.get(key)
        if hit is not None:
            inserted, result = hit
            if now - inserted <= self._cache_ttl_s:
                self._cache.move_to_end(key)
                return result
            del self._cache[key]
        from ..sources.pages import host_of

        # generous first prefix (advice r5): every escalation is a COLD
        # search (the result cache keys on (terms, k)), so starting at
        # 2x the target instead of k halves the expected escalation
        # count on host-concentrated result sets. The greedy cap over a
        # ranked prefix is schedule-independent — any prefix with k
        # survivors yields the same k — so results are unchanged.
        fetch = 2 * max(k, 10)
        result: List[Tuple[int, str, float]] = []
        hosts: dict = {}  # resolved once per id across fetch doublings
        while True:
            hits = self.search(tl, fetch)
            new_ids = [int(d) for d, _ in hits if int(d) not in hosts]
            if new_ids:
                # one doc_map handle per snapshot (file listing
                # amortized, the snippets pattern); ids are assigned in
                # write order, so isin() prunes at row-group level
                if self._doc_map_url_df is None:
                    self._doc_map_url_df = self.store.load(
                        self.spark, "doc_map"
                    ).select("doc_id", "url")
                dm = (
                    self._doc_map_url_df
                    .where(F.col("doc_id").isin(new_ids))
                    .select("doc_id", host_of(F.col("url")).alias("h"))
                )
                hosts.update(
                    {int(r["doc_id"]): r["h"] for r in dm.collect()}
                )
            counts: dict = {}
            result = []
            for d, s in hits:
                h = hosts.get(int(d), "")
                c = counts.get(h, 0)
                if c < per_domain:
                    counts[h] = c + 1
                    result.append((int(d), h, float(s)))
                    if len(result) == k:
                        break
            if len(result) >= k or len(hits) < fetch:
                break  # filled k, or the index itself ran dry
            fetch *= 2
        while len(self._cache) >= self._cache_size:
            self._cache.popitem(last=False)
        self._cache[key] = (now, result)
        return result

    def explain(
        self, terms: Sequence[str], doc_id: int
    ) -> List[Tuple[str, float, float]]:
        """[(term, idf, contrib)] — the per-term breakdown of THIS
        index's serving score for one document (the Lucene
        ``explain()`` surface; corpus twin:
        ``textops.bm25_score_breakdown``). Contributions come from the
        same compressed blocks, varint decode and exact-stats idf
        rescale as :meth:`search`, so they sum to the served score
        (test-pinned). The fetch is doc-range-pruned: shards hold
        disjoint doc ranges, so ``first_doc <= doc_id <= last_doc``
        narrows the scan to the handful of covering blocks per term."""
        import numpy as np

        from ..operators.wand import _TermBlocks

        self._check_snapshot()
        doc_id = int(doc_id)
        # a tombstoned doc has NO serving score to explain — returning
        # its decoded breakdown would fabricate one search() never emits
        if doc_id in self._tombstones:
            return []
        if self._tomb_df is not None:
            # above-cap backlog: membership needs a point job — memoized
            # per (snapshot, doc_id) so repeated explains of one doc
            # (the interactive pattern) pay it once
            cache = getattr(self, "_tomb_probe_cache", None)
            if cache is None or cache.get("_v") != self._version:
                cache = {"_v": self._version}
                self._tomb_probe_cache = cache
            gone = cache.get(doc_id)
            if gone is None:
                gone = bool(
                    self._tomb_df.where(F.col("doc_id") == doc_id)
                    .limit(1)
                    .count()
                )
                if len(cache) < 100_000:
                    cache[doc_id] = gone
            if gone:
                return []
        terms_u = sorted({t.lower() for t in terms})
        if not terms_u:
            return []
        term_idf = self._term_idf(terms_u)
        if term_idf is not None:
            terms_u = sorted(term_idf)
            if not terms_u:
                return []
        pdf = (
            self._segments.where(
                F.col("term").isin(terms_u)
                & (F.col("first_doc") <= doc_id)
                & (F.col("last_doc") >= doc_id)
            ).toPandas()
        )
        out: List[Tuple[str, float, float]] = []
        for t, g in pdf.groupby("term", sort=True):
            m = _TermBlocks(g.sort_values("first_doc").reset_index(drop=True))
            idf_now = term_idf.get(t) if term_idf is not None else None
            idxs = list(range(len(m.first)))
            m.decode(idxs, self.avgdl, idf_now=idf_now)
            contrib, used_idf = 0.0, None
            for b in idxs:
                docs, parts = m.cache[b]
                j = int(np.searchsorted(docs, doc_id))
                if j < len(docs) and docs[j] == doc_id:
                    contrib += float(parts[j])
                    used_idf = (
                        float(idf_now) if idf_now is not None
                        else float(m.idf[b])
                    )
            if used_idf is not None:
                out.append((str(t), used_idf, contrib))
        return out

    def snippets(
        self, terms: Sequence[str], k: int = 10, width: int = 12
    ) -> List[Tuple[int, float, str]]:
        """[(doc_id, score, snippet)] — :meth:`search`'s top-k with a
        keyword-in-context snippet per hit (the Lucene stored-fields +
        highlighter surface; the reference renders article excerpts the
        same way in its web UI).

        Stored fields come for free: ``doc_map`` retains the extracted
        text, so only the ≤k WINNING documents are fetched — a
        doc_id-pruned parquet point read, never a corpus scan. Snippet
        selection runs driver-side over those k texts: each text token
        is normalized to its index key (the exact query_to_terms
        pipeline, so stemming/category rules match the index), and the
        chosen window of ``2*width+1`` tokens is the one centered on a
        matching token that covers the MOST DISTINCT query terms (ties
        → earliest). Matched tokens are wrapped in ``**``."""
        hits = self.search(terms, k)
        if not hits:
            return []
        qset = set(terms)
        ids = [int(d) for d, _ in hits]
        # one doc_map handle per snapshot (file listing amortized);
        # doc ids are assigned in write order, so the isin() predicate
        # prunes at the parquet row-group level
        if getattr(self, "_doc_map_df", None) is None:
            self._doc_map_df = self.store.load(
                self.spark, "doc_map"
            ).select("doc_id", "text")
        texts = {
            int(r["doc_id"]): r["text"]
            for r in self._doc_map_df
            .where(F.col("doc_id").isin(ids))
            .collect()
        }
        return [
            (d, s, _kwic_window(texts.get(d, ""), qset, width))
            for d, s in hits
        ]

    def near(
        self, words: Sequence[str], window: int = 8, k: int = 10
    ) -> List[Tuple[int, int]]:
        """[(doc_id, prox_tf)] — proximity (NEAR/``window``) top-k
        served from the COMPRESSED positional segments, with the same
        guard rails as :meth:`phrase`: term-pruned capped fetch with
        the in-process counter, distributed fallback above the cap,
        tombstone overfetch + exact distributed terminal, TTL cache."""
        from ..operators.posindex import (
            proximity_counts_pandas,
            proximity_topk_segments,
        )

        if self._positions is None:
            raise ValueError(
                "store has no positional segments "
                "(build with with_positions=True)"
            )
        self._check_snapshot()
        words = [w.lower() for w in words]
        if not words:
            return []
        window = max(int(window), 1)
        key = ("near", tuple(words), window, k)
        now = time.monotonic()
        hit = self._cache.get(key)
        if hit is not None:
            inserted, result = hit
            if now - inserted <= self._cache_ttl_s:
                self._cache.move_to_end(key)
                return result
            del self._cache[key]
        index_dry = False
        for kk in self._tombstone_plan(k):
            matched = self._positions.where(
                F.col("term").isin(sorted(set(words)))
            )
            pdf = matched.limit(self._max_fetch_blocks + 1).toPandas()
            if len(pdf) > self._max_fetch_blocks:
                rows = proximity_topk_segments(
                    self._positions, self.spark, words,
                    window=window, k=kk,
                    block_counts=self._block_counts,
                ).collect()
                result = [
                    (int(r["doc_id"]), int(r["prox_tf"])) for r in rows
                ]
            else:
                counts = proximity_counts_pandas(pdf, words, window)
                counts = counts.sort_values(
                    ["prox_tf", "doc_id"], ascending=[False, True],
                    kind="mergesort",
                ).head(kk)
                result = list(
                    zip(counts["doc_id"].astype(int),
                        counts["prox_tf"].astype(int))
                )
            n_found = len(result)
            result = self._filter_tombstones(result)
            index_dry = n_found < kk
            if len(result) >= k or index_dry:
                break
        if self._tomb_df is not None and len(result) < k and not index_dry:
            rows = proximity_topk_segments(
                self._positions, self.spark, words,
                window=window, k=k,
                block_counts=self._block_counts,
                exclude_docs=self._tomb_df,
            ).collect()
            result = [
                (int(r["doc_id"]), int(r["prox_tf"])) for r in rows
            ]
        result = result[:k]
        self._cache[key] = (now, result)
        if len(self._cache) > self._cache_size:
            self._cache.popitem(last=False)
        return result

    def ordered_near(
        self, words: Sequence[str], window: int = 8, k: int = 10
    ) -> List[Tuple[int, int]]:
        """[(doc_id, oprox_tf)] — ORDERED proximity (terms in order
        within a ``window``-token span, the phrase-with-slop form) from
        the COMPRESSED positional segments, with :meth:`near`'s guard
        rails: term-pruned capped fetch with the in-process vectorized
        chain walk, distributed fallback above the cap, tombstone
        overfetch + exact distributed terminal, TTL cache."""
        from ..operators.posindex import (
            ordered_proximity_counts_pandas,
            ordered_proximity_topk_segments,
        )

        if self._positions is None:
            raise ValueError(
                "store has no positional segments "
                "(build with with_positions=True)"
            )
        self._check_snapshot()
        words = [w.lower() for w in words]
        if not words:
            return []
        window = max(int(window), len(words))
        key = ("onear", tuple(words), window, k)
        now = time.monotonic()
        hit = self._cache.get(key)
        if hit is not None:
            inserted, result = hit
            if now - inserted <= self._cache_ttl_s:
                self._cache.move_to_end(key)
                return result
            del self._cache[key]
        index_dry = False
        for kk in self._tombstone_plan(k):
            matched = self._positions.where(
                F.col("term").isin(sorted(set(words)))
            )
            pdf = matched.limit(self._max_fetch_blocks + 1).toPandas()
            if len(pdf) > self._max_fetch_blocks:
                rows = ordered_proximity_topk_segments(
                    self._positions, self.spark, words,
                    window=window, k=kk,
                    block_counts=self._block_counts,
                ).collect()
                result = [
                    (int(r["doc_id"]), int(r["oprox_tf"])) for r in rows
                ]
            else:
                counts = ordered_proximity_counts_pandas(
                    pdf, words, window
                )
                counts = counts.sort_values(
                    ["oprox_tf", "doc_id"], ascending=[False, True],
                    kind="mergesort",
                ).head(kk)
                result = list(
                    zip(counts["doc_id"].astype(int),
                        counts["oprox_tf"].astype(int))
                )
            n_found = len(result)
            result = self._filter_tombstones(result)
            index_dry = n_found < kk
            if len(result) >= k or index_dry:
                break
        if self._tomb_df is not None and len(result) < k and not index_dry:
            rows = ordered_proximity_topk_segments(
                self._positions, self.spark, words,
                window=window, k=k,
                block_counts=self._block_counts,
                exclude_docs=self._tomb_df,
            ).collect()
            result = [
                (int(r["doc_id"]), int(r["oprox_tf"])) for r in rows
            ]
        result = result[:k]
        self._cache[key] = (now, result)
        if len(self._cache) > self._cache_size:
            self._cache.popitem(last=False)
        return result

    def phrase(
        self, words: Sequence[str], k: int = 10
    ) -> List[Tuple[int, int]]:
        """[(doc_id, phrase_tf)] — exact consecutive-phrase top-k served
        in-process from the COMPRESSED positional segments
        (operators/posindex.py), with the same guard rails as
        :meth:`search`: term-pruned capped fetch, distributed fallback
        above the cap, TTL cache. Requires a store built
        ``with_positions=True``."""
        from ..operators.posindex import (
            phrase_counts_pandas,
            phrase_topk_positional_segments,
        )

        if self._positions is None:
            raise ValueError(
                "store has no positional segments "
                "(build with with_positions=True)"
            )
        self._check_snapshot()
        words = [w.lower() for w in words]
        if not words:
            return []
        key = ("phrase", tuple(words), k)
        now = time.monotonic()
        hit = self._cache.get(key)
        if hit is not None:
            inserted, result = hit
            if now - inserted <= self._cache_ttl_s:
                self._cache.move_to_end(key)
                return result
            del self._cache[key]
        index_dry = False
        for kk in self._tombstone_plan(k):
            matched = self._positions.where(
                F.col("term").isin(sorted(set(words)))
            )
            pdf = matched.limit(self._max_fetch_blocks + 1).toPandas()
            if len(pdf) > self._max_fetch_blocks:
                rows = phrase_topk_positional_segments(
                    self._positions, self.spark, words, kk,
                    block_counts=self._block_counts,
                ).collect()
                result = [
                    (int(r["doc_id"]), int(r["phrase_tf"])) for r in rows
                ]
            else:
                counts = phrase_counts_pandas(pdf, words)
                counts = counts.sort_values(
                    ["phrase_tf", "doc_id"], ascending=[False, True],
                    kind="mergesort",
                ).head(kk)
                result = list(
                    zip(counts["doc_id"].astype(int),
                        counts["phrase_tf"].astype(int))
                )
            n_found = len(result)
            result = self._filter_tombstones(result)
            index_dry = n_found < kk
            if len(result) >= k or index_dry:
                break
        if self._tomb_df is not None and len(result) < k and not index_dry:
            # terminal: the positional operator excludes the backlog
            # distributed, before its top-k cut — exact at any size
            rows = phrase_topk_positional_segments(
                self._positions, self.spark, words, k,
                block_counts=self._block_counts,
                exclude_docs=self._tomb_df,
            ).collect()
            result = [
                (int(r["doc_id"]), int(r["phrase_tf"])) for r in rows
            ]
        result = result[:k]
        self._cache[key] = (now, result)
        if len(self._cache) > self._cache_size:
            self._cache.popitem(last=False)
        return result
