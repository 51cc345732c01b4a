"""Block-max pruned top-k BM25 over compressed segments.

Distributed shape (SURVEY §3.3 "Spark shape"): the segment scan is
filtered by ``term IN (query terms)`` (parquet row-group / partition
pruning), matching blocks group by **shard** (doc-range partition), and
each shard runs an exact block-max-pruned scorer over its blocks —
embarrassingly parallel across shards, like Lucene segment search. The
global answer is ``orderBy(score desc, doc_id asc).limit(k)`` over the
per-shard top-k unions (a TakeOrderedAndProject over tiny inputs).

Per-shard algorithm — Block-Max WAND re-expressed as a batched interval
sweep (equivalent pruning, vectorizable):

1. *Metadata pass* (no decoding): every block contributes its BM25 upper
   bound ``block_max`` over its doc range [first_doc, last_doc]. A
   boundary sweep yields elementary doc intervals with
   ``ub(interval) = Σ block_max of covering blocks`` — exactly WAND's
   pivot upper bound, computed for all pivots at once. Elementary
   intervals partition the doc space, so every doc is scored at most
   once and never re-checked.
2. *θ-gated lazy decode + scoring*: intervals are consumed in
   decreasing-ub order in small batches. Only the blocks covering a
   consumed interval are ever DECODED (bulk varint decode of exactly
   the missing blocks, cached); the running k-th best exact score θ
   stops consumption at the first interval with ub < θ. Any unseen doc
   d lies in an unprocessed interval, so score(d) <= ub < θ —
   exactness holds, and decode work tracks the pruned frontier instead
   of the matched posting volume (decoding everything up-front made
   head-term latency linear in corpus size).

Scoring inside a batch is whole-batch NumPy: per-term posting slices are
concatenated, accumulated into the unique-doc vector in sorted-term
order (bit-identical summation order to the exact DataFrame scorer),
and the top-k state is merged with one lexsort — no per-doc Python, no
membership sets, no heap loop (reference analog: argpartition top-k
instead of a selection loop, vectors/simserver.py:349-356).
"""

from __future__ import annotations

from typing import Dict, List, Sequence, Tuple

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame, functions as F
from pyspark.sql.window import Window

from .segments import bm25_partial

__all__ = [
    "wand_topk",
    "wand_topk_batch",
    "shard_topk_pandas",
    "synonym_topk_pandas",
    "boolean_topk",
    "shard_boolean_pandas",
    "prefix_topk",
    "matched_docs",
    "boolean_topk_batch",
    "hit_count_bounds",
    "boolean_phrase_topk",
]


class _TermBlocks:
    """One (shard, term)'s block metadata + lazily decoded postings.

    ``idf``/``avgdl0`` are PER-BLOCK vectors: an appended store mixes
    block vintages (base blocks baked with build-time stats, delta
    blocks with batch-local placeholder stats), so a single scalar per
    (shard, term) would score one vintage with another's idf. Partials
    are always recomputed from the raw tf/dl streams — with the current
    idf when the caller supplies it (``idf_now``, the exact-stats
    serving path), else each block's own baked idf.
    """

    __slots__ = ("first", "last", "nd", "bmax", "idf", "avgdl0",
                 "docs_b", "tfs_b", "dls_b", "cache")

    def __init__(self, g: pd.DataFrame) -> None:
        self.first = g["first_doc"].to_numpy(np.int64)
        self.last = g["last_doc"].to_numpy(np.int64)
        self.bmax = g["block_max"].to_numpy(np.float64)
        self.nd = g["n_docs"].to_numpy(np.int64)
        self.idf = g["idf"].to_numpy(np.float64)
        self.avgdl0 = (
            g["avgdl0"].to_numpy(np.float64)
            if "avgdl0" in g.columns else None
        )
        self.docs_b = g["docs"].tolist()
        self.tfs_b = g["tfs"].tolist()
        self.dls_b = g["dls"].tolist()
        self.cache: Dict[int, Tuple[np.ndarray, np.ndarray]] = {}

    def effective_bmax(self, avgdl_now: float, idf_now) -> np.ndarray:
        """Per-block SOUND upper bounds under the serving-time stats:
        the baked bound is rescaled by idf_now/idf0 when current idf is
        supplied, and by max(1, avgdl_now/avgdl0) always — BM25's
        tf-normalization is increasing in avgdl with
        f(a_now) <= f(a0) * a_now/a0, so a corpus whose mean doclen
        drifted up between bakes can never sneak a doc past the pruning
        bound (latent unsoundness in the round-3 serving path, where
        partials used current avgdl but bounds kept the baked one)."""
        bm = self.bmax
        if idf_now is not None:
            bm = bm * (float(idf_now) / self.idf)
        if self.avgdl0 is not None:
            bm = bm * np.maximum(1.0, float(avgdl_now) / self.avgdl0)
        return bm

    def covering_block(self, lo: int) -> int:
        """Index of the block whose doc range covers *lo*, or -1.
        Elementary intervals never straddle a block boundary, so one
        block per term covers a whole interval."""
        bi = int(np.searchsorted(self.first, lo, side="right")) - 1
        if bi >= 0 and self.last[bi] >= lo:
            return bi
        return -1

    def decode(self, blocks: List[int], avgdl: float, idf_now=None) -> None:
        """Bulk-decode the listed (missing) blocks in 3 varint passes.

        Byte streams of arbitrary block subsets concatenate cleanly;
        delta coding restarts per block, so absolute doc ids are
        restored by subtracting each block's preceding cumulative sum —
        O(1) decode calls per batch instead of O(#blocks)."""
        from .segments import varint_decode

        deltas = varint_decode(
            b"".join(self.docs_b[b] for b in blocks)
        ).astype(np.int64)
        tf = varint_decode(
            b"".join(self.tfs_b[b] for b in blocks)
        ).astype(np.int64)
        dl = varint_decode(
            b"".join(self.dls_b[b] for b in blocks)
        ).astype(np.int64)
        nd = self.nd[blocks]
        cs = np.cumsum(deltas)
        starts = np.concatenate(([0], np.cumsum(nd)[:-1]))
        corr = np.where(starts > 0, cs[np.maximum(starts - 1, 0)], 0)
        docs_abs = cs - np.repeat(corr, nd)
        iv = (
            float(idf_now)
            if idf_now is not None
            else np.repeat(self.idf[blocks], nd)
        )
        parts = bm25_partial(tf, dl, iv, avgdl)
        ends = np.cumsum(nd)
        for j, b in enumerate(blocks):
            self.cache[b] = (docs_abs[starts[j]:ends[j]],
                             parts[starts[j]:ends[j]])

    def decode_docs(self, blocks: List[int]) -> np.ndarray:
        """Doc ids of the listed blocks, concatenated in block order —
        ONE varint pass, no tf/dl decode, no BM25 partials. The cheap
        path for consumers that never score: NOT-gating and exact hit
        counting pay a third of the full decode."""
        from .segments import varint_decode

        deltas = varint_decode(
            b"".join(self.docs_b[b] for b in blocks)
        ).astype(np.int64)
        nd = self.nd[blocks]
        cs = np.cumsum(deltas)
        starts = np.concatenate(([0], np.cumsum(nd)[:-1]))
        corr = np.where(starts > 0, cs[np.maximum(starts - 1, 0)], 0)
        return cs - np.repeat(corr, nd)


def synonym_topk_pandas(
    pdf: pd.DataFrame,
    groups: Sequence[Sequence[str]],
    n_docs: int,
    avgdl: float,
    min_df: int = 1,
) -> List[Tuple[int, float]]:
    """Exact SynonymQuery scoring over FETCHED segment blocks — the
    in-process serving path for mixed synonym groups (Searcher.synonym):
    every member term's blocks are decoded (raw tf/dl streams, so the
    group fold is exact regardless of block idf vintage), per-doc tf is
    summed within each group, group df = distinct docs over the decoded
    union (shards hold disjoint ranges, so a plain unique is global),
    and one Robertson idf + one saturation apply per group — scoring
    semantics identical to ``textops.synonym_group_scores`` over raw
    postings (parity test-pinned). Returns EVERY matched doc's
    (doc_id, score), sorted (score desc, doc_id asc) — the caller cuts
    k after its tombstone filter; no overfetch discipline is needed
    because the match set is complete.

    *pdf* is the driver-side fetch of the member-term-pruned segment
    scan, already capped by the caller (above the cap the distributed
    exact path takes over).
    """
    import math

    from .segments import varint_decode

    if not len(pdf):
        return []
    gid_of = {t: "|".join(g) for g in groups for t in g}
    per_gid: Dict[str, List[Tuple[np.ndarray, np.ndarray, np.ndarray]]] = {}
    for t, g in pdf.groupby("term", sort=True):
        gid = gid_of.get(t)
        if gid is None:
            continue
        g = g.sort_values(["shard", "first_doc"]).reset_index(drop=True)
        deltas = varint_decode(b"".join(g["docs"])).astype(np.int64)
        tf = varint_decode(b"".join(g["tfs"])).astype(np.int64)
        dl = varint_decode(b"".join(g["dls"])).astype(np.int64)
        nd = g["n_docs"].to_numpy(np.int64)
        cs = np.cumsum(deltas)
        starts = np.concatenate(([0], np.cumsum(nd)[:-1]))
        corr = np.where(starts > 0, cs[np.maximum(starts - 1, 0)], 0)
        docs = cs - np.repeat(corr, nd)
        per_gid.setdefault(gid, []).append((docs, tf, dl))

    # fold each group, then accumulate per doc in SORTED-gid order —
    # the same deterministic summation the relational path gets from
    # array_sort(collect_list(struct(gid, part)))
    folded: Dict[str, Tuple[np.ndarray, np.ndarray]] = {}
    for gid, chunks in per_gid.items():
        docs = np.concatenate([c[0] for c in chunks])
        tf = np.concatenate([c[1] for c in chunks])
        dl = np.concatenate([c[2] for c in chunks])
        order = np.argsort(docs, kind="mergesort")
        docs, tf, dl = docs[order], tf[order], dl[order]
        uniq, idx = np.unique(docs, return_index=True)
        tf_sum = np.add.reduceat(tf, idx)
        dl_u = dl[idx].astype(np.float64)
        df = int(uniq.size)
        if df < min_df:
            continue
        idf = math.log((n_docs - df + 0.5) / (df + 0.5) + 1.0)
        folded[gid] = (uniq, bm25_partial(tf_sum, dl_u, idf, avgdl))
    if not folded:
        return []
    all_docs = np.unique(np.concatenate([d for d, _ in folded.values()]))
    acc = np.zeros(all_docs.size, dtype=np.float64)
    for gid in sorted(folded):
        d, p = folded[gid]
        acc[np.searchsorted(all_docs, d)] += p
    order = np.lexsort((all_docs, -acc))
    return [(int(all_docs[i]), float(acc[i])) for i in order]


def shard_topk_pandas(
    pdf: pd.DataFrame,
    k: int,
    avgdl: float,
    stats_out: dict | None = None,
    interval_batch: int = 32,
    term_idf: Dict[str, float] | None = None,
) -> pd.DataFrame:
    """Exact top-k over one shard's blocks via the θ-gated interval sweep
    described in the module docstring.

    *term_idf* (exact-stats serving): current global idf per query
    term. Blocks are scored and bounded with THESE stats instead of
    their baked vintage (blocks store raw tf/dl, so the rescale is
    exact) — an appended, never-rebuilt store then ranks identically
    to a from-scratch build. Terms absent from the mapping are treated
    as pruned (global df < min_df ⇒ zero contribution, matching the
    scratch build that never wrote blocks for them).

    *stats_out* (optional dict) receives pruning observability counters:
    ``blocks_total``, ``blocks_decoded`` (== ``blocks_scored``),
    ``intervals_total``, ``intervals_processed``."""
    if term_idf is not None:
        pdf = pdf[pdf["term"].isin(set(term_idf))]
        if not len(pdf):
            return pd.DataFrame({"doc_id": [], "score": []})
    terms = sorted(pdf["term"].unique())
    tb: Dict[str, _TermBlocks] = {
        t: _TermBlocks(g.sort_values("first_doc").reset_index(drop=True))
        for t, g in pdf.groupby("term")
    }

    def _idf_now(t: str):
        return term_idf.get(t) if term_idf is not None else None

    # ---- metadata sweep: elementary intervals with summed block_max
    # (bounds rescaled to the serving-time stats — see effective_bmax)
    events: List[Tuple[int, float]] = []
    for t in terms:
        m = tb[t]
        bm_eff = m.effective_bmax(avgdl, _idf_now(t))
        for fd, ld, bm in zip(m.first, m.last, bm_eff):
            events.append((int(fd), float(bm)))
            events.append((int(ld) + 1, -float(bm)))
    if not events:
        return pd.DataFrame({"doc_id": [], "score": []})
    ev = pd.DataFrame(events, columns=["x", "d"]).groupby("x")["d"].sum()
    xs = ev.index.to_numpy()
    ubs = np.cumsum(ev.to_numpy())
    order = np.argsort(-ubs, kind="mergesort")

    top_docs = np.empty(0, dtype=np.int64)
    top_scores = np.empty(0, dtype=np.float64)
    theta = -np.inf
    n_processed = 0
    oi_ptr = 0
    stop = False

    while oi_ptr < len(order) and not stop:
        # ---- assemble the next θ-qualified interval batch
        batch: List[int] = []
        while oi_ptr < len(order) and len(batch) < interval_batch:
            oi = int(order[oi_ptr])
            ub = float(ubs[oi])
            if ub <= 0 or (top_docs.size >= k and ub < theta):
                stop = True  # ubs only decrease from here — WAND stop
                break
            batch.append(oi)
            oi_ptr += 1
        if not batch:
            break
        n_processed += len(batch)

        # ---- locate + lazily decode exactly the covering blocks
        iv: List[Tuple[int, int, Dict[str, int]]] = []
        need: Dict[str, set] = {t: set() for t in terms}
        for oi in batch:
            lo = int(xs[oi])
            hi = int(xs[oi + 1]) if oi + 1 < len(xs) else int(xs[-1]) + 1
            cover: Dict[str, int] = {}
            for t in terms:
                bi = tb[t].covering_block(lo)
                if bi >= 0:
                    cover[t] = bi
                    if bi not in tb[t].cache:
                        need[t].add(bi)
            iv.append((lo, hi, cover))
        for t in terms:
            if need[t]:
                tb[t].decode(sorted(need[t]), avgdl, idf_now=_idf_now(t))

        # ---- whole-batch scoring: slices per term, term-sorted sums
        tslices: Dict[str, List[Tuple[np.ndarray, np.ndarray]]] = {
            t: [] for t in terms
        }
        for lo, hi, cover in iv:
            for t, bi in cover.items():
                docs_blk, parts_blk = tb[t].cache[bi]
                i0 = int(np.searchsorted(docs_blk, lo, side="left"))
                i1 = int(np.searchsorted(docs_blk, hi, side="left"))
                if i1 > i0:
                    tslices[t].append((docs_blk[i0:i1], parts_blk[i0:i1]))
        slices_flat = [d for t in terms for d, _ in tslices[t]]
        if not slices_flat:
            continue
        docs_u = np.unique(np.concatenate(slices_flat))
        acc = np.zeros(docs_u.size, dtype=np.float64)
        for t in terms:  # term-sorted accumulation -> deterministic sums
            if tslices[t]:
                dd = np.concatenate([d for d, _ in tslices[t]])
                pp = np.concatenate([p for _, p in tslices[t]])
                acc[np.searchsorted(docs_u, dd)] += pp

        # ---- vectorized top-k merge + θ update (intervals are disjoint,
        # so docs_u never collides with previously kept docs)
        md = np.concatenate([top_docs, docs_u])
        ms = np.concatenate([top_scores, acc])
        if md.size > k:
            sel = np.lexsort((md, -ms))[:k]
            md, ms = md[sel], ms[sel]
        top_docs, top_scores = md, ms
        if top_docs.size >= k:
            theta = float(top_scores.min())

    if stats_out is not None:
        stats_out["blocks_total"] = int(len(pdf))
        n_dec = sum(len(tb[t].cache) for t in terms)
        stats_out["blocks_decoded"] = n_dec
        stats_out["blocks_scored"] = n_dec
        stats_out["intervals_total"] = int(len(order))
        stats_out["intervals_processed"] = n_processed

    out_order = np.lexsort((top_docs, -top_scores))
    return pd.DataFrame(
        {
            "doc_id": top_docs[out_order],
            "score": top_scores[out_order],
        }
    )


def wand_topk(
    segments: DataFrame,
    query_terms: Sequence[str],
    corpus: DataFrame,
    k: int = 10,
    term_idf: Dict[str, float] | None = None,
) -> DataFrame:
    """Top-k (rank, doc_id, score) over the compressed segment store.

    *term_idf* switches on exact-stats serving (see
    :func:`shard_topk_pandas`): pass the current global idf of the
    query's terms (plans/lineage.py::lookup_term_idf) to rank an
    appended, never-rebuilt store identically to a from-scratch build.
    """
    terms = sorted(set(query_terms))
    if term_idf is not None:
        terms = [t for t in terms if t in term_idf]
    spark = segments.sparkSession
    if not terms:
        return spark.createDataFrame([], "rank long, doc_id long, score double")
    crow = corpus.collect()[0]
    avgdl = float(crow["avgdl"])

    matched = segments.where(F.col("term").isin(terms))

    def per_partition(batches):
        """Score every shard present in this partition: one Python/Arrow
        round trip per TASK instead of one per shard (64 per-group
        applyInPandas calls cost ~0.4s of a sub-second query; grouping
        by shard inside the task is free). Shards are hash-partitioned
        so each shard's blocks land whole in exactly one partition."""
        chunks = [b for b in batches if len(b)]
        if not chunks:
            return
        pdf = pd.concat(chunks, ignore_index=True)
        for _, g in pdf.groupby("shard", sort=False):
            yield shard_topk_pandas(
                g.reset_index(drop=True), k, avgdl, term_idf=term_idf
            )

    # a quarter of the cluster's slots: plenty of parallelism for the
    # tiny matched-block relation while keeping the per-task Python
    # round-trip count low; grows with the cluster, so a large
    # deployment still fans shard scoring across executors
    n_tasks = max(1, spark.sparkContext.defaultParallelism // 4)
    shard_tops = matched.repartition(n_tasks, "shard").mapInPandas(
        per_partition, "doc_id long, score double"
    )
    w = Window.orderBy(F.desc("score"), F.asc("doc_id"))
    return (
        shard_tops.orderBy(F.desc("score"), F.asc("doc_id"))
        .limit(k)
        .withColumn("rank", F.row_number().over(w).cast("long"))
        .select("rank", "doc_id", "score")
    )


def wand_topk_batch(
    segments: DataFrame,
    queries,
    corpus: DataFrame,
    k: int = 10,
    term_idf: Dict[str, float] | None = None,
) -> DataFrame:
    """Top-k for a BATCH of queries in ONE job: (qid, rank, doc_id,
    score), per-query rank-identical to :func:`wand_topk`.

    *queries* maps qid -> term sequence. The segment scan is pruned to
    the UNION of all query terms (one parquet open, one shuffle), each
    task runs the θ-gated sweep per (query, local shard), and one
    per-qid window takes the global top-k. This is the query-THROUGHPUT
    shape at 10^12 docs: per-query jobs pay scheduling + scan-open
    costs N times, the batch pays them once — the reference's
    request-at-a-time simserver has no analog (vectors/simserver.py
    scores one query per full-matrix matvec). Shared terms across
    queries are fetched once; decode stays per-(query, shard) so each
    query's pruning frontier is unaffected by the others.
    """
    qitems = sorted(
        (str(q), sorted(set(ts))) for q, ts in dict(queries).items()
    )
    if term_idf is not None:
        # exact-stats serving (shared idf map across the batch): terms
        # outside the map are globally pruned — zero contribution
        qitems = [
            (q, [t for t in ts if t in term_idf]) for q, ts in qitems
        ]
    all_terms = sorted({t for _, ts in qitems for t in ts})
    spark = segments.sparkSession
    if not all_terms:
        return spark.createDataFrame(
            [], "qid string, rank long, doc_id long, score double"
        )
    crow = corpus.collect()[0]
    avgdl = float(crow["avgdl"])

    matched = segments.where(F.col("term").isin(all_terms))

    # term -> qids inverted index (driver-side, shipped in the task
    # closure): a task visits ONLY the queries whose terms are present
    # in its shard — at 10^3+-query batches a (query, shard) pair with
    # no matching terms costs zero work, where the previous per-query
    # isin() scan paid O(shard blocks) per query (round-4 verdict item
    # #5). Each present query then concats its terms' pre-grouped block
    # frames (shard_topk_pandas is row-order-insensitive: it re-groups
    # by term and sorts blocks by first_doc).
    qterms = dict(qitems)
    term_to_qids: Dict[str, List[str]] = {}
    for qid, ts in qitems:
        for t in ts:
            term_to_qids.setdefault(t, []).append(qid)

    def per_partition(batches):
        chunks = [b for b in batches if len(b)]
        if not chunks:
            return
        pdf = pd.concat(chunks, ignore_index=True)
        for _, g in pdf.groupby("shard", sort=False):
            by_term = {t: tg for t, tg in g.groupby("term", sort=False)}
            qids_here: set = set()
            for t in by_term:
                qids_here.update(term_to_qids.get(t, ()))
            for qid in sorted(qids_here):
                frames = [
                    by_term[t] for t in qterms[qid] if t in by_term
                ]
                sub = frames[0] if len(frames) == 1 else pd.concat(
                    frames, ignore_index=True
                )
                out = shard_topk_pandas(
                    sub.reset_index(drop=True), k, avgdl,
                    term_idf=term_idf,
                )
                if len(out):
                    out.insert(0, "qid", qid)
                    yield out

    n_tasks = max(1, spark.sparkContext.defaultParallelism // 4)
    shard_tops = matched.repartition(n_tasks, "shard").mapInPandas(
        per_partition, "qid string, doc_id long, score double"
    )
    w = Window.partitionBy("qid").orderBy(F.desc("score"), F.asc("doc_id"))
    return (
        shard_tops.withColumn("rank", F.row_number().over(w).cast("long"))
        .where(F.col("rank") <= k)
        .orderBy("qid", "rank")
        .select("qid", "rank", "doc_id", "score")
    )


def shard_boolean_pandas(
    pdf: pd.DataFrame,
    must: Sequence[str],
    should: Sequence[str],
    k: int,
    avgdl: float,
    must_not: Sequence[str] = (),
    term_idf: Dict[str, float] | None = None,
    gate_docs: "np.ndarray | None" = None,
) -> pd.DataFrame:
    """Boolean-gated exact top-k over ONE shard's blocks:
    a doc qualifies iff it carries EVERY ``must`` term and NO
    ``must_not`` term (within the indexed vocabulary), scored by the
    sum of BM25 partials over its matched ``must`` + ``should`` terms.

    Block-granular conjunction driving (Lucene's leapfrog, lifted to
    blocks): must terms are visited smallest-df first; the first is
    decoded fully, every later term decodes ONLY the blocks whose doc
    range overlaps the surviving candidate span, and exclusion /
    ``should`` scoring likewise decode only candidate-covering blocks.
    A rare must term therefore bounds the decode volume of its head-
    term conjuncts — the boolean analog of WAND's θ gate (pruning by
    upper bound is unsound under a NOT/AND gate, since a low-partial
    doc can still win once high-scoring docs are gated away).

    Doc-range sharding makes the gate shard-local: every posting of a
    given doc lives in this shard, so presence/absence is decided here
    and per-shard top-k union contains the global top-k.
    """
    empty = pd.DataFrame({"doc_id": [], "score": []})
    here = set(pdf["term"].unique())
    if any(t not in here for t in must):
        return empty  # strict AND: a missing conjunct empties the shard
    score_terms = sorted(set(must) | (set(should) & here))
    if not score_terms:
        return empty
    tb: Dict[str, _TermBlocks] = {
        t: _TermBlocks(g.sort_values("first_doc").reset_index(drop=True))
        for t, g in pdf.groupby("term")
    }

    def _idf_now(t: str):
        return term_idf.get(t) if term_idf is not None else None

    def postings_in(t: str, lo=None, hi=None):
        """(docs, parts) for *t* restricted to blocks overlapping
        [lo, hi] (all blocks when lo is None); decodes lazily."""
        m = tb[t]
        if lo is None:
            need = list(range(len(m.first)))
        else:
            need = [
                i
                for i in range(len(m.first))
                if m.last[i] >= lo and m.first[i] <= hi
            ]
        miss = [b for b in need if b not in m.cache]
        if miss:
            m.decode(miss, avgdl, idf_now=_idf_now(t))
        if not need:
            return (
                np.empty(0, dtype=np.int64),
                np.empty(0, dtype=np.float64),
            )
        return (
            np.concatenate([m.cache[b][0] for b in need]),
            np.concatenate([m.cache[b][1] for b in need]),
        )

    posted: Dict[str, Tuple[np.ndarray, np.ndarray]] = {}
    if must:
        by_df = sorted(must, key=lambda t: int(tb[t].nd.sum()))
        docs0, parts0 = postings_in(by_df[0])
        posted[by_df[0]] = (docs0, parts0)
        cand = docs0
        for t in by_df[1:]:
            if not cand.size:
                return empty
            docs, parts = postings_in(t, int(cand[0]), int(cand[-1]))
            posted[t] = (docs, parts)
            cand = cand[np.isin(cand, docs, assume_unique=True)]
        if not cand.size:
            return empty
    else:
        unions = []
        for t in score_terms:
            docs, parts = postings_in(t)
            posted[t] = (docs, parts)
            unions.append(docs)
        cand = np.unique(np.concatenate(unions))
    if gate_docs is not None:
        # external doc gate (e.g. phrase-clause matches — sorted unique
        # ids from THIS shard's doc range): applied before NOT/scoring
        # so gated-away docs can never occupy top-k slots
        if not cand.size:
            return empty
        cand = cand[np.isin(cand, gate_docs, assume_unique=True)]
    for t in sorted(set(must_not) & here):
        if not cand.size:
            return empty
        # NOT terms never score: docs-only decode (1 varint pass) of
        # the candidate-overlapping blocks
        lo, hi = int(cand[0]), int(cand[-1])
        m = tb[t]
        need = [
            i
            for i in range(len(m.first))
            if m.last[i] >= lo and m.first[i] <= hi
        ]
        if need:
            ex_docs = m.decode_docs(need)
            cand = cand[~np.isin(cand, ex_docs, assume_unique=True)]
    if not cand.size:
        return empty

    acc = np.zeros(cand.size, dtype=np.float64)
    lo, hi = int(cand[0]), int(cand[-1])
    for t in score_terms:  # term-sorted sums — deterministic, see WAND
        docs, parts = posted[t] if t in posted else postings_in(t, lo, hi)
        pos = np.searchsorted(cand, docs)
        pos_c = np.minimum(pos, cand.size - 1)
        mask = cand[pos_c] == docs
        acc[pos_c[mask]] += parts[mask]  # docs unique within a term
    sel = np.lexsort((cand, -acc))[:k]
    return pd.DataFrame({"doc_id": cand[sel], "score": acc[sel]})


def boolean_topk(
    segments: DataFrame,
    must: Sequence[str],
    corpus: DataFrame,
    should: Sequence[str] = (),
    must_not: Sequence[str] = (),
    k: int = 20,
    term_idf: Dict[str, float] | None = None,
) -> DataFrame:
    """Boolean (MUST / SHOULD / MUST_NOT) top-k over the compressed
    segment store: (rank, doc_id, score) — the serving-side counterpart
    of textops.bm25_boolean_topk (reference search.py exposes only
    plain OR; this is the Lucene BooleanQuery surface the index tier
    needs).

    Gate semantics run over the INDEXED vocabulary (df >= min_df at
    build time): a ``must`` term that was df-pruned empties the result,
    a df-pruned ``must_not`` term excludes nothing — exactly what a
    from-scratch build of the pruned index would answer. Same plan
    shape as :func:`wand_topk`: term-pruned scan, one shuffle to
    doc-range shards, per-shard gated scorer in one Arrow round-trip
    per task, global TakeOrdered over the tiny per-shard unions.

    *term_idf* is the exact-stats serving path (appended store, see
    wand_topk): terms absent from the map are globally pruned.
    """
    must = sorted(set(must))
    should = sorted(set(should) - set(must))
    must_not = sorted(set(must_not))
    spark = segments.sparkSession
    schema = "rank long, doc_id long, score double"
    if term_idf is not None:
        if any(t not in term_idf for t in must):
            return spark.createDataFrame([], schema)
        should = [t for t in should if t in term_idf]
        must_not = [t for t in must_not if t in term_idf]
    if not (must or should):
        return spark.createDataFrame([], schema)
    scan_terms = sorted(set(must) | set(should) | set(must_not))
    crow = corpus.collect()[0]
    avgdl = float(crow["avgdl"])

    matched = segments.where(F.col("term").isin(scan_terms))

    def per_partition(batches):
        chunks = [b for b in batches if len(b)]
        if not chunks:
            return
        pdf = pd.concat(chunks, ignore_index=True)
        for _, g in pdf.groupby("shard", sort=False):
            yield shard_boolean_pandas(
                g.reset_index(drop=True), must, should, k, avgdl,
                must_not=must_not, term_idf=term_idf,
            )

    n_tasks = max(1, spark.sparkContext.defaultParallelism // 4)
    shard_tops = matched.repartition(n_tasks, "shard").mapInPandas(
        per_partition, "doc_id long, score double"
    )
    w = Window.orderBy(F.desc("score"), F.asc("doc_id"))
    return (
        shard_tops.orderBy(F.desc("score"), F.asc("doc_id"))
        .limit(k)
        .withColumn("rank", F.row_number().over(w).cast("long"))
        .select("rank", "doc_id", "score")
    )


def prefix_topk(
    segments: DataFrame,
    prefix: str,
    corpus: DataFrame,
    k: int = 10,
    max_expand: int = 32,
    term_idf: Dict[str, float] | None = None,
    min_df: int = 1,
) -> DataFrame:
    """Trailing-wildcard query ``prefix*`` over the compressed segment
    store: (rank, doc_id, score).

    Two-step plan (Lucene MultiTermQuery rewrite): (1) expand the
    prefix against the segment TERM DICTIONARY — df per term is the
    exact ``sum(n_docs)`` over its blocks, since blocks partition the
    posting list — keeping the ``max_expand`` highest-df terms
    (df desc, term asc; the rewrite cap that stops a one-letter prefix
    from turning into a full-vocabulary disjunction), then (2) score
    the expansion through :func:`wand_topk` (block-max pruned, one
    shuffle). The expansion is a tiny driver list (<= max_expand
    strings), never posting data; the dictionary aggregation is one
    column-pruned scan with the ``startswith`` predicate pushed to
    parquet. Icelandic analog of the reference's autocomplete surface
    served from the index itself instead of a corpus pass.
    """
    # min_df gate on the expansion: an appended store's delta blocks
    # also hold sub-min_df terms (deltas bake at min_df=1); those must
    # not consume rewrite-cap slots the scratch build would never
    # spend. Post-backfill, a served term's block sum == its true df,
    # so the gate is exact.
    expansion = [
        r["term"]
        for r in (
            segments.where(F.col("term").startswith(prefix))
            .groupBy("term")
            .agg(F.sum("n_docs").cast("long").alias("df"))
            .where(F.col("df") >= int(min_df))
            .orderBy(F.desc("df"), F.asc("term"))
            .limit(int(max_expand))
            .collect()
        )
    ]
    if term_idf is not None:
        expansion = [t for t in expansion if t in term_idf]
    spark = segments.sparkSession
    if not expansion:
        return spark.createDataFrame(
            [], "rank long, doc_id long, score double"
        )
    return wand_topk(segments, expansion, corpus, k, term_idf=term_idf)


def matched_docs(
    segments: DataFrame, terms: Sequence[str]
) -> DataFrame:
    """DISTINCT (doc_id) matching ANY of *terms* — the totalHits /
    facet-base relation. Term-pruned scan, one shuffle to doc-range
    shards, whole-shard bulk varint decode + np.unique per task; shard
    doc ranges are disjoint, so the per-shard uniques concatenate into
    the global distinct set with NO cross-shard dedup shuffle."""
    terms = sorted(set(terms))
    spark = segments.sparkSession
    if not terms:
        return spark.createDataFrame([], "doc_id long")
    matched = segments.where(F.col("term").isin(terms))

    def per_partition(batches):
        chunks = [b for b in batches if len(b)]
        if not chunks:
            return
        pdf = pd.concat(chunks, ignore_index=True)
        for _, g in pdf.groupby("shard", sort=False):
            docs = []
            for _, tg in g.groupby("term", sort=False):
                m = _TermBlocks(
                    tg.sort_values("first_doc").reset_index(drop=True)
                )
                # counting never scores: docs-only decode (1/3 the work)
                docs.append(m.decode_docs(list(range(len(m.first)))))
            if docs:
                yield pd.DataFrame(
                    {"doc_id": np.unique(np.concatenate(docs))}
                )

    n_tasks = max(1, spark.sparkContext.defaultParallelism // 4)
    return matched.repartition(n_tasks, "shard").mapInPandas(
        per_partition, "doc_id long"
    )


def boolean_topk_batch(
    segments: DataFrame,
    queries,
    corpus: DataFrame,
    k: int = 20,
    term_idf: Dict[str, float] | None = None,
) -> DataFrame:
    """Top-k for a BATCH of boolean queries in ONE job: (qid, rank,
    doc_id, score), per-query rank-identical to :func:`boolean_topk`.

    *queries* maps qid -> (must, should, must_not) triples (sequences).
    Same batching discipline as :func:`wand_topk_batch`: the segment
    scan is pruned to the union of every query's scan terms (one
    parquet open, one shuffle), a term→qids inverted index skips
    (query, shard) pairs sharing no terms, and shared terms are fetched
    once while each query's gate/scoring state stays independent."""
    norm = {}
    for qid, spec in dict(queries).items():
        must, should, must_not = (list(spec[0]), list(spec[1]),
                                  list(spec[2]))
        must = sorted(set(must))
        should = sorted(set(should) - set(must))
        must_not = sorted(set(must_not))
        if term_idf is not None:
            if any(t not in term_idf for t in must):
                continue  # globally pruned conjunct: empty by contract
            should = [t for t in should if t in term_idf]
            must_not = [t for t in must_not if t in term_idf]
        if must or should:
            norm[str(qid)] = (must, should, must_not)
    spark = segments.sparkSession
    schema = "qid string, rank long, doc_id long, score double"
    if not norm:
        return spark.createDataFrame([], schema)
    all_terms = sorted(
        {t for m, s, n in norm.values() for t in (*m, *s, *n)}
    )
    crow = corpus.collect()[0]
    avgdl = float(crow["avgdl"])
    matched = segments.where(F.col("term").isin(all_terms))

    term_to_qids: Dict[str, List[str]] = {}
    for qid, (m, s, n) in sorted(norm.items()):
        for t in {*m, *s, *n}:
            term_to_qids.setdefault(t, []).append(qid)

    def per_partition(batches):
        chunks = [b for b in batches if len(b)]
        if not chunks:
            return
        pdf = pd.concat(chunks, ignore_index=True)
        for _, g in pdf.groupby("shard", sort=False):
            by_term = {t: tg for t, tg in g.groupby("term", sort=False)}
            qids_here: set = set()
            for t in by_term:
                qids_here.update(term_to_qids.get(t, ()))
            for qid in sorted(qids_here):
                m, s, n = norm[qid]
                frames = [
                    by_term[t]
                    for t in {*m, *s, *n}
                    if t in by_term
                ]
                sub = frames[0] if len(frames) == 1 else pd.concat(
                    frames, ignore_index=True
                )
                out = shard_boolean_pandas(
                    sub.reset_index(drop=True), m, s, k, avgdl,
                    must_not=n, term_idf=term_idf,
                )
                if len(out):
                    out.insert(0, "qid", qid)
                    yield out

    n_tasks = max(1, spark.sparkContext.defaultParallelism // 4)
    shard_tops = matched.repartition(n_tasks, "shard").mapInPandas(
        per_partition, "qid string, doc_id long, score double"
    )
    w = Window.partitionBy("qid").orderBy(F.desc("score"), F.asc("doc_id"))
    return (
        shard_tops.withColumn("rank", F.row_number().over(w).cast("long"))
        .where(F.col("rank") <= k)
        .orderBy("qid", "rank")
        .select("qid", "rank", "doc_id", "score")
    )


def hit_count_bounds(
    segments: DataFrame, terms: Sequence[str]
) -> DataFrame:
    """ONE row (lb_hits, ub_hits) bounding the matched-document count
    WITHOUT decoding a single block — the approximate-totalHits answer
    a result page shows instantly while :func:`matched_docs` computes
    the exact value. From block metadata only: per-term df is the exact
    ``sum(n_docs)`` over its blocks, the union is bounded below by the
    largest single term (containment) and above by the df sum
    (inclusion–exclusion truncated at one term). Metadata-sized scan —
    latency independent of posting volume at any corpus size."""
    terms = sorted(set(terms))
    spark = segments.sparkSession
    if not terms:
        return spark.createDataFrame([(0, 0)], "lb_hits long, ub_hits long")
    per_term = (
        segments.where(F.col("term").isin(terms))
        .groupBy("term")
        .agg(F.sum("n_docs").cast("long").alias("df"))
    )
    return per_term.agg(
        F.coalesce(F.max("df"), F.lit(0)).cast("long").alias("lb_hits"),
        F.coalesce(F.sum("df"), F.lit(0)).cast("long").alias("ub_hits"),
    )


def boolean_phrase_topk(
    segments: DataFrame,
    positions: DataFrame,
    corpus: DataFrame,
    phrases,
    must: Sequence[str] = (),
    should: Sequence[str] = (),
    must_not: Sequence[str] = (),
    k: int = 20,
    term_idf: Dict[str, float] | None = None,
) -> DataFrame:
    """Boolean retrieval with exact-PHRASE clauses: (rank, doc_id,
    score). A document qualifies iff it contains every phrase in
    *phrases* (consecutive tokens, the positional-segment matcher),
    every ``must`` term and no ``must_not`` term; scored by BM25 over
    its matched ``must`` + ``should`` terms (phrase words score only if
    the caller lists them in *should* — the Router's structured parser
    does). The Lucene BooleanQuery-with-PhraseQuery-clause surface.

    Plan shape: the BM25 segment store and the positional store MUST
    share the doc-range sharding (same shard_size — true for any
    IndexStore, whose meta pins it; ad-hoc builds must pass one
    explicit shard_size to both builders, as
    ``textops.bm25_boolean_phrase_topk`` does — equal n_shards alone is
    NOT enough, the two builders' default shard_size formulas diverge
    on sparse doc ids), so the phrase gate is SHARD-LOCAL: one
    ``cogroup().applyInPandas`` pairs each shard's term-pruned BM25
    blocks with its phrase-word positional blocks, the in-task matcher
    (phrase_counts_pandas) yields the gate ids, and the gated boolean
    kernel emits that shard's top-k — one job, no cross-table shuffle
    beyond the two pruned scans' own grouping.
    """
    from .posindex import phrase_counts_pandas

    must = sorted(set(must))
    should = sorted(set(should) - set(must))
    must_not = sorted(set(must_not))
    phrases = [list(p) for p in phrases]
    if not phrases:
        raise ValueError("boolean_phrase_topk requires >= 1 phrase")
    spark = segments.sparkSession
    schema = "rank long, doc_id long, score double"
    if term_idf is not None:
        if any(t not in term_idf for t in must):
            return spark.createDataFrame([], schema)
        should = [t for t in should if t in term_idf]
        must_not = [t for t in must_not if t in term_idf]
    if not (must or should):
        return spark.createDataFrame([], schema)
    scan_terms = sorted(set(must) | set(should) | set(must_not))
    phrase_words = sorted({w.lower() for p in phrases for w in p})
    crow = corpus.collect()[0]
    avgdl = float(crow["avgdl"])

    seg_m = segments.where(F.col("term").isin(scan_terms))
    pos_m = positions.where(F.col("term").isin(phrase_words))

    def per_shard(l: pd.DataFrame, r: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame({"doc_id": [], "score": []}).astype(
            {"doc_id": "int64", "score": "float64"}
        )
        if not len(l) or not len(r):
            return empty
        gd = None
        for p in phrases:
            g = phrase_counts_pandas(r, [w.lower() for w in p])
            ids = np.sort(g["doc_id"].to_numpy(np.int64))
            gd = ids if gd is None else gd[
                np.isin(gd, ids, assume_unique=True)
            ]
            if not gd.size:
                return empty
        out = shard_boolean_pandas(
            l.reset_index(drop=True), must, should, k, avgdl,
            must_not=must_not, term_idf=term_idf, gate_docs=gd,
        )
        return out.astype({"doc_id": "int64", "score": "float64"})

    shard_tops = (
        seg_m.groupBy("shard")
        .cogroup(pos_m.groupBy("shard"))
        .applyInPandas(per_shard, "doc_id long, score double")
    )
    w = Window.orderBy(F.desc("score"), F.asc("doc_id"))
    return (
        shard_tops.orderBy(F.desc("score"), F.asc("doc_id"))
        .limit(k)
        .withColumn("rank", F.row_number().over(w).cast("long"))
        .select("rank", "doc_id", "score")
    )
