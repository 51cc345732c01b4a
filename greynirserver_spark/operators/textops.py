"""Full-text operators over the generic ``documents`` table.

Same engine semantics as the pages pipeline (tokenize -> postings ->
stats -> BM25), but category-free (plain terms) and intentionally
expressible 1:1 in ANSI SQL so DuckDB can oracle-check every step
(the driver's correctness gate).

Cross-engine determinism rules used throughout:
* floats exposed to the oracle comparison are ``round(x, 4)`` (or 6),
* every ordering uses the *rounded* value plus a total tie-break
  (doc_id / term), so Spark and DuckDB produce identical rows,
* averages are computed as exact-integer-sum / count.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame, SparkSession, functions as F
from pyspark.sql.window import Window

from ..tokenization import MAX_WORD_LEN, TOKEN_SPLIT_RE

__all__ = [
    "load_documents",
    "document_tokens",
    "document_postings",
    "document_term_stats",
    "document_corpus_stats",
    "bm25_documents_topk",
    "bm25_topk_source_collapsed",
    "bm25_score_breakdown",
    "suggest_terms",
    "bm25_synonym_topk",
    "bm25_boolean_topk",
    "quality_scores",
    "document_fingerprints",
    "chunk_documents",
    "perplexity_buckets",
    "TOKEN_SPLIT_RE",
]

K1 = 1.2
B = 0.75


def load_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/documents.parquet")


def document_tokens(docs: DataFrame) -> DataFrame:
    """(doc_id, term): lower-cased regex tokens, 1..64 chars. JVM-side."""
    return (
        docs.select(
            "doc_id",
            F.explode(F.split(F.lower("text"), TOKEN_SPLIT_RE)).alias("term"),
        )
        .where((F.length("term") >= 1) & (F.length("term") <= MAX_WORD_LEN))
    )


def document_postings(docs: DataFrame) -> DataFrame:
    """(term, doc_id, tf) — map-side partial agg, then final hash agg."""
    return (
        document_tokens(docs)
        .groupBy("term", "doc_id")
        .agg(F.count("*").cast("long").alias("tf"))
    )


def document_term_stats(docs: DataFrame, min_df: int = 3) -> DataFrame:
    """(term, df, cf) with df >= min_df pruning (builder.py:176 analog)."""
    return (
        document_postings(docs)
        .groupBy("term")
        .agg(
            F.count("*").cast("long").alias("df"),
            F.sum("tf").cast("long").alias("cf"),
        )
        .where(F.col("df") >= min_df)
    )


def document_corpus_stats(docs: DataFrame) -> DataFrame:
    """1 row (n_docs, avgdl): doc count and mean token length (round 6)."""
    doclen = document_tokens(docs).groupBy("doc_id").agg(
        F.count("*").cast("long").alias("doclen")
    )
    return doclen.agg(
        F.count("*").alias("n_docs"),
        F.round(F.sum("doclen").cast("double") / F.count("*"), 6).alias("avgdl"),
    )


def bm25_idf(df_col, n_docs_col):
    """Robertson idf expression — THE one copy of the formula (shared
    by the plain, synonym-group and serving scorers)."""
    return F.log(
        (n_docs_col - df_col + F.lit(0.5)) / (df_col + F.lit(0.5))
        + F.lit(1.0)
    )


def bm25_part(tf_col, doclen_col, avgdl_col, idf_col):
    """One term's (or pseudo-term's) BM25 contribution expression."""
    return (
        idf_col
        * (tf_col * (K1 + 1.0))
        / (tf_col + K1 * (1.0 - B + B * doclen_col / avgdl_col))
    )


def normalize_synonym_groups(
    groups: Sequence[Sequence[str]],
) -> "list[list[str]]":
    """Lowercase/dedupe synonym groups and reject a term appearing in
    more than one group — shared by :func:`bm25_synonym_topk` and
    ``Searcher.synonym`` so the twins keep identical input contracts
    (both raise on an effectively empty query)."""
    norm: list = []
    seen: set = set()
    for g in groups:
        gl = sorted({t.lower() for t in g})
        if not gl:
            continue
        overlap = seen.intersection(gl)
        if overlap:
            raise ValueError(
                f"term(s) {sorted(overlap)} appear in more than one group"
            )
        seen.update(gl)
        norm.append(gl)
    if not norm:
        raise ValueError("empty query")
    return norm


def _bm25_term_parts(
    docs: DataFrame, query_terms: Sequence[str], min_df: int = 3,
    postings: DataFrame | None = None,
) -> DataFrame:
    """Per-(doc, matched term) BM25 scoring rows — the shared pipeline
    behind :func:`bm25_documents_topk`, :func:`bm25_topk_source_collapsed`
    and :func:`bm25_score_breakdown`.

    Columns: (doc_id, term, tf, df, idf, doclen, avgdl, part) where
    ``part`` is the term's un-rounded BM25 contribution.
    """
    terms = sorted(set(query_terms))
    # postings feed three consumers (doclen, df stats, scoring); cache so
    # the tokenize subtree runs once — the production serving path reads
    # materialized segments instead (bm25_wand_documents_topk / wand.py)
    if postings is None:
        postings = document_postings(docs).cache()
    # doclen feeds BOTH the corpus stats and the scoring join; without a
    # materialization the two subtrees differ by a join-injected
    # isnotnull filter, Spark's exchange reuse misses, and the full
    # postings aggregation runs twice per query (plan-verified). One
    # eager localCheckpoint = one aggregation, and the ~n_docs result
    # gets exact size stats so the scoring join broadcasts it.
    doclen = (
        postings.groupBy("doc_id").agg(
            F.sum("tf").cast("long").alias("doclen")
        )
        .localCheckpoint(eager=True)
    )
    corpus = doclen.agg(
        F.count("*").alias("n_docs"),
        (F.sum("doclen").cast("double") / F.count("*")).alias("avgdl"),
    )
    tstats = (
        postings.groupBy("term")
        .agg(F.count("*").cast("long").alias("df"))
        .where(F.col("df") >= min_df)
        .crossJoin(F.broadcast(corpus))
        .withColumn("idf", bm25_idf(F.col("df"), F.col("n_docs")))
    )
    return (
        postings.where(F.col("term").isin(terms))
        .join(F.broadcast(tstats.where(F.col("term").isin(terms))), "term")
        .join(doclen, "doc_id")
        .withColumn(
            "part",
            bm25_part(F.col("tf"), F.col("doclen"), F.col("avgdl"),
                      F.col("idf")),
        )
    )


def _bm25_doc_scores(parts: DataFrame) -> DataFrame:
    """(doc_id, score) from :func:`_bm25_term_parts` output — parts are
    summed in sorted-term order so the 4-decimal rounding is
    bit-deterministic across partitionings (and engines)."""
    return (
        parts.groupBy("doc_id")
        .agg(
            F.array_sort(F.collect_list(F.struct("term", "part"))).alias("p")
        )
        .select(
            "doc_id",
            F.round(
                F.aggregate("p", F.lit(0.0), lambda a, x: a + x["part"]), 4
            ).alias("score"),
        )
    )


def bm25_documents_topk(
    docs: DataFrame, query_terms: Sequence[str], k: int = 20, min_df: int = 3,
    postings: DataFrame | None = None,
) -> DataFrame:
    """Oracle-safe BM25 top-k over documents: (rank, doc_id, score).

    ``score`` is rounded to 4 decimals and the ordering uses the rounded
    value, so DuckDB reproduces rows bit-for-bit. The rank-identity tests
    against the NumPy oracle (unrounded, bit-exact) cover the precise
    path; this variant exists for cross-engine comparison.

    ``postings``: optionally pass an already-materialized
    ``document_postings(docs)`` (e.g. cached/persisted) so repeated
    ad-hoc queries don't re-tokenize the corpus — on a real deployment
    the postings table is built once and queried many times.
    """
    scored = _bm25_doc_scores(
        _bm25_term_parts(docs, query_terms, min_df, postings)
    )
    w = Window.orderBy(F.desc("score"), F.asc("doc_id"))
    return (
        scored.orderBy(F.desc("score"), F.asc("doc_id"))
        .limit(k)
        .withColumn("rank", F.row_number().over(w).cast("long"))
        .select("rank", "doc_id", "score")
    )


def bm25_topk_source_collapsed(
    docs: DataFrame, query_terms: Sequence[str], k: int = 20,
    per_source: int = 2, min_df: int = 3, key_col: str = "source",
    postings: DataFrame | None = None,
) -> DataFrame:
    """Source-collapsed BM25 top-k: (rank, doc_id, source, score) with
    at most *per_source* documents per *key_col* value — the web-search
    "site collapse" result diversification every production engine
    applies so one mirror-heavy host cannot monopolize page one.

    Exact, not an overfetch heuristic: the per-key window runs over the
    FULL matched-and-scored set (only docs containing a query term —
    already pruned, never the corpus), so the k survivors are the true
    best under the cap. The window partitions by the collapse key, so
    at scale it shuffles the match set once by key and sorts each
    key-group independently — no global sort before the final top-k cut.
    """
    scored = _bm25_doc_scores(
        _bm25_term_parts(docs, query_terms, min_df, postings)
    )
    keyed = scored.join(docs.select("doc_id", key_col), "doc_id")
    wk = Window.partitionBy(key_col).orderBy(
        F.desc("score"), F.asc("doc_id")
    )
    surv = keyed.withColumn(
        "src_rank", F.row_number().over(wk)
    ).where(F.col("src_rank") <= per_source)
    w = Window.orderBy(F.desc("score"), F.asc("doc_id"))
    return (
        surv.orderBy(F.desc("score"), F.asc("doc_id"))
        .limit(k)
        .withColumn("rank", F.row_number().over(w).cast("long"))
        .select("rank", "doc_id", F.col(key_col).alias("source"), "score")
    )


def bm25_score_breakdown(
    docs: DataFrame, query_terms: Sequence[str], k: int = 5,
    min_df: int = 3, postings: DataFrame | None = None,
) -> DataFrame:
    """Per-term score explain for the global top-*k* docs — the
    Lucene-``explain()`` debugging surface: one row per (doc, matched
    term) with the raw inputs and the term's contribution.

    Columns: (doc_id, term, tf, df, idf, contrib, score) — idf/contrib
    rounded to 4 decimals, ``score`` the doc's (rounded) total, so the
    breakdown is oracle-reproducible and contributions visibly sum to
    the ranked score. Ordered by (score desc, doc_id, term).
    """
    parts = _bm25_term_parts(docs, query_terms, min_df, postings)
    topk = (
        _bm25_doc_scores(parts)
        .orderBy(F.desc("score"), F.asc("doc_id"))
        .limit(k)
    )
    return (
        parts.join(F.broadcast(topk), "doc_id")
        .select(
            "doc_id",
            "term",
            "tf",
            "df",
            F.round("idf", 4).alias("idf"),
            F.round("part", 4).alias("contrib"),
            "score",
        )
        .orderBy(F.desc("score"), F.asc("doc_id"), F.asc("term"))
    )


def suggest_terms(
    docs: DataFrame, prefix: str, k: int = 10, min_df: int = 3,
) -> DataFrame:
    """(term, df): the query-completion surface — index-vocabulary
    terms starting with *prefix*, most-frequent first (df desc, term
    asc tie-break). Completion comes from the corpus's OWN vocabulary
    (like the spell-correct path, ``fuzzy_term_lookup``) — no curated
    resource; the serving twin reads the store's term_stats view
    in-process (``Searcher.suggest``)."""
    p = prefix.lower()
    if not p:
        raise ValueError("empty prefix")
    from .analytics import term_autocomplete

    return term_autocomplete(docs, p, limit=k, min_df=min_df)


def synonym_group_scores(
    spark, postings: DataFrame, doclen: DataFrame, corpus: DataFrame,
    groups_norm: Sequence[Sequence[str]], min_df: int = 3,
    round_digits: "int | None" = None,
) -> DataFrame:
    """(doc_id, score) under SynonymQuery semantics — THE one copy of
    the group-folded scoring plan, shared by :func:`bm25_synonym_topk`
    (corpus stats, rounded for the DuckDB oracle), ``Searcher.synonym``
    and ``Router.synonym_search`` (store tables, unrounded serving
    floats). *groups_norm* must already be
    :func:`normalize_synonym_groups` output; *corpus* is a 1-row
    (n_docs, avgdl) frame."""
    members = sorted({t for g in groups_norm for t in g})
    mapping = spark.createDataFrame(
        [(t, "|".join(g)) for g in groups_norm for t in g],
        "term string, gid string",
    )
    gpost = (
        postings.where(F.col("term").isin(members))
        .join(F.broadcast(mapping), "term")
        .groupBy("gid", "doc_id")
        .agg(F.sum("tf").cast("long").alias("tf"))
    )
    gstats = (
        gpost.groupBy("gid")
        .agg(F.count("*").cast("long").alias("df"))
        .where(F.col("df") >= min_df)
        .crossJoin(F.broadcast(corpus.select("n_docs", "avgdl")))
        .withColumn("idf", bm25_idf(F.col("df"), F.col("n_docs")))
    )
    total = F.aggregate("p", F.lit(0.0), lambda a, x: a + x["part"])
    if round_digits is not None:
        total = F.round(total, round_digits)
    return (
        gpost.join(F.broadcast(gstats), "gid")
        .join(doclen.select("doc_id", "doclen"), "doc_id")
        .withColumn(
            "part",
            bm25_part(F.col("tf"), F.col("doclen"), F.col("avgdl"),
                      F.col("idf")),
        )
        .groupBy("doc_id")
        .agg(
            F.array_sort(F.collect_list(F.struct("gid", "part"))).alias("p")
        )
        .select("doc_id", total.alias("score"))
    )


def bm25_synonym_topk(
    docs: DataFrame, groups: Sequence[Sequence[str]], k: int = 20,
    min_df: int = 3, postings: DataFrame | None = None,
) -> DataFrame:
    """Synonym-group BM25 top-k: (rank, doc_id, score) where each
    *group* of query terms scores as ONE pseudo-term — Lucene's
    ``SynonymQuery`` semantics: per-doc tf = sum of member tfs, df =
    docs containing ANY member, one idf and one saturation per group.
    This is the correct way to expand a query with synonyms/inflections
    ("bíll" ~ "bifreið"): scoring members independently would reward a
    doc for using BOTH spellings over one that says it twice, and would
    let a rare member's high idf dominate the common sense.

    With every group a singleton this reduces exactly to
    :func:`bm25_documents_topk` (test-pinned). ``min_df`` prunes on the
    GROUP's df. Plan shape: the postings scan prunes to the union of
    member terms, a broadcast term→group map folds members, and the
    rest is the plain pipeline — one extra tiny broadcast, no extra
    shuffle over the plain path.
    """
    norm = normalize_synonym_groups(groups)
    if postings is None:
        postings = document_postings(docs).cache()
    doclen = postings.groupBy("doc_id").agg(
        F.sum("tf").cast("long").alias("doclen")
    )
    corpus = doclen.agg(
        F.count("*").alias("n_docs"),
        (F.sum("doclen").cast("double") / F.count("*")).alias("avgdl"),
    )
    scored = synonym_group_scores(
        docs.sparkSession, postings, doclen, corpus, norm,
        min_df=min_df, round_digits=4,
    )
    w = Window.orderBy(F.desc("score"), F.asc("doc_id"))
    return (
        scored.orderBy(F.desc("score"), F.asc("doc_id"))
        .limit(k)
        .withColumn("rank", F.row_number().over(w).cast("long"))
        .select("rank", "doc_id", "score")
    )


def bm25_boolean_topk(
    docs: DataFrame, must: Sequence[str], should: Sequence[str] = (),
    must_not: Sequence[str] = (), k: int = 20, min_df: int = 3,
    postings: DataFrame | None = None,
) -> DataFrame:
    """Boolean-gated BM25 top-k: (rank, doc_id, score).

    Semantics (the classic AND/OR/NOT retrieval surface the reference's
    search only exposes as plain OR, search.py): a candidate document
    must contain EVERY `must` term (presence gate on raw postings, not
    df-pruned), none of the `must_not` terms (distributed anti-join —
    never a collected id set), and is scored by BM25 over all matched
    `must` + `should` terms (df >= min_df terms only, same formula and
    rounding as bm25_documents_topk so DuckDB reproduces rows
    bit-for-bit).  Candidates whose every query term was df-pruned
    carry no score row and are dropped — documented, mirrored in the
    oracle.  At serving scale the same gates compose over the segment
    store: term-pruned scans for the AND gate and the Router's
    anti-join shape for NOT."""
    must = sorted(set(must))
    should = sorted(set(should))
    match_terms = sorted(set(must) | set(should))
    if postings is None:
        postings = document_postings(docs).cache()
    doclen = postings.groupBy("doc_id").agg(
        F.sum("tf").cast("long").alias("doclen")
    )
    corpus = doclen.agg(
        F.count("*").alias("n_docs"),
        (F.sum("doclen").cast("double") / F.count("*")).alias("avgdl"),
    )
    tstats = (
        postings.groupBy("term")
        .agg(F.count("*").cast("long").alias("df"))
        .where(F.col("df") >= min_df)
        .crossJoin(F.broadcast(corpus))
        .withColumn(
            "idf",
            F.log(
                (F.col("n_docs") - F.col("df") + F.lit(0.5))
                / (F.col("df") + F.lit(0.5))
                + F.lit(1.0)
            ),
        )
    )
    scored = (
        postings.where(F.col("term").isin(match_terms))
        .join(F.broadcast(tstats.where(F.col("term").isin(match_terms))),
              "term")
        .join(doclen, "doc_id")
        .withColumn(
            "part",
            F.col("idf")
            * (F.col("tf") * (K1 + 1.0))
            / (
                F.col("tf")
                + K1 * (1.0 - B + B * F.col("doclen") / F.col("avgdl"))
            ),
        )
        .groupBy("doc_id")
        .agg(
            F.array_sort(F.collect_list(F.struct("term", "part"))).alias("p")
        )
        .select(
            "doc_id",
            F.round(
                F.aggregate("p", F.lit(0.0), lambda a, x: a + x["part"]), 4
            ).alias("score"),
        )
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
    if must_not:
        ex = (
            postings.where(F.col("term").isin(sorted(set(must_not))))
            .select("doc_id").distinct()
        )
        scored = scored.join(ex, "doc_id", "left_anti")
    w = Window.orderBy(F.desc("score"), F.asc("doc_id"))
    return (
        scored.orderBy(F.desc("score"), F.asc("doc_id"))
        .limit(k)
        .withColumn("rank", F.row_number().over(w).cast("long"))
        .select("rank", "doc_id", "score")
    )


def _documents_segment_index(docs: DataFrame, min_df: int, n_shards: int,
                             shard_size: int | None = None):
    """(segments, corpus) — the compressed segment store built ad hoc
    from the documents table (shared by the WAND driver-gate paths).
    Pass *shard_size* when another store must share the doc-range
    sharding (the two-store phrase-boolean cogroup)."""
    from .segments import build_segments

    postings = document_postings(docs)
    doclen = postings.groupBy("doc_id").agg(
        F.sum("tf").cast("long").alias("doclen")
    )
    corpus = doclen.agg(
        F.count("*").alias("n_docs"),
        (F.sum("doclen").cast("double") / F.count("*")).alias("avgdl"),
    )
    tstats = (
        postings.groupBy("term")
        .agg(F.count("*").cast("long").alias("df"))
        .where(F.col("df") >= min_df)
        .crossJoin(F.broadcast(corpus))
        .withColumn(
            "idf",
            F.log(
                (F.col("n_docs") - F.col("df") + F.lit(0.5))
                / (F.col("df") + F.lit(0.5))
                + F.lit(1.0)
            ),
        )
        .select("term", "df", "idf")
    )
    segments = build_segments(
        postings, tstats, doclen, corpus, n_shards=n_shards,
        shard_size=shard_size,
    )
    return segments, corpus


def bm25_wand_documents_topk(
    docs: DataFrame, query_terms: Sequence[str], k: int = 20,
    min_df: int = 3, n_shards: int = 8,
) -> DataFrame:
    """Same result as :func:`bm25_documents_topk`, computed through the
    compressed segment store + block-max WAND (the serving path). Used by
    the driver gate with the *same* oracle SQL — proving the compressed
    path end-to-end against DuckDB.

    Raw WAND scores are exact float64; for the cross-engine comparison the
    top-(k+50) raw results are re-ranked by (round(score,4) desc, doc_id)
    — the slack absorbs boundary docs whose rounded scores tie.
    """
    from .segments import release_cached_deps
    from .wand import wand_topk
    from pyspark.sql.window import Window as W

    terms = sorted(set(query_terms))
    segments, corpus = _documents_segment_index(docs, min_df, n_shards)
    raw = wand_topk(segments, terms, corpus, k + 50)
    w = W.orderBy(F.desc("score_r"), F.asc("doc_id"))
    out = (
        raw.withColumn("score_r", F.round("score", 4))
        .withColumn("rank", F.row_number().over(w).cast("long"))
        .where(F.col("rank") <= k)
        .select("rank", "doc_id", F.col("score_r").alias("score"))
    )
    # materialize the (≤k-row by construction) result now so the
    # persisted term dictionary the segment build attached can be
    # released before we return — the caller's action runs lazily, so
    # releasing there would leak one MEMORY_AND_DISK dictionary per
    # call (round-4 advice). collect-and-rebuild, NOT localCheckpoint:
    # an eager localCheckpoint registers its own persisted RDD in the
    # session, trading one leak for another (tested).
    rows = out.collect()
    release_cached_deps(segments)
    return docs.sparkSession.createDataFrame(rows, out.schema)


def bm25_wand_documents_topk_batch(
    docs: DataFrame, queries, k: int = 20,
    min_df: int = 3, n_shards: int = 8,
) -> DataFrame:
    """Batched serving path: (qid, rank, doc_id, score) for a mapping
    qid -> terms, through ONE wand_topk_batch job — per-query results
    identical to :func:`bm25_wand_documents_topk` (same round-then-
    re-rank canonicalization per qid)."""
    from .segments import release_cached_deps
    from .wand import wand_topk_batch
    from pyspark.sql.window import Window as W

    segments, corpus = _documents_segment_index(docs, min_df, n_shards)
    raw = wand_topk_batch(segments, queries, corpus, k + 50)
    w = W.partitionBy("qid").orderBy(F.desc("score_r"), F.asc("doc_id"))
    out = (
        raw.withColumn("score_r", F.round("score", 4))
        .withColumn("rank", F.row_number().over(w).cast("long"))
        .where(F.col("rank") <= k)
        .orderBy("qid", "rank")
        .select("qid", "rank", "doc_id", F.col("score_r").alias("score"))
    )
    # eager ≤k·|queries|-row materialization, then release the persisted
    # dictionary (see bm25_wand_documents_topk)
    rows = out.collect()
    release_cached_deps(segments)
    return docs.sparkSession.createDataFrame(rows, out.schema)


def quality_scores(docs: DataFrame) -> DataFrame:
    """Per-doc quality features for training-data filtering:
    (doc_id, n_tokens, n_unique, unique_ratio, avg_token_len).

    The length/diversity heuristics used to score web text quality
    (C4/Gopher-style rules), all JVM-side and SQL-mirrorable.
    """
    toks = document_tokens(docs)
    return (
        toks.groupBy("doc_id")
        .agg(
            F.count("*").cast("long").alias("n_tokens"),
            F.countDistinct("term").cast("long").alias("n_unique"),
            F.round(
                F.countDistinct("term").cast("double") / F.count("*"), 4
            ).alias("unique_ratio"),
            F.round(
                F.sum(F.length("term")).cast("double") / F.count("*"), 4
            ).alias("avg_token_len"),
        )
    )


def document_fingerprints(docs: DataFrame) -> DataFrame:
    """(doc_id, fingerprint): md5 over the sorted distinct-token set —
    an order-insensitive content fingerprint (bag-of-words identity).
    md5 is identical across engines, so this is oracle-checkable,
    unlike seeded xxhash fingerprints."""
    toks = document_tokens(docs)
    return (
        toks.groupBy("doc_id")
        .agg(
            F.md5(
                F.concat_ws(" ", F.array_sort(F.collect_set("term")))
            ).alias("fingerprint")
        )
    )


def unigram_logprob_scores(
    docs: DataFrame, broadcast_max: int = 2_000_000
) -> DataFrame:
    """(doc_id, n_tokens, avg_logprob, ppl): corpus-unigram
    language-model score per document — the perplexity-style quality
    gate (CCNet/KenLM-class) next to the heuristic `quality_scores`.
    `avg_logprob` is the mean ln(corpus-frequency/corpus-size) over the
    document's tokens; `ppl = exp(-avg_logprob)`. Documents of globally
    rare tokens (gibberish, OCR noise) score low / high-ppl;
    boilerplate scores high / low-ppl — both tails are filter targets.

    Scale shape: corpus term frequencies are one partial-agg groupBy;
    the token->frequency join broadcasts while the vocabulary fits
    (*broadcast_max* distinct terms) and falls back to a shuffle hash
    join above it — the same size-gate pattern as the segment term
    dictionary (`operators/segments.py`). Scoring is one further
    partial-agg groupBy(doc_id). Documents with zero tokens are absent
    (consistent with `quality_scores`).
    """
    toks = document_tokens(docs)
    freq = toks.groupBy("term").agg(
        F.count("*").cast("long").alias("tf_corpus")
    )
    row = freq.agg(
        F.sum("tf_corpus").alias("total"), F.count("*").alias("n_terms")
    ).first()
    if row["total"] is None:  # empty corpus: no scored rows either
        total, n_terms = 1.0, 0
    else:
        total, n_terms = float(row["total"]), int(row["n_terms"])
    if n_terms <= broadcast_max:
        freq = F.broadcast(freq)
    return (
        toks.join(freq, "term")
        .groupBy("doc_id")
        .agg(
            F.count("*").cast("long").alias("n_tokens"),
            F.round(
                F.avg(F.log(F.col("tf_corpus") / F.lit(total))), 4
            ).alias("avg_logprob"),
            F.round(
                F.exp(-F.avg(F.log(F.col("tf_corpus") / F.lit(total)))), 4
            ).alias("ppl"),
        )
    )


GOPHER_STOPWORDS = ("the", "be", "to", "of", "and", "that", "have", "with")


def gopher_rules(
    docs: DataFrame,
    stopwords: Sequence[str] = GOPHER_STOPWORDS,
    min_words: int = 50,
    max_words: int = 100_000,
) -> DataFrame:
    """Gopher-style (Rae et al. 2021) repetition-free quality rules per
    document: word-count bounds, mean word length 3..10, >=2 distinct
    stopwords, bullet-line ratio <= 0.9, ellipsis-line ratio <= 0.3,
    symbol-to-word ratio <= 0.1. Returns (doc_id, n_words,
    mean_word_len, n_stop_distinct, frac_stop, bullet_ratio,
    ellipsis_ratio, symbol_ratio, passes) with `passes` a 0/1 BIGINT
    evaluated on the published (rounded) values so any engine
    re-deriving the gate from the output columns agrees.

    Scale shape: every rule is a row-local array expression over the
    whitespace-word and line splits — one codegen stage, zero shuffle,
    no UDF; the operator runs at scan speed next to `pii_redact`.
    Documents with no words are absent (as in `quality_scores`).
    """
    words = F.filter(F.split(F.col("text"), r"\s+"), lambda w: w != "")
    lines = F.filter(F.split(F.col("text"), "\n"), lambda l: l != "")
    stops = F.filter(
        F.transform(words, F.lower),
        lambda w: w.isin(*[s.lower() for s in stopwords]),
    )
    n_words = F.size(words).cast("long")
    n_sym = (
        F.length("text") - F.length(F.replace(F.col("text"), F.lit("#")))
        + F.length("text") - F.length(F.replace(F.col("text"), F.lit("…")))
    ).cast("long")
    base = docs.select(
        "doc_id",
        n_words.alias("n_words"),
        F.round(
            F.aggregate(
                words, F.lit(0).cast("long"),
                lambda acc, w: acc + F.length(w),
            ).cast("double") / n_words, 4,
        ).alias("mean_word_len"),
        F.size(F.array_distinct(stops)).cast("long").alias("n_stop_distinct"),
        F.round(F.size(stops).cast("double") / n_words, 4).alias("frac_stop"),
        F.round(
            F.size(F.filter(lines, lambda l: l.rlike("^[•*-]")))
            .cast("double") / F.greatest(F.size(lines), F.lit(1)), 4,
        ).alias("bullet_ratio"),
        F.round(
            F.size(
                F.filter(lines, lambda l: l.rlike(r"(\.\.\.|…)$"))
            ).cast("double") / F.greatest(F.size(lines), F.lit(1)), 4,
        ).alias("ellipsis_ratio"),
        F.round(n_sym.cast("double") / n_words, 4).alias("symbol_ratio"),
    ).where(F.col("n_words") >= 1)
    return base.withColumn(
        "passes",
        (
            F.col("n_words").between(min_words, max_words)
            & F.col("mean_word_len").between(3.0, 10.0)
            & (F.col("n_stop_distinct") >= 2)
            & (F.col("bullet_ratio") <= 0.9)
            & (F.col("ellipsis_ratio") <= 0.3)
            & (F.col("symbol_ratio") <= 0.1)
        ).cast("long"),
    )


def _token_array(text_col="text"):
    """Filtered token array (lower -> regex split -> 1..64 chars) as
    one JVM expression — the array form of :func:`document_tokens`."""
    return F.filter(
        F.split(F.lower(F.col(text_col)), TOKEN_SPLIT_RE),
        lambda x: (F.length(x) >= 1) & (F.length(x) <= MAX_WORD_LEN),
    )


def chunk_documents(
    docs: DataFrame, max_tokens: int = 128, stride: int = 96
) -> DataFrame:
    """(doc_id, chunk_id, n_tokens, chunk_text): sliding context-window
    chunks — the split step before sequence packing
    (:func:`packing.pack_token_budget` consumes pieces like these when
    documents exceed the training context).

    Window ``i`` starts at token ``1 + i*stride`` and holds up to
    *max_tokens* tokens; windows are emitted while the start is inside
    the document, so with ``stride < max_tokens`` consecutive chunks
    overlap by ``max_tokens - stride`` tokens (the boundary-context
    convention) and the final chunk may be short. Zero-token documents
    emit no chunks.

    Plan shape: one ``sequence``/``explode`` over per-row arithmetic —
    embarrassingly parallel, no shuffle, no UDF; each task chunks its
    own partition's documents. Expressed 1:1 in DuckDB by the oracle
    (range / list_slice / array_to_string).
    """
    if max_tokens < 1 or stride < 1:
        raise ValueError("max_tokens and stride must be >= 1")
    toks = docs.select("doc_id", _token_array().alias("toks")).where(
        F.size("toks") > 0
    )
    starts = F.sequence(
        F.lit(1), F.size("toks"), F.lit(int(stride))
    )
    chunked = toks.select(
        "doc_id", "toks", F.explode(starts).alias("start")
    ).select(
        "doc_id",
        ((F.col("start") - 1) / int(stride)).cast("long").alias("chunk_id"),
        F.slice("toks", F.col("start"), int(max_tokens)).alias("ctoks"),
    )
    return chunked.select(
        "doc_id",
        "chunk_id",
        F.size("ctoks").cast("long").alias("n_tokens"),
        F.array_join("ctoks", " ").alias("chunk_text"),
    )


def perplexity_buckets(
    docs: DataFrame, n_buckets: int = 3, broadcast_max: int = 2_000_000
) -> DataFrame:
    """(doc_id, ppl, bucket): CCNet-style perplexity binning — bucket 0
    is the lowest-perplexity (most fluent / most boilerplate) slice,
    bucket ``n_buckets - 1`` the highest. Downstream recipes keep or
    re-weight slices ("head/middle/tail").

    Equal scores land in the same bucket (value-level assignment:
    bucket = floor(n_buckets * |{ppl' < ppl}| / n)), so the result is a
    pure function of the score distribution — no arbitrary tie split.

    Scale shape: the only ordered pass runs over DISTINCT rounded
    scores (tiny vs the corpus — the window is per-value, not per-row;
    a per-row global NTILE would serialize the corpus through one
    task). Boundaries then assign via an equi-join on the score value.
    """
    if n_buckets < 1:
        raise ValueError("n_buckets must be >= 1")
    scored = unigram_logprob_scores(docs, broadcast_max).select(
        "doc_id", "ppl"
    )
    n = scored.count()
    if n == 0:
        return scored.select(
            "doc_id", "ppl", F.lit(0).cast("int").alias("bucket")
        )
    vals = scored.groupBy("ppl").agg(F.count("*").alias("c"))
    w = Window.orderBy("ppl").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    cum = vals.select(
        "ppl", (F.sum("c").over(w) - F.col("c")).alias("c_start")
    )
    return scored.join(cum, "ppl").select(
        "doc_id",
        "ppl",
        F.floor(F.col("c_start") * int(n_buckets) / F.lit(int(n)))
        .cast("int")
        .alias("bucket"),
    )


def bm25_boolean_segments_topk(
    docs: DataFrame, must: Sequence[str], should: Sequence[str] = (),
    must_not: Sequence[str] = (), k: int = 20,
    min_df: int = 3, n_shards: int = 8,
) -> DataFrame:
    """Boolean (MUST/SHOULD/MUST_NOT) top-k served from the COMPRESSED
    segment store (wand.boolean_topk) — the serving-side counterpart of
    :func:`bm25_boolean_topk`, gated on the indexed (df >= min_df)
    vocabulary like any pruned index. Round-then-re-rank canonical-
    ization and eager release as in :func:`bm25_wand_documents_topk`.
    """
    from .segments import release_cached_deps
    from .wand import boolean_topk
    from pyspark.sql.window import Window as W

    segments, corpus = _documents_segment_index(docs, min_df, n_shards)
    raw = boolean_topk(
        segments, must, corpus, should=should, must_not=must_not,
        k=k + 50,
    )
    w = W.orderBy(F.desc("score_r"), F.asc("doc_id"))
    out = (
        raw.withColumn("score_r", F.round("score", 4))
        .withColumn("rank", F.row_number().over(w).cast("long"))
        .where(F.col("rank") <= k)
        .select("rank", "doc_id", F.col("score_r").alias("score"))
    )
    rows = out.collect()
    release_cached_deps(segments)
    return docs.sparkSession.createDataFrame(rows, out.schema)


def prefix_documents_topk(
    docs: DataFrame, prefix: str, k: int = 10, max_expand: int = 32,
    min_df: int = 3, n_shards: int = 8,
) -> DataFrame:
    """Trailing-wildcard ``prefix*`` top-k served from the compressed
    segment store (wand.prefix_topk: dictionary expansion capped at
    *max_expand* by df desc, then block-max WAND over the expansion).
    Round-then-re-rank canonicalization and eager release as in
    :func:`bm25_wand_documents_topk`."""
    from .segments import release_cached_deps
    from .wand import prefix_topk
    from pyspark.sql.window import Window as W

    segments, corpus = _documents_segment_index(docs, min_df, n_shards)
    raw = prefix_topk(
        segments, prefix, corpus, k=k + 50, max_expand=max_expand,
        min_df=min_df,
    )
    w = W.orderBy(F.desc("score_r"), F.asc("doc_id"))
    out = (
        raw.withColumn("score_r", F.round("score", 4))
        .withColumn("rank", F.row_number().over(w).cast("long"))
        .where(F.col("rank") <= k)
        .select("rank", "doc_id", F.col("score_r").alias("score"))
    )
    rows = out.collect()
    release_cached_deps(segments)
    return docs.sparkSession.createDataFrame(rows, out.schema)


def hit_count_documents(
    docs: DataFrame, query_terms: Sequence[str],
    min_df: int = 3, n_shards: int = 8,
) -> DataFrame:
    """ONE row (n_hits) — the engine's totalHits: how many documents
    match ANY query term, counted from the COMPRESSED segment store
    (wand.matched_docs: pruned scan + per-shard bulk decode; doc-range
    shards make the global distinct a concat, not a dedup shuffle).
    Counts over the indexed (df >= min_df) vocabulary like the other
    segment-served paths."""
    from .segments import release_cached_deps
    from .wand import matched_docs

    segments, _corpus = _documents_segment_index(docs, min_df, n_shards)
    out = matched_docs(segments, sorted(set(query_terms))).agg(
        F.count("*").cast("long").alias("n_hits")
    )
    rows = out.collect()
    release_cached_deps(segments)
    return docs.sparkSession.createDataFrame(rows, out.schema)


def facet_counts_documents(
    docs: DataFrame, query_terms: Sequence[str], facet: str = "source",
    min_df: int = 3, n_shards: int = 8,
) -> DataFrame:
    """(facet_value, n_hits) per *facet* column value over the matched
    documents (count desc, value asc) — faceted search served from the
    segment store: the matched-doc relation is tiny relative to the
    corpus, so the facet join is a semi-join-shaped probe of the
    documents table followed by one partial-agg groupBy. The join/agg
    kernel is shared with the Searcher surface
    (operators/facets.py::facet_counts_segments)."""
    from .facets import facet_counts_segments
    from .segments import release_cached_deps

    segments, _corpus = _documents_segment_index(docs, min_df, n_shards)
    out = facet_counts_segments(
        segments,
        docs.select("doc_id", F.col(facet).alias("_fv")),
        query_terms,
        "_fv",
        k=None,
    ).select(
        F.col("facet").alias("facet_value"),
        F.col("doc_count").alias("n_hits"),
    )
    rows = out.collect()
    release_cached_deps(segments)
    return docs.sparkSession.createDataFrame(rows, out.schema)


def bm25_boolean_segments_topk_batch(
    docs: DataFrame, queries, k: int = 20,
    min_df: int = 3, n_shards: int = 8,
) -> DataFrame:
    """Batched boolean serving: (qid, rank, doc_id, score) for a
    mapping qid -> (must, should, must_not), through ONE
    wand.boolean_topk_batch job — per-query results identical to
    :func:`bm25_boolean_segments_topk` (same round-then-re-rank
    canonicalization per qid)."""
    from .segments import release_cached_deps
    from .wand import boolean_topk_batch
    from pyspark.sql.window import Window as W

    segments, corpus = _documents_segment_index(docs, min_df, n_shards)
    raw = boolean_topk_batch(segments, queries, corpus, k=k + 50)
    w = W.partitionBy("qid").orderBy(F.desc("score_r"), F.asc("doc_id"))
    out = (
        raw.withColumn("score_r", F.round("score", 4))
        .withColumn("rank", F.row_number().over(w).cast("long"))
        .where(F.col("rank") <= k)
        .orderBy("qid", "rank")
        .select("qid", "rank", "doc_id", F.col("score_r").alias("score"))
    )
    rows = out.collect()
    release_cached_deps(segments)
    return docs.sparkSession.createDataFrame(rows, out.schema)


def hit_count_bounds_documents(
    docs: DataFrame, query_terms: Sequence[str],
    min_df: int = 3, n_shards: int = 8,
) -> DataFrame:
    """ONE row (lb_hits, ub_hits) — metadata-only totalHits bounds from
    the segment store (wand.hit_count_bounds): no block is decoded, so
    the answer's latency is independent of posting volume."""
    from .segments import release_cached_deps
    from .wand import hit_count_bounds

    segments, _corpus = _documents_segment_index(docs, min_df, n_shards)
    out = hit_count_bounds(segments, sorted(set(query_terms)))
    rows = out.collect()
    release_cached_deps(segments)
    return docs.sparkSession.createDataFrame(rows, out.schema)


def bm25_boolean_phrase_topk(
    docs: DataFrame, phrases, must: Sequence[str] = (),
    should: Sequence[str] = (), must_not: Sequence[str] = (),
    k: int = 20, min_df: int = 3, n_shards: int = 8,
) -> DataFrame:
    """Boolean retrieval with exact-phrase clauses served from the two
    compressed stores (wand.boolean_phrase_topk: shard-local cogrouped
    phrase gate + gated BM25 kernel). Round-then-re-rank and eager
    release as in the other segment wrappers.

    ONE shard_size is computed here and pinned into BOTH builds: their
    defaults differ (BM25 divides the posting-bearing doc COUNT, the
    positional store divides max_doc_id+1), so sparse or filtered doc
    ids would otherwise give the two stores different doc ranges per
    shard and the shard-local cogroup gate would silently drop
    matches."""
    from .phrase import positional_postings
    from .posindex import build_positional_segments
    from .segments import release_cached_deps
    from .wand import boolean_phrase_topk
    from pyspark.sql.window import Window as W

    max_doc = docs.agg(F.max("doc_id")).collect()[0][0]
    n_ids = int(max_doc) + 1 if max_doc is not None else 1
    shard_size = max(1, -(-n_ids // n_shards))  # ceil
    segments, corpus = _documents_segment_index(
        docs, min_df, n_shards, shard_size=shard_size
    )
    positions = build_positional_segments(
        positional_postings(docs), n_shards=n_shards, block_size=64,
        shard_size=shard_size,
    )
    raw = boolean_phrase_topk(
        segments, positions, corpus, phrases, must=must, should=should,
        must_not=must_not, k=k + 50,
    )
    w = W.orderBy(F.desc("score_r"), F.asc("doc_id"))
    out = (
        raw.withColumn("score_r", F.round("score", 4))
        .withColumn("rank", F.row_number().over(w).cast("long"))
        .where(F.col("rank") <= k)
        .select("rank", "doc_id", F.col("score_r").alias("score"))
    )
    rows = out.collect()
    release_cached_deps(segments)
    release_cached_deps(positions)
    return docs.sparkSession.createDataFrame(rows, out.schema)
