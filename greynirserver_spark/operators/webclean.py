"""Corpus-shaping operators a web-scale training pipeline runs after
dedup: span-level exact deduplication and head-domain skew control.

* **span_dedup** — the C4-class "remove repeated spans, keep one copy"
  pass, adapted to flat token streams: the corpus is chunked into
  fixed-width token spans and any span whose exact text occurs more
  than once corpus-wide is removed everywhere EXCEPT its first
  occurrence (first = smallest (doc_id, span_idx)). C4 removes
  duplicated three-sentence spans; RefinedWeb/CCNet drop duplicated
  lines — this is the same operator over a corpus whose documents have
  no sentence/line structure (the driver's `documents` table), with the
  span width a parameter.

  Scale shape: the duplicate decision is ONE partial-aggregated groupBy
  on a 128-bit span digest (md5 — collision odds at 10^12 spans are
  ~1e-15, and the digest shrinks the shuffle vs shipping span text),
  computing `min(struct(doc_id, span_idx))` per digest. Deliberately
  NOT a window `row_number() OVER (PARTITION BY span)`: a pathological
  span occurring 10^7 times (boilerplate, spam loops) would make one
  window partition sort 10^7 rows on a single task, while `min` partial
  aggregation folds it map-side. Reassembly is one groupBy(doc_id) with
  an in-row `array_sort` — no second wide shuffle of corpus text beyond
  the doc-partitioned one.

* **source_cap_sample** — keep at most *cap* documents per source
  (domain), chosen by a deterministic pseudo-random priority
  (md5(source:doc_id)) so the sample is reproducible across jobs and
  unbiased w.r.t. document order. This is the head-domain cap every
  published web pipeline applies (a handful of template-heavy domains
  otherwise dominate the token budget).

  Scale shape: a naive `row_number() OVER (PARTITION BY source)` makes
  the busiest domain one giant sorted window partition. Instead phase 1
  prunes per *input partition* — each task keeps its local top-cap per
  source (vectorized pandas groupby-head, no shuffle) — which bounds
  the survivors at cap x n_partitions per source; phase 2 ranks only
  the survivors. Dropping a row locally is safe: it already has >= cap
  better-priority rows in its own partition, so its global rank
  exceeds cap.

* **source_stats** — per-source document/char counts with the skew
  ratio vs the mean source (the number that tells you whether the cap
  is needed and where to set it).

The reference scrapes a curated per-site news corpus
(`/root/reference/scraper.py` fetches each root's article list) and has
no corpus-shaping analog; these follow the published C4/RefinedWeb
pipeline designs the `documents` table exists to serve.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import Column, DataFrame, functions as F

from ..tokenization import MAX_WORD_LEN, TOKEN_SPLIT_RE

__all__ = ["span_dedup", "source_cap_sample", "source_stats",
           "source_temperature_sample", "source_token_report"]


def _tokens_arr() -> Column:
    return F.filter(
        F.split(F.lower(F.col("text")), TOKEN_SPLIT_RE),
        lambda x: (F.length(x) >= 1) & (F.length(x) <= MAX_WORD_LEN),
    )


def _spans(toks: Column, span: int) -> Column:
    """Chunk a token array into consecutive *span*-token strings (the
    tail chunk may be shorter). JVM-side: sequence + slice + concat_ws
    inside codegen."""
    n_chunks = F.ceil(F.size(toks) / F.lit(span)).cast("int")
    return F.when(
        F.size(toks) > 0,
        F.transform(
            F.sequence(F.lit(0), n_chunks - 1),
            lambda i: F.concat_ws(
                " ", F.slice(toks, i * span + F.lit(1), span)
            ),
        ),
    ).otherwise(F.array().cast("array<string>"))


def span_dedup(docs: DataFrame, span: int = 16) -> DataFrame:
    """(doc_id, n_spans, n_removed, clean_text): corpus-wide exact span
    dedup. A span is removed iff the same span text occurs elsewhere in
    the corpus with a smaller (doc_id, span_idx) — i.e. every duplicated
    span keeps exactly its first occurrence. `clean_text` is the
    surviving spans rejoined in order ('' if everything was removed or
    the document had no tokens)."""
    spans = (
        docs.select(
            "doc_id", F.posexplode_outer(_spans(_tokens_arr(), span))
            .alias("span_idx", "chunk"),
        )
    )
    # one groupBy on the digest with map-side partial min: the skew-safe
    # way to find each span's first occurrence (see module docstring)
    firsts = (
        spans.where(F.col("chunk").isNotNull())
        .groupBy(F.md5("chunk").alias("digest"))
        .agg(F.min(F.struct("doc_id", "span_idx")).alias("first_occ"))
    )
    marked = (
        spans.withColumn("digest", F.md5("chunk"))
        .join(firsts, "digest", "left")
        .select(
            "doc_id", "span_idx", "chunk",
            (
                F.col("chunk").isNotNull()
                & ~(
                    (F.col("first_occ.doc_id") == F.col("doc_id"))
                    & (F.col("first_occ.span_idx") == F.col("span_idx"))
                )
            ).alias("removed"),
        )
    )
    return (
        marked.groupBy("doc_id")
        .agg(
            F.count("chunk").cast("long").alias("n_spans"),
            F.sum(F.col("removed").cast("long")).cast("long")
            .alias("n_removed"),
            F.concat_ws(
                " ",
                F.transform(
                    F.array_sort(
                        F.collect_list(
                            F.when(
                                ~F.col("removed"),
                                F.struct("span_idx", "chunk"),
                            )
                        )
                    ),
                    lambda s: s["chunk"],
                ),
            ).alias("clean_text"),
        )
        .select("doc_id", "n_spans", "n_removed", "clean_text")
    )


def _prune_partition(cap: int):
    def prune(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        # local top-cap per source within this input partition; any row
        # dropped here has >= cap better (smaller-key) rows locally, so
        # its global rank is > cap and the final window never needs it
        for pdf in batches:
            if len(pdf):
                yield (
                    pdf.sort_values(["rkey", "doc_id"], kind="mergesort")
                    .groupby("source", sort=False)
                    .head(cap)
                )
    return prune


def source_cap_sample(docs: DataFrame, cap: int = 10) -> DataFrame:
    """(doc_id, source, rk): at most *cap* documents per source, ranked
    by the deterministic priority md5(source || ':' || doc_id). Output
    is identical to a global per-source row_number <= cap, computed
    without sorting any full-domain window partition."""
    keyed = docs.select(
        "doc_id", "source",
        F.md5(F.concat_ws(":", "source", F.col("doc_id").cast("string")))
        .alias("rkey"),
    )
    survivors = keyed.mapInPandas(
        _prune_partition(cap), "doc_id long, source string, rkey string"
    )
    from pyspark.sql import Window

    w = Window.partitionBy("source").orderBy("rkey", "doc_id")
    return (
        survivors.withColumn(
            "rk", F.row_number().over(w).cast("long")
        )
        .where(F.col("rk") <= cap)
        .select("doc_id", "source", "rk")
    )


def source_stats(docs: DataFrame) -> DataFrame:
    """(source, n_docs, total_chars, docs_share, skew_ratio): per-source
    volume and skew vs the mean source. skew_ratio = n_docs / mean
    docs-per-source; docs_share = n_docs / corpus docs."""
    per = docs.groupBy("source").agg(
        F.count("*").cast("long").alias("n_docs"),
        F.sum(F.length("text")).cast("long").alias("total_chars"),
    )
    tot = per.agg(
        F.sum("n_docs").cast("double").alias("all_docs"),
        F.count("*").cast("double").alias("n_sources"),
    )
    return (
        per.crossJoin(F.broadcast(tot))
        .select(
            "source", "n_docs", "total_chars",
            F.round(F.col("n_docs") / F.col("all_docs"), 6)
            .alias("docs_share"),
            F.round(
                F.col("n_docs") / (F.col("all_docs") / F.col("n_sources")),
                6,
            ).alias("skew_ratio"),
        )
    )


def source_temperature_sample(docs: DataFrame, alpha: float = 0.5) -> DataFrame:
    """Temperature resampling of the per-source (domain) mix: keep each
    document of source *s* with probability ``(n_min / n_s)^(1-alpha)``
    so the kept corpus follows ``n_s^alpha`` — the standard
    training-mixture flattening (alpha=1 keeps everything, alpha=0
    equalizes all sources) realized purely by *down*-sampling: the
    smallest source keeps every document and larger sources are thinned
    toward it, which is the largest sample attainable without
    duplicating rows. Complements the hard `source_cap_sample`: the cap
    truncates the head, the temperature reshapes the whole curve.

    The keep decision is a deterministic per-document coin —
    ``u = int(md5("t:" source ":" doc_id)[:8]) / 2^32`` compared to the
    keep probability — so the sample is reproducible across jobs,
    engines (DuckDB oracle-checked) and cluster layouts, and a document
    never flips membership when the job is re-run or repartitioned.

    Returns (doc_id, source, p_keep) for kept documents, p_keep rounded
    to 6 dp. Scale shape: one partial-agg groupBy over sources, a
    broadcast of the tiny per-source dim (domains ≪ documents), and a
    row-local filter — no shuffle of the corpus itself.
    """
    per = docs.groupBy("source").agg(F.count("*").alias("n_s"))
    n_min = per.agg(F.min("n_s")).first()[0]
    if n_min is None:  # empty input: nothing to sample
        n_min = 1
    weights = F.broadcast(
        per.select(
            "source",
            F.pow(F.lit(float(n_min)) / F.col("n_s"), 1.0 - alpha)
            .alias("p_keep"),
        )
    )
    u = (
        F.conv(
            F.substring(
                F.md5(F.concat_ws(":", F.lit("t"), "source",
                                  F.col("doc_id").cast("string"))),
                1, 8,
            ),
            16, 10,
        ).cast("double") / F.lit(4294967296.0)
    )
    return (
        docs.join(weights, "source")
        .where(u < F.col("p_keep"))
        .select("doc_id", "source", F.round("p_keep", 6).alias("p_keep"))
    )


def source_token_report(
    docs: DataFrame, quantiles: "tuple[int, ...]" = (50, 90)
) -> DataFrame:
    """(source, n_docs, total_tokens, mean_tokens, q50_tokens,
    q90_tokens): the per-source token-budget report a pipeline owner
    reads before mixing sources — volumes, means, and EXACT
    distribution quantiles of per-document token counts.

    Quantiles are computed from the (source, n_tokens) value HISTOGRAM
    with a running-count window, not from Spark's `percentile`
    aggregate: exact `percentile` buffers every group's values on one
    task, which at 10^12 documents per head source is an OOM, while
    the histogram is bounded by the number of DISTINCT token counts
    (≤ max doc length, ~10^5) regardless of corpus size.  The quantile
    rule is explicit type-1 (value at rank ``ceil(q·n)``, 1-indexed) so
    the same formula is expressible verbatim in the SQL oracle —
    no reliance on any engine's interpolation flavor.

    Scale shape: one groupBy(doc_id) for token counts, one
    groupBy(source, n_tokens) for the histogram, a per-source window
    over ≤|distinct counts| histogram rows (never document rows), and
    two broadcast-size joins.  Zero-token documents count with
    n_tokens = 0 (unlike the scoring operators, a volume report must
    not lose rows).
    """
    from .textops import document_tokens

    from pyspark.sql import Window

    counts = (
        docs.select("doc_id", "source")
        .join(
            document_tokens(docs).groupBy("doc_id").agg(
                F.count("*").cast("long").alias("n_tokens")
            ),
            "doc_id", "left",
        )
        .withColumn("n_tokens", F.coalesce("n_tokens", F.lit(0)))
    )
    base = counts.groupBy("source").agg(
        F.count("*").cast("long").alias("n_docs"),
        F.sum("n_tokens").cast("long").alias("total_tokens"),
        F.round(F.avg("n_tokens"), 4).alias("mean_tokens"),
    )
    hist = counts.groupBy("source", "n_tokens").agg(
        F.count("*").cast("long").alias("c")
    )
    w = (
        Window.partitionBy("source").orderBy("n_tokens")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cum = hist.withColumn("cum", F.sum("c").over(w))
    out = base
    for pct in quantiles:
        name = f"q{pct:02d}_tokens"
        rank = F.floor((F.col("n_docs") * F.lit(pct) + 99) / 100)
        ranked = (
            cum.join(base.select("source", "n_docs"), "source")
            .where(F.col("cum") >= rank)
            .groupBy("source")
            .agg(F.min("n_tokens").cast("long").alias(name))
        )
        out = out.join(ranked, "source")
    return out
