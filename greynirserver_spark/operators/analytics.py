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
    "events_weekly_by_type",
    "events_props_extract",
    "top_events_per_user",
    "events_page",
    "term_autocomplete",
    "token_count_bpe",
    "word_trigram_counts",
    "word_trigrams",
    "merge_trigram_counts",
    "load_trigram_counts",
    "compact_trigram_counts",
    "random_sample",
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


def random_sample(docs: DataFrame, n: int = 50, seed: int = 42) -> DataFrame:
    """(doc_id, rkey): *n* documents in deterministic pseudo-random order.

    The reference samples with ``ORDER BY random()`` under a pinned seed
    (article.py:755-756). Spark's ``rand(seed)`` is partition-dependent
    (same seed, different cluster size -> different sample), so the
    shuffle-stable form is an md5 sort key over (seed, doc_id): identical
    across engines, runs and cluster sizes, uniform over the key space.
    """
    key = F.md5(
        F.concat(F.lit(f"{seed}:"), F.col("doc_id").cast("string"))
    )
    return (
        docs.select("doc_id", key.alias("rkey"))
        .orderBy("rkey", "doc_id")
        .limit(n)
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
    postings. Scale note: AQE broadcasts the doc set while it fits; for
    a head term it falls back to a shuffled semi-join — which is safe
    WITHOUT salting, because the join key is ``doc_id`` and a doc set
    is near-unique per key (skew mitigation targets hot KEYS; there are
    none here — the term column never becomes a join key).
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


def events_weekly_by_type(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weekly counts pivoted by event_type with conditional sums — the
    reference's gender-pivot shape (db/sql.py:64-78) + IYYY-IW week
    bucketing (db/sql.py:446-465). Pivot done with sum(when(...)) so the
    column set is static and SQL-mirrorable."""
    ev = _events(spark, sf_dir)
    week = F.date_format(F.date_trunc("week", F.col("ts")), "yyyy-MM-dd")
    agg = [
        F.sum(F.when(F.col("event_type") == t, 1).otherwise(0))
        .cast("long")
        .alias(f"n_{t}")
        for t in ("click", "view", "signup", "purchase", "error")
    ]
    return (
        ev.groupBy(week.alias("week"))
        .agg(*agg)
        .orderBy("week")
    )


def events_props_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSON column extraction — the reference stores JSON payloads in
    string columns and json.loads them in Python (article.py:258);
    here it's get_json_object, fully JVM-side: per-type mean of props.k."""
    ev = _events(spark, sf_dir)
    return (
        ev.withColumn(
            "k", F.get_json_object("props", "$.k").cast("long")
        )
        .groupBy("event_type")
        .agg(
            F.count("k").cast("long").alias("n"),
            F.round(F.sum("k").cast("double") / F.count("k"), 4).alias("avg_k"),
        )
        .orderBy("event_type")
    )


def top_events_per_user(
    spark: SparkSession, sf_dir: str, k: int = 3
) -> DataFrame:
    """Newest-k rows per key (reference: topic vectors of the newest 25
    docs per term, db/sql.py:324-335) as a rank<=k window."""
    ev = _events(spark, sf_dir)
    w = Window.partitionBy("user_id").orderBy(F.desc("ts"), F.desc("event_id"))
    return (
        ev.withColumn("rn", F.row_number().over(w).cast("long"))
        .where(F.col("rn") <= k)
        .select("user_id", "rn", "event_id", "event_type")
    )


def events_page(
    spark: SparkSession, sf_dir: str, page_size: int = 50, page: int = 2
) -> DataFrame:
    """Keyset-free pagination via row_number — the reference paginates
    with OFFSET/LIMIT (routes/news.py:98-102).

    Scale shape: a distributed TakeOrdered ``limit(hi)`` cuts the
    table to the first ``page*page_size`` rows BEFORE the global
    row_number window, so the single-partition window only ever sees
    one page-prefix of rows — never the corpus (a bare unpartitioned
    row_number would serialize every event through one task)."""
    ev = _events(spark, sf_dir)
    w = Window.orderBy(F.asc("ts"), F.asc("event_id"))
    lo, hi = (page - 1) * page_size, page * page_size
    return (
        ev.orderBy(F.asc("ts"), F.asc("event_id")).limit(hi)
        .withColumn("rn", F.row_number().over(w).cast("long"))
        .where(F.col("rn") > lo)
        .select("rn", "event_id", "user_id", "event_type")
    )


def term_autocomplete(
    docs: DataFrame, prefix: str, limit: int = 10, min_df: int = 1,
) -> DataFrame:
    """Prefix autocomplete over the vocabulary, ordered by df — the
    reference's ILIKE 'x%' autocomplete (routes/main.py:475-483);
    startswith pushes down as a range predicate. ``min_df=1`` completes
    over the RAW vocabulary; ``textops.suggest_terms`` is the
    index-vocabulary variant (df >= the index's pruning floor — the
    universe ``Searcher.suggest`` serves from the store)."""
    from .textops import document_term_stats

    return (
        document_term_stats(docs, min_df=min_df)
        .where(F.col("term").startswith(prefix))
        .orderBy(F.desc("df"), F.asc("term"))
        .limit(limit)
        .select("term", "df")
    )


def fuzzy_term_lookup(
    docs: "DataFrame | None", query: str, k: int = 10, max_dist: int = 2,
    vocab: "DataFrame | None" = None,
) -> DataFrame:
    """(term, df, lev, jaccard): spell-tolerant vocabulary lookup — the
    query path that maps a non-vocabulary token (typo, OCR noise) to
    real index terms. The reference corrects tokens through static
    replacement dictionaries loaded from resource files
    (/root/reference/tools/trigrams.py:116-137); this generalizes that
    to any vocabulary with no curated resource: character-trigram
    candidate filter (pg_trgm-style) then Levenshtein verification,
    ranked (edit distance asc, trigram Jaccard desc, term asc).

    Scale shape: the trigram profile, the intersection with the tiny
    literal query-trigram array, the Jaccard and the edit distance are
    all per-row JVM expressions inside one codegen stage over the
    vocabulary scan — no explode, no shuffle beyond the vocabulary
    groupBy itself and the final top-k. At a 10^8-term web vocabulary
    this is one linear pass; a deployment doing high-QPS lookups would
    additionally key a persisted trigram->term inverted table, which
    composes from this same profile expression.
    """
    from .textops import document_term_stats

    q = query.lower()
    padded = f"^{q}$"
    qtris = sorted({padded[i:i + 3] for i in range(len(padded) - 2)})
    if vocab is None:
        vocab = document_term_stats(docs, min_df=1)
    vocab = vocab.select("term", "df")
    p = F.concat(F.lit("^"), F.col("term"), F.lit("$"))
    tris = F.array_distinct(
        F.transform(
            F.sequence(F.lit(1), F.length(p) - 2),
            lambda i: F.substring(p, i, F.lit(3)),
        )
    )
    qarr = F.array(*[F.lit(t) for t in qtris])
    cand = (
        vocab.withColumn("tris", tris)
        .withColumn(
            "shared", F.size(F.array_intersect(F.col("tris"), qarr))
        )
        .where(F.col("shared") > 0)
    )
    return (
        cand.withColumn(
            "jaccard",
            F.round(
                F.col("shared")
                / (F.size("tris") + F.lit(len(qtris)) - F.col("shared")),
                6,
            ),
        )
        .withColumn(
            "lev", F.levenshtein(F.col("term"), F.lit(q)).cast("long")
        )
        .where(F.col("lev") <= max_dist)
        .orderBy(F.asc("lev"), F.desc("jaccard"), F.asc("term"))
        .limit(k)
        .select("term", "df", "lev", "jaccard")
    )


def token_count_bpe(docs: DataFrame) -> DataFrame:
    """BPE-ish token counting for training-data budgeting: word pieces,
    number runs and single punctuation each count as one token."""
    pattern = "\\p{L}+|[0-9]+|[^\\s\\p{L}0-9]"
    return docs.select(
        "doc_id",
        F.size(
            F.regexp_extract_all(F.lower("text"), F.lit(pattern), F.lit(0))
        ).cast("long").alias("n_bpe_tokens"),
    )


def word_trigram_counts(docs: DataFrame) -> DataFrame:
    """(trigram, freq): corpus-wide word-trigram counts (full table)."""
    from ..tokenization import MAX_WORD_LEN, TOKEN_SPLIT_RE

    toks = docs.select(
        F.filter(
            F.split(F.lower("text"), TOKEN_SPLIT_RE),
            lambda x: (F.length(x) >= 1) & (F.length(x) <= MAX_WORD_LEN),
        ).alias("toks")
    )
    tri = toks.where(F.size("toks") >= 3).select(
        F.explode(
            F.transform(
                F.sequence(F.lit(0), F.size("toks") - F.lit(3)),
                lambda i: F.concat_ws(" ", F.slice("toks", i + 1, 3)),
            )
        ).alias("trigram")
    )
    return tri.groupBy("trigram").agg(
        F.count("*").cast("long").alias("freq")
    )


def word_trigrams(docs: DataFrame, limit: int = 100) -> DataFrame:
    """(trigram, freq): corpus-wide word-trigram counts, top-N.

    Reference: the ``trigrams`` table with its server-side upsert
    (db/models.py:566-617) — re-expressed as groupBy().count() over a
    JVM-built sliding window (the append-then-MERGE pattern replaces
    per-row ON CONFLICT at scale; :func:`merge_trigram_counts` is that
    incremental path)."""
    return (
        word_trigram_counts(docs)
        .orderBy(F.desc("freq"), F.asc("trigram"))
        .limit(limit)
    )


def merge_trigram_counts(
    spark, store_path: str, docs: DataFrame,
    batch_id: "str | None" = None,
) -> int:
    """Accumulate a batch's trigram counts into a persistent store —
    the reference's per-row ``ON CONFLICT (t1,t2,t3) DO UPDATE SET
    frequency = frequency + new`` (db/models.py:586-609) as one
    append-then-MERGE. On Iceberg this is ``MERGE INTO trigrams USING
    batch ON trigram WHEN MATCHED THEN UPDATE SET freq = t.freq +
    b.freq``.

    The store is LOG-STRUCTURED (operators/runstore.py — the same
    substrate as the index's term counts): a batch's trigram counts are
    appended as ONE run (O(batch) write, zero store reads) and readers
    aggregate base ∪ runs into the exact view. Two earlier designs were
    retired by measurement: the round-2 whole-store union+overwrite was
    O(store) per batch, and the round-3 hash-bucketed "touched buckets
    only" MERGE was O(store) in disguise — a real document batch has
    thousands of distinct trigrams and touches every bucket
    (scripts/append_stats_scaling.py shows the same effect on term
    counts). Crash safety is by construction: a run becomes visible with
    one atomic rename (the round-3 advice's half-merged-bucket and
    ``bkt=N.old`` resurrection windows cannot exist), and *batch_id*
    doubles as the run id, so replaying a crashed batch is a no-op.
    Call :func:`compact_trigram_counts` periodically (the cron's
    maintenance slot) to fold runs.

    Returns the number of distinct trigrams in the merged view.
    """
    from .runstore import append_run

    _migrate_legacy_trigram_store(spark, store_path)
    append_run(
        spark, store_path, word_trigram_counts(docs), run_id=batch_id
    )
    return load_trigram_counts(spark, store_path).count()


def _legacy_trigram_bkt_df(spark, store_path: str) -> "DataFrame | None":
    """Rows of a pre-round-4 hash-bucketed trigram store (``bkt=N``
    dirs), or None when the store has no legacy layout."""
    import os

    if os.path.isdir(store_path) and any(
        d.startswith("bkt=") for d in os.listdir(store_path)
    ):
        return spark.read.parquet(store_path).select("trigram", "freq")
    return None


def _migrate_legacy_trigram_store(spark, store_path: str) -> None:
    """One-time migration of a pre-round-4 ``bkt=`` store into the
    log-structured layout: without it, the first :func:`merge_trigram_counts`
    run would make ``load_counts`` non-None and silently orphan every
    previously accumulated count (round-4 advice). The legacy rows
    become ``base-1`` with one atomic publish; the stale ``bkt=`` dirs
    are ignored by the runstore's explicit-path reads."""
    from .runstore import current_epoch, compact, has_runs

    if current_epoch(store_path) > 0 or has_runs(store_path):
        return  # already log-structured
    legacy = _legacy_trigram_bkt_df(spark, store_path)
    if legacy is not None:
        compact(spark, store_path, legacy.sortWithinPartitions("trigram"))


def load_trigram_counts(spark, store_path: str) -> DataFrame:
    """(trigram, freq) — the exact accumulated view (base ∪ runs).
    Reads a pre-round-4 hash-bucketed store (``bkt=N`` dirs)
    transparently, mirroring ``postings.load_term_counts``."""
    from .runstore import load_counts

    df = load_counts(spark, store_path, ["trigram"], ["freq"])
    if df is None:
        df = _legacy_trigram_bkt_df(spark, store_path)
    if df is None:
        return spark.createDataFrame([], "trigram string, freq long")
    return df


def compact_trigram_counts(spark, store_path: str) -> None:
    """Fold accumulated runs into a new base epoch (periodic
    maintenance; the view is exact either way)."""
    from .runstore import compact

    compact(
        spark, store_path,
        load_trigram_counts(spark, store_path)
        .sortWithinPartitions("trigram"),
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


def bigram_pmi(docs: DataFrame, min_freq: int = 5, limit: int = 50) -> DataFrame:
    """(w1, w2, freq, pmi): pointwise mutual information of adjacent
    word pairs — collocation strength, the statistical upgrade of the
    reference's related-words co-occurrence (db/sql.py:287-316).

    pmi = ln(p(w1,w2) / (p(w1) p(w2))) with probabilities over adjacent
    pair positions / token positions. One tokenize pass feeds both the
    unigram and the bigram aggregates (JVM sliding window, no UDF);
    both aggregates are partial-agg shuffles on their own keys. Rounded
    to 4 decimals, ordered (pmi desc, w1, w2) for determinism.
    """
    from ..tokenization import MAX_WORD_LEN, TOKEN_SPLIT_RE

    toks = docs.select(
        F.filter(
            F.split(F.lower("text"), TOKEN_SPLIT_RE),
            lambda x: (F.length(x) >= 1) & (F.length(x) <= MAX_WORD_LEN),
        ).alias("toks")
    )
    uni = (
        toks.select(F.explode("toks").alias("w"))
        .groupBy("w")
        .agg(F.count("*").cast("long").alias("wf"))
    )
    n_tokens = uni.agg(F.sum("wf").alias("n")).withColumnRenamed("n", "n_tok")
    pairs = (
        toks.where(F.size("toks") >= 2)
        .select(
            F.explode(
                F.transform(
                    F.sequence(F.lit(0), F.size("toks") - F.lit(2)),
                    lambda i: F.struct(
                        F.col("toks")[i].alias("w1"),
                        F.col("toks")[i + 1].alias("w2"),
                    ),
                )
            ).alias("p")
        )
        .select("p.w1", "p.w2")
        .groupBy("w1", "w2")
        .agg(F.count("*").cast("long").alias("freq"))
    )
    # total pair count BEFORE the frequency floor, so p(w1,w2) is a true
    # probability over ALL adjacent pair positions (round-2 ADVICE: the
    # post-filter total shifted every PMI by a constant ln(N_all/N_freq))
    n_pairs = pairs.agg(F.sum("freq").alias("n")).withColumnRenamed(
        "n", "n_pair"
    )
    pairs = pairs.where(F.col("freq") >= min_freq)
    u1 = uni.select(F.col("w").alias("w1"), F.col("wf").alias("wf1"))
    u2 = uni.select(F.col("w").alias("w2"), F.col("wf").alias("wf2"))
    return (
        pairs.join(F.broadcast(u1), "w1")
        .join(F.broadcast(u2), "w2")
        .crossJoin(F.broadcast(n_pairs))
        .crossJoin(F.broadcast(n_tokens))
        .select(
            "w1", "w2", "freq",
            F.round(
                F.log(
                    (F.col("freq").cast("double") / F.col("n_pair"))
                    / (
                        (F.col("wf1").cast("double") / F.col("n_tok"))
                        * (F.col("wf2").cast("double") / F.col("n_tok"))
                    )
                ),
                4,
            ).alias("pmi"),
        )
        .orderBy(F.desc("pmi"), F.asc("w1"), F.asc("w2"))
        .limit(limit)
    )


def tfidf_keywords(docs: DataFrame, per_doc: int = 3, min_df: int = 3) -> DataFrame:
    """(doc_id, term, tfidf, rk): top-N characteristic terms per doc by
    tf-idf — the reference's per-article topic-term surface
    (vectors/builder.py tf-idf dictionary) as a relational plan: one
    postings aggregate, broadcast df stats, one window per doc."""
    postings = document_postings(docs)
    n_docs = docs.select(F.countDistinct("doc_id").alias("n"))
    df_stats = (
        postings.groupBy("term")
        .agg(F.count("*").cast("long").alias("df"))
        .where(F.col("df") >= min_df)
    )
    scored = (
        postings.join(F.broadcast(df_stats), "term")
        .crossJoin(F.broadcast(n_docs))
        .select(
            "doc_id", "term",
            F.round(
                F.col("tf").cast("double")
                * F.log(F.col("n").cast("double") / F.col("df")),
                4,
            ).alias("tfidf"),
        )
    )
    w = Window.partitionBy("doc_id").orderBy(
        F.desc("tfidf"), F.asc("term")
    )
    return (
        scored.withColumn("rk", F.row_number().over(w).cast("long"))
        .where(F.col("rk") <= per_doc)
        .select("doc_id", "term", "tfidf", "rk")
    )
