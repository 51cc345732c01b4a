"""Distributed LSA (latent semantic indexing) topic layer over `documents`.

Re-expresses the reference's vectors module Spark-first
(`/root/reference/vectors/builder.py`):

* tf-idf model + LSI build (builder.py:198-244 `create_tfidf_model` /
  `create_lsi_model`): here a rank-k truncated SVD fitted DISTRIBUTED —
  per-partition Gram-matrix accumulation (`mapInPandas`, one V-vector
  row group per partition), element-wise sum by Gram row, then a single
  O(V^2) collect and a driver-side `eigh`.  The collect is independent
  of corpus size: 10^12 documents and 10^3 documents ship the same
  V x V matrix to the driver, which is what makes the fit viable at
  100 TB (the classic tall-skinny Gram trick).
* per-article topic tagging (builder.py:471-530
  `assign_article_topics`): cosine similarity of the article's LSI
  vector against each topic's LSI vector, tagged where
  `similarity >= topic.threshold` (builder.py:516).
* topic vectors from keyword bags (builder.py:322-360
  `load_topics` / Topics.conf): a topic is a keyword list; its vector
  is the LSI projection of the keywords' tf-idf bag.
* weighted-average fallback for terms missing from the model
  dictionary (builder.py:360-470 `get_topic_vector`): a query term not
  in the LSA vocabulary contributes the weighted mean of the LSA
  vectors of the documents containing it, with the reference's weight
  ladder (entities/persons 2.0, out-of-dictionary terms 1.2,
  in-dictionary terms 1.0).

Tokenization and the tf-idf formula are shared with
`operators.textops.document_postings` / `analytics.tfidf_keywords`
(weight = tf * ln(n_docs / df), df >= min_df) so the DuckDB oracle for
the term-space twin reuses the established SQL tokenizer.

Two assignment paths:

* `topic_assign_cosine` — TERM-SPACE twin (no SVD): cosine between the
  full tf-idf document vector and the keyword tf-idf vector.  Fully
  SQL-expressible, DuckDB-oracle-gated.
* `assign_topics_lsa` — the LSA-space path (SVD projection).  The fit
  is pinned against a dense numpy SVD in pytest (subspace identity up
  to sign); the driver records a rows-only check.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Iterable, Iterator, List, Sequence, Tuple

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from .textops import document_postings

__all__ = [
    "TOPICS",
    "LsaModel",
    "lsa_vocabulary",
    "document_vectors",
    "fit_lsa",
    "init_gram_store",
    "append_gram",
    "fit_from_gram_store",
    "compact_gram_store",
    "project_documents",
    "topic_vectors_lsa",
    "assign_topics_lsa",
    "topic_assign_cosine",
    "query_topic_vector",
    "similar_docs_lsa",
]

# The Gram trick is O(V^2) in executor-partial and driver memory
# (V=8192 -> 512 MB of float64).  Beyond this, rank-k needs a
# randomized/streaming SVD, not a bigger Gram — refuse loudly instead
# of OOMing an executor at scale.
MAX_GRAM_VOCAB = 8192

# Deterministic topic definitions over the `documents` vocabulary —
# the analog of the reference's Topics.conf keyword lists (each topic:
# name, keyword tuple, cosine threshold).  Thresholds are chosen with
# a wide margin to any attained similarity at the test scales so that
# float-association drift between engines cannot flip an assignment.
TOPICS: Tuple[Tuple[str, Tuple[str, ...], float], ...] = (
    ("storage", ("table", "row", "column", "scan", "part"), 0.41234),
    ("exec", ("join", "hash", "merge", "sort", "agg"), 0.41234),
    ("stream", ("stream", "window", "batch", "spark"), 0.37345),
    ("perf", ("slow", "fast", "small", "big"), 0.37345),
)


def lsa_vocabulary(docs: DataFrame | None, vocab_size: int = 512,
                   min_df: int = 3,
                   postings: DataFrame | None = None) -> DataFrame:
    """(term, idx, df, n_docs): the top-`vocab_size` terms by document
    frequency (ties by term), densely indexed 0..V-1 — the analog of the
    reference's pruned gensim dictionary (builder.py:180-196).

    Pass `postings` (term, doc_id, tf) to reuse an already-built table
    (e.g. an IndexStore's) instead of re-tokenizing `docs`."""
    if vocab_size > MAX_GRAM_VOCAB:
        raise ValueError(
            f"vocab_size={vocab_size} > {MAX_GRAM_VOCAB}: the Gram-matrix "
            "fit is O(V^2) per partition and on the driver; use a "
            "randomized SVD for larger vocabularies"
        )
    post = postings if postings is not None else document_postings(docs)
    nd_src = docs if docs is not None else post
    nd = nd_src.select(F.countDistinct("doc_id").cast("long").alias("n_docs"))
    dfs = (
        post.groupBy("term")
        .agg(F.count("*").cast("long").alias("df"))
        .where(F.col("df") >= min_df)
    )
    # Distributed top-V (TakeOrderedAndProject), THEN a row_number over
    # the <=V survivors only — the global window never sees the full
    # term table.
    top = dfs.orderBy(F.desc("df"), F.asc("term")).limit(vocab_size)
    w = Window.orderBy(F.desc("df"), F.asc("term"))
    return (
        top.withColumn("idx", F.row_number().over(w).cast("long") - 1)
        .crossJoin(F.broadcast(nd))
        .select("term", "idx", "df", "n_docs")
    )


def document_vectors(docs: DataFrame | None, vocab: DataFrame,
                     postings: DataFrame | None = None) -> DataFrame:
    """(doc_id, idxs array<long>, ws array<double>): sparse tf-idf
    document vectors restricted to the LSA vocabulary, idx-sorted.
    weight = tf * ln(n_docs / df) — same formula as tfidf_keywords."""
    post = postings if postings is not None else document_postings(docs)
    weighted = post.join(F.broadcast(vocab), "term").select(
        "doc_id", "idx",
        (F.col("tf").cast("double")
         * F.log(F.col("n_docs").cast("double") / F.col("df"))).alias("w"),
    )
    pairs = weighted.groupBy("doc_id").agg(
        F.array_sort(
            F.collect_list(F.struct("idx", "w"))
        ).alias("pairs")
    )
    return pairs.select(
        "doc_id",
        F.transform("pairs", lambda p: p["idx"]).alias("idxs"),
        F.transform("pairs", lambda p: p["w"]).alias("ws"),
    )


@dataclass
class LsaModel:
    """Fitted rank-k LSA model: dense term index + projection matrix."""
    terms: List[str]          # idx-ordered vocabulary
    df: np.ndarray            # (V,) document frequencies
    n_docs: int
    u: np.ndarray             # (V, k) left singular vectors, sign-fixed
    s: np.ndarray             # (k,) singular values (>= 0)

    @property
    def k(self) -> int:
        return int(self.u.shape[1])

    def idf(self) -> np.ndarray:
        return np.log(float(self.n_docs) / self.df.astype(float))

    def term_index(self) -> dict:
        return {t: i for i, t in enumerate(self.terms)}

    def project_bag(self, bag: Iterable[Tuple[int, float]]) -> np.ndarray:
        """Project a sparse tf-idf bag [(idx, weight)] into LSA space:
        v = U_k^T x (builder.py:432-437 analog, without gensim)."""
        v = np.zeros(self.k)
        for idx, w in bag:
            v += w * self.u[idx]
        return v


def _gram_rows(k_dim: int):
    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        g = np.zeros((k_dim, k_dim))
        touched = False
        for pdf in batches:
            for idxs, ws in zip(pdf["idxs"], pdf["ws"]):
                ii = np.asarray(idxs, dtype=np.int64)
                ww = np.asarray(ws, dtype=np.float64)
                g[np.ix_(ii, ii)] += np.outer(ww, ww)
                touched = True
        if touched:
            yield pd.DataFrame({
                "i": np.arange(k_dim, dtype=np.int64),
                "v": [g[i].tolist() for i in range(k_dim)],
            })
    return fn


def _sum_rows(key, pdf: pd.DataFrame) -> pd.DataFrame:
    acc = np.sum(np.stack([np.asarray(v, dtype=np.float64)
                           for v in pdf["v"]]), axis=0)
    return pd.DataFrame({"i": [key[0]], "v": [acc.tolist()]})


def _model_from_gram(g: np.ndarray, vrows, k: int) -> LsaModel:
    evals, evecs = np.linalg.eigh(g)
    order = np.argsort(evals)[::-1][: min(k, g.shape[0])]
    u = evecs[:, order]
    s = np.sqrt(np.clip(evals[order], 0.0, None))
    # Deterministic sign: the largest-magnitude component of each
    # eigenvector is made positive (first index on ties).
    for j in range(u.shape[1]):
        pivot = int(np.argmax(np.abs(u[:, j])))
        if u[pivot, j] < 0:
            u[:, j] = -u[:, j]
    return LsaModel(
        terms=[r["term"] for r in vrows],
        df=np.array([r["df"] for r in vrows], dtype=np.int64),
        n_docs=int(vrows[0]["n_docs"]),
        u=u,
        s=s,
    )


def fit_lsa(docs: DataFrame | None, k: int = 32, vocab_size: int = 512,
            min_df: int = 3, postings: DataFrame | None = None) -> LsaModel:
    """Fit a rank-k LSA model distributed.  G = A^T A is accumulated
    per partition (`mapInPandas`, sparse outer products), summed
    element-wise per Gram ROW (one shuffle of `partitions x V` array
    rows), and only the V x V result — corpus-size independent — is
    collected for the driver-side `eigh`.  Eigenvector sign is fixed
    (largest-|component| positive) so the fit is deterministic for any
    input partitioning."""
    vocab = lsa_vocabulary(docs, vocab_size=vocab_size, min_df=min_df,
                           postings=postings)
    vrows = vocab.orderBy("idx").collect()
    if not vrows:
        return LsaModel([], np.zeros(0, dtype=np.int64), 0,
                        np.zeros((0, 0)), np.zeros(0))
    v_dim = len(vrows)
    vecs = document_vectors(docs, vocab, postings=postings)
    gram_df = vecs.mapInPandas(
        _gram_rows(v_dim), schema="i long, v array<double>"
    )
    summed = gram_df.groupBy("i").applyInPandas(
        _sum_rows, schema="i long, v array<double>"
    )
    rows = summed.collect()
    g = np.zeros((v_dim, v_dim))
    for r in rows:
        g[r["i"]] = np.asarray(r["v"], dtype=np.float64)
    return _model_from_gram(g, vrows, k)


# --------------------------------------------------------------- Gram store
#
# Incremental LSA refresh on the log-structured substrate (runstore):
# the Gram matrix is ADDITIVE over documents, so an append batch
# contributes one run of V rows — O(batch) compute, zero reads of old
# documents — and a refit is a row-sum + driver eigh.  The vocabulary
# (and therefore the tf-idf weights) is FROZEN at store init, exactly
# the reference's pickled-dictionary/TfidfModel staleness semantics
# (builder.py:180-207: the tfidf model is built once from the
# dictionary and reused for every later article); recomputing the
# vocabulary is a rebuild, not an append.

def init_gram_store(docs: DataFrame, store_dir: str,
                    vocab_size: int = 512, min_df: int = 3) -> bool:
    """Freeze the vocabulary for an incremental Gram store (no-op if
    the store is already initialized)."""
    import os

    vdir = os.path.join(store_dir, "vocab")
    if os.path.isdir(vdir):
        return False
    os.makedirs(store_dir, exist_ok=True)
    staging = os.path.join(store_dir, ".vocab-staging")
    lsa_vocabulary(docs, vocab_size=vocab_size, min_df=min_df) \
        .write.mode("overwrite").parquet(staging)
    os.rename(staging, vdir)
    return True


def _gram_vocab(spark: SparkSession, store_dir: str) -> DataFrame:
    import os

    return spark.read.parquet(os.path.join(store_dir, "vocab"))


def append_gram(spark: SparkSession, store_dir: str, docs_batch: DataFrame,
                batch_id: str) -> bool:
    """Append one batch's Gram contribution as a runstore run —
    write-only, replay-idempotent by batch id (crash recovery:
    `runstore.remove_run(spark, <store>/gram, batch_id)`)."""
    import os

    from . import runstore

    vocab = _gram_vocab(spark, store_dir)
    v_dim = vocab.count()
    vecs = document_vectors(docs_batch, vocab)
    gram_df = vecs.mapInPandas(
        _gram_rows(v_dim), schema="i long, v array<double>")
    return runstore.append_run(
        spark, os.path.join(store_dir, "gram"), gram_df, run_id=batch_id)


def _summed_gram(spark: SparkSession, store_dir: str):
    import os

    from . import runstore

    rows_df = runstore.load_rows(spark, os.path.join(store_dir, "gram"))
    if rows_df is None:
        return None
    return rows_df.groupBy("i").applyInPandas(
        _sum_rows, schema="i long, v array<double>")


def fit_from_gram_store(spark: SparkSession, store_dir: str,
                        k: int = 32) -> LsaModel:
    """Refit from base ∪ runs: one row-sum shuffle over (runs+1) × V
    array rows, one O(V^2) collect, driver eigh — independent of how
    many documents the appended batches carried."""
    vrows = _gram_vocab(spark, store_dir).orderBy("idx").collect()
    summed = _summed_gram(spark, store_dir)
    v_dim = len(vrows)
    g = np.zeros((v_dim, v_dim))
    if summed is not None:
        for r in summed.collect():
            g[r["i"]] = np.asarray(r["v"], dtype=np.float64)
    return _model_from_gram(g, vrows, k)


def compact_gram_store(spark: SparkSession, store_dir: str) -> None:
    """Fold all runs into a new base epoch (one atomic rename; folded
    batch ids are adopted into the replay manifest by runstore)."""
    import os

    from . import runstore

    summed = _summed_gram(spark, store_dir)
    if summed is not None:
        runstore.compact(spark, os.path.join(store_dir, "gram"), summed)


def _term_u_df(spark: SparkSession, model: LsaModel) -> DataFrame:
    rows = [
        (t, float(np.log(float(model.n_docs) / model.df[i])),
         [float(x) for x in model.u[i]])
        for i, t in enumerate(model.terms)
    ]
    return spark.createDataFrame(rows, "term string, idf double, u array<double>")


def project_documents(docs: DataFrame | None, model: LsaModel,
                      postings: DataFrame | None = None) -> DataFrame:
    """(doc_id, vec array<double>): LSA vectors for every document —
    postings join a BROADCAST (term, idf, U-row) dim, per-term
    contribution `tf*idf*U[term]`, element-wise array sum per doc.
    All JVM higher-order functions; no Python in the per-token path."""
    post = postings if postings is not None else document_postings(docs)
    spark = post.sparkSession
    term_u = _term_u_df(spark, model)
    kdim = model.k
    contrib = post.join(F.broadcast(term_u), "term").select(
        "doc_id",
        F.transform(
            "u", lambda x: x * F.col("tf").cast("double") * F.col("idf")
        ).alias("contrib"),
    )
    zero = F.array_repeat(F.lit(0.0), kdim)
    return contrib.groupBy("doc_id").agg(
        F.aggregate(
            F.collect_list("contrib"), zero,
            lambda acc, x: F.zip_with(acc, x, lambda a, b: a + b),
        ).alias("vec")
    )


def topic_vectors_lsa(model: LsaModel,
                      topics: Sequence[Tuple[str, Tuple[str, ...], float]]
                      = TOPICS) -> List[Tuple[str, np.ndarray, float]]:
    """Topic LSI vectors from keyword bags (builder.py:322-360): each
    keyword contributes tf=1, weight = idf, projected through U_k."""
    tix = model.term_index()
    idf = model.idf()
    out = []
    for name, kws, threshold in topics:
        bag = [(tix[w], float(idf[tix[w]])) for w in kws if w in tix]
        out.append((name, model.project_bag(bag), threshold))
    return out


def _cosine_expr(a: str, b: str):
    dot = F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0),
        lambda acc, x: acc + x,
    )
    na = F.sqrt(F.aggregate(
        F.transform(a, lambda x: x * x), F.lit(0.0), lambda acc, x: acc + x))
    nb = F.sqrt(F.aggregate(
        F.transform(b, lambda x: x * x), F.lit(0.0), lambda acc, x: acc + x))
    return dot / (na * nb)


def assign_topics_lsa(docs: DataFrame, model: LsaModel,
                      topics: Sequence[Tuple[str, Tuple[str, ...], float]]
                      = TOPICS) -> DataFrame:
    """(doc_id, topic, sim): LSA-space thresholded topic tagging —
    the reference's assign_article_topics (builder.py:471-530) as one
    broadcast cross join + JVM cosine; a doc is tagged with every topic
    whose cosine clears that topic's threshold."""
    spark = docs.sparkSession
    tvecs = topic_vectors_lsa(model, topics)
    tdf = spark.createDataFrame(
        [(n, [float(x) for x in v], float(t)) for n, v, t in tvecs],
        "topic string, tvec array<double>, threshold double",
    )
    dvecs = project_documents(docs, model)
    sim = dvecs.crossJoin(F.broadcast(tdf)).select(
        "doc_id", "topic", "threshold",
        _cosine_expr("vec", "tvec").alias("sim_raw"),
    )
    return (
        sim.where(F.col("sim_raw") >= F.col("threshold"))
        .select("doc_id", "topic", F.round("sim_raw", 4).alias("sim"))
        .orderBy("doc_id", "topic")
    )


def topic_assign_cosine(docs: DataFrame,
                        topics: Sequence[Tuple[str, Tuple[str, ...], float]]
                        = TOPICS, min_df: int = 3) -> DataFrame:
    """(doc_id, topic, sim): TERM-SPACE thresholded topic tagging —
    cosine between the full tf-idf document vector and the topic's
    keyword idf vector (tf=1 per keyword, builder.py:322-360 bag
    semantics), tag where sim >= threshold (builder.py:516).  Pure
    relational plan: one postings aggregate, broadcast df stats and
    keyword dim, one dot-product aggregate — the DuckDB-oracle-gated
    twin of the LSA path."""
    spark = docs.sparkSession
    post = document_postings(docs)
    nd = docs.select(F.countDistinct("doc_id").cast("double").alias("n"))
    dfs = (
        post.groupBy("term")
        .agg(F.count("*").cast("long").alias("df"))
        .where(F.col("df") >= min_df)
    )
    weights = (
        post.join(F.broadcast(dfs), "term")
        .crossJoin(F.broadcast(nd))
        .select(
            "doc_id", "term",
            (F.col("tf").cast("double") * F.log(F.col("n") / F.col("df"))
             ).alias("w"),
        )
    )
    doc_norm = weights.groupBy("doc_id").agg(
        F.sqrt(F.sum(F.col("w") * F.col("w"))).alias("dnorm"))
    kw_rows = [(name, kw, float(thr)) for name, kws, thr in topics
               for kw in kws]
    kws_df = spark.createDataFrame(
        kw_rows, "topic string, term string, threshold double")
    tw = (
        kws_df.join(dfs, "term")
        .crossJoin(F.broadcast(nd))
        .select("topic", "term", "threshold",
                F.log(F.col("n") / F.col("df")).alias("kw"))
    )
    topic_norm = tw.groupBy("topic").agg(
        F.sqrt(F.sum(F.col("kw") * F.col("kw"))).alias("tnorm"))
    dots = (
        weights.join(F.broadcast(tw), "term")
        .groupBy("doc_id", "topic", "threshold")
        .agg(F.sum(F.col("w") * F.col("kw")).alias("dot"))
    )
    # doc_norm is per-document (corpus-sized) — shuffle join on doc_id;
    # only the |topics|-row norm table is broadcast.
    return (
        dots.join(doc_norm, "doc_id")
        .join(F.broadcast(topic_norm), "topic")
        .withColumn("sim_raw",
                    F.col("dot") / (F.col("dnorm") * F.col("tnorm")))
        .where(F.col("sim_raw") >= F.col("threshold"))
        .select("doc_id", "topic", F.round("sim_raw", 4).alias("sim"))
        .orderBy("doc_id", "topic")
    )


def query_topic_vector(docs: DataFrame, model: LsaModel,
                       terms: Sequence[Tuple[str, str]],
                       doc_vecs: DataFrame | None = None,
                       ) -> Tuple[np.ndarray, List[float]]:
    """LSA vector for a query term list [(term, cat)] with the
    reference's missing-word fallback (builder.py:360-470): terms in
    the model dictionary project directly (weight 1.0); entity/person
    terms weigh 2.0 and out-of-dictionary terms 1.2, each contributing
    the weighted MEAN of the LSA vectors of the documents containing
    the term — looked up DISTRIBUTED (postings anti-dim join, one
    k-float collect per lookup batch), never by scanning the corpus
    driver-side.  Returns (vector, per-term weights)."""
    tix = model.term_index()
    idf = model.idf()
    vec = np.zeros(model.k)
    weights: List[float] = []
    lookup: List[Tuple[str, float]] = []
    for term, cat in terms:
        t = term.lower()
        if cat == "entity" or cat.startswith("person"):
            lookup.append((t, 2.0))
            weights.append(2.0)
        elif t in tix:
            vec += float(idf[tix[t]]) * model.u[tix[t]]
            weights.append(1.0)
        else:
            lookup.append((t, 1.2))
            weights.append(1.2)
    if lookup:
        spark = docs.sparkSession
        if doc_vecs is None:
            doc_vecs = project_documents(docs, model)
        ldf = spark.createDataFrame(lookup, "term string, lw double")
        post = document_postings(docs)
        means = (
            post.join(F.broadcast(ldf), "term")
            .select("term", "doc_id", "lw").distinct()
            .join(doc_vecs, "doc_id")
            .groupBy("term", "lw")
            .agg(
                F.count("*").cast("double").alias("n"),
                F.aggregate(
                    F.collect_list("vec"),
                    F.array_repeat(F.lit(0.0), model.k),
                    lambda acc, x: F.zip_with(acc, x, lambda a, b: a + b),
                ).alias("vsum"),
            )
            .collect()
        )
        for r in means:
            mean = np.asarray(r["vsum"], dtype=np.float64) / r["n"]
            vec += r["lw"] * mean
    return vec, weights


def similar_docs_lsa(docs: DataFrame, model: LsaModel, doc_id: int,
                     k: int = 10,
                     doc_vecs: DataFrame | None = None) -> DataFrame:
    """(doc_id, sim): top-k most similar documents to `doc_id` by LSA
    cosine — the simserver surface (/root/reference/vectors/
    simserver.py:232-290) without the 1.2 GB driver matvec: the query
    vector is one 1-row collect, then a single filtered scan + top-k."""
    if doc_vecs is None:
        doc_vecs = project_documents(docs, model)
    qrow = doc_vecs.where(F.col("doc_id") == doc_id).collect()
    if not qrow:
        return doc_vecs.sparkSession.createDataFrame(
            [], "doc_id long, sim double")
    qvec = F.array(*[F.lit(float(x)) for x in qrow[0]["vec"]])
    return (
        doc_vecs.where(F.col("doc_id") != doc_id)
        .select(
            "doc_id",
            F.round(_cosine_expr("vec", qvec.alias("q")), 6).alias("sim"),
        )
        .orderBy(F.desc("sim"), F.asc("doc_id"))
        .limit(k)
    )
