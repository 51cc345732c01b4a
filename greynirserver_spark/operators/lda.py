"""Distributed LDA (latent Dirichlet allocation) over `documents`.

The reference builds an LDA topic model alongside LSI
(`/root/reference/vectors/builder.py:246-268 create_lda_model`, gensim
`LdaMulticore` over the tf-idf corpus).  Here the model is fitted with
batch variational EM in the canonical Spark shape (Hoffman et al. 2010
online VB, run in batch mode; same decomposition Spark MLlib's online
LDA optimizer uses):

* E-step DISTRIBUTED: the (K x V) variational topic-word parameter
  lambda is broadcast; each partition runs the per-document
  gamma/phi fixed-point in numpy over Arrow batches and emits its
  partial sufficient-statistics matrix as K rows of V doubles — the
  same additive-matrix trick as the LSA Gram fit
  (operators/lsa.py::fit_lsa).
* M-step on the driver: one K x V collect (corpus-size independent),
  `lambda = eta + sstats`.

Everything is deterministic: seeded lambda init, fixed inner-iteration
budget, additive float sums — so the fit is partition-invariant up to
float association (test-pinned).  No scipy: `digamma` is the standard
recurrence + asymptotic series in numpy.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Iterator, List

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, functions as F

from .lsa import lsa_vocabulary
from .textops import document_postings

__all__ = [
    "LdaModel",
    "document_count_vectors",
    "fit_lda",
    "lda_topic_terms",
    "infer_doc_topics",
]


def _digamma(x: np.ndarray) -> np.ndarray:
    """Vectorized digamma: recurrence up to x>=10, then the asymptotic
    series (Abramowitz & Stegun 6.3.18) — abs error ~1e-11 for x>0,
    plenty for variational updates (recurrence identity test-pinned)."""
    x = np.asarray(x, dtype=np.float64)
    res = np.zeros_like(x)
    xx = x.copy()
    for _ in range(10):
        small = xx < 10.0
        res -= np.where(small, 1.0 / np.where(small, xx, 1.0), 0.0)
        xx = np.where(small, xx + 1.0, xx)
    inv = 1.0 / xx
    inv2 = inv * inv
    res += (np.log(xx) - 0.5 * inv
            - inv2 * (1.0 / 12
                      - inv2 * (1.0 / 120
                                - inv2 * (1.0 / 252 - inv2 / 240))))
    return res


def document_count_vectors(docs: DataFrame | None, vocab: DataFrame,
                           postings: DataFrame | None = None) -> DataFrame:
    """(doc_id, idxs array<long>, cts array<double>): sparse raw-count
    document vectors over the model vocabulary, idx-sorted."""
    post = postings if postings is not None else document_postings(docs)
    pairs = (
        post.join(F.broadcast(vocab), "term")
        .groupBy("doc_id")
        .agg(F.array_sort(
            F.collect_list(F.struct("idx", F.col("tf").cast("double")
                                    .alias("ct")))).alias("pairs"))
    )
    return pairs.select(
        "doc_id",
        F.transform("pairs", lambda p: p["idx"]).alias("idxs"),
        F.transform("pairs", lambda p: p["ct"]).alias("cts"),
    )


@dataclass
class LdaModel:
    """Fitted LDA model: vocabulary + variational topic-word matrix."""
    terms: List[str]
    lam: np.ndarray              # (K, V) variational parameter lambda
    alpha: float
    eta: float
    bounds: List[float] = field(default_factory=list)  # per-iter ELBO part

    @property
    def k(self) -> int:
        return int(self.lam.shape[0])

    def exp_elog_beta(self) -> np.ndarray:
        el = _digamma(self.lam) - _digamma(
            self.lam.sum(axis=1, keepdims=True))
        return np.exp(el)

    def topic_word(self) -> np.ndarray:
        """Normalized topic-word distributions (K, V)."""
        return self.lam / self.lam.sum(axis=1, keepdims=True)


def _doc_gamma_phi(idxs, cts, expeb, alpha, inner_iters=50, tol=1e-4):
    """The per-document fixed point of Hoffman et al. (2010), eq. 2-4.
    Deterministic: gamma starts at 1 (not sampled), fixed budget."""
    k = expeb.shape[0]
    ids = np.asarray(idxs, dtype=np.int64)
    cnt = np.asarray(cts, dtype=np.float64)
    expeb_d = expeb[:, ids]                      # (K, nnz)
    gamma = np.ones(k)
    expet = np.exp(_digamma(gamma) - _digamma(gamma.sum()))
    for _ in range(inner_iters):
        last = gamma
        phinorm = expet @ expeb_d + 1e-100       # (nnz,)
        gamma = alpha + expet * (expeb_d @ (cnt / phinorm))
        expet = np.exp(_digamma(gamma) - _digamma(gamma.sum()))
        if np.mean(np.abs(gamma - last)) < tol:
            break
    phinorm = expet @ expeb_d + 1e-100
    sstats_d = np.outer(expet, cnt / phinorm) * expeb_d   # (K, nnz)
    bound = float(cnt @ np.log(phinorm))
    return gamma, ids, sstats_d, bound


def _e_step(expeb_bc, k: int, v: int, alpha: float):
    """`expeb_bc` is a Spark Broadcast of the (K, V) exp(E[log beta])
    matrix — fetched once per executor, not shipped in every task
    closure (K x V doubles is megabytes at production K/V)."""

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        expeb = expeb_bc.value
        sstats = np.zeros((k, v))
        bound = 0.0
        touched = False
        for pdf in batches:
            for idxs, cts in zip(pdf["idxs"], pdf["cts"]):
                _, ids, sd, b = _doc_gamma_phi(idxs, cts, expeb, alpha)
                sstats[:, ids] += sd
                bound += b
                touched = True
        if touched:
            out = pd.DataFrame({
                "i": np.arange(k, dtype=np.int64),
                "v": [sstats[i].tolist() for i in range(k)],
            })
            out.loc[len(out)] = [-1, [bound]]
            yield out
    return fn


def _sum_var_rows(key, pdf: pd.DataFrame) -> pd.DataFrame:
    acc = np.sum(np.stack([np.asarray(x, dtype=np.float64)
                           for x in pdf["v"]]), axis=0)
    return pd.DataFrame({"i": [key[0]], "v": [acc.tolist()]})


def fit_lda(docs: DataFrame | None, k: int = 8, vocab_size: int = 512,
            min_df: int = 3, iters: int = 10, seed: int = 42,
            alpha: float | None = None, eta: float | None = None,
            postings: DataFrame | None = None) -> LdaModel:
    """Batch variational EM: `iters` rounds of distributed E-step
    (broadcast lambda, per-partition numpy fixed point, K x V additive
    sufficient stats) + driver M-step.  Per-iteration driver traffic is
    one K x V matrix regardless of corpus size.  `bounds` records the
    per-word likelihood part of the ELBO each iteration (non-decreasing
    in practice; test-pinned to improve end-to-end)."""
    alpha = 1.0 / k if alpha is None else alpha
    eta = 1.0 / k if eta is None else eta
    vocab = lsa_vocabulary(docs, vocab_size=vocab_size, min_df=min_df,
                           postings=postings)
    vrows = vocab.orderBy("idx").collect()
    if not vrows:
        return LdaModel([], np.zeros((k, 0)), alpha, eta)
    v_dim = len(vrows)
    vecs = document_count_vectors(docs, vocab, postings=postings)
    vecs = vecs.persist()
    try:
        rng = np.random.Generator(np.random.SFC64(
            np.random.SeedSequence([seed])))
        lam = rng.gamma(100.0, 1.0 / 100.0, (k, v_dim))
        model = LdaModel([r["term"] for r in vrows], lam, alpha, eta)
        sc = vecs.sparkSession.sparkContext
        for _ in range(iters):
            expeb_bc = sc.broadcast(model.exp_elog_beta())
            try:
                rows = (
                    vecs.mapInPandas(_e_step(expeb_bc, k, v_dim, alpha),
                                     schema="i long, v array<double>")
                    .groupBy("i")
                    .applyInPandas(_sum_var_rows,
                                   schema="i long, v array<double>")
                    .collect()
                )
            finally:
                expeb_bc.destroy()
            sstats = np.zeros((k, v_dim))
            bound = 0.0
            for r in rows:
                if r["i"] < 0:
                    bound = float(r["v"][0])
                else:
                    sstats[r["i"]] = np.asarray(r["v"], dtype=np.float64)
            model.lam = eta + sstats
            model.bounds.append(bound)
        return model
    finally:
        vecs.unpersist()


def lda_topic_terms(model: LdaModel, topn: int = 10) -> List[tuple]:
    """[(topic, rank, term, weight)]: the topn terms per topic by the
    normalized topic-word weight (builder.py:260 print_topics analog),
    deterministic ties by term."""
    tw = model.topic_word()
    out = []
    for t in range(model.k):
        order = sorted(range(len(model.terms)),
                       key=lambda j: (-tw[t, j], model.terms[j]))[:topn]
        for r, j in enumerate(order, start=1):
            out.append((t, r, model.terms[j], round(float(tw[t, j]), 6)))
    return out


def infer_doc_topics(docs: DataFrame | None, model: LdaModel,
                     postings: DataFrame | None = None) -> DataFrame:
    """(doc_id, topic, weight): per-document topic mixture — the
    normalized variational gamma, one row per (doc, topic).  The model
    matrices ride the closure (Arrow-batched pandas path; ~K x V
    doubles per executor, same budget as the fit)."""
    spark = (docs if docs is not None else postings).sparkSession
    vocab = spark.createDataFrame(
        [(t, i) for i, t in enumerate(model.terms)], "term string, idx long"
    )
    post = postings if postings is not None else document_postings(docs)
    pairs = (
        post.join(F.broadcast(vocab), "term")
        .groupBy("doc_id")
        .agg(F.array_sort(
            F.collect_list(F.struct("idx", F.col("tf").cast("double")
                                    .alias("ct")))).alias("pairs"))
        .select(
            "doc_id",
            F.transform("pairs", lambda p: p["idx"]).alias("idxs"),
            F.transform("pairs", lambda p: p["ct"]).alias("cts"),
        )
    )
    expeb_bc = spark.sparkContext.broadcast(model.exp_elog_beta())
    alpha = model.alpha

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        expeb = expeb_bc.value
        for pdf in batches:
            rows = []
            for doc_id, idxs, cts in zip(pdf["doc_id"], pdf["idxs"],
                                         pdf["cts"]):
                gamma, _, _, _ = _doc_gamma_phi(idxs, cts, expeb, alpha)
                theta = gamma / gamma.sum()
                for t in range(len(theta)):
                    rows.append((int(doc_id), t, round(float(theta[t]), 4)))
            if rows:
                yield pd.DataFrame(rows,
                                   columns=["doc_id", "topic", "weight"])

    return pairs.mapInPandas(
        fn, schema="doc_id long, topic long, weight double")
