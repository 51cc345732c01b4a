"""Distributed LDA: deterministic variational EM, partition-invariant
sufficient statistics, improving ELBO, planted-topic recovery."""

import numpy as np
import pytest

from greynirserver_spark.operators import lda


@pytest.fixture(scope="module")
def docs(spark):
    return spark.read.parquet("/root/testdata/sf0.001/documents.parquet")


def test_digamma_matches_known_values():
    # psi(1) = -euler_gamma; psi(0.5) = -euler_gamma - 2 ln 2
    eg = 0.5772156649015329
    assert abs(lda._digamma(np.array([1.0]))[0] + eg) < 1e-10
    assert abs(lda._digamma(np.array([0.5]))[0]
               + eg + 2 * np.log(2.0)) < 1e-10
    # recurrence psi(x+1) = psi(x) + 1/x across a range
    x = np.linspace(0.1, 20.0, 200)
    lhs = lda._digamma(x + 1.0)
    rhs = lda._digamma(x) + 1.0 / x
    assert np.allclose(lhs, rhs, atol=1e-10)


def test_fit_deterministic_across_partitioning(docs):
    m1 = lda.fit_lda(docs.repartition(3), k=4, vocab_size=64, iters=3)
    m2 = lda.fit_lda(docs.repartition(13), k=4, vocab_size=64, iters=3)
    assert m1.terms == m2.terms
    assert np.allclose(m1.lam, m2.lam, rtol=1e-8)
    assert np.allclose(m1.bounds, m2.bounds, rtol=1e-8)


def test_bound_improves_and_topics_normalized(docs):
    m = lda.fit_lda(docs, k=4, vocab_size=64, iters=6)
    assert m.bounds[-1] > m.bounds[0]
    tw = m.topic_word()
    assert np.allclose(tw.sum(axis=1), 1.0, atol=1e-12)
    tt = lda.lda_topic_terms(m, topn=5)
    assert len(tt) == 4 * 5
    # weights within a topic are rank-ordered
    for t in range(4):
        ws = [w for tp, r, term, w in tt if tp == t]
        assert ws == sorted(ws, reverse=True)


def test_planted_topics_recovered(spark):
    """Two disjoint-vocabulary document groups: k=2 LDA must give the
    two groups opposite dominant topics."""
    a_words = ["alfa", "beta", "gamma", "delta", "epsil"]
    b_words = ["einn", "tveir", "thrir", "fjorir", "fimm"]
    rows = []
    rng = np.random.Generator(np.random.SFC64(np.random.SeedSequence([7])))
    for i in range(40):
        words = a_words if i < 20 else b_words
        text = " ".join(words[int(j)] for j in
                        rng.integers(0, len(words), 60))
        rows.append((i, text))
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    m = lda.fit_lda(docs, k=2, vocab_size=16, min_df=1, iters=15)
    theta = lda.infer_doc_topics(docs, m).toPandas()
    dom = theta.loc[theta.groupby("doc_id")["weight"].idxmax()] \
        .set_index("doc_id")["topic"]
    a_top = set(dom[dom.index < 20])
    b_top = set(dom[dom.index >= 20])
    assert len(a_top) == 1 and len(b_top) == 1 and a_top != b_top


def test_infer_thetas_sum_to_one(docs):
    m = lda.fit_lda(docs, k=4, vocab_size=64, iters=3)
    pdf = lda.infer_doc_topics(docs, m).toPandas()
    sums = pdf.groupby("doc_id")["weight"].sum()
    assert (np.abs(sums - 1.0) < 1e-2).all()
