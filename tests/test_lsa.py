"""LSA topic layer: the SVD-space paths are pinned against a dense
numpy reference pipeline on the SAME tf-idf matrix (the term-space twin
`topic_assign_cosine` is DuckDB-oracle-gated by the driver instead)."""

import numpy as np
import pytest

from greynirserver_spark.operators import lsa


@pytest.fixture(scope="module")
def docs(spark):
    return spark.read.parquet("/root/testdata/sf0.001/documents.parquet")


@pytest.fixture(scope="module")
def model(docs):
    return lsa.fit_lsa(docs, k=8, vocab_size=64)


def _dense_tfidf(docs, vocab_size=64, min_df=3):
    """Dense numpy tf-idf matrix built from the same postings plan —
    the single-node ground truth for the distributed fit."""
    from greynirserver_spark.operators.textops import document_postings

    post = document_postings(docs).toPandas()
    n_docs = post["doc_id"].nunique()
    dfs = post.groupby("term")["doc_id"].nunique()
    dfs = dfs[dfs >= min_df]
    top = dfs.reset_index().rename(columns={"doc_id": "df"}).sort_values(
        ["df", "term"], ascending=[False, True]).head(vocab_size)
    terms = list(top["term"])
    tix = {t: i for i, t in enumerate(terms)}
    dfv = top["df"].to_numpy(float)
    doc_ids = sorted(post["doc_id"].unique())
    dix = {d: i for i, d in enumerate(doc_ids)}
    a = np.zeros((len(doc_ids), len(terms)))
    for _, r in post.iterrows():
        j = tix.get(r["term"])
        if j is not None:
            a[dix[r["doc_id"]], j] = r["tf"] * np.log(n_docs / dfv[j])
    return a, terms, doc_ids


def test_fit_matches_dense_numpy_svd(docs, model):
    a, terms, _ = _dense_tfidf(docs)
    assert model.terms == terms
    _, s_np, vt = np.linalg.svd(a, full_matrices=False)
    k = model.k
    assert np.allclose(model.s, s_np[:k], rtol=1e-8)
    # Subspace identity, robust to sign and eigenvalue ties: the rank-k
    # projection matrices must agree.
    p_spark = model.u @ model.u.T
    u_np = vt[:k].T
    p_np = u_np @ u_np.T
    assert np.allclose(p_spark, p_np, atol=1e-8)


def test_fit_deterministic_across_partitioning(docs, model):
    m2 = lsa.fit_lsa(docs.repartition(3), k=8, vocab_size=64)
    assert m2.terms == model.terms
    assert np.allclose(m2.s, model.s, rtol=1e-9)
    assert np.allclose(m2.u, model.u, atol=1e-9)


def test_assign_topics_lsa_matches_numpy_pipeline(docs, model):
    a, terms, doc_ids = _dense_tfidf(docs)
    dvecs = a @ model.u
    got = {(r["doc_id"], r["topic"]): r["sim"]
           for r in lsa.assign_topics_lsa(docs, model).collect()}
    expect = {}
    for name, tvec, threshold in lsa.topic_vectors_lsa(model):
        tn = np.linalg.norm(tvec)
        for i, d in enumerate(doc_ids):
            dn = np.linalg.norm(dvecs[i])
            if dn == 0 or tn == 0:
                continue
            sim = float(dvecs[i] @ tvec / (dn * tn))
            if sim >= threshold:
                expect[(d, name)] = round(sim, 4)
    assert set(got) == set(expect)
    for key in expect:
        assert abs(got[key] - expect[key]) <= 1e-3


def test_query_topic_vector_missing_term_fallback(docs, model):
    a, terms, doc_ids = _dense_tfidf(docs)
    tix = {t: i for i, t in enumerate(terms)}
    idf = model.idf()
    # one in-dictionary term, one entity (always looked up at 2.0)
    in_dict = terms[0]
    vec, weights = lsa.query_topic_vector(
        docs, model, [(in_dict, "no"), (in_dict, "entity")])
    assert weights == [1.0, 2.0]
    direct = idf[tix[in_dict]] * model.u[tix[in_dict]]
    # entity fallback: mean LSA vector of docs containing the term
    from greynirserver_spark.operators.textops import document_postings
    post = document_postings(docs).toPandas()
    hit_docs = sorted(post[post["term"] == in_dict]["doc_id"].unique())
    dvecs = a @ model.u
    dix = {d: i for i, d in enumerate(doc_ids)}
    mean = np.mean([dvecs[dix[d]] for d in hit_docs], axis=0)
    assert np.allclose(vec, direct + 2.0 * mean, atol=1e-6)


def test_similar_docs_lsa_matches_numpy(docs, model):
    a, terms, doc_ids = _dense_tfidf(docs)
    dvecs = a @ model.u
    q = doc_ids[0]
    got = [(r["doc_id"], r["sim"])
           for r in lsa.similar_docs_lsa(docs, model, q, k=5).collect()]
    norms = np.linalg.norm(dvecs, axis=1)
    qi = doc_ids.index(q)
    sims = dvecs @ dvecs[qi] / (norms * norms[qi])
    order = sorted(
        ((d, float(sims[i])) for i, d in enumerate(doc_ids) if d != q),
        key=lambda x: (-round(x[1], 6), x[0]))[:5]
    assert [d for d, _ in got] == [d for d, _ in order]
    for (gd, gs), (ed, es) in zip(got, order):
        assert abs(gs - es) <= 1e-5


def test_lsa_plans_are_broadcast_not_cartesian(docs, model):
    plan = lsa.assign_topics_lsa(
        docs, model)._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastHashJoin" in plan
    plan2 = lsa.topic_assign_cosine(
        docs)._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan2


def test_incremental_gram_store_equals_one_shot(spark, docs, model, tmp_path):
    """Batch-by-batch Gram appends refit to the SAME model as the
    one-shot fit (frozen vocabulary => Gram additivity is exact up to
    float association), replays are no-ops, and compaction preserves
    the fit."""
    store = str(tmp_path / "lsa_store")
    assert lsa.init_gram_store(docs, store, vocab_size=64)
    assert not lsa.init_gram_store(docs, store, vocab_size=64)  # no-op
    b1 = docs.where("doc_id % 2 = 0")
    b2 = docs.where("doc_id % 2 = 1")
    assert lsa.append_gram(spark, store, b1, "b1")
    assert lsa.append_gram(spark, store, b2, "b2")
    assert not lsa.append_gram(spark, store, b2, "b2")  # replay no-op
    inc = lsa.fit_from_gram_store(spark, store, k=8)
    assert inc.terms == model.terms
    assert np.allclose(inc.s, model.s, rtol=1e-9)
    assert np.allclose(inc.u @ inc.u.T, model.u @ model.u.T, atol=1e-6)
    lsa.compact_gram_store(spark, store)
    post = lsa.fit_from_gram_store(spark, store, k=8)
    assert np.allclose(post.s, inc.s, rtol=1e-9)
    assert np.allclose(post.u, inc.u, atol=1e-8)
    # replay AFTER compaction still refused (applied manifest)
    assert not lsa.append_gram(spark, store, b2, "b2")


def test_gram_vocab_guard(docs):
    with pytest.raises(ValueError, match="randomized SVD"):
        lsa.fit_lsa(docs, k=8, vocab_size=lsa.MAX_GRAM_VOCAB + 1)
