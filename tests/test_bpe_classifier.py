"""BPE training, the seed NB classifier, and fetch-plan scheduling."""

import math

import pytest


# ------------------------------------------------------------------ BPE

_BPE_DOCS = [
    (1, "lower lower lowest low low low newer newer new wider wide"),
    (2, "low lower newest newest newer wide wide wider widest"),
    (3, "er er est new newer lowest low low wide"),
]


def _bpe_docs(spark):
    return spark.createDataFrame(_BPE_DOCS, "doc_id long, text string")


def test_train_bpe_matches_python_reference(spark):
    from greynirserver_spark.operators import bpe as B

    docs = _bpe_docs(spark)
    wc = {
        r["word"]: r["n"] for r in B.word_counts(docs).collect()
    }
    want_merges, want_vocab = B.python_bpe_merges(wc, num_merges=10)
    got_merges, vocab_df = B.train_bpe(docs, num_merges=10)
    assert got_merges == want_merges
    got_vocab = {
        r["word"]: list(r["syms"]) for r in vocab_df.collect()
    }
    assert got_vocab == want_vocab
    # merges actually merged something multi-character
    assert any(len(l + r) > 2 for l, r in got_merges)


def test_bpe_merge_is_left_to_right_nonoverlapping(spark):
    from pyspark.sql import functions as F
    from greynirserver_spark.operators.bpe import _merge_expr

    df = spark.createDataFrame(
        [(["a", "a", "a", "a", "a"],)], "syms array<string>"
    )
    out = df.select(_merge_expr("a", "a").alias("m")).first()["m"]
    # Sennrich: "aaaaa" + merge (a,a) -> aa aa a
    assert list(out) == ["aa", "aa", "a"]


def test_bpe_pair_counts_sentinel_and_weights(spark):
    from greynirserver_spark.operators import bpe as B

    docs = spark.createDataFrame(
        [(1, "ab ab b")], "doc_id long, text string"
    )
    rows = {
        (r["left_sym"], r["right_sym"]): r["cnt"]
        for r in B.bpe_pair_counts(docs).collect()
    }
    assert rows == {
        ("a", "b"): 2,        # 'ab' twice
        ("b", B.END): 3,      # 'ab' twice + 'b' once
    }


def test_encode_stats_and_oov_fallback(spark):
    from greynirserver_spark.operators import bpe as B

    docs = _bpe_docs(spark)
    merges, vocab = B.train_bpe(docs, num_merges=10)
    wc = {r["word"]: r["n"] for r in B.word_counts(docs).collect()}
    _, pieces = B.python_bpe_merges(wc, num_merges=10)

    stats = {
        r["doc_id"]: r for r in B.encode_stats(docs, vocab).collect()
    }
    for doc_id, text in _BPE_DOCS:
        words = text.split()
        want = sum(len(pieces[w]) for w in words)
        assert stats[doc_id]["n_words"] == len(words)
        assert stats[doc_id]["n_pieces"] == want
        assert stats[doc_id]["fertility"] == round(want / len(words), 4)

    # a word the vocabulary never saw: char count + sentinel
    oov = spark.createDataFrame(
        [(9, "zzzq")], "doc_id long, text string"
    )
    row = B.encode_stats(oov, vocab).first()
    assert row["n_pieces"] == len("zzzq") + 1


def test_bpe_training_plan_stays_jvm(spark):
    """The pair-count plan must be codegen JVM ops — no Python UDF
    (BatchEvalPython / ArrowEvalPython) anywhere in the loop body."""
    from greynirserver_spark.operators import bpe as B

    docs = _bpe_docs(spark)
    vocab = B._initial_vocab(B.word_counts(docs))
    for df in (B._pair_counts(vocab), B.bpe_pair_counts(docs)):
        plan = df._jdf.queryExecution().executedPlan().toString()
        assert "EvalPython" not in plan
        assert "CartesianProduct" not in plan


# ------------------------------------------------------- NB classifier

def test_nb_seed_classifier_generalizes_to_holdout(spark):
    from greynirserver_spark.operators.classifier import nb_seed_classifier

    rows = []
    # positive class: seed term 'spark' + correlated 'shuffle join';
    # negative class: 'recipe flour sugar'
    for i in range(1, 21):
        rows.append((i * 2 + 1, "spark shuffle join partition shuffle"))
        rows.append((i * 2 + 100, "recipe flour sugar butter flour"))
    # held-out docs (doc_id % 5 == 0): correlated terms WITHOUT the
    # seed term on the positive side
    rows.append((200, "shuffle join partition"))
    rows.append((205, "flour sugar butter"))
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r["doc_id"]: r for r in nb_seed_classifier(docs).collect()}
    assert got[200]["nb_label"] == 1      # learned from co-occurrence
    assert got[205]["nb_label"] == 0
    assert got[200]["nb_llr"] > 0 > got[205]["nb_llr"]


def test_nb_unknown_terms_use_the_constant(spark):
    from greynirserver_spark.operators.classifier import nb_train, nb_score

    labeled = spark.createDataFrame(
        [(1, "aa bb", 1), (2, "cc dd", 0)],
        "doc_id long, text string, label long",
    )
    model, meta = nb_train(labeled)
    gib = spark.createDataFrame(
        [(9, "zz yy xx")], "doc_id long, text string"
    )
    row = nb_score(gib, model, meta).first()
    want = round((meta["prior_micro"] + 3 * meta["unk_micro"]) / 1e6, 4)
    assert row["nb_llr"] == pytest.approx(want)
    # symmetric seed: unknown-term llr is exactly 0 micro
    assert meta["unk_micro"] == 0


def test_nb_model_values(spark):
    """Hand-computed llr for a two-doc seed."""
    from greynirserver_spark.operators.classifier import nb_train

    labeled = spark.createDataFrame(
        [(1, "aa aa bb", 1), (2, "bb cc", 0)],
        "doc_id long, text string, label long",
    )
    model, meta = nb_train(labeled)
    # T1=3, T0=2, V=3 -> d1=6, d0=5
    llr = {r["term"]: r["llr_micro"] for r in model.collect()}
    assert llr["aa"] == round((math.log(3 / 6) - math.log(1 / 5)) * 1e6)
    assert llr["bb"] == round((math.log(2 / 6) - math.log(2 / 5)) * 1e6)
    assert llr["cc"] == round((math.log(1 / 6) - math.log(2 / 5)) * 1e6)
    assert meta["prior_micro"] == 0  # one doc per class


def test_nb_score_plan_is_one_shuffle_no_python(spark):
    from greynirserver_spark.operators.classifier import nb_seed_classifier

    docs = spark.createDataFrame(
        [(i, "spark a b") for i in range(1, 12)],
        "doc_id long, text string",
    )
    df = nb_seed_classifier(docs)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "EvalPython" not in plan
    assert "CartesianProduct" not in plan
    assert "BroadcastHashJoin" in plan  # the model dim broadcasts


# ----------------------------------------------------------- fetch plan

def test_fetch_plan_waves_and_slots(spark):
    from greynirserver_spark.operators.urls import fetch_plan

    rows = [
        (f"https://big.is/a/{i:02d}",) for i in range(9)
    ] + [("https://small.is/x",), ("relative/not-a-url",)]
    df = spark.createDataFrame(rows, "url string")
    got = fetch_plan(df, per_host=4).collect()
    by_host = {}
    for r in got:
        by_host.setdefault(r["host"], []).append(r)
    # invalid URL dropped
    assert sum(len(v) for v in by_host.values()) == 10
    big = sorted(by_host["big.is"], key=lambda r: (r["wave"], r["slot"]))
    assert [r["wave"] for r in big] == [0, 0, 0, 0, 1, 1, 1, 1, 2]
    assert [r["slot"] for r in big] == [0, 1, 2, 3, 0, 1, 2, 3, 0]
    assert by_host["small.is"][0]["wave"] == 0
    # per-host budget invariant: no (host, wave) exceeds per_host
    from collections import Counter
    c = Counter((r["host"], r["wave"]) for r in got)
    assert max(c.values()) <= 4


def test_fetch_plan_deterministic_under_same_canonical(spark):
    """Two spellings of one canonical URL must split deterministically
    (raw-url tiebreak), not by partition order."""
    from greynirserver_spark.operators.urls import fetch_plan

    rows = [
        ("https://h.is/p?b=2&a=1",),
        ("https://WWW.h.is/p/?a=1&b=2#f",),
    ]
    a = fetch_plan(
        spark.createDataFrame(rows, "url string").repartition(4), per_host=1
    ).collect()
    b = fetch_plan(
        spark.createDataFrame(rows[::-1], "url string").coalesce(1),
        per_host=1,
    ).collect()
    wa = {r["url"]: r["wave"] for r in a}
    wb = {r["url"]: r["wave"] for r in b}
    assert wa == wb and set(wa.values()) == {0, 1}
