"""Seed-trained Naive-Bayes document classifier — the CCNet/GPT-3-class
quality/topicality gate.

The large-corpus cleaning recipe the reference never needed but a
100-TB training pipeline always does: label a *seed* subset by a cheap
predicate (a heuristic gate, a trusted-domain list, a topical term),
fit a multinomial Naive-Bayes model over the seed's token counts, and
score EVERY document with the resulting log-likelihood ratio.  GPT-3
and CCNet both gate web text this way (LR/fasttext against a trusted
seed); the mechanism here is the same, expressed as two partial-agg
shuffles and one broadcast join.

Scale shape (10^12 docs):
* training is two ``groupBy`` passes over the labeled subset only —
  ``(doc_id)`` for labels, ``(term)`` for class counts — both with
  map-side combine; nothing is ever collected except three 1-row
  aggregate summaries (class totals, vocabulary size, doc priors);
* the fitted model is one row per seed-vocabulary term; it broadcasts
  while it fits (*broadcast_max*, the same size gate as the segment
  term dictionary in ``operators/segments.py``) and degrades to a
  shuffle hash join above it;
* scoring is tokenize -> left-join model -> ``groupBy(doc_id)`` —
  one shuffle, whole-stage-codegen arithmetic, no Python in the path.

Reference anchor: the reference filters articles by a per-domain
whitelist and heuristic checks at scrape time (`scraper.py`,
`fetcher.py:314`); this operator is that gate generalized to a learned
model, as SURVEY.md's training-data family requires.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, functions as F

from .textops import document_tokens

__all__ = ["nb_train", "nb_score", "nb_seed_classifier"]


def nb_train(
    labeled_docs: DataFrame, alpha: float = 1.0
) -> tuple[DataFrame, dict]:
    """Fit multinomial NB over ``(doc_id, text, label)`` rows.

    Returns ``(model, meta)``: *model* is one row per term —
    ``(term, llr_micro)`` with
    ``llr = ln((n1+a)/(T1+aV)) - ln((n0+a)/(T0+aV))`` over
    token-occurrence counts, MICRO-SCALED to an integer
    (``round(llr * 1e6)``) so per-document score sums are exact
    integer arithmetic — bit-identical under any summation order or
    partitioning, which a float sum of logs is not; *meta* carries the
    smoothed class prior ``ln((N1+a)/(N0+a))`` and the unknown-term
    constant (the llr of a term with zero seed occurrences), scaled
    the same way.
    """
    toks = document_tokens(labeled_docs).join(
        labeled_docs.select("doc_id", "label"), "doc_id"
    )
    counts = toks.groupBy("term").agg(
        F.sum("label").cast("long").alias("n1"),
        (F.count("*") - F.sum("label")).cast("long").alias("n0"),
    )
    tot = counts.agg(
        F.sum("n1").alias("t1"), F.sum("n0").alias("t0"),
        F.count("*").alias("v"),
    ).first()
    t1, t0, v = float(tot["t1"] or 0), float(tot["t0"] or 0), int(tot["v"])
    pri = labeled_docs.agg(
        F.sum("label").alias("n_pos"), F.count("*").alias("n_docs")
    ).first()
    n_pos = float(pri["n_pos"] or 0)
    n_neg = float(pri["n_docs"]) - n_pos
    d1, d0 = t1 + alpha * v, t0 + alpha * v

    def _micro(x: float) -> int:
        # half-away-from-zero, matching Spark's F.round / DuckDB round
        return int(x * 1e6 + (0.5 if x >= 0 else -0.5))

    meta = {
        "prior_micro": _micro(math.log((n_pos + alpha) / (n_neg + alpha))),
        "unk_micro": _micro(math.log(alpha / d1) - math.log(alpha / d0)),
        "alpha": alpha, "t1": t1, "t0": t0, "v": v,
    }
    model = counts.select(
        "term",
        F.round(
            (
                F.log((F.col("n1") + F.lit(alpha)) / F.lit(d1))
                - F.log((F.col("n0") + F.lit(alpha)) / F.lit(d0))
            ) * 1e6,
            0,
        ).cast("long").alias("llr_micro"),
    )
    return model, meta


def nb_score(
    docs: DataFrame, model: DataFrame, meta: dict,
    broadcast_max: int = 2_000_000,
) -> DataFrame:
    """(doc_id, n_tokens, nb_llr, nb_label): per-document summed
    log-likelihood ratio (prior included) and the implied 0/1 class.
    Terms outside the seed vocabulary contribute the constant
    unknown-term llr rather than being dropped, so out-of-domain
    gibberish scores strongly instead of silently averaging away.
    Zero-token documents are absent (consistent with
    ``quality_scores``)."""
    if meta["v"] <= broadcast_max:
        model = F.broadcast(model)
    return (
        document_tokens(docs)
        .join(model, "term", "left")
        .groupBy("doc_id")
        .agg(
            F.count("*").cast("long").alias("n_tokens"),
            F.round(
                (
                    F.lit(meta["prior_micro"])
                    + F.sum(
                        F.coalesce("llr_micro", F.lit(meta["unk_micro"]))
                    )
                ) / 1e6,
                4,
            ).alias("nb_llr"),
        )
        .withColumn(
            "nb_label", (F.col("nb_llr") > 0).cast("long")
        )
    )


def nb_seed_classifier(
    docs: DataFrame, seed_term: str = "spark",
    holdout_mod: int = 5, alpha: float = 1.0,
) -> DataFrame:
    """End-to-end seed gate: label the training split (doc_id %
    *holdout_mod* != 0 — the held-out fold never leaks into the fit)
    by presence of *seed_term*, fit NB, score the WHOLE corpus.  The
    holdout means every fifth document is scored purely by what the
    model generalized from co-occurring terms, which is the honest
    shape of a seed-classifier gate (the seed predicate is cheap; the
    model is what transfers)."""
    train = docs.where(F.col("doc_id") % holdout_mod != 0)
    labels = (
        document_tokens(train)
        .groupBy("doc_id")
        .agg(
            F.max((F.col("term") == seed_term).cast("long")).alias("label")
        )
    )
    labeled = train.join(labels, "doc_id").select("doc_id", "text", "label")
    model, meta = nb_train(labeled, alpha=alpha)
    return nb_score(docs, model, meta)
