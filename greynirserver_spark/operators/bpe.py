"""Distributed BPE vocabulary training — the tokenizer-fitting pass of
a training-data pipeline.

``token_count_bpe`` (operators/textops.py) *counts* with a BPE-ish
regex; this module *learns* the vocabulary: Sennrich-style byte-pair
encoding fitted to the corpus, expressed so the corpus is touched
exactly once.

Scale shape (10^12 docs):
* ONE pass over the corpus builds the word-frequency table
  (``word_counts`` — tokenize + partial-agg groupBy); every later
  step runs over that table, whose size is the corpus *vocabulary*
  (10^6-10^7 rows at web scale), not the corpus;
* each merge iteration is pure JVM: adjacent-pair explode + groupBy
  (map-side combine) to count, ONE 1-row collect to pick the argmax
  pair (count desc, then lexicographic — deterministic), and a
  whole-stage-codegen ``aggregate`` fold that rewrites the symbol
  arrays left-to-right non-overlapping, exactly Sennrich's merge;
* ``localCheckpoint`` truncates the iterative plan each round so the
  lineage never grows with merge count;
* encoding reuses the fitted table: word -> pieces is a broadcast
  join (the vocabulary is the dictionary; no per-token Python).

Reference anchor: the reference tokenizes with the Greynir rule
tokenizer (`tokenizer` package; SURVEY §2.3) and never fits a
subword vocabulary; this is the capability a from-scratch LLM corpus
pipeline adds on top (SURVEY training-data family).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from .textops import document_tokens

__all__ = [
    "word_counts", "bpe_pair_counts", "train_bpe", "encode_stats",
    "python_bpe_merges",
]

END = "</w>"  # Sennrich end-of-word sentinel


def word_counts(docs: DataFrame) -> DataFrame:
    """(word, n): corpus word-frequency table — the single corpus
    pass everything else runs over."""
    return document_tokens(docs).groupBy(
        F.col("term").alias("word")
    ).agg(F.count("*").cast("long").alias("n"))


def bpe_pair_counts(docs: DataFrame) -> DataFrame:
    """(left_sym, right_sym, cnt): iteration-0 adjacent symbol pairs —
    characters plus the ``</w>`` sentinel — weighted by word
    frequency.  This is the first merge-selection table of BPE
    training, exposed standalone because it is exactly
    SQL-expressible (the full training loop is iterative and is
    pinned against a pure-Python reference in tests instead)."""
    wc = word_counts(docs)
    return (
        wc.select(
            "n",
            F.explode(F.sequence(F.lit(1), F.length("word"))).alias("i"),
            F.col("word"),
        )
        .select(
            F.expr("substring(word, i, 1)").alias("left_sym"),
            F.when(
                F.col("i") < F.length("word"),
                F.expr("substring(word, i + 1, 1)"),
            ).otherwise(F.lit(END)).alias("right_sym"),
            F.col("n"),
        )
        .groupBy("left_sym", "right_sym")
        .agg(F.sum("n").alias("cnt"))
    )


def _initial_vocab(wc: DataFrame) -> DataFrame:
    """(word, n, syms): symbol arrays = characters + sentinel."""
    return wc.select(
        "word", "n",
        F.concat(
            F.split("word", "(?!$)"), F.array(F.lit(END))
        ).alias("syms"),
    )


def _pair_counts(vocab: DataFrame) -> DataFrame:
    zipped = F.arrays_zip(
        F.expr("slice(syms, 1, size(syms) - 1)"),
        F.expr("slice(syms, 2, size(syms) - 1)"),
    )
    return (
        vocab.select("n", F.explode(zipped).alias("p"))
        .select(
            F.col("p")["0"].alias("l"), F.col("p")["1"].alias("r"), "n"
        )
        .groupBy("l", "r")
        .agg(F.sum("n").alias("cnt"))
    )


def _merge_expr(l: str, r: str):
    """Left-to-right non-overlapping merge of (l, r) in ``syms`` as a
    single JVM fold — no Python touches the arrays."""
    ll, rr = F.lit(l), F.lit(r)
    return F.aggregate(
        "syms",
        F.expr("cast(array() as array<string>)"),
        lambda acc, x: F.when(
            (F.size(acc) > 0)
            & (F.try_element_at(acc, F.lit(-1)) == ll) & (x == rr),
            F.concat(
                F.slice(acc, 1, F.size(acc) - 1),
                F.array(F.concat(ll, rr)),
            ),
        ).otherwise(F.concat(acc, F.array(x))),
    )


def train_bpe(
    docs: DataFrame, num_merges: int = 20, min_pair_count: int = 2,
    checkpoint_every: int = 4,
) -> tuple[list[tuple[str, str]], DataFrame]:
    """Fit *num_merges* BPE merges; stop early when the best pair
    falls under *min_pair_count*.  Returns ``(merges, vocab)`` where
    *vocab* is ``(word, n, syms)`` with the final piece segmentation —
    the dictionary the encoder broadcasts.

    Merge folds are CHAINED for *checkpoint_every* iterations before a
    ``localCheckpoint`` truncates the plan: at a 10^7-word web
    vocabulary, materializing the whole table once per merge is the
    dominant cost, while re-evaluating ≤K chained codegen folds during
    the next pair count is nearly free — K bounds both the plan depth
    and the recompute factor."""
    vocab = _initial_vocab(word_counts(docs)).localCheckpoint(eager=True)
    merges: list[tuple[str, str]] = []
    chained = 0
    for _ in range(num_merges):
        best = (
            _pair_counts(vocab)
            .orderBy(F.desc("cnt"), "l", "r")
            .limit(1)
            .collect()
        )
        if not best or best[0]["cnt"] < min_pair_count:
            break
        l, r = best[0]["l"], best[0]["r"]
        merges.append((l, r))
        vocab = vocab.withColumn("syms", _merge_expr(l, r))
        chained += 1
        if chained >= checkpoint_every:
            vocab = vocab.localCheckpoint(eager=True)
            chained = 0
    if chained:
        vocab = vocab.localCheckpoint(eager=True)
    return merges, vocab


def encode_stats(docs: DataFrame, vocab: DataFrame) -> DataFrame:
    """(doc_id, n_words, n_pieces, fertility): encode the corpus with
    a fitted vocabulary — word -> piece count via broadcast dictionary
    join (every corpus word is in the fitted table by construction
    when fitted on the same corpus; an unseen word at serving time
    falls back to character count + 1, its unmerged length)."""
    dim = F.broadcast(
        vocab.select(
            "word", F.size("syms").cast("long").alias("n_pieces_word")
        )
    )
    toks = document_tokens(docs).withColumnRenamed("term", "word")
    return (
        toks.join(dim, "word", "left")
        .withColumn(
            "n_pieces_word",
            F.coalesce("n_pieces_word", F.length("word") + 1),
        )
        .groupBy("doc_id")
        .agg(
            F.count("*").cast("long").alias("n_words"),
            F.sum("n_pieces_word").cast("long").alias("n_pieces"),
        )
        .withColumn(
            "fertility",
            F.round(F.col("n_pieces") / F.col("n_words"), 4),
        )
    )


def python_bpe_merges(
    word_n: dict[str, int], num_merges: int, min_pair_count: int = 2
) -> tuple[list[tuple[str, str]], dict[str, list[str]]]:
    """Pure-Python Sennrich reference (same tie-break: count desc,
    then lexicographic) — the test oracle for ``train_bpe``."""
    vocab = {w: list(w) + [END] for w in word_n}
    merges: list[tuple[str, str]] = []
    for _ in range(num_merges):
        counts: dict[tuple[str, str], int] = {}
        for w, syms in vocab.items():
            n = word_n[w]
            for a, b in zip(syms, syms[1:]):
                counts[(a, b)] = counts.get((a, b), 0) + n
        if not counts:
            break
        best = min(counts.items(), key=lambda kv: (-kv[1], kv[0]))
        if best[1] < min_pair_count:
            break
        (l, r) = best[0]
        merges.append((l, r))
        for w, syms in vocab.items():
            out, i = [], 0
            while i < len(syms):
                if i + 1 < len(syms) and syms[i] == l and syms[i + 1] == r:
                    out.append(l + r)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            vocab[w] = out
    return merges, vocab
