"""Deduplication operators for web-scale training-data pipelines.

Four families (all over ``documents(doc_id, text, ...)``):

* :func:`exact_duplicates` — content hash groupBy (md5; oracle-checkable).
* :func:`ngram_jaccard_pairs` — word n-gram shingles + candidate join +
  exact Jaccard verify. Fully relational (SQL-mirrorable); the candidate
  generation joins only docs sharing a shingle, never the full cross
  product.
* :func:`minhash_lsh_pairs` — MinHash signatures (Arrow-vectorized NumPy)
  banded into LSH buckets; candidates = bucket co-membership; verified
  with exact Jaccard. The 10^12-doc scale path: cost is
  O(docs x bands) rows shuffled, not O(docs^2).
* :func:`simhash_fingerprints` / :func:`simhash_near_pairs` — 64-bit
  SimHash; near-dup candidates via 16-bit chunk co-membership (any pair
  within Hamming distance <= 3 shares at least one of 4 chunks by
  pigeonhole), then exact Hamming verify.

Hash material is md5-derived (stable across engines and runs); the
MinHash family uses seeded multiplicative hashing over uint64.
"""

from __future__ import annotations

from typing import Iterator, Optional, Tuple

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame, functions as F

from .textops import document_tokens

__all__ = [
    "exact_duplicates",
    "ngram_shingles",
    "ngram_jaccard_pairs",
    "distinct_tokens",
    "token_hash_sets",
    "minhash_signatures",
    "minhash_lsh_pairs",
    "bands_for_threshold",
    "simhash_fingerprints",
    "simhash_near_pairs",
    "near_dup_clusters",
    "incremental_minhash_pairs",
]


# 60-bit stable term hash: first 15 hex chars of md5 (engine-portable)
def _term_hash60(col):
    return F.conv(F.substring(F.md5(col), 1, 15), 16, 10).cast("long")


def exact_duplicates(docs: DataFrame) -> DataFrame:
    """(text_md5, n_docs, min_doc_id) for every content-identical group.
    The canonical keep-one rule is "keep min doc_id"."""
    return (
        docs.groupBy(F.md5("text").alias("text_md5"))
        .agg(
            F.count("*").cast("long").alias("n_docs"),
            F.min("doc_id").alias("min_doc_id"),
        )
    )


def ngram_shingles(docs: DataFrame, n: int = 3) -> DataFrame:
    """(doc_id, shingle): distinct word n-grams, built JVM-side from the
    token array with transform/sequence (no Python)."""
    from ..tokenization import MAX_WORD_LEN, TOKEN_SPLIT_RE

    # Token array built directly from split+filter (never explode ->
    # collect_list, whose order would depend on aggregation internals)
    toks = docs.select(
        "doc_id",
        F.filter(
            F.split(F.lower("text"), TOKEN_SPLIT_RE),
            lambda x: (F.length(x) >= 1) & (F.length(x) <= MAX_WORD_LEN),
        ).alias("toks"),
    )
    # n-grams: concat_ws over a sliding window expressed with transform
    return (
        toks.where(F.size("toks") >= n)
        .select(
            "doc_id",
            F.explode(
                F.array_distinct(
                    F.transform(
                        F.sequence(
                            F.lit(0), F.size("toks") - F.lit(n)
                        ),
                        lambda i: F.concat_ws(
                            " ", F.slice("toks", i + 1, n)
                        ),
                    )
                )
            ).alias("shingle"),
        )
    )


def ngram_jaccard_pairs(
    docs: DataFrame, n: int = 3, threshold: float = 0.5,
    max_shingle_df: int = 1000,
) -> DataFrame:
    """(doc_a, doc_b, jaccard) for pairs with n-gram Jaccard >= threshold.

    Candidates come from an equi-join on shingle (docs sharing none are
    never compared) — but only over shingles with document frequency
    <= *max_shingle_df*. Without the cap, one boilerplate shingle shared
    by 10^6 docs emits ~10^12 candidate rows; with it, candidate volume
    is bounded by sum(df^2) over capped shingles. Hot shingles still
    count toward the EXACT intersection (computed by expanding candidate
    pairs against the full shingle table), so the jaccard value is
    unaffected — the cap can only miss pairs whose every shared shingle
    is hot, which at df > max_shingle_df are boilerplate, not near-dups.
    Output jaccard is round(.,4) for oracle comparison.
    """
    from pyspark import StorageLevel

    sh = ngram_shingles(docs, n).persist(StorageLevel.DISK_ONLY)
    sizes = sh.groupBy("doc_id").agg(F.count("*").cast("long").alias("sz"))
    # hot set materialized ONCE: it feeds two consumers (the rare
    # anti-join and the hot re-expansion) whose subtrees would each
    # re-run the full shingle-df aggregation, and its row count decides
    # the plan below. Bounded by total_rows / max_shingle_df.
    hot = (
        sh.groupBy("shingle")
        .agg(F.count("*").alias("df"))
        .where(F.col("df") > max_shingle_df)
        .select("shingle")
        .persist(StorageLevel.DISK_ONLY)
    )
    n_hot = hot.count()
    rare = sh if n_hot == 0 else sh.join(hot, "shingle", "left_anti")
    # candidate-pair aggregation key packed into ONE long when ids fit
    # 31 bits (guide §2.3 "narrower types"): the (doc_a, doc_b) group
    # key over ~sum(df^2) candidate rows becomes a single fixed-width
    # column — fewer shuffle bytes, single-key hash fast path. The
    # probe is one column-stats scan; ids outside the range keep the
    # two-column key (identical output either way).
    bounds = docs.agg(
        F.min("doc_id").alias("lo"), F.max("doc_id").alias("hi")
    ).first()
    packable = (
        bounds["lo"] is not None
        and bounds["lo"] >= 0
        and bounds["hi"] < (1 << 31)
    )
    # rare-shingle intersection counts come straight out of the
    # candidate self-join (one aggregation, no candidate re-expansion);
    # shared HOT shingles are added back from a join against the hot
    # rows only, so the exact intersection is (rare + hot) while the
    # quadratic join never touches a hot shingle
    cand = (
        rare.alias("a")
        .join(rare.alias("b"), "shingle")
        .where(F.col("a.doc_id") < F.col("b.doc_id"))
    )
    if packable:
        inter_rare = (
            cand.select(
                (
                    F.shiftleft(F.col("a.doc_id"), 32) + F.col("b.doc_id")
                ).alias("pk")
            )
            .groupBy("pk")
            .agg(F.count("*").cast("long").alias("inter_r"))
            .select(
                F.shiftright(F.col("pk"), 32).alias("doc_a"),
                F.col("pk").bitwiseAND(F.lit((1 << 32) - 1)).alias("doc_b"),
                "inter_r",
            )
        )
    else:
        inter_rare = cand.groupBy(
            F.col("a.doc_id").alias("doc_a"),
            F.col("b.doc_id").alias("doc_b"),
        ).agg(F.count("*").cast("long").alias("inter_r"))
    if n_hot == 0:
        # no shingle exceeded the cap: every shared shingle is already
        # counted in inter_r — skip the hot re-expansion AND the
        # pair-table left join it would force (the common case on
        # non-boilerplate corpora; the branch is decided by the
        # materialized hot count, so it adapts per corpus)
        inter = inter_rare.withColumnRenamed("inter_r", "inter")
    else:
        # the pair table feeds two consumers (hot re-expansion + the
        # final merge): materialize it once instead of re-running the
        # candidate self-join + aggregation per consumer
        inter_rare = inter_rare.persist(StorageLevel.DISK_ONLY)
        hot_sh = sh.join(hot, "shingle")
        inter_hot = (
            inter_rare.select("doc_a", "doc_b")
            .join(hot_sh.withColumnRenamed("doc_id", "doc_a"), "doc_a")
            .join(
                hot_sh.withColumnRenamed("doc_id", "doc_b"),
                ["doc_b", "shingle"],
            )
            .groupBy("doc_a", "doc_b")
            .agg(F.count("*").cast("long").alias("inter_h"))
        )
        inter = (
            inter_rare.join(inter_hot, ["doc_a", "doc_b"], "left")
            .select(
                "doc_a",
                "doc_b",
                (F.col("inter_r") + F.coalesce(F.col("inter_h"), F.lit(0)))
                .cast("long")
                .alias("inter"),
            )
        )
    return (
        inter.join(sizes.withColumnRenamed("doc_id", "doc_a"), "doc_a")
        .withColumnRenamed("sz", "sz_a")
        .join(sizes.withColumnRenamed("doc_id", "doc_b"), "doc_b")
        .withColumnRenamed("sz", "sz_b")
        .withColumn(
            "jaccard",
            F.round(
                F.col("inter").cast("double")
                / (F.col("sz_a") + F.col("sz_b") - F.col("inter")),
                4,
            ),
        )
        .where(F.col("jaccard") >= threshold)
        .select("doc_a", "doc_b", "jaccard")
    )


_MINHASH_H = 64           # signature length
_MINHASH_BANDS = 16       # bands -> rows per band = H / BANDS
_MINHASH_SEED = 42


def _minhash_params() -> Tuple[np.ndarray, np.ndarray]:
    rng = np.random.Generator(np.random.SFC64(_MINHASH_SEED))
    a = rng.integers(1, 1 << 63, size=_MINHASH_H, dtype=np.uint64) | np.uint64(1)
    b = rng.integers(0, 1 << 63, size=_MINHASH_H, dtype=np.uint64)
    return a, b


def distinct_tokens(docs: DataFrame) -> DataFrame:
    """(doc_id, term): each document's distinct token set."""
    return document_tokens(docs).select("doc_id", "term").distinct()


def token_hash_sets(docs: DataFrame) -> DataFrame:
    """(doc_id, ths array<long>): each document's distinct 60-bit token
    hashes as one sorted array row — the shared input of MinHash
    signatures AND exact Jaccard verification. One tokenize pass, one
    shuffle, and the verify step becomes a JVM ``array_intersect`` over
    candidate pairs instead of a token-level explode join (the round-1
    pipeline's dominant cost). 60-bit md5 hashes make set arithmetic
    engine-portable; both engines compare hash sets, so hash collisions
    (P ~ n^2/2^61) cannot cause a cross-engine mismatch."""
    return (
        document_tokens(docs)
        .select("doc_id", _term_hash60(F.col("term")).alias("th"))
        .groupBy("doc_id")
        .agg(F.array_sort(F.collect_set("th")).alias("ths"))
    )


def minhash_signatures(
    docs: DataFrame, ths: Optional[DataFrame] = None
) -> DataFrame:
    """(doc_id, sig array<long>): 64-perm MinHash over the token set.

    Token hashes are computed JVM-side (md5-derived); the per-doc min
    over 64 multiplicative-hash permutations runs as NumPy inside one
    Arrow batch — O(tokens x 64) vectorized multiply-min, no Python loop
    over tokens. Pass *ths* (output of :func:`token_hash_sets`, ideally
    persisted) to reuse an already-materialized hash-set table.
    """
    tok_hashes = ths if ths is not None else token_hash_sets(docs)
    a, b = _minhash_params()

    def sig_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out_ids = pdf["doc_id"].to_numpy()
            if not len(pdf):
                yield pd.DataFrame({"doc_id": out_ids, "sig": []})
                continue
            # one flat (Σ tokens, 64) hash matrix + segmented min via
            # minimum.reduceat: the same arithmetic as the per-row loop
            # (identical uint64 wraparound), without 2 array allocations
            # and a Python-level iteration per document
            lens = np.fromiter(
                (len(t) for t in pdf["ths"]), dtype=np.int64, count=len(pdf)
            )
            # empty sets never reach here (token_hash_sets emits a row
            # only for docs with >= 1 token); reduceat would silently
            # mis-aggregate them, where the old loop raised — keep the
            # fail-fast contract
            assert lens.min() > 0, "minhash over an empty token set"
            flat = np.concatenate(
                [np.asarray(t, dtype=np.uint64) for t in pdf["ths"]]
            )
            h = flat[:, None] * a[None, :] + b[None, :]   # mod 2^64 wrap
            starts = np.zeros(len(pdf), dtype=np.int64)
            np.cumsum(lens[:-1], out=starts[1:])
            sigs = (
                np.minimum.reduceat(h, starts, axis=0) >> np.uint64(1)
            ).astype(np.int64)
            yield pd.DataFrame(
                {"doc_id": out_ids, "sig": [row.tolist() for row in sigs]}
            )

    return tok_hashes.mapInPandas(sig_batches, "doc_id long, sig array<long>")


def bands_for_threshold(threshold: float, n_hashes: int = _MINHASH_H) -> int:
    """Pick the band count whose S-curve midpoint (1/b)^(r/H... i.e.
    t = (1/b)^(1/r) with r = H/b) sits just below *threshold*, so pairs
    at the threshold are found with high probability without flooding
    the candidate join."""
    best, best_t = 16, 0.0
    for b in (4, 8, 16, 32):
        r = n_hashes // b
        t = (1.0 / b) ** (1.0 / r)
        if t <= threshold * 0.85 and t > best_t:
            best, best_t = b, t
    return best


def minhash_lsh_pairs(
    docs: DataFrame, threshold: float = 0.5, verify: bool = True,
    bands: int = 0,
) -> DataFrame:
    """Near-duplicate pairs via banded MinHash LSH.

    (doc_a, doc_b, jaccard) where jaccard is the *exact* token-set Jaccard
    of candidate pairs (verify=True), filtered at *threshold*. Candidate
    generation: hash each band of the signature to a bucket, self-join on
    (band, bucket). The band count sets the S-curve: 16 bands x 4 rows
    crosses ~0.5, 8 bands x 8 rows ~0.75 — choose bands to match the
    threshold so the candidate join stays linear in docs.

    The whole quadratic section runs at DISTINCT-TOKEN-SET level, not
    doc level: docs with identical token sets have identical signatures,
    identical band buckets, and identical pairwise jaccards, so every
    gate (band collision, signature estimate, exact jaccard) is decided
    ONCE per set pair and the result expanded to doc pairs with a cheap
    explode at the very end. On duplicate-heavy corpora this collapses
    the band join's hot buckets (an m-doc identical-set group alone is
    m^2/2 join rows per band otherwise) — the classic decide-on-proxy /
    move-heavy-rows-once shape, and exactly output-equivalent:
    within-group pairs always collide (identical buckets), always pass
    the estimate (est = 1), and score jaccard = 1.0; cross-group pairs
    inherit the set pair's gates verbatim.
    """
    from pyspark import StorageLevel

    bands = bands or bands_for_threshold(threshold)
    # ONE tokenize pass; identical sets collapsed to a representative
    # (min doc_id) with the member list carried for final expansion
    groups = (
        token_hash_sets(docs)
        .groupBy("ths")
        .agg(
            F.min("doc_id").alias("set_id"),
            F.sort_array(F.collect_list("doc_id")).alias("members"),
        )
        .persist(StorageLevel.DISK_ONLY)
    )
    # set-level signatures: the signature depends only on the token set
    sigs = minhash_signatures(
        docs, ths=groups.select(F.col("set_id").alias("doc_id"), "ths")
    ).cache()
    # one eager pass materializes groups + sigs so the joins below see
    # real cached-relation sizes (the set-level side tables are small —
    # broadcast — while a Python-node output defaults to "unknown/huge"
    # and would force a sort-merge shuffle of every candidate pair).
    # The same pass carries the set-id bounds for the pair-key packing
    # decision below, so no separate probe job runs.
    id_bounds = sigs.agg(
        F.count("*").alias("n"),
        F.min("doc_id").alias("lo"),
        F.max("doc_id").alias("hi"),
    ).first()
    rows_per_band = _MINHASH_H // bands
    # band bucket = md5 of the comma-joined band slice: engine-portable
    # (Spark's hash() is murmur3 with Spark-specific seeding — not
    # reproducible in SQL), deterministic, and collision-free in
    # practice (128-bit)
    band_rows = sigs.select(
        "doc_id",
        F.explode(
            F.transform(
                F.sequence(F.lit(0), F.lit(bands - 1)),
                lambda band: F.struct(
                    band.alias("band"),
                    F.md5(
                        F.array_join(
                            F.transform(
                                F.slice(
                                    "sig",
                                    band * rows_per_band + 1,
                                    rows_per_band,
                                ),
                                lambda v: v.cast("string"),
                            ),
                            ",",
                        )
                    ).alias("bucket"),
                ),
            )
        ).alias("bb"),
    ).select("doc_id", "bb.band", "bb.bucket")

    raw_cands = (
        band_rows.alias("a")
        .join(band_rows.alias("b"), ["band", "bucket"])
        .where(F.col("a.doc_id") < F.col("b.doc_id"))
    )
    # the candidate dedup shuffles every raw band collision — pack the
    # (set_a, set_b) key into ONE long when ids fit 31 bits (guide §2.3
    # "narrower types"): half the key bytes and the single-column
    # fixed-width hash fast path. Bounds rode along on the sigs
    # materialization pass above; out-of-range ids keep the two-column
    # key (identical output either way).
    packable = (
        id_bounds["lo"] is not None
        and id_bounds["lo"] >= 0
        and id_bounds["hi"] < (1 << 31)
    )
    if packable:
        cands = (
            raw_cands.select(
                (
                    F.shiftleft(F.col("a.doc_id"), 32) + F.col("b.doc_id")
                ).alias("pk")
            )
            .distinct()
            .select(
                F.shiftright(F.col("pk"), 32).alias("set_a"),
                F.col("pk").bitwiseAND(F.lit((1 << 32) - 1)).alias("set_b"),
            )
        )
    else:
        cands = raw_cands.select(
            F.col("a.doc_id").alias("set_a"),
            F.col("b.doc_id").alias("set_b"),
        ).distinct()
    est = F.size(
        F.filter(
            F.zip_with(F.col("sig_a"), F.col("sig_b"), lambda x, y: x == y),
            lambda m: m,
        )
    ) / F.lit(float(_MINHASH_H))

    def with_sigs(pairs):
        return (
            pairs.join(
                sigs.select(F.col("doc_id").alias("set_a"),
                            F.col("sig").alias("sig_a")), "set_a")
            .join(
                sigs.select(F.col("doc_id").alias("set_b"),
                            F.col("sig").alias("sig_b")), "set_b")
        )

    def expand(set_pairs, cols):
        """Set pairs -> doc pairs: cross product of the two member
        lists (all such doc pairs share the set pair's gate results),
        plus every within-group pair (jaccard exactly 1.0, est 1,
        guaranteed band collision)."""
        ga = groups.select(F.col("set_id").alias("set_a"),
                           F.col("members").alias("ma"))
        gb = groups.select(F.col("set_id").alias("set_b"),
                           F.col("members").alias("mb"))
        cross = (
            set_pairs.join(ga, "set_a").join(gb, "set_b")
            .select(F.explode("ma").alias("da"), "mb", *cols)
            .select("da", F.explode("mb").alias("db"), *cols)
            .select(
                F.least("da", "db").alias("doc_a"),
                F.greatest("da", "db").alias("doc_b"),
                *cols,
            )
        )
        within = (
            groups.where(F.size("members") >= 2)
            .select(F.explode("members").alias("da"), "members")
            .select("da", F.explode("members").alias("db"))
            .where(F.col("da") < F.col("db"))
            .select(F.col("da").alias("doc_a"), F.col("db").alias("doc_b"))
        )
        if "jaccard" in cols:
            within = within.withColumn(
                "jaccard", F.round(F.lit(1.0), 4)
            )
        # identical sets pass every gate iff 1.0 itself passes the
        # jaccard threshold (est = 1 >= threshold - 0.15 follows)
        if not (1.0 >= threshold):
            return cross
        return cross.unionByName(within.select("doc_a", "doc_b", *cols))

    if not verify:
        est_pairs = (
            with_sigs(cands)
            .where(est >= F.lit(max(0.0, threshold - 0.15)))
            .select("set_a", "set_b")
        )
        return expand(est_pairs, [])

    # Exact verify FIRST (pure JVM set arithmetic), then the
    # signature-estimate gate on the far smaller jaccard-passing set:
    # both gates are conjunctive, and the exact-intersect is cheaper
    # per pair than the 64-component signature compare, so the
    # expensive gate sees fewer rows.
    #
    # Dense fast path: when the distinct-token universe of the
    # collapsed sets fits 64 values, each set is EXACTLY a 64-bit
    # bitmask and the intersection is a codegen'd
    # bit_count(mask_a & mask_b) — per-pair cost drops from a per-row
    # hash-set build (array_intersect allocates and boxes per
    # candidate) to three primitive ops. The probe is a
    # limit-65-distinct job that short-circuits on large-vocab
    # corpora, which then keep the sparse array path — same output
    # both ways (the mask is a lossless encoding of the set).
    u65 = (
        groups.select(F.explode("ths").alias("th"))
        .distinct()
        .limit(65)
        .collect()
    )
    if len(u65) <= 64:
        ddf = docs.sparkSession.createDataFrame(
            # bit 63 in two's complement (a Python 1 << 63 overflows
            # the signed long); SUM of distinct signed bit values still
            # reproduces the exact 64-bit pattern
            [(int(r["th"]), (1 << i) if i < 63 else -(1 << 63))
             for i, r in enumerate(sorted(u65, key=lambda r: r["th"]))],
            "th long, bit long",
        )
        gm = (
            groups.select(
                "set_id",
                F.size("ths").cast("long").alias("sz"),
                F.explode("ths").alias("th"),
            )
            .join(F.broadcast(ddf), "th")
            # th values are distinct within a set, so each bit occurs
            # at most once and SUM == bitwise OR
            .groupBy("set_id", "sz")
            .agg(F.sum("bit").alias("mask"))
        )
        # gate FIRST, dedup the survivors: the popcount gate is three
        # primitive ops behind broadcast joins (no shuffle), so running
        # it on every RAW band collision and deduplicating only the
        # jaccard-passing pairs replaces the full-candidate distinct
        # shuffle with one over the far smaller survivor set. Gates are
        # deterministic per pair, so duplicates pass identically and
        # the post-filter distinct yields the exact same pair set.
        jpairs = (
            raw_cands.select(
                F.col("a.doc_id").alias("set_a"),
                F.col("b.doc_id").alias("set_b"),
            )
            .join(
                F.broadcast(gm.select(F.col("set_id").alias("set_a"),
                                      F.col("mask").alias("mask_a"),
                                      F.col("sz").alias("sz_a"))), "set_a")
            .join(
                F.broadcast(gm.select(F.col("set_id").alias("set_b"),
                                      F.col("mask").alias("mask_b"),
                                      F.col("sz").alias("sz_b"))), "set_b")
            .withColumn(
                "inter",
                F.bit_count(
                    F.col("mask_a").bitwiseAND(F.col("mask_b"))
                ).cast("long"),
            )
            .withColumn(
                "jaccard",
                F.round(
                    F.col("inter").cast("double")
                    / (F.col("sz_a") + F.col("sz_b") - F.col("inter")),
                    4,
                ),
            )
            .where(F.col("jaccard") >= threshold)
            .select("set_a", "set_b", "jaccard")
            .distinct()
        )
    else:
        sz_a = F.size("ths_a").cast("long")
        sz_b = F.size("ths_b").cast("long")
        # `inter` lands in its own projection so the hash-set
        # intersection runs ONCE per candidate pair — inlining it into
        # the jaccard formula evaluates it twice (numerator + union)
        jpairs = (
            cands.join(
                groups.select(F.col("set_id").alias("set_a"),
                              F.col("ths").alias("ths_a")), "set_a")
            .join(
                groups.select(F.col("set_id").alias("set_b"),
                              F.col("ths").alias("ths_b")), "set_b")
            .withColumn(
                "inter",
                F.size(F.array_intersect("ths_a", "ths_b")).cast("long")
            )
            .withColumn(
                "jaccard",
                F.round(
                    F.col("inter").cast("double")
                    / (sz_a + sz_b - F.col("inter")),
                    4,
                ),
            )
            .where(F.col("jaccard") >= threshold)
            .select("set_a", "set_b", "jaccard")
        )
    verified = (
        with_sigs(jpairs)
        .where(est >= F.lit(max(0.0, threshold - 0.15)))
        .select("set_a", "set_b", "jaccard")
    )
    return expand(verified, ["jaccard"])


def simhash_fingerprints(docs: DataFrame) -> DataFrame:
    """(doc_id, simhash): 64-bit SimHash over tf-weighted token hashes.

    Bit-vector accumulation is NumPy over Arrow batches: unpack each
    token's 64 hash bits, weight by tf, sign of the column sums is the
    fingerprint.
    """
    tok = (
        document_tokens(docs)
        .groupBy("doc_id", "term")
        .agg(F.count("*").cast("long").alias("tf"))
        .select("doc_id", _term_hash60(F.col("term")).alias("th"), "tf")
        .groupBy("doc_id")
        .agg(F.collect_list("th").alias("ths"), F.collect_list("tf").alias("tfs"))
    )

    def sim_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        # whole-batch form of the per-document accumulation: one flat
        # (Σ tokens, 64) ±tf bit matrix, per-document column sums via
        # add.reduceat. Scores are sums of ±tf — exact integers in
        # float64 — so the summation order change cannot flip the sign
        # threshold; outputs are bit-identical to the row loop.
        bitpos = np.arange(64, dtype=np.uint64)
        fpw = np.uint64(1) << np.arange(63, dtype=np.uint64)  # bits 1..63
        for pdf in batches:
            if not len(pdf):
                yield pd.DataFrame({"doc_id": pdf["doc_id"], "simhash": []})
                continue
            lens = np.fromiter(
                (len(t) for t in pdf["ths"]), dtype=np.int64, count=len(pdf)
            )
            assert lens.min() > 0, "simhash over an empty token set"
            h = np.concatenate(
                [np.asarray(t, dtype=np.uint64) for t in pdf["ths"]]
            )[:, None]
            w = np.concatenate(
                [np.asarray(t, dtype=np.float64) for t in pdf["tfs"]]
            )[:, None]
            bits = ((h >> bitpos[None, :]) & np.uint64(1)).astype(np.float64)
            starts = np.zeros(len(pdf), dtype=np.int64)
            np.cumsum(lens[:-1], out=starts[1:])
            score = np.add.reduceat(w * (2.0 * bits - 1.0), starts, axis=0)
            # fp >> 1 keeps sign bits 1..63 (sign-safe 63-bit fingerprint)
            pos = (score > 0)[:, 1:].astype(np.uint64)
            out = (pos * fpw[None, :]).sum(axis=1).astype(np.int64)
            yield pd.DataFrame({"doc_id": pdf["doc_id"], "simhash": out})

    return tok.mapInPandas(sim_batches, "doc_id long, simhash long")


def simhash_near_pairs(
    docs: DataFrame, max_hamming: int = 3, max_bucket: int = 1000
) -> DataFrame:
    """(doc_a, doc_b, hamming) pairs within *max_hamming* bits.

    Candidates: split the 64-bit fingerprint into 4 x 16-bit chunks; any
    pair within Hamming distance 3 must agree on >= 1 chunk (pigeonhole),
    so a join per chunk finds all such pairs in linear work — EXCEPT for
    hot chunk values: a 16-bit value shared by 10^6 docs goes quadratic
    in the join, so buckets larger than *max_bucket* members are dropped
    from candidate generation (recall trade documented here: a pair is
    missed only if every chunk it agrees on is hot, i.e. both docs sit
    in >= 10^3-member near-identical clusters — exactly the boilerplate
    the pipeline's exact-dup pass already removes).
    """
    fps = simhash_fingerprints(docs)
    chunks = fps.select(
        "doc_id",
        "simhash",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(c).alias("chunk"),
                        F.shiftrightunsigned("simhash", c * 16)
                        .bitwiseAND(F.lit(0xFFFF))
                        .alias("val"),
                    )
                    for c in range(4)
                ]
            )
        ).alias("cv"),
    ).select("doc_id", "simhash", "cv.chunk", "cv.val")
    hot = (
        chunks.groupBy("chunk", "val")
        .agg(F.count("*").alias("members"))
        .where(F.col("members") > max_bucket)
        .select("chunk", "val")
    )
    chunks = chunks.join(hot, ["chunk", "val"], "left_anti")
    pairs = (
        chunks.alias("a")
        .join(chunks.alias("b"), ["chunk", "val"])
        .where(F.col("a.doc_id") < F.col("b.doc_id"))
        .select(
            F.col("a.doc_id").alias("doc_a"),
            F.col("b.doc_id").alias("doc_b"),
            F.bit_count(
                F.col("a.simhash").bitwiseXOR(F.col("b.simhash"))
            ).alias("hamming"),
        )
        .distinct()
        .where(F.col("hamming") <= max_hamming)
    )
    return pairs


def near_dup_clusters(pairs: DataFrame, max_iter: int = 50) -> DataFrame:
    """(doc_id, cluster_id): connected components over near-duplicate
    pairs — training-data dedup needs TRANSITIVITY, not just pairs
    (A~B and B~C must dedupe to ONE survivor even when A~C was never a
    candidate). ``cluster_id`` is the minimum doc_id reachable from
    each member, so "keep cluster_id == doc_id" reproduces the
    first-seen-wins preference the exact-dup path uses.

    Plan shape: iterative min-label propagation. Each round joins the
    (bidirectional) edge list against the current labels, takes the
    per-vertex minimum of own and neighbor labels, and stops when a
    round changes nothing — rounds = cluster diameter, and near-dup
    clusters are shallow by construction (every member pair passed an
    LSH candidate + Jaccard gate, so clusters are dense, not chains).
    Every round is one shuffle join + partial-agg over the PAIRS
    relation — bounded by the LSH candidate budget, never the corpus —
    and ``localCheckpoint`` truncates the growing plan each round
    (an iterative algorithm otherwise re-evaluates the whole chain per
    action). Deterministic: min is order-independent. Raises if not
    converged within *max_iter* (pathological chain longer than
    max_iter would need the large-star/small-star variant).

    Input: any (doc_a, doc_b, ...) pair relation —
    :func:`minhash_lsh_pairs`, :func:`simhash_near_pairs` or
    :func:`ngram_jaccard_pairs` output. Singleton docs (no pair) are
    not emitted; callers union them back as their own clusters.
    """
    edges = (
        pairs.select(F.col("doc_a").alias("src"), F.col("doc_b").alias("dst"))
        .unionByName(
            pairs.select(
                F.col("doc_b").alias("src"), F.col("doc_a").alias("dst")
            )
        )
        .distinct()
    )
    from pyspark import StorageLevel

    edges = edges.persist(StorageLevel.MEMORY_AND_DISK)
    labels = (
        edges.select(F.col("src").alias("doc_id"))
        .distinct()
        .withColumn("cluster_id", F.col("doc_id"))
        .localCheckpoint(eager=True)
    )
    for _ in range(max_iter):
        neigh = (
            edges.join(labels, edges.dst == labels.doc_id)
            .groupBy("src")
            .agg(F.min("cluster_id").alias("nmin"))
        )
        new = (
            labels.join(neigh, labels.doc_id == neigh.src, "left")
            .select(
                "doc_id",
                F.least(
                    F.col("cluster_id"),
                    F.coalesce("nmin", F.col("cluster_id")),
                ).alias("cluster_id"),
            )
            .localCheckpoint(eager=True)
        )
        changed = (
            new.alias("n")
            .join(labels.alias("o"), "doc_id")
            .where(F.col("n.cluster_id") != F.col("o.cluster_id"))
            .limit(1)
            .count()
        )
        labels = new
        if changed == 0:
            break
    else:
        raise RuntimeError(
            f"near_dup_clusters: not converged in {max_iter} rounds"
        )
    edges.unpersist()
    return labels


def _band_bucket_rows(sigs: DataFrame, bands: int) -> DataFrame:
    """(doc_id, band, bucket, sig) — one row per signature band, bucket
    = md5 of the band slice (engine-portable, collision-free in
    practice). The signature rides along so candidate pairs can be
    estimate-verified without re-reading either side."""
    rows_per_band = _MINHASH_H // bands
    return sigs.select(
        "doc_id",
        F.explode(
            F.transform(
                F.sequence(F.lit(0), F.lit(bands - 1)),
                lambda band: F.struct(
                    band.cast("int").alias("band"),
                    F.md5(
                        F.array_join(
                            F.transform(
                                F.slice(
                                    "sig",
                                    band * rows_per_band + 1,
                                    rows_per_band,
                                ),
                                lambda v: v.cast("string"),
                            ),
                            ",",
                        )
                    ).alias("bucket"),
                ),
            )
        ).alias("bb"),
        "sig",
    ).select("doc_id", "bb.band", "bb.bucket", "sig")


def _estimate_pairs(
    a_rows: DataFrame, b_rows: DataFrame, threshold: float,
    cross_only: bool = False,
) -> DataFrame:
    """Bucket-join candidates + signature-estimated Jaccard (fraction
    of matching MinHash positions — the 64-sample estimator). With
    *cross_only*, pairs must span the two inputs (a × b); otherwise the
    standard a.doc_id < b.doc_id dedup applies."""
    cond = (
        F.col("a.doc_id") != F.col("b.doc_id")
        if cross_only
        else F.col("a.doc_id") < F.col("b.doc_id")
    )
    cand = (
        a_rows.alias("a")
        .join(b_rows.alias("b"), ["band", "bucket"])
        .where(cond)
        .select(
            F.least("a.doc_id", "b.doc_id").alias("doc_a"),
            F.greatest("a.doc_id", "b.doc_id").alias("doc_b"),
            F.col("a.sig").alias("sig_a"),
            F.col("b.sig").alias("sig_b"),
        )
        .dropDuplicates(["doc_a", "doc_b"])
    )
    est = F.round(
        F.aggregate(
            F.zip_with(
                "sig_a", "sig_b",
                lambda x, y: F.when(x == y, 1).otherwise(0),
            ),
            F.lit(0),
            lambda acc, v: acc + v,
        ).cast("double") / F.lit(float(_MINHASH_H)),
        4,
    )
    return (
        cand.withColumn("est_jaccard", est)
        .where(F.col("est_jaccard") >= threshold)
        .select("doc_a", "doc_b", "est_jaccard")
    )


def incremental_minhash_pairs(
    spark,
    store_root: str,
    new_docs: DataFrame,
    threshold: float = 0.8,
    bands: int = 8,
    run_id: Optional[str] = None,
) -> DataFrame:
    """The 30-min-loop near-dup gate: check an append batch against the
    WHOLE accumulated corpus without re-signing a single old document.

    A log-structured signature store (operators/runstore.py) holds one
    (doc_id, band, bucket, sig) row per banded MinHash slice. Per
    batch: sign the new docs (O(batch)), bucket-join them against the
    stored rows (shuffle bounded by batch × bands plus the matched
    buckets) and against themselves, estimate Jaccard from the
    signatures (the 64-sample estimator — at 10^12 docs the exact
    token-set verify would re-read old token sets; the estimate is the
    standard production gate, and the batch-mode
    :func:`minhash_lsh_pairs` remains the exact-verified path), then
    append the batch's rows as one run. Returns (doc_a, doc_b,
    est_jaccard >= threshold) covering new×stored and new×new — the
    union over all batches equals the one-shot estimator over the full
    corpus (test-pinned), so feeding the pairs to
    :func:`near_dup_clusters` yields corpus-wide dedup clusters
    incrementally. *run_id* dedupes replays (crash-safe append, same
    contract as the term-count store).
    """
    from pyspark import StorageLevel

    from .runstore import append_run, load_rows

    new_rows = _band_bucket_rows(
        minhash_signatures(new_docs), bands
    ).persist(StorageLevel.MEMORY_AND_DISK)
    new_rows.count()
    old_rows = load_rows(spark, store_root)
    parts = [_estimate_pairs(new_rows, new_rows, threshold)]
    if old_rows is not None:
        parts.append(
            _estimate_pairs(new_rows, old_rows, threshold, cross_only=True)
        )
    pairs = parts[0]
    for p in parts[1:]:
        pairs = pairs.unionByName(p)
    # materialize BEFORE the store append: the lazy plan lists the
    # store's files at action time, and the batch's own run must not
    # join against itself as "stored"
    pairs = pairs.dropDuplicates(["doc_a", "doc_b"]).localCheckpoint(
        eager=True
    )
    append_run(spark, store_root, new_rows, run_id=run_id)
    new_rows.unpersist()
    return pairs
