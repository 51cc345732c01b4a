"""Streaming near-dup gates (round-4 verdict item #7): the 30-min-loop
micro-batches emit MinHash / embedding near-dup pairs alongside the
index append — stream output over >=3 micro-batches equals the one-shot
batch computation over the same corpus."""

import os
import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from pyspark.sql import functions as F

from greynirserver_spark.corpus import generate_pages
from greynirserver_spark.plans.lineage import build_index_checkpointed


def test_stream_emits_minhash_pairs_equal_to_one_shot(spark, tmp_path):
    """3 page files -> 3 micro-batches through stream_append_to_store
    with the incremental MinHash gate on: the union of the per-batch
    pair outputs equals the one-shot estimator over all streamed docs
    (with the store's doc ids), and the signature store carries one run
    per batch."""
    from greynirserver_spark.extraction import extract_text_udf
    from greynirserver_spark.operators.dedup import (
        _band_bucket_rows,
        _estimate_pairs,
        minhash_signatures,
    )
    from greynirserver_spark.streaming.ingest import stream_append_to_store

    all_pages = generate_pages(spark, 360).cache()
    h = F.pmod(F.xxhash64("url"), F.lit(4))
    base = all_pages.where(h == 0)
    store = build_index_checkpointed(
        spark, base, str(tmp_path / "store"), n_shards=4,
    )
    # the generator's organic near-dups are non-'is' pages (filtered by
    # append_pages), so plant clones ACROSS batches: batch 2/3 re-serve
    # batch-1/2 html under new urls — guaranteeing pairs that exercise
    # the new×STORED join, not just new×new
    def clone(df, tag, n):
        return df.where(F.col("lang") == "is").orderBy("url").limit(
            n
        ).withColumn("url", F.concat("url", F.lit(f"?{tag}")))

    b1 = all_pages.where(h == 1)
    b2 = all_pages.where(h == 2).unionByName(clone(b1, "c2", 12))
    b3 = all_pages.where(h == 3).unionByName(clone(b2, "c3", 12))
    streamed_pages = b1.unionByName(b2).unionByName(b3).cache()
    indir = str(tmp_path / "incoming")
    for b in (b1, b2, b3):
        b.coalesce(1).write.mode("append").parquet(indir)

    q = stream_append_to_store(
        spark, store, indir, str(tmp_path / "ckpt"),
        max_files_per_trigger=1, emit_near_dup_pairs=True,
        minhash_threshold=0.7,
    )
    q.awaitTermination(600)

    pair_root = os.path.join(store.root, "near_dup_pairs")
    batch_dirs = [d for d in os.listdir(pair_root) if d.startswith("batch_id=")]
    assert len(batch_dirs) >= 3
    got = {
        (r["doc_a"], r["doc_b"], r["est_jaccard"])
        for r in spark.read.parquet(
            *[os.path.join(pair_root, d) for d in batch_dirs]
        ).collect()
    }

    # one-shot estimator over every STREAMED doc, with store doc ids
    streamed = streamed_pages.where(F.col("lang") == "is").select(
        "url", extract_text_udf()(F.col("html")).alias("text")
    )
    docs = (
        spark.read.parquet(store.doc_map).select("doc_id", "url")
        .join(streamed, "url")
        .select("doc_id", "text")
    )
    rows = _band_bucket_rows(minhash_signatures(docs), 8)
    want = {
        (r["doc_a"], r["doc_b"], r["est_jaccard"])
        for r in _estimate_pairs(rows, rows, 0.7).collect()
    }
    assert got == want and len(want) > 0

    # the signature store accumulated replay-keyed runs per batch
    sig_root = os.path.join(store.root, "minhash_store")
    runs = [d for d in os.listdir(sig_root) if d.startswith("run=")]
    assert len(runs) >= 3 and all("-stream-" in r for r in runs)


def test_stream_embedding_pairs_equal_to_one_shot(spark, tmp_path):
    """Embedding twin: 3 vector files -> 3 micro-batches through
    stream_embeddings_near_pairs; union == one-shot
    cosine_near_pairs_lsh over the full table."""
    from greynirserver_spark.operators.ann import cosine_near_pairs_lsh
    from greynirserver_spark.streaming.ingest import (
        stream_embeddings_near_pairs,
    )

    rng = np.random.Generator(np.random.SFC64(7))
    base_vecs = rng.standard_normal((20, 8))
    rows = []
    vid = 0
    for v in base_vecs:
        rows.append((vid, [float(x) for x in v])); vid += 1
        # one near-clone per base vector -> guaranteed high-cos pairs
        w = v + 0.05 * rng.standard_normal(8)
        rows.append((vid, [float(x) for x in w])); vid += 1
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    indir = str(tmp_path / "vecs")
    for i in range(3):
        emb.where(F.col("vec_id") % 3 == i).coalesce(1).write.mode(
            "append"
        ).parquet(indir)

    out_dir = str(tmp_path / "pairs")
    q = stream_embeddings_near_pairs(
        spark, indir, str(tmp_path / "vstore"), str(tmp_path / "vckpt"),
        out_dir, threshold=0.9, n_planes=4, max_files_per_trigger=1,
    )
    q.awaitTermination(600)

    batch_dirs = [d for d in os.listdir(out_dir) if d.startswith("batch_id=")]
    assert len(batch_dirs) >= 3
    got = {
        (r["vec_a"], r["vec_b"], r["cosine"])
        for r in spark.read.parquet(
            *[os.path.join(out_dir, d) for d in batch_dirs]
        ).collect()
    }
    want = {
        (r["vec_a"], r["vec_b"], r["cosine"])
        for r in cosine_near_pairs_lsh(emb, 0.9, n_planes=4).collect()
    }
    assert got == want and len(want) > 0


def test_stream_topic_gram_equals_one_shot(spark, tmp_path):
    """3 micro-batches with emit_topic_gram: the streamed Gram store
    (vocab frozen on batch 1) refits to the same model as a one-shot
    store inited on batch-1 docs and fed every streamed doc at once."""
    from greynirserver_spark.extraction import extract_text_udf
    from greynirserver_spark.operators import lsa
    from greynirserver_spark.streaming.ingest import stream_append_to_store

    all_pages = generate_pages(spark, 240).cache()
    h = F.pmod(F.xxhash64("url"), F.lit(4))
    base = all_pages.where(h == 0)
    store = build_index_checkpointed(
        spark, base, str(tmp_path / "store"), n_shards=4,
    )
    batches = [all_pages.where(h == i) for i in (1, 2, 3)]
    indir = str(tmp_path / "incoming")
    for b in batches:
        b.coalesce(1).write.mode("append").parquet(indir)

    q = stream_append_to_store(
        spark, store, indir, str(tmp_path / "ckpt"),
        max_files_per_trigger=1, emit_topic_gram=True,
        lsa_vocab_size=64,
    )
    q.awaitTermination(600)

    lsa_dir = os.path.join(store.root, "lsa_store")
    runs = [d for d in os.listdir(os.path.join(lsa_dir, "gram"))
            if d.startswith("run=")]
    assert len(runs) >= 3 and all("-stream-" in r for r in runs)
    streamed_model = lsa.fit_from_gram_store(spark, lsa_dir, k=8)

    def docs_of(pages_df):
        texts = pages_df.where(F.col("lang") == "is").select(
            "url", extract_text_udf()(F.col("html")).alias("text"))
        return (
            spark.read.parquet(store.doc_map).select("doc_id", "url")
            .join(texts, "url").select("doc_id", "text")
        )

    oneshot_dir = str(tmp_path / "oneshot_lsa")
    lsa.init_gram_store(docs_of(batches[0]), oneshot_dir, vocab_size=64)
    all_streamed = batches[0].unionByName(batches[1]).unionByName(batches[2])
    lsa.append_gram(spark, oneshot_dir, docs_of(all_streamed), "all")
    want = lsa.fit_from_gram_store(spark, oneshot_dir, k=8)

    assert streamed_model.terms == want.terms
    assert np.allclose(streamed_model.s, want.s, rtol=1e-9)
    assert np.allclose(
        streamed_model.u @ streamed_model.u.T,
        want.u @ want.u.T, atol=1e-6,
    )
