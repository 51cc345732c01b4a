#!/usr/bin/env python
"""Generate a statistical clone of the driver's documents/embeddings
tables at a larger scale, for ISOLATED before/after measurement only
(the driver's own sf1.0 copy from the round-5 measurement was removed
with the sandbox; /root/testdata is read-only and never touched).

Matches the observed sf0.1 distributions: 31-word vocab, doc length
uniform 10-100, lang en-heavy, source srcK over 20 values, 64-dim
unit-norm embeddings around 10 cluster centers. NOT byte-identical to
the driver's generator (unknown RNG) — used only for relative deltas
of this round's optimizations at sf1.0-like volume.

Usage: python scripts/gen_scale_corpus.py <out_dir> <n_docs> <n_vecs>
"""
import sys

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

VOCAB = sorted(
    "a agg batch big column customer data dup fast filter group hash join "
    "key line merge order part query row scan slow small sort spark stream "
    "table the value vector window".split()
)
LANGS = ["en", "zh", "es", "fr", "de"]
LANG_P = [0.41, 0.15, 0.15, 0.15, 0.14]


def main() -> None:
    out, n_docs, n_vecs = sys.argv[1], int(sys.argv[2]), int(sys.argv[3])
    import os

    os.makedirs(out, exist_ok=True)
    rng = np.random.Generator(np.random.SFC64(42))

    lens = rng.integers(10, 101, size=n_docs)
    texts = []
    vocab = np.array(VOCAB)
    for L in lens:
        texts.append(" ".join(vocab[rng.integers(0, len(vocab), size=L)]))
    langs = rng.choice(LANGS, size=n_docs, p=LANG_P)
    sources = np.array([f"src{i % 20}" for i in rng.integers(0, 20, n_docs)])
    tbl = pa.table(
        {
            "doc_id": pa.array(np.arange(n_docs), pa.int64()),
            "text": pa.array(texts),
            "lang": pa.array(langs.tolist()),
            "source": pa.array(sources.tolist()),
            "n_chars": pa.array([len(t) for t in texts], pa.int64()),
        }
    )
    pq.write_table(tbl, f"{out}/documents.parquet")

    centers = rng.normal(size=(10, 64))
    centers /= np.linalg.norm(centers, axis=1, keepdims=True)
    labels = rng.integers(0, 10, size=n_vecs)
    vecs = centers[labels] + rng.normal(scale=0.9, size=(n_vecs, 64))
    vecs /= np.linalg.norm(vecs, axis=1, keepdims=True)
    etbl = pa.table(
        {
            "vec_id": pa.array(np.arange(n_vecs), pa.int64()),
            "embedding": pa.array(
                [v for v in vecs.astype(np.float32)],
                pa.list_(pa.float32()),
            ),
            "label": pa.array(labels.astype(np.int32), pa.int32()),
        }
    )
    pq.write_table(etbl, f"{out}/embeddings.parquet")
    print("wrote", out, n_docs, "docs,", n_vecs, "vecs")


if __name__ == "__main__":
    main()
