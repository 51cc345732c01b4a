"""Independent single-process BM25 oracle (pandas/NumPy + re).

Implements the same *semantics* as the Spark engine through a completely
different execution path: Python regex tokenization, pandas groupbys and
NumPy float64 arithmetic with term-sorted summation. Used by the
rank-identity tests (FIXTURES.md §4): the Spark engine's top-k must match
this oracle's doc_id sequence exactly, scores bit-close.
"""

from __future__ import annotations

import re
from typing import Dict, List, Sequence, Tuple

import numpy as np
import pandas as pd

from greynirserver_spark.corpus import vocabulary
from greynirserver_spark.tokenization import (
    CATEGORIES_TO_INDEX,
    MAX_WORD_LEN,
    NOINDEX_PAIRS,
    PY_TOKEN_SPLIT_RE,
)

K1 = 1.2
B = 0.75

_SPLIT = re.compile(PY_TOKEN_SPLIT_RE)


def oracle_index(pages: pd.DataFrame, min_df: int = 3):
    """pages(url, text, lang) -> (doc_map, postings, term_stats, n, avgdl)."""
    docs = (
        pages.loc[pages["lang"] == "is", ["url", "text"]]
        .sort_values("url", kind="mergesort")
        .reset_index(drop=True)
    )
    docs["doc_id"] = np.arange(len(docs), dtype=np.int64)

    vocab = vocabulary()
    cat_map: Dict[str, str] = dict(zip(vocab["stem"], vocab["cat"]))
    noindex = {(s.lower(), c) for s, c in NOINDEX_PAIRS}

    rows: List[Tuple[int, str]] = []
    for doc_id, text in zip(docs["doc_id"], docs["text"]):
        for tok in _SPLIT.split(text.lower()):
            if not tok or len(tok) > MAX_WORD_LEN:
                continue
            cat = cat_map.get(tok, "entity")
            if cat not in CATEGORIES_TO_INDEX or (tok, cat) in noindex:
                continue
            rows.append(
                (doc_id, tok.replace("-", "").replace(" ", "_") + "/" + cat)
            )
    tok_df = pd.DataFrame(rows, columns=["doc_id", "term"])
    postings = (
        tok_df.groupby(["term", "doc_id"]).size().rename("tf").reset_index()
    )
    doclen = postings.groupby("doc_id")["tf"].sum().rename("doclen")
    n = len(docs)
    avgdl = float(doclen.sum()) / n
    df = postings.groupby("term")["doc_id"].size().rename("df")
    term_stats = df[df >= min_df].reset_index()
    term_stats["idf"] = np.log(
        (n - term_stats["df"] + 0.5) / (term_stats["df"] + 0.5) + 1.0
    )
    return docs, postings, term_stats, doclen, n, avgdl


def oracle_topk(
    postings: pd.DataFrame,
    term_stats: pd.DataFrame,
    doclen: pd.Series,
    avgdl: float,
    query_terms: Sequence[str],
    k: int = 10,
) -> pd.DataFrame:
    """Top-k with term-sorted float64 summation, tie (score desc, doc asc)."""
    terms = sorted(set(query_terms))
    idf = dict(zip(term_stats["term"], term_stats["idf"]))
    scores: Dict[int, float] = {}
    for t in terms:  # fixed term order -> fixed addition order
        if t not in idf:
            continue
        sub = postings[postings["term"] == t]
        for doc_id, tf in zip(sub["doc_id"], sub["tf"]):
            dl = float(doclen.loc[doc_id])
            s = idf[t] * (tf * (K1 + 1.0)) / (
                tf + K1 * (1.0 - B + B * dl / avgdl)
            )
            scores[doc_id] = scores.get(doc_id, 0.0) + s
    out = pd.DataFrame(
        {"doc_id": list(scores.keys()), "score": list(scores.values())}
    )
    out = out.sort_values(
        ["score", "doc_id"], ascending=[False, True], kind="mergesort"
    ).head(k)
    out["rank"] = np.arange(1, len(out) + 1)
    return out[["rank", "doc_id", "score"]].reset_index(drop=True)
