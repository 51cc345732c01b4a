"""Low-latency BM25 serving over the segment store.

Two serving shapes exist for the same store (both rank-identical to the
exact scorer):

* ``wand_topk`` (operators/wand.py) — fully distributed; right when
  queries are batched or the matched posting volume is huge.
* :class:`Searcher` (this module) — single-query interactive path: the
  term-pruned, column-pruned parquet scan fetches only the matched
  blocks (a few KB for typical queries thanks to row-group stats), and
  the same interval-sweep block-max pruner scores them in-process.
  This is the analog of the reference's resident simserver process
  (vectors/simserver.py) — except the "index in memory" is replaced by
  pruned reads of an immutable columnar store, so it needs no 16-minute
  cold start (reference simserver.py:376-377) and no refresh protocol:
  re-open after a snapshot commit and it serves the new index.

A tiny LRU on (terms) -> result emulates the reference's query cache
(queries table with expiry, queries/__init__.py:1295-1324).
"""

from __future__ import annotations

from collections import OrderedDict
from typing import List, Optional, Sequence, Tuple

import pandas as pd

from pyspark.sql import SparkSession, functions as F

from ..operators.wand import shard_topk_pandas
from ..plans.lineage import IndexStore

__all__ = ["Searcher"]


class Searcher:
    """Interactive top-k search over a persisted :class:`IndexStore`."""

    def __init__(
        self, spark: SparkSession, store: IndexStore, cache_size: int = 256
    ) -> None:
        self.spark = spark
        self.store = store
        self._segments = store.load_segments(spark)
        crow = store.load(spark, "corpus").collect()[0]
        self.avgdl = float(crow["avgdl"])
        self.n_docs = int(crow["n_docs"])
        self._cache: OrderedDict[Tuple, List[Tuple[int, float]]] = OrderedDict()
        self._cache_size = cache_size

    def search(self, terms: Sequence[str], k: int = 10) -> List[Tuple[int, float]]:
        """[(doc_id, score)] — deterministic (score desc, doc_id asc).

        The scan is term-filtered (row-group pruned) and column-complete
        (blocks are self-contained); matched blocks come back as one
        Arrow batch and are scored with the shared block-max pruner.
        """
        key = (tuple(sorted(set(terms))), k)
        if key in self._cache:
            self._cache.move_to_end(key)
            return self._cache[key]
        terms_u = sorted(set(terms))
        if not terms_u:
            return []
        pdf = (
            self._segments.where(F.col("term").isin(terms_u))
            .toPandas()
        )
        if len(pdf) == 0:
            result: List[Tuple[int, float]] = []
        else:
            # score each shard independently (blocks of one shard share a
            # doc range), merge, global top-k
            tops = [
                shard_topk_pandas(g, k, self.avgdl)
                for _, g in pdf.groupby("shard", sort=False)
            ]
            allhits = pd.concat(tops, ignore_index=True)
            allhits = allhits.sort_values(
                ["score", "doc_id"], ascending=[False, True], kind="mergesort"
            ).head(k)
            result = list(
                zip(allhits["doc_id"].astype(int), allhits["score"].astype(float))
            )
        self._cache[key] = result
        if len(self._cache) > self._cache_size:
            self._cache.popitem(last=False)
        return result
