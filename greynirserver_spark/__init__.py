"""greynirserver_spark — a PySpark-native full-text index + BM25 query engine.

A from-scratch re-expression of the capabilities of mideind/GreynirServer
(reference snapshot at /root/reference, studied read-only) on Apache Spark:

* HTML -> text extraction with the reference's exact ``[[...]]`` paragraph
  marker semantics (byte-identical per url), as an Arrow-batched pandas UDF.
* Tokenization / stem-category normalization and index filtering
  (reference: settings.py:53-55, config/Index.conf, article.py:324-343).
* Inverted-index build: TF aggregation -> term/doc stats -> docID-sorted
  delta+varint compressed posting blocks with skip and block-max metadata,
  term-partitioned with explicit salting for Zipf head-term skew.
* BM25 top-k retrieval: exact join-based scoring and block-max WAND over
  the compressed segments, rank-identical (score desc, doc_id asc).
* Checkpoint/lineage tables so a killed index build resumes without
  recomputing finished partitions (reference: the scraped/parsed/processed/
  indexed stage timestamps, db/models.py:217-223).
* The reference's wider analytics query surface (word-frequency timelines,
  co-occurrence, top-N mentions) plus large-scale training-data operators
  (dedup families, ANN, language ID, quality scoring).

Everything is DataFrame/Spark-SQL first; Python appears only inside
Arrow-vectorized pandas UDFs (extraction, posting compression, WAND).
"""

__version__ = "0.1.0"
