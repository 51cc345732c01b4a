"""Incremental ingest as Structured Streaming.

The reference is micro-batch by cron (30-min cycles, bounded batches —
README.md:153-155, scripts/runscraper.sh:29-41) with watermark-style
incremental index refresh (``Article.indexed >= ts``,
vectors/simserver.py:232-290). Spark-first equivalents:

* :func:`stream_pages_to_postings` — file-source ``readStream`` over a
  pages directory; each micro-batch runs the extraction+tokenize+postings
  plan and appends a postings **delta** keyed by batch id
  (``foreachBatch``). Segment compaction then reuses the batch
  ``build_segments`` on the accumulated deltas — the same
  delta-then-merge design the reference uses for its vector matrix.
  ``Trigger.AvailableNow`` gives the reference's bounded-batch cron
  semantics; checkpointLocation gives exactly-once per input file.
* :func:`windowed_event_counts` — tumbling-window counts with a
  watermark for late data (the reference's day/week buckets,
  db/sql.py:418-465, as a stream).
"""

from __future__ import annotations

from typing import Optional

from pyspark.sql import DataFrame, SparkSession, functions as F

from ..corpus import PAGES_SCHEMA, vocabulary
from ..extraction import extract_text_udf
from ..operators.postings import build_postings
from ..tokenization import apply_index_filter, tokenize_marked_text

__all__ = ["stream_pages_to_postings", "stream_append_to_store", "windowed_event_counts"]


def stream_pages_to_postings(
    spark: SparkSession,
    input_dir: str,
    output_dir: str,
    checkpoint_dir: str,
    available_now: bool = True,
    max_files_per_trigger: Optional[int] = None,
):
    """Stream pages parquet files into an append-only postings delta table.

    Each micro-batch appends (term, url, tf, batch_id) — urls (not dense
    doc ids) key streaming postings; the periodic segment compaction
    assigns ids and builds segments over the accumulated corpus, exactly
    like the reference's cron-batch + occasional model rebuild split
    (scripts/runscraper.sh vs vectors/builder.py:565-592).

    Returns the StreamingQuery (caller awaits/stops it).
    """
    reader = (
        spark.readStream.schema(PAGES_SCHEMA)
        .format("parquet")
    )
    if max_files_per_trigger:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    pages = reader.load(input_dir)

    vocab_pdf = vocabulary()[["stem", "cat"]]

    def process_batch(batch_df: DataFrame, batch_id: int) -> None:
        texts = batch_df.where(F.col("lang") == "is").select(
            "url", extract_text_udf()(F.col("html")).alias("text")
        )
        vocab = batch_df.sparkSession.createDataFrame(vocab_pdf)
        tokens = tokenize_marked_text(texts, vocab)
        indexed = apply_index_filter(tokens)
        postings = (
            indexed.groupBy("term", "url")
            .agg(F.count("*").cast("int").alias("tf"))
            .withColumn("batch_id", F.lit(batch_id))
        )
        postings.write.mode("append").parquet(output_dir)

    writer = (
        pages.writeStream.foreachBatch(process_batch)
        .option("checkpointLocation", checkpoint_dir)
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def windowed_event_counts(
    events: DataFrame,
    window: str = "1 hour",
    watermark: str = "2 hours",
) -> DataFrame:
    """Tumbling-window per-type counts with late-data watermark.

    Works on both a streaming and a batch events DataFrame (the batch
    plan is the oracle for the streaming one in tests).
    """
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", window).alias("w"), "event_type")
        .agg(F.count("*").cast("long").alias("n_events"))
        .select(
            F.date_format(F.col("w.start"), "yyyy-MM-dd HH:mm").alias("w_start"),
            "event_type",
            "n_events",
        )
    )


def stream_append_to_store(
    spark: SparkSession,
    store,
    input_dir: str,
    checkpoint_dir: str,
    available_now: bool = True,
    max_files_per_trigger: Optional[int] = None,
    rebuild_every: Optional[int] = None,
):
    """Continuous index maintenance: stream pages files INTO a built
    :class:`~..plans.lineage.IndexStore` via ``append_pages`` per
    micro-batch — the full reference cron loop (scrape batch -> process
    -> index refresh, scripts/runscraper.sh) as one Structured
    Streaming query.

    Each micro-batch gets dense doc ids, postings/positions/segment
    deltas and a stats refresh, crash-guarded by append-intent lineage
    (plans/lineage.py); the file-source checkpoint gives exactly-once
    per input file, and ``append_pages``' url anti-join makes replayed
    batches no-ops — so the combination is idempotent end-to-end.
    ``Trigger.AvailableNow`` bounds a run exactly like the reference's
    cron budget; omit it for continuous 24/7 ingest.

    Returns the StreamingQuery (caller awaits/stops it).
    """
    from ..plans.lineage import append_pages

    reader = spark.readStream.schema(PAGES_SCHEMA).format("parquet")
    if max_files_per_trigger:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    pages = reader.load(input_dir)

    def process_batch(batch_df: DataFrame, batch_id: int) -> None:
        append_pages(batch_df.sparkSession, store, batch_df,
                     rebuild_every=rebuild_every)

    writer = (
        pages.writeStream.foreachBatch(process_batch)
        .option("checkpointLocation", checkpoint_dir)
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
