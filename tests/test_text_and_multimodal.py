"""Tests: language ID on the pages corpus, multimodal plumbing, and
streaming ingest (AvailableNow micro-batch vs the batch oracle)."""

import sys
from pathlib import Path

import pytest

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from pyspark.sql import functions as F

from greynirserver_spark.corpus import generate_pages_pdf
from greynirserver_spark.functions.langid import detect_language
from greynirserver_spark.operators.multimodal import (
    dedup_media_exact,
    extract_image_features,
    sample_video_frames,
    synthesize_media,
)


def test_langid_on_pages(spark):
    pdf = generate_pages_pdf(300)
    pdf = pdf[pdf["lang"].isin(["is", "en"])]
    df = spark.createDataFrame(pdf[["url", "text", "lang"]])
    pred = detect_language(df, "text")
    agree = pred.where(F.col("lang_pred") == F.col("lang")).count()
    total = pred.count()
    # The is/en split must be essentially exact on this corpus
    assert agree / total > 0.97, f"{agree}/{total}"


def test_langid_handles_empty_text(spark):
    df = spark.createDataFrame([("",), ("12345 !!!",)], "text string")
    rows = detect_language(df, "text").collect()
    assert all(r.lang_pred == "und" for r in rows)


def test_media_features_deterministic(spark):
    media = synthesize_media(spark, 60).cache()
    feats = extract_image_features(media).orderBy("media_id")
    rows = feats.collect()
    assert len(rows) == media.where("kind = 'image'").count()
    assert all(len(r.features) == 16 for r in rows)
    assert all(0.0 <= v < 1.0 for r in rows for v in r.features)
    # deterministic across runs
    rows2 = extract_image_features(media).orderBy("media_id").collect()
    assert [r.features for r in rows] == [r.features for r in rows2]


def test_decode_stub_raises_without_codec():
    from greynirserver_spark.operators.multimodal import (
        _decode_image,
        _decoder_available,
    )

    if not _decoder_available():
        with pytest.raises(NotImplementedError):
            _decode_image(b"\x89PNG fake")


def test_video_frame_sampling(spark):
    media = synthesize_media(spark, 60).cache()
    frames = sample_video_frames(media, every_ms=5000)
    pdf = frames.toPandas()
    vids = media.where("kind = 'video'").select(
        "media_id", "duration_ms"
    ).toPandas()
    assert set(pdf["media_id"]) == set(vids["media_id"])
    for _, row in vids.iterrows():
        expect = max(1, int(row.duration_ms) // 5000)
        assert (pdf["media_id"] == row.media_id).sum() == expect
    assert (pdf["frame_no"] >= 0).all()


def test_media_exact_dedup(spark):
    media = synthesize_media(spark, 40)
    dup = media.union(media.limit(5))  # 5 byte-identical duplicates
    groups = dedup_media_exact(dup)
    assert groups.where("n_items = 2").count() == 5
    assert groups.agg(F.sum("n_items")).first()[0] == 45


def test_streaming_pages_to_postings(spark, tmp_path):
    from greynirserver_spark.streaming.ingest import stream_pages_to_postings

    in_dir, out_dir, ckpt = (
        str(tmp_path / "in"), str(tmp_path / "out"), str(tmp_path / "ckpt")
    )
    pages = spark.createDataFrame(generate_pages_pdf(120))
    pages.limit(60).write.parquet(in_dir)

    q = stream_pages_to_postings(spark, in_dir, out_dir, ckpt)
    q.awaitTermination(120)
    first = spark.read.parquet(out_dir)
    n1 = first.count()
    assert n1 > 0
    assert set(first.columns) == {"term", "url", "tf", "batch_id"}

    # new files arrive -> only the delta is processed (exactly-once resume)
    spark.createDataFrame(generate_pages_pdf(60, start=60)).write.mode(
        "append"
    ).parquet(in_dir)
    q2 = stream_pages_to_postings(spark, in_dir, out_dir, ckpt)
    q2.awaitTermination(120)
    second = spark.read.parquet(out_dir)
    assert second.count() > n1
    # urls from batch 1 are not reprocessed into later batches
    b0_urls = {r.url for r in first.select("url").distinct().collect()}
    later = second.where(~F.col("batch_id").isin(
        [r.batch_id for r in first.select("batch_id").distinct().collect()]
    ))
    later_urls = {r.url for r in later.select("url").distinct().collect()}
    assert not (b0_urls & later_urls)


def test_windowed_event_counts_batch_oracle(spark):
    from greynirserver_spark.streaming.ingest import windowed_event_counts

    ev = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    got = windowed_event_counts(ev).toPandas()
    # batch oracle: plain date_trunc-hour aggregation
    exp = (
        ev.groupBy(
            F.date_format(F.date_trunc("hour", "ts"), "yyyy-MM-dd HH:mm")
            .alias("w_start"),
            "event_type",
        )
        .agg(F.count("*").cast("long").alias("n_events"))
        .toPandas()
    )
    a = sorted(map(tuple, got[["w_start", "event_type", "n_events"]].values.tolist()))
    b = sorted(map(tuple, exp[["w_start", "event_type", "n_events"]].values.tolist()))
    assert a == b
