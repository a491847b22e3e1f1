"""Structured-Streaming ingestion: AvailableNow trigger + checkpoint
resume — the durable-consumer semantics of the reference's NATS
deployment mode (nats_emitter.go:31-42; polling file collector,
collector/file/file.go:105-122)."""

import os

import pytest


@pytest.fixture(scope="module")
def pages_dir(tmp_path_factory, pages_df):
    d = str(tmp_path_factory.mktemp("stream_pages"))
    pages_df.limit(100).write.mode("overwrite").parquet(d)
    return d


def test_windowed_counts_with_watermark(spark, tmp_path_factory):
    """Closed windows (older than watermark at end-of-stream) must
    match the batch aggregation exactly; open windows are withheld —
    append-mode late-data semantics."""
    import pyspark.sql.functions as F

    from guackg.streaming import stream_windowed_mention_counts

    events_dir = str(tmp_path_factory.mktemp("wm_events"))
    out_dir = str(tmp_path_factory.mktemp("wm_out"))
    (spark.read.parquet("/root/testdata/sf0.001/events.parquet")
     .write.mode("overwrite").parquet(events_dir))

    q = stream_windowed_mention_counts(spark, events_dir, out_dir,
                                       window_duration="1 hour",
                                       watermark_delay="2 hours")
    q.awaitTermination(300)

    got = spark.read.parquet(os.path.join(out_dir, "windowed_counts"))
    batch = spark.read.parquet(events_dir) \
        .withColumn("ts", F.col("ts").cast("timestamp"))  # match stream
    max_ts = batch.agg(F.max("ts")).collect()[0][0]
    want = (batch
            .groupBy(F.window("ts", "1 hour").alias("win"), "event_type")
            .agg(F.count("*").alias("n_events"),
                 F.round(F.sum("value"), 4).alias("sum_value"))
            .select(F.col("win.start").alias("window_start"),
                    F.col("win.end").alias("window_end"),
                    "event_type", "n_events", "sum_value"))
    # the stream withholds windows not yet closed by the watermark
    closed = want.filter(
        F.col("window_end") <= F.lit(max_ts) - F.expr("INTERVAL 2 HOURS"))
    assert got.count() == closed.count() > 0
    assert got.exceptAll(closed).count() == 0
    assert closed.exceptAll(got).count() == 0


def test_stream_matches_batch_and_resumes(spark, pages_df, pages_dir,
                                          tmp_path_factory):
    from guackg.extract import extract, split_quarantine
    from guackg.streaming import stream_pages_to_triples
    from guackg.triples import extract_triples

    out_dir = str(tmp_path_factory.mktemp("stream_out"))

    q = stream_pages_to_triples(spark, pages_dir, out_dir)
    q.awaitTermination(300)

    got = spark.read.parquet(os.path.join(out_dir, "triples_stream"))
    batch_pages = spark.read.parquet(pages_dir)
    ok, _ = split_quarantine(extract(batch_pages))
    want = extract_triples(
        ok.select("url", "warc_ts", "lang", "extracted_text"))
    # stream == batch on the same input (shared DataFrame code)
    assert got.count() == want.count()
    cols = ["url", "subj_surface", "pred", "obj_surface"]
    assert (got.select(cols).exceptAll(want.select(cols)).count() == 0)

    # S4 queue-consumer mode: bounded micro-batches must produce the
    # SAME result as the one-shot drain, in >1 committed batches
    # (multi-file source dir so maxFilesPerTrigger actually splits)
    queue_src = str(tmp_path_factory.mktemp("queue_src"))
    spark.read.parquet(pages_dir).repartition(6) \
        .write.mode("overwrite").parquet(queue_src)
    qd = str(tmp_path_factory.mktemp("queue_out"))
    qq = stream_pages_to_triples(spark, queue_src, qd,
                                 max_files_per_trigger=2)
    qq.awaitTermination(300)
    n_batches = len([p for p in qq.recentProgress if p["numInputRows"] > 0])
    assert n_batches > 1, "queue mode should commit multiple batches"
    queued = spark.read.parquet(os.path.join(qd, "triples_stream"))
    assert queued.count() == want.count()
    assert (queued.select(cols).exceptAll(want.select(cols)).count() == 0)

    # append new files → resume processes ONLY the increment
    n_before = got.count()
    pages_df.limit(150).write.mode("append").parquet(pages_dir)
    q2 = stream_pages_to_triples(spark, pages_dir, out_dir)
    q2.awaitTermination(300)
    n_after = spark.read.parquet(
        os.path.join(out_dir, "triples_stream")).count()
    assert n_after > n_before
    # no reprocessing: total == batch-run over the full directory
    ok2, _ = split_quarantine(extract(spark.read.parquet(pages_dir)))
    want2 = extract_triples(
        ok2.select("url", "warc_ts", "lang", "extracted_text"))
    assert n_after == want2.count()
