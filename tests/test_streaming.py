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


def test_stateful_sessionization_stream(spark, tmp_path_factory):
    """applyInPandasWithState gap sessionization: closed sessions must
    match the batch window-function sessionization exactly; open
    sessions emit once the watermark passes their end + gap (second
    run with far-future events forces every timeout)."""
    import pyspark.sql.functions as F

    from guackg.streaming import stream_stateful_sessions

    events_dir = str(tmp_path_factory.mktemp("ss_events"))
    out_dir = str(tmp_path_factory.mktemp("ss_out"))
    src = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    src.write.mode("overwrite").parquet(events_dir)

    # batch expectation (same semantics as ops/relational.py)
    from pyspark.sql import Window
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    epoch = F.col("ts").cast("timestamp").cast("long")
    gap = epoch - F.lag(epoch).over(w)
    sess = (src.withColumn("is_new",
                           F.when(gap.isNull() | (gap > 1800), 1)
                           .otherwise(0))
            .withColumn("seq", F.sum("is_new").over(
                w.rowsBetween(Window.unboundedPreceding, 0)))
            .groupBy("user_id", "seq")
            .agg(F.count("*").alias("n_events"),
                 F.min(F.col("ts").cast("timestamp")).alias("session_start"),
                 F.max(F.col("ts").cast("timestamp")).alias("session_end")))
    want_all = {(r.user_id, r.session_start, r.session_end, r.n_events)
                for r in sess.collect()}
    last_seq = sess.groupBy("user_id").agg(F.max("seq").alias("seq"))
    want_closed = {(r.user_id, r.session_start, r.session_end, r.n_events)
                   for r in sess.join(last_seq, on=["user_id", "seq"],
                                      how="left_anti").collect()}

    q = stream_stateful_sessions(spark, events_dir, out_dir)
    q.awaitTermination(300)
    got1 = {(r.user_id, r.session_start, r.session_end, r.n_events)
            for r in spark.read.parquet(
                os.path.join(out_dir, "sessions")).collect()}
    assert want_closed <= got1 <= want_all

    # push the watermark far past every open session: append one
    # far-future event per user → every old open session times out
    late = (src.groupBy("user_id")
            .agg(F.max(F.col("ts").cast("timestamp")).alias("mx"))
            .select("user_id",
                    F.col("mx") + F.expr("INTERVAL 30 DAYS"),
                    F.lit(0).cast("bigint"), F.lit("x"),
                    F.lit(0.0), F.lit(None).cast("string"))
            .toDF("user_id", "ts", "event_id", "event_type",
                  "value", "props")
            .select("event_id", "ts", "user_id", "event_type",
                    "value", "props"))
    late.write.mode("append").parquet(events_dir)
    q2 = stream_stateful_sessions(spark, events_dir, out_dir)
    q2.awaitTermination(300)
    got2 = {(r.user_id, r.session_start, r.session_end, r.n_events)
            for r in spark.read.parquet(
                os.path.join(out_dir, "sessions")).collect()}
    # every original session emitted exactly once, no duplicates
    assert want_all <= got2


def test_stream_upsert_sink_is_idempotent(spark, pages_df,
                                          tmp_path_factory):
    """foreachBatch → keyed merge_upsert: multi-batch drain equals the
    batch result deduped on the natural key, and a FULL REPLAY (fresh
    checkpoint, same table) changes nothing — the at-least-once +
    idempotent-upsert contract."""
    import pyspark.sql.functions as F

    from guackg.extract import extract, split_quarantine
    from guackg.streaming import stream_triples_upsert
    from guackg.triples import extract_triples

    src = str(tmp_path_factory.mktemp("up_src"))
    wd = str(tmp_path_factory.mktemp("up_wd"))
    pages_df.limit(120).repartition(6).write.mode("overwrite").parquet(src)

    q = stream_triples_upsert(spark, src, wd, max_files_per_trigger=2)
    q.awaitTermination(300)
    n_batches = len([p for p in q.recentProgress
                     if p["numInputRows"] > 0])
    assert n_batches > 1

    table = os.path.join(wd, "triples_upsert")
    got = spark.read.parquet(table)
    ok, _ = split_quarantine(extract(spark.read.parquet(src)))
    want = extract_triples(
        ok.select("url", "warc_ts", "lang", "extracted_text")) \
        .dropDuplicates(["url", "subj_surface", "pred", "obj_surface"])
    keys = ["url", "subj_surface", "pred", "obj_surface"]
    assert got.count() == want.count()
    assert got.select(keys).exceptAll(want.select(keys)).count() == 0

    # full replay with a fresh checkpoint into the SAME table: every
    # row redelivered, table unchanged (idempotent natural-key upsert)
    q2 = stream_triples_upsert(spark, src, wd,
                               checkpoint_dir=os.path.join(
                                   wd, "_replay_ckpt"),
                               max_files_per_trigger=2)
    q2.awaitTermination(300)
    again = spark.read.parquet(table)
    assert again.count() == want.count()
    assert again.select(keys).exceptAll(want.select(keys)).count() == 0
