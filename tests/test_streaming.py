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


def test_bus_source_through_seam(spark, tmp_path_factory):
    """The message-bus swap, proven with a real NON-file source: Spark's
    rate-micro-batch format delivers (timestamp, value) messages — no
    path, no file schema — through the SAME `_reader` seam and the same
    downstream extract → triples graph. The `adapt` callable is the
    Kafka value-decode analog (message → page blob; s3.go:172-262
    unmarshals one object per SQS message the same way). Streamed
    triples must equal the batch run over the identical pages — the
    one-line-swap claim, test-covered end-to-end."""
    import pandas as pd

    from guackg.extract import extract, split_quarantine
    from guackg.streaming import stream_pages_to_triples
    from guackg.testing.gen import PAGE_COLS, gen_page, spark_generate_pages
    from guackg.triples import extract_triples

    out_dir = str(tmp_path_factory.mktemp("bus_out"))
    n = 40

    def decode_messages(stream):
        # deterministic "broker": message value v carries page v's blob
        def batches(it):
            for pdf in it:
                rows = []
                for v in pdf["value"]:
                    r = gen_page(int(v))
                    r.pop("_golden")
                    rows.append(r)
                yield pd.DataFrame(rows, columns=PAGE_COLS)

        return stream.mapInPandas(
            batches,
            schema=("url string, warc_ts timestamp, html binary, "
                    "text string, lang string"))

    q = stream_pages_to_triples(
        spark, pages_dir=None, out_dir=out_dir,
        source_spec={"format": "rate-micro-batch",
                     "options": {"rowsPerBatch": str(n),
                                 "numPartitions": "2",
                                 "startTimestamp": "0"}},
        adapt=decode_messages)
    q.awaitTermination(300)

    got = spark.read.parquet(os.path.join(out_dir, "triples_stream"))
    ok, _ = split_quarantine(extract(spark_generate_pages(spark, n)))
    want = extract_triples(
        ok.select("url", "warc_ts", "lang", "extracted_text"))
    assert got.count() == want.count() > 0
    assert got.exceptAll(want).count() == 0
    assert want.exceptAll(got).count() == 0

    # the graph-sink ingest path accepts the same bus source + decode
    # (stream_triples_upsert gained the seam too — a broker source must
    # be able to feed the idempotent upsert sink, not just the append
    # sink above)
    from guackg.streaming import stream_triples_upsert

    up_dir = str(tmp_path_factory.mktemp("bus_upsert"))
    q2 = stream_triples_upsert(
        spark, pages_dir=None, workdir=up_dir,
        source_spec={"format": "rate-micro-batch",
                     "options": {"rowsPerBatch": str(n),
                                 "numPartitions": "2",
                                 "startTimestamp": "0"}},
        adapt=decode_messages)
    q2.awaitTermination(300)
    upserted = spark.read.parquet(os.path.join(up_dir, "triples_upsert"))
    cols = want.columns
    # the upsert sink keys on the natural triple identity, so repeated
    # identical triples collapse — compare as sets, and the row count
    # must equal the keyed-distinct count of the batch result
    keys = ["url", "subj_surface", "pred", "obj_surface"]
    assert upserted.count() == want.dropDuplicates(keys).count() > 0
    assert upserted.select(cols).exceptAll(want).count() == 0
    assert (want.distinct()
            .exceptAll(upserted.select(cols).distinct()).count() == 0)


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
    # a session is emitted once the watermark (max_ts - delay) passes
    # its end + gap — ONLY then is it safe under out-of-order arrival
    # (an eagerly-emitted session could still be merged by a late
    # bridging event; round-2 ADVICE)
    import datetime
    max_ts = src.agg(F.max(F.col("ts").cast("timestamp"))).collect()[0][0]
    wm = max_ts - datetime.timedelta(hours=2)
    want_matured = {s for s in want_all
                    if s[2] + datetime.timedelta(minutes=30) < wm}

    q = stream_stateful_sessions(spark, events_dir, out_dir)
    q.awaitTermination(300)
    got1 = {(r.user_id, r.session_start, r.session_end, r.n_events)
            for r in spark.read.parquet(
                os.path.join(out_dir, "sessions")).collect()}
    assert want_matured <= got1 <= want_all

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
    n_rows = spark.read.parquet(os.path.join(out_dir, "sessions")).count()
    assert n_rows == len(got2), "duplicate session emissions"


def test_stateful_sessions_out_of_order(spark, tmp_path_factory):
    """Round-2 ADVICE: out-of-order events INSIDE the watermark across
    micro-batches must reproduce batch sessionization exactly —
    (a) an event in [start-gap, start) lowers the stored session_start,
    (b) an event older than start-gap forms its OWN earlier session
    instead of being merged. Batch boundaries are forced by running
    sequential AvailableNow drains against the same checkpoint,
    appending one file between runs."""
    import pandas as pd

    from guackg.streaming import stream_stateful_sessions

    events_dir = str(tmp_path_factory.mktemp("ooo_events"))
    out_dir = str(tmp_path_factory.mktemp("ooo_out"))

    def write_batch(name, rows):
        # µs precision: Spark cannot read parquet TIMESTAMP(NANOS)
        pd.DataFrame(rows, columns=["user_id", "ts"]).astype(
            {"user_id": "int64"}).assign(
            ts=lambda d: pd.to_datetime(d["ts"], unit="s")
            .astype("datetime64[us]")) \
            .to_parquet(os.path.join(events_dir, name))

    # gap = 30 min = 1800 s; watermark delay = 2 h = 7200 s
    # batch 1: u1 {5000, 5500}, u2 {6000}, u9 {10000} (watermark driver)
    # → watermark after batch 1 = 10000 - 7200 = 2800
    write_batch("b1.parquet", [(1, 5000), (1, 5500), (2, 6000), (9, 10000)])
    q = stream_stateful_sessions(spark, events_dir, out_dir)
    q.awaitTermination(300)

    # batch 2 (all ≥ watermark 2800, all OLDER than pending sessions):
    # u1 ← 4000 ∈ [5000-1800, 5000): lowers session_start (case a)
    # u2 ← 3100 < 6000-1800: separate earlier session (case b)
    write_batch("b2.parquet", [(1, 4000), (2, 3100)])
    q = stream_stateful_sessions(spark, events_dir, out_dir)
    q.awaitTermination(300)

    # flush: far-future event per user pushes the watermark past every
    # pending end+gap
    write_batch("b3.parquet", [(1, 10**6), (2, 10**6), (9, 10**6)])
    q = stream_stateful_sessions(spark, events_dir, out_dir)
    q.awaitTermination(300)
    # one more drain so the advanced watermark (from b3) is applied
    write_batch("b4.parquet", [(9, 10**6 + 1)])
    q = stream_stateful_sessions(spark, events_dir, out_dir)
    q.awaitTermination(300)

    def t(sec):
        return pd.Timestamp(sec, unit="s")

    got = {(r.user_id, r.session_start, r.session_end, r.n_events)
           for r in spark.read.parquet(
               os.path.join(out_dir, "sessions")).collect()
           if r.session_start < t(10**6)}
    want = {
        (1, t(4000), t(5500), 3),   # start lowered by the late 4000
        (2, t(3100), t(3100), 1),   # own earlier session, NOT merged
        (2, t(6000), t(6000), 1),
        (9, t(10000), t(10000), 1),
    }
    assert got == want


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


def test_stream_upsert_sink_prunes_buckets(spark, pages_df,
                                           tmp_path_factory):
    """Round-2 verdict finding #1: the streaming sink is partitioned
    by a url-hash bucket, so an incremental micro-batch rewrites ONLY
    the buckets containing its urls — every other bucket directory
    stays byte-identical on disk (O(delta) per batch, not O(table))."""
    import hashlib

    import pyspark.sql.functions as F

    from guackg.streaming import stream_triples_upsert

    src = str(tmp_path_factory.mktemp("pb_src"))
    wd = str(tmp_path_factory.mktemp("pb_wd"))
    first = pages_df.limit(150)
    first.write.mode("overwrite").parquet(src)
    q = stream_triples_upsert(spark, src, wd)
    q.awaitTermination(300)

    table = os.path.join(wd, "triples_upsert")

    def snapshot():
        snap = {}
        for d in os.listdir(table):
            if not d.startswith("bucket="):
                continue
            pf = {}
            for f in os.listdir(os.path.join(table, d)):
                with open(os.path.join(table, d, f), "rb") as fh:
                    pf[f] = hashlib.sha256(fh.read()).hexdigest()
            snap[d] = pf
        return snap

    before = snapshot()
    assert len(before) > 4

    # increment: a handful of NEW urls → only their buckets rewrite
    extra = pages_df.join(first.select("url"), on="url", how="left_anti") \
        .limit(6)
    touched = {r[0] for r in extra.select(
        F.pmod(F.xxhash64("url"), F.lit(64))).collect()}
    extra.write.mode("append").parquet(src)
    q2 = stream_triples_upsert(spark, src, wd)  # same checkpoint: delta only
    q2.awaitTermination(300)
    after = snapshot()

    untouched = [d for d in before
                 if int(d.split("=")[1]) not in touched]
    assert untouched, "test needs at least one untouched bucket"
    for d in untouched:
        assert after[d] == before[d], f"untouched {d} was rewritten"


def test_resolve_source_spec_merges_entrypoint_kwargs(spark):
    """An explicit source_spec must not silently drop the entry
    point's own kwargs: source_spec + max_files_per_trigger=N is the
    bounded queue-consumer drain, not one giant micro-batch. Spec keys
    win (deploy-time source of truth); absent keys fill from kwargs."""
    from guackg.streaming import _resolve_source_spec
    spec = {"format": "parquet", "path": "/x", "schema": "url string"}
    got = _resolve_source_spec(spark, None, spec,
                               max_files_per_trigger=7)
    assert got["max_files_per_trigger"] == 7
    assert got["schema"] == "url string"
    # a spec that sets the key itself is untouched
    spec2 = dict(spec, max_files_per_trigger=3)
    got2 = _resolve_source_spec(spark, None, spec2,
                                max_files_per_trigger=7)
    assert got2["max_files_per_trigger"] == 3
    # the caller's dict is never mutated
    assert "max_files_per_trigger" not in spec
