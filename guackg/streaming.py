"""Structured-Streaming ingestion — the deployment-mode analog.

The reference runs as a stream processor in production: NATS JetStream
durable consumers on subjects DOCUMENTS.collected/processed/parsed
(/root/reference/pkg/emitter/nats_emitter.go:31-42), polling
collectors (collector/file/file.go:105-118), and ack-based
at-least-once delivery made safe by idempotent upserts.

Spark translation: `readStream` over the pages directory with
`Trigger.AvailableNow` (process-everything-then-stop — the polling
file collector), the SAME extract/triples transformations as batch
(DataFrame code is shared verbatim), checkpointed to `checkpoint/`
(the durable-consumer offset), `foreachBatch` writing through the
idempotent sink. A killed stream resumes from the checkpoint without
reprocessing acked files — guac's durable-consumer semantics.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

from guackg.extract import extract, split_quarantine
from guackg.triples import extract_triples


def stream_pages_to_triples(
    spark: SparkSession,
    pages_dir: str,
    out_dir: str,
    checkpoint_dir: str | None = None,
    schema=None,
    max_files_per_trigger: int | None = None,
):
    """Incremental pages → triples stream. Returns the StreamingQuery
    (caller awaits termination; AvailableNow stops at end of input).

    `max_files_per_trigger` is the S4 queue-consumer mode: the drain
    proceeds in bounded micro-batches of ≤ N source files each, with a
    checkpoint commit per batch — the backpressure/ack-granularity
    semantics of the reference's NATS pull consumer (each micro-batch
    is an acked message group; a kill mid-drain loses at most one
    uncommitted batch, and resume re-reads only that). Unset = one
    batch for the whole backlog (the plain polling collector)."""
    if schema is None:
        schema = spark.read.parquet(pages_dir).schema
    checkpoint_dir = checkpoint_dir or os.path.join(out_dir, "_checkpoint")

    reader = spark.readStream.schema(schema)
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    stream = reader.parquet(pages_dir)
    ok, _bad = split_quarantine(extract(stream))
    triples = extract_triples(
        ok.select("url", "warc_ts", "lang", "extracted_text"))

    return (triples.writeStream
            .format("parquet")
            .option("path", os.path.join(out_dir, "triples_stream"))
            .option("checkpointLocation", checkpoint_dir)
            .trigger(availableNow=True)
            .outputMode("append")
            .start())


def stream_windowed_mention_counts(
    spark: SparkSession,
    events_dir: str,
    out_dir: str,
    window_duration: str = "1 hour",
    watermark_delay: str = "2 hours",
    checkpoint_dir: str | None = None,
):
    """Watermarked tumbling-window aggregation over an event stream —
    the late-data-tolerant counterpart of the batch
    `events_tumbling_counts` operator. A window emits (append mode)
    only once the watermark passes its end, i.e. once rows more than
    `watermark_delay` late can no longer change it; replaying the
    stream from the checkpoint emits no duplicates. (The reference
    needs no watermarks — its upserts are last-write-wins on identical
    keys, SURVEY §2.11 — but a web-crawl feed is not, so windows +
    watermark is the Spark-native answer.)

    Returns the StreamingQuery (AvailableNow: drains then stops)."""
    schema = spark.read.parquet(events_dir).schema
    checkpoint_dir = checkpoint_dir or os.path.join(out_dir, "_wm_checkpoint")

    from pyspark.sql import functions as F
    stream = spark.readStream.schema(schema).parquet(events_dir)
    # watermarks require TIMESTAMP (with tz); NTZ sources cast through
    # the UTC session zone losslessly
    stream = stream.withColumn("ts", F.col("ts").cast("timestamp"))
    agg = (stream
           .withWatermark("ts", watermark_delay)
           .groupBy(F.window("ts", window_duration).alias("win"),
                    "event_type")
           .agg(F.count("*").alias("n_events"),
                F.round(F.sum("value"), 4).alias("sum_value"))
           .select(F.col("win.start").alias("window_start"),
                   F.col("win.end").alias("window_end"),
                   "event_type", "n_events", "sum_value"))
    return (agg.writeStream
            .format("parquet")
            .option("path", os.path.join(out_dir, "windowed_counts"))
            .option("checkpointLocation", checkpoint_dir)
            .trigger(availableNow=True)
            .outputMode("append")
            .start())
