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
):
    """Incremental pages → triples stream. Returns the StreamingQuery
    (caller awaits termination; AvailableNow stops at end of input)."""
    if schema is None:
        schema = spark.read.parquet(pages_dir).schema
    checkpoint_dir = checkpoint_dir or os.path.join(out_dir, "_checkpoint")

    stream = (spark.readStream.schema(schema).parquet(pages_dir))
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
