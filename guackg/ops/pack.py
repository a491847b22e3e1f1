"""Sequence packing for LLM pretraining data: lay documents out as
one concatenated token stream in deterministic doc_id order and cut
it into fixed-capacity training sequences (the GPT-style
concat-and-chunk layout; docs straddle sequence boundaries). The
final physical-layout op after cleaning/dedup/decontamination.

The core is a DISTRIBUTED PREFIX SUM — the piece Spark has no
built-in for at scale. A bare `sum() over (order by doc_id)` window
collapses the whole table into ONE task (Catalyst warns
WindowExec-without-partitioning); instead this is the textbook
two-phase scan:

  1. range-repartition by doc_id, pin partition ids
     (localCheckpoint — both consumer jobs must see one layout),
  2. per-partition token subtotals → collect O(P) rows (partition
     COUNT, not data) → exclusive per-partition offsets, broadcast
     back,
  3. partition-local window (sorted within partition only) + the
     partition offset = the global exclusive prefix sum.

Everything else is narrow built-in expressions. Exact DuckDB parity
(the single-threaded window oracle) in tests/test_pack.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def _with_start(docs: DataFrame, token_col: str,
                partitions: int) -> DataFrame:
    """(input columns…, start_token): global exclusive prefix sum of
    token_col in doc_id order, via the two-phase scan."""
    part = (docs.repartitionByRange(partitions, "doc_id")
            .withColumn("_pid", F.spark_partition_id())
            .localCheckpoint())  # pin: subtotal job + final job must
    #                              read the SAME pid assignment
    subtotals = (part.groupBy("_pid")
                 .agg(F.sum(token_col).alias("_sub"))
                 .collect())  # O(#partitions) rows — metadata, not data
    offsets = {}
    acc = 0
    for row in sorted(subtotals, key=lambda r: r._pid):
        offsets[row._pid] = acc
        acc += row._sub or 0
    if offsets:
        off = F.create_map(
            *[F.lit(x) for kv in offsets.items() for x in kv])
        base = off[F.col("_pid")]
    else:  # empty input: no rows, but the plan must still resolve
        base = F.lit(0)
    w = Window.partitionBy("_pid").orderBy("doc_id") \
        .rowsBetween(Window.unboundedPreceding, -1)
    return (part
            .withColumn("_local", F.coalesce(
                F.sum(token_col).over(w), F.lit(0)))
            .withColumn("start_token",
                        (base + F.col("_local")).cast("long"))
            .drop("_pid", "_local"))


def pack_sequences(docs: DataFrame, capacity: int,
                   token_col: str = "n_tokens",
                   partitions: int = 32) -> DataFrame:
    """Per-document placement in the packed stream: (doc_id,
    n_tokens, start_token, seq_id, seq_offset), where seq_id/
    seq_offset locate the doc's FIRST token (seq_id = start_token div
    capacity). Zero-token docs keep a row (their start is where their
    zero-length span sits), as do NULL- and negative-count docs:
    both clamp to 0 tokens (textstats.token_counts reports NULL for
    NULL text — the quarantine convention; an unchecked negative
    would silently shift every later doc's placement and can make
    seq_offset negative). Deterministic for a fixed corpus."""
    if capacity <= 0:
        raise ValueError(f"capacity must be positive, got {capacity}")
    clamped = docs.select(
        "doc_id",
        F.greatest(F.lit(0), F.coalesce(
            F.col(token_col).cast("long"), F.lit(0))).alias(token_col))
    s = _with_start(clamped, token_col, partitions)
    return (s.select(
        "doc_id",
        F.col(token_col).cast("long").alias("n_tokens"),
        "start_token",
        # integer `div`, not `/`: double division loses exactness
        # above 2^53 cumulative tokens (reachable for a pretraining-
        # scale corpus) and would disagree with the exact `%` below
        F.expr(f"start_token div {int(capacity)}").alias("seq_id"),
        (F.col("start_token") % capacity).alias("seq_offset")))


def pack_manifest(docs: DataFrame, capacity: int,
                  token_col: str = "n_tokens",
                  partitions: int = 32) -> DataFrame:
    """The loader-side artifact: one row per (seq_id, doc_id) span —
    (seq_id, doc_id, seq_offset, doc_offset, n_tok_span) — covering
    every training sequence exactly; docs straddling a boundary emit
    one span per sequence touched. Zero-token docs emit no spans.
    The explode is keyed by doc (a doc spanning k sequences emits k
    rows), so no skew beyond a single giant document."""
    placed = pack_sequences(docs, capacity, token_col, partitions)
    end_seq = F.expr(
        f"(start_token + n_tokens - 1) div {int(capacity)}")
    spans = (placed.filter(F.col("n_tokens") > 0)
             .withColumn("_seq", F.explode(
                 F.sequence(F.col("seq_id"), end_seq))))
    seq_start = F.col("_seq") * capacity
    span_from = F.greatest(F.lit(0), seq_start - F.col("start_token"))
    span_to = F.least(F.col("n_tokens"),
                      seq_start + capacity - F.col("start_token"))
    return (spans.select(
        F.col("_seq").alias("seq_id"),
        "doc_id",
        F.greatest(F.lit(0),
                   F.col("start_token") - seq_start).alias("seq_offset"),
        span_from.cast("long").alias("doc_offset"),
        (span_to - span_from).cast("long").alias("n_tok_span")))
