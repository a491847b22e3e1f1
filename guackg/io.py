"""Sources & sinks.

The design target is Iceberg (`MERGE INTO` node/edge tables, snapshot
isolation, incremental scans between snapshots — the Spark analog of
guac's natural-key upserts + NATS durable consumers, SURVEY.md §2.11).
This sandbox has no Iceberg runtime jar, so the sink is a parquet
directory with the SAME observable semantics:

- `write_table`   — deterministic overwrite (stage outputs are pure
  functions of inputs, so overwrite == idempotent replay; this is the
  reference's "re-delivery is safe because upserts are idempotent"
  story, /root/reference/pkg/assembler/backends/inmem/pkg.go:344-434).
- `merge_upsert`  — read-modify-write keyed merge, new rows win
  (MERGE INTO … WHEN MATCHED UPDATE WHEN NOT MATCHED INSERT). On
  Iceberg this is a single `MERGE INTO` statement; the helper keeps
  call sites engine-agnostic.
- `read_table`    — plain scan; column pruning / predicate pushdown
  flow into the parquet reader via Catalyst.

All writes go through a tmp-dir + atomic rename so a killed job never
leaves a half-written table (poor man's snapshot commit).
"""

from __future__ import annotations

import os
import shutil
import uuid

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F


def table_exists(path: str) -> bool:
    return os.path.exists(os.path.join(path, "_SUCCESS"))


def read_table(spark: SparkSession, path: str) -> DataFrame:
    return spark.read.parquet(path)


def write_table(df: DataFrame, path: str,
                partition_by: list[str] | None = None) -> None:
    """Deterministic overwrite with atomic swap."""
    tmp = f"{path}.__tmp__{uuid.uuid4().hex[:8]}"
    w = df.write.mode("overwrite")
    if partition_by:
        w = w.partitionBy(*partition_by)
    w.parquet(tmp)
    if os.path.exists(path):
        shutil.rmtree(path)
    os.replace(tmp, path)


def merge_upsert(spark: SparkSession, df: DataFrame, path: str,
                 keys: list[str],
                 partition_by: list[str] | None = None) -> None:
    """Keyed upsert: incoming rows replace existing rows with the same
    key (guac's find-or-create trie upsert, pkg.go:344-434; on Iceberg:
    MERGE INTO target USING df ON keys WHEN MATCHED UPDATE * WHEN NOT
    MATCHED INSERT *)."""
    if not table_exists(path):
        # first write: callers supply key-unique frames (build_nodes /
        # build_edges end in a keyed dedup/agg) — skip the merge window
        write_table(df, path, partition_by)
        return
    new = df.withColumn("__prio", F.lit(0))
    old = read_table(spark, path).withColumn("__prio", F.lit(1))
    w = Window.partitionBy(*keys).orderBy("__prio")
    merged = (new.unionByName(old)
              .withColumn("__rn", F.row_number().over(w))
              .filter(F.col("__rn") == 1)
              .drop("__prio", "__rn"))
    write_table(merged, path, partition_by)
