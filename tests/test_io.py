"""Sink semantics: multi-level partition-pruned merge_upsert — the
parquet stand-in for Iceberg MERGE INTO file pruning (io.py docstring).
The contract under test: an upsert delta rewrites ONLY the partition
directories whose (pred, bucket) tuples appear in the delta; every
other leaf directory stays BYTE-IDENTICAL (round-2 verdict findings
#1/#3 — O(delta) increments, never O(table))."""

import hashlib
import os

import pytest
from pyspark.sql import functions as F

from guackg import io as gio

N_BUCKETS = 8


def _bucketed(df):
    return df.withColumn("bucket",
                         F.pmod(F.xxhash64("k"), F.lit(N_BUCKETS)))


def _snapshot(table):
    """{relative leaf dir: {file: sha256}} over the partition tree."""
    snap = {}
    for root, _dirs, files in os.walk(table):
        rel = os.path.relpath(root, table)
        if "=" not in rel:
            continue
        pf = {}
        for f in files:
            with open(os.path.join(root, f), "rb") as fh:
                pf[f] = hashlib.sha256(fh.read()).hexdigest()
        snap[rel] = pf
    return snap


@pytest.fixture()
def base(spark, tmp_path):
    table = str(tmp_path / "edges_like")
    rows = [(f"k{i}", ["alpha", "beta"][i % 2], i) for i in range(200)]
    df = _bucketed(spark.createDataFrame(rows, "k string, pred string, v int"))
    gio.merge_upsert(spark, df, table, keys=["k", "pred"],
                     partition_by=["pred", "bucket"])
    return table, df


def test_two_level_merge_roundtrip(spark, base):
    table, df = base
    before = sorted((r.k, r.pred, r.v) for r in
                    spark.read.parquet(table).collect())
    assert len(before) == 200
    # re-upserting the identical frame keeps rows identical (replay)
    gio.merge_upsert(spark, df, table, keys=["k", "pred"],
                     partition_by=["pred", "bucket"])
    after = sorted((r.k, r.pred, r.v) for r in
                   spark.read.parquet(table).collect())
    assert after == before


def test_two_level_merge_prunes_to_touched_buckets(spark, base):
    """A 1-row delta must rewrite exactly its own (pred, bucket) leaf
    dir; all other leaf dirs stay byte-identical on disk."""
    table, _ = base
    before = _snapshot(table)
    assert len(before) > N_BUCKETS  # both preds × several buckets

    delta = _bucketed(spark.createDataFrame(
        [("k3", "beta", 999)], "k string, pred string, v int"))
    (tb,) = [r.bucket for r in delta.collect()]
    gio.merge_upsert(spark, delta, table, keys=["k", "pred"],
                     partition_by=["pred", "bucket"])
    after = _snapshot(table)

    touched = os.path.join("pred=beta", f"bucket={tb}")
    assert set(after) == set(before)
    for d in before:
        if d == touched or touched.startswith(d + os.sep) \
                or d.startswith(touched):
            continue
        assert after[d] == before[d], f"untouched dir {d} was rewritten"

    # and the merge itself is correct: the new row REPLACES the old
    # ("k3","beta") row (MERGE WHEN MATCHED UPDATE), count unchanged
    got = spark.read.parquet(table)
    assert got.count() == 200
    assert got.filter((F.col("k") == "k3") & (F.col("pred") == "beta")) \
        .select("v").collect() == [(999,)]


def test_single_level_merge_still_prunes(spark, tmp_path):
    """Regression: the original single-level path (nodes[kind]) keeps
    its untouched-partition byte-stability."""
    table = str(tmp_path / "nodes_like")
    rows = [(f"n{i}", ["person", "org", "place"][i % 3]) for i in range(60)]
    df = spark.createDataFrame(rows, "k string, kind string")
    gio.merge_upsert(spark, df, table, keys=["k"], partition_by=["kind"])
    before = _snapshot(table)

    delta = spark.createDataFrame([("n0", "person")], "k string, kind string")
    gio.merge_upsert(spark, delta, table, keys=["k"],
                     partition_by=["kind"])
    after = _snapshot(table)
    for d in before:
        if d.startswith("kind=person"):
            continue
        assert after[d] == before[d]
    assert spark.read.parquet(table).count() == 60


def test_fanout_preserves_pruning_and_rows(spark, tmp_path):
    """fanout>1 (multi-file dirs for write parallelism) must not
    change merge semantics: same rows, same pruning — untouched
    (pred, bucket) leaf dirs stay byte-identical across a delta."""
    table = str(tmp_path / "edges_fanout")
    rows = [(f"k{i}", ["alpha", "beta"][i % 2], i) for i in range(200)]
    df = _bucketed(spark.createDataFrame(rows, "k string, pred string, v int"))
    gio.merge_upsert(spark, df, table, keys=["k", "pred"],
                     partition_by=["pred", "bucket"], fanout=4)
    got = sorted((r.k, r.pred, r.v) for r in
                 spark.read.parquet(table).collect())
    assert got == sorted((r.k, r.pred, r.v) for r in df.collect())
    before = _snapshot(table)

    delta = _bucketed(spark.createDataFrame(
        [("k3", "beta", 999)], "k string, pred string, v int"))
    (tb,) = [r.bucket for r in delta.collect()]
    gio.merge_upsert(spark, delta, table, keys=["k", "pred"],
                     partition_by=["pred", "bucket"], fanout=4)
    after = _snapshot(table)
    touched = os.path.join("pred=beta", f"bucket={tb}")
    for d in before:
        if d == touched or touched.startswith(d + os.sep) \
                or d.startswith(touched):
            continue
        assert after[d] == before[d], f"untouched dir {d} was rewritten"
    got = spark.read.parquet(table)
    assert got.count() == 200
    assert got.filter((F.col("k") == "k3") & (F.col("pred") == "beta")) \
        .select("v").collect() == [(999,)]


def test_compact_table_folds_small_files(spark, tmp_path):
    """Maintenance compaction (io.compact_table, the rewrite_data_files
    analog): a fanout-written table's multi-file leaf dirs fold to one
    file per dir with rows identical, a second pass is a byte-stable
    no-op, and partition-pruned merges still work afterwards."""
    table = str(tmp_path / "fanout")
    rows = [(f"k{i}", ["alpha", "beta"][i % 2], i) for i in range(400)]
    df = _bucketed(spark.createDataFrame(rows, "k string, pred string, v int"))
    # explicit repartition(4): every task holds rows of every leaf dir,
    # so the dynamic-partition write leaves 4 files per dir (the fanout
    # state; an explicit count is never AQE-coalesced)
    gio.write_table(df.repartition(4), table,
                    partition_by=["pred", "bucket"])
    before_rows = sorted((r.k, r.pred, r.v) for r in
                         spark.read.parquet(table).collect())

    stats = gio.compact_table(spark, table, partition_by=["pred", "bucket"])
    assert stats["dirs_compacted"] > 0
    assert stats["files_after"] < stats["files_before"]
    parquet_per_leaf = {
        rel: [f for f in fs if f.endswith(".parquet")]
        for rel, fs in _snapshot(table).items() if "bucket=" in rel}
    assert all(len(fs) == 1 for fs in parquet_per_leaf.values()), \
        parquet_per_leaf
    after_rows = sorted((r.k, r.pred, r.v) for r in
                        spark.read.parquet(table).collect())
    assert after_rows == before_rows

    # idempotent: second pass touches nothing, bytes stable
    snap1 = _snapshot(table)
    stats2 = gio.compact_table(spark, table,
                               partition_by=["pred", "bucket"])
    assert stats2["dirs_compacted"] == 0
    assert _snapshot(table) == snap1

    # merges keep working on the compacted layout
    delta = _bucketed(spark.createDataFrame(
        [("k0", "alpha", 999)], "k string, pred string, v int"))
    gio.merge_upsert(spark, delta, table, keys=["k", "pred"],
                     partition_by=["pred", "bucket"])
    got = {(r.k, r.pred): r.v for r in spark.read.parquet(table).collect()}
    assert got[("k0", "alpha")] == 999 and len(got) == 400


def test_compact_table_unpartitioned_keeps_marker(spark, tmp_path):
    table = str(tmp_path / "flat")
    df = spark.range(100).selectExpr("id", "id * 2 as v").repartition(6)
    gio.write_table(df, table)
    assert gio.table_exists(table)
    stats = gio.compact_table(spark, table)
    assert stats["dirs_compacted"] == 1 and stats["files_after"] == 1
    assert gio.table_exists(table)
    assert spark.read.parquet(table).count() == 100
