"""Skew-hardened aggregation ops: the salted two-stage patterns must
be EXACT (same result as the unsalted plan) on skewed data."""

import pytest
from pyspark.sql import functions as F

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def skewed(spark):
    """Zipf-ish: key 'hot' owns ~80% of rows with many dup values."""
    hot = spark.range(0, 4000).select(
        F.lit("hot").alias("k"),
        (F.col("id") % 97).alias("v"),
        F.col("id").cast("double").alias("ord"))
    cold = spark.range(0, 500).select(
        F.concat(F.lit("cold"), (F.col("id") % 25)).alias("k"),
        (F.col("id") % 13).alias("v"),
        (F.col("id") * 2).cast("double").alias("ord"))
    return hot.unionByName(cold)


def test_salted_distinct_count_exact(skewed):
    from guackg.ops.skew import salted_distinct_count
    got = {(r.k, r.n_distinct) for r in
           salted_distinct_count(skewed, ["k"], "v", buckets=8).collect()}
    want = {(r.k, r.n) for r in
            skewed.groupBy("k")
            .agg(F.count_distinct("v").alias("n")).collect()}
    assert got == want
    assert ("hot", 97) in got


def test_salted_top_values_exact(skewed):
    from guackg.ops.skew import salted_top_values
    got = {(r.k, r.v, r.rank) for r in
           salted_top_values(skewed, ["k"], "v", "ord", n=3,
                             buckets=8).select("k", "v", "rank").collect()}
    from pyspark.sql import Window
    w = Window.partitionBy("k").orderBy(F.desc("ord"), F.asc("v"))
    want = {(r.k, r.v, r.rank) for r in
            skewed.withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= 3).select("k", "v", "rank").collect()}
    assert got == want


def test_head_entity_stats(spark):
    from guackg.ops.skew import head_entity_stats
    edges = spark.createDataFrame(
        [("a", "p1", "x")] * 5 + [("b", "p1", "x")] * 2
        + [("c", "p2", "y")],
        "subj_key string, pred string, obj_key string")
    top = head_entity_stats(edges, top=1)
    got = {(r.pred, r.subj_key, r.n) for r in top.collect()}
    assert got == {("p1", "a", 5), ("p2", "c", 1)}
