"""Relational operator battery over the driver's TPC-H-ish tables.

Each function maps 1:1 to an operator family from SURVEY.md §2 and has
an exact DuckDB oracle in __spark_entry__.oracle_sql(). These prove
the engine's scan/filter/join/agg/window/set-op surface — the query
side guac answers through GraphQL resolvers and backlink scans
(/root/reference/pkg/assembler/backends/inmem/) — expressed as
declarative DataFrame plans that Catalyst optimizes (broadcast joins,
pushed filters, partial aggregation).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F


def load(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


# --- aggregations (A1 analog: group-by with algebraic aggs) ---------------

def pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1 shape: scan + filter + groupBy with partial aggregation
    (map-side combine absorbs key skew, SURVEY §2.6 A1)."""
    li = load(spark, sf_dir, "lineitem")
    return (li.filter(F.col("l_shipdate") <= F.to_timestamp(F.lit("1998-09-02")))
            .groupBy("l_returnflag", "l_linestatus")
            .agg(F.sum("l_quantity").alias("sum_qty"),
                 F.sum("l_extendedprice").alias("sum_base_price"),
                 F.round(F.sum(F.col("l_extendedprice")
                               * (1 - F.col("l_discount"))), 4)
                 .alias("sum_disc_price"),
                 F.round(F.avg("l_quantity"), 6).alias("avg_qty"),
                 F.round(F.avg("l_discount"), 6).alias("avg_disc"),
                 F.count("*").alias("count_order"))
            .orderBy("l_returnflag", "l_linestatus"))


def order_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROLLUP over (o_orderpriority, o_orderstatus) — grouping-sets
    family."""
    o = load(spark, sf_dir, "orders")
    return (o.rollup("o_orderpriority", "o_orderstatus")
            .agg(F.count("*").alias("n_orders"),
                 F.round(F.sum("o_totalprice"), 4).alias("total_price"))
            .orderBy(F.col("o_orderpriority").asc_nulls_first(),
                     F.col("o_orderstatus").asc_nulls_first()))


# --- joins (J1/J2/J5 analogs) ----------------------------------------------

def shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q3 shape: 3-way join + agg + top-k. The customer dim is
    broadcast (small side), lineitem streams."""
    c = load(spark, sf_dir, "customer").filter(
        F.col("c_mktsegment") == "BUILDING")
    o = load(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") < F.to_timestamp(F.lit("1995-03-15")))
    li = load(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") > F.to_timestamp(F.lit("1995-03-15")))
    return (li.join(o, li.l_orderkey == o.o_orderkey)
            .join(F.broadcast(c), o.o_custkey == c.c_custkey)
            .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
            .agg(F.round(F.sum(F.col("l_extendedprice")
                               * (1 - F.col("l_discount"))), 4)
                 .alias("revenue"))
            .orderBy(F.desc("revenue"), "o_orderdate", "l_orderkey")
            .limit(10))


def local_supplier_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q5 shape: 6-way star join with two broadcast dims —
    the enrichment-join pattern (deps.dev/osv broadcast dictionary,
    SURVEY §2.5 J5)."""
    c = load(spark, sf_dir, "customer")
    o = load(spark, sf_dir, "orders")
    li = load(spark, sf_dir, "lineitem")
    s = load(spark, sf_dir, "supplier")
    n = load(spark, sf_dir, "nation")
    r = load(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    return (li.join(o, li.l_orderkey == o.o_orderkey)
            .join(c, (o.o_custkey == c.c_custkey))
            .join(s, (li.l_suppkey == s.s_suppkey)
                  & (c.c_nationkey == s.s_nationkey))
            .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
            .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
            .groupBy("n_name")
            .agg(F.round(F.sum(F.col("l_extendedprice")
                               * (1 - F.col("l_discount"))), 4)
                 .alias("revenue"))
            .orderBy(F.desc("revenue"), "n_name"))


def customers_without_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left-anti join — guac's 'packages without recent CertifyVuln'
    re-scan filter (root_package.go:127-184), the idempotent
    only-process-new-work pattern."""
    c = load(spark, sf_dir, "customer")
    o = load(spark, sf_dir, "orders")
    return (c.join(o, c.c_custkey == o.o_custkey, "left_anti")
            .select("c_custkey", "c_name")
            .orderBy("c_custkey"))


def suppliers_in_nation_with_orders(spark: SparkSession,
                                    sf_dir: str) -> DataFrame:
    """Left-semi join (set membership — the visited-set/checkedPurls
    dedup shape, SURVEY §2.8)."""
    s = load(spark, sf_dir, "supplier")
    li = load(spark, sf_dir, "lineitem")
    return (s.join(li, s.s_suppkey == li.l_suppkey, "left_semi")
            .select("s_suppkey", "s_name")
            .orderBy("s_suppkey"))


# --- windows / top-k (SURVEY §2.7) -----------------------------------------

def top_customers_per_nation(spark: SparkSession, sf_dir: str,
                             k: int = 3) -> DataFrame:
    """row_number() over (partition by nation order by spend desc) —
    the head-entity diagnostic window."""
    c = load(spark, sf_dir, "customer")
    o = load(spark, sf_dir, "orders")
    spend = (o.join(c, o.o_custkey == c.c_custkey)
             .groupBy("c_nationkey", "c_custkey", "c_name")
             .agg(F.round(F.sum("o_totalprice"), 4).alias("spend")))
    w = Window.partitionBy("c_nationkey").orderBy(F.desc("spend"),
                                                  F.asc("c_custkey"))
    return (spend.withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= k)
            .select("c_nationkey", "c_custkey", "c_name", "spend", "rank")
            .orderBy("c_nationkey", "rank"))


def running_account_balance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cumulative window (running sum of event values per user) over
    the events table — ordered-state analytics."""
    e = load(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id") \
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    return (e.withColumn("running_value", F.round(F.sum("value").over(w), 4))
            .select("event_id", "user_id", "ts", "value", "running_value")
            .orderBy("user_id", "ts", "event_id")
            .limit(500))


# --- time / sessionization over events --------------------------------------

def events_tumbling_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tumbling 1-hour windowed counts per event_type (the batch view
    of the streaming agg in guackg.streaming)."""
    e = load(spark, sf_dir, "events")
    return (e.groupBy(F.date_trunc("hour", F.col("ts")).alias("hour"),
                      "event_type")
            .agg(F.count("*").alias("n_events"),
                 F.round(F.sum("value"), 4).alias("sum_value"))
            .orderBy("hour", "event_type"))


def event_sessionization(spark: SparkSession, sf_dir: str,
                         gap_minutes: int = 30) -> DataFrame:
    """Gap-based sessionization via lag + cumulative session ids —
    pure window functions (no per-row state)."""
    e = load(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    epoch = F.col("ts").cast("timestamp").cast("long")
    gap = epoch - F.lag(epoch).over(w)
    with_break = e.withColumn(
        "is_new", F.when(gap.isNull() | (gap > gap_minutes * 60), 1)
        .otherwise(0))
    sess = with_break.withColumn(
        "session_seq",
        F.sum("is_new").over(w.rowsBetween(Window.unboundedPreceding, 0)))
    return (sess.groupBy("user_id", "session_seq")
            .agg(F.count("*").alias("n_events"),
                 F.min("ts").alias("session_start"),
                 F.max("ts").alias("session_end"))
            .orderBy("user_id", "session_seq"))
