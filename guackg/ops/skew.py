"""Skew-hardened aggregation patterns (SURVEY §4 custom-work #1).

The reference never faces key skew — one process, one mutex
(/root/reference/pkg/assembler/backends/inmem/backend.go:73-106). At
10^12 documents, head entities ("united states") and mega-domains
make single hot reduce keys. Algebraic aggs (count/sum/min/max) are
already safe: Spark's partial aggregation (map-side combine) absorbs
the skew before the shuffle. The patterns here cover what partial
aggregation can NOT fix:

- `salted_distinct_count` — COUNT(DISTINCT v) GROUP BY k. A plain
  distinct-count shuffles every (k, v) pair to k's single reducer.
  Salting by hash(v) % B splits each hot key into B buckets; because
  the salt is a pure function of the VALUE, each distinct value lands
  in exactly one bucket, so per-bucket distinct counts SUM to the
  exact total — two shuffles, none hot.
- `salted_top_values` — collect the top-n values per key (holistic,
  collect_list-shaped). Stage 1 ranks within (k, salt) buckets and
  keeps n per bucket (bounded state per reducer); stage 2 re-ranks
  the B·n survivors per key. Exact for top-n because a value in the
  global top-n of k is necessarily in the top-n of its bucket.

Both are exact, deterministic, and pure built-in expressions.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

DEFAULT_BUCKETS = 32


def salted_distinct_count(df: DataFrame, key_cols: list[str],
                          value_col: str,
                          buckets: int = DEFAULT_BUCKETS) -> DataFrame:
    """Exact COUNT(DISTINCT value) per key, skew-safe: value-derived
    salt partitions the distinct space, so bucket counts add up."""
    salt = F.pmod(F.xxhash64(F.col(value_col)), F.lit(buckets))
    per_bucket = (df
                  .groupBy(*key_cols, salt.alias("_salt"))
                  .agg(F.count_distinct(F.col(value_col)).alias("_d")))
    return (per_bucket.groupBy(*key_cols)
            .agg(F.sum("_d").alias("n_distinct")))


def salted_top_values(df: DataFrame, key_cols: list[str],
                      value_col: str, order_col: str, n: int = 3,
                      buckets: int = DEFAULT_BUCKETS) -> DataFrame:
    """Exact top-n values per key by order_col (desc), skew-safe:
    bucket-local top-n first (each reducer sees ≤ 1/B of a hot key),
    then a final top-n over B·n survivors per key."""
    salt = F.pmod(F.xxhash64(F.col(value_col)), F.lit(buckets))
    w1 = Window.partitionBy(*key_cols, "_salt") \
        .orderBy(F.desc(order_col), F.asc(value_col))
    survivors = (df.withColumn("_salt", salt)
                 .withColumn("_rn", F.row_number().over(w1))
                 .filter(F.col("_rn") <= n)
                 .drop("_rn", "_salt"))
    w2 = Window.partitionBy(*key_cols) \
        .orderBy(F.desc(order_col), F.asc(value_col))
    return (survivors.withColumn("rank", F.row_number().over(w2))
            .filter(F.col("rank") <= n))


def salted_collect_sorted(df: DataFrame, key_cols: list[str],
                          item_col: F.Column | str,
                          buckets: int = DEFAULT_BUCKETS) -> DataFrame:
    """Exact sorted collect_list per key, skew-safe — the holistic
    nested aggregation the reference's scorecard parser builds (one
    row per subject carrying the full ordered check list,
    /root/reference/pkg/ingestor/parser/scorecard/
    parser_scorecard.go; SURVEY A4).

    collect_list gets NO size reduction from partial aggregation, so
    a hot key's whole value set lands on one reducer. Two stages fix
    the reducer's working set: (1) collect within (key, salt) buckets
    — each reducer holds ≤1/B of a hot key — then (2) merge the B
    pre-sorted bucket arrays per key. The final per-key array is the
    same size either way (that's the semantics), but stage 1's
    shuffle and memory spikes are flattened.

    Output: (key_cols…, items array<item>, n_items), items sorted
    ascending — deterministic regardless of input partitioning."""
    item = F.col(item_col) if isinstance(item_col, str) else item_col
    per_bucket = (df
                  .withColumn("_item", item)
                  .withColumn("_salt",
                              F.pmod(F.xxhash64(F.col("_item")),
                                     F.lit(buckets)))
                  .groupBy(*key_cols, "_salt")
                  .agg(F.sort_array(F.collect_list("_item"))
                       .alias("_bucket_items")))
    return (per_bucket.groupBy(*key_cols)
            .agg(F.sort_array(F.flatten(F.collect_list("_bucket_items")))
                 .alias("items"))
            .withColumn("n_items", F.size("items")))


def head_entity_stats(edges: DataFrame, key_col: str = "subj_key",
                      top: int = 20) -> DataFrame:
    """Diagnostic: the heaviest keys per predicate with their edge
    counts — the 'is salting needed here' probe (window top-k,
    SURVEY §2.7)."""
    counts = edges.groupBy("pred", key_col).agg(F.count("*").alias("n"))
    w = Window.partitionBy("pred").orderBy(F.desc("n"), F.asc(key_col))
    return (counts.withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= top))
