"""As-of (point-in-time) join — an operator family Spark lacks as a
builtin, composed from union + ordered window (the standard Spark
formulation; DuckDB's native ASOF JOIN is the oracle).

Semantics (backward as-of, the default everywhere): for each left row,
attach the LATEST right row with the same key whose timestamp is ≤ the
left row's timestamp (ties: the equal-timestamp right row matches).
The reference's closest shape is the version-range match — pairing a
reference against the best matching version
(/root/reference/pkg/misc/depversion/depversion.go:43-91) — a
non-equi theta join resolved by ordering rather than equality.

Scale shape: ONE shuffle of (key, ts)-sorted union, one window pass —
no range cross-product, no per-row Python. Key skew follows the
window's partitioning; a mega-key is bounded by the window being a
single ordered scan per key (no quadratic blowup).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(left: DataFrame, right: DataFrame, on: str,
              left_ts: str = "ts", right_ts: str = "ts",
              value_cols: list[str] | None = None,
              tolerance_seconds: int | None = None) -> DataFrame:
    """Backward as-of join. Returns every left row plus, for each of
    `value_cols` from the right side, the value of the latest right
    row at-or-before the left row's timestamp (null if none, or none
    within `tolerance_seconds`)."""
    if value_cols is None:
        value_cols = [c for c in right.columns if c not in (on, right_ts)]

    # ONE struct per right row: a single last(ignorenulls) fill below
    # means every attached column comes from the SAME right row —
    # per-column fills would mix columns across right rows whenever a
    # newer right row has a null in one value column.
    # NULL-timestamp right rows can never be "at or before" anything —
    # unfiltered they sort nulls-FIRST and would attach to every left
    # row (the DuckDB ASOF JOIN oracle returns no match for them)
    r_marked = right.filter(F.col(right_ts).isNotNull()).select(
        F.col(on), F.col(right_ts).alias("_ts"), F.lit(0).alias("_side"),
        F.struct(*([F.col(c) for c in value_cols]
                   + [F.col(right_ts).alias("_rts")])).alias("_r"),
    )
    l_marked = left.select(
        F.col(on), F.col(left_ts).alias("_ts"), F.lit(1).alias("_side"),
        F.lit(None).cast(r_marked.schema["_r"].dataType).alias("_r"),
        F.struct(*[F.col(c) for c in left.columns]).alias("_l"),
    )
    r_marked = r_marked.withColumn(
        "_l", F.lit(None).cast(l_marked.schema["_l"].dataType))
    # right rows sort BEFORE left rows at equal ts ⇒ equal-ts match
    u = l_marked.unionByName(r_marked)
    w = Window.partitionBy(on).orderBy("_ts", "_side") \
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    filled = u.select(
        on, "_ts", "_side", "_l",
        F.last("_r", ignorenulls=True).over(w).alias("_r"),
    ).filter(F.col("_side") == 1).select(
        on, "_ts", "_l",
        *[F.col(f"_r.{c}").alias(f"_r_{c}") for c in value_cols],
        F.col("_r._rts").alias("_r_ts"),
    )

    if tolerance_seconds is not None:
        in_tol = (F.col("_r_ts").isNotNull()
                  & (F.col("_ts").cast("long") - F.col("_r_ts").cast("long")
                     <= tolerance_seconds))
        filled = filled.select(
            on, "_ts", "_l",
            *[F.when(in_tol, F.col(f"_r_{c}")).alias(f"_r_{c}")
              for c in value_cols],
            F.when(in_tol, F.col("_r_ts")).alias("_r_ts"))

    out_left = [F.col(f"_l.{c}").alias(c) for c in
                filled.select("_l.*").columns]
    return filled.select(
        *out_left,
        *[F.col(f"_r_{c}").alias(f"asof_{c}") for c in value_cols],
        F.col("_r_ts").alias("asof_ts"),
    )
