"""As-of join: golden semantics on a hand-built timeline — backward
match, equal-ts inclusion, no-match nulls, and tolerance cutoff."""

from datetime import datetime

from guackg.ops.asof import asof_join


def _ts(s):
    return datetime(2024, 1, 1, 0, 0, s)


def test_asof_backward_semantics(spark):
    left = spark.createDataFrame(
        [("u1", _ts(10), "L1"), ("u1", _ts(20), "L2"),
         ("u1", _ts(5), "L0"),   # before any right row → null
         ("u2", _ts(30), "L3")], # equal-ts right row → matches
        "user string, ts timestamp, lid string")
    right = spark.createDataFrame(
        [("u1", _ts(8), 1.0), ("u1", _ts(15), 2.0),
         ("u2", _ts(30), 9.0)],
        "user string, ts timestamp, val double")

    out = asof_join(left, right, on="user", value_cols=["val"])
    got = {r.lid: (r.asof_val, r.asof_ts) for r in out.collect()}
    assert got["L0"] == (None, None)
    assert got["L1"] == (1.0, _ts(8))     # latest ≤ 10 is 8
    assert got["L2"] == (2.0, _ts(15))    # latest ≤ 20 is 15
    assert got["L3"] == (9.0, _ts(30))    # equal ts matches


def test_asof_tolerance(spark):
    left = spark.createDataFrame(
        [("u1", _ts(30), "L1")], "user string, ts timestamp, lid string")
    right = spark.createDataFrame(
        [("u1", _ts(5), 1.0)], "user string, ts timestamp, val double")
    wide = asof_join(left, right, on="user", value_cols=["val"])
    assert wide.collect()[0].asof_val == 1.0
    tight = asof_join(left, right, on="user", value_cols=["val"],
                      tolerance_seconds=10)
    assert tight.collect()[0].asof_val is None  # 25s gap > 10s tolerance


def test_asof_no_row_python(spark):
    left = spark.createDataFrame(
        [("u1", _ts(10), "L1")], "user string, ts timestamp, lid string")
    right = spark.createDataFrame(
        [("u1", _ts(8), 1.0)], "user string, ts timestamp, val double")
    plan = asof_join(left, right, on="user", value_cols=["val"]) \
        ._jdf.queryExecution().executedPlan().toString()
    assert "EvalPython" not in plan

def test_asof_null_right_timestamp_never_matches(spark):
    """A right row with a NULL timestamp is not 'at or before'
    anything: unfiltered it sorts nulls-first and would attach to
    every left row (the DuckDB ASOF JOIN returns no match)."""
    import datetime
    from guackg.ops.asof import asof_join
    ts = lambda m: datetime.datetime(2025, 1, 1, 0, m, 0)
    left = spark.createDataFrame([("k", ts(5))], "id string, ts timestamp")
    right = spark.createDataFrame(
        [("k", None, 9), ("k", ts(10), 1)],
        "id string, ts timestamp, v int")
    rows = asof_join(left, right, on="id").collect()
    assert len(rows) == 1
    assert rows[0].asof_v is None and rows[0].asof_ts is None
