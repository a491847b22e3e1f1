"""Stage 4 tests: large-star/small-star connected components —
chains (multi-hop convergence), the 100-alias star (skew), exact
agreement with the union-find golden fixture, and exact agreement
between the distributed star path and the driver fast path."""

import pytest
from pyspark.sql import functions as F

from guackg.cc import canonicalize_keys, connected_components

# 0 forces the distributed large-star/small-star path even on tiny
# test graphs; default exercises the driver union-find fast path.
BOTH_PATHS = pytest.mark.parametrize("driver_max", [0, 1_000_000],
                                     ids=["stars", "driver-uf"])


@BOTH_PATHS
def test_chain_converges(spark, driver_max):
    edges = spark.createDataFrame(
        [("a", "b"), ("b", "c"), ("c", "d"), ("d", "e"), ("e", "f"),
         ("f", "g"), ("g", "h")], "key_a string, key_b string")
    comp = connected_components(edges, driver_max_edges=driver_max)
    got = {r.member_key: r.canon_key for r in comp.collect()}
    assert got == {k: "a" for k in "abcdefgh"}


@BOTH_PATHS
def test_two_components_and_star(spark, driver_max):
    rows = [("x1", "x2"), ("x2", "x3")]
    rows += [("hub", f"leaf{i:03d}") for i in range(100)]
    edges = spark.createDataFrame(rows, "key_a string, key_b string")
    comp = connected_components(edges, driver_max_edges=driver_max)
    got = {r.member_key: r.canon_key for r in comp.collect()}
    assert got["x3"] == "x1" and got["x2"] == "x1"
    assert got["leaf099"] == "hub"
    assert len({v for k, v in got.items() if k.startswith("leaf")}) == 1


def test_matches_golden_components(spark, corpus):
    """Distributed CC must agree exactly with the generation-time
    union-find over alias dict + typos + assertion chains."""
    ctx_edges = []
    for r in corpus["alias_dict"].itertuples():
        ctx_edges.append(("sfc:" + r.surface, r.canonical_key))
    from guackg.testing.gen import get_ctx, surface_key
    ctx = get_ctx()
    for t in ctx.typo_by_ent.values():
        ctx_edges.append((surface_key(t["surface"]), t["canonical_key"]))
    ctx_edges += list(map(tuple, corpus["assertions"].itertuples(index=False)))

    edges = spark.createDataFrame(ctx_edges, "key_a string, key_b string")
    for driver_max in (0, 1_000_000):  # star path AND driver fast path
        comp = connected_components(edges, driver_max_edges=driver_max)
        got = {r.member_key: r.canon_key for r in comp.collect()}
        want = {r.member_key: r.canon_key
                for r in corpus["golden_components"].itertuples()}
        assert got == want


def test_canonicalize_keys_rewrites_and_passes_through(spark):
    comp = spark.createDataFrame([("b", "a")], "member_key string, canon_key string")
    df = spark.createDataFrame([("b",), ("z",)], "k string")
    out = canonicalize_keys(df, "k", comp)
    assert sorted(r.k for r in out.collect()) == ["a", "z"]
