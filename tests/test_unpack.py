"""P7 recursive unpack: loop-until-empty over JSON envelopes
(processHelper recursion, process.go:115-168)."""

import json

from pyspark.sql import functions as F


def _env(children):
    return json.dumps({"children": children}, separators=(",", ":"))


def test_unpack_recursive_depths_and_malformed(spark):
    from guackg.ops.unpack import unpack_recursive
    rows = [
        # depth-3 nest
        (1, _env([_env([_env(["leaf-a", "leaf-b"]), "leaf-c"])])),
        # plain leaf at depth 0
        (2, "just text"),
        # malformed envelope: prefix matches, JSON broken → dropped,
        # never crashes, never mislabeled a leaf
        (3, '{"children": [unclosed'),
        # envelope whose child is itself malformed
        (4, _env(['{"children": broken', "leaf-d"])),
    ]
    docs = spark.createDataFrame(rows, ["root_id", "payload"])
    got = {(r.root_id, r.depth, r.payload)
           for r in unpack_recursive(docs).collect()}
    assert got == {
        (1, 3, "leaf-a"), (1, 3, "leaf-b"), (1, 2, "leaf-c"),
        (2, 0, "just text"),
        (4, 1, "leaf-d"),
    }


def test_unpack_recursive_depth_cap_excludes_residue(spark):
    from guackg.ops.unpack import unpack_recursive
    deep = "x"
    for _ in range(5):
        deep = _env([deep])
    docs = spark.createDataFrame([(1, deep), (2, "flat")],
                                 ["root_id", "payload"])
    # cap below the nesting depth: the residual envelope is excluded
    shallow = unpack_recursive(docs, max_depth=3).collect()
    assert {(r.root_id, r.payload) for r in shallow} == {(2, "flat")}
    full = unpack_recursive(docs, max_depth=10).collect()
    assert {(r.root_id, r.depth, r.payload) for r in full} == {
        (1, 5, "x"), (2, 0, "flat")}
