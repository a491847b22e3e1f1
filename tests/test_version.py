"""Semver range-join tests (SURVEY J4, depversion.go:43-91 parity:
the reference's constraint table WhichVersionMatches cases for the
supported grammar subset)."""

from pyspark.sql import functions as F

from guackg.ops.version import version_range_join


def _join(spark, constraints, versions):
    deps = spark.createDataFrame(
        [("d%d" % i, "pkg", c) for i, c in enumerate(constraints)],
        "dep_id string, name string, constraint string")
    vers = spark.createDataFrame(
        [("pkg", v) for v in versions], "name string, version string")
    out = version_range_join(deps, vers)
    got: dict[str, set[str]] = {c: set() for c in constraints}
    for r in out.collect():
        got[r["constraint"]].add(r["version"])
    return got


def test_constraint_semantics(spark):
    versions = ["0.9.9", "1.2.2", "1.2.3", "1.2.9", "1.3.0", "1.9.9",
                "2.0.0", "2.1.0"]
    got = _join(spark, ["=1.2.3", "^1.2.3", "~1.2.3", ">=1.3.0",
                        "<1.2.3"], versions)
    assert got["=1.2.3"] == {"1.2.3"}
    # caret: >=1.2.3 <2.0.0
    assert got["^1.2.3"] == {"1.2.3", "1.2.9", "1.3.0", "1.9.9"}
    # tilde: >=1.2.3 <1.3.0
    assert got["~1.2.3"] == {"1.2.3", "1.2.9"}
    assert got[">=1.3.0"] == {"1.3.0", "1.9.9", "2.0.0", "2.1.0"}
    assert got["<1.2.3"] == {"0.9.9", "1.2.2"}


def test_unparseable_never_matches(spark):
    got = _join(spark, ["latest", ">=x.2.3"], ["1.0.0"])
    assert got["latest"] == set()
    assert got[">=x.2.3"] == set()
    # bad version strings are quarantined too
    got2 = _join(spark, [">=0.0.0"], ["1.0", "v2.0.0", "1.0.0"])
    assert got2[">=0.0.0"] == {"1.0.0"}


def test_name_scoping(spark):
    deps = spark.createDataFrame(
        [("d0", "left", ">=1.0.0")],
        "dep_id string, name string, constraint string")
    vers = spark.createDataFrame(
        [("left", "1.5.0"), ("right", "9.9.9")],
        "name string, version string")
    out = version_range_join(deps, vers).collect()
    assert [(r["name"], r["version"]) for r in out] == [("left", "1.5.0")]


def test_union_constraints(spark):
    """npm-style `||` unions (depversion.go:93-130): each branch joins
    independently; the result is the SET union (a version matching
    both branches appears once)."""
    got = _join(spark, ["~1.2.3 || >=2.0.0", "^1.0.0 || ^1.2.0",
                        "=0.9.9||=2.1.0"],
                ["0.9.9", "1.2.2", "1.2.3", "1.2.9", "1.3.0", "1.9.9",
                 "2.0.0", "2.1.0"])
    assert got["~1.2.3 || >=2.0.0"] == {"1.2.3", "1.2.9", "2.0.0", "2.1.0"}
    # overlapping branches dedup to the set union
    assert got["^1.0.0 || ^1.2.0"] == {"1.2.2", "1.2.3", "1.2.9",
                                       "1.3.0", "1.9.9"}
    assert got["=0.9.9||=2.1.0"] == {"0.9.9", "2.1.0"}
    # an unparseable branch never matches; the good branch still does
    got2 = _join(spark, ["garbage || =1.2.3"], ["1.2.3", "1.2.4"])
    assert got2["garbage || =1.2.3"] == {"1.2.3"}


def test_version_gate_edges_rules(spark):
    """The traversal gate (patchPlanning.go:247 DoesRangeInclude):
    null constraint always passes; unparseable constraint or version
    never silently matches; unions pass on any branch; missing node
    version fails closed."""
    from pyspark.sql import functions as F
    from guackg.ops.version import version_gate_edges

    e = spark.createDataFrame(
        [("a", "d", "v1", None),          # free edge: always passes
         ("a", "d", "v1", "^1.0.0"),      # in range
         ("a", "d", "v2", "^1.0.0"),      # out of range
         ("a", "d", "v3", ">=0.0.0"),     # dst version unparseable
         ("a", "d", "v4", ">=0.0.0"),     # dst not in node_versions
         ("a", "d", "v1", "junk"),        # unparseable constraint
         ("a", "d", "v2", "=9.9.9 || ^2.0.0")],  # union, 2nd branch
        "subj_key string, pred string, obj_key string, constraint string")
    vers = spark.createDataFrame(
        [("v1", "1.2.0"), ("v2", "2.3.4"), ("v3", "not-a-version")],
        "key string, version string")
    got = {(r.obj_key, r.constraint)
           for r in version_gate_edges(e, vers).collect()}
    assert got == {("v1", None), ("v1", "^1.0.0"),
                   ("v2", "=9.9.9 || ^2.0.0")}


def test_component_overflow_quarantined(spark):
    """Components >= 1000 overflow the bigint encoding and would
    collide ('1.2345.6' == '3.345.6' numerically): the parse regex
    caps digits, so out-of-contract versions AND constraints
    quarantine to no-match instead of silently matching wrong."""
    from guackg.ops.version import version_range_join
    versions = spark.createDataFrame(
        [("p", "1.2345.6"), ("p", "3.345.6")], "name string, version string")
    deps = spark.createDataFrame(
        [(1, "p", "=3.345.6"), (2, "p", "=1.2345.6")],
        "dep_id int, name string, constraint string")
    got = {(r.dep_id, r.version) for r in
           version_range_join(deps, versions).collect()}
    # dep 1 matches ONLY the true 3.345.6; the overflowing version and
    # the overflowing constraint match nothing
    assert got == {(1, "3.345.6")}
