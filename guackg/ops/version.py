"""Semver version-range matching — the reference's dependency
version-constraint resolution (/root/reference/pkg/misc/depversion/
depversion.go:43-91: parse a constraint set, test each known version)
re-expressed as a relational theta join.

Constraint grammar (the subset the battery exercises, INCLUDING the
reference's npm-style `||` unions, depversion.go:93-130):

    =X.Y.Z    exactly X.Y.Z
    ^X.Y.Z    >=X.Y.Z and < (X+1).0.0      (caret: same major)
    ~X.Y.Z    >=X.Y.Z and < X.(Y+1).0      (tilde: same minor)
    >=X.Y.Z   at or above
    <X.Y.Z    strictly below
    A || B    union: matches A or B (each side any of the above);
              implemented as split + explode into the same range join,
              deduped on the output key — set-union semantics, a
              version matching both branches appears once

Everything is JVM-side: versions and constraint bounds parse with
regexp_extract into ONE sortable bigint (major·10^6 + minor·10^3 +
patch — components < 1000 by contract, enforced by the parse regex's
{1,3} digit cap: an out-of-range component quarantines the whole
version/constraint to NULL), so the range test is two integer
comparisons.

Scale shape: the join is an EQUI-join on the package name (ranges
only ever compare within a name), so it shuffles on name and the
range predicate evaluates post-join — no broadcast-nested-loop, no
cross product. Hot package names (the lodash problem) are ordinary
join skew: AQE skew-join splits them, and both sides can pre-
aggregate to distinct (name, version) / (name, constraint) first.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# components < 1000 is the encoding's validity contract: the {1,3}
# digit cap IS the filter — '1.2345.6' fails the match and quarantines
# to NULL instead of silently colliding with '3.345.6' in the bigint
_VER_RE = r"^(\d{1,3})\.(\d{1,3})\.(\d{1,3})$"
_CON_RE = r"^(\^|~|>=|<|=)(\d{1,3})\.(\d{1,3})\.(\d{1,3})$"

VERSION_SCALE_MINOR = 1_000
VERSION_SCALE_MAJOR = 1_000_000
_MAX = 999_999_999_999  # open upper bound sentinel (> any encodable)


def version_num(col: F.Column) -> F.Column:
    """'X.Y.Z' → sortable bigint, NULL if unparseable (quarantine
    semantics — bad versions never silently match)."""
    maj = F.regexp_extract(col, _VER_RE, 1)
    mnr = F.regexp_extract(col, _VER_RE, 2)
    pat = F.regexp_extract(col, _VER_RE, 3)
    ok = maj != ""
    return F.when(
        ok,
        maj.cast("bigint") * VERSION_SCALE_MAJOR
        + mnr.cast("bigint") * VERSION_SCALE_MINOR
        + pat.cast("bigint"))


def constraint_bounds(col: F.Column) -> tuple[F.Column, F.Column]:
    """constraint string → (lo, hi): matches are lo <= v < hi.
    NULL bounds for unparseable constraints (no silent match-all)."""
    op = F.regexp_extract(col, _CON_RE, 1)
    maj = F.regexp_extract(col, _CON_RE, 2).cast("bigint")
    mnr = F.regexp_extract(col, _CON_RE, 3).cast("bigint")
    pat = F.regexp_extract(col, _CON_RE, 4).cast("bigint")
    base = (maj * VERSION_SCALE_MAJOR + mnr * VERSION_SCALE_MINOR + pat)
    ok = op != ""
    lo = F.when(ok & (op == "<"), F.lit(0)) \
        .when(ok, base)
    hi = F.when(ok & (op == "="), base + 1) \
        .when(ok & (op == "^"), (maj + 1) * VERSION_SCALE_MAJOR) \
        .when(ok & (op == "~"),
              maj * VERSION_SCALE_MAJOR + (mnr + 1) * VERSION_SCALE_MINOR) \
        .when(ok & (op == ">="), F.lit(_MAX)) \
        .when(ok & (op == "<"), base)
    return lo, hi


def explode_constraint_branches(df: DataFrame,
                                constraint_col: str) -> DataFrame:
    """Shared `||`-union handling (depversion.go:93-130): one row per
    constraint branch with its parsed [_lo, _hi) bounds; unparseable
    branches are dropped (no silent match-all). Both the range join
    and the traversal gate consume this, so the constraint grammar
    lives in exactly one place."""
    branch = F.explode(F.transform(
        F.split(F.col(constraint_col), r"\s*\|\|\s*"),
        lambda c: F.trim(c)))
    d = df.withColumn("_branch", branch)
    lo, hi = constraint_bounds(F.col("_branch"))
    return (d.withColumn("_lo", lo).withColumn("_hi", hi)
            .filter(F.col("_lo").isNotNull())
            .drop("_branch"))


def version_range_join(deps: DataFrame, versions: DataFrame,
                       name_col: str = "name",
                       constraint_col: str = "constraint",
                       version_col: str = "version") -> DataFrame:
    """deps(name, constraint, …) ⋈ versions(name, version, …) →
    every (dep, version) pair whose version satisfies the constraint
    (depversion.go's WhichVersionMatches, as one equi-join + range
    filter). `||` unions (depversion.go:93-130) explode into one
    branch row each BEFORE the join; branches that match the same
    version collapse via dropDuplicates on the pre-explode columns,
    so the result is the set union. Output keeps all columns of both
    sides plus the parsed `vnum`."""
    in_cols = deps.columns
    d = explode_constraint_branches(deps, constraint_col)
    v = versions.withColumn("vnum", version_num(F.col(version_col))) \
        .filter(F.col("vnum").isNotNull())
    return (d.join(v, on=name_col)
            .filter((F.col("vnum") >= F.col("_lo"))
                    & (F.col("vnum") < F.col("_hi")))
            .drop("_lo", "_hi")
            .dropDuplicates(in_cols + [version_col]))


def version_gate_edges(edges: DataFrame, node_versions: DataFrame,
                       constraint_col: str = "constraint",
                       dst_col: str = "obj_key") -> DataFrame:
    """Version-aware edge gate for graph traversal — the reference's
    `DoesRangeInclude` check during blast-radius / vulnerability
    dependency expansion (/root/reference/pkg/guacanalytics/
    patchPlanning.go:247; cmd/guacone/cmd/vulnerability.go:287
    `WhichVersionMatches`): an edge carrying a version constraint is
    traversable only if the DESTINATION node's version satisfies it.

    The gate is a pure function of (edge, destination node), so
    applying it ONCE as a vectorized pre-filter over the edge set is
    semantically identical to re-evaluating it at every BFS hop — and
    pays the constraint parse once instead of once per round. Rules
    (all JVM-side, no silent match-all):

    - constraint IS NULL          → edge always traversable
    - constraint present, dst has a parseable version in range → pass
    - constraint present, dst missing from `node_versions`, version
      unparseable, or out of range → edge dropped
    - `A || B` unions (depversion.go:93-130) → pass if ANY branch does

    `node_versions` is (key, version). Scale shape: one equi-join of
    constrained edges against node versions on the dst key (shuffles
    on the node key, same distribution the traversal itself uses);
    union-branch explode happens before the join, and the output
    dedups back to one row per input edge."""
    in_cols = edges.columns
    free = edges.filter(F.col(constraint_col).isNull())
    cons = edges.filter(F.col(constraint_col).isNotNull())
    v = (node_versions
         .select(F.col(node_versions.columns[0]).alias("_vkey"),
                 version_num(F.col(node_versions.columns[1]))
                 .alias("_vnum"))
         .filter(F.col("_vnum").isNotNull()))
    d = explode_constraint_branches(cons, constraint_col)
    passed = (d.join(v, d[dst_col] == v["_vkey"])
              .filter((F.col("_vnum") >= F.col("_lo"))
                      & (F.col("_vnum") < F.col("_hi")))
              .select(*in_cols)
              .dropDuplicates(in_cols))
    return free.unionByName(passed)
