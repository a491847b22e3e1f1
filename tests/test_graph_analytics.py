"""Graph-analytics ops (guackg/graph.py pagerank + degree_stats):
degree rollup holds exact DuckDB parity; PageRank holds exact parity
(1e-9) against an independent pure-Python power iteration with the
same published semantics (distinct edges, uniform dangling-mass
redistribution) — the in-suite oracle discipline for an op SQL can't
express (iterative fixpoint)."""

import duckdb
import pandas as pd
import pytest
from pyspark.sql import functions as F

import guackg.graph as G

SF_DIR = "/root/testdata/sf0.001"

# crafted digraph: b is a hub, d is dangling (no out-edges), e-f-g a
# cycle, a->b duplicated (parallel edge must count once), h self-loop,
# i isolated-but-referenced sink
EDGES = [
    ("a", "b"), ("a", "b"), ("a", "c"), ("b", "d"), ("c", "b"),
    ("e", "f"), ("f", "g"), ("g", "e"), ("h", "h"), ("b", "i"),
]


def py_pagerank(edges, iterations=10, damping=0.85):
    e = sorted(set(edges))
    nodes = sorted({u for u, _ in e} | {v for _, v in e})
    n = len(nodes)
    out = {}
    for u, _ in e:
        out[u] = out.get(u, 0) + 1
    rank = {k: 1.0 / n for k in nodes}
    base = (1.0 - damping) / n
    for _ in range(iterations):
        dangling = sum(r for k, r in rank.items() if k not in out)
        contrib = {k: 0.0 for k in nodes}
        for u, v in e:
            contrib[v] += rank[u] / out[u]
        rank = {k: base + damping * (contrib[k] + dangling / n)
                for k in nodes}
    return rank


@pytest.fixture(scope="module")
def crafted(spark):
    return spark.createDataFrame(EDGES, "subj_key string, obj_key string")


def test_pagerank_vs_python_reference(crafted):
    got = {r.key: r.rank for r in G.pagerank(crafted).collect()}
    want = py_pagerank(EDGES)
    assert set(got) == set(want)
    for k in want:
        assert abs(got[k] - want[k]) < 1e-9, k
    assert abs(sum(got.values()) - 1.0) < 1e-9
    # hub b outranks its spokes; cycle members outrank leaf i
    assert got["b"] > got["c"] and got["e"] > got["i"]


def test_pagerank_sf_graph_vs_python_reference(spark):
    import __spark_entry__ as E
    edges = E._bipartite_edges(spark, SF_DIR)
    pairs = [(r.subj_key, r.obj_key)
             for r in edges.select("subj_key", "obj_key").collect()]
    got = {r.key: r.rank
           for r in G.pagerank(edges, iterations=5).collect()}
    want = py_pagerank(pairs, iterations=5)
    assert set(got) == set(want) and len(got) > 100
    for k in want:
        assert abs(got[k] - want[k]) < 1e-9
    assert abs(sum(got.values()) - 1.0) < 1e-9


def test_pagerank_empty(spark):
    empty = spark.createDataFrame([], "subj_key string, obj_key string")
    assert G.pagerank(empty).count() == 0


def test_degree_stats_vs_duckdb(crafted):
    got = (G.degree_stats(crafted).orderBy("key").toPandas()
           .reset_index(drop=True))
    con = duckdb.connect()
    con.register("e", crafted.toPandas())
    want = con.execute("""
        WITH o AS (SELECT subj_key AS key, count(*) AS out_degree
                   FROM e GROUP BY 1),
             i AS (SELECT obj_key AS key, count(*) AS in_degree
                   FROM e GROUP BY 1)
        SELECT coalesce(o.key, i.key) AS key,
               CAST(coalesce(out_degree, 0) AS BIGINT) AS out_degree,
               CAST(coalesce(in_degree, 0) AS BIGINT) AS in_degree,
               CAST(coalesce(out_degree, 0) + coalesce(in_degree, 0)
                    AS BIGINT) AS degree
        FROM o FULL JOIN i ON o.key = i.key ORDER BY 1
    """).df()
    pd.testing.assert_frame_equal(got, want, check_dtype=False)
    # parallel a->b edges both count in the degree rollup
    row = got[got.key == "a"].iloc[0]
    assert row.out_degree == 3


TRI_SQL = """
WITH sym AS (
  SELECT subj_key AS u, obj_key AS v FROM e WHERE subj_key <> obj_key),
und AS (
  SELECT DISTINCT least(u, v) AS u, greatest(u, v) AS v FROM sym),
tri AS (
  SELECT e1.u AS k1, e1.v AS k2, e2.v AS k3
  FROM und e1 JOIN und e2 ON e1.u = e2.u AND e1.v < e2.v
              JOIN und e3 ON e3.u = e1.v AND e3.v = e2.v),
nodes AS (SELECT u AS key FROM und UNION SELECT v FROM und),
per AS (
  SELECT key, count(*) AS triangles FROM (
    SELECT k1 AS key FROM tri UNION ALL
    SELECT k2 FROM tri UNION ALL SELECT k3 FROM tri)
  GROUP BY key)
SELECT n.key, CAST(coalesce(per.triangles, 0) AS BIGINT) AS triangles
FROM nodes n LEFT JOIN per USING (key) ORDER BY n.key
"""


def _tri_parity(df):
    got = (G.triangle_count(df).orderBy("key").toPandas()
           .reset_index(drop=True))
    con = duckdb.connect()
    con.register("e", df.toPandas())
    want = con.execute(TRI_SQL).df()
    pd.testing.assert_frame_equal(got, want, check_dtype=False)
    return got


def test_triangle_count_vs_duckdb_crafted(spark):
    # K4 on a-b-c-d (4 triangles, 3 per node), a pendant e, a
    # self-loop, parallel + reversed duplicates (must count once),
    # and a triangle-free path f-g-h
    edges = [("a", "b"), ("b", "a"), ("a", "c"), ("a", "d"),
             ("b", "c"), ("b", "d"), ("c", "d"), ("c", "d"),
             ("d", "e"), ("x", "x"), ("f", "g"), ("g", "h")]
    df = spark.createDataFrame(edges, "subj_key string, obj_key string")
    got = _tri_parity(df)
    t = dict(zip(got.key, got.triangles))
    assert t["a"] == t["b"] == t["c"] == t["d"] == 3  # K4: C(3,2)=3
    assert t["e"] == t["f"] == t["g"] == t["h"] == 0
    assert "x" not in t  # self-loop only: no undirected edge survives


def test_triangle_count_vs_duckdb_sf_cosupplier(spark):
    """Co-supplier graph (suppliers sharing an order) — a real
    triangle-rich sf-derived graph."""
    li = spark.read.parquet(f"{SF_DIR}/lineitem.parquet")
    pairs = (li.alias("a").join(li.alias("b"), on="l_orderkey")
             .filter(F.col("a.l_suppkey") < F.col("b.l_suppkey"))
             .select(F.concat(F.lit("s:"), F.col("a.l_suppkey"))
                     .alias("subj_key"),
                     F.concat(F.lit("s:"), F.col("b.l_suppkey"))
                     .alias("obj_key"))
             .distinct())
    got = _tri_parity(pairs)
    assert got.triangles.sum() > 0  # non-degenerate fixture


def py_coreness(pairs):
    """Sequential peeling reference: repeatedly remove the minimum-
    degree node; its coreness is the running maximum of min-degrees."""
    adj = {}
    for u, v in pairs:
        if u == v:
            continue
        adj.setdefault(u, set()).add(v)
        adj.setdefault(v, set()).add(u)
    core = {}
    deg = {k: len(ns) for k, ns in adj.items()}
    k = 0
    while deg:
        m = min(deg.values())
        k = max(k, m)
        victim = min(x for x, d in deg.items() if d == m)
        core[victim] = k
        for n in adj[victim]:
            if n in deg:
                deg[n] -= 1
        del deg[victim]
    return core


@pytest.mark.parametrize("mode", ["driver", "distributed"])
@pytest.mark.parametrize("pairs", [
    # K4 + pendant + path + triangle with a tail + two components
    [("a", "b"), ("a", "c"), ("a", "d"), ("b", "c"), ("b", "d"),
     ("c", "d"), ("d", "e"), ("f", "g"), ("g", "h"),
     ("p", "q"), ("q", "r"), ("r", "p"), ("r", "s")],
    # star (all coreness 1)
    [("hub", f"leaf{i}") for i in range(8)],
    # two K4s bridged through x plus a pendant on x: x's neighbor
    # values settle at [3, 3, 1] whose h-index is 2 — a threshold
    # NOT present among the values (regression for the histogram
    # formulation: h = max(min(t, suffix_count)), not max present t
    # with suffix_count >= t)
    [(a, b) for grp in (["a1", "a2", "a3", "a4"],
                        ["b1", "b2", "b3", "b4"])
     for i, a in enumerate(grp) for b in grp[i + 1:]]
    + [("x", "a1"), ("x", "b1"), ("x", "pend")],
])
def test_k_core_matches_peeling_reference(spark, monkeypatch, pairs,
                                          mode):
    """Both the bounded driver peeling fast path and the distributed
    h-index fixpoint (GUACKG_GRAPH_DRIVER_BOUND=0) equal the
    sequential peeling reference."""
    if mode == "distributed":
        monkeypatch.setenv("GUACKG_GRAPH_DRIVER_BOUND", "0")
    df = spark.createDataFrame(pairs, "subj_key string, obj_key string")
    got = {r.key: r.core for r in G.k_core(df).collect()}
    assert got == py_coreness(pairs)


def test_k_core_sf_cosupplier_vs_reference(spark, monkeypatch):
    monkeypatch.setenv("GUACKG_GRAPH_DRIVER_BOUND", "0")  # pin the
    # distributed fixpoint: the fast path IS the reference algorithm
    li = spark.read.parquet(f"{SF_DIR}/lineitem.parquet")
    pairs_df = (li.alias("a").join(li.alias("b"), on="l_orderkey")
                .filter(F.col("a.l_suppkey") < F.col("b.l_suppkey"))
                .select(F.concat(F.lit("s:"), F.col("a.l_suppkey"))
                        .alias("subj_key"),
                        F.concat(F.lit("s:"), F.col("b.l_suppkey"))
                        .alias("obj_key"))
                .distinct())
    pairs = [(r.subj_key, r.obj_key) for r in pairs_df.collect()]
    got = {r.key: r.core for r in G.k_core(pairs_df).collect()}
    assert got == py_coreness(pairs) and max(got.values()) >= 2


def test_k_core_long_path_runs_to_fixpoint(spark, monkeypatch):
    """130-node path graph, distributed mode: true coreness is 1
    everywhere, but the h-index fixpoint needs ~O(diameter) rounds to
    get there. The old 50-round cap silently returned core=2 for the
    interior nodes; the loop must now run to the exact fixpoint."""
    monkeypatch.setenv("GUACKG_GRAPH_DRIVER_BOUND", "0")
    pairs = [(f"n{i:03d}", f"n{i + 1:03d}") for i in range(129)]
    df = spark.createDataFrame(pairs, "subj_key string, obj_key string")
    got = {r.key: r.core for r in G.k_core(df).collect()}
    assert got == py_coreness(pairs)  # all 1s
    assert set(got.values()) == {1}


def test_k_core_safety_valve_raises_not_wrong(spark, monkeypatch):
    """With max_iterations set too low the op RAISES instead of
    returning non-fixpoint (wrong) coreness values."""
    monkeypatch.setenv("GUACKG_GRAPH_DRIVER_BOUND", "0")
    pairs = [(f"n{i:03d}", f"n{i + 1:03d}") for i in range(40)]
    df = spark.createDataFrame(pairs, "subj_key string, obj_key string")
    with pytest.raises(RuntimeError, match="fixpoint not reached"):
        G.k_core(df, max_iterations=3).collect()


def test_k_core_mega_hub_distributed(spark, monkeypatch):
    """Skew drill for the count-above-threshold rounds: one hub with
    1e5 neighbors (a Zipf head entity in miniature) plus a K5 clique
    the hub belongs to. The histogram formulation must give exact
    peeling parity without ever materializing the hub's neighbor
    multiset — the per-(key, t) counts for the hub collapse to a
    handful of rows (t clamped to own value)."""
    monkeypatch.setenv("GUACKG_GRAPH_DRIVER_BOUND", "0")
    n_leaves = 100_000
    leaves = spark.range(n_leaves).select(
        F.lit("hub").alias("subj_key"),
        F.concat(F.lit("leaf"), F.col("id")).alias("obj_key"))
    clique_nodes = ["hub", "c1", "c2", "c3", "c4"]
    clique = [(a, b) for i, a in enumerate(clique_nodes)
              for b in clique_nodes[i + 1:]]
    df = leaves.union(spark.createDataFrame(
        clique, "subj_key string, obj_key string"))
    got = {r.key: r.core for r in G.k_core(df).collect()}
    assert len(got) == n_leaves + 5
    assert got["hub"] == 4 and got["c1"] == 4
    assert got["leaf0"] == 1 and got["leaf99999"] == 1
    sample = [(u, v) for u, v in clique] + [
        ("hub", f"leaf{i}") for i in range(50)]
    ref = py_coreness(sample)  # clique coreness unchanged by leaves
    assert got["c4"] == ref["c4"] == 4
