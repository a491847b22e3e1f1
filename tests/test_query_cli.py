"""The `guacone query ...` CLI analog (scripts/query_graph.py) driven
in-process over a freshly built workdir — every query mode must return
sane rows from the same tables the spark-submit surface reads."""

import argparse
import os
import sys

import pytest

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "scripts"))

from guackg.pipeline import KGPipeline


@pytest.fixture(scope="module")
def built_workdir(spark, pages_df, alias_df, assertions_df,
                  tmp_path_factory):
    wd = str(tmp_path_factory.mktemp("qcli"))
    KGPipeline(spark, wd).run(pages_df, alias_df, assertions_df,
                              input_fingerprint="qcli")
    return wd


def _args(**kw):
    base = dict(workdir=None, query=None, start=None, dst=None,
                preds="", direction="both", max_depth=4, kind=None,
                key_prefix=None, root_prefix=None,
                skip_tombstoned=False, limit=50, master=None)
    base.update(kw)
    return argparse.Namespace(**base)


def test_query_cli_modes(spark, built_workdir):
    import query_graph as Q

    # a well-connected start key: the highest-degree entity node
    from guackg import io as gio
    from pyspark.sql import functions as F
    edges = gio.read_table(spark, os.path.join(built_workdir, "edges"))
    start = (edges.filter(~F.col("subj_key").startswith("page:"))
             .groupBy("subj_key").count()
             .orderBy(F.desc("count"), "subj_key").first()["subj_key"])

    rows, total = Q.run_query(
        spark, _args(workdir=built_workdir, query="neighbors", start=start))
    assert total > 0 and {"neighbor_key", "pred", "direction"} <= set(rows[0])

    rows, total = Q.run_query(
        spark, _args(workdir=built_workdir, query="reachable", start=start))
    assert total > 0 and all(r["depth"] >= 0 for r in rows)

    # tombstone-aware traversal must never report a tombstoned page
    rows, _ = Q.run_query(
        spark, _args(workdir=built_workdir, query="reachable",
                     start=start, skip_tombstoned=True, limit=10_000))
    skip_set = {r["key"] for r in
                Q._tombstoned_page_keys(spark, built_workdir).collect()}
    assert not ({r["key"] for r in rows} & skip_set)

    rows, total = Q.run_query(
        spark, _args(workdir=built_workdir, query="blast", start=start))
    assert total > 0 and {"key", "depth", "parent", "via_pred"} <= set(rows[0])

    rows, total = Q.run_query(
        spark, _args(workdir=built_workdir, query="toposort"))
    assert total > 0

    rows, total = Q.run_query(
        spark, _args(workdir=built_workdir, query="find", kind="page"))
    assert total > 0 and all(r["kind"] == "page" for r in rows)

    # path between the start and one of its direct neighbors
    nb, _ = Q.run_query(
        spark, _args(workdir=built_workdir, query="neighbors",
                     start=start, direction="out"))
    dst = nb[0]["neighbor_key"]
    rows, total = Q.run_query(
        spark, _args(workdir=built_workdir, query="path",
                     start=start, dst=dst))
    assert total >= 2 and rows[0]["key"] == start and rows[-1]["key"] == dst

    rows, total = Q.run_query(
        spark, _args(workdir=built_workdir, query="path-edges",
                     start=start, dst=dst))
    assert total == 1 and rows[0]["subj_key"] == start \
        and rows[0]["obj_key"] == dst and "match_level" in rows[0] \
        and "subj_kind" in rows[0]

    # roots: which page documents mention `start` (reverse closure
    # filtered to the page: namespace) — requires --root-prefix
    rows, total = Q.run_query(
        spark, _args(workdir=built_workdir, query="roots", start=start,
                     root_prefix="page:", limit=10_000))
    assert total > 0 and all(r["key"].startswith("page:") for r in rows)
    with pytest.raises(SystemExit):
        Q.run_query(spark, _args(workdir=built_workdir, query="roots",
                                 start=start))

    # undirected path: a page never has in-edges, so page→page is
    # unreachable directed but connected via a shared mention
    pg = rows[0]["key"]
    mentions_of_pg = [r["neighbor_key"] for r in Q.run_query(
        spark, _args(workdir=built_workdir, query="neighbors",
                     start=pg, direction="out"))[0]]
    other = None
    for m in mentions_of_pg[:5]:
        pages_2hop, _ = Q.run_query(
            spark, _args(workdir=built_workdir, query="roots",
                         start=m, root_prefix="page:", max_depth=1,
                         limit=10_000))
        other = next((r["key"] for r in pages_2hop if r["key"] != pg),
                     None)
        if other:
            break
    assert other is not None, "no co-mentioning page found"
    assert Q.run_query(spark, _args(
        workdir=built_workdir, query="path", start=pg, dst=other,
        direction="out"))[1] == 0
    rows, total = Q.run_query(spark, _args(
        workdir=built_workdir, query="path", start=pg, dst=other,
        direction="both"))
    assert total >= 3 and rows[0]["key"] == pg and rows[-1]["key"] == other


def test_clean_corpus_cli(spark, tmp_path):
    """scripts/clean_corpus.py end-to-end: kept/ holds exactly the
    audit's keep rows with all input columns, the summary's per-stage
    counts sum to the input size, and the run is deterministic."""
    import argparse as _ap

    import clean_corpus as C

    good = ("the quick brown fox jumps over the lazy dog and then "
            "walks back home with a friend to rest for a while longer")
    docs = spark.createDataFrame(
        [(1, good, "a"), (2, good, "b"),
         (3, good.replace("lazy", "sleepy"), "c"),
         (4, "der die das und nicht ein " * 8, "d"),
         (5, None, "e")],
        "doc_id long, text string, extra string")
    inp = str(tmp_path / "docs.parquet")
    docs.write.parquet(inp)
    out = str(tmp_path / "cleaned")

    args = _ap.Namespace(input=inp, out=out, text_col="text",
                         langs="en", min_quality=0.3,
                         near_threshold=0.5, max_dup_line_frac=None,
                         drop_dup_paragraphs=False, master=None)
    summary = C.run_clean(spark, args)
    assert summary["docs_in"] == 5 and summary["kept"] == 1
    assert sum(summary["dropped_per_stage"].values()) == 4

    kept = spark.read.parquet(os.path.join(out, "kept"))
    audit = spark.read.parquet(os.path.join(out, "audit"))
    assert set(kept.columns) == {"doc_id", "text", "extra"}
    assert {r.doc_id for r in kept.collect()} == \
        {r.doc_id for r in audit.filter("keep").collect()} == {1}
    assert audit.count() == 5
    # determinism: a second run reproduces the audit exactly
    out2 = str(tmp_path / "cleaned2")
    C.run_clean(spark, _ap.Namespace(**{**vars(args), "out": out2}))
    a2 = spark.read.parquet(os.path.join(out2, "audit"))
    assert sorted(map(tuple, audit.collect())) == \
        sorted(map(tuple, a2.collect()))


def test_clean_corpus_cli_with_benchmark(spark, tmp_path):
    """--benchmark wires the decontamination gate through run_clean:
    the overlapping doc lands in the 'contaminated' stage and out of
    kept/."""
    import argparse as _ap
    import os
    import scripts.clean_corpus as C
    docs = spark.createDataFrame(
        [(1, "the quick brown fox jumps over the lazy dog and then "
             "the fox sleeps in the warm sun for a while"),
         (2, "a completely different document about the weather and "
             "the sea with many common english words in it")],
        "doc_id long, text string")
    bench = spark.createDataFrame(
        [(100, "fox jumps over the lazy")], "doc_id long, text string")
    inp = str(tmp_path / "docs.parquet")
    bpath = str(tmp_path / "bench.parquet")
    docs.write.parquet(inp)
    bench.write.parquet(bpath)
    out = str(tmp_path / "cleaned")
    args = _ap.Namespace(input=inp, out=out, text_col="text",
                         langs="en", min_quality=0.0,
                         near_threshold=0.5, max_dup_line_frac=None,
                         drop_dup_paragraphs=False, master=None,
                         benchmark=bpath, contamination_n=5,
                         max_contamination=0.0)
    summary = C.run_clean(spark, args)
    assert summary["dropped_per_stage"] == {"contaminated": 1}
    assert summary["kept"] == 1
    kept = spark.read.parquet(os.path.join(out, "kept"))
    assert {r.doc_id for r in kept.collect()} == {2}


def test_query_cli_graph_analytics_over_real_kg(spark, built_workdir):
    """pagerank/triangles/kcore/degree run over the pipeline's own
    materialized edges table (SURVEY §3.2 surface), pred-filterable,
    with exact parity against the ops invoked directly on the same
    edge pairs — and kcore against the sequential peeling reference."""
    import os

    import query_graph as Q
    from pyspark.sql import functions as F

    from guackg import graph as G
    from guackg import io as gio
    from tests.test_graph_analytics import py_coreness

    edges = gio.read_table(spark, os.path.join(built_workdir, "edges"))
    pairs = edges.select("subj_key", "obj_key")

    rows, total = Q.run_query(
        spark, _args(workdir=built_workdir, query="degree", limit=5))
    assert total == pairs.selectExpr("subj_key as k").union(
        pairs.selectExpr("obj_key as k")).distinct().count()
    direct = G.degree_stats(pairs).orderBy(
        F.desc("degree"), "key").limit(5).collect()
    assert [r["key"] for r in rows] == [r.key for r in direct]

    rows, _ = Q.run_query(
        spark, _args(workdir=built_workdir, query="pagerank", limit=3))
    direct = G.pagerank(pairs).orderBy(
        F.desc("rank"), "key").limit(3).collect()
    assert [(r["key"], round(r["rank"], 9)) for r in rows] == \
        [(r.key, round(r.rank, 9)) for r in direct]

    rows, total = Q.run_query(
        spark, _args(workdir=built_workdir, query="kcore", limit=10))
    ref = py_coreness([(r.subj_key, r.obj_key)
                       for r in pairs.collect()])
    assert total == len(ref)
    max_core = max(ref.values())
    want_top = sorted((k for k, c in ref.items() if c == max_core))
    got = [(r["key"], r["core"]) for r in rows]
    assert got == [(k, max_core) for k in want_top[:10]] \
        or all(c == max_core for _, c in got)

    # pred filtering reaches the analytics: the mentions-only graph
    # is page->entity bipartite, so it must contain zero triangles
    # while the full graph's row universe is larger
    rows, total = Q.run_query(
        spark, _args(workdir=built_workdir, query="triangles",
                     preds="mentions", limit=1))
    assert total > 0 and rows[0]["triangles"] == 0


def test_clean_corpus_cli_incremental_dedup_state(spark, tmp_path):
    """--dedup-state: batch 1 writes the persisted minhash state at
    ingest; batch 2 reads it, drops docs that near-duplicate the
    STORED corpus (audit stage 'near_dup_corpus') without ever seeing
    batch 1's text, and appends its own state for batch 3."""
    import argparse as _ap

    import clean_corpus as C

    good = ("the quick brown fox jumps over the lazy dog and then "
            "walks back home with a friend to rest for a while longer")
    other = ("completely different words about boats sailing on the "
             "open sea with wind and salt and long quiet evenings")
    state = str(tmp_path / "dedup_state")

    def run(batch_rows, tag):
        inp = str(tmp_path / f"in_{tag}.parquet")
        spark.createDataFrame(batch_rows,
                              "doc_id long, text string") \
            .write.parquet(inp)
        out = str(tmp_path / f"out_{tag}")
        args = _ap.Namespace(input=inp, out=out, text_col="text",
                             langs="en", min_quality=0.0,
                             near_threshold=0.5,
                             max_dup_line_frac=None,
                             drop_dup_paragraphs=False,
                             dedup_state=state, master=None)
        return C.run_clean(spark, args), out

    s1, _ = run([(1, good)], "b1")
    assert s1["kept"] == 1 and os.path.isdir(state)

    # batch 2: a near-dup of the stored doc, and a fresh doc
    s2, out2 = run([(100, good.replace("lazy", "sleepy")),
                    (101, other)], "b2")
    assert s2["dropped_per_stage"].get("near_dup_corpus") == 1
    assert s2["kept"] == 1
    audit2 = spark.read.parquet(os.path.join(out2, "audit"))
    by_id = {r.doc_id: r for r in audit2.collect()}
    assert by_id[100].stage == "near_dup_corpus" and not by_id[100].keep
    assert by_id[101].keep

    # the store now covers both batches' kept docs
    st = spark.read.parquet(state)
    assert {r.doc_id for r in st.collect()} == {1, 101}
    # batch 3: duplicates the batch-2 survivor -> dropped via the
    # APPENDED state
    s3, _ = run([(200, other)], "b3")
    assert s3["dropped_per_stage"].get("near_dup_corpus") == 1
