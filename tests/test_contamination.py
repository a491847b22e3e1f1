"""DuckDB-parity tests for benchmark-contamination detection
(ops/contamination.py): the n-gram overlap stats and the strict
decontamination gate are re-expressed as plain SQL over the SAME rows
and compared value-exactly — the driver-gate discipline, held
in-suite because the registered battery is pinned at 50 queries."""

import duckdb
import pandas as pd
import pytest

from guackg.ops import contamination as C

SF_DIR = "/root/testdata/sf0.001"

# crafted corpus: doc 10/20 are "benchmark" (doc_id % 10 == 0);
# doc 1 copies a benchmark span verbatim (full contamination at n=3),
# doc 2 shares a partial span, doc 3 is clean, doc 4 too short for
# grams, doc 5 NULL text, doc 6 empty, doc 7 duplicate grams inside
# one doc (distinct-gram denominator), doc 11 repeats a benchmark
# gram many times (matched must count it ONCE).
CRAFTED = [
    (10, "the quick brown fox jumps over the lazy dog"),
    (20, "pack my box with five dozen liquor jugs"),
    (1, "the quick brown fox jumps over the lazy dog"),
    (2, "a prefix then the quick brown fox escapes cleanly"),
    (3, "entirely unrelated words compose this document body"),
    (4, "two words"),
    (5, None),
    (6, ""),
    (7, "x y z x y z x y z"),
    (11, "the quick brown the quick brown the quick brown fox"),
]


@pytest.fixture(scope="module")
def crafted(spark):
    return spark.createDataFrame(CRAFTED, "doc_id long, text string")


@pytest.fixture(scope="module")
def sf_docs(spark):
    return spark.read.parquet(f"{SF_DIR}/documents.parquet")


def _split(df):
    bench = df.filter("doc_id % 10 = 0")
    corpus = df.filter("doc_id % 10 <> 0")
    return corpus, bench


def _oracle_sql(n: int) -> str:
    return f"""
WITH W AS (
  SELECT doc_id,
         list_filter(string_split_regex(lower(trim(coalesce(text, ''))),
                                        '\\s+'),
                     x -> x <> '') AS w
  FROM docs),
G AS (
  SELECT doc_id,
         CASE WHEN len(w) >= {n}
              THEN list_distinct(list_transform(
                     range(1, len(w) - {n} + 2),
                     i -> array_to_string(list_slice(w, i, i + {n} - 1),
                                          ' ')))
              ELSE [] END AS g
  FROM W),
BG AS (SELECT DISTINCT unnest(g) AS gram FROM G WHERE doc_id % 10 = 0),
CG AS (SELECT doc_id, unnest(g) AS gram FROM G WHERE doc_id % 10 <> 0),
PD AS (SELECT c.doc_id, count(*) AS n_grams,
              count(b.gram) AS matched_grams
       FROM CG c LEFT JOIN BG b USING (gram) GROUP BY c.doc_id)
SELECT d.doc_id,
       CAST(coalesce(n_grams, 0) AS BIGINT) AS n_grams,
       CAST(coalesce(matched_grams, 0) AS BIGINT) AS matched_grams,
       CASE WHEN coalesce(n_grams, 0) > 0
            THEN round(coalesce(matched_grams, 0)::double / n_grams, 6)
            ELSE 0.0 END AS contamination_frac
FROM (SELECT doc_id FROM G WHERE doc_id % 10 <> 0) d
LEFT JOIN PD USING (doc_id)
ORDER BY d.doc_id
"""


def _pdf(df):
    return df.toPandas().sort_values("doc_id").reset_index(drop=True)


@pytest.mark.parametrize("src,n", [("crafted", 3), ("crafted", 13),
                                   ("sf_docs", 5)])
def test_contamination_vs_duckdb(request, src, n):
    df = request.getfixturevalue(src)
    corpus, bench = _split(df)
    got = _pdf(C.contamination_overlap(corpus, bench, n=n))
    con = duckdb.connect()
    con.register("docs", df.toPandas())
    want = con.execute(_oracle_sql(n)).df()
    pd.testing.assert_frame_equal(got, want, check_dtype=False,
                                  check_exact=False, atol=1e-9)


def test_crafted_semantics(crafted):
    corpus, bench = _split(crafted)
    rows = {r.doc_id: r for r in
            C.contamination_overlap(corpus, bench, n=3).collect()}
    # verbatim copy: every gram matched
    assert rows[1].matched_grams == rows[1].n_grams > 0
    assert rows[1].contamination_frac == 1.0
    # partial overlap: some but not all
    assert 0 < rows[2].matched_grams < rows[2].n_grams
    # clean doc
    assert rows[3].matched_grams == 0
    assert rows[3].contamination_frac == 0.0
    # too short / NULL / empty docs report zeros, not missing rows
    for d in (4, 5, 6):
        assert rows[d].n_grams == 0 and rows[d].matched_grams == 0
    # repeated benchmark gram counted once (distinct denominator too)
    assert rows[11].matched_grams <= rows[11].n_grams
    assert rows[7].n_grams == 3  # 'x y z','y z x','z x y' distinct


def test_decontaminate_strict_gate(crafted):
    corpus, bench = _split(crafted)
    kept = C.decontaminate(corpus, bench, n=3, max_frac=0.0)
    kept_ids = {r.doc_id for r in kept.select("doc_id").collect()}
    # contaminated docs 1, 2, 11 dropped; clean + gram-less docs kept
    assert kept_ids == {3, 4, 5, 6, 7}
    # gate output carries the audit columns
    assert {"n_grams", "matched_grams", "contamination_frac"} <= set(
        kept.columns)


def test_broadcast_plan(crafted):
    # benchmark side broadcasts; no BatchEvalPython anywhere
    corpus, bench = _split(crafted)
    s = C.contamination_overlap(corpus, bench, n=3)\
        ._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in s
    assert "BatchEvalPython" not in s


def test_broadcast_decision_is_measured(crafted, monkeypatch):
    """broadcast_benchmark=None (default) measures the inventory and
    flips the plan at BROADCAST_MAX_GRAMS: a tiny bench broadcasts,
    but with the bound forced to 0 the SAME call shuffles instead —
    a corpus-sized 'benchmark' can no longer flatten the driver by
    default. Results are identical either way."""
    corpus, bench = _split(crafted)

    def plan(df):
        return df._jdf.queryExecution().executedPlan().toString()

    under = C.contamination_overlap(corpus, bench, n=3)
    assert "BroadcastHashJoin" in plan(under)
    monkeypatch.setattr(C, "BROADCAST_MAX_GRAMS", 0)
    over = C.contamination_overlap(corpus, bench, n=3)
    # the gram join (the benchmark side) must NOT broadcast when the
    # measured inventory exceeds the bound; AQE may still broadcast
    # the tiny per-doc rollup join, so pin the gram join by checking
    # the pre-AQE (spark) plan of the join stage
    assert "BroadcastHashJoin" not in over._jdf.queryExecution()\
        .sparkPlan().toString()
    a = {(r.doc_id, r.n_grams, r.matched_grams)
         for r in under.collect()}
    b = {(r.doc_id, r.n_grams, r.matched_grams)
         for r in over.collect()}
    assert a == b


def test_clean_corpus_contamination_gate(spark, crafted):
    """The decontamination gate composes into clean_corpus: the
    contaminated doc exits at 'contaminated', every other audit row
    is unchanged vs the benchmark-less run."""
    from guackg.ops.clean import clean_corpus
    # english-looking corpus that passes the row-wise gates
    corpus = spark.createDataFrame(
        [(1, "the quick brown fox jumps over the lazy dog and then "
             "the fox sleeps in the warm sun for a while"),
         (2, "a completely different document about the weather and "
             "the sea with many common english words in it"),
         (3, "a completely different document about the weather and "
             "the sea with many common english words in it")],
        "doc_id long, text string")
    bench = spark.createDataFrame(
        [(100, "fox jumps over the lazy")],
        "doc_id long, text string")
    base = {r.doc_id: r.stage
            for r in clean_corpus(corpus, min_quality=0.0).collect()}
    got = {r.doc_id: r.stage
           for r in clean_corpus(corpus, min_quality=0.0,
                                 benchmark=bench,
                                 contamination_n=5).collect()}
    assert base == {1: "kept", 2: "kept", 3: "exact_dup"}
    assert got == {1: "contaminated", 2: "kept", 3: "exact_dup"}


def test_decontaminate_fractional_threshold_unrounded(crafted):
    """The gate compares matched <= max_frac * n_grams (unrounded),
    not the 6-decimal display frac. Doc 2 has 2/7 matched grams:
    kept at max_frac=0.3 (2 <= 2.1), dropped at 0.25 (2 > 1.75)."""
    corpus, bench = _split(crafted)
    at_30 = {r.doc_id for r in
             C.decontaminate(corpus, bench, n=3, max_frac=0.3)
             .select("doc_id").collect()}
    at_25 = {r.doc_id for r in
             C.decontaminate(corpus, bench, n=3, max_frac=0.25)
             .select("doc_id").collect()}
    assert 2 in at_30 and 2 not in at_25
    assert 1 not in at_30  # fully contaminated stays dropped
