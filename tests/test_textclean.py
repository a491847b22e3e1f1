"""DuckDB-parity tests for the round-4 text-cleaning additions:
Gopher-style repetition stats, top-n-gram stats, PII redaction, and
CCNet-style paragraph-level dedup.
Each Spark op is re-expressed as plain SQL over the SAME rows in
DuckDB and compared value-exactly — the same oracle discipline as the
driver gate, held in-suite because the registered battery is pinned
at 50 queries (round-3 verdict task #2)."""

import duckdb
import pandas as pd
import pytest

SF_DIR = "/root/testdata/sf0.001"

# crafted rows exercising every edge: duplicate lines, blank lines,
# NULL text, sub-n-gram docs, tie-broken top grams, each PII category,
# PII adjacency (digits inside emails / dotted quads near phones)
CRAFTED = [
    (1, "alpha beta\nalpha beta\n\n  gamma  \nalpha beta"),
    (2, "one line only"),
    (3, None),
    (4, ""),
    (5, "a b a b a b c"),                       # top 2-gram 'a b' x3
    (6, "x y\ny x"),                            # tie: 'x y' vs 'y x'
    (7, "short"),                               # < 2 words -> no grams
    (8, "mail me at jo.doe+spam@ex-ample.co.uk or admin@host.io now"),
    (9, "server at 10.0.255.7 and 192.168.1.1, call +1 555-123-4567"),
    (10, "digits 4155551234567 then 12.34.56.78 and a@b.cc mixed"),
    (11, "line\nline\nline\nother"),
]


@pytest.fixture(scope="module")
def crafted(spark):
    return spark.createDataFrame(CRAFTED, "doc_id long, text string")


@pytest.fixture(scope="module")
def sf_docs(spark):
    return spark.read.parquet(f"{SF_DIR}/documents.parquet")


def _duck(rows_df):
    con = duckdb.connect()
    con.register("docs", rows_df)
    return con


def _pdf(df):
    return df.toPandas().sort_values("doc_id").reset_index(drop=True)


REP_SQL = """
WITH L AS (
  SELECT doc_id,
         list_filter(list_transform(string_split(text, chr(10)),
                                    x -> trim(x)),
                     x -> x <> '') AS lines
  FROM docs)
SELECT doc_id,
  CASE WHEN lines IS NULL THEN 0 ELSE len(lines) END AS n_lines,
  CASE WHEN lines IS NOT NULL AND len(lines) > 0
       THEN round(1 - len(list_distinct(lines))::double / len(lines), 6)
       ELSE 0.0 END AS dup_line_frac,
  CASE WHEN lines IS NOT NULL
            AND coalesce(list_sum(list_transform(lines, x -> length(x))), 0) > 0
       THEN round(1 - list_sum(list_transform(list_distinct(lines),
                                              x -> length(x)))::double
                      / list_sum(list_transform(lines, x -> length(x))), 6)
       ELSE 0.0 END AS dup_line_char_frac
FROM L ORDER BY doc_id
"""


def _assert_frames_equal(got: pd.DataFrame, want: pd.DataFrame):
    assert list(got.columns) == list(want.columns)
    for c in got.columns:  # normalize NaN vs None in string columns
        if got[c].dtype == object or want[c].dtype == object:
            got[c] = got[c].where(pd.notnull(got[c]), None)
            want[c] = want[c].where(pd.notnull(want[c]), None)
    pd.testing.assert_frame_equal(got, want, check_dtype=False,
                                  check_exact=False, atol=1e-9)


@pytest.mark.parametrize("src", ["crafted", "sf_docs"])
def test_repetition_stats_vs_duckdb(request, src):
    from guackg.ops.textstats import repetition_stats
    docs = request.getfixturevalue(src)
    got = _pdf(repetition_stats(docs))
    con = _duck(docs.select("doc_id", "text").toPandas())
    want = con.execute(REP_SQL).df()
    _assert_frames_equal(got, want)


TOPGRAM_SQL = """
WITH W AS (
  SELECT doc_id,
         list_filter(string_split_regex(lower(trim(coalesce(text, ''))),
                                        '\\s+'),
                     x -> x <> '') AS w
  FROM docs),
B AS (
  SELECT doc_id,
         CASE WHEN len(w) >= {n} THEN len(w) - {n} + 1 ELSE 0 END AS n_grams,
         CASE WHEN len(w) >= {n}
              THEN list_transform(range(1, len(w) - {n} + 2),
                   i -> array_to_string(list_slice(w, i, i + {n} - 1), ' '))
              ELSE [] END AS grams
  FROM W),
K AS (
  SELECT doc_id, gram, count(*) AS cnt
  FROM (SELECT doc_id, unnest(grams) AS gram FROM B) GROUP BY 1, 2),
T AS (
  SELECT doc_id, gram, cnt,
         row_number() OVER (PARTITION BY doc_id
                            ORDER BY cnt DESC, gram DESC) AS rn
  FROM K)
SELECT B.doc_id, B.n_grams, T.gram AS top_gram,
       coalesce(T.cnt, 0) AS top_count,
       CASE WHEN B.n_grams > 0
            THEN round(coalesce(T.cnt, 0)::double / B.n_grams, 6)
            ELSE 0.0 END AS top_frac
FROM B LEFT JOIN (SELECT * FROM T WHERE rn = 1) T USING (doc_id)
ORDER BY B.doc_id
"""


@pytest.mark.parametrize("src,n", [("crafted", 2), ("crafted", 3),
                                   ("sf_docs", 2)])
def test_top_ngram_stats_vs_duckdb(request, src, n):
    from guackg.ops.textstats import top_ngram_stats
    docs = request.getfixturevalue(src)
    got = _pdf(top_ngram_stats(docs, n=n))
    con = _duck(docs.select("doc_id", "text").toPandas())
    want = con.execute(TOPGRAM_SQL.format(n=n)).df()
    _assert_frames_equal(got, want)


def test_top_ngram_golden(crafted):
    from guackg.ops.textstats import top_ngram_stats
    got = {r.doc_id: (r.n_grams, r.top_gram, r.top_count, r.top_frac)
           for r in top_ngram_stats(crafted, n=2).collect()}
    assert got[5] == (6, "a b", 3, 0.5)
    # doc 6 grams: 'x y', 'y y', 'y x' (the \n is whitespace), all
    # count 1 -> tie-break keeps the lexicographically largest
    assert got[6] == (3, "y y", 1, round(1 / 3, 6))
    assert got[7] == (0, None, 0, 0.0)
    assert got[3] == (0, None, 0, 0.0)


PII_SQL = """
SELECT doc_id,
  coalesce(len(regexp_extract_all(text, ?)), 0) AS n_emails,
  coalesce(len(regexp_extract_all(
      regexp_replace(text, ?, '<EMAIL>', 'g'), ?)), 0) AS n_ips,
  coalesce(len(regexp_extract_all(
      regexp_replace(regexp_replace(text, ?, '<EMAIL>', 'g'),
                     ?, '<IP>', 'g'), ?)), 0) AS n_phones,
  regexp_replace(regexp_replace(regexp_replace(text, ?, '<EMAIL>', 'g'),
                                ?, '<IP>', 'g'),
                 ?, '<PHONE>', 'g') AS redacted
FROM docs ORDER BY doc_id
"""


@pytest.mark.parametrize("src", ["crafted", "sf_docs"])
def test_pii_redact_vs_duckdb(request, src):
    from guackg.ops.pii import PII_EMAIL, PII_IPV4, PII_PHONE, pii_redact
    docs = request.getfixturevalue(src)
    got = _pdf(pii_redact(docs))
    con = _duck(docs.select("doc_id", "text").toPandas())
    e, i, p = PII_EMAIL, PII_IPV4, PII_PHONE
    want = con.execute(PII_SQL, [e, e, i, e, i, p, e, i, p]).df()
    _assert_frames_equal(got, want)


def test_pii_redact_golden(crafted):
    from guackg.ops.pii import pii_redact
    got = {r.doc_id: r for r in pii_redact(crafted).collect()}
    r8 = got[8]
    assert (r8.n_emails, r8.n_ips, r8.n_phones) == (2, 0, 0)
    assert r8.redacted == "mail me at <EMAIL> or <EMAIL> now"
    r9 = got[9]
    assert r9.n_emails == 0 and r9.n_ips == 2 and r9.n_phones == 1
    assert "<IP>" in r9.redacted and "<PHONE>" in r9.redacted
    assert "555" not in r9.redacted
    r3 = got[3]
    assert (r3.n_emails, r3.n_ips, r3.n_phones) == (0, 0, 0)
    assert r3.redacted is None


def test_clean_corpus_repetition_gate(spark):
    """The optional Gopher gate drops exactly the high-dup-line-frac
    docs that survived lang+quality, records them at stage
    'repetition', and stays off by default (schema aside, the default
    output is unchanged)."""
    from guackg.ops.clean import CLEAN_STAGES, clean_corpus
    good = ("the quick brown fox jumps over the lazy dog and then "
            "walks back home with a friend to rest for a while longer")
    # same quality-passing sentence stacked as 6 duplicate lines
    # (dup_line_frac 5/6) vs 6 distinct lines (frac 0). The varied
    # doc adds 18 unique words so its word-Jaccard vs `good` is
    # ~0.54 — safely below the 0.8 near-dup threshold (an earlier
    # draft landed at exactly 0.807, a flaky boundary)
    repetitive = "\n".join([good] * 6)
    varied = "\n".join(f"{good} plus unique{i} words{i} here{i}"
                       for i in range(6))
    docs = spark.createDataFrame(
        [(1, repetitive), (2, varied), (3, good)],
        "doc_id long, text string")
    gated = {r.doc_id: (r.stage, r.keep, r.dup_line_frac)
             for r in clean_corpus(docs, max_dup_line_frac=0.5).collect()}
    assert gated[1][0] == "repetition" and gated[1][1] is False
    assert gated[1][2] == round(5 / 6, 6)
    assert gated[2][0] == "kept"
    assert gated[3][0] == "kept"
    assert "repetition" in CLEAN_STAGES

    off = {r.doc_id: r.stage for r in clean_corpus(docs).collect()}
    assert off[1] == "kept"  # gate disabled by default


PARDEDUP_SQL = """
WITH L AS (SELECT doc_id, text, string_split(text, chr(10)) AS ls FROM docs),
P AS (
  SELECT doc_id, s['pos'] AS pos, s['par'] AS par,
         md5(lower(s['par'])) AS pkey
  FROM (SELECT doc_id, unnest(list_transform(range(1, len(ls) + 1),
          i -> {'pos': i, 'par': trim(ls[i])})) AS s FROM L)
  WHERE s['par'] <> ''),
K AS (SELECT *, row_number() OVER (PARTITION BY pkey
                                   ORDER BY doc_id, pos) AS rn FROM P),
R AS (SELECT doc_id, string_agg(par, chr(10) ORDER BY pos) AS text_dedup,
             count(*) AS n_kept
      FROM K WHERE rn = 1 GROUP BY doc_id),
T AS (SELECT doc_id, count(*) AS n_pars FROM P GROUP BY doc_id)
SELECT d.doc_id,
  CASE WHEN d.text IS NULL THEN NULL
       ELSE coalesce(R.text_dedup, '') END AS text_dedup,
  coalesce(T.n_pars, 0) AS n_pars,
  coalesce(T.n_pars, 0) - coalesce(R.n_kept, 0) AS n_dropped
FROM docs d LEFT JOIN T USING (doc_id) LEFT JOIN R USING (doc_id)
ORDER BY d.doc_id
"""


@pytest.mark.parametrize("src", ["crafted", "sf_docs"])
def test_paragraph_dedup_vs_duckdb(request, src):
    from guackg.ops.dedup import paragraph_dedup
    docs = request.getfixturevalue(src)
    got = _pdf(paragraph_dedup(docs))
    con = _duck(docs.select("doc_id", "text").toPandas())
    want = con.execute(PARDEDUP_SQL).df()
    _assert_frames_equal(got, want)


def test_paragraph_dedup_golden(spark):
    """Within-doc and cross-doc duplicate paragraphs keep only the
    globally-first (doc_id, pos) occurrence; identity is
    case-insensitive trimmed; NULL text passes through as NULL and an
    all-boilerplate doc collapses to ''."""
    from guackg.ops.dedup import paragraph_dedup
    docs = spark.createDataFrame(
        [(1, "Home | About\nUnique content one\nHome | About"),
         (2, "home | about\nUnique content two"),
         (3, None),
         (4, "Home | About")],
        "doc_id long, text string")
    got = {r.doc_id: (r.text_dedup, r.n_pars, r.n_dropped)
           for r in paragraph_dedup(docs).collect()}
    assert got[1] == ("Home | About\nUnique content one", 3, 1)
    assert got[2] == ("Unique content two", 2, 1)
    assert got[3] == (None, 0, 0)
    assert got[4] == ("", 1, 1)


def test_clean_corpus_paragraph_composition(spark):
    """drop_dup_paragraphs=True must equal running clean_corpus over
    the explicitly paragraph-deduped corpus (the composition law), and
    the rewrite changes gate outcomes the way RefinedWeb ordering
    predicts: a doc that is boilerplate + thin content dies at the
    quality gate once the shared boilerplate is stripped."""
    from guackg.ops.clean import clean_corpus
    from guackg.ops.dedup import paragraph_dedup
    from pyspark.sql import functions as F
    good = ("the quick brown fox jumps over the lazy dog and then "
            "walks back home with a friend to rest for a while longer")
    boiler = "home about contact the site for all of the best things"
    docs = spark.createDataFrame(
        [(1, f"{boiler}\n{good}"),
         (2, f"{boiler}\nthe end"),     # boilerplate + thin content
         # ('the end' keeps the lang gate green — stopword present —
         #  but alone is under the 50-char quality floor)
         (3, None)],
        "doc_id long, text string")

    composed = {tuple(r) for r in
                clean_corpus(docs, drop_dup_paragraphs=True).collect()}
    rewritten = paragraph_dedup(docs).select(
        "doc_id", F.col("text_dedup").alias("text"))
    manual = {tuple(r) for r in clean_corpus(rewritten).collect()}
    assert composed == manual

    by_id = {r[0]: r for r in composed}
    # doc 1 keeps the boilerplate (first occurrence) and survives
    assert by_id[1][4] == "kept"
    # doc 2 loses the boilerplate; 'the end' alone fails the quality
    # length floor -> dropped at 'quality' (without the rewrite it
    # would have passed: boiler+content is > 50 chars and stopworded)
    assert by_id[2][4] == "quality"
    plain = {r.doc_id: r.stage for r in clean_corpus(docs).collect()}
    assert plain[2] == "kept"


@pytest.mark.parametrize("rate", [0.0, 0.25, 0.5, 1.0])
def test_hash_sample_vs_duckdb(sf_docs, rate):
    """Deterministic md5-threshold sampling: exact row-set parity with
    the same predicate in DuckDB, repeatable run-to-run, and rate
    roughly honored by hash uniformity."""
    from guackg.ops.dedup import hash_sample
    got = {r.doc_id for r in
           hash_sample(sf_docs, rate).select("doc_id").collect()}
    con = _duck(sf_docs.select("doc_id").toPandas())
    threshold = format(int(rate * (1 << 128)), "032x") if 0 < rate < 1 \
        else None
    if rate <= 0:
        want = set()
    elif rate >= 1:
        want = {r[0] for r in
                con.execute("SELECT doc_id FROM docs").fetchall()}
    else:
        want = {r[0] for r in con.execute(
            "SELECT doc_id FROM docs "
            "WHERE md5(CAST(doc_id AS VARCHAR)) < ?",
            [threshold]).fetchall()}
    assert got == want
    if 0 < rate < 1:
        n = sf_docs.count()
        assert abs(len(got) / n - rate) < 0.12   # uniformity, 500 docs
    # repeatable
    again = {r.doc_id for r in
             hash_sample(sf_docs, rate).select("doc_id").collect()}
    assert got == again


@pytest.mark.parametrize("rates,default", [
    ({"en": 0.5, "de": 0.1}, 0.0),
    ({"en": 1.0}, 0.25),
    ({}, 0.3),
])
def test_stratified_hash_sample_vs_duckdb(sf_docs, rates, default):
    """Per-stratum md5-threshold sampling replays exactly in DuckDB
    (same CASE map over the same hex compare)."""
    from guackg.ops.dedup import stratified_hash_sample
    got = (stratified_hash_sample(sf_docs, rates, "lang", default)
           .select("doc_id").toPandas().sort_values("doc_id")
           .reset_index(drop=True))
    def thr(r):
        return "g" if r >= 1 else format(int(max(r, 0.0) * (1 << 128)),
                                         "032x")
    branches = " ".join(
        f"WHEN lang = '{v}' THEN '{thr(r)}'"
        for v, r in sorted(rates.items()))
    case = (f"CASE {branches} ELSE '{thr(default)}' END"
            if branches else f"'{thr(default)}'")
    con = duckdb.connect()
    con.register("docs", sf_docs.toPandas())
    want = con.execute(
        f"SELECT doc_id FROM docs WHERE md5(doc_id::VARCHAR) < {case} "
        f"ORDER BY doc_id").df()
    pd.testing.assert_frame_equal(got, want, check_dtype=False)


def test_stratified_hash_sample_rate_one_and_null(spark):
    """rate 1.0 keeps the whole stratum (the 'g' sentinel outranks
    every hex digest); NULL strata fall to default; NULL keys never
    sample."""
    from guackg.ops.dedup import stratified_hash_sample
    df = spark.createDataFrame(
        [(1, "en"), (2, "en"), (3, None), (4, "de")],
        "doc_id long, lang string")
    kept = {r.doc_id for r in stratified_hash_sample(
        df, {"en": 1.0}, "lang", default_rate=0.0).collect()}
    assert kept == {1, 2}
    all_kept = {r.doc_id for r in stratified_hash_sample(
        df, {}, "lang", default_rate=1.0).collect()}
    assert all_kept == {1, 2, 3, 4}


def test_stratified_null_stratum_uses_default_rate(spark):
    """A NULL stratum is 'not in the rates map': it samples at
    default_rate via the same md5 threshold (sampleBy's
    not-in-fractions rule, generalized)."""
    from guackg.ops.dedup import hash_sample, stratified_hash_sample
    df = spark.createDataFrame(
        [(i, None) for i in range(200)], "doc_id long, lang string")
    got = {r.doc_id for r in stratified_hash_sample(
        df, {"en": 0.9}, "lang", default_rate=0.3).collect()}
    want = {r.doc_id for r in hash_sample(df, 0.3).collect()}
    assert got == want and 0 < len(got) < 200
