"""Sequence packing (ops/pack.py): the distributed two-phase prefix
sum must equal the single-threaded window oracle exactly (DuckDB),
and the manifest must tile every sequence with no gaps or overlaps —
structural invariants checked over crafted and sf corpora."""

import duckdb
import pandas as pd
import pytest
from pyspark.sql import functions as F

from guackg.ops.pack import pack_manifest, pack_sequences

SF_DIR = "/root/testdata/sf0.001"

# crafted: doc 3 is bigger than capacity (straddles several seqs),
# doc 4 has zero tokens, doc 6 lands exactly on a boundary
CRAFTED = [(1, 7), (2, 9), (3, 35), (4, 0), (5, 1), (6, 12)]
CAP = 16


@pytest.fixture(scope="module")
def crafted(spark):
    return spark.createDataFrame(CRAFTED, "doc_id long, n_tokens long")


@pytest.fixture(scope="module")
def sf_tokens(spark):
    from guackg.ops.textstats import token_counts
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    return token_counts(docs).select(
        "doc_id", F.col("ws_tokens").alias("n_tokens"))


def _oracle(pdf: pd.DataFrame, cap: int) -> pd.DataFrame:
    con = duckdb.connect()
    con.register("t", pdf)
    return con.execute(f"""
        SELECT doc_id, CAST(n_tokens AS BIGINT) AS n_tokens,
               CAST(coalesce(sum(n_tokens) OVER (ORDER BY doc_id
                    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
                    0) AS BIGINT) AS start_token,
               CAST(coalesce(sum(n_tokens) OVER (ORDER BY doc_id
                    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
                    0) // {cap} AS BIGINT) AS seq_id,
               CAST(coalesce(sum(n_tokens) OVER (ORDER BY doc_id
                    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
                    0) % {cap} AS BIGINT) AS seq_offset
        FROM t ORDER BY doc_id
    """).df()


@pytest.mark.parametrize("src,cap,parts", [
    ("crafted", CAP, 4), ("crafted", CAP, 1), ("crafted", 1, 3),
    ("sf_tokens", 512, 8), ("sf_tokens", 512, 32)])
def test_pack_vs_duckdb_window(request, src, cap, parts):
    df = request.getfixturevalue(src)
    got = (pack_sequences(df, cap, partitions=parts)
           .orderBy("doc_id").toPandas().reset_index(drop=True))
    want = _oracle(df.select("doc_id", "n_tokens").toPandas()
                   .sort_values("doc_id").reset_index(drop=True), cap)
    pd.testing.assert_frame_equal(got, want, check_dtype=False)


def test_manifest_tiles_exactly(crafted):
    m = pack_manifest(crafted, CAP, partitions=3).toPandas()
    total = sum(n for _, n in CRAFTED)
    # spans cover the stream exactly once
    assert m.n_tok_span.sum() == total
    assert (m.n_tok_span > 0).all()
    # every sequence but the last is filled to capacity, no overlaps
    by_seq = m.groupby("seq_id").n_tok_span.sum()
    last = by_seq.index.max()
    for seq, tok in by_seq.items():
        assert tok == (CAP if seq < last else total - CAP * last)
    # within a sequence, spans are disjoint and ordered
    for seq, grp in m.sort_values(["seq_id", "seq_offset"]).groupby(
            "seq_id"):
        pos = 0
        for _, r in grp.iterrows():
            assert r.seq_offset == pos
            pos += r.n_tok_span
    # doc-side spans reassemble each doc in order
    for doc, grp in m.sort_values(["doc_id", "doc_offset"]).groupby(
            "doc_id"):
        pos = 0
        for _, r in grp.iterrows():
            assert r.doc_offset == pos
            pos += r.n_tok_span
        assert pos == dict(CRAFTED)[doc]
    # zero-token doc emits no span
    assert 4 not in set(m.doc_id)


def test_empty_and_bad_capacity(spark, crafted):
    empty = spark.createDataFrame([], "doc_id long, n_tokens long")
    assert pack_sequences(empty, 16).count() == 0
    assert pack_manifest(empty, 16).count() == 0
    with pytest.raises(ValueError):
        pack_sequences(crafted, 0)


def test_partition_count_invariance(sf_tokens):
    a = pack_sequences(sf_tokens, 128, partitions=2) \
        .orderBy("doc_id").toPandas()
    b = pack_sequences(sf_tokens, 128, partitions=17) \
        .orderBy("doc_id").toPandas()
    pd.testing.assert_frame_equal(a.reset_index(drop=True),
                                  b.reset_index(drop=True))


def test_null_and_negative_token_counts_clamp(spark):
    """NULL (token_counts' NULL-text quarantine) and negative counts
    clamp to 0 tokens instead of corrupting every later placement."""
    df = spark.createDataFrame(
        [(1, 5), (2, None), (3, -7), (4, 3)],
        "doc_id long, n_tokens long")
    got = {r.doc_id: (r.n_tokens, r.start_token)
           for r in pack_sequences(df, 4, partitions=2).collect()}
    assert got == {1: (5, 0), 2: (0, 5), 3: (0, 5), 4: (3, 5)}
    m = pack_manifest(df, 4, partitions=2)
    assert {r.doc_id for r in m.collect()} == {1, 4}


def test_seq_id_exact_above_double_precision(spark):
    """seq_id/end_seq use integer `div`, not double `/`: with
    cumulative token counts past 2^53 the double path rounds and can
    disagree with the exact `%` used for seq_offset. Five docs of
    2^52 tokens each push start_token to 4*2^52 > 2^53."""
    from guackg.ops.pack import pack_sequences
    big = 1 << 52
    docs = spark.createDataFrame(
        [(f"d{i}", big) for i in range(5)],
        "doc_id string, n_tokens long")
    cap = 1000
    rows = pack_sequences(docs, cap, partitions=2).collect()
    assert len(rows) == 5
    for r in rows:
        assert r.seq_id * cap + r.seq_offset == r.start_token
        assert 0 <= r.seq_offset < cap
