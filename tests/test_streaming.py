"""Structured-Streaming ingestion: AvailableNow trigger + checkpoint
resume — the durable-consumer semantics of the reference's NATS
deployment mode (nats_emitter.go:31-42; polling file collector,
collector/file/file.go:105-122)."""

import os

import pytest


@pytest.fixture(scope="module")
def pages_dir(tmp_path_factory, pages_df):
    d = str(tmp_path_factory.mktemp("stream_pages"))
    pages_df.limit(100).write.mode("overwrite").parquet(d)
    return d


def test_stream_matches_batch_and_resumes(spark, pages_df, pages_dir,
                                          tmp_path_factory):
    from guackg.extract import extract, split_quarantine
    from guackg.streaming import stream_pages_to_triples
    from guackg.triples import extract_triples

    out_dir = str(tmp_path_factory.mktemp("stream_out"))

    q = stream_pages_to_triples(spark, pages_dir, out_dir)
    q.awaitTermination(300)

    got = spark.read.parquet(os.path.join(out_dir, "triples_stream"))
    batch_pages = spark.read.parquet(pages_dir)
    ok, _ = split_quarantine(extract(batch_pages))
    want = extract_triples(
        ok.select("url", "warc_ts", "lang", "extracted_text"))
    # stream == batch on the same input (shared DataFrame code)
    assert got.count() == want.count()
    cols = ["url", "subj_surface", "pred", "obj_surface"]
    assert (got.select(cols).exceptAll(want.select(cols)).count() == 0)

    # append new files → resume processes ONLY the increment
    n_before = got.count()
    pages_df.limit(150).write.mode("append").parquet(pages_dir)
    q2 = stream_pages_to_triples(spark, pages_dir, out_dir)
    q2.awaitTermination(300)
    n_after = spark.read.parquet(
        os.path.join(out_dir, "triples_stream")).count()
    assert n_after > n_before
    # no reprocessing: total == batch-run over the full directory
    ok2, _ = split_quarantine(extract(spark.read.parquet(pages_dir)))
    want2 = extract_triples(
        ok2.select("url", "warc_ts", "lang", "extracted_text"))
    assert n_after == want2.count()
