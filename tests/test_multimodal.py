"""Multimodal binary-column plumbing + embedding near-dup operators.

The decode step is a documented DECODE STUB (no PIL/ffmpeg in this
container) — what these tests pin is the real Spark-side contract:
schemas, Arrow batch dataflow, determinism as a pure function of the
payload bytes, and the 1→N frame-sampling shape."""

import pytest
from pyspark.sql import functions as F

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def docs(spark):
    return spark.read.parquet(f"{SF_DIR}/documents.parquet")


@pytest.fixture(scope="module")
def media(docs):
    from guackg.ops.multimodal import as_media_table
    return as_media_table(docs)


def test_media_metadata_matches_payload(media):
    from guackg.ops.multimodal import media_metadata
    meta = media_metadata(media)
    rows = meta.collect()
    assert len(rows) == media.count()
    fmt_of_kind = {"image": "img", "audio": "aud", "video": "vid"}
    for r in rows:
        assert r.format == fmt_of_kind[r.kind]
        assert r.n_bytes > 4  # magic + non-empty body
        assert len(r.payload_sha256) == 64


def test_decode_media_deterministic_and_shaped(media):
    from guackg.ops.multimodal import decode_media
    d1 = decode_media(media).orderBy("media_id").collect()
    d2 = decode_media(media).orderBy("media_id").collect()
    assert d1 == d2  # pure function of bytes
    for r in d1:
        assert 16 <= r.width < 64 and 16 <= r.height < 64
        assert len(r.features) == 16
        assert abs(sum(r.features) - 1.0) < 1e-3  # L1-normalized histogram
        if r.kind != "video":
            assert r.n_frames == 1
        else:
            assert r.n_frames >= 1


def test_sample_frames_only_video_and_stride(media):
    from guackg.ops.multimodal import sample_frames
    frames = sample_frames(media, frame_bytes=64, every_n=4)
    kinds = (frames.join(media.select("media_id", "kind"), on="media_id")
             .select("kind").distinct().collect())
    assert {r.kind for r in kinds} == {"video"}
    idx = frames.select("frame_idx").distinct().collect()
    assert all(r.frame_idx % 4 == 0 for r in idx)
    # every video with a body emits at least frame 0
    n_videos = media.filter(F.col("kind") == "video").count()
    assert frames.select("media_id").distinct().count() == n_videos


def test_ngram_jaccard_catches_reordering(spark):
    """Word-set Jaccard sees reordered docs as identical; 3-gram
    shingles must not."""
    from guackg.ops.dedup import jaccard_word_pairs, ngram_jaccard_pairs
    df = spark.createDataFrame(
        [(1, "alpha beta gamma delta epsilon zeta"),
         (2, "zeta epsilon delta gamma beta alpha"),   # reordered
         (3, "alpha beta gamma delta epsilon zeta")],  # identical
        "doc_id long, text string")
    word = {(r.doc_a, r.doc_b): r.jaccard
            for r in jaccard_word_pairs(df, threshold=0.9).collect()}
    ngram = {(r.doc_a, r.doc_b): r.jaccard
             for r in ngram_jaccard_pairs(df, n=3, threshold=0.9).collect()}
    assert (1, 2) in word and (1, 3) in word
    assert (1, 3) in ngram and ngram[(1, 3)] == 1.0
    assert (1, 2) not in ngram


def test_embedding_near_dup_exact_vs_lsh_recall(spark):
    """Plant exact+noisy duplicates; LSH candidates + exact verify must
    recover ≥90% of the exact near-dup pairs with perfect precision."""
    import random
    from guackg.ops.similarity import (embedding_near_dup_lsh,
                                       embedding_near_dup_pairs)
    rnd = random.Random(7)
    base = [[rnd.gauss(0, 1) for _ in range(32)] for _ in range(60)]
    rows = [(i, [float(x) for x in v]) for i, v in enumerate(base)]
    # ids 1000+i: tiny-noise copies of i → cosine ≈ 1
    rows += [(1000 + i, [float(x + rnd.gauss(0, 0.01)) for x in v])
             for i, v in enumerate(base[:20])]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    exact = {(r.vec_a, r.vec_b)
             for r in embedding_near_dup_pairs(emb, threshold=0.95).collect()}
    approx = {(r.vec_a, r.vec_b)
              for r in embedding_near_dup_lsh(emb, threshold=0.95,
                                              n_planes=4,
                                              n_tables=16).collect()}
    assert {(i, 1000 + i) for i in range(20)} <= exact
    assert approx <= exact  # exact-verified ⇒ precision 1.0
    assert len(approx & exact) / len(exact) >= 0.9


def test_decode_and_frames_tolerate_null_payload(spark):
    """NULL payloads (e.g. NULL-text docs upstream) quarantine instead
    of killing the Arrow task: decode emits the empty-body stub row,
    the frame sampler emits nothing for them."""
    from guackg.ops.multimodal import decode_media, sample_frames
    media = spark.createDataFrame(
        [(1, "image", None), (2, "video", None),
         (3, "video", b"\x00\x01\x02\x03" + b"x" * 512)],
        "media_id long, kind string, payload binary")
    dec = {r.media_id: r for r in decode_media(media).collect()}
    assert set(dec) == {1, 2, 3}
    assert dec[1].width == 16 and dec[1].n_frames == 1
    frames = sample_frames(media).collect()
    assert frames and all(r.media_id == 3 for r in frames)
