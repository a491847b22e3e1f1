"""Multimodal binary-column plumbing + embedding near-dup operators.

Image decode is REAL: fixtures carry spec-valid grayscale PNGs
(guackg/testing/png.py, stdlib zlib/struct) and decode_media parses
the actual bytes — signature, IHDR dims, inflated filter-0 scanlines.
Audio/video have no codec in this container, so their rows are pinned
to NULL dims + content byte-histogram features (an honest signal, not
a pretend decode). These tests pin that contract plus the Spark-side
plumbing: schemas, Arrow batch dataflow, determinism, 1→N frames."""

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


@pytest.fixture(scope="module")
def png_media(media):
    from guackg.ops.multimodal import with_png_payloads
    return with_png_payloads(media)


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


def test_decode_media_deterministic_and_shaped(png_media):
    from guackg.ops.multimodal import decode_media, png_dims_for
    d1 = decode_media(png_media).orderBy("media_id").collect()
    d2 = decode_media(png_media).orderBy("media_id").collect()
    assert d1 == d2  # pure function of bytes
    n_images = 0
    for r in d1:
        if r.kind == "image":
            n_images += 1
            w, h = png_dims_for(r.media_id)
            # dims parsed from the ACTUAL IHDR bytes
            assert (r.width, r.height) == (w, h)
            assert r.n_frames == 1
        else:
            assert r.width is None and r.height is None
            if r.kind == "audio":
                assert r.n_frames == 1
            else:
                assert r.n_frames >= 1
        assert len(r.features) == 16
        assert abs(sum(r.features) - 1.0) < 1e-3  # L1-normalized histogram
    assert n_images > 0


def test_png_roundtrip_and_quarantine(spark):
    """encode_png → parse_png recovers exact dims and pixel bytes;
    malformed image payloads quarantine (NULL dims) instead of
    killing the Arrow task."""
    import numpy as np
    from guackg.ops.multimodal import decode_media, parse_png
    from guackg.testing.png import encode_png
    payload = encode_png(13, 7, b"hello png pixels " * 20)
    w, h, px = parse_png(payload)
    assert (w, h) == (13, 7) and px.size == 13 * 7
    expect = (b"hello png pixels " * 20)[: 13 * 7]
    assert bytes(px.tobytes()) == expect
    media = spark.createDataFrame(
        [(1, "image", payload), (2, "image", b"IMG0 not a png"),
         (3, "image", None)],
        "media_id long, kind string, payload binary")
    dec = {r.media_id: r for r in decode_media(media).collect()}
    assert (dec[1].width, dec[1].height) == (13, 7)
    hist = np.bincount(np.frombuffer(expect, np.uint8) >> 4, minlength=16)
    got = [round(f * px.size) for f in dec[1].features]
    assert got == hist.tolist()
    for bad in (2, 3):
        assert dec[bad].width is None and dec[bad].features is None


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
    assert dec[1].width is None and dec[1].n_frames is None  # quarantined
    assert dec[2].n_frames == 1 and dec[2].width is None
    frames = sample_frames(media).collect()
    assert frames and all(r.media_id == 3 for r in frames)
