"""Multimodal columns: image/audio/video as opaque `binary` payloads
with typed metadata — the training-data-pipeline extension of guac's
blob-envelope Document model (/root/reference/pkg/handler/processor/
processor.go:33-39: Blob []byte + Type/Format/Encoding metadata) and
its extension-driven decode (process/process.go:217-253).

Image decode is REAL: image payloads are spec-valid grayscale PNGs
(guackg/testing/png.py writes them with stdlib zlib/struct — no
PIL/ffmpeg needed) and `decode_media` parses the actual bytes —
signature check, IHDR width/height, zlib-inflated filter-0 scanlines
— then histograms the decoded pixels. Malformed/non-PNG image bytes
become quarantine rows (NULL dims), the validate/quarantine
convention (P4). Audio/video carry no real codec in this container,
so their rows report NULL dims and CONTENT features (a byte
histogram of the body — honest signal extraction, not a pretend
decode); a real codec drops into the same mapInPandas slot.

- `as_media_table`  — wrap a documents table into (media_id, kind,
  payload); audio/video payloads carry a 4-byte magic header (the
  format-guesser hook, guesser/guesser.go:25-51).
- `with_png_payloads` — replace image rows' payloads with real PNGs
  (dims a pure function of media_id, pixels from the doc text) via
  mapInPandas; fixture-side generation for tests/bench.
- `media_metadata`  — JVM-side sniff: magic → format (PNG signature
  included), byte length, sha256 content identity.
- `decode_media`    — mapInPandas: payload → (width, height,
  n_frames, features array<float>); real PNG parse for images.
- `sample_frames`   — mapInPandas 1→N: fixed-stride "frame" chunks
  of video payloads (the DocumentTree unpack shape,
  processor/jsonlines/jsonlines.go:45-65).
"""

from __future__ import annotations

import struct
import zlib
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (ArrayType, BinaryType, FloatType, IntegerType,
                               LongType, StringType, StructField, StructType)

_MAGIC = {"image": b"IMG0", "audio": b"AUD0", "video": b"VID0"}
_FORMAT_OF_MAGIC = {"IMG0": "img", "AUD0": "aud", "VID0": "vid"}
_PNG_SIG = b"\x89PNG\r\n\x1a\n"


def as_media_table(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Deterministically wrap a documents table as opaque media rows:
    kind cycles by doc_id, payload = magic header + utf-8 bytes (a
    stand-in blob whose byte content is reproducible in any engine —
    the oracle re-derives it in DuckDB)."""
    kind = (F.when(F.col("doc_id") % 3 == 0, "image")
            .when(F.col("doc_id") % 3 == 1, "audio")
            .otherwise("video"))
    magic = (F.when(F.col("kind") == "image", F.lit("IMG0"))
             .when(F.col("kind") == "audio", F.lit("AUD0"))
             .otherwise(F.lit("VID0")))
    return (docs
            .select(F.col("doc_id").alias("media_id"), kind.alias("kind"),
                    F.col(text_col).alias("_txt"))
            .withColumn("payload",
                        F.encode(F.concat(magic, F.col("_txt")), "utf-8"))
            .drop("_txt"))


def png_dims_for(media_id: int) -> tuple[int, int]:
    """Fixture image dimensions: a pure function of media_id, so the
    DuckDB oracle can derive the EXPECTED IHDR bytes independently
    and the gate compares them with what the real payload carries."""
    return 8 + media_id % 24, 8 + media_id % 16


def with_png_payloads(media: DataFrame) -> DataFrame:
    """Replace image rows' payloads with REAL grayscale PNGs
    (testing/png.py encoder): dims from png_dims_for(media_id),
    pixels = the row's former text body truncated/zero-padded to
    width*height. Non-image rows pass through byte-identical. A
    narrow mapInPandas over the image partition only — fixture
    generation, not the query hot path."""
    from guackg.testing.png import encode_png

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = []
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                body = bytes(payload)[4:] if payload is not None else b""
                w, h = png_dims_for(int(mid))
                payloads.append(encode_png(w, h, body))
            pdf = pdf.copy()
            pdf["payload"] = payloads
            yield pdf

    img = (media.filter(F.col("kind") == "image")
           .select("media_id", "kind", "payload")
           .mapInPandas(gen, schema="media_id long, kind string, "
                                    "payload binary"))
    return img.unionByName(
        media.filter(F.col("kind") != "image")
        .select("media_id", "kind", "payload"))


def media_metadata(media: DataFrame) -> DataFrame:
    """Typed metadata from the opaque payload, all JVM-side: magic
    sniff → format (UNKNOWN passthrough like DocumentType UNKNOWN;
    the 8-byte PNG signature recognized alongside the synthetic
    magics), byte length, sha256 identity (the artifact digest
    analog, backends/inmem/artifact.go:119-120)."""
    magic = F.decode(F.expr("substring(payload, 1, 4)"), "utf-8")
    fmt = F.coalesce(
        F.when(F.hex(F.expr("substring(payload, 1, 8)"))
               == _PNG_SIG.hex().upper(), F.lit("png")),
        *[F.when(magic == m, F.lit(f))
          for m, f in _FORMAT_OF_MAGIC.items()],
        F.lit("unknown"))
    return media.select(
        "media_id", "kind",
        fmt.alias("format"),
        F.length("payload").alias("n_bytes"),
        F.sha2("payload", 256).alias("payload_sha256"),
    )


_DECODE_SCHEMA = StructType([
    StructField("media_id", LongType()),
    StructField("kind", StringType()),
    StructField("width", IntegerType()),
    StructField("height", IntegerType()),
    StructField("n_frames", IntegerType()),
    StructField("features", ArrayType(FloatType())),
])

_N_FEATURES = 16


def parse_png(payload: bytes) -> tuple[int, int, np.ndarray]:
    """Real PNG parse, stdlib-only: signature check, IHDR
    width/height (big-endian at bytes 16..23), IDAT chunks inflated
    and de-filtered (filter type 0 — what the fixture encoder writes;
    other filter types raise, which the caller quarantines). Returns
    (width, height, pixel array)."""
    if len(payload) < 33 or payload[:8] != _PNG_SIG:
        raise ValueError("not a PNG")
    if payload[12:16] != b"IHDR":
        raise ValueError("IHDR not first chunk")
    width, height = struct.unpack(">II", payload[16:24])
    bit_depth, color_type = payload[24], payload[25]
    if bit_depth != 8 or color_type != 0:
        raise ValueError(f"unsupported PNG mode {bit_depth}/{color_type}")
    idat = bytearray()
    pos = 8
    while pos + 8 <= len(payload):
        (length,) = struct.unpack(">I", payload[pos:pos + 4])
        tag = payload[pos + 4:pos + 8]
        if tag == b"IDAT":
            idat += payload[pos + 8:pos + 8 + length]
        if tag == b"IEND":
            break
        pos += 12 + length  # len + tag + data + crc
    raw = zlib.decompress(bytes(idat))
    if len(raw) != height * (width + 1):
        raise ValueError("scanline size mismatch")
    rows = np.frombuffer(raw, dtype=np.uint8).reshape(height, width + 1)
    if rows.size and not (rows[:, 0] == 0).all():
        raise ValueError("unsupported scanline filter")
    return width, height, rows[:, 1:].reshape(-1)


def _decode_batch(pdf: pd.DataFrame) -> pd.DataFrame:
    """One Arrow batch → decoded rows. Images: REAL PNG parse
    (parse_png above) — dims from the actual IHDR bytes, features
    from the actual inflated pixels; malformed image bytes become a
    quarantine row (NULL dims/features), never a task failure.
    Audio/video: NULL dims (no codec in this container — a real one
    plugs into this exact slot), content byte-histogram features."""
    out = {"media_id": [], "kind": [], "width": [], "height": [],
           "n_frames": [], "features": []}
    for mid, kind, payload in zip(pdf["media_id"], pdf["kind"],
                                  pdf["payload"]):
        w = h = n_frames = feats = None
        if kind == "image":
            try:
                w, h, px = parse_png(bytes(payload))
                n_frames = 1
                hist = np.bincount(px >> 4, minlength=_N_FEATURES)
                feats = (hist / max(1, px.size)).astype(
                    np.float32).tolist()
            except (ValueError, TypeError, zlib.error):
                pass  # quarantine row: NULL dims/features
        else:
            # NULL payload (a doc with NULL text upstream): keep the
            # quarantine convention — no np.frombuffer(None) crash
            buf = (np.frombuffer(payload, dtype=np.uint8)
                   if payload is not None
                   else np.empty(0, dtype=np.uint8))
            body = buf[4:]  # strip magic
            n_frames = 1 if kind != "video" else max(1, body.size // 256)
            hist = np.bincount(body >> 4, minlength=_N_FEATURES) \
                if body.size else np.zeros(_N_FEATURES, dtype=np.int64)
            feats = (hist / max(1, body.size)).astype(np.float32).tolist()
        out["media_id"].append(mid)
        out["kind"].append(kind)
        out["width"].append(w)
        out["height"].append(h)
        out["n_frames"].append(n_frames)
        out["features"].append(feats)
    return pd.DataFrame(out)


def decode_media(media: DataFrame) -> DataFrame:
    """payload → (width, height, n_frames, features) via mapInPandas.
    Arrow-batched, no per-row Python at the Spark boundary; the batch
    body is vectorized numpy. Partitioning passes through — decode is
    a narrow map, no shuffle."""
    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield _decode_batch(pdf)

    return (media.select("media_id", "kind", "payload")
            .mapInPandas(gen, schema=_DECODE_SCHEMA))


_FRAME_SCHEMA = StructType([
    StructField("media_id", LongType()),
    StructField("frame_idx", IntegerType()),
    StructField("frame", BinaryType()),
])


def sample_frames(media: DataFrame, frame_bytes: int = 64,
                  every_n: int = 4) -> DataFrame:
    """Video payload → every-nth fixed-stride chunk as a "frame" row
    (1→N batch shape; the real ffmpeg keyframe sampler drops into this
    exact mapInPandas slot). Non-video rows pass through with 0
    frames emitted."""
    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = {"media_id": [], "frame_idx": [], "frame": []}
            for mid, kind, payload in zip(pdf["media_id"], pdf["kind"],
                                          pdf["payload"]):
                if kind != "video" or payload is None:
                    continue
                body = bytes(payload)[4:]
                n = max(1, len(body) // frame_bytes)
                for i in range(0, n, every_n):
                    rows["media_id"].append(mid)
                    rows["frame_idx"].append(i)
                    rows["frame"].append(
                        body[i * frame_bytes:(i + 1) * frame_bytes])
            yield pd.DataFrame(rows)

    return (media.select("media_id", "kind", "payload")
            .mapInPandas(gen, schema=_FRAME_SCHEMA))
