"""Multimodal columns: image/audio/video as opaque `binary` payloads
with typed metadata — the training-data-pipeline extension of guac's
blob-envelope Document model (/root/reference/pkg/handler/processor/
processor.go:33-39: Blob []byte + Type/Format/Encoding metadata) and
its extension-driven decode (process/process.go:217-253).

Spark-side plumbing (schemas, partitioning, Arrow batch shapes) is
real and tested; the actual image decode is a DECODE STUB — this
container ships no PIL/ffmpeg, so `decode_media` tries the real
library and falls back to a clearly-marked deterministic fake that is
a pure function of the payload bytes (so tests are stable and the
Arrow dataflow is exercised end-to-end).

- `as_media_table`  — wrap a documents table into (media_id, kind,
  payload, meta); payload carries a 4-byte magic header per kind
  (the format-guesser hook, guesser/guesser.go:25-51).
- `media_metadata`  — JVM-side sniff: magic → format, byte length,
  sha256 content identity. Exact DuckDB oracle.
- `decode_media`    — mapInPandas: payload → (width, height,
  n_frames, features array<float>); PIL if importable, else the
  deterministic stub (byte-histogram features — real vectorized
  numpy over Arrow batches either way).
- `sample_frames`   — mapInPandas 1→N: fixed-stride "frame" chunks
  of video payloads (the DocumentTree unpack shape,
  processor/jsonlines/jsonlines.go:45-65).
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (ArrayType, BinaryType, FloatType, IntegerType,
                               LongType, StringType, StructField, StructType)

_MAGIC = {"image": b"IMG0", "audio": b"AUD0", "video": b"VID0"}
_FORMAT_OF_MAGIC = {"IMG0": "img", "AUD0": "aud", "VID0": "vid"}


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


def media_metadata(media: DataFrame) -> DataFrame:
    """Typed metadata from the opaque payload, all JVM-side: magic
    sniff → format (UNKNOWN passthrough like DocumentType UNKNOWN),
    byte length, sha256 identity (the artifact digest analog,
    backends/inmem/artifact.go:119-120)."""
    magic = F.decode(F.expr("substring(payload, 1, 4)"), "utf-8")
    fmt = F.coalesce(
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


def _decode_batch(pdf: pd.DataFrame) -> pd.DataFrame:
    """One Arrow batch → decoded rows. Tries PIL; otherwise the
    DECODE STUB: dims from the first payload bytes, features = L1-
    normalized 16-bin byte histogram (pure function of bytes)."""
    try:  # pragma: no cover - PIL not shipped in this container
        from PIL import Image  # noqa: F401
        have_pil = True
    except ImportError:
        have_pil = False

    out = {"media_id": [], "kind": [], "width": [], "height": [],
           "n_frames": [], "features": []}
    for mid, kind, payload in zip(pdf["media_id"], pdf["kind"],
                                  pdf["payload"]):
        # NULL payload (e.g. a doc with NULL text upstream): quarantine
        # row — metadata handles it as 'unknown'; decode must not kill
        # the task on np.frombuffer(None)
        buf = (np.frombuffer(payload, dtype=np.uint8)
               if payload is not None
               else np.empty(0, dtype=np.uint8))
        body = buf[4:]  # strip magic
        if have_pil and kind == "image":  # pragma: no cover
            # real path: Image.open(io.BytesIO(payload)) → size/pixels
            raise NotImplementedError(
                "real image decode requires real image payloads; "
                "this sandbox ships synthetic blobs only")
        # DECODE STUB — deterministic pseudo-dimensions from content
        w = int(16 + (int(body[:8].sum()) % 48)) if body.size else 16
        h = int(16 + (int(body[8:16].sum()) % 48)) if body.size >= 16 else 16
        n_frames = 1 if kind != "video" else max(1, body.size // 256)
        hist = np.bincount(body >> 4, minlength=_N_FEATURES) if body.size \
            else np.zeros(_N_FEATURES, dtype=np.int64)
        feats = (hist / max(1, body.size)).astype(np.float32)
        out["media_id"].append(mid)
        out["kind"].append(kind)
        out["width"].append(w)
        out["height"].append(h)
        out["n_frames"].append(n_frames)
        out["features"].append(feats.tolist())
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
