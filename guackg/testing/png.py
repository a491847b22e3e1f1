"""Real PNG payloads for the multimodal fixtures — a pure-stdlib
(zlib + struct) encoder, so the decode op can retire its synthetic
stub and parse actual image bytes end-to-end in this container (no
PIL/ffmpeg shipped).

Produces minimal, spec-valid grayscale PNGs: signature, IHDR
(8-bit, color type 0), one zlib IDAT of filter-0 scanlines, IEND —
every chunk CRC-correct, so any standards-conforming reader decodes
them. The encoder is FIXTURE-side (guackg.testing): at deploy the
image bytes come from the corpus; the decoder in
guackg/ops/multimodal.py is the product code.
"""

from __future__ import annotations

import struct
import zlib

PNG_SIGNATURE = b"\x89PNG\r\n\x1a\n"


def _chunk(tag: bytes, data: bytes) -> bytes:
    return (struct.pack(">I", len(data)) + tag + data
            + struct.pack(">I", zlib.crc32(tag + data) & 0xFFFFFFFF))


def encode_png(width: int, height: int, pixels: bytes) -> bytes:
    """Grayscale 8-bit PNG of the given dimensions. `pixels` is
    truncated / zero-padded to exactly width*height bytes (row-major),
    so any byte source (here: a document's utf-8 text) becomes a
    deterministic, valid image."""
    if width <= 0 or height <= 0:
        raise ValueError(f"bad dimensions {width}x{height}")
    n = width * height
    buf = (pixels[:n] + b"\x00" * n)[:n]
    raw = b"".join(b"\x00" + buf[y * width:(y + 1) * width]
                   for y in range(height))
    ihdr = struct.pack(">IIBBBBB", width, height, 8, 0, 0, 0, 0)
    return (PNG_SIGNATURE + _chunk(b"IHDR", ihdr)
            + _chunk(b"IDAT", zlib.compress(raw))
            + _chunk(b"IEND", b""))
