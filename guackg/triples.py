"""Stage 2 — TRIPLES: extracted text → (subj, pred, obj) mention triples.

Reimagines the reference's parser stage — `DocumentParser.GetPredicates`
turning a blob into typed edge lists
(/root/reference/pkg/ingestor/parser/common/types.go:25-41; the SPDX
model parser, parser/spdx/parse_spdx.go) — as ONE vectorized
`mapInPandas` UDTF: each input row (page) yields 0..N triple rows.

Semantics carried over from the reference:
- direction normalization: inverse predicate surfaces swap
  subject/object, like DEPENDS_ON vs DEPENDENCY_OF
  (parse_spdx.go:263-304, rel maps :434-453).
- lineage stamping: every triple carries (url, warc_ts, extractor)
  provenance, like guac stamping Collector/Origin onto every predicate
  (pkg/ingestor/parser/graph_builder.go:61-110).
- per-page document node: sha256 of the page blob identifies the page
  itself (HasSBOM-digest analog, parser/common/helpers.go:110-123) —
  emitted as a `mentions` edge page→entity.

Grammar (matches the corpus spec in guackg/testing/gen.py):
sentences end at ". "; a mention is a maximal run of capitalized
tokens ([A-Z0-9][\\w'-]*, 'The' allowed); a triple requires
  <mention-span> <predicate-surface> <mention-span> [end of sentence]
with the predicate surface from the closed lexicon, longest match
first.
"""

from __future__ import annotations

import re
from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (StringType, StructField, StructType,
                               TimestampType)

from guackg.vocab import ALL_PRED_SURFACES, PRED_SURFACES_BY_LEN

EXTRACTOR_VERSION = "guackg-openie-0.1"

_SENT_SPLIT_RE = re.compile(r"(?<=\.)[ \t]+|\n+")
_CAP_TOKEN_RE = re.compile(r"^[A-Z0-9][\w'-]*$")
# one regex over the whole lexicon, longest alternative first
_PRED_RE = re.compile(
    r"\b(" + "|".join(re.escape(s) for s in PRED_SURFACES_BY_LEN) + r")\b")

TRIPLE_SCHEMA = StructType([
    StructField("url", StringType()),
    StructField("warc_ts", TimestampType()),
    StructField("subj_surface", StringType()),
    StructField("pred", StringType()),
    StructField("obj_surface", StringType()),
    StructField("extractor", StringType()),
])


def _cap_span_back(tokens: list[str]) -> list[str]:
    """Maximal trailing run of capitalized tokens."""
    out: list[str] = []
    for t in reversed(tokens):
        if _CAP_TOKEN_RE.match(t):
            out.append(t)
        else:
            break
    out.reverse()
    return out


def _cap_span_fwd(tokens: list[str]) -> list[str]:
    out: list[str] = []
    for t in tokens:
        if _CAP_TOKEN_RE.match(t):
            out.append(t)
        else:
            break
    return out


def extract_triples_from_text(text: str) -> list[tuple[str, str, str]]:
    """Pure text → [(subj_surface, pred_id, obj_surface)]."""
    out: list[tuple[str, str, str]] = []
    for sent in _SENT_SPLIT_RE.split(text):
        sent = sent.strip()
        if sent.endswith("."):
            sent = sent[:-1]
        if not sent:
            continue
        for m in _PRED_RE.finditer(sent):
            pred_surface = m.group(1)
            pred, inverse = ALL_PRED_SURFACES[pred_surface]
            subj_toks = _cap_span_back(sent[: m.start()].split())
            obj_toks = _cap_span_fwd(sent[m.end():].split())
            if not subj_toks or not obj_toks:
                continue
            subj, obj = " ".join(subj_toks), " ".join(obj_toks)
            if inverse:
                subj, obj = obj, subj
            out.append((subj, pred, obj))
    return out


def extract_triples(pages_with_text: DataFrame,
                    text_col: str = "extracted_text") -> DataFrame:
    """pages(url, warc_ts, <text_col>, lang) → triples DataFrame.

    Scale shape: the lang filter is a Catalyst predicate pushed into
    the scan (non-en pages never reach Python); mapInPandas streams
    Arrow batches — no per-row Python, no driver collect. Output is
    the 'IngestPredicates' analog: one row per (page, triple) with
    lineage columns.
    """
    src = pages_with_text.filter(F.col("lang") == "en").select(
        "url", "warc_ts", F.col(text_col).alias("text"))

    def udtf(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            urls, tss, subjs, preds, objs = [], [], [], [], []
            for url, ts, text in zip(pdf["url"], pdf["warc_ts"], pdf["text"]):
                if not text:
                    continue
                for s, p, o in extract_triples_from_text(text):
                    urls.append(url)
                    tss.append(ts)
                    subjs.append(s)
                    preds.append(p)
                    objs.append(o)
            yield pd.DataFrame({
                "url": pd.Series(urls, dtype="object"),
                "warc_ts": pd.Series(tss, dtype="datetime64[us]"),
                "subj_surface": pd.Series(subjs, dtype="object"),
                "pred": pd.Series(preds, dtype="object"),
                "obj_surface": pd.Series(objs, dtype="object"),
                "extractor": pd.Series([EXTRACTOR_VERSION] * len(urls),
                                       dtype="object"),
            })

    return src.mapInPandas(udtf, schema=TRIPLE_SCHEMA)


def page_nodes(pages: DataFrame) -> DataFrame:
    """Per-page document node: sha256(html) identity (HasSBOM-digest
    analog, helpers.go:110-123). Pure built-ins — JVM-side."""
    return pages.select(
        F.col("url"),
        F.col("warc_ts"),
        F.sha2(F.col("html"), 256).alias("page_sha256"),
    )
