"""Stage 2 — TRIPLES: extracted text → (subj, pred, obj) mention triples.

Reimagines the reference's parser stage — `DocumentParser.GetPredicates`
turning a blob into typed edge lists
(/root/reference/pkg/ingestor/parser/common/types.go:25-41; the SPDX
model parser, parser/spdx/parse_spdx.go) — as ONE vectorized
`mapInPandas` UDTF: each input row (page) yields 0..N triple rows.

PARSER REGISTRY (the reference's extensibility story —
parser/parser.go:43-60 registers 11 document parsers keyed by
DocumentType; the processor guesses the type first,
guesser/guesser.go:25-51): four dialects here, routed per row by a
format discriminator on the extracted text:

- "text"  — the sentence grammar below (free-form surface text with
  a closed predicate lexicon);
- "json"  — structured pages whose body is a compact JSON object
  `{"triples": [{"s": …, "p": pred_id, "o": …}, …]}` (the
  SPDX-JSON / JSON-LD analog: explicit, pre-normalized relations).
  Unknown predicate ids and malformed JSON are dropped row-wise —
  the parser-validation semantics of parse_spdx.go's rel map lookup
  (unknown relationship → skipped, never a crash);
- "tagvalue" — a `#KGTV` header then one `tag: value` line per field
  (the SPDX tag-value analog: a stateful line parser where a new
  `s:` tag starts a new record, exactly how a new `PackageName:`
  starts a new package in tag-value SPDX). Record boundaries are
  TAGS, not blank lines, because the extract stage's whitespace
  collapse (extract.py spec step 5) drops empty lines — the dialect
  is designed to survive its own ingest path. Incomplete records
  and unknown predicate ids are skipped row-wise;
- "advisory" — a `#KGADV` header then `equal: A == B` assertion
  lines (the CSAF/OpenVEX analog: parsers that emit VulnEqual/
  equality predicates straight from document content). Emits
  `same_as` triples that the pipeline routes into the
  canonicalizer's assertion stream, never into mention edges.

Every triple is stamped `extractor = {EXTRACTOR_VERSION}/{dialect}` —
per-parser lineage identity (the DSSE identity analog, T7), so
evidence from different dialects stays distinguishable downstream.

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

import json
import re
from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (StringType, StructField, StructType,
                               TimestampType)

from guackg.vocab import ALL_PRED_SURFACES, PRED_SURFACES_BY_LEN

EXTRACTOR_VERSION = "guackg-openie-0.4"

# valid predicate ids for the structured dialect (closed vocabulary —
# the rel-map validation of parse_spdx.go:434-453)
VALID_PRED_IDS = frozenset(p for p, _inv in ALL_PRED_SURFACES.values())

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


def parse_structured_json(text: str) -> list[tuple[str, str, str]]:
    """Structured dialect: compact JSON page → triples. Malformed
    documents and unknown predicate ids yield nothing (row-wise skip,
    never an exception — the processor's per-document error becomes a
    tombstone downstream)."""
    try:
        obj = json.loads(text)
    except (ValueError, TypeError):
        return []
    if not isinstance(obj, dict):
        return []
    triples = obj.get("triples")
    if not isinstance(triples, list):
        # {"triples": null} / a scalar: malformed, skip — iterating it
        # would raise and kill the whole mapInPandas task, not the row
        return []
    out: list[tuple[str, str, str]] = []
    for t in triples:
        if not isinstance(t, dict):
            continue
        s, p, o = t.get("s"), t.get("p"), t.get("o")
        if s and o and p in VALID_PRED_IDS:
            out.append((str(s), str(p), str(o)))
    return out


def parse_tag_value(text: str) -> list[tuple[str, str, str]]:
    """Tag-value dialect: stateful line parser (the SPDX tag-value
    shape — tag_value parsing where a designated tag opens a new
    element). `s:` starts a record; `p:`/`o:` fill it; a record emits
    when all three are present AND the predicate id is in the closed
    vocabulary (rel-map validation, parse_spdx.go:434-453). Repeated
    tags before completion overwrite (last wins); unknown tags and
    junk lines are skipped; nothing raises — a malformed document
    yields 0..N valid records, never a task failure."""
    out: list[tuple[str, str, str]] = []
    s = p = o = None
    for line in text.splitlines():
        tag, sep, val = line.partition(":")
        if not sep:
            continue
        tag, val = tag.strip().lower(), val.strip()
        if tag == "s":
            if s and o and p in VALID_PRED_IDS:
                out.append((s, p, o))
            s, p, o = val or None, None, None
        elif tag == "p":
            p = val or None
        elif tag == "o":
            o = val or None
    if s and o and p in VALID_PRED_IDS:
        out.append((s, p, o))
    return out


# the equivalence predicate advisory documents assert. NOT in the
# sentence lexicon: only the advisory dialect emits it, and the
# pipeline routes these triples to the canonicalizer's assertion
# stream (guac ingests *Equal predicates into equality edges,
# /root/reference/pkg/assembler/assembler.go:99-103,173-186 — they
# never appear as dependency/mention edges)
SAME_AS_PRED = "same_as"


def parse_advisory(text: str) -> list[tuple[str, str, str]]:
    """Advisory dialect (the CSAF/OpenVEX analog: documents whose
    CONTENT asserts that two identifiers are the same thing —
    VulnEqual from CSAF aliases,
    /root/reference/pkg/ingestor/parser/csaf/parser_csaf.go, and
    open_vex/parser_open_vex.go): a `#KGADV` header then one
    `equal: <surface A> == <surface B>` line per assertion. Emits
    (a, same_as, b) triples. Same row-wise-skip error model as the
    other dialects: junk lines, missing sides, and a missing `==`
    separator yield nothing, never an exception."""
    out: list[tuple[str, str, str]] = []
    for line in text.splitlines():
        tag, sep, val = line.partition(":")
        if not sep or tag.strip().lower() != "equal":
            continue
        a, sep2, b = val.partition("==")
        a, b = a.strip(), b.strip()
        if sep2 and a and b:
            out.append((a, SAME_AS_PRED, b))
    return out


# dialect registry: format id -> pure text->triples function
PARSERS: dict[str, object] = {
    "text": extract_triples_from_text,
    "json": parse_structured_json,
    "tagvalue": parse_tag_value,
    "advisory": parse_advisory,
}


def guess_format(text: str) -> str:
    """P2 format discriminator (guesser.go:25-51): a `#KGTV` header
    routes to the tag-value parser; structured pages are compact JSON
    objects, so a leading '{' routes to the json parser; everything
    else is sentence text."""
    head = text.lstrip()
    if head.startswith("#KGADV"):
        return "advisory"
    if head.startswith("#KGTV"):
        return "tagvalue"
    return "json" if head[:1] == "{" else "text"


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
            urls, tss, subjs, preds, objs, exts = [], [], [], [], [], []
            for url, ts, text in zip(pdf["url"], pdf["warc_ts"], pdf["text"]):
                if not text:
                    continue
                fmt = guess_format(text)
                stamp = f"{EXTRACTOR_VERSION}/{fmt}"
                for s, p, o in PARSERS[fmt](text):
                    urls.append(url)
                    tss.append(ts)
                    subjs.append(s)
                    preds.append(p)
                    objs.append(o)
                    exts.append(stamp)
            yield pd.DataFrame({
                "url": pd.Series(urls, dtype="object"),
                "warc_ts": pd.Series(tss, dtype="datetime64[us]"),
                "subj_surface": pd.Series(subjs, dtype="object"),
                "pred": pd.Series(preds, dtype="object"),
                "obj_surface": pd.Series(objs, dtype="object"),
                "extractor": pd.Series(exts, dtype="object"),
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
