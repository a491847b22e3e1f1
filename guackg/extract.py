"""Stage 1 — EXTRACT: html:binary → text:string, byte-identical per url.

Reimagines the reference's document-processor stage
(/root/reference/pkg/handler/processor/process/process.go:115-168):
decode (P1, process.go:217-253) → format/type guess (P2/P3,
guesser/guesser.go:25-51) → validate/quarantine (P4,
process.go:182-207). Instead of a per-document goroutine pipeline, one
Arrow-vectorized pandas UDF maps the whole html column; invalid rows
go to a quarantine side-output instead of raising (guac returns an
error per document; at 10^12 rows we filter + count).

EXTRACTION SPEC (frozen; golden fixture asserts sha256 per url):
 1. charset: UTF-8 BOM → utf-8-sig; else if the first 1024 bytes
    contain `charset=latin-1` or `charset=iso-8859-1`
    (case-insensitive) → latin-1; else utf-8 (errors="replace").
 2. drop <script>…</script> and <style>…</style> blocks
    (case-insensitive, dot-matches-newline).
 3. closing block tags (</p> </div> </li> </nav> </title> </h1..6>
    </tr> </table>) and <br> → a newline; every other remaining tag →
    a single space.
 4. HTML entity unescape (python stdlib html.unescape).
 5. whitespace collapse: any run containing a newline → one "\\n";
    any other [ \\t]+ run → one space; strip both ends of each line
    and of the whole text; drop empty lines.

The function is pure bytes→str (no locale, no threads, no randomness)
so re-running any partition yields identical output — the idempotency
the reference gets from natural-key upserts (SURVEY.md §2.11).
"""

from __future__ import annotations

import html as _html
import re

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import StringType

_BOM = b"\xef\xbb\xbf"
_CHARSET_RE = re.compile(rb"charset=(latin-1|iso-8859-1)", re.IGNORECASE)
_SCRIPT_RE = re.compile(r"<script\b.*?</script\s*>", re.IGNORECASE | re.DOTALL)
_STYLE_RE = re.compile(r"<style\b.*?</style\s*>", re.IGNORECASE | re.DOTALL)
_BLOCK_RE = re.compile(
    r"</(?:p|div|li|nav|title|h[1-6]|tr|table)\s*>|<br\s*/?\s*>",
    re.IGNORECASE)
_TAG_RE = re.compile(r"<[^>]*>")
_NL_RUN_RE = re.compile(r"[ \t]*\n[ \t\r\n]*")
_SP_RUN_RE = re.compile(r"[ \t]+")


def extract_text_bytes(blob: bytes | None) -> str | None:
    """The frozen pure extraction function (spec above). None on None."""
    if blob is None:
        return None
    if blob.startswith(_BOM):
        s = blob.decode("utf-8-sig", errors="replace")
    elif _CHARSET_RE.search(blob[:1024]):
        s = blob.decode("latin-1")
    else:
        s = blob.decode("utf-8", errors="replace")
    s = _SCRIPT_RE.sub(" ", s)
    s = _STYLE_RE.sub(" ", s)
    s = _BLOCK_RE.sub("\n", s)
    s = _TAG_RE.sub(" ", s)
    s = _html.unescape(s)
    s = _NL_RUN_RE.sub("\n", s)
    s = _SP_RUN_RE.sub(" ", s)
    lines = [ln.strip() for ln in s.split("\n")]
    return "\n".join(ln for ln in lines if ln)


@pandas_udf(StringType())
def _extract_udf(blobs: pd.Series) -> pd.Series:
    # Arrow-batched (one Python call per ~10k rows); the map inside the
    # batch is plain CPython but never crosses the JVM boundary per row
    # — plans show ArrowEvalPython, never BatchEvalPython.
    return blobs.map(extract_text_bytes)


def extract(pages: DataFrame) -> DataFrame:
    """pages(url, warc_ts, html, …) → + extracted_text column.

    Declarative: Catalyst prunes to the columns actually read and
    pushes url/lang filters below this projection into the scan.
    """
    return pages.withColumn("extracted_text", _extract_udf(F.col("html")))


def valid_col() -> F.Column:
    """Validity predicate over extracted_text (validateFormat analog,
    process.go:182-207): non-null, non-empty, no decode replacement
    character."""
    return (F.col("extracted_text").isNotNull()
            & (F.length("extracted_text") > 0)
            & ~F.col("extracted_text").contains("�"))


def split_quarantine(extracted: DataFrame) -> tuple[DataFrame, DataFrame]:
    """Valid/invalid split: invalid rows route to a side table — never
    a per-row exception."""
    ok = valid_col()
    return extracted.filter(ok), extracted.filter(~ok)
