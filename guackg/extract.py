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
import html.entities as _html_entities
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


# ---------------------------------------------------------------------------
# JVM path: the SAME frozen spec as built-in expressions, for the rows
# it can prove it handles exactly. Rows outside the provable subset
# (an HTML entity beyond the ASCII core set, or any decode replacement
# character — where Python and Java replacement-unit counts may
# differ) are routed through the reference Python UDF; the routing
# trick keeps ONE source scan: the UDF input is NULLed for JVM-handled
# rows, so the Arrow exchange ships (and the Python worker maps)
# almost nothing. tests/test_extract.py asserts hybrid == pure-Python
# byte-exactly on the full quirk corpus + adversarial rows.
#
# MEASURED (100k pages ~10 KB each, local[32]): hybrid 30 s vs python
# 9 s — the ~11 sequential whole-document Java regexp_replace passes
# (each materializing a new UTF8String) lose to ONE Arrow-batched
# CPython pass with precompiled patterns by ~3.5×. "Built-ins beat
# UDFs" does not hold for long regex chains over large strings, so
# the Arrow UDF stays the DEFAULT; the JVM path is kept as a tested
# alternative for Python-worker-free deployments.
# ---------------------------------------------------------------------------

# entities the JVM path unescapes, replaced in single-pass order
# (non-amp first, amp LAST — so "&amp;lt;" yields "&lt;" exactly like
# html.unescape's one-pass semantics)
_JVM_ENTITIES = [("&lt;", "<"), ("&gt;", ">"), ("&quot;", '"'),
                 ("&#39;", "'"), ("&apos;", "'"), ("&amp;", "&")]
# html.unescape also converts SEMICOLONLESS references (spec step 4):
# numeric '&#65' and the ~106 historical named refs the HTML5 spec
# allows without ';' ('&amp', '&copy', '&AMP', …). The authoritative
# list is the stdlib's own table (html.entities.html5 keys without a
# trailing ';'), so the route predicate can never drift from the
# frozen spec's implementation.
_SEMICOLONLESS = sorted(
    {n for n in _html_entities.html5 if not n.endswith(";")},
    key=len, reverse=True)
# rows needing the Python reference implementation (any '&' form the
# six JVM replacements don't cover byte-exactly):
#  1. any numeric reference except exactly '&#39;' — with OR without
#     the terminating ';' ('&#65' converts semicolonless)
#  2. any OTHER ';'-terminated entity (≤32 chars, html.unescape's cap)
#  3. any semicolonless named ref ('&amp b' → '& b', '&ampx' → '&x');
#     the '(?!;)' keeps the ';'-terminated core six on the JVM path
_UNSUPPORTED_ENTITY_RE = (
    r"&#(?!39;)"
    r"|&(?!(amp|lt|gt|quot|apos|#39);)[A-Za-z#][A-Za-z0-9#]{1,31};"
    r"|&(?:" + "|".join(_SEMICOLONLESS) + r")(?!;)")
# python str.strip() whitespace = Unicode White_Space + the C0
# separators 0x1C-0x1F; \n excluded so line boundaries survive
_WSX = r"[\x1c-\x1f\p{IsWhite_Space}&&[^\n]]"


def _decode_col(html: F.Column) -> F.Column:
    """Charset sniff + decode, spec step 1, all JVM-side; pure in the
    passed binary Column (no hardcoded column names, so it composes
    with any source expression).

    UTF-8 goes through make_valid_utf8(cast(binary as string)) — the
    exact analog of errors="replace" (malformed sequences → U+FFFD) —
    NOT decode(), which under ANSI throws MALFORMED_CHARACTER_CODING
    on bad bytes. (Replacement-unit counting can differ from CPython
    on exotic malformed sequences; any row containing U+FFFD is routed
    to the Python reference implementation, so the difference is
    unobservable.) ISO-8859-1 decode is total — every byte is valid."""
    prefix = F.decode(F.substring(html, 1, 1024), "ISO-8859-1")
    is_latin1 = prefix.rlike(r"(?i)charset=(latin-1|iso-8859-1)")
    has_bom = F.substring(html, 1, 3) == F.lit(_BOM)
    return (F.when(has_bom, F.make_valid_utf8(
                F.substring(html, 4, 2147483647).cast("string")))
            .when(is_latin1, F.decode(html, "ISO-8859-1"))
            .otherwise(F.make_valid_utf8(html.cast("string"))))


def _extract_jvm(decoded: F.Column) -> F.Column:
    """Spec steps 2-5 as a regexp_replace chain (whole-stage codegen;
    Java and Python regex agree on every construct used here)."""
    s = F.regexp_replace(decoded, r"(?is)<script\b.*?</script\s*>", " ")
    s = F.regexp_replace(s, r"(?is)<style\b.*?</style\s*>", " ")
    s = F.regexp_replace(
        s, r"(?i)</(?:p|div|li|nav|title|h[1-6]|tr|table)\s*>|<br\s*/?\s*>",
        "\n")
    s = F.regexp_replace(s, r"<[^>]*>", " ")
    for ent, ch in _JVM_ENTITIES:
        s = F.regexp_replace(s, ent, ch)
    s = F.regexp_replace(s, r"[ \t]*\n[ \t\r\n]*", "\n")
    s = F.regexp_replace(s, r"[ \t]+", " ")
    # (?d) = UNIX_LINES: only \n terminates a line for ^/$ — Java's
    # default MULTILINE also breaks at \r, U+0085, U+2028, U+2029,
    # which the Python spec (str.split('\n')) does not
    s = F.regexp_replace(s, f"(?dm)^{_WSX}+|{_WSX}+$", "")  # line strip
    s = F.regexp_replace(s, r"\n{2,}", "\n")               # drop empties
    return F.regexp_replace(s, r"^\n+|\n+$", "")


def extract(pages: DataFrame, impl: str = "python") -> DataFrame:
    """pages(url, warc_ts, html, …) → + extracted_text column.

    impl='python'  — default: the reference Arrow UDF (the frozen
                     spec; measured 3.5× faster than the JVM regex
                     chain — see the block comment above).
    impl='hybrid'  — JVM expressions for rows provably inside the
                     JVM-exact subset, Python (via a null-padded UDF
                     input — no second scan, near-empty Arrow
                     exchange) for the rest. Byte-identical to
                     'python' by construction + asserted by test.

    Declarative either way: Catalyst prunes to the columns actually
    read and pushes url/lang filters below this projection into the
    scan.
    """
    if impl == "python":
        return pages.withColumn("extracted_text",
                                _extract_udf(F.col("html")))
    decoded = _decode_col(F.col("html"))
    needs_python = (decoded.contains("�")
                    | decoded.rlike(_UNSUPPORTED_ENTITY_RE))
    py_out = _extract_udf(F.when(needs_python, F.col("html")))
    return pages.withColumn(
        "extracted_text",
        F.when(F.col("html").isNull(), F.lit(None).cast("string"))
        .when(needs_python, py_out)
        .otherwise(_extract_jvm(decoded)))


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
