"""PII detection + redaction over a documents table — the scrub pass
every training-data pipeline runs before shipping a corpus (C4-style
public practice). All JVM-side: `regexp_count` for the per-category
detection counters and chained `regexp_replace` for the redaction —
whole-stage codegen, narrow, zero Python; the 100-TB shape is a
projection.

The reference's analog is the validate/quarantine split of the
document processor (/root/reference/pkg/handler/processor/process/
process.go:182-207): content either flows through unchanged or is
rewritten/flagged with a recorded reason — here every doc flows
through with its category counts recorded, so redaction attrition is
auditable (no silent rewrites, SURVEY §4).

Patterns are deliberately RE2-compatible (no backreferences, no
lookaround) so the exact same strings run under DuckDB's regex engine
— tests/test_textclean.py holds byte-exact parity on counts AND
redacted text.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# category patterns, applied in this order (emails first so their
# digit runs can't later count as phones; IPs before phones so dotted
# quads never feed the phone matcher)
PII_EMAIL = r"[A-Za-z0-9._%+\-]+@[A-Za-z0-9.\-]+\.[A-Za-z]{2,}"
PII_IPV4 = r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b"
PII_PHONE = r"\+?\d[\d\- ]{6,}\d"

PII_TAGS = {"email": "<EMAIL>", "ipv4": "<IP>", "phone": "<PHONE>"}


def pii_redact(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """docs(doc_id, text, …) → (doc_id, n_emails, n_ips, n_phones,
    redacted). Counts are measured on the text AS EACH STAGE SEES IT
    (emails on the original, IPs after email redaction, phones after
    IP redaction) so no span is ever counted twice. NULL text → zero
    counts, NULL redacted (the NULL-quarantine convention of the
    other text ops)."""
    t0 = F.col(text_col)
    t1 = F.regexp_replace(t0, PII_EMAIL, PII_TAGS["email"])
    t2 = F.regexp_replace(t1, PII_IPV4, PII_TAGS["ipv4"])
    t3 = F.regexp_replace(t2, PII_PHONE, PII_TAGS["phone"])
    return docs.select(
        "doc_id",
        F.coalesce(F.regexp_count(t0, F.lit(PII_EMAIL)), F.lit(0))
        .alias("n_emails"),
        F.coalesce(F.regexp_count(t1, F.lit(PII_IPV4)), F.lit(0))
        .alias("n_ips"),
        F.coalesce(F.regexp_count(t2, F.lit(PII_PHONE)), F.lit(0))
        .alias("n_phones"),
        t3.alias("redacted"),
    )
