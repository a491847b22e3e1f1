"""Stage 1 tests: byte-identical extraction per url (the per-row
invariant from BASELINE.json input_hint), quarantine behavior, and
hot-path plan checks (Arrow only, no per-row Python)."""

import hashlib

from pyspark.sql import functions as F

from guackg.extract import extract, extract_text_bytes, split_quarantine


def test_extract_pure_function_examples():
    html = (b"<html><head><title>T</title><style>x{}</style></head>"
            b"<body><nav>A B</nav><p>Hello &amp; goodbye.</p>"
            b"<script>var x = 1 < 2;</script></body></html>")
    assert extract_text_bytes(html) == "T\nA B\nHello & goodbye."
    assert extract_text_bytes(None) is None
    # BOM
    assert extract_text_bytes(b"\xef\xbb\xbf<p>hi</p>") == "hi"
    # latin-1 sniff
    doc = '<meta charset=latin-1><p>caf\xe9</p>'.encode("latin-1")
    assert extract_text_bytes(doc) == "caf\xe9"


def test_byte_identical_extraction_golden(spark, corpus, pages_df):
    """sha256(extracted) must equal the golden fixture for EVERY url."""
    extracted = extract(pages_df).select(
        "url", F.sha2(F.col("extracted_text"), 256).alias("got"))
    golden = spark.createDataFrame(corpus["golden_text"])
    bad = (extracted.join(golden, on="url")
           .filter(F.col("got") != F.col("text_sha256")))
    assert bad.count() == 0
    assert extracted.count() == len(corpus["pages"])


def test_golden_text_matches_text_column(corpus):
    """The pages.text column IS the expected extraction output."""
    pages = corpus["pages"]
    for t, h in zip(pages["text"], corpus["golden_text"]["text_sha256"]):
        assert hashlib.sha256(t.encode("utf-8")).hexdigest() == h


def test_quarantine_split(spark):
    import datetime
    rows = [
        ("u1", datetime.datetime(2024, 1, 1), b"<p>fine</p>", None, "en"),
        ("u2", datetime.datetime(2024, 1, 1), b"", None, "en"),
        ("u3", datetime.datetime(2024, 1, 1), b"\xff\xfe broken \xff", None, "en"),
    ]
    df = spark.createDataFrame(
        rows, "url string, warc_ts timestamp, html binary, text string, lang string")
    ok, bad = split_quarantine(extract(df))
    assert [r.url for r in ok.select("url").collect()] == ["u1"]
    assert bad.count() == 2


def test_plan_is_arrow_not_per_row_python(pages_df):
    """BASELINE hot-path constraint: ArrowEvalPython (vectorized) is
    allowed; BatchEvalPython (row-at-a-time Python UDF) is not."""
    plan = extract(pages_df)._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan
    assert "ArrowEvalPython" in plan
