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


def test_hybrid_extract_matches_python_reference(spark, pages_df):
    """The JVM-first hybrid path must be byte-identical to the frozen
    Python spec over the FULL quirk corpus (BOM, latin-1, entities,
    malformed-truncation JSON pages)."""
    h = extract(pages_df, impl="hybrid").select("url", "extracted_text")
    p = extract(pages_df, impl="python").select(
        "url", F.col("extracted_text").alias("want"))
    diff = (h.join(p, on="url")
            .filter(~F.col("extracted_text").eqNullSafe(F.col("want"))))
    assert diff.count() == 0


def test_hybrid_extract_adversarial_rows(spark):
    """Rows engineered to sit on the JVM/Python routing boundary:
    unsupported entities (must route to Python), nested escapes
    (single-pass semantics), malformed UTF-8 (replacement chars),
    exotic whitespace at line edges."""
    blobs = [
        b"<p>A &eacute; B</p>",              # unsupported entity
        b"<p>x &nbsp; y</p>",                # entity -> U+00A0
        b"<p>n &#x41; m</p>",                # numeric hex entity
        b"<p>&amp;lt; stays</p>",            # nested: must NOT double-unescape
        b"<p>5 &lt; 6 &amp; 7 &gt; 2 &quot;q&quot; &#39;a&#39;</p>",
        b"\xff\xfe<p>broken</p>",            # malformed utf-8
        b"<p>tail \xe2\x82</p>",             # truncated multi-byte
        b"<p>lone\rcr</p>",                  # lone CR inside a line
        b"<p>\x1c sep \x1c</p>",             # C0 separators (str.strip set)
        '<meta charset=latin-1><p>\xa0nb\xa0</p>'.encode("latin-1"),
        b"\xef\xbb\xbf<p>bom &amp; text</p>",
        b"",                                  # empty
        None,                                 # null html
        # --- round-2 ADVICE adversarial rows ---
        b"<p>a &amp b</p>",                  # SEMICOLONLESS named ref
        b"<p>&copy 2024 &REG x</p>",         # semicolonless, mixed case
        b"<p>&ampx</p>",                     # longest-prefix: '&x'
        b"<p>it&#39s &#65 &#x41 ok</p>",     # semicolonless numeric
        b"<p>a=1&b=2&amp;c=3</p>",           # bare & in a query string
        b"<p>&notin; &not x</p>",            # ';'-entity + prefix form
        b"<p>a \rb</p>",                     # internal CR, space kept
        b"<p>a \xc2\x85b</p>",               # NEL is not a line break
        b"<p>a \xe2\x80\xa8b</p>",           # U+2028 line sep, internal
        b"<p>a \xe2\x80\xa9.</p>",           # U+2029 para sep, internal
        b"<p>end \r</p><p>x</p>",            # trailing CR at line end
    ]
    rows = [(f"u{i}", b) for i, b in enumerate(blobs)]
    df = spark.createDataFrame(rows, "url string, html binary")
    got = {r.url: r.extracted_text
           for r in extract(df, impl="hybrid").collect()}
    want = {r.url: r.extracted_text
            for r in extract(df, impl="python").collect()}
    assert got == want
    # sanity: python reference behaves as the spec says
    assert want["u3"] == "&lt; stays"
    assert want["u4"] == "5 < 6 & 7 > 2 \"q\" 'a'"
    assert want["u12"] is None
    # semicolonless conversions (html.unescape spec step 4)
    assert want["u13"] == "a & b"
    assert want["u15"] == "&x"
    assert want["u16"] == "it's A A ok"
    # internal \r survives (only \n splits lines in the frozen spec)
    assert want["u19"] == "a \rb"


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
