"""Stage 2 tests: the triple-extraction UDTF — grammar, inverse
predicate direction normalization (the DEPENDS_ON/DEPENDENCY_OF flip,
parse_spdx.go:263-304), lang filtering, and surface-level recall vs
planted sentences."""

from pyspark.sql import functions as F

from guackg.extract import extract
from guackg.triples import (PARSERS, extract_triples,
                            extract_triples_from_text, guess_format,
                            parse_structured_json)


def test_grammar_basics():
    assert extract_triples_from_text(
        "Ada Lovelace works for Acme Industries.") == \
        [("Ada Lovelace", "works_for", "Acme Industries")]
    # inverse surface swaps direction
    assert extract_triples_from_text(
        "Widget X was acquired by Globex Corporation.") == \
        [("Globex Corporation", "acquired", "Widget X")]
    # newline bounds the subject span
    assert extract_triples_from_text(
        "Home About Contact\nGrace Hopper studied at Initech Labs.") == \
        [("Grace Hopper", "studied_at", "Initech Labs")]
    # lowercase subject → no emission
    assert extract_triples_from_text("the company acquired Widget X.") == []
    # no predicate → no emission
    assert extract_triples_from_text("Ada Lovelace greeted Grace Hopper.") == []


def test_multi_sentence_line():
    got = extract_triples_from_text(
        "Ada Lovelace wrote Compiler X. Grace Hopper leads Initech Labs.")
    assert got == [("Ada Lovelace", "wrote", "Compiler X"),
                   ("Grace Hopper", "leads", "Initech Labs")]


def test_spark_triples_match_pure_python(spark, corpus, pages_df):
    """The distributed UDTF must emit exactly the pure-Python triple
    set (same grammar, Arrow batching must not change results)."""
    extracted = extract(pages_df)
    got = extract_triples(extracted)
    rows = got.select("url", "subj_surface", "pred", "obj_surface").collect()
    got_set = {(r.url, r.subj_surface, r.pred, r.obj_surface) for r in rows}

    expect = set()
    for _, row in corpus["pages"].iterrows():
        if row.lang != "en":
            continue
        for s, p, o in PARSERS[guess_format(row.text)](row.text):
            expect.add((row.url, s, p, o))
    assert got_set == expect
    assert len(rows) > 0


def test_structured_json_dialect():
    doc = ('{"title":"x","triples":['
           '{"s":"Ada Lovelace","p":"wrote","o":"Compiler X"},'
           '{"s":"Acme Industries","p":"bogus_rel","o":"Widget X"},'
           '{"s":"","p":"wrote","o":"Widget X"}],"filler":"y"}')
    assert guess_format(doc) == "json"
    # valid triple kept; unknown pred id and empty subject dropped
    assert parse_structured_json(doc) == \
        [("Ada Lovelace", "wrote", "Compiler X")]
    # malformed JSON: scanned, zero triples, no exception
    assert parse_structured_json(doc[:-10]) == []
    assert parse_structured_json("[1,2,3]") == []
    assert guess_format("Ada Lovelace wrote Compiler X.") == "text"


def test_dialect_stamped_in_extractor(spark, corpus, pages_df):
    """Per-parser lineage identity (T7): extractor column ends with
    the dialect id, and the corpus exercises BOTH dialects."""
    got = extract_triples(extract(pages_df))
    stamps = {r.extractor for r in
              got.select("extractor").distinct().collect()}
    assert any(s.endswith("/text") for s in stamps)
    assert any(s.endswith("/json") for s in stamps)


def test_non_en_pages_skipped(spark, pages_df):
    got = extract_triples(extract(pages_df))
    joined = got.join(pages_df.select("url", "lang"), on="url")
    assert joined.filter(F.col("lang") != "en").count() == 0


def test_lineage_columns_stamped(spark, pages_df):
    got = extract_triples(extract(pages_df)).limit(5).collect()
    for r in got:
        assert r.url and r.warc_ts is not None and r.extractor


def test_structured_json_malformed_triples_value_skips():
    """The never-crash row-wise-skip contract: a page whose 'triples'
    value is not a list (null, scalar, object) must yield nothing, not
    a TypeError that kills the whole mapInPandas task."""
    from guackg.triples import parse_structured_json
    for body in ('{"triples": null}', '{"triples": 5}',
                 '{"triples": "x"}', '{"triples": {"s": 1}}',
                 '{"no_triples": []}', '[1,2]', 'not json', ''):
        assert parse_structured_json(body) == [], body


def test_tag_value_dialect_pure():
    """Third registry dialect (T3/T6 — parser/parser.go:43-60
    registers many formats): SPDX-tag-value-shaped stateful line
    parser. Record boundary is the `s:` tag (extract's whitespace
    collapse drops blank lines, so boundaries must be tags); unknown
    predicate ids and incomplete records skip row-wise; junk lines
    and unknown tags are ignored; nothing raises."""
    from guackg.triples import guess_format, parse_tag_value
    doc = ("#KGTV v1\n"
           "title: Bulletin 7\n"
           "s: Acme Industries\n"
           "p: acquired\n"
           "o: Widget X\n"
           "s: Ada Lovelace\n"
           "p: bogus_rel\n"
           "o: Compiler X\n"
           "s: Grace Hopper\n"
           "p: works_for\n"
           "junk line without a tag\n"
           "o: Initech Labs\n"
           "s: Incomplete Record\n"
           "p: wrote\n")
    assert guess_format(doc) == "tagvalue"
    assert parse_tag_value(doc) == [
        ("Acme Industries", "acquired", "Widget X"),
        ("Grace Hopper", "works_for", "Initech Labs"),
    ]
    # repeated tag before the record closes: last wins
    assert parse_tag_value(
        "#KGTV v1\ns: A\np: wrote\np: leads\no: B\n") == \
        [("A", "leads", "B")]
    # empty values never emit; header-only yields nothing
    assert parse_tag_value("#KGTV v1\ns:\np: wrote\no: X\n") == []
    assert parse_tag_value("#KGTV v1\n") == []
    # the other discriminator branches are unaffected
    assert guess_format('{"triples": []}') == "json"
    assert guess_format("Ada wrote X.") == "text"


def test_tag_value_spark_end_to_end(spark):
    """All three dialects through the REAL ingest path (html bytes →
    extract → mapInPandas triples): tag-value records survive the
    extraction whitespace collapse by design, and each dialect stamps
    its own extractor lineage id (T7)."""
    from datetime import datetime
    ts = datetime(2024, 1, 1)
    pages = [
        ("https://a.example.com/tv", ts,
         b"#KGTV v1\ntitle: B\ns: Acme Industries\np: acquired\n"
         b"o: Widget X\ns: Grace Hopper\np: works_for\no: Initech Labs\n",
         "en"),
        ("https://a.example.com/txt", ts,
         b"<p>Ada Lovelace wrote Compiler X.</p>", "en"),
        ("https://a.example.com/json", ts,
         b'{"triples":[{"s":"Widget X","p":"exports","o":"Berlin"}]}',
         "en"),
        # tagvalue page in a filtered-out language: never parsed
        ("https://a.example.com/de", ts,
         b"#KGTV v1\ns: Der Ort\np: located_in\no: Berlin\n", "de"),
    ]
    df = spark.createDataFrame(
        pages, "url string, warc_ts timestamp, html binary, lang string")
    got = extract_triples(extract(df))
    rows = {(r.url, r.subj_surface, r.pred, r.obj_surface,
             r.extractor.rsplit("/", 1)[1]) for r in got.collect()}
    assert rows == {
        ("https://a.example.com/tv", "Acme Industries", "acquired",
         "Widget X", "tagvalue"),
        ("https://a.example.com/tv", "Grace Hopper", "works_for",
         "Initech Labs", "tagvalue"),
        ("https://a.example.com/txt", "Ada Lovelace", "wrote",
         "Compiler X", "text"),
        ("https://a.example.com/json", "Widget X", "exports",
         "Berlin", "json"),
    }


def test_advisory_dialect_pure():
    """Fourth registry dialect (the CSAF/OpenVEX analog —
    parser_csaf.go / parser_open_vex.go emit VulnEqual equality
    predicates straight from document content): `#KGADV` header,
    `equal: A == B` lines → (A, same_as, B) triples. Same row-wise
    skip model as the other dialects: junk lines, missing sides,
    missing separators yield nothing and never raise."""
    from guackg.triples import SAME_AS_PRED, guess_format, parse_advisory
    doc = ("#KGADV v1\n"
           "title: Equivalence Bulletin\n"
           "equal: Acme Industries == Acme Corp\n"
           "junk line\n"
           "equal: Widget X == The Widget\n"
           "equal: no separator here\n"
           "equal: == Missing Left\n"
           "equal: Missing Right ==\n"
           "EQUAL: Case Insensitive == Tag Name\n")
    assert guess_format(doc) == "advisory"
    assert parse_advisory(doc) == [
        ("Acme Industries", SAME_AS_PRED, "Acme Corp"),
        ("Widget X", SAME_AS_PRED, "The Widget"),
        ("Case Insensitive", SAME_AS_PRED, "Tag Name"),
    ]
    assert parse_advisory("#KGADV v1\n") == []
    # the other discriminator branches are unaffected
    assert guess_format("#KGTV v1\ns: A\n") == "tagvalue"
    assert guess_format('{"triples": []}') == "json"
    assert guess_format("Ada wrote X.") == "text"


def test_advisory_spark_end_to_end(spark):
    """Advisory docs through the REAL ingest path (html → extract →
    mapInPandas): same_as triples come out stamped with the advisory
    extractor lineage id."""
    from datetime import datetime

    from guackg.extract import extract
    from guackg.triples import (EXTRACTOR_VERSION, SAME_AS_PRED,
                                extract_triples)
    ts = datetime(2024, 1, 1)
    pages = [("https://a.example.com/adv", ts,
              b"#KGADV v1\nequal: Acme Industries == Acme Corp\n",
              None, "en")]
    df = spark.createDataFrame(
        pages, "url string, warc_ts timestamp, html binary, "
               "text string, lang string")
    got = extract_triples(extract(df)).collect()
    assert len(got) == 1
    r = got[0]
    assert (r.subj_surface, r.pred, r.obj_surface) == \
        ("Acme Industries", SAME_AS_PRED, "Acme Corp")
    assert r.extractor == f"{EXTRACTOR_VERSION}/advisory"
