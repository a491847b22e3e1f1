"""URL/domain operator tests: DuckDB parity for host extraction +
registered-domain classification + the per-domain rollup, and goldens
for the blocklist gate. Same in-suite oracle discipline as
test_textclean.py (the registered battery is pinned at 50)."""

import duckdb
import pandas as pd
import pytest

URLS = [
    (1, "https://www.Example.COM/path?q=1"),
    (2, "http://user:pw@news.BBC.co.uk:8080/story#frag"),
    (3, "https://example.com"),
    (4, "ftp://a.b.c.d.com/file"),
    (5, "notaurl"),
    (6, "https://localhost/x"),
    (7, "docs://123"),
    (8, None),
    (9, "https://sub.shop.com.au/cart"),
    (10, "https://www.example.com/other"),
    (11, "https://www.example.com/other"),   # exact dup url
    (12, "https://example.com./rootfqdn"),   # trailing-dot FQDN form
    (13, "http://192.168.0.1/admin"),        # IPv4 literal host
    (14, "http://ads.tracker.co.uk/px"),     # host-level block target
    (15, "http://safe.tracker.co.uk/ok"),    # same domain, other host
]

# the canonicalization + classification, as one DuckDB expression pair
HOST_DOMAIN_SQL = """
WITH H AS (
  SELECT {key} AS id,
    regexp_replace(
      lower(regexp_extract(coalesce(url, ''),
        '^[A-Za-z][A-Za-z0-9+.\\-]*://(?:[^/?#@]*@)?([^/:?#]+)', 1)),
      '\\.+$', '') AS host
  FROM docs),
P AS (SELECT *, string_split(host, '.') AS parts FROM H)
SELECT id, host,
  CASE WHEN host = '' THEN NULL
       WHEN regexp_matches(host, '^\\d{{1,3}}(\\.\\d{{1,3}}){{3}}$')
            THEN host
       WHEN len(parts) <= 2 THEN host
       WHEN parts[-2] || '.' || parts[-1] IN
            ('co.uk','org.uk','ac.uk','gov.uk','com.au','net.au',
             'org.au','co.jp','co.kr','co.in','co.nz','co.za',
             'com.br','com.cn','com.mx','com.sg','com.tr','com.ar')
            THEN parts[-3] || '.' || parts[-2] || '.' || parts[-1]
       ELSE parts[-2] || '.' || parts[-1] END AS domain
FROM P
"""


@pytest.fixture(scope="module")
def urls_df(spark):
    return spark.createDataFrame(URLS, "id long, url string")


def _norm(df):
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].where(pd.notnull(df[c]), None)
    return df.reset_index(drop=True)


@pytest.mark.parametrize("src,key", [("urls_df", "id"),
                                     ("pages_df", "url")])
def test_host_and_domain_vs_duckdb(request, src, key):
    from guackg.ops.urlstats import host_col, registered_domain_col
    df = request.getfixturevalue(src)
    if key == "url":  # pages table: key by the url itself
        df = df.select(df.url.alias("id"), "url").dropDuplicates(["id"])
    got = _norm(df.select("id", host_col().alias("host"),
                          registered_domain_col().alias("domain"))
                .toPandas().sort_values("id"))
    con = duckdb.connect()
    con.register("docs", df.select("id", "url").toPandas())
    want = _norm(con.execute(HOST_DOMAIN_SQL.format(key="id")
                             + " ORDER BY id").df().sort_values("id"))
    pd.testing.assert_frame_equal(got, want, check_dtype=False)


def test_domain_goldens(urls_df):
    from guackg.ops.urlstats import registered_domain_col
    got = {r.id: r.domain for r in
           urls_df.select("id", registered_domain_col().alias("domain"))
           .collect()}
    assert got[1] == "example.com"
    assert got[2] == "bbc.co.uk"        # userinfo + port stripped
    assert got[3] == "example.com"
    assert got[4] == "d.com"
    assert got[5] is None
    assert got[6] == "localhost"
    assert got[7] == "123"
    assert got[8] is None
    assert got[9] == "shop.com.au"      # second-level public suffix
    assert got[12] == "example.com"     # trailing dot canonicalized
    assert got[13] == "192.168.0.1"     # IPv4 host stays whole
    assert got[14] == "tracker.co.uk"


def test_domain_page_stats_vs_duckdb(urls_df):
    from guackg.ops.urlstats import domain_page_stats
    got = {(r.domain, r.n_pages, r.n_urls)
           for r in domain_page_stats(urls_df).collect()}
    con = duckdb.connect()
    con.register("docs", urls_df.toPandas())
    want = {(r[0], r[1], r[2]) for r in con.execute(
        "WITH D AS (" + HOST_DOMAIN_SQL.format(key="url") + """)
SELECT domain, count(*) AS n_pages, count(DISTINCT id) AS n_urls
FROM D GROUP BY domain
""").fetchall()}
    assert got == want
    # example.com: ids 1, 3, 10, 11, 12 -> 5 pages over 4 distinct urls
    assert ("example.com", 5, 4) in got


def test_domain_blocklist_filter(spark, urls_df):
    from guackg.ops.urlstats import domain_blocklist_filter
    blocked = spark.createDataFrame(
        [("EXAMPLE.com",),           # whole-site (domain-level) block
         ("bbc.co.uk",),
         ("ads.tracker.co.uk",)],    # host-level block
        "domain string")
    kept = domain_blocklist_filter(urls_df, blocked)
    assert kept.columns == urls_df.columns  # passthrough schema
    ids = {r.id for r in kept.collect()}
    # example.com pages (1, 3, 10, 11, 12 — incl. the trailing-dot
    # form) and bbc.co.uk (2) gone via the domain tier; the host-level
    # entry drops ONLY ads.tracker.co.uk (14), not its sibling host
    # safe.tracker.co.uk (15); matching is case-insensitive
    assert ids == {4, 5, 6, 7, 8, 9, 13, 15}


def test_domain_page_stats_host_granularity(spark, urls_df, pages_df):
    from guackg.ops.urlstats import domain_page_stats
    got = {r.domain: (r.n_pages, r.n_urls)
           for r in domain_page_stats(urls_df, by="host").collect()}
    # hosts keep subdomains apart: www.example.com != example.com;
    # the trailing-dot form canonicalizes into the bare host group
    assert got["www.example.com"] == (3, 2)
    assert got["example.com"] == (2, 2)
    assert got["news.bbc.co.uk"] == (1, 1)
    assert got["192.168.0.1"] == (1, 1)
    assert None in got          # non-URL rows grouped under NULL
    with pytest.raises(ValueError, match="'domain' or 'host'"):
        domain_page_stats(urls_df, by="path")
    # the synthetic corpus is single-registered-domain but Zipf-skewed
    # by host: the host rollup must spread
    hosts = domain_page_stats(pages_df, by="host")
    assert hosts.count() > 10


def test_psl_table_matches_inline_on_subset(spark, urls_df):
    """The deploy shape (full PSL as a broadcast table joined at
    domain-extraction time) behind the same API: with a PSL table
    containing exactly the inline SECOND_LEVEL_SUFFIXES, table-driven
    and inline registered domains are identical on every fixture URL
    (including IPv4, FQDN-dot, non-URL, and NULL rows)."""
    from guackg.ops.urlstats import (SECOND_LEVEL_SUFFIXES,
                                     with_registered_domain)
    psl = spark.createDataFrame(
        [(s,) for s in SECOND_LEVEL_SUFFIXES], "suffix string")
    inline = {r.id: r.domain
              for r in with_registered_domain(urls_df).collect()}
    table = {r.id: r.domain
             for r in with_registered_domain(urls_df, psl=psl)
             .collect()}
    assert table == inline
    # the PSL join path stays broadcast-only, no Python
    plan = with_registered_domain(urls_df, psl=psl) \
        ._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan
    assert "BatchEvalPython" not in plan


def test_psl_table_fixes_suffixes_the_subset_misses(spark):
    """co.il is not in the inline 18-suffix subset, so the heuristic
    wrongly reports the SUFFIX as the site ('co.il'); the PSL table
    with the co.il rule returns the true registered domain. A 4-label
    rule exercises the longest-match-first order, and both rollup and
    blocklist honor the psl= identity."""
    from guackg.ops.urlstats import (domain_blocklist_filter,
                                     domain_page_stats,
                                     with_registered_domain)
    urls = spark.createDataFrame(
        [(1, "https://news.walla.co.il/item/1"),
         (2, "https://shop.example.co.il/x"),
         (3, "https://x.y.pref.aichi.jp/z"),   # 4-label PSL rule
         (4, "https://plain.com/ok")],
        "id long, url string")
    psl = spark.createDataFrame(
        [("co.il",), ("pref.aichi.jp",), ("y.pref.aichi.jp",)],
        "suffix string")
    inline = {r.id: r.domain
              for r in with_registered_domain(urls).collect()}
    table = {r.id: r.domain
             for r in with_registered_domain(urls, psl=psl).collect()}
    assert inline[1] == "co.il"            # the subset gets it wrong
    assert table[1] == "walla.co.il"       # the table gets it right
    assert table[2] == "example.co.il"
    assert inline[3] == "aichi.jp"
    assert table[3] == "x.y.pref.aichi.jp"  # longest rule wins
    assert table[4] == inline[4] == "plain.com"
    # rollup groups by the PSL identity
    stats = {r.domain: r.n_pages
             for r in domain_page_stats(urls, psl=psl).collect()}
    assert stats["walla.co.il"] == 1 and "co.il" not in stats
    # whole-site block at the PSL-registered domain granularity
    blocked = spark.createDataFrame([("walla.co.il",)],
                                    "domain string")
    kept = {r.id for r in
            domain_blocklist_filter(urls, blocked, psl=psl).collect()}
    assert kept == {2, 3, 4}
