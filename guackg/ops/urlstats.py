"""URL/domain operators over the webtext pages table — host
extraction, registered-domain rollups, and host/domain blocklist
filtering: the per-source curation layer of a Common-Crawl-style
pipeline (the analog of the reference's per-collector source
provenance, /root/reference/pkg/handler/processor/processor.go:97-103,
where every document carries its Collector/Source and downstream
policy keys off it).

All JVM-side built-ins (regexp_extract / split / element_at /
broadcast anti-join) — no Python, narrow except the rollup's single
combinable aggregation. Patterns are RE2-compatible; exact DuckDB
parity in tests/test_urlstats.py, Python-reference property sweep in
tests/test_properties.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# common two-label public suffixes (a deliberately small, inline,
# deterministic subset of the public-suffix list — enough for the
# registered-domain heuristic; a deploy swaps in the full PSL as a
# broadcast table without changing the operator shape)
SECOND_LEVEL_SUFFIXES = (
    "co.uk", "org.uk", "ac.uk", "gov.uk",
    "com.au", "net.au", "org.au",
    "co.jp", "co.kr", "co.in", "co.nz", "co.za",
    "com.br", "com.cn", "com.mx", "com.sg", "com.tr", "com.ar",
)

_HOST_RE = r"^[A-Za-z][A-Za-z0-9+.\-]*://(?:[^/?#@]*@)?([^/:?#]+)"
_IPV4_RE = r"^\d{1,3}(\.\d{1,3}){3}$"


def _canon_host(col: F.Column) -> F.Column:
    """Canonical host form: lowercased, trailing dots stripped (the
    FQDN-root form 'example.com.' resolves identically to
    'example.com' — without the strip it would split to a trailing
    empty label and classify as domain 'com.')."""
    return F.regexp_replace(F.lower(col), r"\.+$", "")


def host_col(url_col: str = "url") -> F.Column:
    """Canonical host of an absolute URL (scheme://[userinfo@]host
    [:port]/...): lowercased, trailing dots stripped; '' when the
    string is not an absolute URL or is NULL (null-safe so the domain
    CASE never sees a NULL size under ANSI mode)."""
    return _canon_host(F.regexp_extract(
        F.coalesce(F.col(url_col), F.lit("")), _HOST_RE, 1))


def _domain_of_host(h: F.Column) -> F.Column:
    """Registered domain of a canonical HOST string: the host itself
    for IPv4 literals and ≤ 2-label hosts, the last three labels when
    the last two are a known second-level public suffix (co.uk etc.),
    else the last two; NULL for ''. CASE branches evaluate lazily, so
    the negative element_at never fires out-of-range under ANSI
    mode. Shared by the URL path and the blocklist normalizer so both
    sides of the gate agree on identity."""
    parts = F.split(h, r"\.")
    np = F.size(parts)
    last2 = F.concat_ws(".", F.element_at(parts, -2),
                        F.element_at(parts, -1))
    last3 = F.concat_ws(".", F.element_at(parts, -3),
                        F.element_at(parts, -2), F.element_at(parts, -1))
    return (F.when(h == "", F.lit(None).cast("string"))
            .when(h.rlike(_IPV4_RE), h)
            .when(np <= 2, h)
            .when(last2.isin(*SECOND_LEVEL_SUFFIXES), last3)
            .otherwise(last2))


def registered_domain_col(url_col: str = "url") -> F.Column:
    """Registered domain (site identity) of a URL column: see
    `_domain_of_host`; NULL for non-URL strings."""
    return _domain_of_host(host_col(url_col))


# the full-PSL deploy shape: suffixes up to this many labels are
# candidate-matched (the public suffix list's longest rules are 4-5
# labels; 4 covers all but a handful of exotic entries)
PSL_MAX_LABELS = 4


def with_registered_domain(df: DataFrame, url_col: str = "url",
                           psl: DataFrame | None = None,
                           out: str = "domain") -> DataFrame:
    """Attach the registered-domain column, by either identity rule:

    - psl=None — the inline SECOND_LEVEL_SUFFIXES heuristic
      (registered_domain_col), zero joins.
    - psl=DataFrame(suffix) — the documented deploy shape: the full
      public-suffix list as a BROADCAST table, longest-suffix match
      at domain-extraction time. Implemented as PSL_MAX_LABELS
      chained broadcast left joins (one per candidate suffix length,
      k labels each) + a lazy CASE that picks the longest hit —
      no explode, no extra shuffle, plans as k broadcast hash joins
      over one shared broadcast. No match falls back to the
      classic last-two-label rule, IPv4 literals and one-label hosts
      are themselves, '' is NULL — identical conventions to the
      inline path, so table == inline wherever the subset suffices
      (pinned by tests/test_urlstats.py). Wildcard (`*.ck`) and
      exception (`!www.ck`) PSL rules are out of scope — feed the
      expanded concrete rows instead."""
    if psl is None:
        return df.withColumn(out, registered_domain_col(url_col))
    b = F.broadcast(psl.select(_canon_host(F.col("suffix"))
                               .alias("_sfx")).dropDuplicates())
    h = F.nullif(host_col(url_col), F.lit(""))
    d = df.withColumn("_h", h)
    parts = F.split(F.col("_h"), r"\.")
    np = F.size(parts)

    def last_k(k: int) -> F.Column:
        return F.concat_ws(".", *[F.element_at(parts, -i)
                                  for i in range(k, 0, -1)])

    ks = range(PSL_MAX_LABELS, 0, -1)  # longest first
    for k in ks:
        d = d.withColumn(f"_c{k}", F.when(np >= k, last_k(k)))
        d = d.join(b.withColumnRenamed("_sfx", f"_m{k}"),
                   F.col(f"_c{k}") == F.col(f"_m{k}"), "left")
    dom = F.when(F.col("_h").isNull(), F.lit(None).cast("string")) \
        .when(F.col("_h").rlike(_IPV4_RE), F.col("_h"))
    for k in ks:
        dom = dom.when(
            F.col(f"_m{k}").isNotNull(),
            F.when(np > k, last_k(k + 1)).otherwise(F.col("_h")))
    dom = dom.otherwise(
        F.when(np <= 2, F.col("_h")).otherwise(last_k(2)))
    out_df = d.withColumn(out, dom)
    return out_df.drop("_h", *[c for k in ks
                               for c in (f"_c{k}", f"_m{k}")])


def domain_page_stats(pages: DataFrame, url_col: str = "url",
                      by: str = "domain",
                      psl: DataFrame | None = None) -> DataFrame:
    """Per-site rollup: (domain, n_pages, n_urls), grouped by the
    registered domain (`by="domain"`, the curation unit; pass
    `psl=` for full-public-suffix-list identity — see
    with_registered_domain) or the full host (`by="host"`, the
    subdomain granularity — what the synthetic corpus's Zipf skew
    lives at).

    ONE corpus scan, no join: the first aggregation groups by
    (domain, url-derived salt) computing the partial count and the
    bucket-local exact distinct, the second sums both per domain.
    Exactness: the salt is a pure function of the url, so each
    distinct url lands in exactly one bucket and bucket distincts add
    up (the ops/skew.salted_distinct_count argument); count(*) is
    trivially additive. Skew: a Zipf head domain spreads over all
    salt buckets in phase 1 (map-side combinable), and phase 2 sees
    ≤ n_buckets rows per domain (SURVEY §4.1)."""
    if by not in ("domain", "host"):
        raise ValueError(f"by must be 'domain' or 'host', got {by!r}")
    if by == "domain":
        d = with_registered_domain(pages, url_col, psl) \
            .select("domain", F.col(url_col).alias("_u"))
    else:
        d = pages.select(
            F.nullif(host_col(url_col), F.lit("")).alias("domain"),
            F.col(url_col).alias("_u"))
    salt = F.pmod(F.xxhash64(F.col("_u")), F.lit(16))
    per_bucket = (d.groupBy("domain", salt.alias("_salt"))
                  .agg(F.count("*").alias("_n"),
                       F.count_distinct("_u").alias("_d")))
    return (per_bucket.groupBy("domain")
            .agg(F.sum("_n").alias("n_pages"),
                 F.sum("_d").alias("n_urls")))


def domain_blocklist_filter(pages: DataFrame, blocked: DataFrame,
                            url_col: str = "url",
                            psl: DataFrame | None = None) -> DataFrame:
    """Drop pages matching `blocked(domain)` — the C4-style badlist
    gate. Entries are matched at BOTH granularities so host-level
    lines in real badlists ('ads.tracker.co.uk') do something instead
    of silently no-oping: a page is dropped when its canonical HOST
    equals a blocked entry (exact-host block) OR its REGISTERED DOMAIN
    equals a blocked entry (whole-site block). Two chained broadcast
    left-anti hash joins (an OR-condition single join would degrade to
    a nested-loop); blocklists are O(10^5) rows — always the small
    side. All input columns pass through unchanged."""
    b = F.broadcast(
        blocked.select(_canon_host(F.col("domain")).alias("_b"))
        .dropDuplicates())
    out = (with_registered_domain(pages, url_col, psl, out="_dom")
           .withColumn("_host", F.nullif(host_col(url_col), F.lit("")))
           .join(b, F.col("_host") == F.col("_b"), "left_anti")
           .join(b, F.col("_dom") == F.col("_b"), "left_anti"))
    return out.drop("_host", "_dom")
