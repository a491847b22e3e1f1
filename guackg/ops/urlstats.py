"""URL/domain operators over the webtext pages table — host
extraction, registered-domain rollups, and domain blocklist filtering:
the per-source curation layer of a Common-Crawl-style pipeline (the
analog of the reference's per-collector source provenance,
/root/reference/pkg/handler/processor/processor.go:97-103, where every
document carries its Collector/Source and downstream policy keys off
it).

All JVM-side built-ins (regexp_extract / split / element_at /
broadcast anti-join) — no Python, narrow except the rollup's single
combinable aggregation. Patterns are RE2-compatible; exact DuckDB
parity in tests/test_textclean.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from guackg.ops.skew import salted_distinct_count

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


def host_col(url_col: str = "url") -> F.Column:
    """Lowercased host of an absolute URL (scheme://[userinfo@]host
    [:port]/...); '' when the string is not an absolute URL or is
    NULL (null-safe so the domain CASE never sees a NULL size under
    ANSI mode)."""
    return F.lower(F.regexp_extract(
        F.coalesce(F.col(url_col), F.lit("")), _HOST_RE, 1))


def registered_domain_col(url_col: str = "url") -> F.Column:
    """Registered domain (site identity) of a URL: the last two host
    labels, or three when the last two are a known second-level public
    suffix (co.uk etc.); the bare host when it has ≤ 2 labels; NULL
    for non-URL strings. CASE branches evaluate lazily, so the
    negative element_at never fires out-of-range under ANSI mode."""
    h = host_col(url_col)
    parts = F.split(h, r"\.")
    np = F.size(parts)
    last2 = F.concat_ws(".", F.element_at(parts, -2),
                        F.element_at(parts, -1))
    last3 = F.concat_ws(".", F.element_at(parts, -3),
                        F.element_at(parts, -2), F.element_at(parts, -1))
    return (F.when(h == "", F.lit(None).cast("string"))
            .when(np <= 2, h)
            .when(last2.isin(*SECOND_LEVEL_SUFFIXES), last3)
            .otherwise(last2))


def domain_page_stats(pages: DataFrame, url_col: str = "url",
                      by: str = "domain") -> DataFrame:
    """Per-site rollup: (domain, n_pages, n_urls), grouped by the
    registered domain (`by="domain"`, the curation unit) or the full
    host (`by="host"`, the subdomain granularity — what the synthetic
    corpus's Zipf skew lives at).

    Scale shape: n_pages is a combinable count (map-side partials, so
    a mega-domain costs one row per map partition); n_urls is an EXACT
    distinct count through ops/skew.salted_distinct_count — the
    url-derived salt splits a hot domain's distinct space across
    reducers, the per-bucket counts add up exactly (the Zipf-skewed
    domain distribution is the head-entity case of SURVEY §4.1)."""
    if by not in ("domain", "host"):
        raise ValueError(f"by must be 'domain' or 'host', got {by!r}")
    key = (registered_domain_col(url_col) if by == "domain"
           else F.nullif(host_col(url_col), F.lit("")))
    d = pages.select(key.alias("domain"), F.col(url_col).alias("_u"))
    counts = d.groupBy("domain").agg(F.count("*").alias("n_pages"))
    distincts = (salted_distinct_count(d, ["domain"], "_u")
                 .withColumnRenamed("n_distinct", "n_urls")
                 .withColumnRenamed("domain", "_dom2"))
    # null-safe join: the NULL-domain group (non-URL rows) must still
    # pick up its distinct count — a plain equi-join drops it
    return (counts.join(distincts,
                        counts["domain"].eqNullSafe(distincts["_dom2"]),
                        "left")
            .select("domain", "n_pages",
                    F.coalesce("n_urls", F.lit(0)).alias("n_urls")))


def domain_blocklist_filter(pages: DataFrame, blocked: DataFrame,
                            url_col: str = "url") -> DataFrame:
    """Drop pages whose registered domain is in `blocked(domain)` —
    the C4-style badlist gate. Broadcast left-anti join (blocklists
    are O(10^5) rows — always the small side); all input columns pass
    through unchanged."""
    b = F.broadcast(
        blocked.select(F.lower(F.col("domain")).alias("_bdom"))
        .dropDuplicates())
    return (pages
            .withColumn("_dom", registered_domain_col(url_col))
            .join(b, F.col("_dom") == F.col("_bdom"), "left_anti")
            .drop("_dom"))
