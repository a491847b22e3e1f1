"""Stage 5 — MATERIALIZE: resolved triples → nodes / edges tables.

The graph-assembler analog (/root/reference/pkg/assembler/clients/
helpers/bulk.go:29-191): dedup node specs across all predicates
BEFORE writing (assembler.go:198-578 GetPackages/GetArtifacts/…),
write nodes first then edges (bulk.go fixed mutation order), and dedup
edges on the full property tuple (inmem/isDependency.go:100-149 —
duplicate iff ALL of src/dst/justification/origin/collector equal).

Identity: entity_id = xxhash64(canonical_key) — deterministic, no
global sequence (the scale-out replacement for guac's atomic uint32,
backend.go:73-75); safe to recompute on any executor, any run.

Tables (Iceberg at scale; parquet here):
- nodes(entity_id, kind, canonical_key)                 partition: kind
- edges(src_id, pred, dst_id, n_evidence,
        first_seen, last_seen)                          partition: pred
- triples_resolved(url, warc_ts, subj_key, pred,
        obj_key, subj_surface, obj_surface, extractor)  evidence table

Skew note: the edge aggregation groups by (subj_key, pred, obj_key)
— head entities produce hot keys, but partial aggregation (map-side
combine, automatic for count/min/max) absorbs them; AQE splits any
residual skewed reduce partition. A two-stage salted aggregate is not
needed for algebraic aggs (only for collect_list-style holistic ones).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from guackg.cc import canonicalize_keys
from guackg.link import normalize_surface_col


def kind_of_key(col: F.Column) -> F.Column:
    """Entity kind derived from the canonical-key namespace
    (ent:<kind>/<slug>; anything else is an external identity)."""
    return F.when(col.startswith("ent:guac/"), F.lit("unlinked")) \
        .when(col.startswith("ent:"),
              F.regexp_extract(col, r"^ent:([a-z]+)/", 1)) \
        .otherwise(F.lit("external"))


def resolve_triples(triples: DataFrame, links: DataFrame,
                    components: DataFrame) -> DataFrame:
    """surface triples + links(norm→canonical_key) + CC components
    → triples with final canonical subj_key/obj_key.

    Two hash joins against the links table (small relative to triples;
    broadcast at test scale, shuffle join at web scale) + two CC
    rewrites."""
    link_map = links.select("norm", "canonical_key")
    t = triples.withColumn("subj_norm",
                           normalize_surface_col(F.col("subj_surface"))) \
               .withColumn("obj_norm",
                           normalize_surface_col(F.col("obj_surface")))
    t = t.join(link_map.withColumnRenamed("norm", "subj_norm")
               .withColumnRenamed("canonical_key", "subj_key"),
               on="subj_norm", how="left")
    t = t.join(link_map.withColumnRenamed("norm", "obj_norm")
               .withColumnRenamed("canonical_key", "obj_key"),
               on="obj_norm", how="left")
    t = t.withColumn("subj_key", F.coalesce(
            "subj_key", F.concat(F.lit("ent:guac/"), F.col("subj_norm")))) \
         .withColumn("obj_key", F.coalesce(
            "obj_key", F.concat(F.lit("ent:guac/"), F.col("obj_norm"))))
    t = canonicalize_keys(t, "subj_key", components)
    t = canonicalize_keys(t, "obj_key", components)
    return t.select("url", "warc_ts", "subj_key", "pred", "obj_key",
                    "subj_surface", "obj_surface", "extractor")


def build_nodes(resolved: DataFrame, components: DataFrame) -> DataFrame:
    """Node table: every distinct canonical key referenced by a triple
    or a component member (assembler GetPackages-style cross-predicate
    dedup, assembler.go:198-314)."""
    from_triples = resolved.select(
        F.col("subj_key").alias("canonical_key")).union(
        resolved.select(F.col("obj_key").alias("canonical_key")))
    from_components = components.select(
        F.col("canon_key").alias("canonical_key"))
    keys = from_triples.union(from_components) \
        .dropDuplicates(["canonical_key"])
    return keys.select(
        F.xxhash64("canonical_key").alias("entity_id"),
        kind_of_key(F.col("canonical_key")).alias("kind"),
        "canonical_key",
    )


def build_edges(resolved: DataFrame) -> DataFrame:
    """Edge table with evidence rollup. Evidence identity is the full
    property tuple (guac's exact-tuple duplicate rule,
    isDependency.go:109-149): n_evidence counts DISTINCT
    (url, extractor) witnesses per edge — one shuffle, with first/last
    seen over all sightings (deterministic, unlike dedup-then-min
    which keeps an arbitrary row's timestamp per duplicate tuple)."""
    return (resolved.groupBy("subj_key", "pred", "obj_key")
            .agg(F.countDistinct("url", "extractor").alias("n_evidence"),
                 F.min("warc_ts").alias("first_seen"),
                 F.max("warc_ts").alias("last_seen"))
            .select(F.xxhash64("subj_key").alias("src_id"),
                    "pred",
                    F.xxhash64("obj_key").alias("dst_id"),
                    "n_evidence", "first_seen", "last_seen",
                    "subj_key", "obj_key"))
