"""spark-submit entry point for the enrichment cycle — the
`guacone certifier ...` loop analog (SURVEY.md §3.3): the reference
walks the assembled graph, asks an external service about what it
finds, and RE-INGESTS the answers
(/root/reference/pkg/certifier/certify/certify.go:66-138,
cmd/guacone/cmd/osv.go). Here the feedback channel is the S9/T12
identifier side-channel: surfaces the linker could not resolve,
ranked by mention frequency, are promoted into the alias dictionary
and the same corpus re-links against the grown dictionary —
extract/triples resume from lineage, while link→materialize recompute
because the dictionary's content fingerprint changed (pipeline.py).

    spark-submit --py-files guackg.zip scripts/enrich_cycle.py \
        --pages <parquet dir | synthetic:N> --workdir /path/to/work \
        [--min-mentions 3] [--max-promotions 1000] [--master local[8]]

Prints one JSON line: candidates seen, promotions, unresolved surfaces
before/after, and per-cycle elapsed seconds.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from guackg.pipeline import KGPipeline
from guackg.session import get_spark


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--pages", required=True,
                    help="parquet dir, or synthetic:N")
    ap.add_argument("--workdir", required=True)
    ap.add_argument("--min-mentions", type=int, default=3,
                    help="promote only candidates seen at least this "
                         "often (curation-queue rank threshold)")
    ap.add_argument("--max-promotions", type=int, default=1000)
    ap.add_argument("--master", default=None)
    args = ap.parse_args()

    spark = get_spark("guackg-enrich", master=args.master)
    spark.sparkContext.setLogLevel("ERROR")
    t0 = time.time()

    from guackg.testing.gen import generate_corpus, spark_generate_pages
    if args.pages.startswith("synthetic:"):
        n = int(args.pages.split(":", 1)[1])
        pages = spark_generate_pages(spark, n)
        input_fp = f"synthetic:{n}"
    else:
        pages = spark.read.parquet(args.pages)
        input_fp = args.pages
    fixtures = generate_corpus(0)
    alias = spark.createDataFrame(fixtures["alias_dict"])
    assertions = spark.createDataFrame(fixtures["assertions"])

    pipe = KGPipeline(spark, args.workdir)
    out = pipe.run(pages, alias, assertions, input_fingerprint=input_fp)
    cand = out["identifier_candidates"]
    n_candidates = cand.count()
    t_first = time.time()

    # localCheckpoint: the promotion rows derive from the candidate
    # table the delta pass overwrites — pin them first
    promoted = (cand.filter(F.col("n_mentions") >= args.min_mentions)
                .orderBy(F.desc("n_mentions"), "norm")
                .limit(args.max_promotions)
                .select(F.col("norm").alias("surface"),
                        F.col("suggested_key").alias("canonical_key"),
                        F.lit("candidate").alias("kind"))
                .localCheckpoint())
    n_promoted = promoted.count()

    delta_stats = {}
    resumed = []
    if n_promoted:
        enriched = alias.unionByName(promoted)
        # O(delta) re-link (guackg/enrich.py): only the promoted
        # surfaces' links change, the graph is patched exactly (stale
        # fallback identities retracted), and lineage is stamped under
        # the enriched dictionary — the round-3 full link→materialize
        # recompute is gone (root_package.go:127-184 anti-join
        # semantics: re-process only what lacks fresh results)
        from guackg.enrich import apply_promotions
        delta_stats = apply_promotions(
            spark, args.workdir, promoted, enriched,
            assertions=assertions, input_fingerprint=input_fp)
        # proof of re-entrancy: a full pipeline invocation with the
        # enriched dictionary now resumes EVERY stage from lineage
        pipe2 = KGPipeline(spark, args.workdir)
        out = pipe2.run(pages, enriched, assertions,
                        input_fingerprint=input_fp)
        resumed = [s for s in
                   ("extract", "triples", "link", "canonicalize",
                    "materialize")
                   if s not in pipe2.stage_secs]

    print(json.dumps({
        "candidates": n_candidates,
        "promoted": n_promoted,
        "unresolved_after": out["identifier_candidates"].count(),
        "stages_resumed": resumed,
        "first_pass_sec": round(t_first - t0, 2),
        "enrich_pass_sec": round(time.time() - t_first, 2),
        **{f"delta_{k}": v for k, v in delta_stats.items()},
    }))
    spark.stop()


if __name__ == "__main__":
    main()
