"""Benchmark-contamination detection: word-n-gram overlap between a
corpus and a (small) benchmark/eval set, and the decontamination gate
built on it — the standard LLM-training-data hygiene op (13-gram
overlap decontamination as published in GPT-3 appendix C and the
Llama/PaLM data cards; public method).

KG-reference analog: guac's visited-set dedup consults a small known
set before admitting a document (/root/reference/pkg/ingestor/parser/
parser.go:160-188); here the "known set" is the benchmark's n-gram
inventory and the consult is a broadcast join.

Scale shape: the benchmark side is normally an eval set — thousands
of docs — so its distinct-gram inventory broadcasts and the corpus
side streams through a broadcast hash join; nothing shuffles on
corpus size except the final per-doc count aggregation, which is
map-side combinable. The broadcast is DECIDED BY MEASUREMENT, not
trusted from the caller: the inventory is exact-counted and only
broadcasts at or below BROADCAST_MAX_GRAMS (the pipeline's
page-map count-then-decide rule), else the join shuffles under AQE.
All built-in expressions, no Python.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

DEFAULT_N = 13  # the published decontamination gram length

# measured-broadcast bound: an n-gram row is a ~100-byte string, so
# 2M grams ≈ 200 MB on the driver — the same exact-count-then-decide
# rule the pipeline applies to its page map (pipeline.py /
# materialize.page_map_fits_broadcast), here for the benchmark
# inventory. Above it the join falls back to a shuffle and AQE picks
# the physical strategy.
BROADCAST_MAX_GRAMS = 2_000_000


def _distinct_grams(n: int) -> F.Column:
    """Distinct word n-grams over the pre-projected `_w` word array —
    the SHARED tokenization + gram rule from textstats (words_col /
    ngrams_over_words), distinct-wrapped for the overlap measure."""
    from guackg.ops.textstats import ngrams_over_words
    return F.array_distinct(ngrams_over_words(n))


def ngram_inventory(docs: DataFrame, n: int = DEFAULT_N,
                    text_col: str = "text") -> DataFrame:
    """Global distinct word-n-gram inventory of a corpus: one `gram`
    column, one row per distinct gram. For a benchmark set this is the
    broadcast side of contamination_overlap."""
    from guackg.ops.textstats import words_col
    return (docs
            .select(words_col(text_col).alias("_w"))
            .select(F.explode(_distinct_grams(n)).alias("gram"))
            .distinct())


def contamination_overlap(corpus: DataFrame, benchmark: DataFrame,
                          n: int = DEFAULT_N, text_col: str = "text",
                          broadcast_benchmark: bool | None = None
                          ) -> DataFrame:
    """Per-corpus-document overlap with the benchmark's n-gram set:
    (doc_id, n_grams, matched_grams, contamination_frac), one row per
    corpus doc. `n_grams` counts the doc's DISTINCT grams (the frac
    denominator); `matched_grams` counts how many of those appear
    anywhere in the benchmark; docs with < n words report (0, 0, 0.0).

    broadcast_benchmark=None (default) DECIDES BY MEASURING: the
    inventory is materialized once (localCheckpoint, reused by the
    join) and exact-counted; at or below BROADCAST_MAX_GRAMS it
    broadcasts, above it the join shuffles and AQE picks the
    strategy — a caller-supplied "benchmark" the size of a corpus
    (10^7+ long 13-gram strings, a multi-hundred-MB broadcast) can
    no longer flatten the driver by default. True/False force either
    path (the plan-flip unit test pins both). Exact DuckDB-parity
    oracle in tests/test_contamination.py."""
    from guackg.ops.textstats import words_col
    inv = ngram_inventory(benchmark, n, text_col)
    if broadcast_benchmark is None:
        inv = inv.localCheckpoint()
        broadcast_benchmark = inv.count() <= BROADCAST_MAX_GRAMS
    if broadcast_benchmark:
        inv = F.broadcast(inv)
    base = (corpus
            .select("doc_id", words_col(text_col).alias("_w"))
            .select("doc_id", _distinct_grams(n).alias("_g")))
    per_doc = (base
               .select("doc_id", F.explode("_g").alias("gram"))
               .join(inv.withColumn("_hit", F.lit(1)), on="gram",
                     how="left")
               .groupBy("doc_id")
               .agg(F.count("*").alias("n_grams"),
                    F.count("_hit").alias("matched_grams")))
    # left join restores the zero-gram docs the explode dropped
    return (base.select("doc_id")
            .join(per_doc, on="doc_id", how="left")
            .select(
                "doc_id",
                F.coalesce("n_grams", F.lit(0)).alias("n_grams"),
                F.coalesce("matched_grams", F.lit(0))
                .alias("matched_grams"),
                F.when(F.coalesce("n_grams", F.lit(0)) > 0,
                       F.round(F.coalesce("matched_grams", F.lit(0))
                               / F.col("n_grams"), 6))
                .otherwise(F.lit(0.0)).alias("contamination_frac")))


def decontaminate(corpus: DataFrame, benchmark: DataFrame,
                  n: int = DEFAULT_N, max_frac: float = 0.0,
                  text_col: str = "text",
                  broadcast_benchmark: bool | None = None) -> DataFrame:
    """Corpus rows whose contamination_frac ≤ max_frac (default:
    drop any doc sharing even one n-gram with the benchmark — the
    published strict rule). Returns the corpus columns plus the
    overlap stats so the gate is auditable; compose with
    clean.clean_corpus by filtering before the cleaning stages."""
    stats = contamination_overlap(corpus, benchmark, n, text_col,
                                  broadcast_benchmark)
    # gate on the UNROUNDED ratio: matched/n <= max_frac  <=>
    # matched <= max_frac*n (n >= 0). The reported contamination_frac
    # is rounded to 6 places for oracle portability, so a book-length
    # doc with one matched gram (true frac ~1e-7) would round to 0.0
    # and slip a frac-based strict gate.
    return (corpus.join(stats, on="doc_id", how="inner")
            .filter(F.col("matched_grams")
                    <= F.lit(max_frac) * F.col("n_grams")))
