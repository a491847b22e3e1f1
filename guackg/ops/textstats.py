"""Text-analysis operators over a documents table — the training-data
pipeline toolkit (language-ID, quality scoring, token counting,
fingerprinting). All pure built-in expressions: whole-stage codegen,
zero Python. Each has an exact DuckDB-SQL oracle in __spark_entry__.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# stopword lexicons for the n-gram-free language heuristic
_EN = ["the", "and", "of", "to", "in", "is", "for"]
_DE = ["der", "die", "und", "das", "ist", "nicht", "mit"]
_FR = ["le", "la", "et", "les", "des", "est", "dans"]


def _count_words(col: str, words: list[str]) -> F.Column:
    """Occurrences of any lexicon word, word-bounded, case-insensitive.
    regexp_count is JVM-side; one regex per lexicon."""
    pat = r"\b(" + "|".join(words) + r")\b"
    return F.regexp_count(F.lower(F.col(col)), F.lit(pat))


def lang_guess_col(text_col: str = "text") -> F.Column:
    """The language-guess EXPRESSION alone — composable into a wider
    projection (clean_corpus gates on it without a doc_id join)."""
    en, de, fr = (_count_words(text_col, w) for w in (_EN, _DE, _FR))
    return (
        F.when((en >= de) & (en >= fr) & (en > 0), F.lit("en"))
        .when((de >= fr) & (de > 0), F.lit("de"))
        .when(fr > 0, F.lit("fr"))
        .otherwise(F.lit("unknown"))
    )


def language_id(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Stopword-ratio language guess (the DocumentType-guesser analog,
    /root/reference/pkg/handler/processor/guesser/guesser.go:25-51:
    registry of cheap sniffs, first confident hit wins)."""
    en, de, fr = (_count_words(text_col, w) for w in (_EN, _DE, _FR))
    return docs.select(
        "doc_id",
        en.alias("en_hits"), de.alias("de_hits"), fr.alias("fr_hits"),
        lang_guess_col(text_col).alias("lang_guess"),
    )


def quality_col(text_col: str = "text") -> F.Column:
    """The composite quality-score EXPRESSION alone — same formula as
    `quality_score`, composable without a doc_id join."""
    length = F.length(F.col(text_col))
    n_tokens = F.size(F.split(F.trim(F.col(text_col)), r"\s+"))
    n_punct = F.regexp_count(F.col(text_col), F.lit(r"[^\w\s]"))
    n_stop = _count_words(text_col, _EN)
    punct_ratio = F.round(n_punct / F.greatest(length, F.lit(1)), 6)
    stop_ratio = F.round(n_stop / F.greatest(n_tokens, F.lit(1)), 6)
    return F.round(
        F.when(length < 50, 0.0).otherwise(1.0)
        * (1.0 - F.least(punct_ratio * 4, F.lit(1.0)))
        * F.least(stop_ratio * 5 + 0.2, F.lit(1.0)), 6)


def quality_score(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Length / punctuation / stopword quality features + composite
    score — the C4-style quality-filter shape."""
    length = F.length(F.col(text_col))
    # trimmed split — the same whitespace-token definition as
    # token_counts; untrimmed, padded text gains a phantom '' token
    # that skews stop_ratio/mean_word_len
    n_tokens = F.size(F.split(F.trim(F.col(text_col)), r"\s+"))
    n_punct = F.regexp_count(F.col(text_col), F.lit(r"[^\w\s]"))
    n_stop = _count_words(text_col, _EN)
    punct_ratio = F.round(n_punct / F.greatest(length, F.lit(1)), 6)
    stop_ratio = F.round(n_stop / F.greatest(n_tokens, F.lit(1)), 6)
    mean_word_len = F.round(
        (length - n_tokens + 1) / F.greatest(n_tokens, F.lit(1)), 6)
    score = quality_col(text_col)
    return docs.select(
        "doc_id", length.alias("n_chars_calc"), n_tokens.alias("n_tokens"),
        punct_ratio.alias("punct_ratio"), stop_ratio.alias("stop_ratio"),
        mean_word_len.alias("mean_word_len"), score.alias("quality"),
    )


def token_counts(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Whitespace tokens + BPE-ish subword estimate (regex word pieces:
    letter runs, digit runs, single punctuation)."""
    ws_tokens = F.size(F.split(F.trim(F.col(text_col)), r"\s+"))
    bpe_ish = F.regexp_count(
        F.col(text_col), F.lit(r"[A-Za-z]{1,4}|[0-9]|[^A-Za-z0-9\s]"))
    return docs.select(
        "doc_id",
        ws_tokens.alias("ws_tokens"),
        bpe_ish.alias("bpe_tokens"),
    )


def fingerprint(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Document fingerprint: md5 of whitespace-normalized lowercase
    text (content identity — the HasSBOM sha256-of-blob analog,
    /root/reference/pkg/ingestor/parser/common/helpers.go:110-123)."""
    norm = F.lower(F.trim(F.regexp_replace(F.col(text_col), r"\s+", " ")))
    return docs.select(
        "doc_id",
        F.md5(norm).alias("fingerprint"),
        F.sha2(norm, 256).alias("fingerprint_sha256"),
    )


def _lines(text_col: str) -> F.Column:
    """Non-empty trimmed lines of a document — the unit of the
    repetition signals. NULL text yields a NULL array (callers guard
    with size() > 0, which is false for NULL's size -1)."""
    return F.filter(
        F.transform(F.split(F.col(text_col), r"\n"), lambda x: F.trim(x)),
        lambda x: x != F.lit(""))


def repetition_col(text_col: str = "text") -> F.Column:
    """Duplicate-line fraction EXPRESSION alone (composable into
    clean_corpus's single gate projection): 1 - distinct/total over
    non-empty trimmed lines; 0.0 for NULL/line-less text. The
    boilerplate-repetition signal of the Gopher quality rules (Rae et
    al. 2021, public paper) — the analog of the reference's per-type
    validators that reject degenerate documents before parsing
    (/root/reference/pkg/handler/processor/process/process.go:182-207)."""
    lines = _lines(text_col)
    n = F.size(lines)
    return (F.when(n > 0,
                   F.round(F.lit(1.0)
                           - F.size(F.array_distinct(lines)) / n, 6))
            .otherwise(F.lit(0.0)))


def repetition_stats(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Per-doc line-repetition signals (Gopher repetition filters):
    n_lines, dup_line_frac (fraction of line INSTANCES that are
    repeats), dup_line_char_frac (fraction of line CHARACTERS inside
    repeated instances). Pure built-ins — split/transform/filter/
    array_distinct/concat_ws — whole-stage codegen, narrow, no
    shuffle; the 100-TB shape is a projection. Exact DuckDB-parity
    oracle in tests/test_textclean.py."""
    lines = _lines(text_col)
    n = F.size(lines)
    tot = F.length(F.concat_ws("", lines))
    uniq = F.length(F.concat_ws("", F.array_distinct(lines)))
    return docs.select(
        "doc_id",
        F.greatest(n, F.lit(0)).alias("n_lines"),
        repetition_col(text_col).alias("dup_line_frac"),
        F.when(tot > 0, F.round(F.lit(1.0) - uniq / tot, 6))
        .otherwise(F.lit(0.0)).alias("dup_line_char_frac"),
    )


def words_col(text_col: str = "text") -> F.Column:
    """Lower-cased whitespace word array with empties removed — THE
    tokenization rule every word-n-gram op shares (top_ngram_stats
    here, ops/contamination.py's overlap grams). One definition so a
    future change to the split/lowering rule cannot silently diverge
    between the oracle-checked stats and the decontamination gate."""
    return F.filter(
        F.split(F.lower(F.trim(F.coalesce(F.col(text_col), F.lit("")))),
                r"\s+"),
        lambda x: x != F.lit(""))


def ngrams_over_words(n: int, words: str = "_w") -> F.Column:
    """Word n-gram array over an already-projected word-array column
    (default name `_w`). Docs with < n words yield an EMPTY array —
    sequence(1, k) DESCENDS when k < 1, so the gram build is gated on
    size >= n."""
    return F.when(
        F.size(words) >= n,
        F.expr(f"transform(sequence(1, size({words}) - {n} + 1), "
               f"i -> array_join(slice({words}, i, {n}), ' '))"))\
        .otherwise(F.expr("cast(array() as array<string>)"))


def top_ngram_stats(docs: DataFrame, text_col: str = "text",
                    n: int = 2) -> DataFrame:
    """Most-frequent word n-gram per doc and its share of all n-grams
    (the Gopher top-n-gram repetition filter). One row per input doc:
    (doc_id, n_grams, top_gram, top_count, top_frac); docs with < n
    words get (0, NULL, 0, 0.0).

    Tie-break is deterministic: max count, then lexicographically
    LARGEST gram (binary collation — identical in DuckDB), via a
    single max(struct(cnt, gram)) aggregate. Scale shape: the explode
    keys every shuffle by doc_id (+gram), so head documents cannot
    skew a partition beyond their own gram count; no corpus-wide
    window. Exact DuckDB-parity oracle in tests/test_textclean.py."""
    base = docs.select("doc_id", words_col(text_col).alias("_w")).select(
        "doc_id",
        F.when(F.size("_w") >= n, F.size("_w") - (n - 1))
        .otherwise(F.lit(0)).alias("n_grams"),
        ngrams_over_words(n).alias("_grams"))
    top = (base.select("doc_id", F.explode("_grams").alias("gram"))
           .groupBy("doc_id", "gram").agg(F.count("*").alias("cnt"))
           .groupBy("doc_id")
           .agg(F.max(F.struct("cnt", "gram")).alias("_top"))
           .select("doc_id", F.col("_top.gram").alias("top_gram"),
                   F.col("_top.cnt").alias("top_count")))
    return (base.select("doc_id", "n_grams")
            .join(top, on="doc_id", how="left")
            .select(
                "doc_id", "n_grams", "top_gram",
                F.coalesce("top_count", F.lit(0)).alias("top_count"),
                F.when(F.col("n_grams") > 0,
                       F.round(F.coalesce("top_count", F.lit(0))
                               / F.col("n_grams"), 6))
                .otherwise(F.lit(0.0)).alias("top_frac")))


# winnowing constants: k-gram length, window width, polynomial base/mod
# (base-31 mod 1e9+7 — computable identically in any engine with
# 64-bit ints, unlike xxhash64; Schleimer/Wilkerson/Aiken winnowing,
# SIGMOD'03 — public algorithm)
WINNOW_K = 8
WINNOW_W = 4
_POLY_BASE = 31
_POLY_MOD = 1_000_000_007


def winnow_fingerprints(docs: DataFrame, text_col: str = "text",
                        k: int = WINNOW_K, w: int = WINNOW_W) -> DataFrame:
    """Rolling-hash document fingerprints by winnowing: hash every
    k-char gram with a base-31 polynomial (mod 1e9+7), slide a
    w-gram window, keep each window's MINIMUM hash, emit the distinct
    minima as (doc_id, fingerprint) rows. Near-identical documents
    share most fingerprints (the content-defined-chunking identity
    family next to md5/sha in `fingerprint`).

    All built-in expressions — sequence/transform/aggregate/slice/
    array_min — whole-stage codegen, no Python, no UDF; the modular
    fold keeps every intermediate < 2^35 so ANSI arithmetic never
    overflows. Docs shorter than k+w-1 chars yield no rows (same rule
    as the n-gram shingle ops)."""
    t = f"lower(trim({text_col}))"
    gram_hash = (
        f"aggregate(sequence(0, {k - 1}), 0L, "
        f"(acc, j) -> (acc * {_POLY_BASE} + ascii(substring(_t, i + j, 1)))"
        f" % {_POLY_MOD})")
    hashes = (f"transform(sequence(1, length(_t) - {k} + 1), "
              f"i -> {gram_hash})")
    # _gh bound ONCE per row — the window pass slices the materialized
    # array (inlining it would re-evaluate the full hash array per
    # window: O(n²k))
    minima = (f"array_distinct(transform(sequence(1, size(_gh) - {w} + 1), "
              f"i -> array_min(slice(_gh, i, {w}))))")
    return (docs
            .withColumn("_t", F.expr(t))
            .filter(F.expr(f"length(_t) >= {k + w - 1}"))
            .withColumn("_gh", F.expr(hashes))
            .select("doc_id", F.explode(F.expr(minima)).alias("fingerprint")))
