"""Deduplication operators over a documents table: exact, word-Jaccard
near-dup (oracle-checkable), MinHash-LSH near-dup, SimHash (scale
paths). The training-data-pipeline counterpart of guac's
dedup-before-ingest maps (/root/reference/pkg/assembler/
assembler.go:198-314) and visited-set dedup (parser.go:160-188).

All-built-in expressions except nothing — no Python anywhere.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def exact_dedup(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Exact duplicates via content hash; keeps the smallest doc_id per
    group (deterministic winner — guac's first-wins map dedup).

    NULL text is NOT a duplicate of other NULL text: md5(NULL) is NULL
    and a window would group all NULLs into one fabricated cluster,
    silently discarding every NULL-text doc but one — so the group key
    falls back to a per-doc sentinel (each NULL doc is its own
    singleton, dup_count=1, content_hash stays NULL)."""
    h = F.md5(F.col(text_col))
    grp = F.coalesce(h, F.concat(F.lit("null:"),
                                 F.col("doc_id").cast("string")))
    return (docs.withColumn("content_hash", h)
            .withColumn("_grp", grp)
            .withColumn("rn", F.row_number().over(
                Window.partitionBy("_grp").orderBy("doc_id")))
            .withColumn("dup_count",
                        F.count("*").over(Window.partitionBy("_grp")))
            .filter(F.col("rn") == 1)
            .select("doc_id", "content_hash", "dup_count"))


def _word_set(text_col: str) -> F.Column:
    return F.array_distinct(
        F.split(F.lower(F.trim(F.col(text_col))), r"\s+"))


def jaccard_word_pairs(docs: DataFrame, threshold: float = 0.8,
                       text_col: str = "text") -> DataFrame:
    """All doc pairs with word-set Jaccard ≥ threshold.

    Shape: explode distinct words → self-join on word → count common
    words per pair → Jaccard from |A|,|B|,|A∩B|. The self-join is an
    equi-join on the word (shuffle-partitioned by word); stopword-level
    hot words would skew at web scale — production path is
    minhash_lsh_pairs below; this exact variant is the oracle anchor.
    """
    words = (docs
             .select("doc_id", F.explode(_word_set(text_col)).alias("word"),
                     F.size(_word_set(text_col)).alias("set_size")))
    a, b = words.alias("a"), words.alias("b")
    common = (a.join(b, on="word")
              .filter(F.col("a.doc_id") < F.col("b.doc_id"))
              .groupBy(F.col("a.doc_id").alias("doc_a"),
                       F.col("b.doc_id").alias("doc_b"),
                       F.col("a.set_size").alias("size_a"),
                       F.col("b.set_size").alias("size_b"))
              .agg(F.count("*").alias("n_common")))
    jac = F.col("n_common") / \
        (F.col("size_a") + F.col("size_b") - F.col("n_common"))
    return (common.withColumn("jaccard", F.round(jac, 6))
            .filter(F.col("jaccard") >= threshold)
            .select("doc_a", "doc_b", "jaccard"))


def _ngram_set(text_col: str, n: int) -> F.Column:
    """Distinct word n-gram shingles (whitespace tokens, lowercase).
    Pure SQL: slice the token array at each start offset; empty set for
    docs shorter than n tokens."""
    ws = f"split(lower(trim({text_col})), '\\\\s+')"
    return F.expr(
        f"case when size({ws}) >= {n} then array_distinct(transform("
        f"sequence(1, size({ws}) - {n} + 1), "
        f"i -> concat_ws(' ', slice({ws}, i, {n})))) "
        f"else array() end")


def ngram_jaccard_pairs(docs: DataFrame, n: int = 3,
                        threshold: float = 0.8,
                        text_col: str = "text") -> DataFrame:
    """All doc pairs with word-n-gram-shingle Jaccard ≥ threshold —
    the order-sensitive near-dup variant (word sets miss reorderings;
    shingles catch them). Same explode/equi-join/count shape as
    `jaccard_word_pairs`: shuffle keys are shingles, which are far
    less skewed than single hot words — this is the exact-tier anchor
    for `minhash_lsh_pairs` at scale."""
    shingles = (docs
                .select("doc_id",
                        F.explode(_ngram_set(text_col, n)).alias("sh"),
                        F.size(_ngram_set(text_col, n)).alias("set_size")))
    a, b = shingles.alias("a"), shingles.alias("b")
    common = (a.join(b, on="sh")
              .filter(F.col("a.doc_id") < F.col("b.doc_id"))
              .groupBy(F.col("a.doc_id").alias("doc_a"),
                       F.col("b.doc_id").alias("doc_b"),
                       F.col("a.set_size").alias("size_a"),
                       F.col("b.set_size").alias("size_b"))
              .agg(F.count("*").alias("n_common")))
    jac = F.col("n_common") / \
        (F.col("size_a") + F.col("size_b") - F.col("n_common"))
    return (common.withColumn("jaccard", F.round(jac, 6))
            .filter(F.col("jaccard") >= threshold)
            .select("doc_a", "doc_b", "jaccard"))


def _banding_for(n_hashes: int, threshold: float,
                 target_recall: float = 0.98) -> tuple[int, int]:
    """(rows_per_band, n_bands): the LONGEST band (most selective —
    fewest junk candidates) whose collision probability at J=threshold
    still meets `target_recall` via 1-(1-t^r)^b. Tuning bands to the
    query threshold matters: r=2 at t=0.9 admits ~12× the true pair
    count as candidates (measured at sf0.1); r=4 admits ~9× fewer
    band-join rows for boundary recall 0.9999."""
    best = (1, n_hashes)
    for r in range(1, n_hashes + 1):
        if n_hashes % r:
            continue
        b = n_hashes // r
        if 1.0 - (1.0 - threshold ** r) ** b >= target_recall:
            best = (r, b)
    return best


def minhash_lsh_pairs(docs: DataFrame, text_col: str = "text",
                      n_hashes: int = 32, n_bands: int | None = None,
                      threshold: float = 0.5,
                      new_ids: DataFrame | None = None) -> DataFrame:
    """Near-dup pairs via banded MinHash over word sets, verified with
    true Jaccard. The 100-TB shape, in order:

    0. EXACT-DUPLICATE COLLAPSE first: docs are grouped by their
       (sorted) word set and the whole LSH + verify pipeline runs on
       ONE representative per distinct set; member pairs are expanded
       back at the end by two hash joins. Jaccard is a function of
       the word set alone, so the output is identical — but a k-doc
       duplicate cluster costs O(k) membership rows instead of
       O(k²·bands) band-join candidates each paying signature +
       exact-Jaccard verification (web corpora are full of such
       clusters: measured at sf0.1, 5000 docs → 3935 distinct sets,
       8.6M candidate pairs → ~29k rep pairs, 20 s → ~4 s). The
       quadratic part that remains is the OUTPUT itself, produced by
       cheap joins. The group identity is a 128-bit fingerprint of
       the sorted array, never the array itself. Docs whose word set
       is NULL (NULL text) are excluded up front: xxhash64(NULL array)
       reduces to the seed constant, so fingerprint-grouping them
       would fabricate one giant J=1.0 "duplicate" group. (Empty and
       whitespace-only texts are NOT excluded — they tokenize to the
       singleton [""], and pairing them at J=1.0 is exactly what the
       exact word-Jaccard oracle emits for them.)
    1. band join carries ONLY (doc_id, band keys) — never the word
       arrays (a pair that collides in k bands would otherwise ship
       its arrays k times through the shuffle);
    2. pair dedup while rows are still 2 ints wide;
    3. signature-estimate prefilter: est-Jaccard = matching minhash
       fraction, keep est ≥ threshold − 3σ where σ = sqrt(t(1−t)/n)
       (≈0.27 at n=32, t=0.5 — boundary-pair recall loss <0.5%),
       discarding the heavy mid-similarity candidate mass cheaply;
    4. exact word-set Jaccard on the survivors only.

    Each word is hashed ONCE (`hs`); the n_hashes permutations derive
    from the 8-byte long via xxhash64(h, j) — n× fewer string hashes
    than hashing every word per permutation (standard MinHash
    practice; ANSI-safe vs wrap-around affine mixing).

    `new_ids` (optional, one id column) is INCREMENTAL mode — the
    production shape where a fresh ingest batch dedups against the
    existing corpus: `docs` is the full corpus (old ∪ new) and the
    output is restricted to pairs touching at least one new doc —
    exactly `minhash_lsh_pairs(docs)` filtered to new-touching pairs
    (same hash seeds ⇒ same candidates), but candidate pairs whose
    duplicate groups contain no new member are dropped BEFORE the
    signature prefilter and exact-verify tiers, so the expensive work
    is proportional to the batch, not the corpus. (Old-old pairs are
    already known from previous runs. This mode still recomputes the
    old side's signatures; the PERSISTED variant that reads them from
    a stored table instead is minhash_lsh_pairs_stored below, fed by
    write_minhash_state at ingest.)

    `n_bands=None` (default) tunes the banding to the threshold via
    `_banding_for` — longer bands at higher thresholds keep the
    band-join candidate mass proportional to the TRUE pair count
    instead of admitting every mid-similarity pair."""
    if n_bands is None:
        rows_per_band, n_bands = _banding_for(n_hashes, threshold)
    else:
        rows_per_band = n_hashes // n_bands
    # the set identity is a 128-bit fingerprint (two independent
    # xxhash64 of the sorted array), NOT the array itself: grouping and
    # the membership join carry 2 longs per row instead of the word
    # array, and the rep-selection agg is a hash agg on fixed-width
    # keys (collision odds ~n²/2¹²⁸ — the standard content-address
    # assumption; the exact-Jaccard verify in step 4 is unaffected).
    # Deliberately NOT persisted although three branches reuse it:
    # measured at sf0.1/local[32], caching wsd (or base below) is
    # 25-35% SLOWER than recomputing — the columnar cache must
    # materialize the word arrays, which breaks whole-stage codegen
    # and costs more than re-running tokenize+sort+hash per branch
    wsd = (docs.select("doc_id",
                       F.array_sort(_word_set(text_col)).alias("ws"))
           .filter(F.col("ws").isNotNull())
           .withColumn("fp1", F.xxhash64("ws"))
           .withColumn("fp2", F.xxhash64(F.lit(0x9E37), "ws")))
    rep_ids = wsd.groupBy("fp1", "fp2").agg(
        F.min("doc_id").alias("rep_id"))
    members = (wsd.select("doc_id", "fp1", "fp2")
               .join(rep_ids, on=["fp1", "fp2"])
               .select("rep_id", "doc_id"))
    if new_ids is not None:
        nid = (new_ids.select(F.col(new_ids.columns[0]).alias("_nid"))
               .distinct())
        members = (members
                   .join(nid, members["doc_id"] == nid["_nid"], "left")
                   .withColumn("is_new", F.col("_nid").isNotNull())
                   .drop("_nid"))
        # duplicate groups containing >= 1 new member; candidate pairs
        # where NEITHER side's group has one can produce no new-
        # touching output pair, so they die before prefilter/verify
        rep_new = (members.filter("is_new")
                   .select("rep_id").distinct())
    reps = (wsd.join(rep_ids.select(F.col("rep_id").alias("doc_id")),
                     on="doc_id")
            .select("doc_id", "ws"))
    base = (reps
            .withColumn("hs", _hs_col())
            .withColumn("sig", _sig_col(n_hashes))
            .drop("hs"))
    bands = _band_col(n_hashes, rows_per_band, n_bands)
    banded = base.withColumn("band", F.explode(bands)).select(
        "doc_id",
        F.col("band.band_id").alias("band_id"),
        F.col("band.band_hash").alias("band_hash"))
    a, b = banded.alias("a"), banded.alias("b")
    cand = (a.join(b, on=["band_id", "band_hash"])
            .filter(F.col("a.doc_id") < F.col("b.doc_id"))
            .select(F.col("a.doc_id").alias("doc_a"),
                    F.col("b.doc_id").alias("doc_b"))
            .dropDuplicates(["doc_a", "doc_b"]))
    if new_ids is not None:
        cand = (cand
                .join(rep_new.select(F.col("rep_id").alias("doc_a"),
                                     F.lit(True).alias("_na")),
                      on="doc_a", how="left")
                .join(rep_new.select(F.col("rep_id").alias("doc_b"),
                                     F.lit(True).alias("_nb")),
                      on="doc_b", how="left")
                .filter(F.col("_na").isNotNull() | F.col("_nb").isNotNull())
                .select("doc_a", "doc_b"))
    sigs = base.select("doc_id", "sig")
    est = F.expr(
        f"size(filter(zip_with(sig_a, sig_b, (x, y) -> x = y), v -> v))"
        f" / cast({n_hashes} as double)")
    # 3σ margin for an n_hashes Bernoulli estimate at J = threshold
    margin = 3.0 * (threshold * (1.0 - threshold) / n_hashes) ** 0.5
    prefiltered = (cand
                   .join(sigs.select(F.col("doc_id").alias("doc_a"),
                                     F.col("sig").alias("sig_a")), on="doc_a")
                   .join(sigs.select(F.col("doc_id").alias("doc_b"),
                                     F.col("sig").alias("sig_b")), on="doc_b")
                   .filter(est >= threshold - margin)
                   .select("doc_a", "doc_b"))
    ws = base.select("doc_id", "ws")
    verified = (prefiltered
                .join(ws.select(F.col("doc_id").alias("doc_a"),
                                F.col("ws").alias("ws_a")), on="doc_a")
                .join(ws.select(F.col("doc_id").alias("doc_b"),
                                F.col("ws").alias("ws_b")), on="doc_b"))
    jac = F.size(F.array_intersect("ws_a", "ws_b")) / \
        F.size(F.array_union("ws_a", "ws_b"))
    rep_pairs = (verified.withColumn("jaccard", F.round(jac, 6))
                 .filter(F.col("jaccard") >= threshold)
                 .select("doc_a", "doc_b", "jaccard"))
    # expand back to member pairs: within a duplicate group every pair
    # is J=1.0 by construction; across groups every member pair shares
    # its rep pair's exact Jaccard (identical word sets)
    ma, mb = members.alias("ma"), members.alias("mb")
    within = (ma.join(mb, on="rep_id")
              .filter(F.col("ma.doc_id") < F.col("mb.doc_id")))
    if new_ids is not None:
        within = within.filter(F.col("ma.is_new") | F.col("mb.is_new"))
    within = within.select(F.col("ma.doc_id").alias("doc_a"),
                           F.col("mb.doc_id").alias("doc_b"),
                           F.lit(1.0).alias("jaccard"))
    mem_a_cols = [F.col("rep_id").alias("doc_a"),
                  F.col("doc_id").alias("mem_a")]
    mem_b_cols = [F.col("rep_id").alias("doc_b"),
                  F.col("doc_id").alias("mem_b")]
    if new_ids is not None:
        mem_a_cols.append(F.col("is_new").alias("_new_a"))
        mem_b_cols.append(F.col("is_new").alias("_new_b"))
    cross = (rep_pairs
             .join(members.select(*mem_a_cols), on="doc_a")
             .join(members.select(*mem_b_cols), on="doc_b"))
    if new_ids is not None:
        # member-level exactness: a new-group candidate still expands
        # to some old-old member pairs — keep only new-touching ones
        cross = cross.filter(F.col("_new_a") | F.col("_new_b"))
    cross = cross.select(F.least("mem_a", "mem_b").alias("doc_a"),
                         F.greatest("mem_a", "mem_b").alias("doc_b"),
                         "jaccard")
    return within.unionByName(cross)


def _hs_col() -> F.Column:
    """Word-hash array of the `ws` column: each word hashed ONCE;
    the n permutations derive from the 8-byte long (standard MinHash
    practice — n× fewer string hashes)."""
    return F.expr("transform(ws, w -> xxhash64(w))")


def _sig_col(n_hashes: int) -> F.Column:
    """MinHash signature from the precomputed `hs` word-hash column —
    THE single signature derivation (minhash_lsh_pairs, the state
    writer, and the stored-incremental path all call this), so stored
    and fresh signatures can never drift apart."""
    return F.expr(
        f"transform(sequence(0, {n_hashes - 1}), "
        f"j -> array_min(transform(hs, h -> xxhash64(h, j))))")


def _band_col(n_hashes: int, rows_per_band: int,
              n_bands: int) -> F.Column:
    """Banded slice hashes of a `sig` column (shared by fresh and
    stored paths — bands are a cheap pure function of the signature,
    so the state table stores only `sig`)."""
    return F.array(*[
        F.struct(F.lit(b).alias("band_id"),
                 F.xxhash64(*[F.expr(f"sig[{b * rows_per_band + r}]")
                              for r in range(rows_per_band)])
                 .alias("band_hash"))
        for b in range(n_bands)])


def minhash_state(docs: DataFrame, text_col: str = "text",
                  n_hashes: int = 32) -> DataFrame:
    """The PERSISTED near-dup corpus state — (doc_id, fp1, fp2, sig,
    ws), one row per doc; `sig`/`ws` non-null only on each exact-dup
    group's representative (min doc_id), so the store carries ONE
    signature + word set per distinct word set, not per doc. Written
    into the workdir at ingest (write_minhash_state) and read back by
    minhash_lsh_pairs_stored, which then computes signatures for the
    NEW batch only — the stored-signature seam minhash_lsh_pairs'
    docstring names. n_hashes must match between writer and reader
    (the signature length is the contract)."""
    wsd = (docs.select("doc_id",
                       F.array_sort(_word_set(text_col)).alias("ws"))
           .filter(F.col("ws").isNotNull())
           .withColumn("fp1", F.xxhash64("ws"))
           .withColumn("fp2", F.xxhash64(F.lit(0x9E37), "ws")))
    # sig computed on the rep rows only (the O(distinct) heavy tier)
    reps = (wsd.groupBy("fp1", "fp2")
            .agg(F.min("doc_id").alias("rep_id"),
                 F.expr("min_by(ws, doc_id)").alias("ws"))
            .withColumn("hs", _hs_col())
            .withColumn("sig", _sig_col(n_hashes))
            .select("fp1", "fp2", "rep_id", "sig", "ws"))
    return (wsd.select("doc_id", "fp1", "fp2")
            .join(reps, on=["fp1", "fp2"], how="left")
            .select("doc_id", "fp1", "fp2",
                    F.when(F.col("doc_id") == F.col("rep_id"),
                           F.col("sig")).alias("sig"),
                    F.when(F.col("doc_id") == F.col("rep_id"),
                           F.col("ws")).alias("ws")))


def write_minhash_state(docs: DataFrame, path: str,
                        text_col: str = "text",
                        n_hashes: int = 32) -> None:
    """Materialize the near-dup state table at ingest (parquet,
    append): batch 1 writes the corpus state, every later batch
    appends the delta minhash_lsh_pairs_stored returns."""
    minhash_state(docs, text_col, n_hashes).write.mode(
        "append").parquet(path)


def minhash_lsh_pairs_stored(new_docs: DataFrame, state: DataFrame,
                             text_col: str = "text",
                             n_hashes: int = 32,
                             n_bands: int | None = None,
                             threshold: float = 0.5
                             ) -> tuple[DataFrame, DataFrame]:
    """Incremental MinHash-LSH against a PERSISTED corpus: exactly
    `minhash_lsh_pairs(old ∪ new, new_ids=new)` (same seeds, same
    banding, same 3σ prefilter, same exact-Jaccard verify) — but the
    old side comes entirely from the stored state, so the batch never
    touches old TEXT and the expensive tiers (tokenize, word-hash,
    signature) run on the NEW docs only:

    - new docs' word sets/fingerprints: O(batch) heavy work;
    - signatures: computed ONLY for word sets the store has never
      seen (anti-join on the group fingerprint);
    - banding of stored groups: a narrow scan of stored `sig` longs
      (16 xxhash64 per group — the unavoidable O(store) probe, no
      shuffle of the store: the band join's other side is the new
      batch);
    - candidate pruning, prefilter, verify: new-touching pairs only.

    Returns (pairs, delta_state). `pairs` is the new-touching pair
    set; `delta_state` is the new docs' state rows (sig/ws on new
    groups' reps only) — append it to the store
    (write_minhash_state's layout) to make the NEXT batch
    incremental too. Assumes batch doc_ids are disjoint from stored
    ones (the ingest invariant). Exactness vs the one-shot op is
    pinned by tests/test_ops.py::
    test_minhash_stored_state_equals_full_restricted."""
    if n_bands is None:
        rows_per_band, n_bands = _banding_for(n_hashes, threshold)
    else:
        rows_per_band = n_hashes // n_bands
    new_wsd = (new_docs
               .select("doc_id",
                       F.array_sort(_word_set(text_col)).alias("ws"))
               .filter(F.col("ws").isNotNull())
               .withColumn("fp1", F.xxhash64("ws"))
               .withColumn("fp2", F.xxhash64(F.lit(0x9E37), "ws"))
               .localCheckpoint())
    old_members = state.select("doc_id", "fp1", "fp2")
    old_sigs = (state.filter(F.col("sig").isNotNull())
                .select("fp1", "fp2", "sig", "ws"))
    # groups born in this batch: never seen by the store → the ONLY
    # signature computation of the run
    new_group_reps = (new_wsd.groupBy("fp1", "fp2")
                      .agg(F.min("doc_id").alias("rep_id"),
                           F.expr("min_by(ws, doc_id)").alias("ws"))
                      .join(old_sigs.select("fp1", "fp2"),
                            on=["fp1", "fp2"], how="left_anti")
                      .withColumn("hs", _hs_col())
                      .withColumn("sig", _sig_col(n_hashes))
                      .drop("hs"))
    group_sigs = old_sigs.unionByName(
        new_group_reps.select("fp1", "fp2", "sig", "ws"))
    banded = (group_sigs
              .withColumn("band",
                          F.explode(_band_col(n_hashes, rows_per_band,
                                              n_bands)))
              .select(F.struct("fp1", "fp2").alias("g"),
                      F.col("band.band_id").alias("band_id"),
                      F.col("band.band_hash").alias("band_hash")))
    g_new = (new_wsd.select(F.struct("fp1", "fp2").alias("g"))
             .distinct())
    # one join side is new-group bands only — old-old pairs can never
    # form; both-new pairs arrive twice and canonicalize away
    a = banded.join(g_new, on="g").alias("a")
    b = banded.alias("b")
    cand = (a.join(b, on=["band_id", "band_hash"])
            .filter(F.col("a.g") != F.col("b.g"))
            .select(F.least(F.col("a.g"), F.col("b.g")).alias("g1"),
                    F.greatest(F.col("a.g"), F.col("b.g")).alias("g2"))
            .dropDuplicates(["g1", "g2"]))
    gs = group_sigs.select(F.struct("fp1", "fp2").alias("g"),
                           "sig", "ws")
    est = F.expr(
        f"size(filter(zip_with(sig_a, sig_b, (x, y) -> x = y), v -> v))"
        f" / cast({n_hashes} as double)")
    margin = 3.0 * (threshold * (1.0 - threshold) / n_hashes) ** 0.5
    jac = F.size(F.array_intersect("ws_a", "ws_b")) / \
        F.size(F.array_union("ws_a", "ws_b"))
    gpairs = (cand
              .join(gs.select(F.col("g").alias("g1"),
                              F.col("sig").alias("sig_a"),
                              F.col("ws").alias("ws_a")), on="g1")
              .join(gs.select(F.col("g").alias("g2"),
                              F.col("sig").alias("sig_b"),
                              F.col("ws").alias("ws_b")), on="g2")
              .filter(est >= threshold - margin)
              .withColumn("jaccard", F.round(jac, 6))
              .filter(F.col("jaccard") >= threshold)
              .select("g1", "g2", "jaccard"))
    members = (old_members.withColumn("is_new", F.lit(False))
               .unionByName(new_wsd.select("doc_id", "fp1", "fp2")
                            .withColumn("is_new", F.lit(True)))
               .select(F.struct("fp1", "fp2").alias("g"),
                       "doc_id", "is_new"))
    ma, mb = members.alias("ma"), members.alias("mb")
    within = (ma.join(mb, on="g")
              .filter((F.col("ma.doc_id") < F.col("mb.doc_id"))
                      & (F.col("ma.is_new") | F.col("mb.is_new")))
              .select(F.col("ma.doc_id").alias("doc_a"),
                      F.col("mb.doc_id").alias("doc_b"),
                      F.lit(1.0).alias("jaccard")))
    cross = (gpairs
             .join(members.select(F.col("g").alias("g1"),
                                  F.col("doc_id").alias("mem_a"),
                                  F.col("is_new").alias("_new_a")),
                   on="g1")
             .join(members.select(F.col("g").alias("g2"),
                                  F.col("doc_id").alias("mem_b"),
                                  F.col("is_new").alias("_new_b")),
                   on="g2")
             .filter(F.col("_new_a") | F.col("_new_b"))
             .select(F.least("mem_a", "mem_b").alias("doc_a"),
                     F.greatest("mem_a", "mem_b").alias("doc_b"),
                     "jaccard"))
    pairs = within.unionByName(cross)
    delta = (new_wsd.select("doc_id", "fp1", "fp2")
             .join(new_group_reps.select("fp1", "fp2", "rep_id",
                                         "sig", "ws"),
                   on=["fp1", "fp2"], how="left")
             .select("doc_id", "fp1", "fp2",
                     F.when(F.col("doc_id") == F.col("rep_id"),
                            F.col("sig")).alias("sig"),
                     F.when(F.col("doc_id") == F.col("rep_id"),
                            F.col("ws")).alias("ws")))
    return pairs, delta


def winnow_near_pairs(docs: DataFrame, text_col: str = "text",
                      min_shared: int = 5,
                      min_overlap: float = 0.0) -> DataFrame:
    """Near-dup pairs by shared winnowing fingerprints (the MOSS
    shape, Schleimer/Wilkerson/Aiken SIGMOD'03): docs sharing ≥
    `min_shared` window-minimum rolling hashes — and optionally ≥
    `min_overlap` of the smaller doc's fingerprint set — are
    candidates for copied/near-identical content. Catches long
    verbatim SPANS (char-level) that word-set Jaccard dilutes.

    Shape: ONE self-equi-join on the fingerprint value (near-uniform
    64-bit-ish keys — no hot-word skew), count shared per pair, join
    tiny per-doc fingerprint counts for the overlap ratio. Unlike the
    MinHash/SimHash paths, the base-31 polynomial fingerprints are
    engine-portable, so this near-dup operator has a FULL value
    oracle, not just a containment gate."""
    from guackg.ops.textstats import winnow_fingerprints
    fp = winnow_fingerprints(docs, text_col)
    counts = fp.groupBy("doc_id").agg(F.count("*").alias("n_fp"))
    a, b = fp.alias("a"), fp.alias("b")
    shared = (a.join(b, on="fingerprint")
              .filter(F.col("a.doc_id") < F.col("b.doc_id"))
              .groupBy(F.col("a.doc_id").alias("doc_a"),
                       F.col("b.doc_id").alias("doc_b"))
              .agg(F.count("*").alias("n_shared"))
              .filter(F.col("n_shared") >= min_shared))
    out = (shared
           .join(counts.select(F.col("doc_id").alias("doc_a"),
                               F.col("n_fp").alias("n_a")), on="doc_a")
           .join(counts.select(F.col("doc_id").alias("doc_b"),
                               F.col("n_fp").alias("n_b")), on="doc_b")
           .withColumn("overlap",
                       F.round(F.col("n_shared") /
                               F.least("n_a", "n_b"), 6)))
    if min_overlap > 0.0:
        out = out.filter(F.col("overlap") >= min_overlap)
    return out.select("doc_a", "doc_b", "n_shared", "overlap")


_SIMHASH_BITS = 63  # bigint minus the sign bit — the value stays
# non-negative so shiftrightunsigned banding and bit_count(xor)
# hamming need no sign-bit special cases anywhere downstream


def simhash(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """63-bit SimHash over word sets, pure SQL: for each bit, sum ±1
    contributions of xxhash64(word) bit tests; bit set iff sum > 0.
    Hamming-close simhashes ⇒ near-dup docs (banding over chunks gives
    the LSH variant at scale). 63 bits, not 64, deliberately (see
    _SIMHASH_BITS) — column name 'simhash64' is the storage type, not
    the bit width."""
    # NULL text ⇒ NULL word set ⇒ every bit aggregate NULL ⇒ simhash
    # 0 — which would collide ALL NULL docs into one fabricated
    # hamming-0 duplicate cluster (the same fabrication the MinHash
    # path filters before its fingerprint groupBy). NULL docs carry
    # no content signal: quarantine them from near-dup entirely.
    base = (docs.select("doc_id", _word_set(text_col).alias("ws"))
            .filter(F.col("ws").isNotNull()))
    # bit_count-style: aggregate(transform(...)) per bit, fold to a bigint
    bit_exprs = []
    for i in range(_SIMHASH_BITS):
        bit_exprs.append(
            f"(case when aggregate(transform(ws, w -> "
            f"case when (xxhash64(w) & {1 << i}L) != 0 "
            f"then 1 else -1 end), 0, (acc, x) -> acc + x) > 0 "
            f"then 1 else 0 end)")
    # fold bits into one bigint: sum(bit_i * 2^i) via shiftleft
    fold = " + ".join(
        f"shiftleft(cast({e} as bigint), {i})" for i, e in enumerate(bit_exprs))
    return base.select("doc_id", F.expr(fold).alias("simhash64"))


def simhash_near_pairs(docs: DataFrame, text_col: str = "text",
                       max_hamming: int = 8) -> DataFrame:
    """Near-dup pairs by SimHash: band the 63-bit value into
    `max_hamming + 1` chunks — pigeonhole guarantees that any pair
    within the queried hamming radius shares at least one FULL chunk
    (max_hamming differing bits cannot touch all max_hamming+1
    chunks), so recall within the radius is exactly 1.0 — then verify
    true hamming with bit_count(xor).

    Shape: ONE self-equi-join on exploded (chunk_id, chunk_value)
    rows — shuffle keys are the chunk values (near-uniform), the join
    carries only (doc_id, simhash64)."""
    n_chunks = max_hamming + 1
    bounds = [i * _SIMHASH_BITS // n_chunks for i in range(n_chunks + 1)]
    sh = simhash(docs, text_col)
    chunks = F.array(*[
        F.struct(
            F.lit(i).alias("chunk_id"),
            (F.shiftrightunsigned(F.col("simhash64"), bounds[i])
             .bitwiseAND(F.lit((1 << (bounds[i + 1] - bounds[i])) - 1)
                         .cast("bigint"))).alias("chunk_val"))
        for i in range(n_chunks)])
    banded = (sh.withColumn("_c", F.explode(chunks))
              .select("doc_id", "simhash64",
                      F.col("_c.chunk_id").alias("chunk_id"),
                      F.col("_c.chunk_val").alias("chunk_val")))
    a, b = banded.alias("a"), banded.alias("b")
    pairs = (a.join(b, on=["chunk_id", "chunk_val"])
             .filter(F.col("a.doc_id") < F.col("b.doc_id"))
             .select(F.col("a.doc_id").alias("doc_a"),
                     F.col("b.doc_id").alias("doc_b"),
                     F.col("a.simhash64").alias("sh_a"),
                     F.col("b.simhash64").alias("sh_b"))
             .dropDuplicates(["doc_a", "doc_b"]))
    hamming = F.bit_count(F.col("sh_a").bitwiseXOR(F.col("sh_b")))
    return (pairs.withColumn("hamming", hamming)
            .filter(F.col("hamming") <= max_hamming)
            .select("doc_a", "doc_b", "hamming"))


def near_dup_collapse(docs: DataFrame, pairs: DataFrame,
                      doc_col: str = "doc_id",
                      pair_a: str = "doc_a",
                      pair_b: str = "doc_b") -> DataFrame:
    """Pairs → clusters → keep-one-per-cluster: the step a training-data
    dedup pipeline actually ships. Near-dup similarity is not
    transitive, so pairwise output alone over-deletes (dropping the
    higher id of every pair can empty a chain A-B-C); the standard
    resolution (and the reference's, where every equivalent surface
    lands on one interned node — inmem backend.go:73-106) is connected
    components over the pair graph, keeping one canonical document per
    component.

    Returns one row per input doc: (doc_id, cluster_id, keep) where
    cluster_id is the component's minimum doc_id and keep marks its
    deterministic representative (singletons keep themselves).

    Scale shape: the heavy lifting is `connected_components`
    (large-star/small-star iterations above the driver bound); the
    rest is two key-equi joins and one agg on O(docs) rows of 2-3
    scalars. Feed it ANY pair source — MinHash-LSH, SimHash, winnow,
    embedding near-dup — they all emit (doc_a, doc_b, ...)."""
    from guackg.cc import canonicalize_keys, connected_components

    edges = pairs.select(F.col(pair_a).cast("string").alias("key_a"),
                         F.col(pair_b).cast("string").alias("key_b"))
    comps = connected_components(edges)
    m = canonicalize_keys(
        docs.select(F.col(doc_col).alias("doc_id"),
                    F.col(doc_col).cast("string").alias("ckey")),
        "ckey", comps)
    reps = m.groupBy("ckey").agg(F.min("doc_id").alias("cluster_id"))
    return (m.join(reps, on="ckey")
            .select("doc_id", "cluster_id",
                    (F.col("doc_id") == F.col("cluster_id")).alias("keep")))


def paragraph_dedup(docs: DataFrame, text_col: str = "text",
                    ) -> DataFrame:
    """Paragraph-level deduplication (the CCNet/C4 boilerplate-removal
    shape, public practice): every line-delimited paragraph keeps only
    its GLOBALLY FIRST occurrence — the smallest (doc_id, position) —
    and later copies are dropped from their documents; the surviving
    paragraphs are re-joined in original order.

    Output: one row per input doc —
    (doc_id, text_dedup, n_pars, n_dropped). Empty/whitespace-only
    paragraphs carry no content and are dropped from the
    reconstruction (n_pars counts non-empty paragraphs only); NULL
    text → (NULL, 0, 0). Paragraph identity is md5 of the trimmed
    lowercased paragraph — engine-portable, so the whole op has an
    exact DuckDB oracle (tests/test_textclean.py).

    Determinism: the winner per paragraph is min(struct(doc_id, pos))
    — a total order, so the kept set is a pure function of the corpus.

    Scale shape: the winner aggregation is an algebraic min — map-side
    combinable, so a boilerplate paragraph in 10^9 docs contributes
    one row per map partition, not 10^9 shuffle rows. The join of the
    paragraph stream back to the O(distinct) winner table is an
    equi-join on the paragraph hash; hot boilerplate keys skew its
    probe side, which AQE's skew-join split handles (the build side is
    one row per key, cheap to replicate). Reconstruction groups by
    doc_id — per-doc cardinality, no head-key skew."""
    pars = (docs
            .select("doc_id",
                    F.posexplode(F.split(F.col(text_col), r"\n"))
                    .alias("pos", "par"))
            .withColumn("par", F.trim(F.col("par")))
            .filter(F.col("par") != "")
            .withColumn("pkey", F.md5(F.lower(F.col("par")))))
    winners = (pars.groupBy("pkey")
               .agg(F.min(F.struct("doc_id", "pos")).alias("w")))
    kept = (pars.join(winners, on="pkey")
            .filter((F.col("doc_id") == F.col("w.doc_id"))
                    & (F.col("pos") == F.col("w.pos"))))
    rebuilt = (kept.groupBy("doc_id")
               .agg(F.array_join(
                       F.transform(
                           F.array_sort(F.collect_list(
                               F.struct("pos", "par"))),
                           lambda s: s["par"]),
                       "\n").alias("text_dedup"),
                    F.count("*").alias("n_kept")))
    totals = pars.groupBy("doc_id").agg(F.count("*").alias("n_pars"))
    return (docs.select("doc_id", F.col(text_col).isNull().alias("_tnull"))
            .join(totals, on="doc_id", how="left")
            .join(rebuilt.select("doc_id", "text_dedup", "n_kept"),
                  on="doc_id", how="left")
            .select(
                "doc_id",
                # NULL in → NULL out; all-paragraphs-dropped → ''
                F.when(F.col("_tnull"), F.lit(None).cast("string"))
                .otherwise(F.coalesce("text_dedup", F.lit("")))
                .alias("text_dedup"),
                F.coalesce("n_pars", F.lit(0)).alias("n_pars"),
                (F.coalesce("n_pars", F.lit(0))
                 - F.coalesce("n_kept", F.lit(0))).alias("n_dropped")))


def hash_sample(docs: DataFrame, rate: float,
                key_col: str = "doc_id") -> DataFrame:
    """Deterministic corpus sampling: keep the rows whose md5(key)
    falls below the rate-scaled threshold in the 128-bit hash space —
    the reproducible subset selection a training pipeline uses for
    eval splits and ablations (same key set in ⇒ same sample out, on
    any engine: the md5-hex string compare is binary-lexicographic in
    Spark and DuckDB alike — exact parity in tests/test_textclean.py).

    A pure narrow filter (no shuffle, no RNG state); sampled fraction
    converges to `rate` by md5 uniformity. rate ≤ 0 keeps nothing,
    rate ≥ 1 everything; NULL keys are never sampled (md5(NULL) is
    NULL — quarantine convention)."""
    if rate <= 0:
        return docs.filter(F.lit(False))
    if rate >= 1:
        return docs
    # 32-hex-digit threshold = floor(rate · 16^32), zero-padded so the
    # string compare equals the numeric compare
    threshold = format(int(rate * (1 << 128)), "032x")
    return docs.filter(
        F.md5(F.col(key_col).cast("string")) < F.lit(threshold))


def stratified_hash_sample(docs: DataFrame, rates: dict[str, float],
                           strata_col: str, default_rate: float = 0.0,
                           key_col: str = "doc_id") -> DataFrame:
    """Deterministic per-stratum sampling: hash_sample with a
    different rate per value of `strata_col` (the data-mixing /
    up-down-sampling step of corpus assembly — e.g. per-language or
    per-domain rates). Strata not in `rates` use `default_rate`.
    Same engine-portable md5-threshold rule as hash_sample, so the
    kept row set is a pure function of (key, stratum, rates) — unlike
    DataFrame.sampleBy, which draws from RNG state and is neither
    reproducible across engines nor stable under repartitioning.

    A pure narrow filter: the per-stratum threshold is a small
    literal CASE map (O(|rates|) branches, broadcast in the plan —
    fine for the ≤10^3 strata of lang/domain-tier mixing; for 10^6+
    strata join a rates table instead). A NULL stratum is "not in the
    rates map" and samples at `default_rate` (sampleBy's
    not-in-fractions rule, generalized); NULL keys are never sampled
    (md5(NULL) is NULL — quarantine convention). Exact DuckDB parity
    in tests/test_textclean.py."""
    def _thr(rate: float) -> str:
        if rate >= 1:
            return "g"  # lexicographically above every 32-hex digest
        return format(int(max(rate, 0.0) * (1 << 128)), "032x")

    thr = F.lit(_thr(default_rate))
    for val, rate in sorted(rates.items()):
        thr = F.when(F.col(strata_col) == F.lit(val),
                     F.lit(_thr(rate))).otherwise(thr)
    return docs.filter(F.md5(F.col(key_col).cast("string")) < thr)
