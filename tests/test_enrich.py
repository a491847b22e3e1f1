"""O(delta) enrichment re-link (guackg/enrich.py) — the §3.3
certifier-loop analog patched in place. The strongest possible oracle:
after `apply_promotions`, the workdir's graph tables must EQUAL a
from-scratch pipeline run with the enriched dictionary, row for row —
including retraction of the stale `ent:guac/…` fallback identities
(round-3 advice #3) and exact n_evidence/match_level on rekeyed
edges."""

import os

import pytest
from pyspark.sql import functions as F

from guackg import io as gio
from guackg.enrich import apply_promotions
from guackg.pipeline import KGPipeline


def _graph_sets(spark, wd):
    nodes = {tuple(r) for r in
             gio.read_table(spark, os.path.join(wd, "nodes"))
             .select("canonical_key", "kind").collect()}
    edges = {tuple(r) for r in
             gio.read_table(spark, os.path.join(wd, "edges"))
             .select("subj_key", "pred", "obj_key", "n_evidence",
                     "first_seen", "last_seen", "match_level").collect()}
    return nodes, edges


def test_apply_promotions_delta_equals_full(spark, corpus, pages_df,
                                            alias_df, assertions_df,
                                            tmp_path):
    # build with a REDUCED dictionary: 8 alias surfaces that actually
    # OCCUR in the corpus withheld, so their mentions fall back to
    # synthesized ent:guac/ identities
    from guackg.vocab import normalize_surface
    g = corpus["golden_triples"]
    occ = {normalize_surface(s)
           for s in set(g["subj_surface"]) | set(g["obj_surface"])}
    ad = corpus["alias_dict"]
    # withhold EVERY surface of 4 occurring entities — leaving a
    # sibling alias in place would let the LSH tier resolve the
    # mention (correctly!) and no fallback identity would appear
    ents = sorted(set(ad[ad["surface"].isin(occ)]["canonical_key"]))[:4]
    removed = sorted(ad[ad["canonical_key"].isin(ents)]["surface"])
    assert removed
    reduced = alias_df.filter(~F.col("surface").isin(removed))
    wd = str(tmp_path / "delta")
    pipe = KGPipeline(spark, wd)
    out1 = pipe.run(pages_df, reduced, assertions_df,
                    input_fingerprint="enr")

    # promotion batch: the withheld entries (surface → REAL canonical
    # key: exercises remap + retraction) plus the top unresolved
    # candidates under their own synthesized keys (same-key tier
    # upgrade: exercises match_level-only patching)
    cand = out1["identifier_candidates"]
    upgraded = (cand.filter(~F.col("norm").isin(removed))
                .orderBy(F.desc("n_mentions"), "norm").limit(5)
                .select(F.col("norm").alias("surface"),
                        F.col("suggested_key").alias("canonical_key"),
                        F.lit("candidate").alias("kind")))
    # promote only the withheld surfaces that actually FELL BACK (an
    # LSH hit on a near-identical cross-entity alias is possible and
    # is not a candidate — production promotions come from the
    # candidate queue, which is fallback-only by construction)
    fellback = {r["norm"] for r in
                gio.read_table(spark, os.path.join(wd, "link"))
                .filter(F.col("method") == "fallback")
                .select("norm").collect()}
    real_promos = [s for s in removed if s in fellback]
    assert real_promos, "no withheld surface fell back"
    promoted = alias_df.filter(F.col("surface").isin(real_promos)) \
        .unionByName(upgraded).localCheckpoint()
    enriched = reduced.unionByName(promoted)

    stats = apply_promotions(spark, wd, promoted, enriched,
                             assertions=assertions_df,
                             input_fingerprint="enr")
    assert stats["changed_links"] >= 1
    assert stats["remapped_keys"] >= 1

    # the oracle: a from-scratch run with the enriched dictionary
    wf = str(tmp_path / "full")
    KGPipeline(spark, wf).run(pages_df, enriched, assertions_df,
                              input_fingerprint="enr")
    dn, de = _graph_sets(spark, wd)
    fn, fe = _graph_sets(spark, wf)

    # the delta rule is EXACT for the dict tier; the one documented
    # deviation (guackg/enrich.py) is new FUZZY matches the grown
    # dictionary enables for other unresolved norms — those are
    # deferred to the next full ingest. So: links may differ only on
    # norms whose method changed to/from 'lsh', never on a promoted
    # surface, and every graph diff must trace to such a norm's keys.
    def _links(w):
        return {r["norm"]: (r["canonical_key"], r["method"]) for r in
                gio.read_table(spark, os.path.join(w, "link")).collect()}
    dl, fl = _links(wd), _links(wf)
    promo_surfaces = {r["surface"] for r in promoted.collect()}
    diff_norms = {n for n in set(dl) | set(fl) if dl.get(n) != fl.get(n)}
    assert not diff_norms & promo_surfaces, \
        "a promoted surface resolved differently in the delta path"
    for n in diff_norms:
        assert "lsh" in (dl.get(n, (None, None))[1],
                         fl.get(n, (None, None))[1]), \
            f"non-fuzzy link divergence on {n!r}: {dl.get(n)} vs {fl.get(n)}"
    allowed = {k for n in diff_norms
               for k in (dl.get(n, (None,))[0], fl.get(n, (None,))[0],
                         f"ent:guac/{n}", f"sfc:{n}") if k}
    node_diff = {k for k, _ in dn ^ fn}
    assert node_diff <= allowed, (
        f"node diff beyond fuzzy cross-talk: {sorted(node_diff - allowed)[:5]}")
    edge_diff = de ^ fe
    assert all(e[0] in allowed or e[2] in allowed for e in edge_diff), (
        f"edge diff beyond fuzzy cross-talk: "
        f"{[e for e in edge_diff if e[0] not in allowed and e[2] not in allowed][:5]}")

    # retraction explicit (advice #3): no stale fallback identity for
    # a promoted-to-real-key surface survives anywhere
    stale = {f"ent:guac/{s}" for s in removed}
    assert not {k for k, _ in dn} & stale
    assert not {e[0] for e in de} & stale and \
        not {e[2] for e in de} & stale

    # re-entrancy: a full pipeline invocation with the enriched dict
    # now resumes EVERY stage from the delta-stamped lineage
    pipe2 = KGPipeline(spark, wd)
    out2 = pipe2.run(pages_df, enriched, assertions_df,
                     input_fingerprint="enr")
    assert pipe2.stage_secs == {}, \
        f"stages recomputed after delta: {pipe2.stage_secs}"
    assert out2["edges"].count() == len(de)

    # guard: patching a workdir built from a different corpus refuses
    with pytest.raises(ValueError, match="full re-ingest"):
        apply_promotions(spark, wd, promoted, enriched,
                         assertions=assertions_df,
                         input_fingerprint="other-corpus")


def test_apply_promotions_crash_resume(spark, corpus, pages_df, alias_df,
                                       assertions_df, tmp_path,
                                       monkeypatch):
    """Mid-patch crash recovery: apply_promotions journals the delta
    (changed links + key remap) BEFORE mutating any table, so a re-run
    after a crash — when the links table already carries the promoted
    rows and relink_fallbacks would find nothing — resumes from the
    journal and completes the graph patch instead of stamping lineage
    over a stale graph."""
    from guackg.vocab import normalize_surface
    g = corpus["golden_triples"]
    occ = {normalize_surface(s)
           for s in set(g["subj_surface"]) | set(g["obj_surface"])}
    ad = corpus["alias_dict"]
    ents = sorted(set(ad[ad["surface"].isin(occ)]["canonical_key"]))[:2]
    removed = sorted(ad[ad["canonical_key"].isin(ents)]["surface"])
    reduced = alias_df.filter(~F.col("surface").isin(removed))

    wds = [str(tmp_path / "clean"), str(tmp_path / "crashy")]
    for wd in wds:
        KGPipeline(spark, wd).run(pages_df, reduced, assertions_df,
                                  input_fingerprint="enr")
    fellback = {r["norm"] for r in
                gio.read_table(spark, os.path.join(wds[0], "link"))
                .filter(F.col("method") == "fallback")
                .select("norm").collect()}
    real_promos = [s for s in removed if s in fellback]
    assert real_promos
    promoted = alias_df.filter(F.col("surface").isin(real_promos)) \
        .localCheckpoint()
    enriched = reduced.unionByName(promoted)

    apply_promotions(spark, wds[0], promoted, enriched,
                     assertions=assertions_df, input_fingerprint="enr")

    real_merge = gio.merge_upsert
    state = {"crashed": False}

    def flaky(spark_, df, path, **kw):
        if path.endswith("edges") and not state["crashed"]:
            state["crashed"] = True
            raise RuntimeError("synthetic crash at the edges merge")
        return real_merge(spark_, df, path, **kw)

    monkeypatch.setattr(gio, "merge_upsert", flaky)
    with pytest.raises(RuntimeError, match="synthetic crash"):
        apply_promotions(spark, wds[1], promoted, enriched,
                         assertions=assertions_df,
                         input_fingerprint="enr")
    assert os.path.exists(os.path.join(wds[1], "_enrich_pending")), \
        "no journal left behind by the crashed patch"
    # resume: the links table already carries the promoted rows, so
    # only the journal can drive the remaining patch
    stats = apply_promotions(spark, wds[1], promoted, enriched,
                             assertions=assertions_df,
                             input_fingerprint="enr")
    assert stats.get("resumed_from_journal") is True
    assert not os.path.exists(os.path.join(wds[1], "_enrich_pending"))

    dn, de = _graph_sets(spark, wds[0])
    cn, ce = _graph_sets(spark, wds[1])
    assert dn == cn and de == ce
    stale = {f"ent:guac/{s}" for s in real_promos}
    assert not {k for k, _ in cn} & stale


def test_apply_promotions_second_round(spark, corpus, pages_df, alias_df,
                                       assertions_df, tmp_path):
    """Two promotion cycles back-to-back: round 2 computes its
    affected set from the evidence table round 1 REWROTE
    (refresh_evidence) — collisions with round-1 targets must still
    recount exactly. Also: replaying an already-applied batch is a
    no-op that keeps lineage stamped."""
    from guackg.vocab import normalize_surface
    g = corpus["golden_triples"]
    occ = {normalize_surface(s)
           for s in set(g["subj_surface"]) | set(g["obj_surface"])}
    ad = corpus["alias_dict"]
    ents = sorted(set(ad[ad["surface"].isin(occ)]["canonical_key"]))[:4]
    removed = sorted(ad[ad["canonical_key"].isin(ents)]["surface"])
    reduced = alias_df.filter(~F.col("surface").isin(removed))
    wd = str(tmp_path / "two_rounds")
    KGPipeline(spark, wd).run(pages_df, reduced, assertions_df,
                              input_fingerprint="enr")
    fellback = sorted(
        r["norm"] for r in
        gio.read_table(spark, os.path.join(wd, "link"))
        .filter(F.col("method") == "fallback").select("norm").collect()
        if r["norm"] in set(removed))
    assert len(fellback) >= 2, "need two promotable surfaces"
    first, second = fellback[: len(fellback) // 2], \
        fellback[len(fellback) // 2:]

    promo1 = alias_df.filter(F.col("surface").isin(first)).localCheckpoint()
    dict1 = reduced.unionByName(promo1)
    apply_promotions(spark, wd, promo1, dict1,
                     assertions=assertions_df, input_fingerprint="enr")
    # replay of the same batch: nothing to change, lineage stays
    replay = apply_promotions(spark, wd, promo1, dict1,
                              assertions=assertions_df,
                              input_fingerprint="enr")
    assert replay["changed_links"] == 0

    promo2 = alias_df.filter(F.col("surface").isin(second)).localCheckpoint()
    dict2 = dict1.unionByName(promo2)
    stats2 = apply_promotions(spark, wd, promo2, dict2,
                              assertions=assertions_df,
                              input_fingerprint="enr")
    assert stats2["changed_links"] >= 1

    # oracle: from-scratch with the doubly-enriched dictionary,
    # modulo the documented deferred-fuzzy deviation
    wf = str(tmp_path / "full2")
    KGPipeline(spark, wf).run(pages_df, dict2, assertions_df,
                              input_fingerprint="enr")

    def _links(w):
        return {r["norm"]: (r["canonical_key"], r["method"]) for r in
                gio.read_table(spark, os.path.join(w, "link")).collect()}
    dl, fl = _links(wd), _links(wf)
    diff_norms = {n for n in set(dl) | set(fl) if dl.get(n) != fl.get(n)}
    assert not diff_norms & set(first + second)
    allowed = {k for n in diff_norms
               for k in (dl.get(n, (None,))[0], fl.get(n, (None,))[0],
                         f"ent:guac/{n}", f"sfc:{n}") if k}
    # The deferred-fuzzy norm's LSH resolution (full run only) can add
    # an equivalence edge that changes its whole component's canonical
    # representative — close `allowed` over both runs' canonicalize
    # components so rep-flip fallout is tolerated too.
    cms = [{(r["member_key"], r["canon_key"]) for r in
            gio.read_table(spark, os.path.join(w, "canonicalize"))
            .collect()} for w in (wd, wf)]
    grew = True
    while grew:
        grew = False
        for cm in cms:
            canons = {c for m, c in cm if m in allowed or c in allowed}
            members = {m for m, c in cm if c in canons}
            if not (canons | members) <= allowed:
                allowed |= canons | members
                grew = True
    dn, de = _graph_sets(spark, wd)
    fn, fe = _graph_sets(spark, wf)
    assert {k for k, _ in dn ^ fn} <= allowed
    assert all(e[0] in allowed or e[2] in allowed for e in de ^ fe)
    stale = {f"ent:guac/{s}" for s in first + second}
    assert not {k for k, _ in dn} & stale


def test_promotion_splits_assertion_merged_fallback_entity(
        spark, corpus, pages_df, alias_df, tmp_path):
    """The old→new key remap is NOT functional: an assertion can join
    two fallback identities into ONE old component, and promoting both
    norms to DIFFERENT real identities in one batch SPLITS that
    entity. The touched-set must then carry BOTH new keys — deduping
    on the old key alone dropped one arbitrarily, silently losing its
    page-mention edges in the rebuilt graph."""
    from guackg.vocab import normalize_surface
    g = corpus["golden_triples"]
    occ = {normalize_surface(s)
           for s in set(g["subj_surface"]) | set(g["obj_surface"])}
    ad = corpus["alias_dict"]
    ents = sorted(set(ad[ad["surface"].isin(occ)]["canonical_key"]))[:2]
    assert len(ents) == 2
    removed = sorted(ad[ad["canonical_key"].isin(ents)]["surface"])
    reduced = alias_df.filter(~F.col("surface").isin(removed))

    wd = str(tmp_path / "split")
    out1 = KGPipeline(spark, wd).run(pages_df, reduced, None,
                                     input_fingerprint="split")
    fellback = {r["norm"] for r in out1["links"]
                .filter(F.col("method") == "fallback")
                .select("norm").collect()} \
        if "links" in out1 else \
        {r["norm"] for r in
         gio.read_table(spark, os.path.join(wd, "link"))
         .filter(F.col("method") == "fallback").select("norm").collect()}
    by_ent = {e: [s for s in ad[ad["canonical_key"] == e]["surface"]
                  if s in fellback] for e in ents}
    if not all(by_ent.values()):
        pytest.skip("fixture did not produce a fallback per entity")
    n1, n2 = by_ent[ents[0]][0], by_ent[ents[1]][0]

    # the assertion joins the two synthesized identities into ONE old
    # component — rebuild the workdir with it in the CC input
    asrt = spark.createDataFrame(
        [(f"ent:guac/{n1}", f"ent:guac/{n2}")],
        "key_a string, key_b string")
    wd = str(tmp_path / "split2")
    KGPipeline(spark, wd).run(pages_df, reduced, asrt,
                              input_fingerprint="split")

    promoted = alias_df.filter(F.col("surface").isin([n1, n2])) \
        .localCheckpoint()
    assert promoted.select("canonical_key").distinct().count() == 2
    enriched = reduced.unionByName(promoted)
    stats = apply_promotions(spark, wd, promoted, enriched,
                             assertions=asrt,
                             input_fingerprint="split")
    assert stats["changed_links"] == 2

    # oracle: a from-scratch run with the enriched dictionary — the
    # edges touching the two promoted identities must match exactly
    wf = str(tmp_path / "splitfull")
    KGPipeline(spark, wf).run(pages_df, enriched, asrt,
                              input_fingerprint="split")
    keys = {ents[0], ents[1]}

    def _touching(w):
        e = gio.read_table(spark, os.path.join(w, "edges"))
        return {tuple(r) for r in
                e.filter(F.col("subj_key").isin(list(keys))
                         | F.col("obj_key").isin(list(keys)))
                .select("subj_key", "pred", "obj_key", "n_evidence",
                        "match_level").collect()}
    de, fe = _touching(wd), _touching(wf)
    assert de == fe, (
        f"delta graph diverges on the split entities: "
        f"missing={sorted(fe - de)[:4]} extra={sorted(de - fe)[:4]}")
    # both promoted identities keep their page-mention edges
    for k in keys:
        assert any(e[1] == "mentions" and e[2] == k for e in de), \
            f"page-mention edges lost for {k}"
    # stale-identity parity with the from-scratch oracle: the
    # assertion itself still references the synthesized keys, so BOTH
    # runs keep the assertion-component's canon node (build_nodes
    # emits component canons); the delta must neither keep more nor
    # retract more than the full run does
    stale = {f"ent:guac/{n1}", f"ent:guac/{n2}"}

    def _nodes(w):
        return {r.canonical_key for r in
                gio.read_table(spark, os.path.join(w, "nodes"))
                .select("canonical_key").collect()}
    assert _nodes(wd) & stale == _nodes(wf) & stale


def test_apply_promotions_preserves_advisory_merges(spark, tmp_path):
    """The enrichment patch recomputes connected components — it must
    rebuild them over the SAME edge set the pipeline's canonicalize
    stage used, including parser-asserted advisory equality. Before
    the fix, a promotion pass silently split every advisory-merged
    component (the CC recompute unioned linker edges + caller
    assertions only)."""
    from datetime import datetime

    from guackg.pipeline import KGPipeline
    ts = datetime(2024, 1, 1)
    pages = [
        ("https://x.example.com/a", ts,
         b"<p>Zorblatt Industries acquired Widget X.</p>", None, "en"),
        ("https://x.example.com/b", ts,
         b"<p>Vexcorp Amalgamated acquired Widget Y.</p>", None, "en"),
        ("https://x.example.com/adv", ts,
         b"#KGADV v1\nequal: Zorblatt Industries == "
         b"Vexcorp Amalgamated\n", None, "en"),
    ]
    schema = ("url string, warc_ts timestamp, html binary, "
              "text string, lang string")
    alias = spark.createDataFrame(
        [("unrelated surface", "ent:guac/unrelated")],
        "surface string, canonical_key string")
    wd = str(tmp_path / "advwd")
    KGPipeline(spark, wd).run(spark.createDataFrame(pages, schema),
                              alias, input_fingerprint="adv-enrich")

    def merged(comps_rows):
        comp = {r.member_key: r.canon_key for r in comps_rows}
        z = comp.get("ent:guac/zorblatt industries",
                     "ent:guac/zorblatt industries")
        v = comp.get("ent:guac/vexcorp amalgamated",
                     "ent:guac/vexcorp amalgamated")
        return z == v

    comps = spark.read.parquet(f"{wd}/canonicalize").collect()
    assert merged(comps)
    # promote an UNRELATED fallback surface (widget x) — the patch
    # must not disturb the advisory-merged component
    promoted = spark.createDataFrame(
        [("widget x", "ent:thing/widget_x", "thing")],
        "surface string, canonical_key string, kind string")
    enriched = alias.unionByName(spark.createDataFrame(
        [("Widget X", "ent:thing/widget_x")],
        "surface string, canonical_key string"))
    stats = apply_promotions(spark, wd, promoted, enriched,
                             input_fingerprint="adv-enrich")
    assert stats["changed_links"] == 1
    comps2 = spark.read.parquet(f"{wd}/canonicalize").collect()
    assert merged(comps2)
