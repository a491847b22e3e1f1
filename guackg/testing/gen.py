"""Deterministic synthetic webtext corpus + golden fixtures (FIXTURES.md).

Mirrors the reference's golden-fixture strategy — embedded documents
with known expected predicate structs
(/root/reference/internal/testing/testdata/testdata.go:40-80) and e2e
ingest→diff vs expect*.json (internal/testing/e2e/e2e:64-100) — but
generated: seeded templated HTML with planted
"<SUBJ> <pred-phrase> <OBJ>." sentences from the closed vocab, so the
expected triple set, component structure, and extracted text are all
computable at generation time.

Every page is a pure function of (seed, page_index): the corpus can be
generated serially in pandas (tests) or distributed via mapInPandas
over spark.range(n) (bench at SF=0.1+) with identical bytes.

Key properties planted on purpose:
- Zipf-skewed domains (~1% of domains own ~50% of pages) and head
  entities → exercises salting / AQE skew handling.
- ~5% charset quirks (UTF-8 BOM, latin-1 meta) + HTML entity escapes
  → exercises byte-exact extraction.
- ~2% distractor sentences (capitalized fake entities with real
  predicate phrases) whose triples are NOT golden → precision
  pressure ≤ ~0.98.
- ~3% mentions use typo surfaces absent from the alias dict →
  reachable only via MinHash-LSH → recall pressure.
- equivalence-assertion chains (length ≤ 8) and one 100-alias star →
  CC must converge beyond one hop.
"""

from __future__ import annotations

import json
import random
from dataclasses import dataclass, field

import pandas as pd

from guackg.extract import extract_text_bytes
from guackg.vocab import (
    ALL_PRED_SURFACES,
    build_entities,
    make_typos,
    normalize_surface,
)

SEED = 42
N_DOMAINS = 1000
ROWS_PER_MILLI_SF = 1000  # pages = 1000 * SF/0.001

_FAKE_SYL = ["Quz", "Blor", "Flim", "Zax", "Vren", "Plok", "Drus", "Gnar",
             "Twee", "Skro", "Muln", "Yarp"]

_FILLER = ("the quick analysis shows steady progress across all regional "
           "markets while demand for industrial components remains stable "
           "and new partnerships continue to develop in emerging sectors").split()

_DE_SENTS = ["Der Bericht wurde sorgfältig geprüft und veröffentlicht.",
             "Die Ergebnisse zeigen eine stabile Entwicklung der Märkte."]
_FR_SENTS = ["Le rapport a été soigneusement vérifié et publié.",
             "Les résultats montrent une évolution stable des marchés."]

# forward predicate ids for the structured-JSON dialect (direction is
# already normalized in structured data — no inverse surfaces)
_JSON_PREDS = sorted({p for p, inv in ALL_PRED_SURFACES.values() if not inv})

JSON_PAGE_RATE = 0.08      # share of en pages in the structured dialect
JSON_MALFORMED_RATE = 0.03  # of json pages: truncated -> parser yields 0


def surface_key(surface: str) -> str:
    """Pre-canonical mention key (the 'sfc:' identity namespace —
    analog of guac-purl fallback keys, purl.go:211-229)."""
    return "sfc:" + normalize_surface(surface)


# ---------------------------------------------------------------------------
# Corpus context: entities, alias dict, typos, assertions, union-find.
# Built once, deterministically; cheap (~1k entities).
# ---------------------------------------------------------------------------

class _UF:
    def __init__(self) -> None:
        self.parent: dict[str, str] = {}

    def find(self, x: str) -> str:
        p = self.parent.setdefault(x, x)
        if p != x:
            self.parent[x] = p = self.find(p)
        return p

    def union(self, a: str, b: str) -> None:
        ra, rb = self.find(a), self.find(b)
        if ra != rb:
            self.parent[max(ra, rb)] = min(ra, rb)

    def rep_map(self) -> dict[str, str]:
        # path-compress fully, then min-string representative per set
        members: dict[str, list[str]] = {}
        for k in list(self.parent):
            members.setdefault(self.find(k), []).append(k)
        out = {}
        for root, ms in members.items():
            rep = min(ms + [root])
            for m in ms:
                out[m] = rep
        return out


@dataclass
class CorpusCtx:
    entities: list[dict]
    alias_rows: list[dict]            # {surface(normalized), canonical_key, kind}
    sentence_surfaces: dict[str, list[str]]  # canonical_key -> dot-free usable raw surfaces
    typo_by_ent: dict[str, dict]      # canonical_key -> typo row
    assertions: list[tuple[str, str]]
    rep: dict[str, str] = field(default_factory=dict)
    pred_choices: list[tuple[str, str, bool]] = field(default_factory=list)

    def final_key(self, canonical_key: str) -> str:
        return self.rep.get(canonical_key, canonical_key)


_CTX: CorpusCtx | None = None


def _make_assertions(entities: list[dict], seed: int) -> list[tuple[str, str]]:
    """Equivalence-assertion chains (analog of PkgEqual/HashEqual
    ingests, assembler.go:99-103,173-186): chains of alt-identity ids
    up to length 8, plus one 100-alias star on a head place entity."""
    rng = random.Random(f"{seed}|assert")
    out: list[tuple[str, str]] = []
    picks = [e for e in entities if e["kind"] in ("org", "place")][:30]
    for j, e in enumerate(picks):
        chain_len = 2 + (j % 7)  # 2..8 hops
        prev = e["canonical_key"]
        for h in range(chain_len):
            nxt = f"alt{h}:{e['canonical_key'].split('/')[-1]}_{h}"
            out.append((prev, nxt))
            prev = nxt
    star = next(e for e in entities if e["canonical_key"] == "ent:place/united_states")
    for h in range(100):
        out.append((star["canonical_key"], f"altstar:us_{h:03d}"))
    rng.shuffle(out)
    return out


def get_ctx() -> CorpusCtx:
    """Lazy module-level singleton: rebuilt identically on every
    executor (pure function of SEED), so nothing needs broadcasting."""
    global _CTX
    if _CTX is not None:
        return _CTX
    entities = build_entities()
    typos = make_typos(entities, n=50, seed=SEED)

    # normalized surface -> set of canonical keys; drop ambiguous
    surf_owner: dict[str, set[str]] = {}
    for e in entities:
        for s in e["surfaces"]:
            surf_owner.setdefault(normalize_surface(s), set()).add(e["canonical_key"])
    ambiguous = {s for s, owners in surf_owner.items() if len(owners) > 1}

    alias_rows, sentence_surfaces = [], {}
    seen_norm: set[str] = set()
    for e in entities:
        usable = []
        for s in e["surfaces"]:
            norm = normalize_surface(s)
            if norm in ambiguous:
                continue
            if norm not in seen_norm:
                seen_norm.add(norm)
                alias_rows.append({"surface": norm,
                                   "canonical_key": e["canonical_key"],
                                   "kind": e["kind"]})
            if "." not in s:
                usable.append(s)
        sentence_surfaces[e["canonical_key"]] = usable or [e["surfaces"][0]]

    typo_by_ent = {}
    for t in typos:
        if normalize_surface(t["surface"]) in seen_norm:
            continue  # a typo colliding with a real alias is no typo
        if normalize_surface(t["closest"]) in ambiguous:
            continue
        typo_by_ent[t["canonical_key"]] = t

    assertions = _make_assertions(entities, SEED)

    uf = _UF()
    for r in alias_rows:
        uf.union("sfc:" + r["surface"], r["canonical_key"])
    for t in typo_by_ent.values():
        uf.union(surface_key(t["surface"]), t["canonical_key"])
    for a, b in assertions:
        uf.union(a, b)

    ctx = CorpusCtx(
        entities=entities,
        alias_rows=alias_rows,
        sentence_surfaces=sentence_surfaces,
        typo_by_ent=typo_by_ent,
        assertions=assertions,
        rep=uf.rep_map(),
        pred_choices=[(s, p, inv) for s, (p, inv) in ALL_PRED_SURFACES.items()],
    )
    _CTX = ctx
    return ctx


# ---------------------------------------------------------------------------
# Page generation: pure function of (seed, i).
# ---------------------------------------------------------------------------

def _zipf_idx(rng: random.Random, n: int, exponent: float = 6.0) -> int:
    return min(n - 1, int(n * rng.random() ** exponent))


def _fake_name(rng: random.Random) -> str:
    w = lambda: (rng.choice(_FAKE_SYL) + rng.choice(_FAKE_SYL)).lower().capitalize()
    return f"{w()} {w()}"


def _pick_surface(rng: random.Random, ctx: CorpusCtx, ent: dict) -> tuple[str, bool]:
    """Returns (raw surface, is_typo)."""
    key = ent["canonical_key"]
    typo = ctx.typo_by_ent.get(key)
    if typo is not None and rng.random() < 0.30:
        return typo["surface"], True
    surfaces = ctx.sentence_surfaces[key]
    return surfaces[rng.randrange(len(surfaces))], False


def gen_page(i: int, seed: int = SEED) -> dict:
    """One page row + its golden triples. Deterministic in (seed, i)."""
    ctx = get_ctx()
    rng = random.Random(f"{seed}|page|{i}")

    domain = f"site{_zipf_idx(rng, N_DOMAINS):04d}.example.com"
    url = f"https://{domain}/page-{i}"
    warc_ts = pd.Timestamp("2024-01-01") + pd.Timedelta(seconds=i)  # naive UTC

    r = rng.random()
    lang = "en" if r < 0.90 else ("de" if r < 0.95 else "fr")

    title = f"Bulletin {i}"
    sents: list[str] = []
    golden: list[dict] = []
    if lang == "en" and rng.random() < JSON_PAGE_RATE:
        # ---- structured-JSON dialect page (second parser, SURVEY T2)
        triples_json: list[dict] = []
        for _ in range(rng.randint(10, 30)):
            si = _zipf_idx(rng, len(ctx.entities), 4.0)
            oi = _zipf_idx(rng, len(ctx.entities), 4.0)
            if oi == si:
                oi = (oi + 1) % len(ctx.entities)
            subj_e, obj_e = ctx.entities[si], ctx.entities[oi]
            ssurf, _ = _pick_surface(rng, ctx, subj_e)
            osurf, _ = _pick_surface(rng, ctx, obj_e)
            if rng.random() < 0.02:  # unknown predicate id: parser drops it
                triples_json.append({"s": ssurf, "p": "bogus_rel",
                                     "o": osurf})
                continue
            pred = _JSON_PREDS[rng.randrange(len(_JSON_PREDS))]
            triples_json.append({"s": ssurf, "p": pred, "o": osurf})
            golden.append({"url": url,
                           "subj_key": ctx.final_key(subj_e["canonical_key"]),
                           "pred": pred,
                           "obj_key": ctx.final_key(obj_e["canonical_key"]),
                           "subj_surface": ssurf, "obj_surface": osurf})
        filler_words = " ".join(rng.choice(_FILLER)
                                for _ in range(rng.randint(300, 800)))
        body = json.dumps({"title": title, "triples": triples_json,
                           "filler": filler_words},
                          separators=(",", ":"))
        html_bytes = body.encode("utf-8")
        if rng.random() < JSON_MALFORMED_RATE:
            html_bytes = html_bytes[:-20]  # malformed: scanned, 0 triples
            golden = []
        text = extract_text_bytes(html_bytes)
        return {"url": url, "warc_ts": warc_ts, "html": html_bytes,
                "text": text, "lang": lang, "_golden": golden}
    if lang == "en":
        # 30-80 entity sentences / page ⇒ ~6-16 KB extracted text —
        # Common-Crawl-realistic weight, so benchmark runs are
        # compute-bound (scaling evidence) rather than latency-bound
        for _ in range(rng.randint(30, 80)):
            if rng.random() < 0.02:  # distractor: fake entities, real predicate
                ps, _pred, _inv = ctx.pred_choices[rng.randrange(len(ctx.pred_choices))]
                sents.append(f"{_fake_name(rng)} {ps} {_fake_name(rng)}.")
                continue
            si = _zipf_idx(rng, len(ctx.entities), 4.0)
            oi = _zipf_idx(rng, len(ctx.entities), 4.0)
            if oi == si:
                oi = (oi + 1) % len(ctx.entities)
            subj_e, obj_e = ctx.entities[si], ctx.entities[oi]
            ps, pred, inv = ctx.pred_choices[rng.randrange(len(ctx.pred_choices))]
            ssurf, _ = _pick_surface(rng, ctx, subj_e)
            osurf, _ = _pick_surface(rng, ctx, obj_e)
            sents.append(f"{ssurf} {ps} {osurf}.")
            sk = ctx.final_key(subj_e["canonical_key"])
            ok = ctx.final_key(obj_e["canonical_key"])
            if inv:  # "X was acquired by Y" == (Y, acquired, X)
                sk, ok = ok, sk
                ssurf, osurf = osurf, ssurf
            golden.append({"url": url, "subj_key": sk, "pred": pred,
                           "obj_key": ok, "subj_surface": ssurf,
                           "obj_surface": osurf})
    else:
        pool = _DE_SENTS if lang == "de" else _FR_SENTS
        sents.extend(rng.sample(pool, k=len(pool)))

    filler = " ".join(rng.choice(_FILLER)
                      for _ in range(rng.randint(300, 800)))
    quirk = rng.random()
    boiler_extra = ""
    if rng.random() < 0.05:
        boiler_extra = " Smith &amp; Sons announce the 3 &lt; 5 review."

    paras = "".join(f"<p>{s}</p>" for s in sents)
    charset_meta = ""
    if quirk < 0.025:
        charset_meta = '<meta http-equiv="Content-Type" content="text/html; charset=latin-1">'
        filler += " café münchen"
    html_doc = (
        f"<html><head>{charset_meta}<title>{title}</title>"
        f"<style>body {{ font: 14px serif; }}</style></head>"
        f"<body><nav>Home About Contact</nav>{paras}"
        f"<p>{filler}{boiler_extra}</p>"
        f"<script>var tracker = 'x' < 'y';</script></body></html>"
    )
    if quirk < 0.025:
        html_bytes = html_doc.encode("latin-1")
    elif quirk < 0.05:
        html_bytes = b"\xef\xbb\xbf" + html_doc.encode("utf-8")
    else:
        html_bytes = html_doc.encode("utf-8")

    # golden text IS the frozen extraction of the generated bytes: the
    # fixture pins the extractor against regression/nondeterminism.
    text = extract_text_bytes(html_bytes)
    return {"url": url, "warc_ts": warc_ts, "html": html_bytes,
            "text": text, "lang": lang, "_golden": golden}


# ---------------------------------------------------------------------------
# Corpus assembly (pandas, for tests) and fixture tables.
# ---------------------------------------------------------------------------

PAGE_COLS = ["url", "warc_ts", "html", "text", "lang"]


def generate_corpus(n_pages: int, seed: int = SEED) -> dict[str, pd.DataFrame]:
    ctx = get_ctx()
    rows, golden = [], []
    for i in range(n_pages):
        r = gen_page(i, seed)
        golden.extend(r.pop("_golden"))
        rows.append(r)
    pages = pd.DataFrame(rows, columns=PAGE_COLS)
    golden_triples = pd.DataFrame(
        golden, columns=["url", "subj_key", "pred", "obj_key",
                         "subj_surface", "obj_surface"])

    import hashlib
    golden_text = pd.DataFrame({
        "url": pages["url"],
        "text_sha256": [hashlib.sha256(t.encode("utf-8")).hexdigest()
                        for t in pages["text"]],
    })
    alias_dict = pd.DataFrame(ctx.alias_rows,
                              columns=["surface", "canonical_key", "kind"])
    assertions = pd.DataFrame(ctx.assertions, columns=["key_a", "key_b"])
    golden_components = pd.DataFrame(
        [{"member_key": k, "canon_key": v} for k, v in sorted(ctx.rep.items())],
        columns=["member_key", "canon_key"])
    return {"pages": pages, "golden_triples": golden_triples,
            "golden_text": golden_text, "alias_dict": alias_dict,
            "assertions": assertions, "golden_components": golden_components}


def spark_generate_pages(spark, n_pages: int, seed: int = SEED,
                         partitions: int | None = None):
    """Distributed page generation: spark.range → mapInPandas. Used by
    bench at SF=0.1+; each executor rebuilds the (pure) ctx once."""
    from pyspark.sql.types import (BinaryType, StringType, StructField,
                                   StructType, TimestampType)
    schema = StructType([
        StructField("url", StringType()),
        StructField("warc_ts", TimestampType()),
        StructField("html", BinaryType()),
        StructField("text", StringType()),
        StructField("lang", StringType()),
    ])

    def gen_batches(it):
        for pdf in it:
            out = []
            for i in pdf["id"]:
                r = gen_page(int(i), seed)
                r.pop("_golden")
                out.append(r)
            yield pd.DataFrame(out, columns=PAGE_COLS)

    rng_df = spark.range(0, n_pages, numPartitions=partitions or 32)
    return rng_df.mapInPandas(gen_batches, schema=schema)
