"""Closed vocabularies for the synthetic webtext corpus.

Mirrors the reference's fixture strategy: embedded example documents
with known expected predicates
(/root/reference/internal/testing/testdata/testdata.go:40-80). All
derivation is seed-deterministic so golden fixtures are computable at
generation time.

Entity identity follows guac's canonical-key model: a canonical key is
`ent:{kind}/{slug}` (analog of pURL / guac-purl synthesis,
/root/reference/pkg/assembler/helpers/purl.go:36-229), and every
surface form maps to it through the alias dictionary (analog of
PkgEqual equivalence, /root/reference/pkg/assembler/assembler.go:173-186).
"""

from __future__ import annotations

import random
import re

# ---------------------------------------------------------------------------
# Predicate lexicon: surface phrase -> predicate id (closed, ~20 entries).
# Longest-match-first at extraction time (like guac's relationship maps,
# /root/reference/pkg/ingestor/parser/spdx/parse_spdx.go:434-453).
# ---------------------------------------------------------------------------
PREDICATES: dict[str, str] = {
    "was founded by": "founded_by",
    "is located in": "located_in",
    "is headquartered in": "headquartered_in",
    "works for": "works_for",
    "was born in": "born_in",
    "is the capital of": "capital_of",
    "collaborates with": "collaborates_with",
    "invested in": "invested_in",
    "is a subsidiary of": "subsidiary_of",
    "manufactures": "manufactures",
    "exports": "exports",
    "studied at": "studied_at",
    "is married to": "married_to",
    "wrote": "wrote",
    "discovered": "discovered",
    "leads": "leads",
    "owns": "owns",
    "supplies": "supplies",
    "competes with": "competes_with",
    "partnered with": "partnered_with",
}

# Inverse predicates: extraction normalizes direction by swapping
# subject/object, the analog of guac's DEPENDS_ON vs DEPENDENCY_OF flip
# (/root/reference/pkg/ingestor/parser/spdx/parse_spdx.go:263-304).
INVERSE_PREDICATES: dict[str, str] = {
    "was acquired by": "acquired",     # X was acquired by Y  ==  Y acquired X
    "is owned by": "owns",             # X is owned by Y      ==  Y owns X
    "is supplied by": "supplies",      # X is supplied by Y   ==  Y supplies X
    "was written by": "wrote",         # X was written by Y   ==  Y wrote X
}
PREDICATES_FWD_ONLY = {"acquired": "acquired"}  # forward surface for 'acquired'

ALL_PRED_SURFACES: dict[str, tuple[str, bool]] = {}
for s, p in PREDICATES.items():
    ALL_PRED_SURFACES[s] = (p, False)
ALL_PRED_SURFACES["acquired"] = ("acquired", False)
for s, p in INVERSE_PREDICATES.items():
    ALL_PRED_SURFACES[s] = (p, True)

# sorted longest-first for greedy matching
PRED_SURFACES_BY_LEN: list[str] = sorted(ALL_PRED_SURFACES, key=len, reverse=True)

# ---------------------------------------------------------------------------
# Entity inventory: ~500 canonical entities across 4 kinds, each with
# deterministic alias surfaces (1-6 each).
# ---------------------------------------------------------------------------
_FIRST = ["Ada", "Alan", "Grace", "Edsger", "Barbara", "Donald", "John",
          "Leslie", "Tim", "Margaret", "Radia", "Vint", "Frances", "Ken",
          "Dennis", "Bjarne", "Guido", "Linus", "James", "Anders"]
_LAST = ["Lovelace", "Turing", "Hopper", "Dijkstra", "Liskov", "Knuth",
         "McCarthy", "Lamport", "Berners-Lee", "Hamilton", "Perlman",
         "Cerf", "Allen", "Thompson", "Ritchie", "Stroustrup", "Rossum",
         "Torvalds", "Gosling", "Hejlsberg"]
_ORG_A = ["Acme", "Globex", "Initech", "Umbrella", "Stark", "Wayne",
          "Wonka", "Tyrell", "Cyberdyne", "Aperture", "Hooli", "Vandelay",
          "Sirius", "Massive", "Pied", "Oscorp", "Dunder", "Gringotts",
          "Monarch", "Zenith"]
_ORG_B = ["Industries", "Corporation", "Systems", "Labs", "Holdings",
          "Dynamics", "Partners", "Logistics", "Networks", "Analytics"]
_PLACES = ["United States", "United Kingdom", "Germany", "France", "Japan",
           "Brazil", "Canada", "Australia", "India", "China", "Norway",
           "Sweden", "Finland", "Denmark", "Austria", "Switzerland",
           "Portugal", "Ireland", "Iceland", "Belgium", "Netherlands",
           "Singapore", "Argentina", "Chile", "Mexico", "Egypt", "Kenya",
           "Morocco", "Vietnam", "Thailand"]
_THINGS = ["Turbine", "Widget", "Gadget", "Reactor", "Compiler", "Router",
           "Telescope", "Microscope", "Vaccine", "Satellite", "Engine",
           "Battery", "Sensor", "Drone", "Laser", "Polymer", "Alloy",
           "Catalyst", "Chipset", "Firmware"]


def slugify(s: str) -> str:
    return re.sub(r"[^a-z0-9]+", "_", s.lower()).strip("_")


def _person_aliases(first: str, last: str) -> list[str]:
    return [f"{first} {last}", f"{first[0]}. {last}", f"Dr. {first} {last}"]


def _org_aliases(a: str, b: str) -> list[str]:
    full = f"{a} {b}"
    out = [full, f"{a} {b[:4]}."]
    if b in ("Corporation", "Industries"):
        out.append(f"{a} {'Corp' if b == 'Corporation' else 'Inds'}")
    return out


_PLACE_ALIASES = {
    "United States": ["United States", "U.S.", "The United States", "USA"],
    "United Kingdom": ["United Kingdom", "U.K.", "Great Britain"],
    "Germany": ["Germany", "Federal Republic Of Germany"],
    "Netherlands": ["Netherlands", "The Netherlands", "Holland"],
}


def build_entities() -> list[dict]:
    """Deterministic entity inventory: [{canonical_key, kind, surfaces}]."""
    ents: list[dict] = []
    for f in _FIRST:
        for l in _LAST[:10]:
            name = f"{f} {l}"
            ents.append({
                "canonical_key": f"ent:person/{slugify(name)}",
                "kind": "person",
                "surfaces": _person_aliases(f, l),
            })
    for a in _ORG_A:
        for b in _ORG_B:
            name = f"{a} {b}"
            ents.append({
                "canonical_key": f"ent:org/{slugify(name)}",
                "kind": "org",
                "surfaces": _org_aliases(a, b),
            })
    for p in _PLACES:
        ents.append({
            "canonical_key": f"ent:place/{slugify(p)}",
            "kind": "place",
            "surfaces": list(_PLACE_ALIASES.get(p, [p])),
        })
    for t in _THINGS:
        for suffix in ["Mark I", "Mark II", "X", "Pro", "Ultra"]:
            name = f"{t} {suffix}"
            ents.append({
                "canonical_key": f"ent:thing/{slugify(name)}",
                "kind": "thing",
                "surfaces": [name, f"The {name}"],
            })
    return ents


def make_typos(entities: list[dict], n: int = 50, seed: int = 42) -> list[dict]:
    """Near-miss surfaces NOT in the alias dict — reachable only via
    MinHash-LSH (the linker-recall fixture, FIXTURES.md §2). Typo =
    drop one interior character of a long surface; deterministic."""
    rng = random.Random(seed)
    out = []
    cands = [e for e in entities if len(e["surfaces"][0]) >= 10]
    rng.shuffle(cands)
    for e in cands[:n]:
        s = e["surfaces"][0]
        # drop an interior letter (never first/last of a word)
        positions = [i for i in range(1, len(s) - 1)
                     if s[i].isalpha() and s[i - 1].isalpha() and s[i + 1].isalpha()]
        if not positions:
            continue
        i = positions[rng.randrange(len(positions))]
        typo = s[:i] + s[i + 1:]
        out.append({"surface": typo, "canonical_key": e["canonical_key"],
                    "kind": e["kind"], "closest": s})
    return out


def normalize_surface(s: str) -> str:
    """Canonical surface normalization (analog of guac's lowercase
    identity normalization, /root/reference/pkg/assembler/backends/
    inmem/artifact.go:119-120 and helpers/vuln.go:25-28):
    lowercase, strip dots/commas, collapse whitespace, drop leading
    'the '/'dr. '."""
    t = s.lower()
    t = re.sub(r"[.,']", "", t)
    t = re.sub(r"\s+", " ", t).strip()
    for pre in ("the ", "dr "):
        if t.startswith(pre):
            t = t[len(pre):]
    return t
