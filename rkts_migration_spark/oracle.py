"""Single-node golden oracle: pure-Python implementation of the triple
contract in vocab.py, run over the fixtures. Deliberately simple
(regex scan + dict loops + union-find) and implementation-independent
from the Spark pipeline (which uses an Aho-Corasick trie, window
functions, broadcast joins and an iterative connected-components loop).

The pipeline's (subj, pred, obj) set is scored against this oracle's
output at P/R >= 0.95 (BASELINE.md; tests/test_oracle_pr.py asserts 1.0).
"""

from __future__ import annotations

import re
from collections import defaultdict

from . import vocab as V
from .fixtures import FixtureSet


# --- canonicalization: union-find over dictionary edges --------------------

def build_canonical_map(fx: FixtureSet) -> dict[str, str]:
    """Close remap/merge/alias chains (the reference resolves only single
    hops, utils.php:102-104; we close transitively). Representative =
    min id (numeric-aware) in each component."""
    parent: dict[str, str] = {}

    def find(x: str) -> str:
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    def union(a: str, b: str) -> None:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[ra] = rb

    for r in fx.id_remap:
        union(r["old_id"], r["new_id"])
    for r in fx.cross_corpus_map:
        union(r["k_id"], r["t_id"])
    for r in fx.same_text_map:
        union(r["alias_id"], r["canonical_id"])

    comps: dict[str, list[str]] = defaultdict(list)
    for node in list(parent):
        comps[find(node)].append(node)
    canon: dict[str, str] = {}
    for members in comps.values():
        rep = min(members, key=V.id_sort_key)
        for m in members:
            canon[m] = rep
    return canon


def build_abstract_lookup(fx: FixtureSet, canon: dict[str, str]) -> dict[str, str]:
    """canonical id -> abstract IRI local, filtering '?'/empty refs
    (utils.php:884-885 parity). Refs are canonicalized before keying so
    an abstract row pointing at a remapped id still lands on the
    component representative. min(canonical_iri) wins per canonical
    (order-free tie-break, distributable)."""
    out: dict[str, str] = {}
    for r in fx.abstract_map:
        ref = (r["entity_ref"] or "").strip()
        if not ref or "?" in ref:
            continue
        c = canon.get(ref, ref)
        if c not in out or r["canonical_iri"] < out[c]:
            out[c] = r["canonical_iri"]
    return out


# --- mention detection: regex alternation (independent of the trie) --------

def _compile_surface_regex(surfaces: list[str]) -> re.Pattern:
    # longest-first alternation == leftmost-longest at whitespace token
    # boundaries; the Spark side implements the same semantics with a
    # token-level Aho-Corasick trie (extract.py) — independent impls.
    alts = sorted({V.norm_surface(s) for s in surfaces}, key=len, reverse=True)
    pat = r"(?<!\S)(" + "|".join(re.escape(a) for a in alts) + r")(?!\S)"
    return re.compile(pat)


def detect_mentions(text: str, rx: re.Pattern) -> list[tuple[int, str]]:
    """Return [(begin_offset_in_normalized_text, matched_normalized)].

    Matching happens on the normalized text (lowercase, collapsed
    whitespace); non-overlapping because re.finditer never overlaps.
    """
    norm = V.norm_surface(text)
    return [(m.start(1), m.group(1)) for m in rx.finditer(norm)]


# --- oracle pipeline --------------------------------------------------------

def run_oracle(fx: FixtureSet) -> set[tuple[str, str, str]]:
    canon = build_canonical_map(fx)
    abstract = build_abstract_lookup(fx, canon)

    def canon_of(eid: str) -> str:
        return canon.get(eid, eid)

    def eiri(eid: str) -> str:
        c = canon_of(eid)
        return V.entity_iri(c, abstract.get(c))

    # surface -> winning entity (max weight, tie min id) + lang of winner row
    by_surface: dict[str, list[dict]] = defaultdict(list)
    for g in fx.gazetteer:
        by_surface[V.norm_surface(g["surface"])].append(g)
    winner: dict[str, tuple[str, str]] = {}
    for surf, rows in by_surface.items():
        best = sorted(rows, key=lambda r: (-r["weight"], V.id_sort_key(r["entity_id"])))[0]
        winner[surf] = (best["entity_id"], best["lang"])

    rx = _compile_surface_regex([g["surface"] for g in fx.gazetteer])

    triples: set[tuple[str, str, str]] = set()

    # document order
    turns = sorted(fx.transcripts, key=lambda r: (r["conv_id"], r["turn_idx"]))

    convs: dict[str, list[dict]] = defaultdict(list)
    for t in turns:
        convs[t["conv_id"]].append(t)

    # (entity, lang) -> first label; entity -> set of normalized labels seen
    label_first: dict[tuple[str, str], str] = {}
    label_alts: dict[tuple[str, str], list[str]] = defaultdict(list)
    label_seen: dict[str, set[str]] = defaultdict(set)
    mentioned: set[str] = set()

    for conv_id in sorted(convs):
        rows = convs[conv_id]
        ciri = V.conv_iri(conv_id)
        triples.add((ciri, V.PRED_N_TURNS, V.int_lit(len(rows))))

        # sections: maximal runs of equal role
        k = 0
        prev_role = None
        sec_begin: int | None = None
        mention_counts: dict[str, int] = defaultdict(int)

        for i, t in enumerate(rows):
            tiri = V.turn_iri(conv_id, t["turn_idx"])
            triples.add((tiri, V.PRED_PART_OF, ciri))
            triples.add((tiri, V.PRED_TURN_INDEX, V.int_lit(t["turn_idx"])))
            triples.add((tiri, V.PRED_ROLE, V.str_lit(t["role"])))
            if t["tool"] is not None:
                triples.add((tiri, V.PRED_USED_TOOL, V.str_lit(t["tool"])))

            if t["role"] != prev_role:
                if prev_role is not None:
                    siri = V.section_iri(conv_id, k)
                    triples.add((siri, V.PRED_END_TURN,
                                 V.turn_iri(conv_id, rows[i - 1]["turn_idx"])))
                k += 1
                siri = V.section_iri(conv_id, k)
                triples.add((ciri, V.PRED_HAS_SECTION, siri))
                triples.add((siri, V.PRED_SECTION_INDEX, V.int_lit(k)))
                triples.add((siri, V.PRED_BEGIN_TURN, tiri))
                prev_role = t["role"]

            if t["text"] in V.PLACEHOLDERS:
                continue
            triples.add((tiri, V.PRED_TEXT, V.str_lit(t["text"])))

            for begin, matched in detect_mentions(t["text"], rx):
                eid, lang = winner[matched]
                c = canon_of(eid)
                mentioned.add(c)
                triples.add((tiri, V.PRED_MENTIONS, eiri(eid)))
                mention_counts[c] += 1
                # first-wins labels: turns are scanned in document order,
                # offsets ascend within a turn -> arrival order IS
                # (conv_id, turn_idx, begin)
                nl = V.norm_label(matched)
                if nl not in label_seen[c]:
                    label_seen[c].add(nl)
                    if (c, lang) not in label_first:
                        label_first[(c, lang)] = matched
                    else:
                        label_alts[(c, lang)].append(matched)

        if prev_role is not None:
            siri = V.section_iri(conv_id, k)
            triples.add((siri, V.PRED_END_TURN,
                         V.turn_iri(conv_id, rows[-1]["turn_idx"])))

        if mention_counts:
            top = sorted(mention_counts.items(),
                         key=lambda kv: (-kv[1], V.id_sort_key(kv[0])))[0][0]
            triples.add((ciri, V.PRED_TOP_ENTITY, eiri(top)))

    for (c, lang), lbl in label_first.items():
        triples.add((eiri(c), V.PRED_PREF_LABEL, V.str_lit(lbl, lang)))
    for (c, lang), lbls in label_alts.items():
        for lbl in lbls:
            triples.add((eiri(c), V.PRED_ALT_LABEL, V.str_lit(lbl, lang)))

    # entity props for mentioned canonical entities, self-refs dropped
    for p in fx.entity_props:
        if p["obj"] == p["entity_ref"]:
            continue
        c = canon_of(p["entity_ref"])
        if c not in mentioned:
            continue
        pred = V.PRED_WORK_IS_ABOUT if p["prop"] == "ab" else V.PRED_WORK_GENRE
        ns = V.TOPIC if p["prop"] == "ab" else V.GENRE
        triples.add((eiri(c), pred, ns + p["obj"]))

    return triples


def precision_recall(
    got: set[tuple[str, str, str]], want: set[tuple[str, str, str]]
) -> tuple[float, float]:
    if not got or not want:
        return (0.0, 0.0)
    inter = len(got & want)
    return (inter / len(got), inter / len(want))
