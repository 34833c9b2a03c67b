"""Deterministic synthetic fixture generator (FIXTURES.md §1-9).

Generates the web-pages input table plus the lexicon dimension tables
and gold triples, all seeded — no external data, byte-stable across
runs. Mirrors the reference's test-fixture strategy (4-row clinical CSV
+ fake MRCONSO/MRSTY RRFs + a small real ontology,
tests/test_clinical_concept_annotator.py) at parametric scale.

Construction guarantees that make planted gold exact for tiers
str/dbxref/umls/ancestor:
  - every concept owns a globally-unique "head token" (``organ<id>``),
    so no surface form is a sub-phrase of another and Aho-Corasick
    matches are unambiguous;
  - filler vocabulary is disjoint from lexicon token vocabulary;
  - near-miss (tier-3) phrases replace the unique head token with a
    filler token, so they never exact-match — only TF-IDF can score
    them (gold for tier-3 comes from the reference-semantics oracle,
    FIXTURES.md §8).
"""

from __future__ import annotations

import datetime as _dt
import os
import random

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq

from omop2obo_ray import schemas
from omop2obo_ray.functions.html import expected_text, render_page_html

_COLORS = ["crimson", "ashen", "livid", "pallid", "dusky", "mottled", "waxen", "florid"]
_ADJS = ["chronic", "acute", "focal", "diffuse", "benign", "severe", "juvenile", "familial"]
_TISSUES = ["cortical", "hepatic", "renal", "cardiac", "neural", "dermal", "osseous", "gastric"]
_SYN_WORDS = ["syndrome", "disorder", "anomaly", "lesion", "dysplasia", "atrophy"]
_FILLER = [
    "lorem", "ipsum", "dolor", "amet", "consectetur", "adipiscing", "elit", "sed",
    "tempor", "incididunt", "labore", "dolore", "magna", "aliqua", "veniam", "quis",
    "nostrud", "ullamco", "laboris", "nisi", "aliquip", "commodo", "consequat",
]
_STYS = ["Disease or Syndrome", "Finding", "Neoplastic Process", "Congenital Abnormality"]

# URL prefixes appear as aliases exactly as the reference's
# source_code_vocab_map.csv handles snomedbrowser/orpha.net URL codes
# (data_utils.py:241-244 examples)
VOCAB_MAP_ROWS = [
    ("snomed", ["SNOMEDCT_US", "snomedct_us", "sctid", "snomed_ct",
                "http://www.snomedbrowser.com/codes/details"]),
    ("icd10", ["ICD10CM", "icd10cm", "ICD10"]),
    ("umls", ["UMLS", "umls"]),
    ("orphanet", ["Orphanet", "ORDO", "orphanet",
                  "http://www.orpha.net/ordo/orphanet"]),
    ("rxnorm", ["RXNORM", "rxnorm"]),
]


def _uri(ont: str, idx: int) -> str:
    return f"http://purl.obolibrary.org/obo/{ont.upper()}_{idx:07d}"


def make_fixtures(
    out_dir: str,
    n_pages: int = 200,
    n_classes_per_ont: int = 60,
    seed: int = 42,
    ontologies: tuple[str, ...] = ("hp", "mondo"),
    mentions_per_page: tuple[int, int] = (1, 4),
) -> dict[str, pd.DataFrame]:
    rng = random.Random(seed)

    concepts_rows, dbxref_rows, alias_rows, semtype_rows, anc_rows = [], [], [], [], []
    # per-concept metadata for planting
    cmeta: dict[str, dict] = {}  # short_uri -> info
    cui_counter = 0

    for ont in ontologies:
        for i in range(1, n_classes_per_ont + 1):
            uri = _uri(ont, i)
            su = uri.split("/")[-1]
            head = f"{ont}organ{i}"
            deprecated = i > 4 and rng.random() < 0.10
            n_label_toks = rng.choice([2, 3])
            if n_label_toks == 2:
                label = f"{rng.choice(_COLORS)} {head}"
            else:
                label = f"{rng.choice(_ADJS)} {rng.choice(_TISSUES)} {head}"
            concepts_rows.append((ont, uri, "label", label, "rdfs:label", deprecated))
            syns = []
            for j in range(rng.randint(0, 2)):
                syn = f"{head} {_SYN_WORDS[(i + j) % len(_SYN_WORDS)]}"
                stype = "hasExactSynonym" if j == 0 else "hasRelatedSynonym"
                concepts_rows.append((ont, uri, "synonym", syn, stype, deprecated))
                syns.append(syn)
            if rng.random() < 0.5:
                defn = f"{rng.choice(_ADJS)} condition affecting {head} structures"
                concepts_rows.append((ont, uri, "definition", defn, "IAO_0000115", deprecated))
            # DAG edges: 1-2 parents among lower-indexed classes of same ont
            parents = []
            if i > 1:
                n_par = 1 if rng.random() < 0.7 else 2
                cand = list(range(max(1, i - 8), i))
                rng.shuffle(cand)
                for p in cand[:n_par]:
                    parents.append(_uri(ont, p))
                    anc_rows.append((uri, _uri(ont, p)))
            cmeta[su] = {
                "ont": ont, "uri": uri, "label": label, "syns": syns,
                "deprecated": deprecated, "parents": parents, "head": head,
                "alias_surfaces": [], "umls_surfaces": [],
            }

    # ---- ambiguous surfaces: a shared synonym attached to TWO live
    # concepts of the same ontology — exercises canonicalization
    # (merge aliases into canonical ids; canonical = lowest uri at the
    # same tier). Gold for mentions of these surfaces targets the
    # canonical concept. ----
    ambiguous: dict[str, str] = {}  # surface -> canonical short uri
    for ont in ontologies:
        live_ont = [su for su, m in cmeta.items()
                    if m["ont"] == ont and not m["deprecated"]]
        n_amb = max(1, len(live_ont) // 20)
        for j in range(n_amb):
            if len(live_ont) < 2:
                break
            a, b = rng.sample(live_ont, 2)
            surface = f"shared {ont}ambiguous{j}"
            for su in (a, b):
                concepts_rows.append(
                    (ont, cmeta[su]["uri"], "synonym", surface, "hasRelatedSynonym",
                     False)
                )
                cmeta[su]["syns"].append(surface)
            ambiguous[surface] = min(a, b)

    # ---- dbxrefs + aliases (single-merge, double-merge, ananke paths) ----
    for su, m in cmeta.items():
        if m["deprecated"]:
            continue
        r = rng.random()
        if r < 0.55:  # single-merge dbxref path
            code_num = rng.randint(10**5, 10**6 - 1)
            style = rng.choice(["SNOMEDCT_US", "ICD10CM", "Orphanet_url"])
            if style == "Orphanet_url":
                raw = f"http://www.orpha.net/ordo/orphanet_{code_num}"
                sab, acode = "ORPHANET", f"orphanet_{code_num}".upper()
                alias_raw_sab, alias_raw_code = "Orphanet", str(code_num)
            else:
                raw = f"{style}:{code_num}"
                alias_raw_sab, alias_raw_code = style, str(code_num)
            dbxref_rows.append((m["ont"], m["uri"], raw, rng.choice(["DbXref", "ExactMatch"])))
            cui = f"C{cui_counter:07d}"; cui_counter += 1
            surface = f"{m['head']} variant"
            alias_rows.append((cui, "ENG", alias_raw_sab, alias_raw_code, surface))
            semtype_rows.append((cui, rng.choice(_STYS)))
            m["alias_surfaces"].append(surface)
        elif r < 0.75:  # double-merge (umls) path: dbxref code is vocab A,
            # alias surface is attached to sibling vocab B sharing the CUI
            code_a = rng.randint(10**5, 10**6 - 1)
            code_b = rng.randint(10**5, 10**6 - 1)
            dbxref_rows.append((m["ont"], m["uri"], f"SNOMEDCT_US:{code_a}", "DbXref"))
            cui = f"C{cui_counter:07d}"; cui_counter += 1
            alias_rows.append((cui, "ENG", "SNOMEDCT_US", str(code_a), f"{m['head']} primary name"))
            surface = f"{m['head']} crossref"
            alias_rows.append((cui, "ENG", "RXNORM", str(code_b), surface))
            semtype_rows.append((cui, rng.choice(_STYS)))
            m["umls_surfaces"].append(surface)
        elif r < 0.85:  # ananke path: dbxref is umls:CUI itself
            cui = f"C{cui_counter:07d}"; cui_counter += 1
            dbxref_rows.append((m["ont"], m["uri"], f"umls:{cui}", "DbXref"))
            surface = f"{m['head']} umlsname"
            alias_rows.append((cui, "ENG", "SNOMEDCT_US", str(rng.randint(10**5, 10**6 - 1)), surface))
            semtype_rows.append((cui, rng.choice(_STYS)))
            m["umls_surfaces"].append(surface)
    # noise rows that the MRCONSO filters must drop
    alias_rows.append(("C9999999", "CZE", "SNOMEDCT_US", "123456", "cizojazycny nazev"))
    alias_rows.append(("C9999998", "ENG", "SNOMEDCT_US", "NOCODE", "nocode entry"))

    # ---- closure (gold, for assertions) ----
    parents_map = {su: [p.split("/")[-1] for p in m["parents"]] for su, m in cmeta.items()}

    def closure_of(su: str) -> list[str]:
        seen, order, stack = set(), [], list(parents_map.get(su, []))
        while stack:
            p = stack.pop(0)
            if p not in seen:
                seen.add(p); order.append(p)
                stack.extend(parents_map.get(p, []))
        return order

    # ---- pages + gold ----
    live = [su for su, m in cmeta.items() if not m["deprecated"]]
    dead = [su for su, m in cmeta.items() if m["deprecated"]]
    # Zipf(1.1) skew over concepts: head forms dominate (FIXTURES.md §1)
    zipf_w = np.array([1.0 / (k + 1) ** 1.1 for k in range(len(live))])
    zipf_w /= zipf_w.sum()
    np_rng = np.random.RandomState(seed)

    page_rows = []
    gold = []  # (subj, pred, obj, tier, evidence) pre-aggregation records
    for p in range(n_pages):
        url = f"https://ex{seed}.org/p/{p}"
        lang = "en" if rng.random() > 0.06 else rng.choice(["de", ""])
        n_mentions = rng.randint(*mentions_per_page)
        planted: list[tuple[str, str, str]] = []  # (surface, su, tier)
        for _ in range(n_mentions):
            tier = rng.choices(
                ["str", "dbxref", "umls", "ancestor", "sim", "ambig"],
                weights=[36, 18, 14, 12, 16, 4],
            )[0]
            if tier == "ambig" and ambiguous:
                surface = rng.choice(sorted(ambiguous))
                # engine canonicalizes ambiguous surfaces to the lowest
                # uri at the best tier — gold targets the canonical id
                planted.append((surface, ambiguous[surface], "str"))
            elif tier == "str" or tier == "ambig":
                su = live[int(np_rng.choice(len(live), p=zipf_w))]
                m = cmeta[su]
                surface = m["label"] if (not m["syns"] or rng.random() < 0.6) else rng.choice(m["syns"])
                if surface in ambiguous:
                    su = ambiguous[surface]
                planted.append((surface, su, "str"))
            elif tier == "dbxref":
                cands = [su for su in live if cmeta[su]["alias_surfaces"]]
                if not cands:
                    continue
                su = rng.choice(cands)
                planted.append((rng.choice(cmeta[su]["alias_surfaces"]), su, "dbxref"))
            elif tier == "umls":
                cands = [su for su in live if cmeta[su]["umls_surfaces"]]
                if not cands:
                    continue
                su = rng.choice(cands)
                planted.append((rng.choice(cmeta[su]["umls_surfaces"]), su, "umls"))
            elif tier == "ancestor":
                cands = [su for su in dead if closure_of(su)]
                if not cands:
                    continue
                su = rng.choice(cands)
                planted.append((cmeta[su]["label"], su, "ancestor"))
            else:  # sim near-miss: unique head token replaced by filler
                su = live[int(np_rng.choice(len(live), p=zipf_w))]
                toks = cmeta[su]["label"].split()
                toks[-1] = rng.choice(_FILLER)
                planted.append((" ".join(toks), su, "sim"))

        paragraphs = []
        for surface, _su, _tier in planted:
            n_fill = rng.randint(3, 8)
            fills = [rng.choice(_FILLER) for _ in range(n_fill)]
            cut = rng.randint(0, n_fill)
            sent = " ".join(fills[:cut] + [surface] + fills[cut:])
            paragraphs.append(sent.capitalize() + ".")
        for _ in range(rng.randint(1, 3)):  # pure-filler paragraphs
            paragraphs.append(" ".join(rng.choice(_FILLER) for _ in range(rng.randint(5, 12))).capitalize() + ".")
        rng.shuffle(paragraphs)
        title = f"Page {p} report"
        html = render_page_html(title, paragraphs)
        text = expected_text(title, paragraphs)
        ts = _dt.datetime(2024, 1, 1) + _dt.timedelta(seconds=p * 37)
        page_rows.append((url, ts, html, text, lang))

        # gold aggregation per (url, ont) for deterministic tiers — only
        # English pages enter the pipeline (lang filter)
        if lang != "en":
            continue
        per_ont_exact: dict[str, list[tuple[str, str]]] = {}
        per_ont_anc: dict[str, list[tuple[str, str]]] = {}
        for surface, su, tier in planted:
            m = cmeta[su]
            if tier in ("str", "dbxref", "umls"):
                per_ont_exact.setdefault(m["ont"], []).append((su, tier))
            elif tier == "ancestor":
                for anc in closure_of(su):
                    am = cmeta[anc]
                    if not am["deprecated"] and am["ont"] == m["ont"]:
                        per_ont_anc.setdefault(m["ont"], []).append((anc, "ancestor"))
        for ont in set(per_ont_exact) | set(per_ont_anc):
            if ont in per_ont_exact:
                uris, seen, tiers = [], set(), []
                for su, tier in per_ont_exact[ont]:
                    if su not in seen:
                        seen.add(su); uris.append(su); tiers.append(tier)
                pred = ("Automatic Constructor - Concept" if len(uris) > 1
                        else "Automatic Exact - Concept")
                for su, tier in zip(uris, tiers):
                    gold.append((url, pred, su, tier, f"planted_{tier}"))
            elif ont in per_ont_anc:
                uris, seen = [], set()
                for su, _t in per_ont_anc[ont]:
                    if su not in seen:
                        seen.add(su); uris.append(su)
                pred = ("Automatic Constructor - Ancestor" if len(uris) > 1
                        else "Automatic Exact - Ancestor")
                for su in uris:
                    gold.append((url, pred, su, "ancestor", "planted_ancestor"))

    # ---- frames ----
    out = {
        "pages": pd.DataFrame(page_rows, columns=["url", "warc_ts", "html", "text", "lang"]),
        "concepts": pd.DataFrame(
            concepts_rows, columns=["ontology", "uri", "kind", "value", "value_type", "deprecated"]
        ),
        "dbxrefs": pd.DataFrame(dbxref_rows, columns=["ontology", "uri", "code", "xref_type"]),
        "aliases": pd.DataFrame(alias_rows, columns=["cui", "lang", "sab", "code", "surface"]),
        "semtypes": pd.DataFrame(semtype_rows, columns=["cui", "sty"]),
        "ancestors": pd.DataFrame(anc_rows, columns=["child_uri", "parent_uri"]),
        "vocab_map": pd.DataFrame(
            VOCAB_MAP_ROWS, columns=["primary_abbreviation", "abbreviations"]
        ),
        "gold_triples": pd.DataFrame(
            sorted(set(gold)), columns=["subj", "pred", "obj", "tier", "evidence"]
        ),
    }

    if out_dir:
        os.makedirs(out_dir, exist_ok=True)
        schema_map = {
            "pages": schemas.PAGES, "concepts": schemas.CONCEPTS,
            "dbxrefs": schemas.DBXREFS, "aliases": schemas.ALIASES,
            "semtypes": schemas.SEMTYPES, "ancestors": schemas.ANCESTORS,
            "vocab_map": schemas.VOCAB_MAP, "gold_triples": schemas.GOLD_TRIPLES,
        }
        for name, df in out.items():
            table = pa.Table.from_pandas(df, schema=schema_map[name], preserve_index=False)
            pq.write_table(table, os.path.join(out_dir, f"{name}.parquet"))
    return out


if __name__ == "__main__":
    import sys

    make_fixtures(sys.argv[1] if len(sys.argv) > 1 else "/tmp/kg_fixtures")
