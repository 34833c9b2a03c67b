"""Reference-semantics oracle — an independent pandas/numpy
re-derivation of the mapping semantics, used as the P/R ≥ 0.95 gate
(SURVEY §5b). NO Ray, NO shared lexicon object: it re-does the joins the
way the reference does (pandas merges over the raw dimension tables,
clinical_concept_annotator.py:205-328), detects mentions with plain
regex word-boundary search, and scores tier-3 with a dense numpy TF-IDF
matrix — a genuinely different code path from the engine's
automaton + postings implementation.
"""

from __future__ import annotations

import re

import numpy as np
import pandas as pd

from omop2obo_ray.functions.normalize import build_vocab_dict, normalize_source_codes
from omop2obo_ray.functions.textproc import preprocess_tokens, sentences

OBO = "http://purl.obolibrary.org/obo/"


def _short(u: str) -> str:
    return u.split("/")[-1]


def oracle_triples(
    fixture: dict[str, pd.DataFrame],
    ontologies: tuple[str, ...] = ("hp", "mondo"),
    top_n: int = 10,
    floor: float = 0.25,
    percentile: float = 75.0,
    threshold: float = 0.25,
    languages: tuple[str, ...] = ("en",),
) -> pd.DataFrame:
    concepts = fixture["concepts"]
    dbxrefs = fixture["dbxrefs"]
    aliases = fixture["aliases"]
    ancestors = fixture["ancestors"]
    vocab_map = fixture["vocab_map"]
    pages = fixture["pages"]

    vocab = build_vocab_dict(
        vocab_map["primary_abbreviation"].tolist(), vocab_map["abbreviations"].tolist()
    )
    concepts = concepts[concepts["ontology"].isin(ontologies)].copy()
    live = concepts[~concepts["deprecated"]]
    dead = concepts[concepts["deprecated"]]

    # ---- surface → (level, ont, uri, tier) frame via pandas joins ----
    rows = []
    for kind in ("label", "synonym"):
        for _, r in live[live["kind"] == kind].iterrows():
            rows.append((r["value"].lower(), "CONCEPT", r["ontology"], _short(r["uri"]), "str"))

    dbx = dbxrefs[dbxrefs["ontology"].isin(ontologies)].copy()
    dbx["norm_code"] = normalize_source_codes(dbx["code"].tolist(), vocab)
    al = aliases[(aliases["lang"] == "ENG") & (aliases["code"] != "NOCODE")].copy()
    al["norm_code"] = normalize_source_codes((al["sab"] + ":" + al["code"]).tolist(), vocab)

    # J1 single merge: alias.norm_code == dbxref.norm_code
    m1 = al.merge(dbx, on="norm_code")
    for _, r in m1.iterrows():
        rows.append((r["surface"].lower(), "CONCEPT", r["ontology"], _short(r["uri"]), "dbxref"))
    # J2 double merge: alias → cui → sibling alias codes → dbxref
    sib = al.merge(al, on="cui", suffixes=("", "_sib"))
    sib = sib[sib["norm_code"] != sib["norm_code_sib"]]
    m2 = sib.merge(dbx, left_on="norm_code_sib", right_on="norm_code")
    for _, r in m2.iterrows():
        rows.append((r["surface"].lower(), "CONCEPT", r["ontology"], _short(r["uri"]), "umls"))
    # J5 ananke: dbxref code of the form umls:<cui>
    dbx_umls = dbx[dbx["norm_code"].str.startswith("umls:")].copy()
    dbx_umls["cui"] = dbx_umls["norm_code"].str.split(":").str[-1].str.upper()
    m3 = al.merge(dbx_umls, on="cui")
    for _, r in m3.iterrows():
        rows.append((r["surface"].lower(), "CONCEPT", r["ontology"], _short(r["uri"]), "umls"))

    # ancestors: closure for deprecated surfaces
    par: dict[str, list[str]] = {}
    for c, p in zip(ancestors["child_uri"], ancestors["parent_uri"]):
        par.setdefault(_short(c), []).append(_short(p))

    def closure(su: str) -> list[str]:
        seen, out, stack = set(), [], list(par.get(su, []))
        while stack:
            x = stack.pop(0)
            if x not in seen:
                seen.add(x)
                out.append(x)
                stack.extend(par.get(x, []))
        return out

    live_set = {_short(u) for u in live["uri"]}
    uri_ont = {_short(r["uri"]): r["ontology"] for _, r in concepts.iterrows()}
    for kind in ("label", "synonym"):
        for _, r in dead[dead["kind"] == kind].iterrows():
            for anc in closure(_short(r["uri"])):
                if anc in live_set and uri_ont.get(anc) == r["ontology"]:
                    rows.append((r["value"].lower(), "ANCESTOR", r["ontology"], anc, "ancestor"))

    surf_df = pd.DataFrame(
        rows, columns=["surface", "level", "ontology", "uri", "tier"]
    ).drop_duplicates()

    # canonicalization (independent re-derivation of the engine's rule):
    # surfaces ambiguous within an ontology at CONCEPT level resolve to
    # the (best tier rank, lowest uri) concept
    tier_rank = {"str": 0, "dbxref": 1, "umls": 2}
    exact_rows = surf_df[(surf_df["level"] == "CONCEPT")
                         & surf_df["tier"].isin(tier_rank)]
    canon: dict[tuple[str, str], str] = {}
    for (surface, ont), g in exact_rows.groupby(["surface", "ontology"]):
        if g["uri"].nunique() > 1:
            best = min((tier_rank[t], u) for t, u in zip(g["tier"], g["uri"]))
            canon[(surface, ont)] = best[1]

    surf_rows: dict[str, list[tuple[str, str, str, str]]] = {}
    for srow in surf_df.itertuples():
        surf_rows.setdefault(srow.surface, []).append(
            (srow.level, srow.ontology, srow.uri, srow.tier)
        )
    surfaces = sorted(surf_df["surface"].unique(), key=lambda s: (-len(s), s))
    # one longest-first alternation per page instead of one regex pass
    # per surface (O(patterns × pages) → O(pages)); finditer's
    # leftmost-longest-advance IS the greedy non-overlap selection
    alternation = (
        re.compile(r"(?<![\w])(?:" + "|".join(re.escape(s) for s in surfaces)
                   + r")(?![\w])")
        if surfaces else None
    )

    # ---- tier-3 corpus: dense tfidf (sklearn-formula, smooth idf) ----
    sim_rows = live[live["kind"].isin(["label", "synonym", "definition"])].copy()
    sim_rows = sim_rows.sort_values(["ontology", "uri", "kind", "value"], kind="mergesort")
    corpus_tokens, corpus_uri, corpus_ont = [], [], []
    for _, r in sim_rows.iterrows():
        t = preprocess_tokens(r["value"])
        if t:
            corpus_tokens.append(t)
            corpus_uri.append(_short(r["uri"]))
            corpus_ont.append(r["ontology"])

    def grams(toks):
        out = list(toks)
        for k in (2, 3):
            out += [" ".join(toks[i : i + k]) for i in range(len(toks) - k + 1)]
        return out

    vocab_terms: dict[str, int] = {}
    for toks in corpus_tokens:
        for g in grams(toks):
            if g not in vocab_terms:
                vocab_terms[g] = len(vocab_terms)
    V, N = len(vocab_terms), len(corpus_tokens)
    mat = np.zeros((N, V))
    for i, toks in enumerate(corpus_tokens):
        for g in grams(toks):
            mat[i, vocab_terms[g]] += 1.0
    df = (mat > 0).sum(axis=0)
    idf = np.log((1.0 + N) / (1.0 + df)) + 1.0
    mat *= idf
    norms = np.linalg.norm(mat, axis=1, keepdims=True)
    norms[norms == 0] = 1.0
    mat /= norms
    unigram_vocab = {g for g in vocab_terms if " " not in g}

    def sim_scores(toks):
        q = np.zeros(V)
        for g in grams(toks):
            j = vocab_terms.get(g)
            if j is not None:
                q[j] += 1.0
        q *= idf
        n = np.linalg.norm(q)
        if n == 0:
            return np.zeros(N)
        return mat @ (q / n)

    # ---- per-page mention detection + scoring ----
    triples = []
    for _, page in pages.iterrows():
        if page["lang"] not in languages:
            continue
        url = page["url"]
        low = page["text"].lower()
        # leftmost-longest non-overlapping mention selection (same rule
        # the engine's scanner applies)
        chosen = (
            [(m.start(), m.end(), m.group(0)) for m in alternation.finditer(low)]
            if alternation else []
        )
        covered = [(s, e) for s, e, _ in chosen]
        links = []
        for start, end, s in chosen:
            for level, ont, uri, tier in surf_rows.get(s, ()):
                if level == "CONCEPT" and tier in tier_rank:
                    uri = canon.get((s, ont), uri)
                links.append((level, ont, uri, tier, s))

        sim_links = []  # (ont, uri, score)
        n_c = 0
        pos = 0
        for sent in sentences(low):
            sstart = low.find(sent, pos)
            send = sstart + len(sent) if sstart >= 0 else -1
            if sstart >= 0:
                pos = send
            if sstart >= 0 and any(s < send and e > sstart for s, e in covered):
                continue
            toks = preprocess_tokens(sent)
            if not any(t in unigram_vocab for t in toks):
                continue
            if n_c >= 8:
                break
            n_c += 1
            scores = sim_scores(toks)
            order = scores.argsort(kind="stable")[::-1][:top_n]
            matches = [(float(scores[i]), corpus_uri[i], corpus_ont[i]) for i in order
                       if scores[i] >= floor]
            for ont in ontologies:
                om = [(sc, u) for sc, u, o in matches if o == ont]
                if not om:
                    continue
                filtered, seen = [], set()
                for sc, u in sorted(om, reverse=True):
                    if u not in seen:
                        filtered.append((sc, u))
                        seen.add(u)
                cut = np.percentile([sc for sc, _ in filtered], percentile)
                for sc, u in filtered:
                    if sc >= cut:
                        sim_links.append((ont, u, sc))

        # ---- aggregation (A6 semantics) ----
        for ont in ontologies:
            exact_c = [(u, t) for lvl, o, u, t, _s in links
                       if o == ont and lvl == "CONCEPT" and t in ("str", "dbxref", "umls")]
            anc = [(u, t) for lvl, o, u, t, _s in links if o == ont and lvl == "ANCESTOR"]
            exact = exact_c if exact_c else anc
            if exact:
                uris, seen = [], set()
                for u, _t in exact:
                    if u not in seen:
                        seen.add(u)
                        uris.append(u)
                if exact_c:
                    pred = ("Automatic Constructor - Concept" if len(uris) > 1
                            else "Automatic Exact - Concept")
                else:
                    pred = ("Automatic Constructor - Ancestor" if len(uris) > 1
                            else "Automatic Exact - Ancestor")
                for u in uris:
                    triples.append((url, pred, u, ont))
            osims = [(u, sc) for o, u, sc in sim_links if o == ont]
            if osims:
                scs = np.array([sc for _u, sc in osims])
                if (scs == 1.0).any():
                    keep = [(u, sc) for u, sc in osims if sc == 1.0]
                elif (scs >= threshold).any():
                    keep = [(u, sc) for u, sc in osims if sc >= threshold]
                else:
                    keep = osims
                evid, seen_e = [], set()
                for u, sc in keep:
                    e = f"{u}_{round(sc, 3)}"
                    if e not in seen_e:
                        seen_e.add(e)
                        evid.append(e)
                pred = ("Automatic Constructor - Concept" if len(evid) > 1
                        else "Manual Exact - Concept Similarity")
                uris, seen = [], set()
                for u, _sc in keep:
                    if u not in seen:
                        seen.add(u)
                        uris.append(u)
                for u in uris:
                    triples.append((url, pred, u, ont))

    out = pd.DataFrame(triples, columns=["subj", "pred", "obj", "ontology"])
    return out.drop_duplicates(subset=["subj", "pred", "obj"]).reset_index(drop=True)


def precision_recall(engine: set, oracle: set) -> tuple[float, float]:
    if not engine and not oracle:
        return 1.0, 1.0
    inter = len(engine & oracle)
    p = inter / len(engine) if engine else 0.0
    r = inter / len(oracle) if oracle else 0.0
    return p, r
