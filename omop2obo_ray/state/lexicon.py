"""Lexicon build — the offline dimension-side computation.

The reference builds a nested ontology dictionary (ontology_explorer.py:43-72)
and joins the clinical table against MRCONSO / MRSTY / dbxref tables at
runtime (clinical_concept_annotator.py:205-277). Here all of those
*small-side* joins are precomputed ONCE, driver-side, into direct
``surface → links`` hash maps, then broadcast into every linker actor via
``ray.put`` — no shuffle join for dimension data (SURVEY §2.4 J1-J6).

Precomputed paths:
  - exact tier   : lower(label/synonym) → uri          (J6)
  - dbxref tier  : alias surface → sab:code →(normalize)→ dbxref → uri (J4)
  - umls tier    : alias surface → CUI → sibling codes → dbxref → uri
                   (the "double merge", clinical_concept_annotator.py:212-217, J2)
                   plus the ananke path dbxref ``umls:cui`` ↔ CUI
                   (data_utils.py:305-348, J5)
  - ancestors    : transitive closure over the DAG edge table (BFS;
                   the reference receives this precomputed — SURVEY §7.4.5)
  - sim corpus   : label/synonym/definition token lists + TF-IDF index

Deprecated classes are excluded from concept-level linking
(ontology_utils.py:179-198) but their surfaces remain in the automaton:
a deprecated hit expands to its non-deprecated ancestors and is emitted
at ANCESTOR level — the web analogue of the reference's ancestor-level
mapping fallback (data_utils.py:438-449).
"""

from __future__ import annotations

from dataclasses import dataclass, field

import pandas as pd

from omop2obo_ray.functions.normalize import build_vocab_dict, normalize_source_codes
from omop2obo_ray.functions.textproc import preprocess_tokens
from omop2obo_ray.functions.tfidf import TfidfIndex

# link record: (level, ontology, uri, tier, evidence)
Link = tuple[str, str, str, str, str]


def short_uri(uri: str) -> str:
    """``http://purl.obolibrary.org/obo/HP_0000001`` → ``HP_0000001``
    (clinical_concept_annotator.py:270-271 semantics)."""
    return uri.split("/")[-1]


def ont_of_uri(uri: str) -> str:
    return short_uri(uri).split("_")[0].lower()


@dataclass
class Lexicon:
    # surface (lowercased) → tuple of links, fully precomputed
    surface_links: dict[str, tuple[Link, ...]]
    # all automaton patterns (= surface_links keys)
    # uri (short form) → preferred label
    labels: dict[str, str]
    # uri (short form) → tuple of ancestor short uris (transitive, no self)
    ancestor_closure: dict[str, tuple[str, ...]]
    # TF-IDF similarity index over the ontology corpus
    sim_index: TfidfIndex
    ontologies: tuple[str, ...]
    # surface → synonym type (for evidence strings)
    synonym_types: dict[str, str] = field(default_factory=dict)
    # CUI → semantic types (J3, MRSTY attach)
    cui_semtypes: dict[str, tuple[str, ...]] = field(default_factory=dict)
    # prebuilt Aho-Corasick automaton: constructed ONCE at lexicon-build
    # time and shipped through the object store — each actor unpickles
    # in ~0.2 s instead of rebuilding (~2 s per 10⁵ patterns, ×pool
    # size); None → actors build their own
    automaton: object | None = None

    @property
    def patterns(self) -> list[str]:
        return list(self.surface_links.keys())


def compute_closure(edges: pd.DataFrame) -> dict[str, tuple[str, ...]]:
    """Transitive ancestor closure over (child_uri, parent_uri) DAG edges.

    Deterministic BFS per node with sorted-neighbor expansion; the
    reference consumes a precomputed closure (ANCESTOR_* input columns,
    resources/clinical_data/README.md), so we must build it ourselves.
    Runs driver-side on the small dimension table; see
    pipelines/tpch.py::q_ancestor_closure for the distributed
    iterative-join variant used on large hierarchies.
    """
    parents: dict[str, list[str]] = {}
    for c, p in zip(edges["child_uri"], edges["parent_uri"]):
        parents.setdefault(c, []).append(p)
    for v in parents.values():
        v.sort()
    closure: dict[str, tuple[str, ...]] = {}

    def visit(node: str) -> tuple[str, ...]:
        if node in closure:
            return closure[node]
        closure[node] = ()  # cycle guard (input is a DAG; keeps BFS total)
        anc: list[str] = []
        seen = set()
        for p in parents.get(node, []):
            if p not in seen:
                seen.add(p)
                anc.append(p)
            for a in visit(p):
                if a not in seen:
                    seen.add(a)
                    anc.append(a)
        closure[node] = tuple(anc)
        return closure[node]

    for node in sorted(parents):
        visit(node)
    return closure


def build_lexicon(
    concepts: pd.DataFrame,
    dbxrefs: pd.DataFrame,
    aliases: pd.DataFrame,
    semtypes: pd.DataFrame,
    ancestors: pd.DataFrame,
    vocab_map: pd.DataFrame,
    ontologies: tuple[str, ...] = ("hp", "mondo"),
    umls_expand: bool = True,
    joint_df: tuple[dict[str, int], int] | None = None,
) -> Lexicon:
    """Build the broadcastable lexicon from the dimension tables.

    ``joint_df`` — opt-in reference-parity joint TF-IDF fit
    (string_similarity.py:323-326): a ``(df_counts, n_docs)`` pair of
    page-corpus document frequencies from ``sample_corpus_df``; folded
    into the sim index's vocabulary/idf so scores match a vectorizer
    fit on ontology ∪ sample. Default None keeps the ontology-only fit
    (the declared SURVEY §7.4.2 resolution)."""
    vocab = build_vocab_dict(
        vocab_map["primary_abbreviation"].tolist(), vocab_map["abbreviations"].tolist()
    )

    concepts = concepts[concepts["ontology"].isin(ontologies)]
    live = concepts[~concepts["deprecated"]]
    dead = concepts[concepts["deprecated"]]

    labels: dict[str, str] = {}
    lab_rows = live[live["kind"] == "label"]
    for uri, val in zip(lab_rows["uri"], lab_rows["value"]):
        labels.setdefault(short_uri(uri), val)

    surface_links: dict[str, list[Link]] = {}
    synonym_types: dict[str, str] = {}

    def add(surface: str, link: Link) -> None:
        surface = surface.lower().strip()
        if surface:
            surface_links.setdefault(surface, []).append(link)

    # ---- tier 1: exact label / synonym match (J6) ----
    for kind in ("label", "synonym"):
        rows = live[live["kind"] == kind]
        for ont, uri, val, vtype in zip(
            rows["ontology"], rows["uri"], rows["value"], rows["value_type"]
        ):
            su = short_uri(uri)
            # evidence mirrors 'OBO_LABEL-...' / 'OBO_<synonym_type>-...'
            # construction (data_utils.py:496-506)
            ev = "OBO_LABEL" if kind == "label" else "OBO_" + (vtype or "hasExactSynonym")
            add(val, ("CONCEPT", ont, su, "str", f"{ev}:{val.lower()}"))
            if kind == "synonym":
                synonym_types[val.lower()] = vtype or "hasExactSynonym"

    # ---- tier 2: dbxref / umls alias chains (J1/J2/J4/J5) ----
    dbx = dbxrefs[dbxrefs["ontology"].isin(ontologies)].copy()
    dbx["norm_code"] = normalize_source_codes(dbx["code"].tolist(), vocab)
    code_to_uri: dict[str, list[tuple[str, str, str]]] = {}
    for ont, uri, ncode, xt in zip(
        dbx["ontology"], dbx["uri"], dbx["norm_code"], dbx["xref_type"]
    ):
        code_to_uri.setdefault(ncode, []).append((ont, short_uri(uri), xt))

    # MRCONSO-style filters (clinical_concept_annotator.py:163-166):
    # English rows only, drop NOCODE
    al = aliases[(aliases["lang"] == "ENG") & (aliases["code"] != "NOCODE")].copy()
    raw_codes = (al["sab"] + ":" + al["code"]).tolist()
    al["norm_code"] = normalize_source_codes(raw_codes, vocab)

    cui_codes: dict[str, list[str]] = {}
    for cui, ncode in zip(al["cui"], al["norm_code"]):
        cui_codes.setdefault(cui, []).append(ncode)

    for cui, ncode, surface in zip(al["cui"], al["norm_code"], al["surface"]):
        # single merge (J1): this alias's own code → dbxref
        for ont, su, _xt in code_to_uri.get(ncode, []):
            add(surface, ("CONCEPT", ont, su, "dbxref", f"DBXREF_{ncode}"))
        # ananke (J5): dbxref of the form umls:cui matches the CUI itself
        for ont, su, _xt in code_to_uri.get(f"umls:{cui.lower()}", []):
            add(surface, ("CONCEPT", ont, su, "umls", f"UMLS_CUI_{cui}"))
        if umls_expand:
            # double merge (J2): CUI → sibling vocab codes → dbxref
            for sib in cui_codes.get(cui, []):
                if sib == ncode:
                    continue
                for ont, su, _xt in code_to_uri.get(sib, []):
                    add(surface, ("CONCEPT", ont, su, "umls", f"UMLS_CUI_{cui}_{sib}"))

    # ---- ancestors: closure + deprecated-surface ANCESTOR-level links ----
    closure_full = {
        short_uri(k): tuple(short_uri(a) for a in v)
        for k, v in compute_closure(ancestors).items()
    }
    dead_uris = {short_uri(u) for u in dead["uri"]}
    live_uris = {short_uri(u) for u in live["uri"]}
    closure = {
        k: tuple(a for a in v if a in live_uris) for k, v in closure_full.items()
    }
    for kind in ("label", "synonym"):
        rows = dead[dead["kind"] == kind]
        for ont, uri, val in zip(rows["ontology"], rows["uri"], rows["value"]):
            su = short_uri(uri)
            for anc in closure.get(su, ()):
                if ont_of_uri(anc) == ont:
                    add(
                        val,
                        ("ANCESTOR", ont, anc, "ancestor", f"ANCESTOR_LABEL:{val.lower()}"),
                    )

    # ---- tier-3 corpus: label/synonym/definition rows
    #      (string_similarity.py:316-318 uses exactly these three) ----
    corpus_tokens: list[list[str]] = []
    row_uris: list[str] = []
    row_onts: list[str] = []
    sim_rows = live[live["kind"].isin(["label", "synonym", "definition"])]
    sim_rows = sim_rows.sort_values(["ontology", "uri", "kind", "value"], kind="mergesort")
    for ont, uri, val in zip(sim_rows["ontology"], sim_rows["uri"], sim_rows["value"]):
        toks = preprocess_tokens(val)
        if toks:
            corpus_tokens.append(toks)
            row_uris.append(short_uri(uri))
            row_onts.append(ont)
    if joint_df is not None:
        sim_index = TfidfIndex(corpus_tokens, row_uris, row_onts,
                               extra_df=joint_df[0],
                               extra_n_docs=joint_df[1])
    else:
        sim_index = TfidfIndex(corpus_tokens, row_uris, row_onts)

    # deterministic link ordering: (level, tier-rank, ont, uri)
    tier_rank = {"str": 0, "dbxref": 1, "umls": 2, "ancestor": 3, "sim": 4}
    frozen = {
        s: tuple(
            sorted(set(v), key=lambda l: (l[0], tier_rank.get(l[3], 9), l[1], l[2], l[4]))
        )
        for s, v in surface_links.items()
    }
    cui_semtypes: dict[str, tuple[str, ...]] = {}
    if len(semtypes):
        for cui, sty in zip(semtypes["cui"], semtypes["sty"]):
            cui_semtypes[cui] = cui_semtypes.get(cui, ()) + (sty,)

    from omop2obo_ray.functions.aho import make_scanner

    return Lexicon(
        surface_links=frozen,
        labels=labels,
        ancestor_closure=closure,
        sim_index=sim_index,
        ontologies=tuple(ontologies),
        synonym_types=synonym_types,
        cui_semtypes=cui_semtypes,
        automaton=make_scanner(list(frozen.keys())),
    )


def load_lexicon_from_dir(fixture_dir: str, ontologies=("hp", "mondo"),
                          umls_expand=True, joint_df=None) -> Lexicon:
    """Load the parquet dimension tables written by the fixture generator
    and build the lexicon."""
    import pyarrow.parquet as pq

    def rd(name: str) -> pd.DataFrame:
        return pq.read_table(f"{fixture_dir}/{name}.parquet").to_pandas()

    return build_lexicon(
        rd("concepts"), rd("dbxrefs"), rd("aliases"), rd("semtypes"),
        rd("ancestors"), rd("vocab_map"), ontologies, umls_expand,
        joint_df=joint_df,
    )


def sample_corpus_df(pages, text_col: str = "text",
                     max_docs: int = 10_000,
                     ngram_range: tuple[int, int] = (1, 3),
                     ) -> tuple[dict[str, int], int]:
    """Distributed page-corpus sampling for the joint TF-IDF fit:
    deterministic content-hash sample of ≤ ``max_docs`` rows, per-doc
    DISTINCT n-gram document frequencies combined block-locally
    (``functions.tfidf.df_of_token_lists``), summed by one coarse
    aggregate, and collected driver-side. Driver state is bounded by
    the SAMPLE's vocabulary (max_docs × per-doc distinct n-grams), a
    knob the caller controls — never by corpus size. Returns
    ``(df_counts, n_sampled_docs)`` for ``build_lexicon(joint_df=...)``.

    The sample keeps idf RATIOS in expectation (idf uses (1+n)/(1+df):
    scaling n and df together is the standard corpus-statistics
    sampling estimator); exact reference parity holds when the sample
    IS the whole corpus (max_docs ≥ n_rows) — pinned by test.
    """
    import numpy as np
    import pyarrow as pa

    from omop2obo_ray.functions.hashing import hash64_array
    from omop2obo_ray.functions.shuffle import coarse_aggregate
    from omop2obo_ray.functions.tfidf import df_of_token_lists

    total = pages.count()
    if total == 0:
        return {}, 0
    # deterministic multiplicative-hash thinning at ppm resolution
    keep_ppm = min(1_000_000, (max_docs * 1_000_000) // total) \
        if total > max_docs else 1_000_000

    def _partials(batch: pa.Table) -> pa.Table:
        h = hash64_array(batch[text_col])
        keep = (h % np.uint64(1_000_000)) < np.uint64(keep_ppm)
        texts = batch[text_col].combine_chunks().filter(
            pa.array(keep)).to_pylist()
        lists = [preprocess_tokens(t or "") for t in texts]
        df = df_of_token_lists([l for l in lists if l], ngram_range)
        return pa.table({
            "term": pa.array(list(df.keys()) + ["\x00__docs__"],
                             pa.string()),
            "df": pa.array(list(df.values()) + [len(texts)], pa.int64()),
        })

    agg = coarse_aggregate(
        pages.map_batches(_partials, batch_format="pyarrow",
                          batch_size=None),
        ["term"],
        lambda df: df.groupby("term", sort=False)
        .agg(df=("df", "sum")).reset_index())
    out: dict[str, int] = {}
    n_docs = 0
    for b in agg.iter_batches(batch_size=65536, batch_format="pyarrow"):
        for t, d in zip(b["term"].to_pylist(), b["df"].to_pylist()):
            if t == "\x00__docs__":
                n_docs += int(d)
            else:
                out[t] = out.get(t, 0) + int(d)
    return out, n_docs
