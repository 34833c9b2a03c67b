"""Lexicon-build tests: closure, double merge, filters."""

from __future__ import annotations

import pandas as pd

from omop2obo_ray.state.lexicon import build_lexicon, compute_closure


def _dims(**over):
    base = dict(
        concepts=pd.DataFrame(
            [
                ("hp", "http://purl.obolibrary.org/obo/HP_0000001", "label", "alpha root", "rdfs:label", False),
                ("hp", "http://purl.obolibrary.org/obo/HP_0000002", "label", "beta child", "rdfs:label", False),
                ("hp", "http://purl.obolibrary.org/obo/HP_0000002", "synonym", "beta syn", "hasExactSynonym", False),
                ("hp", "http://purl.obolibrary.org/obo/HP_0000003", "label", "gamma dead", "rdfs:label", True),
            ],
            columns=["ontology", "uri", "kind", "value", "value_type", "deprecated"],
        ),
        dbxrefs=pd.DataFrame(
            [
                ("hp", "http://purl.obolibrary.org/obo/HP_0000001", "SNOMEDCT_US:111", "DbXref"),
                ("hp", "http://purl.obolibrary.org/obo/HP_0000002", "umls:C0000009", "DbXref"),
            ],
            columns=["ontology", "uri", "code", "xref_type"],
        ),
        aliases=pd.DataFrame(
            [
                # single merge: code 111 → HP_0000001
                ("C0000001", "ENG", "SNOMEDCT_US", "111", "alias one"),
                # double merge: RXNORM:222 shares CUI with SNOMEDCT 111
                ("C0000001", "ENG", "RXNORM", "222", "alias sibling"),
                # ananke: CUI appears as dbxref umls:C0000009
                ("C0000009", "ENG", "SNOMEDCT_US", "333", "alias umls"),
                # filtered rows
                ("C0000001", "CZE", "SNOMEDCT_US", "111", "cizi"),
                ("C0000001", "ENG", "SNOMEDCT_US", "NOCODE", "nocode"),
            ],
            columns=["cui", "lang", "sab", "code", "surface"],
        ),
        semtypes=pd.DataFrame([("C0000001", "Finding")], columns=["cui", "sty"]),
        ancestors=pd.DataFrame(
            [
                ("http://purl.obolibrary.org/obo/HP_0000002", "http://purl.obolibrary.org/obo/HP_0000001"),
                ("http://purl.obolibrary.org/obo/HP_0000003", "http://purl.obolibrary.org/obo/HP_0000002"),
            ],
            columns=["child_uri", "parent_uri"],
        ),
        vocab_map=pd.DataFrame(
            [("snomed", ["SNOMEDCT_US"]), ("rxnorm", ["RXNORM"]), ("umls", ["UMLS", "umls"])],
            columns=["primary_abbreviation", "abbreviations"],
        ),
    )
    base.update(over)
    return base


def test_closure_transitive():
    edges = pd.DataFrame(
        [("c", "b"), ("b", "a"), ("c", "x")], columns=["child_uri", "parent_uri"]
    )
    cl = compute_closure(edges)
    assert set(cl["c"]) == {"a", "b", "x"}
    assert set(cl["b"]) == {"a"}


def test_exact_surfaces():
    lex = build_lexicon(**_dims(), ontologies=("hp",))
    assert any(l[2] == "HP_0000001" and l[3] == "str" for l in lex.surface_links["alpha root"])
    assert any(l[3] == "str" for l in lex.surface_links["beta syn"])


def test_single_merge_dbxref():
    lex = build_lexicon(**_dims(), ontologies=("hp",))
    links = lex.surface_links["alias one"]
    assert ("CONCEPT", "hp", "HP_0000001", "dbxref", "DBXREF_snomed:111") in links


def test_double_merge_expansion():
    """The umls_expand double merge reaches sibling-vocab surfaces
    (reference: 66-row double vs 3-row single expansion,
    tests/test_clinical_concept_annotator.py:241,260)."""
    lex = build_lexicon(**_dims(), ontologies=("hp",), umls_expand=True)
    links = lex.surface_links["alias sibling"]
    assert any(l[3] == "umls" and l[2] == "HP_0000001" for l in links)
    lex_single = build_lexicon(**_dims(), ontologies=("hp",), umls_expand=False)
    assert "alias sibling" not in lex_single.surface_links


def test_ananke_umls_cui_dbxref():
    lex = build_lexicon(**_dims(), ontologies=("hp",))
    links = lex.surface_links["alias umls"]
    assert any(l[3] == "umls" and l[2] == "HP_0000002" for l in links)


def test_language_and_nocode_filters():
    lex = build_lexicon(**_dims(), ontologies=("hp",))
    assert "cizi" not in lex.surface_links
    assert "nocode" not in lex.surface_links


def test_semtypes_attached():
    """J3: MRSTY semantic types keyed by CUI land in the lexicon."""
    lex = build_lexicon(**_dims(), ontologies=("hp",))
    assert lex.cui_semtypes["C0000001"] == ("Finding",)


def test_prebuilt_automaton_shared():
    lex = build_lexicon(**_dims(), ontologies=("hp",))
    assert lex.automaton is not None
    hits = lex.automaton.longest_nonoverlapping("has alpha root here")
    assert hits, "prebuilt automaton must find lexicon surfaces"


def test_deprecated_maps_to_ancestors():
    lex = build_lexicon(**_dims(), ontologies=("hp",))
    links = lex.surface_links["gamma dead"]
    # HP_0000003 (dead) → ancestors HP_0000002, HP_0000001 at ANCESTOR level
    assert all(l[0] == "ANCESTOR" for l in links)
    assert {l[2] for l in links} == {"HP_0000001", "HP_0000002"}
    # the dead class itself is never a target
    assert not any(l[2] == "HP_0000003" for links in lex.surface_links.values() for l in links)
