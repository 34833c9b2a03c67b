"""OBO parser, dict merge, and analysis-operator tests."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest

import ray.data as rd

OBO_SAMPLE = """format-version: 1.2
ontology: hp

[Term]
id: HP:0000001
name: All
def: "The root of all terms." [HP:curators]

[Term]
id: HP:0000002
name: Abnormality of body height
synonym: "Height abnormality" EXACT []
synonym: "Stature issue" RELATED []
xref: UMLS:C4025901
xref: SNOMEDCT_US:12345
is_a: HP:0000001 ! All

[Term]
id: HP:0000003
name: Old term
is_obsolete: true
is_a: HP:0000002

[Typedef]
id: part_of
name: part of
"""


class TestOboParser:
    def test_counts(self):
        from omop2obo_ray.sources.obo import parse_obo

        out = parse_obo(OBO_SAMPLE, "hp")
        c = out["concepts"]
        assert len(c[c["kind"] == "label"]) == 3
        assert len(c[c["kind"] == "synonym"]) == 2
        assert len(c[c["kind"] == "definition"]) == 1
        assert len(out["dbxrefs"]) == 2
        assert len(out["ancestors"]) == 2

    def test_values_lowercased_and_typed(self):
        from omop2obo_ray.sources.obo import parse_obo

        c = parse_obo(OBO_SAMPLE, "hp")["concepts"]
        lab = c[(c["kind"] == "label") & (c["uri"].str.endswith("HP_0000002"))]
        assert lab.iloc[0]["value"] == "abnormality of body height"
        syn = c[c["kind"] == "synonym"].set_index("value")
        assert syn.loc["height abnormality", "value_type"] == "hasExactSynonym"
        assert syn.loc["stature issue", "value_type"] == "hasRelatedSynonym"

    def test_obsolete_flag(self):
        from omop2obo_ray.sources.obo import parse_obo

        c = parse_obo(OBO_SAMPLE, "hp")["concepts"]
        dead = c[c["uri"].str.endswith("HP_0000003")]
        assert dead["deprecated"].all()

    def test_feeds_lexicon_build(self):
        from omop2obo_ray.sources.obo import parse_obo
        from omop2obo_ray.state.lexicon import build_lexicon

        out = parse_obo(OBO_SAMPLE, "hp")
        lex = build_lexicon(
            concepts=out["concepts"], dbxrefs=out["dbxrefs"],
            aliases=pd.DataFrame(columns=["cui", "lang", "sab", "code", "surface"]),
            semtypes=pd.DataFrame(columns=["cui", "sty"]),
            ancestors=out["ancestors"],
            vocab_map=pd.DataFrame([("umls", ["UMLS"])],
                                   columns=["primary_abbreviation", "abbreviations"]),
            ontologies=("hp",),
        )
        assert "height abnormality" in lex.surface_links
        # obsolete term's label maps to its live ancestors
        links = lex.surface_links["old term"]
        assert {l[2] for l in links} == {"HP_0000001", "HP_0000002"}


def test_merge_dictionaries_last_wins():
    from omop2obo_ray.functions.dicts import merge_dictionaries

    d = {
        "hp": {"label": {"pain": "HP_1", "ache": "HP_2"}},
        "mondo": {"label": {"pain": "MONDO_9"}},
    }
    merged = merge_dictionaries(d, "label")
    assert merged["pain"] == "MONDO_9" and merged["ache"] == "HP_2"
    rev = merge_dictionaries(d, "label", reverse=True)
    assert rev["HP_2"] == "ache"


def test_ontology_metadata_counts(ray_session, fixture_frames):
    from omop2obo_ray.pipelines.analysis import ontology_metadata_counts

    out = ontology_metadata_counts(rd.from_pandas(fixture_frames["concepts"]))
    assert set(out["ontology"]) == {"hp", "mondo"}
    raw = fixture_frames["concepts"]
    want = len(raw[(raw["ontology"] == "hp") & (raw["kind"] == "label")])
    assert int(out.set_index("ontology").loc["hp", "label"]) == want


def test_chi_square_known_value():
    from omop2obo_ray.pipelines.analysis import chi_square

    # classic 2x2: [[10, 20], [20, 10]] → chi2 = 6.6667, dof 1
    stat, dof, p = chi_square(np.array([[10, 20], [20, 10]]))
    assert stat == pytest.approx(20 / 3, rel=1e-9)
    assert dof == 1
    assert p == pytest.approx(0.00983, abs=2e-3)  # exact ~0.009823

    stat0, dof0, p0 = chi_square(np.array([[5, 5], [5, 5]]))
    assert stat0 == 0 and p0 > 0.9


def test_category_contingency(ray_session, engine_triples):
    from omop2obo_ray.pipelines.analysis import category_contingency

    ct = category_contingency(rd.from_pandas(engine_triples))
    assert "hp" in ct.columns and "mondo" in ct.columns
    assert ct.drop(columns="pred").to_numpy().sum() == len(engine_triples)


def test_posthoc_chi_square_pairwise():
    import numpy as np
    import pandas as pd

    from omop2obo_ray.pipelines.analysis import posthoc_chi_square

    # three groups: A and B share a distribution, C differs sharply
    tbl = pd.DataFrame(
        [[50, 50], [48, 52], [95, 5]],
        index=["A", "B", "C"], columns=["x", "y"])
    res = posthoc_chi_square(tbl)
    assert res["comparison"].tolist() == ["A-B", "A-C", "B-C"]
    r = res.set_index("comparison")
    assert not r.loc["A-B", "reject_h0"]
    assert r.loc["A-C", "reject_h0"] and r.loc["B-C", "reject_h0"]
    # corrected p-values are >= originals and monotone under BH
    assert (res["corrected_pvalue"] >= res["original_pvalue"] - 1e-12).all()
    # bonferroni is at least as conservative as BH
    bon = posthoc_chi_square(tbl, correction="bonferroni")
    assert (bon["corrected_pvalue"] >= res["corrected_pvalue"] - 1e-12).all()


def test_min_max_scale():
    from omop2obo_ray.pipelines.analysis import min_max_scale

    out = min_max_scale([[1.0, 2.0, 3.0], [5.0, 5.0], [0.0, 10.0]])
    assert out[0] == [0.0, 0.5, 1.0]
    assert out[1] == [0.0, 0.0]  # constant rows scale to zero
    assert out[2] == [0.0, 1.0]
