"""OWL/XML ingest tests: reference extraction semantics
(ontology_utils.py:29-176,179-198) on a synthetic RDF/XML ontology,
plus table-shape parity with the OBO flat-format path.

The reference's own .owl test fixture (tests/data/ontologies/
so_without_imports.owl, expected counts 2237/391/3819 per
tests/test_ontology_explorer.py:111-116) ships EMPTY in this mirror,
so the counts here come from a planted fixture with every extraction
rule exercised: deprecated exclusion, namespace filtering, synonym
typing, DbXref + ExactMatch union, rdf:Description-typed classes,
anonymous (restriction) parents ignored."""

from __future__ import annotations

import textwrap

import pytest

OWL_DOC = textwrap.dedent("""\
<?xml version="1.0"?>
<rdf:RDF xmlns:rdf="http://www.w3.org/1999/02/22-rdf-syntax-ns#"
         xmlns:rdfs="http://www.w3.org/2000/01/rdf-schema#"
         xmlns:owl="http://www.w3.org/2002/07/owl#"
         xmlns:oboInOwl="http://www.geneontology.org/formats/oboInOwl#"
         xmlns:obo="http://purl.obolibrary.org/obo/">
  <owl:Class rdf:about="http://purl.obolibrary.org/obo/SO_0000001">
    <rdfs:label>Region</rdfs:label>
    <obo:IAO_0000115>A sequence feature region.</obo:IAO_0000115>
    <oboInOwl:hasExactSynonym>sequence region</oboInOwl:hasExactSynonym>
    <oboInOwl:hasRelatedSynonym>span</oboInOwl:hasRelatedSynonym>
    <oboInOwl:hasDbXref>LOINC:LA1</oboInOwl:hasDbXref>
    <oboInOwl:hasDbXref>SNOMED:42</oboInOwl:hasDbXref>
    <rdfs:subClassOf rdf:resource="http://purl.obolibrary.org/obo/SO_0000000"/>
    <rdfs:subClassOf>
      <owl:Restriction>
        <owl:onProperty rdf:resource="http://purl.obolibrary.org/obo/BFO_0000050"/>
        <owl:someValuesFrom rdf:resource="http://purl.obolibrary.org/obo/SO_0000999"/>
      </owl:Restriction>
    </rdfs:subClassOf>
  </owl:Class>
  <owl:Class rdf:about="http://purl.obolibrary.org/obo/SO_0000000">
    <rdfs:label>Sequence Root</rdfs:label>
  </owl:Class>
  <rdf:Description rdf:about="http://purl.obolibrary.org/obo/SO_0000002">
    <rdf:type rdf:resource="http://www.w3.org/2002/07/owl#Class"/>
    <rdfs:label>Typed Via Description</rdfs:label>
    <owl:equivalentClass rdf:resource="http://example.org/skos#exactMatch-target"/>
    <oboInOwl:exactMatch rdf:resource="http://example.org/umls/C12345"/>
  </rdf:Description>
  <owl:Class rdf:about="http://purl.obolibrary.org/obo/SO_0000003">
    <rdfs:label>Old Feature</rdfs:label>
    <oboInOwl:hasExactSynonym>obsolete span</oboInOwl:hasExactSynonym>
    <oboInOwl:hasDbXref>DEAD:1</oboInOwl:hasDbXref>
    <owl:deprecated rdf:datatype="http://www.w3.org/2001/XMLSchema#boolean">true</owl:deprecated>
  </owl:Class>
  <owl:Class rdf:about="http://purl.obolibrary.org/obo/GO_0000004">
    <rdfs:label>Foreign Namespace</rdfs:label>
  </owl:Class>
  <owl:ObjectProperty rdf:about="http://purl.obolibrary.org/obo/BFO_0000050">
    <rdfs:label>part of</rdfs:label>
  </owl:ObjectProperty>
  <owl:Axiom>
    <owl:annotatedSource rdf:resource="http://purl.obolibrary.org/obo/SO_0000001"/>
    <owl:annotatedProperty rdf:resource="http://www.geneontology.org/formats/oboInOwl#hasDbXref"/>
    <owl:annotatedTarget>LOINC:LA1</owl:annotatedTarget>
  </owl:Axiom>
</rdf:RDF>
""")


@pytest.fixture(scope="module")
def owl_path(tmp_path_factory):
    p = tmp_path_factory.mktemp("owl") / "so_fixture.owl"
    p.write_text(OWL_DOC)
    return str(p)


def test_explorer_dict_counts(owl_path):
    from omop2obo_ray.sources.owlxml import parse_owl_xml

    res = parse_owl_xml(owl_path, "so")
    # 3 active classes with labels (deprecated + foreign excluded)
    assert res["label"] == {
        "region": "http://purl.obolibrary.org/obo/SO_0000001",
        "sequence root": "http://purl.obolibrary.org/obo/SO_0000000",
        "typed via description": "http://purl.obolibrary.org/obo/SO_0000002",
    }
    assert res["definition"] == {
        "a sequence feature region.": "http://purl.obolibrary.org/obo/SO_0000001"}
    # synonyms of the deprecated class are excluded
    assert res["synonym"] == {
        "sequence region": "http://purl.obolibrary.org/obo/SO_0000001",
        "span": "http://purl.obolibrary.org/obo/SO_0000001",
    }
    assert res["synonym_type"] == {
        "sequence region": "hasExactSynonym", "span": "hasRelatedSynonym"}
    # DbXref + ExactMatch union, lowercased keys (reference semantics)
    assert res["dbxref"] == {
        "loinc:la1": "http://purl.obolibrary.org/obo/SO_0000001",
        "snomed:42": "http://purl.obolibrary.org/obo/SO_0000001",
        "http://example.org/umls/c12345": "http://purl.obolibrary.org/obo/SO_0000002",
    }
    assert res["dbxref_type"]["loinc:la1"] == "DbXref"
    assert res["dbxref_type"]["http://example.org/umls/c12345"] == "ExactMatch"
    # named parent captured; anonymous restriction parent ignored
    assert res["ancestors"] == [
        ("http://purl.obolibrary.org/obo/SO_0000001",
         "http://purl.obolibrary.org/obo/SO_0000000")]
    assert res["deprecated"] == {"http://purl.obolibrary.org/obo/SO_0000003"}
    # anonymous restriction parent surfaces as a typed relation instead
    assert res["restrictions"] == [
        ("http://purl.obolibrary.org/obo/SO_0000001",
         "http://purl.obolibrary.org/obo/BFO_0000050",
         "someValuesFrom",
         "http://purl.obolibrary.org/obo/SO_0000999")]


def test_owl_tables_match_obo_shape(owl_path):
    """The OWL path must emit the same table schema as parse_obo, so
    both formats feed the identical lexicon build."""
    from omop2obo_ray.sources.obo import parse_obo
    from omop2obo_ray.sources.owlxml import owl_to_tables

    owl_tables = owl_to_tables(owl_path, "so")
    obo_text = textwrap.dedent("""\
        [Term]
        id: SO:0000001
        name: Region
        def: "A sequence feature region." []
        synonym: "sequence region" EXACT []
        synonym: "span" RELATED []
        xref: LOINC:LA1
        xref: SNOMED:42
        is_a: SO:0000000 ! Sequence Root

        [Term]
        id: SO:0000000
        name: Sequence Root
    """)
    obo_tables = parse_obo(obo_text, "so")
    assert list(owl_tables["concepts"].columns) == list(obo_tables["concepts"].columns)
    assert list(owl_tables["dbxrefs"].columns) == list(obo_tables["dbxrefs"].columns)
    assert list(owl_tables["ancestors"].columns) == list(obo_tables["ancestors"].columns)
    # label/synonym value parity for the shared classes
    def kinds(df, kind):
        return set(df[df["kind"] == kind]["value"])
    assert kinds(obo_tables["concepts"], "label") <= kinds(owl_tables["concepts"], "label")
    assert kinds(obo_tables["concepts"], "synonym") == {"sequence region", "span"}
    assert kinds(owl_tables["concepts"], "synonym") == {"sequence region", "span"}
    # deprecated class present in tables with flag (ancestor tier needs it)
    dep_rows = owl_tables["concepts"][owl_tables["concepts"]["deprecated"]]
    assert set(dep_rows["uri"]) == {"http://purl.obolibrary.org/obo/SO_0000003"}
    # restriction relations carried as their own table (part-of axioms)
    restr = owl_tables["restrictions"]
    assert list(restr.columns) == [
        "ontology", "uri", "property_uri", "quantifier", "filler_uri"]
    assert len(restr) == 1
    assert restr.iloc[0]["property_uri"].endswith("BFO_0000050")
    assert restr.iloc[0]["quantifier"] == "someValuesFrom"


def test_owl_lexicon_roundtrip(owl_path, tmp_path):
    """OWL-ingested tables flow through the standard lexicon build."""
    import pandas as pd

    from omop2obo_ray.sources.owlxml import owl_to_tables
    from omop2obo_ray.sources.readers import write_lexicon_tables
    from omop2obo_ray.state.lexicon import load_lexicon_from_dir

    t = owl_to_tables(owl_path, "so")
    empty = pd.DataFrame
    write_lexicon_tables(
        str(tmp_path), t["concepts"], t["dbxrefs"],
        empty({"cui": [], "lang": [], "sab": [], "code": [], "surface": []}).astype(str),
        empty({"cui": [], "sty": []}).astype(str),
        t["ancestors"],
        pd.DataFrame({"primary_abbreviation": pd.Series(dtype=str),
                      "abbreviations": pd.Series(dtype=object)}),
    )
    lex = load_lexicon_from_dir(str(tmp_path), ontologies=("so",))
    assert "region" in lex.surface_links
    links = lex.surface_links["region"]
    # lexicon shortens OBO URIs to local ids
    assert any(uri == "SO_0000001" for _lvl, _ont, uri, _tier, _ev in links)
