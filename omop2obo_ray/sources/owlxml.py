"""OWL/XML (RDF/XML) ontology ingest — the reference's native format.

Streaming ``xml.etree.iterparse`` subset parser for the RDF/XML
serialization OBO ontologies publish (``*_without_imports.owl``),
reproducing the extraction semantics of the reference's rdflib queries
(``omop2obo/utils/ontology_utils.py:29-176,179-198`` and their
assembly in ``ontology_explorer.py:49-72``) without rdflib or a JVM:

  - classes: subjects typed ``owl:Class`` whose URI contains the
    ontology id, case-insensitive (``gets_ontology_classes``, :46)
  - deprecated: subjects with ``owl:deprecated 'true'`` excluded from
    the filtered class set (``gets_deprecated_ontology_classes``,
    :196-198; ``ontology_explorer.py:60``)
  - labels: any predicate whose URI contains ``label`` → lowercased
    value (``gets_ontology_class_labels``, :71)
  - definitions: predicate containing ``IAO_0000115`` (:97)
  - synonyms: predicate containing ``synonym`` (case-insensitive);
    synonym type = predicate fragment (``gets_ontology_class_synonyms``,
    :124-127)
  - dbxrefs: predicate containing ``hasdbxref`` → type ``DbXref``;
    predicate containing ``exactmatch`` → type ``ExactMatch``
    (``gets_ontology_class_dbxrefs``, :162-175)
  - anonymous subClassOf restrictions (``owl:Restriction`` with
    ``owl:onProperty`` + ``owl:someValuesFrom``/``allValuesFrom``) →
    typed (class, property, quantifier, filler) relations, kept apart
    from the is-a ancestor edges (the reference's is-a walk ignores
    restriction parents; the relation itself is what rdflib users
    extract for part-of style axioms)

Memory stays bounded: elements are cleared as soon as each top-level
subject is consumed, so a multi-GB ``ncbitaxon.owl``-sized file streams
through at O(result) memory (the reference's rdflib load of the same
file takes "several minutes" and holds the whole graph —
``ontology_explorer.py:94-95``).
"""

from __future__ import annotations

import xml.etree.ElementTree as ET

import pandas as pd

RDF_NS = "http://www.w3.org/1999/02/22-rdf-syntax-ns#"
OWL_NS = "http://www.w3.org/2002/07/owl#"
_ABOUT = f"{{{RDF_NS}}}about"
_RESOURCE = f"{{{RDF_NS}}}resource"
_TYPE_TAG = f"{{{RDF_NS}}}type"
_OWL_CLASS = f"{OWL_NS}Class"


def _pred_uri(tag: str) -> str:
    """``{namespace}local`` element tag → full predicate URI."""
    if tag.startswith("{"):
        ns, local = tag[1:].split("}", 1)
        return ns + local
    return tag


def _obj_value(el: ET.Element) -> str | None:
    """Predicate object: literal text, or the rdf:resource URI."""
    res = el.get(_RESOURCE)
    if res is not None:
        return res
    if el.text is not None and el.text.strip():
        return el.text.strip()
    return None


def parse_owl_xml(path: str, ont_id: str) -> dict:
    """Parse an RDF/XML ontology → the reference's explorer dict shape:
    ``{'label', 'definition', 'dbxref', 'dbxref_type', 'synonym',
    'synonym_type', 'ancestors', 'deprecated'}`` (first six exactly as
    ``OntologyInfoExtractor.get_ontology_information`` builds them;
    ``ancestors``/``deprecated`` are extras this engine needs for its
    ancestor tier)."""
    ont_lc = ont_id.lower()
    # per-class raw capture: (uri, deprecated, rows); rows are
    # (kind, predicate_uri, value)
    per_class: list[tuple[str, bool, list[tuple[str, str, str]]]] = []

    depth = 0
    for event, elem in ET.iterparse(path, events=("start", "end")):
        if event == "start":
            depth += 1
            continue
        depth -= 1
        if depth != 1:
            # not a direct child of rdf:RDF: nested ends are consumed
            # when their top-level subject closes
            continue
        uri = elem.get(_ABOUT)
        tag_uri = _pred_uri(elem.tag)
        is_class = tag_uri == _OWL_CLASS or any(
            c.tag == _TYPE_TAG and c.get(_RESOURCE) == _OWL_CLASS
            for c in elem
        )
        if uri is None or not is_class or ont_lc not in uri.lower():
            elem.clear()  # axioms / properties / foreign classes
            continue
        deprecated = False
        rows: list[tuple[str, str, str]] = []
        for child in elem:
            pred = _pred_uri(child.tag)
            pred_lc = pred.lower()
            val = _obj_value(child)
            if val is None:
                # anonymous subClassOf parents: an owl:Restriction
                # (onProperty P, someValuesFrom/allValuesFrom C) —
                # captured as a typed relation, NOT an is-a ancestor
                # (rdflib exposes the same triple shape; the reference's
                # is-a walk ignores restrictions too)
                if pred_lc.endswith("subclassof"):
                    for restr in child.iter(f"{{{OWL_NS}}}Restriction"):
                        prop = filler = quant = None
                        for part in restr:
                            p_lc = _pred_uri(part.tag).lower()
                            if p_lc.endswith("#onproperty"):
                                prop = part.get(_RESOURCE)
                            elif p_lc.endswith("valuesfrom") and part.get(_RESOURCE):
                                quant = _pred_uri(part.tag).split("#")[-1]
                                filler = part.get(_RESOURCE)
                        if prop and filler:
                            rows.append(("restriction", prop,
                                         f"{quant}|{filler}"))
                continue
            if pred_lc.endswith("#deprecated") and val.lower() == "true":
                deprecated = True
            elif "label" in pred_lc:
                rows.append(("label", pred, val))
            elif "synonym" in pred_lc:
                rows.append(("synonym", pred, val))
            elif "hasdbxref" in pred_lc:
                rows.append(("dbxref", pred, val))
            elif "exactmatch" in pred_lc:
                rows.append(("exactmatch", pred, val))
            elif "iao_0000115" in pred_lc:
                rows.append(("definition", pred, val))
            elif pred_lc.endswith("subclassof") and child.get(_RESOURCE):
                # named-class parents → the is-a ancestor tier
                rows.append(("subclassof", pred, val))
        per_class.append((uri, deprecated, rows))
        elem.clear()

    # reference filter: non-deprecated classes only
    # (ontology_explorer.py:60)
    out = {"label": {}, "definition": {}, "dbxref": {}, "dbxref_type": {},
           "synonym": {}, "synonym_type": {}, "ancestors": [],
           "restrictions": [], "deprecated": set()}
    for uri, dep, rows in per_class:
        if dep:
            out["deprecated"].add(uri)
        for kind, pred, val in rows:
            if kind == "subclassof":
                out["ancestors"].append((uri, val))
            elif kind == "restriction":
                quant, filler = val.split("|", 1)
                out["restrictions"].append((uri, pred, quant, filler))
        if dep:
            continue
        for kind, pred, val in rows:
            v = val.lower()
            if kind == "label":
                out["label"][v] = uri
            elif kind == "definition":
                out["definition"][v] = uri
            elif kind == "synonym":
                out["synonym"][v] = uri
                out["synonym_type"][v] = pred.split("#")[-1]
            elif kind == "dbxref":
                out["dbxref"][v] = uri
                out["dbxref_type"][v] = "DbXref"
            elif kind == "exactmatch":
                out["dbxref"][v] = uri
                out["dbxref_type"][v] = "ExactMatch"
    return out


def owl_to_tables(path: str, ontology: str, ont_id: str | None = None
                  ) -> dict[str, pd.DataFrame]:
    """OWL/XML file → the engine's stacked long dimension tables — the
    same shape ``parse_obo`` produces, so a user holding only ``.owl``
    releases feeds the identical lexicon-build path (SURVEY §2.1 S6).

    Unlike the explorer dict (label-keyed, last-wins, per the
    reference), the tables keep one row per (uri, value) including
    deprecated classes with a flag — the engine's ancestor-fallback
    tier needs deprecated classes (data_utils.py:438-449)."""
    ont_lc = (ont_id or ontology).lower()
    explorer = parse_owl_xml(path, ont_lc)
    # re-walk the captured dicts into long rows
    concepts, dbxrefs, ancestors = [], [], []
    dep = explorer["deprecated"]
    for val, uri in explorer["label"].items():
        concepts.append((ontology, uri, "label", val, "rdfs:label", False))
    for val, uri in explorer["synonym"].items():
        concepts.append((ontology, uri, "synonym", val,
                         explorer["synonym_type"][val], False))
    for val, uri in explorer["definition"].items():
        concepts.append((ontology, uri, "definition", val, "IAO_0000115", False))
    for val, uri in explorer["dbxref"].items():
        dbxrefs.append((ontology, uri, val, explorer["dbxref_type"][val]))
    for child, parent in explorer["ancestors"]:
        ancestors.append((child, parent))
    for uri in sorted(dep):
        concepts.append((ontology, uri, "deprecated", "", "owl:deprecated", True))
    restrictions = [(ontology, u, p, q, f)
                    for u, p, q, f in explorer["restrictions"]]
    return {
        "concepts": pd.DataFrame(
            concepts,
            columns=["ontology", "uri", "kind", "value", "value_type", "deprecated"],
        ),
        "dbxrefs": pd.DataFrame(
            dbxrefs, columns=["ontology", "uri", "code", "xref_type"]
        ),
        "ancestors": pd.DataFrame(ancestors, columns=["child_uri", "parent_uri"]),
        "restrictions": pd.DataFrame(
            restrictions,
            columns=["ontology", "uri", "property_uri", "quantifier",
                     "filler_uri"],
        ),
    }
