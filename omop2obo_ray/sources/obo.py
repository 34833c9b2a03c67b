"""Offline ontology ingest: OBO flat-file parser → lexicon dim tables.

The reference parses OWL/XML with rdflib + OWLTools (S5/S6,
ontology_explorer.py:95, ontology_downloader.py:115); neither a JVM nor
rdflib exists in this environment, so the engine ingests the OBO flat
format (the same ontologies publish .obo releases) with a small pure-
Python parser. Output is the engine's stacked long dimension tables
(concepts / dbxrefs / ancestors) — the replacement for the reference's
nested dict + pickle (ontology_explorer.py:43-72, :100-101).

Extraction semantics mirror ontology_utils.py:
  - labels (``name:``), exact/related/broad/narrow synonyms
    (``synonym: "..." EXACT []``), definitions (``def:``)
    → rows of kind label/synonym/definition, values lowercased
    (the reference lowercases every key, ontology_explorer.py:43-72)
  - ``xref:`` lines → dbxref rows (raw, pre-normalization)
  - ``is_a:`` lines → ancestor DAG edges
  - ``is_obsolete: true`` → deprecated flag
    (filter semantics per ontology_utils.py:179-198)
"""

from __future__ import annotations

import re

import pandas as pd

OBO_URI = "http://purl.obolibrary.org/obo/"

_SYN_RE = re.compile(r'^synonym:\s+"(.*)"\s+(EXACT|RELATED|BROAD|NARROW)\b')
_DEF_RE = re.compile(r'^def:\s+"(.*)"')

_SYN_TYPE = {
    "EXACT": "hasExactSynonym",
    "RELATED": "hasRelatedSynonym",
    "BROAD": "hasBroadSynonym",
    "NARROW": "hasNarrowSynonym",
}


def parse_obo(text: str, ontology: str) -> dict[str, pd.DataFrame]:
    """Parse OBO flat-file text → {'concepts', 'dbxrefs', 'ancestors'}."""
    concepts, dbxrefs, ancestors = [], [], []
    cur_id: str | None = None
    cur: dict | None = None
    in_term = False

    def flush():
        nonlocal cur
        if cur is None or cur.get("id") is None:
            cur = None
            return
        uri = OBO_URI + cur["id"].replace(":", "_")
        dep = cur.get("obsolete", False)
        if cur.get("name"):
            concepts.append((ontology, uri, "label", cur["name"].lower(),
                             "rdfs:label", dep))
        for syn, stype in cur.get("synonyms", []):
            concepts.append((ontology, uri, "synonym", syn.lower(),
                             _SYN_TYPE[stype], dep))
        if cur.get("definition"):
            concepts.append((ontology, uri, "definition",
                             cur["definition"].lower(), "IAO_0000115", dep))
        for x in cur.get("xrefs", []):
            dbxrefs.append((ontology, uri, x, "DbXref"))
        for parent in cur.get("is_a", []):
            ancestors.append((uri, OBO_URI + parent.replace(":", "_")))
        cur = None

    for raw in text.splitlines():
        line = raw.strip()
        if line == "[Term]":
            flush()
            in_term = True
            cur = {"synonyms": [], "xrefs": [], "is_a": []}
            continue
        if line.startswith("[") and line.endswith("]"):  # [Typedef] etc.
            flush()
            in_term = False
            continue
        if not in_term or cur is None or not line:
            continue
        if line.startswith("id: "):
            cur["id"] = line[4:].strip()
        elif line.startswith("name: "):
            cur["name"] = line[6:].strip()
        elif line.startswith("is_obsolete: true"):
            cur["obsolete"] = True
        elif line.startswith("synonym: "):
            m = _SYN_RE.match(line)
            if m:
                cur["synonyms"].append((m.group(1), m.group(2)))
        elif line.startswith("def: "):
            m = _DEF_RE.match(line)
            if m:
                cur["definition"] = m.group(1)
        elif line.startswith("xref: "):
            cur["xrefs"].append(line[6:].split(" ")[0].strip())
        elif line.startswith("is_a: "):
            cur["is_a"].append(line[6:].split("!")[0].strip())
    flush()

    return {
        "concepts": pd.DataFrame(
            concepts,
            columns=["ontology", "uri", "kind", "value", "value_type", "deprecated"],
        ),
        "dbxrefs": pd.DataFrame(
            dbxrefs, columns=["ontology", "uri", "code", "xref_type"]
        ),
        "ancestors": pd.DataFrame(ancestors, columns=["child_uri", "parent_uri"]),
    }


def parse_obo_file(path: str, ontology: str) -> dict[str, pd.DataFrame]:
    with open(path, encoding="utf-8") as f:
        return parse_obo(f.read(), ontology)
