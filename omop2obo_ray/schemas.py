"""Explicit pyarrow schemas for every logical table.

The reference is effectively monotyped (everything ``str`` after load,
clinical_concept_annotator.py:97). We use fixed, typed Arrow schemas with
``list<string>`` for multi-valued fields, ``float64`` for scores and
``timestamp[us]`` / ``large_binary`` for the web-page payload (SURVEY §1.2).
"""

from __future__ import annotations

import pyarrow as pa

# ---- primary input (input_hint shape, exactly) ----
PAGES = pa.schema(
    [
        pa.field("url", pa.string()),
        pa.field("warc_ts", pa.timestamp("us")),
        pa.field("html", pa.large_binary()),
        pa.field("text", pa.large_string()),
        pa.field("lang", pa.string()),
    ]
)

# ---- lexicon dimension tables (FIXTURES.md §2-7) ----
CONCEPTS = pa.schema(
    [
        pa.field("ontology", pa.string()),
        pa.field("uri", pa.string()),
        pa.field("kind", pa.string()),  # label | synonym | definition
        pa.field("value", pa.string()),
        pa.field("value_type", pa.string()),
        pa.field("deprecated", pa.bool_()),
    ]
)

DBXREFS = pa.schema(
    [
        pa.field("ontology", pa.string()),
        pa.field("uri", pa.string()),
        pa.field("code", pa.string()),  # raw, pre-normalization
        pa.field("xref_type", pa.string()),  # DbXref | ExactMatch
    ]
)

ALIASES = pa.schema(  # ≈ MRCONSO (clinical_concept_annotator.py:158-169)
    [
        pa.field("cui", pa.string()),
        pa.field("lang", pa.string()),
        pa.field("sab", pa.string()),
        pa.field("code", pa.string()),
        pa.field("surface", pa.string()),
    ]
)

SEMTYPES = pa.schema(  # ≈ MRSTY (clinical_concept_annotator.py:182-185)
    [pa.field("cui", pa.string()), pa.field("sty", pa.string())]
)

ANCESTORS = pa.schema(  # DAG edges; closure computed by the engine
    [pa.field("child_uri", pa.string()), pa.field("parent_uri", pa.string())]
)

VOCAB_MAP = pa.schema(  # ≈ source_code_vocab_map.csv
    [
        pa.field("primary_abbreviation", pa.string()),
        pa.field("abbreviations", pa.list_(pa.string())),
    ]
)

# ---- long link-result schema (the semantic core; the reference's wide
#      per-ontology column fan-out is a presentation detail — SURVEY §1.2) ----
LINKS = pa.schema(
    [
        pa.field("url", pa.string()),
        pa.field("surface", pa.string()),
        pa.field("level", pa.string()),  # CONCEPT | ANCESTOR
        pa.field("ontology", pa.string()),
        pa.field("uri", pa.string()),  # HP_0000001 short form
        pa.field("label", pa.string()),
        pa.field("tier", pa.string()),  # str | dbxref | umls | ancestor | sim
        pa.field("evidence", pa.string()),
        pa.field("score", pa.float64()),  # null except tier=sim
    ]
)

# ---- output triples ----
TRIPLES = pa.schema(
    [
        pa.field("subj", pa.string()),
        pa.field("pred", pa.string()),  # mapping category (data_utils.py:518-548)
        pa.field("obj", pa.string()),
        pa.field("ontology", pa.string()),
        pa.field("evidence", pa.string()),
        pa.field("subject_hash", pa.uint64()),
        pa.field("subject_bucket", pa.int32()),
    ]
)

GOLD_TRIPLES = pa.schema(
    [
        pa.field("subj", pa.string()),
        pa.field("pred", pa.string()),
        pa.field("obj", pa.string()),
        pa.field("tier", pa.string()),
        pa.field("evidence", pa.string()),
    ]
)
