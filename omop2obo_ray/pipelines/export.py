"""Export / release-formatting jobs (SURVEY §2.1 S8-S9, §3.3).

The reference's N3C conversion (applications/N3C/
n3c_mapping_conversion.py:327-406) reads the released mapping table,
filters unmapped rows, dictifies per concept and writes Atlas-style
JSON plus flat CSVs. Here that is one ``map_batches`` formatting pass +
Ray-native ``write_json``/``write_csv`` sinks over the triples table.
"""

from __future__ import annotations

import json

import pandas as pd
from ray.data import Dataset


def filter_mapped(triples: Dataset) -> Dataset:
    """Drop unmapped rows (``MAPPING_CATEGORY != 'Unmapped'`` filter,
    n3c_mapping_conversion.py:367). Our engine never emits unmapped
    triples, so this guards externally-loaded tables."""
    import pyarrow.compute as pc

    return triples.map_batches(
        lambda b: b.filter(pc.invert(pc.equal(b["pred"], "Unmapped"))),
        batch_format="pyarrow", batch_size=None,
    )


def to_concept_sets(triples: Dataset) -> Dataset:
    """Group triples per subject into an Atlas-style concept-set record
    (n3c_mapping_conversion.py:46-73): one row per subject with the
    mapped class list, categories and a JSON expression payload.

    Assumes page-local triples (one subject per block region) like the
    main pipeline; falls back to correctness via final dedup."""

    def per_batch(df: pd.DataFrame) -> pd.DataFrame:
        rows = []
        for subj, g in df.groupby("subj", sort=True):
            items = [
                {"concept": obj, "ontology": ont, "category": pred}
                for pred, obj, ont in zip(g["pred"], g["obj"], g["ontology"])
            ]
            rows.append(
                {
                    "subj": subj,
                    "n_concepts": len(items),
                    "categories": " | ".join(sorted(set(g["pred"]))),
                    "expression": json.dumps({"items": items}, sort_keys=True),
                }
            )
        return pd.DataFrame(rows, columns=["subj", "n_concepts", "categories",
                                           "expression"])

    return triples.map_batches(per_batch, batch_format="pandas", batch_size=None)


def export_release(triples: Dataset, out_dir: str) -> None:
    """Write the release artifacts: flat CSV of triples + JSON concept
    sets (mirrors the three-Enclave-CSV + per-concept-JSON layout,
    n3c_mapping_conversion.py:116-324)."""
    mapped = filter_mapped(triples)
    mapped.select_columns(["subj", "pred", "obj", "ontology", "evidence"]) \
        .write_csv(f"{out_dir}/triples_csv")
    to_concept_sets(mapped).write_json(f"{out_dir}/concept_sets_json")
