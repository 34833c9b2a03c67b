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


# ---------------------------------------------------------------------------
# N3C Enclave release layout (artifact-fidelity path)
# ---------------------------------------------------------------------------

# enclave defaults mirroring the reference's hard-coded parameters
# (n3c_mapping_conversion.py:342-356); created_at is caller-injected so
# runs stay deterministic
DEFAULT_ENCLAVE_PARAMS = {
    "assigned_informatician": "c91cf525-aa2e-4ad8-b6d0-f83122ee48b5",
    "assigned_sme": "c91cf525-aa2e-4ad8-b6d0-f83122ee48b5",
    "project_id": "RP-453C03",
    "status": "Under Construction", "stage": "Awaiting Editing",
    "n3c_reviewer": "c91cf525-aa2e-4ad8-b6d0-f83122ee48b5",
    "archived": "FALSE",
    "created_by": "c91cf525-aa2e-4ad8-b6d0-f83122ee48b5",
    "created_at": "1970-01-01T00:00:00.00Z",
    "source_application_version": "v2.0.0",
    "is_most_recent_version": "TRUE", "version": 2,
    "update_message": "Version 2",
    "intention_header": (
        "Mixed - This mapping was created using the OMOP2OBO mapping "
        "algorithm (https://github.com/callahantiff/OMOP2OBO).\n"
        "The Mapping Category and Evidence supporting the mappings are "
        "provided below, by OMOP concept:\n"),
    "intention": (
        "\n{}\n*******\nMapping Category: {}\n"
        "------------------------------------------------\n"
        "Mapping Provenance\n------------------\n{}"),
}

CODESET_ID_START = 900000000  # n3c_mapping_conversion.py:384


def triples_to_mapping_table(triples: Dataset) -> Dataset:
    """Bridge: engine triples → the reference's released-mapping row
    shape (one row per subject: CONCEPT_* identity columns + ' | '-
    joined ontology URI/label aggregates, the input
    creates_mapping_dictionary expects, n3c_mapping_conversion.py:46-75).
    Subjects (urls) stand in for OMOP concepts: CONCEPT_ID is the
    stable 31-bit subject hash, CONCEPT_CODE its decimal form."""
    from omop2obo_ray.functions.hashing import hash64_array

    def per_batch(df: pd.DataFrame) -> pd.DataFrame:
        rows = []
        for subj, g in df.groupby("subj", sort=True):
            cid = int(hash64_array([subj])[0]) & 0x7FFFFFFF
            rows.append({
                "CONCEPT_ID": cid,
                "CONCEPT_NAME": subj,
                "CONCEPT_CODE": str(cid),
                "CONCEPT_VOCAB": "URL",
                "MAPPING_CATEGORY": " | ".join(sorted(set(g["pred"]))),
                "MAPPING_EVIDENCE": " | ".join(sorted(set(g["evidence"]))),
                "ONTOLOGY_LOGIC": "AND" if len(set(g["obj"])) > 1 else "N/A",
                "ONTOLOGY_URI": " | ".join(sorted(set(g["obj"]))),
                "ONTOLOGY_LABEL": " | ".join(sorted(set(g["obj"]))),
            })
        return pd.DataFrame(rows, columns=[
            "CONCEPT_ID", "CONCEPT_NAME", "CONCEPT_CODE", "CONCEPT_VOCAB",
            "MAPPING_CATEGORY", "MAPPING_EVIDENCE", "ONTOLOGY_LOGIC",
            "ONTOLOGY_URI", "ONTOLOGY_LABEL"])

    return triples.map_batches(per_batch, batch_format="pandas", batch_size=None)


def _mapping_filename(concept_id, concept_name: str) -> str:
    """'{id}-{sanitized_name}.json' (n3c_mapping_conversion.py:64-65)."""
    return "{}-{}.json".format(
        concept_id,
        concept_name.lower().replace(" | ", "|").replace("/", "-").replace(" ", "_"))


def _atlas_expression(row: dict) -> dict:
    """Atlas concept-set expression for one mapping row
    (omop_concept_set_exp, n3c_mapping_conversion.py:77-114)."""
    return {
        "concept": {
            "CONCEPT_ID": int(row["CONCEPT_ID"]),
            "CONCEPT_NAME": row["CONCEPT_NAME"].title(),
            "STANDARD_CONCEPT": None,
            "STANDARD_CONCEPT_CAPTION": None,
            "CONCEPT_CODE": int(row["CONCEPT_CODE"]),
            "DOMAIN_ID": None,
            "VOCABULARY_ID": row["CONCEPT_VOCAB"],
        },
        "isExcluded": False,
        "includeDescendants": False,
        "includeMapped": True,
        "ONTOLOGY_CONCEPT_MAPPING_MEMBERS": {
            "identifiers": row["ONTOLOGY_URI"].lower().replace(" ", ""),
            "labels": row["ONTOLOGY_LABEL"],
        },
        "ONTOLOGY_CONCEPT_MAPPING_LOGIC": row["ONTOLOGY_LOGIC"],
        "MAPPING_CATEGORY": row["MAPPING_CATEGORY"],
        "MAPPING_EVIDENCE": row["MAPPING_EVIDENCE"],
    }


def load_or_assign_codeset_ids(out_dir: str, concept_ids: list) -> dict:
    """Persisted enclave codeset-id counter (n3c_mapping_conversion.py:
    380-388): reuse the existing id dict when present so re-exports and
    new versions keep STABLE ids; new concepts get the next free id
    starting from 900000000."""
    import os

    path = os.path.join(out_dir, "omop2obo_enclave_codeset_id_dict.json")
    ids: dict[str, int] = {}
    if os.path.exists(path):
        with open(path) as f:
            ids = {str(k): int(v) for k, v in json.load(f).items()}
    next_id = max(ids.values(), default=CODESET_ID_START - 1) + 1
    for cid in sorted(concept_ids, key=str):
        if str(cid) not in ids:
            ids[str(cid)] = next_id
            next_id += 1
    with open(path, "w") as f:
        json.dump(ids, f, indent=1, sort_keys=True)
    return ids


def export_n3c_release(mappings: Dataset, out_dir: str,
                       version: str = "v2.0.0",
                       enclave_params: dict | None = None) -> dict:
    """Full N3C Enclave release layout (n3c_mapping_conversion.py:
    116-324, 370-406): per-concept Atlas JSON files (distributed — each
    map task writes its batch's files), the persisted codeset-id dict
    (+ versioned copy), and the three Enclave CSVs with the reference's
    exact column sets. Returns {artifact: path}.

    ``mappings`` is a Dataset in the released-mapping row shape (use
    ``triples_to_mapping_table`` to bridge from engine triples).
    ``out_dir`` must be shared storage on a multi-node cluster."""
    import os

    params = {**DEFAULT_ENCLAVE_PARAMS, **(enclave_params or {})}
    os.makedirs(out_dir, exist_ok=True)
    json_dir = os.path.join(out_dir, f"atlas_json_files_{version}")
    os.makedirs(json_dir, exist_ok=True)

    # ---- per-concept Atlas JSON, written by the map tasks ----
    def write_jsons(df: pd.DataFrame) -> pd.DataFrame:
        out = []
        for row in df.to_dict("records"):
            fname = _mapping_filename(row["CONCEPT_ID"], row["CONCEPT_NAME"])
            with open(os.path.join(json_dir, fname), "w") as f:
                json.dump({"items": _atlas_expression(row)}, f, indent=4)
            out.append({**row, "filename": fname})
        return pd.DataFrame(out)

    with_files = mappings.map_batches(write_jsons, batch_format="pandas")
    rows = with_files.to_pandas()  # mapping table is result-scale (≪ corpus)

    # ---- persisted codeset ids (stable across re-runs) ----
    ids = load_or_assign_codeset_ids(out_dir, rows["CONCEPT_ID"].tolist())
    with open(os.path.join(
            out_dir, f"omop2obo_enclave_codeset_id_dict_{version}.json"), "w") as f:
        json.dump(ids, f, indent=1, sort_keys=True)

    def intention_of(row) -> str:
        return params["intention_header"] + params["intention"].format(
            row["CONCEPT_ID"], row["MAPPING_CATEGORY"], row["MAPPING_EVIDENCE"])

    # ---- Enclave CSV 1: concept_set_container (13 columns,
    #      creates_concept_set_container, :144-199) ----
    container = pd.DataFrame({
        "concept_set_id": ["[OMOP2OBO] " + f.split(".")[0] for f in rows["filename"]],
        "concept_set_name": ["[OMOP2OBO] " + f.split(".")[0] for f in rows["filename"]],
        "intention": [intention_of(r) for _, r in rows.iterrows()],
        "assigned_informatician": params["assigned_informatician"],
        "assigned_sme": params["assigned_sme"],
        "project_id": params["project_id"],
        "status": params["status"],
        "stage": params["stage"],
        "n3c_reviewer": params["n3c_reviewer"],
        "alias": [
            "{}-{}".format(
                r["ONTOLOGY_URI"].lower().replace(" | ", "|"),
                r["ONTOLOGY_LABEL"].lower().replace("/", "-")
                .replace(" | ", "|").replace(" ", "_"))
            for _, r in rows.iterrows()],
        "archived": params["archived"],
        "created_by": params["created_by"],
        "created_at": params["created_at"],
    })
    container_path = os.path.join(
        out_dir, f"OMOP2OBO_{version}_N3C_Enclave_CSV_concept_set_container.csv")
    container.to_csv(container_path, header=True, index=False)

    # ---- Enclave CSV 2: concept_set_version (22 columns,
    #      creates_concept_set_version, :200-272) ----
    set_ids = ["[OMOP2OBO] " + f.split(".")[0] for f in rows["filename"]]
    version_df = pd.DataFrame({
        "codeset_id": [ids[str(c)] for c in rows["CONCEPT_ID"]],
        "concept_set_id": set_ids,
        "concept_set_version_title": [
            "[OMOP2OBO] {} (v{})".format(f.split(".")[0], params["version"])
            for f in rows["filename"]],
        "project": params["project_id"],
        "source_application": "OMOP2OBO",
        "source_application_version": params["source_application_version"],
        "created_at": params["created_at"],
        "atlas_json": None,
        "most_recent_version": params["is_most_recent_version"],
        "comments": "Exported from OMOP2OBO and bulk imported to N3C.",
        "intention": [intention_of(r) for _, r in rows.iterrows()],
        "limitations": (
            "The OMOP concepts in this set may be mapped at different levels "
            "of confidence, please see the Intention field associated with "
            "this concept set for additional informations. "),
        "issues": None,
        "update_message": params["update_message"],
        "status": params["status"],
        "has_review": None,
        "reviewed_by": None,
        "created_by": params["created_by"],
        "provenance": (
            "This mapping was created using the OMOP2OBO mapping algorithm ("
            "https://github.com/callahantiff/OMOP2OBO) V1.0.0. The mappings "
            "are governed by the OMOP to OBO N3C Domain Team "
            "(https://covid.cd2h.org/ontology). "),
        "atlas_json_resource_url": None,
        "parent_version_id": None,
        "is_draft": "TRUE",
    })
    version_path = os.path.join(
        out_dir, f"OMOP2OBO_{version}_N3C_Enclave_CSV_concept_set_version.csv")
    version_df.to_csv(version_path, header=True, index=False)

    # ---- Enclave CSV 3: concept_set_expression_items (16 columns,
    #      creates_concept_set_expression_items, :275-324) ----
    items = pd.DataFrame({
        "codeset_id": [ids[str(c)] for c in rows["CONCEPT_ID"]],
        "concept_id": rows["CONCEPT_ID"].tolist(),
        "code": rows["CONCEPT_CODE"].tolist(),
        "codeSystem": rows["CONCEPT_VOCAB"].tolist(),
        "ontology_id": rows["ONTOLOGY_URI"].tolist(),
        "ontology_label": rows["ONTOLOGY_LABEL"].tolist(),
        "mapping_category": rows["MAPPING_CATEGORY"].tolist(),
        "mapping_logic": rows["ONTOLOGY_LOGIC"].tolist(),
        "mapping_evidence": rows["MAPPING_EVIDENCE"].tolist(),
        "isExcluded": "FALSE",
        "includeDescendants": "FALSE",
        "includeMapped": "TRUE",
        "item_id": None,
        "annotation": "Exported from OMOP2OBO and bulk imported to N3C",
        "created_by": params["created_by"],
        "created_at": params["created_at"],
    })
    items_path = os.path.join(
        out_dir, f"OMOP2OBO_{version}_N3C_Enclave_CSV_concept_set_expression_items.csv")
    items.to_csv(items_path, header=True, index=False)

    return {
        "atlas_json_dir": json_dir,
        "codeset_id_dict": os.path.join(out_dir, "omop2obo_enclave_codeset_id_dict.json"),
        "container_csv": container_path,
        "version_csv": version_path,
        "items_csv": items_path,
    }


def clip_excel_cells(ds: Dataset, max_len: int = 32500,
                     columns: list[str] | None = None) -> Dataset:
    """Excel-width cell truncation (M10, data_utils.py:617-620: clip
    every cell to 32,500 chars before the xlsx write). One vectorized
    Arrow kernel per string column; the xlsx WRITE itself needs
    openpyxl (absent from this container), but the transform is the
    data-plane part."""
    import pyarrow as pa
    import pyarrow.compute as pc

    def clip(batch: pa.Table) -> pa.Table:
        for i, name in enumerate(batch.column_names):
            if columns is not None and name not in columns:
                continue
            col = batch[name]
            if pa.types.is_string(col.type) or pa.types.is_large_string(col.type):
                batch = batch.set_column(
                    i, name, pc.utf8_slice_codeunits(col, 0, max_len))
        return batch

    return ds.map_batches(clip, batch_format="pyarrow", batch_size=None)
