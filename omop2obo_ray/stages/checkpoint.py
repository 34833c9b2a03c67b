"""Per-partition checkpointing with lineage + counters (north_rule).

The reference's "checkpointing" is file-existence caching and a CSV
rewritten after each stage (ontology_downloader.py:111,
ontology_explorer.py:91, main.py:104,124,145). Here the unit of resume
is the ``subject_bucket`` output partition: each bucket directory is
written atomically (temp dir + rename) and recorded in a JSON manifest
with row counts and a content hash, so a re-run reads the manifest and
recomputes only missing buckets — never one giant file, always
per-partition skippability (SURVEY §4 checkpoint row).
"""

from __future__ import annotations

import hashlib
import json
import os
import shutil

import pyarrow as pa
import pyarrow.parquet as pq

from ray.data import Dataset

MANIFEST = "manifest.json"


def load_manifest(out_dir: str) -> dict:
    path = os.path.join(out_dir, MANIFEST)
    if os.path.exists(path):
        with open(path) as f:
            return json.load(f)
    return {"partitions": {}, "extractor_version": None}


def _save_manifest(out_dir: str, manifest: dict) -> None:
    tmp = os.path.join(out_dir, MANIFEST + ".tmp")
    with open(tmp, "w") as f:
        json.dump(manifest, f, indent=1, sort_keys=True)
    os.replace(tmp, os.path.join(out_dir, MANIFEST))


def _content_hash(table: pa.Table, key_cols: list[str]) -> str:
    """Order-insensitive content hash over the key columns."""
    h = 0
    cols = [table[c].to_pylist() for c in key_cols if c in table.column_names]
    for row in zip(*cols):
        h ^= int.from_bytes(
            hashlib.blake2b("\x1f".join(map(str, row)).encode(), digest_size=8).digest(),
            "big",
        )
    return f"{h:016x}"


def write_triples_resumable(
    triples: Dataset,
    out_dir: str,
    n_buckets: int,
    counters: dict | None = None,
    extractor_version: str | None = None,
) -> dict:
    """Write triples partitioned by ``subject_bucket``; skip buckets the
    manifest already records (resume-after-failure). Returns the manifest.

    Streaming caveat: within one run the dataset is consumed once via
    ``iter_batches`` grouped to buckets (buckets are hash-uniform, so
    each bucket is bounded at data/n_buckets; at cluster scale use
    larger n_buckets so a bucket fits a worker)."""
    os.makedirs(out_dir, exist_ok=True)
    manifest = load_manifest(out_dir)
    manifest["extractor_version"] = extractor_version
    done = set(manifest["partitions"].keys())
    todo = [b for b in range(n_buckets) if str(b) not in done]
    if not todo:
        return manifest
    todo_set = set(todo)

    # single streaming pass: each batch is split into its buckets once
    # (never one filter scan per bucket per batch)
    import pyarrow.compute as pc

    buckets: dict[int, list[pa.Table]] = {b: [] for b in todo}
    lineage_counts: dict[str, int] = {}
    for batch in triples.iter_batches(batch_size=65536, batch_format="pyarrow"):
        if batch.num_rows == 0:
            continue
        if "pred" in batch.column_names:  # per-category counters (lineage)
            vc = pc.value_counts(batch["pred"])
            for entry in vc.to_pylist():
                lineage_counts[entry["values"]] = (
                    lineage_counts.get(entry["values"], 0) + entry["counts"]
                )
        present = pc.unique(batch["subject_bucket"]).to_pylist()
        for b in present:
            if b in todo_set:
                part = batch.filter(pc.equal(batch["subject_bucket"], b))
                if part.num_rows:
                    buckets[b].append(part)
    counters = dict(counters or {})
    counters["triples_by_category"] = lineage_counts

    for b in todo:
        parts = buckets[b]
        table = (
            pa.concat_tables(parts)
            if parts
            else pa.table({})
        )
        bucket_dir = os.path.join(out_dir, f"subject_bucket={b}")
        tmp_dir = bucket_dir + ".tmp"
        if os.path.exists(tmp_dir):
            shutil.rmtree(tmp_dir)
        os.makedirs(tmp_dir, exist_ok=True)
        n_rows = table.num_rows if parts else 0
        if parts:
            table = table.sort_by([("subject_hash", "ascending"), ("pred", "ascending"),
                                   ("obj", "ascending")])
            pq.write_table(table, os.path.join(tmp_dir, "part-0.parquet"))
        else:
            pq.write_table(
                pa.table({"subj": pa.array([], pa.string()), "pred": pa.array([], pa.string()),
                          "obj": pa.array([], pa.string())}),
                os.path.join(tmp_dir, "part-0.parquet"),
            )
        if os.path.exists(bucket_dir):
            shutil.rmtree(bucket_dir)
        os.replace(tmp_dir, bucket_dir)
        manifest["partitions"][str(b)] = {
            "rows": n_rows,
            "content_hash": _content_hash(table, ["subj", "pred", "obj"]) if n_rows else "0" * 16,
            "counters": dict(counters or {}),
        }
        _save_manifest(out_dir, manifest)  # after EVERY bucket → kill-safe
    return manifest


def read_triples(out_dir: str) -> pa.Table:
    """Read back all completed buckets (resume verification / consumers)."""
    manifest = load_manifest(out_dir)
    tables = []
    for b in sorted(manifest["partitions"], key=int):
        path = os.path.join(out_dir, f"subject_bucket={b}", "part-0.parquet")
        if os.path.exists(path):
            t = pq.read_table(path)
            if t.num_rows:
                tables.append(t)
    if not tables:
        return pa.table({"subj": pa.array([], pa.string()), "pred": pa.array([], pa.string()),
                         "obj": pa.array([], pa.string())})
    return pa.concat_tables(tables, promote_options="default")
