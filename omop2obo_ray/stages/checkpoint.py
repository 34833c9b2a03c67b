"""Per-partition checkpointing with lineage + counters (north_rule).

The reference's "checkpointing" is file-existence caching and a CSV
rewritten after each stage (ontology_downloader.py:111,
ontology_explorer.py:91, main.py:104,124,145). Here the unit of resume
is the ``subject_bucket`` output partition: each bucket directory is
written atomically (temp dir + rename) by a DISTRIBUTED task and
recorded in a JSON manifest with row counts, a content hash and
per-category lineage counters, so a re-run reads the manifest and
recomputes only missing buckets — never one giant file, always
per-partition skippability (SURVEY §4 checkpoint row).

Scale shape: pending buckets are filtered vectorized, then ONE keyed
exchange (``groupby(subject_bucket)``) routes each bucket to a task
that sorts it by subject hash, writes its parquet file, publishes the
directory atomically, and returns a one-row manifest entry. The driver
only ever sees the entry stream (n_buckets rows) — never the triples —
and saves the manifest incrementally per entry, so a kill mid-run
loses at most unpublished buckets (orphan dirs are overwritten on
resume). Per-bucket memory = one bucket's triples: size ``n_buckets``
so that fits a worker heap. On a multi-node cluster ``out_dir`` must
be shared storage (the write tasks run on arbitrary nodes).
"""

from __future__ import annotations

import json
import os
import shutil

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

from ray.data import Dataset

from omop2obo_ray.functions.hashing import hash64_array

MANIFEST = "manifest.json"

# fallback for buckets that receive no rows before any schema is seen
_TRIPLE_SCHEMA = pa.schema([
    ("subj", pa.string()), ("pred", pa.string()), ("obj", pa.string()),
    ("ontology", pa.string()), ("evidence", pa.string()),
    ("subject_hash", pa.uint64()), ("subject_bucket", pa.int32()),
])


def load_manifest(out_dir: str) -> dict:
    path = os.path.join(out_dir, MANIFEST)
    if os.path.exists(path):
        with open(path) as f:
            return json.load(f)
    return {"partitions": {}, "extractor_version": None}


def _save_manifest(out_dir: str, manifest: dict) -> None:
    # top-level lineage counters are always RECOMPUTED from the
    # per-partition entries, so they stay correct across resumes and
    # never double-count (each entry's counts cover exactly its bucket)
    totals: dict[str, int] = {}
    for part in manifest["partitions"].values():
        for k, v in part.get("preds", {}).items():
            totals[k] = totals.get(k, 0) + v
    manifest.setdefault("counters", {})["triples_by_category"] = totals
    tmp = os.path.join(out_dir, MANIFEST + ".tmp")
    with open(tmp, "w") as f:
        json.dump(manifest, f, indent=1, sort_keys=True)
    os.replace(tmp, os.path.join(out_dir, MANIFEST))


def _content_hash64(table: pa.Table) -> int:
    """Order-insensitive 64-bit content hash: xor of per-row
    blake2b(subj\\x1fpred\\x1fobj), built vectorized (one Arrow
    binary-join kernel + C-speed blake2b per row)."""
    if table.num_rows == 0:
        return 0
    joined = pc.binary_join_element_wise(
        table["subj"].cast(pa.string()),
        table["pred"].cast(pa.string()),
        table["obj"].cast(pa.string()),
        "\x1f",
    )
    h = hash64_array(joined.combine_chunks())
    return int(np.bitwise_xor.reduce(h))


def _write_bucket_group(group: pa.Table, out_dir: str) -> pa.Table:
    """map_groups body: one complete subject bucket in, one manifest
    entry row out. Sorts by subject hash (hash-ascending file), writes
    atomically (tmp dir + rename), publishes the bucket directory."""
    b = int(group["subject_bucket"][0].as_py())
    part = group.sort_by("subject_hash")
    tmp = os.path.join(out_dir, f"subject_bucket={b}.tmp")
    if os.path.exists(tmp):
        shutil.rmtree(tmp)
    os.makedirs(tmp, exist_ok=True)
    pq.write_table(part, os.path.join(tmp, "part-0.parquet"))
    bucket_dir = os.path.join(out_dir, f"subject_bucket={b}")
    if os.path.exists(bucket_dir):
        shutil.rmtree(bucket_dir)
    os.replace(tmp, bucket_dir)
    preds = {e["values"]: e["counts"]
             for e in pc.value_counts(part["pred"].cast(pa.string())).to_pylist()}
    return pa.table({
        "bucket": pa.array([b], pa.int32()),
        "rows": pa.array([part.num_rows], pa.int64()),
        "content_hash": pa.array([f"{_content_hash64(part):016x}"], pa.string()),
        "preds_json": pa.array([json.dumps(preds, sort_keys=True)], pa.string()),
    })


def write_triples_resumable(
    triples: Dataset,
    out_dir: str,
    n_buckets: int,
    counters: dict | None = None,
    extractor_version: str | None = None,
) -> dict:
    """Write triples partitioned by ``subject_bucket`` (sorted by
    subject hash within each partition); skip buckets the manifest
    already records (resume-after-failure). Returns the manifest.

    Fully distributed: no global sort, no driver pass over the triples.
    See the module docstring for the scale shape.
    """
    import functools

    os.makedirs(out_dir, exist_ok=True)
    manifest = load_manifest(out_dir)
    manifest["extractor_version"] = extractor_version
    if counters:
        manifest["run_counters"] = dict(counters)
    done = set(manifest["partitions"].keys())
    todo = [b for b in range(n_buckets) if str(b) not in done]
    if not todo:
        _save_manifest(out_dir, manifest)
        return manifest
    todo_arr = np.asarray(sorted(todo), dtype=np.int64)

    def keep_todo(batch: pa.Table) -> pa.Table:
        vals = batch["subject_bucket"].combine_chunks().to_numpy(
            zero_copy_only=False).astype(np.int64)
        return batch.filter(pa.array(np.isin(vals, todo_arr)))

    pending = triples.map_batches(keep_todo, batch_format="pyarrow",
                                  batch_size=None)
    entries = pending.groupby("subject_bucket").map_groups(
        functools.partial(_write_bucket_group, out_dir=out_dir),
        batch_format="pyarrow",
    )

    # stream the (n_buckets-row) entry stream; save the manifest after
    # EVERY entry → kill-safe resume at bucket granularity
    seen: set[int] = set()
    for batch in entries.iter_batches(batch_size=256, batch_format="pyarrow"):
        for b, rows, chash, preds_json in zip(
            batch["bucket"].to_pylist(), batch["rows"].to_pylist(),
            batch["content_hash"].to_pylist(), batch["preds_json"].to_pylist(),
        ):
            seen.add(int(b))
            manifest["partitions"][str(b)] = {
                "rows": int(rows),
                "content_hash": chash if rows else "0" * 16,
                "preds": json.loads(preds_json),
            }
            _save_manifest(out_dir, manifest)

    # buckets with zero rows produce no group — record them with an
    # empty (schema-matching) file so resume treats them as complete
    missing = [b for b in todo if b not in seen]
    if missing:
        schema = None
        for b in seen:
            path = os.path.join(out_dir, f"subject_bucket={b}", "part-0.parquet")
            if os.path.exists(path):
                schema = pq.read_schema(path)
                break
        schema = schema or _TRIPLE_SCHEMA
        for b in missing:
            tmp = os.path.join(out_dir, f"subject_bucket={b}.tmp")
            if os.path.exists(tmp):
                shutil.rmtree(tmp)
            os.makedirs(tmp, exist_ok=True)
            pq.write_table(schema.empty_table(),
                           os.path.join(tmp, "part-0.parquet"))
            bucket_dir = os.path.join(out_dir, f"subject_bucket={b}")
            if os.path.exists(bucket_dir):
                shutil.rmtree(bucket_dir)
            os.replace(tmp, bucket_dir)
            manifest["partitions"][str(b)] = {
                "rows": 0, "content_hash": "0" * 16, "preds": {},
            }
            _save_manifest(out_dir, manifest)
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
