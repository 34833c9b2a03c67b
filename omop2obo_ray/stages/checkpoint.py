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


def _row_hash64(subj: str, pred: str, obj: str) -> int:
    return int.from_bytes(
        hashlib.blake2b(f"{subj}\x1f{pred}\x1f{obj}".encode(), digest_size=8).digest(),
        "big",
    )


def write_triples_resumable(
    triples: Dataset,
    out_dir: str,
    n_buckets: int,
    counters: dict | None = None,
    extractor_version: str | None = None,
    presorted: bool = False,
) -> dict:
    """Write triples partitioned by ``subject_bucket`` (sorted by
    subject hash within each partition); skip buckets the manifest
    already records (resume-after-failure). Returns the manifest.

    Memory-bounded streaming: the dataset is globally sorted by
    ``subject_hash`` (a distributed exchange), then streamed through the
    driver once with one open ``ParquetWriter`` per pending bucket —
    since the stream arrives hash-ascending, each bucket's file is
    sorted without ever buffering a bucket in memory. Content hashes
    and per-category counters accumulate incrementally.

    At multi-node scale the same layout is also available fully
    distributed via ``ds.write_parquet(partition_cols=['subject_bucket'])``
    + per-bucket sort-on-read; this driver-streamed variant is the one
    that owns the manifest/resume bookkeeping.
    """
    os.makedirs(out_dir, exist_ok=True)
    manifest = load_manifest(out_dir)
    manifest["extractor_version"] = extractor_version
    done = set(manifest["partitions"].keys())
    todo = [b for b in range(n_buckets) if str(b) not in done]
    if not todo:
        return manifest
    todo_set = set(todo)

    import pyarrow.compute as pc

    if not presorted:
        triples = triples.sort("subject_hash")

    writers: dict[int, pq.ParquetWriter] = {}
    tmp_dirs: dict[int, str] = {}
    rows: dict[int, int] = {b: 0 for b in todo}
    chash: dict[int, int] = {b: 0 for b in todo}
    lineage_counts: dict[str, int] = {}
    schema: pa.Schema | None = None

    for batch in triples.iter_batches(batch_size=65536, batch_format="pyarrow"):
        if batch.num_rows == 0:
            continue
        schema = batch.schema
        vc = pc.value_counts(batch["pred"])
        for entry in vc.to_pylist():
            lineage_counts[entry["values"]] = (
                lineage_counts.get(entry["values"], 0) + entry["counts"]
            )
        for b in pc.unique(batch["subject_bucket"]).to_pylist():
            if b not in todo_set:
                continue
            part = batch.filter(pc.equal(batch["subject_bucket"], b))
            if part.num_rows == 0:
                continue
            if b not in writers:
                tmp = os.path.join(out_dir, f"subject_bucket={b}.tmp")
                if os.path.exists(tmp):
                    shutil.rmtree(tmp)
                os.makedirs(tmp, exist_ok=True)
                tmp_dirs[b] = tmp
                writers[b] = pq.ParquetWriter(
                    os.path.join(tmp, "part-0.parquet"), part.schema
                )
            writers[b].write_table(part)
            rows[b] += part.num_rows
            for s, p, o in zip(part["subj"].to_pylist(), part["pred"].to_pylist(),
                               part["obj"].to_pylist()):
                chash[b] ^= _row_hash64(s, p, o)

    counters = dict(counters or {})
    counters["triples_by_category"] = lineage_counts

    empty_schema = schema or pa.schema(
        [pa.field("subj", pa.string()), pa.field("pred", pa.string()),
         pa.field("obj", pa.string())]
    )
    for b in todo:
        if b in writers:
            writers[b].close()
            tmp = tmp_dirs[b]
        else:  # bucket had no rows — still record completion
            tmp = os.path.join(out_dir, f"subject_bucket={b}.tmp")
            if os.path.exists(tmp):
                shutil.rmtree(tmp)
            os.makedirs(tmp, exist_ok=True)
            pq.write_table(empty_schema.empty_table(),
                           os.path.join(tmp, "part-0.parquet"))
        bucket_dir = os.path.join(out_dir, f"subject_bucket={b}")
        if os.path.exists(bucket_dir):
            shutil.rmtree(bucket_dir)
        os.replace(tmp, bucket_dir)
        manifest["partitions"][str(b)] = {
            "rows": rows[b],
            "content_hash": f"{chash[b]:016x}" if rows[b] else "0" * 16,
            "counters": counters,
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
