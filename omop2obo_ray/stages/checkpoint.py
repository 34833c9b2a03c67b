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

Scale shape — a DISK-MEDIATED two-phase shuffle (Ray's sort-based
groupby exchange measured 56 s just to route 4.6 M string-heavy triple
rows; spilling slices streams at disk speed):

  1. a streaming actor stage appends each batch's rows to per-bucket
     slice files under ``out_dir/_stage`` (no Ray exchange touches the
     payload; only a tiny (bucket, rows) stream reaches the driver);
  2. one merge task per pending bucket concatenates its slices, sorts
     by subject hash, publishes ``subject_bucket=B/part-0.parquet``
     atomically and returns the manifest entry; the driver saves the
     manifest after every completed bucket (kill-safe — orphan dirs
     and stale slices are recomputed/cleared on resume).

Per-bucket memory = one bucket's triples: size ``n_buckets`` so that
fits a worker heap. On a multi-node cluster ``out_dir`` (including
``_stage``) must be shared storage — the spill and merge tasks run on
arbitrary nodes.
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


class _SliceSpiller:
    """Actor: phase-1 of the disk-mediated bucket shuffle. Each actor
    appends its batches' rows to per-bucket slice files under
    ``_stage/`` — no Ray exchange touches the triple payload (a Ray
    sort-based groupby over the string-heavy triples measured 56 s for
    4.6 M rows; writing slices streams at disk speed)."""

    def __init__(self, out_dir: str, todo: list[int]):
        self.stage = os.path.join(out_dir, "_stage")
        self.todo = np.asarray(sorted(todo), dtype=np.int64)
        self.seq = 0
        os.makedirs(self.stage, exist_ok=True)

    def __call__(self, batch: pa.Table) -> pa.Table:
        vals = batch["subject_bucket"].combine_chunks().to_numpy(
            zero_copy_only=False).astype(np.int64)
        batch = batch.filter(pa.array(np.isin(vals, self.todo)))
        if batch.num_rows == 0:
            return pa.table({"bucket": pa.array([], pa.int32()),
                             "rows": pa.array([], pa.int64())})
        buckets, rows = [], []
        vals = batch["subject_bucket"].combine_chunks().to_numpy(
            zero_copy_only=False).astype(np.int64)
        for b in np.unique(vals):
            part = batch.filter(pa.array(vals == b))
            self.seq += 1
            path = os.path.join(
                self.stage, f"{int(b)}-{os.getpid()}-{self.seq}.parquet")
            pq.write_table(part, path)
            buckets.append(int(b))
            rows.append(part.num_rows)
        return pa.table({"bucket": pa.array(buckets, pa.int32()),
                         "rows": pa.array(rows, pa.int64())})


def _finalize_bucket(b: int, out_dir: str) -> dict:
    """Phase-2 task: merge one bucket's slices, sort by subject hash,
    publish ``subject_bucket=B/part-0.parquet`` atomically, return the
    manifest entry. Memory = one bucket's triples."""
    stage = os.path.join(out_dir, "_stage")
    prefix = f"{b}-"
    slices = sorted(f for f in os.listdir(stage)
                    if f.startswith(prefix) and f.endswith(".parquet"))
    if slices:
        part = pa.concat_tables(
            [pq.read_table(os.path.join(stage, f)) for f in slices],
            promote_options="default").sort_by("subject_hash")
    else:
        part = _TRIPLE_SCHEMA.empty_table()
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
             for e in pc.value_counts(part["pred"].cast(pa.string())).to_pylist()} \
        if part.num_rows else {}
    return {
        "bucket": int(b),
        "rows": part.num_rows,
        "content_hash": f"{_content_hash64(part):016x}" if part.num_rows else "0" * 16,
        "preds_json": json.dumps(preds, sort_keys=True),
    }


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

    Fully distributed: no global sort, no Ray exchange over the triple
    payload, no driver pass over the triples. See the module docstring
    for the scale shape.
    """
    import ray as _ray

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

    # stale slices from a previous crashed run would double-count —
    # pending buckets are recomputed from scratch, so clear the stage
    stage = os.path.join(out_dir, "_stage")
    if os.path.exists(stage):
        shutil.rmtree(stage)
    os.makedirs(stage, exist_ok=True)

    # ---- phase 1: spill per-bucket slices (streaming, no exchange) ----
    cpus = int(_ray.cluster_resources().get("CPU", 8)) if _ray.is_initialized() else 8
    spilled = triples.map_batches(
        _SliceSpiller,
        fn_constructor_kwargs=dict(out_dir=out_dir, todo=todo),
        batch_format="pyarrow", batch_size=None,
        concurrency=(1, max(4, cpus)), num_cpus=1,
    )
    # drive phase 1 to completion (tiny (bucket, rows) stream)
    for _ in spilled.iter_batches(batch_size=4096, batch_format="pyarrow"):
        pass

    # ---- phase 2: one merge/publish task per pending bucket ----
    finalize = _ray.remote(num_cpus=1)(_finalize_bucket)
    refs = {finalize.remote(b, out_dir): b for b in todo}
    pending_refs = list(refs)
    # save the manifest after EVERY completed bucket → kill-safe resume
    while pending_refs:
        ready, pending_refs = _ray.wait(pending_refs, num_returns=1)
        e = _ray.get(ready[0])
        manifest["partitions"][str(e["bucket"])] = {
            "rows": int(e["rows"]),
            "content_hash": e["content_hash"],
            "preds": json.loads(e["preds_json"]),
        }
        _save_manifest(out_dir, manifest)
    shutil.rmtree(stage, ignore_errors=True)
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


def _merge_bucket_incremental(b: int, out_dir: str) -> dict:
    """Phase-2 task of the incremental merge: existing published bucket
    + new slices → union, exact row dedup (a re-crawled page re-emits
    identical triples), re-sort, atomic republish."""
    stage = os.path.join(out_dir, "_stage")
    prefix = f"{b}-"
    slices = sorted(f for f in os.listdir(stage)
                    if f.startswith(prefix) and f.endswith(".parquet"))
    parts = [pq.read_table(os.path.join(stage, f)) for f in slices]
    published = os.path.join(out_dir, f"subject_bucket={b}", "part-0.parquet")
    if os.path.exists(published):
        parts.insert(0, pq.read_table(published))
    part = pa.concat_tables(parts, promote_options="default")
    if part.num_rows:
        df = part.to_pandas().drop_duplicates()
        part = pa.Table.from_pandas(df, preserve_index=False,
                                    schema=part.schema).sort_by("subject_hash")
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
             for e in pc.value_counts(part["pred"].cast(pa.string())).to_pylist()} \
        if part.num_rows else {}
    return {
        "bucket": int(b),
        "rows": part.num_rows,
        "content_hash": f"{_content_hash64(part):016x}" if part.num_rows else "0" * 16,
        "preds_json": json.dumps(preds, sort_keys=True),
    }


def merge_triples_into_store(triples, out_dir: str, n_buckets: int) -> dict:
    """INCREMENTAL store update (crawl-refresh semantics): merge a new
    batch of triples into an already-published store. Buckets untouched
    by the new batch keep their files and manifest entries byte-for-
    byte; touched buckets are re-published atomically as
    union ∪ dedup ∪ re-sort of (existing rows, new rows). Exact row
    dedup makes the merge IDEMPOTENT — re-feeding the same crawl batch
    is a no-op — and additive: store(A) then merge(B) equals
    store(A ∪ B) when A and B touch disjoint urls (per-subject
    assembly is page-local, so a url's triples always arrive together).

    Same scale shape as ``write_triples_resumable``: slice spill at
    disk speed (no Ray exchange over the payload), one merge task per
    touched bucket, manifest saved per bucket (kill-safe).
    """
    import ray as _ray

    manifest = load_manifest(out_dir)
    stage = os.path.join(out_dir, "_stage")
    if os.path.exists(stage):
        shutil.rmtree(stage)
    os.makedirs(stage, exist_ok=True)

    cpus = int(_ray.cluster_resources().get("CPU", 8)) if _ray.is_initialized() else 8
    spilled = triples.map_batches(
        _SliceSpiller,
        fn_constructor_kwargs=dict(out_dir=out_dir,
                                   todo=list(range(n_buckets))),
        batch_format="pyarrow", batch_size=None,
        concurrency=(1, max(4, cpus)), num_cpus=1,
    )
    touched: set[int] = set()
    for b in spilled.iter_batches(batch_size=4096, batch_format="pyarrow"):
        touched.update(int(x) for x in b["bucket"].to_pylist())

    merge = _ray.remote(num_cpus=1)(_merge_bucket_incremental)
    pending = list({merge.remote(b, out_dir): b for b in sorted(touched)})
    while pending:
        ready, pending = _ray.wait(pending, num_returns=1)
        e = _ray.get(ready[0])
        manifest["partitions"][str(e["bucket"])] = {
            "rows": int(e["rows"]),
            "content_hash": e["content_hash"],
            "preds": json.loads(e["preds_json"]),
        }
        _save_manifest(out_dir, manifest)
    shutil.rmtree(stage, ignore_errors=True)
    return manifest
