"""Sharded JSON-Lines sink — the interchange format LLM training
stacks consume (one JSON object per line, a directory of shards).
Reading uses Ray Data's native ``read_json`` (arrow JSON reader,
file-parallel); this module adds the WRITE side with the same
partitioned-part + manifest contract as the N-Triples/WARC sinks.

Scale shape: each ``map_batches`` task serializes its block with
pandas' C-vectorized ``to_json(orient="records", lines=True)`` (no
per-row Python json.dumps) and writes ONE ``part-*.jsonl`` file via
atomic rename; the driver sees only (path, rows) manifest rows.
"""

from __future__ import annotations

import os
import uuid

import pandas as pd
import pyarrow as pa

import ray
from ray.data import Dataset


def write_jsonl(ds: Dataset, out_dir: str) -> pd.DataFrame:
    """Serialize to partitioned ``part-*.jsonl`` under ``out_dir``;
    returns the (path, rows) manifest frame (one row per part)."""
    os.makedirs(out_dir, exist_ok=True)

    def _write(df: pd.DataFrame) -> pd.DataFrame:
        if len(df) == 0:
            return pd.DataFrame({"path": pd.Series([], dtype=str),
                                 "rows": pd.Series([], dtype="int64")})
        payload = df.to_json(orient="records", lines=True,
                             force_ascii=False, date_format="iso")
        path = os.path.join(out_dir, f"part-{uuid.uuid4().hex}.jsonl")
        tmp = path + ".tmp"
        with open(tmp, "w", encoding="utf-8") as f:
            f.write(payload)
        os.replace(tmp, path)
        return pd.DataFrame({"path": [path], "rows": [len(df)]})

    return ds.map_batches(_write, batch_format="pandas",
                          batch_size=None).to_pandas()


def read_jsonl(path: str) -> Dataset:
    """Directory of ``.jsonl`` shards (or one file) → Dataset.
    Thin alias over Ray's file-parallel JSON reader so the sink and
    source live behind one import."""
    return ray.data.read_json(path, file_extensions=["jsonl", "json"])
