"""Deterministic, process-stable hashing.

Python's builtin ``hash`` is salted per process (PYTHONHASHSEED), which
breaks distributed determinism — every hash used for partitioning,
dedup keys or salting must be content-derived. We use blake2b (stdlib,
fast, seedable) truncated to 64 bits.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa


def stable_hash64(s: str | bytes) -> int:
    if isinstance(s, str):
        s = s.encode("utf-8", "surrogatepass")
    return int.from_bytes(hashlib.blake2b(s, digest_size=8).digest(), "big")


def hash64_array(values: pa.Array | pa.ChunkedArray | list[str]) -> np.ndarray:
    """Vectorized-ish 64-bit hash of a string column → uint64 ndarray.

    hashlib per value is C-speed; this is the portable deterministic path
    (no xxhash in the environment).
    """
    if isinstance(values, pa.ChunkedArray):
        values = values.combine_chunks()
    out = np.empty(len(values), dtype=np.uint64)
    b2 = hashlib.blake2b
    for i, v in enumerate(values):
        s = v.as_py() if hasattr(v, "as_py") else v
        if s is None:
            out[i] = 0
        else:
            out[i] = int.from_bytes(
                b2(s.encode("utf-8", "surrogatepass"), digest_size=8).digest(), "big"
            )
    return out


def bucket_of(h: np.ndarray | int, n_buckets: int):
    """Map 64-bit hashes to [0, n_buckets)."""
    if isinstance(h, np.ndarray):
        return (h % np.uint64(n_buckets)).astype(np.int32)
    return int(h % n_buckets)


def md5_hex(s: str) -> str:
    """md5 key as in the reference's text_preprocessor
    (string_similarity.py:141)."""
    return hashlib.md5(s.encode("utf-8", "surrogatepass")).hexdigest()
