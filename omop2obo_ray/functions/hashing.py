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


def md5_u64(s: str | bytes) -> int:
    """64-bit hash DuckDB can replay EXACTLY: little-endian read of
    md5 digest bytes 8..16, the arithmetic behind DuckDB 1.0's
    ``md5_number_lower(s)`` (verified in tests). The bridge that lets
    hash-dependent operators (minhash, simhash, count-min) run under a
    SQL-checked driver gate instead of a rows-only one: the engine
    hashes with this in ``hash_mode='sql'`` and the oracle replays the
    identical values in pure DuckDB SQL."""
    if isinstance(s, str):
        s = s.encode("utf-8", "surrogatepass")
    return int.from_bytes(hashlib.md5(s).digest()[8:16], "little")


def md5_u64_array(values) -> np.ndarray:
    """``md5_u64`` over a string column → uint64 ndarray (None → 0)."""
    if isinstance(values, pa.ChunkedArray):
        values = values.combine_chunks()
    out = np.empty(len(values), dtype=np.uint64)
    m5 = hashlib.md5
    for i, v in enumerate(values):
        s = v.as_py() if hasattr(v, "as_py") else v
        if s is None:
            out[i] = 0
        else:
            out[i] = int.from_bytes(
                m5(s.encode("utf-8", "surrogatepass")).digest()[8:16],
                "little")
    return out
