"""High-cardinality keyed aggregation for Ray Data.

Ray 2.49's sort-based ``groupby(...).aggregate(...)`` and
``map_groups`` pay ~0.1–0.15 ms of per-GROUP overhead (one Python
aggregation step / UDF call per distinct key). Bounded-key groupbys
(priority levels, buckets, languages) don't care; high-cardinality
keys — distinct texts, (doc_a, doc_b) pairs, users, tokens — turn
O(groups) overhead into minutes: a measured 740 k-group two-column
count took 105 s on 32 cpus while the same aggregate via this module
took 1.9 s (55×).

Pattern: hash the key tuple to a COARSE bucket (vectorized,
deterministic `pd.util.hash_pandas_object`), run ONE Ray groupby over
the ~24·CPU coarse buckets, and aggregate all real keys inside each
coarse group with a vectorized pandas groupby (~µs per key). A key
never splits across coarse groups (the bucket is a pure function of
the key), so results are exact.
"""

from __future__ import annotations

from typing import Callable

import numpy as np
import pandas as pd

import ray
from ray.data import Dataset

_COARSE = "_coarse"


def _n_coarse_default() -> int:
    cpus = int(ray.cluster_resources().get("CPU", 8)) if ray.is_initialized() else 8
    return 24 * cpus


def coarse_aggregate(ds: Dataset, keys: list[str],
                     frame_fn: Callable[[pd.DataFrame], pd.DataFrame],
                     n_coarse: int | None = None) -> Dataset:
    """Keyed aggregate for high-cardinality ``keys``.

    ``frame_fn`` receives one coarse group's frame (every row of every
    key hashed into that bucket, ``_coarse`` column removed) and must
    aggregate it per key — typically one vectorized pandas groupby,
    e.g. ``lambda df: df.groupby(keys, sort=False).size().reset_index()``.
    """
    n = n_coarse or _n_coarse_default()

    def add_coarse(df: pd.DataFrame) -> pd.DataFrame:
        h = pd.util.hash_pandas_object(df[list(keys)], index=False).to_numpy()
        out = df.copy(deep=False)
        out[_COARSE] = (h % np.uint64(n)).astype(np.int32)
        return out

    def apply(g: pd.DataFrame) -> pd.DataFrame:
        return frame_fn(g.drop(columns=[_COARSE]))

    return ds.map_batches(add_coarse, batch_format="pandas",
                          batch_size=None).groupby(_COARSE).map_groups(
        apply, batch_format="pandas")


def coarse_apply_per_key(ds: Dataset, keys: list[str],
                         group_fn: Callable[[pd.DataFrame], pd.DataFrame],
                         n_coarse: int | None = None) -> Dataset:
    """``map_groups``-per-key semantics without the per-group Ray
    overhead: ``group_fn`` runs once per DISTINCT key tuple (a pandas
    groupby iteration inside each coarse group)."""
    def frame_fn(df: pd.DataFrame) -> pd.DataFrame:
        parts = [group_fn(g) for _k, g in df.groupby(list(keys), sort=False)]
        parts = [p for p in parts if len(p)]
        if not parts:
            return group_fn(df.iloc[:0])
        return pd.concat(parts, ignore_index=True)

    return coarse_aggregate(ds, keys, frame_fn, n_coarse=n_coarse)


def disk_bucket_apply(ds: Dataset, bucket_col: str,
                      frame_fn: Callable[[pd.DataFrame], pd.DataFrame],
                      stage_dir: str,
                      buckets_per_task: int = 4) -> Dataset:
    """DISK-MEDIATED bucket exchange + per-bucket apply — the fast path
    for string-heavy payloads where Ray's sort-based groupby exchange
    is the bottleneck (measured on the triple sink: 56 s of exchange →
    8.3 s of slice-spill + merge for 4.6 M rows; stages/checkpoint.py
    pioneered the pattern, this is the reusable generalization).

    Phase 1: an actor pool appends each batch's rows to per-bucket
    parquet slice files under ``stage_dir`` — no Ray exchange ever
    touches the payload; writes stream at disk speed. Phase 2: a
    Dataset over the bucket ids drives one merge task per
    ``buckets_per_task`` buckets; each reads its buckets' slices and
    runs ``frame_fn`` on the complete per-bucket frame. On a cluster,
    ``stage_dir`` must be shared storage (same contract as the
    resumable sink).
    """
    import glob
    import os
    import shutil

    import pyarrow as pa
    import pyarrow.parquet as pq

    shutil.rmtree(stage_dir, ignore_errors=True)
    os.makedirs(stage_dir, exist_ok=True)

    class _Spill:
        def __init__(self):
            self.seq = 0

        def __call__(self, batch: pa.Table) -> pa.Table:
            vals = batch[bucket_col].combine_chunks().to_numpy(
                zero_copy_only=False).astype(np.int64)
            for b in np.unique(vals):
                part = batch.filter(pa.array(vals == b))
                self.seq += 1
                pq.write_table(part, os.path.join(
                    stage_dir, f"{int(b)}-{os.getpid()}-{self.seq}.parquet"))
            return pa.table({"rows": pa.array([batch.num_rows], pa.int64())})

    cpus = int(ray.cluster_resources().get("CPU", 8)) if ray.is_initialized() else 8
    ds.map_batches(_Spill, batch_format="pyarrow", batch_size=None,
                   concurrency=(1, cpus)).count()  # drain phase 1

    by_bucket: dict[int, list[str]] = {}
    for f in glob.glob(os.path.join(stage_dir, "*.parquet")):
        b = int(os.path.basename(f).split("-", 1)[0])
        by_bucket.setdefault(b, []).append(f)
    if not by_bucket:
        raise ValueError("disk_bucket_apply: input produced no rows")

    def _merge(batch: pd.DataFrame) -> pd.DataFrame:
        outs = []
        for b in batch["bucket"]:
            t = pa.concat_tables([pq.read_table(f) for f in by_bucket[int(b)]])
            outs.append(frame_fn(t.to_pandas()))
        return pd.concat(outs, ignore_index=True)

    items = [{"bucket": b} for b in sorted(by_bucket)]
    return ray.data.from_items(items).map_batches(
        _merge, batch_format="pandas", batch_size=buckets_per_task)


def coarse_join(left: Dataset, right: Dataset, *, on: str,
                right_on: str | None = None, how: str = "inner",
                n_coarse: int | None = None) -> Dataset:
    """Task-based hash join via ONE coarse-bucket exchange + per-bucket
    pandas merge. Ray 2.49's native ``Dataset.join`` spins up a fresh
    aggregator-actor pool per join plan (~5-9 s fixed cost measured at
    32 cpus on 600 k rows vs ~2.6 s for this exchange), which dominates
    iterative algorithms that join every round (pagerank, HITS, BFS).
    Both sides ship through one sort exchange keyed on the join key's
    coarse bucket; every row of a key lands in one bucket, so the
    per-bucket ``pd.merge`` is exact.

    Contract mirrors ``Dataset.join``: output keeps the LEFT key name;
    payload column names must not collide. ``how`` ∈ {'inner',
    'left_outer', 'left_semi', 'left_anti'} (semi/anti return the LEFT
    columns only; right payloads never ship — project the right side
    to its key before calling for a slim exchange). Key skew: a hot
    key concentrates its rows in one bucket frame (same as the native
    join's partition) — use ``salted_join`` when one key's row set
    exceeds a worker's heap."""
    import pyarrow as pa

    from omop2obo_ray.pipelines.textpipe import (_pa_schema_of,
                                                 _sanitize_join_output)

    rkey = right_on or on
    # A lazy not-yet-executed plan (metadata count unknown) would be
    # executed TWICE below — once by the schema fetch (Ray 2.49's
    # `schema()` runs the whole plan for UDF stages and does not
    # cache blocks) and once by the exchange. Materialize it ONCE up
    # front so every later schema/count touch is metadata-only. The
    # sort exchange pins the full input at its barrier anyway, so
    # this adds no asymptotic memory; read_parquet / from_* inputs
    # have metadata counts and skip this.
    if left._meta_count() is None:
        left = left.materialize()
    if right._meta_count() is None:
        right = right.materialize()
    lsch = _pa_schema_of(left)
    rsch = _pa_schema_of(right)
    semi = how in ("left_semi", "left_anti")
    rpay = [] if semi else [n for n in rsch.names if n != rkey]
    out_schema = pa.schema(
        list(zip(lsch.names, lsch.types))
        + [(n, rsch.field(n).type) for n in rpay])
    # Empty-side fast paths gate on METADATA counts only
    # (`_meta_count()` is None for a lazy, not-yet-executed plan):
    # a `count()` here would execute the upstream plan an extra time
    # for lazy callers. When the count is unknown, the general
    # exchange handles empty sides exactly (the per-bucket merge is
    # correct for any empty frame; a fully-empty union falls through
    # to `_sanitize_join_output`'s typed-empty fallback).
    lcount, rcount = left._meta_count(), right._meta_count()
    if lcount == 0:
        return ray.data.from_arrow(out_schema.empty_table())
    if rcount == 0:
        if how in ("left_outer", "left_anti"):
            return left if how == "left_anti" else left.map_batches(
                lambda b: pa.table(
                    {**{c: b[c] for c in lsch.names},
                     **{n: pa.nulls(b.num_rows, rsch.field(n).type)
                        for n in rpay}}),
                batch_format="pyarrow", batch_size=None)
        return ray.data.from_arrow(out_schema.empty_table())

    # unified exchange schema: _k + left payloads + right payloads +
    # _side; the absent side's payloads are TYPED Arrow nulls so the
    # union and the sort exchange see one schema
    lpay = [n for n in lsch.names if n != on]
    ktype = lsch.field(on).type

    def _tag_left(b: pa.Table) -> pa.Table:
        n = b.num_rows
        cols = {"_k": b[on].combine_chunks().cast(ktype)}
        for c in lpay:
            cols[c] = b[c]
        for c in rpay:
            cols[c] = pa.nulls(n, rsch.field(c).type)
        cols["_side"] = pa.array(np.zeros(n, np.int8))
        return pa.table(cols)

    def _tag_right(b: pa.Table) -> pa.Table:
        n = b.num_rows
        cols = {"_k": b[rkey].combine_chunks().cast(ktype)}
        for c in lpay:
            cols[c] = pa.nulls(n, lsch.field(c).type)
        for c in rpay:
            cols[c] = b[c]
        cols["_side"] = pa.array(np.ones(n, np.int8))
        return pa.table(cols)

    lt = left.map_batches(_tag_left, batch_format="pyarrow",
                          batch_size=None)
    rt = right.map_batches(_tag_right, batch_format="pyarrow",
                           batch_size=None)

    int_restore = [f.name for f in out_schema
                   if pa.types.is_integer(f.type)]

    def merge(df: pd.DataFrame) -> pd.DataFrame:
        side = df["_side"].to_numpy()
        l = df.loc[side == 0, ["_k"] + lpay]
        r = df.loc[side == 1, ["_k"] + rpay]
        if semi:
            hit = l["_k"].isin(set(r["_k"]))
            out = l[hit] if how == "left_semi" else l[~hit]
        else:
            out = l.merge(r, on="_k",
                          how="left" if how == "left_outer" else "inner")
        out = out.rename(columns={"_k": on})
        # the all-null absent-side columns upcast ints to float64 in
        # pandas — restore. Null-free columns go straight back to
        # numpy int64: Ray's pandas→Arrow block conversion can CHOKE
        # on the Int64 extension dtype and fall back to float64
        # blocks, which poison downstream concat/unions (seen in
        # semi/anti buckets with no matches). Only genuinely-null
        # columns (left_outer misses) use the extension dtype.
        for c in int_restore:
            if out[c].dtype != np.int64:
                if out[c].isna().any():
                    out[c] = out[c].astype("Int64")
                else:
                    out[c] = out[c].astype(np.int64)
        return out[list(out_schema.names)]

    joined = coarse_aggregate(lt.union(rt), ["_k"], merge,
                              n_coarse=n_coarse)
    return _sanitize_join_output(joined, out_schema)


def salted_join(left: Dataset, right: Dataset, *, on: str,
                right_on: str | None = None,
                hot_threshold: int = 100_000, n_salts: int = 16,
                num_partitions: int = 16) -> Dataset:
    """Inner hash join that survives head-key skew (the 'every page
    links to wikipedia.org' problem): result rows are EXACTLY the
    plain join's, but no single aggregator ever holds a hot key's
    whole row set.

    Mechanism (the standard skew-hint rewrite): count left rows per
    key; keys above ``hot_threshold`` become the hot set — bounded by
    n_left/hot_threshold keys, so broadcasting it is principled, not a
    driver-state leak. Hot left rows get a deterministic row-content
    salt in [0, n_salts); hot right rows are REPLICATED once per salt;
    cold rows ride salt 0 unreplicated. The join key becomes
    (key, salt), splitting each hot key's probe side ``n_salts`` ways.

    ``right_on`` joins differently-named key columns (output keeps the
    left name, like Ray's native join). Payload column names must not
    collide (same contract as Dataset.join)."""
    import pyarrow as pa

    from omop2obo_ray.pipelines.textpipe import (_pa_schema_of,
                                                 _sanitize_join_output)

    rkey = right_on or on
    # Same lazy-input guard as coarse_join (shuffle.py coarse_join
    # body): Ray 2.49's `schema()` EXECUTES a UDF plan without
    # caching blocks, and a `count()` would execute it again.
    # Materialize a lazy plan ONCE up front so the schema fetch and
    # the empty-side gates below are metadata-only.
    if left._meta_count() is None:
        left = left.materialize()
    if right._meta_count() is None:
        right = right.materialize()
    lsch0 = _pa_schema_of(left)
    rsch0 = _pa_schema_of(right)
    empty_out = pa.schema(
        list(zip(lsch0.names, lsch0.types))
        + [(n, t) for n, t in zip(rsch0.names, rsch0.types)
           if n != rkey])
    if left._meta_count() == 0 or right._meta_count() == 0:
        # Ray 2.49 cannot hash-join an empty side
        return ray.data.from_arrow(empty_out.empty_table())
    counts = coarse_aggregate(
        left.select_columns([on]), [on],
        lambda df: df.groupby(on, sort=False).size().rename("n")
        .reset_index())
    hot: set = set()
    for b in counts.iter_batches(batch_size=65536,
                                 batch_format="pandas"):
        sel = b[b["n"] > hot_threshold]
        hot.update(sel[on].tolist())
    hot_ref = ray.put(hot)

    def salt_left(df: pd.DataFrame) -> pd.DataFrame:
        h = ray.get(hot_ref)
        out = df.copy(deep=False)
        is_hot = df[on].isin(h).to_numpy()
        salts = np.zeros(len(df), dtype=np.int64)
        if is_hot.any():
            rh = pd.util.hash_pandas_object(df, index=False).to_numpy()
            salts[is_hot] = (rh[is_hot] % np.uint64(n_salts)).astype(
                np.int64)
        out["_salt"] = salts
        return out

    def expand_right(df: pd.DataFrame) -> pd.DataFrame:
        h = ray.get(hot_ref)
        is_hot = df[rkey].isin(h).to_numpy()
        cold = df[~is_hot].copy(deep=False)
        cold["_rsalt"] = np.int64(0)
        if not is_hot.any():
            return cold
        hot_rows = df[is_hot]
        rep = hot_rows.loc[hot_rows.index.repeat(n_salts)].copy(
            deep=False)
        rep["_rsalt"] = np.tile(np.arange(n_salts, dtype=np.int64),
                                len(hot_rows))
        return pd.concat([cold, rep], ignore_index=True)

    ls = left.map_batches(salt_left, batch_format="pandas",
                          batch_size=None)
    rs = right.map_batches(expand_right, batch_format="pandas",
                           batch_size=None)
    joined = ls.join(rs, join_type="inner",
                     num_partitions=num_partitions,
                     on=(on, "_salt"), right_on=(rkey, "_rsalt"))

    out_cols = list(empty_out.names)
    joined = _sanitize_join_output(
        joined, pa.schema(list(zip(empty_out.names, empty_out.types))
                          + [("_salt", pa.int64())]))
    return joined.map_batches(
        lambda b: b.select([c for c in out_cols
                            if c in b.column_names]),
        batch_format="pyarrow", batch_size=None)
