"""Local replica of the driver's correctness gate: run every
``queries()`` entry and its ``oracle_sql()`` side-by-side on a testdata
sf dir, compare row count + schema + order-insensitive value hash.

Usage: python tools/check_queries.py [sf_dir] [query ...]
       python tools/check_queries.py --json OUT.json [sf_dir] [query ...]

``--json`` additionally writes a machine-readable per-query manifest
(status, rows, wall seconds, check kind) — the auditable full-gate
artifact (VERDICT r4 #6: GATE_REPLICA_r{N}.json).
"""

from __future__ import annotations

import sys
import time

import duckdb
import pandas as pd

TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


def to_pandas(res):
    import pyarrow as pa

    try:
        from ray.data import Dataset

        if isinstance(res, Dataset):
            return res.to_pandas()
    except ImportError:
        pass
    if isinstance(res, pa.Table):
        return res.to_pandas()
    return res


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].astype(str)
    return df.sort_values(list(df.columns), kind="mergesort").reset_index(drop=True)


def value_hash(df: pd.DataFrame) -> str:
    import hashlib

    return hashlib.md5(
        canon(df).to_csv(index=False, float_format="%.9g").encode()
    ).hexdigest()


def main() -> int:
    args = sys.argv[1:]
    json_out = None
    if args and args[0] == "--json":
        json_out = args[1]
        args = args[2:]
    sf_dir = args[0] if args else "/root/testdata/sf0.01"
    only = set(args[1:])

    import ray

    if not ray.is_initialized():
        ray.init(address="local", num_cpus=8, include_dashboard=False,
                 logging_level="ERROR")
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False

    sys.path.insert(0, "/root/repo")
    import __ray_entry__ as E

    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")

    qs, sqls = E.queries(), E.oracle_sql()
    failures = 0
    times: list[tuple[float, str]] = []
    manifest: dict[str, dict] = {}
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.perf_counter()
        try:
            got = to_pandas(fn(sf_dir))
        except Exception as ex:
            print(f"FAIL {name}: query raised {type(ex).__name__}: {ex}")
            failures += 1
            manifest[name] = {"status": "FAIL", "check": "raise",
                              "error": f"{type(ex).__name__}: {ex}"}
            continue
        dt = time.perf_counter() - t0
        times.append((dt, name))
        if name not in sqls:
            print(f"ok   {name}: rows-only, {len(got)} rows  [{dt:.2f}s]")
            manifest[name] = {"status": "PASS", "check": "rows-only",
                              "rows": len(got), "sec": round(dt, 2)}
            continue
        want = con.sql(sqls[name]).df()
        ok_rows = len(got) == len(want)
        ok_cols = sorted(got.columns) == sorted(want.columns)
        ok_hash = ok_rows and ok_cols and value_hash(got) == value_hash(want)
        manifest[name] = {
            "status": "PASS" if ok_hash else "FAIL",
            "check": "sql-hash", "rows": len(got),
            "oracle_rows": len(want), "sec": round(dt, 2),
            "rows_match": ok_rows, "schema_match": ok_cols,
            "hash_match": bool(ok_hash)}
        if ok_hash:
            print(f"PASS {name}: {len(got)} rows  [{dt:.2f}s]")
        else:
            failures += 1
            print(f"FAIL {name}: rows {len(got)} vs {len(want)}, cols "
                  f"{sorted(got.columns)} vs {sorted(want.columns)}, hash_eq={ok_hash}")
            if ok_rows and ok_cols:
                g, w = canon(got), canon(want)
                neq = (g != w).any(axis=1)
                print(g[neq].head(3))
                print(w[neq].head(3))
    if len(times) > 1:
        total = sum(t for t, _ in times)
        print(f"\nTOTAL engine wall {total:.1f}s over {len(times)} "
              "queries; 10 slowest:")
        for dt, name in sorted(times, reverse=True)[:10]:
            print(f"  {dt:7.2f}s  {name}")
    if json_out:
        import json

        with open(json_out, "w") as f:
            json.dump({"sf_dir": sf_dir,
                       "n_queries": len(manifest),
                       "n_fail": failures,
                       "queries": manifest}, f, indent=1, sort_keys=True)
        print(f"manifest -> {json_out}")
    ray.shutdown()
    return failures


if __name__ == "__main__":
    raise SystemExit(main())
