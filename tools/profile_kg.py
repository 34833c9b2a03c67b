"""Per-operator `ds.stats()` audit of the flagship KG pipeline — the
"is wall-time dominated by useful compute?" check, made repeatable.

Usage: python tools/profile_kg.py [sf_dir] [repeat]
Prints the Ray Data stats report for the full build_kg run plus a
one-line JSON summary (wall, rows, pages/s).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    repeat = int(sys.argv[2]) if len(sys.argv) > 2 else 16

    import ray

    if not ray.is_initialized():
        ray.init(address="local",
                 num_cpus=int(os.environ.get("RAY_GRAFT_CPUS", "32")),
                 include_dashboard=False)

    from omop2obo_ray.pipelines.flagship import (
        derive_lexicon_from_corpus, documents_as_pages)

    pages = documents_as_pages(sf, repeat=repeat)
    lexicon = derive_lexicon_from_corpus(sf)  # untimed offline dim build

    from omop2obo_ray.pipelines.kg import build_kg

    t0 = time.perf_counter()
    triples = build_kg(pages, lexicon).materialize()
    wall = time.perf_counter() - t0
    n = triples.count()
    n_pages = pages.count()
    print(triples.stats())
    print(json.dumps({
        "metric": "kg_profile_seconds", "value": round(wall, 2),
        "rows": n, "pages": n_pages,
        "pages_per_sec": round(n_pages / wall, 1), "sf": sf}))
    ray.shutdown()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
