"""Memory-pressure soak (VERDICT r3 directive #5): one flagship
corpus-mode run at REPEAT >= 384 (~1.9M+ pages) with the object store
CAPPED below the working set, so the streaming executor must spill —
evidencing the memory-bounded-execution claim at a size the plasma
store cannot hold.

Usage:  python tools/soak.py            # REPEAT=384, 8 GiB store
        SOAK_REPEAT=512 SOAK_STORE_GB=6 python tools/soak.py

Prints ONE json line: wall, pages/s, triples, peak object-store use,
spilled bytes (from ray's internal memory summary), restored bytes.
"""

from __future__ import annotations

import json
import os
import re
import shutil
import sys
import time

SF_DIR = os.environ.get("GRAFT_SF_DIR", "/root/testdata/sf0.1")
REPEAT = int(os.environ.get("SOAK_REPEAT", "384"))
STORE_GB = float(os.environ.get("SOAK_STORE_GB", "8"))
NUM_CPUS = int(os.environ.get("RAY_GRAFT_CPUS", "32"))


def main() -> None:
    import ray

    ray.init(address="local", num_cpus=NUM_CPUS,
             include_dashboard=False,
             object_store_memory=int(STORE_GB * 1e9),
             logging_level="ERROR")
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False
    sys.path.insert(0, os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))

    from bench import derive_lexicon_from_corpus, kg_over_documents

    lexicon = derive_lexicon_from_corpus(SF_DIR)
    out_dir = "/tmp/soak_kg_out"
    shutil.rmtree(out_dir, ignore_errors=True)

    t0 = time.perf_counter()
    kg_over_documents(SF_DIR, lexicon=lexicon, repeat=REPEAT,
                      cfg_overrides={"canonical_mode": "corpus"}
                      ).write_parquet(out_dir)
    wall = round(time.perf_counter() - t0, 3)

    import pyarrow.parquet as pq

    n_triples = sum(
        pq.read_metadata(os.path.join(out_dir, f)).num_rows
        for f in os.listdir(out_dir) if f.endswith(".parquet"))
    shutil.rmtree(out_dir, ignore_errors=True)

    from ray._private.internal_api import memory_summary

    summ = memory_summary(stats_only=True)
    spilled = re.search(r"Spilled (\d+) MiB, (\d+) objects", summ)
    restored = re.search(r"Restored (\d+) MiB, (\d+) objects", summ)
    plasma = re.search(r"Plasma memory usage (\d+) MiB", summ)

    import pyarrow.parquet as pq2

    n_docs = pq2.read_metadata(f"{SF_DIR}/documents.parquet").num_rows
    pages = n_docs * REPEAT
    print(json.dumps({
        "metric": "soak_corpus_mode",
        "sf": SF_DIR, "repeat": REPEAT, "num_cpus": NUM_CPUS,
        "object_store_gb": STORE_GB,
        "wall_sec": wall, "pages": pages,
        "pages_per_sec": round(pages / wall, 1),
        "n_triples": n_triples,
        "spilled_mib": int(spilled.group(1)) if spilled else 0,
        "spilled_objects": int(spilled.group(2)) if spilled else 0,
        "restored_mib": int(restored.group(1)) if restored else 0,
        "plasma_mib_at_end": int(plasma.group(1)) if plasma else None,
    }))
    ray.shutdown()


if __name__ == "__main__":
    main()
