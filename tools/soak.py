"""Memory-pressure soak (VERDICT r3 directive #5): one flagship
corpus-mode run at REPEAT >= 384 (~1.9M+ pages) with the object store
CAPPED below the working set, so the streaming executor must spill —
evidencing the memory-bounded-execution claim at a size the plasma
store cannot hold.

Usage:  python tools/soak.py            # REPEAT=384, 8 GiB store
        SOAK_REPEAT=512 SOAK_STORE_GB=6 python tools/soak.py
        SOAK_MODE=corpus_sampled python tools/soak.py   # r4 #5: the
        # recommended corpus-weighted mode at scale, soaked under the
        # same capped store

Prints ONE json line: wall, pages/s, triples, spilled bytes (peak
spill-directory size sampled during the run — the grpc-backed
`ray memory` API is unavailable in this container, so spill evidence
comes from the spill files themselves) and end-of-run residue.
"""

from __future__ import annotations

import glob
import json
import os
import shutil
import sys
import threading
import time

SF_DIR = os.environ.get("GRAFT_SF_DIR", "/root/testdata/sf0.1")
REPEAT = int(os.environ.get("SOAK_REPEAT", "384"))
STORE_GB = float(os.environ.get("SOAK_STORE_GB", "8"))
MODE = os.environ.get("SOAK_MODE", "corpus")
NUM_CPUS = int(os.environ.get("RAY_GRAFT_CPUS", "32"))
TEMP_DIR = "/tmp/ray_soak"


def _spill_bytes() -> int:
    total = 0
    for d in glob.glob(os.path.join(
            TEMP_DIR, "session_latest", "ray_spilled_objects*")):
        try:
            for f in os.listdir(d):
                try:
                    total += os.path.getsize(os.path.join(d, f))
                except OSError:
                    pass
        except OSError:
            pass
    return total


def main() -> None:
    shutil.rmtree(TEMP_DIR, ignore_errors=True)
    import ray

    ray.init(address="local", num_cpus=NUM_CPUS,
             include_dashboard=False,
             object_store_memory=int(STORE_GB * 1e9),
             logging_level="ERROR", _temp_dir=TEMP_DIR)
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False
    sys.path.insert(0, os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))

    peak = {"bytes": 0}
    stop = threading.Event()

    def _sampler():
        while not stop.is_set():
            peak["bytes"] = max(peak["bytes"], _spill_bytes())
            time.sleep(1.0)

    t = threading.Thread(target=_sampler, daemon=True)
    t.start()

    from omop2obo_ray.pipelines.flagship import (
        derive_lexicon_from_corpus, kg_over_documents)

    lexicon = derive_lexicon_from_corpus(SF_DIR)
    out_dir = "/tmp/soak_kg_out"
    shutil.rmtree(out_dir, ignore_errors=True)

    t0 = time.perf_counter()
    kg_over_documents(SF_DIR, lexicon=lexicon, repeat=REPEAT,
                      cfg_overrides={"canonical_mode": MODE}
                      ).write_parquet(out_dir)
    wall = round(time.perf_counter() - t0, 3)
    stop.set()
    t.join(timeout=3)
    end_spill = _spill_bytes()

    import pyarrow.parquet as pq

    n_triples = sum(
        pq.read_metadata(os.path.join(out_dir, f)).num_rows
        for f in os.listdir(out_dir) if f.endswith(".parquet"))
    shutil.rmtree(out_dir, ignore_errors=True)

    n_docs = pq.read_metadata(f"{SF_DIR}/documents.parquet").num_rows
    pages = n_docs * REPEAT
    print(json.dumps({
        "metric": f"soak_{MODE}_mode",
        "sf": SF_DIR, "repeat": REPEAT, "num_cpus": NUM_CPUS,
        "object_store_gb": STORE_GB,
        "wall_sec": wall, "pages": pages,
        "pages_per_sec": round(pages / wall, 1),
        "n_triples": n_triples,
        "peak_spill_bytes": peak["bytes"],
        "peak_spill_gb": round(peak["bytes"] / 1e9, 2),
        "end_spill_bytes": end_spill,
    }))
    ray.shutdown()
    shutil.rmtree(TEMP_DIR, ignore_errors=True)


if __name__ == "__main__":
    main()
