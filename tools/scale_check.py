"""Engine-vs-oracle P/R at 10× fixture scale (the BASELINE.md scale
check, made repeatable): 1,000 pages × 1,000 ontology classes, seed 7.

Usage: python tools/scale_check.py [n_pages] [n_classes] [seed]
Prints one JSON line with precision / recall vs the independent pandas
oracle (omop2obo_ray/fixtures/oracle.py).
"""

from __future__ import annotations

import json
import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    n_pages = int(sys.argv[1]) if len(sys.argv) > 1 else 1000
    n_classes = int(sys.argv[2]) if len(sys.argv) > 2 else 1000
    seed = int(sys.argv[3]) if len(sys.argv) > 3 else 7

    import ray

    if not ray.is_initialized():
        ray.init(address="local", include_dashboard=False, logging_level="ERROR")
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False

    import pyarrow.parquet as pq
    import ray.data as rd

    from omop2obo_ray.fixtures.gen import make_fixtures
    from omop2obo_ray.fixtures.oracle import oracle_triples, precision_recall
    from omop2obo_ray.pipelines.kg import build_kg
    from omop2obo_ray.state.lexicon import load_lexicon_from_dir

    with tempfile.TemporaryDirectory() as d:
        make_fixtures(d, n_pages=n_pages, n_classes_per_ont=n_classes, seed=seed)
        lexicon = load_lexicon_from_dir(d)
        pages = rd.read_parquet(os.path.join(d, "pages.parquet"))
        eng_df = build_kg(pages, lexicon).to_pandas()
        frames = {
            n: pq.read_table(os.path.join(d, f"{n}.parquet")).to_pandas()
            for n in ("pages", "concepts", "dbxrefs", "aliases", "semtypes",
                      "ancestors", "vocab_map", "gold_triples")
        }
        odf = oracle_triples(frames)
        eng = set(zip(eng_df.subj, eng_df.pred, eng_df.obj))
        orc = set(zip(odf.subj, odf.pred, odf.obj))
        p, r = precision_recall(eng, orc)
        print(json.dumps({
            "metric": "oracle_pr", "n_pages": n_pages, "n_classes": n_classes,
            "seed": seed, "precision": round(p, 4), "recall": round(r, 4),
            "engine_triples": len(eng), "oracle_triples": len(orc),
        }))
    ray.shutdown()


if __name__ == "__main__":
    main()
