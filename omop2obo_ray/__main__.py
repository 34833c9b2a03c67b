"""CLI entry point — the engine's analogue of the reference's click CLI
(main.py:18-33): bind column roles + ontology set + thresholds, run the
pipeline stages.

    python -m omop2obo_ray lexicon-build --obo hp=path/hp.obo \
        [--mrconso MRCONSO.RRF --mrsty MRSTY.RRF --vocab-map vm.csv] --out lex/
    python -m omop2obo_ray build-kg --pages pages_dir_or_file.parquet \
        --lexicon lex/ --out triples/ [--ontologies hp,mondo]
    python -m omop2obo_ray export --triples triples/ --out release/

Owns its Ray session (guarded init) — the driver contract in
``__ray_entry__`` never touches ray.init.
"""

from __future__ import annotations

import argparse
import json
import sys


def _ray():
    import ray

    if not ray.is_initialized():
        ray.init(address="local", include_dashboard=False, logging_level="ERROR")
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False
    return ray


def cmd_lexicon_build(args) -> int:
    import pandas as pd

    from omop2obo_ray.sources.obo import parse_obo_file
    from omop2obo_ray.sources.readers import (
        read_mrconso,
        read_mrsty,
        read_vocab_map_csv,
        write_lexicon_tables,
    )

    concepts, dbxrefs, ancestors = [], [], []
    for spec in args.obo:
        ont, _, path = spec.partition("=")
        out = parse_obo_file(path, ont)
        concepts.append(out["concepts"])
        dbxrefs.append(out["dbxrefs"])
        ancestors.append(out["ancestors"])
    aliases = (read_mrconso(args.mrconso) if args.mrconso
               else pd.DataFrame(columns=["cui", "lang", "sab", "code", "surface"]))
    semtypes = (read_mrsty(args.mrsty) if args.mrsty
                else pd.DataFrame(columns=["cui", "sty"]))
    vocab_map = (read_vocab_map_csv(args.vocab_map) if args.vocab_map
                 else pd.DataFrame(columns=["primary_abbreviation", "abbreviations"]))
    write_lexicon_tables(
        args.out,
        pd.concat(concepts, ignore_index=True),
        pd.concat(dbxrefs, ignore_index=True),
        aliases, semtypes,
        pd.concat(ancestors, ignore_index=True),
        vocab_map,
        version=args.version,
    )
    print(f"lexicon tables written to {args.out}")
    return 0


def cmd_build_kg(args) -> int:
    ray = _ray()
    import ray.data as rd

    from omop2obo_ray.config import DEFAULT_CONFIG
    from omop2obo_ray.pipelines.kg import run_kg_to_dir
    from omop2obo_ray.state.lexicon import load_lexicon_from_dir

    onts = tuple(args.ontologies.split(","))
    cfg = DEFAULT_CONFIG.with_(
        ontologies=onts,
        languages=tuple(args.languages.split(",")),
        sim_threshold=args.sim_threshold,
        subject_buckets=args.buckets,
    )
    lexicon = load_lexicon_from_dir(args.lexicon, ontologies=onts)
    pages = rd.read_parquet(args.pages)
    manifest = run_kg_to_dir(pages, lexicon, args.out, cfg)
    total = sum(p["rows"] for p in manifest["partitions"].values())
    print(json.dumps({"out": args.out, "buckets": len(manifest["partitions"]),
                      "triples": total}))
    ray.shutdown()
    return 0


def cmd_build_kg_warc(args) -> int:
    ray = _ray()

    from omop2obo_ray.config import DEFAULT_CONFIG
    from omop2obo_ray.pipelines.kg import run_warc_to_ntriples
    from omop2obo_ray.state.lexicon import load_lexicon_from_dir

    onts = tuple(args.ontologies.split(","))
    cfg = DEFAULT_CONFIG.with_(
        ontologies=onts,
        languages=tuple(args.languages.split(",")),
        sim_threshold=args.sim_threshold,
    )
    lexicon = load_lexicon_from_dir(args.lexicon, ontologies=onts)
    manifest = run_warc_to_ntriples(
        args.warc, lexicon, args.out, cfg,
        default_lang=args.default_lang)
    print(json.dumps({"out": args.out, "parts": len(manifest),
                      "triples": int(manifest["rows"].sum())}))
    ray.shutdown()
    return 0


def cmd_update_kg(args) -> int:
    """Crawl-refresh: merge a new pages batch into a published store."""
    ray = _ray()
    import ray.data as rd

    from omop2obo_ray.config import DEFAULT_CONFIG
    from omop2obo_ray.pipelines.kg import build_kg
    from omop2obo_ray.stages.checkpoint import merge_triples_into_store
    from omop2obo_ray.state.lexicon import load_lexicon_from_dir

    onts = tuple(args.ontologies.split(","))
    cfg = DEFAULT_CONFIG.with_(ontologies=onts,
                               subject_buckets=args.buckets)
    lexicon = load_lexicon_from_dir(args.lexicon, ontologies=onts)
    pages = rd.read_parquet(args.pages)
    triples = build_kg(pages, lexicon, cfg)
    manifest = merge_triples_into_store(triples, args.out, cfg.subject_buckets)
    total = sum(p["rows"] for p in manifest["partitions"].values())
    print(json.dumps({"out": args.out, "buckets": len(manifest["partitions"]),
                      "triples": total}))
    ray.shutdown()
    return 0


def cmd_export(args) -> int:
    ray = _ray()
    import glob
    import os

    import ray.data as rd

    from omop2obo_ray.pipelines.export import export_release

    # a triples dir contains subject_bucket=N/ partitions + manifest.json;
    # read only the parquet partitions
    if os.path.isdir(args.triples):
        paths = sorted(
            glob.glob(os.path.join(args.triples, "subject_bucket=*", "*.parquet"))
        ) or [args.triples]
    else:
        paths = [args.triples]
    triples = rd.read_parquet(paths)
    export_release(triples, args.out)
    print(f"release written to {args.out}")
    ray.shutdown()
    return 0


def main(argv: list[str] | None = None) -> int:
    p = argparse.ArgumentParser(prog="omop2obo_ray")
    sub = p.add_subparsers(dest="cmd", required=True)

    lb = sub.add_parser("lexicon-build", help="OBO/RRF → parquet lexicon tables")
    lb.add_argument("--obo", action="append", required=True,
                    metavar="ONT=PATH", help="e.g. hp=hp.obo (repeatable)")
    lb.add_argument("--mrconso")
    lb.add_argument("--mrsty")
    lb.add_argument("--vocab-map")
    lb.add_argument("--out", required=True)
    lb.add_argument("--version", default="1")
    lb.set_defaults(fn=cmd_lexicon_build)

    bk = sub.add_parser("build-kg", help="pages parquet → triples")
    bk.add_argument("--pages", required=True)
    bk.add_argument("--lexicon", required=True)
    bk.add_argument("--out", required=True)
    bk.add_argument("--ontologies", default="hp,mondo")
    bk.add_argument("--languages", default="en")
    bk.add_argument("--sim-threshold", type=float, default=0.25)
    bk.add_argument("--buckets", type=int, default=16)
    bk.set_defaults(fn=cmd_build_kg)

    bw = sub.add_parser("build-kg-warc",
                        help=".warc(.gz) segments → N-Triples parts")
    bw.add_argument("--warc", required=True,
                    help="segment file or directory")
    bw.add_argument("--lexicon", required=True)
    bw.add_argument("--out", required=True)
    bw.add_argument("--ontologies", default="hp,mondo")
    bw.add_argument("--languages", default="en")
    bw.add_argument("--sim-threshold", type=float, default=0.25)
    bw.add_argument("--default-lang", default=None,
                    help="skip language-ID, tag every page with this")
    bw.set_defaults(fn=cmd_build_kg_warc)

    uk = sub.add_parser("update-kg",
                        help="merge new pages into a published store")
    uk.add_argument("--pages", required=True)
    uk.add_argument("--lexicon", required=True)
    uk.add_argument("--out", required=True)
    uk.add_argument("--ontologies", default="hp,mondo")
    uk.add_argument("--buckets", type=int, default=16)
    uk.set_defaults(fn=cmd_update_kg)

    ex = sub.add_parser("export", help="triples → release CSV/JSON")
    ex.add_argument("--triples", required=True)
    ex.add_argument("--out", required=True)
    ex.set_defaults(fn=cmd_export)

    args = p.parse_args(argv)
    return args.fn(args)


if __name__ == "__main__":
    sys.exit(main())
