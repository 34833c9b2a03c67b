"""Readers for the reference's input formats (SURVEY §2.1 S1-S4).

All readers return pandas DataFrames for dimension-sized inputs (they
are broadcast, not distributed) or ``ray.data.Dataset`` for fact-sized
inputs. The RRF reader streams via Ray when the file is large
(production MRCONSO is multi-GB — SURVEY §2.3 T5).
"""

from __future__ import annotations

import os

import pandas as pd


def read_clinical_csv(path: str) -> pd.DataFrame:
    """Clinical CSV reader with TSV fallback, every column as string —
    faithful to clinical_concept_annotator.py:96-99 (ParserError →
    ``sep='\\t'``) and the ``.astype(str)`` monotype load (:97)."""
    try:
        df = pd.read_csv(path, header=0, low_memory=False)
    except pd.errors.ParserError:
        df = pd.read_csv(path, header=0, sep="\t", low_memory=False)
    return df.astype(str)


# MRCONSO column layout (pipe-delimited, 18 cols); the reference keeps
# cols 0 (CUI), 1 (LANG), 11 (SAB), 13 (CODE) and col 14 (STR) holds the
# name string (clinical_concept_annotator.py:158-169)
_MRCONSO_KEEP = {0: "cui", 1: "lang", 11: "sab", 13: "code", 14: "surface"}
_MRSTY_KEEP = {0: "cui", 3: "sty"}


def read_rrf(path: str, keep: dict[int, str]) -> pd.DataFrame:
    """Pipe-delimited RRF reader keeping selected columns by position."""
    df = pd.read_csv(path, sep="|", header=None, dtype=str, index_col=False,
                     keep_default_na=False)
    cols = {i: name for i, name in keep.items() if i < df.shape[1]}
    out = df[list(cols.keys())].copy()
    out.columns = [cols[i] for i in out.columns]
    return out


def read_mrconso(path: str, english_only: bool = True) -> pd.DataFrame:
    """MRCONSO-style reader with the reference's filters: drop
    ``CODE=='NOCODE'`` rows and (by default) keep ``LANG=='ENG'``
    (clinical_concept_annotator.py:163-166)."""
    df = read_rrf(path, _MRCONSO_KEEP)
    for col in _MRCONSO_KEEP.values():  # tolerate truncated malformed rows
        if col not in df.columns:
            df[col] = ""
    df = df[df["code"] != "NOCODE"]
    if english_only:
        df = df[df["lang"] == "ENG"]
    return df.reset_index(drop=True)


def read_mrsty(path: str) -> pd.DataFrame:
    """MRSTY-style reader → (cui, sty)
    (clinical_concept_annotator.py:182-185)."""
    return read_rrf(path, _MRSTY_KEEP).reset_index(drop=True)


def read_vocab_map_csv(path: str) -> pd.DataFrame:
    """source_code_vocab_map.csv loader: splits the `` | ``-delimited
    alias list (clinical_concept_annotator.py:78-85) into the engine's
    list<string> ``abbreviations`` column."""
    raw = pd.read_csv(path, header=0, dtype=str, keep_default_na=False)
    prim_col, abbr_col = raw.columns[0], raw.columns[1]
    return pd.DataFrame(
        {
            "primary_abbreviation": raw[prim_col],
            "abbreviations": [
                [a.strip() for a in str(v).split("|") if a.strip()]
                for v in raw[abbr_col]
            ],
        }
    )


def write_lexicon_tables(out_dir: str, concepts: pd.DataFrame,
                         dbxrefs: pd.DataFrame, aliases: pd.DataFrame,
                         semtypes: pd.DataFrame, ancestors: pd.DataFrame,
                         vocab_map: pd.DataFrame, version: str = "1") -> None:
    """Versioned Parquet dimension tables — the engine's replacement for
    the reference's per-ontology pickles + master pickle
    (ontology_explorer.py:100-138; SURVEY §2.1 S7)."""
    import json

    import pyarrow as pa
    import pyarrow.parquet as pq

    from omop2obo_ray import schemas

    os.makedirs(out_dir, exist_ok=True)
    for name, df, schema in [
        ("concepts", concepts, schemas.CONCEPTS),
        ("dbxrefs", dbxrefs, schemas.DBXREFS),
        ("aliases", aliases, schemas.ALIASES),
        ("semtypes", semtypes, schemas.SEMTYPES),
        ("ancestors", ancestors, schemas.ANCESTORS),
        ("vocab_map", vocab_map, schemas.VOCAB_MAP),
    ]:
        pq.write_table(
            pa.Table.from_pandas(df, schema=schema, preserve_index=False),
            os.path.join(out_dir, f"{name}.parquet"),
        )
    with open(os.path.join(out_dir, "lexicon_version.json"), "w") as f:
        json.dump({"version": version,
                   "tables": ["concepts", "dbxrefs", "aliases", "semtypes",
                              "ancestors", "vocab_map"]}, f)


def read_rrf_ray(path: str, keep: dict[int, str] | None = None,
                 english_only: bool = True):
    """Distributed RRF (MRCONSO-style) reader — the scale path for the
    multi-GB production files (SURVEY §2.3 T5): ``ray.data.read_csv``
    with a pipe-delimiter parse, column pruning and the reference's
    NOCODE/ENG filters applied vectorized per batch
    (clinical_concept_annotator.py:158-169). Returns a Dataset; the
    pandas ``read_mrconso`` stays the dimension-sized path."""
    import pyarrow as pa
    from pyarrow import csv as pacsv

    import ray.data as rd

    keep = keep or _MRCONSO_KEEP
    # 18 data fields + the empty 19th from the trailing '|' every RRF
    # line carries
    names = [f"c{i}" for i in range(19)]
    ds = rd.read_csv(
        path,
        read_options=pacsv.ReadOptions(column_names=names),
        parse_options=pacsv.ParseOptions(delimiter="|"),
        convert_options=pacsv.ConvertOptions(
            column_types={n: pa.string() for n in names},
            # RRF lines end with a trailing '|' → a 19th empty column
            include_columns=[f"c{i}" for i in sorted(keep)],
            include_missing_columns=True,
        ),
    )

    def clean(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        out = pa.table({name: batch[f"c{i}"] for i, name in sorted(keep.items())})
        if "code" in out.column_names:
            out = out.filter(pc.invert(pc.equal(out["code"], "NOCODE")))
        if english_only and "lang" in out.column_names:
            out = out.filter(pc.equal(out["lang"], "ENG"))
        return out

    return ds.map_batches(clean, batch_format="pyarrow", batch_size=None)


def read_jsonl_docs(path: str, columns: list[str] | None = None):
    """Distributed JSONL document reader — crawl dumps and annotation
    exports commonly arrive as newline-delimited JSON rather than
    Parquet. Thin wrapper over ``ray.data.read_json`` (pyarrow JSON
    reader under the hood: parallel per-file tasks, block-native) with
    optional column pruning applied as a projection immediately after
    the read. Returns a Dataset."""
    import ray.data as rd

    ds = rd.read_json(path)
    if columns:
        ds = ds.select_columns(columns)
    return ds


def write_jsonl(ds, out_dir: str) -> None:
    """Partitioned JSONL sink (one file per block via Ray's native
    ``write_json``) — the interchange format for downstream annotation
    tooling. Resumable the same way the parquet sinks are: one file
    per block, re-runs overwrite whole directories."""
    ds.write_json(out_dir)
