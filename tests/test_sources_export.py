"""Reader / writer / export tests (SURVEY §2.1)."""

from __future__ import annotations

import json
import os

import pandas as pd
import pytest

import ray.data as rd


def test_clinical_csv_reader_tsv_fallback(tmp_path):
    from omop2obo_ray.sources.readers import read_clinical_csv

    p = tmp_path / "c.csv"
    p.write_text("A,B\n1,x\n2,y\n")
    df = read_clinical_csv(str(p))
    assert df.shape == (2, 2) and (df.dtypes == object).all()
    # every column string (clinical_concept_annotator.py:97)
    assert df["A"].tolist() == ["1", "2"]


def test_mrconso_reader_filters(tmp_path):
    from omop2obo_ray.sources.readers import read_mrconso

    lines = [
        "C0001|ENG|x|x|x|x|x|x|x|x|x|SNOMEDCT_US|x|12345|name one|x|x|x",
        "C0002|CZE|x|x|x|x|x|x|x|x|x|SNOMEDCT_US|x|22345|cizi|x|x|x",
        "C0003|ENG|x|x|x|x|x|x|x|x|x|RXNORM|x|NOCODE|nameless|x|x|x",
    ]
    p = tmp_path / "MRCONSO.RRF"
    p.write_text("\n".join(lines) + "\n")
    df = read_mrconso(str(p))
    assert df["cui"].tolist() == ["C0001"]
    assert df.iloc[0]["sab"] == "SNOMEDCT_US" and df.iloc[0]["code"] == "12345"
    assert df.iloc[0]["surface"] == "name one"


def test_mrsty_reader(tmp_path):
    from omop2obo_ray.sources.readers import read_mrsty

    p = tmp_path / "MRSTY.RRF"
    p.write_text("C0001|a|b|Disease or Syndrome|c\nC0002|a|b|Finding|c\n")
    df = read_mrsty(str(p))
    assert df["sty"].tolist() == ["Disease or Syndrome", "Finding"]


def test_vocab_map_reader(tmp_path):
    from omop2obo_ray.sources.readers import read_vocab_map_csv

    p = tmp_path / "vm.csv"
    p.write_text("primary,aliases\nsnomed,SNOMEDCT_US | sctid\n")
    df = read_vocab_map_csv(str(p))
    assert df.iloc[0]["abbreviations"] == ["SNOMEDCT_US", "sctid"]


def test_lexicon_tables_roundtrip(tmp_path, fixture_frames):
    from omop2obo_ray.sources.readers import write_lexicon_tables
    from omop2obo_ray.state.lexicon import load_lexicon_from_dir

    d = str(tmp_path / "lex")
    write_lexicon_tables(
        d, fixture_frames["concepts"], fixture_frames["dbxrefs"],
        fixture_frames["aliases"], fixture_frames["semtypes"],
        fixture_frames["ancestors"], fixture_frames["vocab_map"], version="42",
    )
    assert json.load(open(os.path.join(d, "lexicon_version.json")))["version"] == "42"
    lex = load_lexicon_from_dir(d)
    assert len(lex.patterns) > 0 and len(lex.labels) > 0


def test_export_release(ray_session, tmp_path):
    from omop2obo_ray.pipelines.export import export_release

    triples = rd.from_pandas(pd.DataFrame(
        [
            {"subj": "u1", "pred": "Automatic Exact - Concept", "obj": "HP_1",
             "ontology": "hp", "evidence": "e1"},
            {"subj": "u1", "pred": "Unmapped", "obj": "", "ontology": "hp",
             "evidence": ""},
            {"subj": "u2", "pred": "Manual Exact - Concept Similarity",
             "obj": "MONDO_2", "ontology": "mondo", "evidence": "e2"},
        ]
    ))
    out = str(tmp_path / "release")
    export_release(triples, out)
    csvs = [f for f in os.listdir(f"{out}/triples_csv")]
    assert csvs
    csv_rows = sum(
        len(pd.read_csv(f"{out}/triples_csv/{f}")) for f in csvs
    )
    assert csv_rows == 2  # Unmapped filtered out
    json_files = os.listdir(f"{out}/concept_sets_json")
    recs = []
    for f in json_files:
        with open(f"{out}/concept_sets_json/{f}") as fh:
            recs += [json.loads(line) for line in fh if line.strip()]
    subj_map = {r["subj"]: r for r in recs}
    assert subj_map["u1"]["n_concepts"] == 1
    assert json.loads(subj_map["u2"]["expression"])["items"][0]["concept"] == "MONDO_2"
