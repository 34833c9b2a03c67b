"""CLI end-to-end: lexicon-build → build-kg → export."""

from __future__ import annotations

import json
import os
import subprocess
import sys

import pyarrow.parquet as pq

OBO = """format-version: 1.2

[Term]
id: HP:0000001
name: crimson finding

[Term]
id: HP:0000002
name: livid disorder
synonym: "pallor pattern" EXACT []
is_a: HP:0000001
"""


def test_cli_pipeline_end_to_end(tmp_path, fixture_dir):
    obo = tmp_path / "hp.obo"
    obo.write_text(OBO)
    lexdir = str(tmp_path / "lex")
    out = subprocess.run(
        [sys.executable, "-m", "omop2obo_ray", "lexicon-build",
         "--obo", f"hp={obo}", "--out", lexdir],
        capture_output=True, text=True, cwd="/root/repo",
    )
    assert out.returncode == 0, out.stderr
    assert os.path.exists(f"{lexdir}/concepts.parquet")

    # pages that mention the OBO labels
    import pandas as pd
    import pyarrow as pa

    from omop2obo_ray import schemas
    from omop2obo_ray.functions.html import expected_text, render_page_html

    paras = ["A clear crimson finding here.", "Also a pallor pattern appears."]
    pages = pd.DataFrame(
        [{"url": "https://x/p1", "warc_ts": pd.Timestamp("2024-01-01"),
          "html": render_page_html("t", paras),
          "text": expected_text("t", paras), "lang": "en"}]
    )
    pages_path = str(tmp_path / "pages.parquet")
    pq.write_table(pa.Table.from_pandas(pages, schema=schemas.PAGES,
                                        preserve_index=False), pages_path)

    triples_dir = str(tmp_path / "triples")
    out = subprocess.run(
        [sys.executable, "-m", "omop2obo_ray", "build-kg",
         "--pages", pages_path, "--lexicon", lexdir, "--out", triples_dir,
         "--ontologies", "hp", "--buckets", "4"],
        capture_output=True, text=True, cwd="/root/repo",
    )
    assert out.returncode == 0, out.stderr
    info = json.loads(out.stdout.strip().splitlines()[-1])
    assert info["triples"] == 2  # both mentions linked
    manifest = json.load(open(f"{triples_dir}/manifest.json"))
    assert len(manifest["partitions"]) == 4

    release_dir = str(tmp_path / "release")
    out = subprocess.run(
        [sys.executable, "-m", "omop2obo_ray", "export",
         "--triples", triples_dir, "--out", release_dir],
        capture_output=True, text=True, cwd="/root/repo",
    )
    assert out.returncode == 0, out.stderr
    assert os.listdir(f"{release_dir}/triples_csv")


def test_cli_build_kg_warc(tmp_path, ray_session):
    """lexicon-build → write a gzip WARC segment → build-kg-warc →
    N-Triples parts with the expected triples."""
    import pandas as pd
    import ray.data as rd

    from omop2obo_ray.functions.html import expected_text, render_page_html
    from omop2obo_ray.sources.ntriples import read_ntriples
    from omop2obo_ray.sources.warc import write_warc

    obo = tmp_path / "hp.obo"
    obo.write_text(OBO)
    lexdir = str(tmp_path / "lex")
    out = subprocess.run(
        [sys.executable, "-m", "omop2obo_ray", "lexicon-build",
         "--obo", f"hp={obo}", "--out", lexdir],
        capture_output=True, text=True, cwd="/root/repo",
    )
    assert out.returncode == 0, out.stderr

    paras = ["A clear crimson finding here.", "Also a pallor pattern appears."]
    seg = str(tmp_path / "seg")
    write_warc(rd.from_pandas(pd.DataFrame({
        "url": ["https://x/p1"],
        "warc_ts": ["2024-01-01T00:00:00Z"],
        "payload": [render_page_html("t", paras)]})), seg,
        compression="gzip")

    nt_out = str(tmp_path / "nt")
    out = subprocess.run(
        [sys.executable, "-m", "omop2obo_ray", "build-kg-warc",
         "--warc", seg, "--lexicon", lexdir, "--out", nt_out,
         "--ontologies", "hp", "--default-lang", "en"],
        capture_output=True, text=True, cwd="/root/repo",
    )
    assert out.returncode == 0, out.stderr
    info = json.loads(out.stdout.strip().splitlines()[-1])
    assert info["triples"] == 2
    back = read_ntriples(nt_out).to_pandas()
    assert len(back) == 2 and set(back["subject"]) == {"https://x/p1"}
