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


def _mini_mappings():
    import pandas as pd

    return pd.DataFrame([
        {"CONCEPT_ID": 101, "CONCEPT_NAME": "pain of head", "CONCEPT_CODE": "101",
         "CONCEPT_VOCAB": "URL", "MAPPING_CATEGORY": "Automatic Exact - Concept",
         "MAPPING_EVIDENCE": "OBO_LABEL:pain", "ONTOLOGY_LOGIC": "N/A",
         "ONTOLOGY_URI": "HP_0000001", "ONTOLOGY_LABEL": "pain"},
        {"CONCEPT_ID": 102, "CONCEPT_NAME": "rare thing", "CONCEPT_CODE": "102",
         "CONCEPT_VOCAB": "URL", "MAPPING_CATEGORY": "Automatic Constructor - Concept",
         "MAPPING_EVIDENCE": "OBO_LABEL:rare | OBO_DbXref:x", "ONTOLOGY_LOGIC": "AND",
         "ONTOLOGY_URI": "HP_0000002 | MONDO_0000003",
         "ONTOLOGY_LABEL": "rare a | rare b"},
    ])


def test_export_n3c_artifact_set(ray_session, tmp_path):
    """Artifact fidelity vs n3c_mapping_conversion.py:116-324: per-
    concept Atlas JSON, persisted + versioned codeset-id dicts, and the
    three Enclave CSVs with the reference's exact column sets."""
    import json
    import os

    import pandas as pd
    import ray.data as rd

    from omop2obo_ray.pipelines.export import export_n3c_release

    out = str(tmp_path / "n3c")
    arts = export_n3c_release(rd.from_pandas(_mini_mappings()), out)
    # per-concept JSON files named {id}-{sanitized_label}.json
    files = sorted(os.listdir(arts["atlas_json_dir"]))
    assert files == ["101-pain_of_head.json", "102-rare_thing.json"]
    atlas = json.load(open(os.path.join(arts["atlas_json_dir"], files[0])))
    assert atlas["items"]["concept"]["CONCEPT_ID"] == 101
    assert atlas["items"]["ONTOLOGY_CONCEPT_MAPPING_MEMBERS"]["identifiers"] == "hp_0000001"
    # codeset ids start at the reference's 900000000 counter
    ids = json.load(open(arts["codeset_id_dict"]))
    assert sorted(ids.values()) == [900000000, 900000001]
    # three Enclave CSVs with the reference's exact columns
    container = pd.read_csv(arts["container_csv"])
    assert list(container.columns) == [
        "concept_set_id", "concept_set_name", "intention",
        "assigned_informatician", "assigned_sme", "project_id", "status",
        "stage", "n3c_reviewer", "alias", "archived", "created_by", "created_at"]
    version = pd.read_csv(arts["version_csv"])
    assert list(version.columns) == [
        "codeset_id", "concept_set_id", "concept_set_version_title", "project",
        "source_application", "source_application_version", "created_at",
        "atlas_json", "most_recent_version", "comments", "intention",
        "limitations", "issues", "update_message", "status", "has_review",
        "reviewed_by", "created_by", "provenance", "atlas_json_resource_url",
        "parent_version_id", "is_draft"]
    items = pd.read_csv(arts["items_csv"])
    assert list(items.columns) == [
        "codeset_id", "concept_id", "code", "codeSystem", "ontology_id",
        "ontology_label", "mapping_category", "mapping_logic",
        "mapping_evidence", "isExcluded", "includeDescendants", "includeMapped",
        "item_id", "annotation", "created_by", "created_at"]
    assert container["concept_set_id"].tolist() == [
        "[OMOP2OBO] 101-pain_of_head", "[OMOP2OBO] 102-rare_thing"]


def test_export_n3c_codeset_ids_stable_across_reruns(ray_session, tmp_path):
    """Re-exports reuse persisted codeset ids; new concepts get the
    next free id (n3c_mapping_conversion.py:382-388 resume semantics)."""
    import json

    import pandas as pd
    import ray.data as rd

    from omop2obo_ray.pipelines.export import export_n3c_release

    out = str(tmp_path / "n3c")
    m = _mini_mappings()
    arts1 = export_n3c_release(rd.from_pandas(m), out)
    ids1 = json.load(open(arts1["codeset_id_dict"]))
    # second run with one extra concept: old ids unchanged, new appended
    extra = pd.concat([m, pd.DataFrame([{
        "CONCEPT_ID": 103, "CONCEPT_NAME": "new thing", "CONCEPT_CODE": "103",
        "CONCEPT_VOCAB": "URL", "MAPPING_CATEGORY": "Manual Exact - Concept Similarity",
        "MAPPING_EVIDENCE": "CONCEPT_SIMILARITY:HP_0000009_0.7",
        "ONTOLOGY_LOGIC": "N/A", "ONTOLOGY_URI": "HP_0000009",
        "ONTOLOGY_LABEL": "newly mapped"}])], ignore_index=True)
    arts2 = export_n3c_release(rd.from_pandas(extra), out)
    ids2 = json.load(open(arts2["codeset_id_dict"]))
    assert {k: ids2[k] for k in ids1} == ids1
    assert ids2["103"] == max(ids1.values()) + 1
    # version CSV rows carry the stable ids
    version = pd.read_csv(arts2["version_csv"])
    assert set(version["codeset_id"]) == set(ids2.values())


def test_triples_to_mapping_table(ray_session, tmp_path):
    import pandas as pd
    import ray.data as rd

    from omop2obo_ray.pipelines.export import triples_to_mapping_table

    triples = rd.from_pandas(pd.DataFrame([
        {"subj": "http://a", "pred": "Automatic Exact - Concept",
         "obj": "HP_1", "ontology": "hp", "evidence": "OBO_LABEL:x"},
        {"subj": "http://a", "pred": "Automatic Exact - Concept",
         "obj": "MONDO_2", "ontology": "mondo", "evidence": "OBO_LABEL:y"},
        {"subj": "http://b", "pred": "Automatic Exact - Ancestor",
         "obj": "HP_3", "ontology": "hp", "evidence": "OBO_LABEL:z"},
    ]))
    df = triples_to_mapping_table(triples).to_pandas().sort_values(
        "CONCEPT_NAME").reset_index(drop=True)
    assert df["CONCEPT_NAME"].tolist() == ["http://a", "http://b"]
    assert df.loc[0, "ONTOLOGY_URI"] == "HP_1 | MONDO_2"
    assert df.loc[0, "ONTOLOGY_LOGIC"] == "AND"
    assert df.loc[1, "ONTOLOGY_LOGIC"] == "N/A"
    assert (df["CONCEPT_ID"] == df["CONCEPT_CODE"].astype(int)).all()


def test_read_rrf_ray_matches_pandas(ray_session, tmp_path):
    """The distributed RRF reader applies the same NOCODE/ENG filters
    as the pandas path and returns identical rows."""
    import pandas as pd

    from omop2obo_ray.sources.readers import read_mrconso, read_rrf_ray

    lines = [
        "C001|ENG|x|x|x|x|x|x|x|x|x|SNOMED|x|111|headache pain|x|x|x|",
        "C002|FRE|x|x|x|x|x|x|x|x|x|SNOMED|x|222|douleur|x|x|x|",
        "C003|ENG|x|x|x|x|x|x|x|x|x|ICD10|x|NOCODE|nothing|x|x|x|",
        "C004|ENG|x|x|x|x|x|x|x|x|x|ICD10|x|333|fever|x|x|x|",
    ]
    p = tmp_path / "MRCONSO.RRF"
    p.write_text("\n".join(lines) + "\n")
    want = read_mrconso(str(p)).sort_values("cui").reset_index(drop=True)
    got = read_rrf_ray(str(p)).to_pandas().sort_values("cui").reset_index(drop=True)
    pd.testing.assert_frame_equal(got[want.columns], want)
    assert got["cui"].tolist() == ["C001", "C004"]


def test_clip_excel_cells(ray_session):
    import pandas as pd
    import ray.data as rd

    from omop2obo_ray.pipelines.export import clip_excel_cells

    ds = rd.from_pandas(pd.DataFrame({
        "k": [1, 2], "text": ["x" * 40000, "short"], "n": [40000, 5]}))
    out = clip_excel_cells(ds).to_pandas()
    assert len(out.loc[0, "text"]) == 32500  # clipped
    assert out.loc[1, "text"] == "short"     # untouched
    assert out["n"].tolist() == [40000, 5]   # non-string columns pass through


def test_read_parquet_uri_scheme(ray_session):
    """S10: native URI-scheme reads (the GCS path is the same API with
    a gs:// URI; local:// proves the scheme plumbing in-sandbox)."""
    import ray.data as rd

    ds = rd.read_parquet("local:///root/testdata/sf0.001/nation.parquet",
                         columns=["n_nationkey", "n_name"])
    df = ds.to_pandas()
    assert len(df) == 25 and list(df.columns) == ["n_nationkey", "n_name"]


def test_jsonl_roundtrip(ray_session, tmp_path):
    import pandas as pd
    import ray.data as rd

    from omop2obo_ray.sources.readers import read_jsonl_docs, write_jsonl

    df = pd.DataFrame({
        "doc_id": [1, 2, 3],
        "text": ["alpha beta", "gamma", "delta epsilon"],
        "lang": ["en", "en", "de"]})
    out = str(tmp_path / "jsonl")
    write_jsonl(rd.from_pandas(df), out)
    back = (read_jsonl_docs(out, columns=["doc_id", "text"])
            .to_pandas().sort_values("doc_id").reset_index(drop=True))
    assert back["doc_id"].tolist() == [1, 2, 3]
    assert back["text"].tolist() == ["alpha beta", "gamma", "delta epsilon"]
    assert list(back.columns) == ["doc_id", "text"]


def test_ntriples_roundtrip_specials(ray_session, tmp_path):
    from omop2obo_ray.sources.ntriples import (read_ntriples,
                                               write_ntriples)

    df = pd.DataFrame({
        "subject": ["urn:a", "urn:b", "urn:c", "urn:d", "urn:e"],
        "predicate": ["urn:p"] * 5,
        "object": ["plain", 'has "quotes" and \\backslash\\',
                   "tab\there\nnewline\rcr", "https://example.org/x",
                   "unicodé — ✓"],
    })
    d = str(tmp_path / "nt")
    man = write_ntriples(rd.from_pandas(df).repartition(2), d)
    assert man["rows"].sum() == 5 and len(man) >= 1
    back = (read_ntriples(d).to_pandas()
            .sort_values("subject").reset_index(drop=True))
    want = df.sort_values("subject").reset_index(drop=True)
    assert (back["object"] == want["object"]).all()
    assert list(back["obj_is_iri"]) == [False, False, False, True, False]
    # every triple is exactly one physical line (escaping worked)
    n_lines = sum(open(os.path.join(d, f)).read().count("\n")
                  for f in os.listdir(d))
    assert n_lines == 5


def test_ntriples_reader_rejects_malformed_and_skips_comments(
        ray_session, tmp_path):
    from omop2obo_ray.sources.ntriples import read_ntriples

    good = tmp_path / "good.nt"
    good.write_text('# comment\n\n<urn:s> <urn:p> "v" .\n')
    got = read_ntriples(str(good)).to_pandas()
    assert got["object"].tolist() == ["v"]

    bad = tmp_path / "bad.nt"
    bad.write_text("<urn:s> <urn:p> unquoted .\n")
    with pytest.raises(Exception, match="malformed"):
        read_ntriples(str(bad)).materialize()


def test_warc_roundtrip_binary_safe(ray_session, tmp_path):
    """Payloads containing CRLFCRLF and full WARC banners must
    round-trip byte-exact (Content-Length framing, not splitting)."""
    from omop2obo_ray.sources.warc import read_warc, write_warc

    df = pd.DataFrame({
        "url": [f"https://ex.org/{i}" for i in range(4)],
        "warc_ts": ["2024-01-01T00:00:00Z"] * 4,
        "payload": [b"plain", b"has \r\n\r\n inside",
                    b"WARC/1.0\r\nfake banner", bytes(range(256))],
    })
    d = str(tmp_path / "warc")
    man = write_warc(rd.from_pandas(df).repartition(2), d)
    assert man["rows"].sum() == 4
    back = (read_warc(d).to_pandas()
            .sort_values("url").reset_index(drop=True))
    want = df.sort_values("url").reset_index(drop=True)
    assert list(back["url"]) == list(want["url"])
    assert list(back["warc_ts"]) == list(want["warc_ts"])
    assert all(a == b for a, b in zip(back["payload"], want["payload"]))


def test_warc_reader_rejects_truncation(ray_session, tmp_path):
    from omop2obo_ray.sources.warc import read_warc

    bad = tmp_path / "bad.warc"
    bad.write_bytes(b"WARC/1.0\r\nContent-Length: 100\r\n\r\nshort")
    with pytest.raises(Exception, match="truncated"):
        read_warc(str(bad)).materialize()


def test_jsonl_roundtrip_specials(ray_session, tmp_path):
    from omop2obo_ray.sources.jsonl import read_jsonl, write_jsonl

    df = pd.DataFrame({
        "doc_id": pd.array([1, 2, 3], dtype="int64"),
        "text": ['plain', 'quotes " and \\ and \n newline',
                 'unicodé — ✓'],
    })
    d = str(tmp_path / "jl")
    man = write_jsonl(rd.from_pandas(df).repartition(2), d)
    assert man["rows"].sum() == 3
    back = (read_jsonl(d).to_pandas()
            .sort_values("doc_id").reset_index(drop=True))
    pd.testing.assert_frame_equal(back[["doc_id", "text"]],
                                  df.astype({"doc_id": "int64"}))


def test_warc_gzip_roundtrip_per_record_members(ray_session, tmp_path):
    import gzip as _gz

    from omop2obo_ray.sources.warc import read_warc, write_warc

    df = pd.DataFrame({
        "url": [f"https://ex.org/{i}" for i in range(3)],
        "warc_ts": ["2024-01-01T00:00:00Z"] * 3,
        "payload": [b"alpha", b"b\r\n\r\nmid", bytes(range(64))],
    })
    d = str(tmp_path / "wgz")
    man = write_warc(rd.from_pandas(df), d, compression="gzip")
    assert all(p.endswith(".warc.gz") for p in man["path"])
    # CC layout: one gzip member PER RECORD (3 magic headers, and
    # decompressing the stream yields records back-to-back)
    raw = b"".join(open(p, "rb").read() for p in man["path"])
    assert raw.count(b"\x1f\x8b\x08") >= 3
    assert _gz.decompress(raw).startswith(b"WARC/1.0\r\n")
    back = (read_warc(d).to_pandas()
            .sort_values("url").reset_index(drop=True))
    assert all(a == b for a, b in
               zip(back["payload"], df.sort_values("url")["payload"]))


def test_coverage_totals_not_stale():
    """COVERAGE.md's generated totals block must match the live
    queries()/oracle_sql() inventory (VERDICT r3 #8)."""
    import subprocess
    import sys

    r = subprocess.run(
        [sys.executable, "tools/coverage_index.py", "--check"],
        capture_output=True, text=True, cwd="/root/repo")
    assert r.returncode == 0, r.stdout + r.stderr


def test_warc_real_crawl_flags(ray_session, tmp_path):
    """responses_only skips warcinfo/request records; http_strip
    unwraps the HTTP message so payload = html body bytes."""
    import gzip

    from omop2obo_ray.sources.warc import read_warc

    html = b"<html><p>hi &amp; bye</p></html>"
    http = (b"HTTP/1.1 200 OK\r\nContent-Type: text/html\r\n\r\n"
            + html)
    rec = ("WARC/1.0\r\nWARC-Type: response\r\n"
           "WARC-Target-URI: https://x.test/\r\n"
           "WARC-Date: 2024-01-01T00:00:00Z\r\n"
           f"Content-Length: {len(http)}\r\n\r\n").encode() \
        + http + b"\r\n\r\n"
    info = ("WARC/1.0\r\nWARC-Type: warcinfo\r\n"
            "Content-Length: 4\r\n\r\nabcd\r\n\r\n").encode()
    req = ("WARC/1.0\r\nWARC-Type: request\r\n"
           "WARC-Target-URI: https://x.test/\r\n"
           "Content-Length: 2\r\n\r\nGE\r\n\r\n").encode()
    p = tmp_path / "cc.warc.gz"
    p.write_bytes(gzip.compress(info) + gzip.compress(req)
                  + gzip.compress(rec))

    got = read_warc(str(p), responses_only=True,
                    http_strip=True).to_pandas()
    assert len(got) == 1
    assert got.loc[0, "url"] == "https://x.test/"
    assert got.loc[0, "payload"] == html

    # defaults unchanged: all 3 records, payload verbatim
    all_recs = read_warc(str(p)).to_pandas()
    assert len(all_recs) == 3
    assert (all_recs.sort_values("url").iloc[-1]["payload"] == http)

    # bare-LF header terminator (ADVICE r4): real servers emit \n\n;
    # http_strip must still unwrap instead of gluing headers to body
    http_lf = b"HTTP/1.1 200 OK\nContent-Type: text/html\n\n" + html
    rec_lf = ("WARC/1.0\r\nWARC-Type: response\r\n"
              "WARC-Target-URI: https://lf.test/\r\n"
              "WARC-Date: 2024-01-01T00:00:00Z\r\n"
              f"Content-Length: {len(http_lf)}\r\n\r\n").encode() \
        + http_lf + b"\r\n\r\n"
    p2 = tmp_path / "lf.warc.gz"
    p2.write_bytes(gzip.compress(rec_lf))
    got_lf = read_warc(str(p2), responses_only=True,
                       http_strip=True).to_pandas()
    assert got_lf.loc[0, "payload"] == html


def test_warc_on_error_skip_resyncs(ray_session, tmp_path):
    """on_error='skip' (the crawl posture): a corrupt record region
    resyncs to the next WARC banner — the surrounding good records
    survive; an undecompressable gzip file drops whole; the default
    'raise' still fails loudly on the same input."""
    import gzip

    import pytest

    from omop2obo_ray.sources.warc import read_warc

    def rec(url, body):
        return ("WARC/1.0\r\nWARC-Type: response\r\n"
                f"WARC-Target-URI: {url}\r\n"
                "WARC-Date: 2024-01-01T00:00:00Z\r\n"
                f"Content-Length: {len(body)}\r\n\r\n").encode() \
            + body + b"\r\n\r\n"

    good1 = rec("https://a.test/", b"aaa")
    corrupt = b"GARBAGE NOT A RECORD\r\n\r\nmore junk"
    good2 = rec("https://b.test/", b"bbb")
    p = tmp_path / "seg.warc"
    p.write_bytes(good1 + corrupt + good2)

    got = read_warc(str(p), on_error="skip").to_pandas()
    assert sorted(got["url"]) == ["https://a.test/", "https://b.test/"]

    with pytest.raises(Exception):
        read_warc(str(p)).to_pandas()  # default raises

    # truncated gzip member: file skipped in skip mode, raises default
    pz = tmp_path / "bad.warc.gz"
    pz.write_bytes(gzip.compress(good1)[:-5])
    ok = tmp_path / "ok.warc.gz"
    ok.write_bytes(gzip.compress(good2))
    d = str(tmp_path / "mix")
    import os
    os.makedirs(d)
    os.rename(pz, d + "/bad.warc.gz")
    os.rename(ok, d + "/ok.warc.gz")
    got2 = read_warc(d, on_error="skip").to_pandas()
    assert got2["url"].tolist() == ["https://b.test/"]
    with pytest.raises(Exception):
        read_warc(d).to_pandas()
