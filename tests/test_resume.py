"""Checkpoint/resume tests: kill-and-resume yields identical output
(SURVEY §5d; north_rule resumability)."""

from __future__ import annotations

import json
import os
import shutil

import pyarrow.parquet as pq

import ray.data as rd


def _write(fixture_dir, lexicon, out_dir):
    from omop2obo_ray.config import DEFAULT_CONFIG
    from omop2obo_ray.pipelines.kg import run_kg_to_dir

    pages = rd.read_parquet(os.path.join(fixture_dir, "pages.parquet"))
    return run_kg_to_dir(pages, lexicon, out_dir, DEFAULT_CONFIG)


def _triple_set(out_dir):
    from omop2obo_ray.stages.checkpoint import read_triples

    t = read_triples(out_dir)
    return set(zip(t["subj"].to_pylist(), t["pred"].to_pylist(), t["obj"].to_pylist()))


def test_write_and_manifest(ray_session, fixture_dir, lexicon, tmp_path):
    out = str(tmp_path / "triples")
    manifest = _write(fixture_dir, lexicon, out)
    assert len(manifest["partitions"]) == 16
    total = sum(p["rows"] for p in manifest["partitions"].values())
    assert total > 0
    # partitioned layout: one directory per subject bucket
    assert os.path.isdir(os.path.join(out, "subject_bucket=0"))
    assert manifest["extractor_version"] == "1.0"


def test_resume_after_partial_failure(ray_session, fixture_dir, lexicon, tmp_path):
    out = str(tmp_path / "triples")
    _write(fixture_dir, lexicon, out)
    full = _triple_set(out)

    # simulate a crash that lost buckets 3, 7 and their manifest entries
    mpath = os.path.join(out, "manifest.json")
    with open(mpath) as f:
        manifest = json.load(f)
    for b in ("3", "7"):
        manifest["partitions"].pop(b)
        shutil.rmtree(os.path.join(out, f"subject_bucket={b}"))
    with open(mpath, "w") as f:
        json.dump(manifest, f)

    # resume: only the missing buckets are recomputed
    manifest2 = _write(fixture_dir, lexicon, out)
    assert set(manifest2["partitions"].keys()) == {str(b) for b in range(16)}
    assert _triple_set(out) == full


def test_resume_is_noop_when_complete(ray_session, fixture_dir, lexicon, tmp_path):
    out = str(tmp_path / "triples")
    m1 = _write(fixture_dir, lexicon, out)
    stamps = {
        b: os.path.getmtime(os.path.join(out, f"subject_bucket={b}", "part-0.parquet"))
        for b in range(16)
    }
    m2 = _write(fixture_dir, lexicon, out)
    assert m1["partitions"] == m2["partitions"]
    for b in range(16):
        assert stamps[b] == os.path.getmtime(
            os.path.join(out, f"subject_bucket={b}", "part-0.parquet")
        ), "completed bucket was rewritten on resume"


def test_bucket_files_sorted_by_subject_hash(ray_session, fixture_dir, lexicon, tmp_path):
    out = str(tmp_path / "triples")
    _write(fixture_dir, lexicon, out)
    t = pq.read_table(os.path.join(out, "subject_bucket=1", "part-0.parquet"))
    hashes = t["subject_hash"].to_pylist()
    assert hashes == sorted(hashes)


def test_lineage_counters_per_bucket_and_stable_on_resume(
        ray_session, fixture_dir, lexicon, tmp_path):
    """Each partition entry counts ONLY its own bucket's rows; the
    top-level lineage totals equal the sum over partitions and do not
    inflate across a resume run."""
    from omop2obo_ray.stages.checkpoint import read_triples

    out = str(tmp_path / "triples")
    m1 = _write(fixture_dir, lexicon, out)
    # per-bucket counts sum to per-bucket rows
    for part in m1["partitions"].values():
        assert sum(part["preds"].values()) == part["rows"]
    # top-level totals = sum over partitions = total written rows
    t = read_triples(out)
    totals = m1["counters"]["triples_by_category"]
    assert sum(totals.values()) == t.num_rows
    # category totals match the actual pred column
    import collections
    actual = collections.Counter(t["pred"].to_pylist())
    assert totals == dict(actual)
    # a (noop) resume must not change the totals
    m2 = _write(fixture_dir, lexicon, out)
    assert m2["counters"]["triples_by_category"] == totals


def test_incremental_merge_equals_one_shot(ray_session, fixture_dir,
                                           lexicon, tmp_path):
    """Crawl-refresh: store(half A) then merge(half B) must equal the
    one-shot store over all pages — full row set AND per-bucket content
    hashes; re-merging B is a byte-stable no-op (idempotence)."""
    from omop2obo_ray.config import DEFAULT_CONFIG
    from omop2obo_ray.pipelines.kg import build_kg
    from omop2obo_ray.stages.checkpoint import (load_manifest,
                                                merge_triples_into_store,
                                                read_triples)

    pages = rd.read_parquet(os.path.join(fixture_dir, "pages.parquet"))
    # deterministic halves by url hash parity
    import pyarrow as pa
    import pyarrow.compute as pc

    def _half(batch, parity):
        keep = pc.equal(pc.bit_wise_and(
            pc.cast(pc.utf8_length(batch["url"]), pa.int64()),
            pa.scalar(1, pa.int64())), pa.scalar(parity, pa.int64()))
        return batch.filter(keep)

    half_a = pages.map_batches(lambda b: _half(b, 0), batch_format="pyarrow")
    half_b = pages.map_batches(lambda b: _half(b, 1), batch_format="pyarrow")
    assert half_a.count() > 0 and half_b.count() > 0

    # one-shot reference store
    full_dir = str(tmp_path / "full")
    _write(fixture_dir, lexicon, full_dir)

    # incremental: write A, merge B
    inc_dir = str(tmp_path / "inc")
    from omop2obo_ray.pipelines.kg import run_kg_to_dir
    run_kg_to_dir(half_a, lexicon, inc_dir, DEFAULT_CONFIG)
    triples_b = build_kg(half_b, lexicon, DEFAULT_CONFIG)
    merge_triples_into_store(triples_b.materialize(), inc_dir,
                             DEFAULT_CONFIG.subject_buckets)

    assert _triple_set(inc_dir) == _triple_set(full_dir)
    m_full = load_manifest(full_dir)
    m_inc = load_manifest(inc_dir)
    for b, e in m_full["partitions"].items():
        assert m_inc["partitions"][b]["content_hash"] == e["content_hash"], b

    # idempotence: merging B again changes nothing
    triples_b2 = build_kg(half_b, lexicon, DEFAULT_CONFIG)
    merge_triples_into_store(triples_b2.materialize(), inc_dir,
                             DEFAULT_CONFIG.subject_buckets)
    m_inc2 = load_manifest(inc_dir)
    assert {b: e["content_hash"] for b, e in m_inc2["partitions"].items()} \
        == {b: e["content_hash"] for b, e in m_inc["partitions"].items()}
