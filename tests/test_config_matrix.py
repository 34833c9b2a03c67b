"""Alternate-path equivalence: every config combination of
{fused / standalone scorer} × {lexicon / corpus canonicalization} ×
{page-local / hash-exchange assembly} must emit the same triples."""

from __future__ import annotations

import os

import pytest

import ray.data as rd

from omop2obo_ray.config import DEFAULT_CONFIG


def _triples(fixture_dir, lexicon, cfg):
    from omop2obo_ray.pipelines.kg import build_kg

    pages = rd.read_parquet(os.path.join(fixture_dir, "pages.parquet"))
    df = build_kg(pages, lexicon, cfg).to_pandas()
    return set(zip(df.subj, df.pred, df.obj))


def test_tier_toggle(ray_session, fixture_dir, lexicon):
    """Pluggable tier list: disabling tiers removes exactly their
    evidence classes (reference input-availability scenarios)."""
    import pandas as pd

    from omop2obo_ray.pipelines.kg import build_kg

    pages = rd.read_parquet(os.path.join(fixture_dir, "pages.parquet"))
    cfg = DEFAULT_CONFIG.with_(enabled_tiers=("str",))
    df = build_kg(pages, lexicon, cfg).to_pandas()
    assert len(df) > 0
    assert not df["evidence"].str.contains("DBXREF|UMLS_CUI|CONCEPT_SIMILARITY|ANCESTOR").any()
    full = _triples(fixture_dir, lexicon, DEFAULT_CONFIG)
    assert set(zip(df.subj, df.pred, df.obj)) < full or len(df) < len(full)


@pytest.mark.parametrize(
    "overrides",
    [
        {"fuse_scorer": False},
        {"canonical_mode": "corpus"},
        {"canonical_mode": "corpus", "canonical_fold_in": False},
        {"fuse_scorer": False, "canonical_mode": "corpus"},
        {"assume_unique_urls": False},
    ],
    ids=["standalone-scorer", "corpus-canon-foldin",
         "corpus-canon-separate-pass", "both", "hash-exchange-assembly"],
)
def test_alternate_paths_match_default(ray_session, fixture_dir, lexicon, overrides):
    base = _triples(fixture_dir, lexicon, DEFAULT_CONFIG)
    alt = _triples(fixture_dir, lexicon, DEFAULT_CONFIG.with_(**overrides))
    assert alt == base


def test_duplicate_url_input_with_dedup_combiner(
        ray_session, fixture_dir, lexicon, engine_triples):
    """Inputs violating the url-uniqueness contract (every page fed
    twice) must produce the SAME triples via the bucketed fallback,
    with the pre-exchange dedup combiner enabled."""
    import os

    import ray.data as rd

    from omop2obo_ray.config import DEFAULT_CONFIG
    from omop2obo_ray.pipelines.kg import build_kg

    pages = rd.read_parquet(os.path.join(fixture_dir, "pages.parquet"))
    doubled = pages.union(pages)
    cfg = DEFAULT_CONFIG.with_(assume_unique_urls=False,
                               dedup_before_assembly_shuffle=True)
    got = build_kg(doubled, lexicon, cfg).to_pandas()
    key = ["subj", "pred", "obj", "ontology", "evidence"]
    got_s = got[key].sort_values(key).reset_index(drop=True)
    want_s = engine_triples[key].sort_values(key).reset_index(drop=True)
    assert got_s.equals(want_s)


def test_corpus_mode_links_checkpoint(ray_session, fixture_dir, lexicon,
                                      engine_triples, tmp_path):
    """Corpus canonicalization with a parquet links checkpoint produces
    identical triples, and a second run REUSES the checkpoint."""
    import os

    import ray.data as rd

    from omop2obo_ray.config import DEFAULT_CONFIG
    from omop2obo_ray.pipelines.kg import build_kg

    ckpt = str(tmp_path / "links_ckpt")
    cfg = DEFAULT_CONFIG.with_(canonical_mode="corpus",
                               links_checkpoint_dir=ckpt)
    pages = rd.read_parquet(os.path.join(fixture_dir, "pages.parquet"))
    got = build_kg(pages, lexicon, cfg).to_pandas()
    key = ["subj", "pred", "obj", "ontology", "evidence"]
    want = engine_triples
    assert got[key].sort_values(key).reset_index(drop=True).equals(
        want[key].sort_values(key).reset_index(drop=True))
    files = {f for f in os.listdir(ckpt) if f.endswith(".parquet")}
    assert files, "checkpoint must contain parquet files"
    stamps = {f: os.path.getmtime(os.path.join(ckpt, f)) for f in files}
    got2 = build_kg(pages, lexicon, cfg).to_pandas()
    assert got2[key].sort_values(key).reset_index(drop=True).equals(
        want[key].sort_values(key).reset_index(drop=True))
    for f in files:  # second run read, not rewrote, the checkpoint
        assert os.path.getmtime(os.path.join(ckpt, f)) == stamps[f]


def test_disk_exchange_assembly_matches_default(ray_session, fixture_dir,
                                                lexicon, tmp_path):
    """The disk-mediated bucket exchange (assembly_stage_dir) must
    produce the identical triple set as the default page-local path
    and as the Ray-groupby bucketed fallback."""
    cfg = DEFAULT_CONFIG.with_(assume_unique_urls=False,
                               assembly_stage_dir=str(tmp_path / "stage"))
    base = _triples(fixture_dir, lexicon, DEFAULT_CONFIG)
    disk = _triples(fixture_dir, lexicon, cfg)
    assert disk == base


def test_corpus_sampled_full_sample_is_exact(ray_session, fixture_dir,
                                             lexicon):
    """corpus_sampled at 1e6 ppm (sample = corpus) must emit the exact
    'corpus' mode triples (which the fixture pins to the default set);
    a thinned sample still runs single-streaming-pass and emits triples."""
    base = _triples(fixture_dir, lexicon, DEFAULT_CONFIG)
    full = _triples(fixture_dir, lexicon, DEFAULT_CONFIG.with_(
        canonical_mode="corpus_sampled", canonical_sample_ppm=1_000_000))
    assert full == base
    thinned = _triples(fixture_dir, lexicon, DEFAULT_CONFIG.with_(
        canonical_mode="corpus_sampled", canonical_sample_ppm=250_000))
    assert len(thinned) > 0


def test_fold_in_retry_replay_is_exact(ray_session):
    """A re-executed map task replays its block's partial-count add;
    the deterministic block id must dedupe it so the fold-in canonical
    map equals the separate exact pass (VERDICT r3 #1). The fixture is
    tuned so DOUBLE-counting one block would FLIP the support-count
    tie-break (A: 2→4 beats B: 3) — the assert fails on the old
    non-idempotent accumulator."""
    import pandas as pd
    import pyarrow as pa
    import ray
    import ray.data as rd

    from omop2obo_ray.stages.canonicalize import (
        _PartialCountSink, _make_fold_in_tap, _pick_canonical,
        build_canonical_map)

    def block(urls, uri, n):
        rows = []
        for i in range(n):
            rows.append({"url": urls[i % len(urls)], "surface": "pain",
                         "ontology": "hp", "uri": uri, "tier": "str"})
        return pa.Table.from_pandas(pd.DataFrame(rows),
                                    preserve_index=False)

    b1 = block(["http://a1", "http://a2"], "HP_A", 2)
    b2 = block(["http://b1", "http://b2", "http://b3"], "HP_B", 3)

    sink_cls = ray.remote(num_cpus=0)(_PartialCountSink)
    sinks = [sink_cls.remote() for _ in range(4)]
    tap = _make_fold_in_tap(sinks)
    tap(b1)
    tap(b2)
    tap(b1)  # simulated task re-execution: same block, second add
    tables = [t for t in ray.get([s.get.remote() for s in sinks])
              if t is not None]
    got = _pick_canonical(iter(tables))
    for s in sinks:
        ray.kill(s)

    want = build_canonical_map(
        rd.from_arrow(pa.concat_tables([b1, b2])))
    assert want[("pain", "hp")] == "HP_B"  # support 3 beats 2
    assert got == want  # double-counted b1 (4) would have flipped to HP_A


def test_documents_as_pages_dup_urls(ray_session):
    """dup_urls=True (the bench's duplicate-heavy-crawl shape,
    VERDICT r4 #7): consecutive repeat pairs share a url with
    byte-identical html, so exactly 50% of pages are duplicates."""
    from omop2obo_ray.pipelines.flagship import documents_as_pages

    pages = documents_as_pages("/root/testdata/sf0.001", repeat=4,
                               dup_urls=True).to_pandas()
    vc = pages["url"].value_counts()
    assert (vc == 2).all()
    assert (pages.groupby("url")["html"].nunique() == 1).all()
    # unique mode unchanged: every url distinct
    uniq = documents_as_pages("/root/testdata/sf0.001",
                              repeat=4).to_pandas()
    assert uniq["url"].is_unique
    assert len(uniq) == len(pages)
