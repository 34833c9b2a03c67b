"""The flagship KG-construction pipeline (read → link → triples).

Ray-Data-first re-expression of the reference's ``main.py:58-145`` flow
(SURVEY §3.1), one lazy streaming Dataset plan end-to-end:

    read_parquet(pages)                         # prune at the read
      → map_batches(extract_text_batch)         # byte-identical invariant
      → map_batches(lang_filter)                # LANG filter analogue
      → map_batches(LinkerActor, concurrency=N) # tiers 1/2 + candidates
      → map_batches(ScorerActor, concurrency=M) # tier 3 TF-IDF
      → [canonical-map partial-agg groupby]     # skew-safe small shuffle
      → groupby(url).map_groups(assemble)       # A6 evidence aggregation
      → map_batches(finalize_triples)           # subject hash + bucket
      → sort(subject_hash) → resumable write    # north_rule layout

The lexicon is built once driver-side and broadcast with ``ray.put``;
each actor pulls the handle in ``__init__`` (never re-shipped per batch).
"""

from __future__ import annotations

import functools

import pyarrow as pa
import ray
from ray.data import Dataset

from omop2obo_ray.config import DEFAULT_CONFIG, PipelineConfig
from omop2obo_ray.stages.canonicalize import (
    add_url_bucket,
    apply_canonical_map,
    assemble_bucket,
    build_canonical_map,
    finalize_triples,
    lexicon_canonical_map,
)
from omop2obo_ray.stages.extract import extract_text_batch, lang_filter_batch
from omop2obo_ray.stages.link import LinkerActor
from omop2obo_ray.stages.score import ScorerActor
from omop2obo_ray.state.lexicon import Lexicon


def extract_pages(pages: Dataset, cfg: PipelineConfig = DEFAULT_CONFIG) -> Dataset:
    # batch_size=None throughout: whole blocks in, whole blocks out —
    # the 1024-row default slices html/text blocks into thousands of
    # tiny batches whose per-batch overhead dwarfs the kernels
    ds = pages.map_batches(extract_text_batch, batch_format="pyarrow",
                           zero_copy_batch=True, batch_size=None)
    return ds.map_batches(
        functools.partial(lang_filter_batch, languages=cfg.languages),
        batch_format="pyarrow",
        zero_copy_batch=True,
        batch_size=None,
    )


def link_pages(pages: Dataset, lexicon: Lexicon, cfg: PipelineConfig = DEFAULT_CONFIG,
               lexicon_ref=None) -> Dataset:
    """pages(url, text, lang) → long link records (LINKS schema)."""
    if lexicon_ref is None:
        lexicon_ref = ray.put(lexicon)
    # pool sizes follow the cluster: the linker is the dominant compute
    # stage (≤ 3/4 of cores), the scorer mostly passes links through
    # (≤ 1/4). Autoscaling ranges with a warm minimum — Ray's pool
    # upscaler is reactive and slow to grow from 1, so pre-starting
    # min actors matters for short jobs; never ≥ all cores (the read
    # and assembly stages must not starve).
    cpus = int(ray.cluster_resources().get("CPU", 8))
    link_pool = (max(1, cpus // 2), max(2, (3 * cpus) // 4))
    score_pool = (max(1, cpus // 8), max(1, cpus // 4))
    linked = pages.map_batches(
        LinkerActor,
        fn_constructor_kwargs={
            "lexicon_ref": lexicon_ref,
            "max_sim_candidates": cfg.sim_max_candidates_per_page,
            "fuse_scorer": cfg.fuse_scorer,
            "top_n": cfg.sim_top_n,
            "floor": cfg.sim_score_floor,
            "percentile": cfg.sim_percentile,
            "yield_byte_cap": cfg.link_yield_byte_cap,
        },
        batch_format="pyarrow",
        batch_size=cfg.link_batch_size,
        concurrency=link_pool,
        num_cpus=1,
    )
    if cfg.fuse_scorer:
        return linked
    return linked.map_batches(
        ScorerActor,
        fn_constructor_kwargs={
            "lexicon_ref": lexicon_ref,
            "top_n": cfg.sim_top_n,
            "floor": cfg.sim_score_floor,
            "percentile": cfg.sim_percentile,
        },
        batch_format="pyarrow",
        batch_size=None,  # whole blocks: keeps every url's links in one block
        concurrency=score_pool,
        num_cpus=1,
    )


def links_to_triples(links: Dataset, lexicon: Lexicon,
                     cfg: PipelineConfig = DEFAULT_CONFIG,
                     canonicalize: bool = True,
                     canon_override: dict | None = None) -> Dataset:
    """links → canonicalized, aggregated, deduplicated triples.

    ``canon_override`` supplies a prebuilt canonical map (the
    corpus_sampled mode's sample-pass product — see ``build_kg``),
    keeping this stage a single streaming pass."""
    if set(cfg.enabled_tiers) != {"str", "dbxref", "umls", "ancestor", "sim"}:
        import pyarrow as pa
        import pyarrow.compute as pc

        allowed = pa.array(list(cfg.enabled_tiers))
        links = links.map_batches(
            lambda b: b.filter(pc.is_in(b["tier"].combine_chunks().cast(pa.string()),
                                        value_set=allowed)),
            batch_format="pyarrow", batch_size=None,
        )
    if canonicalize:
        if canon_override is not None:
            canon = canon_override
        elif cfg.canonical_mode == "lexicon":
            # data-free: the ambiguity structure lives in the lexicon, so
            # the map needs no pass over pages and the whole pipeline
            # remains ONE streaming execution
            canon = lexicon_canonical_map(lexicon)
        else:
            # corpus-weighted: links are consumed twice (map build +
            # assembly) — materialize the link stream ONCE so the page
            # scan does not re-execute; links are far smaller than pages
            # and spill to disk under object-store pressure. At 100 TB,
            # swap for a parquet checkpoint of the links stage.
            if cfg.links_checkpoint_dir:
                # parquet checkpoint: survives driver restarts and
                # keeps the link stream out of the object store
                import os

                import ray.data as _rd

                ckpt = cfg.links_checkpoint_dir
                if not (os.path.isdir(ckpt) and any(
                        f.endswith(".parquet") for f in os.listdir(ckpt))):
                    links.write_parquet(ckpt)
                links = _rd.read_parquet(ckpt)
                n_chunks = sum(f.endswith(".parquet")
                               for f in os.listdir(ckpt))
                canon = build_canonical_map(
                    links, driver_merge=n_chunks < 2048)
            elif cfg.canonical_fold_in:
                # ONE pass: partial counts accumulate inside the links
                # materialize (stages/canonicalize.py fold-in) — no
                # separate partials scan, no serial driver merge phase
                from omop2obo_ray.stages.canonicalize import (
                    materialize_links_with_canonical)

                links, canon = materialize_links_with_canonical(links)
            else:
                links = links.materialize()
                # driver-merge streams one batch per BLOCK through the
                # driver (~0.7 ms each): fine for hundreds of blocks, a
                # serial ~70 s wall for ~10⁵ small blocks. Above a
                # block-count threshold, run the merge as a distributed
                # groupby and only collect the (lexicon-bounded)
                # aggregate.
                canon = build_canonical_map(
                    links, driver_merge=links.num_blocks() < 2048)
        labels = lexicon.labels
        links = links.map_batches(
            functools.partial(apply_canonical_map, canon=canon, labels=labels),
            batch_format="pyarrow",
            batch_size=None,  # preserve block boundaries (page-locality)
        )
    # Per-subject assembly is PAGE-LOCAL: the linker emits every link of
    # a page inside one output block and downstream maps run with
    # batch_size=None (whole block in, whole block out), so all links of
    # a url are already co-located — no shuffle is needed at all.
    # Assumption (documented input contract, FIXTURES.md §1): url is the
    # pages table's primary key, each url appears on exactly one input
    # row. For inputs violating that, set cfg.assume_unique_urls=False
    # to route through a hash exchange on url first.
    assemble = functools.partial(
        assemble_bucket, ontologies=lexicon.ontologies, threshold=cfg.sim_threshold
    )
    # a parquet links checkpoint does NOT preserve page-aligned block
    # boundaries (read_parquet splits at row-group offsets), so the
    # shuffle-free page-local assembly contract no longer holds —
    # route through the bucketed exchange in that case
    page_local = cfg.assume_unique_urls and not (
        canonicalize and cfg.canonical_mode != "lexicon"
        and cfg.links_checkpoint_dir)
    if page_local:
        triples = links.map_batches(assemble, batch_format="pandas", batch_size=None)
    else:
        # co-locate each url's links via a bucket-keyed groupby (works
        # under any shuffle strategy); P bucket-groups, one vectorized
        # assembly each. Only assembly-relevant columns enter the
        # shuffle (label is display-only).
        slim = links.select_columns(
            ["url", "surface", "level", "ontology", "uri", "tier",
             "evidence", "score"]
        )

        if cfg.dedup_before_assembly_shuffle:
            # pre-exchange combiner: assembly dedups on (uri, evidence)
            # anyway, so identical link rows can die block-locally
            # before the shuffle. Worth its full-row hash (~25% of the
            # fallback wall on all-unique input) ONLY when the
            # uniqueness contract is violated by content-identical
            # duplicate urls — then the exchange carries just the
            # distinct mass. Off by default.
            slim = slim.map_batches(lambda df: df.drop_duplicates(),
                                    batch_format="pandas", batch_size=None)
        # bucket-count optimum differs by exchange: the Ray sort-groupby
        # wants many small groups (24×CPU, measured 768→17.1 s); the
        # disk exchange wants few big slices (4×CPU — more buckets
        # explode the slice-file count: 768 buckets → ~50 k tiny
        # parquet files → 68 s vs 22 s at 128)
        per_cpu = 4 if cfg.assembly_stage_dir else 24
        n_buckets = cfg.assembly_buckets or per_cpu * int(
            ray.cluster_resources().get("CPU", 8))
        bucketed = slim.map_batches(
            functools.partial(add_url_bucket, n_buckets=n_buckets),
            batch_format="pyarrow", batch_size=None,
        )
        if cfg.assembly_stage_dir:
            # disk-mediated exchange: slices spill at disk speed, one
            # merge+assemble task per bucket group — Ray's sort-based
            # groupby never touches the string-heavy link payload
            from omop2obo_ray.functions.shuffle import disk_bucket_apply

            triples = disk_bucket_apply(
                bucketed, "url_bucket", assemble,
                stage_dir=cfg.assembly_stage_dir)
        else:
            triples = bucketed.groupby("url_bucket").map_groups(
                assemble, batch_format="pandas"
            )
    return triples.map_batches(
        functools.partial(finalize_triples, n_buckets=cfg.subject_buckets),
        batch_format="pyarrow",
        batch_size=None,  # whole blocks — the 1024-row default shreds
        # big-string blocks into ~10⁴ slices of pure overhead
    )


def build_kg(pages: Dataset, lexicon: Lexicon, cfg: PipelineConfig = DEFAULT_CONFIG,
             canonicalize: bool = True) -> Dataset:
    """Full pipeline: raw pages dataset → triples dataset (lazy).

    ``canonical_mode='corpus_sampled'``: a cheap deterministic page
    sample (``canonical_sample_ppm``) runs through extract+link FIRST
    to estimate the corpus support counts and build the canonical map
    driver-side (sample-bounded), then the FULL pipeline runs as one
    streaming pass with the map applied — corpus-weighted
    canonicalization without the exact mode's materialize barrier or
    object-store pinning of the whole link stream. At 1_000_000 ppm
    the sample is the corpus and the map is exactly the 'corpus'
    mode's (identity-tested)."""
    if "sim" not in cfg.enabled_tiers:
        # don't pay for candidate generation/scoring when tier-3 is off
        cfg = cfg.with_(sim_max_candidates_per_page=0)
    lexicon_ref = ray.put(lexicon)

    canon_override = None
    if canonicalize and cfg.canonical_mode == "corpus_sampled":
        import numpy as np
        import pyarrow.compute as pc

        from omop2obo_ray.functions.hashing import hash64_array
        from omop2obo_ray.stages.canonicalize import build_canonical_map

        ppm = max(1, min(1_000_000, cfg.canonical_sample_ppm))

        def _sample(b: pa.Table) -> pa.Table:
            h = hash64_array(b[cfg.url_col])
            return b.filter(pa.array(
                (h % np.uint64(1_000_000)) < np.uint64(ppm)))

        sample_links = link_pages(
            extract_pages(pages.map_batches(
                _sample, batch_format="pyarrow", batch_size=None), cfg),
            lexicon, cfg, lexicon_ref=lexicon_ref)
        # the sample's partials stream straight to the driver merge —
        # one cheap pass, state bounded by (lexicon × sample blocks)
        canon_override = build_canonical_map(sample_links,
                                             driver_merge=True)

    extracted = extract_pages(pages, cfg)
    links = link_pages(extracted, lexicon, cfg, lexicon_ref=lexicon_ref)
    return links_to_triples(links, lexicon, cfg, canonicalize=canonicalize,
                            canon_override=canon_override)


def run_kg_to_dir(pages: Dataset, lexicon: Lexicon, out_dir: str,
                  cfg: PipelineConfig = DEFAULT_CONFIG) -> dict:
    """Build + resumable partitioned write; returns the manifest."""
    from omop2obo_ray.functions.html import EXTRACTOR_VERSION
    from omop2obo_ray.stages.checkpoint import write_triples_resumable

    # no global sort needed: the sink sorts WITHIN each subject_bucket
    # partition (north_rule layout = partitioned by subject hash, sorted
    # within partition) — a global all-to-all sort would add an exchange
    # for ordering across partition files that nothing consumes
    triples = build_kg(pages, lexicon, cfg)
    return write_triples_resumable(
        triples, out_dir, cfg.subject_buckets, extractor_version=EXTRACTOR_VERSION
    )


def warc_to_pages(warc_path: str, default_lang: str | None = None) -> Dataset:
    """Bridge from raw Common-Crawl segments to the PAGES shape:
    ``read_warc`` (url, warc_ts, payload) → (url, warc_ts, html, lang).

    WARC records carry no language tag, so ``lang`` is either the
    caller's constant (``default_lang`` — right when the crawl was
    pre-filtered upstream, and makes the transport exactly invertible)
    or, when None, predicted per page by the engine's char-trigram
    language-ID on the extracted text (an actor-pool stage; swap the
    heuristic for a real model in ``TextAnalyzer.__init__`` at
    production quality)."""
    from omop2obo_ray.functions.html import extract_text
    from omop2obo_ray.sources.warc import read_warc

    raw = read_warc(warc_path)

    if default_lang is not None:
        def _fixed(batch: pa.Table) -> pa.Table:
            return pa.table({
                "url": batch["url"], "warc_ts": batch["warc_ts"],
                "html": batch["payload"].cast(pa.large_binary()),
                "lang": pa.array([default_lang] * len(batch)),
            })

        return raw.map_batches(_fixed, batch_format="pyarrow",
                               batch_size=None)

    from omop2obo_ray.pipelines.textpipe import TextAnalyzer, _pool

    class _LangTagger:
        """extract (throwaway — the real extraction runs again inside
        extract_pages, preserving the byte-identity invariant there)
        + trigram language-ID per record."""

        def __init__(self):
            self._an = TextAnalyzer()

        def __call__(self, batch: pa.Table) -> pa.Table:
            langs = [self._an.lang_of(extract_text(p))
                     for p in batch["payload"].to_pylist()]
            return pa.table({
                "url": batch["url"], "warc_ts": batch["warc_ts"],
                "html": batch["payload"].cast(pa.large_binary()),
                "lang": pa.array(langs, pa.string()),
            })

    return raw.map_batches(_LangTagger, batch_format="pyarrow",
                           batch_size=2048, concurrency=_pool(),
                           num_cpus=1)


def build_kg_from_warc(warc_path: str, lexicon: Lexicon,
                       cfg: PipelineConfig = DEFAULT_CONFIG,
                       default_lang: str | None = None) -> Dataset:
    """Segment-to-graph front door: ``.warc`` / ``.warc.gz`` segments →
    deduplicated triples, streaming end-to-end (file-parallel WARC
    parse → extract → link → canonicalize)."""
    return build_kg(warc_to_pages(warc_path, default_lang), lexicon, cfg)


def run_warc_to_ntriples(warc_path: str, lexicon: Lexicon, out_dir: str,
                         cfg: PipelineConfig = DEFAULT_CONFIG,
                         default_lang: str | None = None) -> "pd.DataFrame":
    """CC segments in, RDF out: build the KG from WARC and publish it
    as partitioned N-Triples (the graph-ecosystem handoff)."""
    from omop2obo_ray.sources.ntriples import write_ntriples

    triples = build_kg_from_warc(warc_path, lexicon, cfg, default_lang)

    def _spo(batch: pa.Table) -> pa.Table:
        return pa.table({"subject": batch["subj"],
                         "predicate": batch["pred"],
                         "object": batch["obj"]})

    spo = triples.map_batches(_spo, batch_format="pyarrow",
                              batch_size=None)
    return write_ntriples(spo, out_dir)
