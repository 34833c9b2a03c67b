"""Pipeline configuration.

Mirrors the reference's fixed constants and CLI-bound column roles:
  - TF-IDF: top_n=10, absolute score floor 0.25, per-row 75th-percentile
    keep rule (string_similarity.py:332, :264; main.py:107,144).
  - ``umls_expand`` double-merge flag (clinical_concept_annotator.py:61,67).
  - column-role indirection (clinical_concept_annotator.py:59-62) becomes
    explicit field names on the pages table.
"""

from __future__ import annotations

from dataclasses import dataclass


@dataclass(frozen=True)
class PipelineConfig:
    # ---- column roles on the pages table (input_hint shape) ----
    url_col: str = "url"
    html_col: str = "html"
    text_col: str = "text"
    lang_col: str = "lang"

    # ---- language filtering (reference: LANG=='ENG' filter,
    #      clinical_concept_annotator.py:163) ----
    languages: tuple[str, ...] = ("en",)

    # ---- tier-3 TF-IDF constants (string_similarity.py:264,332) ----
    sim_top_n: int = 10
    sim_score_floor: float = 0.25
    sim_percentile: float = 75.0
    # final-aggregation similarity threshold (main.py:144, data_utils.py:412)
    sim_threshold: float = 0.25

    # ---- tier-2 double merge (clinical_concept_annotator.py:212-217) ----
    umls_expand: bool = True

    # ---- ontologies to link against ----
    ontologies: tuple[str, ...] = ("hp", "mondo")

    # ---- pluggable tier list (SURVEY §2.10 extension surface): each
    # tier can be switched off independently, mirroring the reference's
    # input-availability scenarios (tests ran the mapper with/without
    # UMLS and similarity inputs, test_clinical_concept_annotator.py:310-362)
    enabled_tiers: tuple[str, ...] = ("str", "dbxref", "umls", "ancestor", "sim")

    # ---- scale knobs ----
    # batches sized so #tasks ≫ pool size (parallelism is bounded by
    # #batches); pools autoscale (1, N) so small runs stay cheap
    link_batch_size: int = 256
    link_concurrency: int = 16
    score_batch_size: int = 1024
    score_concurrency: int = 8
    # hash buckets for per-subject assembly in the bucketed fallback
    # (None = adaptive 24× cluster CPUs, measured optimum at 32 cpus /
    # 200k pages: 64→30.2s, 192→20.0s, 768→17.1s, 1536→19.7s)
    assembly_buckets: int | None = None
    # when set, the bucketed-assembly fallback routes its url_bucket
    # exchange through the disk-mediated two-phase shuffle
    # (functions/shuffle.py::disk_bucket_apply) instead of Ray's
    # sort-based groupby — the same trade the resumable sink makes
    # (56 s exchange → 8.3 s spill+merge on string-heavy payloads).
    # Must be shared storage on a cluster.
    assembly_stage_dir: str | None = None
    # input contract: url is the pages primary key (FIXTURES.md §1), so
    # links are page-local and assembly needs no shuffle; set False for
    # inputs where the same url can appear on multiple rows
    assume_unique_urls: bool = True
    # block-local full-row dedup before the assembly exchange: enable
    # for duplicate-heavy inputs (shrinks the shuffle to the distinct
    # mass); costs a full-row hash pass, so off by default
    dedup_before_assembly_shuffle: bool = False
    # canonicalization source: 'lexicon' derives the ambiguous-surface →
    # canonical-uri map from the lexicon alone (data-free, keeps the
    # pipeline single-pass streaming; matches the reference's
    # non-frequency-weighted consolidation); 'corpus' additionally
    # weights by corpus support counts via the partial-agg shuffle
    # (exact, two passes over the link stream); 'corpus_sampled'
    # estimates the same support counts from a deterministic page
    # SAMPLE in a cheap pre-pass and keeps the main pipeline fully
    # streaming — the recommended corpus-weighted mode at scale (no
    # materialize barrier, no link stream pinned in the object store)
    canonical_mode: str = "lexicon"
    # corpus_sampled: parts-per-million of pages in the map-building
    # sample (content-hash of url, deterministic). 10_000 ppm = 1%.
    # Support counts are tie-breaks; sampling preserves their ordering
    # in expectation, and 1_000_000 ppm reproduces 'corpus' exactly.
    canonical_sample_ppm: int = 10_000
    # corpus mode: when set, the link stream is checkpointed to this
    # parquet directory instead of materialized in the object store —
    # both consumers (canonical-map build + assembly) then read from
    # disk, and a resumed run can reuse the checkpoint across driver
    # restarts (multi-node: must be shared storage)
    links_checkpoint_dir: str | None = None
    # corpus mode: compute the canonical-map partial counts INSIDE the
    # links materialize (zero-CPU accumulator actors fed by a
    # pass-through tap) instead of a separate scan over the
    # materialized links — removes the serial map-build phase from the
    # corpus path's critical section. RETRY-EXACT under map-task
    # re-execution (up to 64-bit block-id collision): every add is
    # keyed on a deterministic block id (XOR of the block's unique
    # url hashes — blocks are page-aligned so url sets partition
    # across blocks) and routed to sinks[id % n_sinks]; a re-executed
    # map task replays the same id into the same sink, which drops
    # the duplicate. Sink-actor crashes are NOT silently absorbed:
    # sinks are non-restartable, so a lost sink fails the stage hard
    # instead of undercounting. Safe as the default on retry-prone
    # clusters under that contract.
    canonical_fold_in: bool = True
    # score tier-3 candidates inside the linker actor (one operator
    # boundary less); False runs the standalone ScorerActor stage
    fuse_scorer: bool = True
    # salt buckets for head-surface-form skew at canonicalization (SURVEY §4)
    canon_salt: int = 16
    # output partitioning: subject-hash buckets (north_rule layout + resume unit)
    subject_buckets: int = 16

    # candidate unit for tier-3 similarity: sentences with no tier-1/2 hit
    sim_max_candidates_per_page: int = 8

    # page-aligned linker output chunking (None = 1/4 of the Ray
    # target_max_block_size): every linker yield stays under this cap,
    # which guarantees Ray's output buffer never slices a block
    # mid-page — the invariant the shuffle-free page-local assembly
    # relies on (see LinkerActor.__init__)
    link_yield_byte_cap: int | None = None

    def with_(self, **kw) -> "PipelineConfig":
        from dataclasses import replace

        return replace(self, **kw)


DEFAULT_CONFIG = PipelineConfig()
