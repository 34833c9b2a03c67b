"""Canonicalization + per-subject evidence aggregation → triples.

Two shuffles, both keyed and skew-aware (SURVEY §7.3):

1. **Surface-form canonicalization** — merge aliases into canonical
   concept IDs, as OMOP2OBO's per-concept consolidation does
   (data_utils.py:551-622). Head surface forms ("pain"-like) are
   Zipf-skewed, so a naive ``groupby(surface)`` hot-spots one reducer.
   We pre-aggregate *inside* ``map_batches`` (one partial count row per
   (surface, ontology, uri, tier) per batch — the salted-combiner
   pattern), then run the small ``groupby`` over partials only.
   The canonical pick per (surface, ontology) is deterministic:
   (best tier rank, highest support count, lowest uri).

2. **Per-subject assembly** — ``groupby(url).map_groups`` applying the
   reference's final aggregation semantics exactly
   (``compiles_mapping_content``/``filters_mapping_content``/
   ``assigns_mapping_category``, data_utils.py:380-548):
   CONCEPT-level exact results preferred, ANCESTOR-level as fallback,
   similarity results filtered by the exact-1.0-else-threshold rule,
   categories assigned per ontology; one output triple per kept uri.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from ray.data import Dataset

from omop2obo_ray.functions.hashing import bucket_of, hash64_array

TIER_RANK = {"str": 0, "dbxref": 1, "umls": 2, "ancestor": 3, "sim": 4}


# ---------------------------------------------------------------------------
# 1. canonical surface-form map
# ---------------------------------------------------------------------------

def _partial_counts(batch: pa.Table) -> pa.Table:
    """Per-batch combiner: count links per (surface, ontology, uri, tier).

    This is the pre-aggregation that makes the groupby shuffle small —
    the reducer only ever sees one row per batch per key, so Zipf-headed
    surfaces cannot hot-spot a partition (SURVEY §4 skew row)."""
    df = batch.select(["surface", "ontology", "uri", "tier"]).to_pandas()
    for c in df.columns:  # de-categorize dictionary-encoded link columns
        if isinstance(df[c].dtype, pd.CategoricalDtype):
            df[c] = df[c].astype(str)
    df = df[df["tier"].isin(["str", "dbxref", "umls"])]
    if df.empty:
        return pa.table(
            {"surface": pa.array([], pa.string()), "ontology": pa.array([], pa.string()),
             "uri": pa.array([], pa.string()), "tier_rank": pa.array([], pa.int64()),
             "n": pa.array([], pa.int64())}
        )
    df["tier_rank"] = df["tier"].map(TIER_RANK)
    agg = (
        df.groupby(["surface", "ontology", "uri"], sort=True, observed=True)
        .agg(tier_rank=("tier_rank", "min"), n=("uri", "size"))
        .reset_index()
    )
    return pa.Table.from_pandas(agg, preserve_index=False).replace_schema_metadata(None)


def build_canonical_map(links: Dataset, driver_merge: bool = True) -> dict[tuple[str, str], str]:
    """Distributed build of the (surface, ontology) → canonical uri map.

    The result is lexicon-bounded (≤ #surface forms × #ontologies), so
    collecting it driver-side and re-broadcasting via ``ray.put`` is the
    broadcast-small-side pattern, not a materialization of page data.

    ``driver_merge=True`` streams the per-batch partial counts to the
    driver and merges there — the partials are already combined per
    batch, so the driver sees ≤ (lexicon × #batches) rows and a whole
    Ray shuffle's fixed cost disappears. For 10⁶-surface lexicons ×
    10⁴ batches set ``driver_merge=False`` to run the merge as a Ray
    groupby (the salted-combiner two-phase aggregate)."""
    # project FIRST, then coalesce with a row-based batch size: the
    # link stream can arrive as ~10⁵ page-aligned mini-blocks, and a
    # per-block combiner would emit just as many partial blocks —
    # every downstream consumer (driver iteration or shuffle) then
    # pays per-block overhead ~10⁵ times. Coalescing the slim 4-column
    # projection costs one cheap concat per 64 k rows.
    partials = links.select_columns(
        ["surface", "ontology", "uri", "tier"]
    ).map_batches(_partial_counts, batch_format="pyarrow", batch_size=65536)
    if not driver_merge:
        from omop2obo_ray.functions.shuffle import coarse_aggregate

        # (surface, ontology, uri) cardinality is lexicon-bounded but
        # can reach 10⁶ in production — coarse aggregate, not the
        # per-group sort aggregate (functions/shuffle.py)
        partials = coarse_aggregate(
            partials, ["surface", "ontology", "uri"],
            lambda df: df.groupby(["surface", "ontology", "uri"], sort=False)
            .agg(tier_rank=("tier_rank", "min"), n=("n", "sum")).reset_index())
    return _pick_canonical(
        partials.iter_batches(batch_size=65536, batch_format="pyarrow"))


def _pick_canonical(batches) -> dict[tuple[str, str], str]:
    """Fold partial-count batches into the (surface, ontology) →
    canonical-uri map: deterministic pick = (best tier rank, highest
    support count, lowest uri); only AMBIGUOUS surfaces (>1 distinct
    uri) enter the map — for the rest the rewrite is the identity, so
    the apply stage can skip them (and becomes a free pass-through when
    no ambiguity exists)."""
    best: dict[tuple[str, str], tuple[int, int, str]] = {}
    counts: dict[tuple[str, str, str], tuple[int, int]] = {}
    for b in batches:
        for surface, ont, uri, tr, n in zip(
            b["surface"].to_pylist(), b["ontology"].to_pylist(),
            b["uri"].to_pylist(), b["tier_rank"].to_pylist(), b["n"].to_pylist(),
        ):
            k3 = (surface, ont, uri)
            old = counts.get(k3, (9, 0))
            counts[k3] = (min(old[0], int(tr)), old[1] + int(n))
    n_uris: dict[tuple[str, str], int] = {}
    for (surface, ont, uri), (tr, n) in counts.items():
        key = (surface, ont)
        n_uris[key] = n_uris.get(key, 0) + 1
        cand = (tr, -n, uri)
        if key not in best or cand < best[key]:
            best[key] = cand
    return {k: v[2] for k, v in best.items() if n_uris[k] > 1}


class _PartialCountSink:
    """Zero-CPU accumulator actor for the canonical-map fold-in: holds
    lexicon-bounded (surface, ontology, uri) → (min tier rank, count)
    partials, compacting buffered tables with a vectorized pandas
    groupby every 64 adds so memory never exceeds ~64 blocks of
    partials + one compacted frame.

    Adds are IDEMPOTENT per ``block_id``: a re-executed map task (the
    norm on a multi-node cluster, not the exception) replays the same
    deterministic id and the duplicate add is dropped, so the fold-in
    stays exact under task retries. The seen-id set costs 8 bytes per
    block — bounded by block count, not data size."""

    def __init__(self):
        self._buf: list[pa.Table] = []
        self._compacted: pd.DataFrame | None = None
        self._seen: set[int] = set()

    def add(self, block_id: int, tbl: pa.Table) -> None:
        if block_id in self._seen:
            return
        self._seen.add(block_id)
        self._buf.append(tbl)
        if len(self._buf) >= 64:
            self._compact()

    def _compact(self) -> None:
        frames = [t.to_pandas() for t in self._buf]
        if self._compacted is not None:
            frames.append(self._compacted)
        if not frames:
            return
        df = pd.concat(frames, ignore_index=True)
        self._compacted = (
            df.groupby(["surface", "ontology", "uri"], sort=False)
            .agg(tier_rank=("tier_rank", "min"), n=("n", "sum"))
            .reset_index())
        self._buf = []

    def get(self) -> pa.Table | None:
        self._compact()
        if self._compacted is None or not len(self._compacted):
            return None
        return pa.Table.from_pandas(self._compacted,
                                    preserve_index=False)


def _make_fold_in_tap(sinks):
    """Pass-through tap shipping each block's canonical-map partials
    to its deterministically-chosen accumulator sink. Factored out of
    :func:`materialize_links_with_canonical` so the retry-replay test
    can drive it directly (calling it twice on the same block, as a
    re-executed Ray task would)."""
    import ray

    n_sinks = len(sinks)

    def _tap(batch: pa.Table) -> pa.Table:
        part = _partial_counts(batch)
        if part.num_rows:
            h = np.unique(hash64_array(batch["url"]))
            bid = int(np.bitwise_xor.reduce(h)) ^ batch.num_rows
            # counts merge associatively+commutatively; the sink is a
            # pure function of the block id so a RETRIED task hits the
            # same sink and its duplicate add is dropped there
            ray.get(sinks[bid % n_sinks].add.remote(bid, part))
        return batch

    return _tap


def materialize_links_with_canonical(
        links: "Dataset", n_sinks: int = 8,
) -> tuple["Dataset", dict[tuple[str, str], str]]:
    """ONE pass over the link stream that both pins the links and
    builds the corpus-weighted canonical map: a pass-through tap
    computes each block's partial counts (the same per-batch combiner
    ``build_canonical_map`` uses) and ships them to zero-CPU
    accumulator actors; after the materialize, the ≤ n_sinks
    lexicon-bounded aggregates are merged driver-side. Removes the
    separate partials scan + serial driver merge from the corpus
    path's critical section (measured ~5 s at 480 k pages / 32 cpus).

    The tap ``ray.get``s each add so a map task only completes after
    its partials are accumulated (actor ordering alone doesn't give
    that).

    RETRY-EXACT under map-task re-execution: each add is keyed on a
    deterministic block id — the XOR of the block's unique url hashes
    (links blocks are page-aligned, so url sets partition across
    blocks and the XOR identifies the block; a re-executed task
    reproduces the identical id) — routed to ``sinks[id % n_sinks]``
    so the retry lands on the SAME sink, whose seen-set drops the
    duplicate. Scope of the guarantee (ADVICE r4): it covers map-task
    re-execution exactly, up to 64-bit block-id collision (two
    distinct blocks XOR-colliding would silently drop the second
    add — ~n²/2⁶⁵ odds); it does NOT cover a crashed-and-restarted
    SINK actor, which would lose its seen-set and partials — sinks
    are created non-restartable (max_restarts=0, the Ray default) so
    that failure mode surfaces as a hard error on the tap's
    ``ray.get``, never as silent undercount. Returns blocks unchanged
    (zero-copy), so page-aligned block boundaries — the page-local
    assembly contract — survive."""
    import ray

    # max_restarts=0 pinned explicitly: a restarted sink would lose
    # its seen-set + partials and silently undercount — better to
    # fail the tap's ray.get hard and let the whole stage retry.
    sink_cls = ray.remote(num_cpus=0, max_restarts=0)(_PartialCountSink)
    sinks = [sink_cls.remote() for _ in range(n_sinks)]

    mat = links.map_batches(_make_fold_in_tap(sinks),
                            batch_format="pyarrow",
                            batch_size=None).materialize()
    tables = [t for t in ray.get([s.get.remote() for s in sinks])
              if t is not None]
    for s in sinks:
        ray.kill(s)
    return mat, _pick_canonical(iter(tables))


def lexicon_canonical_map(lexicon) -> dict[tuple[str, str], str]:
    """Data-free canonical map derived from the lexicon alone: for every
    surface that is AMBIGUOUS within an ontology (maps to >1 concept at
    CONCEPT level), pick the deterministic (best tier rank, lowest uri).

    This mirrors the reference's consolidation, which is per-concept and
    NOT corpus-frequency-weighted (data_utils.py:551-622) — and it needs
    no pass over the pages, so the pipeline stays single-execution
    streaming. ``build_canonical_map`` remains the corpus-weighted
    variant (adds support counts as the tie-breaker)."""
    per_key: dict[tuple[str, str], list[tuple[int, str]]] = {}
    for surface, links in lexicon.surface_links.items():
        for level, ont, uri, tier, _evid in links:
            if level != "CONCEPT" or tier not in TIER_RANK or tier == "ancestor":
                continue
            per_key.setdefault((surface, ont), []).append((TIER_RANK[tier], uri))
    out: dict[tuple[str, str], str] = {}
    for key, cands in per_key.items():
        uris = {u for _r, u in cands}
        if len(uris) > 1:
            out[key] = min(cands)[1]
    return out


def apply_canonical_map(batch: pa.Table, canon: dict[tuple[str, str], str],
                        labels: dict[str, str]) -> pa.Table:
    """Rewrite concept-level exact links whose surface is AMBIGUOUS to
    the canonical uri (map holds only ambiguous surfaces). Fast path:
    no ambiguous surface in this batch → zero-copy pass-through."""
    if not canon:
        return batch
    import pyarrow.compute as pc

    amb_surfaces = {s for s, _o in canon}
    hit = pc.is_in(batch["surface"], value_set=pa.array(sorted(amb_surfaces)))
    if not pc.any(hit).as_py():
        return batch
    df = batch.to_pandas()
    for c in ("uri", "label"):  # rewrite target columns must not be categorical
        if isinstance(df[c].dtype, pd.CategoricalDtype):
            df[c] = df[c].astype(str)
    mask = df["tier"].isin(["str", "dbxref", "umls"]) & df["surface"].isin(amb_surfaces)
    if mask.any():
        keys = list(zip(df.loc[mask, "surface"], df.loc[mask, "ontology"]))
        new_uri = [canon.get(k, u) for k, u in zip(keys, df.loc[mask, "uri"])]
        df.loc[mask, "uri"] = new_uri
        df.loc[mask, "label"] = [labels.get(u, "") for u in new_uri]
    out = pa.Table.from_pandas(df, preserve_index=False).replace_schema_metadata(None)
    # re-dictionary-encode the rewritten columns: the pandas round-trip
    # decoded them to plain strings, which would inflate this stage's
    # output well past its input size (block-size growth is what lets
    # the output buffer slice a block mid-page — see LinkerActor)
    for c in ("uri", "label"):
        i = out.column_names.index(c)
        col = out[c].combine_chunks()
        if not pa.types.is_dictionary(col.type):
            out = out.set_column(i, c, col.dictionary_encode())
    return out


# ---------------------------------------------------------------------------
# 2. per-subject assembly (A6)
# ---------------------------------------------------------------------------

# typed empty frame: object-dtype empties would surface as Arrow null
# columns and break cross-block schema union
_EMPTY_TRIPLES = pd.DataFrame(
    {c: pd.Series(dtype="string")
     for c in ["subj", "pred", "obj", "ontology", "evidence"]}
)


def add_url_bucket(batch, n_buckets: int):
    """Hash-bucket links by url so per-subject assembly runs as P
    bucket-groups (one pandas job each) instead of one Ray group per
    url — #groups drops from |urls| to P and the groupby sort keys on a
    small int column."""
    import pyarrow as pa

    h = hash64_array(batch["url"])
    return batch.append_column("url_bucket", pa.array(bucket_of(h, n_buckets), pa.int32()))


def _join_unique(series: pd.Series) -> str:
    return " | ".join(dict.fromkeys(series))


def assemble_links(df: pd.DataFrame, ontologies: tuple[str, ...],
                   threshold: float = 0.25) -> pd.DataFrame:
    """A6 over a set of complete url groups, fully vectorized: per
    (url, ontology) emit exact triples (CONCEPT preferred, ANCESTOR
    fallback — compiles_mapping_content's level loop,
    data_utils.py:438-449) and sim triples (exact-1.0 else ≥threshold
    else all — filters_mapping_content, data_utils.py:402-418), with
    categories from assigns_mapping_category (data_utils.py:518-548).

    Deterministic intra-subject order regardless of block arrival:
    rows are pinned to (tier rank, surface, uri) before first-seen
    dedup (the reference's unique_everseen is input-row order —
    SURVEY §7.4.1)."""
    # dictionary-encoded link columns arrive as pandas Categoricals
    # whose category ORDER is block-insertion order — sorting on them
    # would be nondeterministic across runs. Reordering the (small)
    # category lists lexically makes every code-based sort/compare
    # deterministic WITHOUT expanding millions of Python strings
    # (a blanket astype(str) here was 8× the assembly's entire cost).
    for c in df.columns:
        if isinstance(df[c].dtype, pd.CategoricalDtype):
            cats = df[c].cat.categories
            if not cats.is_monotonic_increasing:
                df[c] = df[c].cat.reorder_categories(cats.sort_values())
    df = df[df["ontology"].isin(ontologies)]
    if df.empty:
        return _EMPTY_TRIPLES.copy()
    if isinstance(df["tier"].dtype, pd.CategoricalDtype):
        rank_of = df["tier"].cat.categories.map(lambda t: TIER_RANK.get(t, 9))
        df = df.assign(_rank=rank_of.to_numpy()[df["tier"].cat.codes])
    else:
        df = df.assign(_rank=df["tier"].map(TIER_RANK))
    df = df.sort_values(["_rank", "surface", "uri"], kind="mergesort")
    key = ["url", "ontology"]
    parts: list[pd.DataFrame] = []

    exact_c = df[(df["level"] == "CONCEPT") & (df["tier"].isin(["str", "dbxref", "umls"]))]
    anc = df[df["level"] == "ANCESTOR"]
    sims = df[df["tier"] == "sim"]

    def exact_block(rows: pd.DataFrame, pred_one: str, pred_many: str) -> pd.DataFrame:
        uris = rows.drop_duplicates(key + ["uri"])
        n = uris.groupby(key, sort=False, observed=True)["uri"].transform("size")
        ev = (
            rows.drop_duplicates(key + ["evidence"])
            .groupby(key, sort=False, observed=True)["evidence"].agg(_join_unique).rename("evidence")
        )
        out = uris[key + ["uri"]].merge(ev, left_on=key, right_index=True)
        out["pred"] = np.where(n.to_numpy() > 1, pred_many, pred_one)
        return out

    if len(exact_c):
        parts.append(
            exact_block(exact_c, "Automatic Exact - Concept",
                        "Automatic Constructor - Concept")
        )
    if len(anc):
        # ANCESTOR level only where the (url, ont) has no CONCEPT exact
        have_exact = set(map(tuple, exact_c[key].drop_duplicates().to_numpy()))
        mask = [t not in have_exact for t in map(tuple, anc[key].to_numpy())]
        anc_f = anc[np.array(mask, dtype=bool)] if len(anc) else anc
        if len(anc_f):
            parts.append(
                exact_block(anc_f, "Automatic Exact - Ancestor",
                            "Automatic Constructor - Ancestor")
            )

    if len(sims):
        is_one = sims["score"].to_numpy() == 1.0
        ge_thr = sims["score"].to_numpy() >= threshold
        flags = sims.assign(_one=is_one, _thr=ge_thr).groupby(key, sort=False, observed=True)[
            ["_one", "_thr"]
        ].transform("max")  # cythonized group-any
        any_one = flags["_one"].to_numpy()
        any_thr = flags["_thr"].to_numpy()
        keep_mask = np.where(any_one, is_one, np.where(any_thr, ge_thr, True))
        keep = sims[keep_mask].copy()
        keep["sim_evid"] = "CONCEPT_SIMILARITY:" + keep["evidence"].astype(str)
        ev_rows = keep.drop_duplicates(key + ["sim_evid"])
        n_evid = ev_rows.groupby(key, sort=False, observed=True)["sim_evid"].agg("size")
        ev = ev_rows.groupby(key, sort=False, observed=True)["sim_evid"].agg(_join_unique)
        uris = keep.drop_duplicates(key + ["uri"])
        out = uris[key + ["uri"]].merge(
            pd.DataFrame({"evidence": ev, "n_evid": n_evid}), left_on=key, right_index=True
        )
        out["pred"] = np.where(out.pop("n_evid").to_numpy() > 1,
                               "Automatic Constructor - Concept",
                               "Manual Exact - Concept Similarity")
        parts.append(out)

    if not parts:
        return _EMPTY_TRIPLES.copy()
    out = pd.concat(parts, ignore_index=True).rename(columns={"url": "subj", "uri": "obj"})
    out = out[["subj", "pred", "obj", "ontology", "evidence"]]
    out = out.drop_duplicates(subset=["subj", "pred", "obj"])
    # decode any categorical carry-over: triples are ~100× fewer rows
    # than links, and downstream sort/write needs plain string columns
    for c in out.columns:
        if isinstance(out[c].dtype, pd.CategoricalDtype):
            out[c] = out[c].astype(str)
    return out


def assemble_bucket(group: pd.DataFrame, ontologies: tuple[str, ...],
                    threshold: float = 0.25) -> pd.DataFrame:
    """map_groups body for one url_bucket (complete url groups by
    construction of the hash bucketing)."""
    return assemble_links(group, ontologies, threshold)


def finalize_triples(batch: pa.Table, n_buckets: int) -> pa.Table:
    """Attach subject_hash / subject_bucket (content-derived, process-
    stable) — the output partitioning key and resume unit (north_rule).

    Subjects repeat once per triple, so the column is dictionary-encoded
    first and only the distinct values are hashed (~20× fewer blake2b
    calls on typical pages)."""
    if batch.num_rows == 0:
        return batch.append_column(
            "subject_hash", pa.array([], pa.uint64())
        ).append_column("subject_bucket", pa.array([], pa.int32()))
    dict_arr = batch["subj"].combine_chunks().dictionary_encode()
    uniq_hash = hash64_array(dict_arr.dictionary)
    import numpy as np

    idx = dict_arr.indices.to_numpy(zero_copy_only=False)
    h = uniq_hash[idx]
    return batch.append_column("subject_hash", pa.array(h, pa.uint64())).append_column(
        "subject_bucket", pa.array(bucket_of(h, n_buckets), pa.int32())
    )
