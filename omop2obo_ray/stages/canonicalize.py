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

import ray
from ray.data import Dataset
from ray.data.aggregate import Min, Sum

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
    df = df[df["tier"].isin(["str", "dbxref", "umls"])]
    if df.empty:
        return pa.table(
            {"surface": pa.array([], pa.string()), "ontology": pa.array([], pa.string()),
             "uri": pa.array([], pa.string()), "tier_rank": pa.array([], pa.int64()),
             "n": pa.array([], pa.int64())}
        )
    df["tier_rank"] = df["tier"].map(TIER_RANK)
    agg = (
        df.groupby(["surface", "ontology", "uri"], sort=True)
        .agg(tier_rank=("tier_rank", "min"), n=("uri", "size"))
        .reset_index()
    )
    return pa.Table.from_pandas(agg, preserve_index=False)


def build_canonical_map(links: Dataset) -> dict[tuple[str, str], str]:
    """Distributed build of the (surface, ontology) → canonical uri map.

    The result is lexicon-bounded (≤ #surface forms × #ontologies), so
    collecting it driver-side and re-broadcasting via ``ray.put`` is the
    broadcast-small-side pattern, not a materialization of page data."""
    partials = links.map_batches(_partial_counts, batch_format="pyarrow")
    merged = partials.groupby(["surface", "ontology", "uri"]).aggregate(
        Min("tier_rank", alias_name="tier_rank"), Sum("n", alias_name="n")
    )
    canon: dict[tuple[str, str], tuple[int, int, str]] = {}
    for b in merged.iter_batches(batch_size=65536, batch_format="pyarrow"):
        for surface, ont, uri, tr, n in zip(
            b["surface"].to_pylist(), b["ontology"].to_pylist(),
            b["uri"].to_pylist(), b["tier_rank"].to_pylist(), b["n"].to_pylist(),
        ):
            key = (surface, ont)
            cand = (int(tr), -int(n), uri)
            if key not in canon or cand < canon[key]:
                canon[key] = cand
    return {k: v[2] for k, v in canon.items()}


def apply_canonical_map(batch: pa.Table, canon: dict[tuple[str, str], str],
                        labels: dict[str, str]) -> pa.Table:
    """Rewrite concept-level exact links to their canonical uri."""
    df = batch.to_pandas()
    mask = df["tier"].isin(["str", "dbxref", "umls"])
    if mask.any():
        keys = list(zip(df.loc[mask, "surface"], df.loc[mask, "ontology"]))
        new_uri = [canon.get(k, u) for k, u in zip(keys, df.loc[mask, "uri"])]
        df.loc[mask, "uri"] = new_uri
        df.loc[mask, "label"] = [labels.get(u, "") for u in new_uri]
    return pa.Table.from_pandas(df, preserve_index=False)


# ---------------------------------------------------------------------------
# 2. per-subject assembly (A6)
# ---------------------------------------------------------------------------

def _unique_everseen(xs):
    seen, out = set(), []
    for x in xs:
        if x not in seen:
            seen.add(x)
            out.append(x)
    return out


def assemble_subject(group: pd.DataFrame, ontologies: tuple[str, ...],
                     threshold: float = 0.25) -> pd.DataFrame:
    """A6 for one subject (url): per ontology emit exact triples
    (CONCEPT preferred, ANCESTOR fallback — compiles_mapping_content's
    level loop, data_utils.py:438-449) and sim triples (exact-1.0 else
    ≥threshold else all — filters_mapping_content, data_utils.py:402-418),
    with categories from assigns_mapping_category (data_utils.py:518-548)."""
    url = group["url"].iloc[0]
    rows: list[tuple] = []
    # deterministic intra-subject order regardless of block arrival
    # (reference order = input row order; we pin (tier, surface, uri) —
    #  SURVEY §7.4.1)
    group = group.sort_values(
        by=["tier", "surface", "uri"],
        key=lambda s: s.map(TIER_RANK) if s.name == "tier" else s,
        kind="mergesort",
    )
    for ont in ontologies:
        g = group[group["ontology"] == ont]
        exact_c = g[(g["level"] == "CONCEPT") & (g["tier"].isin(["str", "dbxref", "umls"]))]
        anc = g[g["level"] == "ANCESTOR"]
        sims = g[g["tier"] == "sim"]

        exact = exact_c if len(exact_c) else anc
        if len(exact):
            uris = _unique_everseen(exact["uri"].tolist())
            evidence = " | ".join(_unique_everseen(exact["evidence"].tolist()))
            is_anc = len(exact_c) == 0
            if not is_anc:
                pred = ("Automatic Constructor - Concept" if len(uris) > 1
                        else "Automatic Exact - Concept")
            else:
                pred = ("Automatic Constructor - Ancestor" if len(uris) > 1
                        else "Automatic Exact - Ancestor")
            for uri in uris:
                rows.append((url, pred, uri, ont, evidence))

        if len(sims):
            scores = sims["score"].to_numpy(dtype=float)
            if (scores == 1.0).any():
                keep = sims[scores == 1.0]
            elif (scores >= threshold).any():
                keep = sims[scores >= threshold]
            else:
                keep = sims
            evid_parts = _unique_everseen(
                ("CONCEPT_SIMILARITY:" + keep["evidence"]).tolist()
            )
            evidence = " | ".join(evid_parts)
            pred = ("Automatic Constructor - Concept" if len(evid_parts) > 1
                    else "Manual Exact - Concept Similarity")
            for uri in _unique_everseen(keep["uri"].tolist()):
                rows.append((url, pred, uri, ont, evidence))

    if not rows:
        return pd.DataFrame(columns=["subj", "pred", "obj", "ontology", "evidence"])
    out = pd.DataFrame(rows, columns=["subj", "pred", "obj", "ontology", "evidence"])
    return out.drop_duplicates(subset=["subj", "pred", "obj"])


def finalize_triples(batch: pa.Table, n_buckets: int) -> pa.Table:
    """Attach subject_hash / subject_bucket (content-derived, process-
    stable) — the output partitioning key and resume unit (north_rule)."""
    h = hash64_array(batch["subj"])
    return batch.append_column("subject_hash", pa.array(h, pa.uint64())).append_column(
        "subject_bucket", pa.array(bucket_of(h, n_buckets), pa.int32())
    )
