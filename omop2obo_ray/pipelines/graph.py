"""Graph analytics over edge Datasets — downstream consumers of the KG
this engine materializes (subject→object edges) want degree profiles
and centrality scores; these operators provide them as first-class
distributed components.

Design (same rules as the rest of the engine):

- The graph is an EDGE DATASET (src, dst string columns), never an
  adjacency structure on the driver. Node and rank tables are Datasets
  too — at 10¹²-edge scale none of them fit anywhere else.
- Per-node aggregations (degree, contribution sums, distinct nodes) are
  coarse aggregates (`functions/shuffle.py`) — node cardinality is
  unbounded, and Ray 2.49's per-group overhead would dominate.
- PageRank is the classic JOIN-BASED formulation: each iteration is one
  hash join (rank onto out-edges) + one keyed sum (contributions per
  dst) + one left-outer join (nodes that received no mass keep the
  teleport base). Partitioning assumption: both joins key on node id,
  so a production deployment co-partitions edges and ranks by
  hash(node) once and reuses that partitioning every iteration.
- Every join/aggregate output is sanitized (`_sanitize_join_output`)
  before feeding the next join — Ray 2.49 hash joins surface zero-row
  partitions as schema-less blocks (see NOTES_r2).

The fixed-iteration, no-dangling-redistribution PageRank variant is
used so the DuckDB oracle can unroll the exact same recurrence:
``r₀ = 1/N;  rₖ₊₁(v) = (1-d)/N + d · Σ_{(u,v)∈E} rₖ(u)/outdeg(u)``.
Mass on dangling nodes leaks (standard in the join-based sketch);
both sides implement the identical formula, so the gate is exact.
"""

from __future__ import annotations

import functools

import numpy as np
import pandas as pd
import pyarrow as pa
import ray
from ray.data import Dataset

from omop2obo_ray.functions.shuffle import coarse_aggregate
from omop2obo_ray.pipelines.textpipe import _pa_schema_of, _sanitize_join_output


def _distinct_nodes(edges: Dataset) -> Dataset:
    """Distinct node ids over src ∪ dst → (node) — coarse aggregate,
    node cardinality is unbounded."""
    srcs = edges.map_batches(
        lambda b: pa.table({"node": b["src"]}),
        batch_format="pyarrow", batch_size=None)
    dsts = edges.map_batches(
        lambda b: pa.table({"node": b["dst"]}),
        batch_format="pyarrow", batch_size=None)
    return coarse_aggregate(
        srcs.union(dsts), ["node"],
        lambda df: df.drop_duplicates(["node"]))


def out_degrees(edges: Dataset) -> Dataset:
    """(src, d) out-degree per source node — coarse aggregate."""
    return coarse_aggregate(
        edges.select_columns(["src"]), ["src"],
        lambda df: df.groupby("src", sort=False).size()
        .rename("d").reset_index())


def degree_stats(edges: Dataset) -> Dataset:
    """Out-degree histogram → (degree, n_nodes): per-node degrees via a
    coarse aggregate, then a second coarse aggregate over the distinct
    degree values (bounded in practice, unbounded in principle — same
    treatment either way). The edge list never leaves the first
    projection."""
    deg = out_degrees(edges)
    return coarse_aggregate(
        deg.select_columns(["d"]), ["d"],
        lambda df: df.groupby("d", sort=False).size()
        .rename("n_nodes").reset_index()
        .rename(columns={"d": "degree"}))


def pagerank(edges: Dataset, iterations: int = 3, damping: float = 0.85,
             num_partitions: int = 8) -> Dataset:
    """Fixed-iteration join-based PageRank → (node, rank) with rank
    normalized to mean 1 (multiplied by N), full float precision (the
    SQL gate quantizes in the query wrapper — see module docstring).

    Each iteration executes two node-keyed hash exchanges; nothing is
    ever collected to the driver except the scalar node count.
    """
    edges = edges.select_columns(["src", "dst"])
    nt = _pa_schema_of(edges).field("src").type

    deg = _sanitize_join_output(
        out_degrees(edges), pa.schema([("src", nt), ("d", pa.int64())]))
    ed = _sanitize_join_output(
        edges.join(deg, join_type="inner", num_partitions=num_partitions,
                   on=("src",)),
        pa.schema([("src", nt), ("dst", nt), ("d", pa.int64())]))

    nodes = _sanitize_join_output(
        _distinct_nodes(edges), pa.schema([("node", nt)]))
    n_nodes = nodes.count()
    if n_nodes == 0:
        return ray.data.from_arrow(pa.table({
            "node": pa.array([], pa.string()),
            "rank": pa.array([], pa.float64())}))
    base = (1.0 - damping) / n_nodes

    def _init(batch: pa.Table) -> pa.Table:
        r = np.full(len(batch), 1.0 / n_nodes)
        return pa.table({"node": batch["node"], "r": pa.array(r)})

    rank = _sanitize_join_output(
        nodes.map_batches(_init, batch_format="pyarrow",
                          batch_size=None).materialize(),
        pa.schema([("node", nt), ("r", pa.float64())]))

    for _ in range(iterations):
        # rank onto out-edges: contribution r/d flows along each edge
        sent = _sanitize_join_output(
            ed.join(rank, join_type="inner", num_partitions=num_partitions,
                    on=("src",), right_on=("node",)),
            pa.schema([("src", nt), ("dst", nt), ("d", pa.int64()),
                       ("r", pa.float64())]))

        def _w(batch: pa.Table) -> pa.Table:
            # block-local combiner: partial-sum per dst BEFORE the
            # coarse exchange, so a hub node (head dst with 10⁹
            # in-edges) ships one partial row per block instead of
            # concentrating every edge row into its coarse group
            r = batch["r"].combine_chunks().to_numpy(zero_copy_only=False)
            d = batch["d"].combine_chunks().to_numpy(zero_copy_only=False)
            dst = batch["dst"].combine_chunks().to_numpy(zero_copy_only=False)
            part = (pd.DataFrame({"dst": dst, "w": r / d})
                    .groupby("dst", sort=False)["w"].sum().reset_index())
            return pa.Table.from_pandas(part, preserve_index=False)

        contrib = _sanitize_join_output(coarse_aggregate(
            sent.map_batches(_w, batch_format="pyarrow", batch_size=None),
            ["dst"],
            lambda df: df.groupby("dst", sort=False)
            .agg(c=("w", "sum")).reset_index()),
            pa.schema([("dst", nt), ("c", pa.float64())]))
        # teleport base for every node; received mass where it exists
        merged = _sanitize_join_output(
            nodes.join(contrib, join_type="left_outer",
                       num_partitions=num_partitions,
                       on=("node",), right_on=("dst",)),
            pa.schema([("node", nt), ("c", pa.float64())]))

        def _upd(batch: pa.Table) -> pa.Table:
            cols = {c: batch[c] for c in batch.column_names}
            c = cols["c"].combine_chunks().to_numpy(zero_copy_only=False)
            c = np.nan_to_num(c.astype(np.float64), nan=0.0)
            return pa.table({"node": cols["node"],
                             "r": pa.array(base + damping * c, pa.float64())})

        rank = _sanitize_join_output(
            merged.map_batches(_upd, batch_format="pyarrow",
                               batch_size=None).materialize(),
            pa.schema([("node", nt), ("r", pa.float64())]))

    def _fin(batch: pa.Table) -> pa.Table:
        r = batch["r"].combine_chunks().to_numpy(zero_copy_only=False)
        # full-precision rank, normalized to mean 1; quantization for
        # the equality gate happens in the query wrapper (these
        # rational-valued ranks sit EXACTLY on decimal rounding
        # boundaries, so any fixed rounding here would be flipped by
        # partition-order float noise run-to-run)
        return pa.table({"node": batch["node"],
                         "rank": pa.array(r * n_nodes, pa.float64())})

    return rank.map_batches(_fin, batch_format="pyarrow", batch_size=None)


def connected_components(edges: Dataset, src: str = "src",
                         dst: str = "dst") -> Dataset:
    """Connected components over an undirected edge Dataset →
    (node, component) with component = min member id. Thin graph-API
    front for the iterative min-label propagation built for near-dup
    clustering (``textpipe.dup_clusters_distributed``): one hash join +
    one coarse per-node min per round, sum-of-labels as the monotone
    convergence witness, no driver state. Isolated nodes (absent from
    the edge list) are by definition their own singleton components and
    are not emitted."""
    from omop2obo_ray.pipelines.textpipe import dup_clusters_distributed

    pairs = edges.map_batches(
        lambda b: pa.table({"doc_a": b[src], "doc_b": b[dst]}),
        batch_format="pyarrow", batch_size=None)
    labeled = dup_clusters_distributed(pairs, key_col="node")
    return labeled.map_batches(
        lambda b: pa.table({"node": b["node"],
                            "component": b["cluster_id"]}),
        batch_format="pyarrow", batch_size=None)
