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
import pyarrow.compute as pc
import ray
from ray.data import Dataset

from omop2obo_ray.functions.shuffle import coarse_aggregate
from omop2obo_ray.pipelines.textpipe import (_pa_schema_of, _pool,
                                             _sanitize_join_output)


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
             num_partitions: int = 8,
             weight_col: str | None = None) -> Dataset:
    """Fixed-iteration join-based PageRank → (node, rank) with rank
    normalized to mean 1 (multiplied by N), full float precision (the
    SQL gate quantizes in the query wrapper — see module docstring).

    Algebraic form chosen to MINIMIZE exchanges. With
    ``rankₖ(u) = base + d·cₖ(u)`` (cₖ = received mass, zero when
    absent) the contribution sum splits as

        cₖ₊₁(v) = base·invsum(v) + d·Σ_{(u,v)∈E} cₖ(u)/deg(u),
        invsum(v) = Σ_{(u,v)∈E} 1/deg(u)   (computed ONCE).

    Working in the N-SCALED variable ``c'ₖ = N·cₖ`` removes the node
    count from the recurrence entirely (base·N = 1−d):

        c'₁ = invsum,
        c'ₖ₊₁ = (1−d)·invsum + d·Σ c'ₖ(u)/deg(u),
        rank·N = (1−d) + d·c'   — the mean-1 output directly.

    Plan layout (each numbered step is ONE executed Ray exchange; the
    per-plan fixed cost is what dominates fixture-scale walls, so the
    count is kept at the algorithmic minimum — 2 setup + 2 per extra
    iteration):

    1. ``ed`` — out-degree is attached by a single coarse exchange
       keyed on src (per-src ``transform('size')`` inside the bucket
       frame), shipping each edge once; no separate degree aggregate,
       no degree hash join. Edge weight w = 1/deg rides the table, and
       the frame marks one FIRST row per src — the distinct-source
       markers that make the final rank table complete without a
       dedicated node-set pass or a final left-outer join.
    2. ``invsum`` ( = c'₁) — per-dst Σw with a block-local combiner
       (a hub dst ships one partial row per block, not 10⁹ edge rows).
    3. per extra iteration: ONE coarse-bucket join (c'ₖ onto ed, with
       the per-dst partial sums FUSED into the join frame so only
       partials leave the exchange — ``functions/shuffle.coarse_join``
       rationale: Ray's native join pays a fresh aggregator-actor pool
       per plan) + ONE coarse per-dst sum. The LAST iteration's sum
       also folds in zero-contribution marker rows for every distinct
       src, so teleport-only nodes (out-edges, no in-edges) surface
       with c' = 0 ⇒ rank (1−d) — no nodes join afterwards.

    Nothing is ever collected to the driver. Same recurrence as the
    unrolled SQL oracle up to float reassociation (≈1e-15 relative —
    absorbed by the gate's epsilon-floor quantization and the 1e-12
    pytest tolerance). ``num_partitions`` is retained for API
    compatibility; bucket fan-out is ~3×CPU (measured optimum for the
    exchange at fixture scale; rises naturally with cluster size).
    """
    del num_partitions  # superseded by coarse-bucket fan-out
    cpus = int(ray.cluster_resources().get("CPU", 8)) if ray.is_initialized() else 8
    n_coarse = max(32, 3 * cpus)
    edges = edges.select_columns(
        ["src", "dst"] + ([weight_col] if weight_col else []))
    nt = _pa_schema_of(edges).field("src").type

    def _attach_w(df: pd.DataFrame) -> pd.DataFrame:
        # all rows of a src are in this coarse frame by construction.
        # weight_col: WEIGHTED pagerank — rank distributes proportional
        # to edge weight (anchor-count-weighted web link graphs);
        # weights must be positive, multi-edges simply sum. Recurrence,
        # exchanges and markers are identical — only w changes.
        if weight_col is None:
            d = df.groupby("src", sort=False)["dst"].transform("size")
            w = 1.0 / d.to_numpy()
        else:
            q = df[weight_col].to_numpy(np.float64)
            tot = (df.groupby("src", sort=False)[weight_col]
                   .transform("sum").to_numpy(np.float64))
            w = np.divide(q, tot, out=np.zeros_like(q),
                          where=tot > 0)
        out = df.assign(w=w, first=~df["src"].duplicated().to_numpy())
        return out[["src", "dst", "w", "first"]]

    ed = _sanitize_join_output(
        coarse_aggregate(edges, ["src"], _attach_w, n_coarse=n_coarse),
        pa.schema([("src", nt), ("dst", nt), ("w", pa.float64()),
                   ("first", pa.bool_())]))
    if ed.count() == 0:
        return ray.data.from_arrow(pa.table({
            "node": pa.array([], pa.string()),
            "rank": pa.array([], pa.float64())}))
    c_schema = pa.schema([("node", nt), ("c", pa.float64())])

    # zero-contribution marker per distinct src: unioned into the LAST
    # per-node sum so source-only nodes appear in the output (adding
    # c = 0 rows changes no sum)
    def _markers(b: pa.Table) -> pa.Table:
        first = b["first"].combine_chunks().to_numpy(zero_copy_only=False)
        src = b["src"].combine_chunks().filter(pa.array(first))
        return pa.table({"node": src,
                         "c": pa.array(np.zeros(len(src), np.float64))})

    markers = ed.map_batches(_markers, batch_format="pyarrow",
                             batch_size=None)

    def _inv(batch: pa.Table) -> pa.Table:
        # block-local combiner: partial-sum per dst BEFORE the coarse
        # exchange, so a hub node (head dst with 10⁹ in-edges) ships
        # one partial row per block instead of concentrating every
        # edge row into its coarse group
        w = batch["w"].combine_chunks().to_numpy(zero_copy_only=False)
        dst = batch["dst"].combine_chunks().to_numpy(zero_copy_only=False)
        part = (pd.DataFrame({"node": dst, "c": w})
                .groupby("node", sort=False)["c"].sum().reset_index())
        return pa.Table.from_pandas(part, preserve_index=False)

    def _per_node_sum(extra: Dataset | None):
        def build(parts: Dataset) -> Dataset:
            src = parts if extra is None else parts.union(extra)
            return _sanitize_join_output(coarse_aggregate(
                src, ["node"],
                lambda df: df.groupby("node", sort=False)
                .agg(c=("c", "sum")).reset_index(), n_coarse=n_coarse),
                c_schema)
        return build

    invsum = _per_node_sum(markers if iterations == 1 else None)(
        ed.map_batches(_inv, batch_format="pyarrow", batch_size=None))

    # c'₁ = invsum, zero-copy (every u starts at r₀ = 1/N, so the first
    # iteration's join is the constant map — no join plan needed)
    c = invsum

    for it in range(max(0, iterations - 1)):
        last = it == iterations - 2

        # fused coarse join: ed and c'ₖ ride ONE exchange keyed on src;
        # the bucket frame merges the sides and immediately partial-sums
        # damping·c'·w per dst, so only slim partials leave the task
        def _tag_ed(b: pa.Table) -> pa.Table:
            n = b.num_rows
            return pa.table({
                "src": b["src"], "dst": b["dst"], "w": b["w"],
                "c": pa.nulls(n, pa.float64()),
                "_side": pa.array(np.zeros(n, np.int8))})

        def _tag_c(b: pa.Table) -> pa.Table:
            n = b.num_rows
            return pa.table({
                "src": b["node"], "dst": pa.nulls(n, nt),
                "w": pa.nulls(n, pa.float64()), "c": b["c"],
                "_side": pa.array(np.ones(n, np.int8))})

        def _merge_send(df: pd.DataFrame) -> pd.DataFrame:
            side = df["_side"].to_numpy()
            l = df.loc[side == 0, ["src", "dst", "w"]]
            r = df.loc[side == 1, ["src", "c"]]
            m = l.merge(r, on="src", how="inner")
            if not len(m):
                return pd.DataFrame({"node": pd.Series(dtype=l["dst"].dtype),
                                     "c": pd.Series(dtype=np.float64)})
            return (pd.DataFrame({
                "node": m["dst"].to_numpy(),
                "c": damping * m["c"].to_numpy() * m["w"].to_numpy()})
                .groupby("node", sort=False)["c"].sum().reset_index())

        # sanitize strips the zero-row (schema-less) blocks sparse
        # buckets emit — they would poison the next groupby's exchange
        sent = _sanitize_join_output(coarse_aggregate(
            ed.map_batches(_tag_ed, batch_format="pyarrow",
                           batch_size=None)
            .union(c.map_batches(_tag_c, batch_format="pyarrow",
                                 batch_size=None)),
            ["src"], _merge_send, n_coarse=n_coarse), c_schema)

        def _teleport(batch: pa.Table) -> pa.Table:
            s = batch["c"].combine_chunks().to_numpy(zero_copy_only=False)
            return pa.table({"node": batch["node"],
                             "c": pa.array((1.0 - damping) * s,
                                           pa.float64())})

        teleport_term = invsum.map_batches(
            _teleport, batch_format="pyarrow", batch_size=None)
        c = _per_node_sum(markers if last else None)(
            teleport_term.union(sent))

    if iterations <= 0:
        nodes = _sanitize_join_output(coarse_aggregate(
            markers.union(ed.map_batches(
                lambda b: pa.table({"node": b["dst"],
                                    "c": pa.array(np.zeros(len(b)))}),
                batch_format="pyarrow", batch_size=None)),
            ["node"], lambda df: df.drop_duplicates(["node"]),
            n_coarse=n_coarse), c_schema)
        return nodes.map_batches(
            lambda b: pa.table({"node": b["node"],
                                "rank": pa.array(np.ones(len(b)))}),
            batch_format="pyarrow", batch_size=None)

    def _fin(batch: pa.Table) -> pa.Table:
        cv = batch["c"].combine_chunks().to_numpy(zero_copy_only=False)
        # full-precision rank, normalized to mean 1; quantization for
        # the equality gate happens in the query wrapper (these
        # rational-valued ranks sit EXACTLY on decimal rounding
        # boundaries, so any fixed rounding here would be flipped by
        # partition-order float noise run-to-run)
        return pa.table({"node": batch["node"],
                         "rank": pa.array((1.0 - damping) + damping * cv,
                                          pa.float64())})

    return c.map_batches(_fin, batch_format="pyarrow", batch_size=None)


def connected_components(edges: Dataset, src: str = "src",
                         dst: str = "dst",
                         method: str = "propagation") -> Dataset:
    """Connected components over an undirected edge Dataset →
    (node, component) with component = min member id.

    ``method='propagation'`` — thin graph-API front for the iterative
    min-label propagation built for near-dup clustering
    (``textpipe.dup_clusters_distributed``): one hash join + one coarse
    per-node min per round, exact per-node change flags as the
    convergence witness, no driver state. Rounds needed = graph
    DIAMETER — right for the shallow clusters near-dup graphs produce,
    wrong for web graphs with long paths.

    ``method='alternating'`` — the large-star/small-star algorithm
    (Kiveris et al., "Connected Components in MapReduce and Beyond",
    SoCC'14): converges in O(log n) rounds regardless of diameter, the
    100-TB web-graph path. See ``connected_components_alternating``.

    Isolated nodes (absent from the edge list) are by definition their
    own singleton components and are not emitted; self-loop-only nodes
    are treated the same way by the alternating method."""
    if method == "alternating":
        return connected_components_alternating(edges, src=src, dst=dst)
    from omop2obo_ray.pipelines.textpipe import dup_clusters_distributed

    pairs = edges.map_batches(
        lambda b: pa.table({"doc_a": b[src], "doc_b": b[dst]}),
        batch_format="pyarrow", batch_size=None)
    labeled = dup_clusters_distributed(pairs, key_col="node")
    return labeled.map_batches(
        lambda b: pa.table({"node": b["node"],
                            "component": b["cluster_id"]}),
        batch_format="pyarrow", batch_size=None)


def connected_components_alternating(
        edges: Dataset, src: str = "src", dst: str = "dst",
        max_iters: int = 48, n_coarse: int | None = None,
        stats: dict | None = None,
        local_below: int = 65536) -> Dataset:
    """Large-star/small-star connected components → (node, component),
    component = min member id. Converges in O(log n) rounds on ANY
    graph shape (vs O(diameter) for min-label propagation — a 10⁶-hop
    crawl-frontier path would need 10⁶ propagation rounds but ~20
    alternating rounds), which makes it the scale path for web-graph
    link structure.

    Per round (Kiveris et al. SoCC'14, alternating variant):

    - **large-star** — group edges by node over BOTH directions; with
      m = min(neighborhood ∪ {self}), emit (v, m) for every strictly
      larger neighbor v. Hooks big nodes straight onto the local min.
    - **small-star** — orient every edge child→parent (larger→smaller),
      group by child; emit (x, m) for the group's min m over every
      member incl. the child. Flattens chains one level.
    - **dedup + convergence** — one coarse aggregate over old ∪ new
      tagged pairs: dedups the new edge set AND counts pairs present in
      exactly one side. Zero symmetric difference ⇒ the round was a
      no-op ⇒ fixed point (the potential function of the paper is
      strictly decreasing otherwise). At the fixed point every
      component is a star centered on its min node.

    Every step is a ``coarse_aggregate`` (node/pair cardinality is
    unbounded) — three coarse exchanges per round, NO hash joins, no
    driver state beyond the per-round change scalar. Works for string
    or integer node ids (pandas lexicographic/numeric min). If
    ``stats`` is passed, ``stats['rounds']`` records the converged
    round count. Default bucket fan-out is ~3×CPU (the iterative-op
    optimum measured for pagerank: per-round wall is exchange fixed
    cost, not per-group work; 24×CPU buckets nearly doubled it)."""
    if n_coarse is None:
        cpus = (int(ray.cluster_resources().get("CPU", 8))
                if ray.is_initialized() else 8)
        n_coarse = max(32, 3 * cpus)
    ntype = _pa_schema_of(edges).field(src).type
    pair_schema = pa.schema([("src", ntype), ("dst", ntype)])

    def _init(b: pa.Table) -> pa.Table:
        a = b[src].combine_chunks()
        c = b[dst].combine_chunks()
        keep = pc.invert(pc.equal(a, c))
        return pa.table({"src": pc.filter(a, keep), "dst": pc.filter(c, keep)})

    cur = edges.map_batches(_init, batch_format="pyarrow",
                            batch_size=None).materialize()
    ccount = cur.count()
    if ccount == 0:
        return ray.data.from_arrow(pa.table(
            {"node": pa.array([], ntype), "component": pa.array([], ntype)}))
    if ccount <= local_below:
        # endgame local-finish: one union-find task instead of
        # O(log n) three-exchange rounds (identity-pinned by pytest
        # vs local_below=0; same contract incl. self-loop drop)
        from omop2obo_ray.pipelines.textpipe import _cc_local_task

        ct = pa.concat_tables(
            [t for t in cur.iter_batches(batch_size=None,
                                         batch_format="pyarrow")])
        if stats is not None:
            stats["rounds"] = 0
            stats["local_finish"] = True
        ref = _cc_local_task.remote(
            ct["src"].to_pylist(), ct["dst"].to_pylist(),
            ntype, "node", "component")
        return ray.data.from_arrow_refs([ref])

    def _both(b: pa.Table) -> pa.Table:
        return pa.table({
            "u": pa.concat_arrays([b["src"].combine_chunks(),
                                   b["dst"].combine_chunks()]),
            "v": pa.concat_arrays([b["dst"].combine_chunks(),
                                   b["src"].combine_chunks()])})

    def _large(df: pd.DataFrame) -> pd.DataFrame:
        u = df["u"].to_numpy()
        v = df["v"].to_numpy()
        gmin = df.groupby("u", sort=False)["v"].transform("min").to_numpy()
        m = np.where(u < gmin, u, gmin)
        keep = v > u          # v > u ≥ m ⇒ no self-pairs
        return (pd.DataFrame({"src": v[keep], "dst": m[keep]})
                .drop_duplicates())

    def _small(df: pd.DataFrame) -> pd.DataFrame:
        # input pairs oriented child(u) → parent(v), v < u; emit
        # (member, group-min) for every member incl. the child itself
        df = df.reset_index(drop=True)
        m = df.groupby("u", sort=False)["v"].transform("min").to_numpy()
        first = (~df["u"].duplicated()).to_numpy()
        out = pd.DataFrame({
            "src": np.concatenate([df["v"].to_numpy(),
                                   df["u"].to_numpy()[first]]),
            "dst": np.concatenate([m, m[first]])})
        return out.loc[out["src"] != out["dst"]].drop_duplicates()

    def _orient(b: pa.Table) -> pa.Table:
        a = b["src"].combine_chunks()
        c = b["dst"].combine_chunks()
        flip = pc.less(a, c)  # key u must be the LARGER endpoint
        return pa.table({"u": pc.if_else(flip, c, a),
                         "v": pc.if_else(flip, a, c)})

    def _tag(val: int):
        def fn(b: pa.Table) -> pa.Table:
            return pa.table({
                "src": b["src"], "dst": b["dst"],
                "_t": pa.array(np.full(len(b), val, np.int64))})
        return fn

    def _cmp(df: pd.DataFrame) -> pd.DataFrame:
        agg = (df.groupby(["src", "dst"], sort=False)["_t"]
               .agg(["min", "max"]).reset_index())
        in_old = agg["min"].to_numpy() == 0
        in_new = agg["max"].to_numpy() == 1
        agg["_new"] = in_new.astype(np.int64)
        agg["_chg"] = (in_old ^ in_new).astype(np.int64)
        return agg[["src", "dst", "_new", "_chg"]]

    def _keep_new(df: pd.DataFrame) -> pd.DataFrame:
        return df.loc[df["_new"] == 1, ["src", "dst"]]

    rounds = 0
    for _ in range(max_iters):
        rounds += 1
        big = _sanitize_join_output(coarse_aggregate(
            cur.map_batches(_both, batch_format="pyarrow", batch_size=None),
            ["u"], _large, n_coarse=n_coarse), pair_schema)
        new = _sanitize_join_output(coarse_aggregate(
            big.map_batches(_orient, batch_format="pyarrow",
                            batch_size=None),
            ["u"], _small, n_coarse=n_coarse), pair_schema)
        merged = _sanitize_join_output(coarse_aggregate(
            cur.map_batches(_tag(0), batch_format="pyarrow",
                            batch_size=None)
            .union(new.map_batches(_tag(1), batch_format="pyarrow",
                                   batch_size=None)),
            ["src", "dst"], _cmp,
            n_coarse=n_coarse),
            pa.schema([("src", ntype), ("dst", ntype),
                       ("_new", pa.int64()), ("_chg", pa.int64())])
        ).materialize()
        cur = merged.map_batches(_keep_new, batch_format="pandas",
                                 batch_size=None)
        if merged.sum("_chg") == 0:
            break
    if stats is not None:
        stats["rounds"] = rounds

    # fixed point = disjoint stars (child → min-root): children label
    # from their edge, roots label themselves (deduped per node)
    def _labels(b: pa.Table) -> pa.Table:
        return pa.table({
            "node": pa.concat_arrays([b["src"].combine_chunks(),
                                      b["dst"].combine_chunks()]),
            "component": pa.concat_arrays([b["dst"].combine_chunks(),
                                           b["dst"].combine_chunks()])})

    return coarse_aggregate(
        cur.map_batches(_labels, batch_format="pyarrow", batch_size=None),
        ["node"],
        lambda df: df.groupby("node", sort=False)
        .agg(component=("component", "min")).reset_index(),
        n_coarse=n_coarse)


def sameas_resolve(triples: Dataset, *, sameas_pred: str = "owl:sameAs",
                   s_col: str = "subj", p_col: str = "pred",
                   o_col: str = "obj",
                   keep_mapping: bool = False) -> Dataset:
    """owl:sameAs identity resolution ("smushing"): collapse every
    sameAs-connected alias cluster onto its canonical (minimum-id)
    member and rewrite the remaining triples onto the canonical ids —
    the standard Linked-Data consolidation step, and the graph-side
    twin of this engine's surface-form canonicalization (the reference
    consolidates aliases to one concept_id per cluster the same way:
    `omop2obo/utils/data_utils.py:551-622` picks one canonical mapping
    per concept from its evidence set).

    Steps (all Datasets end-to-end — alias-cluster mass never touches
    the driver):

    1. split the stream: ``pred == sameas_pred`` rows become the alias
       edge set; everything else is a data triple (two filter maps
       over the same scan).
    2. connected components over the alias graph via the alternating
       large-star/small-star method (O(log n) rounds at any diameter —
       sameAs chains across mirror sites can be arbitrarily long).
    3. rewrite: two left-outer ``coarse_join``s (subject side, then
       object side); ids outside every alias cluster keep themselves
       (the join's null is coalesced back to the original id).
    4. distinct (subj, pred, obj) — smushing can collapse several
       source triples onto one canonical triple, and downstream
       consumers expect set semantics. One coarse aggregate.

    The sameAs triples themselves are consumed (a canonical self-loop
    carries no information). With ``keep_mapping=True`` the return is
    the (node, component) alias→canonical mapping Dataset instead of
    the rewritten triples — callers that rewrite several triple
    streams against one alias graph compute the mapping once.

    Partitioning contract: both rewrite joins key on entity id, so a
    production deployment co-partitions the triple store by
    hash(subject) and reuses that partitioning for the subject-side
    join; the object side is the one genuine re-exchange.
    """
    from omop2obo_ray.functions.shuffle import coarse_join

    sch = _pa_schema_of(triples)
    ntype = sch.field(s_col).type
    tri_schema = pa.schema([(s_col, ntype), (p_col, sch.field(p_col).type),
                            (o_col, sch.field(o_col).type)])

    def _edges(b: pa.Table) -> pa.Table:
        m = pc.equal(b[p_col], pa.scalar(sameas_pred))
        f = b.filter(m)
        return pa.table({"src": f[s_col], "dst": f[o_col]})

    def _data(b: pa.Table) -> pa.Table:
        f = b.filter(pc.not_equal(b[p_col], pa.scalar(sameas_pred)))
        return pa.table({s_col: f[s_col], p_col: f[p_col], o_col: f[o_col]})

    edges = triples.map_batches(_edges, batch_format="pyarrow",
                                batch_size=None)
    mapping = connected_components_alternating(edges)
    if keep_mapping:
        return mapping
    mapping = _sanitize_join_output(
        mapping, pa.schema([("node", ntype), ("component", ntype)]))
    data = _sanitize_join_output(
        triples.map_batches(_data, batch_format="pyarrow",
                            batch_size=None), tri_schema)

    def _apply(col: str):
        def fn(b: pa.Table) -> pa.Table:
            # a bucket with no alias rows yields a null-typed payload
            # column from the pandas merge — align before coalescing
            comp = b["component"].combine_chunks().cast(
                tri_schema.field(col).type)
            canon = pc.coalesce(comp, b[col])
            return pa.table({**{c: b[c] for c in tri_schema.names
                                if c != col}, col: canon}).select(
                tri_schema.names)
        return fn

    # subject-side rewrite, then object-side; each join is left-outer
    # (entities outside every alias cluster keep their own id)
    out = coarse_join(data, mapping, on=s_col, right_on="node",
                      how="left_outer").map_batches(
        _apply(s_col), batch_format="pyarrow", batch_size=None)
    out = _sanitize_join_output(out, tri_schema)
    out = coarse_join(out, mapping, on=o_col, right_on="node",
                      how="left_outer").map_batches(
        _apply(o_col), batch_format="pyarrow", batch_size=None)
    return coarse_aggregate(
        out, [s_col, p_col, o_col],
        lambda df: df.drop_duplicates([s_col, p_col, o_col]))


# ---------------------------------------------------------------------------
# Web-graph extraction: anchor hrefs from raw page html → edge Dataset
# (the bridge from the Common-Crawl pages table to the graph family —
# feed the result to pagerank / degree_stats / connected_components)
# ---------------------------------------------------------------------------

def anchor_edges(pages: Dataset, url_col: str = "url",
                 html_col: str = "html") -> Dataset:
    """(page url, anchor href) edges parsed from the binary ``html``
    column (input_hint schema) → (src, dst), one row per anchor
    occurrence in document order. Pure streaming map over whole
    blocks; parsing is inherently per-page (same cost class as
    ``extract_text_batch``)."""
    from omop2obo_ray.functions.html import extract_anchors

    def _edges(batch: pa.Table) -> pa.Table:
        srcs, dsts = [], []
        for u, h in zip(batch[url_col].to_pylist(),
                        batch[html_col].to_pylist()):
            for dst in extract_anchors(h):
                srcs.append(u)
                dsts.append(dst)
        return pa.table({"src": pa.array(srcs, pa.string()),
                         "dst": pa.array(dsts, pa.string())})

    return pages.select_columns([url_col, html_col]).map_batches(
        _edges, batch_format="pyarrow", batch_size=None)


def synth_anchor_pages(docs: Dataset) -> Dataset:
    """Deterministic html page per document with 3 outbound anchors
    (test/bench support — the sandbox's documents table carries no
    html; production input does, per BASELINE.json's input_hint). The
    anchor-target rule ``(doc_id*31 + k*17) % 500`` for k=1..3 is a
    shared contract with the SQL oracle, so the anchor_graph gate
    round-trips the REAL html parser against pure arithmetic. The
    rendered page exercises quote styles, attribute order, tag case
    and entity escapes."""
    def _render(batch: pa.Table) -> pa.Table:
        ids = batch["doc_id"].to_numpy(zero_copy_only=False)
        urls, htmls = [], []
        for i in ids:
            t = [(int(i) * 31 + k * 17) % 500 for k in (1, 2, 3)]
            page = (
                f"<html><body><p>doc {i}</p>"
                f"<a href=\"https://site-{t[0]}.example.com/page\">a</a>"
                f"<A rel=nofollow HREF='https://site-{t[1]}.example.com/page'>b</A>"
                f"<a class=\"x\" href=\"https://site-{t[2]}.example.com/page?x=1&amp;y=2\">c</a>"
                f"</body></html>")
            urls.append(f"https://host-{i}.test/index")
            htmls.append(page.encode())
        return pa.table({"url": pa.array(urls, pa.string()),
                         "html": pa.array(htmls, pa.binary())})

    return docs.select_columns(["doc_id"]).map_batches(
        _render, batch_format="pyarrow", batch_size=None)


# ---------------------------------------------------------------------------
# Triangle counting (Suri-Vassilvitskii'11 / Cohen'09 MapReduce shape):
# degree orientation bounds per-node wedge generation by the SMALLER
# endpoint's degree, so a 10⁹-degree hub never enumerates its
# neighbor pairs — the skew story that makes this viable on web graphs
# ---------------------------------------------------------------------------

def _canonical_undirected(edges: Dataset, src: str = "src",
                          dst: str = "dst") -> Dataset:
    """Canonical deduped undirected simple edge set → (a, b) with
    a < b, self-loops dropped (coarse aggregate — edge cardinality is
    unbounded)."""
    return _sanitize_join_output(
        coarse_aggregate(
            edges.map_batches(
                lambda b: pa.table({
                    "a": pc.min_element_wise(b[src], b[dst]),
                    "b": pc.max_element_wise(b[src], b[dst])}),
                batch_format="pyarrow", batch_size=None).map_batches(
                lambda b: b.filter(pc.not_equal(b["a"], b["b"])),
                batch_format="pyarrow", batch_size=None),
            ["a", "b"],
            lambda df: df.drop_duplicates()),
        pa.schema([("a", pa.string()), ("b", pa.string())]))


def _undirected_degrees(und: Dataset) -> Dataset:
    """(node, d) degrees over a canonical undirected edge set."""
    incid = und.map_batches(
        lambda b: pa.table({"node": pa.concat_arrays([
            b["a"].combine_chunks().cast(pa.string()),
            b["b"].combine_chunks().cast(pa.string())])}),
        batch_format="pyarrow", batch_size=None)
    return _sanitize_join_output(
        coarse_aggregate(incid, ["node"],
                         lambda df: df.groupby("node", sort=False)
                         .size().rename("d").reset_index()),
        pa.schema([("node", pa.string()), ("d", pa.int64())]))


def _closed_wedges(und: Dataset, deg: Dataset,
                   num_partitions: int = 8) -> Dataset | None:
    """Closed wedges of the canonical undirected graph → (ws, a, b):
    every triangle appears EXACTLY ONCE, centered (ws) at its lowest
    (degree, id) vertex with (a, b) the closing edge. ``None`` when the
    graph has no wedges at all (Ray 2.49 cannot hash-join an empty left
    side). Degree orientation bounds the per-center pair fan-out by the
    SMALLER endpoint degree (Suri–Vassilvitskii) — the hub-skew
    guarantee."""
    j1 = _sanitize_join_output(
        und.join(deg, join_type="inner", num_partitions=num_partitions,
                 on=("a",), right_on=("node",)),
        pa.schema([("a", pa.string()), ("b", pa.string()),
                   ("d", pa.int64())]))
    j1 = j1.map_batches(
        lambda b: pa.table({"a": b["a"], "b": b["b"], "da": b["d"]}),
        batch_format="pyarrow", batch_size=None)
    j2 = _sanitize_join_output(
        j1.join(deg, join_type="inner", num_partitions=num_partitions,
                on=("b",), right_on=("node",)),
        pa.schema([("a", pa.string()), ("b", pa.string()),
                   ("da", pa.int64()), ("d", pa.int64())]))

    def _orient(batch: pa.Table) -> pa.Table:
        a = batch["a"].to_numpy(zero_copy_only=False)
        b = batch["b"].to_numpy(zero_copy_only=False)
        da = batch["da"].to_numpy(zero_copy_only=False)
        db = batch["d"].to_numpy(zero_copy_only=False)
        # low (degree, id) endpoint becomes the wedge center
        a_first = (da < db) | ((da == db) & (a < b))
        return pa.table({
            "ws": pa.array(np.where(a_first, a, b), pa.string()),
            "wd": pa.array(np.where(a_first, b, a), pa.string())})

    oriented = j2.map_batches(_orient, batch_format="pyarrow",
                              batch_size=None)

    from omop2obo_ray.functions.shuffle import coarse_apply_per_key

    def _wedges(g: pd.DataFrame) -> pd.DataFrame:
        nb = np.sort(g["wd"].to_numpy(dtype=object))
        if len(nb) < 2:
            return pd.DataFrame({"ws": [], "a": [], "b": []})
        i, j = np.triu_indices(len(nb), 1)
        return pd.DataFrame({"ws": g["ws"].iloc[0], "a": nb[i], "b": nb[j]})

    wedges = _sanitize_join_output(
        coarse_apply_per_key(oriented, ["ws"], _wedges),
        pa.schema([("ws", pa.string()), ("a", pa.string()),
                   ("b", pa.string())]))
    if wedges.count() == 0:
        return None

    return _sanitize_join_output(
        wedges.join(und.map_batches(
            lambda t: pa.table({"a": t["a"], "b": t["b"],
                                "one": pa.array(
                                    np.ones(t.num_rows, np.int64))}),
            batch_format="pyarrow", batch_size=None),
            join_type="inner", num_partitions=num_partitions,
            on=("a", "b")),
        pa.schema([("ws", pa.string()), ("a", pa.string()),
                   ("b", pa.string()), ("one", pa.int64())]))


def triangle_count(edges: Dataset, src: str = "src",
                   dst: str = "dst",
                   num_partitions: int = 8) -> Dataset:
    """Exact global triangle count of the UNDIRECTED simple graph
    underlying ``edges`` → one row (n_triangles).

    Stages: canonicalize+dedup edges (coarse aggregate) → degree per
    node (coarse aggregate) → orient each edge low-degree→high-degree
    (two hash joins attach endpoint degrees; ties break on node id) →
    per-src wedge generation (coarse per-key; out-degree after
    orientation is O(√m)-bounded, so the d² pair fan-out is too) →
    hash-join wedges against the canonical edge set → count. Every
    exchange keys on node id or the (a, b) edge pair; nothing touches
    the driver but the final scalar."""
    und = _canonical_undirected(edges, src, dst)
    closed = _closed_wedges(und, _undirected_degrees(und),
                            num_partitions=num_partitions)
    n = 0 if closed is None else closed.count()
    return ray.data.from_arrow(pa.table({
        "n_triangles": pa.array([n], pa.int64())}))


def clustering_coefficient(edges: Dataset, src: str = "src",
                           dst: str = "dst",
                           num_partitions: int = 8) -> Dataset:
    """Local clustering coefficient per node → (node, d, tri, coeff):
    tri = triangles through the node, coeff = 2·tri / (d·(d−1))
    (0 when d < 2). Reuses the degree-oriented closed-wedge stream —
    each closed wedge (ws, a, b) is one distinct triangle touching
    exactly {ws, a, b}, so per-node triangle counts are ONE coarse sum
    over the exploded endpoints; nodes in no triangle arrive via a
    left-outer join from the degree table. No driver state."""
    und = _canonical_undirected(edges, src, dst)
    deg = _undirected_degrees(und)
    closed = _closed_wedges(und, deg, num_partitions=num_partitions)

    if closed is None or closed.count() == 0:
        # triangle-free graph: the typed-empty closed set cannot feed a
        # join (zero-row blocks are schema-less after the exchange and
        # map_batches bypasses them — the rename never lands)
        def _zero(batch: pa.Table) -> pa.Table:
            return pa.table({
                "node": batch["node"], "d": batch["d"],
                "tri": pa.array(np.zeros(batch.num_rows, np.int64)),
                "coeff": pa.array(np.zeros(batch.num_rows, np.float64))})
        return deg.map_batches(_zero, batch_format="pyarrow",
                               batch_size=None)

    touched = closed.map_batches(
        lambda b: pa.table({"node": pa.concat_arrays([
            b["ws"].combine_chunks().cast(pa.string()),
            b["a"].combine_chunks().cast(pa.string()),
            b["b"].combine_chunks().cast(pa.string())])}),
        batch_format="pyarrow", batch_size=None)
    tri = _sanitize_join_output(
        coarse_aggregate(touched, ["node"],
                         lambda df: df.groupby("node", sort=False)
                         .size().rename("tri").reset_index()),
        pa.schema([("node", pa.string()), ("tri", pa.int64())]))

    out = _sanitize_join_output(
        deg.join(tri.map_batches(
            lambda b: pa.table({"tn": b["node"], "tri": b["tri"]}),
            batch_format="pyarrow", batch_size=None),
            join_type="left_outer", num_partitions=num_partitions,
            on=("node",), right_on=("tn",)),
        pa.schema([("node", pa.string()), ("d", pa.int64()),
                   ("tri", pa.int64())]))

    def _coeff(batch: pa.Table) -> pa.Table:
        d = batch["d"].to_numpy(zero_copy_only=False).astype(np.int64)
        t = np.nan_to_num(batch["tri"].to_numpy(zero_copy_only=False)
                          .astype(np.float64), nan=0.0).astype(np.int64)
        denom = d * (d - 1)
        coeff = np.where(denom > 0, 2.0 * t / np.maximum(denom, 1), 0.0)
        return pa.table({"node": batch["node"],
                         "d": pa.array(d, pa.int64()),
                         "tri": pa.array(t, pa.int64()),
                         "coeff": pa.array(coeff, pa.float64())})

    return out.map_batches(_coeff, batch_format="pyarrow",
                           batch_size=None)


# ---------------------------------------------------------------------------
# HITS hubs/authorities (Kleinberg'99) — fixed-iteration UNNORMALIZED
# recurrence, so every score is an exact int64 path count and the SQL
# gate needs no quantization at all: a₁(v)=indeg(v);
# hₖ(u)=Σ_{u→v} aₖ(v); aₖ₊₁(v)=Σ_{u→v} hₖ(u); h₀≡1.
# ---------------------------------------------------------------------------

def hits(edges: Dataset, iterations: int = 2,
         num_partitions: int = 8) -> Dataset:
    """(node, hub, auth) after ``iterations`` mutual-reinforcement
    rounds over the DISTINCT directed edge set. Same exchange shape as
    pagerank post-rewrite: per round ONE task-based coarse-bucket join
    (``functions/shuffle.coarse_join`` — no per-plan aggregator-actor
    pool) + ONE coarse per-endpoint sum. Because a/h cover exactly
    {dsts}/{srcs} at every step, the final (node, hub, auth) table is
    ONE zero-filling coarse merge of the two score tables — no node-set
    pass, no left-outer joins. Unnormalized counts overflow int64 only
    past ~10¹⁸ paths — document the cap, normalize downstream."""
    del num_partitions  # superseded by coarse-bucket fan-out
    from omop2obo_ray.functions.shuffle import coarse_join

    cpus = (int(ray.cluster_resources().get("CPU", 8))
            if ray.is_initialized() else 8)
    n_coarse = max(32, 3 * cpus)
    e = _sanitize_join_output(
        coarse_aggregate(edges.select_columns(["src", "dst"]),
                         ["src", "dst"],
                         lambda df: df.drop_duplicates(),
                         n_coarse=n_coarse),
        pa.schema([("src", pa.string()), ("dst", pa.string())])
    ).materialize()
    nt = _pa_schema_of(e).field("src").type

    def _sum_per(ds: Dataset, key: str, val: str, out: str) -> Dataset:
        return _sanitize_join_output(
            coarse_aggregate(
                ds, [key],
                lambda df: df.groupby(key, sort=False)[val].sum()
                .rename(out).reset_index(), n_coarse=n_coarse),
            pa.schema([(key, nt), (out, pa.int64())]))

    # a₁ = indeg (h₀ ≡ 1): a slim count, no join needed
    auth = _sum_per(e.map_batches(
        lambda b: pa.table({"dst": b["dst"],
                            "v": pa.array(np.ones(b.num_rows, np.int64))}),
        batch_format="pyarrow", batch_size=None), "dst", "v", "auth")

    hub = None
    for it in range(iterations):
        # hₖ(u) = Σ_{(u,v)} aₖ(v)
        ea = coarse_join(e, auth, on="dst", n_coarse=n_coarse)
        hub = _sum_per(ea.map_batches(
            lambda b: pa.table({"src": b["src"], "v": b["auth"]}),
            batch_format="pyarrow", batch_size=None), "src", "v", "hub")
        if it == iterations - 1:
            break
        # aₖ₊₁(v) = Σ_{(u,v)} hₖ(u)
        eh = coarse_join(e, hub, on="src", n_coarse=n_coarse)
        auth = _sum_per(eh.map_batches(
            lambda b: pa.table({"dst": b["dst"], "v": b["hub"]}),
            batch_format="pyarrow", batch_size=None), "dst", "v", "auth")

    # hub covers exactly the source set, auth exactly the dst set —
    # node set = union of the two score tables, absent side = 0
    tagged = hub.map_batches(
        lambda b: pa.table({"node": b["src"], "h": b["hub"],
                            "a": pa.array(np.zeros(b.num_rows, np.int64))}),
        batch_format="pyarrow", batch_size=None).union(
        auth.map_batches(
            lambda b: pa.table({"node": b["dst"],
                                "h": pa.array(np.zeros(b.num_rows,
                                                       np.int64)),
                                "a": b["auth"]}),
            batch_format="pyarrow", batch_size=None))
    merged = _sanitize_join_output(coarse_aggregate(
        tagged, ["node"],
        lambda df: df.groupby("node", sort=False)
        .agg(hub=("h", "sum"), auth=("a", "sum")).reset_index(),
        n_coarse=n_coarse),
        pa.schema([("node", nt), ("hub", pa.int64()),
                   ("auth", pa.int64())]))
    return merged


# ---------------------------------------------------------------------------
# Multi-source BFS hop distance + k-core decomposition
# ---------------------------------------------------------------------------

def bfs_hops(edges: Dataset, seeds: list[str], *, max_hops: int = 8,
             directed: bool = False, num_partitions: int = 8) -> Dataset:
    """Minimum hop distance from any seed → (node, hops), hops ≤
    ``max_hops``; unreached nodes are not emitted.

    Frontier-parallel BFS: per round ONE hash join (edges × frontier on
    the source endpoint) + ONE coarse distinct + ONE left-outer
    anti-join against the visited set — the frontier and visited tables
    are Datasets end-to-end, the driver holds only the seed list
    (bounded: crawl entry points / trusted hosts) and per-round row
    counts. Rounds = eccentricity of the seed set, capped by
    ``max_hops`` — BFS depth on web graphs is small (the point of the
    cap); for full-graph reachability without a depth bound use
    ``connected_components`` instead. Partitioning contract: both the
    join and the distinct key on node id, so a deployment co-partitions
    edges by hash(src) once and reuses it every round.
    """
    if not seeds:
        raise ValueError("bfs_hops: seeds must be non-empty")
    e = edges.select_columns(["src", "dst"])
    if not directed:
        e = e.union(e.map_batches(
            lambda b: pa.table({"src": b["dst"], "dst": b["src"]}),
            batch_format="pyarrow", batch_size=None))
    e = _sanitize_join_output(
        coarse_aggregate(e, ["src", "dst"],
                         lambda df: df.drop_duplicates()),
        pa.schema([("src", pa.string()), ("dst", pa.string())])
    ).materialize()

    seed_tbl = pa.table({
        "node": pa.array(sorted(set(seeds)), pa.string()),
        "hops": pa.array([0] * len(set(seeds)), pa.int64())})
    dist = ray.data.from_arrow(seed_tbl).materialize()
    frontier = dist

    from omop2obo_ray.functions.shuffle import coarse_join

    for k in range(1, max_hops + 1):
        if frontier.count() == 0:
            break
        # neighbors of the frontier (distinct) — task-based coarse join
        # (no per-round aggregator-actor pool, see coarse_join)
        nb = coarse_join(
            e, frontier.map_batches(
                lambda b: pa.table({"fn": b["node"]}),
                batch_format="pyarrow", batch_size=None),
            on="src", right_on="fn")
        nb = _sanitize_join_output(
            coarse_aggregate(
                nb.map_batches(lambda b: pa.table({"node": b["dst"]}),
                               batch_format="pyarrow", batch_size=None),
                ["node"], lambda df: df.drop_duplicates()),
            pa.schema([("node", pa.string())]))
        if nb.count() == 0:
            break
        # unvisited only: left-outer against dist, keep null hops
        probe = coarse_join(
            nb, dist.map_batches(
                lambda b: pa.table({"vn": b["node"], "seen": b["hops"]}),
                batch_format="pyarrow", batch_size=None),
            on="node", right_on="vn", how="left_outer")
        new = probe.map_batches(
            lambda b, _k=k: pa.table({
                "node": b.filter(pc.is_null(b["seen"]))["node"],
                "hops": pa.array(
                    np.full(b.filter(pc.is_null(b["seen"])).num_rows,
                            _k, np.int64))}),
            batch_format="pyarrow", batch_size=None)
        new = _sanitize_join_output(
            new, pa.schema([("node", pa.string()), ("hops", pa.int64())]))
        if new.count() == 0:
            break
        dist = dist.union(new).materialize()
        frontier = new
    return dist


def kcore(edges: Dataset, k: int, *, max_iters: int = 64,
          num_partitions: int = 8) -> Dataset:
    """Nodes of the k-core (maximal subgraph where every node has
    degree ≥ k in the subgraph) → (node, d) with d = the node's degree
    WITHIN the core. Iterative peeling: per round one coarse degree
    count + two hash joins that drop edges touching sub-k nodes; the
    edge set only shrinks, so rounds are bounded by the peeling depth
    (≪ n in practice; ``max_iters`` is the backstop). Driver state:
    per-round scalar counts only. Used to isolate the dense link-farm /
    boilerplate cores of a crawl graph before ranking.
    """
    if k < 1:
        raise ValueError("kcore: k must be >= 1")
    und = _canonical_undirected(edges).materialize()

    for _ in range(max_iters):
        if und.count() == 0:
            break
        deg = _undirected_degrees(und)
        bad = _sanitize_join_output(
            deg.map_batches(
                lambda b, _k=k: b.filter(pc.less(b["d"], _k)),
                batch_format="pyarrow", batch_size=None),
            pa.schema([("node", pa.string()), ("d", pa.int64())]))
        if bad.count() == 0:
            break
        bad = bad.map_batches(
            lambda b: pa.table({"bn": b["node"],
                                "flag": pa.array(np.ones(b.num_rows,
                                                         np.int64))}),
            batch_format="pyarrow", batch_size=None)
        # drop edges with a bad endpoint (two anti-joins via the
        # task-based coarse-bucket join — no aggregator-actor pool per
        # round; see functions/shuffle.coarse_join)
        from omop2obo_ray.functions.shuffle import coarse_join

        for side in ("a", "b"):
            und = coarse_join(und, bad, on=side, right_on="bn",
                              how="left_outer")
            und = _sanitize_join_output(
                und.map_batches(
                    lambda t: t.filter(pc.is_null(t["flag"]))
                    .select(["a", "b"]),
                    batch_format="pyarrow", batch_size=None),
                pa.schema([("a", pa.string()), ("b", pa.string())]))
            if und.count() == 0:
                break
        und = und.materialize()

    if und.count() == 0:
        return ray.data.from_arrow(pa.table({
            "node": pa.array([], pa.string()),
            "d": pa.array([], pa.int64())}))
    return _undirected_degrees(und)


# ---------------------------------------------------------------------------
# Link prediction (Liben-Nowell & Kleinberg'03): common-neighbors,
# Adamic-Adar and Jaccard scores for node pairs that share at least one
# neighbor — the candidate-edge ranking a KG-completion / related-page
# consumer runs over the crawl graph this engine materializes.
# ---------------------------------------------------------------------------

def link_prediction(edges: Dataset, *, max_center_degree: int = 10_000,
                    include_existing: bool = False,
                    num_partitions: int = 8) -> Dataset:
    """Link-prediction scores → (a, b, cn, aa, jacc) for every
    UNORDERED non-edge pair (a < b) with ≥ 1 common neighbor:
    ``cn`` = |Γ(a) ∩ Γ(b)|, ``aa`` = Σ_{u ∈ Γ(a)∩Γ(b)} 1/ln(deg(u))
    (Adamic-Adar), ``jacc`` = cn / (deg(a) + deg(b) − cn). Existing
    edges are anti-joined away unless ``include_existing``.

    Exact common-neighbor enumeration is inherently hub-quadratic (a
    degree-10⁶ page generates 5·10¹¹ neighbor pairs), so centers with
    degree > ``max_center_degree`` are EXCLUDED from the wedge pass —
    the standard skew guard (hubs contribute ≈ 1/ln(d) → 0 to AA and
    connect everything to everything, pure noise for ranking). The
    guard REDEFINES all three metrics to "over common neighbors of
    degree ≤ cap" — any oracle must share the rule (same contract as
    ``curate.similarity_join``'s max_df guard).

    Shape: canonical undirected dedup (coarse) → degrees (coarse) →
    center-degree join → per-center neighbor pairs (coarse per-key;
    fan-out capped by the guard) → per-pair coarse sum → existing-edge
    anti-join → two degree joins for the Jaccard denominator. Every
    exchange keys on node id or the pair; driver state: none. Floats
    (aa, jacc) are full precision — equality gates quantize in the
    query wrapper (see pagerank's module-docstring rationale).
    """
    und = _canonical_undirected(edges).materialize()
    empty = pa.table({
        "a": pa.array([], pa.string()), "b": pa.array([], pa.string()),
        "cn": pa.array([], pa.int64()), "aa": pa.array([], pa.float64()),
        "jacc": pa.array([], pa.float64())})
    if und.count() == 0:
        return ray.data.from_arrow(empty)
    deg = _undirected_degrees(und).materialize()

    sym = und.map_batches(
        lambda b: pa.table({
            "c": pa.concat_arrays([b["a"].combine_chunks().cast(pa.string()),
                                   b["b"].combine_chunks().cast(pa.string())]),
            "v": pa.concat_arrays([b["b"].combine_chunks().cast(pa.string()),
                                   b["a"].combine_chunks().cast(pa.string())]),
        }), batch_format="pyarrow", batch_size=None)
    symd = _sanitize_join_output(
        sym.join(deg, join_type="inner", num_partitions=num_partitions,
                 on=("c",), right_on=("node",)),
        pa.schema([("c", pa.string()), ("v", pa.string()),
                   ("d", pa.int64())]))
    symd = symd.map_batches(
        lambda b, _cap=max_center_degree: b.filter(
            pc.and_(pc.greater_equal(b["d"], 2),
                    pc.less_equal(b["d"], _cap))),
        batch_format="pyarrow", batch_size=None)

    from omop2obo_ray.functions.shuffle import coarse_apply_per_key

    def _pairs(g: pd.DataFrame) -> pd.DataFrame:
        nb = np.sort(g["v"].to_numpy(dtype=object))
        if len(nb) < 2:
            return pd.DataFrame({"a": [], "b": [], "cn": [], "aa": []})
        i, j = np.triu_indices(len(nb), 1)
        w = 1.0 / np.log(float(g["d"].iloc[0]))
        return pd.DataFrame({"a": nb[i], "b": nb[j],
                             "cn": np.ones(len(i), np.int64),
                             "aa": np.full(len(i), w)})

    wedges = _sanitize_join_output(
        coarse_apply_per_key(symd, ["c"], _pairs),
        pa.schema([("a", pa.string()), ("b", pa.string()),
                   ("cn", pa.int64()), ("aa", pa.float64())]))
    if wedges.count() == 0:
        return ray.data.from_arrow(empty)

    pairs = _sanitize_join_output(
        coarse_aggregate(
            wedges, ["a", "b"],
            lambda df: df.groupby(["a", "b"], sort=False)
            .agg(cn=("cn", "sum"), aa=("aa", "sum")).reset_index()),
        pa.schema([("a", pa.string()), ("b", pa.string()),
                   ("cn", pa.int64()), ("aa", pa.float64())]))

    if not include_existing:
        flagged = _sanitize_join_output(
            pairs.join(und.map_batches(
                lambda t: pa.table({
                    "a": t["a"], "b": t["b"],
                    "flag": pa.array(np.ones(t.num_rows, np.int64))}),
                batch_format="pyarrow", batch_size=None),
                join_type="left_outer", num_partitions=num_partitions,
                on=("a", "b")),
            pa.schema([("a", pa.string()), ("b", pa.string()),
                       ("cn", pa.int64()), ("aa", pa.float64()),
                       ("flag", pa.int64())]))
        pairs = _sanitize_join_output(
            flagged.map_batches(
                lambda t: t.filter(pc.is_null(t["flag"]))
                .select(["a", "b", "cn", "aa"]),
                batch_format="pyarrow", batch_size=None),
            pa.schema([("a", pa.string()), ("b", pa.string()),
                       ("cn", pa.int64()), ("aa", pa.float64())]))
        if pairs.count() == 0:
            return ray.data.from_arrow(empty)

    # Jaccard denominator: FULL endpoint degrees (uncapped — only the
    # common-neighbor enumeration is guarded)
    j1 = _sanitize_join_output(
        pairs.join(deg.map_batches(
            lambda t: pa.table({"n1": t["node"], "da": t["d"]}),
            batch_format="pyarrow", batch_size=None),
            join_type="inner", num_partitions=num_partitions,
            on=("a",), right_on=("n1",)),
        pa.schema([("a", pa.string()), ("b", pa.string()),
                   ("cn", pa.int64()), ("aa", pa.float64()),
                   ("da", pa.int64())]))
    j2 = _sanitize_join_output(
        j1.join(deg.map_batches(
            lambda t: pa.table({"n2": t["node"], "db": t["d"]}),
            batch_format="pyarrow", batch_size=None),
            join_type="inner", num_partitions=num_partitions,
            on=("b",), right_on=("n2",)),
        pa.schema([("a", pa.string()), ("b", pa.string()),
                   ("cn", pa.int64()), ("aa", pa.float64()),
                   ("da", pa.int64()), ("db", pa.int64())]))

    def _fin(batch: pa.Table) -> pa.Table:
        cn = batch["cn"].to_numpy(zero_copy_only=False).astype(np.int64)
        da = batch["da"].to_numpy(zero_copy_only=False).astype(np.int64)
        db = batch["db"].to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table({
            "a": batch["a"], "b": batch["b"],
            "cn": pa.array(cn, pa.int64()),
            "aa": batch["aa"],
            "jacc": pa.array(cn / (da + db - cn), pa.float64())})

    return j2.map_batches(_fin, batch_format="pyarrow", batch_size=None)


class _AncestorExpander:
    """Actor-held closure walker: broadcast parent map pulled once per
    actor in ``__init__``, per-concept ancestor chains memoized across
    batches. Emits one (concept, ancestor) contribution row per
    closure edge PLUS the self row — the input to a rollup sum."""

    def __init__(self, parent_ref, concept_col: str, count_col: str):
        # child → tuple of parents (ontologies are multi-parent DAGs)
        self._parents: dict = ray.get(parent_ref)
        self._chains: dict = {}
        self._concept = concept_col
        self._count = count_col

    def _chain(self, c):
        """DISTINCT ancestor set of ``c`` (BFS over all parents —
        a count reaches a diamond-top ancestor once, matching the
        SQL recursive-closure UNION semantics)."""
        got = self._chains.get(c)
        if got is not None:
            return got
        seen, frontier = {c}, [c]
        out = []
        while frontier:
            nxt = []
            for x in frontier:
                for a in self._parents.get(x, ()):
                    if a not in seen:
                        seen.add(a)
                        out.append(a)
                        nxt.append(a)
            frontier = nxt
        self._chains[c] = out
        return out

    def __call__(self, batch: pa.Table) -> pa.Table:
        concepts = batch[self._concept].to_pylist()
        ns = batch[self._count].to_numpy(zero_copy_only=False)
        out_c, out_n = [], []
        for c, n in zip(concepts, ns):
            out_c.append(c)
            out_n.append(n)
            for a in self._chain(c):
                out_c.append(a)
                out_n.append(n)
        return pa.table({
            self._concept: pa.array(out_c, batch.schema.field(self._concept).type),
            self._count: pa.array(np.asarray(out_n, dtype=np.int64), pa.int64())})


def taxonomy_rollup(counts: Dataset, edges: Dataset, *,
                    concept_col: str = "concept", count_col: str = "n",
                    child_col: str = "child",
                    parent_col: str = "parent") -> Dataset:
    """Roll per-concept counts up a concept DAG: each concept's
    ``total`` = its own count + every descendant's count — the
    aggregate form of OMOP2OBO's ancestor-closure expansion
    (reference precomputes ancestors per concept,
    `omop2obo/utils/ontology_utils.py`; here the closure walk is
    distributed over the counts stream).

    Scale shape: ``edges`` is ontology-sized (dimension data,
    10⁵–10⁶ rows — NCBITaxon-scale), so the parent map is built once
    on the driver and broadcast via ``ray.put``; ``counts`` (which may
    itself be the output of a corpus-sized aggregation) streams
    through ONE actor-pool map_batches that emits (ancestor, n)
    contribution rows (chains memoized per actor) and ONE coarse
    aggregate sums per concept. No corpus-sized driver state; the
    only exchange is the final keyed sum.
    """
    ed = edges.select_columns([child_col, parent_col]).to_pandas()
    parent_of: dict = {}
    for c, p in zip(ed[child_col], ed[parent_col]):
        parent_of.setdefault(c, []).append(p)
    parent_of = {c: tuple(ps) for c, ps in parent_of.items()}
    parent_ref = ray.put(parent_of)

    contrib = counts.map_batches(
        _AncestorExpander,
        fn_constructor_args=(parent_ref, concept_col, count_col),
        batch_format="pyarrow", batch_size=4096,
        concurrency=_pool())

    return coarse_aggregate(
        contrib, [concept_col],
        lambda df: df.groupby(concept_col, sort=False)[count_col]
        .sum().rename("total").reset_index())


# ---------------------------------------------------------------------------
# Basic-graph-pattern matching (the SPARQL-core query capability over
# the triple store this engine materializes)
# ---------------------------------------------------------------------------

def _pattern_scan(triples: Dataset, pattern: tuple[str, str, str], *,
                  s_col: str, p_col: str, o_col: str) -> tuple[Dataset, list[str]]:
    """One triple pattern → a Dataset whose columns are the pattern's
    variables (leading ``?``), with constant positions pushed down as
    vectorized equality filters and repeated variables enforced as
    intra-row equality. Pure streaming projection of the triple scan."""
    terms = list(zip(pattern, (s_col, p_col, o_col)))
    out_vars: list[str] = []
    seen: dict[str, str] = {}          # var -> first source column
    for term, col in terms:
        if term.startswith("?") and term not in seen:
            seen[term] = col
            out_vars.append(term[1:])

    def _scan(batch: pa.Table) -> pa.Table:
        mask = np.ones(len(batch), dtype=bool)
        for term, col in terms:
            if not term.startswith("?"):
                mask &= pc.equal(batch[col], term).to_numpy(
                    zero_copy_only=False)
            elif seen[term] != col:    # repeated variable: ?x p ?x
                mask &= pc.equal(batch[seen[term]],
                                 batch[col]).to_numpy(zero_copy_only=False)
        kept = batch.filter(pa.array(mask))
        return pa.table({v: kept[seen["?" + v]] for v in out_vars})

    ds = triples.select_columns([s_col, p_col, o_col]).map_batches(
        _scan, batch_format="pyarrow", batch_size=None)
    return ds, out_vars


def match_bgp(triples: Dataset, patterns: list[tuple[str, str, str]], *,
              optional_patterns: list[tuple[str, str, str]] | None = None,
              minus_patterns: list[tuple[str, str, str]] | None = None,
              s_col: str = "subj", p_col: str = "pred",
              o_col: str = "obj", num_partitions: int = 8) -> Dataset:
    """Match a basic graph pattern (conjunction of triple patterns with
    shared variables) against a (subj, pred, obj) Dataset — SPARQL's
    core SELECT over the KG this engine builds. Terms starting with
    ``?`` are variables; everything else is a constant pushed down as a
    filter. Returns one column per distinct variable, one row per
    binding (bag semantics, like SPARQL without DISTINCT).
    ``optional_patterns`` are SPARQL OPTIONAL clauses: each joins
    left-outer after the required patterns, so non-matching bindings
    survive with null for the optional-only variables (each optional
    pattern extends the REQUIRED solution independently, like a chain
    of single-pattern OPTIONAL blocks). ``minus_patterns`` are SPARQL
    MINUS / FILTER NOT EXISTS clauses: bindings whose shared variables
    match the pattern are REMOVED (hash anti-join on the shared vars;
    applied after the required joins, before OPTIONAL).

    Plan shape: each pattern is an independent filtered PROJECTION of
    the triple scan (constants prune early, so selective patterns ship
    only their bindings); patterns then combine left-to-right with
    hash-partitioned joins on the shared variables. Patterns that share
    no variable with the accumulated prefix are rejected — a cross
    product at 10¹²-triple scale is always a query bug. Partitioning
    assumption: joins key on variable bindings (entity URIs), so a
    production run benefits from triples pre-partitioned by subj hash
    for subject-chained patterns; Ray repartitions otherwise.

    Every join output is sanitized before the next join (Ray 2.49
    zero-row hash-join partitions are schema-less; NOTES_r2).
    """
    if not patterns:
        raise ValueError("match_bgp needs at least one pattern")
    optional_patterns = optional_patterns or []
    minus_patterns = minus_patterns or []
    all_vars: list[str] = []
    for pat in list(patterns) + list(optional_patterns):
        for term in pat:
            if term.startswith("?") and term[1:] not in all_vars:
                all_vars.append(term[1:])

    def _empty() -> Dataset:
        return ray.data.from_arrow(pa.table(
            {v: pa.array([], pa.string()) for v in all_vars}))

    acc, acc_vars = _pattern_scan(triples, patterns[0],
                                  s_col=s_col, p_col=p_col, o_col=o_col)
    if len(patterns) > 1 or optional_patterns or minus_patterns:
        # selective pattern scans emit zero-row blocks, and zero-row
        # blocks in a JOIN INPUT poison the hash-shuffle aggregator
        # (a partition fed only empties builds schema-less; NOTES_r2)
        # — sanitize rebuilds from the non-empty block refs.
        acc = _sanitize_join_output(
            acc, pa.schema([(v, pa.string()) for v in acc_vars]))
    for pat in patterns[1:]:
        nxt, nxt_vars = _pattern_scan(triples, pat,
                                      s_col=s_col, p_col=p_col, o_col=o_col)
        shared = [v for v in nxt_vars if v in acc_vars]
        if not shared:
            raise ValueError(
                f"pattern {pat} shares no variable with the prefix "
                f"{acc_vars} — cross products are not supported")
        nxt = _sanitize_join_output(
            nxt, pa.schema([(v, pa.string()) for v in nxt_vars]))
        # Ray 2.49: an EMPTY side poisons the hash-join exchange — and
        # an empty prefix makes the whole BGP empty anyway. Both sides
        # are ALWAYS sanitize-materialized (concrete block refs) by
        # this point, so count() is a metadata read, not a plan
        # re-execution — keep that invariant when editing this loop.
        if acc.count() == 0 or nxt.count() == 0:
            return _empty()
        joined = acc.join(nxt, join_type="inner",
                          num_partitions=num_partitions,
                          on=tuple(shared), right_on=tuple(shared))
        acc_vars = acc_vars + [v for v in nxt_vars if v not in acc_vars]
        acc = _sanitize_join_output(
            joined, pa.schema([(v, pa.string()) for v in acc_vars]))

    for pat in minus_patterns:
        nxt, nxt_vars = _pattern_scan(triples, pat,
                                      s_col=s_col, p_col=p_col, o_col=o_col)
        shared = [v for v in nxt_vars if v in acc_vars]
        if not shared:
            raise ValueError(
                f"minus pattern {pat} shares no variable with the "
                f"prefix {acc_vars} — it would remove everything or "
                f"nothing")
        # anti-join needs only the shared-variable projection of the
        # minus pattern, deduped (a binding is removed if ANY match
        # exists — multiplicity must not multiply the left side)
        nxt = _sanitize_join_output(
            coarse_aggregate(
                nxt.map_batches(
                    lambda b, cols=tuple(shared): pa.table(
                        {c: b[c] for c in cols}),
                    batch_format="pyarrow", batch_size=None),
                list(shared),
                lambda df: df.drop_duplicates()),
            pa.schema([(v, pa.string()) for v in shared]))
        if acc.count() == 0:
            return _empty()
        if nxt.count() == 0:
            continue          # nothing to subtract
        acc = _sanitize_join_output(
            acc.join(nxt, join_type="left_anti",
                     num_partitions=num_partitions,
                     on=tuple(shared), right_on=tuple(shared)),
            pa.schema([(v, pa.string()) for v in acc_vars]))

    for pat in optional_patterns:
        nxt, nxt_vars = _pattern_scan(triples, pat,
                                      s_col=s_col, p_col=p_col, o_col=o_col)
        shared = [v for v in nxt_vars if v in acc_vars]
        new_vars = [v for v in nxt_vars if v not in acc_vars]
        if not shared:
            raise ValueError(
                f"optional pattern {pat} shares no variable with the "
                f"prefix {acc_vars} — cross products are not supported")
        if acc.count() == 0:
            return _empty()
        nxt = _sanitize_join_output(
            nxt, pa.schema([(v, pa.string()) for v in nxt_vars]))
        acc_vars = acc_vars + new_vars
        if nxt.count() == 0:
            # OPTIONAL with no candidates: every binding survives with
            # nulls (also dodges Ray 2.49's empty-side join poisoning)
            def _pad(batch: pa.Table,
                     cols: tuple[str, ...] = tuple(new_vars)) -> pa.Table:
                for v in cols:
                    batch = batch.append_column(
                        v, pa.nulls(batch.num_rows, pa.string()))
                return batch

            # sanitize-materialize so the next clause's emptiness
            # check / join never re-executes this pad map (count()
            # must stay a metadata read — see the required loop)
            acc = _sanitize_join_output(
                acc.map_batches(_pad, batch_format="pyarrow",
                                batch_size=None),
                pa.schema([(v, pa.string()) for v in acc_vars]))
            continue
        joined = acc.join(nxt, join_type="left_outer",
                          num_partitions=num_partitions,
                          on=tuple(shared), right_on=tuple(shared))
        acc = _sanitize_join_output(
            joined, pa.schema([(v, pa.string()) for v in acc_vars]))
    return acc


# ---------------------------------------------------------------------------
# RDFS-lite subclass type inference (materialized entailment)
# ---------------------------------------------------------------------------

def infer_types(typed: Dataset, subclass_edges: Dataset, *,
                entity_col: str = "entity", class_col: str = "cls",
                child_col: str = "child", parent_col: str = "parent",
                max_depth: int = 64) -> Dataset:
    """Materialize the RDFS subclass entailment: every (entity, C)
    assertion also types the entity with every ancestor of C in the
    subclass DAG → distinct (entity, cls) rows including the asserted
    class itself. This is the KG-side dual of the flagship's
    ancestor-closure expansion (SURVEY §2: reference consumes
    precomputed ancestors, `omop2obo/utils/ontology_utils.py`).

    Scale shape: the class hierarchy is ontology-sized dimension data →
    ancestor closure is built once on the driver (BFS, cycle-safe) and
    broadcast; the corpus-sized ``typed`` stream flat-maps each
    assertion to its ancestor chain inside ``map_batches`` and a coarse
    keyed aggregate dedups (entity, cls) — multiple asserted classes
    with overlapping ancestors collapse to one row, so downstream
    counts are closure-UNION exact. No corpus-sized driver state.
    """
    ed = subclass_edges.select_columns([child_col, parent_col]).to_pandas()
    parents: dict = {}
    for c, p in zip(ed[child_col], ed[parent_col]):
        if c != p:
            parents.setdefault(c, set()).add(p)
    closure: dict[str, tuple] = {}
    for start in parents:
        seen = {start}
        frontier = [start]
        for _ in range(max_depth):
            nxt = []
            for node in frontier:
                for p in parents.get(node, ()):
                    if p not in seen:
                        seen.add(p)
                        nxt.append(p)
            if not nxt:
                break
            frontier = nxt
        seen.discard(start)
        closure[start] = tuple(sorted(seen))
    closure_ref = ray.put(closure)

    def _expand(df: pd.DataFrame) -> pd.DataFrame:
        cl = ray.get(closure_ref)
        ents, clss = [], []
        for e, c in zip(df[entity_col], df[class_col]):
            ents.append(e)
            clss.append(c)
            for a in cl.get(c, ()):
                ents.append(e)
                clss.append(a)
        return pd.DataFrame({entity_col: ents, class_col: clss})

    expanded = typed.select_columns([entity_col, class_col]).map_batches(
        _expand, batch_format="pandas", batch_size=None)
    return coarse_aggregate(
        expanded, [entity_col, class_col],
        lambda df: df.drop_duplicates([entity_col, class_col]))


def property_path(triples: Dataset, pred: str, seeds: list[str], *,
                  s_col: str = "subj", p_col: str = "pred",
                  o_col: str = "obj", max_hops: int = 16) -> Dataset:
    """SPARQL property-path ``seed pred* ?x`` — every node reachable
    from the seed set via 0..``max_hops`` directed ``pred`` edges →
    (node, hops) with hops = MINIMUM path length (seeds at 0; for the
    one-or-more ``pred+`` form, filter ``hops >= 1`` downstream — a
    cycle back onto a seed keeps hops 0 under min-hop semantics, the
    rule the SQL oracle shares).

    Plan: one filter-projection of the triple scan (constant predicate
    pruned early, only (src, dst) bindings leave the scan) feeding the
    frontier-parallel :func:`bfs_hops` (directed) — per round one hash
    join + one coarse distinct; driver holds the seed list only.
    """
    def _edges(batch: pa.Table) -> pa.Table:
        mask = pc.equal(batch[p_col], pred)
        kept = batch.filter(mask)
        return pa.table({"src": kept[s_col], "dst": kept[o_col]})

    edges = triples.select_columns([s_col, p_col, o_col]).map_batches(
        _edges, batch_format="pyarrow", batch_size=None)
    return bfs_hops(edges, seeds, max_hops=max_hops, directed=True)


def ego_subgraph(triples: Dataset, seeds: list[str], *, hops: int = 2,
                 s_col: str = "subj", p_col: str = "pred",
                 o_col: str = "obj", directed: bool = False,
                 num_partitions: int = 8) -> Dataset:
    """k-hop neighborhood extraction (SPARQL DESCRIBE-style): the
    triples whose SUBJECT lies within ``hops`` hops of the seed set —
    the standard way to pull an entity's local graph out of a
    10¹²-triple store without touching the rest.

    Plan: frontier BFS over the (subj, obj) projection finds the
    reachable node set as a DATASET (never a driver set — a 2-hop
    ball around a hub is corpus-sized), then ONE hash semi-join keeps
    the triples rooted at reachable subjects. ``directed=False``
    walks edges both ways (an entity's description includes triples
    pointing AT it via their subjects).
    """
    edges = triples.select_columns([s_col, p_col, o_col]).map_batches(
        lambda b: pa.table({"src": b[s_col], "dst": b[o_col]}),
        batch_format="pyarrow", batch_size=None)
    reach = bfs_hops(edges, seeds, max_hops=hops, directed=directed,
                     num_partitions=num_partitions)
    nodes = _sanitize_join_output(
        reach.map_batches(lambda b: pa.table({"__node": b["node"]}),
                          batch_format="pyarrow", batch_size=None),
        pa.schema([("__node", pa.string())]))
    src = _sanitize_join_output(
        triples.select_columns([s_col, p_col, o_col]).materialize(),
        pa.schema([(s_col, pa.string()), (p_col, pa.string()),
                   (o_col, pa.string())]))
    if nodes.count() == 0 or src.count() == 0:
        return ray.data.from_arrow(pa.table({
            s_col: pa.array([], pa.string()),
            p_col: pa.array([], pa.string()),
            o_col: pa.array([], pa.string())}))
    return _sanitize_join_output(
        src.join(nodes, join_type="inner",
                 num_partitions=num_partitions,
                 on=(s_col,), right_on=("__node",)),
        pa.schema([(s_col, pa.string()), (p_col, pa.string()),
                   (o_col, pa.string())]))


def construct(triples: Dataset, patterns: list[tuple[str, str, str]],
              template: list[tuple[str, str, str]], *,
              optional_patterns: list[tuple[str, str, str]] | None = None,
              minus_patterns: list[tuple[str, str, str]] | None = None,
              s_col: str = "subj", p_col: str = "pred",
              o_col: str = "obj", num_partitions: int = 8) -> Dataset:
    """SPARQL CONSTRUCT: match a BGP, then emit NEW triples from each
    binding via ``template`` patterns (terms starting ``?`` substitute
    the bound variable; other terms are constants) — the graph-to-graph
    rewrite that materializes derived relations (e.g. flattening a
    reified shape, minting inverse edges) without leaving the engine.

    Plan: :func:`match_bgp` produces the binding stream; one streaming
    projection fans each binding out to ``len(template)`` triples.
    Bag semantics (duplicate derivations emit duplicate triples — run
    the result through a coarse dedup for set semantics, which SPARQL
    CONSTRUCT formally has; left un-deduped here so the caller pays
    the exchange only when needed).
    """
    bindings = match_bgp(triples, patterns,
                         optional_patterns=optional_patterns,
                         minus_patterns=minus_patterns,
                         s_col=s_col, p_col=p_col, o_col=o_col,
                         num_partitions=num_partitions)
    bound = set(bindings.schema().names)
    for pat in template:
        for term in pat:
            if term.startswith("?") and term[1:] not in bound:
                raise ValueError(
                    f"template term {term} is not bound by the BGP "
                    f"(bound: {sorted(bound)})")

    def _emit(batch: pa.Table) -> pa.Table:
        outs = {s_col: [], p_col: [], o_col: []}
        for ts, tp, to in template:
            used = [t[1:] for t in (ts, tp, to) if t.startswith("?")]
            kept = batch
            for v in used:
                # SPARQL: template triples with an UNBOUND variable
                # (null from OPTIONAL) are skipped, not emitted as null
                kept = kept.filter(pc.is_valid(kept[v]))
            n = kept.num_rows
            for col, term in ((s_col, ts), (p_col, tp), (o_col, to)):
                if term.startswith("?"):
                    arr = kept[term[1:]]
                    outs[col].append(arr.combine_chunks()
                                     if isinstance(arr, pa.ChunkedArray)
                                     else arr)
                else:
                    outs[col].append(pa.array([term] * n, pa.string()))
        return pa.table({c: pa.concat_arrays(
            [a.combine_chunks() if isinstance(a, pa.ChunkedArray) else a
             for a in arrs]) for c, arrs in outs.items()})

    return bindings.map_batches(_emit, batch_format="pyarrow",
                                batch_size=None)


def kg_void_stats(triples: Dataset, *, s_col: str = "subj",
                  p_col: str = "pred", o_col: str = "obj") -> Dataset:
    """VoID-style dataset descriptor: per predicate → (pred, n_triples,
    n_subj, n_obj) with EXACT distinct counts — the summary a published
    knowledge graph ships alongside its dumps (and the profile a 100 TB
    build wants per partition before publishing).

    Scale shape: triple counts are per-block partials summed in a
    coarse aggregate; the distinct subject/object counts first dedup
    (pred, subj) / (pred, obj) in-cluster via coarse aggregates — the
    only corpus-sized exchanges, keyed by the pair hash — then count
    per predicate. Only the final PREDICATE-cardinality tables (schema
    vocabulary, dimension-sized by construction) touch the driver for
    the three-way merge.
    """
    def _count(batch: pa.Table) -> pa.Table:
        df = pd.DataFrame({"pred": batch[p_col].to_pandas()})
        g = df.groupby("pred", sort=False).size().rename("n").reset_index()
        return pa.Table.from_pandas(g, preserve_index=False)

    n_triples = coarse_aggregate(
        triples.select_columns([p_col]).map_batches(
            _count, batch_format="pyarrow", batch_size=None),
        ["pred"],
        lambda df: df.groupby("pred", sort=False)
        .agg(n=("n", "sum")).reset_index())

    def _distinct_count(col: str, alias: str) -> Dataset:
        pairs = triples.select_columns([p_col, col]).map_batches(
            lambda b, c=col: pa.table({"pred": b[p_col], "v": b[c]}),
            batch_format="pyarrow", batch_size=None)
        dd = coarse_aggregate(pairs, ["pred", "v"],
                              lambda df: df.drop_duplicates())
        return coarse_aggregate(
            dd.select_columns(["pred"]).map_batches(
                _count, batch_format="pyarrow", batch_size=None),
            ["pred"],
            lambda df, a=alias: df.groupby("pred", sort=False)
            .agg(**{a: ("n", "sum")}).reset_index())

    nt = n_triples.to_pandas()          # ≤ |predicate vocabulary| rows
    ns = _distinct_count(s_col, "n_subj").to_pandas()
    no = _distinct_count(o_col, "n_obj").to_pandas()
    out = nt.merge(ns, on="pred").merge(no, on="pred")
    out = out.astype({"n": "int64", "n_subj": "int64", "n_obj": "int64"})
    return ray.data.from_pandas(
        out.rename(columns={"n": "n_triples"}))


def validate_shapes(triples: Dataset,
                    shapes: list[tuple[str, str, str, int, int]], *,
                    s_col: str = "subj", p_col: str = "pred") -> Dataset:
    """SHACL-lite cardinality validation: each shape is
    ``(shape_id, target_pred, constraint_pred, min_count, max_count)``
    — every subject that HAS a ``target_pred`` triple must carry
    between min and max ``constraint_pred`` triples; violators are
    emitted as (subj, shape_id, n_found). The KG-quality gate a
    production build runs before publishing a release.

    Scale shape: the shape list is schema-sized (broadcast in the
    closure); triples are pre-filtered to the predicates any shape
    touches, then ONE coarse exchange keyed on subject computes the
    per-subject predicate counts and applies every shape vectorized
    inside the coarse frame. No joins, no driver state beyond the
    shape list.
    """
    preds = sorted({p for _, t, c, _, _ in shapes for p in (t, c)})

    def _slim(batch: pa.Table) -> pa.Table:
        mask = pc.is_in(batch[p_col], value_set=pa.array(preds))
        kept = batch.filter(mask)
        return pa.table({"subj": kept[s_col], "pred": kept[p_col]})

    slim = triples.select_columns([s_col, p_col]).map_batches(
        _slim, batch_format="pyarrow", batch_size=None)

    def _check(df: pd.DataFrame) -> pd.DataFrame:
        counts = (df.groupby(["subj", "pred"], sort=False).size()
                  .unstack(fill_value=0))
        outs = []
        for shape_id, target, constraint, lo, hi in shapes:
            if target not in counts.columns:
                continue
            tgt = counts[counts[target] > 0]
            n = (tgt[constraint] if constraint in tgt.columns
                 else pd.Series(0, index=tgt.index))
            bad = tgt[(n < lo) | (n > hi)]
            if len(bad):
                outs.append(pd.DataFrame({
                    "subj": bad.index.to_numpy(),
                    "shape_id": shape_id,
                    "n_found": n.loc[bad.index].to_numpy()
                    .astype(np.int64)}))
        if not outs:
            return pd.DataFrame({
                "subj": pd.Series([], dtype=object),
                "shape_id": pd.Series([], dtype=object),
                "n_found": pd.Series([], dtype=np.int64)})
        return pd.concat(outs, ignore_index=True)

    # one coarse exchange on subj: every row of a subject lands in one
    # coarse group, so the per-subject pivot inside is complete
    return coarse_aggregate(slim, ["subj"], _check)


def anchor_text_edges(pages: Dataset, url_col: str = "url",
                      html_col: str = "html") -> Dataset:
    """(src, dst, anchor_text) — :func:`anchor_edges` plus the link
    TEXT, the classic alias/mention signal web-scale entity linking
    mines (anchor text is evidence for what the target page IS).
    Same streaming per-page parse; text normalized like
    ``extract_text`` (inner tags stripped, entities unescaped,
    whitespace collapsed)."""
    from omop2obo_ray.functions.html import extract_anchor_texts

    def _edges(batch: pa.Table) -> pa.Table:
        srcs, dsts, txts = [], [], []
        for u, h in zip(batch[url_col].to_pylist(),
                        batch[html_col].to_pylist()):
            for dst, txt in extract_anchor_texts(h):
                srcs.append(u)
                dsts.append(dst)
                txts.append(txt)
        return pa.table({"src": pa.array(srcs, pa.string()),
                         "dst": pa.array(dsts, pa.string()),
                         "anchor_text": pa.array(txts, pa.string())})

    return pages.select_columns([url_col, html_col]).map_batches(
        _edges, batch_format="pyarrow", batch_size=None)


def alias_table(edges: Dataset, *, text_col: str = "anchor_text",
                dst_col: str = "dst", min_count: int = 1,
                lowercase: bool = True,
                n_coarse: int | None = None) -> Dataset:
    """Mention→entity prior from anchor-text evidence →
    (mention, dst, n, total, p): for every normalized link text, how
    often it points at each target and the resulting conditional
    prior p = n / total — the CrossWikis / Wikipedia
    anchor-dictionary artifact that seeds web-scale entity linking
    (the reference's surface→concept lexicon is the ontology-side
    analogue of exactly this table; ``clinical_concept_annotator.py``
    builds its surface map the same count-and-rank way). ``total``
    counts ALL of a mention's evidence (including pairs later cut by
    ``min_count``), so priors stay calibrated after the cut.

    Scale shape: per-block (mention, dst) partial counts (vectorized
    pandas groupby — the combiner-first shape) → ONE mention-keyed
    coarse exchange whose frame folds partials, computes the
    mention total in-frame (the key co-locates every target of a
    mention) and derives p with one IEEE division. A head mention
    ("click here") concentrates its DISTINCT targets in one frame —
    bounded by targets-per-mention, not corpus size; empty mentions
    drop up front."""
    from omop2obo_ray.functions.shuffle import coarse_aggregate
    from omop2obo_ray.pipelines.textpipe import _sanitize_join_output

    def _partial(df: pd.DataFrame) -> pd.DataFrame:
        m = df[text_col].astype(str)
        if lowercase:
            m = m.str.lower()
        m = m.str.strip()
        out = pd.DataFrame({"mention": m, "dst": df[dst_col]})
        out = out[out["mention"] != ""]
        return (out.groupby(["mention", "dst"], sort=False)
                .size().rename("n").reset_index())

    def _fold(df: pd.DataFrame) -> pd.DataFrame:
        g = (df.groupby(["mention", "dst"], sort=False)["n"].sum()
             .reset_index())
        g["total"] = g.groupby("mention", sort=False)["n"].transform(
            "sum")
        g = g[g["n"] >= min_count]
        g["p"] = g["n"] / g["total"].astype(np.float64)
        return g

    parts = edges.map_batches(_partial, batch_format="pandas",
                              batch_size=None)
    return _sanitize_join_output(
        coarse_aggregate(parts, ["mention"], _fold, n_coarse=n_coarse),
        pa.schema([("mention", pa.string()), ("dst", pa.string()),
                   ("n", pa.int64()), ("total", pa.int64()),
                   ("p", pa.float64())]))


# ---------------------------------------------------------------------------
# SPARQL solution modifiers + aggregates over BGP bindings
# ---------------------------------------------------------------------------

_FILTER_OPS = {
    "==": lambda c, v: c == v,
    "!=": lambda c, v: c != v,
    "<": lambda c, v: c < v,
    "<=": lambda c, v: c <= v,
    ">": lambda c, v: c > v,
    ">=": lambda c, v: c >= v,
}


def bgp_select(triples: Dataset, patterns: list[tuple[str, str, str]], *,
               filters: list[tuple[str, str, str]] | None = None,
               distinct: bool = False,
               order_by: list[str] | None = None,
               descending: bool = False,
               limit: int | None = None,
               **bgp_kw) -> Dataset:
    """SPARQL SELECT with solution modifiers over a BGP: FILTER →
    DISTINCT → ORDER BY → LIMIT, applied in the spec's order
    (SPARQL 1.1 §18.2.4-5) to the bag of bindings from
    :func:`match_bgp`.

    - ``filters``: ``(var, op, literal)`` comparisons evaluated
      vectorized per batch (string codepoint ordering, the same
      collation DuckDB/SQL applies to VARCHAR — bindings here are
      term strings). A filter never shuffles: it prunes the binding
      stream where it flows.
    - ``distinct``: keyed dedup via ONE coarse exchange over all
      projected variables (binding cardinality is unbounded — per-group
      Ray overhead would dominate a ``groupby().map_groups``).
    - ``order_by`` + ``limit``: Ray's distributed sort (sample-ranged,
      all-to-all) then a streaming take. At 10¹²-binding scale, prefer
      a LIMIT without ORDER BY (pure streaming truncation) or a
      bounded ``order_by`` after aggressive filters; a global total
      sort of the full binding bag is the one genuinely all-to-all
      step here, and it only runs when the caller asks for it.
      Callers wanting a DETERMINISTIC limit must order by a total key
      (ties at the cut are otherwise scheduler-dependent).
    """
    sols = match_bgp(triples, patterns, **bgp_kw)
    if filters:
        unknown = [op for _v, op, _l in filters if op not in _FILTER_OPS]
        if unknown:
            raise ValueError(f"unsupported filter op(s) {unknown}")

        def _filt(df: pd.DataFrame) -> pd.DataFrame:
            mask = np.ones(len(df), dtype=bool)
            for var, op, lit in filters:
                mask &= _FILTER_OPS[op](df[var], lit).to_numpy(dtype=bool)
            return df[mask]

        sols = sols.map_batches(_filt, batch_format="pandas",
                                batch_size=None)
    if distinct:
        cols = list(_pa_schema_of(sols).names)
        sols = coarse_aggregate(sols, cols,
                                lambda df: df.drop_duplicates())
    if order_by:
        # filters/dedup can leave zero-row blocks; sort needs a typed
        # stream (NOTES_r2) — sanitize rebuilds from non-empty refs
        sols = _sanitize_join_output(sols, _pa_schema_of(sols))
        sols = sols.sort(order_by, descending=descending)
    if limit is not None:
        sols = sols.limit(limit)
    return sols


def bgp_aggregate(triples: Dataset, patterns: list[tuple[str, str, str]],
                  group_vars: list[str], *, agg_var: str | None = None,
                  aggs: tuple[str, ...] = ("count",),
                  **bgp_kw) -> Dataset:
    """SPARQL GROUP BY aggregates over BGP solutions —
    ``SELECT ?g (COUNT(?x) AS n) … GROUP BY ?g`` for the KG this
    engine materializes. Supported ``aggs``: ``count`` (→ ``n``),
    ``count_distinct`` (→ ``n_distinct``), ``min`` (→ ``min_v``),
    ``max`` (→ ``max_v``) of ``agg_var``.

    Scale shape: the binding bag flows straight from the BGP joins
    into ONE coarse exchange keyed on ``group_vars``
    (``coarse_aggregate`` — group cardinality is unbounded), with all
    aggregates computed in a single vectorized pandas groupby per
    coarse bucket. ``count_distinct`` requires co-locating each
    group's values, which the single keyed exchange already does;
    plain counts piggyback on it rather than paying a second partial
    pass over an already-shuffled stream."""
    need_var = [a for a in aggs if a != "count"]
    if need_var and agg_var is None:
        raise ValueError(f"aggs {need_var} need agg_var")
    bad = [a for a in aggs if a not in
           ("count", "count_distinct", "min", "max")]
    if bad:
        raise ValueError(f"unsupported agg(s) {bad}")
    sols = match_bgp(triples, patterns, **bgp_kw)
    keep = list(group_vars) + ([agg_var] if agg_var else [])
    sols = sols.map_batches(lambda df: df[keep], batch_format="pandas",
                            batch_size=None)

    def _agg(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby(list(group_vars), sort=False)
        out = g.size().rename("_n").reset_index()
        if "count" in aggs:
            out["n"] = out.pop("_n").astype(np.int64)
        else:
            out.pop("_n")
        if "count_distinct" in aggs:
            out["n_distinct"] = g[agg_var].nunique().to_numpy(np.int64)
        if "min" in aggs:
            out["min_v"] = g[agg_var].min().to_numpy()
        if "max" in aggs:
            out["max_v"] = g[agg_var].max().to_numpy()
        return out

    return coarse_aggregate(sols, list(group_vars), _agg)


def label_propagation(edges: Dataset, iterations: int = 5, *,
                      undirected: bool = True,
                      n_coarse: int | None = None) -> Dataset:
    """Synchronous label-propagation community detection → (node,
    label): every round each node adopts the MOST FREQUENT label among
    its neighbors, ties broken to the smallest label (Raghavan'07 with
    the random order replaced by a deterministic tie-break — same
    input ⇒ same output; the price is possible 2-cycles on bipartite
    structures, which the fixed iteration count makes harmless).
    Labels start as own node id; isolated/no-in-neighbor nodes keep
    their current label.

    Scale shape per round: ONE ``coarse_join`` (current labels onto
    the edge list keyed src — the native join's per-plan aggregator
    pool would tax every round, NOTES_r3) + ONE coarse aggregate keyed
    dst computing each node's label mode vectorized. Keep-own-label
    rows ride the same aggregate as weight-0 markers (pagerank's
    zero-marker trick), so there is no final outer join and no nodes
    pass per round. The symmetrized edge list is materialized ONCE and
    reused every round. No driver state at any scale."""
    from omop2obo_ray.functions.shuffle import coarse_join

    if n_coarse is None:
        cpus = (int(ray.cluster_resources().get("CPU", 8))
                if ray.is_initialized() else 8)
        n_coarse = max(32, 3 * cpus)
    ntype = _pa_schema_of(edges).field("src").type

    def _sym(b: pa.Table) -> pa.Table:
        return pa.table({
            "src": pa.concat_arrays([b["src"].combine_chunks(),
                                     b["dst"].combine_chunks()]),
            "dst": pa.concat_arrays([b["dst"].combine_chunks(),
                                     b["src"].combine_chunks()])})

    e = edges.select_columns(["src", "dst"])
    if undirected:
        e = e.map_batches(_sym, batch_format="pyarrow", batch_size=None)
    e = _sanitize_join_output(
        e, pa.schema([("src", ntype), ("dst", ntype)])).materialize()

    labels = _sanitize_join_output(
        _distinct_nodes(e).map_batches(
            lambda b: pa.table({"node": b["node"], "label": b["node"]}),
            batch_format="pyarrow", batch_size=None),
        pa.schema([("node", ntype), ("label", ntype)]))

    def _nbr(b: pa.Table) -> pa.Table:  # neighbor votes, weight 1
        return pa.table({"node": b["dst"], "label": b["label"],
                         "w": pa.array(np.ones(b.num_rows, np.int64))})

    def _own(b: pa.Table) -> pa.Table:  # keep-own zero-weight markers
        return pa.table({"node": b["node"], "label": b["label"],
                         "w": pa.array(np.zeros(b.num_rows, np.int64))})

    def _mode(df: pd.DataFrame) -> pd.DataFrame:
        c = (df.groupby(["node", "label"], sort=False)["w"].sum()
             .reset_index())
        c = c.sort_values(["node", "w", "label"],
                          ascending=[True, False, True],
                          kind="mergesort")
        return c.drop_duplicates("node", keep="first")[["node", "label"]]

    for _ in range(iterations):
        votes = coarse_join(e, labels, on="src", right_on="node",
                            how="inner", n_coarse=n_coarse)
        stream = votes.map_batches(
            _nbr, batch_format="pyarrow", batch_size=None,
        ).union(labels.map_batches(_own, batch_format="pyarrow",
                                   batch_size=None))
        labels = _sanitize_join_output(
            coarse_aggregate(stream, ["node"], _mode, n_coarse=n_coarse),
            pa.schema([("node", ntype), ("label", ntype)]))
    return labels


def triple_vote(triples: Dataset, *, s_col: str = "subj",
                p_col: str = "pred", o_col: str = "obj",
                src_col: str = "source",
                n_coarse: int | None = None) -> Dataset:
    """Source-vote knowledge fusion over conflicting extractions →
    one row per distinct (subj, pred, obj): (n_sources, n_total,
    confidence, is_majority): n_sources = distinct sources asserting
    the triple, n_total = the (subj, pred) group's total vote mass
    (Σ of per-object n_sources — a source asserting two objects
    votes twice, once each), confidence = n_sources/n_total (vote
    shares sum to 1 per (subj, pred)), and is_majority marks the
    plurality object (ties → lexicographically smallest —
    deterministic). The
    vote baseline of the truth-finding literature (Dong 2009's
    starting point) applied to multi-source web extraction before
    triples enter the KG.

    Scale shape: per-block (s, p, o, source) dedup → ONE
    (s, p, o)-keyed distinct-source count → ONE (s, p)-keyed fold
    attaching the group total and the majority flag in-frame (a
    (subj, pred) group is bounded by its object fan-out — the
    window contract). Counts exact; confidence is one division —
    gate exact."""
    from omop2obo_ray.functions.shuffle import coarse_aggregate
    from omop2obo_ray.pipelines.textpipe import _sanitize_join_output

    quad = triples.map_batches(
        lambda df: df[[s_col, p_col, o_col, src_col]]
        .drop_duplicates(),
        batch_format="pandas", batch_size=None)

    cnt = _sanitize_join_output(
        coarse_aggregate(
            quad, [s_col, p_col, o_col],
            lambda df: df.groupby([s_col, p_col, o_col],
                                  sort=False)[src_col]
            .nunique().rename("n_sources").reset_index(),
            n_coarse=n_coarse),
        pa.schema([(s_col, pa.string()), (p_col, pa.string()),
                   (o_col, pa.string()),
                   ("n_sources", pa.int64())]))

    def _fold(df: pd.DataFrame) -> pd.DataFrame:
        out = []
        for _, g in df.groupby([s_col, p_col], sort=False):
            tot = int(g["n_sources"].sum())
            g = g.sort_values(["n_sources", o_col],
                              ascending=[False, True],
                              kind="mergesort")
            o = g.copy(deep=False)
            o["n_total"] = tot
            o["confidence"] = g["n_sources"].to_numpy(
                np.float64) / tot
            flag = np.zeros(len(g), np.int64)
            flag[0] = 1
            o["is_majority"] = flag
            out.append(o)
        return pd.concat(out) if out else df

    return _sanitize_join_output(
        coarse_aggregate(cnt, [s_col, p_col], _fold,
                         n_coarse=n_coarse),
        pa.schema([(s_col, pa.string()), (p_col, pa.string()),
                   (o_col, pa.string()), ("n_sources", pa.int64()),
                   ("n_total", pa.int64()),
                   ("confidence", pa.float64()),
                   ("is_majority", pa.int64())]))


def label_spreading(edges: Dataset, seeds: Dataset,
                    iterations: int = 5, *, undirected: bool = True,
                    node_col: str = "node", label_col: str = "label",
                    n_coarse: int | None = None) -> Dataset:
    """Seeded semi-supervised label spreading (KG entity typing /
    spam-label diffusion) → (node, label, is_seed) for every node
    reached within ``iterations`` hops of a seed: each round every
    labeled-neighborhood node adopts the MOST FREQUENT label among
    its labeled neighbors (ties → lexicographically smallest), seeds
    stay CLAMPED to their given label, and nodes with no labeled
    neighbor keep their current label. The supervised sibling of
    :func:`label_propagation` (which self-seeds every node with its
    own id).

    Scale shape: identical to label_propagation — per round ONE
    ``coarse_join`` (labels onto the symmetrized edge list,
    materialized once) + ONE node-keyed coarse mode fold. Seed
    clamping costs NO extra join: seed rows ride the same vote
    stream with a weight (2⁴⁰) no neighborhood count can reach. The
    final is_seed flag is one left-outer join."""
    from omop2obo_ray.functions.shuffle import coarse_join

    if n_coarse is None:
        cpus = (int(ray.cluster_resources().get("CPU", 8))
                if ray.is_initialized() else 8)
        n_coarse = max(32, 3 * cpus)
    ntype = _pa_schema_of(edges).field("src").type
    CLAMP = np.int64(1) << 40

    def _sym(b: pa.Table) -> pa.Table:
        return pa.table({
            "src": pa.concat_arrays([b["src"].combine_chunks(),
                                     b["dst"].combine_chunks()]),
            "dst": pa.concat_arrays([b["dst"].combine_chunks(),
                                     b["src"].combine_chunks()])})

    e = edges.select_columns(["src", "dst"])
    if undirected:
        e = e.map_batches(_sym, batch_format="pyarrow",
                          batch_size=None)
    e = _sanitize_join_output(
        e, pa.schema([("src", ntype), ("dst", ntype)])).materialize()

    seed_schema = pa.schema([("node", ntype),
                             ("label", pa.string())])
    seed_t = _sanitize_join_output(
        seeds.map_batches(
            lambda b: pa.table({
                "node": b[node_col].combine_chunks().cast(ntype),
                "label": b[label_col].combine_chunks()
                .cast(pa.string())}),
            batch_format="pyarrow", batch_size=None),
        seed_schema).materialize()

    labels = seed_t

    def _nbr(b: pa.Table) -> pa.Table:
        return pa.table({"node": b["dst"], "label": b["label"],
                         "w": pa.array(np.ones(b.num_rows,
                                               np.int64))})

    def _own(b: pa.Table) -> pa.Table:
        return pa.table({"node": b["node"], "label": b["label"],
                         "w": pa.array(np.zeros(b.num_rows,
                                                np.int64))})

    def _clamp(b: pa.Table) -> pa.Table:
        return pa.table({"node": b["node"], "label": b["label"],
                         "w": pa.array(np.full(b.num_rows, CLAMP,
                                               np.int64))})

    def _mode(df: pd.DataFrame) -> pd.DataFrame:
        c = (df.groupby(["node", "label"], sort=False)["w"].sum()
             .reset_index())
        c = c.sort_values(["node", "w", "label"],
                          ascending=[True, False, True],
                          kind="mergesort")
        return c.drop_duplicates("node",
                                 keep="first")[["node", "label"]]

    for _ in range(iterations):
        votes = coarse_join(e, labels, on="src", right_on="node",
                            how="inner", n_coarse=n_coarse)
        stream = votes.map_batches(
            _nbr, batch_format="pyarrow", batch_size=None,
        ).union(labels.map_batches(_own, batch_format="pyarrow",
                                   batch_size=None)) \
            .union(seed_t.map_batches(_clamp,
                                      batch_format="pyarrow",
                                      batch_size=None))
        labels = _sanitize_join_output(
            coarse_aggregate(stream, ["node"], _mode,
                             n_coarse=n_coarse), seed_schema)

    flagged = coarse_join(labels, seed_t.map_batches(
        lambda b: pa.table({"n2": b["node"],
                            "sl": b["label"]}),
        batch_format="pyarrow", batch_size=None),
        on="node", right_on="n2", how="left_outer",
        n_coarse=n_coarse)
    return flagged.map_batches(
        lambda df: pd.DataFrame({
            "node": df["node"], "label": df["label"],
            "is_seed": df["sl"].notna().astype(np.int64)}),
        batch_format="pandas", batch_size=None)


def personalized_pagerank(edges: Dataset, seeds: list[str],
                          iterations: int = 3, damping: float = 0.85, *,
                          undirected: bool = False,
                          n_coarse: int | None = None) -> Dataset:
    """Personalized PageRank → (node, rank): teleport restricted to the
    ``seeds`` set (r₀(v) = 1[v∈S]/|S|; rₖ₊₁(v) = (1-d)·1[v∈S]/|S| +
    d·Σ_{(u,v)∈E} rₖ(u)/outdeg(u)) — the related-page / TrustRank
    ranking a crawl consumer runs around a trusted or topical seed
    set. Fixed-iteration, dangling mass leaks (same contract as
    ``pagerank`` so the SQL oracle can unroll the identical
    recurrence). ``undirected=True`` symmetrizes the edge list first.

    Scale shape: seeds are a QUERY-SIZED list (broadcast once via
    ``ray.put``, membership tested vectorized per batch — never a
    join); out-degree is attached in ONE exchange before the loop and
    the weighted edge table is materialized ONCE; each iteration is
    ONE ``coarse_join`` (ranks onto edges keyed src) + ONE coarse
    per-dst sum that also carries zero-weight marker rows for every
    node, so no final outer join and no driver state at any scale."""
    if not seeds:
        raise ValueError("personalized_pagerank: seeds must be non-empty")
    ntype = _pa_schema_of(edges).field("src").type
    base = (1.0 - damping) / len(seeds)
    seed_ref = ray.put(np.asarray(sorted(set(seeds)), dtype=object))

    e = edges.select_columns(["src", "dst"])
    if undirected:
        def _sym(b: pa.Table) -> pa.Table:
            return pa.table({
                "src": pa.concat_arrays([b["src"].combine_chunks(),
                                         b["dst"].combine_chunks()]),
                "dst": pa.concat_arrays([b["dst"].combine_chunks(),
                                         b["src"].combine_chunks()])})
        e = e.map_batches(_sym, batch_format="pyarrow", batch_size=None)
    e = _sanitize_join_output(
        e, pa.schema([("src", ntype), ("dst", ntype)]))

    from omop2obo_ray.functions.shuffle import coarse_join

    if n_coarse is None:
        cpus = (int(ray.cluster_resources().get("CPU", 8))
                if ray.is_initialized() else 8)
        n_coarse = max(32, 3 * cpus)

    # out-degree attached per src in one coarse exchange; w = 1/deg
    def _deg(df: pd.DataFrame) -> pd.DataFrame:
        out = df.copy(deep=False)
        out["w"] = 1.0 / df.groupby("src", sort=False)["dst"].transform(
            "size").to_numpy(np.float64)
        return out

    ed = _sanitize_join_output(
        coarse_aggregate(e, ["src"], _deg, n_coarse=n_coarse),
        pa.schema([("src", ntype), ("dst", ntype),
                   ("w", pa.float64())])).materialize()

    def _seed_rank(b: pa.Table, scale: float) -> pa.Table:
        nodes = b["node"].combine_chunks().to_numpy(zero_copy_only=False)
        ind = np.isin(nodes, ray.get(seed_ref))
        return pa.table({"node": b["node"],
                         "rank": pa.array(ind * scale, pa.float64())})

    nodes = _sanitize_join_output(
        _distinct_nodes(ed), pa.schema([("node", ntype)])).materialize()
    ranks = nodes.map_batches(
        functools.partial(_seed_rank, scale=1.0 / len(seeds)),
        batch_format="pyarrow", batch_size=None)

    rank_schema = pa.schema([("node", ntype), ("rank", pa.float64())])

    def _contrib(b: pa.Table) -> pa.Table:  # mass shipped along edges
        w = b["w"].combine_chunks().to_numpy(zero_copy_only=False)
        r = b["rank"].combine_chunks().to_numpy(zero_copy_only=False)
        return pa.table({"node": b["dst"],
                         "c": pa.array(w * r, pa.float64())})

    def _zero(b: pa.Table) -> pa.Table:  # keep-every-node markers
        return pa.table({"node": b["node"],
                         "c": pa.array(np.zeros(b.num_rows, np.float64))})

    def _sum_to_rank(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby("node", sort=False)["c"].sum().reset_index()
        ind = np.isin(g["node"].to_numpy(), ray.get(seed_ref))
        g["rank"] = ind * base + damping * g["c"].to_numpy(np.float64)
        return g[["node", "rank"]]

    for _ in range(iterations):
        j = coarse_join(ed, ranks, on="src", right_on="node",
                        how="inner", n_coarse=n_coarse)
        stream = j.map_batches(
            _contrib, batch_format="pyarrow", batch_size=None,
        ).union(nodes.map_batches(_zero, batch_format="pyarrow",
                                  batch_size=None))
        ranks = _sanitize_join_output(
            coarse_aggregate(stream, ["node"], _sum_to_rank,
                             n_coarse=n_coarse), rank_schema)
    return ranks


_BINDING_FILTER_OPS = {
    "==": pc.equal, "!=": pc.not_equal, "<": pc.less,
    "<=": pc.less_equal, ">": pc.greater, ">=": pc.greater_equal,
}


def filter_bindings(solutions: Dataset,
                    filters: list[tuple[str, str, str]]) -> Dataset:
    """SPARQL FILTER over a BGP solution set (the output of
    :func:`match_bgp` / :func:`match_bgp_union`): each filter is
    (var, op, value) with op ∈ {==, !=, <, <=, >, >=, regex,
    not_regex}; comparisons are term-string comparisons (SPARQL's
    codepoint order for plain literals) and regex is RE2 — the same
    engine DuckDB's `regexp_matches` uses, so oracles replay
    byte-for-byte. Filters AND together (one conjunctive FILTER
    clause). Rows whose var is unbound (null, from OPTIONAL) drop,
    matching SPARQL's error-on-unbound semantics.

    Vectorized per batch — no exchange; composes with any solution
    stream since FILTER is row-local."""
    for var, op, _ in filters:
        if op not in _BINDING_FILTER_OPS and op not in ("regex",
                                                        "not_regex"):
            raise ValueError(f"filter_bindings: unknown op {op!r}")

    def _apply(b: pa.Table) -> pa.Table:
        keep = None
        for var, op, val in filters:
            col = b[var].combine_chunks()
            if op == "regex":
                m = pc.match_substring_regex(col, val)
            elif op == "not_regex":
                m = pc.invert(pc.match_substring_regex(col, val))
            else:
                m = _BINDING_FILTER_OPS[op](col, val)
            m = pc.and_kleene(m, pc.is_valid(col))
            keep = m if keep is None else pc.and_kleene(keep, m)
        if keep is None:
            return b
        return b.filter(pc.fill_null(keep, False))

    return solutions.map_batches(_apply, batch_format="pyarrow",
                                 batch_size=None)


def match_bgp_union(triples: Dataset,
                    branches: list[list[tuple[str, str, str]]], *,
                    s_col: str = "subj", p_col: str = "pred",
                    o_col: str = "obj",
                    num_partitions: int = 8) -> Dataset:
    """SPARQL UNION: alternation of basic graph patterns. Each branch
    is a pattern list evaluated by :func:`match_bgp` independently;
    solutions concatenate with BAG semantics (SPARQL UNION without
    DISTINCT). The output has one column per variable appearing in ANY
    branch (first-appearance order); a variable unbound in a branch is
    null there — SPARQL's unbound-variable padding.

    Scale shape: each branch is an independent streaming BGP plan; the
    union is a block-list concatenation with NO exchange, so the cost
    is exactly the sum of the branch plans.
    """
    if not branches:
        raise ValueError("match_bgp_union needs at least one branch")
    all_vars: list[str] = []
    for patterns in branches:
        for pat in patterns:
            for term in pat:
                if term.startswith("?") and term[1:] not in all_vars:
                    all_vars.append(term[1:])

    out: Dataset | None = None
    for patterns in branches:
        branch_vars = []
        for pat in patterns:
            for term in pat:
                if term.startswith("?") and term[1:] not in branch_vars:
                    branch_vars.append(term[1:])
        missing = tuple(v for v in all_vars if v not in branch_vars)
        sol = match_bgp(triples, patterns, s_col=s_col, p_col=p_col,
                        o_col=o_col, num_partitions=num_partitions)

        def _pad(batch: pa.Table, miss: tuple[str, ...] = missing,
                 order: tuple[str, ...] = tuple(all_vars)) -> pa.Table:
            for v in miss:
                batch = batch.append_column(
                    v, pa.nulls(batch.num_rows, pa.string()))
            return batch.select(list(order))

        sol = sol.map_batches(_pad, batch_format="pyarrow",
                              batch_size=None)
        out = sol if out is None else out.union(sol)
    return out


def random_walks(edges: Dataset, *, walk_len: int, walks_per_node: int = 1,
                 src: str = "src", dst: str = "dst", seed: int = 17,
                 n_coarse: int | None = None,
                 rank_bits: int = 20, index: str = "auto",
                 stage_dir: str | None = None) -> Dataset:
    """Deterministic DeepWalk-style random-walk corpus over an
    INTEGER-id graph — the sequence generator feeding node2vec /
    DeepWalk KG-embedding training (Perozzi'14). Emits one row per
    visited position: ``(start, w, step, node)`` for steps
    ``0..walk_len`` of walk ``w ∈ [0, walks_per_node)`` from every
    node with outgoing edges; a walk reaching a sink node (no
    out-edges) simply stops early.

    Determinism (and hence resumability + an exact SQL oracle): the
    step-t choice is the neighbor whose per-source rank (0-based, dst
    ascending) equals ``H % out_degree(cur)`` with the arithmetic hash
    ``H = (start·100003 + w·2971 + cur·30011 + t·1009 + seed) %
    1_000_000_007`` — pure int64, no RNG state, reproducible across
    runs and expressible in SQL (ROW_NUMBER + the same modular form).
    Node ids must be int64 (dictionary-encode string URIs upstream) and
    multi-edges should be deduped by the caller if unwanted — ranks
    are assigned over the edge list as given.

    Scale shape: ONE coarse exchange builds the neighbor-rank table
    (per-source cumcount) + one slim join attaches the destination's
    out-degree; then ONE ``coarse_join`` per step keyed on the packed
    ``cur·2^rank_bits + want_rank`` (requires out_degree < 2^rank_bits
    — raise ``rank_bits`` for hub-heavier graphs; checked). Frontier
    state is walk-count-bounded, never node²; each step's frontier is
    sanitize-materialized so no step replays its predecessors.
    """
    from omop2obo_ray.functions.shuffle import coarse_join
    from omop2obo_ray.pipelines.textpipe import _sanitize_join_output

    if walk_len < 1:
        raise ValueError("walk_len must be >= 1")
    if index == "auto":
        # short walks amortize nothing; long walks pay the neighbor
        # re-ship per step (measured sf0.1/32cpu: walk_len=8 52 s
        # exchange vs 28 s disk, identical output)
        index = "disk" if walk_len > 4 else "exchange"
    if n_coarse is None:
        # iterative-op fan-out: 3×CPU buckets (24×CPU nearly doubles
        # multi-round walls — NOTES_r3 measurement, same as pagerank)
        cpus = (int(ray.cluster_resources().get("CPU", 8))
                if ray.is_initialized() else 8)
        n_coarse = max(32, 3 * cpus)
    cap = np.int64(1) << np.int64(rank_bits)

    def _slim(b: pa.Table) -> pa.Table:
        return pa.table({
            "src": b[src].combine_chunks().cast(pa.int64()),
            "dst": b[dst].combine_chunks().cast(pa.int64())})

    e = edges.map_batches(_slim, batch_format="pyarrow", batch_size=None)

    # neighbor-rank table: rank = 0-based position of dst in ascending
    # order per src (ONE coarse exchange; whole src groups land in one
    # frame, so cumcount is exact)
    def _rank(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(["src", "dst"], kind="mergesort")
        g = df.groupby("src", sort=False)
        df["rank"] = g.cumcount().astype(np.int64)
        df["deg_src"] = g["dst"].transform("size").astype(np.int64)
        if len(df) and int(df["deg_src"].max()) >= int(cap):
            raise ValueError(
                f"out-degree >= 2^{rank_bits}; raise rank_bits")
        return df

    nbr = coarse_aggregate(e, ["src"], _rank, n_coarse=n_coarse)
    nbr = _sanitize_join_output(nbr, pa.schema(
        [("src", pa.int64()), ("dst", pa.int64()),
         ("rank", pa.int64()), ("deg_src", pa.int64())]))

    # distinct (node, deg) — for walk starts and for attaching the
    # destination's degree to each neighbor row
    def _deg(df: pd.DataFrame) -> pd.DataFrame:
        return df[["src", "deg_src"]].drop_duplicates().rename(
            columns={"src": "node", "deg_src": "deg"})

    deg = coarse_aggregate(nbr.select_columns(["src", "deg_src"]),
                           ["src"], _deg, n_coarse=n_coarse)
    deg = _sanitize_join_output(deg, pa.schema(
        [("node", pa.int64()), ("deg", pa.int64())]))

    # attach deg(dst) (sinks -> 0) and pack the per-step join key
    nbr2 = coarse_join(nbr.select_columns(["src", "dst", "rank"]), deg,
                       on="dst", right_on="node", how="left_outer",
                       n_coarse=n_coarse)

    def _pack(b: pa.Table) -> pa.Table:
        s = b["src"].combine_chunks().to_numpy(zero_copy_only=False)
        r = b["rank"].combine_chunks().to_numpy(zero_copy_only=False)
        d = b["deg"].combine_chunks().to_numpy(zero_copy_only=False)
        d = np.nan_to_num(d.astype(np.float64), nan=0.0).astype(np.int64)
        return pa.table({
            "_jk": pa.array(s * int(cap) + r, pa.int64()),
            "nxt": b["dst"].combine_chunks().cast(pa.int64()),
            "deg_nxt": pa.array(d, pa.int64())})

    nbr2 = _sanitize_join_output(
        nbr2.map_batches(_pack, batch_format="pyarrow", batch_size=None),
        pa.schema([("_jk", pa.int64()), ("nxt", pa.int64()),
                   ("deg_nxt", pa.int64())]))

    # index="disk": STATIONARY neighbor index — the scale path for
    # long walks (DeepWalk uses walk_len 40-80). The exchange mode
    # ships the whole neighbor table through the join exchange EVERY
    # step; here it spills per-bucket parquet ONCE (the
    # disk_bucket_apply pattern proven on the resumable sink), and
    # each step moves ONLY the frontier: probe rows route to their
    # bucket with one keyed exchange and the per-bucket UDF merges
    # against the bucket's file (OS page cache absorbs re-reads; on a
    # cluster stage_dir must be shared storage, same contract as the
    # sink).
    by_bucket: dict[int, list[str]] = {}
    if index == "disk":
        import glob
        import os
        import shutil
        import tempfile

        import pyarrow.parquet as pq

        stage = stage_dir or tempfile.mkdtemp(prefix="rw_idx_")
        shutil.rmtree(stage, ignore_errors=True)
        os.makedirs(stage, exist_ok=True)

        class _Spill:
            def __init__(self):
                self.seq = 0

            def __call__(self, b: pa.Table) -> pa.Table:
                jk = b["_jk"].combine_chunks().to_numpy(
                    zero_copy_only=False)
                bk = (jk % np.int64(n_coarse)).astype(np.int64)
                for v in np.unique(bk):
                    self.seq += 1
                    pq.write_table(
                        b.filter(pa.array(bk == v)),
                        os.path.join(stage,
                                     f"{int(v)}-{os.getpid()}-{self.seq}"
                                     ".parquet"))
                return pa.table({"rows": pa.array([b.num_rows],
                                                  pa.int64())})

        cpus = (int(ray.cluster_resources().get("CPU", 8))
                if ray.is_initialized() else 8)
        nbr2.map_batches(_Spill, batch_format="pyarrow",
                         batch_size=None,
                         concurrency=(1, cpus)).count()
        for f in glob.glob(os.path.join(stage, "*.parquet")):
            bkt = int(os.path.basename(f).split("-", 1)[0])
            by_bucket.setdefault(bkt, []).append(f)

    def _disk_step(probe: Dataset) -> Dataset:
        import pyarrow.parquet as pq

        files = by_bucket

        def _route(b: pa.Table) -> pa.Table:
            jk = b["_jk"].combine_chunks().to_numpy(zero_copy_only=False)
            return b.append_column(
                "_b", pa.array((jk % np.int64(n_coarse)).astype(np.int64)))

        def _probe_join(df: pd.DataFrame) -> pd.DataFrame:
            bkt = int(df["_b"].iloc[0])
            fl = files.get(bkt)
            if not fl:
                return pd.DataFrame({
                    "start": pd.Series([], dtype=np.int64),
                    "w": pd.Series([], dtype=np.int64),
                    "nxt": pd.Series([], dtype=np.int64),
                    "deg_nxt": pd.Series([], dtype=np.int64)})
            idx = pa.concat_tables([pq.read_table(f) for f in fl]
                                   ).to_pandas()
            out = df.drop(columns=["_b"]).merge(idx, on="_jk",
                                                how="inner")
            return out[["start", "w", "nxt", "deg_nxt"]]

        return (probe.map_batches(_route, batch_format="pyarrow",
                                  batch_size=None)
                .groupby("_b").map_groups(_probe_join,
                                          batch_format="pandas"))

    # step-0 frontier: every node with out-edges × walks_per_node
    def _starts(b: pa.Table) -> pa.Table:
        node = b["node"].combine_chunks().to_numpy(zero_copy_only=False)
        dg = b["deg"].combine_chunks().to_numpy(zero_copy_only=False)
        n = len(node)
        return pa.table({
            "start": pa.array(np.repeat(node, walks_per_node), pa.int64()),
            "w": pa.array(np.tile(np.arange(walks_per_node, dtype=np.int64),
                                  n), pa.int64()),
            "cur": pa.array(np.repeat(node, walks_per_node), pa.int64()),
            "deg_cur": pa.array(np.repeat(dg, walks_per_node), pa.int64())})

    frontier_schema = pa.schema(
        [("start", pa.int64()), ("w", pa.int64()),
         ("cur", pa.int64()), ("deg_cur", pa.int64())])
    frontier = _sanitize_join_output(
        deg.map_batches(_starts, batch_format="pyarrow", batch_size=None),
        frontier_schema)

    def _emit(step: int):
        def fn(b: pa.Table) -> pa.Table:
            return pa.table({
                "start": b["start"], "w": b["w"],
                "step": pa.array(
                    np.full(b.num_rows, step, np.int64), pa.int64()),
                "node": b["cur"]})
        return fn

    outs = [frontier.map_batches(_emit(0), batch_format="pyarrow",
                                 batch_size=None)]
    for step in range(1, walk_len + 1):
        def _want(b: pa.Table, t: int = step) -> pa.Table:
            st = b["start"].combine_chunks().to_numpy(zero_copy_only=False)
            w = b["w"].combine_chunks().to_numpy(zero_copy_only=False)
            cur = b["cur"].combine_chunks().to_numpy(zero_copy_only=False)
            dg = b["deg_cur"].combine_chunks().to_numpy(zero_copy_only=False)
            live = dg > 0
            h = (st * np.int64(100003) + w * np.int64(2971)
                 + cur * np.int64(30011) + np.int64(t) * np.int64(1009)
                 + np.int64(seed)) % np.int64(1_000_000_007)
            want = np.where(live, h % np.where(live, dg, 1), 0)
            jk = cur * int(cap) + want
            return pa.table({
                "_jk": pa.array(jk[live], pa.int64()),
                "start": pa.array(st[live], pa.int64()),
                "w": pa.array(w[live], pa.int64())})

        probe = frontier.map_batches(_want, batch_format="pyarrow",
                                     batch_size=None)
        if index == "disk":
            stepped = _disk_step(probe)
        else:
            stepped = coarse_join(probe, nbr2, on="_jk", how="inner",
                                  n_coarse=n_coarse)

        def _advance(b: pa.Table) -> pa.Table:
            return pa.table({
                "start": b["start"], "w": b["w"],
                "cur": b["nxt"].combine_chunks().cast(pa.int64()),
                "deg_cur": b["deg_nxt"].combine_chunks().cast(pa.int64())})

        frontier = _sanitize_join_output(
            stepped.map_batches(_advance, batch_format="pyarrow",
                                batch_size=None), frontier_schema)
        if frontier.count() == 0:
            break
        outs.append(frontier.map_batches(_emit(step),
                                         batch_format="pyarrow",
                                         batch_size=None))

    out = outs[0]
    for o in outs[1:]:
        out = out.union(o)
    return out


def sssp(edges: Dataset, seeds, *, src: str = "src",
         dst: str = "dst", weight: str = "w", max_rounds: int = 16,
         seed_col: str = "node",
         n_coarse: int | None = None) -> Dataset:
    """Weighted single-source(-set) shortest paths — frontier
    Bellman-Ford. Returns ``(node, dist)`` for every node reachable
    from ``seeds`` (seeds at 0); weights must be non-negative.
    ``seeds`` is either a small driver list of node ids OR a Dataset
    with a ``seed_col`` column — the Dataset form keeps an unbounded
    seed set (e.g. every in-degree-0 node of a web-shaped DAG) off
    the driver entirely: it is deduped in one coarse exchange and
    becomes the distance-0 table directly.
    Stops early when a round improves nothing, or after ``max_rounds``
    (Bellman-Ford's round-k table = exact distances using ≤ k edges,
    so a fixed ``max_rounds`` is a well-defined operator in itself —
    the SQL gate unrolls exactly that recurrence).

    Scale shape: per round ONE ``coarse_join`` ships the frontier onto
    its out-edges (frontier-sized, not graph-sized: only nodes whose
    distance IMPROVED last round relax again — equivalent to full
    relaxation, since an unimproved node's candidates were already
    folded in the round it last improved) and ONE coarse min-aggregate
    folds candidates into the running table, tagging improvements in
    the same frame — no separate compare join, no driver state. The
    distance table is sanitize-materialized per round so no round
    replays its predecessors.
    """
    from omop2obo_ray.functions.shuffle import coarse_join
    from omop2obo_ray.pipelines.textpipe import _sanitize_join_output

    if n_coarse is None:
        cpus = (int(ray.cluster_resources().get("CPU", 8))
                if ray.is_initialized() else 8)
        n_coarse = max(32, 3 * cpus)

    def _slim(b: pa.Table) -> pa.Table:
        return pa.table({
            "src": b[src].combine_chunks().cast(pa.int64()),
            "dst": b[dst].combine_chunks().cast(pa.int64()),
            "w": b[weight].combine_chunks().cast(pa.int64())})

    e = edges.map_batches(_slim, batch_format="pyarrow",
                          batch_size=None).materialize()

    dist_schema = pa.schema([("node", pa.int64()), ("dist", pa.int64())])
    if isinstance(seeds, Dataset):
        # distributed seed set: dedupe in ONE coarse exchange (a dup
        # seed row would make the fold's old-dist index non-unique)
        # and attach distance 0 in-map — nothing seed-sized ever
        # lands on the driver
        dist = _sanitize_join_output(
            coarse_aggregate(
                seeds.map_batches(
                    lambda b, c=seed_col: pa.table({
                        "node": b[c].combine_chunks().cast(pa.int64())}),
                    batch_format="pyarrow", batch_size=None),
                ["node"], lambda df: df.drop_duplicates(),
                n_coarse=n_coarse),
            pa.schema([("node", pa.int64())])).map_batches(
            lambda b: pa.table({
                "node": b["node"],
                "dist": pa.array(np.zeros(b.num_rows, np.int64))}),
            batch_format="pyarrow", batch_size=None).materialize()
    else:
        seed_tbl = pa.table({
            "node": pa.array(sorted({int(s) for s in seeds}), pa.int64()),
            "dist": pa.array([0] * len({int(s) for s in seeds}), pa.int64())})
        dist = ray.data.from_arrow(seed_tbl)
    frontier = dist

    for _round in range(max_rounds):
        probe = frontier.map_batches(
            lambda b: pa.table({"cur": b["node"], "d": b["dist"]}),
            batch_format="pyarrow", batch_size=None)
        relaxed = coarse_join(probe, e, on="cur", right_on="src",
                              how="inner", n_coarse=n_coarse)

        def _cand(b: pa.Table) -> pa.Table:
            d = b["d"].combine_chunks().to_numpy(zero_copy_only=False)
            w = b["w"].combine_chunks().to_numpy(zero_copy_only=False)
            return pa.table({
                "node": b["dst"].combine_chunks().cast(pa.int64()),
                "dist": pa.array(d + w, pa.int64()),
                "_old": pa.array(np.zeros(b.num_rows, np.int8))})

        cand = relaxed.map_batches(_cand, batch_format="pyarrow",
                                   batch_size=None)
        tagged = dist.map_batches(
            lambda b: pa.table({
                "node": b["node"], "dist": b["dist"],
                "_old": pa.array(np.ones(b.num_rows, np.int8))}),
            batch_format="pyarrow", batch_size=None)

        # ONE exchange: fold candidates into the table AND tag
        # improvements inside the same per-node frame
        def _fold(df: pd.DataFrame) -> pd.DataFrame:
            g = df.groupby("node", sort=False)
            newmin = g["dist"].min()
            old = df[df["_old"] == 1].set_index("node")["dist"]
            out = newmin.reset_index()
            oldv = out["node"].map(old)
            out["improved"] = (oldv.isna()
                               | (out["dist"] < oldv)).astype(np.int8)
            return out

        folded = _sanitize_join_output(
            coarse_aggregate(cand.union(tagged), ["node"], _fold,
                             n_coarse=n_coarse),
            pa.schema([("node", pa.int64()), ("dist", pa.int64()),
                       ("improved", pa.int8())]))
        frontier = _sanitize_join_output(
            folded.filter(expr="improved == 1").select_columns(
                ["node", "dist"]), dist_schema)
        dist = _sanitize_join_output(
            folded.select_columns(["node", "dist"]), dist_schema)
        if frontier.count() == 0:
            break
    return dist


def neighborhood_function(edges: Dataset, max_t: int = 3, *,
                          mode: str = "hll", hll_bits: int = 8,
                          directed: bool = False,
                          n_coarse: int | None = None) -> Dataset:
    """HyperBall-style neighborhood function → one row per (node, t),
    t = 0..``max_t``: the size of the ball B(node, t) = # nodes
    reachable from ``node`` in ≤ t hops. The per-radius ball sizes are
    the raw material for effective-diameter estimation, closeness /
    harmonic centrality and crawl-reachability audits over the web
    graph (Boldi & Vigna, "HyperANF / HyperBall" — the canonical
    trillion-edge formulation of exactly this recurrence).

    Recurrence (both modes): each node carries a fixed-width register
    blob summarizing its reachable set; round t replaces it with the
    MERGE of its own blob and all in-neighbors' blobs, which is exactly
    ball(t) because merge is idempotent/associative/commutative:

    - ``mode="hll"`` (the scale path): blobs are HyperLogLog registers
      (2^``hll_bits`` bytes/node, 256 B at the default) and the merge
      is element-wise max → output (node, t, ball_est: float64) with
      the standard bias-corrected estimate + linear-counting
      small-range correction. Memory is FIXED per node — 10¹¹ nodes ×
      256 B = 25.6 TB spread across the cluster's object store, the
      published HyperANF operating point; relative error ≈
      1.04/√2^hll_bits (6.5% at 8 bits).
    - ``mode="exact"``: blobs are dense bitsets (ceil(V/8) bytes/node)
      and the merge is bitwise OR → (node, t, ball: int64), exact.
      Requires the distinct node list on the driver for dense index
      assignment (the ONLY driver state in this operator, documented
      bound: V ≤ ~10⁶ — gate fixtures, ontology DAGs, host graphs).
      The SQL gate runs this mode; HLL accuracy is pytest-gated
      against it.

    Scale shape, per round: ONE coarse-bucket join (blobs onto edges,
    keyed src — `coarse_join`, task-based, no per-plan actor pool) +
    ONE coarse per-dst reduce, with a BLOCK-LOCAL combiner before the
    exchange so a hub dst (10⁹ in-links) ships one partial blob per
    block, never its edge rows. Both exchanges key on node id — a
    deployment co-partitions edges by hash(node) once and reuses it
    every round (same contract as pagerank). Registers are monotone,
    so all ``max_t`` rounds run unconditionally (a converged round
    reships stable blobs — harmless; early-exit would need a
    convergence aggregate per round, not worth one extra plan at
    fixture scale). Per-key blob reduce is `np.maximum.reduceat` /
    `np.bitwise_or.reduceat` over one stacked uint8 matrix — no
    per-row Python in the hot path (the tobytes() re-pack is per
    DISTINCT key, same order as the groupby itself).

    Unreachable-node semantics: every node appears at every t (it can
    at least reach itself), matching the bounded-hop recursive-CTE
    oracle row-for-row."""
    if mode not in ("hll", "exact"):
        raise ValueError(f"neighborhood_function: unknown mode {mode!r}")
    cpus = int(ray.cluster_resources().get("CPU", 8)) if ray.is_initialized() else 8
    nc = n_coarse or max(32, 3 * cpus)
    m = 1 << hll_bits

    e = edges.select_columns(["src", "dst"])
    if not directed:
        e = e.union(e.map_batches(
            lambda b: pa.table({"src": b["dst"], "dst": b["src"]}),
            batch_format="pyarrow", batch_size=None))
    e = _sanitize_join_output(
        coarse_aggregate(e, ["src", "dst"],
                         lambda df: df.drop_duplicates(), n_coarse=nc),
        pa.schema([("src", pa.string()), ("dst", pa.string())])
    ).materialize()
    nodes = _distinct_nodes(e)

    if mode == "exact":
        node_list = sorted(r["node"] for r in nodes.take_all())
        width = max(1, (len(node_list) + 7) // 8)
        idx_ref = ray.put({n_: i for i, n_ in enumerate(node_list)})
        reduce_op = np.bitwise_or

        def _init(df: pd.DataFrame) -> pd.DataFrame:
            idx = ray.get(idx_ref)
            mat = np.zeros((len(df), width), np.uint8)
            pos = df["node"].map(idx).to_numpy(np.int64)
            mat[np.arange(len(df)), pos >> 3] = np.uint8(1) << (pos & 7).astype(np.uint8)
            return pd.DataFrame({"node": df["node"].to_numpy(),
                                 "regs": [r.tobytes() for r in mat]})

        _POP = np.unpackbits(np.arange(256, dtype=np.uint8)[:, None],
                             axis=1).sum(axis=1).astype(np.int64)

        def _count(b: pa.Table, t: int) -> pa.Table:
            blob = b"".join(b["regs"].combine_chunks().to_pylist())
            mat = np.frombuffer(blob, np.uint8).reshape(b.num_rows, width)
            return pa.table({
                "node": b["node"],
                "t": pa.array(np.full(b.num_rows, t, np.int64)),
                "ball": pa.array(_POP[mat].sum(axis=1))})

        out_schema = pa.schema([("node", pa.string()),
                                ("t", pa.int64()), ("ball", pa.int64())])
    else:
        width = m
        reduce_op = np.maximum
        if m >= 128:
            alpha = 0.7213 / (1 + 1.079 / m)
        else:
            alpha = {16: 0.673, 32: 0.697, 64: 0.709}.get(m, 0.7213 / (1 + 1.079 / m))

        def _init(df: pd.DataFrame) -> pd.DataFrame:
            # deterministic 64-bit hash (pandas siphash, fixed default
            # key): register index = low bits, rho = leading-zero count
            # of the remaining (64 - hll_bits)-bit word + 1
            h = pd.util.hash_pandas_object(df["node"],
                                           index=False).to_numpy()
            j = (h & np.uint64(m - 1)).astype(np.int64)
            w = h >> np.uint64(hll_bits)
            bl = np.zeros(len(w), np.uint8)  # bit_length(w), vectorized
            for s in (32, 16, 8, 4, 2, 1):
                big = (w >> np.uint64(s)) > 0
                bl[big] += s
                w[big] >>= np.uint64(s)
            bl += (w > 0).astype(np.uint8)
            rho = (np.uint8(64 - hll_bits + 1) - bl).astype(np.uint8)
            mat = np.zeros((len(df), m), np.uint8)
            mat[np.arange(len(df)), j] = rho
            return pd.DataFrame({"node": df["node"].to_numpy(),
                                 "regs": [r.tobytes() for r in mat]})

        def _count(b: pa.Table, t: int) -> pa.Table:
            blob = b"".join(b["regs"].combine_chunks().to_pylist())
            mat = np.frombuffer(blob, np.uint8).reshape(b.num_rows, m)
            est = alpha * m * m / np.power(2.0, -mat.astype(np.float64)).sum(axis=1)
            zeros = (mat == 0).sum(axis=1)
            small = (est <= 2.5 * m) & (zeros > 0)
            with np.errstate(divide="ignore"):
                lc = m * np.log(m / np.maximum(zeros, 1).astype(np.float64))
            est = np.where(small, lc, est)
            return pa.table({
                "node": b["node"],
                "t": pa.array(np.full(b.num_rows, t, np.int64)),
                "ball_est": pa.array(est, pa.float64())})

        out_schema = pa.schema([("node", pa.string()), ("t", pa.int64()),
                                ("ball_est", pa.float64())])

    regs_schema = pa.schema([("node", pa.string()), ("regs", pa.binary())])
    regs = _sanitize_join_output(
        coarse_aggregate(nodes, ["node"], _init, n_coarse=nc),
        regs_schema).materialize()

    def _reduce_frame(df: pd.DataFrame) -> pd.DataFrame:
        d = df.sort_values("node", kind="mergesort")
        keys = d["node"].to_numpy()
        mat = np.frombuffer(b"".join(d["regs"]),
                            np.uint8).reshape(len(d), width)
        starts = np.flatnonzero(np.r_[True, keys[1:] != keys[:-1]])
        red = reduce_op.reduceat(mat, starts, axis=0)
        return pd.DataFrame({"node": keys[starts],
                             "regs": [r.tobytes() for r in red]})

    # block-local combiner: partial-merge per dst inside each block
    # BEFORE the coarse exchange (hub-skew guard; exact because the
    # merge is idempotent/associative/commutative)
    def _partial(b: pa.Table) -> pa.Table:
        df = b.to_pandas()
        return pa.Table.from_pandas(_reduce_frame(df),
                                    preserve_index=False)

    from omop2obo_ray.functions.shuffle import coarse_join

    rounds = [regs.map_batches(functools.partial(_count, t=0),
                               batch_format="pyarrow", batch_size=None)]
    for t in range(1, max_t + 1):
        msgs = coarse_join(e, regs, on="src", right_on="node",
                           n_coarse=nc).map_batches(
            lambda b: pa.table({"node": b["dst"], "regs": b["regs"]}),
            batch_format="pyarrow", batch_size=None)
        both = msgs.union(regs).map_batches(
            _partial, batch_format="pyarrow", batch_size=None)
        regs = _sanitize_join_output(
            coarse_aggregate(both, ["node"], _reduce_frame,
                             n_coarse=nc),
            regs_schema).materialize()
        rounds.append(regs.map_batches(functools.partial(_count, t=t),
                                       batch_format="pyarrow",
                                       batch_size=None))
    return _sanitize_join_output(
        functools.reduce(lambda a, b_: a.union(b_), rounds), out_schema)


def dag_depth(edges: Dataset, *, src: str = "src", dst: str = "dst",
              max_rounds: int = 32,
              n_coarse: int | None = None) -> Dataset:
    """Longest-path depth of every DAG node from the root set →
    (node, depth): roots (in-degree 0) at 0, every other node at
    1 + max(parent depths) — the concept-DEPTH assignment over an
    ontology hierarchy (how deep a term sits under its OBO roots;
    the reference walks the same parent DAG per concept in its
    ancestor-closure expansion, `omop2obo/ontology_explorer.py`), and
    the level assignment for topological scheduling generally.

    Implementation is a two-liner by reduction: longest path from the
    roots = −(shortest path with every edge weighing −1), and
    Bellman-Ford's min-fold is weight-sign-agnostic on a DAG (no
    cycles ⇒ no negative cycles ⇒ convergence in ≤ depth rounds). So
    this delegates to `sssp` — frontier-only relaxation, ONE relax
    join + ONE min-fold exchange per round, early stop — inheriting
    its scale shape and its unrolled-recurrence gate semantics.
    Inputs MUST be acyclic (a cycle would relax forever; `max_rounds`
    is the guard) with int64 node ids.

    Root discovery is distributed (distinct srcs anti-join distinct
    dsts) and the root set seeds sssp AS A DATASET — on a web-shaped
    graph "in-degree-0 nodes" is an unbounded fraction of all nodes,
    so nothing root-sized ever materializes on the driver (the only
    driver scalar is the is-empty count guard on the materialized
    root set)."""
    from omop2obo_ray.functions.shuffle import coarse_aggregate

    e = edges.map_batches(
        lambda b, s=src, d=dst: pa.table({
            "src": b[s].combine_chunks().cast(pa.int64()),
            "dst": b[d].combine_chunks().cast(pa.int64()),
            "w": pa.array(np.full(b.num_rows, -1, np.int64))}),
        batch_format="pyarrow", batch_size=None).materialize()

    srcs = e.map_batches(lambda b: pa.table({"node": b["src"]}),
                         batch_format="pyarrow", batch_size=None)
    dsts = e.map_batches(
        lambda b: pa.table({"node": b["dst"],
                            "indeg": pa.array(np.ones(b.num_rows,
                                                      np.int8))}),
        batch_format="pyarrow", batch_size=None)

    def _roots(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby("node", sort=False)["indeg"].max().reset_index()
        return g[g["indeg"].isna() | (g["indeg"] < 1)][["node"]]

    from omop2obo_ray.pipelines.textpipe import _sanitize_join_output

    roots = _sanitize_join_output(
        coarse_aggregate(
            srcs.map_batches(
                lambda b: pa.table({
                    "node": b["node"],
                    "indeg": pa.nulls(b.num_rows, pa.int8())}),
                batch_format="pyarrow", batch_size=None).union(dsts),
            ["node"], _roots, n_coarse=n_coarse),
        pa.schema([("node", pa.int64())])).materialize()
    if roots.count() == 0:
        raise ValueError("dag_depth: no in-degree-0 roots — "
                         "input is cyclic or empty")

    dist = sssp(e, roots, max_rounds=max_rounds, n_coarse=n_coarse)
    return dist.map_batches(
        lambda b: pa.table({
            "node": b["node"],
            "depth": pc.negate(b["dist"].combine_chunks())}),
        batch_format="pyarrow", batch_size=None)


def _mis_priority(nodes: np.ndarray, r: int, seed: int) -> np.ndarray:
    """Round-r Luby priority — the pure int64 modular form shared
    verbatim with the SQL oracle (same family as random_walks' H)."""
    return (nodes * np.int64(30011) + np.int64(r) * np.int64(1009)
            + np.int64(seed)) % np.int64(1_000_000_007)


@ray.remote
def _mis_local_task(u: np.ndarray, v: np.ndarray, seed: int,
                    max_rounds: int, allow_partial: bool) -> pa.Table:
    """Single-task Luby replay — the endgame kernel behind
    ``maximal_independent_set``'s ``local_below``. The algorithm is
    fully deterministic (pinned modular priorities, lexicographic
    ties), so this replays the distributed rounds EXACTLY — integer
    identity, pinned by pytest vs ``local_below=0``."""
    from collections import defaultdict

    adj: dict = defaultdict(set)
    for a, b in zip(u.tolist(), v.tolist()):
        if a != b:
            adj[a].add(b)
            adj[b].add(a)
    live = set(adj)
    out_n: list[int] = []
    out_r: list[int] = []
    for r in range(max_rounds):
        if not live:
            break
        arr = np.fromiter(live, np.int64, len(live))
        pr = dict(zip(arr.tolist(),
                      _mis_priority(arr, r, seed).tolist()))
        sel = [x for x in live
               if all((pr[x], x) < (pr[w], w)
                      for w in adj[x] if w in live)]
        for x in sel:
            out_n.append(x)
            out_r.append(r)
        dead = set(sel)
        for x in sel:
            dead |= (adj[x] & live)
        live -= dead
    else:
        if live and not allow_partial:
            raise RuntimeError(
                "maximal_independent_set: live nodes remain after "
                f"max_rounds={max_rounds}")
    order = np.argsort(np.array(out_n, np.int64), kind="stable")
    return pa.table({
        "node": pa.array(np.array(out_n, np.int64)[order]
                         if out_n else [], pa.int64()),
        "sel_round": pa.array(np.array(out_r, np.int64)[order]
                              if out_r else [], pa.int64())})


def maximal_independent_set(edges: Dataset, *, src: str = "src",
                            dst: str = "dst", seed: int = 17,
                            max_rounds: int = 32,
                            allow_partial: bool = False,
                            n_coarse: int | None = None,
                            local_below: int = 65536) -> Dataset:
    """Luby's maximal independent set over an INTEGER-id undirected
    graph → (node, sel_round): no two selected nodes share an edge,
    and every unselected node has a selected neighbor. The classic
    symmetry-breaking primitive — one-per-cluster representative
    election over a near-duplicate pair graph, conflict-free
    task/color assignment, landmark selection — in O(log n) expected
    rounds (Luby'86).

    Round r (everything deterministic, so resumable and SQL-gateable):
    every live node v draws priority ``H(v, r)`` (pinned modular hash,
    :func:`_mis_priority` — computed in-map on BOTH sides of every
    edge, never joined or stored); v is selected iff
    ``(H(v,r), v) < (H(u,r), u)`` lexicographically for ALL live
    neighbors u (node id breaks hash ties exactly). Selected nodes and
    their neighbors then leave the live set. With ``max_rounds=k`` the
    result is the (deterministic) partial MIS after k rounds — the
    oracle unrolls the same k (pass ``allow_partial=True`` for that
    use); run with the default to completion for the true MIS (an
    exhaustion guard raises if rounds run out).

    Scale shape: the live edge list and live node set are Datasets
    end-to-end. Per round: ONE decision exchange keyed on node
    (neighbor rows carry ``(H(dst,r), dst)``; zero-marker rows keep
    isolated-in-the-live-subgraph nodes, exactly pagerank's
    marker-row trick — no node-side outer join), ONE semi-join to
    expand winners' neighborhoods, ONE anti-join shrinking the live
    node set and TWO semi-joins shrinking the live edge list — all
    coarse task-based exchanges (`coarse_join`; the native join's
    per-plan actor-pool cost dominates iterative ops, NOTES_r3). Each
    round's exchanges carry only live-subgraph mass, which Luby
    shrinks by a constant factor per round in expectation."""
    from omop2obo_ray.functions.shuffle import coarse_join

    if n_coarse is None:
        cpus = (int(ray.cluster_resources().get("CPU", 8))
                if ray.is_initialized() else 8)
        n_coarse = max(32, 3 * cpus)

    def _sym(b: pa.Table) -> pa.Table:
        u = b[src].combine_chunks().cast(pa.int64())
        v = b[dst].combine_chunks().cast(pa.int64())
        t = pa.table({"u": pa.concat_arrays([u, v]),
                      "v": pa.concat_arrays([v, u])})
        return t.filter(pc.not_equal(t["u"], t["v"]))

    live_e = _sanitize_join_output(coarse_aggregate(
        edges.map_batches(_sym, batch_format="pyarrow", batch_size=None),
        ["u", "v"], lambda df: df.drop_duplicates(),
        n_coarse=n_coarse),
        pa.schema([("u", pa.int64()), ("v", pa.int64())])).materialize()
    # endgame local-finish: the rounds are deterministic, so a
    # single-task replay is exact (metadata-gated; _sym doubled rows)
    ecount = live_e.count()
    if 0 < ecount <= 2 * local_below:
        et = pa.concat_tables(
            [t for t in live_e.iter_batches(batch_size=None,
                                            batch_format="pyarrow")])
        ref = _mis_local_task.remote(
            et["u"].to_numpy(zero_copy_only=False),
            et["v"].to_numpy(zero_copy_only=False),
            seed, max_rounds, allow_partial)
        return ray.data.from_arrow_refs([ref])

    live_n = _sanitize_join_output(coarse_aggregate(
        live_e.select_columns(["u"]), ["u"],
        lambda df: df.drop_duplicates().rename(columns={"u": "node"}),
        n_coarse=n_coarse),
        pa.schema([("node", pa.int64())])).materialize()

    won: list[Dataset] = []
    out_schema = pa.schema([("node", pa.int64()),
                            ("sel_round", pa.int64())])
    for r in range(max_rounds):
        if live_n.count() == 0:
            break

        def _nbr(b: pa.Table, r=r) -> pa.Table:
            d = b["v"].to_numpy(zero_copy_only=False)
            return pa.table({
                "node": b["u"],
                "nb_h": pa.array(_mis_priority(d, r, seed)),
                "nb": b["v"],
                "own": pa.array(np.zeros(b.num_rows, np.int8))})

        def _own(b: pa.Table) -> pa.Table:
            return pa.table({
                "node": b["node"],
                "nb_h": pa.nulls(b.num_rows, pa.int64()),
                "nb": pa.nulls(b.num_rows, pa.int64()),
                "own": pa.array(np.ones(b.num_rows, np.int8))})

        def _decide(df: pd.DataFrame, r=r) -> pd.DataFrame:
            nodes = df.loc[df["own"] == 1, "node"].to_numpy()
            if nodes.size == 0:
                return pd.DataFrame({"node": pd.Series([], dtype=np.int64)})
            nb = df[df["own"] == 0]
            if nb.empty:
                win = nodes
            else:
                best = (nb.sort_values(["nb_h", "nb"], kind="mergesort")
                        .groupby("node", sort=False)[["nb_h", "nb"]]
                        .first())
                mh = best["nb_h"].reindex(nodes).to_numpy(dtype=np.float64)
                mn = best["nb"].reindex(nodes).to_numpy(dtype=np.float64)
                hn = _mis_priority(nodes, r, seed).astype(np.float64)
                win = nodes[np.isnan(mh) | (hn < mh)
                            | ((hn == mh) & (nodes < mn))]
            return pd.DataFrame({"node": win.astype(np.int64)})

        nbr = live_e.map_batches(_nbr, batch_format="pyarrow",
                                 batch_size=None)
        mark = live_n.map_batches(_own, batch_format="pyarrow",
                                  batch_size=None)
        winners = _sanitize_join_output(
            coarse_aggregate(nbr.union(mark), ["node"], _decide,
                             n_coarse=n_coarse),
            pa.schema([("node", pa.int64())])).materialize()
        won.append(winners.map_batches(
            lambda b, r=r: b.append_column(
                "sel_round", pa.array(np.full(b.num_rows, r, np.int64))),
            batch_format="pyarrow", batch_size=None))

        # winners' neighborhoods die with them
        wn_edges = coarse_join(live_e, winners, on="u", right_on="node",
                               how="left_semi", n_coarse=n_coarse)
        dead = winners.union(
            wn_edges.map_batches(
                lambda b: pa.table({"node": b["v"]}),
                batch_format="pyarrow", batch_size=None))
        live_n = coarse_join(live_n, dead, on="node", how="left_anti",
                             n_coarse=n_coarse).materialize()
        live_e = coarse_join(
            coarse_join(live_e, live_n, on="u", right_on="node",
                        how="left_semi", n_coarse=n_coarse),
            live_n, on="v", right_on="node", how="left_semi",
            n_coarse=n_coarse).materialize()
    else:
        if not allow_partial and live_n.count() > 0:
            raise RuntimeError(
                f"maximal_independent_set: {live_n.count()} nodes still "
                f"live after max_rounds={max_rounds} — raise max_rounds")

    if not won:
        return ray.data.from_arrow(out_schema.empty_table())
    return _sanitize_join_output(
        functools.reduce(lambda a, b_: a.union(b_), won), out_schema)


def harmonic_centrality(edges: Dataset, max_t: int = 3, *,
                        mode: str = "exact", hll_bits: int = 8,
                        directed: bool = False,
                        n_coarse: int | None = None) -> Dataset:
    """Bounded-radius harmonic centrality → (node, harmonic):
    h(v) = Σ_{u ≠ v, d(v,u) ≤ max_t} 1/d(v,u) — Boldi & Vigna's
    recommended centrality for web-scale graphs (finite on
    disconnected graphs, unlike closeness; computed at HyperBall cost,
    which is exactly how their paper frames it).

    Derivation from the neighborhood function's ball sizes: nodes at
    distance EXACTLY t number c_t = ball(t) − ball(t−1), and
    h = Σ_{t=1..max_t} c_t / t, folded in ascending-t order — a fixed
    3-term IEEE evaluation both the engine and the SQL oracle perform
    identically, so the exact-mode gate needs no quantization.
    ``mode="hll"`` estimates h from HLL ball estimates at fixed
    per-node memory (the 10¹¹-node path; accuracy inherits HyperBall's
    1.04/√2^hll_bits).

    Cost = :func:`neighborhood_function` + ONE node-keyed coarse
    exchange for the per-node pivot/fold."""
    col = "ball" if mode == "exact" else "ball_est"
    nf = neighborhood_function(edges, max_t, mode=mode,
                               hll_bits=hll_bits, directed=directed,
                               n_coarse=n_coarse)

    def _fold(df: pd.DataFrame) -> pd.DataFrame:
        w = df.pivot(index="node", columns="t", values=col)
        h = np.zeros(len(w))
        prev = w[0].to_numpy(np.float64)
        for t in range(1, max_t + 1):
            cur = w[t].to_numpy(np.float64)
            h = h + (cur - prev) / float(t)
            prev = cur
        return pd.DataFrame({"node": w.index.to_numpy(), "harmonic": h})

    kt = _pa_schema_of(nf).field("node").type
    return _sanitize_join_output(
        coarse_aggregate(nf, ["node"], _fold, n_coarse=n_coarse),
        pa.schema([("node", kt), ("harmonic", pa.float64())]))


def closeness_centrality(edges: Dataset, max_t: int = 3, *,
                         mode: str = "exact", hll_bits: int = 8,
                         directed: bool = False,
                         n_coarse: int | None = None) -> Dataset:
    """Bounded-radius closeness centrality → (node, reached,
    closeness): c(v) = reached(v) / Σ_{u: d ≤ max_t} d(v,u) with
    reached(v) = |ball(v, max_t)| − 1 (Lin's index numerator
    convention restricted to the radius; 0.0 for isolated-within-
    radius nodes). Derived from the same HyperBall ball sizes as
    :func:`harmonic_centrality`: Σ d = Σ_t t·(ball(t) − ball(t−1)),
    a fixed ascending-t integer fold, then ONE IEEE division — the
    exact-mode gate needs no quantization. ``mode='hll'`` inherits
    HyperBall's accuracy at fixed per-node memory."""
    col = "ball" if mode == "exact" else "ball_est"
    nf = neighborhood_function(edges, max_t, mode=mode,
                               hll_bits=hll_bits, directed=directed,
                               n_coarse=n_coarse)

    def _fold(df: pd.DataFrame) -> pd.DataFrame:
        w = df.pivot(index="node", columns="t", values=col)
        tot = np.zeros(len(w))
        prev = w[0].to_numpy(np.float64)
        for t in range(1, max_t + 1):
            cur = w[t].to_numpy(np.float64)
            tot = tot + float(t) * (cur - prev)
            prev = cur
        reached = prev - w[0].to_numpy(np.float64)
        clo = np.where(tot > 0.0, reached / tot, 0.0)
        return pd.DataFrame({"node": w.index.to_numpy(),
                             "reached": reached.astype(np.int64)
                             if mode == "exact" else reached,
                             "closeness": clo})

    kt = _pa_schema_of(nf).field("node").type
    rt = pa.int64() if mode == "exact" else pa.float64()
    return _sanitize_join_output(
        coarse_aggregate(nf, ["node"], _fold, n_coarse=n_coarse),
        pa.schema([("node", kt), ("reached", rt),
                   ("closeness", pa.float64())]))


def effective_diameter(edges: Dataset, max_t: int = 3, *, q: float = 0.9,
                       mode: str = "exact", hll_bits: int = 8,
                       directed: bool = False,
                       n_coarse: int | None = None) -> Dataset:
    """Effective diameter (Leskovec/Palmer ANF convention) → one row
    (q, t_hi, eff_diameter): the interpolated hop count at which a
    ``q`` fraction of all reachable-within-``max_t`` pairs is reached.
    P(t) = Σ_node ball(node, t) from the neighborhood function;
    t_hi = first t with P(t) ≥ q·P(max_t); the answer interpolates
    linearly inside the last hop:
    d = (t_hi − 1) + (q·P(max_t) − P(t_hi−1)) / (P(t_hi) − P(t_hi−1)),
    or 0.0 when the self-balls alone already cover q.

    Cost on top of :func:`neighborhood_function`: one per-block
    partial sum keyed t (≤ max_t+1 rows per block) + one single-group
    fold — the finale touches max_t+1 numbers, never the graph. In
    exact mode every arithmetic step is a single-rounding IEEE op on
    exact integer sums, so the SQL oracle matches unquantized; HLL
    mode inherits HyperBall's error and is pytest-gated."""
    col = "ball" if mode == "exact" else "ball_est"
    nf = neighborhood_function(edges, max_t, mode=mode,
                               hll_bits=hll_bits, directed=directed,
                               n_coarse=n_coarse)

    def _part(df: pd.DataFrame) -> pd.DataFrame:
        return (df.groupby("t", sort=False)[col].sum()
                .rename("p").reset_index())

    part = nf.map_batches(_part, batch_format="pandas",
                          batch_size=None)

    def _fin(df: pd.DataFrame) -> pd.DataFrame:
        tot = df.groupby("t", sort=False)["p"].sum().sort_index()
        p = tot.to_numpy(np.float64)
        target = q * p[max_t]
        t_hi = int(np.argmax(p >= target))
        if t_hi == 0:
            d = 0.0
        else:
            d = float(t_hi - 1) + (target - p[t_hi - 1]) / (
                p[t_hi] - p[t_hi - 1])
        return pd.DataFrame({"q": [q], "t_hi": [t_hi],
                             "eff_diameter": [d]})

    def _one(df: pd.DataFrame) -> pd.DataFrame:
        df = df.copy(deep=False)
        df["_g"] = 0
        return df

    return _sanitize_join_output(
        coarse_aggregate(part.map_batches(_one, batch_format="pandas",
                                          batch_size=None),
                         ["_g"], lambda df: _fin(df.drop(columns=["_g"])),
                         n_coarse=n_coarse),
        pa.schema([("q", pa.float64()), ("t_hi", pa.int64()),
                   ("eff_diameter", pa.float64())]))


def partition_quality(edges: Dataset, assign: Dataset, *,
                      src: str = "src", dst: str = "dst",
                      node_col: str = "node",
                      comm_col: str = "community",
                      n_coarse: int | None = None) -> Dataset:
    """Score a community assignment against an undirected graph → one
    row per community: (community, internal, cut, vol, conductance,
    modularity_term). ``internal`` = intra-community edges, ``cut`` =
    edges with exactly one endpoint inside, ``vol`` = Σ endpoint
    degrees; conductance φ = cut / min(vol, 2m − vol) (null when the
    denominator is 0) and Newman modularity term = internal/m −
    (vol/2m)² — global Q is the sum of the terms. The evaluation
    companion to :func:`label_propagation` / the CC family: KG entity
    clusters are only as good as their measured cohesion.

    Scale shape: canonical undirected dedup (self-loops dropped) →
    TWO slim community-attach ``coarse_join``s → a 2-rows-per-edge
    fan-out carrying (deg, intra, cut) markers → ONE community-keyed
    coarse sum → a vectorized finale with the single scalar m (a
    driver count, not data). Edges with an unassigned endpoint drop
    via the inner joins — the assignment is expected to cover the
    graph (same contract as the SQL oracle's joins)."""
    from omop2obo_ray.functions.shuffle import coarse_join

    def _canon(df: pd.DataFrame) -> pd.DataFrame:
        a = df[src].astype(str)
        b = df[dst].astype(str)
        lo = a.where(a <= b, b)
        hi = b.where(a <= b, a)
        out = pd.DataFrame({"a": lo, "b": hi})
        return out[out["a"] != out["b"]].drop_duplicates()

    e = _sanitize_join_output(
        coarse_aggregate(
            edges.map_batches(_canon, batch_format="pandas",
                              batch_size=None),
            ["a", "b"], lambda df: df.drop_duplicates(),
            n_coarse=n_coarse),
        pa.schema([("a", pa.string()), ("b", pa.string())])
    ).materialize()
    m = e.count()

    asg = assign.map_batches(
        lambda b: pa.table({
            "n2": pc.cast(b[node_col].combine_chunks(), pa.string()),
            "_c": b[comm_col]}),
        batch_format="pyarrow", batch_size=None)
    ct = _pa_schema_of(assign).field(comm_col).type

    wa = coarse_join(e, asg.map_batches(
        lambda b: pa.table({"n2": b["n2"], "ca": b["_c"]}),
        batch_format="pyarrow", batch_size=None),
        on="a", right_on="n2", how="inner", n_coarse=n_coarse)
    wb = coarse_join(wa, asg.map_batches(
        lambda b: pa.table({"n3": b["n2"], "cb": b["_c"]}),
        batch_format="pyarrow", batch_size=None),
        on="b", right_on="n3", how="inner", n_coarse=n_coarse)

    def _fan(df: pd.DataFrame) -> pd.DataFrame:
        intra = (df["ca"] == df["cb"]).to_numpy()
        inter = ~intra
        return pd.DataFrame({
            "community": pd.concat([df["ca"], df["cb"]],
                                   ignore_index=True),
            "deg": 1,
            "internal": np.r_[intra.astype(np.int64),
                              np.zeros(len(df), np.int64)],
            "cut": np.r_[inter.astype(np.int64),
                         inter.astype(np.int64)]})

    fan = wb.map_batches(_fan, batch_format="pandas",
                         batch_size=None)

    def _agg(df: pd.DataFrame) -> pd.DataFrame:
        return (df.groupby("community", sort=False)
                .agg(internal=("internal", "sum"),
                     cut=("cut", "sum"), vol=("deg", "sum"))
                .reset_index())

    sums = _sanitize_join_output(
        coarse_aggregate(fan, ["community"], _agg, n_coarse=n_coarse),
        pa.schema([("community", ct), ("internal", pa.int64()),
                   ("cut", pa.int64()), ("vol", pa.int64())]))

    mf = float(m)

    def _fin(df: pd.DataFrame) -> pd.DataFrame:
        vol = df["vol"].to_numpy(np.float64)
        cut = df["cut"].to_numpy(np.float64)
        internal = df["internal"].to_numpy(np.float64)
        denom = np.minimum(vol, 2.0 * mf - vol)
        cond = np.where(denom > 0.0, cut / denom, np.nan)
        frac = vol / (2.0 * mf)
        out = df.copy(deep=False)
        out["conductance"] = cond
        out["modularity_term"] = internal / mf - frac * frac
        return out

    return sums.map_batches(_fin, batch_format="pandas",
                            batch_size=None)


def redirect_resolve(edges: Dataset, *, src: str = "src",
                     dst: str = "dst", max_rounds: int = 32,
                     n_coarse: int | None = None) -> Dataset:
    """Resolve redirect chains to their terminal target via pointer
    doubling → ``(node, final, resolved)`` for every redirecting node.
    The input is a functional graph (HTTP 3xx map: each url points at
    ONE target — duplicate sources are collapsed deterministically to
    their min target first). ``final`` is the first non-redirecting
    url on the chain; chains that never terminate inside
    ``2^max_rounds`` hops (pure redirect cycles) come back
    ``resolved = 0`` with ``final`` = the farthest pointer reached.

    Crawl-pipeline role: canonicalizing link targets before graph
    construction (the reference resolves each clinical code through
    UMLS CUI chains one hop at a time, `umls_api.py`-style; at web
    scale a chain walk must be logarithmic, not linear).

    Scale shape: O(log max_chain_len) rounds — each round is ONE
    ``coarse_join`` of the still-unresolved frontier against the full
    pointer table on ``ptr == node`` (pointer doubling:
    R_{k+1}(x) = R_k(R_k(x))). Settled rows stay in the LOOKUP side
    (their pointer is already the terminal, so a frontier row landing
    on them settles immediately) but never re-enter the frontier; the
    table is sanitize-materialized per round so no round replays its
    predecessors. No driver-side state beyond the loop counter.
    """
    from omop2obo_ray.functions.shuffle import coarse_join

    if n_coarse is None:
        cpus = (int(ray.cluster_resources().get("CPU", 8))
                if ray.is_initialized() else 8)
        n_coarse = max(32, 3 * cpus)

    def _slim(b: pa.Table) -> pa.Table:
        return pa.table({
            "node": b[src].combine_chunks().cast(pa.int64()),
            "ptr": b[dst].combine_chunks().cast(pa.int64())})

    slim = edges.map_batches(_slim, batch_format="pyarrow",
                             batch_size=None)

    # collapse duplicate sources (min target) — ONE keyed exchange
    def _min_ptr(df: pd.DataFrame) -> pd.DataFrame:
        return df.groupby("node", sort=False)["ptr"].min().reset_index()

    tbl_schema = pa.schema([("node", pa.int64()), ("ptr", pa.int64()),
                            ("done", pa.int8())])
    table = _sanitize_join_output(
        coarse_aggregate(slim, ["node"], _min_ptr, n_coarse=n_coarse),
        pa.schema([("node", pa.int64()), ("ptr", pa.int64())])
    ).map_batches(
        lambda b: b.append_column(
            "done", pa.array(np.zeros(b.num_rows, np.int8))),
        batch_format="pyarrow", batch_size=None)
    table = _sanitize_join_output(table, tbl_schema)

    probe_schema = pa.schema([("node", pa.int64()), ("ptr", pa.int64())])
    for _round in range(max_rounds):
        # sanitize-materialize the frontier projection: a lazy
        # Filter→Project over mixed-provenance refs mis-propagates
        # its schema after a few rounds (Ray 2.49), which coarse_join
        # trusts for its exchange layout — same idiom as sssp
        probe = _sanitize_join_output(
            table.filter(expr="done == 0").select_columns(
                ["node", "ptr"]), probe_schema)
        if probe.count() == 0:
            break
        look = table.map_batches(
            lambda b: pa.table({"lnode": b["node"], "lptr": b["ptr"],
                                "ldone": b["done"]}),
            batch_format="pyarrow", batch_size=None)
        j = coarse_join(probe, look, on="ptr", right_on="lnode",
                        how="left_outer", n_coarse=n_coarse)

        def _advance(b: pa.Table) -> pa.Table:
            ptr = b["ptr"].combine_chunks().to_numpy(
                zero_copy_only=False)
            # all-miss buckets surface lptr/ldone as NULL-typed arrays
            # — cast to the target type BEFORE fill_null
            lptr = b["lptr"].combine_chunks().cast(pa.int64())
            hit = pc.is_valid(lptr).to_numpy(zero_copy_only=False)
            lptr = lptr.fill_null(0).to_numpy(zero_copy_only=False)
            ldone = (b["ldone"].combine_chunks().cast(pa.int8())
                     .fill_null(0).to_numpy(zero_copy_only=False))
            # miss → ptr is a terminal url; hit on a settled row →
            # its ptr IS the terminal; hit on a live row → double
            new_ptr = np.where(hit, lptr, ptr)
            done = (~hit) | (ldone == 1)
            return pa.table({
                "node": b["node"],
                "ptr": pa.array(new_ptr, pa.int64()),
                "done": pa.array(done.astype(np.int8))})

        advanced = j.map_batches(_advance, batch_format="pyarrow",
                                 batch_size=None)

        # pin (node, ptr, done) column ORDER on both union sides:
        # blocks of mixed order poison downstream ``schema()`` (Ray
        # 2.49 reports the first block's layout), which coarse_join
        # trusts for its exchange schema
        def _order(b: pa.Table) -> pa.Table:
            return pa.table({
                "node": b["node"].combine_chunks().cast(pa.int64()),
                "ptr": b["ptr"].combine_chunks().cast(pa.int64()),
                "done": b["done"].combine_chunks().cast(pa.int8())})

        settled = table.filter(expr="done == 1").map_batches(
            _order, batch_format="pyarrow", batch_size=None)
        table = _sanitize_join_output(
            settled.union(advanced.map_batches(
                _order, batch_format="pyarrow", batch_size=None)),
            tbl_schema)

    def _emit(b: pa.Table) -> pa.Table:
        return pa.table({
            "node": b["node"], "final": b["ptr"],
            "resolved": b["done"].combine_chunks().cast(pa.int8())})

    return table.map_batches(_emit, batch_format="pyarrow",
                             batch_size=None)


def k_truss(edges: Dataset, k: int, *, src: str = "src",
            dst: str = "dst", max_iters: int = 16,
            allow_partial: bool = False,
            num_partitions: int = 8) -> Dataset:
    """k-truss of the undirected simple graph underlying ``edges`` →
    the canonical edge set (a, b), a < b, of the maximal subgraph in
    which every edge closes ≥ k−2 triangles WITHIN the subgraph — the
    standard cohesive-subgraph refinement of k-core (every k-truss is
    a (k−1)-core, but far denser; Cohen 2008). Peels iteratively:
    count per-edge triangle support over the CURRENT subgraph, drop
    edges below k−2, repeat to fixpoint (or exactly ``max_iters``
    rounds when ``allow_partial`` — a well-defined bounded operator,
    which is what the SQL gate unrolls).

    Scale shape per round: the degree-oriented closed-wedge stream
    (each triangle materialized ONCE, hub fan-out √m-bounded by the
    Suri–Vassilvitskii orientation, exactly as triangle_count) → a
    3-records-per-triangle flat map → ONE edge-keyed coarse count.
    Survivors are read straight off the support table (an edge with
    support ≥ k−2 ≥ 1 always has a support row), so no semi-join back;
    the subgraph shrinks monotonically and later rounds cost less.
    Only the two per-round convergence counters touch the driver."""
    if k < 3:
        raise ValueError("k-truss is defined for k >= 3")
    und = _canonical_undirected(edges, src, dst)
    thresh = k - 2
    ab_schema = pa.schema([("a", pa.string()), ("b", pa.string())])
    n_edges = und.count()

    for _round in range(max_iters):
        if n_edges == 0:
            break
        closed = _closed_wedges(und, _undirected_degrees(und),
                                num_partitions=num_partitions)
        if closed is None:
            und = ray.data.from_arrow(ab_schema.empty_table())
            n_edges = 0
            break

        def _edge_records(b: pa.Table) -> pa.Table:
            ws = b["ws"].to_numpy(zero_copy_only=False)
            a = b["a"].to_numpy(zero_copy_only=False)
            bb = b["b"].to_numpy(zero_copy_only=False)
            # 3 canonical edges per triangle; (a, b) is canonical
            # already, the two center legs canonicalize by id
            ea = np.r_[np.minimum(ws, a), np.minimum(ws, bb), a]
            eb = np.r_[np.maximum(ws, a), np.maximum(ws, bb), bb]
            return pa.table({"ea": pa.array(ea, pa.string()),
                             "eb": pa.array(eb, pa.string())})

        recs = closed.map_batches(_edge_records, batch_format="pyarrow",
                                  batch_size=None)

        def _support(df: pd.DataFrame) -> pd.DataFrame:
            return (df.groupby(["ea", "eb"], sort=False).size()
                    .rename("sup").reset_index())

        sup = _sanitize_join_output(
            coarse_aggregate(recs, ["ea", "eb"], _support),
            pa.schema([("ea", pa.string()), ("eb", pa.string()),
                       ("sup", pa.int64())]))
        survivors = _sanitize_join_output(
            sup.filter(expr=f"sup >= {thresh}").map_batches(
                lambda b: pa.table({"a": b["ea"], "b": b["eb"]}),
                batch_format="pyarrow", batch_size=None),
            ab_schema)
        n_next = survivors.count()
        und = survivors
        if n_next == n_edges:
            n_edges = n_next
            break
        n_edges = n_next
    else:
        if not allow_partial:
            raise RuntimeError(
                f"k_truss did not converge in {max_iters} rounds")
    return und


@ray.remote
def _betweenness_local_task(u: np.ndarray, v: np.ndarray,
                            seeds: list, max_hops: int) -> pa.Table:
    """Single-task seeded Brandes (truncated at max_hops) — the
    endgame kernel behind ``betweenness``'s ``local_below``. Same
    contract as the distributed accumulation: per seed, BFS levels
    1..L (level-0 seed rows excluded from output), sigma = BFS-DAG
    path counts, delta(v) = sigma_v * sum over depth+1 successors of
    (1+delta_w)/sigma_w, bc = per-node sum over seeds (zero-delta
    visited nodes included). Float sums may differ from the
    distributed path at the last ulp (association order), exactly as
    the distributed path differs from itself across partitionings —
    the identity pytest compares with allclose."""
    from collections import defaultdict

    adj: dict = defaultdict(list)
    for a, b in zip(u.tolist(), v.tolist()):
        adj[a].append(b)
    bc: dict = defaultdict(float)
    for s in seeds:
        s = int(s)
        depth = {s: 0}
        sigma = {s: 1.0}
        levels = [[s]]
        for h in range(1, max_hops + 1):
            nxt: dict = {}
            for x in levels[-1]:
                for w in adj.get(x, ()):
                    if w in depth:
                        continue
                    nxt[w] = nxt.get(w, 0.0) + sigma[x]
            if not nxt:
                break
            # mark depths only after the hop completes (a node can
            # have several same-hop predecessors)
            for w, sg in nxt.items():
                depth[w] = h
                sigma[w] = sg
            levels.append(sorted(nxt))
        L = len(levels) - 1
        if L == 0:
            continue
        delta = {x: 0.0 for x, d in depth.items() if d >= 1}
        for h in range(L, 1, -1):
            for x in levels[h - 1]:
                tot = 0.0
                for w in adj.get(x, ()):
                    if depth.get(w) == h:
                        tot += (1.0 + delta[w]) / sigma[w]
                delta[x] = sigma[x] * tot
        for x, dl in delta.items():
            bc[x] += dl
    nodes = sorted(bc)
    return pa.table({
        "node": pa.array(nodes, pa.int64()),
        "bc": pa.array([bc[n] for n in nodes], pa.float64())})


def betweenness(edges: Dataset, seeds: list, *, src: str = "src",
                dst: str = "dst", directed: bool = False,
                max_hops: int = 8,
                n_coarse: int | None = None,
                local_below: int = 65536) -> Dataset:
    """Brandes betweenness centrality restricted to the given source
    set → (node, bc) where bc(v) = Σ_{s∈seeds} δ_s(v), the raw
    dependency sums of Brandes' accumulation (FASTER ALGORITHM FOR
    BETWEENNESS, 2001). With seeds = a uniform sample of size K this
    is the standard pivot estimator — scale by n/K for the estimate
    (and halve for undirected symmetry) on the caller's side; the
    operator itself is deterministic and exact for its seed set.
    Node ids must be int64 < 2^31 (composite (source, node) keys pack
    into one int64 so every exchange stays single-column).

    Scale shape: ALL seed BFSes run simultaneously, keyed (s, v) —
    per forward hop ONE coarse_join of the frontier onto its
    out-edges, ONE anti-join against the visited-key set, ONE coarse
    sum of path counts σ; per backward hop ONE coarse_join onto
    reversed edges and ONE marker-row fold (predecessor rows of hop
    h−1 carry σ_v, successor contributions carry (1+δ_w)/σ_w; groups
    without a carrier — non-predecessor edges — drop inside the
    frame, so no dist-compare join). Per-hop frontiers are the only
    materialized state; nothing touches the driver but loop counters.
    """
    from omop2obo_ray.functions.shuffle import coarse_join

    if n_coarse is None:
        cpus = (int(ray.cluster_resources().get("CPU", 8))
                if ray.is_initialized() else 8)
        n_coarse = max(32, 3 * cpus)
    PACK = np.int64(1) << np.int64(32)

    def _slim(b: pa.Table) -> pa.Table:
        return pa.table({
            "src": b[src].combine_chunks().cast(pa.int64()),
            "dst": b[dst].combine_chunks().cast(pa.int64())})

    e = edges.map_batches(_slim, batch_format="pyarrow",
                          batch_size=None)
    if not directed:
        e = e.union(e.map_batches(
            lambda b: pa.table({"src": b["dst"], "dst": b["src"]}),
            batch_format="pyarrow", batch_size=None))
    e = _sanitize_join_output(
        coarse_aggregate(e, ["src", "dst"],
                         lambda df: df.drop_duplicates(),
                         n_coarse=n_coarse),
        pa.schema([("src", pa.int64()), ("dst", pa.int64())]))
    ecount = e.count()  # metadata-only: e is materialized refs
    if 0 < ecount <= local_below:
        # endgame local-finish (same hybrid as scc/closure/CC): the
        # deduped, direction-expanded edge set fits one task
        et = pa.concat_tables(
            [t for t in e.iter_batches(batch_size=None,
                                       batch_format="pyarrow")])
        ref = _betweenness_local_task.remote(
            et["src"].to_numpy(zero_copy_only=False),
            et["dst"].to_numpy(zero_copy_only=False),
            sorted({int(s) for s in seeds}), max_hops)
        return ray.data.from_arrow_refs([ref])

    ss = sorted({int(s) for s in seeds})
    f_schema = pa.schema([("k", pa.int64()), ("s", pa.int64()),
                          ("v", pa.int64()), ("sigma", pa.float64())])
    seed_tbl = pa.table({
        "k": pa.array([s * int(PACK) + s for s in ss], pa.int64()),
        "s": pa.array(ss, pa.int64()),
        "v": pa.array(ss, pa.int64()),
        "sigma": pa.array([1.0] * len(ss), pa.float64())})
    frontier = ray.data.from_arrow(seed_tbl)
    visited = frontier.select_columns(["k"])
    fronts = [frontier]

    for _h in range(1, max_hops + 1):
        cand = coarse_join(frontier, e, on="v", right_on="src",
                           how="inner", n_coarse=n_coarse)

        def _pack(b: pa.Table) -> pa.Table:
            s = b["s"].combine_chunks().to_numpy(zero_copy_only=False)
            w = b["dst"].combine_chunks().to_numpy(
                zero_copy_only=False)
            return pa.table({
                "k": pa.array(s * PACK + w, pa.int64()),
                "s": b["s"], "v": b["dst"], "sigma": b["sigma"]})

        cand = cand.map_batches(_pack, batch_format="pyarrow",
                                batch_size=None)
        fresh = coarse_join(cand, visited, on="k", how="left_anti",
                            n_coarse=n_coarse)

        def _fold_sigma(df: pd.DataFrame) -> pd.DataFrame:
            g = df.groupby("k", sort=False)
            out = g.agg(s=("s", "first"), v=("v", "first"),
                        sigma=("sigma", "sum")).reset_index()
            return out

        newf = _sanitize_join_output(
            coarse_aggregate(fresh, ["k"], _fold_sigma,
                             n_coarse=n_coarse), f_schema)
        if newf.count() == 0:
            break
        fronts.append(newf)
        visited = _sanitize_join_output(
            visited.union(newf.select_columns(["k"])),
            pa.schema([("k", pa.int64())]))
        frontier = newf

    bc_schema = pa.schema([("node", pa.int64()), ("bc", pa.float64())])
    if len(fronts) == 1:  # nothing reachable beyond the seeds
        return ray.data.from_arrow(bc_schema.empty_table())

    d_schema = pa.schema([("k", pa.int64()), ("s", pa.int64()),
                          ("v", pa.int64()), ("sigma", pa.float64()),
                          ("delta", pa.float64())])
    deltas = fronts[-1].map_batches(
        lambda b: b.append_column(
            "delta", pa.array(np.zeros(b.num_rows), pa.float64())),
        batch_format="pyarrow", batch_size=None)
    deltas = _sanitize_join_output(deltas, d_schema)
    acc = []

    for h in range(len(fronts) - 1, 0, -1):
        acc.append(deltas)
        if h == 1:
            break
        rev = coarse_join(deltas, e, on="v", right_on="dst",
                          how="inner", n_coarse=n_coarse)

        def _contrib(b: pa.Table) -> pa.Table:
            s = b["s"].combine_chunks().to_numpy(zero_copy_only=False)
            v = b["src"].combine_chunks().to_numpy(
                zero_copy_only=False)
            sg = (b["sigma"].combine_chunks()
                  .to_numpy(zero_copy_only=False))
            dl = (b["delta"].combine_chunks()
                  .to_numpy(zero_copy_only=False))
            n = b.num_rows
            return pa.table({
                "k": pa.array(s * PACK + v, pa.int64()),
                "s": pa.nulls(n, pa.int64()),
                "v": pa.nulls(n, pa.int64()),
                "sigma": pa.nulls(n, pa.float64()),
                "p": pa.array((1.0 + dl) / sg, pa.float64())})

        contrib = rev.map_batches(_contrib, batch_format="pyarrow",
                                  batch_size=None)
        carrier = fronts[h - 1].map_batches(
            lambda b: pa.table({
                "k": b["k"], "s": b["s"], "v": b["v"],
                "sigma": b["sigma"],
                "p": pa.array(np.zeros(b.num_rows), pa.float64())}),
            batch_format="pyarrow", batch_size=None)

        def _fold_delta(df: pd.DataFrame) -> pd.DataFrame:
            g = df.groupby("k", sort=False)
            out = g.agg(s=("s", "max"), v=("v", "max"),
                        sigma=("sigma", "max"),
                        p=("p", "sum")).reset_index()
            out = out[out["s"].notna()]  # groups w/o carrier drop
            return pd.DataFrame({
                "k": out["k"],
                "s": out["s"].astype(np.int64),
                "v": out["v"].astype(np.int64),
                "sigma": out["sigma"],
                "delta": out["sigma"] * out["p"]})

        deltas = _sanitize_join_output(
            coarse_aggregate(contrib.union(carrier), ["k"],
                             _fold_delta, n_coarse=n_coarse),
            d_schema)

    all_d = acc[0]
    for d in acc[1:]:
        all_d = all_d.union(d)

    def _bc(df: pd.DataFrame) -> pd.DataFrame:
        return (df.groupby("v", sort=False)["delta"].sum()
                .rename("bc").reset_index()
                .rename(columns={"v": "node"}))

    return _sanitize_join_output(
        coarse_aggregate(all_d.select_columns(["v", "delta"]), ["v"],
                         _bc, n_coarse=n_coarse), bc_schema)


def reciprocity(edges: Dataset, *, src: str = "src",
                dst: str = "dst",
                n_coarse: int | None = None) -> Dataset:
    """Directed-graph reciprocity → one row (n_edges, n_recip, ratio):
    the fraction of distinct directed edges (u→v, u≠v) whose reverse
    v→u also exists — THE shape statistic separating link-exchange /
    mutual-citation subwebs from the broadly one-way web link graph.

    Scale shape: dedup to distinct directed edges (ONE coarse
    exchange on the packed pair); a directed edge and its reverse
    land in the SAME frame by keying on the UNORDERED pair, so
    reciprocation is decided in-frame with no self-join — frames are
    ≤ 2 rows per pair; block-local partial counts then one tiny
    fold."""
    def _slim(b: pa.Table) -> pa.Table:
        s = b[src].combine_chunks().cast(pa.large_string())
        d = b[dst].combine_chunks().cast(pa.large_string())
        keep = pc.not_equal(s, d)
        return pa.table({"s": s.filter(keep), "d": d.filter(keep)})

    slim = edges.map_batches(_slim, batch_format="pyarrow",
                             batch_size=None)

    # key on the unordered pair; count distinct directions per pair
    def _pair(b: pa.Table) -> pa.Table:
        return pa.table({
            "a": pc.min_element_wise(b["s"], b["d"]),
            "b": pc.max_element_wise(b["s"], b["d"]),
            "fwd": pc.cast(pc.equal(
                b["s"], pc.min_element_wise(b["s"], b["d"])),
                pa.int8())})

    pairs = slim.map_batches(_pair, batch_format="pyarrow",
                             batch_size=None)

    def _decide(df: pd.DataFrame) -> pd.DataFrame:
        g = (df.groupby(["a", "b"], sort=False)["fwd"]
             .agg(["min", "max"]).reset_index())
        both = (g["min"] != g["max"]).to_numpy()
        n_edges = int(len(g) + both.sum())  # directions present
        return pd.DataFrame({"n_edges": [n_edges],
                             "n_recip": [int(2 * both.sum())]})

    partial = coarse_aggregate(pairs, ["a", "b"], _decide,
                               n_coarse=n_coarse)

    def _fold(df: pd.DataFrame) -> pd.DataFrame:
        ne = int(df["n_edges"].sum())
        nr = int(df["n_recip"].sum())
        return pd.DataFrame({
            "n_edges": [ne], "n_recip": [nr],
            "ratio": [nr / ne if ne else 0.0]})

    out = partial.map_batches(
        lambda df: df.assign(_g=np.zeros(len(df), np.int8)),
        batch_format="pandas", batch_size=None)
    return _sanitize_join_output(
        coarse_aggregate(out, ["_g"],
                         lambda df: _fold(df)), pa.schema(
            [("n_edges", pa.int64()), ("n_recip", pa.int64()),
             ("ratio", pa.float64())]))


def assortativity(edges: Dataset, *, src: str = "src",
                  dst: str = "dst",
                  n_coarse: int | None = None) -> Dataset:
    """Degree assortativity (Newman 2002) of the undirected simple
    graph → one row (n, r): the Pearson correlation of (deg(u),
    deg(v)) over both orientations of every distinct edge — positive
    on social-style graphs, negative on hub-and-spoke web graphs.

    Scale shape: canonical dedup (one exchange) → degrees (one
    exchange) → TWO degree-attach hash joins → block-local sufficient
    stats (n, Σx, Σy, Σx², Σy², Σxy — 6 numbers per block, the
    grouped_corr combiner shape) → one single-group fold. Only the
    final scalar leaves the cluster."""
    from omop2obo_ray.functions.shuffle import coarse_join

    und = _canonical_undirected(edges, src, dst)
    deg = _undirected_degrees(und)
    j1 = coarse_join(und, deg.map_batches(
        lambda b: pa.table({"node": b["node"], "da": b["d"]}),
        batch_format="pyarrow", batch_size=None),
        on="a", right_on="node", n_coarse=n_coarse)
    j2 = coarse_join(j1, deg.map_batches(
        lambda b: pa.table({"node": b["node"], "db": b["d"]}),
        batch_format="pyarrow", batch_size=None),
        on="b", right_on="node", n_coarse=n_coarse)

    def _stats(df: pd.DataFrame) -> pd.DataFrame:
        # both orientations: (da, db) and (db, da)
        x = np.r_[df["da"].to_numpy(np.float64),
                  df["db"].to_numpy(np.float64)]
        y = np.r_[df["db"].to_numpy(np.float64),
                  df["da"].to_numpy(np.float64)]
        return pd.DataFrame({
            "_g": [np.int8(0)], "n": [float(len(x))],
            "sx": [x.sum()], "sy": [y.sum()],
            "sxx": [(x * x).sum()], "syy": [(y * y).sum()],
            "sxy": [(x * y).sum()]})

    part = j2.map_batches(_stats, batch_format="pandas",
                          batch_size=None)

    def _fold(df: pd.DataFrame) -> pd.DataFrame:
        n, sx, sy = df["n"].sum(), df["sx"].sum(), df["sy"].sum()
        sxx, syy, sxy = (df["sxx"].sum(), df["syy"].sum(),
                         df["sxy"].sum())
        cov = sxy - sx * sy / n
        vx = sxx - sx * sx / n
        vy = syy - sy * sy / n
        r = cov / np.sqrt(vx * vy) if vx > 0 and vy > 0 else 0.0
        return pd.DataFrame({"n": [np.int64(n)], "r": [r]})

    return _sanitize_join_output(
        coarse_aggregate(part, ["_g"], _fold),
        pa.schema([("n", pa.int64()), ("r", pa.float64())]))


def edge_embeddedness(edges: Dataset, *, src: str = "src",
                      dst: str = "dst",
                      num_partitions: int = 8,
                      n_coarse: int | None = None) -> Dataset:
    """Per-edge embeddedness → (a, b, support): the number of
    triangles each canonical undirected edge closes (= common
    neighbors of its endpoints) — Granovetter's tie-strength measure
    and k_truss's round-0 support table exposed as its own operator
    (zero-support bridges INCLUDED, they're the interesting rows).

    Scale shape: one degree-oriented closed-wedge pass (each triangle
    once), a 3-records-per-triangle flat map, then ONE edge-keyed
    coarse sum where every canonical edge also ships a zero marker —
    so bridges surface with support 0 without any outer join."""
    und = _canonical_undirected(edges, src, dst)
    closed = _closed_wedges(und, _undirected_degrees(und),
                            num_partitions=num_partitions)
    zero = und.map_batches(
        lambda b: pa.table({
            "ea": b["a"].combine_chunks().cast(pa.string()),
            "eb": b["b"].combine_chunks().cast(pa.string()),
            "c": pa.array(np.zeros(b.num_rows, np.int64))}),
        batch_format="pyarrow", batch_size=None)
    if closed is None:
        recs = zero
    else:
        def _edge_records(b: pa.Table) -> pa.Table:
            ws = b["ws"].to_numpy(zero_copy_only=False)
            a = b["a"].to_numpy(zero_copy_only=False)
            bb = b["b"].to_numpy(zero_copy_only=False)
            ea = np.r_[np.minimum(ws, a), np.minimum(ws, bb), a]
            eb = np.r_[np.maximum(ws, a), np.maximum(ws, bb), bb]
            return pa.table({
                "ea": pa.array(ea, pa.string()),
                "eb": pa.array(eb, pa.string()),
                "c": pa.array(np.ones(3 * b.num_rows, np.int64))})

        recs = zero.union(closed.map_batches(
            _edge_records, batch_format="pyarrow", batch_size=None))

    def _sum(df: pd.DataFrame) -> pd.DataFrame:
        return (df.groupby(["ea", "eb"], sort=False)["c"].sum()
                .rename("support").reset_index()
                .rename(columns={"ea": "a", "eb": "b"}))

    return _sanitize_join_output(
        coarse_aggregate(recs, ["ea", "eb"], _sum,
                         n_coarse=n_coarse),
        pa.schema([("a", pa.string()), ("b", pa.string()),
                   ("support", pa.int64())]))


def powerlaw_alpha(edges: Dataset, *, src: str = "src",
                   dst: str = "dst", d_min: int = 2,
                   n_coarse: int | None = None) -> Dataset:
    """Hill / Clauset-Shalizi-Newman MLE of the degree-distribution
    power-law exponent → one row (n_tail, alpha):
    α = 1 + n / Σ ln(dᵢ/d_min) over degrees ≥ d_min — the standard
    sanity statistic for a crawled link graph (web in/out-degree tails
    run α ≈ 2.1-2.7; a crawler bug or dedup failure shows up as a
    wildly different exponent long before a browse would catch it).

    Scale shape: degrees (ONE coarse exchange) → block-local partials
    (count, Σ ln d — 2 numbers per block) → one single-group fold.
    ln sums are folded in float64 both here and in any SQL oracle;
    gate with a quantizer (reassociation differs)."""
    deg = _undirected_degrees(_canonical_undirected(edges, src, dst))

    def _partial(df: pd.DataFrame) -> pd.DataFrame:
        d = df["d"].to_numpy(np.float64)
        d = d[d >= d_min]
        return pd.DataFrame({
            "_g": [np.int8(0)], "n": [np.int64(len(d))],
            "slog": [np.log(d).sum() if len(d) else 0.0]})

    part = deg.map_batches(_partial, batch_format="pandas",
                           batch_size=None)

    def _fold(df: pd.DataFrame) -> pd.DataFrame:
        n = int(df["n"].sum())
        slog = float(df["slog"].sum())
        denom = slog - n * float(np.log(d_min))
        alpha = 1.0 + n / denom if denom > 0 else float("nan")
        return pd.DataFrame({"n_tail": [np.int64(n)],
                             "alpha": [alpha]})

    return _sanitize_join_output(
        coarse_aggregate(part, ["_g"], _fold, n_coarse=n_coarse),
        pa.schema([("n_tail", pa.int64()), ("alpha", pa.float64())]))


@ray.remote
def _closure_local_task(c: np.ndarray, p: np.ndarray,
                        include_self: bool) -> pa.Table:
    """Single-task ancestor closure for a small edge set: memoized
    DFS over the child→parent DAG (iterative, diamond-safe). The
    endgame kernel behind ``local_below`` — runs OFF the driver, in
    one Ray task, only when the (deduped) edge count fits."""
    parents: dict[int, list[int]] = {}
    nodes: set[int] = set()
    for ci, pi in zip(c.tolist(), p.tolist()):
        parents.setdefault(ci, []).append(pi)
        nodes.add(ci)
        nodes.add(pi)
    anc: dict[int, set[int]] = {}
    for start in nodes:
        if start in anc:
            continue
        stack = [start]
        while stack:
            n = stack[-1]
            if n in anc:
                stack.pop()
                continue
            missing = [q for q in parents.get(n, ())
                       if q not in anc and q != n]
            if missing:
                stack.extend(missing)
                continue
            s: set[int] = set()
            for q in parents.get(n, ()):
                if q == n:
                    continue
                s.add(q)
                s |= anc[q]
            anc[n] = s
            stack.pop()
    rows_n, rows_a = [], []
    for n in sorted(nodes):
        if include_self:
            rows_n.append(n)
            rows_a.append(n)
        for a in sorted(anc[n]):
            rows_n.append(n)
            rows_a.append(a)
    return pa.table({"node": pa.array(rows_n, pa.int64()),
                     "anc": pa.array(rows_a, pa.int64())})


def ancestor_closure_distributed(edges: Dataset, *, child: str = "child",
                                 parent: str = "parent",
                                 include_self: bool = True,
                                 max_rounds: int = 64,
                                 n_coarse: int | None = None,
                                 local_below: int = 65536) -> Dataset:
    """Transitive ancestor closure of a child→parent DAG →
    (node, anc), optionally including the node itself — the
    distributed form of the reference's precomputed ancestor input
    (`omop2obo` ships closure dictionaries; at ontology-union scale
    the closure must be built, not loaded). Per round ONE
    ``coarse_join`` of the newly-discovered frontier onto the parent
    edges (frontier-sized, not closure-sized); closure mass is the
    output itself (Σ node-depths), the irreducible cost of
    materializing ancestors. Edges are deduped once up front and the
    frontier is deduped every round — duplicate edges / DAG diamonds
    otherwise multiply frontier rows geometrically per hop.

    ``local_below`` is the ENDGAME fallback (the standard hybrid for
    iterative graph algorithms — GraphX/Pregel-style systems switch
    to a single worker once the active subgraph fits): when the
    deduped edge count is at or below it, ONE Ray task computes the
    closure with a memoized DFS instead of paying a per-hop exchange
    round. Metadata-gated (the deduped edge table is materialized
    either way), exact-identical output (pinned by an identity
    pytest vs ``local_below=0``), and never triggered by a
    production-scale ontology union — only by small inputs where
    exchange fixed cost would dominate."""
    from omop2obo_ray.functions.shuffle import coarse_join

    def _slim(b: pa.Table) -> pa.Table:
        return pa.table({
            "c": b[child].combine_chunks().cast(pa.int64()),
            "p": b[parent].combine_chunks().cast(pa.int64())})

    edge_schema = pa.schema([("c", pa.int64()), ("p", pa.int64())])
    e = _sanitize_join_output(
        coarse_aggregate(
            edges.map_batches(_slim, batch_format="pyarrow",
                              batch_size=None),
            ["c", "p"], lambda df: df.drop_duplicates(),
            n_coarse=n_coarse), edge_schema)
    pair_schema = pa.schema([("node", pa.int64()), ("anc", pa.int64())])
    ecount = e.count()  # metadata-only: e is materialized refs
    if 0 < ecount <= local_below:
        et = pa.concat_tables(
            [b for b in e.iter_batches(batch_size=None,
                                       batch_format="pyarrow")])
        ref = _closure_local_task.remote(
            et["c"].to_numpy(zero_copy_only=False),
            et["p"].to_numpy(zero_copy_only=False), include_self)
        return ray.data.from_arrow_refs([ref])

    nodes = _sanitize_join_output(
        coarse_aggregate(
            e.map_batches(
                lambda b: pa.table({"node": pa.concat_arrays(
                    [b["c"].combine_chunks(),
                     b["p"].combine_chunks()])}),
                batch_format="pyarrow", batch_size=None),
            ["node"], lambda df: df.drop_duplicates(),
            n_coarse=n_coarse),
        pa.schema([("node", pa.int64())]))
    self_rows = nodes.map_batches(
        lambda b: pa.table({"node": b["node"], "anc": b["node"]}),
        batch_format="pyarrow", batch_size=None)

    frontier = _sanitize_join_output(self_rows, pair_schema)
    parts = [frontier] if include_self else []
    for _ in range(max_rounds):
        nxt = coarse_join(frontier, e, on="anc", right_on="c",
                          how="inner", n_coarse=n_coarse)
        # per-round dedup: diamonds rediscover (node, anc) pairs and
        # would otherwise compound across hops
        frontier = _sanitize_join_output(
            coarse_aggregate(
                nxt.map_batches(
                    lambda b: pa.table({"node": b["node"],
                                        "anc": b["p"]}),
                    batch_format="pyarrow", batch_size=None),
                ["node", "anc"], lambda df: df.drop_duplicates(),
                n_coarse=n_coarse), pair_schema)
        if frontier.count() == 0:
            break
        parts.append(frontier)
    if not parts:  # include_self=False on an edgeless graph
        return ray.data.from_arrow(pair_schema.empty_table())
    out = parts[0]
    for p in parts[1:]:
        out = out.union(p)
    # a DAG can rediscover an ancestor via two paths — dedup
    return _sanitize_join_output(
        coarse_aggregate(out, ["node", "anc"],
                         lambda df: df.drop_duplicates(),
                         n_coarse=n_coarse), pair_schema)


class _SumSink:
    """Zero-CPU accumulator for in-materialize scalar taps (the
    canonicalize fold-in pattern): carries a convergence counter out
    of a map stage without a separate count plan. ``take`` reads and
    resets."""

    def __init__(self):
        self.v = 0

    def add(self, x: int) -> None:
        self.v += int(x)

    def take(self) -> int:
        v, self.v = self.v, 0
        return v


@ray.remote
def _scc_local_task(u: np.ndarray, v: np.ndarray) -> pa.Table:
    """Single-task SCC for a small edge set: iterative Kosaraju
    (finish-order DFS on G, component sweep on Gᵀ), component id =
    min member id — exactly the distributed contract. The endgame
    kernel behind ``local_below``; O(V+E), runs off the driver."""
    nodes = np.unique(np.concatenate([u, v]))
    n = len(nodes)
    ui = np.searchsorted(nodes, u)
    vi = np.searchsorted(nodes, v)

    def _csr(s: np.ndarray, d: np.ndarray):
        order = np.argsort(s, kind="stable")
        dd = d[order]
        starts = np.searchsorted(s[order], np.arange(n))
        ends = np.searchsorted(s[order], np.arange(n), side="right")
        return dd, starts, ends

    fd, fs, fe = _csr(ui, vi)          # forward adjacency
    rd_, rs, re_ = _csr(vi, ui)        # reverse adjacency

    visited = np.zeros(n, bool)
    finish: list[int] = []
    ptr = fs.copy()
    for s0 in range(n):
        if visited[s0]:
            continue
        visited[s0] = True
        stack = [s0]
        while stack:
            x = stack[-1]
            if ptr[x] < fe[x]:
                w = int(fd[ptr[x]])
                ptr[x] += 1
                if not visited[w]:
                    visited[w] = True
                    stack.append(w)
            else:
                finish.append(stack.pop())

    assigned = np.zeros(n, bool)
    labels = np.zeros(n, np.int64)
    for s0 in reversed(finish):
        if assigned[s0]:
            continue
        members = [s0]
        assigned[s0] = True
        stack = [s0]
        while stack:
            x = stack.pop()
            for w in rd_[rs[x]:re_[x]]:
                w = int(w)
                if not assigned[w]:
                    assigned[w] = True
                    members.append(w)
                    stack.append(w)
        m = np.asarray(members)
        labels[m] = int(nodes[m].min())
    return pa.table({"node": pa.array(nodes, pa.int64()),
                     "component": pa.array(labels, pa.int64())})


def strongly_connected_components(edges: Dataset, *,
                                  src: str = "src", dst: str = "dst",
                                  max_peels: int = 16,
                                  max_rounds: int = 64,
                                  n_coarse: int | None = None,
                                  stats: dict | None = None,
                                  local_below: int = 65536
                                  ) -> Dataset:
    """Directed strongly connected components → (node, component),
    component = min member id — the web-graph bowtie primitive
    (Broder 2000's giant-SCC decomposition of the link graph; the
    directed sibling of this file's CC family).

    Algorithm (FW-BW-MIN coloring, Orzan/Hong): per peel round,
    propagate two min-labels to fixpoint over the LIVE subgraph —
    f(x) = min id that can reach x (backward min), b(x) = min id
    reachable from x (forward min). f(x) = b(x) = m proves m→x and
    x→m, so exactly the nodes with f = b are settled (x ∈ SCC(m));
    they peel off and the next round runs on the remainder. Every
    trivial (singleton) SCC with a locally-minimal id settles in its
    first round, so real web graphs (bowtie + tendrils) need few
    peels; pathological chains of interleaved ids are bounded by
    ``max_peels`` (raises if exceeded — partial SCCs are never
    emitted).

    Scale shape: each propagation round is ONE ``coarse_join``
    (labels onto edges) + ONE node-keyed coarse min per direction,
    with a change-count convergence scalar (the CC family's
    contract); peeling is one semi/anti filter per round. Labels and
    edges are the only state; nothing graph-sized on the driver.

    ``local_below`` is the ENDGAME fallback (same hybrid as
    ``ancestor_closure_distributed``): when the deduped live edge
    count fits, ONE Ray task runs iterative Kosaraju instead of
    per-round exchanges whose fixed cost would dominate. Exact same
    (node, component=min member) contract, pinned by an identity
    pytest vs ``local_below=0``; never triggered at crawl scale."""
    from omop2obo_ray.functions.shuffle import coarse_join

    if n_coarse is None:
        cpus = (int(ray.cluster_resources().get("CPU", 8))
                if ray.is_initialized() else 8)
        n_coarse = max(32, 3 * cpus)

    pair = pa.schema([("u", pa.int64()), ("v", pa.int64())])
    live = _sanitize_join_output(
        coarse_aggregate(
            edges.map_batches(
                lambda b: pa.table({
                    "u": b[src].combine_chunks().cast(pa.int64()),
                    "v": b[dst].combine_chunks().cast(pa.int64())}),
                batch_format="pyarrow", batch_size=None),
            ["u", "v"], lambda df: df.drop_duplicates(),
            n_coarse=n_coarse), pair).materialize()
    lcount = live.count()  # metadata-only after the materialize
    if 0 < lcount <= local_below:
        lt = pa.concat_tables(
            [b for b in live.iter_batches(batch_size=None,
                                          batch_format="pyarrow")])
        if stats is not None:
            stats["local_finish"] = True
        ref = _scc_local_task.remote(
            lt["u"].to_numpy(zero_copy_only=False),
            lt["v"].to_numpy(zero_copy_only=False))
        return ray.data.from_arrow_refs([ref])

    def _nodes_of(e: Dataset) -> Dataset:
        return _sanitize_join_output(
            coarse_aggregate(
                e.map_batches(
                    lambda b: pa.table({"node": pa.concat_arrays(
                        [b["u"].combine_chunks(),
                         b["v"].combine_chunks()])}),
                    batch_format="pyarrow", batch_size=None),
                ["node"], lambda df: df.drop_duplicates(),
                n_coarse=n_coarse),
            pa.schema([("node", pa.int64())]))

    def _propagate(e: Dataset, nodes: Dataset, forward: bool
                   ) -> Dataset:
        # min label over descendants (forward=True) or ancestors;
        # label flows AGAINST reach direction onto the reached node.
        # PLAN-FUSED (round-4 profile: the gate ran 225 s, all fixed
        # plan cost): per round exactly TWO plan executions — the
        # label-onto-edges coarse_join (lbl is the right side
        # DIRECTLY via right_on, no per-round projection
        # materialize) and the min-fold exchange, whose materialize
        # also carries the change count out through a zero-CPU
        # accumulator tap (the fold-in pattern) instead of a third
        # per-round count plan. A retried tap task can only
        # OVER-count changes → at worst one extra round, never a
        # wrong result.
        lbl = _sanitize_join_output(
            nodes.map_batches(
                lambda b: pa.table({"node": b["node"],
                                    "lab": b["node"]}),
                batch_format="pyarrow", batch_size=None),
            pa.schema([("node", pa.int64()), ("lab", pa.int64())]))
        key_from, key_to = ("v", "u") if forward else ("u", "v")
        sink = ray.remote(num_cpus=0)(_SumSink).remote()

        def _fold(df: pd.DataFrame) -> pd.DataFrame:
            g = (df.groupby("node", sort=False)
                 .agg(old=("old", "min"), new=("lab", "min"))
                 .reset_index())
            g["lab"] = g[["old", "new"]].min(axis=1)
            g["chg"] = (g["lab"] < g["old"]).astype(np.int64)
            return g[["node", "lab", "chg"]]

        def _tap(b: pa.Table) -> pa.Table:
            s = pc.sum(b["chg"]).as_py() or 0
            if s:
                ray.get(sink.add.remote(int(s)))
            return b

        try:
            for _ in range(max_rounds):
                moved = coarse_join(e, lbl, on=key_from,
                                    right_on="node", how="inner",
                                    n_coarse=n_coarse)
                # POINTER DOUBLING: lab(x) is a node x reaches (resp.
                # reaching x), so lab(lab(x)) is too — jumping
                # through the current label is sound by transitivity
                # and collapses O(path-to-min) sync rounds to
                # O(log path) (48 → ~7 on the dense gate fixture).
                # The fixpoint is unchanged: at convergence
                # lab(lab(x)) ≥ lab(x) by minimality.
                jumped = coarse_join(
                    lbl, lbl.map_batches(
                        lambda b: pa.table({"n2": b["node"],
                                            "lab2": b["lab"]}),
                        batch_format="pyarrow", batch_size=None),
                    on="lab", right_on="n2", how="inner",
                    n_coarse=n_coarse)
                tagged = lbl.map_batches(
                    lambda b: pa.table({"node": b["node"],
                                        "old": b["lab"],
                                        "lab": b["lab"]}),
                    batch_format="pyarrow", batch_size=None)
                cand2 = moved.map_batches(
                    lambda b, kt=key_to: pa.table({
                        "node": b[kt],
                        "old": pa.array(np.full(b.num_rows, 2**62,
                                                np.int64)),
                        "lab": b["lab"]}),
                    batch_format="pyarrow", batch_size=None)
                cand3 = jumped.map_batches(
                    lambda b: pa.table({
                        "node": b["node"],
                        "old": pa.array(np.full(b.num_rows, 2**62,
                                                np.int64)),
                        "lab": b["lab2"]}),
                    batch_format="pyarrow", batch_size=None)
                lbl = _sanitize_join_output(
                    coarse_aggregate(
                        tagged.union(cand2).union(cand3), ["node"],
                        _fold, n_coarse=n_coarse)
                    .map_batches(_tap, batch_format="pyarrow",
                                 batch_size=None),
                    pa.schema([("node", pa.int64()),
                               ("lab", pa.int64()),
                               ("chg", pa.int64())]))
                if ray.get(sink.take.remote()) == 0:
                    break
            else:
                raise RuntimeError(
                    "strongly_connected_components: propagation did "
                    f"not converge within max_rounds={max_rounds}")
        finally:
            ray.kill(sink)
        return lbl.map_batches(
            lambda b: pa.table({"node": b["node"], "lab": b["lab"]}),
            batch_format="pyarrow", batch_size=None)

    out_parts: list[Dataset] = []
    asg_schema = pa.schema([("node", pa.int64()),
                            ("component", pa.int64())])
    for _peel in range(max_peels):
        if live.count() == 0:
            break
        nodes = _nodes_of(live).materialize()
        # the two directions are independent label systems over the
        # same (materialized) live/nodes inputs — run them
        # CONCURRENTLY so their per-round exchanges overlap (gate
        # profile r5: the sequential pair was ~2x the wall of either;
        # each _propagate drives its own plans + its own sink actor,
        # so there is no shared mutable state between the threads)
        import concurrent.futures as _cf

        with _cf.ThreadPoolExecutor(2) as _ex:
            _ff = _ex.submit(_propagate, live, nodes, True)
            _bf = _ex.submit(_propagate, live, nodes, False)
            fwd, bwd = _ff.result(), _bf.result()
        both = coarse_join(fwd, bwd.map_batches(
            lambda b: pa.table({"n3": b["node"], "lab_b": b["lab"]}),
            batch_format="pyarrow", batch_size=None),
            on="node", right_on="n3", how="inner", n_coarse=n_coarse)
        settled = _sanitize_join_output(
            both.map_batches(
                lambda b: (lambda t: pa.table(
                    {"node": t["node"], "component": t["lab"]}))(
                    b.filter(pc.equal(b["lab"].combine_chunks(),
                                      b["lab_b"].combine_chunks()))),
                batch_format="pyarrow", batch_size=None),
            asg_schema).materialize()
        out_parts.append(settled)
        if stats is not None:
            stats.setdefault("peels", 0)
            stats["peels"] += 1
        # peel: drop edges touching settled nodes on either side
        sett_nodes = settled.map_batches(
            lambda b: pa.table({"n4": b["node"]}),
            batch_format="pyarrow", batch_size=None)
        from omop2obo_ray.pipelines.textpipe import _cast_to
        live = coarse_join(live, sett_nodes, on="u", right_on="n4",
                           how="left_anti", n_coarse=n_coarse)
        live = _cast_to(_sanitize_join_output(
            coarse_join(live, settled.map_batches(
                lambda b: pa.table({"n5": b["node"]}),
                batch_format="pyarrow", batch_size=None),
                on="v", right_on="n5", how="left_anti",
                n_coarse=n_coarse), pair), pair).materialize()
        # nodes whose every edge vanished are singleton SCCs
        remaining = _sanitize_join_output(
            _nodes_of(live).map_batches(
                lambda b: pa.table({"n6": b["node"]}),
                batch_format="pyarrow", batch_size=None),
            pa.schema([("n6", pa.int64())]))
        gone = coarse_join(
            nodes, remaining, on="node", right_on="n6",
            how="left_anti", n_coarse=n_coarse)
        gone = coarse_join(
            _sanitize_join_output(gone, pa.schema(
                [("node", pa.int64())])),
            sett_nodes, on="node", right_on="n4", how="left_anti",
            n_coarse=n_coarse)
        out_parts.append(_sanitize_join_output(
            gone.map_batches(
                lambda b: pa.table({
                    "node": b["node"].combine_chunks()
                    .cast(pa.int64()),
                    "component": b["node"].combine_chunks()
                    .cast(pa.int64())}),
                batch_format="pyarrow", batch_size=None),
            asg_schema))
    else:
        if live.count() > 0:
            raise RuntimeError(
                "strongly_connected_components: live subgraph not "
                f"exhausted within max_peels={max_peels}")

    if not out_parts:  # empty edge set: no SCCs at all
        return ray.data.from_arrow(asg_schema.empty_table())
    out = out_parts[0]
    for p in out_parts[1:]:
        out = out.union(p)
    return _sanitize_join_output(out, asg_schema)


def quotient_graph(edges: Dataset, assign: Dataset, *,
                   src: str = "src", dst: str = "dst",
                   node_col: str = "node",
                   comm_col: str = "community",
                   n_coarse: int | None = None) -> Dataset:
    """Community supergraph (graph summarization / KG rollup) →
    (ca, cb, n_edges): canonical undirected edges mapped onto their
    endpoints' communities, counted per unordered community pair.
    Intra-community rows (ca == cb) carry the internal-edge counts —
    the zoomed-out graph a 10¹¹-node web graph becomes after
    :func:`label_propagation` / CC, small enough to analyze directly.

    Scale shape: canonical dedup → TWO slim community-attach
    ``coarse_join``s → in-map pair canonicalization → ONE pair-keyed
    coarse count. Edges with an unassigned endpoint drop via the
    inner joins (same contract as :func:`partition_quality`)."""
    from omop2obo_ray.functions.shuffle import coarse_join

    def _canon(df: pd.DataFrame) -> pd.DataFrame:
        a = df[src].astype(str)
        b = df[dst].astype(str)
        lo = a.where(a <= b, b)
        hi = b.where(a <= b, a)
        out = pd.DataFrame({"a": lo, "b": hi})
        return out[out["a"] != out["b"]].drop_duplicates()

    e = _sanitize_join_output(
        coarse_aggregate(
            edges.map_batches(_canon, batch_format="pandas",
                              batch_size=None),
            ["a", "b"], lambda df: df.drop_duplicates(),
            n_coarse=n_coarse),
        pa.schema([("a", pa.string()), ("b", pa.string())]))

    asg = assign.map_batches(
        lambda b: pa.table({
            "n2": pc.cast(b[node_col].combine_chunks(), pa.string()),
            "_c": pc.cast(b[comm_col].combine_chunks(),
                          pa.string())}),
        batch_format="pyarrow", batch_size=None)

    wa = coarse_join(e, asg.map_batches(
        lambda b: pa.table({"n2": b["n2"], "ca": b["_c"]}),
        batch_format="pyarrow", batch_size=None),
        on="a", right_on="n2", how="inner", n_coarse=n_coarse)
    wb = coarse_join(wa, asg.map_batches(
        lambda b: pa.table({"n3": b["n2"], "cb": b["_c"]}),
        batch_format="pyarrow", batch_size=None),
        on="b", right_on="n3", how="inner", n_coarse=n_coarse)

    def _pairs(df: pd.DataFrame) -> pd.DataFrame:
        lo = df["ca"].where(df["ca"] <= df["cb"], df["cb"])
        hi = df["cb"].where(df["ca"] <= df["cb"], df["ca"])
        return pd.DataFrame({"ca": lo, "cb": hi})

    return _sanitize_join_output(
        coarse_aggregate(
            wb.map_batches(_pairs, batch_format="pandas",
                           batch_size=None),
            ["ca", "cb"],
            lambda df: df.groupby(["ca", "cb"], sort=False).size()
            .rename("n_edges").reset_index(), n_coarse=n_coarse),
        pa.schema([("ca", pa.string()), ("cb", pa.string()),
                   ("n_edges", pa.int64())]))


def cc_incremental(assign: Dataset, new_edges: Dataset, *,
                   node_col: str = "node",
                   comp_col: str = "component",
                   src: str = "src", dst: str = "dst",
                   n_coarse: int | None = None) -> Dataset:
    """Incremental connected components (crawl-refresh KG
    maintenance) → updated (node, component) after new edges arrive:
    instead of re-running CC over all 10¹² edges, lift the NEW edges
    onto the existing component ids (unseen endpoints act as their
    own singleton component), run alternating-star CC over that
    COMPONENT-level graph — bounded by the new batch, not the
    corpus — and remap the full assignment through the resulting
    supercomponent table with one join. Component ids stay "min
    member id", so the result is IDENTICAL to recomputing CC over
    old ∪ new edges whenever ``assign`` came from this family's CC
    operators (pytest-pinned).

    Scale shape: two slim comp-attach ``coarse_join``s on the new
    edges + the CC rounds on the (small) component graph + ONE
    left-outer remap join over the assignment; the full edge set is
    never touched."""
    from omop2obo_ray.functions.shuffle import coarse_join

    asg_schema = pa.schema([("node", pa.int64()),
                            ("component", pa.int64())])
    asg = _sanitize_join_output(
        coarse_aggregate(
            assign.map_batches(
                lambda b: pa.table({
                    "node": b[node_col].combine_chunks()
                    .cast(pa.int64()),
                    "component": b[comp_col].combine_chunks()
                    .cast(pa.int64())}),
                batch_format="pyarrow", batch_size=None),
            ["node", "component"], lambda df: df.drop_duplicates(),
            n_coarse=n_coarse), asg_schema).materialize()

    e = new_edges.map_batches(
        lambda b: pa.table({
            "u": b[src].combine_chunks().cast(pa.int64()),
            "v": b[dst].combine_chunks().cast(pa.int64())}),
        batch_format="pyarrow", batch_size=None)

    # lift endpoints onto existing comp ids (unseen → own id)
    wa = coarse_join(e, asg.map_batches(
        lambda b: pa.table({"n2": b["node"], "cu": b["component"]}),
        batch_format="pyarrow", batch_size=None),
        on="u", right_on="n2", how="left_outer", n_coarse=n_coarse)
    wb = coarse_join(wa, asg.map_batches(
        lambda b: pa.table({"n3": b["node"], "cv": b["component"]}),
        batch_format="pyarrow", batch_size=None),
        on="v", right_on="n3", how="left_outer", n_coarse=n_coarse)

    def _lift(df: pd.DataFrame) -> pd.DataFrame:
        cu = df["cu"].fillna(df["u"]).astype(np.int64)
        cv = df["cv"].fillna(df["v"]).astype(np.int64)
        return pd.DataFrame({"src": cu, "dst": cv})

    comp_edges = wb.map_batches(_lift, batch_format="pandas",
                                batch_size=None)
    sup = _sanitize_join_output(
        connected_components_alternating(comp_edges,
                                         n_coarse=n_coarse),
        pa.schema([("node", pa.int64()),
                   ("component", pa.int64())])).materialize()

    # remap the full assignment + any brand-new nodes
    new_nodes = _sanitize_join_output(
        coarse_aggregate(
            wb.map_batches(_lift, batch_format="pandas",
                           batch_size=None).map_batches(
                lambda b: pa.table({"m": pa.concat_arrays(
                    [b["src"].combine_chunks(),
                     b["dst"].combine_chunks()])}),
                batch_format="pyarrow", batch_size=None),
            ["m"], lambda df: df.drop_duplicates(),
            n_coarse=n_coarse),
        pa.schema([("m", pa.int64())]))
    # brand-new nodes appear in the lifted edges as their own comp id;
    # rows already covered by assign are dropped by the anti-join
    extra = coarse_join(
        new_nodes, asg.map_batches(
            lambda b: pa.table({"n4": b["node"]}),
            batch_format="pyarrow", batch_size=None),
        on="m", right_on="n4", how="left_anti", n_coarse=n_coarse) \
        .map_batches(
        lambda b: pa.table({"node": b["m"].combine_chunks()
                            .cast(pa.int64()),
                            "component": b["m"].combine_chunks()
                            .cast(pa.int64())}),
        batch_format="pyarrow", batch_size=None)

    full = _sanitize_join_output(asg.union(
        _sanitize_join_output(extra, asg_schema)), asg_schema)

    out = coarse_join(full, sup.map_batches(
        lambda b: pa.table({"c2": b["node"], "sc": b["component"]}),
        batch_format="pyarrow", batch_size=None),
        on="component", right_on="c2", how="left_outer",
        n_coarse=n_coarse)

    def _fin(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({
            "node": df["node"].astype(np.int64),
            "component": df["sc"].fillna(df["component"])
            .astype(np.int64)})

    return out.map_batches(_fin, batch_format="pandas",
                           batch_size=None)


def kge_negative_samples(triples: Dataset, k: int = 2, *,
                         s_col: str = "s", p_col: str = "p",
                         o_col: str = "o",
                         n_coarse: int | None = None) -> Dataset:
    """Deterministic negative sampling for knowledge-graph-embedding
    training (TransE/DistMult corrupted triples, Bordes 2013) → for
    each distinct int64 triple (s, p, o) and j = 0..k−1 one corrupted
    row (s, p, o, j, side, neg_s, neg_o): a pinned modular hash of
    (s, p, o, j) decides head-vs-tail corruption and selects the
    replacement UNIFORMLY by global entity rank — reproducible,
    resumable, and exactly SQL-replayable (the same arithmetic the
    `mis` / `random_walks` gates pin). Degenerate draws (replacement
    == original, or accidentally-true triples) are NOT filtered —
    standard unfiltered sampling; callers wanting Bordes' "filtered"
    setting anti-join the output against the triple set.

    Scale shape: distinct entities via one coarse dedup → ONE
    distributed sort + zero-copy per-block offset attach (the
    `sorted_neighborhood_pairs` pattern; driver state = #blocks row
    counts) → the k-way fan-out computes want_rank in-map → ONE
    rank-keyed ``coarse_join`` fetches replacements → in-map
    composition. Entity count E is the one driver scalar."""
    from omop2obo_ray.functions.shuffle import coarse_join

    M = 1000000007

    tri = _sanitize_join_output(
        coarse_aggregate(
            triples.map_batches(
                lambda b: pa.table({
                    "s": b[s_col].combine_chunks().cast(pa.int64()),
                    "p": b[p_col].combine_chunks().cast(pa.int64()),
                    "o": b[o_col].combine_chunks().cast(pa.int64())}),
                batch_format="pyarrow", batch_size=None),
            ["s", "p", "o"], lambda df: df.drop_duplicates(),
            n_coarse=n_coarse),
        pa.schema([("s", pa.int64()), ("p", pa.int64()),
                   ("o", pa.int64())])).materialize()

    ents = _sanitize_join_output(
        coarse_aggregate(
            tri.map_batches(
                lambda b: pa.table({"ent": pa.concat_arrays(
                    [b["s"].combine_chunks(),
                     b["o"].combine_chunks()])}),
                batch_format="pyarrow", batch_size=None),
            ["ent"], lambda df: df.drop_duplicates(),
            n_coarse=n_coarse),
        pa.schema([("ent", pa.int64())]))

    srt = ents.sort("ent").materialize()
    refs, counts = [], []
    for bu in srt.iter_internal_ref_bundles():
        for ref, meta in bu.blocks:
            refs.append(ref)
            counts.append(meta.num_rows)
    E = int(sum(counts))
    if E == 0:
        return ray.data.from_arrow(pa.schema(
            [("s", pa.int64()), ("p", pa.int64()), ("o", pa.int64()),
             ("j", pa.int64()), ("side", pa.string()),
             ("neg_s", pa.int64()),
             ("neg_o", pa.int64())]).empty_table())

    @ray.remote
    def _add_rank(block, offset: int):
        import pyarrow as _pa
        if isinstance(block, pd.DataFrame):
            block = _pa.Table.from_pandas(block, preserve_index=False)
        n = block.num_rows
        return _pa.table({
            "rank": _pa.array(np.arange(offset, offset + n,
                                        dtype=np.int64)),
            "ent": block["ent"].combine_chunks().cast(_pa.int64())})

    off, rrefs = 0, []
    for ref, c in zip(refs, counts):
        if c:
            rrefs.append(_add_rank.remote(ref, off))
            off += c
    ranks = ray.data.from_arrow_refs(rrefs)

    def _fan(b: pa.Table) -> pa.Table:
        s = b["s"].to_numpy(zero_copy_only=False)
        p = b["p"].to_numpy(zero_copy_only=False)
        o = b["o"].to_numpy(zero_copy_only=False)
        n = len(s)
        s = np.repeat(s, k)
        p = np.repeat(p, k)
        o = np.repeat(o, k)
        j = np.tile(np.arange(k, dtype=np.int64), n)
        key = ((((s % M) * 1000003 + p % M) % M) * 1000003
               + o % M) % M
        kj = (key + j * 7919) % M
        head = (kj * 30011 + 17) % M % 2
        want = (kj * 48271 + 11) % M % E
        return pa.table({
            "s": pa.array(s, pa.int64()), "p": pa.array(p, pa.int64()),
            "o": pa.array(o, pa.int64()), "j": pa.array(j, pa.int64()),
            "head": pa.array(head, pa.int64()),
            "want_rank": pa.array(want, pa.int64())})

    fan = tri.map_batches(_fan, batch_format="pyarrow",
                          batch_size=None)
    joined = coarse_join(fan, ranks.map_batches(
        lambda b: pa.table({"r2": b["rank"], "repl": b["ent"]}),
        batch_format="pyarrow", batch_size=None),
        on="want_rank", right_on="r2", how="inner", n_coarse=n_coarse)

    def _compose(b: pa.Table) -> pa.Table:
        head = b["head"].to_numpy(zero_copy_only=False).astype(bool)
        s = b["s"].to_numpy(zero_copy_only=False)
        o = b["o"].to_numpy(zero_copy_only=False)
        repl = b["repl"].to_numpy(zero_copy_only=False)
        return pa.table({
            "s": b["s"], "p": b["p"], "o": b["o"], "j": b["j"],
            "side": pa.array(np.where(head, "head", "tail")),
            "neg_s": pa.array(np.where(head, repl, s), pa.int64()),
            "neg_o": pa.array(np.where(head, o, repl), pa.int64())})

    return joined.map_batches(_compose, batch_format="pyarrow",
                              batch_size=None)


def neighbor_sample(edges: Dataset, fanouts: list[int], *,
                    src: str = "src", dst: str = "dst",
                    seeds: Dataset | None = None,
                    n_coarse: int | None = None) -> Dataset:
    """Deterministic k-hop neighbor sampling (GraphSAGE / GNN
    minibatch fan-in, Hamilton 2017) → DISTINCT (seed, hop, node):
    hop 0 is the seed itself; hop h holds the ≤ ``fanouts[h-1]``
    out-neighbors sampled per hop-(h−1) node. Selection is a pinned
    modular hash order per source (ties by dst) — reproducible,
    resumable, and exactly replayable as a ROW_NUMBER in SQL, like
    :func:`kge_negative_samples` / `random_walks`.

    Scale shape: ONE src-keyed exchange ranks every adjacency list
    once (rank < max(fanouts) kept — the sampled adjacency is built
    once and reused by every hop); per hop ONE ``coarse_join`` of
    the frontier onto it plus ONE (seed, node) dedup exchange. No
    driver state. ``seeds=None`` seeds every distinct source node."""
    from omop2obo_ray.functions.shuffle import coarse_join

    M = 1000000007
    maxf = max(fanouts)

    e = _sanitize_join_output(
        coarse_aggregate(
            edges.map_batches(
                lambda b: pa.table({
                    "s": b[src].combine_chunks().cast(pa.int64()),
                    "d": b[dst].combine_chunks().cast(pa.int64())}),
                batch_format="pyarrow", batch_size=None),
            ["s", "d"], lambda df: df.drop_duplicates(),
            n_coarse=n_coarse),
        pa.schema([("s", pa.int64()), ("d", pa.int64())]))

    def _rank(df: pd.DataFrame) -> pd.DataFrame:
        h = ((df["d"] % M) * 48271 + (df["s"] % M) * 30011) % M
        df = df.assign(_h=h).sort_values(["s", "_h", "d"],
                                         kind="mergesort")
        df["rk"] = df.groupby("s", sort=False).cumcount()
        return df[df["rk"] < maxf][["s", "d", "rk"]]

    ranked = _sanitize_join_output(
        coarse_aggregate(e, ["s"], _rank, n_coarse=n_coarse),
        pa.schema([("s", pa.int64()), ("d", pa.int64()),
                   ("rk", pa.int64())])).materialize()

    if seeds is None:
        seed_ds = _sanitize_join_output(
            coarse_aggregate(
                e.map_batches(
                    lambda b: pa.table({"seed": b["s"]}),
                    batch_format="pyarrow", batch_size=None),
                ["seed"], lambda df: df.drop_duplicates(),
                n_coarse=n_coarse),
            pa.schema([("seed", pa.int64())]))
    else:
        seed_ds = seeds.map_batches(
            lambda b: pa.table({
                "seed": b[b.column_names[0]].combine_chunks()
                .cast(pa.int64())}),
            batch_format="pyarrow", batch_size=None)

    out_schema = pa.schema([("seed", pa.int64()), ("hop", pa.int64()),
                            ("node", pa.int64())])
    frontier = _sanitize_join_output(
        seed_ds.map_batches(
            lambda b: pa.table({"seed": b["seed"],
                                "node": b["seed"]}),
            batch_format="pyarrow", batch_size=None),
        pa.schema([("seed", pa.int64()), ("node", pa.int64())]))
    if frontier.count() == 0:
        return ray.data.from_arrow(out_schema.empty_table())
    parts = [frontier.map_batches(
        lambda b: pa.table({"seed": b["seed"],
                            "hop": pa.array([0] * b.num_rows,
                                            pa.int64()),
                            "node": b["node"]}),
        batch_format="pyarrow", batch_size=None)]

    for hop, f in enumerate(fanouts, 1):
        adj = _sanitize_join_output(ranked.map_batches(
            lambda b, f_=f: pa.table({
                "s2": b["s"].combine_chunks(),
                "d": b["d"].combine_chunks()}).filter(
                pc.less(b["rk"].combine_chunks(), f_)),
            batch_format="pyarrow", batch_size=None),
            pa.schema([("s2", pa.int64()), ("d", pa.int64())]))
        nxt = coarse_join(frontier, adj, on="node", right_on="s2",
                          how="inner", n_coarse=n_coarse)
        frontier = _sanitize_join_output(
            coarse_aggregate(
                nxt.map_batches(
                    lambda b: pa.table({"seed": b["seed"],
                                        "node": b["d"]}),
                    batch_format="pyarrow", batch_size=None),
                ["seed", "node"], lambda df: df.drop_duplicates(),
                n_coarse=n_coarse),
            pa.schema([("seed", pa.int64()), ("node", pa.int64())]))
        parts.append(frontier.map_batches(
            lambda b, h_=hop: pa.table({
                "seed": b["seed"],
                "hop": pa.array([h_] * b.num_rows, pa.int64()),
                "node": b["node"]}),
            batch_format="pyarrow", batch_size=None))

    out = parts[0]
    for p in parts[1:]:
        out = out.union(p)
    return _sanitize_join_output(out, out_schema)


def _pair_common_anc_stat(closure: Dataset, pairs: list,
                          stat: Dataset, stat_col: str, agg: str,
                          out_col: str,
                          n_coarse: int | None = None) -> Dataset:
    """Per-pair aggregate of a per-node statistic over the COMMON
    ancestors of each query pair → (qa, qb, <out_col>). ``closure``
    is (node, anc); ``stat`` is (node, <stat_col>) int64. The closure
    is filtered to the broadcast query-id sets on both sides, the two
    sides meet in one anc-keyed ``coarse_join``, non-requested pair
    combinations drop in-map, the stat attaches via one more join,
    and the pair aggregate is one coarse exchange. Pairs with no
    common ancestor (or absent endpoints) are absent from the output.
    Pair ids must fit in int32 halves (packed (a<<32)|b filter)."""
    from omop2obo_ray.functions.shuffle import coarse_join

    for a, b in pairs:
        if not (0 <= int(a) < 2**32 and 0 <= int(b) < 2**32):
            raise ValueError(
                "_pair_common_anc_stat: pair endpoints must fit in "
                f"[0, 2^32) for the packed (a<<32)|b filter, got "
                f"({a}, {b})")
    qa_ids = sorted({int(a) for a, _ in pairs})
    qb_ids = sorted({int(b) for _, b in pairs})
    pair_keys = {(int(a) << 32) | int(b) for a, b in pairs}

    def _side(ids, col):
        idset = np.array(ids, np.int64)

        def fn(b: pa.Table) -> pa.Table:
            node = b["node"].combine_chunks()
            keep = pc.is_in(node, value_set=pa.array(idset, pa.int64()))
            t = b.filter(keep)
            return pa.table({col: t["node"], "anc": t["anc"]})
        return fn

    ja = closure.map_batches(_side(qa_ids, "qa"),
                             batch_format="pyarrow", batch_size=None)
    jb = closure.map_batches(_side(qb_ids, "qb"),
                             batch_format="pyarrow", batch_size=None)
    crossed = coarse_join(ja, jb, on="anc", how="inner",
                          n_coarse=n_coarse)

    pk_arr = pa.array(sorted(pair_keys), pa.int64())

    def _pair_filter(b: pa.Table) -> pa.Table:
        qa = b["qa"].combine_chunks().to_numpy(zero_copy_only=False)
        qb = b["qb"].combine_chunks().to_numpy(zero_copy_only=False)
        key = pa.array((qa.astype(np.int64) << 32) | qb, pa.int64())
        return b.filter(pc.is_in(key, value_set=pk_arr))

    wanted = crossed.map_batches(_pair_filter, batch_format="pyarrow",
                                 batch_size=None)
    withs = coarse_join(wanted, stat.map_batches(
        lambda b: pa.table({"n2": b["node"], "_sv": b[stat_col]}),
        batch_format="pyarrow", batch_size=None),
        on="anc", right_on="n2", n_coarse=n_coarse)

    def _fold(df: pd.DataFrame) -> pd.DataFrame:
        return (df.groupby(["qa", "qb"], sort=False)["_sv"].agg(agg)
                .rename(out_col).reset_index())

    return _sanitize_join_output(
        coarse_aggregate(withs, ["qa", "qb"], _fold,
                         n_coarse=n_coarse),
        pa.schema([("qa", pa.int64()), ("qb", pa.int64()),
                   (out_col, pa.int64())]))


def _query_stat_lookup(stat: Dataset, stat_col: str,
                       pairs: list) -> dict:
    """Driver dict {query_id: stat} for the requested pair endpoints
    only — bounded by the QUERY set, never the graph."""
    ids = sorted({int(x) for p in pairs for x in p})
    qset = pa.array(ids, pa.int64())
    qd = stat.map_batches(
        lambda b: b.filter(pc.is_in(b["node"].combine_chunks(),
                                    value_set=qset)),
        batch_format="pyarrow", batch_size=None).to_pandas()
    return dict(zip(qd["node"], qd[stat_col]))


def transitive_reduction(edges: Dataset, *, child: str = "child",
                         parent: str = "parent", max_rounds: int = 64,
                         n_coarse: int | None = None) -> Dataset:
    """Transitive reduction of a child→parent DAG → the minimal edge
    set (child, parent) with the same reachability — asserted-edge
    cleanup for ontology subsumption hierarchies (OBO files routinely
    assert derivable is_a shortcuts; the reference consumes hierarchies
    already reduced upstream). An edge (c, p) is redundant iff p is a
    PROPER ancestor of some other parent q of c (then c→q→…→p
    re-derives it).

    Scale shape: dedup edges → distributed ancestor closure → ONE
    ``coarse_join`` of edges (keyed parent) onto the closure to fan
    out each edge's re-derivable targets → tagged union with the
    original edges → ONE (c, p)-keyed coarse aggregate keeping rows
    that are asserted (tag 0 present) and not re-derived (no tag 1).
    No driver state; no multi-column anti-join (the marker aggregate
    replaces it exactly for arbitrary int64 ids)."""
    def _slim(b: pa.Table) -> pa.Table:
        return pa.table({
            "c": b[child].combine_chunks().cast(pa.int64()),
            "p": b[parent].combine_chunks().cast(pa.int64())})

    edge_schema = pa.schema([("c", pa.int64()), ("p", pa.int64())])
    e = _sanitize_join_output(
        coarse_aggregate(
            edges.map_batches(_slim, batch_format="pyarrow",
                              batch_size=None),
            ["c", "p"], lambda df: df.drop_duplicates(),
            n_coarse=n_coarse), edge_schema)

    closure = ancestor_closure_distributed(
        e, child="c", parent="p", include_self=True,
        max_rounds=max_rounds, n_coarse=n_coarse)

    from omop2obo_ray.functions.shuffle import coarse_join

    # fan out: for each asserted edge c→q, every PROPER ancestor of q
    # is re-derivable from c
    fan = coarse_join(
        e.map_batches(lambda b: pa.table({"c": b["c"], "q": b["p"]}),
                      batch_format="pyarrow", batch_size=None),
        closure.map_batches(
            lambda b: pa.table({"n2": b["node"], "anc": b["anc"]}),
            batch_format="pyarrow", batch_size=None),
        on="q", right_on="n2", how="inner", n_coarse=n_coarse)

    def _red(b: pa.Table) -> pa.Table:
        q = b["q"].combine_chunks()
        anc = b["anc"].combine_chunks()
        t = b.filter(pc.not_equal(anc, q))
        return pa.table({"c": t["c"], "p": t["anc"],
                         "tag": pa.array([1] * t.num_rows, pa.int8())})

    red = fan.map_batches(_red, batch_format="pyarrow",
                          batch_size=None)
    asserted = e.map_batches(
        lambda b: pa.table({"c": b["c"], "p": b["p"],
                            "tag": pa.array([0] * b.num_rows,
                                            pa.int8())}),
        batch_format="pyarrow", batch_size=None)

    def _keep(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby(["c", "p"], sort=False)["tag"].agg(["min",
                                                           "max"])
        g = g[(g["min"] == 0) & (g["max"] == 0)]
        return g.reset_index()[["c", "p"]]

    return _sanitize_join_output(
        coarse_aggregate(asserted.union(red), ["c", "p"], _keep,
                         n_coarse=n_coarse),
        pa.schema([("c", pa.int64()), ("p", pa.int64())]))


def wu_palmer(edges: Dataset, pairs: list, *, child: str = "child",
              parent: str = "parent", max_rounds: int = 64,
              n_coarse: int | None = None) -> Dataset:
    """Wu-Palmer semantic similarity for the given concept pairs over
    a child→parent DAG → (qa, qb, lca_depth, sim):
    sim = 2·depth(LCA) / (depth(a) + depth(b)), depth = ancestor
    count INCLUDING self (root = 1) and LCA depth = the maximum depth
    among common ancestors — the reference's similarity tier uses
    string TF-IDF; this is the structural tier any ontology-backed KG
    adds on top (Wu & Palmer 1994 / Resnik's depth convention).
    Pairs with no common ancestor are absent from the output.

    Scale shape: distributed ancestor closure (above) → depths as a
    per-node coarse COUNT of that closure (integer-exact, no float
    anywhere until the final division) → the closure filtered to the
    query nodes (broadcast query-sized id set) → one anc-keyed
    ``coarse_join`` between the two query sides → pair filter → one
    depth-attach join → per-pair coarse max. Driver state is bounded
    by the QUERY set (the final depth lookup for the requested ids),
    never by the graph."""
    from omop2obo_ray.functions.shuffle import coarse_join

    closure = ancestor_closure_distributed(
        edges, child=child, parent=parent, include_self=True,
        max_rounds=max_rounds, n_coarse=n_coarse)

    depth = _sanitize_join_output(
        coarse_aggregate(
            closure, ["node"],
            lambda df: df.groupby("node", sort=False).size()
            .rename("d").reset_index(), n_coarse=n_coarse),
        pa.schema([("node", pa.int64()), ("d", pa.int64())]))

    lca = _pair_common_anc_stat(closure, pairs, depth, "d",
                                "max", "lca_depth", n_coarse=n_coarse)
    dmap = _query_stat_lookup(depth, "d", pairs)
    dref = ray.put(dmap)

    def _sim(b: pa.Table) -> pa.Table:
        dm = ray.get(dref)
        qa = b["qa"].combine_chunks().to_numpy(zero_copy_only=False)
        qb = b["qb"].combine_chunks().to_numpy(zero_copy_only=False)
        dl = b["lca_depth"].combine_chunks().to_numpy(
            zero_copy_only=False)
        da = np.array([dm[int(x)] for x in qa], np.int64)
        db = np.array([dm[int(x)] for x in qb], np.int64)
        return pa.table({
            "qa": b["qa"], "qb": b["qb"],
            "lca_depth": b["lca_depth"],
            "sim": pa.array(2.0 * dl / (da + db), pa.float64())})

    return lca.map_batches(_sim, batch_format="pyarrow",
                           batch_size=None)


def resnik_lin(edges: Dataset, counts: Dataset, pairs: list, *,
               child: str = "child", parent: str = "parent",
               concept_col: str = "concept", count_col: str = "n",
               max_rounds: int = 64,
               n_coarse: int | None = None) -> Dataset:
    """Information-content semantic similarity (Resnik 1995 /
    Lin 1998) for the given concept pairs over a child→parent DAG
    plus a corpus annotation-count table → (qa, qb, min_freq,
    resnik, lin). IC(c) = -ln(freq_desc(c)/N) with freq_desc(c) =
    Σ counts over descendants-of-c INCLUDING c and N = Σ counts of
    annotated concepts present in the graph; resnik = IC of the
    most-informative common ancestor; lin = 2·resnik/(IC(a)+IC(b)).
    The reference's similarity tier is string TF-IDF
    (`omop2obo/string_similarity.py`); IC similarity is the
    corpus-statistics tier an annotated ontology KG adds on top.

    Exactness shape: IC is strictly decreasing in freq_desc, so the
    most-informative common ancestor is the one with MINIMUM
    freq_desc — the whole pipeline aggregates exact int64 counts
    (closure join + one anc-keyed sum; per-pair coarse MIN) and
    floats appear only in the final single-rounding map (one ln per
    value), so an oracle replaying the same expressions matches to
    the last ulp-stable quantizer. Concepts with zero annotated
    descendants have undefined IC and drop (inner joins — same as
    the SQL oracle's). Driver state: query-sized freq lookup + the
    scalar N."""
    from omop2obo_ray.functions.shuffle import coarse_join

    closure = ancestor_closure_distributed(
        edges, child=child, parent=parent, include_self=True,
        max_rounds=max_rounds, n_coarse=n_coarse)

    cnt_schema = pa.schema([("node", pa.int64()), ("c", pa.int64())])
    cnt = _sanitize_join_output(
        coarse_aggregate(
            counts.map_batches(
                lambda b: pa.table({
                    "node": b[concept_col].combine_chunks()
                    .cast(pa.int64()),
                    "c": b[count_col].combine_chunks()
                    .cast(pa.int64())}),
                batch_format="pyarrow", batch_size=None),
            ["node"],
            lambda df: df.groupby("node", sort=False)["c"].sum()
            .reset_index(), n_coarse=n_coarse), cnt_schema)

    # freq_desc: annotation counts roll up every ancestor via the
    # closure — one join + one anc-keyed sum, all int64-exact
    joined = coarse_join(
        closure, cnt.map_batches(
            lambda b: pa.table({"n2": b["node"], "c": b["c"]}),
            batch_format="pyarrow", batch_size=None),
        on="node", right_on="n2", how="inner", n_coarse=n_coarse)
    freq = _sanitize_join_output(
        coarse_aggregate(
            joined.map_batches(
                lambda b: pa.table({"node": b["anc"], "c": b["c"]}),
                batch_format="pyarrow", batch_size=None),
            ["node"],
            lambda df: df.groupby("node", sort=False)["c"].sum()
            .rename("f").reset_index(), n_coarse=n_coarse),
        pa.schema([("node", pa.int64()), ("f", pa.int64())]))

    # N = Σ counts of annotated concepts that exist in the graph —
    # exactly the self-rows' contribution, i.e. Σ over cnt∩nodes
    in_graph = coarse_join(
        cnt, closure.map_batches(
            lambda b: pa.table({"n2": b["node"]}),
            batch_format="pyarrow", batch_size=None),
        on="node", right_on="n2", how="left_semi", n_coarse=n_coarse)
    total = int(in_graph.map_batches(
        lambda b: pa.table({"s": pa.array(
            [pc.sum(b["c"]).as_py() or 0], pa.int64())}),
        batch_format="pyarrow", batch_size=None).to_pandas()["s"]
        .sum())

    mif = _pair_common_anc_stat(closure, pairs, freq, "f", "min",
                                "min_freq", n_coarse=n_coarse)
    fmap = _query_stat_lookup(freq, "f", pairs)
    fref = ray.put(fmap)

    def _sim(b: pa.Table) -> pa.Table:
        fm = ray.get(fref)
        # an endpoint with zero annotated descendants has undefined
        # IC — its pairs drop (it is absent from the freq table even
        # when its ANCESTORS are annotated)
        keep = pa.array([int(x) in fm and int(y) in fm
                         for x, y in zip(b["qa"].to_pylist(),
                                         b["qb"].to_pylist())])
        b = b.filter(keep)
        qa = b["qa"].combine_chunks().to_numpy(zero_copy_only=False)
        qb = b["qb"].combine_chunks().to_numpy(zero_copy_only=False)
        mf = b["min_freq"].combine_chunks().to_numpy(
            zero_copy_only=False)
        fa = np.array([fm[int(x)] for x in qa], np.int64)
        fb = np.array([fm[int(x)] for x in qb], np.int64)
        resnik = np.log(float(total) / mf)
        ica = np.log(float(total) / fa)
        icb = np.log(float(total) / fb)
        denom = ica + icb
        lin = np.where(denom > 0.0, 2.0 * resnik / denom, 1.0)
        return pa.table({
            "qa": b["qa"], "qb": b["qb"],
            "min_freq": b["min_freq"],
            "resnik": pa.array(resnik, pa.float64()),
            "lin": pa.array(lin, pa.float64())})

    return mif.map_batches(_sim, batch_format="pyarrow",
                           batch_size=None)


# ---------------------------------------------------------------------------
# Katz centrality (attenuated walk counting) — exact-integer variant
# ---------------------------------------------------------------------------

def katz_centrality(edges: Dataset, *, src: str = "src",
                    dst: str = "dst", beta_inv: int = 8,
                    rounds: int = 4,
                    n_coarse: int | None = None) -> Dataset:
    """Truncated Katz centrality → (node, katz_num, katz):
    katz(v) = Σ_{k=0..rounds} β^k · walks_k(v) with β = 1/beta_inv,
    where walks_k(v) counts directed length-k walks ENDING at v from
    any node — the attenuated-influence score between degree (k=1)
    and eigenvector centrality (k→∞; Katz'53). The truncation is a
    well-defined operator (the SQL gate unrolls the same k), and
    ``katz_num = katz · beta_inv^rounds`` is an exact int64 — every
    aggregation is integer, the ONLY float op is the final division
    (the IC/LCA exactness pattern, NOTES_r3). Walk counts grow like
    avg_deg^k: int64 overflow bounds rounds·log(avg_deg) ≲ 63·ln 2,
    the practical regime for the short horizons Katz is used at.

    Scale shape: per round ONE ``coarse_join`` (walk counts onto
    their out-edges, keyed src) + ONE dst-keyed coarse sum — the
    pagerank exchange shape, task-based, no per-plan actor pools.
    Per-round term tables accumulate WITHOUT an acc exchange: the
    rounds+1 scaled term tables union into ONE final node-keyed sum.
    """
    from omop2obo_ray.functions.shuffle import (coarse_aggregate,
                                                coarse_join)

    if rounds < 1:
        raise ValueError("katz_centrality: rounds must be >= 1")
    if n_coarse is None:
        cpus = (int(ray.cluster_resources().get("CPU", 8))
                if ray.is_initialized() else 8)
        n_coarse = max(32, 3 * cpus)

    pair = pa.schema([("u", pa.int64()), ("v", pa.int64())])
    e = _sanitize_join_output(
        coarse_aggregate(
            edges.map_batches(
                lambda b: pa.table({
                    "u": b[src].combine_chunks().cast(pa.int64()),
                    "v": b[dst].combine_chunks().cast(pa.int64())}),
                batch_format="pyarrow", batch_size=None),
            ["u", "v"], lambda df: df.drop_duplicates(),
            n_coarse=n_coarse), pair).materialize()

    nodes = _sanitize_join_output(
        coarse_aggregate(
            e.map_batches(
                lambda b: pa.table({"node": pa.concat_arrays(
                    [b["u"].combine_chunks(),
                     b["v"].combine_chunks()])}),
                batch_format="pyarrow", batch_size=None),
            ["node"], lambda df: df.drop_duplicates(),
            n_coarse=n_coarse),
        pa.schema([("node", pa.int64())])).materialize()

    pk_schema = pa.schema([("node", pa.int64()), ("pk", pa.int64())])
    scale0 = beta_inv ** rounds
    terms = [nodes.map_batches(
        lambda b, s=scale0: pa.table({
            "node": b["node"],
            "term": pa.array(np.full(b.num_rows, s, np.int64))}),
        batch_format="pyarrow", batch_size=None)]

    p = nodes.map_batches(
        lambda b: pa.table({
            "node": b["node"],
            "pk": pa.array(np.ones(b.num_rows, np.int64))}),
        batch_format="pyarrow", batch_size=None).materialize()

    for k in range(1, rounds + 1):
        moved = coarse_join(p, e, on="node", right_on="u",
                            how="inner", n_coarse=n_coarse)
        p = _sanitize_join_output(
            coarse_aggregate(
                moved.map_batches(
                    lambda b: pa.table({"node": b["v"],
                                        "pk": b["pk"]}),
                    batch_format="pyarrow", batch_size=None),
                ["node"],
                lambda df: df.groupby("node", sort=False)["pk"].sum()
                .reset_index(), n_coarse=n_coarse),
            pk_schema).materialize()
        s = beta_inv ** (rounds - k)
        terms.append(p.map_batches(
            lambda b, s=s: pa.table({
                "node": b["node"],
                "term": pc.multiply_checked(
                    b["pk"].combine_chunks(),
                    pa.scalar(s, pa.int64()))}),
            batch_format="pyarrow", batch_size=None))

    allt = terms[0]
    for t in terms[1:]:
        allt = allt.union(t)
    acc = _sanitize_join_output(
        coarse_aggregate(
            allt, ["node"],
            lambda df: df.groupby("node", sort=False)["term"].sum()
            .rename("katz_num").reset_index(), n_coarse=n_coarse),
        pa.schema([("node", pa.int64()), ("katz_num", pa.int64())]))
    denom = float(scale0)
    return acc.map_batches(
        lambda b: pa.table({
            "node": b["node"], "katz_num": b["katz_num"],
            "katz": pc.divide(
                b["katz_num"].combine_chunks().cast(pa.float64()),
                pa.scalar(denom, pa.float64()))}),
        batch_format="pyarrow", batch_size=None)


# ---------------------------------------------------------------------------
# crawl-to-crawl edge delta
# ---------------------------------------------------------------------------

def graph_diff(old_edges: Dataset, new_edges: Dataset, *,
               src: str = "src", dst: str = "dst",
               n_coarse: int | None = None) -> Dataset:
    """Edge-level delta between two crawl snapshots → (src, dst,
    status) with status ∈ {'added', 'removed', 'kept'} — the
    refresh-audit primitive feeding :func:`cc_incremental` (which
    edges changed) and link-rot/growth dashboards. Duplicate edges
    within a side count once (set semantics, like the CC family's
    canonical dedup).

    Scale shape: tagged union → ONE (src, dst)-keyed coarse
    presence-fold emitting the status in-frame. No joins, no driver
    state."""
    from omop2obo_ray.functions.shuffle import coarse_aggregate
    from omop2obo_ray.pipelines.textpipe import _sanitize_join_output

    def _tag(side):
        def fn(b: pa.Table) -> pa.Table:
            n = b.num_rows
            return pa.table({
                "src": b[src].combine_chunks().cast(pa.int64()),
                "dst": b[dst].combine_chunks().cast(pa.int64()),
                "o": pa.array(np.full(n, 1 - side, np.int8)),
                "n": pa.array(np.full(n, side, np.int8))})
        return fn

    tagged = old_edges.map_batches(_tag(0), batch_format="pyarrow",
                                   batch_size=None).union(
        new_edges.map_batches(_tag(1), batch_format="pyarrow",
                              batch_size=None))

    def _fold(df: pd.DataFrame) -> pd.DataFrame:
        g = (df.groupby(["src", "dst"], sort=False)
             .agg(o=("o", "max"), n=("n", "max")).reset_index())
        status = np.where(g["o"] & g["n"], "kept",
                          np.where(g["n"], "added", "removed"))
        return pd.DataFrame({"src": g["src"], "dst": g["dst"],
                             "status": status})

    return _sanitize_join_output(
        coarse_aggregate(tagged, ["src", "dst"], _fold,
                         n_coarse=n_coarse),
        pa.schema([("src", pa.int64()), ("dst", pa.int64()),
                   ("status", pa.string())]))


# ---------------------------------------------------------------------------
# co-citation / bibliographic coupling (directed wedge pair counts)
# ---------------------------------------------------------------------------

def directed_wedge_pairs(edges: Dataset, *, mode: str = "cocitation",
                         src: str = "src", dst: str = "dst",
                         max_center_degree: int = 10_000,
                         n_coarse: int | None = None) -> Dataset:
    """Directed similarity pair counts → (a, b, n) with a < b:

    - ``mode='cocitation'``: n = # pages linking to BOTH a and b
      (Small'73) — pages cited together are related; the
      "related pages" signal over the web link graph.
    - ``mode='coupling'``: n = # targets a and b BOTH link to
      (Kessler'63, bibliographic coupling) — pages sharing
      references are related.

    The directed siblings of :func:`link_prediction` (which scores
    undirected common-neighbor pairs). Same hub guard and the same
    redefinition contract: centers (the shared citing page /
    shared target) with degree > ``max_center_degree`` are excluded
    from the wedge pass, since a 10⁶-out-link hub contributes
    quadratic noise pairs; any oracle must share the rule.

    Shape: (center, value) projection → distinct dedup (coarse) →
    per-center degree + cap in the SAME frame → per-center sorted
    pair fan-out (vectorized triu) → ONE pair-keyed coarse sum.
    Driver state: none."""
    from omop2obo_ray.functions.shuffle import (coarse_aggregate,
                                                coarse_apply_per_key)

    if mode not in ("cocitation", "coupling"):
        raise ValueError(f"directed_wedge_pairs: unknown mode {mode!r}")
    c, v = (src, dst) if mode == "cocitation" else (dst, src)

    proj = edges.map_batches(
        lambda b, c=c, v=v: pa.table({
            "c": b[c].combine_chunks().cast(pa.int64()),
            "v": b[v].combine_chunks().cast(pa.int64())}),
        batch_format="pyarrow", batch_size=None)
    ded = _sanitize_join_output(
        coarse_aggregate(proj, ["c", "v"],
                         lambda df: df.drop_duplicates(),
                         n_coarse=n_coarse),
        pa.schema([("c", pa.int64()), ("v", pa.int64())]))

    def _pairs(g: pd.DataFrame) -> pd.DataFrame:
        nb = np.unique(g["v"].to_numpy(np.int64))
        if len(nb) < 2 or len(nb) > max_center_degree:
            return pd.DataFrame({
                "a": pd.Series([], dtype="int64"),
                "b": pd.Series([], dtype="int64")})
        i, j = np.triu_indices(len(nb), 1)
        return pd.DataFrame({"a": nb[i], "b": nb[j]})

    wedges = _sanitize_join_output(
        coarse_apply_per_key(ded, ["c"], _pairs, n_coarse=n_coarse),
        pa.schema([("a", pa.int64()), ("b", pa.int64())]))

    return _sanitize_join_output(
        coarse_aggregate(
            wedges, ["a", "b"],
            lambda df: df.groupby(["a", "b"], sort=False).size()
            .rename("n").reset_index(), n_coarse=n_coarse),
        pa.schema([("a", pa.int64()), ("b", pa.int64()),
                   ("n", pa.int64())]))


def page_meta(pages: Dataset, url_col: str = "url",
              html_col: str = "html") -> Dataset:
    """Head-metadata table from raw pages → (url, title,
    meta_description, canonical, html_lang) via
    :func:`omop2obo_ray.functions.html.extract_meta` — the page-level
    crawl signals beside the body text (canonical → URL dedup,
    html lang → langid validation, title/description → snippets and
    weak labels). One streaming per-page parse, no exchange —
    the metadata sibling of :func:`anchor_edges`."""
    from omop2obo_ray.functions.html import extract_meta

    def _meta(batch: pa.Table) -> pa.Table:
        rows = [extract_meta(h)
                for h in batch[html_col].to_pylist()]
        return pa.table({
            "url": batch[url_col],
            "title": pa.array([r["title"] for r in rows],
                              pa.string()),
            "meta_description": pa.array(
                [r["meta_description"] for r in rows], pa.string()),
            "canonical": pa.array([r["canonical"] for r in rows],
                                  pa.string()),
            "html_lang": pa.array([r["html_lang"] for r in rows],
                                  pa.string())})

    return pages.select_columns([url_col, html_col]).map_batches(
        _meta, batch_format="pyarrow", batch_size=None)


def wl_labels(edges: Dataset, *, rounds: int = 2,
              src: str = "src", dst: str = "dst",
              n_coarse: int | None = None) -> Dataset:
    """Weisfeiler-Lehman color refinement over the undirected simple
    graph → (node, wl): wl₀ = degree (as a string color);
    wl_{k+1} = md5(own || '|' || comma-joined SORTED multiset of
    neighbor colors) — the 1-WL node fingerprint behind graph-kernel
    features and structural-role bucketing (two nodes share a color
    iff 1-WL cannot distinguish their k-hop neighborhoods;
    Weisfeiler & Lehman'68, Shervashidze'11 kernels). A fixed
    ``rounds`` is the standard kernel operator; the SQL gate unrolls
    the same k with DuckDB's own md5 + ordered string_agg — color
    strings are md5 hex on both sides, so the gate is exact.

    Scale shape, per round: ONE ``coarse_join`` ships colors onto
    the symmetric edge list + ONE node-keyed coarse fold that sorts
    the neighbor multiset and hashes in-frame (own color rides as a
    marker row — no second join). The md5-per-node is the fold's
    CPU kernel (hashlib, same per-record rationale as
    ``json_flatten``'s orjson); frame size is degree-bounded."""
    import hashlib

    from omop2obo_ray.functions.shuffle import coarse_join

    if n_coarse is None:
        cpus = (int(ray.cluster_resources().get("CPU", 8))
                if ray.is_initialized() else 8)
        n_coarse = max(32, 3 * cpus)

    pair = pa.schema([("u", pa.int64()), ("v", pa.int64())])
    sym = edges.map_batches(
        lambda b: pa.table({
            "u": pa.concat_arrays([
                b[src].combine_chunks().cast(pa.int64()),
                b[dst].combine_chunks().cast(pa.int64())]),
            "v": pa.concat_arrays([
                b[dst].combine_chunks().cast(pa.int64()),
                b[src].combine_chunks().cast(pa.int64())])}),
        batch_format="pyarrow", batch_size=None)
    e = _sanitize_join_output(
        coarse_aggregate(
            sym, ["u", "v"],
            lambda df: df[df["u"] != df["v"]].drop_duplicates(),
            n_coarse=n_coarse), pair).materialize()

    lab_schema = pa.schema([("node", pa.int64()), ("wl", pa.string())])
    lab = _sanitize_join_output(
        coarse_aggregate(
            e, ["u"],
            lambda df: df.groupby("u", sort=False).size()
            .rename("wl").reset_index()
            .assign(wl=lambda d: d["wl"].astype(str))
            .rename(columns={"u": "node"}),
            n_coarse=n_coarse), lab_schema).materialize()

    def _fold(df: pd.DataFrame) -> pd.DataFrame:
        rows = []
        for node, g in df.groupby("node", sort=False):
            own = g.loc[g["own"] == 1, "wl"]
            own_lab = own.iloc[0] if len(own) else ""
            nb = sorted(g.loc[g["own"] == 0, "wl"])
            h = hashlib.md5(
                (own_lab + "|" + ",".join(nb)).encode()).hexdigest()
            rows.append((node, h))
        return pd.DataFrame(rows, columns=["node", "wl"])

    for _ in range(rounds):
        moved = coarse_join(e, lab, on="v", right_on="node",
                            how="inner", n_coarse=n_coarse)
        nbr = moved.map_batches(
            lambda b: pa.table({
                "node": b["u"], "wl": b["wl"],
                "own": pa.array(np.zeros(b.num_rows, np.int8))}),
            batch_format="pyarrow", batch_size=None)
        own = lab.map_batches(
            lambda b: pa.table({
                "node": b["node"], "wl": b["wl"],
                "own": pa.array(np.ones(b.num_rows, np.int8))}),
            batch_format="pyarrow", batch_size=None)
        lab = _sanitize_join_output(
            coarse_aggregate(nbr.union(own), ["node"], _fold,
                             n_coarse=n_coarse), lab_schema)
    return lab
