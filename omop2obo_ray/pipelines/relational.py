"""Relational operator library over the driver's TPC-H-ish testdata —
one Ray-Data-first implementation per operator family from SURVEY §2,
each with a DuckDB-checkable oracle (driver correctness gate).

Every function takes ``sf_dir`` and returns a Dataset / DataFrame.
Column names are chosen to match the oracle SQL exactly (the driver
hashes values after sorting columns by name).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray
import ray.data as rd
from ray.data import Dataset
from ray.data.aggregate import Count, Mean, Sum

from omop2obo_ray.functions.shuffle import coarse_aggregate, coarse_apply_per_key


def _read(sf_dir: str, table: str, columns: list[str] | None = None) -> Dataset:
    # prune at the read: only requested columns leave storage
    return rd.read_parquet(f"{sf_dir}/{table}.parquet", columns=columns)


# ---------------------------------------------------------------------------
# M1 — code normalization (normalizes_source_codes semantics)
# ---------------------------------------------------------------------------

def q_normalize_codes(sf_dir: str) -> Dataset:
    """``Brand#13`` → ``brand:13`` via the reference's prefix-normalize
    kernel (data_utils.py:236-275) — vectorized over part.p_brand."""
    from omop2obo_ray.functions.normalize import normalize_source_codes

    vocab = {"Brand": "brand"}

    def norm(batch: pa.Table) -> pa.Table:
        raw = pc.replace_substring(batch["p_brand"], "#", ":")
        return pa.table(
            {
                "p_partkey": batch["p_partkey"],
                "norm_code": pa.array(
                    normalize_source_codes(raw.to_pylist(), vocab), pa.string()
                ),
            }
        )

    return _read(sf_dir, "part", ["p_partkey", "p_brand"]).map_batches(
        norm, batch_format="pyarrow"
    )


# ---------------------------------------------------------------------------
# M2 — multi-value explode (column_splitter semantics)
# ---------------------------------------------------------------------------

def q_explode_tokens(sf_dir: str) -> Dataset:
    """documents.text → one row per whitespace token (data_utils.py:120-156
    re-expressed as a vectorized Arrow list-flatten, no Python row loop)."""

    def explode(batch: pa.Table) -> pa.Table:
        toks = pc.split_pattern(batch["text"], " ")
        flat = pc.list_flatten(toks)
        parents = pc.list_parent_indices(toks)
        return pa.table(
            {"doc_id": pc.take(batch["doc_id"], parents), "token": flat}
        )

    return _read(sf_dir, "documents", ["doc_id", "text"]).map_batches(
        explode, batch_format="pyarrow", zero_copy_batch=True
    )


# ---------------------------------------------------------------------------
# M3 — melt to long (data_frame_subsetter semantics)
# ---------------------------------------------------------------------------

def q_melt_customer(sf_dir: str) -> Dataset:
    """customer (c_name, c_mktsegment) → long (c_custkey, CODE,
    CODE_COLUMN) — the universal join-input shape (data_utils.py:44-81),
    built per batch with zero shuffle."""

    def melt(batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        keys = pa.concat_arrays([batch["c_custkey"].combine_chunks()] * 2)
        codes = pa.concat_arrays(
            [batch["c_name"].combine_chunks().cast(pa.string()),
             batch["c_mktsegment"].combine_chunks().cast(pa.string())]
        )
        cols = pa.array(["c_name"] * n + ["c_mktsegment"] * n)
        return pa.table({"c_custkey": keys, "CODE": codes, "CODE_COLUMN": cols})

    return _read(sf_dir, "customer", ["c_custkey", "c_name", "c_mktsegment"]).map_batches(
        melt, batch_format="pyarrow"
    )


# ---------------------------------------------------------------------------
# M4 — pivot wide (data_frame_supersetter semantics)
# ---------------------------------------------------------------------------

def q_pivot_orderstatus(sf_dir: str) -> Dataset:
    """long → wide pivot at presentation time (data_utils.py:84-117):
    count of each o_orderstatus per o_orderpriority as columns."""
    ds = _read(sf_dir, "orders", ["o_orderpriority", "o_orderstatus"])

    def partial(batch: pa.Table) -> pa.Table:
        df = batch.to_pandas()
        out = (
            df.groupby("o_orderpriority")["o_orderstatus"]
            .value_counts()
            .unstack(fill_value=0)
            .reindex(columns=["F", "O", "P"], fill_value=0)
            .reset_index()
        )
        out.columns = ["o_orderpriority", "n_f", "n_o", "n_p"]
        return pa.Table.from_pandas(out, preserve_index=False)

    partials = ds.map_batches(partial, batch_format="pyarrow")
    return partials.groupby("o_orderpriority").aggregate(
        Sum("n_f", alias_name="n_f"), Sum("n_o", alias_name="n_o"),
        Sum("n_p", alias_name="n_p"),
    )


# ---------------------------------------------------------------------------
# M11 — conditional row expansion (LABS result-type fan-out semantics)
# ---------------------------------------------------------------------------

def q_row_expansion(sf_dir: str) -> Dataset:
    """Conditional fan-out: rows matching a predicate explode into one
    row per split value, others pass through — the reference's LABS
    ``Normal/Low/High`` expansion (main.py:127-139, M11), expressed as a
    vectorized conditional explode over part.p_name."""

    def expand(batch: pa.Table) -> pa.Table:
        df = batch.to_pandas()
        big = df["p_size"] > 30
        out_key, out_tok = [], []
        for k, t, b in zip(df["p_partkey"], df["p_name"], big):
            if b:
                for tok in t.split(" "):
                    out_key.append(k)
                    out_tok.append(tok)
            else:
                out_key.append(k)
                out_tok.append(t)
        return pa.table({"p_partkey": pa.array(out_key, pa.int64()),
                         "part_token": pa.array(out_tok, pa.string())})

    return _read(sf_dir, "part", ["p_partkey", "p_name", "p_size"]).map_batches(
        expand, batch_format="pyarrow"
    )


# ---------------------------------------------------------------------------
# A1 — ordered-distinct collect (aggregates_column_values semantics)
# ---------------------------------------------------------------------------

def q_aggregate_values(sf_dir: str) -> Dataset:
    """groupby lang → ' | '-joined distinct sources. The reference
    preserves first-seen input order (unique_everseen,
    data_utils.py:159-183); distributed execution pins a deterministic
    sorted order instead (SURVEY §7.4.1)."""
    ds = _read(sf_dir, "documents", ["lang", "source"])

    def agg(group: pd.DataFrame) -> pd.DataFrame:
        vals = sorted(set(group["source"]))
        return pd.DataFrame(
            {"lang": [group["lang"].iloc[0]], "agg_sources": [" | ".join(vals)],
             "n_docs": [len(group)]}
        )

    return ds.groupby("lang").map_groups(agg, batch_format="pandas")


# ---------------------------------------------------------------------------
# J1/J2 — chained hash joins with broadcast small sides
# ---------------------------------------------------------------------------

def q_orders_customer_nation(sf_dir: str) -> Dataset:
    """orders × customer × nation — the double-merge join chain shape
    (clinical_concept_annotator.py:212-224). customer+nation are
    dimension tables → broadcast once via ray.put, looked up per batch
    (no shuffle join, SURVEY §2.4)."""
    cust = _read(sf_dir, "customer", ["c_custkey", "c_name", "c_nationkey"]).to_pandas()
    nation = _read(sf_dir, "nation", ["n_nationkey", "n_name"]).to_pandas()
    # pre-join the dimensions once, broadcast the merged frame; the per-
    # batch probe is then ONE vectorized pandas hash merge (no Python
    # per-key loop in the hot path)
    side = cust.merge(nation, left_on="c_nationkey", right_on="n_nationkey")[
        ["c_custkey", "c_name", "n_name"]]
    side_ref = ray.put(side)

    def join(batch: pd.DataFrame) -> pd.DataFrame:
        lut = ray.get(side_ref)
        out = batch.merge(lut, left_on="o_custkey", right_on="c_custkey",
                          how="inner")
        return out[["o_orderkey", "o_totalprice", "c_name", "n_name"]]

    return _read(sf_dir, "orders", ["o_orderkey", "o_custkey", "o_totalprice"]).map_batches(
        join, batch_format="pandas"
    )


def q_orders_customer_join_native(sf_dir: str) -> Dataset:
    """Same join chain via Ray Data's native hash-partitioned
    ``Dataset.join`` — the both-sides-large path (ray_guide joins
    section) complementing the broadcast variant above."""
    orders = _read(sf_dir, "orders", ["o_orderkey", "o_custkey", "o_totalprice"])
    cust = _read(sf_dir, "customer", ["c_custkey", "c_name", "c_nationkey"])
    nation = _read(sf_dir, "nation", ["n_nationkey", "n_name"])
    j1 = orders.join(cust, join_type="inner", num_partitions=8,
                     on=("o_custkey",), right_on=("c_custkey",))
    j2 = j1.join(nation, join_type="inner", num_partitions=8,
                 on=("c_nationkey",), right_on=("n_nationkey",))
    return j2.select_columns(["o_orderkey", "o_totalprice", "c_name", "n_name"])


def q_customer_orders_full_outer(sf_dir: str) -> Dataset:
    """FULL OUTER join of the customer dimension against per-customer
    order counts — the J7 outer-merge shape
    (clinical_concept_annotator.py:419-428 reduce(pd.merge(how='outer')))
    as a native hash full_outer join, SQL-gated. Customers with no
    orders survive with n_orders = 0; the key is coalesced across
    sides so an orphan order (no customer row) would survive too.
    Nulls are eliminated with the same coalesce contract on both sides
    so the value-hash gate is null-representation independent."""
    import pyarrow as pa
    import pyarrow.compute as pc

    from omop2obo_ray.pipelines.textpipe import _sanitize_join_output

    cust = _read(sf_dir, "customer", ["c_custkey", "c_name"])
    orders = _read(sf_dir, "orders", ["o_custkey"])
    # per-customer order counts: high-cardinality key → coarse aggregate
    counts = coarse_aggregate(
        orders, ["o_custkey"],
        lambda df: df.groupby("o_custkey", sort=False).size()
        .rename("n").reset_index())
    # Ray's full_outer coalesces the join key into the LEFT column name
    # and drops the right key column
    joined = _sanitize_join_output(
        cust.join(counts, join_type="full_outer", num_partitions=8,
                  on=("c_custkey",), right_on=("o_custkey",)),
        pa.schema([("c_custkey", pa.int64()), ("c_name", pa.string()),
                   ("n", pa.int64())]))

    def _fin(batch: pa.Table) -> pa.Table:
        name = pc.coalesce(batch["c_name"].combine_chunks(),
                           pa.scalar("", pa.string()))
        n = pc.coalesce(batch["n"].combine_chunks().cast(pa.int64()),
                        pa.scalar(0, pa.int64()))
        return pa.table({"custkey": batch["c_custkey"].combine_chunks(),
                         "c_name": name, "n_orders": n})

    return joined.map_batches(_fin, batch_format="pyarrow", batch_size=None)


def q_source_lang_rollup(sf_dir: str) -> Dataset:
    """GROUPING SETS rollup of corpus volume: (source, lang) leaves,
    per-source subtotals, and the grand total, with '' sentinels for
    the rolled-up dimensions — the reporting shape of per-domain corpus
    dashboards. One block-local combiner pass over the slim projection,
    then three BOUNDED-key groupbys over the tiny partial table
    (sources × langs rows) and a streaming union; document rows are
    scanned exactly once."""
    import pandas as pd
    import pyarrow as pa

    docs = _read(sf_dir, "documents", ["source", "lang"])
    partials = docs.map_batches(
        lambda df: df.groupby(["source", "lang"], sort=False).size()
        .rename("n").reset_index(),
        batch_format="pandas", batch_size=None)

    def _merge_level(cols: list[str]):
        def _m(g: pd.DataFrame) -> pd.DataFrame:
            out = {"source": g["source"].iloc[0] if "source" in cols else "",
                   "lang": g["lang"].iloc[0] if "lang" in cols else "",
                   "n_docs": int(g["n"].sum())}
            return pd.DataFrame([out])
        return _m

    leaf = partials.groupby(["source", "lang"]).map_groups(
        _merge_level(["source", "lang"]), batch_format="pandas")
    per_source = partials.groupby("source").map_groups(
        _merge_level(["source"]), batch_format="pandas")
    # grand total: sum of the bounded partials — one tiny aggregate
    import ray.data as rd
    n_total = sum(b["n"].sum() for b in
                  partials.iter_batches(batch_size=4096,
                                        batch_format="pandas"))
    total_ds = rd.from_arrow(pa.table({
        "source": pa.array([""], pa.string()),
        "lang": pa.array([""], pa.string()),
        "n_docs": pa.array([int(n_total)], pa.int64())}))
    out = leaf.union(per_source).union(total_ds)
    return out.map_batches(
        lambda b: pa.table({"source": b["source"].cast(pa.string()),
                            "lang": b["lang"].cast(pa.string()),
                            "n_docs": b["n_docs"].cast(pa.int64())}),
        batch_format="pyarrow", batch_size=None)


# ---------------------------------------------------------------------------
# semi/anti join via broadcast key set
# ---------------------------------------------------------------------------

def q_customers_without_orders(sf_dir: str) -> Dataset:
    """anti-join: customers having no 'P'-status orders
    (analytic_utils.py:397-410 isin-style set ops) — broadcast the
    order-custkey set, filter in map_batches."""
    orders = _read(sf_dir, "orders", ["o_custkey", "o_orderstatus"])
    keys = set()
    for b in orders.map_batches(
        lambda t: t.filter(pc.equal(t["o_orderstatus"], "P")).select(["o_custkey"]),
        batch_format="pyarrow",
    ).iter_batches(batch_size=65536, batch_format="pyarrow"):
        keys.update(b["o_custkey"].to_pylist())
    keys_ref = ray.put(keys)

    def anti(batch: pa.Table) -> pa.Table:
        ks = ray.get(keys_ref)
        mask = pa.array([k not in ks for k in batch["c_custkey"].to_pylist()])
        return batch.filter(mask)

    return _read(sf_dir, "customer", ["c_custkey", "c_name"]).map_batches(
        anti, batch_format="pyarrow"
    )


# ---------------------------------------------------------------------------
# A3 — exact dedup (hash-partition + per-group min)
# ---------------------------------------------------------------------------

def q_dedup_docs(sf_dir: str) -> Dataset:
    """drop_duplicates-on-content semantics (A3): keep min doc_id per
    distinct text. The shuffle key is the 64-bit content hash — the
    text payload itself never moves (the groupby ships hash+id only)."""
    from omop2obo_ray.functions.hashing import hash64_array

    ds = _read(sf_dir, "documents", ["doc_id", "text"])
    hashed = ds.map_batches(
        lambda b: pa.table(
            {"doc_id": b["doc_id"],
             "text_hash": pa.array(hash64_array(b["text"]), pa.uint64())}
        ),
        batch_format="pyarrow",
    )
    # text_hash cardinality ≈ n_docs → coarse aggregate (see
    # functions/shuffle.py: per-group sort-aggregate overhead is the
    # scale trap here)
    return coarse_aggregate(hashed, ["text_hash"], lambda df: df.groupby(
        "text_hash", sort=False)["doc_id"].min().rename("keep_id").reset_index()
    ).select_columns(["keep_id"])


# ---------------------------------------------------------------------------
# A5/A6-shaped grouped aggregate with partial pre-aggregation (TPC-H Q1)
# ---------------------------------------------------------------------------

def q_lineitem_agg(sf_dir: str) -> Dataset:
    """Pre-aggregate per batch (combiner), then a small groupby — the
    canonical scale pattern for wide aggregations (SURVEY §4)."""
    ds = _read(
        sf_dir, "lineitem",
        ["l_returnflag", "l_linestatus", "l_quantity", "l_extendedprice", "l_discount"],
    )

    def partial(batch: pa.Table) -> pa.Table:
        df = batch.to_pandas()
        df["revenue"] = df["l_extendedprice"] * (1 - df["l_discount"])
        g = (
            df.groupby(["l_returnflag", "l_linestatus"], sort=True)
            .agg(sum_qty=("l_quantity", "sum"), revenue=("revenue", "sum"),
                 n=("l_quantity", "size"))
            .reset_index()
        )
        return pa.Table.from_pandas(g, preserve_index=False)

    partials = ds.map_batches(partial, batch_format="pyarrow")
    return partials.groupby(["l_returnflag", "l_linestatus"]).aggregate(
        Sum("sum_qty", alias_name="sum_qty"),
        Sum("revenue", alias_name="revenue"),
        Sum("n", alias_name="n"),
    )


# ---------------------------------------------------------------------------
# K-family — per-group top-k, threshold filter, sort+limit
# ---------------------------------------------------------------------------

def q_topk_orders_per_priority(sf_dir: str) -> Dataset:
    """top-3 orders by totalprice per priority (K1 per-row top-n analog,
    string_similarity.py:223-228): groupby + per-group head, never a
    global sort."""
    ds = _read(sf_dir, "orders", ["o_orderpriority", "o_orderkey", "o_totalprice"])

    def topk(g: pd.DataFrame) -> pd.DataFrame:
        return g.sort_values(
            ["o_totalprice", "o_orderkey"], ascending=[False, True], kind="mergesort"
        ).head(3)

    return ds.groupby("o_orderpriority").map_groups(topk, batch_format="pandas")


def q_filter_threshold(sf_dir: str) -> Dataset:
    """score-floor filter (K2, string_similarity.py:264) over events."""
    ds = _read(sf_dir, "events", ["event_type", "value"])
    filtered = ds.map_batches(
        lambda b: b.filter(pc.greater_equal(b["value"], 150.0)), batch_format="pyarrow"
    )
    return filtered.groupby("event_type").aggregate(
        Count(alias_name="n"), Mean("value", alias_name="avg_value")
    )


def q_sort_limit_docs(sf_dir: str) -> pd.DataFrame:
    """global top-10 by n_chars (K4 ordering) — sort + limit, consumed
    driver-side as a small result."""
    ds = _read(sf_dir, "documents", ["doc_id", "n_chars"])
    out = ds.sort(["n_chars", "doc_id"], descending=[True, False]).limit(10)
    return out.to_pandas()


# ---------------------------------------------------------------------------
# ancestor closure — distributed iterative join (SURVEY §7.4.5)
# ---------------------------------------------------------------------------

def q_ancestor_closure(sf_dir: str) -> Dataset:
    """Transitive closure over the implicit part hierarchy
    (child=p_partkey, parent=p_partkey//2) by iterated broadcast join:
    frontier ⋈ edges until fixpoint — the distributed variant of the
    reference's precomputed-ancestors input (bounded depth = log₂ n)."""
    part = _read(sf_dir, "part", ["p_partkey"])

    def to_edges(batch: pa.Table) -> pa.Table:
        df = batch.to_pandas()
        df["parent"] = df["p_partkey"] // 2
        df = df[(df["parent"] >= 1) & (df["parent"] != df["p_partkey"])]
        return pa.table({"child": pa.array(df["p_partkey"], pa.int64()),
                         "parent": pa.array(df["parent"], pa.int64())})

    edges_df = part.map_batches(to_edges, batch_format="pyarrow").to_pandas()
    # parent map is dimension-sized → broadcast
    parent_of = dict(zip(edges_df["child"], edges_df["parent"]))
    parent_ref = ray.put(parent_of)

    def expand(batch: pa.Table) -> pa.Table:
        po = ray.get(parent_ref)
        childs, ancs = [], []
        for c in batch["child"].to_pylist():
            a = po.get(c)
            seen = set()
            while a is not None and a not in seen:
                seen.add(a)
                childs.append(c)
                ancs.append(a)
                a = po.get(a)
        return pa.table({"child": pa.array(childs, pa.int64()),
                         "anc": pa.array(ancs, pa.int64())})

    closure = rd.from_pandas(pd.DataFrame({"child": sorted(parent_of.keys())})) \
        .map_batches(expand, batch_format="pyarrow")
    return closure


# ---------------------------------------------------------------------------
# streaming-shaped: tumbling window over events
# ---------------------------------------------------------------------------

def q_window_tumbling(sf_dir: str) -> Dataset:
    """1-hour tumbling window counts per event_type: derive the window
    key per batch, then a keyed aggregate (ray_guide streaming-shaped
    pattern; ordering assumption: none — counts are order-free)."""
    ds = _read(sf_dir, "events", ["event_type", "ts", "value"])

    def windowed(batch: pa.Table) -> pa.Table:
        hour = pc.floor_temporal(batch["ts"], unit="hour")
        return pa.table(
            {"event_type": batch["event_type"], "hour": hour, "value": batch["value"]}
        )

    # window-key cardinality grows with the time range (types × hours)
    # → coarse aggregate (functions/shuffle.py)
    return coarse_aggregate(
        ds.map_batches(windowed, batch_format="pyarrow"),
        ["event_type", "hour"],
        lambda df: df.groupby(["event_type", "hour"], sort=False)
        .agg(n=("value", "size"), sum_value=("value", "sum")).reset_index())


def q_top_tokens(sf_dir: str) -> pd.DataFrame:
    """Corpus vocabulary top-20 by frequency: vectorized explode →
    per-batch partial counts (combiner) → small groupby → sort+limit —
    the canonical pre-aggregated wide aggregation."""

    def partial(batch: pa.Table) -> pa.Table:
        toks = pc.list_flatten(pc.split_pattern(batch["text"], " "))
        vc = toks.value_counts()
        return pa.table({"token": vc.field("values"),
                         "n": vc.field("counts").cast(pa.int64())})

    partials = _read(sf_dir, "documents", ["text"]).map_batches(
        partial, batch_format="pyarrow")
    # token cardinality = corpus vocabulary (10⁷⁺ at web scale) →
    # coarse aggregate instead of the per-group sort aggregate
    counts = coarse_aggregate(partials, ["token"], lambda df: df.groupby(
        "token", sort=False)["n"].sum().reset_index())
    return counts.sort(["n", "token"], descending=[True, False]).limit(20).to_pandas()


def q_window_session(sf_dir: str) -> Dataset:
    """Gap-based session windows per user (30-min inactivity gap):
    ``groupby(key).map_groups`` over ts-sorted groups with a cumulative
    gap-break sum — the streaming-shaped pattern for session windows
    (ray_guide); ordering assumption: (ts, event_id) is a total order
    per user, pinned identically in the SQL oracle."""
    ds = _read(sf_dir, "events", ["user_id", "event_id", "ts", "value"])

    def sessionize(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["ts", "event_id"], kind="mergesort")
        gap = g["ts"].diff() > pd.Timedelta(minutes=30)
        g["session_id"] = gap.cumsum().astype("int64")
        out = (
            g.groupby("session_id", sort=True)
            .agg(user_id=("user_id", "first"), n=("event_id", "size"),
                 t_start=("ts", "min"), t_end=("ts", "max"))
            .reset_index()
        )
        return out[["user_id", "session_id", "n", "t_start", "t_end"]]

    # per-user map_groups would pay Ray's per-group overhead once per
    # user (unbounded cardinality) → coarse-bucketed per-key apply
    return coarse_apply_per_key(ds, ["user_id"], sessionize)


def q_window_sliding(sf_dir: str) -> Dataset:
    """1-hour sliding (hopping) window per event_type, 20-min step —
    each event contributes to exactly size/step = 3 windows. The
    per-event window expansion is a vectorized np.repeat inside
    ``map_batches`` (stream-friendly: 3× row fan-out per block, no
    sort, no driver state); window-key cardinality grows with the time
    range → coarse aggregate for the reduction. Window starts are epoch
    seconds, identical to the oracle's integer arithmetic (all-positive
    timestamps, so int64 floor-division == floor)."""
    SIZE, STEP = 3600, 1200
    K = SIZE // STEP
    ds = _read(sf_dir, "events", ["event_type", "ts", "value"])

    def expand(batch: pa.Table) -> pa.Table:
        ts_us = batch["ts"].combine_chunks().cast(pa.int64()).to_numpy(
            zero_copy_only=False)
        base = (ts_us // (STEP * 1_000_000)) * STEP
        ks = np.tile(np.arange(K, dtype=np.int64) * STEP, len(batch))
        et = batch["event_type"].combine_chunks().to_numpy(zero_copy_only=False)
        val = batch["value"].combine_chunks().to_numpy(zero_copy_only=False)
        return pa.table({
            "event_type": pa.array(np.repeat(et, K)),
            "window_start": pa.array(np.repeat(base, K) - ks, pa.int64()),
            "value": pa.array(np.repeat(val, K), pa.float64()),
        })

    def _agg(df: pd.DataFrame) -> pd.DataFrame:
        out = (df.groupby(["event_type", "window_start"], sort=False)
               .agg(n=("value", "size"), sum_value=("value", "sum"))
               .reset_index())
        # rounded like the oracle (2-decimal inputs → sums are never
        # near a .005 boundary, so both rounding rules coincide)
        out["sum_value"] = out["sum_value"].round(2)
        return out

    return coarse_aggregate(
        ds.map_batches(expand, batch_format="pyarrow"),
        ["event_type", "window_start"], _agg)


# ---------------------------------------------------------------------------
# tier-1 exact-match analog over testdata (J6 with a derived lexicon)
# ---------------------------------------------------------------------------

def q_exact_match_mentions(sf_dir: str) -> Dataset:
    """Word-level exact matching of a part-name-derived lexicon against
    document tokens — the reference's exact string join (J6,
    clinical_concept_annotator.py:310-328) with the lexicon broadcast
    into the match stage."""
    words = set()
    for b in _read(sf_dir, "part", ["p_name"]).iter_batches(
        batch_size=65536, batch_format="pyarrow"
    ):
        for name in b["p_name"].to_pylist():
            words.update(name.split(" "))
    words_ref = ray.put(words)

    def match(batch: pa.Table) -> pa.Table:
        lex = ray.get(words_ref)
        doc_ids, hits = [], []
        for did, text in zip(batch["doc_id"].to_pylist(), batch["text"].to_pylist()):
            seen = set()
            for tok in (text or "").split(" "):
                if tok in lex and tok not in seen:
                    seen.add(tok)
                    doc_ids.append(did)
                    hits.append(tok)
        return pa.table({"doc_id": pa.array(doc_ids, pa.int64()),
                         "word": pa.array(hits, pa.string())})

    matches = _read(sf_dir, "documents", ["doc_id", "text"]).map_batches(
        match, batch_format="pyarrow"
    )
    # distinct (doc_id, word): docs × words cardinality → coarse
    return coarse_aggregate(matches, ["doc_id", "word"], lambda df:
                            df.drop_duplicates(["doc_id", "word"])
                            ).select_columns(["doc_id", "word"])


# ---------------------------------------------------------------------------
# §2.9 extension — distributed AS-OF join (temporal most-recent match)
# ---------------------------------------------------------------------------

def asof_join(left: Dataset, right: Dataset, key_left: str, key_right: str,
              ts_left: str, ts_right: str,
              right_cols: list[str]) -> Dataset:
    """AS-OF join: for each left row, attach the right row with the
    LARGEST ``ts_right ≤ ts_left`` for the same key (inner semantics —
    left rows with no earlier right row are dropped). Ray Data has no
    native as-of join, so this composes one from primitives:

      - both sides are tagged into a UNIFIED schema and hash-bucketed
        by key (one coarse exchange — the documented partitioning
        assumption: a key's rows all meet in one group);
      - inside each coarse group, pandas ``merge_asof(by=key)`` does
        the per-key temporal match fully vectorized.

    Determinism: callers must ensure ``(key_right, ts_right)`` is
    unique on the right side (pre-aggregate ties first) — pandas and
    SQL engines break exact-timestamp ties differently."""
    import numpy as np

    def _types(ds: Dataset) -> dict[str, pa.DataType]:
        sch = ds.schema()
        out = {}
        for n, t in zip(sch.names, sch.types):
            out[n] = t if isinstance(t, pa.DataType) else pa.int64()
        return out

    l_types, r_types = _types(left), _types(right)
    lcols = [c for c in l_types if c not in (key_left, ts_left)]

    def tag_left(batch: pa.Table) -> pa.Table:
        cols = {"_key": batch[key_left], "_ts": batch[ts_left],
                "_side": pa.array(np.zeros(batch.num_rows, dtype=np.int8))}
        for c in lcols:
            cols[c] = batch[c]
        for c in right_cols:
            cols[c] = pa.nulls(batch.num_rows, r_types[c])
        return pa.table(cols)

    def tag_right(batch: pa.Table) -> pa.Table:
        cols = {"_key": batch[key_right], "_ts": batch[ts_right],
                "_side": pa.array(np.ones(batch.num_rows, dtype=np.int8))}
        for c in lcols:
            cols[c] = pa.nulls(batch.num_rows, l_types[c])
        for c in right_cols:
            cols[c] = batch[c]
        return pa.table(cols)

    lt = left.map_batches(tag_left, batch_format="pyarrow", batch_size=None)
    rt = right.map_batches(tag_right, batch_format="pyarrow", batch_size=None)
    both = lt.union(rt)

    def per_group(df: pd.DataFrame) -> pd.DataFrame:
        l = df[df["_side"] == 0].sort_values("_ts", kind="mergesort")
        r = df[df["_side"] == 1].sort_values("_ts", kind="mergesort")
        empty = pd.DataFrame({c: pd.Series(dtype=df[c].dtype)
                              for c in ["_key", "_ts", *lcols, *right_cols]})
        if l.empty or r.empty:
            return empty
        out = pd.merge_asof(
            l[["_key", "_ts", *lcols]], r[["_key", "_ts", *right_cols]],
            on="_ts", by="_key", direction="backward")
        out = out.dropna(subset=[right_cols[0]])  # inner semantics
        return out[["_key", "_ts", *lcols, *right_cols]]

    return coarse_aggregate(both, ["_key"], per_group)


def q_asof_join(sf_dir: str) -> Dataset:
    """events ASOF orders: each event joined to the user's most recent
    order at event time. Exact-date order ties are pre-aggregated to a
    deterministic representative (max orderkey) so the DuckDB ASOF
    oracle and pandas merge_asof agree."""
    events = _read(sf_dir, "events", ["event_id", "user_id", "ts"])

    orders = _read(sf_dir, "orders",
                   ["o_custkey", "o_orderdate", "o_orderkey", "o_totalprice"])
    dedup = coarse_aggregate(
        orders, ["o_custkey", "o_orderdate"],
        lambda df: df.sort_values("o_orderkey").groupby(
            ["o_custkey", "o_orderdate"], sort=False).last().reset_index())

    out = asof_join(events, dedup, key_left="user_id", key_right="o_custkey",
                    ts_left="ts", ts_right="o_orderdate",
                    right_cols=["o_orderkey", "o_totalprice"])

    def finish(batch: pa.Table) -> pa.Table:
        # the unified tag schema carries nulls for the other side, so
        # int columns surface as float64 after the pandas asof — cast back
        return pa.table({
            "event_id": batch["event_id"].cast(pa.int64()),
            "user_id": batch["_key"],
            "ts": batch["_ts"],
            "o_orderkey": batch["o_orderkey"].cast(pa.int64()),
            "o_totalprice": batch["o_totalprice"],
        })

    return out.map_batches(finish, batch_format="pyarrow", batch_size=None)


def q_range_join(sf_dir: str) -> Dataset:
    """Keyed RANGE join (self): for every event, the user's STRICTLY
    EARLIER events within the preceding hour — an equi-key hash join
    with a vectorized interval filter (the standard decomposition for
    keyed range joins; keyless ranges would bucket by range instead,
    same coarse pattern as asof_join)."""
    cols = ["event_id", "user_id", "ts"]
    left = _read(sf_dir, "events", cols)
    right = _read(sf_dir, "events", cols).map_batches(
        lambda b: pa.table({"r_user": b["user_id"], "r_event": b["event_id"],
                            "r_ts": b["ts"]}),
        batch_format="pyarrow", batch_size=None)
    joined = left.join(right, join_type="inner", num_partitions=8,
                       on=("user_id",), right_on=("r_user",))

    def in_range(batch: pa.Table) -> pa.Table:
        if batch.num_columns == 0:
            return pa.table({"event_id": pa.array([], pa.int64()),
                             "prior_event_id": pa.array([], pa.int64())})
        ts = batch["ts"].cast(pa.timestamp("us"))
        rts = batch["r_ts"].cast(pa.timestamp("us"))
        lo = pc.subtract(ts, pa.scalar(3600 * 1_000_000, pa.duration("us")))
        mask = pc.and_(pc.less(rts, ts), pc.greater_equal(rts, lo))
        out = batch.filter(mask)
        return pa.table({"event_id": out["event_id"],
                         "prior_event_id": out["r_event"]})

    return joined.map_batches(in_range, batch_format="pyarrow", batch_size=None)


# ---------------------------------------------------------------------------
# frame-based rolling window (ROWS BETWEEN k PRECEDING AND CURRENT ROW)
# ---------------------------------------------------------------------------

def rolling_window(ds: Dataset, key: str, order_cols: list[str],
                   value_col: str, *, preceding: int = 3,
                   agg: str = "sum") -> Dataset:
    """Per-key frame-based window aggregate — SQL's
    ``agg(value) OVER (PARTITION BY key ORDER BY … ROWS BETWEEN k
    PRECEDING AND CURRENT ROW)`` → (key, order_cols…, roll) at full
    float precision (gate wrappers quantize, house rule).

    Scale shape: ONE coarse exchange keyed on ``key``
    (``coarse_apply_per_key`` — per-key Ray overhead would dominate at
    unbounded user cardinality), then an in-group mergesort +
    vectorized pandas rolling. Partial frames at the window start
    aggregate the rows that exist (``min_periods=1``), exactly like
    the SQL frame. Ordering contract: ``order_cols`` must be a total
    order per key (pinned identically in the oracle).
    """
    if agg not in ("sum", "mean"):
        raise ValueError(f"unsupported agg {agg!r}")

    def _roll(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(order_cols, kind="mergesort")
        r = g[value_col].rolling(window=preceding + 1, min_periods=1)
        out = g[[key] + order_cols].copy()
        out["roll"] = (r.sum() if agg == "sum" else r.mean()).to_numpy()
        return out

    cols = [key] + order_cols + [value_col]
    return coarse_apply_per_key(ds.select_columns(cols), [key], _roll)


def window_lag_lead(ds: Dataset, key: str, order_cols: list[str],
                    value_col: str, *, offset: int = 1) -> Dataset:
    """Per-key LAG/LEAD window — SQL's ``LAG(value, k)`` /
    ``LEAD(value, k) OVER (PARTITION BY key ORDER BY …)`` →
    (key, order_cols…, lag_v, lead_v); frame edges yield nulls,
    exactly like the SQL functions.

    Same scale shape as :func:`rolling_window`: ONE coarse exchange
    keyed on ``key`` (unbounded key cardinality → per-key Ray overhead
    would dominate ``map_groups``), in-group mergesort on
    ``order_cols`` (must be a total order per key, pinned identically
    in the oracle), vectorized ``Series.shift`` for both directions in
    one pass."""

    def _ll(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(order_cols, kind="mergesort")
        out = g[[key] + order_cols].copy()
        v = g[value_col]
        out["lag_v"] = v.shift(offset)
        out["lead_v"] = v.shift(-offset)
        return out

    cols = [key] + order_cols + [value_col]
    return coarse_apply_per_key(ds.select_columns(cols), [key], _ll)


def grouped_rollup(ds: Dataset, keys: list[str], value_col: str, *,
                   sentinel: str = "ALL") -> Dataset:
    """``GROUP BY ROLLUP(k1, …, km)`` — every prefix grouping level
    (finest → grand total) in ONE exchange → (k1…km, lvl, sum_v,
    n_rows), rolled-up key slots carrying ``sentinel`` and ``lvl`` =
    number of keys retained (SQL: ``m - GROUPING(k1) - … `` ).

    Scale shape: combiner-first. Each input block computes PARTIAL
    (sum, count) rows for ALL m+1 levels locally (a block of B rows
    emits at most (m+1)·distinct-keys partial rows, usually far
    fewer), then one coarse exchange keyed on (keys…, lvl) merges the
    partials. The grand-total and coarse levels are tiny but ride the
    same exchange — no second pass, no driver-side accumulation, and
    the all-to-all ships pre-aggregated partials instead of raw rows
    (the same reason lineitem_agg pre-aggregates; SURVEY §7)."""

    def _partials(df: pd.DataFrame) -> pd.DataFrame:
        cols = list(keys) + ["lvl", "sum", "count"]
        if not len(df):
            return pd.DataFrame({c: pd.Series(
                [], dtype=(np.int64 if c in ("lvl", "count") else
                           np.float64 if c == "sum" else object))
                for c in cols})
        outs = []
        for lvl in range(len(keys), -1, -1):
            gcols = list(keys[:lvl])
            if gcols:
                g = (df.groupby(gcols, sort=False)[value_col]
                     .agg(["sum", "count"]).reset_index())
            else:
                g = pd.DataFrame({"sum": [float(df[value_col].sum())],
                                  "count": [len(df)]})
            for k in keys[lvl:]:
                g[k] = sentinel
            g["lvl"] = np.int64(lvl)
            outs.append(g[cols])
        return pd.concat(outs, ignore_index=True)

    parts = ds.select_columns(list(keys) + [value_col]).map_batches(
        _partials, batch_format="pandas", batch_size=None)

    def _merge(df: pd.DataFrame) -> pd.DataFrame:
        g = (df.groupby(list(keys) + ["lvl"], sort=False)
             .agg(sum_v=("sum", "sum"), n_rows=("count", "sum"))
             .reset_index())
        g["n_rows"] = g["n_rows"].astype(np.int64)
        return g

    return coarse_aggregate(parts, list(keys) + ["lvl"], _merge)


def grouped_cube(ds: Dataset, keys: list[str], value_col: str, *,
                 sentinel: str = "ALL") -> Dataset:
    """``GROUP BY CUBE(k1, …, km)`` — ALL 2^m grouping sets in ONE
    exchange → (k1…km, gid, sum_v, n_rows), rolled-up key slots
    carrying ``sentinel`` and ``gid`` = the SQL GROUPING_ID bitmask
    (bit 2^(m-1-i) set ⇔ key i rolled up; gid 0 = finest level,
    2^m - 1 = grand total).

    Same combiner-first scale shape as ``grouped_rollup``: each input
    block emits PARTIAL (sum, count) rows for every grouping set
    locally — at most 2^m · distinct-keys partial rows per block,
    usually far fewer — then one coarse exchange keyed on
    (keys…, gid) merges partials. ``m`` is a query-sized constant
    (2-4 in practice), so the 2^m fan-out is a per-block constant
    factor, never a data-sized blowup; no second pass, no driver
    accumulation."""
    m = len(keys)
    if not (1 <= m <= 8):
        raise ValueError("grouped_cube: 1-8 keys supported")

    def _partials(df: pd.DataFrame) -> pd.DataFrame:
        cols = list(keys) + ["gid", "sum", "count"]
        if not len(df):
            return pd.DataFrame({c: pd.Series(
                [], dtype=(np.int64 if c in ("gid", "count") else
                           np.float64 if c == "sum" else object))
                for c in cols})
        outs = []
        for gid in range(2 ** m):
            gcols = [k for i, k in enumerate(keys)
                     if not (gid >> (m - 1 - i)) & 1]
            if gcols:
                g = (df.groupby(gcols, sort=False)[value_col]
                     .agg(["sum", "count"]).reset_index())
            else:
                g = pd.DataFrame({"sum": [float(df[value_col].sum())],
                                  "count": [len(df)]})
            for k in keys:
                if k not in gcols:
                    g[k] = sentinel
            g["gid"] = np.int64(gid)
            outs.append(g[cols])
        return pd.concat(outs, ignore_index=True)

    parts = ds.select_columns(list(keys) + [value_col]).map_batches(
        _partials, batch_format="pandas", batch_size=None)

    def _merge(df: pd.DataFrame) -> pd.DataFrame:
        g = (df.groupby(list(keys) + ["gid"], sort=False)
             .agg(sum_v=("sum", "sum"), n_rows=("count", "sum"))
             .reset_index())
        g["n_rows"] = g["n_rows"].astype(np.int64)
        return g

    return coarse_aggregate(parts, list(keys) + ["gid"], _merge)


def funnel_steps(events: Dataset, steps: list[str], *,
                 user_col: str = "user_id", type_col: str = "event_type",
                 ts_col: str = "ts") -> Dataset:
    """Ordered funnel completion per user → (user_id, steps): the
    longest prefix of ``steps`` a user completed with STRICTLY
    increasing timestamps, greedy-earliest semantics (step k's
    completion time = min ts of a step-k event after step k-1's
    completion time — the standard funnel recurrence, deterministic
    under ts ties within a type because only the min is used).

    Scale shape: rows are pre-filtered to the funnel's event types and
    projected to (user, type, ts) BEFORE the exchange — only relevant
    slim rows ship — then ONE coarse aggregate keyed on user hashes
    each user's events into one bucket frame where the K-step greedy
    scan runs as K vectorized merge+min passes (K is query-sized).
    Users with no step-type events never enter the stream (contract:
    output covers users with ≥ 1 event of a funnel type). No driver
    state; user skew bounded by per-user event counts like any keyed
    aggregate."""
    if not steps:
        raise ValueError("funnel_steps: steps must be non-empty")
    step_set = list(dict.fromkeys(steps))
    if len(step_set) != len(steps):
        raise ValueError("funnel_steps: steps must be distinct")

    def _slim(b: pa.Table) -> pa.Table:
        keep = pc.is_in(b[type_col],
                        value_set=pa.array(steps, pa.string()))
        t = b.filter(keep)
        return pa.table({user_col: t[user_col], type_col: t[type_col],
                         ts_col: t[ts_col]})

    slim = events.select_columns(
        [user_col, type_col, ts_col]).map_batches(
        _slim, batch_format="pyarrow", batch_size=None)

    def _scan(df: pd.DataFrame) -> pd.DataFrame:
        users = pd.unique(df[user_col])
        out = pd.DataFrame({user_col: users,
                            "steps": np.zeros(len(users), np.int64)})
        out = out.set_index(user_col)
        done = (df[df[type_col] == steps[0]]
                .groupby(user_col, sort=False)[ts_col].min()
                .rename("_t"))
        if not len(done):
            return out.reset_index()
        out.loc[done.index, "steps"] = 1
        for lvl, s in enumerate(steps[1:], start=2):
            ev = df[df[type_col] == s].merge(
                done.reset_index(), on=user_col)
            ev = ev[ev[ts_col] > ev["_t"]]
            if not len(ev):
                break
            done = (ev.groupby(user_col, sort=False)[ts_col].min()
                    .rename("_t"))
            out.loc[done.index, "steps"] = np.int64(lvl)
        return out.reset_index()

    return coarse_aggregate(slim, [user_col], _scan)


def cohort_retention(events: Dataset, *, user_col: str = "user_id",
                     ts_col: str = "ts") -> Dataset:
    """Cohort retention matrix → (cohort, day_offset, n_users): users
    are bucketed by their FIRST active day (the cohort, emitted as a
    'YYYY-MM-DD' string so both gate sides print identically), and
    ``n_users`` counts distinct users of that cohort active exactly
    ``day_offset`` days later — the standard retention triangle a
    crawl/product-analytics consumer derives from an event stream.

    Scale shape: TWO slim exchanges. (1) project to (user, day) with
    per-block dedup before the shuffle, coarse-aggregate keyed user —
    each user's active-day set lands in one frame where cohort = min
    day and offsets are unique per user by construction, so one
    (cohort, offset) row per user-offset leaves the frame; (2) coarse
    count keyed (cohort, offset) — the distinct-user count without a
    distinct aggregate, because step 1 already guaranteed uniqueness.
    No driver state; user skew bounded by a user's distinct active
    days, not raw event volume (the per-block dedup absorbs hot
    users before anything ships)."""

    def _slim(df: pd.DataFrame) -> pd.DataFrame:
        out = pd.DataFrame({
            user_col: df[user_col],
            "day": df[ts_col].dt.floor("D")})
        return out.drop_duplicates()

    slim = events.select_columns([user_col, ts_col]).map_batches(
        _slim, batch_format="pandas", batch_size=None)

    def _per_user(df: pd.DataFrame) -> pd.DataFrame:
        d = df.drop_duplicates()
        first = d.groupby(user_col, sort=False)["day"].transform("min")
        return pd.DataFrame({
            "cohort": first.dt.strftime("%Y-%m-%d"),
            "day_offset": (d["day"] - first).dt.days.astype(np.int64)})

    per_user = coarse_aggregate(slim, [user_col], _per_user)

    def _count(df: pd.DataFrame) -> pd.DataFrame:
        g = (df.groupby(["cohort", "day_offset"], sort=False)
             .size().rename("n_users").reset_index())
        g["n_users"] = g["n_users"].astype(np.int64)
        return g

    return coarse_aggregate(per_user, ["cohort", "day_offset"], _count)


def skyline2d(ds: Dataset, min_col: str, max_col: str,
              cols: list[str] | None = None) -> Dataset:
    """2-D skyline (Pareto front): rows not DOMINATED by any other —
    another row dominates if it is ≤ on ``min_col`` AND ≥ on
    ``max_col`` with at least one strict inequality. Ties: all
    co-optimal (incomparable or equal-on-both) rows are kept, the
    standard skyline contract.

    Scale shape: dominance is transitive, so a block-local skyline
    never discards a global skyline row — each block reduces to its
    own front with one vectorized sort + running-max pass
    (O(n log n), no pairwise loop), then the survivors (skyline-mass
    bounded, typically ≪ input) merge in ONE final single-group pass.
    The final pass's input is the concatenated local fronts — if a
    pathological data layout made that large, re-blocking and
    repeating the local pass bounds it (standard skyline-of-skylines
    recursion); one level suffices for any real distribution."""
    keep = list(dict.fromkeys(
        (cols or []) + [min_col, max_col]))

    def _front(df: pd.DataFrame) -> pd.DataFrame:
        if not len(df):
            return df[keep]
        d = df[keep].copy()
        # survive ⇔ y == max y of own x-group (ties on both kept,
        # within-group smaller y dominated via strict y) AND
        # y > max y over all STRICTLY smaller x (dominated via strict
        # x otherwise) — the exact dominance rule, fully vectorized
        gmax = d.groupby(min_col)[max_col].transform("max")
        per_x = d.groupby(min_col, sort=True)[max_col].max()
        prior = per_x.cummax().shift(1)  # exclusive prefix max
        m = d[min_col].map(prior)
        surv = (d[max_col] == gmax) & (m.isna() | (d[max_col] > m))
        return d[surv.to_numpy()]

    local = ds.select_columns(keep).map_batches(
        _front, batch_format="pandas", batch_size=None)
    # ONE single-group merge over the skyline-mass-bounded candidates
    merged = local.map_batches(
        lambda df: df.assign(_g=np.int32(0)),
        batch_format="pandas", batch_size=None)
    return merged.groupby("_g").map_groups(
        lambda df: _front(df.drop(columns=["_g"])),
        batch_format="pandas")


def ntile(ds: Dataset, key_col: str, order_cols: list[str], n: int, *,
          cols: list[str] | None = None,
          n_coarse: int | None = None) -> Dataset:
    """SQL ``NTILE(n) OVER (PARTITION BY key ORDER BY order_cols)`` —
    equal-depth tile assignment per key (quartile/decile bucketing for
    per-host or per-user distribution splits). Matches the SQL
    contract exactly: with ``c`` rows in a partition, the first
    ``c % n`` tiles get ``c // n + 1`` rows, the rest ``c // n``;
    ``order_cols`` must be a TOTAL order within each key (include a
    unique tiebreak column) or tile membership is nondeterministic.

    Scale shape: ONE coarse exchange keyed on ``key_col`` (whole
    partitions co-locate), in-frame mergesort + pure-arithmetic tile
    formula — no per-row Python, no second pass."""
    keep = list(dict.fromkeys([key_col] + order_cols + (cols or [])))

    def _tile(df: pd.DataFrame) -> pd.DataFrame:
        df = df[keep].sort_values([key_col] + order_cols,
                                  kind="mergesort").reset_index(drop=True)
        g = df.groupby(key_col, sort=False)
        rn = g.cumcount().to_numpy(np.int64)          # 0-based row number
        c = g[key_col].transform("size").to_numpy(np.int64)
        base, rem = c // n, c % n
        cut = rem * (base + 1)                        # rows in the fat tiles
        fat = rn < cut
        tile = np.where(
            fat, rn // np.maximum(base + 1, 1),
            # guard: base==0 rows are ALL in fat tiles (rn < cut), so
            # the divisor below is never used with base==0
            rem + (rn - cut) // np.maximum(base, 1)) + 1
        out = df.copy(deep=False)
        out["tile"] = tile.astype(np.int64)
        return out

    return coarse_aggregate(ds.select_columns(keep), [key_col], _tile,
                            n_coarse=n_coarse)


def ks_drift(left: Dataset, right: Dataset, *,
             val_col: str = "v",
             n_coarse: int | None = None) -> Dataset:
    """Two-sample Kolmogorov-Smirnov statistic → one row (n1, n2,
    d_stat): D = max_v |ECDF_left(v) − ECDF_right(v)| — the
    distribution-drift monitor for training-data refreshes (did this
    crawl's quality-score / length / perplexity distribution move?).
    Works on any discrete/binned numeric column; bin continuous
    signals upstream (drift monitors bin anyway).

    Scale shape: tagged union → ONE value-keyed coarse count →
    one single-group fold over the DISTINCT-value table (sorted
    cumsums; the distinct-value cardinality bounds the frame — the
    `skyline`/`histogram` contract). Cumulative counts are exact
    ints; each ECDF step is two single-rounding divisions — the
    gate replays exactly."""
    from omop2obo_ray.pipelines.textpipe import _sanitize_join_output

    lt = left.map_batches(
        lambda b: pa.table({
            "v": b[val_col].combine_chunks().cast(pa.int64()),
            "c1": pa.array([1] * b.num_rows, pa.int64()),
            "c2": pa.array([0] * b.num_rows, pa.int64())}),
        batch_format="pyarrow", batch_size=None)
    rt = right.map_batches(
        lambda b: pa.table({
            "v": b[val_col].combine_chunks().cast(pa.int64()),
            "c1": pa.array([0] * b.num_rows, pa.int64()),
            "c2": pa.array([1] * b.num_rows, pa.int64())}),
        batch_format="pyarrow", batch_size=None)

    g = _sanitize_join_output(
        coarse_aggregate(
            lt.union(rt), ["v"],
            lambda df: df.groupby("v", sort=False)
            .agg(c1=("c1", "sum"), c2=("c2", "sum")).reset_index(),
            n_coarse=n_coarse),
        pa.schema([("v", pa.int64()), ("c1", pa.int64()),
                   ("c2", pa.int64())]))

    def _one(df: pd.DataFrame) -> pd.DataFrame:
        df = df.copy(deep=False)
        df["_g"] = 0
        return df

    def _fin(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values("v", kind="mergesort")
        a1 = df["c1"].to_numpy(np.int64).cumsum()
        a2 = df["c2"].to_numpy(np.int64).cumsum()
        n1, n2 = int(a1[-1]) if len(a1) else 0, \
            int(a2[-1]) if len(a2) else 0
        if n1 and n2:
            d = float(np.max(np.abs(
                a1.astype(np.float64) / n1
                - a2.astype(np.float64) / n2)))
        else:
            d = None
        return pd.DataFrame({"n1": [n1], "n2": [n2],
                             "d_stat": [d]})

    return _sanitize_join_output(
        coarse_aggregate(
            g.map_batches(_one, batch_format="pandas",
                          batch_size=None),
            ["_g"], lambda df: _fin(df.drop(columns=["_g"])),
            n_coarse=n_coarse),
        pa.schema([("n1", pa.int64()), ("n2", pa.int64()),
                   ("d_stat", pa.float64())]))


def psi_drift(left: Dataset, right: Dataset, *, val_col: str = "v",
              n_coarse: int | None = None) -> Dataset:
    """Population Stability Index between two pre-binned samples →
    one row (n1, n2, n_bins, n_skipped, psi): PSI = Σ_b (p1_b −
    p2_b)·ln(p1_b/p2_b) over bins PRESENT IN BOTH samples (bins
    empty on either side are skipped and counted in ``n_skipped`` —
    the eps-free convention, stated explicitly because eps choices
    vary); industry rule of thumb: < 0.1 stable, > 0.25 shifted.
    The standard monitoring pair with :func:`ks_drift` (KS is
    rank-based and eps-free; PSI weights tail mass).

    Same scale shape as ks_drift: ONE value-keyed count + a
    single-group fold bounded by bin cardinality. Counts exact; each
    term is p-divisions, one ln, one multiply — gate quantized for
    the ln."""
    from omop2obo_ray.pipelines.textpipe import _sanitize_join_output

    lt = left.map_batches(
        lambda b: pa.table({
            "v": b[val_col].combine_chunks().cast(pa.int64()),
            "c1": pa.array([1] * b.num_rows, pa.int64()),
            "c2": pa.array([0] * b.num_rows, pa.int64())}),
        batch_format="pyarrow", batch_size=None)
    rt = right.map_batches(
        lambda b: pa.table({
            "v": b[val_col].combine_chunks().cast(pa.int64()),
            "c1": pa.array([0] * b.num_rows, pa.int64()),
            "c2": pa.array([1] * b.num_rows, pa.int64())}),
        batch_format="pyarrow", batch_size=None)

    g = _sanitize_join_output(
        coarse_aggregate(
            lt.union(rt), ["v"],
            lambda df: df.groupby("v", sort=False)
            .agg(c1=("c1", "sum"), c2=("c2", "sum")).reset_index(),
            n_coarse=n_coarse),
        pa.schema([("v", pa.int64()), ("c1", pa.int64()),
                   ("c2", pa.int64())]))

    def _one(df: pd.DataFrame) -> pd.DataFrame:
        df = df.copy(deep=False)
        df["_g"] = 0
        return df

    def _fin(df: pd.DataFrame) -> pd.DataFrame:
        c1 = df["c1"].to_numpy(np.int64)
        c2 = df["c2"].to_numpy(np.int64)
        n1, n2 = int(c1.sum()), int(c2.sum())
        both = (c1 > 0) & (c2 > 0)
        n_sk = int((~both).sum())
        if n1 and n2 and both.any():
            p1 = c1[both].astype(np.float64) / n1
            p2 = c2[both].astype(np.float64) / n2
            psi = float(np.sum((p1 - p2) * np.log(p1 / p2)))
        else:
            psi = None
        return pd.DataFrame({
            "n1": [n1], "n2": [n2], "n_bins": [len(df)],
            "n_skipped": [n_sk], "psi": [psi]})

    return _sanitize_join_output(
        coarse_aggregate(
            g.map_batches(_one, batch_format="pandas",
                          batch_size=None),
            ["_g"], lambda df: _fin(df.drop(columns=["_g"])),
            n_coarse=n_coarse),
        pa.schema([("n1", pa.int64()), ("n2", pa.int64()),
                   ("n_bins", pa.int64()), ("n_skipped", pa.int64()),
                   ("psi", pa.float64())]))


def entropy_per_key(ds: Dataset, *, key_col: str, val_col: str,
                    n_coarse: int | None = None) -> Dataset:
    """Shannon entropy of the categorical value distribution per key
    → (key, n, n_distinct, entropy): H = −Σ p·ln p (nats) — the
    diversity audit beside :func:`gini_per_key`'s concentration (a
    host serving one template page has H ≈ 0; entropy of per-host
    content types, per-source languages, per-user event mixes).
    Single-value keys report 0.0 exactly.

    Scale shape: ONE (key, value)-keyed coarse count → ONE key-keyed
    fold over the distinct-value counts (never the raw rows twice).
    Counts exact; ln terms folded per-key in value order — gate
    quantized."""
    from omop2obo_ray.pipelines.textpipe import (_pa_schema_of,
                                                 _sanitize_join_output)

    kt = _pa_schema_of(ds).field(key_col).type

    def _cnt(df: pd.DataFrame) -> pd.DataFrame:
        out = df.copy(deep=False)
        out["_v"] = df[val_col].astype(str)
        return (out.groupby([key_col, "_v"], sort=False)
                .size().rename("nn").reset_index())

    g = _sanitize_join_output(
        coarse_aggregate(
            ds.map_batches(_cnt, batch_format="pandas",
                           batch_size=None),
            [key_col, "_v"],
            lambda df: df.groupby([key_col, "_v"], sort=False)["nn"]
            .sum().reset_index(), n_coarse=n_coarse),
        pa.schema([(key_col, kt), ("_v", pa.string()),
                   ("nn", pa.int64())]))

    def _fold(df: pd.DataFrame) -> pd.DataFrame:
        rows = []
        for key, gg in df.groupby(key_col, sort=False):
            gg = gg.sort_values("_v", kind="mergesort")
            c = gg["nn"].to_numpy(np.int64)
            n = int(c.sum())
            p = c.astype(np.float64) / n
            h = float(-np.sum(p * np.log(p)))
            rows.append((key, n, len(c), h))
        return pd.DataFrame(rows, columns=[key_col, "n",
                                           "n_distinct", "entropy"])

    return _sanitize_join_output(
        coarse_aggregate(g, [key_col], _fold, n_coarse=n_coarse),
        pa.schema([(key_col, kt), ("n", pa.int64()),
                   ("n_distinct", pa.int64()),
                   ("entropy", pa.float64())]))


def spearman_per_key(ds: Dataset, *, key_col: str, x_col: str,
                     y_col: str,
                     n_coarse: int | None = None) -> Dataset:
    """Per-group Spearman rank correlation → (key, n, rho): Pearson
    correlation of the average-method ranks (ties share the mean of
    their positions — the same value SQL's
    ``RANK() + (tie_count − 1)/2`` produces) — the robust,
    monotonic-relationship sibling of :func:`grouped_corr` (a single
    wild pair cannot dominate). Degenerate groups (n < 2 or a
    zero-variance rank vector) yield null rho.

    ONE key-keyed coarse exchange; in-frame vectorized pandas
    ``rank(method='average')`` + the closed-form Pearson on ranks.
    Gate quantized (rank sums are exact, the correlation's float
    accumulation order differs from SQL's corr())."""
    from omop2obo_ray.pipelines.textpipe import (_pa_schema_of,
                                                 _sanitize_join_output)

    kt = _pa_schema_of(ds).field(key_col).type

    def _fold(df: pd.DataFrame) -> pd.DataFrame:
        rows = []
        for key, g in df.groupby(key_col, sort=False):
            n = len(g)
            rho = None
            if n > 1:
                rx = g[x_col].rank(method="average") \
                    .to_numpy(np.float64)
                ry = g[y_col].rank(method="average") \
                    .to_numpy(np.float64)
                dx = rx - rx.mean()
                dy = ry - ry.mean()
                den = float(np.sqrt(np.sum(dx * dx)
                                    * np.sum(dy * dy)))
                if den > 0.0:
                    rho = float(np.sum(dx * dy) / den)
            rows.append((key, n, rho))
        return pd.DataFrame(rows, columns=[key_col, "n", "rho"])

    return _sanitize_join_output(
        coarse_aggregate(ds.map_batches(
            lambda b: pa.table({key_col: b[key_col],
                                x_col: b[x_col], y_col: b[y_col]}),
            batch_format="pyarrow", batch_size=None),
            [key_col], _fold, n_coarse=n_coarse),
        pa.schema([(key_col, kt), ("n", pa.int64()),
                   ("rho", pa.float64())]))


def cramers_v(ds: Dataset, *, a_col: str, b_col: str,
              n_coarse: int | None = None) -> Dataset:
    """Cramér's V association between two categorical columns → one
    row (n, r, c, chi2, v): χ² over the contingency table and
    V = √(χ²/(n·min(r−1, c−1))) ∈ [0, 1] — the categorical
    association/drift audit (is `lang` independent of `source`?),
    generalizing the reference's hand-rolled chi-square analysis
    (`omop2obo` manuscript stats) to any column pair. Degenerate
    single-level tables yield null V.

    Scale shape: per-block (a, b) pair counts → ONE pair-keyed
    merge (bounded by level-pair cardinality) → single-frame χ²
    fold (expected counts from the marginals of the SAME table).
    Counts exact int64; χ² terms folded in sorted (a, b) order —
    gate quantized for the float sum."""
    from omop2obo_ray.pipelines.textpipe import _sanitize_join_output

    def _part(df: pd.DataFrame) -> pd.DataFrame:
        return (df.groupby([a_col, b_col], sort=False)
                .size().rename("nn").reset_index())

    part = ds.map_batches(_part, batch_format="pandas",
                          batch_size=None)
    g = _sanitize_join_output(
        coarse_aggregate(
            part.map_batches(
                lambda df: df.assign(
                    a=df[a_col].astype(str),
                    b=df[b_col].astype(str))[["a", "b", "nn"]],
                batch_format="pandas", batch_size=None),
            ["a", "b"],
            lambda df: df.groupby(["a", "b"], sort=False)["nn"]
            .sum().reset_index(), n_coarse=n_coarse),
        pa.schema([("a", pa.string()), ("b", pa.string()),
                   ("nn", pa.int64())]))

    def _one(df: pd.DataFrame) -> pd.DataFrame:
        df = df.copy(deep=False)
        df["_g"] = 0
        return df

    def _fin(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(["a", "b"], kind="mergesort")
        n = int(df["nn"].sum())
        ra = df.groupby("a")["nn"].sum()
        cb = df.groupby("b")["nn"].sum()
        r, c = len(ra), len(cb)
        e = (df["a"].map(ra).to_numpy(np.float64)
             * df["b"].map(cb).to_numpy(np.float64)) / n
        d = df["nn"].to_numpy(np.float64) - e
        # absent (zero-count) cells each contribute E to chi2:
        # Σ_absent E = Σ_all E − Σ_present E = n − Σ_present E
        chi2 = float(np.sum(d * d / e)) + (float(n)
                                           - float(np.sum(e)))
        denom = n * min(r - 1, c - 1)
        v = float(np.sqrt(chi2 / denom)) if denom > 0 else None
        return pd.DataFrame({"n": [n], "r": [r], "c": [c],
                             "chi2": [chi2], "v": [v]})

    return _sanitize_join_output(
        coarse_aggregate(
            g.map_batches(_one, batch_format="pandas",
                          batch_size=None),
            ["_g"], lambda df: _fin(df.drop(columns=["_g"])),
            n_coarse=n_coarse),
        pa.schema([("n", pa.int64()), ("r", pa.int64()),
                   ("c", pa.int64()), ("chi2", pa.float64()),
                   ("v", pa.float64())]))


def js_divergence(left: Dataset, right: Dataset, *,
                  val_col: str = "v",
                  n_coarse: int | None = None) -> Dataset:
    """Jensen-Shannon divergence between two pre-binned samples →
    one row (n1, n2, n_bins, jsd): JSD = ½KL(p‖m) + ½KL(q‖m),
    m = (p+q)/2 — the bounded (≤ ln 2), symmetric member of the
    drift trio (:func:`ks_drift` rank-based, :func:`psi_drift`
    eps-sensitive, JSD defined for EVERY bin incl. one-sided ones —
    0·ln0 ≡ 0, and m > 0 wherever either side has mass, so nothing
    is skipped).

    Same shape as its siblings: ONE value-keyed count + a
    bin-bounded single-group fold; counts exact, ln terms folded in
    bin order — gate quantized."""
    from omop2obo_ray.pipelines.textpipe import _sanitize_join_output

    lt = left.map_batches(
        lambda b: pa.table({
            "v": b[val_col].combine_chunks().cast(pa.int64()),
            "c1": pa.array([1] * b.num_rows, pa.int64()),
            "c2": pa.array([0] * b.num_rows, pa.int64())}),
        batch_format="pyarrow", batch_size=None)
    rt = right.map_batches(
        lambda b: pa.table({
            "v": b[val_col].combine_chunks().cast(pa.int64()),
            "c1": pa.array([0] * b.num_rows, pa.int64()),
            "c2": pa.array([1] * b.num_rows, pa.int64())}),
        batch_format="pyarrow", batch_size=None)

    g = _sanitize_join_output(
        coarse_aggregate(
            lt.union(rt), ["v"],
            lambda df: df.groupby("v", sort=False)
            .agg(c1=("c1", "sum"), c2=("c2", "sum")).reset_index(),
            n_coarse=n_coarse),
        pa.schema([("v", pa.int64()), ("c1", pa.int64()),
                   ("c2", pa.int64())]))

    def _one(df: pd.DataFrame) -> pd.DataFrame:
        df = df.copy(deep=False)
        df["_g"] = 0
        return df

    def _fin(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values("v", kind="mergesort")
        c1 = df["c1"].to_numpy(np.int64)
        c2 = df["c2"].to_numpy(np.int64)
        n1, n2 = int(c1.sum()), int(c2.sum())
        if n1 and n2:
            p = c1.astype(np.float64) / n1
            q = c2.astype(np.float64) / n2
            m = 0.5 * (p + q)
            with np.errstate(divide="ignore", invalid="ignore"):
                t1 = np.where(p > 0.0, p * np.log(p / m), 0.0)
                t2 = np.where(q > 0.0, q * np.log(q / m), 0.0)
            jsd = float(0.5 * np.sum(t1) + 0.5 * np.sum(t2))
        else:
            jsd = None
        return pd.DataFrame({"n1": [n1], "n2": [n2],
                             "n_bins": [len(df)], "jsd": [jsd]})

    return _sanitize_join_output(
        coarse_aggregate(
            g.map_batches(_one, batch_format="pandas",
                          batch_size=None),
            ["_g"], lambda df: _fin(df.drop(columns=["_g"])),
            n_coarse=n_coarse),
        pa.schema([("n1", pa.int64()), ("n2", pa.int64()),
                   ("n_bins", pa.int64()), ("jsd", pa.float64())]))


def mad_outliers(ds: Dataset, *, key_col: str, val_col: str,
                 id_col: str, z_thresh: float = 3.5,
                 n_coarse: int | None = None) -> Dataset:
    """Per-group robust outlier flagging via the median absolute
    deviation (Iglewicz-Hoaglin modified z-score) → (id, key, val,
    mad_z, is_outlier): z = 0.6745·(val − median)/MAD with MAD =
    median(|val − median|) — the robust sibling of
    :func:`grouped_outliers` (a single wild value cannot drag the
    center the way it drags a mean/std). MAD = 0 or singleton groups
    yield null z and flag 0.

    Scale shape: ONE key-keyed coarse exchange; both medians are
    in-frame vectorized `np.median` calls ((a+b)/2 interpolation —
    the same arithmetic SQL's `median()` performs on integers, so
    the gate replays exactly). Frames are per-key windows like every
    windowed op here."""
    from omop2obo_ray.pipelines.textpipe import (_pa_schema_of,
                                                 _sanitize_join_output)

    kt = _pa_schema_of(ds).field(key_col).type
    vt = _pa_schema_of(ds).field(val_col).type
    ds = ds.map_batches(
        lambda b: pa.table({id_col: b[id_col], key_col: b[key_col],
                            val_col: b[val_col]}),
        batch_format="pyarrow", batch_size=None)

    def _fold(df: pd.DataFrame) -> pd.DataFrame:
        out = []
        for key, g in df.groupby(key_col, sort=False):
            v = g[val_col].to_numpy(np.float64)
            med = float(np.median(v))
            mad = float(np.median(np.abs(v - med)))
            o = g.copy(deep=False)
            if len(v) > 1 and mad > 0.0:
                z = 0.6745 * (v - med) / mad
                o["mad_z"] = z
                o["is_outlier"] = (np.abs(z)
                                   > z_thresh).astype(np.int64)
            else:
                o["mad_z"] = np.nan
                o["is_outlier"] = np.int64(0)
            out.append(o)
        return pd.concat(out) if out else df

    return _sanitize_join_output(
        coarse_aggregate(ds, [key_col], _fold, n_coarse=n_coarse),
        pa.schema([(id_col, pa.int64()), (key_col, kt),
                   (val_col, vt), ("mad_z", pa.float64()),
                   ("is_outlier", pa.int64())]))


def bag_set_op(left: Dataset, right: Dataset, op: str, *,
               n_coarse: int | None = None) -> Dataset:
    """Multiset (bag) set operations — SQL's INTERSECT ALL /
    EXCEPT ALL, the multiplicity-preserving siblings of the gated
    set-semantics ops: ``op='intersect'`` keeps each distinct row
    min(count_left, count_right) times; ``op='except'`` keeps it
    max(0, count_left − count_right) times. Schemas must match.

    Scale shape: tagged union → ONE coarse exchange keyed on ALL
    columns (the row tuple is the key) → per-distinct-row count
    arithmetic + an index-repeat emit. Row multiplicity never
    materializes anywhere except the output itself."""
    if op not in ("intersect", "except"):
        raise ValueError(f"bag_set_op: unknown op {op!r}")
    from omop2obo_ray.pipelines.textpipe import (_pa_schema_of,
                                                 _sanitize_join_output)

    sch = _pa_schema_of(left)
    cols = list(sch.names)

    lt = left.map_batches(
        lambda df: df.assign(_side=np.int8(0)),
        batch_format="pandas", batch_size=None)
    rt = right.map_batches(
        lambda df: df.assign(_side=np.int8(1)),
        batch_format="pandas", batch_size=None)

    def _emit(df: pd.DataFrame) -> pd.DataFrame:
        g = (df.groupby(cols, sort=False, dropna=False)["_side"]
             .agg(cl=lambda s: int((s == 0).sum()),
                  cr=lambda s: int((s == 1).sum())).reset_index())
        if op == "intersect":
            g["_k"] = np.minimum(g["cl"], g["cr"])
        else:
            g["_k"] = np.maximum(g["cl"] - g["cr"], 0)
        g = g[g["_k"] > 0]
        out = g.loc[g.index.repeat(g["_k"])]
        return out[cols]

    return _sanitize_join_output(
        coarse_aggregate(lt.union(rt), cols, _emit,
                         n_coarse=n_coarse),
        pa.schema(list(zip(sch.names, sch.types))))


def gini_per_key(ds: Dataset, *, key_col: str, val_col: str,
                 n_coarse: int | None = None) -> Dataset:
    """Gini concentration coefficient per key → (key, n, total,
    gini): G = Σ_i (2i − n − 1)·x_(i) / (n·Σx) over the ascending
    sort (i 1-based) — the skew audit for per-host page counts /
    per-domain token mass (a crawl where one host owns half the
    corpus shows up as G → 1). Tie order cannot change the sum
    (equal values share their coefficient block), so no tie-break
    is needed on either side. Zero-total or singleton keys yield
    null gini.

    Scale shape: ONE key-keyed coarse exchange; in-frame vectorized
    sort + dot. The numerator and denominator are exact int64 for
    integer inputs — ONE final IEEE division, gate exact."""
    from omop2obo_ray.pipelines.textpipe import (_pa_schema_of,
                                                 _sanitize_join_output)

    kt = _pa_schema_of(ds).field(key_col).type

    def _fold(df: pd.DataFrame) -> pd.DataFrame:
        rows = []
        for key, g in df.groupby(key_col, sort=False):
            x = np.sort(g[val_col].to_numpy(np.int64))
            n = len(x)
            tot = int(x.sum())
            if n > 1 and tot > 0:
                i = np.arange(1, n + 1, dtype=np.int64)
                num = int(np.sum((2 * i - n - 1) * x))
                gini = num / (n * tot)
            else:
                gini = None
            rows.append((key, n, tot, gini))
        return pd.DataFrame(rows, columns=[key_col, "n", "total",
                                           "gini"])

    return _sanitize_join_output(
        coarse_aggregate(ds, [key_col], _fold, n_coarse=n_coarse),
        pa.schema([(key_col, kt), ("n", pa.int64()),
                   ("total", pa.int64()), ("gini", pa.float64())]))


def calibration_bins(ds: Dataset, *, score_col: str, label_col: str,
                     n_bins: int = 10,
                     n_coarse: int | None = None) -> Dataset:
    """Reliability-diagram bins for probabilistic model scores →
    one row per non-empty bin: (bin, n, mean_score, frac_pos,
    gap = |frac_pos − mean_score|) — the per-bin decomposition of
    expected calibration error (ECE = Σ n_b/N · gap_b; sum the
    output). Bin = min(floor(score·n_bins), n_bins−1), scores in
    [0, 1], labels 0/1.

    Scale shape: per-block partials (bin → count, Σscore, Σlabel)
    → ONE tiny bin-keyed merge (≤ n_bins groups) → vectorized
    ratios. Label sums are exact ints; score sums are float partials
    (combiner reassociation — gate quantized like `grouped_corr`)."""
    def _part(df: pd.DataFrame) -> pd.DataFrame:
        s = df[score_col].to_numpy(np.float64)
        y = df[label_col].to_numpy(np.int64)
        b = np.minimum((np.floor(s * n_bins)).astype(np.int64),
                       n_bins - 1)
        g = pd.DataFrame({"bin": b, "s": s, "y": y})
        return (g.groupby("bin", sort=False)
                .agg(n=("s", "size"), ss=("s", "sum"),
                     sy=("y", "sum")).reset_index())

    part = ds.map_batches(_part, batch_format="pandas",
                          batch_size=None)

    def _merge(df: pd.DataFrame) -> pd.DataFrame:
        g = (df.groupby("bin", sort=False)
             .agg(n=("n", "sum"), ss=("ss", "sum"),
                  sy=("sy", "sum")).reset_index())
        g["mean_score"] = g["ss"] / g["n"]
        g["frac_pos"] = g["sy"] / g["n"]
        g["gap"] = (g["frac_pos"] - g["mean_score"]).abs()
        return g[["bin", "n", "mean_score", "frac_pos", "gap"]]

    from omop2obo_ray.pipelines.textpipe import _sanitize_join_output

    return _sanitize_join_output(
        coarse_aggregate(part, ["bin"], _merge, n_coarse=n_coarse),
        pa.schema([("bin", pa.int64()), ("n", pa.int64()),
                   ("mean_score", pa.float64()),
                   ("frac_pos", pa.float64()),
                   ("gap", pa.float64())]))


def cusum_flags(ds: Dataset, *, key_col: str, ts_col: str,
                val_col: str, id_col: str, target: float,
                threshold: float,
                n_coarse: int | None = None) -> Dataset:
    """Per-key CUSUM change-point detection (Page 1954) → input keys
    plus (cusum_pos, cusum_neg, flag): s⁺_t = max(0, s⁺_{t−1} + d_t)
    and s⁻_t = min(0, s⁻_{t−1} + d_t) with d_t = val_t − target,
    rows ordered by (ts, id) within key; flag = 1 where s⁺ >
    ``threshold`` or s⁻ < −``threshold`` (drift alarms on quality /
    latency / rate streams).

    The reset-recurrences vectorize exactly via the prefix-extrema
    identity s⁺_t = c_t − min(0, min_{j≤t} c_j) (and symmetrically
    s⁻ with max), c = prefix sum of d — one `cumsum` + one
    `minimum.accumulate` per frame, no Python loop, and the SAME
    identity is expressible as SQL window functions, so integer
    inputs gate exactly. ONE key-keyed coarse exchange (the
    `ewma`/`streaks` shape)."""
    from omop2obo_ray.pipelines.textpipe import (_pa_schema_of,
                                                 _sanitize_join_output)

    sch = _pa_schema_of(ds)

    def _scan(df: pd.DataFrame) -> pd.DataFrame:
        out = []
        for _, g in df.groupby(key_col, sort=False):
            g = g.sort_values([ts_col, id_col], kind="mergesort")
            d = g[val_col].to_numpy(np.float64) - float(target)
            c = np.cumsum(d)
            lo = np.minimum(np.minimum.accumulate(c), 0.0)
            hi = np.maximum(np.maximum.accumulate(c), 0.0)
            pos = c - lo
            neg = c - hi
            g = g.assign(cusum_pos=pos, cusum_neg=neg,
                         flag=((pos > threshold)
                               | (neg < -threshold)).astype(np.int64))
            out.append(g)
        return pd.concat(out) if out else df

    out_schema = pa.schema(
        list(zip(sch.names, sch.types))
        + [("cusum_pos", pa.float64()), ("cusum_neg", pa.float64()),
           ("flag", pa.int64())])
    return _sanitize_join_output(
        coarse_aggregate(ds, [key_col], _scan, n_coarse=n_coarse),
        out_schema)


def kfold_assign(ds: Dataset, k: int, *, id_col: str,
                 strata_col: str | None = None,
                 n_coarse: int | None = None) -> Dataset:
    """Deterministic stratified k-fold assignment (cross-validation
    splits) → input rows + ``fold`` ∈ [0, k): within each stratum
    rows are ordered by the pinned multiplicative hash of ``id``
    (ties by id) and fold = rank % k — folds are balanced to ±1 row
    PER STRATUM by construction (hash-mod splits like
    `train_test_split` only balance in expectation), reproducible
    across runs/repartitions, and exactly SQL-replayable as a
    ROW_NUMBER. No strata ⇒ one global stratum.

    Scale shape: ONE stratum-keyed coarse exchange with a vectorized
    in-frame argsort — same contract as `ntile`/`window_rank`;
    stratum cardinality bounds the frame like any window."""
    if k < 2:
        raise ValueError("kfold_assign: k must be >= 2")
    from omop2obo_ray.pipelines.textpipe import (_pa_schema_of,
                                                 _sanitize_join_output)

    sch = _pa_schema_of(ds)

    def _with_stratum(df: pd.DataFrame) -> pd.DataFrame:
        out = df.copy(deep=False)
        out["_st"] = (df[strata_col].astype(str) if strata_col
                      else "_all")
        return out

    def _assign(df: pd.DataFrame) -> pd.DataFrame:
        ids = df[id_col].to_numpy(np.int64)
        # reduce mod 2^31 BEFORE multiplying: int64 wraparound for
        # |id| >~ 2^32 would diverge from the SQL ROW_NUMBER replay
        # (DuckDB BIGINT errors/promotes instead of wrapping) — same
        # pinned form the mask_tokens / sample oracles use
        h = ((ids % np.int64(2**31)) * np.int64(2654435761)) \
            % np.int64(2**32)
        order = np.lexsort((ids, h))
        rank = np.empty(len(df), np.int64)
        rank[order] = np.arange(len(df))
        out = df.copy(deep=False)
        out["fold"] = rank % k
        return out.drop(columns=["_st"])

    out_schema = pa.schema(list(zip(sch.names, sch.types))
                           + [("fold", pa.int64())])
    return _sanitize_join_output(
        coarse_aggregate(
            ds.map_batches(_with_stratum, batch_format="pandas",
                           batch_size=None),
            ["_st"],
            lambda df: pd.concat([
                _assign(g) for _, g in df.groupby("_st", sort=False)
            ]) if len(df) else df.drop(columns=["_st"]),
            n_coarse=n_coarse), out_schema)


def grouped_outliers(ds: Dataset, key_col: str, val_col: str,
                     id_col: str, *, z_thresh: float = 3.0,
                     n_coarse: int | None = None) -> Dataset:
    """Per-group z-score outlier flagging (data-cleaning primitive)
    → (id, key, val, z, is_outlier): z = (val − mean_g)/std_g with
    population std; single-member or zero-variance groups yield null
    z and is_outlier = 0 (no basis for deviation).

    Scale shape: block-local sufficient-stats partials
    (count, Σ, Σ²) → ONE key-keyed coarse merge → broadcast-free
    second pass attaching stats by ONE ``coarse_join`` and flagging
    in-map. Integer-typed values accumulate in exact int64 (no float
    reassociation anywhere before the final single-rounding
    mean/std/z expressions — the gate runs EXACT); float inputs take
    the same path in float64 with the usual combiner tolerance."""
    from omop2obo_ray.functions.shuffle import coarse_join
    from omop2obo_ray.pipelines.textpipe import (_pa_schema_of,
                                                 _sanitize_join_output)

    vt = _pa_schema_of(ds).field(val_col).type
    integral = pa.types.is_integer(vt)
    acc = np.int64 if integral else np.float64
    sum_t = pa.int64() if integral else pa.float64()

    def _part(df: pd.DataFrame) -> pd.DataFrame:
        v = df[val_col].to_numpy(acc)
        g = pd.DataFrame({"k": df[key_col], "v": v, "v2": v * v})
        out = (g.groupby("k", sort=False)
               .agg(n=("v", "size"), s=("v", "sum"),
                    sq=("v2", "sum")).reset_index())
        return out

    part = ds.map_batches(_part, batch_format="pandas",
                          batch_size=None)

    def _merge(df: pd.DataFrame) -> pd.DataFrame:
        return (df.groupby("k", sort=False)
                .agg(n=("n", "sum"), s=("s", "sum"),
                     sq=("sq", "sum")).reset_index())

    kt = _pa_schema_of(ds).field(key_col).type
    stats = _sanitize_join_output(
        coarse_aggregate(part, ["k"], _merge, n_coarse=n_coarse),
        pa.schema([("k", kt), ("n", pa.int64()), ("s", sum_t),
                   ("sq", sum_t)]))

    slim = ds.map_batches(
        lambda b: pa.table({id_col: b[id_col], key_col: b[key_col],
                            val_col: b[val_col]}),
        batch_format="pyarrow", batch_size=None)
    joined = coarse_join(slim, stats.map_batches(
        lambda b: pa.table({"k2": b["k"], "n": b["n"], "s": b["s"],
                            "sq": b["sq"]}),
        batch_format="pyarrow", batch_size=None),
        on=key_col, right_on="k2", how="inner", n_coarse=n_coarse)

    def _flag(b: pa.Table) -> pa.Table:
        v = b[val_col].combine_chunks().to_numpy(
            zero_copy_only=False).astype(np.float64)
        n = b["n"].combine_chunks().to_numpy(zero_copy_only=False) \
            .astype(np.float64)
        s = b["s"].combine_chunks().to_numpy(zero_copy_only=False) \
            .astype(np.float64)
        sq = b["sq"].combine_chunks().to_numpy(zero_copy_only=False) \
            .astype(np.float64)
        mean = s / n
        var = sq / n - mean * mean
        with np.errstate(invalid="ignore"):
            std = np.sqrt(var)
        ok = (n > 1) & (std > 0.0)
        with np.errstate(invalid="ignore", divide="ignore"):
            z = np.where(ok, (v - mean) / std, np.nan)
        flag = np.where(ok & (np.abs(z) > z_thresh), 1, 0)
        return pa.table({
            id_col: b[id_col], key_col: b[key_col],
            val_col: b[val_col],
            "z": pa.array(np.where(ok, z, 0.0), pa.float64(),
                          mask=~ok),
            "is_outlier": pa.array(flag.astype(np.int64),
                                   pa.int64())})

    return joined.map_batches(_flag, batch_format="pyarrow",
                              batch_size=None)


def grouped_corr(ds: Dataset, key_col: str, x_col: str, y_col: str, *,
                 n_coarse: int | None = None) -> Dataset:
    """Per-group Pearson correlation + least-squares line
    (``corr`` / ``regr_slope`` / ``regr_intercept`` semantics, rows
    with a null in either column excluded pairwise like SQL).

    Scale shape: the textbook combiner decomposition — each block
    reduces to per-key sufficient statistics ``(n, Σx, Σy, Σxx, Σyy,
    Σxy)`` with ONE vectorized pandas groupby (6 numbers per key per
    block, regardless of block size), the coarse exchange ships only
    those partials, and one vectorized finalize evaluates the closed
    forms. Nothing rescans the data and no driver state exists.

    Groups with < 2 rows or zero variance get null corr/slope, like
    SQL. Float caveat: sums reassociate across blocks, so gates
    against a SQL oracle must quantize (epsilon-floor, the repo
    convention)."""
    def _partial(df: pd.DataFrame) -> pd.DataFrame:
        d = df[[key_col, x_col, y_col]].dropna()
        x = d[x_col].astype(np.float64)
        y = d[y_col].astype(np.float64)
        t = pd.DataFrame({key_col: d[key_col], "n": np.int64(1),
                          "sx": x, "sy": y, "sxx": x * x, "syy": y * y,
                          "sxy": x * y})
        return t.groupby(key_col, sort=False, as_index=False).sum()

    parts = ds.select_columns([key_col, x_col, y_col]).map_batches(
        _partial, batch_format="pandas", batch_size=None)

    def _final(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby(key_col, sort=False, as_index=False).sum()
        n = g["n"].to_numpy(np.float64)
        sx, sy = g["sx"].to_numpy(), g["sy"].to_numpy()
        sxx, syy, sxy = (g["sxx"].to_numpy(), g["syy"].to_numpy(),
                         g["sxy"].to_numpy())
        cov = n * sxy - sx * sy
        vx = n * sxx - sx * sx
        vy = n * syy - sy * sy
        with np.errstate(divide="ignore", invalid="ignore"):
            corr = np.where((vx > 0) & (vy > 0) & (n > 1),
                            cov / np.sqrt(vx * vy), np.nan)
            slope = np.where(vx > 0, cov / vx, np.nan)
            icept = np.where(vx > 0, (sy - slope * sx) / n, np.nan)
        return pd.DataFrame({key_col: g[key_col],
                             "n": g["n"].astype(np.int64),
                             "corr": corr, "slope": slope,
                             "intercept": icept})

    return coarse_aggregate(parts, [key_col], _final, n_coarse=n_coarse)


def streaks(events: Dataset, *, user_col: str = "user_id",
            ts_col: str = "ts",
            n_coarse: int | None = None) -> Dataset:
    """Gaps-and-islands over per-user ACTIVE DAYS → one row per
    maximal consecutive-day run: ``(user, start_day, n_days)`` —
    engagement streaks / crawl-freshness runs, the classic islands
    problem (SQL's day − DENSE_RANK grouping trick).

    Scale shape: project to (user, day) with per-block dedup BEFORE
    the shuffle (hot users collapse to their distinct days early),
    then ONE coarse exchange keyed user; inside the frame the island
    id is the vectorized day − rank difference and runs aggregate with
    one pandas groupby. No driver state; per-user state is bounded by
    distinct active days."""

    def _slim(df: pd.DataFrame) -> pd.DataFrame:
        out = pd.DataFrame({
            user_col: df[user_col],
            "day": df[ts_col].dt.floor("D")})
        return out.drop_duplicates()

    slim = events.select_columns([user_col, ts_col]).map_batches(
        _slim, batch_format="pandas", batch_size=None)

    def _islands(df: pd.DataFrame) -> pd.DataFrame:
        d = df.drop_duplicates().sort_values([user_col, "day"],
                                             kind="mergesort")
        # whole days since epoch — resolution-independent (parquet
        # timestamps arrive as us, from_pandas as ns)
        dayn = (d["day"] - pd.Timestamp("1970-01-01")).dt.days
        rank = d.groupby(user_col, sort=False).cumcount()
        island = dayn - rank                      # constant within a run
        g = d.assign(_i=island).groupby([user_col, "_i"], sort=False)
        out = g.agg(start_day=("day", "min"),
                    n_days=("day", "size")).reset_index()
        out["start_day"] = out["start_day"].dt.strftime("%Y-%m-%d")
        out["n_days"] = out["n_days"].astype(np.int64)
        return out.drop(columns=["_i"])

    return coarse_aggregate(slim, [user_col], _islands,
                            n_coarse=n_coarse)


def skipgram_pairs(events: Dataset, *, key_col: str = "user_id",
                   item_col: str = "event_type",
                   order_cols: list[str] | None = None,
                   window: int = 2,
                   n_coarse: int | None = None) -> Dataset:
    """Skip-gram (center, context) pair counts over per-key ordered
    item sequences — the word2vec/item2vec training-pair generator
    (Mikolov'13): within each key's sequence, every ordered pair of
    positions at distance 1..window contributes one (center, context)
    observation in EACH direction. Returns ``(center, context, n)``.

    ``order_cols`` must be a total order within each key (default
    ``["ts", "event_id"]``) — same contract as :func:`ntile`.

    Scale shape: ONE coarse exchange keyed ``key_col`` co-locates each
    sequence; inside the frame the pairs for all offsets 1..window are
    emitted with vectorized shifts (no per-row Python) and pre-counted
    per frame; a second coarse exchange sums the per-frame partial
    counts — classic combiner-first, so the pair exchange ships counts,
    not raw pairs."""
    order_cols = order_cols or ["ts", "event_id"]
    keep = list(dict.fromkeys([key_col, item_col] + order_cols))

    def _pairs(df: pd.DataFrame) -> pd.DataFrame:
        d = df[keep].sort_values([key_col] + order_cols,
                                 kind="mergesort")
        key = d[key_col].to_numpy()
        item = d[item_col].to_numpy()
        outs = []
        for off in range(1, window + 1):
            same = key[off:] == key[:-off] if len(d) > off else \
                np.zeros(0, bool)
            a, b = item[:-off][same], item[off:][same]
            outs.append(pd.DataFrame({"center": a, "context": b}))
            outs.append(pd.DataFrame({"center": b, "context": a}))
        if not outs:
            return pd.DataFrame({"center": item[:0], "context": item[:0],
                                 "n": np.zeros(0, np.int64)})
        p = pd.concat(outs, ignore_index=True)
        g = (p.groupby(["center", "context"], sort=False)
             .size().rename("n").reset_index())
        g["n"] = g["n"].astype(np.int64)
        return g

    partial = coarse_aggregate(events.select_columns(keep), [key_col],
                               _pairs, n_coarse=n_coarse)

    def _sum(df: pd.DataFrame) -> pd.DataFrame:
        g = (df.groupby(["center", "context"], sort=False)["n"]
             .sum().reset_index())
        g["n"] = g["n"].astype(np.int64)
        return g

    return coarse_aggregate(partial, ["center", "context"], _sum,
                            n_coarse=n_coarse)


def cap_per_key(ds: Dataset, key_col: str, id_col: str, k: int, *,
                cols: list[str] | None = None,
                n_coarse: int | None = None) -> Dataset:
    """Deterministic per-key row cap: keep at most ``k`` rows per key,
    chosen by the pinned hash order ``h = (id · 2654435761) mod 2³²``
    then ``id`` — the per-domain page cap every web-corpus recipe
    applies (C4/RefinedWeb cap pages per host so head domains don't
    dominate the training mix). Hash order ≈ a uniform random sample
    per key, yet reproducible across runs and SQL-expressible
    (Knuth's multiplicative hash); ``id_col`` must be integer and
    unique within a key for the order to be total.

    Scale shape: ONE coarse exchange keyed ``key_col``; inside the
    frame a vectorized sort + per-key cumcount keeps the first ``k``.
    A hot key's rows co-locate (same as any keyed exchange) — the
    frame holds the key's rows only transiently and emits ≤ k."""
    keep = list(dict.fromkeys([key_col, id_col] + (cols or [])))

    def _cap(df: pd.DataFrame) -> pd.DataFrame:
        d = df[keep].copy(deep=False)
        ids = d[id_col].to_numpy(np.int64)
        d["_h"] = (ids * np.int64(2654435761)) % np.int64(2**32)
        d = d.sort_values([key_col, "_h", id_col], kind="mergesort")
        rn = d.groupby(key_col, sort=False).cumcount()
        return d[rn.to_numpy() < k].drop(columns=["_h"])

    return coarse_aggregate(ds.select_columns(keep), [key_col], _cap,
                            n_coarse=n_coarse)


def scd2_intervals(ds: Dataset, *, key_col: str = "user_id",
                   ts_col: str = "ts", val_col: str = "event_type",
                   tiebreak_col: str = "event_id",
                   n_coarse: int | None = None) -> Dataset:
    """Slowly-changing-dimension (type 2) compaction: collapse the
    per-key observation stream into validity intervals — one row per
    maximal run of consecutive observations with the same value,
    ``(key, value, effective_from, effective_to)``, where
    ``effective_to`` is the start of the NEXT run (half-open interval)
    and null for the key's current value. This is the temporal-KG step
    of crawl refresh: given (url, warc_ts, extracted-fact) rows across
    crawl snapshots, it yields each fact's validity window instead of
    one row per crawl.

    Row order within a key is ``(ts, tiebreak)`` — the tiebreak makes
    runs deterministic when one timestamp carries several observations
    (two crawls of a url in the same second). Values must be non-null
    (null-vs-null comparison would split runs pandas-side and merge
    them SQL-side).

    Scale shape: ONE coarse exchange keyed ``key_col`` (every row of a
    key lands in one frame); inside the frame run boundaries are one
    vectorized shift-compare, run rows one boolean take, and
    ``effective_to`` one shift(-1) masked to same-key — no per-key
    Python loop. Driver state: none. A hot key (a url recrawled 10⁶
    times) concentrates in one frame like any keyed exchange; the
    output is bounded by the number of VALUE CHANGES, so boilerplate
    keys collapse to a handful of intervals."""
    keep = [key_col, ts_col, val_col, tiebreak_col]

    def _runs(df: pd.DataFrame) -> pd.DataFrame:
        d = df.sort_values([key_col, ts_col, tiebreak_col],
                           kind="mergesort").reset_index(drop=True)
        k = d[key_col]
        v = d[val_col]
        start = (k.ne(k.shift()) | v.ne(v.shift())).to_numpy()
        r = (d.loc[start, [key_col, val_col, ts_col]]
             .rename(columns={ts_col: "effective_from"})
             .reset_index(drop=True))
        nxt_from = r["effective_from"].shift(-1)
        same_key = r[key_col].shift(-1).eq(r[key_col])
        r["effective_to"] = nxt_from.where(same_key)
        return r

    return coarse_aggregate(ds.select_columns(keep), [key_col], _runs,
                            n_coarse=n_coarse)


def gap_fill(ds: Dataset, *, key_col: str = "user_id",
             ts_col: str = "ts", val_col: str = "event_type",
             tiebreak_col: str = "event_id",
             n_coarse: int | None = None) -> Dataset:
    """Calendar-spine densification + forward fill: one row per key per
    DAY between that key's first and last observation →
    ``(key, day_num, value, observed)``, where ``day_num`` is integer
    days since 1970-01-01 (exact gate — no date-formatting ambiguity),
    ``value`` is the last observation at-or-before that day (within a
    day the (ts, tiebreak) maximum wins) and ``observed`` ∈ {0, 1}
    marks days with a real observation. This is the daily-state view of
    a temporal KG: crawl snapshots of a url become a dense per-day
    validity series downstream aggregates can align on.

    Scale shape: ONE coarse exchange keyed ``key_col``; inside the
    frame everything is vectorized — last-per-day via a mergesort +
    ``drop_duplicates(keep='last')``, the per-key day grid by the
    cumsum/arange trick (no per-key Python loop), the fill via the
    cython groupby-ffill. Driver state: none. Output size is
    Σ(per-key day spans) — bounded by the calendar, not the row count,
    so a hot key (10⁶ recrawls of one url in a month) DENSIFIES to ≤
    31 rows. Timestamp arithmetic is resolution-independent
    (``(ts − epoch).dt.days`` — parquet arrives as us, from_pandas as
    ns; see streaks)."""
    keep = [key_col, ts_col, val_col, tiebreak_col]
    epoch = pd.Timestamp("1970-01-01")

    def _fill(df: pd.DataFrame) -> pd.DataFrame:
        d = df.sort_values([key_col, ts_col, tiebreak_col],
                           kind="mergesort")
        d = d.assign(day_num=(d[ts_col] - epoch).dt.days.astype(np.int64))
        # last observation per (key, day): (ts, tiebreak) max = last row
        # in the mergesort order
        obs = d.drop_duplicates([key_col, "day_num"], keep="last")[
            [key_col, "day_num", val_col]]
        k = obs[key_col].to_numpy()
        day = obs["day_num"].to_numpy()
        kstart = np.flatnonzero(np.r_[True, k[1:] != k[:-1]])
        kend = np.r_[kstart[1:], len(k)] - 1
        d0, d1 = day[kstart], day[kend]
        lens = d1 - d0 + 1
        total = int(lens.sum())
        # per-key arange without a loop: global index minus each key's
        # cumulative start, shifted to its first day
        starts = np.cumsum(lens) - lens
        rep = np.repeat(np.arange(len(kstart)), lens)
        grid_day = d0[rep] + (np.arange(total) - starts[rep])
        grid = pd.DataFrame({key_col: k[kstart][rep],
                             "day_num": grid_day})
        out = grid.merge(obs, on=[key_col, "day_num"], how="left")
        out["observed"] = out[val_col].notna().astype(np.int64)
        out[val_col] = out.groupby(key_col, sort=False)[val_col].ffill()
        return out

    return coarse_aggregate(ds.select_columns(keep), [key_col], _fill,
                            n_coarse=n_coarse)


def weighted_sample(ds: Dataset, k: int, *, weight_col: str,
                    id_col: str, cols: list[str] | None = None) -> Dataset:
    """Deterministic weighted sampling WITHOUT replacement (Efraimidis–
    Spirakis A-Res): keep the ``k`` rows maximizing u^(1/w) ⟺
    ln(u)/w, with u derived from the pinned multiplicative hash
    ``h = (id·2654435761) mod 2³²``, ``u = (h + 0.5)/2³²`` — the same
    reproducible-uniform trick as ``cap_per_key``, so runs are
    repeatable and the oracle can share the exact expression. This is
    the quality-weighted corpus-selection primitive (sample pages
    proportional to a quality score without replacement). Weights must
    be > 0; ``id_col`` integer and unique.

    Scale shape: embarrassingly parallel block-local top-k
    (argpartition, no sort of the block) → a tiny all-to-all over
    ≤ k rows per block → global top-k; no keyed exchange, no driver
    state beyond the k-row result. Selection compares IEEE doubles
    (ln is evaluated by different libms engine- vs oracle-side);
    a flip needs two sample keys within ~2 ulp — probability
    ≈ n²·4e-16, negligible at any n this gate runs (ties on exact
    equality break by id, shared with the SQL)."""
    keep = list(dict.fromkeys([id_col, weight_col] + (cols or [])))

    def _local_topk(df: pd.DataFrame) -> pd.DataFrame:
        d = df[keep]
        ids = d[id_col].to_numpy(np.int64)
        h = (ids * np.int64(2654435761)) % np.int64(2**32)
        w = d[weight_col].to_numpy(np.float64)
        skey = np.log((h.astype(np.float64) + 0.5) / 2**32) / w
        if len(d) > k:
            top = np.argpartition(-skey, k - 1)[:k]
            d, skey = d.iloc[top], skey[top]
        return d.assign(_skey=skey)

    part = ds.map_batches(_local_topk, batch_format="pandas",
                          batch_size=None)
    return (part.sort([("_skey"), (id_col)], descending=[True, False])
            .limit(k)
            .drop_columns(["_skey"]))


def interval_join(facts: Dataset, intervals: Dataset, *,
                  key_col: str = "user_id", ts_col: str = "ts",
                  from_col: str = "effective_from",
                  to_col: str = "effective_to",
                  n_coarse: int | None = None) -> Dataset:
    """Point-in-time join: attach to each fact row the interval row
    valid at its timestamp — ``from ≤ ts < to`` (half-open; a null
    ``to`` is open-ended). With SCD2-style non-overlapping intervals
    (``scd2_intervals`` output) this is dimension lookup "as of" the
    fact: which extracted-fact version was current when this event /
    crawl happened. Facts with no valid interval (before the key's
    first observation) DROP — inner-join semantics, exactly the SQL
    range-join predicate.

    Scale shape: both sides ride ONE coarse exchange keyed ``key_col``
    (typed-null tagged union, the `coarse_join` layout); inside the
    frame the match is ONE ``pd.merge_asof`` (C-vectorized
    backward-asof per key) + the half-open validity filter — never a
    per-key Python loop, never a quadratic range probe. Correct for
    non-overlapping intervals per key (the SCD2 contract: the valid
    interval is precisely the latest-starting one at or before ts).
    Skew: a hot key co-locates like any keyed exchange; intervals are
    change-bounded, so the interval side of a hot key stays small."""
    from omop2obo_ray.pipelines.textpipe import _pa_schema_of

    fs, is_ = _pa_schema_of(facts), _pa_schema_of(intervals)
    fsch = {n: fs.field(n).type for n in fs.names}
    isch = {n: is_.field(n).type for n in is_.names}
    fpay = [c for c in fsch if c != key_col]
    ipay = [c for c in isch if c != key_col]
    if set(fpay) & set(ipay):
        raise ValueError("interval_join: column collision "
                         f"{set(fpay) & set(ipay)}")

    def _tag_f(b: pa.Table) -> pa.Table:
        cols = {key_col: b[key_col], "_side": pa.array(
            np.zeros(b.num_rows, np.int8))}
        for c in fpay:
            cols[c] = b[c]
        for c in ipay:
            cols[c] = pa.nulls(b.num_rows, isch[c])
        return pa.table(cols)

    def _tag_i(b: pa.Table) -> pa.Table:
        cols = {key_col: b[key_col], "_side": pa.array(
            np.ones(b.num_rows, np.int8))}
        for c in fpay:
            cols[c] = pa.nulls(b.num_rows, fsch[c])
        for c in ipay:
            cols[c] = b[c]
        return pa.table(cols)

    both = facts.map_batches(_tag_f, batch_format="pyarrow",
                             batch_size=None).union(
        intervals.map_batches(_tag_i, batch_format="pyarrow",
                              batch_size=None))

    def _probe(df: pd.DataFrame) -> pd.DataFrame:
        side = df["_side"].to_numpy()
        f = (df.loc[side == 0, [key_col] + fpay]
             .sort_values(ts_col, kind="mergesort"))
        i = (df.loc[side == 1, [key_col] + ipay]
             .sort_values(from_col, kind="mergesort"))
        # resolution alignment: parquet timestamps arrive as us,
        # from_pandas/typed-null reassembly as ns — merge_asof insists
        # on identical dtypes (see streaks' epoch-day note)
        for frame, col in ((f, ts_col), (i, from_col), (i, to_col)):
            if str(frame[col].dtype).startswith("datetime64"):
                frame[col] = frame[col].astype("datetime64[ns]")
        if f.empty or i.empty:
            return f.iloc[:0].assign(**{c: pd.Series(dtype=i[c].dtype)
                                        for c in ipay})
        m = pd.merge_asof(f, i, left_on=ts_col, right_on=from_col,
                          by=key_col, direction="backward")
        valid = m[from_col].notna() & (
            m[to_col].isna() | (m[ts_col] < m[to_col]))
        return m[valid]

    return coarse_aggregate(both, [key_col], _probe, n_coarse=n_coarse)


def window_rank(ds: Dataset, *, key_col: str, val_col: str,
                n_coarse: int | None = None) -> Dataset:
    """Ranking-window family in one keyed exchange → every input row
    plus ``rnk`` (RANK: ties share, gaps after) and ``drnk``
    (DENSE_RANK: ties share, no gaps) over ``val_col`` ascending within
    ``key_col``. Integer outputs — exact gate; PERCENT_RANK /
    CUME_DIST are derived ratios ((rnk−1)/(n−1), peer-max rnk/n) the
    caller can compute from these plus a count. Scale shape: ONE
    coarse exchange keyed ``key_col``; ranks inside the frame are the
    cython ``groupby(...).rank`` — no per-key Python. Hot-key caveat
    as everywhere: one key's rows land in one frame, so pick a key
    with cardinality ≫ cluster cores (ranking by host or by document,
    not by a 3-value flag)."""
    def _rank(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby(key_col, sort=False)[val_col]
        return df.assign(
            rnk=g.rank(method="min").astype(np.int64),
            drnk=g.rank(method="dense").astype(np.int64))

    return coarse_aggregate(ds, [key_col], _rank, n_coarse=n_coarse)


def window_pct(ds: Dataset, *, key_col: str, val_col: str,
               n_coarse: int | None = None) -> Dataset:
    """Relative-rank window family in one keyed exchange → every input
    row plus ``pct_rank`` (PERCENT_RANK: (rank−1)/(n−1), 0.0 for a
    1-row partition) and ``cume`` (CUME_DIST: peers-max-rank/n) over
    ``val_col`` ascending within ``key_col``. Both are single IEEE
    divisions of exact integers — the engine and any SQL oracle
    perform the identical float64 operation, so the gate needs no
    quantization. Complements :func:`window_rank` (the reference
    ranks candidate mappings per concept before its 0.25-score cut,
    `string_similarity.py`; a percentile cut is the corpus-quality
    analogue — CCNet keeps documents below a perplexity percentile).

    Scale shape: ONE coarse exchange keyed ``key_col``; ranks and
    sizes inside the frame are cython groupby kernels. Hot-key caveat
    as in window_rank."""
    def _pct(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby(key_col, sort=False)[val_col]
        rnk = g.rank(method="min").astype(np.int64)
        rmax = g.rank(method="max").astype(np.int64)
        n = df.groupby(key_col, sort=False)[val_col].transform("size") \
              .astype(np.int64)
        pct = np.where(n > 1, (rnk - 1) / np.maximum(n - 1, 1), 0.0)
        return df.assign(pct_rank=pct, cume=rmax.to_numpy() / n.to_numpy())

    return coarse_aggregate(ds, [key_col], _pct, n_coarse=n_coarse)


def ewma(events: Dataset, *, key_col: str = "user_id",
         ts_col: str = "ts", id_col: str = "event_id",
         val_col: str = "value", alpha: float = 0.5,
         n_coarse: int | None = None) -> Dataset:
    """Per-key exponentially weighted moving average ordered by
    ``(ts, id)`` → every input row plus ``y`` where
    y₁ = x₁, yₙ = (1−α)·yₙ₋₁ + α·xₙ (pandas ``ewm(adjust=False)``).
    The time-decayed feature primitive (decayed engagement scores,
    decayed quality signals) the reference's static aggregations
    don't need but a streaming corpus refresh does.

    Scale shape: ONE coarse exchange keyed ``key_col``; the
    sequential scan runs per frame through pandas' cython ewm kernel
    after an in-frame (key, ts, id) sort. Hot-key caveat as in
    window_rank: a key's whole history lands in one frame (EWMA's
    sequential dependency makes that minimal)."""
    def _scan(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values([key_col, ts_col, id_col],
                            kind="mergesort")
        y = (df.groupby(key_col, sort=False)[val_col]
               .transform(lambda s: s.ewm(alpha=alpha,
                                          adjust=False).mean()))
        return df.assign(y=y)

    return coarse_aggregate(events, [key_col], _scan,
                            n_coarse=n_coarse)


def sorted_neighborhood_pairs(ds: Dataset, *, key_col: str,
                              id_col: str, window: int,
                              n_coarse: int | None = None) -> Dataset:
    """Sorted-neighborhood blocking (Hernández & Stolfo 1995) →
    candidate pairs (id_a, id_b) whose rows sit within ``window``
    positions of each other in the global (key, id) sort order —
    the classic entity-resolution generator the reference's exact /
    fuzzy string matching would sit behind at corpus scale (compare
    only neighbors under a blocking key instead of all pairs).

    Scale shape: ONE distributed sort; global positions come from
    block-level ROW COUNTS only (driver state = #blocks integers —
    per-block offset attach is a zero-copy-in, one-column-out Ray
    task per block, the one step Dataset.map_batches cannot express
    because a UDF never sees its block's ordinal). Each row then
    lands in ITS window bucket pos//w and the PREVIOUS one, so every
    qualifying pair coexists in exactly one frame (the later row's
    primary bucket — the emit rule that makes the pair set exact and
    duplicate-free), and pair generation inside the frame is a
    vectorized shift over the dense position range. ONE bucket-keyed
    exchange total; frames are ≤ 2·window rows."""
    if window < 2:
        raise ValueError("window must be >= 2")
    w = int(window)

    srt = ds.sort([key_col, id_col]).materialize()
    bundles = list(srt.iter_internal_ref_bundles())
    refs, counts = [], []
    for bu in bundles:
        for ref, meta in bu.blocks:
            refs.append(ref)
            counts.append(meta.num_rows)

    @ray.remote
    def _add_pos(block, offset: int, idc: str):
        import pyarrow as _pa
        if isinstance(block, pd.DataFrame):
            block = _pa.Table.from_pandas(block, preserve_index=False)
        n = block.num_rows
        return _pa.table({
            "pos": _pa.array(np.arange(offset, offset + n, dtype=np.int64)),
            "id": block[idc].combine_chunks().cast(_pa.int64())})

    off = 0
    new_refs = []
    for ref, c in zip(refs, counts):
        if c:
            new_refs.append(_add_pos.remote(ref, off, id_col))
            off += c
    if not new_refs:
        return ray.data.from_arrow(pa.schema(
            [("id_a", pa.int64()), ("id_b", pa.int64())]).empty_table())
    posed = ray.data.from_arrow_refs(new_refs)

    def _buckets(b: pa.Table) -> pa.Table:
        pos = b["pos"].to_numpy(zero_copy_only=False)
        ids = b["id"].to_numpy(zero_copy_only=False)
        bk = pos // w
        return pa.table({
            "bucket": pa.array(np.r_[bk, bk + 1], pa.int64()),
            "pos": pa.array(np.r_[pos, pos], pa.int64()),
            "id": pa.array(np.r_[ids, ids], pa.int64())})

    fanned = posed.map_batches(_buckets, batch_format="pyarrow",
                               batch_size=None)

    def _pairs(df: pd.DataFrame) -> pd.DataFrame:
        out_a, out_b = [], []
        for bkt, g in df.groupby("bucket", sort=False):
            g = g.sort_values("pos", kind="mergesort")
            pos = g["pos"].to_numpy()
            ids = g["id"].to_numpy()
            for d in range(1, w):
                if d >= len(pos):
                    break
                p1, p2 = pos[:-d], pos[d:]
                m = (p2 - p1 < w) & (p2 // w == bkt)
                out_a.append(ids[:-d][m])
                out_b.append(ids[d:][m])
        if not out_a:
            return pd.DataFrame({"id_a": pd.Series([], dtype=np.int64),
                                 "id_b": pd.Series([], dtype=np.int64)})
        return pd.DataFrame({"id_a": np.concatenate(out_a),
                             "id_b": np.concatenate(out_b)})

    from omop2obo_ray.pipelines.textpipe import _sanitize_join_output

    paired = coarse_aggregate(
        fanned, ["bucket"], _pairs, n_coarse=n_coarse).map_batches(
        lambda d: d[["id_a", "id_b"]], batch_format="pandas",
        batch_size=None)
    return _sanitize_join_output(paired, pa.schema(
        [("id_a", pa.int64()), ("id_b", pa.int64())]))


# ---------------------------------------------------------------------------
# per-key mode (most frequent value, deterministic tie-break)
# ---------------------------------------------------------------------------

def mode_per_key(ds: Dataset, key_col: str, val_col: str, *,
                 n_coarse: int | None = None) -> Dataset:
    """Most frequent value per key → (key, mode, n): the categorical
    "typical value" imputation/profiling primitive (majority label
    per entity, dominant language per host). Ties break to the
    LEXICOGRAPHICALLY SMALLEST value — fully deterministic and
    SQL-replayable (ROW_NUMBER ... ORDER BY n DESC, val).

    Scale shape: per-block (key, val) partial counts → ONE key-keyed
    coarse exchange; the frame folds partials and arg-maxes with one
    vectorized sort — frame size is distinct-values-per-key, never
    row count."""
    from omop2obo_ray.pipelines.textpipe import _sanitize_join_output

    def _partial(df: pd.DataFrame) -> pd.DataFrame:
        return (df.groupby([key_col, val_col], sort=False)
                .size().rename("n").reset_index())

    def _fold(df: pd.DataFrame) -> pd.DataFrame:
        g = (df.groupby([key_col, val_col], sort=False)["n"].sum()
             .reset_index())
        g = g.sort_values([key_col, "n", val_col],
                          ascending=[True, False, True],
                          kind="mergesort")
        g = g.drop_duplicates(key_col, keep="first")
        return g.rename(columns={val_col: "mode"})

    vt = _pa_type_of(ds, val_col)
    kt = _pa_type_of(ds, key_col)
    return _sanitize_join_output(
        coarse_aggregate(
            ds.map_batches(_partial, batch_format="pandas",
                           batch_size=None),
            [key_col], _fold, n_coarse=n_coarse),
        pa.schema([(key_col, kt), ("mode", vt), ("n", pa.int64())]))


def _pa_type_of(ds: Dataset, col: str) -> pa.DataType:
    from omop2obo_ray.pipelines.textpipe import _pa_schema_of

    sch = _pa_schema_of(ds)
    return sch.field(col).type


# ---------------------------------------------------------------------------
# per-key interval coalescing (merge overlapping intervals)
# ---------------------------------------------------------------------------

def merge_intervals(ds: Dataset, *, key_col: str, start_col: str,
                    end_col: str, closed: bool = True,
                    n_coarse: int | None = None) -> Dataset:
    """Coalesce overlapping/adjacent intervals per key →
    (key, start, end, n_merged): the availability/session/validity
    union primitive (SCD2 sibling — `interval join` matches rows INTO
    intervals, this normalizes the intervals themselves). ``closed``
    treats [a, b] touching [b, c] as overlapping (the calendar
    convention); ``closed=False`` requires strict overlap.

    Scale shape: ONE key-keyed coarse exchange; the frame sorts its
    key's intervals once and finds group boundaries with the
    exclusive-prefix-max trick (a new group starts exactly where
    start > max(previous ends)) — vectorized numpy, no per-interval
    Python loop. Frame size is intervals-per-key (a session key's
    history), never corpus size."""
    from omop2obo_ray.pipelines.textpipe import _sanitize_join_output

    kt = _pa_type_of(ds, key_col)

    def _fold(df: pd.DataFrame) -> pd.DataFrame:
        outs = []
        for k, g in df.groupby(key_col, sort=False):
            s = g[start_col].to_numpy(np.int64)
            e = g[end_col].to_numpy(np.int64)
            order = np.lexsort((e, s))
            s, e = s[order], e[order]
            run_max = np.maximum.accumulate(e)
            prev_max = np.concatenate(([np.iinfo(np.int64).min],
                                       run_max[:-1]))
            new_grp = (s > prev_max) if closed else (s >= prev_max)
            new_grp[0] = True
            gid = np.cumsum(new_grp) - 1
            n_grp = gid[-1] + 1
            starts = s[np.nonzero(new_grp)[0]]
            ends = np.full(n_grp, np.iinfo(np.int64).min, np.int64)
            np.maximum.at(ends, gid, e)
            counts = np.zeros(n_grp, np.int64)
            np.add.at(counts, gid, 1)
            outs.append(pd.DataFrame({
                key_col: k, "start": starts, "end": ends,
                "n_merged": counts}))
        return (pd.concat(outs, ignore_index=True) if outs
                else pd.DataFrame({key_col: pd.Series([], dtype=object),
                                   "start": pd.Series([], dtype="int64"),
                                   "end": pd.Series([], dtype="int64"),
                                   "n_merged": pd.Series([],
                                                         dtype="int64")}))

    return _sanitize_join_output(
        coarse_aggregate(ds, [key_col], _fold, n_coarse=n_coarse),
        pa.schema([(key_col, kt), ("start", pa.int64()),
                   ("end", pa.int64()), ("n_merged", pa.int64())]))


# ---------------------------------------------------------------------------
# per-column table profiling (the data-engineering audit pass)
# ---------------------------------------------------------------------------

def profile_table(ds: Dataset, columns: list[str], *,
                  n_coarse: int | None = None) -> Dataset:
    """Per-column profile → (column, n, n_null, n_distinct, min_val,
    max_val): the schema-audit pass a pipeline runs before trusting a
    new drop (nullability drift, cardinality explosions, value-range
    regressions). EXACT-DISTINCT sibling of
    ``curate.table_profile`` (which hashes values to int64 for a
    slimmer exchange — exact up to 64-bit collisions; prefer it when
    column values are large and the collision caveat is acceptable;
    prefer THIS one when distinct counts must be exact).
    ``n_distinct`` here is EXACT (nulls excluded, SQL
    ``count(DISTINCT col)`` semantics); min/max are extrema OF THE
    CANONICAL STRING CAST (lexicographic — the one ordering a single
    typed output row can carry for every column type; SQL replays it
    as ``min(CAST(col AS VARCHAR))``). Profile numeric ranges via
    the typed stats ops when numeric ordering matters.

    Scale shape: each block melts the requested columns to
    (column, val) DISTINCT-per-block partials plus one per-block
    (n, n_null, min, max) stats row — so the exchange carries
    per-block distincts, never raw rows — then ONE column-keyed
    coarse fold merges counts, distincts and extrema. Frame size is
    distinct-values-per-column."""
    from omop2obo_ray.pipelines.textpipe import _sanitize_join_output

    def _melt(df: pd.DataFrame) -> pd.DataFrame:
        parts = []
        for c in columns:
            s = df[c]
            nn = int(s.isna().sum())
            vals = s.dropna().astype(str)
            u = pd.unique(vals)
            parts.append(pd.DataFrame({
                "column": c, "val": u,
                "n": np.int64(0), "n_null": np.int64(0),
                "is_stats": np.int8(0)}))
            parts.append(pd.DataFrame({
                "column": [c],
                "val": [""],
                "n": np.int64(len(s)),
                "n_null": np.int64(nn),
                "is_stats": np.int8(1)}))
        return pd.concat(parts, ignore_index=True)

    def _fold(df: pd.DataFrame) -> pd.DataFrame:
        rows = []
        for c, g in df.groupby("column", sort=False):
            stats = g[g["is_stats"] == 1]
            vals = g.loc[g["is_stats"] == 0, "val"]
            u = pd.unique(vals)
            rows.append((
                c, int(stats["n"].sum()), int(stats["n_null"].sum()),
                len(u),
                str(min(u)) if len(u) else None,
                str(max(u)) if len(u) else None))
        return pd.DataFrame(rows, columns=[
            "column", "n", "n_null", "n_distinct", "min_val",
            "max_val"])

    return _sanitize_join_output(
        coarse_aggregate(
            ds.map_batches(_melt, batch_format="pandas",
                           batch_size=None),
            ["column"], _fold, n_coarse=n_coarse),
        pa.schema([("column", pa.string()), ("n", pa.int64()),
                   ("n_null", pa.int64()), ("n_distinct", pa.int64()),
                   ("min_val", pa.string()), ("max_val", pa.string())]))


def dataset_diff(old: Dataset, new: Dataset, keys: list[str], *,
                 n_coarse: int | None = None) -> Dataset:
    """Row-set delta between two dataset versions on ``keys`` →
    (keys..., status) with status ∈ {'added', 'removed', 'kept'} —
    the generic audit between consecutive runs (triple sets across
    crawl refreshes, release tables across versions;
    :func:`graph_diff` is the int-edge specialization and
    ``textpipe.snapshot_diff`` the keyed VALUE-diff sibling — same
    key present with different content = 'changed' there; here a
    row IS its key tuple, so only membership matters). Set
    semantics per side (duplicates within a side count once).

    Scale shape: tagged union → ONE keys-keyed coarse presence-fold
    emitting the status in-frame. No joins, no driver state."""
    from omop2obo_ray.pipelines.textpipe import (_pa_schema_of,
                                                 _sanitize_join_output)

    sch = _pa_schema_of(old)

    def _tag(side):
        def fn(df: pd.DataFrame) -> pd.DataFrame:
            out = df[keys].copy(deep=False)
            out["_o"] = np.int8(1 - side)
            out["_n"] = np.int8(side)
            return out
        return fn

    tagged = old.map_batches(_tag(0), batch_format="pandas",
                             batch_size=None).union(
        new.map_batches(_tag(1), batch_format="pandas",
                        batch_size=None))

    def _fold(df: pd.DataFrame) -> pd.DataFrame:
        g = (df.groupby(keys, sort=False)
             .agg(_o=("_o", "max"), _n=("_n", "max")).reset_index())
        g["status"] = np.where(
            g["_o"] & g["_n"], "kept",
            np.where(g["_n"], "added", "removed"))
        return g.drop(columns=["_o", "_n"])

    return _sanitize_join_output(
        coarse_aggregate(tagged, keys, _fold, n_coarse=n_coarse),
        pa.schema([(k, sch.field(k).type) for k in keys]
                  + [("status", pa.string())]))


def ab_proportion_test(events: Dataset, *, arm_col: str = "arm",
                       convert_col: str = "converted",
                       control: str | None = None,
                       n_coarse: int | None = None) -> Dataset:
    """Two-proportion z-test of every experiment arm against the
    control → (arm, n, conv, rate, control_n, control_conv, z):
    pooled-variance z = (p_a − p_c) / sqrt(p̂(1−p̂)(1/n_a + 1/n_c))
    (the A/B-test readout; crawler/ranker experiments gate on it).
    ``control`` defaults to the lexicographically smallest arm.
    Degenerate pools (p̂ ∈ {0, 1}) or empty sides yield z = 0.0.

    Scale shape: per-block (arm, n, conv) partials → ONE tiny
    arm-keyed fold (arms are driver-small by definition) → the
    control row joins the others IN-FRAME via a second single-group
    fold. Exact int counts; rate and z are the single-rounding float
    expressions the SQL gate spells identically."""
    from omop2obo_ray.pipelines.textpipe import _sanitize_join_output

    def _partial(df: pd.DataFrame) -> pd.DataFrame:
        g = (df.groupby(arm_col, sort=False)
             .agg(n=(convert_col, "size"),
                  conv=(convert_col, "sum")).reset_index())
        g["conv"] = g["conv"].astype(np.int64)
        return g

    def _fold(df: pd.DataFrame) -> pd.DataFrame:
        g = (df.groupby(arm_col, sort=False)
             .agg(n=("n", "sum"), conv=("conv", "sum")).reset_index()
             .sort_values(arm_col, kind="mergesort"))
        ctrl = control if control is not None \
            else str(g[arm_col].iloc[0])
        crow = g[g[arm_col] == ctrl]
        cn = int(crow["n"].iloc[0]) if len(crow) else 0
        cc = int(crow["conv"].iloc[0]) if len(crow) else 0
        out = g.copy()
        out["rate"] = out["conv"] / out["n"].astype(np.float64)
        out["control_n"] = np.int64(cn)
        out["control_conv"] = np.int64(cc)
        zs = []
        for n, conv in zip(out["n"], out["conv"]):
            if cn == 0 or n == 0:
                zs.append(0.0)
                continue
            pp = (conv + cc) / float(n + cn)
            se2 = pp * (1.0 - pp) * (1.0 / n + 1.0 / cn)
            if se2 <= 0.0:
                zs.append(0.0)
                continue
            zs.append((conv / n - cc / cn) / np.sqrt(se2))
        out["z"] = zs
        return out

    parts = events.map_batches(_partial, batch_format="pandas",
                               batch_size=None).map_batches(
        lambda df: df.assign(_g=0), batch_format="pandas",
        batch_size=None)
    return _sanitize_join_output(
        coarse_aggregate(parts, ["_g"],
                         lambda df: _fold(df.drop(columns=["_g"])),
                         n_coarse=n_coarse),
        pa.schema([(arm_col, pa.string()), ("n", pa.int64()),
                   ("conv", pa.int64()), ("rate", pa.float64()),
                   ("control_n", pa.int64()),
                   ("control_conv", pa.int64()),
                   ("z", pa.float64())]))


def transition_probs(events: Dataset, *, key_col: str = "user_id",
                     item_col: str = "event_type",
                     order_cols: list[str] | None = None,
                     n_coarse: int | None = None) -> Dataset:
    """First-order Markov transition estimates over per-key ordered
    sequences → (cur, nxt, n, total, p): counts of CONSECUTIVE
    directed (cur → nxt) steps and the conditional p = n / total —
    the navigation/session model (next-page prediction, funnel
    hazard) beside :func:`skipgram_pairs`' bidirectional windowed
    pairs. ``order_cols`` must totally order each key's sequence
    (default ``["ts", "event_id"]``, the ntile contract).

    Scale shape: ONE key-keyed exchange co-locates each sequence;
    consecutive pairs come from one vectorized shift and pre-count
    per frame (combiner-first); ONE cur-keyed fold merges counts and
    computes totals + p in-frame (the alias_table shape)."""
    from omop2obo_ray.pipelines.textpipe import (_pa_schema_of,
                                                 _sanitize_join_output)

    order_cols = order_cols or ["ts", "event_id"]
    keep = list(dict.fromkeys([key_col, item_col] + order_cols))
    it = _pa_schema_of(events).field(item_col).type

    def _pairs(df: pd.DataFrame) -> pd.DataFrame:
        d = df[keep].sort_values([key_col] + order_cols,
                                 kind="mergesort")
        key = d[key_col].to_numpy()
        item = d[item_col].to_numpy()
        if len(d) < 2:
            return pd.DataFrame({
                "cur": item[:0], "nxt": item[:0],
                "n": np.zeros(0, np.int64)})
        same = key[1:] == key[:-1]
        g = (pd.DataFrame({"cur": item[:-1][same],
                           "nxt": item[1:][same]})
             .groupby(["cur", "nxt"], sort=False)
             .size().rename("n").reset_index())
        g["n"] = g["n"].astype(np.int64)
        return g

    def _fold(df: pd.DataFrame) -> pd.DataFrame:
        g = (df.groupby(["cur", "nxt"], sort=False)["n"].sum()
             .reset_index())
        g["total"] = g.groupby("cur", sort=False)["n"].transform("sum")
        g["p"] = g["n"] / g["total"].astype(np.float64)
        return g

    partial = coarse_aggregate(events.select_columns(keep),
                               [key_col], _pairs, n_coarse=n_coarse)
    return _sanitize_join_output(
        coarse_aggregate(partial, ["cur"], _fold, n_coarse=n_coarse),
        pa.schema([("cur", it), ("nxt", it), ("n", pa.int64()),
                   ("total", pa.int64()), ("p", pa.float64())]))


def interarrival_stats(events: Dataset, *, key_col: str = "user_id",
                       ts_col: str = "ts",
                       order_cols: list[str] | None = None,
                       n_coarse: int | None = None) -> Dataset:
    """Per-key inter-event gap statistics → (key, n_gaps, sum_s,
    sumsq_s, mean_s, std_s): consecutive-event time gaps in SECONDS
    (int64) with exact integer sufficient stats and single-rounding
    mean / population-std — the burstiness/recrawl-cadence readout
    (how often a host's pages change, how bursty a user's sessions
    are). Keys with < 2 events are absent (no gap to measure).

    Scale shape: ONE key-keyed exchange co-locates each sequence;
    gaps come from one vectorized shift; the same frame folds the
    int64 sufficient stats — no second exchange (unlike
    grouped_corr's two-table shape, the sequence must be co-located
    anyway). Resolution rule from NOTES_r3: epoch math uses
    ``(ts - epoch).dt.total_seconds()`` — never ``.astype(int64)``
    on datetime64, which is resolution-dependent."""
    from omop2obo_ray.pipelines.textpipe import (_pa_schema_of,
                                                 _sanitize_join_output)

    order_cols = order_cols or [ts_col, "event_id"]
    keep = list(dict.fromkeys([key_col, ts_col] + order_cols))
    kt = _pa_schema_of(events).field(key_col).type

    def _fold(df: pd.DataFrame) -> pd.DataFrame:
        d = df[keep].sort_values([key_col] + order_cols,
                                 kind="mergesort")
        key = d[key_col].to_numpy()
        # tz-aware columns need a tz-matched epoch: naive-minus-aware
        # subtraction raises TypeError and would fail the whole fold
        # task (ADVICE r4).
        epoch = pd.Timestamp("1970-01-01", tz=getattr(
            d[ts_col].dtype, "tz", None))
        secs = np.floor(
            (d[ts_col] - epoch)
            .dt.total_seconds().to_numpy(np.float64)).astype(np.int64)
        if len(d) < 2:
            return pd.DataFrame({
                key_col: key[:0],
                "n_gaps": np.zeros(0, np.int64),
                "sum_s": np.zeros(0, np.int64),
                "sumsq_s": np.zeros(0, np.int64)})
        same = key[1:] == key[:-1]
        gaps = (secs[1:] - secs[:-1])[same]
        gk = key[:-1][same]
        g = (pd.DataFrame({key_col: gk, "g": gaps,
                           "g2": gaps * gaps})
             .groupby(key_col, sort=False)
             .agg(n_gaps=("g", "size"), sum_s=("g", "sum"),
                  sumsq_s=("g2", "sum")).reset_index())
        for c in ("n_gaps", "sum_s", "sumsq_s"):
            g[c] = g[c].astype(np.int64)
        return g

    folded = _sanitize_join_output(
        coarse_aggregate(events.select_columns(keep), [key_col],
                         _fold, n_coarse=n_coarse),
        pa.schema([(key_col, kt), ("n_gaps", pa.int64()),
                   ("sum_s", pa.int64()), ("sumsq_s", pa.int64())]))

    def _final(b: pa.Table) -> pa.Table:
        n = b["n_gaps"].to_numpy(zero_copy_only=False).astype(
            np.float64)
        s = b["sum_s"].to_numpy(zero_copy_only=False).astype(
            np.float64)
        s2 = b["sumsq_s"].to_numpy(zero_copy_only=False).astype(
            np.float64)
        mean = s / n
        var = s2 / n - (s / n) * (s / n)
        std = np.sqrt(np.maximum(var, 0.0))
        return pa.table({
            b.column_names[0]: b[0], "n_gaps": b["n_gaps"],
            "sum_s": b["sum_s"], "sumsq_s": b["sumsq_s"],
            "mean_s": pa.array(mean, pa.float64()),
            "std_s": pa.array(std, pa.float64())})

    return folded.map_batches(_final, batch_format="pyarrow",
                              batch_size=None)


def lift_table(scored: Dataset, *, score_col: str = "score",
               label_col: str = "label", n_bins: int = 10,
               n_coarse: int | None = None) -> Dataset:
    """Decile lift/gains table → (bin, n, n_pos, rate, base_rate,
    lift): rows ranked by score DESCENDING (ties broken by the
    ranking's arrival order made deterministic via a secondary id —
    callers must pass distinct scores or accept the documented
    (score, rowid-free) NTILE tie contract: ties split by score
    only, exactly as SQL NTILE over ORDER BY score DESC does when
    scores are distinct), cut into ``n_bins`` NTILE bins; per bin
    the positive rate and its ratio to the global base rate — the
    model-targeting readout beside `calibration_bins` (is the top
    decile actually concentrated in positives?).

    Scale shape: ONE single-group coarse exchange (the ranking is a
    global order, the same frame bound as `ntile`'s per-key frames —
    use per-key variants for sharded evaluation); vectorized argsort
    + fat/thin NTILE arithmetic in-frame; exact int counts, three
    single-rounding divisions."""
    from omop2obo_ray.pipelines.textpipe import _sanitize_join_output

    def _fold(df: pd.DataFrame) -> pd.DataFrame:
        s = df[score_col].to_numpy(np.float64)
        y = df[label_col].to_numpy(np.int64)
        order = np.argsort(-s, kind="mergesort")
        n = len(s)
        base, rem = divmod(n, n_bins)
        sizes = np.full(n_bins, base, np.int64)
        sizes[:rem] += 1
        bins = np.repeat(np.arange(1, n_bins + 1, dtype=np.int64),
                         sizes)
        yb = y[order]
        out = (pd.DataFrame({"bin": bins, "y": yb})
               .groupby("bin", sort=True)
               .agg(n=("y", "size"), n_pos=("y", "sum"))
               .reset_index())
        out["n_pos"] = out["n_pos"].astype(np.int64)
        total_pos = int(y.sum())
        base_rate = total_pos / n
        out["rate"] = out["n_pos"] / out["n"].astype(np.float64)
        out["base_rate"] = base_rate
        out["lift"] = out["rate"] / base_rate if base_rate > 0 \
            else 0.0
        return out

    tagged = scored.select_columns([score_col, label_col]) \
        .map_batches(lambda df: df.assign(_g=0),
                     batch_format="pandas", batch_size=None)
    return _sanitize_join_output(
        coarse_aggregate(tagged, ["_g"],
                         lambda df: _fold(df.drop(columns=["_g"])),
                         n_coarse=n_coarse),
        pa.schema([("bin", pa.int64()), ("n", pa.int64()),
                   ("n_pos", pa.int64()), ("rate", pa.float64()),
                   ("base_rate", pa.float64()),
                   ("lift", pa.float64())]))
