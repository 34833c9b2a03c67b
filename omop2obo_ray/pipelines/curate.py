"""Corpus-curation operators for a web-scale training-data pipeline:
PII redaction, repetition/quality metrics (Gopher-style), deterministic
hash sampling, per-group exact quantiles, per-source corpus statistics
and text normalization.

Design rules (same as the rest of the engine):

- Every per-document kernel is a vectorized ``map_batches`` body over
  Arrow batches — string kernels are ``pyarrow.compute`` (RE2-backed,
  so semantics are *identical* to DuckDB's RE2 ``regexp_*`` functions:
  the SQL oracles are data-independent, not fixture-coincidences).
- No driver-side materialization: filters/metrics stream; the only
  aggregations are bounded-key (sources, return flags) or per-batch.
- Reference parity: the reference has no corpus-curation stage (it is a
  clinical-concept mapper); these operators extend the engine for the
  LLM-training-data use case the 100 TB deployment targets, reusing the
  same text_preprocessor conventions (string_similarity.py:141 md5 keys,
  lowercase word tokens) where they overlap.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

import ray
from ray.data import Dataset

# ---------------------------------------------------------------------------
# PII redaction
# ---------------------------------------------------------------------------

# RE2-safe patterns (no lookaround/backrefs) shared verbatim with the
# DuckDB oracle. Order matters: emails first (their local part can look
# like a phone run), then IPv4 (dotted digits would otherwise be eaten
# by the phone rule), then phone-ish digit runs.
PII_PATTERNS: list[tuple[str, str]] = [
    (r"[A-Za-z0-9._%+\-]+@[A-Za-z0-9.\-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    (r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b", "<IP>"),
    (r"\+?\d[\d\- ]{7,}\d", "<PHONE>"),
]


def _pii_batch(batch: pa.Table) -> pa.Table:
    text = batch["text"]
    for pattern, token in PII_PATTERNS:
        text = pc.replace_substring_regex(text, pattern=pattern,
                                          replacement=token)
    return pa.table({"doc_id": batch["doc_id"], "text": text})


def pii_redact(docs: Dataset) -> Dataset:
    """Replace emails / IPv4s / phone-number runs with typed tokens.

    Pure streaming projection: one RE2 pass per pattern inside each
    block, zero shuffles, zero driver state — at 100 TB this is
    embarrassingly parallel and bound by string throughput.
    """
    return docs.map_batches(_pii_batch, batch_format="pyarrow",
                            batch_size=None)


# ---------------------------------------------------------------------------
# Repetition / quality metrics (Gopher-style)
# ---------------------------------------------------------------------------

_TOKEN_SPLIT = "[^a-z0-9_]+"   # complement of the engine's word tokens


def _repetition_batch(batch: pa.Table) -> pa.Table:
    """Per-document token statistics, fully vectorized.

    Tokens are lowercase ``[a-z0-9_]+`` runs (the engine's word-token
    convention, shared with TextAnalyzer.stop_ratio). Flattens the
    token lists once, then computes every metric with numpy
    bincount/pandas C-groupbys — no Python loop over documents.
    """
    lower = pc.utf8_lower(batch["text"])
    toks = pc.split_pattern_regex(lower, pattern=_TOKEN_SPLIT)
    if isinstance(toks, pa.ChunkedArray):
        toks = toks.combine_chunks()
    n_docs = len(batch)
    flat = toks.flatten()
    counts = np.diff(toks.offsets.to_numpy(zero_copy_only=False))
    parent = np.repeat(np.arange(n_docs, dtype=np.int64), counts)
    lens = pc.utf8_length(flat).to_numpy(zero_copy_only=False).astype(np.int64)
    keep = lens > 0                      # split() yields '' at edges
    parent, lens = parent[keep], lens[keep]
    flat = flat.filter(pa.array(keep))

    n_tokens = np.bincount(parent, minlength=n_docs).astype(np.int64)
    sum_len = np.bincount(parent, weights=lens, minlength=n_docs).astype(np.int64)

    # distinct + modal counts: group on (doc, token) — pandas C-groupby
    # over the flat token column (no per-doc Python).
    df = pd.DataFrame({
        "p": parent,
        "t": flat.to_pandas(),
    })
    per_tok = df.groupby(["p", "t"], sort=False).size()
    by_doc = per_tok.groupby(level=0)
    distinct = np.zeros(n_docs, dtype=np.int64)
    top = np.zeros(n_docs, dtype=np.int64)
    idx = by_doc.size().index.to_numpy()
    distinct[idx] = by_doc.size().to_numpy()
    top[idx] = by_doc.max().to_numpy()

    mask = n_tokens > 0                  # SQL unnest drops token-less docs
    nt = n_tokens[mask]
    doc_id = batch["doc_id"]
    if isinstance(doc_id, pa.ChunkedArray):
        doc_id = doc_id.combine_chunks()
    return pa.table({
        "doc_id": doc_id.filter(pa.array(mask)),
        "n_tokens": pa.array(nt),
        "distinct_tokens": pa.array(distinct[mask]),
        "top_token_ratio": pa.array(np.round(top[mask] / nt, 6)),
        "mean_token_len": pa.array(np.round(sum_len[mask] / nt, 6)),
    })


def repetition_stats(docs: Dataset) -> Dataset:
    """Gopher-style per-document repetition metrics.

    ``top_token_ratio`` (modal-token mass) and ``distinct_tokens /
    n_tokens`` are the classic web-text repetition signals (Gopher
    §A.1.1 repetition filters). Streaming per-block map — each document
    is scored independently, so this scales linearly with corpus size.
    """
    return docs.map_batches(_repetition_batch, batch_format="pyarrow",
                            batch_size=None)


def quality_filter(docs: Dataset, *, min_tokens: int = 8,
                   max_top_token_ratio: float = 0.2,
                   min_distinct_ratio: float = 0.3,
                   min_mean_token_len: float = 2.0,
                   max_mean_token_len: float = 12.0) -> Dataset:
    """Keep documents passing the repetition/shape gates (Gopher-style
    thresholds, tunable). Returns the surviving metric rows."""
    stats = repetition_stats(docs)

    def _gate(batch: pa.Table) -> pa.Table:
        nt = batch["n_tokens"].to_numpy(zero_copy_only=False)
        top = batch["top_token_ratio"].to_numpy(zero_copy_only=False)
        dis = batch["distinct_tokens"].to_numpy(zero_copy_only=False)
        mlen = batch["mean_token_len"].to_numpy(zero_copy_only=False)
        keep = ((nt >= min_tokens)
                & (top <= max_top_token_ratio)
                & (dis / np.maximum(nt, 1) >= min_distinct_ratio)
                & (mlen >= min_mean_token_len)
                & (mlen <= max_mean_token_len))
        return batch.filter(pa.array(keep))

    return stats.map_batches(_gate, batch_format="pyarrow", batch_size=None)


# ---------------------------------------------------------------------------
# Deterministic hash sampling
# ---------------------------------------------------------------------------

_KNUTH = 2654435761          # Knuth multiplicative constant
_M31 = 2_147_483_648         # 2**31
_M32 = 4_294_967_296         # 2**32


def hash_sample(ds: Dataset, *, key: str = "doc_id", rate_pct: int = 30,
                salt: int = 17) -> Dataset:
    """Deterministic multiplicative-hash sample: keep rows where
    ``((key mod 2^31) * 2654435761 + salt) mod 2^32 mod 100 < rate_pct``.

    Content-addressed sampling (not ``random()``) so the sample is
    reproducible across runs / resumes / engines — the property a 100 TB
    curation pipeline needs for resumable, auditable subsampling. All
    arithmetic stays in int64 (max intermediate ≈ 5.7e18 < 2^63), and is
    expressible verbatim in ANSI SQL for the oracle.
    """
    def _keep(batch: pa.Table) -> pa.Table:
        k = batch[key].to_numpy(zero_copy_only=False).astype(np.int64)
        h = ((k % _M31) * _KNUTH + salt) % _M32 % 100
        return batch.filter(pa.array(h < rate_pct))

    return ds.map_batches(_keep, batch_format="pyarrow", batch_size=None)


def hash_sample_sql(*, table: str = "documents", key: str = "doc_id",
                    rate_pct: int = 30, salt: int = 17,
                    columns: str = "*") -> str:
    """The exact-same predicate as :func:`hash_sample`, in SQL."""
    return (f"SELECT {columns} FROM {table} WHERE "
            f"((({key} % {_M31}) * {_KNUTH} + {salt}) % {_M32}) % 100 "
            f"< {rate_pct}")


# ---------------------------------------------------------------------------
# Per-group exact quantiles
# ---------------------------------------------------------------------------

def group_quantiles(ds: Dataset, key: str, value: str,
                    qs: tuple[float, ...] = (0.5, 0.95)) -> Dataset:
    """Exact per-group quantiles (linear interpolation — matches SQL
    ``quantile_cont``) for BOUNDED-cardinality keys.

    Partitioning contract: the group is the unit of parallelism — valid
    when the key has few distinct values (return flags, priorities,
    languages), so each group's values fit one task even at 100 TB of
    input (the groupby shuffle reduces to value columns only: inputs
    are projected to (key, value) before the exchange). For
    high-cardinality keys use an approximate sketch instead; exact
    arbitrary-key quantiles at scale require a full sort by (key, value)
    — intentionally not hidden behind this API.
    """
    slim = ds.select_columns([key, value])

    def _q(group: pd.DataFrame) -> pd.DataFrame:
        vals = group[value].to_numpy()
        row: dict = {key: [group[key].iloc[0]]}
        for q in qs:
            row[f"q{int(q * 100)}"] = [round(float(np.quantile(vals, q)), 4)]
        return pd.DataFrame(row)

    return slim.groupby(key).map_groups(_q, batch_format="pandas")


# ---------------------------------------------------------------------------
# Histogram quantile sketch (high-cardinality keys)
# ---------------------------------------------------------------------------

def histogram_quantile(ds: Dataset, key: str, value: str, *,
                       width: float = 20.0,
                       qs: tuple[float, ...] = (0.5, 0.95)) -> Dataset:
    """Per-key quantile ESTIMATES from a fixed-width histogram — the
    scale path for ARBITRARY-cardinality keys that
    :func:`group_quantiles` (exact, bounded keys only) deliberately
    refuses.

    Mergeable-sketch shape: phase 1 reduces each block to
    (key, bin, count) partials inside ``map_batches`` (bin =
    floor(value/width)); phase 2 merges partials per key with a coarse
    aggregate, so the shuffle carries only bin counts — never values —
    and per-key state is bounded by the value range / width, not by
    row count. The estimate is deterministic: the q-quantile is the
    LOWER EDGE (bin*width) of the first bin whose cumulative count
    reaches q*n — the same rule the DuckDB oracle implements with a
    window cumsum, so the gate is data-independent (both sides do the
    identical float arithmetic)."""
    from omop2obo_ray.functions.shuffle import coarse_apply_per_key

    def _partial(batch: pa.Table) -> pa.Table:
        k = batch[key].to_numpy(zero_copy_only=False)
        v = batch[value].to_numpy(zero_copy_only=False).astype(np.float64)
        b = np.floor(v / width).astype(np.int64)
        g = (pd.DataFrame({key: k, "bin": b})
             .groupby([key, "bin"], sort=False).size().rename("c").reset_index())
        return pa.Table.from_pandas(g, preserve_index=False)

    partials = ds.select_columns([key, value]).map_batches(
        _partial, batch_format="pyarrow", batch_size=None)

    def _quantiles(g: pd.DataFrame) -> pd.DataFrame:
        merged = g.groupby("bin", sort=True)["c"].sum()
        cum = merged.cumsum().to_numpy()
        n = cum[-1]
        bins = merged.index.to_numpy()
        row: dict = {key: [g[key].iloc[0]]}
        for q in qs:
            # first bin whose cumulative count reaches q*n (searchsorted
            # 'left' = first cum >= target; q <= 1 so target <= cum[-1])
            idx = int(np.searchsorted(cum, q * n, side="left"))
            row[f"q{int(q * 100)}"] = [round(float(bins[idx]) * width, 6)]
        return pd.DataFrame(row)

    return coarse_apply_per_key(partials, [key], _quantiles)


# ---------------------------------------------------------------------------
# Per-source corpus statistics
# ---------------------------------------------------------------------------

def source_stats(docs: Dataset) -> Dataset:
    """Per-source (per-domain) corpus health: volume, mean length, and
    exact-duplicate rate. Two-phase: vectorized per-block partials
    (count/sum/distinct-hash sets are computed inside ``map_batches``),
    then a bounded-key groupby over sources only — the text payload
    never enters the shuffle (only md5 hashes of it).
    """
    from omop2obo_ray.functions.hashing import hash64_array

    def _partial(batch: pa.Table) -> pa.Table:
        src = batch["source"].to_numpy(zero_copy_only=False)
        nch = pc.utf8_length(batch["text"]).to_numpy(zero_copy_only=False)
        h = (hash64_array(batch["text"]) >> np.uint64(1)).astype(np.int64)
        df = pd.DataFrame({"source": src, "n": 1, "chars": nch, "h": h})
        g = df.groupby("source", sort=False).agg(
            n_docs=("n", "sum"), sum_chars=("chars", "sum"))
        g["hashes"] = df.groupby("source", sort=False)["h"].agg(
            lambda s: s.drop_duplicates().to_numpy().tobytes())
        return pa.Table.from_pandas(g.reset_index(), preserve_index=False)

    def _merge(group: pd.DataFrame) -> pd.DataFrame:
        hashes = np.unique(np.concatenate(
            [np.frombuffer(b, dtype=np.int64) for b in group["hashes"]]))
        n_docs = int(group["n_docs"].sum())
        return pd.DataFrame({
            "source": [group["source"].iloc[0]],
            "n_docs": [n_docs],
            "distinct_texts": [len(hashes)],
            "avg_chars": [round(float(group["sum_chars"].sum()) / n_docs, 4)],
        })

    partials = docs.select_columns(["source", "text"]).map_batches(
        _partial, batch_format="pyarrow", batch_size=None)
    return partials.groupby("source").map_groups(_merge, batch_format="pandas")


# ---------------------------------------------------------------------------
# Text normalization
# ---------------------------------------------------------------------------

def normalize_text(docs: Dataset) -> Dataset:
    """Lowercase, collapse whitespace runs, trim — the standard
    pre-tokenization cleanup. Single streaming RE2 pass; the ``\\s``
    class is identical between Arrow's RE2 and DuckDB's RE2."""
    def _norm(batch: pa.Table) -> pa.Table:
        t = pc.utf8_lower(batch["text"])
        t = pc.replace_substring_regex(t, pattern=r"\s+", replacement=" ")
        t = pc.utf8_trim_whitespace(t)
        return pa.table({"doc_id": batch["doc_id"], "text": t})

    return docs.map_batches(_norm, batch_format="pyarrow", batch_size=None)


# ---------------------------------------------------------------------------
# URL canonicalization + host-level stats (Common-Crawl curation)
# ---------------------------------------------------------------------------

# Tracking query parameters removed during canonicalization. Anchored to
# the preceding '?'/'&' so a path segment or non-parameter text can
# never match; the separator is preserved via the \1 rewrite. RE2-safe
# and shared VERBATIM with the DuckDB oracle (both engines are
# RE2-backed), so the correctness gate is data-independent.
URL_TRACKING_PATTERN = r"([?&])(utm_[a-z0-9_]*|ref|fbclid|gclid)=[^&#]*"
URL_SCHEME_PATTERN = r"^[A-Za-z][A-Za-z0-9+.\-]*://"


def synth_urls(docs: Dataset) -> Dataset:
    """Deterministic Common-Crawl-style URL per document (test/bench
    support — the sandbox's documents table has no url column; the
    production input per BASELINE.json's input_hint does). The
    expression is a shared contract with the SQL oracle: mixed-case
    scheme/host, a www prefix, a shared path bucket (doc_id % 50, so
    paths genuinely collide across docs), tracking params, a real
    param (id) that must survive, and a fragment.
    """
    def _synth(batch: pa.Table) -> pa.Table:
        df = batch.select(["doc_id", "source", "lang"]).to_pandas()
        did = df["doc_id"].astype(str)
        url = ("HTTPS://WWW." + df["source"] + ".Example.com/" + df["lang"]
               + "/p" + (df["doc_id"] % 50).astype(str)
               + "/?utm_source=feed&utm_campaign=c"
               + (df["doc_id"] % 7).astype(str)
               + "&id=" + did + "&ref=tw#sec-"
               + (df["doc_id"] % 5).astype(str))
        return pa.table({"doc_id": batch["doc_id"],
                         "url": pa.array(url, pa.string())})

    return docs.map_batches(_synth, batch_format="pyarrow", batch_size=None)


def _canonicalize_url_array(u: pa.ChunkedArray | pa.Array) -> pa.Array:
    """The canonicalization kernel, on a raw Arrow string array:
    strip fragment → strip scheme → lowercase host (host only — paths
    are case-sensitive) → strip leading ``www.`` → drop tracking query
    params (keeping real ones) → tidy separators → strip the trailing
    slash. All single-pass RE2 kernels."""
    u = pc.replace_substring_regex(u, pattern=r"#.*$", replacement="")
    u = pc.replace_substring_regex(u, pattern=URL_SCHEME_PATTERN,
                                   replacement="")
    host = pc.utf8_lower(
        pc.replace_substring_regex(u, pattern=r"[/?].*$", replacement=""))
    host = pc.replace_substring_regex(host, pattern=r"^www\.",
                                      replacement="")
    rest = pc.replace_substring_regex(u, pattern=r"^[^/?]*", replacement="")
    rest = pc.replace_substring_regex(rest, pattern=URL_TRACKING_PATTERN,
                                      replacement=r"\1")
    rest = pc.replace_substring_regex(rest, pattern=r"&&+", replacement="&")
    rest = pc.replace_substring_regex(rest, pattern=r"\?&", replacement="?")
    rest = pc.replace_substring_regex(rest, pattern=r"[?&]+$", replacement="")
    rest = pc.replace_substring_regex(rest, pattern=r"/\?", replacement="?")
    rest = pc.replace_substring_regex(rest, pattern=r"/$", replacement="")
    if isinstance(host, pa.ChunkedArray):
        host = host.combine_chunks()
    if isinstance(rest, pa.ChunkedArray):
        rest = rest.combine_chunks()
    return pc.binary_join_element_wise(host, rest, "")


def canonicalize_urls(pages: Dataset, url_col: str = "url",
                      key_col: str = "doc_id") -> Dataset:
    """Canonical-URL projection → (key, url). Pure streaming map (zero
    shuffles, zero driver state); the canonical url is the dedup /
    refetch key for Common-Crawl-style corpora, where the same page is
    crawled under scheme/www/tracking-param variants.
    """
    def _canon(batch: pa.Table) -> pa.Table:
        return pa.table({key_col: batch[key_col],
                         "url": _canonicalize_url_array(batch[url_col])})

    return pages.map_batches(_canon, batch_format="pyarrow",
                             batch_size=None)


def host_stats(canon: Dataset, url_col: str = "url") -> Dataset:
    """Per-host crawl stats over canonical urls → (host, n_pages,
    n_paths). n_paths counts distinct query-stripped paths. The
    distinct-path rollup is a coarse aggregate over (host, path) — path
    cardinality is unbounded at crawl scale — followed by a second
    coarse aggregate over hosts; urls never re-enter a shuffle after
    the first projection."""
    from omop2obo_ray.functions.shuffle import coarse_aggregate

    def _hp(batch: pa.Table) -> pa.Table:
        u = batch[url_col]
        host = pc.replace_substring_regex(u, pattern=r"[/?].*$",
                                          replacement="")
        path = pc.replace_substring_regex(u, pattern=r"^[^/?]*",
                                          replacement="")
        path = pc.replace_substring_regex(path, pattern=r"\?.*$",
                                          replacement="")
        return pa.table({"host": host, "path": path})

    hp = canon.map_batches(_hp, batch_format="pyarrow", batch_size=None)
    per_path = coarse_aggregate(
        hp, ["host", "path"],
        lambda df: df.groupby(["host", "path"], sort=False).size()
        .rename("n").reset_index())

    def _per_host(df: pd.DataFrame) -> pd.DataFrame:
        out = (df.groupby("host", sort=False)
               .agg(n_pages=("n", "sum"), n_paths=("n", "size"))
               .reset_index())
        out["n_pages"] = out["n_pages"].astype(np.int64)
        out["n_paths"] = out["n_paths"].astype(np.int64)
        return out

    return coarse_aggregate(per_path, ["host"], _per_host)


# ---------------------------------------------------------------------------
# C4-style global line deduplication
# ---------------------------------------------------------------------------

def _explode_lines(docs: Dataset, key_col: str = "doc_id",
                   text_col: str = "text") -> Dataset:
    """(key, line_idx, line, line_h) rows — one per newline-split line,
    vectorized (Arrow split + offsets math, no per-document loop).
    line_h is a 63-bit content hash; the slim dedup exchange ships
    hashes, the line text stays in this dataset only."""
    from omop2obo_ray.functions.hashing import hash64_array

    def _ex(batch: pa.Table) -> pa.Table:
        parts = pc.split_pattern(batch[text_col], pattern="\n")
        if isinstance(parts, pa.ChunkedArray):
            parts = parts.combine_chunks()
        flat = parts.flatten()
        counts = np.diff(parts.offsets.to_numpy(zero_copy_only=False))
        parent = np.repeat(np.arange(len(batch), dtype=np.int64), counts)
        idx = np.arange(parent.size, dtype=np.int64) - np.repeat(
            np.concatenate(([0], np.cumsum(counts)[:-1])), counts)
        keys = batch[key_col].to_numpy(zero_copy_only=False)[parent]
        h = (hash64_array(flat) >> np.uint64(1)).astype(np.int64)
        return pa.table({key_col: pa.array(keys),
                         "line_idx": pa.array(idx, pa.int64()),
                         "line": flat,
                         "line_h": pa.array(h, pa.int64())})

    return docs.map_batches(_ex, batch_format="pyarrow", batch_size=None)


def dedup_lines_corpus(docs: Dataset, key_col: str = "doc_id",
                       text_col: str = "text",
                       num_partitions: int = 8) -> Dataset:
    """C4-style GLOBAL line dedup: every distinct line is kept exactly
    once corpus-wide — at its first occurrence, defined as the
    lexicographically smallest (doc, line_idx) — all other occurrences
    are removed, documents are reassembled from their surviving lines
    in order, and documents left with no lines are dropped
    ("Exploring the Limits of Transfer Learning with T5/C4", Raffel et
    al. 2020 §2.2 line-level dedup).

    Scale shape: the first-occurrence election runs over (line_h, key,
    idx) only — line text never enters that exchange (63-bit content
    hashes; distinct-line collisions ~n²/2⁶³, the same accepted risk as
    ``exact_dedup``). One hash join attaches winners back; reassembly
    is a coarse per-doc apply. No driver state at any dup mass.
    """
    from omop2obo_ray.functions.shuffle import (coarse_aggregate,
                                                coarse_apply_per_key)
    from omop2obo_ray.pipelines.textpipe import (_pa_schema_of,
                                                 _sanitize_join_output)

    lines = _explode_lines(docs, key_col, text_col).materialize()
    kt = _pa_schema_of(lines).field(key_col).type
    # first occurrence per line: min (doc, idx) lexicographic
    keep = _sanitize_join_output(coarse_aggregate(
        lines.select_columns(["line_h", key_col, "line_idx"]), ["line_h"],
        lambda df: df.sort_values(["line_h", key_col, "line_idx"])
        .drop_duplicates("line_h")
        .rename(columns={key_col: "kd", "line_idx": "ki"})),
        pa.schema([("line_h", pa.int64()), ("kd", kt),
                   ("ki", pa.int64())]))
    joined = _sanitize_join_output(
        lines.join(keep, join_type="inner",
                   num_partitions=num_partitions, on=("line_h",)),
        pa.schema([(key_col, kt), ("line_idx", pa.int64()),
                   ("line", pa.string()), ("line_h", pa.int64()),
                   ("kd", kt), ("ki", pa.int64())]))

    def _winners(batch: pa.Table) -> pa.Table:
        k = batch[key_col].combine_chunks()
        i = batch["line_idx"].combine_chunks()
        m = pc.and_(pc.equal(k, batch["kd"].combine_chunks()),
                    pc.equal(i, batch["ki"].combine_chunks()))
        t = pa.table({key_col: k, "line_idx": i,
                      "line": batch["line"].combine_chunks()})
        return t.filter(m)

    kept = joined.map_batches(_winners, batch_format="pyarrow",
                              batch_size=None)

    def _reassemble(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values("line_idx")
        return pd.DataFrame({key_col: [g[key_col].iloc[0]],
                             text_col: ["\n".join(g["line"])]})

    return coarse_apply_per_key(kept, [key_col], _reassemble)


def stratified_sample(ds: Dataset, group: str, key: str, k: int,
                      salt: int = 17) -> Dataset:
    """Deterministic per-group top-k sample: within every ``group``
    value keep the ``k`` rows with the smallest multiplicative-hash
    rank of ``key`` (same content-addressed hash as
    :func:`hash_sample`, so the sample is reproducible across runs /
    resumes / engines and expressible verbatim in SQL).

    Unlike ``hash_sample``'s global rate, this guarantees EXACTLY
    min(k, group size) rows per stratum — the shape a balanced eval
    split or per-domain audit sample needs. Per-group selection is a
    coarse apply (group cardinality unbounded); only (group, key, rank)
    enters the exchange.
    """
    from omop2obo_ray.functions.shuffle import coarse_apply_per_key

    def _rank(batch: pa.Table) -> pa.Table:
        kv = batch[key].to_numpy(zero_copy_only=False).astype(np.int64)
        h = ((kv % _M31) * _KNUTH + salt) % _M32
        return pa.table({group: batch[group], key: batch[key],
                         "_rank": pa.array(h, pa.int64())})

    ranked = ds.map_batches(_rank, batch_format="pyarrow", batch_size=None)

    def _take(g: pd.DataFrame) -> pd.DataFrame:
        return (g.sort_values(["_rank", key]).head(k)
                [[group, key]].reset_index(drop=True))

    return coarse_apply_per_key(ranked, [group], _take)


# ---------------------------------------------------------------------------
# Count-min heavy hitters (mergeable sketch)
# ---------------------------------------------------------------------------

_CM_SEEDS = (0x9E3779B97F4A7C15, 0xC2B2AE3D27D4EB4F,
             0x165667B19E3779F9, 0x27D4EB2F165667C5)


def _cm_positions(tokens: np.ndarray, width: int, depth: int,
                  hash_mode: str = "fast") -> np.ndarray:
    """(depth, n) column indices — splitmix-style multiplicative mixes
    of the token content hash, identical wherever a sketch is built or
    probed. ``hash_mode='sql'`` derives row d's position as
    ``md5_number_lower(token || '#' || d) % width`` so a DuckDB oracle
    replays the sketch arithmetic exactly."""
    from omop2obo_ray.functions.hashing import hash64_array, md5_u64

    if hash_mode == "sql":
        pos = np.empty((depth, tokens.size), dtype=np.int64)
        for d in range(depth):
            pos[d] = [md5_u64(f"{t}#{d}") % width for t in tokens]
        return pos
    h = hash64_array(pa.array(tokens.astype(object), pa.string()))
    pos = np.empty((depth, h.size), dtype=np.int64)
    for d in range(depth):
        m = (h * np.uint64(_CM_SEEDS[d])) & np.uint64(0xFFFFFFFFFFFFFFFF)
        m ^= m >> np.uint64(33)
        pos[d] = (m % np.uint64(width)).astype(np.int64)
    return pos


def heavy_hitters(docs: Dataset, *, text_col: str = "text", k: int = 20,
                  width: int = 4096, depth: int = 4,
                  candidates_per_block: int = 128,
                  hash_mode: str = "fast") -> Dataset:
    """Approximate top-k tokens via a COUNT-MIN sketch → (token, est)
    sorted by estimate desc (Cormode & Muthukrishnan 2005).

    This is the sketch-path alternative to the exact ``top_tokens``
    keyed aggregate: the exchange carries (a) fixed-size ``depth×width``
    partial sketches — count-min is linear, so partials sum — and (b)
    block-local candidate tokens, never the full token stream keyed by
    token. Per-block partials reduce to ≤32 bucket sums in-cluster;
    the driver touches only those and the ≤ blocks×candidates distinct
    candidate rows. Estimates overestimate by ≤ εN with classic CM
    guarantees (ε = e/width per row of depth).
    """
    from omop2obo_ray.functions.shuffle import coarse_aggregate

    tok_pat = r"[^a-z0-9_]+"

    def _partial(batch: pa.Table) -> pa.Table:
        lower = pc.utf8_lower(batch[text_col])
        toks = pc.split_pattern_regex(lower, pattern=tok_pat)
        if isinstance(toks, pa.ChunkedArray):
            toks = toks.combine_chunks()
        flat_arr = toks.flatten()
        flat_arr = flat_arr.filter(pc.greater(pc.utf8_length(flat_arr), 0))
        flat = flat_arr.to_numpy(zero_copy_only=False)
        uniq, cnt = np.unique(flat, return_counts=True)
        sketch = np.zeros((depth, width), dtype=np.int64)
        if uniq.size:
            pos = _cm_positions(uniq, width, depth, hash_mode)
            for d in range(depth):
                np.add.at(sketch[d], pos[d], cnt)
        order = np.argsort(-cnt)[:candidates_per_block]
        return pa.table({
            # spreading key only (routes partial sums); result is
            # independent of its value
            "bucket": pa.array([int(sketch.sum()) % 32], pa.int64()),
            "sketch": pa.array([sketch.tobytes()], pa.large_binary()),
            "cands": pa.array(["\n".join(uniq[order])], pa.large_string()),
        })

    partials = docs.map_batches(_partial, batch_format="pyarrow",
                                batch_size=None)
    # in-cluster partial-sketch sums: ≤32 bucket rows reach the driver
    summed = coarse_aggregate(
        partials.select_columns(["bucket", "sketch"]), ["bucket"],
        lambda df: pd.DataFrame({
            "bucket": [df["bucket"].iloc[0]],
            "sketch": [np.sum(
                [np.frombuffer(b, dtype=np.int64) for b in df["sketch"]],
                axis=0).tobytes()]}))
    sketch = np.zeros(depth * width, dtype=np.int64)
    for b in summed.iter_batches(batch_size=64, batch_format="pyarrow"):
        for raw in b["sketch"].to_pylist():
            sketch += np.frombuffer(raw, dtype=np.int64)
    sketch = sketch.reshape(depth, width)
    sketch_ref = ray.put(sketch)

    cands = coarse_aggregate(
        partials.select_columns(["cands"]).map_batches(
            lambda b: pa.table({"token": pa.array(
                [t for s in b["cands"].to_pylist() for t in s.split("\n")
                 if t], pa.string())}),
            batch_format="pyarrow", batch_size=None),
        ["token"], lambda df: df.drop_duplicates(["token"]))

    def _estimate(batch: pa.Table) -> pa.Table:
        sk = ray.get(sketch_ref)
        toks = batch["token"].to_numpy(zero_copy_only=False)
        pos = _cm_positions(toks, width, depth, hash_mode)
        est = np.min(np.stack([sk[d][pos[d]] for d in range(depth)]), axis=0)
        return pa.table({"token": batch["token"],
                         "est": pa.array(est, pa.int64())})

    est = cands.map_batches(_estimate, batch_format="pyarrow")
    return est.sort(["est", "token"], descending=[True, False]).limit(k)


# ---------------------------------------------------------------------------
# ordered prefix sum + sequence packing (concat-and-chunk)
# ---------------------------------------------------------------------------

def ordered_prefix_sum(ds: Dataset, key: str = "doc_id",
                       value: str = "n") -> Dataset:
    """EXCLUSIVE prefix sum of ``value`` in global ``key`` order →
    input columns + ``offset`` (int64). The distributed ordered-scan
    primitive (global token offsets for sequence packing, ordered file
    offsets for concatenated exports).

    Scale shape: one range exchange (``sort(key)``) — inherent to any
    globally-ordered scan — then the classic two-pass block scheme:
    (1) a slim per-BLOCK pass collects (first_key, block_total); the
    driver holds one row per block (bounded by block count, never by
    rows), prefix-sums them in key order and broadcasts the
    block-offset map; (2) a second pass adds each block's offset to a
    vectorized intra-block exclusive cumsum. Requires unique keys
    (duplicate keys could straddle a block boundary, making first_key
    an ambiguous block id); sums are int64.
    """
    sorted_ds = ds.sort(key).materialize()

    def _block_stat(batch: pa.Table) -> pa.Table:
        if len(batch) == 0:
            return pa.table({"first": pa.array([], batch.schema.field(key).type),
                             "total": pa.array([], pa.int64())})
        v = batch[value].combine_chunks().to_numpy(zero_copy_only=False)
        return pa.table({"first": batch[key].slice(0, 1),
                         "total": pa.array([int(v.sum())], pa.int64())})

    stats = sorted_ds.map_batches(_block_stat, batch_format="pyarrow",
                                  batch_size=None).take_all()
    stats.sort(key=lambda r: r["first"])
    offsets, acc = {}, 0
    for r in stats:
        offsets[r["first"]] = acc
        acc += r["total"]
    off_ref = ray.put(offsets)

    def _apply(batch: pa.Table) -> pa.Table:
        if len(batch) == 0:
            return batch.append_column("offset", pa.array([], pa.int64()))
        block_off = ray.get(off_ref)[batch[key][0].as_py()]
        v = batch[value].combine_chunks().to_numpy(
            zero_copy_only=False).astype(np.int64)
        intra = np.concatenate(([0], np.cumsum(v)[:-1]))
        return batch.append_column(
            "offset", pa.array(block_off + intra, pa.int64()))

    return sorted_ds.map_batches(_apply, batch_format="pyarrow",
                                 batch_size=None)


def pack_sequences(ds: Dataset, seq_len: int, key: str = "doc_id",
                   value: str = "n") -> Dataset:
    """GPT-style concat-and-chunk packing plan: documents are laid out
    end-to-end in global ``key`` order and the token stream is cut
    every ``seq_len`` tokens → (key, value, offset, bin_first,
    bin_last) where a doc occupies training sequences
    ``bin_first..bin_last`` starting at ``offset % seq_len`` inside
    ``bin_first``. This is the packing rule used for GPT-2/3-style
    pretraining (concatenate + chunk, docs may straddle sequence
    boundaries) — deterministic and SQL-expressible, unlike greedy
    bin-packing. Zero-length docs get bin_last = bin_first (they sit
    at a boundary and occupy no tokens). Built on
    ``ordered_prefix_sum``; the packing itself adds no exchange."""
    with_off = ordered_prefix_sum(ds, key=key, value=value)

    def _bins(batch: pa.Table) -> pa.Table:
        off = batch["offset"].combine_chunks().to_numpy(zero_copy_only=False)
        v = batch[value].combine_chunks().to_numpy(
            zero_copy_only=False).astype(np.int64)
        first = off // seq_len
        last = np.where(v > 0, (off + v - 1) // seq_len, first)
        out = batch.append_column("bin_first", pa.array(first, pa.int64()))
        return out.append_column("bin_last", pa.array(last, pa.int64()))

    return with_off.map_batches(_bins, batch_format="pyarrow",
                                batch_size=None)


# ---------------------------------------------------------------------------
# latest-snapshot-wins election (argmax per high-cardinality key)
# ---------------------------------------------------------------------------

def latest_per_key(ds: Dataset, key: str, ts_col: str, id_col: str,
                   num_partitions: int = 8) -> Dataset:
    """Keep each key's row with the greatest ``(ts_col, id_col)`` —
    the "latest crawl wins" dedup a Common-Crawl ingest runs when
    re-crawled URLs carry multiple snapshots (key = url, ts = warc_ts).
    ``id_col`` must be row-unique; it both breaks ts ties
    deterministically and addresses the winning row.

    Scale shape (same as ``exact_dedup``'s slim shuffle): ONLY the
    (key, ts, id) projection enters the election exchange — a coarse
    per-key argmax — and the winning ids semi-join back to the full
    rows with one native hash join, so the payload (html/text) never
    moves through a shuffle."""
    from omop2obo_ray.functions.shuffle import coarse_aggregate
    from omop2obo_ray.pipelines.textpipe import (_pa_schema_of,
                                                 _sanitize_join_output)

    slim = ds.select_columns([key, ts_col, id_col])

    def _elect(df: pd.DataFrame) -> pd.DataFrame:
        idx = (df.sort_values([ts_col, id_col])
               .groupby(key, sort=False)[id_col].last())
        return idx.rename("keep_id").reset_index()[["keep_id"]]

    winners = _sanitize_join_output(
        coarse_aggregate(slim, [key], _elect),
        pa.schema([("keep_id", _pa_schema_of(ds).field(id_col).type)]))
    out = ds.join(winners, join_type="inner",
                  num_partitions=num_partitions,
                  on=(id_col,), right_on=("keep_id",))
    return _sanitize_join_output(out, _pa_schema_of(ds))


# ---------------------------------------------------------------------------
# table profile (per-column audit stats — the ingest data-quality gate)
# ---------------------------------------------------------------------------

def table_profile(ds: Dataset, columns: list[str] | None = None) -> Dataset:
    """Per-column audit statistics → (column, n_rows, n_nulls,
    n_distinct, min_str, max_str) — the data-quality gate an ingest
    pipeline runs before committing a 100-TB load (null spikes, key
    cardinality drift, range violations). Hash-distinct sibling of
    ``relational.profile_table`` (exact distinct over the raw values,
    heavier exchange) — pick by whether the ~n²/2⁶⁴ collision caveat
    is acceptable.

    Scale shape: n/nulls/min/max fold from per-BLOCK partial rows
    (≤ n_columns rows per block, merged by one bounded-key coarse
    aggregate). Distinct counts hash each column's non-null values to
    int64 and count distinct hashes in ONE combined coarse exchange
    over the slim (column_id, value_hash) projection — the values
    themselves never enter the shuffle. Exact up to 64-bit hash
    collisions (~n²/2⁶⁴ — the same documented trade as
    ``exact_dedup``). min/max are reported as strings (int/string
    columns round-trip exactly; float formatting is locale of the
    engine, so gate float columns on the numeric stats instead)."""
    from omop2obo_ray.functions.hashing import hash64_array
    from omop2obo_ray.functions.shuffle import coarse_aggregate

    cols = columns or list(ds.schema().names)
    slim = ds.select_columns(cols)

    def _partial(batch: pa.Table) -> pa.Table:
        names, ns, nulls, mins, maxs = [], [], [], [], []
        for c in cols:
            arr = batch[c]
            names.append(c)
            ns.append(len(arr))
            nulls.append(arr.null_count)
            nn = arr.drop_null()
            if len(nn) == 0:
                mins.append(None)
                maxs.append(None)
            else:
                mm = pc.min_max(nn)
                mins.append(str(mm["min"].as_py()))
                maxs.append(str(mm["max"].as_py()))
        return pa.table({"column": pa.array(names, pa.string()),
                         "n_rows": pa.array(ns, pa.int64()),
                         "n_nulls": pa.array(nulls, pa.int64()),
                         "min_str": pa.array(mins, pa.string()),
                         "max_str": pa.array(maxs, pa.string())})

    def _merge_stats(df: pd.DataFrame) -> pd.DataFrame:
        def fold(g: pd.DataFrame) -> pd.Series:
            mn = g["min_str"].dropna()
            mx = g["max_str"].dropna()
            return pd.Series({
                "n_rows": g["n_rows"].sum(),
                "n_nulls": g["n_nulls"].sum(),
                # string compare is only correct per-block-consistent
                # for string columns; numeric columns need a numeric
                # fold — recover it by casting when every value parses
                "min_str": _str_fold(mn, min),
                "max_str": _str_fold(mx, max)})
        return (df.groupby("column", sort=False)
                .apply(fold, include_groups=False).reset_index())

    def _str_fold(vals: pd.Series, reducer):
        if len(vals) == 0:
            return None
        try:
            nums = [int(v) for v in vals]
            return str(reducer(nums))
        except ValueError:
            try:
                nums = [float(v) for v in vals]
                return str(reducer(nums))
            except ValueError:
                return reducer(vals)

    stats = coarse_aggregate(
        slim.map_batches(_partial, batch_format="pyarrow",
                         batch_size=None),
        ["column"], _merge_stats)

    def _hashes(batch: pa.Table) -> pa.Table:
        ids, hs = [], []
        for i, c in enumerate(cols):
            nn = batch[c].drop_null()
            if len(nn) == 0:
                continue
            # hash the string form — profile only needs distinctness,
            # and one codepath covers every column type
            h = hash64_array(nn.cast(pa.string()))
            ids.append(np.full(len(nn), i, dtype=np.int32))
            # signed view keeps all 64 bits injectively; int64 group
            # keys are safe where uint64 degrade (NOTES_r2)
            hs.append(h.view(np.int64))
        if not ids:
            return pa.table({"cid": pa.array([], pa.int32()),
                             "h": pa.array([], pa.int64())})
        return pa.table({"cid": pa.array(np.concatenate(ids)),
                         "h": pa.array(np.concatenate(hs))})

    per_col = coarse_aggregate(
        slim.map_batches(_hashes, batch_format="pyarrow",
                         batch_size=None),
        ["cid", "h"],
        lambda df: df.drop_duplicates(["cid", "h"]))
    distinct = coarse_aggregate(
        per_col.select_columns(["cid"]), ["cid"],
        lambda df: df.groupby("cid", sort=False).size()
        .rename("n_distinct").reset_index())

    def _name(batch: pa.Table) -> pa.Table:
        cid = batch["cid"].combine_chunks().to_numpy(zero_copy_only=False)
        return pa.table({
            "column": pa.array([cols[i] for i in cid], pa.string()),
            "n_distinct": batch["n_distinct"]})

    named = distinct.map_batches(_name, batch_format="pyarrow",
                                 batch_size=None)
    from omop2obo_ray.pipelines.textpipe import (_pa_schema_of,
                                                 _sanitize_join_output)
    stats_s = _sanitize_join_output(stats, pa.schema(
        [("column", pa.string()), ("n_rows", pa.int64()),
         ("n_nulls", pa.int64()), ("min_str", pa.string()),
         ("max_str", pa.string())]))
    named_s = _sanitize_join_output(named, pa.schema(
        [("column", pa.string()), ("n_distinct", pa.int64())]))
    out = _sanitize_join_output(
        stats_s.join(named_s, join_type="left_outer", num_partitions=4,
                     on=("column",)),
        pa.schema([("column", pa.string()), ("n_rows", pa.int64()),
                   ("n_nulls", pa.int64()), ("min_str", pa.string()),
                   ("max_str", pa.string()), ("n_distinct", pa.int64())]))

    def _final(batch: pa.Table) -> pa.Table:
        nd = batch["n_distinct"].combine_chunks().fill_null(0)
        return pa.table({"column": batch["column"],
                         "n_rows": batch["n_rows"],
                         "n_nulls": batch["n_nulls"],
                         "n_distinct": nd.cast(pa.int64()),
                         "min_str": batch["min_str"],
                         "max_str": batch["max_str"]})

    return out.map_batches(_final, batch_format="pyarrow",
                           batch_size=None)


# ---------------------------------------------------------------------------
# benchmark decontamination (broadcast Aho-Corasick probe scan)
# ---------------------------------------------------------------------------

class Decontaminator:
    """Actor: flags documents containing any probe phrase — benchmark
    decontamination for training corpora (remove eval-set n-grams from
    the training split, as in GPT-3 App. C / Lee et al. 2022).

    Reuses the KG linker's machinery verbatim: the probe automaton is
    built ONCE on the driver, shipped via ``ray.put``, pulled in actor
    ``__init__``, and each batch is scanned with token-boundary
    checked substring matching over lowercased text (same semantics as
    ``functions/aho.py``; the SQL oracle mirrors the boundary rule
    with RE2 ``(^|[^a-z0-9_])probe([^a-z0-9_]|$)``)."""

    def __init__(self, automaton_ref, text_col: str = "text"):
        self.aho = ray.get(automaton_ref) if isinstance(
            automaton_ref, ray.ObjectRef) else automaton_ref
        self.text_col = text_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        lower = pc.utf8_lower(batch[self.text_col]).to_pylist()
        # DISTINCT probes present per doc (not raw occurrence count:
        # RE2 consumes boundary chars between adjacent matches, so an
        # occurrence count could not be mirrored exactly in the SQL
        # oracle; distinct-probe presence is the decision signal anyway)
        hits = [len({t[s:e] for s, e in self.aho.scan(t or "")})
                for t in lower]
        n = np.asarray(hits, dtype=np.int64)
        out = batch.append_column("n_probes_matched",
                                  pa.array(n, pa.int64()))
        return out.append_column("contaminated", pa.array(n > 0))


def decontaminate(docs: Dataset, probes: list[str], *,
                  text_col: str = "text",
                  mode: str = "flag") -> Dataset:
    """Scan for eval-set probe phrases. ``mode='flag'`` appends
    (n_probes_matched, contaminated); ``mode='drop'`` filters
    contaminated docs out (keeping the input schema). Probes are
    normalized to lowercase; matching is token-boundary substring
    (multi-word probes match across single spaces exactly as
    written)."""
    from omop2obo_ray.functions.aho import AhoCorasick

    aho = AhoCorasick([p.lower() for p in probes if p])
    ref = ray.put(aho)
    flagged = docs.map_batches(
        Decontaminator, fn_constructor_kwargs=dict(
            automaton_ref=ref, text_col=text_col),
        batch_format="pyarrow",
        concurrency=(1, max(4, int(ray.cluster_resources().get("CPU", 8))
                            if ray.is_initialized() else 8)),
        num_cpus=1)
    if mode == "flag":
        return flagged
    keep_cols = list(docs.schema().names)

    def _drop(batch: pa.Table) -> pa.Table:
        mask = pc.invert(batch["contaminated"].combine_chunks())
        return batch.filter(mask).select(keep_cols)

    return flagged.map_batches(_drop, batch_format="pyarrow",
                               batch_size=None)


# ---------------------------------------------------------------------------
# Naive Bayes text classifier (the distributed quality/domain classifier
# slot in a training-data pipeline — fastText-style scoring, exact
# count-based training instead of SGD so the model is deterministic and
# SQL-auditable)
# ---------------------------------------------------------------------------

# ASCII word tokens on lowercased text — shared VERBATIM with the
# DuckDB oracle (`regexp_extract_all(lower(text), '[a-z0-9]+')`), so
# the gate is data-independent (ADVICE r1 lesson).
NB_TOKEN_RE = "[a-z0-9]+"


class NBModel:
    """Multinomial Naive Bayes model: vocab-bounded driver state only
    (same budget class as the broadcast lexicon). ``classes`` sorted
    ascending so argmax tie-break = smallest class in both engine and
    SQL."""

    def __init__(self, classes: list, log_prior: np.ndarray,
                 vocab: pd.Index, log_prob: np.ndarray,
                 log_default: np.ndarray):
        self.classes = classes          # (K,) sorted
        self.log_prior = log_prior      # (K,)
        self.vocab = vocab              # pd.Index of tokens
        self.log_prob = log_prob        # (V, K)
        self.log_default = log_default  # (K,) unseen-token smoothing


def nb_train(docs: Dataset, label_col: str = "lang",
             text_col: str = "text", alpha: float = 1.0) -> NBModel:
    """Train multinomial NB with add-``alpha`` smoothing in ONE
    distributed counting pass: each block emits (label, token, n)
    partials from a vectorized pandas groupby, a coarse aggregate
    merges them per (label, token) in-cluster, and the driver collects
    only the vocab-bounded count table (the model — millions of rows at
    web scale, same driver-budget class as the ontology lexicon; the
    token STREAM, which is the unbounded thing, never leaves the
    cluster).

    log P(t|c) = ln((n_tc + α) / (N_c + α·V)); prior = doc-count share.
    """
    from omop2obo_ray.functions.shuffle import coarse_aggregate

    import re as _re
    tok_re = _re.compile(NB_TOKEN_RE)

    def _partials(df: pd.DataFrame) -> pd.DataFrame:
        rows_lab, rows_tok = [], []
        for lab, txt in zip(df[label_col], df[text_col]):
            toks = tok_re.findall((txt or "").lower())
            rows_lab.extend([lab] * len(toks))
            rows_tok.extend(toks)
        if not rows_tok:
            return pd.DataFrame({"label": [], "token": [], "n": []})
        return (pd.DataFrame({"label": rows_lab, "token": rows_tok})
                .groupby(["label", "token"], sort=False).size()
                .rename("n").reset_index())

    counts = coarse_aggregate(
        docs.select_columns([label_col, text_col]).map_batches(
            _partials, batch_format="pandas"),
        ["label", "token"],
        lambda df: df.groupby(["label", "token"], sort=False)
        .agg(n=("n", "sum")).reset_index()).to_pandas()

    # doc counts per class: bounded-key groupby
    prior_df = (docs.select_columns([label_col])
                .groupby(label_col).count().to_pandas())
    prior_df.columns = ["label", "n_docs"]

    classes = sorted(prior_df["label"].tolist())
    k = len(classes)
    cidx = {c: i for i, c in enumerate(classes)}
    n_docs = prior_df["n_docs"].sum()
    log_prior = np.full(k, -np.inf)
    for _, r in prior_df.iterrows():
        log_prior[cidx[r["label"]]] = np.log(r["n_docs"] / n_docs)

    vocab = pd.Index(sorted(counts["token"].unique()))
    v = len(vocab)
    totals = np.zeros(k)
    for lab, n in counts.groupby("label")["n"].sum().items():
        totals[cidx[lab]] = n
    denom = totals + alpha * v
    mat = np.zeros((v, k), dtype=np.int64)
    mat[vocab.get_indexer(counts["token"].to_numpy()),
        counts["label"].map(cidx).to_numpy()] = counts["n"].to_numpy()
    log_prob = np.log((mat + alpha) / denom)
    log_default = np.log(alpha / denom)
    return NBModel(classes, log_prior, vocab, log_prob, log_default)


class NBScorer:
    """Actor: vectorized NB scoring — model pulled from the object
    store once per actor, per-batch work is one regex pass + one
    ``Index.get_indexer`` + two ``np.add.at`` scatters."""

    def __init__(self, model_ref, text_col: str = "text",
                 key_col: str = "doc_id"):
        import re as _re

        self.m: NBModel = (ray.get(model_ref)
                           if isinstance(model_ref, ray.ObjectRef)
                           else model_ref)
        self.tok_re = _re.compile(NB_TOKEN_RE)
        self.text_col, self.key_col = text_col, key_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        m = self.m
        texts = batch[self.text_col].to_pylist()
        doc_idx, toks = [], []
        for i, t in enumerate(texts):
            tt = self.tok_re.findall((t or "").lower())
            doc_idx.extend([i] * len(tt))
            toks.extend(tt)
        scores = np.tile(m.log_prior, (len(texts), 1))
        if toks:
            di = np.asarray(doc_idx, dtype=np.int64)
            ti = m.vocab.get_indexer(toks)
            known = ti >= 0
            np.add.at(scores, di[known], m.log_prob[ti[known]])
            np.add.at(scores, di[~known], m.log_default)
        pred = scores.argmax(axis=1)  # ties → first = smallest class
        best = scores[np.arange(len(texts)), pred]
        return pa.table({
            self.key_col: batch[self.key_col],
            "label_pred": pa.array([m.classes[p] for p in pred]),
            # epsilon-shifted floor quantization: log-prob sums differ
            # from the SQL oracle only by float reassociation (~1e-12
            # rel); raw floats would flip on the hash gate
            "score_q": pa.array(np.floor(best * 1e4 + 1e-6)
                                .astype(np.int64)),
        })


def nb_classify(docs: Dataset, model: NBModel, text_col: str = "text",
                key_col: str = "doc_id") -> Dataset:
    """Score every doc with a trained NB model → (key, label_pred,
    score_q). Model broadcast via ``ray.put`` once, pulled per actor in
    ``__init__`` — never re-shipped per batch."""
    ref = ray.put(model)
    cpus = int(ray.cluster_resources().get("CPU", 8)) if ray.is_initialized() else 8
    return docs.select_columns([key_col, text_col]).map_batches(
        NBScorer,
        fn_constructor_kwargs=dict(model_ref=ref, text_col=text_col,
                                   key_col=key_col),
        batch_format="pyarrow", batch_size=None,
        concurrency=(max(1, cpus // 4), max(2, cpus)), num_cpus=1)


# ---------------------------------------------------------------------------
# BM25 query scoring (the retrieval half of a data-curation stack:
# score every document against a term query at corpus scale)
# ---------------------------------------------------------------------------

def bm25_scores(docs: Dataset, query_terms: list[str], *,
                k1: float = 1.2, b: float = 0.75,
                key_col: str = "doc_id",
                text_col: str = "text") -> Dataset:
    """Okapi BM25 (Lucene idf variant) of every document against a
    bag-of-terms query → (key, score), full float precision (gates
    quantize in the query wrapper). Only docs matching ≥1 term emit.

        idf(t)   = ln((N − df_t + 0.5)/(df_t + 0.5) + 1)
        score(d) = Σ_t idf(t) · tf·(k1+1) / (tf + k1·(1−b+b·|d|/avgdl))

    Two passes, both streaming: pass 1 reduces per-block partials
    (docs, token total, per-query-term df) to ONE tiny row per block —
    driver state is O(n_blocks × |query|), never O(corpus) (a doc's
    rows live in one block, so block-local distinct-doc counts sum
    exactly). Pass 2 broadcasts the |query|-bounded idf table and
    scores each block vectorized. Token rule shared verbatim with the
    SQL oracle (``NB_TOKEN_RE``); N counts ALL docs (token-less ones
    score nothing but still dilute avgdl), matching the oracle."""
    import re as _re

    tok_re = _re.compile(NB_TOKEN_RE)
    terms = sorted(set(query_terms))
    slim = docs.select_columns([key_col, text_col])

    def _partials(df: pd.DataFrame) -> pd.DataFrame:
        tok_lists = [tok_re.findall((t or "").lower())
                     for t in df[text_col]]
        dfs = {t: 0 for t in terms}
        for toks in tok_lists:
            s = set(toks)
            for t in terms:
                if t in s:
                    dfs[t] += 1
        return pd.DataFrame({
            "n_docs": [len(df)],
            "total_len": [sum(len(t) for t in tok_lists)],
            **{f"df_{i}": [dfs[t]] for i, t in enumerate(terms)}})

    stats = pd.DataFrame(
        slim.map_batches(_partials, batch_format="pandas",
                         batch_size=None).take_all())
    n = float(stats["n_docs"].sum())
    if n == 0:
        return ray.data.from_arrow(pa.table({
            key_col: pa.array([], pa.int64()),
            "score": pa.array([], pa.float64())}))
    avgdl = float(stats["total_len"].sum()) / n
    idf = {t: float(np.log((n - stats[f"df_{i}"].sum() + 0.5)
                           / (stats[f"df_{i}"].sum() + 0.5) + 1.0))
           for i, t in enumerate(terms)}
    idf_ref = ray.put(idf)

    def _score(batch: pa.Table) -> pa.Table:
        w = ray.get(idf_ref) if isinstance(idf_ref, ray.ObjectRef) else idf_ref
        keys, scores = [], []
        for key, txt in zip(batch[key_col].to_pylist(),
                            batch[text_col].to_pylist()):
            toks = tok_re.findall((txt or "").lower())
            dl = len(toks)
            s = 0.0
            hit = False
            for t in terms:
                tf = toks.count(t)
                if tf:
                    hit = True
                    s += w[t] * (tf * (k1 + 1.0)) / (
                        tf + k1 * (1.0 - b + b * dl / avgdl))
            if hit:
                keys.append(key)
                scores.append(s)
        return pa.table({key_col: pa.array(keys,
                                           batch[key_col].type),
                         "score": pa.array(scores, pa.float64())})

    return slim.map_batches(_score, batch_format="pyarrow",
                            batch_size=None)


# ---------------------------------------------------------------------------
# Winnowing fingerprints (Schleimer/Wilkerson/Aiken SIGMOD'03 — the MOSS
# document-fingerprint scheme: guaranteed detection of shared substrings
# of length ≥ w+k−1 tokens with a bounded fingerprint density)
# ---------------------------------------------------------------------------

def winnow_fingerprints(docs: Dataset, *, k: int = 5, w: int = 4,
                        key_col: str = "doc_id",
                        text_col: str = "text") -> Dataset:
    """Per-document winnowing fingerprint SET → (key, fp), distinct.

    Token k-grams (shared ``NB_TOKEN_RE`` rule, space-joined) are
    hashed with md5-hex (stable, byte-identical to DuckDB's ``md5``),
    and each sliding window of ``w`` consecutive gram hashes
    contributes its lexicographic MINIMUM; the distinct mins per doc
    are the fingerprint set (the set formulation sidesteps the
    tie-position rule — identical guarantee, order-free output).

    Embarrassingly parallel: one map per block, no shuffle, no driver
    state; dedup is per-document inside the map (a doc's rows live in
    one block). Docs shorter than k tokens emit nothing."""
    import hashlib
    import re as _re

    tok_re = _re.compile(NB_TOKEN_RE)

    def _fp(batch: pa.Table) -> pa.Table:
        keys_out, fps_out = [], []
        for key, txt in zip(batch[key_col].to_pylist(),
                            batch[text_col].to_pylist()):
            toks = tok_re.findall((txt or "").lower())
            n = len(toks) - k + 1
            if n <= 0:
                continue
            grams = [" ".join(toks[i:i + k]) for i in range(n)]
            hs = np.array([hashlib.md5(g.encode()).hexdigest()
                           for g in grams])
            # numpy has no string-min ufunc: rank the hex strings via
            # np.unique (lexicographic == md5-numeric for fixed-width
            # hex), take vectorized sliding-window mins on the ranks
            uniq, inv = np.unique(hs, return_inverse=True)
            if n <= w:
                sel = {uniq[inv.min()]}
            else:
                win = np.lib.stride_tricks.sliding_window_view(inv, w)
                sel = set(uniq[np.unique(win.min(axis=1))])
            keys_out.extend([key] * len(sel))
            fps_out.extend(sorted(sel))
        return pa.table({key_col: pa.array(keys_out,
                                           batch[key_col].type),
                         "fp": pa.array(fps_out, pa.string())})

    return docs.select_columns([key_col, text_col]).map_batches(
        _fp, batch_format="pyarrow", batch_size=None)


# ---------------------------------------------------------------------------
# Mixture sampling (data-mixing: downsample sources to hit a target
# per-source token-share ratio — the static mixture-construction step
# of a training-data pipeline)
# ---------------------------------------------------------------------------

def mixture_sample(docs: Dataset, weights: dict[str, int], *,
                   source_col: str = "source", key_col: str = "doc_id",
                   text_col: str = "text", salt: int = 17) -> Dataset:
    """Downsample each source so the surviving corpus approximates the
    integer target ratio ``weights`` by TOKEN share, without
    upsampling: the largest feasible total is ``M = min_s T_s·W/w_s``
    (the tightest source is kept whole), every other source is
    down-sampled to its share of M. Sources absent from ``weights``
    are dropped.

    Acceptance is the content-addressed multiplicative hash of
    ``hash_sample`` at ppm resolution: deterministic, resumable,
    engine/SQL-identical. All threshold arithmetic is INTEGER
    (Python bigint driver-side, HUGEINT oracle-side) so no float
    boundary can flip a doc between engine and oracle. Driver state:
    one (n_tokens) partial per (block, source) for the totals pass,
    then the |sources|-bounded threshold dict — never O(corpus).
    Doc-level acceptance approximates the token quota (docs are the
    sampling unit, as in ``hash_sample``)."""
    import re as _re

    tok_re = _re.compile(NB_TOKEN_RE)
    slim = docs.select_columns([source_col, text_col])

    def _partials(df: pd.DataFrame) -> pd.DataFrame:
        nt = [len(tok_re.findall((t or "").lower()))
              for t in df[text_col]]
        return (pd.DataFrame({source_col: df[source_col].to_numpy(),
                              "nt": nt})
                .groupby(source_col, sort=False)["nt"].sum()
                .rename("nt").reset_index())

    totals = (pd.DataFrame(
        slim.map_batches(_partials, batch_format="pandas",
                         batch_size=None).take_all())
        .groupby(source_col)["nt"].sum().to_dict())

    w_total = sum(weights.values())
    caps = [int(totals.get(s, 0)) * w_total // w
            for s, w in weights.items() if w > 0 and totals.get(s, 0)]
    m = min(caps) if caps else 0
    thr = {s: (m * w * 1_000_000) // (w_total * int(totals[s]))
           for s, w in weights.items()
           if w > 0 and totals.get(s, 0)}

    def _keep(batch: pa.Table) -> pa.Table:
        k = batch[key_col].to_numpy(zero_copy_only=False).astype(np.int64)
        src = batch[source_col].to_numpy(zero_copy_only=False)
        th = (pd.Series(src).map(thr).fillna(0)
              .to_numpy(dtype=np.int64))
        h = ((k % _M31) * _KNUTH + salt) % _M32 % 1_000_000
        return batch.filter(pa.array(h < th))

    return docs.map_batches(_keep, batch_format="pyarrow",
                            batch_size=None)


# ---------------------------------------------------------------------------
# Character-bigram language-model perplexity (CCNet-style quality
# scoring: Wenzek'20 filters web text by KenLM perplexity; the
# container has no KenLM, so the deterministic stand-in is an
# add-alpha char-bigram LM with the SAME distributed shape — one
# counting pass trains the model, a broadcast-model actor pool scores)
# ---------------------------------------------------------------------------

# ASCII-only case folding shared with the SQL oracle's
# translate(text, UPPER, lower): Unicode lower() rules never enter, so
# engine (code point + 32 for A-Z) and oracle are identical on ANY
# input, not just ASCII fixtures.
_ASCII_UPPER = "ABCDEFGHIJKLMNOPQRSTUVWXYZ"
_ASCII_LOWER = "abcdefghijklmnopqrstuvwxyz"
_LM_SEP = "\x00"  # joins docs inside a block; pairs touching it drop


def _lm_codes(texts: list[str]) -> tuple[np.ndarray, np.ndarray]:
    """Concatenate a block's texts with NUL separators → (uint32 code
    points, per-text char lengths). One encode per BLOCK, no per-char
    Python."""
    joined = _LM_SEP.join(t or "" for t in texts)
    codes = np.frombuffer(joined.encode("utf-32-le"), dtype=np.uint32)
    lens = np.array([len(t or "") for t in texts], dtype=np.int64)
    lo = (codes >= 65) & (codes <= 90)
    codes = codes.copy()
    codes[lo] += 32
    return codes, lens


def _lm_pairs(codes: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """(valid-pair mask over positions 0..len-2, int64 bigram keys
    c1<<21|c2 — code points are < 2^21 so the key stays positive)."""
    if len(codes) < 2:
        return np.zeros(0, dtype=bool), np.zeros(0, dtype=np.int64)
    c1 = codes[:-1].astype(np.int64)
    c2 = codes[1:].astype(np.int64)
    valid = (c1 != 0) & (c2 != 0)
    return valid, (c1 << 21) | c2


class BigramLM:
    """Broadcastable model: sorted bigram keys + log-probs, sorted c1
    codes + unseen-bigram defaults, global unseen-char default.
    Driver/actor budget is O(V²) for V distinct chars — trivially
    bounded (the token STREAM never leaves the cluster)."""

    def __init__(self, bigram_keys: np.ndarray, log_prob: np.ndarray,
                 c1_codes: np.ndarray, c1_default: np.ndarray,
                 global_default: float, vocab_size: int):
        self.bigram_keys = bigram_keys
        self.log_prob = log_prob
        self.c1_codes = c1_codes
        self.c1_default = c1_default
        self.global_default = global_default
        self.vocab_size = vocab_size


def lm_train_bigrams(docs: Dataset, text_col: str = "text",
                     alpha: float = 1.0) -> BigramLM:
    """Train the char-bigram LM in ONE distributed counting pass.

    Per block: one utf-32 decode, one vectorized np.unique over bigram
    keys and one over char codes → (kind, key, n) partial rows; a
    coarse aggregate merges partials in-cluster; the driver collects
    only the O(V²)-bounded count table.

    log P(c2|c1) = ln((n(c1,c2)+α) / (n(c1,·)+α·V)), V = distinct
    chars anywhere in the corpus (same formula evaluated literally by
    the SQL oracle)."""
    from omop2obo_ray.functions.shuffle import coarse_aggregate

    def _partials(df: pd.DataFrame) -> pd.DataFrame:
        codes, _lens = _lm_codes(list(df[text_col]))
        valid, keys = _lm_pairs(codes)
        bk, bn = np.unique(keys[valid], return_counts=True)
        ck, cn = np.unique(codes[codes != 0], return_counts=True)
        return pd.DataFrame({
            "kind": np.concatenate([np.zeros(len(ck), dtype=np.int8),
                                    np.ones(len(bk), dtype=np.int8)]),
            "key": np.concatenate([ck.astype(np.int64), bk]),
            "n": np.concatenate([cn, bn]).astype(np.int64)})

    counts = coarse_aggregate(
        docs.select_columns([text_col]).map_batches(
            _partials, batch_format="pandas", batch_size=None),
        ["kind", "key"],
        lambda df: df.groupby(["kind", "key"], sort=False)
        .agg(n=("n", "sum")).reset_index()).to_pandas()

    chars = counts[counts["kind"] == 0]
    big = counts[counts["kind"] == 1].sort_values("key")
    v = len(chars)
    keys = big["key"].to_numpy(dtype=np.int64)
    n = big["n"].to_numpy(dtype=np.float64)
    c1 = keys >> 21
    # n(c1,·) totals from the bigram table itself (chars that only ever
    # end a doc never appear as c1 — they fall to the global default)
    tot = pd.Series(n).groupby(pd.Series(c1)).sum()
    c1_codes = tot.index.to_numpy(dtype=np.int64)
    t = tot.to_numpy(dtype=np.float64)
    denom_by_c1 = t + alpha * v
    t_of_pair = denom_by_c1[np.searchsorted(c1_codes, c1)]
    log_prob = np.log((n + alpha) / t_of_pair)
    c1_default = np.log(alpha / denom_by_c1)
    return BigramLM(keys, log_prob, c1_codes, c1_default,
                    float(np.log(alpha / (alpha * v))), v)


class LMScorer:
    """Actor: model pulled from the object store once per actor;
    per-batch work is one utf-32 decode + two searchsorted lookups +
    one scatter-add. Emits (key, n_bigrams, nll_q) for docs with ≥1
    bigram; nll_q is the epsilon-floor-quantized mean negative
    log-prob (same gate convention as NBScorer — raw float means
    differ from SQL only by summation reassociation)."""

    def __init__(self, model_ref, text_col: str = "text",
                 key_col: str = "doc_id",
                 keep_cols: list[str] | None = None):
        self.m: BigramLM = (ray.get(model_ref)
                            if isinstance(model_ref, ray.ObjectRef)
                            else model_ref)
        self.text_col, self.key_col = text_col, key_col
        self.keep_cols = keep_cols or []

    def __call__(self, batch: pa.Table) -> pa.Table:
        m = self.m
        texts = batch[self.text_col].to_pylist()
        codes, lens = _lm_codes(texts)
        valid, keys = _lm_pairs(codes)
        # doc id per PAIR position: each doc spans lens[i] chars plus
        # one separator (except after the last); position p pairs
        # chars (p, p+1) and belongs to the doc of char p
        char_doc = np.repeat(np.arange(len(texts), dtype=np.int64),
                             lens + 1)[:len(codes)]
        di = char_doc[:-1][valid] if len(codes) >= 2 else char_doc[:0]
        pk = keys[valid]

        lp = np.full(len(pk), m.global_default)
        if len(m.bigram_keys) > 0:
            pos = np.searchsorted(m.bigram_keys, pk)
            pos_c = np.clip(pos, 0, len(m.bigram_keys) - 1)
            hit = m.bigram_keys[pos_c] == pk
            lp[hit] = m.log_prob[pos_c[hit]]
        else:
            hit = np.zeros(len(pk), dtype=bool)
        miss = ~hit
        if miss.any() and len(m.c1_codes) > 0:
            c1 = pk[miss] >> 21
            cpos = np.searchsorted(m.c1_codes, c1)
            cpos_c = np.clip(cpos, 0, len(m.c1_codes) - 1)
            chit = m.c1_codes[cpos_c] == c1
            sub = np.full(miss.sum(), m.global_default)
            sub[chit] = m.c1_default[cpos_c[chit]]
            lp[miss] = sub

        nll = np.zeros(len(texts))
        np.add.at(nll, di, -lp)
        nb = np.bincount(di, minlength=len(texts)).astype(np.int64)
        keep = nb > 0
        mean_nll = nll[keep] / nb[keep]
        mask = pa.array(keep)
        cols = {
            self.key_col: batch[self.key_col].filter(mask),
            "n_bigrams": pa.array(nb[keep]),
            "nll_q": pa.array(np.floor(mean_nll * 1e4 + 1e-6)
                              .astype(np.int64)),
        }
        for c in self.keep_cols:
            cols[c] = batch[c].filter(mask)
        return pa.table(cols)


def lm_perplexity(docs: Dataset, model: BigramLM,
                  text_col: str = "text",
                  key_col: str = "doc_id",
                  keep_cols: list[str] | None = None) -> Dataset:
    """Score every doc's mean bigram negative log-prob under a trained
    LM → (key, n_bigrams, nll_q [, keep_cols...]). Model broadcast via
    ``ray.put`` once, pulled per actor in ``__init__``."""
    ref = ray.put(model)
    cpus = int(ray.cluster_resources().get("CPU", 8)) if ray.is_initialized() else 8
    keep_cols = keep_cols or []
    return docs.select_columns(
        [key_col, text_col] + keep_cols).map_batches(
        LMScorer,
        fn_constructor_kwargs=dict(model_ref=ref, text_col=text_col,
                                   key_col=key_col, keep_cols=keep_cols),
        batch_format="pyarrow", batch_size=None,
        concurrency=(max(1, cpus // 4), max(2, cpus)), num_cpus=1)


# ---------------------------------------------------------------------------
# HyperLogLog distinct-count sketch (Flajolet'07): mergeable per-block
# register partials → coarse max-merge → per-group estimate. Unlike
# most sketch gates, this one is fully SQL-checkable: the hash is
# md5-hex (byte-identical to DuckDB's md5), register/rho are exact
# integer ops (% / >> / trailing-zero count), and the estimator
# formula is written literally identically on both sides — the only
# engine/SQL divergence is float reassociation, absorbed by the
# epsilon-floor quantizer.
# ---------------------------------------------------------------------------

def _hll_reg_rho(values, p: int, cache: dict) -> tuple[np.ndarray, np.ndarray]:
    """md5-based (register, rho) per value. rho = trailing zeros of the
    remaining 64-p bits + 1 (capped when they are all zero) — the
    trailing-zero form is exact integer arithmetic in both numpy and
    SQL (``bit_count((w & -w) - 1) + 1``), unlike leading-zero log2."""
    import hashlib

    m = 1 << p
    cap = 64 - p + 1
    regs = np.empty(len(values), dtype=np.int64)
    rhos = np.empty(len(values), dtype=np.int64)
    for i, v in enumerate(values):
        t = cache.get(v)
        if t is None:
            h = int(hashlib.md5(v.encode()).hexdigest()[:16], 16)
            w = h >> p
            t = (h % m, cap if w == 0 else (w & -w).bit_length())
            cache[v] = t
        regs[i], rhos[i] = t
    return regs, rhos


class HLLPartials:
    """Actor: per-batch (group, register, max-rho) partial rows; the
    value→(reg, rho) md5 map is cached across batches (same budget as
    the MinHasher token cache)."""

    def __init__(self, group_col: str, value_col: str, p: int):
        self.group_col, self.value_col, self.p = group_col, value_col, p
        self.cache: dict = {}

    def __call__(self, batch: pa.Table) -> pa.Table:
        df = pd.DataFrame({
            "g": batch[self.group_col].to_numpy(zero_copy_only=False),
            "v": batch[self.value_col].to_pylist(),
        }).drop_duplicates()
        uniq, inv = np.unique(df["v"].to_numpy(dtype=object),
                              return_inverse=True)
        regs, rhos = _hll_reg_rho(uniq, self.p, self.cache)
        part = (pd.DataFrame({"g": df["g"].to_numpy(), "reg": regs[inv],
                              "rho": rhos[inv]})
                .groupby(["g", "reg"], sort=False)["rho"].max()
                .reset_index())
        part.columns = [self.group_col, "reg", "rho"]
        return pa.Table.from_pandas(part, preserve_index=False)


def hll_distinct(pairs: Dataset, group_col: str, value_col: str, *,
                 p: int = 12) -> Dataset:
    """Approximate COUNT(DISTINCT value) per group → (group, nz,
    est_q). ``nz`` = non-empty registers; ``est_q`` = the HLL estimate
    with small-range linear-counting correction, floor-quantized at
    1e-3. Register merge is max — associative and idempotent, so the
    result is IDENTICAL under any partitioning (pytest pins this)."""
    from omop2obo_ray.functions.shuffle import coarse_aggregate

    m = 1 << p
    cpus = int(ray.cluster_resources().get("CPU", 8)) if ray.is_initialized() else 8
    partials = pairs.select_columns([group_col, value_col]).map_batches(
        HLLPartials,
        fn_constructor_kwargs=dict(group_col=group_col,
                                   value_col=value_col, p=p),
        batch_format="pyarrow", batch_size=None,
        concurrency=(max(1, cpus // 4), max(2, cpus)), num_cpus=1)
    merged = coarse_aggregate(
        partials, [group_col, "reg"],
        lambda df: df.groupby([group_col, "reg"], sort=False)["rho"]
        .max().reset_index())

    # formula literals shared verbatim with the SQL oracle
    alpha = 0.7213 / (1.0 + 1.079 / m)

    def _est(df: pd.DataFrame) -> pd.DataFrame:
        rho = df["rho"].to_numpy(dtype=np.float64)
        nz = len(rho)
        zeros = m - nz
        s = np.sum(2.0 ** -rho) + zeros * 1.0
        raw = alpha * m * m / s
        est = (m * np.log(m / zeros)
               if (raw <= 2.5 * m and zeros > 0) else raw)
        return pd.DataFrame({
            group_col: [df[group_col].iloc[0]],
            "nz": np.array([nz], dtype=np.int64),
            "est_q": np.array([np.floor(est * 1e3 + 1e-6)],
                              dtype=np.int64)})

    return merged.groupby(group_col).map_groups(_est,
                                                batch_format="pandas")


def hll_distinct_tokens(docs: Dataset, group_col: str = "lang",
                        text_col: str = "text", *,
                        p: int = 12) -> Dataset:
    """Distinct word tokens per group, HLL-estimated: docs are
    tokenized (shared ``NB_TOKEN_RE`` rule) and deduped per block
    before the pair stream enters ``hll_distinct`` — the token stream
    never concentrates anywhere."""
    import re as _re

    tok_re = _re.compile(NB_TOKEN_RE)

    def _pairs(df: pd.DataFrame) -> pd.DataFrame:
        gs, ts = [], []
        for g, txt in zip(df[group_col], df[text_col]):
            toks = set(tok_re.findall((txt or "").lower()))
            gs.extend([g] * len(toks))
            ts.extend(toks)
        return pd.DataFrame({group_col: gs,
                             "token": ts}).drop_duplicates()

    pairs = docs.select_columns([group_col, text_col]).map_batches(
        _pairs, batch_format="pandas", batch_size=None)
    return hll_distinct(pairs, group_col, "token", p=p)


# ---------------------------------------------------------------------------
# CCNet-style quality bucketing (Wenzek'20 §4.3: split each source's
# corpus into head/middle/tail terciles by LM perplexity — the head
# feeds training, the tail is dropped)
# ---------------------------------------------------------------------------

def ccnet_quality_buckets(docs: Dataset, model: BigramLM | None = None, *,
                          source_col: str = "source",
                          key_col: str = "doc_id",
                          text_col: str = "text") -> Dataset:
    """Label every scoreable doc 'head' / 'middle' / 'tail' within its
    source by LM mean-NLL tercile → (key, source, nll_q, bucket).

    Thresholds are EXACT per-source ORDER STATISTICS computed from the
    value DISTRIBUTION, not the value stream: a coarse aggregate
    reduces the corpus to (source, nll_q, count) rows — bounded by
    sources × distinct quantized scores (≲2×10⁵ ints), never by doc
    count — the driver cumsums that tiny table, and the threshold dict
    broadcasts back into a labeling map. All threshold arithmetic is
    integer (k₁ = ⌈n/3⌉ = (n+2)//3 over int64 scores), so no float
    boundary can flip a doc between engine and SQL; ties at a
    threshold share a bucket deterministically."""
    from omop2obo_ray.functions.shuffle import coarse_aggregate

    if model is None:
        model = lm_train_bigrams(docs, text_col=text_col)
    scored = lm_perplexity(docs, model, text_col=text_col,
                           key_col=key_col, keep_cols=[source_col])

    dist = coarse_aggregate(
        scored.select_columns([source_col, "nll_q"]),
        [source_col, "nll_q"],
        lambda df: df.groupby([source_col, "nll_q"], sort=False)
        .size().rename("c").reset_index()).to_pandas()

    thr: dict = {}
    for src, g in dist.groupby(source_col):
        g = g.sort_values("nll_q")
        cum = g["c"].cumsum().to_numpy()
        vals = g["nll_q"].to_numpy()
        n = int(cum[-1])
        k1, k2 = (n + 2) // 3, (2 * n + 2) // 3
        t1 = int(vals[np.searchsorted(cum, k1, side="left")])
        t2 = int(vals[np.searchsorted(cum, k2, side="left")])
        thr[src] = (t1, t2)

    def _label(batch: pa.Table) -> pa.Table:
        src = batch[source_col].to_numpy(zero_copy_only=False)
        q = batch["nll_q"].to_numpy(zero_copy_only=False)
        t1 = pd.Series(src).map({s: t[0] for s, t in thr.items()}).to_numpy()
        t2 = pd.Series(src).map({s: t[1] for s, t in thr.items()}).to_numpy()
        bucket = np.where(q <= t1, "head",
                          np.where(q <= t2, "middle", "tail"))
        return pa.table({key_col: batch[key_col],
                         source_col: batch[source_col],
                         "nll_q": batch["nll_q"],
                         "bucket": pa.array(bucket.astype(object),
                                            pa.string())})

    return scored.map_batches(_label, batch_format="pyarrow",
                              batch_size=None)


# ---------------------------------------------------------------------------
# Conjunctive boolean retrieval (the index-lookup half of the BM25
# stack: docs whose token set contains EVERY query term)
# ---------------------------------------------------------------------------

def postings(docs: Dataset, *, key_col: str = "doc_id",
             text_col: str = "text") -> Dataset:
    """Distinct (token, key) postings pairs — the inverted-index
    artifact. Shuffle-free: each doc appears in exactly one input row,
    so its per-doc distinct token set is globally distinct; write with
    ``.write_parquet(partition by token hash)`` to materialize an
    index."""
    import re as _re

    tok_re = _re.compile(NB_TOKEN_RE)

    def _p(df: pd.DataFrame) -> pd.DataFrame:
        ks, ts = [], []
        for k, txt in zip(df[key_col], df[text_col]):
            toks = sorted(set(tok_re.findall((txt or "").lower())))
            ks.extend([k] * len(toks))
            ts.extend(toks)
        return pd.DataFrame({"token": ts, key_col: ks})

    return docs.select_columns([key_col, text_col]).map_batches(
        _p, batch_format="pandas", batch_size=None)


def search_all_terms(docs: Dataset, terms: list[str], *,
                     key_col: str = "doc_id",
                     text_col: str = "text") -> Dataset:
    """Keys of docs containing ALL query terms as word tokens →
    (key,). The term set is tiny and broadcast-by-closure; the check
    is a per-doc set containment inside ``map_batches`` — no shuffle,
    no index required (for repeated queries over a materialized
    ``postings`` table, filter tokens ∈ terms and keep keys whose
    match count equals ``len(terms)``)."""
    import re as _re

    tok_re = _re.compile(NB_TOKEN_RE)
    need = frozenset(t.lower() for t in terms)

    def _f(batch: pa.Table) -> pa.Table:
        keep = np.array([
            need <= set(tok_re.findall((t or "").lower()))
            for t in batch[text_col].to_pylist()])
        return pa.table({key_col: batch[key_col].filter(pa.array(keep))})

    return docs.select_columns([key_col, text_col]).map_batches(
        _f, batch_format="pyarrow", batch_size=None)


# ---------------------------------------------------------------------------
# Bloom filter (Bloom'70): mergeable membership sketch — the scale
# path for dedup-against-a-published-corpus / decontamination probes.
# Like hll_distinct, the gate is fully SQL-checkable: the k probe
# positions are exact integer arithmetic on the md5 hash (double
# hashing h1 + i·h2 mod m), so engine and DuckDB light the identical
# bits — false positives included.
# ---------------------------------------------------------------------------

class BloomFilter:
    """Packed bitmap + parameters. Broadcast budget = n_bits/8 bytes
    (1 MiB default), independent of corpus size."""

    def __init__(self, bits: np.ndarray, n_bits: int, k: int):
        self.bits = bits          # uint8, length n_bits // 8
        self.n_bits = n_bits
        self.k = k


def _bloom_positions(values, n_bits: int, k: int,
                     cache: dict) -> np.ndarray:
    """(len(values), k) int64 probe positions — md5 double hashing,
    per-actor value cache."""
    import hashlib

    out = np.empty((len(values), k), dtype=np.int64)
    for i, v in enumerate(values):
        p = cache.get(v)
        if p is None:
            h = int(hashlib.md5(v.encode()).hexdigest()[:16], 16)
            h1, h2 = h % (1 << 32), (h >> 32) | 1
            p = np.fromiter(((h1 + j * h2) % n_bits for j in range(k)),
                            dtype=np.int64, count=k)
            cache[v] = p
        out[i] = p
    return out


class _BloomPartials:
    def __init__(self, value_col: str, n_bits: int, k: int):
        self.value_col, self.n_bits, self.k = value_col, n_bits, k
        self.cache: dict = {}

    def __call__(self, batch: pa.Table) -> pa.Table:
        vals = np.unique(np.asarray(
            batch[self.value_col].to_pylist(), dtype=object))
        pos = _bloom_positions(vals, self.n_bits, self.k, self.cache)
        return pa.table({"pos": pa.array(np.unique(pos.ravel()),
                                         pa.int64())})

    def cleanup(self):
        self.cache.clear()


def bloom_build(values: Dataset, value_col: str, *,
                n_bits: int = 1 << 20, k: int = 4) -> BloomFilter:
    """Build a Bloom filter over every value in ``value_col`` with ONE
    distributed pass: blocks emit their distinct SET-BIT POSITIONS, a
    coarse aggregate dedups them in-cluster, and the driver collects
    only the position list — bounded by min(distinct·k, n_bits), never
    by corpus size — and packs the bitmap. Set union is the merge, so
    the result is partitioning-invariant."""
    from omop2obo_ray.functions.shuffle import coarse_aggregate

    cpus = int(ray.cluster_resources().get("CPU", 8)) if ray.is_initialized() else 8
    partials = values.select_columns([value_col]).map_batches(
        _BloomPartials,
        fn_constructor_kwargs=dict(value_col=value_col,
                                   n_bits=n_bits, k=k),
        batch_format="pyarrow", batch_size=None,
        concurrency=(max(1, cpus // 4), max(2, cpus)), num_cpus=1)
    pos = coarse_aggregate(
        partials, ["pos"],
        lambda df: df.drop_duplicates()).to_pandas()["pos"].to_numpy()
    bits = np.zeros(n_bits // 8, dtype=np.uint8)
    np.bitwise_or.at(bits, pos // 8,
                     np.left_shift(np.uint8(1), (pos % 8).astype(np.uint8)))
    return BloomFilter(bits, n_bits, k)


class _BloomProber:
    """Actor: bitmap pulled from the object store once per actor."""

    def __init__(self, bloom_ref, value_col: str):
        self.b: BloomFilter = (ray.get(bloom_ref)
                               if isinstance(bloom_ref, ray.ObjectRef)
                               else bloom_ref)
        self.value_col = value_col
        self.cache: dict = {}

    def __call__(self, batch: pa.Table) -> pa.Table:
        b = self.b
        vals = np.asarray(batch[self.value_col].to_pylist(), dtype=object)
        uniq, inv = np.unique(vals, return_inverse=True)
        pos = _bloom_positions(uniq, b.n_bits, b.k, self.cache)
        hit = (b.bits[pos // 8] &
               np.left_shift(np.uint8(1), (pos % 8).astype(np.uint8))) != 0
        member = hit.all(axis=1)[inv]
        return batch.append_column("member", pa.array(member))


def bloom_probe(ds: Dataset, value_col: str,
                bloom: BloomFilter) -> Dataset:
    """Append a ``member`` bool column: True iff all k probe bits are
    set (no false negatives; false-positive rate ≈ (1-e^{-kn/m})^k)."""
    ref = ray.put(bloom)
    cpus = int(ray.cluster_resources().get("CPU", 8)) if ray.is_initialized() else 8
    return ds.map_batches(
        _BloomProber,
        fn_constructor_kwargs=dict(bloom_ref=ref, value_col=value_col),
        batch_format="pyarrow", batch_size=None,
        concurrency=(max(1, cpus // 4), max(2, cpus)), num_cpus=1)


def bloom_semi_join(left: Dataset, right: Dataset, *, on: str,
                    right_on: str | None = None, how: str = "left_semi",
                    n_bits: int = 1 << 20, k: int = 4,
                    n_coarse: int | None = None) -> Dataset:
    """Exact semi/anti join with a broadcast Bloom-filter pushdown —
    the join-avoidance primitive for a big-probe/small-build join
    (e.g. "keep pages whose host appears in the seed list", "drop docs
    whose hash is in the published-corpus filter").

    Scale shape: the right side's distinct keys light a fixed-size
    bitmap in ONE streaming pass (driver state = n_bits/8 bytes,
    corpus-size-independent); the bitmap is ``ray.put`` once and every
    left block filters against it in-stream. A Bloom filter has no
    false negatives, so for ``left_semi`` only the bloom SURVIVORS
    (true matches + the ~(1-e^{-kn/m})^k false-positive sliver) enter
    the exact verification exchange — the all-to-all join ships
    match-mass, not probe-mass. For ``left_anti`` the complement holds:
    bloom non-members are DEFINITE non-matches and stream straight to
    the output with no exchange at all; only the member sliver is
    anti-verified. Either way the result is exactly the semi/anti join
    (the verify join removes every false positive).

    Keys are hashed via their canonical string form on both sides, so
    any Arrow key type joins; the verify join compares native values.
    """
    if how not in ("left_semi", "left_anti"):
        raise ValueError(f"bloom_semi_join: how={how!r}")
    from omop2obo_ray.functions.shuffle import coarse_join

    rkey = right_on or on
    rkeys = right.select_columns([rkey])
    bloom = bloom_build(
        rkeys.map_batches(
            lambda b: pa.table(
                {rkey: pc.cast(b[rkey].combine_chunks(), pa.string())}),
            batch_format="pyarrow", batch_size=None),
        rkey, n_bits=n_bits, k=k)

    lcols = left.columns()
    probed = bloom_probe(
        left.map_batches(
            lambda b: b.append_column(
                "_bk", pc.cast(b[on].combine_chunks(), pa.string())),
            batch_format="pyarrow", batch_size=None),
        "_bk", bloom)

    def _take(b: pa.Table, member: bool) -> pa.Table:
        m = b["member"].combine_chunks()
        return b.filter(m if member else pc.invert(m)).select(lcols)

    survivors = probed.map_batches(
        lambda b: _take(b, True), batch_format="pyarrow",
        batch_size=None)
    if how == "left_semi":
        return coarse_join(survivors, rkeys, on=on, right_on=rkey,
                           how="left_semi", n_coarse=n_coarse)
    definite = probed.map_batches(
        lambda b: _take(b, False), batch_format="pyarrow",
        batch_size=None)
    verified = coarse_join(survivors, rkeys, on=on, right_on=rkey,
                           how="left_anti", n_coarse=n_coarse)
    return definite.union(verified)


# ---------------------------------------------------------------------------
# Deterministic train/val/test split (the last step before a training
# run: content-addressed so the split is stable across runs, resumes,
# engines and re-shards — never random())
# ---------------------------------------------------------------------------

def train_test_split(ds: Dataset, *, key: str = "doc_id",
                     val_ppm: int = 50_000, test_ppm: int = 50_000,
                     salt: int = 23) -> Dataset:
    """Append a ``split`` column ('train'/'val'/'test') from the
    ppm-resolution multiplicative hash of ``key`` (same integer-exact
    family as :func:`hash_sample`): h < val_ppm → val, h < val+test →
    test, else train. Pure streaming map — membership is a property of
    the ROW, so any subset of shards can be split independently and
    the assignment never changes."""
    cut1, cut2 = val_ppm, val_ppm + test_ppm

    def _split(batch: pa.Table) -> pa.Table:
        k = batch[key].to_numpy(zero_copy_only=False).astype(np.int64)
        h = ((k % _M31) * _KNUTH + salt) % _M32 % 1_000_000
        s = np.where(h < cut1, "val",
                     np.where(h < cut2, "test", "train"))
        return batch.append_column(
            "split", pa.array(s.astype(object), pa.string()))

    return ds.map_batches(_split, batch_format="pyarrow",
                          batch_size=None)


def train_test_split_sql(*, table: str = "documents", key: str = "doc_id",
                         val_ppm: int = 50_000, test_ppm: int = 50_000,
                         salt: int = 23, columns: str = "*") -> str:
    """The exact-same assignment rule as :func:`train_test_split`."""
    h = f"((({key} % {_M31}) * {_KNUTH} + {salt}) % {_M32}) % 1000000"
    return (f"SELECT {columns}, CASE WHEN {h} < {val_ppm} THEN 'val' "
            f"WHEN {h} < {val_ppm + test_ppm} THEN 'test' "
            f"ELSE 'train' END AS split FROM {table}")


# ---------------------------------------------------------------------------
# Quality-budget corpus selection (DataComp-style: order by quality,
# keep the best documents until a token budget is exhausted)
# ---------------------------------------------------------------------------

def select_until_budget(ds: Dataset, budget: int, *,
                        score_col: str, weight_col: str,
                        key_col: str = "doc_id") -> Dataset:
    """Keep the highest-``score`` rows whose RUNNING ``weight`` total
    (in (score DESC, key ASC) order, inclusive) stays ≤ ``budget`` →
    (key, score, weight, cum).

    Scale shape = :func:`ordered_prefix_sum` generalized to a
    composite ordering: one range exchange (the sort), a slim
    (block-first-key, block-total) pass whose driver state is one row
    per BLOCK, then a broadcast-offset second pass that cuts at the
    budget with pure int64 arithmetic. ``key_col`` must be unique (it
    breaks score ties, making the cut deterministic)."""
    slim = ds.select_columns(
        list(dict.fromkeys([key_col, score_col, weight_col])))
    sorted_ds = slim.sort([score_col, key_col],
                          descending=[True, False]).materialize()

    def _stat(batch: pa.Table) -> pa.Table:
        if len(batch) == 0:
            return pa.table({
                "s": pa.array([], batch.schema.field(score_col).type),
                "k": pa.array([], batch.schema.field(key_col).type),
                "total": pa.array([], pa.int64())})
        w = batch[weight_col].combine_chunks().to_numpy(
            zero_copy_only=False).astype(np.int64)
        return pa.table({"s": batch[score_col].slice(0, 1),
                         "k": batch[key_col].slice(0, 1),
                         "total": pa.array([int(w.sum())], pa.int64())})

    stats = sorted_ds.map_batches(_stat, batch_format="pyarrow",
                                  batch_size=None).take_all()
    stats.sort(key=lambda r: (-r["s"], r["k"]))
    offsets, acc = {}, 0
    for r in stats:
        offsets[(r["s"], r["k"])] = acc
        acc += r["total"]
    off_ref = ray.put(offsets)

    def _cut(batch: pa.Table) -> pa.Table:
        out_cols = {
            key_col: batch[key_col], "score": batch[score_col],
            "weight": batch[weight_col]}
        if len(batch) == 0:
            t = pa.table(out_cols)
            return t.append_column("cum", pa.array([], pa.int64()))
        block_off = ray.get(off_ref)[
            (batch[score_col][0].as_py(), batch[key_col][0].as_py())]
        w = batch[weight_col].combine_chunks().to_numpy(
            zero_copy_only=False).astype(np.int64)
        cum = block_off + np.cumsum(w)          # inclusive running sum
        t = pa.table(out_cols).append_column(
            "cum", pa.array(cum, pa.int64()))
        return t.filter(pa.array(cum <= budget))

    return sorted_ds.map_batches(_cut, batch_format="pyarrow",
                                 batch_size=None)


# ---------------------------------------------------------------------------
# Document chunking with overlap (RAG / embedding prep: fixed-size
# sliding windows over the token stream of each document)
# ---------------------------------------------------------------------------

def chunk_documents(docs: Dataset, *, chunk_tokens: int = 64,
                    overlap: int = 16, key_col: str = "doc_id",
                    text_col: str = "text") -> Dataset:
    """Split each doc's space-separated token stream into chunks of
    ``chunk_tokens`` with ``overlap`` tokens shared between
    consecutive chunks → (key, chunk_id, n_tokens, chunk). Chunk k
    covers tokens [k·(c−o), k·(c−o)+c); one chunk per k while the
    start is inside the doc (the final chunk may be short).
    Embarrassingly parallel per doc — no shuffle, no driver state."""
    if overlap >= chunk_tokens:
        raise ValueError("overlap must be < chunk_tokens")
    step = chunk_tokens - overlap

    def _chunks(df: pd.DataFrame) -> pd.DataFrame:
        ks, cids, ns, chunks = [], [], [], []
        for k, txt in zip(df[key_col], df[text_col]):
            toks = (txt or "").split(" ")
            n = len(toks)
            cid = 0
            for start in range(0, n, step):
                piece = toks[start:start + chunk_tokens]
                ks.append(k)
                cids.append(cid)
                ns.append(len(piece))
                chunks.append(" ".join(piece))
                cid += 1
        return pd.DataFrame({key_col: ks, "chunk_id": cids,
                             "n_tokens": ns, "chunk": chunks})

    return docs.select_columns([key_col, text_col]).map_batches(
        _chunks, batch_format="pandas", batch_size=None)


# ---------------------------------------------------------------------------
# Gopher repetition rule: within-doc duplicated n-gram mass (Rae'21
# §A1.1 — docs whose token stream is dominated by repeated n-grams
# are boilerplate/spam; complements the cross-doc dup_span_stats)
# ---------------------------------------------------------------------------

def rep_ngram_stats(docs: Dataset, *, n: int = 3,
                    key_col: str = "doc_id",
                    text_col: str = "text") -> Dataset:
    """Per-doc duplicated-``n``-gram mass → (key, total_ngrams,
    dup_ngrams, top_ngram_count), all EXACT int64 (the filter ratio
    dup/total is computed by the consumer — no float leaves the op).
    ``dup_ngrams`` = Σ count(g) over grams occurring more than once.
    Docs with fewer than ``n`` tokens emit nothing. Embarrassingly
    parallel per doc; grams never leave the block."""
    import re as _re

    tok_re = _re.compile(NB_TOKEN_RE)

    def _stats(df: pd.DataFrame) -> pd.DataFrame:
        ks, tot, dup, top = [], [], [], []
        for k, txt in zip(df[key_col], df[text_col]):
            toks = tok_re.findall((txt or "").lower())
            m = len(toks) - n + 1
            if m <= 0:
                continue
            grams = [" ".join(toks[i:i + n]) for i in range(m)]
            _u, c = np.unique(np.asarray(grams, dtype=object),
                              return_counts=True)
            ks.append(k)
            tot.append(m)
            dup.append(int(c[c > 1].sum()))
            top.append(int(c.max()))
        return pd.DataFrame({key_col: ks,
                             "total_ngrams": np.asarray(tot, np.int64),
                             "dup_ngrams": np.asarray(dup, np.int64),
                             "top_ngram_count": np.asarray(top, np.int64)})

    return docs.select_columns([key_col, text_col]).map_batches(
        _stats, batch_format="pandas", batch_size=None)


# ---------------------------------------------------------------------------
# Token-Jaccard similarity JOIN (entity resolution between two tables
# — the fuzzy-match step of the reference's concept mapping, scaled:
# token-blocking join + integer-exact Jaccard threshold)
# ---------------------------------------------------------------------------

def similarity_join(left: Dataset, right: Dataset, *,
                    key_l: str, text_l: str, key_r: str, text_r: str,
                    threshold_ppt: int = 500,
                    max_df: int | None = None,
                    num_partitions: int = 8) -> Dataset:
    """Pairs (lk, rk) whose token sets have Jaccard ≥
    ``threshold_ppt``/1000 → (lk, rk, n_shared, l_size, r_size).

    Shape: per-row token sets (shuffle-free ``postings``), candidate
    generation by a hash join on the token — every candidate pair
    shares ≥1 token, so Jaccard>0 pairs are never missed — then a
    coarse per-pair intersection count and two slim joins to attach
    set sizes. The threshold test is pure int64 cross-multiplication
    (``n·1000 ≥ t·(|L|+|R|−n)``), so engine and SQL agree exactly.

    ``max_df`` is the hot-token skew guard: tokens whose COMBINED
    document frequency exceeds it are dropped before everything
    (sizes included), redefining the metric as rare-token Jaccard —
    consistently on both sides of the gate. Without it, a stopword
    shared by every row makes candidate generation quadratic."""
    from omop2obo_ray.functions.shuffle import coarse_aggregate

    lt = postings(left, key_col=key_l, text_col=text_l).map_batches(
        lambda b: pa.table({"token": b["token"], "lk": b[key_l]}),
        batch_format="pyarrow", batch_size=None)
    rt = postings(right, key_col=key_r, text_col=text_r).map_batches(
        lambda b: pa.table({"token": b["token"], "rk": b[key_r]}),
        batch_format="pyarrow", batch_size=None)

    lt_s = _kv_schema("lk", lt)
    rt_s = _kv_schema("rk", rt)
    from omop2obo_ray.pipelines.textpipe import _sanitize_join_output

    if max_df is not None:
        # cluster-side semi-join against the rare-token set — the
        # rare vocabulary is most of the vocabulary, so a driver
        # keep-set broadcast would be O(vocab); a token-keyed hash
        # join never concentrates it anywhere
        rare = _sanitize_join_output(
            coarse_aggregate(
                lt.select_columns(["token"]).union(
                    rt.select_columns(["token"])), ["token"],
                lambda d: d.groupby("token", sort=False).size()
                .rename("df").reset_index()).map_batches(
                lambda b: b.filter(pc.less_equal(
                    b["df"], max_df)).select(["token"]),
                batch_format="pyarrow", batch_size=None),
            pa.schema([("token", pa.string())]))
        lt = _sanitize_join_output(
            lt.join(rare, join_type="inner",
                    num_partitions=num_partitions, on=("token",)),
            pa.schema([("token", pa.string()), ("lk", lt_s)]))
        rt = _sanitize_join_output(
            rt.join(rare, join_type="inner",
                    num_partitions=num_partitions, on=("token",)),
            pa.schema([("token", pa.string()), ("rk", rt_s)]))
    ls = _sanitize_join_output(
        coarse_aggregate(lt.select_columns(["lk"]), ["lk"],
                         lambda d: d.groupby("lk", sort=False).size()
                         .rename("l_size").reset_index()),
        pa.schema([("lk", lt_s), ("l_size", pa.int64())]))
    rs = _sanitize_join_output(
        coarse_aggregate(rt.select_columns(["rk"]), ["rk"],
                         lambda d: d.groupby("rk", sort=False).size()
                         .rename("r_size").reset_index()),
        pa.schema([("rk", rt_s), ("r_size", pa.int64())]))

    cand = _sanitize_join_output(
        lt.join(rt, join_type="inner", num_partitions=num_partitions,
                on=("token",)),
        pa.schema([("token", pa.string()), ("lk", lt_s), ("rk", rt_s)]))
    empty = pa.schema([("lk", lt_s), ("rk", rt_s),
                       ("n_shared", pa.int64()),
                       ("l_size", pa.int64()),
                       ("r_size", pa.int64())]).empty_table()
    if cand.count() == 0:
        # no shared tokens at all — and Ray 2.49 cannot hash-join an
        # empty left side (see NOTES: empty-left-join sharp edge)
        return ray.data.from_arrow(empty)
    inter = _sanitize_join_output(
        coarse_aggregate(cand.select_columns(["lk", "rk"]),
                         ["lk", "rk"],
                         lambda d: d.groupby(["lk", "rk"], sort=False)
                         .size().rename("n_shared").reset_index()),
        pa.schema([("lk", lt_s), ("rk", rt_s),
                   ("n_shared", pa.int64())]))

    j = _sanitize_join_output(
        inter.join(ls, join_type="inner",
                   num_partitions=num_partitions, on=("lk",)),
        pa.schema([("lk", lt_s), ("rk", rt_s), ("n_shared", pa.int64()),
                   ("l_size", pa.int64())]))
    j = _sanitize_join_output(
        j.join(rs, join_type="inner",
               num_partitions=num_partitions, on=("rk",)),
        pa.schema([("lk", lt_s), ("rk", rt_s), ("n_shared", pa.int64()),
                   ("l_size", pa.int64()), ("r_size", pa.int64())]))

    def _thresh(batch: pa.Table) -> pa.Table:
        n = batch["n_shared"].to_numpy(zero_copy_only=False)
        a = batch["l_size"].to_numpy(zero_copy_only=False)
        b = batch["r_size"].to_numpy(zero_copy_only=False)
        return batch.filter(pa.array(
            n * 1000 >= threshold_ppt * (a + b - n)))

    return j.map_batches(_thresh, batch_format="pyarrow",
                         batch_size=None)


def _kv_schema(col: str, ds: Dataset) -> pa.DataType:
    """Arrow type of ``col`` in ``ds`` (for typed empty fallbacks)."""
    f = ds.schema()
    return f.base_schema.field(col).type if hasattr(f, "base_schema") \
        else pa.schema(list(zip(f.names, f.types))).field(col).type


# ---------------------------------------------------------------------------
# Word-bigram PMI collocations (pointwise mutual information over
# adjacent token pairs — phrase mining / tokenizer-merge statistics)
# ---------------------------------------------------------------------------

def bigram_pmi(docs: Dataset, *, min_count: int = 5,
               text_col: str = "text",
               num_partitions: int = 8) -> Dataset:
    """Corpus collocations → (tok_a, tok_b, n_ab, pmi_q) for adjacent
    word pairs with ``n_ab ≥ min_count``.

    pmi = ln((n_ab / M) / ((n_a / N) · (n_b / N))) with N = total
    tokens, M = total adjacent pairs — the formula is shared verbatim
    with the SQL oracle; pmi_q is the epsilon-floor quantization.
    One distributed counting pass emits per-block (kind, a, b, n)
    partials for unigrams and bigrams together; one coarse merge makes
    them globally exact. Fully cluster-side from there: the support
    filter drops the bigram tail in-cluster, the two unigram
    normalizer counts attach to surviving bigrams via two partitioned
    hash joins (the unigram VOCABULARY never leaves the cluster — on
    web junk it is unbounded), and the only driver state is the pair
    of (N, M) totals summed from one 2-rows-per-block partial stream.
    Pair formation never crosses a document."""
    import re as _re

    from omop2obo_ray.functions.shuffle import coarse_aggregate
    from omop2obo_ray.pipelines.textpipe import _sanitize_join_output

    tok_re = _re.compile(NB_TOKEN_RE)

    def _partials(df: pd.DataFrame) -> pd.DataFrame:
        uni: dict = {}
        bi: dict = {}
        for txt in df[text_col]:
            toks = tok_re.findall((txt or "").lower())
            for t in toks:
                uni[t] = uni.get(t, 0) + 1
            for a, b in zip(toks, toks[1:]):
                bi[(a, b)] = bi.get((a, b), 0) + 1
        return pd.DataFrame({
            "kind": [0] * len(uni) + [1] * len(bi),
            "a": [t for t in uni] + [p[0] for p in bi],
            "b": [""] * len(uni) + [p[1] for p in bi],
            "n": list(uni.values()) + list(bi.values())})

    cnt_schema = pa.schema([("kind", pa.int64()), ("a", pa.string()),
                            ("b", pa.string()), ("n", pa.int64())])
    # sanitize materializes → consumed 4× below without re-execution
    merged = _sanitize_join_output(coarse_aggregate(
        docs.select_columns([text_col]).map_batches(
            _partials, batch_format="pandas", batch_size=None),
        ["kind", "a", "b"],
        lambda df: df.groupby(["kind", "a", "b"], sort=False)
        .agg(n=("n", "sum")).reset_index()), cnt_schema)

    def _empty() -> Dataset:
        return ray.data.from_arrow(pa.table({
            "tok_a": pa.array([], pa.string()),
            "tok_b": pa.array([], pa.string()),
            "n_ab": pa.array([], pa.int64()),
            "pmi_q": pa.array([], pa.int64())}))

    # (N, M) normalizers: 2 partial rows per BLOCK to the driver
    def _tot(batch: pa.Table) -> pa.Table:
        k = batch["kind"].to_numpy(zero_copy_only=False)
        n = batch["n"].to_numpy(zero_copy_only=False)
        return pa.table({
            "kind": pa.array([0, 1], pa.int64()),
            "n": pa.array([int(n[k == 0].sum()), int(n[k == 1].sum())],
                          pa.int64())})

    tot = merged.map_batches(_tot, batch_format="pyarrow",
                             batch_size=None).to_pandas()
    n_total = float(tot.loc[tot["kind"] == 0, "n"].sum())
    m_total = float(tot.loc[tot["kind"] == 1, "n"].sum())
    if m_total == 0:
        return _empty()

    bi_schema = pa.schema([("tok_a", pa.string()), ("tok_b", pa.string()),
                           ("n_ab", pa.int64())])
    bi = _sanitize_join_output(merged.map_batches(
        lambda b: pa.table(
            {"tok_a": (t := b.filter(pc.and_(
                pc.equal(b["kind"], 1),
                pc.greater_equal(b["n"], min_count))))["a"],
             "tok_b": t["b"], "n_ab": t["n"]}),
        batch_format="pyarrow", batch_size=None), bi_schema)
    if bi.count() == 0:  # empty LEFT join input fails in Ray 2.49
        return _empty()

    def _uni_side(key_name: str, cnt_name: str) -> Dataset:
        return _sanitize_join_output(merged.map_batches(
            lambda b, _k=key_name, _c=cnt_name: pa.table(
                {_k: (u := b.filter(pc.equal(b["kind"], 0)))["a"],
                 _c: u["n"]}),
            batch_format="pyarrow", batch_size=None),
            pa.schema([(key_name, pa.string()), (cnt_name, pa.int64())]))

    # sanitize between the chained joins also splits the plans
    # (NOTES_r2: two joins in one plan deadlock on small CPU counts)
    j1 = _sanitize_join_output(
        bi.join(_uni_side("_ka", "n_a"), join_type="inner",
                num_partitions=num_partitions,
                on=("tok_a",), right_on=("_ka",)),
        pa.schema(list(bi_schema) + [pa.field("n_a", pa.int64())]))
    j2 = _sanitize_join_output(
        j1.join(_uni_side("_kb", "n_b"), join_type="inner",
                num_partitions=num_partitions,
                on=("tok_b",), right_on=("_kb",)),
        pa.schema(list(bi_schema) + [pa.field("n_a", pa.int64()),
                                     pa.field("n_b", pa.int64())]))

    def _score(batch: pa.Table) -> pa.Table:
        n_ab = batch["n_ab"].to_numpy(zero_copy_only=False).astype(np.float64)
        n_a = batch["n_a"].to_numpy(zero_copy_only=False).astype(np.float64)
        n_b = batch["n_b"].to_numpy(zero_copy_only=False).astype(np.float64)
        pmi = np.log((n_ab / m_total) / ((n_a / n_total) * (n_b / n_total)))
        return pa.table({
            "tok_a": batch["tok_a"], "tok_b": batch["tok_b"],
            "n_ab": batch["n_ab"],
            "pmi_q": pa.array(np.floor(pmi * 1e4 + 1e-6).astype(np.int64))})

    return j2.map_batches(_score, batch_format="pyarrow", batch_size=None)


# ---------------------------------------------------------------------------
# Windowed co-occurrence counts (word2vec / GloVe training prep)
# ---------------------------------------------------------------------------

def cooc_counts(docs: Dataset, *, window: int = 3, min_count: int = 2,
                key_col: str = "doc_id", text_col: str = "text") -> Dataset:
    """Ordered windowed skip-gram co-occurrence counts → (w1, w2, n):
    one row per ordered pair (wᵢ, wᵢ₊ₔ), 1 ≤ d ≤ ``window``, within a
    document; pairs never cross document boundaries; pairs with global
    count < ``min_count`` dropped. The (PPMI-weighted) co-occurrence
    matrix is the input of count-based embedding training.

    One streaming pass tokenizes (shared ``NB_TOKEN_RE`` rule) and
    extracts pairs by pure array SHIFTS over the block-flattened token
    stream (a document-id array masks cross-doc pairs — no per-token
    Python loop), emitting block-partial pair counts; one coarse
    aggregate sums them globally. Driver state: none.
    """
    import re as _re

    tok_re = _re.compile(NB_TOKEN_RE)

    def _pairs(df: pd.DataFrame) -> pd.DataFrame:
        toks: list[str] = []
        did: list[int] = []
        for i, txt in enumerate(df[text_col]):
            t = tok_re.findall((txt or "").lower())
            toks.extend(t)
            did.extend([i] * len(t))
        if len(toks) < 2:
            return pd.DataFrame({"w1": pd.Series([], dtype=object),
                                 "w2": pd.Series([], dtype=object),
                                 "n": pd.Series([], dtype=np.int64)})
        tok = np.asarray(toks, dtype=object)
        d = np.asarray(did, dtype=np.int64)
        w1p, w2p = [], []
        for off in range(1, window + 1):
            if len(tok) <= off:
                break
            m = d[:-off] == d[off:]
            w1p.append(tok[:-off][m])
            w2p.append(tok[off:][m])
        if not w1p:
            return pd.DataFrame({"w1": pd.Series([], dtype=object),
                                 "w2": pd.Series([], dtype=object),
                                 "n": pd.Series([], dtype=np.int64)})
        part = (pd.DataFrame({"w1": np.concatenate(w1p),
                              "w2": np.concatenate(w2p)})
                .groupby(["w1", "w2"], sort=False).size()
                .rename("n").reset_index())
        part["n"] = part["n"].astype(np.int64)
        return part

    partial = docs.select_columns([key_col, text_col]).map_batches(
        _pairs, batch_format="pandas", batch_size=None)

    def _sum(df: pd.DataFrame) -> pd.DataFrame:
        out = (df.groupby(["w1", "w2"], sort=False)["n"].sum()
               .reset_index())
        out = out[out["n"] >= min_count]
        out["n"] = out["n"].astype(np.int64)
        return out

    from omop2obo_ray.functions.shuffle import coarse_aggregate
    return coarse_aggregate(partial, ["w1", "w2"], _sum)


def cooc_counts_sql(*, table: str = "documents", window: int = 3,
                    min_count: int = 2) -> str:
    """DuckDB oracle for :func:`cooc_counts` — zipped token/position
    unnest, positional self-join bounded by the window."""
    return f"""
        WITH tok AS (
            SELECT doc_id,
                   unnest(regexp_extract_all(lower(text),
                          '{NB_TOKEN_RE}')) AS w,
                   unnest(range(1, len(regexp_extract_all(lower(text),
                          '{NB_TOKEN_RE}')) + 1)) AS pos
            FROM {table}
        )
        SELECT t1.w AS w1, t2.w AS w2, count(*)::BIGINT AS n
        FROM tok t1
        JOIN tok t2 ON t1.doc_id = t2.doc_id
                   AND t2.pos - t1.pos BETWEEN 1 AND {window}
        GROUP BY 1, 2
        HAVING count(*) >= {min_count}
    """


# ---------------------------------------------------------------------------
# C4-style document cleaning (Raffel'20 §2.2): line-level quality rules
# + document-level drop rules. The fixture documents are single-line,
# so the test/bench contract synthesizes deterministic multi-line pages
# (synth_paragraph_docs) the SQL oracle can rebuild by pure arithmetic —
# the gate round-trips the REAL RE2 kernels, anchor_graph-style.
# ---------------------------------------------------------------------------

C4_TERMINAL_RE = r"[.!?]$"          # line must end in terminal punctuation
C4_WORD_RE = r"[A-Za-z0-9]+"        # word counter (shared with the oracle)
C4_BANNED_LINE = "javascript"       # policy-boilerplate line marker
C4_BANNED_DOC = ("lorem ipsum", "{")  # placeholder text / leftover code


def synth_paragraph_docs(docs: Dataset, key_col: str = "doc_id",
                         source_col: str = "source") -> Dataset:
    """Deterministic multi-line page per document (test/bench support —
    the sandbox fixture has no paragraph structure; production pages
    do). Shared contract with the SQL oracle: 3 + doc_id % 4 body lines
    where line i is (i % 5 == 2 → too-short line) / (i % 7 == 3 →
    'javascript' boilerplate) / ((doc_id + i) % 3 == 0 → no terminal
    punctuation) / (else → a clean kept line); docs with doc_id % 11 ==
    0 gain a 'lorem ipsum' line, doc_id % 13 == 0 a '{' code line."""
    def _synth(df: pd.DataFrame) -> pd.DataFrame:
        outs = []
        for did, src in zip(df[key_col], df[source_col]):
            nl = 3 + did % 4
            lines = []
            for i in range(nl):
                base = f"{src} page {did} line {i}"
                if i % 5 == 2:
                    lines.append("ok no.")
                elif i % 7 == 3:
                    lines.append(base + " enable javascript now.")
                elif (did + i) % 3 == 0:
                    lines.append(base + " without terminal mark")
                else:
                    lines.append(base + " has plenty of good words.")
            if did % 11 == 0:
                lines.append("lorem ipsum dolor sit amet.")
            if did % 13 == 0:
                lines.append("function() { return 1; }")
            outs.append("\n".join(lines))
        return pd.DataFrame({key_col: df[key_col], "text": outs})

    return docs.select_columns([key_col, source_col]).map_batches(
        _synth, batch_format="pandas", batch_size=None)


def c4_clean(docs: Dataset, *, min_words: int = 3, min_lines: int = 2,
             key_col: str = "doc_id", text_col: str = "text") -> Dataset:
    """C4 cleaning pass → (key, text) of surviving docs with surviving
    lines re-joined by newline. Line kept iff it ends in terminal
    punctuation, has ≥ ``min_words`` word tokens and doesn't mention
    'javascript'; doc kept iff ≥ ``min_lines`` lines survive and the
    ORIGINAL text contains neither 'lorem ipsum' nor '{'. Entirely
    shuffle-free (each doc is one row; explode/filter/re-join happen
    inside one ``map_batches``); the regex rules are module constants
    shared verbatim with the SQL oracle.
    """
    def _clean(df: pd.DataFrame) -> pd.DataFrame:
        if not len(df):
            return pd.DataFrame({key_col: df[key_col], "text": []})
        low = df[text_col].str.lower()
        doc_ok = ~(low.str.contains(C4_BANNED_DOC[0], regex=False)
                   | df[text_col].str.contains(C4_BANNED_DOC[1],
                                               regex=False))
        ex = (df[[key_col]].assign(line=df[text_col].str.split("\n"))
              .explode("line"))
        ln = ex["line"].fillna("")
        keep = (ln.str.contains(C4_TERMINAL_RE, regex=True)
                & (ln.str.count(C4_WORD_RE) >= min_words)
                & ~ln.str.lower().str.contains(C4_BANNED_LINE,
                                               regex=False))
        kept = ex[keep.to_numpy()]
        if not len(kept):
            return pd.DataFrame({key_col: df[key_col].iloc[:0],
                                 "text": pd.Series([], dtype=object)})
        agg = (kept.groupby(key_col, sort=False)["line"]
               .agg(["size", lambda s: "\n".join(s)])
               .rename(columns={"size": "nl", "<lambda_0>": "text"})
               .reset_index())
        ok_keys = set(df.loc[doc_ok, key_col])
        agg = agg[(agg["nl"] >= min_lines)
                  & agg[key_col].isin(ok_keys)]
        return agg[[key_col, "text"]]

    return docs.select_columns([key_col, text_col]).map_batches(
        _clean, batch_format="pandas", batch_size=None)


def c4_clean_sql(*, table: str = "documents", min_words: int = 3,
                 min_lines: int = 2) -> str:
    """DuckDB oracle for :func:`c4_clean` over
    :func:`synth_paragraph_docs` pages — rebuilds the synthesized lines
    by the shared arithmetic contract, then applies the same line and
    doc rules (same RE2 regexes)."""
    return f"""
        WITH base AS (
            SELECT doc_id, source, 3 + doc_id % 4 AS nl,
                   doc_id % 11 = 0 AS lorem, doc_id % 13 = 0 AS brace
            FROM {table}
        ),
        body AS (
            SELECT doc_id, lorem, brace,
                   unnest(range(0, nl)) AS i,
                   source || ' page ' || doc_id::VARCHAR || ' line ' AS pre
            FROM base
        ),
        lines AS (
            SELECT doc_id, lorem, brace, i,
                   CASE WHEN i % 5 = 2 THEN 'ok no.'
                        WHEN i % 7 = 3 THEN pre || i::VARCHAR
                             || ' enable javascript now.'
                        WHEN (doc_id + i) % 3 = 0 THEN pre || i::VARCHAR
                             || ' without terminal mark'
                        ELSE pre || i::VARCHAR
                             || ' has plenty of good words.'
                   END AS line
            FROM body
        ),
        kept AS (
            SELECT doc_id, lorem, brace, i, line FROM lines
            WHERE regexp_matches(line, '{C4_TERMINAL_RE}')
              AND len(regexp_extract_all(line, '{C4_WORD_RE}'))
                  >= {min_words}
              AND NOT contains(lower(line), '{C4_BANNED_LINE}')
        )
        SELECT doc_id,
               string_agg(line, chr(10) ORDER BY i) AS text
        FROM kept
        WHERE NOT lorem AND NOT brace
        GROUP BY doc_id
        HAVING count(*) >= {min_lines}
    """


# ---------------------------------------------------------------------------
# Character-entropy quality signal: Shannon entropy of the printable-
# ASCII character distribution per document. Low entropy flags
# keyboard-mash / repeated-char / template boilerplate; very high
# entropy flags base64 / minified blobs — both standard pre-training
# drop rules alongside the Gopher stats.
# ---------------------------------------------------------------------------

# the shared character rule: printable ASCII, i.e. RE2 class [ -~]
# (0x20..0x7e); the engine filters by code range, the oracle extracts
# with the regex — identical sets by construction
CHAR_ENTROPY_LO, CHAR_ENTROPY_HI = 0x20, 0x7E


def char_entropy(docs: Dataset, *, key_col: str = "doc_id",
                 text_col: str = "text") -> Dataset:
    """Per-document character entropy → (key, n_chars, entropy):
    ``entropy = log2(n) − Σ_c cnt(c)·log2(cnt(c)) / n`` over the
    printable-ASCII characters of the text (0 for charless docs).
    Shuffle-free: each doc is one row, so the whole computation is one
    vectorized ``map_batches`` pass (utf-32 decode → code-range filter →
    one pandas groupby per block); no driver state, full-precision
    float out (equality gates quantize in the query wrapper)."""
    def _ent(df: pd.DataFrame) -> pd.DataFrame:
        texts = df[text_col].fillna("").tolist()
        if not texts:
            return pd.DataFrame({key_col: df[key_col],
                                 "n_chars": pd.Series([], dtype=np.int64),
                                 "entropy": pd.Series([], dtype=np.float64)})
        codes = np.frombuffer("".join(texts).encode("utf-32-le"),
                              dtype=np.uint32)
        did = np.repeat(np.arange(len(texts)),
                        [len(t) for t in texts])
        m = (codes >= CHAR_ENTROPY_LO) & (codes <= CHAR_ENTROPY_HI)
        n = np.zeros(len(texts), np.int64)
        ent = np.zeros(len(texts), np.float64)
        if m.any():
            cnt = (pd.DataFrame({"i": did[m], "c": codes[m]})
                   .groupby(["i", "c"], sort=False).size()
                   .rename("n").reset_index())
            per = cnt.groupby("i", sort=False).agg(
                n=("n", "sum"),
                s=("n", lambda v: float(
                    (v.to_numpy(dtype=np.float64)
                     * np.log2(v.to_numpy(dtype=np.float64))).sum())))
            idx = per.index.to_numpy()
            n[idx] = per["n"].to_numpy()
            ent[idx] = (np.log2(per["n"].to_numpy(dtype=np.float64))
                        - per["s"].to_numpy() / per["n"].to_numpy())
        return pd.DataFrame({key_col: df[key_col].to_numpy(),
                             "n_chars": n, "entropy": ent})

    return docs.select_columns([key_col, text_col]).map_batches(
        _ent, batch_format="pandas", batch_size=None)


def char_entropy_sql(*, table: str = "documents",
                     key_col: str = "doc_id") -> str:
    """DuckDB oracle for :func:`char_entropy` — same character rule
    (``[ -~]`` = the engine's code range) and the same entropy
    expression; only group-sum reassociation differs, absorbed by the
    caller's epsilon-floor quantizer."""
    return f"""
        WITH ch AS (
            SELECT {key_col},
                   unnest(regexp_extract_all(text, '[ -~]')) AS c
            FROM {table}
        ),
        f AS (
            SELECT {key_col}, c, count(*)::BIGINT AS n
            FROM ch GROUP BY 1, 2
        ),
        agg AS (
            SELECT {key_col}, sum(n)::BIGINT AS n_chars,
                   log2(sum(n)::DOUBLE)
                   - sum(n::DOUBLE * log2(n::DOUBLE)) / sum(n::DOUBLE)
                   AS ent
            FROM f GROUP BY 1
        )
        SELECT d.{key_col},
               coalesce(agg.n_chars, 0)::BIGINT AS n_chars,
               CAST(floor(coalesce(agg.ent, 0.0) * 1000000
                    + 0.000000001) AS BIGINT) AS entropy_q
        FROM {table} d LEFT JOIN agg ON agg.{key_col} = d.{key_col}
    """


# ---------------------------------------------------------------------------
# DSIR importance weights (Xie et al.'23, "Data Selection for Language
# Models via Importance Resampling"): score every raw document by how
# much more likely its character stream is under a TARGET-domain LM
# than under the raw-corpus LM — the standard recipe for carving a
# Wikipedia-like / domain-like slice out of a web crawl. This engine's
# proxy for DSIR's hashed-ngram models is the existing char-bigram LM
# (same training/scoring kernels, O(V²) broadcast budget).
# ---------------------------------------------------------------------------

def dsir_weights(docs: Dataset, *, target_col: str = "source",
                 target_value: str, text_col: str = "text",
                 key_col: str = "doc_id",
                 target_model: BigramLM | None = None,
                 raw_model: BigramLM | None = None,
                 num_partitions: int = 8) -> Dataset:
    """Per-document importance weight → (key, n_bigrams, weight_q):
    ``weight_q = nll_q_raw − nll_q_target`` (both the epsilon-floor-
    quantized mean bigram NLLs the LM scorer emits, so the difference
    is EXACT int64 arithmetic — no float leaves the op). Positive =
    more target-like than the raw corpus average; resample/select
    downstream with ``stratified_sample`` / ``select_until_budget``
    over the weight.

    Two distributed counting passes train the target LM (docs where
    ``target_col == target_value``) and the raw LM (all docs); two
    broadcast-model scoring passes score EVERY doc under both; one
    hash join on the doc key pairs the scores. Docs outside the target
    domain hit the target model's unseen-bigram/char backoffs — exactly
    the smoothed defaults the scorer already implements. Driver state:
    the two O(V²) models only."""
    if target_model is None:
        tgt = docs.map_batches(
            lambda b, _v=target_value: b.filter(
                pc.equal(b[target_col], _v)),
            batch_format="pyarrow", batch_size=None)
        target_model = lm_train_bigrams(tgt, text_col=text_col)
    if raw_model is None:
        raw_model = lm_train_bigrams(docs, text_col=text_col)

    from omop2obo_ray.pipelines.textpipe import (_pa_schema_of,
                                                 _sanitize_join_output)

    kt = _pa_schema_of(docs.select_columns([key_col])).field(key_col).type
    st = lm_perplexity(docs, target_model, text_col=text_col,
                       key_col=key_col).map_batches(
        lambda b: pa.table({"_t_key": b[key_col], "t_nll": b["nll_q"]}),
        batch_format="pyarrow", batch_size=None)
    sr = lm_perplexity(docs, raw_model, text_col=text_col,
                       key_col=key_col)

    joined = _sanitize_join_output(
        sr.join(st, join_type="inner", num_partitions=num_partitions,
                on=(key_col,), right_on=("_t_key",)),
        pa.schema([(key_col, kt), ("n_bigrams", pa.int64()),
                   ("nll_q", pa.int64()), ("t_nll", pa.int64())]))

    def _w(batch: pa.Table) -> pa.Table:
        r = batch["nll_q"].combine_chunks().to_numpy(zero_copy_only=False)
        t = batch["t_nll"].combine_chunks().to_numpy(zero_copy_only=False)
        return pa.table({key_col: batch[key_col],
                         "n_bigrams": batch["n_bigrams"],
                         "weight_q": pa.array(r - t, pa.int64())})

    return joined.map_batches(_w, batch_format="pyarrow",
                              batch_size=None)


def dsir_weights_sql(*, table: str = "documents",
                     target_col: str = "source",
                     target_value: str,
                     key_col: str = "doc_id") -> str:
    """DuckDB oracle for :func:`dsir_weights` — the char-bigram LM
    recurrence written out twice (target-filtered and raw training
    sets) with the scorer's exact backoff ladder: seen bigram →
    ln((n+1)/(t+V)); unseen bigram, seen c1 → ln(1/(t+V)); unseen c1
    (or char unseen anywhere) → ln(1/V). Same epsilon-floor quantizer
    per model, then exact integer subtraction."""
    def lm(tag: str, where: str) -> str:
        return (
            f"chars_{tag} AS (SELECT {key_col}, unnest(string_split("
            "translate(text, 'ABCDEFGHIJKLMNOPQRSTUVWXYZ', "
            "'abcdefghijklmnopqrstuvwxyz'), '')) AS ch, "
            f"unnest(range(length(text))) AS pos FROM {table}{where}), "
            f"big_{tag} AS (SELECT a.{key_col}, a.ch AS c1, b.ch AS c2 "
            f"FROM chars_{tag} a JOIN chars_{tag} b "
            f"ON a.{key_col} = b.{key_col} AND b.pos = a.pos + 1), "
            f"cnt_{tag} AS (SELECT c1, c2, count(*)::DOUBLE AS n "
            f"FROM big_{tag} GROUP BY 1, 2), "
            f"tot_{tag} AS (SELECT c1, sum(n) AS t FROM cnt_{tag} "
            "GROUP BY 1), "
            f"vv_{tag} AS (SELECT count(DISTINCT ch)::DOUBLE AS v "
            f"FROM chars_{tag}), "
            f"lp_{tag} AS (SELECT c1, c2, ln((n + 1.0) / (t + v)) AS lp "
            f"FROM cnt_{tag} JOIN tot_{tag} USING (c1) "
            f"CROSS JOIN vv_{tag}), "
            # score ALL docs under this model, with the backoff ladder
            f"sc_{tag} AS (SELECT b.{key_col}, "
            "count(*)::BIGINT AS n_bigrams, "
            "CAST(floor((-sum(coalesce(l.lp, "
            f"CASE WHEN tt.t IS NOT NULL THEN ln(1.0 / (tt.t + vx.v)) "
            "ELSE ln(1.0 / vx.v) END)) / count(*)) * 1e4 + 1e-6) "
            "AS BIGINT) AS nll_q "
            "FROM big_all b "
            f"LEFT JOIN lp_{tag} l ON l.c1 = b.c1 AND l.c2 = b.c2 "
            f"LEFT JOIN tot_{tag} tt ON tt.c1 = b.c1 "
            f"CROSS JOIN vv_{tag} vx "
            f"GROUP BY b.{key_col})"
        )

    return (
        "WITH "
        + lm("all", "")
        + ", "
        + lm("tgt", f" WHERE {target_col} = '{target_value}'")
        + f" SELECT r.{key_col}, r.n_bigrams, "
        "(r.nll_q - t.nll_q)::BIGINT AS weight_q "
        f"FROM sc_all r JOIN sc_tgt t USING ({key_col})"
    )


# ---------------------------------------------------------------------------
# BPE tokenizer training (Sennrich'16): learn merge rules over the
# distributed word-frequency table — the tokenizer-fitting step of an
# LLM data pipeline. The corpus collapses to (word, freq) ONCE (Heaps'
# law: vocab ≪ corpus, but still a Dataset — never driver-resident);
# each merge round is one streaming pair-count pass + one argmax +
# one broadcast rewrite of the word table. Driver state per round:
# one (pair, count) row per BLOCK plus the merge list itself.
# ---------------------------------------------------------------------------

BPE_WORD_RE = r"[a-z0-9]+"  # shared word rule (lowercased alnum runs)


def _bpe_word_table(docs: Dataset, text_col: str) -> Dataset:
    """(word, freq, syms) over the corpus: one tokenize pass + one
    coarse aggregate; ``syms`` starts as the word's character list."""
    import re as _re

    from omop2obo_ray.functions.shuffle import coarse_aggregate

    tok_re = _re.compile(BPE_WORD_RE)

    def _words(df: pd.DataFrame) -> pd.DataFrame:
        words: list[str] = []
        for txt in df[text_col]:
            words.extend(tok_re.findall((txt or "").lower()))
        if not words:
            return pd.DataFrame({"word": pd.Series([], dtype=object),
                                 "freq": pd.Series([], dtype=np.int64)})
        w, c = np.unique(np.asarray(words, dtype=object),
                         return_counts=True)
        return pd.DataFrame({"word": w, "freq": c.astype(np.int64)})

    vocab = coarse_aggregate(
        docs.select_columns([text_col]).map_batches(
            _words, batch_format="pandas", batch_size=None),
        ["word"],
        lambda df: df.groupby("word", sort=False)["freq"].sum()
        .reset_index())

    def _init(df: pd.DataFrame) -> pd.DataFrame:
        out = df.copy(deep=False)
        out["syms"] = [list(w) for w in df["word"]]
        return out

    return vocab.map_batches(_init, batch_format="pandas",
                             batch_size=None)


def _merge_pair_in(syms: list, left: str, right: str) -> list:
    out, i, n = [], 0, len(syms)
    while i < n:
        if i + 1 < n and syms[i] == left and syms[i + 1] == right:
            out.append(left + right)
            i += 2
        else:
            out.append(syms[i])
            i += 1
    return out


def bpe_train(docs: Dataset, *, n_merges: int = 32, min_count: int = 2,
              text_col: str = "text") -> pd.DataFrame:
    """Learn ``n_merges`` BPE merge rules → DataFrame (rank, left,
    right, n) in merge order. Deterministic tie-break: highest count,
    then lexicographically smallest (left, right) — so the merge
    sequence is partition-order independent (pytest pins identity vs a
    single-process reference).

    Per round: a vectorized pair-count pass over the word table (freq-
    weighted, block-partial combiner) → coarse sum → per-block argmax
    rows → driver argmax over ≤ n_blocks rows → the winning pair
    broadcasts into a word-table rewrite (materialized per round so
    round k never re-executes rounds 1..k-1 — same rationale as the
    label-propagation loop). The per-word merge scan is O(len(word))
    python over the WORD TABLE only (the corpus itself is never
    touched after the first pass), the same unit of work per word as
    single-machine BPE trainers."""
    from omop2obo_ray.functions.shuffle import coarse_aggregate

    words = _bpe_word_table(docs, text_col).materialize()
    merges: list[tuple[str, str, int]] = []

    def _pair_partials(df: pd.DataFrame) -> pd.DataFrame:
        ls, rs, ns = [], [], []
        for syms, f in zip(df["syms"], df["freq"]):
            for i in range(len(syms) - 1):
                ls.append(syms[i])
                rs.append(syms[i + 1])
                ns.append(f)
        if not ls:
            return pd.DataFrame({"l": pd.Series([], dtype=object),
                                 "r": pd.Series([], dtype=object),
                                 "n": pd.Series([], dtype=np.int64)})
        return (pd.DataFrame({"l": ls, "r": rs,
                              "n": np.asarray(ns, dtype=np.int64)})
                .groupby(["l", "r"], sort=False)["n"].sum().reset_index())

    def _block_max(df: pd.DataFrame) -> pd.DataFrame:
        # smallest (−n, l, r) = highest count, lexicographic tiebreak
        top = df.sort_values(["n", "l", "r"],
                             ascending=[False, True, True]).iloc[:1]
        return top

    for rank in range(n_merges):
        counts = coarse_aggregate(
            words.map_batches(_pair_partials, batch_format="pandas",
                              batch_size=None),
            ["l", "r"],
            lambda df: df.groupby(["l", "r"], sort=False)["n"].sum()
            .reset_index())
        cand = counts.map_batches(_block_max, batch_format="pandas",
                                  batch_size=None).to_pandas()
        if not len(cand):
            break
        cand = cand.sort_values(["n", "l", "r"],
                                ascending=[False, True, True]).iloc[0]
        left, right, n = str(cand["l"]), str(cand["r"]), int(cand["n"])
        if n < min_count:
            break
        merges.append((left, right, n))

        def _apply(df: pd.DataFrame, _l=left, _r=right) -> pd.DataFrame:
            out = df.copy(deep=False)
            out["syms"] = [
                _merge_pair_in(s, _l, _r)
                if (_l in s and _r in s) else s
                for s in df["syms"]]
            return out

        words = words.map_batches(_apply, batch_format="pandas",
                                  batch_size=None).materialize()

    return pd.DataFrame({
        "rank": np.arange(len(merges), dtype=np.int64),
        "left": [m[0] for m in merges],
        "right": [m[1] for m in merges],
        "n": np.asarray([m[2] for m in merges], dtype=np.int64)})


class BPEEncoder:
    """Actor: the merge list is pulled once per actor; per-word
    encodings are memoized across batches (Zipf makes the cache hit
    rate extreme), so the per-batch cost is a tokenize + dict lookups."""

    def __init__(self, merges_ref, text_col: str = "text",
                 key_col: str = "doc_id"):
        import re as _re

        m = (ray.get(merges_ref)
             if isinstance(merges_ref, ray.ObjectRef) else merges_ref)
        self.merges = [(str(l), str(r))
                       for l, r in zip(m["left"], m["right"])]
        self.tok_re = _re.compile(BPE_WORD_RE)
        self.text_col, self.key_col = text_col, key_col
        self.cache: dict[str, int] = {}

    def _encode_len(self, word: str) -> int:
        n = self.cache.get(word)
        if n is None:
            syms = list(word)
            for l, r in self.merges:
                if l in syms and r in syms:
                    syms = _merge_pair_in(syms, l, r)
            n = len(syms)
            self.cache[word] = n
        return n

    def __call__(self, batch: pa.Table) -> pa.Table:
        toks = []
        for txt in batch[self.text_col].to_pylist():
            toks.append(sum(self._encode_len(w) for w in
                            self.tok_re.findall((txt or "").lower())))
        return pa.table({self.key_col: batch[self.key_col],
                         "n_bpe_tokens": pa.array(toks, pa.int64())})


def bpe_token_counts(docs: Dataset, merges: pd.DataFrame, *,
                     text_col: str = "text",
                     key_col: str = "doc_id") -> Dataset:
    """Per-document BPE token count under a trained merge table →
    (key, n_bpe_tokens). Merge table broadcast via ``ray.put`` once,
    applied by a memoizing actor pool."""
    ref = ray.put(merges)
    cpus = int(ray.cluster_resources().get("CPU", 8)) if ray.is_initialized() else 8
    return docs.select_columns([key_col, text_col]).map_batches(
        BPEEncoder,
        fn_constructor_kwargs=dict(merges_ref=ref, text_col=text_col,
                                   key_col=key_col),
        batch_format="pyarrow", batch_size=None,
        concurrency=(max(1, cpus // 4), max(2, cpus)), num_cpus=1)


# ---------------------------------------------------------------------------
# Edit-distance join (entity resolution / fuzzy matching): exact
# Levenshtein-<=k join via SymSpell deletion-neighborhood blocking
# (Garbe'12) + a banded-DP verify. Complements similarity_join (token
# Jaccard) for the short-string case — clinical labels vs ontology
# labels with typos, crawl-title reconciliation. The reference's
# string_similarity.py:141 solves the same label-matching problem with
# TF-IDF cosine; this is the exact-threshold variant.
# ---------------------------------------------------------------------------

def _deletion_variants(s: str, k: int) -> set[str]:
    """All strings reachable from ``s`` by deleting up to ``k`` chars.
    SymSpell guarantee: lev(s, t) <= k  ⇒  the two neighborhoods
    intersect (align s/t; delete substituted positions from both and
    inserted/deleted chars from the longer side — <= k deletions each).
    Size O(len^k / k!) — bounded per row, like shingling."""
    out = {s}
    frontier = {s}
    for _ in range(k):
        nxt = set()
        for v in frontier:
            for i in range(len(v)):
                nxt.add(v[:i] + v[i + 1:])
        nxt -= out
        out |= nxt
        frontier = nxt
    return out


def _lev_band(a: str, b: str, k: int) -> int:
    """Levenshtein(a, b) if <= k else k+1 — banded DP, O(len·(2k+1))
    cells with early abandon when a whole band row exceeds k."""
    la, lb = len(a), len(b)
    if la > lb:
        a, b, la, lb = b, a, lb, la
    big = k + 1
    if lb - la > k:
        return big
    lo_p, hi_p = 0, min(lb, k)
    prev = list(range(lo_p, hi_p + 1))
    for i in range(1, la + 1):
        lo, hi = max(0, i - k), min(lb, i + k)
        cur = []
        ca = a[i - 1]
        for j in range(lo, hi + 1):
            if j == 0:
                cur.append(i)
                continue
            v = big
            pj = j - 1
            if lo_p <= pj <= hi_p:
                v = prev[pj - lo_p] + (ca != b[pj])
            if lo_p <= j <= hi_p:
                d = prev[j - lo_p] + 1
                if d < v:
                    v = d
            if j - 1 >= lo:
                d = cur[j - 1 - lo] + 1
                if d < v:
                    v = d
            cur.append(v if v < big else big)
        if min(cur) > k:
            return big
        prev, lo_p, hi_p = cur, lo, hi
    return prev[lb - lo_p] if lo_p <= lb <= hi_p else big


def _sig64(s: str) -> int:
    """63-bit deterministic signature (uint64 group keys degrade to
    pickled-object blocks — NOTES_r2 sharp edge)."""
    import hashlib

    return int.from_bytes(
        hashlib.blake2b(s.encode("utf-8"), digest_size=8).digest(),
        "big") & 0x7FFFFFFFFFFFFFFF


def edit_distance_join(left: Dataset, right: Dataset, *,
                       key_l: str, text_l: str, key_r: str, text_r: str,
                       max_dist: int = 1,
                       num_partitions: int = 8) -> Dataset:
    """Exact fuzzy join → (lk, rk, dist) for every L×R pair with
    Levenshtein(text_l, text_r) <= ``max_dist`` (1 or 2).

    Shape: both sides emit (sig, key) rows for every <=k-deletion
    variant (hashed to int64 so the exchange never carries variant
    strings); a hash join on the signature generates candidates — the
    SymSpell pigeonhole makes this blocking EXACT, never lossy — then
    a coarse pair-dedup, two slim joins to re-attach the original
    strings, and a banded Levenshtein verify inside ``map_batches``.
    No driver state at any step; hash collisions only ever ADD
    candidates (the verify is exact).

    Skew note: degenerate near-empty strings (len <= 2k) share tiny
    neighborhoods and can hot-spot one signature; at web scale, drop
    or length-bucket such rows upstream (the same guard class as
    similarity_join's max_df)."""
    if not 1 <= max_dist <= 2:
        raise ValueError("max_dist must be 1 or 2")
    from omop2obo_ray.functions.shuffle import coarse_aggregate
    from omop2obo_ray.pipelines.textpipe import (_pa_schema_of,
                                                 _sanitize_join_output)

    k = max_dist

    def _sigs(key: str, text: str, out_key: str):
        def fn(df: pd.DataFrame) -> pd.DataFrame:
            keys: list = []
            sigs: list[int] = []
            for kv, tv in zip(df[key], df[text]):
                for v in _deletion_variants(tv or "", k):
                    keys.append(kv)
                    sigs.append(_sig64(v))
            return pd.DataFrame({
                "sig": pd.Series(sigs, dtype=np.int64),
                out_key: pd.Series(keys, dtype=df[key].dtype)})
        return fn

    ls = left.select_columns([key_l, text_l])
    rs = right.select_columns([key_r, text_r])
    lt_s = _pa_schema_of(ls).field(key_l).type
    rt_s = _pa_schema_of(rs).field(key_r).type
    lsig = ls.map_batches(_sigs(key_l, text_l, "lk"),
                          batch_format="pandas", batch_size=None)
    rsig = rs.map_batches(_sigs(key_r, text_r, "rk"),
                          batch_format="pandas", batch_size=None)

    cand = _sanitize_join_output(
        lsig.join(rsig, join_type="inner",
                  num_partitions=num_partitions, on=("sig",)),
        pa.schema([("sig", pa.int64()), ("lk", lt_s), ("rk", rt_s)]))
    empty = pa.schema([("lk", lt_s), ("rk", rt_s),
                       ("dist", pa.int64())]).empty_table()
    if cand.count() == 0:
        return ray.data.from_arrow(empty)

    pairs = _sanitize_join_output(
        coarse_aggregate(cand.select_columns(["lk", "rk"]), ["lk", "rk"],
                         lambda d: d.drop_duplicates(["lk", "rk"])),
        pa.schema([("lk", lt_s), ("rk", rt_s)]))

    lslim = ls.map_batches(
        lambda b: pa.table({"lk": b[key_l], "_lt": b[text_l]}),
        batch_format="pyarrow", batch_size=None)
    rslim = rs.map_batches(
        lambda b: pa.table({"rk": b[key_r], "_rt": b[text_r]}),
        batch_format="pyarrow", batch_size=None)
    j = _sanitize_join_output(
        pairs.join(lslim, join_type="inner",
                   num_partitions=num_partitions, on=("lk",)),
        pa.schema([("lk", lt_s), ("rk", rt_s), ("_lt", pa.string())]))
    j = _sanitize_join_output(
        j.join(rslim, join_type="inner",
               num_partitions=num_partitions, on=("rk",)),
        pa.schema([("lk", lt_s), ("rk", rt_s), ("_lt", pa.string()),
                   ("_rt", pa.string())]))

    def _verify(df: pd.DataFrame) -> pd.DataFrame:
        dists = np.fromiter(
            (_lev_band(a or "", b or "", k)
             for a, b in zip(df["_lt"], df["_rt"])),
            dtype=np.int64, count=len(df))
        keep = dists <= k
        return pd.DataFrame({"lk": df["lk"].to_numpy()[keep],
                             "rk": df["rk"].to_numpy()[keep],
                             "dist": dists[keep]})

    return j.map_batches(_verify, batch_format="pandas",
                         batch_size=None)


# ---------------------------------------------------------------------------
# Reciprocal-rank fusion (retrieval ensemble)
# ---------------------------------------------------------------------------

def global_ranks(ds: Dataset, key: str, score: str,
                 rank_col: str = "rank") -> Dataset:
    """1-based global rank by (``score`` DESC, ``key`` ASC) — the
    distributed row_number() the retrieval family needs.

    Scale shape: one range exchange (the multi-key sort — inherent to
    any global ranking) then the two-pass block scheme of
    ``ordered_prefix_sum``: a slim per-block (first_score, first_key,
    n_rows) pass gives the driver ONE row per block (bounded by block
    count, never rows); block offsets are prefix-summed in the same
    comparator order and broadcast; pass two adds offset + arange.
    Requires unique ``key`` values (ties broken by key need a total
    order)."""
    sorted_ds = ds.sort([score, key],
                        descending=[True, False]).materialize()

    def _stat(batch: pa.Table) -> pa.Table:
        if len(batch) == 0:
            return pa.table({
                "s": pa.array([], batch.schema.field(score).type),
                "k": pa.array([], batch.schema.field(key).type),
                "n": pa.array([], pa.int64())})
        return pa.table({"s": batch[score].slice(0, 1),
                         "k": batch[key].slice(0, 1),
                         "n": pa.array([len(batch)], pa.int64())})

    stats = sorted_ds.map_batches(_stat, batch_format="pyarrow",
                                  batch_size=None).take_all()
    # re-sort by the same comparator (block order is already total,
    # this is belt-and-suspenders against take_all reordering);
    # stable two-pass: secondary key asc first, then primary desc
    stats = sorted(stats, key=lambda r: r["k"])
    stats = sorted(stats, key=lambda r: r["s"], reverse=True)
    offsets, acc = {}, 0
    for r in stats:
        offsets[r["k"]] = acc
        acc += r["n"]
    off_ref = ray.put(offsets)

    def _apply(batch: pa.Table) -> pa.Table:
        if len(batch) == 0:
            return batch.append_column(rank_col, pa.array([], pa.int64()))
        off = ray.get(off_ref)[batch[key][0].as_py()]
        ranks = off + np.arange(1, len(batch) + 1, dtype=np.int64)
        return batch.append_column(rank_col, pa.array(ranks, pa.int64()))

    return sorted_ds.map_batches(_apply, batch_format="pyarrow",
                                 batch_size=None)


def rrf_fuse(rankings: list[Dataset], key: str, score: str, *,
             k: int = 60, scale: int = 1_000_000) -> Dataset:
    """Reciprocal-rank fusion (Cormack'09): fused(d) = Σ_lists
    scale // (k + rank_list(d)) — the standard retrieval-ensemble
    combiner (BM25 ∪ dense cosine ∪ ...). Contributions are PURE
    INTEGER (scaled floor division), so the result is exact and
    partition-invariant — no float leaves the op; a doc absent from a
    list contributes nothing for it (standard RRF).

    Scale shape: one global-rank pass per list (see ``global_ranks``)
    + one union + one coarse keyed sum. Driver state is bounded by
    block counts only."""
    from omop2obo_ray.functions.shuffle import coarse_aggregate

    contribs = []
    for r in rankings:
        ranked = global_ranks(r.select_columns([key, score]), key, score)

        def _w(batch: pa.Table) -> pa.Table:
            rk = batch["rank"].to_numpy(zero_copy_only=False)
            return pa.table({
                key: batch[key],
                "w": pa.array(scale // (k + rk), pa.int64())})

        contribs.append(ranked.map_batches(_w, batch_format="pyarrow",
                                           batch_size=None))
    allc = contribs[0]
    for c in contribs[1:]:
        allc = allc.union(c)
    return coarse_aggregate(
        allc, [key],
        lambda df: df.groupby(key, sort=False)["w"].sum()
        .rename("fused_q").reset_index())


# ---------------------------------------------------------------------------
# Host blocklist filtering (safety / quality domain lists)
# ---------------------------------------------------------------------------

_HOST_RE = r"^[A-Za-z][A-Za-z0-9+.\-]*://([^/?#]+)"


def filter_blocked_hosts(pages: Dataset, blocked: list[str],
                         url_col: str = "url",
                         max_labels: int = 8) -> Dataset:
    """Drop rows whose URL host equals a blocked domain or is any
    subdomain of one (label-suffix semantics: blocking ``example.com``
    removes ``www.example.com`` but NOT ``badexample.com``) — the
    standard safety/quality domain-list filter of web pipelines.

    Scale shape: the blocklist is dimension data (even full production
    lists are ~10⁶ rows) → broadcast via ``ray.put`` once, probed as a
    hash set. The suffix walk is vectorized: ``max_labels`` rounds of
    a leading-label strip + an ``isin`` probe per batch — no per-row
    Python, no join, no shuffle. Host extraction shares ``_HOST_RE``
    with the SQL oracle (RE2 both sides)."""
    blocked_ref = ray.put(frozenset(h.lower() for h in blocked))

    def _keep(df: pd.DataFrame) -> pd.DataFrame:
        bl = ray.get(blocked_ref)
        host = (df[url_col].str.extract(_HOST_RE, expand=False)
                .str.lower().fillna(""))
        hit = host.isin(bl)
        cand = host
        for _ in range(max_labels):
            nxt = cand.str.replace(r"^[^.]+\.", "", regex=True, n=1)
            moved = nxt != cand
            if not moved.any():
                break
            cand = nxt
            hit |= cand.isin(bl) & moved
        return df[~hit]

    return pages.map_batches(_keep, batch_format="pandas",
                             batch_size=None)


# ---------------------------------------------------------------------------
# Mention contexts (KWIC evidence snippets)
# ---------------------------------------------------------------------------

class _ContextScanner:
    """Actor: Aho-Corasick over the broadcast probe list (built once
    per actor), emitting the FIRST occurrence per (doc, probe) with a
    ±window character snippet — the corpus form of the reference's
    evidence strings (exact surface + where it matched)."""

    def __init__(self, probes_ref, key_col: str, text_col: str,
                 window: int):
        from omop2obo_ray.functions.aho import AhoCorasick

        probes = (ray.get(probes_ref)
                  if isinstance(probes_ref, ray.ObjectRef) else probes_ref)
        self._ac = AhoCorasick(list(probes))
        self._ac.build()
        self.key_col, self.text_col = key_col, text_col
        self.window = window

    def __call__(self, batch: pa.Table) -> pa.Table:
        keys = batch[self.key_col].to_pylist()
        texts = batch[self.text_col].to_pylist()
        w = self.window
        out_k, out_p, out_pos, out_s = [], [], [], []
        for k, t in zip(keys, texts):
            t = t or ""
            first: dict[str, int] = {}
            # substring semantics (word_boundaries=False): the shared
            # rule with SQL strpos, which knows no token boundaries
            for start, end in self._ac.scan(t, word_boundaries=False):
                p = t[start:end]
                if p not in first or start < first[p]:
                    first[p] = start
            for p, s0 in sorted(first.items()):
                pos1 = s0 + 1                       # 1-based, as strpos
                lo = max(0, s0 - w)
                out_k.append(k)
                out_p.append(p)
                out_pos.append(pos1)
                out_s.append(t[lo:s0 + len(p) + w])
        return pa.table({
            self.key_col: pa.array(out_k),
            "probe": pa.array(out_p, pa.string()),
            "pos": pa.array(np.asarray(out_pos, dtype=np.int64)),
            "snippet": pa.array(out_s, pa.string())})


def mention_contexts(docs: Dataset, probes: list[str], *,
                     key_col: str = "doc_id", text_col: str = "text",
                     window: int = 20) -> Dataset:
    """(doc, probe, first position, ±window snippet) for every probe
    that occurs in a document. One automaton scan per doc finds ALL
    probes at once (vs |probes| strpos passes); probes are broadcast
    dimension data. Streaming, no shuffle."""
    probes_ref = ray.put([p for p in probes if p])
    cpus = int(ray.cluster_resources().get("CPU", 8))
    return docs.map_batches(
        _ContextScanner,
        fn_constructor_args=(probes_ref, key_col, text_col, window),
        batch_format="pyarrow", batch_size=4096,
        concurrency=(max(1, cpus // 4), max(2, cpus)), num_cpus=1)


# ---------------------------------------------------------------------------
# zlib compression-ratio quality signal
# ---------------------------------------------------------------------------

def compression_stats(docs: Dataset, *, key_col: str = "doc_id",
                      text_col: str = "text", level: int = 6) -> Dataset:
    """Per-document zlib compression ratio — the classic
    'too-repetitive / too-random' quality signal (RefinedWeb / DCLM
    style: boilerplate and keyword-stuffed spam compress far below
    natural prose; encrypted/binary junk barely compresses at all).

    Output (key, raw_len, comp_len, ratio_q) with ``ratio_q`` =
    ``comp_len * 10000 // max(raw_len, 1)`` — an exact int64, so the
    signal is bit-stable across partitionings and engines (zlib with a
    pinned ``level`` is fully deterministic for a given input).

    Streaming per-block map, no shuffle, no driver state; the zlib
    call is C-level per document (the loop does no Python-side work
    beyond the call). DuckDB has no zlib, so the driver gate is
    rows-only; the pytest oracle is the python zlib library itself.
    """
    import zlib

    def _stats(df: pd.DataFrame) -> pd.DataFrame:
        raw = [(t or "").encode("utf-8") for t in df[text_col]]
        raw_len = np.fromiter((len(b) for b in raw), np.int64,
                              count=len(raw))
        comp_len = np.fromiter(
            (len(zlib.compress(b, level)) for b in raw), np.int64,
            count=len(raw))
        return pd.DataFrame({
            key_col: df[key_col].to_numpy(),
            "raw_len": raw_len,
            "comp_len": comp_len,
            "ratio_q": comp_len * 10000 // np.maximum(raw_len, 1)})

    return docs.select_columns([key_col, text_col]).map_batches(
        _stats, batch_format="pandas", batch_size=None)


# ---------------------------------------------------------------------------
# Gopher document-quality rules (Rae'21 §A1.1) — the line-level and
# lexical rules that complement quality_filter's token-shape gates
# ---------------------------------------------------------------------------

GOPHER_STOPWORDS = ("the", "be", "to", "of", "and", "that", "have",
                    "with")
_GOPHER_BULLET_RE = r"^[-*•] "       # line starts with a bullet marker
_GOPHER_ELLIPSIS_RE = r"\.\.\.$"     # line ends with an ellipsis
_GOPHER_WORD_RE = r"\S+"             # Gopher 'words' are ws-split runs
_GOPHER_ALPHA_RE = r"[A-Za-z]"


def gopher_stats(docs: Dataset, *, key_col: str = "doc_id",
                 text_col: str = "text",
                 min_words: int = 50, max_words: int = 100_000,
                 min_mean_len_x1: int = 3, max_mean_len_x1: int = 10,
                 symbol_ratio_x10: int = 1,
                 bullet_ratio_x10: int = 9,
                 ellipsis_ratio_x10: int = 3,
                 alpha_ratio_x5: int = 4,
                 min_stopwords: int = 2) -> Dataset:
    """Gopher quality-rule signals per document, all EXACT int64 so the
    keep decision is pure integer arithmetic (no float can diverge
    between engine and oracle):

    - ``n_words`` / ``sum_word_len``: whitespace-split words and their
      total length (mean-word-length bounds via cross-multiplication:
      ``min·n ≤ Σlen ≤ max·n``).
    - ``n_symbols``: ``#`` characters + non-overlapping ``...`` runs
      (symbol-to-word ratio rule: ``10·sym ≤ n_words``).
    - ``n_lines`` / ``n_bullet`` / ``n_ellipsis``: lines, lines
      starting with a bullet marker, lines ending in an ellipsis
      (``10·bullet ≤ 9·lines``; ``10·ellipsis ≤ 3·lines``).
    - ``n_alpha``: words containing at least one ASCII letter
      (``5·alpha ≥ 4·n_words``).
    - ``n_stop``: DISTINCT Gopher stop words present (``≥ 2``).
    - ``keep``: 1 iff every rule passes.

    One vectorized pass per block (token explode + C groupbys, the
    `_repetition_batch` pattern); line rules are multiline-regex counts
    on the whole text. Streaming, shuffle-free, no driver state. The
    regexes and thresholds are module constants shared verbatim with
    :func:`gopher_stats_sql`.
    """
    import re as _re

    word_re = _re.compile(_GOPHER_WORD_RE)
    alpha_re = _re.compile(_GOPHER_ALPHA_RE)
    bullet_re = _re.compile(_GOPHER_BULLET_RE, _re.M)
    ellipsis_re = _re.compile(_GOPHER_ELLIPSIS_RE, _re.M)
    stop_set = frozenset(GOPHER_STOPWORDS)

    def _stats(df: pd.DataFrame) -> pd.DataFrame:
        n = len(df)
        text = df[text_col].fillna("")
        toks = text.str.findall(word_re)
        counts = toks.str.len().to_numpy().astype(np.int64)
        parent = np.repeat(np.arange(n, dtype=np.int64), counts)
        flat = pd.Series(
            [t for lst in toks for t in lst], dtype=object)
        lens = flat.str.len().to_numpy().astype(np.int64) \
            if len(flat) else np.zeros(0, np.int64)
        alpha = flat.str.contains(alpha_re).to_numpy() \
            if len(flat) else np.zeros(0, bool)
        n_words = np.bincount(parent, minlength=n).astype(np.int64)
        sum_len = np.bincount(parent, weights=lens,
                              minlength=n).astype(np.int64)
        n_alpha = np.bincount(parent[alpha], minlength=n).astype(np.int64)
        # distinct stopwords present per doc
        low = flat.str.lower() if len(flat) else flat
        is_stop = low.isin(stop_set).to_numpy() if len(flat) else \
            np.zeros(0, bool)
        if is_stop.any():
            sp = pd.DataFrame({"p": parent[is_stop],
                               "t": low.to_numpy()[is_stop]})
            per = sp.drop_duplicates().groupby("p", sort=False).size()
            n_stop = np.zeros(n, np.int64)
            n_stop[per.index.to_numpy()] = per.to_numpy()
        else:
            n_stop = np.zeros(n, np.int64)
        n_symbols = (text.str.count("#", _re.NOFLAG).to_numpy()
                     + text.str.count(r"\.\.\.").to_numpy()
                     ).astype(np.int64)
        n_lines = (text.str.count("\n").to_numpy() + 1).astype(np.int64)
        n_bullet = text.str.count(bullet_re).to_numpy().astype(np.int64)
        n_ellipsis = text.str.count(ellipsis_re).to_numpy().astype(np.int64)
        keep = ((n_words >= min_words) & (n_words <= max_words)
                & (min_mean_len_x1 * n_words <= sum_len)
                & (sum_len <= max_mean_len_x1 * n_words)
                & (10 * n_symbols <= symbol_ratio_x10 * n_words)
                & (10 * n_bullet <= bullet_ratio_x10 * n_lines)
                & (10 * n_ellipsis <= ellipsis_ratio_x10 * n_lines)
                & (5 * n_alpha >= alpha_ratio_x5 * n_words)
                & (n_stop >= min_stopwords)).astype(np.int64)
        return pd.DataFrame({
            key_col: df[key_col].to_numpy(),
            "n_words": n_words, "sum_word_len": sum_len,
            "n_symbols": n_symbols, "n_lines": n_lines,
            "n_bullet": n_bullet, "n_ellipsis": n_ellipsis,
            "n_alpha": n_alpha, "n_stop": n_stop, "keep": keep})

    return docs.select_columns([key_col, text_col]).map_batches(
        _stats, batch_format="pandas", batch_size=None)


def synth_gopher_docs(docs: Dataset, key_col: str = "doc_id") -> Dataset:
    """Deterministic multi-line documents exercising EVERY Gopher rule
    (bullets, ellipses, symbol runs, digit-only words, stopword-free
    lines) by pure ``doc_id`` arithmetic — the SQL oracle rebuilds the
    identical text, so the gate round-trips the real rule kernels, not
    a fixture coincidence. Contract (shared with
    :func:`gopher_stats_sql`): ``n_lines = 2 + doc_id % 4``; line i is
      - ``i % 4 == 0`` → ``'- bullet item I of doc D'``
      - ``i % 4 == 1`` → ``'the data of doc D and line I have weight'``
      - ``i % 4 == 2`` → ``'trailing thought number I ...'``
      - ``i % 4 == 3`` → ``'### D 12345 67890 ...deep'``
    """
    def _synth(df: pd.DataFrame) -> pd.DataFrame:
        ids = df[key_col].to_numpy()
        texts = []
        for d in ids:
            lines = []
            for i in range(2 + int(d) % 4):
                m = i % 4
                if m == 0:
                    lines.append(f"- bullet item {i} of doc {d}")
                elif m == 1:
                    lines.append(
                        f"the data of doc {d} and line {i} have weight")
                elif m == 2:
                    lines.append(f"trailing thought number {i} ...")
                else:
                    lines.append(f"### {d} 12345 67890 ...deep")
            texts.append("\n".join(lines))
        return pd.DataFrame({key_col: ids, "text": texts})

    return docs.select_columns([key_col]).map_batches(
        _synth, batch_format="pandas", batch_size=None)


def gopher_stats_sql(*, table: str = "documents",
                     key_col: str = "doc_id",
                     min_words: int = 50, max_words: int = 100_000,
                     min_mean_len_x1: int = 3, max_mean_len_x1: int = 10,
                     symbol_ratio_x10: int = 1,
                     bullet_ratio_x10: int = 9,
                     ellipsis_ratio_x10: int = 3,
                     alpha_ratio_x5: int = 4,
                     min_stopwords: int = 2) -> str:
    """DuckDB oracle for :func:`gopher_stats` over
    :func:`synth_gopher_docs` pages — rebuilds the synthesized lines by
    the shared arithmetic contract, then recomputes every signal with
    the same RE2 regexes and integer thresholds."""
    stops = ", ".join(f"'{s}'" for s in GOPHER_STOPWORDS)
    return f"""
        WITH lines AS (
            SELECT {key_col},
                   unnest(range(0, 2 + {key_col} % 4)) AS i
            FROM {table}
        ),
        built AS (
            SELECT {key_col}, i,
                   CASE WHEN i % 4 = 0 THEN
                            '- bullet item ' || i || ' of doc ' || {key_col}
                        WHEN i % 4 = 1 THEN
                            'the data of doc ' || {key_col} || ' and line '
                            || i || ' have weight'
                        WHEN i % 4 = 2 THEN
                            'trailing thought number ' || i || ' ...'
                        ELSE '### ' || {key_col} || ' 12345 67890 ...deep'
                   END AS line
            FROM lines
        ),
        doc AS (
            SELECT {key_col},
                   string_agg(line, chr(10) ORDER BY i) AS text,
                   count(*) AS n_lines,
                   sum(CASE WHEN regexp_matches(line,
                       '{_GOPHER_BULLET_RE}') THEN 1 ELSE 0 END)
                       AS n_bullet,
                   sum(CASE WHEN regexp_matches(line,
                       '{_GOPHER_ELLIPSIS_RE}') THEN 1 ELSE 0 END)
                       AS n_ellipsis
            FROM built GROUP BY {key_col}
        ),
        sig AS (
            SELECT {key_col}, n_lines, n_bullet, n_ellipsis,
                   regexp_extract_all(text, '{_GOPHER_WORD_RE}') AS toks,
                   len(text) - len(replace(text, '#', ''))
                       + len(regexp_extract_all(text, '\\.\\.\\.'))
                       AS n_symbols
            FROM doc
        ),
        agg AS (
            SELECT {key_col}, n_lines, n_bullet, n_ellipsis, n_symbols,
                   len(toks) AS n_words,
                   len(list_filter(toks, t ->
                       regexp_matches(t, '{_GOPHER_ALPHA_RE}')))
                       AS n_alpha,
                   CAST(coalesce(list_sum(list_transform(toks,
                       t -> len(t))), 0) AS BIGINT) AS sum_word_len,
                   len(list_distinct(list_filter(
                       list_transform(toks, t -> lower(t)),
                       t -> t IN ({stops})))) AS n_stop
            FROM sig
        )
        SELECT {key_col},
               CAST(n_words AS BIGINT) AS n_words,
               sum_word_len,
               CAST(n_symbols AS BIGINT) AS n_symbols,
               CAST(n_lines AS BIGINT) AS n_lines,
               CAST(n_bullet AS BIGINT) AS n_bullet,
               CAST(n_ellipsis AS BIGINT) AS n_ellipsis,
               CAST(n_alpha AS BIGINT) AS n_alpha,
               CAST(n_stop AS BIGINT) AS n_stop,
               CAST(CASE WHEN n_words >= {min_words}
                    AND n_words <= {max_words}
                    AND {min_mean_len_x1} * n_words <= sum_word_len
                    AND sum_word_len <= {max_mean_len_x1} * n_words
                    AND 10 * n_symbols <= {symbol_ratio_x10} * n_words
                    AND 10 * n_bullet <= {bullet_ratio_x10} * n_lines
                    AND 10 * n_ellipsis <= {ellipsis_ratio_x10} * n_lines
                    AND 5 * n_alpha >= {alpha_ratio_x5} * n_words
                    AND n_stop >= {min_stopwords}
                    THEN 1 ELSE 0 END AS BIGINT) AS keep
        FROM agg
    """


# ---------------------------------------------------------------------------
# n-gram benchmark decontamination (GPT-3 appendix-C style): flag any
# training document sharing a token n-gram with an eval benchmark
# ---------------------------------------------------------------------------

def ngram_decontaminate(docs: Dataset, benchmark: Dataset, *, n: int = 5,
                        key_col: str = "doc_id", text_col: str = "text",
                        bench_text_col: str = "text",
                        mode: str = "stats") -> Dataset:
    """GPT-3-style n-gram collision decontamination: a training doc is
    contaminated iff it shares at least one token ``n``-gram with the
    benchmark corpus (the published method uses 13-grams; the substring
    variant lives in :func:`decontaminate`).

    Scale shape: the benchmark is EVAL-SUITE-sized dimension data (MBs,
    not corpus-scale), so its distinct grams are aggregated in-cluster
    (per-block set union), collected once — driver state bounded by
    benchmark size — and broadcast via ``ray.put``. The corpus streams:
    each doc builds its gram set and probes the broadcast set; no
    shuffle, no join, no corpus-sized state anywhere.

    Token rule: lowercase ``NB_TOKEN_RE`` (shared with the oracle);
    gram = n tokens space-joined. ``n_hits`` counts DISTINCT matched
    grams (occurrence counts would double-count repeated grams on both
    sides). ``mode='stats'`` → (key, n_hits, contaminated 0/1) for
    every doc; ``mode='drop'`` → surviving docs unchanged.
    """
    import re as _re

    tok_re = _re.compile(NB_TOKEN_RE)

    def _bench_grams(df: pd.DataFrame) -> pd.DataFrame:
        grams: set[str] = set()
        for txt in df[bench_text_col]:
            toks = tok_re.findall((txt or "").lower())
            for i in range(len(toks) - n + 1):
                grams.add(" ".join(toks[i:i + n]))
        return pd.DataFrame({"gram": sorted(grams)})

    partials = benchmark.select_columns([bench_text_col]).map_batches(
        _bench_grams, batch_format="pandas", batch_size=None).to_pandas()
    bench_set = frozenset(partials["gram"])
    bench_ref = ray.put(bench_set)

    def _scan(df: pd.DataFrame) -> pd.DataFrame:
        bset = ray.get(bench_ref)
        hits = np.zeros(len(df), np.int64)
        for j, txt in enumerate(df[text_col]):
            toks = tok_re.findall((txt or "").lower())
            grams = {" ".join(toks[i:i + n])
                     for i in range(len(toks) - n + 1)}
            hits[j] = len(grams & bset)
        if mode == "drop":
            return df[hits == 0]
        return pd.DataFrame({
            key_col: df[key_col].to_numpy(),
            "n_hits": hits,
            "contaminated": (hits > 0).astype(np.int64)})

    cols = [key_col, text_col] if mode == "stats" else None
    src = docs.select_columns(cols) if cols else docs
    return src.map_batches(_scan, batch_format="pandas", batch_size=None)


def ngram_decontaminate_sql(*, table: str = "documents", n: int = 5,
                            key_col: str = "doc_id",
                            bench_filter: str = "doc_id % 97 = 0") -> str:
    """DuckDB oracle for :func:`ngram_decontaminate` (stats mode) with
    the benchmark defined as a filtered subset of the same table —
    the same lowercase token rule and distinct-gram counting."""
    return f"""
        WITH corpus AS (
            SELECT {key_col},
                   regexp_extract_all(lower(text), '{NB_TOKEN_RE}')
                       AS toks
            FROM {table}
        ),
        cg AS (
            SELECT DISTINCT {key_col},
                   array_to_string(toks[i:i + {n - 1}], ' ') AS gram
            FROM (SELECT {key_col}, toks,
                         unnest(range(1, greatest(len(toks) - {n} + 2,
                                                  1))) AS i
                  FROM corpus)
        ),
        bg AS (
            SELECT DISTINCT gram FROM cg WHERE {bench_filter}
        ),
        hits AS (
            SELECT {key_col}, count(*) AS n_hits
            FROM cg JOIN bg USING (gram) GROUP BY {key_col}
        )
        SELECT d.{key_col},
               CAST(coalesce(h.n_hits, 0) AS BIGINT) AS n_hits,
               CAST(coalesce(h.n_hits, 0) > 0 AS BIGINT) AS contaminated
        FROM {table} d LEFT JOIN hits h USING ({key_col})
    """


# ---------------------------------------------------------------------------
# Relative-href resolution (RFC 3986) — raw anchor hrefs → absolute
# URLs against the page base, the step between anchor extraction and
# any real web-graph build
# ---------------------------------------------------------------------------

# lowercase-only on purpose: urljoin LOWERCASES the scheme of a
# same-scheme absolute href, so uppercase schemes must take the
# urljoin fallback for the fast path to stay ≡ urljoin
_SCHEME_RE = r"^[a-z][a-z0-9+.\-]*:"
_BASE_ROOT_RE = r"^([a-z][a-z0-9+.\-]*:)(//[^/?#]*)"


def resolve_hrefs(edges: Dataset, *, base_col: str = "src",
                  href_col: str = "dst",
                  out_col: str = "resolved") -> Dataset:
    """Resolve each href against its page URL (RFC 3986 reference
    resolution, ``urllib.parse.urljoin`` semantics) → the input plus an
    ``resolved`` column. Anchor extraction emits hrefs verbatim
    (absolute, protocol-relative, root-relative, path-relative with
    dot segments); a web graph needs them absolute before host stats /
    dedup / PageRank.

    Scale shape: streaming per-block map, no shuffle. Three vectorized
    fast paths cover the dominant web cases — (a) absolute hrefs pass
    through, (b) ``//host/…`` takes the base scheme, (c) ``/path``
    takes the base scheme+authority — all guarded to hrefs without dot
    segments (those change under RFC merge). The remainder (relative
    paths, ``./``/``../``, bare queries/fragments, empties) falls back
    to per-row ``urljoin``; the fast paths are pinned ≡ urljoin by
    test. At web distribution ~90 % of hrefs take a vectorized path.

    Base-side guard: the ``//host`` and ``/path`` fast paths only fire
    when the BASE parses under ``_BASE_ROOT_RE`` (lowercase scheme +
    authority) AND its scheme participates in relative resolution
    (``urllib.parse.uses_relative``); otherwise urljoin's behavior
    differs (uppercase-scheme bases get lowercased, non-relative
    schemes like ``itms-apps:`` return the reference unchanged) and
    the row is routed to the per-row fallback.
    """
    import re as _re
    from urllib.parse import urljoin, uses_relative

    dot_re = _re.compile(r"(?:^|/)\.\.?(?:/|$)")
    rel_schemes = frozenset(s for s in uses_relative if s)

    def _resolve(df: pd.DataFrame) -> pd.DataFrame:
        base = df[base_col].fillna("")
        href = df[href_col].fillna("")
        out = pd.Series([""] * len(df), dtype=object,
                        index=df.index)
        parts = base.str.extract(_BASE_ROOT_RE)
        base_ok = (parts[0].notna()
                   & parts[0].str.slice(0, -1).isin(rel_schemes))
        has_dots = href.str.contains(dot_re)
        is_abs = href.str.contains(_SCHEME_RE) & ~has_dots
        is_proto = (href.str.startswith("//") & ~has_dots & ~is_abs
                    & base_ok)
        is_root = (href.str.startswith("/") & ~is_proto & ~has_dots
                   & ~is_abs & base_ok)
        scheme, root = parts[0].fillna(""), parts[1].fillna("")
        out[is_abs] = href[is_abs]
        out[is_proto] = scheme[is_proto] + href[is_proto]
        out[is_root] = scheme[is_root] + root[is_root] + href[is_root]
        slow = ~(is_abs | is_proto | is_root)
        if slow.any():
            out[slow] = [urljoin(b, h) for b, h in
                         zip(base[slow], href[slow])]
        res = df.copy()
        res[out_col] = out
        return res

    return edges.map_batches(_resolve, batch_format="pandas",
                             batch_size=None)


def synth_href_edges(docs: Dataset, key_col: str = "doc_id") -> Dataset:
    """Deterministic (src, dst) rows covering every resolution class by
    ``doc_id`` arithmetic — the shared contract with the SQL oracle in
    ``__ray_entry__`` (same style as ``synth_anchor_pages``): base =
    ``https://host-D.test/a/b/index.html``; dst by ``D % 4`` →
    absolute / protocol-relative / root-relative / ``../up/D``."""
    def _synth(df: pd.DataFrame) -> pd.DataFrame:
        d = df[key_col].astype(str)
        m = (df[key_col] % 4).to_numpy()
        dst = pd.Series([""] * len(df), dtype=object, index=df.index)
        dst[m == 0] = "https://abs-" + d[m == 0] + ".example.com/p"
        dst[m == 1] = "//cdn-" + d[m == 1] + ".example.com/lib.js"
        dst[m == 2] = "/section/" + d[m == 2] + "/page"
        dst[m == 3] = "../up/" + d[m == 3]
        return pd.DataFrame({
            key_col: df[key_col],
            "src": "https://host-" + d + ".test/a/b/index.html",
            "dst": dst})

    return docs.select_columns([key_col]).map_batches(
        _synth, batch_format="pandas", batch_size=None)


# ---------------------------------------------------------------------------
# Sentence splitting (RE2-shareable rule)
# ---------------------------------------------------------------------------

SENTENCE_SPLIT_RE = r"[.!?]+\s+"     # delimiter consumes the terminal
#                                      marks — RE2-safe (no lookbehind),
#                                      shared verbatim with the oracle


def split_sentences(docs: Dataset, *, key_col: str = "doc_id",
                    text_col: str = "text") -> Dataset:
    """(key, sent_idx, sentence) — one row per non-empty sentence,
    ``sent_idx`` = position in the ORIGINAL split (stable even when
    empty fragments are dropped, so both gate sides agree without
    re-indexing). The split rule is the RE2-safe
    ``SENTENCE_SPLIT_RE`` (terminal punctuation + whitespace consumed
    by the delimiter; a trailing mark without following whitespace
    stays attached to its sentence — same rule in the SQL oracle, so
    the gate is data-independent). Streaming per-block explode,
    shuffle-free."""
    def _split(df: pd.DataFrame) -> pd.DataFrame:
        parts = df[text_col].fillna("").str.split(SENTENCE_SPLIT_RE,
                                                  regex=True)
        n = parts.str.len().to_numpy()
        ex = pd.DataFrame({
            key_col: np.repeat(df[key_col].to_numpy(), n),
            "sent_idx": np.concatenate(
                [np.arange(k, dtype=np.int64) for k in n]) if len(df)
            else np.array([], np.int64),
            "sentence": np.concatenate(parts.to_numpy()) if len(df)
            else np.array([], object)})
        # keep rule shared with SQL: the sentence must contain a
        # non-whitespace char (regexp '\S' on both sides — python
        # strip() vs SQL trim() disagree on tabs/unicode)
        return ex[ex["sentence"].str.contains(r"\S", regex=True)]

    return docs.select_columns([key_col, text_col]).map_batches(
        _split, batch_format="pandas", batch_size=None)


# ---------------------------------------------------------------------------
# robots.txt (Robots Exclusion Protocol) — parse + corpus filter
# ---------------------------------------------------------------------------

def parse_robots(content: str, agent: str = "*") -> list[tuple[str, bool]]:
    """Parse a robots.txt into (path_prefix, allow) rules for ``agent``
    — REP subset: stacked ``User-agent`` lines open a group; a group
    applies if it names the agent exactly or ``*`` (an exact-agent
    group, when present, takes precedence over the ``*`` group, per
    the spec); ``Allow``/``Disallow`` carry path prefixes; comments
    (#…) and unknown directives are ignored; an empty Disallow path
    is a no-op. Decision semantics live in :func:`_robots_allowed`:
    longest matching prefix wins, ties go to allow, no match = allow.
    """
    groups: list[tuple[set, list]] = []     # ({agents}, [(path, allow)])
    for raw in (content or "").splitlines():
        line = raw.split("#", 1)[0].strip()
        if not line or ":" not in line:
            continue
        field, _, value = line.partition(":")
        field, value = field.strip().lower(), value.strip()
        if field == "user-agent":
            # stacked user-agent lines share one group; a user-agent
            # line AFTER rules opens a new group
            if not groups or groups[-1][1]:
                groups.append((set(), []))
            groups[-1][0].add(value.lower())
        elif field in ("allow", "disallow") and groups and value:
            groups[-1][1].append((value, field == "allow"))
    agent = agent.lower()
    exact = [r for a, r in groups if agent in a]
    if exact:
        return [x for r in exact for x in r]
    return [x for a, r in groups if "*" in a for x in r]


def _robots_allowed(path: str, rules: list[tuple[str, bool]]) -> bool:
    best_len, allow = -1, True
    for prefix, a in rules:
        if path.startswith(prefix):
            ln = len(prefix)
            if ln > best_len or (ln == best_len and a):
                best_len, allow = ln, a
    return allow


def filter_robots_disallowed(pages: Dataset, robots: Dataset, *,
                             url_col: str = "url",
                             host_col: str = "host",
                             content_col: str = "robots_txt",
                             agent: str = "*") -> Dataset:
    """Drop pages whose URL path a host's robots.txt disallows for
    ``agent`` — the crawl-politeness gate every CC-derived corpus
    applies. ``robots`` is a (host, robots_txt) table: per-host
    dimension data (one small file per host), parsed ONCE on the
    driver and broadcast; pages stream through a per-batch host →
    rules lookup + longest-match decision. Hosts with no robots row
    are fully allowed (the REP default). The authority extracted from
    the page URL is normalized to the bare hostname (userinfo and port
    stripped) before the lookup, so ``https://u@h:8443/x`` matches the
    robots row keyed ``h``."""
    import re as _re

    rt = robots.select_columns([host_col, content_col]).to_pandas()
    rules_by_host = {h.lower(): parse_robots(c, agent)
                     for h, c in zip(rt[host_col], rt[content_col])}
    rules_ref = ray.put(rules_by_host)
    path_re = _re.compile(r"^[a-zA-Z][a-zA-Z0-9+.\-]*://[^/]*(/.*)?$")

    def _keep(df: pd.DataFrame) -> pd.DataFrame:
        rb = ray.get(rules_ref)
        # authority → bare hostname: drop userinfo and port
        # (bracketed IPv6 literals keep their brackets intact)
        host = (df[url_col].str.extract(_HOST_RE, expand=False)
                .str.lower().fillna("")
                .str.extract(r"^(?:[^@/]*@)?(\[[^\]]*\]|[^:]*)",
                             expand=False).fillna(""))
        path = (df[url_col].str.extract(path_re, expand=False)
                .fillna("/"))
        keep = np.fromiter(
            (_robots_allowed(p, rb[h]) if h in rb else True
             for h, p in zip(host, path)),
            bool, count=len(df))
        return df[keep]

    return pages.map_batches(_keep, batch_format="pandas",
                             batch_size=None)


def synth_robots(docs: Dataset, key_col: str = "doc_id") -> tuple[Dataset, Dataset]:
    """(pages, robots) pair with pure-arithmetic semantics for the SQL
    gate: page url = ``https://h{D%20}.test/p{D%10}/x``; host k's
    robots disallows ``/p{k%7}`` and — for EVEN k — allows the longer
    ``/p{k%7}/x`` back (longest-match override). A page is therefore
    blocked iff ``D%10 == (D%20)%7`` and ``D%20`` is odd — the rule
    the oracle rebuilds without parsing anything."""
    def _pages(df: pd.DataFrame) -> pd.DataFrame:
        d = df[key_col]
        return pd.DataFrame({
            key_col: d,
            "url": ("https://h" + (d % 20).astype(str) + ".test/p"
                    + (d % 10).astype(str) + "/x")})

    pages = docs.select_columns([key_col]).map_batches(
        _pages, batch_format="pandas", batch_size=None)
    rows = []
    for k in range(20):
        txt = f"User-agent: *\nDisallow: /p{k % 7}\n"
        if k % 2 == 0:
            txt += f"Allow: /p{k % 7}/x\n"
        rows.append({"host": f"h{k}.test", "robots_txt": txt})
    robots = ray.data.from_pandas(pd.DataFrame(rows))
    return pages, robots


def er_cluster(entities: "Dataset", *, id_col: str, text_col: str,
               window: int = 8, max_dist: int = 1,
               n_coarse: int | None = None) -> "Dataset":
    """End-to-end entity resolution → (id, cluster) for EVERY input
    entity, cluster = min id of its match-graph connected component —
    the distributed analogue of the reference's concept_id
    consolidation (OMOP2OBO merges aliases of one concept across
    string-match tiers; here the tiers are blocking + fuzzy verify +
    transitive closure). Composition of the repo's own primitives:

    1. sorted-neighborhood blocking over the (text, id) order
       (:func:`~omop2obo_ray.pipelines.relational.sorted_neighborhood_pairs`)
       — candidates only among sort neighbors, never all pairs;
    2. two slim ``coarse_join``s re-attach candidate texts;
    3. banded-Levenshtein verify (``<= max_dist``) inside a map —
       exact on the candidate set;
    4. alternating-star connected components over the verified match
       edges (O(log n) rounds on any chain shape);
    5. singleton backfill: one left_outer join, null → own id.

    Recall contract = the blocker's: a true match pair is found iff
    the two rows sit within ``window`` positions of the sort order
    (the standard sorted-neighborhood tradeoff; multi-pass with a
    second key order is the classic recall amplifier and composes by
    unioning edge sets before step 4)."""
    from omop2obo_ray.functions.shuffle import coarse_join
    from omop2obo_ray.pipelines.graph import (
        connected_components_alternating)
    from omop2obo_ray.pipelines.relational import (
        sorted_neighborhood_pairs)
    from omop2obo_ray.pipelines.textpipe import _sanitize_join_output

    pairs = sorted_neighborhood_pairs(
        entities, key_col=text_col, id_col=id_col, window=window)

    txt = entities.map_batches(
        lambda b: pa.table({
            "tid": b[id_col].combine_chunks().cast(pa.int64()),
            "txt": b[text_col].combine_chunks().cast(
                pa.large_string())}),
        batch_format="pyarrow", batch_size=None)
    j1 = coarse_join(pairs, txt, on="id_a", right_on="tid",
                     n_coarse=n_coarse).map_batches(
        lambda b: pa.table({"id_a": b["id_a"], "id_b": b["id_b"],
                            "ta": b["txt"]}),
        batch_format="pyarrow", batch_size=None)
    j2 = coarse_join(j1, txt, on="id_b", right_on="tid",
                     n_coarse=n_coarse)

    def _verify(df: pd.DataFrame) -> pd.DataFrame:
        keep = [i for i, (a, b) in enumerate(zip(df["ta"], df["txt"]))
                if _lev_band(a or "", b or "", max_dist) <= max_dist]
        out = df.iloc[keep]
        return pd.DataFrame({"src": out["id_a"].astype(np.int64),
                             "dst": out["id_b"].astype(np.int64)})

    edges = _sanitize_join_output(
        j2.map_batches(_verify, batch_format="pandas",
                       batch_size=None),
        pa.schema([("src", pa.int64()), ("dst", pa.int64())]))

    ids = entities.map_batches(
        lambda b: pa.table({
            "id": b[id_col].combine_chunks().cast(pa.int64())}),
        batch_format="pyarrow", batch_size=None)
    if edges.count() == 0:
        return ids.map_batches(
            lambda b: pa.table({"id": b["id"], "cluster": b["id"]}),
            batch_format="pyarrow", batch_size=None)

    comp = connected_components_alternating(edges, n_coarse=n_coarse)
    comp = comp.map_batches(
        lambda b: pa.table({
            "node": b["node"].combine_chunks().cast(pa.int64()),
            "component": b["component"].combine_chunks().cast(
                pa.int64())}),
        batch_format="pyarrow", batch_size=None)
    out = coarse_join(ids, comp, on="id", right_on="node",
                      how="left_outer", n_coarse=n_coarse)

    def _backfill(b: pa.Table) -> pa.Table:
        comp_c = b["component"].combine_chunks().cast(pa.int64())
        idc = b["id"].combine_chunks().cast(pa.int64())
        return pa.table({
            "id": idc,
            "cluster": pc.coalesce(comp_c, idc)})

    return out.map_batches(_backfill, batch_format="pyarrow",
                           batch_size=None)


def ndcg_at_k(runs: "Dataset", qrels: "Dataset", k: int = 10, *,
              qid_col: str = "qid", doc_col: str = "doc_id",
              score_col: str = "score", rel_col: str = "rel",
              n_coarse: int | None = None) -> "Dataset":
    """NDCG@k per query (Järvelin & Kekäläinen) → (qid, dcg, idcg,
    ndcg): DCG over the retrieved ranking (score desc, doc asc
    tie-break), IDCG over the ideal ordering of the FULL qrel set
    (graded relevance; unjudged retrieved docs count rel 0), ndcg =
    DCG/IDCG or 0 when the query has no relevant docs — the
    evaluation mate of `bm25`/`hybrid_search`/`rrf_fuse`.

    Scale shape: one (qid, doc)-keyed coarse merge attaches rel to
    run rows (tagged union — no two-column join packing), then ONE
    qid-keyed exchange computes both folds in-frame (vectorized
    argsorts; frames bounded by per-query depth, a window like
    `window_rank`'s). log2 sums are floats — gate quantized."""
    from omop2obo_ray.functions.shuffle import coarse_aggregate
    from omop2obo_ray.pipelines.textpipe import _sanitize_join_output

    r = runs.map_batches(
        lambda b: pa.table({
            "qid": b[qid_col].combine_chunks().cast(pa.int64()),
            "doc": b[doc_col].combine_chunks().cast(pa.int64()),
            "score": b[score_col].combine_chunks()
            .cast(pa.float64()),
            "rel": pa.nulls(b.num_rows, pa.int64()),
            "kind": pa.array([0] * b.num_rows, pa.int8())}),
        batch_format="pyarrow", batch_size=None)
    q = qrels.map_batches(
        lambda b: pa.table({
            "qid": b[qid_col].combine_chunks().cast(pa.int64()),
            "doc": b[doc_col].combine_chunks().cast(pa.int64()),
            "score": pa.nulls(b.num_rows, pa.float64()),
            "rel": b[rel_col].combine_chunks().cast(pa.int64()),
            "kind": pa.array([1] * b.num_rows, pa.int8())}),
        batch_format="pyarrow", batch_size=None)

    def _attach(df: pd.DataFrame) -> pd.DataFrame:
        # rel from the qrel row (if any) onto the run rows — one
        # vectorized frame-local merge; qrel rows ride along for the
        # IDCG side
        rn = df[df["kind"] == 0].drop(columns=["rel"])
        qr = df[df["kind"] == 1]
        if len(rn):
            rn = rn.merge(
                qr[["qid", "doc", "rel"]].drop_duplicates(
                    ["qid", "doc"]),
                on=["qid", "doc"], how="left")
            rn["rel"] = rn["rel"].fillna(0).astype(np.int64)
        else:
            rn = rn.assign(rel=np.array([], np.int64))
        return pd.concat([rn, qr], ignore_index=True)

    merged = coarse_aggregate(r.union(q), ["qid", "doc"], _attach,
                              n_coarse=n_coarse)

    def _fold(df: pd.DataFrame) -> pd.DataFrame:
        rows = []
        for qid, g in df.groupby("qid", sort=False):
            run = g[g["kind"] == 0]
            disc = None
            dcg = 0.0
            if len(run):
                srt = run.sort_values(["score", "doc"],
                                      ascending=[False, True],
                                      kind="mergesort").head(k)
                rel = srt["rel"].to_numpy(np.float64)
                disc = np.log2(np.arange(2, len(rel) + 2,
                                         dtype=np.float64))
                dcg = float(np.sum(rel / disc))
            ideal = np.sort(g.loc[g["kind"] == 1, "rel"]
                            .to_numpy(np.float64))[::-1][:k]
            idcg = float(np.sum(
                ideal / np.log2(np.arange(2, len(ideal) + 2,
                                          dtype=np.float64)))) \
                if len(ideal) else 0.0
            ndcg = dcg / idcg if idcg > 0.0 else 0.0
            rows.append((qid, dcg, idcg, ndcg))
        return pd.DataFrame(rows, columns=["qid", "dcg", "idcg",
                                           "ndcg"])

    return _sanitize_join_output(
        coarse_aggregate(merged, ["qid"], _fold, n_coarse=n_coarse),
        pa.schema([("qid", pa.int64()), ("dcg", pa.float64()),
                   ("idcg", pa.float64()), ("ndcg", pa.float64())]))


def mrr_at_k(runs: "Dataset", qrels: "Dataset", k: int = 10, *,
             qid_col: str = "qid", doc_col: str = "doc_id",
             score_col: str = "score", rel_col: str = "rel",
             n_coarse: int | None = None) -> "Dataset":
    """Reciprocal rank per query → (qid, first_rel_rank, rr):
    rr = 1/rank of the FIRST relevant (rel > 0) document within the
    top ``k`` of the score-desc/doc-asc ranking, 0.0 (null rank)
    when none lands in the window — MRR is the mean of ``rr`` over
    queries (one tiny aggregate of this output). Same exchange shape
    and rel-attach as :func:`ndcg_at_k`; rr is ONE IEEE division of
    an exact integer rank, so the gate replays exactly."""
    from omop2obo_ray.functions.shuffle import coarse_aggregate
    from omop2obo_ray.pipelines.textpipe import _sanitize_join_output

    r = runs.map_batches(
        lambda b: pa.table({
            "qid": b[qid_col].combine_chunks().cast(pa.int64()),
            "doc": b[doc_col].combine_chunks().cast(pa.int64()),
            "score": b[score_col].combine_chunks()
            .cast(pa.float64()),
            "rel": pa.nulls(b.num_rows, pa.int64()),
            "kind": pa.array([0] * b.num_rows, pa.int8())}),
        batch_format="pyarrow", batch_size=None)
    q = qrels.map_batches(
        lambda b: pa.table({
            "qid": b[qid_col].combine_chunks().cast(pa.int64()),
            "doc": b[doc_col].combine_chunks().cast(pa.int64()),
            "score": pa.nulls(b.num_rows, pa.float64()),
            "rel": b[rel_col].combine_chunks().cast(pa.int64()),
            "kind": pa.array([1] * b.num_rows, pa.int8())}),
        batch_format="pyarrow", batch_size=None)

    def _attach(df: pd.DataFrame) -> pd.DataFrame:
        rn = df[df["kind"] == 0].drop(columns=["rel"])
        qr = df[df["kind"] == 1]
        if len(rn):
            rn = rn.merge(
                qr[["qid", "doc", "rel"]].drop_duplicates(
                    ["qid", "doc"]),
                on=["qid", "doc"], how="left")
            rn["rel"] = rn["rel"].fillna(0).astype(np.int64)
        else:
            rn = rn.assign(rel=np.array([], np.int64))
        return rn

    merged = coarse_aggregate(r.union(q), ["qid", "doc"], _attach,
                              n_coarse=n_coarse)

    def _fold(df: pd.DataFrame) -> pd.DataFrame:
        rows = []
        for qid, g in df.groupby("qid", sort=False):
            srt = g.sort_values(["score", "doc"],
                                ascending=[False, True],
                                kind="mergesort").head(k)
            hit = np.nonzero(srt["rel"].to_numpy(np.int64) > 0)[0]
            if len(hit):
                rank = int(hit[0]) + 1
                rows.append((qid, rank, 1.0 / rank))
            else:
                rows.append((qid, None, 0.0))
        return pd.DataFrame(rows, columns=["qid", "first_rel_rank",
                                           "rr"])

    def _typed(df: pd.DataFrame) -> pd.DataFrame:
        df = df.copy(deep=False)
        df["first_rel_rank"] = df["first_rel_rank"].astype("Int64")
        return df

    return _sanitize_join_output(
        coarse_aggregate(merged, ["qid"],
                         lambda df: _typed(_fold(df)),
                         n_coarse=n_coarse),
        pa.schema([("qid", pa.int64()),
                   ("first_rel_rank", pa.int64()),
                   ("rr", pa.float64())]))


def ap_at_k(runs: "Dataset", qrels: "Dataset", k: int = 10, *,
            qid_col: str = "qid", doc_col: str = "doc_id",
            score_col: str = "score", rel_col: str = "rel",
            n_coarse: int | None = None) -> "Dataset":
    """Average precision per query (TREC convention) → (qid, n_rel,
    ap): AP@k = Σ_{i ≤ k, rel_i > 0} precision@i / n_rel with n_rel
    counting ALL the query's relevant docs (retrieved or not); MAP
    is the mean of ``ap``. Same rel-attach + qid-keyed exchange as
    :func:`ndcg_at_k`; precision@i terms are exact integer ratios
    folded ascending — the gate quantizes the float sum."""
    from omop2obo_ray.functions.shuffle import coarse_aggregate
    from omop2obo_ray.pipelines.textpipe import _sanitize_join_output

    r = runs.map_batches(
        lambda b: pa.table({
            "qid": b[qid_col].combine_chunks().cast(pa.int64()),
            "doc": b[doc_col].combine_chunks().cast(pa.int64()),
            "score": b[score_col].combine_chunks()
            .cast(pa.float64()),
            "rel": pa.nulls(b.num_rows, pa.int64()),
            "kind": pa.array([0] * b.num_rows, pa.int8())}),
        batch_format="pyarrow", batch_size=None)
    q = qrels.map_batches(
        lambda b: pa.table({
            "qid": b[qid_col].combine_chunks().cast(pa.int64()),
            "doc": b[doc_col].combine_chunks().cast(pa.int64()),
            "score": pa.nulls(b.num_rows, pa.float64()),
            "rel": b[rel_col].combine_chunks().cast(pa.int64()),
            "kind": pa.array([1] * b.num_rows, pa.int8())}),
        batch_format="pyarrow", batch_size=None)

    def _attach(df: pd.DataFrame) -> pd.DataFrame:
        rn = df[df["kind"] == 0].drop(columns=["rel"])
        qr = df[df["kind"] == 1]
        if len(rn):
            rn = rn.merge(
                qr[["qid", "doc", "rel"]].drop_duplicates(
                    ["qid", "doc"]),
                on=["qid", "doc"], how="left")
            rn["rel"] = rn["rel"].fillna(0).astype(np.int64)
        else:
            rn = rn.assign(rel=np.array([], np.int64))
        return pd.concat([rn, qr], ignore_index=True)

    merged = coarse_aggregate(r.union(q), ["qid", "doc"], _attach,
                              n_coarse=n_coarse)

    def _fold(df: pd.DataFrame) -> pd.DataFrame:
        rows = []
        for qid, g in df.groupby("qid", sort=False):
            run = g[g["kind"] == 0]
            n_rel = int((g.loc[g["kind"] == 1, "rel"]
                         .to_numpy(np.int64) > 0).sum())
            ap = 0.0
            if len(run) and n_rel:
                srt = run.sort_values(["score", "doc"],
                                      ascending=[False, True],
                                      kind="mergesort").head(k)
                isrel = (srt["rel"].to_numpy(np.int64)
                         > 0).astype(np.float64)
                csum = np.cumsum(isrel)
                ranks = np.arange(1, len(isrel) + 1,
                                  dtype=np.float64)
                ap = float(np.sum(isrel * (csum / ranks)) / n_rel)
            rows.append((qid, n_rel, ap))
        return pd.DataFrame(rows, columns=["qid", "n_rel", "ap"])

    return _sanitize_join_output(
        coarse_aggregate(merged, ["qid"], _fold, n_coarse=n_coarse),
        pa.schema([("qid", pa.int64()), ("n_rel", pa.int64()),
                   ("ap", pa.float64())]))


def recall_at_k(runs: "Dataset", qrels: "Dataset", k: int = 10, *,
                qid_col: str = "qid", doc_col: str = "doc_id",
                score_col: str = "score", rel_col: str = "rel",
                n_coarse: int | None = None) -> "Dataset":
    """Recall@k per query → (qid, hits, n_rel, recall): fraction of
    the query's relevant (rel > 0) documents appearing in the top
    ``k`` of the score-desc/doc-asc ranking; queries with no
    relevant docs report recall 0.0 with n_rel 0. Completes the
    retrieval-eval family (ndcg/mrr/recall). Same tagged-union
    rel-attach + qid-keyed exchange as :func:`ndcg_at_k` — qrel
    rows ride along so n_rel counts unretrieved relevants too; one
    exact-integer division, gate exact."""
    from omop2obo_ray.functions.shuffle import coarse_aggregate
    from omop2obo_ray.pipelines.textpipe import _sanitize_join_output

    r = runs.map_batches(
        lambda b: pa.table({
            "qid": b[qid_col].combine_chunks().cast(pa.int64()),
            "doc": b[doc_col].combine_chunks().cast(pa.int64()),
            "score": b[score_col].combine_chunks()
            .cast(pa.float64()),
            "rel": pa.nulls(b.num_rows, pa.int64()),
            "kind": pa.array([0] * b.num_rows, pa.int8())}),
        batch_format="pyarrow", batch_size=None)
    q = qrels.map_batches(
        lambda b: pa.table({
            "qid": b[qid_col].combine_chunks().cast(pa.int64()),
            "doc": b[doc_col].combine_chunks().cast(pa.int64()),
            "score": pa.nulls(b.num_rows, pa.float64()),
            "rel": b[rel_col].combine_chunks().cast(pa.int64()),
            "kind": pa.array([1] * b.num_rows, pa.int8())}),
        batch_format="pyarrow", batch_size=None)

    def _attach(df: pd.DataFrame) -> pd.DataFrame:
        rn = df[df["kind"] == 0].drop(columns=["rel"])
        qr = df[df["kind"] == 1]
        if len(rn):
            rn = rn.merge(
                qr[["qid", "doc", "rel"]].drop_duplicates(
                    ["qid", "doc"]),
                on=["qid", "doc"], how="left")
            rn["rel"] = rn["rel"].fillna(0).astype(np.int64)
        else:
            rn = rn.assign(rel=np.array([], np.int64))
        return pd.concat([rn, qr], ignore_index=True)

    merged = coarse_aggregate(r.union(q), ["qid", "doc"], _attach,
                              n_coarse=n_coarse)

    def _fold(df: pd.DataFrame) -> pd.DataFrame:
        rows = []
        for qid, g in df.groupby("qid", sort=False):
            run = g[g["kind"] == 0]
            hits = 0
            if len(run):
                srt = run.sort_values(["score", "doc"],
                                      ascending=[False, True],
                                      kind="mergesort").head(k)
                hits = int((srt["rel"].to_numpy(np.int64) > 0)
                           .sum())
            n_rel = int((g.loc[g["kind"] == 1, "rel"]
                         .to_numpy(np.int64) > 0).sum())
            rows.append((qid, hits, n_rel,
                         hits / n_rel if n_rel else 0.0))
        return pd.DataFrame(rows, columns=["qid", "hits", "n_rel",
                                           "recall"])

    return _sanitize_join_output(
        coarse_aggregate(merged, ["qid"], _fold, n_coarse=n_coarse),
        pa.schema([("qid", pa.int64()), ("hits", pa.int64()),
                   ("n_rel", pa.int64()), ("recall", pa.float64())]))


def classifier_eval(ds: "Dataset", *, pred_col: str = "pred",
                    gold_col: str = "gold",
                    n_coarse: int | None = None) -> "Dataset":
    """Per-class classification metrics from (pred, gold) rows →
    one row per class observed in either column: (label, tp, fp, fn,
    support, precision, recall, f1) — the evaluation mate of
    `nb_classify`/`langid` (micro/macro averages are one tiny
    aggregation of this output). Zero-denominator conventions:
    precision/recall/f1 are 0.0 (sklearn's zero_division=0).

    Scale shape: per-block (pred, gold) pair counts → ONE tiny
    pair-keyed merge (classes², driver-small by definition of a
    classifier) → vectorized per-class fold. Counts exact; ratios
    single-rounding — gate exact."""
    def _part(df: pd.DataFrame) -> pd.DataFrame:
        return (df.groupby([pred_col, gold_col], sort=False)
                .size().rename("n").reset_index())

    from omop2obo_ray.functions.shuffle import coarse_aggregate

    pairs = ds.map_batches(_part, batch_format="pandas",
                           batch_size=None)
    merged = coarse_aggregate(
        pairs, [pred_col, gold_col],
        lambda df: df.groupby([pred_col, gold_col], sort=False)["n"]
        .sum().reset_index(), n_coarse=n_coarse).to_pandas()

    labels = sorted(set(merged[pred_col]) | set(merged[gold_col]))
    rows = []
    for lab in labels:
        tp = int(merged[(merged[pred_col] == lab)
                        & (merged[gold_col] == lab)]["n"].sum())
        fp = int(merged[(merged[pred_col] == lab)
                        & (merged[gold_col] != lab)]["n"].sum())
        fn = int(merged[(merged[pred_col] != lab)
                        & (merged[gold_col] == lab)]["n"].sum())
        prec = tp / (tp + fp) if tp + fp else 0.0
        rec = tp / (tp + fn) if tp + fn else 0.0
        f1 = (2.0 * prec * rec / (prec + rec)
              if (prec + rec) > 0 else 0.0)
        rows.append((lab, tp, fp, fn, tp + fn, prec, rec, f1))
    out = pa.table({
        "label": pa.array([r[0] for r in rows], pa.string()),
        "tp": pa.array([r[1] for r in rows], pa.int64()),
        "fp": pa.array([r[2] for r in rows], pa.int64()),
        "fn": pa.array([r[3] for r in rows], pa.int64()),
        "support": pa.array([r[4] for r in rows], pa.int64()),
        "precision": pa.array([r[5] for r in rows], pa.float64()),
        "recall": pa.array([r[6] for r in rows], pa.float64()),
        "f1": pa.array([r[7] for r in rows], pa.float64())})
    return ray.data.from_arrow(out)


def readability_scores(docs: "Dataset", *, doc_col: str = "doc_id",
                       text_col: str = "text") -> "Dataset":
    """Flesch-Kincaid readability per document → (doc_id, n_words,
    n_sentences, n_syllables, fk_grade): grade = 0.39·(W/S) +
    11.8·(Sy/W) − 15.59 with the standard heuristics — words =
    whitespace tokens, sentences = `[.!?]+` runs (min 1), syllables
    = `[aeiouy]+` vowel groups (the textbook approximation) — the
    corpus-quality signal behind edu-value filtering
    (FineWeb-Edu-style) next to `gopher_stats`/`quality_filter`.

    All three counts are exact integers from vectorized RE2 kernels
    (`count_substring_regex` — the same engine as DuckDB's
    `regexp_extract_all`), and the grade is three single-rounding
    IEEE ops, so the gate replays exactly. Row-local, no exchange."""
    def _score(b: pa.Table) -> pa.Table:
        txt = b[text_col].combine_chunks().cast(pa.string())
        lo = pc.utf8_lower(txt)
        w = pc.count_substring_regex(txt, r"\S+") \
            .to_numpy(zero_copy_only=False).astype(np.int64)
        s = pc.count_substring_regex(txt, r"[.!?]+") \
            .to_numpy(zero_copy_only=False).astype(np.int64)
        sy = pc.count_substring_regex(lo, r"[aeiouy]+") \
            .to_numpy(zero_copy_only=False).astype(np.int64)
        s_eff = np.maximum(s, 1)
        ok = w > 0
        with np.errstate(invalid="ignore", divide="ignore"):
            fk = (0.39 * (w / s_eff) + 11.8 * (sy / w) - 15.59)
        return pa.table({
            doc_col: b[doc_col],
            "n_words": pa.array(w, pa.int64()),
            "n_sentences": pa.array(s, pa.int64()),
            "n_syllables": pa.array(sy, pa.int64()),
            "fk_grade": pa.array(np.where(ok, fk, 0.0), pa.float64(),
                                 mask=~ok)})

    return docs.map_batches(_score, batch_format="pyarrow",
                            batch_size=None)


def er_eval(assign: "Dataset", gold_pairs: "Dataset", *,
            id_col: str = "node", cluster_col: str = "cluster",
            a_col: str = "a", b_col: str = "b",
            n_coarse: int | None = None) -> "Dataset":
    """Pairwise evaluation of an entity-resolution clustering against
    gold match pairs → ONE row (tp, predicted_pairs, gold_pairs,
    precision, recall, f1). The standard ER metric (pairwise P/R,
    Menestrina 2010) computed WITHOUT materializing within-cluster
    pairs: predicted-pair mass is Σ_c k_c(k_c−1)/2 off cluster sizes
    alone, and TP needs only the GOLD pairs (two slim cluster-attach
    ``coarse_join``s + an equality count) — a 10⁹-row cluster costs
    one size row, never 10¹⁸ pairs. Gold pairs whose BOTH sides are
    missing from the assignment count as unmatched (recall hit),
    mirroring the closed-world SQL oracle. All counts exact int64;
    the three ratios are single-rounding divisions — gate exact."""
    from omop2obo_ray.functions.shuffle import (coarse_aggregate,
                                                coarse_join)
    from omop2obo_ray.pipelines.textpipe import _sanitize_join_output

    asg = assign.map_batches(
        lambda b: pa.table({
            "node": b[id_col].combine_chunks().cast(pa.int64()),
            "cl": b[cluster_col].combine_chunks().cast(pa.int64())}),
        batch_format="pyarrow", batch_size=None).materialize()

    # predicted-pair mass from cluster sizes only
    sizes = _sanitize_join_output(
        coarse_aggregate(
            asg, ["cl"],
            lambda df: df.groupby("cl", sort=False).size()
            .rename("k").reset_index(), n_coarse=n_coarse),
        pa.schema([("cl", pa.int64()), ("k", pa.int64())]))
    pp = int(sizes.map_batches(
        lambda b: pa.table({"s": pa.array([int(np.sum(
            (lambda k: k * (k - 1) // 2)(
                b["k"].to_numpy(zero_copy_only=False))))],
            pa.int64())}),
        batch_format="pyarrow", batch_size=None)
        .to_pandas()["s"].sum())

    gp = gold_pairs.map_batches(
        lambda b: pa.table({
            "a": b[a_col].combine_chunks().cast(pa.int64()),
            "b": b[b_col].combine_chunks().cast(pa.int64())}),
        batch_format="pyarrow", batch_size=None)
    n_gold = gp.count()

    wa = coarse_join(gp, asg.map_batches(
        lambda b: pa.table({"n2": b["node"], "ca": b["cl"]}),
        batch_format="pyarrow", batch_size=None),
        on="a", right_on="n2", how="inner", n_coarse=n_coarse)
    wb = coarse_join(wa, asg.map_batches(
        lambda b: pa.table({"n3": b["node"], "cb": b["cl"]}),
        batch_format="pyarrow", batch_size=None),
        on="b", right_on="n3", how="inner", n_coarse=n_coarse)
    tp = int(wb.map_batches(
        lambda b: pa.table({"s": pa.array([int(np.sum(
            b["ca"].to_numpy(zero_copy_only=False)
            == b["cb"].to_numpy(zero_copy_only=False)))],
            pa.int64())}),
        batch_format="pyarrow", batch_size=None)
        .to_pandas()["s"].sum())

    prec = tp / pp if pp else 0.0
    rec = tp / n_gold if n_gold else 0.0
    f1 = (2.0 * prec * rec / (prec + rec)
          if (prec + rec) > 0 else 0.0)
    return ray.data.from_arrow(pa.table({
        "tp": pa.array([tp], pa.int64()),
        "predicted_pairs": pa.array([pp], pa.int64()),
        "gold_pairs": pa.array([n_gold], pa.int64()),
        "precision": pa.array([prec], pa.float64()),
        "recall": pa.array([rec], pa.float64()),
        "f1": pa.array([f1], pa.float64())}))


def vocab_overlap(left: "Dataset", right: "Dataset", *,
                  text_col: str = "text", min_len: int = 1,
                  n_coarse: int | None = None) -> "Dataset":
    """Vocabulary overlap between two corpora → one row (vocab1,
    vocab2, shared, jaccard, containment_1in2, containment_2in1) —
    the quick corpus-comparison audit before a merge/refresh (does
    the new crawl speak the same language as the old one?), the
    type-level sibling of `ks_drift`/`psi_drift`'s value-level
    monitors.

    Scale shape: per-block distinct tokens per side → tagged union
    → ONE token-keyed coarse presence-fold → per-block partial
    (v1, v2, both) counts → one tiny scalar fold. All counts exact
    int64; three single-rounding divisions — gate exact."""
    from omop2obo_ray.functions.shuffle import coarse_aggregate
    from omop2obo_ray.pipelines.textpipe import _sanitize_join_output

    def _toks(side):
        def fn(b: pa.Table) -> pa.Table:
            toks = pc.split_pattern(
                b[text_col].combine_chunks().cast(pa.large_string()),
                " ")
            flat = toks.combine_chunks().values if isinstance(
                toks, pa.ChunkedArray) else toks.values
            t = pd.unique(np.asarray(
                flat.cast(pa.string()).to_numpy(
                    zero_copy_only=False)))
            # dtype=object: an empty comprehension would otherwise
            # yield float64 and pa.array(..., pa.string()) rejects it
            t = np.asarray([x for x in t if len(x) >= min_len],
                           dtype=object)
            n = len(t)
            return pa.table({
                "token": pa.array(t, pa.string()),
                "s1": pa.array([1 - side] * n, pa.int64()),
                "s2": pa.array([side] * n, pa.int64())})
        return fn

    lt = left.map_batches(_toks(0), batch_format="pyarrow",
                          batch_size=None)
    rt = right.map_batches(_toks(1), batch_format="pyarrow",
                           batch_size=None)

    pres = _sanitize_join_output(
        coarse_aggregate(
            lt.union(rt), ["token"],
            lambda df: df.groupby("token", sort=False)
            .agg(h1=("s1", "max"), h2=("s2", "max")).reset_index(),
            n_coarse=n_coarse),
        pa.schema([("token", pa.string()), ("h1", pa.int64()),
                   ("h2", pa.int64())]))

    part = pres.map_batches(
        lambda df: pd.DataFrame({
            "v1": [int(df["h1"].sum())],
            "v2": [int(df["h2"].sum())],
            "both": [int((df["h1"] & df["h2"]).sum())]}),
        batch_format="pandas", batch_size=None).to_pandas()
    v1 = int(part["v1"].sum())
    v2 = int(part["v2"].sum())
    both = int(part["both"].sum())
    union = v1 + v2 - both
    return ray.data.from_arrow(pa.table({
        "vocab1": pa.array([v1], pa.int64()),
        "vocab2": pa.array([v2], pa.int64()),
        "shared": pa.array([both], pa.int64()),
        "jaccard": pa.array([both / union if union else 0.0],
                            pa.float64()),
        "containment_1in2": pa.array([both / v1 if v1 else 0.0],
                                     pa.float64()),
        "containment_2in1": pa.array([both / v2 if v2 else 0.0],
                                     pa.float64())}))


def token_label_mi(docs: "Dataset", *, doc_col: str = "doc_id",
                   text_col: str = "text", label_col: str = "lang",
                   min_len: int = 5, min_count: int = 2,
                   n_coarse: int | None = None) -> "Dataset":
    """Pointwise mutual information between document-level token
    presence and a document label → (token, label, n_tc, mi) for
    (token, label) pairs with ≥ ``min_count`` co-occurrences:
    mi = ln(N·n_tc / (n_t·n_c)) over document frequencies — the
    feature-selection signal behind `nb_train`/`dsir_weights`
    (which tokens identify a language/domain/quality bucket).

    Scale shape (the `entity_pair_pmi` family): per-doc DISTINCT
    tokens emitted with the doc's label in one vectorized map (a doc
    is one row — no doc-keyed exchange), ONE (token, label) coarse
    count, a token-marginal derived from the SAME counts by a second
    tiny fold (no second corpus pass), the label marginal likewise,
    and one slim token-attach ``coarse_join``. Label cardinality is
    assumed driver-small (languages/buckets — broadcast scalars)."""
    from omop2obo_ray.functions.shuffle import (coarse_aggregate,
                                                coarse_join)
    from omop2obo_ray.pipelines.textpipe import _sanitize_join_output

    n_docs = docs.count()

    def _emit(b: pa.Table) -> pa.Table:
        toks = pc.split_pattern(
            b[text_col].combine_chunks().cast(pa.large_string()), " ")
        labels = b[label_col].combine_chunks().cast(pa.string()) \
            .to_pylist()
        out_t, out_l = [], []
        for row, lab in zip(toks.to_pylist(), labels):
            for t in {x for x in row if len(x) >= min_len}:
                out_t.append(t)
                out_l.append(lab)
        return pa.table({"token": pa.array(out_t, pa.large_string()),
                         "label": pa.array(out_l, pa.string())})

    rows = docs.map_batches(_emit, batch_format="pyarrow",
                            batch_size=None)
    tc = _sanitize_join_output(
        coarse_aggregate(
            rows, ["token", "label"],
            lambda df: df.groupby(["token", "label"], sort=False)
            .size().rename("n_tc").reset_index(),
            n_coarse=n_coarse),
        pa.schema([("token", pa.large_string()),
                   ("label", pa.string()),
                   ("n_tc", pa.int64())])).materialize()

    # marginals from the SAME counts: n_t per token, n_c per label
    nt = _sanitize_join_output(
        coarse_aggregate(
            tc, ["token"],
            lambda df: df.groupby("token", sort=False)["n_tc"].sum()
            .rename("n_t").reset_index(), n_coarse=n_coarse),
        pa.schema([("token", pa.large_string()),
                   ("n_t", pa.int64())]))
    # label marginal = docs per label (same doc-event space as n_t):
    # per-block partial counts, tiny frames to the driver
    nc = (docs.map_batches(
        lambda df: df[label_col].astype(str).value_counts()
        .rename_axis("label").rename("n").reset_index(),
        batch_format="pandas", batch_size=None)
        .to_pandas().groupby("label")["n"].sum().to_dict())
    nc_ref = ray.put(nc)

    surv = tc.map_batches(
        lambda b: b.filter(pc.greater_equal(
            b["n_tc"].combine_chunks(), min_count)),
        batch_format="pyarrow", batch_size=None)
    joined = coarse_join(surv, nt.map_batches(
        lambda b: pa.table({"t2": b["token"], "n_t": b["n_t"]}),
        batch_format="pyarrow", batch_size=None),
        on="token", right_on="t2", how="inner", n_coarse=n_coarse)

    def _mi(b: pa.Table) -> pa.Table:
        ncm = ray.get(nc_ref)
        ntc = b["n_tc"].combine_chunks().to_numpy(
            zero_copy_only=False)
        ntk = b["n_t"].combine_chunks().to_numpy(zero_copy_only=False)
        lab = b["label"].combine_chunks().to_pylist()
        ncv = np.array([ncm[x] for x in lab], np.int64)
        mi = np.log(ntc.astype(np.float64) * n_docs
                    / (ntk.astype(np.float64) * ncv))
        return pa.table({"token": b["token"], "label": b["label"],
                         "n_tc": pa.array(ntc, pa.int64()),
                         "mi": pa.array(mi, pa.float64())})

    return joined.map_batches(_mi, batch_format="pyarrow",
                              batch_size=None)


def json_flatten(ds: "Dataset", paths: list[str], *,
                 json_col: str = "payload",
                 keep_cols: list[str] | None = None) -> "Dataset":
    """Flatten a JSON string column into typed-string columns, one
    per dotted ``path`` (API/crawl sidecar metadata → relational
    columns). Scalars stringify canonically (ints as digits, bools
    as ``true``/``false``); missing paths, non-object intermediates
    and malformed JSON yield null; nested values serialize compact.
    Output column name = the path with dots replaced by ``_``.

    Parse is per-record by nature (orjson, ~2-10× stdlib); this is a
    CPU-bound stage — size it like a scorer actor pool
    (`map_batches(..., concurrency=N)`) when the JSON dominates the
    row. Row-local, no exchange."""
    try:
        import orjson as _json

        def _loads(s):
            return _json.loads(s)
    except ImportError:                      # pragma: no cover
        import json as _json

        def _loads(s):
            return _json.loads(s)

    split_paths = [(p, p.replace(".", "_"), p.split("."))
                   for p in paths]

    def _str(v):
        if v is None or isinstance(v, str):
            return v
        if v is True:
            return "true"
        if v is False:
            return "false"
        if isinstance(v, (int, float)):
            return str(v)
        import orjson
        return orjson.dumps(v).decode()

    def _flat(b: pa.Table) -> pa.Table:
        raw = b[json_col].combine_chunks().cast(pa.string()) \
            .to_pylist()
        parsed = []
        for s in raw:
            try:
                v = _loads(s) if s is not None else None
                parsed.append(v if isinstance(v, dict) else None)
            except Exception:
                parsed.append(None)
        cols = {c: b[c] for c in (keep_cols or b.column_names)
                if c in b.column_names}
        for _p, name, parts in split_paths:
            vals = []
            for obj in parsed:
                cur = obj
                for key in parts:
                    if not isinstance(cur, dict):
                        cur = None
                        break
                    cur = cur.get(key)
                vals.append(_str(cur))
            cols[name] = pa.array(vals, pa.string())
        return pa.table(cols)

    return ds.map_batches(_flat, batch_format="pyarrow",
                          batch_size=None)


def regex_extract(ds: "Dataset", pattern: str, *,
                  text_col: str = "text",
                  keep_cols: list[str] | None = None) -> "Dataset":
    """Vectorized named-group regex extraction (log/scrape field
    parsing) → the kept columns plus one column per named group in
    ``pattern``; rows that don't match get nulls in every group
    column (rows are never dropped — filter on a group's validity
    downstream). Runs on Arrow's RE2 via ``pc.extract_regex`` — the
    same engine as DuckDB's `regexp_extract`, so oracles replay
    byte-for-byte. Row-local, no exchange, zero per-row Python."""
    import re as _re
    groups = _re.findall(r"\(\?P<([A-Za-z_][A-Za-z0-9_]*)>", pattern)
    if not groups:
        raise ValueError("regex_extract: pattern needs at least one "
                         "named group (?P<name>...)")

    def _ex(b: pa.Table) -> pa.Table:
        col = b[text_col].combine_chunks().cast(pa.string())
        st = pc.extract_regex(col, pattern)  # struct or null per row
        cols = {c: b[c] for c in (keep_cols or b.column_names)
                if c in b.column_names}
        for g in groups:
            cols[g] = pc.struct_field(st, g)
        return pa.table(cols)

    return ds.map_batches(_ex, batch_format="pyarrow",
                          batch_size=None)


def mask_tokens(docs: "Dataset", *, doc_col: str = "doc_id",
                text_col: str = "text", rate_pct: int = 15,
                mask_token: str = "[MASK]") -> "Dataset":
    """Deterministic MLM-style token masking (BERT pretraining input
    prep) → one row per token: (doc_id, pos, token, masked_text) with
    a pinned modular hash of (doc_id, pos) electing ``rate_pct``% of
    positions — reproducible across runs/resumes and exactly
    SQL-replayable (the `mis`/`kge_negatives` arithmetic).
    ``masked_text`` carries the original token or ``mask_token``.

    Vectorization: one `split_pattern` per batch; per-token rows come
    from the list-offsets buffer (parent doc index + in-doc position
    both pure numpy, no Python loop). Row-local — no exchange; feed
    the output to `pack_sequences` for training batches."""
    M = 1000000007

    def _mask(b: pa.Table) -> pa.Table:
        ids = b[doc_col].combine_chunks().cast(pa.int64()) \
            .to_numpy(zero_copy_only=False)
        toks = pc.split_pattern(
            b[text_col].combine_chunks().cast(pa.large_string()), " ")
        if isinstance(toks, pa.ChunkedArray):
            toks = toks.combine_chunks()
        offs = toks.offsets.to_numpy(zero_copy_only=False)
        flat = toks.values
        n_per = np.diff(offs)
        parent = np.repeat(np.arange(len(ids)), n_per)
        pos = np.arange(len(flat), dtype=np.int64) - np.repeat(
            offs[:-1], n_per)
        did = ids[parent]
        h = ((did % M) * 30011 + pos * 48271 + 17) % M % 100
        masked = h < rate_pct
        tok_str = flat.cast(pa.string())
        return pa.table({
            "doc_id": pa.array(did, pa.int64()),
            "pos": pa.array(pos, pa.int64()),
            "token": tok_str,
            "masked_text": pa.array(
                np.where(masked, mask_token,
                         tok_str.to_numpy(zero_copy_only=False)),
                pa.string())})

    return docs.map_batches(_mask, batch_format="pyarrow",
                            batch_size=None)


def _entity_pair_counts(docs: "Dataset", doc_col: str, text_col: str,
                        min_len: int, min_pair_count: int,
                        n_coarse: int | None):
    """Shared core of :func:`entity_pair_pmi` / :func:`assoc_rules`:
    → ((a, b, cab, ca, cb) Dataset, n_docs). See entity_pair_pmi for
    the scale-shape discussion."""
    from omop2obo_ray.functions.shuffle import (coarse_aggregate,
                                                coarse_join)
    from omop2obo_ray.pipelines.textpipe import _sanitize_join_output

    n_docs = docs.count()

    def _pairs_and_ents(b: pa.Table) -> pa.Table:
        toks = pc.split_pattern(
            b[text_col].combine_chunks().cast(pa.large_string()), " ")
        out_a, out_b = [], []
        ents_out = []
        for row in toks.to_pylist():
            ents = sorted({t for t in row if len(t) >= min_len})
            ents_out.append(ents)
            for i in range(len(ents)):
                for j in range(i + 1, len(ents)):
                    out_a.append(ents[i])
                    out_b.append(ents[j])
        # entity rows ride along tagged pair=(a, NULL)
        flat = [e for ents in ents_out for e in ents]
        return pa.table({
            "a": pa.array(out_a + flat, pa.large_string()),
            "b": pa.array(out_b + [None] * len(flat),
                          pa.large_string())})

    rows = docs.map_batches(_pairs_and_ents, batch_format="pyarrow",
                            batch_size=None)
    pair_rows = rows.map_batches(
        lambda b: b.filter(pc.is_valid(b["b"])),
        batch_format="pyarrow", batch_size=None)
    ent_rows = rows.map_batches(
        lambda b: pa.table(
            {"a": b["a"].filter(pc.is_null(b["b"]))}),
        batch_format="pyarrow", batch_size=None)

    def _cnt_pairs(df: pd.DataFrame) -> pd.DataFrame:
        g = (df.groupby(["a", "b"], sort=False).size()
             .rename("cab").reset_index())
        return g[g["cab"] >= min_pair_count]

    pairs = _sanitize_join_output(
        coarse_aggregate(pair_rows, ["a", "b"], _cnt_pairs,
                         n_coarse=n_coarse),
        pa.schema([("a", pa.large_string()), ("b", pa.large_string()),
                   ("cab", pa.int64())]))

    df_tbl = _sanitize_join_output(
        coarse_aggregate(
            ent_rows, ["a"],
            lambda df: df.groupby("a", sort=False).size()
            .rename("c").reset_index(), n_coarse=n_coarse),
        pa.schema([("a", pa.large_string()), ("c", pa.int64())]))

    j1 = coarse_join(pairs, df_tbl.map_batches(
        lambda b: pa.table({"e": b["a"], "ca": b["c"]}),
        batch_format="pyarrow", batch_size=None),
        on="a", right_on="e", n_coarse=n_coarse)
    j2 = coarse_join(j1, df_tbl.map_batches(
        lambda b: pa.table({"e": b["a"], "cb": b["c"]}),
        batch_format="pyarrow", batch_size=None),
        on="b", right_on="e", n_coarse=n_coarse)
    return j2, n_docs


def entity_pair_pmi(docs: "Dataset", *, doc_col: str = "doc_id",
                    text_col: str = "text", min_len: int = 5,
                    min_pair_count: int = 2,
                    n_coarse: int | None = None) -> "Dataset":
    """Document-level entity co-occurrence PMI → (a, b, cab, pmi) for
    unordered entity pairs co-occurring in ≥ ``min_pair_count`` docs:
    pmi = ln(cab·N / (ca·cb)) over document frequencies — the classic
    relation-candidate miner (entities that co-occur far above chance
    are edge candidates for the KG; the reference's concept
    co-occurrence analysis is the single-machine ancestor).

    Scale shape: a document is ONE row, so per-doc distinct entities
    AND their pair fan-out are emitted inside the same vectorized map
    (no doc-keyed exchange at all); then ONE pair-keyed coarse count,
    ONE entity-keyed coarse count (df), and two slim ``coarse_join``s
    to attach df to the surviving pairs. N is the input row count —
    the only driver scalar. Skew guard: per-doc pair fan-out is
    k(k−1)/2 in the per-doc entity count — bound k upstream (entity
    extraction, not raw tokens) exactly as the fixture's length
    filter does."""
    j2, n_docs = _entity_pair_counts(docs, doc_col, text_col,
                                     min_len, min_pair_count,
                                     n_coarse)

    def _pmi(b: pa.Table) -> pa.Table:
        cab = b["cab"].combine_chunks().to_numpy(zero_copy_only=False)
        ca = b["ca"].combine_chunks().to_numpy(zero_copy_only=False)
        cb = b["cb"].combine_chunks().to_numpy(zero_copy_only=False)
        pmi = np.log(cab.astype(np.float64) * n_docs
                     / (ca.astype(np.float64) * cb))
        return pa.table({"a": b["a"], "b": b["b"],
                         "cab": pa.array(cab, pa.int64()),
                         "pmi": pa.array(pmi, pa.float64())})

    return j2.map_batches(_pmi, batch_format="pyarrow",
                          batch_size=None)


def assoc_rules(docs: "Dataset", *, doc_col: str = "doc_id",
                text_col: str = "text", min_len: int = 5,
                min_pair_count: int = 2, min_conf: float = 0.0,
                n_coarse: int | None = None) -> "Dataset":
    """Association rules over document-level entity co-occurrence
    (Agrawal/A-priori at the pair level) → BOTH directed rules per
    surviving unordered pair: (antecedent, consequent, cab, conf,
    lift) with conf = cab/c(antecedent) and lift = cab·N/(ca·cb)
    (direction-symmetric), filtered to conf ≥ ``min_conf``. The
    relation-candidate miner's decision layer: PMI ranks pairs,
    confidence orients them (A→B strong, B→A weak ⇒ B is the hub).

    Cost on top of :func:`entity_pair_pmi`'s shared count core: one
    vectorized direction fan-out map — no additional exchange. All
    arithmetic is single-rounding IEEE on exact integers (one
    division for conf, one product-pair + division for lift), so the
    gate runs unquantized."""
    j2, n_docs = _entity_pair_counts(docs, doc_col, text_col,
                                     min_len, min_pair_count,
                                     n_coarse)

    def _rules(b: pa.Table) -> pa.Table:
        cab = b["cab"].combine_chunks().to_numpy(zero_copy_only=False)
        ca = b["ca"].combine_chunks().to_numpy(zero_copy_only=False)
        cb = b["cb"].combine_chunks().to_numpy(zero_copy_only=False)
        a = b["a"].combine_chunks()
        bb = b["b"].combine_chunks()
        lift = (cab.astype(np.float64) * n_docs
                / (ca.astype(np.float64) * cb))
        conf_ab = cab.astype(np.float64) / ca
        conf_ba = cab.astype(np.float64) / cb
        ante = pa.concat_arrays([a, bb])
        cons = pa.concat_arrays([bb, a])
        conf = np.r_[conf_ab, conf_ba]
        out = pa.table({
            "antecedent": ante, "consequent": cons,
            "cab": pa.array(np.r_[cab, cab], pa.int64()),
            "conf": pa.array(conf, pa.float64()),
            "lift": pa.array(np.r_[lift, lift], pa.float64())})
        return out.filter(pa.array(conf >= min_conf))

    return j2.map_batches(_rules, batch_format="pyarrow",
                          batch_size=None)


# ---------------------------------------------------------------------------
# Unicode normalization (NFC/NFKC text canonicalization)
# ---------------------------------------------------------------------------

def normalize_unicode(ds: "Dataset", *, text_col: str = "text",
                      form: str = "NFC",
                      out_col: str | None = None) -> "Dataset":
    """Unicode-normalize a text column (NFC/NFKC/NFD/NFKD) — the
    canonicalization step before any exact-match dedup or lexicon
    lookup (composed vs combining-mark spellings of the same word
    hash differently; NFKC additionally folds width/compatibility
    forms). Same normal forms DuckDB's ``nfc_normalize`` implements,
    so the gate is engine-vs-engine on REAL denormalized text.

    Kernel note: pyarrow 16.1's ``utf8_normalize`` is BROKEN for the
    composing forms (NFC/NFKC return decomposed output — verified:
    'café' → 'cafe'+U+0301), so this uses ``unicodedata`` batched
    through ONE C-level call per batch: the column is NUL-joined,
    normalized once, and split (U+0000 is a non-composing starter,
    so normalizing the joined string ≡ normalizing each piece;
    rows that themselves contain NUL take a per-row fallback)."""
    import unicodedata

    if form not in ("NFC", "NFKC", "NFD", "NFKD"):
        raise ValueError(f"normalize_unicode: unknown form {form!r}")
    dst = out_col or text_col

    def _norm(b: pa.Table) -> pa.Table:
        vals = b[text_col].to_pylist()
        safe = [v for v in vals if v is not None and "\x00" not in v]
        normed = iter(unicodedata.normalize(
            form, "\x00".join(safe)).split("\x00")) if safe else iter(())
        out = [None if v is None
               else (unicodedata.normalize(form, v) if "\x00" in v
                     else next(normed))
               for v in vals]
        arr = pa.array(out, pa.string())
        if dst in b.column_names:
            return b.set_column(b.column_names.index(dst), dst, arr)
        return b.append_column(dst, arr)

    return ds.map_batches(_norm, batch_format="pyarrow",
                          batch_size=None)


# ---------------------------------------------------------------------------
# Hearst-pattern hypernym extraction (taxonomy mining from raw text)
# ---------------------------------------------------------------------------

_HEARST_PATTERNS = [
    # (regex, name, hypernym group, hyponym group) — group order
    # differs per pattern ("X and other H" names the hyponym first)
    (r"(\w+) such as (\w+)", "such_as", 1, 2),
    (r"(\w+) including (\w+)", "including", 1, 2),
    (r"(\w+) and other (\w+)", "and_other", 2, 1),
]


def hearst_patterns(docs: "Dataset", *, text_col: str = "text",
                    lowercase: bool = True,
                    n_coarse: int | None = None) -> "Dataset":
    """Hypernym/hyponym pair mining via Hearst lexico-syntactic
    patterns → (hypernym, hyponym, pattern, n): "metals such as
    iron", "tools including hammers", "cats and other animals" — the
    classic bootstrap for taxonomy/ISA edges from raw web text
    (Hearst'92), feeding the same ancestor-DAG machinery the
    reference builds from curated OBO hierarchies
    (`ontology_explorer.py`'s subClassOf walk is the curated-world
    analogue). ALL matches per document count (extractall), not just
    the first.

    Scale shape: per-block vectorized ``str.extractall`` per pattern
    (compiled once per block set, C-level scan) → per-block
    (pair, pattern) partial counts → ONE pair-keyed coarse sum.
    Pattern list is fixed and tiny; nothing doc-sized survives the
    map."""
    import re

    from omop2obo_ray.functions.shuffle import coarse_aggregate
    from omop2obo_ray.pipelines.textpipe import _sanitize_join_output

    compiled = [(re.compile(p), name, hg, og)
                for p, name, hg, og in _HEARST_PATTERNS]

    def _extract(df: pd.DataFrame) -> pd.DataFrame:
        s = df[text_col].astype(str)
        if lowercase:
            s = s.str.lower()
        parts = []
        for rx, name, hg, og in compiled:
            m = s.str.extractall(rx)
            if not len(m):
                continue
            parts.append(pd.DataFrame({
                "hypernym": m[hg - 1].to_numpy(),
                "hyponym": m[og - 1].to_numpy(),
                "pattern": name}))
        if not parts:
            return pd.DataFrame({
                "hypernym": pd.Series([], dtype=str),
                "hyponym": pd.Series([], dtype=str),
                "pattern": pd.Series([], dtype=str),
                "n": pd.Series([], dtype="int64")})
        allm = pd.concat(parts, ignore_index=True)
        return (allm.groupby(["hypernym", "hyponym", "pattern"],
                             sort=False).size().rename("n")
                .reset_index())

    parts = docs.map_batches(_extract, batch_format="pandas",
                             batch_size=None)
    return _sanitize_join_output(
        coarse_aggregate(
            parts, ["hypernym", "hyponym"],
            lambda df: df.groupby(["hypernym", "hyponym", "pattern"],
                                  sort=False)["n"].sum().reset_index(),
            n_coarse=n_coarse),
        pa.schema([("hypernym", pa.string()), ("hyponym", pa.string()),
                   ("pattern", pa.string()), ("n", pa.int64())]))


# ---------------------------------------------------------------------------
# ROUGE-N overlap scoring (summarization / generation eval)
# ---------------------------------------------------------------------------

def rouge_n(cands: "Dataset", refs: "Dataset", *,
            key_col: str = "doc_id", text_col: str = "text",
            n: int = 2, n_coarse: int | None = None) -> "Dataset":
    """ROUGE-N between candidate and reference texts matched by id →
    (id, n_cand, n_ref, n_overlap, precision, recall, f1): clipped
    n-gram multiset overlap (Lin'04) — the generation/summarization
    eval metric beside the retrieval family (ndcg/mrr/ap_at_k).
    Tokenization is the corpus-wide pinned rule (lowercase
    ``[a-z0-9]+``, the same one the postings/BM25 oracles share);
    grams join with a single space. Sides with < n tokens score 0;
    ids present on only one side keep their side's counts with 0
    overlap. Zero denominators → 0.0 (the rouge-score convention).

    Scale shape: per-doc gram counts in ONE vectorized map per side
    (a doc is one row — no doc-keyed exchange to build grams) →
    tagged union → ONE id-keyed coarse fold computing the clipped
    overlap, totals and P/R/F in-frame (the id co-locates both
    sides' gram multisets; frame size is grams-per-doc). All counts
    int64; P/R are single IEEE divisions and F1 is computed FROM the
    rounded P/R exactly as the SQL gate does."""
    import re

    from omop2obo_ray.functions.shuffle import coarse_aggregate
    from omop2obo_ray.pipelines.textpipe import _sanitize_join_output

    tok_re = re.compile(r"[a-z0-9]+")

    def _grams(side):
        def fn(df: pd.DataFrame) -> pd.DataFrame:
            ids, grams = [], []
            for i, t in zip(df[key_col], df[text_col]):
                toks = tok_re.findall(str(t).lower())
                ids.extend([i] * max(0, len(toks) - n + 1))
                grams.extend(" ".join(toks[j:j + n])
                             for j in range(len(toks) - n + 1))
            out = pd.DataFrame({key_col: ids, "gram": grams})
            g = (out.groupby([key_col, "gram"], sort=False)
                 .size().rename("c").reset_index())
            # marker row (gram='', c=0) for gramless docs so every
            # id gets an output row (scores 0) instead of vanishing
            missing = df.loc[~df[key_col].isin(g[key_col]), key_col]
            if len(missing):
                g = pd.concat([g, pd.DataFrame(
                    {key_col: missing.unique(), "gram": "",
                     "c": np.int64(0)})], ignore_index=True)
            g["side"] = np.int8(side)
            return g
        return fn

    tagged = cands.map_batches(_grams(0), batch_format="pandas",
                               batch_size=None).union(
        refs.map_batches(_grams(1), batch_format="pandas",
                         batch_size=None))

    def _fold(df: pd.DataFrame) -> pd.DataFrame:
        rows = []
        for i, g in df.groupby(key_col, sort=False):
            piv = (g.groupby(["gram", "side"], sort=False)["c"].sum()
                   .unstack("side", fill_value=0))
            c = piv[0].to_numpy(np.int64) if 0 in piv else \
                np.zeros(len(piv), np.int64)
            r = piv[1].to_numpy(np.int64) if 1 in piv else \
                np.zeros(len(piv), np.int64)
            nc, nr = int(c.sum()), int(r.sum())
            ov = int(np.minimum(c, r).sum())
            p = ov / nc if nc else 0.0
            rr = ov / nr if nr else 0.0
            f1 = 2 * p * rr / (p + rr) if (p + rr) > 0 else 0.0
            rows.append((i, nc, nr, ov, p, rr, f1))
        return pd.DataFrame(rows, columns=[
            key_col, "n_cand", "n_ref", "n_overlap", "precision",
            "recall", "f1"])

    from omop2obo_ray.pipelines.textpipe import _pa_schema_of

    kt = _pa_schema_of(cands).field(key_col).type
    return _sanitize_join_output(
        coarse_aggregate(tagged, [key_col], _fold, n_coarse=n_coarse),
        pa.schema([(key_col, kt), ("n_cand", pa.int64()),
                   ("n_ref", pa.int64()), ("n_overlap", pa.int64()),
                   ("precision", pa.float64()),
                   ("recall", pa.float64()), ("f1", pa.float64())]))


def bleu_score(cands: "Dataset", refs: "Dataset", *,
               key_col: str = "doc_id", text_col: str = "text",
               max_n: int = 2,
               n_coarse: int | None = None) -> "Dataset":
    """Sentence-level BLEU between candidate and reference texts
    matched by id → (id, bp, p1..p<max_n>, bleu): modified
    (clipped) n-gram precision per order, brevity penalty
    bp = min(1, e^{1−r/c}), and bleu = bp · exp(Σ ln pₙ / N)
    (Papineni'02; score 0 when any pₙ = 0 — the standard sentence
    convention without smoothing). Same pinned tokenizer as
    :func:`rouge_n`. The machine-translation/generation eval beside
    ROUGE's recall-oriented view.

    Scale shape: one vectorized map per side emits per-doc gram
    counts for ALL orders 1..max_n at once (the order rides the gram
    string prefix 'n:'), marker rows keep gramless docs → ONE
    id-keyed coarse fold computes every clipped precision, the
    brevity penalty (token counts = order-1 totals) and the final
    score in-frame. Floats: each pₙ one division, bp/bleu the same
    exp/log expression the SQL gate spells — exact gate."""
    import re

    from omop2obo_ray.functions.shuffle import coarse_aggregate
    from omop2obo_ray.pipelines.textpipe import (_pa_schema_of,
                                                 _sanitize_join_output)

    tok_re = re.compile(r"[a-z0-9]+")

    def _grams(side):
        def fn(df: pd.DataFrame) -> pd.DataFrame:
            ids, grams = [], []
            for i, t in zip(df[key_col], df[text_col]):
                toks = tok_re.findall(str(t).lower())
                for order in range(1, max_n + 1):
                    m = len(toks) - order + 1
                    ids.extend([i] * max(0, m))
                    grams.extend(
                        f"{order}:" + " ".join(toks[j:j + order])
                        for j in range(m))
            out = pd.DataFrame({key_col: ids, "gram": grams})
            g = (out.groupby([key_col, "gram"], sort=False)
                 .size().rename("c").reset_index())
            missing = df.loc[~df[key_col].isin(g[key_col]), key_col]
            if len(missing):
                g = pd.concat([g, pd.DataFrame(
                    {key_col: missing.unique(), "gram": "",
                     "c": np.int64(0)})], ignore_index=True)
            g["side"] = np.int8(side)
            return g
        return fn

    tagged = cands.map_batches(_grams(0), batch_format="pandas",
                               batch_size=None).union(
        refs.map_batches(_grams(1), batch_format="pandas",
                         batch_size=None))

    def _fold(df: pd.DataFrame) -> pd.DataFrame:
        rows = []
        for i, g in df.groupby(key_col, sort=False):
            piv = (g.groupby(["gram", "side"], sort=False)["c"].sum()
                   .unstack("side", fill_value=0))
            c = piv[0].to_numpy(np.int64) if 0 in piv else \
                np.zeros(len(piv), np.int64)
            r = piv[1].to_numpy(np.int64) if 1 in piv else \
                np.zeros(len(piv), np.int64)
            order = pd.to_numeric(
                piv.index.to_series().str.partition(":")[0],
                errors="coerce").fillna(0).to_numpy(np.int64)
            ps, ok = [], True
            c_len = r_len = 0
            for o in range(1, max_n + 1):
                sel = order == o
                nc = int(c[sel].sum())
                ov = int(np.minimum(c[sel], r[sel]).sum())
                if o == 1:
                    c_len, r_len = nc, int(r[sel].sum())
                p = ov / nc if nc else 0.0
                ps.append(p)
                ok = ok and p > 0
            bp = (1.0 if c_len >= r_len
                  else (np.exp(1.0 - r_len / c_len) if c_len else 0.0))
            bleu = (bp * np.exp(sum(np.log(p) for p in ps) / max_n)
                    if ok and c_len else 0.0)
            rows.append((i, bp, *ps, bleu))
        return pd.DataFrame(rows, columns=(
            [key_col, "bp"] + [f"p{o}" for o in range(1, max_n + 1)]
            + ["bleu"]))

    kt = _pa_schema_of(cands).field(key_col).type
    return _sanitize_join_output(
        coarse_aggregate(tagged, [key_col], _fold, n_coarse=n_coarse),
        pa.schema([(key_col, kt), ("bp", pa.float64())]
                  + [(f"p{o}", pa.float64())
                     for o in range(1, max_n + 1)]
                  + [("bleu", pa.float64())]))


def gunzip_column(ds: "Dataset", *, col: str = "payload",
                  out_col: str | None = None,
                  on_error: str = "null") -> "Dataset":
    """Decompress a binary column (gzip members or raw zlib,
    auto-detected per row) — crawl tables often store html/body bytes
    compressed; this is the real inflate step between a raw-payload
    read and text extraction. ``on_error='null'`` (default) maps
    non-compressed/corrupt rows to null; ``'keep'`` passes the
    original bytes through; ``'raise'`` fails the task (strict
    pipelines). Per-row zlib calls (no batch inflate exists) inside
    one ``map_batches`` — an embarrassingly parallel CPU stage, no
    exchange."""
    import gzip
    import zlib

    if on_error not in ("null", "keep", "raise"):
        raise ValueError(f"gunzip_column: bad on_error {on_error!r}")
    dst = out_col or col

    def _inflate(b: pa.Table) -> pa.Table:
        out = []
        for v in b[col].to_pylist():
            if v is None:
                out.append(None)
                continue
            try:
                if v[:2] == b"\x1f\x8b":
                    out.append(gzip.decompress(v))
                else:
                    out.append(zlib.decompress(v))
            except (OSError, zlib.error):
                if on_error == "raise":
                    raise
                out.append(None if on_error == "null" else v)
        arr = pa.array(out, pa.binary())
        if dst in b.column_names:
            return b.set_column(b.column_names.index(dst), dst, arr)
        return b.append_column(dst, arr)

    return ds.map_batches(_inflate, batch_format="pyarrow",
                          batch_size=None)


def cohens_kappa(labels: "Dataset", *, a_col: str = "label_a",
                 b_col: str = "label_b",
                 n_coarse: int | None = None) -> "Dataset":
    """Inter-annotator agreement → ONE row (n, po, pe, kappa):
    Cohen's κ = (p_o − p_e) / (1 − p_e) over paired labels — the
    labeling-pipeline QA readout (how much better than chance two
    annotators/models agree; the reference's gold-standard mapping
    validation is a two-rater protocol of exactly this shape).
    Degenerate chance agreement (p_e = 1: both raters constant and
    equal) yields κ = 0.0 by convention.

    Scale shape: per-block (a, b) pair counts → ONE tiny single-group
    fold (label-pair cardinality bounded); all counts exact int64,
    p_o/p_e/κ single-rounding float expressions shared with the SQL
    gate."""
    from omop2obo_ray.functions.shuffle import coarse_aggregate
    from omop2obo_ray.pipelines.textpipe import _sanitize_join_output

    def _partial(df: pd.DataFrame) -> pd.DataFrame:
        g = (df.groupby([a_col, b_col], sort=False)
             .size().rename("c").reset_index())
        g["_g"] = np.int8(0)
        return g

    def _fold(df: pd.DataFrame) -> pd.DataFrame:
        g = (df.groupby([a_col, b_col], sort=False)["c"].sum()
             .reset_index())
        n = int(g["c"].sum())
        agree = int(g.loc[g[a_col] == g[b_col], "c"].sum())
        ma = g.groupby(a_col, sort=False)["c"].sum()
        mb = g.groupby(b_col, sort=False)["c"].sum()
        labs = sorted(set(ma.index) | set(mb.index))
        pe_num = sum(int(ma.get(l, 0)) * int(mb.get(l, 0))
                     for l in labs)
        po = agree / n if n else 0.0
        pe = pe_num / (n * n) if n else 0.0
        kappa = (po - pe) / (1.0 - pe) if pe < 1.0 else 0.0
        return pd.DataFrame({
            "n": [np.int64(n)], "agree": [np.int64(agree)],
            "po": [po], "pe": [pe], "kappa": [kappa]})

    return _sanitize_join_output(
        coarse_aggregate(
            labels.map_batches(_partial, batch_format="pandas",
                               batch_size=None),
            ["_g"], lambda df: _fold(df.drop(columns=["_g"])),
            n_coarse=n_coarse),
        pa.schema([("n", pa.int64()), ("agree", pa.int64()),
                   ("po", pa.float64()), ("pe", pa.float64()),
                   ("kappa", pa.float64())]))
