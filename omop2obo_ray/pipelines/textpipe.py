"""Training-data pipeline operators over the ``documents`` /
``embeddings`` tables — the large-scale text-corpus operations a 100 TB
pipeline needs beyond the reference's own operator set (dedup families,
similarity search, text analysis). All stages are vectorized
``map_batches`` bodies; stateful ones (hash seeds, query matrices,
stopword sets) are actor classes so setup runs once per actor.
"""

from __future__ import annotations

import functools
import re

import numpy as np
import pandas as pd
import pyarrow as pa
import ray
from ray.data import Dataset
from ray.data.aggregate import Count, Min

from omop2obo_ray.functions.hashing import hash64_array, stable_hash64

# ---------------------------------------------------------------------------
# exact dedup (hash-partition + per-group first — ray_guide pattern)
# ---------------------------------------------------------------------------

def add_text_hash(batch: pa.Table, col: str = "text") -> pa.Table:
    return batch.append_column("text_hash", pa.array(hash64_array(batch[col]), pa.uint64()))


def exact_dedup(docs: Dataset, key_col: str = "doc_id", text_col: str = "text",
                method: str = "shuffle") -> Dataset:
    """Keep the lowest-key row per distinct text.

    ``method='shuffle'`` (default, the scale path): add a 64-bit content
    hash in a vectorized map, then ONE keyed shuffle
    (``groupby(text_hash).map_groups``) keeping the min-key row per
    group — no driver-side state at any input size (hash collisions of
    *distinct* texts are ~n²/2⁶⁴: negligible, and acceptable for dedup).

    ``method='broadcast'``: aggregate keep-ids and broadcast them back
    as a filter — cheaper when the unique-id set fits comfortably in
    memory (dimension-scale inputs), because the text payload never
    moves."""
    hashed = docs.map_batches(
        functools.partial(add_text_hash, col=text_col), batch_format="pyarrow",
        batch_size=None,
    )
    if method == "shuffle":
        def keep_min(g: pd.DataFrame) -> pd.DataFrame:
            return g.sort_values(key_col, kind="mergesort").head(1)

        out = hashed.groupby("text_hash").map_groups(keep_min, batch_format="pandas")
        return out.drop_columns(["text_hash"])

    keep = hashed.groupby("text_hash").aggregate(Min(key_col, alias_name="keep_id"))
    keep_ids = set()
    for b in keep.iter_batches(batch_size=65536, batch_format="pyarrow"):
        keep_ids.update(b["keep_id"].to_pylist())
    ids_ref = ray.put(keep_ids)

    def _filter(batch: pa.Table) -> pa.Table:
        ids = ray.get(ids_ref)
        mask = pa.array([i in ids for i in batch[key_col].to_pylist()])
        return batch.filter(mask)

    return docs.map_batches(_filter, batch_format="pyarrow")


# ---------------------------------------------------------------------------
# MinHash + LSH near-dup (shingle → minhash → band → bucket groupby)
# ---------------------------------------------------------------------------

class MinHasher:
    """Actor: deterministic 64-bit minhash over word shingles.

    n_hashes permutations via (a*x+b) mod p; seeds derived from blake2b
    so every actor computes identical signatures."""

    P = (1 << 61) - 1

    # odd multipliers for the positional shingle combine (vectorized)
    _C = (0x9E3779B97F4A7C15, 0xC2B2AE3D27D4EB4F, 0x165667B19E3779F9,
          0x27D4EB2F165667C5, 0x85EBCA77C2B2AE63)

    def __init__(self, n_hashes: int = 64, shingle: int = 3, n_bands: int = 16,
                 key_col: str = "doc_id", text_col: str = "text"):
        assert n_hashes % n_bands == 0
        assert shingle <= len(self._C)
        self.n_hashes, self.shingle, self.n_bands = n_hashes, shingle, n_bands
        self.rows_per_band = n_hashes // n_bands
        self.key_col, self.text_col = key_col, text_col
        rng = np.random.RandomState(1234567)
        self.a = rng.randint(1, self.P, size=n_hashes, dtype=np.int64).astype(np.uint64)
        self.b = rng.randint(0, self.P, size=n_hashes, dtype=np.int64).astype(np.uint64)
        self.word_re = re.compile(r"\w+")
        # per-actor token-hash cache: corpora repeat tokens heavily, so
        # blake2b runs once per distinct token, and shingle hashes are a
        # vectorized positional combine of token hashes (no per-shingle
        # string hashing)
        self._tok_cache: dict[str, int] = {}

    def _token_hashes(self, toks: list[str]) -> np.ndarray:
        cache = self._tok_cache
        out = np.empty(len(toks), dtype=np.uint64)
        for i, t in enumerate(toks):
            h = cache.get(t)
            if h is None:
                h = stable_hash64(t)
                cache[t] = h
            out[i] = h
        return out

    def shingles(self, text: str) -> np.ndarray:
        toks = self.word_re.findall(text.lower())
        if not toks:
            return np.zeros(1, dtype=np.uint64)
        th = self._token_hashes(toks)
        k = self.shingle
        if len(th) < k:
            k = len(th)
        with np.errstate(over="ignore"):
            acc = th[: len(th) - k + 1] * np.uint64(self._C[0])
            for j in range(1, k):
                acc = acc ^ (th[j : len(th) - k + 1 + j] * np.uint64(self._C[j]))
        return np.unique(acc & np.uint64(0x7FFFFFFFFFFFFFFF))

    def signature(self, text: str) -> np.ndarray:
        sh = self.shingles(text)  # (S,)
        # (n_hashes, S): (a*x + b) mod p, vectorized
        vals = (self.a[:, None] * sh[None, :] + self.b[:, None]) % np.uint64(self.P)
        return vals.min(axis=1)

    def __call__(self, batch: pa.Table) -> pa.Table:
        """docs → one row per (doc, band): (key, band_id, band_hash)."""
        keys, bands, bhashes = [], [], []
        for key, text in zip(batch[self.key_col].to_pylist(), batch[self.text_col].to_pylist()):
            sig = self.signature(text or "")
            for band in range(self.n_bands):
                seg = sig[band * self.rows_per_band:(band + 1) * self.rows_per_band]
                bh = stable_hash64(seg.tobytes())
                keys.append(key)
                bands.append(band)
                bhashes.append(bh)
        return pa.table(
            {
                self.key_col: pa.array(keys),
                "band_id": pa.array(bands, pa.int32()),
                "band_hash": pa.array(bhashes, pa.uint64()),
            }
        )


def _pairs_from_bucket(group: pd.DataFrame, key_col: str) -> pd.DataFrame:
    ids = sorted(group[key_col].unique())
    rows = [(a, b) for i, a in enumerate(ids) for b in ids[i + 1:]]
    return pd.DataFrame(rows, columns=["doc_a", "doc_b"]) if rows else pd.DataFrame(
        {"doc_a": pd.Series(dtype=group[key_col].dtype),
         "doc_b": pd.Series(dtype=group[key_col].dtype)}
    )


def minhash_candidate_pairs(docs: Dataset, n_hashes: int = 64, n_bands: int = 16,
                            shingle: int = 3, key_col: str = "doc_id",
                            text_col: str = "text") -> Dataset:
    """LSH candidate pairs: shingle→minhash→band rows; only COLLIDING
    buckets are grouped for pair expansion.

    A naive ``groupby(band).map_groups`` invokes one group call per
    band bucket (≈ n_docs × n_bands groups, nearly all singletons).
    Instead: count per bucket (one small aggregate), broadcast the
    collision keys (≪ bands — bounded by actual near-dup mass), filter
    the band stream to those keys, and expand pairs per block."""
    bands = docs.map_batches(
        MinHasher,
        fn_constructor_kwargs=dict(n_hashes=n_hashes, shingle=shingle, n_bands=n_bands,
                                   key_col=key_col, text_col=text_col),
        batch_format="pyarrow", concurrency=(1, 4), num_cpus=1,
    ).materialize()  # consumed twice: collision count + pair expansion

    def _bucket_counts(batch: pa.Table) -> pa.Table:
        # per-block combiner: one (bucket, n) row per distinct bucket
        df = batch.select(["band_id", "band_hash"]).to_pandas()
        agg = df.value_counts().reset_index(name="n")
        return pa.Table.from_pandas(agg, preserve_index=False).replace_schema_metadata(None)

    # partial counts merged driver-side (≤ distinct buckets per block):
    # saves a whole Ray shuffle vs a groupby over the raw band rows
    merged: dict[tuple[int, int], int] = {}
    for b in bands.map_batches(_bucket_counts, batch_format="pyarrow",
                               batch_size=None).iter_batches(
            batch_size=65536, batch_format="pyarrow"):
        for bid, bh, n in zip(b["band_id"].to_pylist(), b["band_hash"].to_pylist(),
                              b["n"].to_pylist()):
            key = (bid, bh)
            merged[key] = merged.get(key, 0) + n
    collide = {k for k, n in merged.items() if n >= 2}
    if not collide:
        import pyarrow as _pa

        return ray.data.from_arrow(
            pa.table({"doc_a": _pa.array([], _pa.int64()),
                      "doc_b": _pa.array([], _pa.int64()),
                      "n_bands_hit": _pa.array([], _pa.int64())})
        )
    collide_ref = ray.put(collide)

    def keep_colliding(batch: pa.Table) -> pa.Table:
        cset = ray.get(collide_ref)
        mask = [
            (bid, bh) in cset
            for bid, bh in zip(batch["band_id"].to_pylist(),
                               batch["band_hash"].to_pylist())
        ]
        return batch.filter(pa.array(mask))

    hits = bands.map_batches(keep_colliding, batch_format="pyarrow", batch_size=None)

    # groupby now sees ONLY colliding buckets (K groups, K ≈ near-dup
    # mass), so per-group overhead is proportional to real work
    pairs = hits.groupby(["band_id", "band_hash"]).map_groups(
        lambda g: _pairs_from_bucket(g, key_col), batch_format="pandas"
    )
    # same pair may surface from several bands → keyed dedup
    return pairs.groupby(["doc_a", "doc_b"]).aggregate(Count(alias_name="n_bands_hit"))


def verify_jaccard_pairs(docs: Dataset, pairs: Dataset, threshold: float = 0.8,
                         shingle: int = 3, key_col: str = "doc_id",
                         text_col: str = "text") -> pd.DataFrame:
    """Verify LSH candidates with exact shingle-set Jaccard. The
    candidate set is LSH-bounded (≪ n²); the candidate-id set is
    broadcast and candidate shingle-sets are computed IN the cluster
    (map_batches filter+shingle), so only candidate rows reach the
    driver."""
    cand = pairs.to_pandas()
    if cand.empty:
        return pd.DataFrame(columns=["doc_a", "doc_b", "jaccard"])
    need = set(cand["doc_a"]) | set(cand["doc_b"])
    need_ref = ray.put(need)

    def gather(batch: pa.Table) -> pa.Table:
        wanted = ray.get(need_ref)
        mask = pa.array([k in wanted for k in batch[key_col].to_pylist()])
        part = batch.filter(mask)
        hasher = MinHasher(shingle=shingle, key_col=key_col, text_col=text_col)
        sh = [hasher.shingles(t or "").tobytes()
              for t in part[text_col].to_pylist()]
        return pa.table({key_col: part[key_col],
                         "shingles": pa.array(sh, pa.large_binary())})

    texts: dict = {}
    for b in docs.map_batches(gather, batch_format="pyarrow",
                              batch_size=None).iter_batches(
            batch_size=4096, batch_format="pyarrow"):
        for k, raw in zip(b[key_col].to_pylist(), b["shingles"].to_pylist()):
            texts[k] = set(np.frombuffer(raw, dtype=np.uint64).tolist())
    rows = []
    for a, b_ in zip(cand["doc_a"], cand["doc_b"]):
        sa, sb = texts.get(a, set()), texts.get(b_, set())
        if not sa or not sb:
            continue
        j = len(sa & sb) / len(sa | sb)
        if j >= threshold:
            rows.append((a, b_, round(j, 6)))
    return pd.DataFrame(rows, columns=["doc_a", "doc_b", "jaccard"])


def dup_clusters(verified_pairs: pd.DataFrame, key_col: str = "doc_id") -> pd.DataFrame:
    """Near-dup clusters from verified pairs → (key, cluster_id) with
    cluster_id = min member key.

    Union-find on the driver: legitimate because the pair set is
    LSH+verify bounded (≪ n²; see ray_guide — driver union-find "only if
    the candidate set is provably small"; for larger pair sets iterate
    min-label propagation as a groupby loop)."""
    parent: dict = {}

    def find(x):
        while parent.setdefault(x, x) != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in zip(verified_pairs["doc_a"], verified_pairs["doc_b"]):
        ra, rb = find(a), find(b)
        if ra != rb:
            lo, hi = (ra, rb) if ra <= rb else (rb, ra)
            parent[hi] = lo
    rows = sorted((k, find(k)) for k in parent)
    return pd.DataFrame(rows, columns=[key_col, "cluster_id"])


# ---------------------------------------------------------------------------
# SimHash
# ---------------------------------------------------------------------------

class SimHasher:
    """Actor: 64-bit simhash over word unigrams (token-hash bit voting)."""

    def __init__(self, key_col: str = "doc_id", text_col: str = "text"):
        self.key_col, self.text_col = key_col, text_col
        self.word_re = re.compile(r"\w+")

    def simhash(self, text: str) -> int:
        votes = np.zeros(64, dtype=np.int64)
        for tok in self.word_re.findall(text.lower()):
            h = stable_hash64(tok)
            bits = (h >> np.arange(64, dtype=np.uint64)) & np.uint64(1)
            votes += np.where(bits.astype(bool), 1, -1)
        out = np.uint64(0)
        for i in range(64):
            if votes[i] > 0:
                out |= np.uint64(1) << np.uint64(i)
        return int(out)

    def __call__(self, batch: pa.Table) -> pa.Table:
        sims = [self.simhash(t or "") for t in batch[self.text_col].to_pylist()]
        return pa.table(
            {self.key_col: batch[self.key_col], "simhash": pa.array(sims, pa.uint64())}
        )


def simhash_signatures(docs: Dataset, key_col: str = "doc_id",
                       text_col: str = "text") -> Dataset:
    return docs.map_batches(
        SimHasher, fn_constructor_kwargs=dict(key_col=key_col, text_col=text_col),
        batch_format="pyarrow", concurrency=(1, 4), num_cpus=1,
    )


def simhash_near_pairs(docs: Dataset, max_hamming: int = 8,
                       key_col: str = "doc_id", text_col: str = "text") -> pd.DataFrame:
    """SimHash near-dup pairs: band the 64-bit signature into 4×16-bit
    chunks (pigeonhole: any pair within hamming ≤ 3·chunks shares a
    chunk), groupby colliding chunks for candidates, verify exact
    hamming distance. Same collide-then-verify shape as the MinHash
    path."""
    sigs = simhash_signatures(docs, key_col, text_col).materialize()

    def to_bands(batch: pa.Table) -> pa.Table:
        keys, bands, vals, full = [], [], [], []
        for k, h in zip(batch[key_col].to_pylist(), batch["simhash"].to_pylist()):
            for band in range(4):
                keys.append(k)
                bands.append(band)
                vals.append((int(h) >> (16 * band)) & 0xFFFF)
                full.append(int(h))
        return pa.table({key_col: pa.array(keys), "band": pa.array(bands, pa.int32()),
                         "chunk": pa.array(vals, pa.int32()),
                         "simhash": pa.array(full, pa.uint64())})

    bands = sigs.map_batches(to_bands, batch_format="pyarrow", batch_size=None)

    def pairs_in_bucket(g: pd.DataFrame) -> pd.DataFrame:
        rows = sorted(zip(g[key_col], g["simhash"]))
        out = []
        for i in range(len(rows)):
            for j in range(i + 1, len(rows)):
                (a, ha), (b, hb) = rows[i], rows[j]
                d = bin(int(ha) ^ int(hb)).count("1")
                if d <= max_hamming:
                    out.append((a, b, d))
        return pd.DataFrame(out, columns=["doc_a", "doc_b", "hamming"]) if out else \
            pd.DataFrame({"doc_a": pd.Series(dtype=g[key_col].dtype),
                          "doc_b": pd.Series(dtype=g[key_col].dtype),
                          "hamming": pd.Series(dtype="int64")})

    pairs = bands.groupby(["band", "chunk"]).map_groups(
        pairs_in_bucket, batch_format="pandas"
    ).to_pandas()
    if pairs.empty:
        return pairs
    return pairs.drop_duplicates(["doc_a", "doc_b"]).sort_values(
        ["doc_a", "doc_b"]).reset_index(drop=True)


# ---------------------------------------------------------------------------
# embedding similarity search (brute-force cosine; IVF scale path)
# ---------------------------------------------------------------------------

class CosineTopK:
    """Actor: batched cosine of every row against a broadcast query
    matrix (numpy matmul per batch); emits per-(query, row) scores which
    a downstream per-query top-k reduces. The baseline ANN path."""

    def __init__(self, query_ref, key_col: str = "vec_id", vec_col: str = "embedding"):
        q = ray.get(query_ref) if isinstance(query_ref, ray.ObjectRef) else query_ref
        self.qids = np.array([x[0] for x in q])
        qm = np.stack([np.asarray(x[1], dtype=np.float64) for x in q])
        self.qm = qm / np.maximum(np.linalg.norm(qm, axis=1, keepdims=True), 1e-30)
        self.key_col, self.vec_col = key_col, vec_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = np.asarray(batch[self.key_col].to_pylist())
        mat = np.asarray(batch[self.vec_col].to_pylist(), dtype=np.float64)
        mat = mat / np.maximum(np.linalg.norm(mat, axis=1, keepdims=True), 1e-30)
        scores = mat @ self.qm.T  # (rows, queries)
        n_rows, n_q = scores.shape
        return pa.table(
            {
                "qid": pa.array(np.repeat(self.qids, n_rows)),
                self.key_col: pa.array(np.tile(ids, n_q)),
                "cos": pa.array(np.round(scores.T.reshape(-1), 4), pa.float64()),
            }
        )


def brute_force_topk(embeddings: Dataset, queries: list[tuple[int, list[float]]],
                     k: int = 10, key_col: str = "vec_id",
                     vec_col: str = "embedding") -> pd.DataFrame:
    """Exact cosine top-k for each query vector (self-matches excluded)."""
    query_ref = ray.put(queries)
    scored = embeddings.map_batches(
        CosineTopK, fn_constructor_kwargs=dict(query_ref=query_ref, key_col=key_col,
                                               vec_col=vec_col),
        batch_format="pyarrow", concurrency=(1, 4), num_cpus=1, batch_size=2048,
    )

    def per_query_topk(g: pd.DataFrame) -> pd.DataFrame:
        g = g[g[key_col] != g["qid"]]
        g = g.sort_values(["cos", key_col], ascending=[False, True], kind="mergesort")
        return g.head(k)

    out = scored.groupby("qid").map_groups(per_query_topk, batch_format="pandas")
    return out.to_pandas().sort_values(["qid", "cos", key_col],
                                       ascending=[True, False, True]).reset_index(drop=True)


class IvfIndexer:
    """Scale path: coarse k-means-style bucketing by nearest centroid
    (centroids broadcast), so search probes only matching buckets.
    Centroids here are seeded deterministic samples — a stand-in for an
    offline k-means fit at 100 TB."""

    def __init__(self, centroids_ref, key_col: str = "vec_id", vec_col: str = "embedding"):
        c = ray.get(centroids_ref) if isinstance(centroids_ref, ray.ObjectRef) else centroids_ref
        self.centroids = c / np.maximum(np.linalg.norm(c, axis=1, keepdims=True), 1e-30)
        self.key_col, self.vec_col = key_col, vec_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        mat = np.asarray(batch[self.vec_col].to_pylist(), dtype=np.float64)
        mat = mat / np.maximum(np.linalg.norm(mat, axis=1, keepdims=True), 1e-30)
        assign = (mat @ self.centroids.T).argmax(axis=1).astype(np.int32)
        return batch.append_column("ivf_bucket", pa.array(assign, pa.int32()))


def ivf_bucket_assignments(embeddings: Dataset, n_centroids: int = 8,
                           vec_col: str = "embedding") -> Dataset:
    sample = embeddings.take(n_centroids)
    centroids = np.stack([np.asarray(r[vec_col], dtype=np.float64) for r in sample])
    ref = ray.put(centroids)
    return embeddings.map_batches(
        IvfIndexer, fn_constructor_kwargs=dict(centroids_ref=ref, vec_col=vec_col),
        batch_format="pyarrow", concurrency=(1, 4), num_cpus=1,
    )


def ivf_topk(embeddings: Dataset, queries: list[tuple[int, list[float]]],
             k: int = 10, n_centroids: int = 8, n_probe: int = 2,
             key_col: str = "vec_id", vec_col: str = "embedding") -> pd.DataFrame:
    """IVF probe search — the ANN scale path: rows are bucketed by
    nearest centroid, each query scans only its ``n_probe`` closest
    buckets (a vectorized predicate pushdown instead of the full
    brute-force matmul). Approximate: recall vs brute force grows with
    n_probe; n_probe = n_centroids degrades to exact."""
    sample = embeddings.take(n_centroids)
    centroids = np.stack([np.asarray(r[vec_col], dtype=np.float64) for r in sample])
    cn = centroids / np.maximum(np.linalg.norm(centroids, axis=1, keepdims=True), 1e-30)
    probe: dict[int, set[int]] = {}
    for qid, qv in queries:
        q = np.asarray(qv, dtype=np.float64)
        q = q / max(np.linalg.norm(q), 1e-30)
        order = np.argsort(-(cn @ q), kind="stable")[:n_probe]
        probe[qid] = set(int(x) for x in order)
    ref = ray.put(centroids)
    bucketed = embeddings.map_batches(
        IvfIndexer, fn_constructor_kwargs=dict(centroids_ref=ref, vec_col=vec_col),
        batch_format="pyarrow", concurrency=(1, 4), num_cpus=1,
    ).materialize()  # consumed twice: probe filter + bucket lookup
    all_probed = set().union(*probe.values()) if probe else set()
    probed_ref = ray.put(all_probed)

    def keep_probed(batch: pa.Table) -> pa.Table:
        ps = ray.get(probed_ref)
        mask = [b in ps for b in batch["ivf_bucket"].to_pylist()]
        return batch.filter(pa.array(mask))

    filtered = bucketed.map_batches(keep_probed, batch_format="pyarrow",
                                    batch_size=None)
    query_ref = ray.put(queries)
    scored = filtered.map_batches(
        CosineTopK, fn_constructor_kwargs=dict(query_ref=query_ref, key_col=key_col,
                                               vec_col=vec_col),
        batch_format="pyarrow", concurrency=(1, 4), num_cpus=1, batch_size=2048,
    )
    df = scored.to_pandas()
    # drop rows outside each query's own probed buckets
    bdf = bucketed.select_columns([key_col, "ivf_bucket"]).to_pandas()
    bucket_of_row = dict(zip(bdf[key_col], bdf["ivf_bucket"]))
    df = df[[bucket_of_row.get(v) in probe.get(q, set())
             for q, v in zip(df["qid"], df[key_col])]]
    df = df[df[key_col] != df["qid"]]
    df = df.sort_values(["qid", "cos", key_col], ascending=[True, False, True],
                        kind="mergesort")
    return df.groupby("qid", sort=True).head(k).reset_index(drop=True)


# ---------------------------------------------------------------------------
# text analysis: language-ID, quality, token count, fingerprints
# ---------------------------------------------------------------------------

_STOP_SET = {"the", "a", "of", "and", "to", "in", "is", "it", "for", "on"}

_LANG_PROFILES = {
    # tiny character-trigram heuristic profiles (deterministic, no model)
    "en": {"the", "he ", " th", "ing", "and", "ion"},
    "de": {"der", "ein", "sch", "ich", "und", "en "},
    "es": {"de ", "la ", "os ", "el ", "ión", "que"},
    "fr": {"le ", "es ", "de ", "ent", "que", "ion"},
}


class TextAnalyzer:
    """Actor: language-ID (char-trigram overlap), quality scores
    (length / punctuation / stopword ratios), whitespace + BPE-ish token
    counts, and a rolling-hash document fingerprint."""

    def __init__(self, key_col: str = "doc_id", text_col: str = "text"):
        self.key_col, self.text_col = key_col, text_col
        self.word_re = re.compile(r"\w+")
        # BPE-ish segmentation: words, numbers, or single non-space symbols
        self.bpe_re = re.compile(r"\w+|[^\w\s]")

    def lang_of(self, text: str) -> str:
        tl = text.lower()
        tris = {tl[i:i + 3] for i in range(max(0, len(tl) - 2))}
        best, best_n = "unknown", 0
        for lang in sorted(_LANG_PROFILES):
            n = len(tris & _LANG_PROFILES[lang])
            if n > best_n:
                best, best_n = lang, n
        return best

    def fingerprint(self, toks: list[str]) -> int:
        # polynomial rolling hash over token hashes (order-sensitive)
        h = 0
        for t in toks:
            h = (h * 1000003 + stable_hash64(t)) & 0xFFFFFFFFFFFFFFFF
        return h

    def __call__(self, batch: pa.Table) -> pa.Table:
        keys = batch[self.key_col].to_pylist()
        texts = batch[self.text_col].to_pylist()
        langs, stopr, punctr, nws, nbpe, fps = [], [], [], [], [], []
        for t in texts:
            t = t or ""
            toks = self.word_re.findall(t.lower())
            ws_toks = t.split()
            n = max(1, len(toks))
            langs.append(self.lang_of(t))
            stopr.append(round(sum(tok in _STOP_SET for tok in toks) / n, 6))
            punctr.append(round(sum(not c.isalnum() and not c.isspace() for c in t)
                                / max(1, len(t)), 6))
            nws.append(len(ws_toks))
            nbpe.append(len(self.bpe_re.findall(t)))
            fps.append(self.fingerprint(toks))
        return pa.table(
            {
                self.key_col: batch[self.key_col],
                "lang_pred": pa.array(langs, pa.string()),
                "stop_ratio": pa.array(stopr, pa.float64()),
                "punct_ratio": pa.array(punctr, pa.float64()),
                "n_tokens_ws": pa.array(nws, pa.int64()),
                "n_tokens_bpe": pa.array(nbpe, pa.int64()),
                "fingerprint": pa.array(fps, pa.uint64()),
            }
        )


def analyze_text(docs: Dataset, key_col: str = "doc_id", text_col: str = "text") -> Dataset:
    return docs.map_batches(
        TextAnalyzer, fn_constructor_kwargs=dict(key_col=key_col, text_col=text_col),
        batch_format="pyarrow", concurrency=(1, 4), num_cpus=1,
    )


# ---------------------------------------------------------------------------
# multimodal plumbing (decode stubbed — no image/audio libs in container)
# ---------------------------------------------------------------------------

class MediaDecoder:
    """Actor-pool stage for opaque binary media columns.

    The Ray-side plumbing (schema, small batch size for large payloads,
    actor signature, typed output layout) is real; the actual
    decode/resize/frame-sample kernel is a deterministic fake
    (``mode='fake'``) because no image/audio codec libraries exist in
    this container — swap ``_decode`` for a real library in production.
    """

    def __init__(self, media_col: str = "payload", mode: str = "fake",
                 target_size: tuple[int, int] = (32, 32)):
        self.media_col, self.mode, self.target = media_col, mode, target_size
        if mode not in ("fake",):
            raise NotImplementedError(
                "real decoders (PIL/av/soundfile) are not available in this "
                "environment; only the deterministic 'fake' mode is implemented"
            )

    def _decode(self, payload: bytes) -> np.ndarray:
        # deterministic fake decode: bytes → seeded uint8 "pixels"
        seed = stable_hash64(payload or b"") & 0x7FFFFFFF
        rng = np.random.RandomState(seed)
        h, w = self.target
        return rng.randint(0, 256, size=(h, w, 3), dtype=np.uint8)

    def __call__(self, batch: pa.Table) -> pa.Table:
        feats, shapes = [], []
        for payload in batch[self.media_col].to_pylist():
            img = self._decode(payload)
            feats.append([float(img.mean()), float(img.std()),
                          float(img[..., 0].mean()), float(img[..., 1].mean()),
                          float(img[..., 2].mean())])
            shapes.append(list(img.shape))
        out = batch.drop_columns([self.media_col])
        return out.append_column(
            "features", pa.array(feats, pa.list_(pa.float64()))
        ).append_column("shape", pa.array(shapes, pa.list_(pa.int32())))


def decode_media(ds: Dataset, media_col: str = "payload") -> Dataset:
    """Large binary payloads → small batches (memory-aware, SURVEY §4)."""
    return ds.map_batches(
        MediaDecoder, fn_constructor_kwargs=dict(media_col=media_col),
        batch_format="pyarrow", batch_size=64, concurrency=(1, 4), num_cpus=1,
    )
