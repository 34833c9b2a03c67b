"""Numpy-only TF-IDF vectorizer + sparse cosine top-k (tier 3).

Replicates the reference's sklearn configuration
(string_similarity.py:324-326): pre-tokenized input, token 1-3-grams,
raw term counts, smooth idf ``ln((1+n)/(1+df)) + 1``, l2 row norm —
sklearn/scipy are not available here, so the CSR matrix and the
cosine kernel are hand-rolled on numpy arrays.

Scale note (SURVEY §7.4.2): the reference fits idf on the JOINT
clinical+ontology corpus (string_similarity.py:323-326), which is not
streamable at 10^12 documents. Default: fit on the ontology corpus
only; the correctness gate's P/R budget absorbs the idf drift, and the
exact-1.0 / percentile rules (data_utils.py:407-418,
string_similarity.py:201-202) are preserved exactly on the recomputed
scores. Opt-in joint fit: pass ``extra_df``/``extra_n_docs`` (document
frequencies of a page-corpus SAMPLE, gathered distributed by
``state.lexicon.sample_corpus_df``) — the vocabulary and idf then
match a fit on ontology ∪ sample exactly, reproducing the reference's
joint-fit semantics at bounded driver state.
"""

from __future__ import annotations

import numpy as np


def ngrams(tokens: list[str], lo: int = 1, hi: int = 3) -> list[str]:
    """Token n-grams, sklearn order: all n=lo..hi, each left-to-right."""
    out = []
    n = len(tokens)
    for k in range(lo, hi + 1):
        if k == 1:
            out.extend(tokens)
        else:
            for i in range(n - k + 1):
                out.append(" ".join(tokens[i : i + k]))
    return out


def df_of_token_lists(token_lists: list[list[str]],
                      ngram_range: tuple[int, int] = (1, 3)) -> dict[str, int]:
    """Per-document-distinct n-gram document frequencies — the local
    combiner behind the distributed joint-fit sampler (and the oracle
    shape for its tests)."""
    df: dict[str, int] = {}
    for toks in token_lists:
        for t in set(ngrams(toks, *ngram_range)):
            df[t] = df.get(t, 0) + 1
    return df


class TfidfIndex:
    """Fit on the ontology corpus; transform query token-lists per batch.

    Holds: vocabulary (term → id), idf vector, l2-normalized ontology
    matrix in *postings* layout (term id → (row indices, values)) for the
    query-side sparse × sparse cosine, plus per-row metadata (uri, ont).
    """

    def __init__(
        self,
        corpus_tokens: list[list[str]],
        row_uris: list[str],
        row_onts: list[str],
        ngram_range: tuple[int, int] = (1, 3),
        extra_df: dict[str, int] | None = None,
        extra_n_docs: int = 0,
    ):
        assert len(corpus_tokens) == len(row_uris) == len(row_onts)
        self.ngram_range = ngram_range
        self.row_uris = np.asarray(row_uris, dtype=object)
        self.row_onts = np.asarray(row_onts, dtype=object)
        self.n_rows = len(corpus_tokens)

        # ---- vocabulary + document frequencies ----
        vocab: dict[str, int] = {}
        df_counts: list[int] = []
        rows_terms: list[dict[int, int]] = []
        for toks in corpus_tokens:
            counts: dict[int, int] = {}
            for t in ngrams(toks, *ngram_range):
                tid = vocab.get(t)
                if tid is None:
                    tid = len(vocab)
                    vocab[t] = tid
                    df_counts.append(0)
                counts[tid] = counts.get(tid, 0) + 1
            for tid in counts:
                df_counts[tid] += 1
            rows_terms.append(counts)
        # ---- opt-in joint fit: fold in the page-corpus sample's dfs;
        # sample-only terms join the vocabulary with empty postings, so
        # they weight query norms exactly as the reference's joint
        # vectorizer does (string_similarity.py:323-326) ----
        if extra_df:
            for t, d in extra_df.items():
                tid = vocab.get(t)
                if tid is None:
                    tid = len(vocab)
                    vocab[t] = tid
                    df_counts.append(0)
                df_counts[tid] += int(d)
        self.vocab = vocab
        n = max(1, self.n_rows + max(0, int(extra_n_docs)))
        df = np.asarray(df_counts, dtype=np.float64)
        # sklearn smooth_idf: ln((1+n)/(1+df)) + 1
        self.idf = np.log((1.0 + n) / (1.0 + df)) + 1.0

        # ---- build l2-normalized postings (term → rows, vals) ----
        post_rows: dict[int, list[int]] = {}
        post_vals: dict[int, list[float]] = {}
        self.row_norm_sq = np.zeros(self.n_rows)
        for ridx, counts in enumerate(rows_terms):
            if not counts:
                continue
            tids = np.fromiter(counts.keys(), dtype=np.int64, count=len(counts))
            tfs = np.fromiter(counts.values(), dtype=np.float64, count=len(counts))
            w = tfs * self.idf[tids]
            norm = np.sqrt((w * w).sum())
            if norm > 0:
                w = w / norm
            for tid, v in zip(tids.tolist(), w.tolist()):
                post_rows.setdefault(tid, []).append(ridx)
                post_vals.setdefault(tid, []).append(v)
        self.postings = {
            tid: (np.asarray(post_rows[tid], dtype=np.int64),
                  np.asarray(post_vals[tid], dtype=np.float64))
            for tid in post_rows
        }

    # -- query side ------------------------------------------------------
    def query_vector(self, tokens: list[str]) -> tuple[np.ndarray, np.ndarray]:
        """tokens → (term ids, l2-normalized tfidf weights); OOV dropped."""
        counts: dict[int, int] = {}
        for t in ngrams(tokens, *self.ngram_range):
            tid = self.vocab.get(t)
            if tid is not None:
                counts[tid] = counts.get(tid, 0) + 1
        if not counts:
            return np.empty(0, dtype=np.int64), np.empty(0)
        tids = np.fromiter(counts.keys(), dtype=np.int64, count=len(counts))
        w = np.fromiter(counts.values(), dtype=np.float64, count=len(counts)) * self.idf[tids]
        norm = np.sqrt((w * w).sum())
        if norm > 0:
            w = w / norm
        return tids, w

    def cosine_scores(self, tokens: list[str]) -> np.ndarray:
        """Dense cosine vs every ontology row (= reference's
        ``linear_kernel`` row, string_similarity.py:226)."""
        tids, w = self.query_vector(tokens)
        scores = np.zeros(self.n_rows)
        for tid, qv in zip(tids.tolist(), w.tolist()):
            p = self.postings.get(tid)
            if p is not None:
                scores[p[0]] += qv * p[1]
        return scores

    def top_n(self, tokens: list[str], top_n: int, floor: float) -> list[tuple[float, str, str]]:
        """Top-n (score, uri, ontology) with scores ≥ floor; replicates
        ``argsort()[::-1][:top_n]`` then the 0.25 floor
        (string_similarity.py:226-228, :264)."""
        scores = self.cosine_scores(tokens)
        if self.n_rows == 0:
            return []
        k = min(top_n, self.n_rows)
        # argsort()[::-1][:k] — stable ascending reversed, as the reference
        idx = scores.argsort(kind="stable")[::-1][:k]
        out = []
        for i in idx:
            s = float(scores[i])
            if s >= floor:
                out.append((s, str(self.row_uris[i]), str(self.row_onts[i])))
        return out


def filters_matches(matches: list[tuple[float, str]], percentile: float) -> list[tuple[float, str]]:
    """Per-ontology match filter, faithful to ``filters_matches``
    (string_similarity.py:180-204): sort desc, keep max score per uri
    (first occurrence), then keep scores ≥ the ``percentile``-th
    percentile (np.percentile linear interpolation) of the deduped list;
    scores rounded to 3 decimals downstream."""
    filtered: list[tuple[float, str]] = []
    seen: set[str] = set()
    for s, uri in sorted(matches, reverse=True):
        if uri not in seen:
            filtered.append((s, uri))
            seen.add(uri)
    cutoff = np.percentile([s for s, _ in filtered], percentile)
    return [(s, u) for s, u in filtered if s >= cutoff]
