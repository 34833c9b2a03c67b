"""LinkerActor — tiers 1/2 + tier-3 candidate generation.

Stateful actor-pool stage (``map_batches(LinkerActor, concurrency=N,
batch_size=B, batch_format="pyarrow")``): ``__init__`` runs once per
actor — it pulls the broadcast lexicon handle (``ray.put`` object ref)
and builds the Aho-Corasick automaton over every surface form;
``__call__`` runs per batch and only scans + hash-looks-up.

Per page:
  - scan lowercased text with the automaton (leftmost-longest,
    token-boundary mentions);
  - each mention surface resolves through the precomputed
    ``surface → links`` map: tier ``str`` (exact label/synonym,
    clinical_concept_annotator.py:310-328), tier ``dbxref``/``umls``
    (alias chains incl. double merge, :205-277), or ANCESTOR-level
    links for deprecated-class surfaces (ancestor fallback,
    data_utils.py:438-449);
  - sentences with no mention but ≥1 lexicon-vocabulary token are
    emitted as tier-3 candidates (``tier='cand'``) for the scorer —
    filtering *before* the expensive TF-IDF stage is the big cost
    saver (SURVEY §7.1 step 5).
"""

from __future__ import annotations

import pyarrow as pa
import ray

from omop2obo_ray.functions.aho import make_scanner
from omop2obo_ray.functions.textproc import preprocess_tokens, sentences
from omop2obo_ray.state.lexicon import Lexicon

LINK_COLS = [
    "url", "surface", "level", "ontology", "uri", "label", "tier", "evidence", "score",
]


def _empty_links_table() -> pa.Table:
    return pa.table(
        {
            "url": pa.array([], pa.string()),
            "surface": pa.array([], pa.string()),
            "level": pa.array([], pa.string()),
            "ontology": pa.array([], pa.string()),
            "uri": pa.array([], pa.string()),
            "label": pa.array([], pa.string()),
            "tier": pa.array([], pa.string()),
            "evidence": pa.array([], pa.string()),
            "score": pa.array([], pa.float64()),
        }
    )


class LinkerActor:
    def __init__(self, lexicon_ref, max_sim_candidates: int = 8,
                 fuse_scorer: bool = False, top_n: int = 10, floor: float = 0.25,
                 percentile: float = 75.0, yield_byte_cap: int | None = None):
        # lexicon_ref may be a Lexicon (tests) or a ray ObjectRef (pipeline)
        self.lex: Lexicon = (
            ray.get(lexicon_ref) if isinstance(lexicon_ref, ray.ObjectRef) else lexicon_ref
        )
        # prefer the lexicon's prebuilt automaton (built once driver-side,
        # unpickled from the object store); fall back to a local build
        self.automaton = self.lex.automaton or make_scanner(self.lex.patterns)
        # unigram vocabulary of the sim corpus, for cheap candidate pre-filter
        self.sim_vocab = {t for t in self.lex.sim_index.vocab if " " not in t}
        self.max_sim_candidates = max_sim_candidates
        # Page-aligned output chunking (correctness guard for the
        # page-local assembly contract): Ray's BlockOutputBuffer slices
        # an accumulated output block at an ARBITRARY row offset only
        # when it reaches 1.5× target_max_block_size; with every yield
        # < 0.5× target the buffer can never get there, so downstream
        # blocks always break at yield (= page) boundaries and a url's
        # links can never straddle two blocks. 0.25× leaves margin.
        # (Residual contract: a SINGLE page's links must stay under the
        # cap — 32 MB of links for one page at the default 128 MB
        # target — or its block may still be sliced.)
        if yield_byte_cap is None:
            from ray.data.context import DataContext

            target = DataContext.get_current().target_max_block_size or (128 << 20)
            yield_byte_cap = target // 4
        self.yield_byte_cap = yield_byte_cap
        self._build_interned()
        # fused tier-3: score candidate sentences in-place instead of
        # emitting tier='cand' rows for a separate scorer stage — one
        # operator boundary (and one full link-stream serialization)
        # less; the standalone ScorerActor stage remains available via
        # cfg.fuse_scorer=False
        self.scorer = None
        if fuse_scorer:
            from omop2obo_ray.stages.score import ScorerActor

            self.scorer = ScorerActor(self.lex, top_n=top_n, floor=floor,
                                      percentile=percentile)

    def _build_interned(self) -> None:
        """Intern every surface to an int id and flatten all link fields
        into global dictionary-encoded Arrow arrays, with (offset, len)
        per surface. The per-batch emit then reduces to ONE int append
        per mention plus a C-speed ``take`` per column — no Python work
        proportional to links × fields."""
        import numpy as np

        labels = self.lex.labels
        sid_of: dict[str, int] = {}
        offs, lens = [], []
        f_surface, f_level, f_ont, f_uri, f_label, f_tier, f_evid = \
            [], [], [], [], [], [], []
        pos = 0
        for surface, links in self.lex.surface_links.items():
            sid_of[surface] = len(offs)
            offs.append(pos)
            lens.append(len(links))
            pos += len(links)
            for level, ont, uri, tier, evid in links:
                f_surface.append(surface)
                f_level.append(level)
                f_ont.append(ont)
                f_uri.append(uri)
                f_label.append(labels.get(uri, ""))
                f_tier.append(tier)
                f_evid.append(evid)
        self._sid_of = sid_of
        self._off = np.asarray(offs, dtype=np.int64)
        self._len = np.asarray(lens, dtype=np.int64)
        self._fields = {
            "surface": pa.array(f_surface, pa.string()).dictionary_encode(),
            "level": pa.array(f_level, pa.string()).dictionary_encode(),
            "ontology": pa.array(f_ont, pa.string()).dictionary_encode(),
            "uri": pa.array(f_uri, pa.string()).dictionary_encode(),
            "label": pa.array(f_label, pa.string()).dictionary_encode(),
            "tier": pa.array(f_tier, pa.string()).dictionary_encode(),
            "evidence": pa.array(f_evid, pa.string()).dictionary_encode(),
        }

    def __call__(self, batch: pa.Table):
        import numpy as np

        urls = batch["url"].to_pylist()
        texts = batch["text"].to_pylist()
        # exact-tier emit: one interned surface id per distinct mention
        m_sid: list[int] = []       # surface id per mention
        m_url_idx: list[int] = []   # page index per mention
        # sim/candidate rows (few): plain python columns
        c_page: list[int] = []      # page index per candidate row
        c_url: list[str] = []
        c_surface: list[str] = []
        c_level: list[str] = []
        c_ont: list[str] = []
        c_uri: list[str | None] = []
        c_label: list[str] = []
        c_tier: list[str] = []
        c_evid: list[str] = []
        c_score: list[float | None] = []

        sid_of = self._sid_of
        for page_idx, (url, text) in enumerate(zip(urls, texts)):
            low = (text or "").lower()
            spans = self.automaton.longest_nonoverlapping(low)
            # one emission per DISTINCT surface per page: repeated
            # occurrences add no information (assembly dedups on uri and
            # evidence, A3/A6 semantics) and 4×-inflate the link stream
            seen: set[int] = set()
            covered: list[tuple[int, int]] = []
            for s, e in spans:
                sid = sid_of.get(low[s:e])
                if sid is None:
                    continue
                covered.append((s, e))
                if sid in seen:
                    continue
                seen.add(sid)
                m_sid.append(sid)
                m_url_idx.append(page_idx)
            # tier-3 candidates: sentences with no mention hit
            n_cand = 0
            pos = 0
            for sent in sentences(low):
                start = low.find(sent, pos)
                end = start + len(sent) if start >= 0 else -1
                if start >= 0:
                    pos = end
                if any(s < end and e > start for s, e in covered) and start >= 0:
                    continue
                toks = preprocess_tokens(sent)
                if not any(t in self.sim_vocab for t in toks):
                    continue
                if n_cand >= self.max_sim_candidates:
                    break
                n_cand += 1
                if self.scorer is not None:
                    for ont, uri, score in self.scorer.score_text(sent):
                        c_page.append(page_idx)
                        c_url.append(url)
                        c_surface.append(sent)
                        c_level.append("CONCEPT")
                        c_ont.append(ont)
                        c_uri.append(uri)
                        c_label.append(self.lex.labels.get(uri, ""))
                        c_tier.append("sim")
                        c_evid.append(f"{uri}_{round(score, 3)}")
                        c_score.append(float(score))
                else:
                    c_page.append(page_idx)
                    c_url.append(url)
                    c_surface.append(sent)
                    c_level.append("CONCEPT")
                    c_ont.append("")
                    c_uri.append(None)
                    c_label.append("")
                    c_tier.append("cand")
                    c_evid.append("")
                    c_score.append(None)

        tables = []
        page_idx_parts = []
        if m_sid:
            sids = np.asarray(m_sid, dtype=np.int64)
            # gather link rows: concatenated per-surface index ranges into
            # the global flattened field arrays (C-speed take per column)
            counts = self._len[sids]
            starts = self._off[sids]
            total = int(counts.sum())
            # [start..start+len) runs via cumulative offsets, vectorized
            inner = np.arange(total) - np.repeat(
                np.concatenate(([0], np.cumsum(counts)[:-1])), counts
            )
            row_idx = np.repeat(starts, counts) + inner
            url_idx = np.repeat(np.asarray(m_url_idx, dtype=np.int64), counts)
            idx = pa.array(row_idx)
            url_col = pa.array(urls, pa.string()).take(pa.array(url_idx))
            f = self._fields
            tables.append(pa.table(
                {
                    "url": url_col,
                    # low-cardinality columns stay dictionary-encoded:
                    # the link stream crosses the object store between
                    # every stage — bytes moved matter more than kernels
                    "surface": f["surface"].take(idx),
                    "level": f["level"].take(idx),
                    "ontology": f["ontology"].take(idx),
                    "uri": f["uri"].take(idx),
                    "label": f["label"].take(idx),
                    "tier": f["tier"].take(idx),
                    "evidence": f["evidence"].take(idx),
                    "score": pa.nulls(total, pa.float64()),
                }
            ))
            page_idx_parts.append(url_idx)
        if c_url:
            tables.append(pa.table(
                {
                    "url": pa.array(c_url, pa.string()),
                    "surface": pa.array(c_surface, pa.string()).dictionary_encode(),
                    "level": pa.array(c_level, pa.string()).dictionary_encode(),
                    "ontology": pa.array(c_ont, pa.string()).dictionary_encode(),
                    "uri": pa.array(c_uri, pa.string()).dictionary_encode(),
                    "label": pa.array(c_label, pa.string()).dictionary_encode(),
                    "tier": pa.array(c_tier, pa.string()).dictionary_encode(),
                    "evidence": pa.array(c_evid, pa.string()).dictionary_encode(),
                    "score": pa.array(c_score, pa.float64()),
                }
            ))
            page_idx_parts.append(np.asarray(c_page, dtype=np.int64))
        if not tables:
            yield _empty_links_table()
            return
        out = (tables[0] if len(tables) == 1
               else pa.concat_tables(tables, promote_options="permissive"))
        if out.nbytes <= self.yield_byte_cap:
            # common case: whole batch in one page-complete yield
            yield out
            return
        # Oversized output: re-group rows by page (stable sort keeps the
        # exact-before-candidate emission order within a page), then
        # yield page-aligned slices each under the byte cap so the
        # output buffer never slices mid-page (see __init__ comment).
        page_of_row = np.concatenate(page_idx_parts)
        order = np.argsort(page_of_row, kind="stable")
        out = out.take(pa.array(order))
        page_sorted = page_of_row[order]
        # row offsets where a new page starts
        bounds = np.concatenate(
            ([0], np.flatnonzero(np.diff(page_sorted)) + 1, [len(page_sorted)]))
        bytes_per_row = max(1, out.nbytes // max(1, out.num_rows))
        max_rows = max(1, int(self.yield_byte_cap // bytes_per_row))
        start = 0
        for i in range(1, len(bounds)):
            # emit when adding the next page would exceed the cap
            if bounds[i] - start > max_rows and bounds[i - 1] > start:
                yield out.slice(start, bounds[i - 1] - start)
                start = bounds[i - 1]
        if start < out.num_rows:
            yield out.slice(start, out.num_rows - start)
