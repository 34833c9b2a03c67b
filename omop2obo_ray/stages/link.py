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
                 percentile: float = 75.0):
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
        self._surface_cache: dict[str, tuple] = {}
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

    def _surface_columns(self, surface: str):
        """Cached per-surface link columns (tuple of per-field tuples) —
        the emit hot path is list.extend of precomputed tuples, not one
        Python append per field per link."""
        cached = self._surface_cache.get(surface)
        if cached is None:
            links = self.lex.surface_links[surface]
            labels = self.lex.labels
            cached = (
                tuple(surface for _ in links),
                tuple(l[0] for l in links),          # level
                tuple(l[1] for l in links),          # ontology
                tuple(l[2] for l in links),          # uri
                tuple(labels.get(l[2], "") for l in links),  # label
                tuple(l[3] for l in links),          # tier
                tuple(l[4] for l in links),          # evidence
                len(links),
            )
            self._surface_cache[surface] = cached
        return cached

    def __call__(self, batch: pa.Table) -> pa.Table:
        urls = batch["url"].to_pylist()
        texts = batch["text"].to_pylist()
        c_url: list[str] = []
        c_surface: list[str] = []
        c_level: list[str] = []
        c_ont: list[str] = []
        c_uri: list[str | None] = []
        c_label: list[str] = []
        c_tier: list[str] = []
        c_evid: list[str] = []
        c_score: list[float | None] = []

        surface_links = self.lex.surface_links
        for url, text in zip(urls, texts):
            low = (text or "").lower()
            spans = self.automaton.longest_nonoverlapping(low)
            # one emission per DISTINCT surface per page: repeated
            # occurrences add no information (assembly dedups on uri and
            # evidence, A3/A6 semantics) and 4×-inflate the link stream
            seen: set[str] = set()
            covered: list[tuple[int, int]] = []
            for s, e in spans:
                surface = low[s:e]
                if surface in seen:
                    covered.append((s, e))
                    continue
                if surface not in surface_links:
                    continue
                seen.add(surface)
                covered.append((s, e))
                surf, level, ont, uri, label, tier, evid, n = self._surface_columns(surface)
                c_url.extend([url] * n)
                c_surface.extend(surf)
                c_level.extend(level)
                c_ont.extend(ont)
                c_uri.extend(uri)
                c_label.extend(label)
                c_tier.extend(tier)
                c_evid.extend(evid)
                c_score.extend([None] * n)
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
                    c_url.append(url)
                    c_surface.append(sent)
                    c_level.append("CONCEPT")
                    c_ont.append("")
                    c_uri.append(None)
                    c_label.append("")
                    c_tier.append("cand")
                    c_evid.append("")
                    c_score.append(None)

        if not c_url:
            return _empty_links_table()
        return pa.table(
            {
                "url": pa.array(c_url, pa.string()),
                # low-cardinality columns dictionary-encoded: the link
                # stream crosses the object store between every stage —
                # bytes moved matter more than kernel time here
                "surface": pa.array(c_surface, pa.string()).dictionary_encode(),
                "level": pa.array(c_level, pa.string()).dictionary_encode(),
                "ontology": pa.array(c_ont, pa.string()).dictionary_encode(),
                "uri": pa.array(c_uri, pa.string()).dictionary_encode(),
                "label": pa.array(c_label, pa.string()).dictionary_encode(),
                "tier": pa.array(c_tier, pa.string()).dictionary_encode(),
                "evidence": pa.array(c_evid, pa.string()).dictionary_encode(),
                "score": pa.array(c_score, pa.float64()),
            }
        )
