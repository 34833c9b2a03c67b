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

from omop2obo_ray.functions.aho import AhoCorasick
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
    def __init__(self, lexicon_ref, max_sim_candidates: int = 8):
        # lexicon_ref may be a Lexicon (tests) or a ray ObjectRef (pipeline)
        self.lex: Lexicon = (
            ray.get(lexicon_ref) if isinstance(lexicon_ref, ray.ObjectRef) else lexicon_ref
        )
        self.automaton = AhoCorasick(self.lex.patterns)
        # unigram vocabulary of the sim corpus, for cheap candidate pre-filter
        self.sim_vocab = {t for t in self.lex.sim_index.vocab if " " not in t}
        self.max_sim_candidates = max_sim_candidates

    def __call__(self, batch: pa.Table) -> pa.Table:
        urls = batch["url"].to_pylist()
        texts = batch["text"].to_pylist()
        out: dict[str, list] = {c: [] for c in LINK_COLS}

        def emit(url, surface, level, ont, uri, label, tier, evidence, score=None):
            out["url"].append(url)
            out["surface"].append(surface)
            out["level"].append(level)
            out["ontology"].append(ont)
            out["uri"].append(uri)
            out["label"].append(label)
            out["tier"].append(tier)
            out["evidence"].append(evidence)
            out["score"].append(score)

        labels = self.lex.labels
        surface_links = self.lex.surface_links
        for url, text in zip(urls, texts):
            low = (text or "").lower()
            spans = self.automaton.longest_nonoverlapping(low)
            covered: list[tuple[int, int]] = []
            for s, e in spans:
                surface = low[s:e]
                links = surface_links.get(surface)
                if not links:
                    continue
                covered.append((s, e))
                for level, ont, uri, tier, evidence in links:
                    emit(url, surface, level, ont, uri, labels.get(uri, ""), tier, evidence)
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
                emit(url, sent, "CONCEPT", "", None, "", "cand", "", None)

        if not out["url"]:
            return _empty_links_table()
        return pa.table(
            {
                "url": pa.array(out["url"], pa.string()),
                "surface": pa.array(out["surface"], pa.string()),
                "level": pa.array(out["level"], pa.string()),
                "ontology": pa.array(out["ontology"], pa.string()),
                "uri": pa.array(out["uri"], pa.string()),
                "label": pa.array(out["label"], pa.string()),
                "tier": pa.array(out["tier"], pa.string()),
                "evidence": pa.array(out["evidence"], pa.string()),
                "score": pa.array(out["score"], pa.float64()),
            }
        )
