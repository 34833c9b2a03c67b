"""ScorerActor — tier-3 TF-IDF cosine similarity.

Actor-pool stage holding the fitted TF-IDF index (vectorizer + l2
ontology matrix in postings layout) — built once per actor from the
broadcast lexicon, exactly the reference's T2 state
(string_similarity.py:324-326, :255-257). Per batch it:

  - passes through already-resolved link rows untouched;
  - replaces ``tier='cand'`` rows with sim link rows: top-10 cosine with
    the 0.25 absolute floor (string_similarity.py:264, :332), then the
    per-ontology max-per-class + 75th-percentile keep rule
    (``filters_matches``, string_similarity.py:180-204); evidence is the
    reference's ``URI_score(round 3)`` token (string_similarity.py:275).
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc
import ray

from omop2obo_ray.functions.textproc import preprocess_tokens
from omop2obo_ray.functions.tfidf import filters_matches
from omop2obo_ray.state.lexicon import Lexicon


class ScorerActor:
    def __init__(self, lexicon_ref, top_n: int = 10, floor: float = 0.25,
                 percentile: float = 75.0):
        self.lex: Lexicon = (
            ray.get(lexicon_ref) if isinstance(lexicon_ref, ray.ObjectRef) else lexicon_ref
        )
        self.index = self.lex.sim_index
        self.top_n = top_n
        self.floor = floor
        self.percentile = percentile

    def score_text(self, text: str) -> list[tuple[str, str, float]]:
        """→ list of (ontology, uri, score) after the per-ont filter."""
        toks = preprocess_tokens(text)
        if not toks:
            return []
        matches = self.index.top_n(toks, self.top_n, self.floor)
        out: list[tuple[str, str, float]] = []
        for ont in self.lex.ontologies:
            ont_matches = [(s, u) for s, u, o in matches if o == ont]
            if not ont_matches:
                continue
            for s, u in filters_matches(ont_matches, self.percentile):
                out.append((ont, u, s))
        return out

    def __call__(self, batch: pa.Table) -> pa.Table:
        is_cand = pc.equal(batch["tier"], "cand")
        passthrough = batch.filter(pc.invert(is_cand))
        cands = batch.filter(is_cand)
        if cands.num_rows == 0:
            return passthrough

        cols: dict[str, list] = {c: [] for c in batch.column_names}
        labels = self.lex.labels
        for url, sent in zip(cands["url"].to_pylist(), cands["surface"].to_pylist()):
            for ont, uri, score in self.score_text(sent):
                cols["url"].append(url)
                cols["surface"].append(sent)
                cols["level"].append("CONCEPT")
                cols["ontology"].append(ont)
                cols["uri"].append(uri)
                cols["label"].append(labels.get(uri, ""))
                cols["tier"].append("sim")
                cols["evidence"].append(f"{uri}_{round(score, 3)}")
                cols["score"].append(float(score))
        if not cols["url"]:
            return passthrough
        arrays = {}
        for name in batch.column_names:
            ftype = batch.schema.field(name).type
            arr = pa.array(cols[name],
                           type=ftype if not pa.types.is_dictionary(ftype) else None)
            if pa.types.is_dictionary(ftype):
                arr = arr.cast(ftype.value_type).dictionary_encode()
            arrays[name] = arr
        sim_table = pa.table(
            {n: arrays[n].cast(batch.schema.field(n).type)
             if not pa.types.is_dictionary(batch.schema.field(n).type) else arrays[n]
             for n in batch.column_names}
        )
        return pa.concat_tables(
            [passthrough, sim_table], promote_options="permissive"
        )
