"""Flagship pipeline over the driver testdata: KG construction on the
``documents`` table treated as web pages.

A small ontology is derived deterministically from the corpus vocabulary
(top tokens become class labels, with a binary-tree ancestor DAG), the
documents are wrapped in the canonical HTML template, and the full
tiered pipeline runs end-to-end: extract (byte-identical) → Aho-Corasick
linking → TF-IDF scoring → canonicalization → triples. Used by
``__ray_entry__.entry()`` (smoke at sf0.001) and by ``bench.py``.
"""

from __future__ import annotations

import datetime as _dt

import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray.data as rd
from ray.data import Dataset

from omop2obo_ray.config import DEFAULT_CONFIG, PipelineConfig
from omop2obo_ray.functions.html import expected_text, render_page_html
from omop2obo_ray.state.lexicon import Lexicon, build_lexicon


def derive_lexicon_from_corpus(sf_dir: str, n_classes: int = 48,
                               ontologies: tuple[str, ...] = ("hp",)) -> Lexicon:
    """Build a deterministic ontology whose labels are the corpus's most
    frequent tokens. The count is the cluster-side top-k shape
    (per-batch ``value_counts`` combiner → coarse merge → sort+limit):
    the corpus VOCABULARY (10⁷⁺ on a real web corpus) never reaches the
    driver — only the ``n_classes`` winners do."""
    from omop2obo_ray.functions.shuffle import coarse_aggregate

    docs = rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["text"])

    def partial(batch: pa.Table) -> pa.Table:
        vc = pc.list_flatten(pc.split_pattern(batch["text"], " ")).value_counts()
        return pa.table({"token": vc.field("values"),
                         "n": vc.field("counts").cast(pa.int64())})

    counts = coarse_aggregate(
        docs.map_batches(partial, batch_format="pyarrow"),
        ["token"],
        lambda df: df.groupby("token", sort=False)["n"].sum().reset_index())
    # (n DESC, token ASC) = the deterministic tie rule of the original
    # driver-side sort_values selection
    top = sorted(counts.sort(["n", "token"], descending=[True, False])
                 .limit(n_classes).to_pandas()["token"].tolist())

    ont = ontologies[0]
    obo = "http://purl.obolibrary.org/obo/"
    concepts, ancestors = [], []
    for i, tok in enumerate(top, start=1):
        uri = f"{obo}{ont.upper()}_{i:07d}"
        concepts.append((ont, uri, "label", tok, "rdfs:label", False))
        if i > 1:
            ancestors.append((uri, f"{obo}{ont.upper()}_{i // 2:07d}"))
    return build_lexicon(
        concepts=pd.DataFrame(
            concepts, columns=["ontology", "uri", "kind", "value", "value_type", "deprecated"]
        ),
        dbxrefs=pd.DataFrame(columns=["ontology", "uri", "code", "xref_type"]),
        aliases=pd.DataFrame(columns=["cui", "lang", "sab", "code", "surface"]),
        semtypes=pd.DataFrame(columns=["cui", "sty"]),
        ancestors=pd.DataFrame(ancestors, columns=["child_uri", "parent_uri"]),
        vocab_map=pd.DataFrame(
            [("snomed", ["SNOMEDCT_US"])], columns=["primary_abbreviation", "abbreviations"]
        ),
        ontologies=(ont,),
    )


def documents_as_pages(sf_dir: str, repeat: int = 1,
                       dup_urls: bool = False) -> Dataset:
    """documents → pages (input_hint shape) with the canonical HTML
    template, so the byte-identical extraction invariant is exercised.

    ``repeat`` deterministically replicates every document under
    distinct urls (``…/doc/{i}?r={k}``) — used by the scaling benchmark
    to grow the same input so compute dominates fixed startup cost.
    ``dup_urls=True`` makes consecutive repeat pairs SHARE a url
    (identical content), producing a 50%-duplicate crawl — the input
    shape the bucketed-assembly fallback + pre-shuffle dedup exist
    for (VERDICT r4 #7)."""
    docs = rd.read_parquet(f"{sf_dir}/documents.parquet",
                           columns=["doc_id", "text", "lang"])
    epoch = _dt.datetime(2024, 1, 1)

    def to_pages(batch: pa.Table) -> pa.Table:
        ids = batch["doc_id"].to_pylist()
        texts = batch["text"].to_pylist()
        langs = batch["lang"].to_pylist()
        urls, tss, htmls, out_texts, out_langs = [], [], [], [], []
        for r in range(repeat):
            rr = r // 2 if dup_urls else r
            suffix = "" if rr == 0 else f"?r={rr}"
            for i, t, lg in zip(ids, texts, langs):
                title = f"doc {i}"
                urls.append(f"https://testdata.local/doc/{i}{suffix}")
                tss.append(epoch + _dt.timedelta(seconds=int(i)))
                htmls.append(render_page_html(title, [t or ""]))
                out_texts.append(expected_text(title, [t or ""]))
                out_langs.append(lg)
        return pa.table(
            {
                "url": pa.array(urls, pa.string()),
                "warc_ts": pa.array(tss, pa.timestamp("us")),
                "html": pa.array(htmls, pa.large_binary()),
                "text": pa.array(out_texts, pa.large_string()),
                "lang": pa.array(out_langs, pa.string()),
            }
        )

    # small batches → many downstream tasks (the fused page→link chain
    # inherits this granularity; parallelism is bounded by #batches);
    # adaptive to repeat so output stays ~2-4k pages per task
    bs = max(16, 256 // max(1, repeat))
    return docs.map_batches(to_pages, batch_format="pyarrow", batch_size=bs)


def kg_over_documents(sf_dir: str, cfg: PipelineConfig | None = None,
                      lexicon: Lexicon | None = None, repeat: int = 1,
                      cfg_overrides: dict | None = None,
                      dup_urls: bool = False) -> Dataset:
    """Full flagship: documents-as-pages → tiered linking → triples.

    All languages are admitted (the documents table is multi-lingual by
    construction; the ``lang`` filter is exercised by the KG fixture
    tests instead)."""
    from omop2obo_ray.pipelines.kg import build_kg

    cfg = cfg or DEFAULT_CONFIG.with_(
        languages=("en", "de", "es", "fr", "zh", ""),
        # corpus-derived single-token lexicon: similarity tier adds cost
        # but no new links (every candidate token is already tier-1) —
        # keep a small candidate cap
        sim_max_candidates_per_page=2,
        # task granularity is set by the (fused) linker batch size in
        # INPUT doc rows; shrink it as repeat grows so the page count
        # per task stays ~1-2k and parallelism scales with the cluster
        link_batch_size=max(8, 256 // max(1, repeat)),
    )
    if cfg_overrides:
        cfg = cfg.with_(**cfg_overrides)
    lexicon = lexicon or derive_lexicon_from_corpus(sf_dir)
    pages = documents_as_pages(sf_dir, repeat=repeat,
                               dup_urls=dup_urls)
    return build_kg(pages, lexicon, cfg)
