"""Text-extraction stage (read → map_batches → …).

Stateless ``map_batches`` kernel over zero-copy Arrow batches: decodes
``html`` (large_binary) to canonical text with the pinned extractor and
enforces the byte-identical per-url invariant against the ``text``
column when present (BASELINE.json input_hint). Emits a slim
``(url, text, lang, text_sha256, text_ok)`` table — the html payload is
dropped as early as possible so downstream blocks stay small (prune at
the read + project early, SURVEY §4).
"""

from __future__ import annotations

import hashlib

import pyarrow as pa

from omop2obo_ray.functions.html import extract_text


def extract_text_batch(batch: pa.Table) -> pa.Table:
    urls = batch["url"].to_pylist()
    langs = batch["lang"].to_pylist() if "lang" in batch.column_names else [""] * len(urls)
    htmls = batch["html"].to_pylist() if "html" in batch.column_names else [None] * len(urls)
    given = batch["text"].to_pylist() if "text" in batch.column_names else [None] * len(urls)

    texts, shas, oks = [], [], []
    for h, g in zip(htmls, given):
        if h is not None:
            t = extract_text(h)
        else:
            t = g or ""
        texts.append(t)
        shas.append(hashlib.sha256(t.encode("utf-8", "surrogatepass")).hexdigest())
        oks.append(g is None or t == g)
    return pa.table(
        {
            "url": pa.array(urls, pa.string()),
            "text": pa.array(texts, pa.large_string()),
            "lang": pa.array(langs, pa.string()),
            "text_sha256": pa.array(shas, pa.string()),
            "text_ok": pa.array(oks, pa.bool_()),
        }
    )


def lang_filter_batch(batch: pa.Table, languages: tuple[str, ...]) -> pa.Table:
    """English-only filter, mirroring the reference's ``LANG=='ENG'``
    MRCONSO filter applied to its input rows
    (clinical_concept_annotator.py:163)."""
    import pyarrow.compute as pc

    return batch.filter(pc.is_in(batch["lang"], value_set=pa.array(list(languages))))
