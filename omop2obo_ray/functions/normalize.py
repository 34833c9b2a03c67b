"""Source-code / identifier normalization.

Re-implements the semantics of the reference's ``normalizes_source_codes``
(data_utils.py:236-275) and ``normalizes_clinical_source_codes``
(data_utils.py:351-378) as vectorized batch kernels:

  - ``ICD10CM:C85.92``  → ``icd10cm-normalized-prefix:c85.92`` (prefix via map)
  - ``http://www.snomedbrowser.com/codes/details/121323`` → ``snomed:121323``
  - ``http://www.orpha.net/ordo/orphanet_1920`` → ``orphanet:1920``

The reference splits each identifier on ``[_:|/]`` (``[:|/]`` when no
``http``+``_``), takes the LAST non-empty token as the id, strips it (plus one
separator char) off the tail to get the prefix, lowercases the id, maps the
prefix through the vocab dictionary, and re-concatenates ``prefix:id``.
"""

from __future__ import annotations

import re
from collections.abc import Iterable

_SPLIT_URL = re.compile(r"[_:|/]")
_SPLIT_PLAIN = re.compile(r"[:|/]")


def normalize_source_code(code: str, vocab: dict[str, str]) -> str:
    """Normalize one raw identifier. Faithful to data_utils.py:259-273."""
    if code is None or code == "":
        return ""
    splitter = _SPLIT_URL if ("http" in code and "_" in code) else _SPLIT_PLAIN
    parts = [x for x in splitter.split(code) if x != ""]
    if not parts:
        return code.lower()
    id_num = parts[-1]
    # strip id + one trailing separator off to recover the prefix
    prefix = code.rstrip(id_num)[:-1] if len(code) > len(id_num) else ""
    prefix = vocab.get(prefix, prefix)
    return f"{prefix}:{id_num.lower()}"


def normalize_source_codes(codes: Iterable[str], vocab: dict[str, str]) -> list[str]:
    """Batch form — used inside ``map_batches`` and the lexicon build."""
    return [normalize_source_code(c, vocab) for c in codes]


def build_vocab_dict(
    primary: Iterable[str], abbreviation_lists: Iterable[Iterable[str]]
) -> dict[str, str]:
    """Build ``alias-prefix → canonical-prefix`` from the vocab_map table.

    Mirrors clinical_concept_annotator.py:78-85 (``source_code_map`` ctor):
    every alias in the ``abbreviations`` list maps to the primary
    abbreviation; the primary maps to itself.
    """
    out: dict[str, str] = {}
    for prim, aliases in zip(primary, abbreviation_lists):
        out[prim] = prim
        for a in list(aliases) if aliases is not None else []:
            out[a] = prim
    return out
