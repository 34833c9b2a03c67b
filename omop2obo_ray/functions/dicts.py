"""Dictionary-merge utilities (A4 — ``merge_dictionaries``,
data_utils.py:278-302)."""

from __future__ import annotations


def merge_dictionaries(dictionaries: dict, key_type: str,
                       reverse: bool = False) -> dict:
    """Union of the ``key_type`` inner dicts across ontologies;
    LAST-WINS on key collisions (dict.update order = iteration order of
    ``dictionaries``), optionally with keys/values swapped — faithful to
    data_utils.py:278-302, where the reference merges per-ontology
    ``label``/``dbxref``/``synonym`` maps into one lookup table."""
    combined: dict = {}
    for ont_dicts in dictionaries.values():
        inner = ont_dicts.get(key_type, {})
        if reverse:
            combined.update({v: k for k, v in inner.items()})
        else:
            combined.update(inner)
    return combined
