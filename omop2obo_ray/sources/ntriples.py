"""N-Triples sink and source — the KG interchange format the triples
this engine materializes are published in (W3C N-Triples: one
``<subj> <pred> <obj> .`` line per triple, UTF-8, literal escaping for
``\\ " \\n \\r \\t``). The reference serializes its mapping output to
CSV/pickle only; N-Triples is the graph-ecosystem-facing equivalent
(loadable by any RDF store), added as a first-class sink/source.

Scale shape:

- **Writer**: each ``map_batches`` task serializes its block with
  vectorized ``pyarrow.compute`` string kernels (escape = 5 sequential
  ``replace_substring`` passes — backslash FIRST, then the single-char
  escapes — join = one ``binary_join_element_wise``) and writes ONE
  part file; the driver only sees the per-task (path, rows) manifest
  rows. Partitioned output → resumable/parallel loads, never one
  giant file.
- **Reader**: ``ray.data.read_text`` streams lines; parsing is one
  RE2 ``pc.extract_regex`` per batch. Unescaping takes a vectorized
  fast path (lines with no backslash — the overwhelming majority of
  web text — are returned zero-copy) and a per-row regex substitution
  only for the rows that actually contain escapes (sequential
  ``replace_substring`` CANNOT unescape correctly: ``\\\\n`` must stay
  a literal backslash + n, which requires a left-to-right scan).

Objects are IRIs when they match ``scheme://`` / ``urn:`` shapes,
typed literals otherwise; the reader returns ``obj_is_iri`` so a
round trip is lossless.
"""

from __future__ import annotations

import os
import re
import uuid

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

import ray
from ray.data import Dataset

# escape table (writer order: backslash first, then single chars)
_ESCAPES = [("\\", "\\\\"), ('"', '\\"'), ("\n", "\\n"),
            ("\r", "\\r"), ("\t", "\\t")]
_UNESCAPE_RE = re.compile(r"\\(.)")
_UNESCAPE_MAP = {"\\": "\\", '"': '"', "n": "\n", "r": "\r", "t": "\t"}
# object position: IRI if it looks like an absolute IRI
_IRI_RE = re.compile(r"^[A-Za-z][A-Za-z0-9+.\-]*:")
# one triple line; two patterns because pyarrow's extract_regex fills
# non-participating alternation groups with "" (not null) — the
# struct-level validity of each whole-pattern match is the reliable
# IRI-vs-literal discriminator
_LINE_IRI_RE = r'^<(?P<s>[^>]*)> <(?P<p>[^>]*)> <(?P<o>[^>]*)> \.$'
_LINE_LIT_RE = (r'^<(?P<s>[^>]*)> <(?P<p>[^>]*)> '
                r'"(?P<o>(?:[^"\\]|\\.)*)" \.$')


def _escape_literal(arr: pa.ChunkedArray | pa.Array) -> pa.Array:
    for raw, esc in _ESCAPES:
        arr = pc.replace_substring(arr, pattern=raw, replacement=esc)
    return arr.combine_chunks() if isinstance(arr, pa.ChunkedArray) else arr


def _unescape_array(arr: pa.Array) -> pa.Array:
    """Fast path: rows without a backslash pass through untouched;
    only escaped rows take the per-row left-to-right substitution."""
    has_esc = pc.fill_null(pc.match_substring(arr, "\\"), False)
    if not pc.any(has_esc).as_py():
        return arr
    vals = arr.to_pylist()
    idx = np.flatnonzero(has_esc.to_numpy(zero_copy_only=False))
    for i in idx:
        vals[i] = _UNESCAPE_RE.sub(
            lambda m: _UNESCAPE_MAP.get(m.group(1), m.group(1)), vals[i])
    return pa.array(vals, pa.string())


def write_ntriples(triples: Dataset, out_dir: str, *,
                   subj_col: str = "subject", pred_col: str = "predicate",
                   obj_col: str = "object") -> pd.DataFrame:
    """Serialize to partitioned ``part-*.nt`` files under ``out_dir``;
    returns the (path, rows) manifest frame (one row per part file —
    driver state bounded by task count). Subjects/predicates are
    written as IRIs; objects that match an absolute-IRI shape are
    IRIs, everything else is an escaped literal."""
    os.makedirs(out_dir, exist_ok=True)

    def _write(batch: pa.Table) -> pa.Table:
        if len(batch) == 0:
            return pa.table({"path": pa.array([], pa.string()),
                             "rows": pa.array([], pa.int64())})
        s = batch[subj_col].combine_chunks()
        p = batch[pred_col].combine_chunks()
        o = batch[obj_col].combine_chunks()
        is_iri = pc.match_substring_regex(o, _IRI_RE.pattern)
        o_iri = pc.binary_join_element_wise("<", o, ">", "")
        o_lit = pc.binary_join_element_wise(
            '"', _escape_literal(o), '"', "")
        o_repr = pc.if_else(is_iri, o_iri, o_lit)
        lines = pc.binary_join_element_wise(
            "<", s, "> <", p, "> ", o_repr, " .\n", "")
        payload = "".join(lines.to_pylist()).encode("utf-8")
        path = os.path.join(out_dir, f"part-{uuid.uuid4().hex}.nt")
        tmp = path + ".tmp"
        with open(tmp, "wb") as f:
            f.write(payload)
        os.replace(tmp, path)  # atomic publish
        return pa.table({"path": pa.array([path]),
                         "rows": pa.array([len(batch)], pa.int64())})

    return triples.map_batches(_write, batch_format="pyarrow",
                               batch_size=None).to_pandas()


def read_ntriples(path: str) -> Dataset:
    """Parse ``.nt`` files (a directory of parts or one file) back to
    (subject, predicate, object, obj_is_iri). Streaming: read_text →
    one RE2 extract per batch; malformed/comment lines raise (the
    writer never emits them, and silent drops would break round-trip
    identity)."""

    _empty = pa.schema([("subject", pa.string()),
                        ("predicate", pa.string()),
                        ("object", pa.string()),
                        ("obj_is_iri", pa.bool_())])

    def _parse(batch: pa.Table) -> pa.Table:
        col = batch["text"].combine_chunks()
        # read_text already strips newlines; skip blank/comment lines
        keep = pc.and_(
            pc.greater(pc.utf8_length(col), 0),
            pc.invert(pc.starts_with(col, "#")))
        col = col.filter(keep)
        if len(col) == 0:
            return _empty.empty_table()

        def _st(pattern):
            st = pc.extract_regex(col, pattern)
            return st.combine_chunks() if isinstance(
                st, pa.ChunkedArray) else st

        iri, lit = _st(_LINE_IRI_RE), _st(_LINE_LIT_RE)
        is_iri = pc.is_valid(iri)
        is_lit = pc.is_valid(lit)
        bad_mask = pc.invert(pc.or_(is_iri, is_lit))
        if pc.any(bad_mask).as_py():
            bad = col.filter(bad_mask).slice(0, 3).to_pylist()
            raise ValueError(f"malformed N-Triples line(s): {bad!r}")
        obj = pc.if_else(is_iri, iri.field("o"),
                         _unescape_array(lit.field("o")))
        return pa.table({
            "subject": pc.if_else(is_iri, iri.field("s"), lit.field("s")),
            "predicate": pc.if_else(is_iri, iri.field("p"), lit.field("p")),
            "object": obj, "obj_is_iri": is_iri})

    return ray.data.read_text(path).map_batches(
        _parse, batch_format="pyarrow", batch_size=None)
