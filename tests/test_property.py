"""Property-based checks (hypothesis) for the core text kernels."""

from __future__ import annotations

import re

from hypothesis import given, settings
from hypothesis import strategies as st

from omop2obo_ray.functions.aho import AhoCorasick
from omop2obo_ray.functions.html import expected_text, extract_text, render_page_html
from omop2obo_ray.functions.normalize import normalize_source_code

words = st.text(alphabet="abcdef", min_size=1, max_size=4)
phrases = st.lists(words, min_size=1, max_size=3).map(" ".join)


@settings(max_examples=60, deadline=None)
@given(st.lists(phrases, min_size=1, max_size=8, unique=True),
       st.lists(words, min_size=1, max_size=20).map(" ".join))
def test_aho_matches_regex_reference(patterns, text):
    """Boundary-checked automaton hits == regex word-boundary hits."""
    ac = AhoCorasick(patterns)
    got = {(s, e) for s, e in ac.scan(text)}
    want = set()
    for p in patterns:
        # lookahead wrapper → OVERLAPPING occurrences (scan returns all)
        for m in re.finditer(r"(?=(?<![\w])" + re.escape(p) + r"(?![\w]))", text):
            want.add((m.start(), m.start() + len(p)))
    assert got == want


@settings(max_examples=60, deadline=None)
@given(st.lists(phrases, min_size=1, max_size=8, unique=True),
       st.lists(words, min_size=1, max_size=20).map(" ".join))
def test_regex_scanner_equals_automaton(patterns, text):
    """Both scanner implementations segment identically (word-bounded
    phrase patterns, the lexicon's shape)."""
    from omop2obo_ray.functions.aho import RegexScanner

    ac = AhoCorasick(patterns)
    rs = RegexScanner(patterns)
    assert rs.longest_nonoverlapping(text) == ac.longest_nonoverlapping(text)


@settings(max_examples=60, deadline=None)
@given(st.lists(st.text(
    alphabet=st.characters(blacklist_categories=("Cs", "Cc")),
    min_size=0, max_size=40), min_size=1, max_size=4),
    st.text(alphabet="abc DEF123", min_size=0, max_size=20))
def test_html_roundtrip_property(paragraphs, title):
    """render → extract is the identity on whitespace-normalized text
    for ANY tag-free content (the byte-identical invariant)."""
    html = render_page_html(title, paragraphs)
    assert extract_text(html) == expected_text(title, paragraphs)


@settings(max_examples=100, deadline=None)
@given(st.from_regex(r"[A-Za-z]{1,8}:[A-Za-z0-9.]{1,8}", fullmatch=True))
def test_normalize_idempotent_shape(code):
    """Normalized codes always come out as ``prefix:lowered-id``."""
    out = normalize_source_code(code, {})
    assert ":" in out
    assert out.rsplit(":", 1)[1] == out.rsplit(":", 1)[1].lower()


@settings(max_examples=80, deadline=None)
@given(st.lists(st.lists(words, min_size=1, max_size=30).map(" ".join),
                min_size=2, max_size=6))
def test_simhash_triangle_and_band_recall(texts):
    """(a) Simhash hamming obeys the triangle inequality (it is a
    metric on the 64-bit codes); (b) pigeonhole: any pair within
    hamming ≤ C−1 shares at least one of C chunk keys — the exact
    recall bound simhash_near_pairs relies on."""
    import numpy as np

    from omop2obo_ray.pipelines.textpipe import SimHasher

    sh = SimHasher()
    sigs = [sh.simhash(t) for t in texts]

    def ham(a, b):
        return bin(a ^ b).count("1")

    for i in range(len(sigs)):
        for j in range(i + 1, len(sigs)):
            for k in range(len(sigs)):
                assert ham(sigs[i], sigs[j]) <= ham(sigs[i], sigs[k]) + ham(sigs[k], sigs[j])
    C = 4
    width = 64 // C
    for i in range(len(sigs)):
        for j in range(i + 1, len(sigs)):
            if ham(sigs[i], sigs[j]) <= C - 1:
                chunks_i = [(sigs[i] >> (width * b)) & ((1 << (64 - width * b if b == C - 1 else width)) - 1) for b in range(C)]
                chunks_j = [(sigs[j] >> (width * b)) & ((1 << (64 - width * b if b == C - 1 else width)) - 1) for b in range(C)]
                assert any(a == b for a, b in zip(chunks_i, chunks_j)), \
                    "pigeonhole violated"


@settings(max_examples=60, deadline=None)
@given(st.lists(words, min_size=1, max_size=40).map(" ".join),
       st.lists(words, min_size=1, max_size=40).map(" ".join))
def test_minhash_signature_estimates_jaccard_bounds(a, b):
    """Minhash agreement fraction is a [0,1] estimator that is exact at
    the extremes: identical shingle sets → all rows agree; disjoint
    sets → (with 64 rows over tiny universes) agreement only where a
    shared minimum exists — never asserts false certainty of equality."""
    import numpy as np

    from omop2obo_ray.pipelines.textpipe import MinHasher

    mh = MinHasher()
    sa, sb = set(mh.shingles(a).tolist()), set(mh.shingles(b).tolist())
    siga, sigb = mh.signature(a), mh.signature(b)
    agree = float((siga == sigb).mean())
    if sa == sb:
        assert agree == 1.0
    if agree == 1.0 and len(sa) > 3 and len(sb) > 3:
        # 64 agreeing independent min-hashes on >3-element sets is
        # overwhelming evidence of heavy overlap; exact disjointness
        # would make full agreement essentially impossible
        assert sa & sb, "64/64 minhash agreement on disjoint shingle sets"


@settings(max_examples=100, deadline=None)
@given(st.lists(st.integers(min_value=0, max_value=2**63 - 1),
                min_size=1, max_size=50))
def test_popcount64_matches_python(vals):
    import numpy as np

    from omop2obo_ray.pipelines.textpipe import _popcount64

    arr = np.asarray(vals, dtype=np.uint64)
    got = _popcount64(arr)
    want = [bin(v).count("1") for v in vals]
    assert got.tolist() == want


@settings(max_examples=50, deadline=None)
@given(st.lists(st.tuples(st.integers(0, 30), st.integers(0, 30)),
                min_size=0, max_size=25))
def test_union_find_clusters_are_connected_components(edges):
    """dup_clusters output == networkx-free reference components:
    every member maps to the min id of its reachable set."""
    import pandas as pd

    from omop2obo_ray.pipelines.textpipe import dup_clusters

    edges = [(a, b) for a, b in edges if a != b]
    if not edges:
        return
    df = pd.DataFrame({"doc_a": [e[0] for e in edges],
                       "doc_b": [e[1] for e in edges]})
    out = dup_clusters(df)
    got = dict(zip(out["doc_id"], out["cluster_id"]))
    # reference: BFS components
    adj: dict[int, set[int]] = {}
    for a, b in edges:
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    seen: set[int] = set()
    for start in sorted(adj):
        if start in seen:
            continue
        comp, stack = set(), [start]
        while stack:
            x = stack.pop()
            if x in comp:
                continue
            comp.add(x)
            stack.extend(adj[x] - comp)
        seen |= comp
        rep = min(comp)
        for m in comp:
            assert got[m] == rep
