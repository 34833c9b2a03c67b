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
