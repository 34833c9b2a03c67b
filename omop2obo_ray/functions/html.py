"""Deterministic HTML → text extraction.

The per-row invariant (BASELINE.json input_hint) is *byte-identical
extracted text per url*: for every page, ``extract_text(html) == text``.
The extractor is therefore pinned and versioned (EXTRACTOR_VERSION);
the manifest stores ``text_sha256`` per partition (SURVEY §7.4.7).

Rules (fixed, documented, versioned):
  1. drop ``<script>``/``<style>`` blocks and HTML comments
  2. block-level tags (p, br, div, h1-h6, li, tr, title) become ``\\n``
  3. all remaining tags are stripped
  4. HTML entities are unescaped (``&amp;`` → ``&``)
  5. each line: collapse runs of whitespace to one space, strip ends
  6. drop empty lines; join with ``\\n``
"""

from __future__ import annotations

import html as _html
import re

EXTRACTOR_VERSION = "1.0"

_SCRIPT_RE = re.compile(rb"<(script|style)\b.*?</\1\s*>", re.S | re.I)
_COMMENT_RE = re.compile(rb"<!--.*?-->", re.S)
_BLOCK_RE = re.compile(
    rb"</?(?:p|br|div|h[1-6]|li|tr|title|ul|ol|table|section|article)\b[^>]*>",
    re.I,
)
_TAG_RE = re.compile(rb"<[^>]+>")
_WS_RE = re.compile(r"\s+")


def extract_text(html_bytes: bytes) -> str:
    """Extract canonical text from raw HTML bytes (deterministic)."""
    if html_bytes is None:
        return ""
    b = _SCRIPT_RE.sub(b"", html_bytes)
    b = _COMMENT_RE.sub(b"", b)
    b = _BLOCK_RE.sub(b"\n", b)
    b = _TAG_RE.sub(b"", b)
    s = _html.unescape(b.decode("utf-8", "replace"))
    lines = []
    for line in s.split("\n"):
        line = _WS_RE.sub(" ", line).strip()
        if line:
            lines.append(line)
    return "\n".join(lines)


_ANCHOR_RE = re.compile(
    rb"<a\s[^>]*?href\s*=\s*([\"'])(.*?)\1", re.I | re.S)

_ANCHOR_CLOSE_RE = re.compile(rb"</a\s*>", re.I)


def extract_anchor_texts(html_bytes: bytes) -> list[tuple[str, str]]:
    """(href, anchor text) pairs in document order — the link-text
    evidence web-scale entity linking mines (anchor text is the classic
    mention/alias signal for the target page). Text handling matches
    :func:`extract_text`: inner tags stripped, entities unescaped,
    whitespace collapsed. Anchors with empty hrefs drop; empty texts
    survive as '' (an image link is still an edge).

    Edge-set contract: iterates the SAME open-tag matches as
    :func:`extract_anchors`, so both extractors always emit identical
    (page, href) edge sets. An anchor whose ``</a>`` never appears
    before the next href-bearing open tag (unclosed or nested markup)
    still emits its edge, with text ``''``."""
    if html_bytes is None:
        return []
    out = []
    opens = [m for m in _ANCHOR_RE.finditer(html_bytes)]
    for i, m in enumerate(opens):
        h = _html.unescape(m.group(2).decode("utf-8", "replace")).strip()
        if not h:
            continue
        txt = ""
        open_end = html_bytes.find(b">", m.end())
        nxt = (opens[i + 1].start() if i + 1 < len(opens)
               else len(html_bytes))
        if open_end != -1:
            close = _ANCHOR_CLOSE_RE.search(html_bytes, open_end + 1, nxt)
            if close is not None:
                body = _TAG_RE.sub(b"", html_bytes[open_end + 1:close.start()])
                txt = _WS_RE.sub(" ", _html.unescape(
                    body.decode("utf-8", "replace"))).strip()
        out.append((h, txt))
    return out


def extract_anchors(html_bytes: bytes) -> list[str]:
    """All anchor href targets of a page, in document order (quoted
    single or double, any attribute order, case-insensitive tag).
    Entity-unescaped like the text extractor; empty hrefs drop."""
    if html_bytes is None:
        return []
    out = []
    for _q, href in _ANCHOR_RE.findall(html_bytes):
        h = _html.unescape(href.decode("utf-8", "replace")).strip()
        if h:
            out.append(h)
    return out


def render_page_html(title: str, paragraphs: list[str]) -> bytes:
    """Deterministic page template used by the fixture generator; the
    inverse of :func:`extract_text` for tag/entity-free paragraphs."""
    body = "".join(f"<p>{_html.escape(p)}</p>" for p in paragraphs)
    return (
        f"<html><head><title>{_html.escape(title)}</title>"
        f"<script>var x=1;</script></head>"
        f"<body><!-- gen --><div>{body}</div></body></html>"
    ).encode("utf-8")


def expected_text(title: str, paragraphs: list[str]) -> str:
    """Ground-truth text for :func:`render_page_html` output."""
    lines = [_WS_RE.sub(" ", title).strip()]
    lines += [_WS_RE.sub(" ", p).strip() for p in paragraphs]
    return "\n".join(x for x in lines if x)


_TITLE_RE = re.compile(rb"<title[^>]*>(.*?)</title\s*>", re.I | re.S)
_META_RE = re.compile(
    rb"<meta\s[^>]*?name\s*=\s*([\"'])description\1[^>]*?"
    rb"content\s*=\s*([\"'])(.*?)\2", re.I | re.S)
_META_RE2 = re.compile(  # content before name (attribute order free)
    rb"<meta\s[^>]*?content\s*=\s*([\"'])(.*?)\1[^>]*?"
    rb"name\s*=\s*([\"'])description\3", re.I | re.S)
_CANON_RE = re.compile(
    rb"<link\s[^>]*?rel\s*=\s*([\"'])canonical\1[^>]*?"
    rb"href\s*=\s*([\"'])(.*?)\2", re.I | re.S)
_CANON_RE2 = re.compile(
    rb"<link\s[^>]*?href\s*=\s*([\"'])(.*?)\1[^>]*?"
    rb"rel\s*=\s*([\"'])canonical\3", re.I | re.S)
_HTML_LANG_RE = re.compile(
    rb"<html\s[^>]*?lang\s*=\s*([\"'])(.*?)\1", re.I | re.S)


def _clean_frag(b: bytes) -> str:
    s = _html.unescape(b.decode("utf-8", "replace"))
    return _WS_RE.sub(" ", s).strip()


def extract_meta(html_bytes: bytes) -> dict:
    """Head-metadata extraction — (title, meta_description,
    canonical, html_lang), each '' when absent: the page-level
    signals a crawl pipeline indexes beside the body text (canonical
    feeds URL dedup, html lang feeds/validates language id, title +
    description feed snippets and weak labels). Both attribute
    orders accepted for meta/link; text handling matches
    :func:`extract_text` (entities unescaped, whitespace
    collapsed)."""
    if html_bytes is None:
        return {"title": "", "meta_description": "", "canonical": "",
                "html_lang": ""}
    m = _TITLE_RE.search(html_bytes)
    title = _clean_frag(_TAG_RE.sub(b"", m.group(1))) if m else ""
    m = _META_RE.search(html_bytes)
    desc = _clean_frag(m.group(3)) if m else ""
    if not desc:
        m = _META_RE2.search(html_bytes)
        desc = _clean_frag(m.group(2)) if m else ""
    m = _CANON_RE.search(html_bytes)
    canon = _clean_frag(m.group(3)) if m else ""
    if not canon:
        m = _CANON_RE2.search(html_bytes)
        canon = _clean_frag(m.group(2)) if m else ""
    m = _HTML_LANG_RE.search(html_bytes)
    lang = _clean_frag(m.group(2)) if m else ""
    return {"title": title, "meta_description": desc,
            "canonical": canon, "html_lang": lang}
