"""Pure-Python Aho-Corasick automaton for batched mention detection.

Built ONCE per linker actor in ``__init__`` over every lexicon surface
form (labels + synonyms + alias surfaces), then scanned per batch —
the stateful-actor-pool pattern the north_star prescribes. No external
automaton package exists in this environment, so this is a compact
array-based implementation (goto as per-state dicts, BFS failure links,
merged output sets).

Matches are filtered to *token boundaries* (both ends) so a surface form
never fires inside a longer word (``lace`` !< ``necklace``); the
reference's exact string matcher (clinical_concept_annotator.py:310-328)
matches whole normalized strings, and boundary-checked substring hits are
the web-page analogue (SURVEY §2.4 J6).
"""

from __future__ import annotations


def _is_word(ch: str) -> bool:
    return ch.isalnum() or ch == "_"


class AhoCorasick:
    __slots__ = ("goto", "fail", "out", "_built")

    def __init__(self, patterns: list[str] | None = None):
        # state 0 = root
        self.goto: list[dict[str, int]] = [{}]
        self.fail: list[int] = [0]
        self.out: list[tuple[int, ...]] = [()]  # pattern lengths ending here
        self._built = False
        if patterns is not None:
            for p in patterns:
                self.add(p)
            self.build()  # building an empty trie is valid (scan → [])

    def add(self, pattern: str) -> None:
        if not pattern:
            return
        node = 0
        for ch in pattern:
            nxt = self.goto[node].get(ch)
            if nxt is None:
                nxt = len(self.goto)
                self.goto[node][ch] = nxt
                self.goto.append({})
                self.fail.append(0)
                self.out.append(())
            node = nxt
        if len(pattern) not in self.out[node]:
            self.out[node] = self.out[node] + (len(pattern),)

    def build(self) -> None:
        """BFS failure links; merge output sets along failure chains."""
        from collections import deque

        q: deque[int] = deque()
        for child in self.goto[0].values():
            self.fail[child] = 0
            q.append(child)
        while q:
            node = q.popleft()
            for ch, child in self.goto[node].items():
                q.append(child)
                f = self.fail[node]
                while f and ch not in self.goto[f]:
                    f = self.fail[f]
                self.fail[child] = self.goto[f].get(ch, 0)
                if self.fail[child] == child:
                    self.fail[child] = 0
                if self.out[self.fail[child]]:
                    self.out[child] = self.out[child] + self.out[self.fail[child]]
        self._built = True

    def scan(self, text: str, word_boundaries: bool = True) -> list[tuple[int, int]]:
        """Yield ``(start, end)`` spans (end exclusive) of every pattern
        occurrence in ``text``; boundary-checked when requested."""
        assert self._built, "call build() first"
        goto, fail, out = self.goto, self.fail, self.out
        node = 0
        hits: list[tuple[int, int]] = []
        n = len(text)
        for i in range(n):
            ch = text[i]
            while node and ch not in goto[node]:
                node = fail[node]
            node = goto[node].get(ch, 0)
            lens = out[node]
            if lens:
                for plen in lens:
                    start = i - plen + 1
                    if word_boundaries:
                        if start > 0 and _is_word(text[start - 1]) and _is_word(text[start]):
                            continue
                        if i + 1 < n and _is_word(text[i]) and _is_word(text[i + 1]):
                            continue
                    hits.append((start, i + 1))
        return hits

    def longest_nonoverlapping(self, text: str) -> list[tuple[int, int]]:
        """Greedy leftmost-longest selection over :meth:`scan` hits —
        deterministic mention segmentation."""
        hits = sorted(self.scan(text), key=lambda se: (se[0], -(se[1] - se[0])))
        chosen: list[tuple[int, int]] = []
        last_end = -1
        for s, e in hits:
            if s >= last_end:
                chosen.append((s, e))
                last_end = e
        return chosen


class RegexScanner:
    """C-speed alternation scanner for small/medium pattern sets.

    A compiled ``re`` alternation with alternatives sorted longest-first
    and token-boundary lookarounds produces exactly the greedy
    leftmost-longest non-overlapping segmentation of
    :meth:`AhoCorasick.longest_nonoverlapping` (finditer advances past
    each match, matching the longest alternative at each position).
    Python's regex engine degrades on huge alternations, so
    :func:`make_scanner` switches to the automaton past a threshold.
    """

    def __init__(self, patterns: list[str]):
        import re as _re

        alts = sorted((p for p in patterns if p), key=len, reverse=True)
        if alts:
            self._re = _re.compile(
                r"(?<![\w])(?:" + "|".join(_re.escape(p) for p in alts) + r")(?![\w])"
            )
        else:
            self._re = None

    def longest_nonoverlapping(self, text: str) -> list[tuple[int, int]]:
        if self._re is None:
            return []
        return [(m.start(), m.end()) for m in self._re.finditer(text)]


# above this many patterns the backtracking alternation loses to the
# linear automaton (empirical; both paths are semantics-identical)
REGEX_SCANNER_MAX_PATTERNS = 2000


def make_scanner(patterns: list[str]):
    """Pick the mention scanner for a pattern set: compiled-regex
    alternation (C loop) for small/medium lexicons, Aho-Corasick for
    large ones."""
    if len(patterns) <= REGEX_SCANNER_MAX_PATTERNS:
        return RegexScanner(patterns)
    return AhoCorasick(patterns)
