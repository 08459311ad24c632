"""Aho-Corasick multi-pattern substring automaton (north star: the
gazetteer matcher's phrase path).

Used as the PREFILTER for phrase surfaces when the phrase dictionary is
large: one pass over the text reports which patterns occur as
substrings, replacing the O(patterns × text) loop of per-pattern
``key in text`` checks. Exact spans are still recovered by the same
compiled per-surface regex as before (word-boundary semantics live
there), so switching prefilters cannot change match semantics — the
hypothesis property suite pins this.

Pure Python by design: the automaton is built once on the driver,
pickled into the broadcast, and walked char-by-char on executors. The
crossover vs the linear loop is ~64 patterns (C-speed ``in`` wins below
that; the per-char Python walk is pattern-count-independent above it) —
``matcher.AC_MIN_PHRASES`` applies it only past the crossover.
"""

from __future__ import annotations

from collections import deque


class AhoCorasick:
    """Classic goto/fail/output automaton over a list of patterns.

    ``find_keys(text)`` returns the set of patterns present in ``text``
    as substrings. Plain list/dict state — picklable, no per-process
    rebuild.
    """

    __slots__ = ("patterns", "_goto", "_fail", "_out")

    def __init__(self, patterns: list[str]):
        self.patterns = [p for p in dict.fromkeys(patterns) if p]
        self._goto: list[dict[str, int]] = [{}]
        self._out: list[tuple[int, ...]] = [()]
        for idx, pat in enumerate(self.patterns):
            node = 0
            for ch in pat:
                nxt = self._goto[node].get(ch)
                if nxt is None:
                    self._goto.append({})
                    self._out.append(())
                    nxt = len(self._goto) - 1
                    self._goto[node][ch] = nxt
                node = nxt
            self._out[node] = self._out[node] + (idx,)
        self._fail = [0] * len(self._goto)
        q: deque[int] = deque()
        for nxt in self._goto[0].values():
            q.append(nxt)
        while q:
            u = q.popleft()
            for ch, v in self._goto[u].items():
                q.append(v)
                f = self._fail[u]
                while f and ch not in self._goto[f]:
                    f = self._fail[f]
                cand = self._goto[f].get(ch, 0)
                self._fail[v] = cand if cand != v else 0
                if self._out[self._fail[v]]:
                    self._out[v] = self._out[v] + self._out[self._fail[v]]

    def find_keys(self, text: str) -> set[str]:
        """Distinct patterns occurring in ``text`` (substring semantics)."""
        goto, fail, out = self._goto, self._fail, self._out
        pats = self.patterns
        node = 0
        found: set[str] = set()
        for ch in text:
            while node and ch not in goto[node]:
                node = fail[node]
            node = goto[node].get(ch, 0)
            if out[node]:
                for idx in out[node]:
                    found.add(pats[idx])
        return found
