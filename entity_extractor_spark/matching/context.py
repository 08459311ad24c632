"""Word-window context extraction, behavior-identical to the reference.

Reference semantics (`optimized_extractor/extraction_engine.py:69-92`):
the text is tokenized with ``str.split()`` and a char->word map is built
assuming every word is followed by exactly ONE space. When the text
contains whitespace runs / newlines, the map drifts relative to the true
character offsets — that drift is part of the reference's observable
behavior (contexts are computed off the drifted map) and is reproduced
here exactly. Char positions that land outside any (drifted) word span
fall back to word 0 for the match start and to the last word for the
match end, also per reference.

This module is shared by the Spark engine (inside the Arrow-batched
matcher UDF) and the pytest parity oracle, so both sides agree by
construction. Implementation is ``bisect`` over cumulative word offsets
— O(matches * log words) per text instead of the reference's O(chars)
dict build. Pure Python on purpose: typical turns have ~40 words and
~2-3 matches, where list+bisect measures 1.5x faster than the numpy
``searchsorted`` equivalent (scalar numpy call overhead dominates at
this size; a fully batched numpy variant measured slower still).
"""

from __future__ import annotations

from bisect import bisect_right
from itertools import accumulate

DEFAULT_WINDOW_WORDS = 100


class WordIndex:
    """Char->word lookup for one text, built once and queried per match."""

    __slots__ = ("words", "starts", "ends", "n")

    def __init__(self, text: str):
        self.words = text.split()
        self.n = len(self.words)
        # Reference advances char_pos by len(word)+1 regardless of the real
        # inter-word whitespace — keep that exact (drifting) coordinate system.
        self.starts = [0] + list(accumulate(len(w) + 1 for w in self.words[:-1]))
        self.ends = [s + len(w) for s, w in zip(self.starts, self.words)]

    def word_at(self, char_pos: int, default: int) -> int:
        if self.n == 0:
            return default
        idx = bisect_right(self.starts, char_pos) - 1
        if idx >= 0 and char_pos < self.ends[idx]:
            return idx
        return default  # gap between words or past the end → reference .get default

    def window(self, match_start: int, match_end: int, window_words: int) -> str:
        start_word = self.word_at(match_start, 0)
        end_word = self.word_at(match_end - 1, self.n - 1)
        lo = max(0, start_word - window_words)
        hi = min(self.n, end_word + window_words + 1)
        return " ".join(self.words[lo:hi])

def extract_context_window(
    text: str, match_start: int, match_end: int, window_words: int = DEFAULT_WINDOW_WORDS
) -> str:
    """One-shot form (tests / oracle). Engine reuses WordIndex per text."""
    return WordIndex(text).window(match_start, match_end, window_words)


def char_window(text: str, start: int, end: int, width: int = 100) -> str:
    """Char-window context (`streamlit_dashboard/core_pipeline/utils.py:53-57`)."""
    return text[max(0, start - width) : min(len(text), end + width)]
