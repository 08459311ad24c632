"""Property-based parity for the matcher kernel: on arbitrary texts and
gazetteers, `GazetteerMatcher.find` must emit EXACTLY the spans of the
reference's naive per-term regex scan (`extraction_engine.py:42-64`,
`batch_filter.py:31-56`) — the token/substring prefilters must never
lose or invent a match.

Spark-free (the kernel is a plain object), so hypothesis can hammer it
with hundreds of adversarial cases per run: overlapping surfaces,
surfaces that are substrings of other surfaces, hyphens, punctuation
boundaries, repeated adjacent occurrences, accented characters.

The alphabet deliberately excludes the case-folding pathologies the
module docstring documents as out of scope (ß, dotted/dotless I, Kelvin
sign), where Python's str.lower() and regex IGNORECASE disagree.
"""

from __future__ import annotations

import re

from hypothesis import given, settings
from hypothesis import strategies as st

from entity_extractor_spark.matching.matcher import GazetteerMatcher

WORD_ALPHABET = "abcdefgABCDEFG012éü-"
FILLER = " .,:!?()\n\t"

word = st.text(alphabet=WORD_ALPHABET, min_size=1, max_size=6)
surface = st.one_of(
    word,
    st.tuples(word, word).map(lambda t: f"{t[0]} {t[1]}"),  # phrases
)
texts = st.text(alphabet=WORD_ALPHABET + FILLER, min_size=0, max_size=120)


_TOKENS = re.compile(r"\b[\w\-]+\b")


def _naive_spans(terms: list[tuple[str, list[str]]], text: str, mode: str):
    out = set()
    seen = set()
    for term_id, surfaces in terms:
        for s in surfaces:
            s = (s or "").strip()
            if not s or (term_id, s) in seen:
                continue
            seen.add((term_id, s))
            if mode == "word_boundary":
                pat = re.compile(rf"\b{re.escape(s.lower())}\b", re.IGNORECASE)
            else:
                # reference exact-mode semantics (`batch_filter.py:31-56`):
                # a single-word label fires ONLY if it appears in the
                # [\w\-]+ token set (so a label with no word chars, e.g.
                # "-", can never match — hypothesis found this edge);
                # span recovery then uses the lookaround regex
                if " " not in s and s not in set(_TOKENS.findall(text)):
                    continue
                pat = re.compile(rf"(?<!\w){re.escape(s)}(?!\w)")
            for mo in pat.finditer(text):
                out.add((term_id, s, mo.group(0), mo.start(), mo.end()))
    return out


@st.composite
def case(draw):
    # surfaces partially drawn from the text's own words so hits are common
    text = draw(texts)
    pool = draw(st.lists(surface, min_size=1, max_size=6))
    own_words = [w for w in re.findall(r"[\w\-]+", text) if w][:3]
    pool += own_words
    terms = [(f"t{i}", [s]) for i, s in enumerate(pool)]
    # one multi-surface term (alias shape)
    if len(pool) >= 2:
        terms.append(("talias", pool[:2]))
    return terms, text


@settings(max_examples=300, deadline=None)
@given(case())
def test_word_boundary_mode_matches_naive_regex(tc):
    terms, text = tc
    m = GazetteerMatcher.build(terms, mode="word_boundary")
    got = {(s.term_id, s.surface, s.text, s.start, s.end) for s in m.find(text)}
    assert got == _naive_spans(terms, text, "word_boundary"), (terms, text)


@settings(max_examples=300, deadline=None)
@given(case())
def test_exact_mode_matches_naive_regex(tc):
    terms, text = tc
    m = GazetteerMatcher.build(terms, mode="exact")
    got = {(s.term_id, s.surface, s.text, s.start, s.end) for s in m.find(text)}
    assert got == _naive_spans(terms, text, "exact"), (terms, text)


# filler phrases from characters outside the text alphabet: they push the
# phrase count past AC_MIN_PHRASES (so the Aho-Corasick prefilter path
# runs in exact mode, and the first-word index carries many keys in
# word_boundary mode) without ever matching a generated text
_AC_FILLER = [(f"zfill{i}", [f"zq{i} zr{i}"]) for i in range(70)]


@settings(max_examples=300, deadline=None)
@given(case())
def test_word_boundary_large_phrase_dict_matches_naive_regex(tc):
    terms, text = tc
    terms = terms + _AC_FILLER
    m = GazetteerMatcher.build(terms, mode="word_boundary")
    # word_boundary phrases route through the first-word token index (the
    # round-3 replacement for the Aho-Corasick walk), never the automaton
    assert m._phrase_ac is None
    assert len(m._phrase_first_word) >= 70
    got = {(s.term_id, s.surface, s.text, s.start, s.end) for s in m.find(text)}
    assert got == _naive_spans(terms, text, "word_boundary"), (terms, text)


@settings(max_examples=200, deadline=None)
@given(case())
def test_word_boundary_no_leading_word_phrases(tc):
    # phrases whose key starts with a NON-word char take the
    # _phrase_no_word unconditional-substring fallback path
    terms, text = tc
    terms = terms + [("tnw1", ["- ab"]), ("tnw2", [": c d"])]
    m = GazetteerMatcher.build(terms, mode="word_boundary")
    assert len(m._phrase_no_word) >= 2
    got = {(s.term_id, s.surface, s.text, s.start, s.end) for s in m.find(text)}
    assert got == _naive_spans(terms, text, "word_boundary"), (terms, text)


@settings(max_examples=300, deadline=None)
@given(case())
def test_exact_mode_ac_path_matches_naive_regex(tc):
    terms, text = tc
    # exact mode routes single-word labels to the token index; make the
    # fillers phrases (with a space) so they land in the AC phrase path
    terms = terms + _AC_FILLER
    m = GazetteerMatcher.build(terms, mode="exact")
    assert m._phrase_ac is not None
    got = {(s.term_id, s.surface, s.text, s.start, s.end) for s in m.find(text)}
    assert got == _naive_spans(terms, text, "exact"), (terms, text)
