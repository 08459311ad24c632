"""The engine's searchsorted WordIndex must equal the reference's literal
char->word dict implementation (including its whitespace-drift quirk)."""

from __future__ import annotations

from hypothesis import given, settings
from hypothesis import strategies as st

from entity_extractor_spark.matching.context import extract_context_window
from entity_extractor_spark.oracle import _char_to_word_window

texts = st.text(
    alphabet=st.sampled_from(list("abc XYZ-_.\n\t  ")), min_size=0, max_size=200
)


@given(texts, st.integers(0, 220), st.integers(1, 20), st.integers(1, 5))
@settings(max_examples=300, deadline=None)
def test_window_matches_reference_quirks(text, start, span, window):
    end = start + span
    assert extract_context_window(text, start, end, window) == _char_to_word_window(
        text, start, end, window
    )


def test_window_basic():
    text = "a b c d e f g"
    # match on "d" (chars 6..7), window 1 word each side
    assert extract_context_window(text, 6, 7, 1) == "c d e"


def test_window_multispace_drift():
    # Two spaces: the reference's map drifts by one char; reproduce it.
    text = "aa  bb cc"
    ref = _char_to_word_window(text, 4, 6, 0)
    assert extract_context_window(text, 4, 6, 0) == ref
