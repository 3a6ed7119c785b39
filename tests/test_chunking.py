"""Event-walk chunker == naive reference transcription (ehr.py:353-432)."""

import numpy as np
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from ehr_relation_extraction_ray.functions.chunking import (
    char_windows,
    split_points,
)
from ehr_relation_extraction_ray.functions.tokenize import (
    char_to_token,
    token_spans,
)
from refsem import naive_char_windows, naive_split_points, naive_token_maps

WORDS = ["alpha", "beta", "gamma", "x", "12", "mg.", "done.", "#tag", "[note]"]


def _random_text(draw_words, draw_seps):
    parts = []
    for w, s in zip(draw_words, draw_seps):
        parts.append(w)
        parts.append(s)
    return "".join(parts).strip(" ") or "word"


@given(
    words=st.lists(st.sampled_from(WORDS), min_size=1, max_size=120),
    seps=st.lists(
        st.sampled_from([" ", "  ", "\n", "\n\n", " \n", ".\n", "\n1", "\t"]),
        min_size=1,
        max_size=120,
    ),
    max_len=st.sampled_from([3, 5, 8, 16]),
)
@settings(max_examples=200, deadline=None)
def test_split_points_matches_naive(words, seps, max_len):
    text = _random_text(words, seps)
    tokens, c2t, t2c = naive_token_maps(text)
    expected = naive_split_points(text, c2t, len(tokens), max_len)
    starts, _ends = token_spans(text)
    got = split_points(text, starts, max_len=max_len)
    assert got == expected


@given(
    words=st.lists(st.sampled_from(WORDS), min_size=1, max_size=120),
    seps=st.lists(
        st.sampled_from([" ", "\n", "\n\n", ".\n", " \n "]),
        min_size=1,
        max_size=120,
    ),
    max_len=st.sampled_from([4, 8, 16]),
)
@settings(max_examples=150, deadline=None)
def test_char_windows_match_naive(words, seps, max_len):
    text = _random_text(words, seps)
    starts, ends = token_spans(text)
    split = split_points(text, starts, max_len=max_len)
    got = char_windows(text, split, ends)
    assert got == naive_char_windows(text, max_len)


def test_char_to_token_matches_naive():
    text = "one two  three\nfour\n\nfive  "
    tokens, c2t, _ = naive_token_maps(text)
    starts, _ = token_spans(text)
    got = char_to_token(starts, np.arange(len(text)))
    assert got.tolist() == c2t


def test_paragraph_preferred_over_hard_cut():
    # 10 tokens, paragraph break after token 3; max_len 6 -> split at par end
    text = "a b c d\n\ne f g h i j"
    starts, ends = token_spans(text)
    split = split_points(text, starts, max_len=6)
    tokens, c2t, _ = naive_token_maps(text)
    assert split == naive_split_points(text, c2t, len(tokens), 6)
    assert split[0] == 0 and split[-1] == 10


def test_single_window_doc_re_window_is_first_token_only():
    # reference quirk (utils_re.py:204-205): single-window docs pair only
    # within the first token's char span
    text = "aspirin causes nausea today"
    starts, ends = token_spans(text)
    split = split_points(text, starts, max_len=128)
    assert split == [0, 4]
    assert char_windows(text, split, ends) == [(0, 7)]


def test_empty_text():
    starts, ends = token_spans("")
    assert split_points("", starts, max_len=8) == [0, 0]
    assert char_windows("", [0, 0], ends) == []
