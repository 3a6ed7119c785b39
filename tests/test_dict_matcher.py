"""DictMatcher (token-n-gram hash NER) must be EXACTLY equal to the
reference regex path find_mentions(compile_patterns(fit_patterns(...))) —
including the finditer consumption quirks (dict_ner.py:103-115): adjacent
matches sharing a delimiter, lexicon-order preference at equal starts,
cross-type overlap independence, the (start+1, end-1) trim, and the
Strength numeric pattern."""

import random

from ehr_relation_extraction_ray.lexicon import (
    DEFAULT_LEXICON,
    DictMatcher,
    compile_patterns,
    find_mentions,
    fit_patterns,
)


def _ref(text, surfaces):
    return find_mentions(text, compile_patterns(fit_patterns(surfaces)))


def _assert_equal(texts, surfaces):
    m = DictMatcher(surfaces)
    got = m.find_batch(texts)
    for t, g in zip(texts, got):
        assert g == _ref(t or "", surfaces), repr(t)


def test_default_lexicon_handcrafted_quirks():
    texts = [
        "",  # empty
        "aspirin",  # no delimiters -> no match (doc-edge)
        " aspirin ",  # minimal delimited match
        "take aspirin daily",
        # adjacency quirk: shared delimiter consumes the second match
        "x aspirin warfarin y",
        "x aspirin  warfarin y",  # two delimiters -> both match
        "x aspirin\twarfarin|metformin z",  # tab and pipe delimiters
        "dose 500 mg by mouth twice a day for 5 days",
        "RASH and NAUSEA after Insulin Glargine 10 units",  # case folding
        "vitamin d (oral) one tablet at bedtime",  # metachars in surface
        "tylenol+codeine for back pain x7 days",
        "aspirin aspirin aspirin aspirin",  # repeated adjacency
        " aspirin aspirin aspirin ",
        "nausea|rash|dizziness",  # pipe-delimited run
        "strength 81 mg and 100 mcg and 5mg",  # Strength regex path
        "\naspirin\n",  # newline delimiters
        "für aspirin tóo",  # inert non-ASCII chars -> fast path still exact
        "é aspirin ï rash α",  # the synth corpus's non-ASCII chars
        "aſpirin raſh aspirin",  # 'ſ' hazard -> regex fallback
        "K aspirin İstanbul rash",  # K + İ hazards -> regex fallback
        "straße aspirin ß rash",  # ß hazard -> regex fallback
        "dose ٥٠ mg aspirin",  # Unicode Nd digits (str \\d) -> fallback
        "x ４2 mg y",  # fullwidth digit -> fallback
        None,  # None text
        "twice a day twice a day",  # multi-word adjacency
        "for 5 days for 5 days  for 5 days",
    ]
    _assert_equal(texts, DEFAULT_LEXICON)


def test_fallback_type_with_metacharacter_surfaces():
    # '.' is NOT escaped by the reference (dict_ner.py:32) -> wildcard
    # semantics; the whole type must take the regex path and stay equal
    surfaces = {
        "Drug": ["aspirin", "a.c"],  # a.c matches "abc" in the regex path
        "ADE": ["rash"],
        "Strength": ["10 mg"],
    }
    texts = [" abc rash a.c ", " aXc ", " rash abc ", " a|c "]
    _assert_equal(texts, surfaces)


def test_lexicon_order_preference_and_prefix_surfaces():
    # two surfaces sharing a start: finditer picks the EARLIEST alternation
    # branch, not the longest match
    surfaces = {
        "Drug": ["insulin glargine extra", "insulin glargine", "insulin"],
        "ADE": ["insulin glargine"],  # independent scan on another type
        "Strength": ["1 mg"],
    }
    texts = [
        " insulin glargine extra ",
        " insulin glargine ",
        " insulin ",
        " insulin insulin glargine ",
    ]
    _assert_equal(texts, surfaces)
    surfaces2 = {
        "Drug": ["insulin", "insulin glargine"],  # short branch first
        "Strength": ["1 mg"],
    }
    _assert_equal(texts, surfaces2)


def test_randomized_corpus_equality():
    rng = random.Random(11)
    words = []
    for vs in DEFAULT_LEXICON.values():
        for s in vs:
            words.extend(s.split())
    words += ["the", "and", "mg", "x", "patient", "q", "ü"]
    delims = [" ", "  ", "\t", "\n", "|", " | ", "||"]
    texts = []
    for _ in range(150):
        n = rng.randrange(0, 30)
        parts = []
        for _ in range(n):
            w = rng.choice(words)
            if rng.random() < 0.3:
                w = w.upper() if rng.random() < 0.5 else w.capitalize()
            parts.append(w)
            parts.append(rng.choice(delims))
        texts.append("".join(parts))
    _assert_equal(texts, DEFAULT_LEXICON)


def test_reduced_fitted_lexicon_equality():
    reduced = {
        t: [s for s in v if " " not in s] for t, v in DEFAULT_LEXICON.items()
    }
    reduced = {t: v for t, v in reduced.items() if v}
    texts = [
        " aspirin rash daily 100 mcg ",
        " tablet|capsule\tnausea ",
        "x aspirin warfarin y",
    ]
    _assert_equal(texts, reduced)
