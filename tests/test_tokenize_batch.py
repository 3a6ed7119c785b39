"""token_spans_batch must equal [token_spans(t)] exactly — including
unicode whitespace fallbacks, multibyte char offsets, control-char
whitespace (\\x1c-\\x1f are \\s), and empty/None docs."""

import random

import numpy as np

from ehr_relation_extraction_ray.functions.tokenize import (
    token_spans,
    token_spans_batch,
)


def _assert_equal(texts):
    got = token_spans_batch(texts)
    for t, (gs, ge) in zip(texts, got):
        ws, we = token_spans(t or "")
        np.testing.assert_array_equal(gs, ws, err_msg=repr(t))
        np.testing.assert_array_equal(ge, we, err_msg=repr(t))


def test_handcrafted():
    _assert_equal(
        [
            "",
            None,
            "one",
            " leading and trailing  ",
            "tab\tsep\nnewline\rcr",
            "\x1c\x1dctl-sep a\x1eb\x1fc",  # \x1c-\x1f are \s in re
            "pipe|is|a|token|char here",
            "é multibyte ï offsets α stay char-based",
            "nbsp\xa0is unicode ws -> regex fallback",
            "ideographic　space fallback",
            " line sep fallback x",
            "   ",
            "a",
            " a ",
            "ends-with-token x",
        ]
    )


def test_randomized():
    rng = random.Random(4)
    pieces = ["word", "é", "ï", "α", "x", "\t", "\n", " ", "  ", "\x1e", "|"]
    texts = []
    for _ in range(200):
        texts.append("".join(rng.choice(pieces) for _ in range(rng.randrange(0, 40))))
    _assert_equal(texts)


def test_all_whitespace_batch():
    _assert_equal(["  ", "\t\n", ""])
