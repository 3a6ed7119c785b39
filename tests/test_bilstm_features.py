"""M17/M18 reference-semantics tests: word-id mapping quirks and the
two-level pad, checked against hand-computed data_utils.py behavior."""

import numpy as np

from ehr_relation_extraction_ray.functions.bilstm_features import (
    NUM,
    UNK,
    BiLSTMFeaturizer,
    char_ids,
    pad_sequences,
    word_id,
)

WORDS = {UNK: 0, NUM: 1, "aspirin": 2, "daily": 3}
CHARS = {c: i for i, c in enumerate("asprindly")}


def test_word_id_reference_quirks():
    assert word_id("Aspirin", WORDS) == 2          # lowercase first
    assert word_id("325", WORDS) == 1              # isdigit -> $NUM$
    assert word_id("unknownword", WORDS) == 0      # OOV -> $UNK$
    assert word_id("ASPIRIN", WORDS, lowercase=False) == 0  # no lowering
    try:
        word_id("zzz", WORDS, allow_unk=False)
        assert False
    except KeyError:
        pass


def test_char_ids_drop_oov():
    # 'e' and 'g' are out of char vocab and silently dropped
    assert char_ids("age", CHARS) == [CHARS["a"]]
    assert char_ids("", CHARS) == []


def test_pad_sequences_two_levels():
    seqs = [[1, 2, 3], [4]]
    padded, lens = pad_sequences(seqs, 0, nlevels=1)
    assert padded == [[1, 2, 3], [4, 0, 0]] and lens == [3, 1]

    # nlevels=2: word-level pad to max word len, then sentence-level pad
    # with all-pad words; length rows padded with 0 (data_utils.py:331-345)
    cseqs = [[[1, 2], [3]], [[4, 5, 6]]]
    cp, cl = pad_sequences(cseqs, 0, nlevels=2)
    assert cp == [[[1, 2, 0], [3, 0, 0]], [[4, 5, 6], [0, 0, 0]]]
    assert cl == [[2, 1], [3, 0]]


def test_featurizer_batch_shapes():
    f = BiLSTMFeaturizer(WORDS, CHARS)
    wid, slen, cid, wlen = f([["Aspirin", "325", "daily"], ["aspirin"]])
    assert wid.shape == (2, 3) and cid.shape[0:2] == (2, 3)
    np.testing.assert_array_equal(wid, [[2, 1, 3], [2, 0, 0]])
    np.testing.assert_array_equal(slen, [3, 1])
    # char ids come from the RAW word: 'A' is OOV in the char vocab
    assert cid[0, 0].tolist()[: len("spirin")] == [CHARS[c] for c in "spirin"]
    assert wlen[1, 1] == 0 and wlen[1, 2] == 0
