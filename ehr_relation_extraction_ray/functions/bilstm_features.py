"""BiLSTM-CRF input plumbing (SURVEY M17/M18): word-id mapping and the
two-level pad-to-rectangle, reference semantics from
``bilstm_crf_ner/model/data_utils.py``:

* ``get_processing_word`` (data_utils.py:243-288): optional lowercase,
  ``word.isdigit() -> $NUM$`` BEFORE vocabulary lookup, OOV -> ``$UNK$``
  (when allowed), and char ids that silently DROP out-of-vocabulary
  characters (data_utils.py:262-264).
* ``pad_sequences`` (data_utils.py:292-345): nlevels=1 pads token rows to
  the batch max; nlevels=2 first pads every word's char list to the batch
  max word length, then pads sentences with all-pad words, and pads the
  per-word length rows with 0.

The model weights themselves (TensorFlow checkpoint) are unshippable and
out of engine scope (README "Scope notes"); this module is the exact
feature contract a weight-backed actor would consume, so swapping the
real model in is a constructor argument, not a rewrite. The featurizer
is a callable CLASS for ``map_batches`` actor pools: vocab dicts are
broadcast once (``ray.put``) and resolved per process.
"""

from __future__ import annotations

from typing import Dict, List, Optional, Sequence, Tuple

import numpy as np

UNK = "$UNK$"
NUM = "$NUM$"


def word_id(
    word: str,
    vocab_words: Dict[str, int],
    lowercase: bool = True,
    allow_unk: bool = True,
) -> int:
    """Reference ``get_processing_word`` word branch (data_utils.py:266-281)."""
    if lowercase:
        word = word.lower()
    if word.isdigit():
        word = NUM
    if word in vocab_words:
        return vocab_words[word]
    if allow_unk:
        return vocab_words[UNK]
    raise KeyError(word)


def char_ids(word: str, vocab_chars: Dict[str, int]) -> List[int]:
    """Reference char branch: OOV characters are silently dropped
    (data_utils.py:259-264) — run on the RAW word, before lowercasing."""
    return [vocab_chars[c] for c in word if c in vocab_chars]


def _pad_1(seqs: Sequence[Sequence], pad_tok, max_length: int):
    padded, lengths = [], []
    for seq in seqs:
        seq = list(seq)
        padded.append(seq[:max_length] + [pad_tok] * max(max_length - len(seq), 0))
        lengths.append(min(len(seq), max_length))
    return padded, lengths


def pad_sequences(seqs: Sequence[Sequence], pad_tok, nlevels: int = 1):
    """Reference ``pad_sequences`` (data_utils.py:312-345), both levels.
    An empty batch pads to ([], []) instead of the reference's max() crash
    — map_batches can legitimately deliver zero rows."""
    if not seqs:
        return [], []
    if nlevels == 1:
        max_length = max(len(s) for s in seqs)
        return _pad_1(seqs, pad_tok, max_length)
    max_word = max(max((len(w) for w in s), default=0) for s in seqs)
    padded, lengths = [], []
    for seq in seqs:
        sp, sl = _pad_1(seq, pad_tok, max_word)
        padded.append(sp)
        lengths.append(sl)
    max_sent = max(len(s) for s in seqs)
    padded, _ = _pad_1(padded, [pad_tok] * max_word, max_sent)
    lengths, _ = _pad_1(lengths, 0, max_sent)
    return padded, lengths


class BiLSTMFeaturizer:
    """Actor-pool stage: window token rows -> padded id tensors.

    ``__init__`` resolves the broadcast vocab refs ONCE per actor
    process; ``__call__`` turns a batch of token lists into the four
    dense arrays the reference model feeds (ner_learner feed dict):
    (word_ids [B, T], seq_lens [B], char_ids [B, T, C], word_lens [B, T]).
    """

    def __init__(self, vocab_words_ref, vocab_chars_ref, lowercase: bool = True):
        from .broadcast import bget

        self.vocab_words = (
            bget(vocab_words_ref)
            if not isinstance(vocab_words_ref, dict)
            else vocab_words_ref
        )
        self.vocab_chars = (
            bget(vocab_chars_ref)
            if not isinstance(vocab_chars_ref, dict)
            else vocab_chars_ref
        )
        self.lowercase = lowercase

    def __call__(
        self, token_rows: List[List[str]]
    ) -> Tuple[np.ndarray, np.ndarray, np.ndarray, np.ndarray]:
        wid_rows = [
            [word_id(w, self.vocab_words, self.lowercase) for w in row]
            for row in token_rows
        ]
        cid_rows = [[char_ids(w, self.vocab_chars) for w in row] for row in token_rows]
        if not token_rows:
            z = np.zeros((0, 0), dtype=np.int64)
            return z, np.zeros(0, dtype=np.int64), z[:, :, None], z
        wid_p, seq_len = pad_sequences(wid_rows, 0, nlevels=1)
        cid_p, word_len = pad_sequences(cid_rows, 0, nlevels=2)
        return (
            np.asarray(wid_p, dtype=np.int64),
            np.asarray(seq_len, dtype=np.int64),
            np.asarray(cid_p, dtype=np.int64),
            np.asarray(word_len, dtype=np.int64),
        )
