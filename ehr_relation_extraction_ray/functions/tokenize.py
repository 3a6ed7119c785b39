"""Whitespace tokenization with char<->token index maps.

Reproduces the reference default tokenizer (``generate_data.py:59-71``:
split on whitespace, drop empties) and the char<->token maps of
``HealthRecord._compute_tokens`` (``ehr.py:196-249``) for that tokenizer:

* ``token_spans``: per token, ``(start_char, end_char)`` with end exclusive
  (``ehr.py:237``: ``token_to_char_map.append((token_start_idx, j))``).
* ``char -> token``: chars inside token ``i`` map to ``i``; whitespace after
  token ``i`` maps to ``i`` (``ehr.py:214-217``: discarded chars inherit the
  previous token's index); trailing chars likewise (``ehr.py:240-243``).
  Leading whitespace would index ``char_to_token_map[-1]`` of an empty list
  in the reference (crash); we map it to token 0.

Unlike the reference's O(len) Python char-walk this is one compiled regex
scan + ``numpy.searchsorted`` — the same mapping, computed vectorized, and
recomputed transiently inside each batch fn (never materialized between
stages, SURVEY.md M1).
"""

from __future__ import annotations

import re
from typing import List, Tuple

import numpy as np

_TOKEN_RE = re.compile(r"\S+")


def token_spans(text: str) -> Tuple[np.ndarray, np.ndarray]:
    """(starts, ends) int64 arrays of whitespace tokens, end exclusive."""
    spans = [m.span() for m in _TOKEN_RE.finditer(text)]
    if not spans:
        empty = np.empty(0, dtype=np.int64)
        return empty, empty
    arr = np.asarray(spans, dtype=np.int64)
    return np.ascontiguousarray(arr[:, 0]), np.ascontiguousarray(arr[:, 1])


def char_to_token(starts: np.ndarray, char_idx) -> np.ndarray:
    """Vectorized ``get_token_idx`` (ehr.py:279-298) for whitespace tokens.

    ``char_idx`` may be a scalar or array. Chars before the first token
    clamp to 0 (the reference would crash there).
    """
    idx = np.searchsorted(starts, np.asarray(char_idx, dtype=np.int64), side="right") - 1
    return np.maximum(idx, 0)


def tokens_of(text: str) -> List[str]:
    """The token strings themselves (generate_data.py:59-71 parity)."""
    return _TOKEN_RE.findall(text)
