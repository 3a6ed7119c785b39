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


# --- batch tokenization: one byte-level numpy pass over many documents ---
# re's \s matches these ASCII bytes (enumerated empirically) ...
_WS_LUT = np.ones(256, dtype=bool)  # True = token byte
_WS_LUT[[9, 10, 11, 12, 13, 28, 29, 30, 31, 32]] = False
# ... plus these non-ASCII chars; a doc containing one keeps the regex
# path (byte-level whitespace detection would mis-tokenize it)
_UNICODE_WS_RE = re.compile(
    "[\x85\xa0\u1680\u2000-\u200a\u2028\u2029\u202f\u205f\u3000]"
)
_EMPTY_I64 = np.empty(0, dtype=np.int64)


def token_spans_batch(texts) -> list:
    """``[token_spans(t) for t in texts]``, vectorized: the whole batch is
    tokenized in ONE numpy pass over the UTF-8 byte stream (whitespace
    byte LUT + run boundaries + continuation-byte prefix sum for char
    offsets). Docs containing a non-ASCII whitespace char fall back to
    the regex per doc; outputs are identical either way (pinned by
    tests/test_tokenize_batch.py)."""
    out = [None] * len(texts)
    fast = []
    for j, t in enumerate(texts):
        t = t or ""
        if not t.isascii() and _UNICODE_WS_RE.search(t):
            out[j] = token_spans(t)
        else:
            fast.append(j)
    if not fast:
        return out
    enc = [(texts[j] or "").encode("utf-8") for j in fast]
    big = b" ".join(enc)  # the separator is whitespace: no cross-doc runs
    arr = np.frombuffer(big, dtype=np.uint8)
    N = len(arr)
    if N == 0:
        for j in fast:
            out[j] = (_EMPTY_I64, _EMPTY_I64)
        return out
    doc_lens = np.fromiter((len(b) for b in enc), np.int64, len(enc))
    off = np.zeros(len(enc), np.int64)
    np.cumsum(doc_lens[:-1] + 1, out=off[1:])
    is_tok = _WS_LUT[arr]  # continuation bytes (>=0x80) are token bytes
    prev = np.concatenate(([False], is_tok[:-1]))
    nxt = np.concatenate((is_tok[1:], [False]))
    w_start = np.flatnonzero(is_tok & ~prev)
    w_end = np.flatnonzero(is_tok & ~nxt) + 1
    if len(w_start) == 0:
        for j in fast:
            out[j] = (_EMPTY_I64, _EMPTY_I64)
        return out
    # byte -> char offsets (identity when the whole chunk is ASCII)
    if bool((arr >= 128).any()):
        cont_cum = np.zeros(N + 1, dtype=np.int64)
        np.cumsum((arr & 0xC0) == 0x80, out=cont_cum[1:])
        s_char = w_start - cont_cum[w_start]
        e_char = w_end - cont_cum[w_end]
        base = off - cont_cum[off]
    else:
        s_char, e_char, base = w_start, w_end, off
    # per-doc slices of the global token stream
    bounds = np.searchsorted(w_start, off)
    for d, j in enumerate(fast):
        a = int(bounds[d])
        b = int(bounds[d + 1]) if d + 1 < len(fast) else len(w_start)
        if a == b:
            out[j] = (_EMPTY_I64, _EMPTY_I64)
        else:
            out[j] = (s_char[a:b] - base[d], e_char[a:b] - base[d])
    return out


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
