"""Text-analysis kernels for large-scale training-data pipelines.

All functions are batch-level (numpy / pandas / compiled regex — no Python
loop over rows in hot paths) and deterministic:

* language-ID: stopword-hit heuristic over a small per-language marker set
  (n-gram-free variant sized for a single broadcastable dict).
* quality scoring: length / punctuation / stopword / digit ratios.
* token counting: whitespace tokens and a BPE-ish regex token count.
* fingerprinting: 64-bit FNV-1a content hash plus a winnowing-style
  rolling-hash document fingerprint.
"""

from __future__ import annotations

import re
from typing import Dict, List

import numpy as np
import pandas as pd

_WORD_RE = re.compile(r"[a-zA-Z']+")
# GPT-2-style pre-tokenization regex (public BPE idiom), simplified.
_BPE_RE = re.compile(r"'[a-z]{1,2}|\w+|[^\w\s]+|\s+")
_PUNCT_RE = re.compile(r"[^\w\s]")
_DIGIT_RE = re.compile(r"\d")

LANG_MARKERS: Dict[str, frozenset] = {
    "en": frozenset("the and of to in is you that it he was for on are".split()),
    "de": frozenset("der die und das ist ich nicht sie mit ein auf für".split()),
    "fr": frozenset("le la et les des un une est pas pour que dans".split()),
    "es": frozenset("el la los las y de que en un una es por para".split()),
    "it": frozenset("il la che di e un una per con del sono non".split()),
}
_EN_STOP = LANG_MARKERS["en"]


def lang_id(texts: List[str]) -> List[str]:
    """Most-hit marker language; 'und' (undetermined) when nothing hits."""
    out = []
    for t in texts:
        words = _WORD_RE.findall(t.lower())
        best, best_hits = "und", 0
        for lang, markers in LANG_MARKERS.items():
            hits = sum(1 for w in words if w in markers)
            if hits > best_hits:
                best, best_hits = lang, hits
        out.append(best)
    return out


def quality_features(texts: pd.Series) -> pd.DataFrame:
    """Vectorized quality signals per document."""
    n_chars = texts.str.len().astype("int64")
    n_ws_tokens = texts.str.count(r"\S+").astype("int64")
    n_punct = texts.str.count(_PUNCT_RE.pattern).astype("int64")
    n_digit = texts.str.count(_DIGIT_RE.pattern).astype("int64")
    lowered = texts.str.lower().str.findall(_WORD_RE.pattern)
    stop_hits = lowered.map(lambda ws: sum(1 for w in ws if w in _EN_STOP))
    denom = n_ws_tokens.clip(lower=1)
    return pd.DataFrame(
        {
            "n_chars": n_chars,
            "n_tokens": n_ws_tokens,
            "punct_ratio": (n_punct / n_chars.clip(lower=1)).astype("float64"),
            "digit_ratio": (n_digit / n_chars.clip(lower=1)).astype("float64"),
            "stopword_ratio": (stop_hits / denom).astype("float64"),
            "mean_token_len": (
                (n_chars - n_ws_tokens.clip(lower=1) + 1) / denom
            ).astype("float64"),
        }
    )


def bpe_token_count(texts: List[str]) -> np.ndarray:
    return np.fromiter(
        (len(_BPE_RE.findall(t)) for t in texts), dtype=np.int64, count=len(texts)
    )


_FNV_OFFSET = np.uint64(14695981039346656037)
_FNV_PRIME = np.uint64(1099511628211)


def fnv1a_64(data: bytes) -> int:
    h = _FNV_OFFSET
    for b in data:
        h = np.uint64((int(h) ^ b) * int(_FNV_PRIME) & 0xFFFFFFFFFFFFFFFF)
    return int(h)


def content_hash_64(texts: List[str]) -> np.ndarray:
    """64-bit polynomial content hash, vectorized per document.

    ``h = sum(byte[i] * P^(n-1-i)) mod 2^64`` via a numpy cumprod of powers
    — O(bytes) vector ops, no per-byte Python loop. Used for
    hash-partitioned exact dedup and deterministic sampling keys (never
    exposed to SQL oracles, which compare on the raw values instead).
    """
    n = len(texts)
    out = np.full(n, _FNV_OFFSET, dtype=np.uint64)
    if n == 0:
        return out
    P = np.uint64(1099511628211)
    # ONE segmented numpy computation for the whole batch (the per-string
    # loop was ~15 us/string — the dominant cost of hash-partitioning
    # high-row-count string keys). Values are BIT-IDENTICAL to the old
    # loop: modular uint64 addition is order-independent, so the reduceat
    # segment sum equals the per-string np.sum, and each byte's
    # coefficient P^(distance-from-end) is read from one shared power
    # table.
    bs = [t.encode("utf-8", "surrogatepass") for t in texts]
    lens = np.fromiter((len(b) for b in bs), np.int64, count=n)
    nz = np.flatnonzero(lens > 0)
    if len(nz) == 0:
        return out
    arr = np.frombuffer(b"".join(bs), dtype=np.uint8).astype(np.uint64)
    ends = np.cumsum(lens)
    starts = ends - lens
    with np.errstate(over="ignore"):
        ptab = np.full(int(lens.max()), P, dtype=np.uint64)
        ptab[0] = np.uint64(1)
        ptab = np.cumprod(ptab)  # P^0..P^{maxlen-1}, wraps mod 2^64
        string_id = np.repeat(np.arange(n), lens)
        d = ends[string_id] - 1 - np.arange(len(arr))
        terms = arr * ptab[d]
        sums = np.add.reduceat(terms, starts[nz])
    out[nz] = sums ^ lens[nz].astype(np.uint64)
    return out


def rolling_fingerprint(text: str, k: int = 9, window: int = 4) -> int:
    """Winnowing-style fingerprint: min-of-window over k-gram hashes,
    XOR-folded to one 64-bit value. Deterministic, locality-sensitive at
    the k-gram level (used for near-identical doc detection)."""
    data = text.encode("utf-8", "surrogatepass")
    if len(data) < k:
        return fnv1a_64(data)
    arr = np.frombuffer(data, dtype=np.uint8).astype(np.uint64)
    h = np.zeros(len(arr) - k + 1, dtype=np.uint64)
    acc = np.zeros_like(h)
    for j in range(k):
        acc = (acc * np.uint64(257) + arr[j : len(arr) - k + 1 + j]) & np.uint64(
            0xFFFFFFFFFFFFFFFF
        )
    h = acc
    if len(h) <= window:
        return int(np.bitwise_xor.reduce(h))
    mins = np.lib.stride_tricks.sliding_window_view(h, window).min(axis=1)
    return int(np.bitwise_xor.reduce(np.unique(mins)))


def vec_string_hash_64(strings) -> np.ndarray:
    """Vectorized deterministic 64-bit string hash, pure numpy — no
    imports, no fallback (replaces the polars rust-kernel path whose
    partial-import race under concurrent worker startup made hashes
    inconsistent across processes). Fixed-width UTF-32 code matrix x
    position multipliers, length folded in so zero-padding cannot
    collide, murmur-style avalanche finalizer."""
    strings = list(strings)
    if not strings:
        return np.zeros(0, dtype=np.uint64)
    from .sketch import _mix64

    m = np.asarray(strings, dtype="U")
    width = m.dtype.itemsize // 4
    if width == 0:  # every string empty
        return np.full(len(strings), _FNV_OFFSET, dtype=np.uint64)
    codes = np.ascontiguousarray(m).view(np.uint32).reshape(len(m), width)
    codes = codes.astype(np.uint64)
    P = np.uint64(1099511628211)
    with np.errstate(over="ignore"):
        powers = P ** np.arange(width, dtype=np.uint64)
        h = (codes * powers[None, :]).sum(axis=1, dtype=np.uint64)
        lens = (codes != 0).sum(axis=1).astype(np.uint64)
        h = h * P + lens
    return _mix64(h)
