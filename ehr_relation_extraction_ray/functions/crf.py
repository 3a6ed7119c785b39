"""CRF Viterbi decode (SURVEY A2 plumbing, numpy).

Reference semantics: ``bilstm_crf_ner/model/crf.py:229-287``
(_viterbi_decode) — start transitions added to the first emission,
additive (prev-tag x next-tag) transition matrix, end transitions added
at each sequence's true end (mask-derived length), backtrace from the
best last tag. The trained parameters are unshippable; this decode plus
functions/bilstm_features.py IS the model-actor contract, so the CRF
layer slots in as three numpy arrays. Ties resolve to the lowest tag
index (np.argmax), matching a deterministic-greedy convention.
"""

from __future__ import annotations

from typing import List

import numpy as np


def viterbi_decode(
    emissions: np.ndarray,
    lengths: np.ndarray,
    start: np.ndarray,
    end: np.ndarray,
    transitions: np.ndarray,
) -> List[List[int]]:
    """Best tag path per sequence.

    Args:
        emissions: float array [T, B, K] (time-major, like the reference).
        lengths: int array [B] of true sequence lengths (the mask sum).
        start/end: [K] boundary transition scores.
        transitions: [K, K], score of tag i -> tag j.
    """
    T, B, K = emissions.shape
    score = [start[None, :] + emissions[0]]  # [B, K]
    path: List[np.ndarray] = []
    for t in range(1, T):
        # [B, K_prev, 1] + [K_prev, K_next] + [B, 1, K_next]
        m = score[t - 1][:, :, None] + transitions[None] + emissions[t][:, None, :]
        path.append(np.argmax(m, axis=1))  # [B, K_next]: best prev tag
        score.append(np.max(m, axis=1))
    out: List[List[int]] = []
    for b in range(B):
        if lengths[b] <= 0:  # empty sequence: no tags, not a pad backtrace
            out.append([])
            continue
        last = int(lengths[b]) - 1
        tag = int(np.argmax(score[last][b] + end))
        tags = [tag]
        for p in reversed(path[:last]):
            tag = int(p[b][tags[-1]])
            tags.append(tag)
        tags.reverse()
        out.append(tags)
    return out
