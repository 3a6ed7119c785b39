"""A2 Viterbi decode vs brute-force enumeration over ALL tag paths."""

import itertools

import numpy as np

from ehr_relation_extraction_ray.functions.crf import viterbi_decode


def _brute(em, length, start, end, trans):
    K = em.shape[1]
    best, best_s = None, -np.inf
    for tags in itertools.product(range(K), repeat=length):
        s = start[tags[0]] + em[0, tags[0]]
        for t in range(1, length):
            s += trans[tags[t - 1], tags[t]] + em[t, tags[t]]
        s += end[tags[-1]]
        if s > best_s:
            best_s, best = s, list(tags)
    return best


def test_viterbi_matches_bruteforce():
    rng = np.random.default_rng(3)
    K, T, B = 3, 5, 4
    em = rng.standard_normal((T, B, K))
    start, end = rng.standard_normal(K), rng.standard_normal(K)
    trans = rng.standard_normal((K, K))
    lengths = np.array([5, 3, 1, 4])
    got = viterbi_decode(em, lengths, start, end, trans)
    for b in range(B):
        assert got[b] == _brute(em[:, b], int(lengths[b]), start, end, trans)
        assert len(got[b]) == lengths[b]


def test_viterbi_prefers_transition_structure():
    """With dominant transition scores the path follows the chain even
    when per-step emissions point elsewhere (the CRF's whole point)."""
    K, T = 2, 4
    em = np.zeros((T, 1, K))
    em[:, 0, 1] = 0.1  # emissions mildly prefer tag 1 everywhere
    trans = np.array([[5.0, -5.0], [-5.0, -5.0]])  # staying on 0 dominates
    start = np.array([0.0, 0.0])
    end = np.array([0.0, 0.0])
    assert viterbi_decode(em, np.array([T]), start, end, trans) == [[0, 0, 0, 0]]
