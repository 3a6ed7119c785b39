"""Mergeable sketches for corpus-scale approximate aggregates.

HyperLogLog distinct counting, Ray-Data-first: every batch folds its
values into a 2^p-register sketch (one vectorized ``np.maximum.at`` —
this is the COMBINER), each block emits one register-vector row, and the
final merge is an elementwise max over block rows (register vectors are
fixed 4 KiB at p=12, so the merge side is blocks x 4 KiB no matter how
big the corpus — the whole point of a mergeable sketch). Deterministic:
the value hash is the repo's content_hash_64, so the estimate is
reproducible at any parallelism and an independent serial recomputation
hash-matches exactly (the driver-oracle strategy for non-SQL ops).

Estimator: standard HLL (Flajolet et al. 2007) with the small-range
linear-counting correction; no large-range correction (64-bit hashes make
collisions irrelevant at any realistic cardinality).
"""

from __future__ import annotations

import numpy as np

from .textstats import content_hash_64

HLL_P = 12
HLL_M = 1 << HLL_P
_ALPHA = 0.7213 / (1 + 1.079 / HLL_M)  # alpha_m for m >= 128


def hll_registers(values) -> np.ndarray:
    """Fold an iterable of (string) values into a fresh register vector."""
    regs = np.zeros(HLL_M, dtype=np.int8)
    if len(values) == 0:
        return regs
    h = content_hash_64([str(v) for v in values])
    return hll_update(regs, h)


def _mix64(h: np.ndarray) -> np.ndarray:
    """Murmur3 finalizer (avalanche): content_hash_64 is a positional
    polynomial whose HIGH bits barely move between similar strings — raw,
    it collapses every value into a handful of registers. Deterministic."""
    h = h.copy()
    with np.errstate(over="ignore"):
        h ^= h >> np.uint64(33)
        h *= np.uint64(0xFF51AFD7ED558CCD)
        h ^= h >> np.uint64(33)
        h *= np.uint64(0xC4CEB9FE1A85EC53)
        h ^= h >> np.uint64(33)
    return h


def hll_update(regs: np.ndarray, hashes: np.ndarray) -> np.ndarray:
    """Fold 64-bit hashes into ``regs`` in place (vectorized)."""
    hashes = _mix64(hashes)
    idx = (hashes >> np.uint64(64 - HLL_P)).astype(np.int64)
    rest = hashes << np.uint64(HLL_P)  # top 52 bits of the remainder
    # rank = leading zeros of `rest` + 1, capped at 64 - p + 1
    rank = np.full(len(hashes), 64 - HLL_P + 1, dtype=np.int8)
    nz = rest != 0
    if nz.any():
        # leading zeros via float64 exponent trick is lossy; use bit scan
        r = rest[nz]
        lz = np.zeros(len(r), dtype=np.int8)
        for shift in (32, 16, 8, 4, 2, 1):
            mask = r < (np.uint64(1) << np.uint64(64 - shift))
            lz[mask] += shift
            r[mask] = r[mask] << np.uint64(shift)
        rank[nz] = lz + 1
    np.maximum.at(regs, idx, rank)
    return regs


def hll_merge(reg_rows: np.ndarray) -> np.ndarray:
    """Merge block register rows (n x m) -> one register vector."""
    return reg_rows.max(axis=0).astype(np.int8)


def hll_estimate(regs: np.ndarray) -> float:
    """Cardinality estimate with small-range linear counting."""
    m = float(HLL_M)
    est = _ALPHA * m * m / np.sum(np.exp2(-regs.astype(np.float64)))
    zeros = int((regs == 0).sum())
    if est <= 2.5 * m and zeros:
        est = m * np.log(m / zeros)
    return float(est)


def misra_gries(counts: dict, capacity: int) -> dict:
    """Reduce a term->count dict to a Misra-Gries summary of at most
    ``capacity`` entries. Guarantee: any term with true total count
    > total/capacity survives, and kept counts underestimate by at most
    total/capacity. Deterministic (no tie randomness: decrement applies
    to ALL entries equally)."""
    if len(counts) <= capacity:
        return dict(counts)
    # decrement by the (capacity+1)-th largest count: one vectorized step
    # equivalent to repeated MG decrements until <= capacity entries remain
    import numpy as np

    vals = np.sort(np.fromiter(counts.values(), dtype=np.int64))[::-1]
    cut = vals[capacity]
    return {t: c - cut for t, c in counts.items() if c > cut}


def misra_gries_merge(summaries, capacity: int) -> dict:
    """Merge MG summaries (sum counts, re-reduce): the standard mergeable
    heavy-hitters composition (Agarwal et al., 'Mergeable Summaries')."""
    total: dict = {}
    for s in summaries:
        for t, c in s.items():
            total[t] = total.get(t, 0) + c
    return misra_gries(total, capacity)


# -- Bloom filter (broadcast membership prefilter) ---------------------------
#
# Double hashing (Kirsch-Mitzenmacher): probe_i = h1 + i*h2 (mod m) gives
# the asymptotic FP rate of i independent hash functions from two. m is
# packed into uint64 words so an m=2^23-bit filter broadcasts as 1 MiB —
# ~10 bits/element vs the 8 bytes/element of the exact hash set.


def bloom_positions(hashes: np.ndarray, m_bits: int, n_probes: int) -> np.ndarray:
    """(len(hashes) x n_probes) uint64 probe positions in [0, m_bits).

    m is a power of two, so ``mod m`` keeps only LOW bits — h2 must get
    its low bits from h1's FULL width (xorshift avalanche), else h2 mod m
    is a function of h1 mod m and the whole filter degenerates to
    "low-log2(m)-bits membership" (measured FP 7.8% instead of 0.5%)."""
    h1 = hashes.astype(np.uint64)
    with np.errstate(over="ignore"):
        h2 = _mix64(h1) | np.uint64(1)
        i = np.arange(n_probes, dtype=np.uint64)
        pos = h1[:, None] + i[None, :] * h2[:, None]
    return pos % np.uint64(m_bits)


def bloom_add(words: np.ndarray, hashes: np.ndarray, n_probes: int) -> None:
    """Set the probe bits of ``hashes`` in the packed uint64 ``words``."""
    if len(hashes) == 0:
        return
    pos = bloom_positions(hashes, len(words) * 64, n_probes).ravel()
    idx = (pos >> np.uint64(6)).astype(np.int64)
    bit = np.left_shift(np.uint64(1), pos & np.uint64(63))
    np.bitwise_or.at(words, idx, bit)


def bloom_contains(words: np.ndarray, hashes: np.ndarray, n_probes: int) -> np.ndarray:
    """Boolean mask: all probe bits set (i.e. maybe-member)."""
    if len(hashes) == 0:
        return np.zeros(0, dtype=bool)
    pos = bloom_positions(hashes, len(words) * 64, n_probes)
    idx = (pos >> np.uint64(6)).astype(np.int64)
    bit = np.left_shift(np.uint64(1), pos & np.uint64(63))
    return ((words[idx] & bit) != 0).all(axis=1)


def ams_signs(tokens, n_est: int = 64) -> np.ndarray:
    """(n_est, n_tokens) deterministic ±1 sign matrix for the AMS F2
    sketch (Alon-Matias-Szegedy 1996): sign bit j of the avalanched
    token hash — 64 independent-enough estimators from one mix."""
    h = _mix64(content_hash_64([str(t) for t in tokens]))
    bits = (h[None, :] >> np.arange(n_est, dtype=np.uint64)[:, None]) & np.uint64(1)
    return bits.astype(np.int64) * 2 - 1


def ams_f2_partial(counts: dict, n_est: int = 64) -> np.ndarray:
    """Fold one block's token counts into the (n_est,) AMS dot-product
    partial: sum_j s_j(tok) * count(tok). Linear in counts, so block
    partials SUM to the corpus dot product — the mergeable state is
    n_est int64s per block."""
    if not counts:
        return np.zeros(n_est, dtype=np.int64)
    toks = list(counts.keys())
    c = np.fromiter((counts[t] for t in toks), dtype=np.int64)
    return ams_signs(toks, n_est) @ c


def ams_f2_estimate(dot: np.ndarray, groups: int = 4) -> float:
    """Median-of-means over the squared dots: mean within each of
    ``groups`` buckets, median across buckets."""
    sq = dot.astype(np.float64) ** 2
    per = len(sq) // groups
    means = [sq[g * per:(g + 1) * per].mean() for g in range(groups)]
    return float(np.median(means))


# -- Count-Min sketch (Cormode & Muthukrishnan 2005) --------------------------
#
# Linear sketch: cm_partial over a block's counts is a (d x w) int64 matrix
# and block matrices SUM to the corpus sketch — the mergeable state is
# d*w int64s regardless of vocabulary. Estimates only OVERestimate
# (eps = e/w of the total count with probability 1 - e^-d).

_CM_ROW_SEEDS = np.array(
    [0x9E3779B97F4A7C15, 0xC2B2AE3D27D4EB4F, 0x165667B19E3779F9, 0x27D4EB2F165667C5],
    dtype=np.uint64,
)


def _cm_positions(tokens, w: int, d: int) -> np.ndarray:
    """(d x len(tokens)) column indices; row i uses an independent
    avalanche of the base 64-bit string hash."""
    from .textstats import vec_string_hash_64

    base = vec_string_hash_64(tokens)
    rows = [
        (_mix64(base ^ _CM_ROW_SEEDS[i % len(_CM_ROW_SEEDS)] + np.uint64(i))
         % np.uint64(w)).astype(np.int64)
        for i in range(d)
    ]
    return np.stack(rows)


def cm_partial(counts: dict, w: int = 256, d: int = 4) -> np.ndarray:
    """Fold one block's token->count dict into a (d x w) CM matrix."""
    mat = np.zeros((d, w), dtype=np.int64)
    if not counts:
        return mat
    toks = list(counts.keys())
    c = np.fromiter((counts[t] for t in toks), dtype=np.int64)
    pos = _cm_positions(toks, w, d)
    for i in range(d):
        np.add.at(mat[i], pos[i], c)
    return mat


def cm_query(mat: np.ndarray, tokens) -> np.ndarray:
    """Point-frequency estimates: min over the d rows at each token's
    positions. Never underestimates."""
    tokens = list(tokens)
    if not tokens:
        return np.zeros(0, dtype=np.int64)
    d, w = mat.shape
    pos = _cm_positions(tokens, w, d)
    ests = np.stack([mat[i][pos[i]] for i in range(d)])
    return ests.min(axis=0)


def ams_join_estimate(dot_a: np.ndarray, dot_b: np.ndarray, groups: int = 4) -> float:
    """AGMS join-size estimation (Alon, Gibbons, Matias, Szegedy 1999):
    E[dot_a_j * dot_b_j] = |A join B| when both sides fold their key
    counts with the SAME sign function (ams_f2_partial). Median-of-means
    over the elementwise products, mirroring ams_f2_estimate."""
    prod = dot_a.astype(np.float64) * dot_b.astype(np.float64)
    per = len(prod) // groups
    means = [prod[g * per:(g + 1) * per].mean() for g in range(groups)]
    return float(np.median(means))
