"""Deduplication operators over a documents table (doc_id, text).

Large-scale training-data dedup, Ray-Data-first:

* exact: content-hash partition + per-group min(doc_id) — the distributed
  form of the reference's ``drop_duplicates`` (``utils.py:553``) for whole
  documents. The shuffle moves (hash, doc_id) pairs, never text.
* MinHash + LSH near-dup: shingle -> minhash signature per batch
  (vectorized numpy), explode to (band, band_hash, doc_id) rows, one
  ``groupby(band, band_hash)`` -> candidate pairs -> exact-Jaccard verify.
* SimHash: 64-bit hyperplane-free simhash over token hashes; near-dup if
  Hamming distance <= k, bucketed by 4 x 16-bit sub-keys (pigeonhole: any
  pair within distance 3 shares at least one sub-key).
* n-gram Jaccard: exact pairwise Jaccard restricted to LSH candidates.
* embedding cosine near-dup: see stages/similarity.py.

All signatures are deterministic (fixed seeds); candidate emission is
symmetric-free (doc_a < doc_b).
"""

from __future__ import annotations

from typing import List, Tuple

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

import ray.data
from ray.data.aggregate import Count, Min

from ..functions.textstats import content_hash_64

# -- exact ------------------------------------------------------------------


def _hash_batch(batch: pa.Table, text_col: str) -> pa.Table:
    h = content_hash_64(batch[text_col].to_pylist())
    return batch.append_column("content_hash", pa.array(h.astype(np.int64)))


def exact_dedup(
    docs: "ray.data.Dataset", id_col: str = "doc_id", text_col: str = "text"
) -> "ray.data.Dataset":
    """Keep the min-id representative of every distinct text.

    Shape: map_batches(hash) -> groupby(hash).min(id). Only (hash, id)
    move through the shuffle; the survivor set is joined back by a
    broadcast-free second pass keyed on (hash, id) membership... in fact we
    return the (content_hash, doc_id) survivor table directly — callers
    semi-join it against the corpus when they need the text (the common
    case only needs the surviving ids).
    """
    hashed = docs.map_batches(
        lambda b: _hash_batch(b, text_col).select([id_col, "content_hash"]),
        batch_format="pyarrow",
    )
    return hashed.groupby("content_hash").aggregate(
        Min(id_col, alias_name="keep_id"), Count(alias_name="n_dups")
    )


# -- minhash / LSH ----------------------------------------------------------

_MERSENNE = (1 << 61) - 1


def _minhash_params(num_perm: int, seed: int = 7) -> Tuple[np.ndarray, np.ndarray]:
    # 31-bit coefficients x 32-bit shingle hashes keep a*h+b < 2^63: the
    # whole permutation table evaluates in native uint64 (no bigints).
    rng = np.random.default_rng(seed)
    a = rng.integers(1, 1 << 31, size=num_perm, dtype=np.uint64)
    b = rng.integers(0, 1 << 31, size=num_perm, dtype=np.uint64)
    return a, b



def _word_hashes(words) -> np.ndarray:
    """64-bit word hashes, vectorized (polars' rust kernel; content_hash_64
    fallback keeps the pure-numpy path working without polars)."""
    try:
        import polars as pl

        return pl.Series(words).hash(seed=101).to_numpy().astype(np.uint64)
    except ImportError:  # pragma: no cover
        return content_hash_64(list(words))


def word_shingle_hashes(text: str, k: int) -> np.ndarray:
    """Distinct k-word-shingle identities as 64-bit hashes WITHOUT building
    shingle strings: polynomial combine of word hashes over a sliding
    window — O(words) vector ops instead of O(shingles) string joins."""
    words = (text or "").lower().split()
    if not words:
        return np.zeros(0, dtype=np.uint64)
    wh = _word_hashes(words)
    P = np.uint64(1099511628211)
    with np.errstate(over="ignore"):
        if len(words) < k:
            powers = P ** np.arange(len(words), dtype=np.uint64)
            return np.array([np.sum(wh * powers, dtype=np.uint64)], dtype=np.uint64)
        from numpy.lib.stride_tricks import sliding_window_view

        win = sliding_window_view(wh, k)
        powers = P ** np.arange(k, dtype=np.uint64)
        return np.unique((win * powers[None, :]).sum(axis=1, dtype=np.uint64))


def shingle_hashes(text: str, k: int = 5) -> np.ndarray:
    """Distinct k-word-shingle hashes, folded to 32 bits (whitespace words,
    vectorized via word_shingle_hashes)."""
    h = word_shingle_hashes(text, k)
    if len(h) == 0:
        return np.zeros(1, dtype=np.uint64)
    return np.unique((h ^ (h >> np.uint64(32))) & np.uint64(0xFFFFFFFF))


def minhash_signature(
    hashes: np.ndarray, a: np.ndarray, b: np.ndarray
) -> np.ndarray:
    """num_perm minima of (a*h+b) mod p — one vectorized outer product."""
    vals = (hashes[:, None] * a[None, :] + b[None, :]) % np.uint64(_MERSENNE)
    return np.min(vals, axis=0)


def minhash_band_rows(
    batch: pa.Table,
    num_perm: int,
    bands: int,
    text_col: str,
    id_col: str,
) -> pa.Table:
    a, b = _minhash_params(num_perm)
    rows_per_band = num_perm // bands
    doc_ids: List[str] = []
    band_ids: List[int] = []
    band_hash: List[int] = []
    for doc_id, text in zip(
        batch[id_col].to_pylist(), batch[text_col].to_pylist()
    ):
        sig = minhash_signature(shingle_hashes(text), a, b)
        with np.errstate(over="ignore"):
            P = np.uint64(1099511628211)
            powers = P ** np.arange(rows_per_band, dtype=np.uint64)
            chunks = sig.reshape(bands, rows_per_band)
            hs = (chunks * powers[None, :]).sum(axis=1, dtype=np.uint64)
        for band in range(bands):
            doc_ids.append(str(doc_id))
            band_ids.append(band)
            band_hash.append(int(hs[band]) & 0x7FFFFFFFFFFFFFFF)
    return pa.table(
        {
            "doc_id": pa.array(doc_ids, pa.string()),
            "band": pa.array(band_ids, pa.int32()),
            "band_hash": pa.array(band_hash, pa.int64()),
        }
    )


def _bucket_pairs(group: pa.Table) -> pa.Table:
    ids = sorted(set(group["doc_id"].to_pylist()))
    a_out, b_out = [], []
    cap = 50  # guard: a degenerate bucket (all-identical docs) is quadratic
    for i, da in enumerate(ids[:cap]):
        for db in ids[i + 1 :][: cap]:
            a_out.append(da)
            b_out.append(db)
    return pa.table(
        {"doc_a": pa.array(a_out, pa.string()), "doc_b": pa.array(b_out, pa.string())}
    )


def minhash_lsh_pairs(
    docs: "ray.data.Dataset",
    num_perm: int = 64,
    bands: int = 16,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> "ray.data.Dataset":
    """Candidate near-dup pairs: banded minhash -> groupby bucket -> pairs.

    Distinct pairs via a final groupby on (doc_a, doc_b).
    """
    band_rows = docs.map_batches(
        lambda t: minhash_band_rows(t, num_perm, bands, text_col, id_col),
        batch_format="pyarrow",
    )
    pairs = band_rows.groupby(["band", "band_hash"]).map_groups(
        _bucket_pairs, batch_format="pyarrow"
    )
    return pairs.groupby(["doc_a", "doc_b"]).map_groups(
        lambda g: g.slice(0, 1), batch_format="pyarrow"
    )


def verify_jaccard(
    pairs: "ray.data.Dataset",
    docs: "ray.data.Dataset",
    threshold: float = 0.8,
    k: int = 5,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> "ray.data.Dataset":
    """Exact k-shingle Jaccard over candidate pairs.

    The candidate set is sparse (LSH output), so the doc texts needed per
    batch are fetched via a broadcast of the *candidate* doc set only:
    we semi-join docs down to candidate ids, pull that (small) table to the
    object store once, and verify pairs vectorized against it.
    """
    import ray

    pairs = pairs.materialize()  # LSH output is sparse; avoid re-execution
    cand_ids = set()
    for b in pairs.iter_batches(batch_format="pyarrow"):
        cand_ids.update(b["doc_a"].to_pylist())
        cand_ids.update(b["doc_b"].to_pylist())
    if not cand_ids:
        return pairs.map_batches(
            lambda t: t.append_column("jaccard", pa.array([], pa.float64())),
            batch_format="pyarrow",
        )
    id_ref = ray.put(cand_ids)

    def keep_cands(batch: pa.Table) -> pa.Table:
        ids = ray.get(id_ref)
        mask = pa.array([str(x) in ids for x in batch[id_col].to_pylist()])
        return batch.filter(mask).select([id_col, text_col])

    cand_docs = docs.map_batches(keep_cands, batch_format="pyarrow").to_pandas()
    shingles = {
        str(r[id_col]): set(shingle_hashes(r[text_col]).tolist())
        for _, r in cand_docs.iterrows()
    }
    sh_ref = ray.put(shingles)

    def verify(batch: pa.Table) -> pa.Table:
        sh = ray.get(sh_ref)
        jac = []
        for a_id, b_id in zip(
            batch["doc_a"].to_pylist(), batch["doc_b"].to_pylist()
        ):
            sa, sb = sh.get(a_id, set()), sh.get(b_id, set())
            inter = len(sa & sb)
            union = len(sa | sb)
            jac.append(inter / union if union else 0.0)
        out = batch.append_column("jaccard", pa.array(jac, pa.float64()))
        return out.filter(pc.greater_equal(out["jaccard"], threshold))

    return pairs.map_batches(verify, batch_format="pyarrow")


# -- exact n-gram Jaccard ---------------------------------------------------


def ngram_jaccard_pairs(
    docs: "ray.data.Dataset",
    threshold: float = 0.8,
    k: int = 5,
    df_cap: int = 64,
    text_col: str = "text",
    id_col: str = "doc_id",
):
    """Exact all-pairs k-word-shingle Jaccard >= threshold.

    Distributed shape (mirrors the SQL oracle exactly):
      1. explode distinct (shingle_hash, doc_id) rows per doc (map_batches)
      2. doc sizes: groupby(doc_id).count -> broadcast (vocabulary-sized)
      3. pair intersections: groupby(shingle) emits same-shingle doc pairs;
         shingles shared by more than ``df_cap`` docs are dropped on BOTH
         sides (boilerplate shingles are quadratic; an explicit shared
         parameter, not a silent cap)
      4. groupby(doc_a, doc_b).count -> jaccard = i / (|a|+|b|-i)

    Shingles are 64-bit hashes of the shingle *strings* (collision odds
    ~n^2 / 2^64 — negligible); Jaccard is exact over those sets.
    Returns a pandas DataFrame (doc_a, doc_b, jaccard rounded to 4).
    """
    import pandas as pd

    def explode(batch: pa.Table) -> pa.Table:
        ids, hashes = [], []
        for doc_id, text in zip(
            batch[id_col].to_pylist(), batch[text_col].to_pylist()
        ):
            h = word_shingle_hashes(text, k)
            if len(h) == 0:
                continue
            h = h.astype(np.int64)
            ids.extend([str(doc_id)] * len(h))
            hashes.extend(h.tolist())
        return pa.table(
            {
                "doc_id": pa.array(ids, pa.string()),
                "sh": pa.array(hashes, pa.int64()),
            }
        )

    shingles = docs.map_batches(explode, batch_format="pyarrow").materialize()
    sizes = dict(
        shingles.groupby("doc_id")
        .aggregate(Count(alias_name="n"))
        .to_pandas()
        .itertuples(index=False, name=None)
    )
    import ray as _ray

    sizes_ref = _ray.put(sizes)

    def pairs_in_group(group: pa.Table) -> pa.Table:
        ids = sorted(group["doc_id"].to_pylist())
        if len(ids) < 2 or len(ids) > df_cap:
            return pa.table(
                {"doc_a": pa.array([], pa.string()), "doc_b": pa.array([], pa.string())}
            )
        a_out, b_out = [], []
        for i in range(len(ids)):
            for j in range(i + 1, len(ids)):
                a_out.append(ids[i])
                b_out.append(ids[j])
        return pa.table(
            {"doc_a": pa.array(a_out, pa.string()), "doc_b": pa.array(b_out, pa.string())}
        )

    pair_rows = shingles.groupby("sh").map_groups(pairs_in_group, batch_format="pyarrow")
    inter = pair_rows.groupby(["doc_a", "doc_b"]).aggregate(Count(alias_name="i"))

    def finish(batch: pa.Table) -> pa.Table:
        sz = _ray.get(sizes_ref)
        df = batch.to_pandas()
        na = df["doc_a"].map(sz)
        nb = df["doc_b"].map(sz)
        df["jaccard"] = (df["i"] / (na + nb - df["i"])).round(4)
        df = df[df["jaccard"] >= threshold][["doc_a", "doc_b", "jaccard"]]
        return pa.Table.from_pandas(df, preserve_index=False)

    out = inter.map_batches(finish, batch_format="pyarrow").to_pandas()
    return out.sort_values(["doc_a", "doc_b"]).reset_index(drop=True)


# -- simhash ----------------------------------------------------------------


def simhash64(text: str) -> int:
    words = text.lower().split()
    if not words:
        return 0
    hashes = _word_hashes(words)
    bits = ((hashes[:, None] >> np.arange(64, dtype=np.uint64)[None, :]) & 1).astype(
        np.int64
    )
    votes = (2 * bits - 1).sum(axis=0)
    return int(
        np.bitwise_or.reduce(
            (votes > 0).astype(np.uint64) << np.arange(64, dtype=np.uint64)
        )
    )


def simhash_batch(batch: pa.Table, text_col: str = "text") -> pa.Table:
    sh = [simhash64(t) for t in batch[text_col].to_pylist()]
    arr = np.array(sh, dtype=np.uint64)
    out = batch.append_column("simhash", pa.array(arr.astype(np.int64)))
    for i in range(4):  # 16-bit sub-keys: pigeonhole bucketing for dist<=3
        sub = ((arr >> np.uint64(16 * i)) & np.uint64(0xFFFF)).astype(np.int32)
        out = out.append_column(f"sub{i}", pa.array(sub))
    return out


def simhash_near_pairs(
    docs: "ray.data.Dataset",
    max_hamming: int = 3,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> "ray.data.Dataset":
    """Near-dup pairs by simhash: 4 bucket-groupbys (one per 16-bit sub-key),
    Hamming verify inside each bucket, distinct at the end."""
    signed = docs.map_batches(
        lambda t: simhash_batch(t, text_col).select(
            [id_col, "simhash", "sub0", "sub1", "sub2", "sub3"]
        ),
        batch_format="pyarrow",
    ).materialize()  # tiny (id + 5 ints); read by 4 bucket groupbys

    def bucket_verify(group: pa.Table) -> pa.Table:
        ids = group[id_col].to_pylist()
        hashes = np.asarray(group["simhash"], dtype=np.int64).astype(np.uint64)
        a_out, b_out, d_out = [], [], []
        n = min(len(ids), 200)  # degenerate-bucket guard
        for i in range(n):
            x = hashes[i + 1 : n] ^ hashes[i]
            dist = np.array([bin(int(v)).count("1") for v in x])
            for j in np.nonzero(dist <= max_hamming)[0]:
                a, b = sorted((str(ids[i]), str(ids[i + 1 + j])))
                a_out.append(a)
                b_out.append(b)
                d_out.append(int(dist[j]))
        return pa.table(
            {
                "doc_a": pa.array(a_out, pa.string()),
                "doc_b": pa.array(b_out, pa.string()),
                "hamming": pa.array(d_out, pa.int32()),
            }
        )

    parts = [
        signed.groupby(f"sub{i}").map_groups(bucket_verify, batch_format="pyarrow")
        for i in range(4)
    ]
    all_pairs = parts[0].union(*parts[1:])
    return all_pairs.groupby(["doc_a", "doc_b"]).map_groups(
        lambda g: g.slice(0, 1), batch_format="pyarrow"
    )
