"""Similarity search over an embedding column (list<float>).

* brute-force cosine top-k: the query matrix (small) is ``ray.put`` once;
  every batch computes one numpy matmul against it and emits its local
  top-k per query; a single small ``groupby(query_id)`` merge keeps the
  global top-k. The corpus streams — nothing materializes.
* IVF (inverted-file) variant: k-means centroids trained on a sample
  (driver-side, centroids are tiny), every vector assigned to its nearest
  centroid in a batch pass; queries probe only ``nprobe`` nearest lists.
  The scale path: assignment is a partition key, so at 100 TB each probe
  touches ``nprobe / nlist`` of the corpus.
* embedding cosine near-dup: all pairs with cosine >= threshold among
  bucket neighbors (IVF cell co-membership as the blocking key).
"""

from __future__ import annotations

from typing import Optional

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

import ray
import ray.data


def _batch_matrix(batch: pa.Table, vec_col: str) -> np.ndarray:
    col = batch[vec_col]
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    # zero-copy-ish: values buffer reshaped when fixed-length
    values = np.asarray(col.values)
    dim = len(values) // len(batch) if len(batch) else 0
    return values.reshape(len(batch), dim).astype(np.float64, copy=False)


def _normalize(m: np.ndarray) -> np.ndarray:
    norms = np.linalg.norm(m, axis=1, keepdims=True)
    norms[norms == 0] = 1.0
    return m / norms


def brute_force_topk(
    vectors: "ray.data.Dataset",
    queries: np.ndarray,
    query_ids: Optional[np.ndarray] = None,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> pd.DataFrame:
    """Global cosine top-k per query: streamed partial top-k + driver merge.

    Returns (query_id, vec_id, score, rank) — k rows per query.
    """
    qn = _normalize(np.asarray(queries, dtype=np.float64))
    q_ref = ray.put(qn)
    if query_ids is None:
        query_ids = np.arange(len(qn))

    def local_topk(batch: pa.Table) -> pa.Table:
        q = ray.get(q_ref)
        m = _normalize(_batch_matrix(batch, vec_col))
        sims = m @ q.T  # (batch, nq)
        ids = np.asarray(batch[id_col])
        kk = min(k, len(ids))
        top = np.argpartition(-sims, kk - 1, axis=0)[:kk]  # (kk, nq)
        out_q, out_id, out_s = [], [], []
        for qi in range(q.shape[0]):
            rows = top[:, qi]
            out_q.extend([qi] * len(rows))
            out_id.extend(ids[rows].tolist())
            out_s.extend(sims[rows, qi].astype(np.float64).tolist())
        return pa.table(
            {
                "query_pos": pa.array(out_q, pa.int32()),
                id_col: pa.array(out_id, pa.int64()),
                "score": pa.array(out_s, pa.float64()),
            }
        )

    partials = vectors.map_batches(local_topk, batch_format="pyarrow").to_pandas()
    out = []
    for qi, sub in partials.groupby("query_pos"):
        sub = sub.nlargest(k, "score").sort_values(
            ["score", id_col], ascending=[False, True]
        )
        sub = sub.assign(
            query_id=query_ids[qi], rank=np.arange(1, len(sub) + 1)
        )
        out.append(sub[["query_id", id_col, "score", "rank"]])
    return (
        pd.concat(out, ignore_index=True)
        if out
        else pd.DataFrame(columns=["query_id", id_col, "score", "rank"])
    )


def train_centroids(
    vectors: "ray.data.Dataset",
    nlist: int = 16,
    sample_size: int = 2048,
    iters: int = 10,
    seed: int = 13,
    vec_col: str = "embedding",
) -> np.ndarray:
    """Plain k-means on a driver-side sample (centroids are broadcast-tiny)."""
    sample = vectors.limit(sample_size).to_pandas()
    m = _normalize(
        np.stack([np.asarray(v, dtype=np.float32) for v in sample[vec_col]])
    )
    rng = np.random.default_rng(seed)
    cent = m[rng.choice(len(m), size=min(nlist, len(m)), replace=False)]
    for _ in range(iters):
        assign = np.argmax(m @ cent.T, axis=1)
        for c in range(len(cent)):
            members = m[assign == c]
            if len(members):
                cent[c] = members.mean(axis=0)
        cent = _normalize(cent)
    return cent


def ivf_assign(
    vectors: "ray.data.Dataset",
    centroids: np.ndarray,
    vec_col: str = "embedding",
) -> "ray.data.Dataset":
    """Add an ``ivf_cell`` column (nearest centroid): the partition key."""
    c_ref = ray.put(np.asarray(centroids, dtype=np.float32))

    def assign(batch: pa.Table) -> pa.Table:
        cent = ray.get(c_ref)
        m = _normalize(_batch_matrix(batch, vec_col))
        cell = np.argmax(m @ cent.T, axis=1).astype(np.int32)
        return batch.append_column("ivf_cell", pa.array(cell))

    return vectors.map_batches(assign, batch_format="pyarrow")


def ivf_topk(
    assigned: "ray.data.Dataset",
    centroids: np.ndarray,
    queries: np.ndarray,
    k: int = 10,
    nprobe: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> pd.DataFrame:
    """Probe only the nprobe nearest cells per query, in ONE streamed pass:
    each batch scores a query only against its rows in probed cells. At
    100 TB the cells are Parquet partition keys, so probing prunes the read
    itself; here it prunes the matmul."""
    qn = _normalize(np.asarray(queries, dtype=np.float32))
    cent = np.asarray(centroids, dtype=np.float32)
    probe = np.argsort(-(qn @ cent.T), axis=1)[:, :nprobe]
    probe_mask = np.zeros((len(qn), len(cent)), dtype=bool)
    for qi, row in enumerate(probe):
        probe_mask[qi, row] = True
    state_ref = ray.put((qn, probe_mask))

    def local_topk(batch: pa.Table) -> pa.Table:
        q, pm = ray.get(state_ref)
        cells = np.asarray(batch["ivf_cell"])
        m = _normalize(_batch_matrix(batch, vec_col))
        ids = np.asarray(batch[id_col])
        out_q, out_id, out_s = [], [], []
        for qi in range(q.shape[0]):
            mask = pm[qi][cells]
            if not mask.any():
                continue
            sims = m[mask] @ q[qi]
            sub_ids = ids[mask]
            kk = min(k, len(sub_ids))
            top = np.argpartition(-sims, kk - 1)[:kk]
            out_q.extend([qi] * kk)
            out_id.extend(sub_ids[top].tolist())
            out_s.extend(sims[top].astype(np.float64).tolist())
        return pa.table(
            {
                "query_pos": pa.array(out_q, pa.int32()),
                id_col: pa.array(out_id, pa.int64()),
                "score": pa.array(out_s, pa.float64()),
            }
        )

    partials = assigned.map_batches(local_topk, batch_format="pyarrow").to_pandas()
    out = []
    for qi, sub in partials.groupby("query_pos"):
        top = sub.nlargest(k, "score").sort_values(
            ["score", id_col], ascending=[False, True]
        )
        top = top.assign(query_id=qi, rank=np.arange(1, len(top) + 1))
        out.append(top[["query_id", id_col, "score", "rank"]])
    return (
        pd.concat(out, ignore_index=True)
        if out
        else pd.DataFrame(columns=["query_id", id_col, "score", "rank"])
    )


def cosine_dup_pairs_exact(
    vectors: "ray.data.Dataset",
    threshold: float = 0.9,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> pd.DataFrame:
    """Embedding-cosine near-dup, exact: every pair with cosine >= threshold.

    The normalized corpus matrix is broadcast once (``ray.put``) and each
    streamed batch does one matmul against it, emitting only its ``a < b``
    half — O(n^2) flops but O(batch) memory per task. This is the oracle /
    small-side variant; at 100 TB use ``cosine_dup_pairs_lsh`` (the
    broadcast matrix must fit in the object store).
    """
    ref = vectors.select_columns([id_col, vec_col]).to_pandas()
    ids_all = ref[id_col].to_numpy()
    m_all = _normalize(
        np.stack([np.asarray(v, dtype=np.float64) for v in ref[vec_col]])
    )
    state = ray.put((ids_all, m_all))

    def pairs(batch: pa.Table) -> pa.Table:
        ids_a, m = ray.get(state)
        mb = _normalize(_batch_matrix(batch, vec_col))
        ids_b = np.asarray(batch[id_col])
        sims = mb @ m.T  # (batch, n)
        bi, ai = np.nonzero(sims >= threshold)
        keep = ids_b[bi] < ids_a[ai]
        return pa.table(
            {
                "id_a": pa.array(ids_b[bi][keep], pa.int64()),
                "id_b": pa.array(ids_a[ai][keep], pa.int64()),
                "cosine": pa.array(
                    np.round(sims[bi, ai][keep], 4), pa.float64()
                ),
            }
        )

    out = vectors.map_batches(pairs, batch_format="pyarrow").to_pandas()
    if out.empty or "id_a" not in out.columns:
        # zero pairs: Ray drops empty blocks and to_pandas loses columns
        return pd.DataFrame(
            {"id_a": pd.Series([], dtype="int64"),
             "id_b": pd.Series([], dtype="int64"),
             "cosine": pd.Series([], dtype="float64")}
        )
    return out.sort_values(["id_a", "id_b"]).reset_index(drop=True)


_SRP_PLANES_CACHE: dict = {}


def _srp_planes(dim: int, nbits: int, seed: int) -> np.ndarray:
    """SRP hyperplanes, generated ONCE per worker process (deterministic
    from the seed, so every worker derives the identical matrix with no
    driver broadcast needed — and no per-batch regeneration, VERDICT r1)."""
    key = (dim, nbits, seed)
    planes = _SRP_PLANES_CACHE.get(key)
    if planes is None:
        rng = np.random.default_rng(seed)
        planes = rng.standard_normal((dim, nbits))
        _SRP_PLANES_CACHE[key] = planes
    return planes


def srp_signatures(
    vectors: "ray.data.Dataset",
    nbits: int = 64,
    bands: int = 8,
    seed: int = 29,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int | None = None,
) -> "ray.data.Dataset":
    """Signed-random-projection signatures, banded for LSH blocking.

    Emits ``bands`` rows per vector: (id, band, bucket) where bucket packs
    ``nbits/bands`` sign bits of ``m @ R``. Two vectors land in the same
    (band, bucket) with probability ``(1 - theta/pi)^(nbits/bands)`` —
    the banding trades precision for recall exactly like MinHash-LSH.
    """
    bits_per_band = nbits // bands

    def sign_rows(batch: pa.Table) -> pa.Table:
        m = _normalize(_batch_matrix(batch, vec_col))
        planes = _srp_planes(m.shape[1], nbits, seed)
        bits = (m @ planes) >= 0  # (n, nbits)
        weights = (1 << np.arange(bits_per_band, dtype=np.uint64))
        ids = np.asarray(batch[id_col])
        out_id, out_band, out_bucket = [], [], []
        for b in range(bands):
            chunk = bits[:, b * bits_per_band : (b + 1) * bits_per_band]
            bucket = (chunk.astype(np.uint64) * weights).sum(axis=1)
            out_id.append(ids)
            out_band.append(np.full(len(ids), b, dtype=np.int32))
            out_bucket.append(bucket)
        return pa.table(
            {
                id_col: pa.array(np.concatenate(out_id), pa.int64()),
                "band": pa.array(np.concatenate(out_band), pa.int32()),
                "bucket": pa.array(np.concatenate(out_bucket), pa.uint64()),
            }
        )

    return vectors.map_batches(sign_rows, batch_format="pyarrow")


def cosine_dup_pairs_lsh(
    vectors: "ray.data.Dataset",
    threshold: float = 0.9,
    nbits: int = 64,
    bands: int = 8,
    seed: int = 29,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> pd.DataFrame:
    """Scale path: SRP-LSH blocking + within-bucket exact cosine verify.

    Candidate pairs come from a ``groupby(band, bucket)`` shuffle of the
    (tiny) signature rows; only candidates are verified against real
    vectors — the corpus matrix never gathers in one place. Approximate:
    recall < 1 for pairs right at the threshold (tune nbits/bands).
    """
    sigs = srp_signatures(vectors, nbits, bands, seed, id_col, vec_col)

    def bucket_pairs_partition(part: pa.Table) -> pa.Table:
        """Pairs for every (band, bucket) of one hash partition — one
        Python call per partition, not one per distinct bucket (corpus x
        bands micro-groups at scale). Buckets are runs of the lexsorted
        (band, bucket) columns."""
        empty = pa.table(
            {"id_a": pa.array([], pa.int64()), "id_b": pa.array([], pa.int64())}
        )
        if part.num_rows == 0:
            return empty
        band = np.asarray(part["band"])
        bucket = np.asarray(part["bucket"])
        ids = np.asarray(part[id_col])
        order = np.lexsort((ids, bucket, band))
        band, bucket, ids = band[order], bucket[order], ids[order]
        change = np.flatnonzero(
            (band[1:] != band[:-1]) | (bucket[1:] != bucket[:-1])
        ) + 1
        starts = np.concatenate(([0], change))
        ends = np.concatenate((change, [len(band)]))
        a_parts, b_parts = [], []
        for s, e in zip(starts, ends):
            if e - s < 2:
                continue
            uids = ids[s:e]
            uids = uids[np.concatenate(([True], uids[1:] != uids[:-1]))]
            if len(uids) < 2:
                continue
            iu, ju = np.triu_indices(len(uids), k=1)
            a_parts.append(uids[iu])
            b_parts.append(uids[ju])
        if not a_parts:
            return empty
        return pa.table(
            {
                "id_a": pa.array(np.concatenate(a_parts), pa.int64()),
                "id_b": pa.array(np.concatenate(b_parts), pa.int64()),
            }
        )

    # no candidate-distinct shuffle: the verify join dedups membership rows
    # inside each partition (duplicates from multiple agreeing bands are
    # identical rows), saving one all-to-all exchange
    from ..functions.partitioning import groupby_partition

    cand = groupby_partition(
        sigs, ["band", "bucket"], bucket_pairs_partition
    )

    # verify via a co-group join: membership rows (vec_id, pair side) union
    # the vectors table, grouped by vec_id -> (pair_id, side, embedding)
    # rows -> grouped by pair -> one dot product. No id-list filter exprs,
    # no driver materialization (VERDICT r1).
    def membership(batch: pa.Table) -> pa.Table:
        a = np.asarray(batch["id_a"])
        b = np.asarray(batch["id_b"])
        return pa.table(
            {
                id_col: pa.array(np.concatenate([a, b]), pa.int64()),
                vec_col: pa.nulls(2 * len(a), pa.list_(pa.float64())),
                "other": pa.array(np.concatenate([b, a]), pa.int64()),
                "side": pa.array(
                    np.concatenate(
                        [np.zeros(len(a), np.int8), np.ones(len(b), np.int8)]
                    )
                ),
            }
        )

    def tag_vectors(batch: pa.Table) -> pa.Table:
        emb = batch[vec_col]
        if isinstance(emb, pa.ChunkedArray):
            emb = emb.combine_chunks()
        return pa.table(
            {
                id_col: pc.cast(batch[id_col], pa.int64()),
                vec_col: emb.cast(pa.list_(pa.float64())),
                "other": pa.nulls(batch.num_rows, pa.int64()),
                "side": pa.nulls(batch.num_rows, pa.int8()),
            }
        )

    tagged = cand.map_batches(membership, batch_format="pyarrow").union(
        vectors.select_columns([id_col, vec_col]).map_batches(
            tag_vectors, batch_format="pyarrow"
        )
    )

    # partition-granular co-groups (64 vectorized Python calls per stage,
    # not one per vector/pair — the same shape as dedupe.verify_jaccard)
    num_partitions = 64

    def add_vec_part(t: pa.Table) -> pa.Table:
        part = (np.asarray(t[id_col]) % num_partitions).astype(np.int32)
        return t.append_column("_part", pa.array(part))

    def emit_vec_rows_partition(group: pa.Table) -> pa.Table:
        members = group.filter(pc.is_valid(group["other"]))
        empty = pa.table(
            {
                "pair_id": pa.array([], pa.string()),
                "side": pa.array([], pa.int8()),
                vec_col: pa.array([], pa.list_(pa.float64())),
            }
        )
        if members.num_rows == 0:
            return empty
        vec_rows = group.filter(pc.is_null(group["side"]))
        lut = {
            i: v
            for i, v in zip(
                vec_rows[id_col].to_pylist(), vec_rows[vec_col].to_pylist()
            )
        }
        mem = (
            members.select([id_col, "other", "side"]).to_pandas().drop_duplicates()
        )
        me = mem[id_col].to_numpy()
        others = mem["other"].to_numpy()
        sides = mem["side"].to_numpy()
        pid = np.where(
            sides == 0,
            np.char.add(np.char.add(me.astype(str), ":"), others.astype(str)),
            np.char.add(np.char.add(others.astype(str), ":"), me.astype(str)),
        )
        have = np.asarray([int(i) in lut for i in me])
        if not have.any():
            return empty
        return pa.table(
            {
                "pair_id": pa.array(pid[have], pa.string()),
                "side": pa.array(sides[have].astype(np.int8)),
                vec_col: pa.array(
                    [lut[int(i)] for i in me[have]], pa.list_(pa.float64())
                ),
            }
        )

    vec_sides = (
        tagged.map_batches(add_vec_part, batch_format="pyarrow")
        .groupby("_part")
        .map_groups(emit_vec_rows_partition, batch_format="pyarrow")
    )

    def add_pair_part(t: pa.Table) -> pa.Table:
        import zlib

        # crc32, NOT hash(): Python string hashing is salted per process,
        # which would scatter a pair's two rows into different partitions
        h = np.asarray(
            [zlib.crc32(p.encode()) for p in t["pair_id"].to_pylist()],
            dtype=np.uint64,
        )
        return t.append_column(
            "_part", pa.array((h % num_partitions).astype(np.int32))
        )

    def cosine_partition(group: pa.Table) -> pa.Table:
        empty = pa.table(
            {
                "id_a": pa.array([], pa.int64()),
                "id_b": pa.array([], pa.int64()),
                "cosine": pa.array([], pa.float64()),
            }
        )
        if group.num_rows == 0:
            return empty
        cats, codes = np.unique(
            np.asarray(group["pair_id"].to_pylist(), dtype=object),
            return_inverse=True,
        )
        m = _normalize(_batch_matrix(group, vec_col))
        side = np.asarray(group["side"])
        # rows per pair: exactly one side-0 and one side-1 when both vectors
        # resolved; dot the two matrices row-aligned by pair code
        a_rows = np.full(len(cats), -1)
        b_rows = np.full(len(cats), -1)
        a_rows[codes[side == 0]] = np.nonzero(side == 0)[0]
        b_rows[codes[side == 1]] = np.nonzero(side == 1)[0]
        ok = (a_rows >= 0) & (b_rows >= 0)
        if not ok.any():
            return empty
        cos = np.einsum("ij,ij->i", m[a_rows[ok]], m[b_rows[ok]])
        keep = cos >= threshold
        if not keep.any():
            return empty
        split = np.char.partition(cats[ok][keep].astype(str), ":")
        return pa.table(
            {
                "id_a": pa.array(split[:, 0].astype(np.int64)),
                "id_b": pa.array(split[:, 2].astype(np.int64)),
                "cosine": pa.array(np.round(cos[keep], 4), pa.float64()),
            }
        )

    out = (
        vec_sides.map_batches(add_pair_part, batch_format="pyarrow")
        .groupby("_part")
        .map_groups(cosine_partition, batch_format="pyarrow")
        .to_pandas()
    )
    if out.empty:
        return pd.DataFrame(columns=["id_a", "id_b", "cosine"])
    return out.sort_values(["id_a", "id_b"]).reset_index(drop=True)


def dim_stats(vectors: "ray.data.Dataset", vec_col: str = "embedding") -> pa.Table:
    """Per-dimension mean / population-stddev of an embedding column.

    Combiner pattern: each block reduces to one (dims x 3) partial —
    n, sum, sum-of-squares per dimension via one numpy matrix pass —
    and the driver merges the (dims x blocks)-bounded partials (playbook:
    a Ray groupby costs ~1.2 s fixed; the partial table here is tiny and
    dimension-bounded, never O(rows)). At 100 TB this is one streaming
    scan; the reduce side is KBs.
    """
    def partial(batch: pa.Table) -> pa.Table:
        m = _batch_matrix(batch, vec_col).astype(np.float64)
        d = m.shape[1]
        return pa.table(
            {
                "dim": pa.array(np.arange(1, d + 1, dtype=np.int64)),
                "n": pa.array(np.full(d, m.shape[0], dtype=np.int64)),
                "s": pa.array(m.sum(axis=0)),
                "s2": pa.array((m * m).sum(axis=0)),
            }
        )

    parts = (
        vectors.map_batches(partial, batch_format="pyarrow").to_pandas()
        .groupby("dim").sum().reset_index()
    )
    mean = parts["s"] / parts["n"]
    sd = np.sqrt(parts["s2"] / parts["n"] - mean * mean)
    return pa.table(
        {
            "dim": pa.array(parts["dim"].to_numpy(dtype=np.int64)),
            "n": pa.array(parts["n"].to_numpy(dtype=np.int64)),
            "mean": pa.array(np.round(mean.to_numpy(), 6)),
            "sd": pa.array(np.round(sd.to_numpy(), 6)),
        }
    )


def pca_top_component(
    vectors: "ray.data.Dataset", vec_col: str = "embedding", iters: int = 100
) -> pa.Table:
    """Top principal component via one distributed covariance pass + driver
    power iteration.

    Combiner shape: each block reduces to (n, sum, X^T X) — the Gram
    partial is d x d (64 x 64 = 32 KB of doubles), so the driver merge is
    (blocks x d^2)-bounded and the corpus streams through exactly once
    with zero shuffles; the O(d^2) eigen-step runs on the merged matrix.
    Deterministic: fixed start vector, fixed iteration count, sign fixed
    by making the max-|loading| component positive (the fixture oracle
    re-runs the identical serial spec)."""

    def partial(batch: pa.Table) -> pa.Table:
        m = _batch_matrix(batch, vec_col).astype(np.float64)
        return pa.table(
            {
                "n": pa.array([m.shape[0]], pa.int64()),
                "s": pa.array([m.sum(axis=0)], pa.list_(pa.float64())),
                "xtx": pa.array([(m.T @ m).ravel()], pa.list_(pa.float64())),
            }
        )

    parts = vectors.map_batches(partial, batch_format="pyarrow").to_pandas()
    n = int(parts["n"].sum())
    s = np.sum(np.stack(parts["s"].to_numpy()), axis=0)
    xtx = np.sum(np.stack(parts["xtx"].to_numpy()), axis=0)
    d = len(s)
    mean = s / n
    cov = xtx.reshape(d, d) / n - np.outer(mean, mean)
    return pa.table(power_iteration_table(cov, iters))


def power_iteration_table(cov: np.ndarray, iters: int) -> dict:
    """Deterministic power iteration on a covariance matrix -> loading
    table (shared by the distributed path and the serial fixture oracle)."""
    d = cov.shape[0]
    v = np.ones(d) / np.sqrt(d)
    for _ in range(iters):
        v = cov @ v
        v /= np.linalg.norm(v)
    lam = float(v @ cov @ v)
    if v[np.argmax(np.abs(v))] < 0:
        v = -v
    return {
        "dim": np.arange(1, d + 1, dtype=np.int64),
        "loading": np.round(v, 6),
        "eigval": np.round(np.full(d, lam), 4),
        "var_ratio": np.round(np.full(d, lam / float(np.trace(cov))), 6),
    }


def semdedup_pairs(
    vectors: "ray.data.Dataset",
    nlist: int = 8,
    threshold: float = 0.95,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> pd.DataFrame:
    """SemDeDup-style embedding near-dup pairs (Abbas et al. 2023):
    cluster first, then compare ONLY within a cluster — the k-means cell
    prunes the O(n^2) all-pairs to per-cell blocks.

    Scale shape: centroids are sample-fit on the driver and broadcast
    (train_centroids); one map_batches pass assigns cells; then a
    partition-granular pass (groupby_partition on the cell — ONE shuffle
    keyed by the same ivf_cell the ANN path uses) computes the per-cell
    cosine matrix in float64 and emits pairs >= threshold. Cell
    population is ~corpus/nlist: at scale nlist grows with the corpus
    (SemDeDup runs 50k+ clusters) so a cell stays worker-sized; the
    all-pairs fallback never materializes.

    Returns (vec_a, vec_b, cos) with vec_a < vec_b, canonically sorted.
    """
    cent = train_centroids(vectors, nlist=nlist, vec_col=vec_col)
    assigned = ivf_assign(vectors, cent, vec_col=vec_col)

    from ..functions.partitioning import groupby_partition

    out_schema = pa.schema(
        [("vec_a", pa.int64()), ("vec_b", pa.int64()), ("cos", pa.float64())]
    )

    def cell_pairs(part: pa.Table) -> pa.Table:
        df = part.to_pandas()
        rows_a, rows_b, rows_c = [], [], []
        for _, g in df.groupby("ivf_cell", sort=False):
            if len(g) < 2:
                continue
            ids = g[id_col].to_numpy()
            m = _normalize(
                np.stack([np.asarray(v, dtype=np.float32) for v in g[vec_col]])
            ).astype(np.float64)
            sims = m @ m.T
            ai, bi = np.triu_indices(len(g), k=1)
            keep = sims[ai, bi] >= threshold
            a, b = ids[ai[keep]], ids[bi[keep]]
            lo, hi = np.minimum(a, b), np.maximum(a, b)
            rows_a.append(lo)
            rows_b.append(hi)
            rows_c.append(np.round(sims[ai[keep], bi[keep]], 6))
        if not rows_a:
            return out_schema.empty_table()
        return pa.table(
            {
                "vec_a": np.concatenate(rows_a).astype(np.int64),
                "vec_b": np.concatenate(rows_b).astype(np.int64),
                "cos": np.concatenate(rows_c),
            }
        )

    pairs = groupby_partition(
        assigned, "ivf_cell", cell_pairs, schema=out_schema
    ).to_pandas()
    if pairs.empty:
        return pd.DataFrame(
            {"vec_a": pd.Series([], dtype="int64"),
             "vec_b": pd.Series([], dtype="int64"),
             "cos": pd.Series([], dtype="float64")}
        )
    return pairs.sort_values(["vec_a", "vec_b"]).reset_index(drop=True)


def train_pq_codebooks(
    vectors: "ray.data.Dataset",
    m_sub: int = 8,
    ksub: int = 16,
    sample_size: int = 2048,
    iters: int = 10,
    seed: int = 13,
    vec_col: str = "embedding",
) -> np.ndarray:
    """Product-quantization codebooks (Jegou et al. 2011, "Product
    Quantization for Nearest Neighbor Search"): the (normalized) vector
    space is split into ``m_sub`` contiguous subspaces and each gets its
    own ``ksub``-word Euclidean k-means codebook, trained on a driver-side
    sample — the codebooks are m_sub x ksub x dsub floats (kilobytes), the
    canonical broadcast-small model state. One rng seeded once; its state
    advances across subspaces, so the whole training is deterministic.

    Returns float64 array of shape (m_sub, ksub, dsub).
    """
    sample = vectors.limit(sample_size).to_pandas()
    m = _normalize(
        np.stack([np.asarray(v, dtype=np.float64) for v in sample[vec_col]])
    )
    dim = m.shape[1]
    if dim % m_sub:
        raise ValueError(f"dim {dim} not divisible by m_sub {m_sub}")
    dsub = dim // m_sub
    rng = np.random.default_rng(seed)
    books = np.empty((m_sub, ksub, dsub), dtype=np.float64)
    for j in range(m_sub):
        sub = m[:, j * dsub : (j + 1) * dsub]
        cb = sub[rng.choice(len(sub), size=min(ksub, len(sub)), replace=False)].copy()
        for _ in range(iters):
            d = ((sub[:, None, :] - cb[None, :, :]) ** 2).sum(axis=2)
            assign = np.argmin(d, axis=1)
            for c in range(len(cb)):
                members = sub[assign == c]
                if len(members):
                    cb[c] = members.mean(axis=0)
        books[j, : len(cb)] = cb
        if len(cb) < ksub:  # tiny sample: repeat last codeword
            books[j, len(cb) :] = cb[-1]
    return books


def pq_encode_scores(
    m: np.ndarray, books: np.ndarray, queries: np.ndarray
) -> np.ndarray:
    """ADC scoring for one batch: encode rows of ``m`` to per-subspace
    codes (argmin Euclidean), then score = sum over subspaces of the
    query/codeword partial dot products — a LUT gather, no full matmul.
    Returns (len(m), len(queries)) float64 scores."""
    m_sub, ksub, dsub = books.shape
    scores = np.zeros((len(m), len(queries)), dtype=np.float64)
    for j in range(m_sub):
        sub = m[:, j * dsub : (j + 1) * dsub]
        d = ((sub[:, None, :] - books[j][None, :, :]) ** 2).sum(axis=2)
        codes = np.argmin(d, axis=1)  # (batch,)
        lut = books[j] @ queries[:, j * dsub : (j + 1) * dsub].T  # (ksub, nq)
        scores += lut[codes]
    return scores


def pq_topk(
    vectors: "ray.data.Dataset",
    books: np.ndarray,
    queries: np.ndarray,
    query_ids: Optional[np.ndarray] = None,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> pd.DataFrame:
    """PQ-ADC approximate top-k: codebooks ``ray.put`` once, every batch
    encodes + scores with the LUT gather and emits its local top-k, the
    driver merges the (blocks x k x nq)-bounded partials. Quantization
    makes score TIES likely (identical codes => identical scores), so the
    ordering is the total order (score desc, vec_id asc) at BOTH the
    local and merge steps — block-split invariant by construction.

    Returns (query_id, vec_id, score, rank), k rows per query.
    """
    qn = _normalize(np.asarray(queries, dtype=np.float64))
    b_ref = ray.put(np.asarray(books, dtype=np.float64))
    if query_ids is None:
        query_ids = np.arange(len(qn))

    def local_topk(batch: pa.Table) -> pa.Table:
        from ..functions.broadcast import bget

        bks = bget(b_ref)
        m = _normalize(_batch_matrix(batch, vec_col))
        sims = pq_encode_scores(m, bks, qn)  # (batch, nq)
        ids = np.asarray(batch[id_col])
        kk = min(k, len(ids))
        out_q, out_id, out_s = [], [], []
        for qi in range(qn.shape[0]):
            order = np.lexsort((ids, -sims[:, qi]))[:kk]
            out_q.extend([qi] * len(order))
            out_id.extend(ids[order].tolist())
            out_s.extend(sims[order, qi].astype(np.float64).tolist())
        return pa.table(
            {
                "query_pos": pa.array(out_q, pa.int32()),
                id_col: pa.array(out_id, pa.int64()),
                "score": pa.array(out_s, pa.float64()),
            }
        )

    partials = vectors.map_batches(local_topk, batch_format="pyarrow").to_pandas()
    out = []
    for qi, sub in partials.groupby("query_pos"):
        ids = sub[id_col].to_numpy()
        scores = sub["score"].to_numpy()
        order = np.lexsort((ids, -scores))[:k]
        out.append(
            pd.DataFrame(
                {
                    "query_id": query_ids[qi],
                    id_col: ids[order],
                    "score": scores[order],
                    "rank": np.arange(1, len(order) + 1),
                }
            )
        )
    return (
        pd.concat(out, ignore_index=True)
        if out
        else pd.DataFrame(columns=["query_id", id_col, "score", "rank"])
    )


def kmeans_full(
    vectors: "ray.data.Dataset",
    k: int = 8,
    iters: int = 3,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> np.ndarray:
    """FULL-corpus Lloyd iterations (vs :func:`train_centroids`' driver-
    sample fit): the canonical iterative-ML-over-Dataset shape. Each
    round is ONE streamed pass emitting per-block (cell, count, sum)
    partials — k x d x blocks floats to the driver, never vectors — and
    the centroid update is driver math; the new centroids re-broadcast
    next round. Deterministic: init = the k lowest-``id_col`` vectors,
    euclidean assignment with lowest-cell tiebreak, no RNG.

    Returns the (k, d) float64 centroid matrix after ``iters`` rounds.

    The vector blocks pin once as Arrow object refs (functions/rounds) so
    each Lloyd round is one raw task per block — no per-round Dataset
    executor launch and no re-read of the input per round; partials merge
    in block order, bit-identical to the map_batches path.
    """
    from ..functions import rounds

    init = (
        vectors.filter(expr=f"{id_col} < {k}")
        .to_pandas()
        .sort_values(id_col)
    )
    cent = np.stack(
        [np.asarray(v, dtype=np.float64) for v in init[vec_col]]
    )

    vrefs = rounds.block_refs(vectors.materialize())

    def partials(t: pa.Table, c: np.ndarray) -> pa.Table:
        m = np.stack(
            [np.asarray(v, dtype=np.float64) for v in t[vec_col].to_pylist()]
        )
        d2 = ((m[:, None, :] - c[None, :, :]) ** 2).sum(axis=2)
        assign = d2.argmin(axis=1)  # argmin takes the LOWEST cell on ties
        kk, dd = c.shape
        counts = np.bincount(assign, minlength=kk).astype(np.int64)
        sums = np.zeros((kk, dd))
        np.add.at(sums, assign, m)
        return pa.table(
            {
                "cell": pa.array(np.arange(kk, dtype=np.int64)),
                "n": pa.array(counts),
                "s": pa.array(list(sums), pa.list_(pa.float64())),
            }
        )

    for _ in range(iters):
        cent_ref = ray.put(cent)
        p = pa.concat_tables(rounds.round_map(vrefs, partials, cent_ref)).to_pandas()
        kk, dd = cent.shape
        n = np.zeros(kk, dtype=np.int64)
        s = np.zeros((kk, dd))
        for _, row in p.iterrows():
            n[row["cell"]] += row["n"]
            s[row["cell"]] += np.asarray(row["s"])
        nonzero = n > 0
        cent = cent.copy()
        cent[nonzero] = s[nonzero] / n[nonzero, None]
    return cent


def logreg_full_batch(
    vectors: "ray.data.Dataset",
    epochs: int = 5,
    lr: float = 0.5,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> np.ndarray:
    """Full-batch logistic regression by distributed gradient descent —
    the training-loop companion to :func:`kmeans_full`. Synthetic but
    deterministic labels (``vec_id % 2``); each epoch is one streamed
    pass emitting per-block (gradient-sum, count) partials (d+1 floats x
    blocks), the driver applies the averaged-gradient step and
    re-broadcasts the weights. Float64 throughout; block structure
    cannot change the result because the gradient sum is exact.

    Returns the (d+1,) weight vector (bias last) after ``epochs`` steps.

    Blocks pin once (functions/rounds): each epoch is one raw task per
    block, no Dataset re-execution or input re-read per epoch.
    """
    from ..functions import rounds

    d = len(np.asarray(vectors.limit(1).to_pandas()[vec_col].iloc[0]))
    w = np.zeros(d + 1)
    vrefs = rounds.block_refs(vectors.materialize())

    def grad(t: pa.Table, ww: np.ndarray) -> pa.Table:
        m = np.stack(
            [np.asarray(v, dtype=np.float64) for v in t[vec_col].to_pylist()]
        )
        y = (np.asarray(t[id_col]).astype(np.int64) % 2).astype(np.float64)
        z = m @ ww[:-1] + ww[-1]
        pr = 1.0 / (1.0 + np.exp(-z))
        err = pr - y
        g = np.concatenate([m.T @ err, [err.sum()]])
        return pa.table(
            {"g": pa.array([g], pa.list_(pa.float64())),
             "n": pa.array([len(y)], pa.int64())}
        )

    for _ in range(epochs):
        w_ref = ray.put(w)
        p = pa.concat_tables(rounds.round_map(vrefs, grad, w_ref)).to_pandas()
        total_n = int(p["n"].sum())
        gsum = np.sum(np.stack([np.asarray(x) for x in p["g"]]), axis=0)
        w = w - lr * gsum / max(total_n, 1)
    return w


def knn_graph(
    vectors: "ray.data.Dataset",
    k: int = 5,
    nlist: int = 8,
    probes: int = 2,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> pd.DataFrame:
    """Approximate kNN GRAPH construction (every point's top-k neighbors)
    — the all-points companion of :func:`ivf_topk` and the input artifact
    for kNN-graph dedup / graph-based ANN indexes (HNSW ground layer) /
    label propagation over embeddings.

    IVF-blocked, never all-pairs: centroids are sample-fit once and
    broadcast; ONE map_batches pass assigns every point its primary cell
    (candidate home) and its ``probes`` nearest cells (query fan-out,
    stable argsort so ties are deterministic); ONE cell-keyed partition
    pass computes the (queries x members) cosine block per cell in
    float64 and emits per-cell top-k partials; ONE point-keyed size-aware
    exchange merges each point's partials to the global top-k, ranked by
    (-cos, nbr_id). A point's candidates live in exactly one cell, so
    partials never duplicate a neighbor. At scale nlist grows with the
    corpus (cells stay worker-sized) and the exchanges stay keyed by
    cell/point ids — payload vectors move once, to their probed cells.

    Returns (vec_id, rank, nbr_id, cos): up to k rows per point (self
    excluded), cos rounded to 6 AFTER selection.
    """
    from ..functions.partitioning import groupby_partition

    cent = train_centroids(vectors, nlist=nlist, vec_col=vec_col)
    c_ref = ray.put(np.asarray(cent, dtype=np.float32))

    def fan_out(batch: pa.Table) -> pa.Table:
        c = ray.get(c_ref)
        m = _normalize(_batch_matrix(batch, vec_col))
        ids = np.asarray(batch[id_col], dtype=np.int64)
        scores = m @ c.T
        order = np.argsort(-scores, axis=1, kind="stable")[:, :probes]
        n, p = order.shape
        rep_ids = np.repeat(ids, p)
        rep_m = np.repeat(m, p, axis=0)
        cells = order.reshape(-1).astype(np.int32)
        is_member = np.zeros(n * p, dtype=bool)
        is_member[::p] = True  # primary cell = candidate home
        return pa.table(
            {
                "vec_id": rep_ids,
                "cell": cells,
                "is_member": is_member,
                "vec": pa.array(list(rep_m), pa.list_(pa.float64())),
            }
        )

    fanned = vectors.select_columns([id_col, vec_col]).map_batches(
        fan_out, batch_format="pyarrow"
    )
    part_schema = pa.schema(
        [("vec_id", pa.int64()), ("nbr_id", pa.int64()), ("cos", pa.float64())]
    )

    def cell_topk(part: pa.Table) -> pa.Table:
        df = part.to_pandas()
        out_q, out_n, out_c = [], [], []
        for _, g in df.groupby("cell", sort=False):
            mem = g[g["is_member"]]
            if mem.empty:
                continue
            qm = np.stack(g["vec"].to_numpy())
            mm = np.stack(mem["vec"].to_numpy())
            qids = g["vec_id"].to_numpy()
            mids = mem["vec_id"].to_numpy()
            sims = qm @ mm.T
            sims[qids[:, None] == mids[None, :]] = -np.inf  # self
            kk = min(k, sims.shape[1])
            # per-query top-k by (-cos, nbr_id): lexsort on each row
            idx = np.lexsort((mids[None, :].repeat(len(qids), 0), -sims), axis=1)[
                :, :kk
            ]
            rows = np.repeat(np.arange(len(qids)), kk)
            cols = idx.reshape(-1)
            keep = np.isfinite(sims[rows, cols])
            out_q.append(qids[rows[keep]])
            out_n.append(mids[cols[keep]])
            out_c.append(sims[rows[keep], cols[keep]])
        if not out_q:
            return part_schema.empty_table()
        return pa.table(
            {
                "vec_id": np.concatenate(out_q).astype(np.int64),
                "nbr_id": np.concatenate(out_n).astype(np.int64),
                "cos": np.concatenate(out_c),
            }
        )

    partials = groupby_partition(fanned, "cell", cell_topk, schema=part_schema)
    out_schema = pa.schema(
        [("vec_id", pa.int64()), ("rank", pa.int64()),
         ("nbr_id", pa.int64()), ("cos", pa.float64())]
    )

    def merge_topk(part: pa.Table) -> pa.Table:
        df = part.to_pandas()
        if df.empty:
            return out_schema.empty_table()
        df = df.sort_values(
            ["vec_id", "cos", "nbr_id"], ascending=[True, False, True],
            kind="stable",
        )
        df["rank"] = df.groupby("vec_id", sort=False).cumcount() + 1
        df = df[df["rank"] <= k]
        return pa.table(
            {
                "vec_id": df["vec_id"].to_numpy(dtype=np.int64),
                "rank": df["rank"].to_numpy(dtype=np.int64),
                "nbr_id": df["nbr_id"].to_numpy(dtype=np.int64),
                "cos": np.round(df["cos"].to_numpy(dtype=np.float64), 6),
            }
        )

    out = groupby_partition(
        partials, "vec_id", merge_topk, schema=out_schema, size_aware=True
    ).to_pandas()
    if out.empty:
        return pd.DataFrame(
            {"vec_id": pd.Series([], dtype="int64"),
             "rank": pd.Series([], dtype="int64"),
             "nbr_id": pd.Series([], dtype="int64"),
             "cos": pd.Series([], dtype="float64")})
    return out.sort_values(["vec_id", "rank"]).reset_index(drop=True)
