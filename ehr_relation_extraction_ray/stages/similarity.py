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
