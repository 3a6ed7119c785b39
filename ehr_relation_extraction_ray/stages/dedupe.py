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
from ray.data.aggregate import Count, Min, Sum

from ..functions.textstats import content_hash_64

# -- exact ------------------------------------------------------------------


def _hash_batch(batch: pa.Table, text_col: str) -> pa.Table:
    h = content_hash_64(batch[text_col].to_pylist())
    return batch.append_column("content_hash", pa.array(h.astype(np.int64)))


def _md5_batch(batch: pa.Table, text_col: str) -> pa.Table:
    import hashlib

    h = [
        hashlib.md5((t or "").encode("utf-8", "surrogatepass")).hexdigest()
        for t in batch[text_col].to_pylist()
    ]
    return batch.append_column("text_md5", pa.array(h, pa.string()))


def exact_dedup(
    docs: "ray.data.Dataset", id_col: str = "doc_id", text_col: str = "text"
) -> "ray.data.Dataset":
    """Keep the min-id representative of every distinct text.

    Shape: map_batches(md5) -> groupby(md5).min(id). Only (md5, id) pairs
    move through the shuffle; the survivor set is the (text_md5, keep_id)
    table directly — callers semi-join it against the corpus when they need
    the text (the common case only needs the surviving ids).

    The group key is the full 128-bit md5 digest, not a 64-bit
    non-cryptographic hash: on a path labeled "exact" a constructible
    collision must not silently merge distinct documents (ADVICE round 1).
    """
    hashed = docs.map_batches(
        lambda b: _md5_batch(b, text_col).select([id_col, "text_md5"]),
        batch_format="pyarrow",
    )
    return hashed.groupby("text_md5").aggregate(
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
    """64-bit word hashes — textstats.vec_string_hash_64 (pure numpy, one
    implementation everywhere; see its docstring for why the former
    polars path was removed)."""
    from ..functions.textstats import vec_string_hash_64

    return vec_string_hash_64(words)


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
    ids = [str(x) for x in batch[id_col].to_pylist()]
    texts = batch[text_col].to_pylist()
    n = len(ids)
    # NOTE (measured, do not "vectorize across docs"): a whole-batch
    # variant (concatenated word stream + np.minimum.reduceat segment
    # minima) benches 0.8-0.95x of this loop on both real sf0.1 docs and
    # synthetic short docs — numpy's U-dtype code matrix is padded to the
    # BATCH-max word length, and the big (shingles x perms) temps lose the
    # per-doc cache locality. The per-doc numpy calls below are already
    # ~50-shingle x num_perm dense ops, so loop overhead is minor.
    hs = np.zeros((n, bands), dtype=np.uint64)
    with np.errstate(over="ignore"):
        P = np.uint64(1099511628211)
        powers = P ** np.arange(rows_per_band, dtype=np.uint64)
        for i, text in enumerate(texts):
            sig = minhash_signature(shingle_hashes(text), a, b)
            chunks = sig.reshape(bands, rows_per_band)
            hs[i] = (chunks * powers[None, :]).sum(axis=1, dtype=np.uint64)
    return pa.table(
        {
            "doc_id": pa.array(
                np.repeat(np.asarray(ids, dtype=object), bands), pa.string()
            ),
            "band": pa.array(np.tile(np.arange(bands, dtype=np.int32), n)),
            "band_hash": pa.array(
                (hs & np.uint64(0x7FFFFFFFFFFFFFFF)).astype(np.int64).ravel()
            ),
        }
    )


def _sorted_ids_pairs(ids: List[str]) -> Tuple[np.ndarray, np.ndarray]:
    """All i<j pairs of a sorted id list, vectorized (no Python double loop)."""
    arr = np.asarray(ids, dtype=object)
    iu, ju = np.triu_indices(len(arr), k=1)
    return arr[iu], arr[ju]


def _log_bucket_overflow(
    overflow_dir: "str | None", stage: str, bucket_key: str, n_ids: int, cap: int
) -> None:
    """Record a truncated bucket — the repo's 'no silent caps' rule (see
    candidates.py max_pairs_per_window). With an ``overflow_dir``, one
    structured row goes to the quarantine side-output (no driver
    round-trip, no shared state); without one, a logging.warning still
    fires so the recall loss is never invisible."""
    if overflow_dir is None:
        import logging

        logging.getLogger(__name__).warning(
            "%s bucket %s: size %d > cap %d; pairs truncated "
            "(pass overflow_dir= to capture structured overflow records)",
            stage, bucket_key, n_ids, cap,
        )
        return
    from ..state.quarantine import Quarantine

    q = Quarantine(overflow_dir, stage=stage)
    with q.guard(bucket_key):
        raise OverflowError(f"bucket size {n_ids} > cap {cap}; pairs truncated")
    q.flush()


def _bucket_pairs(
    group: pa.Table, cap: int = 512, overflow_dir: str | None = None
) -> pa.Table:
    """All pairs within one LSH bucket. Buckets larger than ``cap`` are
    truncated to the first ``cap`` ids (sorted) AND recorded as an overflow
    row — never silently (a degenerate bucket of near-identical boilerplate
    is quadratic; at that size exact_dedup is the right tool)."""
    ids = sorted(set(group["doc_id"].to_pylist()))
    if len(ids) > cap:
        key = f"{group['band'][0].as_py()}:{group['band_hash'][0].as_py()}"
        _log_bucket_overflow(overflow_dir, "minhash_bucket", key, len(ids), cap)
        ids = ids[:cap]
    a, b = _sorted_ids_pairs(ids)
    return pa.table(
        {"doc_a": pa.array(a, pa.string()), "doc_b": pa.array(b, pa.string())}
    )


_PAIRS_SCHEMA = pa.schema([("doc_a", pa.string()), ("doc_b", pa.string())])


def _distinct_by_pair(
    ds: "ray.data.Dataset", num_partitions: int = 64
) -> "ray.data.Dataset":
    """Distinct rows by (doc_a, doc_b) at PARTITION granularity — one
    hash-partition groupby with ``num_partitions`` vectorized dedup calls,
    not one ``map_groups`` call per distinct pair (candidate-count
    micro-groups at scale). Duplicate rows are identical by construction
    (a pair re-emitted by another band / sub-key carries the same payload),
    so keeping the pandas-dedup first row is deterministic."""

    def add_pair_part(t: pa.Table) -> pa.Table:
        h = content_hash_64(
            [
                f"{a}\x1f{b}"
                for a, b in zip(t["doc_a"].to_pylist(), t["doc_b"].to_pylist())
            ]
        )
        part = (h % np.uint64(num_partitions)).astype(np.int32)
        return t.append_column("_part", pa.array(part))

    def distinct_partition(g: pa.Table) -> pa.Table:
        g = g.drop_columns(["_part"])
        if g.num_rows == 0:
            return g
        df = g.to_pandas().drop_duplicates(subset=["doc_a", "doc_b"])
        return pa.Table.from_pandas(df, preserve_index=False).cast(g.schema)

    return (
        ds.map_batches(add_pair_part, batch_format="pyarrow")
        .groupby("_part")
        .map_groups(distinct_partition, batch_format="pyarrow")
    )



_LSH_BUCKET_PARTITIONS = 64


def _add_bucket_part(t: pa.Table, num_partitions: int = _LSH_BUCKET_PARTITIONS) -> pa.Table:
    """Hash (band, band_hash) into a fixed partition id — the SINGLE
    definition of the LSH bucket->partition mapping (shared by the
    within-corpus and cross-corpus variants so their shuffle behavior
    can never desynchronize)."""
    bh = np.asarray(t["band_hash"]).astype(np.uint64)
    bd = np.asarray(t["band"]).astype(np.uint64)
    part = ((bh * np.uint64(1000003) + bd) % np.uint64(num_partitions)).astype(
        np.int32
    )
    return t.append_column("_part", pa.array(part))


def _bucket_pairs_partition(
    part: pa.Table, cap: int = 512, overflow_dir: str | None = None
) -> pa.Table:
    """All pairs within every LSH bucket of one hash PARTITION of band rows
    — one Python call per partition (64 per stage), not one per bucket
    (which is one per distinct (band, band_hash): corpus x bands calls at
    scale, the round-1 micro-group bottleneck). Buckets are runs of the
    lexsorted (band, band_hash) columns; each run >= 2 emits its triangle
    (same semantics as :func:`_bucket_pairs`, including the cap +
    overflow record)."""
    if part.num_rows == 0:
        return _PAIRS_SCHEMA.empty_table()
    band = np.asarray(part["band"])
    bh = np.asarray(part["band_hash"])
    ids = np.asarray(part["doc_id"].to_pylist(), dtype=object)
    order = np.lexsort((ids, bh, band))
    band, bh, ids = band[order], bh[order], ids[order]
    change = np.flatnonzero((band[1:] != band[:-1]) | (bh[1:] != bh[:-1])) + 1
    starts = np.concatenate(([0], change))
    ends = np.concatenate((change, [len(band)]))
    a_parts, b_parts = [], []
    for s, e in zip(starts, ends):
        if e - s < 2:
            continue
        uids = ids[s:e]
        uids = uids[np.concatenate(([True], uids[1:] != uids[:-1]))]  # sorted dedup
        if len(uids) < 2:
            continue
        if len(uids) > cap:
            _log_bucket_overflow(
                overflow_dir,
                "minhash_bucket",
                f"{band[s]}:{bh[s]}",
                len(uids),
                cap,
            )
            uids = uids[:cap]
        iu, ju = np.triu_indices(len(uids), k=1)
        a_parts.append(uids[iu])
        b_parts.append(uids[ju])
    if not a_parts:
        return _PAIRS_SCHEMA.empty_table()
    return pa.table(
        {
            "doc_a": pa.array(np.concatenate(a_parts), pa.string()),
            "doc_b": pa.array(np.concatenate(b_parts), pa.string()),
        }
    )


def minhash_lsh_pairs(
    docs: "ray.data.Dataset",
    num_perm: int = 64,
    bands: int = 16,
    text_col: str = "text",
    id_col: str = "doc_id",
    bucket_cap: int = 512,
    overflow_dir: str | None = None,
    distinct: bool = True,
) -> "ray.data.Dataset":
    """Candidate near-dup pairs: banded minhash -> groupby bucket -> pairs.

    Distinct pairs via a final groupby on (doc_a, doc_b). Buckets above
    ``bucket_cap`` ids truncate WITH an overflow record in ``overflow_dir``
    (state/quarantine side-output) — no silent recall loss.

    ``distinct=False`` skips the distinct shuffle and may emit the same
    pair once per agreeing band — :func:`verify_jaccard` dedups internally,
    so the LSH->verify composition saves one all-to-all exchange.
    """
    band_rows = docs.map_batches(
        lambda t: minhash_band_rows(t, num_perm, bands, text_col, id_col),
        batch_format="pyarrow",
    )

    # bucket at PARTITION granularity: one vectorized Python call per
    # partition, not one per distinct bucket (corpus x bands micro-groups
    # at scale); mapping shared via _add_bucket_part. Band rows are the
    # reduced (id, band, band_hash) projection, so the exchange is sized
    # from their actual bytes (coalesce_small) — a bucket hashes to ONE
    # partition at any count, so the emitted pairs are identical.
    from ..functions.partitioning import coalesce_small

    band_rows, num_partitions = coalesce_small(
        band_rows, _LSH_BUCKET_PARTITIONS
    )

    pairs = (
        band_rows.map_batches(
            lambda t: _add_bucket_part(t, num_partitions),
            batch_format="pyarrow",
        )
        .groupby("_part")
        .map_groups(
            lambda g: _bucket_pairs_partition(g, bucket_cap, overflow_dir),
            batch_format="pyarrow",
        )
    )
    if not distinct:
        return pairs
    return _distinct_by_pair(pairs, num_partitions)


# ASCII unit separator: survives numpy unicode arrays (NUL would be
# treated as fixed-width padding and stripped by np.repeat round-trips).
_PAIR_SEP = "\x1f"

_VERIFY_SIDES = pa.schema(
    [
        ("pair_id", pa.string()),
        ("side", pa.int8()),
        ("sh", pa.large_list(pa.int64())),
    ]
)


def verify_jaccard(
    pairs: "ray.data.Dataset",
    docs: "ray.data.Dataset",
    threshold: float = 0.8,
    k: int = 5,
    text_col: str = "text",
    id_col: str = "doc_id",
    broadcast_limit: int = 2_000_000,
) -> "ray.data.Dataset":
    """Exact k-shingle Jaccard over candidate pairs — fully distributed.

    Texts and shingle sets are NEVER collected on the driver (VERDICT
    round 1). Two execution paths, picked by candidate-pair count:

    * ``<= broadcast_limit`` pairs (the overwhelmingly common case — LSH
      candidates are a vanishing fraction of the corpus): the (doc_a,
      doc_b) id pairs — ids only, never texts — are broadcast via one
      ``ray.put``, each doc partition emits its shingle set tagged with
      the pair memberships it appears in, and ONE ``groupby(pair_id)``
      reduces. One all-to-all instead of two.
    * above the limit (boilerplate-heavy corpus, corpus-scale candidate
      set): fall back to the fully distributed co-group join
      (:func:`_verify_jaccard_cogroup`) — membership rows are unioned
      with the docs table and co-grouped by doc_id, so nothing bigger
      than one partition ever sits in one place.
    """
    pairs = pairs.materialize()  # consumed twice (count + verify); stays
    # in the object store — materialize() never collects to the driver
    n_pairs = pairs.count()
    if n_pairs == 0:  # empty candidate set: keep the output schema intact
        return ray.data.from_arrow(
            pa.table(
                {
                    "doc_a": pa.array([], pa.string()),
                    "doc_b": pa.array([], pa.string()),
                    "jaccard": pa.array([], pa.float64()),
                }
            )
        )
    if n_pairs <= broadcast_limit:
        return _verify_jaccard_broadcast(
            pairs, docs, threshold, k, text_col, id_col
        )
    return _verify_jaccard_cogroup(pairs, docs, threshold, k, text_col, id_col)


def _pair_reduce(
    sides: "ray.data.Dataset", threshold: float, num_partitions: int = 64
) -> "ray.data.Dataset":
    """groupby(pair partition) -> per-partition vectorized Jaccard over
    (pair_id, side, sh list<int64>) rows. Group size is bounded by one
    partition's pairs x 2 shingle sets, never the corpus. The sides table
    is candidate-bounded, so the exchange is sized from its actual bytes
    (coalesce_small) — pair->partition assignment is per-pair, so the
    verified set is identical at any partition count."""
    from ..functions.partitioning import coalesce_small

    sides, num_partitions = coalesce_small(sides, num_partitions)

    def add_pair_part(t: pa.Table) -> pa.Table:
        h = content_hash_64(t["pair_id"].to_pylist())
        part = (h % np.uint64(num_partitions)).astype(np.int32)
        return t.append_column("_part", pa.array(part))

    def jaccard_partition(group: pa.Table) -> pa.Table:
        empty = pa.table(
            {
                "doc_a": pa.array([], pa.string()),
                "doc_b": pa.array([], pa.string()),
                "jaccard": pa.array([], pa.float64()),
            }
        )
        if group.num_rows == 0:
            return empty
        cats, row_codes = np.unique(
            np.asarray(group["pair_id"].to_pylist(), dtype=object),
            return_inverse=True,
        )
        # flatten the list<int64> payload: one (code, shingle) pair per
        # shingle, exactly the round-1 exploded layout — but built locally
        # after the shuffle instead of shuffled row-by-row
        sh = pc.list_flatten(group["sh"]).to_numpy()
        lengths = pc.list_value_length(group["sh"]).to_numpy().astype(np.int64)
        codes = np.repeat(row_codes, lengths)
        order = np.lexsort((sh, codes))
        cs, ss = codes[order], sh[order]
        # a (pair, shingle) appearing twice == one side each -> intersection
        dup = (cs[1:] == cs[:-1]) & (ss[1:] == ss[:-1])
        inter = np.bincount(cs[1:][dup], minlength=len(cats))
        total = np.bincount(cs, minlength=len(cats))
        union = total - inter
        with np.errstate(invalid="ignore", divide="ignore"):
            jac = np.where(union > 0, inter / np.maximum(union, 1), 0.0)
        keep = jac >= threshold
        if not keep.any():
            return empty
        split = np.char.partition(cats[keep].astype(str), _PAIR_SEP)
        return pa.table(
            {
                "doc_a": pa.array(split[:, 0], pa.string()),
                "doc_b": pa.array(split[:, 2], pa.string()),
                "jaccard": pa.array(jac[keep], pa.float64()),
            }
        )

    return (
        sides.map_batches(add_pair_part, batch_format="pyarrow")
        .groupby("_part")
        .map_groups(jaccard_partition, batch_format="pyarrow")
    )


def _shingle_list_table(
    pids: np.ndarray, sides_arr: np.ndarray, sh_parts, len_parts
) -> pa.Table:
    lengths = np.concatenate(len_parts)
    offsets = np.concatenate(([0], np.cumsum(lengths)))
    lists = pa.LargeListArray.from_arrays(
        pa.array(offsets, pa.int64()),
        pa.array(np.concatenate(sh_parts), pa.int64()),
    )
    return pa.table(
        {
            "pair_id": pa.array(pids, pa.string()),
            "side": pa.array(sides_arr.astype(np.int8)),
            "sh": lists,
        }
    )


def _verify_jaccard_broadcast(
    pairs: "ray.data.Dataset",
    docs: "ray.data.Dataset",
    threshold: float,
    k: int,
    text_col: str,
    id_col: str,
) -> "ray.data.Dataset":
    """Single-shuffle verify: broadcast the candidate ID pairs (bounded by
    ``broadcast_limit`` — ids only, no texts) via one ``ray.put``; each doc
    batch emits (pair_id, side, shingle-set) rows for its member docs with
    NO doc-side shuffle; one groupby(pair partition) reduces."""
    import ray as _ray

    mem = (
        pairs.select_columns(["doc_a", "doc_b"])
        .to_pandas()
        .drop_duplicates(ignore_index=True)
    )
    pid = (mem["doc_a"] + _PAIR_SEP + mem["doc_b"]).to_numpy(dtype=object)
    doc_ids = np.concatenate(
        [mem["doc_a"].to_numpy(dtype=object), mem["doc_b"].to_numpy(dtype=object)]
    )
    pids2 = np.concatenate([pid, pid])
    sides2 = np.concatenate(
        [np.zeros(len(pid), dtype=np.int8), np.ones(len(pid), dtype=np.int8)]
    )
    order = np.argsort(doc_ids)
    doc_ids, pids2, sides2 = doc_ids[order], pids2[order], sides2[order]
    # run-length index: doc -> slice into the (pid, side) arrays
    first = np.concatenate(([True], doc_ids[1:] != doc_ids[:-1]))
    starts = np.flatnonzero(first)
    ends = np.concatenate((starts[1:], [len(doc_ids)]))
    index = {
        doc_ids[s]: (s, e) for s, e in zip(starts, ends)
    }
    ref = _ray.put((index, pids2, sides2))

    def emit(batch: pa.Table) -> pa.Table:
        index, pids2, sides2 = _ray.get(ref)  # plasma-cached per worker
        pid_parts, side_parts, sh_parts, len_parts = [], [], [], []
        for doc, text in zip(
            batch[id_col].to_pylist(), batch[text_col].to_pylist()
        ):
            se = index.get(str(doc))
            if se is None:
                continue
            s, e = se
            sh = word_shingle_hashes(text or "", k).astype(np.int64)
            pid_parts.append(pids2[s:e])
            side_parts.append(sides2[s:e])
            sh_parts.append(np.tile(sh, e - s))
            len_parts.append(np.full(e - s, len(sh), dtype=np.int64))
        if not pid_parts:
            return _VERIFY_SIDES.empty_table()
        return _shingle_list_table(
            np.concatenate(pid_parts),
            np.concatenate(side_parts),
            sh_parts,
            len_parts,
        )

    sides = docs.select_columns([id_col, text_col]).map_batches(
        emit, batch_format="pyarrow"
    )
    return _pair_reduce(sides, threshold)


def _verify_jaccard_cogroup(
    pairs: "ray.data.Dataset",
    docs: "ray.data.Dataset",
    threshold: float = 0.8,
    k: int = 5,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> "ray.data.Dataset":
    """Fully distributed co-group verify (the corpus-scale-candidates
    path):

    1. Pair membership rows (doc_id, pair_id, side) are unioned with the
       docs table and co-grouped by ``doc_id`` (the tagged-union groupby
       join pattern, sources/conll.attach_mentions). Inside each group the
       doc's k-shingle set is computed ONCE and emitted as
       (pair_id, side, sh) rows — shingles are computed only for docs that
       appear in at least one candidate pair (semi-join for free).
    2. ``groupby(pair_id)`` brings the two shingle sets of one pair
       together (group size is bounded by 2x one doc's shingles, never the
       corpus); Jaccard = |A∩B| / |A∪B| via one numpy unique.

    The shuffle volume is O(candidate pairs x shingles-per-doc) — the
    standard distributed-verify cost; when that is too hot, dial LSH bands
    down so fewer candidates reach the verify.
    """

    def membership(batch: pa.Table) -> pa.Table:
        a = batch["doc_a"].to_pylist()
        b = batch["doc_b"].to_pylist()
        pid = [f"{x}{_PAIR_SEP}{y}" for x, y in zip(a, b)]
        return pa.table(
            {
                id_col: pa.array(a + b, pa.string()),
                text_col: pa.nulls(2 * len(a), pa.large_string()),
                "pair_id": pa.array(pid + pid, pa.string()),
                "side": pa.array([0] * len(a) + [1] * len(b), pa.int8()),
            }
        )

    def tag_docs(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                id_col: pc.cast(batch[id_col], pa.string()),
                text_col: pc.cast(batch[text_col], pa.large_string()),
                "pair_id": pa.nulls(batch.num_rows, pa.string()),
                "side": pa.nulls(batch.num_rows, pa.int8()),
            }
        )

    tagged = pairs.map_batches(membership, batch_format="pyarrow").union(
        docs.select_columns([id_col, text_col]).map_batches(
            tag_docs, batch_format="pyarrow"
        )
    )

    # both co-groups run at PARTITION granularity (hash of the key), not
    # one Python map_groups call per doc/pair — 64 vectorized calls per
    # stage instead of millions of micro-groups at corpus scale.
    num_partitions = 64

    def add_doc_part(t: pa.Table) -> pa.Table:
        h = content_hash_64([str(x) for x in t[id_col].to_pylist()])
        part = (h % np.uint64(num_partitions)).astype(np.int32)
        return t.append_column("_part", pa.array(part))

    def emit_shingles_partition(group: pa.Table) -> pa.Table:
        members = group.filter(pc.is_valid(group["pair_id"]))
        if members.num_rows == 0:  # no candidate pair in this partition
            return _VERIFY_SIDES.empty_table()
        text_rows = group.filter(pc.is_valid(group[text_col]))
        texts = dict(
            zip(text_rows[id_col].to_pylist(), text_rows[text_col].to_pylist())
        )
        pid_parts, side_parts, sh_parts, len_parts = [], [], [], []
        # dedup membership rows: an upstream LSH emitting one pair per
        # agreeing band (distinct=False) produces identical rows here.
        # Arrow-native distinct (group_by with no aggregates) — no pandas
        # conversion on the verify path (round-4 VERDICT item 5).
        mem = (
            members.select([id_col, "pair_id", "side"])
            .group_by([id_col, "pair_id", "side"], use_threads=False)
            .aggregate([])
        )
        m_ids = mem[id_col].to_pylist()
        m_pids = np.asarray(mem["pair_id"].to_pylist(), dtype=object)
        m_sides = np.asarray(mem["side"].to_pylist(), dtype=np.int8)
        order = np.argsort(np.asarray(m_ids, dtype=object))
        # one shingle computation per DOC (membership rows grouped by doc);
        # one OUTPUT ROW per (pair, side) carrying the shingle set as a
        # list<int64> payload — the pair-id/side keys shuffle once per
        # side, not once per shingle (round-1 exploded one row per
        # (pair, side, shingle): ~shingles-per-doc x more key bytes).
        i = 0
        while i < len(order):
            j = i
            doc = m_ids[order[i]]
            while j < len(order) and m_ids[order[j]] == doc:
                j += 1
            # 64-bit shingle identities (same kernel as ngram_jaccard_pairs):
            # collision odds ~n^2/2^64 per pair, so the verified Jaccard
            # equals the exact string-shingle Jaccard (the SQL oracle).
            sh = word_shingle_hashes(texts.get(doc, ""), k).astype(np.int64)
            idx = order[i:j]
            pid_parts.append(m_pids[idx])
            side_parts.append(m_sides[idx])
            sh_parts.append(np.tile(sh, len(idx)))
            len_parts.append(np.full(len(idx), len(sh), dtype=np.int64))
            i = j
        return _shingle_list_table(
            np.concatenate(pid_parts),
            np.concatenate(side_parts),
            sh_parts,
            len_parts,
        )

    sides = (
        tagged.map_batches(add_doc_part, batch_format="pyarrow")
        .groupby("_part")
        .map_groups(emit_shingles_partition, batch_format="pyarrow")
    )
    return _pair_reduce(sides, threshold, num_partitions)


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
    # doc sizes: per-block combiner counts + driver-side sum — no shuffle.
    # (A doc's shingles may straddle blocks after dynamic splitting, hence
    # the final pandas sum; the collected table is one row per (block, doc),
    # bounded by the per-doc-size dict this operator broadcasts anyway.)
    sizes = (
        shingles.map_batches(
            lambda t: t.group_by("doc_id", use_threads=False)
            .aggregate([([], "count_all")])
            .rename_columns(["doc_id", "n"]),
            batch_format="pyarrow",
        )
        .to_pandas()
        .groupby("doc_id")["n"]
        .sum()
        .to_dict()
    )
    import ray as _ray

    sizes_ref = _ray.put(sizes)

    num_partitions = 64

    def pairs_in_partition(group: pa.Table) -> pa.Table:
        """Vectorized same-shingle pair emission over ONE hash partition of
        the exploded rows (64 Python calls total — not one per distinct
        shingle, which at corpus scale is millions of micro-groups).

        Sort by (sh, doc) once; each equal-sh run of length c contributes
        its triu pairs; runs of the same length are emitted in one batched
        fancy-index + triu_indices call."""
        sh = np.asarray(group["sh"])
        cats, codes = np.unique(
            np.asarray(group["doc_id"].to_pylist(), dtype=object),
            return_inverse=True,
        )
        order = np.lexsort((codes, sh))
        sh_s, code_s = sh[order], codes[order]
        _, starts, counts = np.unique(sh_s, return_index=True, return_counts=True)
        keep = (counts >= 2) & (counts <= df_cap)
        a_parts, b_parts = [], []
        for c in np.unique(counts[keep]):
            run_starts = starts[keep][counts[keep] == c]
            mat = code_s[run_starts[:, None] + np.arange(c)[None, :]]
            iu, ju = np.triu_indices(c, k=1)
            a_parts.append(mat[:, iu].ravel())
            b_parts.append(mat[:, ju].ravel())
        if not a_parts:
            return pa.table(
                {
                    "doc_a": pa.array([], pa.string()),
                    "doc_b": pa.array([], pa.string()),
                    "i": pa.array([], pa.int64()),
                }
            )
        # pre-aggregate (combiner): count same-pair hits locally so the
        # final groupby shuffles one row per distinct pair per partition,
        # not one row per shared shingle
        ac = np.concatenate(a_parts)
        bc = np.concatenate(b_parts)
        key = ac.astype(np.int64) * len(cats) + bc.astype(np.int64)
        uk, cnt = np.unique(key, return_counts=True)
        a = cats[(uk // len(cats)).astype(np.int64)]
        b = cats[(uk % len(cats)).astype(np.int64)]
        return pa.table(
            {
                "doc_a": pa.array(a, pa.string()),
                "doc_b": pa.array(b, pa.string()),
                "i": pa.array(cnt.astype(np.int64)),
            }
        )

    parted = shingles.map_batches(
        lambda t: t.append_column(
            "_part",
            pa.array(
                (np.asarray(t["sh"]).astype(np.uint64) % np.uint64(num_partitions)).astype(
                    np.int32
                )
            ),
        ),
        batch_format="pyarrow",
    )
    pair_rows = parted.groupby("_part").map_groups(
        pairs_in_partition, batch_format="pyarrow"
    )
    inter = pair_rows.groupby(["doc_a", "doc_b"]).aggregate(Sum("i", alias_name="i"))

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


def _popcount64(x: np.ndarray) -> np.ndarray:
    """Vectorized 64-bit popcount (unpackbits over the byte view)."""
    bytes_view = x.astype(np.uint64).view(np.uint8).reshape(len(x), 8)
    return np.unpackbits(bytes_view, axis=1).sum(axis=1).astype(np.int64)


def simhash_near_pairs(
    docs: "ray.data.Dataset",
    max_hamming: int = 3,
    text_col: str = "text",
    id_col: str = "doc_id",
    bucket_cap: int = 2048,
    overflow_dir: str | None = None,
) -> "ray.data.Dataset":
    """Near-dup pairs by simhash: 4 bucket-groupbys (one per 16-bit sub-key),
    Hamming verify inside each bucket, distinct at the end. Buckets above
    ``bucket_cap`` ids truncate WITH an overflow record (never silently)."""
    signed = docs.map_batches(
        lambda t: simhash_batch(t, text_col).select(
            [id_col, "simhash", "sub0", "sub1", "sub2", "sub3"]
        ),
        batch_format="pyarrow",
    ).materialize()  # tiny (id + 5 ints); read by 4 bucket groupbys

    empty = pa.table(
        {
            "doc_a": pa.array([], pa.string()),
            "doc_b": pa.array([], pa.string()),
            "hamming": pa.array([], pa.int32()),
        }
    )
    num_partitions = 64

    def bucket_verify_partition(part: pa.Table, sub: str) -> pa.Table:
        """Hamming verify for every sub-key bucket in one hash PARTITION —
        one Python call per partition, not one per distinct 16-bit sub-key
        value (up to 65k micro-groups per sub-key at scale). Buckets are
        runs of the sorted sub column."""
        if part.num_rows == 0:
            return empty
        sv = np.asarray(part[sub])
        ids = np.asarray(
            [str(x) for x in part[id_col].to_pylist()], dtype=object
        )
        hashes = np.asarray(part["simhash"], dtype=np.int64).astype(np.uint64)
        order = np.lexsort((ids, sv))  # doc_a < doc_b by construction
        sv, ids, hashes = sv[order], ids[order], hashes[order]
        change = np.flatnonzero(sv[1:] != sv[:-1]) + 1
        starts = np.concatenate(([0], change))
        ends = np.concatenate((change, [len(sv)]))
        a_out, b_out, d_out = [], [], []
        for s, e in zip(starts, ends):
            n = e - s
            if n < 2:
                continue
            bids, bhashes = ids[s:e], hashes[s:e]
            if n > bucket_cap:
                _log_bucket_overflow(
                    overflow_dir, "simhash_bucket", f"{sub}:{sv[s]}", n, bucket_cap
                )
                n = bucket_cap
                bids, bhashes = bids[:n], bhashes[:n]
            for i in range(n - 1):
                dist = _popcount64(bhashes[i + 1 :] ^ bhashes[i])
                hit = np.nonzero(dist <= max_hamming)[0]
                if len(hit):
                    a_out.append(np.repeat(bids[i], len(hit)))
                    b_out.append(bids[i + 1 + hit])
                    d_out.append(dist[hit])
        if not a_out:
            return empty
        return pa.table(
            {
                "doc_a": pa.array(np.concatenate(a_out), pa.string()),
                "doc_b": pa.array(np.concatenate(b_out), pa.string()),
                "hamming": pa.array(
                    np.concatenate(d_out).astype(np.int32), pa.int32()
                ),
            }
        )

    parts = []
    for i in range(4):
        sub = f"sub{i}"

        def add_sub_part(t: pa.Table, s: str = sub) -> pa.Table:
            p = (np.asarray(t[s]) % num_partitions).astype(np.int32)
            return t.append_column("_part", pa.array(p))

        parts.append(
            signed.map_batches(add_sub_part, batch_format="pyarrow")
            .groupby("_part")
            .map_groups(
                lambda g, s=sub: bucket_verify_partition(g, s),
                batch_format="pyarrow",
            )
        )
    all_pairs = parts[0].union(*parts[1:])
    return _distinct_by_pair(all_pairs, num_partitions)


# -- decontamination --------------------------------------------------------


def benchmark_shingle_set(
    benchmark: "ray.data.Dataset",
    k: int = 5,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> "ray.ObjectRef":
    """Distinct shingle hashes of a benchmark/eval corpus as ONE sorted
    uint64 array in the object store (``ray.put`` once, read per task).

    Contract: the benchmark side of decontamination is SMALL relative to
    the corpus (eval suites are MBs against a 100 TB training set), so its
    distinct-shingle set is driver-collectable by design. Each block first
    reduces to its own distinct hashes (combiner), so the driver merges
    per-block distinct arrays — never raw shingle streams.
    """

    def distinct_local(batch: pa.Table) -> pa.Table:
        hs = [word_shingle_hashes(t, k) for t in batch[text_col].to_pylist()]
        u = (
            np.unique(np.concatenate(hs))
            if hs
            else np.zeros(0, dtype=np.uint64)
        )
        return pa.table({"sh": pa.array(u.astype(np.int64))})

    parts = [
        np.asarray(t["sh"], dtype=np.int64)
        for t in ray.get(
            benchmark.select_columns([id_col, text_col])
            .map_batches(distinct_local, batch_format="pyarrow")
            .to_arrow_refs()
        )
        if t.num_rows
    ]
    merged = (
        np.unique(np.concatenate(parts))
        if parts
        else np.zeros(0, dtype=np.int64)
    )
    return ray.put(merged.astype(np.uint64))


def decontaminate(
    corpus: "ray.data.Dataset",
    bench_shingles_ref: "ray.ObjectRef",
    k: int = 5,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> "ray.data.Dataset":
    """Benchmark n-gram decontamination (GPT-3 App. C / PaLM recipe): flag
    every corpus document sharing >= 1 distinct k-word shingle with the
    benchmark set. Returns (doc_id, n_hits) for contaminated docs only.

    Scale shape: the benchmark shingle set is broadcast (object store, one
    copy per node); the corpus pass is a single stateless ``map_batches``
    with NO shuffle — each doc's distinct shingle hashes are intersected
    against the sorted benchmark array via ``np.isin`` (vectorized,
    O(s log B)). At 100 TB this streams: cost is one read + one write.
    """

    def hits(batch: pa.Table) -> pa.Table:
        from ..functions.broadcast import bget

        bench = bget(bench_shingles_ref)
        out_ids, out_hits = [], []
        for doc_id, text in zip(
            batch[id_col].to_pylist(), batch[text_col].to_pylist()
        ):
            h = word_shingle_hashes(text, k)
            n = int(np.isin(h, bench, assume_unique=True).sum()) if len(h) else 0
            if n:
                out_ids.append(doc_id)
                out_hits.append(n)
        return pa.table(
            {
                id_col: pa.array(out_ids, batch[id_col].type),
                "n_hits": pa.array(out_hits, pa.int64()),
            }
        )

    return corpus.map_batches(hits, batch_format="pyarrow")


def bench_bloom_filter(
    benchmark: "ray.data.Dataset",
    k: int = 5,
    m_bits: int = 1 << 20,
    n_probes: int = 4,
    text_col: str = "text",
) -> "ray.ObjectRef":
    """Bloom summary of the benchmark shingle set, built distributed: each
    block reduces to its own m-bit packed filter (combiner), the driver
    ORs the (blocks x m/8 bytes) partials, ``ray.put`` once. The broadcast
    side is ~10 bits/element instead of benchmark_shingle_set's 8
    bytes/element — the variant that still broadcasts when the eval suite
    itself is large."""
    from ..functions import sketch

    n_words = m_bits // 64

    def block_filter(batch: pa.Table) -> pa.Table:
        words = np.zeros(n_words, dtype=np.uint64)
        for text in batch[text_col].to_pylist():
            sketch.bloom_add(words, word_shingle_hashes(text, k), n_probes)
        return pa.table({"words": pa.array([words.tobytes()], pa.binary())})

    merged = np.zeros(n_words, dtype=np.uint64)
    for b in benchmark.map_batches(
        block_filter, batch_format="pyarrow"
    ).iter_batches(batch_format="pyarrow"):
        for buf in b["words"].to_pylist():
            merged |= np.frombuffer(buf, dtype=np.uint64)
    return ray.put(merged)


def bloom_decontaminate(
    corpus: "ray.data.Dataset",
    benchmark: "ray.data.Dataset",
    k: int = 5,
    m_bits: int = 1 << 20,
    n_probes: int = 4,
    text_col: str = "text",
    id_col: str = "doc_id",
    driver_merge: bool = False,
) -> "ray.data.Dataset":
    """Decontamination for when the benchmark shingle set is too large to
    broadcast exactly: Bloom prefilter + exact join verify.

    Phase 1 streams the corpus against the broadcast Bloom bits and
    explodes (doc_id, sh) ONLY for maybe-member shingles — on a clean
    corpus that's the contaminated tail plus an ``fp_rate`` sliver, never
    corpus-scale. Phase 2 exactly verifies those candidates with a
    hash-shuffle semi-join against the benchmark's distinct shingles (no
    driver materialization, no broadcast of the exact set), then counts
    per doc. Output == :func:`decontaminate` (FPs are joined away), which
    is what the oracle asserts.
    """
    from ..functions import sketch
    from ..functions.broadcast import bget
    from .joins import semi_join

    bits_ref = bench_bloom_filter(
        benchmark, k=k, m_bits=m_bits, n_probes=n_probes, text_col=text_col
    )

    def candidates(batch: pa.Table) -> pa.Table:
        words = bget(bits_ref)
        out_ids, out_sh = [], []
        for doc_id, text in zip(
            batch[id_col].to_pylist(), batch[text_col].to_pylist()
        ):
            h = word_shingle_hashes(text, k)
            if len(h) == 0:
                continue
            hit = h[sketch.bloom_contains(words, h, n_probes)]
            if len(hit):
                out_ids.extend([doc_id] * len(hit))
                out_sh.append(hit)
        sh = (
            np.concatenate(out_sh).view(np.int64)
            if out_sh
            else np.zeros(0, dtype=np.int64)
        )
        return pa.table(
            {
                id_col: pa.array(out_ids, batch[id_col].type),
                "sh": pa.array(sh),
            }
        )

    def bench_shingles(batch: pa.Table) -> pa.Table:
        hs = [word_shingle_hashes(t, k) for t in batch[text_col].to_pylist()]
        sh = (
            np.unique(np.concatenate(hs)).view(np.int64)
            if hs
            else np.zeros(0, dtype=np.int64)
        )
        return pa.table({"sh": pa.array(sh)})

    cand = corpus.map_batches(candidates, batch_format="pyarrow")
    bench_sh = benchmark.map_batches(bench_shingles, batch_format="pyarrow")

    # Fused exact verify + per-doc pre-count: ONE sh-keyed partition pass
    # over the tagged union replaces the earlier semi-join + groupby chain
    # (three all-to-alls and a schema-peek pre-execution -> one shuffle;
    # sf0.1 wall time 10.4 s -> ~4 s). Bench rows carry a sentinel doc_id
    # (never null: int64 + null degrades to float64 in pandas).
    from ..functions.partitioning import groupby_partition

    id_type = None
    corpus_schema = corpus.schema()
    if corpus_schema is not None and id_col in corpus_schema.names:
        t = dict(zip(corpus_schema.names, corpus_schema.types)).get(id_col)
        if isinstance(t, pa.DataType):
            id_type = t
    if id_type is None:
        id_type = pa.int64()
    sentinel = "" if pa.types.is_string(id_type) else -1

    def tag_cand(t: pa.Table) -> pa.Table:
        return t.append_column("is_bench", pa.array([False] * len(t)))

    def tag_bench(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                id_col: pa.array([sentinel] * len(t), id_type),
                "sh": t["sh"],
                "is_bench": pa.array([True] * len(t)),
            }
        )

    tagged = cand.map_batches(tag_cand, batch_format="pyarrow").union(
        bench_sh.map_batches(tag_bench, batch_format="pyarrow")
    )

    import pandas as pd

    partial_schema = pa.schema(
        [(id_col, id_type), ("n_hits", pa.int64())]
    )

    def verify_count(df: "pd.DataFrame") -> "pd.DataFrame":
        bench_set = df.loc[df["is_bench"], "sh"].to_numpy()
        hit = df[~df["is_bench"] & df["sh"].isin(bench_set)]
        out = hit.groupby(id_col).size().reset_index(name="n_hits")
        return out.astype({"n_hits": "int64"})

    # size_aware: the tagged union is candidate-bounded (contaminated tail
    # + fp sliver + bench distinct shingles), never corpus-scale — at sf0.1
    # it is ~16k rows scattered over 128 near-empty blocks, and the 64-way
    # exchange was ~2.2 s of pure fixed cost.
    partials = groupby_partition(
        tagged, "sh", verify_count,
        batch_format="pandas", schema=partial_schema, size_aware=True,
    )
    # a doc's shingles scatter across sh-partitions: one tiny
    # (contaminated docs only) doc-keyed pass sums the partials.
    # ``driver_merge=True`` sums them in pandas on the driver instead —
    # the partials are OUTPUT-bounded (rows <= contaminated_docs x
    # sh-partitions, never corpus-scale), so whenever the caller is going
    # to collect the result anyway (every decontamination report does)
    # the doc-keyed all-to-all is pure fixed cost (~1.2 s/shuffle on this
    # box). The shuffle path stays the default for pipeline composition
    # where the contaminated set itself may be large.
    if driver_merge:
        parts = list(partials.iter_batches(batch_format="pandas", batch_size=None))
        df = pd.concat(parts, ignore_index=True) if parts else partial_schema.empty_table().to_pandas()
        out = (
            df.groupby(id_col, as_index=False)["n_hits"].sum()
            .astype({"n_hits": "int64"})
        )
        return ray.data.from_arrow(
            pa.Table.from_pandas(out, schema=partial_schema, preserve_index=False)
        )
    return groupby_partition(
        partials,
        id_col,
        lambda df: df.groupby(id_col, as_index=False)["n_hits"].sum()
        .astype({"n_hits": "int64"}),
        batch_format="pandas",
        schema=partial_schema,
        size_aware=True,  # partials are output-bounded (docs x partitions)
    )


def _bucket_cross_pairs_partition(
    part: pa.Table, cap: int = 512, overflow_dir: str | None = None
) -> pa.Table:
    """Cross-side pairs within every LSH bucket of one hash partition:
    only (side 0) x (side 1) pairs are emitted — the within-corpus
    triangles are never materialized, which is the point of the
    cross-corpus variant (an A x B near-dup check pays |A||B| per bucket,
    not (|A|+|B|)^2/2). Same run-walk + cap/overflow contract as
    :func:`_bucket_pairs_partition`."""
    if part.num_rows == 0:
        return _PAIRS_SCHEMA.empty_table()
    band = np.asarray(part["band"])
    bh = np.asarray(part["band_hash"])
    side = np.asarray(part["side"])
    ids = np.asarray(part["doc_id"].to_pylist(), dtype=object)
    order = np.lexsort((ids, side, bh, band))
    band, bh, side, ids = band[order], bh[order], side[order], ids[order]
    change = np.flatnonzero((band[1:] != band[:-1]) | (bh[1:] != bh[:-1])) + 1
    starts = np.concatenate(([0], change))
    ends = np.concatenate((change, [len(band)]))
    a_parts, b_parts = [], []
    for s, e in zip(starts, ends):
        sides_run = side[s:e]
        ids_run = ids[s:e]
        ua = np.unique(ids_run[sides_run == 0])
        ub = np.unique(ids_run[sides_run == 1])
        if not len(ua) or not len(ub):
            continue
        if len(ua) > cap or len(ub) > cap:
            _log_bucket_overflow(
                overflow_dir,
                "minhash_cross_bucket",
                f"{band[s]}:{bh[s]}",
                int(len(ua) + len(ub)),
                cap,
            )
            ua, ub = ua[:cap], ub[:cap]
        gi, gj = np.meshgrid(
            np.arange(len(ua)), np.arange(len(ub)), indexing="ij"
        )
        a_parts.append(ua[gi.ravel()])
        b_parts.append(ub[gj.ravel()])
    if not a_parts:
        return _PAIRS_SCHEMA.empty_table()
    return pa.table(
        {
            "doc_a": pa.array(np.concatenate(a_parts), pa.string()),
            "doc_b": pa.array(np.concatenate(b_parts), pa.string()),
        }
    )


def minhash_lsh_cross_pairs(
    docs_a: "ray.data.Dataset",
    docs_b: "ray.data.Dataset | None",
    num_perm: int = 64,
    bands: int = 16,
    text_col: str = "text",
    id_col: str = "doc_id",
    bucket_cap: int = 512,
    overflow_dir: str | None = None,
    side_col: str | None = None,
) -> "ray.data.Dataset":
    """Cross-corpus near-dup candidates (corpus A vs corpus B, e.g.
    training set vs eval set by *similarity* rather than exact n-gram
    membership): band both sides with the same minhash params, union the
    band rows tagged by side, bucket at partition granularity, and emit
    only A x B pairs. doc_a is always the A-side id. Compose with
    :func:`verify_jaccard` over ``docs_a.union(docs_b)`` for the exact
    post-filter.

    When both corpora live in ONE table distinguished by an int column
    (0 = A side, 1 = B side), pass that table as ``docs_a`` with
    ``side_col`` and ``docs_b=None``: the corpus is read and banded ONCE
    (one map pass instead of two read+band branches) — same pairs, half
    the scan cost."""

    if side_col is not None:
        if docs_b is not None:
            raise ValueError("side_col and docs_b are mutually exclusive")

        def rows_tagged(t: pa.Table) -> pa.Table:
            r = minhash_band_rows(t, num_perm, bands, text_col, id_col)
            # minhash_band_rows emits rows ordered doc-major (ids repeated
            # per band), so the per-doc side value repeats `bands` times
            side = np.asarray(t[side_col].cast(pa.int8()))
            return r.append_column("side", pa.array(np.repeat(side, bands)))

        band_rows = docs_a.map_batches(rows_tagged, batch_format="pyarrow")
    else:

        def rows_with_side(side_val: int):
            def f(t: pa.Table) -> pa.Table:
                r = minhash_band_rows(t, num_perm, bands, text_col, id_col)
                return r.append_column(
                    "side",
                    pa.array(np.full(r.num_rows, side_val, dtype=np.int8)),
                )

            return f

        band_rows = docs_a.map_batches(
            rows_with_side(0), batch_format="pyarrow"
        ).union(docs_b.map_batches(rows_with_side(1), batch_format="pyarrow"))

    # verify_jaccard dedups pairs internally (same contract as
    # minhash_lsh_pairs(distinct=False)), so no distinct shuffle here.
    # Same size-aware exchange as the within-corpus variant.
    from ..functions.partitioning import coalesce_small

    band_rows, num_partitions = coalesce_small(
        band_rows, _LSH_BUCKET_PARTITIONS
    )
    return (
        band_rows.map_batches(
            lambda t: _add_bucket_part(t, num_partitions),
            batch_format="pyarrow",
        )
        .groupby("_part")
        .map_groups(
            lambda g: _bucket_cross_pairs_partition(g, bucket_cap, overflow_dir),
            batch_format="pyarrow",
        )
    )


def dup_shingle_partials(
    docs: "ray.data.Dataset",
    k: int = 8,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_partitions: int = 64,
) -> "ray.data.Dataset":
    """Exact duplicated-substring detection at word granularity (the
    suffix-array dedup of Lee et al. 2022, "Deduplicating Training Data
    Makes Language Models Better", restricted to fixed-length k-word
    windows so it distributes as a hash partition instead of a global
    suffix sort): for every document, how many of its distinct k-word
    shingles also occur in at least one OTHER document.

    Phase 1 (map_batches, streaming, VECTORIZED): per batch, every word
    is hashed ONCE under TWO independently-keyed SipHash-1-3 functions
    (``pd.util.hash_array`` over the factorized vocabulary — the per-
    shingle ``hashlib.md5`` Python loop this replaces was the dominant
    CPU of the sf0.1 query, VERDICT r2 #5); each k-word window folds the
    word hashes with a position-dependent odd-multiplier polynomial in
    uint64, giving a 128-bit window key (two u64 columns). 128 bits, not
    a 64-bit fold, because a collision would silently inflate a count on
    a path labeled "exact" (ADVICE round 1 on exact_dedup) — word-level
    collisions would need BOTH keyed hashes to collide. Windows never
    cross document boundaries (shifted doc-index compare) and dedup
    per-doc via one vectorized drop_duplicates. Phase 2 (one
    hash-partition pass on the 128-bit key): shingles seen by >= 2
    distinct docs credit each member doc once; per-partition per-doc
    sums are emitted as partials.

    Returns the partial Dataset (doc_id, n). Each partition emits at most
    its member-doc count, so the stream is bounded by ~num_partitions x
    n_docs rows; finish with groupby(doc_id).sum() in Ray on the write
    path, or a driver merge when consuming the digest (the query does the
    latter). Docs with < k words contribute nothing.
    """
    from ..functions.partitioning import groupby_partition

    A1, A2 = np.uint64(0x9E3779B97F4A7C15), np.uint64(0xC2B2AE3D27D4EB4F)
    POW1 = np.array([pow(int(A1), j, 2**64) for j in range(k)], dtype=np.uint64)
    POW2 = np.array([pow(int(A2), j, 2**64) for j in range(k)], dtype=np.uint64)

    def explode(t: pa.Table) -> pa.Table:
        import pandas as pd
        import pandas.util as pdu

        doc_ids = [str(x) for x in t[id_col].to_pylist()]
        words_per_doc = [
            (txt or "").lower().split() for txt in t[text_col].to_pylist()
        ]
        kept = [(d, w) for d, w in zip(doc_ids, words_per_doc) if len(w) >= k]
        empty = pa.table(
            {
                id_col: pa.array([], pa.string()),
                "h1": pa.array([], pa.uint64()),
                "h2": pa.array([], pa.uint64()),
            }
        )
        if not kept:
            return empty
        lens = np.array([len(w) for _, w in kept], dtype=np.int64)
        flat = np.array(
            [w for _, ws in kept for w in ws], dtype=object
        )
        codes, uniques = pd.factorize(flat)
        u1 = pdu.hash_array(np.asarray(uniques, dtype=object),
                            hash_key="0123456789123456")
        u2 = pdu.hash_array(np.asarray(uniques, dtype=object),
                            hash_key="6543210987654321")
        wh1, wh2 = u1[codes], u2[codes]
        total = len(flat)
        nw = total - k + 1
        H1 = np.zeros(nw, dtype=np.uint64)
        H2 = np.zeros(nw, dtype=np.uint64)
        with np.errstate(over="ignore"):
            for j in range(k):
                H1 += wh1[j : nw + j] * POW1[k - 1 - j]
                H2 += wh2[j : nw + j] * POW2[k - 1 - j]
        doc_pos = np.repeat(np.arange(len(kept), dtype=np.int64), lens)
        valid = doc_pos[:nw] == doc_pos[k - 1 :]
        df = pd.DataFrame(
            {"d": doc_pos[:nw][valid], "h1": H1[valid], "h2": H2[valid]}
        ).drop_duplicates()
        if df.empty:
            return empty
        ids = np.array([d for d, _ in kept], dtype=object)[df["d"].to_numpy()]
        return pa.table(
            {
                id_col: pa.array(ids, pa.string()),
                "h1": pa.array(df["h1"].to_numpy(), pa.uint64()),
                "h2": pa.array(df["h2"].to_numpy(), pa.uint64()),
            }
        )

    pairs = docs.map_batches(explode, batch_format="pyarrow")

    def per_partition(t: pa.Table) -> pa.Table:
        import pandas as pd  # noqa: F401 - used via .to_pandas() merge path

        g = t.group_by(["h1", "h2"], use_threads=False).aggregate(
            [(id_col, "count")]
        )
        multi = g.filter(pc.greater_equal(g[f"{id_col}_count"], 2))
        if multi.num_rows == 0:
            return pa.table(
                {id_col: pa.array([], pa.string()), "n": pa.array([], pa.int64())}
            )
        # semi-join probe on the 128-bit key via a pandas merge (exact)
        tp = t.select([id_col, "h1", "h2"]).to_pandas()
        mk = multi.select(["h1", "h2"]).to_pandas()
        hit = tp.merge(mk, on=["h1", "h2"], how="inner")
        out = hit.groupby(id_col, as_index=False).size().rename(columns={"size": "n"})
        return pa.Table.from_pandas(
            out.astype({id_col: str, "n": "int64"}), preserve_index=False
        )

    schema = pa.schema([(id_col, pa.string()), ("n", pa.int64())])
    return groupby_partition(
        pairs, ["h1", "h2"], per_partition,
        num_partitions=num_partitions, schema=schema,
    )


# -- SymSpell typo pairs -----------------------------------------------------


def lev_leq(a: str, b: str, d: int):
    """Banded Levenshtein: the distance if <= d, else None.

    Classic Ukkonen band — O(len(a) * (2d+1)) cells instead of the full
    O(len(a)*len(b)) grid; exact for distances within the band."""
    if a == b:
        return 0
    la, lb = len(a), len(b)
    if abs(la - lb) > d:
        return None
    if la > lb:
        a, b, la, lb = b, a, lb, la
    inf = d + 1
    prev = list(range(min(lb, d) + 1)) + [inf] * max(0, lb - d)
    for i in range(1, la + 1):
        lo = max(1, i - d)
        hi = min(lb, i + d)
        cur = [inf] * (lb + 1)
        cur[0] = i if i <= d else inf
        ca = a[i - 1]
        for j in range(lo, hi + 1):
            cost = 0 if ca == b[j - 1] else 1
            cur[j] = min(prev[j] + 1, cur[j - 1] + 1, prev[j - 1] + cost)
        if min(cur[lo:hi + 1]) > d:
            return None
        prev = cur
    return prev[lb] if prev[lb] <= d else None


def delete_variants(tok: str, depth: int) -> set:
    """All strings reachable from ``tok`` by deleting up to ``depth``
    characters (including ``tok`` itself) — the SymSpell key set."""
    out = {tok}
    frontier = {tok}
    for _ in range(depth):
        nxt = set()
        for w in frontier:
            for i in range(len(w)):
                nxt.add(w[:i] + w[i + 1:])
        frontier = nxt - out
        out |= nxt
    return out


def typo_pairs(
    docs: "ray.data.Dataset",
    text_col: str = "text",
    max_d: int = 2,
    min_len: int = 3,
    num_partitions: int = 64,
) -> "ray.data.Dataset":
    """Vocabulary typo/variant pairs at Levenshtein distance <= ``max_d``
    via SymSpell symmetric-delete blocking (Garbe's public algorithm:
    dist(a,b) <= d implies the depth-d delete-neighborhoods intersect —
    delete the edited positions from both sides), then a banded-DP verify.

    Scale shape — never all-pairs:
    1. vocabulary: per-block unique partial -> hash-partition distinct
       (vocab rows shuffle once, corpus text never does);
    2. each vocab token fans out to its O(len^max_d) delete variants;
       candidate pairs form inside variant-keyed partitions only;
    3. pair-keyed partition distinct, then the O(len) banded verify.
    A degenerate hot variant (e.g. '' from 1-char tokens — excluded by
    ``min_len``) would square inside its bucket; min_len >= max_d + 1
    keeps every bucket's fan-in at vocabulary-typo scale.

    Returns a Dataset (tok_a, tok_b, d) with tok_a < tok_b.
    """
    tok_pat = r"^[a-z]{%d,}$" % min_len

    def vocab_partial(t: pa.Table) -> pa.Table:
        texts = t[text_col]
        if isinstance(texts, pa.ChunkedArray):
            texts = texts.combine_chunks()
        texts = pc.fill_null(texts, "")
        flat = pc.list_flatten(
            pc.split_pattern_regex(pc.utf8_lower(texts), r"\s+")
        )
        keep = pc.match_substring_regex(flat, tok_pat)
        return pa.table({"term": pc.unique(pc.filter(flat, keep))})

    vocab = docs.map_batches(vocab_partial, batch_format="pyarrow")
    out = term_variant_pairs(
        vocab, term_col="term", max_d=max_d, num_partitions=num_partitions
    )
    return out.map_batches(
        lambda t: t.rename_columns(["tok_a", "tok_b", "d"]),
        batch_format="pyarrow",
    )


def term_variant_pairs(
    terms: "ray.data.Dataset",
    term_col: str = "term",
    group_col: str = None,
    max_d: int = 2,
    num_partitions: int = 64,
) -> "ray.data.Dataset":
    """SymSpell symmetric-delete blocking + banded verify over an
    arbitrary term table (single words OR multi-word surfaces — the
    delete-variant key set is character-level either way).

    With ``group_col`` (e.g. an entity type for canonicalization alias
    candidates) variant buckets are scoped per group, so pairs never
    cross groups. Input rows need not be distinct — a partition distinct
    runs first. Returns (group_col?, term_a, term_b, d), term_a < term_b.
    """
    import pandas as pd

    from ..functions.partitioning import groupby_partition

    gcols = [group_col] if group_col else []

    term_schema = pa.schema(
        [(c, pa.string()) for c in gcols] + [(term_col, pa.string())]
    )
    terms = groupby_partition(
        terms,
        gcols + [term_col],
        lambda df: df.drop_duplicates(),
        num_partitions=num_partitions,
        batch_format="pandas",
        schema=term_schema,
    )

    def fan_out(t: pa.Table) -> pa.Table:
        vs, ts, gs = [], [], []
        groups = (
            t[group_col].to_pylist() if group_col else [""] * len(t)
        )
        for g, term in zip(groups, t[term_col].to_pylist()):
            for v in delete_variants(term, max_d):
                vs.append(v)
                ts.append(term)
                gs.append(g)
        cols = {"v": pa.array(vs, pa.string()),
                "term": pa.array(ts, pa.string())}
        if group_col:
            cols[group_col] = pa.array(gs, pa.string())
        return pa.table(cols)

    variants = terms.map_batches(fan_out, batch_format="pyarrow")

    pair_cols = gcols + ["term_a", "term_b"]
    pair_schema = pa.schema([(c, pa.string()) for c in pair_cols])

    def bucket_pairs(df: "pd.DataFrame") -> "pd.DataFrame":
        a_parts, b_parts, g_parts = [], [], []
        keys = ([group_col, "v"] if group_col else ["v"])
        for key, grp in df.groupby(keys, sort=False):
            toks = np.unique(grp["term"].to_numpy())
            if len(toks) > 1:
                ii, jj = np.triu_indices(len(toks), k=1)
                a_parts.append(toks[ii])
                b_parts.append(toks[jj])
                if group_col:
                    g = key[0] if isinstance(key, tuple) else key
                    g_parts.append(np.full(len(ii), g, dtype=object))
        if not a_parts:
            return pd.DataFrame(
                {c: pd.Series([], dtype=str) for c in pair_cols}
            )
        data = {}
        if group_col:
            data[group_col] = np.concatenate(g_parts)
        data["term_a"] = np.concatenate(a_parts)
        data["term_b"] = np.concatenate(b_parts)
        out = pd.DataFrame(data).drop_duplicates()
        return out[pair_cols].astype({c: str for c in pair_cols})

    cands = groupby_partition(
        variants,
        gcols + ["v"],
        bucket_pairs,
        num_partitions=num_partitions,
        batch_format="pandas",
        schema=pair_schema,
    )
    cands = groupby_partition(
        cands,
        pair_cols,
        lambda df: df.drop_duplicates(),
        num_partitions=num_partitions,
        batch_format="pandas",
        schema=pair_schema,
    )

    def verify(t: pa.Table) -> pa.Table:
        ta, tb, dd, keep_idx = [], [], [], []
        a_list = t["term_a"].to_pylist()
        b_list = t["term_b"].to_pylist()
        for i, (a, b) in enumerate(zip(a_list, b_list)):
            d = lev_leq(a, b, max_d)
            if d is not None:
                ta.append(a)
                tb.append(b)
                dd.append(d)
                keep_idx.append(i)
        cols = {}
        if group_col:
            groups = t[group_col].to_pylist()
            cols[group_col] = pa.array(
                [groups[i] for i in keep_idx], pa.string()
            )
        cols["term_a"] = pa.array(ta, pa.string())
        cols["term_b"] = pa.array(tb, pa.string())
        cols["d"] = pa.array(dd, pa.int64())
        return pa.table(cols)

    return cands.map_batches(verify, batch_format="pyarrow")


def ppjoin_pairs(
    docs: "ray.data.Dataset",
    threshold: float = 0.8,
    k: int = 5,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_partitions: int = 64,
) -> "ray.data.Dataset":
    """Exact set-similarity join via PREFIX FILTERING (Chaudhuri et al.
    2006 / Xiao et al. PPJoin 2008) — all pairs with k-word-shingle
    Jaccard >= threshold, with GUARANTEED recall 1 (unlike MinHash-LSH,
    whose recall is probabilistic):

    sort each doc's distinct shingle hashes under one global total order
    (the hash value itself — any fixed order is correct; df-ascending is
    only a candidate-count optimization and would need a corpus-scale df
    table at 100 TB), keep only the first ``|x| - ceil(t*|x|) + 1``
    as the doc's PREFIX, and bucket by prefix shingle. Theorem: if
    J(x,y) >= t, the smallest common shingle (in the global order) lies
    in BOTH prefixes, so every qualifying pair shares a bucket. A length
    filter (t*|x| <= |y|) prunes inside each bucket. Candidates then go
    through the distributed exact verify (:func:`verify_jaccard`) —
    only ~(1-t) of each doc's shingles are ever exploded, vs ALL of
    them in :func:`ngram_jaccard_pairs`, and no df cap is needed.
    """
    import math

    def explode_prefix(batch: pa.Table) -> pa.Table:
        ids, hashes, sizes = [], [], []
        for doc_id, text in zip(
            batch[id_col].to_pylist(), batch[text_col].to_pylist()
        ):
            h = word_shingle_hashes(text or "", k)
            n = len(h)
            if n == 0:
                continue
            p = n - math.ceil(threshold * n) + 1
            pref = np.sort(h.astype(np.int64))[:p]
            ids.extend([str(doc_id)] * p)
            hashes.extend(pref.tolist())
            sizes.extend([n] * p)
        return pa.table(
            {
                "sh": pa.array(hashes, pa.int64()),
                "doc_id": pa.array(ids, pa.string()),
                "size": pa.array(sizes, pa.int64()),
            }
        )

    prefixes = docs.map_batches(explode_prefix, batch_format="pyarrow")

    from ..functions.partitioning import groupby_partition

    pair_schema = pa.schema([("doc_a", pa.string()), ("doc_b", pa.string())])

    def bucket_pairs(group: pa.Table) -> pa.Table:
        """Same-shingle pair emission over one hash partition, vectorized
        by run length exactly like ngram_jaccard_pairs, plus the PPJoin
        length filter t*max(|x|,|y|) <= min(|x|,|y|)."""
        sh = np.asarray(group["sh"])
        cats, codes = np.unique(
            np.asarray(group["doc_id"].to_pylist(), dtype=object),
            return_inverse=True,
        )
        size = np.asarray(group["size"])
        order = np.lexsort((codes, sh))
        sh_s, code_s, size_s = sh[order], codes[order], size[order]
        _, starts, counts = np.unique(sh_s, return_index=True, return_counts=True)
        keep = counts >= 2
        a_parts, b_parts = [], []
        for c in np.unique(counts[keep]):
            run_starts = starts[keep][counts[keep] == c]
            idx = run_starts[:, None] + np.arange(c)[None, :]
            mat, msize = code_s[idx], size_s[idx]
            iu, ju = np.triu_indices(c, k=1)
            a, b = mat[:, iu].ravel(), mat[:, ju].ravel()
            sa, sb = msize[:, iu].ravel(), msize[:, ju].ravel()
            ok = (a != b) & (
                threshold * np.maximum(sa, sb) <= np.minimum(sa, sb)
            )
            a_parts.append(a[ok])
            b_parts.append(b[ok])
        if not a_parts:
            return pair_schema.empty_table()
        import pandas as pd

        a = np.concatenate(a_parts)
        b = np.concatenate(b_parts)
        lo, hi = np.minimum(a, b), np.maximum(a, b)
        out = pd.DataFrame({"doc_a": cats[lo], "doc_b": cats[hi]})
        out = out.drop_duplicates(ignore_index=True)  # partition-local dedup
        return pa.table(
            {
                "doc_a": pa.array(out["doc_a"], pa.string()),
                "doc_b": pa.array(out["doc_b"], pa.string()),
            }
        )

    candidates = groupby_partition(
        prefixes, "sh", bucket_pairs, num_partitions=num_partitions,
        schema=pair_schema,
    )
    # cross-partition duplicates remain (one per shared prefix shingle in a
    # different partition); verify_jaccard dedups internally
    return verify_jaccard(
        candidates, docs, threshold=threshold, k=k,
        text_col=text_col, id_col=id_col,
    )


def cdc_chunk_stats(
    docs: "ray.data.Dataset",
    boundary_mod: int = 64,
    min_chunk: int = 16,
    text_col: str = "text",
) -> "pd.DataFrame":
    """Content-defined chunking (CDC) dedup ratio — the storage-dedup
    classic (LBFS/Rabin): chunk boundaries fall where a byte-wise
    rolling hash ≡ 0 (mod ``boundary_mod``), so a small edit reshifts
    only its own chunk, not every fixed window after it. Each block
    chunks its docs (vectorized gear-hash over the byte array), hashes
    chunks (md5), and emits (chunk_md5, size) partials; one digest
    partition counts distinct vs total — chunk BYTES never shuffle,
    only 16-byte digests. Returns one row: total/distinct chunk counts
    and bytes plus the dedup ratio."""
    import hashlib

    import pandas as pd

    from ..functions.partitioning import groupby_partition

    _GEAR = (np.arange(256, dtype=np.uint64) * np.uint64(0x9E3779B97F4A7C15)) ^ (
        np.arange(256, dtype=np.uint64) >> np.uint64(3)
    )

    def chunk_doc(data: bytes):
        """Gear hash h_i = (h_{i-1} << 1) + GEAR[b_i] (mod 2^64). The
        recurrence unrolls to h_i = Σ_{k<64} GEAR[b_{i-k}] << k — shifts
        >= 64 vanish mod 2^64 — so the whole hash stream is 64 shifted
        vector adds over the byte array, no per-byte Python loop; only
        the sparse min-gap boundary selection stays sequential."""
        if not data:
            return []
        arr = np.frombuffer(data, dtype=np.uint8)
        g = _GEAR[arr]
        h = np.zeros(len(arr), dtype=np.uint64)
        with np.errstate(over="ignore"):
            for k in range(min(64, len(arr))):
                h[k:] += g[: len(arr) - k] << np.uint64(k)
        cand = np.flatnonzero(h % np.uint64(boundary_mod) == 0)
        out, start = [], 0
        for i in cand:
            if i - start + 1 >= min_chunk:
                out.append(data[start:i + 1])
                start = i + 1
        if start < len(data):
            out.append(data[start:])
        return out

    def partial(t: pa.Table) -> pa.Table:
        md5s, sizes = [], []
        for txt in t[text_col].to_pylist():
            for c in chunk_doc((txt or "").encode("utf-8")):
                md5s.append(hashlib.md5(c).hexdigest())
                sizes.append(len(c))
        return pa.table(
            {
                "chunk_md5": pa.array(md5s, pa.string()),
                "size": pa.array(sizes, pa.int64()),
            }
        )

    chunks = docs.map_batches(partial, batch_format="pyarrow")

    schema = pa.schema(
        [("n_total", pa.int64()), ("n_distinct", pa.int64()),
         ("bytes_total", pa.int64()), ("bytes_distinct", pa.int64())]
    )

    def reduce_partition(df: "pd.DataFrame") -> "pd.DataFrame":
        g = df.groupby("chunk_md5")["size"]
        return pd.DataFrame(
            {
                "n_total": [int(df.shape[0])],
                "n_distinct": [int(g.ngroups)],
                "bytes_total": [int(df["size"].sum())],
                "bytes_distinct": [int(g.first().sum())],
            }
        )

    parts = groupby_partition(
        chunks, "chunk_md5", reduce_partition,
        batch_format="pandas", schema=schema,
    ).to_pandas()
    tot = parts.sum()
    ratio = round(float(tot["bytes_total"] / max(tot["bytes_distinct"], 1)), 6)
    return pd.DataFrame(
        {
            "n_total": np.array([int(tot["n_total"])], dtype="int64"),
            "n_distinct": np.array([int(tot["n_distinct"])], dtype="int64"),
            "bytes_total": np.array([int(tot["bytes_total"])], dtype="int64"),
            "bytes_distinct": np.array([int(tot["bytes_distinct"])], dtype="int64"),
            "dedup_ratio": [ratio],
        }
    )
