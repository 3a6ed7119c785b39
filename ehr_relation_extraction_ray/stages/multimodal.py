"""Multimodal (image/audio/video) column plumbing.

Binary payloads are opaque ``binary`` columns with typed metadata; decode /
feature-extract stages are actor-pool ``map_batches`` with real Ray-side
plumbing (schema, batch sizing for large rows, actor signature, output
layout) and a STUBBED codec: the actual image/audio libraries are not in
this container, so ``decoder="fake"`` produces deterministic features from
the bytes and ``decoder="pil"``/``"ffmpeg"`` raise ``NotImplementedError``
with a clear message. Swap the codec in ``_Decoder.__init__`` when the
library exists; nothing else changes.

Batch sizing note (ray_guide "Memory-aware"): large binary rows need small
``batch_size`` so batch x concurrency fits the worker heap — the default
here assumes ~1 MB payloads and an 8-actor pool on a 32-CPU node.
"""

from __future__ import annotations

from typing import Optional

import numpy as np
import pyarrow as pa

import ray.data

MEDIA = pa.schema(
    [
        ("media_id", pa.string()),
        ("kind", pa.string()),  # image | audio | video
        ("payload", pa.large_binary()),
        ("mime", pa.string()),
        ("width", pa.int32()),  # -1 when unknown / n.a.
        ("height", pa.int32()),
        ("duration_ms", pa.int32()),
    ]
)

FEATURES = pa.schema(
    [
        ("media_id", pa.string()),
        ("kind", pa.string()),
        ("feature", pa.list_(pa.float32())),
        ("n_bytes", pa.int64()),
    ]
)


class MediaFeaturizer:
    """Actor-pool stage: decode payload -> fixed-dim feature vector."""

    def __init__(self, decoder: str = "fake", dim: int = 64):
        if decoder == "fake":
            self._decode = self._fake_decode
        elif decoder in ("pil", "ffmpeg"):
            raise NotImplementedError(
                f"decoder={decoder!r}: image/audio libraries are not available "
                "in this environment; use decoder='fake' (deterministic stub)"
            )
        else:
            raise ValueError(f"unknown decoder {decoder!r}")
        self.dim = dim

    def _fake_decode(self, payload: bytes) -> np.ndarray:
        # deterministic stand-in: byte histogram folded to `dim` buckets,
        # L2-normalized — same signature a real embedding model would have.
        arr = np.frombuffer(payload or b"\x00", dtype=np.uint8)
        hist = np.bincount(arr % self.dim, minlength=self.dim).astype(np.float32)
        norm = np.linalg.norm(hist)
        return hist / (norm if norm else 1.0)

    def __call__(self, batch: pa.Table) -> pa.Table:
        feats = [
            self._decode(p) for p in batch["payload"].to_pylist()
        ]
        n_bytes = [len(p or b"") for p in batch["payload"].to_pylist()]
        return pa.Table.from_arrays(
            [
                batch["media_id"].combine_chunks()
                if isinstance(batch["media_id"], pa.ChunkedArray)
                else batch["media_id"],
                batch["kind"].combine_chunks()
                if isinstance(batch["kind"], pa.ChunkedArray)
                else batch["kind"],
                pa.array([f.tolist() for f in feats], pa.list_(pa.float32())),
                pa.array(n_bytes, pa.int64()),
            ],
            schema=FEATURES,
        )


def featurize(
    media: "ray.data.Dataset",
    decoder: str = "fake",
    dim: int = 64,
    concurrency: Optional[int] = 4,
    batch_size: int = 32,
) -> "ray.data.Dataset":
    """media Dataset (MEDIA schema) -> features Dataset (FEATURES schema)."""
    return media.map_batches(
        MediaFeaturizer,
        fn_constructor_kwargs={"decoder": decoder, "dim": dim},
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency,
        num_cpus=1,
    )


def synth_media(n: int, seed: int = 5) -> pa.Table:
    """Deterministic fake media table for tests/benchmarks."""
    rng = np.random.default_rng(seed)
    kinds = ["image", "audio", "video"]
    rows = {k: [] for k in MEDIA.names}
    for i in range(n):
        kind = kinds[i % 3]
        payload = rng.integers(0, 256, size=int(rng.integers(64, 2048))).astype(
            np.uint8
        ).tobytes()
        rows["media_id"].append(f"m-{i:06d}")
        rows["kind"].append(kind)
        rows["payload"].append(payload)
        rows["mime"].append({"image": "image/fake", "audio": "audio/fake", "video": "video/fake"}[kind])
        rows["width"].append(64 if kind == "image" else -1)
        rows["height"].append(64 if kind == "image" else -1)
        rows["duration_ms"].append(-1 if kind == "image" else 1000)
    return pa.Table.from_arrays(
        [pa.array(rows[f.name], f.type) for f in MEDIA], schema=MEDIA
    )


RESIZED = pa.schema(
    [
        ("media_id", pa.string()),
        ("payload", pa.large_binary()),
        ("width", pa.int32()),
        ("height", pa.int32()),
    ]
)

FRAMES = pa.schema(
    [
        ("media_id", pa.string()),
        ("frame_idx", pa.int32()),
        ("ts_ms", pa.int32()),
        ("payload", pa.large_binary()),
    ]
)


class ImageResizer:
    """Actor-pool stage: image payload -> resized payload (stubbed codec).

    The fake codec produces a deterministic ``w*h``-byte payload derived
    from the source bytes (tiling/truncation), preserving the real stage's
    contract: bounded output size, per-actor setup, small batches for
    large binary rows."""

    def __init__(self, width: int = 32, height: int = 32, decoder: str = "fake"):
        if decoder != "fake":
            raise NotImplementedError(
                f"decoder={decoder!r}: image libraries unavailable; use 'fake'"
            )
        self.width, self.height = width, height

    def __call__(self, batch: pa.Table) -> pa.Table:
        n = self.width * self.height
        out = []
        for p in batch["payload"].to_pylist():
            src = np.frombuffer(p or b"\x00", dtype=np.uint8)
            out.append(np.resize(src, n).tobytes())
        return pa.Table.from_arrays(
            [
                batch["media_id"].combine_chunks()
                if isinstance(batch["media_id"], pa.ChunkedArray)
                else batch["media_id"],
                pa.array(out, pa.large_binary()),
                pa.array([self.width] * batch.num_rows, pa.int32()),
                pa.array([self.height] * batch.num_rows, pa.int32()),
            ],
            schema=RESIZED,
        )


class FrameSampler:
    """Actor-pool flat stage: video payload -> K evenly-spaced frame rows
    (output rows > input rows — the Ray-side shape of real frame
    sampling; codec stubbed deterministically)."""

    def __init__(self, every_ms: int = 250, frame_bytes: int = 256, decoder: str = "fake"):
        if decoder != "fake":
            raise NotImplementedError(
                f"decoder={decoder!r}: ffmpeg unavailable; use 'fake'"
            )
        self.every_ms = every_ms
        self.frame_bytes = frame_bytes

    def __call__(self, batch: pa.Table) -> pa.Table:
        rows = {k: [] for k in FRAMES.names}
        for mid, payload, dur in zip(
            batch["media_id"].to_pylist(),
            batch["payload"].to_pylist(),
            batch["duration_ms"].to_pylist(),
        ):
            dur = max(int(dur or 0), 0)
            src = np.frombuffer(payload or b"\x00", dtype=np.uint8)
            for k, ts in enumerate(range(0, dur + 1, self.every_ms)):
                lo = (k * self.frame_bytes) % max(len(src), 1)
                frame = np.resize(np.roll(src, -lo), self.frame_bytes).tobytes()
                rows["media_id"].append(mid)
                rows["frame_idx"].append(k)
                rows["ts_ms"].append(ts)
                rows["payload"].append(frame)
        return pa.Table.from_arrays(
            [pa.array(rows[f.name], f.type) for f in FRAMES], schema=FRAMES
        )


def resize_images(
    media: "ray.data.Dataset", width: int = 32, height: int = 32,
    concurrency: Optional[int] = 4, batch_size: int = 32,
) -> "ray.data.Dataset":
    imgs = media.filter(expr="kind == 'image'")
    return imgs.map_batches(
        ImageResizer,
        fn_constructor_kwargs={"width": width, "height": height},
        batch_format="pyarrow", batch_size=batch_size,
        concurrency=concurrency, num_cpus=1,
    )


def sample_frames(
    media: "ray.data.Dataset", every_ms: int = 250,
    concurrency: Optional[int] = 4, batch_size: int = 16,
) -> "ray.data.Dataset":
    vids = media.filter(expr="kind == 'video'")
    return vids.map_batches(
        FrameSampler,
        fn_constructor_kwargs={"every_ms": every_ms},
        batch_format="pyarrow", batch_size=batch_size,
        concurrency=concurrency, num_cpus=1,
    )


def payload_dedup_groups(
    media: "ray.data.Dataset",
    id_col: str = "media_id",
    payload_col: str = "payload",
    num_partitions: int = 32,
) -> "ray.data.Dataset":
    """Exact binary-payload dedup groups for multimodal corpora.

    Each block reduces its rows to (id, md5-of-payload) — the payloads
    themselves NEVER shuffle, only 16-byte digests move (the same
    projection discipline as stages/diff). One digest-keyed partition
    pass emits a row per duplicate group: (payload_md5, n_copies,
    keep_id = lexicographic-min id, the deterministic survivor).

    Digest dialect: md5 over the UPPERCASE hex of the payload, so a SQL
    oracle can recompute it as ``md5(hex(payload))`` (DuckDB has no
    BLOB md5).
    """
    import hashlib

    import pandas as pd

    from ..functions.partitioning import groupby_partition

    def digest(t: pa.Table) -> pa.Table:
        payloads = t[payload_col].to_pylist()
        md5s = [
            hashlib.md5(p.hex().upper().encode("ascii")).hexdigest()
            for p in payloads
        ]
        return pa.table(
            {id_col: t[id_col], "payload_md5": pa.array(md5s, pa.string())}
        )

    hashed = media.map_batches(digest, batch_format="pyarrow")

    schema = pa.schema(
        [("payload_md5", pa.string()), ("n_copies", pa.int64()),
         ("keep_id", pa.string())]
    )

    def groups(df: "pd.DataFrame") -> "pd.DataFrame":
        agg = (
            df.groupby("payload_md5")[id_col]
            .agg(n_copies="count", keep_id="min")
            .reset_index()
        )
        agg = agg[agg["n_copies"] > 1]
        return agg.astype(
            {"payload_md5": str, "n_copies": "int64", "keep_id": str}
        )

    return groupby_partition(
        hashed, "payload_md5", groups,
        num_partitions=num_partitions, batch_format="pandas", schema=schema,
    )


PHASH_PAIRS = pa.schema(
    [("media_a", pa.string()), ("media_b", pa.string()), ("hamming", pa.int64())]
)


def perceptual_hash(vec: np.ndarray) -> int:
    """64-bit aHash over a decoded feature vector: bit i = (v_i > median).
    With the real pil/ffmpeg decoders the vector is the downscaled
    grayscale grid (classic average-hash); with the deterministic stub
    decoder it is the byte histogram — the hashing, banding and verify
    plumbing are identical either way."""
    med = np.median(vec)
    bits = (vec > med).astype(np.uint8)
    return int.from_bytes(np.packbits(bits[:64]).tobytes(), "big")


class PerceptualHasher:
    """Actor-pool stage: payload -> (media_id, phash uint64 as int64)."""

    def __init__(self, decoder: str = "fake", dim: int = 64):
        self._feat = MediaFeaturizer(decoder=decoder, dim=dim)

    def __call__(self, batch: pa.Table) -> pa.Table:
        hashes = [
            np.int64(np.uint64(perceptual_hash(self._feat._fake_decode(p))))
            for p in batch["payload"].to_pylist()
        ]
        mid = (
            batch["media_id"].combine_chunks()
            if isinstance(batch["media_id"], pa.ChunkedArray)
            else batch["media_id"]
        )
        return pa.table({"media_id": mid, "ph": pa.array(hashes, pa.int64())})


def phash_near_dup_pairs(
    media: "ray.data.Dataset",
    max_hamming: int = 2,
    concurrency: "int | None" = 4,
    num_partitions: int = 32,
) -> pd.DataFrame:
    """Perceptual-hash near-duplicate pairs over a multimodal corpus:
    actor-pool aHash per payload, then the simhash-style PIGEONHOLE
    bucketing — 4 bands of 16 bits; hamming <= 2 flips at most 2 bands,
    so >= 2 bands match exactly and RECALL IS 1 by construction. Pairs
    sharing a band bucket are verified by exact popcount. Payloads
    never shuffle — only (id, 64-bit hash) rows move."""
    import pandas as pd

    from ..functions.partitioning import groupby_partition

    hashes = media.map_batches(
        PerceptualHasher, batch_format="pyarrow",
        concurrency=concurrency, num_cpus=1, batch_size=64,
    ).materialize()

    def band_rows(t: pa.Table) -> pa.Table:
        ph = np.asarray(t["ph"]).astype(np.uint64)
        ids = np.asarray(t["media_id"].to_pylist(), dtype=object)
        bands, keys, out_ids, phs = [], [], [], []
        for b in range(4):
            sub = ((ph >> np.uint64(16 * b)) & np.uint64(0xFFFF)).astype(np.int64)
            bands.append(np.full(len(ph), b, dtype=np.int64))
            keys.append(sub)
            out_ids.append(ids)
            phs.append(ph.astype(np.int64))
        return pa.table(
            {
                "band": pa.array(np.concatenate(bands)),
                "key": pa.array(np.concatenate(keys)),
                "media_id": pa.array(np.concatenate(out_ids), pa.string()),
                "ph": pa.array(np.concatenate(phs)),
            }
        )

    banded = hashes.map_batches(band_rows, batch_format="pyarrow")

    def bucket_pairs(df: "pd.DataFrame") -> "pd.DataFrame":
        import pandas as pd

        rows_a, rows_b, hams = [], [], []
        for _, grp in df.groupby(["band", "key"], sort=False):
            if len(grp) < 2:
                continue
            ids = grp["media_id"].to_numpy(dtype=object)
            ph = grp["ph"].to_numpy(np.int64).astype(np.uint64)
            order = np.argsort(ids)
            ids, ph = ids[order], ph[order]
            iu, ju = np.triu_indices(len(ids), k=1)
            x = ph[iu] ^ ph[ju]
            # vectorized popcount via byte-view + bincount table
            bytes_ = x.view(np.uint8).reshape(len(x), 8)
            ham = _POPCOUNT8[bytes_].sum(axis=1).astype(np.int64)
            ok = ham <= max_hamming  # closure-captured, ships with the fn
            rows_a.append(ids[iu][ok])
            rows_b.append(ids[ju][ok])
            hams.append(ham[ok])
        if not rows_a:
            return pd.DataFrame(
                {"media_a": pd.Series([], dtype=str),
                 "media_b": pd.Series([], dtype=str),
                 "hamming": pd.Series([], dtype="int64")}
            )
        out = pd.DataFrame(
            {
                "media_a": np.concatenate(rows_a),
                "media_b": np.concatenate(rows_b),
                "hamming": np.concatenate(hams),
            }
        ).drop_duplicates(subset=["media_a", "media_b"], ignore_index=True)
        return out.astype({"media_a": str, "media_b": str, "hamming": "int64"})

    pairs = groupby_partition(
        banded, ["band", "key"], bucket_pairs,
        num_partitions=num_partitions, batch_format="pandas",
        schema=PHASH_PAIRS,
    ).to_pandas()
    if pairs.empty:
        return pd.DataFrame(
            {"media_a": pd.Series([], dtype=str),
             "media_b": pd.Series([], dtype=str),
             "hamming": pd.Series([], dtype="int64")}
        )
    out = pairs.drop_duplicates(subset=["media_a", "media_b"], ignore_index=True)
    return out.sort_values(["media_a", "media_b"]).reset_index(drop=True)


_POPCOUNT8 = np.unpackbits(
    np.arange(256, dtype=np.uint8)[:, None], axis=1
).sum(axis=1).astype(np.int64)
