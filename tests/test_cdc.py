"""Content-defined chunking: vectorized gear hash + shift resistance."""

import hashlib

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data

from ehr_relation_extraction_ray.stages import dedupe


def _naive_chunks(data: bytes, boundary_mod=64, min_chunk=16):
    gear = [
        ((b * 0x9E3779B97F4A7C15) ^ (b >> 3)) & 0xFFFFFFFFFFFFFFFF
        for b in range(256)
    ]
    h, start, out = 0, 0, []
    for i, b in enumerate(data):
        h = ((h << 1) + gear[b]) & 0xFFFFFFFFFFFFFFFF
        if i - start + 1 >= min_chunk and h % boundary_mod == 0:
            out.append(data[start:i + 1])
            start = i + 1
    if start < len(data):
        out.append(data[start:])
    return out


def test_cdc_stats_match_naive(ray_session):
    rng = np.random.default_rng(11)
    texts = [
        "".join(chr(97 + c) for c in rng.integers(0, 26, size=500))
        for _ in range(30)
    ]
    ds = ray.data.from_arrow(pa.table({"text": pa.array(texts, pa.string())}))
    got = dedupe.cdc_chunk_stats(ds).iloc[0]
    sizes = {}
    n_total = bytes_total = 0
    for t in texts:
        for c in _naive_chunks(t.encode()):
            n_total += 1
            bytes_total += len(c)
            sizes[hashlib.md5(c).hexdigest()] = len(c)
    assert got["n_total"] == n_total
    assert got["n_distinct"] == len(sizes)
    assert got["bytes_total"] == bytes_total
    assert got["bytes_distinct"] == sum(sizes.values())


def test_cdc_shift_resistance(ray_session):
    # prepending bytes must leave MOST chunks identical (the whole point
    # of content-defined vs fixed-window chunking)
    rng = np.random.default_rng(5)
    body = "".join(chr(97 + c) for c in rng.integers(0, 26, size=2000))
    shifted = "XYZ " + body
    a = {hashlib.md5(c).hexdigest() for c in _naive_chunks(body.encode())}
    b = {hashlib.md5(c).hexdigest() for c in _naive_chunks(shifted.encode())}
    shared = len(a & b) / max(len(a), 1)
    assert shared > 0.5
    # and the distributed stats see the saving: ratio > 1.5 on the pair
    ds = ray.data.from_arrow(
        pa.table({"text": pa.array([body, shifted], pa.string())})
    )
    out = dedupe.cdc_chunk_stats(ds).iloc[0]
    assert out["dedup_ratio"] > 1.5
