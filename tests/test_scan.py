"""Distributed prefix-sum scan (functions/scan.py) + sequence packing."""

import numpy as np
import pandas as pd

import ray.data

from ehr_relation_extraction_ray.functions.scan import with_prefix_sum
from ehr_relation_extraction_ray.pipelines.export import pack_sequences


def test_prefix_sum_matches_serial_any_parallelism(ray_session):
    rng = np.random.default_rng(11)
    n = 500
    df = pd.DataFrame(
        {
            "k": rng.permutation(n).astype("int64"),
            "v": rng.integers(0, 100, size=n).astype("int64"),
        }
    )
    serial = df.sort_values("k").reset_index(drop=True)
    serial["prefix_sum"] = serial["v"].cumsum().shift(1, fill_value=0)
    for nparts in (1, 8):
        ds = ray.data.from_pandas(df).repartition(nparts)
        got = (
            with_prefix_sum(ds, "v", "k")
            .to_pandas()
            .sort_values("k")
            .reset_index(drop=True)
        )
        pd.testing.assert_frame_equal(got, serial)


def test_prefix_sum_first_row_zero_and_total(ray_session):
    df = pd.DataFrame({"k": [3, 1, 2], "v": [10, 5, 7]})
    got = (
        with_prefix_sum(ray.data.from_pandas(df).repartition(3), "v", "k")
        .to_pandas()
        .sort_values("k")
        .reset_index(drop=True)
    )
    assert got["prefix_sum"].tolist() == [0, 5, 12]  # exclusive scan


def test_pack_sequences_straddle(ray_session):
    # budget 10: doc 1 (7 tok) starts bin 0; doc 2 (6 tok) starts at
    # prefix 7 -> bin 0 (straddles into bin 1); doc 3 starts at 13 -> bin 1
    docs = pd.DataFrame(
        {
            "doc_id": [1, 2, 3],
            "text": ["a b c d e f g", "h i j k l m", "n o p"],
        }
    )
    out = (
        pack_sequences(ray.data.from_pandas(docs), budget=10)
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    assert out["n_tokens"].tolist() == [7, 6, 3]
    assert out["bin_id"].tolist() == [0, 0, 1]


def test_pack_sequences_null_text(ray_session):
    """Regression: a NULL text row must count 0 tokens, not poison the
    prefix-sum with a propagated null (review finding: null -> INT64_MIN
    through numpy, silently corrupting every later bin in the block)."""
    import pandas as pd
    import pyarrow as pa

    import ray.data

    from ehr_relation_extraction_ray.pipelines.export import pack_sequences

    t = pa.table(
        {
            "doc_id": pa.array([1, 2, 3, 4], pa.int64()),
            "text": pa.array(["a b c", None, "d e", "f g h i"], pa.string()),
        }
    )
    out = (
        pack_sequences(ray.data.from_arrow(t), budget=4)
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    assert list(out["n_tokens"]) == [3, 0, 2, 4]
    # exclusive prefix: 0,3,3,5 -> bins 0,0,0,1
    assert list(out["bin_id"]) == [0, 0, 0, 1]


def test_prefix_sum_coalesces_tiny_exchanges(ray_session):
    # A tiny input spread over many near-empty blocks must not pay a
    # many-partition all-to-all: the scan sizes the sort from the
    # materialized bytes (functions/scan.py SCAN_TARGET_BLOCK_BYTES) and
    # coalesces first. Values must be identical to the serial scan either
    # way — this pins the decision AND the output.
    rng = np.random.default_rng(7)
    n = 2000
    df = pd.DataFrame(
        {
            "k": rng.permutation(n).astype("int64"),
            "v": rng.integers(0, 9, size=n).astype("int64"),
        }
    )
    serial = df.sort_values("k").reset_index(drop=True)
    serial["prefix_sum"] = serial["v"].cumsum().shift(1, fill_value=0)
    out_ds = with_prefix_sum(ray.data.from_pandas(df).repartition(64), "v", "k")
    # tiny bytes -> ceil(bytes / target) == 1 block after the coalesce
    assert out_ds.num_blocks() == 1
    got = out_ds.to_pandas().sort_values("k").reset_index(drop=True)
    pd.testing.assert_frame_equal(got, serial)
