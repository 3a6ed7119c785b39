"""stages/windows — tumbling/sliding window aggregation."""

import numpy as np
import pandas as pd
import pytest

import ray.data

from ehr_relation_extraction_ray.stages.windows import (
    sliding_window_agg,
    tumbling_window_agg,
)


def _events(n=500, seed=4, n_keys=3):
    rng = np.random.default_rng(seed)
    base = pd.Timestamp("2026-02-01")
    return pd.DataFrame(
        {
            "k": rng.integers(0, n_keys, n).astype("int64").astype(str),
            "ts": base + pd.to_timedelta(rng.integers(0, 50_000, n), unit="s"),
            "v": rng.random(n).round(3),
        }
    )


def test_tumbling_matches_pandas(ray_session):
    df = _events()
    got = (
        tumbling_window_agg(
            ray.data.from_pandas(df), "ts", 3600, key_cols="k", value_col="v"
        )
        .to_pandas()
        .sort_values(["k", "window_start"])
        .reset_index(drop=True)
    )
    want = (
        df.assign(window_start=df["ts"].dt.floor("1h"))
        .groupby(["k", "window_start"], as_index=False)
        .agg(n_events=("v", "size"), sum_value=("v", "sum"))
        .sort_values(["k", "window_start"])
        .reset_index(drop=True)
    )
    got["window_start"] = got["window_start"].astype("datetime64[ns]")
    pd.testing.assert_frame_equal(
        got[["k", "window_start", "n_events", "sum_value"]],
        want,
        check_dtype=False,
    )


def test_sliding_covers_each_event_k_times(ray_session):
    df = _events(n=200)
    out = sliding_window_agg(
        ray.data.from_pandas(df), "ts", 3600, 900, key_cols="k", value_col="v"
    ).to_pandas()
    # every event lands in exactly window/slide = 4 buckets
    assert out["n_events"].sum() == 4 * len(df)
    # each window's count equals the events inside [start, start+window)
    out["window_start"] = out["window_start"].astype("datetime64[ns]")
    sample = out.sample(10, random_state=0)
    for r in sample.itertuples():
        lo, hi = r.window_start, r.window_start + pd.Timedelta(seconds=3600)
        n = ((df["k"] == r.k) & (df["ts"] >= lo) & (df["ts"] < hi)).sum()
        assert n == r.n_events


def test_sliding_rejects_non_multiple(ray_session):
    df = _events(n=10)
    with pytest.raises(ValueError):
        sliding_window_agg(ray.data.from_pandas(df), "ts", 3600, 700)
