"""stages/joins — hash-shuffle equi-join and as-of join semantics."""

import numpy as np
import pandas as pd
import pytest

import ray.data

from ehr_relation_extraction_ray.stages.joins import asof_join, hash_join


def test_hash_join_matches_pandas(ray_session):
    rng = np.random.default_rng(3)
    left = pd.DataFrame(
        {"k": rng.integers(0, 20, 200), "lv": rng.integers(0, 100, 200)}
    )
    right = pd.DataFrame({"k": np.arange(15), "rv": np.arange(15) * 10})
    got = (
        hash_join(
            ray.data.from_pandas(left),
            ray.data.from_pandas(right),
            on="k",
            num_partitions=4,
        )
        .to_pandas()
        .sort_values(["k", "lv"])
        .reset_index(drop=True)
    )
    want = (
        left.merge(right, on="k", how="inner")
        .sort_values(["k", "lv"])
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(
        got[["k", "lv", "rv"]], want[["k", "lv", "rv"]], check_dtype=False
    )


def _asof_frames(seed=11, n_keys=9, n_left=300, n_right=200):
    rng = np.random.default_rng(seed)
    base = pd.Timestamp("2026-01-01")
    left = pd.DataFrame(
        {
            "user": rng.integers(0, n_keys, n_left).astype("int64"),
            "ts": base + pd.to_timedelta(rng.integers(0, 10**6, n_left), unit="s"),
            "lval": rng.integers(0, 100, n_left).astype("int64"),
        }
    )
    right = pd.DataFrame(
        {
            "user": rng.integers(0, n_keys, n_right).astype("int64"),
            "ts": base + pd.to_timedelta(rng.integers(0, 10**6, n_right), unit="s"),
            "rval": rng.integers(0, 100, n_right).astype("int64"),
        }
    )
    # drop ts ties within a key on the right so the matched row is unique
    right = right.drop_duplicates(subset=["user", "ts"]).reset_index(drop=True)
    return left, right


def test_asof_join_matches_global_merge_asof(ray_session):
    left, right = _asof_frames()
    got = (
        asof_join(
            ray.data.from_pandas(left),
            ray.data.from_pandas(right),
            by="user",
            on="ts",
            num_partitions=5,
        )
        .to_pandas()
        .sort_values(["user", "ts", "lval"])
        .reset_index(drop=True)
    )
    want = (
        pd.merge_asof(
            left.sort_values("ts", kind="stable"),
            right.sort_values("ts", kind="stable").rename(columns={"rval": "rval_r"}),
            on="ts",
            by="user",
            direction="backward",
        )
        .sort_values(["user", "ts", "lval"])
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(
        got[["user", "ts", "lval", "rval_r"]],
        want[["user", "ts", "lval", "rval_r"]],
        check_dtype=False,
    )
    # left-outer: every left row survives; keys with no right rows -> null
    assert len(got) == len(left)
    assert got["rval_r"].isna().any()


def test_semi_anti_join_match_pandas(ray_session):
    from ehr_relation_extraction_ray.stages.joins import anti_join, semi_join

    rng = np.random.default_rng(5)
    left = pd.DataFrame(
        {"k": rng.integers(0, 50, size=200).astype("int64"),
         "v": np.arange(200, dtype="int64")}
    )
    right = pd.DataFrame({"rk": rng.integers(25, 75, size=300).astype("int64")})
    lds = ray.data.from_pandas(left).repartition(4)
    rds = ray.data.from_pandas(right).repartition(3)
    keys = set(right["rk"])
    want_semi = left[left["k"].isin(keys)].sort_values("v").reset_index(drop=True)
    want_anti = left[~left["k"].isin(keys)].sort_values("v").reset_index(drop=True)
    got_semi = (
        semi_join(lds, rds, "k", right_on="rk", num_partitions=4)
        .to_pandas().sort_values("v").reset_index(drop=True)
    )
    got_anti = (
        anti_join(lds, rds, "k", right_on="rk", num_partitions=4)
        .to_pandas().sort_values("v").reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(got_semi[["k", "v"]], want_semi)
    pd.testing.assert_frame_equal(got_anti[["k", "v"]], want_anti)
    # duplicates on the right never duplicate left rows (semi, not inner)
    assert len(got_semi) + len(got_anti) == len(left)


def _interval_frames(seed=17, n_keys=6, n_points=400):
    rng = np.random.default_rng(seed)
    ivs = []
    for k in range(n_keys):
        t = 0
        for s in range(rng.integers(1, 6)):
            start = t + int(rng.integers(1, 50))
            end = start + int(rng.integers(0, 80))
            ivs.append({"k": k, "start": start, "end": end, "iv_id": f"{k}:{s}"})
            t = end + 1  # non-overlapping per key
    intervals = pd.DataFrame(ivs)
    points = pd.DataFrame(
        {
            "k": rng.integers(0, n_keys, n_points).astype("int64"),
            "ts": rng.integers(0, 400, n_points).astype("int64"),
            "pid": np.arange(n_points, dtype=np.int64),
        }
    )
    return points, intervals


def _brute_interval(points, intervals, how):
    rows = []
    for p in points.itertuples():
        match = intervals[
            (intervals["k"] == p.k)
            & (intervals["start"] <= p.ts)
            & (p.ts <= intervals["end"])
        ]
        if len(match):
            m = match.iloc[0]
            rows.append((p.k, p.ts, p.pid, m["start"], m["end"], m["iv_id"]))
        elif how == "left":
            rows.append((p.k, p.ts, p.pid, None, None, None))
    return (
        pd.DataFrame(
            rows, columns=["k", "ts", "pid", "start_r", "end_r", "iv_id_r"]
        )
        .sort_values("pid")
        .reset_index(drop=True)
    )


@pytest.mark.parametrize("how", ["inner", "left"])
def test_interval_join_matches_brute_force(ray_session, how):
    from ehr_relation_extraction_ray.stages.joins import interval_join

    points, intervals = _interval_frames()
    got = (
        interval_join(
            ray.data.from_pandas(points).repartition(5),
            ray.data.from_pandas(intervals).repartition(3),
            by="k", on="ts", start_col="start", end_col="end",
            how=how, num_partitions=8,
        )
        .to_pandas()
        .sort_values("pid")
        .reset_index(drop=True)
    )
    want = _brute_interval(points, intervals, how)
    pd.testing.assert_frame_equal(
        got[want.columns].reset_index(drop=True), want, check_dtype=False
    )
