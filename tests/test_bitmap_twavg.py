"""Bitmap-index exact distinct and time-weighted average."""

import numpy as np
import pandas as pd

from ehr_relation_extraction_ray.pipelines import relational

SF = "/root/testdata/sf0.001"


def test_bitmap_distinct_exact(ray_session):
    got = relational.events_bitmap_distinct(SF)
    ev = pd.read_parquet(f"{SF}/events.parquet", columns=["event_type", "user_id"])
    want = (
        ev.groupby("event_type")["user_id"].nunique()
        .rename("n_users").reset_index()
        .sort_values("event_type").reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(
        got[["event_type", "n_users"]], want, check_dtype=False
    )
    t0, t1 = sorted(ev["event_type"].unique())[:2]
    overlap = len(
        set(ev.loc[ev["event_type"] == t0, "user_id"])
        & set(ev.loc[ev["event_type"] == t1, "user_id"])
    )
    assert (got["first_pair_overlap"] == overlap).all()


def test_time_weighted_avg_matches_trapezoid(ray_session):
    got = relational.events_time_weighted_avg(SF)
    ev = pd.read_parquet(
        f"{SF}/events.parquet", columns=["event_id", "user_id", "ts", "value"]
    ).sort_values(["user_id", "ts", "event_id"])
    rows = []
    for uid, grp in ev.groupby("user_id"):
        t = grp["ts"].to_numpy("datetime64[us]").astype(np.int64)
        v = grp["value"].to_numpy(float)
        if t[-1] == t[0]:
            continue
        area = float(np.sum(np.diff(t) * (v[:-1] + v[1:]) / 2.0))
        rows.append({"user_id": uid, "twavg": round(area / (t[-1] - t[0]), 6)})
    want = pd.DataFrame(rows).sort_values("user_id").reset_index(drop=True)
    pd.testing.assert_frame_equal(got, want, check_dtype=False)
    # time-weighted average lies within the value range per user
    mn = ev.groupby("user_id")["value"].min()
    mx = ev.groupby("user_id")["value"].max()
    for _, r in got.iterrows():
        assert mn[r["user_id"]] - 1e-9 <= r["twavg"] <= mx[r["user_id"]] + 1e-9
