"""Group-wise normalization (z-score) and LAG-delta window operators."""

import numpy as np
import pandas as pd

from ehr_relation_extraction_ray.pipelines import relational

SF = "/root/testdata/sf0.001"


def test_events_zscore_matches_pandas(ray_session):
    got = relational.events_zscore(SF)
    ev = pd.read_parquet(f"{SF}/events.parquet",
                         columns=["event_id", "event_type", "value"])
    g = ev.groupby("event_type")["value"]
    z = (ev["value"] - g.transform("mean")) / g.transform(lambda s: s.std(ddof=0))
    want = ev.assign(zscore=z.round(4)).drop(columns="value")
    want = want.sort_values("event_id").reset_index(drop=True)
    pd.testing.assert_frame_equal(
        got[["event_id", "event_type", "zscore"]],
        want[["event_id", "event_type", "zscore"]],
        check_dtype=False,
    )
    # per-group z-scores sum to ~0 by construction
    assert abs(got["zscore"].sum()) < 1.0


def test_events_lag_delta_matches_pandas(ray_session):
    got = relational.events_lag_delta(SF)
    ev = pd.read_parquet(f"{SF}/events.parquet",
                         columns=["event_id", "user_id", "ts", "value"])
    ev = ev.sort_values(["user_id", "ts", "event_id"])
    d = ev.groupby("user_id")["value"].diff().abs()
    want = (
        pd.DataFrame({"user_id": ev["user_id"].to_numpy(), "d": d.to_numpy()})
        .groupby("user_id")["d"]
        .agg(n_deltas="count", sum_abs_delta="sum")
        .reset_index()
    )
    want["sum_abs_delta"] = want["sum_abs_delta"].round(2)
    want = want.sort_values("user_id").reset_index(drop=True)
    pd.testing.assert_frame_equal(got, want, check_dtype=False)
    # every user with k events contributes exactly k-1 deltas
    counts = ev.groupby("user_id").size()
    assert int(got["n_deltas"].sum()) == int((counts - 1).sum())


def test_events_winsorized_matches_pandas(ray_session):
    import math

    got = relational.events_winsorized(SF)
    ev = pd.read_parquet(f"{SF}/events.parquet", columns=["event_type", "value"])
    rows = []
    for t, sub in ev.groupby("event_type"):
        v = np.sort(sub["value"].to_numpy())
        n = len(v)
        lo = v[max(math.ceil(0.05 * n) - 1, 0)]
        hi = v[max(math.ceil(0.95 * n) - 1, 0)]
        rows.append(
            {
                "event_type": t,
                "n_events": n,
                "n_clip_lo": int((sub["value"] < lo).sum()),
                "n_clip_hi": int((sub["value"] > hi).sum()),
                "sum_clipped": round(float(np.clip(sub["value"], lo, hi).sum()), 2),
            }
        )
    want = pd.DataFrame(rows).sort_values("event_type").reset_index(drop=True)
    pd.testing.assert_frame_equal(got, want, check_dtype=False)
    # ~5% clipped on each side by construction
    frac_lo = got["n_clip_lo"].sum() / got["n_events"].sum()
    assert frac_lo < 0.06


def test_events_quantiles_hist_bounded_error(ray_session):
    """Mergeable-histogram quantiles: deterministic at any parallelism and
    within width/2 of the exact per-group quantiles."""
    import math

    got = relational.events_quantiles_hist(SF, width=5.0)
    ev = pd.read_parquet(f"{SF}/events.parquet", columns=["event_type", "value"])
    for _, row in got.iterrows():
        v = np.sort(ev.loc[ev["event_type"] == row["event_type"], "value"].to_numpy())
        for q, col in ((0.25, "q25"), (0.5, "q50"), (0.9, "q90")):
            exact = v[max(math.ceil(q * len(v)) - 1, 0)]
            assert abs(row[col] - exact) <= 2.5 + 1e-9, (row["event_type"], col)


def test_events_cube_consistency(ray_session):
    """CUBE invariants: each coarser grouping set sums exactly to the
    finest grain, and the grand total matches the raw table."""
    got = relational.events_cube(SF)
    fine = got[(got["event_type"] != "ALL") & (got["weekday"] != -1)]
    by_type = got[(got["event_type"] != "ALL") & (got["weekday"] == -1)]
    by_wd = got[(got["event_type"] == "ALL") & (got["weekday"] != -1)]
    total = got[(got["event_type"] == "ALL") & (got["weekday"] == -1)]
    assert len(total) == 1
    assert int(fine["n_events"].sum()) == int(total["n_events"].iloc[0])
    assert int(by_type["n_events"].sum()) == int(total["n_events"].iloc[0])
    assert int(by_wd["n_events"].sum()) == int(total["n_events"].iloc[0])
    ev = pd.read_parquet(f"{SF}/events.parquet", columns=["value"])
    assert int(total["n_events"].iloc[0]) == len(ev)
    assert abs(total["sum_value"].iloc[0] - round(ev["value"].sum(), 2)) < 0.05


def test_events_funnel_hand_built(ray_session, tmp_path):
    """Funnel ordering semantics on a hand-built event log: clicks before
    the first view don't count; purchases require a prior qualifying
    click; parallelism-invariant."""
    base = pd.Timestamp("2026-01-01")
    rows = [
        # user 1: full funnel in order
        (1, 0, "view"), (1, 1, "click"), (1, 2, "purchase"),
        # user 2: click BEFORE view, never again -> stops at step1
        (2, 0, "click"), (2, 1, "view"),
        # user 3: view then purchase but no click -> step1 only
        (3, 0, "view"), (3, 1, "purchase"),
        # user 4: view, click, purchase but purchase before click -> step2
        (4, 0, "view"), (4, 1, "purchase"), (4, 2, "click"),
        # user 5: no view at all
        (5, 0, "click"), (5, 1, "purchase"),
    ]
    df = pd.DataFrame(
        {
            "user_id": [r[0] for r in rows],
            "ts": [base + pd.Timedelta(minutes=r[1]) for r in rows],
            "event_type": [r[2] for r in rows],
        }
    )
    df.to_parquet(tmp_path / "events.parquet")
    out = relational.events_funnel(str(tmp_path)).set_index("step")["n_users"]
    assert out["step1_view"] == 4   # users 1-4
    assert out["step2_click"] == 2  # users 1, 4
    assert out["step3_purchase"] == 1  # user 1 only


def test_events_retention_hand_built(ray_session, tmp_path):
    """Cohort semantics: Monday-truncated first week; a user counts once
    per active week at the right offset."""
    rows = [
        # user 1: first event Wed Jan 7 2026 (week of Mon Jan 5);
        # active again two weeks later
        (1, "2026-01-07"), (1, "2026-01-08"), (1, "2026-01-20"),
        # user 2: same cohort week, only week 0
        (2, "2026-01-05"),
        # user 3: next week's cohort
        (3, "2026-01-14"),
    ]
    df = pd.DataFrame(
        {
            "user_id": [r[0] for r in rows],
            "ts": pd.to_datetime([r[1] for r in rows]),
        }
    )
    df.to_parquet(tmp_path / "events.parquet")
    out = relational.events_retention(str(tmp_path))
    got = {
        (r.cohort_week, r.week_offset): r.n_users for r in out.itertuples()
    }
    assert got == {
        ("2026-01-05", 0): 2,
        ("2026-01-05", 2): 1,
        ("2026-01-12", 0): 1,
    }
