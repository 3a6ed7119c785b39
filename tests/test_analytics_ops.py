"""Chi-square contingency, HLL set algebra, CUSUM change-point."""

import numpy as np
import pandas as pd

from ehr_relation_extraction_ray.pipelines import relational

SF = "/root/testdata/sf0.001"


def test_chisq_matches_pandas(ray_session):
    got = relational.events_type_weekday_chisq(SF)
    ev = pd.read_parquet(f"{SF}/events.parquet", columns=["event_type", "ts"])
    c = (
        pd.DataFrame(
            {"event_type": ev["event_type"], "dow": ev["ts"].dt.dayofweek + 1}
        )
        .groupby(["event_type", "dow"]).size().reset_index(name="n")
    )
    n = float(c["n"].sum())
    e = (
        c.groupby("event_type")["n"].transform("sum").to_numpy(float)
        * c.groupby("dow")["n"].transform("sum").to_numpy(float) / n
    )
    want = c.assign(
        expected=np.round(e, 6),
        contrib=np.round((c["n"].to_numpy(float) - e) ** 2 / e, 6),
    ).sort_values(["event_type", "dow"]).reset_index(drop=True)
    pd.testing.assert_frame_equal(got, want, check_dtype=False)
    # marginals of expected match marginals of observed
    assert abs(got["expected"].sum() - got["n"].sum()) < 1e-3


def test_hll_overlap_exact_and_estimate(ray_session):
    got = relational.events_hll_overlap(SF)
    ev = pd.read_parquet(f"{SF}/events.parquet", columns=["event_type", "user_id"])
    users = {
        et: set(g["user_id"]) for et, g in ev.groupby("event_type")
    }
    for _, r in got.iterrows():
        exact = len(users[r["type_a"]] & users[r["type_b"]])
        assert r["n_exact"] == exact
        # HLL inclusion-exclusion is approximate: within 15% + small abs slack
        assert abs(r["n_est"] - exact) <= max(0.15 * exact, 25)


def test_cusum_flags_injected_shift(ray_session, tmp_path):
    import pyarrow as pa
    import pyarrow.parquet as pq

    # flat series with a level shift on day 30 -> CUSUM peaks at the end
    # of the elevated run, and max_cusum ≈ total injected excess mass
    days = pd.date_range("2020-01-01", periods=60, freq="D")
    rows = []
    eid = 0
    for i, d in enumerate(days):
        n = 10 + (20 if 30 <= i < 40 else 0)
        for _ in range(n):
            rows.append((eid, d, 1, "click", 0.0, "{}"))
            eid += 1
    pq.write_table(
        pa.table(
            {
                "event_id": pa.array([r[0] for r in rows], pa.int64()),
                "ts": pa.array([r[1] for r in rows], pa.timestamp("us")),
                "user_id": pa.array([r[2] for r in rows], pa.int64()),
                "event_type": pa.array([r[3] for r in rows], pa.string()),
                "value": pa.array([r[4] for r in rows], pa.float64()),
                "props": pa.array([r[5] for r in rows], pa.string()),
            }
        ),
        tmp_path / "events.parquet",
    )
    out = relational.events_cusum(str(tmp_path))
    assert out["peak_day"].iloc[0] == "2020-02-09"  # day index 39
    # excess over the mean accumulated across the 10 elevated days
    mean = (60 * 10 + 10 * 20) / 60
    want = sum(max(0, 30 - mean) for _ in range(10))
    assert abs(out["max_cusum"].iloc[0] - round(want, 4)) < 1e-6


def test_join_size_estimate_accuracy(ray_session):
    got = relational.orders_lineitem_join_size(SF)
    o = pd.read_parquet(f"{SF}/orders.parquet", columns=["o_orderkey"])
    li = pd.read_parquet(f"{SF}/lineitem.parquet", columns=["l_orderkey"])
    true = float(len(li.merge(o, left_on="l_orderkey", right_on="o_orderkey")))
    vals = dict(zip(got["metric"], got["value"]))
    assert vals["join_size_exact"] == true
    # AGMS guarantee: relative error within a few sigma of 1/sqrt(16)
    assert abs(vals["join_size_ams"] - true) / true < 0.5


def test_decayed_sum_bounds_and_match(ray_session):
    got = relational.events_decayed_sum(SF)
    ev = pd.read_parquet(f"{SF}/events.parquet", columns=["event_type", "ts", "value"])
    t_max = ev["ts"].max().to_datetime64().astype("datetime64[us]").astype(np.int64)
    dt = t_max - ev["ts"].to_numpy("datetime64[us]").astype(np.int64)
    w = ev["value"].to_numpy(float) * 2.0 ** (-dt / (7 * 24 * 3600 * 1e6))
    want = (
        pd.DataFrame({"event_type": ev["event_type"], "w": w})
        .groupby("event_type")["w"].sum().round(4)
        .rename("decayed_sum").reset_index()
        .sort_values("event_type").reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(got, want, check_dtype=False)
    # decayed sum is strictly below the plain sum (every weight < 1 except t_max)
    plain = ev.groupby("event_type")["value"].sum()
    for _, r in got.iterrows():
        assert r["decayed_sum"] < plain[r["event_type"]]


def test_diff_in_diff_matches_pandas(ray_session):
    got = relational.events_diff_in_diff(SF)
    ev = pd.read_parquet(f"{SF}/events.parquet")
    ev["treat"] = ev["user_id"] % 2 == 0
    ev["post"] = ev["ts"] >= pd.Timestamp("2024-01-15")
    m = ev.groupby(["event_type", "treat", "post"])["value"].mean()
    rows = []
    for et in sorted(ev["event_type"].unique()):
        try:
            did = (m[(et, True, True)] - m[(et, True, False)]) - (
                m[(et, False, True)] - m[(et, False, False)]
            )
        except KeyError:
            continue
        rows.append({"event_type": et, "did": round(did, 6)})
    want = pd.DataFrame(rows)
    pd.testing.assert_frame_equal(got, want, check_dtype=False)


def test_zipf_fit_slope_negative(ray_session):
    from ehr_relation_extraction_ray.pipelines import queries

    out = queries.docs_zipf_fit(SF)
    assert out["n_tokens_used"].iloc[0] > 0
    # counts are rank-sorted descending, so the fitted slope is <= 0
    assert out["slope"].iloc[0] <= 0
    # near-uniform synthetic vocab: slope magnitude well under natural -1
    assert out["slope"].iloc[0] > -1.0


def test_tier_join_partition_of_events(ray_session):
    got = relational.events_tier_join(SF)
    ev = pd.read_parquet(f"{SF}/events.parquet", columns=["value"])
    # tiers partition the value domain: counts and sums total exactly
    assert int(got["n"].sum()) == len(ev)
    assert abs(got["sum_value"].sum() - round(ev["value"].sum(), 2)) < 0.05
    bounds = {"t0": (0, 1), "t1": (1, 5), "t2": (5, 20), "t3": (20, 100),
              "t4": (100, 1e18)}
    for _, r in got.iterrows():
        lo, hi = bounds[r["tier"]]
        n = int(((ev["value"] >= lo) & (ev["value"] < hi)).sum())
        assert n == r["n"]


def test_heaps_fit_sublinear_growth(ray_session):
    from ehr_relation_extraction_ray.pipelines import queries

    out = queries.docs_heaps_fit(SF)
    r = out.iloc[0]
    # closed synthetic vocabulary: growth saturates, so beta << 1
    assert 0.0 <= r["beta"] < 0.7
    assert r["vocab_final"] <= r["tokens_final"]
    # final vocab equals the true distinct-token count
    texts = pd.read_parquet(f"{SF}/documents.parquet", columns=["text"])["text"]
    vocab = {w for t in texts for w in str(t).lower().split() if w}
    assert r["vocab_final"] == len(vocab)


def test_burstiness_bounds(ray_session):
    from ehr_relation_extraction_ray.pipelines import queries

    out = queries.docs_burstiness(SF)
    # cf/df >= 1 always; df can never exceed the doc count
    assert (out["burstiness"] >= 1.0).all()
    n_docs = len(pd.read_parquet(f"{SF}/documents.parquet", columns=["doc_id"]))
    assert (out["df"] <= n_docs).all()
    assert (out["cf"] >= out["df"]).all()


def test_autocorr_bounds_and_pandas(ray_session):
    got = relational.events_autocorr(SF)
    assert ((got["lag1_corr"] >= -1.0) & (got["lag1_corr"] <= 1.0)).all()
    ev = pd.read_parquet(f"{SF}/events.parquet", columns=["event_type", "ts"])
    daily = (
        pd.DataFrame({"t": ev["event_type"], "day": ev["ts"].dt.floor("D")})
        .groupby(["t", "day"]).size().reset_index(name="n")
    )
    for _, r in got.iterrows():
        x = daily[daily["t"] == r["event_type"]].sort_values("day")["n"].to_numpy(float)
        assert r["n_days"] == len(x)
        a, b = x[:-1], x[1:]
        da, db = a - a.mean(), b - b.mean()
        want = (da * db).sum() / np.sqrt((da * da).sum() * (db * db).sum())
        assert abs(r["lag1_corr"] - round(want, 6)) < 1e-9


def test_benford_digit_partition(ray_session):
    got = relational.events_benford(SF)
    ev = pd.read_parquet(f"{SF}/events.parquet", columns=["value"])
    pos = ev[ev["value"] > 0]
    assert list(got["digit"]) == list(range(1, 10))
    assert int(got["n"].sum()) == len(pos)
    # expected counts sum to the total (Benford probabilities sum to 1)
    assert abs(got["expected"].sum() - len(pos)) < 0.1
