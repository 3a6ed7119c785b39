"""Heavy hitters (MG + exact verify), Markov transitions, Q13 custdist."""

import os

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq

from ehr_relation_extraction_ray.pipelines import queries, relational

SF = "/root/testdata/sf0.001"


def _naive_heavy(texts, min_inv_freq):
    toks = pd.Series(
        [w for t in texts for w in str(t).lower().split() if w]
    )
    vc = toks.value_counts()
    n = len(toks)
    keep = vc[vc * min_inv_freq >= n]
    return (
        keep.rename_axis("token")
        .reset_index(name="n")
        .sort_values(["n", "token"], ascending=[False, True])
        .reset_index(drop=True)
    )


def test_docs_heavy_hitters_matches_naive(ray_session):
    got = queries.docs_heavy_hitters(SF)
    texts = pd.read_parquet(f"{SF}/documents.parquet", columns=["text"])["text"]
    want = _naive_heavy(texts, 30)
    pd.testing.assert_frame_equal(got, want, check_dtype=False)


def test_docs_heavy_hitters_mg_prune_path(ray_session, tmp_path):
    # vocabulary (101 tokens) >> capacity (10) forces the MG prune on
    # every block AND on the merged summary; the exact second pass must
    # still return exact counts for the one true heavy hitter.
    rng = np.random.default_rng(7)
    rows = []
    for i in range(200):
        words = ["hot"] * 4 + [f"rare{rng.integers(0, 100)}" for _ in range(6)]
        rows.append(" ".join(words))
    pq.write_table(
        pa.table({"doc_id": pa.array(range(200), pa.int64()),
                  "text": pa.array(rows, pa.string())}),
        os.path.join(tmp_path, "documents.parquet"),
    )
    got = queries.docs_heavy_hitters(str(tmp_path), min_inv_freq=5, capacity=10)
    want = _naive_heavy(rows, 5)
    assert want["token"].tolist() == ["hot"]  # 40% > 1/5 by construction
    pd.testing.assert_frame_equal(got, want, check_dtype=False)


def test_events_markov_matches_pandas(ray_session):
    got = relational.events_markov(SF)
    ev = pd.read_parquet(
        f"{SF}/events.parquet", columns=["event_id", "user_id", "event_type", "ts"]
    ).sort_values(["user_id", "ts", "event_id"])
    prev = ev.groupby("user_id")["event_type"].shift(1)
    tr = (
        pd.DataFrame({"prev_type": prev, "next_type": ev["event_type"]})
        .dropna()
        .groupby(["prev_type", "next_type"])
        .size()
        .reset_index(name="n")
    )
    tr["p"] = (tr["n"] / tr.groupby("prev_type")["n"].transform("sum")).round(6)
    tr = tr.sort_values(["prev_type", "next_type"]).reset_index(drop=True)
    pd.testing.assert_frame_equal(got, tr, check_dtype=False)
    # rows of the transition matrix are probability distributions
    sums = got.groupby("prev_type")["p"].sum()
    assert ((sums - 1.0).abs() < 1e-4).all()


def test_customer_order_distribution_matches_pandas(ray_session):
    got = relational.customer_order_distribution(SF)
    orders = pd.read_parquet(f"{SF}/orders.parquet", columns=["o_custkey"])
    cust = pd.read_parquet(f"{SF}/customer.parquet", columns=["c_custkey"])
    per = orders.groupby("o_custkey").size()
    counts = per.reindex(cust["c_custkey"], fill_value=0)
    want = (
        counts.value_counts()
        .rename_axis("n_orders")
        .reset_index(name="n_customers")
        .sort_values("n_orders")
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(got, want, check_dtype=False)
    # every customer lands in exactly one bucket
    assert int(got["n_customers"].sum()) == len(cust)
