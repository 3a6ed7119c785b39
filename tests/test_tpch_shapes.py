"""TPC-H Q5 / Q15 / Q18 shapes vs naive pandas recomputes."""

import numpy as np
import pandas as pd

from ehr_relation_extraction_ray.pipelines import relational

SF = "/root/testdata/sf0.001"


def _t(name, cols=None):
    return pd.read_parquet(f"{SF}/{name}.parquet", columns=cols)


def test_local_supplier_volume_matches_pandas(ray_session):
    got = relational.local_supplier_volume(SF)
    nat, reg = _t("nation"), _t("region")
    rkey = int(reg.loc[reg["r_name"] == "ASIA", "r_regionkey"].iloc[0])
    li = _t("lineitem").merge(
        _t("orders"), left_on="l_orderkey", right_on="o_orderkey"
    )
    li = li[(li["o_orderdate"] >= "1996-01-01") & (li["o_orderdate"] < "1997-01-01")]
    li = li.merge(_t("customer"), left_on="o_custkey", right_on="c_custkey")
    li = li.merge(_t("supplier"), left_on="l_suppkey", right_on="s_suppkey")
    li = li[li["c_nationkey"] == li["s_nationkey"]]
    li = li.merge(nat[nat["n_regionkey"] == rkey],
                  left_on="s_nationkey", right_on="n_nationkey")
    li["rev"] = li["l_extendedprice"] * (1 - li["l_discount"])
    want = (
        li.groupby("n_name", as_index=False)["rev"].sum()
        .rename(columns={"rev": "revenue"})
        .sort_values("n_name").reset_index(drop=True)
    )
    want["revenue"] = want["revenue"].round(2)
    pd.testing.assert_frame_equal(got, want, check_dtype=False)


def test_large_volume_orders_matches_pandas(ray_session):
    got = relational.large_volume_orders(SF)
    li = _t("lineitem", ["l_orderkey", "l_quantity"])
    qual = li.groupby("l_orderkey")["l_quantity"].sum()
    qual = qual[qual > 300]
    orders = _t("orders", ["o_orderkey", "o_custkey", "o_totalprice"])
    cust = _t("customer", ["c_custkey", "c_name"])
    want = (
        orders[orders["o_orderkey"].isin(qual.index)]
        .merge(cust, left_on="o_custkey", right_on="c_custkey")
        .assign(sum_qty=lambda d: d["o_orderkey"].map(qual))
        .sort_values(["o_totalprice", "o_orderkey"], ascending=[False, True])
        .head(100)
        .reset_index(drop=True)
    )[["c_name", "o_orderkey", "o_totalprice", "sum_qty"]]
    pd.testing.assert_frame_equal(got, want, check_dtype=False)
    assert len(got) > 0  # threshold chosen to qualify a handful at sf0.001


def test_top_supplier_matches_pandas(ray_session):
    got = relational.top_supplier(SF)
    li = _t("lineitem")
    li = li[(li["l_shipdate"] >= "1996-01-01") & (li["l_shipdate"] < "1996-04-01")]
    rev = (
        (li["l_extendedprice"] * (1 - li["l_discount"]))
        .groupby(li["l_suppkey"]).sum().round(2)
    )
    best = rev[rev == rev.max()]
    sup = _t("supplier", ["s_suppkey", "s_name"])
    want = (
        sup[sup["s_suppkey"].isin(best.index)]
        .assign(total_revenue=lambda d: d["s_suppkey"].map(best))
        .sort_values("s_suppkey").reset_index(drop=True)
    )[["s_suppkey", "s_name", "total_revenue"]]
    pd.testing.assert_frame_equal(got, want, check_dtype=False)


def test_rich_inactive_customers_matches_pandas(ray_session):
    got = relational.rich_inactive_customers(SF)
    cust = _t("customer", ["c_custkey", "c_acctbal"])
    orders = _t("orders", ["o_custkey", "o_orderdate"])
    thr = cust.loc[cust["c_acctbal"] > 0, "c_acctbal"].mean()
    recent = set(orders.loc[orders["o_orderdate"] >= "2000-01-01", "o_custkey"])
    keep = cust[(cust["c_acctbal"] > thr) & ~cust["c_custkey"].isin(recent)]
    assert got["n_customers"].iloc[0] == len(keep)
    assert abs(got["total_bal"].iloc[0] - round(keep["c_acctbal"].sum(), 2)) < 0.01
    assert got["n_customers"].iloc[0] > 0  # window chosen to be non-trivial


def test_orders_interarrival_matches_pandas(ray_session):
    import math

    got = relational.orders_interarrival(SF)
    orders = _t("orders", ["o_custkey", "o_orderkey", "o_orderdate"]).sort_values(
        ["o_custkey", "o_orderdate", "o_orderkey"]
    )
    buckets = {}
    for _, grp in orders.groupby("o_custkey"):
        if len(grp) < 2:
            continue
        d = grp["o_orderdate"].to_numpy("datetime64[D]").astype(int)
        g = np.sort(np.diff(d))
        med = int(g[max(math.ceil(0.5 * len(g)) - 1, 0)])
        buckets[med // 7] = buckets.get(med // 7, 0) + 1
    want = (
        pd.DataFrame(sorted(buckets.items()), columns=["bucket_weeks", "n_customers"])
    )
    pd.testing.assert_frame_equal(got, want, check_dtype=False)
    # every multi-order customer lands in exactly one bucket
    multi = (orders.groupby("o_custkey").size() >= 2).sum()
    assert int(got["n_customers"].sum()) == multi
