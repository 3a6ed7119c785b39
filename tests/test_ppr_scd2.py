"""Personalized PageRank, SCD Type-2 history, partition-skew report."""

import hashlib

import numpy as np
import pandas as pd

from ehr_relation_extraction_ray.pipelines import queries
from ehr_relation_extraction_ray.pipelines import relational as relational_mod
from ehr_relation_extraction_ray.stages.graph import (
    pagerank,
    personalized_pagerank,
)

SF = "/root/testdata/sf0.001"


def test_ppr_concentrates_on_seed_neighborhood():
    # chain a-b-c-d: PPR from 'a' must rank b above d, and mass sums to 1
    edges = pd.DataFrame(
        {"subj": ["a", "b", "c"], "obj": ["b", "c", "d"], "n": [1, 1, 1]}
    )
    out = personalized_pagerank(edges, "a")
    r = dict(zip(out["node"], out["rank"]))
    assert r["a"] > r["b"] > r["c"] > r["d"]
    assert abs(out["rank"].sum() - 1.0) < 1e-3
    # differs from global pagerank (which has no seed preference)
    g = dict(zip(*pagerank(edges).to_numpy().T))
    assert r["a"] > g["a"]


def test_ppr_unknown_seed_empty():
    edges = pd.DataFrame({"subj": ["a"], "obj": ["b"], "n": [1]})
    assert len(personalized_pagerank(edges, "zzz")) == 0


def test_scd2_version_semantics(ray_session):
    out = queries.docs_scd2(SF)
    docs = pd.read_parquet(f"{SF}/documents.parquet", columns=["doc_id"])
    cls = {
        int(i): hashlib.md5(str(i).encode()).hexdigest()[0]
        for i in docs["doc_id"]
    }
    by_id = dict(tuple(out.groupby("doc_id")))
    for i, c in cls.items():
        g = by_id[i]
        if c == "0":  # removed: one closed version
            assert len(g) == 1 and g["valid_to"].iloc[0] == "2024-02-01"
        elif c in ("1", "2"):  # changed: closed v1 + open v2
            assert len(g) == 2
            assert g.sort_values("version")["valid_to"].tolist() == [
                "2024-02-01", "9999-12-31"
            ]
        else:  # unchanged: one open version
            assert len(g) == 1 and g["valid_to"].iloc[0] == "9999-12-31"
        if c == "3":  # cloned: the new id is an open v1 starting at t1
            gn = by_id[i + 10_000_000]
            assert len(gn) == 1 and gn["valid_from"].iloc[0] == "2024-02-01"
    # validity ranges never invert
    assert (out["valid_from"] < out["valid_to"]).all()


def test_partition_skew_consistency(ray_session):
    out = queries.docs_partition_skew(SF)
    n_docs = len(pd.read_parquet(f"{SF}/documents.parquet", columns=["doc_id"]))
    r = out.iloc[0]
    assert r["n_rows"] == n_docs
    assert r["min_rows"] <= n_docs / r["n_partitions"] <= r["max_rows"]
    assert r["skew_ratio"] >= 1.0 and r["occupied"] <= r["n_partitions"]


def test_adamic_adar_matches_set_math(ray_session):
    import ray.data
    from ehr_relation_extraction_ray.stages.graph import adamic_adar

    edges = pd.DataFrame(
        {"ent_a": ["a", "a", "b", "c"], "ent_b": ["b", "c", "c", "d"]}
    )
    got = adamic_adar(ray.data.from_pandas(edges))
    # adjacency: a-{b,c}, b-{a,c}, c-{a,b,d}, d-{c}
    nbrs = {"a": {"b", "c"}, "b": {"a", "c"}, "c": {"a", "b", "d"}, "d": {"c"}}
    nodes = sorted(nbrs)
    want = []
    for i, x in enumerate(nodes):
        for y in nodes[i + 1:]:
            common = nbrs[x] & nbrs[y]
            s = sum(1.0 / np.log(len(nbrs[z])) for z in common)
            if common:
                want.append((x, y, round(s, 6)))
    assert sorted(zip(got["ent_a"], got["ent_b"], got["aa"])) == sorted(want)


def test_customer_rfm_codes(ray_session):
    got = relational_mod.customer_rfm(SF)
    orders = pd.read_parquet(f"{SF}/orders.parquet")
    per = orders.groupby("o_custkey").agg(
        last=("o_orderdate", "max"), f=("o_orderdate", "size"),
        m=("o_totalprice", "sum"),
    )
    assert len(got) == len(per)
    # codes are quartile-balanced: each code bucket holds >= 10% of customers
    for col in ("r_code", "f_code", "m_code"):
        assert set(got[col]) <= {1, 2, 3, 4}
        assert (got[col].value_counts() / len(got)).min() > 0.10
    # best recency code (4) goes to the most recent customers
    recent = got.nsmallest(10, "r_days")
    assert (recent["r_code"] == 4).all()


def test_betweenness_star_and_path():
    from ehr_relation_extraction_ray.stages.graph import betweenness_approx

    # star: hub h brokers every leaf pair; leaves broker nothing
    edges = pd.DataFrame(
        {"subj": ["h"] * 4, "obj": [f"l{i}" for i in range(4)], "n": [1] * 4}
    )
    out = betweenness_approx(edges, k_sources=5)
    d = dict(zip(out["node"], out["betweenness"]))
    assert d["h"] > 0 and all(d[f"l{i}"] == 0 for i in range(4))
    # deterministic rerun
    pd.testing.assert_frame_equal(out, betweenness_approx(edges, k_sources=5))


def test_events_gini_bounds_and_value(ray_session):
    got = relational_mod.events_gini(SF)
    ev = pd.read_parquet(f"{SF}/events.parquet", columns=["user_id"])
    counts = ev.groupby("user_id").size().to_numpy(float)
    x = np.sort(counts)
    n = len(x)
    want = 2 * (np.arange(1, n + 1) * x).sum() / (n * x.sum()) - (n + 1) / n
    assert abs(got["gini"].iloc[0] - round(want, 6)) < 1e-9
    assert 0.0 <= got["gini"].iloc[0] < 1.0
    assert got["n_users"].iloc[0] == n
