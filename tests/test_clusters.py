"""Distributed connected components (stages/clusters) vs serial union-find."""

import numpy as np
import pandas as pd
import pytest

import ray.data

from ehr_relation_extraction_ray.stages import clusters


def _serial_cc(pairs):
    parent = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in pairs:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    return {n: find(n) for n in parent}


def _run(pairs, **kw):
    ds = ray.data.from_pandas(
        pd.DataFrame(pairs, columns=["doc_a", "doc_b"])
    )
    out = clusters.dup_clusters(ds, **kw).to_pandas()
    return dict(zip(out["doc_id"], out["cluster_id"]))


def test_chain_and_islands():
    pairs = [("b", "a"), ("c", "b"), ("d", "c"), ("f", "e"), ("x9", "x2")]
    assert _run(pairs, num_partitions=4) == _serial_cc(pairs)


def test_long_path_diameter():
    # 12-node path: exercises multi-round propagation (diameter 11)
    nodes = [f"n{i:02d}" for i in range(12)]
    pairs = list(zip(nodes[1:], nodes[:-1]))
    labels = _run(pairs, num_partitions=8)
    assert labels == {n: "n00" for n in nodes}


def test_random_graph_matches_union_find():
    import random

    rng = random.Random(41)
    nodes = [f"d{i:03d}" for i in range(60)]
    pairs = [
        tuple(rng.sample(nodes, 2))
        for _ in range(45)
    ]
    assert _run(pairs, num_partitions=16) == _serial_cc(pairs)


def test_sizes_and_keep_canonical():
    pairs = [("b", "a"), ("c", "b"), ("f", "e")]
    ds = ray.data.from_pandas(
        pd.DataFrame(pairs, columns=["doc_a", "doc_b"])
    )
    lab = clusters.dup_clusters(ds, with_sizes=True, num_partitions=4)
    df = lab.to_pandas().sort_values("doc_id").reset_index(drop=True)
    assert list(df["cluster_size"]) == [3, 3, 3, 2, 2]
    docs = ray.data.from_pandas(
        pd.DataFrame(
            {"doc_id": list("abcdefg"), "text": list("ABCDEFG")}
        )
    )
    kept = clusters.keep_canonical(
        docs, lab.drop_columns(["cluster_size"]), num_partitions=4
    ).to_pandas()
    assert sorted(kept["doc_id"]) == ["a", "d", "e", "g"]
    # text column survives the anti-join untouched
    assert sorted(kept["text"]) == ["A", "D", "E", "G"]


def test_empty_pairs():
    ds = ray.data.from_pandas(
        pd.DataFrame(
            {
                "doc_a": pd.Series([], dtype=str),
                "doc_b": pd.Series([], dtype=str),
            }
        )
    )
    assert clusters.dup_clusters(ds).count() == 0


def test_max_rounds_raises():
    nodes = [f"n{i}" for i in range(8)]
    pairs = list(zip(nodes[1:], nodes[:-1]))
    ds = ray.data.from_pandas(
        pd.DataFrame(pairs, columns=["doc_a", "doc_b"])
    )
    with pytest.raises(RuntimeError, match="no fixed point"):
        clusters.dup_clusters(ds, max_rounds=2, num_partitions=4)


def test_dim_stats_matches_numpy(ray_session):
    from ehr_relation_extraction_ray.stages import similarity

    rng = np.random.default_rng(7)
    m = rng.normal(size=(300, 8)).astype(np.float32)
    ds = ray.data.from_pandas(
        pd.DataFrame({"embedding": [row.tolist() for row in m]})
    ).repartition(5)
    got = similarity.dim_stats(ds).to_pandas().sort_values("dim")
    md = m.astype(np.float64)
    assert list(got["dim"]) == list(range(1, 9))
    assert (got["n"] == 300).all()
    np.testing.assert_allclose(got["mean"], np.round(md.mean(axis=0), 6), atol=2e-6)
    np.testing.assert_allclose(got["sd"], np.round(md.std(axis=0), 6), atol=2e-6)


def test_pca_matches_numpy_eigh(ray_session):
    """Power iteration converges to the true dominant eigenvector (checked
    against an independent np.linalg.eigh), any parallelism."""
    from ehr_relation_extraction_ray.stages import similarity

    rng = np.random.default_rng(11)
    # anisotropic cloud: strong first axis so the spectral gap is real
    base = rng.normal(size=(400, 6))
    base[:, 0] *= 4.0
    rot, _ = np.linalg.qr(rng.normal(size=(6, 6)))
    m = (base @ rot).astype(np.float32)
    ds = ray.data.from_pandas(
        pd.DataFrame({"embedding": [r.tolist() for r in m]})
    ).repartition(4)
    got = similarity.pca_top_component(ds).to_pandas().sort_values("dim")

    md = m.astype(np.float64)
    cov = np.cov(md, rowvar=False, bias=True)
    w, vecs = np.linalg.eigh(cov)
    v = vecs[:, -1]
    if v[np.argmax(np.abs(v))] < 0:
        v = -v
    np.testing.assert_allclose(got["loading"], v, atol=1e-4)
    np.testing.assert_allclose(got["eigval"].iloc[0], w[-1], atol=1e-3)
    assert 0 < got["var_ratio"].iloc[0] <= 1


def test_pagerank_properties():
    """PageRank invariants on a hand-built weighted graph: ranks sum to 1,
    the heavily-cited hub outranks leaves, dangling mass handled."""
    from ehr_relation_extraction_ray.stages.graph import pagerank

    edges = pd.DataFrame(
        {
            "subj": ["a", "b", "c", "d", "d"],
            "obj": ["hub", "hub", "hub", "hub", "a"],
            "n": [5, 3, 2, 4, 1],
        }
    ).sort_values(["subj", "obj"]).reset_index(drop=True)
    out = pagerank(edges)
    assert abs(out["rank"].sum() - 1.0) < 1e-4  # ranks rounded to 6dp
    r = dict(zip(out["node"], out["rank"]))
    assert r["hub"] > r["a"] > r["b"]  # a gets d's extra citation
    assert set(out["node"]) == {"a", "b", "c", "d", "hub"}


def test_khop_bfs_hand_built():
    """Undirected BFS distances on a hand-built triple set: seed = min
    subj, chain a-b-c-d gives hops 0..3 at k=3, edge direction ignored,
    disconnected component (x-y) never reached, k caps depth."""
    import ray.data

    from ehr_relation_extraction_ray.stages.graph import khop

    trip = ray.data.from_items(
        [
            {"subj": "a", "obj": "b"},
            {"subj": "c", "obj": "b"},  # reverse edge: b->c undirected
            {"subj": "c", "obj": "d"},
            {"subj": "d", "obj": "e"},  # hop 4, beyond k=3
            {"subj": "x", "obj": "y"},  # disconnected from seed 'a'
        ]
    )
    out = khop(trip, k=3)
    got = dict(zip(out["node"], out["hop"]))
    assert got == {"a": 0, "b": 1, "c": 2, "d": 3}
    assert list(out["node"]) == sorted(out["node"])

    short = khop(trip, k=1)
    assert dict(zip(short["node"], short["hop"])) == {"a": 0, "b": 1}


def test_semdedup_subset_of_exact():
    """SemDeDup pairs are exactly the within-cell subset of the exact
    all-pairs result: every emitted pair clears the threshold, appears in
    the exact pair set with the same cosine, and planted near-identical
    vectors (which k-means must co-locate) are always recovered."""
    import ray.data

    from ehr_relation_extraction_ray.stages.similarity import (
        cosine_dup_pairs_exact,
        semdedup_pairs,
    )

    rng = np.random.default_rng(7)
    base = rng.standard_normal((40, 16)).astype(np.float32)
    base[17] = base[3] + 0.01 * rng.standard_normal(16).astype(np.float32)
    base[29] = base[11] + 0.01 * rng.standard_normal(16).astype(np.float32)
    vecs = ray.data.from_items(
        [{"vec_id": i, "embedding": base[i].tolist()} for i in range(len(base))]
    )
    sem = semdedup_pairs(vecs, nlist=4, threshold=0.9)
    exact = cosine_dup_pairs_exact(vecs, threshold=0.9)
    exact_pairs = {
        (int(a), int(b)): round(float(c), 4)
        for a, b, c in zip(exact["id_a"], exact["id_b"], exact["cosine"])
    }
    got = {(int(a), int(b)) for a, b in zip(sem["vec_a"], sem["vec_b"])}
    assert got <= set(exact_pairs)
    for a, b, c in zip(sem["vec_a"], sem["vec_b"], sem["cos"]):
        assert abs(round(float(c), 4) - exact_pairs[(int(a), int(b))]) <= 1e-4
    assert {(3, 17), (11, 29)} <= got


def test_edge_weights_mergeable_incremental():
    """Incremental graph materialization invariant: edge weights computed
    on two disjoint triple splits and merged by (subj, obj) sum equal the
    single-pass result on the union — the property that lets a daily
    ingest fold new edges into an existing edge table without recompute."""
    import ray.data

    from ehr_relation_extraction_ray.stages.graph import edge_weights

    rows = [
        {"doc_id": f"d{i}", "subj": s, "obj": o}
        for i, (s, o) in enumerate(
            [("a", "x"), ("a", "x"), ("b", "y"), ("a", "z"), ("b", "y"), ("c", "x")]
        )
    ]
    full = edge_weights(ray.data.from_items(rows))
    part_a = edge_weights(ray.data.from_items(rows[:3]))
    part_b = edge_weights(ray.data.from_items(rows[3:]))
    merged = (
        pd.concat([part_a, part_b])
        .groupby(["subj", "obj"], as_index=False)["n"]
        .sum()
        .sort_values(["subj", "obj"])
        .reset_index(drop=True)
    )
    merged["n"] = merged["n"].astype("int64")
    pd.testing.assert_frame_equal(merged, full)
