"""Distributed-rounds graph analytics vs their driver-math twins.

The driver-path functions (graph.pagerank / label_propagation / kcore) are
the bounded-ontology fast path; the *_distributed variants are the open-node-
space path (edges never collect on the driver). These tests pin: (a) exact
output equality on the KG-shaped small graph, (b) correctness on a synthetic
>1e5-node open graph where driver-side adjacency would be the scale bug the
variants exist to avoid.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest

import ray

from ehr_relation_extraction_ray.stages import graph


def _triples_ds(edges: pd.DataFrame) -> "ray.data.Dataset":
    """Wrap a (subj, obj) pair frame as a triples-shaped Dataset: one row
    per supporting doc so edge_weights' row counting is exercised."""
    rows = edges.loc[edges.index.repeat(edges["n"])].reset_index(drop=True)
    rows["doc_id"] = [f"d{i}" for i in range(len(rows))]
    return ray.data.from_pandas(rows[["doc_id", "subj", "obj"]], override_num_blocks=8)


@pytest.fixture(scope="module")
def small_edges() -> pd.DataFrame:
    """Deterministic weighted digraph: two communities + a dangling sink."""
    rng = [
        ("a", "b", 3), ("a", "c", 1), ("b", "c", 2), ("c", "a", 1),
        ("d", "e", 4), ("e", "d", 2), ("e", "f", 1), ("f", "d", 3),
        ("c", "d", 1), ("b", "sink", 2),
    ]
    return pd.DataFrame(rng, columns=["subj", "obj", "n"])


def test_pagerank_distributed_bit_identical(ray_session, small_edges):
    trip = _triples_ds(small_edges)
    local = graph.pagerank(graph.edge_weights(trip))
    dist = graph.pagerank_distributed(trip)
    pd.testing.assert_frame_equal(
        local.sort_values("node").reset_index(drop=True),
        dist.sort_values("node").reset_index(drop=True),
    )


def test_label_prop_distributed_bit_identical(ray_session, small_edges):
    trip = _triples_ds(small_edges)
    local = graph.label_propagation(graph.edge_weights(trip))
    dist = graph.label_propagation_distributed(trip)
    pd.testing.assert_frame_equal(
        local.sort_values("node").reset_index(drop=True),
        dist.sort_values("node").reset_index(drop=True),
    )
    # the two clusters never share a community label (sync LPA may split
    # within a cluster on tiny graphs, but it must not merge across them)
    comm = dist.set_index("node")["community"]
    left = {comm[n] for n in ("a", "b", "c", "sink")}
    right = {comm[n] for n in ("d", "e", "f")}
    assert left.isdisjoint(right)


def test_kcore_distributed_matches_driver_peel(ray_session):
    # triangle + pendant chain + isolated edge: cores 2, 1, 1
    pairs = pd.DataFrame(
        {"ent_a": ["x", "y", "z", "z", "w", "p"],
         "ent_b": ["y", "z", "x", "w", "v", "q"]}
    )
    local = graph.kcore(pairs)
    dist = graph.kcore_distributed(
        ray.data.from_pandas(pairs, override_num_blocks=3)
    ).to_pandas()
    pd.testing.assert_frame_equal(local, dist)
    core = dist.set_index("node")["core"]
    assert core["x"] == core["y"] == core["z"] == 2
    assert core["w"] == core["v"] == 1 and core["p"] == core["q"] == 1


def test_kcore_distributed_orphan_hub(ray_session):
    # star: center degree 5, spokes degree 1 -> everything core 1; the
    # center is orphaned (all spokes peel first) and must still be emitted
    pairs = pd.DataFrame(
        {"ent_a": ["hub"] * 5, "ent_b": [f"s{i}" for i in range(5)]}
    )
    local = graph.kcore(pairs)
    dist = graph.kcore_distributed(
        ray.data.from_pandas(pairs, override_num_blocks=2)
    ).to_pandas()
    pd.testing.assert_frame_equal(local, dist)
    assert (dist["core"] == 1).all() and len(dist) == 6


def _open_graph(n: int) -> pd.DataFrame:
    """Deterministic >1e5-node 'open node space' graph: ring + two chord
    families (degrees 4-6, shallow core depth so the peel terminates in a
    few rounds)."""
    i = np.arange(n, dtype=np.int64)
    a = np.concatenate([i, i, i[: n // 2]])
    b = np.concatenate([(i + 1) % n, (i * 7 + 3) % n, (i[: n // 2] * 13 + 1) % n])
    keep = a != b
    names = np.char.add("n", np.char.zfill(a[keep].astype(str), 7))
    names_b = np.char.add("n", np.char.zfill(b[keep].astype(str), 7))
    return pd.DataFrame({"ent_a": names, "ent_b": names_b})


def test_kcore_distributed_open_graph(ray_session):
    pairs = _open_graph(120_000)
    dist = graph.kcore_distributed(
        ray.data.from_pandas(pairs, override_num_blocks=16), num_partitions=16
    ).to_pandas()
    assert len(dist) == 120_000
    # oracle: the driver peel on the same edge list (fine inside a test)
    local = graph.kcore(pairs)
    pd.testing.assert_frame_equal(local, dist)


def test_pagerank_distributed_open_graph(ray_session):
    pairs = _open_graph(120_000).rename(columns={"ent_a": "subj", "ent_b": "obj"})
    pairs["n"] = 1
    trip = _triples_ds(pairs)
    dist = graph.pagerank_distributed(trip, iters=5)
    assert len(dist) == 120_000
    assert np.isclose(dist["rank"].sum(), 1.0, atol=1e-3)
    local = graph.pagerank(graph.edge_weights(trip), iters=5)
    pd.testing.assert_frame_equal(
        local.sort_values("node").reset_index(drop=True),
        dist.sort_values("node").reset_index(drop=True),
    )


def test_triangles_distributed_matches_driver(ray_session):
    pairs = pd.DataFrame(
        {"ent_a": ["x", "y", "z", "z", "w", "p", "x"],
         "ent_b": ["y", "z", "x", "w", "v", "q", "w"]}
    )
    local = graph.triangles(pairs)
    dist = graph.triangles_distributed(
        ray.data.from_pandas(pairs, override_num_blocks=3)
    )
    pd.testing.assert_frame_equal(local, dist)


def test_triangles_distributed_hot_hub_split(ray_session):
    spokes = [f"s{i:04d}" for i in range(200)]
    edges = pd.DataFrame(
        [("HUB", s) for s in spokes]
        + [(spokes[i], spokes[i + 1]) for i in range(50)],
        columns=["ent_a", "ent_b"],
    )
    local = graph.triangles(edges)
    dist = graph.triangles_distributed(
        ray.data.from_pandas(edges, override_num_blocks=3),
        hub_split_threshold=32,
    )
    pd.testing.assert_frame_equal(local, dist)


def test_triangles_distributed_open_graph(ray_session):
    pairs = _open_graph(120_000)
    dist = graph.triangles_distributed(
        ray.data.from_pandas(pairs, override_num_blocks=16), num_partitions=16
    )
    local = graph.triangles(pairs)
    pd.testing.assert_frame_equal(local, dist)


def test_ppr_distributed_bit_identical(ray_session, small_edges):
    trip = _triples_ds(small_edges)
    edges = graph.edge_weights(trip)
    seed = edges["subj"].min()
    local = graph.personalized_pagerank(edges, seed)
    dist = graph.personalized_pagerank_distributed(trip, seed)
    pd.testing.assert_frame_equal(
        local.sort_values("node").reset_index(drop=True),
        dist.sort_values("node").reset_index(drop=True),
    )


def test_ppr_distributed_missing_seed(ray_session, small_edges):
    trip = _triples_ds(small_edges)
    out = graph.personalized_pagerank_distributed(trip, "no-such-node")
    assert out.empty


def test_betweenness_distributed_matches_driver(ray_session, small_edges):
    trip = _triples_ds(small_edges)
    local = graph.betweenness_approx(graph.edge_weights(trip))
    dist = graph.betweenness_distributed(trip)
    pd.testing.assert_frame_equal(
        local.sort_values("node").reset_index(drop=True),
        dist.sort_values("node").reset_index(drop=True),
    )


def test_betweenness_distributed_open_graph(ray_session):
    # shallow-diameter open graph (ring + chords): pass count is
    # 2 x diameter, so a deep path graph would be the pathological case
    # for BOTH implementations — the open-node-space claim under test is
    # that the edge set never collects on the driver, not diameter.
    pairs = _open_graph(20_000).rename(columns={"ent_a": "subj", "ent_b": "obj"})
    pairs["n"] = 1
    trip = _triples_ds(pairs)
    local = graph.betweenness_approx(graph.edge_weights(trip), k_sources=8)
    dist = graph.betweenness_distributed(trip, k_sources=8)
    pd.testing.assert_frame_equal(
        local.sort_values("node").reset_index(drop=True),
        dist.sort_values("node").reset_index(drop=True),
    )


def test_random_walks_distributed_matches_broadcast(ray_session):
    rng = np.random.default_rng(11)
    pairs = pd.DataFrame(
        {"ent_a": [f"v{x}" for x in rng.integers(0, 40, 300)],
         "ent_b": [f"v{x}" for x in rng.integers(0, 40, 300)]}
    )
    pairs = pairs[pairs["ent_a"] != pairs["ent_b"]].drop_duplicates()
    want = (
        graph.random_walks(pairs, walk_len=4, walks_per_node=2)
        .to_pandas()
        .sort_values(["start", "walk_idx"]).reset_index(drop=True)
    )
    got = (
        graph.random_walks_distributed(
            ray.data.from_pandas(
                pairs.reset_index(drop=True), override_num_blocks=4
            ),
            walk_len=4, walks_per_node=2, num_partitions=8,
        )
        .to_pandas()
        .sort_values(["start", "walk_idx"]).reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(got, want)


def test_random_walks_distributed_open_graph(ray_session):
    # >1e5-node open node space: the frontier-join path must complete
    # without ever materializing a driver/broadcast adjacency
    pairs = _open_graph(120_000)
    got = (
        graph.random_walks_distributed(
            ray.data.from_pandas(pairs, override_num_blocks=16),
            walk_len=3, walks_per_node=1, num_partitions=16,
        )
        .to_pandas()
    )
    assert len(got) == 120_000
    # every walk fully extended (ring+chords: every node has neighbors)
    assert (got["path"].str.count(r"\|") == 3).all()
    # spot-check the md5 hop rule against the broadcast variant on the
    # walks starting at 50 sampled nodes
    sample = got.sort_values(["start", "walk_idx"]).head(50)
    want = (
        graph.random_walks(pairs, walk_len=3, walks_per_node=1)
        .to_pandas()
        .sort_values(["start", "walk_idx"]).head(50).reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(sample.reset_index(drop=True), want)


def test_random_walks_distributed_split_partition_repair(ray_session):
    """Force Ray's dynamic block splitting to break one hash partition
    across pinned blocks (tiny target_max_block_size): the union-find
    repair must merge the pieces so walkers never see a partial
    neighbor list — output stays identical to the broadcast spec."""
    from ray.data import DataContext

    ctx = DataContext.get_current()
    old = ctx.target_max_block_size
    try:
        ctx.target_max_block_size = 4 * 1024  # ~4 KB: guarantees splits
        rng = np.random.default_rng(3)
        pairs = pd.DataFrame(
            {"ent_a": [f"node_{x:05d}" for x in rng.integers(0, 400, 3000)],
             "ent_b": [f"node_{x:05d}" for x in rng.integers(0, 400, 3000)]}
        )
        pairs = pairs[pairs["ent_a"] != pairs["ent_b"]].drop_duplicates()
        got = (
            graph.random_walks_distributed(
                ray.data.from_pandas(
                    pairs.reset_index(drop=True), override_num_blocks=4
                ),
                walk_len=3, walks_per_node=1, num_partitions=4,
            )
            .to_pandas()
            .sort_values(["start", "walk_idx"]).reset_index(drop=True)
        )
    finally:
        ctx.target_max_block_size = old
    want = (
        graph.random_walks(pairs, walk_len=3, walks_per_node=1)
        .to_pandas()
        .sort_values(["start", "walk_idx"]).reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(got, want)


def test_random_walks_distributed_single_partition(ray_session):
    """num_partitions=1 exercises the single-block hop path."""
    pairs = pd.DataFrame(
        {"ent_a": ["a", "b", "c", "a"], "ent_b": ["b", "c", "a", "c"]}
    )
    want = (
        graph.random_walks(pairs, walk_len=2, walks_per_node=2)
        .to_pandas().sort_values(["start", "walk_idx"]).reset_index(drop=True)
    )
    got = (
        graph.random_walks_distributed(
            ray.data.from_pandas(pairs), walk_len=2, walks_per_node=2,
            num_partitions=1,
        )
        .to_pandas().sort_values(["start", "walk_idx"]).reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(got, want)
