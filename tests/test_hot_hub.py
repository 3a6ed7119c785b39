"""Hot-hub splitting in the shared wedge-partial builder (graph._wedge_partials).

A hub of degree D emits D(D-1)/2 wedges from one partition; above
``hub_split_threshold`` the builder splits the hub's sorted neighbor list
into spoke ranges and fans chunk-pair rows out to a bounded expansion pass.
These tests pin: value-invariance of the split (identical jaccard / AA
output), the lineage counter, and the per-chunk-row emission bound.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

import ray

from ehr_relation_extraction_ray.stages import graph


def _planted_hub_edges(hub_deg: int = 900) -> pd.DataFrame:
    """One hub of degree ``hub_deg`` + a small clique, deterministic."""
    spokes = [f"s{i:05d}" for i in range(hub_deg)]
    rows = [("HUB", s) for s in spokes]
    # ring among the first 40 spokes so some pairs also share non-hub wedges
    for i in range(40):
        rows.append((spokes[i], spokes[(i + 1) % 40]))
    return pd.DataFrame(rows, columns=["ent_a", "ent_b"])


def test_hot_hub_split_value_invariant_jaccard(ray_session):
    edges = _planted_hub_edges()
    ds = ray.data.from_pandas(edges, override_num_blocks=4)
    split = graph.neighbor_jaccard(
        ds, min_jaccard=0.0, num_partitions=8, driver_merge=True,
        hub_split_threshold=128,
    )
    whole = graph.neighbor_jaccard(
        ray.data.from_pandas(edges, override_num_blocks=4),
        min_jaccard=0.0, num_partitions=8, driver_merge=True,
        hub_split_threshold=1_000_000,
    )
    pd.testing.assert_frame_equal(split, whole)
    assert len(split) >= 900 * 899 // 2  # the hub's wedges all survived


def test_hot_hub_split_value_invariant_adamic_adar(ray_session):
    edges = _planted_hub_edges(500)
    split = graph.adamic_adar(
        ray.data.from_pandas(edges, override_num_blocks=4),
        num_partitions=8, hub_split_threshold=64,
    )
    whole = graph.adamic_adar(
        ray.data.from_pandas(edges, override_num_blocks=4),
        num_partitions=8, hub_split_threshold=1_000_000,
    )
    pd.testing.assert_frame_equal(split, whole)


def test_hot_hub_lineage_and_bounded_emission(ray_session):
    edges = _planted_hub_edges(600)
    T = 100
    parts = graph._wedge_partials(
        ray.data.from_pandas(edges, override_num_blocks=4),
        "ent_a", "ent_b", num_partitions=8,
        hub_split_threshold=T, weighted=False,
    ).to_pandas()
    lineage = parts[parts["kind"] == graph._KIND_LINEAGE]
    assert list(lineage["y"]) == ["HUB"]
    assert int(lineage["c"].iloc[0]) == -(-600 // T)  # ceil(D/T) chunks
    # wedge totals survive the split exactly
    wedges = parts[parts["kind"] == graph._KIND_WEDGE]
    total = wedges["c"].sum()
    # hub wedges + 40 ring spokes each of degree 3 (HUB + 2 ring nbrs)
    assert total == 600 * 599 / 2 + 40 * 3


def test_chunk_row_emission_bound():
    """The expansion of one chunk-pair row is <= threshold^2 wedges by
    construction (chunks are <= T long): checked directly on the chunk
    geometry, no Ray needed."""
    nbrs = np.array([f"s{i:04d}" for i in range(1000)])
    T = 64
    chunks = np.array_split(nbrs, -(-len(nbrs) // T))
    assert max(len(c) for c in chunks) <= T
    worst = max(len(a) * len(b) for a in chunks for b in chunks)
    assert worst <= T * T
