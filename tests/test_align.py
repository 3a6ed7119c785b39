"""Cross-snapshot entity alignment (stages/align).

Pins: brute-force equivalence of the distributed bipartite
signature-Jaccard, hot-feature chunk-split value-invariance, and the
empty / no-overlap edge cases.
"""

from __future__ import annotations

import itertools

import numpy as np
import pandas as pd

import ray

from ehr_relation_extraction_ray.stages import align


def _brute_force(feats: pd.DataFrame, min_jaccard: float) -> pd.DataFrame:
    sets: dict = {}
    for ent, feat in zip(feats["ent"], feats["feat"]):
        sets.setdefault(ent, set()).add(feat)
    a_ents = sorted(e for e in sets if e.startswith("a\x1f"))
    b_ents = sorted(e for e in sets if e.startswith("b\x1f"))
    rows = []
    for ea, eb in itertools.product(a_ents, b_ents):
        inter = len(sets[ea] & sets[eb])
        if inter == 0:
            continue
        jac = inter / len(sets[ea] | sets[eb])
        if jac >= min_jaccard:
            rows.append((ea[2:], eb[2:], round(jac, 4)))
    if not rows:
        return pd.DataFrame(
            {"ent_a": pd.Series([], dtype=str),
             "ent_b": pd.Series([], dtype=str),
             "jaccard": pd.Series([], dtype="float64")}
        )
    out = pd.DataFrame(rows, columns=["ent_a", "ent_b", "jaccard"])
    return out.sort_values(["ent_a", "ent_b"]).reset_index(drop=True)


def _synthetic_feats(n_ents: int = 30, n_feats: int = 12) -> pd.DataFrame:
    """Deterministic bipartite feature sets with planted near-matches."""
    rows = []
    for i in range(n_ents):
        base = [f"f{(i + j) % n_feats}" for j in range(4)]
        for f in base:
            rows.append((f"a\x1fent{i}", f))
        # b-side twin shares 3 of 4 features -> jaccard 3/5 = 0.6
        twin = base[:3] + [f"f{(i + 7) % n_feats}x"]
        for f in twin:
            rows.append((f"b\x1fent{i}_v2", f))
    # duplicated rows must not inflate intersection counts
    rows += rows[:10]
    return pd.DataFrame(rows, columns=["ent", "feat"])


def test_align_pairs_matches_brute_force(ray_session):
    feats = _synthetic_feats()
    got = align.align_pairs(
        ray.data.from_pandas(feats, override_num_blocks=4),
        min_jaccard=0.3, num_partitions=8,
    )
    want = _brute_force(feats, 0.3)
    pd.testing.assert_frame_equal(got, want)
    # the planted twins are present
    assert ((got["ent_a"] == "ent0") & (got["ent_b"] == "ent0_v2")).any()


def test_align_hot_feature_split_value_invariant(ray_session):
    feats = _synthetic_feats()
    # one stopword-like feature owned by every entity on both sides
    hot = pd.DataFrame(
        {"ent": feats["ent"].unique(), "feat": "HOT"}
    )
    feats = pd.concat([feats, hot], ignore_index=True)
    whole = align.align_pairs(
        ray.data.from_pandas(feats, override_num_blocks=4),
        min_jaccard=0.2, num_partitions=8, hot_threshold=1_000_000,
    )
    split = align.align_pairs(
        ray.data.from_pandas(feats, override_num_blocks=4),
        min_jaccard=0.2, num_partitions=8, hot_threshold=7,
    )
    pd.testing.assert_frame_equal(split, whole)
    assert not whole.empty


def test_align_no_cross_overlap_is_empty(ray_session):
    feats = pd.DataFrame(
        {"ent": ["a\x1fx", "a\x1fy", "b\x1fz"],
         "feat": ["f1", "f2", "f3"]}
    )
    got = align.align_pairs(
        ray.data.from_pandas(feats), min_jaccard=0.1, num_partitions=4
    )
    assert got.empty
    assert list(got.columns) == ["ent_a", "ent_b", "jaccard"]


def test_side_features_projection(ray_session):
    trip = pd.DataFrame(
        {"doc_id": ["d1", "d2"], "subj": ["aspirin", "ibuprofen"],
         "pred": ["Route", "Form"], "obj": ["oral", "tablet"]}
    )

    def side_of(doc_ids):
        return np.where(doc_ids.to_numpy() == "d1", "a", "b")

    out = align.side_features(
        ray.data.from_pandas(trip), side_of
    ).to_pandas()
    assert set(zip(out["ent"], out["feat"])) == {
        ("a\x1faspirin", "Route:oral"),
        ("b\x1fibuprofen", "Form:tablet"),
    }
