"""Temporal KG operators (stages/temporal) vs serial pandas recomputation.

Pins: edge_intervals equals a serial groupby over (doc, edge) x conv-start
times; contradictions keeps only multi-object (subj, pred) groups and
resolves latest-wins with the documented obj-ascending tie-break;
asof_snapshot's default cutoff is the integer midpoint of the corpus'
conversation-start range; and all three are partition-count invariant
(the (subj, pred) partition key never splits a group).
"""

from __future__ import annotations

import os

import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

import ray

from ehr_relation_extraction_ray.stages import temporal

US = 1_000_000


@pytest.fixture(scope="module")
def corpus(tmp_path_factory):
    """4 conversations with known start times + a (doc, edge) triple frame.

    (aspirin, STRENGTH) is asserted with two objects — 100mg earliest/latest
    support in c0/c3, 200mg in c1 — so latest-wins resolves by max(t0) and
    the (aspirin, FREQ) single-object group must NOT appear in conflicts.
    (ibuprofen, STRENGTH) has two objects whose latest supports TIE on t0,
    exercising the obj-ascending tie-break.
    """
    d = tmp_path_factory.mktemp("temporal")
    turns = []
    # conv start = min over its turns; give each conv 2 turns, second later
    starts = {"c0": 100, "c1": 200, "c2": 300, "c3": 400}
    for cid, s in starts.items():
        for i in range(2):
            turns.append(
                {"conv_id": cid, "turn_idx": i, "ts": (s + i * 7) * US}
            )
    t = pa.Table.from_pylist(turns)
    t = t.set_column(
        t.schema.get_field_index("ts"), "ts", t["ts"].cast(pa.timestamp("us"))
    )
    tp = os.path.join(str(d), "transcripts.parquet")
    pq.write_table(t, tp)

    trip = pd.DataFrame(
        [
            ("c0", "aspirin", "STRENGTH", "100mg"),
            ("c3", "aspirin", "STRENGTH", "100mg"),
            ("c1", "aspirin", "STRENGTH", "200mg"),
            ("c0", "aspirin", "FREQ", "daily"),
            ("c2", "ibuprofen", "STRENGTH", "400mg"),
            ("c2", "ibuprofen", "STRENGTH", "600mg"),
            ("c1", "warfarin", "ADE", "bleeding"),
        ],
        columns=["doc_id", "subj", "pred", "obj"],
    )
    return tp, trip, starts


def _trip_ds(trip: pd.DataFrame, blocks: int) -> "ray.data.Dataset":
    return ray.data.from_pandas(trip, override_num_blocks=blocks)


def _serial_intervals(trip: pd.DataFrame, starts: dict) -> pd.DataFrame:
    df = trip.assign(t0=trip["doc_id"].map(lambda c: starts[c] * US))
    out = (
        df.groupby(["subj", "pred", "obj"], as_index=False)
        .agg(n_docs=("t0", "size"), first_ts=("t0", "min"), last_ts=("t0", "max"))
        .astype({"n_docs": "int64", "first_ts": "int64", "last_ts": "int64"})
    )
    return out.sort_values(["subj", "pred", "obj"]).reset_index(drop=True)


@pytest.mark.parametrize("blocks", [1, 5])
def test_edge_intervals_matches_serial(ray_session, corpus, blocks):
    tp, trip, starts = corpus
    got = (
        temporal.edge_intervals(_trip_ds(trip, blocks), tp)
        .to_pandas()
        .sort_values(["subj", "pred", "obj"])
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(got, _serial_intervals(trip, starts))


def test_contradictions_latest_wins_and_tiebreak(ray_session, corpus):
    tp, trip, starts = corpus
    got = (
        temporal.contradictions(_trip_ds(trip, 3), tp)
        .to_pandas()
        .sort_values(["subj", "pred"])
        .reset_index(drop=True)
    )
    # single-object groups (aspirin FREQ, warfarin ADE) are absent
    assert set(zip(got["subj"], got["pred"])) == {
        ("aspirin", "STRENGTH"),
        ("ibuprofen", "STRENGTH"),
    }
    asp = got[got["subj"] == "aspirin"].iloc[0]
    # 100mg's latest support (c3, t=400) beats 200mg's (c1, t=200)
    assert asp["winner_obj"] == "100mg"
    assert asp["winner_last_ts"] == 400 * US
    assert asp["n_objs"] == 2 and asp["n_support"] == 3
    ibu = got[got["subj"] == "ibuprofen"].iloc[0]
    # both objects supported only by c2 -> t0 ties; obj-ascending keeps 400mg
    assert ibu["winner_obj"] == "400mg"
    assert ibu["n_objs"] == 2 and ibu["n_support"] == 2


def test_asof_snapshot_default_midpoint(ray_session, corpus):
    tp, trip, starts = corpus
    got = (
        temporal.asof_snapshot(_trip_ds(trip, 4), tp)
        .to_pandas()
        .sort_values(["subj", "pred", "obj"])
        .reset_index(drop=True)
    )
    cutoff = (100 * US + 400 * US) // 2  # midpoint of conv-start range
    want = _serial_intervals(trip, starts)
    want = (
        want[want["first_ts"] <= cutoff][["subj", "pred", "obj", "first_ts"]]
        .sort_values(["subj", "pred", "obj"])
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(got, want)
    # the snapshot must exclude the c3-only edge? none here, but it must
    # INCLUDE 100mg (first seen c0=100) while a cutoff below 100 excludes all
    empty = temporal.asof_snapshot(_trip_ds(trip, 2), tp, cutoff=99 * US)
    assert empty.to_pandas().empty


def test_asof_snapshot_explicit_cutoff(ray_session, corpus):
    tp, trip, starts = corpus
    got = temporal.asof_snapshot(_trip_ds(trip, 2), tp, cutoff=250 * US).to_pandas()
    # first-seen <= 250: aspirin edges (c0/c1), warfarin (c1); NOT ibuprofen (c2)
    assert set(got["subj"]) == {"aspirin", "warfarin"}
