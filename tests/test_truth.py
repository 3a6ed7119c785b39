"""Truth discovery (stages/truth.resolve_conflicts).

Pins: two-round weighted voting against an independent serial
recomputation on planted conflicts, the one-doc-one-vote dedup, the
obj-ascending tie-break, and the empty input.
"""

from __future__ import annotations

import pandas as pd

import ray

from ehr_relation_extraction_ray.stages import truth


def _ds(frames):
    """Doc-complete blocks: one pandas frame per block."""
    return ray.data.from_pandas(frames)


def _trip_rows(doc, claims):
    rows = []
    for i, (s, p, o) in enumerate(claims):
        rows.append((doc, f"{doc}-m{i}", s, p, o))
    return pd.DataFrame(
        rows, columns=["doc_id", "subj_id", "subj", "pred", "obj"]
    )


def _serial(frames) -> pd.DataFrame:
    allr = pd.concat(frames, ignore_index=True)
    a = allr[["doc_id", "subj", "pred", "obj"]].drop_duplicates()
    v = a.groupby(["subj", "pred", "obj"], as_index=False).size()
    maj = {}
    for (s, p), g in v.groupby(["subj", "pred"]):
        g = g.sort_values(["size", "obj"], ascending=[False, True])
        maj[(s, p)] = g.iloc[0]["obj"]
    acc = {}
    for d, g in a.groupby("doc_id"):
        agree = sum(1 for r in g.itertuples() if maj[(r.subj, r.pred)] == r.obj)
        acc[d] = agree / len(g)
    wv: dict = {}
    for r in a.itertuples():
        k = (r.subj, r.pred, r.obj)
        n, w = wv.get(k, (0, 0.0))
        wv[k] = (n + 1, w + acc[r.doc_id])
    rows = []
    for (s, p), g in v.groupby(["subj", "pred"]):
        if g["obj"].nunique() < 2:
            continue
        cand = sorted(
            ((o,) + wv[(s, p, o)] for o in g["obj"]),
            key=lambda t: (-round(t[2], 9), t[0]),
        )
        o, n, w = cand[0]
        rows.append((s, p, o, n, round(w, 6)))
    out = pd.DataFrame(
        rows, columns=["subj", "pred", "obj", "n_votes", "w_votes"]
    )
    out["n_votes"] = out["n_votes"].astype("int64")
    return out.sort_values(["subj", "pred"]).reset_index(drop=True)


def test_truth_matches_serial_on_planted_conflicts(ray_session):
    # d1, d2, d3 say aspirin ADE=rash; d4, d5 say ADE=nausea.
    # d4/d5 also make many majority-agreeing claims elsewhere, so their
    # reliability exceeds d1-d3's — the weighted round can flip keys the
    # raw majority got; the serial recomputation decides either way.
    frames = [
        _trip_rows("d1", [("aspirin", "ADE", "rash"), ("aspirin", "Dosage", "qd")]),
        _trip_rows("d2", [("aspirin", "ADE", "rash"), ("ibu", "Dosage", "bid")]),
        _trip_rows("d3", [("aspirin", "ADE", "rash"), ("ibu", "Dosage", "tid")]),
        _trip_rows(
            "d4",
            [("aspirin", "ADE", "nausea"), ("ibu", "Dosage", "bid"),
             ("metformin", "ADE", "gi upset"), ("aspirin", "Dosage", "qd")],
        ),
        _trip_rows(
            "d5",
            [("aspirin", "ADE", "nausea"), ("ibu", "Dosage", "bid"),
             ("metformin", "ADE", "gi upset"), ("aspirin", "Dosage", "qd")],
        ),
    ]
    got = truth.resolve_conflicts(_ds(frames))
    want = _serial(frames)
    pd.testing.assert_frame_equal(got, want)
    # conflicts exist on (aspirin, ADE) and (ibu, Dosage) only
    assert set(zip(want["subj"], want["pred"])) == {
        ("aspirin", "ADE"),
        ("ibu", "Dosage"),
    }


def test_truth_one_doc_one_vote(ray_session):
    # one doc asserting the same claim via 5 mention ids = ONE vote,
    # so the two-doc side wins despite fewer mention rows
    spam = _trip_rows("d1", [("x", "ADE", "a")] * 5)
    other = [
        _trip_rows("d2", [("x", "ADE", "b")]),
        _trip_rows("d3", [("x", "ADE", "b")]),
    ]
    got = truth.resolve_conflicts(_ds([spam] + other))
    assert list(got["obj"]) == ["b"]
    assert list(got["n_votes"]) == [2]


def test_truth_tie_breaks_on_obj(ray_session):
    frames = [
        _trip_rows("d1", [("x", "ADE", "zeta")]),
        _trip_rows("d2", [("x", "ADE", "alpha")]),
    ]
    got = truth.resolve_conflicts(_ds(frames))
    assert list(got["obj"]) == ["alpha"]


def test_truth_empty(ray_session):
    empty = pd.DataFrame(
        {c: pd.Series([], dtype=str)
         for c in ["doc_id", "subj_id", "subj", "pred", "obj"]}
    )
    got = truth.resolve_conflicts(_ds([empty]))
    assert got.empty
    assert list(got.columns) == ["subj", "pred", "obj", "n_votes", "w_votes"]
