"""TransE training (stages/graph.transe_train) and ontology constraint
checking (stages/constraints.check_triples).

TransE pins: (a) the distributed epoch loop is BIT-identical to the serial
spec at any partitioning (the integer-coefficient gradient-partial
contract), (b) the margin loss decreases (training actually trains),
(c) the analytic gradient matches a finite-difference probe on a tiny
graph (the math is right, not merely deterministic), (d) trained
embeddings rank the true object above a corrupted one (the model learns
the translation structure).

Constraints pin: planted violations of every rule are counted exactly and
the report is partition-invariant.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest

import ray

from ehr_relation_extraction_ray.stages import constraints, graph


@pytest.fixture(scope="module")
def spo() -> pd.DataFrame:
    rows = [
        (f"drug{i % 7}", f"P{i % 3}", f"attr{(i * 5 + i % 4) % 11}")
        for i in range(160)
    ]
    return pd.DataFrame(rows, columns=["subj", "pred", "obj"]).drop_duplicates()


def _as_ds(df: pd.DataFrame, blocks: int) -> "ray.data.Dataset":
    return ray.data.from_pandas(df.reset_index(drop=True), override_num_blocks=blocks)


def test_transe_distributed_bit_identical(ray_session, spo):
    serial = graph.transe(spo)
    for blocks in (1, 7):
        dist = graph.transe_train(_as_ds(spo, blocks))
        pd.testing.assert_frame_equal(serial, dist)


def test_transe_duplicates_collapse(ray_session, spo):
    """Training input is the DISTINCT triple set: duplicated rows (one doc
    re-asserting an edge) must not change the result."""
    dup = pd.concat([spo, spo.iloc[: len(spo) // 2]], ignore_index=True)
    pd.testing.assert_frame_equal(
        graph.transe_train(_as_ds(spo, 3)), graph.transe_train(_as_ds(dup, 5))
    )


def test_transe_loss_decreases(spo):
    out = graph.transe(spo, epochs=12)
    losses = out.loc[out["kind"] == "loss"].sort_values("dim")["value"].to_numpy()
    assert len(losses) == 12
    assert losses[-1] < losses[0] * 0.9
    # epochs cycle through 4 negative banks, so the loss is only comparable
    # at the same phase: each per-bank subsequence must be monotone here
    for k in range(4):
        assert (np.diff(losses[k::4]) <= 1e-9).all()


def test_transe_gradient_matches_finite_difference():
    """The integer-coefficient gradient is the true margin-loss gradient:
    compare one _transe_step against a numeric probe of the loss surface
    (away from the hinge kink and the normalization, i.e. pre-update)."""
    spo = pd.DataFrame(
        {"subj": ["a", "a", "b"], "pred": ["p", "q", "p"], "obj": ["x", "y", "x"]}
    )
    ents = np.unique(np.concatenate([spo["subj"], spo["obj"]]))
    rels = np.unique(spo["pred"].to_numpy())
    objs = np.unique(spo["obj"].to_numpy())
    nv = len(ents)
    s = np.searchsorted(ents, spo["subj"].to_numpy())
    p = nv + np.searchsorted(rels, spo["pred"].to_numpy())
    o = np.searchsorted(ents, spo["obj"].to_numpy())
    ni = graph._transe_md5_idx(
        [f"{a}|{b}|{c}" for a, b, c in zip(spo["subj"], spo["pred"], spo["obj"])],
        len(objs),
    )
    hit = objs[ni] == spo["obj"].to_numpy(dtype=object)
    ni[hit] = (ni[hit] + 1) % len(objs)
    neg = np.searchsorted(ents, objs[ni])
    W = graph.transe_init(ents, rels, dim=4)
    margin = 1.0

    def loss_at(Wx: np.ndarray) -> float:
        D = Wx[s] + Wx[p] - Wx[o]
        Dn = Wx[s] + Wx[p] - Wx[neg]
        v = margin + np.einsum("ij,ij->i", D, D) - np.einsum("ij,ij->i", Dn, Dn)
        return float(np.maximum(v, 0.0).sum())

    flat, coef, _ = graph._transe_epoch_coo(s, p, o, neg, W, margin)
    n_rows = W.shape[0]
    grad = np.zeros_like(W)
    np.add.at(
        grad,
        (flat // n_rows).astype(np.int64),
        coef[:, None].astype(np.float64) * W[(flat % n_rows).astype(np.int64)],
    )
    eps = 1e-6
    for i, j in [(0, 0), (2, 1), (nv, 3), (n_rows - 1, 2)]:
        Wp, Wm = W.copy(), W.copy()
        Wp[i, j] += eps
        Wm[i, j] -= eps
        num = (loss_at(Wp) - loss_at(Wm)) / (2 * eps)
        assert abs(num - grad[i, j]) < 1e-4, (i, j, num, grad[i, j])


def test_transe_learns_translation_structure():
    """After training on a learnable cluster KG, the true (s, p, o) should
    score better (smaller ||E_s + R_p - E_o||^2) than the content-addressed
    corruptions, on average — i.e. the margin objective actually separates."""
    rows = [
        (f"drug_{g}_{k}", f"P{j}", f"attr_{g}")
        for g in range(8)
        for k in range(5)
        for j in range(2)
    ]
    spo = pd.DataFrame(rows, columns=["subj", "pred", "obj"])
    out = graph.transe(spo, epochs=80, lr=0.5)
    emb = out[out["kind"] != "loss"]
    W = {
        (k, n): g.sort_values("dim")["value"].to_numpy()
        for (k, n), g in emb.groupby(["kind", "name"])
    }
    objs = np.unique(spo["obj"].to_numpy())
    ents = np.unique(np.concatenate([spo["subj"].to_numpy(), spo["obj"].to_numpy()]))
    negs = graph._transe_negatives(
        spo["subj"].to_numpy(dtype=object),
        spo["pred"].to_numpy(dtype=object),
        spo["obj"].to_numpy(dtype=object),
        ents,
        objs,
        4,
    )
    d_pos, d_neg = [], []
    for i, (su, pr, ob) in enumerate(spo.itertuples(index=False)):
        v = W[("ent", su)] + W[("rel", pr)]
        d_pos.append(((v - W[("ent", ob)]) ** 2).sum())
        for k in range(4):
            d_neg.append(((v - W[("ent", ents[negs[i, k]])]) ** 2).sum())
    assert np.mean(d_neg) - np.mean(d_pos) > 0.25


def test_constraints_planted_violations(ray_session):
    trip = pd.DataFrame(
        {
            "doc_id": [f"d{i}" for i in range(8)],
            "subj": ["aspirin"] * 7 + ["ibuprofen"],
            "pred": [
                "Strength", "Strength", "ADE", "Route",
                "Mystery", "Form", "Reason", "ADE",
            ],
            "obj": [
                "500 mg",      # clean
                "mg",          # strength_numeric + short_obj
                "aspirin",     # self_loop + obj_is_drug
                "oral",        # clean
                "thing",       # pred_known
                "tab",         # short_obj
                "ibuprofen",   # obj_is_drug (other drug)
                "headache",    # clean
            ],
        }
    )
    out = constraints.check_triples(_as_ds(trip, 3))
    rep = {(r.rule, r.pred): (r.n_checked, r.n_violations) for r in out.itertuples()}
    assert rep[("pred_known", "Mystery")] == (1, 1)
    assert rep[("pred_known", "Strength")] == (2, 0)
    assert rep[("self_loop", "ADE")] == (2, 1)
    assert rep[("strength_numeric", "Strength")] == (2, 1)
    assert rep[("short_obj", "Strength")] == (2, 1)
    assert rep[("short_obj", "Form")] == (1, 1)
    assert rep[("obj_is_drug", "ADE")] == (2, 1)
    assert rep[("obj_is_drug", "Reason")] == (1, 1)
    # partition-invariant
    pd.testing.assert_frame_equal(out, constraints.check_triples(_as_ds(trip, 1)))


def test_constraints_empty(ray_session):
    trip = pd.DataFrame(
        {"doc_id": pd.Series([], dtype=str), "subj": pd.Series([], dtype=str),
         "pred": pd.Series([], dtype=str), "obj": pd.Series([], dtype=str)}
    )
    out = constraints.check_triples(_as_ds(trip, 1))
    assert len(out) == 0
    assert list(out.columns) == ["rule", "pred", "n_checked", "n_violations"]


def test_transe_eval_bit_identical(ray_session, spo):
    serial = graph.transe_eval_serial(spo)
    for blocks in (1, 6):
        dist = graph.transe_eval(_as_ds(spo, blocks))
        pd.testing.assert_frame_equal(serial, dist)


def test_transe_eval_beats_random():
    """On a LEARNABLE relation (obj is a function of (subj, pred) — the
    exact translation structure TransE models) the trained ranks must beat
    the random-candidate baseline: expected random MRR over n candidates is
    H(n)/n and random mean rank (n+1)/2."""
    rows = [
        (f"drug_{g}_{k}", f"P{j}", f"attr_{g}")
        for g in range(8)
        for k in range(5)
        for j in range(2)
    ]
    df = pd.DataFrame(rows, columns=["subj", "pred", "obj"])
    out = graph.transe_eval_serial(df, epochs=80, lr=0.5, holdout_mod=5)
    m = dict(zip(out["metric"], out["value"]))
    n_cand = df["obj"].nunique()  # 8 candidate objects
    assert m["n_test"] > 0
    # random baseline: mean rank (n+1)/2 = 4.5, MRR = H(8)/8 ~= 0.34
    assert m["mean_rank"] < 2.5
    assert m["mrr"] > 0.6
    assert m["hits_at_3"] > 2 * sum(1.0 / k for k in range(1, n_cand + 1)) / n_cand


def test_transe_eval_skips_unseen(ray_session):
    """A test triple whose object never appears in training must be
    counted as skipped, not ranked."""
    rows = [("a", "p", f"x{i}") for i in range(30)] + [("b", "p", "x0")]
    df = pd.DataFrame(rows, columns=["subj", "pred", "obj"])
    out = graph.transe_eval_serial(df, holdout_mod=2)
    m = dict(zip(out["metric"], out["value"]))
    # the 50% holdout removes some objects from training entirely; those
    # test rows are skipped and the accounting must balance
    subj = df["subj"].to_numpy(dtype=object)
    pred = df["pred"].to_numpy(dtype=object)
    obj = df["obj"].to_numpy(dtype=object)
    is_test = graph._transe_is_test(subj, pred, obj, 2)
    train_objs = set(obj[~is_test])
    train_ents = set(subj[~is_test]) | train_objs
    train_preds = set(pred[~is_test])
    expected_skip = sum(
        1
        for i in np.nonzero(is_test)[0]
        if obj[i] not in train_objs
        or subj[i] not in train_ents
        or pred[i] not in train_preds
    )
    assert m["n_skipped"] == expected_skip
    assert m["n_test"] + m["n_skipped"] == int(is_test.sum())


def test_transe_open_vocabulary_parity(ray_session):
    """Scale-shaped instance (open vocabulary: thousands of entities,
    ~30k distinct triples): the distributed loop must stay bit-identical
    to the serial spec — the integer-coefficient partial contract cannot
    depend on the ontology being small."""
    n = 30_000
    i = np.arange(n)
    df = pd.DataFrame(
        {
            "subj": [f"s{(x * 2654435761) % 3000}" for x in i],
            "pred": [f"p{x % 12}" for x in i],
            "obj": [f"o{(x * 40503) % 1500}" for x in i],
        }
    ).drop_duplicates()
    serial = graph.transe(df, epochs=3)
    dist = graph.transe_train(_as_ds(df, 8), epochs=3)
    pd.testing.assert_frame_equal(serial, dist)
