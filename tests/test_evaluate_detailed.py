"""Per-type / relation-level evaluator parity (n2c2 Track2 semantics).

Hand-computed fixtures transcribed from Track2-evaluate-ver4.py:283-300
(pare-down + tid counts), 322-338 (per-type table), 411-463 (micro/macro);
symmetric relation equality per the reference repo's Relation.__eq__
(annotations.py:149-160).
"""

import pandas as pd
import pytest
import ray.data

from ehr_relation_extraction_ray.stages import evaluate


def _mentions(rows):
    return ray.data.from_items(
        [
            {
                "doc_id": d, "ent_id": eid, "ent_type": t,
                "start": s, "end": e, "text": "x",
            }
            for d, eid, t, s, e in rows
        ]
    )


def _get(df: pd.DataFrame, scope: str):
    r = df[df["scope"] == scope].iloc[0]
    return round(r.precision, 6), round(r.recall, 6), round(r.f1, 6)


def test_span_prf_detailed_hand_fixture(ray_session):
    gold = _mentions(
        [
            ("d1", "T1", "Drug", 0, 7),
            ("d1", "T2", "Reason", 10, 16),
            ("d1", "T3", "Drug", 20, 27),
        ]
    )
    sys = _mentions(
        [
            ("d1", "T1", "Drug", 0, 7),     # exact match
            ("d1", "T2", "Drug", 21, 26),   # overlaps gold T3 (lenient only)
            ("d1", "T3", "Reason", 40, 45), # no match
        ]
    )
    strict = evaluate.span_prf_detailed(sys, gold, mode="strict")
    assert _get(strict, "Drug") == (0.5, 0.5, 0.5)      # tp1 fp1 fn1
    assert _get(strict, "Reason") == (0.0, 0.0, 0.0)    # tp0 fp1 fn1
    p, r, f1 = _get(strict, "micro")                     # tp1 fp2 fn2
    assert (p, r) == (round(1 / 3, 6), round(1 / 3, 6))
    assert _get(strict, "macro") == _get(strict, "micro")  # single doc

    lenient = evaluate.span_prf_detailed(sys, gold, mode="lenient")
    assert _get(lenient, "Drug") == (1.0, 1.0, 1.0)     # tp2 fp0 fn0
    assert _get(lenient, "Reason") == (0.0, 0.0, 0.0)
    p, r, f1 = _get(lenient, "micro")                    # tp2 fp1 fn1
    assert (p, r) == (round(2 / 3, 6), round(2 / 3, 6))


def test_pare_down_rule(ray_session):
    """Two system tags lenient-matching ONE gold: the second is removed
    entirely (neither tp nor fp), Track2-evaluate-ver4.py:283-295."""
    gold = _mentions([("d1", "T1", "Drug", 0, 10)])
    sys = _mentions([("d1", "T1", "Drug", 0, 5), ("d1", "T2", "Drug", 4, 10)])
    out = evaluate.span_prf_detailed(sys, gold, mode="lenient")
    assert _get(out, "Drug") == (1.0, 1.0, 1.0)  # tp=1 fp=0 fn=0
    # strict: neither matches -> tp 0, both sys are fp
    strict = evaluate.span_prf_detailed(sys, gold, mode="strict")
    assert _get(strict, "Drug") == (0.0, 0.0, 0.0)


def _rels(rows):
    return ray.data.from_items(
        [
            {
                "doc_id": d, "rel_id": rid, "rel_type": rt,
                "a1_type": a1t, "a1_start": a1s, "a1_end": a1e,
                "a2_type": a2t, "a2_start": a2s, "a2_end": a2e,
            }
            for d, rid, rt, a1t, a1s, a1e, a2t, a2s, a2e in rows
        ]
    )


def test_relation_prf_symmetric_args(ray_session):
    gold = _rels([("d1", "R1", "Reason-Drug", "Reason", 10, 16, "Drug", 0, 7)])
    swapped = _rels([("d1", "R1", "Reason-Drug", "Drug", 0, 7, "Reason", 10, 16)])
    sym = evaluate.relation_prf_detailed(swapped, gold, mode="strict", symmetric=True)
    assert _get(sym, "Reason-Drug") == (1.0, 1.0, 1.0)
    pos = evaluate.relation_prf_detailed(swapped, gold, mode="strict", symmetric=False)
    assert _get(pos, "Reason-Drug") == (0.0, 0.0, 0.0)


def test_relation_prf_lenient_and_types(ray_session):
    gold = _rels(
        [
            ("d1", "R1", "Reason-Drug", "Reason", 10, 16, "Drug", 0, 7),
            ("d1", "R2", "Dosage-Drug", "Dosage", 30, 35, "Drug", 0, 7),
        ]
    )
    sys = _rels(
        [
            # arg spans overlap but differ -> lenient-only match
            ("d1", "R1", "Reason-Drug", "Reason", 12, 18, "Drug", 2, 7),
            # wrong relation type -> never matches
            ("d1", "R2", "ADE-Drug", "Dosage", 30, 35, "Drug", 0, 7),
        ]
    )
    strict = evaluate.relation_prf_detailed(sys, gold, mode="strict")
    assert _get(strict, "Reason-Drug") == (0.0, 0.0, 0.0)
    lenient = evaluate.relation_prf_detailed(sys, gold, mode="lenient")
    assert _get(lenient, "Reason-Drug") == (1.0, 1.0, 1.0)
    assert _get(lenient, "Dosage-Drug") == (0.0, 0.0, 0.0)  # fn=1
    assert _get(lenient, "ADE-Drug") == (0.0, 0.0, 0.0)     # fp=1
    p, r, _ = _get(lenient, "micro")                         # tp1 fp1 fn1
    assert (p, r) == (0.5, 0.5)


def test_relations_with_spans_join(ray_session):
    edges = ray.data.from_items(
        [
            {"doc_id": "d1", "rel_id": "R1", "rel_type": "Reason-Drug",
             "subj_id": "T1", "subj_text": "aspirin", "obj_id": "T2",
             "obj_text": "pain"},
            {"doc_id": "d1", "rel_id": "R2", "rel_type": "ADE-Drug",
             "subj_id": "T1", "subj_text": "aspirin", "obj_id": "T9",
             "obj_text": "missing"},  # dangling arg -> dropped
        ]
    )
    ments = _mentions([("d1", "T1", "Drug", 0, 7), ("d1", "T2", "Reason", 10, 14)])
    out = evaluate.relations_with_spans(edges, ments).to_pandas()
    assert len(out) == 1
    row = out.iloc[0]
    assert (row.rel_id, row.a1_type, row.a1_start, row.a2_type) == (
        "R1", "Drug", 0, "Reason",
    )


def test_permuted_args_invariance(ray_session):
    """Property: under symmetric equality, swapping arg1/arg2 of every
    system relation never changes the scores (annotations.py:149-160)."""
    rows = [
        ("d1", "R1", "Reason-Drug", "Reason", 10, 16, "Drug", 0, 7),
        ("d1", "R2", "Dosage-Drug", "Dosage", 30, 35, "Drug", 0, 7),
        ("d2", "R1", "ADE-Drug", "ADE", 5, 9, "Drug", 20, 27),
    ]
    swapped = [(d, rid, rt, a2t, a2s, a2e, a1t, a1s, a1e)
               for d, rid, rt, a1t, a1s, a1e, a2t, a2s, a2e in rows]
    gold = _rels(rows)
    for mode in ("strict", "lenient"):
        a = evaluate.relation_prf_detailed(_rels(rows), gold, mode=mode)
        b = evaluate.relation_prf_detailed(_rels(swapped), gold, mode=mode)
        pd.testing.assert_frame_equal(a, b)
        assert _get(a, "micro") == (1.0, 1.0, 1.0)
