"""Conformance evaluation: gold-vs-system matching + micro/macro P/R/F1.

Re-expresses the n2c2 official evaluator semantics
(``Track2-evaluate-ver4.py``):

* strict tag match: same doc, type, exact char span
  (``Track2-evaluate-ver4.py:52-62``) -> hash join on the full key.
* lenient tag match: same doc + type + span overlap
  (``Track2-evaluate-ver4.py:58-67``) -> per-document interval check inside
  ``groupby(doc_id).map_groups`` (vectorized numpy overlap matrix per doc);
  multiple system spans matching one gold count once
  (``Track2-evaluate-ver4.py:283-298`` dedup rule).
* triple-set P/R: distinct keys on both sides, one union + hash-shuffle
  ``groupby(key)`` with per-side flags -> TP/FP/FN from flag sums. This is
  the distributed form of a hash semi/anti join; no broadcast needed, both
  sides may be corpus-sized.
* micro = summed counts over the corpus; macro = mean of per-doc P/R/F1
  (``Track2-evaluate-ver4.py:411-463``).
"""

from __future__ import annotations

from typing import Dict

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

import ray.data
from ray.data.aggregate import Max, Sum

from ..functions.partitioning import groupby_partition


def _per_doc(fn):
    """Lift a one-document UDF to a partition UDF: apply per doc_id group
    inside the partition and concat — one Ray call per hash partition, not
    one per document (functions/partitioning.py). The matcher itself stays
    per-doc (the n2c2 pare-down is inherently sequential within a doc)."""

    def run(part: pd.DataFrame) -> pd.DataFrame:
        parts = [fn(sub) for _, sub in part.groupby("doc_id", sort=False)]
        return pd.concat(parts, ignore_index=True)

    return run


def _prf(tp: float, fp: float, fn: float) -> Dict[str, float]:
    p = tp / (tp + fp) if tp + fp else 0.0
    r = tp / (tp + fn) if tp + fn else 0.0
    f1 = 2 * p * r / (p + r) if p + r else 0.0
    return {"precision": p, "recall": r, "f1": f1}



def _prf_batch(t: pa.Table) -> pa.Table:
    """Vectorized _prf over (tp, fp, fn) rows."""
    tp = np.asarray(t["tp"], dtype=np.float64)
    fp = np.asarray(t["fp"], dtype=np.float64)
    fn = np.asarray(t["fn"], dtype=np.float64)
    with np.errstate(invalid="ignore", divide="ignore"):
        p = np.where(tp + fp > 0, tp / np.maximum(tp + fp, 1e-300), 0.0)
        r = np.where(tp + fn > 0, tp / np.maximum(tp + fn, 1e-300), 0.0)
        f1 = np.where(p + r > 0, 2 * p * r / np.maximum(p + r, 1e-300), 0.0)
    return pa.table(
        {
            "precision": pa.array(p),
            "recall": pa.array(r),
            "f1": pa.array(f1),
        }
    )


def _reduce_prf_rows(per_cell: "ray.data.Dataset", type_col: str) -> pd.DataFrame:
    """Distributed final reduction over per-(doc, type) counter cells.

    Per-type and micro sums come from one ``groupby(type_col)`` (result is
    n_types rows — tiny); the macro average needs per-DOC P/R/F1, so the
    per-doc sums, the P/R/F1 kernel, and the mean all run in Ray — the
    n_docs-sized counter table never lands on the driver (at corpus scale
    it is n_docs x n_types rows)."""
    from ray.data.aggregate import Mean

    by_type = (
        per_cell.groupby(type_col)
        .aggregate(
            Sum("tp", alias_name="tp"),
            Sum("fp", alias_name="fp"),
            Sum("fn", alias_name="fn"),
        )
        .to_pandas()
        .sort_values(type_col)
    )
    rows = []
    for r in by_type.itertuples():
        rows.append({"scope": getattr(r, type_col), **_prf(r.tp, r.fp, r.fn)})
    rows.append(
        {
            "scope": "micro",
            **_prf(
                by_type.tp.sum(), by_type.fp.sum(), by_type.fn.sum()
            ),
        }
    )
    means = (
        per_cell.groupby("doc_id")
        .aggregate(
            Sum("tp", alias_name="tp"),
            Sum("fp", alias_name="fp"),
            Sum("fn", alias_name="fn"),
        )
        .map_batches(_prf_batch, batch_format="pyarrow")
        .aggregate(Mean("precision"), Mean("recall"), Mean("f1"))
    )
    rows.append(
        {
            "scope": "macro",
            "precision": float(means["mean(precision)"] or 0.0),
            "recall": float(means["mean(recall)"] or 0.0),
            "f1": float(means["mean(f1)"] or 0.0),
        }
    )
    return pd.DataFrame(rows, columns=["scope", "precision", "recall", "f1"])


def triple_set_prf(
    system: "ray.data.Dataset", gold: "ray.data.Dataset"
) -> Dict[str, float]:
    """Set-level P/R/F1 on distinct (doc_id, subj, pred, obj) keys."""
    key = ["doc_id", "subj", "pred", "obj"]

    def tag(flag_col: str):
        def fn(batch: pa.Table) -> pa.Table:
            t = batch.select(key).group_by(key, use_threads=False).aggregate([])
            return t.append_column(
                "sys", pa.array([1 if flag_col == "sys" else 0] * t.num_rows, pa.int64())
            ).append_column(
                "gold", pa.array([1 if flag_col == "gold" else 0] * t.num_rows, pa.int64())
            )

        return fn

    tagged = system.map_batches(tag("sys"), batch_format="pyarrow").union(
        gold.map_batches(tag("gold"), batch_format="pyarrow")
    )
    flags = tagged.groupby(key).aggregate(
        Max("sys", alias_name="in_sys"), Max("gold", alias_name="in_gold")
    )

    def count(batch: pa.Table) -> pa.Table:
        s = np.asarray(batch["in_sys"])
        g = np.asarray(batch["in_gold"])
        return pa.table(
            {
                "tp": pa.array([int(((s == 1) & (g == 1)).sum())], pa.int64()),
                "fp": pa.array([int(((s == 1) & (g == 0)).sum())], pa.int64()),
                "fn": pa.array([int(((s == 0) & (g == 1)).sum())], pa.int64()),
            }
        )

    counts = flags.map_batches(count, batch_format="pyarrow")
    agg = counts.aggregate(Sum("tp"), Sum("fp"), Sum("fn"))
    return _prf(agg["sum(tp)"] or 0, agg["sum(fp)"] or 0, agg["sum(fn)"] or 0)


def _span_counts_group(group: pd.DataFrame, strict: bool) -> pd.DataFrame:
    doc_id = group["doc_id"].iloc[0]
    out = []
    for ent_type, sub in group.groupby("ent_type"):
        gold = sub[sub["side"] == "gold"]
        sys = sub[sub["side"] == "sys"]
        if strict:
            gk = set(zip(gold["start"], gold["end"]))
            sk = set(zip(sys["start"], sys["end"]))
            tp = len(gk & sk)
            fp = len(sk - gk)
            fn = len(gk - sk)
        else:
            gs, ge = gold["start"].to_numpy(), gold["end"].to_numpy()
            ss, se = sys["start"].to_numpy(), sys["end"].to_numpy()
            if len(gs) and len(ss):
                # overlap matrix: gold i x sys j (Track2:58-67 lenient)
                ov = (gs[:, None] < se[None, :]) & (ss[None, :] < ge[:, None])
                matched_gold = ov.any(axis=1)
                matched_sys = ov.any(axis=0)
                tp = int(matched_gold.sum())  # dedup rule: gold counts once
                fp = int((~matched_sys).sum())
                fn = int((~matched_gold).sum())
            else:
                tp, fp, fn = 0, len(ss), len(gs)
        out.append(
            {"doc_id": doc_id, "ent_type": ent_type, "tp": tp, "fp": fp, "fn": fn}
        )
    return pd.DataFrame(out)


def _pare_down_counts(gol, sys, equals) -> Dict[str, int]:
    """The n2c2 evaluator's pare-down + tid-count rule, transcribed
    literally (Track2-evaluate-ver4.py:283-300): when multiple system tags
    match one gold tag, only the first survives; then
    tp = |{sys tags matching some gold}|, fp = |sys| - tp, fn = |gol| - tp.
    ``gol``/``sys`` are lists in annotation-id (insertion) order; items
    must be hashable."""
    gol_matched = []
    sys_check = list(sys)
    for s in sys:
        for g in gol:
            if equals(g, s):
                if g not in gol_matched:
                    gol_matched.append(g)
                else:
                    if s in sys_check:
                        sys_check.remove(s)
    kept = sys_check
    tp = len({s for s in kept for g in gol if equals(g, s)})
    return {"tp": tp, "fp": len(kept) - tp, "fn": len(gol) - tp}


def _tag_equals(mode: str):
    def eq(g, s) -> bool:
        # g/s: (tid, ent_type, start, end)
        if g[1] != s[1]:
            return False
        if mode == "strict":
            return g[2] == s[2] and g[3] == s[3]
        return s[3] > g[2] and s[2] < g[3]  # lenient overlap (Track2:58-61)

    return eq


def _detailed_group(group: pd.DataFrame, mode: str) -> pd.DataFrame:
    """Per-document per-type tp/fp/fn via the exact pare-down semantics.

    Since ``equals`` requires identical types, evaluating per type and
    summing is identical to the evaluator's all-types pass (key=None) —
    each (doc, type) cell is independent."""
    doc_id = group["doc_id"].iloc[0]
    out = []
    for ent_type, sub in group.groupby("ent_type"):
        sub = sub.sort_values("ord")  # annotation-id order (dict insertion)
        rows = list(
            zip(sub["ent_id"], sub["ent_type"], sub["start"], sub["end"], sub["side"])
        )
        gol = [r[:4] for r in rows if r[4] == "gold"]
        sys = [r[:4] for r in rows if r[4] == "sys"]
        c = _pare_down_counts(gol, sys, _tag_equals(mode))
        out.append({"doc_id": doc_id, "ent_type": ent_type, **c})
    return pd.DataFrame(out, columns=["doc_id", "ent_type", "tp", "fp", "fn"])


def span_prf_detailed(
    system: "ray.data.Dataset",
    gold: "ray.data.Dataset",
    mode: str = "strict",
) -> pd.DataFrame:
    """Per-entity-type P/R/F1 + micro/macro rows, n2c2-evaluator semantics
    (Track2-evaluate-ver4.py:322-338 per-type table; 411-463 micro/macro).

    Inputs use the MENTIONS schema. One ``groupby(doc_id)`` shuffle; the
    per-doc pare-down is bounded by document size. Macro averages per-DOC
    P/R/F1 over all documents that appear on either side (Track2:455-458
    normalizes by the corpus size — here: docs present in the union).
    Returns rows: (scope, precision, recall, f1) where scope is each
    ent_type, 'micro', and 'macro'.
    """
    assert mode in ("strict", "lenient")

    def tag(side: str):
        def fn(batch: pa.Table) -> pa.Table:
            t = batch.select(["doc_id", "ent_id", "ent_type", "start", "end"])
            ord_col = pc.cast(
                pc.utf8_slice_codeunits(t["ent_id"], 1, 2**31 - 1), pa.int64()
            )
            return t.append_column(
                "side", pa.array([side] * t.num_rows, pa.string())
            ).append_column("ord", ord_col)

        return fn

    tagged = system.map_batches(tag("sys"), batch_format="pyarrow").union(
        gold.map_batches(tag("gold"), batch_format="pyarrow")
    )
    per_cell = groupby_partition(
        tagged,
        "doc_id",
        _per_doc(lambda g: _detailed_group(g, mode)),
        batch_format="pandas",
    )
    return _reduce_prf_rows(per_cell, "ent_type")


REL_EVAL_COLS = [
    "doc_id", "rel_id", "rel_type",
    "a1_type", "a1_start", "a1_end",
    "a2_type", "a2_start", "a2_end",
]


def relations_with_spans(
    edges: "ray.data.Dataset", mentions: "ray.data.Dataset"
) -> "ray.data.Dataset":
    """EDGES + MENTIONS -> REL_EVAL_COLS rows (arg char spans attached).

    One ``groupby(doc_id)`` co-group (tagged-union join pattern): relation
    rows look up their arg spans in the same document's mention rows."""

    def tag_edges(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "doc_id": t["doc_id"],
                "rel_id": t["rel_id"],
                "rel_type": t["rel_type"],
                "subj_id": t["subj_id"],
                "obj_id": t["obj_id"],
                "ent_id": pa.nulls(t.num_rows, pa.string()),
                "ent_type": pa.nulls(t.num_rows, pa.string()),
                "start": pa.nulls(t.num_rows, pa.int64()),
                "end": pa.nulls(t.num_rows, pa.int64()),
            }
        )

    def tag_mentions(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "doc_id": t["doc_id"],
                "rel_id": pa.nulls(t.num_rows, pa.string()),
                "rel_type": pa.nulls(t.num_rows, pa.string()),
                "subj_id": pa.nulls(t.num_rows, pa.string()),
                "obj_id": pa.nulls(t.num_rows, pa.string()),
                "ent_id": t["ent_id"],
                "ent_type": t["ent_type"],
                "start": t["start"],
                "end": t["end"],
            }
        )

    def join_partition(group: pd.DataFrame) -> pd.DataFrame:
        # group-closed vectorized span attach: two pandas merges keyed by
        # (doc_id, ent_id) — one Ray call per hash partition, dangling
        # args dropped by the inner joins (same semantics as the per-doc
        # dict lookup this replaces; duplicate ent_ids keep the last row,
        # matching the dict's last-write-wins)
        ments = (
            group[group["ent_id"].notna()][
                ["doc_id", "ent_id", "ent_type", "start", "end"]
            ]
            .drop_duplicates(subset=["doc_id", "ent_id"], keep="last")
            .astype({"start": "int64", "end": "int64"})
        )
        rels = group[group["rel_id"].notna()][
            ["doc_id", "rel_id", "rel_type", "subj_id", "obj_id"]
        ]
        m1 = ments.rename(
            columns={"ent_id": "subj_id", "ent_type": "a1_type",
                     "start": "a1_start", "end": "a1_end"}
        )
        m2 = ments.rename(
            columns={"ent_id": "obj_id", "ent_type": "a2_type",
                     "start": "a2_start", "end": "a2_end"}
        )
        out = rels.merge(m1, on=["doc_id", "subj_id"], how="inner").merge(
            m2, on=["doc_id", "obj_id"], how="inner"
        )
        return out[REL_EVAL_COLS]

    tagged = edges.map_batches(tag_edges, batch_format="pyarrow").union(
        mentions.map_batches(tag_mentions, batch_format="pyarrow")
    )
    rel_schema = pa.schema(
        [
            ("doc_id", pa.string()), ("rel_id", pa.string()),
            ("rel_type", pa.string()),
            ("a1_type", pa.string()), ("a1_start", pa.int64()),
            ("a1_end", pa.int64()),
            ("a2_type", pa.string()), ("a2_start", pa.int64()),
            ("a2_end", pa.int64()),
        ]
    )
    return groupby_partition(
        tagged, "doc_id", join_partition,
        batch_format="pandas", schema=rel_schema,
    )


def _rel_equals(mode: str, symmetric: bool):
    tag_eq = _tag_equals(mode)

    def eq(g, s) -> bool:
        # g/s: (rid, rtype, (a1_type,a1s,a1e), (a2_type,a2s,a2e))
        if g[1] != s[1]:
            return False
        fwd = tag_eq(("", *g[2]), ("", *s[2])) and tag_eq(("", *g[3]), ("", *s[3]))
        if fwd or not symmetric:
            return fwd
        # the reference repo's Relation.__eq__ is arg-symmetric
        # (annotations.py:149-160); the n2c2 evaluator is positional
        # (Track2-evaluate-ver4.py:86-93) — symmetric=True follows the repo
        return tag_eq(("", *g[2]), ("", *s[3])) and tag_eq(("", *g[3]), ("", *s[2]))

    return eq


def _rel_group(group: pd.DataFrame, mode: str, symmetric: bool) -> pd.DataFrame:
    doc_id = group["doc_id"].iloc[0]
    out = []
    for rel_type, sub in group.groupby("rel_type"):
        gol, sys = [], []
        for r in sub.sort_values("rel_id").itertuples():
            rec = (
                r.rel_id, r.rel_type,
                (r.a1_type, int(r.a1_start), int(r.a1_end)),
                (r.a2_type, int(r.a2_start), int(r.a2_end)),
            )
            (gol if r.side == "gold" else sys).append(rec)
        c = _pare_down_counts(gol, sys, _rel_equals(mode, symmetric))
        out.append({"doc_id": doc_id, "rel_type": rel_type, **c})
    return pd.DataFrame(out, columns=["doc_id", "rel_type", "tp", "fp", "fn"])


def relation_prf_detailed(
    system: "ray.data.Dataset",
    gold: "ray.data.Dataset",
    mode: str = "strict",
    symmetric: bool = True,
) -> pd.DataFrame:
    """Per-relation-type P/R/F1 + micro/macro rows over REL_EVAL_COLS
    inputs (build them with :func:`relations_with_spans`), the relation
    half of the n2c2 evaluator (Track2-evaluate-ver4.py:411-463) with the
    pare-down rule; ``symmetric`` selects the reference repo's arg-order-
    insensitive equality (annotations.py:149-160) vs the evaluator's
    positional one."""
    assert mode in ("strict", "lenient")

    def tag(side: str):
        def fn(batch: pa.Table) -> pa.Table:
            return batch.select(REL_EVAL_COLS).append_column(
                "side", pa.array([side] * batch.num_rows, pa.string())
            )

        return fn

    tagged = system.map_batches(tag("sys"), batch_format="pyarrow").union(
        gold.map_batches(tag("gold"), batch_format="pyarrow")
    )
    per_cell = groupby_partition(
        tagged,
        "doc_id",
        _per_doc(lambda g: _rel_group(g, mode, symmetric)),
        batch_format="pandas",
    )
    return _reduce_prf_rows(per_cell, "rel_type")


def span_prf(
    system: "ray.data.Dataset",
    gold: "ray.data.Dataset",
    strict: bool = True,
) -> Dict[str, float]:
    """Mention-span P/R/F1 (micro + macro over documents).

    Both inputs use the MENTIONS schema. One ``groupby(doc_id)`` shuffle;
    per-document work is a vectorized overlap matrix (documents bound the
    group size, so the quadratic check is local and small).
    """

    def tag(side: str):
        def fn(batch: pa.Table) -> pa.Table:
            t = batch.select(["doc_id", "ent_type", "start", "end"])
            return t.append_column(
                "side", pa.array([side] * t.num_rows, pa.string())
            )

        return fn

    tagged = system.map_batches(tag("sys"), batch_format="pyarrow").union(
        gold.map_batches(tag("gold"), batch_format="pyarrow")
    )
    per_doc = groupby_partition(
        tagged,
        "doc_id",
        _per_doc(lambda g: _span_counts_group(g, strict)),
        batch_format="pandas",
    )
    from ray.data.aggregate import Mean

    by_doc = per_doc.groupby("doc_id").aggregate(
        Sum("tp", alias_name="tp"),
        Sum("fp", alias_name="fp"),
        Sum("fn", alias_name="fn"),
    ).materialize()  # consumed twice (micro sums + macro mean); tiny rows
    tot = by_doc.aggregate(Sum("tp"), Sum("fp"), Sum("fn"))
    micro = _prf(tot["sum(tp)"] or 0, tot["sum(fp)"] or 0, tot["sum(fn)"] or 0)
    means = by_doc.map_batches(_prf_batch, batch_format="pyarrow").aggregate(
        Mean("f1")
    )
    micro["macro_f1"] = float(means["mean(f1)"] or 0.0)
    return micro
