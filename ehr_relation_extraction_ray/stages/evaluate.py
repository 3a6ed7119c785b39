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

import ray.data
from ray.data.aggregate import Max, Sum


def _prf(tp: float, fp: float, fn: float) -> Dict[str, float]:
    p = tp / (tp + fp) if tp + fp else 0.0
    r = tp / (tp + fn) if tp + fn else 0.0
    f1 = 2 * p * r / (p + r) if p + r else 0.0
    return {"precision": p, "recall": r, "f1": f1}


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
    per_doc = tagged.groupby("doc_id").map_groups(
        lambda g: _span_counts_group(g, strict), batch_format="pandas"
    )
    df = per_doc.to_pandas()
    micro = _prf(df["tp"].sum(), df["fp"].sum(), df["fn"].sum())
    by_doc = df.groupby("doc_id")[["tp", "fp", "fn"]].sum()
    per_doc_f1 = [
        _prf(r.tp, r.fp, r.fn)["f1"] for r in by_doc.itertuples()
    ]
    micro["macro_f1"] = float(np.mean(per_doc_f1)) if per_doc_f1 else 0.0
    return micro
