"""Ontology constraint checking over the triple set (SHACL-lite QC).

The reference pipeline trusts its closed ontology implicitly — entity types
are fixed at ``ehr.py:335-337`` and every relation is ``"{X}-Drug"``
(``utils.py:468``, ``Track2-evaluate-ver4.py:435-437``) — so structurally
invalid triples can only be *observed* downstream as eval mismatches. At
corpus scale a KG build needs the integrity rules as a first-class audit
stage: per-rule checked/violation counts over the full triple stream, cheap
enough to run on every materialization.

Rules shipped (each a vectorized Arrow/numpy kernel, zero shuffles):

* ``pred_known``       — pred must be one of the 8 non-Drug entity types
                         (the ``{X}-Drug`` relation inventory).
* ``self_loop``        — subj must differ from obj (a drug attribute equal
                         to the drug surface is an extraction error).
* ``strength_numeric`` — Strength objects must contain a digit (the
                         reference's Strength signal is ``\\d+[ ]*(mg|mcg)``,
                         ``rule_based_ner/dict_ner.py:100``).
* ``short_obj``        — obj of >= 4 chars; shorter surfaces are the
                         truncated-span signature of window-boundary cuts.
* ``obj_is_drug``      — obj must not collide with the drug (subject)
                         vocabulary: an attribute node that is also a drug
                         means NER mistyped a mention.

Distributed shape: the drug vocabulary comes from per-block distinct
partials merged on the driver and broadcast ONCE (``ray.put``); the audit
itself is one streamed ``map_batches`` pass emitting (rule, pred)-bounded
integer count partials — exact under any block structure, never a shuffle.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

import ray

from ..schemas import ENTITY_TYPES

KNOWN_PREDS = tuple(t for t in ENTITY_TYPES if t != "Drug")

_PARTIAL_SCHEMA = pa.schema(
    [
        ("rule", pa.string()),
        ("pred", pa.string()),
        ("n_checked", pa.int64()),
        ("n_violations", pa.int64()),
    ]
)


def _rule_partials(
    t: pa.Table, drug_vocab: "np.ndarray", min_obj_len: int
) -> pa.Table:
    """One block's (rule, pred) counted partials — pure, vectorized."""
    import pyarrow.compute as pc

    pred = np.asarray(t["pred"].combine_chunks().cast(pa.string()), dtype=object)
    subj = np.asarray(t["subj"].combine_chunks().cast(pa.string()), dtype=object)
    obj = np.asarray(t["obj"].combine_chunks().cast(pa.string()), dtype=object)
    has_digit = np.asarray(
        pc.match_substring_regex(t["obj"].combine_chunks().cast(pa.string()), r"\d")
    )
    obj_len = np.asarray(pc.utf8_length(t["obj"].combine_chunks().cast(pa.string())))

    rows: list[tuple[str, str, np.ndarray, np.ndarray]] = []
    all_rows = np.ones(len(pred), dtype=bool)
    # membership against the SORTED vocab: searchsorted + equality probe
    # (np.isin on object arrays falls back to a per-row loop)
    ins = np.searchsorted(drug_vocab, obj)
    ins = np.minimum(ins, max(len(drug_vocab) - 1, 0))
    is_drug = (
        drug_vocab[ins] == obj if len(drug_vocab) else np.zeros(len(obj), dtype=bool)
    )
    known = np.zeros(len(pred), dtype=bool)
    for kp in KNOWN_PREDS:
        known |= pred == kp
    rows.append(("pred_known", all_rows, ~known))
    rows.append(("self_loop", all_rows, subj == obj))
    rows.append(("strength_numeric", pred == "Strength", ~has_digit))
    rows.append(("short_obj", all_rows, obj_len < min_obj_len))
    rows.append(("obj_is_drug", all_rows, is_drug))

    out_rule, out_pred, out_chk, out_vio = [], [], [], []
    for rule, checked, viol in rows:
        viol = viol & checked
        for kp in np.unique(pred[checked]):
            sel = checked & (pred == kp)
            out_rule.append(rule)
            out_pred.append(str(kp))
            out_chk.append(int(sel.sum()))
            out_vio.append(int((viol & sel).sum()))
    return pa.table(
        {
            "rule": pa.array(out_rule, pa.string()),
            "pred": pa.array(out_pred, pa.string()),
            "n_checked": pa.array(out_chk, pa.int64()),
            "n_violations": pa.array(out_vio, pa.int64()),
        }
    )


def check_triples(
    triples: "ray.data.Dataset", min_obj_len: int = 4
) -> pd.DataFrame:
    """Audit the triple Dataset against the ontology rules above.

    Returns the (rule, pred, n_checked, n_violations) report — bounded by
    |rules| x |preds| rows regardless of corpus size. Integer partials per
    block merge exactly at any parallelism.
    """
    from ..functions.broadcast import bget

    def drug_partial(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        return pa.table(
            {"subj": pc.unique(t["subj"].combine_chunks().cast(pa.string()))}
        )

    dp = triples.map_batches(drug_partial, batch_format="pyarrow").to_pandas()
    # empty blocks skip the UDF entirely, losing the partial schema
    drugs = (
        np.unique(dp["subj"].to_numpy(dtype=object))
        if "subj" in dp.columns
        else np.array([], dtype=object)
    )
    vocab_ref = ray.put(drugs)

    def partial(t: pa.Table) -> pa.Table:
        return _rule_partials(t, bget(vocab_ref), min_obj_len)

    parts = triples.map_batches(
        partial, batch_format="pyarrow"
    ).to_pandas()
    if parts.empty or "rule" not in parts.columns:
        return pd.DataFrame(
            {
                "rule": pd.Series([], dtype=str),
                "pred": pd.Series([], dtype=str),
                "n_checked": pd.Series([], dtype="int64"),
                "n_violations": pd.Series([], dtype="int64"),
            }
        )
    out = (
        parts.groupby(["rule", "pred"], as_index=False)[["n_checked", "n_violations"]]
        .sum()
        .astype({"n_checked": "int64", "n_violations": "int64"})
    )
    return out.sort_values(["rule", "pred"]).reset_index(drop=True)
