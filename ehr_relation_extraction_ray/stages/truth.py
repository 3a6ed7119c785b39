"""Truth discovery over conflicting per-source assertions.

KG construction from many transcripts yields CONFLICTING functional
claims: two conversations assert different objects for the same
(subj, pred) — e.g. two Strengths for one drug. Truth-discovery
resolvers (TruthFinder, Investment, Latent Credibility — Li et al.,
"Resolving Conflicts in Heterogeneous Data by Truth Discovery and
Source Reliability Estimation", SIGMOD 2014) weight each source by its
estimated reliability and revote. This module implements the classic
two-round scheme:

  round 1  majority vote per (subj, pred) over distinct per-source
           assertions (tie-break: obj ascending);
  round 2  source reliability = fraction of the source's assertions
           that agree with the round-1 majority; final truth = argmax
           of reliability-WEIGHTED votes (same tie-break).

Distributed shape (no reference analog; the reference emits one doc's
triples per request and never reconciles across documents):

- assertions are the flagship TRIPLES rows themselves (already
  doc-locally distinct — relations.distinct_triples);
- round-1 vote counts: per-block Arrow combiner partials, merged on the
  driver (the (subj, pred, obj) vocabulary is ontology-bounded — the
  playbook driver-partial-merge shape);
- the majority table is broadcast ONCE (``ray.put``); round 2 is a
  single ``map_batches`` pass over DOC-COMPLETE triple blocks (the
  flagship's map chain keeps each document's triples in one block —
  relations.py:201), computing per-doc reliability locally and emitting
  (subj, pred, obj, n, w) partials — zero shuffles end to end;
- the final argmax runs on the driver over the vocabulary-sized merge.

At an open assertion space the round-2 partials stay bounded per block
and the driver merge grows with the CONFLICTING vocabulary only (the
output is restricted to (subj, pred) keys with >=2 distinct objects).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

import ray


def _assertions(t: pa.Table) -> pa.Table:
    """Distinct (doc_id, subj, pred, obj) — a doc asserting one claim via
    several mention ids (distinct subj_id rows) still casts ONE vote.
    Exact in-block because triple blocks are doc-complete."""
    return (
        t.select(["doc_id", "subj", "pred", "obj"])
        .group_by(["doc_id", "subj", "pred", "obj"], use_threads=False)
        .aggregate([])
    )


def _vote_partials(t: pa.Table) -> pa.Table:
    return (
        _assertions(t)
        .group_by(["subj", "pred", "obj"], use_threads=False)
        .aggregate([([], "count_all")])
        .rename_columns(["subj", "pred", "obj", "n"])
    )


def resolve_conflicts(triples: "ray.data.Dataset") -> pd.DataFrame:
    """Distinct per-doc assertions -> resolved truth per conflicting
    (subj, pred): columns (subj, pred, obj, n_votes, w_votes).

    ``triples`` must be doc-locally distinct with doc-complete blocks
    (the flagship pipeline's output contract).
    """
    vp = triples.map_batches(_vote_partials, batch_format="pyarrow").to_pandas()
    if vp.empty:
        return pd.DataFrame(
            {
                "subj": pd.Series([], dtype=str),
                "pred": pd.Series([], dtype=str),
                "obj": pd.Series([], dtype=str),
                "n_votes": pd.Series([], dtype="int64"),
                "w_votes": pd.Series([], dtype="float64"),
            }
        )
    votes = vp.groupby(["subj", "pred", "obj"], as_index=False)["n"].sum()

    # round-1 majority (count desc, obj asc) + the conflicting key set
    votes = votes.sort_values(
        ["subj", "pred", "n", "obj"], ascending=[True, True, False, True]
    )
    maj = votes.drop_duplicates(["subj", "pred"])[["subj", "pred", "obj"]]
    maj = maj.rename(columns={"obj": "mobj"})
    nobj = votes.groupby(["subj", "pred"], as_index=False)["obj"].nunique()
    conflicts = nobj[nobj["obj"] >= 2][["subj", "pred"]]
    maj_ref = ray.put(maj)

    def weighted_partials(t: pa.Table) -> pa.Table:
        m = ray.get(maj_ref)
        df = _assertions(t).to_pandas()
        df = df.merge(m, on=["subj", "pred"], how="left")
        agree = (df["obj"] == df["mobj"]).to_numpy(dtype=np.float64)
        # per-doc reliability, local to this doc-complete block
        df["acc"] = (
            pd.Series(agree).groupby(df["doc_id"]).transform("mean").to_numpy()
        )
        part = df.groupby(["subj", "pred", "obj"], as_index=False).agg(
            n=("acc", "size"), w=("acc", "sum")
        )
        return pa.Table.from_pandas(part, preserve_index=False)

    wv = (
        triples.map_batches(weighted_partials, batch_format="pyarrow", batch_size=None)
        .to_pandas()
        .groupby(["subj", "pred", "obj"], as_index=False)
        .agg(n_votes=("n", "sum"), w_votes=("w", "sum"))
    )
    wv = wv.merge(conflicts, on=["subj", "pred"])
    # argmax on a 9-decimal rounding: float sums arrive in different orders
    # on the driver vs the SQL oracle; exact ties must break on obj, not on
    # 1e-15 accumulation noise
    wv["_w9"] = wv["w_votes"].round(9)
    wv = wv.sort_values(
        ["subj", "pred", "_w9", "obj"], ascending=[True, True, False, True]
    )
    out = wv.drop_duplicates(["subj", "pred"]).copy()
    out["n_votes"] = out["n_votes"].astype("int64")
    out["w_votes"] = out["w_votes"].astype("float64").round(6)
    return (
        out[["subj", "pred", "obj", "n_votes", "w_votes"]]
        .sort_values(["subj", "pred"])
        .reset_index(drop=True)
    )
