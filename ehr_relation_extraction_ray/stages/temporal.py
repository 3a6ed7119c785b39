"""Temporal KG-construction operators over the extracted triple stream.

A knowledge graph built from multi-turn transcripts carries a natural time
axis: every supporting document (conversation) has a start timestamp, so
every distinct edge has a first-seen / last-seen interval. Three operators
build on that axis:

* :func:`edge_intervals` — per-edge support count + [first_ts, last_ts]
  (the time dimension of graph materialization; backs ``kg_edge_spans``).
* :func:`contradictions` — conflict detection + latest-wins resolution:
  a (subj, pred) asserted with MULTIPLE distinct objects is a potential
  contradiction (knowledge-fusion / truth-discovery step of KG
  construction); the resolver keeps the object whose support is most
  recent. The reference pipeline has no fusion step — its per-document
  graphs never merge (ehr.py builds one graph per note) — so this is the
  cross-document consolidation a corpus-scale KG needs.
* :func:`asof_snapshot` — the edge set as of a cutoff timestamp
  (reproducible "what did the KG know at time T" reads; the cutoff
  defaults to the midpoint of the corpus' conversation-start range so it
  is deterministic with no configuration).

Scale shape shared by all three: conversation start times reduce with one
conversation-keyed groupby (conversation-sized, never turn-sized), join
triples -> t0 with the native hash join (both sides fact-sized — no
broadcast), then ONE (subj, pred)-keyed partition pass emits per-edge or
per-conflict rows. Nothing edge-scale ever lands on the driver; the final
tables are ontology-bounded (distinct edges / conflicts), which is what
the callers collect anyway.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

import ray
import ray.data

from ..functions.partitioning import groupby_partition


def conv_start_times(transcripts_path: str) -> "ray.data.Dataset":
    """(conv_id, t0) — epoch-microsecond start time per conversation.

    Per-block min combiner then one conversation-sized groupby-min, the
    same reduction ``kg_edge_spans`` uses: turn rows never shuffle.
    """
    from ray.data.aggregate import Min

    def conv_min(t: pa.Table) -> pa.Table:
        df = pd.DataFrame(
            {
                "conv_id": t["conv_id"].to_pandas(),
                "t0": np.asarray(t["ts"]).astype("datetime64[us]").astype(np.int64),
            }
        )
        return pa.Table.from_pandas(
            df.groupby("conv_id", as_index=False)["t0"].min(), preserve_index=False
        )

    return (
        ray.data.read_parquet(transcripts_path, columns=["conv_id", "ts"])
        .map_batches(conv_min, batch_format="pyarrow")
        .groupby("conv_id")
        .aggregate(Min("t0", alias_name="t0"))
    )


def _triples_with_t0(
    triples: "ray.data.Dataset", transcripts_path: str
) -> "ray.data.Dataset":
    """Per-(doc, edge) rows joined with the supporting conversation's t0."""
    from .joins import hash_join

    tsmin = conv_start_times(transcripts_path)
    return hash_join(
        triples.map_batches(
            lambda t: t.select(["doc_id", "subj", "pred", "obj"]),
            batch_format="pyarrow",
        ),
        tsmin,
        on="doc_id",
        right_on="conv_id",
    )


_INTERVAL_SCHEMA = pa.schema(
    [
        ("subj", pa.string()),
        ("pred", pa.string()),
        ("obj", pa.string()),
        ("n_docs", pa.int64()),
        ("first_ts", pa.int64()),
        ("last_ts", pa.int64()),
    ]
)


def edge_intervals(
    triples: "ray.data.Dataset", transcripts_path: str
) -> "ray.data.Dataset":
    """Distinct edges with support count and first/last conversation start.

    One (subj, pred)-keyed partition pass: every row of an edge lands in
    exactly one partition, so the per-partition pandas agg IS the final
    answer — no second merge. Integer min/max/sum are order-free, so the
    result is identical at any partition count or block layout.
    """

    def agg(df: "pd.DataFrame") -> "pd.DataFrame":
        g = (
            df.groupby(["subj", "pred", "obj"], sort=False)
            .agg(
                n_docs=("t0", "size"),
                first_ts=("t0", "min"),
                last_ts=("t0", "max"),
            )
            .reset_index()
        )
        return g.astype(
            {"n_docs": "int64", "first_ts": "int64", "last_ts": "int64"}
        )

    return groupby_partition(
        _triples_with_t0(triples, transcripts_path),
        ["subj", "pred"],
        agg,
        batch_format="pandas",
        schema=_INTERVAL_SCHEMA,
    )


_CONFLICT_SCHEMA = pa.schema(
    [
        ("subj", pa.string()),
        ("pred", pa.string()),
        ("n_objs", pa.int64()),
        ("n_support", pa.int64()),
        ("winner_obj", pa.string()),
        ("winner_last_ts", pa.int64()),
    ]
)


def contradictions(
    triples: "ray.data.Dataset", transcripts_path: str
) -> "ray.data.Dataset":
    """Functional-conflict detection with latest-wins resolution.

    A (subj, pred) carrying more than one distinct object across the
    corpus is a candidate contradiction (e.g. two conversations assert
    different Strengths for one drug). For each such group emit the
    distinct-object count, total supporting (doc, edge) rows, and the
    resolved winner: the object whose LATEST support is most recent
    (ties broken by object string ascending — fully deterministic).

    (subj, pred) is the partition key, so a group is never split: the
    per-partition resolver is exact, not a partial.
    """

    def resolve(df: "pd.DataFrame") -> "pd.DataFrame":
        per_obj = (
            df.groupby(["subj", "pred", "obj"], sort=False)
            .agg(n=("t0", "size"), last_ts=("t0", "max"))
            .reset_index()
        )
        g = (
            per_obj.groupby(["subj", "pred"], sort=False)
            .agg(n_objs=("obj", "size"), n_support=("n", "sum"))
            .reset_index()
        )
        g = g[g["n_objs"] > 1]
        if g.empty:
            return pd.DataFrame(
                {
                    "subj": pd.Series([], dtype=str),
                    "pred": pd.Series([], dtype=str),
                    "n_objs": pd.Series([], dtype="int64"),
                    "n_support": pd.Series([], dtype="int64"),
                    "winner_obj": pd.Series([], dtype=str),
                    "winner_last_ts": pd.Series([], dtype="int64"),
                }
            )
        win = per_obj.sort_values(
            ["subj", "pred", "last_ts", "obj"],
            ascending=[True, True, False, True],
        ).drop_duplicates(subset=["subj", "pred"], keep="first")
        out = g.merge(
            win[["subj", "pred", "obj", "last_ts"]].rename(
                columns={"obj": "winner_obj", "last_ts": "winner_last_ts"}
            ),
            on=["subj", "pred"],
        )
        return out.astype(
            {"n_objs": "int64", "n_support": "int64", "winner_last_ts": "int64"}
        )

    return groupby_partition(
        _triples_with_t0(triples, transcripts_path),
        ["subj", "pred"],
        resolve,
        batch_format="pandas",
        schema=_CONFLICT_SCHEMA,
    )


def asof_snapshot(
    triples: "ray.data.Dataset",
    transcripts_path: str,
    cutoff: int | None = None,
) -> "ray.data.Dataset":
    """The distinct edge set as of ``cutoff`` (epoch us): edges whose
    FIRST supporting conversation started at or before the cutoff, with
    that first-seen time. Default cutoff = midpoint of the corpus'
    conversation-start range ((min + max) // 2) — deterministic integer
    math, no configuration, and mirrors exactly in SQL.

    The min/max reduction is conversation-sized (reuses
    :func:`conv_start_times`); the snapshot filter runs inside the same
    (subj, pred)-keyed pass that computes first_ts, so no extra exchange.
    """
    from ray.data.aggregate import Max, Min

    if cutoff is None:
        mm = (
            conv_start_times(transcripts_path)
            .aggregate(Min("t0", alias_name="lo"), Max("t0", alias_name="hi"))
        )
        cutoff = (int(mm["lo"]) + int(mm["hi"])) // 2

    schema = pa.schema(
        [
            ("subj", pa.string()),
            ("pred", pa.string()),
            ("obj", pa.string()),
            ("first_ts", pa.int64()),
        ]
    )

    def snap(df: "pd.DataFrame") -> "pd.DataFrame":
        g = (
            df.groupby(["subj", "pred", "obj"], sort=False)
            .agg(first_ts=("t0", "min"))
            .reset_index()
        )
        g = g[g["first_ts"] <= cutoff]
        return g.astype({"first_ts": "int64"})

    return groupby_partition(
        _triples_with_t0(triples, transcripts_path),
        ["subj", "pred"],
        snap,
        batch_format="pandas",
        schema=schema,
    )
