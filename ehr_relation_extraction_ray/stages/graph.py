"""Graph views: wide relation table and per-drug adjacency.

* wide table == ``get_relation_table`` (``utils.py:533-581``): dedup the
  long table, group by (Drug ID, Drug, Entity Type), newline-join the
  entity texts (``utils.py:561-569``). The HTML render is a driver-side
  presentation concern; the engine emits the grouped rows.
* ``display_knowledge_graph`` (``utils.py:148-236``) materializes per-drug
  node/edge sets: here that is the partitioned nodes/edges Parquet written
  by pipelines/kg.materialize_graph; PNG rendering is out of engine scope.
"""

from __future__ import annotations

import pandas as pd
import pyarrow as pa

import ray.data


def wide_relation_table(triples: "ray.data.Dataset") -> "ray.data.Dataset":
    """TRIPLES Dataset -> (doc_id, subj_id, subj, pred, args) rows.

    ``args`` is the newline-join of deduped obj texts, matching pandas
    ``groupby...apply(list)`` + ``"\\n".join`` (utils.py:561-569) after
    ``drop_duplicates`` (utils.py:553) — except the join order: the
    reference keeps input row order, which is not stable under parallelism,
    so the engine sorts objs lexicographically (deterministic at any block
    layout, and SQL-expressible for the oracle).
    """

    def collect(doc_group: pd.DataFrame) -> pd.DataFrame:
        # one group per doc_id (bounded); the inner grouping is a single
        # vectorized pandas groupby-agg, not a Python loop per key.
        g = doc_group.drop_duplicates(
            subset=["doc_id", "subj_id", "subj", "pred", "obj"]
        ).sort_values("obj")
        out = g.groupby(
            ["doc_id", "subj_id", "subj", "pred"], as_index=False, sort=True
        ).agg(args=("obj", "\n".join), n_args=("obj", "size"))
        out["n_args"] = out["n_args"].astype("int64")
        return out

    return triples.groupby("doc_id").map_groups(collect, batch_format="pandas")
