"""CDC-style snapshot diff: classify keys of two dataset snapshots as
added / removed / changed.

The incremental-ingestion primitive for a 100 TB corpus refresh: both
snapshots are first reduced to (key, digest) projections — the row
bodies NEVER move — then a tagged union + ONE hash-partition pass
classifies each key group in place (no join operator, no driver
materialization). At 10^12 rows the exchanged payload is
2 x (key, 16-byte digest); a sort-merge over co-partitioned snapshots
would avoid even that exchange and plugs in by swapping
groupby_partition for a zipped per-partition read.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

import ray.data

from ..functions.partitioning import groupby_partition


def snapshot_diff(
    a: "ray.data.Dataset",
    b: "ray.data.Dataset",
    key_col: str = "doc_id",
    cmp_col: str = "h",
    num_partitions: int = 64,
) -> "ray.data.Dataset":
    """Diff two (key, digest) snapshots.

    ``a`` is the old snapshot, ``b`` the new one; both must be keyed
    uniquely by ``key_col`` and carry a comparable digest in ``cmp_col``
    (callers typically md5 the payload during the projection pass).

    Returns a Dataset (key_col, change) with change in
    {'added', 'removed', 'changed'}; unchanged keys are not emitted.
    """
    key_field = None
    for ds in (a, b):
        sch = ds.schema()
        if sch is not None and key_col in sch.names:
            t = dict(zip(sch.names, sch.types)).get(key_col)
            if isinstance(t, pa.DataType):
                key_field = t
            else:  # pandas-block schema carries numpy dtypes
                try:
                    key_field = pa.from_numpy_dtype(t)
                except (pa.ArrowNotImplementedError, TypeError):
                    key_field = pa.string()
            break
    if key_field is None:
        key_field = pa.int64()

    def tag(side: str):
        def fn(t: pa.Table) -> pa.Table:
            return pa.table(
                {
                    key_col: t[key_col],
                    cmp_col: t[cmp_col],
                    "_side": pa.array([side] * len(t), pa.string()),
                }
            )

        return fn

    tagged = a.map_batches(tag("a"), batch_format="pyarrow").union(
        b.map_batches(tag("b"), batch_format="pyarrow")
    )

    out_schema = pa.schema([(key_col, key_field), ("change", pa.string())])

    def classify(df: pd.DataFrame) -> pd.DataFrame:
        ha = df[df["_side"] == "a"].set_index(key_col)[cmp_col]
        hb = df[df["_side"] == "b"].set_index(key_col)[cmp_col]
        keys = ha.index.union(hb.index)
        va = ha.reindex(keys)
        vb = hb.reindex(keys)
        change = np.where(
            va.isna(),
            "added",
            np.where(vb.isna(), "removed",
                     np.where(va.to_numpy() != vb.to_numpy(), "changed", "")),
        )
        out = pd.DataFrame({key_col: keys.to_numpy(), "change": change})
        return out[out["change"] != ""].reset_index(drop=True)

    return groupby_partition(
        tagged,
        key_col,
        classify,
        num_partitions=num_partitions,
        batch_format="pandas",
        schema=out_schema,
    )


def upsert_apply(
    a: "ray.data.Dataset",
    b: "ray.data.Dataset",
    key_col: str = "doc_id",
    num_partitions: int = 64,
) -> "ray.data.Dataset":
    """MERGE INTO semantics over snapshot projections: the result holds
    every key of ``a`` and ``b``, with ``b``'s row winning on conflict
    (insert-or-update; ``a`` rows without a ``b`` match survive).

    Same movement discipline as :func:`snapshot_diff` — one tagged union
    + one key-partition pass; at 10^12 rows nothing but the projected
    columns shuffles. Deletions are out of scope here (pair with
    snapshot_diff 'removed' rows when the source emits tombstones).
    """

    def tag(side: str):
        def fn(t: pa.Table) -> pa.Table:
            return t.append_column(
                "_side", pa.array([side] * len(t), pa.string())
            )

        return fn

    tagged = a.map_batches(tag("a"), batch_format="pyarrow").union(
        b.map_batches(tag("b"), batch_format="pyarrow")
    )

    def resolve(df: pd.DataFrame) -> pd.DataFrame:
        # b first, then one-per-key keeps the b row when both exist
        df = df.sort_values("_side", ascending=False, kind="stable")
        out = df.drop_duplicates(subset=[key_col], keep="first")
        return out.drop(columns=["_side"]).reset_index(drop=True)

    return groupby_partition(
        tagged, key_col, resolve,
        num_partitions=num_partitions, batch_format="pandas",
    )
