"""Partition-granular groupby: the repo-wide fix for per-key micro-groups.

``ds.groupby(key).map_groups(fn)`` makes ONE Python UDF call per distinct
key — at corpus scale (per-doc keys) that is millions of micro-calls, each
paying slicing + batch-format conversion overhead (round-1 VERDICT; the
dedup/LSH/assembly stages were fixed one by one in round 2).

:func:`groupby_partition` runs the same computation at hash-PARTITION
granularity: one UDF call per partition (``num_partitions`` total), with
every row of a key guaranteed to be in exactly one partition. The UDF must
be GROUP-CLOSED: applying it to a union of complete key groups must equal
the concatenation of applying it per group. Any fn that is itself a keyed
vectorized aggregation (pandas ``groupby(key).agg``, numpy run-walks over
sorted keys) satisfies this; a fn that looks at cross-group state does not.

The partition column is ``_part`` and is dropped before the UDF sees the
batch.
"""

from __future__ import annotations

from typing import Callable, Sequence, Union

import numpy as np
import pyarrow as pa

import ray.data

from .textstats import content_hash_64


_MIX = np.uint64(0x9E3779B97F4A7C15)  # Fibonacci hashing multiplier


def _col_hash(col) -> np.ndarray:
    """uint64 hash of one column, vectorized: numeric columns avoid the
    Python stringify round-trip entirely (the original str() path tripled
    sessionize_events' wall time at sf0.1)."""
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    if pa.types.is_integer(col.type):
        tgt = pa.uint64() if pa.types.is_unsigned_integer(col.type) else pa.int64()
        v = np.asarray(col.cast(tgt)).astype(np.uint64)
        with np.errstate(over="ignore"):
            v = v * _MIX
            return v ^ (v >> np.uint64(31))
    if pa.types.is_timestamp(col.type) or pa.types.is_floating(col.type):
        v = np.asarray(col.cast(pa.timestamp("us")).cast(pa.int64())
                       if pa.types.is_timestamp(col.type)
                       else col.cast(pa.float64())).view(np.uint64)
        with np.errstate(over="ignore"):
            v = v * _MIX
            return v ^ (v >> np.uint64(31))
    return content_hash_64([str(x) for x in col.to_pylist()])


def add_hash_partition(
    t: pa.Table, key_cols: Sequence[str], num_partitions: int
) -> pa.Table:
    """Append an int32 ``_part`` column = hash(key columns) % num_partitions."""
    h = _col_hash(t[key_cols[0]])
    with np.errstate(over="ignore"):
        for c in key_cols[1:]:
            h = h * _MIX + _col_hash(t[c])
    part = (h % np.uint64(num_partitions)).astype(np.int32)
    return t.append_column("_part", pa.array(part))


PARTITION_TARGET_BYTES = 32 << 20


def coalesce_small(
    ds: "ray.data.Dataset", num_partitions: int = 64
) -> "tuple[ray.data.Dataset, int]":
    """Materialize ``ds`` and size an imminent all-to-all from its actual
    bytes: returns ``(ds', n)`` with ``n = clamp(ceil(bytes / target), 1,
    num_partitions)`` and ``ds'`` coalesced (concat tasks, no shuffle)
    when its blocks are near-empty — the exchange's task width follows
    the INPUT block count, so shrinking only the key count is not enough.
    A 64-way groupby over a few-MB input is ~2 s of pure fixed cost on
    this box; at scale the byte clamp is a no-op and the input keeps its
    block structure. Use where the shuffled table is a REDUCED projection
    (band rows, candidate ids, partials), whose materialization the
    all-to-all pays anyway."""
    ds = ds.materialize()
    num_partitions = max(
        1,
        min(num_partitions, -(-ds.size_bytes() // PARTITION_TARGET_BYTES)),
    )
    if ds.num_blocks() > 2 * num_partitions:
        ds = ds.repartition(num_partitions)
    return ds, num_partitions


def groupby_partition(
    ds: "ray.data.Dataset",
    key_cols: Union[str, Sequence[str]],
    fn: Callable,
    num_partitions: int = 64,
    batch_format: str = "pyarrow",
    schema: "pa.Schema | None" = None,
    size_aware: bool = False,
) -> "ray.data.Dataset":
    """``groupby(key).map_groups(fn)`` with one UDF call per hash partition.

    ``fn`` receives a batch (in ``batch_format``) holding the union of all
    complete key groups of one partition, WITHOUT the ``_part`` column, and
    must be group-closed (see module docstring). Pass ``schema`` whenever
    ``fn`` can return ZERO rows for a non-empty partition — an empty
    pandas frame loses column types on conversion (object -> null), and
    blocks with divergent schemas poison downstream concat (the round-1
    ``kg_nodes`` failure mode).

    ``size_aware=True`` materializes ``ds`` and clamps ``num_partitions``
    to ``ceil(bytes / PARTITION_TARGET_BYTES)``: a 64-way all-to-all over
    a few-MB input is pure fixed per-partition cost (~2 s on this box for
    16k rows). Opt in ONLY where the input is already reduced/bounded
    (candidate verify passes, partials) — the group-closed contract makes
    the result identical at any partition count, and at scale the byte
    clamp leaves ``num_partitions`` untouched. Corpus-scale callers should
    NOT pass it: the extra materialize pass costs more than it saves.
    """
    if isinstance(key_cols, str):
        key_cols = [key_cols]
    if size_aware:
        ds, num_partitions = coalesce_small(ds, num_partitions)
    key_cols = list(key_cols)

    def tag(t: pa.Table) -> pa.Table:
        return add_hash_partition(t, key_cols, num_partitions)

    def run(batch: pa.Table):
        batch = batch.drop_columns(["_part"])
        if batch_format == "pandas":
            out = fn(batch.to_pandas())
            if not isinstance(out, pa.Table):
                out = pa.Table.from_pandas(
                    out, schema=schema, preserve_index=False
                )
        else:
            out = fn(batch)
        if schema is not None and out.schema != schema:
            out = out.cast(schema)
        return out

    return (
        ds.map_batches(tag, batch_format="pyarrow")
        .groupby("_part")
        .map_groups(run, batch_format="pyarrow")
    )


def salted_distinct_count(
    ds: "ray.data.Dataset",
    key_col: str,
    val_col: str,
    num_salts: int = 16,
    out_col: str = "n_distinct",
) -> "ray.data.Dataset":
    """COUNT(DISTINCT val) GROUP BY key with HOT-KEY SPLITTING (the
    FP-Hadoop intermediate-data-splitting idea): distinct-count is
    holistic — a plain groupby ships every (key, val) pair of a hot key
    to one reducer. Here the salt is ``hash(val) % num_salts``, which
    makes the per-salt value sets DISJOINT, so per-(key, salt) distinct
    counts SUM to the exact per-key distinct count — a hot key fans out
    over ``num_salts`` reducers and merges with one tiny second groupby.

    Stage shape: per-block distinct (key, salt, val) combiner ->
    groupby((key, salt)) exact distinct per shard -> groupby(key).sum.
    Both shuffles move pre-deduplicated rows only.
    """
    import pandas as pd

    from ray.data.aggregate import Sum

    def local_distinct(t: pa.Table) -> pa.Table:
        salt = (_col_hash(t[val_col]) % np.uint64(num_salts)).astype(np.int32)
        df = pd.DataFrame(
            {
                key_col: np.asarray(t[key_col]),
                "_salt": salt,
                val_col: np.asarray(t[val_col]),
            }
        ).drop_duplicates()
        return pa.Table.from_pandas(df, preserve_index=False)

    def shard_count(part: pa.Table) -> pa.Table:
        df = part.to_pandas().drop_duplicates([key_col, "_salt", val_col])
        g = (
            df.groupby([key_col, "_salt"], sort=False)[val_col]
            .nunique()
            .reset_index(name="_n")
        )
        return pa.table(
            {
                key_col: pa.array(g[key_col]),
                "_n": pa.array(g["_n"].to_numpy(np.int64)),
            }
        )

    sharded = groupby_partition(
        ds.map_batches(local_distinct, batch_format="pyarrow"),
        [key_col, "_salt"],
        shard_count,
        batch_format="pyarrow",
    )
    return sharded.groupby(key_col).aggregate(Sum("_n", alias_name=out_col))
