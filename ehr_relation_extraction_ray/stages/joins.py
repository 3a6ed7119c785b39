"""Join operators beyond broadcast lookups.

The engine's default join is the broadcast-small-side pattern (``ray.put``
once + vectorized lookup in ``map_batches`` — see
pipelines/relational.join_orders_customer): zero shuffle, correct whenever
one side is dimension-sized. This module adds the two shapes that pattern
cannot cover:

* :func:`hash_join` — both sides fact-sized: Ray Data's native
  hash-shuffle ``Dataset.join`` (each side partitioned by key hash; one
  all-to-all per side). ``num_partitions`` is the operator's parallelism
  AND its skew guard — size it like any shuffle.
* :func:`asof_join` — the streaming/time-series join Ray Data lacks: for
  every left row, the latest right row with ``right.on <= left.on`` within
  the same ``by`` key (``direction="backward"``, the merge_asof/DuckDB
  ASOF default; left-outer). Implemented as the repo's tagged-union
  co-group: both sides are hash-partitioned by key through ONE union +
  groupby, then each partition runs one vectorized ``pandas.merge_asof``
  over all its keys (group-closed: ``by=`` matches within key only).
  Partitioning assumption: one key's rows fit in one partition — the same
  per-key boundedness every keyed operator here relies on.
"""

from __future__ import annotations

from typing import List, Optional, Sequence, Union

import pandas as pd
import pyarrow as pa

import ray.data

from ..functions.partitioning import add_hash_partition


def _arrow_schema(ds: "ray.data.Dataset") -> pa.Schema:
    """Arrow schema of a Dataset regardless of block format (pandas-block
    datasets report numpy dtypes; map them to Arrow)."""
    sch = ds.schema()
    if sch is None:  # fully-empty dataset (zero blocks): no schema at all
        return pa.schema([])
    base = getattr(sch, "base_schema", None)
    if isinstance(base, pa.Schema):
        return base
    fields = []
    for n, t in zip(sch.names, sch.types):
        if isinstance(t, pa.DataType):
            fields.append((n, t))
        else:
            try:
                fields.append((n, pa.from_numpy_dtype(t)))
            except (pa.ArrowNotImplementedError, TypeError):
                fields.append((n, pa.string()))
    return pa.schema(fields)


def hash_join(
    left: "ray.data.Dataset",
    right: "ray.data.Dataset",
    on: Union[str, Sequence[str]],
    right_on: Union[str, Sequence[str], None] = None,
    how: str = "inner",
    num_partitions: int = 64,
    left_suffix: Optional[str] = None,
    right_suffix: str = "_r",
) -> "ray.data.Dataset":
    """Hash-shuffle equi-join of two fact-sized datasets (Ray native).

    ``num_partitions`` is clamped to the cluster CPU count: Ray's join
    spawns one aggregator actor per partition (up to
    ``DataContext.max_hash_shuffle_aggregators``) and waits for ALL of
    them — requesting more aggregator CPUs than the cluster has
    deadlocks the operator (observed: 64 partitions on an 8-CPU local
    cluster never schedules). On a multi-node cluster the cap is the
    fleet-wide CPU count, so large partition counts pass through.
    """
    if isinstance(on, str):
        on = (on,)
    if isinstance(right_on, str):
        right_on = (right_on,)
    cpus = ray.cluster_resources().get("CPU")
    if cpus:
        num_partitions = max(1, min(num_partitions, int(cpus)))

    def attempt(n_parts: int) -> "ray.data.Dataset":
        return left.join(
            right,
            join_type=how,
            num_partitions=n_parts,
            on=tuple(on),
            right_on=tuple(right_on) if right_on else None,
            left_suffix=left_suffix,
            right_suffix=right_suffix,
        )

    # Ray 2.49's join aggregator builds an empty partition as a
    # SCHEMA-LESS arrow table (join.py finalize: ArrowBlockBuilder().build()
    # when a partition received no blocks for one side), and acero then
    # dies with KeyError(<key col>). Hit whenever a side has fewer/sparser
    # keys than partitions (observed at sf0.001: 15 right keys, 8
    # partitions). The join is an all-to-all barrier anyway, so
    # materializing here costs nothing extra — and lets us retry the
    # sparse-key regime with ONE partition, where both sides are
    # guaranteed non-empty (the global empty-side case is handled by the
    # callers' _arrow_schema short-circuits, as in semi_join).
    try:
        return attempt(num_partitions).materialize()
    except Exception as exc:  # noqa: BLE001 - match the acero signature only
        # acero surfaces the schema-less empty partition either as
        # KeyError(<key col>) or as "No match or multiple matches for key
        # field reference" (ArrowInvalid), depending on which side is empty.
        if num_partitions > 1 and (
            "KeyError" in repr(exc) or "No match or multiple matches" in repr(exc)
        ):
            return attempt(1).materialize()
        raise


def semi_join(
    left: "ray.data.Dataset",
    right: "ray.data.Dataset",
    on: Union[str, Sequence[str]],
    right_on: Union[str, Sequence[str], None] = None,
    num_partitions: int = 64,
    anti: bool = False,
) -> "ray.data.Dataset":
    """Hash-shuffle semi (``anti=False``) / anti (``anti=True``) join:
    keep left rows whose key does / does not appear in ``right``.

    The broadcast variant (collect right keys + ``ray.put`` set lookup,
    see pipelines/queries.kg_drug_no_ade_docs) is preferred when the key
    set is dimension-sized; this is the both-sides-fact-sized shape. The
    right side is reduced to its DISTINCT keys first (per-block distinct
    combiner, then one groupby) so the join shuffles keys, never right
    payloads; then one native left_outer join against a marker column
    filters matches vectorized.
    """
    import numpy as np
    import pyarrow.compute as pc

    if isinstance(on, str):
        on = (on,)
    if isinstance(right_on, str):
        right_on = (right_on,)
    rkeys = list(right_on) if right_on else list(on)
    marker = "_semi_marker"
    # Ray drops empty output blocks, so a fully-empty dataset is
    # SCHEMA-LESS (schema() is None) and the native join rejects it.
    # The semantics are trivial in that case — short-circuit:
    lschema = _arrow_schema(left)
    rschema = _arrow_schema(right)
    if len(lschema) == 0:
        return left  # no left rows to keep either way
    if len(rschema) == 0:
        # empty right: semi keeps nothing, anti keeps everything
        return left if anti else left.limit(0)
    rtypes = {f.name: f.type for f in rschema}
    ltypes = {f.name: f.type for f in lschema}
    keys_schema = pa.schema(
        [(k, rtypes[k]) for k in rkeys] + [(marker, pa.int8())]
    )

    def local_distinct(t: pa.Table) -> pa.Table:
        return t.select(rkeys).group_by(rkeys, use_threads=False).aggregate([])

    def add_marker(t: pa.Table) -> pa.Table:
        # pin the schema on zero-row blocks: an empty Ray groupby emits a
        # SCHEMA-LESS block (round-1 kg_nodes class) which the native
        # join then rejects ("no match for key field")
        if t.num_rows == 0:
            return keys_schema.empty_table()
        return t.append_column(
            marker, pa.array(np.ones(t.num_rows, dtype=np.int8))
        )

    from ray.data.aggregate import Count

    keys = (
        right.map_batches(local_distinct, batch_format="pyarrow")
        .groupby(rkeys if len(rkeys) > 1 else rkeys[0])
        .aggregate(Count(alias_name="_semi_n"))
        .drop_columns(["_semi_n"])
        .map_batches(add_marker, batch_format="pyarrow")
    )
    joined = hash_join(
        left,
        keys,
        on=on,
        right_on=tuple(rkeys),
        how="left_outer",
        num_partitions=num_partitions,
    )

    def keep(t: pa.Table) -> pa.Table:
        mask = pc.is_null(t[marker]) if anti else pc.is_valid(t[marker])
        return t.filter(mask).drop_columns([marker])

    return joined.map_batches(keep, batch_format="pyarrow")


def anti_join(
    left: "ray.data.Dataset",
    right: "ray.data.Dataset",
    on: Union[str, Sequence[str]],
    right_on: Union[str, Sequence[str], None] = None,
    num_partitions: int = 64,
) -> "ray.data.Dataset":
    """Left rows with NO key match in right (shuffle variant; see
    :func:`semi_join`)."""
    return semi_join(
        left, right, on, right_on=right_on,
        num_partitions=num_partitions, anti=True,
    )


def _tagged_union_cogroup(
    left: "ray.data.Dataset",
    right: "ray.data.Dataset",
    lcols: List[str],
    rcols: List[str],
    ltypes: dict,
    rtypes: dict,
    carry: dict,
    right_suffix: str,
    part_cols: Sequence[str],
    num_partitions: int,
) -> "ray.data.Dataset":
    """Shared scaffolding for co-grouped merge joins (as-of, interval):
    both sides are projected onto ONE union schema (left columns +
    suffixed right columns), tagged with ``_side``, hash-partitioned on
    ``part_cols`` and unioned. ``carry`` maps left column -> right source
    column for the key columns the right side contributes (cast to the
    left dtype); every other left column is null on the right side."""

    def tag_left(t: pa.Table) -> pa.Table:
        out = t.select(lcols)
        for c in rcols:
            out = out.append_column(c + right_suffix, pa.nulls(t.num_rows, rtypes[c]))
        out = out.append_column("_side", pa.array([0] * t.num_rows, pa.int8()))
        return add_hash_partition(out, part_cols, num_partitions)

    def tag_right(t: pa.Table) -> pa.Table:
        cols = {}
        for c in lcols:
            if c in carry:
                cols[c] = t[carry[c]].cast(ltypes[c])
            else:
                cols[c] = pa.nulls(t.num_rows, ltypes[c])
        out = pa.table(cols)
        for c in rcols:
            out = out.append_column(c + right_suffix, t[c])
        out = out.append_column("_side", pa.array([1] * t.num_rows, pa.int8()))
        return add_hash_partition(out, part_cols, num_partitions)

    return left.map_batches(tag_left, batch_format="pyarrow").union(
        right.map_batches(tag_right, batch_format="pyarrow")
    )


def asof_join(

    left: "ray.data.Dataset",
    right: "ray.data.Dataset",
    by: str,
    on: str = "ts",
    right_cols: Optional[List[str]] = None,
    right_suffix: str = "_r",
    num_partitions: int = 64,
) -> "ray.data.Dataset":
    """Backward as-of join: latest right row with ``on <= left.on`` per ``by``.

    Left rows with no matching right row survive with nulls (left-outer,
    merge_asof / DuckDB ``ASOF LEFT JOIN`` semantics).
    """
    lschema = _arrow_schema(left)
    rschema = _arrow_schema(right)
    lcols = list(lschema.names)
    rcols = right_cols or [c for c in rschema.names if c not in (by, on)]
    rtypes = {f.name: f.type for f in rschema}
    ltypes = {f.name: f.type for f in lschema}

    tagged = _tagged_union_cogroup(
        left, right, lcols, rcols, ltypes, rtypes,
        carry={by: by, on: on}, right_suffix=right_suffix,
        part_cols=[by], num_partitions=num_partitions,
    )

    out_schema = pa.schema(
        [(c, ltypes[c]) for c in lcols]
        + [(c + right_suffix, rtypes[c]) for c in rcols]
    )
    out_names = [f.name for f in out_schema]

    def join_partition(part: pa.Table) -> pa.Table:
        df = part.drop_columns(["_part"]).to_pandas()
        l = df[df["_side"] == 0][lcols].sort_values([on, by], kind="stable")
        r = df[df["_side"] == 1][
            [by, on] + [c + right_suffix for c in rcols]
        ].sort_values([on, by], kind="stable")
        merged = pd.merge_asof(
            l, r, on=on, by=by, direction="backward", allow_exact_matches=True
        )
        return pa.Table.from_pandas(
            merged[out_names], preserve_index=False
        ).cast(out_schema)

    return tagged.groupby("_part").map_groups(
        join_partition, batch_format="pyarrow"
    )


def interval_join(
    points: "ray.data.Dataset",
    intervals: "ray.data.Dataset",
    by: str,
    on: str = "ts",
    start_col: str = "start",
    end_col: str = "end",
    right_cols: Optional[List[str]] = None,
    right_suffix: str = "_r",
    how: str = "inner",
    num_partitions: int = 64,
) -> "ray.data.Dataset":
    """Range/interval join: each point row matches the interval of the
    same ``by`` key that contains it (closed ``[start, end]``).

    Partitioning assumption (documented per SURVEY §7): intervals of one
    key are NON-OVERLAPPING — the session/validity-period layout — so a
    point has at most one match and the backward ``merge_asof`` on
    ``start`` finds it; a containment mask on ``end`` then decides
    matched/unmatched. ``how="inner"`` drops unmatched points,
    ``how="left"`` keeps them with null interval columns. Both sides
    hash-co-partition on ``by`` (same tagged-union co-group shuffle as
    :func:`asof_join`); the per-partition merge is vectorized pandas.
    """
    if how not in ("inner", "left"):
        raise ValueError(f"how must be 'inner' or 'left', got {how!r}")
    lschema = _arrow_schema(points)
    rschema = _arrow_schema(intervals)
    lcols = list(lschema.names)
    rcols = [start_col, end_col] + (
        right_cols
        or [c for c in rschema.names if c not in (by, start_col, end_col)]
    )
    rtypes = {f.name: f.type for f in rschema}
    ltypes = {f.name: f.type for f in lschema}

    tagged = _tagged_union_cogroup(
        points, intervals, lcols, rcols, ltypes, rtypes,
        carry={by: by}, right_suffix=right_suffix,
        part_cols=[by], num_partitions=num_partitions,
    )
    out_schema = pa.schema(
        [(c, ltypes[c]) for c in lcols]
        + [(c + right_suffix, rtypes[c]) for c in rcols]
    )
    out_names = [f.name for f in out_schema]
    start_s, end_s = start_col + right_suffix, end_col + right_suffix

    def join_partition(part: pa.Table) -> pa.Table:
        df = part.drop_columns(["_part"]).to_pandas()
        l = df[df["_side"] == 0][lcols].sort_values([on, by], kind="stable")
        r = df[df["_side"] == 1][
            [by] + [c + right_suffix for c in rcols]
        ].sort_values([start_s, by], kind="stable")
        if not len(l):
            return out_schema.empty_table()
        if not len(r):
            # merge_asof rejects an empty right frame; the semantics are
            # trivial: no point can match
            if how == "inner":
                return out_schema.empty_table()
            out = pa.Table.from_pandas(l[lcols], preserve_index=False)
            for c in rcols:
                out = out.append_column(
                    c + right_suffix, pa.nulls(len(l), rtypes[c])
                )
            return out.select(out_names).cast(out_schema)
        merged = pd.merge_asof(
            l, r, left_on=on, right_on=start_s, by=by,
            direction="backward", allow_exact_matches=True,
        )
        contained = merged[end_s].notna() & (merged[on] <= merged[end_s])
        if how == "inner":
            merged = merged[contained]
        else:
            rsuff = [c + right_suffix for c in rcols]
            merged.loc[~contained, rsuff] = None
        return pa.Table.from_pandas(
            merged[out_names], preserve_index=False
        ).cast(out_schema)

    return tagged.groupby("_part").map_groups(
        join_partition, batch_format="pyarrow"
    )
