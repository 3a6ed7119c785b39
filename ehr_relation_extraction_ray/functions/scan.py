"""Distributed prefix-sum (scan) over a Dataset.

Ray Data has no scan/window operator, and a global running total cannot be
expressed as ``map_batches`` + ``groupby`` (every row depends on ALL rows
before it in the total order). This is the documented raw-Ray escape hatch
(SURVEY §7.0: tasks only where the Dataset API can't express the
semantics):

1. range-partitioned ``ds.sort(order_cols)`` — blocks come back in global
   order;
2. one tiny task per block computes its local sum — the driver reduce is
   ONE int per block (never row data);
3. exclusive per-block offsets = cumsum of those ints (driver,
   blocks-sized);
4. one task per block appends ``offset + local exclusive cumsum``
   (vectorized numpy), operating on object-store block refs zero-copy.

At 100 TB with 100k blocks the driver holds 100k ints; every row-level
byte stays in the object store. The two task waves pipeline per block.
"""

from __future__ import annotations

from typing import List, Sequence, Union

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

import ray
import ray.data


SCAN_TARGET_BLOCK_BYTES = 16 << 20


def with_prefix_sum(
    ds: "ray.data.Dataset",
    col: str,
    order_cols: Union[str, Sequence[str]],
    out_col: str = "prefix_sum",
) -> "ray.data.Dataset":
    """Append the EXCLUSIVE global prefix sum of ``col`` in
    ``order_cols`` order (first row gets 0)."""
    # materialize() executes the sort exactly once; a bare to_arrow_refs()
    # ALSO triggers a schema-fetch execution whose limit=1 cannot be pushed
    # below the AllToAll sort, so the whole shuffle would run twice
    # (measured ~2x on the scan-based queries). The scan is a barrier
    # anyway — the sorted blocks are consumed immediately, twice.
    #
    # The scan input is the narrow (order_cols, col) projection, so it is
    # often orders of magnitude smaller than the corpus it describes; a
    # range-partition sort over its ORIGINAL block count then pays the
    # all-to-all's fixed per-task cost on near-empty exchanges (measured
    # 1.8 s vs 0.16 s for a 1.5 MB / 64-block input at 32 CPUs). Size the
    # sort's partition count from the materialized bytes instead: coalesce
    # (cheap concat tasks, no shuffle) toward SCAN_TARGET_BLOCK_BYTES
    # blocks, never increasing the block count — at scale blocks already
    # exceed the target and this is a no-op.
    mat = ds.materialize()
    n_blocks = mat.num_blocks()
    want = max(1, min(n_blocks, -(-mat.size_bytes() // SCAN_TARGET_BLOCK_BYTES)))
    if want < n_blocks // 2:
        mat = mat.repartition(want)
    refs = mat.sort(order_cols).materialize().to_arrow_refs()

    @ray.remote(num_cpus=0.5)
    def block_sum(t: pa.Table) -> int:
        if t.num_rows == 0:
            return 0
        return int(pc.sum(t[col]).as_py() or 0)

    sums: List[int] = ray.get([block_sum.remote(r) for r in refs])
    offsets = np.zeros(len(sums), dtype=np.int64)
    if len(sums) > 1:
        offsets[1:] = np.cumsum(sums[:-1])

    @ray.remote(num_cpus=0.5)
    def scan_block(t: pa.Table, off: int) -> pa.Table:
        if t.num_rows == 0:
            return t.append_column(out_col, pa.array([], pa.int64()))
        v = np.asarray(t[col], dtype=np.int64)
        excl = np.cumsum(v) - v + off
        return t.append_column(out_col, pa.array(excl))

    out_refs = [
        scan_block.remote(r, int(o)) for r, o in zip(refs, offsets)
    ]
    return ray.data.from_arrow_refs(out_refs)
