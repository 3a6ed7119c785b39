"""Raw-task round driver for iterative distributed-rounds algorithms.

PageRank / label propagation / k-core peeling are fixed-point loops: the
same (partitioned, immutable-within-round) edge set is re-scanned dozens of
times against a small per-round state vector. Expressing every round as a
fresh ``Dataset.map_batches`` execution pays the streaming executor's full
plan-and-launch fixed cost per round (~70 ms on this box — 30 PageRank
rounds ≈ 2.1 s of pure overhead at ANY data size). This is the one shape
the Dataset API genuinely can't express: a loop whose body re-reads the
same blocks with fresh broadcast state.

So: materialize the (already partitioned) blocks ONCE as Arrow object
refs, then drive each round with one raw Ray task per block. Blocks stay
in the object store (zero-copy Arrow / numpy out of plasma); the per-round
state travels as an ``ray.put`` ref argument, fetched via shared memory on
each node. ``ray.get`` returns partials in submission (= block) order, so
any order-sensitive float accumulation on the driver is IDENTICAL to the
``map_batches(batch_size=None) → to_pandas`` path it replaces — outputs
stay bit-identical (asserted by tests/test_graph_distributed.py).

At cluster scale the per-round cost is one task per block (locality-aware:
Ray schedules each task where its block ref lives) instead of a full
pipeline launch; state updates in place via new block refs for peel-style
algorithms, never collecting edges on the driver.
"""

from __future__ import annotations

from typing import Any, Callable

import ray


@ray.remote
def _block_task(fn: Callable, block: Any, *args: Any) -> Any:
    return fn(block, *args)


@ray.remote(num_returns=2)
def _block_task2(fn: Callable, block: Any, *args: Any) -> Any:
    """For round bodies returning (new_block, small_info): the new block
    ref stays in the object store; only the small info is ray.get'd."""
    return fn(block, *args)


@ray.remote
def _block_len(block: Any) -> int:
    return block.num_rows


def block_refs(ds: "ray.data.Dataset") -> list:
    """Pin a materialized Dataset's blocks as Arrow Table object refs.

    Empty blocks are dropped at pin time: a partition-pinned empty block
    keeps its UPSTREAM schema (map_batches skips the UDF on empty blocks,
    so downstream schema never applied), and round bodies would trip on
    the stale columns. One tiny len() task per block, once per algorithm.
    """
    refs = list(ds.to_arrow_refs())
    lens = ray.get([_block_len.remote(r) for r in refs])
    return [r for r, n in zip(refs, lens) if n]


def ref_lens(refs: list) -> list:
    """Row counts of block refs without fetching the blocks (one tiny
    task each) — used to retire emptied blocks between peel rounds."""
    return ray.get([_block_len.remote(r) for r in refs])


def round_map(refs: list, fn: Callable, *args: Any) -> list:
    """One round: fn(block, *args) per block ref; results in block order.

    ``args`` may contain ObjectRefs (e.g. the per-round state vector from
    ``ray.put``) — Ray resolves top-level ref arguments on the worker via
    plasma, one shared-memory fetch per node.
    """
    return ray.get([_block_task.remote(fn, r, *args) for r in refs])


def round_update(refs: list, fn: Callable, *args: Any) -> tuple[list, list]:
    """Peel-style round: fn(block, *args) -> (new_block, small_info).

    Returns (new_block_refs, infos): the new blocks are NEVER fetched to
    the driver — their result refs become next round's inputs — while the
    per-block infos (peel counts, orphan lists) are fetched in block order.
    """
    outs = [_block_task2.remote(fn, r, *args) for r in refs]
    new_refs = [o[0] for o in outs]
    infos = ray.get([o[1] for o in outs])
    return new_refs, infos
