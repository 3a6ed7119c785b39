"""functions/rounds — the raw-task driver for fixed-point loops."""

import numpy as np
import pandas as pd
import pyarrow as pa

import ray

from ehr_relation_extraction_ray.functions import rounds


def _ds(n_blocks=4, rows_per=5):
    dfs = [
        pd.DataFrame({"x": np.arange(rows_per, dtype=np.int64) + b * rows_per})
        for b in range(n_blocks)
    ]
    return ray.data.from_pandas(dfs)


def test_block_refs_drop_empty_blocks(ray_session):
    ds = ray.data.from_pandas(
        [pd.DataFrame({"x": [1, 2]}), pd.DataFrame({"x": pd.Series([], dtype="int64")})]
    )
    refs = rounds.block_refs(ds.materialize())
    assert rounds.ref_lens(refs) == [2]


def test_round_map_preserves_block_order(ray_session):
    ds = _ds(6, 3)
    refs = rounds.block_refs(ds.materialize())

    def first_val(t: pa.Table, offset: int) -> int:
        return int(np.asarray(t["x"])[0]) + offset

    got = rounds.round_map(refs, first_val, 100)
    assert got == [100, 103, 106, 109, 112, 115]  # submission (= block) order


def test_round_map_broadcast_ref_resolved(ray_session):
    ds = _ds(3, 4)
    refs = rounds.block_refs(ds.materialize())
    state = ray.put(np.arange(12, dtype=np.int64) * 10)

    def weighted_sum(t: pa.Table, s: np.ndarray) -> int:
        x = np.asarray(t["x"])
        return int(s[x].sum())

    got = rounds.round_map(refs, weighted_sum, state)
    full = np.arange(12) * 10
    assert sum(got) == int(full[np.arange(12)].sum())


def test_round_update_blocks_stay_remote(ray_session):
    ds = _ds(3, 4)
    refs = rounds.block_refs(ds.materialize())

    def drop_even(t: pa.Table, thresh: int) -> tuple:
        x = np.asarray(t["x"])
        keep = x % 2 == 1
        dropped = x[~keep & (x >= thresh)].tolist()
        return pa.table({"x": pa.array(x[keep], pa.int64())}), dropped

    new_refs, infos = rounds.round_update(refs, drop_even, 0)
    assert [sorted(i) for i in infos] == [[0, 2], [4, 6], [8, 10]]
    assert all(isinstance(r, ray.ObjectRef) for r in new_refs)
    assert rounds.ref_lens(new_refs) == [2, 2, 2]
    # surviving blocks feed the next round unchanged
    remaining = sorted(
        v for t in rounds.round_map(new_refs, lambda t: np.asarray(t["x"]).tolist())
        for v in t
    )
    assert remaining == [1, 3, 5, 7, 9, 11]
