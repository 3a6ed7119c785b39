"""Property test for assembly.check_partitioned_layout: over random
assignments of conversations to shard files — contiguous ranges,
hash-interleaved, with or without footer statistics — the guard accepts
exactly the layouts where no conversation spans two files, and raises
on every violated one. Pure hypothesis-style loop with a seeded RNG
(deterministic; hypothesis itself is unnecessary for this shape because
the strategy space is three independent booleans x sizes)."""

import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from ehr_relation_extraction_ray.stages import assembly


def _write_layout(root, rng, n_convs, n_files, interleave, stats, violate):
    """Returns (dir, violated_conv or None)."""
    os.makedirs(root, exist_ok=True)
    convs = [f"c{i:04d}" for i in range(n_convs)]
    if interleave:
        order = rng.permutation(n_convs)
    else:
        order = np.arange(n_convs)
    files = [[] for _ in range(n_files)]
    for pos, ci in enumerate(order):
        files[pos % n_files if interleave else pos * n_files // n_convs].append(
            convs[ci]
        )
    bad = None
    if violate:
        # move ONE extra turn of some conversation into another file
        donors = [i for i, f in enumerate(files) if f]
        src = donors[int(rng.integers(len(donors)))]
        bad = files[src][0]
        dst = (src + 1) % n_files
        files[dst] = files[dst] + [None]  # placeholder for the stray turn
    for i, convlist in enumerate(files):
        rows_c, rows_t, rows_x = [], [], []
        for c in convlist:
            if c is None:  # the stray turn of the violated conversation
                rows_c.append(bad)
                rows_t.append(1)
                rows_x.append("stray")
                continue
            rows_c.append(c)
            rows_t.append(0)
            rows_x.append(f"text of {c}")
        t = pa.table({
            "conv_id": pa.array(rows_c, pa.string()),
            "turn_idx": pa.array(rows_t, pa.int64()),
            "text": pa.array(rows_x, pa.string()),
        })
        pq.write_table(
            t, os.path.join(root, f"part-{i}.parquet"),
            write_statistics=bool(stats),
        )
    return root, bad


def test_layout_guard_property(tmp_path):
    rng = np.random.default_rng(7)
    case = 0
    for interleave in (False, True):
        for stats in (True, False):
            for violate in (False, True):
                for trial in range(3):
                    case += 1
                    n_convs = int(rng.integers(4, 40))
                    n_files = int(rng.integers(2, 6))
                    d, bad = _write_layout(
                        str(tmp_path / f"case{case}"), rng,
                        n_convs, n_files, interleave, stats, violate,
                    )
                    paths = sorted(
                        os.path.join(d, f)
                        for f in os.listdir(d) if f.endswith(".parquet")
                    )
                    if violate:
                        with pytest.raises(ValueError):
                            assembly.check_partitioned_layout(paths)
                    else:
                        assembly.check_partitioned_layout(paths)  # no raise
