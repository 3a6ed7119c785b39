"""Task-retry fault tolerance: a transiently-failing batch UDF recovers.

On a real multi-node cluster, worker loss / OOM / flaky IO surfaces as a
task exception; Ray Data re-executes the failed task from its lineage
(the input blocks are still in the object store or re-readable from the
source). The engine's streaming pipelines rely on that recovery rather
than checkpointing every stage — this test pins the mechanism the claim
rests on: ``map_batches(..., retry_exceptions=[...], max_retries=N)``
re-runs the task and the result is identical to a clean run.
"""

import os
import tempfile

import pandas as pd

import ray.data


def test_transient_udf_failure_is_retried(ray_session):
    marker = tempfile.mktemp(prefix="graft_flaky_")

    def flaky_double(batch: pd.DataFrame) -> pd.DataFrame:
        # fail exactly once (first task attempt on this node), then heal
        if not os.path.exists(marker):
            open(marker, "w").close()
            raise ValueError("transient failure")
        batch["doubled"] = batch["id"] * 2
        return batch

    ds = ray.data.from_pandas(pd.DataFrame({"id": range(100)}))
    out = (
        ds.map_batches(
            flaky_double,
            batch_format="pandas",
            batch_size=None,
            retry_exceptions=[ValueError],
            max_retries=3,
        )
        .to_pandas()
        .sort_values("id")
        .reset_index(drop=True)
    )
    assert os.path.exists(marker)  # the failure really happened
    assert out["doubled"].tolist() == [2 * i for i in range(100)]
    os.unlink(marker)
