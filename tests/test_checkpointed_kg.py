"""Flagship resumability (north rule): kill after a stage -> resume skips it."""

import json
import os

import pandas as pd
import pytest
import pyarrow.parquet as pq

from ehr_relation_extraction_ray import synth
from ehr_relation_extraction_ray.pipelines import kg
from ehr_relation_extraction_ray.stages import relations


def _write_transcripts(tmp_path, n_convs=12, seed=3):
    path = str(tmp_path / "transcripts.parquet")
    pq.write_table(synth.generate_table(n_convs=n_convs, seed=seed), path)
    return path


def _data_state(base, stage):
    d = os.path.join(base, stage, "data")
    return sorted((f, os.path.getmtime(os.path.join(d, f))) for f in os.listdir(d))


def test_kill_after_candidates_resumes_without_recompute(
    tmp_path, monkeypatch, ray_session
):
    path = _write_transcripts(tmp_path)
    base = str(tmp_path / "ckpt")

    # first run dies at the edges stage (simulated crash after candidates
    # completed): the driver-side stage factory raises
    real_score = relations.score

    def boom(*a, **k):
        raise RuntimeError("simulated mid-pipeline kill")

    monkeypatch.setattr(relations, "score", boom)
    with pytest.raises(RuntimeError, match="simulated"):
        kg.run_checkpointed(path, base)
    monkeypatch.setattr(relations, "score", real_score)

    # candidates checkpoint exists and is marked done
    with open(os.path.join(base, "candidates", "_manifest.json")) as f:
        man = json.load(f)
    assert man["done"]
    cand_state = _data_state(base, "candidates")
    docs_state = _data_state(base, "documents")

    # resume: completes, and the finished stages were NOT recomputed
    trip = kg.run_checkpointed(path, base).to_pandas()
    assert _data_state(base, "candidates") == cand_state
    assert _data_state(base, "documents") == docs_state

    # lineage records the cache hits
    lin = pq.read_table(os.path.join(base, "_lineage.parquet")).to_pandas()
    resumed = lin.tail(4).set_index("stage")["cached"]
    assert bool(resumed["documents"]) and bool(resumed["candidates"])
    assert not bool(resumed["edges"]) and not bool(resumed["triples"])

    # and the result equals the non-checkpointed flagship
    want = kg.run(path).to_pandas()
    cols = sorted(want.columns)
    pd.testing.assert_frame_equal(
        trip[cols].sort_values(cols).reset_index(drop=True),
        want[cols].sort_values(cols).reset_index(drop=True),
    )


def test_materialize_graph_writes_and_resumes(tmp_path, ray_session):
    path = _write_transcripts(tmp_path, n_convs=8, seed=9)
    out = str(tmp_path / "graph")
    info = kg.materialize_graph(path, out)
    for sub in ("triples", "nodes", "mentions"):
        files = os.listdir(os.path.join(out, sub))
        assert any(f.endswith(".parquet") for f in files)
    nodes = pq.read_table(os.path.join(out, "nodes")).to_pandas()
    assert len(nodes) > 0
    linked = pq.read_table(os.path.join(out, "mentions")).to_pandas()
    assert (linked["node_id"] != "").all()

    # second run is a full resume: every stage cached
    kg.materialize_graph(path, out)
    lin = pq.read_table(
        os.path.join(info["checkpoint_dir"], "_lineage.parquet")
    ).to_pandas()
    assert bool(lin.tail(6)["cached"].all())


def test_checkpoint_through_filesystem_handle(tmp_path):
    """CheckpointedPipeline accepts a pyarrow.fs handle: stages write,
    skip-if-done, and invalidate identically through a SubTreeFileSystem
    (paths relative to a mount root)."""
    import pandas as pd
    import ray
    from pyarrow import fs as pafs

    from ehr_relation_extraction_ray.state.checkpoint import (
        CheckpointedPipeline,
    )

    root = tmp_path / "mnt"
    root.mkdir()
    sub = pafs.SubTreeFileSystem(str(root), pafs.LocalFileSystem())
    df = pd.DataFrame({"x": [1, 2, 3]})
    calls = {"n": 0}

    def make():
        calls["n"] += 1
        return ray.data.from_pandas(df)

    cp = CheckpointedPipeline("ckpt", filesystem=sub)
    out1 = cp.stage("s1", make).to_pandas()
    assert calls["n"] == 1 and sorted(out1["x"]) == [1, 2, 3]
    # second pipeline over the same store: cached, factory not called
    cp2 = CheckpointedPipeline("ckpt", filesystem=sub)
    out2 = cp2.stage("s1", make).to_pandas()
    assert calls["n"] == 1 and sorted(out2["x"]) == [1, 2, 3]
    # params change invalidates
    cp3 = CheckpointedPipeline("ckpt", filesystem=sub)
    cp3.stage("s1", make, params="v2")
    assert calls["n"] == 2
    # the store really lives under the mount root
    assert (root / "ckpt" / "s1" / "_manifest.json").is_file()
    lin = cp3.flush_lineage()
    assert lin.num_rows >= 1


def test_checkpoint_empty_stage(tmp_path):
    """A factory yielding a 0-row Dataset checkpoints cleanly (Ray writes
    zero parquet files for empty datasets — the store commits an explicit
    empty-table file) and the cached read-back round-trips."""
    import pandas as pd
    import ray

    from ehr_relation_extraction_ray.state.checkpoint import (
        CheckpointedPipeline,
    )

    calls = {"n": 0}

    def make():
        calls["n"] += 1
        return ray.data.from_pandas(
            pd.DataFrame({"x": pd.Series([], dtype="int64")})
        )

    cp = CheckpointedPipeline(str(tmp_path / "ck"))
    out = cp.stage("empty", make)
    assert out.count() == 0
    assert calls["n"] == 1
    cp2 = CheckpointedPipeline(str(tmp_path / "ck"))
    out2 = cp2.stage("empty", make)
    assert out2.count() == 0
    assert calls["n"] == 1  # cached, not recomputed
