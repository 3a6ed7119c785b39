"""End-to-end conformance: Ray pipeline triple set == reference semantics.

The north-rule gate: the engine's emitted (subj, pred, obj) set must match
the reference-semantics output at P/R >= 0.95 (here: exactly), at any
parallelism.
"""

import ray.data

from ehr_relation_extraction_ray import synth
from ehr_relation_extraction_ray.pipelines import kg
from ehr_relation_extraction_ray.stages import assembly, candidates, relations
from refsem import assemble_serial, reference_triples


def _ray_triples(table, n_blocks):
    ds = ray.data.from_arrow(table).repartition(n_blocks)
    docs = assembly.assemble(ds)
    cands = candidates.generate(docs, batch_size=8)
    edges = relations.score(cands, batch_size=64)
    trip = relations.distinct_triples(relations.triples(edges))
    df = trip.to_pandas()
    return set(map(tuple, df.itertuples(index=False)))


def test_triples_match_reference_semantics():
    table = synth.generate_table(n_convs=30, seed=11)
    expected = reference_triples(assemble_serial(table.to_pylist()))
    got = _ray_triples(table, n_blocks=4)
    assert len(expected) > 50, "fixture too small to be meaningful"
    tp = len(got & expected)
    precision = tp / max(len(got), 1)
    recall = tp / max(len(expected), 1)
    assert precision == 1.0 and recall == 1.0, (
        f"P={precision:.4f} R={recall:.4f} "
        f"only_ray={list(got - expected)[:3]} only_ref={list(expected - got)[:3]}"
    )


def test_triples_invariant_under_parallelism():
    table = synth.generate_table(n_convs=12, seed=5)
    assert _ray_triples(table, 1) == _ray_triples(table, 8)


def test_entry_pipeline_runs(tmp_path):
    import pyarrow.parquet as pq

    table = synth.generate_table(n_convs=8, seed=2)
    path = str(tmp_path / "transcripts.parquet")
    pq.write_table(table, path)
    trip = kg.run(path)
    df = trip.to_pandas()
    assert set(df.columns) == {"doc_id", "subj_id", "subj", "pred", "obj"}
    assert len(df) == len(df.drop_duplicates())


def test_local_dedup_equals_global_shuffle_dedup():
    """The shuffle-free distinct (doc-locality assumption) must equal the
    hash-shuffle global distinct on the real pipeline output."""
    import pandas as pd

    from ehr_relation_extraction_ray import synth
    from ehr_relation_extraction_ray.pipelines import kg
    from ehr_relation_extraction_ray.stages import relations

    path = synth.transcripts_path("/root/testdata/sf0.001")
    raw = kg.run(path, dedup=False)
    local = relations.distinct_triples(raw).to_pandas()
    glob = relations.distinct_triples_global(kg.run(path, dedup=False)).to_pandas()
    cols = sorted(local.columns)
    a = local[cols].sort_values(cols).reset_index(drop=True)
    b = glob[cols].sort_values(cols).reset_index(drop=True)
    pd.testing.assert_frame_equal(a, b)


def test_partitioned_pipeline_matches_sort_pipeline():
    """Shuffle-free conv-partitioned pipeline == general sort pipeline."""
    import pandas as pd

    from ehr_relation_extraction_ray import synth
    from ehr_relation_extraction_ray.pipelines import kg

    d = synth._generate_to("/tmp/graft_transcripts/t600s150", 600, shard_convs=150)
    a = kg.run(d).to_pandas()
    b = kg.run_partitioned(d).to_pandas()
    cols = sorted(a.columns)
    pd.testing.assert_frame_equal(
        a[cols].sort_values(cols).reset_index(drop=True),
        b[cols].sort_values(cols).reset_index(drop=True),
    )
