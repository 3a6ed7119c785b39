"""Pathological long-conversation skew (north rule: 'skewed long
conversations ... before the shuffle-heavy canonicalization step').

One conversation carries ~100x the turns of its peers and its turns are
scattered across many input blocks, so one assembly group is grossly
oversized. The pipeline must still emit EXACTLY the serial-reference
triple set, independent of block count, and the wide stages downstream of
assembly must see the hot conversation as ordinary per-document rows
(assembly.py's documented skew posture: hot keys cost one oversized group
at the single groupby; canonicalization skew is absorbed by combiner
pre-aggregation)."""

import numpy as np
import pyarrow as pa

import ray.data

from ehr_relation_extraction_ray import synth
from ehr_relation_extraction_ray.pipelines import kg
from ehr_relation_extraction_ray.stages import assembly, candidates, relations
from refsem import assemble_serial, reference_triples


def _skewed_table(n_normal=12, hot_turns=1200, seed=3) -> pa.Table:
    base = synth.generate_table(n_convs=n_normal, seed=seed)
    rows = base.to_pylist()
    # hot conversation: turn texts reuse the synth corpus's own sentences
    # so the mention/pair density matches real data
    donor_texts = [r["text"] for r in rows]
    hot = []
    for i in range(hot_turns):
        src = dict(rows[i % len(rows)])
        src["conv_id"] = "conv-hot"
        src["turn_idx"] = i
        hot.append(src)
    # interleave hot turns among normal rows, then shuffle deterministically
    # so the hot conversation scatters across every input block
    all_rows = rows + hot
    rng = np.random.default_rng(7)
    order = rng.permutation(len(all_rows))
    shuffled = [all_rows[i] for i in order]
    return pa.Table.from_pylist(shuffled, schema=base.schema)


def _ray_triples(table: pa.Table, n_blocks: int):
    ds = ray.data.from_arrow(table).repartition(n_blocks)
    docs = assembly.assemble(ds)
    cands = candidates.generate(docs, batch_size=8)
    edges = relations.score(cands, batch_size=64)
    trip = relations.distinct_triples(relations.triples(edges))
    df = trip.to_pandas()
    return set(map(tuple, df.itertuples(index=False)))


def test_hot_conversation_matches_serial_reference(ray_session):
    table = _skewed_table()
    expected = reference_triples(assemble_serial(table.to_pylist()))
    got = _ray_triples(table, n_blocks=16)
    # the hot conversation actually dominates the fixture (TRIPLES col 0
    # is doc_id == conv_id)
    hot_triples = [t for t in expected if t[0] == "conv-hot"]
    assert len(hot_triples) > len(expected) / 2
    assert len(expected) > 100
    assert got == expected


def test_hot_conversation_invariant_under_parallelism(ray_session):
    table = _skewed_table(n_normal=6, hot_turns=400)
    assert _ray_triples(table, 1) == _ray_triples(table, 12)


def test_hot_group_is_single_document(ray_session):
    """Assembly contracts the hot key to ONE document row: downstream
    stages never see the skew again (per-document rows re-balance across
    tasks by Ray's dynamic block splitting)."""
    table = _skewed_table(n_normal=4, hot_turns=300)
    docs = assembly.assemble(ray.data.from_arrow(table).repartition(8)).to_pandas()
    assert (docs["doc_id"] == "conv-hot").sum() == 1
    hot_len = docs.loc[docs["doc_id"] == "conv-hot", "text"].str.len().iloc[0]
    other_max = docs.loc[docs["doc_id"] != "conv-hot", "text"].str.len().max()
    assert hot_len > 10 * other_max  # the skew is real in this fixture
