"""Assembly stage: sort-within-group, turn equality invariant (input_hint)."""

import pyarrow as pa
import ray.data

from ehr_relation_extraction_ray import synth
from ehr_relation_extraction_ray.stages import assembly
from refsem import assemble_serial


def test_assembly_matches_serial_and_preserves_turns():
    table = synth.generate_table(n_convs=25, seed=7)
    ds = ray.data.from_arrow(table).repartition(6)
    docs_ds = assembly.assemble(ds)
    docs = docs_ds.to_pandas()

    expected = assemble_serial(table.to_pylist())
    assert len(docs) == len(expected)
    got = dict(zip(docs["doc_id"], docs["text"]))
    assert got == expected

    docs_tbl = pa.Table.from_pandas(docs)
    assert assembly.check_turn_equality(docs_tbl, table)


def test_assembly_invariant_under_parallelism():
    table = synth.generate_table(n_convs=12, seed=3)
    one = assembly.assemble(ray.data.from_arrow(table).repartition(1)).to_pandas()
    many = assembly.assemble(ray.data.from_arrow(table).repartition(8)).to_pandas()
    one = one.sort_values("doc_id").reset_index(drop=True)
    many = many.sort_values("doc_id").reset_index(drop=True)
    assert one["text"].tolist() == many["text"].tolist()
    assert one["doc_id"].tolist() == many["doc_id"].tolist()


def test_synth_deterministic():
    a = synth.generate_table(n_convs=5, seed=42)
    b = synth.generate_table(n_convs=5, seed=42)
    assert a.equals(b)
