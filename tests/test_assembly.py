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


def _monster_table(n_turns: int, extra_convs: int = 5) -> pa.Table:
    rows = []
    for i in range(n_turns):
        rows.append({"conv_id": "monster", "turn_idx": i,
                     "role": "user", "text": f"turn {i} text",
                     "tool": "", "ts": None})
    for c in range(extra_convs):
        for i in range(3):
            rows.append({"conv_id": f"small{c}", "turn_idx": i,
                         "role": "user", "text": f"s{c} t{i}",
                         "tool": "", "ts": None})
    import pandas as pd

    return pa.Table.from_pandas(
        pd.DataFrame(rows)[["conv_id", "turn_idx", "text"]],
        preserve_index=False,
    )


def test_monster_conversation_segments(tmp_path):
    """A 100k-turn conversation fans out into turn-range sub-documents
    (cap joins the sort key -> separate groups/tasks) instead of one
    multi-GB row; under-cap conversations are bit-identical; the seg
    lineage side output records every oversized segment."""
    table = _monster_table(100_000)
    lineage_dir = str(tmp_path / "seg_lineage")
    docs = assembly.assemble(
        ray.data.from_arrow(table).repartition(8),
        max_turns_per_doc=4096,
        lineage_dir=lineage_dir,
        seg_sep="#",
    ).to_pandas()

    mon = docs[docs["doc_id"].str.startswith("monster")]
    small = docs[~docs["doc_id"].str.startswith("monster")]
    # ceil(100000 / 4096) = 25 segments; every one capped
    assert len(mon) == 25
    assert mon["n_turns"].max() <= 4096
    assert set(mon["doc_id"]) == {"monster"} | {
        f"monster#{b}" for b in range(1, 25)
    }
    # reconcatenating the segments in order == the unsegmented join
    mon = mon.assign(
        seg=mon["doc_id"].map(
            lambda d: 0 if "#" not in d else int(d.split("#")[1])
        )
    ).sort_values("seg")
    joined = "\n\n".join(mon["text"])
    uncapped = assembly.assemble(
        ray.data.from_arrow(table), max_turns_per_doc=0
    ).to_pandas()
    want = uncapped[uncapped["doc_id"] == "monster"]["text"].iloc[0]
    assert joined == want
    # under-cap conversations: identical to the uncapped path
    small_uncapped = uncapped[uncapped["doc_id"] != "monster"]
    assert (
        small.sort_values("doc_id")["text"].tolist()
        == small_uncapped.sort_values("doc_id")["text"].tolist()
    )
    # lineage records cover exactly the oversized segments (seg > 0)
    import pyarrow.parquet as pq
    import glob as _glob

    lin = pa.concat_tables(
        [pq.read_table(p) for p in _glob.glob(lineage_dir + "/*.parquet")]
    ).to_pandas()
    assert set(lin["doc_id"]) == {f"monster#{b}" for b in range(1, 25)}
    assert (lin["conv_id"] == "monster").all()


def test_partitioned_file_path_segments(tmp_path):
    """The shuffle-free conv-partitioned path applies the same cap."""
    import pyarrow.parquet as pq

    table = _monster_table(10_000, extra_convs=2)
    d = tmp_path / "shards"
    d.mkdir()
    pq.write_table(table, str(d / "part-0.parquet"))
    docs = assembly._assemble_file_batch(
        pa.table({"path": [str(d / "part-0.parquet")]}),
        max_turns_per_doc=4096,
        seg_sep="#",
    ).to_pandas()
    mon = docs[docs["doc_id"].str.startswith("monster")]
    assert set(mon["doc_id"]) == {"monster", "monster#1", "monster#2"}
    assert mon["n_turns"].max() <= 4096


def test_seg_collision_guard():
    """With the default unit-separator, corpora whose ids end in
    '#<digits>' assemble untouched even with the cap active; only an id
    ending with the ACTIVE separator + digits raises (loud abort
    instead of silently merging two documents)."""
    import pytest

    rows = [{"conv_id": "c", "turn_idx": i, "text": f"t{i}"} for i in range(5)]
    rows += [{"conv_id": "c#1", "turn_idx": 0, "text": "other"}]
    table = pa.table({
        "conv_id": [r["conv_id"] for r in rows],
        "turn_idx": pa.array([r["turn_idx"] for r in rows], pa.int32()),
        "text": [r["text"] for r in rows],
    })
    # default sep (unit separator): '#'-suffixed ids are NOT a collision;
    # the oversized 'c' segments with '\x1f' suffixes, 'c#1' untouched
    out = assembly.assemble(
        ray.data.from_arrow(table), max_turns_per_doc=2
    ).to_pandas()
    assert "c#1" in set(out["doc_id"])
    assert {"c", "c\x1e1", "c\x1e2"} <= set(out["doc_id"])
    # explicitly choosing '#' as the separator with such ids raises
    with pytest.raises(Exception, match="GRAFT_SEG_SEP|collides"):
        assembly.assemble(
            ray.data.from_arrow(table), max_turns_per_doc=2, seg_sep="#"
        ).to_pandas()
    # cap disabled: no segment naming at all
    out0 = assembly.assemble(
        ray.data.from_arrow(table), max_turns_per_doc=0
    ).to_pandas()
    assert set(out0["doc_id"]) == {"c", "c#1"}


def test_segmentation_reconcat_property():
    """Property (pure, no Ray): for any turn count and cap, the
    '\\n\\n'-join of a conversation's segment texts in segment order
    equals the unsegmented text, per-segment turns never exceed the cap,
    and segment 0 keeps the bare conv_id."""
    import numpy as np

    rng = np.random.default_rng(0)
    for trial in range(25):
        n_turns = int(rng.integers(1, 60))
        cap = int(rng.integers(1, 12))
        texts = [
            "".join(rng.choice(list("abc \n"), size=rng.integers(0, 8)))
            for _ in range(n_turns)
        ]
        idx = np.arange(n_turns, dtype=np.int32)
        seg = (idx // cap).astype(np.int64)
        part = pa.table({
            "conv_id": pa.array(["c"] * n_turns),
            "turn_idx": pa.array(idx, pa.int32()),
            "text": pa.array(texts),
            "_seg": pa.array(seg, pa.int64()),
        })
        out = assembly.assemble_partition(part).to_pandas()
        plain = assembly.assemble_partition(
            part.drop_columns(["_seg"])
        ).to_pandas()
        assert out["n_turns"].max() <= cap
        first = out[out["doc_id"] == "c"]
        assert len(first) == 1, "segment 0 must keep the bare conv_id"
        n_segs = -(-n_turns // cap)
        assert len(out) == n_segs
        sep = assembly.SEG_SEP
        out = out.assign(
            s=out["doc_id"].map(
                lambda d: 0 if sep not in d else int(d.split(sep)[1]))
        ).sort_values("s")
        assert "\n\n".join(out["text"]) == plain["text"].iloc[0]


def test_read_seg_lineage_dedups_retry_shards(tmp_path):
    """A retried task writes a second identical shard; the reader must
    restore exactly-once by the (conv_id, seg) natural key, with the
    documented column order."""
    d = str(tmp_path / "lin")
    rows = [
        {"conv_id": "m", "seg": 1, "doc_id": f"m{assembly.SEG_SEP}1",
         "n_turns": 4096},
        {"conv_id": "m", "seg": 2, "doc_id": f"m{assembly.SEG_SEP}2",
         "n_turns": 17},
    ]
    assembly._flush_seg_lineage(rows, d)
    assembly._flush_seg_lineage(rows, d)  # simulated task retry
    assembly._flush_seg_lineage(rows[:1], d)  # partial re-execution
    got = assembly.read_seg_lineage(d).to_pandas().sort_values("seg")
    assert list(got.columns) == ["conv_id", "seg", "doc_id", "n_turns"]
    assert len(got) == 2
    assert got["doc_id"].tolist() == [
        f"m{assembly.SEG_SEP}1", f"m{assembly.SEG_SEP}2"
    ]
    assert got["n_turns"].tolist() == [4096, 17]
    # empty dir: typed empty table
    empty = assembly.read_seg_lineage(str(tmp_path / "nope"))
    assert empty.schema.equals(assembly.SEG_LINEAGE)


def _write_shards(tmp_path, assignments):
    """assignments: list of lists of (conv_id, turn_idx, text) per file."""
    import pyarrow.parquet as pq

    d = tmp_path / "parts"
    d.mkdir(parents=True, exist_ok=True)
    for i, rows in enumerate(assignments):
        t = pa.table({
            "conv_id": [r[0] for r in rows],
            "turn_idx": pa.array([r[1] for r in rows], pa.int64()),
            "text": [r[2] for r in rows],
        })
        pq.write_table(t, str(d / f"part-{i}.parquet"))
    return str(d)


def test_layout_guard_raises_on_spanning_conv(tmp_path):
    """Round-4 VERDICT item 2: a conversation split across two files must
    raise loudly instead of silently emitting duplicate doc_ids."""
    import pytest

    d = _write_shards(tmp_path, [
        [("a", 0, "a0"), ("a", 1, "a1"), ("b", 0, "b0")],
        [("b", 1, "b1"), ("c", 0, "c0")],  # 'b' spans both files
    ])
    with pytest.raises(ValueError, match="span|precondition"):
        assembly.assemble_partitioned(d).materialize()
    # the same layout assembles fine via the shuffle path
    docs = assembly.assemble(
        ray.data.read_parquet(d, columns=["conv_id", "turn_idx", "text"])
    ).to_pandas()
    assert sorted(docs["doc_id"]) == ["a", "b", "c"]
    assert docs.set_index("doc_id")["text"]["b"] == "b0\n\nb1"
    # verify='none' opts out (trusted-writer escape hatch): duplicates
    # doc_ids silently, which is exactly why the default guards
    dup = assembly.assemble_partitioned(d, verify="none").to_pandas()
    assert (dup["doc_id"] == "b").sum() == 2


def test_layout_guard_passes_range_and_hash_layouts(tmp_path):
    """Disjoint-range layout passes on footer stats alone; a
    hash-bucketed layout (overlapping ranges, disjoint conv sets)
    passes through the exact audit; forced audit agrees."""
    # range layout: conv ids sorted into contiguous per-file ranges
    d1 = _write_shards(tmp_path / "r", [
        [("a", 0, "x"), ("b", 0, "x")],
        [("c", 0, "x"), ("d", 0, "x")],
    ])
    got = assembly.assemble_partitioned(d1).to_pandas()
    assert sorted(got["doc_id"]) == ["a", "b", "c", "d"]
    # hash layout: interleaved ids, each conv wholly in one file
    d2 = _write_shards(tmp_path / "h", [
        [("a", 0, "x"), ("c", 0, "x"), ("c", 1, "y")],
        [("b", 0, "x"), ("d", 0, "x")],
    ])
    got2 = assembly.assemble_partitioned(d2).to_pandas()
    assert sorted(got2["doc_id"]) == ["a", "b", "c", "d"]
    got3 = assembly.assemble_partitioned(d2, verify="audit").to_pandas()
    assert sorted(got3["doc_id"]) == ["a", "b", "c", "d"]


def test_check_turn_equality_segmented():
    """ADVICE r4: the per-turn equality helper must follow the
    default-on segmentation — turns of an over-cap conversation live in
    conv_id<sep>seg sub-documents at LOCAL offsets."""
    table = _monster_table(10, extra_convs=2)
    docs = assembly.assemble(
        ray.data.from_arrow(table), max_turns_per_doc=4
    ).to_pandas()
    docs_tbl = pa.Table.from_pandas(docs)
    assert assembly.check_turn_equality(docs_tbl, table, max_turns_per_doc=4)
    # cap mismatch is detected, not IndexError'd
    assert not assembly.check_turn_equality(
        docs_tbl, table, max_turns_per_doc=3
    )
    # unsegmented output with cap disabled still checks clean
    docs0 = assembly.assemble(
        ray.data.from_arrow(table), max_turns_per_doc=0
    ).to_pandas()
    assert assembly.check_turn_equality(
        pa.Table.from_pandas(docs0), table, max_turns_per_doc=0
    )


def test_layout_guard_statless_files_use_audit(tmp_path):
    """Files written without column statistics can't be zone-checked —
    the guard must fall through to the exact audit (and still pass a
    valid layout / catch a violating one)."""
    import pyarrow.parquet as pq
    import pytest

    d = tmp_path / "parts"
    d.mkdir()
    t1 = pa.table({"conv_id": ["a", "b"],
                   "turn_idx": pa.array([0, 0], pa.int64()),
                   "text": ["x", "y"]})
    t2 = pa.table({"conv_id": ["c"],
                   "turn_idx": pa.array([0], pa.int64()),
                   "text": ["z"]})
    pq.write_table(t1, str(d / "p0.parquet"), write_statistics=False)
    pq.write_table(t2, str(d / "p1.parquet"), write_statistics=False)
    got = assembly.assemble_partitioned(str(d)).to_pandas()
    assert sorted(got["doc_id"]) == ["a", "b", "c"]
    # violating layout with stats disabled is still caught
    t3 = pa.table({"conv_id": ["a"],
                   "turn_idx": pa.array([1], pa.int64()),
                   "text": ["x2"]})
    pq.write_table(t3, str(d / "p2.parquet"), write_statistics=False)
    with pytest.raises(ValueError, match="span|precondition"):
        assembly.assemble_partitioned(str(d)).materialize()


def test_layout_guard_reverifies_on_rewrite(tmp_path):
    """The verify='auto' memo keys on (path, size, mtime): rewriting a
    shard in place under the same name re-runs the guard."""
    import os
    import pytest

    d = _write_shards(tmp_path, [
        [("a", 0, "a0"), ("b", 0, "b0")],
        [("c", 0, "c0")],
    ])
    ok = assembly.assemble_partitioned(d).to_pandas()
    assert sorted(ok["doc_id"]) == ["a", "b", "c"]
    # rewrite shard 1 in place so conversation 'a' now spans both files
    import pyarrow.parquet as pq

    t = pa.table({"conv_id": ["a", "c"],
                  "turn_idx": pa.array([1, 0], pa.int64()),
                  "text": ["a1", "c0"]})
    path1 = os.path.join(d, "part-1.parquet")
    pq.write_table(t, path1)
    os.utime(path1, ns=(1, 1))  # force a distinct mtime even on fast fs
    with pytest.raises(ValueError, match="span|precondition"):
        assembly.assemble_partitioned(d).materialize()
