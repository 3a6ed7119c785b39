"""Flagship-chain edge regressions from the round-5 high-effort review:
block-split immunity of the doc-local distinct, empty-pattern dicts,
emit_masked through the quarantine path, non-alpha entity-type marker
parity, and null gap_len routing."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

import ray

from ehr_relation_extraction_ray import synth
from ehr_relation_extraction_ray.functions.rescore import SurrogateScorer
from ehr_relation_extraction_ray.pipelines import kg
from ehr_relation_extraction_ray.stages import candidates as cst
from ehr_relation_extraction_ray.stages import relations


def test_doc_local_distinct_immune_to_block_slicing():
    """Pin the fused-chain invariant distinct_triples relies on: even
    with a pathologically small target_max_block_size (aggressive output
    slicing), the whole-task batch reaches the dedup UDF intact, so the
    shuffle-free result equals the explicit global dedup. A Ray upgrade
    that starts slicing INTERMEDIATE fused batches would break here."""
    from ray.data import DataContext

    ctx = DataContext.get_current()
    old = ctx.target_max_block_size
    try:
        ctx.target_max_block_size = 64 * 1024
        path = synth.transcripts_path("/root/testdata/sf0.001")
        n_local = kg.run(path).count()
        docs = kg.documents(path)
        cands = cst.generate(docs, batch_size=None, emit_masked=False)
        edges = relations.score(cands, batch_size=None)
        trip = edges.map_batches(
            relations.triples_batch, batch_format="pyarrow", batch_size=None
        )
        n_global = relations.distinct_triples_global(trip).count()
        assert n_local == n_global
    finally:
        ctx.target_max_block_size = old


def test_empty_patterns_dict_means_no_mentions():
    """patterns={} must mean 'no dictionary' (zero candidates), not
    silently fall back to the full default lexicon."""
    # >128 tokens across paragraphs: windows only split when the token
    # budget forces it, and char_windows keeps the reference's
    # tail-absent quirk — a short single-window doc emits nothing by
    # design, so the sanity check needs a multi-window document
    text = "\n\n".join(
        "clinician started furosemide 25 mg one puff by mouth "
        "every 6 hours for asthma ."
        for _ in range(20)
    )
    docs = ray.data.from_pandas(
        pd.DataFrame({"doc_id": ["d1"], "text": [text]})
    )
    out = cst.generate(docs, patterns={}).to_pandas()
    assert len(out) == 0
    # sanity: the default lexicon DOES produce candidates for this text
    assert len(cst.generate(docs).to_pandas()) > 0


def test_emit_masked_false_honored_with_errors_dir(tmp_path):
    """The quarantined stateless path must pass emit_masked through."""
    path = synth.transcripts_path("/root/testdata/sf0.001")
    docs = kg.documents(path)
    lean = cst.generate(
        docs, errors_dir=str(tmp_path / "e"), emit_masked=False
    ).to_pandas()
    assert len(lean) > 0
    # fast-path rows (gap_len >= 0) carry NO masked_text in lean mode
    fast = lean[lean["gap_len"] >= 0]
    assert len(fast) > 0
    assert fast["masked_text"].isna().all()


def test_nonalpha_type_marker_parity():
    """Entity types like 'lab_value' are masked verbatim; the surrogate
    scorer's marker regex must accept them (alpha-only silently scored 0
    while the gap_len fast path scored 1)."""
    s = SurrogateScorer()
    close = "w @lab_value$ x y @Drug2$ z"
    far = "w @lab_value$ " + "x" * 300 + " @Drug2$ z"
    assert list(s([close, far])) == [1, 0]


def test_null_gap_len_takes_exact_fallback():
    """A null gap_len (nullable schema field, externally-built rows) must
    route to the exact masked_text scorer, not silently score 0."""
    batch = pa.table({
        "doc_id": pa.array(["d", "d"]),
        "cand_idx": pa.array([0, 1], pa.int64()),
        "rel_type": pa.array(["ADE-Drug", "ADE-Drug"]),
        "subj_id": pa.array(["T1", "T1"]),
        "subj_text": pa.array(["a", "a"]),
        "obj_id": pa.array(["T2", "T2"]),
        "obj_text": pa.array(["b", "b"]),
        "masked_text": pa.array(["p @ADE$ q @Drug$ r", "p @ADE$ q @Drug$ r"]),
        "gap_len": pa.array([None, 3], pa.int32()),
        "gap_clean": pa.array([None, True]),
    })
    scorer = relations.RelationScorer()
    preds = scorer._surrogate_preds(batch)
    # row 0: null fast-path columns -> exact scorer on masked_text -> 1
    assert list(preds) == [1, 1]


def test_nonword_type_name_rejected_loudly():
    """Type names outside \\w+ would desync the @Type$ marker parsing
    between the exact scorer and the gap_len fast path — compile_patterns
    rejects them at the source."""
    from ehr_relation_extraction_ray.lexicon import compile_patterns

    with pytest.raises(ValueError, match="Lab-Value"):
        compile_patterns({"Lab-Value": r"x"})
    # \\w+ names (underscores, digits) are fine
    compile_patterns({"Lab_Value2": r"x"})
