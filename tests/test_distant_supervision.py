"""Distant supervision + predicate co-occurrence + DSIR selection.

Checks the properties the DuckDB oracle can't see directly: parallelism
invariance (shuffled vs doc-complete paths, block-size independence),
KB-label soundness, and deterministic negative downsampling.
"""

import hashlib

import numpy as np
import pandas as pd
import ray.data

from ehr_relation_extraction_ray.stages import graph


def _mentions_df():
    rows = []
    # doc d1: one drug with two attributes, one of them KB-supported
    rows += [
        {"doc_id": "d1", "ent_type": "Drug", "text": "Aspirin"},
        {"doc_id": "d1", "ent_type": "Dosage", "text": "100 mg"},
        {"doc_id": "d1", "ent_type": "ADE", "text": "nausea"},
    ]
    # doc d2: same drug lowercase (case-insensitive KB hit), plus noise
    rows += [
        {"doc_id": "d2", "ent_type": "Drug", "text": "aspirin"},
        {"doc_id": "d2", "ent_type": "Dosage", "text": "100 mg"},
        {"doc_id": "d2", "ent_type": "Frequency", "text": "daily"},
    ]
    # doc d3: no drug -> no candidates
    rows += [{"doc_id": "d3", "ent_type": "ADE", "text": "rash"}]
    return pd.DataFrame(rows)


KB = pd.DataFrame(
    {"subj": ["aspirin"], "obj": ["100 mg"], "pred": ["Dosage"]}
)


def test_distant_supervision_labels_and_downsampling():
    ment = ray.data.from_pandas(_mentions_df())
    out = graph.distant_supervision(ment, KB, na_mod=1)  # keep all negatives
    # every candidate pair is (drug x other) within a doc
    assert set(out["doc_id"]) <= {"d1", "d2"}
    pos = out[out["label"] != "NA"]
    # both case variants of aspirin+100 mg hit the KB
    assert len(pos) == 2
    assert set(pos["label"]) == {"Dosage"}
    assert set(pos["subj"]) == {"Aspirin", "aspirin"}
    # negatives: nausea (d1), daily (d2)
    neg = out[out["label"] == "NA"]
    assert set(neg["obj"]) == {"nausea", "daily"}


def test_distant_supervision_na_coin_matches_md5():
    ment = ray.data.from_pandas(_mentions_df())
    out = graph.distant_supervision(ment, KB, na_mod=2)
    neg = out[out["label"] == "NA"]
    for _, r in neg.iterrows():
        key = f"{r.doc_id}|{r.subj}|{r.obj}"
        coin = int(hashlib.md5(key.encode()).hexdigest()[:15], 16) % 2
        assert coin == 0
    # positives are never downsampled
    assert (out["label"] != "NA").sum() == 2


def test_distant_supervision_paths_equal():
    df = _mentions_df()
    # split one doc's mentions across blocks: the shuffled path must
    # reassemble them; doc_complete path gets doc-complete blocks
    ment_split = ray.data.from_pandas(
        [df.iloc[:2].reset_index(drop=True), df.iloc[2:].reset_index(drop=True)]
    )
    ment_whole = ray.data.from_pandas(df)
    a = graph.distant_supervision(ment_split, KB, na_mod=1, doc_complete=False)
    b = graph.distant_supervision(ment_whole, KB, na_mod=1, doc_complete=True)
    pd.testing.assert_frame_equal(a, b)


def test_kb_support_pairs_filters_and_min_pred():
    trip = pd.DataFrame(
        {
            "subj": ["A", "A", "A", "A", "B"],
            "pred": ["P2", "P1", "P1", "P1", "P9"],
            "obj": ["x", "x", "x", "x", "y"],
        }
    )
    kb = graph.kb_support_pairs(ray.data.from_pandas(trip), min_support=3)
    # (A, x) supported 4x total but per-(s,p,o): P1 3x (kept), P2 1x
    # (dropped); B/y dropped below support; pred = min over survivors
    assert len(kb) == 1
    assert kb.iloc[0]["subj"] == "a" and kb.iloc[0]["obj"] == "x"
    assert kb.iloc[0]["pred"] == "P1"


def test_dsir_block_size_invariance(tmp_path):
    # synthetic documents parquet: target docs (id%7==0) talk about
    # "alpha", source docs about either "alpha" (selected) or "zzz"
    rng = np.random.RandomState(0)
    rows = []
    for i in range(140):
        word = "alpha" if (i % 7 == 0 or i % 3 == 0) else "zzz"
        rows.append(
            {"doc_id": i, "text": " ".join([word] * (5 + int(rng.rand() * 5))),
             "lang": "en", "source": "s", "n_chars": 10}
        )
    import pyarrow as pa
    import pyarrow.parquet as pq

    pq.write_table(pa.Table.from_pandas(pd.DataFrame(rows)), tmp_path / "documents.parquet")

    from ehr_relation_extraction_ray.pipelines import queries as q

    out = q.docs_dsir_select(str(tmp_path), k=10)
    assert len(out) == 10
    # target docs never selected
    assert (out["doc_id"] % 7 != 0).all()
    # the alpha docs dominate: their importance weight is higher
    sel_words = set(out["doc_id"] % 3 == 0)
    assert sel_words == {True}
