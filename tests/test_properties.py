"""Property tests (hypothesis) for the pure kernels the triples depend on.

These are driver-side (no Ray): they pin the vectorized engine kernels to
the literal reference-semantics walks in tests/refsem.py across randomized
text, which is where off-by-one quirks (SURVEY.md §7.5) would hide.
"""

import numpy as np
from hypothesis import given, settings, strategies as st

from ehr_relation_extraction_ray.functions.chunking import split_points
from ehr_relation_extraction_ray.functions.pairs import mask_window
from ehr_relation_extraction_ray.functions.tokenize import (
    char_to_token,
    token_spans,
    tokens_of,
)
from ehr_relation_extraction_ray.sources.conll import iob_labels, parse_conll
from refsem import naive_split_points, naive_token_maps

# words + whitespace runs + the punctuation the chunker keys on
_word = st.text(
    alphabet="abcdefgXYZ019.?!*#->[αé$@", min_size=1, max_size=8
).filter(lambda w: w.strip())
_sep = st.sampled_from([" ", "  ", "\n", "\n\n", " \n", "\t", "\n \n"])


@st.composite
def texts(draw, max_words=60):
    n = draw(st.integers(0, max_words))
    parts = []
    for _ in range(n):
        parts.append(draw(_word))
        parts.append(draw(_sep))
    return "".join(parts)


@given(texts())
@settings(max_examples=200, deadline=None)
def test_token_spans_match_naive_walk(text):
    tokens, c2t, t2c = naive_token_maps(text)
    starts, ends = token_spans(text)
    assert tokens_of(text) == tokens
    assert [(int(s), int(e)) for s, e in zip(starts, ends)] == t2c
    if len(tokens):
        # char->token map: engine vectorized vs reference char walk
        idx = char_to_token(starts, np.arange(len(text)))
        assert idx.tolist() == c2t


@given(texts(max_words=120), st.integers(3, 20))
@settings(max_examples=150, deadline=None)
def test_split_points_match_reference_loop(text, max_len):
    tokens, c2t, _ = naive_token_maps(text)
    if not tokens:
        return
    starts, _ = token_spans(text)
    expect = naive_split_points(text, c2t, len(tokens), max_len)
    got = split_points(text, starts, max_len=max_len)
    assert list(got) == list(expect)


@given(
    st.text(alphabet="abc @$\n\tXY", min_size=10, max_size=60),
    st.data(),
)
@settings(max_examples=150, deadline=None)
def test_mask_window_matches_sequential_replacement(win_text, data):
    n = len(win_text)
    s1 = data.draw(st.integers(0, n - 2))
    e1 = data.draw(st.integers(s1 + 1, n - 1))
    # disjoint second span after the first
    s2 = data.draw(st.integers(e1, n - 1))
    e2 = data.draw(st.integers(s2 + 1, n))
    subj = ("T1", "Drug", s1, e1, win_text[s1:e1])
    obj = ("T2", "Strength", s2, e2, win_text[s2:e2])
    # reference semantics: replace later entity first, then scrub
    if e1 < e2:
        t = win_text[:s2] + "@Strength$" + win_text[e2:]
        t = t[:s1] + "@Drug$" + t[e1:]
    else:
        t = win_text[:s1] + "@Drug$" + win_text[e1:]
        t = t[:s2] + "@Strength$" + t[e2:]
    expect = t.replace("\n", " ").replace("\t", " ")
    assert mask_window(win_text, 0, subj, obj) == expect


@given(texts(max_words=40), st.data())
@settings(max_examples=100, deadline=None)
def test_iob_roundtrip(text, data):
    starts, ends = token_spans(text)
    if len(starts) < 2:
        return
    # pick a random aligned mention over whole tokens
    i = data.draw(st.integers(0, len(starts) - 2))
    j = data.draw(st.integers(i, min(i + 3, len(starts) - 1)))
    ments = [("Drug", int(starts[i]), int(ends[j]))]
    labels = iob_labels(text, ments)
    assert labels[i] == "B-DRUG"
    assert all(l == "I-DRUG" for l in labels[i + 1 : j + 1])
    assert all(l == "O" for k, l in enumerate(labels) if not (i <= k <= j))
    # conll text roundtrip preserves (token, label) pairs
    toks = tokens_of(text)
    block = "\n".join(f"{t} {l}" for t, l in zip(toks, labels))
    seqs = parse_conll(block)
    assert seqs[0]["tokens"] == toks
    assert seqs[0]["labels"] == labels


# -- vectorized candidate emission (round-2 numpy-grid rewrite) -------------

_drug_words = st.sampled_from(["aspirin", "ibuprofen", "metformin"])
_other_words = st.sampled_from(["daily", "tablet", "nausea", "100 mg", "oral"])


@st.composite
def drug_texts(draw, max_words=80):
    """Texts seeded with lexicon surfaces so candidates actually form."""
    n = draw(st.integers(4, max_words))
    parts = []
    for i in range(n):
        kind = draw(st.integers(0, 3))
        if kind == 0:
            parts.append(draw(_drug_words))
        elif kind == 1:
            parts.append(draw(_other_words))
        else:
            parts.append(draw(_word))
        parts.append(draw(_sep))
    return "".join(parts)


@given(drug_texts())
@settings(max_examples=60, deadline=None)
def test_lean_and_full_candidates_score_identically(text):
    """emit_masked=False must change ONLY which string cells are null —
    surrogate predictions (and thus triples) are identical, and the int
    fast-path columns equal the Arrow-kernel predicate on gap_text."""
    import numpy as np
    import pyarrow as pa

    from ehr_relation_extraction_ray.stages.candidates import CandidateGenerator
    from ehr_relation_extraction_ray.stages.relations import RelationScorer

    batch = pa.table(
        {
            "doc_id": pa.array(["d"], pa.string()),
            "text": pa.array([text], pa.large_string()),
        }
    )
    full = CandidateGenerator()(batch)
    lean = CandidateGenerator(emit_masked=False)(batch)
    assert full.num_rows == lean.num_rows
    for c in ("win_idx", "cand_idx", "rel_type", "subj_id", "obj_id",
              "gap_len", "gap_clean"):
        assert full[c].equals(lean[c]), c
    scorer = RelationScorer()
    pf = scorer._surrogate_preds(full)
    pl = scorer._surrogate_preds(lean)
    assert np.array_equal(pf, pl)
    if full.num_rows:
        # gap_len/gap_clean agree with the string predicate on gap_text
        import pyarrow.compute as pc

        gap = full["gap_text"].combine_chunks()
        gl = np.asarray(full["gap_len"])
        clean = full["gap_clean"].combine_chunks().to_numpy(zero_copy_only=False)
        valid = np.asarray(pc.is_valid(gap))
        assert np.array_equal(valid, gl >= 0)
        lens = np.asarray(pc.utf8_length(pc.fill_null(gap, "")))
        assert np.array_equal(lens[valid], gl[valid])
        has_ds = np.asarray(pc.match_substring(pc.fill_null(gap, ""), "  "))
        assert np.array_equal(~has_ds[valid], clean[valid])


def test_hll_estimate_accuracy_and_merge_invariance():
    """HLL estimate within ~3 std errors of exact; merging block sketches
    equals one global sketch (the mergeability the operator relies on)."""
    import numpy as np

    from ehr_relation_extraction_ray.functions.sketch import (
        HLL_M,
        hll_estimate,
        hll_merge,
        hll_registers,
    )

    values = [f"tok-{i}" for i in range(20_000)]
    dup = values + values[:5_000]  # duplication must not matter
    global_regs = hll_registers(dup)
    est = hll_estimate(global_regs)
    rel_err = abs(est - 20_000) / 20_000
    assert rel_err < 3 * 1.04 / np.sqrt(HLL_M), rel_err
    # merge of arbitrary partitions == global
    parts = [hll_registers(dup[i::7]) for i in range(7)]
    merged = hll_merge(np.stack(parts))
    assert np.array_equal(merged, global_regs)


def test_weighted_sample_weight_proportional(ray_session):
    """A-ES sampling: deterministic, parallelism-invariant, and heavier
    rows are overrepresented relative to uniform sampling."""
    import numpy as np
    import pandas as pd
    import ray.data

    from ehr_relation_extraction_ray.pipelines.export import weighted_sample

    rng = np.random.default_rng(3)
    n_rows = 2000
    df = pd.DataFrame(
        {
            "doc_id": np.arange(n_rows, dtype=np.int64),
            # two weight classes, 10x apart
            "w": np.where(np.arange(n_rows) % 10 == 0, 1000, 100).astype("int64"),
        }
    )
    outs = []
    for nparts in (2, 7):
        ds = ray.data.from_pandas(df).repartition(nparts)
        outs.append(weighted_sample(ds, 100, weight_col="w"))
    pd.testing.assert_frame_equal(outs[0], outs[1])
    got = outs[0]
    # heavy rows are 10% of the corpus but carry ~53% of total weight;
    # a weight-proportional sample must overrepresent them clearly
    heavy_frac = (got["w"] == 1000).mean()
    assert heavy_frac > 0.3
    # zero/negative weights are excluded
    df2 = df.copy()
    df2.loc[:49, "w"] = 0
    ds2 = ray.data.from_pandas(df2).repartition(3)
    got2 = weighted_sample(ds2, 100, weight_col="w")
    assert not set(got2["doc_id"]) & set(range(50))
