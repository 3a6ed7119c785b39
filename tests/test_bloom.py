"""Bloom sketch + Bloom-prefilter decontamination (functions/sketch, stages/dedupe)."""

import numpy as np
import pandas as pd

import ray.data

from ehr_relation_extraction_ray.functions import sketch
from ehr_relation_extraction_ray.stages import dedupe


def test_bloom_no_false_negatives_and_low_fp():
    rng = np.random.default_rng(0)
    members = rng.integers(0, 2**63, 10_000, dtype=np.uint64)
    others = rng.integers(0, 2**63, 100_000, dtype=np.uint64)
    others = others[~np.isin(others, members)]
    words = np.zeros((1 << 17) // 64, np.uint64)  # ~13 bits/element
    sketch.bloom_add(words, members, 4)
    assert sketch.bloom_contains(words, members, 4).all()
    fp = sketch.bloom_contains(words, others, 4).mean()
    assert fp < 0.02  # theory ~0.005 at 13 bits / 4 probes


def test_bloom_merge_is_or():
    rng = np.random.default_rng(1)
    a = rng.integers(0, 2**63, 500, dtype=np.uint64)
    b = rng.integers(0, 2**63, 500, dtype=np.uint64)
    w_ab = np.zeros(1024, np.uint64)
    sketch.bloom_add(w_ab, np.concatenate([a, b]), 3)
    wa = np.zeros(1024, np.uint64)
    wb = np.zeros(1024, np.uint64)
    sketch.bloom_add(wa, a, 3)
    sketch.bloom_add(wb, b, 3)
    assert (w_ab == (wa | wb)).all()


def _contamination_frames(n_corpus=60, n_bench=8, seed=5):
    rng = np.random.default_rng(seed)
    vocab = [f"w{i}" for i in range(50)]
    bench_texts = [
        " ".join(rng.choice(vocab, size=12)) for _ in range(n_bench)
    ]
    corpus_texts = []
    for i in range(n_corpus):
        t = " ".join(rng.choice(vocab, size=20))
        if i % 4 == 0:  # plant a contaminated 5-gram from a bench doc
            src = bench_texts[i % n_bench].split()
            t = t + " " + " ".join(src[:5])
        corpus_texts.append(t)
    corpus = pd.DataFrame(
        {"doc_id": np.arange(n_corpus, dtype=np.int64), "text": corpus_texts}
    )
    bench = pd.DataFrame(
        {"doc_id": np.arange(n_bench, dtype=np.int64) + 10_000, "text": bench_texts}
    )
    return corpus, bench


def test_bloom_decontaminate_equals_exact(ray_session):
    corpus_df, bench_df = _contamination_frames()
    corpus = ray.data.from_pandas(corpus_df).repartition(4)
    bench = ray.data.from_pandas(bench_df).repartition(2)

    exact_ref = dedupe.benchmark_shingle_set(bench)
    exact = (
        dedupe.decontaminate(corpus, exact_ref)
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    # tiny filter (512 bits for ~100 shingles) forces real false positives,
    # proving the semi-join verify strips them
    got = (
        dedupe.bloom_decontaminate(corpus, bench, m_bits=512, n_probes=2)
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    got["n_hits"] = got["n_hits"].astype("int64")
    exact["n_hits"] = exact["n_hits"].astype("int64")
    pd.testing.assert_frame_equal(got, exact, check_dtype=False)
    assert len(exact) >= 10  # the planted contamination was actually found

    # driver_merge path (output-bounded partials summed on the driver)
    # must be row-identical to the shuffle path
    merged = (
        dedupe.bloom_decontaminate(
            corpus, bench, m_bits=512, n_probes=2, driver_merge=True
        )
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    merged["n_hits"] = merged["n_hits"].astype("int64")
    pd.testing.assert_frame_equal(merged, exact, check_dtype=False)


def test_cross_pairs_only_cross_side(ray_session):
    """Cross-corpus LSH: every candidate joins an A doc to a B doc, and
    near-identical cross pairs are found; identical within-side pairs are
    NOT emitted."""
    base = "the quick brown fox jumps over the lazy dog again and again " * 5
    a_df = pd.DataFrame(
        {
            "doc_id": ["a0", "a1", "a2"],
            "text": [base, base + " tail", "completely different words here " * 8],
        }
    )
    b_df = pd.DataFrame(
        {
            "doc_id": ["b0", "b1"],
            # b0 near-dups the a0/a1 family; b1 is unrelated
            "text": [base + " extra", "nothing in common with anything " * 8],
        }
    )
    a = ray.data.from_pandas(a_df).repartition(2)
    b = ray.data.from_pandas(b_df)
    pairs = dedupe.minhash_lsh_cross_pairs(a, b).to_pandas().drop_duplicates()
    assert len(pairs) > 0
    assert pairs["doc_a"].str.startswith("a").all()
    assert pairs["doc_b"].str.startswith("b").all()
    got = set(map(tuple, pairs[["doc_a", "doc_b"]].to_numpy()))
    assert ("a0", "b0") in got and ("a1", "b0") in got
    # a0-a1 (identical family, same side) must not appear anywhere
    verified = dedupe.verify_jaccard(
        dedupe.minhash_lsh_cross_pairs(a, b), a.union(b), threshold=0.8
    ).to_pandas()
    assert set(verified["doc_a"]) <= {"a0", "a1", "a2"}
    assert set(verified["doc_b"]) <= {"b0", "b1"}

    # single-pass side_col variant must emit the identical candidate set
    import pyarrow as pa

    both = pd.concat(
        [a_df.assign(side=0), b_df.assign(side=1)], ignore_index=True
    )
    tagged = ray.data.from_pandas(both).repartition(2)
    pairs2 = (
        dedupe.minhash_lsh_cross_pairs(tagged, None, side_col="side")
        .to_pandas()
        .drop_duplicates()
    )
    want = set(map(tuple, pairs[["doc_a", "doc_b"]].to_numpy()))
    got2 = set(map(tuple, pairs2[["doc_a", "doc_b"]].to_numpy()))
    assert got2 == want
    # mutual exclusion is enforced
    import pytest

    with pytest.raises(ValueError):
        dedupe.minhash_lsh_cross_pairs(a, b, side_col="side")
