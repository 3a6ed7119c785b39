"""Bucket caps are never silent: degenerate buckets emit overflow records."""

import ray.data

from ehr_relation_extraction_ray.stages import dedupe
from ehr_relation_extraction_ray.state.quarantine import read_errors


def _identical_docs(n):
    return ray.data.from_items(
        [{"doc_id": f"{i:04d}", "text": "same boilerplate text repeated again"}
         for i in range(n)]
    )


def test_minhash_overflow_recorded(tmp_path, ray_session):
    overflow = str(tmp_path / "overflow")
    docs = _identical_docs(9)  # one bucket of 9 ids, cap 4
    pairs = dedupe.minhash_lsh_pairs(
        docs, bucket_cap=4, overflow_dir=overflow
    ).to_pandas()
    # truncated to first 4 sorted ids -> C(4,2)=6 distinct pairs
    assert len(pairs) == 6
    assert set(pairs["doc_a"]) <= {"0000", "0001", "0002"}
    errs = read_errors(overflow).to_pandas()
    assert (errs["stage"] == "minhash_bucket").all()
    assert len(errs) >= 1  # one record per overflowing (band, hash) bucket
    assert "size 9 > cap 4" in errs["error"].iloc[0]


def test_simhash_overflow_recorded(tmp_path, ray_session):
    overflow = str(tmp_path / "overflow")
    docs = _identical_docs(7)
    pairs = dedupe.simhash_near_pairs(
        docs, bucket_cap=3, overflow_dir=overflow
    ).to_pandas()
    assert len(pairs) == 3  # C(3,2) after truncation, deduped across subkeys
    errs = read_errors(overflow).to_pandas()
    assert (errs["stage"] == "simhash_bucket").all()
    assert len(errs) >= 1
    assert "size 7 > cap 3" in errs["error"].iloc[0]


def test_no_overflow_below_cap(tmp_path, ray_session):
    overflow = str(tmp_path / "overflow")
    docs = _identical_docs(3)
    dedupe.minhash_lsh_pairs(docs, bucket_cap=50, overflow_dir=overflow).to_pandas()
    assert read_errors(overflow).to_pandas().empty


def test_decontaminate_constructed_overlap(ray_session):
    """A corpus doc that embeds a benchmark sentence is flagged with the
    exact distinct-shared-shingle count; clean docs are absent."""
    import numpy as np
    import pandas as pd

    bench_text = "alpha beta gamma delta epsilon zeta eta"
    bench = ray.data.from_pandas(
        pd.DataFrame({"doc_id": [100], "text": [bench_text]})
    )
    corpus = ray.data.from_pandas(
        pd.DataFrame(
            {
                "doc_id": [1, 2, 3],
                "text": [
                    # contains the full benchmark text -> every benchmark
                    # 5-shingle (3 of them) is shared
                    "intro words then " + bench_text + " trailing words",
                    "totally unrelated text with other words entirely here",
                    # shares exactly one 5-word shingle
                    "alpha beta gamma delta epsilon different suffix now",
                ],
            }
        )
    )
    ref = dedupe.benchmark_shingle_set(bench)
    out = (
        dedupe.decontaminate(corpus, ref)
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    assert out["doc_id"].tolist() == [1, 3]
    assert out["n_hits"].tolist() == [3, 1]
    # empty benchmark -> nothing flagged
    empty_ref = dedupe.benchmark_shingle_set(bench.filter(lambda r: False))
    assert dedupe.decontaminate(corpus, empty_ref).count() == 0
