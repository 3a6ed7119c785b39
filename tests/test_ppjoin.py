"""Prefix-filtered exact set-similarity join (PPJoin shape)."""

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data

from ehr_relation_extraction_ray.pipelines import queries
from ehr_relation_extraction_ray.stages import dedupe

SF = "/root/testdata/sf0.001"


def _naive_pairs(texts_by_id, threshold, k):
    sets = {
        d: set(map(int, dedupe.word_shingle_hashes(t, k)))
        for d, t in texts_by_id.items()
        if t.strip()
    }
    ids = sorted(sets)
    rows = []
    for i in range(len(ids)):
        for j in range(i + 1, len(ids)):
            a, b = ids[i], ids[j]
            inter = len(sets[a] & sets[b])
            uni = len(sets[a] | sets[b])
            if uni and inter / uni >= threshold:
                rows.append((a, b, round(inter / uni, 4)))
    return pd.DataFrame(rows, columns=["doc_a", "doc_b", "jaccard"])


def test_ppjoin_equals_exhaustive(ray_session):
    got = queries.docs_ppjoin_pairs(SF)
    docs = pd.read_parquet(f"{SF}/documents.parquet", columns=["doc_id", "text"])
    want = _naive_pairs(
        {str(d): t for d, t in zip(docs["doc_id"], docs["text"])}, 0.8, 5
    ).sort_values(["doc_a", "doc_b"]).reset_index(drop=True)
    pd.testing.assert_frame_equal(got, want, check_dtype=False)
    assert len(got) > 0  # sf0.001 contains seeded near-dups


def test_ppjoin_prefix_filter_recall(ray_session):
    # near-identical long docs (one word changed) MUST be found even
    # though only the short prefix of each shingle set is exploded,
    # and clearly-below-threshold docs must not appear
    base = " ".join(f"w{i}" for i in range(200))
    near = " ".join(f"w{i}" if i != 100 else "CHANGED" for i in range(200))
    far = " ".join(f"v{i}" for i in range(200))
    ds = ray.data.from_arrow(
        pa.table(
            {
                "doc_id": pa.array(["a", "b", "c"], pa.string()),
                "text": pa.array([base, near, far], pa.string()),
            }
        )
    )
    out = dedupe.ppjoin_pairs(ds, threshold=0.8, k=5).to_pandas()
    want = _naive_pairs({"a": base, "b": near, "c": far}, 0.8, 5)
    assert sorted(zip(out["doc_a"], out["doc_b"])) == sorted(
        zip(want["doc_a"], want["doc_b"])
    )
    assert set(out["doc_a"]) | set(out["doc_b"]) == {"a", "b"}
