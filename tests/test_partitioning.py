"""functions/partitioning.groupby_partition — equivalence + schema pinning."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

import ray.data

from ehr_relation_extraction_ray.functions.partitioning import (
    add_hash_partition,
    groupby_partition,
)


def _rand_table(n=1000, n_keys=37, seed=5):
    rng = np.random.default_rng(seed)
    return pd.DataFrame(
        {
            "k": [f"key-{i}" for i in rng.integers(0, n_keys, n)],
            "v": rng.integers(0, 100, n),
        }
    )


def test_matches_per_group_result(ray_session):
    df = _rand_table()
    ds = ray.data.from_pandas(df)

    def agg(part: pd.DataFrame) -> pd.DataFrame:
        return part.groupby("k", as_index=False).agg(
            s=("v", "sum"), n=("v", "size")
        )

    got = (
        groupby_partition(ds, "k", agg, num_partitions=8, batch_format="pandas")
        .to_pandas()
        .sort_values("k")
        .reset_index(drop=True)
    )
    want = agg(df).sort_values("k").reset_index(drop=True)
    got["n"] = got["n"].astype(want["n"].dtype)
    pd.testing.assert_frame_equal(got, want)


def test_key_never_split_across_partitions(ray_session):
    df = _rand_table(n=2000, n_keys=101)
    ds = ray.data.from_pandas(df)
    seen = {}

    tagged = ds.map_batches(
        lambda t: add_hash_partition(t, ["k"], 16), batch_format="pyarrow"
    ).to_pandas()
    for k, sub in tagged.groupby("k"):
        parts = set(sub["_part"])
        assert len(parts) == 1, f"key {k} split across partitions {parts}"
        seen[k] = parts.pop()
    # and the hash actually spreads keys
    assert len(set(seen.values())) > 4


def test_schema_pinned_for_empty_outputs(ray_session):
    df = _rand_table(n=200, n_keys=11)
    ds = ray.data.from_pandas(df)
    schema = pa.schema([("k", pa.string()), ("s", pa.int64())])

    def sometimes_empty(part: pd.DataFrame) -> pd.DataFrame:
        out = part.groupby("k", as_index=False).agg(s=("v", "sum"))
        return out[out["s"] > 10**9]  # always empty

    out = groupby_partition(
        ds, "k", sometimes_empty, num_partitions=8,
        batch_format="pandas", schema=schema,
    )
    tbl = pa.Table.from_pandas(out.to_pandas(), preserve_index=False)
    assert tbl.num_rows == 0


def test_multi_key(ray_session):
    df = _rand_table(n=500, n_keys=7)
    df["k2"] = (df["v"] % 3).astype(str)
    ds = ray.data.from_pandas(df)

    def agg(part: pd.DataFrame) -> pd.DataFrame:
        return part.groupby(["k", "k2"], as_index=False).agg(s=("v", "sum"))

    got = (
        groupby_partition(ds, ["k", "k2"], agg, batch_format="pandas")
        .to_pandas()
        .sort_values(["k", "k2"])
        .reset_index(drop=True)
    )
    want = agg(df).sort_values(["k", "k2"]).reset_index(drop=True)
    pd.testing.assert_frame_equal(got, want)


def test_verify_jaccard_paths_agree(ray_session):
    """Broadcast fast path == fully distributed co-group path."""
    import pyarrow as pa

    from ehr_relation_extraction_ray.stages import dedupe

    texts = {
        f"d{i}": " ".join(
            ["alpha beta gamma delta epsilon zeta eta theta"] * 3
            + ([f"unique{i}"] if i % 3 else [])
        )
        for i in range(12)
    }
    docs = ray.data.from_items(
        [{"doc_id": k, "text": v} for k, v in texts.items()]
    )
    pairs = dedupe.minhash_lsh_pairs(docs, distinct=False)
    fast = (
        dedupe.verify_jaccard(pairs, docs, threshold=0.5)
        .to_pandas()
        .sort_values(["doc_a", "doc_b"])
        .reset_index(drop=True)
    )
    slow = (
        dedupe._verify_jaccard_cogroup(
            pairs.materialize(), docs, 0.5, 5, "text", "doc_id"
        )
        .to_pandas()
        .sort_values(["doc_a", "doc_b"])
        .reset_index(drop=True)
    )
    assert len(fast) > 0
    pd.testing.assert_frame_equal(fast, slow)


def test_salted_distinct_count_exact_and_skew_proof(ray_session):
    """Per-salt value sets are disjoint -> summed shard counts are EXACT;
    one pathological hot key (90% of rows) gives the same answer as
    pandas nunique at any parallelism/salt count."""
    import numpy as np
    import pandas as pd
    import ray.data

    from ehr_relation_extraction_ray.functions.partitioning import (
        salted_distinct_count,
    )

    rng = np.random.default_rng(13)
    n = 5000
    keys = np.where(rng.random(n) < 0.9, "hot", rng.choice(["a", "b"], size=n))
    vals = rng.integers(0, 800, size=n).astype("int64")
    df = pd.DataFrame({"k": keys, "v": vals})
    want = df.groupby("k")["v"].nunique().sort_index()
    for nparts, salts in ((2, 4), (8, 16)):
        ds = ray.data.from_pandas(df).repartition(nparts)
        got = (
            salted_distinct_count(ds, "k", "v", num_salts=salts)
            .to_pandas()
            .sort_values("k")
            .set_index("k")["n_distinct"]
        )
        assert got.to_dict() == want.to_dict()
