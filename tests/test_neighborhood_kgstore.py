"""Neighborhood (sampling / feature prop / summaries), share rules and
KG-store (dictionary / sorted index) operators vs serial pandas
references, including parallelism invariance and the hot-value path."""

import hashlib
import os
import shutil

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

import ray

from ehr_relation_extraction_ray.stages import kgstore, mining
from ehr_relation_extraction_ray.stages import neighborhood as nb

SEP = "\x1f"
HEX = "0123456789abcdef"


def _triples_df(seed: int = 3, n: int = 2000) -> pd.DataFrame:
    rng = np.random.default_rng(seed)
    return pd.DataFrame(
        {
            "subj": [f"s{rng.integers(0, 60)}" for _ in range(n)],
            "pred": [f"p{rng.integers(0, 5)}" for _ in range(n)],
            "obj": [f"v{rng.integers(0, 30)}" for _ in range(n)],
        }
    )


def _und(df: pd.DataFrame) -> pd.DataFrame:
    e = df[["subj", "obj"]].drop_duplicates()
    return pd.DataFrame(
        {"v": pd.concat([e.subj, e.obj]), "u": pd.concat([e.obj, e.subj])}
    ).drop_duplicates()


@pytest.fixture(scope="module")
def trip():
    df = _triples_df()
    return df, ray.data.from_pandas(df).repartition(7)


def test_neighbor_sample_matches_serial(trip):
    df, ds = trip
    und = _und(df).copy()
    und["rk"] = [
        hashlib.md5(f"{a}{SEP}{b}".encode()).hexdigest()
        for a, b in zip(und.v, und.u)
    ]
    und = und.sort_values(["v", "rk"])
    und["r"] = und.groupby("v").cumcount() + 1
    h1 = und[und.r <= 3][["v", "u"]]
    s2 = und[und.r <= 2][["v", "u"]].rename(columns={"v": "mid", "u": "w"})
    hop1 = pd.DataFrame({"seed": h1.v, "hop": 1, "src": h1.v, "dst": h1.u})
    j = h1.merge(s2, left_on="u", right_on="mid")
    hop2 = pd.DataFrame({"seed": j.v, "hop": 2, "src": j.u, "dst": j.w})
    want = (
        pd.concat([hop1, hop2])
        .astype({"hop": "int64"})
        .sort_values(["seed", "hop", "src", "dst"])
        .reset_index(drop=True)
    )
    got = nb.neighbor_sample(ds, k1=3, k2=2)
    pd.testing.assert_frame_equal(got, want)
    # fanout bound: every (seed, hop-1) group <= k1, every frontier
    # expansion <= k2 per mid node
    assert got[got.hop == 1].groupby("seed").size().max() <= 3
    assert got[got.hop == 2].groupby(["seed", "src"]).size().max() <= 2


def test_neighbor_sample_parallelism_invariance(trip):
    df, _ = trip
    a = nb.neighbor_sample(ray.data.from_pandas(df).repartition(2))
    b = nb.neighbor_sample(ray.data.from_pandas(df).repartition(13))
    pd.testing.assert_frame_equal(a, b)


def test_feature_propagation_matches_serial(trip):
    df, ds = trip
    und = _und(df)
    dims = 4

    def feats(s):
        h = hashlib.md5(str(s).encode()).hexdigest()
        return [HEX.index(h[j]) for j in range(dims)]

    fx = {v: feats(v) for v in set(und.v)}
    f = pd.DataFrame(
        [{"u": u, **{f"x{j}": fx[u][j] for j in range(dims)}} for u in fx]
    )
    m1 = und.merge(f, on="u")
    h1 = m1.groupby("v").agg(
        c1=("u", "size"), **{f"s{j}": (f"x{j}", "sum") for j in range(dims)}
    ).reset_index()
    m2 = und.merge(h1.rename(columns={"v": "u"}), on="u")
    h2 = m2.groupby("v").agg(
        c2=("c1", "sum"), **{f"t{j}": (f"s{j}", "sum") for j in range(dims)}
    ).reset_index()
    want = pd.DataFrame({"node": h2.v, "n_paths": h2.c2.astype("int64")})
    for j in range(dims):
        want[f"f{j + 1}"] = np.round(h2[f"t{j}"] / h2.c2, 6)
    want = want.sort_values("node").reset_index(drop=True)
    got = nb.feature_propagation(ds, dims=dims)
    pd.testing.assert_frame_equal(got, want)


def test_entity_summary_matches_serial(trip):
    df, ds = trip
    dfacts = df.drop_duplicates()
    cnt = dfacts.groupby(["pred", "obj"]).size().rename("fact_freq").reset_index()
    r = dfacts.merge(cnt, on=["pred", "obj"]).sort_values(
        ["subj", "fact_freq", "pred", "obj"]
    )
    r["rk"] = r.groupby("subj").cumcount() + 1
    want = (
        r[r.rk <= 5][["subj", "pred", "obj", "fact_freq", "rk"]]
        .astype({"fact_freq": "int64", "rk": "int64"})
        .sort_values(["subj", "rk"])
        .reset_index(drop=True)
    )
    got = nb.entity_summary(ds, k=5)
    pd.testing.assert_frame_equal(got, want)


def _share_rules_serial(df, min_support=5, min_confidence=0.1):
    e = df.drop_duplicates()
    sh = e.merge(e, on=["pred", "obj"], suffixes=("_a", "_b"))
    sh = sh[sh.subj_a < sh.subj_b][["pred", "subj_a", "subj_b"]].drop_duplicates()
    bn = sh.groupby("pred").size()
    both = sh.merge(sh, on=["subj_a", "subj_b"], suffixes=("_1", "_2"))
    both = both[both.pred_1 != both.pred_2].groupby(["pred_1", "pred_2"]).size()
    rows = []
    for (a, b), n in both.items():
        conf = n / bn[a]
        if n >= min_support and conf >= min_confidence:
            rows.append((a, b, int(bn[a]), int(n), round(conf, 6)))
    return (
        pd.DataFrame(
            rows,
            columns=["antecedent", "consequent", "n_ant", "n_both", "confidence"],
        )
        .astype({"n_ant": "int64", "n_both": "int64"})
        .sort_values(["antecedent", "consequent"])
        .reset_index(drop=True)
    )


def test_share_rules_matches_serial(trip):
    df, ds = trip
    want = _share_rules_serial(df)
    assert len(want) > 0
    got = mining.share_rules(ds)
    pd.testing.assert_frame_equal(got, want)


def test_share_rules_hot_value_path(trip):
    """A tiny hot threshold forces the slab/hot branch for every group —
    identical rules (lineage rows are side-channel, never in the output)."""
    df, ds = trip
    want = _share_rules_serial(df)
    got = mining.share_rules(ds, hot_threshold=3)
    pd.testing.assert_frame_equal(got, want)
    # the candidate stream itself carries the hot-group lineage rows
    cand = mining.share_pairs(ds, hot_threshold=3).to_pandas()
    assert (cand["kind"] == 1).any()


def test_term_dictionary_matches_rank(trip):
    df, ds = trip
    got = kgstore.term_dictionary(ds)
    terms = sorted(set(df.subj) | set(df.pred) | set(df.obj))
    want = pd.DataFrame({"term": terms, "id": np.arange(len(terms), dtype="int64")})
    pd.testing.assert_frame_equal(got, want)


def test_sorted_index_zonemaps_and_files(trip, tmp_path):
    df, ds = trip
    out_dir = str(tmp_path / "kg_index")
    shutil.rmtree(out_dir, ignore_errors=True)
    zones = kgstore.sorted_index(ds, out_dir)
    e = df.drop_duplicates()
    frames = []
    for order, cols in (
        ("spo", ["subj", "pred", "obj"]),
        ("osp", ["obj", "subj", "pred"]),
    ):
        d = e.copy()
        d["bucket"] = [hashlib.md5(t.encode()).hexdigest()[0] for t in d[cols[0]]]
        for b, g in d.groupby("bucket"):
            key = g[cols[0]] + SEP + g[cols[1]] + SEP + g[cols[2]]
            frames.append(
                {"idx_order": order, "bucket": b, "n": len(g),
                 "key_min": key.min(), "key_max": key.max()}
            )
    want = (
        pd.DataFrame(frames)
        .astype({"n": "int64"})
        .sort_values(["idx_order", "bucket"])
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(zones, want)
    # every written file is sorted in its permutation's order and the
    # union of files is exactly the distinct edge set
    total = 0
    for order, cols in (
        ("spo", ["subj", "pred", "obj"]),
        ("osp", ["obj", "subj", "pred"]),
    ):
        for f in os.listdir(os.path.join(out_dir, order)):
            t = pq.read_table(os.path.join(out_dir, order, f)).to_pandas()
            assert t.equals(
                t.sort_values(cols, kind="stable").reset_index(drop=True)
            )
            total += len(t)
    assert total == 2 * len(e)


def test_upsert_equals_full_build(trip, tmp_path):
    """upsert(base, delta) produces the same zone maps AND the same file
    contents as a from-scratch build over the union."""
    df, _ = trip
    half = len(df) // 2
    base_df, delta_df = df.iloc[:half], df.iloc[half:]
    up_dir, full_dir = str(tmp_path / "up"), str(tmp_path / "full")
    kgstore.sorted_index(ray.data.from_pandas(base_df).repartition(4), up_dir)
    got = kgstore.upsert_index(
        ray.data.from_pandas(delta_df).repartition(4), up_dir
    )
    want = kgstore.sorted_index(
        ray.data.from_pandas(df).repartition(4), full_dir
    )
    pd.testing.assert_frame_equal(got, want)
    for order in ("spo", "osp"):
        for f in os.listdir(os.path.join(full_dir, order)):
            a = pq.read_table(os.path.join(up_dir, order, f)).to_pandas()
            b = pq.read_table(os.path.join(full_dir, order, f)).to_pandas()
            pd.testing.assert_frame_equal(a, b)


def test_upsert_untouched_buckets_not_rewritten(trip, tmp_path):
    """A delta touching one bucket leaves every other bucket file's mtime
    (and bytes) alone — zone rows for them come from footer stats."""
    df, _ = trip
    out_dir = str(tmp_path / "inc")
    kgstore.sorted_index(ray.data.from_pandas(df).repartition(4), out_dir)
    before = {
        (o, f): os.path.getmtime(os.path.join(out_dir, o, f))
        for o in ("spo", "osp")
        for f in os.listdir(os.path.join(out_dir, o))
    }
    delta = pd.DataFrame(
        {"subj": ["zzz-new-subject"], "pred": ["p0"], "obj": ["v0"]}
    )
    zones = kgstore.upsert_index(ray.data.from_pandas(delta), out_dir)
    sb = hashlib.md5(b"zzz-new-subject").hexdigest()[0]
    ob = hashlib.md5(b"v0").hexdigest()[0]
    touched = {("spo", f"{sb}.parquet"), ("osp", f"{ob}.parquet")}
    for key, mtime in before.items():
        if key not in touched:
            assert os.path.getmtime(os.path.join(out_dir, *key)) == mtime, key
    # the new edge is present in the returned zone maps
    spo = zones[(zones.idx_order == "spo") & (zones.bucket == sb)]
    assert spo["key_max"].iloc[0] >= "zzz-new-subject"


def test_lookup_reads_only_needed_buckets(trip, tmp_path):
    df, _ = trip
    out_dir = str(tmp_path / "lk")
    kgstore.sorted_index(
        ray.data.from_pandas(df).repartition(4), out_dir, orders=("spo",)
    )
    # pruning: lookup must not open buckets outside the query subjects'
    subjects = sorted(set(df.subj))[:3]
    want_buckets = {
        hashlib.md5(s.encode()).hexdigest()[0] for s in subjects
    }
    odir = os.path.join(out_dir, "spo")
    others = [
        f for f in os.listdir(odir) if f.split(".")[0] not in want_buckets
    ]
    for f in others:  # corrupt every other bucket: opening one would raise
        with open(os.path.join(odir, f), "wb") as fh:
            fh.write(b"not a parquet file")
    got = kgstore.lookup_subjects(out_dir, subjects)
    e = df.drop_duplicates()
    want = (
        e[e.subj.isin(subjects)]
        .drop_duplicates()
        .sort_values(["subj", "pred", "obj"])
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(got, want)


def test_knn_graph_matches_bruteforce_recall_and_invariance():
    """knn_graph: parallelism-invariant, k-bounded, and per-point cell-
    restricted exactness (each reported neighbor list equals the
    brute-force top-k over the point's probed cells)."""
    from ehr_relation_extraction_ray.stages import similarity

    import pyarrow as pa

    rng = np.random.default_rng(5)
    n, d = 400, 16
    emb = rng.normal(size=(n, d)).astype(np.float32)
    ids = np.arange(n, dtype=np.int64)
    t = pa.table(
        {"vec_id": ids,
         "embedding": pa.FixedSizeListArray.from_arrays(
             pa.array(emb.reshape(-1)), d)}
    )
    a = similarity.knn_graph(ray.data.from_arrow(t).repartition(2), k=4)
    b = similarity.knn_graph(ray.data.from_arrow(t).repartition(9), k=4)
    pd.testing.assert_frame_equal(a, b)
    assert a.groupby("vec_id")["rank"].max().max() <= 4
    assert (a.vec_id != a.nbr_id).all()
    # serial spec parity (the oracle path)
    from ehr_relation_extraction_ray.serial_oracle import serial_knn_graph_df

    want = serial_knn_graph_df(ids, emb, k=4)
    pd.testing.assert_frame_equal(a, want)


def test_bpe_encode_manual_and_invariance():
    from ehr_relation_extraction_ray.stages import text_analysis as ta

    docs = pd.DataFrame(
        {"doc_id": [0, 1, 2],
         "text": ["aa ab aa", "b aa  b", "  "]}
    )
    merges = pd.DataFrame(
        {"rank": [0, 1], "left": ["a", "a"], "right": ["a", "</w>"],
         "pair_count": [9, 9]}
    )
    # 'aa' -> [aa,</w>] (2); 'ab' -> [a, b, </w>] (3); 'b' -> [b, </w>] (2)
    got = ta.bpe_encode(ray.data.from_pandas(docs).repartition(2), merges)
    want = pd.DataFrame(
        {"doc_id": [0, 1, 2], "n_words": [3, 3, 0],
         "n_tokens": [2 + 3 + 2, 2 + 2 + 2, 0]}
    ).astype({"n_words": "int64", "n_tokens": "int64"})
    pd.testing.assert_frame_equal(got, want)
    got2 = ta.bpe_encode(ray.data.from_pandas(docs).repartition(3), merges)
    pd.testing.assert_frame_equal(got2, want)
    # merge ranks apply lowest-first: 'a'+'</w>' fires only when 'a' is
    # terminal after the 'aa' merge consumed the pair
    assert ta.bpe_apply_word("aaa", {("a", "a"): 0, ("a", "</w>"): 1}) == 2


def test_dataset_out_variants_match_pandas_contract(trip):
    """The *_ds stage variants are the same computation: .to_pandas() +
    the contract sort must equal the pandas-returning query forms."""
    df, ds = trip
    got_ns = (
        nb.neighbor_sample_ds(ds).to_pandas()
        .sort_values(["seed", "hop", "src", "dst"]).reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(
        got_ns.astype({"hop": "int64"}), nb.neighbor_sample(ds)
    )
    got_fp = (
        nb.feature_propagation_ds(ds).to_pandas()
        .sort_values("node").reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(
        got_fp.astype({"n_paths": "int64"}),
        nb.feature_propagation(ds),
    )
    got_es = (
        nb.entity_summary_ds(ds).to_pandas()
        .sort_values(["subj", "rk"]).reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(
        got_es.astype({"fact_freq": "int64", "rk": "int64"}),
        nb.entity_summary(ds),
    )


def test_upsert_shared_fs_guard(tmp_path):
    """The per-task marker check: a worker that cannot read the driver's
    run token (missing or stale marker = node-local out_dir) must raise
    instead of silently merging delta-only rows over lost base data."""
    marker = str(tmp_path / "_SHARED_FS_MARKER")
    # missing marker -> raise
    with pytest.raises(RuntimeError, match="not visible"):
        kgstore._verify_shared_marker(marker, "tok-a")
    # stale marker from a previous run -> raise
    with open(marker, "w") as f:
        f.write("tok-previous-run")
    with pytest.raises(RuntimeError, match="not visible"):
        kgstore._verify_shared_marker(marker, "tok-a")
    # matching token -> pass
    with open(marker, "w") as f:
        f.write("tok-a")
    kgstore._verify_shared_marker(marker, "tok-a")


def test_upsert_base_incomplete_raises(trip, tmp_path):
    """A base bucket file missing from the driver's view (node-local base
    build) must abort the upsert — the zone manifest is the witness."""
    df, _ = trip
    out_dir = str(tmp_path / "incomplete")
    kgstore.sorted_index(
        ray.data.from_pandas(df.iloc[:200]).repartition(2), out_dir
    )
    victims = [
        f for f in os.listdir(os.path.join(out_dir, "spo"))
        if f.endswith(".parquet")
    ]
    os.remove(os.path.join(out_dir, "spo", victims[0]))
    with pytest.raises(RuntimeError, match="incomplete"):
        kgstore.upsert_index(
            ray.data.from_pandas(df.iloc[200:260]).repartition(1), out_dir
        )


def test_entity_summary_cogroup_path_equals_broadcast(trip):
    """Above the broadcast limit the (pred, obj)-keyed co-group path must
    produce exactly what the broadcast path produces."""
    df, ds = trip
    want = nb.entity_summary(ds)
    got = (
        nb.entity_summary_ds(ds, broadcast_limit=0).to_pandas()
        .sort_values(["subj", "rk"]).reset_index(drop=True)
        .astype({"fact_freq": "int64", "rk": "int64"})
    )
    pd.testing.assert_frame_equal(got, want)


def test_zone_manifest_survives_subset_order_upsert(trip, tmp_path):
    """An upsert over a SUBSET of orders must not delete the other
    orders' manifest rows — that would disable the base-completeness
    defense for exactly the buckets it protects."""
    import pyarrow.parquet as _pq

    df, _ = trip
    out_dir = str(tmp_path / "subset")
    kgstore.sorted_index(
        ray.data.from_pandas(df.iloc[:200]).repartition(2), out_dir,
        orders=("spo", "osp"),
    )
    kgstore.upsert_index(
        ray.data.from_pandas(df.iloc[200:260]).repartition(1), out_dir,
        orders=("spo",),
    )
    man = _pq.read_table(
        os.path.join(out_dir, kgstore.ZONES_FILE)
    ).to_pandas()
    assert set(man["idx_order"]) == {"spo", "osp"}
    # osp base bucket goes missing -> the defense still fires
    osp = [f for f in os.listdir(os.path.join(out_dir, "osp"))
           if f.endswith(".parquet")]
    os.remove(os.path.join(out_dir, "osp", osp[0]))
    with pytest.raises(RuntimeError, match="incomplete"):
        kgstore.upsert_index(
            ray.data.from_pandas(df.iloc[260:300]).repartition(1), out_dir,
            orders=("spo", "osp"),
        )


def test_neighbor_sample_k1_zero_schema_safe(trip):
    """ADVICE r4: k1=0 (or any fully-filtered hop-1) used to let empty
    (v, u, r)-schema blocks into the union and poison the concat; now
    empty hop-1 blocks are dropped at pin time."""
    _, ds = trip
    out_ds = nb.neighbor_sample_ds(ds, k1=0, k2=2)
    # Dataset schema survives (to_pandas of an empty Dataset drops
    # columns in this Ray version — the schema is the contract)
    assert out_ds.schema().names == ["seed", "hop", "src", "dst"]
    assert out_ds.count() == 0  # no frontier -> no hop-2 either
    # the query contract returns the typed empty frame
    out = nb.neighbor_sample(ds, k1=0, k2=2)
    assert list(out.columns) == ["seed", "hop", "src", "dst"]
    assert out.empty


def test_zone_from_footer_zero_row_bucket_raises(tmp_path):
    """ADVICE r4: a zero-row bucket file (interrupted/foreign write)
    raises a descriptive error naming the file, not a bare ValueError
    from min([])."""
    import pyarrow as pa

    p = str(tmp_path / "0.parquet")
    pq.write_table(
        pa.table({"k": pa.array([], pa.string()),
                  "t1": pa.array([], pa.string())}), p
    )
    with pytest.raises(RuntimeError, match="zero\\s*rows|interrupted"):
        kgstore._zone_from_footer(p, "spo", "0")


def test_kgstore_through_filesystem_handle(trip, tmp_path):
    """Round-4 VERDICT item 3: the store accepts a pyarrow.fs handle.
    Build + upsert + lookup through a SubTreeFileSystem (paths relative
    to a mount root — raw os.path would break immediately) must equal
    the plain-path build bit-for-bit."""
    from pyarrow import fs as pafs

    df, ds = trip
    half = len(df) // 2
    base = ray.data.from_pandas(df.iloc[:half]).repartition(3)
    delta = ray.data.from_pandas(df.iloc[half:]).repartition(3)

    plain = str(tmp_path / "plain")
    kgstore.sorted_index(base, plain)
    z_plain = kgstore.upsert_index(delta, plain)

    root = tmp_path / "mnt"
    root.mkdir()
    sub = pafs.SubTreeFileSystem(str(root), pafs.LocalFileSystem())
    kgstore.sorted_index(base, "store", filesystem=sub)
    z_sub = kgstore.upsert_index(delta, "store", filesystem=sub)

    pd.testing.assert_frame_equal(
        z_plain.reset_index(drop=True), z_sub.reset_index(drop=True)
    )
    subs = sorted(df["subj"].unique())[:5]
    a = kgstore.lookup_subjects(plain, subs)
    b = kgstore.lookup_subjects("store", subs, filesystem=sub)
    pd.testing.assert_frame_equal(a, b)
    # the store really lives under the mount root, not the cwd
    assert (root / "store" / "spo").is_dir()
    assert (root / "store" / kgstore.ZONES_FILE).is_file()


def test_resumable_writer_through_filesystem_handle(tmp_path):
    """write_partitioned_resumable through a SubTreeFileSystem: first
    run writes all partitions, second run skips them all."""
    from pyarrow import fs as pafs

    from ehr_relation_extraction_ray.pipelines import export

    df = pd.DataFrame({"k": [f"k{i}" for i in range(200)],
                       "v": np.arange(200)})
    ds = ray.data.from_pandas(df).repartition(4)
    root = tmp_path / "mnt"
    root.mkdir()
    sub = pafs.SubTreeFileSystem(str(root), pafs.LocalFileSystem())
    r1 = export.write_partitioned_resumable(
        ds, "out", "k", num_partitions=8, filesystem=sub
    )
    assert r1["written"] == 8 and r1["rows_written"] == 200
    r2 = export.write_partitioned_resumable(
        ds, "out", "k", num_partitions=8, filesystem=sub
    )
    assert r2 == {"written": 0, "skipped": 8, "rows_written": 0}
    got = pq.read_table(str(root / "out")).to_pandas()
    assert len(got) == 200
    assert set(got["k"]) == set(df["k"])


def test_resumable_writer_crashed_tmp_is_ignored(tmp_path):
    """A crash between write_table and replace leaves an _tmp-* file;
    parquet directory readers must skip it (the '_' prefix is the only
    prefix pyarrow datasets ignore) and a resume must still complete the
    partition."""
    from ehr_relation_extraction_ray.pipelines import export

    df = pd.DataFrame({"k": [f"k{i}" for i in range(50)], "v": np.arange(50)})
    ds = ray.data.from_pandas(df).repartition(2)
    out = tmp_path / "out"
    r1 = export.write_partitioned_resumable(ds, str(out), "k", num_partitions=4)
    assert r1["written"] == 4
    # simulate a crashed write: stray tmp shard next to a finished one
    stray = out / "part=0" / "_tmp-deadbeef"
    pq.write_table(
        pq.read_table(str(out / "part=0" / "data.parquet")), str(stray)
    )
    got = pq.read_table(str(out)).to_pandas()
    assert len(got) == 50  # the stray tmp did NOT duplicate rows
    r2 = export.write_partitioned_resumable(ds, str(out), "k", num_partitions=4)
    assert r2 == {"written": 0, "skipped": 4, "rows_written": 0}


def test_neighbor_sample_k2_zero_hop1_only(trip):
    """k2=0: no per-node hop-2 samples — hop-1 rows only, and no
    stale-schema block can reach the tagged union."""
    df, ds = trip
    out = nb.neighbor_sample(ds, k1=3, k2=0)
    assert not out.empty
    assert set(out["hop"]) == {1}
    want = nb.neighbor_sample(ds, k1=3, k2=2)
    pd.testing.assert_frame_equal(
        out.reset_index(drop=True),
        want[want["hop"] == 1].reset_index(drop=True),
    )


def test_resumable_placeholder_schema_from_prior_run(tmp_path):
    """Resume where only EMPTY partitions remain: the placeholder schema
    comes from a prior run's data file, never a dtype guess."""
    from ehr_relation_extraction_ray.pipelines import export

    df = pd.DataFrame({"k": [f"k{i}" for i in range(4)],
                       "payload": [f"x{i}".encode() for i in range(4)]})
    ds = ray.data.from_pandas(df).repartition(2)
    out = tmp_path / "o"
    # 16 partitions >> 4 keys guarantees empty-placeholder partitions
    r1 = export.write_partitioned_resumable(ds, str(out), "k", num_partitions=16)
    assert r1["written"] == 16
    # delete one partition that was legitimately EMPTY (placeholder) to
    # simulate a crash before the placeholder loop; rerun must rebuild it
    # with the bytes schema read from a real file
    empties = [
        d for d in out.iterdir()
        if pq.read_metadata(str(d / "data.parquet")).num_rows == 0
    ]
    assert empties  # 16 partitions over 4 keys must leave empties
    if empties:
        (empties[0] / "data.parquet").unlink()
        r2 = export.write_partitioned_resumable(
            ds, str(out), "k", num_partitions=16
        )
        assert r2["written"] == 1
    whole = pq.read_table(str(out))  # unified schema across all files
    assert whole.schema.field("payload").type in (pa.binary(), pa.large_binary())
    assert whole.num_rows == 4
