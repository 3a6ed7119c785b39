"""Unit tests for fuzzy canonicalization, media payload dedup, and
watermark late-arrival detection."""

import hashlib

import numpy as np
import pandas as pd

import ray.data

from ehr_relation_extraction_ray.stages import canonicalize, multimodal


def _mentions_ds(rows):
    df = pd.DataFrame(rows, columns=["doc_id", "ent_id", "ent_type",
                                     "start", "end", "text"])
    return ray.data.from_pandas(df).repartition(2)


def test_build_nodes_fuzzy_merges_close_surfaces():
    rows = [
        ("d1", "T1", "Drug", 0, 7, "aspirin"),
        ("d2", "T1", "Drug", 0, 6, "asprin"),   # lev 1 -> merges
        ("d3", "T1", "Drug", 0, 7, "aspirin"),
        ("d4", "T1", "Drug", 0, 9, "ibuprofen"),  # far away
    ]
    nodes, _ = canonicalize.build_nodes(_mentions_ds(rows), fuzzy_max_d=1)
    df = nodes.to_pandas().sort_values("node_id").reset_index(drop=True)
    merged = df[df["canonical_text"] == "aspirin"]
    assert len(merged) == 1
    assert merged["n_aliases"].iloc[0] == 2
    assert merged["n_mentions"].iloc[0] == 3
    assert len(df) == 2  # ibuprofen stays its own node


def test_build_nodes_fuzzy_default_off_matches_plain():
    rows = [
        ("d1", "T1", "Drug", 0, 7, "aspirin"),
        ("d2", "T1", "Drug", 0, 6, "asprin"),
    ]
    plain, _ = canonicalize.build_nodes(_mentions_ds(rows))
    assert len(plain.to_pandas()) == 2  # no fuzzy merge by default


def test_payload_dedup_groups():
    payloads = [b"\x00\x01", b"\x00\x01", b"\xff", b"\x00\x01", b"\xab\xcd"]
    df = pd.DataFrame(
        {"media_id": [f"m-{i:06d}" for i in range(len(payloads))],
         "payload": payloads}
    )
    ds = ray.data.from_pandas(df).repartition(2)
    out = multimodal.payload_dedup_groups(ds).to_pandas()
    assert len(out) == 1
    assert out["n_copies"].iloc[0] == 3
    assert out["keep_id"].iloc[0] == "m-000000"
    exp_md5 = hashlib.md5(b"\x00\x01".hex().upper().encode()).hexdigest()
    assert out["payload_md5"].iloc[0] == exp_md5


def test_late_arrivals_watermark_rule():
    from ehr_relation_extraction_ray.pipelines.relational import (
        events_late_arrivals,
    )

    # build a tiny parquet events table under /tmp with a crafted
    # out-of-order pattern once jittered: event 6 (delay 6*30=180s)
    # arrives after events 7..9 advanced the watermark far past it
    import os
    import tempfile

    import pyarrow as pa
    import pyarrow.parquet as pq

    base = pd.Timestamp("2026-01-01")
    n = 10
    df = pd.DataFrame(
        {
            "event_id": np.arange(n, dtype=np.int64),
            "user_id": np.zeros(n, dtype=np.int64),
            "ts": [base + pd.Timedelta(seconds=40 * i) for i in range(n)],
            "event_type": ["x"] * n,
            "value": np.zeros(n),
        }
    )
    d = tempfile.mkdtemp(dir="/tmp")
    pq.write_table(pa.Table.from_pandas(df, preserve_index=False),
                   os.path.join(d, "events.parquet"))

    out = events_late_arrivals(d)

    # serial recompute of the same rule
    tus = df["ts"].astype("datetime64[us]").astype("int64").to_numpy()
    atus = tus + (df["event_id"].to_numpy() % 7) * 30_000_000
    order = np.lexsort((df["event_id"].to_numpy(), atus))
    seen_max = None
    exp = []
    for i in order:
        if seen_max is not None and seen_max - tus[i] > 60_000_000:
            exp.append((int(df["event_id"][i]),
                        (seen_max - tus[i] - 60_000_000) // 1_000_000))
        seen_max = tus[i] if seen_max is None else max(seen_max, tus[i])
    assert len(exp) > 0  # the pattern must actually produce late events
    assert list(out["event_id"]) == [e for e, _ in exp]
    assert list(out["late_by_s"]) == [s for _, s in exp]


def test_user_hll_partition_invariance(tmp_path):
    import os

    import pyarrow as pa
    import pyarrow.parquet as pq

    from ehr_relation_extraction_ray.functions.sketch import (
        hll_estimate, hll_registers,
    )
    from ehr_relation_extraction_ray.pipelines.relational import (
        events_user_hll,
    )

    rng = np.random.default_rng(3)
    n = 4000
    df = pd.DataFrame(
        {
            "event_id": np.arange(n, dtype=np.int64),
            "user_id": rng.integers(0, 700, n).astype(np.int64),
            "event_type": [f"t{i % 3}" for i in range(n)],
            "ts": pd.Timestamp("2026-01-01"),
            "value": np.zeros(n),
        }
    )
    pq.write_table(pa.Table.from_pandas(df, preserve_index=False),
                   os.path.join(tmp_path, "events.parquet"))
    out = events_user_hll(str(tmp_path))
    assert len(out) == 3
    for _, row in out.iterrows():
        users = df.loc[df["event_type"] == row["event_type"], "user_id"]
        exact = users.nunique()
        serial = round(hll_estimate(hll_registers(users.to_numpy())), 2)
        # distributed merge == serial fold (max is order/partition free)
        assert row["n_users_est"] == serial
        # and the estimate is within HLL's expected error of the truth
        assert abs(row["n_users_est"] - exact) / exact < 0.1


def test_pareto_sweep_vs_bruteforce():
    from ehr_relation_extraction_ray.pipelines.relational import _pareto_sweep

    rng = np.random.default_rng(11)
    df = pd.DataFrame(
        {
            "event_id": np.arange(200, dtype=np.int64),
            "value": rng.integers(0, 12, 200).astype("float64"),
            "tus": rng.integers(0, 15, 200).astype("int64"),
        }
    )
    got = set(_pareto_sweep(df)["event_id"])
    exp = set()
    pts = df[["value", "tus"]].to_numpy()
    for i in range(len(df)):
        dominated = False
        for j in range(len(df)):
            if i == j:
                continue
            v2, t2 = pts[j]
            v1, t1 = pts[i]
            if v2 >= v1 and t2 >= t1 and (v2 > v1 or t2 > t1):
                dominated = True
                break
        if not dominated:
            exp.add(int(df["event_id"][i]))
    assert got == exp
    # combiner property: frontier(union of split frontiers) == frontier
    half = len(df) // 2
    f1 = _pareto_sweep(df.iloc[:half])
    f2 = _pareto_sweep(df.iloc[half:])
    merged = _pareto_sweep(pd.concat([f1, f2], ignore_index=True))
    assert set(merged["event_id"]) == exp


def test_upsert_apply_b_wins():
    from ehr_relation_extraction_ray.stages import diff as diff_mod

    a = pd.DataFrame({"doc_id": [1, 2, 3], "h": ["a1", "a2", "a3"]})
    b = pd.DataFrame({"doc_id": [2, 4], "h": ["B2", "B4"]})
    out = (
        diff_mod.upsert_apply(
            ray.data.from_pandas(a).repartition(2),
            ray.data.from_pandas(b).repartition(2),
        )
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    assert list(out["doc_id"]) == [1, 2, 3, 4]
    assert list(out["h"]) == ["a1", "B2", "a3", "B4"]


def test_kcore_matches_iterated_deletion():
    from ehr_relation_extraction_ray.stages.graph import kcore

    rng = np.random.default_rng(7)
    n_nodes = 24
    pairs = set()
    for _ in range(60):
        a, b = rng.integers(0, n_nodes, 2)
        if a != b:
            pairs.add((f"n{min(a, b):02d}", f"n{max(a, b):02d}"))
    edges = pd.DataFrame(list(pairs), columns=["ent_a", "ent_b"])
    got = dict(zip(kcore(edges)["node"], kcore(edges)["core"]))

    # independent iterated-deletion reference
    adj = {}
    for a, b in pairs:
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    exp = {v: 0 for v in adj}
    k = 1
    alive = set(adj)
    while alive:
        sub = set(alive)
        while True:
            drop = {v for v in sub
                    if len(adj[v] & sub) < k}
            if not drop:
                break
            sub -= drop
        for v in sub:
            exp[v] = k
        alive = sub
        k += 1
    assert got == exp


def test_turn_dedup_counts_consecutive_only(tmp_path, monkeypatch):
    import os

    import pyarrow as pa
    import pyarrow.parquet as pq

    from ehr_relation_extraction_ray.pipelines import queries as q

    rows = pd.DataFrame(
        {
            "conv_id": ["c1"] * 4 + ["c2"] * 3,
            "turn_idx": [0, 1, 2, 3, 0, 1, 2],
            # c1: 'x','x','y','x' -> 1 consecutive dup (not the last x)
            # c2: 'a','b','a' -> 0
            "text": ["x", "x", "y", "x", "a", "b", "a"],
            "role": ["user"] * 7,
            "tool": [""] * 7,
            "ts": pd.Timestamp("2026-01-01"),
        }
    )
    tp = os.path.join(tmp_path, "transcripts.parquet")
    pq.write_table(pa.Table.from_pandas(rows, preserve_index=False), tp)
    monkeypatch.setattr(q.synth, "transcripts_path", lambda sf_dir: tp)

    out = q.kg_turn_dedup(str(tmp_path))
    assert list(out["conv_id"]) == ["c1"]
    assert list(out["n_dropped"]) == [1]


def test_ams_f2_accuracy_and_mergeability():
    from ehr_relation_extraction_ray.functions.sketch import (
        ams_f2_estimate, ams_f2_partial,
    )

    rng = np.random.default_rng(5)
    toks = [f"w{i}" for i in range(300)]
    counts = {t: int(rng.integers(1, 50)) for t in toks}
    exact = sum(c * c for c in counts.values())

    # mergeability: split counts into 3 partial folds, sum the dots
    items = list(counts.items())
    dots = sum(
        ams_f2_partial(dict(items[i::3])) for i in range(3)
    )
    assert (dots == ams_f2_partial(counts)).all()

    est = ams_f2_estimate(dots)
    assert abs(est - exact) / exact < 0.5  # AMS 64-estimator tolerance


def test_phash_near_dup_recall_vs_exhaustive(ray_session):
    import numpy as np
    import pyarrow as pa
    import ray.data

    from ehr_relation_extraction_ray.stages.multimodal import (
        MediaFeaturizer,
        perceptual_hash,
        phash_near_dup_pairs,
        synth_media,
    )

    t = synth_media(40)
    # inject exact copies (hamming 0) and 1-byte flips
    ids = t["media_id"].to_pylist()
    payloads = t["payload"].to_pylist()
    extra_ids, extra_p = [], []
    for i in (0, 7, 14):
        extra_ids.append(ids[i] + "-dup")
        extra_p.append(payloads[i])
        b = bytearray(payloads[i])
        b[1] = (b[1] + 3) % 256
        extra_ids.append(ids[i] + "-near")
        extra_p.append(bytes(b))
    tab = pa.table(
        {
            "media_id": pa.array(ids + extra_ids, pa.string()),
            "payload": pa.array(payloads + extra_p, pa.large_binary()),
        }
    )
    got = phash_near_dup_pairs(ray.data.from_arrow(tab), max_hamming=2)

    feat = MediaFeaturizer(decoder="fake")
    ph = {
        m: perceptual_hash(feat._fake_decode(p))
        for m, p in zip(tab["media_id"].to_pylist(), tab["payload"].to_pylist())
    }
    allids = sorted(ph)
    want = sorted(
        (a, b, bin(ph[a] ^ ph[b]).count("1"))
        for i, a in enumerate(allids)
        for b in allids[i + 1:]
        if bin(ph[a] ^ ph[b]).count("1") <= 2
    )
    assert sorted(zip(got["media_a"], got["media_b"], got["hamming"])) == want
    # exact copies must be present at hamming 0
    found0 = {(a, b) for a, b, h in want if h == 0}
    for i in (0, 7, 14):
        assert (ids[i], ids[i] + "-dup") in found0
