"""Co-occurrence counts, triangle enumeration, and substring dedup vs
naive serial implementations."""

import hashlib
import itertools

import pandas as pd

import ray.data

from ehr_relation_extraction_ray.stages import dedupe, graph


# -- cooccurrence_counts ------------------------------------------------------


def _ment_ds(rows):
    df = pd.DataFrame(rows, columns=["doc_id", "ent_type", "text"])
    df["ent_id"] = [f"T{i}" for i in range(len(df))]
    df["start"] = 0
    df["end"] = 1
    return ray.data.from_pandas(df)


def _serial_cooc(rows):
    ents_by_doc = {}
    for doc, t, s in rows:
        ents_by_doc.setdefault(doc, set()).add(f"{t}:{s}")
    singles, pairs = {}, {}
    for es in ents_by_doc.values():
        for e in es:
            singles[e] = singles.get(e, 0) + 1
        for a, b in itertools.combinations(sorted(es), 2):
            pairs[(a, b)] = pairs.get((a, b), 0) + 1
    return singles, pairs


def test_cooccurrence_counts_match_serial():
    rows = [
        ("d1", "Drug", "aspirin"), ("d1", "Drug", "aspirin"),  # dup mention
        ("d1", "ADE", "rash"), ("d1", "Dosage", "5 mg"),
        ("d2", "Drug", "aspirin"), ("d2", "ADE", "rash"),
        ("d3", "Drug", "ibuprofen"),
    ]
    out = graph.cooccurrence_counts(_ment_ds(rows))
    singles, pairs = _serial_cooc(rows)
    got_singles = {
        r.ent_a: r.n for r in out[~out["is_pair"]].itertuples()
    }
    got_pairs = {
        (r.ent_a, r.ent_b): r.n for r in out[out["is_pair"]].itertuples()
    }
    assert got_singles == singles
    assert got_pairs == pairs


def test_cooccurrence_doc_complete_path_equal():
    # the zero-shuffle doc_complete path must equal the partitioned path
    # exactly — valid whenever blocks hold whole documents (rows here are
    # grouped per doc and never straddle the from_pandas block)
    rows = [
        (f"d{i}", t, s)
        for i in range(15)
        for t, s in [("Drug", "a"), ("ADE", f"r{i % 4}"), ("Form", "tab")]
    ]
    shuffled = graph.cooccurrence_counts(_ment_ds(rows))
    fast = graph.cooccurrence_counts(_ment_ds(rows), doc_complete=True)
    pd.testing.assert_frame_equal(shuffled, fast)


def test_cooccurrence_parallelism_invariance():
    rows = [
        (f"d{i}", t, s)
        for i in range(20)
        for t, s in [("Drug", "a"), ("ADE", f"r{i % 3}"), ("Form", "tab")]
    ]
    base = graph.cooccurrence_counts(_ment_ds(rows))
    resharded = graph.cooccurrence_counts(_ment_ds(rows).repartition(7))
    pd.testing.assert_frame_equal(base, resharded)


# -- triangles ---------------------------------------------------------------


def _serial_triangles(edges):
    und = {tuple(sorted(e)) for e in edges if e[0] != e[1]}
    counts = {}
    for a, b, c in itertools.combinations(sorted({n for e in und for n in e}), 3):
        if {(a, b), (a, c), (b, c)} <= und:
            for n in (a, b, c):
                counts[n] = counts.get(n, 0) + 1
    return counts


def test_triangles_match_serial_enumeration():
    edges = [
        ("a", "b"), ("b", "c"), ("a", "c"),  # triangle abc
        ("c", "d"), ("b", "d"),              # triangle bcd
        ("e", "f"),                          # no triangle
        ("b", "a"),                          # duplicate reversed edge
        ("g", "g"),                          # self loop ignored
    ]
    df = pd.DataFrame(edges, columns=["ent_a", "ent_b"])
    out = graph.triangles(df)
    assert dict(zip(out["node"], out["n_triangles"])) == _serial_triangles(edges)


def test_triangles_empty():
    df = pd.DataFrame({"ent_a": ["x"], "ent_b": ["y"]})
    out = graph.triangles(df)
    assert len(out) == 0
    assert list(out.columns) == ["node", "n_triangles"]


# -- dup_shingle_partials ----------------------------------------------------


def _serial_dup_shingles(docs, k=8):
    sh = {
        d: {" ".join(w[i : i + k]) for i in range(len(w) - k + 1)}
        for d, t in docs.items()
        for w in [t.lower().split()]
        if len(w) >= k
    }
    counts = {}
    for d, ss in sh.items():
        n = sum(1 for s in ss if any(s in o for od, o in sh.items() if od != d))
        if n:
            counts[d] = n
    return counts


def test_dup_shingle_counts_match_serial():
    boiler = "this is the standard boilerplate footer of eight words"
    docs = {
        "a": f"unique alpha text one two three four five six {boiler}",
        "b": f"different beta words seven eight nine ten eleven {boiler}",
        "c": "completely unrelated short document with nine distinct words here",
        "d": "tiny doc",  # < 8 words: contributes nothing
    }
    ds = ray.data.from_pandas(
        pd.DataFrame({"doc_id": list(docs), "text": list(docs.values())})
    )
    parts = dedupe.dup_shingle_partials(ds, k=8).to_pandas()
    got = parts.groupby("doc_id")["n"].sum().to_dict()
    assert got == _serial_dup_shingles(docs, k=8)


def test_dup_shingle_block_split_invariance():
    # a doc's shingles may span partitions only by hash of shingle, never
    # by input block boundaries: reshard and compare
    docs = {f"d{i}": ("common phrase " * 6 + f"tail {i}") for i in range(12)}
    df = pd.DataFrame({"doc_id": list(docs), "text": list(docs.values())})
    a = (
        dedupe.dup_shingle_partials(ray.data.from_pandas(df), k=8)
        .to_pandas().groupby("doc_id")["n"].sum().to_dict()
    )
    b = (
        dedupe.dup_shingle_partials(ray.data.from_pandas(df).repartition(5), k=8)
        .to_pandas().groupby("doc_id")["n"].sum().to_dict()
    )
    assert a == b == _serial_dup_shingles(docs, k=8)
