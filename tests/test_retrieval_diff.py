"""Unit tests for the round-2 retrieval/diff operators: BM25 top-k,
SymSpell typo pairs, neighbor-Jaccard node similarity, snapshot diff."""

import math

import numpy as np
import pandas as pd
import pytest

import ray.data

from ehr_relation_extraction_ray.stages import dedupe, diff, graph, text_analysis


# -- BM25 --------------------------------------------------------------------


def _naive_bm25(texts, query, k1=1.2, b=0.75):
    toks = [[w for w in t.lower().split() if w] for t in texts]
    n = len(toks)
    avgdl = sum(len(t) for t in toks) / n
    scores = []
    for doc in toks:
        s = 0.0
        for term in query:
            df = sum(1 for d in toks if term in d)
            tf = doc.count(term)
            if tf == 0:
                continue
            idf = math.log((n - df + 0.5) / (df + 0.5) + 1.0)
            s += idf * tf * (k1 + 1) / (tf + k1 * (1 - b + b * len(doc) / avgdl))
        scores.append(round(s, 6))
    return scores


def test_bm25_matches_naive():
    texts = [
        "spark window join join join",
        "the quick brown fox",
        "window window spark",
        "join once",
        "",  # empty doc must still count toward n_docs/avgdl
        "spark " * 50,
    ]
    query = ["spark", "window", "join"]
    df = pd.DataFrame({"doc_id": np.arange(len(texts), dtype=np.int64),
                       "text": texts})
    ds = ray.data.from_pandas(df).repartition(3)
    got = text_analysis.bm25_topk(ds, query, k=4)

    exp_scores = _naive_bm25(texts, query)
    order = sorted(
        [i for i in range(len(texts)) if exp_scores[i] > 0],
        key=lambda i: (-exp_scores[i], i),
    )[:4]
    assert list(got["doc_id"]) == order
    for did, sc in zip(got["doc_id"], got["score"]):
        assert sc == pytest.approx(exp_scores[did], abs=1e-6)


def test_bm25_block_partials_respect_global_order():
    # many identical scores across blocks: composite (score, doc_id)
    # ordering must pick the smallest doc_ids deterministically
    texts = ["common term"] * 40
    df = pd.DataFrame({"doc_id": np.arange(40, dtype=np.int64), "text": texts})
    ds = ray.data.from_pandas(df).repartition(8)
    got = text_analysis.bm25_topk(ds, ["common"], k=5)
    assert list(got["doc_id"]) == [0, 1, 2, 3, 4]


# -- SymSpell typo pairs ------------------------------------------------------


def _full_lev(a, b):
    m, n = len(a), len(b)
    dp = list(range(n + 1))
    for i in range(1, m + 1):
        prev, dp[0] = dp[0], i
        for j in range(1, n + 1):
            cur = dp[j]
            dp[j] = min(dp[j] + 1, dp[j - 1] + 1,
                        prev + (a[i - 1] != b[j - 1]))
            prev = cur
    return dp[n]


def test_lev_leq_matches_full_dp():
    words = ["table", "tabel", "tble", "cable", "maple", "apple", "spark",
             "part", "past", "fast", "hash", "a", "ab", "ba", ""]
    for a in words:
        for b in words:
            for d in (1, 2, 3):
                exp = _full_lev(a, b)
                got = dedupe.lev_leq(a, b, d)
                assert got == (exp if exp <= d else None), (a, b, d)


def test_delete_variants_depth():
    vs = dedupe.delete_variants("abc", 2)
    assert vs == {"abc", "ab", "ac", "bc", "a", "b", "c"}


def test_typo_pairs_end_to_end():
    # tabel = transposition of table (lev 2); cable 1 sub; tble 1 del;
    # zebra unrelated
    docs = pd.DataFrame(
        {"text": ["table tabel zebra", "cable tble table", "zebra zebra"]}
    )
    ds = ray.data.from_pandas(docs).repartition(2)
    out = dedupe.typo_pairs(ds, max_d=2, min_len=3).to_pandas()
    got = {(a, b): d for a, b, d in zip(out["tok_a"], out["tok_b"], out["d"])}
    vocab = ["table", "tabel", "zebra", "cable", "tble"]
    exp = {}
    for i, a in enumerate(vocab):
        for b in vocab[i + 1:]:
            x, y = sorted((a, b))
            d = _full_lev(x, y)
            if d <= 2:
                exp[(x, y)] = d
    assert got == exp


# -- neighbor jaccard ---------------------------------------------------------


def test_neighbor_jaccard_matches_set_math():
    edges = pd.DataFrame(
        {"ent_a": ["a", "a", "b", "c", "d"],
         "ent_b": ["b", "c", "c", "d", "e"]}
    )
    ds = ray.data.from_pandas(edges).repartition(2)
    got = graph.neighbor_jaccard(ds, min_jaccard=0.0)

    adj = {}
    for a, b in zip(edges["ent_a"], edges["ent_b"]):
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    exp = {}
    nodes = sorted(adj)
    for i, x in enumerate(nodes):
        for y in nodes[i + 1:]:
            inter = len(adj[x] & adj[y])
            if inter:
                exp[(x, y)] = round(inter / len(adj[x] | adj[y]), 6)
    got_map = {(a, b): j for a, b, j in
               zip(got["ent_a"], got["ent_b"], got["jaccard"])}
    assert got_map == exp


def test_neighbor_jaccard_duplicate_edges_are_distinct():
    edges = pd.DataFrame(
        {"ent_a": ["a", "a", "b", "b"], "ent_b": ["b", "b", "c", "c"]}
    )
    ds = ray.data.from_pandas(edges)
    got = graph.neighbor_jaccard(ds, min_jaccard=0.0)
    # N(a)={b}, N(c)={b}: jaccard(a,c)=1
    assert list(got["ent_a"]) == ["a"]
    assert list(got["ent_b"]) == ["c"]
    assert got["jaccard"].iloc[0] == 1.0


# -- snapshot diff -------------------------------------------------------------


def test_snapshot_diff_classification():
    a = pd.DataFrame({"doc_id": [1, 2, 3, 4], "h": ["h1", "h2", "h3", "h4"]})
    b = pd.DataFrame({"doc_id": [2, 3, 5], "h": ["h2", "CHANGED", "h5"]})
    out = (
        diff.snapshot_diff(
            ray.data.from_pandas(a).repartition(2),
            ray.data.from_pandas(b).repartition(2),
        )
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    assert list(out["doc_id"]) == [1, 3, 4, 5]
    assert list(out["change"]) == ["removed", "changed", "removed", "added"]


def test_snapshot_diff_identical_snapshots_empty():
    a = pd.DataFrame({"doc_id": [1, 2], "h": ["x", "y"]})
    out = diff.snapshot_diff(
        ray.data.from_pandas(a), ray.data.from_pandas(a.copy())
    ).to_pandas()
    assert len(out) == 0


def test_term_variant_pairs_group_scoping():
    # same surfaces in two groups: pairs must not cross groups
    terms = pd.DataFrame(
        {"ent_type": ["Drug", "Drug", "Drug", "Dose", "Dose"],
         "term": ["aspirin", "asprin", "aspirin", "one tab", "one tabs"]}
    )
    ds = ray.data.from_pandas(terms).repartition(2)
    out = (
        dedupe.term_variant_pairs(ds, group_col="ent_type", max_d=2)
        .to_pandas()
        .sort_values(["ent_type", "term_a"])
        .reset_index(drop=True)
    )
    assert list(out["ent_type"]) == ["Dose", "Drug"]
    assert list(out["term_a"]) == ["one tab", "aspirin"]
    assert list(out["term_b"]) == ["one tabs", "asprin"]
    assert list(out["d"]) == [1, 1]
