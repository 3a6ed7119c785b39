"""Unit tests for corpus-fit text-analysis operators (LM scoring)."""

import math

import numpy as np
import pandas as pd
import pytest

import ray.data

from ehr_relation_extraction_ray.stages import text_analysis


def test_corpus_term_freq_combiner(ray_session):
    docs = ray.data.from_pandas(
        pd.DataFrame(
            {"doc_id": [1, 2], "text": ["a b a", "b  c\nA"]}
        )
    ).repartition(2)
    freq = (
        text_analysis.corpus_term_freq(docs)
        .to_pandas()
        .sort_values("term")
        .reset_index(drop=True)
    )
    assert freq["term"].tolist() == ["a", "b", "c"]
    assert freq["c"].tolist() == [3, 2, 1]


def test_unigram_logprob_hand_computed(ray_session):
    """corpus = 'a b a' + 'b': p(a)=0.5, p(b)=0.5 ... verify means."""
    docs = ray.data.from_pandas(
        pd.DataFrame({"doc_id": [1, 2, 3], "text": ["a b a", "b", "   "]})
    )
    out = (
        text_analysis.unigram_logprob(docs)
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    # doc 3 is whitespace-only -> absent
    assert out["doc_id"].tolist() == [1, 2]
    assert out["n_tokens"].tolist() == [3, 1]
    # counts: a=2, b=2, total=4 -> p(a)=p(b)=1/2
    assert out["avg_logprob"][0] == pytest.approx(math.log(0.5))
    assert out["avg_logprob"][1] == pytest.approx(math.log(0.5))


def test_unigram_logprob_parallelism_invariant(ray_session):
    rng = np.random.default_rng(3)
    texts = [
        " ".join(rng.choice(["x", "y", "z", "w", "quux"], size=rng.integers(1, 30)))
        for _ in range(60)
    ]
    df = pd.DataFrame({"doc_id": np.arange(60, dtype="int64"), "text": texts})
    outs = []
    for nparts in (1, 6):
        ds = ray.data.from_pandas(df).repartition(nparts)
        outs.append(
            text_analysis.unigram_logprob(ds)
            .to_pandas()
            .sort_values("doc_id")
            .reset_index(drop=True)
        )
    pd.testing.assert_frame_equal(outs[0], outs[1])


def test_repetition_signals_hand_computed(ray_session):
    docs = ray.data.from_pandas(
        pd.DataFrame(
            {
                "doc_id": [1, 2, 3],
                "text": [
                    "same line\nsame line\nother line",  # 1 dup of 3 lines
                    "go go go go",  # top bigram 'go go' = 3/3
                    "one",  # single word, single line
                ],
            }
        )
    )
    out = (
        text_analysis.repetition_signals(docs)
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    assert out["n_lines"].tolist() == [3, 1, 1]
    assert out["dup_line_frac"][0] == pytest.approx(1 - 2 / 3)
    assert out["dup_line_frac"][1] == 0.0
    # doc 1: 6 words -> 5 bigrams, "same line" occurs twice -> 2/5
    assert out["top_bigram_frac"].tolist() == pytest.approx([2 / 5, 1.0, 0.0])


def test_misra_gries_guarantee_and_merge():
    """Any term with count > n/(capacity+1) survives reduction and merge;
    kept counts underestimate by at most that bound."""
    from collections import Counter

    from ehr_relation_extraction_ray.functions.sketch import (
        misra_gries,
        misra_gries_merge,
    )

    rng = np.random.default_rng(17)
    # zipf-ish stream over a vocabulary much larger than capacity
    stream = [f"t{int(z)}" for z in rng.zipf(1.3, size=20000) if z < 5000]
    true = Counter(stream)
    n = len(stream)
    cap = 64
    mg = misra_gries(dict(true), cap)
    assert len(mg) <= cap
    bound = n / (cap + 1)
    for t, c in true.items():
        if c > bound:
            assert t in mg
            assert 0 < mg[t] <= c
    # merging per-chunk summaries keeps the same guarantee
    chunks = [stream[i::4] for i in range(4)]
    merged = misra_gries_merge(
        [misra_gries(dict(Counter(ch)), cap) for ch in chunks], cap
    )
    for t, c in true.items():
        if c > 2 * bound:  # merge doubles the underestimate bound
            assert t in merged


def test_heavy_hitter_terms_exact_topk(ray_session):
    """Two-pass heavy hitters returns the EXACT top-k with exact counts
    on a skewed corpus, at small capacity, any parallelism."""
    from collections import Counter

    rng = np.random.default_rng(23)
    texts = [
        " ".join(f"w{int(z)}" for z in rng.zipf(1.5, size=50) if z < 3000)
        for _ in range(200)
    ]
    true = Counter(w for t in texts for w in t.split())
    want = sorted(true.items(), key=lambda kv: (-kv[1], kv[0]))[:5]
    ds = ray.data.from_pandas(pd.DataFrame({"text": texts})).repartition(6)
    got = text_analysis.heavy_hitter_terms(ds, k=5, capacity=128)
    assert list(zip(got["term"], got["c"])) == want


def test_normalize_hand_cases(ray_session):
    docs = ray.data.from_pandas(
        pd.DataFrame(
            {
                "doc_id": [1, 2, 3],
                "text": [
                    "  Call 555-1234\tNOW!!  ",
                    "no digits here",
                    "A\n\nB  C\t7",
                ],
            }
        )
    )
    out = (
        text_analysis.normalize(docs)
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    assert list(out["norm_text"]) == [
        "call 000-0000 now!!",
        "no digits here",
        "a b c 0",
    ]
    assert list(out["n_digits"]) == [7, 0, 1]


def test_budget_per_lang_inclusive_cutoff(ray_session):
    """Per-lang budget selection: kept chars never exceed the 60% budget,
    and adding the next-ranked doc would exceed it (maximality)."""
    from ehr_relation_extraction_ray.pipelines.queries import docs_budget_per_lang

    sf = "/root/testdata/sf0.001"
    got = docs_budget_per_lang(sf).set_index("lang")
    docs = pd.read_parquet(
        f"{sf}/documents.parquet", columns=["doc_id", "lang", "n_chars"]
    )
    for lang, sub in docs.groupby("lang"):
        budget = int(sub["n_chars"].sum() * 6 // 10)
        sub = sub.sort_values(["n_chars", "doc_id"], ascending=[False, True])
        cum = sub["n_chars"].cumsum()
        kept = sub[cum <= budget]
        assert got.loc[lang, "n_docs"] == len(kept)
        assert got.loc[lang, "chars_kept"] == int(kept["n_chars"].sum())
        assert int(kept["n_chars"].sum()) <= budget
        nxt = sub[cum > budget]
        if len(nxt):
            assert int(kept["n_chars"].sum()) + int(nxt.iloc[0]["n_chars"]) > budget


def test_docs_entropy_hand_cases(ray_session, tmp_path):
    """docs_entropy on a hand-built documents.parquet: zero entropy for
    repeated tokens, ln(k) for uniform, empty docs dropped, case folded."""
    from ehr_relation_extraction_ray.pipelines.queries import docs_entropy

    pd.DataFrame(
        {
            "doc_id": [1, 2, 3, 4],
            "text": ["a a a a", "a b c d", "", "A a B b"],
        }
    ).to_parquet(tmp_path / "documents.parquet")
    out = docs_entropy(str(tmp_path)).set_index("doc_id")
    assert out.loc[1, "entropy"] == 0.0
    assert abs(out.loc[2, "entropy"] - np.log(4)) < 1e-5
    assert 3 not in out.index  # empty doc emits no row
    assert abs(out.loc[4, "entropy"] - np.log(2)) < 1e-5
    assert list(out["n_tokens"]) == [4, 4, 4]


def test_lang_divergence_bounds_and_separation(ray_session):
    """JSD in [0, ln 2]; disjoint-vocabulary languages hit the maximum,
    identically-distributed ones hit ~0."""
    docs = ray.data.from_pandas(
        pd.DataFrame(
            {
                "lang": ["en"] * 4 + ["de"] * 4,
                "text": ["apple banana cherry"] * 4 + ["apfel banane kirsche"] * 4,
            }
        )
    ).repartition(3)
    out = text_analysis.lang_divergence(docs).set_index("lang")
    assert abs(out.loc["en", "jsd"] - np.log(2)) < 1e-6  # disjoint vocab
    assert abs(out.loc["de", "jsd"] - np.log(2)) < 1e-6

    same = ray.data.from_pandas(
        pd.DataFrame(
            {
                "lang": ["en"] * 3 + ["de"] * 3,
                "text": ["x y z"] * 6,
            }
        )
    )
    out2 = text_analysis.lang_divergence(same).set_index("lang")
    assert (out2["jsd"] < 1e-9).all()


def test_boilerplate_ngrams_planted(ray_session):
    """A planted 8-gram template shared by 4 docs is flagged with df=4;
    unique content is not flagged; parallelism-invariant."""
    template = "this exact template phrase repeats across many documents here"
    rng_texts = [f"unique words {i} " * 10 + template for i in range(4)]
    rng_texts += [f"totally unrelated content {i} " * 12 for i in range(6)]
    docs_df = pd.DataFrame(
        {"doc_id": np.arange(10, dtype=np.int64), "text": rng_texts}
    )
    for nparts in (2, 5):
        ds = ray.data.from_pandas(docs_df).repartition(nparts)
        out = (
            text_analysis.boilerplate_ngrams(ds, min_docs=4, k=8)
            .to_pandas()
            .sort_values("ngram")
            .reset_index(drop=True)
        )
        assert (out["df"] >= 4).all()
        assert any(template in g or g in template for g in out["ngram"])
        assert not any("unrelated" in g for g in out["ngram"])


def test_bpe_merges_hand_built():
    """Textbook BPE on a tiny corpus: 'ab' x3 + 'abc' x1 gives merges
    (a,b,4) -> (ab,</w>,3) -> lexicographic tiebreak (ab,c,1) ->
    (abc,</w>,1), then the pair space is exhausted before n_merges."""
    import ray.data

    from ehr_relation_extraction_ray.stages.text_analysis import bpe_merges

    docs = ray.data.from_items([{"text": "ab ab ab"}, {"text": "abc"}])
    out = bpe_merges(docs, n_merges=6)
    got = list(out.itertuples(index=False, name=None))
    assert got == [
        (0, "a", "b", 4),
        (1, "ab", "</w>", 3),
        (2, "ab", "c", 1),
        (3, "abc", "</w>", 1),
    ]


def test_bpe_incremental_matches_naive_on_random_corpus():
    """The incremental pair-bookkeeping merge loop must equal the naive
    recount-everything loop on a corpus large enough to exercise retract/
    re-add paths (repeated chars, overlapping pairs, many words)."""
    import ray.data

    from ehr_relation_extraction_ray.stages.text_analysis import bpe_merges

    rng = np.random.default_rng(11)
    alpha = list("abcde")
    texts = [
        " ".join(
            "".join(rng.choice(alpha, size=rng.integers(1, 7)))
            for _ in range(rng.integers(3, 12))
        )
        for _ in range(60)
    ]
    docs = ray.data.from_items([{"text": t} for t in texts])
    got = bpe_merges(docs, n_merges=15)

    # naive reference: full recount each iteration
    from collections import Counter

    wc: Counter = Counter()
    for t in texts:
        for w in t.lower().split():
            wc[w] += 1
    seqs = {w: [*w, "</w>"] for w in wc}
    expect = []
    for rank in range(15):
        pairs: Counter = Counter()
        for w, syms in seqs.items():
            for p in zip(syms, syms[1:]):
                pairs[p] += wc[w]
        if not pairs:
            break
        (a, b), cnt = min(pairs.items(), key=lambda kv: (-kv[1], kv[0]))
        expect.append((rank, a, b, cnt))
        for w, syms in seqs.items():
            ns, i = [], 0
            while i < len(syms):
                if i + 1 < len(syms) and syms[i] == a and syms[i + 1] == b:
                    ns.append(a + b)
                    i += 2
                else:
                    ns.append(syms[i])
                    i += 1
            seqs[w] = ns
    assert list(got.itertuples(index=False, name=None)) == expect


def test_hash_embedder_deterministic_and_parallelism_invariant():
    """Feature-hashing embeddings: integer accumulation makes the vector
    exact and block-structure-invariant; same text -> same vector,
    zero-text -> zero vector (norm guard), registry slot resolves."""
    import ray.data

    from ehr_relation_extraction_ray import registry
    from ehr_relation_extraction_ray.stages.embed import HashEmbedder, embed_documents

    emb = HashEmbedder(dim=32)
    v1 = emb(["aspirin 325 mg daily", ""])
    v2 = emb(["aspirin 325 mg daily", ""])
    np.testing.assert_array_equal(v1, v2)
    assert abs(np.linalg.norm(v1[0]) - 1.0) < 1e-12
    np.testing.assert_array_equal(v1[1], np.zeros(32))

    rows = [{"doc_id": i, "text": f"tok{i} aspirin {'x' * (i % 3)}"} for i in range(40)]
    one = embed_documents(ray.data.from_items(rows)).to_pandas()
    many = embed_documents(
        ray.data.from_items(rows, override_num_blocks=13)
    ).to_pandas()
    one = one.sort_values("doc_id").reset_index(drop=True)
    many = many.sort_values("doc_id").reset_index(drop=True)
    for a, b in zip(one["embedding"], many["embedding"]):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    assert registry.get("embedder", "hash") is HashEmbedder
    try:
        registry.get("embedder", "elmo")()
        assert False
    except NotImplementedError:
        pass
