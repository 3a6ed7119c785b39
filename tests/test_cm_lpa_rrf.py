"""Count-Min sketch, label propagation, and RRF fusion operators."""

import numpy as np
import pandas as pd

from ehr_relation_extraction_ray.functions.sketch import cm_partial, cm_query
from ehr_relation_extraction_ray.pipelines import queries
from ehr_relation_extraction_ray.stages.graph import label_propagation

SF = "/root/testdata/sf0.001"


def test_cm_linearity_and_overestimate():
    rng = np.random.default_rng(3)
    toks = [f"t{i}" for i in range(500)]
    c1 = {t: int(rng.integers(1, 50)) for t in toks[:300]}
    c2 = {t: int(rng.integers(1, 50)) for t in toks[200:]}
    total = dict(c1)
    for t, c in c2.items():
        total[t] = total.get(t, 0) + c
    # block partials SUM to the global fold (exact int linearity)
    assert (cm_partial(c1) + cm_partial(c2) == cm_partial(total)).all()
    # point queries never underestimate
    est = cm_query(cm_partial(total), toks)
    true = np.array([total.get(t, 0) for t in toks])
    assert (est >= true).all()
    # with w=256 >> 500 distinct tokens there ARE collisions; the error
    # bound eps = e/w of N must still hold for the vast majority
    n = true.sum()
    assert ((est - true) <= np.e / 256 * n).mean() > 0.95


def test_docs_cm_profile_audits_exact(ray_session):
    got = queries.docs_cm_profile(SF)
    texts = pd.read_parquet(f"{SF}/documents.parquet", columns=["text"])["text"]
    vc = pd.Series(
        [w for t in texts for w in str(t).lower().split() if w]
    ).value_counts()
    top = vc.reset_index()
    top.columns = ["token", "n"]
    top = top.sort_values(["n", "token"], ascending=[False, True]).head(10)
    assert got["token"].tolist() == top["token"].tolist()
    assert got["n_exact"].tolist() == top["n"].tolist()
    assert (got["n_cm"] >= got["n_exact"]).all()


def test_label_propagation_two_cliques():
    # two 4-cliques bridged by one weak edge -> two communities, each
    # named after its lexicographically smallest member
    a = [f"a{i}" for i in range(4)]
    b = [f"b{i}" for i in range(4)]
    rows = []
    for grp in (a, b):
        for i in range(4):
            for j in range(i + 1, 4):
                rows.append((grp[i], grp[j], 10))
    rows.append(("a0", "b0", 1))  # weak bridge
    edges = pd.DataFrame(rows, columns=["subj", "obj", "n"])
    out = label_propagation(edges)
    comm = dict(zip(out["node"], out["community"]))
    assert len({comm[x] for x in a}) == 1
    assert len({comm[x] for x in b}) == 1
    assert comm["a1"] == "a0" and comm["b1"] == "b0"
    # deterministic: rerun bit-identical
    pd.testing.assert_frame_equal(out, label_propagation(edges))


def test_label_propagation_empty():
    out = label_propagation(pd.DataFrame(columns=["subj", "obj", "n"]))
    assert list(out.columns) == ["node", "community"] and len(out) == 0


def test_docs_rrf_fusion_matches_naive(ray_session):
    got = queries.docs_rrf_fusion(SF)
    docs = pd.read_parquet(f"{SF}/documents.parquet")
    # naive BM25 over the whole corpus
    toks = docs["text"].str.lower().str.split()
    dl = toks.map(lambda ws: sum(1 for w in ws if w))
    n_docs, avgdl = len(docs), dl.mean()
    score = np.zeros(n_docs)
    hit = np.zeros(n_docs, dtype=bool)
    for term in ["spark", "window", "join"]:
        tf = toks.map(lambda ws: sum(1 for w in ws if w == term)).to_numpy(float)
        df = int((tf > 0).sum())
        idf = np.log((n_docs - df + 0.5) / (df + 0.5) + 1.0)
        score += idf * tf * 2.2 / np.maximum(tf + 1.2 * (0.25 + 0.75 * dl / avgdl), 1e-12)
        hit |= tf > 0
    ra = (
        pd.DataFrame({"doc_id": docs["doc_id"], "s": np.round(score, 6)})[hit]
        .sort_values(["s", "doc_id"], ascending=[False, True]).head(50)
    )
    ra["r"] = np.arange(1, len(ra) + 1)
    rb = docs.sort_values(["n_chars", "doc_id"], ascending=[False, True]).head(50)
    rb = rb.assign(r=np.arange(1, len(rb) + 1))
    both = pd.concat([ra[["doc_id", "r"]], rb[["doc_id", "r"]]])
    both["rrf"] = 1.0 / (60.0 + both["r"])
    want = both.groupby("doc_id", as_index=False)["rrf"].sum()
    want["rrf"] = want["rrf"].round(6)
    want = (
        want.sort_values(["rrf", "doc_id"], ascending=[False, True])
        .head(10).reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(got, want, check_dtype=False)


def test_ranked_auc_properties():
    from ehr_relation_extraction_ray.stages.graph import ranked_auc

    assert ranked_auc([2.0, 3.0], [0.0, 1.0]) == 1.0
    assert ranked_auc([0.0, 1.0], [2.0, 3.0]) == 0.0
    assert abs(ranked_auc([1.0] * 3, [1.0] * 5) - 0.5) < 1e-12
    # complement symmetry: AUC(pos, neg) + AUC(neg, pos) == 1
    pos, neg = [0.9, 0.4, 0.4], [0.4, 0.1]
    assert abs(ranked_auc(pos, neg) + ranked_auc(neg, pos) - 1.0) < 1e-12


def test_kg_linkpred_auc_sane(ray_session):
    out = queries.kg_linkpred_auc(SF)
    assert list(out.columns) == ["n_pos", "n_neg", "auc"]
    assert len(out) == 1 and out["n_pos"].iloc[0] > 0 and out["n_neg"].iloc[0] > 0
    auc = out["auc"].iloc[0]
    assert 0.0 <= auc <= 1.0
    # deterministic: the holdout and scores are content-hashed, so a
    # rerun is bit-identical (no >0.5 claim — at sf0.001 the graph is
    # near-complete and the few non-edges are systematically unusual)
    pd.testing.assert_frame_equal(out, queries.kg_linkpred_auc(SF))
