"""Unit tests: brat/ADE/CoNLL/RE-TSV sources, checkpointing, cosine dedup,
registry."""

import json
import os

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

import ray.data

from ehr_relation_extraction_ray import registry
from ehr_relation_extraction_ray.sources import ade, brat, conll, retsv
from ehr_relation_extraction_ray.stages import similarity
from ehr_relation_extraction_ray.state.checkpoint import CheckpointedPipeline

ANN = (
    "T1\tDrug 10 17\taspirin\n"
    "#1\tAnnotatorNotes comment line\n"
    "R1\tStrength-Drug Arg1:T2 Arg2:T1\n"  # forward ref -> backlog
    "T2\tStrength 18 23;24 29\t81 mg daily\n"
    "\n"
)


def test_brat_parse_backlog_and_multifragment():
    ments, edges = brat.parse_ann("doc1", ANN)
    by_id = {m["ent_id"]: m for m in ments}
    assert by_id["T1"]["ent_type"] == "Drug"
    assert (by_id["T1"]["start"], by_id["T1"]["end"]) == (10, 17)
    # multi-fragment range: first start .. last end (ehr.py:152-157)
    assert (by_id["T2"]["start"], by_id["T2"]["end"]) == (18, 29)
    assert len(edges) == 1
    e = edges[0]
    assert e["rel_type"] == "Strength-Drug"
    assert e["subj_id"] == "T2" and e["obj_id"] == "T1"
    assert e["subj_text"] == "81 mg daily" and e["obj_text"] == "aspirin"


def test_brat_dir_roundtrip(tmp_path):
    d = tmp_path / "brat"
    d.mkdir()
    (d / "doc1.txt").write_text("take some aspirin 81 mg daily ok")
    (d / "doc1.ann").write_text(ANN)
    (d / "doc2.txt").write_text("no annotations here")
    docs = brat.read_brat_dir(str(d))
    ments = docs.map_batches(brat.mentions_batch, batch_format="pyarrow").to_pandas()
    edges = docs.map_batches(brat.edges_batch, batch_format="pyarrow").to_pandas()
    assert set(ments["doc_id"]) == {"doc1"}
    assert len(ments) == 2 and len(edges) == 1
    # format_ann inverse contains the same T/R lines
    out = brat.format_ann(
        pa.Table.from_pandas(ments), pa.Table.from_pandas(edges)
    )
    assert "T1\tDrug 10 17\taspirin" in out
    assert "R1\tStrength-Drug Arg1:T2 Arg2:T1" in out


def test_ade_normalize_parity():
    rec = {
        "tokens": ["pt", "took", "aspirin", "and", "got", "severe", "rash"],
        "entities": [
            {"type": "Drug", "start": 2, "end": 3},
            {"type": "Adverse-Effect", "start": 5, "end": 7},
        ],
        "relations": [{"head": 1, "tail": 0}],
    }
    norm = ade.normalize_record("ade-0", rec)
    ments = {m["ent_id"]: m for m in norm["mentions"]}
    assert ments["T1"]["ent_type"] == "Drug"
    assert ments["T2"]["ent_type"] == "ADE"  # renamed (utils.py:380-381)
    # inclusive token end (utils.py:386); trailing space kept (utils.py:389-392)
    assert (ments["T2"]["tok_start"], ments["T2"]["tok_end"]) == (5, 6)
    assert ments["T2"]["text"] == "severe rash "
    assert norm["edges"][0]["rel_type"] == "ADE-Drug"
    assert norm["edges"][0]["subj_id"] == "T2"


def test_conll_labels_and_roundtrip(tmp_path):
    text = "start aspirin 81 mg now\n\nnext paragraph here"
    ments = [("Drug", 6, 13), ("Strength", 14, 19)]
    labels = conll.iob_labels(text, ments)
    assert labels == ["O", "B-DRUG", "B-STR", "I-STR", "O", "O", "O", "O"]
    block = conll.doc_block("d", text, ments, max_len=5, sep=" ")
    # windows blank-line separated; token label pairs preserved
    assert "aspirin B-DRUG" in block and "81 B-STR" in block
    seqs = conll.parse_conll(block)
    assert sum(len(s["tokens"]) for s in seqs) == 8
    # distributed write + read roundtrip
    blocks = ray.data.from_items([{"doc_id": "d", "conll": block}])
    out_dir = str(tmp_path / "conll")
    conll.write_conll(blocks, out_dir)
    back = conll.read_conll(out_dir).to_pandas()
    assert sum(len(t) for t in back["tokens"]) == 8
    assert list(back["labels"][0]).count("B-DRUG") == 1


def test_conll_attach_mentions_join():
    docs = ray.data.from_items(
        [
            {"doc_id": "a", "text": "one aspirin dose"},
            {"doc_id": "b", "text": "nothing here"},
        ]
    )
    ments = ray.data.from_items(
        [{"doc_id": "a", "ent_id": "T1", "ent_type": "Drug", "start": 4, "end": 11, "text": "aspirin"}]
    )
    joined = conll.attach_mentions(docs, ments).to_pandas().set_index("doc_id")
    assert list(joined.loc["a", "ment_types"]) == ["Drug"]
    assert joined.loc["b", "ment_types"] is None or (
        isinstance(joined.loc["b", "ment_types"], float)
    ) or len(joined.loc["b", "ment_types"]) == 0


def test_retsv_roundtrip(tmp_path):
    cand = ray.data.from_items(
        [
            {
                "doc_id": "d1", "win_idx": 0, "cand_idx": i,
                "masked_text": f"@Drug$ with @Strength$ case {i}",
                "label": i % 2,
            }
            for i in range(5)
        ]
    )
    for split, cols in [
        ("train", ("sentence", "label")),
        ("test", ("key", "sentence")),
        ("test_original", ("key", "sentence", "label")),
    ]:
        out = str(tmp_path / split)
        retsv.write_re_tsv(cand, out, split=split)
        back = retsv.read_re_tsv(out, split=split).to_pandas()
        assert len(back) == 5
        assert back["sentence"].str.contains("@Drug\\$").all()
        if "label" in cols:
            assert set(back["label"]) == {"0", "1"}
        if "key" in cols and split != "train":
            assert back["key"].str.startswith("d1:0:").all()


def test_checkpoint_resume_and_invalidation(tmp_path):
    base = str(tmp_path / "ckpt")
    calls = {"n": 0}

    def factory():
        calls["n"] += 1
        return ray.data.range(100)

    cp = CheckpointedPipeline(base)
    ds1 = cp.stage("numbers", factory, params="v1")
    assert ds1.count() == 100 and calls["n"] == 1
    # second pipeline run: cached, factory not called
    cp2 = CheckpointedPipeline(base)
    ds2 = cp2.stage("numbers", factory, params="v1")
    assert ds2.count() == 100 and calls["n"] == 1
    man = json.load(open(os.path.join(base, "numbers", "_manifest.json")))
    assert man["done"] and man["rows"] == 100
    # param change invalidates
    cp3 = CheckpointedPipeline(base)
    cp3.stage("numbers", factory, params="v2")
    assert calls["n"] == 2
    lin = cp3.flush_lineage().to_pandas()
    assert set(lin["stage"]) == {"numbers"}


def test_checkpoint_upstream_invalidation(tmp_path):
    base = str(tmp_path / "ckpt2")
    cp = CheckpointedPipeline(base)
    cp.stage("a", lambda: ray.data.range(10), params="x")
    calls = {"n": 0}

    def downstream():
        calls["n"] += 1
        return ray.data.range(5)

    cp.stage("b", downstream, upstream=["a"])
    assert calls["n"] == 1
    # rerun with identical upstream: cached
    cp2 = CheckpointedPipeline(base)
    cp2.stage("a", lambda: ray.data.range(10), params="x")
    cp2.stage("b", downstream, upstream=["a"])
    assert calls["n"] == 1
    # upstream changes -> downstream recomputes
    cp3 = CheckpointedPipeline(base)
    cp3.stage("a", lambda: ray.data.range(11), params="y")
    cp3.stage("b", downstream, upstream=["a"])
    assert calls["n"] == 2


def _dup_vectors(n=60, dim=16, seed=3):
    rng = np.random.default_rng(seed)
    m = rng.standard_normal((n, dim))
    # plant near-duplicates: 5 pairs with tiny noise
    for i in range(5):
        m[n - 1 - i] = m[i] + rng.standard_normal(dim) * 0.01
    ids = np.arange(n)
    return ray.data.from_arrow(
        pa.table(
            {
                "vec_id": pa.array(ids, pa.int64()),
                "embedding": pa.array(list(m.astype(float)), pa.list_(pa.float64())),
            }
        )
    ), m, ids


def test_cosine_dup_exact_matches_numpy():
    ds, m, ids = _dup_vectors()
    got = similarity.cosine_dup_pairs_exact(ds, threshold=0.95)
    mn = m / np.linalg.norm(m, axis=1, keepdims=True)
    sims = mn @ mn.T
    exp = [
        (int(a), int(b))
        for a in ids for b in ids
        if a < b and sims[a, b] >= 0.95
    ]
    assert sorted(zip(got["id_a"], got["id_b"])) == sorted(exp)
    assert len(exp) >= 5


def test_cosine_dup_lsh_finds_planted_pairs():
    ds, m, ids = _dup_vectors()
    exact = similarity.cosine_dup_pairs_exact(ds, threshold=0.95)
    lsh = similarity.cosine_dup_pairs_lsh(ds, threshold=0.95, nbits=64, bands=16)
    got = set(zip(lsh["id_a"], lsh["id_b"]))
    exp = set(zip(exact["id_a"], exact["id_b"]))
    assert got <= exp  # no false positives (verified pairs)
    assert len(got & exp) >= len(exp) * 0.8  # high recall on planted dups


def test_registry_surface():
    assert "dictionary" in registry.names("detector")
    assert "surrogate" in registry.names("scorer")
    tok = registry.get("tokenizer", "default")
    assert tok("a  b\nc") == ["a", "b", "c"]

    @registry.register("tokenizer", "upper")
    def upper_tok(s):
        return s.upper().split()

    assert registry.get("tokenizer", "upper")("a b") == ["A", "B"]
    with pytest.raises(KeyError):
        registry.get("detector", "nope")


def test_scorer_fast_path_equals_regex_scorer():
    """gap_text fast path (incl. stray-marker fallback) must reproduce the
    plain SurrogateScorer exactly."""
    import pyarrow as pa

    from ehr_relation_extraction_ray.functions.rescore import SurrogateScorer
    from ehr_relation_extraction_ray.stages.candidates import CandidateGenerator
    from ehr_relation_extraction_ray.stages.relations import RelationScorer

    clean = (
        "patient took aspirin 81 mg daily and developed rash after dose .\n\n"
    )
    stray = (
        "note @Ab$ stray marker since patient took aspirin 81 mg daily "
        "and developed rash .\n\n"
    )
    for text, expect_fallback in [(clean * 30, False), (stray * 30, True)]:
        batch = pa.table(
            {"doc_id": pa.array(["d"]), "text": pa.array([text], pa.large_string())}
        )
        cands = CandidateGenerator()(batch)
        assert cands.num_rows > 0
        assert (cands["gap_text"].null_count > 0) == expect_fallback
        fast = RelationScorer()._surrogate_preds(cands)
        plain = SurrogateScorer()(cands["masked_text"].to_pylist())
        assert (np.asarray(plain) == fast).all()


def test_export_pipelines(tmp_path):
    """NER CoNLL + RE TSV export over real synthesized docs (S5/S7, O4-O6)."""
    from ehr_relation_extraction_ray import synth
    from ehr_relation_extraction_ray.pipelines import export, kg
    from ehr_relation_extraction_ray.sources import conll as conll_src
    from ehr_relation_extraction_ray.sources import retsv as retsv_src

    docs = kg.documents(synth.transcripts_path("/root/testdata/sf0.001"))
    ner_dir = str(tmp_path / "ner")
    export.export_ner(docs, ner_dir, dev_frac=0.2)
    assert os.path.exists(os.path.join(ner_dir, "labels.txt"))
    assert len(open(os.path.join(ner_dir, "labels.txt")).read().split()) == 19
    train = conll_src.read_conll(os.path.join(ner_dir, "train")).to_pandas()
    dev = conll_src.read_conll(os.path.join(ner_dir, "dev")).to_pandas()
    assert len(train) > 0 and len(dev) > 0
    labels = {l for ls in train["labels"] for l in ls}
    assert "B-DRUG" in labels and "O" in labels

    re_dir = str(tmp_path / "re")
    export.export_re(docs, re_dir, dev_frac=0.2)
    tr = retsv_src.read_re_tsv(os.path.join(re_dir, "train"), split="train").to_pandas()
    te = retsv_src.read_re_tsv(os.path.join(re_dir, "test"), split="test").to_pandas()
    assert len(te) > len(tr) > 0  # test = all candidates, train = subset
    assert te["sentence"].str.contains("@").all()


def test_hash_sampling_deterministic_and_calibrated():
    """O4/O5 hash-Bernoulli: deterministic, order-independent, ~p rates."""
    import pyarrow as pa

    from ehr_relation_extraction_ray.pipelines.export import sample_mask

    n = 20000
    batch = pa.table(
        {
            "doc_id": pa.array([f"d{i%97}" for i in range(n)]),
            "win_idx": pa.array([i % 13 for i in range(n)], pa.int32()),
            "cand_idx": pa.array(list(range(n)), pa.int64()),
            "rel_type": pa.array(
                ["ADE-Drug" if i % 3 == 0 else "Strength-Drug" for i in range(n)]
            ),
            "label": pa.array([1 if i % 2 == 0 else 0 for i in range(n)], pa.int8()),
        }
    )
    m1 = sample_mask(batch)
    m2 = sample_mask(batch)
    assert (m1 == m2).all()
    # permuted order gives the same per-row decisions
    perm = np.random.default_rng(0).permutation(n)
    m3 = sample_mask(batch.take(pa.array(perm)))
    assert (m3 == m1[perm]).all()
    import numpy as _np

    lab = _np.asarray(batch["label"])
    rel = _np.asarray(batch["rel_type"].to_pylist())
    neg_nonade = (lab == 0) & (rel != "ADE-Drug")
    pos_ade = (lab == 1) & (rel == "ADE-Drug")
    assert abs(m1[neg_nonade].mean() - 0.25) < 0.03
    assert abs(m1[pos_ade].mean() - 0.5) < 0.03
    assert m1[~neg_nonade & ~pos_ade].all()


def test_stratified_sample_exact_deterministic(ray_session):
    """stratified_sample: exact n per stratum, md5-rank order, identical
    result at different parallelisms, equal to the serial computation."""
    import hashlib

    import pandas as pd
    import ray.data

    from ehr_relation_extraction_ray.pipelines.export import stratified_sample

    rng = np.random.default_rng(7)
    n = 400
    df = pd.DataFrame(
        {
            "doc_id": np.arange(n, dtype="int64"),
            "lang": rng.choice(["en", "fr", "zh"], size=n, p=[0.7, 0.2, 0.1]),
        }
    )
    serial = df.assign(
        sample_key=[hashlib.md5(str(i).encode()).hexdigest() for i in df["doc_id"]]
    ).sort_values(["lang", "sample_key", "doc_id"], kind="stable")
    serial = serial.groupby("lang", sort=False).head(10).copy()
    serial["rank"] = serial.groupby("lang", sort=False).cumcount() + 1

    for nparts in (1, 7):
        ds = ray.data.from_pandas(df).repartition(nparts)
        got = (
            stratified_sample(ds, 10, strata_col="lang")
            .to_pandas()
            .sort_values(["lang", "rank"])
            .reset_index(drop=True)
        )
        assert (got.groupby("lang").size() == 10).all()
        pd.testing.assert_frame_equal(
            got[["lang", "rank", "doc_id", "sample_key"]],
            serial[["lang", "rank", "doc_id", "sample_key"]].reset_index(drop=True),
        )
    # stratum smaller than n: returns every member, ranked
    tiny = pd.DataFrame({"doc_id": [1, 2, 3], "lang": ["en", "en", "fr"]})
    got = stratified_sample(ray.data.from_pandas(tiny), 10).to_pandas()
    assert len(got) == 3
    assert set(got.groupby("lang").size().to_dict().items()) == {("en", 2), ("fr", 1)}


def test_poison_document_quarantine(tmp_path):
    """A document that makes the generator raise is skipped and recorded;
    the rest of the corpus processes normally."""
    import pyarrow as pa

    from ehr_relation_extraction_ray.stages import candidates
    from ehr_relation_extraction_ray.state.quarantine import read_errors

    good = (
        "patient took aspirin 81 mg daily and developed rash after dose .\n\n"
    ) * 30
    # dense window: many drugs x many others -> exceeds max_pairs cap inside
    # window_candidates -> ValueError for this doc only
    poison = ("aspirin 81 mg metformin 500 mg " * 40 + ".\n\n") * 10
    docs = ray.data.from_arrow(
        pa.table(
            {
                "doc_id": pa.array(["good-1", "poison", "good-2"]),
                "text": pa.array([good, poison, good], pa.large_string()),
            }
        )
    )
    errors_dir = str(tmp_path / "errors")

    # without quarantine: the job dies on the dense-window cap
    with pytest.raises(Exception):
        docs.map_batches(
            candidates.CandidateGenerator,
            fn_constructor_kwargs={"max_pairs_per_window": 500},
            batch_format="pyarrow",
            batch_size=1,
            concurrency=1,
        ).count()

    # with quarantine: good docs flow, poison recorded
    cands = docs.map_batches(
        candidates.CandidateGenerator,
        fn_constructor_kwargs={
            "max_pairs_per_window": 500,
            "errors_dir": errors_dir,
        },
        batch_format="pyarrow",
        batch_size=1,
        concurrency=1,
    )
    out = cands.to_pandas()
    assert set(out["doc_id"]) == {"good-1", "good-2"}
    errs = read_errors(errors_dir).to_pandas()
    assert list(errs["doc_id"]) == ["poison"]
    assert "ValueError" in errs["error"].iloc[0]
    assert (errs["stage"] == "candidates").all()


def test_html_renderers():
    """S12/S13 driver-side renders: overlap-drop + grouped wide HTML."""
    import pyarrow as pa

    from ehr_relation_extraction_ray.stages import graph

    text = "took aspirin 81 mg\nnow"
    ments = pa.table(
        {
            "start": pa.array([5, 13, 7], pa.int64()),   # 7 overlaps aspirin
            "end": pa.array([12, 18, 15], pa.int64()),
            "ent_type": pa.array(["Drug", "Strength", "Drug"]),
        }
    )
    html = graph.render_doc_html(text, ments)
    assert html.count("<span") == 2  # overlapping span dropped
    assert "aspirin" in html and "81 mg" in html and "<br>" in html
    assert "#aa9cfc" in html and "#ff9561" in html

    wide = pd.DataFrame(
        {
            "doc_id": ["d"], "subj_id": ["T1"], "subj": ["aspirin"],
            "pred": ["Strength"], "args": ["81 mg\n500 mg"], "n_args": [2],
        }
    )
    out = graph.render_wide_html(wide)
    assert "81 mg<br>500 mg" in out
    assert "<th>Entity Text</th>" in out and "Drug ID" in out


def test_per_drug_graph_projection():
    """Per-drug adjacency (display_knowledge_graph engine side): one row
    per (doc, drug) with deterministic sorted edge list + HTML render."""
    import ray.data

    from ehr_relation_extraction_ray.stages import graph

    trip = ray.data.from_items(
        [
            {"doc_id": "d1", "subj_id": "T1", "subj": "aspirin",
             "pred": "Strength", "obj": "81 mg"},
            {"doc_id": "d1", "subj_id": "T1", "subj": "aspirin",
             "pred": "Reason", "obj": "pain"},
            {"doc_id": "d1", "subj_id": "T1", "subj": "aspirin",
             "pred": "Strength", "obj": "500 mg"},
            {"doc_id": "d1", "subj_id": "T5", "subj": "statin",
             "pred": "Frequency", "obj": "daily"},
            {"doc_id": "d2", "subj_id": "T1", "subj": "statin",
             "pred": "Frequency", "obj": "daily"},
        ]
    )
    adj = (
        graph.per_drug_graph(trip)
        .to_pandas()
        .sort_values(["doc_id", "subj_id"])
        .reset_index(drop=True)
    )
    assert len(adj) == 3
    r = adj.iloc[0]
    assert (r.doc_id, r.subj_id, r.n_nodes, r.n_edges) == ("d1", "T1", 4, 3)
    assert r.edges == "Reason:pain\nStrength:500 mg\nStrength:81 mg"
    html = graph.render_drug_graph_html(adj)
    assert html.count("drug-graph") == 3
    assert "Reason</span> → " in html and "aspirin" in html


def test_distributed_dict_fit_and_empty_input():
    """G5 distributed fit reproduces the detector's surfaces; empty
    transcripts flow through the whole pipeline without crashing."""
    import pyarrow as pa

    from ehr_relation_extraction_ray import lexicon
    from ehr_relation_extraction_ray.pipelines import kg
    from ehr_relation_extraction_ray.schemas import TRANSCRIPTS
    from ehr_relation_extraction_ray.stages import assembly, candidates, relations

    ments = ray.data.from_items(
        [
            {"doc_id": "a", "ent_type": "Drug", "text": "Aspirin"},
            {"doc_id": "b", "ent_type": "Drug", "text": "aspirin"},
            {"doc_id": "a", "ent_type": "ADE", "text": "rash"},
            {"doc_id": "a", "ent_type": "Strength", "text": "81 mg"},
        ]
    )
    pats = lexicon.fit_from_mentions(ments)
    assert pats["Strength"] == lexicon.STRENGTH_PATTERN
    assert "aspirin" in pats["Drug"] and pats["Drug"].count("aspirin") == 1
    compiled = lexicon.compile_patterns(pats)
    found = lexicon.find_mentions(" took aspirin and rash appeared ", compiled)
    assert {t for t, _, _ in found} == {"Drug", "ADE"}

    # empty input end-to-end
    empty = ray.data.from_arrow(TRANSCRIPTS.empty_table())
    docs = assembly.assemble(empty)
    trip = relations.distinct_triples(
        relations.triples(relations.score(candidates.generate(docs)))
    )
    assert trip.count() == 0


def test_scored_linker_exact_fuzzy_none(ray_session):
    import ray

    from ehr_relation_extraction_ray.stages.canonicalize import (
        ScoredLinker,
        charset_jaccard,
    )
    import pyarrow as pa

    mapping = {
        ("Drug", "aspirin"): "N:Drug:aspirin",
        ("Drug", "ibuprofen"): "N:Drug:ibuprofen",
        ("ADE", "nausea"): "N:ADE:nausea",
    }
    ref = ray.put(mapping)
    linker = ScoredLinker(ref, threshold=0.5)
    batch = pa.table(
        {
            "doc_id": pa.array(["d"] * 4),
            "ent_type": pa.array(["Drug", "Drug", "ADE", "Drug"]),
            "text": pa.array(["Aspirin", "aspirinn", "zzzz", "qqqq"]),
        }
    )
    out = linker(batch)
    methods = out["link_method"].to_pylist()
    nodes = out["node_id"].to_pylist()
    scores = out["link_score"].to_pylist()
    assert methods[0] == "exact" and nodes[0] == "N:Drug:aspirin" and scores[0] == 1.0
    # "aspirinn" char set == "aspirin" char set -> jaccard 1.0 fuzzy hit
    assert methods[1] == "fuzzy" and nodes[1] == "N:Drug:aspirin"
    assert scores[1] == charset_jaccard("aspirinn", "aspirin") == 1.0
    # no character overlap -> below threshold -> unlinked
    assert methods[2] == "none" and nodes[2] == ""
    assert methods[3] == "none"


def test_partitioned_parquet_roundtrip(ray_session, tmp_path):
    """write_parquet(partition_cols) lays out one dir per key and the
    read-back equals the input (hive partition column re-attached)."""
    import os

    import numpy as np
    import pandas as pd
    import ray.data

    df = pd.DataFrame(
        {
            "doc_id": np.arange(40, dtype=np.int64),
            "lang": np.where(np.arange(40) % 3 == 0, "en", "de"),
            "text": [f"doc {i}" for i in range(40)],
        }
    )
    out = str(tmp_path / "part")
    ray.data.from_pandas(df).repartition(4).write_parquet(
        out, partition_cols=["lang"]
    )
    subdirs = sorted(d for d in os.listdir(out) if d.startswith("lang="))
    assert subdirs == ["lang=de", "lang=en"]
    back = (
        ray.data.read_parquet(out)
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    back["lang"] = back["lang"].astype(str)
    pd.testing.assert_frame_equal(
        back[["doc_id", "lang", "text"]], df, check_dtype=False
    )


def test_write_partitioned_resumable(tmp_path):
    """Partition-level output resume: full write roundtrips; deleting
    some partitions and re-running rewrites ONLY those (finished files
    untouched, verified by mtime); a third run skips everything."""
    import os
    import shutil

    import ray.data

    from ehr_relation_extraction_ray.pipelines.export import (
        write_partitioned_resumable,
    )

    rows = [{"k": i, "v": f"row-{i}"} for i in range(200)]
    ds = ray.data.from_items(rows)
    out = str(tmp_path / "sink")
    res1 = write_partitioned_resumable(ds, out, "k", num_partitions=8)
    assert res1["written"] == 8 and res1["skipped"] == 0
    assert res1["rows_written"] == 200
    back = ray.data.read_parquet(out).to_pandas()
    assert sorted(back["k"]) == sorted(r["k"] for r in rows)

    mtimes = {
        p: os.path.getmtime(os.path.join(out, p, "data.parquet"))
        for p in os.listdir(out)
    }
    for gone in ("part=1", "part=4", "part=6"):
        shutil.rmtree(os.path.join(out, gone))
    res2 = write_partitioned_resumable(ds, out, "k", num_partitions=8)
    assert res2["written"] == 3 and res2["skipped"] == 5
    for p, m in mtimes.items():
        if p not in ("part=1", "part=4", "part=6"):
            assert os.path.getmtime(os.path.join(out, p, "data.parquet")) == m
    back2 = ray.data.read_parquet(out).to_pandas()
    assert sorted(back2["k"]) == sorted(r["k"] for r in rows)

    res3 = write_partitioned_resumable(ds, out, "k", num_partitions=8)
    assert res3 == {"written": 0, "skipped": 8, "rows_written": 0}
