"""Named queries for the driver contract (__ray_entry__.queries).

Each function takes ``sf_dir`` and returns a small pandas DataFrame whose
column names match the corresponding oracle SQL exactly. Transcript-based
queries synthesize their input deterministically (synth.transcripts_path)
— the DuckDB oracle reads the very same parquet file.
"""

from __future__ import annotations

import hashlib
import os

import numpy as np
import pandas as pd
import pyarrow as pa

import ray
import ray.data
from ray.data.aggregate import Count, Sum

from .. import synth
from ..stages import (
    assembly,
    candidates,
    canonicalize,
    clusters,
    constraints,
    dedupe,
    diff,
    graph,
    mentions as mentions_stage,
    multimodal,
    relations,
    text_analysis,
    truth,
)
from . import kg


_DOCS_MEMO: dict = {}
_MENTIONS_MEMO: dict = {}


def _docs(sf_dir: str) -> "ray.data.Dataset":
    """Assembled conversations, materialized + memoized per transcripts
    path (same rationale as _triples: one groupby(conv_id) execution
    serves every document-consuming query in the driver's run; 600
    small rows at sf0.01 stay object-store-resident)."""
    path = synth.transcripts_path(sf_dir)
    ds = _DOCS_MEMO.get(path)
    if ds is None:
        ds = kg.documents(path).materialize()
        _DOCS_MEMO[path] = ds
    return ds


def _mentions(sf_dir: str) -> "ray.data.Dataset":
    """Detected mentions over _docs, materialized + memoized."""
    path = synth.transcripts_path(sf_dir)
    ds = _MENTIONS_MEMO.get(path)
    if ds is None:
        ds = mentions_stage.detect(_docs(sf_dir)).materialize()
        _MENTIONS_MEMO[path] = ds
    return ds


# -- KG pipeline ------------------------------------------------------------


def kg_assembly(sf_dir: str) -> pd.DataFrame:
    docs = _docs(sf_dir)

    def digest(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "doc_id": df["doc_id"],
                "n_turns": df["n_turns"].astype("int64"),
                "text_md5": [
                    hashlib.md5(t.encode("utf-8")).hexdigest() for t in df["text"]
                ],
            }
        )

    out = docs.map_batches(digest, batch_format="pandas").to_pandas()
    return out.sort_values("doc_id").reset_index(drop=True)


def kg_mentions(sf_dir: str) -> pd.DataFrame:
    ment = _mentions(sf_dir)

    def local_counts(batch: pa.Table) -> pa.Table:
        # combiner: the distinct-surface vocabulary is tiny, so pre-count
        # per batch and let the shuffle move ~90 rows per block, not 700k
        return (
            batch.select(["ent_type", "text"])
            .group_by(["ent_type", "text"], use_threads=False)
            .aggregate([([], "count_all")])
            .rename_columns(["ent_type", "text", "n"])
        )

    # the partials are (lexicon x blocks)-bounded (~90 rows per block), so
    # the final merge is a driver sum of a dimension-sized table — this
    # replaces a full groupby shuffle whose fixed cost dominated the query
    # (same rationale as part_brand_margin; measured 4.2 s -> ~2.6 s)
    per_surface = (
        ment.map_batches(local_counts, batch_format="pyarrow")
        .to_pandas()
        .groupby(["ent_type", "text"], as_index=False)["n"]
        .sum()
    )
    out = (
        per_surface.groupby("ent_type", as_index=False)
        .agg(n_mentions=("n", "sum"), n_surfaces=("n", "size"))
    )
    # the per-type rollup of a lexicon-bounded table needs no second
    # all-to-all exchange (each Ray groupby costs a full sort shuffle)
    return out.sort_values("ent_type").reset_index(drop=True)


_TRIPLES_MEMO: dict = {}


def _triples(sf_dir: str) -> "ray.data.Dataset":
    """Materialized flagship triples, memoized per transcripts path: the
    driver's correctness run executes many triple-consuming queries in
    one process, and the extraction chain is identical for all of them —
    one execution + object-store-resident blocks (58k rows at sf0.01)
    instead of re-running the chain per query. Queries stay semantically
    identical: kg.run is deterministic in its input path."""
    path = synth.transcripts_path(sf_dir)
    ds = _TRIPLES_MEMO.get(path)
    if ds is None:
        ds = kg.run(path).materialize()
        _TRIPLES_MEMO[path] = ds
    return ds


def kg_triples(sf_dir: str) -> pd.DataFrame:
    trip = _triples(sf_dir)
    df = trip.to_pandas()
    return df.sort_values(list(df.columns)).reset_index(drop=True)


def kg_wide_table(sf_dir: str) -> pd.DataFrame:
    trip = _triples(sf_dir)
    df = graph.wide_relation_table(trip).to_pandas()
    return df.sort_values(["doc_id", "subj_id", "pred"]).reset_index(drop=True)


def kg_drug_graph(sf_dir: str) -> pd.DataFrame:
    trip = _triples(sf_dir)
    df = graph.per_drug_graph(trip).to_pandas()
    return df.sort_values(["doc_id", "subj_id"]).reset_index(drop=True)


def kg_nodes(sf_dir: str) -> pd.DataFrame:
    ment = _mentions(sf_dir)
    nodes, _ = canonicalize.build_nodes(ment)
    df = nodes.to_pandas()
    return df.sort_values("node_id").reset_index(drop=True)


def kg_windows(sf_dir: str) -> pd.DataFrame:
    docs = _docs(sf_dir)
    win = docs.map_batches(mentions_stage.windows_table, batch_format="pyarrow")
    agg = (
        win.groupby("doc_id")
        .aggregate(Count(alias_name="n_windows"))
        .to_pandas()
    )
    return agg.sort_values("doc_id").reset_index(drop=True)


# -- documents-table training-data ops --------------------------------------


def docs_exact_dedup(sf_dir: str) -> pd.DataFrame:
    docs = ray.data.read_parquet(
        os.path.join(sf_dir, "documents.parquet"), columns=["doc_id", "text"]
    )
    out = dedupe.exact_dedup(docs).to_pandas()[["keep_id", "n_dups"]]
    return out.sort_values("keep_id").reset_index(drop=True)


def docs_stats(sf_dir: str) -> pd.DataFrame:
    docs = ray.data.read_parquet(
        os.path.join(sf_dir, "documents.parquet"), columns=["doc_id", "text"]
    )
    ann = text_analysis.annotate(docs).to_pandas()
    out = ann[["doc_id", "n_chars", "n_tokens", "md5"]].copy()
    out["n_chars"] = out["n_chars"].astype("int64")
    out["n_tokens"] = out["n_tokens"].astype("int64")
    return out.sort_values("doc_id").reset_index(drop=True)


def docs_quality(sf_dir: str) -> pd.DataFrame:
    """Heuristic quality/lang features (serial-fixture hash oracle)."""
    docs = ray.data.read_parquet(
        os.path.join(sf_dir, "documents.parquet"), columns=["doc_id", "text"]
    )
    ann = text_analysis.annotate(docs).to_pandas()
    cols = [
        "doc_id", "lang_pred", "bpe_tokens", "stopword_ratio",
        "punct_ratio", "digit_ratio", "fingerprint",
    ]
    out = ann[cols].copy()
    for c in ("stopword_ratio", "punct_ratio", "digit_ratio"):
        out[c] = out[c].round(6)
    return out.sort_values("doc_id").reset_index(drop=True)


def docs_stratified_sample(sf_dir: str, n: int = 20) -> pd.DataFrame:
    """Deterministic per-language document sample (exact n per stratum,
    md5-ranked; see export.stratified_sample for the combiner shape)."""
    from . import export

    docs = ray.data.read_parquet(
        os.path.join(sf_dir, "documents.parquet"), columns=["doc_id", "lang"]
    )
    out = export.stratified_sample(docs, n, strata_col="lang").to_pandas()
    out["rank"] = out["rank"].astype("int64")
    return (
        out[["lang", "rank", "doc_id", "sample_key"]]
        .sort_values(["lang", "rank"])
        .reset_index(drop=True)
    )


def _bench_corpus_split(docs):
    """The deterministic benchmark/corpus split (doc_id % 17 == 0 is the
    benchmark) — ONE definition shared by the exact and Bloom
    decontamination queries so the "bloom == exact" oracle equivalence
    can never silently compare different splits (review finding)."""

    def _split(keep_bench: bool):
        def f(t: pa.Table) -> pa.Table:
            is_bench = (np.asarray(t["doc_id"]) % 17) == 0
            return t.filter(pa.array(is_bench if keep_bench else ~is_bench))

        return f

    return (
        docs.map_batches(_split(True), batch_format="pyarrow"),
        docs.map_batches(_split(False), batch_format="pyarrow"),
    )


def docs_decontaminate(sf_dir: str) -> pd.DataFrame:
    """Benchmark n-gram decontamination: corpus docs sharing a 5-word
    shingle with the (deterministic doc_id%17==0) benchmark split."""
    docs = ray.data.read_parquet(
        os.path.join(sf_dir, "documents.parquet"), columns=["doc_id", "text"]
    )
    bench, corpus = _bench_corpus_split(docs)
    ref = dedupe.benchmark_shingle_set(bench)
    out = dedupe.decontaminate(corpus, ref).to_pandas()
    out["n_hits"] = out["n_hits"].astype("int64")
    return out.sort_values("doc_id").reset_index(drop=True)


def docs_unigram_logprob(sf_dir: str) -> pd.DataFrame:
    """Per-doc mean unigram log-prob under a corpus-fit unigram LM."""
    docs = ray.data.read_parquet(
        os.path.join(sf_dir, "documents.parquet"), columns=["doc_id", "text"]
    )
    out = text_analysis.unigram_logprob(docs).to_pandas()
    out["n_tokens"] = out["n_tokens"].astype("int64")
    out["avg_logprob"] = out["avg_logprob"].round(6)
    return out.sort_values("doc_id").reset_index(drop=True)


def docs_repetition(sf_dir: str) -> pd.DataFrame:
    """Gopher-style repetition quality signals per document."""
    docs = ray.data.read_parquet(
        os.path.join(sf_dir, "documents.parquet"), columns=["doc_id", "text"]
    )
    out = text_analysis.repetition_signals(docs).to_pandas()
    out["n_lines"] = out["n_lines"].astype("int64")
    for c in ("dup_line_frac", "top_bigram_frac"):
        out[c] = out[c].round(6)
    return out.sort_values("doc_id").reset_index(drop=True)


def docs_pack_bins(sf_dir: str, budget: int = 2048) -> pd.DataFrame:
    """Token-budget sequence packing over the global doc_id-ordered token
    stream (distributed prefix-sum scan)."""
    from . import export

    docs = ray.data.read_parquet(
        os.path.join(sf_dir, "documents.parquet"), columns=["doc_id", "text"]
    )
    out = export.pack_sequences(docs, budget=budget).to_pandas()
    out["n_tokens"] = out["n_tokens"].astype("int64")
    out["bin_id"] = out["bin_id"].astype("int64")
    return out.sort_values("doc_id").reset_index(drop=True)


def docs_lang_mix(sf_dir: str) -> pd.DataFrame:
    """Domain-mixing weights: per-language upsampling factor that evens the
    corpus to a uniform language mix (weight = total / (k * n_lang)).
    Combiner groupby-count (language-count-sized shuffle) + driver math on
    the k-row result — the weight table is then broadcast to samplers."""
    docs = ray.data.read_parquet(
        os.path.join(sf_dir, "documents.parquet"), columns=["lang"]
    )

    def partial(batch: pa.Table) -> pa.Table:
        g = batch.group_by("lang", use_threads=False).aggregate([([], "count_all")])
        return g.rename_columns(["lang", "n"])

    out = (
        docs.map_batches(partial, batch_format="pyarrow")
        .groupby("lang")
        .aggregate(Sum("n", alias_name="n_docs"))
        .to_pandas()
        .sort_values("lang")
        .reset_index(drop=True)
    )
    out["n_docs"] = out["n_docs"].astype("int64")
    total = float(out["n_docs"].sum())
    k = len(out)
    out["mix_weight"] = (total / (k * out["n_docs"].to_numpy(np.float64))).round(6)
    return out


def jsonl_dir(sf_dir: str) -> str:
    sf = os.path.basename(os.path.normpath(sf_dir)).replace("sf", "")
    return f"/tmp/graft_jsonl/sf{sf}/documents"


def docs_jsonl_roundtrip(sf_dir: str) -> pd.DataFrame:
    """JSONL sink+source roundtrip: write the documents table as sharded
    JSONL (``Dataset.write_json`` — one file per block, the resumable
    partitioned-output layout), read it back with ``ray.data.read_json``,
    and digest per row. The oracle reads the SAME shards with DuckDB's
    independent JSON parser, so a hash match proves encode/decode
    fidelity, not just self-consistency."""
    import shutil

    docs = ray.data.read_parquet(
        os.path.join(sf_dir, "documents.parquet"),
        columns=["doc_id", "text", "lang"],
    )
    out_dir = jsonl_dir(sf_dir)
    shutil.rmtree(out_dir, ignore_errors=True)
    os.makedirs(out_dir, exist_ok=True)
    docs.write_json(out_dir)
    back = ray.data.read_json(out_dir)

    def digest(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "doc_id": df["doc_id"].astype("int64"),
                "lang": df["lang"],
                "text_md5": [
                    hashlib.md5(t.encode("utf-8")).hexdigest()
                    for t in df["text"]
                ],
            }
        )

    out = back.map_batches(digest, batch_format="pandas").to_pandas()
    return out.sort_values("doc_id").reset_index(drop=True)


def docs_top_terms(sf_dir: str, k: int = 10) -> pd.DataFrame:
    """Exact global top-k terms via the two-pass heavy-hitters pattern
    (Misra-Gries candidates + exact recount of the broadcast candidate
    set — bounded memory at any vocabulary size)."""
    docs = ray.data.read_parquet(
        os.path.join(sf_dir, "documents.parquet"), columns=["text"]
    )
    out = text_analysis.heavy_hitter_terms(docs, k=k)
    out["c"] = out["c"].astype("int64")
    return out


def docs_ngram_jaccard(sf_dir: str) -> pd.DataFrame:
    docs = ray.data.read_parquet(
        os.path.join(sf_dir, "documents.parquet"), columns=["doc_id", "text"]
    )
    return dedupe.ngram_jaccard_pairs(docs, threshold=0.8, k=5)


def docs_minhash_pairs(sf_dir: str) -> pd.DataFrame:
    """LSH candidates + exact-Jaccard verify (oracle: exact n-gram SQL
    — equal whenever LSH recall is 1 at this sf, which the driver checks)."""
    docs = ray.data.read_parquet(
        os.path.join(sf_dir, "documents.parquet"), columns=["doc_id", "text"]
    )
    docs = docs.map_batches(
        lambda t: t.set_column(
            t.schema.get_field_index("doc_id"),
            "doc_id",
            t["doc_id"].cast(pa.string()),
        ),
        batch_format="pyarrow",
    )
    # distinct=False: verify_jaccard dedups internally, saving the
    # candidate-distinct all-to-all exchange
    pairs = dedupe.minhash_lsh_pairs(docs, distinct=False)
    verified = dedupe.verify_jaccard(pairs, docs, threshold=0.8).to_pandas()
    verified["jaccard"] = verified["jaccard"].round(4)
    return verified.sort_values(["doc_a", "doc_b"]).reset_index(drop=True)


def docs_tfidf_top_terms(sf_dir: str) -> pd.DataFrame:
    """Top-3 TF-IDF terms per document (combiner df + hash join on term)."""
    docs = ray.data.read_parquet(
        os.path.join(sf_dir, "documents.parquet"), columns=["doc_id", "text"]
    )
    out = text_analysis.tfidf_top_terms(docs, k=3).to_pandas()
    return out.sort_values(["doc_id", "term"]).reset_index(drop=True)


def docs_inverted_index(sf_dir: str) -> pd.DataFrame:
    """Posting-list digest per term (the small vocab makes the full index
    driver-collectable here; the operator itself never does)."""
    docs = ray.data.read_parquet(
        os.path.join(sf_dir, "documents.parquet"), columns=["doc_id", "text"]
    )
    out = text_analysis.inverted_index(docs).to_pandas()
    out["postings_md5"] = [
        hashlib.md5(",".join(p).encode()).hexdigest() for p in out["postings"]
    ]
    return (
        out[["term", "df", "postings_md5"]]
        .sort_values("term")
        .reset_index(drop=True)
    )


def docs_dup_clusters(sf_dir: str) -> pd.DataFrame:
    """Full near-dup chain: minhash LSH -> Jaccard verify -> distributed
    connected components -> (doc_id, cluster_id, cluster_size).

    Oracle: DuckDB recursive-CTE transitive closure over the exact n-gram
    Jaccard pairs — valid because verified-LSH recall is 1.0 at this scale
    (the docs_minhash_pairs oracle establishes pair-set equality)."""
    docs = ray.data.read_parquet(
        os.path.join(sf_dir, "documents.parquet"), columns=["doc_id", "text"]
    )
    docs = docs.map_batches(
        lambda t: t.set_column(
            t.schema.get_field_index("doc_id"),
            "doc_id",
            t["doc_id"].cast(pa.string()),
        ),
        batch_format="pyarrow",
    )
    pairs = dedupe.minhash_lsh_pairs(docs, distinct=False)
    verified = dedupe.verify_jaccard(pairs, docs, threshold=0.8)
    out = clusters.dup_clusters(verified, with_sizes=True).to_pandas()
    return out.sort_values("doc_id").reset_index(drop=True)


def docs_simhash_pairs(sf_dir: str) -> pd.DataFrame:
    """Simhash Hamming<=3 near-dup pairs (serial-fixture hash oracle)."""
    docs = ray.data.read_parquet(
        os.path.join(sf_dir, "documents.parquet"), columns=["doc_id", "text"]
    )
    out = dedupe.simhash_near_pairs(docs).to_pandas()
    return out.sort_values(["doc_a", "doc_b"]).reset_index(drop=True)


def docs_distinct_tokens(sf_dir: str) -> pd.DataFrame:
    """Approximate distinct-token count over the corpus via the mergeable
    HyperLogLog sketch (functions/sketch): each block folds its tokens
    into a 4 KiB register vector (combiner), the merge is an elementwise
    max over block rows — merge volume is blocks x 4 KiB regardless of
    corpus size. Deterministic (content_hash_64), so an independent serial
    recomputation hash-matches the estimate exactly."""
    import numpy as np

    from ..functions.sketch import hll_estimate, hll_merge, hll_registers

    docs = ray.data.read_parquet(
        os.path.join(sf_dir, "documents.parquet"), columns=["text"]
    )

    def block_regs(t: pa.Table) -> pa.Table:
        toks: list = []
        for s in t["text"].to_pylist():
            toks.extend((s or "").lower().split())
        regs = hll_registers(toks)
        return pa.table({"regs": pa.array([regs.tolist()], pa.list_(pa.int8()))})

    rows = docs.map_batches(block_regs, batch_format="pyarrow").to_pandas()
    merged = hll_merge(np.stack([np.asarray(r, dtype=np.int8) for r in rows["regs"]]))
    return pd.DataFrame(
        [
            {
                "metric": "distinct_tokens_hll",
                "estimate": round(hll_estimate(merged), 2),
                "nonzero_registers": int((merged > 0).sum()),
            }
        ]
    ).astype({"nonzero_registers": "int64"})


def embeddings_topk(sf_dir: str) -> pd.DataFrame:
    from ..stages import similarity

    vecs = ray.data.read_parquet(os.path.join(sf_dir, "embeddings.parquet"))
    qdf = (
        vecs.filter(expr="vec_id <= 2")  # pushed-down expr, not a row lambda
        .to_pandas()
        .sort_values("vec_id")
    )
    queries = np.stack([np.asarray(v, dtype=np.float64) for v in qdf["embedding"]])
    out = similarity.brute_force_topk(
        vecs, queries, query_ids=qdf["vec_id"].to_numpy(), k=5
    )
    out = out[["query_id", "vec_id", "rank"]].astype("int64")
    return out.sort_values(["query_id", "rank"]).reset_index(drop=True)


def embeddings_cluster_sizes(sf_dir: str) -> pd.DataFrame:
    """K-means cluster profile over the embedding corpus: per-cell vector
    count + mean cosine to the own centroid. Centroids are sample-fit on
    the driver and broadcast (similarity.train_centroids); the corpus pass
    is one zero-shuffle map_batches emitting per-block (cell, n, sum_sim)
    partials — (nlist x blocks)-bounded, merged on the driver (the
    driver-partial-merge pattern). Hash-checked against an independent
    serial k-means recompute (serial_oracle fixture)."""
    from ..stages import similarity

    vecs = ray.data.read_parquet(os.path.join(sf_dir, "embeddings.parquet"))
    cent = similarity.train_centroids(vecs, nlist=8)
    cent_ref = ray.put(np.asarray(cent, dtype=np.float32))

    def partial(batch: pa.Table) -> pa.Table:
        from ..functions.broadcast import bget

        c = bget(cent_ref)
        m = similarity._normalize(similarity._batch_matrix(batch, "embedding"))
        sims = m @ c.T.astype(np.float64)
        cells = np.argmax(sims, axis=1)
        own = sims[np.arange(len(cells)), cells]
        n = np.bincount(cells, minlength=len(c))
        s = np.bincount(cells, weights=own, minlength=len(c))
        return pa.table(
            {
                "cell": pa.array(np.arange(len(c), dtype=np.int64)),
                "n": pa.array(n.astype(np.int64)),
                "s": pa.array(s),
            }
        )

    parts = vecs.map_batches(partial, batch_format="pyarrow").to_pandas()
    g = parts.groupby("cell", as_index=False).sum()
    g = g[g["n"] > 0].reset_index(drop=True)
    out = pd.DataFrame(
        {
            "cell": g["cell"].astype("int64"),
            "n_vecs": g["n"].astype("int64"),
            "mean_sim": (g["s"] / g["n"]).round(6),
        }
    )
    return out.sort_values("cell").reset_index(drop=True)


def embeddings_ivf_topk(sf_dir: str) -> pd.DataFrame:
    """IVF probe path (hash oracle: serial k-means+probe fixture)."""
    from ..stages import similarity

    vecs = ray.data.read_parquet(os.path.join(sf_dir, "embeddings.parquet"))
    cent = similarity.train_centroids(vecs, nlist=8)
    assigned = similarity.ivf_assign(vecs, cent)
    qdf = vecs.filter(expr="vec_id <= 2").to_pandas().sort_values("vec_id")
    queries = np.stack([np.asarray(v, dtype=np.float64) for v in qdf["embedding"]])
    out = similarity.ivf_topk(assigned, cent, queries, k=5, nprobe=3)
    return out[["query_id", "vec_id", "rank"]].astype("int64").sort_values(
        ["query_id", "rank"]
    ).reset_index(drop=True)


def embeddings_pq_topk(sf_dir: str) -> pd.DataFrame:
    """Product-quantization ADC top-k (the memory-scale ANN path: 64-dim
    float vectors compress to 8 uint8 codes, so a 100 TB corpus's index
    fits ~32x less RAM; codebooks are the broadcast-small model state).
    Hash oracle: independent serial PQ recompute (full-corpus ADC + one
    global sort, no partial-top-k merge)."""
    from ..stages import similarity

    vecs = ray.data.read_parquet(os.path.join(sf_dir, "embeddings.parquet"))
    books = similarity.train_pq_codebooks(vecs, m_sub=8, ksub=16)
    qdf = vecs.filter(expr="vec_id <= 2").to_pandas().sort_values("vec_id")
    queries = np.stack([np.asarray(v, dtype=np.float64) for v in qdf["embedding"]])
    out = similarity.pq_topk(
        vecs, books, queries, query_ids=qdf["vec_id"].to_numpy(), k=5
    )
    return out[["query_id", "vec_id", "rank"]].astype("int64").sort_values(
        ["query_id", "rank"]
    ).reset_index(drop=True)


def media_path(sf_dir: str) -> str:
    sf = os.path.basename(os.path.normpath(sf_dir)).replace("sf", "")
    out_dir = f"/tmp/graft_media/sf{sf}"
    out_path = os.path.join(out_dir, "media.parquet")
    if not os.path.exists(out_path):
        import tempfile

        import pyarrow.parquet as pq

        n = max(int(3000 * float(sf)), 30)
        table = multimodal.synth_media(n)
        os.makedirs("/tmp/graft_media", exist_ok=True)
        tmp = tempfile.mkdtemp(dir="/tmp/graft_media")
        pq.write_table(table, os.path.join(tmp, "media.parquet"))
        try:
            os.rename(tmp, out_dir)
        except OSError:
            pass
    return out_path


def media_features(sf_dir: str) -> pd.DataFrame:
    media = ray.data.read_parquet(media_path(sf_dir))
    feats = multimodal.featurize(media, concurrency=2, batch_size=16)
    out = (
        feats.groupby("kind")
        .aggregate(Count(alias_name="n_media"), Sum("n_bytes", alias_name="sum_bytes"))
        .to_pandas()
    )
    return out.sort_values("kind").reset_index(drop=True)


def embeddings_cosine_dup(sf_dir: str) -> pd.DataFrame:
    """Exact embedding-cosine near-dup pairs (oracle-checked)."""
    from ..stages import similarity

    vecs = ray.data.read_parquet(os.path.join(sf_dir, "embeddings.parquet"))
    out = similarity.cosine_dup_pairs_exact(vecs, threshold=0.5)
    return out[["id_a", "id_b", "cosine"]].reset_index(drop=True)


def embeddings_cosine_dup_lsh(sf_dir: str) -> pd.DataFrame:
    """SRP-LSH blocked near-dup (approximate; recall vs the
    exact path is asserted in tests)."""
    from ..stages import similarity

    vecs = ray.data.read_parquet(os.path.join(sf_dir, "embeddings.parquet"))
    out = similarity.cosine_dup_pairs_lsh(vecs, threshold=0.5, nbits=128, bands=32)
    return out[["id_a", "id_b", "cosine"]].reset_index(drop=True)


def kg_conll_export(sf_dir: str) -> pd.DataFrame:
    """NER CoNLL export roundtrip (serial-fixture oracle) — shards read
    shards back, return per-label token counts (stable digest of S5/S6)."""
    import tempfile

    from ..pipelines import export
    from ..sources import conll as conll_src

    docs = _docs(sf_dir)
    out_dir = tempfile.mkdtemp(prefix="graft_conll_")
    export.export_ner(docs, out_dir, dev_frac=0.1)
    seqs = conll_src.read_conll(
        [os.path.join(out_dir, "train"), os.path.join(out_dir, "dev")]
    ).to_pandas()
    counts: dict = {}
    for labels in seqs["labels"]:
        for l in labels:
            counts[l] = counts.get(l, 0) + 1
    out = pd.DataFrame(
        {"label": list(counts), "n_tokens": list(counts.values())}
    )
    return out.sort_values("label").reset_index(drop=True)


def kg_re_export(sf_dir: str) -> pd.DataFrame:
    """RE TSV export roundtrip (serial-fixture oracle) — shards written, read
    back, counted per split (S7/S8 digest)."""
    import tempfile

    from ..pipelines import export
    from ..sources import retsv as retsv_src

    docs = _docs(sf_dir)
    out_dir = tempfile.mkdtemp(prefix="graft_retsv_")
    export.export_re(docs, out_dir, dev_frac=0.1)
    rows = []
    for split, fmt in (
        ("train", "train"),
        ("dev", "train"),
        ("test", "test"),
        ("test_original", "test_original"),
    ):
        n = len(retsv_src.read_re_tsv(os.path.join(out_dir, split), split=fmt).to_pandas())
        rows.append({"split": split, "n_rows": n})
    return pd.DataFrame(rows).sort_values("split").reset_index(drop=True)


def brat_path(sf_dir: str) -> str:
    """Deterministic brat directory under /tmp (atomic): <id>.txt/<id>.ann
    pairs with forward-referencing relations to exercise the backlog
    resolution (ehr.py:163-192)."""
    import random
    import tempfile

    sf = os.path.basename(os.path.normpath(sf_dir)).replace("sf", "")
    out_dir = f"/tmp/graft_brat/sf{sf}"
    if not os.path.isdir(out_dir):
        n = max(int(500 * float(sf)), 20)
        os.makedirs("/tmp/graft_brat", exist_ok=True)
        tmp = tempfile.mkdtemp(dir="/tmp/graft_brat")
        drugs = ["aspirin", "ibuprofen", "metformin"]
        others = [("Frequency", "daily"), ("ADE", "nausea"), ("Form", "tablet")]
        for i in range(n):
            rng = random.Random(9_000 + i)
            parts, ents = [], []
            pos = 0
            for k in range(rng.randint(2, 5)):
                if k % 2 == 0:
                    w = rng.choice(drugs)
                    t = "Drug"
                else:
                    t, w = rng.choice(others)
                lead = "patient took " if k == 0 else "and then "
                parts.append(lead + w + " ")
                s = pos + len(lead)
                ents.append((t, s, s + len(w), w))
                pos += len(lead) + len(w) + 1
            text = "".join(parts)
            ann_lines = []
            # relations FIRST (forward refs -> backlog path), then tags
            rels = []
            for j in range(1, len(ents)):
                if ents[j][0] != "Drug":
                    rels.append(
                        f"R{len(rels)+1}\t{ents[j][0]}-Drug Arg1:T{j+1} Arg2:T1"
                    )
            ann_lines.extend(rels)
            for j, (t, s, e, w) in enumerate(ents, start=1):
                ann_lines.append(f"T{j}\t{t} {s} {e}\t{w}")
            with open(os.path.join(tmp, f"doc{i:04d}.txt"), "w") as f:
                f.write(text)
            with open(os.path.join(tmp, f"doc{i:04d}.ann"), "w") as f:
                f.write("\n".join(ann_lines) + "\n")
        try:
            os.rename(tmp, out_dir)
        except OSError:
            pass
    return out_dir


def brat_ingest(sf_dir: str) -> pd.DataFrame:
    """brat dir scan/pairing + .ann parse (S2/S3): per-type mention digest
    plus a relations row — hash-checked against an independent serial
    line parser (serial_oracle fixture)."""
    from ..sources import brat

    docs = brat.read_brat_dir(brat_path(sf_dir))
    ments = docs.map_batches(brat.mentions_batch, batch_format="pyarrow")
    edges = docs.map_batches(brat.edges_batch, batch_format="pyarrow")

    def combine(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        loc = pa.table(
            {
                "kind": t["ent_type"],
                "span_chars": pc.subtract(t["end"], t["start"]).cast(pa.int64()),
            }
        )
        return (
            loc.group_by("kind", use_threads=False)
            .aggregate([(["span_chars"], "sum"), ([], "count_all")])
            .rename_columns(["kind", "span_chars", "n"])
        )

    md = (
        ments.map_batches(combine, batch_format="pyarrow")
        .groupby("kind")
        .aggregate(Sum("span_chars", alias_name="span_chars"), Sum("n", alias_name="n"))
        .to_pandas()
    )
    n_edges = edges.count()
    md = pd.concat(
        [md, pd.DataFrame([{"kind": "_relations", "span_chars": 0, "n": n_edges}])],
        ignore_index=True,
    ).astype({"span_chars": "int64", "n": "int64"})
    return md.sort_values("kind").reset_index(drop=True)


def ade_path(sf_dir: str) -> str:
    """Deterministic ADE-corpus-shaped NDJSON under /tmp (atomic write):
    rows of (tokens, entities[{type,start,end}], relations[{head,tail}])
    mirroring the reference's ADE JSON input (utils.py:349-419)."""
    import json as _json
    import random
    import tempfile

    sf = os.path.basename(os.path.normpath(sf_dir)).replace("sf", "")
    out_dir = f"/tmp/graft_ade/sf{sf}"
    out_path = os.path.join(out_dir, "ade.json")
    if not os.path.exists(out_path):
        n = max(int(2000 * float(sf)), 40)
        words = [
            "patient", "took", "aspirin", "ibuprofen", "daily", "and",
            "developed", "rash", "nausea", "severe", "dose", "the",
        ]
        os.makedirs("/tmp/graft_ade", exist_ok=True)
        tmp = tempfile.mkdtemp(dir="/tmp/graft_ade")
        with open(os.path.join(tmp, "ade.json"), "w") as f:
            for i in range(n):
                rng = random.Random(7_000 + i)  # per-record seed: stable
                toks = [rng.choice(words) for _ in range(rng.randint(6, 18))]
                ents = []
                k = rng.randint(1, 3)
                for _ in range(k):
                    s = rng.randrange(0, len(toks) - 1)
                    e = min(len(toks), s + rng.randint(1, 2))
                    ents.append(
                        {
                            "type": rng.choice(["Drug", "Adverse-Effect"]),
                            "start": s,
                            "end": e,
                        }
                    )
                rels = (
                    [{"head": 0, "tail": len(ents) - 1}] if len(ents) > 1 else []
                )
                f.write(
                    _json.dumps(
                        {"tokens": toks, "entities": ents, "relations": rels}
                    )
                    + "\n"
                )
        try:
            os.rename(tmp, out_dir)
        except OSError:
            pass
    return out_path


def ade_ingest(sf_dir: str) -> pd.DataFrame:
    """ADE JSON corpus ingestion (S4): read_json -> normalizer map ->
    per-type mention digest (count + total text length incl. the
    reference's trailing-space parity quirk)."""
    from ..sources import ade

    path = ade_path(sf_dir)
    raw = ade.read_ade(path)
    ments = ade.mentions(raw)

    def combine(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        loc = pa.table(
            {
                "ent_type": t["ent_type"],
                "text_len": pc.utf8_length(t["text"]).cast(pa.int64()),
            }
        )
        return (
            loc.group_by("ent_type", use_threads=False)
            .aggregate([(["text_len"], "sum"), ([], "count_all")])
            .rename_columns(["ent_type", "text_chars", "n_mentions"])
        )

    out = (
        ments.map_batches(combine, batch_format="pyarrow")
        .groupby("ent_type")
        .aggregate(
            Sum("text_chars", alias_name="text_chars"),
            Sum("n_mentions", alias_name="n_mentions"),
        )
        .to_pandas()
        .astype({"text_chars": "int64", "n_mentions": "int64"})
    )
    return out.sort_values("ent_type").reset_index(drop=True)


def kg_drug_no_ade_docs(sf_dir: str) -> pd.DataFrame:
    """Distributed anti-join / set difference: documents mentioning a Drug
    but NO adverse event. Per-batch boolean combiner (one row per doc per
    block) -> one groupby(doc_id) Max reduction -> filter — the EXCEPT
    shape without materializing either side."""
    from ray.data.aggregate import Max

    ment = _mentions(sf_dir)

    def flags(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        loc = pa.table(
            {
                "doc_id": t["doc_id"],
                "has_drug": pc.cast(
                    pc.equal(t["ent_type"], "Drug"), pa.int8()
                ),
                "has_ade": pc.cast(pc.equal(t["ent_type"], "ADE"), pa.int8()),
            }
        )
        return (
            loc.group_by("doc_id", use_threads=False)
            .aggregate([(["has_drug"], "max"), (["has_ade"], "max")])
            .rename_columns(["doc_id", "has_drug", "has_ade"])
        )

    out = (
        ment.map_batches(flags, batch_format="pyarrow")
        .groupby("doc_id")
        .aggregate(
            Max("has_drug", alias_name="has_drug"),
            Max("has_ade", alias_name="has_ade"),
        )
        .filter(expr="has_drug == 1 and has_ade == 0")
        .to_pandas()[["doc_id"]]
    )
    return out.sort_values("doc_id").reset_index(drop=True)


def kg_linked_mentions(sf_dir: str) -> pd.DataFrame:
    """Scored entity linking (actor-pool ScoredLinker): nodes are built
    from REDUCED-lexicon detections (single-word surfaces), then ALL
    full-lexicon mentions link against them — multi-word surfaces exercise
    the fuzzy char-set-Jaccard fallback. Digest: per (ent_type,
    link_method) count + rounded score sum, hash-checked against an
    independent serial recomputation."""
    from ..lexicon import DEFAULT_LEXICON, fit_patterns

    docs = _docs(sf_dir)
    reduced = {
        t: [s for s in v if " " not in s] for t, v in DEFAULT_LEXICON.items()
    }
    reduced = {t: v for t, v in reduced.items() if v}
    red_mentions = mentions_stage.detect(docs, patterns=fit_patterns(reduced))
    _nodes, map_ref = canonicalize.build_nodes(red_mentions)
    full_mentions = mentions_stage.detect(docs)
    linked = canonicalize.link_mentions_scored(full_mentions, map_ref, threshold=0.5)

    def combine(t: pa.Table) -> pa.Table:
        return (
            t.select(["ent_type", "link_method", "link_score"])
            .group_by(["ent_type", "link_method"], use_threads=False)
            .aggregate([(["link_score"], "sum"), ([], "count_all")])
            .rename_columns(["ent_type", "link_method", "s", "n"])
        )

    out = (
        linked.map_batches(combine, batch_format="pyarrow")
        .groupby(["ent_type", "link_method"])
        .aggregate(Sum("s", alias_name="s"), Sum("n", alias_name="n_mentions"))
        .to_pandas()
    )
    out["sum_score"] = out.pop("s").round(2)
    out["n_mentions"] = out["n_mentions"].astype("int64")
    return (
        out[["ent_type", "link_method", "n_mentions", "sum_score"]]
        .sort_values(["ent_type", "link_method"])
        .reset_index(drop=True)
    )


def kg_mention_chains(sf_dir: str) -> pd.DataFrame:
    """Within-conversation mention chains (coref-style identity threading):
    a chain is one (conv, ent_type, lowercased surface) recurring across
    >=2 distinct turns; its links are the consecutive-turn occurrence
    pairs — the backbone structure entity coreference resolvers emit.
    Distributed shape: per-turn dict-NER reuses the vectorized detector
    (doc_id packs conv|turn, so no new kernel), in-batch occurrence dedup
    (one turn = one input row, so its mentions never split blocks), ONE
    conv_id hash-partition exchange over the reduced occurrence digests,
    a vectorized per-partition run-walk, ent_type-bounded driver merge.
    Oracle: the same per-turn regex union + lead() window in DuckDB."""
    from ..functions.partitioning import groupby_partition

    path = synth.transcripts_path(sf_dir)
    ds = ray.data.read_parquet(path, columns=["conv_id", "turn_idx", "text"])

    def as_turn_docs(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        doc_id = pc.binary_join_element_wise(
            pc.cast(t["conv_id"], pa.string()),
            pc.cast(t["turn_idx"], pa.string()),
            "|",
        )
        return pa.table(
            {"doc_id": doc_id, "text": pc.coalesce(t["text"], pa.scalar(""))}
        )

    ment = mentions_stage.detect(
        ds.map_batches(as_turn_docs, batch_format="pyarrow")
    )

    def occurrences(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        tab = pa.table(
            {
                "doc_id": t["doc_id"],
                "ent_type": t["ent_type"],
                "surface": pc.utf8_lower(t["text"]),
            }
        )
        # distinct per (turn, type, surface): a turn's mentions all live in
        # this batch, so the in-batch dedup is globally exact
        tab = tab.group_by(
            ["doc_id", "ent_type", "surface"], use_threads=False
        ).aggregate([])
        split = pc.split_pattern(tab["doc_id"], "|")
        return pa.table(
            {
                "conv_id": pc.list_element(split, 0),
                "turn_idx": pc.cast(pc.list_element(split, 1), pa.int64()),
                "ent_type": tab["ent_type"],
                "surface": tab["surface"],
            }
        )

    def chain_partials(part: pd.DataFrame) -> pd.DataFrame:
        part = part.sort_values(["conv_id", "ent_type", "surface", "turn_idx"])
        key = part["conv_id"] + "\x00" + part["ent_type"] + "\x00" + part["surface"]
        same = key.eq(key.shift()).to_numpy()
        gaps = part["turn_idx"].diff().to_numpy()
        # a run of k occurrences of one chain key = k-1 links; the run's
        # FIRST link marks one chain (>=2 distinct turns)
        first_link = same & ~np.concatenate(([False], same[:-1]))
        g = pd.DataFrame(
            {
                "ent_type": part["ent_type"].to_numpy(),
                "n_chains": first_link.astype("int64"),
                "n_links": same.astype("int64"),
                "sum_gap": np.where(same, gaps, 0).astype("int64"),
            }
        )
        return g.groupby("ent_type", as_index=False).sum()

    partials = groupby_partition(
        ment.map_batches(occurrences, batch_format="pyarrow"),
        "conv_id",
        chain_partials,
        batch_format="pandas",
        schema=pa.schema(
            [
                ("ent_type", pa.string()),
                ("n_chains", pa.int64()),
                ("n_links", pa.int64()),
                ("sum_gap", pa.int64()),
            ]
        ),
        size_aware=True,
    )
    out = (
        partials.to_pandas()
        .groupby("ent_type", as_index=False)[["n_chains", "n_links", "sum_gap"]]
        .sum()
        .astype({"n_chains": "int64", "n_links": "int64", "sum_gap": "int64"})
    )
    return out.sort_values("ent_type").reset_index(drop=True)


def kg_truth_discovery(sf_dir: str) -> pd.DataFrame:
    """Conflicting-assertion resolution (stages/truth.resolve_conflicts):
    two-round source-reliability-weighted voting (majority -> per-doc
    reliability -> weighted revote) over the flagship triples, restricted
    to genuinely conflicting (subj, pred) keys. Zero shuffles: vote
    partials merge on the driver (ontology-bounded), the majority table
    broadcasts once, round 2 is one pass over doc-complete triple blocks.
    Oracle: the same two rounds as SQL windows over the triples fixture."""
    return truth.resolve_conflicts(_triples(sf_dir))


def kg_eval_detailed(sf_dir: str) -> pd.DataFrame:
    """Per-entity-type + micro/macro P/R/F1 (n2c2 pare-down semantics,
    lenient overlap): full-lexicon dict-NER scored against a
    deterministically reduced gold lexicon (single-word surfaces only) —
    non-trivial per-type precision/recall, hash-checked against an
    independent serial recomputation (serial_oracle fixture)."""
    from ..lexicon import DEFAULT_LEXICON, fit_patterns
    from ..stages import evaluate

    docs = _docs(sf_dir)
    sys_m = mentions_stage.detect(docs)
    reduced = {
        t: [s for s in v if " " not in s] for t, v in DEFAULT_LEXICON.items()
    }
    reduced = {t: v for t, v in reduced.items() if v}
    gold_m = mentions_stage.detect(docs, patterns=fit_patterns(reduced))
    out = evaluate.span_prf_detailed(sys_m, gold_m, mode="lenient")
    for c in ("precision", "recall", "f1"):
        out[c] = out[c].astype(float).round(6)
    return out.sort_values("scope").reset_index(drop=True)


def kg_eval_invariance(sf_dir: str) -> pd.DataFrame:
    """Distributed triple-set + span P/R/F1 counters (G3/J3, hash oracle)
    scoring one pipeline configuration against another (different read
    parallelism + scorer pathway) — both metrics must be exactly 1.0,
    which simultaneously exercises the evaluator shuffle and evidences
    parallelism invariance (SURVEY.md §5c)."""
    from ..stages import assembly, candidates, evaluate, relations

    path = synth.transcripts_path(sf_dir)

    def run_with_blocks(nblocks: int):
        ds = ray.data.read_parquet(
            path, columns=["conv_id", "turn_idx", "text"],
            override_num_blocks=nblocks,
        )
        docs = assembly.assemble(ds)
        edges = relations.score(candidates.generate(docs))
        return relations.distinct_triples_global(relations.triples(edges)), docs

    sys_trip, sys_docs = run_with_blocks(3)
    gold_trip, gold_docs = run_with_blocks(64)
    trip_prf = evaluate.triple_set_prf(sys_trip, gold_trip)
    sys_m = mentions_stage.detect(sys_docs)
    gold_m = mentions_stage.detect(gold_docs)
    span_strict = evaluate.span_prf(sys_m, gold_m, strict=True)
    span_lenient = evaluate.span_prf(sys_m, gold_m, strict=False)
    rows = [
        {"metric": "triples_strict", **{k: round(v, 6) for k, v in trip_prf.items()}},
        {"metric": "spans_strict", **{k: round(v, 6) for k, v in span_strict.items() if k != "macro_f1"}},
        {"metric": "spans_lenient", **{k: round(v, 6) for k, v in span_lenient.items() if k != "macro_f1"}},
    ]
    return pd.DataFrame(rows).sort_values("metric").reset_index(drop=True)


def media_resize_frames(sf_dir: str) -> pd.DataFrame:
    """Image resize + video frame sampling (fixture oracle; actor pools over
    binary columns; codecs stubbed deterministically)."""
    media = ray.data.read_parquet(media_path(sf_dir))
    resized = multimodal.resize_images(media, width=16, height=16, concurrency=2)
    frames = multimodal.sample_frames(media, every_ms=250, concurrency=2)
    r = resized.to_pandas()
    f = frames.to_pandas()
    return pd.DataFrame(
        [
            {
                "stage": "resize",
                "n_rows": len(r),
                "n_bytes": int(r["payload"].map(len).sum()) if len(r) else 0,
            },
            {
                "stage": "frames",
                "n_rows": len(f),
                "n_bytes": int(f["payload"].map(len).sum()) if len(f) else 0,
            },
        ]
    ).sort_values("stage").reset_index(drop=True)


def docs_normalize(sf_dir: str) -> pd.DataFrame:
    """LM text normalization (lower / digit-fold / whitespace-squash) as
    pure RE2 Arrow kernels; digested to md5 per doc for the hash oracle."""
    docs = ray.data.read_parquet(
        os.path.join(sf_dir, "documents.parquet"), columns=["doc_id", "text"]
    )
    norm = text_analysis.normalize(docs)

    def digest(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "doc_id": batch["doc_id"],
                "n_digits": batch["n_digits"],
                "norm_md5": pa.array(
                    [
                        hashlib.md5(t.encode("utf-8")).hexdigest()
                        for t in batch["norm_text"].to_pylist()
                    ]
                ),
            }
        )

    out = norm.map_batches(digest, batch_format="pyarrow").to_pandas()
    out["doc_id"] = out["doc_id"].astype("int64")
    out["n_digits"] = out["n_digits"].astype("int64")
    return out.sort_values("doc_id").reset_index(drop=True)


def embeddings_dim_stats(sf_dir: str) -> pd.DataFrame:
    """Per-dimension mean/stddev over the embedding column (the feature-
    normalization precursor for ANN / model input): dimension-bounded
    combiner partials, driver merge, zero shuffles."""
    from ..stages import similarity

    vecs = ray.data.read_parquet(
        os.path.join(sf_dir, "embeddings.parquet"), columns=["embedding"]
    )
    out = similarity.dim_stats(vecs).to_pandas()
    return out.sort_values("dim").reset_index(drop=True)


def docs_bloom_decontaminate(sf_dir: str) -> pd.DataFrame:
    """Same contamination result as docs_decontaminate via the Bloom
    prefilter + exact semi-join verify path (the variant for benchmark
    sets too large to broadcast exactly); oracle = the exact SQL, which
    asserts the false positives were joined away."""
    docs = ray.data.read_parquet(
        os.path.join(sf_dir, "documents.parquet"), columns=["doc_id", "text"]
    )
    bench, corpus = _bench_corpus_split(docs)
    # driver_merge: this query collects the report anyway, so the final
    # doc-keyed all-to-all over output-bounded partials is pure fixed cost
    out = dedupe.bloom_decontaminate(corpus, bench, driver_merge=True).to_pandas()
    out["doc_id"] = out["doc_id"].astype("int64")
    out["n_hits"] = out["n_hits"].astype("int64")
    return out.sort_values("doc_id").reset_index(drop=True)


def embeddings_pca(sf_dir: str) -> pd.DataFrame:
    """Top principal component of the embedding corpus (one covariance
    pass + driver power iteration; serial-recompute fixture oracle)."""
    from ..stages import similarity

    vecs = ray.data.read_parquet(
        os.path.join(sf_dir, "embeddings.parquet"), columns=["embedding"]
    )
    out = similarity.pca_top_component(vecs).to_pandas()
    return out.sort_values("dim").reset_index(drop=True)


def docs_weighted_sample(sf_dir: str, n: int = 25) -> pd.DataFrame:
    """Weight-proportional (by n_chars) deterministic document sample
    (A-ES keys from md5 uniforms; combiner-pruned, oracle = same formula
    in SQL)."""
    from . import export

    docs = ray.data.read_parquet(
        os.path.join(sf_dir, "documents.parquet"), columns=["doc_id", "n_chars"]
    )
    out = export.weighted_sample(docs, n, weight_col="n_chars")
    out["n_chars"] = out["n_chars"].astype("int64")
    return out[["rank", "doc_id", "n_chars", "s_key"]]


def docs_cross_dedup(sf_dir: str) -> pd.DataFrame:
    """Cross-corpus near-dup join (even-doc_id corpus vs odd-doc_id
    corpus): side-aware LSH buckets emit only A x B candidates, exact
    Jaccard verify; oracle = exhaustive cross-pair SQL (equal whenever
    LSH recall is 1 at this sf, as with docs_minhash_pairs)."""
    docs = ray.data.read_parquet(
        os.path.join(sf_dir, "documents.parquet"), columns=["doc_id", "text"]
    ).map_batches(
        lambda t: t.set_column(
            t.schema.get_field_index("doc_id"),
            "doc_id",
            t["doc_id"].cast(pa.string()),
        ),
        batch_format="pyarrow",
    )

    # both corpora live in one table (side = doc_id parity), so the
    # side_col path reads and bands the corpus ONCE instead of per side
    def _tag_side(t: pa.Table) -> pa.Table:
        ids = np.asarray(t["doc_id"].to_pylist(), dtype=np.int64)
        return t.append_column(
            "side", pa.array((ids % 2).astype(np.int8))
        )

    tagged = docs.map_batches(_tag_side, batch_format="pyarrow")
    pairs = dedupe.minhash_lsh_cross_pairs(tagged, None, side_col="side")
    verified = dedupe.verify_jaccard(pairs, docs, threshold=0.8).to_pandas()
    verified["jaccard"] = verified["jaccard"].round(4)
    # normalize orientation to lexicographic (the oracle's a < b)
    lo = verified[["doc_a", "doc_b"]].min(axis=1)
    hi = verified[["doc_a", "doc_b"]].max(axis=1)
    verified["doc_a"], verified["doc_b"] = lo, hi
    return verified.sort_values(["doc_a", "doc_b"]).reset_index(drop=True)


def parquet_part_dir(sf_dir: str) -> str:
    sf = os.path.basename(os.path.normpath(sf_dir))
    return f"/tmp/graft_pqpart/{sf}"


def docs_partitioned_write(sf_dir: str) -> pd.DataFrame:
    """Hive-partitioned Parquet sink + source roundtrip: write the
    documents table partitioned by lang (``write_parquet(partition_cols)``
    — one directory per key, the resumable-output layout where a restarted
    job skips finished partitions), read the tree back, digest per row.
    The oracle reads the SAME tree with DuckDB's independent parquet
    reader (hive_partitioning=1), so a hash match proves layout + value
    fidelity across writers."""
    import shutil

    docs = ray.data.read_parquet(
        os.path.join(sf_dir, "documents.parquet"),
        columns=["doc_id", "text", "lang"],
    )
    out_dir = parquet_part_dir(sf_dir)
    shutil.rmtree(out_dir, ignore_errors=True)
    os.makedirs(out_dir, exist_ok=True)
    docs.write_parquet(out_dir, partition_cols=["lang"])
    back = ray.data.read_parquet(out_dir)

    def digest(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "doc_id": df["doc_id"].astype("int64"),
                "lang": df["lang"].astype(str),
                "text_md5": [
                    hashlib.md5(t.encode("utf-8")).hexdigest()
                    for t in df["text"]
                ],
            }
        )

    out = back.map_batches(digest, batch_format="pandas").to_pandas()
    return out.sort_values("doc_id").reset_index(drop=True)


def kg_degree_hist(sf_dir: str) -> pd.DataFrame:
    """KG out-degree distribution: distinct-(subj,obj) edges reduced by
    the per-block combiner (edge space is ontology-bounded), degree per
    subject, histogram. Oracle recomputes from the serial triples
    fixture in pure SQL."""
    trip = _triples(sf_dir)
    edges = graph.edge_weights(trip)
    deg = edges.groupby("subj").size().rename("degree").reset_index()
    hist = deg.groupby("degree").size().rename("n_subjects").reset_index()
    hist = hist.astype({"degree": "int64", "n_subjects": "int64"})
    return hist.sort_values("degree").reset_index(drop=True)


def kg_pagerank(sf_dir: str) -> pd.DataFrame:
    """Weighted PageRank over the doc-support KG edge list (distributed
    edge-weight combiner -> deterministic driver iteration; serial
    fixture oracle re-runs the identical spec on the serial pipeline's
    triples)."""
    trip = _triples(sf_dir)
    edges = graph.edge_weights(trip)
    out = graph.pagerank(edges)
    return out.sort_values("node").reset_index(drop=True)


_COOC_MEMO: dict = {}


def _cooccurrence(sf_dir: str) -> pd.DataFrame:
    """Entity co-occurrence pair/single counts (graph.cooccurrence_counts
    over the memoized mentions), memoized per transcripts path — the PMI
    and triangle queries share one partition pass."""
    path = synth.transcripts_path(sf_dir)
    out = _COOC_MEMO.get(path)
    if out is None:
        # doc_complete: mentions blocks hold whole documents (one doc = one
        # documents row = one detect batch), so the doc_id shuffle is skipped
        out = graph.cooccurrence_counts(_mentions(sf_dir), doc_complete=True)
        _COOC_MEMO[path] = out
    return out


def kg_cooccurrence(sf_dir: str) -> pd.DataFrame:
    """Document-level entity co-occurrence PMI edges — the classic KG
    edge-weighting signal (pre-canonicalization association strength).
    Distributed shape: one doc_id-keyed partition pass emits vocabulary-
    bounded pair + doc-frequency partials; the driver computes PMI over
    the dimension-sized merge (playbook driver-partial-merge). Oracle:
    the same regex-mention CTE as kg_mentions, self-joined per doc."""
    counts = _cooccurrence(sf_dir)
    n_docs = _docs(sf_dir).count()
    singles = (
        counts[~counts["is_pair"]].set_index("ent_a")["n"].to_dict()
    )
    pairs = counts[counts["is_pair"]].copy()
    if pairs.empty:
        return pd.DataFrame(
            {"ent_a": pd.Series([], dtype=str), "ent_b": pd.Series([], dtype=str),
             "n_ab": pd.Series([], dtype="int64"),
             "pmi": pd.Series([], dtype="float64")}
        )
    ca = pairs["ent_a"].map(singles).to_numpy(dtype="float64")
    cb = pairs["ent_b"].map(singles).to_numpy(dtype="float64")
    n_ab = pairs["n"].to_numpy(dtype="int64")
    pmi = np.round(np.log(float(n_docs) * n_ab / (ca * cb)), 6)
    out = pd.DataFrame(
        {"ent_a": pairs["ent_a"].to_numpy(), "ent_b": pairs["ent_b"].to_numpy(),
         "n_ab": n_ab, "pmi": pmi}
    )
    return out.sort_values(["ent_a", "ent_b"]).reset_index(drop=True)


def kg_triangles(sf_dir: str) -> pd.DataFrame:
    """Per-node triangle counts over the entity co-occurrence graph
    (edges = entity pairs co-occurring in >= 2 documents; the triple
    graph itself is drug->attribute bipartite, hence triangle-free).
    Edge set is ontology-bounded, so the triangle enumeration is driver
    math over the distributed partials, like pagerank. Oracle: three-way
    self-join with a < b < c over the same co-occurrence CTE."""
    counts = _cooccurrence(sf_dir)
    pairs = counts[counts["is_pair"] & (counts["n"] >= 2)]
    return graph.triangles(pairs, a_col="ent_a", b_col="ent_b")


def kg_entity_components(sf_dir: str) -> pd.DataFrame:
    """Connected components of the entity co-occurrence graph (edges =
    pairs co-occurring in >= 2 docs), via the DISTRIBUTED label-propagation
    union-find (stages/clusters.dup_clusters) — here the closed ontology
    makes the edge list small, but an open-vocabulary KG at 10^12 turns
    has a corpus-scale edge list, which is exactly what dup_clusters
    partitions; the query exercises that path on KG data. Oracle:
    recursive-CTE transitive closure over the same co-occurrence CTE."""
    counts = _cooccurrence(sf_dir)
    pairs = counts[counts["is_pair"] & (counts["n"] >= 2)][["ent_a", "ent_b"]]
    if pairs.empty:
        return pd.DataFrame(
            {"ent": pd.Series([], dtype=str),
             "component_id": pd.Series([], dtype=str),
             "component_size": pd.Series([], dtype="int64")}
        )
    ds = ray.data.from_pandas(
        pairs.rename(columns={"ent_a": "doc_a", "ent_b": "doc_b"})
        .reset_index(drop=True)
    )
    out = clusters.dup_clusters(ds, with_sizes=True).to_pandas()
    out = out.rename(
        columns={"doc_id": "ent", "cluster_id": "component_id",
                 "cluster_size": "component_size"}
    )
    out["component_size"] = out["component_size"].astype("int64")
    return out.sort_values("ent").reset_index(drop=True)


def docs_substring_dedup(sf_dir: str) -> pd.DataFrame:
    """Per-document duplicated-substring exposure: distinct 8-word
    shingles shared with >= 1 other document (Lee et al. 2022 exact
    substring dedup, fixed-window form — see dedupe.dup_shingle_partials
    for the distributed shape). Digest merges the partition partials on
    the driver; the write path would finish with groupby(doc_id) in Ray."""
    docs = ray.data.read_parquet(
        os.path.join(sf_dir, "documents.parquet"), columns=["doc_id", "text"]
    )
    parts = dedupe.dup_shingle_partials(docs, k=8).to_pandas()
    if parts.empty or "doc_id" not in parts.columns:
        return pd.DataFrame(
            {"doc_id": pd.Series([], dtype=str),
             "n_dup_shingles": pd.Series([], dtype="int64")}
        )
    out = (
        parts.groupby("doc_id", as_index=False)["n"].sum()
        .rename(columns={"n": "n_dup_shingles"})
        .astype({"doc_id": str, "n_dup_shingles": "int64"})
    )
    return out.sort_values("doc_id").reset_index(drop=True)


def docs_budget_per_lang(sf_dir: str) -> pd.DataFrame:
    """Per-source token-budget curation: within each language, keep the
    largest documents (n_chars desc, doc_id tiebreak) until 60% of that
    language's total characters is reached (inclusive cutoff) — the
    "fill each source's budget by priority" selection step of a training
    mix. Pass 1: per-lang totals from block partials (lang-bounded,
    driver-merged). Pass 2: per-lang ordered prefix selection inside one
    hash partition per lang (groupby_partition; a lang's doc list is
    metadata-sized). Digest: per lang, docs kept + chars kept. Integer
    arithmetic end-to-end, so the SQL window oracle matches exactly."""
    from ..functions.broadcast import bget
    from ..functions.partitioning import groupby_partition

    docs = ray.data.read_parquet(
        os.path.join(sf_dir, "documents.parquet"),
        columns=["doc_id", "lang", "n_chars"],
    )

    def totals_partial(t: pa.Table) -> pa.Table:
        g = t.group_by("lang", use_threads=False).aggregate([("n_chars", "sum")])
        return g.rename_columns(["lang", "s"])

    totals = (
        docs.map_batches(totals_partial, batch_format="pyarrow")
        .to_pandas()
        .groupby("lang")["s"]
        .sum()
    )
    budget_ref = ray.put({k: int(v * 6 // 10) for k, v in totals.items()})

    def select(df: pd.DataFrame) -> pd.DataFrame:
        budgets = bget(budget_ref)
        df = df.sort_values(
            ["lang", "n_chars", "doc_id"], ascending=[True, False, True]
        )
        cum = df.groupby("lang", sort=False)["n_chars"].cumsum()
        keep = cum <= df["lang"].map(budgets).astype("int64")
        kept = df[keep]
        agg = kept.groupby("lang").agg(
            n_docs=("doc_id", "size"), chars_kept=("n_chars", "sum")
        )
        return agg.reset_index().astype({"n_docs": "int64", "chars_kept": "int64"})

    out = (
        groupby_partition(docs, "lang", select, batch_format="pandas")
        .to_pandas()
        .sort_values("lang")
        .reset_index(drop=True)
    )
    return out


def docs_entropy(sf_dir: str) -> pd.DataFrame:
    """Per-document unigram entropy (lexical-diversity quality signal):
    one zero-shuffle pass; per doc, token counts via np.unique and
    -sum(p ln p). Empty-token docs emit no row (matching the oracle's
    token CTE)."""
    docs = ray.data.read_parquet(
        os.path.join(sf_dir, "documents.parquet"), columns=["doc_id", "text"]
    )

    def ent(batch: pa.Table) -> pa.Table:
        ids, ns, es = [], [], []
        for doc_id, text in zip(
            batch["doc_id"].to_pylist(), batch["text"].to_pylist()
        ):
            toks = (text or "").lower().split()
            if not toks:
                continue
            _, c = np.unique(toks, return_counts=True)
            p = c / c.sum()
            ids.append(doc_id)
            ns.append(int(c.sum()))
            es.append(round(float(-(p * np.log(p)).sum()), 6))
        return pa.table(
            {
                "doc_id": pa.array(ids, pa.int64()),
                "n_tokens": pa.array(ns, pa.int64()),
                "entropy": pa.array(es, pa.float64()),
            }
        )

    out = docs.map_batches(ent, batch_format="pyarrow").to_pandas()
    return out.sort_values("doc_id").reset_index(drop=True)


def docs_lang_divergence(sf_dir: str) -> pd.DataFrame:
    """Per-language JSD vs rest-of-corpus over unigram distributions
    (combiner term counts -> one partials groupby -> vocab-bounded driver
    math)."""
    docs = ray.data.read_parquet(
        os.path.join(sf_dir, "documents.parquet"), columns=["text", "lang"]
    )
    return text_analysis.lang_divergence(docs).reset_index(drop=True)


def docs_boilerplate(sf_dir: str, min_docs: int = 3) -> pd.DataFrame:
    """Repeated 8-gram boilerplate (n-grams in >= 3 distinct docs),
    digested as (ngram_md5, df) for the hash oracle."""
    docs = ray.data.read_parquet(
        os.path.join(sf_dir, "documents.parquet"), columns=["doc_id", "text"]
    )
    out = text_analysis.boilerplate_ngrams(docs, min_docs=min_docs).to_pandas()
    if out.empty:
        return pd.DataFrame(
            {"ngram_md5": pd.Series([], dtype=str),
             "df": pd.Series([], dtype="int64")}
        )
    out["ngram_md5"] = [
        hashlib.md5(g.encode("utf-8")).hexdigest() for g in out["ngram"]
    ]
    out["df"] = out["df"].astype("int64")
    return (
        out[["ngram_md5", "df"]]
        .sort_values(["ngram_md5"])
        .reset_index(drop=True)
    )


def kg_role_stats(sf_dir: str) -> pd.DataFrame:
    """Transcript role/tool profile (the input_hint columns the KG chain
    itself doesn't consume): per role — turns, distinct conversations,
    tool-tagged turns, total characters. One streamed combiner pass for
    the additive stats plus the salted holistic distinct-count
    (functions/partitioning.salted_distinct_count — the documented
    hot-key scale path) for exact per-role conversation counts; the
    3-row results merge on the driver."""
    from ..functions.partitioning import salted_distinct_count

    tp = synth.transcripts_path(sf_dir)
    ds = ray.data.read_parquet(tp, columns=["conv_id", "role", "text", "tool"])

    def partial(t: pa.Table) -> pa.Table:
        df = pd.DataFrame(
            {
                "role": t["role"].to_pandas(),
                "has_tool": (
                    t["tool"].to_pandas().fillna("").astype(str) != ""
                ).astype("int64"),
                "n_chars": t["text"].to_pandas().fillna("").str.len().astype("int64"),
            }
        )
        g = df.groupby("role").agg(
            n_turns=("role", "size"),
            n_tool_turns=("has_tool", "sum"),
            sum_chars=("n_chars", "sum"),
        )
        return pa.Table.from_pandas(g.reset_index())

    parts = ds.map_batches(partial, batch_format="pyarrow").to_pandas()
    adds = parts.groupby("role", as_index=False).sum()
    convs = (
        salted_distinct_count(ds, "role", "conv_id", out_col="n_convs")
        .to_pandas()
    )
    out = adds.merge(convs, on="role")
    for c in ("n_turns", "n_convs", "n_tool_turns", "sum_chars"):
        out[c] = out[c].astype("int64")
    return (
        out[["role", "n_turns", "n_convs", "n_tool_turns", "sum_chars"]]
        .sort_values("role")
        .reset_index(drop=True)
    )


def kg_khop(sf_dir: str, k: int = 3) -> pd.DataFrame:
    """Undirected k-hop neighborhood of the lexicographically-first KG
    subject: frontier-broadcast BFS over the distributed triple set (one
    map_batches pass per round; see stages/graph.khop for the scale
    shape). Oracle: DuckDB recursive CTE over the serial triples
    fixture."""
    trip = _triples(sf_dir)
    return graph.khop(trip, k=k)


def docs_bpe_merges(sf_dir: str, n_merges: int = 12) -> pd.DataFrame:
    """First n BPE merges learned from the document corpus (tokenizer
    training): distributed word-frequency combiner + vocabulary-sized
    driver merge loop (stages/text_analysis.bpe_merges). Oracle: an
    independent naive single-process BPE trainer fixture."""
    docs = ray.data.read_parquet(
        os.path.join(sf_dir, "documents.parquet"), columns=["text"]
    )
    return text_analysis.bpe_merges(docs, n_merges=n_merges)


def embeddings_semdedup(sf_dir: str) -> pd.DataFrame:
    """SemDeDup-style near-dup pairs: k-means cell as the blocking key,
    within-cell float64 cosine >= threshold (stages/similarity.
    semdedup_pairs). Oracle: independent serial k-means + all-pairs
    fixture at the same spec."""
    from ..stages import similarity

    vecs = ray.data.read_parquet(os.path.join(sf_dir, "embeddings.parquet"))
    return similarity.semdedup_pairs(vecs, nlist=8, threshold=0.4)


def kg_tool_chains(sf_dir: str) -> pd.DataFrame:
    """Tool-call transition counts: within each conversation, order the
    tool-tagged turns by turn_idx and count consecutive (tool_a ->
    tool_b) transitions — the agent-behavior profile of a transcript
    corpus. Scale shape: prune to (conv_id, turn_idx, tool) at the read,
    filter empty tools, ONE conv_id-keyed partition pass
    (groupby_partition) sorts each conversation locally and emits
    (tool_a, tool_b, n) partials; the driver merges (tool-vocabulary x
    partitions) rows. Oracle: lag() window SQL."""
    from ..functions.partitioning import groupby_partition

    tp = synth.transcripts_path(sf_dir)
    ds = ray.data.read_parquet(tp, columns=["conv_id", "turn_idx", "tool"])
    # a NULL tool compares to NULL -> dropped, so one predicate covers both
    ds = ds.filter(expr="tool != ''")

    part_schema = pa.schema(
        [("tool_a", pa.string()), ("tool_b", pa.string()), ("n", pa.int64())]
    )

    def transitions(part: pa.Table) -> pa.Table:
        df = part.to_pandas().sort_values(["conv_id", "turn_idx"])
        prev = df["tool"].shift(1)
        same = df["conv_id"].eq(df["conv_id"].shift(1))
        pairs = pd.DataFrame({"tool_a": prev[same], "tool_b": df["tool"][same]})
        g = pairs.groupby(["tool_a", "tool_b"], sort=False).size().rename("n")
        return pa.Table.from_pandas(g.reset_index(), preserve_index=False)

    parts = groupby_partition(ds, "conv_id", transitions, schema=part_schema).to_pandas()
    if parts.empty:
        return pd.DataFrame(
            {"tool_a": pd.Series([], dtype=str), "tool_b": pd.Series([], dtype=str),
             "n": pd.Series([], dtype="int64")}
        )
    out = parts.groupby(["tool_a", "tool_b"], as_index=False)["n"].sum()
    out["n"] = out["n"].astype("int64")
    return out.sort_values(["tool_a", "tool_b"]).reset_index(drop=True)


def docs_shuffle(sf_dir: str, seed: int = 42) -> pd.DataFrame:
    """Deterministic global training shuffle: every document gets a
    content-addressed shuffle key md5(doc_id || '-' || seed) and a GLOBAL
    position in key order — the "shuffle the corpus identically on any
    cluster shape" step before sequence packing. This is the one
    operator that exercises ``Dataset.sort`` as a true range-partitioned
    all-to-all (the key is uniform by construction, so range partitions
    are balanced — no skew by design); positions come from the
    block-offset prefix-sum scan (functions/scan), so no driver
    materialization. Oracle: row_number() over the same md5 order."""
    import hashlib

    from ..functions.scan import with_prefix_sum

    docs = ray.data.read_parquet(
        os.path.join(sf_dir, "documents.parquet"), columns=["doc_id"]
    )

    def key(t: pa.Table) -> pa.Table:
        ids = np.asarray(t["doc_id"])
        keys = [
            hashlib.md5(f"{i}-{seed}".encode("utf-8")).hexdigest() for i in ids
        ]
        return pa.table(
            {
                "doc_id": t["doc_id"],
                "shuffle_key": pa.array(keys, pa.string()),
                "one": pa.array(np.ones(len(ids), dtype=np.int64)),
            }
        )

    keyed = docs.map_batches(key, batch_format="pyarrow")
    ranked = with_prefix_sum(
        keyed, "one", ["shuffle_key", "doc_id"], out_col="pos"
    )
    out = ranked.to_pandas()[["doc_id", "pos"]]
    out["pos"] = out["pos"].astype("int64")
    return out.sort_values("doc_id").reset_index(drop=True)


def events_moving_avg(sf_dir: str, limit_users: int = 30) -> pd.DataFrame:
    """Per-user moving average over a row frame (2 preceding + current,
    ts order) — the window-FRAME aggregate the LAG/zscore operators
    don't cover. One user-keyed partition pass (groupby_partition);
    within a partition each user's series is a vectorized pandas
    rolling mean. Restricted to user_id < limit_users to keep the
    result driver-sized; the pass itself streams every row."""
    from ..functions.partitioning import groupby_partition

    ev = ray.data.read_parquet(
        os.path.join(sf_dir, "events.parquet"),
        columns=["event_id", "user_id", "ts", "value"],
    ).filter(expr=f"user_id < {int(limit_users)}")

    schema = pa.schema(
        [
            ("event_id", pa.int64()),
            ("user_id", pa.int64()),
            ("mov_avg", pa.float64()),
        ]
    )

    def roll(part: pa.Table) -> pa.Table:
        df = part.to_pandas().sort_values(["user_id", "ts", "event_id"])
        ma = (
            df.groupby("user_id", sort=False)["value"]
            .rolling(3, min_periods=1)
            .mean()
            .reset_index(level=0, drop=True)
        )
        return pa.Table.from_pandas(
            pd.DataFrame(
                {
                    "event_id": df["event_id"].astype("int64"),
                    "user_id": df["user_id"].astype("int64"),
                    "mov_avg": np.round(ma.to_numpy(np.float64), 6),
                }
            ),
            preserve_index=False,
        )

    out = groupby_partition(ev, "user_id", roll, schema=schema).to_pandas()
    return out.sort_values("event_id").reset_index(drop=True)


def events_corr(sf_dir: str) -> pd.DataFrame:
    """Per-type Pearson correlation between value and second-of-day — the
    sufficient-statistics combiner shape: each block emits one
    (type, n, sx, sy, sxx, syy, sxy) moment row, the driver merges
    (types x blocks) partials and finishes the algebra. Second-of-day is
    bounded (0..86400) so the float64 moment sums never hit the
    epoch^2 ~ 1e18 cancellation zone. Oracle: DuckDB corr() on the same
    derived column."""
    ev = ray.data.read_parquet(
        os.path.join(sf_dir, "events.parquet"),
        columns=["event_type", "ts", "value"],
    )

    def partial(t: pa.Table) -> pa.Table:
        x = np.asarray(t["value"], dtype=np.float64)
        y = (np.asarray(t["ts"]).astype("datetime64[us]").astype(np.int64)
             // 1_000_000 % 86400).astype(np.float64)
        df = pd.DataFrame({"event_type": t["event_type"].to_pandas(),
                           "n": 1.0, "sx": x, "sy": y,
                           "sxx": x * x, "syy": y * y, "sxy": x * y})
        g = df.groupby("event_type", sort=False).sum()
        return pa.Table.from_pandas(g.reset_index(), preserve_index=False)

    m = (
        ev.map_batches(partial, batch_format="pyarrow")
        .to_pandas()
        .groupby("event_type", as_index=False)
        .sum()
    )
    n = m["n"]
    cov = m["sxy"] - m["sx"] * m["sy"] / n
    vx = m["sxx"] - m["sx"] ** 2 / n
    vy = m["syy"] - m["sy"] ** 2 / n
    out = pd.DataFrame(
        {
            "event_type": m["event_type"],
            "n": n.astype("int64"),
            "corr_value_tod": np.round(cov / np.sqrt(vx * vy), 6),
        }
    )
    return out.sort_values("event_type").reset_index(drop=True)


def events_ntile(sf_dir: str, buckets: int = 4) -> pd.DataFrame:
    """Global NTILE(4) quartile assignment over (value, event_id) order —
    equal-count bucketing for quantile-binned feature engineering. Ranks
    come from the block-offset prefix-sum scan (no driver sort, no
    materialization); the DuckDB NTILE size rule (first n%B buckets get
    the extra row) is applied vectorized per block, and each block emits
    a B-row digest partial. Oracle: ntile() window SQL."""
    from ..functions.scan import with_prefix_sum

    ev = ray.data.read_parquet(
        os.path.join(sf_dir, "events.parquet"), columns=["event_id", "value"]
    )
    total = ev.count()
    q, r = divmod(total, buckets)

    def one(t: pa.Table) -> pa.Table:
        return t.append_column(
            "one", pa.array(np.ones(t.num_rows, dtype=np.int64))
        )

    ranked = with_prefix_sum(
        ev.map_batches(one, batch_format="pyarrow"),
        "one",
        ["value", "event_id"],
        out_col="rank0",
    )

    def digest(t: pa.Table) -> pa.Table:
        rk = np.asarray(t["rank0"], dtype=np.int64)
        big = r * (q + 1)  # rows living in the (q+1)-sized leading buckets
        nt = np.where(rk < big, rk // (q + 1), r + (rk - big) // max(q, 1)) + 1
        df = pd.DataFrame({"ntile": nt.astype(np.int64),
                           "n": np.int64(1),
                           "sum_value": np.asarray(t["value"], np.float64)})
        g = df.groupby("ntile", sort=False).sum()
        return pa.Table.from_pandas(g.reset_index(), preserve_index=False)

    parts = ranked.map_batches(digest, batch_format="pyarrow").to_pandas()
    out = parts.groupby("ntile", as_index=False).sum()
    out["n"] = out["n"].astype("int64")
    out["sum_value"] = out["sum_value"].round(2)
    return out.sort_values("ntile").reset_index(drop=True)


def kg_edge_spans(sf_dir: str) -> pd.DataFrame:
    """Temporal KG edge spans: for every distinct (subj, pred, obj) edge,
    the supporting-document count and the first/last conversation start
    time (epoch microseconds) — the time dimension of graph
    materialization (stages/temporal.edge_intervals). Shape: per-conv
    min-ts combiner -> ONE groupby(conv_id).min (conversation-sized),
    native hash join against the triple stream on doc_id (both sides
    fact-sized — no broadcast), then one (subj, pred)-keyed partition
    pass whose per-partition agg is exact (a key never splits). Oracle:
    join SQL over the triples fixture and the transcripts parquet."""
    from ..stages import temporal

    out = temporal.edge_intervals(
        _triples(sf_dir), synth.transcripts_path(sf_dir)
    ).to_pandas()
    return out.sort_values(["subj", "pred", "obj"]).reset_index(drop=True)


def kg_contradictions(sf_dir: str) -> pd.DataFrame:
    """Cross-document conflict detection + latest-wins resolution
    (stages/temporal.contradictions): (subj, pred) groups asserted with
    >1 distinct object, with the winner = the object whose latest
    supporting conversation is most recent (obj-ascending tie-break).
    The knowledge-fusion step the reference's per-note graphs never need
    — a corpus-scale KG does. Oracle: window SQL over the triples
    fixture joined to conversation start times."""
    from ..stages import temporal

    out = temporal.contradictions(
        _triples(sf_dir), synth.transcripts_path(sf_dir)
    ).to_pandas()
    return out.sort_values(["subj", "pred"]).reset_index(drop=True)


def kg_asof_snapshot(sf_dir: str) -> pd.DataFrame:
    """Reproducible as-of read of the KG (stages/temporal.asof_snapshot):
    the distinct edge set whose first supporting conversation started at
    or before the deterministic default cutoff (midpoint of the corpus'
    conversation-start range). Oracle: the same midpoint math in SQL."""
    from ..stages import temporal

    out = temporal.asof_snapshot(
        _triples(sf_dir), synth.transcripts_path(sf_dir)
    ).to_pandas()
    return out.sort_values(["subj", "pred", "obj"]).reset_index(drop=True)


def ntriples_dir(sf_dir: str) -> str:
    sf = os.path.basename(os.path.normpath(sf_dir)).replace("sf", "")
    return f"/tmp/graft_ntriples/sf{sf}/kg"


def kg_ntriples_export(sf_dir: str) -> pd.DataFrame:
    """RDF N-Triples sink+source roundtrip for the materialized KG
    (sources/ntriples): distinct (subj, pred, obj) edges -> sharded
    ``.nt`` files (one content-addressed file per block — resumable,
    no write coordinator) -> independent ``read_text`` decode. Returns
    the exported LINES, so the DuckDB oracle re-derives the full
    encoding (IRI percent-codes + literal backslash escapes) from the
    triples fixture with its own string kernels — a hash match proves
    the wire format, not just self-consistency. The reference only
    materializes per-note NetworkX figures (ehr.py get_relations);
    a corpus KG needs a standard interchange export."""
    import shutil

    from ..functions.partitioning import groupby_partition
    from ..sources import ntriples

    key = ["subj", "pred", "obj"]

    def local_distinct(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return t.select(key)
        return t.select(key).group_by(key, use_threads=False).aggregate([])

    # batch-local distinct combiner thins duplicates before the (subj,
    # pred)-keyed exchange; the partition pass is exact (key never splits)
    edges = groupby_partition(
        _triples(sf_dir).map_batches(local_distinct, batch_format="pyarrow"),
        ["subj", "pred"],
        lambda df: df.drop_duplicates(key),
        batch_format="pandas",
        size_aware=True,
    )
    out_dir = ntriples_dir(sf_dir)
    shutil.rmtree(out_dir, ignore_errors=True)
    ntriples.write_ntriples(edges, out_dir)
    back = ntriples.read_ntriples(out_dir).to_pandas()
    out = pd.DataFrame({"line": back["text"].astype(str)})
    return out.sort_values("line").reset_index(drop=True)


def kg_bgp_match(sf_dir: str) -> pd.DataFrame:
    """SPARQL-style conjunctive triple-pattern query over the
    materialized KG (stages/bgp): "drugs taken as tablets — what adverse
    events and dosages co-occur with them?"

        ?drug -Form-> "tablet" . ?drug -ADE-> ?ae . ?drug -Dosage-> ?dose

    Left-deep hash-join plan: most-constant pattern first, every join
    key-partitioned on the shared variable, DISTINCT at every step. The
    reference draws per-note figures (ehr.py get_relations); corpus-KG
    consumers need this read path. Oracle: DuckDB self-joins over the
    distinct edge set."""
    from ..stages import bgp

    out = bgp.bgp_match(
        _triples(sf_dir),
        [
            ("?drug", "Form", "tablet"),
            ("?drug", "ADE", "?ae"),
            ("?drug", "Dosage", "?dose"),
        ],
    )
    cols = ["drug", "ae", "dose"]
    if out.count() == 0:  # Ray's to_pandas drops columns on zero blocks
        return pd.DataFrame({c: pd.Series([], dtype=str) for c in cols})
    df = out.to_pandas()[cols]
    return df.sort_values(cols).reset_index(drop=True)


def kg_assoc_rules(sf_dir: str) -> pd.DataFrame:
    """A-priori association rules over per-encounter attribute baskets
    (stages/mining.assoc_rules): basket = (doc_id, subj), item =
    pred:obj; distributed support counting, broadcast frequent items,
    per-basket pair emission inside ONE basket-keyed partition pass,
    size-aware pair-count exchange. Oracle: DuckDB self-join + group
    counts at the same thresholds."""
    from ..stages import mining

    return mining.assoc_rules(
        _triples(sf_dir), min_support=0.02, min_confidence=0.2
    )


def kg_entity_alignment(sf_dir: str) -> pd.DataFrame:
    """Cross-snapshot entity alignment (stages/align): documents split
    into two snapshots by an md5 hash of doc_id (first hex digit 0-7 ->
    'a'), each snapshot's subjects reduced to distinct (pred:obj)
    signature sets, and entities aligned across snapshots by signature
    Jaccard >= 0.5 — bipartite candidate generation blocked on shared
    features with hot-feature chunk splitting, never all-pairs. Oracle:
    the same split + distinct feature sets + Jaccard in SQL over the
    kg_triples fixture."""
    from ..stages import align

    trip = _triples(sf_dir)

    def side_of(doc_ids: "pd.Series") -> np.ndarray:
        return np.where(
            np.array([hashlib.md5(str(d).encode()).hexdigest()[0]
                      in "01234567" for d in doc_ids]),
            "a", "b",
        )

    feats = align.side_features(trip, side_of)
    return align.align_pairs(feats, min_jaccard=0.5)


def kg_conv_dedup(sf_dir: str) -> pd.DataFrame:
    """Conversation-level exact dedup — the "drop duplicated transcripts
    before paying for extraction" pre-step of the KG chain: assemble
    conversations (one groupby(conv_id) shuffle), md5 the assembled
    text, keep the min-conv_id representative per digest
    (stages/dedupe.exact_dedup; only (md5, id) pairs shuffle). Oracle:
    the same assembly string_agg in SQL."""
    docs = _docs(sf_dir)
    out = dedupe.exact_dedup(docs).to_pandas()[["keep_id", "n_dups"]]
    out["n_dups"] = out["n_dups"].astype("int64")
    return out.sort_values("keep_id").reset_index(drop=True)


def kg_turn_latency(sf_dir: str) -> pd.DataFrame:
    """Agent-transcript latency profile: mean seconds between consecutive
    turns, grouped by (previous role -> role) transition. One conv-keyed
    partition pass (groupby_partition) sorts each conversation and emits
    transition (n, sum_gap_us) partials; the role-pair space is
    role-vocabulary bounded, so the driver merge is dimension-sized.
    Integer microsecond sums keep the float division to the final
    driver step. Oracle: lag() window SQL."""
    from ..functions.partitioning import groupby_partition

    tp = synth.transcripts_path(sf_dir)
    ds = ray.data.read_parquet(tp, columns=["conv_id", "turn_idx", "role", "ts"])

    schema = pa.schema(
        [("role_a", pa.string()), ("role_b", pa.string()),
         ("n", pa.int64()), ("sum_gap_us", pa.int64())]
    )

    def partial(part: pa.Table) -> pa.Table:
        df = part.to_pandas().sort_values(["conv_id", "turn_idx"])
        us = df["ts"].astype("datetime64[us]").astype("int64")
        same = df["conv_id"].eq(df["conv_id"].shift(1))
        g = (
            pd.DataFrame(
                {
                    "role_a": df["role"].shift(1)[same],
                    "role_b": df["role"][same],
                    "gap": (us - us.shift(1))[same].astype("int64"),
                }
            )
            .groupby(["role_a", "role_b"], sort=False)
            .agg(n=("gap", "size"), sum_gap_us=("gap", "sum"))
        )
        return pa.Table.from_pandas(g.reset_index(), preserve_index=False)

    parts = groupby_partition(ds, "conv_id", partial, schema=schema).to_pandas()
    out = parts.groupby(["role_a", "role_b"], as_index=False).sum()
    out["n"] = out["n"].astype("int64")
    out["mean_gap_s"] = np.round(
        out["sum_gap_us"] / out["n"] / 1_000_000.0, 6
    )
    return (
        out[["role_a", "role_b", "n", "mean_gap_s"]]
        .sort_values(["role_a", "role_b"])
        .reset_index(drop=True)
    )


def events_json_extract(sf_dir: str) -> pd.DataFrame:
    """Semi-structured extraction: parse the events.props JSON column,
    pull the numeric field k, and aggregate per event_type (n, sum_k,
    distinct k values). JSON parse is inherently per-string CPU (like
    regex NER) and runs inside map_batches on worker CPUs; everything
    after the parse is a combiner — one (type, k)-distinct partial per
    block, dimension-bounded (k is 0..99), merged on the driver.
    Oracle: DuckDB ->> JSON extraction."""
    import json

    ev = ray.data.read_parquet(
        os.path.join(sf_dir, "events.parquet"), columns=["event_type", "props"]
    )

    def partial(t: pa.Table) -> pa.Table:
        ks = np.fromiter(
            (json.loads(p)["k"] for p in t["props"].to_pylist()),
            dtype=np.int64,
            count=t.num_rows,
        )
        df = pd.DataFrame({"event_type": t["event_type"].to_pandas(), "k": ks})
        g = df.groupby(["event_type", "k"], sort=False).size().rename("n")
        return pa.Table.from_pandas(g.reset_index(), preserve_index=False)

    parts = ev.map_batches(partial, batch_format="pyarrow").to_pandas()
    fine = parts.groupby(["event_type", "k"], as_index=False)["n"].sum()
    fine["nk"] = fine["n"] * fine["k"]
    out = fine.groupby("event_type", as_index=False).agg(
        n=("n", "sum"), sum_k=("nk", "sum"), n_distinct_k=("k", "size")
    )
    for c in ("n", "sum_k", "n_distinct_k"):
        out[c] = out[c].astype("int64")
    return out.sort_values("event_type").reset_index(drop=True)


def kg_negative_samples(sf_dir: str) -> pd.DataFrame:
    """Deterministic negative sampling for KG-embedding training: for
    every positive triple, one corrupted triple whose object is drawn
    content-addressed from the GLOBAL object vocabulary —
    idx = md5(doc|subj|pred|obj) % |objs|, bumped by one (mod n) when it
    lands on the true object. The object vocabulary is ontology-bounded:
    per-block distinct partials merge on the driver and broadcast back
    (ray.put once), so corruption is a zero-shuffle map_batches; the
    same draw is reproducible at any parallelism AND in SQL (hex-md5
    indexing into the numbered vocabulary). Oracle: pure SQL over the
    triples fixture."""
    trip = _triples(sf_dir)

    def obj_partial(t: pa.Table) -> pa.Table:
        u = t["obj"].to_pandas().drop_duplicates()
        return pa.table({"obj": pa.array(u.to_numpy(dtype=object), pa.string())})

    objs = np.sort(
        trip.map_batches(obj_partial, batch_format="pyarrow")
        .to_pandas()["obj"]
        .drop_duplicates()
        .to_numpy(dtype=object)
    )
    vocab_ref = ray.put(objs)

    def corrupt(t: pa.Table) -> pa.Table:
        from ..functions.broadcast import bget

        vocab = bget(vocab_ref)
        n = len(vocab)
        df = t.select(["doc_id", "subj", "pred", "obj"]).to_pandas()
        idx = np.fromiter(
            (
                int(
                    hashlib.md5(f"{d}|{s}|{p}|{o}".encode("utf-8")).hexdigest()[:8],
                    16,
                )
                % n
                for d, s, p, o in zip(df["doc_id"], df["subj"], df["pred"], df["obj"])
            ),
            dtype=np.int64,
            count=len(df),
        )
        neg = vocab[idx]
        hit = neg == df["obj"].to_numpy(dtype=object)
        idx[hit] = (idx[hit] + 1) % n
        df["neg_obj"] = vocab[idx]
        return pa.Table.from_pandas(df, preserve_index=False)

    out = trip.map_batches(corrupt, batch_format="pyarrow").to_pandas()
    return out.sort_values(["doc_id", "subj", "pred", "obj"]).reset_index(drop=True)


def csv_dir(sf_dir: str) -> str:
    sf = os.path.basename(os.path.normpath(sf_dir)).replace("sf", "")
    return f"/tmp/graft_csv/sf{sf}/events"


def events_csv_roundtrip(sf_dir: str) -> pd.DataFrame:
    """CSV sink+source roundtrip (the third interchange format after
    Parquet and JSONL): write a typed projection of events as sharded
    CSV (``Dataset.write_csv``, one file per block), read it back with
    ``ray.data.read_csv``, digest per row. The oracle parses the SAME
    shards with DuckDB's independent CSV reader, so a hash match proves
    quoting/typing fidelity across writers, not self-consistency."""
    import shutil

    ev = ray.data.read_parquet(
        os.path.join(sf_dir, "events.parquet"),
        columns=["event_id", "user_id", "event_type", "value"],
    )
    out_dir = csv_dir(sf_dir)
    shutil.rmtree(out_dir, ignore_errors=True)
    os.makedirs(out_dir, exist_ok=True)
    ev.write_csv(out_dir)
    back = ray.data.read_csv(out_dir)

    def digest(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "event_id": t["event_id"].cast(pa.int64()),
                "user_id": t["user_id"].cast(pa.int64()),
                "event_type": t["event_type"],
                "value": pa.array(
                    np.round(np.asarray(t["value"], np.float64), 6)
                ),
            }
        )

    out = back.map_batches(digest, batch_format="pyarrow").to_pandas()
    return out.sort_values("event_id").reset_index(drop=True)


def docs_hash_embed(sf_dir: str) -> pd.DataFrame:
    """Feature-hashing document embeddings (stages/embed, the A6 embedder
    interface with the shipped deterministic backend): zero-shuffle
    actor-pool pass, integer hashed counts -> L2-normalized float64.
    Digest: md5 of the 6dp component string per doc. Oracle: independent
    serial recompute fixture."""
    from ..stages import embed

    docs = ray.data.read_parquet(
        os.path.join(sf_dir, "documents.parquet"), columns=["doc_id", "text"]
    )
    out = embed.embed_documents(docs).to_pandas()
    out["vec_md5"] = [
        hashlib.md5(",".join(f"{x:.6f}" for x in v).encode()).hexdigest()
        for v in out["embedding"]
    ]
    out["doc_id"] = out["doc_id"].astype("int64")
    return (
        out[["doc_id", "vec_md5"]].sort_values("doc_id").reset_index(drop=True)
    )


def docs_lang_centroid(sf_dir: str) -> pd.DataFrame:
    """Per-language corpus profile vector: the INTEGER hashed-count
    vectors of stages/embed summed per lang (exact, order-free — the
    reason the embedder accumulates ints), normalized once on the
    driver, digested at 6dp. Combiner shape: one (lang, 64-int vector)
    partial per block. Oracle: independent serial fixture."""
    from ..stages.embed import HashEmbedder

    docs = ray.data.read_parquet(
        os.path.join(sf_dir, "documents.parquet"), columns=["lang", "text"]
    )

    def partial(t: pa.Table) -> pa.Table:
        emb = HashEmbedder()
        df = pd.DataFrame({"lang": t["lang"].to_pandas()})
        counts = np.stack([emb.counts(x or "") for x in t["text"].to_pylist()])
        sums = {}
        for lang, row in zip(df["lang"], counts):
            acc = sums.get(lang)
            sums[lang] = row if acc is None else acc + row
        langs = sorted(sums)
        return pa.table(
            {
                "lang": pa.array(langs, pa.string()),
                "vec": pa.array([sums[l].tolist() for l in langs],
                                pa.list_(pa.int64())),
            }
        )

    parts = docs.map_batches(partial, batch_format="pyarrow").to_pandas()
    agg = {}
    for lang, v in zip(parts["lang"], parts["vec"]):
        v = np.asarray(v, dtype=np.int64)
        agg[lang] = v if lang not in agg else agg[lang] + v
    rows = []
    for lang in sorted(agg):
        c = agg[lang].astype(np.float64)
        n = float(np.linalg.norm(c))
        v = c / (n if n else 1.0)
        rows.append(
            {
                "lang": lang,
                "vec_md5": hashlib.md5(
                    ",".join(f"{x:.6f}" for x in v).encode()
                ).hexdigest(),
            }
        )
    return pd.DataFrame(rows, columns=["lang", "vec_md5"])


def docs_curation_funnel(sf_dir: str) -> pd.DataFrame:
    """Quality-filter APPLY side — the curation funnel: every document is
    classified by its FIRST failing gate (length -> repetition ->
    lexical diversity) or kept, and the funnel reports per-stage counts.
    One zero-shuffle map_batches computes all three metrics vectorized
    per batch and emits a <=4-row stage-count partial; the driver merges
    (stages x blocks) rows. Gates: n_tokens >= 20, top_bigram_frac <=
    0.07, type-token ratio >= 0.55. Oracle: the same gates in SQL (both
    engines split on RE2 \\s+, so tokenization is bit-identical)."""
    docs = ray.data.read_parquet(
        os.path.join(sf_dir, "documents.parquet"), columns=["text"]
    )

    def partial(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        texts = pc.fill_null(t["text"], "")
        keep = np.asarray(pc.utf8_length(pc.utf8_trim_whitespace(texts))) > 0
        words = pc.split_pattern_regex(pc.utf8_lower(texts), r"\s+")
        stages = []
        for ok, w in zip(keep, words.to_pylist()):
            if not ok:
                continue
            w = [x for x in w if x]
            n = len(w)
            if n < 20:
                stages.append("fail_length")
                continue
            if n >= 2:
                bc = pd.Series(
                    [a + " " + b for a, b in zip(w, w[1:])]
                ).value_counts()
                tbf = float(bc.iloc[0]) / float(bc.sum())
            else:
                tbf = 0.0
            if tbf > 0.07:
                stages.append("fail_repetition")
                continue
            if len(set(w)) / n < 0.55:
                stages.append("fail_diversity")
                continue
            stages.append("kept")
        vc = pd.Series(stages, dtype=object).value_counts()
        return pa.table(
            {
                "stage": pa.array(vc.index.to_numpy(dtype=object), pa.string()),
                "n": pa.array(vc.to_numpy(np.int64)),
            }
        )

    parts = docs.map_batches(partial, batch_format="pyarrow").to_pandas()
    out = parts.groupby("stage", as_index=False)["n"].sum()
    out["n"] = out["n"].astype("int64")
    return out.sort_values("stage").reset_index(drop=True)


def kg_incremental_edges(sf_dir: str) -> pd.DataFrame:
    """Incremental graph materialization: split the triple stream by doc
    parity (yesterday's ingest vs today's), build each split's edge
    table independently (stages/graph.edge_weights — the mergeable
    combiner), and fold them with a (subj, obj) sum — proving the edge
    table a daily job maintains equals the single-pass result. Oracle:
    one-shot SQL over the full triples fixture."""
    trip = _triples(sf_dir)

    def parity(keep_even: bool):
        def f(t: pa.Table) -> pa.Table:
            last = np.fromiter(
                (int(d[-1], 36) % 2 == 0 for d in t["doc_id"].to_pylist()),
                dtype=bool,
                count=t.num_rows,
            )
            return t.filter(pa.array(last if keep_even else ~last))

        return f

    old = graph.edge_weights(trip.map_batches(parity(True), batch_format="pyarrow"))
    new = graph.edge_weights(trip.map_batches(parity(False), batch_format="pyarrow"))
    merged = (
        pd.concat([old, new])
        .groupby(["subj", "obj"], as_index=False)["n"]
        .sum()
    )
    merged["n"] = merged["n"].astype("int64")
    return merged.sort_values(["subj", "obj"]).reset_index(drop=True)


def docs_compress_ratio(sf_dir: str) -> pd.DataFrame:
    """Compression-ratio quality signal (zlib level 6, the CCNet /
    RedPajama-family redundancy heuristic): compressed_len / raw_len per
    document — low ratios flag templated or repetitive text. Per-string
    CPU inside map_batches (like the JSON parse and regex NER); output
    is one small row per doc. Oracle: independent serial zlib recompute
    fixture (not SQL-expressible)."""
    import zlib

    docs = ray.data.read_parquet(
        os.path.join(sf_dir, "documents.parquet"), columns=["doc_id", "text"]
    )

    def ratios(t: pa.Table) -> pa.Table:
        texts = [x or "" for x in t["text"].to_pylist()]
        comp = np.fromiter(
            (len(zlib.compress(x.encode("utf-8"), 6)) for x in texts),
            dtype=np.int64,
            count=len(texts),
        )
        raw = np.fromiter(
            (len(x.encode("utf-8")) for x in texts), dtype=np.int64, count=len(texts)
        )
        ratio = np.round(comp / np.maximum(raw, 1), 6)
        return pa.table(
            {
                "doc_id": t["doc_id"].cast(pa.int64()),
                "compress_ratio": pa.array(ratio),
            }
        )

    out = docs.map_batches(ratios, batch_format="pyarrow").to_pandas()
    return out.sort_values("doc_id").reset_index(drop=True)


def docs_bm25(sf_dir: str) -> pd.DataFrame:
    """BM25 top-10 for a fixed 3-term query — two streamed passes
    (block-partial corpus stats, then broadcast-constant scoring with
    composite-key block top-k partials); see text_analysis.bm25_topk."""
    docs = ray.data.read_parquet(
        os.path.join(sf_dir, "documents.parquet"), columns=["doc_id", "text"]
    )
    out = text_analysis.bm25_topk(docs, ["spark", "window", "join"], k=10)
    out["doc_id"] = out["doc_id"].astype("int64")
    return out.reset_index(drop=True)


def docs_typo_pairs(sf_dir: str) -> pd.DataFrame:
    """Vocabulary variant pairs at Levenshtein <= 2 via SymSpell
    symmetric-delete blocking + banded-DP verify (dedupe.typo_pairs);
    oracle is the exhaustive levenshtein self-join, equal because the
    delete-neighborhood blocking has recall 1 by construction."""
    docs = ray.data.read_parquet(
        os.path.join(sf_dir, "documents.parquet"), columns=["text"]
    )
    out = dedupe.typo_pairs(docs, max_d=2, min_len=3).to_pandas()
    if out.empty:
        return pd.DataFrame(
            {"tok_a": pd.Series([], dtype=str),
             "tok_b": pd.Series([], dtype=str),
             "d": pd.Series([], dtype="int64")}
        )
    return out.sort_values(["tok_a", "tok_b"]).reset_index(drop=True)


def kg_node_similarity(sf_dir: str) -> pd.DataFrame:
    """Neighbor-set Jaccard similarity over the entity co-occurrence
    graph (edges = pairs co-occurring in >= 2 docs) — the link-prediction
    companion to kg_triangles, via the distributed wedge enumeration in
    graph.neighbor_jaccard."""
    counts = _cooccurrence(sf_dir)
    pairs = counts[counts["is_pair"] & (counts["n"] >= 2)][["ent_a", "ent_b"]]
    if pairs.empty:
        return pd.DataFrame(
            {"ent_a": pd.Series([], dtype=str),
             "ent_b": pd.Series([], dtype=str),
             "jaccard": pd.Series([], dtype="float64")}
        )
    ds = ray.data.from_pandas(pairs.reset_index(drop=True))
    # driver_merge: the entity node space is the closed ontology's
    # surface vocabulary (dimension-bounded), so the wedge-partial sum
    # runs on the driver (same justification as kg_triangles)
    return graph.neighbor_jaccard(ds, min_jaccard=0.25, driver_merge=True)


def _project_snapshot_a(t: pa.Table) -> pa.Table:
    """(doc_id, md5(text)) digest projection of the documents table."""
    ids = t["doc_id"].cast(pa.int64())
    hs = [hashlib.md5((x or "").encode("utf-8")).hexdigest()
          for x in t["text"].to_pylist()]
    return pa.table({"doc_id": ids, "h": pa.array(hs, pa.string())})


def _project_snapshot_b(t: pa.Table) -> pa.Table:
    """Digest projection of the deterministic snapshot-B mutation keyed
    on md5(doc_id)[0]: '0' dropped, '1'/'2' edited (' v2' suffix), '3'
    additionally cloned under doc_id + 10_000_000."""
    ids = t["doc_id"].cast(pa.int64()).to_pylist()
    texts = [x or "" for x in t["text"].to_pylist()]
    out_ids, out_h = [], []
    for i, txt in zip(ids, texts):
        c = hashlib.md5(str(i).encode()).hexdigest()[0]
        if c == "0":
            continue
        body = txt + " v2" if c in ("1", "2") else txt
        out_ids.append(i)
        out_h.append(hashlib.md5(body.encode("utf-8")).hexdigest())
        if c == "3":
            out_ids.append(i + 10_000_000)
            out_h.append(
                hashlib.md5(("new doc " + str(i)).encode("utf-8")).hexdigest()
            )
    return pa.table(
        {"doc_id": pa.array(out_ids, pa.int64()),
         "h": pa.array(out_h, pa.string())}
    )


def docs_snapshot_diff(sf_dir: str) -> pd.DataFrame:
    """CDC snapshot diff (stages/diff.snapshot_diff): snapshot B is a
    deterministic mutation of the documents table keyed on
    md5(doc_id)[0] — '0' rows dropped, '1'/'2' rows edited, '3' rows
    cloned as new ids — and the diff classifies added/removed/changed
    from (key, digest) projections only."""
    docs = ray.data.read_parquet(
        os.path.join(sf_dir, "documents.parquet"), columns=["doc_id", "text"]
    )

    a = docs.map_batches(_project_snapshot_a, batch_format="pyarrow")
    b = docs.map_batches(_project_snapshot_b, batch_format="pyarrow")
    out = diff.snapshot_diff(a, b, key_col="doc_id", cmp_col="h").to_pandas()
    if out.empty:
        return pd.DataFrame(
            {"doc_id": pd.Series([], dtype="int64"),
             "change": pd.Series([], dtype=str)}
        )
    out["doc_id"] = out["doc_id"].astype("int64")
    return out.sort_values("doc_id").reset_index(drop=True)


def kg_alias_fuzzy(sf_dir: str) -> pd.DataFrame:
    """Fuzzy alias-candidate pairs for canonicalization: per-entity-type
    surface norms at Levenshtein <= 2, via the SymSpell delete-blocked
    pair machinery (dedupe.term_variant_pairs with group scoping). This
    is the open-vocabulary companion to canonicalize.ALIAS_GROUPS: at
    10^12 turns the alias-candidate generation must itself be blocked —
    never an all-pairs over the surface vocabulary."""
    ment = _mentions(sf_dir)

    def norm_terms(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "ent_type": t["ent_type"],
                "term": pa.array(
                    [canonicalize.normalize(x) for x in t["text"].to_pylist()],
                    pa.string(),
                ),
            }
        )

    terms = ment.map_batches(norm_terms, batch_format="pyarrow")
    out = dedupe.term_variant_pairs(
        terms, term_col="term", group_col="ent_type", max_d=2
    ).to_pandas()
    if out.empty:
        return pd.DataFrame(
            {"ent_type": pd.Series([], dtype=str),
             "surf_a": pd.Series([], dtype=str),
             "surf_b": pd.Series([], dtype=str),
             "d": pd.Series([], dtype="int64")}
        )
    out = out.rename(columns={"term_a": "surf_a", "term_b": "surf_b"})
    return (
        out.sort_values(["ent_type", "surf_a", "surf_b"])
        .reset_index(drop=True)
    )


def kg_nodes_fuzzy(sf_dir: str) -> pd.DataFrame:
    """Open-vocabulary canonicalization: node table with the fuzzy
    (Levenshtein <= 1, SymSpell-blocked, type-scoped) alias edges merged
    into the union-find alongside the variant rules and ALIAS_GROUPS —
    the north rule's entity-linking step with a distributed candidate
    generator. Oracle: serial fixture with a naive full-DP all-pairs
    merge (independent of the engine's banded/blocked path)."""
    ment = _mentions(sf_dir)
    nodes, _ = canonicalize.build_nodes(ment, fuzzy_max_d=1)
    df = nodes.to_pandas()
    return df.sort_values("node_id").reset_index(drop=True)


def media_dedup(sf_dir: str) -> pd.DataFrame:
    """Exact multimodal payload dedup: the media table unioned with
    deterministic copies (every 7th media_id re-labelled '-copy')
    reduced to digest-only dup groups via multimodal.payload_dedup_groups
    — payload bytes never shuffle."""
    media = ray.data.read_parquet(media_path(sf_dir))

    def make_copies(t: pa.Table) -> pa.Table:
        ids = t["media_id"].to_pylist()
        keep = [i for i, m in enumerate(ids) if int(m[2:]) % 7 == 0]
        sub = t.select(["media_id", "payload"]).take(
            pa.array(keep, pa.int64())
        )
        return pa.table(
            {
                "media_id": pa.array(
                    [sub["media_id"][i].as_py() + "-copy" for i in range(len(sub))],
                    pa.string(),
                ),
                "payload": sub["payload"],
            }
        )

    base = media.select_columns(["media_id", "payload"])
    doubled = base.union(media.map_batches(make_copies, batch_format="pyarrow"))
    out = multimodal.payload_dedup_groups(doubled).to_pandas()
    if out.empty:
        return pd.DataFrame(
            {"payload_md5": pd.Series([], dtype=str),
             "n_copies": pd.Series([], dtype="int64"),
             "keep_id": pd.Series([], dtype=str)}
        )
    return out.sort_values("keep_id").reset_index(drop=True)


def docs_upsert(sf_dir: str) -> pd.DataFrame:
    """MERGE INTO (insert-or-update) applying the snapshot-B mutation
    digests over snapshot A via stages/diff.upsert_apply; B wins on
    conflict, A-only keys survive. Note B's '0'-class rows are absent
    from B (deletes), so under upsert-without-tombstones they retain
    their A digest — the oracle encodes exactly that."""
    docs = ray.data.read_parquet(
        os.path.join(sf_dir, "documents.parquet"), columns=["doc_id", "text"]
    )
    a = docs.map_batches(_project_snapshot_a, batch_format="pyarrow")
    b = docs.map_batches(_project_snapshot_b, batch_format="pyarrow")
    out = diff.upsert_apply(a, b, key_col="doc_id").to_pandas()
    out["doc_id"] = out["doc_id"].astype("int64")
    return out.sort_values("doc_id").reset_index(drop=True)


def embeddings_dim_ablation(sf_dir: str, half: int = 32, k: int = 5) -> pd.DataFrame:
    """Matryoshka-style dimension ablation: per probe query, the overlap
    between the full-dim cosine top-k and the first-``half``-dims top-k
    (the quality signal for truncating stored embeddings). Two
    brute_force_topk passes — streamed partial top-k, driver set
    overlap; the truncation happens per batch (zero-copy slice), the
    corpus is never re-materialized at the lower dim."""
    from ..stages import similarity

    vecs = ray.data.read_parquet(os.path.join(sf_dir, "embeddings.parquet"))
    qdf = (
        vecs.filter(expr="vec_id <= 2")
        .to_pandas()
        .sort_values("vec_id")
    )
    queries = np.stack([np.asarray(v, dtype=np.float64) for v in qdf["embedding"]])
    qids = qdf["vec_id"].to_numpy()
    full = similarity.brute_force_topk(vecs, queries, query_ids=qids, k=k)

    def truncate(t: pa.Table) -> pa.Table:
        mat = np.stack(
            [np.asarray(v)[:half] for v in t["embedding"].to_pylist()]
        )
        return pa.table(
            {"vec_id": t["vec_id"],
             "embedding": pa.array(list(mat), pa.list_(pa.float32()))}
        )

    half_ds = vecs.map_batches(truncate, batch_format="pyarrow")
    halftop = similarity.brute_force_topk(
        half_ds, queries[:, :half], query_ids=qids, k=k
    )
    rows = []
    for qid in qids:
        f = set(full.loc[full["query_id"] == qid, "vec_id"])
        h = set(halftop.loc[halftop["query_id"] == qid, "vec_id"])
        rows.append((int(qid), len(f & h)))
    return pd.DataFrame(rows, columns=["query_id", "n_overlap"]).astype(
        {"query_id": "int64", "n_overlap": "int64"}
    )


def kg_kcore(sf_dir: str) -> pd.DataFrame:
    """K-core decomposition of the entity co-occurrence graph (edges =
    pairs co-occurring in >= 2 docs) — the KG noise-pruning signal
    (nodes below core k drop out of a k-dense backbone). Edge partials
    are distributed (same co-occurrence pass as kg_triangles); the peel
    itself is driver math over the ontology-bounded edge set. Oracle:
    independent iterated-deletion fixture."""
    counts = _cooccurrence(sf_dir)
    pairs = counts[counts["is_pair"] & (counts["n"] >= 2)]
    return graph.kcore(pairs, a_col="ent_a", b_col="ent_b")


def kg_pred_cardinality(sf_dir: str) -> pd.DataFrame:
    """Relation-type cardinality profile over the distinct triple set:
    per predicate, triple count + distinct subject/object counts — the
    schema-quality report a KG curator reads before canonicalization.
    Distinct pairs pre-reduce per block (combiner), the final count is a
    pred-keyed partition pass (predicate space = closed ontology)."""
    from ..functions.partitioning import groupby_partition

    tri = _triples(sf_dir)

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        df = df[["pred", "subj", "obj"]]
        su = df[["pred", "subj"]].drop_duplicates()
        ob = df[["pred", "obj"]].drop_duplicates()
        n = df.groupby("pred").size().reset_index(name="c")
        su = su.rename(columns={"subj": "v"}).assign(kind="s")
        ob = ob.rename(columns={"obj": "v"}).assign(kind="o")
        cn = n.rename(columns={"c": "v"}).assign(kind="n")
        cn["v"] = cn["v"].astype(str)
        out = pd.concat([su, ob, cn], ignore_index=True)
        return out.astype({"pred": str, "v": str, "kind": str})

    parts = tri.map_batches(partial, batch_format="pandas")

    schema = pa.schema(
        [("pred", pa.string()), ("n_triples", pa.int64()),
         ("n_subj", pa.int64()), ("n_obj", pa.int64())]
    )

    def reduce(df: pd.DataFrame) -> pd.DataFrame:
        rows = []
        for pred, grp in df.groupby("pred", sort=False):
            n = grp.loc[grp["kind"] == "n", "v"].astype("int64").sum()
            rows.append(
                (pred, int(n),
                 grp.loc[grp["kind"] == "s", "v"].nunique(),
                 grp.loc[grp["kind"] == "o", "v"].nunique())
            )
        return pd.DataFrame(
            rows, columns=["pred", "n_triples", "n_subj", "n_obj"]
        ).astype({"n_triples": "int64", "n_subj": "int64", "n_obj": "int64"})

    out = groupby_partition(
        parts, "pred", reduce, batch_format="pandas", schema=schema
    ).to_pandas()
    return out.sort_values("pred").reset_index(drop=True)


def embeddings_int8_quant(sf_dir: str) -> pd.DataFrame:
    """Scalar int8 quantization audit: per dimension, the (min, max)
    calibration from one streamed pass of block partials, then a second
    broadcast-constant pass measuring mean absolute reconstruction
    error — the storage-reduction quality report (PQ's scalar cousin).
    Two zero-shuffle passes; dim-bounded driver merges only."""
    from ..functions.broadcast import bget

    vecs = ray.data.read_parquet(
        os.path.join(sf_dir, "embeddings.parquet"), columns=["embedding"]
    )

    def minmax(t: pa.Table) -> pa.Table:
        m = np.stack([np.asarray(v) for v in t["embedding"].to_pylist()])
        d = m.shape[1]
        return pa.table(
            {
                "dim": pa.array(np.arange(1, d + 1, dtype=np.int64)),
                "lo": pa.array(m.min(axis=0).astype(np.float64)),
                "hi": pa.array(m.max(axis=0).astype(np.float64)),
                "n": pa.array(np.full(d, len(m), dtype=np.int64)),
            }
        )

    p1 = vecs.map_batches(minmax, batch_format="pyarrow").to_pandas()
    cal = p1.groupby("dim").agg(lo=("lo", "min"), hi=("hi", "max"),
                                n=("n", "sum"))
    lo = cal["lo"].to_numpy()
    hi = cal["hi"].to_numpy()
    scale = (hi - lo) / 255.0
    cal_ref = ray.put((lo, scale))

    def err(t: pa.Table) -> pa.Table:
        lo_, scale_ = bget(cal_ref)
        m = np.stack(
            [np.asarray(v, dtype=np.float64) for v in t["embedding"].to_pylist()]
        )
        q = np.clip(np.round((m - lo_) / np.maximum(scale_, 1e-30)), 0, 255)
        rec = q * scale_ + lo_
        ae = np.abs(rec - m)
        d = m.shape[1]
        return pa.table(
            {
                "dim": pa.array(np.arange(1, d + 1, dtype=np.int64)),
                "sae": pa.array(ae.sum(axis=0)),
            }
        )

    p2 = vecs.map_batches(err, batch_format="pyarrow").to_pandas()
    sae = p2.groupby("dim")["sae"].sum()
    out = pd.DataFrame(
        {
            "dim": cal.index.to_numpy(dtype="int64"),
            "scale": np.round(scale, 6),
            "mae": np.round(sae.to_numpy() / cal["n"].to_numpy(), 6),
        }
    )
    return out.sort_values("dim").reset_index(drop=True)


def kg_random_walks(sf_dir: str) -> pd.DataFrame:
    """DeepWalk-style deterministic walk corpus over the co-occurrence
    graph (edges with >= 2 co-docs): the graph-embedding training-data
    prep stage — via the frontier-join distributed path (adjacency never
    leaves the object store; graph.random_walks_distributed). Oracle:
    serial recomputation fixture (same md5 hop rule, single process,
    plain dicts)."""
    counts = _cooccurrence(sf_dir)
    pairs = counts[counts["is_pair"] & (counts["n"] >= 2)][["ent_a", "ent_b"]]
    if pairs.empty:
        return pd.DataFrame(
            {"start": pd.Series([], dtype=str),
             "walk_idx": pd.Series([], dtype="int64"),
             "path": pd.Series([], dtype=str)}
        )
    out = graph.random_walks_distributed(
        ray.data.from_pandas(pairs.reset_index(drop=True))
    ).to_pandas()
    out["walk_idx"] = out["walk_idx"].astype("int64")
    return out.sort_values(["start", "walk_idx"]).reset_index(drop=True)


def docs_retrieve_rerank(sf_dir: str) -> pd.DataFrame:
    """Two-stage retrieval: BM25 recall (top-20) then a second-stage
    rerank scoring ONLY the broadcast candidate set — the
    ANN/BM25-then-cross-encoder shape with a deterministic surrogate
    reranker (count of the exact phrase 'window join'). Final order:
    phrase count desc, BM25 desc, doc_id; top-5."""
    docs = ray.data.read_parquet(
        os.path.join(sf_dir, "documents.parquet"), columns=["doc_id", "text"]
    )
    stage1 = text_analysis.bm25_topk(docs, ["spark", "window", "join"], k=20)
    cand_ids = set(int(x) for x in stage1["doc_id"])
    bm25 = {int(r["doc_id"]): float(r["score"]) for _, r in stage1.iterrows()}
    cand_ref = ray.put(cand_ids)

    def rerank(t: pa.Table) -> pa.Table:
        from ..functions.broadcast import bget

        cs = bget(cand_ref)
        ids = [int(x) for x in t["doc_id"].to_pylist()]
        keep = [i for i, d in enumerate(ids) if d in cs]
        out_ids, phr = [], []
        for i in keep:
            txt = (t["text"][i].as_py() or "").lower()
            out_ids.append(ids[i])
            phr.append(txt.count("window join"))
        return pa.table(
            {"doc_id": pa.array(out_ids, pa.int64()),
             "n_phrase": pa.array(phr, pa.int64())}
        )

    scored = docs.map_batches(rerank, batch_format="pyarrow").to_pandas()
    scored["score"] = scored["doc_id"].map(bm25).round(6)
    order = np.lexsort(
        (scored["doc_id"].to_numpy(),
         -scored["score"].to_numpy(),
         -scored["n_phrase"].to_numpy())
    )[:5]
    out = scored.iloc[order][["doc_id", "n_phrase", "score"]]
    return out.astype({"doc_id": "int64", "n_phrase": "int64"}).reset_index(
        drop=True
    )


def docs_split_leakage(sf_dir: str) -> pd.DataFrame:
    """Train/dev split contamination audit: near-dup pairs (exact n-gram
    Jaccard >= 0.8) that CROSS a deterministic md5 hash split (first hex
    digit 0-3 -> dev) — the leakage check every eval split needs before
    training. Pair generation is the existing blocked dedup pass; the
    split tag is a per-row hash, so the audit adds zero shuffles."""
    docs = ray.data.read_parquet(
        os.path.join(sf_dir, "documents.parquet"), columns=["doc_id", "text"]
    )
    pairs = dedupe.ngram_jaccard_pairs(docs, threshold=0.8, k=5)
    if pairs.empty:
        return pd.DataFrame(
            {"doc_a": pd.Series([], dtype=str),
             "doc_b": pd.Series([], dtype=str),
             "split_a": pd.Series([], dtype=str),
             "split_b": pd.Series([], dtype=str)}
        )

    def split_of(ids) -> np.ndarray:
        return np.where(
            np.array([hashlib.md5(str(d).encode()).hexdigest()[0] in "0123"
                      for d in ids]),
            "dev", "train",
        )

    out = pairs.copy()
    out["split_a"] = split_of(out["doc_a"])
    out["split_b"] = split_of(out["doc_b"])
    out = out[out["split_a"] != out["split_b"]]
    out = out[["doc_a", "doc_b", "split_a", "split_b"]].astype(str)
    return out.sort_values(["doc_a", "doc_b"]).reset_index(drop=True)


def kg_turn_dedup(sf_dir: str) -> pd.DataFrame:
    """Transcript stutter removal: consecutive turns with identical text
    inside a conversation (the retry/duplicate-submit artifact every
    agent-transcript corpus carries). One conv-keyed partition pass,
    vectorized shift compare; emits per-conv drop counts (conversations
    with >= 1 dropped turn)."""
    from ..functions.partitioning import groupby_partition

    path = synth.transcripts_path(sf_dir)
    ds = ray.data.read_parquet(path, columns=["conv_id", "turn_idx", "text"])

    schema = pa.schema(
        [("conv_id", pa.string()), ("n_dropped", pa.int64())]
    )

    def drops(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(["conv_id", "turn_idx"])
        same_conv = df["conv_id"].eq(df["conv_id"].shift())
        same_text = df["text"].fillna("").eq(df["text"].fillna("").shift())
        dup = (same_conv & same_text)
        out = (
            pd.DataFrame({"conv_id": df["conv_id"], "dup": dup})
            .groupby("conv_id")["dup"].sum()
            .reset_index(name="n_dropped")
        )
        out = out[out["n_dropped"] > 0]
        return out.astype({"conv_id": str, "n_dropped": "int64"})

    out = groupby_partition(
        ds, "conv_id", drops, batch_format="pandas", schema=schema
    ).to_pandas()
    if out.empty:
        return pd.DataFrame(
            {"conv_id": pd.Series([], dtype=str),
             "n_dropped": pd.Series([], dtype="int64")}
        )
    return out.sort_values("conv_id").reset_index(drop=True)


def embeddings_kmeans_iter(sf_dir: str) -> pd.DataFrame:
    """Full-corpus Lloyd k-means (3 rounds, k=8): the iterative-ML
    pattern — per-round streamed (cell, count, sum) partials + driver
    centroid update + re-broadcast (similarity.kmeans_full). Output is
    the flattened centroid matrix; oracle = serial single-process
    recomputation (exact because the per-cell sums are order-free
    modulo float addition, absorbed by the 6-dp round)."""
    from ..stages import similarity

    vecs = ray.data.read_parquet(
        os.path.join(sf_dir, "embeddings.parquet"),
        columns=["vec_id", "embedding"],
    )
    cent = similarity.kmeans_full(vecs, k=8, iters=3)
    rows = []
    for c in range(cent.shape[0]):
        for dim in range(cent.shape[1]):
            rows.append((c, dim, round(float(cent[c, dim]), 6)))
    return pd.DataFrame(rows, columns=["cell", "dim", "c"]).astype(
        {"cell": "int64", "dim": "int64"}
    )


def embeddings_logreg(sf_dir: str) -> pd.DataFrame:
    """Distributed full-batch logistic regression (5 GD epochs over
    streamed gradient partials; similarity.logreg_full_batch). Output:
    the learned weight vector, bias last; serial-recompute oracle."""
    from ..stages import similarity

    vecs = ray.data.read_parquet(
        os.path.join(sf_dir, "embeddings.parquet"),
        columns=["vec_id", "embedding"],
    )
    w = similarity.logreg_full_batch(vecs, epochs=5, lr=0.5)
    return pd.DataFrame(
        {"idx": np.arange(len(w), dtype="int64"), "w": np.round(w, 6)}
    )


def kg_mention_overlaps(sf_dir: str) -> pd.DataFrame:
    """Annotation-QC: counts of OVERLAPPING mention pairs per unordered
    type pair (span conflicts are the primary noise source feeding
    canonicalization — e.g. Dosage 'one tablet' vs Form 'tablet'). One
    doc-keyed partition pass; inside, docs grouped by mention count so
    each distinct n costs one vectorized interval-overlap grid (same
    by-size trick as the co-occurrence pair emission). Oracle: serial
    fixture (the SQL mention CTE has no span offsets)."""
    from ..functions.partitioning import groupby_partition

    ment = _mentions(sf_dir)

    schema = pa.schema(
        [("type_a", pa.string()), ("type_b", pa.string()),
         ("n", pa.int64())]
    )

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(["doc_id", "start", "end", "ent_id"])
        sizes = df.groupby("doc_id", sort=False).size().to_numpy()
        starts = df["start"].to_numpy()
        ends = df["end"].to_numpy()
        types = df["ent_type"].to_numpy()
        offs = np.cumsum(sizes) - sizes
        a_parts, b_parts = [], []
        for n in np.unique(sizes):
            if n < 2:
                continue
            sel = np.where(sizes == n)[0]
            idx = (offs[sel][:, None] + np.arange(n)[None, :])
            s = starts[idx.ravel()].reshape(len(sel), n)
            e = ends[idx.ravel()].reshape(len(sel), n)
            ty = types[idx.ravel()].reshape(len(sel), n)
            ii, jj = np.triu_indices(n, k=1)
            ov = (s[:, ii] < e[:, jj]) & (s[:, jj] < e[:, ii])
            if ov.any():
                ta = ty[:, ii][ov]
                tb = ty[:, jj][ov]
                a_parts.append(np.minimum(ta, tb))
                b_parts.append(np.maximum(ta, tb))
        if not a_parts:
            return pd.DataFrame(
                {"type_a": pd.Series([], dtype=str),
                 "type_b": pd.Series([], dtype=str),
                 "n": pd.Series([], dtype="int64")}
            )
        out = (
            pd.DataFrame({"type_a": np.concatenate(a_parts),
                          "type_b": np.concatenate(b_parts)})
            .groupby(["type_a", "type_b"])
            .size()
            .reset_index(name="n")
        )
        return out.astype({"type_a": str, "type_b": str, "n": "int64"})

    parts = groupby_partition(
        ment, "doc_id", partial, batch_format="pandas", schema=schema
    ).to_pandas()
    if parts.empty:
        return pd.DataFrame(
            {"type_a": pd.Series([], dtype=str),
             "type_b": pd.Series([], dtype=str),
             "n": pd.Series([], dtype="int64")}
        )
    out = parts.groupby(["type_a", "type_b"], as_index=False)["n"].sum()
    out["n"] = out["n"].astype("int64")
    return out.sort_values(["type_a", "type_b"]).reset_index(drop=True)


def docs_f2_sketch(sf_dir: str) -> pd.DataFrame:
    """Second frequency moment (self-join size) of the corpus token
    histogram, two ways: the mergeable AMS ±1 sketch (64 estimators,
    median-of-means — per-block state is 64 int64s regardless of
    vocabulary) and the exact sum-of-squares (vocabulary-bounded block
    partials). At open vocabularies only the sketch survives; carrying
    both makes the estimate auditable. Serial-recompute fixture oracle
    (determinism comes from the content-hash sign matrix)."""
    from ..functions.sketch import ams_f2_estimate, ams_f2_partial

    docs = ray.data.read_parquet(
        os.path.join(sf_dir, "documents.parquet"), columns=["text"]
    )

    def partial(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        texts = pc.fill_null(t["text"], "")
        flat = pc.list_flatten(
            pc.split_pattern_regex(pc.utf8_lower(texts), r"\s+")
        )
        keep = np.asarray(pc.utf8_length(flat)) > 0
        s = pd.Series(np.asarray(flat)[keep])
        vc = s.value_counts(sort=False)
        dot = ams_f2_partial(vc.to_dict())
        exact_part = pd.DataFrame(
            {"tok": vc.index.to_numpy(dtype=object),
             "c": vc.to_numpy(np.int64)}
        )
        out = pa.table(
            {
                "kind": pa.array(["dot"] * 1 + ["cnt"] * len(exact_part)),
                "tok": pa.array([""] + exact_part["tok"].tolist(), pa.string()),
                "vals": pa.array(
                    [dot.tolist()]
                    + [[int(x)] for x in exact_part["c"]],
                    pa.list_(pa.int64()),
                ),
            }
        )
        return out

    parts = docs.map_batches(partial, batch_format="pyarrow").to_pandas()
    dots = np.sum(
        np.stack([np.asarray(v) for v in parts.loc[parts["kind"] == "dot", "vals"]]),
        axis=0,
    )
    est = ams_f2_estimate(dots)
    cnt = parts[parts["kind"] == "cnt"].copy()
    cnt["c"] = [int(v[0]) for v in cnt["vals"]]
    exact = float((cnt.groupby("tok")["c"].sum() ** 2).sum())
    return pd.DataFrame(
        {
            "metric": ["f2_ams", "f2_exact"],
            "value": [round(est, 2), round(exact, 2)],
        }
    )


def docs_heavy_hitters(sf_dir: str, min_inv_freq: int = 30, capacity: int = 64) -> pd.DataFrame:
    """Exact heavy hitters (tokens with frequency >= 1/min_inv_freq of
    all tokens) via the classic two-pass sketch design: pass 1 builds a
    per-block Misra-Gries summary (fixed ``capacity`` counters per block
    regardless of vocabulary — the whole point at open vocabulary) plus
    the exact block token count; MG merge on the driver guarantees NO
    false negatives for any item above N/(capacity+1) > N/min_inv_freq.
    Pass 2 exact-counts ONLY the <= capacity candidates (id set broadcast
    once via ray.put) and filters with pure integer arithmetic
    (n * min_inv_freq >= N), so the result is exact, not approximate.
    The corpus vocabulary never moves through a shuffle."""
    from ..functions.broadcast import bget
    from ..functions.sketch import misra_gries, misra_gries_merge

    docs = ray.data.read_parquet(
        os.path.join(sf_dir, "documents.parquet"), columns=["text"]
    )

    def _block_tokens(t: pa.Table) -> pd.Series:
        import pyarrow.compute as pc

        flat = pc.list_flatten(
            pc.split_pattern_regex(
                pc.utf8_lower(pc.fill_null(t["text"], "")), r"\s+"
            )
        )
        arr = np.asarray(flat)
        return pd.Series(arr[np.asarray(pc.utf8_length(flat)) > 0])

    def mg_partial(t: pa.Table) -> pa.Table:
        toks = _block_tokens(t)
        mg = misra_gries(toks.value_counts(sort=False).to_dict(), capacity)
        return pa.table(
            {
                "token": pa.array(list(mg.keys()) + [""], pa.string()),
                "c": pa.array(list(mg.values()) + [len(toks)], pa.int64()),
                "is_total": pa.array([False] * len(mg) + [True]),
            }
        )

    parts = docs.map_batches(mg_partial, batch_format="pyarrow").to_pandas()
    n_total = int(parts.loc[parts["is_total"], "c"].sum())
    # MG merge = sum counters across summaries, then one re-reduce
    # (Agarwal et al., "Mergeable Summaries") — the cross-block sum is a
    # tiny pandas groupby over <= capacity rows per block
    summed = (
        parts[~parts["is_total"]].groupby("token")["c"].sum().to_dict()
    )
    merged = misra_gries_merge([summed], capacity)
    cand_ref = ray.put(frozenset(merged.keys()))

    def exact_partial(t: pa.Table) -> pa.Table:
        cand = bget(cand_ref)
        toks = _block_tokens(t)
        vc = toks[toks.isin(cand)].value_counts(sort=False)
        return pa.table(
            {
                "token": pa.array(vc.index.to_numpy(dtype=object), pa.string()),
                "n": pa.array(vc.to_numpy(np.int64)),
            }
        )

    exact = (
        docs.map_batches(exact_partial, batch_format="pyarrow")
        .to_pandas()
        .groupby("token", as_index=False)["n"].sum()
    )
    out = exact[exact["n"] * min_inv_freq >= n_total].astype({"n": "int64"})
    return out.sort_values(["n", "token"], ascending=[False, True]).reset_index(
        drop=True
    )


def kg_label_prop(sf_dir: str) -> pd.DataFrame:
    """Community detection over the KG edge list via deterministic
    synchronous weighted label propagation — the distributed part is the
    edge-weight combiner (graph.edge_weights, dimension-bounded driver
    merge); the fixed-point iteration runs on the driver exactly like
    kg_pagerank. Serial fixture oracle re-runs the identical spec on the
    serial pipeline's triples."""
    trip = _triples(sf_dir)
    edges = graph.edge_weights(trip)
    out = graph.label_propagation(edges)
    return out.sort_values("node").reset_index(drop=True)


def docs_cm_profile(
    sf_dir: str, capacity: int = 64, w: int = 256, d: int = 4, k: int = 10
) -> pd.DataFrame:
    """Count-Min-audited top-k terms: ONE streamed pass folds each block's
    token counts into BOTH a Misra-Gries candidate summary and a (d x w)
    Count-Min partial (the CM sketch is linear, so block matrices SUM to
    the corpus sketch — d*w int64s of mergeable state regardless of
    vocabulary); a second pass exact-counts only the <= capacity
    broadcast candidates. Output: top-k by exact count with the CM
    point estimate alongside (n_cm >= n_exact always — CM never
    underestimates), the standard sketch-audit layout. Candidate
    completeness needs capacity > N/freq(k-th term) — at open vocabulary
    size capacity accordingly (the MG guarantee, see docs_heavy_hitters).
    """
    from ..functions.broadcast import bget
    from ..functions.sketch import cm_partial, cm_query, misra_gries, misra_gries_merge

    docs = ray.data.read_parquet(
        os.path.join(sf_dir, "documents.parquet"), columns=["text"]
    )

    def _block_counts(t: pa.Table) -> pd.Series:
        import pyarrow.compute as pc

        flat = pc.list_flatten(
            pc.split_pattern_regex(
                pc.utf8_lower(pc.fill_null(t["text"], "")), r"\s+"
            )
        )
        arr = np.asarray(flat)
        s = pd.Series(arr[np.asarray(pc.utf8_length(flat)) > 0])
        return s.value_counts(sort=False)

    def fold_partial(t: pa.Table) -> pa.Table:
        vc = _block_counts(t).to_dict()
        mg = misra_gries(vc, capacity)
        cm = cm_partial(vc, w, d).ravel()
        return pa.table(
            {
                "kind": pa.array(["mg"] * len(mg) + ["cm"]),
                "token": pa.array(list(mg.keys()) + [""], pa.string()),
                "vals": pa.array(
                    [[int(c)] for c in mg.values()] + [cm.tolist()],
                    pa.list_(pa.int64()),
                ),
            }
        )

    parts = docs.map_batches(fold_partial, batch_format="pyarrow").to_pandas()
    mg_rows = parts[parts["kind"] == "mg"]
    # cross-block MG counter sum (mergeable-summaries composition)
    acc: dict = {}
    for t, v in zip(mg_rows["token"], mg_rows["vals"]):
        acc[t] = acc.get(t, 0) + int(v[0])
    merged = misra_gries_merge([acc], capacity)
    cm_mat = np.sum(
        [np.asarray(v).reshape(d, w) for v in parts.loc[parts["kind"] == "cm", "vals"]],
        axis=0,
    )
    cand_ref = ray.put(frozenset(merged.keys()))

    def exact_partial(t: pa.Table) -> pa.Table:
        cand = bget(cand_ref)
        vc = _block_counts(t)
        vc = vc[vc.index.isin(cand)]
        return pa.table(
            {
                "token": pa.array(vc.index.to_numpy(dtype=object), pa.string()),
                "n": pa.array(vc.to_numpy(np.int64)),
            }
        )

    exact = (
        docs.map_batches(exact_partial, batch_format="pyarrow")
        .to_pandas()
        .groupby("token", as_index=False)["n"].sum()
        .sort_values(["n", "token"], ascending=[False, True])
        .head(k)
        .reset_index(drop=True)
    )
    exact["n_cm"] = cm_query(cm_mat, exact["token"].tolist()).astype("int64")
    return exact.rename(columns={"n": "n_exact"}).astype(
        {"n_exact": "int64", "n_cm": "int64"}
    )


def docs_rrf_fusion(sf_dir: str) -> pd.DataFrame:
    """Reciprocal-rank fusion (Cormack et al. 2009) of two retrieval
    rankings: BM25 top-50 for the fixed term query and a length prior
    (n_chars desc) top-50. Both rankings reduce via block-local top-k
    partials (never a global sort); the fusion itself is driver math
    over <= 100 rows. rrf = sum 1/(60 + rank); top-10 reported."""
    docs = ray.data.read_parquet(
        os.path.join(sf_dir, "documents.parquet"), columns=["doc_id", "text"]
    )
    ra = text_analysis.bm25_topk(docs, ["spark", "window", "join"], k=50)
    ra["doc_id"] = ra["doc_id"].astype("int64")
    ra["r"] = np.arange(1, len(ra) + 1)

    meta = ray.data.read_parquet(
        os.path.join(sf_dir, "documents.parquet"), columns=["doc_id", "n_chars"]
    )

    def top_partial(t: pa.Table) -> pa.Table:
        df = t.to_pandas().sort_values(
            ["n_chars", "doc_id"], ascending=[False, True]
        )
        return pa.Table.from_pandas(df.head(50), preserve_index=False)

    rb = (
        meta.map_batches(top_partial, batch_format="pyarrow")
        .to_pandas()
        .sort_values(["n_chars", "doc_id"], ascending=[False, True])
        .head(50)
        .reset_index(drop=True)
    )
    rb["r"] = np.arange(1, len(rb) + 1)

    both = pd.concat(
        [ra[["doc_id", "r"]], rb[["doc_id", "r"]]], ignore_index=True
    )
    both["rrf"] = 1.0 / (60.0 + both["r"])
    out = both.groupby("doc_id", as_index=False)["rrf"].sum()
    out["rrf"] = out["rrf"].round(6)
    out = out.sort_values(["rrf", "doc_id"], ascending=[False, True]).head(10)
    return out.astype({"doc_id": "int64"}).reset_index(drop=True)


def docs_ppjoin_pairs(sf_dir: str) -> pd.DataFrame:
    """Exact set-similarity join with GUARANTEED recall (prefix
    filtering — dedupe.ppjoin_pairs): unlike docs_minhash_pairs, the
    oracle equality here is unconditional, not recall-permitting, and
    unlike docs_ngram_jaccard no df cap is involved and only the
    (1-t) prefix fraction of each doc's shingles is exploded."""
    docs = ray.data.read_parquet(
        os.path.join(sf_dir, "documents.parquet"), columns=["doc_id", "text"]
    )
    docs = docs.map_batches(
        lambda t: t.set_column(
            t.schema.get_field_index("doc_id"),
            "doc_id",
            t["doc_id"].cast(pa.string()),
        ),
        batch_format="pyarrow",
    )
    verified = dedupe.ppjoin_pairs(docs, threshold=0.8, k=5).to_pandas()
    if verified.empty:
        return pd.DataFrame(
            {"doc_a": pd.Series([], dtype=str), "doc_b": pd.Series([], dtype=str),
             "jaccard": pd.Series([], dtype="float64")}
        )
    verified["jaccard"] = verified["jaccard"].round(4)
    return verified.sort_values(["doc_a", "doc_b"]).reset_index(drop=True)


def kg_linkpred_auc(sf_dir: str) -> pd.DataFrame:
    """Link-prediction evaluation over the entity co-occurrence graph:
    hold out a deterministic 1/5 of edges (md5 of the canonical pair),
    score candidate pairs by neighbor-Jaccard computed on the TRAIN
    graph (graph.neighbor_jaccard — distributed wedge pass), and report
    Mann-Whitney AUC of held-out edges vs all train-node non-edges
    (non-wedge pairs score 0). The negative/positive enumeration is
    driver math over the dimension-bounded node space — the same
    justification as pagerank; at an open node space sample negatives
    per hash instead. Serial fixture oracle re-runs the identical spec
    on the serial pipeline's mentions."""
    import hashlib as _hl

    counts = _cooccurrence(sf_dir)
    pairs = counts[counts["is_pair"] & (counts["n"] >= 2)][["ent_a", "ent_b"]]
    empty = pd.DataFrame(
        {"n_pos": pd.Series([], dtype="int64"),
         "n_neg": pd.Series([], dtype="int64"),
         "auc": pd.Series([], dtype="float64")}
    )
    if pairs.empty:
        return empty
    key = [
        int(_hl.md5(f"{a}|{b}".encode()).hexdigest()[:8], 16) % 5 == 0
        for a, b in zip(pairs["ent_a"], pairs["ent_b"])
    ]
    key = np.asarray(key)
    test = pairs[key]
    train = pairs[~key]
    if test.empty or train.empty:
        return empty
    ds = ray.data.from_pandas(train.reset_index(drop=True))
    scores = graph.neighbor_jaccard(ds, min_jaccard=0.0, driver_merge=True)
    smap = {
        (a, b): j
        for a, b, j in zip(scores["ent_a"], scores["ent_b"], scores["jaccard"])
    }
    node_set = set(train["ent_a"]) | set(train["ent_b"])
    nodes = sorted(node_set)
    all_edges = set(zip(pairs["ent_a"], pairs["ent_b"]))
    pos = [
        smap.get((a, b), 0.0)
        for a, b in zip(test["ent_a"], test["ent_b"])
        if a in node_set and b in node_set
    ]
    neg = [
        smap.get((a, b), 0.0)
        for i, a in enumerate(nodes)
        for b in nodes[i + 1:]
        if (a, b) not in all_edges
    ]
    auc = graph.ranked_auc(pos, neg)
    return pd.DataFrame(
        {"n_pos": np.array([len(pos)], dtype="int64"),
         "n_neg": np.array([len(neg)], dtype="int64"),
         "auc": [round(auc, 6)]}
    )


def _perturbed_media(t: pa.Table) -> pa.Table:
    """Every 5th media row duplicated with ONE byte flipped — the
    deterministic near-duplicate injection shared by media_phash_dup
    and its serial mirror."""
    ids = t["media_id"].to_pylist()
    payloads = t["payload"].to_pylist()
    out_ids, out_payloads = [], []
    for m, p in zip(ids, payloads):
        if int(m[2:]) % 5 == 0:
            b = bytearray(p)
            b[0] = (b[0] + 1) % 256
            out_ids.append(m + "-p")
            out_payloads.append(bytes(b))
    return pa.table(
        {
            "media_id": pa.array(ids + out_ids, pa.string()),
            "payload": pa.array(payloads + out_payloads, pa.large_binary()),
        }
    )


def media_phash_dup(sf_dir: str) -> pd.DataFrame:
    """Perceptual-hash near-duplicate detection over the media corpus
    plus injected 1-byte-flip copies: actor-pool aHash, 4x16-bit
    pigeonhole banding (recall 1 for hamming <= 2 by construction),
    popcount verify — multimodal.phash_near_dup_pairs. Payload bytes
    never shuffle. Serial fixture oracle: identical hash spec +
    exhaustive O(n^2) hamming."""
    media = ray.data.read_parquet(media_path(sf_dir))
    withdups = media.map_batches(
        lambda t: _perturbed_media(t.select(["media_id", "payload"])),
        batch_format="pyarrow",
    )
    return multimodal.phash_near_dup_pairs(withdups, max_hamming=2)


def kg_ppr(sf_dir: str) -> pd.DataFrame:
    """Personalized PageRank from the lexicographically smallest subject
    node (the same deterministic seed rule as kg_khop): distributed
    edge-weight combiner + driver random-walk-with-restart
    (graph.personalized_pagerank). The graph-retrieval primitive —
    'rank everything by relevance to X'."""
    trip = _triples(sf_dir)
    edges = graph.edge_weights(trip)
    if edges.empty:
        return pd.DataFrame(
            {"node": pd.Series([], dtype=str),
             "rank": pd.Series([], dtype="float64")}
        )
    seed = edges["subj"].min()
    out = graph.personalized_pagerank(edges, seed)
    return out.sort_values("node").reset_index(drop=True)


def docs_partition_skew(sf_dir: str, num_partitions: int = 64) -> pd.DataFrame:
    """Engine diagnostics: hash-partition balance report for the
    documents table under the repo's own partitioner
    (functions/partitioning.add_hash_partition on doc_id) — the tool a
    100-TB operator runs BEFORE picking a partition count. One streamed
    pass emits per-block (partition, n) partials (bounded by
    num_partitions x blocks); the driver reports occupancy and skew.
    Serial fixture oracle re-runs the identical hash over the table."""
    from ..functions.partitioning import add_hash_partition

    docs = ray.data.read_parquet(
        os.path.join(sf_dir, "documents.parquet"), columns=["doc_id"]
    )

    def partial(t: pa.Table) -> pa.Table:
        tagged = add_hash_partition(t, ["doc_id"], num_partitions)
        g = (
            tagged.select(["_part"])
            .group_by("_part", use_threads=False)
            .aggregate([([], "count_all")])
        )
        return g.rename_columns(["part", "n"])

    parts = (
        docs.map_batches(partial, batch_format="pyarrow")
        .to_pandas()
        .groupby("part")["n"].sum()
    )
    counts = parts.reindex(range(num_partitions), fill_value=0).to_numpy(np.int64)
    mean = counts.mean()
    return pd.DataFrame(
        {
            "n_partitions": np.array([num_partitions], dtype="int64"),
            "n_rows": np.array([int(counts.sum())], dtype="int64"),
            "occupied": np.array([int((counts > 0).sum())], dtype="int64"),
            "max_rows": np.array([int(counts.max())], dtype="int64"),
            "min_rows": np.array([int(counts.min())], dtype="int64"),
            "skew_ratio": [round(float(counts.max() / mean), 4)],
            "cv": [round(float(counts.std() / mean), 4)],
        }
    )


def docs_scd2(sf_dir: str) -> pd.DataFrame:
    """Slowly-changing-dimension TYPE 2 history build from two snapshots
    (the docs_snapshot_diff A/B pair): one doc_id-keyed partition pass
    over the unioned (key, digest, side) projections emits versioned
    rows with validity ranges — unchanged keys get one open row,
    changed keys a closed v1 + open v2, removed keys a closed v1, added
    keys an open v1. Digests only — text never shuffles. The warehouse
    upsert-history op, as one co-grouped pass."""
    from ..functions.partitioning import groupby_partition

    docs = ray.data.read_parquet(
        os.path.join(sf_dir, "documents.parquet"), columns=["doc_id", "text"]
    )
    def _tag(project, side):
        def fn(t: pa.Table) -> pa.Table:
            p = project(t)
            return p.append_column("side", pa.array([side] * len(p), pa.int32()))

        return fn

    a = docs.map_batches(_tag(_project_snapshot_a, 0), batch_format="pyarrow")
    b = docs.map_batches(_tag(_project_snapshot_b, 1), batch_format="pyarrow")
    t0, t1, t_inf = "2024-01-01", "2024-02-01", "9999-12-31"

    schema = pa.schema(
        [("doc_id", pa.int64()), ("version", pa.int64()), ("h", pa.string()),
         ("valid_from", pa.string()), ("valid_to", pa.string())]
    )

    def versions(df: pd.DataFrame) -> pd.DataFrame:
        rows = []
        for doc_id, grp in df.groupby("doc_id", sort=False):
            ha = grp.loc[grp["side"] == 0, "h"]
            hb = grp.loc[grp["side"] == 1, "h"]
            ha = ha.iloc[0] if len(ha) else None
            hb = hb.iloc[0] if len(hb) else None
            if ha is not None and hb is not None:
                if ha == hb:
                    rows.append((doc_id, 1, ha, t0, t_inf))
                else:
                    rows.append((doc_id, 1, ha, t0, t1))
                    rows.append((doc_id, 2, hb, t1, t_inf))
            elif ha is not None:
                rows.append((doc_id, 1, ha, t0, t1))
            else:
                rows.append((doc_id, 1, hb, t1, t_inf))
        return pd.DataFrame(
            rows, columns=["doc_id", "version", "h", "valid_from", "valid_to"]
        ).astype({"doc_id": "int64", "version": "int64"})

    out = groupby_partition(
        a.union(b), "doc_id", versions, batch_format="pandas", schema=schema
    ).to_pandas()
    return out.sort_values(["doc_id", "version"]).reset_index(drop=True)


def kg_adamic_adar(sf_dir: str) -> pd.DataFrame:
    """Adamic-Adar link scores over the co-occurrence graph (edges =
    pairs co-occurring in >= 2 docs) — the rarity-weighted companion to
    kg_node_similarity, sharing its wedge enumeration shape
    (graph.adamic_adar)."""
    counts = _cooccurrence(sf_dir)
    pairs = counts[counts["is_pair"] & (counts["n"] >= 2)][["ent_a", "ent_b"]]
    if pairs.empty:
        return pd.DataFrame(
            {"ent_a": pd.Series([], dtype=str),
             "ent_b": pd.Series([], dtype=str),
             "aa": pd.Series([], dtype="float64")}
        )
    ds = ray.data.from_pandas(pairs.reset_index(drop=True))
    return graph.adamic_adar(ds)


def docs_zipf_fit(sf_dir: str, top_k: int = 100) -> pd.DataFrame:
    """Zipf's-law fit of the corpus token distribution: OLS slope of
    ln(count) ~ ln(rank) over the top-k tokens — the standard corpus
    health diagnostic (natural text sits near slope -1; synthetic or
    boilerplate-heavy corpora deviate). Token counts reduce via
    vocabulary-bounded block partials (at open vocabulary feed the
    Misra-Gries top-k from docs_heavy_hitters instead); the regression
    runs once on the driver with the two-pass CENTERED formula (raw
    moments lose ~6 dp vs regr_slope — playbook)."""
    docs = ray.data.read_parquet(
        os.path.join(sf_dir, "documents.parquet"), columns=["text"]
    )

    def counts(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        flat = pc.list_flatten(
            pc.split_pattern_regex(
                pc.utf8_lower(pc.fill_null(t["text"], "")), r"\s+"
            )
        )
        arr = np.asarray(flat)
        s = pd.Series(arr[np.asarray(pc.utf8_length(flat)) > 0])
        vc = s.value_counts(sort=False)
        return pa.table(
            {"token": pa.array(vc.index.to_numpy(dtype=object), pa.string()),
             "n": pa.array(vc.to_numpy(np.int64))}
        )

    merged = (
        docs.map_batches(counts, batch_format="pyarrow")
        .to_pandas()
        .groupby("token", as_index=False)["n"].sum()
        .sort_values(["n", "token"], ascending=[False, True])
        .head(top_k)
        .reset_index(drop=True)
    )
    x = np.log(np.arange(1, len(merged) + 1, dtype=np.float64))
    y = np.log(merged["n"].to_numpy(np.float64))
    dx, dy = x - x.mean(), y - y.mean()
    slope = float((dx * dy).sum() / (dx * dx).sum())
    intercept = float(y.mean() - slope * x.mean())
    return pd.DataFrame(
        {
            "n_tokens_used": np.array([len(merged)], dtype="int64"),
            "slope": [round(slope, 6)],
            "intercept": [round(intercept, 6)],
        }
    )


def kg_betweenness(sf_dir: str) -> pd.DataFrame:
    """Approximate betweenness centrality over the KG edge list (Brandes
    dependency accumulation from the 16 smallest nodes — deterministic
    sampling): distributed edge-weight combiner + driver accumulation
    (graph.betweenness_approx), the broker-detection companion to
    kg_pagerank/kg_kcore."""
    trip = _triples(sf_dir)
    edges = graph.edge_weights(trip)
    out = graph.betweenness_approx(edges)
    return out.sort_values("node").reset_index(drop=True)


def docs_heaps_fit(sf_dir: str, checkpoints: int = 20) -> pd.DataFrame:
    """Heaps'-law vocabulary-growth fit: V(N) ≈ K·N^β. The sequential
    "scan the corpus and watch vocabulary grow" definition distributes
    cleanly: V(c) = #tokens whose FIRST occurrence (min doc_id) <= c —
    one (token, min(doc_id)) partition pass plus per-block token-count
    partials for N(c), then cumulative sums and a centered ln-ln OLS
    over `checkpoints` evenly spaced doc prefixes on the driver.
    β well under 1 = the corpus keeps repeating itself (dedup signal)."""
    from ..functions.partitioning import groupby_partition

    docs = ray.data.read_parquet(
        os.path.join(sf_dir, "documents.parquet"), columns=["doc_id", "text"]
    )

    def explode(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        texts = pc.fill_null(t["text"], "")
        words = pc.split_pattern_regex(pc.utf8_lower(texts), r"\s+")
        flat = pc.list_flatten(words)
        parents = np.asarray(pc.list_parent_indices(words))
        ids = np.asarray(t["doc_id"].to_pandas())[parents] if len(parents) else np.array([], np.int64)
        keep = np.asarray(pc.utf8_length(flat)) > 0
        return pa.table(
            {
                "token": pa.array(np.asarray(flat)[keep], pa.string()),
                "doc_id": pa.array(ids[keep], pa.int64()),
            }
        )

    exploded = docs.map_batches(explode, batch_format="pyarrow").materialize()

    first_schema = pa.schema([("token", pa.string()), ("first_doc", pa.int64())])

    def first_occurrence(df: pd.DataFrame) -> pd.DataFrame:
        out = df.groupby("token", as_index=False)["doc_id"].min()
        out.columns = ["token", "first_doc"]
        return out.astype({"token": str, "first_doc": "int64"})

    firsts = groupby_partition(
        exploded, "token", first_occurrence,
        batch_format="pandas", schema=first_schema,
    ).to_pandas()

    def doc_tokens(t: pa.Table) -> pa.Table:
        g = (
            t.group_by("doc_id", use_threads=False)
            .aggregate([([], "count_all")])
        )
        return g.rename_columns(["doc_id", "n"])

    per_doc = (
        exploded.map_batches(doc_tokens, batch_format="pyarrow")
        .to_pandas()
        .groupby("doc_id")["n"].sum()
        .sort_index()
    )
    doc_ids = per_doc.index.to_numpy()
    n_cum = per_doc.to_numpy(np.int64).cumsum()
    v_cum = (
        pd.Series(firsts["first_doc"].to_numpy()).value_counts()
        .reindex(doc_ids, fill_value=0)
        .to_numpy(np.int64)
        .cumsum()
    )
    idx = np.unique(
        np.linspace(0, len(doc_ids) - 1, min(checkpoints, len(doc_ids))).astype(int)
    )
    x = np.log(n_cum[idx].astype(np.float64))
    y = np.log(v_cum[idx].astype(np.float64))
    dx, dy = x - x.mean(), y - y.mean()
    beta = float((dx * dy).sum() / (dx * dx).sum())
    k = float(np.exp(y.mean() - beta * x.mean()))
    return pd.DataFrame(
        {
            "n_checkpoints": np.array([len(idx)], dtype="int64"),
            "vocab_final": np.array([int(v_cum[-1])], dtype="int64"),
            "tokens_final": np.array([int(n_cum[-1])], dtype="int64"),
            "beta": [round(beta, 6)],
            "k": [round(k, 4)],
        }
    )


def docs_burstiness(sf_dir: str, top_k: int = 15) -> pd.DataFrame:
    """Term burstiness (collection frequency / document frequency) for
    the top-k terms by cf — Church & Gale's clumping diagnostic: cf/df
    near 1 means a term scatters uniformly, high means it clumps in few
    docs. One streamed pass emits per-block (token, cf, df-partial...)
    — df needs per-doc distinctness, so the block partial counts BOTH
    raw occurrences and per-doc-distinct occurrences; vocabulary-bounded
    driver merge (at open vocabulary: MG candidates first)."""
    docs = ray.data.read_parquet(
        os.path.join(sf_dir, "documents.parquet"), columns=["doc_id", "text"]
    )

    def partial(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        texts = pc.fill_null(t["text"], "")
        words = pc.split_pattern_regex(pc.utf8_lower(texts), r"\s+")
        flat = pc.list_flatten(words)
        parents = np.asarray(pc.list_parent_indices(words))
        keep = np.asarray(pc.utf8_length(flat)) > 0
        df_ = pd.DataFrame(
            {"token": np.asarray(flat)[keep], "doc": parents[keep]}
        )
        cf = df_.groupby("token").size()
        dfq = df_.drop_duplicates().groupby("token").size()
        out = pd.DataFrame({"cf": cf, "df": dfq}).reset_index()
        return pa.Table.from_pandas(out, preserve_index=False)

    parts = docs.map_batches(partial, batch_format="pyarrow").to_pandas()
    m = parts.groupby("token", as_index=False).agg(cf=("cf", "sum"), df=("df", "sum"))
    m = m.sort_values(["cf", "token"], ascending=[False, True]).head(top_k)
    m["burstiness"] = (m["cf"] / m["df"]).round(6)
    return (
        m.astype({"cf": "int64", "df": "int64"})
        .sort_values(["cf", "token"], ascending=[False, True])
        .reset_index(drop=True)
    )


def docs_cdc_dedup(sf_dir: str) -> pd.DataFrame:
    """Content-defined-chunking dedup ratio over the documents corpus
    plus injected shifted copies (each 4th doc re-appended with a short
    prefix — exactly the edit pattern fixed-window dedup misses and CDC
    absorbs): dedupe.cdc_chunk_stats. Serial fixture oracle recomputes
    with an independent per-byte rolling-hash implementation."""
    docs = ray.data.read_parquet(
        os.path.join(sf_dir, "documents.parquet"), columns=["doc_id", "text"]
    )

    def with_shifted(t: pa.Table) -> pa.Table:
        ids = t["doc_id"].to_pylist()
        texts = [x or "" for x in t["text"].to_pylist()]
        extra = [
            "PREFIX " + txt for i, txt in zip(ids, texts) if int(i) % 4 == 0
        ]
        return pa.table({"text": pa.array(texts + extra, pa.string())})

    shifted = docs.map_batches(with_shifted, batch_format="pyarrow")
    return dedupe.cdc_chunk_stats(shifted)


def kg_pagerank_dist(sf_dir: str) -> pd.DataFrame:
    """kg_pagerank via the open-node-space path (graph.pagerank_distributed):
    edges never collect on the driver — per-round rank broadcast + one
    zero-shuffle contribution pass, dst-partition-complete blocks keeping
    the float accumulation order bit-identical to the driver path. Same
    serial fixture oracle as kg_pagerank."""
    trip = _triples(sf_dir)
    out = graph.pagerank_distributed(trip)
    return out.sort_values("node").reset_index(drop=True)


def kg_transe(sf_dir: str) -> pd.DataFrame:
    """TransE knowledge-graph embeddings trained distributed over the
    extracted triple set (graph.transe_train): full-batch margin-ranking
    epochs whose gradient partials are INTEGER coefficient matrices —
    exact under any block structure, so the output (embeddings + the
    per-epoch loss curve) is bit-identical to the serial fixture at any
    parallelism. Oracle: serial fixture re-running the shared spec
    (graph.transe) on independently-extracted triples."""
    return graph.transe_train(_triples(sf_dir))


def kg_transe_eval(sf_dir: str) -> pd.DataFrame:
    """TransE link-prediction evaluation (Bordes 2013 'raw' setting):
    content-addressed ~20% triple holdout, train on the rest
    (graph.transe_train), rank each held-out true object against the full
    trained object vocabulary — hits@{1,3,10}, mean rank, MRR from
    per-block INTEGER rank histograms (exact merge, bit-identical to the
    serial fixture at any parallelism)."""
    return graph.transe_eval(_triples(sf_dir))


def kg_constraint_violations(sf_dir: str) -> pd.DataFrame:
    """Ontology QC audit (stages/constraints.check_triples): per
    (rule, pred) checked/violation counts over the full triple stream —
    pred inventory, self-loops, non-numeric Strengths, truncated-span
    short objects, attribute/drug vocabulary collisions. One zero-shuffle
    pass with integer count partials + a broadcast drug vocabulary.
    Oracle: the same rules in SQL over the triples fixture."""
    return constraints.check_triples(_triples(sf_dir))


def kg_label_prop_dist(sf_dir: str) -> pd.DataFrame:
    """kg_label_prop via the open-node-space path
    (graph.label_propagation_distributed): per-round label broadcast + one
    distributed vote-partial pass; integer vote weights make the merge
    exact under any block layout. Same serial fixture oracle as
    kg_label_prop."""
    trip = _triples(sf_dir)
    out = graph.label_propagation_distributed(trip)
    return out.sort_values("node").reset_index(drop=True)


def kg_kcore_dist(sf_dir: str) -> pd.DataFrame:
    """kg_kcore via the Dataset-in/Dataset-out distributed peel
    (graph.kcore_distributed): partition-parallel distinct-degree recompute
    per round, only the peeling nodes cross to the driver. Core numbers
    are peel-order-independent, so the result matches the driver-path
    kg_kcore fixture exactly."""
    counts = _cooccurrence(sf_dir)
    pairs = counts[counts["is_pair"] & (counts["n"] >= 2)]
    ds = ray.data.from_pandas(pairs[["ent_a", "ent_b"]].reset_index(drop=True))
    return graph.kcore_distributed(ds).to_pandas()


def kg_triangles_dist(sf_dir: str) -> pd.DataFrame:
    """kg_triangles via the open-node-space path
    (graph.triangles_distributed): hub-partitioned wedge rows carrying the
    center node, edge markers emitted once from the smaller endpoint, one
    (x, y)-keyed closing pass — integer counts identical to the driver
    peel. Same 3-way self-join oracle as kg_triangles."""
    counts = _cooccurrence(sf_dir)
    pairs = counts[counts["is_pair"] & (counts["n"] >= 2)][["ent_a", "ent_b"]]
    if pairs.empty:
        return pd.DataFrame(
            {"node": pd.Series([], dtype=str),
             "n_triangles": pd.Series([], dtype="int64")}
        )
    ds = ray.data.from_pandas(pairs.reset_index(drop=True))
    return graph.triangles_distributed(ds)


def kg_ppr_dist(sf_dir: str) -> pd.DataFrame:
    """kg_ppr via the open-node-space path
    (graph.personalized_pagerank_distributed): same deterministic smallest-
    subject seed; per-round rank broadcast + zero-shuffle contribution
    pass, bit-identical to the driver iteration. Same fixture oracle as
    kg_ppr."""
    trip = _triples(sf_dir)
    seed = trip.min("subj")
    if seed is None:
        return pd.DataFrame(
            {"node": pd.Series([], dtype=str),
             "rank": pd.Series([], dtype="float64")}
        )
    return graph.personalized_pagerank_distributed(trip, seed)


def kg_betweenness_dist(sf_dir: str) -> pd.DataFrame:
    """kg_betweenness via the open-node-space path
    (graph.betweenness_distributed): all 16 Brandes sources advance
    together as (V, k) driver matrices; one edge pass per BFS level
    forward and backward, 2 x diameter passes total, the edge set never
    collected. Same fixture oracle as kg_betweenness."""
    trip = _triples(sf_dir)
    out = graph.betweenness_distributed(trip)
    return out.sort_values("node").reset_index(drop=True)


def kg_distant_supervision(sf_dir: str, min_support: int = 3) -> pd.DataFrame:
    """Distant-supervision silver labels (Mintz et al. 2009): pair every
    in-document Drug mention with every other-type mention, label with
    the support-filtered KB predicate from the engine's OWN extracted
    triples (bootstrap), downsample 'NA' negatives 1/10 with an md5
    coin — the training-data-generation half of a KG-construction
    pipeline. Scale shape: KB = block combiner + vocab-bounded driver
    merge, broadcast once via ray.put; labeling = ONE doc-complete
    mention pass (zero shuffles end-to-end). Oracle: same regex-mention
    CTE as kg_cooccurrence, left-joined to the support-filtered triples
    fixture, identical md5 coin in SQL."""
    kb = graph.kb_support_pairs(_triples(sf_dir), min_support=min_support)
    return graph.distant_supervision(
        _mentions(sf_dir), kb, subj_type="Drug", na_mod=10, doc_complete=True
    )


def kg_pred_cooccurrence(sf_dir: str) -> pd.DataFrame:
    """Predicate co-occurrence (schema-discovery signal): for each pair
    of predicates, how many subjects carry BOTH, with the PMI-style lift
    over the subject universe — which attribute slots travel together in
    the induced schema. Scale shape: one block-combiner pass reduces the
    triple stream to distinct (subj, pred) partials, then ONE subj-keyed
    partition pass enumerates each subject's predicate pairs and emits
    kind-flagged count partials (pairs / per-pred subjects / distinct
    subjects); the driver merge is P^2-bounded (predicate vocabulary
    squared), never entity-count-shaped — safe on an open KB. Oracle:
    distinct self-join + count SQL over the triples fixture."""
    from ..stages import mining

    return mining.pred_cooccurrence(_triples(sf_dir))


def docs_dsir_select(
    sf_dir: str, n_buckets: int = 256, k: int = 50, target_mod: int = 7
) -> pd.DataFrame:
    """DSIR data selection (Xie et al. 2023, NeurIPS — Data Selection
    with Importance Resampling): score every source document by the
    log-likelihood ratio of hashed-unigram bucket models fitted on a
    target corpus vs the source corpus, then Gumbel-top-k resample with
    content-addressed uniforms. Target = docs with doc_id % 7 == 0 (the
    deterministic 'domain' slice); source = the rest.

    Scale shape: pass 1 is a block combiner emitting two
    ``n_buckets``-long count partials (driver merge is dimension-sized,
    not corpus-sized); the smoothed log-ratio vector is broadcast once
    via ray.put; pass 2 scores docs vectorized (md5 bucket per token ->
    np.bincount per doc) and prunes to a per-block top-k so the driver
    merges (blocks x k) rows, never a global sort. Oracle: identical
    bucket/smoothing/Gumbel formulas in SQL (md5 dialect matched to
    DuckDB as in docs_weighted_sample)."""
    import hashlib

    import pyarrow.compute as pc

    from ..functions.broadcast import bget

    docs = ray.data.read_parquet(
        os.path.join(sf_dir, "documents.parquet"), columns=["doc_id", "text"]
    )
    DENOM = float(2**60) + 1.0

    def bucketize(texts: "pa.ChunkedArray | pa.Array"):
        """(doc_index, bucket) for every nonempty whitespace token —
        one Arrow split/flatten, md5 only per DISTINCT token (vocab-
        bounded per block), RE2 \\s+ dialect matched to the oracle."""
        toks = pc.split_pattern_regex(
            pc.utf8_lower(pc.coalesce(texts, "")), r"\s+"
        )
        if isinstance(toks, pa.ChunkedArray):
            toks = toks.combine_chunks()
        flat = pc.list_flatten(toks)
        parents = pc.list_parent_indices(toks)
        mask = pc.not_equal(flat, "")
        flat = flat.filter(mask)
        parents = parents.filter(mask).to_numpy(zero_copy_only=False)
        codes, uniq = pd.factorize(
            flat.to_numpy(zero_copy_only=False), sort=False
        )
        ub = np.array(
            [
                int(hashlib.md5(u.encode("utf-8")).hexdigest()[:15], 16)
                % n_buckets
                for u in uniq
            ],
            dtype=np.int64,
        )
        return parents.astype(np.int64), ub[codes]

    def count_partial(t: pa.Table) -> pa.Table:
        ids = np.asarray(t["doc_id"].to_numpy(zero_copy_only=False),
                         dtype=np.int64)
        parents, buckets = bucketize(t["text"])
        is_tgt = (ids[parents] % target_mod) == 0
        tgt = np.bincount(buckets[is_tgt], minlength=n_buckets)
        src = np.bincount(buckets[~is_tgt], minlength=n_buckets)
        return pa.table(
            {"bucket": np.arange(n_buckets, dtype=np.int64),
             "tgt": tgt.astype(np.int64), "src": src.astype(np.int64)}
        )

    parts = docs.map_batches(count_partial, batch_format="pyarrow").to_pandas()
    merged = parts.groupby("bucket")[["tgt", "src"]].sum()
    tgt = np.zeros(n_buckets, dtype=np.float64)
    src = np.zeros(n_buckets, dtype=np.float64)
    tgt[merged.index.to_numpy()] = merged["tgt"].to_numpy(dtype=np.float64)
    src[merged.index.to_numpy()] = merged["src"].to_numpy(dtype=np.float64)
    nt, ns = tgt.sum(), src.sum()
    logratio = np.log((tgt + 1.0) / (nt + n_buckets)) - np.log(
        (src + 1.0) / (ns + n_buckets)
    )
    lr_ref = ray.put(logratio)

    def score_prune(t: pa.Table) -> pa.Table:
        lr = bget(lr_ref)
        ids = np.asarray(t["doc_id"].to_numpy(zero_copy_only=False),
                         dtype=np.int64)
        parents, buckets = bucketize(t["text"])
        nts = np.bincount(parents, minlength=len(ids))
        sums = np.zeros(len(ids), dtype=np.float64)
        np.add.at(sums, parents, lr[buckets])
        keep = ((ids % target_mod) != 0) & (nts > 0)
        ids, nts, sums = ids[keep], nts[keep], sums[keep]
        if not len(ids):
            return pa.table(
                {"doc_id": pa.array([], pa.int64()),
                 "n_tokens": pa.array([], pa.int64()),
                 "score": pa.array([], pa.float64())}
            )
        u = (
            np.array(
                [
                    int(hashlib.md5(str(i).encode("utf-8")).hexdigest()[:15], 16)
                    for i in ids
                ],
                dtype=np.float64,
            )
            + 1.0
        ) / DENOM
        score = sums / nts + (-np.log(-np.log(u)))
        top = np.argsort(-score, kind="stable")[: min(k, len(ids))]
        return pa.table(
            {"doc_id": ids[top], "n_tokens": nts[top].astype(np.int64),
             "score": score[top]}
        )

    pruned = docs.map_batches(score_prune, batch_format="pyarrow").to_pandas()
    out = (
        pruned.sort_values(["score", "doc_id"], ascending=[False, True])
        .head(k)
        .reset_index(drop=True)
    )
    out.insert(0, "rank", np.arange(1, len(out) + 1, dtype=np.int64))
    out["score"] = out["score"].round(6)
    return out[["rank", "doc_id", "n_tokens", "score"]]


def kg_share_rules(sf_dir: str) -> pd.DataFrame:
    """AMIE-style implication rules over derived share_p(x, z) relations
    (stages/mining.share_rules): pass 1 keys distinct (pred, obj, subj)
    by attribute VALUE and emits the slab-chunked owner-pair mesh, pass
    2 keys candidates by the entity PAIR for the exact global dedup and
    predicate-vocabulary-bounded rule partials. Oracle: the same two
    self-joins in SQL over the kg_triples fixture."""
    from ..stages import mining

    return mining.share_rules(
        _triples(sf_dir), min_support=5, min_confidence=0.1
    )


def kg_neighbor_sample(sf_dir: str) -> pd.DataFrame:
    """GraphSAGE-style deterministic 2-hop fanout sample
    (stages/neighborhood.neighbor_sample): per-node top-k neighbors by
    md5 rank in ONE node-keyed pass, hop-2 via ONE mid-node-keyed join
    of the sampled frontier against the per-node samples. Oracle:
    row_number() over md5 ordering in SQL."""
    from ..stages import neighborhood

    return neighborhood.neighbor_sample(_triples(sf_dir), k1=3, k2=2)


def kg_feature_prop(sf_dir: str) -> pd.DataFrame:
    """SGC-style 2-hop feature propagation over the symmetrized KG
    (stages/neighborhood.feature_propagation): hex-digit md5 node
    features, integer-sum SpMV passes (bit-exact at any parallelism),
    one final division per output row. Oracle: two joins + integer sums
    in SQL."""
    from ..stages import neighborhood

    return neighborhood.feature_propagation(_triples(sf_dir), dims=4)


def kg_entity_summary(sf_dir: str) -> pd.DataFrame:
    """Per-entity top-k rarest facts (stages/neighborhood.entity_summary):
    fact frequencies from block partials merged on the driver
    (attribute-vocabulary-bounded), broadcast once, per-subject rank in
    ONE subject-keyed pass. Oracle: row_number() over (freq, pred, obj)."""
    from ..stages import neighborhood

    return neighborhood.entity_summary(_triples(sf_dir), k=5)


def kg_dictionary(sf_dir: str) -> pd.DataFrame:
    """Global term dictionary (stages/kgstore.term_dictionary): distinct
    subj/pred/obj terms, dense ids = global rank via the distributed
    prefix-sum scan (no driver sort). Oracle: row_number() - 1 over the
    sorted distinct union."""
    from ..stages import kgstore

    return kgstore.term_dictionary(_triples(sf_dir))


def kg_index_zonemaps(sf_dir: str) -> pd.DataFrame:
    """Hexastore-style sorted bucket index build + zone maps
    (stages/kgstore.sorted_index): triples hash-bucketed by the leading
    term's md5 prefix per permutation (SPO / OSP), each bucket written
    as one sorted Parquet file (resumable output), returning per-bucket
    row counts and min/max composite keys. Oracle: the same md5-prefix
    grouping + min/max concat in SQL; file sortedness is pinned by
    tests/test_kgstore.py."""
    import shutil
    import tempfile

    from ..stages import kgstore

    # per-invocation scratch dir: two concurrent runs at the same sf must
    # not race on a shared path (round-3 ADVICE)
    out_dir = tempfile.mkdtemp(prefix="kg_index_")
    try:
        return kgstore.sorted_index(_triples(sf_dir), out_dir)
    finally:
        shutil.rmtree(out_dir, ignore_errors=True)


def embeddings_knn_graph(sf_dir: str) -> pd.DataFrame:
    """Approximate kNN-graph construction over the embeddings table
    (stages/similarity.knn_graph): IVF-blocked — broadcast sample-fit
    centroids, one fan-out pass (primary cell = candidate home, top-p
    probe cells = query replicas), one cell-keyed cosine-block pass
    emitting per-cell top-k partials, one point-keyed merge. Oracle:
    independent serial fixture at the identical deterministic spec."""
    from ..stages import similarity

    vecs = ray.data.read_parquet(os.path.join(sf_dir, "embeddings.parquet"))
    return similarity.knn_graph(vecs, k=5, nlist=8, probes=2)


def kg_index_upsert(sf_dir: str) -> pd.DataFrame:
    """Incremental index maintenance (stages/kgstore.upsert_index): base
    index built from the docs whose md5(doc_id) starts 0-7, then the
    remaining docs' triples upserted as a delta — ONE bucket-keyed merge
    pass per order touching only delta buckets; untouched buckets report
    zone rows from Parquet footer statistics alone. Oracle: zone maps of
    the FULL distinct edge set (upsert(base, delta) == build(base ∪
    delta))."""
    import shutil
    import tempfile

    from ..stages import kgstore

    trip = _triples(sf_dir)

    def side_mask(df: pd.DataFrame, side: str) -> pd.DataFrame:
        # dtype=bool: np.array([]) of an empty batch is float64, and a
        # float mask turns df[m] into column-label indexing (round-3
        # ADVICE — schema-divergent empty block)
        m = np.array(
            [hashlib.md5(str(d).encode()).hexdigest()[0] in "01234567"
             for d in df["doc_id"]],
            dtype=bool,
        )
        return df[m if side == "a" else ~m]

    out_dir = tempfile.mkdtemp(prefix="kg_index_upsert_")
    base = trip.map_batches(
        lambda df: side_mask(df, "a"), batch_format="pandas"
    )
    delta = trip.map_batches(
        lambda df: side_mask(df, "b"), batch_format="pandas"
    )
    try:
        kgstore.sorted_index(base, out_dir)
        return kgstore.upsert_index(delta, out_dir)
    finally:
        shutil.rmtree(out_dir, ignore_errors=True)


def kg_index_lookup(sf_dir: str) -> pd.DataFrame:
    """Bucket-pruned point lookups (stages/kgstore.lookup_subjects):
    builds the SPO index, then reads ONLY the bucket files named by the
    query subjects' md5 prefixes (pruning pinned by tests). Oracle: a
    plain IN-list select over the triples fixture."""
    import shutil
    import tempfile

    from ..stages import kgstore

    out_dir = tempfile.mkdtemp(prefix="kg_index_lookup_")
    try:
        kgstore.sorted_index(_triples(sf_dir), out_dir, orders=("spo",))
        return kgstore.lookup_subjects(
            out_dir, ["lisinopril", "metformin", "warfarin"]
        )
    finally:
        shutil.rmtree(out_dir, ignore_errors=True)


def docs_bpe_encode(sf_dir: str) -> pd.DataFrame:
    """Tokenizer APPLICATION: corpus-trained BPE merges (the
    docs_bpe_merges trainer) broadcast once and applied per document in
    one zero-shuffle pass with per-block distinct-word memoization
    (stages/text_analysis.bpe_encode). Oracle: independent serial
    trainer + independent greedy encoder fixture."""
    docs = ray.data.read_parquet(
        os.path.join(sf_dir, "documents.parquet"), columns=["doc_id", "text"]
    )
    merges = text_analysis.bpe_merges(
        ray.data.read_parquet(
            os.path.join(sf_dir, "documents.parquet"), columns=["text"]
        ),
        n_merges=12,
    )
    return text_analysis.bpe_encode(docs, merges)
