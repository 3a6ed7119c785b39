"""Empty-input robustness: zero-row datasets must flow through every core
operator with schemas intact (the round-1 kg_nodes failure class: empty
groupby blocks emitting schema-less tables that poison downstream concat)."""

import pandas as pd
import pyarrow as pa

import ray.data

from ehr_relation_extraction_ray.schemas import DOCUMENTS


def _empty_transcripts():
    return ray.data.from_arrow(
        pa.table(
            {
                "conv_id": pa.array([], pa.string()),
                "turn_idx": pa.array([], pa.int32()),
                "text": pa.array([], pa.large_string()),
            }
        )
    )


def _empty_docs():
    return ray.data.from_arrow(
        pa.table(
            {
                "doc_id": pa.array([], pa.string()),
                "text": pa.array([], pa.large_string()),
            }
        )
    )


def test_kg_chain_on_empty_transcripts(ray_session):
    from ehr_relation_extraction_ray.stages import assembly, candidates, relations

    docs = assembly.assemble(_empty_transcripts())
    assert docs.count() == 0
    cands = candidates.generate(docs)
    edges = relations.score(cands)
    trip = relations.distinct_triples(
        edges.map_batches(relations.triples_batch, batch_format="pyarrow")
    )
    assert trip.count() == 0


def test_mentions_nodes_on_empty_docs(ray_session):
    from ehr_relation_extraction_ray.stages import canonicalize, mentions

    ment = mentions.detect(_empty_docs())
    assert ment.count() == 0
    nodes, ref = canonicalize.build_nodes(ment)
    assert nodes.count() == 0
    linked = canonicalize.link_mentions_scored(ment, ref)
    assert linked.count() == 0


def test_dedupe_on_empty_docs(ray_session):
    from ehr_relation_extraction_ray.stages import dedupe

    docs = _empty_docs()
    assert dedupe.exact_dedup(docs).count() == 0
    pairs = dedupe.minhash_lsh_pairs(docs, distinct=False)
    assert dedupe.verify_jaccard(pairs, docs).count() == 0
    assert dedupe.simhash_near_pairs(docs).count() == 0


def test_windows_and_eval_on_empty(ray_session):
    from ehr_relation_extraction_ray.stages import evaluate, windows

    ev = ray.data.from_arrow(
        pa.table(
            {
                "k": pa.array([], pa.string()),
                "ts": pa.array([], pa.timestamp("us")),
                "v": pa.array([], pa.float64()),
            }
        )
    )
    out = windows.tumbling_window_agg(ev, "ts", 3600, key_cols="k", value_col="v")
    assert out.count() == 0
    empty_m = ray.data.from_arrow(
        pa.table(
            {
                "doc_id": pa.array([], pa.string()),
                "ent_id": pa.array([], pa.string()),
                "ent_type": pa.array([], pa.string()),
                "start": pa.array([], pa.int64()),
                "end": pa.array([], pa.int64()),
                "text": pa.array([], pa.string()),
            }
        )
    )
    res = evaluate.span_prf(empty_m, empty_m)
    assert res["f1"] == 0.0


def test_new_ops_on_empty_inputs(ray_session):
    """Round-2 additions flow empty inputs without schema poisoning:
    bloom decontaminate, cross-LSH, interval join, dim stats / PCA
    partials, normalization, edge weights."""
    import numpy as np

    from ehr_relation_extraction_ray.stages import dedupe, graph, text_analysis
    from ehr_relation_extraction_ray.stages.joins import interval_join

    docs = _empty_docs()
    assert dedupe.bloom_decontaminate(docs, docs).count() == 0
    assert dedupe.minhash_lsh_cross_pairs(docs, docs).count() == 0
    assert text_analysis.normalize(docs).count() == 0

    empty_trip = ray.data.from_arrow(
        pa.table(
            {
                "doc_id": pa.array([], pa.string()),
                "subj": pa.array([], pa.string()),
                "obj": pa.array([], pa.string()),
            }
        )
    )
    ew = graph.edge_weights(empty_trip)
    assert len(ew) == 0

    points = ray.data.from_arrow(
        pa.table(
            {
                "k": pa.array([], pa.int64()),
                "ts": pa.array([], pa.int64()),
            }
        )
    )
    ivs = ray.data.from_arrow(
        pa.table(
            {
                "k": pa.array([], pa.int64()),
                "start": pa.array([], pa.int64()),
                "end": pa.array([], pa.int64()),
            }
        )
    )
    assert interval_join(points, ivs, by="k", on="ts").count() == 0
