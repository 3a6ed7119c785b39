"""Driver contract for the graft builder (Ray Data target).

Ray is initialised by the driver BEFORE this module is imported; nothing
here calls ``ray.init``/``ray.shutdown``. Each ``queries()`` callable takes
``sf_dir`` and returns a pandas DataFrame; ``oracle_sql()`` provides the
DuckDB-equivalent SQL (same column names). Transcript/media-based queries
synthesize their deterministic inputs under /tmp (atomic, idempotent) —
``oracle_sql()`` triggers the same generation so the SQL's
``read_parquet('/tmp/...')`` always sees the file regardless of call order.
"""

from __future__ import annotations

from collections.abc import Callable
from typing import Any

SF_CORRECTNESS_DIR = "/root/testdata/sf0.01"

# Always occupy correctness-window slots 1-5 as regression canaries.
_CANARIES = ["kg_assembly", "kg_mentions", "kg_windows", "kg_triples", "kg_nodes"]

# Registered queries with NO oracle_sql entry (rows-only driver check):
# they can never turn hash-green, so the rotation must not let them
# consume a front-of-window slot (round-3 VERDICT item 2). Currently
# empty — every registry entry has an oracle — kept as the guard rail
# for future rows-only additions.
_NO_ORACLE: "set[str]" = set()


def _rotate_for_coverage(
    reg: "dict[str, Callable[[str], Any]]",
    green: "set[str] | None" = None,
) -> "dict[str, Callable[[str], Any]]":
    """Reorder the registry so the driver's 50-query correctness window
    covers queries with no green CORRECTNESS row yet.

    The driver checks the FIRST 50 keys of ``queries()`` each round; with
    ~190 registered queries a static order would leave most of the surface
    without a hard DuckDB-oracle signal. This reads every
    ``CORRECTNESS_r*.json`` committed so far and fronts (a) the 5 kg_*
    canaries, (b) queries never green in any past round (never checked, or
    checked-and-failed — both need a row), (c) previously-green queries in
    their original order. Deterministic given the repo files; falls back to
    the static order on any read error.
    """
    import glob
    import json
    import os

    if green is None:
        green = set()
        try:
            here = os.path.dirname(os.path.abspath(__file__))
            for path in sorted(glob.glob(os.path.join(here, "CORRECTNESS_r*.json"))):
                with open(path) as f:
                    rows = json.load(f)
                for name, row in rows.items():
                    if (
                        isinstance(row, dict)
                        and row.get("rows_match")
                        and row.get("schema_match")
                        and row.get("err") is None
                    ):
                        green.add(name)
        except Exception:
            return reg
    canaries = [k for k in _CANARIES if k in reg]
    unchecked = [
        k for k in reg
        if k not in green and k not in canaries and k not in _NO_ORACLE
    ]
    checked = [k for k in reg if k in green and k not in canaries]
    no_oracle = [
        k for k in reg
        if k in _NO_ORACLE and k not in green and k not in canaries
    ]
    return {k: reg[k] for k in canaries + unchecked + checked + no_oracle}


def entry() -> Any:
    """Flagship KG pipeline on sf0.001: transcripts -> deduped triples."""
    from ehr_relation_extraction_ray import synth
    from ehr_relation_extraction_ray.pipelines import kg

    path = synth.transcripts_path("/root/testdata/sf0.001")
    return kg.run(path).to_pandas()


def queries() -> dict[str, Callable[[str], Any]]:
    from ehr_relation_extraction_ray.pipelines import queries as q
    from ehr_relation_extraction_ray.pipelines import relational as r

    return _rotate_for_coverage({
        # Registry order controls the driver's 50-query correctness
        # window (first 50 keys). _rotate_for_coverage reorders this dict
        # per round from the committed CORRECTNESS_r*.json files: 5 kg_*
        # canaries, then queries with no green row yet (in this order),
        # then previously-green rows — so each round's window automatically
        # covers the next never-checked batch without manual rotation.
        "kg_assembly": q.kg_assembly,
        "kg_mentions": q.kg_mentions,
        "kg_windows": q.kg_windows,
        "kg_triples": q.kg_triples,
        "kg_nodes": q.kg_nodes,
        "kg_transe": q.kg_transe,
        "kg_transe_eval": q.kg_transe_eval,
        "kg_constraint_violations": q.kg_constraint_violations,
        "kg_contradictions": q.kg_contradictions,
        "kg_asof_snapshot": q.kg_asof_snapshot,
        "kg_ntriples_export": q.kg_ntriples_export,
        "kg_bgp_match": q.kg_bgp_match,
        "kg_assoc_rules": q.kg_assoc_rules,
        "kg_entity_alignment": q.kg_entity_alignment,
        "kg_mention_chains": q.kg_mention_chains,
        "kg_truth_discovery": q.kg_truth_discovery,
        "kg_distant_supervision": q.kg_distant_supervision,
        "kg_pred_cooccurrence": q.kg_pred_cooccurrence,
        "kg_share_rules": q.kg_share_rules,
        "kg_neighbor_sample": q.kg_neighbor_sample,
        "kg_feature_prop": q.kg_feature_prop,
        "kg_entity_summary": q.kg_entity_summary,
        "kg_dictionary": q.kg_dictionary,
        "kg_index_zonemaps": q.kg_index_zonemaps,
        "embeddings_knn_graph": q.embeddings_knn_graph,
        "kg_index_upsert": q.kg_index_upsert,
        "kg_index_lookup": q.kg_index_lookup,
        "docs_bpe_encode": q.docs_bpe_encode,
        "docs_dsir_select": q.docs_dsir_select,
        "kg_pagerank_dist": q.kg_pagerank_dist,
        "kg_label_prop_dist": q.kg_label_prop_dist,
        "kg_kcore_dist": q.kg_kcore_dist,
        "kg_triangles_dist": q.kg_triangles_dist,
        "kg_ppr_dist": q.kg_ppr_dist,
        "kg_betweenness_dist": q.kg_betweenness_dist,
        "docs_bloom_decontaminate": q.docs_bloom_decontaminate,
        "docs_repetition": q.docs_repetition,
        "docs_pack_bins": q.docs_pack_bins,
        "docs_lang_mix": q.docs_lang_mix,
        "docs_lang_divergence": q.docs_lang_divergence,
        "docs_jsonl_roundtrip": q.docs_jsonl_roundtrip,
        "events_csv_roundtrip": q.events_csv_roundtrip,
        "docs_partitioned_write": q.docs_partitioned_write,
        "docs_top_terms": q.docs_top_terms,
        "docs_bpe_merges": q.docs_bpe_merges,
        "docs_shuffle": q.docs_shuffle,
        "docs_hash_embed": q.docs_hash_embed,
        "docs_lang_centroid": q.docs_lang_centroid,
        "docs_curation_funnel": q.docs_curation_funnel,
        "events_mad": r.events_mad,
        "events_top_weekday": r.events_top_weekday,
        "events_moving_avg": q.events_moving_avg,
        "events_corr": q.events_corr,
        "events_ntile": q.events_ntile,
        "events_json_extract": q.events_json_extract,
        "docs_normalize": q.docs_normalize,
        "embeddings_dim_stats": q.embeddings_dim_stats,
        "events_histogram": r.events_histogram,
        "customer_order_counts": r.customer_order_counts,
        "events_quantiles_sampled": r.events_quantiles_sampled,
        "events_percent_rank": r.events_percent_rank,
        "event_type_user_counts": r.event_type_user_counts,
        "customers_no_big_orders": r.customers_no_big_orders,
        "events_zscore": r.events_zscore,
        "events_lag_delta": r.events_lag_delta,
        "events_winsorized": r.events_winsorized,
        "events_quantiles_hist": r.events_quantiles_hist,
        "events_interval_join": r.events_interval_join,
        "events_cube": r.events_cube,
        "events_profile": r.events_profile,
        "customer_events_full_outer": r.customer_events_full_outer,
        "events_funnel": r.events_funnel,
        "events_retention": r.events_retention,
        "largest_order_per_customer": r.largest_order_per_customer,
        "events_pivot": r.events_pivot,
        "segment_priority_revenue": r.segment_priority_revenue,
        "events_variance_udaf": r.events_variance_udaf,
        "docs_ngram_jaccard": q.docs_ngram_jaccard,
        "docs_minhash_pairs": q.docs_minhash_pairs,
        "docs_cross_dedup": q.docs_cross_dedup,
        "docs_dup_clusters": q.docs_dup_clusters,
        "docs_tfidf_top_terms": q.docs_tfidf_top_terms,
        "docs_inverted_index": q.docs_inverted_index,
        "docs_simhash_pairs": q.docs_simhash_pairs,
        "embeddings_topk": q.embeddings_topk,
        "embeddings_ivf_topk": q.embeddings_ivf_topk,
        "embeddings_pq_topk": q.embeddings_pq_topk,
        "embeddings_cluster_sizes": q.embeddings_cluster_sizes,
        "embeddings_semdedup": q.embeddings_semdedup,
        "embeddings_pca": q.embeddings_pca,
        "embeddings_cosine_dup": q.embeddings_cosine_dup,
        "embeddings_cosine_dup_lsh": q.embeddings_cosine_dup_lsh,
        "media_features": q.media_features,
        "media_resize_frames": q.media_resize_frames,
        "kg_conll_export": q.kg_conll_export,
        "kg_re_export": q.kg_re_export,
        "kg_eval_detailed": q.kg_eval_detailed,
        "kg_linked_mentions": q.kg_linked_mentions,
        "kg_drug_no_ade_docs": q.kg_drug_no_ade_docs,
        "ade_ingest": q.ade_ingest,
        "brat_ingest": q.brat_ingest,
        "docs_bm25": q.docs_bm25,
        "docs_typo_pairs": q.docs_typo_pairs,
        "kg_node_similarity": q.kg_node_similarity,
        "docs_snapshot_diff": q.docs_snapshot_diff,
        "kg_alias_fuzzy": q.kg_alias_fuzzy,
        "events_late_arrivals": r.events_late_arrivals,
        "media_dedup": q.media_dedup,
        "events_user_hll": r.events_user_hll,
        "docs_zone_maps": r.docs_zone_maps,
        "events_regression": r.events_regression,
        "orders_half_crossing": r.orders_half_crossing,
        "events_pareto": r.events_pareto,
        "events_stream_join": r.events_stream_join,
        "docs_upsert": q.docs_upsert,
        "embeddings_dim_ablation": q.embeddings_dim_ablation,
        "kg_kcore": q.kg_kcore,
        "kg_pred_cardinality": q.kg_pred_cardinality,
        "embeddings_int8_quant": q.embeddings_int8_quant,
        "events_hourly_distinct": r.events_hourly_distinct,
        "events_day_over_day": r.events_day_over_day,
        "kg_random_walks": q.kg_random_walks,
        "docs_retrieve_rerank": q.docs_retrieve_rerank,
        "docs_split_leakage": q.docs_split_leakage,
        "kg_turn_dedup": q.kg_turn_dedup,
        "embeddings_kmeans_iter": q.embeddings_kmeans_iter,
        "embeddings_logreg": q.embeddings_logreg,
        "kg_mention_overlaps": q.kg_mention_overlaps,
        "lineitem_copurchase": r.lineitem_copurchase,
        "events_first_touch": r.events_first_touch,
        "docs_f2_sketch": q.docs_f2_sketch,
        "lineitem_below_avg": r.lineitem_below_avg,
        "docs_heavy_hitters": q.docs_heavy_hitters,
        "events_markov": r.events_markov,
        "customer_order_distribution": r.customer_order_distribution,
        "kg_label_prop": q.kg_label_prop,
        "docs_cm_profile": q.docs_cm_profile,
        "docs_rrf_fusion": q.docs_rrf_fusion,
        "local_supplier_volume": r.local_supplier_volume,
        "large_volume_orders": r.large_volume_orders,
        "top_supplier": r.top_supplier,
        "docs_ppjoin_pairs": q.docs_ppjoin_pairs,
        "events_type_weekday_chisq": r.events_type_weekday_chisq,
        "events_hll_overlap": r.events_hll_overlap,
        "events_cusum": r.events_cusum,
        "events_bitmap_distinct": r.events_bitmap_distinct,
        "events_time_weighted_avg": r.events_time_weighted_avg,
        "orders_lineitem_join_size": r.orders_lineitem_join_size,
        "events_decayed_sum": r.events_decayed_sum,
        "events_diff_in_diff": r.events_diff_in_diff,
        "kg_linkpred_auc": q.kg_linkpred_auc,
        "media_phash_dup": q.media_phash_dup,
        "kg_ppr": q.kg_ppr,
        "docs_partition_skew": q.docs_partition_skew,
        "docs_scd2": q.docs_scd2,
        "kg_adamic_adar": q.kg_adamic_adar,
        "customer_rfm": r.customer_rfm,
        "docs_zipf_fit": q.docs_zipf_fit,
        "events_tier_join": r.events_tier_join,
        "kg_betweenness": q.kg_betweenness,
        "events_gini": r.events_gini,
        "docs_heaps_fit": q.docs_heaps_fit,
        "docs_burstiness": q.docs_burstiness,
        "docs_cdc_dedup": q.docs_cdc_dedup,
        "events_autocorr": r.events_autocorr,
        "events_benford": r.events_benford,
        "rich_inactive_customers": r.rich_inactive_customers,
        "orders_interarrival": r.orders_interarrival,
        "kg_eval_invariance": q.kg_eval_invariance,
        "kg_wide_table": q.kg_wide_table,
        "kg_drug_graph": q.kg_drug_graph,
        "kg_nodes_fuzzy": q.kg_nodes_fuzzy,
        "kg_role_stats": q.kg_role_stats,
        "kg_tool_chains": q.kg_tool_chains,
        "kg_conv_dedup": q.kg_conv_dedup,
        "kg_turn_latency": q.kg_turn_latency,
        "kg_degree_hist": q.kg_degree_hist,
        "kg_pagerank": q.kg_pagerank,
        "kg_khop": q.kg_khop,
        "kg_edge_spans": q.kg_edge_spans,
        "kg_negative_samples": q.kg_negative_samples,
        "kg_incremental_edges": q.kg_incremental_edges,
        "kg_cooccurrence": q.kg_cooccurrence,
        "kg_triangles": q.kg_triangles,
        "kg_entity_components": q.kg_entity_components,
        "docs_substring_dedup": q.docs_substring_dedup,
        "docs_compress_ratio": q.docs_compress_ratio,
        "agg_lineitem": r.agg_lineitem,
        "join_orders_customer": r.join_orders_customer,
        "topk_orders": r.topk_orders,
        "event_type_counts": r.event_type_counts,
        "filtered_revenue": r.filtered_revenue,
        "sessionize_events": r.sessionize_events,
        "nation_region_join": r.nation_region_join,
        "part_brand_margin": r.part_brand_margin,
        "orders_customer_hashjoin": r.orders_customer_hashjoin,
        "events_asof_join": r.events_asof_join,
        "events_windowed": r.events_windowed,
        "topk_events_per_type": r.topk_events_per_type,
        "events_quantiles": r.events_quantiles,
        "events_quantiles_cont": r.events_quantiles_cont,
        "events_rollup": r.events_rollup,
        "events_sliding": r.events_sliding,
        "docs_exact_dedup": q.docs_exact_dedup,
        "docs_stats": q.docs_stats,
        "docs_quality": q.docs_quality,
        "docs_distinct_tokens": q.docs_distinct_tokens,
        "docs_stratified_sample": q.docs_stratified_sample,
        "docs_weighted_sample": q.docs_weighted_sample,
        "docs_budget_per_lang": q.docs_budget_per_lang,
        "docs_entropy": q.docs_entropy,
        "docs_boilerplate": q.docs_boilerplate,
        "docs_decontaminate": q.docs_decontaminate,
        "docs_unigram_logprob": q.docs_unigram_logprob,
    })


def _transcripts_sql_path() -> str:
    import os

    from ehr_relation_extraction_ray import synth

    p = synth.transcripts_path(SF_CORRECTNESS_DIR)
    # conversation-partitioned layout: DuckDB reads the shard glob
    return os.path.join(p, "*.parquet") if os.path.isdir(p) else p


def _ade_sql_path() -> str:
    from ehr_relation_extraction_ray.pipelines import queries as q

    return q.ade_path(SF_CORRECTNESS_DIR)


def _pqpart_sql_glob() -> str:
    from ehr_relation_extraction_ray.pipelines import queries as q

    return q.parquet_part_dir(SF_CORRECTNESS_DIR) + "/**/*.parquet"


def _csv_sql_glob() -> str:
    from ehr_relation_extraction_ray.pipelines import queries as q

    return q.csv_dir(SF_CORRECTNESS_DIR) + "/*"


def _jsonl_sql_glob() -> str:
    from ehr_relation_extraction_ray.pipelines import queries as q

    return q.jsonl_dir(SF_CORRECTNESS_DIR) + "/*"


def _media_sql_path() -> str:
    from ehr_relation_extraction_ray.pipelines import queries as q

    return q.media_path(SF_CORRECTNESS_DIR)



_BM25_CTE = r"""
WITH toks AS (
  SELECT doc_id, tok FROM (
    SELECT doc_id, unnest(string_split_regex(lower(text), '\s+')) AS tok
    FROM documents)
  WHERE length(tok) > 0
),
dl AS (
  SELECT d.doc_id, COALESCE(t.c, 0) AS dl
  FROM documents d
  LEFT JOIN (SELECT doc_id, count(*) AS c FROM toks GROUP BY doc_id) t
    USING (doc_id)
),
stats AS (SELECT count(*) AS n_docs, avg(dl) AS avgdl FROM dl),
q(term) AS (VALUES ('spark'), ('window'), ('join')),
tf AS (
  SELECT t.doc_id, t.tok AS term, count(*) AS tf
  FROM toks t JOIN q ON t.tok = q.term GROUP BY t.doc_id, t.tok
),
df AS (SELECT term, count(DISTINCT doc_id) AS df FROM tf GROUP BY term),
scored AS (
  SELECT tf.doc_id,
         sum(ln((s.n_docs - df.df + 0.5) / (df.df + 0.5) + 1.0)
             * tf.tf * 2.2
             / (tf.tf + 1.2 * (0.25 + 0.75 * dl.dl / s.avgdl))) AS score
  FROM tf JOIN df USING (term) JOIN dl USING (doc_id) CROSS JOIN stats s
  GROUP BY tf.doc_id
)"""


def _mentions_cte(tp: str) -> str:
    """WITH-prefix shared by the mention-based oracles: assembled docs ->
    per-type regexp_extract_all UNION (``m`` holds one row per raw match,
    delimiters still attached), mirroring the dictionary NER (DuckDB RE2
    alternation semantics verified to match Python re for these
    patterns)."""
    from ehr_relation_extraction_ray.lexicon import DEFAULT_LEXICON, fit_patterns

    patterns = fit_patterns(DEFAULT_LEXICON)
    selects = []
    for ent_type, pat in patterns.items():
        tag = f"$p{len(selects)}$"
        selects.append(
            f"SELECT '{ent_type}' AS ent_type, "
            f"unnest(regexp_extract_all(text, {tag}{pat}{tag}, 0, 'i')) AS raw "
            f"FROM docs"
        )
    union = " UNION ALL ".join(selects)
    return f"""
WITH docs AS (
  SELECT conv_id, string_agg(COALESCE(text,''), chr(10)||chr(10) ORDER BY turn_idx) AS text
  FROM read_parquet('{tp}') GROUP BY conv_id
), m AS ({union})"""


def _mentions_sql(tp: str) -> str:
    """Per-type mention counts (delimiter-trim via substr)."""
    return _mentions_cte(tp) + """
SELECT ent_type,
       count(*) AS n_mentions,
       count(DISTINCT substr(raw, 2, length(raw) - 2)) AS n_surfaces
FROM m GROUP BY ent_type ORDER BY ent_type
"""


def _turn_mentions_union(tp: str) -> str:
    """Per-TURN regex mention extraction (no conversation assembly):
    one SELECT per entity type over the raw transcript rows, keeping
    (conv_id, turn_idx) — the granularity the mention-chain oracle needs."""
    from ehr_relation_extraction_ray.lexicon import DEFAULT_LEXICON, fit_patterns

    patterns = fit_patterns(DEFAULT_LEXICON)
    selects = []
    for ent_type, pat in patterns.items():
        tag = f"$p{len(selects)}$"
        selects.append(
            f"SELECT conv_id, turn_idx, '{ent_type}' AS ent_type, "
            f"unnest(regexp_extract_all(COALESCE(text, ''), {tag}{pat}{tag}, 0, 'i')) AS raw "
            f"FROM read_parquet('{tp}')"
        )
    return " UNION ALL ".join(selects)


def _cooccurrence_cte(tp: str) -> str:
    """Shared CTE chain for the co-occurrence queries: assembled docs ->
    per-type regex mentions (same extraction as _mentions_sql) -> distinct
    (conv_id, "type:surface") -> doc-level pair counts."""
    from ehr_relation_extraction_ray.lexicon import DEFAULT_LEXICON, fit_patterns

    patterns = fit_patterns(DEFAULT_LEXICON)
    selects = []
    for ent_type, pat in patterns.items():
        tag = f"$p{len(selects)}$"
        selects.append(
            f"SELECT conv_id, '{ent_type}' AS ent_type, "
            f"unnest(regexp_extract_all(text, {tag}{pat}{tag}, 0, 'i')) AS raw "
            f"FROM docs"
        )
    union = " UNION ALL ".join(selects)
    return f"""
WITH docs AS (
  SELECT conv_id, string_agg(COALESCE(text,''), chr(10)||chr(10) ORDER BY turn_idx) AS text
  FROM read_parquet('{tp}') GROUP BY conv_id
), m AS ({union}),
de AS (
  SELECT DISTINCT conv_id,
         ent_type || ':' || substr(raw, 2, length(raw) - 2) AS ent
  FROM m
),
p AS (
  SELECT a.ent AS ent_a, b.ent AS ent_b, count(*) AS n_ab
  FROM de a JOIN de b ON a.conv_id = b.conv_id AND a.ent < b.ent
  GROUP BY 1, 2
)"""


def _fixture(name: str) -> str:
    """Parquet fixture computed by the serial reference-semantics oracle
    (ehr_relation_extraction_ray/serial_oracle.py): for pipelines whose
    semantics are not SQL-expressible (chunker state machine, surrogate
    scorer cascade, union-find, simhash, IVF), the oracle SQL reads a
    fixture produced by an independent single-process naive implementation
    — the hash compare then verifies the distributed execution against the
    serial semantics."""
    from ehr_relation_extraction_ray import serial_oracle

    return serial_oracle.fixture_path(name, SF_CORRECTNESS_DIR)


_NGRAM_JACCARD_SQL = r"""
WITH words AS (SELECT doc_id::VARCHAR AS doc_id, string_split_regex(lower(text), '\s+') AS w
               FROM documents WHERE length(trim(text)) > 0),
sh AS (
  SELECT DISTINCT doc_id, shingle FROM (
    SELECT doc_id, unnest(list_transform(range(1, greatest(len(w) - 4, 1) + 1),
                   i -> array_to_string(w[i:i+4], ' '))) AS shingle
    FROM words)
),
df_ok AS (SELECT shingle FROM sh GROUP BY shingle HAVING count(*) <= 64),
shf AS (SELECT sh.* FROM sh JOIN df_ok USING (shingle)),
sizes AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id),
inter AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS i
          FROM shf a JOIN shf b USING (shingle) WHERE a.doc_id < b.doc_id
          GROUP BY 1, 2)
SELECT doc_a, doc_b, round(i * 1.0 / (sa.n + sb.n - i), 4) AS jaccard
FROM inter
JOIN sizes sa ON sa.doc_id = doc_a
JOIN sizes sb ON sb.doc_id = doc_b
WHERE i * 1.0 / (sa.n + sb.n - i) >= 0.8
ORDER BY doc_a, doc_b
"""

# transitive closure over the exact near-dup pairs (same pair set the
# verified-LSH path emits — see _NGRAM_JACCARD_SQL); cluster_id = component
# min doc_id, matching hash-min label propagation in stages/clusters.py
_CROSS_DEDUP_SQL = r"""
WITH words AS (SELECT doc_id::VARCHAR AS doc_id, string_split_regex(lower(text), '\s+') AS w
               FROM documents WHERE length(trim(text)) > 0),
sh AS (
  SELECT DISTINCT doc_id, shingle FROM (
    SELECT doc_id, unnest(list_transform(range(1, greatest(len(w) - 4, 1) + 1),
                   i -> array_to_string(w[i:i+4], ' '))) AS shingle
    FROM words)
),
df_ok AS (SELECT shingle FROM sh GROUP BY shingle HAVING count(*) <= 64),
shf AS (SELECT sh.* FROM sh JOIN df_ok USING (shingle)),
sizes AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id),
inter AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS i
          FROM shf a JOIN shf b USING (shingle)
          WHERE a.doc_id < b.doc_id
            AND CAST(a.doc_id AS BIGINT) % 2 <> CAST(b.doc_id AS BIGINT) % 2
          GROUP BY 1, 2)
SELECT doc_a, doc_b, round(i * 1.0 / (sa.n + sb.n - i), 4) AS jaccard
FROM inter
JOIN sizes sa ON sa.doc_id = doc_a
JOIN sizes sb ON sb.doc_id = doc_b
WHERE i * 1.0 / (sa.n + sb.n - i) >= 0.8
ORDER BY doc_a, doc_b
"""

_DUP_CLUSTERS_SQL = r"""
WITH RECURSIVE words AS (SELECT doc_id::VARCHAR AS doc_id, string_split_regex(lower(text), '\s+') AS w
               FROM documents WHERE length(trim(text)) > 0),
sh AS (
  SELECT DISTINCT doc_id, shingle FROM (
    SELECT doc_id, unnest(list_transform(range(1, greatest(len(w) - 4, 1) + 1),
                   i -> array_to_string(w[i:i+4], ' '))) AS shingle
    FROM words)
),
df_ok AS (SELECT shingle FROM sh GROUP BY shingle HAVING count(*) <= 64),
shf AS (SELECT sh.* FROM sh JOIN df_ok USING (shingle)),
sizes AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id),
inter AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS i
          FROM shf a JOIN shf b USING (shingle) WHERE a.doc_id < b.doc_id
          GROUP BY 1, 2),
pairs AS (SELECT doc_a, doc_b FROM inter
          JOIN sizes sa ON sa.doc_id = doc_a
          JOIN sizes sb ON sb.doc_id = doc_b
          WHERE i * 1.0 / (sa.n + sb.n - i) >= 0.8),
edges AS (SELECT doc_a AS u, doc_b AS v FROM pairs
          UNION ALL SELECT doc_b, doc_a FROM pairs),
reach(node, lab) AS (
  SELECT u, u FROM (SELECT DISTINCT u FROM edges) t
  UNION
  SELECT e.u, r.lab FROM edges e JOIN reach r ON r.node = e.v
),
labels AS (SELECT node AS doc_id, min(lab) AS cluster_id
           FROM reach GROUP BY node)
SELECT l.doc_id, l.cluster_id, CAST(c.n AS BIGINT) AS cluster_size
FROM labels l
JOIN (SELECT cluster_id, count(*) AS n FROM labels GROUP BY cluster_id) c
  USING (cluster_id)
ORDER BY doc_id
"""

_TFIDF_SQL = r"""
WITH words AS (SELECT doc_id::VARCHAR AS doc_id,
                      string_split_regex(lower(text), '\s+') AS w
               FROM documents),
toks AS (SELECT doc_id, unnest(w) AS term FROM words),
tf AS (SELECT doc_id, term, count(*) AS tf FROM toks
       WHERE term <> '' GROUP BY 1, 2),
dft AS (SELECT term, count(*) AS df FROM tf GROUP BY term),
n AS (SELECT count(DISTINCT doc_id) AS nd FROM tf),
scored AS (SELECT doc_id, term, tf,
                  round(tf * ln(nd * 1.0 / df), 6) AS tfidf
           FROM tf JOIN dft USING (term) CROSS JOIN n),
ranked AS (SELECT *, row_number() OVER
             (PARTITION BY doc_id ORDER BY tfidf DESC, term) AS rn
           FROM scored)
SELECT doc_id, term, CAST(tf AS BIGINT) AS tf, tfidf
FROM ranked WHERE rn <= 3 ORDER BY doc_id, term
"""

_INVERTED_INDEX_SQL = r"""
WITH words AS (SELECT doc_id::VARCHAR AS doc_id,
                      string_split_regex(lower(text), '\s+') AS w
               FROM documents),
toks AS (SELECT DISTINCT doc_id, unnest(w) AS term FROM words),
f AS (SELECT * FROM toks WHERE term <> '')
SELECT term, CAST(count(*) AS BIGINT) AS df,
       md5(string_agg(doc_id, ',' ORDER BY doc_id)) AS postings_md5
FROM f GROUP BY term ORDER BY term
"""

_COSINE_DUP_SQL = """
SELECT a.vec_id AS id_a, b.vec_id AS id_b,
       round(CAST(list_cosine_similarity(a.embedding, b.embedding) AS DOUBLE), 4) AS cosine
FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
WHERE list_cosine_similarity(a.embedding, b.embedding) >= 0.5
ORDER BY id_a, id_b
"""


def _drug_no_ade_sql(tp: str) -> str:
    from ehr_relation_extraction_ray.lexicon import DEFAULT_LEXICON, fit_patterns

    pats = fit_patterns(DEFAULT_LEXICON)
    return f"""
WITH docs AS (
  SELECT conv_id AS doc_id,
         string_agg(COALESCE(text,''), chr(10)||chr(10) ORDER BY turn_idx) AS text
  FROM read_parquet('{tp}') GROUP BY conv_id
)
SELECT doc_id FROM docs
WHERE regexp_matches(text, $dp${pats["Drug"]}$dp$, 'i')
  AND NOT regexp_matches(text, $ap${pats["ADE"]}$ap$, 'i')
ORDER BY doc_id
"""


def oracle_sql() -> dict[str, str]:
    tp = _transcripts_sql_path()
    mp = _media_sql_path()
    adep = _ade_sql_path()
    return {
        "kg_assembly": f"""
SELECT conv_id AS doc_id, count(*) AS n_turns,
       md5(string_agg(COALESCE(text,''), chr(10)||chr(10) ORDER BY turn_idx)) AS text_md5
FROM read_parquet('{tp}') GROUP BY conv_id ORDER BY doc_id
""",
        "kg_mentions": _mentions_sql(tp),
        "kg_role_stats": f"""
SELECT role,
       count(*) AS n_turns,
       count(DISTINCT conv_id) AS n_convs,
       CAST(sum(CASE WHEN COALESCE(tool, '') <> '' THEN 1 ELSE 0 END) AS BIGINT)
           AS n_tool_turns,
       CAST(sum(length(COALESCE(text, ''))) AS BIGINT) AS sum_chars
FROM read_parquet('{tp}') GROUP BY role ORDER BY role
""",
        "kg_tool_chains": f"""
WITH t AS (
  SELECT conv_id, turn_idx, tool FROM read_parquet('{tp}')
  WHERE COALESCE(tool, '') <> ''
),
s AS (
  SELECT conv_id, tool,
         lag(tool) OVER (PARTITION BY conv_id ORDER BY turn_idx) AS prev
  FROM t
)
SELECT prev AS tool_a, tool AS tool_b, count(*) AS n
FROM s WHERE prev IS NOT NULL
GROUP BY 1, 2 ORDER BY 1, 2
""",
        "kg_conv_dedup": f"""
WITH docs AS (
  SELECT conv_id,
         md5(string_agg(COALESCE(text,''), chr(10)||chr(10) ORDER BY turn_idx)) AS h
  FROM read_parquet('{tp}') GROUP BY conv_id
)
SELECT min(conv_id) AS keep_id, count(*) AS n_dups
FROM docs GROUP BY h ORDER BY keep_id
""",
        "kg_turn_latency": f"""
WITH s AS (
  SELECT conv_id, role, ts,
         lag(role) OVER w AS role_a,
         lag(ts) OVER w AS prev_ts
  FROM read_parquet('{tp}')
  WINDOW w AS (PARTITION BY conv_id ORDER BY turn_idx)
)
SELECT role_a, role AS role_b, count(*) AS n,
       round(CAST(sum(epoch_us(ts) - epoch_us(prev_ts)) AS BIGINT)
             / count(*) / 1000000.0, 6) AS mean_gap_s
FROM s WHERE role_a IS NOT NULL
GROUP BY role_a, role ORDER BY role_a, role_b
""",
        "part_brand_margin": """
SELECT p_brand,
       round(sum(l_extendedprice * (1 - l_discount)), 2) AS sum_revenue,
       round(sum(p_retailprice * l_quantity), 2) AS sum_retail,
       count(*) AS n_lines
FROM lineitem JOIN part ON l_partkey = p_partkey
WHERE l_quantity > 5
GROUP BY p_brand ORDER BY p_brand
""",
        "agg_lineitem": """
SELECT l_returnflag, l_linestatus,
       round(sum(l_quantity), 2) AS sum_qty,
       round(sum(l_extendedprice), 2) AS sum_base_price,
       round(sum(l_extendedprice * (1 - l_discount)), 2) AS sum_revenue,
       round(avg(l_discount), 6) AS avg_disc,
       count(*) AS count_order
FROM lineitem GROUP BY l_returnflag, l_linestatus
ORDER BY l_returnflag, l_linestatus
""",
        "join_orders_customer": """
SELECT c_mktsegment,
       round(sum(o_totalprice), 2) AS segment_revenue,
       count(*) AS n_orders
FROM orders JOIN customer ON o_custkey = c_custkey
GROUP BY c_mktsegment ORDER BY c_mktsegment
""",
        # same SQL, different engine plan: the Ray side uses the native
        # hash-SHUFFLE join instead of the broadcast lookup
        "orders_customer_hashjoin": """
SELECT c_mktsegment,
       round(sum(o_totalprice), 2) AS segment_revenue,
       count(*) AS n_orders
FROM orders JOIN customer ON o_custkey = c_custkey
GROUP BY c_mktsegment ORDER BY c_mktsegment
""",
        "events_quantiles": """
SELECT event_type, count(*) AS n_events,
       round(quantile_disc(value, 0.25), 2) AS q25,
       round(quantile_disc(value, 0.5), 2) AS q50,
       round(quantile_disc(value, 0.9), 2) AS q90
FROM events GROUP BY event_type ORDER BY event_type
""",
        "topk_events_per_type": """
SELECT event_type, rank, event_id, round(value, 2) AS value FROM (
  SELECT event_type, event_id, value,
         row_number() OVER (
           PARTITION BY event_type ORDER BY value DESC, event_id ASC
         ) AS rank
  FROM events
) WHERE rank <= 3 ORDER BY event_type, rank
""",
        "events_windowed": """
SELECT event_type,
       to_timestamp((CAST(floor(epoch(ts)) AS BIGINT) // 3600) * 3600)::TIMESTAMP AS window_start,
       count(*) AS n_events, round(sum(value), 2) AS sum_value
FROM events GROUP BY 1, 2 ORDER BY 1, 2
""",
        "events_sliding": """
SELECT event_type,
       to_timestamp((CAST(floor(epoch(ts)) AS BIGINT) // 900) * 900 - i * 900)::TIMESTAMP AS window_start,
       count(*) AS n_events, round(sum(value), 2) AS sum_value
FROM events CROSS JOIN range(4) AS t(i)
GROUP BY 1, 2 ORDER BY 1, 2
""",
        "events_asof_join": """
WITH p AS (SELECT user_id, ts, event_id FROM events WHERE event_type = 'purchase'),
     v AS (SELECT user_id, ts FROM events WHERE event_type = 'view')
SELECT p.user_id,
       count(*) AS n_purchases,
       CAST(sum(CASE WHEN v.ts IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_matched,
       round(COALESCE(sum(epoch(p.ts - v.ts)), 0), 2) AS total_gap_s
FROM p ASOF LEFT JOIN v ON p.user_id = v.user_id AND p.ts >= v.ts
GROUP BY p.user_id ORDER BY p.user_id
""",
        "topk_orders": """
SELECT o_orderkey, o_totalprice,
       row_number() OVER (ORDER BY o_totalprice DESC, o_orderkey ASC) AS rank
FROM orders ORDER BY o_totalprice DESC, o_orderkey ASC LIMIT 10
""",
        "event_type_counts": """
SELECT event_type, round(sum(value), 2) AS sum_value, count(*) AS n_events
FROM events GROUP BY event_type ORDER BY event_type
""",
        "filtered_revenue": """
SELECT l_returnflag,
       round(sum(l_extendedprice * (1 - l_discount)), 2) AS sum_revenue,
       count(*) AS n_rows
FROM lineitem WHERE l_quantity > 10 AND l_discount < 0.05
GROUP BY l_returnflag ORDER BY l_returnflag
""",
        "sessionize_events": """
WITH gaps AS (
  SELECT user_id, ts, event_id,
         CASE WHEN epoch(ts - lag(ts) OVER w) > 240*60 THEN 1 ELSE 0 END AS new_s
  FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
), sess AS (
  SELECT user_id, sum(new_s) OVER (PARTITION BY user_id ORDER BY ts, event_id
         ROWS UNBOUNDED PRECEDING) AS session_id
  FROM gaps
), per_session AS (
  SELECT user_id, session_id, count(*) AS n FROM sess GROUP BY user_id, session_id
)
SELECT user_id, count(*) AS n_sessions, sum(n)::BIGINT AS n_events,
       max(n) AS max_session_events
FROM per_session GROUP BY user_id ORDER BY user_id
""",
        "nation_region_join": """
SELECT r_name, count(*) AS n_suppliers, round(sum(s_acctbal), 2) AS sum_acctbal
FROM supplier
JOIN nation ON s_nationkey = n_nationkey
JOIN region ON n_regionkey = r_regionkey
GROUP BY r_name ORDER BY r_name
""",
        "docs_exact_dedup": """
SELECT min(doc_id) AS keep_id, count(*) AS n_dups
FROM documents GROUP BY text ORDER BY keep_id
""",
        "docs_stats": r"""
SELECT doc_id,
       length(text) AS n_chars,
       length(regexp_extract_all(text, '\S+')) AS n_tokens,
       md5(text) AS md5
FROM documents ORDER BY doc_id
""",
        "docs_entropy": r"""
WITH toks AS (
  SELECT doc_id, tok FROM (
    SELECT doc_id, unnest(string_split_regex(lower(text), '\s+')) AS tok
    FROM documents
  ) WHERE length(tok) > 0
),
tc AS (SELECT doc_id, tok, count(*) AS c FROM toks GROUP BY doc_id, tok),
n AS (SELECT doc_id, sum(c) AS n FROM tc GROUP BY doc_id)
SELECT tc.doc_id, CAST(max(n) AS BIGINT) AS n_tokens,
       round(-sum((c / n) * ln(c / n)), 6) AS entropy
FROM tc JOIN n USING (doc_id)
GROUP BY tc.doc_id ORDER BY tc.doc_id
""",
        "docs_boilerplate": r"""
WITH words AS (
  SELECT doc_id, string_split_regex(lower(text), '\s+') AS w
  FROM documents WHERE length(trim(text)) > 0
),
sh AS (
  SELECT DISTINCT doc_id, ngram FROM (
    SELECT doc_id, unnest(list_transform(range(1, greatest(len(w) - 7, 1) + 1),
                   i -> array_to_string(w[i:i+7], ' '))) AS ngram
    FROM words)
)
SELECT md5(ngram) AS ngram_md5, CAST(count(*) AS BIGINT) AS df
FROM sh GROUP BY ngram HAVING count(*) >= 3
ORDER BY ngram_md5
""",
        "docs_budget_per_lang": """
WITH tot AS (
  SELECT lang, CAST(sum(n_chars) * 6 // 10 AS BIGINT) AS budget
  FROM documents GROUP BY lang
),
ranked AS (
  SELECT lang, doc_id, n_chars,
         sum(n_chars) OVER (
           PARTITION BY lang ORDER BY n_chars DESC, doc_id
           ROWS UNBOUNDED PRECEDING
         ) AS cum
  FROM documents
)
SELECT r.lang, CAST(count(*) AS BIGINT) AS n_docs,
       CAST(sum(n_chars) AS BIGINT) AS chars_kept
FROM ranked r JOIN tot USING (lang)
WHERE cum <= budget
GROUP BY r.lang ORDER BY r.lang
""",
        "docs_weighted_sample": """
WITH k AS (
  SELECT doc_id, n_chars,
         ln((('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 15))::UBIGINT + 1)
            / 1152921504606846977.0) / n_chars AS s_key
  FROM documents WHERE n_chars > 0
)
SELECT CAST(row_number() OVER (ORDER BY s_key DESC, doc_id) AS BIGINT) AS rank,
       doc_id, CAST(n_chars AS BIGINT) AS n_chars, round(s_key, 9) AS s_key
FROM k ORDER BY s_key DESC, doc_id LIMIT 25
""",
        "docs_stratified_sample": """
SELECT lang, rank, doc_id, sample_key FROM (
  SELECT lang, doc_id, md5(CAST(doc_id AS VARCHAR)) AS sample_key,
         row_number() OVER (
           PARTITION BY lang
           ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id
         ) AS rank
  FROM documents
) WHERE rank <= 20 ORDER BY lang, rank
""",
        "docs_decontaminate": r"""
WITH words AS (SELECT doc_id, string_split_regex(lower(text), '\s+') AS w
               FROM documents WHERE length(trim(text)) > 0),
sh AS (
  SELECT DISTINCT doc_id, shingle FROM (
    SELECT doc_id, unnest(list_transform(range(1, greatest(len(w) - 4, 1) + 1),
                   i -> array_to_string(w[i:i+4], ' '))) AS shingle
    FROM words)
),
bench AS (SELECT DISTINCT shingle FROM sh WHERE doc_id % 17 = 0)
SELECT s.doc_id, CAST(count(*) AS BIGINT) AS n_hits
FROM sh s JOIN bench b USING (shingle)
WHERE s.doc_id % 17 <> 0
GROUP BY s.doc_id ORDER BY s.doc_id
""",
        "docs_bloom_decontaminate": r"""
WITH words AS (SELECT doc_id, string_split_regex(lower(text), '\s+') AS w
               FROM documents WHERE length(trim(text)) > 0),
sh AS (
  SELECT DISTINCT doc_id, shingle FROM (
    SELECT doc_id, unnest(list_transform(range(1, greatest(len(w) - 4, 1) + 1),
                   i -> array_to_string(w[i:i+4], ' '))) AS shingle
    FROM words)
),
bench AS (SELECT DISTINCT shingle FROM sh WHERE doc_id % 17 = 0)
SELECT s.doc_id, CAST(count(*) AS BIGINT) AS n_hits
FROM sh s JOIN bench b USING (shingle)
WHERE s.doc_id % 17 <> 0
GROUP BY s.doc_id ORDER BY s.doc_id
""",
        "docs_unigram_logprob": r"""
WITH toks AS (
  SELECT doc_id, tok FROM (
    SELECT doc_id, unnest(string_split_regex(lower(text), '\s+')) AS tok
    FROM documents
  ) WHERE length(tok) > 0
),
freq AS (SELECT tok, count(*) AS c FROM toks GROUP BY tok),
tot AS (SELECT sum(c) AS n FROM freq)
SELECT doc_id, CAST(count(*) AS BIGINT) AS n_tokens,
       round(avg(ln(c / n)), 6) AS avg_logprob
FROM toks JOIN freq USING (tok), tot
GROUP BY doc_id ORDER BY doc_id
""",
        "docs_repetition": r"""
WITH d AS (SELECT doc_id, text FROM documents WHERE length(trim(text)) > 0),
lines AS (
  SELECT doc_id, line FROM (
    SELECT doc_id, unnest(string_split(text, chr(10))) AS line FROM d
  ) WHERE length(trim(line)) > 0
),
lstats AS (SELECT doc_id, count(*) AS n_lines,
                  count(DISTINCT line) AS n_distinct
           FROM lines GROUP BY doc_id),
words AS (SELECT doc_id, string_split_regex(lower(text), '\s+') AS w FROM d),
bg AS (
  SELECT doc_id, unnest(list_transform(range(1, len(w)),
                 i -> w[i] || ' ' || w[i+1])) AS bigram
  FROM words WHERE len(w) >= 2
),
bstats AS (
  SELECT doc_id, sum(c) AS nb, max(c) AS maxc FROM (
    SELECT doc_id, bigram, count(*) AS c FROM bg GROUP BY doc_id, bigram
  ) GROUP BY doc_id
)
SELECT l.doc_id, CAST(l.n_lines AS BIGINT) AS n_lines,
       round(1.0 - n_distinct * 1.0 / n_lines, 6) AS dup_line_frac,
       round(COALESCE(maxc * 1.0 / nb, 0), 6) AS top_bigram_frac
FROM lstats l LEFT JOIN bstats b ON l.doc_id = b.doc_id
ORDER BY l.doc_id
""",
        "docs_pack_bins": r"""
WITH t AS (
  SELECT doc_id, length(regexp_extract_all(text, '\S+')) AS n_tokens
  FROM documents
),
p AS (
  SELECT doc_id, n_tokens,
         COALESCE(sum(n_tokens) OVER (
           ORDER BY doc_id ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
         ), 0) AS prefix
  FROM t
)
SELECT doc_id, CAST(n_tokens AS BIGINT) AS n_tokens,
       CAST(prefix // 2048 AS BIGINT) AS bin_id
FROM p ORDER BY doc_id
""",
        "event_type_user_counts": """
SELECT event_type, CAST(count(DISTINCT user_id) AS BIGINT) AS n_users
FROM events GROUP BY event_type ORDER BY event_type
""",
        "events_percent_rank": """
SELECT event_id, round(value, 2) AS value,
       round(percent_rank() OVER (ORDER BY value, event_id), 6) AS pct_rank
FROM events ORDER BY event_id
""",
        "events_ntile": """
WITH t AS (
  SELECT value, ntile(4) OVER (ORDER BY value, event_id) AS nt FROM events
)
SELECT nt AS ntile, count(*) AS n, round(sum(value), 2) AS sum_value
FROM t GROUP BY nt ORDER BY nt
""",
        "events_json_extract": """
SELECT event_type, count(*) AS n,
       CAST(sum(CAST(props->>'k' AS BIGINT)) AS BIGINT) AS sum_k,
       count(DISTINCT CAST(props->>'k' AS BIGINT)) AS n_distinct_k
FROM events GROUP BY event_type ORDER BY event_type
""",
        "events_pivot": """
SELECT event_type,
       round(sum(CASE WHEN isodow(ts) = 1 THEN value ELSE 0 END), 2) AS wd1,
       round(sum(CASE WHEN isodow(ts) = 2 THEN value ELSE 0 END), 2) AS wd2,
       round(sum(CASE WHEN isodow(ts) = 3 THEN value ELSE 0 END), 2) AS wd3,
       round(sum(CASE WHEN isodow(ts) = 4 THEN value ELSE 0 END), 2) AS wd4,
       round(sum(CASE WHEN isodow(ts) = 5 THEN value ELSE 0 END), 2) AS wd5,
       round(sum(CASE WHEN isodow(ts) = 6 THEN value ELSE 0 END), 2) AS wd6,
       round(sum(CASE WHEN isodow(ts) = 7 THEN value ELSE 0 END), 2) AS wd7
FROM events GROUP BY event_type ORDER BY event_type
""",
        "events_variance_udaf": """
SELECT event_type, round(var_pop(value), 6) AS var_pop
FROM events GROUP BY event_type ORDER BY event_type
""",
        "segment_priority_revenue": """
SELECT c_mktsegment, o_orderpriority,
       count(*) AS n_lines,
       round(sum(l_extendedprice * (1 - l_discount)), 2) AS sum_revenue
FROM customer
JOIN orders ON c_custkey = o_custkey
JOIN lineitem ON l_orderkey = o_orderkey
GROUP BY c_mktsegment, o_orderpriority
ORDER BY c_mktsegment, o_orderpriority
""",
        "largest_order_per_customer": """
SELECT o_custkey, o_orderkey, round(o_totalprice, 2) AS o_totalprice
FROM (
  SELECT o_custkey, o_orderkey, o_totalprice,
         row_number() OVER (
           PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey
         ) AS rn
  FROM orders WHERE o_custkey < 200
) WHERE rn = 1 ORDER BY o_custkey
""",
        "events_retention": """
WITH fw AS (
  SELECT user_id, date_trunc('week', min(ts)) AS cw
  FROM events GROUP BY user_id
),
act AS (SELECT DISTINCT user_id, date_trunc('week', ts) AS w FROM events),
j AS (
  SELECT fw.user_id, cw,
         CAST(date_diff('day', cw, w) // 7 AS BIGINT) AS week_offset
  FROM act JOIN fw USING (user_id)
)
SELECT strftime(cw, '%Y-%m-%d') AS cohort_week, week_offset,
       CAST(count(DISTINCT user_id) AS BIGINT) AS n_users
FROM j GROUP BY cohort_week, week_offset
ORDER BY cohort_week, week_offset
""",
        "events_funnel": """
WITH v AS (
  SELECT user_id, min(ts) AS tv FROM events
  WHERE event_type = 'view' GROUP BY user_id
),
c AS (
  SELECT e.user_id, min(e.ts) AS tc
  FROM events e JOIN v USING (user_id)
  WHERE e.event_type = 'click' AND e.ts > v.tv GROUP BY e.user_id
),
p AS (
  SELECT e.user_id, min(e.ts) AS tp
  FROM events e JOIN c USING (user_id)
  WHERE e.event_type = 'purchase' AND e.ts > c.tc GROUP BY e.user_id
)
SELECT step, CAST(n_users AS BIGINT) AS n_users FROM (
  SELECT 'step1_view' AS step, count(*) AS n_users FROM v
  UNION ALL SELECT 'step2_click', count(*) FROM c
  UNION ALL SELECT 'step3_purchase', count(*) FROM p
) ORDER BY step
""",
        "customer_events_full_outer": """
WITH l AS (
  SELECT c_custkey, c_acctbal FROM customer
  WHERE c_custkey < 300 AND c_custkey % 2 = 1
),
r AS (SELECT user_id, CAST(count(*) AS BIGINT) AS n_events
      FROM events GROUP BY user_id),
j AS (
  SELECT l.c_custkey, l.c_acctbal, r.user_id, r.n_events
  FROM l FULL OUTER JOIN r ON l.c_custkey = r.user_id
)
SELECT CASE WHEN c_custkey IS NOT NULL AND user_id IS NOT NULL THEN 'both'
            WHEN c_custkey IS NOT NULL THEN 'left_only'
            ELSE 'right_only' END AS side,
       CAST(count(*) AS BIGINT) AS n_rows,
       round(sum(COALESCE(c_acctbal, 0.0)), 2) AS sum_acctbal,
       CAST(sum(COALESCE(n_events, 0)) AS BIGINT) AS sum_events
FROM j GROUP BY side ORDER BY side
""",
        "events_profile": """
SELECT col_name, CAST(n_rows AS BIGINT) AS n_rows,
       CAST(n_nulls AS BIGINT) AS n_nulls,
       round(min_val, 2) AS min_val, round(max_val, 2) AS max_val,
       round(sum_val, 2) AS sum_val
FROM (
  SELECT 'event_id' AS col_name, count(*) AS n_rows,
         count(*) - count(event_id) AS n_nulls,
         min(event_id) AS min_val, max(event_id) AS max_val,
         sum(event_id) AS sum_val FROM events
  UNION ALL
  SELECT 'user_id', count(*), count(*) - count(user_id),
         min(user_id), max(user_id), sum(user_id) FROM events
  UNION ALL
  SELECT 'value', count(*), count(*) - count(value),
         min(value), max(value), sum(value) FROM events
) ORDER BY col_name
""",
        "events_cube": """
SELECT COALESCE(event_type, 'ALL') AS event_type,
       COALESCE(isodow(ts), -1) AS weekday,
       round(sum(value), 2) AS sum_value,
       CAST(count(*) AS BIGINT) AS n_events
FROM events GROUP BY CUBE(event_type, isodow(ts))
ORDER BY event_type, weekday
""",
        "events_interval_join": """
WITH gaps AS (
  SELECT user_id, ts, event_id,
         CASE WHEN epoch(ts - lag(ts) OVER w) > 240*60 THEN 1 ELSE 0 END AS new_s
  FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
), sess AS (
  SELECT user_id, ts, sum(new_s) OVER (PARTITION BY user_id ORDER BY ts, event_id
         ROWS UNBOUNDED PRECEDING) AS session_id
  FROM gaps
), iv AS (
  SELECT user_id, session_id, min(ts) AS s_start, max(ts) AS s_end
  FROM sess GROUP BY user_id, session_id
)
SELECT e.user_id, CAST(count(*) AS BIGINT) AS n_matched,
       CAST(count(DISTINCT iv.session_id) AS BIGINT) AS n_sessions
FROM events e
JOIN iv ON e.user_id = iv.user_id AND e.ts BETWEEN iv.s_start AND iv.s_end
GROUP BY e.user_id ORDER BY e.user_id
""",
        "events_quantiles_hist": """
WITH h AS (
  SELECT event_type, CAST(floor(value / 5.0) AS BIGINT) AS bin,
         count(*) AS n
  FROM events GROUP BY event_type, bin
),
c AS (
  SELECT event_type, bin, n,
         sum(n) OVER (PARTITION BY event_type ORDER BY bin) AS cum,
         sum(n) OVER (PARTITION BY event_type) AS total
  FROM h
)
SELECT event_type, CAST(max(total) AS BIGINT) AS n_events,
       round((min(CASE WHEN cum >= greatest(ceil(0.25 * total), 1) THEN bin END) + 0.5) * 5.0, 2) AS q25,
       round((min(CASE WHEN cum >= greatest(ceil(0.5 * total), 1) THEN bin END) + 0.5) * 5.0, 2) AS q50,
       round((min(CASE WHEN cum >= greatest(ceil(0.9 * total), 1) THEN bin END) + 0.5) * 5.0, 2) AS q90
FROM c GROUP BY event_type ORDER BY event_type
""",
        "events_winsorized": """
WITH b AS (
  SELECT event_type,
         quantile_disc(value, 0.05) AS lo, quantile_disc(value, 0.95) AS hi
  FROM events GROUP BY event_type
)
SELECT e.event_type, CAST(count(*) AS BIGINT) AS n_events,
       CAST(sum(CASE WHEN value < lo THEN 1 ELSE 0 END) AS BIGINT) AS n_clip_lo,
       CAST(sum(CASE WHEN value > hi THEN 1 ELSE 0 END) AS BIGINT) AS n_clip_hi,
       round(sum(least(greatest(value, lo), hi)), 2) AS sum_clipped
FROM events e JOIN b USING (event_type)
GROUP BY e.event_type ORDER BY e.event_type
""",
        "events_zscore": """
SELECT event_id, event_type,
       round((value - avg(value) OVER (PARTITION BY event_type))
             / stddev_pop(value) OVER (PARTITION BY event_type), 4) AS zscore
FROM events ORDER BY event_id
""",
        "events_lag_delta": """
WITH d AS (
  SELECT user_id,
         value - LAG(value) OVER (
           PARTITION BY user_id ORDER BY ts, event_id
         ) AS delta
  FROM events
)
SELECT user_id, CAST(count(delta) AS BIGINT) AS n_deltas,
       COALESCE(round(sum(abs(delta)), 2), 0.0) AS sum_abs_delta
FROM d GROUP BY user_id ORDER BY user_id
""",
        "events_quantiles_sampled": """
SELECT event_type, CAST(count(*) AS BIGINT) AS n_sample,
       round(quantile_disc(value, 0.25), 2) AS q25,
       round(quantile_disc(value, 0.5), 2) AS q50,
       round(quantile_disc(value, 0.9), 2) AS q90
FROM events
WHERE md5(CAST(event_id AS VARCHAR)) LIKE '0%'
GROUP BY event_type ORDER BY event_type
""",
        "customer_order_counts": """
SELECT c_custkey, CAST(count(o_orderkey) AS BIGINT) AS n_orders
FROM customer LEFT JOIN orders ON o_custkey = c_custkey
GROUP BY c_custkey ORDER BY c_custkey
""",
        "customers_no_big_orders": """
SELECT c_custkey, c_mktsegment FROM customer
WHERE c_custkey NOT IN (
  SELECT o_custkey FROM orders WHERE o_totalprice > 400000
) ORDER BY c_custkey
""",
        "docs_bpe_merges": f"""
SELECT "rank", "left", "right", pair_count
FROM read_parquet('{_fixture("docs_bpe_merges")}') ORDER BY "rank"
""",
        "docs_hash_embed": f"""
SELECT doc_id, vec_md5
FROM read_parquet('{_fixture("docs_hash_embed")}') ORDER BY doc_id
""",
        "docs_lang_centroid": f"""
SELECT lang, vec_md5
FROM read_parquet('{_fixture("docs_lang_centroid")}') ORDER BY lang
""",
        "docs_curation_funnel": r"""
WITH words AS (
  SELECT doc_id, string_split_regex(lower(text), '\s+') AS w
  FROM documents WHERE length(trim(text)) > 0
),
t AS (SELECT doc_id, len(w) AS n_tokens,
             len(list_distinct(w)) * 1.0 / len(w) AS ttr
      FROM words),
bg AS (
  SELECT doc_id, unnest(list_transform(range(1, len(w)),
                 i -> w[i] || ' ' || w[i+1])) AS bigram
  FROM words WHERE len(w) >= 2
),
bstats AS (
  SELECT doc_id, max(c) * 1.0 / sum(c) AS tbf FROM (
    SELECT doc_id, bigram, count(*) AS c FROM bg GROUP BY doc_id, bigram
  ) GROUP BY doc_id
),
cls AS (
  SELECT CASE WHEN n_tokens < 20 THEN 'fail_length'
              WHEN COALESCE(tbf, 0) > 0.07 THEN 'fail_repetition'
              WHEN ttr < 0.55 THEN 'fail_diversity'
              ELSE 'kept' END AS stage
  FROM t LEFT JOIN bstats USING (doc_id)
)
SELECT stage, count(*) AS n FROM cls GROUP BY stage ORDER BY stage
""",
        "events_mad": """
WITH med AS (
  SELECT event_type, quantile_cont(value, 0.5) AS m
  FROM events GROUP BY event_type
)
SELECT e.event_type, count(*) AS n,
       round(any_value(med.m), 6) AS median,
       round(quantile_cont(abs(e.value - med.m), 0.5), 6) AS mad
FROM events e JOIN med ON e.event_type = med.event_type
GROUP BY e.event_type ORDER BY e.event_type
""",
        "events_top_weekday": """
WITH c AS (
  SELECT event_type, isodow(ts) AS wd, count(*) AS n
  FROM events GROUP BY event_type, isodow(ts)
),
r AS (
  SELECT event_type, wd, n,
         row_number() OVER (PARTITION BY event_type ORDER BY n DESC, wd) AS rk
  FROM c
)
SELECT event_type, CAST(wd AS BIGINT) AS top_wd, n
FROM r WHERE rk = 1 ORDER BY event_type
""",
        "docs_shuffle": """
SELECT doc_id,
       CAST(row_number() OVER (ORDER BY md5(doc_id::VARCHAR || '-42'), doc_id) - 1
            AS BIGINT) AS pos
FROM documents ORDER BY doc_id
""",
        "events_moving_avg": """
SELECT event_id, user_id,
       round(avg(value) OVER (PARTITION BY user_id ORDER BY ts, event_id
                              ROWS BETWEEN 2 PRECEDING AND CURRENT ROW), 6)
           AS mov_avg
FROM events WHERE user_id < 30 ORDER BY event_id
""",
        "events_corr": """
SELECT event_type, count(*) AS n,
       round(corr(value, CAST(floor(epoch(ts)) AS BIGINT) % 86400), 6)
           AS corr_value_tod
FROM events GROUP BY event_type ORDER BY event_type
""",
        "docs_top_terms": r"""
SELECT term, CAST(c AS BIGINT) AS c FROM (
  SELECT tok AS term, count(*) AS c FROM (
    SELECT unnest(string_split_regex(lower(text), '\s+')) AS tok
    FROM documents
  ) WHERE length(tok) > 0 GROUP BY tok
) ORDER BY c DESC, term LIMIT 10
""",
        "docs_partitioned_write": f"""
SELECT doc_id, CAST(lang AS VARCHAR) AS lang, md5(text) AS text_md5
FROM read_parquet('{_pqpart_sql_glob()}', hive_partitioning=1)
ORDER BY doc_id
""",
        "docs_jsonl_roundtrip": f"""
SELECT doc_id, lang, md5(text) AS text_md5
FROM read_json_auto('{_jsonl_sql_glob()}')
ORDER BY doc_id
""",
        "events_csv_roundtrip": f"""
SELECT event_id, user_id, event_type, round(value, 6) AS value
FROM read_csv_auto('{_csv_sql_glob()}')
ORDER BY event_id
""",
        "docs_lang_divergence": r"""
WITH toks AS (
  SELECT lang, tok FROM (
    SELECT lang, unnest(string_split_regex(lower(text), '\s+')) AS tok
    FROM documents
  ) WHERE length(tok) > 0
),
lt AS (SELECT lang, tok, count(*) AS c FROM toks GROUP BY lang, tok),
vocab AS (SELECT tok, sum(c) AS ct FROM lt GROUP BY tok),
nl AS (SELECT lang, sum(c) AS n FROM lt GROUP BY lang),
nt AS (SELECT sum(c) AS n FROM lt),
grid AS (
  SELECT nl.lang, v.tok, v.ct, COALESCE(lt.c, 0) AS cl, nl.n AS n_lang, nt.n AS n_tot
  FROM nl CROSS JOIN vocab v
  LEFT JOIN lt ON lt.lang = nl.lang AND lt.tok = v.tok
  CROSS JOIN nt
),
contrib AS (
  SELECT lang, n_lang,
         cl / n_lang AS p,
         (ct - cl) / (n_tot - n_lang) AS q,
         (cl / n_lang + (ct - cl) / (n_tot - n_lang)) / 2.0 AS m
  FROM grid
)
SELECT lang, CAST(n_lang AS BIGINT) AS n_tokens,
       round(sum(CASE WHEN p > 0 THEN 0.5 * p * ln(p / m) ELSE 0 END)
             + sum(CASE WHEN q > 0 THEN 0.5 * q * ln(q / m) ELSE 0 END), 6) AS jsd
FROM contrib GROUP BY lang, n_lang ORDER BY lang
""",
        "docs_lang_mix": r"""
WITH c AS (SELECT lang, CAST(count(*) AS BIGINT) AS n_docs
           FROM documents GROUP BY lang),
t AS (SELECT sum(n_docs) AS total, count(*) AS k FROM c)
SELECT lang, n_docs, round(total / (k * n_docs), 6) AS mix_weight
FROM c, t ORDER BY lang
""",
        "docs_normalize": r"""
SELECT doc_id,
       CAST(length(regexp_replace(text, '[^0-9]', '', 'g')) AS BIGINT)
         AS n_digits,
       md5(trim(regexp_replace(regexp_replace(lower(text), '\d', '0', 'g'),
                               '\s+', ' ', 'g'))) AS norm_md5
FROM documents ORDER BY doc_id
""",
        "embeddings_dim_stats": """
SELECT dim, CAST(count(*) AS BIGINT) AS n,
       round(avg(x), 6) AS mean, round(stddev_pop(x), 6) AS sd
FROM (
  SELECT unnest(embedding) AS x, generate_subscripts(embedding, 1) AS dim
  FROM embeddings
)
GROUP BY dim ORDER BY dim
""",
        "events_histogram": r"""
SELECT bin, round(bin * 25.0, 2) AS bin_lo, CAST(count(*) AS BIGINT) AS n_events
FROM (SELECT CAST(floor(value / 25.0) AS BIGINT) AS bin FROM events)
GROUP BY bin ORDER BY bin
""",
        "docs_ngram_jaccard": _NGRAM_JACCARD_SQL,
        "docs_cross_dedup": _CROSS_DEDUP_SQL,
        # MinHash-LSH candidates + exact-Jaccard verify at the same
        # threshold must equal the exhaustive exact result whenever LSH
        # recall is 1 — asserted here by using the exact SQL as the oracle
        # (VERDICT r1 item 2b).
        "docs_minhash_pairs": _NGRAM_JACCARD_SQL,
        # Prefix filtering has recall 1 by THEOREM (smallest common shingle
        # is in both prefixes), so the uncapped exact self-join is an
        # unconditional oracle — stronger than the minhash recall argument.
        "docs_ppjoin_pairs": r"""
WITH words AS (SELECT doc_id::VARCHAR AS doc_id, string_split_regex(lower(text), '\s+') AS w
               FROM documents WHERE length(trim(text)) > 0),
sh AS (
  SELECT DISTINCT doc_id, shingle FROM (
    SELECT doc_id, unnest(list_transform(range(1, greatest(len(w) - 4, 1) + 1),
                   i -> array_to_string(w[i:i+4], ' '))) AS shingle
    FROM words)
),
sizes AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id),
inter AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS i
          FROM sh a JOIN sh b USING (shingle) WHERE a.doc_id < b.doc_id
          GROUP BY 1, 2)
SELECT doc_a, doc_b, round(i * 1.0 / (sa.n + sb.n - i), 4) AS jaccard
FROM inter
JOIN sizes sa ON sa.doc_id = doc_a
JOIN sizes sb ON sb.doc_id = doc_b
WHERE i * 1.0 / (sa.n + sb.n - i) >= 0.8
ORDER BY doc_a, doc_b
""",
        "docs_dup_clusters": _DUP_CLUSTERS_SQL,
        "events_quantiles_cont": """
SELECT event_type, count(*) AS n_events,
       round(quantile_cont(value, 0.25), 4) AS qc25,
       round(quantile_cont(value, 0.50), 4) AS qc50,
       round(quantile_cont(value, 0.90), 4) AS qc90
FROM events GROUP BY event_type ORDER BY event_type
""",
        "events_rollup": """
SELECT COALESCE(event_type, 'ALL') AS event_type,
       round(sum(value), 2) AS sum_value,
       CAST(count(*) AS BIGINT) AS n_events
FROM events GROUP BY ROLLUP(event_type) ORDER BY event_type
""",
        "docs_tfidf_top_terms": _TFIDF_SQL,
        "docs_inverted_index": _INVERTED_INDEX_SQL,
        "embeddings_topk": """
WITH qv AS (SELECT vec_id AS query_id, embedding AS qe FROM embeddings WHERE vec_id IN (0, 1, 2)),
sims AS (
  SELECT qv.query_id, e.vec_id,
         list_cosine_similarity(e.embedding, qv.qe) AS score
  FROM embeddings e CROSS JOIN qv
)
SELECT query_id, vec_id, rank FROM (
  SELECT query_id, vec_id,
         row_number() OVER (PARTITION BY query_id ORDER BY score DESC, vec_id ASC) AS rank
  FROM sims) t
WHERE rank <= 5 ORDER BY query_id, rank
""",
        "media_features": f"""
SELECT kind, count(*) AS n_media, sum(octet_length(payload))::BIGINT AS sum_bytes
FROM read_parquet('{mp}') GROUP BY kind ORDER BY kind
""",
        "embeddings_cosine_dup": _COSINE_DUP_SQL,
        # SRP-LSH blocked near-dup: recall is 1 at this sf/threshold, so
        # the exact-cosine SQL is the oracle (recall vs the exact path is
        # additionally asserted in tests).
        "embeddings_cosine_dup_lsh": _COSINE_DUP_SQL,
        # serial-oracle fixtures (see _fixture): independent single-process
        # naive implementations of the non-SQL-expressible semantics
        "kg_triples": f"""
SELECT doc_id, subj_id, subj, pred, obj
FROM read_parquet('{_fixture("kg_triples")}')
ORDER BY doc_id, subj_id, subj, pred, obj
""",
        "kg_wide_table": f"""
SELECT doc_id, subj_id, subj, pred,
       string_agg(obj, chr(10) ORDER BY obj) AS args,
       count(*) AS n_args
FROM read_parquet('{_fixture("kg_triples")}')
GROUP BY doc_id, subj_id, subj, pred
ORDER BY doc_id, subj_id, pred
""",
        "kg_drug_graph": f"""
SELECT doc_id, subj_id, subj,
       count(DISTINCT obj) + 1 AS n_nodes,
       count(*) AS n_edges,
       string_agg(pred || ':' || obj, chr(10) ORDER BY pred, obj) AS edges
FROM read_parquet('{_fixture("kg_triples")}')
GROUP BY doc_id, subj_id, subj ORDER BY doc_id, subj_id
""",
        "kg_degree_hist": f"""
WITH edges AS (
  SELECT DISTINCT subj, obj FROM read_parquet('{_fixture("kg_triples")}')
),
deg AS (SELECT subj, count(*) AS degree FROM edges GROUP BY subj)
SELECT degree, CAST(count(*) AS BIGINT) AS n_subjects
FROM deg GROUP BY degree ORDER BY degree
""",
        "kg_pagerank": f"""
SELECT node, rank FROM read_parquet('{_fixture("kg_pagerank")}')
ORDER BY node
""",
        "kg_pagerank_dist": f"""
SELECT node, rank FROM read_parquet('{_fixture("kg_pagerank")}')
ORDER BY node
""",
        # serial fixture: independent single-process extraction + the shared
        # deterministic TransE spec (bit-identical by the integer-coefficient
        # gradient-partial contract, stages/graph.py)
        "kg_transe": f"""
SELECT kind, name, dim, value FROM read_parquet('{_fixture("kg_transe")}')
ORDER BY kind, name, dim
""",
        "kg_transe_eval": f"""
SELECT metric, value FROM read_parquet('{_fixture("kg_transe_eval")}')
ORDER BY metric
""",
        "kg_constraint_violations": f"""
WITH t AS (SELECT * FROM read_parquet('{_fixture("kg_triples")}')),
drugs AS (SELECT DISTINCT subj FROM t),
checks AS (
  SELECT 'pred_known' AS rule, pred,
         CASE WHEN pred IN ('Strength','Duration','Route','Form','ADE',
                            'Dosage','Reason','Frequency') THEN 0 ELSE 1 END AS viol
  FROM t
  UNION ALL
  SELECT 'self_loop', pred, CASE WHEN subj = obj THEN 1 ELSE 0 END FROM t
  UNION ALL
  SELECT 'strength_numeric', pred,
         CASE WHEN NOT regexp_matches(obj, '\\d') THEN 1 ELSE 0 END
  FROM t WHERE pred = 'Strength'
  UNION ALL
  SELECT 'short_obj', pred, CASE WHEN length(obj) < 4 THEN 1 ELSE 0 END FROM t
  UNION ALL
  SELECT 'obj_is_drug', pred,
         CASE WHEN obj IN (SELECT subj FROM drugs) THEN 1 ELSE 0 END FROM t
)
SELECT rule, pred, CAST(count(*) AS BIGINT) AS n_checked,
       CAST(sum(viol) AS BIGINT) AS n_violations
FROM checks GROUP BY rule, pred ORDER BY rule, pred
""",
        "kg_label_prop_dist": f"""
SELECT node, community FROM read_parquet('{_fixture("kg_label_prop")}')
ORDER BY node
""",
        "kg_kcore_dist": f"""
SELECT node, core FROM read_parquet('{_fixture("kg_kcore")}')
ORDER BY node
""",
        "kg_ppr_dist": f"""
SELECT node, "rank" FROM read_parquet('{_fixture("kg_ppr")}')
ORDER BY node
""",
        "kg_betweenness_dist": f"""
SELECT node, betweenness FROM read_parquet('{_fixture("kg_betweenness")}')
ORDER BY node
""",
        "kg_khop": f"""
WITH RECURSIVE trip AS (SELECT subj, obj FROM read_parquet('{_fixture("kg_triples")}')),
edges AS (
  SELECT DISTINCT subj AS src, obj AS dst FROM trip
  UNION
  SELECT DISTINCT obj AS src, subj AS dst FROM trip
),
bfs(node, hop) AS (
  SELECT (SELECT min(subj) FROM trip), 0
  UNION
  SELECT e.dst, b.hop + 1 FROM bfs b JOIN edges e ON e.src = b.node
  WHERE b.hop < 3
)
SELECT node, CAST(min(hop) AS BIGINT) AS hop
FROM bfs GROUP BY node ORDER BY node
""",
        "kg_edge_spans": f"""
WITH ts0 AS (
  SELECT conv_id, min(epoch_us(ts)) AS t0
  FROM read_parquet('{tp}') GROUP BY conv_id
)
SELECT subj, pred, obj, count(*) AS n_docs,
       CAST(min(t0) AS BIGINT) AS first_ts,
       CAST(max(t0) AS BIGINT) AS last_ts
FROM read_parquet('{_fixture("kg_triples")}') t
JOIN ts0 ON t.doc_id = ts0.conv_id
GROUP BY subj, pred, obj ORDER BY subj, pred, obj
""",
        "kg_contradictions": f"""
WITH ts0 AS (
  SELECT conv_id, min(epoch_us(ts)) AS t0
  FROM read_parquet('{tp}') GROUP BY conv_id
),
per_obj AS (
  SELECT subj, pred, obj, count(*) AS n, max(t0) AS last_ts
  FROM read_parquet('{_fixture("kg_triples")}') t
  JOIN ts0 ON t.doc_id = ts0.conv_id
  GROUP BY subj, pred, obj
),
grp AS (
  SELECT subj, pred, CAST(count(*) AS BIGINT) AS n_objs,
         CAST(sum(n) AS BIGINT) AS n_support
  FROM per_obj GROUP BY subj, pred HAVING count(*) > 1
),
win AS (
  SELECT subj, pred, obj AS winner_obj,
         CAST(last_ts AS BIGINT) AS winner_last_ts,
         row_number() OVER (
           PARTITION BY subj, pred ORDER BY last_ts DESC, obj ASC
         ) AS rn
  FROM per_obj
)
SELECT g.subj, g.pred, g.n_objs, g.n_support, w.winner_obj, w.winner_last_ts
FROM grp g JOIN win w ON w.subj = g.subj AND w.pred = g.pred AND w.rn = 1
ORDER BY g.subj, g.pred
""",
        "kg_asof_snapshot": f"""
WITH ts0 AS (
  SELECT conv_id, min(epoch_us(ts)) AS t0
  FROM read_parquet('{tp}') GROUP BY conv_id
),
cut AS (SELECT (min(t0) + max(t0)) // 2 AS c FROM ts0),
fe AS (
  SELECT subj, pred, obj, CAST(min(ts0.t0) AS BIGINT) AS first_ts
  FROM read_parquet('{_fixture("kg_triples")}') t
  JOIN ts0 ON t.doc_id = ts0.conv_id
  GROUP BY subj, pred, obj
)
SELECT subj, pred, obj, first_ts FROM fe
WHERE first_ts <= (SELECT c FROM cut)
ORDER BY subj, pred, obj
""",
        "kg_ntriples_export": f"""
WITH e AS (
  SELECT DISTINCT subj, pred, obj
  FROM read_parquet('{_fixture("kg_triples")}')
),
enc AS (
  SELECT
    replace(replace(replace(replace(replace(
      subj, '%', '%25'), ' ', '%20'), '<', '%3C'), '>', '%3E'), '"', '%22'
    ) AS s,
    replace(replace(replace(replace(replace(
      pred, '%', '%25'), ' ', '%20'), '<', '%3C'), '>', '%3E'), '"', '%22'
    ) AS p,
    replace(replace(replace(obj, '\\', '\\\\'), '"', '\\"'), chr(10), '\\n') AS o
  FROM e
)
SELECT '<urn:ehr:node:' || s || '> <urn:ehr:pred:' || p || '> "' || o || '" .'
       AS line
FROM enc ORDER BY line
""",
        "kg_bgp_match": f"""
WITH e AS (
  SELECT DISTINCT subj, pred, obj
  FROM read_parquet('{_fixture("kg_triples")}')
)
SELECT DISTINCT a.subj AS drug, b.obj AS ae, c.obj AS dose
FROM e a
JOIN e b ON b.subj = a.subj
JOIN e c ON c.subj = a.subj
WHERE a.pred = 'Form' AND a.obj = 'tablet'
  AND b.pred = 'ADE' AND c.pred = 'Dosage'
ORDER BY drug, ae, dose
""",
        "kg_assoc_rules": f"""
WITH bi AS (
  SELECT DISTINCT doc_id, subj, pred || ':' || obj AS item
  FROM read_parquet('{_fixture("kg_triples")}')
),
nb AS (
  SELECT COUNT(*) AS n FROM (SELECT DISTINCT doc_id, subj FROM bi)
),
sup AS (SELECT item, COUNT(*) AS n FROM bi GROUP BY item),
pairs AS (
  SELECT x.item AS a, y.item AS b, COUNT(*) AS n_ab
  FROM bi x
  JOIN bi y ON x.doc_id = y.doc_id AND x.subj = y.subj AND x.item < y.item
  GROUP BY x.item, y.item
),
fp AS (
  SELECT a, b, n_ab FROM pairs, nb
  WHERE n_ab >= greatest(1, CAST(ceil(0.02 * nb.n) AS BIGINT))
),
rules AS (
  SELECT a AS antecedent, b AS consequent, n_ab FROM fp
  UNION ALL
  SELECT b AS antecedent, a AS consequent, n_ab FROM fp
)
SELECT r.antecedent, r.consequent, r.n_ab AS n_both,
       CAST(r.n_ab AS DOUBLE) / nb.n AS support,
       CAST(r.n_ab AS DOUBLE) / sa.n AS confidence,
       CAST(r.n_ab AS DOUBLE) * nb.n / (sa.n * sc.n) AS lift
FROM rules r
CROSS JOIN nb
JOIN sup sa ON sa.item = r.antecedent
JOIN sup sc ON sc.item = r.consequent
WHERE CAST(r.n_ab AS DOUBLE) / sa.n >= 0.2
ORDER BY antecedent, consequent
""",
        "kg_mention_chains": f"""
WITH m AS ({_turn_mentions_union(tp)}),
occ AS (
  SELECT DISTINCT conv_id, turn_idx, ent_type,
         lower(substr(raw, 2, length(raw) - 2)) AS surface
  FROM m
),
nxt AS (
  SELECT conv_id, ent_type, surface, turn_idx,
         lead(turn_idx) OVER (
           PARTITION BY conv_id, ent_type, surface ORDER BY turn_idx) AS nt
  FROM occ
)
SELECT ent_type,
       count(DISTINCT CASE WHEN nt IS NOT NULL
                           THEN conv_id || chr(0) || surface END) AS n_chains,
       count(nt) AS n_links,
       CAST(COALESCE(sum(nt - turn_idx), 0) AS BIGINT) AS sum_gap
FROM nxt GROUP BY ent_type ORDER BY ent_type
""",
        "kg_truth_discovery": f"""
WITH a AS (
  SELECT DISTINCT doc_id, subj, pred, obj
  FROM read_parquet('{_fixture("kg_triples")}')
),
v AS (SELECT subj, pred, obj, count(*) AS n FROM a GROUP BY 1, 2, 3),
conf AS (SELECT subj, pred FROM v GROUP BY subj, pred HAVING count(*) >= 2),
maj AS (
  SELECT subj, pred, obj AS mobj FROM (
    SELECT subj, pred, obj,
           row_number() OVER (PARTITION BY subj, pred
                              ORDER BY n DESC, obj ASC) AS rn
    FROM v) WHERE rn = 1
),
acc AS (
  SELECT a.doc_id, avg(CASE WHEN a.obj = m.mobj THEN 1.0 ELSE 0.0 END) AS acc
  FROM a JOIN maj m USING (subj, pred) GROUP BY a.doc_id
),
wv AS (
  SELECT a.subj, a.pred, a.obj,
         count(*) AS n_votes, sum(acc.acc) AS w
  FROM a JOIN acc USING (doc_id) GROUP BY 1, 2, 3
),
ranked AS (
  SELECT subj, pred, obj, n_votes, w,
         row_number() OVER (PARTITION BY subj, pred
                            ORDER BY round(w, 9) DESC, obj ASC) AS rn
  FROM wv JOIN conf USING (subj, pred)
)
SELECT subj, pred, obj, n_votes, round(w, 6) AS w_votes
FROM ranked WHERE rn = 1 ORDER BY subj, pred
""",
        "kg_distant_supervision": _cooccurrence_cte(tp) + f"""
, de2 AS (
  SELECT DISTINCT conv_id, ent_type,
         substr(raw, 2, length(raw) - 2) AS surf
  FROM m
),
kb AS (
  SELECT lower(subj) AS ksubj, lower(obj) AS kobj, min(pred) AS pred
  FROM read_parquet('{{trip}}')
  GROUP BY 1, 2 HAVING count(*) >= 3
),
cand AS (
  SELECT d.conv_id AS doc_id, d.surf AS subj,
         o.ent_type AS obj_type, o.surf AS obj
  FROM de2 d JOIN de2 o
    ON o.conv_id = d.conv_id AND o.ent_type <> 'Drug'
  WHERE d.ent_type = 'Drug'
),
lab AS (
  SELECT c.doc_id, c.subj, c.obj_type, c.obj,
         COALESCE(kb.pred, 'NA') AS label
  FROM cand c LEFT JOIN kb
    ON kb.ksubj = lower(c.subj) AND kb.kobj = lower(c.obj)
)
SELECT doc_id, subj, obj_type, obj, label FROM lab
WHERE label <> 'NA'
   OR ('0x' || substr(md5(doc_id || '|' || subj || '|' || obj), 1, 15))::UBIGINT
      % 10 = 0
ORDER BY doc_id, subj, obj_type, obj
""".replace("{trip}", _fixture("kg_triples")),
        "kg_pred_cooccurrence": f"""
WITH sp AS (
  SELECT DISTINCT subj, pred FROM read_parquet('{_fixture("kg_triples")}')
),
ns AS (SELECT count(DISTINCT subj) AS n FROM sp),
ca AS (SELECT pred, count(*) AS c FROM sp GROUP BY pred),
p AS (
  SELECT a.pred AS pred_a, b.pred AS pred_b, count(*) AS n_ab
  FROM sp a JOIN sp b ON a.subj = b.subj AND a.pred < b.pred
  GROUP BY 1, 2
)
SELECT pred_a, pred_b, n_ab,
       round(ln(CAST((SELECT n FROM ns) AS DOUBLE) * n_ab / (x.c * y.c)), 6)
           AS lift
FROM p
JOIN ca x ON x.pred = pred_a
JOIN ca y ON y.pred = pred_b
ORDER BY pred_a, pred_b
""",
        "kg_share_rules": f"""
WITH e AS (
  SELECT DISTINCT subj, pred, obj
  FROM read_parquet('{_fixture("kg_triples")}')
),
sh AS (
  SELECT DISTINCT a.pred AS p, a.subj AS x, b.subj AS z
  FROM e a JOIN e b ON a.pred = b.pred AND a.obj = b.obj
  WHERE a.subj < b.subj
),
bn AS (SELECT p, count(*) AS n_ant FROM sh GROUP BY p),
bo AS (
  SELECT s1.p AS antecedent, s2.p AS consequent, count(*) AS n_both
  FROM sh s1 JOIN sh s2 ON s1.x = s2.x AND s1.z = s2.z AND s1.p <> s2.p
  GROUP BY 1, 2
)
SELECT b.antecedent, b.consequent, bn.n_ant, b.n_both,
       round(CAST(b.n_both AS DOUBLE) / bn.n_ant, 6) AS confidence
FROM bo b JOIN bn ON bn.p = b.antecedent
WHERE b.n_both >= 5
  AND CAST(b.n_both AS DOUBLE) / bn.n_ant >= 0.1
ORDER BY antecedent, consequent
""",
        "kg_neighbor_sample": f"""
WITH e AS (
  SELECT DISTINCT subj, obj FROM read_parquet('{_fixture("kg_triples")}')
),
und AS (
  SELECT subj AS v, obj AS u FROM e
  UNION
  SELECT obj AS v, subj AS u FROM e
),
rk AS (
  SELECT v, u,
         row_number() OVER (
           PARTITION BY v ORDER BY md5(v || chr(31) || u)) AS r
  FROM und
),
h1 AS (SELECT v, u FROM rk WHERE r <= 3),
s2 AS (SELECT v AS mid, u AS w FROM rk WHERE r <= 2)
SELECT v AS seed, 1 AS hop, v AS src, u AS dst FROM h1
UNION ALL
SELECT h1.v AS seed, 2 AS hop, h1.u AS src, s2.w AS dst
FROM h1 JOIN s2 ON s2.mid = h1.u
ORDER BY seed, hop, src, dst
""",
        "kg_feature_prop": f"""
WITH e AS (
  SELECT DISTINCT subj, obj FROM read_parquet('{_fixture("kg_triples")}')
),
und AS (
  SELECT subj AS v, obj AS u FROM e
  UNION
  SELECT obj AS v, subj AS u FROM e
),
feat AS (
  SELECT v,
         strpos('0123456789abcdef', substr(md5(v), 1, 1)) - 1 AS x1,
         strpos('0123456789abcdef', substr(md5(v), 2, 1)) - 1 AS x2,
         strpos('0123456789abcdef', substr(md5(v), 3, 1)) - 1 AS x3,
         strpos('0123456789abcdef', substr(md5(v), 4, 1)) - 1 AS x4
  FROM (SELECT DISTINCT v FROM und)
),
h1 AS (
  SELECT und.v, count(*) AS c1,
         sum(f.x1) AS s1, sum(f.x2) AS s2, sum(f.x3) AS s3,
         sum(f.x4) AS s4
  FROM und JOIN feat f ON f.v = und.u GROUP BY und.v
),
h2 AS (
  SELECT und.v, sum(h1.c1) AS c2,
         sum(h1.s1) AS t1, sum(h1.s2) AS t2, sum(h1.s3) AS t3,
         sum(h1.s4) AS t4
  FROM und JOIN h1 ON h1.v = und.u GROUP BY und.v
)
SELECT v AS node, CAST(c2 AS BIGINT) AS n_paths,
       round(CAST(t1 AS DOUBLE) / c2, 6) AS f1,
       round(CAST(t2 AS DOUBLE) / c2, 6) AS f2,
       round(CAST(t3 AS DOUBLE) / c2, 6) AS f3,
       round(CAST(t4 AS DOUBLE) / c2, 6) AS f4
FROM h2 ORDER BY node
""",
        "kg_entity_summary": f"""
WITH e AS (
  SELECT DISTINCT subj, pred, obj
  FROM read_parquet('{_fixture("kg_triples")}')
),
c AS (SELECT pred, obj, count(*) AS n FROM e GROUP BY 1, 2),
r AS (
  SELECT e.subj, e.pred, e.obj, c.n,
         row_number() OVER (
           PARTITION BY e.subj ORDER BY c.n, e.pred, e.obj) AS rk
  FROM e JOIN c USING (pred, obj)
)
SELECT subj, pred, obj, n AS fact_freq, rk
FROM r WHERE rk <= 5 ORDER BY subj, rk
""",
        "kg_dictionary": f"""
WITH t AS (
  SELECT subj AS term FROM read_parquet('{_fixture("kg_triples")}')
  UNION
  SELECT pred FROM read_parquet('{_fixture("kg_triples")}')
  UNION
  SELECT obj FROM read_parquet('{_fixture("kg_triples")}')
)
SELECT term, row_number() OVER (ORDER BY term) - 1 AS id
FROM t ORDER BY term
""",
        "kg_index_zonemaps": f"""
WITH e AS (
  SELECT DISTINCT subj, pred, obj
  FROM read_parquet('{_fixture("kg_triples")}')
),
z AS (
  SELECT 'spo' AS idx_order, substr(md5(subj), 1, 1) AS bucket,
         count(*) AS n,
         min(subj || chr(31) || pred || chr(31) || obj) AS key_min,
         max(subj || chr(31) || pred || chr(31) || obj) AS key_max
  FROM e GROUP BY 2
  UNION ALL
  SELECT 'osp', substr(md5(obj), 1, 1),
         count(*),
         min(obj || chr(31) || subj || chr(31) || pred),
         max(obj || chr(31) || subj || chr(31) || pred)
  FROM e GROUP BY 2
)
SELECT * FROM z ORDER BY idx_order, bucket
""",
        "embeddings_knn_graph": f"""
SELECT vec_id, "rank", nbr_id, cos
FROM read_parquet('{_fixture("embeddings_knn_graph")}')
ORDER BY vec_id, "rank"
""",
        "kg_index_upsert": f"""
WITH e AS (
  SELECT DISTINCT subj, pred, obj
  FROM read_parquet('{_fixture("kg_triples")}')
),
z AS (
  SELECT 'spo' AS idx_order, substr(md5(subj), 1, 1) AS bucket,
         count(*) AS n,
         min(subj || chr(31) || pred || chr(31) || obj) AS key_min,
         max(subj || chr(31) || pred || chr(31) || obj) AS key_max
  FROM e GROUP BY 2
  UNION ALL
  SELECT 'osp', substr(md5(obj), 1, 1),
         count(*),
         min(obj || chr(31) || subj || chr(31) || pred),
         max(obj || chr(31) || subj || chr(31) || pred)
  FROM e GROUP BY 2
)
SELECT * FROM z ORDER BY idx_order, bucket
""",
        "kg_index_lookup": f"""
SELECT DISTINCT subj, pred, obj
FROM read_parquet('{_fixture("kg_triples")}')
WHERE subj IN ('lisinopril', 'metformin', 'warfarin')
ORDER BY subj, pred, obj
""",
        "docs_bpe_encode": f"""
SELECT doc_id, n_words, n_tokens
FROM read_parquet('{_fixture("docs_bpe_encode")}')
ORDER BY doc_id
""",
        "docs_dsir_select": r"""
WITH toks AS (
  SELECT doc_id, tok FROM (
    SELECT doc_id, unnest(string_split_regex(lower(text), '\s+')) AS tok
    FROM documents
  ) WHERE length(tok) > 0
),
b AS (
  SELECT doc_id,
         ('0x' || substr(md5(tok), 1, 15))::UBIGINT % 256 AS bucket
  FROM toks
),
spine AS (SELECT unnest(range(256)) AS bucket),
tgt AS (SELECT bucket, count(*) AS c FROM b WHERE doc_id % 7 = 0 GROUP BY 1),
src AS (SELECT bucket, count(*) AS c FROM b WHERE doc_id % 7 <> 0 GROUP BY 1),
tot AS (
  SELECT (SELECT COALESCE(sum(c), 0) FROM tgt) AS nt,
         (SELECT COALESCE(sum(c), 0) FROM src) AS ns
),
lr AS (
  SELECT s.bucket,
         ln((COALESCE(t.c, 0) + 1.0) / (tot.nt + 256))
           - ln((COALESCE(sr.c, 0) + 1.0) / (tot.ns + 256)) AS logratio
  FROM spine s
  LEFT JOIN tgt t ON t.bucket = s.bucket
  LEFT JOIN src sr ON sr.bucket = s.bucket, tot
),
w AS (
  SELECT b.doc_id, count(*) AS n_tokens, sum(lr.logratio) / count(*) AS wgt
  FROM b JOIN lr USING (bucket)
  WHERE b.doc_id % 7 <> 0
  GROUP BY b.doc_id
),
sc AS (
  SELECT doc_id, n_tokens,
         wgt - ln(-ln(
           (('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 15))::UBIGINT + 1)
           / 1152921504606846977.0
         )) AS score
  FROM w
)
SELECT CAST(row_number() OVER (ORDER BY score DESC, doc_id) AS BIGINT) AS rank,
       doc_id, CAST(n_tokens AS BIGINT) AS n_tokens, round(score, 6) AS score
FROM sc ORDER BY score DESC, doc_id LIMIT 50
""",
        "kg_entity_alignment": f"""
WITH e AS (
  SELECT DISTINCT
         CASE WHEN strpos('01234567', substr(md5(doc_id), 1, 1)) > 0
              THEN 'a' ELSE 'b' END AS side,
         subj AS ent, pred || ':' || obj AS feat
  FROM read_parquet('{_fixture("kg_triples")}')
),
d AS (SELECT side, ent, COUNT(*) AS deg FROM e GROUP BY side, ent),
i AS (
  SELECT a.ent AS ent_a, b.ent AS ent_b, COUNT(*) AS c
  FROM e a JOIN e b ON a.feat = b.feat
  WHERE a.side = 'a' AND b.side = 'b'
  GROUP BY a.ent, b.ent
)
SELECT ent_a, ent_b,
       round(CAST(i.c AS DOUBLE) / (da.deg + db.deg - i.c), 4) AS jaccard
FROM i
JOIN d da ON da.side = 'a' AND da.ent = i.ent_a
JOIN d db ON db.side = 'b' AND db.ent = i.ent_b
WHERE CAST(i.c AS DOUBLE) / (da.deg + db.deg - i.c) >= 0.5
ORDER BY ent_a, ent_b
""",
        "kg_negative_samples": f"""
WITH trip AS (
  SELECT doc_id, subj, pred, obj FROM read_parquet('{_fixture("kg_triples")}')
),
vocab AS (
  SELECT obj, row_number() OVER (ORDER BY obj) - 1 AS i
  FROM (SELECT DISTINCT obj FROM trip)
),
nn AS (SELECT count(*) AS n FROM vocab),
drawn AS (
  SELECT t.*,
         CAST(('0x' || substr(md5(doc_id||'|'||subj||'|'||pred||'|'||obj), 1, 8))::UBIGINT
              % (SELECT n FROM nn) AS BIGINT) AS idx
  FROM trip t
),
fixed AS (
  SELECT d.doc_id, d.subj, d.pred, d.obj,
         CASE WHEN v.obj = d.obj
              THEN (d.idx + 1) % (SELECT n FROM nn) ELSE d.idx END AS idx2
  FROM drawn d JOIN vocab v ON v.i = d.idx
)
SELECT f.doc_id, f.subj, f.pred, f.obj, v2.obj AS neg_obj
FROM fixed f JOIN vocab v2 ON v2.i = f.idx2
ORDER BY f.doc_id, f.subj, f.pred, f.obj
""",
        "kg_incremental_edges": f"""
SELECT subj, obj, count(*) AS n
FROM read_parquet('{_fixture("kg_triples")}')
GROUP BY subj, obj ORDER BY subj, obj
""",
        "kg_cooccurrence": _cooccurrence_cte(tp) + """
, ca AS (SELECT ent, count(*) AS c FROM de GROUP BY ent),
nd AS (SELECT count(DISTINCT conv_id) AS n FROM read_parquet('{tp}'))
SELECT ent_a, ent_b, n_ab,
       round(ln(CAST((SELECT n FROM nd) AS DOUBLE) * n_ab / (ca.c * cb.c)), 6) AS pmi
FROM p
JOIN ca ON ca.ent = ent_a
JOIN ca cb ON cb.ent = ent_b
ORDER BY ent_a, ent_b
""".replace("{tp}", tp),
        "kg_triangles": _cooccurrence_cte(tp) + """
, e0 AS (SELECT ent_a AS a, ent_b AS b FROM p WHERE n_ab >= 2),
tri AS (
  SELECT e1.a AS x, e1.b AS y, e2.b AS z
  FROM e0 e1
  JOIN e0 e2 ON e2.a = e1.b
  JOIN e0 e3 ON e3.a = e1.a AND e3.b = e2.b
)
SELECT node, CAST(count(*) AS BIGINT) AS n_triangles
FROM (
  SELECT x AS node FROM tri
  UNION ALL SELECT y FROM tri
  UNION ALL SELECT z FROM tri
)
GROUP BY node ORDER BY node
""",
        "kg_triangles_dist": _cooccurrence_cte(tp) + """
, e0 AS (SELECT ent_a AS a, ent_b AS b FROM p WHERE n_ab >= 2),
tri AS (
  SELECT e1.a AS x, e1.b AS y, e2.b AS z
  FROM e0 e1
  JOIN e0 e2 ON e2.a = e1.b
  JOIN e0 e3 ON e3.a = e1.a AND e3.b = e2.b
)
SELECT node, CAST(count(*) AS BIGINT) AS n_triangles
FROM (
  SELECT x AS node FROM tri
  UNION ALL SELECT y FROM tri
  UNION ALL SELECT z FROM tri
)
GROUP BY node ORDER BY node
""",
        "kg_entity_components": _cooccurrence_cte(tp).replace(
            "WITH docs", "WITH RECURSIVE docs"
        ) + """
, e0 AS (SELECT ent_a, ent_b FROM p WHERE n_ab >= 2),
edges AS (SELECT ent_a AS u, ent_b AS v FROM e0
          UNION ALL SELECT ent_b, ent_a FROM e0),
reach(node, lab) AS (
  SELECT u, u FROM (SELECT DISTINCT u FROM edges) t
  UNION
  SELECT e.u, r.lab FROM edges e JOIN reach r ON r.node = e.v
),
labels AS (SELECT node AS ent, min(lab) AS component_id
           FROM reach GROUP BY node)
SELECT l.ent, l.component_id, CAST(c.n AS BIGINT) AS component_size
FROM labels l
JOIN (SELECT component_id, count(*) AS n FROM labels GROUP BY component_id) c
  USING (component_id)
ORDER BY ent
""",
        "docs_substring_dedup": r"""
WITH words AS (
  SELECT doc_id::VARCHAR AS doc_id,
         list_filter(string_split_regex(lower(text), '\s+'), x -> x <> '') AS w
  FROM documents
),
sh AS (
  SELECT DISTINCT doc_id, shingle FROM (
    SELECT doc_id, unnest(list_transform(range(1, len(w) - 6),
                   i -> array_to_string(w[i:i+7], ' '))) AS shingle
    FROM words WHERE len(w) >= 8)
),
multi AS (SELECT shingle FROM sh GROUP BY shingle HAVING count(*) >= 2)
SELECT doc_id, CAST(count(*) AS BIGINT) AS n_dup_shingles
FROM sh JOIN multi USING (shingle)
GROUP BY doc_id ORDER BY doc_id
""",
        "docs_compress_ratio": f"""
SELECT doc_id, compress_ratio
FROM read_parquet('{_fixture("docs_compress_ratio")}') ORDER BY doc_id
""",
        "kg_windows": f"""
SELECT doc_id, n_windows FROM read_parquet('{_fixture("kg_windows")}')
ORDER BY doc_id
""",
        "kg_nodes": f"""
SELECT node_id, ent_type, canonical_text, n_aliases, n_mentions
FROM read_parquet('{_fixture("kg_nodes")}') ORDER BY node_id
""",
        "kg_nodes_fuzzy": f"""
SELECT node_id, ent_type, canonical_text, n_aliases, n_mentions
FROM read_parquet('{_fixture("kg_nodes_fuzzy")}') ORDER BY node_id
""",
        "docs_distinct_tokens": f"""
SELECT metric, estimate, nonzero_registers
FROM read_parquet('{_fixture("docs_distinct_tokens")}')
""",
        "docs_quality": f"""
SELECT doc_id, lang_pred, bpe_tokens, stopword_ratio, punct_ratio,
       digit_ratio, fingerprint
FROM read_parquet('{_fixture("docs_quality")}') ORDER BY doc_id
""",
        "docs_simhash_pairs": f"""
SELECT doc_a, doc_b, hamming
FROM read_parquet('{_fixture("docs_simhash_pairs")}') ORDER BY doc_a, doc_b
""",
        "embeddings_ivf_topk": f"""
SELECT query_id, vec_id, rank
FROM read_parquet('{_fixture("embeddings_ivf_topk")}') ORDER BY query_id, rank
""",
        "embeddings_pq_topk": f"""
SELECT query_id, vec_id, rank
FROM read_parquet('{_fixture("embeddings_pq_topk")}') ORDER BY query_id, rank
""",
        "embeddings_pca": f"""
SELECT dim, loading, eigval, var_ratio
FROM read_parquet('{_fixture("embeddings_pca")}') ORDER BY dim
""",
        "embeddings_cluster_sizes": f"""
SELECT cell, n_vecs, mean_sim
FROM read_parquet('{_fixture("embeddings_cluster_sizes")}') ORDER BY cell
""",
        "embeddings_semdedup": f"""
SELECT vec_a, vec_b, cos
FROM read_parquet('{_fixture("embeddings_semdedup")}') ORDER BY vec_a, vec_b
""",
        "media_resize_frames": f"""
SELECT * FROM (
  SELECT 'frames' AS stage,
         CAST(COALESCE(sum(floor(greatest(duration_ms, 0) / 250) + 1), 0) AS BIGINT) AS n_rows,
         CAST(COALESCE(sum((floor(greatest(duration_ms, 0) / 250) + 1) * 256), 0) AS BIGINT) AS n_bytes
  FROM read_parquet('{mp}') WHERE kind = 'video'
  UNION ALL
  SELECT 'resize' AS stage, count(*) AS n_rows,
         CAST(count(*) * 16 * 16 AS BIGINT) AS n_bytes
  FROM read_parquet('{mp}') WHERE kind = 'image'
) ORDER BY stage
""",
        # export roundtrips vs serial fixtures: the Ray query writes
        # CoNLL / RE-TSV shards and reads them back, so the hash compare
        # verifies projection + writer + reader against an independent
        # serial recomputation of the same digests
        "kg_conll_export": f"""
SELECT label, n_tokens FROM read_parquet('{_fixture("kg_conll_export")}')
ORDER BY label
""",
        "kg_re_export": f"""
SELECT split, n_rows FROM read_parquet('{_fixture("kg_re_export")}')
ORDER BY split
""",
        # detailed per-type evaluator vs an independent serial
        # recomputation of the n2c2 pare-down + macro reduction
        "kg_eval_detailed": f"""
SELECT scope, precision, recall, f1
FROM read_parquet('{_fixture("kg_eval_detailed")}') ORDER BY scope
""",
        # parallelism-invariance harness: the CLAIM is that the same
        # pipeline at 3 vs 64 read blocks produces the identical triple
        # and mention sets, i.e. every P/R/F1 is exactly 1.0 — so the
        # oracle is that constant. Any parallelism-dependent divergence
        # (ordering leak, partial dedup, boundary-dependent chunking)
        # breaks the hash.
        "kg_eval_invariance": """
SELECT metric, "precision", recall, f1 FROM (VALUES
  ('spans_lenient', 1.0, 1.0, 1.0),
  ('spans_strict', 1.0, 1.0, 1.0),
  ('triples_strict', 1.0, 1.0, 1.0)
) AS t(metric, "precision", recall, f1) ORDER BY metric
""",
        # ADE JSON ingestion digest: unnest entities, reference rename +
        # token-join-with-trailing-space parity (utils.py:349-419)
        "ade_ingest": f"""
WITH recs AS (SELECT tokens, entities FROM read_json_auto('{adep}')),
m AS (
  SELECT CASE WHEN e.type = 'Adverse-Effect' THEN 'ADE' ELSE e.type END AS ent_type,
         length(array_to_string(tokens[e.start + 1 : e."end"], ' ') || ' ') AS text_len
  FROM recs, unnest(entities) AS t(e)
)
SELECT ent_type, CAST(sum(text_len) AS BIGINT) AS text_chars,
       count(*) AS n_mentions
FROM m GROUP BY ent_type ORDER BY ent_type
""",
        "kg_drug_no_ade_docs": _drug_no_ade_sql(tp),
        "kg_linked_mentions": f"""
SELECT ent_type, link_method, n_mentions, sum_score
FROM read_parquet('{_fixture("kg_linked_mentions")}')
ORDER BY ent_type, link_method
""",
        "brat_ingest": f"""
SELECT kind, span_chars, n FROM read_parquet('{_fixture("brat_ingest")}')
ORDER BY kind
""",
        "docs_bm25": _BM25_CTE + """
SELECT doc_id, round(score, 6) AS score
FROM scored ORDER BY round(score, 6) DESC, doc_id LIMIT 10
""",
        "docs_retrieve_rerank": _BM25_CTE + """,
s1 AS (
  SELECT doc_id, round(score, 6) AS score
  FROM scored ORDER BY round(score, 6) DESC, doc_id LIMIT 20
),
ph AS (
  SELECT d.doc_id,
         CAST((length(lower(d.text))
               - length(replace(lower(d.text), 'window join', '')))
              // length('window join') AS BIGINT) AS n_phrase
  FROM documents d JOIN s1 USING (doc_id)
)
SELECT s1.doc_id, ph.n_phrase, s1.score
FROM s1 JOIN ph USING (doc_id)
ORDER BY ph.n_phrase DESC, s1.score DESC, s1.doc_id LIMIT 5
""",
        "docs_typo_pairs": r"""
WITH toks AS (
  SELECT DISTINCT tok FROM (
    SELECT unnest(string_split_regex(lower(text), '\s+')) AS tok
    FROM documents)
  WHERE regexp_matches(tok, '^[a-z]{3,}$')
)
SELECT a.tok AS tok_a, b.tok AS tok_b,
       CAST(levenshtein(a.tok, b.tok) AS BIGINT) AS d
FROM toks a JOIN toks b ON a.tok < b.tok
WHERE abs(length(a.tok) - length(b.tok)) <= 2
  AND levenshtein(a.tok, b.tok) <= 2
ORDER BY tok_a, tok_b
""",
        "kg_node_similarity": _cooccurrence_cte(tp) + """
, e0 AS (SELECT ent_a, ent_b FROM p WHERE n_ab >= 2),
und AS (SELECT ent_a AS a, ent_b AS b FROM e0
        UNION SELECT ent_b, ent_a FROM e0),
deg AS (SELECT a, count(*) AS dg FROM und GROUP BY a),
wedge AS (
  SELECT u1.a AS x, u2.a AS y, count(*) AS c
  FROM und u1 JOIN und u2 ON u1.b = u2.b AND u1.a < u2.a
  GROUP BY u1.a, u2.a
)
SELECT x AS ent_a, y AS ent_b,
       round(c * 1.0 / (dx.dg + dy.dg - c), 6) AS jaccard
FROM wedge
JOIN deg dx ON dx.a = x
JOIN deg dy ON dy.a = y
WHERE c * 1.0 / (dx.dg + dy.dg - c) >= 0.25
ORDER BY ent_a, ent_b
""",
        "events_late_arrivals": """
WITH d AS (
  SELECT event_id, user_id, epoch_us(ts) AS tus,
         epoch_us(ts) + (event_id % 7) * 30000000 AS atus
  FROM events
),
w AS (
  SELECT event_id, user_id, tus,
         max(tus) OVER (
           PARTITION BY user_id ORDER BY atus, event_id
           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS prev_max
  FROM d
)
SELECT event_id, user_id,
       (prev_max - tus - 60000000) // 1000000 AS late_by_s
FROM w
WHERE prev_max IS NOT NULL AND prev_max - tus > 60000000
ORDER BY event_id
""",
        "embeddings_int8_quant": """
WITH x AS (
  SELECT generate_subscripts(embedding, 1) AS dim,
         CAST(unnest(embedding) AS DOUBLE) AS v
  FROM embeddings
),
cal AS (
  SELECT dim, min(v) AS lo, max(v) AS hi, count(*) AS n,
         (max(v) - min(v)) / 255.0 AS scale
  FROM x GROUP BY dim
)
SELECT x.dim, round(cal.scale, 6) AS scale,
       round(avg(abs(
         least(greatest(round((x.v - cal.lo) / greatest(cal.scale, 1e-30)),
                        0), 255) * cal.scale + cal.lo - x.v)), 6) AS mae
FROM x JOIN cal USING (dim)
GROUP BY x.dim, cal.scale ORDER BY x.dim
""",
        "events_hourly_distinct": """
SELECT CAST(epoch_us(ts) // 3600000000 AS BIGINT) AS hour,
       CAST(count(DISTINCT user_id) AS BIGINT) AS n_users
FROM events GROUP BY 1 ORDER BY hour
""",
        "events_day_over_day": """
WITH d AS (
  SELECT event_type, CAST(epoch_us(ts) // 86400000000 AS BIGINT) AS day,
         CAST(count(*) AS BIGINT) AS n
  FROM events GROUP BY 1, 2
)
SELECT event_type, day, n,
       CAST(COALESCE(n - lag(n) OVER (
         PARTITION BY event_type ORDER BY day), 0) AS BIGINT) AS delta
FROM d ORDER BY event_type, day
""",
        "embeddings_dim_ablation": """
WITH qv AS (SELECT vec_id AS query_id, embedding AS qe FROM embeddings
            WHERE vec_id IN (0, 1, 2)),
fr AS (
  SELECT qv.query_id, e.vec_id,
         row_number() OVER (
           PARTITION BY qv.query_id
           ORDER BY list_cosine_similarity(e.embedding, qv.qe) DESC,
                    e.vec_id) AS rank
  FROM embeddings e CROSS JOIN qv
),
hr AS (
  SELECT qv.query_id, e.vec_id,
         row_number() OVER (
           PARTITION BY qv.query_id
           ORDER BY list_cosine_similarity(e.embedding[1:32], qv.qe[1:32])
                    DESC, e.vec_id) AS rank
  FROM embeddings e CROSS JOIN qv
)
SELECT f.query_id, CAST(count(*) AS BIGINT) AS n_overlap
FROM (SELECT query_id, vec_id FROM fr WHERE rank <= 5) f
JOIN (SELECT query_id, vec_id FROM hr WHERE rank <= 5) h
  USING (query_id, vec_id)
GROUP BY f.query_id ORDER BY f.query_id
""",
        "kg_kcore": f"""
SELECT node, core FROM read_parquet('{_fixture("kg_kcore")}')
ORDER BY node
""",
        "kg_random_walks": f"""
SELECT start, walk_idx, path
FROM read_parquet('{_fixture("kg_random_walks")}')
ORDER BY start, walk_idx
""",
        "lineitem_below_avg": """
SELECT round(sum(l_extendedprice) / 7.0, 2) AS avg_yearly
FROM lineitem l
WHERE l.l_quantity < (
  SELECT 0.2 * avg(l2.l_quantity) FROM lineitem l2
  WHERE l2.l_partkey = l.l_partkey
)
""",
        "docs_f2_sketch": f"""
SELECT metric, value FROM read_parquet('{_fixture("docs_f2_sketch")}')
ORDER BY metric
""",
        "docs_heavy_hitters": r"""
WITH tok AS (SELECT unnest(string_split_regex(lower(text), '\s+')) AS token
             FROM documents),
t AS (SELECT token FROM tok WHERE token <> ''),
tot AS (SELECT count(*) AS total FROM t)
SELECT token, CAST(count(*) AS BIGINT) AS n
FROM t CROSS JOIN tot
GROUP BY token, tot.total
HAVING count(*) * 30 >= tot.total
ORDER BY n DESC, token
""",
        "events_markov": """
WITH seq AS (
  SELECT event_type AS next_type,
         lag(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id)
           AS prev_type
  FROM events
)
SELECT prev_type, next_type, CAST(count(*) AS BIGINT) AS n,
       round(count(*) * 1.0
             / sum(count(*)) OVER (PARTITION BY prev_type), 6) AS p
FROM seq WHERE prev_type IS NOT NULL
GROUP BY prev_type, next_type
ORDER BY prev_type, next_type
""",
        "kg_label_prop": f"""
SELECT node, community FROM read_parquet('{_fixture("kg_label_prop")}')
ORDER BY node
""",
        "local_supplier_volume": """
SELECT n_name, round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
FROM customer, orders, lineitem, supplier, nation, region
WHERE c_custkey = o_custkey AND l_orderkey = o_orderkey
  AND l_suppkey = s_suppkey AND c_nationkey = s_nationkey
  AND s_nationkey = n_nationkey AND n_regionkey = r_regionkey
  AND r_name = 'ASIA'
  AND o_orderdate >= TIMESTAMP '1996-01-01'
  AND o_orderdate < TIMESTAMP '1997-01-01'
GROUP BY n_name ORDER BY n_name
""",
        "large_volume_orders": """
WITH qual AS (
  SELECT l_orderkey, sum(l_quantity) AS sum_qty
  FROM lineitem GROUP BY l_orderkey HAVING sum(l_quantity) > 300
)
SELECT c.c_name, o.o_orderkey, o.o_totalprice, q.sum_qty
FROM qual q
JOIN orders o ON o.o_orderkey = q.l_orderkey
JOIN customer c ON c.c_custkey = o.o_custkey
ORDER BY o.o_totalprice DESC, o.o_orderkey LIMIT 100
""",
        "events_type_weekday_chisq": """
WITH c AS (
  SELECT event_type, isodow(ts) AS dow, count(*) AS n
  FROM events GROUP BY 1, 2
),
tot AS (SELECT sum(n) AS total FROM c),
rt AS (SELECT event_type, sum(n) AS rn FROM c GROUP BY 1),
ct AS (SELECT dow, sum(n) AS cn FROM c GROUP BY 1)
SELECT c.event_type, CAST(c.dow AS BIGINT) AS dow, CAST(c.n AS BIGINT) AS n,
       round(rt.rn * ct.cn * 1.0 / tot.total, 6) AS expected,
       round(pow(c.n - rt.rn * ct.cn * 1.0 / tot.total, 2)
             / (rt.rn * ct.cn * 1.0 / tot.total), 6) AS contrib
FROM c JOIN rt USING (event_type) JOIN ct USING (dow) CROSS JOIN tot
ORDER BY event_type, dow
""",
        "events_hll_overlap": f"""
SELECT type_a, type_b, n_exact, n_est
FROM read_parquet('{_fixture("events_hll_overlap")}')
ORDER BY type_a, type_b
""",
        "events_cusum": f"""
SELECT event_type, max_cusum, peak_day
FROM read_parquet('{_fixture("events_cusum")}')
ORDER BY event_type
""",
        "orders_lineitem_join_size": f"""
SELECT metric, value FROM read_parquet('{_fixture("orders_lineitem_join_size")}')
ORDER BY metric
""",
        "kg_linkpred_auc": f"""
SELECT n_pos, n_neg, auc FROM read_parquet('{_fixture("kg_linkpred_auc")}')
ORDER BY auc
""",
        "media_phash_dup": f"""
SELECT media_a, media_b, hamming
FROM read_parquet('{_fixture("media_phash_dup")}')
ORDER BY media_a, media_b
""",
        "kg_ppr": f"""
SELECT node, "rank" FROM read_parquet('{_fixture("kg_ppr")}')
ORDER BY node
""",
        "kg_adamic_adar": _cooccurrence_cte(tp) + """
, e0 AS (SELECT ent_a, ent_b FROM p WHERE n_ab >= 2),
und AS (SELECT ent_a AS a, ent_b AS b FROM e0
        UNION SELECT ent_b, ent_a FROM e0),
deg AS (SELECT a, count(*) AS dg FROM und GROUP BY a)
SELECT u1.a AS ent_a, u2.a AS ent_b,
       round(sum(1.0 / ln(dz.dg)), 6) AS aa
FROM und u1 JOIN und u2 ON u1.b = u2.b AND u1.a < u2.a
JOIN deg dz ON dz.a = u1.b
GROUP BY u1.a, u2.a
ORDER BY ent_a, ent_b
""",
        "kg_betweenness": f"""
SELECT node, betweenness FROM read_parquet('{_fixture("kg_betweenness")}')
ORDER BY node
""",
        "docs_heaps_fit": f"""
SELECT n_checkpoints, vocab_final, tokens_final, beta, k
FROM read_parquet('{_fixture("docs_heaps_fit")}')
""",
        "docs_cdc_dedup": f"""
SELECT n_total, n_distinct, bytes_total, bytes_distinct, dedup_ratio
FROM read_parquet('{_fixture("docs_cdc_dedup")}')
""",
        "orders_interarrival": """
WITH g AS (
  SELECT o_custkey,
         date_diff('day',
                   lag(o_orderdate) OVER (PARTITION BY o_custkey
                                          ORDER BY o_orderdate, o_orderkey),
                   o_orderdate) AS gap
  FROM orders
),
med AS (
  SELECT o_custkey, quantile_disc(gap, 0.5) AS m
  FROM g WHERE gap IS NOT NULL GROUP BY o_custkey
)
SELECT CAST(m // 7 AS BIGINT) AS bucket_weeks,
       CAST(count(*) AS BIGINT) AS n_customers
FROM med GROUP BY 1 ORDER BY 1
""",
        "rich_inactive_customers": """
WITH pos AS (SELECT avg(c_acctbal) AS a FROM customer WHERE c_acctbal > 0)
SELECT CAST(count(*) AS BIGINT) AS n_customers,
       round(coalesce(sum(c_acctbal), 0), 2) AS total_bal
FROM customer CROSS JOIN pos
WHERE c_acctbal > pos.a
  AND NOT EXISTS (SELECT 1 FROM orders
                  WHERE o_custkey = c_custkey
                    AND o_orderdate >= TIMESTAMP '2000-01-01')
""",
        "events_autocorr": """
WITH daily AS (
  SELECT event_type, date_trunc('day', ts) AS day, count(*) AS n
  FROM events GROUP BY 1, 2
),
lagged AS (
  SELECT event_type, CAST(n AS DOUBLE) AS n,
         lag(CAST(n AS DOUBLE)) OVER (PARTITION BY event_type ORDER BY day)
           AS prev
  FROM daily
)
SELECT event_type,
       CAST(count(*) + 1 AS BIGINT) AS n_days,
       round(corr(prev, n), 6) AS lag1_corr
FROM lagged WHERE prev IS NOT NULL
GROUP BY event_type HAVING count(*) >= 2
ORDER BY event_type
""",
        "events_benford": """
WITH d AS (
  SELECT CAST(substr(CAST(CAST(round(value * 100, 0) AS BIGINT) AS VARCHAR),
              1, 1) AS BIGINT) AS digit
  FROM events WHERE value > 0
),
obs AS (SELECT digit, count(*) AS n FROM d GROUP BY digit),
tot AS (SELECT sum(n) AS total FROM obs)
SELECT digit, CAST(n AS BIGINT) AS n,
       round(log10(1.0 + 1.0 / digit) * tot.total, 4) AS expected,
       round(pow(n - log10(1.0 + 1.0 / digit) * tot.total, 2)
             / (log10(1.0 + 1.0 / digit) * tot.total), 4) AS contrib
FROM obs CROSS JOIN tot ORDER BY digit
""",
        "docs_burstiness": r"""
WITH tok AS (SELECT doc_id, unnest(string_split_regex(lower(text), '\s+')) AS token
             FROM documents),
t AS (SELECT doc_id, token FROM tok WHERE token <> ''),
cf AS (SELECT token, count(*) AS cf FROM t GROUP BY token),
df AS (SELECT token, count(DISTINCT doc_id) AS df FROM t GROUP BY token)
SELECT token, CAST(cf.cf AS BIGINT) AS cf, CAST(df.df AS BIGINT) AS df,
       round(cf.cf * 1.0 / df.df, 6) AS burstiness
FROM cf JOIN df USING (token)
ORDER BY cf DESC, token LIMIT 15
""",
        "events_gini": """
WITH per AS (SELECT user_id, CAST(count(*) AS DOUBLE) AS n
             FROM events GROUP BY user_id),
r AS (SELECT n, row_number() OVER (ORDER BY n, user_id) AS i FROM per),
s AS (SELECT count(*) AS nu, sum(n) AS tot, sum(i * n) AS wsum FROM r)
SELECT CAST(nu AS BIGINT) AS n_users,
       round(2.0 * wsum / (nu * tot) - (nu + 1.0) / nu, 6) AS gini
FROM s
""",
        "docs_zipf_fit": r"""
WITH tok AS (SELECT unnest(string_split_regex(lower(text), '\s+')) AS token
             FROM documents),
c AS (SELECT token, count(*) AS n FROM tok WHERE token <> '' GROUP BY token),
ranked AS (
  SELECT ln(CAST(row_number() OVER (ORDER BY n DESC, token) AS DOUBLE)) AS x,
         ln(CAST(n AS DOUBLE)) AS y
  FROM c ORDER BY n DESC, token LIMIT 100
)
SELECT CAST(count(*) AS BIGINT) AS n_tokens_used,
       round(regr_slope(y, x), 6) AS slope,
       round(regr_intercept(y, x), 6) AS intercept
FROM ranked
""",
        "events_tier_join": """
WITH tiers(tier, lo, hi) AS (VALUES
  ('t0', 0.0, 1.0), ('t1', 1.0, 5.0), ('t2', 5.0, 20.0),
  ('t3', 20.0, 100.0), ('t4', 100.0, 1e18))
SELECT t.tier, CAST(count(*) AS BIGINT) AS n, round(sum(e.value), 2) AS sum_value
FROM events e JOIN tiers t ON e.value >= t.lo AND e.value < t.hi
GROUP BY t.tier ORDER BY t.tier
""",
        "customer_rfm": """
WITH per AS (
  SELECT o_custkey AS c_custkey,
         date_diff('day', max(o_orderdate),
                   (SELECT max(o_orderdate) FROM orders)) AS r_days,
         CAST(count(*) AS BIGINT) AS f,
         round(sum(o_totalprice), 2) AS m
  FROM orders GROUP BY 1
),
q AS (
  SELECT quantile_disc(r_days, 0.25) AS r1, quantile_disc(r_days, 0.5) AS r2,
         quantile_disc(r_days, 0.75) AS r3,
         quantile_disc(f, 0.25) AS f1, quantile_disc(f, 0.5) AS f2,
         quantile_disc(f, 0.75) AS f3,
         quantile_disc(m, 0.25) AS m1, quantile_disc(m, 0.5) AS m2,
         quantile_disc(m, 0.75) AS m3
  FROM per
)
SELECT c_custkey, CAST(r_days AS BIGINT) AS r_days, f, m,
       CAST(5 - (1 + (r_days > q.r1)::INT + (r_days > q.r2)::INT
                   + (r_days > q.r3)::INT) AS BIGINT) AS r_code,
       CAST(1 + (f > q.f1)::INT + (f > q.f2)::INT + (f > q.f3)::INT
            AS BIGINT) AS f_code,
       CAST(1 + (m > q.m1)::INT + (m > q.m2)::INT + (m > q.m3)::INT
            AS BIGINT) AS m_code
FROM per CROSS JOIN q ORDER BY c_custkey
""",
        "docs_partition_skew": f"""
SELECT n_partitions, n_rows, occupied, max_rows, min_rows, skew_ratio, cv
FROM read_parquet('{_fixture("docs_partition_skew")}')
""",
        "docs_scd2": """
WITH base AS (
  SELECT doc_id, text, substr(md5(CAST(doc_id AS VARCHAR)), 1, 1) AS c
  FROM documents
),
a AS (SELECT doc_id, md5(text) AS h FROM base),
b AS (
  SELECT doc_id,
         CASE WHEN c IN ('1', '2') THEN md5(text || ' v2')
              ELSE md5(text) END AS h
  FROM base WHERE c <> '0'
  UNION ALL
  SELECT doc_id + 10000000, md5('new doc ' || CAST(doc_id AS VARCHAR))
  FROM base WHERE c = '3'
),
j AS (
  SELECT COALESCE(a.doc_id, b.doc_id) AS doc_id, a.h AS ha, b.h AS hb
  FROM a FULL OUTER JOIN b ON a.doc_id = b.doc_id
)
SELECT doc_id, CAST(1 AS BIGINT) AS version, ha AS h,
       '2024-01-01' AS valid_from,
       CASE WHEN hb IS NOT NULL AND ha = hb THEN '9999-12-31'
            ELSE '2024-02-01' END AS valid_to
FROM j WHERE ha IS NOT NULL
UNION ALL
SELECT doc_id, CAST(2 AS BIGINT), hb, '2024-02-01', '9999-12-31'
FROM j WHERE ha IS NOT NULL AND hb IS NOT NULL AND ha <> hb
UNION ALL
SELECT doc_id, CAST(1 AS BIGINT), hb, '2024-02-01', '9999-12-31'
FROM j WHERE ha IS NULL
ORDER BY doc_id, version
""",
        "events_decayed_sum": """
WITH mx AS (SELECT max(epoch_us(ts)) AS t_max FROM events)
SELECT event_type,
       round(sum(value * pow(2.0,
             -(mx.t_max - epoch_us(ts)) / (7.0 * 24 * 3600 * 1000000))), 4)
         AS decayed_sum
FROM events CROSS JOIN mx
GROUP BY event_type ORDER BY event_type
""",
        "events_diff_in_diff": """
WITH cells AS (
  SELECT event_type,
         (user_id % 2 = 0) AS treat,
         (ts >= TIMESTAMP '2024-01-15') AS post,
         avg(value) AS m
  FROM events GROUP BY 1, 2, 3
)
SELECT event_type,
       round(
         (max(CASE WHEN treat AND post THEN m END)
          - max(CASE WHEN treat AND NOT post THEN m END))
         - (max(CASE WHEN NOT treat AND post THEN m END)
            - max(CASE WHEN NOT treat AND NOT post THEN m END)), 6) AS did
FROM cells GROUP BY event_type
HAVING count(*) = 4
ORDER BY event_type
""",
        "events_bitmap_distinct": """
WITH d AS (SELECT event_type, count(DISTINCT user_id) AS n_users
           FROM events GROUP BY event_type),
t2 AS (SELECT event_type FROM d ORDER BY event_type LIMIT 2),
ov AS (
  SELECT count(*) AS n FROM (
    SELECT user_id FROM events WHERE event_type = (SELECT min(event_type) FROM t2)
    INTERSECT
    SELECT user_id FROM events WHERE event_type = (SELECT max(event_type) FROM t2)
  )
)
SELECT d.event_type, CAST(d.n_users AS BIGINT) AS n_users,
       CAST(ov.n AS BIGINT) AS first_pair_overlap
FROM d CROSS JOIN ov ORDER BY d.event_type
""",
        "events_time_weighted_avg": """
WITH s AS (
  SELECT user_id, epoch_us(ts) AS t, value,
         lead(epoch_us(ts)) OVER w AS t2, lead(value) OVER w AS v2
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
)
SELECT user_id,
       round(sum((t2 - t) * (value + v2) / 2.0) / (max(t) - min(t)), 6)
         AS twavg
FROM s GROUP BY user_id
HAVING max(t) > min(t)
ORDER BY user_id
""",
        "top_supplier": """
WITH rev AS (
  SELECT l_suppkey AS s_suppkey,
         round(sum(l_extendedprice * (1 - l_discount)), 2) AS total_revenue
  FROM lineitem
  WHERE l_shipdate >= TIMESTAMP '1996-01-01'
    AND l_shipdate < TIMESTAMP '1996-04-01'
  GROUP BY l_suppkey
)
SELECT s.s_suppkey, s.s_name, r.total_revenue
FROM supplier s JOIN rev r USING (s_suppkey)
WHERE r.total_revenue = (SELECT max(total_revenue) FROM rev)
ORDER BY s.s_suppkey
""",
        "docs_cm_profile": f"""
SELECT token, n_exact, n_cm FROM read_parquet('{_fixture("docs_cm_profile")}')
ORDER BY n_exact DESC, token
""",
        "docs_rrf_fusion": _BM25_CTE + """,
ra AS (
  SELECT doc_id, row_number() OVER (ORDER BY round(score, 6) DESC, doc_id) AS r
  FROM scored QUALIFY r <= 50
),
rb AS (
  SELECT doc_id, row_number() OVER (ORDER BY n_chars DESC, doc_id) AS r
  FROM documents QUALIFY r <= 50
),
u AS (SELECT doc_id, r FROM ra UNION ALL SELECT doc_id, r FROM rb)
SELECT doc_id, round(sum(1.0 / (60 + r)), 6) AS rrf
FROM u GROUP BY doc_id
ORDER BY round(sum(1.0 / (60 + r)), 6) DESC, doc_id LIMIT 10
""",
        "customer_order_distribution": """
WITH per_cust AS (
  SELECT c.c_custkey, count(o.o_orderkey) AS n_orders
  FROM customer c LEFT JOIN orders o ON c.c_custkey = o.o_custkey
  GROUP BY c.c_custkey
)
SELECT n_orders, CAST(count(*) AS BIGINT) AS n_customers
FROM per_cust GROUP BY n_orders ORDER BY n_orders
""",
        "lineitem_copurchase": """
WITH op AS (SELECT DISTINCT l_orderkey AS o, l_partkey AS p FROM lineitem),
n AS (SELECT count(DISTINCT o) AS n_orders FROM op),
pc AS (SELECT p, count(*) AS c FROM op GROUP BY p),
pairs AS (
  SELECT a.p AS part_a, b.p AS part_b, count(*) AS n_ab
  FROM op a JOIN op b ON a.o = b.o AND a.p < b.p GROUP BY 1, 2
)
SELECT part_a, part_b, CAST(n_ab AS BIGINT) AS n_ab,
       round(CAST(n.n_orders AS DOUBLE) * n_ab / (ca.c * cb.c), 6) AS lift
FROM pairs
CROSS JOIN n
JOIN pc ca ON ca.p = part_a
JOIN pc cb ON cb.p = part_b
WHERE n_ab >= 2 ORDER BY part_a, part_b
""",
        "events_first_touch": """
WITH f AS (
  SELECT user_id, event_type,
         row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS rn
  FROM events
)
SELECT event_type, CAST(count(*) AS BIGINT) AS n_users
FROM f WHERE rn = 1 GROUP BY event_type ORDER BY event_type
""",
        "kg_mention_overlaps": f"""
SELECT type_a, type_b, n
FROM read_parquet('{_fixture("kg_mention_overlaps")}')
ORDER BY type_a, type_b
""",
        "embeddings_kmeans_iter": f"""
SELECT cell, dim, c FROM read_parquet('{_fixture("embeddings_kmeans_iter")}')
ORDER BY cell, dim
""",
        "embeddings_logreg": f"""
SELECT idx, w FROM read_parquet('{_fixture("embeddings_logreg")}')
ORDER BY idx
""",
        "docs_split_leakage": f"""
WITH pairs AS ({_NGRAM_JACCARD_SQL}),
tagged AS (
  SELECT doc_a, doc_b,
         CASE WHEN substr(md5(doc_a), 1, 1) IN ('0','1','2','3')
              THEN 'dev' ELSE 'train' END AS split_a,
         CASE WHEN substr(md5(doc_b), 1, 1) IN ('0','1','2','3')
              THEN 'dev' ELSE 'train' END AS split_b
  FROM pairs
)
SELECT doc_a, doc_b, split_a, split_b FROM tagged
WHERE split_a <> split_b ORDER BY doc_a, doc_b
""",
        "kg_turn_dedup": """
WITH t AS (
  SELECT conv_id, COALESCE(text, '') AS text,
         lag(COALESCE(text, '')) OVER (
           PARTITION BY conv_id ORDER BY turn_idx) AS prev
  FROM read_parquet('{tp}')
)
SELECT conv_id,
       CAST(count(*) FILTER (WHERE text = prev) AS BIGINT) AS n_dropped
FROM t GROUP BY conv_id
HAVING count(*) FILTER (WHERE text = prev) > 0
ORDER BY conv_id
""".replace("{tp}", tp),
        "kg_pred_cardinality": f"""
SELECT pred, CAST(count(*) AS BIGINT) AS n_triples,
       CAST(count(DISTINCT subj) AS BIGINT) AS n_subj,
       CAST(count(DISTINCT obj) AS BIGINT) AS n_obj
FROM read_parquet('{_fixture("kg_triples")}')
GROUP BY pred ORDER BY pred
""",
        "events_pareto": """
SELECT event_type, event_id FROM events e1
WHERE NOT EXISTS (
  SELECT 1 FROM events e2
  WHERE e2.event_type = e1.event_type
    AND e2.value >= e1.value AND e2.ts >= e1.ts
    AND (e2.value > e1.value OR e2.ts > e1.ts))
ORDER BY event_type, event_id
""",
        "events_stream_join": """
SELECT a.user_id, CAST(count(*) AS BIGINT) AS n_pairs
FROM events a JOIN events b
  ON b.user_id = a.user_id AND b.event_id > a.event_id
 AND b.event_type <> a.event_type
 AND epoch_us(b.ts) BETWEEN epoch_us(a.ts) AND epoch_us(a.ts) + 60000000
GROUP BY a.user_id ORDER BY a.user_id
""",
        "docs_upsert": """
WITH base AS (
  SELECT doc_id, text, substr(md5(CAST(doc_id AS VARCHAR)), 1, 1) AS c
  FROM documents
),
a AS (SELECT doc_id, md5(text) AS h FROM base),
b AS (
  SELECT doc_id,
         CASE WHEN c IN ('1', '2') THEN md5(text || ' v2')
              ELSE md5(text) END AS h
  FROM base WHERE c <> '0'
  UNION ALL
  SELECT doc_id + 10000000, md5('new doc ' || CAST(doc_id AS VARCHAR))
  FROM base WHERE c = '3'
)
SELECT COALESCE(b.doc_id, a.doc_id) AS doc_id, COALESCE(b.h, a.h) AS h
FROM a FULL OUTER JOIN b ON a.doc_id = b.doc_id
ORDER BY doc_id
""",
        "events_regression": """
WITH d AS (
  SELECT event_type,
         CAST(CAST(floor(epoch(ts)) AS BIGINT) % 86400 AS DOUBLE) AS x,
         value AS y
  FROM events
)
SELECT event_type, CAST(count(*) AS BIGINT) AS n_events,
       round(regr_slope(y, x), 6) AS slope,
       round(regr_intercept(y, x), 6) AS intercept
FROM d GROUP BY event_type ORDER BY event_type
""",
        "orders_half_crossing": """
WITH w AS (
  SELECT o_custkey, o_orderkey,
         sum(o_totalprice) OVER (
           PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum,
         sum(o_totalprice) OVER (PARTITION BY o_custkey) AS tot,
         count(*) OVER (PARTITION BY o_custkey) AS cnt,
         row_number() OVER (
           PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey) AS rn
  FROM orders
),
c AS (
  SELECT o_custkey, o_orderkey, tot,
         row_number() OVER (PARTITION BY o_custkey ORDER BY rn) AS hit_rn
  FROM w
  WHERE round(2 * cum, 2) >= round(tot, 2) AND cnt >= 2
)
SELECT o_custkey, o_orderkey AS half_orderkey,
       round(tot, 2) AS final_total
FROM c WHERE hit_rn = 1 ORDER BY o_custkey
""",
        "events_user_hll": f"""
SELECT event_type, n_users_est, nonzero_registers
FROM read_parquet('{_fixture("events_user_hll")}') ORDER BY event_type
""",
        "docs_zone_maps": """
SELECT lang, source, CAST(count(*) AS BIGINT) AS n_rows,
       min(doc_id) AS min_doc_id, max(doc_id) AS max_doc_id,
       min(n_chars) AS min_chars, max(n_chars) AS max_chars
FROM documents GROUP BY lang, source ORDER BY lang, source
""",
        "media_dedup": f"""
WITH media AS (SELECT media_id, payload FROM read_parquet('{mp}')),
doubled AS (
  SELECT media_id, payload FROM media
  UNION ALL
  SELECT media_id || '-copy', payload FROM media
  WHERE CAST(substr(media_id, 3) AS INT) % 7 = 0
),
h AS (SELECT media_id, md5(hex(payload)) AS payload_md5 FROM doubled)
SELECT payload_md5, CAST(count(*) AS BIGINT) AS n_copies,
       min(media_id) AS keep_id
FROM h GROUP BY payload_md5 HAVING count(*) > 1 ORDER BY keep_id
""",
        "kg_alias_fuzzy": _mentions_cte(tp) + r"""
, surf AS (
  SELECT DISTINCT ent_type,
         regexp_replace(lower(trim(substr(raw, 2, length(raw) - 2))),
                        '\s+', ' ', 'g') AS s
  FROM m
)
SELECT a.ent_type, a.s AS surf_a, b.s AS surf_b,
       CAST(levenshtein(a.s, b.s) AS BIGINT) AS d
FROM surf a JOIN surf b ON a.ent_type = b.ent_type AND a.s < b.s
WHERE abs(length(a.s) - length(b.s)) <= 2
  AND levenshtein(a.s, b.s) <= 2
ORDER BY a.ent_type, surf_a, surf_b
""",
        "docs_snapshot_diff": """
WITH base AS (
  SELECT doc_id, text, substr(md5(CAST(doc_id AS VARCHAR)), 1, 1) AS c
  FROM documents
),
a AS (SELECT doc_id, md5(text) AS h FROM base),
b AS (
  SELECT doc_id,
         CASE WHEN c IN ('1', '2') THEN md5(text || ' v2')
              ELSE md5(text) END AS h
  FROM base WHERE c <> '0'
  UNION ALL
  SELECT doc_id + 10000000, md5('new doc ' || CAST(doc_id AS VARCHAR))
  FROM base WHERE c = '3'
),
j AS (
  SELECT COALESCE(a.doc_id, b.doc_id) AS doc_id, a.h AS ha, b.h AS hb
  FROM a FULL OUTER JOIN b ON a.doc_id = b.doc_id
)
SELECT doc_id,
       CASE WHEN ha IS NULL THEN 'added'
            WHEN hb IS NULL THEN 'removed'
            ELSE 'changed' END AS change
FROM j
WHERE ha IS NULL OR hb IS NULL OR ha <> hb
ORDER BY doc_id
""",
        # every registry entry has an oracle_sql entry (kg_eval_invariance
        # got its constant-VALUES oracle in round 4 — the invariance claim
        # IS the constant); keep _NO_ORACLE empty unless a future entry is
        # genuinely rows-only.
    }
