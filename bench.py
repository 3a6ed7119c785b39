"""Benchmark harness (driver contract).

Runs the headline KG pipeline (transcripts -> deduped triples) plus a set of
representative operator queries over ``$GRAFT_SF_DIR`` (default sf0.1) and
prints ONE JSON line:

    {"metric": "kg_triples_e2e", "value": <sec>, "unit": "sec",
     "queries": {...per-query sec...}, "sf": ..., "num_cpus": N,
     "triples": N, "triples_per_sec": N}

``value`` is the median of 3 timed runs after 2 warm-up runs (the first
executions of a fresh Ray session pay worker-import and object-store
warm-up that a long-running cluster never sees).

``python bench.py --scaling`` runs the headline pipeline in two fresh
processes at num_cpus=8 and num_cpus=32 on the SAME input and reports both
plus scaling efficiency — the sandbox stand-in for the north rule's N vs
4N node clusters. The scaling input is a larger synthesized transcript
table (``$GRAFT_SCALING_CONVS`` conversations, default 72000) so measured
time is dominated by the work that scales (per-doc extraction), as it
would be at production scale, not by fixed per-session costs.
"""

from __future__ import annotations

import json
import os
import statistics
import subprocess
import sys
import time


def _init_ray(num_cpus: int):
    import ray

    if not ray.is_initialized():
        from ehr_relation_extraction_ray.functions import logquiet

        ray.init(
            address="local",
            num_cpus=num_cpus,
            include_dashboard=False,
            ignore_reinit_error=True,
            logging_level="ERROR",
            runtime_env=logquiet.runtime_env(),
        )
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False

    from ehr_relation_extraction_ray.functions import logquiet

    logquiet.install()


def _time_headline(path: str, warmups: int = None, reps: int = None):
    if warmups is None:
        warmups = int(os.environ.get("GRAFT_BENCH_WARMUPS", "2"))
    if reps is None:
        reps = int(os.environ.get("GRAFT_BENCH_REPS", "3"))
    from ehr_relation_extraction_ray.pipelines import kg

    # directory input => conversation-partitioned layout => shuffle-free
    # pipeline; single file => general sort-shuffle pipeline
    run = kg.run_partitioned if os.path.isdir(path) else kg.run

    n_triples = 0
    for _ in range(warmups):
        n_triples = run(path).count()
    runs = []
    for _ in range(reps):
        t0 = time.time()
        n_triples = run(path).count()
        runs.append(round(time.time() - t0, 3))
    return statistics.median(runs), runs, n_triples


def _run_bench() -> dict:
    num_cpus = int(os.environ.get("RAY_GRAFT_CPUS", "32"))
    sf_dir = os.environ.get("GRAFT_SF_DIR", "/root/testdata/sf0.1")
    _init_ray(num_cpus)

    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from ehr_relation_extraction_ray import synth
    from ehr_relation_extraction_ray.pipelines import queries as q, relational as r

    path = os.environ.get("GRAFT_BENCH_PATH") or synth.transcripts_path(sf_dir)
    # warm the OS page cache (untimed) so we measure compute+shuffle
    files = (
        [os.path.join(path, f) for f in os.listdir(path)]
        if os.path.isdir(path)
        else [path]
    )
    for fp in files:
        with open(fp, "rb") as f:
            while f.read(1 << 24):
                pass
    headline, runs, n_triples = _time_headline(path)

    query_times: dict[str, float] = {}
    query_runs: dict[str, list] = {}
    if not os.environ.get("GRAFT_HEADLINE_ONLY"):
        for name, fn in {
            "kg_assembly": lambda: q.kg_assembly(sf_dir),
            "kg_mentions": lambda: q.kg_mentions(sf_dir),
            "agg_lineitem": lambda: r.agg_lineitem(sf_dir),
            "docs_exact_dedup": lambda: q.docs_exact_dedup(sf_dir),
            "docs_ngram_jaccard": lambda: q.docs_ngram_jaccard(sf_dir),
            "docs_minhash_pairs": lambda: q.docs_minhash_pairs(sf_dir),
            "embeddings_topk": lambda: q.embeddings_topk(sf_dir),
            "sessionize_events": lambda: r.sessionize_events(sf_dir),
            "events_windowed": lambda: r.events_windowed(sf_dir),
            "part_brand_margin": lambda: r.part_brand_margin(sf_dir),
            "docs_decontaminate": lambda: q.docs_decontaminate(sf_dir),
            "docs_pack_bins": lambda: q.docs_pack_bins(sf_dir),
            "docs_cross_dedup": lambda: q.docs_cross_dedup(sf_dir),
            "docs_bloom_decontaminate": lambda: q.docs_bloom_decontaminate(sf_dir),
            "events_zscore": lambda: r.events_zscore(sf_dir),
            "embeddings_pca": lambda: q.embeddings_pca(sf_dir),
            "docs_bpe_merges": lambda: q.docs_bpe_merges(sf_dir),
            "embeddings_semdedup": lambda: q.embeddings_semdedup(sf_dir),
            "docs_shuffle": lambda: q.docs_shuffle(sf_dir),
            "kg_cooccurrence": lambda: q.kg_cooccurrence(sf_dir),
            "docs_substring_dedup": lambda: q.docs_substring_dedup(sf_dir),
            "embeddings_pq_topk": lambda: q.embeddings_pq_topk(sf_dir),
            "docs_bm25": lambda: q.docs_bm25(sf_dir),
            "kg_node_similarity": lambda: q.kg_node_similarity(sf_dir),
            "kg_pagerank_dist": lambda: q.kg_pagerank_dist(sf_dir),
            "kg_kcore_dist": lambda: q.kg_kcore_dist(sf_dir),
            "kg_transe_eval": lambda: q.kg_transe_eval(sf_dir),
            "kg_distant_supervision": lambda: q.kg_distant_supervision(sf_dir),
            "docs_dsir_select": lambda: q.docs_dsir_select(sf_dir),
            # round-4 distributed variants: frontier-walks over pinned
            # adjacency blocks and the subj-keyed pred-pair partial pass
            "kg_random_walks": lambda: q.kg_random_walks(sf_dir),
            "kg_pred_cooccurrence": lambda: q.kg_pred_cooccurrence(sf_dir),
        }.items():
            # three timed runs, report the min (this VM shows intermittent
            # multi-second host-noise stalls; raw runs kept for honesty)
            runs_q = []
            for _ in range(int(os.environ.get("GRAFT_BENCH_QUERY_REPS", "3"))):
                # the driver-query memos (one pipeline execution shared by
                # the correctness run's many consumers) must not turn the
                # second timed run into a cache hit — every rep measures
                # the real pipeline
                q._DOCS_MEMO.clear()
                q._MENTIONS_MEMO.clear()
                q._TRIPLES_MEMO.clear()
                q._COOC_MEMO.clear()
                t0 = time.time()
                fn()
                runs_q.append(round(time.time() - t0, 3))
            query_times[name] = min(runs_q)
            query_runs[name] = runs_q

    sf = os.path.basename(os.path.normpath(sf_dir)).replace("sf", "")
    result = {
        "metric": "kg_triples_e2e",
        "value": headline,
        "unit": "sec",
        "runs": runs,
        "queries": query_times,
        "query_runs": query_runs,
        "sf": float(sf),
        "num_cpus": num_cpus,
        "triples": int(n_triples),
        "triples_per_sec": round(n_triples / headline, 1),
    }
    import ray

    ray.shutdown()
    return result


def _run_child(ncpu: int, bench_path: str) -> dict:
    env = dict(
        os.environ,
        RAY_GRAFT_CPUS=str(ncpu),
        GRAFT_BENCH_PATH=bench_path,
        GRAFT_HEADLINE_ONLY="1",
    )
    out = subprocess.run(
        [sys.executable, os.path.abspath(__file__)],
        env=env,
        capture_output=True,
        text=True,
        check=True,
    ).stdout
    return json.loads(out.strip().splitlines()[-1])


def main() -> None:
    if "--scaling" in sys.argv:
        sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
        from ehr_relation_extraction_ray import synth

        # 72k convs -> 192 file shards -> 6 task waves at 32 CPUs, so the
        # final-wave straggler tail costs <1/6 of a wave (at 48k/128 shards
        # the 4-wave quantization alone ate ~5% efficiency)
        n_convs = int(os.environ.get("GRAFT_SCALING_CONVS", "72000"))
        bench_path = synth.transcripts_path_n(n_convs)
        # N vs 4N CPUs (the driver's sandbox stand-in for two cluster
        # sizes). Default 8 vs 32 (the full node): ~0.71 — bounded by two
        # measured box-level ceilings (all-core turbo droop 0.885 + shared
        # DRAM), not pipeline structure; round-1's 0.56-0.62 was fixed by
        # cutting extraction-chain memory traffic. The 4x jump with
        # constant per-node contention (GRAFT_SCALING_LO=2 HI=8, the
        # honest proxy for the rule's N->4N NODES) measures 0.91/0.96.
        # Full attribution in BASELINE.md. Override with GRAFT_SCALING_LO/HI.
        lo = int(os.environ.get("GRAFT_SCALING_LO", "8"))
        hi = int(os.environ.get("GRAFT_SCALING_HI", "32"))
        # INTERLEAVED lo/hi child pairs: this VM's throughput drifts by
        # 10-25% over minutes (host noise), so one lo child followed by
        # one hi child minutes later measures two different machines.
        # Alternating children and taking the median of per-pair
        # efficiencies cancels the drift; all raw runs are reported.
        pairs = int(os.environ.get("GRAFT_SCALING_PAIRS", "3"))
        runs_lo, runs_hi, effs, loadavgs = [], [], [], []
        r_lo = r_hi = None
        for _ in range(pairs):
            # host 1-min load BEFORE each pair: external load >~6 on this
            # shared VM demonstrably corrupts the comparison (BASELINE.md);
            # carrying it in the JSON lets a reader judge each pair
            loadavgs.append(round(os.getloadavg()[0], 1))
            r_lo = _run_child(lo, bench_path)
            r_hi = _run_child(hi, bench_path)
            runs_lo.extend(r_lo["runs"])
            runs_hi.extend(r_hi["runs"])
            effs.append((r_lo["value"] / r_hi["value"]) / (hi / lo))
        sec_lo = statistics.median(runs_lo)
        sec_hi = statistics.median(runs_hi)
        eff_median = statistics.median(effs)
        eff_min = (min(runs_lo) / min(runs_hi)) / (hi / lo)
        print(
            json.dumps(
                {
                    "metric": "kg_triples_scaling",
                    "num_cpus_lo": lo,
                    "num_cpus_hi": hi,
                    "sec_lo": round(sec_lo, 3),
                    "sec_hi": round(sec_hi, 3),
                    "runs_lo": runs_lo,
                    "runs_hi": runs_hi,
                    "pair_efficiencies": [round(e, 3) for e in effs],
                    "triples_per_sec_lo": round(r_lo["triples"] / sec_lo, 1),
                    "triples_per_sec_hi": round(r_hi["triples"] / sec_hi, 1),
                    "scaling_efficiency": round(eff_median, 3),
                    "scaling_efficiency_steady_state": round(eff_min, 3),
                    "n_convs": n_convs,
                    "triples": r_hi["triples"],
                    "loadavg_before_pairs": loadavgs,
                }
            )
        )
        return
    print(json.dumps(_run_bench()))


if __name__ == "__main__":
    main()
