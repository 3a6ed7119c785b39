"""Flagship pipeline: transcripts -> knowledge-graph triples/nodes/edges.

The Ray-Data re-expression of the reference's ``POST /`` inference cascade
(``fast_api.py:29-56``: get_ner_predictions -> get_re_predictions ->
get_long_relation_table), streamed over Arrow blocks:

    read_parquet(transcripts)                    [column-pruned scan]
      -> groupby(conv_id) assembly               [the one required shuffle]
      -> map_batches(CandidateGenerator, actors) [NER + window + pair + mask]
      -> map_batches(RelationScorer, actors)     [RE scoring, keep pred==1]
      -> map_batches(triples projection)
      -> local distinct + groupby dedup          [exact triple dedup]

Every arrow is a streaming stage with backpressure; nothing materializes
the corpus. ``run`` returns the deduped triples Dataset; ``materialize_graph``
additionally writes partitioned nodes/edges Parquet.
"""

from __future__ import annotations

from typing import Callable, Optional

import ray.data

from ..stages import assembly, candidates, canonicalize, relations


def documents(sf_transcripts_path: str) -> "ray.data.Dataset":
    """transcripts (file or conversation-partitioned dir) -> documents.

    A directory input is the partitioned layout (a conversation never
    spans files — synth writes it that way, as conversation-log writers
    do at scale), so assembly takes the shuffle-free per-file path;
    single-file input pays the one sort exchange."""
    import os

    if os.path.isdir(sf_transcripts_path):
        return assembly.assemble_partitioned(sf_transcripts_path)
    return assembly.assemble(assembly.read_transcripts(sf_transcripts_path))


def run_partitioned(
    transcripts_dir: str,
    scorer_factory: Optional[Callable] = None,
) -> "ray.data.Dataset":
    """Shuffle-free flagship pipeline for conversation-partitioned input
    (every conversation wholly inside one parquet file — see
    ``assembly.assemble_partitioned``). The whole job is a single fused
    map chain over file tasks: read+local-sort+assemble -> candidates ->
    score -> triples -> doc-local distinct. ``batch_size=None`` throughout
    keeps each file's documents together in one batch, which the
    shuffle-free distinct requires.
    """
    docs = assembly.assemble_partitioned(transcripts_dir)
    # surrogate scorer reads gap_text; skip the masked-string concat on
    # fast-path rows (the stage's dominant memory-bandwidth cost)
    cands = candidates.generate(
        docs, batch_size=None, emit_masked=scorer_factory is not None
    )
    edges = relations.score(cands, scorer_factory=scorer_factory, batch_size=None)
    trip = edges.map_batches(
        relations.triples_batch, batch_format="pyarrow", batch_size=None
    )
    return relations.distinct_triples(trip)


def run(
    transcripts_path: str,
    scorer_factory: Optional[Callable] = None,
    concurrency: "Optional[int]" = None,
    dedup: bool = True,
) -> "ray.data.Dataset":
    """transcripts parquet -> deduped triples Dataset (TRIPLES schema).

    Directory input (conversation-partitioned layout) routes to
    :func:`run_partitioned`: the per-file fused chain must keep
    ``batch_size=None`` — a row-count batch size in a chain fused onto the
    path-table source would bundle tasks in UPSTREAM PATH ROWS and collapse
    the whole job into one task (the min_rows_per_bundled_input gotcha).
    Explicit ``concurrency``/``dedup=False`` callers keep the generic
    chain over the (sorted) single-stream assembly."""
    import os

    if os.path.isdir(transcripts_path) and concurrency is None and dedup:
        return run_partitioned(transcripts_path, scorer_factory=scorer_factory)
    docs = documents(transcripts_path)
    cands = candidates.generate(
        docs, concurrency=concurrency, emit_masked=scorer_factory is not None
    )
    edges = relations.score(cands, scorer_factory=scorer_factory, concurrency=concurrency)
    trip = relations.triples(edges)
    return relations.distinct_triples(trip) if dedup else trip


def run_checkpointed(
    transcripts_path: str,
    checkpoint_dir: str,
    scorer_factory: Optional[Callable] = None,
    concurrency: "Optional[int]" = None,
) -> "ray.data.Dataset":
    """Flagship pipeline with mid-pipeline resume (north rule): every stage
    is a :class:`state.checkpoint.CheckpointedPipeline` stage writing
    partitioned Parquet + a manifest; a rerun after a crash skips every
    completed stage (a killed job resumes from the last finished stage,
    never from the start).

    The post-checkpoint dedup uses :func:`relations.distinct_triples_global`
    (explicit hash partition): reloading a checkpoint from Parquet does not
    preserve the doc-complete-per-task layout the shuffle-free distinct
    relies on.
    """
    from ..state.checkpoint import CheckpointedPipeline

    cp = CheckpointedPipeline(checkpoint_dir)
    docs = cp.stage(
        "documents",
        lambda: documents(transcripts_path),
        params=transcripts_path,
    )
    cands = cp.stage(
        "candidates",
        lambda: candidates.generate(docs, concurrency=concurrency),
        upstream=["documents"],
    )
    edges = cp.stage(
        "edges",
        lambda: relations.score(
            cands, scorer_factory=scorer_factory, concurrency=concurrency
        ),
        upstream=["candidates"],
        params="" if scorer_factory is None else repr(scorer_factory),
    )
    trip = cp.stage(
        "triples",
        lambda: relations.distinct_triples_global(relations.triples(edges)),
        upstream=["edges"],
    )
    cp.flush_lineage()
    return trip


def materialize_graph(
    transcripts_path: str,
    out_dir: str,
    scorer_factory: Optional[Callable] = None,
    concurrency: "Optional[int]" = None,
    checkpoint_dir: Optional[str] = None,
) -> dict:
    """Full graph materialization to partitioned Parquet (SURVEY.md S14
    analog): ``{out}/triples/``, ``{out}/nodes/``, ``{out}/mentions/``.

    Resumable BY DEFAULT (north rule): the extraction chain runs through
    :func:`run_checkpointed` (checkpoints under ``{out}/_checkpoints``
    unless overridden), so a rerun after a crash recomputes only the
    unfinished stages; the writer emits one file per block, so outputs are
    partitioned, never one giant file.
    """
    from ..stages import mentions as mentions_stage
    from ..state.checkpoint import CheckpointedPipeline

    cp_dir = checkpoint_dir or f"{out_dir}/_checkpoints"
    trip = run_checkpointed(
        transcripts_path, cp_dir, scorer_factory=scorer_factory,
        concurrency=concurrency,
    )
    trip.write_parquet(f"{out_dir}/triples")

    # mentions for the node table come from the same detector state; the
    # node build itself is vocabulary-sized (cheap to redo on resume)
    cp = CheckpointedPipeline(cp_dir)
    docs = cp.stage(
        "documents", lambda: documents(transcripts_path), params=transcripts_path
    )
    ment = cp.stage(
        "mentions",
        lambda: mentions_stage.detect(docs, concurrency=concurrency),
        upstream=["documents"],
    )
    nodes, surface_map = canonicalize.build_nodes(ment)
    nodes.write_parquet(f"{out_dir}/nodes")
    linked = canonicalize.link_mentions(ment, surface_map)
    linked.write_parquet(f"{out_dir}/mentions")
    cp.flush_lineage()
    return {"out_dir": out_dir, "checkpoint_dir": cp_dir}
