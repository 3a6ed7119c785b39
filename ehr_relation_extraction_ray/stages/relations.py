"""Relation scoring: candidates -> edges -> triples (+ exact dedup).

* Scoring mirrors ``get_re_predictions`` (``predict.py:355-388``): score
  every masked candidate, keep ``pred == 1``. The scorer is
  constructor-injected (surrogate rule or BioBERT actor, SURVEY.md A3).
* Edge ids: the reference renumbers kept relations ``R%d`` sequentially per
  document (``predict.py:379-385``) — an order-dependent, presentation-only
  id. The engine instead derives ``rel_id = "R" + cand_idx`` from the
  candidate's content-stable per-document index so output is identical at
  any parallelism (SURVEY.md M19); triples never carry the id.
* Triples: ``get_long_relation_table`` projection (``utils.py:497-530``) —
  subj is always the Drug side (``utils.py:517-526``; candidates already
  normalize this at generation, ``utils.py:465-470``), ``pred`` is the
  relation type's entity prefix (``utils.py:527``).
* Exact dedup == long-table ``drop_duplicates`` (``utils.py:553``): a
  batch-local Arrow distinct (combiner) followed by one hash-shuffle
  ``groupby`` over the already-thinned rows — the pre-aggregate pattern, so
  the all-to-all exchange moves distinct keys, not raw rows.
"""

from __future__ import annotations

from typing import Callable, Optional

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

import ray.data

from ..functions.rescore import SurrogateScorer
from ..schemas import EDGES, TRIPLES, validate

TRIPLE_KEY = ["doc_id", "subj_id", "subj", "pred", "obj"]


class RelationScorer:
    """Actor-pool callable: candidates batch -> edges rows (pred==1)."""

    def __init__(self, scorer_factory: Optional[Callable] = None):
        self.scorer = (scorer_factory or SurrogateScorer)()
        self._surrogate_fast = scorer_factory is None

    def _surrogate_preds(self, batch: pa.Table) -> np.ndarray:
        """Surrogate scoring over the precomputed fast-path columns.

        Preferred: ``gap_len``/``gap_clean`` ints (functions/pairs.py) —
        a pure numpy compare, zero string traffic. Legacy candidates
        without those columns score the ``gap_text`` substring with Arrow
        kernels. Fallback rows (no fast-path proof: overlap or stray
        marker) take the exact regex scorer on ``masked_text``. Provably
        identical output to running ``SurrogateScorer`` on every masked
        text."""
        if "gap_len" in batch.column_names:
            col = batch["gap_len"].combine_chunks()
            # fill_null(-1): a null gap_len (externally-built candidates —
            # the schema field is nullable) must take the exact-scorer
            # fallback, not become NaN (which fails BOTH the keep predicate
            # and the gl < 0 fallback test, silently dropping the row)
            gl = pc.fill_null(col, -1).to_numpy(zero_copy_only=False)
            clean = (
                pc.fill_null(batch["gap_clean"].combine_chunks(), False)
                .to_numpy(zero_copy_only=False)
            )
            preds = ((gl >= 0) & (gl <= self.scorer.max_gap) & clean).astype(
                np.int8
            )
            fallback = np.nonzero(gl < 0)[0]
        else:
            gap = batch["gap_text"]
            if isinstance(gap, pa.ChunkedArray):
                gap = gap.combine_chunks()
            filled = pc.fill_null(gap, "")
            ok = pc.and_(
                pc.less_equal(pc.utf8_length(filled), self.scorer.max_gap),
                pc.invert(pc.match_substring(filled, "  ")),
            )
            preds = np.asarray(
                pc.and_(ok, pc.is_valid(gap)).to_numpy(zero_copy_only=False)
            ).astype(np.int8)
            fallback = np.nonzero(np.asarray(pc.is_null(gap)))[0]
        if len(fallback):
            texts = batch["masked_text"].take(pa.array(fallback)).to_pylist()
            preds[fallback] = self.scorer(texts)
        return preds

    def __call__(self, batch: pa.Table) -> pa.Table:
        if self._surrogate_fast and (
            "gap_len" in batch.column_names or "gap_text" in batch.column_names
        ):
            preds = self._surrogate_preds(batch)
        else:
            preds = self.scorer(batch["masked_text"].to_pylist())
        kept = batch.filter(pa.array(np.asarray(preds) == 1))
        rel_ids = pc.binary_join_element_wise(
            "R", pc.cast(kept["cand_idx"], pa.string()), ""
        )
        out = pa.table(
            {
                "doc_id": kept["doc_id"],
                "rel_id": rel_ids,
                "rel_type": kept["rel_type"],
                "subj_id": kept["subj_id"],
                "subj_text": kept["subj_text"],
                "obj_id": kept["obj_id"],
                "obj_text": kept["obj_text"],
            }
        )
        return validate(out, EDGES, "edges")


_DEFAULT_SCORER: Optional[RelationScorer] = None


def _default_scorer_batch(batch: pa.Table) -> pa.Table:
    # Stateless-task path, per-process cached state (see candidates.py).
    global _DEFAULT_SCORER
    if _DEFAULT_SCORER is None:
        _DEFAULT_SCORER = RelationScorer()
    return _DEFAULT_SCORER(batch)


def score(
    candidates: "ray.data.Dataset",
    scorer_factory: Optional[Callable] = None,
    concurrency: Optional[int] = None,
    batch_size: int = 512,
) -> "ray.data.Dataset":
    """candidates Dataset -> edges Dataset (EDGES schema).

    Default surrogate scorer runs as stateless tasks; a model-backed
    ``scorer_factory`` (e.g. HFScorer, heavy ``__init__``) gets an actor
    pool — size ``concurrency`` to leave CPUs for the shuffle stages.
    """
    if scorer_factory is None and concurrency is None:
        return candidates.map_batches(
            _default_scorer_batch,
            batch_format="pyarrow",
            batch_size=batch_size,
        )
    return candidates.map_batches(
        RelationScorer,
        fn_constructor_kwargs={"scorer_factory": scorer_factory},
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency or 4,
        num_cpus=1,
    )


def triples_batch(batch: pa.Table) -> pa.Table:
    """edges batch -> TRIPLES rows (utils.py:497-530 projection)."""
    pred = pc.list_element(pc.split_pattern(batch["rel_type"], "-"), 0)
    out = pa.table(
        {
            "doc_id": batch["doc_id"],
            "subj_id": batch["subj_id"],
            "subj": batch["subj_text"],
            "pred": pred,
            "obj": batch["obj_text"],
        }
    )
    return validate(out, TRIPLES, "triples")


def triples(edges: "ray.data.Dataset") -> "ray.data.Dataset":
    return edges.map_batches(triples_batch, batch_format="pyarrow", batch_size=512)


def _local_distinct(batch: pa.Table) -> pa.Table:
    if batch.num_rows == 0:
        return batch
    return batch.group_by(TRIPLE_KEY, use_threads=False).aggregate([])


def _add_partition_col(batch: pa.Table, num_partitions: int) -> pa.Table:
    """Partition routing column for the global dedup shuffle.

    The triple key CONTAINS ``doc_id``, so hashing ``doc_id`` alone routes
    every potential duplicate to the same partition — one vectorized
    import-free hash (the former polars kernel's partial-import race
    could split one doc's rows across engines, i.e. across partitions,
    breaking the co-location the dedup relies on)."""
    from ..functions.textstats import vec_string_hash_64

    h = vec_string_hash_64(batch["doc_id"].to_pylist())
    part = (h % np.uint64(num_partitions)).astype(np.int32)
    return batch.append_column("_part", pa.array(part))


def _partition_distinct(group: pa.Table) -> pa.Table:
    return (
        group.group_by(TRIPLE_KEY, use_threads=False)
        .aggregate([])
        .select(TRIPLE_KEY)
    )


def distinct_triples(trip: "ray.data.Dataset") -> "ray.data.Dataset":
    """Exact triple dedup (utils.py:553) with NO shuffle.

    Partitioning assumption (SURVEY.md §2 custom-operator rule): the input
    must be *document-complete per task* — all rows of a ``doc_id`` inside
    one upstream task's output. The KG pipeline guarantees this by
    construction: conversation assembly sort-partitions by ``conv_id`` key
    ranges (a key is never split across sort partitions) and every later
    stage is a per-row/per-doc map, so blocks stay doc-complete. Because
    the triple key contains ``doc_id``, duplicates can only be doc-local,
    and a whole-task Arrow distinct (``batch_size=None`` receives the full
    task input as one batch) is globally exact — verified against the
    shuffle path in tests.

    For inputs WITHOUT that guarantee use :func:`distinct_triples_global`.
    """
    return trip.map_batches(
        _local_distinct, batch_format="pyarrow", batch_size=None
    )


def distinct_triples_global(
    trip: "ray.data.Dataset", num_partitions: int = 64
) -> "ray.data.Dataset":
    """Exact triple dedup for arbitrarily-partitioned input: explicit hash
    partition + per-partition vectorized distinct.

    Shape: batch-local Arrow distinct (combiner — thins duplicates before
    any data moves) -> append ``_part = hash(doc_id) % P`` (vectorized) ->
    ``groupby(_part)`` so the shuffle orders ONE int32 column instead of
    five string columns -> one vectorized ``pyarrow.group_by`` distinct per
    partition (P Python calls total, not one per distinct key). Exact — the
    full composite key is compared inside each partition; the hash only
    routes. ``num_partitions`` should scale with the cluster (~2-4x cores).
    """
    thinned = trip.map_batches(_local_distinct, batch_format="pyarrow", batch_size=512)
    parted = thinned.map_batches(
        lambda t: _add_partition_col(t, num_partitions),
        batch_format="pyarrow",
        batch_size=512,
    )
    return parted.groupby("_part").map_groups(
        _partition_distinct, batch_format="pyarrow"
    )
