"""SPARQL-style basic-graph-pattern (BGP) matching over the triple table.

The reference materializes per-note relation tables and NetworkX figures
(reference ehr.py:538-618 get_relations / graph drawing) but has no query
surface over the corpus-level graph. The primary read workload of a
materialized KG is the conjunctive triple-pattern query ("?drug -ADE->
?ae AND ?drug -Form-> 'tablet'"), so this stage implements the standard
left-deep hash-join BGP evaluator over the distributed edge set, with
SELECT DISTINCT semantics.

Scale shape (what survives 10^12 turns):

- The graph is first reduced to DISTINCT (subj, pred, obj) edges with a
  batch-local distinct combiner followed by ONE (subj, pred)-keyed
  partition pass — duplicate occurrences never reach a join.
- Each triple pattern becomes a vectorized Arrow filter over the edge
  set (constants -> ``pc.equal`` masks; in a cold read these are
  parquet predicate pushdowns) projected to its variable columns only.
- Join order is chosen greedily: start from the most-constant (most
  selective) pattern, then repeatedly attach a pattern sharing at least
  one already-bound variable, preferring more constants. This is the
  classic heuristic stand-in for cardinality-based ordering; at scale
  the pred-cardinality statistics (queries.kg_pred_cardinality) would
  drive the same choice. Disconnected patterns (a cartesian product)
  are rejected rather than silently exploding.
- Every join is a key-partitioned hash shuffle on ALL shared variables
  (stages/joins.hash_join — partition count clamped to the cluster, hub
  values hash-spread), so no step ever holds more than one partition of
  bindings in memory.
- The final SELECT DISTINCT is one more key-partitioned pass
  (functions/partitioning.groupby_partition), size-aware because the
  binding set is already candidate-bounded.
"""

from __future__ import annotations

from typing import Sequence, Tuple

import pyarrow as pa
import pyarrow.compute as pc

import ray.data

from ..functions.partitioning import groupby_partition
from . import joins

Pattern = Tuple[str, str, str]

_COLS = ("subj", "pred", "obj")


def _is_var(term: str) -> bool:
    return term.startswith("?")


def distinct_edges(triples: "ray.data.Dataset") -> "ray.data.Dataset":
    """DISTINCT (subj, pred, obj) of the occurrence-level triple table.

    Batch-local distinct thins duplicates before the (subj, pred)-keyed
    exchange; the partition pass is exact because the key never splits a
    (subj, pred, obj) group across partitions.
    """
    key = ["subj", "pred", "obj"]

    def local(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return t.select(key)
        return t.select(key).group_by(key, use_threads=False).aggregate([])

    return groupby_partition(
        triples.map_batches(local, batch_format="pyarrow"),
        ["subj", "pred"],
        lambda t: t.group_by(key, use_threads=False).aggregate([]),
        size_aware=True,
    )


def _pattern_vars(pat: Pattern) -> list[str]:
    out = []
    for term in pat:
        if _is_var(term) and term[1:] not in out:
            out.append(term[1:])
    return out


def _match_pattern(
    edges: "ray.data.Dataset", pat: Pattern
) -> "ray.data.Dataset":
    """One triple pattern -> Dataset of its variable bindings.

    Constants become a fused Arrow mask; a repeated variable inside one
    pattern (e.g. ``(?x, pred, ?x)``) becomes a column-equality mask.
    Output columns are the variable names; batch-local distinct thins
    the projection (global distinct happens once, at the end).
    """
    consts = [(c, t) for t, c in zip(pat, _COLS) if not _is_var(t)]
    var_cols: dict[str, list[str]] = {}
    for term, col in zip(pat, _COLS):
        if _is_var(term):
            var_cols.setdefault(term[1:], []).append(col)
    out_names = list(var_cols)

    def sel(t: pa.Table) -> pa.Table:
        mask = None
        for col, val in consts:
            m = pc.equal(t[col], pa.scalar(val, pa.string()))
            mask = m if mask is None else pc.and_(mask, m)
        for cols in var_cols.values():
            for extra in cols[1:]:
                m = pc.equal(t[cols[0]], t[extra])
                mask = m if mask is None else pc.and_(mask, m)
        if mask is not None:
            t = t.filter(mask)
        proj = pa.table({v: t[cols[0]] for v, cols in var_cols.items()})
        if proj.num_rows == 0:
            return proj
        return proj.group_by(out_names, use_threads=False).aggregate([])

    return edges.map_batches(sel, batch_format="pyarrow")


def _order_patterns(patterns: Sequence[Pattern]) -> list[Pattern]:
    """Greedy connected ordering: most constants first, then any pattern
    sharing a bound variable (more constants preferred, original order
    as the tiebreak). Raises on a disconnected (cartesian) pattern set."""

    def n_consts(p: Pattern) -> int:
        return sum(0 if _is_var(t) else 1 for t in p)

    remaining = list(range(len(patterns)))
    start = max(remaining, key=lambda i: (n_consts(patterns[i]), -i))
    order = [start]
    remaining.remove(start)
    bound = set(_pattern_vars(patterns[start]))
    while remaining:
        candidates = [
            i for i in remaining if bound & set(_pattern_vars(patterns[i]))
        ]
        if not candidates:
            raise ValueError(
                "disconnected BGP: patterns "
                f"{[patterns[i] for i in remaining]} share no variable with "
                f"the bound set {sorted(bound)} — a cartesian product; "
                "split the query instead"
            )
        nxt = max(candidates, key=lambda i: (n_consts(patterns[i]), -i))
        order.append(nxt)
        remaining.remove(nxt)
        bound |= set(_pattern_vars(patterns[nxt]))
    return [patterns[i] for i in order]


def bgp_match(
    triples: "ray.data.Dataset",
    patterns: Sequence[Pattern],
    dedupe_input: bool = True,
) -> "ray.data.Dataset":
    """Evaluate a conjunctive triple-pattern query; DISTINCT bindings.

    ``patterns`` is a list of (s, p, o) terms; ``?name`` marks a
    variable, anything else is a string constant. Returns a Dataset
    whose columns are the variable names in first-mention order of the
    ORIGINAL pattern list. ``dedupe_input=False`` skips the edge
    distinct when the caller already holds a deduplicated edge set.
    """
    if not patterns:
        raise ValueError("empty BGP")
    for pat in patterns:
        if len(pat) != 3:
            raise ValueError(f"pattern must be a (s, p, o) triple: {pat!r}")
    out_vars: list[str] = []
    for pat in patterns:
        for v in _pattern_vars(pat):
            if v not in out_vars:
                out_vars.append(v)
    if not out_vars:
        raise ValueError("BGP binds no variables")

    edges = distinct_edges(triples) if dedupe_input else triples
    ordered = _order_patterns(patterns)

    out_schema = pa.schema([(v, pa.string()) for v in out_vars])

    def empty() -> "ray.data.Dataset":
        return ray.data.from_arrow(out_schema.empty_table())

    # Each pattern match is a candidate-bounded projection of the
    # already-materialized edge set — materializing it here is one cheap
    # scan, makes count() a metadata read, and lets us short-circuit a
    # globally-empty side (which empties the whole conjunction) before
    # the native hash join sees it: Ray's join aggregator builds empty
    # partitions schema-less and acero then rejects the key reference
    # (same failure class joins.hash_join retries on, but a globally
    # empty side fails even at one partition).
    cur = _match_pattern(edges, ordered[0]).materialize()
    if cur.count() == 0:
        return empty()
    bound = set(_pattern_vars(ordered[0]))
    for pat in ordered[1:]:
        nxt = _match_pattern(edges, pat).materialize()
        if nxt.count() == 0:
            return empty()
        shared = sorted(bound & set(_pattern_vars(pat)))
        cur = joins.hash_join(cur, nxt, on=shared)
        if cur.count() == 0:
            return empty()
        bound |= set(_pattern_vars(pat))

    def reorder(t: pa.Table) -> pa.Table:
        return t.select(out_vars)
    return groupby_partition(
        cur.map_batches(reorder, batch_format="pyarrow"),
        out_vars[0],
        lambda t: t.group_by(out_vars, use_threads=False).aggregate([]),
        schema=out_schema,
        size_aware=True,
    )
