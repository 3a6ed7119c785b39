"""Canonicalization / entity linking: mentions -> nodes (+ linked mentions).

New capability required by the north rule (no reference analog; the
lowercase-normalization precedent is the reference's dictionary fit,
``rule_based_ner/dict_ner.py:72``). Three-phase shape, sized for 100 TB:

1. **Distributed distinct+count** — a batch-local ``pyarrow`` group-count of
   ``(ent_type, normalized surface)`` (combiner) followed by one hash-shuffle
   ``groupby().sum()``. Pre-aggregation IS the skew handling: a hot surface
   ("aspirin" in every document) leaves each input block as a single
   pre-counted row, so the shuffle moves at most one row per surface per
   block — no hot-key straggler. The result is *vocabulary-sized*
   (distinct surfaces), orders of magnitude smaller than the corpus.
2. **Union-find closure on the distinct-surface table** — alias edges come
   from (a) deterministic variant rules (parenthetical-qualifier strip,
   punctuation unification) and (b) an explicit alias table
   (:data:`ALIAS_GROUPS`, broadcast once). Because the table is
   vocabulary-sized it is pulled to the driver (`small-side broadcast`
   pattern, ray_guide "Joins and lookups") and closed with a classic
   union-find — O(V α(V)) over ~10^6-10^7 surfaces even at 100 TB scale.
   The resulting surface->node_id map is ``ray.put`` once.
3. **Link-back** — a stateless ``map_batches`` over mentions attaches
   ``node_id`` by dict lookup against the broadcast map (never re-shipped
   per batch: resolved once per task from the object store).
"""

from __future__ import annotations

import re
from typing import Dict, List, Tuple

import pyarrow as pa

import ray
import ray.data
from ray.data.aggregate import Sum

from ..schemas import NODES, validate

# Explicit alias groups (surface forms that canonicalize together even when
# normalization differs). Engine-level config, deterministic.
ALIAS_GROUPS: List[List[str]] = [
    ["by mouth", "orally", "oral"],
    ["tylenol+codeine", "acetaminophen with codeine"],
    ["vitamin d (oral)", "vitamin d"],
]

_WS_RE = re.compile(r"\s+")
_PAREN_RE = re.compile(r"\s*\([^)]*\)\s*$")


def normalize(surface: str) -> str:
    """lowercase + strip + collapse whitespace (dict_ner.py:72 precedent)."""
    return _WS_RE.sub(" ", surface.strip().lower())


def variant_key(norm: str) -> str:
    """Deterministic single-hop variant: drop a trailing parenthetical."""
    return _PAREN_RE.sub("", norm) or norm


def _local_counts(batch: pa.Table) -> pa.Table:
    norm = pa.array([normalize(s) for s in batch["text"].to_pylist()], pa.string())
    t = pa.table({"ent_type": batch["ent_type"], "norm": norm})
    counted = t.group_by(["ent_type", "norm"], use_threads=False).aggregate(
        [([], "count_all")]
    )
    return counted.rename_columns(["ent_type", "norm", "n"])


class _UnionFind:
    def __init__(self):
        self.parent: Dict[str, str] = {}

    def find(self, x: str) -> str:
        root = x
        while self.parent.setdefault(root, root) != root:
            root = self.parent[root]
        while self.parent[x] != root:  # path compression
            self.parent[x], x = root, self.parent[x]
        return root

    def union(self, a: str, b: str) -> None:
        ra, rb = self.find(a), self.find(b)
        if ra != rb:
            # deterministic representative: lexicographic min
            lo, hi = sorted((ra, rb))
            self.parent[hi] = lo


def build_nodes(
    mentions: "ray.data.Dataset",
) -> Tuple["ray.data.Dataset", "ray.ObjectRef"]:
    """mentions Dataset -> (nodes Dataset, ObjectRef of surface->node_id map).

    The map key is ``(ent_type, normalized_surface)``; clustering is scoped
    per entity type (a Drug "cream" and a Form "cream" stay distinct nodes).
    """
    surface_stats = (
        mentions.map_batches(_local_counts, batch_format="pyarrow")
        .groupby(["ent_type", "norm"])
        .aggregate(Sum("n", alias_name="n_mentions"))
    )
    # Ray groupby may emit zero-row blocks whose schema is empty/degenerate;
    # concat only the non-empty ones (regression: CORRECTNESS_r01 kg_nodes).
    tables = [t for t in ray.get(surface_stats.to_arrow_refs()) if t.num_rows]
    if tables:
        small = pa.concat_tables(tables).combine_chunks()
    else:
        small = pa.table(
            {
                "ent_type": pa.array([], pa.string()),
                "norm": pa.array([], pa.string()),
                "n_mentions": pa.array([], pa.int64()),
            }
        )

    uf = _UnionFind()
    keys = list(
        zip(small["ent_type"].to_pylist(), small["norm"].to_pylist())
    )
    counts = small["n_mentions"].to_pylist()
    present = set(keys)
    for ent_type, norm in keys:
        vk = variant_key(norm)
        if vk != norm and (ent_type, vk) in present:
            uf.union(f"{ent_type}\x00{norm}", f"{ent_type}\x00{vk}")
    alias_norm = [[normalize(s) for s in grp] for grp in ALIAS_GROUPS]
    for grp in alias_norm:
        for ent_type in {k[0] for k in keys}:
            members = [g for g in grp if (ent_type, g) in present]
            for a, b in zip(members, members[1:]):
                uf.union(f"{ent_type}\x00{a}", f"{ent_type}\x00{b}")

    clusters: Dict[str, List[int]] = {}
    for i, (ent_type, norm) in enumerate(keys):
        root = uf.find(f"{ent_type}\x00{norm}")
        clusters.setdefault(root, []).append(i)

    node_rows = {k: [] for k in NODES.names}
    surface_to_node: Dict[Tuple[str, str], str] = {}
    for root, idxs in sorted(clusters.items()):
        ent_type = keys[idxs[0]][0]
        # canonical surface: most-mentioned member, ties -> lexicographic
        best = min(idxs, key=lambda i: (-counts[i], keys[i][1]))
        canonical = keys[best][1]
        node_id = f"N:{ent_type}:{canonical}"
        node_rows["node_id"].append(node_id)
        node_rows["ent_type"].append(ent_type)
        node_rows["canonical_text"].append(canonical)
        node_rows["n_aliases"].append(len(idxs))
        node_rows["n_mentions"].append(sum(counts[i] for i in idxs))
        for i in idxs:
            surface_to_node[keys[i]] = node_id

    nodes_table = pa.Table.from_arrays(
        [pa.array(node_rows[f.name], f.type) for f in NODES], schema=NODES
    )
    return ray.data.from_arrow(nodes_table), ray.put(surface_to_node)


def link_mentions(
    mentions: "ray.data.Dataset", surface_map_ref: "ray.ObjectRef"
) -> "ray.data.Dataset":
    """Attach ``node_id`` to every mention (broadcast dict lookup)."""

    def attach(batch: pa.Table) -> pa.Table:
        from ..functions.broadcast import bget

        mapping = bget(surface_map_ref)  # one deserialize per process
        node_ids = [
            mapping.get((t, normalize(s)), "")
            for t, s in zip(
                batch["ent_type"].to_pylist(), batch["text"].to_pylist()
            )
        ]
        return batch.append_column("node_id", pa.array(node_ids, pa.string()))

    return mentions.map_batches(attach, batch_format="pyarrow")


def charset_jaccard(a: str, b: str) -> float:
    """Character-SET Jaccard (DuckDB ``jaccard()`` definition — the
    SQL-checkable similarity; the serial oracle mirrors it exactly)."""
    sa, sb = set(a), set(b)
    if not sa and not sb:
        return 0.0
    return len(sa & sb) / len(sa | sb)


class ScoredLinker:
    """Actor-pool entity-link scorer (north-rule: model actors for
    'entity-link scoring'): exact normalized lookup first; misses fall
    back to the best same-type candidate by character-set Jaccard above
    ``threshold``. The per-type candidate index (vocabulary-sized) is
    built ONCE per actor in ``__init__`` from the broadcast surface map —
    never per batch. Determinism: ties break on (score desc, node_id,
    surface) lexicographically."""

    def __init__(self, surface_map_ref, threshold: float = 0.5):
        mapping = ray.get(surface_map_ref)
        self.exact: Dict[Tuple[str, str], str] = mapping
        by_type: Dict[str, List[Tuple[str, str, frozenset]]] = {}
        for (t, norm), nid in sorted(mapping.items()):
            by_type.setdefault(t, []).append((norm, nid, frozenset(norm)))
        self.by_type = by_type
        self.threshold = threshold

    def _fuzzy(self, ent_type: str, norm: str) -> Tuple[str, float]:
        cands = self.by_type.get(ent_type)
        if not cands:
            return "", 0.0
        sn = set(norm)
        best_id, best_s = "", 0.0
        # candidates iterate in sorted (norm) order; strict > means the
        # lexicographically first surface wins score ties — deterministic
        for cnorm, nid, cset in cands:
            inter = len(sn & cset)
            union = len(sn | cset)
            s = inter / union if union else 0.0
            if s > best_s:
                best_id, best_s = nid, s
        if best_s >= self.threshold:
            return best_id, best_s
        return "", best_s

    def __call__(self, batch: pa.Table) -> pa.Table:
        node_ids, scores, methods = [], [], []
        for t, s in zip(
            batch["ent_type"].to_pylist(), batch["text"].to_pylist()
        ):
            norm = normalize(s)
            nid = self.exact.get((t, norm))
            if nid is not None:
                node_ids.append(nid)
                scores.append(1.0)
                methods.append("exact")
                continue
            nid, score = self._fuzzy(t, norm)
            node_ids.append(nid)
            scores.append(score)
            methods.append("fuzzy" if nid else "none")
        return (
            batch.append_column("node_id", pa.array(node_ids, pa.string()))
            .append_column("link_score", pa.array(scores, pa.float64()))
            .append_column("link_method", pa.array(methods, pa.string()))
        )


def link_mentions_scored(
    mentions: "ray.data.Dataset",
    surface_map_ref: "ray.ObjectRef",
    threshold: float = 0.5,
    concurrency=(1, 4),
) -> "ray.data.Dataset":
    """Scored entity linking as an actor-pool stage (state in ctor)."""
    return mentions.map_batches(
        ScoredLinker,
        fn_constructor_kwargs={
            "surface_map_ref": surface_map_ref,
            "threshold": threshold,
        },
        batch_format="pyarrow",
        concurrency=concurrency,
        num_cpus=1,
    )
