"""Connected-components cluster assignment over near-duplicate pairs.

The missing last step of a real dedup pipeline: near-dup detection (minhash
LSH / simhash / cosine) emits PAIRS, but the keep-one-per-cluster decision
needs the transitive closure — if a~b and b~c, then {a,b,c} is one cluster
even when (a,c) was never emitted.  The reference's serial analogue is the
in-memory union-find used for surface canonicalization
(``stages/canonicalize.py``); this module is the distributed, edge-scale
form for corpus-sized pair sets where the pair list must never be collected
on the driver.

Algorithm: **hash-min label propagation** (the classic BSP/MapReduce
connected-components scheme, e.g. Kang et al. PEGASUS / "CC-MR"):

* state: ``labels(node) = smallest doc_id known to be in node's component``,
  initialised to the node itself; the symmetrized edge list is immutable.
* round: every node sends its current label along its out-edges; each node
  takes the min of everything received (plus its own label).
* stop: when a round changes ZERO labels.  Stability is exact convergence:
  a stable labelling is edge-consistent (``L(u) == L(v)`` for every edge,
  else the smaller would have propagated), hence constant per component,
  and the component's true min node ``a`` keeps ``L(a) <= a`` forever, so
  the constant must be the component minimum.

Rounds needed = component diameter + 1.  Near-dup clusters are small and
dense (quasi-cliques of boilerplate variants), so this terminates in a
handful of rounds; each round is two hash-partition shuffles of
``O(|edges| + |nodes|)`` rows (strings only, never text).  For adversarial
long-path graphs the O(log n) alternative (hash-to-min / star contraction,
Rastogi et al. 2013) can replace the inner loop without changing the API.

Partitioning assumption: rounds co-partition edges and labels by the edge
SOURCE node (one ``groupby_partition`` key), so each partition resolves its
own label lookups locally — no broadcast, no driver state.
"""

from __future__ import annotations

import pandas as pd
import pyarrow as pa

import ray.data
from ray.data.aggregate import Sum

from ..functions.partitioning import groupby_partition

_LABEL_SCHEMA = pa.schema(
    [("doc_id", pa.string()), ("cluster_id", pa.string())]
)
_MSG_SCHEMA = pa.schema(
    [("node", pa.string()), ("cand", pa.string()), ("is_self", pa.int8())]
)
_STEP_SCHEMA = pa.schema(
    [("node", pa.string()), ("label", pa.string()), ("changed", pa.int64())]
)
_SIZED_SCHEMA = pa.schema(
    [
        ("doc_id", pa.string()),
        ("cluster_id", pa.string()),
        ("cluster_size", pa.int64()),
    ]
)


def _empty(schema: pa.Schema) -> "ray.data.Dataset":
    return ray.data.from_arrow(schema.empty_table())


def dup_clusters(
    pairs: "ray.data.Dataset",
    id_a: str = "doc_a",
    id_b: str = "doc_b",
    num_partitions: int = 64,
    max_rounds: int = 64,
    with_sizes: bool = False,
) -> "ray.data.Dataset":
    """(doc_id, cluster_id[, cluster_size]) for every doc in >=1 pair.

    ``cluster_id`` is the lexicographic min doc_id of the connected
    component (matching SQL ``min(varchar)`` so a DuckDB recursive-CTE
    oracle reproduces it exactly).  Docs in no pair are their own trivial
    cluster and are NOT emitted — attach them with a left join /
    ``coalesce(cluster_id, doc_id)`` when a total labelling is needed.
    """
    # tagged union rows: is_self=0 -> edge (node -> cand is the NEIGHBOR id
    # until relabelled), is_self=1 -> the node's current label row.
    def to_edges(t: pa.Table) -> pa.Table:
        a = t[id_a].cast(pa.string())
        b = t[id_b].cast(pa.string())
        node = pa.concat_arrays(
            [c.combine_chunks() for c in (a, b)]
        )
        nbr = pa.concat_arrays([c.combine_chunks() for c in (b, a)])
        n = len(node)
        return pa.table(
            {
                "node": node,
                "cand": nbr,
                "is_self": pa.array([0] * n, pa.int8()),
            }
        )

    edges = pairs.map_batches(to_edges, batch_format="pyarrow")

    def init_labels(df: pd.DataFrame) -> pd.DataFrame:
        nodes = df["node"].drop_duplicates()
        return pd.DataFrame(
            {"node": nodes, "cand": nodes, "is_self": 1}
        ).astype({"is_self": "int8"})

    labels = groupby_partition(
        edges,
        "node",
        init_labels,
        num_partitions=num_partitions,
        batch_format="pandas",
        schema=_MSG_SCHEMA,
    ).materialize()
    if labels.count() == 0:
        return _empty(_SIZED_SCHEMA if with_sizes else _LABEL_SCHEMA)
    edges = edges.materialize()  # reused every round

    def send(df: pd.DataFrame) -> pd.DataFrame:
        # one partition = all edges AND the label row of each source node
        lab = df[df["is_self"] == 1]
        lmap = lab.set_index("node")["cand"]
        e = df[df["is_self"] == 0]
        msgs = pd.DataFrame(
            {
                "node": e["cand"].to_numpy(),  # deliver TO the neighbor
                "cand": e["node"].map(lmap).to_numpy(),
                "is_self": 0,
            }
        )
        keep = pd.DataFrame(
            {"node": lab["node"], "cand": lab["cand"], "is_self": 1}
        )
        return pd.concat([msgs, keep], ignore_index=True).astype(
            {"is_self": "int8"}
        )

    def take_min(df: pd.DataFrame) -> pd.DataFrame:
        new = df.groupby("node", sort=False)["cand"].min()
        old = df[df["is_self"] == 1].set_index("node")["cand"]
        changed = (new < old.reindex(new.index)).astype("int64")
        return pd.DataFrame(
            {
                "node": new.index,
                "label": new.to_numpy(),
                "changed": changed.to_numpy(),
            }
        )

    for _ in range(max_rounds):
        stepped = groupby_partition(
            edges.union(labels),
            "node",
            send,
            num_partitions=num_partitions,
            batch_format="pandas",
            schema=_MSG_SCHEMA,
        )
        stepped = groupby_partition(
            stepped,
            "node",
            take_min,
            num_partitions=num_partitions,
            batch_format="pandas",
            schema=_STEP_SCHEMA,
        ).materialize()
        n_changed = stepped.aggregate(Sum("changed"))["sum(changed)"]
        labels = stepped.map_batches(
            lambda t: pa.table(
                {
                    "node": t["node"],
                    "cand": t["label"],
                    "is_self": pa.array([1] * t.num_rows, pa.int8()),
                }
            ),
            batch_format="pyarrow",
        )
        if n_changed == 0:
            break
    else:
        raise RuntimeError(
            f"dup_clusters: no fixed point after {max_rounds} rounds "
            "(component diameter exceeds max_rounds)"
        )

    out = labels.map_batches(
        lambda t: pa.table(
            {"doc_id": t["node"], "cluster_id": t["cand"]}
        ),
        batch_format="pyarrow",
    )
    if not with_sizes:
        return out

    def attach_size(df: pd.DataFrame) -> pd.DataFrame:
        df = df.copy()
        df["cluster_size"] = (
            df.groupby("cluster_id", sort=False)["doc_id"]
            .transform("size")
            .astype("int64")
        )
        return df

    return groupby_partition(
        out,
        "cluster_id",
        attach_size,
        num_partitions=num_partitions,
        batch_format="pandas",
        schema=_SIZED_SCHEMA,
    )


def keep_canonical(
    docs: "ray.data.Dataset",
    labels: "ray.data.Dataset",
    id_col: str = "doc_id",
    num_partitions: int = 64,
) -> "ray.data.Dataset":
    """Drop every non-canonical near-dup: keep docs whose id is its
    cluster's min (or that appear in no dup pair).  Anti-join shape: only
    the (doc_id,) drop-list shuffles against the corpus ids — never text on
    the driver."""
    drop = labels.filter(
        expr="doc_id != cluster_id"
    ).select_columns(["doc_id"])

    def mark(df: pd.DataFrame) -> pd.DataFrame:
        dropped = set(df.loc[df["_drop"] == 1, id_col])
        keep = df[(df["_drop"] == 0) & (~df[id_col].isin(dropped))]
        return keep.drop(columns=["_drop"])

    tag_docs = docs.map_batches(
        lambda t: t.append_column(
            "_drop", pa.array([0] * t.num_rows, pa.int8())
        ),
        batch_format="pyarrow",
    )
    tag_drop = drop.map_batches(
        lambda t: pa.table(
            {
                id_col: t["doc_id"].cast(pa.string()),
                "_drop": pa.array([1] * t.num_rows, pa.int8()),
            }
        ),
        batch_format="pyarrow",
    )
    # union schemas must line up: project the drop side into the doc schema
    # with nulls for the other columns
    base = pa.schema(
        [(f.name, f.type) for f in _schema_of(docs)] + [("_drop", pa.int8())]
    )

    def widen(t: pa.Table) -> pa.Table:
        cols = {}
        for f in base:
            if f.name in t.column_names:
                cols[f.name] = t[f.name].cast(f.type)
            else:
                cols[f.name] = pa.nulls(t.num_rows, f.type)
        return pa.table(cols)

    merged = tag_docs.map_batches(widen, batch_format="pyarrow").union(
        tag_drop.map_batches(widen, batch_format="pyarrow")
    )
    return groupby_partition(
        merged,
        id_col,
        mark,
        num_partitions=num_partitions,
        batch_format="pandas",
        schema=_schema_of(docs),
    )


def _schema_of(ds: "ray.data.Dataset") -> pa.Schema:
    s = ds.schema()
    base = getattr(s, "base_schema", None)
    if isinstance(base, pa.Schema):
        return base
    fields = []
    for n, t in zip(s.names, s.types):
        if isinstance(t, pa.DataType):
            fields.append((n, t))
        else:
            try:
                fields.append((n, pa.from_numpy_dtype(t)))
            except (pa.ArrowNotImplementedError, TypeError):
                fields.append((n, pa.string()))
    return pa.schema(fields)
