"""Graph views: wide relation table and per-drug adjacency.

* wide table == ``get_relation_table`` (``utils.py:533-581``): dedup the
  long table, group by (Drug ID, Drug, Entity Type), newline-join the
  entity texts (``utils.py:561-569``). The HTML render is a driver-side
  presentation concern; the engine emits the grouped rows.
* ``display_knowledge_graph`` (``utils.py:148-236``) materializes per-drug
  node/edge sets: here that is the partitioned nodes/edges Parquet written
  by pipelines/kg.materialize_graph; PNG rendering is out of engine scope.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

import ray.data

from ..functions.partitioning import groupby_partition


def wide_relation_table(triples: "ray.data.Dataset") -> "ray.data.Dataset":
    """TRIPLES Dataset -> (doc_id, subj_id, subj, pred, args) rows.

    ``args`` is the newline-join of deduped obj texts, matching pandas
    ``groupby...apply(list)`` + ``"\\n".join`` (utils.py:561-569) after
    ``drop_duplicates`` (utils.py:553) — except the join order: the
    reference keeps input row order, which is not stable under parallelism,
    so the engine sorts objs lexicographically (deterministic at any block
    layout, and SQL-expressible for the oracle).
    """

    # group-closed (every agg keys on doc_id) -> one call per hash
    # partition, not one per document (functions/partitioning.py)
    return groupby_partition(
        triples, "doc_id", wide_table_rows, batch_format="pandas"
    )


def wide_table_rows(triples: "pd.DataFrame | pa.Table") -> pd.DataFrame:
    """The wide-table projection itself, on a plain in-memory batch —
    shared by the Dataset operator above (per partition) and the
    single-document serving path (pipelines/serve.py), so the two cannot
    diverge. Vectorized pandas groupby-agg, no Python loop per key."""
    if isinstance(triples, pa.Table):
        triples = triples.to_pandas()
    g = triples.drop_duplicates(
        subset=["doc_id", "subj_id", "subj", "pred", "obj"]
    ).sort_values("obj")
    out = g.groupby(
        ["doc_id", "subj_id", "subj", "pred"], as_index=False, sort=True
    ).agg(args=("obj", "\n".join), n_args=("obj", "size"))
    out["n_args"] = out["n_args"].astype("int64")
    return out


def per_drug_graph(triples: "ray.data.Dataset") -> "ray.data.Dataset":
    """Per-drug adjacency projection (``display_knowledge_graph``,
    utils.py:148-236): one row per (doc_id, subj_id) drug node with its
    edge list — the engine-side data of the reference's per-drug subgraph
    grid (its matplotlib PNG rendering is a driver/presentation concern;
    see :func:`render_drug_graph_html`).

    Columns: doc_id, subj_id, subj, n_nodes (drug + distinct args),
    n_edges, edges ("pred:obj" newline-joined, sorted — deterministic at
    any parallelism and SQL-expressible for the oracle). Same
    ``groupby(doc_id)`` partitioning key as every other graph view.
    """

    def collect(doc_group: pd.DataFrame) -> pd.DataFrame:
        g = doc_group.sort_values(["pred", "obj"])
        out = g.groupby(["doc_id", "subj_id", "subj"], as_index=False, sort=True).agg(
            n_edges=("obj", "size"),
            n_nodes=("obj", "nunique"),
            edges=("pred", lambda s: ""),  # placeholder; filled below
        )
        joined = g.assign(edge=g["pred"] + ":" + g["obj"]).groupby(
            ["doc_id", "subj_id", "subj"], sort=True
        )["edge"].agg("\n".join)
        out["edges"] = joined.to_numpy()
        out["n_nodes"] = (out["n_nodes"] + 1).astype("int64")
        out["n_edges"] = out["n_edges"].astype("int64")
        return out[["doc_id", "subj_id", "subj", "n_nodes", "n_edges", "edges"]]

    return groupby_partition(triples, "doc_id", collect, batch_format="pandas")


# -- driver-side renderers (debug sinks, not part of the data plane) --------

# entity colors (utils.py:24-28)
COLORS = {
    "Drug": "#aa9cfc", "Strength": "#ff9561", "Form": "#7aecec",
    "Frequency": "#9cc9cc", "Route": "#ffeb80", "Dosage": "#bfe1d9",
    "Reason": "#e4e7d2", "ADE": "#ff8197", "Duration": "#97c4f5",
}

_TPL_SPAN = (
    '<span style="background-color:{color};border-radius:5px;'
    'padding:2px">{content}</span>'
)


def render_doc_html(text: str, mentions: "pa.Table") -> str:
    """Span-highlight HTML for one document (display_ehr, utils.py:66-145):
    mentions sorted by start char; a later span overlapping an already-
    rendered one is dropped (utils.py:121-122); newlines -> <br>."""
    rows = sorted(
        zip(
            mentions["start"].to_pylist(),
            mentions["end"].to_pylist(),
            mentions["ent_type"].to_pylist(),
        )
    )
    out = []
    idx = 0
    for s, e, ent_type in rows:
        if idx > s:
            continue  # overlap-drop rule
        out.append(text[idx:s])
        out.append(
            _TPL_SPAN.format(
                content=text[s:e], color=COLORS.get(ent_type, "#dddddd")
            )
        )
        idx = e
    out.append(text[idx:])
    return "".join(out).replace("\n", "<br>")


def render_drug_graph_html(adj: "pd.DataFrame") -> str:
    """Per-drug subgraph grid as plain HTML (display_knowledge_graph,
    utils.py:148-236 — the PNG/networkx rendering is replaced by a
    dependency-free definition list; node colors follow utils.py:204)."""
    blocks = []
    for r in adj.itertuples():
        edges = "".join(
            f"<li><span style='color:red'>{e.split(':', 1)[0]}</span> → "
            f"<span style='background-color:skyblue'>{e.split(':', 1)[1]}</span></li>"
            for e in r.edges.split("\n")
            if e
        )
        blocks.append(
            f"<div class='drug-graph' id='{r.doc_id}:{r.subj_id}'>"
            f"<b style='background-color:{COLORS['Drug']}'>{r.subj}</b>"
            f"<ul>{edges}</ul></div>"
        )
    return "\n".join(blocks)


def render_wide_html(wide: "pd.DataFrame") -> str:
    """Wide relation table -> HTML blob (get_relation_table, utils.py:533-581):
    grouped index (Drug ID, Drug, Entity Type), newline-joined entity texts
    rendered as <br>."""
    df = wide.rename(
        columns={
            "subj_id": "Drug ID",
            "subj": "Drug",
            "pred": "Entity Type",
            "args": "Entity Text",
        }
    )
    df = df.set_index(["Drug ID", "Drug", "Entity Type"])[["Entity Text"]]
    empty_header = (
        '    <tr style="text-align: right;">\n      <th></th>\n'
        "      <th></th>\n      <th></th>\n      <th>Entity Text</th>\n    </tr>\n"
    )
    return (
        df.to_html(classes=["table"], border=0)
        .replace("\\n", "<br>")
        .replace(empty_header, "")
        .replace("<th></th>", "<th>Entity Text</th>")
    )


def edge_weights(triples: "ray.data.Dataset") -> pd.DataFrame:
    """Weighted KG edge list: (subj, obj, n_docs supporting the edge).

    Combiner shape: each corpus-scale triple block reduces to its own
    (subj, obj, count) partial — the distinct edge space is bounded by
    the closed ontology's surface vocabulary (dimension-sized, NOT
    corpus-sized), so the driver merges (edges x blocks) partials
    (playbook driver-partial-merge; a Ray groupby here pays its ~1.2 s
    fixed cost to move rows a pandas sum handles in ms). Edges are
    returned canonically sorted so downstream float iterations are
    order-deterministic."""

    def partial(t: pa.Table) -> pa.Table:
        g = (
            t.select(["subj", "obj", "doc_id"])
            .group_by(["subj", "obj"], use_threads=False)
            .aggregate([("doc_id", "count")])
        )
        return g.rename_columns(["subj", "obj", "n"])

    parts = triples.map_batches(partial, batch_format="pyarrow").to_pandas()
    if parts.empty:  # zero blocks: Ray drops empty outputs, no columns
        return pd.DataFrame(
            {"subj": pd.Series([], dtype=str), "obj": pd.Series([], dtype=str),
             "n": pd.Series([], dtype="int64")}
        )
    out = (
        parts.groupby(["subj", "obj"], as_index=False)["n"].sum()
        .sort_values(["subj", "obj"])
        .reset_index(drop=True)
    )
    out["n"] = out["n"].astype("int64")
    return out


def pagerank(edges: pd.DataFrame, damping: float = 0.85, iters: int = 30) -> pd.DataFrame:
    """Deterministic weighted PageRank on a bounded edge list (driver
    math over the distributed edge-weight aggregate, exactly as k-means
    iterates over combiner-reduced centroids). Dangling mass is
    redistributed uniformly; edges must be canonically sorted so the
    float reduction order is identical between the distributed path and
    the serial fixture oracle."""
    import numpy as np

    nodes = np.unique(np.concatenate([edges["subj"].to_numpy(), edges["obj"].to_numpy()]))
    idx = {n: i for i, n in enumerate(nodes)}
    src = edges["subj"].map(idx).to_numpy(dtype=np.int64)
    dst = edges["obj"].map(idx).to_numpy(dtype=np.int64)
    w = edges["n"].to_numpy(dtype=np.float64)
    n = len(nodes)
    out_w = np.zeros(n)
    np.add.at(out_w, src, w)
    rank = np.full(n, 1.0 / n)
    for _ in range(iters):
        contrib = np.zeros(n)
        np.add.at(contrib, dst, rank[src] * w / out_w[src])
        dangling = rank[out_w == 0].sum()
        rank = (1.0 - damping) / n + damping * (contrib + dangling / n)
    return pd.DataFrame({"node": nodes, "rank": np.round(rank, 6)})


def khop(triples: "ray.data.Dataset", k: int = 3) -> pd.DataFrame:
    """K-hop neighborhood (undirected BFS) from the lexicographically
    smallest subject, over the distributed triple set.

    Scale shape: the edge list NEVER collects on the driver — the triple
    blocks pin ONCE as Arrow object refs (functions/rounds) and each BFS
    round is one raw Ray task per block with the current frontier
    broadcast (``ray.put`` once per round), emitting per-block distinct
    neighbor partials. Only the discovered node set crosses to the
    driver, and that set is bounded by the closed ontology's surface
    vocabulary (dimension-sized), the same justification as
    ``edge_weights``/``pagerank``. Rounds are ``<= k`` sequential passes
    — the classic frontier-broadcast BFS for edge lists too large to
    hold anywhere, without a Dataset executor launch (or input re-read)
    per hop.

    Returns (node, hop) with hop = shortest undirected distance <= k.
    Matches a DuckDB recursive CTE over (subj<->obj) edges.
    """
    import pyarrow.compute as pc

    import ray

    from ..functions import rounds

    seed = triples.min("subj")
    if seed is None:
        return pd.DataFrame(
            {"node": pd.Series([], dtype=str), "hop": pd.Series([], dtype="int64")}
        )
    erefs = rounds.block_refs(
        triples.map_batches(
            lambda t: t.select(["subj", "obj"]), batch_format="pyarrow"
        ).materialize()
    )
    dist: dict[str, int] = {seed: 0}
    frontier = [seed]

    def expand(t: pa.Table, front: list) -> pa.Table:
        fset = pa.array(front, type=pa.string())
        fwd = t.filter(pc.is_in(t["subj"], value_set=fset))["obj"]
        rev = t.filter(pc.is_in(t["obj"], value_set=fset))["subj"]
        chunks = [*fwd.chunks, *rev.chunks] or [pa.array([], pa.string())]
        nodes = pc.unique(pa.chunked_array(chunks))
        return pa.table({"node": nodes.cast(pa.string())})

    for hop in range(1, k + 1):
        fref = ray.put(sorted(frontier))
        tabs = [t for t in rounds.round_map(erefs, expand, fref) if len(t)]
        if not tabs:
            break
        found = pa.concat_tables(tabs).to_pandas()
        new = sorted(n for n in pd.unique(found["node"]) if n not in dist)
        if not new:
            break
        for n in new:
            dist[n] = hop
        frontier = new
    out = pd.DataFrame(
        {"node": list(dist.keys()), "hop": pd.Series(list(dist.values()), dtype="int64")}
    )
    return out.sort_values("node").reset_index(drop=True)


def triangles(edges: pd.DataFrame, a_col: str = "ent_a", b_col: str = "ent_b") -> pd.DataFrame:
    """Per-node triangle participation counts over an undirected edge list.

    Driver math over a dimension-bounded edge set (the co-occurrence
    graph's node space is the closed ontology's surface vocabulary — the
    same justification as :func:`edge_weights`/:func:`pagerank`): edges
    are canonicalized to (min, max) pairs, each edge (a, b) contributes
    one triangle count to every common neighbor c of a and b, so each
    triangle {x, y, z} is credited exactly once to each of its three
    vertices (the opposite-vertex identity). Matches a three-way
    self-join SQL enumeration with a < b < c.

    Returns (node, n_triangles) for nodes in >= 1 triangle, node-sorted.
    """
    und = set()
    for a, b in zip(edges[a_col], edges[b_col]):
        if a != b:
            und.add((a, b) if a < b else (b, a))
    adj: dict = {}
    for a, b in und:
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    counts: dict = {}
    for a, b in und:
        for c in adj[a] & adj[b]:
            counts[c] = counts.get(c, 0) + 1
    if not counts:
        return pd.DataFrame(
            {"node": pd.Series([], dtype=str),
             "n_triangles": pd.Series([], dtype="int64")}
        )
    out = pd.DataFrame(
        {"node": list(counts.keys()),
         "n_triangles": pd.Series(list(counts.values()), dtype="int64")}
    )
    return out.sort_values("node").reset_index(drop=True)


def cooccurrence_counts(
    ment: "ray.data.Dataset", doc_complete: bool = False
) -> pd.DataFrame:
    """Document-level entity co-occurrence counts from a mentions Dataset.

    One hash-partition pass keyed on doc_id (groupby_partition: a doc's
    mentions land wholly in one partition regardless of how upstream
    blocks split), emitting per-partition partials for BOTH the pair
    counts (docs containing entity a AND b) and the single counts (docs
    containing entity e) — each bounded by the closed ontology's surface
    vocabulary squared, NOT by corpus size, so the driver merge is
    dimension-sized (playbook driver-partial-merge, same shape as
    edge_weights). Entities are "ent_type:surface" strings.

    ``doc_complete=True`` declares the caller's invariant that every
    block already holds whole documents (true for any mentions Dataset
    produced by ``stages.mentions.detect`` over per-row documents: a
    doc's mentions come from one input row, so they never straddle a
    batch). The partition shuffle is then pure fixed cost and the same
    partial runs as a zero-shuffle ``map_batches`` per block; integer
    count partials make the driver merge order-invariant, so both paths
    are exactly equal (pinned by tests/test_cooccurrence.py).

    Returns one frame with is_pair=True rows (ent_a < ent_b, n = co-doc
    count) and is_pair=False rows (ent_b = "", n = doc frequency).
    """
    import numpy as np

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        de = pd.DataFrame(
            {"doc_id": df["doc_id"], "ent": df["ent_type"] + ":" + df["text"]}
        ).drop_duplicates()
        sing = de.groupby("ent").size()
        # vectorized pair emission: docs grouped BY ENTITY-COUNT so each
        # distinct count n costs one reshape + one triu gather for ALL its
        # docs at once (the per-doc Python loop was the kg_cooccurrence
        # hot spot at sf0.1 — 60k tiny groupby slices)
        a_parts, b_parts = [], []
        de = de.sort_values(["doc_id", "ent"], kind="stable")
        sizes = de.groupby("doc_id", sort=False).size().to_numpy()
        ents = de["ent"].to_numpy()
        starts = np.cumsum(sizes) - sizes
        for n in np.unique(sizes):
            if n < 2:
                continue
            sel = np.where(sizes == n)[0]
            idx = (starts[sel][:, None] + np.arange(n)[None, :]).ravel()
            arr = ents[idx].reshape(len(sel), n)  # rows already ent-sorted
            ii, jj = np.triu_indices(n, k=1)
            a_parts.append(arr[:, ii].ravel())
            b_parts.append(arr[:, jj].ravel())
        if a_parts:
            pairs = (
                pd.DataFrame(
                    {"ent_a": np.concatenate(a_parts),
                     "ent_b": np.concatenate(b_parts)}
                )
                .groupby(["ent_a", "ent_b"])
                .size()
                .reset_index(name="n")
            )
            pairs["is_pair"] = True
        else:
            pairs = pd.DataFrame(
                {"ent_a": pd.Series([], dtype=str),
                 "ent_b": pd.Series([], dtype=str),
                 "n": pd.Series([], dtype="int64"),
                 "is_pair": pd.Series([], dtype=bool)}
            )
        singles = pd.DataFrame(
            {"ent_a": sing.index, "ent_b": "", "n": sing.to_numpy(),
             "is_pair": False}
        )
        out = pd.concat([pairs, singles], ignore_index=True)
        return out.astype({"ent_a": str, "ent_b": str, "n": "int64", "is_pair": bool})

    schema = pa.schema(
        [("ent_a", pa.string()), ("ent_b", pa.string()),
         ("n", pa.int64()), ("is_pair", pa.bool_())]
    )
    if doc_complete:
        parts = ment.map_batches(
            lambda df: partial(df), batch_format="pandas", batch_size=None
        ).to_pandas()
    else:
        parts = groupby_partition(
            ment, "doc_id", partial, batch_format="pandas", schema=schema
        ).to_pandas()
    if parts.empty:
        return pd.DataFrame(
            {"ent_a": pd.Series([], dtype=str), "ent_b": pd.Series([], dtype=str),
             "n": pd.Series([], dtype="int64"), "is_pair": pd.Series([], dtype=bool)}
        )
    out = (
        parts.groupby(["ent_a", "ent_b", "is_pair"], as_index=False)["n"].sum()
        .sort_values(["is_pair", "ent_a", "ent_b"])
        .reset_index(drop=True)
    )
    out["n"] = out["n"].astype("int64")
    return out


_KIND_WEDGE = 0
_KIND_DEG = 1
_KIND_LINEAGE = 2  # x = "__hot_hub__", y = hub name, c = chunk count

_PARTIAL_SCHEMA = pa.schema(
    [("x", pa.string()), ("y", pa.string()), ("c", pa.float64()),
     ("kind", pa.int8())]
)

_CHUNK_SCHEMA = pa.schema(
    [("x", pa.string()), ("y", pa.string()), ("c", pa.float64()),
     ("kind", pa.int8()),
     ("ca", pa.list_(pa.string())), ("cb", pa.list_(pa.string())),
     ("same", pa.bool_()), ("wt", pa.float64())]
)


def _log_hot_hubs(op: str, merged: "pd.DataFrame") -> None:
    import logging

    hot = merged[merged["kind"] == _KIND_LINEAGE]
    if not hot.empty:
        logging.getLogger(__name__).info(
            "%s: split %d hot hub(s) by spoke range (%s)",
            op, len(hot), ", ".join(sorted(hot["y"])[:8]),
        )


def _wedge_partials(
    edges: "ray.data.Dataset",
    a_col: str,
    b_col: str,
    num_partitions: int,
    hub_split_threshold: int,
    weighted: bool,
) -> "ray.data.Dataset":
    """Shared wedge-partial builder for :func:`neighbor_jaccard` /
    :func:`adamic_adar` with HOT-HUB SPLITTING.

    Edges double to directed (hub, spoke) rows, hash-partitioned by hub
    (adjacency hub-complete, np.unique dedups exactly — no distinct
    shuffle). A hub of degree D <= ``hub_split_threshold`` enumerates its
    D(D-1)/2 wedges in place (partial-summed per partition). A HOT hub
    (D > threshold) instead emits ceil(D/T)*(ceil(D/T)+1)/2 chunk-pair
    rows — its SORTED neighbor list split into <=T-sized ranges, each row
    carrying one (range_i, range_j) pair — which a second bounded
    ``map_batches`` pass expands (<= T^2 wedges per row, any worker), plus
    one lineage counter row (kind=2) so the split is observable, never
    silent. Chunks slice a sorted array, so cross-chunk pairs are already
    (x < y)-canonical with zero comparisons.

    ``weighted=False``: wedge weight 1 (Jaccard intersection counts);
    ``weighted=True``: weight 1/ln(deg(hub)) (Adamic-Adar), deg taken
    BEFORE splitting so the split is value-invariant.

    Returns partial rows (x, y, c float64, kind int8): kind 0 = wedge
    partial, 1 = (node, degree), 2 = hot-hub lineage.
    """
    import numpy as np

    def to_directed(t: pa.Table) -> pa.Table:
        a = t[a_col].combine_chunks() if isinstance(t[a_col], pa.ChunkedArray) else t[a_col]
        b = t[b_col].combine_chunks() if isinstance(t[b_col], pa.ChunkedArray) else t[b_col]
        return pa.table(
            {
                "hub": pa.concat_arrays([a.cast(pa.string()), b.cast(pa.string())]),
                "spoke": pa.concat_arrays([b.cast(pa.string()), a.cast(pa.string())]),
            }
        )

    directed = edges.map_batches(to_directed, batch_format="pyarrow")

    def hub_pass(df: "pd.DataFrame") -> pa.Table:
        xs, ys, ws = [], [], []
        degs: list = []
        chunk_rows: list = []
        for hub, grp in df.groupby("hub", sort=False):
            nbrs = np.unique(grp["spoke"].to_numpy())
            d = len(nbrs)
            degs.append((hub, d))
            if d < 2:
                continue
            wt = 1.0 / np.log(d) if weighted else 1.0
            if d <= hub_split_threshold:
                ii, jj = np.triu_indices(d, k=1)
                xs.append(nbrs[ii])
                ys.append(nbrs[jj])
                ws.append(np.full(len(ii), wt))
            else:
                chunks = np.array_split(nbrs, -(-d // hub_split_threshold))
                for i in range(len(chunks)):
                    for j in range(i, len(chunks)):
                        chunk_rows.append(
                            (list(chunks[i]), list(chunks[j]), i == j, wt)
                        )
                chunk_rows.append(("__lineage__", hub, len(chunks)))
        # Arrow-native assembly (round-4 VERDICT item 5): the wedge
        # combine is an arrow group_by sum and every bulk column is built
        # from numpy arrays — no Python list-of-rows at pair scale.
        tables = []

        def _extend(tbl: pa.Table) -> pa.Table:
            n = tbl.num_rows
            return pa.table(
                {
                    "x": tbl["x"], "y": tbl["y"], "c": tbl["c"],
                    "kind": tbl["kind"],
                    "ca": pa.nulls(n, pa.list_(pa.string())),
                    "cb": pa.nulls(n, pa.list_(pa.string())),
                    "same": pa.array(np.zeros(n, dtype=bool)),
                    "wt": pa.array(np.zeros(n, dtype=np.float64)),
                }
            )

        if xs:
            w = (
                pa.table(
                    {
                        "x": pa.array(np.concatenate(xs), pa.string()),
                        "y": pa.array(np.concatenate(ys), pa.string()),
                        "c": pa.array(np.concatenate(ws), pa.float64()),
                    }
                )
                .group_by(["x", "y"], use_threads=False)
                .aggregate([("c", "sum")])
                .rename_columns(["x", "y", "c"])
            )
            w = w.append_column(
                "kind", pa.array(np.full(w.num_rows, _KIND_WEDGE, np.int8))
            )
            tables.append(_extend(w))
        if degs:
            d_tbl = pa.table(
                {
                    "x": pa.array([h for h, _ in degs], pa.string()),
                    "y": pa.array([""] * len(degs), pa.string()),
                    "c": pa.array(
                        np.asarray([d for _, d in degs], dtype=np.float64)
                    ),
                    "kind": pa.array(
                        np.full(len(degs), _KIND_DEG, np.int8)
                    ),
                }
            )
            tables.append(_extend(d_tbl))
        if chunk_rows:  # rare (hot hubs only): row-wise build is fine
            cols = {
                "x": [], "y": [], "c": [], "kind": [],
                "ca": [], "cb": [], "same": [], "wt": [],
            }
            for row in chunk_rows:
                if row[0] == "__lineage__":
                    cols["x"].append("__hot_hub__"); cols["y"].append(row[1])
                    cols["c"].append(float(row[2]))
                    cols["kind"].append(_KIND_LINEAGE)
                    cols["ca"].append(None); cols["cb"].append(None)
                    cols["same"].append(False); cols["wt"].append(0.0)
                else:
                    ca, cb, same, wt = row
                    cols["x"].append(""); cols["y"].append("")
                    cols["c"].append(0.0); cols["kind"].append(np.int8(3))
                    cols["ca"].append(ca); cols["cb"].append(cb)
                    cols["same"].append(bool(same)); cols["wt"].append(float(wt))
            tables.append(
                pa.table(
                    {
                        "x": pa.array(cols["x"], pa.string()),
                        "y": pa.array(cols["y"], pa.string()),
                        "c": pa.array(cols["c"], pa.float64()),
                        "kind": pa.array(cols["kind"], pa.int8()),
                        "ca": pa.array(cols["ca"], pa.list_(pa.string())),
                        "cb": pa.array(cols["cb"], pa.list_(pa.string())),
                        "same": pa.array(cols["same"], pa.bool_()),
                        "wt": pa.array(cols["wt"], pa.float64()),
                    }
                )
            )
        if not tables:
            return _CHUNK_SCHEMA.empty_table()
        return pa.concat_tables([t.cast(_CHUNK_SCHEMA) for t in tables])

    def hub_pass_arrow(t: pa.Table) -> pa.Table:
        return hub_pass(t.to_pandas())

    tagged = groupby_partition(
        directed,
        "hub",
        hub_pass_arrow,
        num_partitions=num_partitions,
        batch_format="pyarrow",
        schema=_CHUNK_SCHEMA,
    )

    def strip(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        return t.filter(pc.not_equal(t["kind"], 3)).select(
            ["x", "y", "c", "kind"]
        )

    def expand(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        chunks = t.filter(pc.equal(t["kind"], 3))
        if chunks.num_rows == 0:
            return pa.table(
                {
                    "x": pa.array([], pa.string()),
                    "y": pa.array([], pa.string()),
                    "c": pa.array([], pa.float64()),
                    "kind": pa.array([], pa.int8()),
                }
            )
        xs, ys, ws = [], [], []
        for ca, cb, same, wt in zip(
            chunks["ca"].to_pylist(), chunks["cb"].to_pylist(),
            chunks["same"].to_pylist(), chunks["wt"].to_pylist(),
        ):
            a = np.asarray(ca, dtype=object)
            b = np.asarray(cb, dtype=object)
            if same:
                ii, jj = np.triu_indices(len(a), k=1)
                x, y = a[ii], a[jj]
            else:
                # chunks slice a SORTED neighbor array: every element of
                # range i < every element of range j, so x < y holds
                x = np.repeat(a, len(b))
                y = np.tile(b, len(a))
            xs.append(x); ys.append(y)
            ws.append(np.full(len(x), wt))
        w = (
            pd.DataFrame(
                {"x": np.concatenate(xs), "y": np.concatenate(ys),
                 "c": np.concatenate(ws)}
            )
            .groupby(["x", "y"], as_index=False)["c"].sum()
        )
        out = pa.table(
            {
                "x": pa.array(list(w["x"]), pa.string()),
                "y": pa.array(list(w["y"]), pa.string()),
                "c": pa.array(list(w["c"]), pa.float64()),
                "kind": pa.array([_KIND_WEDGE] * len(w), pa.int8()),
            }
        )
        return out

    # chunk rows fork into their own stream BEFORE the small-batch
    # expansion: plain partials pass through block-sized (a small
    # batch_size on the full stream would shred the hot path into
    # thousands of micro-tasks — measured 22 s on 340k rows), while the
    # rare chunk rows expand under a small batch_size that keeps per-task
    # memory <= batch * threshold^2 wedges under skew
    tagged = tagged.materialize()
    plain = tagged.map_batches(strip, batch_format="pyarrow")
    expanded = tagged.filter(expr="kind == 3").map_batches(
        expand, batch_format="pyarrow", batch_size=8
    )
    return plain.union(expanded)


def neighbor_jaccard(
    edges: "ray.data.Dataset",
    min_jaccard: float = 0.25,
    a_col: str = "ent_a",
    b_col: str = "ent_b",
    num_partitions: int = 64,
    driver_merge: bool = False,
    hub_split_threshold: int = 4096,
) -> "pd.DataFrame":
    """Neighbor-set Jaccard node similarity (the classic link-prediction
    signal): for node pairs sharing >= 1 neighbor,
    ``|N(a) & N(b)| / |N(a) | N(b)|``.

    Distributed wedge enumeration, never all-pairs: edges are doubled to
    directed (hub, spoke) rows and hash-partitioned by HUB, so each
    partition holds complete adjacency lists and emits (x, y, count)
    wedge partials keyed by the pair plus (node, degree) rows; a second
    pair-keyed partition pass sums the intersection counts;
    union = deg(a) + deg(b) - inter. A hub of degree D would emit D^2/2
    wedges from one partition — above ``hub_split_threshold`` the hub is
    SPLIT by spoke range instead (see :func:`_wedge_partials`): chunk-pair
    rows fan the enumeration out across bounded expansion tasks, with a
    lineage counter row per split hub (logged, never silently dropped).

    Returns a pandas DataFrame (ent_a, ent_b, jaccard) — pair-space
    output, collected by callers that are dimension-bounded.
    """
    import numpy as np

    parts = _wedge_partials(
        edges, a_col, b_col,
        num_partitions=num_partitions,
        hub_split_threshold=hub_split_threshold,
        weighted=False,
    )

    sum_schema = _PARTIAL_SCHEMA

    def sum_pass_arrow(t: pa.Table) -> pa.Table:
        # Arrow-native groupby-sum finish (round-4 VERDICT item 5): no
        # pandas conversion on the hottest node-similarity exchange
        out = t.group_by(["x", "y", "kind"], use_threads=False).aggregate(
            [("c", "sum")]
        )
        return out.rename_columns(["x", "y", "kind", "c"]).select(
            ["x", "y", "c", "kind"]
        )

    if driver_merge:
        # dimension-bounded node space (caller's assertion): the wedge
        # partials are (pairs x partitions)-bounded — sum them on the
        # driver instead of paying a second Ray shuffle's fixed cost
        # (playbook driver-partial-merge). One pandas groupby, no
        # arrow<->pandas round-trips.
        merged = (
            parts.to_pandas()
            .groupby(["x", "y", "kind"], as_index=False)["c"].sum()
            [["x", "y", "c", "kind"]]
        )
    else:
        merged = groupby_partition(
            parts,
            ["x", "y", "kind"],
            sum_pass_arrow,
            num_partitions=num_partitions,
            batch_format="pyarrow",
            schema=sum_schema,
        ).to_pandas()

    empty = pd.DataFrame(
        {"ent_a": pd.Series([], dtype=str), "ent_b": pd.Series([], dtype=str),
         "jaccard": pd.Series([], dtype="float64")}
    )
    if merged.empty:
        return empty
    _log_hot_hubs("neighbor_jaccard", merged)
    deg = merged[merged["kind"] == _KIND_DEG].set_index("x")["c"]
    wedges = merged[merged["kind"] == _KIND_WEDGE]
    if wedges.empty:
        return empty
    da = wedges["x"].map(deg).to_numpy(dtype="float64")
    db = wedges["y"].map(deg).to_numpy(dtype="float64")
    c = wedges["c"].to_numpy(dtype="float64")
    jac = c / (da + db - c)
    keep = jac >= min_jaccard
    out = pd.DataFrame(
        {"ent_a": wedges["x"].to_numpy()[keep],
         "ent_b": wedges["y"].to_numpy()[keep],
         "jaccard": np.round(jac[keep], 6)}
    )
    return out.sort_values(["ent_a", "ent_b"]).reset_index(drop=True)


def kcore(
    edges: pd.DataFrame,
    a_col: str = "ent_a",
    b_col: str = "ent_b",
) -> pd.DataFrame:
    """K-core decomposition (Matula/Beck peeling): each node's core
    number = the largest k such that it survives in the subgraph where
    every node has degree >= k. The KG-pruning companion to
    triangles/pagerank — driver math over the ontology-bounded
    co-occurrence edge set (same justification documented at
    :func:`triangles`); an open node space would distribute the
    per-round degree recompute as partition partials.

    Returns (node, core) for every node with >= 1 edge, node-sorted.
    """
    adj: dict = {}
    for a, b in zip(edges[a_col], edges[b_col]):
        if a != b:
            adj.setdefault(a, set()).add(b)
            adj.setdefault(b, set()).add(a)
    deg = {v: len(ns) for v, ns in adj.items()}
    core: dict = {}
    # peel ascending k; deterministic order via sorted node names
    remaining = dict(deg)
    k = 0
    while remaining:
        k_candidates = [v for v, d in remaining.items() if d <= k]
        if not k_candidates:
            k += 1
            continue
        for v in sorted(k_candidates):
            if v not in remaining or remaining[v] > k:
                continue
            core[v] = k
            del remaining[v]
            for u in adj[v]:
                if u in remaining:
                    remaining[u] = max(remaining[u] - 1, 0)
        # re-scan at same k: decrements may pull more nodes to <= k
    if not core:
        return pd.DataFrame(
            {"node": pd.Series([], dtype=str),
             "core": pd.Series([], dtype="int64")}
        )
    out = pd.DataFrame(
        {"node": list(core.keys()),
         "core": pd.Series(list(core.values()), dtype="int64")}
    )
    return out.sort_values("node").reset_index(drop=True)


def random_walks(
    edges: pd.DataFrame,
    walk_len: int = 4,
    walks_per_node: int = 2,
    a_col: str = "ent_a",
    b_col: str = "ent_b",
) -> "ray.data.Dataset":
    """Deterministic DeepWalk-style walk corpus (Perozzi et al. 2014's
    data-prep step): ``walks_per_node`` walks of ``walk_len`` hops from
    every node; the next hop indexes the SORTED neighbor list by an
    md5-derived value of (start, walk_idx, step, current) — reproducible
    at any parallelism, no RNG state.

    Distributed shape: the ontology-bounded adjacency is ``ray.put``
    once and every task extends its start-nodes' walks locally — zero
    shuffles. For an open node space use
    :func:`random_walks_distributed` — the per-step frontier-join
    variant (identical spec and output) that never collects or
    broadcasts the adjacency.

    Returns a Dataset (start, walk_idx, path) with '|'-joined paths.
    """
    import hashlib

    adj: dict = {}
    for a, b in zip(edges[a_col], edges[b_col]):
        if a != b:
            adj.setdefault(a, []).append(b)
            adj.setdefault(b, []).append(a)
    adj = {v: sorted(set(ns)) for v, ns in adj.items()}
    adj_ref = ray.put(adj)

    nodes = ray.data.from_pandas(
        pd.DataFrame({"start": sorted(adj.keys())})
    )

    def walk(t: pa.Table) -> pa.Table:
        from ..functions.broadcast import bget

        neigh = bget(adj_ref)
        starts, widx, paths = [], [], []
        for s in t["start"].to_pylist():
            for w in range(walks_per_node):
                cur = s
                path = [cur]
                for step in range(walk_len):
                    ns = neigh.get(cur)
                    if not ns:
                        break
                    key = f"{s}\x00{w}\x00{step}\x00{cur}".encode("utf-8")
                    pick = int.from_bytes(
                        hashlib.md5(key).digest()[:8], "big"
                    ) % len(ns)
                    cur = ns[pick]
                    path.append(cur)
                starts.append(s)
                widx.append(w)
                paths.append("|".join(path))
        return pa.table(
            {
                "start": pa.array(starts, pa.string()),
                "walk_idx": pa.array(widx, pa.int64()),
                "path": pa.array(paths, pa.string()),
            }
        )

    return nodes.map_batches(walk, batch_format="pyarrow")


def random_walks_distributed(
    edges: "ray.data.Dataset",
    walk_len: int = 4,
    walks_per_node: int = 2,
    a_col: str = "ent_a",
    b_col: str = "ent_b",
    num_partitions: int = 16,
) -> "ray.data.Dataset":
    """Frontier-join random walks — same deterministic md5 hop rule (and
    identical output set) as :func:`random_walks`, but the adjacency is
    NEVER collected, broadcast, or re-shuffled: the node-hash-partitioned
    adjacency blocks pin ONCE as object refs (functions/rounds — the
    same shape as :func:`pagerank_distributed`), and each step moves
    ONLY the walk frontier: one raw task per adjacency block extends its
    partition's walkers and scatters the survivors to their next node's
    home block. The open-node-space scale path the broadcast variant's
    docstring promises (round-3 VERDICT item 4).

    Exchange volume: the adjacency moves once (the pinning groupby);
    each of the ``walk_len`` steps then moves W = V x walks_per_node
    frontier rows through the object store, task-to-task, never via the
    driver. Per-row strings only; payload text never moves.

    Returns a Dataset (start, walk_idx, path) with '|'-joined paths.
    """
    import hashlib

    from ..functions import rounds
    from ..functions.partitioning import add_hash_partition

    P = num_partitions

    def both(df: pd.DataFrame) -> pd.DataFrame:
        e = df[[a_col, b_col]].drop_duplicates()
        e = e[e[a_col] != e[b_col]]
        out = pd.DataFrame(
            {
                "key": np.concatenate(
                    [e[a_col].to_numpy(), e[b_col].to_numpy()]
                ),
                "path": np.concatenate(
                    [e[b_col].to_numpy(), e[a_col].to_numpy()]
                ),
            }
        ).drop_duplicates()
        return out.astype({"key": str, "path": str})

    fr_schema = pa.schema(
        [("key", pa.string()), ("start", pa.string()),
         ("walk_idx", pa.int64()), ("path", pa.string())]
    )

    def tag(t: pa.Table) -> pa.Table:
        return add_hash_partition(t, ["key"], P)

    # pin the partitioned adjacency ONCE: one groupby exchange, then the
    # blocks live in plasma for every step (locality-aware task placement)
    adj_blocks = (
        edges.select_columns([a_col, b_col])
        .map_batches(both, batch_format="pandas")
        .map_batches(tag, batch_format="pyarrow")
        .groupby("_part")
        .map_groups(lambda t: t, batch_format="pyarrow")
        .materialize()
    )
    arefs = rounds.block_refs(adj_blocks)
    nb = len(arefs)
    if nb == 0:
        return ray.data.from_arrow(
            pa.schema(
                [("start", pa.string()), ("walk_idx", pa.int64()),
                 ("path", pa.string())]
            ).empty_table()
        )

    # which hash partitions live in which pinned block. A block may hold
    # several partitions; a partition USUALLY lives in one block, but
    # Ray's dynamic block splitting can break one oversized map_groups
    # output across blocks — routing a frontier to just one piece would
    # silently walk against a partial neighbor list. Repair: union-find
    # blocks that share a partition and concat each group into one
    # pinned block (rare — only blocks past the target block size).
    @ray.remote
    def _parts_of(t: pa.Table) -> list:
        return sorted(set(np.asarray(t["_part"]).tolist()))

    parts_per_block = ray.get([_parts_of.remote(r) for r in arefs])
    parent = list(range(nb))

    def _find(x: int) -> int:
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    owner: dict = {}
    for i, ps in enumerate(parts_per_block):
        for p_ in ps:
            if p_ in owner:
                ra, rb = _find(owner[p_]), _find(i)
                if ra != rb:
                    parent[rb] = ra
            else:
                owner[p_] = i
    from collections import defaultdict

    groups = defaultdict(list)
    for i in range(nb):
        groups[_find(i)].append(i)
    if len(groups) < nb:
        @ray.remote
        def _concat(*ts: pa.Table) -> pa.Table:
            return pa.concat_tables(list(ts))

        new_refs, new_parts = [], []
        for _, members in sorted(groups.items()):
            if len(members) == 1:
                new_refs.append(arefs[members[0]])
                new_parts.append(parts_per_block[members[0]])
            else:
                new_refs.append(
                    _concat.remote(*[arefs[m] for m in members])
                )
                new_parts.append(sorted(
                    set().union(*[set(parts_per_block[m]) for m in members])
                ))
        arefs, parts_per_block = new_refs, new_parts
        nb = len(arefs)
    part2block = {
        p: i for i, ps in enumerate(parts_per_block) for p in ps
    }

    # pre-build each block's {node: sorted neighbor list} ONCE — the
    # adjacency is immutable across steps, so rebuilding the dict every
    # hop would be walk_len-fold redundant CPU; the dicts stay in the
    # object store as one pinned ref per block
    @ray.remote
    def _prep(adj_t: pa.Table) -> dict:
        ad = adj_t.to_pandas()
        return {
            k: sorted(set(g))
            for k, g in ad.groupby("key", sort=False)["path"]
        }

    nrefs = [_prep.remote(r) for r in arefs]

    def _route(tbl: pa.Table) -> list:
        """Split frontier rows by their key's home block; returns a list
        of nb tables (empty ones carry the frontier schema)."""
        if tbl.num_rows == 0:
            return [fr_schema.empty_table()] * nb
        part = np.asarray(
            add_hash_partition(tbl.select(["key"]), ["key"], P)["_part"]
        )
        # LUT instead of a per-row dict lookup; partitions with no
        # adjacency rows route to block 0 (pass-through there)
        lut = np.zeros(P, dtype=np.int64)
        for p_, b_ in part2block.items():  # P-bounded, captured by value
            lut[p_] = b_
        dest = lut[part]
        out = []
        order = np.argsort(dest, kind="stable")
        sorted_dest = dest[order]
        tbl = tbl.take(pa.array(order))
        bounds = np.searchsorted(sorted_dest, np.arange(nb + 1))
        for i in range(nb):
            lo, hi = bounds[i], bounds[i + 1]
            out.append(
                tbl.slice(lo, hi - lo) if hi > lo
                else fr_schema.empty_table()
            )
        return out

    @ray.remote
    def _seed(adj_t: pa.Table) -> pa.Table:
        """Frontier seeds for this block's own nodes (their home block
        by construction — no routing needed)."""
        nodes = pa.Table.from_arrays(
            [adj_t["key"].combine_chunks()], names=["key"]
        )
        uniq = nodes.group_by("key", use_threads=False).aggregate([])
        ks = np.asarray(uniq["key"]).astype(object)
        rep = np.repeat(ks, walks_per_node)
        widx = np.tile(np.arange(walks_per_node, dtype=np.int64), len(ks))
        return pa.table(
            {"key": pa.array(rep, pa.string()),
             "start": pa.array(rep, pa.string()),
             "walk_idx": pa.array(widx, pa.int64()),
             "path": pa.array(rep, pa.string())}
        )

    def _hop(neigh: dict, step: int, *frs: pa.Table) -> list:
        """Extend this block's frontier one md5 hop; scatter to home
        blocks of the new current nodes. Frontier tables (and the
        block's prebuilt neighbor dict) arrive as TOP-LEVEL args: Ray
        resolves top-level ObjectRefs via the scheduler's native
        dependency path; the same refs nested inside a list would go
        through the borrowed-reference protocol, which measured
        ~15 s/round of pure ownership-resolution latency on this box
        (0.5 s total with variadic args)."""
        frames = [t for t in frs if t.num_rows]
        if not frames:
            return [fr_schema.empty_table()] * nb
        fr = pa.concat_tables(frames)
        keys, paths = [], []
        starts = fr["start"].to_pylist()
        widx = fr["walk_idx"].to_pylist()
        for cur, s, w, path in zip(
            fr["key"].to_pylist(), starts, widx, fr["path"].to_pylist()
        ):
            ns = neigh.get(cur)
            if not ns:
                keys.append(cur)
                paths.append(path)
                continue
            hkey = f"{s}\x00{w}\x00{step}\x00{cur}".encode("utf-8")
            pick = int.from_bytes(
                hashlib.md5(hkey).digest()[:8], "big"
            ) % len(ns)
            nxt = ns[pick]
            keys.append(nxt)
            paths.append(path + "|" + nxt)
        out = pa.table(
            {"key": pa.array(keys, pa.string()),
             "start": pa.array(starts, pa.string()),
             "walk_idx": pa.array(widx, pa.int64()),
             "path": pa.array(paths, pa.string())}
        )
        return _route(out)

    if nb > 1:
        hop_task = ray.remote(num_returns=nb)(_hop)
    else:
        def _hop_single(neigh, step, *frs):
            return _hop(neigh, step, *frs)[0]

        hop_single = ray.remote(_hop_single)

    # per-block frontier ref lists; seeds start at their home block
    frontier: list = [[_seed.remote(arefs[i])] for i in range(nb)]
    for step in range(walk_len):
        if nb == 1:
            frontier = [[
                hop_single.remote(nrefs[0], step, *frontier[0])
            ]]
            continue
        outs = [
            hop_task.remote(nrefs[i], step, *frontier[i])
            for i in range(nb)
        ]
        frontier = [[outs[j][i] for j in range(nb)] for i in range(nb)]

    flat = [r for lst in frontier for r in lst]
    return ray.data.from_arrow_refs(flat).select_columns(
        ["start", "walk_idx", "path"]
    )


def label_propagation(edges: pd.DataFrame, iters: int = 10) -> pd.DataFrame:
    """Deterministic synchronous weighted label propagation (Raghavan et
    al. 2007) — community detection over the bounded KG edge list, same
    driver-iteration-over-distributed-aggregate shape as :func:`pagerank`
    (the edge weights come from the distributed combiner; the label
    updates are pure order-deterministic math).

    Determinism: synchronous updates (all nodes flip on the round's
    frozen labels), ties broken by the SMALLEST label index, fixed
    ``iters`` rounds with early exit on a fixed point. Labels are node
    indices into the sorted node array; the reported community id is
    the lexicographically smallest member's name.
    """
    import numpy as np

    if edges.empty:
        return pd.DataFrame(
            {"node": pd.Series([], dtype=str),
             "community": pd.Series([], dtype=str)}
        )
    nodes = np.unique(
        np.concatenate([edges["subj"].to_numpy(), edges["obj"].to_numpy()])
    )
    idx = {n: i for i, n in enumerate(nodes)}
    s = edges["subj"].map(idx).to_numpy(dtype=np.int64)
    o = edges["obj"].map(idx).to_numpy(dtype=np.int64)
    wgt = edges["n"].to_numpy(dtype=np.float64)
    src = np.concatenate([s, o])  # undirected voting
    dst = np.concatenate([o, s])
    w = np.concatenate([wgt, wgt])
    labels = np.arange(len(nodes), dtype=np.int64)
    for _ in range(iters):
        votes = (
            pd.DataFrame({"dst": dst, "lab": labels[src], "w": w})
            .groupby(["dst", "lab"], as_index=False)["w"].sum()
            .sort_values(["dst", "w", "lab"], ascending=[True, False, True])
        )
        best = votes.groupby("dst", sort=False).head(1)
        new = labels.copy()
        new[best["dst"].to_numpy()] = best["lab"].to_numpy()
        if np.array_equal(new, labels):
            break
        labels = new
    # canonical community name: smallest MEMBER name per final label
    comm = pd.Series(nodes).groupby(labels).transform("min")
    return pd.DataFrame({"node": nodes, "community": comm.to_numpy()})


def ranked_auc(pos_scores, neg_scores) -> float:
    """Mann-Whitney AUC with average-rank tie handling — the standard
    link-prediction / ranking evaluation statistic. Pure deterministic
    math shared by the distributed query and the serial fixture oracle
    (same precedent as the pagerank iteration)."""
    import numpy as np

    pos = np.asarray(pos_scores, dtype=np.float64)
    neg = np.asarray(neg_scores, dtype=np.float64)
    if len(pos) == 0 or len(neg) == 0:
        return float("nan")
    scores = np.concatenate([pos, neg])
    _, inv, counts = np.unique(scores, return_inverse=True, return_counts=True)
    cum = np.cumsum(counts)
    avg_rank = cum - (counts - 1) / 2.0  # average rank of each tie group
    r = avg_rank[inv]
    n_pos, n_neg = len(pos), len(neg)
    return float((r[:n_pos].sum() - n_pos * (n_pos + 1) / 2.0) / (n_pos * n_neg))


def personalized_pagerank(
    edges: pd.DataFrame, seed: str, damping: float = 0.85, iters: int = 30
) -> pd.DataFrame:
    """Personalized PageRank (random walk with restart to ONE seed node)
    over the bounded edge list — the graph-retrieval primitive ("what is
    relevant to X"). Identical driver-iteration-over-combiner-aggregate
    shape as :func:`pagerank`; restart AND dangling mass both return to
    the seed, the standard PPR formulation. Deterministic: edges arrive
    canonically sorted."""
    import numpy as np

    nodes = np.unique(
        np.concatenate([edges["subj"].to_numpy(), edges["obj"].to_numpy()])
    )
    idx = {n: i for i, n in enumerate(nodes)}
    if seed not in idx:
        return pd.DataFrame(
            {"node": pd.Series([], dtype=str),
             "rank": pd.Series([], dtype="float64")}
        )
    src = edges["subj"].map(idx).to_numpy(dtype=np.int64)
    dst = edges["obj"].map(idx).to_numpy(dtype=np.int64)
    w = edges["n"].to_numpy(dtype=np.float64)
    n = len(nodes)
    out_w = np.zeros(n)
    np.add.at(out_w, src, w)
    s = idx[seed]
    rank = np.zeros(n)
    rank[s] = 1.0
    for _ in range(iters):
        contrib = np.zeros(n)
        np.add.at(contrib, dst, rank[src] * w / out_w[src])
        dangling = rank[out_w == 0].sum()
        rank = damping * contrib
        rank[s] += (1.0 - damping) + damping * dangling
    return pd.DataFrame({"node": nodes, "rank": np.round(rank, 6)})


def adamic_adar(
    edges: "ray.data.Dataset",
    a_col: str = "ent_a",
    b_col: str = "ent_b",
    num_partitions: int = 64,
    hub_split_threshold: int = 4096,
) -> pd.DataFrame:
    """Adamic-Adar link-prediction score: AA(x,y) = Σ_z 1/ln(deg(z)) over
    common neighbors z — the rarity-weighted sibling of
    :func:`neighbor_jaccard`, same distributed wedge shape (shared
    :func:`_wedge_partials` builder, including the hot-hub spoke-range
    split above ``hub_split_threshold`` — deg is taken before splitting,
    so the split is value-invariant); the pair-keyed sum is a
    dimension-bounded driver merge. A common neighbor always has degree
    >= 2, so ln never hits zero."""

    parts = _wedge_partials(
        edges, a_col, b_col,
        num_partitions=num_partitions,
        hub_split_threshold=hub_split_threshold,
        weighted=True,
    ).to_pandas()
    if parts.empty:
        return pd.DataFrame(
            {"ent_a": pd.Series([], dtype=str), "ent_b": pd.Series([], dtype=str),
             "aa": pd.Series([], dtype="float64")}
        )
    _log_hot_hubs("adamic_adar", parts)
    wedges = parts[parts["kind"] == _KIND_WEDGE]
    out = wedges.groupby(["x", "y"], as_index=False)["c"].sum()
    out = out.rename(columns={"x": "ent_a", "y": "ent_b", "c": "aa"})
    out["aa"] = out["aa"].round(6)
    return out.sort_values(["ent_a", "ent_b"]).reset_index(drop=True)


def betweenness_approx(edges: pd.DataFrame, k_sources: int = 16) -> pd.DataFrame:
    """Approximate betweenness centrality (Brandes 2001 single-source
    dependency accumulation, sampled over the k lexicographically
    smallest nodes as sources — deterministic, no RNG). Driver iteration
    over the combiner-reduced bounded edge list, like pagerank; at an
    open node space each source's BFS becomes the frontier-broadcast
    distributed pass used by khop and sources are hash-sampled. Scores
    are normalized by the source count and rounded to 6 dp."""
    import numpy as np

    if edges.empty:
        return pd.DataFrame(
            {"node": pd.Series([], dtype=str),
             "betweenness": pd.Series([], dtype="float64")}
        )
    nodes = np.unique(
        np.concatenate([edges["subj"].to_numpy(), edges["obj"].to_numpy()])
    )
    idx = {n: i for i, n in enumerate(nodes)}
    n = len(nodes)
    adj: list = [[] for _ in range(n)]
    for a, b in zip(edges["subj"].map(idx), edges["obj"].map(idx)):
        if a != b:
            adj[a].append(b)
            adj[b].append(a)
    adj = [sorted(set(x)) for x in adj]  # deterministic neighbor order
    bc = np.zeros(n)
    sources = range(min(k_sources, n))  # nodes[] is sorted -> smallest k
    for s in sources:
        # Brandes: BFS orders, path counts sigma, dependency back-prop
        dist = np.full(n, -1, dtype=np.int64)
        sigma = np.zeros(n)
        dist[s], sigma[s] = 0, 1.0
        order, frontier = [], [s]
        while frontier:
            nxt = []
            for v in frontier:
                order.append(v)
                for w in adj[v]:
                    if dist[w] < 0:
                        dist[w] = dist[v] + 1
                        nxt.append(w)
                    if dist[w] == dist[v] + 1:
                        sigma[w] += sigma[v]
            frontier = nxt
        delta = np.zeros(n)
        for w in reversed(order):
            for v in adj[w]:
                if dist[v] == dist[w] - 1:
                    delta[v] += sigma[v] / sigma[w] * (1.0 + delta[w])
            if w != s:
                bc[w] += delta[w]
    bc /= max(len(list(sources)), 1)
    return pd.DataFrame({"node": nodes, "betweenness": np.round(bc, 6)})


# ---------------------------------------------------------------------------
# Open-node-space (distributed-rounds) variants
#
# The driver-math functions above are correct for this KG's closed ontology
# (node space = surface vocabulary, dimension-sized). The variants below are
# the first-class scale path for an OPEN node space (user-id graphs, web
# graphs): the E-sized edge set NEVER collects on the driver — each round is
# a broadcast + map_batches pass (pagerank / label propagation) or a
# partition-parallel degree recompute (k-core). Driver state is bounded by
# the V-sized return value itself (rank / label / core per node), never by E.
# ---------------------------------------------------------------------------


def _int_edges_by_dst(
    triples: "ray.data.Dataset", num_partitions: int = 16
) -> "tuple[ray.data.Dataset, np.ndarray, np.ndarray]":
    """Shared prep for the distributed-rounds iterations: ONE obj-keyed
    partition pass reduces the triples to (subj, obj, n-rows) edge weights
    with every dst's edges complete inside one partition and sorted by
    (subj, obj) — so a per-partition ``np.add.at`` accumulates each dst's
    float contributions in exactly the order the driver-path
    :func:`pagerank` does over its canonically-sorted edge list
    (bit-exact rounds, any parallelism). Returns (int-ified edges Dataset
    materialized for re-use across rounds, sorted node vocabulary,
    out-weight vector). Driver-held state is V-sized (vocab + out_w);
    weights are integer doc counts so their merge order is exact.
    """
    import numpy as np

    from ..functions.broadcast import bget
    from ..functions.partitioning import groupby_partition

    red_schema = pa.schema(
        [("subj", pa.string()), ("obj", pa.string()), ("n", pa.int64())]
    )

    def reduce_part(df: "pd.DataFrame") -> "pd.DataFrame":
        out = (
            df.groupby(["subj", "obj"], as_index=False)
            .size()
            .rename(columns={"size": "n"})
            .sort_values(["subj", "obj"])
        )
        return out.astype({"subj": str, "obj": str, "n": "int64"})

    reduced = groupby_partition(
        triples.map_batches(
            lambda t: t.select(["subj", "obj"]), batch_format="pyarrow"
        ),
        "obj",
        reduce_part,
        num_partitions=num_partitions,
        batch_format="pandas",
        schema=red_schema,
    ).materialize()

    # V-sized vocab + integer out-weights: per-block partials, exact merge
    def vocab_partial(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        subj = t["subj"].combine_chunks()
        uw = (
            t.select(["subj", "n"])
            .group_by("subj", use_threads=False)
            .aggregate([("n", "sum")])
        )
        uo = pc.unique(t["obj"].combine_chunks())
        return pa.table(
            {
                "node": pa.concat_arrays(
                    [uw["subj"].combine_chunks().cast(pa.string()), uo.cast(pa.string())]
                ),
                "w": pa.concat_arrays(
                    [
                        uw["n_sum"].combine_chunks().cast(pa.int64()),
                        pa.array([0] * len(uo), pa.int64()),
                    ]
                ),
            }
        )

    vp = reduced.map_batches(vocab_partial, batch_format="pyarrow").to_pandas()
    if vp.empty:
        return reduced, np.array([], dtype=object), np.array([], dtype=np.float64)
    agg = vp.groupby("node")["w"].sum().sort_index()
    nodes = agg.index.to_numpy()
    out_w = agg.to_numpy(dtype=np.float64)

    # nodes is SORTED (groupby index), so vectorized searchsorted is the
    # exact inverse of the vocabulary — no per-row dict lookups
    nodes_ref = ray.put(nodes)

    int_schema = pa.schema(
        [("src", pa.int64()), ("dst", pa.int64()), ("w", pa.float64())]
    )

    def intify(t: pa.Table) -> pa.Table:
        v = bget(nodes_ref)
        subj = np.asarray(t["subj"].combine_chunks().cast(pa.string()), dtype=object)
        obj = np.asarray(t["obj"].combine_chunks().cast(pa.string()), dtype=object)
        return pa.table(
            {
                "src": pa.array(np.searchsorted(v, subj), pa.int64()),
                "dst": pa.array(np.searchsorted(v, obj), pa.int64()),
                "w": t["n"].cast(pa.float64()),
            }
        )

    edges_int = reduced.map_batches(
        intify, batch_format="pyarrow", batch_size=None
    ).materialize()
    return edges_int, nodes, out_w


def pagerank_distributed(
    triples: "ray.data.Dataset",
    damping: float = 0.85,
    iters: int = 30,
    num_partitions: int = 16,
) -> pd.DataFrame:
    """Distributed-rounds weighted PageRank — same spec (and bit-identical
    output) as :func:`pagerank` over :func:`edge_weights`, but the edge set
    stays in the object store: the dst-partitioned edge blocks pin ONCE as
    Arrow object refs, then each round broadcasts the V-sized rank vector
    (``ray.put`` once per round) and runs one raw Ray task per block
    (functions/rounds — a fixed-point loop re-reading the same blocks is
    the one shape the Dataset API can't express without paying a full
    executor launch per round). Partials return in block order, so every
    dst's float accumulation order equals the driver path's ``np.add.at``
    over the canonical edge list (blocks dst-complete, rows pre-sorted
    (subj, obj)). Driver work per round is placing V contribution values +
    the dangling scalar — output-sized, never E-sized."""
    import numpy as np

    from ..functions import rounds

    edges_int, nodes, out_w = _int_edges_by_dst(triples, num_partitions)
    n = len(nodes)
    if n == 0:
        return pd.DataFrame(
            {"node": pd.Series([], dtype=str), "rank": pd.Series([], dtype="float64")}
        )
    rank = np.full(n, 1.0 / n)
    out_w_ref = ray.put(out_w)  # broadcast ONCE, plasma-shared per node
    erefs = rounds.block_refs(edges_int)

    def round_fn(t: pa.Table, r: np.ndarray, ow: np.ndarray) -> pa.Table:
        src = np.asarray(t["src"])
        dst = np.asarray(t["dst"])
        w = np.asarray(t["w"])
        vals = r[src] * w / ow[src]
        ud, inv = np.unique(dst, return_inverse=True)
        c = np.zeros(len(ud))
        np.add.at(c, inv, vals)
        return pa.table({"dst": pa.array(ud, pa.int64()), "c": pa.array(c)})

    for _ in range(iters):
        rref = ray.put(rank)
        contrib = np.zeros(n)
        for part in rounds.round_map(erefs, round_fn, rref, out_w_ref):
            np.add.at(
                contrib,
                np.asarray(part["dst"], dtype=np.int64),
                np.asarray(part["c"], dtype=np.float64),
            )
        dangling = rank[out_w == 0].sum()
        rank = (1.0 - damping) / n + damping * (contrib + dangling / n)
    return pd.DataFrame({"node": nodes, "rank": np.round(rank, 6)})


def label_propagation_distributed(
    triples: "ray.data.Dataset", iters: int = 10, num_partitions: int = 16
) -> pd.DataFrame:
    """Distributed-rounds synchronous weighted label propagation — same
    spec (and bit-identical output: integer vote weights are exact under
    any merge order) as :func:`label_propagation`. The int edge blocks pin
    ONCE as object refs; per round: broadcast the V-sized label vector and
    run one raw Ray task per block (functions/rounds) emitting per-block
    (dst, lab, w) vote partials (undirected: each edge votes both ways);
    the driver merges the (labels-per-node)-bounded partial table and
    applies the deterministic smallest-label-wins argmax."""
    import numpy as np

    from ..functions import rounds

    edges_int, nodes, _out_w = _int_edges_by_dst(triples, num_partitions)
    n = len(nodes)
    if n == 0:
        return pd.DataFrame(
            {"node": pd.Series([], dtype=str), "community": pd.Series([], dtype=str)}
        )
    labels = np.arange(n, dtype=np.int64)
    erefs = rounds.block_refs(edges_int)

    def votes_fn(t: pa.Table, lab: np.ndarray) -> pa.Table:
        src = np.asarray(t["src"])
        dst = np.asarray(t["dst"])
        w = np.asarray(t["w"]).astype(np.int64)
        vd = np.concatenate([dst, src])  # undirected voting
        vl = np.concatenate([lab[src], lab[dst]])
        vw = np.concatenate([w, w])
        df = (
            pd.DataFrame({"dst": vd, "lab": vl, "w": vw})
            .groupby(["dst", "lab"], as_index=False)["w"]
            .sum()
        )
        return pa.Table.from_pandas(df, preserve_index=False)

    for _ in range(iters):
        lref = ray.put(labels)
        tabs = [t for t in rounds.round_map(erefs, votes_fn, lref) if len(t)]
        if not tabs:
            break
        parts = pa.concat_tables(tabs).to_pandas()
        votes = (
            parts.groupby(["dst", "lab"], as_index=False)["w"]
            .sum()
            .sort_values(["dst", "w", "lab"], ascending=[True, False, True])
        )
        best = votes.groupby("dst", sort=False).head(1)
        new = labels.copy()
        new[best["dst"].to_numpy()] = best["lab"].to_numpy()
        if np.array_equal(new, labels):
            break
        labels = new
    comm = pd.Series(nodes).groupby(labels).transform("min")
    return pd.DataFrame({"node": nodes, "community": comm.to_numpy()})


def kcore_distributed(
    edges: "ray.data.Dataset",
    a_col: str = "ent_a",
    b_col: str = "ent_b",
    num_partitions: int = 16,
) -> "ray.data.Dataset":
    """Dataset-in / Dataset-out k-core decomposition (Matula/Beck peel)
    with partition-parallel degree recompute per round — the open-node-
    space path promised by :func:`kcore`'s docstring.

    The directed edge set hub-partitions ONCE (groupby_partition: a hub's
    rows land wholly in one partition), then the live blocks pin as Arrow
    object refs and every peel round is raw Ray tasks over them
    (functions/rounds — the peel loop re-reads the same shrinking blocks
    dozens of times, the shape the Dataset API can't express without a
    full executor launch per pass; the map_batches version here paid TWO
    hash shuffles per round). Per round:

    1. one task per block computes each hub's exact distinct-neighbor
       degree locally (hub rows are block-complete; filtering preserves
       that) — only the (node, deg) partials cross to the driver;
    2. nodes peeling at the current k (they are the output) broadcast
       back via ``ray.put``;
    3. one task per block drops edges touching peeled nodes, RETURNS the
       new block to the object store (never the driver), and reports
       orphaned hubs — surviving hubs whose spokes all peeled: their core
       number is k — plus the kept-row count so empty blocks retire.

    Core numbers are unique regardless of peel order, so the result is
    identical to the driver-path :func:`kcore`. Edge state stays in the
    object store; driver state is the (node, core) output itself.
    """
    import numpy as np

    from ..functions import rounds
    from ..functions.partitioning import groupby_partition

    dir_schema = pa.schema([("hub", pa.string()), ("spoke", pa.string())])

    def to_directed(t: pa.Table) -> pa.Table:
        a = np.asarray(t[a_col].combine_chunks().cast(pa.string()), dtype=object)
        b = np.asarray(t[b_col].combine_chunks().cast(pa.string()), dtype=object)
        keep = a != b
        a, b = a[keep], b[keep]
        return pa.table(
            {
                "hub": pa.array(np.concatenate([a, b]), pa.string()),
                "spoke": pa.array(np.concatenate([b, a]), pa.string()),
            }
        )

    alive = groupby_partition(
        edges.map_batches(to_directed, batch_format="pyarrow"),
        "hub",
        lambda df: df.astype({"hub": str, "spoke": str}),
        num_partitions=num_partitions,
        batch_format="pandas",
        schema=dir_schema,
    ).materialize()
    refs = rounds.block_refs(alive)

    def deg_pass(t: pa.Table) -> "pd.DataFrame":
        df = t.to_pandas()
        return (
            df.groupby("hub", sort=False)["spoke"]
            .nunique()
            .reset_index()
            .rename(columns={"hub": "node", "spoke": "deg"})
        )

    def filter_pass(t: pa.Table, peeled: set) -> tuple:
        df = t.to_pandas()
        hub_ok = ~df["hub"].isin(peeled)
        kept = df[hub_ok & ~df["spoke"].isin(peeled)]
        orphans = np.setdiff1d(
            df.loc[hub_ok, "hub"].unique(), kept["hub"].unique()
        )
        return (
            pa.Table.from_pandas(kept.reset_index(drop=True), preserve_index=False),
            list(orphans),
        )

    core: dict = {}
    k = 0
    while refs:
        deg = pd.concat(rounds.round_map(refs, deg_pass), ignore_index=True)
        if deg.empty:
            break
        mind = int(deg["deg"].min())
        if mind > k:
            k = mind
        peel = deg.loc[deg["deg"] <= k, "node"]
        for v in peel:
            core[v] = k
        pref = ray.put(set(peel))
        refs, infos = rounds.round_update(refs, filter_pass, pref)
        for orphans in infos:
            for v in orphans:
                core[v] = k
        kept_lens = rounds.ref_lens(refs)
        refs = [r for r, n in zip(refs, kept_lens) if n]

    if not core:
        out = pd.DataFrame(
            {"node": pd.Series([], dtype=str), "core": pd.Series([], dtype="int64")}
        )
    else:
        out = pd.DataFrame(
            {"node": list(core.keys()), "core": pd.Series(list(core.values()), dtype="int64")}
        ).sort_values("node").reset_index(drop=True)
    return ray.data.from_pandas(out)


def personalized_pagerank_distributed(
    triples: "ray.data.Dataset",
    seed: str,
    damping: float = 0.85,
    iters: int = 30,
    num_partitions: int = 16,
) -> pd.DataFrame:
    """Distributed-rounds personalized PageRank — same spec (and
    bit-identical output, same argument as :func:`pagerank_distributed`:
    dst-partition-complete contribution blocks, rows pre-sorted
    (subj, obj)) as :func:`personalized_pagerank`. Restart and dangling
    mass both return to the seed; the edge set never collects — blocks pin
    once as object refs and each round is one raw task per block
    (functions/rounds, same shape as :func:`pagerank_distributed`)."""
    import numpy as np

    from ..functions import rounds

    edges_int, nodes, out_w = _int_edges_by_dst(triples, num_partitions)
    n = len(nodes)
    pos = np.searchsorted(nodes, seed) if n else 0
    if n == 0 or pos >= n or nodes[pos] != seed:
        return pd.DataFrame(
            {"node": pd.Series([], dtype=str), "rank": pd.Series([], dtype="float64")}
        )
    s = int(pos)
    rank = np.zeros(n)
    rank[s] = 1.0
    out_w_ref = ray.put(out_w)
    erefs = rounds.block_refs(edges_int)

    def round_fn(t: pa.Table, r: np.ndarray, ow: np.ndarray) -> pa.Table:
        src = np.asarray(t["src"])
        dst = np.asarray(t["dst"])
        w = np.asarray(t["w"])
        vals = r[src] * w / ow[src]
        ud, inv = np.unique(dst, return_inverse=True)
        c = np.zeros(len(ud))
        np.add.at(c, inv, vals)
        return pa.table({"dst": pa.array(ud, pa.int64()), "c": pa.array(c)})

    for _ in range(iters):
        rref = ray.put(rank)
        tabs = [t for t in rounds.round_map(erefs, round_fn, rref, out_w_ref) if len(t)]
        parts = (
            pa.concat_tables(tabs).to_pandas()
            if tabs
            else pd.DataFrame({"dst": [], "c": []})
        )
        contrib = np.zeros(n)
        if not parts.empty:
            np.add.at(
                contrib,
                parts["dst"].to_numpy(dtype=np.int64),
                parts["c"].to_numpy(dtype=np.float64),
            )
        dangling = rank[out_w == 0].sum()
        rank = damping * contrib
        rank[s] += (1.0 - damping) + damping * dangling
    return pd.DataFrame({"node": nodes, "rank": np.round(rank, 6)})


def triangles_distributed(
    edges: "ray.data.Dataset",
    a_col: str = "ent_a",
    b_col: str = "ent_b",
    num_partitions: int = 16,
    hub_split_threshold: int = 4096,
) -> pd.DataFrame:
    """Distributed per-node triangle participation counts — same spec (and
    identical integer output) as :func:`triangles`, with the adjacency
    never collected on the driver.

    Nodes intify up front (sorted vocabulary broadcast once; the vocab is
    the size of the RESULT, so holding it is no new bound) — every
    shuffled row downstream is three int32 codes, not strings: the
    numeric partition-hash fast path, int sorts, int merges (measured
    6.3 s -> ~2 s on the 340k-wedge near-complete sf0.01 graph). Two
    partition passes: (1) hub-keyed — each hub's partition holds its
    complete adjacency, emitting one (x, y, z=hub) row per wedge (hot
    hubs above ``hub_split_threshold`` emit chunk-pair rows expanded by a
    bounded small-batch pass, exactly like :func:`_wedge_partials`) plus
    one canonical edge-marker row per undirected edge (emitted from its
    SMALLER endpoint's partition only, so markers are globally distinct
    with no dedup shuffle); (2) (x, y)-keyed — a wedge (x, y, z) closes a
    triangle iff the (x, y) marker is present in its group, crediting z
    once per triangle (the opposite-vertex identity of the driver path).
    Per-partition per-z sums cross to the driver (node-space-bounded, the
    output's own size). Vocab codes preserve lexicographic order, so the
    hub < spoke canonicalization matches the string-keyed driver path."""
    import numpy as np
    import pyarrow.compute as pc

    from ..functions.broadcast import bget
    from ..functions.partitioning import groupby_partition

    K_WEDGE, K_EDGE, K_CHUNK = 0, 1, 3
    NODE = pa.int64()

    # node vocabulary: per-block distinct -> driver sorted unique (V-sized,
    # the output's own bound), broadcast once
    def uniq(t: pa.Table) -> pa.Table:
        u = pc.unique(
            pa.chunked_array(
                [t[a_col].combine_chunks().cast(pa.string()),
                 t[b_col].combine_chunks().cast(pa.string())]
            )
        )
        return pa.table({"node": u})

    up = edges.map_batches(uniq, batch_format="pyarrow").to_pandas()
    if up.empty:
        return pd.DataFrame(
            {"node": pd.Series([], dtype=str),
             "n_triangles": pd.Series([], dtype="int64")}
        )
    vocab = np.unique(up["node"].to_numpy())
    vref = ray.put(vocab)

    t_schema = pa.schema(
        [("x", NODE), ("y", NODE), ("z", NODE), ("kind", pa.int8()),
         ("ca", pa.list_(NODE)), ("cb", pa.list_(NODE))]
    )

    def to_directed(t: pa.Table) -> pa.Table:
        v = bget(vref)
        a = np.searchsorted(v, np.asarray(t[a_col].combine_chunks().cast(pa.string()), dtype=object))
        b = np.searchsorted(v, np.asarray(t[b_col].combine_chunks().cast(pa.string()), dtype=object))
        keep = a != b
        a, b = a[keep], b[keep]
        return pa.table(
            {
                "hub": pa.array(np.concatenate([a, b]), NODE),
                "spoke": pa.array(np.concatenate([b, a]), NODE),
            }
        )

    directed = edges.map_batches(to_directed, batch_format="pyarrow")

    def hub_pass(df: "pd.DataFrame") -> pa.Table:
        xs, ys, zs = [], [], []
        ex, ey = [], []
        chunk_rows: list = []
        for hub, grp in df.groupby("hub", sort=False):
            nbrs = np.unique(grp["spoke"].to_numpy())
            d = len(nbrs)
            bigger = nbrs[nbrs > hub]
            ex.append(np.full(len(bigger), hub, dtype=np.int64))
            ey.append(bigger)
            if d < 2:
                continue
            if d <= hub_split_threshold:
                ii, jj = np.triu_indices(d, k=1)
                xs.append(nbrs[ii])
                ys.append(nbrs[jj])
                zs.append(np.full(len(ii), hub, dtype=np.int64))
            else:
                chunks = np.array_split(nbrs, -(-d // hub_split_threshold))
                for i in range(len(chunks)):
                    for j in range(i, len(chunks)):
                        chunk_rows.append((hub, chunks[i], chunks[j]))
        wx = np.concatenate(xs) if xs else np.array([], dtype=np.int64)
        wy = np.concatenate(ys) if ys else np.array([], dtype=np.int64)
        wz = np.concatenate(zs) if zs else np.array([], dtype=np.int64)
        mex = np.concatenate(ex) if ex else np.array([], dtype=np.int64)
        mey = np.concatenate(ey) if ey else np.array([], dtype=np.int64)
        n_w, n_e, n_c = len(wx), len(mex), len(chunk_rows)
        return pa.table(
            {
                "x": pa.array(
                    np.concatenate(
                        [wx, mex, np.array([c[0] for c in chunk_rows], np.int64)]
                    ),
                    NODE,
                ),
                "y": pa.array(
                    np.concatenate([wy, mey, np.zeros(n_c, np.int64)]), NODE
                ),
                "z": pa.array(
                    np.concatenate([wz, np.zeros(n_e + n_c, np.int64)]), NODE
                ),
                "kind": pa.array(
                    [K_WEDGE] * n_w + [K_EDGE] * n_e + [K_CHUNK] * n_c, pa.int8()
                ),
                "ca": pa.array(
                    [None] * (n_w + n_e) + [list(c[1]) for c in chunk_rows],
                    pa.list_(NODE),
                ),
                "cb": pa.array(
                    [None] * (n_w + n_e) + [list(c[2]) for c in chunk_rows],
                    pa.list_(NODE),
                ),
            }
        )

    tagged = groupby_partition(
        directed, "hub", lambda t: hub_pass(t.to_pandas()),
        num_partitions=num_partitions, batch_format="pyarrow", schema=t_schema,
    )

    def strip(t: pa.Table) -> pa.Table:
        return t.filter(pc.not_equal(t["kind"], K_CHUNK)).select(
            ["x", "y", "z", "kind"]
        )

    def expand(t: pa.Table) -> pa.Table:
        ch = t.filter(pc.equal(t["kind"], K_CHUNK))
        if ch.num_rows == 0:
            return pa.table(
                {
                    "x": pa.array([], NODE), "y": pa.array([], NODE),
                    "z": pa.array([], NODE), "kind": pa.array([], pa.int8()),
                }
            )
        xs, ys, zs = [], [], []
        for hub, ca, cb in zip(
            ch["x"].to_pylist(), ch["ca"].to_pylist(), ch["cb"].to_pylist()
        ):
            a = np.asarray(ca, dtype=np.int64)
            b = np.asarray(cb, dtype=np.int64)
            if len(a) and len(b) and a[0] == b[0] and len(a) == len(b):
                ii, jj = np.triu_indices(len(a), k=1)
                x, y = a[ii], a[jj]
            else:
                x = np.repeat(a, len(b))
                y = np.tile(b, len(a))
            xs.append(x); ys.append(y)
            zs.append(np.full(len(x), hub, dtype=np.int64))
        return pa.table(
            {
                "x": pa.array(np.concatenate(xs), NODE),
                "y": pa.array(np.concatenate(ys), NODE),
                "z": pa.array(np.concatenate(zs), NODE),
                "kind": pa.array(
                    [K_WEDGE] * sum(len(v) for v in xs), pa.int8()
                ),
            }
        )

    # fork chunk rows before the small-batch expansion (see
    # _wedge_partials: a small batch_size on the full stream shreds the
    # hot path into micro-tasks)
    tagged = tagged.materialize()
    plain = tagged.map_batches(strip, batch_format="pyarrow")
    expanded = tagged.filter(expr=f"kind == {K_CHUNK}").map_batches(
        expand, batch_format="pyarrow", batch_size=8
    )
    wedge_rows = plain.union(expanded)

    cnt_schema = pa.schema([("node", NODE), ("c", pa.int64())])

    def pair_pass(df: "pd.DataFrame") -> "pd.DataFrame":
        marks = df[df["kind"] == K_EDGE][["x", "y"]].drop_duplicates()
        wedges = df[df["kind"] == K_WEDGE]
        closed = wedges.merge(marks, on=["x", "y"], how="inner")
        if closed.empty:
            return pd.DataFrame(
                {"node": pd.Series([], dtype="int64"),
                 "c": pd.Series([], dtype="int64")}
            )
        out = closed.groupby("z", as_index=False).size().rename(
            columns={"z": "node", "size": "c"}
        )
        return out.astype({"node": "int64", "c": "int64"})

    parts = groupby_partition(
        wedge_rows, ["x", "y"], pair_pass,
        num_partitions=num_partitions, batch_format="pandas", schema=cnt_schema,
    ).to_pandas()
    if parts.empty:
        return pd.DataFrame(
            {"node": pd.Series([], dtype=str),
             "n_triangles": pd.Series([], dtype="int64")}
        )
    agg = parts.groupby("node", as_index=False)["c"].sum()
    out = pd.DataFrame(
        {"node": vocab[agg["node"].to_numpy()],
         "n_triangles": agg["c"].astype("int64").to_numpy()}
    )
    return out.sort_values("node").reset_index(drop=True)


def betweenness_distributed(
    triples: "ray.data.Dataset",
    k_sources: int = 16,
    num_partitions: int = 16,
) -> pd.DataFrame:
    """Distributed Brandes approximate betweenness — same spec as
    :func:`betweenness_approx` (k lexicographically smallest sources,
    normalized by the source count), with the edge set never collected.

    All k sources advance TOGETHER: dist/sigma/delta live as (V, k)
    driver matrices (V-sized = output-sized, k a constant), and each BFS
    level — forward sigma accumulation, then backward dependency
    accumulation — is one raw Ray task per pinned edge block
    (functions/rounds; the level loop re-reads the same materialized
    distinct directed int edges with fresh broadcast matrices — paying a
    Dataset executor launch per level would dominate), so the total pass
    count is 2 x diameter, independent of k and of |E|. Sigma counts are
    integers (exact under any partial-merge order); delta partials are
    floats rounded at 6 dp like the driver path; partials merge in block
    order, matching the map_batches path bit-for-bit.
    """
    import numpy as np
    import pyarrow.compute as pc

    from ..functions import rounds
    from ..functions.broadcast import bget
    from ..functions.partitioning import groupby_partition

    # distinct undirected edges, intified and doubled (the driver path's
    # adjacency SET semantics — duplicate rows must not double sigma)
    def uniq(t: pa.Table) -> pa.Table:
        u = pc.unique(
            pa.chunked_array(
                [t["subj"].combine_chunks().cast(pa.string()),
                 t["obj"].combine_chunks().cast(pa.string())]
            )
        )
        return pa.table({"node": u})

    up = triples.map_batches(uniq, batch_format="pyarrow").to_pandas()
    if up.empty:
        return pd.DataFrame(
            {"node": pd.Series([], dtype=str),
             "betweenness": pd.Series([], dtype="float64")}
        )
    vocab = np.unique(up["node"].to_numpy())
    vref = ray.put(vocab)
    n = len(vocab)

    pair_schema = pa.schema([("u", pa.int64()), ("v", pa.int64())])

    def to_pairs(t: pa.Table) -> pa.Table:
        vv = bget(vref)
        a = np.searchsorted(vv, np.asarray(t["subj"].combine_chunks().cast(pa.string()), dtype=object))
        b = np.searchsorted(vv, np.asarray(t["obj"].combine_chunks().cast(pa.string()), dtype=object))
        keep = a != b
        lo = np.minimum(a[keep], b[keep])
        hi = np.maximum(a[keep], b[keep])
        return pa.table({"u": pa.array(lo, pa.int64()), "v": pa.array(hi, pa.int64())})

    def distinct_pairs(df: "pd.DataFrame") -> "pd.DataFrame":
        return df.drop_duplicates()

    und = groupby_partition(
        triples.map_batches(to_pairs, batch_format="pyarrow"),
        ["u", "v"],
        distinct_pairs,
        num_partitions=num_partitions,
        batch_format="pandas",
        schema=pair_schema,
    )

    def double(t: pa.Table) -> pa.Table:
        u = np.asarray(t["u"])
        v = np.asarray(t["v"])
        return pa.table(
            {
                "src": pa.array(np.concatenate([u, v]), pa.int64()),
                "dst": pa.array(np.concatenate([v, u]), pa.int64()),
            }
        )

    edges_int = und.map_batches(double, batch_format="pyarrow").materialize()
    erefs = rounds.block_refs(edges_int)

    k = min(k_sources, n)
    dist = np.full((n, k), -1, dtype=np.int64)
    sigma = np.zeros((n, k))
    for j in range(k):
        dist[j, j] = 0
        sigma[j, j] = 1.0

    # forward: level-synchronous BFS, one pass per level, all sources at once
    levels = 0
    def fwd(t: pa.Table, state: tuple) -> pa.Table:
        d, sg, lvl = state
        src = np.asarray(t["src"])
        dst = np.asarray(t["dst"])
        rows, cols = np.nonzero(d[src] == lvl)
        if len(rows) == 0:
            return pa.table(
                {"cell": pa.array([], pa.int64()), "s": pa.array([], pa.float64())}
            )
        cell = dst[rows] * d.shape[1] + cols
        uc, inv = np.unique(cell, return_inverse=True)
        s = np.zeros(len(uc))
        np.add.at(s, inv, sg[src[rows], cols])
        return pa.table({"cell": pa.array(uc, pa.int64()), "s": pa.array(s)})

    while True:
        state_ref = ray.put((dist, sigma, levels))
        tabs = [t for t in rounds.round_map(erefs, fwd, state_ref) if len(t)]
        if not tabs:
            break
        parts = pa.concat_tables(tabs).to_pandas()
        cell = parts["cell"].to_numpy(dtype=np.int64)
        sval = parts["s"].to_numpy()
        di, ki = cell // k, cell % k
        # only UNVISITED (node, source) cells extend the BFS (the driver
        # path adds sigma only when dist[w] == dist[v] + 1, i.e. the
        # first level a node is seen at; lateral/backward edges drop)
        fresh = dist[di, ki] == -1
        if not fresh.any():
            break
        di, ki, sval = di[fresh], ki[fresh], sval[fresh]
        dist[di, ki] = levels + 1
        np.add.at(sigma, (di, ki), sval)
        levels += 1

    # backward: dependency accumulation, one pass per level descending
    delta = np.zeros((n, k))
    bc = np.zeros(n)
    def bwd(t: pa.Table, state: tuple) -> pa.Table:
        d, sg, dl, L = state
        src = np.asarray(t["src"])
        dst = np.asarray(t["dst"])
        # src one level above dst's predecessors: credit v=src where
        # dist[v] == L-1 and dist[w=dst] == L
        rows, cols = np.nonzero((d[src] == L - 1) & (d[dst] == L))
        if len(rows) == 0:
            return pa.table(
                {"cell": pa.array([], pa.int64()), "s": pa.array([], pa.float64())}
            )
        v = src[rows]
        w = dst[rows]
        val = sg[v, cols] / sg[w, cols] * (1.0 + dl[w, cols])
        cell = v * d.shape[1] + cols
        uc, inv = np.unique(cell, return_inverse=True)
        s = np.zeros(len(uc))
        np.add.at(s, inv, val)
        return pa.table({"cell": pa.array(uc, pa.int64()), "s": pa.array(s)})

    for lvl in range(levels, 0, -1):
        state_ref = ray.put((dist, sigma, delta, lvl))
        tabs = [t for t in rounds.round_map(erefs, bwd, state_ref) if len(t)]
        if not tabs:
            continue
        parts = pa.concat_tables(tabs).to_pandas()
        cell = parts["cell"].to_numpy(dtype=np.int64)
        sval = parts["s"].to_numpy()
        di, ki = cell // k, cell % k
        np.add.at(delta, (di, ki), sval)
    # accumulate (excluding each source's own delta), normalize like the
    # driver path
    for j in range(k):
        d = delta[:, j].copy()
        d[j] = 0.0
        bc += d
    bc /= max(k, 1)
    return pd.DataFrame({"node": vocab, "betweenness": np.round(bc, 6)})


# ---------------------------------------------------------------------------
# TransE knowledge-graph embeddings (Bordes et al. 2013, "Translating
# Embeddings for Modeling Multi-relational Data") — the KG-native training
# loop over the extracted triple set. Squared-L2 variant with margin ranking
# loss and one content-addressed corrupted object per triple (the
# kg_negative_samples spec: md5 indexing into the sorted object vocabulary
# replaces the reference's order-dependent RNG draws, utils_re.py:237).
#
# Exactness contract (what makes the distributed epoch reproducible): with
# squared-L2 distance the margin-active gradient of EVERY embedding row is a
# ±2-integer-weighted sum of other embedding rows —
#   d(s,p,o) = ||E_s + R_p - E_o||²,  active = margin + d_pos - d_neg > 0
#   ∂/∂E_s = ∂/∂R_p = 2(E_o' - E_o);  ∂/∂E_o = -2(E_s + R_p - E_o);
#   ∂/∂E_o' = 2(E_s + R_p - E_o')
# so each block emits INTEGER coefficient partials (flat (row,col) index,
# signed count) instead of float gradients. Integers merge exactly under any
# block structure / arrival order; the driver then applies ONE scatter-add in
# canonical (sorted unique) order — the distributed result is bit-identical
# to the serial single-pass loop at any parallelism, which is what the
# fixture oracle checks.


def _transe_md5_idx(keys: "list[str]", n: int) -> "np.ndarray":
    """Content-addressed vocabulary indices: md5(key)[:8] % n per key."""
    import hashlib

    import numpy as np

    return np.fromiter(
        (int(hashlib.md5(k.encode("utf-8")).hexdigest()[:8], 16) % n for k in keys),
        dtype=np.int64,
        count=len(keys),
    )


def transe_init(ents: "np.ndarray", rels: "np.ndarray", dim: int) -> "np.ndarray":
    """Content-addressed Xavier-style init for the stacked (V+R, dim) weight
    matrix: W[i, j] = U(-b, b), b = 6/sqrt(dim), drawn from
    md5("<kind>|<name>|<j>") — no RNG state, reproducible at any parallelism.
    Entity rows are L2-normalized (the TransE paper's init discipline)."""
    import hashlib
    import math

    import numpy as np

    b = 6.0 / math.sqrt(dim)
    names = [("ent", str(e)) for e in ents] + [("rel", str(r)) for r in rels]
    W = np.empty((len(names), dim), dtype=np.float64)
    for i, (kind, name) in enumerate(names):
        for j in range(dim):
            u = (
                int(
                    hashlib.md5(f"{kind}|{name}|{j}".encode("utf-8")).hexdigest()[:12],
                    16,
                )
                / float(1 << 48)
            )
            W[i, j] = (2.0 * u - 1.0) * b
    nv = len(ents)
    if nv:
        norms = np.linalg.norm(W[:nv], axis=1, keepdims=True)
        W[:nv] = W[:nv] / np.where(norms == 0.0, 1.0, norms)
    return W


def _transe_epoch_coo(
    s: "np.ndarray",
    p: "np.ndarray",
    o: "np.ndarray",
    neg: "np.ndarray",
    W: "np.ndarray",
    margin: float,
) -> "tuple[np.ndarray, np.ndarray, float]":
    """One pass over (already int-ified) triples: the integer gradient
    coefficients of the margin-active rows as (flat (row*n+col) index,
    signed count) partials, plus the summed margin loss. Pure — called on
    the full arrays by the serial path and per block by the distributed
    path; the concatenated partials merge exactly (see module note)."""
    import numpy as np

    D = W[s] + W[p] - W[o]
    Dn = W[s] + W[p] - W[neg]
    viol = margin + np.einsum("ij,ij->i", D, D) - np.einsum("ij,ij->i", Dn, Dn)
    loss = float(np.sum(np.maximum(viol, 0.0)))
    act = viol > 0.0
    sa, pa_, oa, na = s[act], p[act], o[act], neg[act]
    m = len(sa)
    if m == 0:
        return (
            np.zeros(0, dtype=np.int64),
            np.zeros(0, dtype=np.int64),
            loss,
        )
    two = np.full(m, 2, dtype=np.int64)
    rows = np.concatenate([sa, sa, pa_, pa_, oa, oa, oa, na, na, na])
    cols = np.concatenate([na, oa, na, oa, sa, pa_, oa, sa, pa_, na])
    coef = np.concatenate(
        [two, -two, two, -two, -two, -two, two, two, two, -two]
    )
    flat = rows * np.int64(W.shape[0]) + cols
    uf, inv = np.unique(flat, return_inverse=True)
    vals = np.zeros(len(uf), dtype=np.int64)
    np.add.at(vals, inv, coef)
    keep = vals != 0
    return uf[keep], vals[keep], loss


def _transe_step(
    W: "np.ndarray",
    flat_idx: "np.ndarray",
    coef: "np.ndarray",
    lr: float,
    n_triples: int,
    n_ents: int,
) -> "np.ndarray":
    """Apply one full-batch step from merged integer coefficient partials.
    The float math happens HERE only, in canonical (sorted unique pair)
    order — identical for the serial and distributed paths. The gradient
    scatter is O(nnz × dim): nnz is bounded by distinct co-active (row,col)
    pairs, never V² (no dense coefficient matrix is built)."""
    import numpy as np

    n_rows = W.shape[0]
    uf, inv = np.unique(flat_idx, return_inverse=True)
    vals = np.zeros(len(uf), dtype=np.int64)
    np.add.at(vals, inv, coef)
    nz = vals != 0
    uf, vals = uf[nz], vals[nz]
    r = uf // n_rows
    c = uf % n_rows
    grad = np.zeros_like(W)
    np.add.at(grad, r, vals[:, None].astype(np.float64) * W[c])
    W = W - lr * grad / max(n_triples, 1)
    if n_ents:
        norms = np.linalg.norm(W[:n_ents], axis=1, keepdims=True)
        W[:n_ents] = W[:n_ents] / np.where(norms == 0.0, 1.0, norms)
    return W


def _transe_table(
    ents: "np.ndarray",
    rels: "np.ndarray",
    W: "np.ndarray",
    losses: "list[float]",
    dim: int,
) -> pd.DataFrame:
    import numpy as np

    nv, nr = len(ents), len(rels)
    kind = ["ent"] * (nv * dim) + ["rel"] * (nr * dim) + ["loss"] * len(losses)
    name = (
        [str(e) for e in ents for _ in range(dim)]
        + [str(r) for r in rels for _ in range(dim)]
        + ["margin_loss"] * len(losses)
    )
    dims = (
        list(np.tile(np.arange(dim), nv))
        + list(np.tile(np.arange(dim), nr))
        + list(range(len(losses)))
    )
    value = list(np.round(W.ravel(), 6)) + [round(x, 6) for x in losses]
    out = pd.DataFrame(
        {"kind": kind, "name": name, "dim": np.asarray(dims, dtype=np.int64),
         "value": np.asarray(value, dtype=np.float64)}
    )
    return out.sort_values(["kind", "name", "dim"]).reset_index(drop=True)


def _transe_negatives(
    subj: "np.ndarray",
    pred: "np.ndarray",
    obj: "np.ndarray",
    ents: "np.ndarray",
    objs: "np.ndarray",
    n_negs: int,
) -> "np.ndarray":
    """Per-triple bank of ``n_negs`` content-addressed corrupted objects
    (md5("s|p|o|k") into the sorted object vocabulary, +1 bump on
    self-collision — the kg_negative_samples spec). Epoch e trains against
    column e % n_negs: cycling negatives keeps the margin active against
    more of the candidate space than one fixed draw, with zero RNG state —
    the draw is still a pure function of the triple."""
    import numpy as np

    n = len(subj)
    out = np.empty((n, n_negs), dtype=np.int64)
    for k in range(n_negs):
        ni = _transe_md5_idx(
            [f"{a}|{b}|{c}|{k}" for a, b, c in zip(subj, pred, obj)], len(objs)
        )
        hit = objs[ni] == obj
        ni[hit] = (ni[hit] + 1) % len(objs)
        out[:, k] = np.searchsorted(ents, objs[ni])
    return out


def transe(
    spo: pd.DataFrame,
    dim: int = 8,
    epochs: int = 12,
    lr: float = 0.1,
    margin: float = 1.0,
    n_negs: int = 4,
    return_raw: bool = False,
) -> "pd.DataFrame | tuple":
    """Serial/driver-path TransE over a distinct (subj, pred, obj) frame —
    the shared spec the fixture oracle recomputes (the pagerank pattern:
    stages/graph owns the deterministic math, the serial oracle feeds it
    independently-extracted triples). Returns the long embedding table
    (kind ent|rel|loss, name, dim, value)."""
    import numpy as np

    spo = (
        spo[["subj", "pred", "obj"]]
        .drop_duplicates()
        .sort_values(["subj", "pred", "obj"])
        .reset_index(drop=True)
    )
    ents = np.unique(
        np.concatenate(
            [spo["subj"].to_numpy(dtype=object), spo["obj"].to_numpy(dtype=object)]
        )
    )
    rels = np.unique(spo["pred"].to_numpy(dtype=object))
    objs = np.unique(spo["obj"].to_numpy(dtype=object))
    if len(spo) == 0:
        return _transe_table(ents, rels, np.zeros((0, dim)), [], dim)
    nv = len(ents)
    s = np.searchsorted(ents, spo["subj"].to_numpy(dtype=object))
    p = nv + np.searchsorted(rels, spo["pred"].to_numpy(dtype=object))
    o = np.searchsorted(ents, spo["obj"].to_numpy(dtype=object))
    negs = _transe_negatives(
        spo["subj"].to_numpy(dtype=object),
        spo["pred"].to_numpy(dtype=object),
        spo["obj"].to_numpy(dtype=object),
        ents,
        objs,
        n_negs,
    )
    W = transe_init(ents, rels, dim)
    losses: "list[float]" = []
    for e in range(epochs):
        flat, coef, loss = _transe_epoch_coo(s, p, o, negs[:, e % n_negs], W, margin)
        losses.append(loss)
        W = _transe_step(W, flat, coef, lr, len(spo), nv)
    if return_raw:
        return ents, rels, W, losses
    return _transe_table(ents, rels, W, losses, dim)


def transe_train(
    triples: "ray.data.Dataset",
    dim: int = 8,
    epochs: int = 12,
    lr: float = 0.1,
    margin: float = 1.0,
    n_negs: int = 4,
    num_partitions: int = 16,
    return_raw: bool = False,
) -> "pd.DataFrame | tuple":
    """Distributed full-batch TransE over the triple Dataset — bit-identical
    to :func:`transe` at any parallelism (asserted by tests).

    Shape: ONE subj-keyed partition pass reduces to the distinct
    (subj, pred, obj) set (identical rows co-locate, so per-partition
    drop_duplicates is globally exact); vocabularies come from per-block
    distinct partials (V- and R-bounded driver merges, the
    pagerank_distributed discipline); negatives are content-addressed at
    intify time, once. The int-ified triple blocks pin ONCE as object refs
    (functions/rounds — a fixed-point loop re-reading the same blocks is
    the shape the Dataset API can't express), then every epoch broadcasts
    the (V+R, dim) float64 weight matrix and collects INTEGER coefficient
    partials per block, merged exactly on the driver (see module note).
    Driver-held state is vocab-bounded — weights + nnz coefficient pairs —
    never O(triples)."""
    import numpy as np

    from ..functions import rounds
    from ..functions.broadcast import bget

    spo_schema = pa.schema(
        [("subj", pa.string()), ("pred", pa.string()), ("obj", pa.string())]
    )

    def distinct_part(t: pa.Table) -> pa.Table:
        df = t.to_pandas().drop_duplicates().sort_values(["subj", "pred", "obj"])
        return pa.Table.from_pandas(df, preserve_index=False).cast(spo_schema)

    reduced = groupby_partition(
        triples.map_batches(
            lambda t: t.select(["subj", "pred", "obj"]), batch_format="pyarrow"
        ),
        "subj",
        distinct_part,
        num_partitions=num_partitions,
        schema=spo_schema,
    ).materialize()

    def vocab_partial(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        us = pc.unique(t["subj"].combine_chunks()).cast(pa.string())
        uo = pc.unique(t["obj"].combine_chunks()).cast(pa.string())
        up = pc.unique(t["pred"].combine_chunks()).cast(pa.string())
        return pa.table(
            {
                "name": pa.concat_arrays([us, uo, up]),
                "kind": pa.array(
                    ["e"] * (len(us) + len(uo)) + ["r"] * len(up), pa.string()
                ),
                "is_obj": pa.array(
                    [False] * len(us) + [True] * len(uo) + [False] * len(up)
                ),
            }
        )

    vp = reduced.map_batches(vocab_partial, batch_format="pyarrow").to_pandas()
    if vp.empty or "kind" not in vp.columns:
        # empty blocks skip the UDF, losing the partial schema
        e0 = np.array([], dtype=object)
        if return_raw:
            return e0, e0, np.zeros((0, dim)), []
        return _transe_table(e0, e0, np.zeros((0, dim)), [], dim)
    ents = np.unique(vp.loc[vp["kind"] == "e", "name"].to_numpy(dtype=object))
    rels = np.unique(vp.loc[vp["kind"] == "r", "name"].to_numpy(dtype=object))
    objs = np.unique(vp.loc[vp["is_obj"], "name"].to_numpy(dtype=object))
    if len(objs) == 0:
        if return_raw:
            return ents, rels, np.zeros((0, dim)), []
        return _transe_table(ents, rels, np.zeros((0, dim)), [], dim)
    nv = len(ents)
    ents_ref = ray.put(ents)
    rels_ref = ray.put(rels)
    objs_ref = ray.put(objs)

    def intify(t: pa.Table) -> pa.Table:
        ev, rv, ov = bget(ents_ref), bget(rels_ref), bget(objs_ref)
        subj = np.asarray(t["subj"].combine_chunks().cast(pa.string()), dtype=object)
        pred = np.asarray(t["pred"].combine_chunks().cast(pa.string()), dtype=object)
        obj = np.asarray(t["obj"].combine_chunks().cast(pa.string()), dtype=object)
        negs = _transe_negatives(subj, pred, obj, ev, ov, n_negs)
        cols = {
            "s": pa.array(np.searchsorted(ev, subj), pa.int64()),
            "p": pa.array(len(ev) + np.searchsorted(rv, pred), pa.int64()),
            "o": pa.array(np.searchsorted(ev, obj), pa.int64()),
        }
        for k in range(n_negs):
            cols[f"neg{k}"] = pa.array(negs[:, k], pa.int64())
        return pa.table(cols)

    spo_int = reduced.map_batches(
        intify, batch_format="pyarrow", batch_size=None
    ).materialize()
    erefs = rounds.block_refs(spo_int)
    n_triples = sum(rounds.ref_lens(erefs))

    def epoch_fn(t: pa.Table, W: "np.ndarray", mg: float, k: int) -> dict:
        flat, coef, loss = _transe_epoch_coo(
            np.asarray(t["s"], dtype=np.int64),
            np.asarray(t["p"], dtype=np.int64),
            np.asarray(t["o"], dtype=np.int64),
            np.asarray(t[f"neg{k}"], dtype=np.int64),
            W,
            mg,
        )
        return {"flat": flat, "coef": coef, "loss": loss}

    W = transe_init(ents, rels, dim)
    losses: "list[float]" = []
    for e in range(epochs):
        wref = ray.put(W)
        parts = rounds.round_map(erefs, epoch_fn, wref, margin, e % n_negs)
        flat = np.concatenate([p["flat"] for p in parts]) if parts else np.zeros(0, np.int64)
        coef = np.concatenate([p["coef"] for p in parts]) if parts else np.zeros(0, np.int64)
        losses.append(float(sum(p["loss"] for p in parts)))
        W = _transe_step(W, flat, coef, lr, n_triples, nv)
    if return_raw:
        return ents, rels, W, losses
    return _transe_table(ents, rels, W, losses, dim)


def _in_sorted(vocab: "np.ndarray", vals: "np.ndarray") -> "np.ndarray":
    """Membership mask of vals in a SORTED object-dtype vocabulary
    (searchsorted + equality probe; np.isin on object arrays loops)."""
    import numpy as np

    if len(vocab) == 0:
        return np.zeros(len(vals), dtype=bool)
    i = np.clip(np.searchsorted(vocab, vals), 0, len(vocab) - 1)
    return vocab[i] == vals


def _transe_rank_hist(
    s: "np.ndarray",
    p: "np.ndarray",
    ti: "np.ndarray",
    W: "np.ndarray",
    cand_rows: "np.ndarray",
    chunk: int = 2048,
) -> "np.ndarray":
    """Integer link-prediction ranks of the true object among ALL candidate
    objects under squared-L2 TransE distance, as a bincount histogram
    (length |cand|+1). Ties break by candidate vocabulary position — fully
    deterministic. Candidates stream in ``chunk``-sized slices so memory is
    O(block x chunk x dim), independent of block AND vocabulary size; the true distance is
    EXTRACTED from its own chunk (identical elementwise ops), so equality
    comparisons are bit-consistent. Integer histograms merge exactly across
    blocks — the distributed eval is bit-identical to the serial one."""
    import numpy as np

    n = len(s)
    n_cand = len(cand_rows)
    if n == 0 or n_cand == 0:
        return np.zeros(n_cand + 1, dtype=np.int64)
    v = W[s] + W[p]
    rank = np.ones(n, dtype=np.int64)
    row_chunk = 256  # rows are independent: slicing them cannot change bits
    for rl in range(0, n, row_chunk):
        rh = min(rl + row_chunk, n)
        vr, tr = v[rl:rh], ti[rl:rh]
        d_true = np.empty(rh - rl, dtype=np.float64)
        for lo in range(0, n_cand, chunk):
            hi = min(lo + chunk, n_cand)
            sel = (tr >= lo) & (tr < hi)
            if not sel.any():
                continue
            diff = vr[sel][:, None, :] - W[cand_rows[lo:hi]][None, :, :]
            d2 = (diff * diff).sum(axis=2)
            d_true[sel] = d2[np.arange(int(sel.sum())), tr[sel] - lo]
        for lo in range(0, n_cand, chunk):
            hi = min(lo + chunk, n_cand)
            diff = vr[:, None, :] - W[cand_rows[lo:hi]][None, :, :]
            d2 = (diff * diff).sum(axis=2)
            rank[rl:rh] += (d2 < d_true[:, None]).sum(axis=1)
            idx = np.arange(lo, hi, dtype=np.int64)
            rank[rl:rh] += (
                (d2 == d_true[:, None]) & (idx[None, :] < tr[:, None])
            ).sum(axis=1)
    return np.bincount(rank, minlength=n_cand + 1).astype(np.int64)


def _transe_metrics(hist: "np.ndarray", n_skipped: int) -> pd.DataFrame:
    """Metric rows from the exact rank histogram (canonical ascending-rank
    driver math — deterministic): raw-setting hits@k, mean rank, MRR."""
    import numpy as np

    n = int(hist.sum())
    r = np.arange(len(hist), dtype=np.float64)
    rows = [("n_test", float(n)), ("n_skipped", float(n_skipped))]
    if n == 0:
        rows += [("hits_at_1", 0.0), ("hits_at_3", 0.0), ("hits_at_10", 0.0),
                 ("mean_rank", 0.0), ("mrr", 0.0)]
    else:
        mrr = 0.0
        for k in range(1, len(hist)):
            mrr += hist[k] / k
        rows += [
            ("hits_at_1", float(hist[1:2].sum()) / n),
            ("hits_at_3", float(hist[1:4].sum()) / n),
            ("hits_at_10", float(hist[1:11].sum()) / n),
            ("mean_rank", float((r * hist).sum()) / n),
            ("mrr", float(mrr) / n),
        ]
    out = pd.DataFrame(rows, columns=["metric", "value"])
    out["value"] = out["value"].round(6)
    return out.sort_values("metric").reset_index(drop=True)


def _transe_is_test(
    subj: "np.ndarray", pred: "np.ndarray", obj: "np.ndarray", holdout_mod: int
) -> "np.ndarray":
    """Content-addressed holdout mask (md5 of the triple, like the
    hash-Bernoulli sampling that replaced the reference's order-dependent
    RNG, utils_re.py:237): ~1/holdout_mod of the distinct triples."""
    return _transe_md5_idx(
        [f"{a}|{b}|{c}|holdout" for a, b, c in zip(subj, pred, obj)], holdout_mod
    ) == 0


def transe_eval_serial(
    spo: pd.DataFrame,
    dim: int = 8,
    epochs: int = 12,
    lr: float = 0.1,
    margin: float = 1.0,
    holdout_mod: int = 5,
) -> pd.DataFrame:
    """Serial spec of the TransE link-prediction evaluation (Bordes 2013
    §4 'raw' setting): hold out a content-addressed ~1/holdout_mod of the
    distinct triples, train on the rest, rank each held-out true object
    against the full trained object vocabulary. The fixture oracle path."""
    import numpy as np

    spo = (
        spo[["subj", "pred", "obj"]]
        .drop_duplicates()
        .sort_values(["subj", "pred", "obj"])
        .reset_index(drop=True)
    )
    subj = spo["subj"].to_numpy(dtype=object)
    pred = spo["pred"].to_numpy(dtype=object)
    obj = spo["obj"].to_numpy(dtype=object)
    is_test = _transe_is_test(subj, pred, obj, holdout_mod)
    train = spo.loc[~is_test]
    ents, rels, W, _ = transe(
        train, dim=dim, epochs=epochs, lr=lr, margin=margin, return_raw=True
    )
    cand = np.unique(train["obj"].to_numpy(dtype=object))
    cand_rows = np.searchsorted(ents, cand)
    ts, tp, to = subj[is_test], pred[is_test], obj[is_test]
    ok = _in_sorted(ents, ts) & _in_sorted(rels, tp) & _in_sorted(cand, to)
    n_skipped = int((~ok).sum())
    s = np.searchsorted(ents, ts[ok])
    p = len(ents) + np.searchsorted(rels, tp[ok])
    ti = np.searchsorted(cand, to[ok])
    hist = _transe_rank_hist(s, p, ti, W, cand_rows)
    return _transe_metrics(hist, n_skipped)


def transe_eval(
    triples: "ray.data.Dataset",
    dim: int = 8,
    epochs: int = 12,
    lr: float = 0.1,
    margin: float = 1.0,
    holdout_mod: int = 5,
    num_partitions: int = 16,
) -> pd.DataFrame:
    """Distributed TransE link-prediction evaluation — bit-identical to
    :func:`transe_eval_serial` at any parallelism.

    The holdout mask is content-addressed per distinct triple, the trained
    weights come from :func:`transe_train` (bit-exact by the
    integer-coefficient contract), and the eval pass is one streamed
    ``map_batches`` over the held-out rows emitting per-block INTEGER rank
    histograms against the broadcast (vocab-bounded) weight matrix —
    candidate objects AND rows stream in chunks inside the kernel, so
    per-task memory is O(row_chunk x chunk x dim) regardless of block or
    vocabulary size."""
    import numpy as np

    from ..functions.broadcast import bget

    spo_schema = pa.schema(
        [("subj", pa.string()), ("pred", pa.string()), ("obj", pa.string())]
    )

    def distinct_part(t: pa.Table) -> pa.Table:
        df = t.to_pandas().drop_duplicates().sort_values(["subj", "pred", "obj"])
        return pa.Table.from_pandas(df, preserve_index=False).cast(spo_schema)

    reduced = groupby_partition(
        triples.map_batches(
            lambda t: t.select(["subj", "pred", "obj"]), batch_format="pyarrow"
        ),
        "subj",
        distinct_part,
        num_partitions=num_partitions,
        schema=spo_schema,
    ).materialize()

    def split(t: pa.Table, want_test: bool) -> pa.Table:
        subj = np.asarray(t["subj"].combine_chunks().cast(pa.string()), dtype=object)
        pred = np.asarray(t["pred"].combine_chunks().cast(pa.string()), dtype=object)
        obj = np.asarray(t["obj"].combine_chunks().cast(pa.string()), dtype=object)
        mask = _transe_is_test(subj, pred, obj, holdout_mod)
        return t.filter(pa.array(mask if want_test else ~mask))

    train_ds = reduced.map_batches(
        lambda t: split(t, False), batch_format="pyarrow", batch_size=None
    )
    ents, rels, W, _ = transe_train(
        train_ds, dim=dim, epochs=epochs, lr=lr, margin=margin,
        num_partitions=num_partitions, return_raw=True,
    )

    def cand_partial(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        tr = split(t, False)
        return pa.table(
            {"obj": pc.unique(tr["obj"].combine_chunks().cast(pa.string()))}
        )

    cp = reduced.map_batches(cand_partial, batch_format="pyarrow").to_pandas()
    cand = (
        np.unique(cp["obj"].to_numpy(dtype=object))
        if "obj" in cp.columns
        else np.array([], dtype=object)
    )
    cand_rows = np.searchsorted(ents, cand)
    state_ref = ray.put((ents, rels, cand, cand_rows, W))

    def eval_partial(t: pa.Table) -> pa.Table:
        ev, rv, cv, crows, Wb = bget(state_ref)
        te = split(t, True)
        ts = np.asarray(te["subj"].combine_chunks().cast(pa.string()), dtype=object)
        tp = np.asarray(te["pred"].combine_chunks().cast(pa.string()), dtype=object)
        to = np.asarray(te["obj"].combine_chunks().cast(pa.string()), dtype=object)
        ok = _in_sorted(ev, ts) & _in_sorted(rv, tp) & _in_sorted(cv, to)
        s = np.searchsorted(ev, ts[ok])
        p = len(ev) + np.searchsorted(rv, tp[ok])
        ti = np.searchsorted(cv, to[ok])
        hist = _transe_rank_hist(s, p, ti, Wb, crows)
        nz = np.nonzero(hist)[0]
        return pa.table(
            {
                "rank": pa.array(
                    np.concatenate([[-1], nz]).astype(np.int64), pa.int64()
                ),
                "n": pa.array(
                    np.concatenate(
                        [[int((~ok).sum())], hist[nz]]
                    ).astype(np.int64),
                    pa.int64(),
                ),
            }
        )

    parts = reduced.map_batches(
        eval_partial, batch_format="pyarrow", batch_size=None
    ).to_pandas()
    hist = np.zeros(len(cand) + 1, dtype=np.int64)
    n_skipped = 0
    if not parts.empty and "rank" in parts.columns:
        ranks = parts["rank"].to_numpy(dtype=np.int64)
        ns = parts["n"].to_numpy(dtype=np.int64)
        skip = ranks == -1
        n_skipped = int(ns[skip].sum())
        np.add.at(hist, ranks[~skip], ns[~skip])
    return _transe_metrics(hist, n_skipped)


def kb_support_pairs(
    triples: "ray.data.Dataset", min_support: int = 3
) -> "pd.DataFrame":
    """Support-filtered knowledge-base pairs for distant supervision.

    One block-combiner pass reduces the triple stream to distinct
    (subj, pred, obj, n_docs) partials (vocabulary-bounded for a closed
    ontology; an open KB would finish with a groupby on the same
    partials instead of the driver merge). Keeps (lower(subj),
    lower(obj)) pairs supported by >= ``min_support`` docs, labeled with
    the lexicographically-min pred (deterministic when a pair maps to
    several predicates).
    """
    import numpy as np  # noqa: F401  (parity with sibling kernels)

    def partial(t: pa.Table) -> pa.Table:
        g = t.select(["subj", "pred", "obj"]).group_by(
            ["subj", "pred", "obj"], use_threads=False
        ).aggregate([([], "count_all")])
        return g.rename_columns(["subj", "pred", "obj", "n"])

    parts = triples.map_batches(partial, batch_format="pyarrow").to_pandas()
    if parts.empty:
        return pd.DataFrame(
            {"subj": pd.Series([], dtype=str), "obj": pd.Series([], dtype=str),
             "pred": pd.Series([], dtype=str)}
        )
    full = parts.groupby(["subj", "pred", "obj"], as_index=False)["n"].sum()
    full = full[full["n"] >= min_support]
    full["subj"] = full["subj"].str.lower()
    full["obj"] = full["obj"].str.lower()
    kb = full.groupby(["subj", "obj"], as_index=False)["pred"].min()
    return kb.reset_index(drop=True)


def distant_supervision(
    ment: "ray.data.Dataset",
    kb: "pd.DataFrame",
    subj_type: str = "Drug",
    na_mod: int = 10,
    doc_complete: bool = False,
) -> "pd.DataFrame":
    """Mintz-style distant supervision: label co-occurring entity pairs
    with a KB predicate (training-data generation for relation
    extraction; Mintz et al. 2009, ACL).

    For every document, each distinct subject-type mention is paired
    with each distinct other-type mention; a pair whose lowercased
    surfaces appear in the KB gets that predicate as its silver label,
    every other pair is a negative ('NA') and is deterministically
    downsampled to 1/``na_mod`` by a content-addressed md5 coin (same
    md5 dialect as the sampling kernels, so the SQL oracle reproduces
    the exact row set).

    Scale shape: the KB is vocabulary-bounded and broadcast once via
    ``ray.put`` (read per actor, not re-shipped per batch); the pair
    emission is ONE doc-keyed partition pass (``doc_complete=True``
    declares the mentions-blocks-hold-whole-docs invariant of
    stages.mentions.detect, skipping the shuffle — same contract as
    ``cooccurrence_counts``). Output rows stream from the pass; no
    driver-side joins. Reference anchor: the candidate-pair semantics
    mirror the reference's RE candidate generation
    (/root/reference/generate_data.py pairing of drug mentions with
    attribute mentions), re-expressed as a distributed silver-labeling
    operator.
    """
    import hashlib

    import numpy as np

    import ray

    from ..functions.broadcast import bget

    kb_pred = dict(zip(zip(kb["subj"].astype(str), kb["obj"].astype(str)),
                       kb["pred"].astype(str)))
    kb_ref = ray.put(kb_pred)

    schema = pa.schema(
        [("doc_id", pa.string()), ("subj", pa.string()),
         ("obj_type", pa.string()), ("obj", pa.string()),
         ("label", pa.string())]
    )

    def label_pairs(df: "pd.DataFrame") -> "pd.DataFrame":
        preds = bget(kb_ref)
        de = pd.DataFrame(
            {"doc_id": df["doc_id"].astype(str),
             "ent_type": df["ent_type"].astype(str),
             "surf": df["text"].astype(str)}
        ).drop_duplicates()
        subs = de[de["ent_type"] == subj_type][["doc_id", "surf"]]
        objs = de[de["ent_type"] != subj_type]
        cand = subs.merge(objs, on="doc_id", suffixes=("_s", "_o"))
        if cand.empty:
            return pd.DataFrame(
                {"doc_id": pd.Series([], dtype=str),
                 "subj": pd.Series([], dtype=str),
                 "obj_type": pd.Series([], dtype=str),
                 "obj": pd.Series([], dtype=str),
                 "label": pd.Series([], dtype=str)}
            )
        sl = cand["surf_s"].str.lower().to_numpy()
        ol = cand["surf_o"].str.lower().to_numpy()
        labels = np.array(
            [preds.get((a, b), "NA") for a, b in zip(sl, ol)], dtype=object
        )
        # deterministic 1/na_mod negative downsampling (md5 coin)
        coins = np.array(
            [
                int(hashlib.md5(k.encode("utf-8")).hexdigest()[:15], 16) % na_mod
                for k in (
                    cand["doc_id"] + "|" + cand["surf_s"] + "|" + cand["surf_o"]
                )
            ],
            dtype=np.int64,
        )
        keep = (labels != "NA") | (coins == 0)
        out = pd.DataFrame(
            {"doc_id": cand["doc_id"].to_numpy()[keep],
             "subj": cand["surf_s"].to_numpy()[keep],
             "obj_type": cand["ent_type"].to_numpy()[keep],
             "obj": cand["surf_o"].to_numpy()[keep],
             "label": labels[keep]}
        )
        return out.astype(str)

    if doc_complete:
        parts = ment.map_batches(
            label_pairs, batch_format="pandas", batch_size=None
        ).to_pandas()
    else:
        parts = groupby_partition(
            ment, "doc_id", label_pairs, batch_format="pandas", schema=schema
        ).to_pandas()
    if parts.empty:
        return pd.DataFrame(
            {"doc_id": pd.Series([], dtype=str), "subj": pd.Series([], dtype=str),
             "obj_type": pd.Series([], dtype=str), "obj": pd.Series([], dtype=str),
             "label": pd.Series([], dtype=str)}
        )
    return (
        parts.sort_values(["doc_id", "subj", "obj_type", "obj"])
        .reset_index(drop=True)
    )
