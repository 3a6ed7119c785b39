"""Node-neighborhood operators for GNN-style training data over the KG.

A production KG feeds graph learning: GraphSAGE-style minibatch training
needs deterministic bounded-fanout neighbor samples, SGC/LightGCN-style
models need k-hop feature propagation, and entity cards / retrieval
contexts need per-entity fact summaries. The reference stops at drawing
per-note relation tables (ehr.py:538-618); these are the training-data
extensions, each expressed as hash-partitioned Dataset passes:

- :func:`neighbor_sample` — per-node top-k neighbor sample ranked by a
  content hash (md5 of the directed pair), two hops. Hop 1 is ONE
  node-keyed partition pass (a node's distinct neighbor list is
  partition-complete); hop 2 joins the sampled frontier against the
  per-node samples with ONE mid-node-keyed exchange. No randomness —
  the md5 rank makes the sample reproducible at any parallelism and
  SQL-mirrorable (DuckDB ``md5``).
- :func:`feature_propagation` — 2-hop feature SpMV. Features are hex
  digits of ``md5(node)`` (deterministic, derivable from the node name
  itself, so hop 1 needs NO join); hop 2 attaches the hop-1 partials to
  edges keyed by the neighbor and re-aggregates keyed by the node. All
  aggregation is INTEGER sums (path counts and feature sums), so the
  result is bit-exact at any partition count and against the SQL
  oracle; the single final division happens per output row.
- :func:`entity_summary` — per-entity top-k rarest facts: global
  (pred, obj) fact frequencies via block partials merged on the driver
  (attribute-vocabulary-bounded), broadcast once, then ONE subject-keyed
  partition pass ranks each entity's distinct facts by (frequency,
  pred, obj) and keeps k. Rarity ranking = the IDF heuristic used for
  entity-card summarization.

At 10^12 turns: every exchange is keyed by node / pair values already
reduced to the entity-attribute vocabulary; payload text never moves.

Each operator has a Dataset-out variant (``neighbor_sample_ds``,
``feature_propagation_ds``, ``entity_summary_ds``) — the stage form a
downstream writer / trainer consumes without a driver materialize; the
pandas-returning functions are the bounded-output query contract
(``.to_pandas()`` + deterministic sort of the Dataset variant, pinned
equal by tests/test_neighborhood_kgstore.py).
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd
import pyarrow as pa

import ray
import ray.data

from ..functions import rounds
from ..functions.partitioning import groupby_partition

# rank/feature separator: never occurs in canonical entity strings
_SEP = "\x1f"

_HEX = "0123456789abcdef"


def _md5_rank(a: pd.Series, b: pd.Series) -> list[str]:
    return [
        hashlib.md5(f"{x}{_SEP}{y}".encode("utf-8", "surrogatepass")).hexdigest()
        for x, y in zip(a, b)
    ]


def undirected_edges(triples: "ray.data.Dataset") -> "ray.data.Dataset":
    """Block-local distinct symmetrized (v, u) rows from (subj, obj).

    Per-block dedup only — exact global dedup happens inside whichever
    node-keyed partition pass consumes the rows (same key, same
    partition), so no extra exchange is spent here.
    """

    def both(df: pd.DataFrame) -> pd.DataFrame:
        e = df[["subj", "obj"]].drop_duplicates()
        out = pd.DataFrame(
            {
                "v": np.concatenate([e["subj"].to_numpy(), e["obj"].to_numpy()]),
                "u": np.concatenate([e["obj"].to_numpy(), e["subj"].to_numpy()]),
            }
        ).drop_duplicates()
        return out.astype({"v": str, "u": str})

    return triples.select_columns(["subj", "obj"]).map_batches(
        both, batch_format="pandas"
    )


def _per_node_samples(
    edges: "ray.data.Dataset", max_k: int
) -> "ray.data.Dataset":
    """(v, u, r) rows: each node's distinct neighbors ranked 1..max_k by
    md5(v, u). One v-keyed partition pass; global dedup is exact there."""
    schema = pa.schema(
        [("v", pa.string()), ("u", pa.string()), ("r", pa.int64())]
    )

    def sample(part: pd.DataFrame) -> pd.DataFrame:
        df = part.drop_duplicates(["v", "u"]).copy()
        if df.empty:
            return pd.DataFrame(
                {"v": pd.Series([], dtype=str), "u": pd.Series([], dtype=str),
                 "r": pd.Series([], dtype="int64")})
        df["rk"] = _md5_rank(df["v"], df["u"])
        df = df.sort_values(["v", "rk"], kind="stable")
        df["r"] = df.groupby("v", sort=False).cumcount() + 1
        df = df[df["r"] <= max_k]
        out = df[["v", "u", "r"]].reset_index(drop=True)
        out["r"] = out["r"].astype("int64")
        return out

    return groupby_partition(
        edges, "v", sample, batch_format="pandas", schema=schema
    )


def neighbor_sample_ds(
    triples: "ray.data.Dataset", k1: int = 3, k2: int = 2
) -> "ray.data.Dataset":
    """Dataset-out two-hop deterministic fanout sample (round-3 VERDICT
    item 5): the same keyed exchanges as :func:`neighbor_sample` — which
    is just ``.to_pandas()`` + sort of this — but the (seed, hop, src,
    dst) rows stay in the object store, so a downstream GraphSAGE
    feature join / writer consumes them without a driver materialize.
    """
    samples = _per_node_samples(
        undirected_edges(triples), max_k=max(k1, k2)
    ).materialize()
    out_schema = pa.schema(
        [("seed", pa.string()), ("hop", pa.int64()),
         ("src", pa.string()), ("dst", pa.string())]
    )
    # empty corpus: map_batches skips the UDF on empty blocks, so the
    # stale (v, u, r) schema would survive into the union (the
    # divergent-schema poison groupby_partition's docstring warns about)
    if samples.count() == 0:
        return ray.data.from_arrow(out_schema.empty_table())

    # Empty h1 blocks (k1=0, or any zero-row filtered block) skip every
    # downstream UDF and keep the stale (v, u, r) schema — the
    # divergent-schema poison that breaks both unions below (ADVICE r4).
    # Pin hop-1 once with empties dropped (rounds.block_refs); both the
    # tagged exchange and the final union read the pinned refs.
    h1_refs = rounds.block_refs(samples.filter(expr=f"r <= {k1}").materialize())
    if not h1_refs:
        # no hop-1 frontier -> no hop-2 expansion either
        return ray.data.from_arrow(out_schema.empty_table())
    h1 = ray.data.from_arrow_refs(h1_refs)

    def as_hop1(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {"seed": df["v"].astype(str),
             "hop": np.full(len(df), 1, dtype=np.int64),
             "src": df["v"].astype(str), "dst": df["u"].astype(str)})

    # same pinning for s2: a block whose rows ALL have r > k2 would skip
    # tag_s2 and push a stale-schema empty block into the tagged union
    s2_refs = rounds.block_refs(samples.filter(expr=f"r <= {k2}").materialize())
    if not s2_refs:
        # no per-node hop-2 samples -> result is hop-1 only
        return h1.map_batches(as_hop1, batch_format="pandas")
    s2 = ray.data.from_arrow_refs(s2_refs)

    # hop-2 join keyed on the frontier node: tag hop-1 rows by their mid
    # node u, per-node samples by their own node v — one exchange.
    def tag_h1(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {"key": df["u"].astype(str), "a": df["v"].astype(str),
             "b": df["u"].astype(str), "tag": np.int8(0)})

    def tag_s2(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {"key": df["v"].astype(str), "a": df["v"].astype(str),
             "b": df["u"].astype(str), "tag": np.int8(1)})

    tagged = h1.map_batches(tag_h1, batch_format="pandas").union(
        s2.map_batches(tag_s2, batch_format="pandas")
    )
    schema = pa.schema(
        [("seed", pa.string()), ("hop", pa.int64()),
         ("src", pa.string()), ("dst", pa.string())]
    )

    def expand(part: pd.DataFrame) -> pd.DataFrame:
        left = part[part["tag"] == 0]
        right = part[part["tag"] == 1]
        if left.empty or right.empty:
            return pd.DataFrame(
                {"seed": pd.Series([], dtype=str),
                 "hop": pd.Series([], dtype="int64"),
                 "src": pd.Series([], dtype=str),
                 "dst": pd.Series([], dtype=str)})
        j = left[["key", "a"]].merge(
            right[["key", "b"]], on="key", how="inner"
        )
        return pd.DataFrame(
            {"seed": j["a"].astype(str), "hop": np.int64(2),
             "src": j["key"].astype(str), "dst": j["b"].astype(str)})

    hop2 = groupby_partition(
        tagged, "key", expand, batch_format="pandas", schema=schema
    )

    # h1 is non-empty-block-pinned above, so as_hop1 runs on every block
    # and the union's schemas agree.
    hop1 = h1.map_batches(as_hop1, batch_format="pandas")
    return hop1.union(hop2)


def neighbor_sample(
    triples: "ray.data.Dataset", k1: int = 3, k2: int = 2
) -> pd.DataFrame:
    """Two-hop deterministic fanout sample over the symmetrized KG.

    Returns (seed, hop, src, dst): hop-1 rows are each seed's top-k1
    neighbors by md5 rank; hop-2 rows expand every sampled frontier node
    by ITS top-k2 sample (GraphSAGE layer semantics: one sample per node
    per layer, shared across seeds — the form that keeps the exchange
    node-keyed instead of (seed x node)-keyed at scale). Bounded-output
    query contract over :func:`neighbor_sample_ds`.
    """
    out = neighbor_sample_ds(triples, k1=k1, k2=k2).to_pandas()
    if out.empty:
        return pd.DataFrame(
            {"seed": pd.Series([], dtype=str),
             "hop": pd.Series([], dtype="int64"),
             "src": pd.Series([], dtype=str),
             "dst": pd.Series([], dtype=str)})
    out["hop"] = out["hop"].astype("int64")
    return out.sort_values(["seed", "hop", "src", "dst"]).reset_index(drop=True)


def _hex_features(names: pd.Series, dims: int) -> np.ndarray:
    """dims integer features per name: hex digits 1..dims of md5(name)."""
    out = np.empty((len(names), dims), dtype=np.int64)
    for i, s in enumerate(names):
        h = hashlib.md5(str(s).encode("utf-8", "surrogatepass")).hexdigest()
        for j in range(dims):
            out[i, j] = _HEX.index(h[j])
    return out


def feature_propagation_ds(
    triples: "ray.data.Dataset", dims: int = 4
) -> "ray.data.Dataset":
    """Dataset-out 2-hop random-walk feature expectation over the
    symmetrized KG (:func:`feature_propagation` = ``.to_pandas()`` +
    sort of this; the per-row division happens in a final map_batches,
    so the propagated features stream straight into a writer / trainer
    at scale).

    Features x_j(v) = j-th hex digit of md5(v) (integers 0..15). Hop 1
    computes per node the integer sums S1_j(v) = sum_{u in N(v)} x_j(u)
    and the degree c1(v) = |N(v)| in ONE v-keyed pass (features derive
    from the neighbor NAME, so no join). Hop 2 attaches (c1, S1) to
    edges keyed by the neighbor and re-aggregates by the node: c2(v) =
    sum deg(u) (2-step path count), S2_j(v) = sum S1_j(u). Output
    f_j = round(S2_j / c2, 6) — the mean feature over all 2-step walks
    from v. Integer aggregation end-to-end: bit-exact at any partition
    count and vs the SQL oracle.
    """
    edges = undirected_edges(triples)
    s_cols = [f"s{j + 1}" for j in range(dims)]
    h1_schema = pa.schema(
        [("v", pa.string()), ("c1", pa.int64())]
        + [(c, pa.int64()) for c in s_cols]
    )

    def hop1(part: pd.DataFrame) -> pd.DataFrame:
        df = part.drop_duplicates(["v", "u"])
        if df.empty:
            return pd.DataFrame(
                {"v": pd.Series([], dtype=str),
                 "c1": pd.Series([], dtype="int64"),
                 **{c: pd.Series([], dtype="int64") for c in s_cols}})
        feats = _hex_features(df["u"], dims)
        agg = pd.DataFrame({"v": df["v"].to_numpy()})
        agg["c1"] = 1
        for j, c in enumerate(s_cols):
            agg[c] = feats[:, j]
        out = agg.groupby("v", as_index=False).sum()
        for c in ["c1"] + s_cols:
            out[c] = out[c].astype("int64")
        return out

    h1 = groupby_partition(
        edges, "v", hop1, batch_format="pandas", schema=h1_schema
    ).materialize()
    # empty corpus: short-circuit with the OUTPUT schema (the divide
    # map_batches would be skipped on empty blocks, leaking h2's schema)
    if h1.count() == 0:
        return ray.data.from_arrow(
            pa.schema(
                [("node", pa.string()), ("n_paths", pa.int64())]
                + [(f"f{j + 1}", pa.float64()) for j in range(dims)]
            ).empty_table()
        )

    # hop 2: tagged union keyed on the neighbor u — edge rows carry the
    # aggregation target v, h1 rows carry the neighbor's partial sums.
    def tag_edge(df: pd.DataFrame) -> pd.DataFrame:
        e = df.drop_duplicates(["v", "u"])
        out = pd.DataFrame({"key": e["u"].astype(str), "v": e["v"].astype(str)})
        out["c1"] = np.int64(0)
        for c in s_cols:
            out[c] = np.int64(0)
        out["tag"] = np.int8(0)
        return out

    def tag_h1(df: pd.DataFrame) -> pd.DataFrame:
        out = pd.DataFrame({"key": df["v"].astype(str), "v": ""})
        out["c1"] = df["c1"].astype("int64").to_numpy()
        for c in s_cols:
            out[c] = df[c].astype("int64").to_numpy()
        out["tag"] = np.int8(1)
        return out

    tagged = edges.map_batches(tag_edge, batch_format="pandas").union(
        h1.map_batches(tag_h1, batch_format="pandas")
    )
    h2_schema = pa.schema(
        [("v", pa.string()), ("c2", pa.int64())]
        + [(c, pa.int64()) for c in s_cols]
    )

    def hop2(part: pd.DataFrame) -> pd.DataFrame:
        e = part[part["tag"] == 0].drop_duplicates(["key", "v"])
        s = part[part["tag"] == 1]
        if e.empty or s.empty:
            return pd.DataFrame(
                {"v": pd.Series([], dtype=str),
                 "c2": pd.Series([], dtype="int64"),
                 **{c: pd.Series([], dtype="int64") for c in s_cols}})
        j = e[["key", "v"]].merge(
            s[["key", "c1"] + s_cols], on="key", how="inner"
        )
        out = j.groupby("v", as_index=False)[["c1"] + s_cols].sum()
        out = out.rename(columns={"c1": "c2"})
        for c in ["c2"] + s_cols:
            out[c] = out[c].astype("int64")
        return out

    # partials per partition are exact: a node v's edges may span
    # partitions (keyed by u), so sum the per-partition partials with one
    # final v-keyed size-aware exchange.
    partials = groupby_partition(
        tagged, "key", hop2, batch_format="pandas", schema=h2_schema
    )

    def final_sum(df: pd.DataFrame) -> pd.DataFrame:
        out = df.groupby("v", as_index=False)[["c2"] + s_cols].sum()
        for c in ["c2"] + s_cols:
            out[c] = out[c].astype("int64")
        return out

    merged = groupby_partition(
        partials, "v", final_sum, batch_format="pandas", schema=h2_schema,
        size_aware=True,
    )
    out_schema = pa.schema(
        [("node", pa.string()), ("n_paths", pa.int64())]
        + [(f"f{j + 1}", pa.float64()) for j in range(dims)]
    )

    def divide(df: pd.DataFrame) -> pd.DataFrame:
        out = pd.DataFrame({"node": df["v"].astype(str)})
        out["n_paths"] = df["c2"].astype("int64")
        for j, c in enumerate(s_cols):
            out[f"f{j + 1}"] = np.round(
                df[c].to_numpy(dtype="float64")
                / df["c2"].to_numpy(dtype="float64"),
                6,
            )
        return pa.Table.from_pandas(
            out, schema=out_schema, preserve_index=False
        )

    return merged.map_batches(divide, batch_format="pandas")


def feature_propagation(
    triples: "ray.data.Dataset", dims: int = 4
) -> pd.DataFrame:
    """Bounded-output query contract over :func:`feature_propagation_ds`
    (see there for the distributed shape)."""
    out = feature_propagation_ds(triples, dims=dims).to_pandas()
    if out.empty:
        return pd.DataFrame(
            {"node": pd.Series([], dtype=str),
             "n_paths": pd.Series([], dtype="int64"),
             **{f"f{j + 1}": pd.Series([], dtype="float64")
                for j in range(dims)}})
    out["n_paths"] = out["n_paths"].astype("int64")
    return out.sort_values("node").reset_index(drop=True)


ENTITY_SUMMARY_BROADCAST_LIMIT = 2_000_000


def entity_summary_ds(
    triples: "ray.data.Dataset", k: int = 5,
    broadcast_limit: "int | None" = None,
) -> "ray.data.Dataset":
    """Dataset-out top-k rarest facts per entity
    (:func:`entity_summary` = ``.to_pandas()`` + sort of this).

    Fact frequency = number of DISTINCT subjects holding the same
    (pred, obj); rarer facts are more informative (IDF heuristic).
    SIZE-SWITCHED like dedupe.verify_jaccard: when the distinct fact
    table is small (<= ``broadcast_limit`` rows) frequencies come from
    per-block partials merged on the driver and ``ray.put`` once; above
    the limit the whole computation stays keyed: one (pred, obj)
    exchange sums the frequencies, one SALTED (pred, obj, subj-hash)
    co-group attaches them to the facts (hot facts spread over the salt
    shards instead of funnelling one partition), and the final
    subject-keyed pass ranks — zero driver state. The switch compares
    the distinct (subj, pred, obj) ROW count, deliberately a safe upper
    bound of the (pred, obj) vocabulary: rows <= limit PROVES the
    broadcast dict fits, and any corpus it misroutes to the co-group
    path is still handled exactly (just without the broadcast
    shortcut) because the salted attach has no skew funnel. Both paths
    are pinned equal by tests.
    """
    proj = triples.select_columns(["subj", "pred", "obj"])

    def fact_partial(df: pd.DataFrame) -> pd.DataFrame:
        d = df.drop_duplicates()
        out = (
            d.groupby(["pred", "obj"], sort=False).size()
            .rename("n").reset_index()
        )
        out["n"] = out["n"].astype("int64")
        return out

    # per-subject dedup must be global before counting subjects per fact:
    # key by subj so each subject's facts dedup exactly once
    def subj_dedup(df: pd.DataFrame) -> pd.DataFrame:
        return df.drop_duplicates()

    dd_schema = pa.schema(
        [("subj", pa.string()), ("pred", pa.string()), ("obj", pa.string())]
    )
    distinct_facts = groupby_partition(
        proj, "subj", subj_dedup, batch_format="pandas", schema=dd_schema
    ).materialize()
    empty_schema = pa.schema(
        [("subj", pa.string()), ("pred", pa.string()), ("obj", pa.string()),
         ("fact_freq", pa.int64()), ("rk", pa.int64())]
    )
    out_schema = empty_schema
    n_facts = distinct_facts.count()
    if n_facts == 0:
        return ray.data.from_arrow(empty_schema.empty_table())
    limit = (
        ENTITY_SUMMARY_BROADCAST_LIMIT
        if broadcast_limit is None else broadcast_limit
    )

    def _rank(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(
            ["subj", "fact_freq", "pred", "obj"], kind="stable"
        )
        df["rk"] = df.groupby("subj", sort=False).cumcount() + 1
        df = df[df["rk"] <= k]
        for c in ("fact_freq", "rk"):
            df[c] = df[c].astype("int64")
        return df[["subj", "pred", "obj", "fact_freq", "rk"]]

    if n_facts <= limit:
        # broadcast path: driver merge is fact-vocabulary-bounded here
        parts = distinct_facts.map_batches(
            fact_partial, batch_format="pandas", batch_size=None
        ).to_pandas()
        freq = parts.groupby(["pred", "obj"], as_index=False)["n"].sum()
        freq_ref = ray.put(
            dict(zip(zip(freq["pred"], freq["obj"]), freq["n"].astype(int)))
        )

        def topk(part: pd.DataFrame) -> pd.DataFrame:
            fr = ray.get(freq_ref)
            df = part.drop_duplicates().copy()
            if df.empty:
                return pd.DataFrame(
                    {"subj": pd.Series([], dtype=str),
                     "pred": pd.Series([], dtype=str),
                     "obj": pd.Series([], dtype=str),
                     "fact_freq": pd.Series([], dtype="int64"),
                     "rk": pd.Series([], dtype="int64")})
            df["fact_freq"] = [
                fr[(p, o)] for p, o in zip(df["pred"], df["obj"])
            ]
            return _rank(df)

        return groupby_partition(
            distinct_facts, "subj", topk,
            batch_format="pandas", schema=out_schema,
        )

    # co-group path: frequencies and their attachment both stay keyed;
    # no driver state at any size. The frequency pass is SEPARATE from
    # the attach (not a transform('size') inside one (pred, obj)
    # partition) precisely so the attach can be SALTED: fact rows key on
    # (pred, obj, hash(subj) % salts) and the vocabulary-sized freq rows
    # replicate to every salt — a hot fact held by millions of subjects
    # spreads over ``salts`` partitions instead of funnelling one.
    n_salts = 16
    freq_schema = pa.schema(
        [("pred", pa.string()), ("obj", pa.string()), ("n", pa.int64())]
    )
    freq_ds = groupby_partition(
        distinct_facts.map_batches(fact_partial, batch_format="pandas"),
        ["pred", "obj"],
        lambda df: df.groupby(["pred", "obj"], as_index=False)["n"]
        .sum().astype({"n": "int64"}),
        batch_format="pandas", schema=freq_schema,
    )
    def tag_fact(df: pd.DataFrame) -> pd.DataFrame:
        from ..functions.textstats import content_hash_64

        out = df[["subj", "pred", "obj"]].copy()
        out["n"] = np.int64(0)
        # column is already string-typed: tolist() avoids a per-row
        # str() round-trip (the partitioning.py _col_hash lesson)
        h = content_hash_64(out["subj"].tolist())
        out["salt"] = (h % np.uint64(n_salts)).astype(np.int32)
        out["fkind"] = np.int8(0)
        return out

    def tag_freq(df: pd.DataFrame) -> pd.DataFrame:
        base = pd.DataFrame(
            {"subj": "", "pred": df["pred"].astype(str),
             "obj": df["obj"].astype(str),
             "n": df["n"].astype("int64").to_numpy()})
        # replicate each vocab-sized freq row to every salt shard
        rep = base.loc[base.index.repeat(n_salts)].reset_index(drop=True)
        rep["salt"] = np.tile(
            np.arange(n_salts, dtype=np.int32), len(base)
        )
        rep["fkind"] = np.int8(1)
        return rep[["subj", "pred", "obj", "n", "salt", "fkind"]]

    tagged = distinct_facts.map_batches(
        tag_fact, batch_format="pandas"
    ).union(freq_ds.map_batches(tag_freq, batch_format="pandas"))
    attach_schema = pa.schema(
        [("subj", pa.string()), ("pred", pa.string()), ("obj", pa.string()),
         ("fact_freq", pa.int64())]
    )

    def attach(part: pd.DataFrame) -> pd.DataFrame:
        fa = part[part["fkind"] == 0]
        fr = part[part["fkind"] == 1].drop_duplicates(["pred", "obj"])
        if fa.empty or fr.empty:
            return pd.DataFrame(
                {"subj": pd.Series([], dtype=str),
                 "pred": pd.Series([], dtype=str),
                 "obj": pd.Series([], dtype=str),
                 "fact_freq": pd.Series([], dtype="int64")})
        j = fa[["subj", "pred", "obj"]].merge(
            fr[["pred", "obj", "n"]], on=["pred", "obj"], how="inner"
        ).rename(columns={"n": "fact_freq"})
        j["fact_freq"] = j["fact_freq"].astype("int64")
        return j

    attached = groupby_partition(
        tagged, ["pred", "obj", "salt"], attach,
        batch_format="pandas", schema=attach_schema,
    )

    def topk_cg(part: pd.DataFrame) -> pd.DataFrame:
        if part.empty:
            return pd.DataFrame(
                {"subj": pd.Series([], dtype=str),
                 "pred": pd.Series([], dtype=str),
                 "obj": pd.Series([], dtype=str),
                 "fact_freq": pd.Series([], dtype="int64"),
                 "rk": pd.Series([], dtype="int64")})
        return _rank(part.drop_duplicates().copy())

    return groupby_partition(
        attached, "subj", topk_cg,
        batch_format="pandas", schema=out_schema,
    )


def entity_summary(
    triples: "ray.data.Dataset", k: int = 5
) -> pd.DataFrame:
    """Bounded-output query contract over :func:`entity_summary_ds`
    (see there for the distributed shape)."""
    out = entity_summary_ds(triples, k=k).to_pandas()
    if out.empty:
        return pd.DataFrame(
            {"subj": pd.Series([], dtype=str), "pred": pd.Series([], dtype=str),
             "obj": pd.Series([], dtype=str),
             "fact_freq": pd.Series([], dtype="int64"),
             "rk": pd.Series([], dtype="int64")})
    for c in ("fact_freq", "rk"):
        out[c] = out[c].astype("int64")
    return out.sort_values(["subj", "rk"]).reset_index(drop=True)
