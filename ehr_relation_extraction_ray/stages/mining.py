"""Association-rule mining over the KG's per-encounter attribute baskets.

"Which drug attribute-values co-occur within one clinical encounter?"
is the classic market-basket question asked of an extracted KG (e.g.
`Route:oral` co-occurring with `Form:tablet`); the reference stops at
drawing per-note relation tables (reference ehr.py:538-618). This stage
is the distributed A-priori shape:

- A basket is one (doc_id, subj) pair — the distinct ``pred:obj`` items
  attached to one entity inside one document. Baskets are doc-scoped,
  so their size is bounded by per-document extraction output, never by
  corpus size.
- Pass 1 (support counting): ONE (doc_id, subj)-keyed partition pass
  (groupby_partition — group-closed, exact) dedupes each basket's items
  and emits per-partition item partial counts plus a basket-count row.
  The driver merge is (item-vocabulary x partitions)-bounded; the item
  vocabulary is lexicon-bounded for this KG, and min_support prunes it
  further before any pair is formed.
- Frequent items are broadcast once (``ray.put``) — the A-priori
  downward-closure step that keeps pass 2's pair emission F-bounded per
  basket instead of D-bounded.
- Pass 2 (pair counting): the same partition key; each basket filters
  to frequent items, emits its C(f, 2) pairs, and partial-counts them
  within the partition. Baskets larger than ``max_basket_items`` after
  filtering emit an overflow record instead of silently truncating
  (house rule: caps are visible). A final size-aware (a, b)-keyed
  exchange sums the partials.
- Rules: both directions of every surviving pair, confidence and lift
  from the broadcast support table, thresholded by min_support (on the
  PAIR) and min_confidence.
"""

from __future__ import annotations

import math

import numpy as np
import pandas as pd
import pyarrow as pa

import ray

from ..functions.partitioning import groupby_partition

_BASKET_KEY = ["doc_id", "subj"]


def _basket_items(part: pd.DataFrame) -> pd.DataFrame:
    """Distinct items per basket of one partition (group-closed)."""
    df = part.copy()
    df["item"] = df["pred"] + ":" + df["obj"]
    return df[_BASKET_KEY + ["item"]].drop_duplicates()


def item_supports(triples: "ray.data.Dataset") -> tuple[pd.DataFrame, int]:
    """Exact item support counts and the basket count N.

    One (doc_id, subj)-keyed partition pass; each partition emits
    (item, n) partials plus one ``__baskets__`` row, merged on the
    driver — a (vocab x partitions)-bounded table.
    """
    schema = pa.schema([("item", pa.string()), ("n", pa.int64())])

    def partials(part: pd.DataFrame) -> pd.DataFrame:
        bi = _basket_items(part)
        counts = bi.groupby("item", sort=False).size().rename("n").reset_index()
        n_baskets = len(bi[_BASKET_KEY].drop_duplicates())
        counts = pd.concat(
            [counts, pd.DataFrame({"item": ["__baskets__"], "n": [n_baskets]})]
        )
        return counts

    raw = groupby_partition(
        triples.select_columns(_BASKET_KEY + ["pred", "obj"]),
        _BASKET_KEY,
        partials,
        batch_format="pandas",
        schema=schema,
    ).to_pandas()
    if raw.empty:  # zero-block to_pandas drops columns — re-pin them
        raw = pd.DataFrame(
            {"item": pd.Series([], dtype=str), "n": pd.Series([], dtype="int64")}
        )
    merged = raw.groupby("item", as_index=False)["n"].sum()
    n_baskets = int(merged.loc[merged["item"] == "__baskets__", "n"].sum())
    supports = merged[merged["item"] != "__baskets__"].reset_index(drop=True)
    supports["n"] = supports["n"].astype("int64")
    return supports, n_baskets


def assoc_rules(
    triples: "ray.data.Dataset",
    min_support: float = 0.02,
    min_confidence: float = 0.2,
    max_basket_items: int = 256,
) -> pd.DataFrame:
    """A-priori association rules over (doc_id, subj) attribute baskets.

    Returns (antecedent, consequent, n_both, support, confidence, lift)
    for every directed rule whose PAIR support >= min_support and
    confidence >= min_confidence, sorted by (antecedent, consequent).
    Oversized baskets contribute an ``__overflow__ -> <basket size>``
    row (n_both = dropped basket count) instead of silent truncation.
    """
    supports, n_baskets = item_supports(triples)
    if n_baskets == 0:
        return pd.DataFrame(
            {
                "antecedent": pd.Series([], dtype=str),
                "consequent": pd.Series([], dtype=str),
                "n_both": pd.Series([], dtype="int64"),
                "support": pd.Series([], dtype="float64"),
                "confidence": pd.Series([], dtype="float64"),
                "lift": pd.Series([], dtype="float64"),
            }
        )
    min_count = max(1, math.ceil(min_support * n_baskets))
    frequent = supports[supports["n"] >= min_count]
    # downward closure: a pair can only reach min_count if both items do
    freq_ref = ray.put(dict(zip(frequent["item"], frequent["n"].astype(int))))

    pair_schema = pa.schema(
        [("a", pa.string()), ("b", pa.string()), ("n", pa.int64())]
    )

    def pair_partials(part: pd.DataFrame) -> pd.DataFrame:
        freq = ray.get(freq_ref)
        bi = _basket_items(part)
        bi = bi[bi["item"].isin(freq)]
        out_a, out_b = [], []
        overflow = 0
        for _, items in bi.groupby(_BASKET_KEY, sort=False)["item"]:
            vals = np.sort(items.to_numpy())
            if len(vals) > max_basket_items:
                overflow += 1
                continue
            if len(vals) < 2:
                continue
            iu, ju = np.triu_indices(len(vals), k=1)
            out_a.append(vals[iu])
            out_b.append(vals[ju])
        if out_a:
            pairs = pd.DataFrame(
                {"a": np.concatenate(out_a), "b": np.concatenate(out_b)}
            )
            counts = (
                pairs.groupby(["a", "b"], sort=False).size().rename("n").reset_index()
            )
        else:
            counts = pd.DataFrame(
                {"a": pd.Series([], dtype=str), "b": pd.Series([], dtype=str),
                 "n": pd.Series([], dtype="int64")}
            )
        if overflow:
            counts = pd.concat(
                [counts, pd.DataFrame(
                    {"a": ["__overflow__"], "b": [f">{max_basket_items}"],
                     "n": [overflow]})]
            )
        return counts

    pair_partial_ds = groupby_partition(
        triples.select_columns(_BASKET_KEY + ["pred", "obj"]),
        _BASKET_KEY,
        pair_partials,
        batch_format="pandas",
        schema=pair_schema,
    )
    # the partials are (frequent-pair vocab x partitions)-bounded; the
    # final sum is one size-aware (a, b)-keyed exchange
    pair_counts = (
        groupby_partition(
            pair_partial_ds,
            ["a", "b"],
            lambda df: df.groupby(["a", "b"], as_index=False)["n"].sum(),
            batch_format="pandas",
            schema=pair_schema,
            size_aware=True,
        )
        .to_pandas()
    )

    overflow_rows = pair_counts[pair_counts["a"] == "__overflow__"].copy()
    pair_counts = pair_counts[pair_counts["a"] != "__overflow__"]
    pair_counts = pair_counts[pair_counts["n"] >= min_count]

    sup = dict(zip(supports["item"], supports["n"].astype(int)))
    rows = []
    for a, b, n_ab in pair_counts.itertuples(index=False):
        for ant, con in ((a, b), (b, a)):
            conf = n_ab / sup[ant]
            if conf < min_confidence:
                continue
            rows.append(
                {
                    "antecedent": ant,
                    "consequent": con,
                    "n_both": int(n_ab),
                    "support": n_ab / n_baskets,
                    "confidence": conf,
                    "lift": (n_ab * n_baskets) / (sup[ant] * sup[con]),
                }
            )
    out = pd.DataFrame(
        rows,
        columns=["antecedent", "consequent", "n_both", "support",
                 "confidence", "lift"],
    )
    if len(overflow_rows):
        overflow_rows = overflow_rows.rename(
            columns={"a": "antecedent", "b": "consequent", "n": "n_both"}
        )
        overflow_rows["support"] = 0.0
        overflow_rows["confidence"] = 0.0
        overflow_rows["lift"] = 0.0
        out = pd.concat([out, overflow_rows], ignore_index=True)
    out["n_both"] = out["n_both"].astype("int64")
    return out.sort_values(["antecedent", "consequent"]).reset_index(drop=True)


# -- share-predicate implication rules (AMIE-style over derived relations) --
#
# This KG is bipartite (entity -> attribute value; reference ehr.py
# get_relations emits drug -> Dosage/ADE/... edges only), so classic
# p1(x,y) ^ p2(y,z) => p3(x,z) horn rules have an empty body: no object
# ever re-appears as a subject. The AMIE-shaped mining that IS meaningful
# here runs over the DERIVED symmetric relations
#
#     share_p(x, z)  :=  EXISTS y . p(x, y) AND p(z, y)   (x < z)
#
# ("x and z share an attribute value under predicate p") and mines the
# implication rules  share_p1(x, z) => share_p2(x, z)  with support and
# confidence — e.g. "entity pairs sharing an ADE also share a Reason".
#
# Distributed shape:
#  - pass 1 keys distinct (pred, obj, subj) rows by ATTRIBUTE VALUE
#    (pred, obj) — a group's owner list is partition-complete, so the
#    C(d, 2) pair mesh is emitted locally, slab-chunked so memory stays
#    bounded for hot values (Form:tablet-style stopword attributes), with
#    a lineage row per hot group (caps are visible, never silent).
#  - pass 2 keys the emitted (p, x, z) candidates by the PAIR (x, z):
#    global dedup is exact there (same pair always lands together), and
#    the per-pair predicate set P emits |P| body partials + |P|^2 rule
#    partials — predicate-vocabulary-bounded, never corpus-bounded.
#  - the driver merge is P^2-sized.


def share_pairs(
    triples: "ray.data.Dataset",
    hot_threshold: int = 2048,
    slab_pairs: int = 4_000_000,
) -> "ray.data.Dataset":
    """Distinct share_p(x, z) candidate rows (kind=0) + lineage (kind=1).

    One (pred, obj)-keyed partition pass; each attribute-value group of
    d owners emits its C(d, 2) ordered pairs via flat index arithmetic
    (no per-group Python pair loop), sliced into ``slab_pairs`` slabs so
    a hot value never materializes its whole mesh at once. Rows are
    deduped per partition; exact global dedup happens in the pass-2
    (x, z) exchange of :func:`share_rules`.
    """
    schema = pa.schema(
        [("p", pa.string()), ("x", pa.string()), ("z", pa.string()),
         ("kind", pa.int8())]
    )

    def emit(part: pd.DataFrame) -> pd.DataFrame:
        df = part.drop_duplicates(["pred", "obj", "subj"])
        df = df.sort_values(["pred", "obj", "subj"], kind="stable")
        sizes = df.groupby(["pred", "obj"], sort=False).size().to_numpy()
        preds = df["pred"].to_numpy()
        subs = df["subj"].to_numpy()
        starts = np.cumsum(sizes) - sizes
        n_pairs = sizes * (sizes - 1) // 2
        total = int(n_pairs.sum())
        n_hot = int((sizes > hot_threshold).sum())
        frames = []
        if total:
            # flat pair enumeration: group g contributes C(sizes[g], 2)
            # (i < j) index pairs; all groups at once, slab by slab
            goff = np.cumsum(n_pairs) - n_pairs
            for lo in range(0, total, slab_pairs):
                hi = min(lo + slab_pairs, total)
                gsel = np.searchsorted(goff, np.arange(lo, hi), side="right") - 1
                within = np.arange(lo, hi) - goff[gsel]
                d = sizes[gsel]
                # row i of the upper triangle starts at i*d - i*(i+1)/2 - i
                # invert: i = d - 2 - floor((sqrt(8*(T-1-w)+1) - 1) / 2)
                # where T = C(d,2); cheaper exact form via quadratic solve
                t = d * (d - 1) // 2
                rev = t - 1 - within
                i_rev = ((np.sqrt(8.0 * rev + 1.0) - 1.0) // 2).astype(np.int64)
                # exact integer correction of the float sqrt (one step each
                # way covers the at-most-one-off rounding at slab scale)
                for _ in range(2):
                    i_rev += ((i_rev + 1) * (i_rev + 2) // 2 <= rev).astype(np.int64)
                    i_rev -= (i_rev * (i_rev + 1) // 2 > rev).astype(np.int64)
                i = d - 2 - i_rev
                j = within - (i * (2 * d - i - 1) // 2) + i + 1
                rows = starts[gsel]
                frames.append(pd.DataFrame({
                    "p": preds[rows],
                    "x": subs[rows + i],
                    "z": subs[rows + j],
                    "kind": np.int8(0),
                }))
        out = (
            pd.concat(frames, ignore_index=True).drop_duplicates()
            if frames else
            pd.DataFrame({"p": pd.Series([], dtype=str),
                          "x": pd.Series([], dtype=str),
                          "z": pd.Series([], dtype=str),
                          "kind": pd.Series([], dtype="int8")})
        )
        if n_hot:
            out = pd.concat([out, pd.DataFrame(
                {"p": ["__hot_value__"], "x": [f">{hot_threshold}"],
                 "z": [str(n_hot)], "kind": [np.int8(1)]})], ignore_index=True)
        out["kind"] = out["kind"].astype("int8")
        return out

    return groupby_partition(
        triples.select_columns(["pred", "obj", "subj"]),
        ["pred", "obj"],
        emit,
        batch_format="pandas",
        schema=schema,
    )


def share_rules(
    triples: "ray.data.Dataset",
    min_support: int = 5,
    min_confidence: float = 0.1,
    hot_threshold: int = 2048,
) -> pd.DataFrame:
    """share_p1(x,z) => share_p2(x,z) implication rules.

    Returns (antecedent, consequent, n_ant, n_both, confidence) for every
    directed predicate pair with n_both >= min_support and confidence =
    n_both / n_ant >= min_confidence, sorted by (antecedent, consequent).
    n_ant counts DISTINCT entity pairs sharing a p1-value; n_both counts
    those that also share a p2-value.
    """
    cand = share_pairs(triples, hot_threshold=hot_threshold)
    # partial kind is an explicit int8 flag (0 = directed pair count,
    # 1 = antecedent body count), NOT an in-band b == '' sentinel — a
    # predicate that IS the empty string must not fold into body rows
    schema = pa.schema(
        [("a", pa.string()), ("b", pa.string()), ("n", pa.int64()),
         ("pkind", pa.int8())]
    )

    def rule_partials(part: pd.DataFrame) -> pd.DataFrame:
        df = part[part["kind"] == 0].drop_duplicates(["p", "x", "z"])
        if df.empty:
            return pd.DataFrame(
                {"a": pd.Series([], dtype=str), "b": pd.Series([], dtype=str),
                 "n": pd.Series([], dtype="int64"),
                 "pkind": pd.Series([], dtype="int8")})
        body = df.groupby("p", sort=False).size().rename("n").reset_index()
        body = body.rename(columns={"p": "a"})
        body["b"] = ""
        body["pkind"] = np.int8(1)
        joined = df.merge(df, on=["x", "z"], suffixes=("_1", "_2"))
        joined = joined[joined["p_1"] != joined["p_2"]]
        both = (
            joined.groupby(["p_1", "p_2"], sort=False).size()
            .rename("n").reset_index()
            .rename(columns={"p_1": "a", "p_2": "b"})
        )
        both["pkind"] = np.int8(0)
        out = pd.concat(
            [body[["a", "b", "n", "pkind"]], both[["a", "b", "n", "pkind"]]],
            ignore_index=True,
        )
        out["n"] = out["n"].astype("int64")
        out["pkind"] = out["pkind"].astype("int8")
        return out

    parts = groupby_partition(
        cand.filter(expr="kind == 0"),
        ["x", "z"],
        rule_partials,
        batch_format="pandas",
        schema=schema,
        size_aware=True,
    ).to_pandas()
    cols = ["antecedent", "consequent", "n_ant", "n_both", "confidence"]
    if parts.empty:
        return pd.DataFrame({
            "antecedent": pd.Series([], dtype=str),
            "consequent": pd.Series([], dtype=str),
            "n_ant": pd.Series([], dtype="int64"),
            "n_both": pd.Series([], dtype="int64"),
            "confidence": pd.Series([], dtype="float64")})
    merged = parts.groupby(["a", "b", "pkind"], as_index=False)["n"].sum()
    n_ant = dict(zip(
        merged.loc[merged["pkind"] == 1, "a"],
        merged.loc[merged["pkind"] == 1, "n"].astype(int),
    ))
    both = merged[merged["pkind"] == 0]
    rows = []
    for a, b, n in both[["a", "b", "n"]].itertuples(index=False):
        conf = n / n_ant[a]
        if n >= min_support and conf >= min_confidence:
            rows.append({"antecedent": a, "consequent": b,
                         "n_ant": int(n_ant[a]), "n_both": int(n),
                         "confidence": round(conf, 6)})
    out = pd.DataFrame(rows, columns=cols)
    out["n_ant"] = out["n_ant"].astype("int64")
    out["n_both"] = out["n_both"].astype("int64")
    out["confidence"] = out["confidence"].astype("float64")
    return out.sort_values(["antecedent", "consequent"]).reset_index(drop=True)


def pred_cooccurrence(
    triples: "ray.data.Dataset", num_partitions: int = 64
) -> pd.DataFrame:
    """Predicate co-occurrence with PMI-style lift over the subject
    universe (schema-discovery signal: which attribute slots travel
    together).

    Scale shape: one block combiner reduces the triple stream to
    distinct (subj, pred) partials, then ONE subj-keyed partition pass
    (groupby_partition — every row of a subject in exactly one
    partition, so the per-partition self-join is per-subject-EXACT)
    emits kind-flagged count partials: predicate-pair counts (kind 0),
    per-predicate subject counts (kind 1), distinct-subject counts
    (kind 2). Partials SUM exactly across partitions; the driver merge
    is P^2-bounded (predicate vocabulary squared), never
    entity-count-shaped — same pattern as :func:`share_rules`.
    Result is invariant to ``num_partitions`` (pinned by
    tests/test_mining.py).
    """
    from ..functions.partitioning import groupby_partition

    def partial(t: pa.Table) -> pa.Table:
        return t.select(["subj", "pred"]).group_by(
            ["subj", "pred"], use_threads=False
        ).aggregate([])

    schema = pa.schema(
        [("a", pa.string()), ("b", pa.string()),
         ("n", pa.int64()), ("kind", pa.int8())]
    )

    def emit(df: pd.DataFrame) -> pd.DataFrame:
        df = df.drop_duplicates(["subj", "pred"])
        if df.empty:
            return pd.DataFrame(
                {"a": pd.Series([], dtype=str), "b": pd.Series([], dtype=str),
                 "n": pd.Series([], dtype="int64"),
                 "kind": pd.Series([], dtype="int8")})
        ns = pd.DataFrame(
            {"a": [""], "b": [""],
             "n": np.int64(df["subj"].nunique()), "kind": np.int8(2)})
        ca = (
            df.groupby("pred", sort=False).size().rename("n").reset_index()
            .rename(columns={"pred": "a"})
        )
        ca["b"] = ""
        ca["kind"] = np.int8(1)
        j = df.merge(df, on="subj", suffixes=("_a", "_b"))
        j = j[j["pred_a"] < j["pred_b"]]
        pairs = (
            j.groupby(["pred_a", "pred_b"], sort=False).size()
            .rename("n").reset_index()
            .rename(columns={"pred_a": "a", "pred_b": "b"})
        )
        pairs["kind"] = np.int8(0)
        out = pd.concat(
            [pairs[["a", "b", "n", "kind"]], ca[["a", "b", "n", "kind"]], ns],
            ignore_index=True,
        )
        out["n"] = out["n"].astype("int64")
        out["kind"] = out["kind"].astype("int8")
        return out

    parts = groupby_partition(
        triples.select_columns(["subj", "pred"]).map_batches(
            partial, batch_format="pyarrow"
        ),
        ["subj"], emit, batch_format="pandas", schema=schema,
        num_partitions=num_partitions,
    ).to_pandas()
    empty = pd.DataFrame(
        {"pred_a": pd.Series([], dtype=str),
         "pred_b": pd.Series([], dtype=str),
         "n_ab": pd.Series([], dtype="int64"),
         "lift": pd.Series([], dtype="float64")}
    )
    if parts.empty or not (parts["kind"] == 0).any():
        return empty
    merged = parts.groupby(["a", "b", "kind"], as_index=False)["n"].sum()
    n_subj = int(merged.loc[merged["kind"] == 2, "n"].sum())
    ca = merged[merged["kind"] == 1].set_index("a")["n"]
    g = (
        merged[merged["kind"] == 0]
        .rename(columns={"a": "pred_a", "b": "pred_b", "n": "n_ab"})
        [["pred_a", "pred_b", "n_ab"]]
        .reset_index(drop=True)
    )
    lift = np.log(
        float(n_subj) * g["n_ab"].to_numpy(dtype=np.float64)
        / (ca[g["pred_a"]].to_numpy(dtype=np.float64)
           * ca[g["pred_b"]].to_numpy(dtype=np.float64))
    )
    g["n_ab"] = g["n_ab"].astype("int64")
    g["lift"] = np.round(lift, 6)
    return g.sort_values(["pred_a", "pred_b"]).reset_index(drop=True)
