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
