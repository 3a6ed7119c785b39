"""Cross-snapshot entity alignment: match entities between two KG
snapshots by the Jaccard similarity of their relational signatures.

The knowledge-fusion primitive for a continuously re-extracted corpus:
after re-running extraction over a refreshed transcript dump (or over a
second corpus), entities must be aligned across the two graph versions
before the node tables can be merged — exact surface matches anchor the
alignment and signature matches surface renames/variants (the reference
pipeline's union-find canonicalization, ehr.py get_relations +
annotate.py, only ever sees ONE graph; alignment is the cross-version
extension a production KG needs).

Distributed shape (bipartite variant of
:func:`..stages.graph.neighbor_jaccard`): each snapshot's triples reduce
to distinct side-tagged (entity, feature) rows, where feature =
``pred:obj`` (an entity's outgoing attribute edge). Rows hash-partition
by FEATURE, so one partition pass holds every owner of a feature and
emits (a-ent x b-ent) intersection partials PLUS per-entity
distinct-feature degree rows — candidate pairs are blocked on shared
features, never all-pairs. A HOT feature (one owned by more than
``hot_threshold`` entities per side — stopword-like attributes such as
``Form:tablet``) would emit |A|x|B| pairs from one task; above the
threshold its sides are chunked and the cross mesh fans out across a
second bounded expansion pass, with a lineage counter row so the split
is observable, never silent. A pair-keyed second partition pass sums the
partials; jaccard = inter / (deg_a + deg_b - inter).

At 10^12 turns the exchanged payload is (ent, feat) distinct pairs and
pair partials — row bodies never move, and both exchanges are keyed by
values already reduced to the entity/attribute vocabulary.
"""

from __future__ import annotations

import logging

import numpy as np
import pandas as pd
import pyarrow as pa

import ray.data

from ..functions.partitioning import groupby_partition

logger = logging.getLogger(__name__)

_KIND_PAIR = 0
_KIND_DEG = 1
_KIND_LINEAGE = 2

# side-tag separator: \x1f never occurs in canonical entity strings
_SEP = "\x1f"

_PARTIAL_SCHEMA = pa.schema(
    [
        ("x", pa.string()),
        ("y", pa.string()),
        ("c", pa.float64()),
        ("kind", pa.int8()),
        ("ca", pa.list_(pa.string())),
        ("cb", pa.list_(pa.string())),
    ]
)

_SUM_SCHEMA = pa.schema(
    [
        ("x", pa.string()),
        ("y", pa.string()),
        ("c", pa.float64()),
        ("kind", pa.int8()),
    ]
)


def side_features(
    triples: "ray.data.Dataset",
    side_fn,
    ent_col: str = "subj",
    pred_col: str = "pred",
    obj_col: str = "obj",
) -> "ray.data.Dataset":
    """Reduce triples to side-tagged (ent, feat) rows.

    ``side_fn(doc_ids: pd.Series) -> np.ndarray[str]`` assigns each row's
    document to a snapshot side ('a' or 'b'); feature = ``pred:obj``.
    Rows are NOT globally distinct yet — the feature-partition pass
    dedups exactly (each (side, ent, feat) lands in one partition).
    """

    def project(df: "pd.DataFrame") -> "pd.DataFrame":
        side = side_fn(df["doc_id"])
        return pd.DataFrame(
            {
                "ent": np.char.add(
                    np.char.add(np.asarray(side, dtype=str), _SEP),
                    df[ent_col].to_numpy(dtype=str),
                ),
                "feat": (df[pred_col] + ":" + df[obj_col]).to_numpy(dtype=str),
            }
        )

    return triples.map_batches(project, batch_format="pandas")


def align_pairs(
    feats: "ray.data.Dataset",
    min_jaccard: float = 0.5,
    num_partitions: int = 64,
    hot_threshold: int = 2048,
    round_to: int = 4,
) -> "pd.DataFrame":
    """Bipartite signature-Jaccard alignment over side-tagged (ent, feat)
    rows (see module docstring for the distributed shape).

    Returns a pandas DataFrame (ent_a, ent_b, jaccard) — pair-space
    output, bounded by entities sharing at least one feature.
    """

    def feat_pass(df: "pd.DataFrame") -> "pd.DataFrame":
        cols = {"x": [], "y": [], "c": [], "kind": [], "ca": [], "cb": []}
        xs, ys = [], []
        deg: dict = {}
        for _, grp in df.groupby("feat", sort=False):
            owners = np.unique(grp["ent"].to_numpy(dtype=str))
            for e in owners:
                deg[e] = deg.get(e, 0) + 1
            a = owners[np.char.startswith(owners, "a" + _SEP)]
            b = owners[np.char.startswith(owners, "b" + _SEP)]
            if len(a) == 0 or len(b) == 0:
                continue
            if len(a) <= hot_threshold and len(b) <= hot_threshold:
                gx, gy = np.meshgrid(a, b, indexing="ij")
                xs.append(gx.ravel())
                ys.append(gy.ravel())
            else:
                ach = np.array_split(a, -(-len(a) // hot_threshold))
                bch = np.array_split(b, -(-len(b) // hot_threshold))
                for ai in ach:
                    for bj in bch:
                        cols["x"].append("")
                        cols["y"].append("")
                        cols["c"].append(0.0)
                        cols["kind"].append(_KIND_PAIR)
                        cols["ca"].append(list(ai))
                        cols["cb"].append(list(bj))
                cols["x"].append("__hot_feature__")
                cols["y"].append(str(grp["feat"].iloc[0]))
                cols["c"].append(float(len(a)) * len(b))
                cols["kind"].append(_KIND_LINEAGE)
                cols["ca"].append(None)
                cols["cb"].append(None)
        if xs:
            pairs = (
                pd.DataFrame({"x": np.concatenate(xs), "y": np.concatenate(ys)})
                .groupby(["x", "y"], as_index=False)
                .size()
            )
            cols["x"] += list(pairs["x"])
            cols["y"] += list(pairs["y"])
            cols["c"] += [float(v) for v in pairs["size"]]
            cols["kind"] += [_KIND_PAIR] * len(pairs)
            cols["ca"] += [None] * len(pairs)
            cols["cb"] += [None] * len(pairs)
        for e, d in deg.items():
            cols["x"].append(e)
            cols["y"].append("")
            cols["c"].append(float(d))
            cols["kind"].append(_KIND_DEG)
            cols["ca"].append(None)
            cols["cb"].append(None)
        return pd.DataFrame(cols)

    parts = groupby_partition(
        feats,
        "feat",
        feat_pass,
        num_partitions=num_partitions,
        batch_format="pandas",
        schema=_PARTIAL_SCHEMA,
    )

    def expand(t: pa.Table) -> pa.Table:
        # bounded hot-feature mesh expansion: each chunk row yields
        # <= hot_threshold^2 pairs on whichever worker holds it
        df = t.to_pandas()
        chunk = df[df["ca"].notna()]
        plain = df[df["ca"].isna()][["x", "y", "c", "kind"]]
        out = [plain]
        for _, r in chunk.iterrows():
            gx, gy = np.meshgrid(
                np.asarray(r["ca"], dtype=str),
                np.asarray(r["cb"], dtype=str),
                indexing="ij",
            )
            out.append(
                pd.DataFrame(
                    {"x": gx.ravel(), "y": gy.ravel(),
                     "c": 1.0, "kind": _KIND_PAIR}
                )
            )
        res = pd.concat(out, ignore_index=True)
        return pa.Table.from_pandas(res, schema=_SUM_SCHEMA,
                                    preserve_index=False)

    expanded = parts.map_batches(expand, batch_format="pyarrow")

    def sum_pass(df: "pd.DataFrame") -> "pd.DataFrame":
        out = df.groupby(["x", "y", "kind"], as_index=False)["c"].sum()
        return out[["x", "y", "c", "kind"]].astype(
            {"x": str, "y": str, "c": "float64", "kind": "int8"}
        )

    merged = groupby_partition(
        expanded,
        ["x", "y", "kind"],
        sum_pass,
        num_partitions=num_partitions,
        batch_format="pandas",
        schema=_SUM_SCHEMA,
        size_aware=True,
    ).to_pandas()

    empty = pd.DataFrame(
        {"ent_a": pd.Series([], dtype=str),
         "ent_b": pd.Series([], dtype=str),
         "jaccard": pd.Series([], dtype="float64")}
    )
    if merged.empty:
        return empty
    hot = merged[merged["kind"] == _KIND_LINEAGE]
    if not hot.empty:
        logger.info(
            "align_pairs: %d hot features chunk-split (max |A|x|B| %.0f)",
            len(hot), hot["c"].max(),
        )
    deg = merged[merged["kind"] == _KIND_DEG].set_index("x")["c"]
    pairs = merged[merged["kind"] == _KIND_PAIR]
    if pairs.empty:
        return empty
    da = pairs["x"].map(deg).to_numpy(dtype="float64")
    db = pairs["y"].map(deg).to_numpy(dtype="float64")
    c = pairs["c"].to_numpy(dtype="float64")
    jac = c / (da + db - c)
    keep = jac >= min_jaccard
    strip = len("a") + len(_SEP)
    out = pd.DataFrame(
        {
            "ent_a": [s[strip:] for s in pairs["x"].to_numpy()[keep]],
            "ent_b": [s[strip:] for s in pairs["y"].to_numpy()[keep]],
            "jaccard": np.round(jac[keep], round_to),
        }
    )
    return out.sort_values(["ent_a", "ent_b"]).reset_index(drop=True)
