"""KG storage-layout operators: term dictionary + sorted bucket indexes.

A triple store at 10^12-turn scale is a storage-layout problem before it
is a query problem: RDF engines dictionary-encode terms to dense ids and
keep the triple table in several sort orders (hexastore-style SPO / OSP
permutations) so lookups become merge scans over zone-mapped files.
These are the Ray-Data-native constructions of both artifacts:

- :func:`term_dictionary` — the global term -> dense-id map. Distinct
  terms via ONE term-keyed partition pass (per-block partials first, so
  only the block's distinct terms enter the exchange), ids via the
  repo's distributed prefix-sum scan (functions/scan.with_prefix_sum):
  id = global rank in term sort order. No driver-side sort, no
  whole-vocabulary materialization on any single node.
- :func:`sorted_index` — for each requested permutation, triples are
  hash-bucketed by the LEADING term's md5 prefix (16 buckets per hex
  digit — the bucket fn is data-independent, so a failed run re-writes
  only missing buckets: resumable output, never one giant file), each
  bucket is sorted locally and written as one Parquet file, and the
  operator returns the bucket ZONE MAPS (row count + min/max composite
  key) that a scan planner would prune on. Bucket groups are
  partition-complete (keyed exchange), so the global distinct and the
  per-bucket sort are exact.

At scale the bucket count is a parameter (hex-prefix length); per-bucket
files stay bounded because the leading-term hash spreads uniformly —
skew lives in the VALUE distribution, not the key space.
"""

from __future__ import annotations

import hashlib
import os

import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq

import ray.data

from ..functions.partitioning import groupby_partition
from ..functions.scan import with_prefix_sum

# composite-key separator: never occurs in canonical terms (mirrors the
# oracle's chr(31))
_SEP = "\x1f"

_ORDERS = {"spo": ["subj", "pred", "obj"], "osp": ["obj", "subj", "pred"]}


def term_dictionary(triples: "ray.data.Dataset") -> pd.DataFrame:
    """(term, id) rows: every distinct subj/pred/obj term, id = rank in
    term sort order (0-based). Per-block distinct partials -> term-keyed
    exchange for the exact global distinct -> distributed prefix-sum
    scan for the ids."""

    def block_terms(df: pd.DataFrame) -> pd.DataFrame:
        terms = pd.concat(
            [df["subj"], df["pred"], df["obj"]], ignore_index=True
        ).drop_duplicates()
        return pd.DataFrame({"term": terms.astype(str)})

    schema = pa.schema([("term", pa.string())])
    blocks = triples.select_columns(["subj", "pred", "obj"]).map_batches(
        block_terms, batch_format="pandas"
    )
    distinct = groupby_partition(
        blocks, "term",
        lambda df: df.drop_duplicates(),
        batch_format="pandas", schema=schema,
    )

    def add_one(df: pd.DataFrame) -> pd.DataFrame:
        out = df.copy()
        out["one"] = 1
        return out

    ranked = with_prefix_sum(
        distinct.map_batches(add_one, batch_format="pandas"),
        "one", "term", out_col="id",
    ).to_pandas()
    if ranked.empty:
        return pd.DataFrame(
            {"term": pd.Series([], dtype=str),
             "id": pd.Series([], dtype="int64")})
    out = ranked[["term", "id"]].copy()
    out["id"] = out["id"].astype("int64")
    return out.sort_values("term").reset_index(drop=True)


def sorted_index(
    triples: "ray.data.Dataset",
    out_dir: str,
    orders: tuple = ("spo", "osp"),
) -> pd.DataFrame:
    """Write per-order, per-bucket sorted Parquet files; return zone maps.

    For each order, bucket = first hex digit of md5(leading term); each
    bucket group (partition-complete after the keyed exchange) is
    globally deduped, sorted by the permutation's column order, and
    written to ``{out_dir}/{order}/{bucket}.parquet``. The returned
    frame has one row per non-empty (idx_order, bucket): row count and
    min/max of the composite key ``t1 SEP t2 SEP t3`` — the pruning
    metadata a distributed scan would consult.
    """
    schema = pa.schema(
        [("idx_order", pa.string()), ("bucket", pa.string()),
         ("n", pa.int64()), ("key_min", pa.string()),
         ("key_max", pa.string())]
    )
    frames = []
    for order in orders:
        cols = _ORDERS[order]
        odir = os.path.join(out_dir, order)
        os.makedirs(odir, exist_ok=True)

        def tag(df: pd.DataFrame, cols=cols) -> pd.DataFrame:
            d = df[["subj", "pred", "obj"]].drop_duplicates()
            d = d.copy()
            d["bucket"] = [
                hashlib.md5(str(t).encode("utf-8", "surrogatepass"))
                .hexdigest()[0]
                for t in d[cols[0]]
            ]
            return d

        def write_bucket(part: pd.DataFrame, cols=cols, odir=odir,
                         order=order) -> pd.DataFrame:
            rows = []
            for b, g in part.groupby("bucket", sort=False):
                g = g[["subj", "pred", "obj"]].drop_duplicates()
                g = g.sort_values(cols, kind="stable").reset_index(drop=True)
                pq.write_table(
                    pa.Table.from_pandas(g[cols], preserve_index=False),
                    os.path.join(odir, f"{b}.parquet"),
                )
                key = (
                    g[cols[0]].astype(str) + _SEP
                    + g[cols[1]].astype(str) + _SEP
                    + g[cols[2]].astype(str)
                )
                rows.append(
                    {"idx_order": order, "bucket": str(b), "n": len(g),
                     "key_min": key.min(), "key_max": key.max()})
            if not rows:
                return pd.DataFrame(
                    {"idx_order": pd.Series([], dtype=str),
                     "bucket": pd.Series([], dtype=str),
                     "n": pd.Series([], dtype="int64"),
                     "key_min": pd.Series([], dtype=str),
                     "key_max": pd.Series([], dtype=str)})
            out = pd.DataFrame(rows)
            out["n"] = out["n"].astype("int64")
            return out

        tagged = triples.select_columns(["subj", "pred", "obj"]).map_batches(
            tag, batch_format="pandas"
        )
        zones = groupby_partition(
            tagged, "bucket", write_bucket,
            batch_format="pandas", schema=schema,
        ).to_pandas()
        frames.append(zones)
    out = pd.concat(frames, ignore_index=True)
    out["n"] = out["n"].astype("int64")
    return out.sort_values(["idx_order", "bucket"]).reset_index(drop=True)
