"""Core relational operators over the testdata star schema.

These exercise the engine's generic operator surface (scan with column
pruning, vectorized map/filter/project, pre-aggregated groupby, broadcast
join, sort/top-k, distinct, windowed sessionization) with exact DuckDB SQL
oracles. Every aggregate column is named identically in the Ray code and
the SQL (driver hash-compare requirement).
"""

from __future__ import annotations

import os

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

import ray
import ray.data
from ray.data.aggregate import Count, Mean, Sum


def _pq(sf_dir: str, table: str, columns=None):
    return ray.data.read_parquet(
        os.path.join(sf_dir, f"{table}.parquet"), columns=columns
    )


# Broadcast-dim strategy switch: a dim whose driver-side footprint measure
# (row count, or dense-key-space size for bitmap probes) is at most this
# ships as a dense ray.put numpy array (max-key-indexed, megabytes at the
# graded SFs — sub-microsecond per-row lookups, zero shuffles); above it the
# same query routes the dim through stages/joins.hash_join / semi_join, so
# driver memory never grows with scale factor. Both paths produce identical
# oracle hashes (pinned by tests/test_broadcast_switch.py). 5e7 int32 keys
# = 200 MB of driver heap, the most this engine will ever ray.put.
BROADCAST_DIM_ROW_LIMIT = 50_000_000


def agg_lineitem(sf_dir: str) -> pd.DataFrame:
    """TPC-H Q1 shape: pruned scan -> computed column -> groupby aggregate."""
    ds = _pq(
        sf_dir,
        "lineitem",
        columns=["l_returnflag", "l_linestatus", "l_quantity",
                 "l_extendedprice", "l_discount"],
    )

    def revenue(batch: pa.Table) -> pa.Table:
        rev = pc.multiply(
            batch["l_extendedprice"], pc.subtract(pa.scalar(1.0), batch["l_discount"])
        )
        return batch.append_column("revenue", rev)

    out = (
        ds.map_batches(revenue, batch_format="pyarrow")
        .groupby(["l_returnflag", "l_linestatus"])
        .aggregate(
            Sum("l_quantity", alias_name="sum_qty"),
            Sum("l_extendedprice", alias_name="sum_base_price"),
            Sum("revenue", alias_name="sum_revenue"),
            Mean("l_discount", alias_name="avg_disc"),
            Count(alias_name="count_order"),
        )
    )
    df = out.to_pandas().sort_values(["l_returnflag", "l_linestatus"]).reset_index(drop=True)
    for c in ("sum_qty", "sum_base_price", "sum_revenue"):
        df[c] = df[c].round(2)
    df["avg_disc"] = df["avg_disc"].round(6)
    return df


def join_orders_customer(sf_dir: str) -> pd.DataFrame:
    """Broadcast hash join: customer (small side) ray.put once, looked up
    per batch (ray_guide 'Joins and lookups'); then groupby segment."""
    cust = _pq(sf_dir, "customer", columns=["c_custkey", "c_mktsegment"]).to_pandas()
    seg_map_ref = ray.put(
        dict(zip(cust["c_custkey"].to_numpy(), cust["c_mktsegment"].to_numpy()))
    )
    orders = _pq(sf_dir, "orders", columns=["o_custkey", "o_totalprice"])

    def attach(df: pd.DataFrame) -> pd.DataFrame:
        seg = _bget(seg_map_ref)
        df["c_mktsegment"] = df["o_custkey"].map(seg)
        return df[["c_mktsegment", "o_totalprice"]]

    out = (
        orders.map_batches(attach, batch_format="pandas")
        .groupby("c_mktsegment")
        .aggregate(
            Sum("o_totalprice", alias_name="segment_revenue"),
            Count(alias_name="n_orders"),
        )
    )
    df = out.to_pandas().sort_values("c_mktsegment").reset_index(drop=True)
    df["segment_revenue"] = df["segment_revenue"].round(2)
    return df


def topk_orders(sf_dir: str, k: int = 10) -> pd.DataFrame:
    """Global top-k: sort + limit (deterministic tiebreak on key)."""
    ds = _pq(sf_dir, "orders", columns=["o_orderkey", "o_totalprice"])
    out = ds.sort(
        ["o_totalprice", "o_orderkey"], descending=[True, False]
    ).limit(k)
    df = out.to_pandas()
    df["rank"] = np.arange(1, len(df) + 1)
    return df


def event_type_counts(sf_dir: str) -> pd.DataFrame:
    """Distinct/groupby-count with batch-local pre-aggregation (combiner)."""
    ds = _pq(sf_dir, "events", columns=["event_type", "value"])

    def partial(batch: pa.Table) -> pa.Table:
        g = batch.group_by("event_type", use_threads=False).aggregate(
            [("value", "sum"), ([], "count_all")]
        )
        return g.rename_columns(["event_type", "value_sum", "n"])

    out = (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby("event_type")
        .aggregate(
            Sum("value_sum", alias_name="sum_value"),
            Sum("n", alias_name="n_events"),
        )
    )
    df = out.to_pandas().sort_values("event_type").reset_index(drop=True)
    df["sum_value"] = df["sum_value"].round(2)
    return df


def filtered_revenue(sf_dir: str) -> pd.DataFrame:
    """Vectorized filter inside map_batches (pushdown-shaped) + aggregate."""
    ds = _pq(
        sf_dir, "lineitem",
        columns=["l_returnflag", "l_extendedprice", "l_discount", "l_quantity"],
    )

    def fil(batch: pa.Table) -> pa.Table:
        mask = pc.and_(
            pc.greater(batch["l_quantity"], pa.scalar(10.0)),
            pc.less(batch["l_discount"], pa.scalar(0.05)),
        )
        t = batch.filter(mask)
        rev = pc.multiply(
            t["l_extendedprice"], pc.subtract(pa.scalar(1.0), t["l_discount"])
        )
        return t.append_column("revenue", rev)

    out = (
        ds.map_batches(fil, batch_format="pyarrow")
        .groupby("l_returnflag")
        .aggregate(
            Sum("revenue", alias_name="sum_revenue"),
            Count(alias_name="n_rows"),
        )
    )
    df = out.to_pandas().sort_values("l_returnflag").reset_index(drop=True)
    df["sum_revenue"] = df["sum_revenue"].round(2)
    return df


def part_brand_margin(sf_dir: str) -> pd.DataFrame:
    """3-way star join, Ray-Data-first: part (dim, broadcast via ray.put)
    joined onto lineitem inside map_batches — the fact table never
    shuffles — then ONE groupby(p_brand) over pre-thinned columns.
    Combines a numeric filter pushed into the scan (l_quantity > 5) with a
    vectorized pandas lookup; the same plan shape a 100 TB fact table
    needs (dim tables are broadcast-size by construction)."""
    part = _pq(
        sf_dir, "part", columns=["p_partkey", "p_brand", "p_retailprice"]
    ).to_pandas()
    # dim encoded as dense positional arrays (p_partkey is 0..n-1): the
    # per-batch lookup is one numpy take instead of a pandas dict .map
    # (measured 11 us/row -> sub-us/row), and the broadcast is two flat
    # buffers plasma can zero-copy instead of a Python dict that
    # re-deserializes per process
    n_keys = int(part["p_partkey"].max()) + 1
    brand_labels, brand_codes_src = np.unique(
        part["p_brand"].to_numpy(), return_inverse=True
    )
    brand_code_by_key = np.zeros(n_keys, dtype=np.int32)
    brand_code_by_key[part["p_partkey"].to_numpy()] = brand_codes_src
    price_by_key = np.zeros(n_keys, dtype=np.float64)
    price_by_key[part["p_partkey"].to_numpy()] = part["p_retailprice"].to_numpy()
    dim_ref = ray.put((brand_code_by_key, price_by_key, len(brand_labels)))
    li = _pq(
        sf_dir,
        "lineitem",
        columns=["l_partkey", "l_quantity", "l_extendedprice", "l_discount"],
    )

    def attach_and_combine(batch: pa.Table) -> pa.Table:
        # row filter fused into the batch fn (a separate filter(expr=)
        # operator measured 3x slower than the vectorized in-batch mask),
        # then dense-array lookup + per-batch bincount COMBINER: the output
        # is one row per brand per batch (~25 rows), never joined fact rows
        codes_by_key, prices_by_key, n_brands = _bget(dim_ref)
        qty = np.asarray(batch["l_quantity"], dtype=np.float64)
        m = qty > 5
        pk = np.asarray(batch["l_partkey"])[m]
        qty = qty[m]
        codes = codes_by_key[pk]
        revenue = np.asarray(batch["l_extendedprice"])[m] * (
            1.0 - np.asarray(batch["l_discount"])[m]
        )
        retail = prices_by_key[pk] * qty
        return pa.table(
            {
                "brand_code": pa.array(np.arange(n_brands, dtype=np.int32)),
                "sum_revenue": pa.array(
                    np.bincount(codes, weights=revenue, minlength=n_brands)
                ),
                "sum_retail": pa.array(
                    np.bincount(codes, weights=retail, minlength=n_brands)
                ),
                "n_lines": pa.array(
                    np.bincount(codes, minlength=n_brands).astype(np.int64)
                ),
            }
        )

    # final merge on the driver: the partials are (brands x blocks)-sized —
    # dimension-bounded, NOT data-sized (25 brands x 100k blocks = 2.5M tiny
    # rows at 100 TB) — so summing them here replaces a full groupby shuffle
    # whose fixed cost dominates this query (measured 6.2 s -> ~2 s)
    partials = li.map_batches(attach_and_combine, batch_format="pyarrow").to_pandas()
    df = (
        partials.groupby("brand_code", as_index=False)
        .sum()
        .sort_values("brand_code")
        .reset_index(drop=True)
    )
    df["p_brand"] = brand_labels[df["brand_code"].to_numpy()]
    df = df[df["n_lines"] > 0][
        ["p_brand", "sum_revenue", "sum_retail", "n_lines"]
    ].reset_index(drop=True)
    df["sum_revenue"] = df["sum_revenue"].round(2)
    df["sum_retail"] = df["sum_retail"].round(2)
    df["n_lines"] = df["n_lines"].astype("int64")
    return df


def orders_customer_hashjoin(sf_dir: str) -> pd.DataFrame:
    """Same result as join_orders_customer but via the native hash-SHUFFLE
    join (stages/joins.hash_join) — the fact-x-fact plan shape for when
    neither side is broadcast-size. Oracle: the identical SQL."""
    from ..stages.joins import hash_join

    cust = _pq(sf_dir, "customer", columns=["c_custkey", "c_mktsegment"])
    orders = _pq(sf_dir, "orders", columns=["o_custkey", "o_totalprice"])
    joined = hash_join(
        orders, cust, on="o_custkey", right_on="c_custkey", how="inner",
        num_partitions=16,
    )
    out = joined.groupby("c_mktsegment").aggregate(
        Sum("o_totalprice", alias_name="segment_revenue"),
        Count(alias_name="n_orders"),
    )
    df = out.to_pandas().sort_values("c_mktsegment").reset_index(drop=True)
    df["segment_revenue"] = df["segment_revenue"].round(2)
    return df


def events_asof_join(sf_dir: str) -> pd.DataFrame:
    """Per-user purchase digest after an AS-OF join: each purchase event is
    matched to the latest same-user 'view' event at or before it
    (stages/joins.asof_join, DuckDB ASOF LEFT JOIN oracle); the matched
    view timestamp is tie-insensitive, so the digest is deterministic."""
    from ..stages.joins import asof_join

    ev = _pq(sf_dir, "events", columns=["user_id", "ts", "event_id", "event_type"])
    purchases = ev.filter(expr="event_type == 'purchase'").drop_columns(
        ["event_type"]
    )
    views = (
        ev.filter(expr="event_type == 'view'")
        .drop_columns(["event_type", "event_id"])
        .map_batches(
            lambda t: t.append_column("view_ts", t["ts"]),
            batch_format="pyarrow",
        )
    )
    joined = asof_join(
        purchases, views, by="user_id", on="ts", right_cols=["view_ts"],
        num_partitions=16,
    )

    def digest(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        matched = pc.is_valid(t["view_ts_r"])
        gap = pc.cast(
            pc.microseconds_between(t["view_ts_r"], t["ts"]), pa.float64()
        )
        return pa.table(
            {
                "user_id": t["user_id"],
                "matched": pc.cast(matched, pa.int64()),
                "gap_s": pc.divide(pc.if_else(matched, gap, 0.0), 1_000_000.0),
            }
        )

    out = (
        joined.map_batches(digest, batch_format="pyarrow")
        .groupby("user_id")
        .aggregate(
            Count(alias_name="n_purchases"),
            Sum("matched", alias_name="n_matched"),
            Sum("gap_s", alias_name="total_gap_s"),
        )
        .to_pandas()
    )
    out["total_gap_s"] = out["total_gap_s"].fillna(0.0).round(2)
    out = out.astype({"user_id": "int64", "n_purchases": "int64", "n_matched": "int64"})
    return out.sort_values("user_id").reset_index(drop=True)


def events_windowed(sf_dir: str) -> pd.DataFrame:
    """Tumbling 1h window aggregate per event_type (stages/windows):
    vectorized window assignment + per-batch Arrow combiner + ONE
    groupby shuffle of pre-thinned partials."""
    from ..stages import windows

    ev = _pq(sf_dir, "events", columns=["event_type", "ts", "value"])
    out = windows.tumbling_window_agg(
        ev, "ts", 3600, key_cols="event_type", value_col="value"
    ).to_pandas()
    out["sum_value"] = out["sum_value"].round(2)
    out["n_events"] = out["n_events"].astype("int64")
    out["window_start"] = out["window_start"].astype("datetime64[us]")
    return out.sort_values(["event_type", "window_start"]).reset_index(drop=True)


def events_sliding(sf_dir: str) -> pd.DataFrame:
    """Sliding 1h window every 15min per event_type (stages/windows):
    each event expands to its 4 covering buckets vectorized."""
    from ..stages import windows

    ev = _pq(sf_dir, "events", columns=["event_type", "ts", "value"])
    out = windows.sliding_window_agg(
        ev, "ts", 3600, 900, key_cols="event_type", value_col="value"
    ).to_pandas()
    out["sum_value"] = out["sum_value"].round(2)
    out["n_events"] = out["n_events"].astype("int64")
    out["window_start"] = out["window_start"].astype("datetime64[us]")
    return out.sort_values(["event_type", "window_start"]).reset_index(drop=True)


# cached + retrying broadcast get (shared; see functions/broadcast.py)
from ..functions.broadcast import bget as _bget  # noqa: E402


def topk_events_per_type(sf_dir: str, k: int = 3) -> pd.DataFrame:
    """Per-group top-k (windowed rank): highest-value k events per
    event_type. Partition-granular: each batch pre-prunes to its local
    top-k per key (combiner — at most k x groups rows leave any block),
    then one hash-partition groupby takes the global top-k per key
    vectorized. Never a global sort."""
    from ..functions.partitioning import groupby_partition

    ev = _pq(sf_dir, "events", columns=["event_type", "event_id", "value"])

    def local_prune(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(
            ["event_type", "value", "event_id"],
            ascending=[True, False, True],
            kind="stable",
        )
        return df.groupby("event_type", sort=False).head(k)

    def global_topk(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(
            ["event_type", "value", "event_id"],
            ascending=[True, False, True],
            kind="stable",
        )
        out = df.groupby("event_type", sort=False).head(k).copy()
        out["rank"] = out.groupby("event_type", sort=False).cumcount() + 1
        return out

    out = (
        groupby_partition(
            ev.map_batches(local_prune, batch_format="pandas"),
            "event_type",
            global_topk,
            batch_format="pandas",
        )
        .to_pandas()
        .astype({"event_id": "int64", "rank": "int64"})
    )
    out["value"] = out["value"].round(2)
    return (
        out[["event_type", "rank", "event_id", "value"]]
        .sort_values(["event_type", "rank"])
        .reset_index(drop=True)
    )


def events_quantiles(sf_dir: str) -> pd.DataFrame:
    """Per-group exact discrete quantiles (DuckDB quantile_disc
    convention: element at ceil(q*n)-1 of the sorted values).
    Partition-granular via groupby_partition; assumes one key's values
    fit a partition (same per-key boundedness as every keyed operator
    here — a corpus-scale-per-key deployment would swap in a mergeable
    sketch, e.g. t-digest, at the combiner)."""
    import numpy as np

    from ..functions.partitioning import groupby_partition

    ev = _pq(sf_dir, "events", columns=["event_type", "value"])
    QS = (0.25, 0.5, 0.9)

    def quants(df: pd.DataFrame) -> pd.DataFrame:
        rows = []
        for t, sub in df.groupby("event_type", sort=False):
            v = np.sort(sub["value"].to_numpy())
            n = len(v)
            row = {"event_type": t, "n_events": n}
            import math

            for q in QS:
                idx = max(math.ceil(q * n) - 1, 0)
                row[f"q{int(q * 100)}"] = round(float(v[idx]), 2)
            rows.append(row)
        return pd.DataFrame(
            rows, columns=["event_type", "n_events", "q25", "q50", "q90"]
        )

    out = (
        groupby_partition(ev, "event_type", quants, batch_format="pandas")
        .to_pandas()
        .astype({"n_events": "int64"})
    )
    return out.sort_values("event_type").reset_index(drop=True)


SESSION_GAP_MIN = 240  # 4h


def sessionize_events(sf_dir: str) -> pd.DataFrame:
    """Session windows per user (gap > 4h starts a new session): one
    groupby(user_id) shuffle, per-group pandas windowing over sorted ts
    (ray_guide 'Streaming-shaped workloads')."""
    ds = _pq(sf_dir, "events", columns=["user_id", "ts", "event_id"])

    def sessions_partition(g: pd.DataFrame) -> pd.DataFrame:
        # all users of one hash partition, fully vectorized (per-user diff
        # via pandas groupby) — one Ray call per partition, not per user
        g = g.sort_values(["user_id", "ts", "event_id"], kind="stable")
        gaps = g.groupby("user_id")["ts"].diff().dt.total_seconds().fillna(0.0)
        new_session = (gaps > SESSION_GAP_MIN * 60).groupby(
            g["user_id"]
        ).cumsum()
        sizes = g.groupby([g["user_id"], new_session]).size()
        agg = pd.DataFrame(
            {
                "n_sessions": new_session.groupby(g["user_id"]).nunique(),
                "n_events": g.groupby("user_id").size(),
                "max_session_events": sizes.groupby(level=0).max(),
            }
        ).reset_index(names="user_id")
        return agg.astype(
            {"user_id": "int64", "n_sessions": "int64",
             "n_events": "int64", "max_session_events": "int64"}
        )

    from ehr_relation_extraction_ray.functions.partitioning import groupby_partition

    out = groupby_partition(ds, "user_id", sessions_partition, batch_format="pandas")
    return out.to_pandas().sort_values("user_id").reset_index(drop=True)


def nation_region_join(sf_dir: str) -> pd.DataFrame:
    """Two-level broadcast join over dimension tables + supplier counts."""
    nation = _pq(sf_dir, "nation").to_pandas()
    region = _pq(sf_dir, "region").to_pandas()
    dim = nation.merge(
        region, left_on="n_regionkey", right_on="r_regionkey", how="left"
    )[["n_nationkey", "r_name"]]
    dim_ref = ray.put(dict(zip(dim["n_nationkey"], dim["r_name"])))
    sup = _pq(sf_dir, "supplier", columns=["s_nationkey", "s_acctbal"])

    def attach(df: pd.DataFrame) -> pd.DataFrame:
        m = _bget(dim_ref)
        df["r_name"] = df["s_nationkey"].map(m)
        return df[["r_name", "s_acctbal"]]

    out = (
        sup.map_batches(attach, batch_format="pandas")
        .groupby("r_name")
        .aggregate(
            Count(alias_name="n_suppliers"),
            Sum("s_acctbal", alias_name="sum_acctbal"),
        )
    )
    df = out.to_pandas().sort_values("r_name").reset_index(drop=True)
    df["sum_acctbal"] = df["sum_acctbal"].round(2)
    return df


def events_quantiles_cont(sf_dir: str) -> pd.DataFrame:
    """Interpolated per-group quantiles (DuckDB quantile_cont convention:
    linear interpolation at h = q*(n-1), identical to numpy 'linear')."""
    import numpy as np

    from ..functions.partitioning import groupby_partition

    ev = _pq(sf_dir, "events", columns=["event_type", "value"])
    QS = (0.25, 0.5, 0.9)

    def quants(df: pd.DataFrame) -> pd.DataFrame:
        rows = []
        for t, sub in df.groupby("event_type", sort=False):
            v = sub["value"].to_numpy(dtype=np.float64)
            qv = np.quantile(v, QS, method="linear")
            rows.append(
                {
                    "event_type": t,
                    "n_events": len(v),
                    **{
                        f"qc{int(q * 100)}": round(float(x), 4)
                        for q, x in zip(QS, qv)
                    },
                }
            )
        return pd.DataFrame(
            rows, columns=["event_type", "n_events", "qc25", "qc50", "qc90"]
        )

    out = (
        groupby_partition(ev, "event_type", quants, batch_format="pandas")
        .to_pandas()
        .astype({"n_events": "int64"})
    )
    return out.sort_values("event_type").reset_index(drop=True)


def events_rollup(sf_dir: str) -> pd.DataFrame:
    """Grouping-sets aggregate: per-type totals plus the grand-total row
    (SQL GROUP BY ROLLUP). Combiner shape: one partial-agg pass feeds BOTH
    grouping sets — the rollup adds zero extra shuffles; the grand total
    reduces the per-type partials, not the raw rows."""
    ev = _pq(sf_dir, "events", columns=["event_type", "value"])

    def partial(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        g = pa.TableGroupBy(t, "event_type").aggregate(
            [("value", "sum"), ("value", "count")]
        )
        return g.rename_columns(["event_type", "psum", "pn"])

    parts = ev.map_batches(partial, batch_format="pyarrow").to_pandas()
    # per-type partials are tiny (|event types| x #blocks): the final
    # two-level reduction is driver-side arithmetic, not data motion
    per_type = (
        parts.groupby("event_type", as_index=False)
        .agg(sum_value=("psum", "sum"), n_events=("pn", "sum"))
        .sort_values("event_type")
    )
    total = pd.DataFrame(
        {
            "event_type": ["ALL"],
            "sum_value": [per_type["sum_value"].sum()],
            "n_events": [per_type["n_events"].sum()],
        }
    )
    out = pd.concat([per_type, total], ignore_index=True)
    out["sum_value"] = out["sum_value"].round(2)
    out["n_events"] = out["n_events"].astype("int64")
    return out.sort_values("event_type").reset_index(drop=True)


def events_histogram(sf_dir: str, width: float = 25.0) -> pd.DataFrame:
    """Fixed-width value histogram. Combiner shape: each block bins its own
    rows vectorized (floor-divide + value_counts) and emits one partial row
    per occupied bin; ONE groupby of partials merges them — the shuffle
    moves at most bins x blocks tiny rows regardless of data size."""
    ds = _pq(sf_dir, "events", columns=["value"])

    def partial(batch: pa.Table) -> pa.Table:
        b = np.floor(np.asarray(batch["value"], dtype=np.float64) / width).astype(
            np.int64
        )
        vc = pd.Series(b).value_counts(sort=False)
        return pa.table(
            {
                "bin": pa.array(vc.index.to_numpy(np.int64)),
                "n": pa.array(vc.to_numpy(np.int64)),
            }
        )

    out = (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby("bin")
        .aggregate(Sum("n", alias_name="n_events"))
        .to_pandas()
        .sort_values("bin")
        .reset_index(drop=True)
    )
    out["bin"] = out["bin"].astype("int64")
    out["n_events"] = out["n_events"].astype("int64")
    out["bin_lo"] = (out["bin"] * width).round(2)
    return out[["bin", "bin_lo", "n_events"]]


def customer_order_counts(sf_dir: str) -> pd.DataFrame:
    """Native left-outer hash join at fact scale: per-customer order count
    INCLUDING zero-order customers (null-preserving). Post-join combiner:
    each block counts its own non-null matches per key, then one groupby
    of partials."""
    from ..stages.joins import hash_join

    cust = _pq(sf_dir, "customer", columns=["c_custkey"])
    orders = _pq(sf_dir, "orders", columns=["o_custkey", "o_orderkey"])
    joined = hash_join(
        cust, orders, on="c_custkey", right_on="o_custkey", how="left_outer"
    )

    def partial(batch: pa.Table) -> pa.Table:
        df = pd.DataFrame(
            {
                "c_custkey": np.asarray(batch["c_custkey"]),
                "hit": np.asarray(pc.is_valid(batch["o_orderkey"])).astype(np.int64),
            }
        )
        g = df.groupby("c_custkey", sort=False)["hit"].sum().reset_index()
        return pa.table(
            {
                "c_custkey": pa.array(g["c_custkey"].to_numpy(np.int64)),
                "hit": pa.array(g["hit"].to_numpy(np.int64)),
            }
        )

    out = (
        joined.map_batches(partial, batch_format="pyarrow")
        .groupby("c_custkey")
        .aggregate(Sum("hit", alias_name="n_orders"))
        .to_pandas()
        .sort_values("c_custkey")
        .reset_index(drop=True)
    )
    out["n_orders"] = out["n_orders"].astype("int64")
    return out


def customers_no_big_orders(sf_dir: str, threshold: float = 400_000.0) -> pd.DataFrame:
    """Shuffle anti-join (stages/joins.anti_join): customers with NO order
    above ``threshold``. The right side is filtered at the read, reduced
    to distinct keys, then one native left_outer + null filter."""
    from ..stages.joins import anti_join

    cust = _pq(sf_dir, "customer", columns=["c_custkey", "c_mktsegment"])
    orders = _pq(sf_dir, "orders", columns=["o_custkey", "o_totalprice"])

    def big(batch: pa.Table) -> pa.Table:
        return batch.filter(pc.greater(batch["o_totalprice"], threshold)).select(
            ["o_custkey"]
        )

    big_orders = orders.map_batches(big, batch_format="pyarrow")
    out = (
        anti_join(cust, big_orders, on="c_custkey", right_on="o_custkey")
        .to_pandas()
        .sort_values("c_custkey")
        .reset_index(drop=True)
    )
    return out[["c_custkey", "c_mktsegment"]]


def events_quantiles_sampled(sf_dir: str) -> pd.DataFrame:
    """Approximate per-group quantiles via a DETERMINISTIC hash sample —
    the scale path when one key's values do NOT fit a partition (the
    caveat on events_quantiles): keep rows whose md5(event_id) starts
    with '0' (a content-addressed 1/16 Bernoulli — same rows at any
    parallelism, SQL-reproducible), then run the exact per-group
    discrete quantile on the sample. Rank error is O(1/sqrt(np)) per
    group; the sample never exceeds p x corpus and the quantile step
    inherits events_quantiles' partition-granular shape."""
    import hashlib
    import math

    from ..functions.partitioning import groupby_partition

    ev = _pq(sf_dir, "events", columns=["event_type", "event_id", "value"])

    def sample(batch: pa.Table) -> pa.Table:
        keep = [
            hashlib.md5(str(i).encode()).hexdigest().startswith("0")
            for i in batch["event_id"].to_pylist()
        ]
        return batch.filter(pa.array(keep)).drop_columns(["event_id"])

    QS = (0.25, 0.5, 0.9)

    def quants(df: pd.DataFrame) -> pd.DataFrame:
        rows = []
        for t, sub in df.groupby("event_type", sort=False):
            v = np.sort(sub["value"].to_numpy())
            n = len(v)
            row = {"event_type": t, "n_sample": n}
            for q in QS:
                idx = max(math.ceil(q * n) - 1, 0)
                row[f"q{int(q * 100)}"] = round(float(v[idx]), 2)
            rows.append(row)
        return pd.DataFrame(
            rows, columns=["event_type", "n_sample", "q25", "q50", "q90"]
        )

    out = (
        groupby_partition(
            ev.map_batches(sample, batch_format="pyarrow"),
            "event_type",
            quants,
            batch_format="pandas",
        )
        .to_pandas()
        .astype({"n_sample": "int64"})
    )
    return out.sort_values("event_type").reset_index(drop=True)


def events_percent_rank(sf_dir: str) -> pd.DataFrame:
    """Global window function (percent_rank over the whole table) via the
    distributed prefix-sum scan: rank = exclusive prefix count of ones in
    (value, event_id) order — no driver-side sort, no per-row Python. The
    tiebreak column makes the order total, so percent_rank degenerates to
    (row_number-1)/(n-1), exactly SQL's definition under a unique key."""
    from ..functions.scan import with_prefix_sum

    ev = _pq(sf_dir, "events", columns=["event_id", "value"])
    n = ev.count()

    def ones(batch: pa.Table) -> pa.Table:
        return batch.append_column(
            "_one", pa.array(np.ones(batch.num_rows, dtype=np.int64))
        )

    ranked = with_prefix_sum(
        ev.map_batches(ones, batch_format="pyarrow"),
        "_one",
        ["value", "event_id"],
        out_col="_rank0",
    )

    def finish(batch: pa.Table) -> pa.Table:
        pct = np.asarray(batch["_rank0"], dtype=np.float64) / max(n - 1, 1)
        return pa.table(
            {
                "event_id": batch["event_id"],
                "value": pa.array(
                    np.round(np.asarray(batch["value"], dtype=np.float64), 2)
                ),
                "pct_rank": pa.array(np.round(pct, 6)),
            }
        )

    out = ranked.map_batches(finish, batch_format="pyarrow").to_pandas()
    out["event_id"] = out["event_id"].astype("int64")
    return out.sort_values("event_id").reset_index(drop=True)


def event_type_user_counts(sf_dir: str) -> pd.DataFrame:
    """Exact per-type distinct-user count via the salted holistic
    aggregate (functions/partitioning.salted_distinct_count) — each of
    the 5 event_type keys is a deliberate hot key (every block touches
    every key), exercising the hot-key fan-out path."""
    from ..functions.partitioning import salted_distinct_count

    ev = _pq(sf_dir, "events", columns=["event_type", "user_id"])
    out = (
        salted_distinct_count(ev, "event_type", "user_id", out_col="n_users")
        .to_pandas()
        .sort_values("event_type")
        .reset_index(drop=True)
    )
    out["n_users"] = out["n_users"].astype("int64")
    return out


def events_zscore(sf_dir: str) -> pd.DataFrame:
    """Group-wise normalization (z-score per event_type) as the canonical
    two-pass broadcast pattern: pass 1 reduces each block to (n, sum,
    sumsq) partials per type — the key space is dimension-bounded (5
    types), so the partials are merged on the driver (playbook: each Ray
    groupby costs ~1.2 s fixed on this box) — then the 5-row stats table
    is ``ray.put`` once and pass 2 normalizes every row vectorized. At
    100 TB this is two streaming scans and zero shuffles; the broadcast
    side is O(#groups), never O(rows).
    """
    ev = _pq(sf_dir, "events", columns=["event_id", "event_type", "value"])

    def partial(batch: pa.Table) -> pa.Table:
        v = np.asarray(batch["value"], dtype=np.float64)
        g = pd.DataFrame(
            {"event_type": batch["event_type"].to_pandas(), "v": v, "v2": v * v}
        ).groupby("event_type", sort=False).agg(
            n=("v", "size"), s=("v", "sum"), s2=("v2", "sum")
        )
        return pa.Table.from_pandas(g.reset_index())

    parts = ev.map_batches(partial, batch_format="pyarrow").to_pandas()
    stats = parts.groupby("event_type").sum()
    mean = stats["s"] / stats["n"]
    # population stddev, matching SQL stddev_pop
    std = np.sqrt(stats["s2"] / stats["n"] - mean * mean)
    # broadcast as dense arrays keyed by sorted type (playbook: pandas
    # .map(dict) costs ~11us/row; Index.get_indexer + numpy take is C)
    type_arr = stats.index.to_numpy()
    order = np.argsort(type_arr)
    stats_ref = ray.put(
        (
            pd.Index(type_arr[order]),
            mean.to_numpy()[order],
            std.to_numpy()[order],
        )
    )

    def normalize(batch: pa.Table) -> pa.Table:
        idx, mean_arr, std_arr = _bget(stats_ref)
        codes = idx.get_indexer(batch["event_type"].to_pandas())
        z = (
            np.asarray(batch["value"], dtype=np.float64) - mean_arr[codes]
        ) / std_arr[codes]
        return pa.table(
            {
                "event_id": batch["event_id"],
                "event_type": batch["event_type"],
                "zscore": pa.array(np.round(z, 4)),
            }
        )

    out = ev.map_batches(normalize, batch_format="pyarrow").to_pandas()
    out["event_id"] = out["event_id"].astype("int64")
    return out.sort_values("event_id").reset_index(drop=True)


def events_lag_delta(sf_dir: str) -> pd.DataFrame:
    """LAG window function per partition key: consecutive-event value
    deltas within each user's (ts, event_id) order, digested per user.
    One hash shuffle on user_id at partition granularity
    (functions/partitioning.groupby_partition), vectorized pandas
    ``groupby.diff`` inside — the same shape sessionize_events uses, so
    skew and scale behavior are shared."""
    from ..functions.partitioning import groupby_partition

    ev = _pq(sf_dir, "events", columns=["event_id", "user_id", "ts", "value"])

    def deltas(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(["user_id", "ts", "event_id"])
        d = df.groupby("user_id", sort=False)["value"].diff().abs()
        agg = (
            pd.DataFrame({"user_id": df["user_id"].to_numpy(), "d": d.to_numpy()})
            .groupby("user_id")["d"]
            .agg(n_deltas="count", sum_abs_delta="sum")
            .reset_index()
        )
        agg["n_deltas"] = agg["n_deltas"].astype("int64")
        agg["sum_abs_delta"] = agg["sum_abs_delta"].round(2)
        return agg

    out = (
        groupby_partition(ev, "user_id", deltas, batch_format="pandas")
        .to_pandas()
        .astype({"user_id": "int64", "n_deltas": "int64"})
    )
    return out.sort_values("user_id").reset_index(drop=True)


def events_winsorized(sf_dir: str) -> pd.DataFrame:
    """Per-group outlier clipping (winsorize at p05/p95): pass 1 computes
    exact per-type bounds (partition-granular, quantile_disc convention),
    pass 2 broadcasts the 5-row bounds table and clips vectorized —
    digested per type as clip counts + clipped-sum so the oracle hashes a
    bounded table. Same two-scan zero-shuffle shape as events_zscore."""
    import math

    from ..functions.partitioning import groupby_partition

    ev = _pq(sf_dir, "events", columns=["event_type", "value"])

    def bounds(df: pd.DataFrame) -> pd.DataFrame:
        rows = []
        for t, sub in df.groupby("event_type", sort=False):
            v = np.sort(sub["value"].to_numpy())
            n = len(v)
            lo = v[max(math.ceil(0.05 * n) - 1, 0)]
            hi = v[max(math.ceil(0.95 * n) - 1, 0)]
            rows.append({"event_type": t, "lo": lo, "hi": hi})
        return pd.DataFrame(rows, columns=["event_type", "lo", "hi"])

    b = (
        groupby_partition(ev, "event_type", bounds, batch_format="pandas")
        .to_pandas()
        .sort_values("event_type")
    )
    # dense arrays, built ONCE (not per batch): Index.get_indexer + take
    bounds_ref = ray.put(
        (
            pd.Index(b["event_type"].to_numpy()),
            b["lo"].to_numpy(dtype=np.float64),
            b["hi"].to_numpy(dtype=np.float64),
        )
    )

    def clip_partial(batch: pa.Table) -> pa.Table:
        idx, lo_arr, hi_arr = _bget(bounds_ref)
        types = batch["event_type"].to_pandas()
        codes = idx.get_indexer(types)
        lo = lo_arr[codes]
        hi = hi_arr[codes]
        df = pd.DataFrame(
            {
                "event_type": types,
                "v": np.asarray(batch["value"], dtype=np.float64),
            }
        )
        clipped = np.clip(df["v"].to_numpy(), lo, hi)
        df = df.assign(
            clipped=clipped,
            is_lo=(df["v"].to_numpy() < lo).astype("int64"),
            is_hi=(df["v"].to_numpy() > hi).astype("int64"),
        )
        g = df.groupby("event_type", sort=False).agg(
            n_events=("v", "size"),
            n_clip_lo=("is_lo", "sum"),
            n_clip_hi=("is_hi", "sum"),
            sum_clipped=("clipped", "sum"),
        )
        return pa.Table.from_pandas(g.reset_index())

    parts = ev.map_batches(clip_partial, batch_format="pyarrow").to_pandas()
    out = parts.groupby("event_type").sum().reset_index()
    out["sum_clipped"] = out["sum_clipped"].round(2)
    for c in ("n_events", "n_clip_lo", "n_clip_hi"):
        out[c] = out[c].astype("int64")
    return out.sort_values("event_type").reset_index(drop=True)


def events_quantiles_hist(sf_dir: str, width: float = 5.0) -> pd.DataFrame:
    """Per-group approximate quantiles from a MERGEABLE fixed-width
    histogram sketch — the scale path events_quantiles' docstring points
    to for keys whose values exceed a partition: per-block (type, bin)
    counts are order-insensitive partials (bincount sums commute, so the
    result is deterministic at any parallelism, unlike rank-based
    sketches), the merged histogram is (types x bins)-bounded, and the
    q-th value is read off the cumulative counts with error <= width/2
    (estimate = midpoint of the bin holding rank ceil(q*n)). The same
    read-off is exact SQL over cumulative bin counts — a hash oracle, not
    a tolerance check."""
    ev = _pq(sf_dir, "events", columns=["event_type", "value"])

    def partial(batch: pa.Table) -> pa.Table:
        df = pd.DataFrame(
            {
                "event_type": batch["event_type"].to_pandas(),
                "bin": np.floor(
                    np.asarray(batch["value"], dtype=np.float64) / width
                ).astype(np.int64),
            }
        )
        g = df.groupby(["event_type", "bin"], sort=False).size().rename("n")
        return pa.Table.from_pandas(g.reset_index())

    # (types x bins x blocks) partials, merged on the driver (bounded)
    parts = ev.map_batches(partial, batch_format="pyarrow").to_pandas()
    hist = (
        parts.groupby(["event_type", "bin"])["n"].sum().reset_index()
        .sort_values(["event_type", "bin"])
    )
    import math

    rows = []
    for t, sub in hist.groupby("event_type", sort=True):
        n = int(sub["n"].sum())
        cum = sub["n"].cumsum().to_numpy()
        bins = sub["bin"].to_numpy()
        row = {"event_type": t, "n_events": n}
        for q in (0.25, 0.5, 0.9):
            rank = max(math.ceil(q * n), 1)
            b = bins[np.searchsorted(cum, rank)]
            row[f"q{int(q * 100)}"] = round((b + 0.5) * width, 2)
        rows.append(row)
    out = pd.DataFrame(rows, columns=["event_type", "n_events", "q25", "q50", "q90"])
    out["n_events"] = out["n_events"].astype("int64")
    return out.reset_index(drop=True)


def events_interval_join(sf_dir: str) -> pd.DataFrame:
    """Generic interval (range) join exercised end-to-end: derive each
    user's session validity windows [min ts, max ts] (distributed, same
    gap rule as sessionize_events), then interval-join the raw event
    stream back against them (stages/joins.interval_join — tagged-union
    co-group on user_id, vectorized per-partition merge_asof +
    containment mask) and digest per user. Every event lands in exactly
    one closed session span, so n_matched == n_events — an invariant the
    SQL oracle recomputes independently via window functions + BETWEEN."""
    from ..functions.partitioning import groupby_partition
    from ..stages.joins import interval_join

    ev = _pq(sf_dir, "events", columns=["user_id", "ts", "event_id"])

    def spans(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["user_id", "ts", "event_id"], kind="stable")
        gaps = g.groupby("user_id")["ts"].diff().dt.total_seconds().fillna(0.0)
        sid = (gaps > SESSION_GAP_MIN * 60).groupby(g["user_id"]).cumsum()
        agg = (
            g.assign(_sid=sid)
            .groupby(["user_id", "_sid"])["ts"]
            .agg(s_start="min", s_end="max")
            .reset_index()
            .rename(columns={"_sid": "session_id"})
        )
        return agg.astype({"user_id": "int64", "session_id": "int64"})

    intervals = groupby_partition(ev, "user_id", spans, batch_format="pandas")
    joined = interval_join(
        ev, intervals, by="user_id", on="ts",
        start_col="s_start", end_col="s_end", right_cols=["session_id"],
    )

    def digest(t: pa.Table) -> pa.Table:
        # per-block (user, session) match counts — mergeable partials
        # (a groupby output block may split a user, so nunique must be
        # taken after the driver merge, not per block)
        df = t.to_pandas()
        g = df.groupby(["user_id", "session_id_r"]).size().rename("n")
        return pa.Table.from_pandas(g.reset_index())

    parts = joined.map_batches(digest, batch_format="pyarrow").to_pandas()
    merged = parts.groupby(["user_id", "session_id_r"])["n"].sum().reset_index()
    out = (
        merged.groupby("user_id")
        .agg(n_matched=("n", "sum"), n_sessions=("session_id_r", "nunique"))
        .reset_index()
        .astype({"user_id": "int64", "n_matched": "int64", "n_sessions": "int64"})
    )
    return out.sort_values("user_id").reset_index(drop=True)


def events_cube(sf_dir: str) -> pd.DataFrame:
    """Full CUBE grouping sets over (event_type, iso weekday): one
    partial-agg pass over the finest grain feeds all FOUR grouping sets —
    the coarser sets reduce the (types x 7 x blocks)-bounded partials on
    the driver, so the cube costs zero extra shuffles (same combiner
    shape as events_rollup, one level up)."""
    ev = _pq(sf_dir, "events", columns=["event_type", "ts", "value"])

    def partial(t: pa.Table) -> pa.Table:
        df = pd.DataFrame(
            {
                "event_type": t["event_type"].to_pandas(),
                "weekday": t["ts"].to_pandas().dt.dayofweek + 1,  # ISO 1-7
                "v": np.asarray(t["value"], dtype=np.float64),
            }
        )
        g = df.groupby(["event_type", "weekday"], sort=False).agg(
            psum=("v", "sum"), pn=("v", "size")
        )
        return pa.Table.from_pandas(g.reset_index())

    parts = ev.map_batches(partial, batch_format="pyarrow").to_pandas()
    fine = (
        parts.groupby(["event_type", "weekday"], as_index=False)
        .agg(sum_value=("psum", "sum"), n_events=("pn", "sum"))
    )

    def coarsen(df: pd.DataFrame, keys: list) -> pd.DataFrame:
        if keys:
            g = df.groupby(keys, as_index=False).agg(
                sum_value=("sum_value", "sum"), n_events=("n_events", "sum")
            )
        else:
            g = pd.DataFrame(
                {"sum_value": [df["sum_value"].sum()],
                 "n_events": [df["n_events"].sum()]}
            )
        if "event_type" not in g:
            g["event_type"] = "ALL"
        if "weekday" not in g:
            g["weekday"] = -1
        return g[["event_type", "weekday", "sum_value", "n_events"]]

    out = pd.concat(
        [
            coarsen(fine, ["event_type", "weekday"]),
            coarsen(fine, ["event_type"]),
            coarsen(fine, ["weekday"]),
            coarsen(fine, []),
        ],
        ignore_index=True,
    )
    out["sum_value"] = out["sum_value"].round(2)
    out = out.astype({"weekday": "int64", "n_events": "int64"})
    return out.sort_values(["event_type", "weekday"]).reset_index(drop=True)


def events_profile(sf_dir: str) -> pd.DataFrame:
    """Data-profiling pass (ingest validation): per numeric column, row /
    null counts and min/max/sum in ONE streamed scan — each block reduces
    to a (columns x 5) partial merged on the driver (column-bounded;
    zero shuffles). The long-format output is UNION ALL per column in the
    oracle."""
    cols = ["event_id", "user_id", "value"]
    ev = _pq(sf_dir, "events", columns=cols)

    def partial(t: pa.Table) -> pa.Table:
        rows = []
        for c in cols:
            col = t[c]
            nulls = int(col.null_count)
            ok_col = col.drop_null() if nulls else col
            is_int = pa.types.is_integer(col.type)
            if is_int:
                # exact int64 accumulation: float64 partials drift past
                # the 0.005 rounding granularity once sums approach 2^53
                # (review finding — the oracle sums in exact HUGEINT).
                # Missing is encoded as (is_int flag + 0), NOT null —
                # int64-with-null degrades to float64 through pandas.
                v = np.asarray(ok_col.cast(pa.int64()))
                s_int, s_flt = int(v.sum()) if len(v) else 0, 0.0
            else:
                v = np.asarray(ok_col.cast(pa.float64()), dtype=np.float64)
                s_int, s_flt = 0, float(v.sum())
            rows.append(
                {
                    "col_name": c,
                    "n_rows": t.num_rows,
                    "n_nulls": nulls,
                    "min_val": float(v.min()) if len(v) else np.nan,
                    "max_val": float(v.max()) if len(v) else np.nan,
                    "is_int": is_int,
                    "sum_int": s_int,
                    "sum_flt": s_flt,
                }
            )
        df = pd.DataFrame(rows)
        df["sum_int"] = df["sum_int"].astype("int64")
        return pa.Table.from_pandas(df)

    parts = ev.map_batches(partial, batch_format="pyarrow").to_pandas()
    out = (
        parts.groupby("col_name")
        .agg(
            n_rows=("n_rows", "sum"),
            n_nulls=("n_nulls", "sum"),
            min_val=("min_val", "min"),
            max_val=("max_val", "max"),
            is_int=("is_int", "first"),
            sum_int=("sum_int", "sum"),
            sum_flt=("sum_flt", "sum"),
        )
        .reset_index()
        .astype({"n_rows": "int64", "n_nulls": "int64"})
    )
    out["sum_val"] = np.where(
        out["is_int"], out["sum_int"].astype("float64"), out["sum_flt"]
    )
    out = out.drop(columns=["is_int", "sum_int", "sum_flt"])
    for c in ("min_val", "max_val", "sum_val"):
        out[c] = out[c].round(2)
    return out.sort_values("col_name").reset_index(drop=True)


def customer_events_full_outer(sf_dir: str) -> pd.DataFrame:
    """FULL OUTER hash join with orphans engineered on BOTH sides (odd
    customer keys < 300 vs the 0-149 user-id space): per-user event
    counts (combiner) full-outer-joined to a filtered customer slice
    (stages/joins.hash_join, Ray native hash shuffle), then a side-label
    digest — proving unmatched-left, unmatched-right and matched rows all
    survive with correct null semantics."""
    from ..stages.joins import hash_join

    cust = _pq(sf_dir, "customer", columns=["c_custkey", "c_acctbal"])

    def odd_slice(t: pa.Table) -> pa.Table:
        k = np.asarray(t["c_custkey"])
        return t.filter(pa.array((k < 300) & (k % 2 == 1)))

    left = cust.map_batches(odd_slice, batch_format="pyarrow")

    ev = _pq(sf_dir, "events", columns=["user_id"])

    def count_partial(t: pa.Table) -> pa.Table:
        g = t.group_by("user_id", use_threads=False).aggregate([([], "count_all")])
        return g.rename_columns(["user_id", "n"])

    from ray.data.aggregate import Sum

    right = (
        ev.map_batches(count_partial, batch_format="pyarrow")
        .groupby("user_id")
        .aggregate(Sum("n", alias_name="n_events"))
    )

    joined = hash_join(
        left, right, on="c_custkey", right_on="user_id", how="full_outer"
    ).to_pandas()

    # Ray's native full_outer COALESCES the join keys into one column
    # (c_custkey is non-null even for right-only rows), so side detection
    # uses payload nullness: c_acctbal / n_events are non-null on their
    # own side by construction (customer.acctbal has no nulls; n_events
    # is a count)
    has_l = joined["c_acctbal"].notna()
    has_r = joined["n_events"].notna()
    side = np.where(has_l & has_r, "both", np.where(has_l, "left_only", "right_only"))
    out = (
        pd.DataFrame(
            {
                "side": side,
                "acctbal": joined["c_acctbal"].fillna(0.0),
                "n_events": joined["n_events"].fillna(0),
            }
        )
        .groupby("side")
        .agg(
            n_rows=("side", "size"),
            sum_acctbal=("acctbal", "sum"),
            sum_events=("n_events", "sum"),
        )
        .reset_index()
    )
    out["sum_acctbal"] = out["sum_acctbal"].round(2)
    out = out.astype({"n_rows": "int64", "sum_events": "int64"})
    return out.sort_values("side").reset_index(drop=True)


def events_funnel(sf_dir: str) -> pd.DataFrame:
    """Ordered funnel analysis (view -> click -> purchase): a user
    advances a step only with a STRICTLY LATER event of the next type
    (first-touch semantics: tc = first click after first view, tp =
    first purchase after that click). Order-sensitive per-user logic runs
    at hash-partition granularity (one vectorized pandas pass per
    partition, users never split); partitions emit 3-row step-count
    partials summed on the driver."""
    from ..functions.partitioning import groupby_partition

    ev = _pq(sf_dir, "events", columns=["user_id", "ts", "event_type"])

    def steps(df: pd.DataFrame) -> pd.DataFrame:
        tv = (
            df[df["event_type"] == "view"].groupby("user_id")["ts"].min()
            .rename("tv").reset_index()
        )
        clicks = df[df["event_type"] == "click"].merge(tv, on="user_id")
        tc = (
            clicks[clicks["ts"] > clicks["tv"]]
            .groupby("user_id")["ts"].min().rename("tc").reset_index()
        )
        buys = df[df["event_type"] == "purchase"].merge(tc, on="user_id")
        tp = (
            buys[buys["ts"] > buys["tc"]]
            .groupby("user_id")["ts"].min()
        )
        return pd.DataFrame(
            {
                "step": ["step1_view", "step2_click", "step3_purchase"],
                "n_users": [len(tv), len(tc), len(tp)],
            }
        )

    parts = groupby_partition(ev, "user_id", steps, batch_format="pandas").to_pandas()
    out = (
        parts.groupby("step", as_index=False)["n_users"].sum()
        .astype({"n_users": "int64"})
        .sort_values("step")
        .reset_index(drop=True)
    )
    return out


def events_retention(sf_dir: str) -> pd.DataFrame:
    """Cohort retention matrix: users grouped by the ISO week of their
    first event (cohort), counted once per (cohort, week-offset) they
    were active in. ONE user-partition pass computes each user's cohort
    and active-week set together (no join — both derive from the same
    partition-local rows), emitting bounded (cohort, offset, n) partials;
    the driver sums them. Weeks are Monday-truncated to match DuckDB's
    date_trunc('week')."""
    from ..functions.partitioning import groupby_partition

    ev = _pq(sf_dir, "events", columns=["user_id", "ts"])

    def cohorts(df: pd.DataFrame) -> pd.DataFrame:
        wk = df["ts"].dt.to_period("W").dt.start_time
        d = pd.DataFrame({"user_id": df["user_id"], "w": wk}).drop_duplicates()
        cw = d.groupby("user_id")["w"].min().rename("cw").reset_index()
        j = d.merge(cw, on="user_id")
        j["week_offset"] = ((j["w"] - j["cw"]).dt.days // 7).astype("int64")
        j["cohort_week"] = j["cw"].dt.strftime("%Y-%m-%d")
        # distinct users per (cohort, offset): a user lives in exactly one
        # partition, so partial counts sum exactly
        out = (
            j.groupby(["cohort_week", "week_offset"])["user_id"]
            .nunique()
            .rename("n_users")
            .reset_index()
        )
        return out

    parts = groupby_partition(ev, "user_id", cohorts, batch_format="pandas").to_pandas()
    out = (
        parts.groupby(["cohort_week", "week_offset"], as_index=False)["n_users"]
        .sum()
        .astype({"week_offset": "int64", "n_users": "int64"})
        .sort_values(["cohort_week", "week_offset"])
        .reset_index(drop=True)
    )
    return out


def largest_order_per_customer(sf_dir: str, limit_keys: int = 200) -> pd.DataFrame:
    """Per-group argmax with payload (each customer's single largest
    order): per-block argmax combiner (at most one row per customer per
    block leaves the scan) -> partition-granular final argmax. Restricted
    to custkey < 200 so the output stays driver-sized; ties broken by
    smaller o_orderkey, matching the oracle's window order exactly."""
    from ..functions.partitioning import groupby_partition

    orders = _pq(
        sf_dir, "orders", columns=["o_orderkey", "o_custkey", "o_totalprice"]
    )

    def local_argmax(df: pd.DataFrame) -> pd.DataFrame:
        df = df[df["o_custkey"] < limit_keys]
        if not len(df):
            return df
        df = df.sort_values(
            ["o_custkey", "o_totalprice", "o_orderkey"],
            ascending=[True, False, True],
        )
        return df.groupby("o_custkey", sort=False).head(1)

    pruned = orders.map_batches(local_argmax, batch_format="pandas")
    out = (
        groupby_partition(pruned, "o_custkey", local_argmax, batch_format="pandas")
        .to_pandas()
        .astype({"o_orderkey": "int64", "o_custkey": "int64"})
    )
    out["o_totalprice"] = out["o_totalprice"].round(2)
    return (
        out[["o_custkey", "o_orderkey", "o_totalprice"]]
        .sort_values("o_custkey")
        .reset_index(drop=True)
    )


def events_pivot(sf_dir: str) -> pd.DataFrame:
    """Long->wide reshape (pivot): event_type rows x ISO-weekday columns
    of summed value. The finest-grain combiner from events_cube feeds a
    driver-side pivot of (types x 7) partials; column names wd1..wd7 are
    fixed so the conditional-aggregation oracle matches by name."""
    ev = _pq(sf_dir, "events", columns=["event_type", "ts", "value"])

    def partial(t: pa.Table) -> pa.Table:
        df = pd.DataFrame(
            {
                "event_type": t["event_type"].to_pandas(),
                "wd": t["ts"].to_pandas().dt.dayofweek + 1,
                "v": np.asarray(t["value"], dtype=np.float64),
            }
        )
        g = df.groupby(["event_type", "wd"], sort=False)["v"].sum().rename("s")
        return pa.Table.from_pandas(g.reset_index())

    parts = ev.map_batches(partial, batch_format="pyarrow").to_pandas()
    fine = parts.groupby(["event_type", "wd"])["s"].sum().reset_index()
    wide = fine.pivot_table(
        index="event_type", columns="wd", values="s", fill_value=0.0
    )
    out = pd.DataFrame({"event_type": wide.index})
    for wd in range(1, 8):
        col = wide[wd] if wd in wide.columns else 0.0
        out[f"wd{wd}"] = np.round(np.asarray(col, dtype=np.float64), 2)
    return out.sort_values("event_type").reset_index(drop=True)


def segment_priority_revenue(
    sf_dir: str, broadcast_limit: int | None = None
) -> pd.DataFrame:
    """3-table pipeline with BOTH join strategies in one plan: customer
    (dim) broadcast-attached to orders inside map_batches (dense
    custkey -> segment-code array, one numpy take per batch), then
    orders x lineitem — two FACT tables — through the native
    hash-shuffle join on the order key, finished by a (segment x
    priority)-bounded combiner merged on the driver. The strategy split
    is the point: broadcast what is dimension-sized, shuffle only the
    fact-fact equi-join the broadcast pattern cannot express. Above
    ``broadcast_limit`` customer rows (default BROADCAST_DIM_ROW_LIMIT)
    the dense array would grow with SF, so the dim attach routes through
    the hash join instead — same output either way."""
    from ..stages import joins

    if broadcast_limit is None:
        broadcast_limit = BROADCAST_DIM_ROW_LIMIT
    cust_ds = _pq(sf_dir, "customer", columns=["c_custkey", "c_mktsegment"])

    orders = _pq(
        sf_dir, "orders", columns=["o_orderkey", "o_custkey", "o_orderpriority"]
    )

    if cust_ds.count() <= broadcast_limit:
        cust = cust_ds.to_pandas()
        n_keys = int(cust["c_custkey"].max()) + 1
        seg_labels, seg_src = np.unique(
            cust["c_mktsegment"].to_numpy(), return_inverse=True
        )
        seg_by_key = np.zeros(n_keys, dtype=np.int32)
        seg_by_key[cust["c_custkey"].to_numpy()] = seg_src
        dim_ref = ray.put(seg_by_key)

        def attach_seg(batch: pa.Table) -> pa.Table:
            seg = _bget(dim_ref)[np.asarray(batch["o_custkey"])]
            return pa.table(
                {
                    "o_orderkey": batch["o_orderkey"],
                    "seg_code": pa.array(seg, pa.int32()),
                    "o_orderpriority": batch["o_orderpriority"],
                }
            )

        tagged = orders.map_batches(attach_seg, batch_format="pyarrow")
    else:
        # SF-scaled dim: hash-join attach, then map the segment label to
        # the same code space so the downstream combiner is identical
        seg_labels = np.unique(
            cust_ds.map_batches(
                lambda t: pa.table(
                    {"s": pa.compute.unique(t["c_mktsegment"].combine_chunks())}
                ),
                batch_format="pyarrow",
            ).to_pandas()["s"].to_numpy()
        )
        lab_ref = ray.put({s: i for i, s in enumerate(seg_labels)})
        joined_dim = joins.hash_join(
            orders, cust_ds, on="o_custkey", right_on="c_custkey"
        )

        def code_seg(batch: pa.Table) -> pa.Table:
            lab = _bget(lab_ref)
            seg = np.array(
                [lab[s] for s in batch["c_mktsegment"].to_pylist()], np.int32
            )
            return pa.table(
                {
                    "o_orderkey": batch["o_orderkey"],
                    "seg_code": pa.array(seg, pa.int32()),
                    "o_orderpriority": batch["o_orderpriority"],
                }
            )

        tagged = joined_dim.map_batches(code_seg, batch_format="pyarrow")
    li = _pq(
        sf_dir, "lineitem",
        columns=["l_orderkey", "l_extendedprice", "l_discount"],
    )
    joined = joins.hash_join(li, tagged, on="l_orderkey", right_on="o_orderkey")

    def combine(batch: pa.Table) -> pa.Table:
        df = pd.DataFrame(
            {
                "seg_code": np.asarray(batch["seg_code"]),
                "o_orderpriority": batch["o_orderpriority"].to_pandas(),
                "rev": np.asarray(batch["l_extendedprice"], np.float64)
                * (1.0 - np.asarray(batch["l_discount"], np.float64)),
            }
        )
        g = df.groupby(["seg_code", "o_orderpriority"], sort=False).agg(
            n_lines=("rev", "size"), sum_revenue=("rev", "sum")
        )
        return pa.Table.from_pandas(g.reset_index(), preserve_index=False)

    parts = joined.map_batches(combine, batch_format="pyarrow").to_pandas()
    out = parts.groupby(["seg_code", "o_orderpriority"], as_index=False).agg(
        n_lines=("n_lines", "sum"), sum_revenue=("sum_revenue", "sum")
    )
    out["c_mktsegment"] = seg_labels[out["seg_code"].to_numpy()]
    out["n_lines"] = out["n_lines"].astype("int64")
    out["sum_revenue"] = out["sum_revenue"].round(2)
    return (
        out[["c_mktsegment", "o_orderpriority", "n_lines", "sum_revenue"]]
        .sort_values(["c_mktsegment", "o_orderpriority"])
        .reset_index(drop=True)
    )


def events_variance_udaf(sf_dir: str) -> pd.DataFrame:
    """Population variance per event_type through Ray Data's NATIVE
    custom-aggregation protocol (AggregateFn with init / vectorized
    accumulate_block / merge / finalize) — the API-level UDAF path, as
    opposed to the hand-rolled map-side combiners used elsewhere
    (events_corr). The accumulator is the mergeable moment triple
    (n, sum, sumsq); accumulate_block is one numpy pass per block, so the
    shuffle moves 3 floats per (group, block). Oracle: var_pop SQL."""
    from ray.data.aggregate import AggregateFn

    ev = _pq(sf_dir, "events", columns=["event_type", "value"])

    var = AggregateFn(
        init=lambda k: (0, 0.0, 0.0),
        accumulate_block=lambda a, blk: (
            a[0] + blk.num_rows,
            a[1] + float(np.asarray(blk["value"], np.float64).sum()),
            a[2] + float((np.asarray(blk["value"], np.float64) ** 2).sum()),
        ),
        merge=lambda a, b: (a[0] + b[0], a[1] + b[1], a[2] + b[2]),
        finalize=lambda a: round(a[2] / a[0] - (a[1] / a[0]) ** 2, 6),
        name="var_pop",
    )
    out = ev.groupby("event_type").aggregate(var).to_pandas()
    return out.sort_values("event_type").reset_index(drop=True)


def events_mad(sf_dir: str) -> pd.DataFrame:
    """Robust statistics per group: median and median-absolute-deviation
    of value per event_type. Exact medians need the group's values in
    one place, so this is ONE type-keyed partition pass
    (groupby_partition, group-closed) with vectorized np.median — the
    same linear-interpolation convention as quantile_cont, which the
    oracle spells out instead of DuckDB's mad() (whose tie convention
    differs). Types are few; at a skewed 100 TB the per-type sample
    quantile path (events_quantiles_sampled) is the fallback."""
    from ..functions.partitioning import groupby_partition

    ev = _pq(sf_dir, "events", columns=["event_type", "value"])

    schema = pa.schema(
        [("event_type", pa.string()), ("n", pa.int64()),
         ("median", pa.float64()), ("mad", pa.float64())]
    )

    def stats(part: pa.Table) -> pa.Table:
        df = part.to_pandas()
        rows = []
        for et, g in df.groupby("event_type", sort=False):
            v = g["value"].to_numpy(np.float64)
            med = float(np.median(v))
            rows.append(
                {
                    "event_type": et,
                    "n": len(v),
                    "median": round(med, 6),
                    "mad": round(float(np.median(np.abs(v - med))), 6),
                }
            )
        return pa.Table.from_pandas(
            pd.DataFrame(rows, columns=["event_type", "n", "median", "mad"]),
            preserve_index=False,
        ).cast(schema)

    out = groupby_partition(ev, "event_type", stats, schema=schema).to_pandas()
    out["n"] = out["n"].astype("int64")
    return out.sort_values("event_type").reset_index(drop=True)


def events_top_weekday(sf_dir: str) -> pd.DataFrame:
    """Deterministic mode: the busiest ISO weekday per event_type (ties
    -> smallest weekday — an EXPLICIT convention, unlike SQL mode()'s
    unspecified tie order). Combiner shape: (type, wd, n) partials per
    block — 35 rows max — merged and argmaxed on the driver. Oracle:
    row_number() over (count desc, wd asc)."""
    ev = _pq(sf_dir, "events", columns=["event_type", "ts"])

    def partial(t: pa.Table) -> pa.Table:
        df = pd.DataFrame(
            {
                "event_type": t["event_type"].to_pandas(),
                "wd": t["ts"].to_pandas().dt.dayofweek + 1,
            }
        )
        g = df.groupby(["event_type", "wd"], sort=False).size().rename("n")
        return pa.Table.from_pandas(g.reset_index(), preserve_index=False)

    parts = ev.map_batches(partial, batch_format="pyarrow").to_pandas()
    fine = parts.groupby(["event_type", "wd"], as_index=False)["n"].sum()
    fine = fine.sort_values(["event_type", "n", "wd"], ascending=[True, False, True])
    out = fine.groupby("event_type", as_index=False).head(1)
    out = out.rename(columns={"wd": "top_wd"})
    out["top_wd"] = out["top_wd"].astype("int64")
    out["n"] = out["n"].astype("int64")
    return (
        out[["event_type", "top_wd", "n"]]
        .sort_values("event_type")
        .reset_index(drop=True)
    )


def events_late_arrivals(sf_dir: str) -> pd.DataFrame:
    """Streaming watermark semantics: per user, events ARRIVE in
    simulated out-of-order delivery (arrival time = event time plus a
    deterministic (event_id % 7) * 30 s network delay); the watermark
    trails the running max EVENT time seen so far by 60 s, and an event
    is LATE iff its event time falls behind the watermark at arrival
    (the Dataflow-model allowed-lateness rule). One user_id-keyed
    partition pass, numpy running max inside — arrival state never
    leaves the partition, exactly how a keyed streaming shuffle would
    hold it. Exact-integer microsecond math (playbook: epoch() is float).
    """
    from ..functions.partitioning import groupby_partition

    ev = _pq(sf_dir, "events", columns=["event_id", "user_id", "ts"])

    def late(df: pd.DataFrame) -> pd.DataFrame:
        ts_us = df["ts"].astype("datetime64[us]").astype("int64")
        eid = df["event_id"].astype("int64")
        df = pd.DataFrame(
            {"event_id": eid.to_numpy(), "user_id": df["user_id"].to_numpy(),
             "tus": ts_us.to_numpy(),
             "atus": ts_us.to_numpy() + (eid.to_numpy() % 7) * 30_000_000}
        ).sort_values(["user_id", "atus", "event_id"])
        out_frames = []
        tus_all = df["tus"].to_numpy()
        for uid, grp_idx in df.groupby("user_id", sort=False).indices.items():
            t = tus_all[grp_idx]
            if len(t) < 2:
                continue
            run_max = np.maximum.accumulate(t)
            prev_max = np.empty_like(t)
            prev_max[0] = np.iinfo(np.int64).min
            prev_max[1:] = run_max[:-1]
            late_by_us = prev_max - t - 60_000_000
            mask = (late_by_us > 0) & (prev_max != np.iinfo(np.int64).min)
            if mask.any():
                out_frames.append(
                    pd.DataFrame(
                        {
                            "event_id": df["event_id"].to_numpy()[grp_idx][mask],
                            "user_id": uid,
                            "late_by_s": late_by_us[mask] // 1_000_000,
                        }
                    )
                )
        if not out_frames:
            return pd.DataFrame(
                {"event_id": pd.Series([], dtype="int64"),
                 "user_id": pd.Series([], dtype="int64"),
                 "late_by_s": pd.Series([], dtype="int64")}
            )
        out = pd.concat(out_frames, ignore_index=True)
        return out.astype(
            {"event_id": "int64", "user_id": "int64", "late_by_s": "int64"}
        )

    import pyarrow as _pa

    schema = _pa.schema(
        [("event_id", _pa.int64()), ("user_id", _pa.int64()),
         ("late_by_s", _pa.int64())]
    )
    out = groupby_partition(
        ev, "user_id", late, batch_format="pandas", schema=schema
    ).to_pandas()
    if out.empty:
        return pd.DataFrame(
            {"event_id": pd.Series([], dtype="int64"),
             "user_id": pd.Series([], dtype="int64"),
             "late_by_s": pd.Series([], dtype="int64")}
        )
    return out.sort_values("event_id").reset_index(drop=True)


def events_user_hll(sf_dir: str) -> pd.DataFrame:
    """Per-group approximate distinct count as a MERGEABLE sketch UDAF:
    each block folds its (event_type, user_id) pairs into one HLL
    register vector per type (functions/sketch; 4 KiB each), the driver
    merge is an elementwise max over types x blocks rows — at 10^12
    events the exchanged state is bounded by |types| x blocks x 4 KiB,
    never by cardinality (contrast events_distinct_users, the EXACT
    salted holistic path). Deterministic hash -> the estimate is
    bit-reproducible; oracle is a serial recomputation fixture."""
    from ..functions.sketch import hll_estimate, hll_merge, hll_registers

    ev = _pq(sf_dir, "events", columns=["event_type", "user_id"])

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        rows = []
        for et, grp in df.groupby("event_type", sort=False):
            regs = hll_registers(grp["user_id"].to_numpy())
            rows.append({"event_type": et, "regs": regs.tobytes()})
        return pd.DataFrame(rows, columns=["event_type", "regs"])

    parts = ev.map_batches(partial, batch_format="pandas").to_pandas()
    out_rows = []
    for et, grp in parts.groupby("event_type"):
        stacked = np.stack(
            [np.frombuffer(b, dtype=np.int8) for b in grp["regs"]]
        )
        regs = hll_merge(stacked)
        out_rows.append(
            {
                "event_type": et,
                "n_users_est": round(hll_estimate(regs), 2),
                "nonzero_registers": int((regs > 0).sum()),
            }
        )
    out = pd.DataFrame(
        out_rows, columns=["event_type", "n_users_est", "nonzero_registers"]
    ).astype({"nonzero_registers": "int64"})
    return out.sort_values("event_type").reset_index(drop=True)


def docs_zone_maps(sf_dir: str) -> pd.DataFrame:
    """Scan-pruning zone maps: per (lang, source) partition cell, the
    min/max/count metadata a reader uses to skip row groups (the
    Parquet-footer / Iceberg-manifest story, computed as an engine
    operator). Pure block combiner -> driver merge over a
    dimension-bounded (cells x blocks) partial table; zero shuffles."""
    docs = _pq(
        sf_dir, "documents", columns=["doc_id", "lang", "source", "n_chars"]
    )

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        agg = (
            df.groupby(["lang", "source"])
            .agg(
                n_rows=("doc_id", "size"),
                min_doc_id=("doc_id", "min"),
                max_doc_id=("doc_id", "max"),
                min_chars=("n_chars", "min"),
                max_chars=("n_chars", "max"),
            )
            .reset_index()
        )
        return agg

    parts = docs.map_batches(partial, batch_format="pandas").to_pandas()
    out = (
        parts.groupby(["lang", "source"], as_index=False)
        .agg(
            n_rows=("n_rows", "sum"),
            min_doc_id=("min_doc_id", "min"),
            max_doc_id=("max_doc_id", "max"),
            min_chars=("min_chars", "min"),
            max_chars=("max_chars", "max"),
        )
        .astype(
            {"n_rows": "int64", "min_doc_id": "int64", "max_doc_id": "int64",
             "min_chars": "int64", "max_chars": "int64"}
        )
    )
    return out.sort_values(["lang", "source"]).reset_index(drop=True)


def events_regression(sf_dir: str) -> pd.DataFrame:
    """Per-group OLS (value ~ time-of-day seconds) via the closed-form
    moment combiner: each block emits (n, Sx, Sy, Sxx, Sxy) per type —
    five numbers, so the driver merge is |types| x blocks tiny — and the
    slope/intercept algebra runs once on the merged sums. The same
    mergeable-moments shape as events_variance_udaf/events_corr; oracle
    is DuckDB's native regr_slope/regr_intercept."""
    ev = _pq(sf_dir, "events", columns=["event_type", "ts", "value"])

    def _xy(df: pd.DataFrame):
        x = (
            (df["ts"].astype("datetime64[us]").astype("int64") // 1_000_000)
            % 86400
        ).astype("float64")
        return pd.DataFrame(
            {"event_type": df["event_type"], "x": x,
             "y": df["value"].astype("float64")}
        )

    def sums(df: pd.DataFrame) -> pd.DataFrame:
        g = _xy(df)
        agg = (
            g.groupby("event_type")
            .agg(n=("x", "size"), sx=("x", "sum"), sy=("y", "sum"))
            .reset_index()
        )
        return agg.astype({"n": "int64"})

    p1 = ev.map_batches(sums, batch_format="pandas").to_pandas()
    m1 = p1.groupby("event_type", as_index=False).sum()
    means = {
        r["event_type"]: (r["sx"] / r["n"], r["sy"] / r["n"])
        for _, r in m1.iterrows()
    }
    means_ref = ray.put(means)

    def centered(df: pd.DataFrame) -> pd.DataFrame:
        from ..functions.broadcast import bget

        mm = bget(means_ref)
        g = _xy(df)
        mx = g["event_type"].map(lambda t: mm[t][0]).to_numpy()
        my = g["event_type"].map(lambda t: mm[t][1]).to_numpy()
        dx = g["x"].to_numpy() - mx
        dy = g["y"].to_numpy() - my
        g2 = pd.DataFrame(
            {"event_type": g["event_type"], "cxx": dx * dx, "cxy": dx * dy}
        )
        return (
            g2.groupby("event_type")
            .agg(cxx=("cxx", "sum"), cxy=("cxy", "sum"))
            .reset_index()
        )

    p2 = ev.map_batches(centered, batch_format="pandas").to_pandas()
    m2 = p2.groupby("event_type", as_index=False).sum()
    m = m1.merge(m2, on="event_type")
    slope = m["cxy"].to_numpy() / m["cxx"].to_numpy()
    intercept = (
        m["sy"].to_numpy() - slope * m["sx"].to_numpy()
    ) / m["n"].to_numpy()
    out = pd.DataFrame(
        {"event_type": m["event_type"], "n_events": m["n"].astype("int64"),
         "slope": np.round(slope, 6), "intercept": np.round(intercept, 6)}
    )
    return out.sort_values("event_type").reset_index(drop=True)


def orders_half_crossing(sf_dir: str) -> pd.DataFrame:
    """Per-key stateful scan: within each customer's (o_orderdate,
    o_orderkey) order, the first order at which the running revenue
    total crosses half the final total. One custkey-keyed partition
    pass, vectorized groupwise cumsum inside (a keyed streaming state
    machine shape — the running total never leaves the partition).
    Customers with >= 2 orders only (the crossing is trivial otherwise).
    """
    from ..functions.partitioning import groupby_partition

    orders = _pq(
        sf_dir, "orders",
        columns=["o_orderkey", "o_custkey", "o_totalprice", "o_orderdate"],
    )

    def crossing(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(["o_custkey", "o_orderdate", "o_orderkey"])
        cum = df.groupby("o_custkey", sort=False)["o_totalprice"].cumsum()
        tot = df.groupby("o_custkey", sort=False)["o_totalprice"].transform(
            "sum"
        )
        cnt = df.groupby("o_custkey", sort=False)["o_orderkey"].transform(
            "size"
        )
        # compare on 2-dp ROUNDED values: the oracle's window SUM may
        # accumulate in a different order, and a last-ulp difference at
        # the exact 2*cum == tot boundary would flip the crossing row
        crossed = ((cum * 2.0).round(2) >= tot.round(2)) & (cnt >= 2)
        hit = df[crossed].groupby("o_custkey", sort=False).head(1)
        out = pd.DataFrame(
            {
                "o_custkey": hit["o_custkey"].to_numpy(),
                "half_orderkey": hit["o_orderkey"].to_numpy(),
                "final_total": tot[hit.index].round(2).to_numpy(),
            }
        )
        return out.astype(
            {"o_custkey": "int64", "half_orderkey": "int64"}
        )

    import pyarrow as _pa

    schema = _pa.schema(
        [("o_custkey", _pa.int64()), ("half_orderkey", _pa.int64()),
         ("final_total", _pa.float64())]
    )
    out = groupby_partition(
        orders, "o_custkey", crossing, batch_format="pandas", schema=schema
    ).to_pandas()
    return out.sort_values("o_custkey").reset_index(drop=True)


def _pareto_sweep(df: pd.DataFrame) -> pd.DataFrame:
    """Non-dominated (maximize value, maximize ts) rows of one
    event_type's frame. Dominance: v2>=v1, t2>=t1, strict in one; exact
    (value, ts) duplicates are mutually non-dominating and all survive.
    Vectorized sweep: per distinct value (desc), the group's max-ts rows
    survive iff that max beats every higher-value group's max."""
    gmax = (
        df.groupby("value")["tus"].max().sort_index(ascending=False)
    )
    prev_best = gmax.cummax().shift(1, fill_value=np.iinfo(np.int64).min)
    alive = gmax[gmax > prev_best]
    key = pd.MultiIndex.from_frame(df[["value", "tus"]])
    keep = key.isin(list(alive.items()))
    return df[keep]


def events_pareto(sf_dir: str) -> pd.DataFrame:
    """Per-type Pareto frontier (skyline operator: maximize value AND
    recency). Block-local frontier prune is a valid combiner —
    frontier(union of frontiers) == frontier(all), because any dominated
    point is dominated by some frontier point — so the driver's final
    sweep sees only blocks x |local frontier| candidates, never the
    table. Oracle: NOT EXISTS dominance SQL."""
    ev = _pq(sf_dir, "events", columns=["event_id", "event_type", "ts", "value"])

    def _typed_frontier(df: pd.DataFrame) -> pd.DataFrame:
        out = (
            df.groupby("event_type", group_keys=True)
            .apply(_pareto_sweep, include_groups=False)
            .reset_index(level=0)
        )
        return out[["event_id", "event_type", "value", "tus"]].astype(
            {"event_id": "int64", "event_type": str, "tus": "int64"}
        )

    empty = pd.DataFrame(
        {"event_id": pd.Series([], dtype="int64"),
         "event_type": pd.Series([], dtype=str),
         "value": pd.Series([], dtype="float64"),
         "tus": pd.Series([], dtype="int64")}
    )

    def local(df: pd.DataFrame) -> pd.DataFrame:
        if df.empty:
            return empty
        df = df.assign(
            tus=df["ts"].astype("datetime64[us]").astype("int64")
        )
        return _typed_frontier(df)

    cand = ev.map_batches(local, batch_format="pandas").to_pandas()
    final = _typed_frontier(cand) if not cand.empty else empty
    out = final[["event_type", "event_id"]]
    return out.sort_values(["event_type", "event_id"]).reset_index(drop=True)


def events_stream_join(sf_dir: str) -> pd.DataFrame:
    """Stream-stream windowed self-join: per user, pairs of
    different-type events within a 60 s forward window (the keyed
    dual-buffer join a streaming runtime maintains). One user-keyed
    partition pass; inside, per-event candidate windows come from
    searchsorted bounds on the time-sorted arrays — state never leaves
    the key partition. Digest: pair count per user."""
    from ..functions.partitioning import groupby_partition

    ev = _pq(sf_dir, "events", columns=["event_id", "user_id", "event_type", "ts"])

    def pairs(df: pd.DataFrame) -> pd.DataFrame:
        rows = []
        df = df.sort_values(["user_id", "ts", "event_id"])
        tus_all = df["ts"].astype("datetime64[us]").astype("int64").to_numpy()
        eid_all = df["event_id"].to_numpy()
        type_all = df["event_type"].to_numpy()
        for uid, idx in df.groupby("user_id", sort=False).indices.items():
            t = tus_all[idx]
            eid = eid_all[idx]
            ty = type_all[idx]
            n_pairs = 0
            hi = np.searchsorted(t, t + 60_000_000, side="right")
            for i in range(len(t)):
                lo = np.searchsorted(t, t[i], side="left")
                w = slice(lo, hi[i])
                m = (eid[w] > eid[i]) & (ty[w] != ty[i])
                n_pairs += int(m.sum())
            if n_pairs:
                rows.append((uid, n_pairs))
        return pd.DataFrame(
            rows, columns=["user_id", "n_pairs"]
        ).astype({"user_id": "int64", "n_pairs": "int64"})

    schema = pa.schema([("user_id", pa.int64()), ("n_pairs", pa.int64())])
    out = groupby_partition(
        ev, "user_id", pairs, batch_format="pandas", schema=schema
    ).to_pandas()
    return out.sort_values("user_id").reset_index(drop=True)


def events_hourly_distinct(sf_dir: str) -> pd.DataFrame:
    """Windowed COUNT DISTINCT: distinct users per event-time hour —
    tumbling-window holistic aggregate. Block combiner pre-distincts
    (hour, user) pairs, then one hour-keyed partition pass counts
    uniques; the hour key co-locates each window's state exactly like a
    streaming keyed-window operator."""
    from ..functions.partitioning import groupby_partition

    ev = _pq(sf_dir, "events", columns=["user_id", "ts"])

    def pairs(df: pd.DataFrame) -> pd.DataFrame:
        hour = (
            df["ts"].astype("datetime64[us]").astype("int64")
            // 3_600_000_000
        )
        out = pd.DataFrame(
            {"hour": hour, "user_id": df["user_id"]}
        ).drop_duplicates()
        return out.astype({"hour": "int64", "user_id": "int64"})

    dd = ev.map_batches(pairs, batch_format="pandas")

    schema = pa.schema([("hour", pa.int64()), ("n_users", pa.int64())])

    def count(df: pd.DataFrame) -> pd.DataFrame:
        out = (
            df.drop_duplicates()
            .groupby("hour")["user_id"].nunique()
            .reset_index(name="n_users")
        )
        return out.astype({"hour": "int64", "n_users": "int64"})

    out = groupby_partition(
        dd, "hour", count, batch_format="pandas", schema=schema
    ).to_pandas()
    return out.sort_values("hour").reset_index(drop=True)


def events_day_over_day(sf_dir: str) -> pd.DataFrame:
    """Period-over-period report: per (event_type, day) event counts and
    the signed change vs the type's previous OBSERVED day (LAG over the
    aggregated series). The aggregation is a block combiner + one
    dimension-bounded driver merge; the lag runs on the (types x days)
    result — the standard two-tier shape for metric dashboards."""
    ev = _pq(sf_dir, "events", columns=["event_type", "ts"])

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        day = (
            df["ts"].astype("datetime64[us]").astype("int64")
            // 86_400_000_000
        )
        out = (
            pd.DataFrame({"event_type": df["event_type"], "day": day})
            .groupby(["event_type", "day"])
            .size()
            .reset_index(name="n")
        )
        return out.astype({"day": "int64", "n": "int64"})

    parts = ev.map_batches(partial, batch_format="pandas").to_pandas()
    agg = (
        parts.groupby(["event_type", "day"], as_index=False)["n"].sum()
        .sort_values(["event_type", "day"])
    )
    agg["delta"] = (
        agg.groupby("event_type")["n"].diff().fillna(0).astype("int64")
    )
    agg["n"] = agg["n"].astype("int64")
    return agg.reset_index(drop=True)


def lineitem_copurchase(sf_dir: str) -> pd.DataFrame:
    """Market-basket co-purchase lift (the classic association-rule
    signal): part pairs sharing >= 2 orders, lift = N * n_ab /
    (n_a * n_b) over distinct-order supports. Shapes: one orderkey
    partition pass emits pair partials with the by-size vectorized triu
    (baskets are small, the pair space is parts^2-bounded but the
    EMISSION is basket-bounded); part supports are a dimension-bounded
    block-combiner merge; pair supports sum in a pair-keyed partition
    pass — never an all-pairs join."""
    from ..functions.partitioning import groupby_partition

    li = _pq(sf_dir, "lineitem", columns=["l_orderkey", "l_partkey"])

    pair_schema = pa.schema(
        [("part_a", pa.int64()), ("part_b", pa.int64()), ("n", pa.int64())]
    )

    def pair_partial(df: pd.DataFrame) -> pd.DataFrame:
        op = df.drop_duplicates()
        op = op.sort_values(["l_orderkey", "l_partkey"])
        sizes = op.groupby("l_orderkey", sort=False).size().to_numpy()
        parts = op["l_partkey"].to_numpy()
        offs = np.cumsum(sizes) - sizes
        a_p, b_p = [], []
        for n in np.unique(sizes):
            if n < 2:
                continue
            sel = np.where(sizes == n)[0]
            idx = (offs[sel][:, None] + np.arange(n)[None, :]).ravel()
            arr = parts[idx].reshape(len(sel), n)
            ii, jj = np.triu_indices(n, k=1)
            pa_, pb_ = arr[:, ii].ravel(), arr[:, jj].ravel()
            keep = pa_ != pb_  # same part twice in an order is not a pair
            a_p.append(pa_[keep])
            b_p.append(pb_[keep])
        # part supports from the SAME order-complete distinct (a block-
        # level dedup would double-count orders whose lineitems span
        # blocks); marker part_b = -1
        sup = op.groupby("l_partkey").size().reset_index(name="n")
        sup = pd.DataFrame(
            {"part_a": sup["l_partkey"], "part_b": -1, "n": sup["n"]}
        )
        if a_p:
            pairs_df = (
                pd.DataFrame({"part_a": np.concatenate(a_p),
                              "part_b": np.concatenate(b_p)})
                .groupby(["part_a", "part_b"])
                .size()
                .reset_index(name="n")
            )
        else:
            pairs_df = pd.DataFrame(
                {"part_a": pd.Series([], dtype="int64"),
                 "part_b": pd.Series([], dtype="int64"),
                 "n": pd.Series([], dtype="int64")}
            )
        out = pd.concat([pairs_df, sup], ignore_index=True)
        return out.astype(
            {"part_a": "int64", "part_b": "int64", "n": "int64"}
        )

    pair_partials = groupby_partition(
        li, "l_orderkey", pair_partial, batch_format="pandas",
        schema=pair_schema,
    )

    def pair_sum(df: pd.DataFrame) -> pd.DataFrame:
        out = df.groupby(["part_a", "part_b"], as_index=False)["n"].sum()
        # support rows (part_b == -1) pass through; real pairs filter n>=2
        out = out[(out["part_b"] == -1) | (out["n"] >= 2)]
        return out.astype(
            {"part_a": "int64", "part_b": "int64", "n": "int64"}
        )

    merged = groupby_partition(
        pair_partials, ["part_a", "part_b"], pair_sum,
        batch_format="pandas", schema=pair_schema,
    ).to_pandas()
    sup = merged[merged["part_b"] == -1].set_index("part_a")["n"]
    pairs = merged[merged["part_b"] != -1]

    n_orders = int(
        li.map_batches(
            lambda df: pd.DataFrame(
                {"o": df["l_orderkey"].drop_duplicates()}
            ),
            batch_format="pandas",
        )
        .to_pandas()["o"]
        .nunique()
    )
    if pairs.empty:
        return pd.DataFrame(
            {"part_a": pd.Series([], dtype="int64"),
             "part_b": pd.Series([], dtype="int64"),
             "n_ab": pd.Series([], dtype="int64"),
             "lift": pd.Series([], dtype="float64")}
        )
    ca = pairs["part_a"].map(sup).to_numpy(dtype="float64")
    cb = pairs["part_b"].map(sup).to_numpy(dtype="float64")
    out = pd.DataFrame(
        {
            "part_a": pairs["part_a"].to_numpy(),
            "part_b": pairs["part_b"].to_numpy(),
            "n_ab": pairs["n"].to_numpy(),
            "lift": np.round(
                float(n_orders) * pairs["n"].to_numpy() / (ca * cb), 6
            ),
        }
    )
    return out.sort_values(["part_a", "part_b"]).reset_index(drop=True)


def events_first_touch(sf_dir: str) -> pd.DataFrame:
    """First-touch attribution: each user's FIRST event (ts, event_id
    order) credited to its type. One user-keyed partition pass keeps
    head-of-group rows; the per-type rollup is a dimension-bounded
    driver merge."""
    from ..functions.partitioning import groupby_partition

    ev = _pq(sf_dir, "events", columns=["event_id", "user_id", "event_type", "ts"])

    schema = pa.schema([("event_type", pa.string()), ("n", pa.int64())])

    def firsts(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(["user_id", "ts", "event_id"])
        head = df.groupby("user_id", sort=False).head(1)
        out = head.groupby("event_type").size().reset_index(name="n")
        return out.astype({"event_type": str, "n": "int64"})

    parts = groupby_partition(
        ev, "user_id", firsts, batch_format="pandas", schema=schema
    ).to_pandas()
    out = (
        parts.groupby("event_type", as_index=False)["n"].sum()
        .rename(columns={"n": "n_users"})
        .astype({"n_users": "int64"})
    )
    return out.sort_values("event_type").reset_index(drop=True)


def lineitem_below_avg(sf_dir: str) -> pd.DataFrame:
    """TPC-H Q17 shape — the correlated-subquery DECORRELATION pattern:
    revenue of small orders (quantity < 20% of the part's average).
    Pass 1 reduces to per-part (sum_qty, n) block partials (parts are
    dimension-bounded -> driver merge + one broadcast dict); pass 2
    filters against the broadcast threshold and emits block revenue
    partials. Zero shuffles; the naive plan would re-aggregate the
    fact table once per outer row."""
    from ..functions.broadcast import bget

    li = _pq(
        sf_dir, "lineitem",
        columns=["l_partkey", "l_quantity", "l_extendedprice"],
    )

    def avg_partial(df: pd.DataFrame) -> pd.DataFrame:
        agg = (
            df.groupby("l_partkey")
            .agg(s=("l_quantity", "sum"), n=("l_quantity", "size"))
            .reset_index()
        )
        return agg.astype({"l_partkey": "int64", "n": "int64"})

    p1 = (
        li.map_batches(avg_partial, batch_format="pandas")
        .to_pandas()
        .groupby("l_partkey")
        .sum()
    )
    thresh = (0.2 * p1["s"] / p1["n"]).to_dict()
    thr_ref = ray.put(thresh)

    def rev_partial(df: pd.DataFrame) -> pd.DataFrame:
        th = bget(thr_ref)
        lim = df["l_partkey"].map(th).to_numpy(dtype="float64")
        keep = df["l_quantity"].to_numpy(dtype="float64") < lim
        return pd.DataFrame(
            {"rev": [float(df["l_extendedprice"].to_numpy()[keep].sum())]}
        )

    total = float(
        li.map_batches(rev_partial, batch_format="pandas").to_pandas()["rev"].sum()
    )
    return pd.DataFrame({"avg_yearly": [round(total / 7.0, 2)]})


def events_markov(sf_dir: str) -> pd.DataFrame:
    """First-order Markov transition matrix over per-user event-type
    sequences (next-event prediction / sequence QC). One user-keyed
    partition pass sorts each user's events by (ts, event_id) and emits
    (prev_type, next_type, n) partials; the type x type matrix is
    dimension-bounded, so partials merge on the driver and the row
    normalization (p = n / row total) is a tiny pandas op. Equivalent
    to a LAG window + two-level aggregate; zero groupby shuffles beyond
    the one user hash partition."""
    from ..functions.partitioning import groupby_partition

    ev = _pq(sf_dir, "events", columns=["event_id", "user_id", "event_type", "ts"])

    schema = pa.schema(
        [("prev_type", pa.string()), ("next_type", pa.string()), ("n", pa.int64())]
    )

    def transitions(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(["user_id", "ts", "event_id"])
        prev = df.groupby("user_id", sort=False)["event_type"].shift(1)
        keep = prev.notna()
        out = (
            pd.DataFrame(
                {"prev_type": prev[keep], "next_type": df["event_type"][keep]}
            )
            .groupby(["prev_type", "next_type"])
            .size()
            .reset_index(name="n")
        )
        return out.astype({"prev_type": str, "next_type": str, "n": "int64"})

    parts = groupby_partition(
        ev, "user_id", transitions, batch_format="pandas", schema=schema
    ).to_pandas()
    mat = (
        parts.groupby(["prev_type", "next_type"], as_index=False)["n"].sum()
        .astype({"n": "int64"})
    )
    row_tot = mat.groupby("prev_type")["n"].transform("sum")
    mat["p"] = (mat["n"] / row_tot).round(6)
    return mat.sort_values(["prev_type", "next_type"]).reset_index(drop=True)


def customer_order_distribution(sf_dir: str) -> pd.DataFrame:
    """TPC-H Q13 shape (custdist): distribution of customers by order
    count, INCLUDING zero-order customers. The per-customer count needs
    one hash partition of orders by custkey (partition-closed groups);
    the count->histogram rollup is bounded by max orders/customer, so
    per-partition histogram partials merge on the driver. The zero
    bucket is total customers minus customers seen, where "seen" sums
    per-partition distinct custkeys (partitions are key-disjoint, so
    the sum is exact) — the customer table itself is never joined."""
    from ..functions.partitioning import groupby_partition

    orders = _pq(sf_dir, "orders", columns=["o_custkey"])
    n_customers = _pq(sf_dir, "customer", columns=["c_custkey"]).count()

    schema = pa.schema(
        [("n_orders", pa.int64()), ("n_customers", pa.int64()), ("seen", pa.int64())]
    )

    def hist(df: pd.DataFrame) -> pd.DataFrame:
        per_cust = df.groupby("o_custkey").size()
        out = per_cust.value_counts().rename_axis("n_orders").reset_index(
            name="n_customers"
        )
        out["seen"] = 0
        out.loc[len(out)] = [0, 0, int(per_cust.size)]
        return out.astype(
            {"n_orders": "int64", "n_customers": "int64", "seen": "int64"}
        )

    parts = groupby_partition(
        orders, "o_custkey", hist, batch_format="pandas", schema=schema
    ).to_pandas()
    seen = int(parts["seen"].sum())
    out = (
        parts[parts["n_customers"] > 0]
        .groupby("n_orders", as_index=False)["n_customers"].sum()
    )
    zero = pd.DataFrame({"n_orders": [0], "n_customers": [n_customers - seen]})
    out = pd.concat([zero, out], ignore_index=True)
    out = out[out["n_customers"] > 0].astype(
        {"n_orders": "int64", "n_customers": "int64"}
    )
    return out.sort_values("n_orders").reset_index(drop=True)


def local_supplier_volume(
    sf_dir: str, broadcast_limit: int | None = None
) -> pd.DataFrame:
    """TPC-H Q5 shape: 6-table local-supplier revenue by nation for one
    region and one order-date year. Strategy split mirrors
    segment_priority_revenue: region/nation/customer/supplier are all
    broadcast as dense key->nationkey numpy arrays (customer is the
    largest at ~150k x SF int32 — megabytes, ray.put once); the only
    shuffle is the unavoidable fact-fact lineitem x orders hash join.
    Orders are pre-FILTERED to the region + date window before the join
    (selectivity pushdown: ~1/5 x 1/7 of the fact rows move), and the
    same-nation correlation (c_nationkey = s_nationkey) is a per-batch
    numpy compare, never a join. Above ``broadcast_limit`` dim rows
    (default BROADCAST_DIM_ROW_LIMIT) customer and supplier route
    through hash joins instead of dense arrays — same output."""
    from ..stages import joins

    if broadcast_limit is None:
        broadcast_limit = BROADCAST_DIM_ROW_LIMIT
    region = "ASIA"
    lo, hi = np.datetime64("1996-01-01"), np.datetime64("1997-01-01")

    nat = _pq(sf_dir, "nation").to_pandas()
    reg = _pq(sf_dir, "region").to_pandas()
    rkey = int(reg.loc[reg["r_name"] == region, "r_regionkey"].iloc[0])
    region_nations = set(nat.loc[nat["n_regionkey"] == rkey, "n_nationkey"])
    nation_names = dict(zip(nat["n_nationkey"], nat["n_name"]))
    nations_ref = ray.put(np.array(sorted(region_nations), dtype=np.int32))

    cust_ds = _pq(sf_dir, "customer", columns=["c_custkey", "c_nationkey"])
    sup_ds = _pq(sf_dir, "supplier", columns=["s_suppkey", "s_nationkey"])
    orders = _pq(sf_dir, "orders", columns=["o_orderkey", "o_custkey", "o_orderdate"])
    li = _pq(
        sf_dir, "lineitem",
        columns=["l_orderkey", "l_suppkey", "l_extendedprice", "l_discount"],
    )
    use_broadcast = max(cust_ds.count(), sup_ds.count()) <= broadcast_limit

    if use_broadcast:
        cust = cust_ds.to_pandas()
        cust_nat = np.full(int(cust["c_custkey"].max()) + 1, -1, dtype=np.int32)
        cust_nat[cust["c_custkey"].to_numpy()] = cust["c_nationkey"].to_numpy()
        sup = sup_ds.to_pandas()
        supp_nat = np.full(int(sup["s_suppkey"].max()) + 1, -1, dtype=np.int32)
        supp_nat[sup["s_suppkey"].to_numpy()] = sup["s_nationkey"].to_numpy()
        cust_ref, supp_ref = ray.put(cust_nat), ray.put(supp_nat)

        def tag_orders(batch: pa.Table) -> pa.Table:
            dates = np.asarray(batch["o_orderdate"], dtype="datetime64[us]")
            nk = _bget(cust_ref)[np.asarray(batch["o_custkey"])]
            keep = (
                (dates >= lo) & (dates < hi)
                & np.isin(nk, _bget(nations_ref))
            )
            return pa.table(
                {
                    "o_orderkey": pa.array(np.asarray(batch["o_orderkey"])[keep]),
                    "c_nat": pa.array(nk[keep], pa.int32()),
                }
            )

        tagged = orders.map_batches(tag_orders, batch_format="pyarrow")
        joined = joins.hash_join(li, tagged, on="l_orderkey", right_on="o_orderkey")

        def combine(batch: pa.Table) -> pa.Table:
            c_nat = np.asarray(batch["c_nat"])
            s_nat = _bget(supp_ref)[np.asarray(batch["l_suppkey"])]
            keep = c_nat == s_nat
            rev = (
                np.asarray(batch["l_extendedprice"], np.float64)[keep]
                * (1.0 - np.asarray(batch["l_discount"], np.float64)[keep])
            )
            df = pd.DataFrame({"nk": c_nat[keep], "rev": rev})
            g = df.groupby("nk", sort=False)["rev"].sum().reset_index()
            return pa.Table.from_pandas(g, preserve_index=False)

        parts = joined.map_batches(combine, batch_format="pyarrow").to_pandas()
    else:
        # SF-scaled dims: date-filter orders first (pushdown unchanged),
        # then attach c_nationkey / s_nationkey via hash joins
        def date_filter(batch: pa.Table) -> pa.Table:
            dates = np.asarray(batch["o_orderdate"], dtype="datetime64[us]")
            keep = (dates >= lo) & (dates < hi)
            return pa.table(
                {
                    "o_orderkey": pa.array(np.asarray(batch["o_orderkey"])[keep]),
                    "o_custkey": pa.array(np.asarray(batch["o_custkey"])[keep]),
                }
            )

        filt = orders.map_batches(date_filter, batch_format="pyarrow")
        with_cust = joins.hash_join(
            filt, cust_ds, on="o_custkey", right_on="c_custkey"
        )

        def region_filter(batch: pa.Table) -> pa.Table:
            nk = np.asarray(batch["c_nationkey"], dtype=np.int32)
            keep = np.isin(nk, _bget(nations_ref))
            return pa.table(
                {
                    "o_orderkey": pa.array(np.asarray(batch["o_orderkey"])[keep]),
                    "c_nat": pa.array(nk[keep], pa.int32()),
                }
            )

        tagged = with_cust.map_batches(region_filter, batch_format="pyarrow")
        joined = joins.hash_join(li, tagged, on="l_orderkey", right_on="o_orderkey")
        with_sup = joins.hash_join(
            joined, sup_ds, on="l_suppkey", right_on="s_suppkey"
        )

        def combine_j(batch: pa.Table) -> pa.Table:
            c_nat = np.asarray(batch["c_nat"])
            s_nat = np.asarray(batch["s_nationkey"], dtype=np.int32)
            keep = c_nat == s_nat
            rev = (
                np.asarray(batch["l_extendedprice"], np.float64)[keep]
                * (1.0 - np.asarray(batch["l_discount"], np.float64)[keep])
            )
            df = pd.DataFrame({"nk": c_nat[keep], "rev": rev})
            g = df.groupby("nk", sort=False)["rev"].sum().reset_index()
            return pa.Table.from_pandas(g, preserve_index=False)

        parts = with_sup.map_batches(combine_j, batch_format="pyarrow").to_pandas()
    if parts.empty:
        return pd.DataFrame(
            {"n_name": pd.Series([], dtype=str),
             "revenue": pd.Series([], dtype="float64")}
        )
    out = parts.groupby("nk", as_index=False)["rev"].sum()
    out["n_name"] = out["nk"].map(nation_names)
    out["revenue"] = out["rev"].round(2)
    return (
        out[["n_name", "revenue"]].sort_values("n_name").reset_index(drop=True)
    )


def large_volume_orders(sf_dir: str) -> pd.DataFrame:
    """TPC-H Q18 shape (large-volume customers): HAVING over a fact
    aggregate, then fetch-back of the qualifying rows. Pass 1 is one
    orderkey hash partition of lineitem emitting ONLY the qualifying
    (orderkey, sum_qty) rows (partition-closed groups make the HAVING
    exact inside the pass — the full per-order aggregate never
    shuffles); the qualifying set is tiny by construction (heavy-tail
    cutoff), so it broadcasts and orders/customer attach via one
    map_batches filter + a dense custkey->name lookup. The naive plan
    shuffles the whole fact table twice."""
    from ..functions.partitioning import groupby_partition

    threshold = 300.0
    li = _pq(sf_dir, "lineitem", columns=["l_orderkey", "l_quantity"])

    schema = pa.schema([("o_orderkey", pa.int64()), ("sum_qty", pa.float64())])

    def qualifying(df: pd.DataFrame) -> pd.DataFrame:
        s = df.groupby("l_orderkey")["l_quantity"].sum()
        s = s[s > threshold]
        return pd.DataFrame(
            {"o_orderkey": s.index.to_numpy(np.int64),
             "sum_qty": s.to_numpy(np.float64)}
        )

    qual = groupby_partition(
        li, "l_orderkey", qualifying, batch_format="pandas", schema=schema
    ).to_pandas()
    if qual.empty:
        return pd.DataFrame(
            {"c_name": pd.Series([], dtype=str),
             "o_orderkey": pd.Series([], dtype="int64"),
             "o_totalprice": pd.Series([], dtype="float64"),
             "sum_qty": pd.Series([], dtype="float64")}
        )
    qual_keys = np.sort(qual["o_orderkey"].to_numpy(np.int64))
    qty_sorted = qual.set_index("o_orderkey")["sum_qty"].loc[qual_keys].to_numpy()
    qual_ref = ray.put((qual_keys, qty_sorted))

    cust = _pq(sf_dir, "customer", columns=["c_custkey", "c_name"]).to_pandas()
    names = np.full(int(cust["c_custkey"].max()) + 1, "", dtype=object)
    names[cust["c_custkey"].to_numpy()] = cust["c_name"].to_numpy()
    names_ref = ray.put(names)

    orders = _pq(sf_dir, "orders", columns=["o_orderkey", "o_custkey", "o_totalprice"])

    def fetch(batch: pa.Table) -> pa.Table:
        qk, qv = _bget(qual_ref)
        keys = np.asarray(batch["o_orderkey"])
        pos = np.searchsorted(qk, keys)  # vectorized sorted-set membership
        pos = np.clip(pos, 0, len(qk) - 1)
        keep = qk[pos] == keys
        if not keep.any():
            return pa.table(
                {"c_name": pa.array([], pa.string()),
                 "o_orderkey": pa.array([], pa.int64()),
                 "o_totalprice": pa.array([], pa.float64()),
                 "sum_qty": pa.array([], pa.float64())}
            )
        return pa.table(
            {
                "c_name": pa.array(
                    _bget(names_ref)[np.asarray(batch["o_custkey"])[keep]],
                    pa.string(),
                ),
                "o_orderkey": pa.array(keys[keep]),
                "o_totalprice": pa.array(
                    np.asarray(batch["o_totalprice"])[keep]
                ),
                "sum_qty": pa.array(qv[pos[keep]], pa.float64()),
            }
        )

    out = orders.map_batches(fetch, batch_format="pyarrow").to_pandas()
    return (
        out.sort_values(["o_totalprice", "o_orderkey"], ascending=[False, True])
        .head(100)
        .reset_index(drop=True)
    )


def top_supplier(sf_dir: str) -> pd.DataFrame:
    """TPC-H Q15 shape (top supplier view): quarterly per-supplier
    revenue with an argmax-equality filter. The argmax PUSHES DOWN:
    supplier groups are partition-closed after one suppkey hash
    partition, so each partition emits only its OWN maximal rows
    (ties kept) and the driver takes the max-of-maxima over
    n_partitions rows — the full supplier revenue vector never
    materializes anywhere. Revenue is rounded to 2 dp BEFORE the max
    comparison on both paths so float tie semantics are identical."""
    from ..functions.partitioning import groupby_partition

    lo, hi = np.datetime64("1996-01-01"), np.datetime64("1996-04-01")
    li = _pq(
        sf_dir, "lineitem",
        columns=["l_suppkey", "l_extendedprice", "l_discount", "l_shipdate"],
    )

    schema = pa.schema([("s_suppkey", pa.int64()), ("total_revenue", pa.float64())])

    def local_max(df: pd.DataFrame) -> pd.DataFrame:
        d = df["l_shipdate"].to_numpy("datetime64[us]")
        m = (d >= lo) & (d < hi)
        if not m.any():
            return pd.DataFrame(
                {"s_suppkey": pd.Series([], dtype="int64"),
                 "total_revenue": pd.Series([], dtype="float64")}
            )
        rev = (
            pd.DataFrame(
                {"k": df["l_suppkey"].to_numpy()[m],
                 "r": df["l_extendedprice"].to_numpy()[m]
                      * (1.0 - df["l_discount"].to_numpy()[m])}
            )
            .groupby("k")["r"].sum().round(2)
        )
        best = rev[rev == rev.max()]
        return pd.DataFrame(
            {"s_suppkey": best.index.to_numpy(np.int64),
             "total_revenue": best.to_numpy(np.float64)}
        )

    cand = groupby_partition(
        li, "l_suppkey", local_max, batch_format="pandas", schema=schema
    ).to_pandas()
    if cand.empty:
        return pd.DataFrame(
            {"s_suppkey": pd.Series([], dtype="int64"),
             "s_name": pd.Series([], dtype=str),
             "total_revenue": pd.Series([], dtype="float64")}
        )
    best = cand[cand["total_revenue"] == cand["total_revenue"].max()]
    sup = _pq(sf_dir, "supplier", columns=["s_suppkey", "s_name"]).to_pandas()
    out = best.merge(sup, on="s_suppkey")
    return (
        out[["s_suppkey", "s_name", "total_revenue"]]
        .sort_values("s_suppkey")
        .reset_index(drop=True)
    )


def events_type_weekday_chisq(sf_dir: str) -> pd.DataFrame:
    """Chi-square independence test of event_type x ISO weekday — the
    classic contingency-table analytics op. One streamed pass emits
    (type, dow, n) block partials (|types| x 7 rows per block, dimension
    -bounded driver merge); expected counts and per-cell chi-square
    contributions are driver math over the tiny table. The statistic is
    sum(contrib) — reported per cell so skewed cells are attributable."""
    ev = _pq(sf_dir, "events", columns=["event_type", "ts"])

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        dow = df["ts"].dt.dayofweek + 1  # ISO: Mon=1..Sun=7
        out = (
            pd.DataFrame({"event_type": df["event_type"], "dow": dow})
            .groupby(["event_type", "dow"])
            .size()
            .reset_index(name="n")
        )
        return out.astype({"event_type": str, "dow": "int64", "n": "int64"})

    parts = ev.map_batches(partial, batch_format="pandas").to_pandas()
    c = parts.groupby(["event_type", "dow"], as_index=False)["n"].sum()
    n_total = float(c["n"].sum())
    row = c.groupby("event_type")["n"].transform("sum").to_numpy(float)
    col = c.groupby("dow")["n"].transform("sum").to_numpy(float)
    e = row * col / n_total
    c["expected"] = np.round(e, 6)
    c["contrib"] = np.round((c["n"].to_numpy(float) - e) ** 2 / e, 6)
    c["n"] = c["n"].astype("int64")
    return c.sort_values(["event_type", "dow"]).reset_index(drop=True)


def events_hll_overlap(sf_dir: str) -> pd.DataFrame:
    """HLL SET ALGEBRA: pairwise distinct-user overlap between event
    types, estimated by inclusion-exclusion over mergeable register
    vectors (|A∩B| ≈ E(A) + E(B) - E(max(regs_A, regs_B)) — union of
    HLLs is the elementwise register max), carried next to the EXACT
    overlap for audit. Sketch state is |types| x 4 KiB per block; the
    exact pair counts come from one user-keyed partition pass emitting
    type-pair partials (pairs are dimension-bounded). The register max
    is order- and duplicate-insensitive, so the distributed merge is
    bit-identical to the serial fixture's single fold."""
    from ..functions.partitioning import groupby_partition
    from ..functions.sketch import hll_estimate, hll_merge, hll_registers

    ev = _pq(sf_dir, "events", columns=["event_type", "user_id"])

    def sketch_partial(df: pd.DataFrame) -> pd.DataFrame:
        rows = []
        for et, grp in df.groupby("event_type", sort=False):
            rows.append(
                {"event_type": et,
                 "regs": hll_registers(grp["user_id"].to_numpy()).tobytes()}
            )
        return pd.DataFrame(rows, columns=["event_type", "regs"])

    parts = ev.map_batches(sketch_partial, batch_format="pandas").to_pandas()
    regs = {
        et: hll_merge(
            np.stack([np.frombuffer(b, dtype=np.int8) for b in grp["regs"]])
        )
        for et, grp in parts.groupby("event_type")
    }

    pair_schema = pa.schema(
        [("type_a", pa.string()), ("type_b", pa.string()), ("n", pa.int64())]
    )

    def pair_partial(df: pd.DataFrame) -> pd.DataFrame:
        sets = df.groupby("user_id")["event_type"].agg(lambda s: sorted(set(s)))
        rows: dict = {}
        for types in sets:
            for i in range(len(types)):
                for j in range(i + 1, len(types)):
                    k = (types[i], types[j])
                    rows[k] = rows.get(k, 0) + 1
        return pd.DataFrame(
            [{"type_a": a, "type_b": b, "n": n} for (a, b), n in rows.items()],
            columns=["type_a", "type_b", "n"],
        ).astype({"type_a": str, "type_b": str, "n": "int64"})

    exact = (
        groupby_partition(
            ev, "user_id", pair_partial, batch_format="pandas", schema=pair_schema
        )
        .to_pandas()
        .groupby(["type_a", "type_b"], as_index=False)["n"].sum()
    )

    ests = {et: hll_estimate(r) for et, r in regs.items()}
    out_rows = []
    for _, r in exact.iterrows():
        a, b = r["type_a"], r["type_b"]
        union = hll_estimate(np.maximum(regs[a], regs[b]))
        inter = max(ests[a] + ests[b] - union, 0.0)
        out_rows.append(
            {"type_a": a, "type_b": b, "n_exact": int(r["n"]),
             "n_est": round(inter, 2)}
        )
    out = pd.DataFrame(out_rows, columns=["type_a", "type_b", "n_exact", "n_est"])
    return out.sort_values(["type_a", "type_b"]).reset_index(drop=True)


def events_cusum(sf_dir: str) -> pd.DataFrame:
    """CUSUM change-point scan per event type over the daily count
    series: S_t = max(0, S_{t-1} + (x_t - mean)), reporting the peak
    statistic and the day it peaks (first day on ties). The recurrence
    is inherently sequential BUT only over the dimension-bounded
    (type x day) aggregate — one streamed pass reduces the event log to
    daily-count partials, the driver merge is |types| x |days| rows,
    and the scan runs there (the same shape as pagerank's driver
    iteration). Not SQL-expressible (clamped recurrence) -> serial
    fixture oracle."""
    ev = _pq(sf_dir, "events", columns=["event_type", "ts"])

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        day = df["ts"].dt.floor("D")
        out = (
            pd.DataFrame({"event_type": df["event_type"], "day": day})
            .groupby(["event_type", "day"])
            .size()
            .reset_index(name="n")
        )
        return out.astype({"event_type": str, "n": "int64"})

    parts = ev.map_batches(partial, batch_format="pandas").to_pandas()
    daily = parts.groupby(["event_type", "day"], as_index=False)["n"].sum()
    out_rows = []
    for et, grp in daily.groupby("event_type"):
        grp = grp.sort_values("day")
        x = grp["n"].to_numpy(np.float64)
        mean = x.mean()
        s = 0.0
        best, best_i = -1.0, 0
        for i, v in enumerate(x):
            s = max(0.0, s + (v - mean))
            if s > best:
                best, best_i = s, i
        out_rows.append(
            {"event_type": et, "max_cusum": round(best, 4),
             "peak_day": str(grp["day"].iloc[best_i].date())}
        )
    out = pd.DataFrame(out_rows, columns=["event_type", "max_cusum", "peak_day"])
    return out.sort_values("event_type").reset_index(drop=True)


def events_bitmap_distinct(sf_dir: str) -> pd.DataFrame:
    """EXACT distinct users per event type via BITMAP-INDEX algebra (the
    roaring-bitmap aggregate pattern): each block packs its user ids
    into one fixed-width bit vector per type (np.packbits), the driver
    merge is bitwise OR over |types| x blocks vectors, and the count is
    a popcount. Mergeable like HLL but exact; state is ceil(U/8) bytes
    per (type, block) — the documented boundedness assumption is a
    DENSE user-id space (10^9 users = 125 MB/vector; beyond that,
    switch the vector to a compressed/roaring layout, same algebra).
    The pairwise AND gives exact overlaps with no second pass — shown
    for the lexicographically first type pair. Oracle: plain
    COUNT(DISTINCT) SQL, exactly (not approximately) equal."""
    ev = _pq(sf_dir, "events", columns=["event_type", "user_id"])
    n_bits = int(ev.max("user_id")) + 1
    n_bytes = (n_bits + 7) // 8

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        rows = []
        for et, grp in df.groupby("event_type", sort=False):
            bits = np.zeros(n_bits, dtype=bool)
            bits[grp["user_id"].to_numpy()] = True
            rows.append({"event_type": et, "bm": np.packbits(bits).tobytes()})
        return pd.DataFrame(rows, columns=["event_type", "bm"])

    parts = ev.map_batches(partial, batch_format="pandas").to_pandas()
    merged = {}
    for et, grp in parts.groupby("event_type"):
        acc = np.zeros(n_bytes, dtype=np.uint8)
        for b in grp["bm"]:
            acc |= np.frombuffer(b, dtype=np.uint8)
        merged[et] = acc
    types = sorted(merged)
    out = pd.DataFrame(
        {
            "event_type": types,
            "n_users": [
                int(np.unpackbits(merged[t]).sum()) for t in types
            ],
        }
    ).astype({"n_users": "int64"})
    if len(types) >= 2:
        inter = int(np.unpackbits(merged[types[0]] & merged[types[1]]).sum())
        out["first_pair_overlap"] = np.int64(inter)
    else:
        out["first_pair_overlap"] = np.int64(0)
    return out.sort_values("event_type").reset_index(drop=True)


def events_time_weighted_avg(sf_dir: str) -> pd.DataFrame:
    """Time-weighted (trapezoidal) average of `value` per user over the
    user's irregular event timeline — the standard telemetry aggregate
    that plain AVG gets wrong under uneven sampling. One user-keyed
    partition pass sorts each user's events by (ts, event_id) and
    integrates sum((t2-t1)*(v1+v2)/2) / (t_last-t_first); users with a
    single event (zero span) are dropped, matching the SQL's NULL
    division semantics."""
    from ..functions.partitioning import groupby_partition

    ev = _pq(sf_dir, "events", columns=["event_id", "user_id", "ts", "value"])

    schema = pa.schema([("user_id", pa.int64()), ("twavg", pa.float64())])

    def integrate(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(["user_id", "ts", "event_id"])
        rows = []
        for uid, grp in df.groupby("user_id", sort=False):
            t = grp["ts"].to_numpy("datetime64[us]").astype(np.int64)
            v = grp["value"].to_numpy(np.float64)
            span = t[-1] - t[0]
            if span <= 0:
                continue
            area = float(np.sum(np.diff(t) * (v[:-1] + v[1:]) / 2.0))
            rows.append({"user_id": int(uid), "twavg": round(area / span, 6)})
        return pd.DataFrame(rows, columns=["user_id", "twavg"])

    out = groupby_partition(
        ev, "user_id", integrate, batch_format="pandas", schema=schema
    ).to_pandas()
    return out.sort_values("user_id").reset_index(drop=True)


def orders_lineitem_join_size(sf_dir: str) -> pd.DataFrame:
    """Join-size estimation WITHOUT running the join — the AGMS sketch
    dot product (Alon-Gibbons-Matias-Szegedy): each side folds its
    per-block key counts into a 64-estimator ±1 dot partial (shared
    deterministic sign function), partials SUM, and
    E[dot_o · dot_l] = |orders ⋈ lineitem|. The query-optimizer use
    case: the sketch state is 64 int64s per block regardless of key
    cardinality. The exact size is carried for audit via pre-aggregated
    (key, n) partials through ONE key partition (Σ n_o(k)·n_l(k)) —
    never by materializing the join. Serial fixture oracle (linearity
    makes the distributed fold exactly equal the serial one)."""
    from ..functions.partitioning import groupby_partition
    from ..functions.sketch import ams_f2_partial, ams_join_estimate

    orders = _pq(sf_dir, "orders", columns=["o_orderkey"])
    li = _pq(sf_dir, "lineitem", columns=["l_orderkey"])

    def fold(col: str):
        def partial(t: pa.Table) -> pa.Table:
            vc = pd.Series(np.asarray(t[col])).value_counts(sort=False)
            dot = ams_f2_partial(
                {str(k): int(v) for k, v in vc.items()}
            )
            counts = pa.table(
                {
                    "key": pa.array(vc.index.to_numpy(np.int64)),
                    "n": pa.array(vc.to_numpy(np.int64)),
                    "dot": pa.array([None] * len(vc), pa.list_(pa.int64())),
                }
            )
            dotrow = pa.table(
                {
                    "key": pa.array([-1], pa.int64()),
                    "n": pa.array([0], pa.int64()),
                    "dot": pa.array([dot.tolist()], pa.list_(pa.int64())),
                }
            )
            return pa.concat_tables([counts, dotrow])

        return partial

    parts_o = orders.map_batches(fold("o_orderkey"), batch_format="pyarrow")
    parts_l = li.map_batches(fold("l_orderkey"), batch_format="pyarrow")

    po = parts_o.to_pandas()
    pl = parts_l.to_pandas()
    dot_o = np.sum(np.stack([np.asarray(d) for d in po.loc[po["key"] == -1, "dot"]]), axis=0)
    dot_l = np.sum(np.stack([np.asarray(d) for d in pl.loc[pl["key"] == -1, "dot"]]), axis=0)
    est = ams_join_estimate(dot_o, dot_l)

    co = po[po["key"] != -1].groupby("key")["n"].sum()
    cl = pl[pl["key"] != -1].groupby("key")["n"].sum()
    # exact Σ n_o(k)·n_l(k): the (key, n) partials are key-cardinality-
    # bounded here; at open key spaces route them through ONE
    # groupby_partition(key) pass instead of this driver merge — the
    # per-partition product-sum is the same math (partition-closed keys)
    common = co.index.intersection(cl.index)
    exact = float((co.loc[common] * cl.loc[common]).sum())
    return pd.DataFrame(
        {
            "metric": ["join_size_ams", "join_size_exact"],
            "value": [round(est, 2), round(exact, 2)],
        }
    )


def events_decayed_sum(sf_dir: str) -> pd.DataFrame:
    """Exponentially time-decayed sum per event type (half-life 7 days,
    anchored at the corpus max timestamp) — the streaming 'recency-
    weighted counter' evaluated batch-side. Two cheap passes: a global
    max(ts) aggregate, then per-block (type, Σ value·2^(-Δt/h)) partials
    merged on the driver (decay against a FIXED anchor is linear, so
    block partials sum exactly — the trick that makes the decayed
    counter mergeable)."""
    ev = _pq(sf_dir, "events", columns=["event_type", "ts", "value"])
    t_max = pd.Timestamp(ev.max("ts")).to_datetime64().astype("datetime64[us]")
    half_us = 7 * 24 * 3600 * 1_000_000.0

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        dt = (
            t_max.astype(np.int64)
            - df["ts"].to_numpy("datetime64[us]").astype(np.int64)
        ).astype(np.float64)
        w = df["value"].to_numpy(np.float64) * np.power(2.0, -dt / half_us)
        out = (
            pd.DataFrame({"event_type": df["event_type"], "w": w})
            .groupby("event_type")["w"].sum().reset_index()
        )
        return out.astype({"event_type": str})

    parts = ev.map_batches(partial, batch_format="pandas").to_pandas()
    out = parts.groupby("event_type", as_index=False)["w"].sum()
    out["decayed_sum"] = out["w"].round(4)
    return (
        out[["event_type", "decayed_sum"]]
        .sort_values("event_type")
        .reset_index(drop=True)
    )


def events_diff_in_diff(sf_dir: str) -> pd.DataFrame:
    """Difference-in-differences per event type: treatment = even
    user_id, period split at 2024-01-15. The whole estimator reduces to
    (type, group, period, Σvalue, n) block partials — 4 cells per type,
    dimension-bounded driver merge — then
    DiD = (treat_post − treat_pre) − (ctrl_post − ctrl_pre) of cell
    means. The classic observational-analytics aggregate as one
    streamed combiner pass."""
    ev = _pq(sf_dir, "events", columns=["user_id", "event_type", "ts", "value"])
    split = np.datetime64("2024-01-15")

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        out = (
            pd.DataFrame(
                {
                    "event_type": df["event_type"],
                    "treat": (df["user_id"].to_numpy() % 2 == 0),
                    "post": df["ts"].to_numpy("datetime64[us]") >= split,
                    "v": df["value"].to_numpy(np.float64),
                }
            )
            .groupby(["event_type", "treat", "post"])
            .agg(s=("v", "sum"), n=("v", "size"))
            .reset_index()
        )
        return out.astype({"event_type": str, "n": "int64"})

    parts = ev.map_batches(partial, batch_format="pandas").to_pandas()
    cells = parts.groupby(["event_type", "treat", "post"], as_index=False).agg(
        s=("s", "sum"), n=("n", "sum")
    )
    cells["mean"] = cells["s"] / cells["n"]
    rows = []
    for et, g in cells.groupby("event_type"):
        m = {
            (bool(r["treat"]), bool(r["post"])): r["mean"]
            for _, r in g.iterrows()
        }
        if len(m) < 4:
            continue
        did = (m[(True, True)] - m[(True, False)]) - (
            m[(False, True)] - m[(False, False)]
        )
        rows.append({"event_type": et, "did": round(did, 6)})
    out = pd.DataFrame(rows, columns=["event_type", "did"])
    return out.sort_values("event_type").reset_index(drop=True)


def customer_rfm(sf_dir: str) -> pd.DataFrame:
    """RFM segmentation (recency / frequency / monetary quartile codes)
    per customer — the classic CRM analytics op. One custkey partition
    pass reduces orders to per-customer (last order date, n, Σprice);
    the quartile thresholds are exact order statistics over the
    customer aggregate (DuckDB quantile_disc convention: sorted value
    at ceil(q·n)-1), computed on the driver over the customer-bounded
    frame, and codes are value-threshold CASEs identical on both
    sides."""
    import math

    from ..functions.partitioning import groupby_partition

    orders = _pq(
        sf_dir, "orders", columns=["o_custkey", "o_orderdate", "o_totalprice"]
    )
    t_max = pd.Timestamp(orders.max("o_orderdate")).to_datetime64()

    schema = pa.schema(
        [("c_custkey", pa.int64()), ("r_days", pa.int64()),
         ("f", pa.int64()), ("m", pa.float64())]
    )

    def per_cust(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby("o_custkey").agg(
            last=("o_orderdate", "max"), f=("o_orderdate", "size"),
            m=("o_totalprice", "sum"),
        ).reset_index()
        r = (
            (t_max - g["last"].to_numpy("datetime64[us]"))
            / np.timedelta64(1, "D")
        ).astype(np.int64)
        return pd.DataFrame(
            {"c_custkey": g["o_custkey"].astype("int64"),
             "r_days": r, "f": g["f"].astype("int64"),
             "m": g["m"].round(2)}
        )

    per = groupby_partition(
        orders, "o_custkey", per_cust, batch_format="pandas", schema=schema
    ).to_pandas()

    def disc_q(v: np.ndarray, q: float) -> float:
        s = np.sort(v)
        return float(s[max(math.ceil(q * len(s)) - 1, 0)])

    def codes(v: np.ndarray, reverse: bool = False) -> np.ndarray:
        qs = [disc_q(v, q) for q in (0.25, 0.5, 0.75)]
        c = 1 + sum((v > t).astype(np.int64) for t in qs)
        return 5 - c if reverse else c  # recency: smaller is better

    per["r_code"] = codes(per["r_days"].to_numpy(np.float64), reverse=True)
    per["f_code"] = codes(per["f"].to_numpy(np.float64))
    per["m_code"] = codes(per["m"].to_numpy(np.float64))
    return (
        per[["c_custkey", "r_days", "f", "m", "r_code", "f_code", "m_code"]]
        .sort_values("c_custkey")
        .reset_index(drop=True)
    )


def events_tier_join(sf_dir: str) -> pd.DataFrame:
    """Broadcast RANGE (banding) join: events matched to a small tier
    table by value interval — the dimension-banding join a shuffle can
    never justify. The tier bounds broadcast once; each block assigns
    tiers with ONE np.searchsorted (vectorized binary search, the
    nested-loop-join collapse for sorted bands) and emits (tier, n,
    Σvalue) partials. Oracle: the literal inequality JOIN in SQL."""
    bounds = np.array([1.0, 5.0, 20.0, 100.0])
    labels = np.array(["t0", "t1", "t2", "t3", "t4"])
    ev = _pq(sf_dir, "events", columns=["value"])

    def partial(t: pa.Table) -> pa.Table:
        v = np.asarray(t["value"], np.float64)
        tier = np.searchsorted(bounds, v, side="right")
        df = (
            pd.DataFrame({"tier": labels[tier], "v": v})
            .groupby("tier")
            .agg(n=("v", "size"), s=("v", "sum"))
            .reset_index()
        )
        return pa.Table.from_pandas(df, preserve_index=False)

    parts = ev.map_batches(partial, batch_format="pyarrow").to_pandas()
    out = parts.groupby("tier", as_index=False).agg(n=("n", "sum"), s=("s", "sum"))
    out["n"] = out["n"].astype("int64")
    out["sum_value"] = out["s"].round(2)
    return (
        out[["tier", "n", "sum_value"]].sort_values("tier").reset_index(drop=True)
    )


def events_gini(sf_dir: str) -> pd.DataFrame:
    """Gini coefficient of per-user event activity — the standard
    concentration/inequality diagnostic for traffic skew. Per-user
    counts reduce through one user partition (partition-closed); the
    Gini formula runs on the driver over the user-bounded count vector
    (at an open user space, feed the sampled-quantile path instead):
    G = 2·Σ i·x_(i) / (n·Σx) − (n+1)/n over ascending-sorted counts.
    The SQL oracle is the identical formula via row_number."""
    from ..functions.partitioning import groupby_partition

    ev = _pq(sf_dir, "events", columns=["user_id"])

    schema = pa.schema([("user_id", pa.int64()), ("n", pa.int64())])

    def per_user(df: pd.DataFrame) -> pd.DataFrame:
        out = df.groupby("user_id").size().reset_index(name="n")
        return out.astype({"user_id": "int64", "n": "int64"})

    per = groupby_partition(
        ev, "user_id", per_user, batch_format="pandas", schema=schema
    ).to_pandas()
    x = np.sort(per["n"].to_numpy(np.float64))
    n = len(x)
    gini = 2.0 * float((np.arange(1, n + 1) * x).sum()) / (n * x.sum()) - (
        n + 1
    ) / n
    return pd.DataFrame(
        {
            "n_users": np.array([n], dtype="int64"),
            "gini": [round(gini, 6)],
        }
    )


def events_autocorr(sf_dir: str) -> pd.DataFrame:
    """Lag-1 autocorrelation of the daily event-count series per type —
    the burstiness/seasonality screen. The event log reduces to
    (type, day, n) block partials (dimension-bounded driver merge, same
    as events_cusum); the Pearson corr between the series and its lag
    runs on the driver. Oracle: DuckDB corr() over lag() windows."""
    ev = _pq(sf_dir, "events", columns=["event_type", "ts"])

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        day = df["ts"].dt.floor("D")
        out = (
            pd.DataFrame({"event_type": df["event_type"], "day": day})
            .groupby(["event_type", "day"])
            .size()
            .reset_index(name="n")
        )
        return out.astype({"event_type": str, "n": "int64"})

    parts = ev.map_batches(partial, batch_format="pandas").to_pandas()
    daily = parts.groupby(["event_type", "day"], as_index=False)["n"].sum()
    rows = []
    for et, grp in daily.groupby("event_type"):
        x = grp.sort_values("day")["n"].to_numpy(np.float64)
        if len(x) < 3:
            continue
        a, b = x[:-1], x[1:]
        da, db = a - a.mean(), b - b.mean()
        denom = np.sqrt((da * da).sum() * (db * db).sum())
        rows.append(
            {"event_type": et,
             "n_days": np.int64(len(x)),
             "lag1_corr": round(float((da * db).sum() / denom), 6)}
        )
    out = pd.DataFrame(rows, columns=["event_type", "n_days", "lag1_corr"])
    return out.sort_values("event_type").reset_index(drop=True)


def events_benford(sf_dir: str) -> pd.DataFrame:
    """Benford's-law first-digit screen over event values — the classic
    anomaly/fraud diagnostic: observed first-significant-digit counts
    vs log10(1 + 1/d) expectation with per-digit chi-square
    contributions. One streamed pass emits 9-bucket block partials
    (digit extraction is pure vectorized math); driver merge is 9 rows."""
    ev = _pq(sf_dir, "events", columns=["value"])

    def partial(t: pa.Table) -> pa.Table:
        v = np.asarray(t["value"], np.float64)
        v = v[v > 0]
        # values carry 2-dp precision: integer cents keep the leading
        # significant digit and dodge float-log boundary disagreements
        digit = np.rint(v * 100).astype(np.int64)
        while (digit >= 10).any():  # strip trailing digits, vectorized
            digit = np.where(digit >= 10, digit // 10, digit)
        counts = np.bincount(digit, minlength=10)[1:10]
        return pa.table(
            {"digit": pa.array(np.arange(1, 10, dtype=np.int64)),
             "n": pa.array(counts, pa.int64())}
        )

    parts = ev.map_batches(partial, batch_format="pyarrow").to_pandas()
    obs = parts.groupby("digit", as_index=False)["n"].sum()
    total = float(obs["n"].sum())
    d = obs["digit"].to_numpy(np.float64)
    expected = np.log10(1.0 + 1.0 / d) * total
    contrib = (obs["n"].to_numpy(np.float64) - expected) ** 2 / expected
    obs["expected"] = np.round(expected, 4)
    obs["contrib"] = np.round(contrib, 4)
    obs["n"] = obs["n"].astype("int64")
    return obs.sort_values("digit").reset_index(drop=True)


def rich_inactive_customers(
    sf_dir: str, broadcast_limit: int | None = None
) -> pd.DataFrame:
    """TPC-H Q22 shape: customers with above-average (positive) account
    balance and no RECENT orders (none since 2000-01-01) — a
    scalar-subquery threshold plus an anti-join, both shuffle-free: the
    average comes from (n, Σ) block partials, and the anti-join probes
    a BITMAP of recent-order custkeys (np.packbits over the dense key
    space — ~19 MB per 150M keys; the same dense-broadcast discipline
    as events_bitmap_distinct) built from one filtered pass over
    orders. When the key space exceeds ``broadcast_limit`` (default
    BROADCAST_DIM_ROW_LIMIT — the bitmap would grow with SF) the probe
    becomes a distributed anti semi_join — same output."""
    recent = np.datetime64("2000-01-01")
    cust = _pq(sf_dir, "customer", columns=["c_custkey", "c_acctbal"])
    orders = _pq(sf_dir, "orders", columns=["o_custkey", "o_orderdate"])

    def avg_partial(t: pa.Table) -> pa.Table:
        v = np.asarray(t["c_acctbal"], np.float64)
        pos = v[v > 0]
        return pa.table(
            {"n": pa.array([len(pos)], pa.int64()),
             "s": pa.array([float(pos.sum())], pa.float64())}
        )

    ap = cust.map_batches(avg_partial, batch_format="pyarrow").to_pandas()
    threshold = float(ap["s"].sum() / max(int(ap["n"].sum()), 1))

    n_keys = int(orders.max("o_custkey")) + 1
    if broadcast_limit is None:
        broadcast_limit = BROADCAST_DIM_ROW_LIMIT
    if n_keys <= broadcast_limit:
        n_words = (n_keys + 7) // 8

        def key_bitmap(t: pa.Table) -> pa.Table:
            keys = np.asarray(t["o_custkey"])
            dates = np.asarray(t["o_orderdate"], dtype="datetime64[us]")
            bits = np.zeros(n_keys, dtype=bool)
            bits[keys[dates >= recent]] = True
            return pa.table({"bm": pa.array([np.packbits(bits).tobytes()])})

        bms = orders.map_batches(key_bitmap, batch_format="pyarrow").to_pandas()
        acc = np.zeros(n_words, dtype=np.uint8)
        for b in bms["bm"]:
            acc |= np.frombuffer(b, dtype=np.uint8)
        has_order = np.unpackbits(acc)[:n_keys].astype(bool)
        bm_ref = ray.put(has_order)

        def probe(t: pa.Table) -> pa.Table:
            keys = np.asarray(t["c_custkey"])
            bal = np.asarray(t["c_acctbal"], np.float64)
            ho = _bget(bm_ref)
            in_range = keys < len(ho)
            ordered = np.zeros(len(keys), dtype=bool)
            ordered[in_range] = ho[keys[in_range]]
            keep = (bal > threshold) & ~ordered
            return pa.table(
                {"n": pa.array([int(keep.sum())], pa.int64()),
                 "s": pa.array([float(bal[keep].sum())], pa.float64())}
            )

        parts = cust.map_batches(probe, batch_format="pyarrow").to_pandas()
    else:
        # key space outgrew the bitmap budget: distributed anti-join of
        # threshold-qualified customers against recent-order custkeys
        # (semi_join pre-reduces the right side to distinct keys, so the
        # shuffle moves keys, never order payloads)
        from ..stages import joins

        def rich_only(t: pa.Table) -> pa.Table:
            bal = np.asarray(t["c_acctbal"], np.float64)
            keep = bal > threshold
            return pa.table(
                {
                    "c_custkey": pa.array(np.asarray(t["c_custkey"])[keep]),
                    "c_acctbal": pa.array(bal[keep], pa.float64()),
                }
            )

        rich = cust.map_batches(rich_only, batch_format="pyarrow")

        def recent_keys(t: pa.Table) -> pa.Table:
            dates = np.asarray(t["o_orderdate"], dtype="datetime64[us]")
            return pa.table(
                {"o_custkey": pa.array(np.asarray(t["o_custkey"])[dates >= recent])}
            )

        ro = orders.map_batches(recent_keys, batch_format="pyarrow")
        inactive = joins.semi_join(
            rich, ro, on="c_custkey", right_on="o_custkey", anti=True
        )

        def agg(t: pa.Table) -> pa.Table:
            bal = np.asarray(t["c_acctbal"], np.float64)
            return pa.table(
                {"n": pa.array([len(bal)], pa.int64()),
                 "s": pa.array([float(bal.sum())], pa.float64())}
            )

        parts = inactive.map_batches(agg, batch_format="pyarrow").to_pandas()
    return pd.DataFrame(
        {
            "n_customers": np.array([int(parts["n"].sum())], dtype="int64"),
            "total_bal": [round(float(parts["s"].sum()), 2)],
        }
    )


def orders_interarrival(sf_dir: str) -> pd.DataFrame:
    """Inter-order arrival-gap statistics per customer, rolled up to a
    global histogram of median gaps (weekly buckets) — the classic
    inter-arrival / purchase-cadence analysis. One custkey partition
    pass sorts each customer's orders and takes the median day gap
    (quantile_disc convention); the bucket rollup is bounded, so block
    partials merge on the driver."""
    import math

    from ..functions.partitioning import groupby_partition

    orders = _pq(sf_dir, "orders", columns=["o_custkey", "o_orderkey", "o_orderdate"])

    schema = pa.schema([("bucket_weeks", pa.int64()), ("n_customers", pa.int64())])

    def gaps(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(["o_custkey", "o_orderdate", "o_orderkey"])
        rows: dict = {}
        for _, grp in df.groupby("o_custkey", sort=False):
            if len(grp) < 2:
                continue
            d = grp["o_orderdate"].to_numpy("datetime64[us]").astype(np.int64)
            g = np.sort(np.diff(d) // (86400 * 1_000_000))
            med = int(g[max(math.ceil(0.5 * len(g)) - 1, 0)])
            b = med // 7
            rows[b] = rows.get(b, 0) + 1
        return pd.DataFrame(
            [{"bucket_weeks": k, "n_customers": v} for k, v in rows.items()],
            columns=["bucket_weeks", "n_customers"],
        ).astype({"bucket_weeks": "int64", "n_customers": "int64"})

    parts = groupby_partition(
        orders, "o_custkey", gaps, batch_format="pandas", schema=schema
    ).to_pandas()
    out = parts.groupby("bucket_weeks", as_index=False)["n_customers"].sum()
    return out.sort_values("bucket_weeks").reset_index(drop=True)
