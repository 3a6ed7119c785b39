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
import posixpath

import pandas as pd
import pyarrow as pa

import ray.data

from ..functions import fsio
from ..functions.partitioning import groupby_partition
from ..functions.scan import with_prefix_sum

# composite-key separator: never occurs in canonical terms (mirrors the
# oracle's chr(31))
_SEP = "\x1f"

_ORDERS = {"spo": ["subj", "pred", "obj"], "osp": ["obj", "subj", "pred"]}


def _composite_key(g: pd.DataFrame, cols) -> pd.Series:
    return (
        g[cols[0]].astype(str) + _SEP
        + g[cols[1]].astype(str) + _SEP
        + g[cols[2]].astype(str)
    )


def _write_bucket_file(
    g: pd.DataFrame, cols, odir: str, order: str, bucket: str, fs=None
) -> dict:
    """Write one sorted bucket file (columns = permutation order + the
    composite key ``k``, so Parquet column statistics double as the zone
    map) and return its zone row. ``g`` must already be distinct and
    sorted by ``cols``. ``fs`` is the store's pyarrow filesystem (None =
    local)."""
    key = _composite_key(g, cols)
    t = pa.Table.from_pandas(g[cols], preserve_index=False)
    t = t.append_column("k", pa.array(key.to_numpy(), pa.string()))
    fs, odir = fsio.resolve(odir, fs)
    fsio.write_table(fs, posixpath.join(odir, f"{bucket}.parquet"), t)
    return {
        "idx_order": order, "bucket": bucket, "n": len(g),
        "key_min": key.min(), "key_max": key.max(),
    }


def _verify_shared_marker(marker_path: str, token: str, fs=None) -> None:
    """Run inside every upsert merge task: the driver wrote ``token`` to
    ``marker_path`` at job start; a worker that cannot read that exact
    token is looking at a DIFFERENT filesystem (node-local out_dir on a
    multi-node cluster) and must fail loudly — merging against a
    node-local view would silently rewrite buckets with delta-only rows
    (base data loss)."""
    fs, marker_path = fsio.resolve(marker_path, fs)
    try:
        seen = fsio.read_text(fs, marker_path)
    except OSError:
        seen = None
    if seen != token:
        raise RuntimeError(
            "kgstore.upsert_index: out_dir is not visible from this "
            "worker (shared-filesystem marker missing or stale). "
            "Upserting against a node-local path would silently drop "
            "base bucket data; mount out_dir on a shared filesystem or "
            "run single-node."
        )


ZONES_FILE = "_ZONES.parquet"


def _write_zones(out_dir: str, zones: pd.DataFrame, fs=None) -> None:
    """Persist the zone map next to the buckets: the build-time manifest
    that upsert uses to verify the base index is COMPLETE from where it
    runs (node-local base buckets would otherwise be silently missing).

    MERGES with any existing manifest: a run over a SUBSET of orders
    (e.g. upsert of spo only) must not delete the other orders' rows —
    that would disable the completeness defense for exactly the buckets
    it protects. Rows for the orders in ``zones`` are replaced; all
    other orders' rows are preserved. The write is ATOMIC against
    crashes (temp file + rename); CONCURRENT writers are NOT
    supported — index maintenance is a single-writer-per-out_dir
    protocol (two simultaneous upserts would lose each other's manifest
    rows via read-modify-write), same as any file-based manifest.
    An UNREADABLE existing manifest raises (mirroring
    _verify_base_complete) instead of silently writing a subset-only
    manifest that would disable the defense for the missing orders."""
    fs, out_dir = fsio.resolve(out_dir, fs)
    zpath = posixpath.join(out_dir, ZONES_FILE)
    if fsio.exists(fs, zpath):
        try:
            old = fsio.read_table(fs, zpath).to_pandas()
        except Exception as exc:  # noqa: BLE001 - corrupt manifest
            raise RuntimeError(
                f"kgstore: existing zone manifest {zpath} is unreadable "
                f"({exc}); writing a replacement would silently drop the "
                "other orders' completeness rows. Delete the manifest "
                "explicitly if the bucket files are known-good."
            ) from exc
        if old is not None and len(old):
            keep = old[~old["idx_order"].isin(set(zones["idx_order"]))]
            if len(keep):
                zones = (
                    pd.concat([keep, zones], ignore_index=True)
                    .sort_values(["idx_order", "bucket"])
                    .reset_index(drop=True)
                )
    tmp = zpath + ".tmp"
    fsio.write_table(fs, tmp, pa.Table.from_pandas(zones, preserve_index=False))
    fsio.replace(fs, tmp, zpath)


def _verify_base_complete(out_dir: str, orders: tuple, fs=None) -> None:
    """Driver-side completeness check before an upsert: every bucket the
    build-time zone manifest recorded must be a visible file. A missing
    bucket means out_dir is not the filesystem the base build wrote to
    (node-local disks on a multi-node cluster) — merging would rewrite
    those buckets with delta-only rows, losing base data."""
    fs, out_dir = fsio.resolve(out_dir, fs)
    zpath = posixpath.join(out_dir, ZONES_FILE)
    if not fsio.exists(fs, zpath):
        return  # pre-manifest index (older build); marker check still runs
    try:
        zones = fsio.read_table(fs, zpath).to_pandas()
    except Exception as exc:  # noqa: BLE001 - foreign/corrupt manifest
        raise RuntimeError(
            f"kgstore.upsert_index: zone manifest {zpath} is unreadable "
            f"({exc}). Rebuild the index (sorted_index) or delete the "
            "manifest if the bucket files are known-good."
        ) from exc
    missing = []
    for order in orders:
        want = set(zones.loc[zones["idx_order"] == order, "bucket"])
        odir = posixpath.join(out_dir, order)
        have = {
            f.split(".")[0] for f in fsio.listdir(fs, odir, ".parquet")
        }
        missing.extend(f"{order}/{b}" for b in sorted(want - have))
    if missing:
        raise RuntimeError(
            "kgstore.upsert_index: base index is incomplete from this "
            f"node — zone manifest lists buckets with no visible file: "
            f"{missing[:8]}{'...' if len(missing) > 8 else ''}. out_dir "
            "must be the shared filesystem the base build wrote to."
        )


def _zone_from_footer(path: str, order: str, bucket: str, fs=None) -> dict:
    """Zone row from Parquet FOOTER statistics only — no data pages read.
    Valid because the ``k`` column is written sorted (row-group stats of
    a sorted column give the exact global min/max)."""
    fs, path = fsio.resolve(path, fs)
    md = fsio.read_metadata(fs, path)
    if md.num_rows == 0:
        # zero-row bucket file (foreign tool, interrupted write): no key
        # range exists to zone-map, and min()/max() below would raise a
        # bare ValueError — name the file instead so the operator knows
        # which shard to delete or rewrite.
        raise RuntimeError(
            f"kgstore: bucket file {path} ({order}/{bucket}) has zero "
            "rows — likely an interrupted or foreign write. Delete the "
            "file or rebuild the index (sorted_index)."
        )
    kidx = md.schema.names.index("k")
    mins, maxs = [], []
    for rg in range(md.num_row_groups):
        st = md.row_group(rg).column(kidx).statistics
        if st is None or not st.has_min_max:
            # bucket file written by another tool / with stats disabled /
            # values too large for stats: fall back to reading the k
            # column (still only one small bucket file, not the store)
            k = fsio.read_table(fs, path, columns=["k"])["k"]
            ks = k.to_pylist()
            return {
                "idx_order": order, "bucket": bucket, "n": md.num_rows,
                "key_min": min(ks), "key_max": max(ks),
            }
        mins.append(st.min)
        maxs.append(st.max)
    return {
        "idx_order": order, "bucket": bucket, "n": md.num_rows,
        "key_min": min(mins), "key_max": max(maxs),
    }


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
    filesystem=None,
) -> pd.DataFrame:
    """Write per-order, per-bucket sorted Parquet files; return zone maps.

    For each order, bucket = first hex digit of md5(leading term); each
    bucket group (partition-complete after the keyed exchange) is
    globally deduped, sorted by the permutation's column order, and
    written to ``{out_dir}/{order}/{bucket}.parquet``. The returned
    frame has one row per non-empty (idx_order, bucket): row count and
    min/max of the composite key ``t1 SEP t2 SEP t3`` — the pruning
    metadata a distributed scan would consult.

    ``out_dir`` may be a plain path, a URI (``s3://…``), or pair with an
    explicit ``filesystem`` (pyarrow FileSystem — picklable, captured by
    the write tasks, so every worker writes to the store directly).
    """
    schema = pa.schema(
        [("idx_order", pa.string()), ("bucket", pa.string()),
         ("n", pa.int64()), ("key_min", pa.string()),
         ("key_max", pa.string())]
    )
    fs, out_dir = fsio.resolve(out_dir, filesystem)
    frames = []
    for order in orders:
        cols = _ORDERS[order]
        odir = posixpath.join(out_dir, order)
        fsio.makedirs(fs, odir)

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
                         order=order, fs=fs) -> pd.DataFrame:
            rows = []
            for b, g in part.groupby("bucket", sort=False):
                g = g[["subj", "pred", "obj"]].drop_duplicates()
                g = g.sort_values(cols, kind="stable").reset_index(drop=True)
                rows.append(
                    _write_bucket_file(g, cols, odir, order, str(b), fs=fs))
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
    out = out.sort_values(["idx_order", "bucket"]).reset_index(drop=True)
    _write_zones(out_dir, out, fs=fs)
    return out


def upsert_index(
    triples: "ray.data.Dataset",
    out_dir: str,
    orders: tuple = ("spo", "osp"),
    filesystem=None,
) -> pd.DataFrame:
    """Incrementally merge a triple DELTA into an existing sorted index.

    The maintenance half of :func:`sorted_index`: a nightly re-extraction
    must not rebuild the whole store. Delta rows hash to the same
    md5-prefix buckets as the base build, so ONE bucket-keyed partition
    pass per order reads ONLY the touched bucket files (sorted merge +
    distinct + rewrite, `use_threads=False` inside tasks); untouched
    buckets are never opened — their zone rows come from Parquet FOOTER
    statistics alone (the sorted ``k`` column makes row-group min/max
    exact). Returns the complete post-upsert zone-map table.

    REQUIRES a SHARED view of the store: ``out_dir`` may be a plain
    path (must then be visible under the same path from every worker —
    NFS / FUSE mount / single node), a URI (``s3://…``), or pair with an
    explicit pyarrow ``filesystem`` handle, which Ray pickles into the
    merge tasks so every worker reads and writes the store directly —
    the object-store backend that removes the shared-mount requirement.
    A worker whose view of the store differs (node-local out_dir) would
    otherwise silently rewrite buckets with delta-only rows (base data
    LOSS); each merge task therefore verifies a driver-written run
    marker before touching any bucket and raises loudly on a stale or
    missing marker.
    """
    import uuid

    # two-layer shared-fs defense: (a) the driver verifies the BASE build
    # is complete from here (zone manifest vs visible files — catches
    # buckets written to other nodes' local disks), (b) every merge task
    # verifies it can read the driver's fresh run marker (catches workers
    # on a different filesystem than the driver)
    fs, out_dir = fsio.resolve(out_dir, filesystem)
    _verify_base_complete(out_dir, orders, fs=fs)
    marker = posixpath.join(out_dir, "_SHARED_FS_MARKER")
    token = uuid.uuid4().hex
    fsio.makedirs(fs, out_dir)
    fsio.write_text(fs, marker, token)
    schema = pa.schema(
        [("idx_order", pa.string()), ("bucket", pa.string()),
         ("n", pa.int64()), ("key_min", pa.string()),
         ("key_max", pa.string())]
    )
    frames = []
    for order in orders:
        cols = _ORDERS[order]
        odir = posixpath.join(out_dir, order)
        fsio.makedirs(fs, odir)

        def tag(df: pd.DataFrame, cols=cols) -> pd.DataFrame:
            d = df[["subj", "pred", "obj"]].drop_duplicates().copy()
            d["bucket"] = [
                hashlib.md5(str(t).encode("utf-8", "surrogatepass"))
                .hexdigest()[0]
                for t in d[cols[0]]
            ]
            return d

        def merge_bucket(part: pd.DataFrame, cols=cols, odir=odir,
                         order=order, fs=fs) -> pd.DataFrame:
            _verify_shared_marker(marker, token, fs=fs)
            rows = []
            for b, g in part.groupby("bucket", sort=False):
                path = posixpath.join(odir, f"{b}.parquet")
                g = g[["subj", "pred", "obj"]]
                if fsio.exists(fs, path):
                    base = fsio.read_table(
                        fs, path, columns=["subj", "pred", "obj"]
                    ).to_pandas()
                    g = pd.concat([base, g], ignore_index=True)
                g = g.drop_duplicates().sort_values(
                    cols, kind="stable"
                ).reset_index(drop=True)
                rows.append(
                    _write_bucket_file(g, cols, odir, order, str(b), fs=fs))
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
        touched = groupby_partition(
            tagged, "bucket", merge_bucket,
            batch_format="pandas", schema=schema,
        ).to_pandas()
        seen = set(touched["bucket"])
        untouched = [
            _zone_from_footer(
                posixpath.join(odir, f), order, f.split(".")[0], fs=fs
            )
            for f in fsio.listdir(fs, odir, ".parquet")
            if f.split(".")[0] not in seen
        ]
        frames.append(touched)
        if untouched:
            frames.append(pd.DataFrame(untouched))
    out = pd.concat(frames, ignore_index=True)
    out["n"] = out["n"].astype("int64")
    out = out.sort_values(["idx_order", "bucket"]).reset_index(drop=True)
    _write_zones(out_dir, out, fs=fs)
    return out


def lookup_subjects(
    out_dir: str, subjects: list, order: str = "spo", filesystem=None
) -> pd.DataFrame:
    """Bucket-pruned point lookups against a built index: only the
    bucket files named by the query subjects' md5 prefixes are opened
    (at scale: a distributed read over exactly those files), then a
    vectorized isin filter. Returns distinct (subj, pred, obj) sorted.
    The pruning itself is pinned by tests (untouched buckets stay
    unopened)."""
    fs, out_dir = fsio.resolve(out_dir, filesystem)
    cols = _ORDERS[order]
    odir = posixpath.join(out_dir, order)
    buckets = sorted(
        {
            hashlib.md5(str(s).encode("utf-8", "surrogatepass")).hexdigest()[0]
            for s in subjects
        }
    )
    paths = [
        posixpath.join(odir, f"{b}.parquet")
        for b in buckets
        if fsio.exists(fs, posixpath.join(odir, f"{b}.parquet"))
    ]
    if not paths:
        return pd.DataFrame(
            {"subj": pd.Series([], dtype=str), "pred": pd.Series([], dtype=str),
             "obj": pd.Series([], dtype=str)})
    ds = ray.data.read_parquet(
        paths, columns=["subj", "pred", "obj"], filesystem=fs
    )
    want = set(map(str, subjects))

    def pick(df: pd.DataFrame) -> pd.DataFrame:
        return df[df["subj"].isin(want)]

    out = ds.map_batches(pick, batch_format="pandas").to_pandas()
    out = out.drop_duplicates()
    return out.sort_values(cols).reset_index(drop=True)
