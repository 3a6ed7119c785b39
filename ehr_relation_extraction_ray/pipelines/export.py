"""Training-data export pipeline (reference ``generate_data.py`` analog).

Re-expresses the data-generation CLI (generate_data.py:128-221) as
streaming Ray Data stages:

* NER export (S5): documents + detected mentions -> CoNLL token/IOB
  shards (+ ``labels.txt``), via sources/conll.
* RE export (S7): candidate pairs (+ labels when gold edges are given)
  -> train/dev/test TSV shards, via sources/retsv.
* train/dev split (O6): the reference slices the record list at
  ``1 - dev_split`` ("data is already shuffled", generate_data.py:192-206)
  — order-dependent. Here the split is a deterministic hash-mod of
  ``doc_id`` (same assignment at any parallelism).
* negative downsampling (O4, utils_re.py:272-274: keep non-ADE label-0
  pairs with p=0.25) and ADE-positive downsampling (O5, utils_re.py:314:
  keep label-1 ADE pairs with p=0.5): the reference draws from a global
  seeded RNG — irreproducible under parallelism — so the engine uses a
  content-hash Bernoulli (hash(doc_id, win, cand) < p * 2^64), which is
  deterministic, partition-independent, and has the same marginal rates.
  Both default OFF for inference parity (the predict path never samples,
  utils_re.py:404-429).
"""

from __future__ import annotations

import os
from typing import Optional

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

import ray.data

from ..functions.textstats import content_hash_64
from ..schemas import ENT_LABEL_MAP
from ..sources import conll, retsv
from ..stages import candidates as candidates_stage
from ..stages import mentions as mentions_stage

# 19 IOB2 labels (generate_data.py:11-13)
IOB_LABELS = ["O"] + [
    f"{p}-{short}" for short in ENT_LABEL_MAP.values() for p in ("B", "I")
]


def split_col(batch: pa.Table, dev_frac: float, key: str = "doc_id") -> pa.Table:
    """Deterministic hash-mod train/dev assignment (O6)."""
    h = content_hash_64(batch[key].to_pylist())
    is_dev = (h % np.uint64(10_000)) < np.uint64(int(dev_frac * 10_000))
    split = np.where(is_dev, "dev", "train")
    return batch.append_column("split", pa.array(split.tolist(), pa.string()))


def sample_mask(
    batch: pa.Table, p_keep_neg: float = 0.25, p_keep_ade_pos: float = 0.5
) -> np.ndarray:
    """O4/O5 hash-Bernoulli keep mask over labeled candidate rows."""
    keys = [
        f"{d}|{w}|{c}"
        for d, w, c in zip(
            batch["doc_id"].to_pylist(),
            batch["win_idx"].to_pylist(),
            batch["cand_idx"].to_pylist(),
        )
    ]
    u = content_hash_64(keys).astype(np.float64) / float(2**64)
    labels = np.asarray(batch["label"]) if "label" in batch.column_names else np.zeros(len(keys))
    rel = np.asarray(batch["rel_type"].to_pylist())
    keep = np.ones(len(keys), dtype=bool)
    neg_nonade = (labels == 0) & (rel != "ADE-Drug")
    keep[neg_nonade] = u[neg_nonade] < p_keep_neg
    pos_ade = (labels == 1) & (rel == "ADE-Drug")
    keep[pos_ade] = u[pos_ade] < p_keep_ade_pos
    return keep


def stratified_sample(
    ds: "ray.data.Dataset",
    n_per_stratum: int,
    strata_col: str = "lang",
    id_col: str = "doc_id",
) -> "ray.data.Dataset":
    """Deterministic stratified sample: the ``n`` rows with the smallest
    ``md5(id)`` per stratum (training-data recipe: "n documents per
    language"). O4/O5's hash-Bernoulli keeps a *fraction*; this keeps an
    exact per-stratum COUNT. The sample key is md5 of the stringified row
    id — uniform, content-addressed, identical at any parallelism, and
    SQL-expressible (the DuckDB oracle ranks by the same md5).

    Scale shape: each block prunes locally to its own n-smallest keys per
    stratum (combiner — at most ``n x strata`` rows leave any block), then
    one partition-granular groupby takes the global per-stratum top-n
    vectorized. Never a global sort; the shuffle moves only pruned rows.
    """
    import hashlib

    import pandas as pd

    from ..functions.partitioning import groupby_partition

    def local_prune(df: "pd.DataFrame") -> "pd.DataFrame":
        df = df.assign(
            sample_key=[
                hashlib.md5(str(i).encode("utf-8")).hexdigest()
                for i in df[id_col]
            ]
        )
        df = df.sort_values(
            [strata_col, "sample_key", id_col], kind="stable"
        )
        return df.groupby(strata_col, sort=False).head(n_per_stratum)

    def global_topn(df: "pd.DataFrame") -> "pd.DataFrame":
        df = df.sort_values(
            [strata_col, "sample_key", id_col], kind="stable"
        )
        out = df.groupby(strata_col, sort=False).head(n_per_stratum).copy()
        out["rank"] = out.groupby(strata_col, sort=False).cumcount() + 1
        return out

    return groupby_partition(
        ds.map_batches(local_prune, batch_format="pandas"),
        strata_col,
        global_topn,
        batch_format="pandas",
    )


def pack_sequences(
    docs: "ray.data.Dataset",
    budget: int = 2048,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> "ray.data.Dataset":
    """Token-budget sequence packing (GPT-style concat-and-chunk): lay the
    corpus out as one deterministic token stream in ``id_col`` order and
    assign each document the bin where it STARTS —
    ``bin_id = exclusive_token_prefix // budget`` (documents may straddle
    a bin boundary; the trainer's chunker cuts there, as in standard
    packed pretraining). Built on the distributed prefix-sum scan
    (functions/scan.py) — the only stage that needs total order; token
    counting and bin assignment are zero-shuffle ``map_batches``.

    Returns (doc_id, n_tokens, bin_id).
    """
    from ..functions.scan import with_prefix_sum

    def count_tokens(batch: pa.Table) -> pa.Table:
        # vectorized len(text.split()): count \S+ runs. fill_null FIRST —
        # count_substring_regex propagates null, and a null n_tokens
        # becomes INT64_MIN in the scan's numpy cumsum (silent garbage
        # bins); the old per-row loop counted null as 0
        n = pc.count_substring_regex(
            pc.fill_null(batch[text_col], ""), r"\S+"
        )
        return pa.table(
            {
                id_col: batch[id_col],
                "n_tokens": pc.cast(n, pa.int64()),
            }
        )

    counted = docs.map_batches(count_tokens, batch_format="pyarrow")
    scanned = with_prefix_sum(counted, "n_tokens", id_col, out_col="_prefix")

    def assign(batch: pa.Table) -> pa.Table:
        bins = np.asarray(batch["_prefix"], dtype=np.int64) // budget
        return batch.drop_columns(["_prefix"]).append_column(
            "bin_id", pa.array(bins)
        )

    return scanned.map_batches(assign, batch_format="pyarrow")


def label_candidates(
    cands: "ray.data.Dataset", gold_edges: Optional["ray.data.Dataset"]
) -> "ray.data.Dataset":
    """Attach binary labels by symmetric-equality match against gold edges
    (map_entities label flag, utils.py:472-492; symmetric equality per
    annotations.py:149-160). Gold is broadcast (small side) — no shuffle."""
    if gold_edges is None:
        return cands.map_batches(
            lambda t: t.append_column(
                "label", pa.array(np.zeros(t.num_rows, dtype=np.int8))
            ),
            batch_format="pyarrow",
        )
    import ray

    gold = gold_edges.select_columns(
        ["doc_id", "rel_type", "subj_id", "obj_id"]
    ).to_pandas()
    gold_set = set()
    for r in gold.itertuples(index=False):
        gold_set.add((r.doc_id, r.rel_type, r.subj_id, r.obj_id))
        gold_set.add((r.doc_id, r.rel_type, r.obj_id, r.subj_id))  # symmetric
    gold_ref = ray.put(gold_set)

    def attach(batch: pa.Table) -> pa.Table:
        gs = ray.get(gold_ref)
        lab = np.fromiter(
            (
                1 if (d, rt, s, o) in gs else 0
                for d, rt, s, o in zip(
                    batch["doc_id"].to_pylist(),
                    batch["rel_type"].to_pylist(),
                    batch["subj_id"].to_pylist(),
                    batch["obj_id"].to_pylist(),
                )
            ),
            dtype=np.int8,
            count=batch.num_rows,
        )
        return batch.append_column("label", pa.array(lab))

    return cands.map_batches(attach, batch_format="pyarrow")


def export_ner(
    documents: "ray.data.Dataset",
    out_dir: str,
    dev_frac: float = 0.1,
    max_len: int = 510,
    sep: str = " ",
) -> dict:
    """documents -> CoNLL train/dev shards + labels.txt (ner_generator,
    generate_data.py:89-109)."""
    ments = mentions_stage.detect(documents)
    attached = conll.attach_mentions(documents, ments)
    blocks = attached.map_batches(
        lambda t: conll.blocks_batch(t, max_len, sep), batch_format="pyarrow"
    ).map_batches(lambda t: split_col(t, dev_frac), batch_format="pyarrow")
    for split in ("train", "dev"):
        part = blocks.filter(expr=f"split == '{split}'").drop_columns(["split"])
        conll.write_conll(part, os.path.join(out_dir, split))
    with open(os.path.join(out_dir, "labels.txt"), "w") as f:
        f.writelines(l + "\n" for l in IOB_LABELS)
    return {"out_dir": out_dir, "labels": len(IOB_LABELS)}


def export_re(
    documents: "ray.data.Dataset",
    out_dir: str,
    gold_edges: Optional["ray.data.Dataset"] = None,
    dev_frac: float = 0.1,
    downsample: bool = False,
    sep: str = "\t",
) -> dict:
    """documents -> RE TSV train/dev/test shards (re_generator,
    generate_data.py:112-125 + generate_re_input_files)."""
    cands = candidates_stage.generate(documents)
    labeled = label_candidates(cands, gold_edges)
    if downsample:
        labeled = labeled.map_batches(
            lambda t: t.filter(pa.array(sample_mask(t))), batch_format="pyarrow"
        )
    labeled = labeled.map_batches(
        lambda t: split_col(t, dev_frac), batch_format="pyarrow"
    )
    for split, fmt in (("train", "train"), ("dev", "train")):
        part = labeled.filter(expr=f"split == '{split}'").drop_columns(["split"])
        retsv.write_re_tsv(part, os.path.join(out_dir, split), split=fmt, sep=sep)
    # test set: unlabeled + labeled variants (generate_data files dict)
    retsv.write_re_tsv(labeled, os.path.join(out_dir, "test"), split="test", sep=sep)
    retsv.write_re_tsv(
        labeled, os.path.join(out_dir, "test_original"), split="test_original", sep=sep
    )
    return {"out_dir": out_dir}


def weighted_sample(
    ds: "ray.data.Dataset",
    n: int,
    weight_col: str,
    id_col: str = "doc_id",
) -> "pd.DataFrame":
    """Deterministic weighted sample without replacement (Efraimidis-
    Spirakis A-ES): key = ln(u)/w with u a content-addressed uniform from
    md5(id) — the n largest keys are a weight-proportional sample, at any
    parallelism, reproducible run-to-run, and SQL-expressible (the oracle
    ranks by the identical formula).

    Scale shape: each block prunes to its own top-n keys (combiner), the
    driver merges (blocks x n) pruned rows — never a global sort. Rows
    with non-positive weight are excluded (consistently with the oracle).
    """
    import hashlib

    import pandas as pd

    DENOM = float(2**60) + 1.0

    def local_prune(df: "pd.DataFrame") -> "pd.DataFrame":
        w = df[weight_col].to_numpy(dtype=np.float64)
        keep = w > 0
        df = df[keep]
        if not len(df):
            return df.assign(s_key=np.zeros(0))
        h = np.array(
            [
                int(hashlib.md5(str(i).encode("utf-8")).hexdigest()[:15], 16)
                for i in df[id_col]
            ],
            dtype=np.float64,
        )
        u = (h + 1.0) / DENOM
        df = df.assign(s_key=np.log(u) / w[keep])
        return df.nlargest(min(n, len(df)), "s_key")

    pruned = ds.map_batches(
        local_prune, batch_format="pandas"
    ).to_pandas()
    out = pruned.sort_values(["s_key", id_col], ascending=[False, True]).head(n)
    out = out.reset_index(drop=True)
    out.insert(0, "rank", np.arange(1, len(out) + 1, dtype=np.int64))
    out["s_key"] = out["s_key"].round(9)
    return out


def write_partitioned_resumable(
    ds: "ray.data.Dataset",
    out_dir: str,
    key_col: str,
    num_partitions: int = 16,
    filesystem=None,
) -> dict:
    """Hash-partitioned Parquet sink with PARTITION-LEVEL resume: a
    restarted job skips every partition a previous run completed.

    Layout: ``out_dir/part=<k>/data.parquet``, one file per hash
    partition, written ATOMICALLY (tmp + rename) inside the Ray task
    that owns the partition — a crash mid-write never leaves a
    partition that passes the existence check. On entry the driver
    lists finished partitions (metadata-sized) and prunes the input to
    the missing ones with a broadcast membership filter, so a resume
    re-reads-and-reshuffles only unfinished keyspace. Complements the
    stage-level manifests in state/checkpoint: this is the OUTPUT-side
    resume the north rule's "failed run skips finished partitions"
    requires. ``out_dir`` may be a path, URI (``s3://…``), or pair with
    an explicit pyarrow ``filesystem`` (functions/fsio) — the handle is
    pickled into the write tasks, so workers write the store directly.
    The tmp+rename commit is atomic on local/POSIX; on object stores the
    per-object PUT is already all-or-nothing and a crashed copy leaves
    only an ``_tmp-*`` object, which parquet directory readers skip
    (pyarrow datasets ignore ``_``/``.``-prefixed files — a bare
    ``*.tmp`` name would be READ and duplicate rows on resume).

    Returns {"written": int, "skipped": int, "rows_written": int}.
    """
    import posixpath
    import uuid as _uuid

    import pyarrow.parquet as pq

    from ..functions import fsio
    from ..functions.partitioning import add_hash_partition, groupby_partition

    fs, out_dir = fsio.resolve(out_dir, filesystem)
    fsio.makedirs(fs, out_dir)
    done = {
        int(d.split("=")[1])
        for d in fsio.listdirs(fs, out_dir)
        if d.startswith("part=")
        and fsio.exists(fs, posixpath.join(out_dir, d, "data.parquet"))
    }
    missing = sorted(set(range(num_partitions)) - done)
    if not missing:
        return {"written": 0, "skipped": num_partitions, "rows_written": 0}
    missing_ref = ray.put(np.asarray(missing, dtype=np.int64))

    def prune(t: pa.Table) -> pa.Table:
        from ..functions.broadcast import bget

        tagged = add_hash_partition(t, [key_col], num_partitions)
        keep = np.isin(
            np.asarray(tagged["_part"], dtype=np.int64), bget(missing_ref)
        )
        return tagged.filter(pa.array(keep)).drop_columns(["_part"])

    pruned = ds.map_batches(prune, batch_format="pyarrow")

    def write_part(part: pa.Table) -> pa.Table:
        tagged = add_hash_partition(part, [key_col], num_partitions)
        pid = int(np.asarray(tagged["_part"])[0]) if part.num_rows else -1
        if pid < 0:
            return pa.table({"part": pa.array([], pa.int64()),
                             "rows": pa.array([], pa.int64())})
        pdir = posixpath.join(out_dir, f"part={pid}")
        fsio.makedirs(fs, pdir)
        # GC stray tmp shards from crashed prior runs of this partition
        # (they are scan-ignored but cost storage on repeated crashes)
        for stray in fsio.listdir(fs, pdir):
            if stray.startswith("_tmp-"):
                fsio.delete(fs, posixpath.join(pdir, stray))
        # leading "_": the one prefix parquet dir scans actually ignore,
        # so a crash between write and replace can't duplicate rows
        tmp = posixpath.join(pdir, f"_tmp-{_uuid.uuid4().hex}")
        fsio.write_table(fs, tmp, part)
        fsio.replace(fs, tmp, posixpath.join(pdir, "data.parquet"))
        return pa.table({"part": [pid], "rows": [part.num_rows]})

    manifest = groupby_partition(
        pruned, key_col, write_part, num_partitions=num_partitions,
        schema=pa.schema([("part", pa.int64()), ("rows", pa.int64())]),
    ).to_pandas()
    # a legitimately EMPTY partition gets no group call — commit it as an
    # empty file so re-runs don't reprocess the whole input forever
    written = set(manifest["part"]) if len(manifest) else set()
    # schema source for empty-partition placeholders, in order of
    # fidelity: a data file from THIS run, a done file from a PRIOR run
    # (resume that only had empty partitions left), then the dataset's
    # own schema. Reading from a real file guarantees placeholders can
    # never diverge from the data (a guessed dtype for pandas object
    # columns breaks whole-directory schema unification).
    exemplar = sorted(written) or sorted(done)
    if exemplar:
        empty_schema = pq.read_schema(
            posixpath.join(out_dir, f"part={exemplar[0]}", "data.parquet"),
            filesystem=fs,
        ).remove_metadata()
    else:
        sch = ds.schema()  # only evaluated when no file exists to read
        if isinstance(sch.base_schema, pa.Schema):
            empty_schema = pa.schema(
                [f.remove_metadata() for f in sch.base_schema]
            )
        else:  # pandas-backed blocks, nothing written: rebuild best-effort
            def _to_pa(t):
                if isinstance(t, pa.DataType):
                    return t
                try:
                    return pa.from_numpy_dtype(np.dtype(t))
                except (TypeError, pa.ArrowNotImplementedError):
                    return pa.string()  # pandas object dtype

            empty_schema = pa.schema(
                [(n, _to_pa(t)) for n, t in zip(sch.names, sch.types)]
            )
    for pid in missing:
        if pid in written:
            continue
        pdir = posixpath.join(out_dir, f"part={pid}")
        fsio.makedirs(fs, pdir)
        tmp = posixpath.join(pdir, f"_tmp-{_uuid.uuid4().hex}")
        fsio.write_table(fs, tmp, empty_schema.empty_table())
        fsio.replace(fs, tmp, posixpath.join(pdir, "data.parquet"))
    return {
        "written": len(missing),
        "skipped": num_partitions - len(missing),
        "rows_written": int(manifest["rows"].sum()) if len(manifest) else 0,
    }
