"""Conversation assembly: transcripts -> documents.

The engine's only order-sensitive step (SURVEY.md O3, §2.9): turns are
sorted by ``turn_idx`` *within* each ``conv_id`` group and joined with
``"\\n\\n"`` — a turn boundary is a paragraph boundary, which is exactly the
chunker's preferred split marker (``ehr.py:417-419``), and per-turn text
equality is preserved (the driver input_hint per-row invariant: the char
slice of the assembled text at each recorded offset equals the turn's
original text).

Shuffle shape: one ``groupby(conv_id)`` hash shuffle; there is no global
sort. Everything downstream is per-document rows, so a hot key costs one
oversized group here only; the shuffle-heavy canonicalization stage
salts separately (stages/canonicalize.py).

MONSTER-CONVERSATION SEGMENTATION (SURVEY §4 hot-key salting, round-3
VERDICT item 6): a 10^6-turn conversation must not become one group ->
one task -> one multi-GB text row. Conversations whose ``turn_idx``
exceeds ``max_turns_per_doc`` (default ``MAX_TURNS_PER_DOC``, env
``GRAFT_MAX_TURNS_PER_DOC``) are split into turn-range SUB-DOCUMENTS at
bucket boundaries ``seg = turn_idx // cap``: the salt is part of the
sort key, so each segment is its own group/task/row. Naming is local
and deterministic — segment 0 keeps ``doc_id = conv_id`` (under-cap
conversations are BIT-IDENTICAL to the unsegmented output), segment
b > 0 becomes ``conv_id + SEG_SEP + b`` (SEG_SEP defaults to the
record-separator control char \x1e so real ids cannot collide and no
in-band \x1f parser ever splits inside a doc id; override via
GRAFT_SEG_SEP / seg_sep for readable suffixes) — and the suffix itself
is the recoverable lineage; optionally each task also writes
(conv_id, seg, doc_id, n_turns) records for oversized conversations to
a ``lineage_dir`` side output (one shard per task, quarantine pattern).
"""

from __future__ import annotations

import os
import uuid
from typing import Optional, Union

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

import ray.data

from ..schemas import DOCUMENTS

TURN_SEP = "\n\n"

# turn-count cap per assembled document row; conversations longer than
# this are segmented into `conv_id + SEG_SEP + <seg>` sub-documents.
# PRECONDITION (input_hint contract, produced by synth and any sane log
# writer): turn_idx is 0-based per conversation, so value buckets equal
# ordinal-rank buckets and every under-cap conversation sits wholly in
# segment 0 (doc_id = conv_id, bit-identical output). A corpus with
# offset turn indices must renumber first or set the cap to 0.
MAX_TURNS_PER_DOC = int(os.environ.get("GRAFT_MAX_TURNS_PER_DOC", "4096"))
# separator for segment suffixes. Default is the RECORD SEPARATOR
# control char \x1e: it cannot occur in real ids, and — crucially — it
# is NOT \x1f, which several stages use as an IN-BAND delimiter over
# doc ids (dedupe._PAIR_SEP joins doc_a + '\x1f' + doc_b and splits at
# the FIRST \x1f; a doc id containing \x1f would silently corrupt the
# parsed pair). Corpora whose conversation ids legitimately end in
# '#<digits>' etc. assemble untouched; override via GRAFT_SEG_SEP / the
# seg_sep parameter for human-readable suffixes. The tag pass still
# guards loudly against an id that ends with the ACTIVE separator +
# digits.
SEG_SEP = os.environ.get("GRAFT_SEG_SEP", "\x1e")


def _guard_seg_collision(conv_col, seg_sep: str) -> None:
    """Raise if any conv_id already ends with the segment suffix pattern
    — segment b of conversation X would otherwise collide with a REAL
    conversation named ``X<sep>b`` and silently merge two documents.
    With the default record-separator sep this never fires on real
    ids."""
    import re

    import pyarrow.compute as _pc

    pat = re.escape(seg_sep) + r"[0-9]+$"
    hit = _pc.any(_pc.match_substring_regex(conv_col, pat)).as_py()
    if hit:
        raise ValueError(
            "assembly segmentation: a conv_id ends with "
            f"{seg_sep!r}<digits>, which collides with segment naming. "
            "Set GRAFT_SEG_SEP / seg_sep to a separator that cannot "
            "appear in your ids (default '\\x1e') or disable the cap "
            "(max_turns_per_doc=0)."
        )

SEG_LINEAGE = pa.schema(
    [
        ("conv_id", pa.string()),
        ("seg", pa.int64()),
        ("doc_id", pa.string()),
        ("n_turns", pa.int64()),
    ]
)


def _flush_seg_lineage(rows: list, lineage_dir: Optional[str]) -> None:
    """Best-effort side output (quarantine pattern): one uuid-named shard
    per task execution. A retried/recomputed task writes a SECOND shard
    with the same rows — the records are content-keyed (conv_id, seg), so
    consumers read through :func:`read_seg_lineage`, which dedups.
    ``lineage_dir`` may be a path, URI, or any location reachable via
    pyarrow.fs (functions/fsio) — on a multi-node cluster point it at a
    shared filesystem or object store so shards don't land on node-local
    disks."""
    if not rows or lineage_dir is None:
        return
    import posixpath

    from ..functions import fsio

    fs, lineage_dir = fsio.resolve(lineage_dir)
    fsio.makedirs(fs, lineage_dir)
    t = pa.Table.from_pylist(rows, schema=SEG_LINEAGE)
    fsio.write_table(
        fs, posixpath.join(lineage_dir, f"seg-{uuid.uuid4().hex}.parquet"), t
    )


def read_seg_lineage(lineage_dir: str) -> "pa.Table":
    """Deduplicated segmentation-lineage records (task retries may write
    duplicate shards — exactly-once is restored here by the natural key
    (conv_id, seg)). ``lineage_dir`` may be a path, URI, or any
    pyarrow.fs-reachable location."""
    import posixpath

    from ..functions import fsio

    fs, lineage_dir = fsio.resolve(lineage_dir)
    paths = [
        posixpath.join(lineage_dir, f)
        for f in fsio.listdir(fs, lineage_dir, ".parquet")
    ]
    if not paths:
        return SEG_LINEAGE.empty_table()
    t = pa.concat_tables([fsio.read_table(fs, p) for p in paths])
    return t.group_by(
        ["conv_id", "seg"], use_threads=False
    ).aggregate([("doc_id", "min"), ("n_turns", "min")]).rename_columns(
        ["conv_id", "seg", "doc_id", "n_turns"]
    )


def assemble_group(group: pa.Table, doc_id: Optional[str] = None) -> pa.Table:
    """One conversation (or segment) -> one document row
    (sort-within-group + join). ``doc_id`` overrides the emitted id for
    segmented sub-documents."""
    group = group.sort_by("turn_idx")
    texts = group["text"].to_pylist()
    texts = ["" if t is None else t for t in texts]
    doc_text = TURN_SEP.join(texts)
    lens = np.fromiter((len(t) for t in texts), dtype=np.int64, count=len(texts))
    offsets = np.zeros(len(texts), dtype=np.int64)
    if len(texts) > 1:
        offsets[1:] = np.cumsum(lens[:-1] + len(TURN_SEP))
    if doc_id is None:
        doc_id = group["conv_id"][0].as_py()
    return pa.table(
        {
            "doc_id": pa.array([doc_id], pa.string()),
            "text": pa.array([doc_text], pa.large_string()),
            "n_turns": pa.array([len(texts)], pa.int32()),
            "turn_offsets": pa.array([offsets.tolist()], pa.list_(pa.int64())),
        }
    )


def assemble_partition(
    part: pa.Table, lineage_dir: Optional[str] = None,
    seg_sep: Optional[str] = None,
) -> pa.Table:
    """All conversations of one hash partition -> document rows.

    One Arrow sort + one run-walk per PARTITION (128 Python calls per
    job), not one ``map_groups`` call per conversation (corpus-sized
    micro-groups at scale — the same fix as the dedup/LSH stages).
    Per-conversation output is identical to :func:`assemble_group`.

    If a ``_seg`` column is present (added by :func:`assemble` when a
    turn cap is active), the run key is (conv_id, _seg) and segment
    b > 0 emits ``conv_id + seg_sep + b`` sub-documents (see module
    docstring)."""
    sep = SEG_SEP if seg_sep is None else seg_sep
    if part.num_rows == 0:
        return pa.Table.from_arrays(
            [pa.array([], f.type) for f in DOCUMENTS], schema=DOCUMENTS
        )
    if "_part" in part.column_names:
        part = part.drop_columns(["_part"])
    has_seg = "_seg" in part.column_names
    sort_keys = (
        [("conv_id", "ascending"), ("_seg", "ascending"),
         ("turn_idx", "ascending")]
        if has_seg
        else [("conv_id", "ascending"), ("turn_idx", "ascending")]
    )
    part = part.sort_by(sort_keys)
    conv = part["conv_id"].to_pylist()
    segs = part["_seg"].to_pylist() if has_seg else None
    texts = part["text"].to_pylist()
    n = len(conv)
    doc_ids, doc_texts, n_turns, turn_offsets = [], [], [], []
    lineage_rows: list = []
    i = 0
    while i < n:
        j = i
        while (
            j < n
            and conv[j] == conv[i]
            and (segs is None or segs[j] == segs[i])
        ):
            j += 1
        ts = ["" if t is None else t for t in texts[i:j]]
        lens = np.fromiter((len(t) for t in ts), dtype=np.int64, count=j - i)
        offs = np.zeros(j - i, dtype=np.int64)
        if j - i > 1:
            offs[1:] = np.cumsum(lens[:-1] + len(TURN_SEP))
        seg = segs[i] if segs is not None else 0
        did = conv[i] if not seg else f"{conv[i]}{sep}{seg}"
        if seg:
            lineage_rows.append(
                {"conv_id": conv[i], "seg": int(seg), "doc_id": did,
                 "n_turns": j - i}
            )
        doc_ids.append(did)
        doc_texts.append(TURN_SEP.join(ts))
        n_turns.append(j - i)
        turn_offsets.append(offs.tolist())
        i = j
    _flush_seg_lineage(lineage_rows, lineage_dir)
    return pa.table(
        {
            "doc_id": pa.array(doc_ids, pa.string()),
            "text": pa.array(doc_texts, pa.large_string()),
            "n_turns": pa.array(n_turns, pa.int32()),
            "turn_offsets": pa.array(turn_offsets, pa.list_(pa.int64())),
        }
    )


def assemble(
    transcripts: "ray.data.Dataset",
    max_turns_per_doc: Optional[int] = None,
    lineage_dir: Optional[str] = None,
    seg_sep: Optional[str] = None,
) -> "ray.data.Dataset":
    """transcripts Dataset -> documents Dataset (DOCUMENTS schema).

    ONE ``sort(conv_id, _seg)`` range exchange (the pipeline's single
    required shuffle) followed by a whole-block run-walk.
    ``batch_size=None`` hands each sort partition to
    :func:`assemble_partition` intact, and Ray's sort guarantees equal
    keys are never split across blocks (the same invariant
    ``groupby().map_groups`` is built on — see
    ray.data.grouped_data.GroupedData.map_groups) — so every output block
    holds only COMPLETE (conversation, segment) groups, the
    doc-complete-per-task property the shuffle-free downstream distinct
    relies on (stages/relations.distinct_triples).

    ``max_turns_per_doc`` (default :data:`MAX_TURNS_PER_DOC`) caps the
    turns per output row: the segment bucket ``turn_idx // cap`` joins
    the SORT KEY, so a monster conversation fans out across sort ranges
    and tasks instead of funnelling through one. Segment 0 keeps
    ``doc_id = conv_id`` — all under-cap conversations produce
    bit-identical output. Pass ``max_turns_per_doc=0`` to disable."""
    cap = MAX_TURNS_PER_DOC if max_turns_per_doc is None else max_turns_per_doc
    sep = SEG_SEP if seg_sep is None else seg_sep
    if cap and cap > 0:
        def tag(t: pa.Table) -> pa.Table:
            _guard_seg_collision(t["conv_id"], sep)
            seg = (
                np.asarray(t["turn_idx"].combine_chunks()).astype(np.int64)
                // cap
            )
            return t.append_column("_seg", pa.array(seg, pa.int64()))

        def run(t: pa.Table) -> pa.Table:
            return assemble_partition(t, lineage_dir=lineage_dir, seg_sep=sep)

        return (
            transcripts.map_batches(tag, batch_format="pyarrow")
            .sort(["conv_id", "_seg"])
            .map_batches(run, batch_format="pyarrow", batch_size=None)
        )
    return transcripts.sort("conv_id").map_batches(
        assemble_partition, batch_format="pyarrow", batch_size=None
    )


def read_transcripts(path: Union[str, list]) -> "ray.data.Dataset":
    """Column-pruned transcript read (only what assembly needs).

    Block count is pinned to ~4x the cluster CPUs so the downstream fused
    extraction chain (one task per sort partition) keeps every core busy
    and a skewed block can't become a straggler.
    """
    import ray as _ray

    try:
        cpus = int(_ray.cluster_resources().get("CPU", 8))
    except Exception:  # noqa: BLE001 - not initialised yet
        cpus = 8
    return ray.data.read_parquet(
        path,
        columns=["conv_id", "turn_idx", "text"],
        override_num_blocks=max(64, 4 * cpus),
    )


def check_turn_equality(
    documents: pa.Table,
    transcripts: pa.Table,
    max_turns_per_doc: Optional[int] = None,
    seg_sep: Optional[str] = None,
) -> bool:
    """Per-turn text equality invariant (input_hint): for every turn, the
    assembled document slice at its offset equals the original turn text.
    Driver-side check used in tests (small tables only).

    Segmentation-aware: with the default-on turn cap, a turn of an
    oversized conversation lives in sub-document ``conv_id + sep + seg``
    with a LOCAL offset index (``turn_idx - seg * cap``). Pass the same
    ``max_turns_per_doc`` / ``seg_sep`` the assembly ran with (defaults
    mirror the module defaults); ``max_turns_per_doc=0`` disables the
    mapping for unsegmented output."""
    cap = MAX_TURNS_PER_DOC if max_turns_per_doc is None else max_turns_per_doc
    sep = SEG_SEP if seg_sep is None else seg_sep
    docs = {
        d: (t, o)
        for d, t, o in zip(
            documents["doc_id"].to_pylist(),
            documents["text"].to_pylist(),
            documents["turn_offsets"].to_pylist(),
        )
    }
    conv = transcripts.sort_by([("conv_id", "ascending"), ("turn_idx", "ascending")])
    for cid, tix, text in zip(
        conv["conv_id"].to_pylist(),
        conv["turn_idx"].to_pylist(),
        conv["text"].to_pylist(),
    ):
        seg = tix // cap if cap else 0
        did = cid if not seg else f"{cid}{sep}{seg}"
        if did not in docs:
            return False
        doc_text, offsets = docs[did]
        local = tix - seg * cap
        if local >= len(offsets):
            return False
        start = offsets[local]
        if doc_text[start : start + len(text or "")] != (text or ""):
            return False
    return True


def _assemble_file_batch(
    batch: pa.Table,
    columns=("conv_id", "turn_idx", "text"),
    max_turns_per_doc: Optional[int] = None,
    seg_sep: Optional[str] = None,
) -> pa.Table:
    """One batch of file paths -> assembled documents for every conversation
    in those files (shuffle-free assembly for conv-partitioned input).
    The same ``turn_idx // cap`` segmentation as :func:`assemble` applies
    (caps the output ROW size; task granularity on this path is the file —
    size shards upstream)."""
    import pyarrow.parquet as pq

    cap = MAX_TURNS_PER_DOC if max_turns_per_doc is None else max_turns_per_doc
    sep = SEG_SEP if seg_sep is None else seg_sep
    out = []
    for path in batch["path"].to_pylist():
        # use_threads=False: each concurrent Ray task would otherwise spin
        # up arrow's global thread pool -> massive CPU oversubscription
        t = pq.read_table(path, columns=list(columns), use_threads=False)
        t = t.sort_by([("conv_id", "ascending"), ("turn_idx", "ascending")])
        conv = np.asarray(t["conv_id"].to_pylist(), dtype=object)
        if len(conv) == 0:
            continue
        if cap and cap > 0:
            _guard_seg_collision(t["conv_id"], sep)
        # run boundaries of the sorted (conv, seg) columns
        if cap and cap > 0:
            seg = (
                np.asarray(t["turn_idx"].combine_chunks()).astype(np.int64)
                // cap
            )
            brk = (conv[1:] != conv[:-1]) | (seg[1:] != seg[:-1])
        else:
            seg = np.zeros(len(conv), dtype=np.int64)
            brk = conv[1:] != conv[:-1]
        change = np.nonzero(brk)[0] + 1
        bounds = np.concatenate(([0], change, [len(conv)]))
        for lo, hi in zip(bounds[:-1], bounds[1:]):
            did = (
                conv[lo] if not seg[lo]
                else f"{conv[lo]}{sep}{seg[lo]}"
            )
            out.append(assemble_group(t.slice(lo, hi - lo), doc_id=did))
    if not out:
        return DOCUMENTS.empty_table()
    return pa.concat_tables(out)


def _conv_zone_batch(batch: pa.Table) -> pa.Table:
    """Footer-only per-file conv_id zone rows (no data pages read).

    ``has_stats=False`` marks a file whose footer lacks usable min/max
    (foreign writer, stats disabled) — the caller must route it to the
    exact audit. Statistics may be TRUNCATED for long strings; parquet
    truncation keeps them conservative bounds, so a false overlap only
    costs an audit pass, never a false pass."""
    import pyarrow.parquet as pq

    rows = []
    for path, fidx in zip(
        batch["path"].to_pylist(), batch["fidx"].to_pylist()
    ):
        md = pq.read_metadata(path)
        if md.num_rows == 0:
            continue
        cidx = md.schema.names.index("conv_id")
        mins, maxs = [], []
        ok = True
        for rg in range(md.num_row_groups):
            st = md.row_group(rg).column(cidx).statistics
            if st is None or not st.has_min_max:
                ok = False
                break
            lo, hi = st.min, st.max
            if isinstance(lo, bytes):
                lo = lo.decode("utf-8", "surrogateescape")
            if isinstance(hi, bytes):
                hi = hi.decode("utf-8", "surrogateescape")
            mins.append(lo)
            maxs.append(hi)
        rows.append(
            {
                "fidx": int(fidx),
                "key_min": min(mins) if ok else "",
                "key_max": max(maxs) if ok else "",
                "has_stats": bool(ok),
            }
        )
    return pa.Table.from_pylist(rows, schema=_ZONE_SCHEMA)


_ZONE_SCHEMA = pa.schema(
    [
        ("fidx", pa.int64()),
        ("key_min", pa.string()),
        ("key_max", pa.string()),
        ("has_stats", pa.bool_()),
    ]
)


def _audit_conv_disjoint(paths: "list[str]") -> None:
    """EXACT one-conversation-one-file audit over ``paths``: pruned
    conv_id-column read -> per-file distinct (combiner) -> conv-keyed
    digest-only exchange -> any conv_id seen in >=2 files raises. The
    shuffle moves (conv_id, fidx) pairs only — bytes ~ #conversations,
    never the text payload."""
    import pandas as pd

    from ..functions.partitioning import groupby_partition

    files = ray.data.from_items(
        [{"path": p, "fidx": i} for i, p in enumerate(paths)],
        override_num_blocks=max(len(paths), 1),
    )

    def distinct_convs(batch: pa.Table) -> pa.Table:
        import pyarrow.parquet as pq

        outs = []
        for path, fidx in zip(
            batch["path"].to_pylist(), batch["fidx"].to_pylist()
        ):
            t = pq.read_table(path, columns=["conv_id"], use_threads=False)
            u = pc.unique(t["conv_id"].combine_chunks())
            outs.append(
                pa.table(
                    {
                        "conv_id": u.cast(pa.string()),
                        "fidx": pa.array(
                            np.full(len(u), fidx, dtype=np.int64)
                        ),
                    }
                )
            )
        if not outs:
            return pa.table(
                {"conv_id": pa.array([], pa.string()),
                 "fidx": pa.array([], pa.int64())}
            )
        return pa.concat_tables(outs)

    viol_schema = pa.schema(
        [("conv_id", pa.string()), ("n_files", pa.int64())]
    )

    def find_dupes(df: "pd.DataFrame") -> "pd.DataFrame":
        g = df.groupby("conv_id", sort=False)["fidx"].nunique()
        g = g[g > 1]
        return pd.DataFrame(
            {"conv_id": g.index.astype(str), "n_files": g.to_numpy("int64")}
        )

    viol = groupby_partition(
        files.map_batches(
            distinct_convs, batch_format="pyarrow", batch_size=1
        ),
        "conv_id", find_dupes, batch_format="pandas", schema=viol_schema,
    )
    sample = viol.take(8)
    if sample:
        ids = [r["conv_id"] for r in sample]
        raise ValueError(
            "assemble_partitioned: layout precondition violated — "
            f"conversation(s) {ids} span more than one parquet file. "
            "The shuffle-free path would emit duplicate doc_ids "
            "(partial documents). Re-bucket the input so each "
            "conversation lives in exactly one file, or use "
            "assembly.assemble(read_transcripts(...)) (one sort "
            "exchange) for unpartitioned layouts."
        )


def check_partitioned_layout(paths: "list[str]") -> None:
    """Verify the one-conversation-one-file precondition, cheaply.

    Two tiers (round-4 VERDICT item 2): (1) a footer-stats zone pass —
    one metadata read per file, no data pages; if every file's
    [min, max] conv_id range is disjoint, the precondition PROVABLY
    holds (a conv in two files would put its id inside both ranges) and
    the check costs nothing more. (2) Files whose ranges overlap (the
    normal state for conv-HASH-bucketed writers, whose ranges all span
    the id space) or that lack stats fall through to the exact
    digest-only audit :func:`_audit_conv_disjoint`, restricted to the
    overlapping group — a pruned conv_id-column read, never the text.
    Raises ``ValueError`` naming offending conversations on violation.
    """
    if len(paths) <= 1:
        return
    files = ray.data.from_items(
        [{"path": p, "fidx": i} for i, p in enumerate(paths)],
        override_num_blocks=max(len(paths), 1),
    )
    zones = files.map_batches(
        _conv_zone_batch, batch_format="pyarrow", batch_size=1
    ).to_pandas()
    if zones.empty:
        return
    statless: set = set(zones.loc[~zones["has_stats"], "fidx"])
    suspect: set = set(statless)
    ranged = zones[zones["has_stats"]].sort_values("key_min")
    # transitive overlap grouping over the sorted ranges
    group: list = []
    group_max = ""
    for fidx, lo, hi in ranged[["fidx", "key_min", "key_max"]].itertuples(
        index=False
    ):
        if group and lo <= group_max:
            group.append(fidx)
            group_max = max(group_max, hi)
        else:
            if len(group) > 1:
                suspect.update(group)
            group = [fidx]
            group_max = hi
    if len(group) > 1:
        suspect.update(group)
    # stats-less files can collide with ANY file, so audit everything
    # once one is present; otherwise only the overlapping ranges
    if statless:
        suspect = set(zones["fidx"])
    if suspect:
        _audit_conv_disjoint([paths[i] for i in sorted(suspect)])


# layouts already verified by this process (verify="auto" memo): repeated
# pipeline runs over the same file set skip the re-check. Keyed by
# DIRECTORY with the file-stat tuple as value (one entry per dir,
# replaced on change — bounded, no growth across rewrite cycles).
_VERIFIED_LAYOUTS: dict = {}


def assemble_partitioned(
    path_dir: str, verify: str = "auto"
) -> "ray.data.Dataset":
    """Shuffle-FREE assembly for input partitioned by conversation.

    Partitioning assumption (documented per SURVEY.md §2 custom-operator
    rule): every conversation's rows live in exactly ONE parquet file —
    the standard layout for conversation logs at scale (writers bucket by
    conv hash). Each file becomes one task that sorts locally and emits
    whole documents, so the pipeline has NO all-to-all exchange at all;
    parallelism = file count (size shards upstream, ~100-500 MB each).
    Unpartitioned input must use :func:`assemble` (one groupby shuffle).

    ``verify`` guards the precondition LOUDLY (a violating layout would
    otherwise silently emit duplicate doc_ids): ``"auto"`` (default) runs
    :func:`check_partitioned_layout` — footer-only when conv_id ranges
    are disjoint, exact digest audit otherwise — ONCE per layout per
    process (keyed by (path, size, mtime) per file; rewritten or changed
    shards re-verify); ``"audit"`` forces the exact audit every call;
    ``"none"`` skips entirely (trusted writer).
    """
    import os as _os

    paths = sorted(
        _os.path.join(path_dir, f)
        for f in _os.listdir(path_dir)
        if f.endswith(".parquet")
    )
    if verify == "auto":
        # memo value includes size+mtime so shards rewritten IN PLACE under
        # the same names (e.g. a part=N/data.parquet convention) re-verify
        key = tuple(
            (p, st.st_size, st.st_mtime_ns)
            for p, st in ((p, _os.stat(p)) for p in paths)
        )
        if _VERIFIED_LAYOUTS.get(path_dir) != key:
            check_partitioned_layout(paths)
            _VERIFIED_LAYOUTS[path_dir] = key
    elif verify == "audit":
        _audit_conv_disjoint(paths)
    elif verify != "none":
        raise ValueError(f"verify must be auto|audit|none, got {verify!r}")
    # one file per task: one block per path + batch_size=1 so the
    # min-block-size bundler cannot pack several files into one task
    files = ray.data.from_items(
        [{"path": p} for p in paths], override_num_blocks=max(len(paths), 1)
    )
    # capture cap/sep BY VALUE at the driver so workers honor the
    # driver's env/config even if their own env differs
    cap = MAX_TURNS_PER_DOC
    sep = SEG_SEP
    return files.map_batches(
        lambda b: _assemble_file_batch(
            b, max_turns_per_doc=cap, seg_sep=sep
        ),
        batch_format="pyarrow", batch_size=1,
    )
