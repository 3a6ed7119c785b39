"""Conversation assembly: transcripts -> documents.

The engine's only order-sensitive step (SURVEY.md O3, §2.9): turns are
sorted by ``turn_idx`` *within* each ``conv_id`` group and joined with
``"\\n\\n"`` — a turn boundary is a paragraph boundary, which is exactly the
chunker's preferred split marker (``ehr.py:417-419``), and per-turn text
equality is preserved (the driver input_hint per-row invariant: the char
slice of the assembled text at each recorded offset equals the turn's
original text).

Shuffle shape: one ``groupby(conv_id)`` hash shuffle; there is no global
sort. A pathological conversation is bounded by the generator/driver (turn
counts), and everything downstream is per-document rows, so hot keys cost
one oversized group here only; the shuffle-heavy canonicalization stage
salts separately (stages/canonicalize.py).
"""

from __future__ import annotations

from typing import Union

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

import ray.data

from ..schemas import DOCUMENTS

TURN_SEP = "\n\n"


def assemble_group(group: pa.Table) -> pa.Table:
    """One conversation -> one document row (sort-within-group + join)."""
    group = group.sort_by("turn_idx")
    texts = group["text"].to_pylist()
    texts = ["" if t is None else t for t in texts]
    doc_text = TURN_SEP.join(texts)
    lens = np.fromiter((len(t) for t in texts), dtype=np.int64, count=len(texts))
    offsets = np.zeros(len(texts), dtype=np.int64)
    if len(texts) > 1:
        offsets[1:] = np.cumsum(lens[:-1] + len(TURN_SEP))
    return pa.table(
        {
            "doc_id": pa.array([group["conv_id"][0].as_py()], pa.string()),
            "text": pa.array([doc_text], pa.large_string()),
            "n_turns": pa.array([len(texts)], pa.int32()),
            "turn_offsets": pa.array([offsets.tolist()], pa.list_(pa.int64())),
        }
    )


def assemble_partition(part: pa.Table) -> pa.Table:
    """All conversations of one hash partition -> document rows.

    One Arrow sort + one run-walk per PARTITION (128 Python calls per
    job), not one ``map_groups`` call per conversation (corpus-sized
    micro-groups at scale — the same fix as the dedup/LSH stages).
    Per-conversation output is identical to :func:`assemble_group`."""
    if part.num_rows == 0:
        return pa.Table.from_arrays(
            [pa.array([], f.type) for f in DOCUMENTS], schema=DOCUMENTS
        )
    if "_part" in part.column_names:
        part = part.drop_columns(["_part"])
    part = part.sort_by(
        [("conv_id", "ascending"), ("turn_idx", "ascending")]
    )
    conv = part["conv_id"].to_pylist()
    texts = part["text"].to_pylist()
    n = len(conv)
    doc_ids, doc_texts, n_turns, turn_offsets = [], [], [], []
    i = 0
    while i < n:
        j = i
        while j < n and conv[j] == conv[i]:
            j += 1
        ts = ["" if t is None else t for t in texts[i:j]]
        lens = np.fromiter((len(t) for t in ts), dtype=np.int64, count=j - i)
        offs = np.zeros(j - i, dtype=np.int64)
        if j - i > 1:
            offs[1:] = np.cumsum(lens[:-1] + len(TURN_SEP))
        doc_ids.append(conv[i])
        doc_texts.append(TURN_SEP.join(ts))
        n_turns.append(j - i)
        turn_offsets.append(offs.tolist())
        i = j
    return pa.table(
        {
            "doc_id": pa.array(doc_ids, pa.string()),
            "text": pa.array(doc_texts, pa.large_string()),
            "n_turns": pa.array(n_turns, pa.int32()),
            "turn_offsets": pa.array(turn_offsets, pa.list_(pa.int64())),
        }
    )


def assemble(transcripts: "ray.data.Dataset") -> "ray.data.Dataset":
    """transcripts Dataset -> documents Dataset (DOCUMENTS schema).

    ONE ``sort(conv_id)`` range exchange (the pipeline's single required
    shuffle) followed by a whole-block run-walk. ``batch_size=None`` hands
    each sort partition to :func:`assemble_partition` intact, and Ray's
    sort guarantees equal keys are never split across blocks (the same
    invariant ``groupby().map_groups`` is built on — see
    ray.data.grouped_data.GroupedData.map_groups) — so every output block
    holds only COMPLETE conversations, the doc-complete-per-task property
    the shuffle-free downstream distinct relies on
    (stages/relations.distinct_triples)."""
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


def check_turn_equality(documents: pa.Table, transcripts: pa.Table) -> bool:
    """Per-turn text equality invariant (input_hint): for every turn, the
    assembled document slice at its offset equals the original turn text.
    Driver-side check used in tests (small tables only)."""
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
        doc_text, offsets = docs[cid]
        start = offsets[tix]
        if doc_text[start : start + len(text or "")] != (text or ""):
            return False
    return True


def _assemble_file_batch(batch: pa.Table, columns=("conv_id", "turn_idx", "text")) -> pa.Table:
    """One batch of file paths -> assembled documents for every conversation
    in those files (shuffle-free assembly for conv-partitioned input)."""
    import pyarrow.parquet as pq

    out = []
    for path in batch["path"].to_pylist():
        # use_threads=False: each concurrent Ray task would otherwise spin
        # up arrow's global thread pool -> massive CPU oversubscription
        t = pq.read_table(path, columns=list(columns), use_threads=False)
        t = t.sort_by([("conv_id", "ascending"), ("turn_idx", "ascending")])
        conv = np.asarray(t["conv_id"].to_pylist(), dtype=object)
        # run boundaries of the sorted conv column
        change = np.nonzero(conv[1:] != conv[:-1])[0] + 1
        bounds = np.concatenate(([0], change, [len(conv)]))
        for lo, hi in zip(bounds[:-1], bounds[1:]):
            out.append(assemble_group(t.slice(lo, hi - lo)))
    if not out:
        return DOCUMENTS.empty_table()
    return pa.concat_tables(out)


def assemble_partitioned(path_dir: str) -> "ray.data.Dataset":
    """Shuffle-FREE assembly for input partitioned by conversation.

    Partitioning assumption (documented per SURVEY.md §2 custom-operator
    rule): every conversation's rows live in exactly ONE parquet file —
    the standard layout for conversation logs at scale (writers bucket by
    conv hash). Each file becomes one task that sorts locally and emits
    whole documents, so the pipeline has NO all-to-all exchange at all;
    parallelism = file count (size shards upstream, ~100-500 MB each).
    Unpartitioned input must use :func:`assemble` (one groupby shuffle).
    """
    import os as _os

    paths = sorted(
        _os.path.join(path_dir, f)
        for f in _os.listdir(path_dir)
        if f.endswith(".parquet")
    )
    # one file per task: one block per path + batch_size=1 so the
    # min-block-size bundler cannot pack several files into one task
    files = ray.data.from_items(
        [{"path": p} for p in paths], override_num_blocks=max(len(paths), 1)
    )
    return files.map_batches(
        _assemble_file_batch, batch_format="pyarrow", batch_size=1
    )
