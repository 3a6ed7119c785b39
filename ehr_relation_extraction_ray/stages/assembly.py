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


def assemble(transcripts: "ray.data.Dataset") -> "ray.data.Dataset":
    """transcripts Dataset -> documents Dataset (DOCUMENTS schema)."""
    return transcripts.groupby("conv_id").map_groups(
        assemble_group, batch_format="pyarrow"
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
