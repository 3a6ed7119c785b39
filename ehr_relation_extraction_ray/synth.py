"""Deterministic synthetic multi-turn transcript generator.

Produces the engine's primary input table (driver ``input_hint`` shape:
``conv_id, turn_idx, role, text, tool, ts``) seeded with known lexicon
surfaces so mention/triple conformance can be checked against the serial
reference-semantics oracle (``tests/refsem.py``).

Determinism contract: every conversation is generated from its own
``numpy`` RNG seeded by ``(seed, conv_index)`` — output is identical
regardless of generation order or parallelism (SURVEY.md §4 determinism
row). Rows are written in a deterministically *shuffled* order so the
assembly stage must actually sort by ``turn_idx`` (FIXTURES.md F1).

Skew: every 97th conversation is "hot" with ~40x the turns, exercising the
salting/split paths the north rule requires.
"""

from __future__ import annotations

import os
import tempfile
from typing import List

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

from .lexicon import DEFAULT_LEXICON
from .schemas import TRANSCRIPTS

_FILLER = (
    "patient reports feeling well today and vitals are stable overall . "
    "follow up visit scheduled with the clinic team . notes reviewed by "
    "attending physician . labs were drawn this morning . no acute distress "
    "observed during the exam . the naïve café plan costs $5 copay @ front "
    "desk . résumé of care continues . α values within range ."
).split(" . ")

_ROLES = ["user", "assistant", "tool"]
_TOOLS = ["", "chart_lookup", "order_entry", ""]

# Sentence templates; {X} placeholders are filled from DEFAULT_LEXICON.
# Every surface is preceded and followed by a single space (or " ." end)
# so the delimited dictionary regexes (lexicon.py) can match it.
_TEMPLATES = [
    "clinician started {Drug} {Strength} {Dosage} {Route} {Frequency} for {Reason} .",
    "patient took {Drug} {Strength} {Frequency} and developed {ADE} .",
    "plan to continue {Drug} {Form} {Route} {Duration} .",
    "discussed {Drug} {Strength} {Frequency} due to {Reason} .",
    "holding {Drug} after {ADE} was noted .",
    "prescribed {Drug} {Dosage} {Frequency} {Duration} for {Reason} .",
]


def _turn_text(rng: np.random.Generator) -> str:
    lines: List[str] = []
    n_lines = int(rng.integers(1, 5))
    for _ in range(n_lines):
        if rng.random() < 0.55:
            tpl = _TEMPLATES[int(rng.integers(0, len(_TEMPLATES)))]
            out = []
            for part in tpl.split(" "):
                if part.startswith("{") and part.endswith("}"):
                    surfaces = DEFAULT_LEXICON[part[1:-1]]
                    out.append(surfaces[int(rng.integers(0, len(surfaces)))])
                else:
                    out.append(part)
            lines.append(" ".join(out))
        else:
            lines.append(_FILLER[int(rng.integers(0, len(_FILLER)))] + " .")
    # occasional internal paragraph break (chunker par-marker path)
    sep = "\n\n" if rng.random() < 0.15 else "\n"
    return sep.join(lines)


def conv_turns(seed: int, conv_index: int, hot_every: int = 97):
    """All rows of one conversation (list of dicts), deterministic."""
    rng = np.random.default_rng((seed, conv_index))
    conv_id = f"conv-{conv_index:08d}"
    n_turns = int(rng.integers(4, 18))
    if hot_every and conv_index % hot_every == 7:
        n_turns *= 40  # hot key
    base_ts = 1_700_000_000_000_000 + conv_index * 3_600_000_000
    rows = []
    for t in range(n_turns):
        if t > 0 and rng.random() < 0.03:
            text = ""  # empty turn (FIXTURES.md F1)
        else:
            text = _turn_text(rng)
        rows.append(
            {
                "conv_id": conv_id,
                "turn_idx": t,
                "role": _ROLES[t % 3],
                "text": text,
                "tool": _TOOLS[int(rng.integers(0, len(_TOOLS)))],
                "ts": base_ts + t * 60_000_000,
            }
        )
    return rows


def generate_table(n_convs: int, seed: int = 42, hot_every: int = 97) -> pa.Table:
    """The full transcripts table, rows deterministically shuffled."""
    rows = []
    for c in range(n_convs):
        rows.extend(conv_turns(seed, c, hot_every))
    order = np.random.default_rng(seed).permutation(len(rows))
    rows = [rows[i] for i in order]
    table = pa.Table.from_pylist(rows)
    table = table.set_column(
        table.schema.get_field_index("ts"),
        "ts",
        table["ts"].cast(pa.timestamp("us")),
    )
    return table.select(TRANSCRIPTS.names).cast(TRANSCRIPTS)


def _generate_to(
    out_dir: str, n_convs: int, shard_convs: int = 0, shuffle_within: bool = False
) -> str:
    """Write the table once, atomically. ``shard_convs > 0`` writes one
    parquet file per conversation chunk (parallel read at scale — a single
    big file reads in ONE Ray task); returns the file or directory path.
    ``shuffle_within`` deterministically permutes rows inside each shard so
    the layout keeps generate_table's "input is not pre-sorted" property
    (a conversation still never spans files — the partitioning contract)."""
    single = os.path.join(out_dir, "transcripts.parquet")
    target = out_dir if shard_convs else single
    if not os.path.exists(target if shard_convs else single) or (
        shard_convs and not os.path.isdir(out_dir)
    ):
        os.makedirs("/tmp/graft_transcripts", exist_ok=True)
        tmp = tempfile.mkdtemp(dir="/tmp/graft_transcripts")
        if shard_convs:
            for i, lo in enumerate(range(0, n_convs, shard_convs)):
                rows = []
                for c in range(lo, min(lo + shard_convs, n_convs)):
                    rows.extend(conv_turns(42, c))
                if shuffle_within:
                    order = np.random.default_rng((42, i)).permutation(len(rows))
                    rows = [rows[j] for j in order]
                t = pa.Table.from_pylist(rows)
                t = t.set_column(
                    t.schema.get_field_index("ts"),
                    "ts",
                    t["ts"].cast(pa.timestamp("us")),
                )
                pq.write_table(
                    t.select(TRANSCRIPTS.names).cast(TRANSCRIPTS),
                    os.path.join(tmp, f"transcripts-{i:04d}.parquet"),
                )
        else:
            pq.write_table(generate_table(n_convs), os.path.join(tmp, "transcripts.parquet"))
        try:
            os.rename(tmp, out_dir)
        except OSError:
            pass  # another process won the race; theirs is identical
    return target


def transcripts_path(sf_dir: str) -> str:
    """Deterministic on-disk location of the transcripts for a testdata dir.

    Scale follows the driver's sf tier (sf0.001 -> 60 convs, sf0.01 -> 600,
    sf0.1 -> 6000). Generated once, written atomically (tmp dir + rename)
    so concurrent callers and reruns are safe; DuckDB oracle SQL reads the
    same file.
    """
    sf = os.path.basename(os.path.normpath(sf_dir)).replace("sf", "")
    n_convs = max(int(60000 * float(sf)), 10)
    # conversation-partitioned layout (one conv never spans files; ~64
    # shards so the shuffle-free assembly path parallelizes), rows shuffled
    # within each shard; identical row CONTENT to the old single-file
    # layout (same conv_turns stream), so fixtures and oracles are unmoved
    return _generate_to(
        f"/tmp/graft_transcripts/sf{sf}_p",
        n_convs,
        shard_convs=max(5, n_convs // 64),
        shuffle_within=True,
    )


def transcripts_path_n(n_convs: int) -> str:
    """Transcripts table with an explicit conversation count (used by the
    scaling bench, which needs a compute-dominated input). Sharded into
    375-conversation files (conversation-partitioned layout: a conv never
    spans files) so the read parallelizes and the shuffle-free pipeline
    has fine-grained tasks."""
    return _generate_to(
        f"/tmp/graft_transcripts/n{n_convs}", n_convs, shard_convs=375
    )
