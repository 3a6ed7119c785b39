"""CoNLL NER export/import (token<sep>IOB-label streams).

Reference semantics:

* IOB projection ``HealthRecord.get_labels`` (ehr.py:322-351): ``B-<SHORT>``
  on the entity's first token, ``I-<SHORT>`` on the rest, short labels per
  ``ENT_LABEL_MAP`` (ehr.py:335-337). Later entities overwrite earlier ones
  on overlap (dict iteration order) — we process mentions in ``ent_id``
  order within a doc for determinism.
* Writer ``generate_input_files`` (biobert_ner/utils_ner.py:305-373): one
  ``token<sep>label`` per line; blank line between windows (split points)
  and after each document.
* Reader ``read_examples_from_file`` (biobert_ner/utils_ner.py:135-162):
  blank lines / ``-DOCSTART-`` end a sequence; missing labels -> ``O``.

Ray shape: label projection and block formatting are stateless
``map_batches`` over co-partitioned (document, its mentions) rows; the
file sink writes one ``.txt`` shard per executing batch (scales out, no
driver bottleneck), named by the first doc_id so reruns are idempotent.
"""

from __future__ import annotations

import os
from typing import Dict, List, Tuple

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

import ray.data

from ..functions.chunking import split_points
from ..functions.tokenize import char_to_token, token_spans, tokens_of
from ..schemas import ENT_LABEL_MAP

CONLL_BLOCKS = pa.schema(
    [("doc_id", pa.string()), ("conll", pa.large_string())]
)

SEQUENCES = pa.schema(
    [
        ("seq_idx", pa.int64()),
        ("tokens", pa.list_(pa.string())),
        ("labels", pa.list_(pa.string())),
    ]
)


def iob_labels(
    text: str, mentions: List[Tuple[str, int, int]]
) -> List[str]:
    """Token IOB labels for one doc (get_labels, ehr.py:322-351).

    ``mentions`` is ``[(ent_type, start_char, end_char_exclusive), ...]``.
    """
    starts, _ends = token_spans(text)
    labels = ["O"] * len(starts)
    for ent_type, s, e in mentions:
        short = ENT_LABEL_MAP.get(ent_type, ent_type.upper()[:3])
        t0 = int(char_to_token(starts, s))
        t1 = int(char_to_token(starts, max(e - 1, s)))
        for idx in range(t0, t1 + 1):
            labels[idx] = ("B-" if idx == t0 else "I-") + short
    return labels


def doc_block(
    doc_id: str,
    text: str,
    mentions: List[Tuple[str, int, int]],
    max_len: int = 510,
    sep: str = " ",
) -> str:
    """One document's CoNLL text (windows blank-line separated,
    generate_input_files, utils_ner.py:305-347)."""
    starts, _ = token_spans(text)
    toks = tokens_of(text)
    labels = iob_labels(text, mentions)
    split = split_points(text, starts, max_len=max_len)
    parts: List[str] = []
    for i in range(1, len(split)):
        lo, hi = split[i - 1], split[i]
        parts.append(
            "\n".join(f"{t}{sep}{l}" for t, l in zip(toks[lo:hi], labels[lo:hi]))
        )
    return "\n\n".join(p for p in parts if p) + "\n"


def blocks_batch(batch: pa.Table, max_len: int = 510, sep: str = " ") -> pa.Table:
    """(doc_id, text, ment_types, ment_starts, ment_ends) -> CONLL_BLOCKS."""
    doc_ids, blocks = [], []
    for row in batch.to_pylist():
        ments = list(
            zip(
                row.get("ment_types") or [],
                row.get("ment_starts") or [],
                row.get("ment_ends") or [],
            )
        )
        doc_ids.append(row["doc_id"])
        blocks.append(doc_block(row["doc_id"], row["text"], ments, max_len, sep))
    return pa.table(
        {
            "doc_id": pa.array(doc_ids, pa.string()),
            "conll": pa.array(blocks, pa.large_string()),
        }
    )


def attach_mentions(
    documents: "ray.data.Dataset", mentions: "ray.data.Dataset"
) -> "ray.data.Dataset":
    """Co-partition mentions onto their documents (list columns).

    Left-outer merge expressed as ONE ``groupby(doc_id)`` shuffle over the
    tagged union of both sides — the same partitioning key as the rest of
    the pipeline, no separate join machinery (and no aggregator actor pool
    to size against the cluster).
    """
    docs_side = documents.select_columns(["doc_id", "text"]).map_batches(
        lambda t: t.append_column(
            "ent_type", pa.nulls(t.num_rows, pa.string())
        ).append_column(
            "start", pa.nulls(t.num_rows, pa.int64())
        ).append_column(
            "end", pa.nulls(t.num_rows, pa.int64())
        ).append_column("ent_ord", pa.nulls(t.num_rows, pa.int64())),
        batch_format="pyarrow",
    )

    def tag_mentions(t: pa.Table) -> pa.Table:
        # detection order = numeric part of ent_id ("T%d", assigned in
        # DictNER detection order) — get_labels iterates the entity dict in
        # insertion order (ehr.py:322-351), so overlap overwrites must
        # happen in that order, NOT char order (ADVICE round 1).
        ent_ord = pc.cast(pc.utf8_slice_codeunits(t["ent_id"], 1, 2**31 - 1), pa.int64())
        return t.select(["doc_id", "ent_type", "start", "end"]).add_column(
            1, "text", pa.nulls(t.num_rows, pa.large_string())
        ).append_column("ent_ord", ent_ord)

    ment_side = mentions.select_columns(
        ["doc_id", "ent_id", "ent_type", "start", "end"]
    ).map_batches(tag_mentions, batch_format="pyarrow")

    def merge_partition(group: pa.Table) -> pa.Table:
        """All docs of one hash partition at once (group-closed: every
        step keys on doc_id) — one Python call per partition, not one
        per document. Mentions without a document row are dropped (same
        as the per-group version)."""
        import pandas as pd

        text_rows = group.filter(pc.is_valid(group["text"]))
        if text_rows.num_rows == 0:
            return _ATTACHED.empty_table()
        ments = group.filter(pc.is_valid(group["ent_type"]))
        td = text_rows.select(["doc_id", "text"]).to_pandas()
        md = (
            ments.select(["doc_id", "ent_type", "start", "end", "ent_ord"])
            .to_pandas()
            .sort_values(["doc_id", "ent_ord"], kind="stable")
        )
        agg = (
            md.groupby("doc_id")
            .agg(
                ment_types=("ent_type", list),
                ment_starts=("start", list),
                ment_ends=("end", list),
            )
            .reset_index()
        )
        out = td.merge(agg, on="doc_id", how="left")
        empty = out["ment_types"].isna()
        for c in ("ment_types", "ment_starts", "ment_ends"):
            out.loc[empty, c] = out.loc[empty, c].apply(lambda _: [])
        return pa.table(
            {
                "doc_id": pa.array(out["doc_id"], pa.string()),
                "text": pa.array(out["text"], pa.large_string()),
                "ment_types": pa.array(
                    out["ment_types"].tolist(), pa.list_(pa.string())
                ),
                "ment_starts": pa.array(
                    out["ment_starts"].tolist(), pa.list_(pa.int64())
                ),
                "ment_ends": pa.array(
                    out["ment_ends"].tolist(), pa.list_(pa.int64())
                ),
            }
        )

    from ..functions.partitioning import groupby_partition

    return groupby_partition(
        docs_side.union(ment_side), "doc_id", merge_partition
    )


_ATTACHED = pa.schema(
    [
        ("doc_id", pa.string()),
        ("text", pa.large_string()),
        ("ment_types", pa.list_(pa.string())),
        ("ment_starts", pa.list_(pa.int64())),
        ("ment_ends", pa.list_(pa.int64())),
    ]
)


def write_conll(
    blocks: "ray.data.Dataset", out_dir: str, suffix: str = "txt"
) -> None:
    """Distributed CoNLL sink: one shard file per batch, named by the
    first doc_id (idempotent; re-running overwrites the same shards)."""
    os.makedirs(out_dir, exist_ok=True)

    def write_shard(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return pa.table({"path": pa.array([], pa.string())})
        name = batch["doc_id"][0].as_py().replace("/", "_")
        path = os.path.join(out_dir, f"part-{name}.{suffix}")
        with open(path, "w", encoding="utf-8") as f:
            for block in batch["conll"].to_pylist():
                f.write(block)
                f.write("\n")
        return pa.table({"path": pa.array([path], pa.string())})

    blocks.map_batches(write_shard, batch_format="pyarrow").materialize()


def parse_conll(text: str, sep: str = " ") -> List[Dict]:
    """CoNLL text -> sequence rows (read_examples_from_file parity)."""
    out: List[Dict] = []
    words: List[str] = []
    labels: List[str] = []
    seq = 0
    for line in text.split("\n"):
        line = line.rstrip()
        if line.startswith("-DOCSTART-") or line == "":
            if words:
                out.append({"seq_idx": seq, "tokens": words, "labels": labels})
                seq += 1
                words, labels = [], []
        else:
            sp = line.split(sep)
            words.append(sp[0])
            labels.append(sp[-1] if len(sp) > 1 else "O")
    if words:
        out.append({"seq_idx": seq, "tokens": words, "labels": labels})
    return out


def read_conll(paths, sep: str = " ") -> "ray.data.Dataset":
    """Distributed reader: whole-file text items -> SEQUENCES rows."""
    files = ray.data.read_binary_files(paths)

    def to_rows(batch: pa.Table) -> pa.Table:
        rows: List[Dict] = []
        base = 0
        for payload in batch["bytes"].to_pylist():
            for r in parse_conll(payload.decode("utf-8"), sep):
                r["seq_idx"] += base
                rows.append(r)
            base = rows[-1]["seq_idx"] + 1 if rows else base
        if not rows:
            return SEQUENCES.empty_table()
        return pa.table(
            {f.name: pa.array([r[f.name] for r in rows], f.type) for f in SEQUENCES}
        )

    return files.map_batches(to_rows, batch_format="pyarrow")
