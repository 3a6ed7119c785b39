"""RE TSV export/import (candidate-pair sentences for the RE scorer).

Reference semantics (``write_file``, biobert_re/utils_re.py:187-194):

* train split: ``sentence<sep>label``
* test split (no labels): ``index<sep>sentence``
* test_original (labels kept): ``index<sep>sentence<sep>label``

plus the whitespace scrub (``\\n``/``\\t`` -> space, utils_re.py:289,426)
which our candidate stage already applies to ``masked_text``.

Reader parity: ``EHRProcessor`` (biobert_re/data_processor.py:114-141) —
train lines are ``(sentence, label)``, test lines ``(index, sentence)``.

Ray shape: formatting is a stateless projection; the sink writes one TSV
shard per batch. Indices must be globally unique and deterministic under
any parallelism, so the row index is not a counter but the stable
candidate key ``(doc_id, win_idx, cand_idx)`` rendered as a string — the
reference's sequential ints (utils_re.py:265) are meaningless once the
file order is parallel.
"""

from __future__ import annotations

import os
from typing import List

import pyarrow as pa
import pyarrow.csv

import ray.data


def format_lines(
    batch: pa.Table, split: str = "train", sep: str = "\t"
) -> pa.Table:
    """CANDIDATES (+ optional ``label``) batch -> one formatted line per row."""
    sents = batch["masked_text"].to_pylist()
    labels = (
        batch["label"].to_pylist()
        if "label" in batch.column_names
        else [0] * batch.num_rows
    )
    idx = [
        f"{d}:{w}:{c}"
        for d, w, c in zip(
            batch["doc_id"].to_pylist(),
            batch["win_idx"].to_pylist(),
            batch["cand_idx"].to_pylist(),
        )
    ]
    if split == "train":
        lines = [f"{s}{sep}{l}" for s, l in zip(sents, labels)]
    elif split == "test":
        lines = [f"{i}{sep}{s}" for i, s in zip(idx, sents)]
    elif split == "test_original":
        lines = [f"{i}{sep}{s}{sep}{l}" for i, s, l in zip(idx, sents, labels)]
    else:
        raise ValueError(f"unknown split {split!r}")
    return pa.table(
        {
            "key": pa.array(idx, pa.string()),
            "line": pa.array(lines, pa.large_string()),
        }
    )


def write_re_tsv(
    candidates: "ray.data.Dataset",
    out_dir: str,
    split: str = "train",
    sep: str = "\t",
) -> None:
    """Distributed TSV sink: shard per batch, named by first candidate key."""
    os.makedirs(out_dir, exist_ok=True)
    lines = candidates.map_batches(
        lambda b: format_lines(b, split, sep), batch_format="pyarrow"
    )

    def write_shard(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return pa.table({"path": pa.array([], pa.string())})
        name = batch["key"][0].as_py().replace("/", "_").replace(":", "_")
        path = os.path.join(out_dir, f"{split}-{name}.tsv")
        with open(path, "w", encoding="utf-8") as f:
            for line in batch["line"].to_pylist():
                f.write(line)
                f.write("\n")
        return pa.table({"path": pa.array([path], pa.string())})

    lines.map_batches(write_shard, batch_format="pyarrow").materialize()


def read_re_tsv(paths, split: str = "train", sep: str = "\t") -> "ray.data.Dataset":
    """TSV shards -> rows (data_processor.py:114-141 parity)."""
    files = ray.data.read_binary_files(paths)

    def to_rows(batch: pa.Table) -> pa.Table:
        keys: List[str] = []
        sents: List[str] = []
        labels: List[str] = []
        for payload in batch["bytes"].to_pylist():
            for line in payload.decode("utf-8").split("\n"):
                if not line:
                    continue
                parts = line.split(sep)
                if split == "train":
                    keys.append("")
                    sents.append(parts[0])
                    labels.append(parts[-1])
                elif split == "test":
                    keys.append(parts[0])
                    sents.append(parts[1])
                    labels.append("")
                else:
                    keys.append(parts[0])
                    sents.append(parts[1])
                    labels.append(parts[-1])
        return pa.table(
            {
                "key": pa.array(keys, pa.string()),
                "sentence": pa.array(sents, pa.large_string()),
                "label": pa.array(labels, pa.string()),
            }
        )

    return files.map_batches(to_rows, batch_format="pyarrow")
