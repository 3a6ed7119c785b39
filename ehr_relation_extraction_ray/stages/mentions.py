"""Mention detection: documents -> mentions (+ windows as a side product).

The detector is an actor-pool ``map_batches`` stage (SURVEY.md A4): the
fitted dictionary regex state is compiled once per actor in ``__init__``
and reused for every batch; the per-batch work is C-level ``re.finditer``
over each document (the reference's ``DictNER.predict``,
``rule_based_ner/dict_ner.py:82-119``) followed by the post-filters of
``get_ner_predictions`` (``predict.py:340-351``).

A model-backed detector (BioBERT, ``predict.py:188-261``) plugs into the
same stage interface: same output columns, heavier ``__init__``.
"""

from __future__ import annotations

from typing import Dict, List, Optional

import pyarrow as pa

import ray.data

from ..functions.chunking import split_points, token_windows
from ..functions.ner import detect_mentions
from ..functions.tokenize import token_spans
from ..lexicon import DEFAULT_LEXICON, compile_patterns, find_mentions, fit_patterns
from ..schemas import MENTIONS, WINDOWS, validate


class DictionaryDetector:
    """Actor-pool callable: regex state compiled once per actor."""

    def __init__(self, patterns: Optional[Dict[str, str]] = None):
        self.compiled = compile_patterns(patterns or fit_patterns(DEFAULT_LEXICON))

    def __call__(self, batch: pa.Table) -> pa.Table:
        doc_ids: List[str] = []
        ent_ids: List[str] = []
        ent_types: List[str] = []
        starts: List[int] = []
        ends: List[int] = []
        texts: List[str] = []
        for doc_id, text in zip(
            batch["doc_id"].to_pylist(), batch["text"].to_pylist()
        ):
            for ent_id, ent_type, s, e, surface in detect_mentions(
                text, find_mentions(text, self.compiled)
            ):
                doc_ids.append(doc_id)
                ent_ids.append(ent_id)
                ent_types.append(ent_type)
                starts.append(s)
                ends.append(e)
                texts.append(surface)
        out = pa.table(
            {
                "doc_id": pa.array(doc_ids, pa.string()),
                "ent_id": pa.array(ent_ids, pa.string()),
                "ent_type": pa.array(ent_types, pa.string()),
                "start": pa.array(starts, pa.int64()),
                "end": pa.array(ends, pa.int64()),
                "text": pa.array(texts, pa.string()),
            }
        )
        return validate(out, MENTIONS, "mentions")


_DEFAULT_DETECTOR: Optional[DictionaryDetector] = None


def _default_detector_batch(batch: pa.Table) -> pa.Table:
    # Stateless-task path with per-process cached regex state (see
    # candidates.py for rationale); actor pools are for model detectors.
    global _DEFAULT_DETECTOR
    if _DEFAULT_DETECTOR is None:
        _DEFAULT_DETECTOR = DictionaryDetector()
    return _DEFAULT_DETECTOR(batch)


def detect(
    documents: "ray.data.Dataset",
    patterns: Optional[Dict[str, str]] = None,
    concurrency: Optional[int] = None,
    batch_size: int = 64,
) -> "ray.data.Dataset":
    """documents Dataset -> mentions Dataset (MENTIONS schema)."""
    if patterns is None and concurrency is None:
        return documents.map_batches(
            _default_detector_batch,
            batch_format="pyarrow",
            batch_size=batch_size,
        )
    return documents.map_batches(
        DictionaryDetector,
        fn_constructor_kwargs={"patterns": patterns},
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency or 4,
        num_cpus=1,
    )


def windows_table(batch: pa.Table, max_len: int = 126) -> pa.Table:
    """documents batch -> WINDOWS rows (get_split_points, ehr.py:353-432).

    ``max_len=126`` mirrors the BioBERT NER path's BIOBERT_NER_SEQ_LEN - 2
    (predict.py:31,204); a stateless ``map_batches`` fn.
    """
    rows = {k: [] for k in WINDOWS.names}
    for doc_id, text in zip(batch["doc_id"].to_pylist(), batch["text"].to_pylist()):
        starts, ends = token_spans(text)
        split = split_points(text, starts, max_len=max_len)
        for w, (ts, te, cs, ce) in enumerate(token_windows(split, starts, ends)):
            rows["doc_id"].append(doc_id)
            rows["win_idx"].append(w)
            rows["tok_start"].append(ts)
            rows["tok_end"].append(te)
            rows["char_start"].append(cs)
            rows["char_end"].append(ce)
    arrays = [pa.array(rows[f.name], f.type) for f in WINDOWS]
    return pa.Table.from_arrays(arrays, schema=WINDOWS)
