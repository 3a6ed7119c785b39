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
from ..lexicon import (
    DEFAULT_LEXICON,
    DictMatcher,
    compile_patterns,
    find_mentions,
    fit_patterns,
)
from ..schemas import MENTIONS, WINDOWS, validate


class DictionaryDetector:
    """Actor-pool callable: regex state compiled once per actor."""

    def __init__(self, patterns: Optional[Dict[str, str]] = None):
        self.compiled = compile_patterns(patterns or fit_patterns(DEFAULT_LEXICON))
        # batch-vectorized matcher when fitted from the default surfaces
        # (regex-parity by construction + tests); custom pattern strings
        # keep the regex path
        self.matcher = None if patterns is not None else DictMatcher(DEFAULT_LEXICON)

    def __call__(self, batch: pa.Table) -> pa.Table:
        doc_ids: List[str] = []
        ent_ids: List[str] = []
        ent_types: List[str] = []
        starts: List[int] = []
        ends: List[int] = []
        texts: List[str] = []
        batch_texts = batch["text"].to_pylist()
        found = (
            self.matcher.find_batch(batch_texts)
            if self.matcher is not None
            else None
        )
        for row, (doc_id, text) in enumerate(
            zip(batch["doc_id"].to_pylist(), batch_texts)
        ):
            for ent_id, ent_type, s, e, surface in detect_mentions(
                text,
                found[row]
                if found is not None
                else find_mentions(text, self.compiled),
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


class WordpieceNERDetector:
    """Actor-pool callable: the BioBERT NER cascade (predict.py:188-261)
    over documents batches — model-tokenizer windowing, feature conversion,
    batched logits, alignment, ``##`` re-expansion, IOB decode, char spans
    (functions/wordpiece.py). Same output columns as DictionaryDetector,
    so it is a drop-in for every downstream stage.

    ``logits_factory`` builds the model ONCE per actor (heavy ``__init__``
    — actor pools, SURVEY.md A1); it returns a callable
    ``features dict -> (n_examples, seq_len, n_labels) logits``. Use
    :class:`HFTokenClassifier` for real BioBERT weights, or any
    deterministic surrogate in tests. Failing documents (token/char walk
    mismatch, ehr.py:232-234) are quarantined, never fatal.
    """

    def __init__(
        self,
        logits_factory,
        label_list: List[str],
        tokenizer_factory=None,
        max_seq_length: int = 128,
        is_bert: bool = True,
        errors_dir: Optional[str] = None,
    ):
        from ..functions.wordpiece import ToyWordpieceTokenizer
        from ..state.quarantine import Quarantine

        self.logits_fn = logits_factory()
        self.tokenizer = (tokenizer_factory or ToyWordpieceTokenizer)()
        self.label_list = list(label_list)
        self.max_seq_length = max_seq_length
        self.is_bert = is_bert
        self.quarantine = Quarantine(errors_dir, stage="wordpiece_ner")

    def __call__(self, batch: pa.Table) -> pa.Table:
        from ..functions.wordpiece import ner_predict_document

        cols = {k: [] for k in MENTIONS.names}
        for doc_id, text in zip(
            batch["doc_id"].to_pylist(), batch["text"].to_pylist()
        ):
            with self.quarantine.guard(doc_id):
                spans = ner_predict_document(
                    text,
                    self.tokenizer,
                    self.logits_fn,
                    self.label_list,
                    self.max_seq_length,
                    self.is_bert,
                )
                for ent_id, ent_type, s, e, surface in detect_mentions(text, spans):
                    cols["doc_id"].append(doc_id)
                    cols["ent_id"].append(ent_id)
                    cols["ent_type"].append(ent_type)
                    cols["start"].append(s)
                    cols["end"].append(e)
                    cols["text"].append(surface)
        self.quarantine.flush()
        arrays = [pa.array(cols[f.name], f.type) for f in MENTIONS]
        return validate(
            pa.Table.from_arrays(arrays, schema=MENTIONS), MENTIONS, "mentions"
        )


def detect_wordpiece(
    documents: "ray.data.Dataset",
    logits_factory,
    label_list: List[str],
    tokenizer_factory=None,
    concurrency: int = 4,
    batch_size: int = 16,
    num_cpus: float = 1,
    errors_dir: Optional[str] = None,
) -> "ray.data.Dataset":
    """documents -> mentions via the model-backed wordpiece NER cascade.

    An actor pool (model loads once per actor); size ``concurrency`` x
    ``num_cpus`` to leave CPUs free for the assembly shuffle upstream."""
    return documents.map_batches(
        WordpieceNERDetector,
        fn_constructor_kwargs={
            "logits_factory": logits_factory,
            "label_list": label_list,
            "tokenizer_factory": tokenizer_factory,
            "errors_dir": errors_dir,
        },
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency,
        num_cpus=num_cpus,
    )


class HFTokenClassifier:  # pragma: no cover - optional heavy dependency
    """Real BioBERT token-classification logits (predict.py:37-56 analog),
    import-gated; constructed once per actor via ``logits_factory``."""

    def __init__(self, model_dir: str, batch_size: int = 32):
        try:
            import torch  # noqa: F401
            from transformers import AutoModelForTokenClassification
        except ImportError as exc:
            raise NotImplementedError(
                "transformers/torch are not available in this environment; "
                "pass a surrogate logits_factory"
            ) from exc
        self.model = AutoModelForTokenClassification.from_pretrained(model_dir)
        self.model.eval()
        self.batch_size = batch_size

    def __call__(self, feats):
        import numpy as np
        import torch

        outs = []
        n = len(feats["input_ids"])
        for i in range(0, n, self.batch_size):
            enc = {
                k: torch.as_tensor(feats[k][i : i + self.batch_size])
                for k in ("input_ids", "attention_mask", "token_type_ids")
            }
            with torch.no_grad():
                outs.append(self.model(**enc).logits.cpu().numpy())
        return (
            np.concatenate(outs)
            if outs
            else np.zeros((0, feats["input_ids"].shape[1], 1))
        )


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
