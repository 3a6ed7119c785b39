"""Fused extraction: documents -> RE candidate pairs.

One actor-pool ``map_batches`` stage computes, per document: dictionary
mention detection, token spans, split points, RE char windows, and the
masked drug x non-drug candidate pairs. Fusing these avoids a
``doc_id``-keyed shuffle join between mentions and documents — the
reference does the same work per record in one pass
(``generate_re_test_file``, ``biobert_re/utils_re.py:369-439``), we do it
per batch with the regex state held once per actor.

Pair generation is quadratic per window but bounded: windows are at most
``max_len`` tokens (ehr.py:353-432), so the candidate count per window is
O(drugs x others) within ~128 tokens. ``max_pairs_per_window`` guards
pathological dense windows with an explicit cap + overflow counter rather
than silent truncation (SURVEY.md §7.5).
"""

from __future__ import annotations

from typing import Dict, List, Optional

import pyarrow as pa

import ray.data

from ..functions.chunking import char_windows, split_points
from ..functions.ner import detect_mentions
from ..functions.pairs import window_candidates, window_candidates_batch
from ..functions.tokenize import token_spans, token_spans_batch
from ..lexicon import (
    DEFAULT_LEXICON,
    DictMatcher,
    compile_patterns,
    find_mentions,
    fit_patterns,
)
# output schema is exact by construction (pa.array(..., f.type) +
# Table.from_arrays(schema=CANDIDATES)), so no validate() call is needed
from ..schemas import CANDIDATES

RE_MAX_LEN = 128  # BIOBERT_RE_SEQ_LEN (predict.py:33, utils_re.py:370)


class CandidateGenerator:
    """documents batch -> CANDIDATES rows; regex state per actor."""

    def __init__(
        self,
        patterns: Optional[Dict[str, str]] = None,
        max_len: int = RE_MAX_LEN,
        max_pairs_per_window: int = 10_000,
        errors_dir: Optional[str] = None,
        emit_masked: bool = True,
        tokenizer: Optional[str] = None,
        is_bert_tokenizer: bool = True,
    ):
        from ..state.quarantine import Quarantine

        self.compiled = compile_patterns(
            patterns if patterns is not None else fit_patterns(DEFAULT_LEXICON)
        )
        # batch-vectorized matcher (token-n-gram hash, regex-parity by
        # construction + tests) — only when fitted from the default
        # surface lists; custom pattern strings keep the regex path
        self.matcher = None if patterns is not None else DictMatcher(DEFAULT_LEXICON)
        self.max_len = max_len
        self.max_pairs = max_pairs_per_window
        self.quarantine = Quarantine(errors_dir, stage="candidates")
        self.emit_masked = emit_masked
        # model-tokenizer windowing (SURVEY.md M3): the reference computes
        # split points over the tokens the MODEL sees (predict.py:31-33,
        # generate_data.py:74-86), not whitespace words. A registry name
        # selects the tokenizer; the chunker itself is span-driven.
        # Resolved once per actor/process — never per batch.
        self.tokenizer = None
        self.is_bert_tokenizer = is_bert_tokenizer
        if tokenizer is not None and tokenizer != "default":
            from ..registry import get

            self.tokenizer = get("tokenizer", tokenizer)

    def __call__(self, batch: pa.Table) -> pa.Table:
        import numpy as np

        texts = batch["text"].to_pylist()
        found = None
        if self.matcher is not None:
            try:
                found = self.matcher.find_batch(texts)
            except Exception:
                # batch-level failure must not defeat per-doc quarantine:
                # fall back to the per-doc regex path under the guard
                found = None
        # per-doc prep (guarded): mentions first, then windows; docs with
        # no mentions are dropped BEFORE tokenization so the batch passes
        # only pay for docs that can emit pairs. The pair grid itself runs
        # ONCE for the whole batch (window_candidates_batch).
        kept_ids: List = []
        kept_texts: List[str] = []
        kept_mentions: List = []
        for row, (doc_id, text) in enumerate(
            zip(batch["doc_id"].to_pylist(), texts)
        ):
            with self.quarantine.guard(doc_id):
                mentions = detect_mentions(
                    text,
                    found[row]
                    if found is not None
                    else find_mentions(text, self.compiled),
                )
                if not mentions:
                    continue
                kept_ids.append(doc_id)
                kept_texts.append(text)
                kept_mentions.append(mentions)

        spans_batch = None
        if self.tokenizer is None:
            try:
                spans_batch = token_spans_batch(kept_texts)
            except Exception:
                # batch-level tokenizer failure must not defeat per-doc
                # quarantine (same invariant as the matcher and pair-grid
                # guards): fall back to per-doc token_spans under the guard
                spans_batch = None
        kept2_ids: List = []
        kept2_texts: List[str] = []
        kept2_windows: List = []
        kept2_mentions: List = []
        for row, (doc_id, text, mentions) in enumerate(
            zip(kept_ids, kept_texts, kept_mentions)
        ):
            with self.quarantine.guard(doc_id):
                if self.tokenizer is not None:
                    from ..functions.wordpiece import model_token_spans

                    starts, ends = model_token_spans(
                        text, self.tokenizer, self.is_bert_tokenizer
                    )
                elif spans_batch is not None:
                    starts, ends = spans_batch[row]
                else:
                    starts, ends = token_spans(text)
                split = split_points(text, starts, max_len=self.max_len)
                windows = char_windows(text, split, ends)
                kept2_ids.append(doc_id)
                kept2_texts.append(text)
                kept2_windows.append(windows)
                kept2_mentions.append(mentions)
        kept_ids, kept_texts = kept2_ids, kept2_texts
        kept_windows, kept_mentions = kept2_windows, kept2_mentions

        cols = None
        if kept_ids:
            try:
                cols, ppd = window_candidates_batch(
                    kept_texts,
                    kept_windows,
                    kept_mentions,
                    max_pairs_per_window=self.max_pairs,
                    emit_masked=self.emit_masked,
                )
                cols["doc_id"] = np.repeat(
                    np.asarray(kept_ids, dtype=object), ppd
                )
            except Exception:
                # a batch-level failure (e.g. one doc over the pair cap)
                # must not defeat per-doc quarantine: per-doc fallback
                cols = None
        if cols is None and kept_ids:
            chunks: List[Dict[str, "np.ndarray"]] = []
            for doc_id, text, windows, mentions in zip(
                kept_ids, kept_texts, kept_windows, kept_mentions
            ):
                with self.quarantine.guard(doc_id):
                    doc_cols = window_candidates(
                        text,
                        windows,
                        mentions,
                        max_pairs_per_window=self.max_pairs,
                        emit_masked=self.emit_masked,
                    )
                    n = len(doc_cols["cand_idx"])
                    if not n:
                        continue
                    doc_cols["doc_id"] = np.full(n, doc_id, dtype=object)
                    chunks.append(doc_cols)
            cols = (
                {
                    f.name: np.concatenate([c[f.name] for c in chunks])
                    for f in CANDIDATES
                }
                if chunks
                else None
            )
        self.quarantine.flush()
        if cols is None or len(cols["cand_idx"]) == 0:
            arrays = [pa.array([], f.type) for f in CANDIDATES]
        else:
            arrays = [pa.array(cols[f.name], f.type) for f in CANDIDATES]
        return pa.Table.from_arrays(arrays, schema=CANDIDATES)


_DEFAULT_GENERATORS: Dict[bool, CandidateGenerator] = {}


def _default_generator_batch(batch: pa.Table, emit_masked: bool = True) -> pa.Table:
    # Stateless-task path: the compiled-regex state is cheap (<1 ms) and
    # cached once per worker *process* (module global), giving actor-style
    # amortization without reserving CPUs — elastic tasks can't starve the
    # shuffle stages. Heavy model detectors use the actor-pool path below.
    gen = _DEFAULT_GENERATORS.get(emit_masked)
    if gen is None:
        gen = _DEFAULT_GENERATORS.setdefault(
            emit_masked, CandidateGenerator(emit_masked=emit_masked)
        )
    return gen(batch)


_QUARANTINED_GENERATORS: Dict[tuple, "CandidateGenerator"] = {}


def _quarantined_generator_batch(
    batch: pa.Table, errors_dir: str, emit_masked: bool = True
) -> pa.Table:
    key = (errors_dir, emit_masked)
    gen = _QUARANTINED_GENERATORS.get(key)
    if gen is None:
        gen = _QUARANTINED_GENERATORS.setdefault(
            key,
            CandidateGenerator(errors_dir=errors_dir, emit_masked=emit_masked),
        )
    return gen(batch)


def generate(
    documents: "ray.data.Dataset",
    patterns: Optional[Dict[str, str]] = None,
    concurrency: Optional[int] = None,
    batch_size: int = 64,
    errors_dir: Optional[str] = None,
    emit_masked: bool = True,
    tokenizer: Optional[str] = None,
    is_bert_tokenizer: bool = True,
) -> "ray.data.Dataset":
    """documents Dataset -> candidates Dataset (CANDIDATES schema).

    Default: stateless tasks (cached per-process state). Pass ``patterns``
    and/or ``concurrency`` to pin an actor pool instead (model-scale state);
    size it to leave CPUs for the shuffle stages (ray_guide: a pool that
    reserves every CPU deadlocks the pipeline). ``errors_dir`` enables the
    poison-document quarantine (state/quarantine.py): failing documents are
    skipped and recorded as error rows instead of killing the job.
    ``emit_masked=False`` nulls ``masked_text`` on surrogate-fast-path rows
    (see functions/pairs.window_candidates) — only valid when the consumer
    is the surrogate scorer; exports and model scorers need the default.
    """
    if tokenizer == "default":  # same semantics as None (constructor
        tokenizer = None        # normalizes) — don't pin an actor pool
    if patterns is None and concurrency is None and tokenizer is None:
        if errors_dir is not None:
            return documents.map_batches(
                _quarantined_generator_batch,
                fn_kwargs={
                    "errors_dir": errors_dir, "emit_masked": emit_masked
                },
                batch_format="pyarrow",
                batch_size=batch_size,
            )
        return documents.map_batches(
            _default_generator_batch,
            fn_kwargs={"emit_masked": emit_masked},
            batch_format="pyarrow",
            batch_size=batch_size,
        )
    return documents.map_batches(
        CandidateGenerator,
        fn_constructor_kwargs={
            "patterns": patterns,
            "errors_dir": errors_dir,
            "emit_masked": emit_masked,
            "tokenizer": tokenizer,
            "is_bert_tokenizer": is_bert_tokenizer,
        },
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency or 4,
        num_cpus=1,
    )
