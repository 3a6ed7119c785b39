"""NER decode utilities and the per-document detection wrapper.

* :func:`get_chunks` — IOB sequence -> (type, tok_start, tok_end) spans,
  exact parity with ``predict.py:140-184`` including the end-of-sequence
  off-by-one: a chunk open at sequence end closes with ``len(seq)`` while
  mid-sequence chunks close with ``i - 1`` (``predict.py:163`` vs
  ``predict.py:181``) — kept because downstream char spans depend on it.
* :func:`detect_mentions` — run a detector over one document and apply the
  reference post-filters of ``get_ner_predictions`` (``predict.py:340-351``):
  drop spans whose surface has no alphanumeric char (``predict.py:345``),
  assign sequential per-document ids, attach surface text by char slicing
  (``predict.py:343``).
"""

from __future__ import annotations

import re
from typing import Dict, List, Tuple

from .pairs import Mention

# ASCII fast path for the has-any-alphanumeric filter (exactly equivalent
# to any(c.isalnum()) on ASCII text; non-ASCII surfaces keep the exact
# per-char check, since unicode \w is NOT identical to str.isalnum —
# combining marks are \w but not alnum)
_ASCII_ALNUM_RE = re.compile(r"[a-zA-Z0-9]")


def get_chunk_type(tok: str) -> Tuple[str, str]:
    """predict.py:125-137 parity."""
    parts = tok.split("-")
    return parts[0], parts[-1]


def get_chunks(seq: List[str]) -> List[Tuple[str, int, int]]:
    """predict.py:140-184 parity (see module docstring for the quirk)."""
    default = "O"
    chunks: List[Tuple[str, int, int]] = []
    chunk_type, chunk_start = None, None
    for i, tok in enumerate(seq):
        if tok == default and chunk_type is not None:
            chunks.append((chunk_type, chunk_start, i - 1))
            chunk_type, chunk_start = None, None
        elif tok != default:
            tok_class, tok_type = get_chunk_type(tok)
            if chunk_type is None:
                chunk_type, chunk_start = tok_type, i
            elif tok_type != chunk_type or tok_class == "B":
                chunks.append((chunk_type, chunk_start, i - 1))
                chunk_type, chunk_start = tok_type, i
    if chunk_type is not None:
        chunks.append((chunk_type, chunk_start, len(seq)))
    return chunks


def detect_mentions(
    doc_text: str,
    raw_spans: List[Tuple[str, int, int]],
) -> List[Mention]:
    """Post-filter + id assignment for one document's detected spans.

    ``raw_spans`` are ``(ent_type, start, end)`` in detection order. Returns
    mentions ``(ent_id, ent_type, start, end, text)`` with ids ``T1...``
    in that order (dict_ner.py:111 starts at 1; the entities dict insertion
    order is what pair generation iterates, utils.py:448-459).
    """
    out: List[Mention] = []
    k = 1
    search = _ASCII_ALNUM_RE.search
    for ent_type, start, end in raw_spans:
        surface = doc_text[start:end]
        if search(surface) is None and (
            surface.isascii() or not any(c.isalnum() for c in surface)
        ):
            continue  # predict.py:345
        out.append((f"T{k}", ent_type, start, end, surface))
        k += 1
    return out


def wordpiece_expand(predictions: List[str], tokens: List[str]) -> List[str]:
    """BioBERT ``##`` label re-expansion (predict.py:242-252 parity).

    ``predictions`` has one label per non-``##`` token; the result has one
    label per token, ``##`` pieces inheriting the head label forced to I-.
    """
    out: List[str] = []
    prev = ""
    idx = 0
    for token in tokens:
        if token.startswith("##"):
            if prev == "O":
                out.append(prev)
            else:
                out.append("I-" + prev.split("-")[-1])
        else:
            prev = predictions[idx]
            out.append(prev)
            idx += 1
    return out
