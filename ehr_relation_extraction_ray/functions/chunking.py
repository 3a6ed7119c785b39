"""Document chunking: split points and RE char windows.

Faithful re-expression of the reference chunker semantics:

* ``split_points`` == ``HealthRecord.get_split_points`` (``ehr.py:353-432``):
  walk the text; whenever the token counter since the last split reaches
  ``max_len``, split at the last paragraph end if one was seen, else the last
  sentence-final line break, else hard-cut at the current token. Markers are
  updated at every ``\\n`` with ``i < len(text) - 2``:

  - ``text[i+1] == '\\n'``  -> paragraph marker = token of ``i-1``
    (``ehr.py:417-419``; ``i-1`` at ``i==0`` hits Python negative indexing
    into the char->token map == last token — quirk kept),
  - ``text[i+1] in '.*'``   -> paragraph marker = token of ``i+1``
    (``ehr.py:421-422``),
  - ``text[i+1]`` in ``['[', '#', '-', '>', ' ']`` or a digit, or
    ``text[i-1]`` in ``['.', '?', '!']`` -> line marker = token of ``i``
    (``ehr.py:424-427``; ``text[i-1]`` at ``i==0`` wraps to the last char,
    Python semantics kept).

  The reference walks every char calling ``get_token_idx`` (O(chars) Python
  loop per doc). This implementation is an event walk: only newline
  positions and max_len crossing points are visited, with crossings located
  by direct indexing into the token-start array — identical output
  (property-tested against a naive transcription in ``tests/refsem.py``),
  O(#newlines + #splits) per doc.

* ``char_windows`` == the RE windowing of ``get_char_split_points``
  (``biobert_re/utils_re.py:197-207``) plus the window loop of
  ``generate_re_input_files`` (``utils_re.py:259-303``). Two reference
  quirks are kept deliberately (both verified against the code, cited):

  - the boundary char for split token ``p`` is the *end* char of token ``p``
    (``utils_re.py:202``: ``get_char_idx(pt)[1]``), so each window annexes
    the first token of the next;
  - the loop runs ``len(char_split_points)`` times over consecutive
    ``[0]+csp`` bounds, so the **tail window after the last split point is
    never processed** — and for single-window documents ``csp`` is the end
    of token 0 (``utils_re.py:204-205``), i.e. only the first token's span
    is paired. Relations beyond that are silently dropped by the reference;
    we reproduce exactly that so triple sets match.
"""

from __future__ import annotations

import re
from typing import List, Tuple

import numpy as np

NEW_LINE_IND = ["[", "#", "-", ">", " "]
SENT_END_IND = [".", "?", "!"]

_NL_RE = re.compile(r"\n")


def _tok_at(starts: np.ndarray, n_tok: int, char_idx: int) -> int:
    """get_token_idx with Python-list negative indexing parity."""
    if char_idx < 0:
        return n_tok - 1  # char_to_token_map[-1] == last entry (ehr.py:296)
    idx = int(np.searchsorted(starts, char_idx, side="right")) - 1
    return max(idx, 0)


def split_points(
    text: str, starts: np.ndarray, max_len: int = 510
) -> List[int]:
    """Token split indices incl. 0 and len(tokens) (ehr.py:353-432 parity)."""
    n_tok = len(starts)
    if n_tok == 0:
        return [0, 0]
    n = len(text)
    nl_positions = [m.start() for m in _NL_RE.finditer(text) if m.start() < n - 2]

    # batched _tok_at for all newline events (one searchsorted per offset
    # variant instead of a scalar call per event — the former hot spot);
    # negative-index parity: char_idx < 0 -> n_tok - 1 (ehr.py:296)
    if nl_positions:
        pos = np.asarray(nl_positions, dtype=np.int64)
        tok_im1 = np.maximum(
            np.searchsorted(starts, pos - 1, side="right") - 1, 0
        )
        tok_im1 = np.where(pos == 0, n_tok - 1, tok_im1).tolist()
        tok_ip1 = np.maximum(
            np.searchsorted(starts, pos + 1, side="right") - 1, 0
        ).tolist()
        tok_i = np.maximum(
            np.searchsorted(starts, pos, side="right") - 1, 0
        ).tolist()

    split: List[int] = [0]
    last_par = 0
    last_line = 0
    e = 0
    scan_from = 0

    def apply_markers(k: int) -> None:
        nonlocal last_par, last_line
        i = nl_positions[k]
        nxt = text[i + 1]
        if nxt == "\n":
            last_par = tok_im1[k]
        if nxt == "." or nxt == "*":
            last_par = tok_ip1[k]
        if nxt in NEW_LINE_IND or nxt.isdigit() or text[i - 1] in SENT_END_IND:
            last_line = tok_i[k]

    while True:
        target = split[-1] + max_len
        if target >= n_tok:
            break  # counter can never reach max_len again
        crossing = max(int(starts[target]), scan_from)
        if crossing >= n:
            break
        while e < len(nl_positions) and nl_positions[e] < crossing:
            apply_markers(e)
            e += 1
        # the split decision (ehr.py:403-415); marker check order preserved:
        # crossing is handled before any newline event at the same char.
        if last_par == 0 and last_line != 0:
            split.append(last_line)
        elif last_par != 0:
            split.append(last_par)
        else:
            split.append(_tok_at(starts, n_tok, crossing))
        last_par = 0
        last_line = 0
        if e < len(nl_positions) and nl_positions[e] == crossing:
            apply_markers(e)
            e += 1
        scan_from = crossing + 1

    split.append(n_tok)
    return split


def char_windows(
    text: str, split: List[int], ends: np.ndarray
) -> List[Tuple[int, int]]:
    """RE char windows from token split points (utils_re.py:197-207,259-303).

    Returns consecutive ``[0] + csp`` bounds; the tail of the document after
    the last char split point is intentionally absent (see module docstring).
    """
    if len(ends) == 0:
        return []
    csp = [int(ends[p]) for p in split[:-1]]
    if len(csp) > 1:
        csp = csp[1:]
    bounds = [0] + csp
    return list(zip(bounds[:-1], bounds[1:]))


def token_windows(
    split: List[int], starts: np.ndarray, ends: np.ndarray
) -> List[Tuple[int, int, int, int]]:
    """NER windows ``(tok_start, tok_end, char_start, char_end)``.

    Token range is ``[tok_start, tok_end)`` per ``predict.py:207-208``
    (``tokens[split[i]:split[i+1]]``); char range covers those tokens.
    """
    out = []
    for a, b in zip(split[:-1], split[1:]):
        if b > a:
            out.append((a, b, int(starts[a]), int(ends[b - 1])))
        else:
            cs = int(starts[a]) if a < len(starts) else 0
            out.append((a, b, cs, cs))
    return out
