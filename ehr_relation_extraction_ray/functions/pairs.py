"""Relation-candidate generation and entity masking.

Reproduces, per window:

* ``map_entities`` (``utils.py:422-494``): every Drug entity x every
  non-Drug entity in the window, relation type ``other.name + "-Drug"``
  (``utils.py:468``), in (drug order) x (non-drug order) nesting with
  entities taken in their id order.
* window membership (``utils_re.py:283-284``): both entities must satisfy
  ``start >= win_start and end < win_end`` (strict ``<`` on the end — the
  pre-filter at ``utils_re.py:264-266`` allows ``end <= win_end`` but the
  inner check governs emission; parity kept).
* ``replace_entity_text`` (``utils_re.py:210-230``): mask the later entity
  first so offsets stay valid, each replaced by ``@Type$``
  (``utils_re.py:182-184``), then scrub ``\\n``/``\\t`` to spaces
  (``utils_re.py:289``). The scrub is hoisted to once-per-window (1:1 char
  replacement commutes with span slicing), and disjoint-span masking is a
  single 5-part concat instead of two full-string rebuilds.

Marker-gap fast path: when the raw window text contains no
``@Word$``-shaped substring, the two inserted markers are provably the
first/last markers of the masked text, so the substring strictly between
them (``gap_text``, a free slice here) lets the surrogate scorer run as
pure Arrow kernels. ``gap_text = null`` flags windows where that proof
fails (stray marker pattern or overlapping spans) — those rows take the
exact regex fallback.

No sampling here: the reference predict path does not downsample
(``utils_re.py:272-274`` only fires when a label is present — inference
passes ``label=None``). Hash-based training-time sampling lives in the
caller (SURVEY.md O4/O5).
"""

from __future__ import annotations

from bisect import bisect_right
from typing import Dict, List, Tuple

import numpy as np

from ..functions.rescore import _MARKER_RE

Mention = Tuple[str, str, int, int, str]  # (ent_id, ent_type, start, end, text)

PAIR_COLS = (
    "win_idx",
    "cand_idx",
    "rel_type",
    "subj_id",
    "subj_text",
    "obj_id",
    "obj_text",
    "masked_text",
    "gap_text",
    # precomputed surrogate-predicate inputs: char length of the
    # inter-marker gap (-1 = no fast-path proof, row needs the exact
    # masked-text fallback) and whether the gap is free of double spaces.
    # These make the surrogate scorer a pure int/bool compare with ZERO
    # string allocation per candidate — the gap/masked strings are the
    # dominant memory traffic of the extraction chain and what capped
    # multi-core scaling (round-2 measurement: per-task time 2x at 32
    # concurrent tasks, pure-compute microbenchmarks flat).
    "gap_len",
    "gap_clean",
)


def _double_space_positions(s: str) -> np.ndarray:
    """Char positions where a double space starts — overlap-aware (a run
    of 3 spaces yields two positions; re.finditer would skip the second)."""
    pos = []
    i = s.find("  ")
    while i != -1:
        pos.append(i)
        i = s.find("  ", i + 1)
    return np.asarray(pos, dtype=np.int64)


def mask_window(
    win_text: str,
    win_start: int,
    subj: Mention,
    obj: Mention,
) -> str:
    """``replace_entity_text`` + whitespace scrub parity (slow reference
    path, kept for overlap cases and tests)."""
    s_start, s_end = subj[2] - win_start, subj[3] - win_start
    o_start, o_end = obj[2] - win_start, obj[3] - win_start
    if s_end < o_end:
        t = win_text[:o_start] + "@" + obj[1] + "$" + win_text[o_end:]
        t = t[:s_start] + "@" + subj[1] + "$" + t[s_end:]
    else:
        t = win_text[:s_start] + "@" + subj[1] + "$" + win_text[s_end:]
        t = t[:o_start] + "@" + obj[1] + "$" + t[o_end:]
    return t.replace("\n", " ").replace("\t", " ")


def window_candidates(
    text: str,
    windows: List[Tuple[int, int]],
    mentions: List[Mention],
    max_pairs_per_window: int = 0,
    emit_masked: bool = True,
) -> Dict[str, list]:
    """All masked drug x non-drug candidates for one document, as parallel
    column lists (PAIR_COLS).

    ``mentions`` must be in entity-id order (the reference iterates the
    entities dict in insertion order, ``utils.py:448-459``); bucketing by
    window preserves that order within each window. ``cand_idx`` is
    numbered per document in emission order, matching the reference's
    sequential index (``utils_re.py:239,297``).

    ``emit_masked=False`` skips building ``masked_text``/``gap_text``
    strings for rows the surrogate fast path can score from the
    precomputed ``gap_len``/``gap_clean`` ints alone — the string concats
    are the single largest memory-bandwidth cost of candidate generation
    (they are what stops the stage scaling past ~8 concurrent tasks on one
    node). Rows that NEED the exact fallback (overlap / stray marker)
    always get their masked text. Exports and model scorers keep the
    default.

    Returns a dict of per-column numpy arrays (object dtype for strings,
    None for skipped string cells).
    """
    cols: Dict[str, list] = {k: [] for k in PAIR_COLS}
    if not windows or not mentions:
        return {k: np.empty(0, dtype=object) for k in PAIR_COLS}
    # one-pass bucketing: window starts are sorted & contiguous
    win_starts = [w[0] for w in windows]
    drugs_by_win: List[List[Mention]] = [[] for _ in windows]
    others_by_win: List[List[Mention]] = [[] for _ in windows]
    for m in mentions:
        wi = bisect_right(win_starts, m[2]) - 1
        if wi < 0 or m[3] >= windows[wi][1]:
            continue  # straddles a boundary or precedes all windows
        (drugs_by_win if m[1].lower() == "drug" else others_by_win)[wi].append(m)

    cand_base = 0
    for win_idx, (w_start, w_end) in enumerate(windows):
        drugs = drugs_by_win[win_idx]
        others = others_by_win[win_idx]
        if not drugs or not others:
            continue
        nd, no = len(drugs), len(others)
        npairs = nd * no
        if max_pairs_per_window and npairs > max_pairs_per_window:
            # explicit guard against pathological dense windows; the caller
            # surfaces the overflow in lineage counters (never silent).
            raise ValueError(
                f"window {win_idx}: {npairs} candidate "
                f"pairs exceeds cap {max_pairs_per_window}"
            )
        win_text = text[w_start:w_end]
        win_scrub = win_text.replace("\n", " ").replace("\t", " ")
        stray = _MARKER_RE.search(win_text) is not None

        # pair grid in reference emission order: drugs outer, others inner
        D = np.repeat(np.arange(nd), no)
        O = np.tile(np.arange(no), nd)
        d_s = np.fromiter((d[2] for d in drugs), np.int64, nd) - w_start
        d_e = np.fromiter((d[3] for d in drugs), np.int64, nd) - w_start
        o_s = np.fromiter((o[2] for o in others), np.int64, no) - w_start
        o_e = np.fromiter((o[3] for o in others), np.int64, no) - w_start
        ds_, de_ = d_s[D], d_e[D]
        os_, oe_ = o_s[O], o_e[O]
        disjoint = (de_ <= os_) | (oe_ <= ds_)
        d_first = ds_ < os_
        f_s = np.where(d_first, ds_, os_)
        f_e = np.where(d_first, de_, oe_)
        s_s = np.where(d_first, os_, ds_)
        s_e = np.where(d_first, oe_, de_)
        fast = disjoint if not stray else np.zeros(npairs, dtype=bool)
        gap_len = np.where(fast, s_s - f_e, -1).astype(np.int32)
        # double-space check on [f_e, s_s) without building the slice:
        # a double space starting at p is inside the gap iff f_e <= p <= s_s-2
        gap_clean = np.zeros(npairs, dtype=bool)
        if fast.any():
            dsp = _double_space_positions(win_scrub)
            if len(dsp):
                cnt = np.searchsorted(dsp, s_s - 2, side="right") - np.searchsorted(
                    dsp, f_e, side="left"
                )
                gap_clean = fast & (cnt <= 0)
            else:
                gap_clean = fast.copy()

        d_markers = ["@" + d[1] + "$" for d in drugs]
        o_markers = ["@" + o[1] + "$" for o in others]
        masked_arr = np.full(npairs, None, dtype=object)
        gap_arr = np.full(npairs, None, dtype=object)
        # string builds: every row in full mode; only fallback rows
        # (overlap, or any row of a stray-marker window) in lean mode
        need = range(npairs) if emit_masked else np.nonzero(~fast)[0]
        for i in need:
            if disjoint[i]:
                fs, fe, ss, se = int(f_s[i]), int(f_e[i]), int(s_s[i]), int(s_e[i])
                f_m = d_markers[D[i]] if d_first[i] else o_markers[O[i]]
                s_m = o_markers[O[i]] if d_first[i] else d_markers[D[i]]
                inner = win_scrub[fe:ss]
                masked_arr[i] = (
                    win_scrub[:fs] + f_m + inner + s_m + win_scrub[se:]
                )
                if not stray:
                    gap_arr[i] = inner
            else:  # overlapping spans: exact reference slicing
                masked_arr[i] = mask_window(win_text, w_start, drugs[D[i]], others[O[i]])

        cols["win_idx"].append(np.full(npairs, win_idx, dtype=np.int32))
        cols["cand_idx"].append(
            np.arange(cand_base, cand_base + npairs, dtype=np.int64)
        )
        cols["rel_type"].append(
            np.array([o[1] + "-Drug" for o in others], dtype=object)[O]
        )
        cols["subj_id"].append(np.array([d[0] for d in drugs], dtype=object)[D])
        cols["subj_text"].append(np.array([d[4] for d in drugs], dtype=object)[D])
        cols["obj_id"].append(np.array([o[0] for o in others], dtype=object)[O])
        cols["obj_text"].append(np.array([o[4] for o in others], dtype=object)[O])
        cols["masked_text"].append(masked_arr)
        cols["gap_text"].append(gap_arr)
        cols["gap_len"].append(gap_len)
        cols["gap_clean"].append(gap_clean)
        cand_base += npairs

    if not cols["win_idx"]:
        return {k: np.empty(0, dtype=object) for k in PAIR_COLS}
    return {k: np.concatenate(v) for k, v in cols.items()}
