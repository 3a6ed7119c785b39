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
    cols, _ = window_candidates_batch(
        [text], [windows], [mentions], max_pairs_per_window, emit_masked
    )
    return cols


def window_candidates_batch(
    texts: List[str],
    windows_list: List[List[Tuple[int, int]]],
    mentions_list: List[List[Mention]],
    max_pairs_per_window: int = 0,
    emit_masked: bool = True,
) -> Tuple[Dict[str, np.ndarray], np.ndarray]:
    """Batch form of :func:`window_candidates`: ONE set of numpy ops per
    BATCH instead of per window (or per doc).  All documents' windows and
    mentions are flattened into a single virtual coordinate space (each
    doc shifted by a cumulative char offset with a one-char separator
    slot, so ranges never touch); every within-window formula is
    offset-invariant, so the math is identical to the per-doc flat grid.
    Emission order: docs in input order, then windows ascending, drugs
    outer in mention order, others inner in mention order — exactly the
    per-doc loop's order. ``win_idx``/``cand_idx`` are doc-local.

    Returns ``(cols, pairs_per_doc)`` — the caller repeats its doc ids by
    ``pairs_per_doc`` to build the doc_id column.
    """
    nD = len(texts)
    pairs_per_doc = np.zeros(nD, dtype=np.int64)
    empty = ({k: np.empty(0, dtype=object) for k in PAIR_COLS}, pairs_per_doc)
    W = sum(len(w) for w in windows_list)
    M = sum(len(m) for m in mentions_list)
    if W == 0 or M == 0:
        return empty

    # virtual global frame: doc d shifted by off[d]; +1 leaves a separator
    # slot so no range of one doc touches the next (and lines up with the
    # scrub join below)
    doc_lens = np.fromiter((len(t) for t in texts), np.int64, nD)
    off = np.zeros(nD, np.int64)
    np.cumsum(doc_lens[:-1] + 1, out=off[1:])

    w_counts = np.fromiter((len(w) for w in windows_list), np.int64, nD)
    m_counts = np.fromiter((len(m) for m in mentions_list), np.int64, nD)
    win_doc = np.repeat(np.arange(nD), w_counts)
    m_doc = np.repeat(np.arange(nD), m_counts)
    doc_first_win = np.zeros(nD, np.int64)
    np.cumsum(w_counts[:-1], out=doc_first_win[1:])

    win_starts_arr = (
        np.fromiter(
            (s for ws in windows_list for s, _ in ws), np.int64, W
        )
        + off[win_doc]
    )
    win_ends_arr = (
        np.fromiter(
            (e for ws in windows_list for _, e in ws), np.int64, W
        )
        + off[win_doc]
    )
    flat_mentions: List[Mention] = [m for ms in mentions_list for m in ms]
    m_start = (
        np.fromiter((m[2] for m in flat_mentions), np.int64, M) + off[m_doc]
    )
    m_end = (
        np.fromiter((m[3] for m in flat_mentions), np.int64, M) + off[m_doc]
    )
    is_drug = np.fromiter(
        (m[1].lower() == "drug" for m in flat_mentions), bool, M
    )
    # one-pass bucketing: global window starts are sorted (docs in order,
    # windows ascending within); a mention mapping into another doc's
    # window is dropped by the doc check (== the per-doc wi < 0 case)
    wi = np.searchsorted(win_starts_arr, m_start, side="right") - 1
    wic = np.clip(wi, 0, W - 1)
    keep = (wi >= 0) & (win_doc[wic] == m_doc) & (m_end < win_ends_arr[wic])

    # stable sort by window keeps the original mention order within each
    # window (= the reference's entities-dict insertion order)
    idx_d = np.flatnonzero(keep & is_drug)
    idx_o = np.flatnonzero(keep & ~is_drug)
    d_sel = idx_d[np.argsort(wi[idx_d], kind="stable")]
    o_sel = idx_o[np.argsort(wi[idx_o], kind="stable")]
    nd_w = np.bincount(wi[d_sel], minlength=W)
    no_w = np.bincount(wi[o_sel], minlength=W)
    npairs_w = nd_w * no_w
    if max_pairs_per_window and (npairs_w > max_pairs_per_window).any():
        # explicit guard against pathological dense windows; the caller
        # surfaces the overflow in lineage counters (never silent).
        bad = int(np.flatnonzero(npairs_w > max_pairs_per_window)[0])
        bad_local = bad - int(doc_first_win[win_doc[bad]])
        raise ValueError(
            f"window {bad_local}: {int(npairs_w[bad])} candidate "
            f"pairs exceeds cap {max_pairs_per_window}"
        )
    total = int(npairs_w.sum())
    if total == 0:
        return empty

    d_off = np.zeros(W, np.int64)
    np.cumsum(nd_w[:-1], out=d_off[1:])
    o_off = np.zeros(W, np.int64)
    np.cumsum(no_w[:-1], out=o_off[1:])
    pair_off = np.zeros(W, np.int64)
    np.cumsum(npairs_w[:-1], out=pair_off[1:])

    pair_win = np.repeat(np.arange(W), npairs_w)
    k = np.arange(total, dtype=np.int64) - pair_off[pair_win]
    no_p = no_w[pair_win]
    Dg = d_off[pair_win] + k // no_p  # index into d_sel
    Og = o_off[pair_win] + k % no_p  # index into o_sel
    w0 = win_starts_arr[pair_win]
    pair_doc = win_doc[pair_win]

    ds_ = m_start[d_sel][Dg] - w0
    de_ = m_end[d_sel][Dg] - w0
    os_ = m_start[o_sel][Og] - w0
    oe_ = m_end[o_sel][Og] - w0
    disjoint = (de_ <= os_) | (oe_ <= ds_)
    d_first = ds_ < os_
    f_s = np.where(d_first, ds_, os_)
    f_e = np.where(d_first, de_, oe_)
    s_s = np.where(d_first, os_, ds_)
    s_e = np.where(d_first, oe_, de_)

    # stray markers: per-doc scan, assigned to the window that fully
    # contains the match (matches of @\w+\$ cannot overlap, so the
    # non-overlapping scan finds every per-window match; a match
    # straddling a boundary is in no window's slice — also reference
    # behavior)
    stray_w = np.zeros(W, dtype=bool)
    for d, text in enumerate(texts):
        o = int(off[d])
        for mm in _MARKER_RE.finditer(text):
            gs = mm.start() + o
            wm = int(np.searchsorted(win_starts_arr, gs, side="right")) - 1
            if (
                0 <= wm
                and gs >= win_starts_arr[wm]
                and mm.end() + o <= win_ends_arr[wm]
            ):
                stray_w[wm] = True
    stray_p = stray_w[pair_win]
    fast = disjoint & ~stray_p
    gap_len = np.where(fast, s_s - f_e, -1).astype(np.int32)

    # double-space check on [f_e, s_s) without building the slice: the
    # \n/\t scrub is 1:1, so joined-scrub double-space positions line up
    # with per-window ones (a double space is countable iff
    # f_e <= p <= s_s-2, and s_s-2+w0 <= w_end-2, so boundary/separator
    # runs can never be counted — same as the per-window slice scan; the
    # 'X' separator matches the +1 offset slots and can't extend a run)
    gap_clean = np.zeros(total, dtype=bool)
    scrub_join = None
    if fast.any():
        scrub_join = "X".join(
            t.replace("\n", " ").replace("\t", " ") for t in texts
        )
        dsp = _double_space_positions(scrub_join)
        if len(dsp):
            cnt = np.searchsorted(dsp, s_s + w0 - 2, side="right") - np.searchsorted(
                dsp, f_e + w0, side="left"
            )
            gap_clean = fast & (cnt <= 0)
        else:
            gap_clean = fast.copy()

    masked_arr = np.full(total, None, dtype=object)
    gap_arr = np.full(total, None, dtype=object)
    # string builds: every row in full mode; only fallback rows (overlap,
    # or any row of a stray-marker window) in lean mode
    need = range(total) if emit_masked else np.nonzero(~fast)[0]
    win_cache: Dict[int, Tuple[str, str, int]] = {}
    m_marker = [None] * M  # lazy "@Type$" per mention
    for i in need:
        w = int(pair_win[i])
        cached = win_cache.get(w)
        if cached is None:
            d = int(win_doc[w])
            o = int(off[d])
            ws_l = int(win_starts_arr[w]) - o
            we_l = int(win_ends_arr[w]) - o
            wt = texts[d][ws_l:we_l]
            if scrub_join is not None:
                wsr = scrub_join[int(win_starts_arr[w]) : int(win_ends_arr[w])]
            else:
                wsr = wt.replace("\n", " ").replace("\t", " ")
            cached = (wt, wsr, ws_l)
            win_cache[w] = cached
        win_text, win_scrub, ws_l = cached
        di = int(d_sel[Dg[i]])
        oi = int(o_sel[Og[i]])
        if disjoint[i]:
            for mi in (di, oi):
                if m_marker[mi] is None:
                    m_marker[mi] = "@" + flat_mentions[mi][1] + "$"
            fs, fe, ss, se = int(f_s[i]), int(f_e[i]), int(s_s[i]), int(s_e[i])
            f_m = m_marker[di] if d_first[i] else m_marker[oi]
            s_m = m_marker[oi] if d_first[i] else m_marker[di]
            inner = win_scrub[fe:ss]
            masked_arr[i] = win_scrub[:fs] + f_m + inner + s_m + win_scrub[se:]
            if not stray_w[w]:
                gap_arr[i] = inner
        else:  # overlapping spans: exact reference slicing
            masked_arr[i] = mask_window(
                win_text, ws_l, flat_mentions[di], flat_mentions[oi]
            )

    ment_id = np.fromiter((m[0] for m in flat_mentions), dtype=object, count=M)
    ment_text = np.fromiter((m[4] for m in flat_mentions), dtype=object, count=M)
    ment_rel = np.fromiter(
        ((m[1] + "-Drug") for m in flat_mentions), dtype=object, count=M
    )
    doc_pair_first = np.zeros(nD, np.int64)
    pairs_per_doc = np.bincount(
        win_doc, weights=npairs_w, minlength=nD
    ).astype(np.int64)
    np.cumsum(pairs_per_doc[:-1], out=doc_pair_first[1:])
    cols = {
        "win_idx": (pair_win - doc_first_win[pair_doc]).astype(np.int32),
        "cand_idx": np.arange(total, dtype=np.int64) - doc_pair_first[pair_doc],
        "rel_type": ment_rel[o_sel][Og],
        "subj_id": ment_id[d_sel][Dg],
        "subj_text": ment_text[d_sel][Dg],
        "obj_id": ment_id[o_sel][Og],
        "obj_text": ment_text[o_sel][Og],
        "masked_text": masked_arr,
        "gap_text": gap_arr,
        "gap_len": gap_len,
        "gap_clean": gap_clean,
    }
    return cols, pairs_per_doc
