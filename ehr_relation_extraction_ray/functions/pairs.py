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
)


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
) -> Dict[str, list]:
    """All masked drug x non-drug candidates for one document, as parallel
    column lists (PAIR_COLS).

    ``mentions`` must be in entity-id order (the reference iterates the
    entities dict in insertion order, ``utils.py:448-459``); bucketing by
    window preserves that order within each window. ``cand_idx`` is
    numbered per document in emission order, matching the reference's
    sequential index (``utils_re.py:239,297``).
    """
    cols: Dict[str, list] = {k: [] for k in PAIR_COLS}
    if not windows or not mentions:
        return cols
    # one-pass bucketing: window starts are sorted & contiguous
    win_starts = [w[0] for w in windows]
    drugs_by_win: List[List[Mention]] = [[] for _ in windows]
    others_by_win: List[List[Mention]] = [[] for _ in windows]
    for m in mentions:
        wi = bisect_right(win_starts, m[2]) - 1
        if wi < 0 or m[3] >= windows[wi][1]:
            continue  # straddles a boundary or precedes all windows
        (drugs_by_win if m[1].lower() == "drug" else others_by_win)[wi].append(m)

    cand_idx = 0
    for win_idx, (w_start, w_end) in enumerate(windows):
        drugs = drugs_by_win[win_idx]
        others = others_by_win[win_idx]
        if not drugs or not others:
            continue
        if max_pairs_per_window and len(drugs) * len(others) > max_pairs_per_window:
            # explicit guard against pathological dense windows; the caller
            # surfaces the overflow in lineage counters (never silent).
            raise ValueError(
                f"window {win_idx}: {len(drugs) * len(others)} candidate "
                f"pairs exceeds cap {max_pairs_per_window}"
            )
        win_text = text[w_start:w_end]
        win_scrub = win_text.replace("\n", " ").replace("\t", " ")
        stray = _MARKER_RE.search(win_text) is not None
        for d in drugs:
            d_s, d_e = d[2] - w_start, d[3] - w_start
            d_marker = "@" + d[1] + "$"
            for o in others:
                o_s, o_e = o[2] - w_start, o[3] - w_start
                if d_e <= o_s or o_e <= d_s:  # disjoint spans: fast path
                    if d_s < o_s:
                        f_s, f_e, f_m = d_s, d_e, d_marker
                        s_s, s_e, s_m = o_s, o_e, "@" + o[1] + "$"
                    else:
                        f_s, f_e, f_m = o_s, o_e, "@" + o[1] + "$"
                        s_s, s_e, s_m = d_s, d_e, d_marker
                    inner = win_scrub[f_e:s_s]
                    masked = win_scrub[:f_s] + f_m + inner + s_m + win_scrub[s_e:]
                    gap = None if stray else inner
                else:  # overlapping spans: exact reference slicing
                    masked = mask_window(win_text, w_start, d, o)
                    gap = None
                cols["win_idx"].append(win_idx)
                cols["cand_idx"].append(cand_idx)
                cols["rel_type"].append(o[1] + "-Drug")
                cols["subj_id"].append(d[0])
                cols["subj_text"].append(d[4])
                cols["obj_id"].append(o[0])
                cols["obj_text"].append(o[4])
                cols["masked_text"].append(masked)
                cols["gap_text"].append(gap)
                cand_idx += 1
    return cols
