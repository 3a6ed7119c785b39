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
  (``utils_re.py:289``).

No sampling here: the reference predict path does not downsample
(``utils_re.py:272-274`` only fires when a label is present — inference
passes ``label=None``). Hash-based training-time sampling lives in the
caller (SURVEY.md O4/O5).
"""

from __future__ import annotations

from typing import Dict, List, Tuple

Mention = Tuple[str, str, int, int, str]  # (ent_id, ent_type, start, end, text)


def mask_window(
    win_text: str,
    win_start: int,
    subj: Mention,
    obj: Mention,
) -> str:
    """``replace_entity_text`` + whitespace scrub parity."""
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
) -> List[Dict]:
    """All masked drug x non-drug candidates for one document.

    ``mentions`` must be in entity-id order (the reference iterates the
    entities dict in insertion order, ``utils.py:448-459``). Output rows
    carry ``(win_idx, cand_idx, rel_type, subj/obj ids+texts, masked_text)``
    with ``cand_idx`` numbered per document in emission order, matching the
    reference's sequential index (``utils_re.py:239,297``).
    """
    rows: List[Dict] = []
    cand_idx = 0
    is_drug = [m[1].lower() == "drug" for m in mentions]
    for win_idx, (w_start, w_end) in enumerate(windows):
        drugs = [
            m for m, d in zip(mentions, is_drug)
            if d and m[2] >= w_start and m[3] < w_end
        ]
        others = [
            m for m, d in zip(mentions, is_drug)
            if not d and m[2] >= w_start and m[3] < w_end
        ]
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
        for d in drugs:
            for o in others:
                rows.append(
                    {
                        "win_idx": win_idx,
                        "cand_idx": cand_idx,
                        "rel_type": o[1] + "-Drug",
                        "subj_id": d[0],
                        "subj_text": d[4],
                        "obj_id": o[0],
                        "obj_text": o[4],
                        "masked_text": mask_window(win_text, w_start, d, o),
                    }
                )
                cand_idx += 1
    return rows
