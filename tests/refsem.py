"""Serial reference-semantics oracle (NOT part of the engine).

A deliberately naive, per-document transcription of the reference's
semantics, used only to conformance-test the distributed engine:

* char<->token maps built by a literal char walk (ehr.py:196-249)
* split points by the literal per-char loop (ehr.py:353-432)
* dictionary NER per DictNER.predict (rule_based_ner/dict_ner.py:82-119)
* non-alnum filter (predict.py:345)
* RE char windows + candidate loop per generate_re_test_file
  (biobert_re/utils_re.py:369-439) incl. its window-tail quirks
* masking per replace_entity_text (utils_re.py:210-230)
* scoring via the same SurrogateScorer the engine uses
* long-table projection + drop_duplicates (utils.py:497-530, utils.py:553)

Everything here is O(chars) Python loops — correct, slow, single-process.
The engine must produce the identical triple set at any parallelism.
"""

from __future__ import annotations

from typing import Dict, List, Set, Tuple

from ehr_relation_extraction_ray.functions.rescore import SurrogateScorer
from ehr_relation_extraction_ray.lexicon import (
    DEFAULT_LEXICON,
    compile_patterns,
    fit_patterns,
)

NEW_LINE_IND = ["[", "#", "-", ">", " "]
SENT_END_IND = [".", "?", "!"]


def naive_token_maps(text: str):
    """Literal whitespace-tokenizer char walk (ehr.py:196-249 semantics)."""
    tokens = text.split()
    char_to_token: List[int] = []
    token_to_char: List[Tuple[int, int]] = []
    j = 0
    for i, tok in enumerate(tokens):
        while j < len(text) and text[j] != tok[0]:
            char_to_token.append(char_to_token[-1] if char_to_token else 0)
            j += 1
        start = j
        for _ in tok:
            char_to_token.append(i)
            j += 1
        token_to_char.append((start, j))
    while j < len(text):
        char_to_token.append(char_to_token[-1] if char_to_token else 0)
        j += 1
    return tokens, char_to_token, token_to_char


def naive_split_points(text: str, char_to_token, n_tokens: int, max_len: int):
    """Literal per-char loop of get_split_points (ehr.py:396-432)."""
    split_idx = [0]
    last_par_end_idx = 0
    last_line_end_idx = 0
    for i in range(len(text)):
        curr_counter = char_to_token[i] - split_idx[-1]
        if curr_counter >= max_len:
            if last_par_end_idx == 0 and last_line_end_idx != 0:
                split_idx.append(last_line_end_idx)
            elif last_par_end_idx != 0:
                split_idx.append(last_par_end_idx)
            else:
                split_idx.append(char_to_token[i])
            last_par_end_idx = 0
            last_line_end_idx = 0
        if i < len(text) - 2 and text[i] == "\n":
            if text[i + 1] == "\n":
                last_par_end_idx = char_to_token[i - 1]  # i-1 may wrap: parity
            if text[i + 1] == "." or text[i + 1] == "*":
                last_par_end_idx = char_to_token[i + 1]
            if (
                text[i + 1] in NEW_LINE_IND
                or text[i + 1].isdigit()
                or text[i - 1] in SENT_END_IND
            ):
                last_line_end_idx = char_to_token[i]
    split_idx.append(n_tokens)
    return split_idx


def naive_dict_ner(text: str, compiled) -> List[Tuple[str, str, int, int, str]]:
    """DictNER.predict + get_ner_predictions post-filter, serial."""
    mentions = []
    k = 1
    for ent_type, pat in compiled.items():
        for m in pat.finditer(text):
            s, e = m.start(0) + 1, m.end(0) - 1
            surface = text[s:e]
            if not any(c.isalnum() for c in surface):
                continue
            mentions.append((f"T{k}", ent_type, s, e, surface))
            k += 1
    return mentions


def naive_char_windows(text: str, max_len: int):
    tokens, c2t, t2c = naive_token_maps(text)
    if not tokens:
        return []
    split = naive_split_points(text, c2t, len(tokens), max_len)
    csp = [t2c[p][1] for p in split[:-1]]
    if len(csp) > 1:
        csp = csp[1:]
    # the reference loop processes len(csp) windows over [0]+csp bounds
    # (utils_re.py:404-435); the tail after csp[-1] is never reached.
    bounds = [0] + csp
    return list(zip(bounds[:-1], bounds[1:]))


def naive_triples(text: str, doc_id: str, compiled, scorer) -> Set[Tuple]:
    """One document -> deduped (doc_id, subj_id, subj, pred, obj) set."""
    mentions = naive_dict_ner(text, compiled)
    windows = naive_char_windows(text, max_len=128)
    masked, meta = [], []
    for start, end in windows:
        in_win = [m for m in mentions if m[2] >= start and m[3] <= end]
        drugs = [m for m in in_win if m[1].lower() == "drug"]
        others = [m for m in in_win if m[1].lower() != "drug"]
        for d in drugs:
            for o in others:
                # inner strict check, utils_re.py:420-421
                if not (
                    d[2] >= start and d[3] < end and o[2] >= start and o[3] < end
                ):
                    continue
                split_text = text[start:end]
                d_s, d_e = d[2] - start, d[3] - start
                o_s, o_e = o[2] - start, o[3] - start
                if d_e < o_e:
                    mt = split_text[:o_s] + "@" + o[1] + "$" + split_text[o_e:]
                    mt = mt[:d_s] + "@" + d[1] + "$" + mt[d_e:]
                else:
                    mt = split_text[:d_s] + "@" + d[1] + "$" + split_text[d_e:]
                    mt = mt[:o_s] + "@" + o[1] + "$" + mt[o_e:]
                masked.append(mt.replace("\n", " ").replace("\t", " "))
                meta.append((d, o))
    preds = scorer(masked)
    out: Set[Tuple] = set()
    for (d, o), p in zip(meta, preds):
        if p == 1:
            out.add((doc_id, d[0], d[4], o[1], o[4]))
    return out


def reference_triples(docs: Dict[str, str]) -> Set[Tuple]:
    """All documents -> the reference-semantics triple set."""
    compiled = compile_patterns(fit_patterns(DEFAULT_LEXICON))
    scorer = SurrogateScorer()
    out: Set[Tuple] = set()
    for doc_id, text in docs.items():
        out |= naive_triples(text, doc_id, compiled, scorer)
    return out


def assemble_serial(rows: List[dict]) -> Dict[str, str]:
    """conv rows -> doc_id -> text, serial reference of the assembly stage."""
    by_conv: Dict[str, List[Tuple[int, str]]] = {}
    for r in rows:
        by_conv.setdefault(r["conv_id"], []).append((r["turn_idx"], r["text"] or ""))
    return {
        cid: "\n\n".join(t for _, t in sorted(turns))
        for cid, turns in by_conv.items()
    }
