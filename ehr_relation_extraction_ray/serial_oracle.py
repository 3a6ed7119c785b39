"""Serial reference-semantics oracle (NOT part of the data plane).

A deliberately naive, per-document transcription of the reference's
semantics, used in two places:

* conformance tests (``tests/refsem.py`` re-exports this module), and
* the driver's correctness gate: for pipelines whose semantics are not
  SQL-expressible (chunker state machine, surrogate scorer cascade,
  union-find canonicalization, simhash), ``__ray_entry__.oracle_sql``
  points DuckDB at a parquet *fixture* computed here — a serial,
  single-process, O(chars)-Python-loop implementation that shares only
  primitives/config (lexicon patterns, SurrogateScorer, word-hash kernel,
  alias table) with the engine, never its distributed code. The oracle
  check then verifies the distributed execution (partitioning, shuffles,
  actor pools, combiners) against the serial semantics.

Reference transcriptions cite file:line into /root/reference:
* char<->token maps: literal char walk (ehr.py:196-249)
* split points: literal per-char loop (ehr.py:353-432)
* dictionary NER: DictNER.predict (rule_based_ner/dict_ner.py:82-119)
* non-alnum filter (predict.py:345)
* RE char windows + candidate loop (biobert_re/utils_re.py:369-439)
* masking (utils_re.py:210-230); long-table projection + drop_duplicates
  (utils.py:497-530, utils.py:553)
"""

from __future__ import annotations

from typing import Dict, List, Set, Tuple

import numpy as np
import pandas as pd

from .functions.rescore import SurrogateScorer
from .lexicon import DEFAULT_LEXICON, compile_patterns, fit_patterns

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


# -- serial pipelines for driver fixtures ------------------------------------


def serial_triples_df(docs: Dict[str, str]) -> pd.DataFrame:
    """Triples fixture: identical columns/sort as queries.kg_triples."""
    cols = ["doc_id", "subj_id", "subj", "pred", "obj"]
    rows = sorted(reference_triples(docs))
    return pd.DataFrame(rows, columns=cols).sort_values(cols).reset_index(drop=True)


def serial_conll_label_counts_df(docs: Dict[str, str]) -> pd.DataFrame:
    """Per-IOB-label token counts over ALL documents — the serial mirror of
    the kg_conll_export roundtrip digest (train + dev shards together cover
    every document, so the split assignment cancels out of the counts).
    IOB projection per get_labels (ehr.py:322-351): B-/I-<SHORT> over the
    whitespace tokens covering each mention's chars, later mentions
    overwriting earlier ones in detection (ent-id) order."""
    from .schemas import ENT_LABEL_MAP

    compiled = compile_patterns(fit_patterns(DEFAULT_LEXICON))
    counts: Dict[str, int] = {}
    for _doc_id, text in docs.items():
        mentions = naive_dict_ner(text, compiled)
        tokens, c2t, _ = naive_token_maps(text)
        labels = ["O"] * len(tokens)
        if tokens:
            last = len(tokens) - 1
            for _eid, ent_type, s, e, _surf in mentions:  # detection order
                short = ENT_LABEL_MAP.get(ent_type, ent_type.upper()[:3])
                t0 = c2t[s] if s < len(c2t) else last
                c1 = max(e - 1, s)
                t1 = c2t[c1] if c1 < len(c2t) else last
                for idx in range(t0, t1 + 1):
                    labels[idx] = ("B-" if idx == t0 else "I-") + short
        for l in labels:
            counts[l] = counts.get(l, 0) + 1
    keys = sorted(counts)
    return pd.DataFrame(
        {"label": keys, "n_tokens": [counts[k] for k in keys]}
    ).astype({"n_tokens": "int64"})


def serial_re_split_counts_df(docs: Dict[str, str]) -> pd.DataFrame:
    """Per-split RE TSV row counts — serial mirror of kg_re_export.

    Candidate count per doc: drug x non-drug pairs inside each RE char
    window passing the strict inner membership check (utils_re.py:420-421).
    The train/dev assignment is the engine-DEFINED deterministic hash-mod
    (pipelines/export.split_col) — the oracle reuses the same hash kernel
    by definition (the reference's order-dependent list slice is not
    reproducible under parallelism); everything counted around it is
    independently recomputed."""
    from .functions.textstats import content_hash_64

    compiled = compile_patterns(fit_patterns(DEFAULT_LEXICON))
    n = {"train": 0, "dev": 0}
    total = 0
    for doc_id, text in docs.items():
        mentions = naive_dict_ner(text, compiled)
        windows = naive_char_windows(text, max_len=128)
        c = 0
        for start, end in windows:
            in_win = [
                m for m in mentions if m[2] >= start and m[3] < end
            ]
            drugs = sum(1 for m in in_win if m[1].lower() == "drug")
            others = len(in_win) - drugs
            c += drugs * others
        total += c
        is_dev = int(content_hash_64([doc_id])[0] % np.uint64(10_000)) < 1_000
        n["dev" if is_dev else "train"] += c
    return pd.DataFrame(
        [
            {"split": "dev", "n_rows": n["dev"]},
            {"split": "test", "n_rows": total},
            {"split": "test_original", "n_rows": total},
            {"split": "train", "n_rows": n["train"]},
        ]
    ).astype({"n_rows": "int64"})


def serial_eval_detailed_df(docs: Dict[str, str], mode: str = "lenient") -> pd.DataFrame:
    """Serial mirror of queries.kg_eval_detailed: full-lexicon dict-NER
    scored against the reduced (single-word surfaces) gold lexicon with the
    n2c2 pare-down rule (Track2-evaluate-ver4.py:283-300), per-type +
    micro + macro rows — an independent recomputation of the distributed
    evaluator chain (tag/union/partition-groupby/Ray-mean)."""
    full = compile_patterns(fit_patterns(DEFAULT_LEXICON))
    reduced = {
        t: [s for s in v if " " not in s] for t, v in DEFAULT_LEXICON.items()
    }
    reduced = {t: v for t, v in reduced.items() if v}
    red = compile_patterns(fit_patterns(reduced))

    def eq(g, s):
        if g[1] != s[1]:
            return False
        if mode == "strict":
            return g[2] == s[2] and g[3] == s[3]
        return s[3] > g[2] and s[2] < g[3]

    def pare(gol, sys_l):
        matched_gold = []
        kept = list(sys_l)
        for s in sys_l:
            for g in gol:
                if eq(g, s):
                    if g not in matched_gold:
                        matched_gold.append(g)
                    elif s in kept:
                        kept.remove(s)
        tp = len({s for s in kept for g in gol if eq(g, s)})
        return tp, len(kept) - tp, len(gol) - tp

    cells = []  # (doc, type, tp, fp, fn)
    for doc_id, text in docs.items():
        sysm = naive_dict_ner(text, full)
        golm = naive_dict_ner(text, red)
        for t in sorted({m[1] for m in sysm} | {m[1] for m in golm}):
            sys_l = [m[:4] for m in sysm if m[1] == t]
            gol_l = [m[:4] for m in golm if m[1] == t]
            tp, fp, fn = pare(gol_l, sys_l)
            cells.append((doc_id, t, tp, fp, fn))
    cdf = pd.DataFrame(cells, columns=["doc_id", "ent_type", "tp", "fp", "fn"])

    def prf(tp, fp, fn):
        p = tp / (tp + fp) if tp + fp else 0.0
        r = tp / (tp + fn) if tp + fn else 0.0
        f1 = 2 * p * r / (p + r) if p + r else 0.0
        return p, r, f1

    rows = []
    for t, sub in sorted(cdf.groupby("ent_type"), key=lambda kv: kv[0]):
        p, r, f1 = prf(sub.tp.sum(), sub.fp.sum(), sub.fn.sum())
        rows.append({"scope": t, "precision": p, "recall": r, "f1": f1})
    p, r, f1 = prf(cdf.tp.sum(), cdf.fp.sum(), cdf.fn.sum())
    rows.append({"scope": "micro", "precision": p, "recall": r, "f1": f1})
    by_doc = cdf.groupby("doc_id")[["tp", "fp", "fn"]].sum()
    per_doc = [prf(r_.tp, r_.fp, r_.fn) for r_ in by_doc.itertuples()]
    rows.append(
        {
            "scope": "macro",
            "precision": float(np.mean([d[0] for d in per_doc])) if per_doc else 0.0,
            "recall": float(np.mean([d[1] for d in per_doc])) if per_doc else 0.0,
            "f1": float(np.mean([d[2] for d in per_doc])) if per_doc else 0.0,
        }
    )
    out = pd.DataFrame(rows, columns=["scope", "precision", "recall", "f1"])
    for c in ("precision", "recall", "f1"):
        out[c] = out[c].astype(float).round(6)
    return out.sort_values("scope").reset_index(drop=True)


def serial_windows_df(docs: Dict[str, str], max_len: int = 126) -> pd.DataFrame:
    """Per-doc NER window counts (one window per consecutive split pair)."""
    out = []
    for doc_id, text in docs.items():
        tokens, c2t, _ = naive_token_maps(text)
        if tokens:
            split = naive_split_points(text, c2t, len(tokens), max_len)
        else:
            split = [0, 0]
        out.append({"doc_id": doc_id, "n_windows": len(split) - 1})
    return (
        pd.DataFrame(out, columns=["doc_id", "n_windows"])
        .astype({"n_windows": "int64"})
        .sort_values("doc_id")
        .reset_index(drop=True)
    )


def serial_nodes_df(docs: Dict[str, str], fuzzy_max_d: int = 0) -> pd.DataFrame:
    """Canonicalization nodes fixture: naive dict count + serial union-find.

    Shares only config with stages/canonicalize.py (ALIAS_GROUPS, the
    normalization/variant spec); the clustering is re-implemented with
    plain dict merges, no union-find class, no Ray. With ``fuzzy_max_d``
    the naive all-pairs full-DP Levenshtein merge stands in for the
    engine's SymSpell-blocked distributed pair pass.
    """
    import re as _re

    from .stages.canonicalize import ALIAS_GROUPS

    ws = _re.compile(r"\s+")
    paren = _re.compile(r"\s*\([^)]*\)\s*$")
    compiled = compile_patterns(fit_patterns(DEFAULT_LEXICON))

    counts: Dict[Tuple[str, str], int] = {}
    for text in docs.values():
        for _eid, ent_type, _s, _e, surface in naive_dict_ner(text, compiled):
            norm = ws.sub(" ", surface.strip().lower())
            counts[(ent_type, norm)] = counts.get((ent_type, norm), 0) + 1

    # cluster membership via repeated merge (tiny vocab: O(V^2) is fine)
    clusters: Dict[Tuple[str, str], Set[Tuple[str, str]]] = {
        k: {k} for k in counts
    }

    def merge(a: Tuple[str, str], b: Tuple[str, str]) -> None:
        ca, cb = clusters[a], clusters[b]
        if ca is cb:
            return
        union = ca | cb
        for m in union:
            clusters[m] = union

    for ent_type, norm in list(counts):
        vk = paren.sub("", norm) or norm
        if vk != norm and (ent_type, vk) in counts:
            merge((ent_type, norm), (ent_type, vk))
    for grp in ALIAS_GROUPS:
        gnorm = [ws.sub(" ", g.strip().lower()) for g in grp]
        for ent_type in {k[0] for k in counts}:
            members = [g for g in gnorm if (ent_type, g) in counts]
            for a, b in zip(members, members[1:]):
                merge((ent_type, a), (ent_type, b))
    if fuzzy_max_d > 0:
        def lev(a: str, b: str) -> int:  # naive full-grid DP
            dp = list(range(len(b) + 1))
            for i in range(1, len(a) + 1):
                prev, dp[0] = dp[0], i
                for j in range(1, len(b) + 1):
                    cur = dp[j]
                    dp[j] = min(dp[j] + 1, dp[j - 1] + 1,
                                prev + (a[i - 1] != b[j - 1]))
                    prev = cur
            return dp[-1]

        keys_sorted = sorted(counts)
        for i, ka in enumerate(keys_sorted):
            for kb in keys_sorted[i + 1:]:
                if ka[0] == kb[0] and lev(ka[1], kb[1]) <= fuzzy_max_d:
                    merge(ka, kb)

    seen: Set[int] = set()
    rows = []
    for key in counts:
        cl = clusters[key]
        if id(cl) in seen:
            continue
        seen.add(id(cl))
        ent_type = key[0]
        members = sorted(cl)
        best = min(members, key=lambda k: (-counts[k], k[1]))
        rows.append(
            {
                "node_id": f"N:{ent_type}:{best[1]}",
                "ent_type": ent_type,
                "canonical_text": best[1],
                "n_aliases": len(members),
                "n_mentions": sum(counts[m] for m in members),
            }
        )
    return (
        pd.DataFrame(
            rows,
            columns=["node_id", "ent_type", "canonical_text", "n_aliases", "n_mentions"],
        )
        .astype({"n_aliases": "int64", "n_mentions": "int64"})
        .sort_values("node_id")
        .reset_index(drop=True)
    )


def serial_linked_mentions_df(docs: Dict[str, str], threshold: float = 0.5) -> pd.DataFrame:
    """Serial mirror of queries.kg_linked_mentions: reduced-lexicon node
    map (same merge clustering as serial_nodes_df), then every
    full-lexicon mention linked — exact normalized hit scores 1.0, else
    best same-type candidate by character-set Jaccard (candidates in
    sorted-norm order, strict >, threshold cut)."""
    import re as _re

    from .stages.canonicalize import ALIAS_GROUPS

    ws = _re.compile(r"\s+")
    paren = _re.compile(r"\s*\([^)]*\)\s*$")
    reduced_lex = {
        t: [s for s in v if " " not in s] for t, v in DEFAULT_LEXICON.items()
    }
    reduced_lex = {t: v for t, v in reduced_lex.items() if v}
    red = compile_patterns(fit_patterns(reduced_lex))
    full = compile_patterns(fit_patterns(DEFAULT_LEXICON))

    counts: Dict[Tuple[str, str], int] = {}
    for text in docs.values():
        for _e, t, _s, _x, surf in naive_dict_ner(text, red):
            norm = ws.sub(" ", surf.strip().lower())
            counts[(t, norm)] = counts.get((t, norm), 0) + 1
    clusters: Dict[Tuple[str, str], Set[Tuple[str, str]]] = {k: {k} for k in counts}

    def merge(a, b):
        ca, cb = clusters[a], clusters[b]
        if ca is cb:
            return
        u = ca | cb
        for m in u:
            clusters[m] = u

    for t, norm in list(counts):
        vk = paren.sub("", norm) or norm
        if vk != norm and (t, vk) in counts:
            merge((t, norm), (t, vk))
    for grp in ALIAS_GROUPS:
        gnorm = [ws.sub(" ", g.strip().lower()) for g in grp]
        for t in {k[0] for k in counts}:
            members = [g for g in gnorm if (t, g) in counts]
            for a, b in zip(members, members[1:]):
                merge((t, a), (t, b))
    surface_to_node: Dict[Tuple[str, str], str] = {}
    seen: Set[int] = set()
    for key in counts:
        cl = clusters[key]
        if id(cl) in seen:
            continue
        seen.add(id(cl))
        members = sorted(cl)
        best = min(members, key=lambda k: (-counts[k], k[1]))
        nid = f"N:{key[0]}:{best[1]}"
        for m in members:
            surface_to_node[m] = nid

    by_type: Dict[str, List[Tuple[str, str]]] = {}
    for (t, norm), nid in sorted(surface_to_node.items()):
        by_type.setdefault(t, []).append((norm, nid))

    agg: Dict[Tuple[str, str], List[float]] = {}
    for text in docs.values():
        for _e, t, _s, _x, surf in naive_dict_ner(text, full):
            norm = ws.sub(" ", surf.strip().lower())
            if (t, norm) in surface_to_node:
                method, score = "exact", 1.0
            else:
                sn = set(norm)
                best_s = 0.0
                for cnorm, nid in by_type.get(t, []):
                    cs = set(cnorm)
                    u = sn | cs
                    s = len(sn & cs) / len(u) if u else 0.0
                    if s > best_s:
                        best_s = s
                if best_s >= threshold:
                    method, score = "fuzzy", best_s
                else:
                    method, score = "none", best_s
            cell = agg.setdefault((t, method), [0, 0.0])
            cell[0] += 1
            cell[1] += score
    rows = [
        {
            "ent_type": t,
            "link_method": m,
            "n_mentions": c[0],
            "sum_score": round(c[1], 2),
        }
        for (t, m), c in sorted(agg.items())
    ]
    return (
        pd.DataFrame(
            rows, columns=["ent_type", "link_method", "n_mentions", "sum_score"]
        )
        .astype({"n_mentions": "int64"})
        .sort_values(["ent_type", "link_method"])
        .reset_index(drop=True)
    )


def serial_brat_digest_df(data_dir: str) -> pd.DataFrame:
    """Independent serial parse of a brat directory: per-type mention
    (span-char sum, count) + one _relations row — mirrors
    queries.brat_ingest without touching sources/brat."""
    import os

    agg: Dict[str, List[int]] = {}
    n_edges = 0
    for f in sorted(os.listdir(data_dir)):
        if not f.endswith(".ann"):
            continue
        for line in open(os.path.join(data_dir, f), encoding="utf-8"):
            line = line.rstrip("\n")
            if not line or line.startswith("#"):
                continue
            if line.startswith("T"):
                parts = line.split("\t")
                det = parts[1]
                tname = det.split()[0]
                ranges = det[len(tname):].strip().split(";")
                start = int(ranges[0].split()[0])
                end = int(ranges[-1].split()[1])
                cell = agg.setdefault(tname, [0, 0])
                cell[0] += end - start
                cell[1] += 1
            elif line.startswith("R"):
                n_edges += 1
    rows = [
        {"kind": k, "span_chars": v[0], "n": v[1]} for k, v in agg.items()
    ]
    rows.append({"kind": "_relations", "span_chars": 0, "n": n_edges})
    return (
        pd.DataFrame(rows, columns=["kind", "span_chars", "n"])
        .astype({"span_chars": "int64", "n": "int64"})
        .sort_values("kind")
        .reset_index(drop=True)
    )


def serial_hll_tokens_df(doc_ids: List, texts: List[str]) -> pd.DataFrame:
    """Serial mirror of queries.docs_distinct_tokens: fold EVERY token of
    every document through the same deterministic HLL (duplication is a
    no-op under register max, so block structure cannot matter)."""
    import numpy as np

    from .functions.sketch import hll_estimate, hll_registers

    toks: List[str] = []
    for t in texts:
        toks.extend((t or "").lower().split())
    regs = hll_registers(toks)
    return pd.DataFrame(
        [
            {
                "metric": "distinct_tokens_hll",
                "estimate": round(hll_estimate(regs), 2),
                "nonzero_registers": int((regs > 0).sum()),
            }
        ]
    ).astype({"nonzero_registers": "int64"})


def serial_quality_df(doc_ids: List, texts: List[str]) -> pd.DataFrame:
    """Quality/lang features fixture, per-doc Python loops. Shares only the
    marker/regex CONFIG with functions/textstats.py; every computation here
    is an independent naive loop."""
    from .functions.textstats import _BPE_RE, LANG_MARKERS

    import re as _re

    word_re = _re.compile(r"[a-zA-Z']+")
    en_stop = LANG_MARKERS["en"]
    rows = []
    for doc_id, text in zip(doc_ids, texts):
        text = text or ""
        words = word_re.findall(text.lower())
        best, best_hits = "und", 0
        for lang, markers in LANG_MARKERS.items():
            hits = sum(1 for w in words if w in markers)
            if hits > best_hits:
                best, best_hits = lang, hits
        n_ws = len(text.split())
        denom = max(n_ws, 1)
        n_chars = max(len(text), 1)
        rows.append(
            {
                "doc_id": doc_id,
                "lang_pred": best,
                "bpe_tokens": len(_BPE_RE.findall(text)),
                "stopword_ratio": round(
                    sum(1 for w in words if w in en_stop) / denom, 6
                ),
                "punct_ratio": round(
                    sum(1 for c in text if not (c.isalnum() or c == "_" or c.isspace()))
                    / n_chars,
                    6,
                ),
                "digit_ratio": round(
                    sum(1 for c in text if c.isdigit()) / n_chars, 6
                ),
                "fingerprint": _serial_fingerprint(text),
            }
        )
    out = pd.DataFrame(rows).astype(
        {"bpe_tokens": "int64", "fingerprint": "int64"}
    )
    return out.sort_values("doc_id").reset_index(drop=True)


def _serial_fingerprint(text: str, k: int = 9, window: int = 4) -> int:
    """Naive per-char winnowing fingerprint (spec of
    textstats.rolling_fingerprint, loop form)."""
    data = text.encode("utf-8", "surrogatepass")
    mask = 0xFFFFFFFFFFFFFFFF
    if len(data) < k:
        # FNV-1a over the bytes
        h = 14695981039346656037
        for b in data:
            h = ((h ^ b) * 1099511628211) & mask
        return int(np.uint64(h).astype(np.int64))
    hashes = []
    for i in range(len(data) - k + 1):
        acc = 0
        for j in range(k):
            acc = (acc * 257 + data[i + j]) & mask
        hashes.append(acc)
    if len(hashes) <= window:
        out = 0
        for h in hashes:
            out ^= h
        return int(np.uint64(out).astype(np.int64))
    mins = set()
    for i in range(len(hashes) - window + 1):
        mins.add(min(hashes[i : i + window]))
    out = 0
    for m in mins:
        out ^= m
    return int(np.uint64(out).astype(np.int64))


def serial_simhash_pairs_df(
    doc_ids: List, texts: List[str], max_hamming: int = 3
) -> pd.DataFrame:
    """All-pairs simhash Hamming fixture: per-doc bit-vote loop + O(n^2)
    popcount loop. Shares only the word-hash kernel with stages/dedupe.py
    (the signature definition); bucketing/pigeonhole is absent — for
    max_hamming <= 3 the 4x16-bit sub-key blocking is lossless, so the
    engine's bucketed output must equal this exhaustive set."""
    from .stages.dedupe import _word_hashes

    sims = {}
    for doc_id, text in zip(doc_ids, texts):
        words = (text or "").lower().split()
        if not words:
            sims[str(doc_id)] = 0
            continue
        hashes = [int(h) for h in _word_hashes(words)]
        sh = 0
        for bit in range(64):
            votes = 0
            for h in hashes:
                votes += 1 if (h >> bit) & 1 else -1
            if votes > 0:
                sh |= 1 << bit
        sims[str(doc_id)] = sh
    ids = sorted(sims)
    rows = []
    for i in range(len(ids)):
        for j in range(i + 1, len(ids)):
            d = bin(sims[ids[i]] ^ sims[ids[j]]).count("1")
            if d <= max_hamming:
                rows.append({"doc_a": ids[i], "doc_b": ids[j], "hamming": d})
    return (
        pd.DataFrame(rows, columns=["doc_a", "doc_b", "hamming"])
        .astype({"hamming": "int32"})
        .sort_values(["doc_a", "doc_b"])
        .reset_index(drop=True)
    )


def serial_ivf_topk_df(
    vec_ids: np.ndarray,
    embeddings: np.ndarray,
    query_positions: List[int],
    k: int = 5,
    nlist: int = 8,
    nprobe: int = 3,
    sample_size: int = 2048,
    iters: int = 10,
    seed: int = 13,
) -> pd.DataFrame:
    """IVF probe fixture: the same deterministic k-means spec as
    stages/similarity.train_centroids re-run serially, then a naive
    per-query probe loop (no Ray, no batch partial-top-k merge)."""

    def norm(m):
        n = np.linalg.norm(m, axis=1, keepdims=True)
        n[n == 0] = 1.0
        return m / n

    # precision mirrors the engine exactly: centroids trained/stored in
    # float32 (train_centroids), corpus matrix normalized in float64
    # (_batch_matrix), query vectors normalized in float32 (ivf_topk)
    m32 = norm(embeddings.astype(np.float32))
    m64 = norm(embeddings.astype(np.float64))
    sample = m32[:sample_size]
    rng = np.random.default_rng(seed)
    cent = sample[rng.choice(len(sample), size=min(nlist, len(sample)), replace=False)]
    for _ in range(iters):
        assign = np.argmax(sample @ cent.T, axis=1)
        for c in range(len(cent)):
            members = sample[assign == c]
            if len(members):
                cent[c] = members.mean(axis=0)
        cent = norm(cent)
    cells = np.argmax(m64 @ cent.T, axis=1)

    rows = []
    for qpos in query_positions:
        q = m32[vec_ids == qpos][0]
        probe = np.argsort(-(q @ cent.T))[:nprobe]
        mask = np.isin(cells, probe)
        sims = (m64[mask] @ q).astype(np.float64)
        ids = vec_ids[mask]
        order = np.lexsort((ids, -sims))[:k]
        for rank, idx in enumerate(order, start=1):
            rows.append(
                {"query_id": qpos, "vec_id": int(ids[idx]), "rank": rank}
            )
    return (
        pd.DataFrame(rows, columns=["query_id", "vec_id", "rank"])
        .astype("int64")
        .sort_values(["query_id", "rank"])
        .reset_index(drop=True)
    )


def serial_ivf_cluster_sizes_df(
    embeddings: np.ndarray,
    nlist: int = 8,
    sample_size: int = 2048,
    iters: int = 10,
    seed: int = 13,
) -> pd.DataFrame:
    """Cluster-profile fixture: the same deterministic k-means spec as
    stages/similarity.train_centroids re-run serially, then per-cell
    count + mean cosine to the own centroid over the full corpus."""

    def norm(m):
        n = np.linalg.norm(m, axis=1, keepdims=True)
        n[n == 0] = 1.0
        return m / n

    m32 = norm(embeddings.astype(np.float32))
    m64 = norm(embeddings.astype(np.float64))
    sample = m32[:sample_size]
    rng = np.random.default_rng(seed)
    cent = sample[rng.choice(len(sample), size=min(nlist, len(sample)), replace=False)]
    for _ in range(iters):
        assign = np.argmax(sample @ cent.T, axis=1)
        for c in range(len(cent)):
            members = sample[assign == c]
            if len(members):
                cent[c] = members.mean(axis=0)
        cent = norm(cent)
    sims_all = m64 @ cent.T.astype(np.float64)
    cells = np.argmax(sims_all, axis=1)
    own = sims_all[np.arange(len(cells)), cells]
    rows = []
    for c in range(len(cent)):
        mask = cells == c
        n = int(mask.sum())
        if n == 0:
            continue
        rows.append(
            {
                "cell": c,
                "n_vecs": n,
                "mean_sim": round(float(own[mask].sum() / n), 6),
            }
        )
    return (
        pd.DataFrame(rows, columns=["cell", "n_vecs", "mean_sim"])
        .astype({"cell": "int64", "n_vecs": "int64"})
        .sort_values("cell")
        .reset_index(drop=True)
    )


def serial_semdedup_df(
    vec_ids: np.ndarray,
    embeddings: np.ndarray,
    nlist: int = 8,
    threshold: float = 0.4,
    sample_size: int = 2048,
    iters: int = 10,
    seed: int = 13,
) -> pd.DataFrame:
    """SemDeDup fixture: the same deterministic k-means spec as
    stages/similarity.train_centroids re-run serially, cells assigned in
    float64 against float32 centroids, then ALL within-cell pairs with
    float64 cosine >= threshold. Independent of the distributed
    stages/similarity.semdedup_pairs implementation."""

    def norm(m):
        n = np.linalg.norm(m, axis=1, keepdims=True)
        n[n == 0] = 1.0
        return m / n

    m32 = norm(embeddings.astype(np.float32))
    m64 = norm(embeddings.astype(np.float64))
    sample = m32[:sample_size]
    rng = np.random.default_rng(seed)
    cent = sample[rng.choice(len(sample), size=min(nlist, len(sample)), replace=False)]
    for _ in range(iters):
        assign = np.argmax(sample @ cent.T, axis=1)
        for c in range(len(cent)):
            members = sample[assign == c]
            if len(members):
                cent[c] = members.mean(axis=0)
        cent = norm(cent)
    cells = np.argmax(m64 @ cent.T.astype(np.float64), axis=1)
    pairs_m = m32.astype(np.float64)
    rows = []
    for c in range(len(cent)):
        idx = np.nonzero(cells == c)[0]
        if len(idx) < 2:
            continue
        sub = pairs_m[idx]
        sims = sub @ sub.T
        ai, bi = np.triu_indices(len(idx), k=1)
        keep = sims[ai, bi] >= threshold
        ids = np.asarray(vec_ids)[idx]
        a, b = ids[ai[keep]], ids[bi[keep]]
        lo, hi = np.minimum(a, b), np.maximum(a, b)
        for x, y, s in zip(lo, hi, np.round(sims[ai[keep], bi[keep]], 6)):
            rows.append({"vec_a": int(x), "vec_b": int(y), "cos": float(s)})
    return (
        pd.DataFrame(rows, columns=["vec_a", "vec_b", "cos"])
        .astype({"vec_a": "int64", "vec_b": "int64"})
        .sort_values(["vec_a", "vec_b"])
        .reset_index(drop=True)
    )


def serial_hash_embed_df(doc_ids: List, texts: List[str], dim: int = 64) -> pd.DataFrame:
    """Feature-hashing embedding fixture: independent naive recompute of
    the stages/embed spec — md5-slot/sign per token, integer counts,
    float64 L2 normalization, 6dp md5 digest."""
    import hashlib as _hl

    rows = []
    for did, text in zip(doc_ids, texts):
        c = [0] * dim
        for tok in (text or "").lower().split():
            h = int(_hl.md5(tok.encode("utf-8")).hexdigest()[:8], 16)
            c[h % dim] += 1 if (h >> 8) & 1 else -1
        arr = np.asarray(c, dtype=np.float64)
        n = float(np.linalg.norm(arr))
        v = arr / (n if n else 1.0)
        rows.append(
            {
                "doc_id": int(did),
                "vec_md5": _hl.md5(
                    ",".join(f"{x:.6f}" for x in v).encode()
                ).hexdigest(),
            }
        )
    return pd.DataFrame(rows, columns=["doc_id", "vec_md5"])


def serial_bpe_merges_df(
    doc_ids: List, texts: List[str], n_merges: int = 12
) -> pd.DataFrame:
    """Naive single-process BPE merge learning: Counter word frequencies
    over whitespace-split lowercased text, then the textbook merge loop
    (count adjacent symbol pairs weighted by word freq, merge the most
    frequent pair, lexicographic tiebreak). Independent of the
    distributed implementation in stages/text_analysis.bpe_merges."""
    import re as _re
    from collections import Counter

    wc: Counter = Counter()
    for t in texts:
        # flags=ASCII: the distributed path splits with Arrow RE2, whose \s
        # is ASCII-only — Python re's default Unicode \s would diverge on
        # non-breaking spaces etc.
        for w in _re.split(r"\s+", (t or "").lower(), flags=_re.ASCII):
            if w:
                wc[w] += 1
    seqs = {w: tuple(w) + ("</w>",) for w in wc}
    rows = []
    for rank in range(n_merges):
        pc_: Counter = Counter()
        for w, syms in seqs.items():
            for i in range(len(syms) - 1):
                pc_[(syms[i], syms[i + 1])] += wc[w]
        if not pc_:
            break
        best = sorted(pc_.items(), key=lambda kv: (-kv[1], kv[0]))[0]
        (a, b), cnt = best
        rows.append({"rank": rank, "left": a, "right": b, "pair_count": cnt})
        ab = a + b
        new = {}
        for w, syms in seqs.items():
            lst = list(syms)
            j = 0
            res = []
            while j < len(lst):
                if j + 1 < len(lst) and lst[j] == a and lst[j + 1] == b:
                    res.append(ab)
                    j += 2
                else:
                    res.append(lst[j])
                    j += 1
            new[w] = tuple(res)
        seqs = new
    return pd.DataFrame(rows, columns=["rank", "left", "right", "pair_count"]).astype(
        {"rank": "int64", "pair_count": "int64"}
    )


def serial_lang_centroid_df(sf_dir: str, dim: int = 64) -> pd.DataFrame:
    """Per-lang hashed-count centroid fixture: independent recompute —
    md5-slot/sign per token, integer sums per lang, one normalization."""
    import hashlib as _hl
    import os as _os

    import pyarrow.parquet as _pq

    t = _pq.read_table(_os.path.join(sf_dir, "documents.parquet"))
    sums: dict = {}
    for lang, text in zip(t["lang"].to_pylist(), t["text"].to_pylist()):
        c = sums.setdefault(lang, np.zeros(dim, dtype=np.int64))
        for tok in (text or "").lower().split():
            h = int(_hl.md5(tok.encode("utf-8")).hexdigest()[:8], 16)
            c[h % dim] += 1 if (h >> 8) & 1 else -1
    rows = []
    for lang in sorted(sums):
        arr = sums[lang].astype(np.float64)
        n = float(np.linalg.norm(arr))
        v = arr / (n if n else 1.0)
        rows.append(
            {
                "lang": lang,
                "vec_md5": _hl.md5(
                    ",".join(f"{x:.6f}" for x in v).encode()
                ).hexdigest(),
            }
        )
    return pd.DataFrame(rows, columns=["lang", "vec_md5"])


def serial_compress_ratio_df(doc_ids: List, texts: List[str]) -> pd.DataFrame:
    """zlib level-6 compression-ratio fixture (independent recompute)."""
    import zlib as _z

    rows = []
    for did, t in zip(doc_ids, texts):
        b = (t or "").encode("utf-8")
        rows.append(
            {
                "doc_id": int(did),
                "compress_ratio": round(len(_z.compress(b, 6)) / max(len(b), 1), 6),
            }
        )
    return pd.DataFrame(rows, columns=["doc_id", "compress_ratio"])


# -- fixture plumbing (driver oracle_sql support) ----------------------------

# bump when any serial semantics above change, so stale /tmp fixtures from a
# previous code version are never reused
_FIXTURE_VERSION = 2  # v2: import-free vec_string_hash_64 replaced the polars word hash


def _transcript_docs(sf_dir: str) -> Dict[str, str]:
    import pyarrow.parquet as pq

    from . import synth

    table = pq.read_table(synth.transcripts_path(sf_dir))
    return assemble_serial(table.to_pylist())


def _documents(sf_dir: str):
    import os

    import pyarrow.parquet as pq

    t = pq.read_table(os.path.join(sf_dir, "documents.parquet"))
    return t["doc_id"].to_pylist(), t["text"].to_pylist()


def _compute_fixture(name: str, sf_dir: str) -> pd.DataFrame:
    import os

    import pyarrow.parquet as pq

    if name == "kg_triples":
        return serial_triples_df(_transcript_docs(sf_dir))
    if name == "kg_windows":
        return serial_windows_df(_transcript_docs(sf_dir))
    if name == "kg_nodes":
        return serial_nodes_df(_transcript_docs(sf_dir))
    if name == "kg_nodes_fuzzy":
        return serial_nodes_df(_transcript_docs(sf_dir), fuzzy_max_d=1)
    if name == "events_user_hll":
        return serial_user_hll_df(sf_dir)
    if name == "kg_kcore":
        return serial_kcore_df(_transcript_docs(sf_dir))
    if name == "kg_random_walks":
        return serial_random_walks_df(_transcript_docs(sf_dir))
    if name == "kg_mention_overlaps":
        return serial_mention_overlaps_df(_transcript_docs(sf_dir))
    if name == "docs_f2_sketch":
        return serial_f2_df(*_documents(sf_dir))
    if name in ("embeddings_kmeans_iter", "embeddings_logreg"):
        t = pq.read_table(os.path.join(sf_dir, "embeddings.parquet"))
        vec_ids = np.asarray(t["vec_id"])
        emb = np.stack([np.asarray(v) for v in t["embedding"].to_pylist()])
        if name == "embeddings_kmeans_iter":
            return serial_kmeans_df(vec_ids, emb)
        return serial_logreg_df(vec_ids, emb)
    if name == "kg_conll_export":
        return serial_conll_label_counts_df(_transcript_docs(sf_dir))
    if name == "kg_re_export":
        return serial_re_split_counts_df(_transcript_docs(sf_dir))
    if name == "kg_eval_detailed":
        return serial_eval_detailed_df(_transcript_docs(sf_dir))
    if name == "kg_linked_mentions":
        return serial_linked_mentions_df(_transcript_docs(sf_dir))
    if name == "brat_ingest":
        from .pipelines.queries import brat_path

        return serial_brat_digest_df(brat_path(sf_dir))
    if name == "docs_quality":
        return serial_quality_df(*_documents(sf_dir))
    if name == "docs_compress_ratio":
        return serial_compress_ratio_df(*_documents(sf_dir))
    if name == "docs_lang_centroid":
        return serial_lang_centroid_df(sf_dir)
    if name == "docs_hash_embed":
        return serial_hash_embed_df(*_documents(sf_dir))
    if name == "docs_bpe_encode":
        return serial_bpe_encode_df(*_documents(sf_dir))
    if name == "docs_bpe_merges":
        return serial_bpe_merges_df(*_documents(sf_dir))
    if name == "docs_distinct_tokens":
        return serial_hll_tokens_df(*_documents(sf_dir))
    if name == "docs_simhash_pairs":
        return serial_simhash_pairs_df(*_documents(sf_dir))
    if name == "embeddings_ivf_topk":
        t = pq.read_table(os.path.join(sf_dir, "embeddings.parquet"))
        vec_ids = np.asarray(t["vec_id"])
        emb = np.stack([np.asarray(v) for v in t["embedding"].to_pylist()])
        return serial_ivf_topk_df(vec_ids, emb, [0, 1, 2])
    if name == "kg_pagerank":
        return serial_pagerank_df(_transcript_docs(sf_dir))
    if name == "kg_transe":
        return serial_transe_df(_transcript_docs(sf_dir))
    if name == "kg_transe_eval":
        return serial_transe_eval_df(_transcript_docs(sf_dir))
    if name == "kg_label_prop":
        return serial_label_prop_df(_transcript_docs(sf_dir))
    if name == "events_hll_overlap":
        return serial_hll_overlap_df(sf_dir)
    if name == "orders_lineitem_join_size":
        return serial_join_size_df(sf_dir)
    if name == "kg_linkpred_auc":
        return serial_linkpred_auc_df(_transcript_docs(sf_dir))
    if name == "media_phash_dup":
        return serial_phash_dup_df(sf_dir)
    if name == "kg_ppr":
        return serial_ppr_df(_transcript_docs(sf_dir))
    if name == "kg_betweenness":
        return serial_betweenness_df(_transcript_docs(sf_dir))
    if name == "docs_heaps_fit":
        return serial_heaps_df(sf_dir)
    if name == "docs_cdc_dedup":
        return serial_cdc_dedup_df(sf_dir)
    if name == "docs_partition_skew":
        return serial_partition_skew_df(sf_dir)
    if name == "events_cusum":
        return serial_cusum_df(sf_dir)
    if name == "docs_cm_profile":
        return serial_cm_profile_df(*_documents(sf_dir))
    if name == "embeddings_pca":
        t = pq.read_table(os.path.join(sf_dir, "embeddings.parquet"))
        emb = np.stack([np.asarray(v) for v in t["embedding"].to_pylist()])
        return serial_pca_df(emb)
    if name == "embeddings_knn_graph":
        t = pq.read_table(os.path.join(sf_dir, "embeddings.parquet"))
        vec_ids = np.asarray(t["vec_id"])
        emb = np.stack([np.asarray(v) for v in t["embedding"].to_pylist()])
        return serial_knn_graph_df(vec_ids, emb)
    if name == "embeddings_semdedup":
        t = pq.read_table(os.path.join(sf_dir, "embeddings.parquet"))
        vec_ids = np.asarray(t["vec_id"])
        emb = np.stack([np.asarray(v) for v in t["embedding"].to_pylist()])
        return serial_semdedup_df(vec_ids, emb)
    if name == "embeddings_cluster_sizes":
        t = pq.read_table(os.path.join(sf_dir, "embeddings.parquet"))
        emb = np.stack([np.asarray(v) for v in t["embedding"].to_pylist()])
        return serial_ivf_cluster_sizes_df(emb)
    if name == "embeddings_pq_topk":
        t = pq.read_table(os.path.join(sf_dir, "embeddings.parquet"))
        vec_ids = np.asarray(t["vec_id"])
        emb = np.stack([np.asarray(v) for v in t["embedding"].to_pylist()])
        return serial_pq_topk_df(vec_ids, emb, [0, 1, 2])
    raise KeyError(name)


def serial_knn_graph_df(
    vec_ids: np.ndarray,
    embeddings: np.ndarray,
    k: int = 5,
    nlist: int = 8,
    probes: int = 2,
    sample_size: int = 2048,
    iters: int = 10,
    seed: int = 13,
) -> pd.DataFrame:
    """kNN-graph fixture: the identical deterministic spec as
    stages/similarity.knn_graph — sample-fit float32 k-means
    (train_centroids spec), float64-normalized points, stable-argsort
    probe cells, per-cell (queries x members) float64 cosine with
    (-cos, nbr_id) selection — computed serially and independently of
    the distributed cell/point exchanges."""

    def norm(m):
        n = np.linalg.norm(m, axis=1, keepdims=True)
        n[n == 0] = 1.0
        return m / n

    m32 = norm(embeddings.astype(np.float32))
    sample = m32[:sample_size]
    rng = np.random.default_rng(seed)
    cent = sample[
        rng.choice(len(sample), size=min(nlist, len(sample)), replace=False)
    ]
    for _ in range(iters):
        assign = np.argmax(sample @ cent.T, axis=1)
        for c in range(len(cent)):
            members = sample[assign == c]
            if len(members):
                cent[c] = members.mean(axis=0)
        cent = norm(cent)

    m64 = norm(embeddings.astype(np.float64))
    scores = m64 @ cent.T
    order = np.argsort(-scores, axis=1, kind="stable")[:, :probes]
    primary = order[:, 0]
    ids = np.asarray(vec_ids, dtype=np.int64)
    rows = []
    for i in range(len(ids)):
        cand_cos, cand_ids = [], []
        for cell in order[i]:
            mem = np.nonzero(primary == cell)[0]
            mem = mem[ids[mem] != ids[i]]
            if not len(mem):
                continue
            sims = m64[i] @ m64[mem].T
            sel = np.lexsort((ids[mem], -sims))[: min(k, len(mem))]
            cand_cos.append(sims[sel])
            cand_ids.append(ids[mem[sel]])
        if not cand_cos:
            continue
        cc = np.concatenate(cand_cos)
        ci = np.concatenate(cand_ids)
        sel = np.lexsort((ci, -cc))[: min(k, len(cc))]
        for r, s in enumerate(sel):
            rows.append(
                {"vec_id": int(ids[i]), "rank": r + 1,
                 "nbr_id": int(ci[s]), "cos": round(float(cc[s]), 6)}
            )
    out = pd.DataFrame(rows, columns=["vec_id", "rank", "nbr_id", "cos"])
    out = out.astype({"vec_id": "int64", "rank": "int64", "nbr_id": "int64"})
    return out.sort_values(["vec_id", "rank"]).reset_index(drop=True)


def serial_bpe_encode_df(
    doc_ids: List, texts: List[str], n_merges: int = 12
) -> pd.DataFrame:
    """Naive single-process BPE ENCODE fixture: train merges with
    serial_bpe_merges_df (independent trainer), then apply them to every
    word with an independent greedy lowest-rank loop — no caching, no
    shared kernel with stages/text_analysis.bpe_encode."""
    import re as _re

    merges = serial_bpe_merges_df(doc_ids, texts, n_merges=n_merges)
    rank = {
        (str(l), str(r)): int(k)
        for k, l, r in zip(merges["rank"], merges["left"], merges["right"])
    }
    rows = []
    for d, t in zip(doc_ids, texts):
        nw = ntok = 0
        for w in _re.split(r"\s+", (t or "").lower(), flags=_re.ASCII):
            if not w:
                continue
            nw += 1
            syms = list(w) + ["</w>"]
            while True:
                cand = [
                    (rank[(syms[i], syms[i + 1])], i)
                    for i in range(len(syms) - 1)
                    if (syms[i], syms[i + 1]) in rank
                ]
                if not cand:
                    break
                r0 = min(c[0] for c in cand)
                a, b = None, None
                for rr, i in cand:
                    if rr == r0:
                        a, b = syms[i], syms[i + 1]
                        break
                res, j = [], 0
                while j < len(syms):
                    if j + 1 < len(syms) and syms[j] == a and syms[j + 1] == b:
                        res.append(a + b)
                        j += 2
                    else:
                        res.append(syms[j])
                        j += 1
                syms = res
            ntok += len(syms)
        rows.append({"doc_id": d, "n_words": nw, "n_tokens": ntok})
    out = pd.DataFrame(rows, columns=["doc_id", "n_words", "n_tokens"])
    out = out.astype({"n_words": "int64", "n_tokens": "int64"})
    return out.sort_values("doc_id").reset_index(drop=True)


def fixture_path(name: str, sf_dir: str) -> str:
    """Compute (once) and return the parquet fixture for ``name``.

    Written atomically (tmp file + rename) under /tmp/graft_oracle, keyed
    by sf tier and fixture version, so concurrent callers and reruns are
    safe and DuckDB always sees a complete file.
    """
    import os
    import tempfile

    import pyarrow as pa
    import pyarrow.parquet as pq

    sf = os.path.basename(os.path.normpath(sf_dir))
    out_dir = f"/tmp/graft_oracle/{sf}"
    path = os.path.join(out_dir, f"{name}-v{_FIXTURE_VERSION}.parquet")
    if os.path.exists(path):
        return path
    df = _compute_fixture(name, sf_dir)
    os.makedirs(out_dir, exist_ok=True)
    fd, tmp = tempfile.mkstemp(dir=out_dir, suffix=".parquet.tmp")
    os.close(fd)
    pq.write_table(pa.Table.from_pandas(df, preserve_index=False), tmp)
    os.replace(tmp, path)
    return path


def serial_pca_df(embeddings: np.ndarray, iters: int = 100) -> pd.DataFrame:
    """PCA fixture: covariance + the identical deterministic power-
    iteration spec as stages/similarity.pca_top_component, computed in one
    serial numpy pass (independent of the partial-merge path)."""
    from .stages.similarity import power_iteration_table

    m = embeddings.astype(np.float64)
    cov = np.cov(m, rowvar=False, bias=True)
    return pd.DataFrame(power_iteration_table(cov, iters))


def serial_transe_df(docs: Dict[str, str]) -> pd.DataFrame:
    """TransE fixture: serial triples -> the shared deterministic training
    spec (stages/graph.transe — the pagerank pattern: stages/graph owns the
    math; this path feeds it independently-extracted triples in ONE process,
    so a hash match proves the distributed epoch loop including its
    integer-coefficient gradient merge)."""
    from .stages.graph import transe

    trip = serial_triples_df(docs)
    return transe(trip[["subj", "pred", "obj"]])


def serial_transe_eval_df(docs: Dict[str, str]) -> pd.DataFrame:
    """TransE link-prediction metrics fixture: serial triples -> the shared
    holdout/train/rank spec (stages/graph.transe_eval_serial) in one
    process — a hash match proves the distributed holdout split, training
    loop AND integer rank-histogram merge."""
    from .stages.graph import transe_eval_serial

    trip = serial_triples_df(docs)
    return transe_eval_serial(trip[["subj", "pred", "obj"]])


def serial_pagerank_df(docs: Dict[str, str]) -> pd.DataFrame:
    """PageRank fixture: serial triples -> pandas edge weights -> the
    shared deterministic iteration (stages/graph.pagerank). Validates the
    distributed edge-weight aggregation; the iteration itself is shared
    order-deterministic math (edges canonically sorted both paths)."""
    from .stages.graph import pagerank

    trip = serial_triples_df(docs)
    edges = (
        trip.groupby(["subj", "obj"], as_index=False)
        .agg(n=("doc_id", "count"))
        .sort_values(["subj", "obj"])
        .reset_index(drop=True)
    )
    edges["n"] = edges["n"].astype("int64")
    return pagerank(edges).sort_values("node").reset_index(drop=True)


def serial_pq_topk_df(
    vec_ids: np.ndarray,
    embeddings: np.ndarray,
    query_positions,
    k: int = 5,
    m_sub: int = 8,
    ksub: int = 16,
    sample_size: int = 2048,
    iters: int = 10,
    seed: int = 13,
) -> pd.DataFrame:
    """Product-quantization ADC fixture: the same deterministic per-
    subspace k-means spec as stages/similarity.train_pq_codebooks re-run
    serially, then FULL-corpus ADC scoring and one global sort per query
    (no Ray, no batch partial-top-k merge) — independent of the engine's
    local-topk/merge path, same total order (score desc, vec_id asc)."""

    def norm(m):
        n = np.linalg.norm(m, axis=1, keepdims=True)
        n[n == 0] = 1.0
        return m / n

    m64 = norm(embeddings.astype(np.float64))
    dim = m64.shape[1]
    dsub = dim // m_sub
    sample = m64[:sample_size]
    rng = np.random.default_rng(seed)
    books = np.empty((m_sub, ksub, dsub), dtype=np.float64)
    for j in range(m_sub):
        sub = sample[:, j * dsub : (j + 1) * dsub]
        cb = sub[rng.choice(len(sub), size=min(ksub, len(sub)), replace=False)].copy()
        for _ in range(iters):
            d = ((sub[:, None, :] - cb[None, :, :]) ** 2).sum(axis=2)
            assign = np.argmin(d, axis=1)
            for c in range(len(cb)):
                members = sub[assign == c]
                if len(members):
                    cb[c] = members.mean(axis=0)
        books[j, : len(cb)] = cb
        if len(cb) < ksub:
            books[j, len(cb) :] = cb[-1]

    rows = []
    for qpos in query_positions:
        q = m64[vec_ids == qpos][0]
        scores = np.zeros(len(m64), dtype=np.float64)
        for j in range(m_sub):
            sub = m64[:, j * dsub : (j + 1) * dsub]
            d = ((sub[:, None, :] - books[j][None, :, :]) ** 2).sum(axis=2)
            codes = np.argmin(d, axis=1)
            lut = books[j] @ q[j * dsub : (j + 1) * dsub]
            scores += lut[codes]
        order = np.lexsort((vec_ids, -scores))[:k]
        for rank, idx in enumerate(order, start=1):
            rows.append({"query_id": qpos, "vec_id": int(vec_ids[idx]), "rank": rank})
    return (
        pd.DataFrame(rows, columns=["query_id", "vec_id", "rank"])
        .astype("int64")
        .sort_values(["query_id", "rank"])
        .reset_index(drop=True)
    )


def serial_user_hll_df(sf_dir: str) -> pd.DataFrame:
    """Serial mirror of relational.events_user_hll: one single-process HLL
    per event_type over the raw (duplicated) user ids — register max is
    idempotent, so block structure cannot matter."""
    import os

    import pyarrow.parquet as pq

    from .functions.sketch import hll_estimate, hll_registers

    t = pq.read_table(
        os.path.join(sf_dir, "events.parquet"),
        columns=["event_type", "user_id"],
    )
    df = t.to_pandas()
    rows = []
    for et in sorted(df["event_type"].unique()):
        regs = hll_registers(df.loc[df["event_type"] == et, "user_id"].to_numpy())
        rows.append(
            {
                "event_type": et,
                "n_users_est": round(hll_estimate(regs), 2),
                "nonzero_registers": int((regs > 0).sum()),
            }
        )
    return pd.DataFrame(rows).astype({"nonzero_registers": "int64"})


def serial_kcore_df(docs: Dict[str, str]) -> pd.DataFrame:
    """Serial k-core fixture: naive per-doc co-occurrence edges (>= 2
    co-docs) + ITERATED-DELETION core numbers — for each k ascending,
    repeatedly delete nodes of degree < k until stable; a node's core is
    the last k it survived. Independent of the engine's single-pass
    peel."""
    compiled = compile_patterns(fit_patterns(DEFAULT_LEXICON))
    pair_docs: Dict[Tuple[str, str], int] = {}
    for text in docs.values():
        ents = sorted(
            {f"{et}:{surf}" for _i, et, _s, _e, surf in naive_dict_ner(text, compiled)}
        )
        for i, a in enumerate(ents):
            for b in ents[i + 1:]:
                pair_docs[(a, b)] = pair_docs.get((a, b), 0) + 1
    edges = [(a, b) for (a, b), n in pair_docs.items() if n >= 2 and a != b]
    nodes = sorted({v for e in edges for v in e})
    core = {v: 0 for v in nodes}
    k = 1
    alive = set(nodes)
    while alive:
        # compute the k-core by iterated deletion
        sub = set(alive)
        changed = True
        while changed:
            deg: Dict[str, int] = {v: 0 for v in sub}
            for a, b in edges:
                if a in sub and b in sub:
                    deg[a] += 1
                    deg[b] += 1
            drop = {v for v in sub if deg[v] < k}
            changed = bool(drop)
            sub -= drop
        for v in sub:
            core[v] = k
        alive = sub
        k += 1
    return pd.DataFrame(
        {"node": nodes, "core": pd.Series([core[v] for v in nodes], dtype="int64")}
    ).sort_values("node").reset_index(drop=True)


def serial_random_walks_df(docs: Dict[str, str]) -> pd.DataFrame:
    """Serial mirror of graph.random_walks over the naive co-occurrence
    edges (>= 2 co-docs): same md5 hop rule, plain dict adjacency."""
    import hashlib

    compiled = compile_patterns(fit_patterns(DEFAULT_LEXICON))
    pair_docs: Dict[Tuple[str, str], int] = {}
    for text in docs.values():
        ents = sorted(
            {f"{et}:{surf}" for _i, et, _s, _e, surf in naive_dict_ner(text, compiled)}
        )
        for i, a in enumerate(ents):
            for b in ents[i + 1:]:
                pair_docs[(a, b)] = pair_docs.get((a, b), 0) + 1
    adj: Dict[str, list] = {}
    for (a, b), n in pair_docs.items():
        if n >= 2 and a != b:
            adj.setdefault(a, []).append(b)
            adj.setdefault(b, []).append(a)
    adj = {v: sorted(set(ns)) for v, ns in adj.items()}
    rows = []
    for s in sorted(adj):
        for w in range(2):
            cur = s
            path = [cur]
            for step in range(4):
                ns = adj.get(cur)
                if not ns:
                    break
                key = f"{s}\x00{w}\x00{step}\x00{cur}".encode("utf-8")
                pick = int.from_bytes(hashlib.md5(key).digest()[:8], "big") % len(ns)
                cur = ns[pick]
                path.append(cur)
            rows.append({"start": s, "walk_idx": w, "path": "|".join(path)})
    return pd.DataFrame(rows).astype({"walk_idx": "int64"})


def serial_kmeans_df(vec_ids: np.ndarray, emb: np.ndarray) -> pd.DataFrame:
    """Single-process mirror of similarity.kmeans_full (k=8, 3 Lloyd
    rounds, lowest-id init, euclidean lowest-cell-tie assignment)."""
    order = np.argsort(vec_ids)
    ids = vec_ids[order]
    m = emb[order].astype(np.float64)
    cent = m[ids < 8][np.argsort(ids[ids < 8])]
    for _ in range(3):
        d2 = ((m[:, None, :] - cent[None, :, :]) ** 2).sum(axis=2)
        assign = d2.argmin(axis=1)
        new = cent.copy()
        for c in range(len(cent)):
            members = m[assign == c]
            if len(members):
                new[c] = members.mean(axis=0)
        cent = new
    rows = []
    for c in range(len(cent)):
        for dim in range(cent.shape[1]):
            rows.append((c, dim, round(cent[c, dim], 6)))
    return pd.DataFrame(rows, columns=["cell", "dim", "c"]).astype(
        {"cell": "int64", "dim": "int64"}
    )


def serial_logreg_df(vec_ids: np.ndarray, emb: np.ndarray) -> pd.DataFrame:
    """Single-process mirror of similarity.logreg_full_batch (5 epochs,
    lr 0.5, labels vec_id % 2, bias last)."""
    m = emb.astype(np.float64)
    y = (vec_ids.astype(np.int64) % 2).astype(np.float64)
    w = np.zeros(m.shape[1] + 1)
    for _ in range(5):
        z = m @ w[:-1] + w[-1]
        pr = 1.0 / (1.0 + np.exp(-z))
        err = pr - y
        g = np.concatenate([m.T @ err, [err.sum()]])
        w = w - 0.5 * g / len(y)
    return pd.DataFrame(
        {"idx": np.arange(len(w), dtype=np.int64), "w": np.round(w, 6)}
    )


def serial_mention_overlaps_df(docs: Dict[str, str]) -> pd.DataFrame:
    """Serial mirror of queries.kg_mention_overlaps: naive per-doc O(n^2)
    interval-overlap loop over the dictionary NER mentions."""
    compiled = compile_patterns(fit_patterns(DEFAULT_LEXICON))
    counts: Dict[Tuple[str, str], int] = {}
    for text in docs.values():
        ms = naive_dict_ner(text, compiled)
        ms = sorted(ms, key=lambda m: (m[2], m[3], m[0]))
        for i in range(len(ms)):
            for j in range(i + 1, len(ms)):
                if ms[i][2] < ms[j][3] and ms[j][2] < ms[i][3]:
                    a, b = sorted((ms[i][1], ms[j][1]))
                    counts[(a, b)] = counts.get((a, b), 0) + 1
    rows = [(a, b, n) for (a, b), n in sorted(counts.items())]
    return pd.DataFrame(rows, columns=["type_a", "type_b", "n"]).astype(
        {"n": "int64"}
    )


def serial_f2_df(doc_ids: List, texts: List[str]) -> pd.DataFrame:
    """Serial mirror of queries.docs_f2_sketch: one global token count,
    one AMS fold, exact sum of squares."""
    from .functions.sketch import ams_f2_estimate, ams_f2_partial

    counts: Dict[str, int] = {}
    for t in texts:
        for w in (t or "").lower().split():
            counts[w] = counts.get(w, 0) + 1
    dot = ams_f2_partial(counts)
    est = ams_f2_estimate(dot)
    exact = float(sum(c * c for c in counts.values()))
    return pd.DataFrame(
        {"metric": ["f2_ams", "f2_exact"],
         "value": [round(est, 2), round(exact, 2)]}
    )


def serial_label_prop_df(docs: Dict[str, str]) -> pd.DataFrame:
    """Label-propagation fixture: serial triples -> pandas edge weights ->
    the shared deterministic synchronous LPA (stages/graph
    .label_propagation). Validates the distributed edge-weight
    aggregation, exactly like serial_pagerank_df."""
    from .stages.graph import label_propagation

    trip = serial_triples_df(docs)
    edges = (
        trip.groupby(["subj", "obj"], as_index=False)
        .agg(n=("doc_id", "count"))
        .sort_values(["subj", "obj"])
        .reset_index(drop=True)
    )
    edges["n"] = edges["n"].astype("int64")
    return label_propagation(edges).sort_values("node").reset_index(drop=True)


def serial_cm_profile_df(doc_ids: List, texts: List[str], w: int = 256,
                         d: int = 4, k: int = 10) -> pd.DataFrame:
    """Serial mirror of queries.docs_cm_profile: one global token count,
    ONE Count-Min fold (linearity makes this exactly equal to the
    distributed block-partial sum), exact top-k with CM estimates."""
    from .functions.sketch import cm_partial, cm_query

    counts: Dict[str, int] = {}
    for t in texts:
        for wd in (t or "").lower().split():
            counts[wd] = counts.get(wd, 0) + 1
    top = sorted(counts.items(), key=lambda kv: (-kv[1], kv[0]))[:k]
    toks = [t for t, _ in top]
    mat = cm_partial(counts, w, d)
    return pd.DataFrame(
        {
            "token": toks,
            "n_exact": np.array([c for _, c in top], dtype="int64"),
            "n_cm": cm_query(mat, toks).astype("int64"),
        }
    )


def serial_hll_overlap_df(sf_dir: str) -> pd.DataFrame:
    """Serial mirror of relational.events_hll_overlap: single-process HLL
    per type + exact pandas pair overlap; register max idempotence makes
    the global fold equal the distributed merge bit-for-bit."""
    import os

    import pyarrow.parquet as pq

    from .functions.sketch import hll_estimate, hll_registers

    df = pq.read_table(
        os.path.join(sf_dir, "events.parquet"), columns=["event_type", "user_id"]
    ).to_pandas()
    types = sorted(df["event_type"].unique())
    regs = {
        et: hll_registers(df.loc[df["event_type"] == et, "user_id"].to_numpy())
        for et in types
    }
    ests = {et: hll_estimate(r) for et, r in regs.items()}
    users = {et: set(df.loc[df["event_type"] == et, "user_id"]) for et in types}
    rows = []
    for i in range(len(types)):
        for j in range(i + 1, len(types)):
            a, b = types[i], types[j]
            n_exact = len(users[a] & users[b])
            if n_exact == 0:
                continue
            union = hll_estimate(np.maximum(regs[a], regs[b]))
            rows.append(
                {"type_a": a, "type_b": b, "n_exact": n_exact,
                 "n_est": round(max(ests[a] + ests[b] - union, 0.0), 2)}
            )
    out = pd.DataFrame(rows, columns=["type_a", "type_b", "n_exact", "n_est"])
    out["n_exact"] = out["n_exact"].astype("int64")
    return out.sort_values(["type_a", "type_b"]).reset_index(drop=True)


def serial_cusum_df(sf_dir: str) -> pd.DataFrame:
    """Serial mirror of relational.events_cusum: pandas daily counts +
    the identical clamped-recurrence scan."""
    import os

    import pyarrow.parquet as pq

    df = pq.read_table(
        os.path.join(sf_dir, "events.parquet"), columns=["event_type", "ts"]
    ).to_pandas()
    df["day"] = df["ts"].dt.floor("D")
    daily = df.groupby(["event_type", "day"]).size().reset_index(name="n")
    rows = []
    for et, grp in daily.groupby("event_type"):
        grp = grp.sort_values("day")
        x = grp["n"].to_numpy(np.float64)
        mean = x.mean()
        s, best, best_i = 0.0, -1.0, 0
        for i, v in enumerate(x):
            s = max(0.0, s + (v - mean))
            if s > best:
                best, best_i = s, i
        rows.append(
            {"event_type": et, "max_cusum": round(best, 4),
             "peak_day": str(grp["day"].iloc[best_i].date())}
        )
    out = pd.DataFrame(rows, columns=["event_type", "max_cusum", "peak_day"])
    return out.sort_values("event_type").reset_index(drop=True)


def serial_join_size_df(sf_dir: str) -> pd.DataFrame:
    """Serial mirror of relational.orders_lineitem_join_size: global key
    counts per side, one AGMS fold each, exact product-sum."""
    import os

    import pyarrow.parquet as pq

    from .functions.sketch import ams_f2_partial, ams_join_estimate

    o = pq.read_table(
        os.path.join(sf_dir, "orders.parquet"), columns=["o_orderkey"]
    ).to_pandas()["o_orderkey"].value_counts(sort=False)
    l = pq.read_table(
        os.path.join(sf_dir, "lineitem.parquet"), columns=["l_orderkey"]
    ).to_pandas()["l_orderkey"].value_counts(sort=False)
    est = ams_join_estimate(
        ams_f2_partial({str(k): int(v) for k, v in o.items()}),
        ams_f2_partial({str(k): int(v) for k, v in l.items()}),
    )
    common = o.index.intersection(l.index)
    exact = float((o.loc[common] * l.loc[common]).sum())
    return pd.DataFrame(
        {"metric": ["join_size_ams", "join_size_exact"],
         "value": [round(est, 2), round(exact, 2)]}
    )


def serial_linkpred_auc_df(docs: Dict[str, str]) -> pd.DataFrame:
    """Serial mirror of queries.kg_linkpred_auc: naive co-occurrence
    edges (n >= 2, like serial_kcore_df), the identical md5 holdout,
    set-math neighbor Jaccard on the train graph (rounded to 6 dp like
    the distributed wedge pass), shared ranked_auc."""
    import hashlib as _hl

    from .stages.graph import ranked_auc

    compiled = compile_patterns(fit_patterns(DEFAULT_LEXICON))
    pair_docs: Dict[Tuple[str, str], int] = {}
    for text in docs.values():
        ents = sorted(
            {f"{et}:{surf}" for _i, et, _s, _e, surf in naive_dict_ner(text, compiled)}
        )
        for i, a in enumerate(ents):
            for b in ents[i + 1:]:
                pair_docs[(a, b)] = pair_docs.get((a, b), 0) + 1
    edges = sorted((a, b) for (a, b), n in pair_docs.items() if n >= 2 and a != b)
    empty = pd.DataFrame(
        {"n_pos": pd.Series([], dtype="int64"),
         "n_neg": pd.Series([], dtype="int64"),
         "auc": pd.Series([], dtype="float64")}
    )
    if not edges:
        return empty
    test = [
        e for e in edges
        if int(_hl.md5(f"{e[0]}|{e[1]}".encode()).hexdigest()[:8], 16) % 5 == 0
    ]
    train = [e for e in edges if e not in set(test)]
    if not test or not train:
        return empty
    nbrs: Dict[str, set] = {}
    for a, b in train:
        nbrs.setdefault(a, set()).add(b)
        nbrs.setdefault(b, set()).add(a)
    node_set = set(nbrs)
    nodes = sorted(node_set)

    def score(a: str, b: str) -> float:
        na, nb = nbrs.get(a, set()), nbrs.get(b, set())
        i = len(na & nb)
        if i == 0:
            return 0.0
        return round(i / len(na | nb), 6)

    all_edges = set(edges)
    pos = [score(a, b) for a, b in test if a in node_set and b in node_set]
    neg = [
        score(a, b)
        for i, a in enumerate(nodes)
        for b in nodes[i + 1:]
        if (a, b) not in all_edges
    ]
    auc = ranked_auc(pos, neg)
    return pd.DataFrame(
        {"n_pos": np.array([len(pos)], dtype="int64"),
         "n_neg": np.array([len(neg)], dtype="int64"),
         "auc": [round(auc, 6)]}
    )


def serial_phash_dup_df(sf_dir: str) -> pd.DataFrame:
    """Serial mirror of queries.media_phash_dup: same synth media + the
    shared 1-byte-flip injection, per-item aHash via the SAME
    perceptual_hash/stub decode, exhaustive O(n^2) hamming <= 2."""
    from .pipelines.queries import _perturbed_media, media_path
    from .stages.multimodal import MediaFeaturizer, perceptual_hash

    import pyarrow.parquet as pq

    t = pq.read_table(media_path(sf_dir), columns=["media_id", "payload"])
    t = _perturbed_media(t)
    feat = MediaFeaturizer(decoder="fake")
    ids = t["media_id"].to_pylist()
    ph = {
        m: perceptual_hash(feat._fake_decode(p))
        for m, p in zip(ids, t["payload"].to_pylist())
    }
    ids = sorted(ids)
    rows = []
    for i in range(len(ids)):
        for j in range(i + 1, len(ids)):
            h = bin(ph[ids[i]] ^ ph[ids[j]]).count("1")
            if h <= 2:
                rows.append(
                    {"media_a": ids[i], "media_b": ids[j], "hamming": h}
                )
    out = pd.DataFrame(rows, columns=["media_a", "media_b", "hamming"])
    out["hamming"] = out["hamming"].astype("int64")
    return out.sort_values(["media_a", "media_b"]).reset_index(drop=True)


def serial_ppr_df(docs: Dict[str, str]) -> pd.DataFrame:
    """PPR fixture: serial triples -> pandas edge weights -> the shared
    deterministic restart iteration (stages/graph.personalized_pagerank),
    seeded at the smallest subject — mirror of serial_pagerank_df."""
    from .stages.graph import personalized_pagerank

    trip = serial_triples_df(docs)
    edges = (
        trip.groupby(["subj", "obj"], as_index=False)
        .agg(n=("doc_id", "count"))
        .sort_values(["subj", "obj"])
        .reset_index(drop=True)
    )
    edges["n"] = edges["n"].astype("int64")
    if edges.empty:
        return pd.DataFrame(
            {"node": pd.Series([], dtype=str),
             "rank": pd.Series([], dtype="float64")}
        )
    seed = edges["subj"].min()
    return (
        personalized_pagerank(edges, seed)
        .sort_values("node")
        .reset_index(drop=True)
    )


def serial_partition_skew_df(sf_dir: str, num_partitions: int = 64) -> pd.DataFrame:
    """Serial mirror of queries.docs_partition_skew: the identical
    add_hash_partition over the whole table in one process."""
    import os

    import pyarrow.parquet as pq

    from .functions.partitioning import add_hash_partition

    t = pq.read_table(os.path.join(sf_dir, "documents.parquet"), columns=["doc_id"])
    part = add_hash_partition(t, ["doc_id"], num_partitions)["_part"]
    counts = np.bincount(np.asarray(part), minlength=num_partitions).astype(np.int64)
    mean = counts.mean()
    return pd.DataFrame(
        {
            "n_partitions": np.array([num_partitions], dtype="int64"),
            "n_rows": np.array([int(counts.sum())], dtype="int64"),
            "occupied": np.array([int((counts > 0).sum())], dtype="int64"),
            "max_rows": np.array([int(counts.max())], dtype="int64"),
            "min_rows": np.array([int(counts.min())], dtype="int64"),
            "skew_ratio": [round(float(counts.max() / mean), 4)],
            "cv": [round(float(counts.std() / mean), 4)],
        }
    )


def serial_betweenness_df(docs: Dict[str, str]) -> pd.DataFrame:
    """Betweenness fixture: serial triples -> edge weights -> the shared
    deterministic Brandes accumulation (stages/graph.betweenness_approx),
    mirror of serial_pagerank_df."""
    from .stages.graph import betweenness_approx

    trip = serial_triples_df(docs)
    edges = (
        trip.groupby(["subj", "obj"], as_index=False)
        .agg(n=("doc_id", "count"))
        .sort_values(["subj", "obj"])
        .reset_index(drop=True)
    )
    edges["n"] = edges["n"].astype("int64")
    return betweenness_approx(edges).sort_values("node").reset_index(drop=True)


def serial_heaps_df(sf_dir: str, checkpoints: int = 20) -> pd.DataFrame:
    """Serial mirror of queries.docs_heaps_fit: one sequential scan in
    doc_id order tracking (cumulative tokens, cumulative vocabulary),
    identical checkpoint selection and centered ln-ln OLS."""
    import os

    import pyarrow.parquet as pq

    t = pq.read_table(
        os.path.join(sf_dir, "documents.parquet"), columns=["doc_id", "text"]
    ).to_pandas().sort_values("doc_id")
    seen: set = set()
    n_cum, v_cum = [], []
    n = 0
    for txt in t["text"]:
        words = [w for w in (txt or "").lower().split() if w]
        n += len(words)
        seen.update(words)
        n_cum.append(n)
        v_cum.append(len(seen))
    n_cum = np.asarray(n_cum, dtype=np.int64)
    v_cum = np.asarray(v_cum, dtype=np.int64)
    idx = np.unique(
        np.linspace(0, len(n_cum) - 1, min(checkpoints, len(n_cum))).astype(int)
    )
    x = np.log(n_cum[idx].astype(np.float64))
    y = np.log(v_cum[idx].astype(np.float64))
    dx, dy = x - x.mean(), y - y.mean()
    beta = float((dx * dy).sum() / (dx * dx).sum())
    k = float(np.exp(y.mean() - beta * x.mean()))
    return pd.DataFrame(
        {
            "n_checkpoints": np.array([len(idx)], dtype="int64"),
            "vocab_final": np.array([int(v_cum[-1])], dtype="int64"),
            "tokens_final": np.array([int(n_cum[-1])], dtype="int64"),
            "beta": [round(beta, 6)],
            "k": [round(k, 4)],
        }
    )


def serial_cdc_dedup_df(sf_dir: str, boundary_mod: int = 64,
                        min_chunk: int = 16) -> pd.DataFrame:
    """Serial mirror of queries.docs_cdc_dedup with an INDEPENDENT
    per-byte gear-hash implementation (the distributed side uses the
    64-tap vectorized unrolling — agreement checks the algebra)."""
    import hashlib
    import os

    import pyarrow.parquet as pq

    t = pq.read_table(
        os.path.join(sf_dir, "documents.parquet"), columns=["doc_id", "text"]
    ).to_pandas()
    texts = [x or "" for x in t["text"]]
    texts += ["PREFIX " + txt for i, txt in zip(t["doc_id"], t["text"])
              if int(i) % 4 == 0]
    gear = [
        ((b * 0x9E3779B97F4A7C15) ^ (b >> 3)) & 0xFFFFFFFFFFFFFFFF
        for b in range(256)
    ]
    sizes: dict = {}
    n_total = bytes_total = 0
    for txt in texts:
        data = txt.encode("utf-8")
        h, start = 0, 0
        chunks = []
        for i, b in enumerate(data):
            h = ((h << 1) + gear[b]) & 0xFFFFFFFFFFFFFFFF
            if i - start + 1 >= min_chunk and h % boundary_mod == 0:
                chunks.append(data[start:i + 1])
                start = i + 1
        if start < len(data):
            chunks.append(data[start:])
        for c in chunks:
            n_total += 1
            bytes_total += len(c)
            sizes[hashlib.md5(c).hexdigest()] = len(c)
    bytes_distinct = sum(sizes.values())
    return pd.DataFrame(
        {
            "n_total": np.array([n_total], dtype="int64"),
            "n_distinct": np.array([len(sizes)], dtype="int64"),
            "bytes_total": np.array([bytes_total], dtype="int64"),
            "bytes_distinct": np.array([bytes_distinct], dtype="int64"),
            "dedup_ratio": [round(bytes_total / max(bytes_distinct, 1), 6)],
        }
    )
