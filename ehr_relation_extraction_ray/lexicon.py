"""Entity lexicon and the dictionary/regex NER model state.

Reproduces the reference's rule-based NER (``rule_based_ner/dict_ner.py``):

* ``fit``: per entity type, the list of distinct lowercase surfaces with
  ``len > 1`` (``dict_ner.py:63-72``) is turned into one alternation regex
  where every surface must be delimited by a single char from the class
  ``[\\n| |\\t]`` on both sides (``dict_ner.py:32-46`` — note the class
  literally contains ``|``, a reference quirk we keep).
* ``Strength`` is always the fixed pattern ``\\d+[ ]*(?:mg|mcg)``
  (``dict_ner.py:78``).
* ``predict``: non-overlapping ``re.finditer`` with ``IGNORECASE`` per type,
  emitted range is ``(m.start()+1, m.end()-1)`` — the bounding delimiter
  chars are stripped (``dict_ner.py:103-115``). Scans per type are
  independent, so overlaps *across* types are allowed, and two adjacent
  occurrences sharing one delimiter char miss the second match (finditer
  consumed the delimiter) — also reference behavior.

The fitted state is a small dict of compiled patterns: it is broadcast to
every mention-detection actor via its constructor (SURVEY.md A4), never
re-built per batch.
"""

from __future__ import annotations

import re
from typing import Dict, Iterable, List, Tuple

# Reference escape list, dict_ner.py:32 (deliberately not re.escape: parity).
_REGEX_CHARS = ["(", ")", "[", "]", "{", "}", "+", "*", "?", "$", "^", "&"]

STRENGTH_PATTERN = r"\d+[ ]*(?:mg|mcg)"


def clean_alternation(surfaces: List[str]) -> str:
    """Build the delimited alternation regex (dict_ner.py:17-46 parity)."""
    escaped = []
    for surface in surfaces:
        for char in _REGEX_CHARS:
            surface = surface.replace(char, "\\" + char)
        escaped.append(surface)
    body = "[\n| |\t]|[\n| |\t]".join(escaped)
    return "[\n| |\t]" + body + "[\n| |\t]"


def fit_patterns(
    surfaces_by_type: Dict[str, Iterable[str]]
) -> Dict[str, str]:
    """Fit the per-type regexes from (ent_type -> surfaces).

    Mirrors ``DictNER.fit`` (dict_ner.py:48-80): lowercase, dedup preserving
    order, drop len<=1, Strength overridden by the fixed numeric pattern.
    """
    patterns: Dict[str, str] = {}
    for ent_type, surfaces in surfaces_by_type.items():
        if ent_type == "Strength":
            continue
        seen: List[str] = []
        for s in surfaces:
            low = s.lower()
            if len(s) > 1 and low not in seen:
                seen.append(low)
        if seen:
            patterns[ent_type] = clean_alternation(seen)
    patterns["Strength"] = STRENGTH_PATTERN
    return patterns


_TYPE_NAME_RE = re.compile(r"\w+\Z")


def compile_patterns(patterns: Dict[str, str]) -> Dict[str, "re.Pattern[str]"]:
    """Compile (type -> regex). Type names must match ``\w+``: the RE
    mask embeds them verbatim as ``@Type$`` markers and the surrogate
    scorer / fast-path proof parse them back with ``@\w+\$``
    (functions/rescore._MARKER_RE) — a name with '-', ' ' or '.' would
    make the exact scorer and the gap_len fast path silently disagree
    on the SAME candidate. Fail loudly here, at the source."""
    bad = [t for t in patterns if not _TYPE_NAME_RE.match(t)]
    if bad:
        raise ValueError(
            f"entity type name(s) {bad!r} are not \\w+ — the @Type$ "
            "marker format requires word characters only (use e.g. "
            "'Lab_Value' instead of 'Lab-Value')."
        )
    return {t: re.compile(p, re.IGNORECASE) for t, p in patterns.items()}


def find_mentions(
    text: str, compiled: Dict[str, "re.Pattern[str]"]
) -> List[Tuple[str, int, int]]:
    """All dictionary matches in one document.

    Returns ``(ent_type, start, end)`` with the ``(m.start()+1, m.end()-1)``
    trim of dict_ner.py:106 applied uniformly — it strips the delimiter chars
    for dictionary types, and (reference quirk kept for parity) clips the
    first digit and final unit char off Strength matches, whose pattern has
    no delimiters (dict_ner.py:78).
    """
    out: List[Tuple[str, int, int]] = []
    for ent_type, pat in compiled.items():
        for m in pat.finditer(text):
            out.append((ent_type, m.start(0) + 1, m.end(0) - 1))
    return out


# ---------------------------------------------------------------------------
# Fast dictionary matcher: token-n-gram hash lookup replacing the per-type
# alternation-regex scan, with finditer's consumption semantics simulated
# exactly (dict_ner.py:103-115 parity — see find_mentions).  The regex path
# above stays as the reference implementation, the per-type fallback for
# ineligible surfaces, and the whole-doc fallback for non-ASCII text.
# ---------------------------------------------------------------------------

_DELIMS = "\n| \t"  # the [\n| |\t] class, dict_ner.py:32-46 (| is literal)
_TOKEN_RE = re.compile(r"[^\n| \t]+")
# regex metacharacters the reference does NOT escape (dict_ner.py:32 list
# misses them): a surface containing one has non-literal regex semantics,
# so its whole type must use the regex path.
_UNESCAPED_META = (".", "\\", "|")
_POLY = 1099511628211

# Non-ASCII chars that interact with ASCII surfaces under re.IGNORECASE or
# break char-offset preservation under str.lower().  Enumerated empirically
# over ALL of Unicode (py3.11): re.I treats exactly İı ſ K (U+0130/0131/
# 017F/212A) as equivalent to ascii i/s/k; the rest are the conservative
# closure of chars whose lower() is not length-1 or whose casefold()
# contains an ASCII char (ß, ŉ, ǰ, ẖẗẘẙẚẞ, ﬀ-ﬆ ligatures).  A document
# containing ANY of these falls back to the regex path; every other
# non-ASCII char is inert (tokenizes and case-lowers independently of the
# ASCII-only surfaces).
_HAZARD_RE = re.compile(
    "[ßİıŉſǰẖẗẘẙẚ"
    "ẞKﬀ-ﬆ]"
)

# a non-ASCII decimal digit (str-mode \\d matches all Unicode Nd): the
# Strength pattern runs in bytes mode on the fast path, so such a doc must
# take the regex path instead.  Combined with the case-fold hazards into
# ONE scan (eligibility costs one regex pass per non-ASCII doc).
_NONASCII_HAZARD_RE = re.compile(
    "(?:%s|(?![0-9])\\d)" % _HAZARD_RE.pattern
)
_STRENGTH_BYTES_RE = re.compile(rb"\d+[ ]*(?:mg|mcg)")


def _ngram_poly(word_hashes, n):
    """Polynomial n-gram combine of 64-bit word hashes (same scheme as
    dedupe.word_shingle_hashes): h(i) = sum_d wh[i+d] * P^d (uint64 wrap)."""
    import numpy as np

    if len(word_hashes) < n:
        return np.zeros(0, dtype=np.uint64)
    from numpy.lib.stride_tricks import sliding_window_view

    with np.errstate(over="ignore"):
        powers = np.uint64(_POLY) ** np.arange(n, dtype=np.uint64)
        win = sliding_window_view(word_hashes, n)
        return (win * powers[None, :]).sum(axis=1, dtype=np.uint64)


# modular inverse of the polynomial base (P is odd, so invertible mod 2^64):
# lets the segmented word hash read each word's position-independent value
# out of ONE global prefix sum instead of per-word Python slices.
_POLY_INV = pow(_POLY, -1, 1 << 64)


def _word_hash_bytes(bs: bytes) -> int:
    """Position-independent byte polynomial + length fold — the scalar
    reference of the vectorized per-word hash in find_batch (surfaces are
    hashed with this at build time; the two MUST stay identical)."""
    h = 0
    p = 1
    for b in bs:
        h = (h + b * p) & 0xFFFFFFFFFFFFFFFF
        p = (p * _POLY) & 0xFFFFFFFFFFFFFFFF
    return (h * _POLY + len(bs)) & 0xFFFFFFFFFFFFFFFF


class DictMatcher:
    """Drop-in accelerator for ``find_mentions(text, compiled)`` when the
    patterns come from surface lists (``fit_patterns`` input): tokenise the
    document once on the delimiter class, hash lowercased tokens
    (vectorised across the whole batch), look token n-grams up in a
    per-length hash table, verify candidates by raw char-span equality,
    then replay finditer's left-to-right non-overlapping consumption per
    type (earliest start wins; at equal start the earliest surface in
    lexicon order wins; the trailing delimiter is consumed, so an adjacent
    match sharing it is skipped — all reference quirks, dict_ner.py:103-115).

    Exactness boundaries (each with an automatic regex fallback):
      * a surface containing an unescaped regex metacharacter (., \\, |),
        a leading/trailing delimiter char, no token chars, or non-ASCII
        text routes its WHOLE TYPE to the compiled-regex path (consumption
        couples all surfaces of a type, so fallback is per type);
      * a document containing a case-fold hazard char (see _HAZARD_RE —
        e.g. 'ſ', which re.IGNORECASE folds to 's' but str.lower does not,
        or 'İ', whose lower() is two chars) routes entirely to the regex
        path; every other non-ASCII char is inert w.r.t. ASCII surfaces;
      * ``Strength`` always runs its numeric regex (dict_ner.py:78).

    ``tests/test_dict_matcher.py`` pins equality against ``find_mentions``
    on adversarial corpora (adjacency, '|' and tab delimiters, mixed case,
    metacharacter surfaces, non-ASCII docs).
    """

    def __init__(self, surfaces_by_type: Dict[str, Iterable[str]]):
        import numpy as np

        patterns = fit_patterns(surfaces_by_type)
        self._compiled = compile_patterns(patterns)
        # per-type plan, in the exact dict order of the compiled patterns
        self.plan: List[Tuple[str, "re.Pattern[str] | None"]] = []
        # n -> (sorted hash array, {hash: [(type, order, surface_lower, n)]})
        tables: Dict[int, Dict[int, list]] = {}

        fast_surfaces: Dict[str, List[str]] = {}
        for ent_type in patterns:
            if ent_type == "Strength":
                self.plan.append((ent_type, self._compiled[ent_type]))
                continue
            # reproduce fit_patterns' surface list (lowercase dedup
            # preserving order, len > 1)
            seen: List[str] = []
            for s in surfaces_by_type.get(ent_type, []):
                low = s.lower()
                if len(s) > 1 and low not in seen:
                    seen.append(low)
            eligible = all(
                s.isascii()
                and not any(ch in s for ch in _UNESCAPED_META)
                and s[0] not in _DELIMS
                and s[-1] not in _DELIMS
                and _TOKEN_RE.search(s)
                for s in seen
            )
            if not eligible:
                self.plan.append((ent_type, self._compiled[ent_type]))
                continue
            fast_surfaces[ent_type] = seen
            self.plan.append((ent_type, None))

        self._tables: Dict[int, tuple] = {}
        # position-only power tables, grown lazily in _scan_chunk
        import numpy as _np

        self._ppow_cache = _np.empty(0, dtype=_np.uint64)
        self._pinv_cache = _np.empty(0, dtype=_np.uint64)
        raw: Dict[int, Dict[int, list]] = {}
        # plan position per fast type (output/sort order)
        self._type_pos: Dict[str, int] = {
            t: i for i, (t, pat) in enumerate(self.plan) if pat is None
        }
        for ent_type, seen in fast_surfaces.items():
            for order, s in enumerate(seen):
                toks = _TOKEN_RE.findall(s)
                h = 0
                for d, tok in enumerate(toks):
                    h = (
                        h
                        + _word_hash_bytes(tok.encode("ascii"))
                        * pow(_POLY, d, 1 << 64)
                    ) & 0xFFFFFFFFFFFFFFFF
                raw.setdefault(len(toks), []).append(
                    (
                        ent_type,
                        order,
                        np.frombuffer(s.encode("ascii"), dtype=np.uint8),
                        np.uint64(h),
                    )
                )
        for n, entries in raw.items():
            self._tables[n] = (
                np.sort(np.array([e[3] for e in entries], dtype=np.uint64)),
                entries,
            )

    def find(self, text: str) -> List[Tuple[str, int, int]]:
        return self.find_batch([text])[0]

    # docs are scanned in byte-budgeted chunks: the prefix-sum/cumprod
    # tables are 8 B/byte each, and keeping them cache-resident measures
    # ~3x faster than one giant pass over a multi-MB batch
    _CHUNK_BYTES = 1 << 20

    def find_batch(
        self, texts: List["str | None"]
    ) -> List[List[Tuple[str, int, int]]]:
        out: List = [None] * len(texts)
        fast: List[int] = []
        for j, t in enumerate(texts):
            t = t or ""
            if not t.isascii() and (
                _NONASCII_HAZARD_RE.search(t) or len(t.lower()) != len(t)
            ):
                out[j] = find_mentions(t, self._compiled)
            else:
                fast.append(j)

        # accepted fast-path matches: (doc j, type) -> list[(start, end)]
        accepted: Dict[tuple, list] = {}
        lo = 0
        while lo < len(fast):
            hi, size = lo, 0
            while hi < len(fast) and (size == 0 or size < self._CHUNK_BYTES):
                size += len(texts[fast[hi]] or "")
                hi += 1
            self._scan_chunk(texts, fast[lo:hi], accepted)
            lo = hi

        for j in fast:
            res: List[Tuple[str, int, int]] = []
            text = texts[j] or ""
            for ent_type, fallback_pat in self.plan:
                if fallback_pat is not None and ent_type != "Strength":
                    for m in fallback_pat.finditer(text):
                        res.append((ent_type, m.start(0) + 1, m.end(0) - 1))
                    continue
                # fast types AND Strength (scanned in bytes per chunk)
                for s, e in accepted.get((j, ent_type), ()):
                    res.append((ent_type, s, e))
            out[j] = res
        return out

    def _scan_chunk(
        self, texts: List, fast: List[int], accepted: Dict[tuple, list]
    ) -> None:
        """One vectorised pass over a chunk of fast-path documents.

        Lowered docs are joined with one '\\n' (itself a delimiter, so
        tokens never span docs); token boundaries, per-word polynomial
        hashes (one prefix sum, rebased by a P^-1 cumprod), n-gram lookup
        and full byte-equality verification all run as numpy kernels. The
        only Python loops left are per SURFACE (~|lexicon|) and per
        OVERLAPPING acceptance segment (the adjacency quirk is rare)."""
        import numpy as np

        enc: List[bytes] = [
            (texts[j] or "").lower().encode("utf-8") for j in fast
        ]
        big = b"\n".join(enc)
        arr = np.frombuffer(big, dtype=np.uint8)
        N = len(arr)
        if not N:
            return
        # doc start/end byte offsets inside `big`
        doc_lens = np.fromiter((len(b) for b in enc), np.int64, len(enc))
        doc_start = np.concatenate(([0], np.cumsum(doc_lens[:-1] + 1)))
        doc_end = doc_start + doc_lens
        # token runs: delimiter bytes are exactly {\n | space \t} and
        # never occur as UTF-8 continuation bytes
        is_tok = (arr != 10) & (arr != 124) & (arr != 32) & (arr != 9)
        prev = np.concatenate(([False], is_tok[:-1]))
        nxt = np.concatenate((is_tok[1:], [False]))
        w_start = np.flatnonzero(is_tok & ~prev)
        w_end = np.flatnonzero(is_tok & ~nxt) + 1
        if not len(w_start):
            return
        # segmented position-independent word hash via ONE prefix sum:
        # sum(b_j * P^j) over the word, rebased by P^-start, then
        # length-folded (must equal _word_hash_bytes). The P^j / P^-j
        # power tables depend only on POSITION, so they are computed once
        # per matcher instance (grown to the largest chunk seen) and
        # sliced per chunk — two fewer cumprod allocations per chunk,
        # which matters under 32-way concurrency.
        with np.errstate(over="ignore"):
            P = np.uint64(_POLY)
            if len(self._ppow_cache) < N:
                ppow = np.full(N, P, dtype=np.uint64)
                ppow[0] = 1
                np.cumprod(ppow, out=ppow)
                pinv_tab = np.full(N, np.uint64(_POLY_INV), dtype=np.uint64)
                pinv_tab[0] = 1
                np.cumprod(pinv_tab, out=pinv_tab)
                self._ppow_cache = ppow
                self._pinv_cache = pinv_tab
            ppow = self._ppow_cache[:N]
            pinv_tab = self._pinv_cache
            pref = np.zeros(N + 1, dtype=np.uint64)
            np.cumsum(arr.astype(np.uint64) * ppow, out=pref[1:])
            seg = pref[w_end] - pref[w_start]
            wh = seg * pinv_tab[w_start]
            wh = wh * P + (w_end - w_start).astype(np.uint64)
        # word -> doc index (into `fast`)
        word_doc_arr = np.searchsorted(doc_start, w_start, side="right") - 1
        # char-offset map: chars(b) = b - #UTF-8 continuation bytes before b
        cont_cum = np.zeros(N + 1, dtype=np.int64)
        np.cumsum((arr & 0xC0) == 0x80, out=cont_cum[1:])
        doc_char_base = doc_start - cont_cum[doc_start]

        # Strength: ONE bytes-mode scan of the joined chunk instead of a
        # finditer per doc ('\n' cannot occur inside \d+[ ]*(?:mg|mcg), so
        # matches never span the separator; eligibility already excluded
        # docs with non-ASCII decimal digits, so bytes-\d == str-\d here)
        if "Strength" in self._compiled:
            ms = [(m.start(), m.end()) for m in _STRENGTH_BYTES_RE.finditer(big)]
            if ms:
                sb = np.array([a for a, _ in ms], dtype=np.int64)
                eb = np.array([b for _, b in ms], dtype=np.int64)
                dk = np.searchsorted(doc_start, sb, side="right") - 1
                base = doc_char_base[dk]
                cs = (sb - cont_cum[sb] - base + 1).tolist()
                ce = (eb - cont_cum[eb] - base - 1).tolist()
                prev_d, rows = -1, None
                for k, dd in enumerate(dk.tolist()):
                    if dd != prev_d:
                        rows = accepted.setdefault((fast[dd], "Strength"), [])
                        prev_d = dd
                    rows.append((cs[k], ce[k]))

        got_doc, got_type, got_order, got_s, got_e = [], [], [], [], []
        got_n = []
        for n, (sorted_h, entries) in self._tables.items():
            gh = _ngram_poly(wh, n)
            if len(gh) == 0:
                continue
            same_doc = word_doc_arr[: len(gh)] == word_doc_arr[n - 1 :]
            idx = np.flatnonzero(same_doc)
            if len(idx) == 0:
                continue
            pos = np.searchsorted(sorted_h, gh[idx])
            pos[pos == len(sorted_h)] = 0
            cand = idx[sorted_h[pos] == gh[idx]]
            if len(cand) == 0:
                continue
            ts_b = w_start[cand]
            te_b = w_end[cand + n - 1]
            dj = word_doc_arr[cand]
            # delimiter required on BOTH sides WITHIN the doc (the joining
            # '\n' must not count: doc-edge tokens can never match, same
            # as the regex)
            ok = (ts_b > doc_start[dj]) & (te_b < doc_end[dj])
            cand, ts_b, te_b, dj = cand[ok], ts_b[ok], te_b[ok], dj[ok]
            if len(cand) == 0:
                continue
            ghc = gh[cand]
            for ent_type, order, surf_np, h in entries:
                sel = np.flatnonzero(ghc == h)
                if not len(sel):
                    continue
                L = len(surf_np)
                sel = sel[(te_b[sel] - ts_b[sel]) == L]
                if not len(sel):
                    continue
                # full byte-equality verify (hash collisions AND
                # inter-word gap bytes, e.g. double spaces or '|')
                win = arr[ts_b[sel][:, None] + np.arange(L)[None, :]]
                sel = sel[(win == surf_np[None, :]).all(axis=1)]
                if not len(sel):
                    continue
                d = dj[sel]
                sb, eb = ts_b[sel], te_b[sel]
                got_doc.append(d)
                got_n.append((self._type_pos[ent_type], order, len(sel)))
                got_s.append((sb - cont_cum[sb]) - doc_char_base[d])
                got_e.append((eb - cont_cum[eb]) - doc_char_base[d])
        if not got_doc:
            return
        d = np.concatenate(got_doc)
        counts = np.array([c for _, _, c in got_n], dtype=np.int64)
        tp = np.repeat(np.array([t for t, _, _ in got_n], np.int64), counts)
        od = np.repeat(np.array([o for _, o, _ in got_n], np.int64), counts)
        cs = np.concatenate(got_s)
        ce = np.concatenate(got_e)
        # finditer replay per (doc, type): earliest start, then lexicon
        # order; an accepted match consumes through its trailing delimiter
        # (match span = [cs-1, ce+1); the emitted trim is then (cs, ce))
        o = np.lexsort((od, cs, tp, d))
        d, tp, od, cs, ce = d[o], tp[o], od[o], cs[o], ce[o]
        seg_change = np.flatnonzero((d[1:] != d[:-1]) | (tp[1:] != tp[:-1])) + 1
        starts = np.concatenate(([0], seg_change))
        ends = np.concatenate((seg_change, [len(d)]))
        plan_types = [t for t, _ in self.plan]
        # global non-overlap test (incl. the shared-delimiter quirk
        # margin: next match start cs-1 must be >= prev match end ce+1);
        # only segments containing a violation pay the sequential walk
        same_seg = np.zeros(len(d), dtype=bool)
        same_seg[1:] = (d[1:] == d[:-1]) & (tp[1:] == tp[:-1])
        viol = same_seg.copy()
        viol[1:] &= cs[1:] - 2 < ce[:-1]
        seg_has_viol = np.logical_or.reduceat(viol, starts)
        cs_l, ce_l = cs.tolist(), ce.tolist()
        for k, (a, b) in enumerate(zip(starts.tolist(), ends.tolist())):
            key = (fast[int(d[a])], plan_types[int(tp[a])])
            if not seg_has_viol[k]:
                accepted.setdefault(key, []).extend(
                    zip(cs_l[a:b], ce_l[a:b])
                )
                continue
            rows = accepted.setdefault(key, [])
            cursor = 0
            for i in range(a, b):
                if cs_l[i] - 1 >= cursor:
                    rows.append((cs_l[i], ce_l[i]))
                    cursor = ce_l[i] + 1


# ---------------------------------------------------------------------------
# Default lexicon: the engine's built-in surfaces per entity type.  These are
# generic drug-chart vocabulary (public knowledge), used both to seed the
# deterministic synthetic transcripts and to fit the surrogate detector, so
# gold mentions are known by construction.  Surfaces deliberately include
# multi-word strings, mixed case, and regex metacharacters to exercise the
# escaping path (dict_ner.py:32-46).
# ---------------------------------------------------------------------------

DEFAULT_LEXICON: Dict[str, List[str]] = {
    "Drug": [
        "aspirin", "metformin", "lisinopril", "atorvastatin", "warfarin",
        "ibuprofen", "amoxicillin", "omeprazole", "gabapentin", "prednisone",
        "insulin glargine", "hydrochlorothiazide", "albuterol", "sertraline",
        "levothyroxine", "clopidogrel", "furosemide", "metoprolol",
        "losartan", "simvastatin", "vitamin d (oral)", "tylenol+codeine",
    ],
    "Duration": [
        "for 5 days", "for two weeks", "for 10 days", "for one month",
        "for 3 months", "x7 days", "for six weeks",
    ],
    "Route": [
        "by mouth", "orally", "intravenous", "subcutaneous", "topical",
        "inhaled", "per rectum", "sublingual",
    ],
    "Form": [
        "tablet", "capsule", "solution", "cream", "patch", "syrup",
        "injection", "inhaler", "drops",
    ],
    "ADE": [
        "nausea", "rash", "dizziness", "vomiting", "headache", "diarrhea",
        "angioedema", "dry cough", "muscle pain", "drowsiness",
    ],
    "Dosage": [
        "one tablet", "two tablets", "half a tablet", "one puff",
        "two puffs", "10 units", "one capsule",
    ],
    "Reason": [
        "hypertension", "diabetes", "chest pain", "infection", "fever",
        "high cholesterol", "anxiety", "acid reflux", "asthma", "back pain",
    ],
    "Frequency": [
        "daily", "twice a day", "every morning", "at bedtime",
        "every 6 hours", "as needed", "once weekly", "three times a day",
    ],
    # Strength surfaces only seed the generator; the detector always uses
    # STRENGTH_PATTERN (dict_ner.py:78).
    "Strength": [
        "81 mg", "500 mg", "10 mg", "20 mg", "40 mg", "25 mg", "100 mcg",
        "50 mcg", "5 mg", "850 mg",
    ],
}


def default_compiled() -> Dict[str, "re.Pattern[str]"]:
    return compile_patterns(fit_patterns(DEFAULT_LEXICON))


def fit_from_mentions(
    mentions: "ray.data.Dataset",  # noqa: F821 - forward ref, no ray import at module load
    type_col: str = "ent_type",
    text_col: str = "text",
) -> Dict[str, str]:
    """Distributed ``DictNER.fit`` (G5): per-type distinct surfaces from an
    annotated mentions Dataset -> alternation regexes.

    Shape: batch-local distinct (combiner) -> one ``groupby`` over the
    vocabulary-sized (type, surface) rows -> driver compiles and the caller
    broadcasts the compiled dict via the detector's constructor (A4).
    First-seen order is not reconstructible under parallelism, so surfaces
    are ordered lexicographically — alternation semantics are unchanged for
    delimited whole-surface matches.
    """
    import pyarrow as pa

    def local_distinct(batch: "pa.Table") -> "pa.Table":
        t = pa.table(
            {
                "ent_type": batch[type_col],
                "surface": pa.array(
                    [(s or "").lower() for s in batch[text_col].to_pylist()],
                    pa.string(),
                ),
            }
        )
        return t.group_by(["ent_type", "surface"], use_threads=False).aggregate([])

    from .functions.partitioning import groupby_partition

    distinct = groupby_partition(
        mentions.map_batches(local_distinct, batch_format="pyarrow"),
        ["ent_type", "surface"],
        # partition-granular distinct: one vectorized call per hash
        # partition, not one map_groups call per distinct surface
        lambda g: g.group_by(
            ["ent_type", "surface"], use_threads=False
        ).aggregate([]),
    ).to_pandas()
    by_type: Dict[str, List[str]] = {}
    for r in distinct.itertuples(index=False):
        by_type.setdefault(r.ent_type, []).append(r.surface)
    for t in by_type:
        by_type[t] = sorted(by_type[t])
    return fit_patterns(by_type)
