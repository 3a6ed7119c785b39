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


def compile_patterns(patterns: Dict[str, str]) -> Dict[str, "re.Pattern[str]"]:
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
