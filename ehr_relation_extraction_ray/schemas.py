"""Fixed Arrow schemas for every logical table of the engine.

The reference is schema-by-construction (Python objects with fixed fields:
``Entity`` at ``annotations.py:14-57``, ``Relation`` at
``annotations.py:101-130``, the long relation table at ``utils.py:497-530``).
We make that explicit: each stage validates its output against these
constants so schema drift fails fast at stage boundaries instead of
corrupting a 100 TB run halfway through.
"""

from __future__ import annotations

import pyarrow as pa

# Primary engine input (driver input_hint): multi-turn transcripts.
TRANSCRIPTS = pa.schema(
    [
        ("conv_id", pa.string()),
        ("turn_idx", pa.int32()),
        ("role", pa.string()),
        ("text", pa.large_string()),
        ("tool", pa.string()),
        ("ts", pa.timestamp("us")),
    ]
)

# Assembled conversations (reference HealthRecord analog, ehr.py:7-77).
# ``turn_offsets`` is the char start of each turn inside ``text``; it is the
# proof obligation for the per-turn text equality invariant.
DOCUMENTS = pa.schema(
    [
        ("doc_id", pa.string()),
        ("text", pa.large_string()),
        ("n_turns", pa.int32()),
        ("turn_offsets", pa.list_(pa.int64())),
    ]
)

# Entity mentions (reference Entity, annotations.py:14-57; char ranges are
# [start, end) exclusive like brat / predict.py:343 slicing).
MENTIONS = pa.schema(
    [
        ("doc_id", pa.string()),
        ("ent_id", pa.string()),
        ("ent_type", pa.string()),
        ("start", pa.int64()),
        ("end", pa.int64()),
        ("text", pa.string()),
    ]
)

# Token windows (reference get_split_points, ehr.py:353-432): token index
# range plus the char range used by the RE stage (utils_re.py:197-207).
WINDOWS = pa.schema(
    [
        ("doc_id", pa.string()),
        ("win_idx", pa.int32()),
        ("tok_start", pa.int64()),
        ("tok_end", pa.int64()),
        ("char_start", pa.int64()),
        ("char_end", pa.int64()),
    ]
)

# RE candidate pairs (reference map_entities, utils.py:422-494, masked text
# per replace_entity_text, biobert_re/utils_re.py:210-230).
CANDIDATES = pa.schema(
    [
        ("doc_id", pa.string()),
        ("win_idx", pa.int32()),
        ("cand_idx", pa.int64()),
        ("rel_type", pa.string()),
        ("subj_id", pa.string()),
        ("subj_text", pa.string()),
        ("obj_id", pa.string()),
        ("obj_text", pa.string()),
        ("masked_text", pa.large_string()),
        # the substring of masked_text strictly between the two inserted
        # markers, present only when they are provably the first/last
        # markers (null -> scorer takes the exact regex fallback); lets the
        # surrogate scorer run as pure Arrow kernels (functions/pairs.py)
        ("gap_text", pa.large_string()),
        # precomputed surrogate-predicate inputs (functions/pairs.py):
        # gap char length (-1 = no fast-path proof, use masked_text) and
        # double-space-free flag — let the scorer run with zero string
        # traffic per candidate
        ("gap_len", pa.int32()),
        ("gap_clean", pa.bool_()),
    ]
)

# Predicted relations (reference Relation, predict.py:379-387 keeps pred==1
# and renumbers R%d).
EDGES = pa.schema(
    [
        ("doc_id", pa.string()),
        ("rel_id", pa.string()),
        ("rel_type", pa.string()),
        ("subj_id", pa.string()),
        ("subj_text", pa.string()),
        ("obj_id", pa.string()),
        ("obj_text", pa.string()),
    ]
)

# Long relation / triple table (reference get_long_relation_table,
# utils.py:497-530: columns drug_id/drug/arg/edge). ``pred`` is the entity
# type prefix of the relation type (utils.py:527).
TRIPLES = pa.schema(
    [
        ("doc_id", pa.string()),
        ("subj_id", pa.string()),
        ("subj", pa.string()),
        ("pred", pa.string()),
        ("obj", pa.string()),
    ]
)

# Canonical entity nodes (new per north_rule; no reference analog).
NODES = pa.schema(
    [
        ("node_id", pa.string()),
        ("ent_type", pa.string()),
        ("canonical_text", pa.string()),
        ("n_aliases", pa.int64()),
        ("n_mentions", pa.int64()),
    ]
)

# The 9 entity types / short labels (ehr.py:335-337, predict.py:61-65).
ENT_LABEL_MAP = {
    "Drug": "DRUG",
    "Strength": "STR",
    "Duration": "DUR",
    "Route": "ROU",
    "Form": "FOR",
    "ADE": "ADE",
    "Dosage": "DOS",
    "Reason": "REA",
    "Frequency": "FRE",
}
LABEL_ENT_MAP = {v: k for k, v in ENT_LABEL_MAP.items()}
ENTITY_TYPES = list(ENT_LABEL_MAP)

# The 8 relation types: "{X}-Drug" for every non-Drug type X
# (Track2-evaluate-ver4.py:435-437, constructed at utils.py:468).
RELATION_TYPES = [f"{t}-Drug" for t in ENTITY_TYPES if t != "Drug"]


def validate(table: pa.Table, schema: pa.Schema, stage: str) -> pa.Table:
    """Cast ``table`` to ``schema`` (raises if shapes drifted)."""
    try:
        return table.select(schema.names).cast(schema)
    except (KeyError, pa.ArrowInvalid, pa.ArrowNotImplementedError) as exc:
        raise ValueError(
            f"stage {stage!r} produced schema {table.schema} "
            f"!= expected {schema}"
        ) from exc
