"""ADE corpus (JSON) source.

Reference semantics: ``process_ade_files`` (utils.py:349-419):

* entity ids are ``T1..`` in listing order; type ``Adverse-Effect`` is
  renamed ``ADE``;
* entity ranges are **token indices**, stored inclusive:
  ``[start, end - 1]`` (utils.py:386);
* entity text is the tokens joined with a ``' '`` **including a trailing
  space** (utils.py:389-392 never strips) — kept for parity;
* relations are always ``ADE-Drug`` with head/tail token-entity indices
  (+1 -> T ids), with the same backlog resolution as brat.

Ray shape: a stateless ``map_batches`` normalizer over rows of the raw
JSON (``ray.data.read_json`` yields one row per record: ``tokens``,
``entities``, ``relations``).
"""

from __future__ import annotations

from typing import Dict, List

import pyarrow as pa

import ray.data

# Token-range mentions (ranges are TOKEN indices, inclusive — unlike the
# char-range MENTIONS schema; see utils.py:386).
ADE_MENTIONS = pa.schema(
    [
        ("doc_id", pa.string()),
        ("ent_id", pa.string()),
        ("ent_type", pa.string()),
        ("tok_start", pa.int64()),
        ("tok_end", pa.int64()),
        ("text", pa.string()),
    ]
)

ADE_EDGES = pa.schema(
    [
        ("doc_id", pa.string()),
        ("rel_id", pa.string()),
        ("rel_type", pa.string()),
        ("subj_id", pa.string()),
        ("obj_id", pa.string()),
    ]
)


def normalize_record(doc_id: str, rec: Dict) -> Dict[str, List[Dict]]:
    """One raw ADE json record -> mention + edge rows."""
    tokens = rec["tokens"]
    mentions: List[Dict] = []
    for i, ent in enumerate(rec.get("entities", []), start=1):
        ent_type = "ADE" if ent["type"] == "Adverse-Effect" else ent["type"]
        text = ""
        for tok in tokens[ent["start"] : ent["end"]]:
            text += tok + " "
        mentions.append(
            {
                "doc_id": doc_id,
                "ent_id": f"T{i}",
                "ent_type": ent_type,
                "tok_start": int(ent["start"]),
                "tok_end": int(ent["end"]) - 1,
                "text": text,
            }
        )
    known = {m["ent_id"] for m in mentions}
    edges: List[Dict] = []
    for j, rel in enumerate(rec.get("relations", []), start=1):
        e1 = f"T{rel['head'] + 1}"
        e2 = f"T{rel['tail'] + 1}"
        if e1 in known and e2 in known:
            edges.append(
                {
                    "doc_id": doc_id,
                    "rel_id": f"R{j}",
                    "rel_type": "ADE-Drug",
                    "subj_id": e1,
                    "obj_id": e2,
                }
            )
    return {"mentions": mentions, "edges": edges, "tokens": tokens}


def _batch(batch: pa.Table, which: str) -> pa.Table:
    schema = ADE_MENTIONS if which == "mentions" else ADE_EDGES
    rows: List[Dict] = []
    ids = (
        batch["doc_id"].to_pylist()
        if "doc_id" in batch.column_names
        else [f"ade-{i}" for i in range(batch.num_rows)]
    )
    for doc_id, rec in zip(ids, batch.to_pylist()):
        rows.extend(normalize_record(str(doc_id), rec)[which])
    if not rows:
        return schema.empty_table()
    return pa.table(
        {f.name: pa.array([r[f.name] for r in rows], f.type) for f in schema}
    )


def mentions_batch(batch: pa.Table) -> pa.Table:
    return _batch(batch, "mentions")


def edges_batch(batch: pa.Table) -> pa.Table:
    return _batch(batch, "edges")


def read_ade(paths) -> "ray.data.Dataset":
    """``ray.data.read_json`` over ADE corpus file(s) (utils.py:309-346)."""
    return ray.data.read_json(paths)


def mentions(ds: "ray.data.Dataset") -> "ray.data.Dataset":
    return ds.map_batches(mentions_batch, batch_format="pyarrow")


def edges(ds: "ray.data.Dataset") -> "ray.data.Dataset":
    return ds.map_batches(edges_batch, batch_format="pyarrow")
