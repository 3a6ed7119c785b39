"""brat standoff (.ann) source/sink.

Reference semantics: ``HealthRecord._extract_annotations`` (ehr.py:99-194):

* lines starting ``#`` are skipped;
* ``T<id>\\t<Type> <start> <end>[;<start> <end>...]\\t<text>`` — the entity
  char range is ``[first_start, last_end]`` across ``;``-separated
  fragments (ehr.py:152-157);
* ``R<id>\\t<Type> Arg1:T<i> Arg2:T<j>`` — forward references go to a
  backlog resolved after the full pass (ehr.py:163-192);
* anything else is invalid and only warned about.

Ray shape: annotation payloads are small per doc, so parsing is a stateless
``map_batches`` over ``(doc_id, ann)`` rows; reading a brat *directory*
pairs ``.txt``/``.ann`` by stem on the driver (cheap metadata listing) and
does all file I/O inside the read tasks, so no document body ever passes
through the driver.
"""

from __future__ import annotations

import os
import warnings
from typing import Dict, List, Tuple

import pyarrow as pa

import ray.data

from ..schemas import EDGES, MENTIONS, validate

# brat docs: (doc_id, text, ann) — text is optional (empty when only .ann).
BRAT_DOCS = pa.schema(
    [
        ("doc_id", pa.string()),
        ("text", pa.large_string()),
        ("ann", pa.large_string()),
    ]
)


def parse_ann(doc_id: str, ann_text: str) -> Tuple[List[Dict], List[Dict]]:
    """One .ann payload -> (mention rows, edge rows), reference-faithful."""
    entities: Dict[str, Dict] = {}
    relations: List[Dict] = []
    backlog: List[Tuple[str, str, str, str]] = []

    for raw_line in ann_text.split("\n"):
        if raw_line.startswith("#"):
            continue
        parts = [p for p in raw_line.split("\t") if p]
        if not parts or not parts[0]:
            continue
        if parts[0][0] == "T":
            if len(parts) != 3:
                raise ValueError(f"malformed T line in {doc_id}: {raw_line!r}")
            spec = parts[1]
            sp = spec.find(" ")
            ent_type = spec[:sp] if sp >= 0 else spec
            char_ranges = [r.split() for r in spec[sp + 1 :].split(";")]
            start = int(char_ranges[0][0])
            end = int(char_ranges[-1][1])
            entities[parts[0]] = {
                "doc_id": doc_id,
                "ent_id": parts[0],
                "ent_type": ent_type,
                "start": start,
                "end": end,
                "text": parts[2],
            }
        elif parts[0][0] == "R":
            if len(parts) != 2:
                raise ValueError(f"malformed R line in {doc_id}: {raw_line!r}")
            det = parts[1].split(" ")
            arg1 = det[1].split(":")[-1]
            arg2 = det[2].split(":")[-1]
            if arg1 in entities and arg2 in entities:
                relations.append((parts[0], det[0], arg1, arg2))
            else:
                backlog.append((parts[0], det[0], arg1, arg2))
        else:
            warnings.warn(f"Invalid annotation in {doc_id}: {raw_line!r}")

    relations.extend(backlog)
    edges = []
    for rel_id, rel_type, arg1, arg2 in relations:
        e1, e2 = entities[arg1], entities[arg2]
        edges.append(
            {
                "doc_id": doc_id,
                "rel_id": rel_id,
                "rel_type": rel_type,
                "subj_id": arg1,
                "subj_text": e1["text"],
                "obj_id": arg2,
                "obj_text": e2["text"],
            }
        )
    return list(entities.values()), edges


def _rows_to_table(rows: List[Dict], schema: pa.Schema) -> pa.Table:
    if not rows:
        return schema.empty_table()
    cols = {f.name: [r[f.name] for r in rows] for f in schema}
    return pa.table({n: pa.array(v, schema.field(n).type) for n, v in cols.items()})


def mentions_batch(batch: pa.Table) -> pa.Table:
    rows: List[Dict] = []
    for doc_id, ann in zip(batch["doc_id"].to_pylist(), batch["ann"].to_pylist()):
        ments, _ = parse_ann(doc_id, ann or "")
        rows.extend(ments)
    return validate(_rows_to_table(rows, MENTIONS), MENTIONS, "brat.mentions")


def edges_batch(batch: pa.Table) -> pa.Table:
    rows: List[Dict] = []
    for doc_id, ann in zip(batch["doc_id"].to_pylist(), batch["ann"].to_pylist()):
        _, edges = parse_ann(doc_id, ann or "")
        rows.extend(edges)
    return validate(_rows_to_table(rows, EDGES), EDGES, "brat.edges")


def read_brat_dir(data_dir: str) -> "ray.data.Dataset":
    """Scan a brat directory into a BRAT_DOCS Dataset.

    Reference ``read_data`` (utils.py:239-306) pairs ``<id>.txt`` with
    ``<id>.ann``. Only the *listing* happens on the driver; the file bodies
    are read inside ``map_batches`` tasks.
    """
    stems = sorted(
        {
            os.path.splitext(f)[0]
            for f in os.listdir(data_dir)
            if f.endswith((".txt", ".ann")) and not f.startswith(".")
        }
    )

    def load(batch: pa.Table) -> pa.Table:
        doc_ids, texts, anns = [], [], []
        for stem in batch["stem"].to_pylist():
            txt_p = os.path.join(data_dir, stem + ".txt")
            ann_p = os.path.join(data_dir, stem + ".ann")
            text = open(txt_p, encoding="utf-8").read() if os.path.exists(txt_p) else ""
            ann = open(ann_p, encoding="utf-8").read() if os.path.exists(ann_p) else ""
            doc_ids.append(stem)
            texts.append(text)
            anns.append(ann)
        return pa.table(
            {
                "doc_id": pa.array(doc_ids, pa.string()),
                "text": pa.array(texts, pa.large_string()),
                "ann": pa.array(anns, pa.large_string()),
            }
        )

    items = ray.data.from_arrow(pa.table({"stem": pa.array(stems, pa.string())}))
    return items.map_batches(load, batch_format="pyarrow", batch_size=32)


def format_ann(mentions: pa.Table, edges: pa.Table) -> str:
    """Inverse writer (one doc): mention/edge rows -> .ann text (S10 analog)."""
    lines = []
    for m in mentions.to_pylist():
        lines.append(f"{m['ent_id']}\t{m['ent_type']} {m['start']} {m['end']}\t{m['text']}")
    for e in edges.to_pylist():
        lines.append(
            f"{e['rel_id']}\t{e['rel_type']} Arg1:{e['subj_id']} Arg2:{e['obj_id']}"
        )
    return "\n".join(lines) + ("\n" if lines else "")
