"""N-Triples (RDF) sink + source for the materialized knowledge graph.

The reference materializes its per-note graph only as a NetworkX figure
(ehr.py get_relations / generate_graph); a corpus-scale KG also needs a
standard interchange export so downstream triple stores / SPARQL engines
can load it. N-Triples (W3C RDF 1.1) is the line-oriented choice: one
triple per line, trivially splittable, so the export is embarrassingly
parallel and the output is resumable (one ``.nt`` shard per block).

Encoding contract (kept deliberately minimal and mirrored 1:1 in the
DuckDB oracle SQL so the export is hash-verifiable):

* subject / predicate become IRIs under a fixed ``urn:ehr:`` namespace
  with percent-encoding of exactly ``% < > " `` and space (in that
  order, ``%`` first so the encoding is unambiguous and invertible).
* object becomes a plain literal with backslash-escaping of exactly
  ``\\ " \\n`` (backslash first), per the N-Triples grammar.

Everything is vectorized pandas ``str.replace`` / concat — no per-row
Python in the formatting path.
"""

from __future__ import annotations

import hashlib
import os

import pandas as pd
import pyarrow as pa

import ray
import ray.data

_IRI_RULES = [("%", "%25"), (" ", "%20"), ("<", "%3C"), (">", "%3E"), ('"', "%22")]
_LIT_RULES = [("\\", "\\\\"), ('"', '\\"'), ("\n", "\\n")]


def _apply(s: "pd.Series", rules) -> "pd.Series":
    for a, b in rules:
        s = s.str.replace(a, b, regex=False)
    return s


def format_lines(df: "pd.DataFrame") -> "pd.Series":
    """(subj, pred, obj) rows -> N-Triples lines (vectorized)."""
    subj = _apply(df["subj"].astype(str), _IRI_RULES)
    pred = _apply(df["pred"].astype(str), _IRI_RULES)
    obj = _apply(df["obj"].astype(str), _LIT_RULES)
    return (
        "<urn:ehr:node:" + subj + "> <urn:ehr:pred:" + pred + '> "' + obj + '" .'
    )


def write_ntriples(triples: "ray.data.Dataset", out_dir: str) -> None:
    """Write the distinct (subj, pred, obj) set as sharded ``.nt`` files.

    One file per non-empty block, named by the content digest of its
    lines — idempotent across retries (a re-executed task rewrites the
    identical file) and collision-free, which is what makes the output
    layout resumable without a write coordinator.
    """
    os.makedirs(out_dir, exist_ok=True)

    def dump(df: "pd.DataFrame") -> "pd.DataFrame":
        if df.empty:
            return pd.DataFrame({"path": pd.Series([], dtype=str)})
        payload = "\n".join(format_lines(df)) + "\n"
        name = hashlib.md5(payload.encode("utf-8")).hexdigest()
        path = os.path.join(out_dir, f"part-{name}.nt")
        tmp = path + ".tmp"
        with open(tmp, "w", encoding="utf-8") as f:
            f.write(payload)
        os.replace(tmp, path)
        return pd.DataFrame({"path": [path]})

    # materialize() drives the write to completion (the sink is the action)
    triples.map_batches(dump, batch_format="pandas").materialize()


def read_ntriples(out_dir: str) -> "ray.data.Dataset":
    """Read ``.nt`` shards back as a (line) Dataset (independent decode
    path for the roundtrip check)."""
    return ray.data.read_text(out_dir, file_extensions=["nt"])


def parse_lines(t: pa.Table) -> pa.Table:
    """Decode N-Triples lines back to (subj, pred, obj) — the inverse of
    :func:`format_lines` under this module's encoding contract."""
    s = t.column("text").to_pandas().astype(str)
    m = s.str.extract(
        r"^<urn:ehr:node:(?P<subj>[^>]*)> <urn:ehr:pred:(?P<pred>[^>]*)> "
        r'"(?P<obj>.*)" \.$'
    )
    for col in ("subj", "pred"):
        # decode %XX codes, %25 LAST (inverse of encoding % first)
        for a, b in reversed(_IRI_RULES):
            m[col] = m[col].str.replace(b, a, regex=False)
    # backslash escapes must decode in ONE left-to-right pass: sequential
    # replaces would turn the encoding of a literal backslash-then-n
    # ("\\\\n") into a newline
    unesc = {'"': '"', "\\": "\\", "n": "\n"}
    m["obj"] = m["obj"].str.replace(
        r"\\([\"\\n])", lambda mt: unesc[mt.group(1)], regex=True
    )
    return pa.Table.from_pandas(m, preserve_index=False)
