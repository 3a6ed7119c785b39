"""Poison-row quarantine (SURVEY.md §4 stragglers/retries row).

The reference aborts the whole job on any bad document (e.g. the tokenizer
mismatch raise at ehr.py:232-234). At 100 TB one malformed conversation
must not kill an hours-long run, and Ray's task retry would re-fail
deterministically on the same input. So per-document work runs under a
quarantine: failures are captured as structured error rows written to a
side-output Parquet directory (one shard per failing task — no shared
state, no driver round-trip), and the document is skipped.

Usage inside a batch fn::

    q = Quarantine(errors_dir)          # constructed per actor / cached
    for doc_id, text in ...:
        with q.guard(doc_id):
            ... per-doc work ...
    q.flush()                           # end of batch

The errors table schema: (doc_id, stage, error, ts_unix). A run is clean
iff the directory is empty; `read_errors` loads it for inspection.
"""

from __future__ import annotations

import os
import time
import traceback
import uuid
from contextlib import contextmanager
from typing import List, Optional

import pyarrow as pa
import pyarrow.parquet as pq

import ray.data

ERRORS = pa.schema(
    [
        ("doc_id", pa.string()),
        ("stage", pa.string()),
        ("error", pa.large_string()),
        ("ts_unix", pa.float64()),
    ]
)


class Quarantine:
    """Collects per-row failures; flushes one parquet shard per batch."""

    def __init__(self, errors_dir: Optional[str], stage: str = "extract"):
        self.errors_dir = errors_dir
        self.stage = stage
        self._rows: List[dict] = []

    @contextmanager
    def guard(self, doc_id: str):
        try:
            yield
        except Exception as exc:  # noqa: BLE001 - quarantine everything
            if self.errors_dir is None:
                raise
            self._rows.append(
                {
                    "doc_id": doc_id,
                    "stage": self.stage,
                    "error": f"{type(exc).__name__}: {exc}\n"
                    + traceback.format_exc(limit=3),
                    "ts_unix": time.time(),
                }
            )

    def flush(self) -> int:
        if not self._rows or self.errors_dir is None:
            n = len(self._rows)
            self._rows = []
            return n
        os.makedirs(self.errors_dir, exist_ok=True)
        table = pa.table(
            {f.name: pa.array([r[f.name] for r in self._rows], f.type) for f in ERRORS}
        )
        shard = os.path.join(self.errors_dir, f"errors-{uuid.uuid4().hex}.parquet")
        pq.write_table(table, shard)
        n = len(self._rows)
        self._rows = []
        return n


def read_errors(errors_dir: str) -> "ray.data.Dataset":
    """The quarantined-rows table for a run (empty dir -> empty dataset)."""
    if not os.path.isdir(errors_dir) or not os.listdir(errors_dir):
        return ray.data.from_arrow(ERRORS.empty_table())
    return ray.data.read_parquet(errors_dir)
