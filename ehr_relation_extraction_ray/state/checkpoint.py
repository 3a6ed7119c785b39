"""Stage checkpointing + lineage (north-rule resumability).

Replaces the reference's pickle/FileLock feature caches
(biobert_ner/utils_ner.py:92-126, biobert_re/utils_re.py:97-142,
utils.py:644-677) with partitioned Parquet checkpoints and a JSON
manifest per stage:

    <base>/<stage>/data/part-*.parquet     (the table, written by Ray)
    <base>/<stage>/_manifest.json          (rows, schema hash, wall_s, done)
    <base>/_lineage.parquet                (append-only stage counters, G8)

A rerun skips any stage whose manifest is complete and whose upstream
fingerprint matches, reading the Parquet back as a Dataset — mid-pipeline
resume at stage granularity. Writes go to a temp dir + atomic rename, so
a killed run can never leave a half-written checkpoint marked done.

At 100 TB each stage's Parquet is partitioned by the pipeline key
(hash(doc_id) % P via Ray's block structure), so a failed run re-reads
only blocks, never one giant file.
"""

from __future__ import annotations

import hashlib
import json
import os
import shutil
import time
from typing import Callable, Dict, List, Optional

import pyarrow as pa
import pyarrow.parquet as pq

import ray.data


def _schema_fingerprint(schema: pa.Schema) -> str:
    return hashlib.md5(schema.serialize().to_pybytes()).hexdigest()


class CheckpointedPipeline:
    """Run a chain of stage factories with skip-if-done semantics.

    >>> cp = CheckpointedPipeline("/tmp/run1")
    >>> docs = cp.stage("documents", lambda: assembly.assemble(src))
    >>> ment = cp.stage("mentions", lambda: mentions.detect(docs),
    ...                 upstream=["documents"])
    """

    def __init__(self, base_dir: str):
        self.base_dir = base_dir
        os.makedirs(base_dir, exist_ok=True)
        self._fingerprints: Dict[str, str] = {}
        self._lineage: List[Dict] = []

    # -- paths ------------------------------------------------------------
    def _stage_dir(self, name: str) -> str:
        return os.path.join(self.base_dir, name)

    def _manifest_path(self, name: str) -> str:
        return os.path.join(self._stage_dir(name), "_manifest.json")

    # -- manifest ---------------------------------------------------------
    def manifest(self, name: str) -> Optional[Dict]:
        try:
            with open(self._manifest_path(name)) as f:
                return json.load(f)
        except (FileNotFoundError, json.JSONDecodeError):
            return None

    def _upstream_fp(self, upstream: Optional[List[str]]) -> str:
        parts = [self._fingerprints.get(u, "?") for u in (upstream or [])]
        return hashlib.md5("|".join(parts).encode()).hexdigest()

    # -- the one entry point ----------------------------------------------
    def stage(
        self,
        name: str,
        factory: Callable[[], "ray.data.Dataset"],
        upstream: Optional[List[str]] = None,
        params: str = "",
    ) -> "ray.data.Dataset":
        """Return the stage's Dataset, recomputing only when needed.

        ``params`` should encode anything that changes the stage's output
        (config values); it is folded into the fingerprint.
        """
        up_fp = self._upstream_fp(upstream)
        want_fp = hashlib.md5(f"{up_fp}|{params}".encode()).hexdigest()
        man = self.manifest(name)
        data_dir = os.path.join(self._stage_dir(name), "data")
        if man and man.get("done") and man.get("fingerprint") == want_fp:
            self._fingerprints[name] = man["output_fp"]
            self._lineage.append(
                {"stage": name, "rows": man["rows"], "wall_s": 0.0, "cached": True}
            )
            return ray.data.read_parquet(data_dir)

        t0 = time.time()
        ds = factory()
        tmp = os.path.join(self.base_dir, f".tmp-{name}-{os.getpid()}")
        shutil.rmtree(tmp, ignore_errors=True)
        ds.write_parquet(tmp)
        rows = sum(
            pq.read_metadata(os.path.join(tmp, f)).num_rows
            for f in os.listdir(tmp)
            if f.endswith(".parquet")
        )
        schema = pq.read_schema(
            os.path.join(
                tmp, next(f for f in os.listdir(tmp) if f.endswith(".parquet"))
            )
        )
        wall = time.time() - t0

        stage_dir = self._stage_dir(name)
        shutil.rmtree(stage_dir, ignore_errors=True)
        os.makedirs(stage_dir)
        os.rename(tmp, data_dir)
        # want_fp is folded in so ANY recompute of this stage (params or
        # upstream change) invalidates downstream stages even when rows and
        # schema happen to be unchanged (ADVICE round 1: content can differ
        # at identical row count + schema).
        out_fp = hashlib.md5(
            f"{rows}|{_schema_fingerprint(schema)}|{want_fp}".encode()
        ).hexdigest()
        with open(self._manifest_path(name), "w") as f:
            json.dump(
                {
                    "done": True,
                    "rows": rows,
                    "wall_s": round(wall, 3),
                    "fingerprint": want_fp,
                    "output_fp": out_fp,
                    "schema": str(schema),
                },
                f,
                indent=2,
            )
        self._fingerprints[name] = out_fp
        self._lineage.append(
            {"stage": name, "rows": rows, "wall_s": round(wall, 3), "cached": False}
        )
        return ray.data.read_parquet(data_dir)

    # -- lineage (G8) -----------------------------------------------------
    def flush_lineage(self) -> pa.Table:
        """Append this run's stage counters to ``<base>/_lineage.parquet``."""
        table = pa.table(
            {
                "stage": pa.array([l["stage"] for l in self._lineage], pa.string()),
                "rows": pa.array([l["rows"] for l in self._lineage], pa.int64()),
                "wall_s": pa.array(
                    [l["wall_s"] for l in self._lineage], pa.float64()
                ),
                "cached": pa.array([l["cached"] for l in self._lineage], pa.bool_()),
            }
        )
        path = os.path.join(self.base_dir, "_lineage.parquet")
        if os.path.exists(path):
            table = pa.concat_tables([pq.read_table(path), table])
        pq.write_table(table, path)
        return table
