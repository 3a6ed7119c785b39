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
resume at stage granularity.

COMMIT PROTOCOL (r5): the MANIFEST is the commit point. A recompute
deletes the stage manifest first, rewrites the data directory, then
writes the manifest last (tmp + rename — file-level atomicity, which
every pyarrow.fs backend has, unlike directory rename). Any crash
leaves either no manifest (next run recomputes) or a complete
manifest over complete data — never a half-written checkpoint marked
done. This replaces the old tmp-dir + os.rename pattern, which was
LocalFileSystem-only; ``base_dir`` may now be a URI or pair with an
explicit ``filesystem`` (functions/fsio), same as the KG store.

At 100 TB each stage's Parquet is partitioned by the pipeline key
(hash(doc_id) % P via Ray's block structure), so a failed run re-reads
only blocks, never one giant file.
"""

from __future__ import annotations

import hashlib
import json
import posixpath
import time
from typing import Callable, Dict, List, Optional

import pyarrow as pa

import ray.data

from ..functions import fsio


def _schema_fingerprint(schema: pa.Schema) -> str:
    return hashlib.md5(schema.serialize().to_pybytes()).hexdigest()


class CheckpointedPipeline:
    """Run a chain of stage factories with skip-if-done semantics.

    >>> cp = CheckpointedPipeline("/tmp/run1")
    >>> docs = cp.stage("documents", lambda: assembly.assemble(src))
    >>> ment = cp.stage("mentions", lambda: mentions.detect(docs),
    ...                 upstream=["documents"])
    """

    def __init__(self, base_dir: str, filesystem=None):
        self.fs, self.base_dir = fsio.resolve(base_dir, filesystem)
        fsio.makedirs(self.fs, self.base_dir)
        self._fingerprints: Dict[str, str] = {}
        self._lineage: List[Dict] = []

    # -- paths ------------------------------------------------------------
    def _stage_dir(self, name: str) -> str:
        return posixpath.join(self.base_dir, name)

    def _manifest_path(self, name: str) -> str:
        return posixpath.join(self._stage_dir(name), "_manifest.json")

    # -- manifest ---------------------------------------------------------
    def manifest(self, name: str) -> Optional[Dict]:
        try:
            return json.loads(fsio.read_text(self.fs, self._manifest_path(name)))
        except FileNotFoundError:
            return None
        except json.JSONDecodeError:
            return None  # corrupt manifest: treat as absent -> recompute
        # any OTHER OSError (transient storage/network failure) propagates:
        # returning None here would make stage() DELETE a valid checkpoint
        # and recompute it on a retryable error

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
        data_dir = posixpath.join(self._stage_dir(name), "data")
        if man and man.get("done") and man.get("fingerprint") == want_fp:
            self._fingerprints[name] = man["output_fp"]
            self._lineage.append(
                {"stage": name, "rows": man["rows"], "wall_s": 0.0, "cached": True}
            )
            return ray.data.read_parquet(data_dir, filesystem=self.fs)

        t0 = time.time()
        ds = factory()
        # manifest-as-commit: retract the done marker BEFORE touching data
        # so a crash mid-rewrite can never leave stale data marked done
        mpath = self._manifest_path(name)
        if fsio.exists(self.fs, mpath):
            fsio.delete(self.fs, mpath)
        if fsio.exists(self.fs, data_dir):
            self.fs.delete_dir(data_dir)
        fsio.makedirs(self.fs, data_dir)
        ds.write_parquet(data_dir, filesystem=self.fs)
        files = fsio.listdir(self.fs, data_dir, ".parquet")
        rows = sum(
            fsio.read_metadata(self.fs, posixpath.join(data_dir, f)).num_rows
            for f in files
        )
        if files:
            schema = fsio.read_metadata(
                self.fs, posixpath.join(data_dir, files[0])
            ).schema.to_arrow_schema()
        else:
            # a legitimately empty stage writes ZERO files (verified Ray
            # behavior); commit an explicit empty-table file so the
            # checkpoint read-back and the schema source both exist
            sch = ds.schema()
            if isinstance(sch.base_schema, pa.Schema):
                schema = sch.base_schema
            else:  # pandas-backed blocks: numpy dtypes need converting
                import numpy as _np

                def _to_pa(t):
                    if isinstance(t, pa.DataType):
                        return t
                    try:
                        return pa.from_numpy_dtype(_np.dtype(t))
                    except (TypeError, pa.ArrowNotImplementedError):
                        return pa.string()

                schema = pa.schema(
                    [(n, _to_pa(t)) for n, t in zip(sch.names, sch.types)]
                )
            fsio.write_table(
                self.fs,
                posixpath.join(data_dir, "part-empty.parquet"),
                schema.empty_table(),
            )
        wall = time.time() - t0

        # want_fp is folded in so ANY recompute of this stage (params or
        # upstream change) invalidates downstream stages even when rows and
        # schema happen to be unchanged (ADVICE round 1: content can differ
        # at identical row count + schema).
        out_fp = hashlib.md5(
            f"{rows}|{_schema_fingerprint(schema)}|{want_fp}".encode()
        ).hexdigest()
        body = json.dumps(
            {
                "done": True,
                "rows": rows,
                "wall_s": round(wall, 3),
                "fingerprint": want_fp,
                "output_fp": out_fp,
                "schema": str(schema),
            },
            indent=2,
        )
        tmp = mpath + ".tmp"  # "_manifest.json.tmp": "_" prefix, scan-safe
        fsio.write_text(self.fs, tmp, body)
        fsio.replace(self.fs, tmp, mpath)
        self._fingerprints[name] = out_fp
        self._lineage.append(
            {"stage": name, "rows": rows, "wall_s": round(wall, 3), "cached": False}
        )
        return ray.data.read_parquet(data_dir, filesystem=self.fs)

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
        path = posixpath.join(self.base_dir, "_lineage.parquet")
        if fsio.exists(self.fs, path):
            table = pa.concat_tables([fsio.read_table(self.fs, path), table])
        tmp = path + ".tmp"
        fsio.write_table(self.fs, tmp, table)  # crash-safe: commit by rename
        fsio.replace(self.fs, tmp, path)
        return table
