"""Filesystem abstraction for the engine's file-based sinks and stores.

Round-4 VERDICT item 3: the KG store's bucket I/O, the segmentation
lineage side output, and the resumable partitioned writer previously
used raw ``os.path``/``open`` — correct on a shared mount, unusable on an
object store. Every such site now routes through these helpers, which
accept either a plain path (LocalFileSystem), a URI (``s3://…``,
``gs://…`` — resolved by ``pyarrow.fs.FileSystem.from_uri``), or an
explicit ``pyarrow.fs.FileSystem`` handle (incl. ``SubTreeFileSystem``
/ ``PyFileSystem`` wrappers, which is how tests exercise the non-local
path without network access).

pyarrow FileSystems are picklable, so a resolved handle can be captured
by Ray task closures — each worker talks to the store directly, which is
exactly what the multi-node upsert path needs. Reference-semantics
analog: the pickle cache-dir contract (reference ``utils.py:644-677``)
generalized to a filesystem interface.

ATOMICITY: ``replace`` is an atomic rename on LocalFileSystem (POSIX
rename). On object stores ``move`` is copy+delete — not atomic, but
object-store PUTs are already all-or-nothing per object, so the
tmp+replace crash-safety pattern degrades gracefully — PROVIDED tmp
names start with ``_`` or ``.``: those are the only prefixes parquet
directory readers (pyarrow datasets) actually skip, so a crashed copy
leaves an ``_tmp-*`` object that scans ignore. Writers here follow that
convention.
"""

from __future__ import annotations

from typing import Optional

import pyarrow as pa
import pyarrow.parquet as pq
from pyarrow import fs as pafs


def resolve(
    path: str, filesystem: "Optional[pafs.FileSystem]" = None
) -> "tuple[pafs.FileSystem, str]":
    """(filesystem, normalized_path) for a path, URI, or explicit fs."""
    if filesystem is not None:
        return filesystem, path
    if "://" in path:
        return pafs.FileSystem.from_uri(path)
    return pafs.LocalFileSystem(), path


def exists(fs: "pafs.FileSystem", path: str) -> bool:
    return fs.get_file_info(path).type != pafs.FileType.NotFound


def is_dir(fs: "pafs.FileSystem", path: str) -> bool:
    return fs.get_file_info(path).type == pafs.FileType.Directory


def makedirs(fs: "pafs.FileSystem", path: str) -> None:
    fs.create_dir(path, recursive=True)


def listdir(fs: "pafs.FileSystem", path: str, suffix: str = "") -> list:
    """Base names of files directly under ``path`` (missing dir or a
    path that names a FILE -> []), optionally filtered by suffix.
    Non-recursive; single RPC in the normal case (allow_not_found
    covers missing; NotADirectoryError covers the file-typed path)."""
    try:
        infos = fs.get_file_info(
            pafs.FileSelector(path, recursive=False, allow_not_found=True)
        )
    except NotADirectoryError:
        return []
    return sorted(
        i.base_name
        for i in infos
        if i.type == pafs.FileType.File and i.base_name.endswith(suffix)
    )


def listdirs(fs: "pafs.FileSystem", path: str) -> list:
    """Base names of directories directly under ``path`` (missing dir or
    file-typed path -> []). On object stores 'directories' are common
    prefixes. Single RPC in the normal case."""
    try:
        infos = fs.get_file_info(
            pafs.FileSelector(path, recursive=False, allow_not_found=True)
        )
    except NotADirectoryError:
        return []
    return sorted(
        i.base_name for i in infos if i.type == pafs.FileType.Directory
    )


def read_text(fs: "pafs.FileSystem", path: str) -> str:
    with fs.open_input_stream(path) as f:
        return f.read().decode("utf-8")


def write_text(fs: "pafs.FileSystem", path: str, text: str) -> None:
    with fs.open_output_stream(path) as f:
        f.write(text.encode("utf-8"))


def replace(fs: "pafs.FileSystem", src: str, dst: str) -> None:
    """Rename ``src`` over ``dst`` — atomic on local/POSIX filesystems,
    copy+delete on object stores (see module docstring)."""
    fs.move(src, dst)


def delete(fs: "pafs.FileSystem", path: str) -> None:
    fs.delete_file(path)


def write_table(fs: "pafs.FileSystem", path: str, table: "pa.Table") -> None:
    pq.write_table(table, path, filesystem=fs)


def read_table(
    fs: "pafs.FileSystem", path: str, columns=None
) -> "pa.Table":
    return pq.read_table(
        path, columns=columns, filesystem=fs, use_threads=False
    )


def read_metadata(fs: "pafs.FileSystem", path: str):
    return pq.read_metadata(path, filesystem=fs)
