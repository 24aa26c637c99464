"""Filesystem plumbing shared by the persisted index structures
(`MinHashDedupIndex`, `IvfIndex`): every metadata/list/delete operation goes
through `pyarrow.fs.FileSystem`, so an index can live on any Arrow-supported
store (local disk, S3-style object stores, or a test-injected
`SubTreeFileSystem`) instead of being glued to `os.path`/`glob`.

Atomicity note: `write_json_atomic` uses write-to-tmp + `fs.move` — a true
atomic rename on `LocalFileSystem`. On object stores `move` is copy+delete,
but there a single PUT is already atomic at the object level, so the commit
point is still a single visible switch of the meta object; readers never see
a torn file either way.

Concurrency contract: readers are always safe, and SINGLE-writer commits are
exactly-once on every store. MULTI-writer commits (two processes committing
the same meta/manifest concurrently) are only conflict-checked on
`LocalFileSystem`, where the CdcTable manifest pointer's read-then-rename
check makes the loser fail. On object stores, copy+delete `move` plus the
read-then-write check is NOT a compare-and-swap: two concurrent committers
can both pass the parent check and one committed transaction is silently
lost. Concurrent writers on an object store need an external lock (or a
store with conditional-put, wired in here) — the engine's intended
deployment is one tail/apply driver per table, which needs neither.
"""
from __future__ import annotations

import json
import posixpath

import pyarrow.fs as pafs


def resolve_fs(path: str, filesystem: pafs.FileSystem | None = None):
    """Return ``(fs, normalized_path)``. An explicit ``filesystem`` wins
    (path used verbatim); a URI like ``s3://bucket/x`` resolves via
    ``FileSystem.from_uri``; a bare path means local disk."""
    if filesystem is not None:
        return filesystem, path
    if "://" in path:
        fs, p = pafs.FileSystem.from_uri(path)
        return fs, p
    return pafs.LocalFileSystem(), path


def exists(fs: pafs.FileSystem, path: str) -> bool:
    return fs.get_file_info(path).type != pafs.FileType.NotFound


def read_json(fs: pafs.FileSystem, path: str):
    """Parse a JSON file, or None when it does not exist."""
    if not exists(fs, path):
        return None
    with fs.open_input_stream(path) as f:
        return json.loads(f.read().decode())


def write_json_atomic(fs: pafs.FileSystem, path: str, obj) -> None:
    """Commit a JSON file via tmp + move (atomic rename on local FS; a
    single-object switch on object stores — see module docstring)."""
    tmp = path + ".tmp"
    with fs.open_output_stream(tmp) as f:
        f.write(json.dumps(obj).encode())
    fs.move(tmp, path)


def list_subdirs(fs: pafs.FileSystem, path: str) -> list[str]:
    """Immediate child directory NAMES of ``path`` (sorted; [] if absent)."""
    sel = pafs.FileSelector(path, recursive=False, allow_not_found=True)
    return sorted(
        posixpath.basename(i.path.rstrip("/"))
        for i in fs.get_file_info(sel)
        if i.type == pafs.FileType.Directory
    )


def list_parquet(fs: pafs.FileSystem, path: str, recursive: bool = False) -> list[str]:
    """Full paths of ``*.parquet`` files under ``path`` (sorted; [] if
    absent)."""
    sel = pafs.FileSelector(path, recursive=recursive, allow_not_found=True)
    return sorted(
        i.path
        for i in fs.get_file_info(sel)
        if i.type == pafs.FileType.File and i.path.endswith(".parquet")
    )


def delete_dir(fs: pafs.FileSystem, path: str) -> None:
    if exists(fs, path):
        fs.delete_dir(path)
