"""Process-lifetime build-once index caches for the *_index_serve /
*_index_update registry rows.

Contract (shared by the containment, simhash, and IVF-PQ serve rows):
the registry fn is called repeatedly (driver cert at two SFs, bench
best-of-N), and the steady-state plan is build-once/serve-per-batch —
so the index build runs on first touch and every later call measures
the serve. Two hygiene guarantees (ADVICE r9):

- **Cleanup**: every temp dir this module hands out is removed at
  interpreter exit (atexit); a long pytest/bench process no longer
  leaks one mkdtemp per (index family x sf_dir).
- **Cache busting**: the cache key includes a fingerprint of the
  source parquet (path + mtime_ns + size), so regenerating the data
  at the same sf_dir within one process builds a fresh index instead
  of silently serving a stale one.
"""

from __future__ import annotations

import atexit
import os
import shutil
import tempfile
from typing import Callable

__all__ = ["build_once", "data_token"]

_LIVE_DIRS: list[str] = []


def _cleanup() -> None:
    for d in _LIVE_DIRS:
        shutil.rmtree(d, ignore_errors=True)


atexit.register(_cleanup)


def data_token(sf_dir: str, table: str) -> tuple:
    """Fingerprint of ``{sf_dir}/{table}.parquet``. For a single file,
    (mtime_ns, size) of the file itself. For a directory-style parquet
    the directory's own stat is NOT enough — an in-place rewrite that
    keeps the same part-file names leaves the dir's mtime_ns and size
    unchanged (ADVICE r10) — so fold in max(mtime_ns) and sum(size)
    over the directory entries. One level of recursion into
    subdirectories covers partitionBy layouts, whose part files live
    inside ``key=value/`` subdirs — an in-place part-file overwrite
    there changes neither the subdir's mtime nor its size (ADVICE
    r11). Deeper nesting (multi-column partitionBy) is out of scope
    for these fixture tables and documented as unsupported."""
    p = os.path.join(sf_dir, f"{table}.parquet")
    try:
        st = os.stat(p)
        mtime, size = st.st_mtime_ns, st.st_size
        if os.path.isdir(p):
            with os.scandir(p) as it:
                for e in it:
                    est = e.stat()
                    mtime = max(mtime, est.st_mtime_ns)
                    size += est.st_size
                    if e.is_dir():
                        with os.scandir(e.path) as it2:
                            for e2 in it2:
                                est2 = e2.stat()
                                mtime = max(mtime, est2.st_mtime_ns)
                                size += est2.st_size
        return (os.path.abspath(p), mtime, size)
    except OSError:
        return (os.path.abspath(p), 0, 0)


def build_once(
    cache: dict,
    sf_dir: str,
    table: str,
    prefix: str,
    builder: Callable[[str], None],
    subpath: str = "",
) -> str:
    """Return the cached index path for (sf_dir, data fingerprint),
    building it via ``builder(path)`` on first touch. ``subpath``
    appends a component to the fresh temp dir before the builder runs
    (the simhash index persists under ``<dir>/fingerprints``)."""
    key = (sf_dir, data_token(sf_dir, table))
    idx = cache.get(key)
    if idx is None:
        root = tempfile.mkdtemp(prefix=prefix)
        _LIVE_DIRS.append(root)
        idx = os.path.join(root, subpath) if subpath else root
        builder(idx)
        cache[key] = idx
    return idx
