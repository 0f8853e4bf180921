"""Deterministic /tmp build-dir cache shared by the round-trip source/sink
registry queries (binaryFile, ORC, text).

Key = kind + caller fingerprint, where the fingerprint must cover BOTH the
generator version (bump on format change) and the source data identity
(path + size + mtime of the backing parquet) — a cache keyed on path alone
serves stale bytes after the test data is regenerated.

Build protocol: write into a private ``.build-<pid>`` directory, then
atomically ``os.rename`` into place. Concurrent builders race on the
rename; the loser discards its copy (content is deterministic, so either
copy is correct) and readers never observe a partial directory.
"""

from __future__ import annotations

import hashlib
import os
import shutil
import tempfile
from collections.abc import Callable


def file_fingerprint(path: str) -> str:
    """Identity of a source file for cache keys: abspath + size + mtime."""
    st = os.stat(path)
    return f"{os.path.abspath(path)}:{st.st_size}:{st.st_mtime_ns}"


def cached_tmp_build(kind: str, fingerprint: str,
                     build_fn: Callable[[str], None]) -> str:
    """Return a cached directory for (kind, fingerprint), building it via
    ``build_fn(private_dir)`` on first use.

    The cache path incorporates the uid: /tmp is world-shared, and without
    it a second OS user running the suite collides on the same etlbs-* dir
    and fails on the other user's file permissions. A build_fn that raises
    has its private build dir removed before the exception propagates."""
    key = hashlib.md5(f"{kind}:{fingerprint}".encode()).hexdigest()[:12]
    out = os.path.join(
        tempfile.gettempdir(), f"etlbs-u{os.getuid()}-{kind}-{key}"
    )
    if not os.path.isdir(out):
        build = f"{out}.build-{os.getpid()}"
        try:
            build_fn(build)
        except BaseException:
            shutil.rmtree(build, ignore_errors=True)
            raise
        try:
            os.rename(build, out)
        except OSError:
            shutil.rmtree(build, ignore_errors=True)  # lost the build race
    return out
