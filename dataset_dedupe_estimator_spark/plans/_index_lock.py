"""Single-writer guard shared by the persistent indexes.

The chunk index (`plans/chunk_index.py`) and LSH doc index
(`plans/lsh_index.py`) use the same commit protocol: write the next
``gen-NNNNN`` directory, then atomically commit it by rewriting the
manifest. That protocol is crash-safe for ONE writer, but two concurrent
writers both read ``meta['generations']``, target the same generation
directory, and each treats the other's in-flight directory as a crashed
orphan (``shutil.rmtree``) — the surviving manifest can then commit a
generation holding the *other* writer's rows, silently dropping admitted
chunks / band rows.

`writer_lock` makes the single-writer contract explicit and cheap to
enforce: an ``O_CREAT|O_EXCL`` lockfile in the index directory held for
the duration of every build/update/admit/compact. A lock left behind by
a crashed writer on the SAME host is broken automatically when its
recorded pid no longer exists; a lock whose pid is alive (or from
another host, where liveness can't be probed) raises
`ConcurrentWriterError` instead of risking a dropped generation.

Index *readers* never take the lock: the manifest commit is atomic
(`os.replace`), so readers always see a consistent committed state.
"""

from __future__ import annotations

import contextlib
import os
import socket
from pathlib import Path

LOCK_NAME = "_writer.lock"


class ConcurrentWriterError(RuntimeError):
    """Another build/update/admit/compact holds this index's writer lock."""


def _lock_is_stale(lock: Path) -> bool:
    """A lock is provably stale only if it was taken on THIS host by a
    pid that no longer exists. Anything unparseable or remote is treated
    as live — refusing is always safe, breaking is not."""
    try:
        fields = dict(
            line.split("=", 1)
            for line in lock.read_text().splitlines()
            if "=" in line
        )
        if fields.get("host") != socket.gethostname():
            return False
        pid = int(fields["pid"])
    except (OSError, KeyError, ValueError):
        return False
    try:
        os.kill(pid, 0)
    except ProcessLookupError:
        return True
    except PermissionError:
        return False  # exists, owned by someone else
    return False


@contextlib.contextmanager
def writer_lock(index_dir: str | Path):
    """Hold the index's exclusive writer lock for the duration of a
    mutation. Raises `ConcurrentWriterError` if another writer holds it."""
    index_dir = Path(index_dir)
    index_dir.mkdir(parents=True, exist_ok=True)
    lock = index_dir / LOCK_NAME
    for attempt in (0, 1):
        try:
            fd = os.open(lock, os.O_CREAT | os.O_EXCL | os.O_WRONLY)
            break
        except FileExistsError:
            if attempt == 0 and _lock_is_stale(lock):
                lock.unlink(missing_ok=True)  # crashed same-host writer
                continue
            raise ConcurrentWriterError(
                f"{index_dir} is being written by another process "
                f"(lock: {lock}); indexes are single-writer — retry after "
                "it finishes, or delete the lockfile if its owner crashed "
                "on another host"
            ) from None
    try:
        os.write(fd, f"pid={os.getpid()}\nhost={socket.gethostname()}\n".encode())
        os.close(fd)
        yield
    finally:
        lock.unlink(missing_ok=True)
