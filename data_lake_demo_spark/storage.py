"""Commit-log storage primitive for the ACID table format.

The whole transactional story in tableformat.py rests on ONE storage
capability: *put-if-absent* of a small immutable object (a commit JSON)
at a well-known name. Everything else the log needs is list + read.
This module isolates that contract behind ``LogStore`` so the table
format is object-store-ready:

- ``LocalFSLogStore`` — POSIX directory; put-if-absent via ``os.link``
  (hard link creation fails atomically with EEXIST). Temp files are
  staged WITHOUT the ``.json`` suffix so a concurrent lister never
  mistakes an in-flight staging file for a commit, and a writer killed
  between staging and cleanup leaves junk that is ignored (and
  eventually swept), never a parse error.
- ``InMemoryLogStore`` — dict + lock; the conformance fake. Lets the
  concurrency / checkpoint / time-travel tests run against a second
  backend, proving the table format depends only on the interface.

On S3/GCS/ABFS the same interface maps to a conditional PUT
(``If-None-Match: *`` on S3, ``ifGenerationMatch=0`` on GCS) or a
commit-coordinator service — exactly how Delta/Iceberg implement their
log on object stores. Data files (parquet) are NOT behind this
interface: Spark reads/writes them through its own Hadoop-FS layer,
and they are immutable-once-staged, so they need no put-if-absent.

Reference parity: the reference's S3 writes are idempotent-by-key
(worker.py:214-221); this layer is the transactional generalization
the reference's own docs reach for when they name Delta/Iceberg
(README.md:253).
"""

from __future__ import annotations

import os
import threading
import uuid


class LogStore:
    """Minimal object-store contract the commit log needs.

    Names are flat (no directories); values are small immutable byte
    strings. ``put_if_absent`` MUST be atomic: exactly one writer of a
    given name succeeds, all others get ``FileExistsError``.
    """

    def put_if_absent(self, name: str, data: bytes) -> None:
        raise NotImplementedError

    def list_names(self) -> list[str]:
        raise NotImplementedError

    def read(self, name: str) -> bytes:
        raise NotImplementedError


class LocalFSLogStore(LogStore):
    """POSIX-directory backend. Atomicity comes from ``os.link``:
    creating a hard link fails with EEXIST iff the target exists —
    a kernel-level compare-and-swap on the directory entry."""

    # temp prefix deliberately contains no ".json": listers filter on
    # suffix + digit stem, so in-flight or leaked temp files are inert
    _TMP_PREFIX = ".tmp-"

    def __init__(self, root: str):
        self.root = root
        os.makedirs(root, exist_ok=True)

    def put_if_absent(self, name: str, data: bytes) -> None:
        tmp = os.path.join(self.root, f"{self._TMP_PREFIX}{uuid.uuid4().hex}")
        with open(tmp, "wb") as f:
            f.write(data)
            f.flush()
            os.fsync(f.fileno())
        try:
            os.link(tmp, os.path.join(self.root, name))
        finally:
            # a crash before this leaves only an ignorable .tmp- file
            os.remove(tmp)

    def list_names(self) -> list[str]:
        return sorted(
            n
            for n in os.listdir(self.root)
            if not n.startswith(self._TMP_PREFIX)
        )

    def read(self, name: str) -> bytes:
        with open(os.path.join(self.root, name), "rb") as f:
            return f.read()


class InMemoryLogStore(LogStore):
    """Dict-backed conformance fake (thread-safe). Also counts reads so
    tests can assert checkpointing bounds log replay cost."""

    def __init__(self):
        self._lock = threading.Lock()
        self._objects: dict[str, bytes] = {}
        self.reads = 0

    def put_if_absent(self, name: str, data: bytes) -> None:
        with self._lock:
            if name in self._objects:
                raise FileExistsError(name)
            self._objects[name] = data

    def list_names(self) -> list[str]:
        with self._lock:
            return sorted(self._objects)

    def read(self, name: str) -> bytes:
        with self._lock:
            self.reads += 1
            return self._objects[name]
