"""Minimal ACID table format: a commit log over immutable parquet.

The reference names Parquet/Delta/Iceberg as its lake formats; this
module supplies the missing transactional layer with the same core
protocol those formats use, reduced to its essentials:

- **Immutable data files, visible only via the log.** Writers stage
  parquet files under ``<table>/data/<uuid>/`` first; a file is part
  of the table iff an ``add`` action in a committed log entry names
  it. Orphaned staging files (a writer that died mid-job) are
  invisible garbage, never partial state — the Delta/Iceberg
  object-store contract.
- **Atomic commits by put-if-absent.** A commit is one JSON file
  ``_commits/<version 20d>.json`` created with ``os.link`` (hard
  link from a staged temp file), which atomically fails if the
  version already exists. Exactly one writer wins a version; losers
  re-read the new snapshot and retry (optimistic concurrency). On a
  real object store the same slot is filled by a put-if-absent /
  conditional-put call or a commit-coordinator service.
- **Snapshot isolation + time travel.** A read resolves the log once
  and pins the file set of that version; concurrent commits never
  change a running query's inputs. ``snapshot(as_of=N)`` replays the
  log up to version N — time travel is free because data files are
  never mutated, only added/removed by later commits.
- **MERGE is copy-on-write.** ``merge`` rewrites the table through
  operators/upsert.merge_upsert (the anti-join + union plan a
  format's MERGE INTO lowers to) into NEW files and commits
  ``remove`` of the old set + ``add`` of the new set in ONE log
  entry — readers see the old or the new table, never a mix.

At 100 TB: the log holds per-commit ``add``/``remove`` ACTIONS (not
full listings), so commit cost is O(files touched); snapshot
resolution replays the log, which real formats bound with periodic
checkpoints — the replay here is a driver-side fold over a few KB of
JSON per commit. Full-table copy-on-write MERGE is the v1
simplification; the format-grade refinement (partition-pruned
rewrite, merge-on-read deletes) changes which files the same commit
protocol adds/removes, not the protocol itself.
"""

from __future__ import annotations

import json
import os
import time
import uuid
from collections.abc import Sequence
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

_COMMITS = "_commits"
_DATA = "data"


class CommitConflict(Exception):
    """Another writer committed this version first (caller retries)."""


@dataclass(frozen=True)
class Commit:
    version: int
    op: str
    ts: float
    add: list[str]
    remove: list[str]
    schema_json: str


def _commit_path(table: str, version: int) -> str:
    return os.path.join(table, _COMMITS, f"{version:020d}.json")


class AcidTable:
    """Handle to one commit-log table rooted at ``path``."""

    def __init__(self, spark: SparkSession, path: str):
        self.spark = spark
        self.path = path
        os.makedirs(os.path.join(path, _COMMITS), exist_ok=True)
        os.makedirs(os.path.join(path, _DATA), exist_ok=True)

    # ---- log primitives -------------------------------------------------

    def latest_version(self) -> int:
        """-1 when the table has no commits yet."""
        names = [
            n
            for n in os.listdir(os.path.join(self.path, _COMMITS))
            if n.endswith(".json")
        ]
        return max((int(n[:-5]) for n in names), default=-1)

    def history(self) -> list[Commit]:
        out = []
        for v in range(self.latest_version() + 1):
            with open(_commit_path(self.path, v)) as f:
                d = json.load(f)
            out.append(
                Commit(
                    version=d["version"],
                    op=d["op"],
                    ts=d["ts"],
                    add=d["add"],
                    remove=d["remove"],
                    schema_json=d["schema"],
                )
            )
        return out

    def _resolve(self, as_of: int | None = None) -> tuple[list[str], str | None]:
        """Replay the action log → (live files, latest schema json)."""
        live: set[str] = set()
        schema = None
        for c in self.history():
            if as_of is not None and c.version > as_of:
                break
            live -= set(c.remove)
            live |= set(c.add)
            schema = c.schema_json
        return sorted(live), schema

    def _try_commit(
        self, version: int, op: str, add: list[str], remove: list[str], schema_json: str
    ) -> int:
        """Put-if-absent commit: hard-link a staged temp file into the
        version slot. POSIX ``link`` fails with EEXIST if a concurrent
        writer already owns the version — the whole ACID story rests
        on this one atomic primitive."""
        body = {
            "version": version,
            "op": op,
            "ts": time.time(),
            "add": add,
            "remove": remove,
            "schema": schema_json,
        }
        tmp = os.path.join(
            self.path, _COMMITS, f".tmp-{uuid.uuid4().hex}.json"
        )
        with open(tmp, "w") as f:
            json.dump(body, f)
            f.flush()
            os.fsync(f.fileno())
        try:
            os.link(tmp, _commit_path(self.path, version))
        except FileExistsError as e:
            raise CommitConflict(f"version {version} already committed") from e
        finally:
            os.remove(tmp)
        return version

    # ---- data-file staging ----------------------------------------------

    def _stage(self, df: DataFrame) -> tuple[list[str], str]:
        """Write ``df`` to a fresh staging dir under data/; the files
        are invisible until a commit references them."""
        stage_id = uuid.uuid4().hex
        stage_dir = os.path.join(self.path, _DATA, stage_id)
        df.write.mode("error").parquet(stage_dir)
        files = [
            os.path.join(_DATA, stage_id, n)
            for n in os.listdir(stage_dir)
            if n.endswith(".parquet")
        ]
        return sorted(files), df.schema.json()

    # ---- public operations ----------------------------------------------

    def append(self, df: DataFrame, *, max_retries: int = 10) -> int:
        """Transactional append. Data files are written ONCE; only the
        (cheap) commit is retried on conflict — appends commute, so a
        lost race needs no re-read."""
        add, schema = self._stage(df)
        for _ in range(max_retries):
            try:
                return self._try_commit(
                    self.latest_version() + 1, "append", add, [], schema
                )
            except CommitConflict:
                continue
        raise CommitConflict(f"append lost {max_retries} commit races")

    def overwrite(self, df: DataFrame, *, max_retries: int = 10) -> int:
        """Atomic full-table replace (remove every live file + add the
        new set in one commit)."""
        add, schema = self._stage(df)
        for _ in range(max_retries):
            base = self.latest_version()
            live, _ = self._resolve(base if base >= 0 else None)
            try:
                return self._try_commit(base + 1, "overwrite", add, live, schema)
            except CommitConflict:
                continue
        raise CommitConflict(f"overwrite lost {max_retries} commit races")

    def snapshot(self, as_of: int | None = None) -> DataFrame:
        """Read the table as of a version (default: latest). The file
        list is pinned at call time — later commits don't leak in."""
        files, schema = self._resolve(as_of)
        if not files:
            if schema is None:
                raise ValueError(f"table {self.path} has no commits")
            return self.spark.createDataFrame(
                [], T.StructType.fromJson(json.loads(schema))
            )
        return self.spark.read.parquet(
            *[os.path.join(self.path, f) for f in files]
        )

    def merge(
        self,
        updates: DataFrame,
        keys: Sequence[str],
        *,
        dedupe_order: str | None = None,
        max_retries: int = 5,
    ) -> int:
        """MERGE INTO (upsert) with snapshot-isolated copy-on-write:
        read a pinned snapshot, apply operators/upsert.merge_upsert,
        stage the result, and commit remove(old)+add(new) atomically.
        A commit conflict re-reads the NEW snapshot and re-runs the
        merge — classic optimistic concurrency, so concurrent merges
        serialize instead of silently dropping one writer's rows."""
        from data_lake_demo_spark.operators.upsert import merge_upsert

        for _ in range(max_retries):
            base = self.latest_version()
            old_files, _ = self._resolve(base if base >= 0 else None)
            target = self.snapshot(base if base >= 0 else None)
            merged = merge_upsert(
                target, updates, keys, dedupe_order=dedupe_order
            )
            add, schema = self._stage(merged)
            try:
                return self._try_commit(base + 1, "merge", add, old_files, schema)
            except CommitConflict:
                continue
        raise CommitConflict(f"merge lost {max_retries} commit races")
