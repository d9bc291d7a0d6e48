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
full listings) with per-file footer [min, max] stats (the Iceberg
manifest idiom), so commit cost is O(files touched) and MERGE prunes
provably-unmatchable files without opening any data file. Snapshot
resolution starts from the newest CHECKPOINT at-or-before the target
version (a materialized {live files, schema, txn watermarks} written
every ``checkpoint_interval`` commits — Delta's `_last_checkpoint`
idiom) and replays only the commits after it, so resolution cost is
O(interval), not O(table age).

Storage is abstracted behind ``storage.LogStore`` (put-if-absent /
list / read): ``LocalFSLogStore`` for POSIX (os.link atomicity),
``InMemoryLogStore`` as the conformance fake; an object-store backend
maps put-if-absent to S3 conditional PUT. Data files stay on Spark's
own Hadoop-FS layer — immutable once staged, they need no CAS.

The full verb set: ``append`` (idempotent per (app, batch_id) —
exactly-once streaming via ``foreach_batch_sink``), ``overwrite``,
``merge`` (file-skipping copy-on-write), ``delete`` (predicate
copy-on-write that rewrites only files whose stats can match),
``scd2``, ``compact`` (bin-packing OPTIMIZE), ``optimize_zorder``
(multi-column layout for stats selectivity), ``restore`` (roll the
live set back to an earlier version as a NEW commit), ``vacuum``
(snapshot-aware GC), ``snapshot`` (latest or time-travel, with
additive schema evolution via parquet schema merge), and ``scan``
(manifest-pruned read: simple predicates skip files by footer
[min, max] before Spark ever plans the scan — Iceberg's planning
step). ``append``/``overwrite`` take ``partition_by`` to cluster
rows so each file covers one (or few) partition values, which is
what makes scan/merge/delete pruning selective.
"""

from __future__ import annotations

import base64
import hashlib
import json
import os
import re
import time
import uuid
from collections.abc import Sequence
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from data_lake_demo_spark.storage import LocalFSLogStore, LogStore

_COMMITS = "_commits"
_DATA = "data"
_CKPT_SUFFIX = ".checkpoint.json"


class CommitConflict(Exception):
    """Another writer committed this version first (caller retries)."""


@dataclass(frozen=True)
class Commit:
    version: int
    op: str
    ts: float
    add: list[dict]  # {"path": str, "stats": {col: [min, max]}}
    remove: list[str]
    schema_json: str
    txn: dict | None = None  # {"app": str, "batch_id": int}
    # table properties SNAPSHOT (constraints etc.); None = carry the
    # previous commit's properties forward unchanged
    props: dict | None = None
    # deletion-vector actions: [{"path", "del" (packed b64), "n"}] —
    # each entry REPLACES the file's whole vector (merge-on-read)
    dv: list[dict] | None = None


# ---- deletion-vector codec -----------------------------------------------
#
# Three wire formats coexist (the string is what rides commit JSON /
# checkpoints, and what conflict checks compare for equality):
#
# - ``r1:<base64 varint-RLE>`` — the current inline encoding: runs of
#   consecutive row indices collapse to LEB128-varint (gap, len-1)
#   pairs, so a contiguous 10M-row delete is a handful of bytes where
#   the legacy packing spent 8 bytes/row. Canonical: a given index
#   SET has exactly one encoding, so two writers deleting the same
#   rows still produce byte-identical vectors (the property conflict
#   detection and CDF's changed-vector diff rely on).
# - ``sc1:<path>:<n_rows>`` — a sidecar reference (the Delta
#   protocol's deletion-vector descriptor shape): when the r1 payload
#   outgrows ``_DV_INLINE_MAX``, its bytes spill to a
#   content-addressed file ``data/dvs/dv-<sha256[:32]>.bin`` and only
#   this reference rides the log. The name IS the checksum (verified
#   on read); content addressing keeps canonicality — same rows, same
#   payload, same path, same reference string. ``n_rows`` rides the
#   reference so cardinality queries (row_count, DESCRIBE surfaces)
#   never open the sidecar. Sidecars are immutable and vacuumed like
#   data files once no retained snapshot references them.
# - legacy bare base64 of little-endian int64s (pre-r10 commits) —
#   still decoded, never produced; distinguished by having no ``:``
#   (the base64 alphabet excludes it).
_DV_RLE_PREFIX = "r1:"
_DV_SIDECAR_PREFIX = "sc1:"
_DV_SIDECAR_DIR = "dvs"
_DV_INLINE_MAX = 2048  # max chars of encoded vector inline in the log


def _dv_varints(vals) -> bytes:
    """LEB128-encode a non-negative int64 numpy array, vectorized —
    per-value bytes stay contiguous via the row-major mask gather."""
    import numpy as np

    v = np.asarray(vals, dtype=np.uint64)
    if v.size == 0:
        return b""
    cols = []
    w = v.copy()
    while True:
        b = (w & np.uint64(0x7F)).astype(np.uint8)
        w >>= np.uint64(7)
        more = w != 0
        cols.append(b | (more.astype(np.uint8) << 7))
        if not more.any():
            break
    mat = np.stack(cols, axis=1)
    nbytes = np.ones(v.size, dtype=np.int64)
    w = v >> np.uint64(7)
    while (w != 0).any():
        nbytes += w != 0
        w >>= np.uint64(7)
    mask = np.arange(mat.shape[1]) < nbytes[:, None]
    return mat[mask].tobytes()


def _dv_unvarints(data: bytes):
    """Decode a LEB128 stream to an int64 numpy array (vectorized:
    terminator bytes mark group ends; reduceat sums the shifted
    7-bit limbs per group)."""
    import numpy as np

    b = np.frombuffer(data, dtype=np.uint8)
    if b.size == 0:
        return np.empty(0, dtype=np.int64)
    ends = (b & 0x80) == 0
    starts = np.empty(b.size, dtype=bool)
    starts[0] = True
    starts[1:] = ends[:-1]
    group = np.cumsum(starts) - 1
    first = np.flatnonzero(starts)
    pos = np.arange(b.size) - first[group]
    contrib = (b & np.uint64(0x7F)).astype(np.uint64) << (
        np.uint64(7) * pos.astype(np.uint64)
    )
    return np.add.reduceat(contrib, first).astype(np.int64)


def _dv_encode_runs(indices) -> tuple[bytes, int]:
    """Row indices (any order, dups ok) → (canonical varint-RLE
    payload, distinct count)."""
    import numpy as np

    if not isinstance(indices, (list, tuple, np.ndarray)):
        indices = list(indices)
    a = np.unique(np.asarray(indices, dtype=np.int64))
    if a.size == 0:
        return b"", 0
    breaks = np.flatnonzero(np.diff(a) != 1)
    starts = a[np.concatenate(([0], breaks + 1))]
    ends = a[np.concatenate((breaks, [a.size - 1]))]
    lens = ends - starts + 1
    gaps = np.empty_like(starts)
    gaps[0] = starts[0]
    gaps[1:] = starts[1:] - (ends[:-1] + 1)
    pairs = np.empty(2 * starts.size, dtype=np.int64)
    pairs[0::2] = gaps
    pairs[1::2] = lens - 1
    return _dv_varints(pairs), int(a.size)


def _dv_decode_runs(payload: bytes) -> list[int]:
    """Inverse of ``_dv_encode_runs`` → sorted index list."""
    import numpy as np

    pairs = _dv_unvarints(payload)
    if pairs.size == 0:
        return []
    gaps, lens = pairs[0::2], pairs[1::2] + 1
    starts = np.cumsum(gaps + np.concatenate(([0], lens[:-1])))
    total = int(lens.sum())
    steps = np.ones(total, dtype=np.int64)
    firsts = np.concatenate(([0], np.cumsum(lens)[:-1]))
    steps[firsts] = starts - np.concatenate(([0], starts[:-1] + lens[:-1] - 1))
    steps[0] = starts[0]
    return np.cumsum(steps).tolist()


def _dv_sidecar_read(ref: str, root: str | None) -> bytes:
    """Resolve + checksum-verify an ``sc1:`` reference's payload."""
    rel, _, _ = ref[len(_DV_SIDECAR_PREFIX):].rpartition(":")
    full = rel if os.path.isabs(rel) else os.path.join(root or ".", rel)
    with open(full, "rb") as f:
        payload = f.read()
    want = os.path.basename(rel)[3:-4]  # dv-<sha>.bin
    got = hashlib.sha256(payload).hexdigest()[: len(want)]
    if got != want:
        raise ValueError(
            f"deletion-vector sidecar {rel} is corrupt "
            f"(checksum {got} != {want})"
        )
    return payload


def _pack_dv(indices) -> str:
    """Row indices → canonical inline ``r1:`` vector string (spilling
    variants go through ``AcidTable._dv_entry``, which needs the
    table root)."""
    payload, _ = _dv_encode_runs(indices)
    return _DV_RLE_PREFIX + base64.b64encode(payload).decode()


def _unpack_dv(val: str, root: str | None = None) -> list[int]:
    """Vector string (any of the three formats) → sorted index list.
    ``root`` resolves relative sidecar references (the table path)."""
    if not val:
        return []
    if val.startswith(_DV_RLE_PREFIX):
        return _dv_decode_runs(base64.b64decode(val[len(_DV_RLE_PREFIX):]))
    if val.startswith(_DV_SIDECAR_PREFIX):
        return _dv_decode_runs(_dv_sidecar_read(val, root))
    import array as _array

    a = _array.array("q")
    a.frombytes(base64.b64decode(val))
    return list(a)


def _dv_count(val: str | None) -> int:
    """Masked-row count of a vector string WITHOUT hydrating indices
    (and without opening sidecars — the count rides the reference)."""
    if not val:
        return 0
    if val.startswith(_DV_SIDECAR_PREFIX):
        return int(val.rsplit(":", 1)[1])
    if val.startswith(_DV_RLE_PREFIX):
        pairs = _dv_unvarints(base64.b64decode(val[len(_DV_RLE_PREFIX):]))
        return int((pairs[1::2] + 1).sum()) if pairs.size else 0
    return len(base64.b64decode(val)) // 8


def _dv_encode_group(pdf):
    """``groupBy(__fp).applyInPandas`` kernel: per-file varint-RLE
    encode EXECUTOR-side — the driver collects one (payload, n) row
    per touched file (O(compressed vector bytes)), never the
    O(matched rows) Row list. When the group carries an ``__exref``
    column (the file's EXISTING vector, absolutized), the union with
    the accumulated vector also happens here: the executor hydrates
    the sidecar off shared storage exactly like a data file, so the
    driver never holds O(masked rows) even after a file accumulates a
    multi-million-row vector across repeated merge-on-read writes."""
    import numpy as np
    import pandas as pd

    idx = pdf["__ri"].to_numpy(dtype="int64")
    if "__exref" in pdf.columns:
        ref = pdf["__exref"].iloc[0]
        if isinstance(ref, str) and ref:
            idx = np.concatenate(
                [idx, np.asarray(_unpack_dv(ref), dtype=np.int64)]
            )
    payload, n = _dv_encode_runs(idx)
    return pd.DataFrame(
        {"__fp": [pdf["__fp"].iloc[0]], "payload": [payload], "n": [n]}
    )


def _dv_expand_refs(iterator):
    """``mapInPandas`` kernel: (file, vector-ref) rows → (file, row
    index) tombstones, decoded executor-side. Sidecar references
    arrive absolutized, so the executor reads them off shared storage
    exactly like a data file."""
    import pandas as pd

    for pdf in iterator:
        for fp, ref in zip(pdf["__fp"], pdf["__ref"]):
            idx = _unpack_dv(ref)
            if idx:
                yield pd.DataFrame({"__fp": fp, "__ri": idx})


def _dv_sidecar_rel(val: str | None) -> str | None:
    """Table-relative sidecar path of a reference (None for inline /
    legacy vectors and for absolute references into another table)."""
    if not val or not val.startswith(_DV_SIDECAR_PREFIX):
        return None
    rel, _, _ = val[len(_DV_SIDECAR_PREFIX):].rpartition(":")
    return None if os.path.isabs(rel) else rel


def _dv_abs(val: str | None, root: str) -> str | None:
    """Absolutize a relative sidecar reference (for shallow CLONE
    commits and executor-shipped partitions, which resolve without a
    table root)."""
    if not val or not val.startswith(_DV_SIDECAR_PREFIX):
        return val
    rel, _, n = val[len(_DV_SIDECAR_PREFIX):].rpartition(":")
    if os.path.isabs(rel):
        return val
    return f"{_DV_SIDECAR_PREFIX}{os.path.abspath(os.path.join(root, rel))}:{n}"


def _commit_name(version: int) -> str:
    return f"{version:020d}.json"


def _ckpt_name(version: int) -> str:
    return f"{version:020d}{_CKPT_SUFFIX}"


# ---- manifest-level predicate pruning -----------------------------------
#
# Filters are pyarrow/Iceberg-style triples ``(col, op, value)`` with
# op in {=, <, <=, >, >=, in, between} — the null-rejecting subset, so
# pruning on non-null footer [min, max] ranges is sound (a row where
# the column is NULL matches none of these ops, and parquet stats
# describe exactly the non-null values).

_FILTER_OPS = {"=", "<", "<=", ">", ">=", "in", "between"}

# ---- per-file bloom-filter indexes --------------------------------------
#
# [min, max] ranges can't prune point lookups on high-cardinality keys
# whose values interleave across files (uuid-ish ids, hashes): every
# file's range overlaps every probe. A per-file bloom over the column
# (Iceberg's parquet bloom properties / Delta's bloom index) answers
# "can this file contain value v?" probabilistically with no false
# NEGATIVES, so skipping on a bloom miss is sound for the
# null-rejecting `=` / `in` ops. The hash family is md5-derived double
# hashing over the value's canonical STRING cast — portable between
# the Spark build side and the driver-side Python probe with no
# native-hash reimplementation (the same engine-portability trick as
# the repo's portable MinHash family). Intended for integer/string
# key columns. Sizing: k=4 hashes and the default 2^17 bits give
# FPP ≈ 0.2% at 10k distinct values/file and ~18% (still partial
# pruning) at 50k — pass ``bloom_bits`` matched to your file sizing,
# ~13+ bits per distinct value per file; the manifest entry costs
# bits/6 bytes of base64 per file per column (~22 KiB at the default).

_BLOOM_BITS = 1 << 17
_BLOOM_HASHES = 4


def _bloom_positions_py(val, m: int, k: int) -> list[int]:
    h = hashlib.md5(str(val).encode()).hexdigest()
    h1 = int(h[0:15], 16)
    h2 = int(h[15:30], 16) | 1
    return [(h1 + i * h2) % m for i in range(k)]


def _bloom_may_contain(entry: list, val) -> bool:
    """False only when the bloom PROVES ``val`` absent from the file."""
    try:
        m, k, b64 = int(entry[0]), int(entry[1]), entry[2]
        bits = base64.b64decode(b64)
        return all(
            (bits[p // 8] >> (p % 8)) & 1
            for p in _bloom_positions_py(val, m, k)
        )
    except Exception:
        return True  # malformed entry: never a correctness issue


def _norm_stat_value(v):
    """Normalize a value for manifest-stats comparison. DATE values
    ride in the log as ISO strings (lexicographic order == date
    order — the Delta stats encoding); TIMESTAMPs are deliberately
    NOT normalized (timezone semantics differ between the parquet
    footer and Spark's session) — they compare as incomparable and
    pruning stays conservative."""
    import datetime

    if isinstance(v, datetime.datetime):
        return v  # incomparable to string stats ⇒ conservative keep
    if isinstance(v, datetime.date):
        return v.isoformat()
    return v


def _bump_prefix(s: str) -> str | None:
    """Smallest string that upper-bounds EVERY string starting with
    ``s`` (Iceberg's truncate-upper): bump the last bumpable code
    point, dropping any maxed-out tail. None if every code point is
    U+10FFFF (no finite bound exists). Bumping U+D7FF skips the
    surrogate block to U+E000 (Iceberg does the same): chr(0xD800) is
    a lone surrogate that cannot be UTF-8-encoded, so it would poison
    any consumer that re-encodes the stats string (Arrow/Spark via
    ``files()``, non-Python manifest readers) — U+E000 is the next
    valid scalar and still > every character ≤ U+D7FF, so the bound
    stays an upper bound."""
    cps = list(s)
    for i in range(len(cps) - 1, -1, -1):
        cp = ord(cps[i])
        if cp < 0x10FFFF:
            nxt = 0xE000 if cp == 0xD7FF else cp + 1
            return "".join(cps[:i]) + chr(nxt)
    return None


def _file_may_match(stats: dict[str, list], filters) -> bool:
    """False only when the footer stats PROVE no row in the file can
    satisfy every filter. Missing stats for a column mean 'may contain
    anything'; cross-type comparisons (schema drift across commits)
    conservatively keep the file."""
    for col, op, val in filters:
        if op in ("is_null", "is_not_null"):
            # null-count stats (Iceberg value_counts/null_value_counts):
            # [n_nulls, n_rows] under a reserved "#null:" key — absent
            # on pre-upgrade commits, which conservatively keeps files
            nc = stats.get(f"#null:{col}")
            if nc is not None:
                if op == "is_null" and nc[0] == 0:
                    return False
                if op == "is_not_null" and nc[0] == nc[1]:
                    return False
            continue
        bloom = stats.get(f"#bloom:{col}")
        if bloom is not None:
            # probe with the RAW value's str() — sound only when that
            # equals the build side's Spark cast-to-string. Blooms are
            # built for integral/string columns only (_bloom_stats),
            # so gate the probe to int/str values too: a bool is an
            # int subclass but strs as "True" vs Spark's "true", and a
            # float probe against an int column has no bloom match —
            # either would turn a bloom miss into a wrong prune.
            def _probe_ok(v):
                return isinstance(v, (int, str)) and not isinstance(v, bool)

            if (
                op == "="
                and _probe_ok(val)
                and not _bloom_may_contain(bloom, val)
            ):
                return False
            if op == "in" and all(
                _probe_ok(v) and not _bloom_may_contain(bloom, v)
                for v in val
            ):
                return False
        rng = stats.get(col)
        if rng is None:
            continue
        lo, hi = rng
        if op in ("in", "between"):
            val = [_norm_stat_value(v) for v in val]
            if op == "between":
                val = tuple(val)
        else:
            val = _norm_stat_value(val)
        try:
            if op == "starts_with":
                # s startswith p ⇒ s ≥ p, and s's first len(p) chars
                # equal p; a file can't match if its whole range sits
                # below p (hi < p) or above every p-prefixed string
                # (lo's prefix already > p). Sound with the Iceberg-
                # truncated bounds _file_meta stores for long strings:
                # the lower bound is a PREFIX of the true min (still
                # ≤ every value, so lo[:len(p)] > p stays conclusive),
                # and the upper bound is the bumped prefix (strictly
                # ≥ the true max, so hi < p stays conclusive).
                if hi < val or (
                    isinstance(lo, str) and lo[: len(val)] > val
                ):
                    return False
            elif op == "=":
                if val < lo or val > hi:
                    return False
            elif op == "<":
                if lo >= val:
                    return False
            elif op == "<=":
                if lo > val:
                    return False
            elif op == ">":
                if hi <= val:
                    return False
            elif op == ">=":
                if hi < val:
                    return False
            elif op == "in":
                if all(v < lo or v > hi for v in val):
                    return False
            elif op == "between":
                a, b = val
                if hi < a or lo > b:
                    return False
        except TypeError:
            continue  # incomparable stat/value types: keep the file
    return True


def _filters_to_predicate(filters):
    """The same filters as one Spark Column — applied as a residual on
    the pruned scan so results are EXACT even when a surviving file
    only partially matches (pruning is a performance tier, never the
    correctness tier)."""
    pred = F.lit(True)
    for col, op, val in filters:
        c = F.col(col)
        if op == "is_null":
            pred = pred & c.isNull()
        elif op == "is_not_null":
            pred = pred & c.isNotNull()
        elif op == "starts_with":
            pred = pred & c.startswith(val)
        elif op == "=":
            pred = pred & (c == F.lit(val))
        elif op == "<":
            pred = pred & (c < F.lit(val))
        elif op == "<=":
            pred = pred & (c <= F.lit(val))
        elif op == ">":
            pred = pred & (c > F.lit(val))
        elif op == ">=":
            pred = pred & (c >= F.lit(val))
        elif op == "in":
            pred = pred & c.isin(list(val))
        elif op == "between":
            pred = pred & c.between(F.lit(val[0]), F.lit(val[1]))
        else:
            raise ValueError(f"unsupported filter op {op!r}")
    return pred


class AcidTable:
    """Handle to one commit-log table rooted at ``path``.

    ``log_store`` defaults to a POSIX-backed ``LocalFSLogStore`` under
    ``<path>/_commits``; any ``storage.LogStore`` (e.g. the in-memory
    conformance fake, or an object-store adapter) can be substituted —
    the format depends only on put-if-absent / list / read.
    """

    # merge pruning collects the batch's distinct key values for the
    # bloom tier only below this bound — a CDC-sized batch qualifies,
    # a bulk backfill falls back to range pruning alone
    _BLOOM_PRUNE_MAX_KEYS = 10_000

    def __init__(
        self,
        spark: SparkSession,
        path: str,
        *,
        log_store: LogStore | None = None,
        checkpoint_interval: int = 20,
        bloom_cols: Sequence[str] = (),
        bloom_bits: int = _BLOOM_BITS,
        auto_compact_files: int | None = None,
        isolation: str = "write_serializable",
    ):
        self.spark = spark
        self.path = path
        self.checkpoint_interval = checkpoint_interval
        # Delta's two isolation levels: under the default
        # write_serializable, a blind append never conflicts with a
        # concurrent rewrite of OLD files (the serial order
        # rewrite-then-append explains the result); serializable
        # additionally fails a rewrite when a concurrent append may
        # match its scan predicate.
        if isolation not in ("write_serializable", "serializable"):
            raise ValueError(f"unknown isolation level {isolation!r}")
        self.isolation = isolation
        # writer-side property: this handle's writes attach per-file
        # bloom indexes for these (integer/string key) columns; readers
        # need nothing — the blooms ride the manifest like any stat
        if bloom_bits % 64:
            raise ValueError("bloom_bits must be a multiple of 64")
        self.bloom_cols = tuple(bloom_cols)
        self.bloom_bits = bloom_bits
        # Delta autoOptimize.autoCompact (writer-side policy): after an
        # append through THIS handle leaves more than N live files,
        # compact down to N in a follow-up commit. Pure layout — the
        # change feed of the compaction is empty, streams need
        # skipChangeCommits/CDF exactly as for manual OPTIMIZE.
        self.auto_compact_files = auto_compact_files
        self.log = log_store or LocalFSLogStore(os.path.join(path, _COMMITS))
        os.makedirs(os.path.join(path, _DATA), exist_ok=True)

    # ---- log primitives -------------------------------------------------

    @staticmethod
    def _is_commit(name: str) -> bool:
        # strict stem check: junk (leaked temp files, checkpoints,
        # foreign objects) is ignored, never a ValueError
        return name.endswith(".json") and name[:-5].isdigit()

    @staticmethod
    def _is_checkpoint(name: str) -> bool:
        return name.endswith(_CKPT_SUFFIX) and name[: -len(_CKPT_SUFFIX)].isdigit()

    def latest_version(self) -> int:
        """-1 when the table has no commits yet."""
        return max(
            (int(n[:-5]) for n in self.log.list_names() if self._is_commit(n)),
            default=-1,
        )

    def _read_commit(self, version: int) -> Commit:
        d = json.loads(self.log.read(_commit_name(version)))
        return Commit(
            version=d["version"],
            op=d["op"],
            ts=d["ts"],
            # tolerate the pre-stats action shape (bare paths)
            add=[
                a if isinstance(a, dict) else {"path": a, "stats": {}}
                for a in d["add"]
            ],
            remove=d["remove"],
            schema_json=d["schema"],
            txn=d.get("txn"),
            props=d.get("props"),
            dv=d.get("dv"),
        )

    def history(self) -> list[Commit]:
        """Full commit list, oldest first (audit/display surface —
        resolution hot paths use the checkpointed ``_resolve_state``)."""
        return [self._read_commit(v) for v in range(self.latest_version() + 1)]

    def _latest_checkpoint_version(self, le: int) -> int | None:
        """Newest checkpoint at-or-before version ``le`` (None if no
        checkpoint qualifies)."""
        best = None
        for n in self.log.list_names():
            if self._is_checkpoint(n):
                v = int(n[: -len(_CKPT_SUFFIX)])
                if v <= le and (best is None or v > best):
                    best = v
        return best

    def _resolve_state(
        self, as_of: int | None = None
    ) -> tuple[dict[str, dict], str | None, dict[str, int], dict, dict]:
        """({live file: stats}, schema, {app: txn watermark}, props,
        {file: packed deletion vector}) as of a version. Starts from
        the newest checkpoint ≤ target and replays only the commits
        after it — O(checkpoint_interval) log reads regardless of
        table age (the Delta checkpoint contract)."""
        target = self.latest_version() if as_of is None else as_of
        live: dict[str, dict] = {}
        schema: str | None = None
        txns: dict[str, int] = {}
        props: dict = {}
        dvs: dict[str, str] = {}
        start = 0
        if target >= 0:
            ckpt_v = self._latest_checkpoint_version(target)
            if ckpt_v is not None:
                d = json.loads(self.log.read(_ckpt_name(ckpt_v)))
                live = {a["path"]: a.get("stats", {}) for a in d["live"]}
                schema = d["schema"]
                txns = dict(d["txns"])
                props = dict(d.get("props") or {})
                dvs = dict(d.get("dvs") or {})
                start = ckpt_v + 1
        for v in range(start, target + 1):
            c = self._read_commit(v)
            for p in c.remove:
                live.pop(p, None)
                dvs.pop(p, None)  # a rewrite materializes the vector
            for a in c.add:
                live[a["path"]] = a.get("stats", {})
            for e in c.dv or ():
                if e["del"]:
                    dvs[e["path"]] = e["del"]
                else:  # empty vector = explicit clear (restore)
                    dvs.pop(e["path"], None)
            schema = c.schema_json
            if c.txn:
                app, b = c.txn["app"], c.txn["batch_id"]
                txns[app] = max(txns.get(app, b), b)
            if c.props is not None:
                props = dict(c.props)
        self._check_protocol(props)
        return live, schema, txns, props, dvs

    # ---- protocol / feature flags ---------------------------------------
    #
    # Delta's table-features idea: a commit that first USES a format
    # feature stamps it into the ``protocol`` table property
    # (auto-stamped centrally in _try_commit, so no verb can forget),
    # and every reader/writer checks the stamped set against what it
    # supports. An engine build that predates a feature fails FAST
    # with a named error instead of silently misreading the table
    # (e.g. ignoring deletion vectors would resurrect deleted rows).
    # Reader features gate resolution itself; writer features gate
    # commits only — an engine can safely read a table it must not
    # write (the Delta reader/writer split).

    _PROTOCOL_KEY = "protocol"
    SUPPORTED_READER_FEATURES = frozenset(
        {
            "columnMapping",
            "deletionVectors",
            "compressedDeletionVectors",
            "typeWidening",
        }
    )
    SUPPORTED_WRITER_FEATURES = frozenset(
        {
            "identityColumns",
            "generatedColumns",
            "checkConstraints",
            "allowColumnDefaults",
            "rowTracking",
            "liquidClustering",
        }
    )

    @classmethod
    def _check_protocol(cls, props: dict, *, for_write: bool = False) -> None:
        proto = props.get(cls._PROTOCOL_KEY) or {}
        unknown = (
            set(proto.get("reader_features") or [])
            - cls.SUPPORTED_READER_FEATURES
        )
        if unknown:
            raise ValueError(
                f"table requires reader feature(s) {sorted(unknown)} this "
                "engine version does not support; upgrade the engine to "
                "read this table"
            )
        if for_write:
            unknown_w = (
                set(proto.get("writer_features") or [])
                - cls.SUPPORTED_WRITER_FEATURES
            )
            if unknown_w:
                raise ValueError(
                    f"table requires writer feature(s) {sorted(unknown_w)} "
                    "this engine version does not support; the table stays "
                    "readable, but writes would break its invariants"
                )

    def protocol(self, as_of: int | None = None) -> dict:
        """The stamped feature sets (empty lists for a plain table)."""
        proto = self.properties(as_of).get(self._PROTOCOL_KEY) or {}
        return {
            "reader_features": sorted(proto.get("reader_features") or []),
            "writer_features": sorted(proto.get("writer_features") or []),
        }

    def _stamp_protocol(
        self, props: dict | None, dv: list[dict] | None, version: int
    ) -> dict | None:
        """Auto-stamp the features THIS commit's post-state uses;
        returns the (possibly materialized) props for the commit.
        Also enforces the writer gate against the post-commit state."""
        post = props
        if post is None:
            post = self._resolve_state(version - 1)[3] if version > 0 else {}
        needed_r, needed_w = set(), set()
        if dv and any(e.get("del") for e in dv):
            needed_r.add("deletionVectors")
            # the varint-RLE / sidecar encodings are a separate reader
            # capability: an engine build that only understands the
            # legacy int64 packing must fail FAST, not misdecode
            if any(
                (e.get("del") or "").startswith(
                    (_DV_RLE_PREFIX, _DV_SIDECAR_PREFIX)
                )
                for e in dv
            ):
                needed_r.add("compressedDeletionVectors")
        if post.get("colmap"):
            needed_r.add("columnMapping")
        for k in post:
            if k.startswith(self._IDENTITY_PREFIX):
                needed_w.add("identityColumns")
            elif k.startswith(self._GENERATED_PREFIX):
                needed_w.add("generatedColumns")
            elif k.startswith(self._CONSTRAINT_PREFIX):
                needed_w.add("checkConstraints")
            elif k.startswith(self._DEFAULT_PREFIX):
                needed_w.add("allowColumnDefaults")
            elif k == self._ROWTRACKING_KEY:
                needed_w.add("rowTracking")
            elif k == self._CLUSTERING_KEY:
                needed_w.add("liquidClustering")
        proto = dict(post.get(self._PROTOCOL_KEY) or {})
        have_r = set(proto.get("reader_features") or [])
        have_w = set(proto.get("writer_features") or [])
        if needed_r - have_r or needed_w - have_w:
            proto["reader_features"] = sorted(have_r | needed_r)
            proto["writer_features"] = sorted(have_w | needed_w)
            post = dict(post)
            post[self._PROTOCOL_KEY] = proto
            props = post
        self._check_protocol(post, for_write=True)
        return props

    def last_txn_batch(self, app: str, *, as_of: int | None = None) -> int | None:
        """Highest batch id this writer app has committed at-or-before
        ``as_of`` (None if it never has) — the idempotent-replay
        watermark. Callers on the commit path MUST evaluate this as-of
        the same base version they commit against (see ``append``)."""
        return self._resolve_state(as_of)[2].get(app)

    def properties(self, as_of: int | None = None) -> dict:
        """Resolved table properties (constraints etc.) at a version."""
        return self._resolve_state(as_of)[3]

    def deletion_vectors(self, as_of: int | None = None) -> dict[str, list[int]]:
        """{live file: sorted masked row indices} at a version
        (merge-on-read state; empty when fully materialized)."""
        return {
            p: _unpack_dv(b, self.path)
            for p, b in self._resolve_state(as_of)[4].items()
        }

    def row_count(self, as_of: int | None = None) -> int:
        """COUNT(*) from the manifest alone — per-file record counts
        ride the log (Iceberg's record_count), minus deletion-vector
        masks, so the answer costs one log resolution and ZERO data
        reads. Files committed before the counts existed fall back to
        a driver-side parquet FOOTER read (still metadata-only)."""
        live, _, _, _, dvs = self._resolve_state(as_of)
        total = 0
        for p, stats in live.items():
            n = stats.get("#rows")
            if n is not None:
                total += n[0]
            else:  # pre-upgrade commit: footer metadata, no data scan
                import pyarrow.parquet as pq

                total += pq.read_metadata(os.path.join(self.path, p)).num_rows
            if p in dvs:
                total -= _dv_count(dvs[p])
        return total

    def column_min_max(
        self, col: str, as_of: int | None = None
    ) -> tuple:
        """MIN/MAX of a column from the manifest alone (the Iceberg
        lower_bounds/upper_bounds answer): per-file [min, max] stats
        ride the log, so for stat-bearing files the answer costs one
        log resolution and ZERO data reads. Files that can't prove
        their extremum are scanned — but ONLY those files: a file with
        no stats for the column (non-scalar type, pre-upgrade commit,
        or the truncated-string guard), or one carrying a deletion
        vector (the masked row could BE the extremum, so its stats
        are bounds, not answers). NULLs are ignored (SQL MIN/MAX
        semantics); returns (None, None) when no rows carry a value.
        DATE stats ride as ISO strings; the scan fallback normalizes
        through the same encoding so the two sources compare."""
        live, schema_json, _, _, dvs = self._resolve_state(as_of)
        colmap = self._colmap(as_of)
        phys = {lg: ph for ph, lg in colmap.items() if lg}.get(col, col)
        vals: list = []
        rescan: list[str] = []
        for p, stats in live.items():
            rng = stats.get(phys)
            if p in dvs or rng is None:
                rescan.append(p)
            else:
                vals.extend(rng)
        if rescan:
            df = self._read_files(rescan, schema_json)
            if phys in df.columns:
                row = (
                    self._apply_dvs(df, rescan, dvs)
                    .agg(F.min(phys), F.max(phys))
                    .first()
                )
                vals.extend(
                    _norm_stat_value(v) for v in row if v is not None
                )
        if not vals:
            return None, None
        return min(vals), max(vals)

    def _resolve_actions(
        self, as_of: int | None = None
    ) -> tuple[dict[str, dict], str | None]:
        live, schema, _, _, _ = self._resolve_state(as_of)
        return live, schema

    def _resolve(self, as_of: int | None = None) -> tuple[list[str], str | None]:
        live, schema = self._resolve_actions(as_of)
        return sorted(live), schema

    def _maybe_checkpoint(self, version: int) -> None:
        """Materialize the resolved state every ``checkpoint_interval``
        commits. Best-effort and racy-by-design: checkpoints are pure
        derived state, put-if-absent dedups concurrent writers, and a
        missing checkpoint only means a longer replay."""
        if version < 0 or (version + 1) % self.checkpoint_interval != 0:
            return
        live, schema, txns, props, dvs = self._resolve_state(version)
        body = {
            "version": version,
            "live": [{"path": p, "stats": s} for p, s in sorted(live.items())],
            "schema": schema,
            "txns": txns,
            "props": props,
            "dvs": dvs,
        }
        try:
            self.log.put_if_absent(
                _ckpt_name(version), json.dumps(body).encode()
            )
        except FileExistsError:
            pass  # a racing committer of this version already wrote it

    def _try_commit(
        self,
        version: int,
        op: str,
        add: list[dict],
        remove: list[str],
        schema_json: str,
        txn: tuple[str, int] | None = None,
        props: dict | None = None,
        dv: list[dict] | None = None,
    ) -> int:
        """Put-if-absent commit of the version slot. Exactly one writer
        wins a version; the whole ACID story rests on this one atomic
        primitive (os.link on POSIX, conditional PUT on object stores
        — see storage.LogStore)."""
        add, props = self._stamp_row_ids(add, props, version)
        props = self._stamp_protocol(props, dv, version)
        ts = time.time()
        if version > 0:
            # in-commit-timestamp monotonicity (Delta's ICT feature):
            # wall clocks skew — especially across writers on different
            # hosts — and a commit stamped EARLIER than its predecessor
            # makes timestampAsOf/RESTORE TIMESTAMP ambiguous. Clamp to
            # strictly-after-previous; one log read per commit.
            try:
                ts = max(ts, self._read_commit(version - 1).ts + 1e-6)
            except Exception:
                pass  # predecessor unreadable: wall clock stands
        body = {
            "version": version,
            "op": op,
            "ts": ts,
            "add": add,
            "remove": remove,
            "schema": schema_json,
        }
        if txn is not None:
            body["txn"] = {"app": txn[0], "batch_id": txn[1]}
        if props is not None:
            body["props"] = props
        if dv is not None:
            body["dv"] = dv
        try:
            self.log.put_if_absent(
                _commit_name(version), json.dumps(body).encode()
            )
        except FileExistsError as e:
            raise CommitConflict(f"version {version} already committed") from e
        self._maybe_checkpoint(version)
        return version

    # ---- logical conflict detection (Delta's conflict matrix) -----------

    def _props_material(self, props: dict | None) -> dict:
        """Properties whose concurrent change invalidates a staged
        rewrite. Excluded as benign: the row-id watermark and protocol
        feature stamps (advanced by every commit on an enabled table;
        _try_commit re-derives ours against the ACTUAL predecessor on
        rebase) and identity ``next`` counters (a racing identity
        append moves them; a rewrite neither reads nor mints ids)."""
        skip = (self._ROWTRACKING_KEY, self._PROTOCOL_KEY)
        return {
            k: v
            for k, v in (props or {}).items()
            if k not in skip and not k.startswith(self._IDENTITY_PREFIX)
        }

    def _commit_conflicts_logically(
        self, c: Commit, ours: set[str], read_filters, check_adds: bool
    ) -> bool:
        """Does the winner commit ``c`` logically invalidate a staged
        transaction that rewrites/deletes ``ours`` (file set read at
        its base) under scan predicate ``read_filters``? Mirrors
        Delta's documented matrix:

        - winner REMOVED (or attached a deletion vector to) a file we
          read or rewrite → conflict (ConcurrentDeleteRead/Delete);
        - winner changed table metadata (constraints, colmap,
          clustering, defaults, generated cols, setprops) → conflict
          (MetadataChanged);
        - winner only ADDED files → no conflict under the default
          ``write_serializable`` isolation (a blind append commutes
          with a rewrite of OLD files — Delta's default); under
          ``serializable``, added files whose stats may match our
          scan predicate conflict (ConcurrentAppend).
        """
        touched = set(c.remove) | {e["path"] for e in (c.dv or [])}
        if touched & ours:
            return True
        if c.props is not None:
            prev = (
                self._resolve_state(c.version - 1)[3]
                if c.version > 0
                else {}
            )
            if self._props_material(c.props) != self._props_material(prev):
                return True
        if c.add and check_adds:
            if read_filters is None:
                return True  # unscoped read: any append was readable
            for a in c.add:
                if _file_may_match(a.get("stats") or {}, read_filters):
                    return True
        return False

    def _commit_or_rebase(
        self,
        base: int,
        op: str,
        add: list[dict],
        remove: list[str],
        schema_json: str,
        *,
        txn: tuple[str, int] | None = None,
        dv: list[dict] | None = None,
        read_filters=None,
        check_adds: bool | None = None,
        max_rebases: int = 10,
    ) -> int | None:
        """Commit the staged actions at ``base + 1``; on losing the
        race, REBASE onto the winners instead of re-planning when every
        intervening commit is logically disjoint (two DELETEs on
        disjoint file sets, an append racing a compact/cluster of old
        files). The expensive data job ran once; only the cheap commit
        retries — at multi-writer concurrency this is the difference
        between linear throughput and blind-retry collapse. Returns
        the committed version, or None when a winner truly overlaps
        and the caller must re-plan (re-read state, re-run the job).

        ``read_filters`` is the physical predicate the transaction
        selected its file set with (None = it read its whole live
        set); consulted under ``serializable`` isolation — or always,
        when ``check_adds=True`` (MERGE: a winner append whose keys
        may match would have changed the matched/not-matched split,
        so it conflicts under EVERY isolation level — stricter than
        Delta's WriteSerializable, which documents the duplicate-key
        anomaly instead). ``txn`` rides every commit attempt and is
        RE-CHECKED against each rebase base — a concurrent replay of
        the same (app, batch_id) that lands mid-race turns this
        transaction into an idempotent no-op, never a double-apply.

        The isolation level resolves per-table first (the
        ``isolationLevel`` table property — Delta's
        ``delta.isolationLevel``, settable via ALTER TABLE ... SET
        TBLPROPERTIES so EVERY writer handle honors it), then this
        handle's ``isolation`` constructor arg."""
        if check_adds is None:
            level = self.properties().get("isolationLevel") or self.isolation
            check_adds = level == "serializable"
        ours = set(remove) | {e["path"] for e in (dv or [])}
        for _ in range(max_rebases):
            try:
                return self._try_commit(
                    base + 1, op, add, remove, schema_json, txn, dv=dv
                )
            except CommitConflict:
                pass
            latest = self.latest_version()
            if txn is not None:
                last = self.last_txn_batch(txn[0], as_of=latest)
                if last is not None and txn[1] <= last:
                    return latest  # a replay landed this batch already
            for v in range(base + 1, latest + 1):
                if self._commit_conflicts_logically(
                    self._read_commit(v), ours, read_filters, check_adds
                ):
                    return None
            try:
                # winners may have widened the schema (appends with
                # additive evolution): re-merge ours against theirs
                schema_json = self._evolve_schema(schema_json, latest)
            except ValueError:
                return None  # incompatible evolution: re-plan
            base = latest
        return None  # pathological contention: fall back to re-plan

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

    def _file_meta(self, rel_path: str) -> tuple[int | None, dict[str, list]]:
        """(row count, per-column [min, max]) from the parquet footer
        (the Iceberg manifest idiom): driver-side metadata read, no
        data scan. Only scalar-typed columns with stats in every row
        group qualify — anything else is simply absent (treated as
        'may contain any value' by pruning)."""
        try:
            import pyarrow.parquet as pq

            md = pq.read_metadata(os.path.join(self.path, rel_path))
        except Exception:  # stats are an optimization, never a failure
            return None, {}
        out: dict[str, list] = {}
        schema = md.schema
        for ci in range(md.num_columns if md.num_row_groups else 0):
            name = schema.column(ci).name
            lo = hi = None
            ok = True
            for rg in range(md.num_row_groups):
                # .statistics / .min / .max can raise (pyarrow has no
                # stats decoder for some logical types, e.g. DECIMAL):
                # treat exactly like absent stats
                try:
                    st = md.row_group(rg).column(ci).statistics
                    if st is None or not st.has_min_max:
                        ok = False
                        break
                    mn, mx = _norm_stat_value(st.min), _norm_stat_value(st.max)
                except Exception:
                    ok = False
                    break
                # only JSON-primitive stats survive: binary isn't
                # serializable, and datetime (timestamp columns)
                # would crash the commit's json.dump AND compare
                # unequally against Spark-side values in pruning.
                # DATE stats are normalized to ISO strings above
                # (order-preserving), so date-partitioned tables
                # prune; dropping any other column's stats just means
                # merges keyed on it don't prune — never a
                # correctness issue.
                if not isinstance(mn, (int, float, str, bool)) or not isinstance(
                    mx, (int, float, str, bool)
                ):
                    ok = False
                    break
                # long string stats: keep PRUNABLE bounds without
                # bloating the manifest (a 10 KB document text would
                # otherwise ride the commit log twice per file). The
                # Iceberg truncate contract: a prefix is always a valid
                # LOWER bound; the UPPER bound is the prefix with its
                # last character bumped (any value starting with the
                # prefix sorts below it). Both writers this engine
                # meets (parquet-mr via Spark, arrow C++) emit footer
                # min/max exact-or-absent, so the bounds stay sound.
                if isinstance(mn, str) and len(mn) >= 48:
                    mn = mn[:32]
                if isinstance(mx, str) and len(mx) >= 48:
                    mx = _bump_prefix(mx[:32])
                    if mx is None:  # astronomically unlikely: all max
                        ok = False  # code points — no finite upper
                        break
                lo = mn if lo is None else min(lo, mn)
                hi = mx if hi is None else max(hi, mx)
            if ok and lo is not None:
                out[name] = [lo, hi]
            # null counts ride separately (Iceberg null_value_counts):
            # usable even when min/max aren't (e.g. truncation-prone
            # strings), powering is_null / is_not_null pruning
            nulls, nulls_ok = 0, md.num_row_groups > 0
            for rg in range(md.num_row_groups):
                try:
                    st = md.row_group(rg).column(ci).statistics
                except Exception:
                    st = None
                if st is None or st.null_count is None:
                    nulls_ok = False
                    break
                nulls += st.null_count
            if nulls_ok:
                out[f"#null:{name}"] = [nulls, md.num_rows]
        return md.num_rows, out

    # ---- public operations ----------------------------------------------

    _TRANSFORM_RE = re.compile(
        r"^\s*(years|months|days|hours|bucket|truncate)\s*\((.*)\)\s*$", re.I
    )

    @classmethod
    def _partition_keys(cls, df: DataFrame, partition_by: Sequence[str]):
        """Iceberg-style hidden partitioning: each ``partition_by``
        entry is a plain column OR a transform — ``years/months/days/
        hours(ts_col)``, ``bucket(n, col)``, ``truncate(w, int_col)``.
        Transforms become hidden cluster keys (computed, range-
        clustered on, then dropped before staging — they never widen
        the schema, Iceberg's "hidden" property). Time transforms
        keep PRUNING intact: the raw column's per-file [min, max]
        stays narrow because rows are day/month-contiguous. ``bucket``
        trades stats pruning for write parallelism and co-located
        MERGE (each bucket's keys always land in the same file run) —
        the same trade Iceberg's bucket transform makes without
        transform-aware scan planning."""
        keys, hidden, out_df = [], [], df
        for i, spec in enumerate(partition_by):
            m = cls._TRANSFORM_RE.match(spec)
            if not m:
                keys.append(spec)
                continue
            fn, arg = m.group(1).lower(), m.group(2).strip()
            name = f"__part_{i}"
            if fn == "bucket":
                nstr, col = (a.strip() for a in arg.split(",", 1))
                expr = F.pmod(F.xxhash64(F.col(col)), int(nstr))
            elif fn == "truncate":
                wstr, col = (a.strip() for a in arg.split(",", 1))
                w = int(wstr)
                expr = F.floor(F.col(col) / w) * w
            else:
                unit = {"years": "year", "months": "month",
                        "days": "day", "hours": "hour"}[fn]
                expr = F.date_trunc(unit, F.col(arg))
            out_df = out_df.withColumn(name, expr)
            keys.append(name)
            hidden.append(name)
        return out_df, keys, hidden

    # writer file-sizing goal (guide-§6 output sizing: files in the
    # 128 MB - 1 GB band; small commits collapse to ONE file instead
    # of one per upstream partition)
    _TARGET_FILE_BYTES = 128 * 1024 * 1024

    #: pass-through unary wrappers the engine itself stacks above a
    #: caller's plan between append()/merge() and staging (defaults,
    #: identity, physicalize are all Projects) — the explicit-layout
    #: check descends through these to find a root Repartition
    _LAYOUT_TRANSPARENT_NODES = frozenset({"Project", "SubqueryAlias"})

    def _size_output(self, df: DataFrame) -> DataFrame:
        """Coalesce the staged write to ~target-file-size outputs.

        A 32-partition filtered scan holding a few MB otherwise
        writes 32 tiny files, and every later snapshot scan, leaf
        listing and footer-stats read pays per file (measured: the
        incremental-dedup lifecycle query lists 64 paths per sync at
        sf0.1). ``coalesce`` (not repartition) adds no shuffle; with
        an over-estimate it is a no-op.

        An input the caller explicitly ``repartition``-ed keeps its
        layout — tests and probes construct multi-file tables that
        way, and an explicit shape is user intent, not an accident of
        scan parallelism. The check walks the top of the plan (the
        repartition callers write is the OUTERMOST transform, under
        at most the engine's own Project wrappers) on the SAME
        QueryExecution the size estimate uses — r11 stringified the
        whole analyzed plan and then built a second optimizer pass,
        two driver-side inspections on a path lifecycle queries hit
        per staged write (r12 verdict item 4)."""
        try:
            qe = df._jdf.queryExecution()
            node = qe.analyzed()
            for _ in range(16):  # bounded walk of the root chain
                name = node.nodeName()
                if name.startswith("Repartition"):
                    return df  # explicit layout: keep it
                if (
                    name not in self._LAYOUT_TRANSPARENT_NODES
                    or node.children().length() != 1
                ):
                    break
                node = node.children().apply(0)
            est = int(qe.optimizedPlan().stats().sizeInBytes())
        except Exception:
            return df
        if est <= 0:
            return df
        n = max(1, -(-est // self._TARGET_FILE_BYTES))
        return df.coalesce(n) if n < (1 << 20) else df

    def _stage_actions(
        self,
        df: DataFrame,
        *,
        partition_by: Sequence[str] | None = None,
        sized: bool = True,
    ) -> tuple[list[dict], str]:
        """Stage + footer-stats manifest entries (the Iceberg idiom:
        stats ride in the log so planning never opens data files).
        Provably-empty part files (a common byproduct of writing from
        more partitions than data) are dropped from the manifest — they
        carry no rows and, having no row groups, no stats either.

        ``partition_by`` clusters rows so each staged file covers one
        (or a few ADJACENT) partition value(s) — Iceberg's
        ``write.distribution-mode=range`` layout, where partition
        columns STAY in the data files and the manifest carries their
        per-file range. Range distribution (not hash) keeps values
        contiguous across files, and the explicit partition count opts
        out of AQE coalescing, so a file typically holds a single
        value (min == max) and scan/merge/delete pruning on that
        column becomes partition pruning with zero extra metadata
        machinery."""
        if partition_by:
            n = int(df.sparkSession.conf.get("spark.sql.shuffle.partitions", "200"))
            df, keys, hidden = self._partition_keys(df, partition_by)
            df = df.repartitionByRange(n, *keys).sortWithinPartitions(*keys)
            if hidden:
                df = df.drop(*hidden)  # projection preserves the order
        elif sized:
            # callers that pre-repartitioned for an explicit layout
            # (compact/Z-order/cluster/reorg) pass sized=False
            df = self._size_output(df)
        files, schema = self._stage(df)
        actions = []
        for f in files:
            rows, stats = self._file_meta(f)
            if rows == 0:
                continue
            if rows is not None:
                # manifest row count (Iceberg record_count): powers
                # metadata-only COUNT(*) via row_count()
                stats["#rows"] = [rows]
            actions.append({"path": f, "stats": stats})
        if self.bloom_cols and actions:
            blooms = self._bloom_stats([a["path"] for a in actions])
            for a in actions:
                a["stats"].update(blooms.get(a["path"], {}))
        return actions, schema

    def _bloom_stats(self, rel_files: list[str]) -> dict[str, dict[str, list]]:
        """Per-file bloom bitsets for ``self.bloom_cols``, built
        DISTRIBUTED: one column-pruned pass over the staged files
        computes the k md5-double-hash bit positions per row and
        OR-combines them into 64-bit blocks per (file, block) with
        ``bit_or`` — map-side partial combine applies, so at most
        m/64 longs per file reach the driver regardless of row count.
        The driver packs the blocks little-endian and base64s them
        into the manifest entry ``#bloom:<col> = [m, k, bitset]``."""
        import struct

        out: dict[str, dict[str, list]] = {f: {} for f in rel_files}
        df = self.spark.read.parquet(
            *[os.path.join(self.path, f) for f in rel_files]
        )
        m, k = self.bloom_bits, _BLOOM_HASHES
        for col in self.bloom_cols:
            if col not in df.columns:
                continue
            # integral/string columns ONLY: for these, Spark's
            # cast-to-string (build side) and Python str(val) (probe
            # side, _bloom_positions_py) agree on canonical form.
            # Booleans ("true" vs "True"), doubles probed with int
            # literals ("5.0" vs "5"), decimals and timestamps all
            # diverge — a diverging form makes the bloom probe a FALSE
            # negative, which wrongly prunes a matching file. Skipping
            # the bloom for such columns is only a lost optimization.
            if not isinstance(
                df.schema[col].dataType,
                (T.ByteType, T.ShortType, T.IntegerType, T.LongType,
                 T.StringType),
            ):
                continue
            h = F.md5(F.col(col).cast("string"))
            h1 = F.conv(F.substring(h, 1, 15), 16, 10).cast("long")
            h2 = F.conv(F.substring(h, 16, 15), 16, 10).cast("long").bitwiseOR(
                F.lit(1)
            )
            pos = F.array(
                *[F.pmod(h1 + F.lit(i) * h2, F.lit(m)) for i in range(k)]
            )
            rows = (
                df.select(
                    F.input_file_name().alias("__f"), F.explode(pos).alias("p")
                )
                .where(F.col("p").isNotNull())
                .select(
                    "__f",
                    F.expr("CAST(p DIV 64 AS INT)").alias("__block"),
                    F.expr(
                        "shiftleft(CAST(1 AS BIGINT), CAST(p % 64 AS INT))"
                    ).alias("__mask"),
                )
                .groupBy("__f", "__block")
                .agg(F.expr("bit_or(__mask)").alias("__bits"))
                .collect()
            )
            blocks: dict[str, dict[int, int]] = {}
            for r in rows:
                rel = next(
                    (f for f in rel_files if r["__f"].endswith(f)), None
                )
                if rel is not None:
                    blocks.setdefault(rel, {})[r["__block"]] = r["__bits"]
            for rel, bmap in blocks.items():
                bits = b"".join(
                    struct.pack("<q", bmap.get(b, 0)) for b in range(m // 64)
                )
                out[rel][f"#bloom:{col}"] = [
                    m,
                    k,
                    base64.b64encode(bits).decode(),
                ]
        return out

    _CONSTRAINT_PREFIX = "constraint."

    def set_properties(self, updates: dict, *, max_retries: int = 5) -> int:
        """Metadata-only commit updating table properties (a None
        value deletes its key). Properties snapshot-resolve like any
        state: later commits without a props field carry them forward."""
        for _ in range(max_retries):
            base = self.latest_version()
            _, schema, _, props, _ = self._resolve_state(base if base >= 0 else None)
            if schema is None:
                raise ValueError(
                    f"table {self.path} has no commits (append a first "
                    "snapshot before setting properties)"
                )
            new = dict(props)
            for k, v in updates.items():
                if v is None:
                    new.pop(k, None)
                else:
                    new[k] = v
            try:
                return self._try_commit(
                    base + 1, "setprops", [], [], schema, props=new
                )
            except CommitConflict:
                continue
        raise CommitConflict(f"set_properties lost {max_retries} commit races")

    def set_check_constraint(self, name: str, expr: str) -> int:
        """Delta-style ``ALTER TABLE ADD CONSTRAINT ... CHECK (expr)``:
        existing rows are validated first (the constraint must already
        hold), then every subsequent ``append`` / ``overwrite`` /
        ``merge`` / ``merge_apply`` batch is rejected wholesale if any
        written row fails or NULLs the expression. Enforcement is one
        ``limit(1)`` probe per write — per-BATCH cost, not per-row.
        The DSv2 writers validate too (probing staged files before the
        commit references them — acid_source._enforce_write_rules);
        only a bare ``commit_staged`` call bypasses enforcement."""
        self._enforce_constraints(self.snapshot(), {f"constraint.{name}": expr})
        return self.set_properties({self._CONSTRAINT_PREFIX + name: expr})

    def drop_check_constraint(self, name: str) -> int:
        return self.set_properties({self._CONSTRAINT_PREFIX + name: None})

    _GENERATED_PREFIX = "generated."

    def set_generated_column(self, name: str, expr: str) -> int:
        """Delta's ``GENERATED ALWAYS AS (expr)``: the column's value
        is derived from other columns. A write batch that omits the
        column gets it computed; a batch that supplies it is validated
        (null-safe equality, one ``limit(1)`` probe) and rejected on
        any mismatch — so the invariant can never drift. ``update()``
        probes the invariant on its post-update rows too (it does NOT
        recompute — assign the source and generated columns together).
        Retrofit rule: on a non-empty table the column must already
        exist and already satisfy the expression (validated here),
        mirroring the constraint shape."""
        snap = self.snapshot()
        if snap.take(1):
            if name not in snap.columns:
                raise ValueError(
                    f"generated column {name!r} must exist before it can"
                    " be declared on a non-empty table"
                )
            self._check_generated(snap, {self._GENERATED_PREFIX + name: expr})
        return self.set_properties({self._GENERATED_PREFIX + name: expr})

    def drop_generated_column(self, name: str) -> int:
        return self.set_properties({self._GENERATED_PREFIX + name: None})

    _DEFAULT_PREFIX = "default."

    def set_column_default(self, name: str, expr: str) -> int:
        """SQL column DEFAULT (Delta's ``allowColumnDefaults``): a
        write batch that OMITS the column gets ``expr`` materialized
        at write time; a batch that supplies it (even as NULL) wins.
        Metadata-only — existing rows are untouched and files that
        predate the column still read NULL (defaults govern new
        writes, not history — the Delta/ANSI semantics). The column
        must already exist in the committed schema (declare it first
        via append/add_columns), so a default can never smuggle in an
        undeclared column. Defaults materialize on EVERY write path
        that can omit a column: append / overwrite / overwrite_where /
        the INSERT SQL routes, COPY INTO (when the loaded frame lacks
        the column — a schema-forced csv/json read pads NULL instead,
        which is supplied-as-NULL, not absent), and the DSv2
        batch/stream writers (the expression evaluates once per write
        through the embedded engine and lands as a constant column in
        the staged files — scalar committed types only on that
        path)."""
        schema = self.snapshot().columns
        if name not in schema:
            raise ValueError(
                f"column {name!r} must exist before a DEFAULT can be "
                "declared (add_columns first)"
            )
        # fail now, not at the next write, if the expression is bad
        self.spark.sql(f"SELECT {expr}").limit(0).collect()
        return self.set_properties({self._DEFAULT_PREFIX + name: expr})

    def drop_column_default(self, name: str) -> int:
        return self.set_properties({self._DEFAULT_PREFIX + name: None})

    def _apply_defaults(self, df: DataFrame) -> DataFrame:
        """Materialize declared defaults for columns the batch omits.
        Zero overhead when the table declares none (one properties()
        read, no snapshot resolution)."""
        defaults = {
            k[len(self._DEFAULT_PREFIX):]: v
            for k, v in self.properties().items()
            if k.startswith(self._DEFAULT_PREFIX)
        }
        missing = {c: e for c, e in defaults.items() if c not in df.columns}
        if not missing:
            return df
        declared = {f.name: f.dataType for f in self.snapshot().schema.fields}
        for col, expr in missing.items():
            c = F.expr(expr)
            if col in declared:
                c = c.cast(declared[col])
            df = df.withColumn(col, c)
        return df

    _ROWTRACKING_KEY = "rowtracking"
    _ROW_ID_COL = "__row_id"

    def set_row_tracking(self) -> int:
        """Delta's row tracking: every row gets a STABLE long id that
        survives layout changes (compaction, Z-order) and row rewrites
        (merge/update/delete copy-on-write) — the handle an incremental
        downstream consumer keys on when the table has no natural key.

        Fresh ids are FREE on the write path (Delta's baseRowId idea):
        an added file carries one ``#base_row_id`` in its manifest
        stats, stamped centrally at commit (_stamp_row_ids, so no
        write verb can forget), and a row's id is ``base + its
        position in the file`` — no data-file column until a REWRITE
        has to preserve ids, at which point the rewrite materializes a
        hidden ``__row_id`` column for the carried rows (read side:
        ``coalesce(materialized, base + row_index)``). Enabling on a
        non-empty table performs Delta's backfill as ONE metadata-only
        commit: every live file is re-added with a base id — no data
        rewrite. Ids are unique-with-gaps, monotone per commit; the
        watermark rides table props and advances in the same commit
        that uses it (commit races retry with the fresh value, exactly
        the identity-column contract)."""
        props = self.properties()
        if self._ROWTRACKING_KEY in props:
            return self.latest_version()
        base = self.latest_version()
        live, schema_json, _, _, _ = self._resolve_state(
            base if base >= 0 else None
        )
        wm = 0
        add = []
        for p in sorted(live):
            stats = dict(live[p] or {})
            n = stats.get("#rows")
            n = int(n[0]) if n else None
            if n is None:
                n, _ = self._file_meta(p)
                if n is None:
                    raise ValueError(
                        f"cannot backfill row ids: no row count for {p}"
                    )
                stats["#rows"] = [n]
            stats["#base_row_id"] = [wm]
            wm += n
            add.append({"path": p, "stats": stats})
        new_props = dict(props)
        new_props[self._ROWTRACKING_KEY] = {"next": wm}
        return self._try_commit(
            base + 1 if base >= 0 else 0,
            "rowtracking",
            add,
            [],
            schema_json
            if schema_json is not None
            else T.StructType([]).json(),
            props=new_props,
        )

    def _stamp_row_ids(
        self, add: list[dict], props: dict | None, version: int
    ) -> tuple[list[dict], dict | None]:
        """Central base-row-id assignment (runs inside _try_commit so
        EVERY write path — append, merge, DSv2, COPY INTO, streaming —
        participates): added files without materialized ids get a
        ``#base_row_id`` and the watermark advances past them; files
        that carry a materialized ``__row_id`` column (rewrites) just
        push the watermark past their maximum. No-op unless row
        tracking is enabled."""
        post = props
        if post is None:
            post = self._resolve_state(version - 1)[3] if version > 0 else {}
        rt = post.get(self._ROWTRACKING_KEY)
        if not rt or not add:
            return add, props
        wm = start = int(rt["next"])
        out = []
        for a in add:
            stats = a.get("stats") or {}
            rng = stats.get(self._ROW_ID_COL)
            if rng:  # materialized ids: jump past them
                wm = max(wm, int(rng[1]) + 1)
                out.append(a)
                continue
            if "#base_row_id" in stats:  # backfill: pre-assigned
                n = stats.get("#rows")
                if n:
                    wm = max(wm, int(stats["#base_row_id"][0]) + int(n[0]))
                out.append(a)
                continue
            n = stats.get("#rows")
            n = int(n[0]) if n else None
            if n is None:
                n, _ = self._file_meta(a["path"])
                if n is None:
                    raise ValueError(
                        "row tracking needs a row count for "
                        f"{a['path']} (no parquet footer stats)"
                    )
            a = dict(a)
            stats = dict(stats)
            stats["#base_row_id"] = [wm]
            a["stats"] = stats
            wm += n
            out.append(a)
        if wm != start:
            post = dict(post)
            post[self._ROWTRACKING_KEY] = {"next": wm}
            props = post
        return out, props

    def _row_tracking_on(self, props: dict | None = None) -> bool:
        return self._ROWTRACKING_KEY in (
            props if props is not None else self.properties()
        )

    def _default_write_mode(self, verb_key: str | None = None) -> str:
        """Resolve a verb's default physical strategy from table
        properties — Delta's ``enableDeletionVectors`` switch: when
        set, DELETE / UPDATE / MERGE / SCD2 default to merge-on-read
        (the verbs' explicit ``mode=`` argument still wins, and a
        verb-specific key like ``merge.mode`` wins over the blanket
        switch)."""
        props = self.properties()
        if verb_key:
            specific = props.get(verb_key)
            if specific:
                return specific
        if str(props.get("enableDeletionVectors")).lower() == "true":
            return "merge_on_read"
        return "copy_on_write"

    def _reject_reserved_row_id(self, df: DataFrame) -> None:
        """``__row_id`` is engine-assigned: a user batch carrying it
        would corrupt the watermark (staged stats would masquerade as
        materialized ids). Reserved unconditionally — a table not yet
        tracking rows may enable tracking later."""
        if self._ROW_ID_COL in df.columns:
            raise ValueError(
                f"column name {self._ROW_ID_COL!r} is reserved for row "
                "tracking — the engine assigns it"
            )

    def _read_for_rewrite(
        self, touched, schema_json, dvs, base: int | None
    ) -> DataFrame:
        """The rewrite-path read: DV-masked rows removed and — when
        row tracking is on — every surviving row's CURRENT id
        materialized into the hidden ``__row_id`` physical column, so
        the files a rewrite stages preserve ids instead of re-minting
        them. Identical to ``_apply_dvs(_read_files(...))`` when
        tracking is off."""
        df = self._read_files(touched, schema_json)
        state = self._resolve_state(base)
        if not self._row_tracking_on(state[3]):
            return self._apply_dvs(df, touched, dvs)
        df = self._row_id_coords(df)
        df = self._apply_dvs(df, touched, dvs)
        df = self._attach_row_ids(df, touched, state[0])
        cols = [
            c for c in df.columns if c not in ("_row_id", self._ROW_ID_COL)
        ]
        return df.select(*cols, F.col("_row_id").alias(self._ROW_ID_COL))

    def _assign_fresh_row_ids(self, df: DataFrame, props: dict) -> DataFrame:
        """Fill NULL ``__row_id`` (rows a merge INSERTS) with fresh ids
        above the watermark; carried rows keep theirs. The commit's
        central _stamp_row_ids then advances the watermark past the
        staged maximum (read from the file stats), so a commit race
        retries against the winner's watermark — the identity-column
        contract."""
        rt = props.get(self._ROWTRACKING_KEY)
        if not rt or self._ROW_ID_COL not in df.columns:
            return df
        fresh = F.lit(int(rt["next"])) + F.monotonically_increasing_id()
        return df.withColumn(
            self._ROW_ID_COL,
            F.coalesce(F.col(self._ROW_ID_COL), fresh).cast("long"),
        )

    def _inherit_row_ids(self, updates: DataFrame, target: DataFrame, keys):
        """Give update rows their MATCHED target row's id (Delta row
        tracking: an UPDATE preserves identity); unmatched rows stay
        NULL for _assign_fresh_row_ids. Non-unique target keys inherit
        the smallest id deterministically."""
        tgt = target.groupBy(*keys).agg(
            F.min(self._ROW_ID_COL).alias("__rt_inherit")
        )
        out = updates
        if self._ROW_ID_COL in out.columns:
            out = out.drop(self._ROW_ID_COL)
        return (
            out.join(tgt, list(keys), "left")
            .withColumn(self._ROW_ID_COL, F.col("__rt_inherit"))
            .drop("__rt_inherit")
        )

    def _row_id_coords(self, df: DataFrame) -> DataFrame:
        """Project the per-row file coordinates row ids derive from.
        MUST run while ``df`` is still the scan relation (plain
        projections keep parquet ``_metadata`` resolvable; a join
        hides it)."""
        return df.select(
            "*",
            F.element_at(
                F.split(F.col("_metadata.file_path"), "/"), -1
            ).alias("__rt_fn"),
            F.col("_metadata.row_index").alias("__rt_ri"),
        )

    def _attach_row_ids(
        self, df: DataFrame, rel_paths: Sequence[str], live_stats: dict
    ) -> DataFrame:
        """``df`` (carrying ``_row_id_coords`` columns) plus the
        ``_row_id`` column: materialized ``__row_id`` when the file
        carries it, else the file's manifest base + row position."""
        base_rows = []
        for p in rel_paths:
            st = live_stats.get(p) or {}
            b = st.get("#base_row_id")
            if b:
                base_rows.append((os.path.basename(p), int(b[0])))
        if base_rows:
            bm = self.spark.createDataFrame(
                base_rows, "__rt_fn string, __rt_base long"
            )
            out = df.join(F.broadcast(bm), "__rt_fn", "left")
        else:
            out = df.withColumn("__rt_base", F.lit(None).cast("long"))
        rid = F.col("__rt_base") + F.col("__rt_ri")
        if self._ROW_ID_COL in df.columns:
            rid = F.coalesce(F.col(self._ROW_ID_COL), rid)
        return out.withColumn("_row_id", rid.cast("long")).drop(
            "__rt_fn", "__rt_ri", "__rt_base"
        )

    _IDENTITY_PREFIX = "identity."

    def set_identity_column(self, name: str, *, start: int = 1) -> int:
        """Delta's ``GENERATED ALWAYS AS IDENTITY``: the column is
        assigned by the table, monotonically unique across commits,
        with gaps allowed (the standard identity contract). The high
        watermark rides the table properties and every identity-
        assigning append advances it IN ITS OWN COMMIT, so concurrent
        writers can never double-allocate — a loser of the commit
        race restages with the fresh watermark. Retrofit rule: the
        column must already exist (its current max seeds the
        watermark, floored at ``start``); subsequent appends must
        OMIT the column (ALWAYS, not BY DEFAULT)."""
        view = self._logical_view()
        if name not in view.values():
            raise ValueError(f"no column {name!r} (have {sorted(view.values())})")
        if self._GENERATED_PREFIX + name in self.properties():
            raise ValueError(f"{name!r} is already a generated column")
        phys = next(p for p, l in view.items() if l == name)
        live, _, _, _, _ = self._resolve_state(None)
        cur_max = None
        for stats in live.values():
            rng = stats.get(phys)
            if rng is None:
                cur_max = None
                break  # a live file lacks stats: fall back to a scan
            cur_max = rng[1] if cur_max is None else max(cur_max, rng[1])
        if cur_max is None and live:
            row = self.snapshot().agg(F.max(name).alias("m")).first()
            cur_max = row["m"]
        nxt = int(start)
        if cur_max is not None:
            nxt = max(nxt, int(cur_max) + 1)
        return self.set_properties({self._IDENTITY_PREFIX + name: {"next": nxt}})

    def drop_identity_column(self, name: str) -> int:
        return self.set_properties({self._IDENTITY_PREFIX + name: None})

    def _append_with_identity(
        self, df, identity, *, txn, partition_by, max_retries
    ) -> int:
        """Append path for tables with identity columns: assignment
        uses a single ``monotonically_increasing_id`` pass (unique,
        gap-tolerant), the new watermark is read from the STAGED
        files' own footer stats (so the committed watermark provably
        covers every written id), and a lost commit race REBASES the
        staged files instead of re-running the data job: when no
        winner advanced our identity watermark the staged files commit
        unchanged at the new version; when one did (a concurrent
        identity append), only the id columns are re-stamped by a
        constant shift — one read-shift-rewrite of the already-
        materialized batch, never a re-execution of the (arbitrarily
        expensive) upstream plan. Row-tracking ids already rebase for
        free because they are manifest-only (#base_row_id, re-stamped
        centrally in _try_commit); this extends the same economy to
        the one id that lives IN the data files."""
        for c in identity:
            if c in df.columns:
                raise ValueError(
                    f"identity column {c!r} is GENERATED ALWAYS — omit it"
                )
        df = self._apply_generated(df)
        self._enforce_constraints(df)
        colmap = self._colmap()
        phys_part = self._phys_partition_by(partition_by, colmap)
        phys_of = {c: self._phys_names([c], colmap)[0] for c in identity}
        staged: tuple[list[dict], str, dict[str, int]] | None = None
        for _ in range(max_retries):
            base = self.latest_version()
            props = self.properties(base)
            if txn is not None:
                last = self.last_txn_batch(txn[0], as_of=base)
                if last is not None and txn[1] <= last:
                    return base  # orphaned staging is vacuum-swept
            nxt = {
                c: int(props[self._IDENTITY_PREFIX + c]["next"])
                for c in identity
            }
            if staged is None:
                out = df.withColumn(
                    "__mono", F.monotonically_increasing_id()
                )
                for c in identity:
                    out = out.withColumn(
                        c, (F.lit(nxt[c]) + F.col("__mono")).cast("long")
                    )
                out = out.drop("__mono")
                add, schema = self._stage_actions(
                    self._physicalize(out, colmap), partition_by=phys_part
                )
                staged = (add, schema, nxt)
            elif any(nxt[c] < staged[2][c] for c in identity):
                # the watermark moved BACKWARDS past our stamp (a
                # restore of an older snapshot raced us): the constant
                # shift is unsound against a rewound id space — fall
                # back to a full re-stage against the fresh state
                staged = None
                continue
            elif any(nxt[c] > staged[2][c] for c in identity):
                # a winner minted ids past ours: re-stamp ONLY the id
                # columns of the staged files (constant shift keeps
                # uniqueness and the gap-tolerant contract)
                prev_add, schema, prev_nxt = staged
                out = self.spark.read.parquet(
                    *[
                        os.path.join(self.path, a["path"])
                        for a in prev_add
                    ]
                )
                for c in identity:
                    shift = nxt[c] - prev_nxt[c]
                    if shift:
                        out = out.withColumn(
                            phys_of[c],
                            (F.col(phys_of[c]) + F.lit(shift)).cast("long"),
                        )
                add, schema = self._stage_actions(
                    out, partition_by=phys_part
                )
                staged = (add, schema, nxt)
            else:
                add, schema, _ = staged  # watermark untouched: reuse
            new_props = dict(props)
            for c in identity:
                top = None
                for a in add:
                    rng = a["stats"].get(phys_of[c])
                    if rng is None:
                        top = None
                        break
                    top = rng[1] if top is None else max(top, rng[1])
                if top is None and add:  # stats missing: read staged max
                    top = self.spark.read.parquet(
                        *[os.path.join(self.path, a["path"]) for a in add]
                    ).agg(F.max(phys_of[c]).alias("m")).first()["m"]
                if top is not None:
                    new_props[self._IDENTITY_PREFIX + c] = {"next": int(top) + 1}
            try:
                v = self._try_commit(
                    base + 1,
                    "append",
                    add,
                    [],
                    self._evolve_schema(schema, base),
                    txn,
                    props=new_props,
                )
            except CommitConflict:
                continue  # rebase the STAGED files on the next pass
            if (
                self.auto_compact_files
                and len(self._resolve(v)[0]) > self.auto_compact_files
            ):
                try:  # same best-effort policy as the plain append path
                    return self._auto_optimize()
                except Exception:
                    pass  # the append COMMITTED; compaction just defers
            return v
        raise CommitConflict(f"append lost {max_retries} commit races")

    def _apply_generated(
        self, df: DataFrame, *, check_df: DataFrame | None = None
    ) -> DataFrame:
        """Compute missing generated columns; validate supplied ones.
        Zero plan overhead when the table declares none. ``check_df``
        restricts the validation to a subset of ``df`` (merge_apply
        validates only surviving upserts — delete rows never land, so
        their generated values don't matter)."""
        for key, expr in self.properties().items():
            if not key.startswith(self._GENERATED_PREFIX):
                continue
            col = key[len(self._GENERATED_PREFIX):]
            if col not in df.columns:
                df = df.withColumn(col, F.expr(expr))
            else:
                self._check_generated(
                    df if check_df is None else check_df, {key: expr}
                )
        return df

    def _check_generated(self, df: DataFrame, props: dict | None = None) -> None:
        props = self.properties() if props is None else props
        for key, expr in props.items():
            if not key.startswith(self._GENERATED_PREFIX):
                continue
            col = key[len(self._GENERATED_PREFIX):]
            if col not in df.columns:
                continue
            bad = (
                df.filter(~F.col(col).eqNullSafe(F.expr(expr)))
                .limit(1)
                .collect()
            )
            if bad:
                raise ValueError(
                    f"generated column {col!r} ({expr}) mismatch on e.g."
                    f" {bad[0].asDict()!r}"
                )

    def _enforce_constraints(
        self, df: DataFrame, props: dict | None = None
    ) -> None:
        props = self.properties() if props is None else props
        for key, expr in props.items():
            if not key.startswith(self._CONSTRAINT_PREFIX):
                continue
            cond = F.expr(expr)
            bad = df.filter(~cond | cond.isNull()).limit(1).collect()
            if bad:
                raise ValueError(
                    f"CHECK constraint {key[len(self._CONSTRAINT_PREFIX):]!r}"
                    f" ({expr}) violated by e.g. {bad[0].asDict()!r}"
                )

    def append(
        self,
        df: DataFrame,
        *,
        txn: tuple[str, int] | None = None,
        partition_by: Sequence[str] | None = None,
        max_retries: int = 10,
    ) -> int:
        """Transactional append. Data files are written ONCE; only the
        (cheap) commit is retried on conflict — appends commute, so a
        lost race needs no re-read.

        ``txn=(app, batch_id)`` makes the append IDEMPOTENT per
        (app, batch_id) — the Delta txnAppId/txnVersion contract that
        turns foreachBatch's at-least-once redelivery into
        exactly-once. The watermark is evaluated AS-OF the same base
        version the commit targets (one log read per attempt), so a
        concurrent replay that slips in between surfaces as a
        CommitConflict at base+1 and forces a re-check — two
        concurrent replays of the same batch can never both land."""
        if txn is not None:  # cheap pre-stage short-circuit
            last = self.last_txn_batch(txn[0])
            if last is not None and txn[1] <= last:
                return self.latest_version()
        self._reject_reserved_row_id(df)
        df = self._apply_defaults(df)
        identity = sorted(
            k[len(self._IDENTITY_PREFIX):]
            for k in self.properties()
            if k.startswith(self._IDENTITY_PREFIX)
        )
        if identity:
            return self._append_with_identity(
                df,
                identity,
                txn=txn,
                partition_by=partition_by,
                max_retries=max_retries,
            )
        df = self._apply_generated(df)
        self._enforce_constraints(df)
        colmap = self._colmap()
        add, schema = self._stage_actions(
            self._physicalize(df, colmap),
            partition_by=self._phys_partition_by(partition_by, colmap),
        )
        for _ in range(max_retries):
            base = self.latest_version()
            if txn is not None:
                last = self.last_txn_batch(txn[0], as_of=base)
                if last is not None and txn[1] <= last:
                    return base
            try:
                v = self._try_commit(
                    base + 1,
                    "append",
                    add,
                    [],
                    self._evolve_schema(schema, base),
                    txn,
                )
            except CommitConflict:
                continue
            if (
                self.auto_compact_files
                and len(self._resolve(v)[0]) > self.auto_compact_files
            ):
                try:  # best-effort: ANY auto-compact failure only defers
                    # compaction — the append itself already committed, so
                    # surfacing an error here would report a successful
                    # write as failed (and a retry would duplicate data)
                    return self._auto_optimize()
                except Exception:
                    pass
            return v
        raise CommitConflict(f"append lost {max_retries} commit races")

    def _auto_optimize(self) -> int:
        """The autoCompact follow-up commit: plain bin-packing — or,
        on a liquid-clustered table, INCREMENTAL clustering (the
        Databricks composition: auto-compaction of a clustered table
        clusters as it packs), so streaming appends converge to a
        clustered layout without a scheduled OPTIMIZE job."""
        if self.clustering_columns():
            return self.optimize_cluster(n_files=self.auto_compact_files)
        return self.compact(n_files=self.auto_compact_files)

    def _dv_debt_files(self, live, dvs, ratio: float) -> list[str]:
        """Live files whose deletion vector masks >= ``ratio`` of
        their rows — selected from manifest stats alone (vector counts
        ride the reference, record counts ride the add action), zero
        data reads. A vectored file whose manifest predates record
        counts is conservatively in debt."""
        out = []
        for p, val in dvs.items():
            st = live.get(p)
            if st is None:
                continue
            n = _dv_count(val)
            if not n:
                continue
            total = st.get("#rows")  # manifest record count: [n]
            if total is None or n >= ratio * int(total[0]):
                out.append(p)
        return sorted(out)

    def _auto_maintain(self, v: int, props_hint: dict | None = None) -> int:
        """Post-commit layout policy, best-effort (the data commit
        already landed; any failure here only defers maintenance):
        first the writer-side file-count autoCompact, then the
        DELETION-VECTOR DEBT policy — the TABLE property
        ``optimize.maxDeletedRowsRatio`` (Delta's OPTIMIZE
        deleted-rows heuristic): any live file whose vector masks >=
        ratio of its rows is rewritten via ``reorg_purge(min_dv_ratio
        =...)``, materializing the mask and dropping the vector. This
        is what keeps a 100 TB table under a sustained merge-on-read
        CDC trickle from degrading monotonically: read tax (the
        coords-join mask) stays bounded by the ratio instead of
        accumulating until a human runs REORG ... APPLY (PURGE).

        ``props_hint`` (the verb's already-resolved commit-base
        properties) lets the no-policy fast path skip the post-commit
        log resolution entirely — the check must not tax every verb
        on tables that never opted in. (A property commit landing
        between base and v is caught on the NEXT write — the policy
        is amortized maintenance, not a synchronous invariant.)"""
        try:
            if (
                self.auto_compact_files
                and len(self._resolve(v)[0]) > self.auto_compact_files
            ):
                return self._auto_optimize()
            if props_hint is not None and not props_hint.get(
                self._DV_RATIO_KEY
            ):
                return v  # no debt policy at the commit base
            live, _, _, props, dvs = self._resolve_state(v)
            r = props.get(self._DV_RATIO_KEY)
            if r and dvs and self._dv_debt_files(live, dvs, float(r)):
                return self.reorg_purge(min_dv_ratio=float(r))
        except Exception:
            pass
        return v

    def foreach_batch_sink(self, app: str):
        """``writeStream.foreachBatch`` adapter: exactly-once streaming
        ingestion into the ACID table. Structured Streaming guarantees
        monotonically increasing batch ids per checkpoint and replays a
        batch after failure with the SAME id; the txn watermark above
        deduplicates the replay, so end-to-end delivery is
        exactly-once (the streaming twin of the reference's
        idempotent-write guard, worker.py:214-221)."""

        def sink(batch_df: DataFrame, batch_id: int) -> None:
            self.append(batch_df, txn=(app, int(batch_id)))

        return sink

    def overwrite(
        self,
        df: DataFrame,
        *,
        partition_by: Sequence[str] | None = None,
        max_retries: int = 10,
    ) -> int:
        """Atomic full-table replace (remove every live file + add the
        new set in one commit)."""
        self._reject_reserved_row_id(df)
        df = self._apply_defaults(df)
        df = self._apply_generated(df)
        self._enforce_constraints(df)
        colmap = self._colmap()
        add, schema = self._stage_actions(
            self._physicalize(df, colmap),
            partition_by=self._phys_partition_by(partition_by, colmap),
        )
        for _ in range(max_retries):
            base = self.latest_version()
            live, _ = self._resolve(base if base >= 0 else None)
            try:
                return self._try_commit(base + 1, "overwrite", add, live, schema)
            except CommitConflict:
                continue
        raise CommitConflict(f"overwrite lost {max_retries} commit races")

    def overwrite_where(
        self,
        df: DataFrame,
        filters,
        *,
        partition_by: Sequence[str] | None = None,
        max_retries: int = 5,
    ) -> int:
        """Delta's ``replaceWhere``: atomically replace exactly the
        rows matching ``filters`` (same ``(col, op, value)`` triples
        as ``scan``/``delete``) with ``df`` — the idempotent
        partition/date-range re-ingestion shape (recompute one day,
        swap it in, never touch the rest). One commit: files whose
        stats CAN hold a matching row are rewritten with their
        matching rows dropped, provably-unmatched files carry over by
        path, and the new data lands beside them.

        Delta's safety contract is enforced: every incoming row must
        itself satisfy the predicate (otherwise the "replace" would
        smuggle rows into ranges it didn't clear — rejected, like
        Delta's replaceWhere validation). Empty filters are rejected;
        use ``overwrite`` for a full-table replace.

        At 100 TB this is what nightly backfills should use: cost is
        O(replaced range) — manifest pruning bounds the rewrite to
        the partition being recomputed, not the table."""
        if not filters:
            raise ValueError(
                "overwrite_where requires at least one filter "
                "(use overwrite() to replace the whole table)"
            )
        self._reject_reserved_row_id(df)
        df = self._apply_defaults(df)
        identity = sorted(
            k[len(self._IDENTITY_PREFIX):]
            for k in self.properties()
            if k.startswith(self._IDENTITY_PREFIX)
        )
        for c in identity:
            if c in df.columns:
                raise ValueError(
                    f"identity column {c!r} is GENERATED ALWAYS — omit it"
                )
            if any(f[0] == c for f in filters):
                raise ValueError(
                    f"replaceWhere predicate on identity column {c!r} is "
                    "not supported: replaced rows are re-minted fresh ids, "
                    "so no incoming row could satisfy the predicate"
                )
        df = self._apply_generated(df)
        self._enforce_constraints(df)
        # replaceWhere contract: new rows must match the predicate
        logical_pred = _filters_to_predicate(filters)
        bad = df.filter(~logical_pred | logical_pred.isNull()).limit(1).collect()
        if bad:
            raise ValueError(
                f"replaceWhere violation: incoming row {bad[0].asDict()!r} "
                f"does not satisfy {filters!r}"
            )
        colmap = self._colmap()
        phys_filters = self._phys_filters(filters, colmap)
        pred = _filters_to_predicate(phys_filters)
        if not identity:  # stage once; retries only re-read the log
            add_new, schema = self._stage_actions(
                self._physicalize(df, colmap),
                partition_by=self._phys_partition_by(partition_by, colmap),
            )
        for _ in range(max_retries):
            base = self.latest_version()
            new_props = None
            if identity:
                # identity assignment depends on the watermark at
                # ``base``, so staging happens per attempt (a lost
                # race orphans the staging — vacuum sweeps it) and the
                # advanced watermark commits WITH the data, exactly
                # like _append_with_identity.
                props = self.properties(base) if base >= 0 else self.properties()
                out = df.withColumn("__mono", F.monotonically_increasing_id())
                for c in identity:
                    nxt = props[self._IDENTITY_PREFIX + c]["next"]
                    out = out.withColumn(
                        c, (F.lit(int(nxt)) + F.col("__mono")).cast("long")
                    )
                out = out.drop("__mono")
                add_new, schema = self._stage_actions(
                    self._physicalize(out, colmap),
                    partition_by=self._phys_partition_by(partition_by, colmap),
                )
                new_props = dict(props)
                phys_of = {
                    c: self._phys_names([c], colmap)[0] for c in identity
                }
                for c in identity:
                    top = None
                    for a in add_new:
                        rng = a["stats"].get(phys_of[c])
                        if rng is None:
                            top = None
                            break
                        top = rng[1] if top is None else max(top, rng[1])
                    if top is None and add_new:  # stats missing: read staged
                        top = self.spark.read.parquet(
                            *[
                                os.path.join(self.path, a["path"])
                                for a in add_new
                            ]
                        ).agg(F.max(phys_of[c]).alias("m")).first()["m"]
                    if top is not None:
                        new_props[self._IDENTITY_PREFIX + c] = {
                            "next": int(top) + 1
                        }
            if base < 0:  # first commit: nothing to replace
                try:
                    return self._try_commit(
                        0, "overwrite", add_new, [], schema, props=new_props
                    )
                except CommitConflict:
                    continue
            touched, _, schema_json = self._pruned_live(phys_filters, base)
            dvs = self._resolve_state(base)[4]
            add = list(add_new)
            commit_schema = self._evolve_schema(schema, base)
            if touched:
                remainder = self._read_for_rewrite(
                    touched, schema_json, dvs, base
                ).filter(~pred | pred.isNull())
                add_rem, rem_schema = self._stage_actions(remainder)
                add = add_rem + add
                if self._ROW_ID_COL in remainder.columns:
                    # the remainder rewrite materialized row ids: the
                    # committed schema must carry the hidden column
                    d = json.loads(commit_schema)
                    if not any(
                        f["name"] == self._ROW_ID_COL for f in d["fields"]
                    ):
                        d["fields"].append(
                            {
                                "name": self._ROW_ID_COL,
                                "type": "long",
                                "nullable": True,
                                "metadata": {},
                            }
                        )
                        commit_schema = json.dumps(d)
            if new_props is None:
                # non-identity path: rebase-eligible like delete (the
                # replaced region is the read+write set; under
                # write_serializable a blind append elsewhere — or
                # even into the region, serial order replace-then-
                # append — commutes). Identity backfills carry a
                # watermark props snapshot and must re-plan instead.
                v = self._commit_or_rebase(
                    base, "overwrite", add, touched, commit_schema,
                    read_filters=phys_filters,
                )
                if v is not None:
                    return v
                continue
            try:
                return self._try_commit(
                    base + 1,
                    "overwrite",
                    add,
                    touched,
                    commit_schema,
                    props=new_props,
                )
            except CommitConflict:
                continue
        raise CommitConflict(f"overwrite_where lost {max_retries} commit races")

    def copy_into(
        self,
        src: str,
        *,
        fileformat: str = "parquet",
        pattern: str | None = None,
        options: dict[str, str] | None = None,
        max_retries: int = 10,
    ) -> tuple[int, int]:
        """Delta-style ``COPY INTO``: idempotent bulk load from a
        directory of files. Each SOURCE FILE is loaded at most once —
        the set of loaded basenames rides in a table property keyed by
        the source directory, updated in the SAME commit as the data,
        so a rerun (or a concurrent duplicate run: the loser's commit
        conflicts, and its retry sees the winner's ledger) skips
        already-loaded files. Returns ``(version, n_files_loaded)``
        (``n_files_loaded == 0`` means everything was already in).

        The ledger grows one basename per loaded file and is rewritten
        on each copy_into commit — fine for the thousands-of-files
        batch-drop case this verb serves; a firehose of tiny files
        belongs on the streaming source instead (the ledger would not:
        at millions of entries you would bucket it, which is exactly
        the txn-ledger design the streaming sink already uses).

        Identity tables are rejected (use ``append``, which assigns);
        generated columns and CHECK constraints are enforced like any
        append. Schema may widen additively (mergeSchema semantics).
        """
        import fnmatch
        import hashlib

        if any(
            k.startswith(self._IDENTITY_PREFIX) for k in self.properties()
        ):
            raise ValueError(
                "COPY INTO an identity-column table is not supported — "
                "use append(), which assigns identity values"
            )
        names = sorted(
            n
            for n in os.listdir(src)
            if os.path.isfile(os.path.join(src, n))
            and not n.startswith((".", "_"))
            and (pattern is None or fnmatch.fnmatch(n, pattern))
        )
        key = (
            "copyinto."
            + hashlib.md5(os.path.abspath(src).encode()).hexdigest()[:12]
        )
        for _ in range(max_retries):
            base = self.latest_version()
            _, _, _, props, _ = self._resolve_state(
                base if base >= 0 else None
            )
            loaded = set(props.get(key) or [])
            new = [n for n in names if n not in loaded]
            if not new:
                return base, 0
            reader = self.spark.read.format(fileformat).options(
                **(options or {})
            )
            # schema-less formats (csv/json/text) read under the
            # table's LOGICAL schema when one exists — types line up
            # with the target instead of being re-inferred per batch
            # (Delta COPY INTO's behavior); parquet self-describes
            if fileformat in ("csv", "json", "text"):
                _, schema_json, _, _, _ = self._resolve_state(
                    base if base >= 0 else None
                )
                if schema_json is not None:
                    colmap = self._colmap()
                    phys = T.StructType.fromJson(json.loads(schema_json))
                    logical = T.StructType(
                        [
                            T.StructField(
                                colmap.get(f.name, f.name), f.dataType, True
                            )
                            for f in phys.fields
                            if colmap.get(f.name, f.name) != ""
                        ]
                    )
                    reader = reader.schema(logical)
            df = reader.load([os.path.join(src, n) for n in new])
            self._reject_reserved_row_id(df)
            # declared DEFAULTs materialize for columns the loaded
            # frame lacks — same contract as append. (A schema-forced
            # csv/json read pads a missing field as NULL rather than
            # dropping the column, and NULL-supplied is not absent.)
            df = self._apply_defaults(df)
            df = self._apply_generated(df)
            self._enforce_constraints(df)
            colmap = self._colmap()
            add, schema = self._stage_actions(
                self._physicalize(df, colmap),
                partition_by=self._phys_partition_by(None, colmap),
            )
            newprops = dict(props)
            newprops[key] = sorted(loaded | set(new))
            try:
                return (
                    self._try_commit(
                        base + 1,
                        "copyinto",
                        add,
                        [],
                        self._evolve_schema(schema, base),
                        props=newprops,
                    ),
                    len(new),
                )
            except CommitConflict:
                continue
        raise CommitConflict(f"copy_into lost {max_retries} commit races")

    @classmethod
    def _promotable(cls, a: T.DataType, b: T.DataType) -> bool:
        """True when values of ``a`` read losslessly as ``b`` (equal,
        or one step set of the widening lattice)."""
        if a == b:
            return True
        if (
            isinstance(a, T.DecimalType)
            and isinstance(b, T.DecimalType)
            and b.scale == a.scale
            and b.precision >= a.precision
        ):
            return True
        return b.typeName() in cls._WIDEN.get(a.typeName(), set())

    def _evolve_schema(self, staged_json: str, base: int) -> str:
        """Append-path schema evolution: the commit's schema is the
        field-wise WIDENING of the committed schema with the staged
        batch's. An append may add columns (additive evolution) and
        may carry narrower-footer data for a widened column, but can
        never NARROW or DROP the committed schema — without this, a
        batch written before an add_columns/widen_column landed would
        silently revert the evolution for every later reader (the
        latest commit's schema wins in _resolve_state). Incompatible
        same-name types (string vs int) are rejected by name."""
        if base < 0:
            return staged_json
        _, cur_json, _, _, _ = self._resolve_state(base)
        if cur_json is None or cur_json == staged_json:
            return staged_json
        cur = T.StructType.fromJson(json.loads(cur_json))
        staged = T.StructType.fromJson(json.loads(staged_json))
        staged_by_name = {f.name: f for f in staged.fields}
        out = []
        for f in cur.fields:
            s = staged_by_name.pop(f.name, None)
            if s is None or self._promotable(s.dataType, f.dataType):
                out.append(f)  # batch narrower or absent: committed wins
            elif self._promotable(f.dataType, s.dataType):
                # batch wider: loss-free auto-widen (mergeSchema shape)
                out.append(
                    T.StructField(f.name, s.dataType, f.nullable, f.metadata)
                )
            else:
                raise ValueError(
                    f"append schema conflict on {f.name!r}: table has "
                    f"{f.dataType.simpleString()}, batch has "
                    f"{s.dataType.simpleString()} — neither reads as the "
                    "other; cast the batch or evolve the schema explicitly"
                )
        out += [staged_by_name[f.name] for f in staged.fields if f.name in staged_by_name]
        return T.StructType(out).json()

    def commit_staged(
        self,
        add: list[dict],
        schema_json: str,
        *,
        overwrite: bool = False,
        txn: tuple[str, int] | None = None,
        max_retries: int = 10,
    ) -> int:
        """Commit already-staged file actions (the driver half of a
        distributed write whose data files were produced elsewhere —
        the DSv2 ``acidtable`` writer's executors stage parquet
        directly, then hand the driver this commit). Same retry/txn
        semantics as ``append``/``overwrite``; data files are never
        rewritten on a lost race."""
        for _ in range(max_retries):
            base = self.latest_version()
            if txn is not None:
                last = self.last_txn_batch(txn[0], as_of=base)
                if last is not None and txn[1] <= last:
                    return base
            remove: list[str] = []
            if overwrite:
                live, _ = self._resolve(base if base >= 0 else None)
                remove = live
            try:
                return self._try_commit(
                    base + 1,
                    "overwrite" if overwrite else "append",
                    add,
                    remove,
                    # an overwrite REPLACES the schema; an append may
                    # only widen it (see _evolve_schema)
                    schema_json
                    if overwrite
                    else self._evolve_schema(schema_json, base),
                    txn,
                )
            except CommitConflict:
                continue
        raise CommitConflict(f"staged commit lost {max_retries} races")

    def version_at_timestamp(self, ts: float) -> int:
        """Latest version committed at-or-before ``ts`` (epoch
        seconds) — Delta's ``timestampAsOf`` resolution. Scans the
        whole commit range rather than binary-searching so a
        clock-skewed (locally non-monotone) commit timestamp can never
        hide a version; the log is metadata-sized and checkpointed, so
        this is a bounded driver read."""
        latest = self.latest_version()
        if latest < 0:
            raise ValueError(f"table {self.path} has no commits")
        best = None
        for v in range(latest + 1):
            if self._read_commit(v).ts <= ts:
                best = v
        if best is None:
            raise ValueError(
                f"no commit at or before timestamp {ts} (earliest commit is "
                f"{self._read_commit(0).ts})"
            )
        return best

    def _read_files(
        self, rel_paths: Sequence[str], schema_json: str | None
    ) -> DataFrame:
        """Scan data files under the COMMITTED schema. With a schema,
        the parquet reader resolves the whole evolution surface at
        scan time: a column a file predates reads as nulls (additive
        evolution) and a column whose footer type is NARROWER than the
        declared type up-casts in the vectorized reader (type
        widening — int→long, float→double, decimal precision growth),
        which ``mergeSchema`` cannot do (mixed int/long footers refuse
        to merge). Fields are forced nullable for the read: a
        not-null declared field still reads null from a file that
        predates it. Without a schema (bootstrap paths) fall back to
        footer merging."""
        paths = [os.path.join(self.path, p) for p in rel_paths]
        if schema_json is None:
            return self.spark.read.option("mergeSchema", "true").parquet(*paths)
        declared = T.StructType.fromJson(json.loads(schema_json))
        readable = T.StructType(
            [T.StructField(f.name, f.dataType, True, f.metadata) for f in declared.fields]
        )
        return self.spark.read.schema(readable).parquet(*paths)

    def snapshot(
        self, as_of: int | None = None, *, with_row_ids: bool = False
    ) -> DataFrame:
        """Read the table as of a version (default: latest). The file
        list is pinned at call time — later commits don't leak in.
        For timestamp-based travel resolve the version first:
        ``snapshot(as_of=t.version_at_timestamp(ts))``.

        ``with_row_ids=True`` (row-tracking tables) appends the stable
        ``_row_id`` column — materialized ``__row_id`` where a rewrite
        persisted it, else the file's manifest base + row position.
        The hidden ``__row_id`` physical column itself never surfaces
        on either path."""
        files, schema = self._resolve(as_of)
        colmap = self._colmap(as_of)
        if not files:
            if schema is None:
                raise ValueError(f"table {self.path} has no commits")
            df = self._logicalize(
                self.spark.createDataFrame(
                    [], T.StructType.fromJson(json.loads(schema))
                ),
                colmap,
            )
            if self._ROW_ID_COL in df.columns:
                df = df.drop(self._ROW_ID_COL)
            if with_row_ids:
                df = df.withColumn("_row_id", F.lit(None).cast("long"))
            return df
        # committed-schema scan: additive evolution (older files read
        # missing columns as typed nulls) AND type widening resolve in
        # the parquet reader itself — see _read_files
        state = self._resolve_state(as_of)
        df = self._read_files(files, schema)
        if with_row_ids:
            if not self._row_tracking_on(state[3]):
                raise ValueError(
                    "row tracking is not enabled (set_row_tracking())"
                )
            # coords come off the scan relation BEFORE the DV anti-join
            # hides _metadata; the base join happens after the mask
            df = self._row_id_coords(df)
        df = self._apply_dvs(df, files, state[4])
        if with_row_ids:
            df = self._attach_row_ids(df, files, state[0])
        df = self._logicalize(
            df, colmap, keep=("_row_id",) if with_row_ids else ()
        )
        if self._ROW_ID_COL in df.columns:
            df = df.drop(self._ROW_ID_COL)
        return df

    #: accumulated masked rows above which the read-side tombstone set
    #: is decoded on executors + joined (below: driver-built broadcast,
    #: strictly cheaper — no shuffle). Class attr so tests can lower it.
    _DV_BROADCAST_MAX_ROWS = 2_000_000

    def _dv_entry(
        self, rel: str, indices=None, *, payload: bytes | None = None,
        n: int | None = None,
    ) -> dict:
        """Build one commit ``dv`` action for ``rel``, spilling the
        vector to a content-addressed sidecar under ``data/dvs/`` when
        the inline encoding outgrows ``_DV_INLINE_MAX`` (the Delta
        DV-descriptor shape): a 10M-row merge-on-read delete commits a
        <100-byte reference instead of ~100 MB of JSON payload, and
        checkpoints / log resolution never carry the bitmap bytes.
        Callers holding an executor-encoded payload (see
        ``_dv_entries_from``) pass it directly; everyone else passes
        indices."""
        if payload is None:
            payload, n = _dv_encode_runs(indices)
        inline = _DV_RLE_PREFIX + base64.b64encode(payload).decode()
        if len(inline) <= _DV_INLINE_MAX:
            return {"path": rel, "del": inline, "n": n}
        name = f"dv-{hashlib.sha256(payload).hexdigest()[:32]}.bin"
        rel_sc = os.path.join(_DATA, _DV_SIDECAR_DIR, name)
        full = os.path.join(self.path, rel_sc)
        if not os.path.isfile(full):  # content-addressed: write once
            os.makedirs(os.path.dirname(full), exist_ok=True)
            tmp = f"{full}.tmp-{uuid.uuid4().hex}"
            with open(tmp, "wb") as f:
                f.write(payload)
                f.flush()
                os.fsync(f.fileno())
            os.replace(tmp, full)
        return {"path": rel, "del": f"{_DV_SIDECAR_PREFIX}{rel_sc}:{n}", "n": n}

    #: manifest row-count bound (sum of touched files' ``#rows``) at
    #: or below which the hit coordinates are collected and RLE-encoded
    #: on the DRIVER instead of via the shuffle + applyInPandas kernel.
    #: The read-side twin of ``_DV_BROADCAST_MAX_ROWS``: below the
    #: bound the driver-built path is strictly cheaper (one collect
    #: job, no exchange, no Python worker — the lifecycle profile
    #: showed the executor chain costing 3-4 AQE jobs per MOR verb at
    #: sf0.1), above it the executor kernel keeps the driver
    #: O(compressed payload bytes). Class attr so tests can lower it.
    _DV_ENCODE_DRIVER_MAX_ROWS = 2_000_000

    @staticmethod
    def _touched_row_bound(
        live: dict | None, touched: Sequence[str]
    ) -> int | None:
        """Upper bound on MOR hit coordinates: the sum of manifest
        record counts over the touched files. None (= unbounded, use
        the executor encode) when any touched file lacks ``#rows``."""
        if live is None:
            return None
        total = 0
        for p in touched:
            r = (live.get(p) or {}).get("#rows")
            if not r:
                return None
            total += int(r[0])
        return total

    def _dv_entries_from(
        self,
        hits: DataFrame,
        touched: Sequence[str],
        dvs: dict[str, str],
        *,
        row_bound: int | None = None,
    ) -> list[dict]:
        """(__fp, __ri) hit coordinates → commit ``dv`` actions, with
        the per-file RLE encode running on EXECUTORS (one shuffle by
        file + applyInPandas): the driver receives one compressed
        payload per file, never the matched rows themselves — the
        piece that makes a 10M-row merge-on-read delete driver-safe.
        Files that already carry a vector merge IN THE SAME KERNEL —
        the existing reference (absolutized) rides into the group as a
        column, the executor hydrates + unions + re-encodes, and the
        driver still only ever sees compressed payloads (canonical
        form preserved by the encode's sort-unique).

        ``row_bound`` (callers pass ``_touched_row_bound``) gates a
        driver fast path: when the manifest proves the hit set small,
        the coordinates are collected via Arrow and encoded with the
        SAME numpy kernel driver-side — one collect job instead of
        scan + exchange + Python-worker + collect. Entries are
        byte-identical either way (the encode is sort-unique
        canonical)."""
        exrefs = {
            "file:" + os.path.abspath(os.path.join(self.path, p)):
                _dv_abs(dvs[p], self.path)
            for p in touched
            if p in dvs and dvs[p]
        }
        if (
            row_bound is not None
            and row_bound <= self._DV_ENCODE_DRIVER_MAX_ROWS
        ):
            import numpy as np

            pdf = hits.select("__fp", "__ri").toPandas()
            entries = []
            for fp, grp in pdf.groupby("__fp", sort=False):
                idx = grp["__ri"].to_numpy(dtype="int64")
                ref = exrefs.get(fp)
                if ref:
                    idx = np.concatenate(
                        [idx, np.asarray(_unpack_dv(ref), dtype=np.int64)]
                    )
                payload, n = _dv_encode_runs(idx)
                rel = next((f for f in touched if fp.endswith(f)), None)
                if rel is None:  # never expected; fail loud
                    raise RuntimeError(f"unmapped file {fp}")
                entries.append(self._dv_entry(rel, payload=payload, n=n))
            return sorted(entries, key=lambda e: e["path"])
        if exrefs:
            ref_df = self.spark.createDataFrame(
                list(exrefs.items()), "__fp string, __exref string"
            )
            hits = hits.join(F.broadcast(ref_df), "__fp", "left")
        enc = (
            hits.groupBy("__fp")
            .applyInPandas(
                _dv_encode_group, "__fp string, payload binary, n long"
            )
            .collect()
        )
        entries = []
        for r in enc:
            rel = next((f for f in touched if r["__fp"].endswith(f)), None)
            if rel is None:  # never expected; fail loud
                raise RuntimeError(f"unmapped file {r['__fp']}")
            entries.append(
                self._dv_entry(
                    rel, payload=bytes(r["payload"]), n=int(r["n"])
                )
            )
        return sorted(entries, key=lambda e: e["path"])

    def _apply_dvs(
        self, df: DataFrame, rel_paths: Sequence[str], dvs: dict[str, str]
    ) -> DataFrame:
        """Merge-on-read: filter out rows whose (file, row index) is in
        a deletion vector. No-op (and zero plan overhead) when none of
        ``rel_paths`` carries a vector; otherwise the tombstone set —
        bounded by MOR-deleted rows, the reason ``delete(mode=
        'merge_on_read')`` is for small-fraction deletes — broadcasts
        into an anti join against parquet's ``_metadata`` file/row
        coordinates."""
        relevant = {p: dvs[p] for p in rel_paths if p in dvs}
        if not relevant:
            return df
        return self._with_dv_coords(df, rel_paths, dvs).select(*df.columns)

    def _with_dv_coords(
        self, df: DataFrame, rel_paths: Sequence[str], dvs: dict[str, str]
    ) -> DataFrame:
        """``df`` with ``__fp``/``__ri`` file-coordinate columns
        appended and DV-masked rows removed. The coordinate columns
        come from parquet's ``_metadata`` pseudo-column, which only
        resolves on the scan relation — callers needing coordinates
        must take them HERE, before any join hides the relation."""
        out = df.select(
            "*",
            F.col("_metadata.file_path").alias("__fp"),
            F.col("_metadata.row_index").alias("__ri"),
        )
        import pandas as pd

        relevant = [(p, dvs[p]) for p in rel_paths if p in dvs]
        total = sum(_dv_count(v) for _, v in relevant)
        if total == 0:
            return out
        if total > self._DV_BROADCAST_MAX_ROWS:
            # big accumulated vectors: decode on EXECUTORS (one task
            # per ref; sidecars read off shared storage like data
            # files) and let AQE pick the join — the driver never
            # hydrates the tombstones. Below the threshold the
            # driver-built broadcast is strictly cheaper (no shuffle).
            refs = self.spark.createDataFrame(
                [
                    (
                        "file:"
                        + os.path.abspath(os.path.join(self.path, p)),
                        _dv_abs(v, self.path),
                    )
                    for p, v in relevant
                ],
                "__fp string, __ref string",
            ).repartition(min(len(relevant), 64))
            tomb = refs.mapInPandas(_dv_expand_refs, "__fp string, __ri long")
            return out.join(tomb, ["__fp", "__ri"], "left_anti")
        frames = []
        for p, v in relevant:
            idx = _unpack_dv(v, self.path)
            if idx:
                fp = "file:" + os.path.abspath(os.path.join(self.path, p))
                frames.append(pd.DataFrame({"__fp": fp, "__ri": idx}))
        tomb = self.spark.createDataFrame(
            pd.concat(frames, ignore_index=True),
            "__fp string, __ri long",
        )
        return out.join(F.broadcast(tomb), ["__fp", "__ri"], "left_anti")

    def _pruned_live(
        self, filters, as_of: int | None = None
    ) -> tuple[list[str], int, str | None]:
        """(surviving file paths, total live count, schema) — the
        planning half of ``scan``, separated so tests (and callers that
        only want the file count) can observe pruning directly."""
        live, schema = self._resolve_actions(as_of)
        kept = sorted(p for p, st in live.items() if _file_may_match(st, filters))
        return kept, len(live), schema

    def scan(self, filters=(), as_of: int | None = None) -> DataFrame:
        """Manifest-pruned snapshot read — Iceberg's planning step.
        ``filters`` are ``(col, op, value)`` triples (op in ``= < <=
        > >= in between starts_with is_null is_not_null``; the null
        ops prune on the ``#null:`` count stats, ``starts_with`` on
        string ranges); files whose footer [min, max] ranges prove
        they contain no matching row are never handed to Spark, so the
        job's task count scales with the MATCHING partition of the
        table, not the table. The same filters are re-applied as a
        Spark predicate on the surviving files (and pushed into their
        row-group stats by the parquet reader), so the result is
        exactly ``snapshot().filter(pred)`` — pruning is purely a
        performance tier.

        On a partition-clustered table (``partition_by`` at write
        time) an equality filter on the cluster column prunes to that
        partition's files — at 100 TB the difference between a
        one-file point read and a full-manifest scan."""
        colmap = self._colmap(as_of)
        filters = self._phys_filters(filters, colmap)
        pred = _filters_to_predicate(filters)  # validates ops up front
        kept, _, schema = self._pruned_live(filters, as_of)
        if not kept:
            if schema is None:
                raise ValueError(f"table {self.path} has no commits")
            return self._logicalize(
                self.spark.createDataFrame(
                    [], T.StructType.fromJson(json.loads(schema))
                ),
                colmap,
            ).drop(self._ROW_ID_COL)
        df = self._apply_dvs(
            self._read_files(kept, schema),
            kept,
            self._resolve_state(as_of)[4],
        )
        out = self._logicalize(df.filter(pred) if filters else df, colmap)
        return out.drop(self._ROW_ID_COL)

    def truncate(self, *, max_retries: int = 5) -> int:
        """Remove every live row in ONE metadata-only commit (no data
        file written or rewritten — the live set empties, the
        committed schema stays for future reads and writes). This is
        the ``DELETE FROM t`` (no WHERE) statement's target: at any
        scale it is O(manifest), where a predicate delete would
        pointlessly rewrite nothing into nothing."""
        for _ in range(max_retries):
            base = self.latest_version()
            if base < 0:
                raise ValueError(f"table {self.path} has no commits")
            live, schema_json, _, _, _ = self._resolve_state(base)
            if not live:
                return base  # already empty: no commit
            try:
                return self._try_commit(
                    base + 1, "delete", [], sorted(live), schema_json, None
                )
            except CommitConflict:
                continue
        raise CommitConflict(f"truncate lost {max_retries} commit races")

    def delete(
        self, filters, *, mode: str | None = None, max_retries: int = 5
    ) -> int:
        """DELETE WHERE. Two physical strategies, same logical result:

        ``copy_on_write`` (default): only live files whose stats CAN
        contain a matching row are rewritten (with the matching rows
        dropped); provably-unmatched files carry over untouched — the
        Delta/Iceberg v1 delete shape, and the reason a point delete
        on a partition-clustered 100 TB table rewrites one partition,
        not the table.

        ``merge_on_read``: no data file is rewritten — the matching
        rows' (file, row index) coordinates are committed as DELETION
        VECTORS (Delta DVs / Iceberg v2 positional deletes) and every
        reader masks them out. Delete cost is O(matching rows), write
        amplification zero; read cost grows with accumulated vectors
        until a rewrite of the file (compact / optimize / merge /
        copy-on-write delete) MATERIALIZES them, which atomically
        drops the vector. Suited to small-fraction deletes; for
        GDPR-scale sweeps prefer copy_on_write or ``merge_delete``.

        Empty filters are rejected (use ``overwrite`` with an empty
        frame to truncate — an explicit full-table delete should look
        explicit). ``mode=None`` resolves ``delete.mode`` then the
        blanket ``enableDeletionVectors`` table property."""
        if not filters:
            raise ValueError("delete() requires at least one filter")
        if mode is None:
            mode = self._default_write_mode("delete.mode")
        if mode not in ("copy_on_write", "merge_on_read"):
            raise ValueError(f"unknown delete mode {mode!r}")
        filters = self._phys_filters(filters)
        pred = _filters_to_predicate(filters)
        for _ in range(max_retries):
            base = self.latest_version()
            if base < 0:
                raise ValueError(f"table {self.path} has no commits")
            touched, _, schema_json = self._pruned_live(filters, base)
            if not touched:
                return base  # provably nothing to delete: no commit
            live, _, _, props, dvs = self._resolve_state(base)
            raw = self._read_files(touched, schema_json)
            if mode == "merge_on_read":
                hits = (
                    self._with_dv_coords(raw, touched, dvs)
                    .filter(pred)
                    .select("__fp", "__ri")
                )
                entries = self._dv_entries_from(
                    hits, touched, dvs,
                    row_bound=self._touched_row_bound(live, touched),
                )
                if not entries:
                    return base  # stats false-positive: nothing matched
                v = self._commit_or_rebase(
                    base, "delete", [], [], schema_json,
                    dv=entries, read_filters=filters,
                )
                if v is not None:
                    return self._auto_maintain(v, props_hint=props)
                continue  # true overlap: re-plan
            remaining = self._read_for_rewrite(
                touched, schema_json, dvs, base
            ).filter(~pred)
            add, schema = self._stage_actions(remaining)
            v = self._commit_or_rebase(
                base, "delete", add, touched, schema, read_filters=filters
            )
            if v is not None:
                return v
        raise CommitConflict(f"delete lost {max_retries} commit races")

    def update(
        self,
        assignments: dict[str, str],
        filters=(),
        *,
        mode: str | None = None,
        max_retries: int = 5,
    ) -> int:
        """UPDATE ... SET col = expr [WHERE ...] — the Delta UPDATE
        shape. ``assignments`` maps existing columns to SQL expression
        strings; every expression is evaluated against the PRE-update
        row (standard SQL UPDATE semantics, so ``{"a": "b", "b": "a"}``
        swaps), and the result is cast back to the column's declared
        type so the table schema never drifts. Assigning a column the
        table doesn't have is an error (UPDATE can't add columns —
        that's schema evolution via append).

        Two physical strategies, same logical result:

        ``copy_on_write`` (default): files whose stats CAN contain a
        matching row are rewritten with matching rows transformed and
        the rest copied; provably-unmatched files carry over by path.
        A cheap existence probe on the candidate files skips the
        commit entirely when the stats ranges were a false positive
        (the scan phase of Delta's two-phase UPDATE).

        ``merge_on_read``: no live file is rewritten — the matching
        rows' coordinates are committed as DELETION VECTORS and their
        updated versions are appended as a new file in the SAME
        commit (the Delta DV-update shape). Write cost is O(matching
        rows); suited to small-fraction updates, and the change feed
        sees exactly the delete+insert pair per updated row.

        Empty ``filters`` means every row (UPDATE without WHERE).
        CHECK constraints are enforced against the post-update rows
        before anything is committed."""
        if not assignments:
            raise ValueError("update() requires at least one assignment")
        if mode is None:
            mode = self._default_write_mode("update.mode")
        if mode not in ("copy_on_write", "merge_on_read"):
            raise ValueError(f"unknown update mode {mode!r}")
        # row-level predicate + assignments run in LOGICAL column space;
        # manifest pruning runs on physical stats keys
        pred = _filters_to_predicate(filters)
        colmap = self._colmap()
        phys_filters = self._phys_filters(filters, colmap)
        for _ in range(max_retries):
            base = self.latest_version()
            if base < 0:
                raise ValueError(f"table {self.path} has no commits")
            touched, _, schema_json = self._pruned_live(phys_filters, base)
            if not touched:
                return base  # provably nothing to update: no commit
            live, _, _, props, dvs = self._resolve_state(base)
            raw = self._read_files(touched, schema_json)
            # rewrite read: row ids (when tracked) materialize into the
            # hidden column and flow through assignment untouched —
            # Delta semantics, UPDATE preserves row identity. (raw
            # stays the bare scan: the MOR branch needs _metadata.)
            masked = self._logicalize(
                self._read_for_rewrite(touched, schema_json, dvs, base),
                colmap,
            )
            if self._ROW_ID_COL in assignments:
                raise ValueError(
                    f"column {self._ROW_ID_COL!r} is engine-assigned "
                    "(row tracking) and cannot be updated"
                )
            unknown = set(assignments) - set(masked.columns)
            if unknown:
                raise ValueError(
                    f"update() targets unknown column(s) {sorted(unknown)}"
                )
            types = {f.name: f.dataType for f in masked.schema.fields}

            def new_value(c):
                return F.expr(assignments[c]).cast(types[c])

            updated_rows = masked.filter(pred).select(
                *[
                    new_value(c).alias(c) if c in assignments else F.col(c)
                    for c in masked.columns
                ]
            )
            if mode == "merge_on_read":
                hits = (
                    self._logicalize(
                        self._with_dv_coords(raw, touched, dvs),
                        colmap,
                        keep=("__fp", "__ri"),
                    )
                    .filter(pred)
                    .select("__fp", "__ri")
                )
                entries = self._dv_entries_from(
                    hits, touched, dvs,
                    row_bound=self._touched_row_bound(live, touched),
                )
                if not entries:
                    return base  # stats false-positive: nothing matched
                self._enforce_constraints(updated_rows)
                self._check_generated(updated_rows)
                add, schema = self._stage_actions(
                    self._physicalize(updated_rows, colmap)
                )
                v = self._commit_or_rebase(
                    base, "update", add, [], schema,
                    dv=entries, read_filters=phys_filters,
                )
                if v is not None:
                    return self._auto_maintain(v, props_hint=props)
                continue  # true overlap: re-plan
            if masked.filter(pred).limit(1).first() is None:
                return base  # stats false-positive: nothing matched
            self._enforce_constraints(updated_rows)
            self._check_generated(updated_rows)
            rewritten = masked.select(
                *[
                    F.when(pred, new_value(c)).otherwise(F.col(c)).alias(c)
                    if c in assignments
                    else F.col(c)
                    for c in masked.columns
                ]
            )
            add, schema = self._stage_actions(
                self._physicalize(rewritten, colmap)
            )
            v = self._commit_or_rebase(
                base, "update", add, touched, schema,
                read_filters=phys_filters,
            )
            if v is not None:
                return v
        raise CommitConflict(f"update lost {max_retries} commit races")

    def changes(
        self,
        since_version: int,
        until_version: int | None = None,
        *,
        with_row_ids: bool = False,
        as_images: bool = False,
    ) -> DataFrame:
        """Change data feed: the NET row-level difference between two
        snapshots, as the table's rows plus a ``_change_type`` column
        (``insert`` / ``delete``; an update surfaces as its
        delete+insert pair — the CDC shape a downstream MERGE
        consumes). Computed from ONLY the files that differ between
        the two versions: a file carried over by both snapshots is
        never read, and rows a rewrite copied unchanged (merge/compact
        copy-on-write) cancel out via ``exceptAll``, so a pure-layout
        commit (compact, optimize_zorder) yields an EMPTY feed. Cost
        scales with churn, not table size — the property that makes
        incremental downstream consumption (index refresh, dedup
        deltas, derived-table maintenance) viable at 100 TB.

        Columns are aligned across schema evolution (a column added
        after ``since_version`` reads as null on the delete side).

        Retention interplay: the delete side reads files the LOG has
        removed, which ``vacuum`` physically deletes once
        ``since_version`` falls outside ``retain_versions`` — consume
        the feed within the vacuum retention window (the same
        contract Delta's CDF has with its VACUUM).

        ``with_row_ids=True`` (row-tracking tables) adds the stable
        ``_row_id`` column: an UPDATE's delete+insert pair SHARES its
        id, so a downstream consumer reconstructs true row-level
        updates without a natural key — and because rewrites preserve
        ids, carried rows still cancel and layout commits still yield
        an empty feed.

        ``as_images=True`` (row-tracking tables; the batch twin of the
        acidtable reader's ``updateAsImages`` option) folds the
        id-paired rows into Delta's 4-value enum: a delete and an
        insert sharing a row id within the range relabel to
        ``update_preimage``/``update_postimage`` (over a multi-commit
        range the pair is the row's ORIGINAL image and its FINAL one —
        intermediate versions net out, the CDF range contract). Ids
        are joined for the pairing and dropped again unless
        ``with_row_ids``."""
        until = self.latest_version() if until_version is None else until_version
        live_new, schema_new, _, props_new, dv_new = self._resolve_state(until)
        live_old, schema_old, _, _, dv_old = self._resolve_state(since_version)
        if (with_row_ids or as_images) and not self._row_tracking_on(
            props_new
        ):
            raise ValueError(
                "row tracking is not enabled (set_row_tracking())"
                + (" — as_images pairs on _row_id" if as_images else "")
            )
        emit_rids = with_row_ids
        with_row_ids = with_row_ids or as_images  # read ids for pairing
        # diff on (path, deletion vector): a carried-over file whose
        # vector changed must be read on BOTH sides — each side masked
        # with its own vector, so exceptAll nets to exactly the
        # newly-masked rows on the delete side. A file with an
        # UNCHANGED vector still never gets read.
        keys_new = {(p, dv_new.get(p)) for p in live_new}
        keys_old = {(p, dv_old.get(p)) for p in live_old}
        added = sorted(p for p, _ in keys_new - keys_old)
        removed = sorted(p for p, _ in keys_old - keys_new)
        schema_json = schema_new or schema_old
        if schema_json is None:
            raise ValueError(f"table {self.path} has no commits")

        def read(
            paths: list[str],
            dvs: dict[str, str],
            side_schema: str | None,
            live_stats: dict,
        ) -> DataFrame:
            if not paths:
                empty = self.spark.createDataFrame(
                    [], T.StructType.fromJson(json.loads(schema_json))
                )
                if with_row_ids:
                    empty = empty.withColumn(
                        "_row_id", F.lit(None).cast("long")
                    )
                return empty
            # each side reads under ITS OWN committed schema (the old
            # side may predate an add-column or a type widening)
            df = self._read_files(paths, side_schema or schema_json)
            if with_row_ids:
                df = self._row_id_coords(df)
                df = self._apply_dvs(df, paths, dvs)
                return self._attach_row_ids(df, paths, live_stats)
            return self._apply_dvs(df, paths, dvs)

        a = read(added, dv_new, schema_new, live_new)
        r = read(removed, dv_old, schema_old, live_old)
        # the hidden row-id column never feeds the diff: carried rows
        # on the OLD side derive ids from file bases (not materialized)
        # and would spuriously fail exceptAll equality against the
        # rewrite's materialized values, breaking the empty-feed
        # contract for pure-layout commits
        a, r = a.drop(self._ROW_ID_COL), r.drop(self._ROW_ID_COL)
        all_cols = list(dict.fromkeys(a.columns + r.columns))
        # target type per column is the NEW side's (widenings cast the
        # old side up, so exceptAll compares in one type)
        types = {f.name: f.dataType for f in a.schema.fields}
        types.update({f.name: f.dataType for f in r.schema.fields if f.name not in types})

        def align(df: DataFrame) -> DataFrame:
            return df.select(
                *[
                    F.col(c).cast(types[c]).alias(c) if c in df.columns
                    else F.lit(None).cast(types[c]).alias(c)
                    for c in all_cols
                ]
            )

        a, r = align(a), align(r)
        ins = a.exceptAll(r).withColumn("_change_type", F.lit("insert"))
        dels = r.exceptAll(a).withColumn("_change_type", F.lit("delete"))
        if as_images:
            # ids shared between the two sides mark true updates; the
            # join is churn x churn (the feed's own bound), AQE picks
            # the strategy. Null ids never pair (SQL join semantics).
            paired = (
                ins.select("_row_id")
                .join(dels.select("_row_id"), "_row_id")
                .distinct()
                .withColumn("__paired", F.lit(True))
            )
            ins = ins.join(paired, "_row_id", "left").withColumn(
                "_change_type",
                F.when(F.col("__paired"), F.lit("update_postimage"))
                .otherwise(F.col("_change_type")),
            ).drop("__paired")
            dels = dels.join(paired, "_row_id", "left").withColumn(
                "_change_type",
                F.when(F.col("__paired"), F.lit("update_preimage"))
                .otherwise(F.col("_change_type")),
            ).drop("__paired")
        out = ins.unionByName(dels)
        if with_row_ids and not emit_rids:
            out = out.drop("_row_id")
        keep = (
            ("_change_type", "_row_id") if emit_rids else ("_change_type",)
        )
        return self._logicalize(out, keep=keep)

    def restore(self, version: int, *, max_retries: int = 5) -> int:
        """RESTORE TABLE TO VERSION AS OF — roll the live set back to
        an earlier snapshot as a NEW commit (history is append-only;
        the rollback itself is time-travelable and revertible). Pure
        log surgery: no data file is read, written, or moved — the old
        files are simply re-referenced, which is why restore must stay
        within the vacuum retention window (vacuum only deletes files
        unreferenced by every RETAINED snapshot, so a restorable
        version's files are exactly the retained ones).

        Metadata restores WITH the data (the Delta RESTORE contract):
        the commit pins the target version's schema AND its table
        properties — so a column rename/drop (colmap), constraint, or
        identity watermark added after ``version`` rolls back with the
        rows it described."""
        target_live, target_schema, _, target_props, target_dvs = (
            self._resolve_state(version)
        )
        if target_schema is None:
            raise ValueError(f"version {version} has no schema to restore")
        add = [{"path": p, "stats": s} for p, s in sorted(target_live.items())]
        # restore the target's deletion vectors too: files with one get
        # it back verbatim; files without get an explicit CLEAR (empty
        # vector) so a vector added after `version` can't survive
        dv_entries = [
            {
                "path": p,
                "del": target_dvs.get(p, ""),
                "n": _dv_count(target_dvs.get(p)),
            }
            for p in sorted(target_live)
        ]
        for _ in range(max_retries):
            base = self.latest_version()
            live, _ = self._resolve(base)
            remove = [p for p in live if p not in target_live]
            props_out = dict(target_props)
            # row-id watermark NEVER rolls back: restoring the target's
            # (lower) watermark would let later writes re-mint ids a
            # CDC consumer already observed between target and restore
            cur_rt = self.properties(base).get(self._ROWTRACKING_KEY)
            tgt_rt = props_out.get(self._ROWTRACKING_KEY)
            if cur_rt and (
                tgt_rt is None or int(cur_rt["next"]) > int(tgt_rt["next"])
            ):
                props_out[self._ROWTRACKING_KEY] = dict(cur_rt)
            try:
                return self._try_commit(
                    base + 1, "restore", add, remove, target_schema,
                    dv=dv_entries, props=props_out,
                )
            except CommitConflict:
                continue
        raise CommitConflict(f"restore lost {max_retries} commit races")

    # ---- column mapping: rename / drop without rewriting data -----------
    #
    # Delta's column-mapping idea retrofitted onto the log: data files
    # and manifest stats are ALWAYS keyed by the column's PHYSICAL
    # name (its name at first write); a ``colmap`` table property maps
    # physical -> logical ("" = dropped). Renames and drops are pure
    # metadata commits — no file is read or rewritten. Translation
    # happens only at the API boundary (reads logicalize their output,
    # writes physicalize their input, filter/key/zorder column names
    # map logical -> physical); every hook is a no-op when the table
    # has no mapping, so unmapped tables pay zero overhead.

    def _colmap(self, as_of: int | None = None) -> dict[str, str]:
        """physical -> logical name map ("" marks a dropped column)."""
        return dict(self.properties(as_of).get("colmap") or {})

    def _logical_view(self, as_of: int | None = None) -> dict[str, str]:
        """physical -> logical for the NON-dropped columns at
        ``as_of`` (identity when unmapped). Physical columns are the
        committed schema's fields UNIONED with every live file's
        stats-derived columns — the commit schema is the LAST write's
        shape, but additive evolution means an earlier wide file's
        columns are still readable (mergeSchema) and must stay
        renameable/droppable."""
        live, schema, _, props, _ = self._resolve_state(as_of)
        if schema is None:
            raise ValueError(f"table {self.path} has no commits")
        colmap = dict(props.get("colmap") or {})
        phys = [f["name"] for f in json.loads(schema)["fields"]]
        seen = set(phys)
        for stats in live.values():
            for k in stats:
                name = k[len("#null:"):] if k.startswith("#null:") else k
                if name.startswith("#") or name in seen:
                    continue
                seen.add(name)
                phys.append(name)
        out = {}
        for p in phys:
            lg = colmap.get(p, p)
            if lg != "":
                out[p] = lg
        return out

    def _logicalize(
        self, df: DataFrame, colmap: dict | None = None, keep: Sequence[str] = ()
    ) -> DataFrame:
        """Physical frame -> logical frame: rename mapped columns,
        hide dropped ones, pass ``keep`` columns through untouched."""
        colmap = self._colmap() if colmap is None else colmap
        if not colmap:
            return df
        cols = []
        for c in df.columns:
            if c in keep:
                cols.append(F.col(c))
                continue
            lg = colmap.get(c, c)
            if lg == "":
                continue
            cols.append(F.col(c).alias(lg))
        return df.select(*cols)

    def _physicalize(self, df: DataFrame, colmap: dict | None = None) -> DataFrame:
        """Logical frame -> physical frame for staging. Rejects a
        column whose logical name collides with a physical name that
        maps elsewhere (including dropped names): without stable
        column IDs, reusing such a name would silently bind new data
        to an old column — the same restriction Delta places on
        re-adding a mapped/dropped column's original name."""
        colmap = self._colmap() if colmap is None else colmap
        if not colmap:
            return df
        rev = {lg: ph for ph, lg in colmap.items() if lg}
        for c in df.columns:
            if c in colmap and colmap[c] != c and c not in rev:
                state = "dropped" if colmap[c] == "" else f"renamed to {colmap[c]!r}"
                raise ValueError(
                    f"column name {c!r} is reserved: its physical column was"
                    f" {state}; choose a different name"
                )
        return df.select(*[F.col(c).alias(rev.get(c, c)) for c in df.columns])

    def _phys_filters(self, filters, colmap: dict | None = None):
        colmap = self._colmap() if colmap is None else colmap
        if not colmap or not filters:
            return filters
        rev = {lg: ph for ph, lg in colmap.items() if lg}
        return [(rev.get(c, c), op, v) for c, op, v in filters]

    def _phys_names(self, names: Sequence[str], colmap: dict | None = None):
        colmap = self._colmap() if colmap is None else colmap
        if not colmap:
            return list(names)
        rev = {lg: ph for ph, lg in colmap.items() if lg}
        return [rev.get(n, n) for n in names]

    def _phys_partition_by(
        self, partition_by: Sequence[str] | None, colmap: dict | None = None
    ):
        """Translate logical column names inside partition specs
        (plain names and transform arguments) to physical names.
        ``None`` falls back to the table's DECLARED spec (the
        ``partition_spec`` property CREATE TABLE ... PARTITIONED BY
        stores) — pass ``[]`` to write unpartitioned explicitly."""
        if partition_by is None:
            partition_by = self.properties().get("partition_spec")
        if partition_by is None:
            return None
        colmap = self._colmap() if colmap is None else colmap
        if not colmap:
            return partition_by
        rev = {lg: ph for ph, lg in colmap.items() if lg}
        out = []
        for spec in partition_by:
            m = self._TRANSFORM_RE.match(spec)
            if not m:
                out.append(rev.get(spec, spec))
                continue
            fn, arg = m.group(1), m.group(2).strip()
            if fn.lower() in ("bucket", "truncate"):
                pre, col = (a.strip() for a in arg.split(",", 1))
                out.append(f"{fn}({pre}, {rev.get(col, col)})")
            else:
                out.append(f"{fn}({rev.get(arg, arg)})")
        return out

    def _guard_mapped_name_in_exprs(self, name: str) -> None:
        """Refuse to remap a column referenced by a CHECK constraint or
        generated-column expression (enforcement would silently stop
        matching rows — Delta blocks this the same way)."""
        word = re.compile(rf"\b{re.escape(name)}\b")
        for key, expr in self.properties().items():
            if key.startswith(self._CONSTRAINT_PREFIX) or key.startswith(
                self._GENERATED_PREFIX
            ):
                if isinstance(expr, str) and word.search(expr):
                    raise ValueError(
                        f"column {name!r} is referenced by {key!r} ({expr});"
                        " drop that constraint/generated column first"
                    )
        if self._GENERATED_PREFIX + name in self.properties():
            raise ValueError(
                f"column {name!r} is a generated column; drop the"
                " generation expression first"
            )

    def rename_column(self, old: str, new: str) -> int:
        """Metadata-only column rename (no data rewrite). Old files
        keep their physical column name; readers alias it on the fly.
        Time travel shows the name each version had."""
        if not re.match(r"^[A-Za-z_][A-Za-z0-9_]*$", new):
            raise ValueError(f"invalid column name {new!r}")
        view = self._logical_view()
        if old not in view.values():
            raise ValueError(f"no column {old!r} (have {sorted(view.values())})")
        if new in view.values():
            raise ValueError(f"column {new!r} already exists")
        self._guard_mapped_name_in_exprs(old)
        colmap = self._colmap()
        if new in colmap and colmap[new] != new:
            raise ValueError(
                f"name {new!r} is reserved by a renamed/dropped physical column"
            )
        phys = next(p for p, l in view.items() if l == old)
        colmap[phys] = new
        if colmap[phys] == phys:
            del colmap[phys]
        updates: dict = {"colmap": colmap or None}
        # identity watermarks are keyed by LOGICAL name (writers look
        # them up against the current schema): migrate the key in the
        # SAME commit or the rename silently sheds identity semantics
        ik = self._IDENTITY_PREFIX + old
        cur = self.properties()
        if ik in cur:
            updates[ik] = None
            updates[self._IDENTITY_PREFIX + new] = cur[ik]
        # liquid-clustering keys are also LOGICAL names (set_clustering
        # validates against the logical view; optimize_cluster resolves
        # them at run time): migrate in the SAME commit, or the next
        # OPTIMIZE — including append()'s auto-compact follow-up —
        # raises "clustering columns not in table"
        cluster = cur.get(self._CLUSTERING_KEY)
        if cluster and old in cluster:
            updates[self._CLUSTERING_KEY] = [
                new if c == old else c for c in cluster
            ]
        return self.set_properties(updates)

    def drop_column(self, name: str) -> int:
        """Metadata-only column drop: the physical column stays in
        existing files (hidden by every reader) until a rewrite
        (compact / merge / CoW update) naturally ages it out. The name
        becomes reserved — re-adding it would rebind old data."""
        view = self._logical_view()
        if name not in view.values():
            raise ValueError(f"no column {name!r} (have {sorted(view.values())})")
        if len(view) == 1:
            raise ValueError("cannot drop the only column")
        self._guard_mapped_name_in_exprs(name)
        # Delta blocks dropping a clustering column outright (the key
        # would dangle and every later OPTIMIZE / auto-compact would
        # fail AFTER its data commit already succeeded)
        if name in (self.properties().get(self._CLUSTERING_KEY) or []):
            raise ValueError(
                f"column {name!r} is a clustering column; run "
                "set_clustering / ALTER TABLE ... CLUSTER BY without it first"
            )
        colmap = self._colmap()
        phys = next(p for p, l in view.items() if l == name)
        colmap[phys] = ""
        updates: dict = {"colmap": colmap}
        # dropping an identity column retires its watermark in the
        # same commit (a stale key would break every later append)
        if self._IDENTITY_PREFIX + name in self.properties():
            updates[self._IDENTITY_PREFIX + name] = None
        return self.set_properties(updates)

    def add_columns(
        self, columns: dict[str, str], *, max_retries: int = 5
    ) -> int:
        """Metadata-only additive schema evolution — Delta's ``ALTER
        TABLE ... ADD COLUMNS`` (no data rewrite): commit a widened
        schema; every existing file reads the new columns as typed
        nulls. Both readers already resolve additive evolution at
        read time — ``snapshot`` widens the merged scan from the
        committed schema, and the DSv2 executor read pads columns a
        file predates (acid_source._read_parquet_rows) — so the new
        column is immediately visible at every surface, and the next
        write may populate it. ``columns`` maps name -> Spark DDL
        type string (``{"note": "string"}``)."""
        for name in columns:
            if not re.match(r"^[A-Za-z_][A-Za-z0-9_]*$", name):
                raise ValueError(f"invalid column name {name!r}")
        added = T.StructType.fromDDL(
            ", ".join(f"{n} {t}" for n, t in columns.items())
        )
        for _ in range(max_retries):
            base = self.latest_version()
            _, schema, _, _, _ = self._resolve_state(
                base if base >= 0 else None
            )
            if schema is None:
                raise ValueError(
                    f"table {self.path} has no commits (append a first "
                    "snapshot before evolving the schema)"
                )
            view = self._logical_view(base)
            taken = set(view.values()) | set(view.keys())
            clash = [n for n in columns if n in taken]
            if clash:
                raise ValueError(f"columns already exist: {clash}")
            cur = T.StructType.fromJson(json.loads(schema))
            widened = T.StructType(
                cur.fields
                + [f for f in added.fields if f.name not in cur.names]
            )
            try:
                return self._try_commit(
                    base + 1, "add_columns", [], [], widened.json()
                )
            except CommitConflict:
                continue
        raise CommitConflict(f"add_columns lost {max_retries} commit races")

    # safe up-cast lattice for metadata-only type widening (the Delta
    # "type widening" / Iceberg "promote" set this repo supports; every
    # pair is loss-free AND readable by the vectorized parquet reader
    # when the footer holds the narrower type — see _read_files)
    # every pair is VALUE-PRESERVING and READABLE by the vectorized
    # parquet reader when the footer holds the narrower type:
    # integrals up the chain, integrals into double (they fit the
    # 53-bit mantissa exactly), float→double. NOT long→double (lossy
    # past 2^53) and NOT anything→float (the reader has no
    # int*→float upcast; empirically verified).
    _WIDEN = {
        "byte": {"short", "integer", "long", "double"},
        "short": {"integer", "long", "double"},
        "integer": {"long", "double"},
        "float": {"double"},
    }

    def widen_column(self, name: str, new_type: str, *, max_retries: int = 5) -> int:
        """Metadata-only type widening — ``ALTER TABLE .. ALTER COLUMN
        .. TYPE`` (no data rewrite): commit the schema with the column
        promoted to a wider type; existing files keep their narrow
        footers and every reader up-casts at scan time (the committed
        schema drives the parquet read — _read_files). Allowed
        promotions: byte→short/int/long, short→int/long, int→long,
        float→double, decimal(p,s)→decimal(p',s) with p' ≥ p. Anything
        else (narrowing, cross-family, scale changes) raises — those
        need a rewrite, not metadata. Time travel is honored: versions
        before the widening read (and type) as they were committed."""
        target = T.StructType.fromDDL(f"x {new_type}").fields[0].dataType
        view = self._logical_view()
        if name not in view.values():
            raise ValueError(f"no column {name!r} (have {sorted(view.values())})")
        phys = next(p for p, l in view.items() if l == name)
        for _ in range(max_retries):
            base = self.latest_version()
            _, schema, _, props, _ = self._resolve_state(
                base if base >= 0 else None
            )
            if schema is None:
                raise ValueError(f"table {self.path} has no commits")
            cur = T.StructType.fromJson(json.loads(schema))
            old = next((f.dataType for f in cur.fields if f.name == phys), None)
            if old is None:
                raise ValueError(f"no physical column {phys!r} in schema")
            if old == target:
                return base  # idempotent
            ok = target.typeName() in self._WIDEN.get(old.typeName(), set())
            if (
                isinstance(old, T.DecimalType)
                and isinstance(target, T.DecimalType)
                and target.scale == old.scale
                and target.precision >= old.precision
            ):
                ok = True
            if not ok:
                raise ValueError(
                    f"cannot widen {name!r} from {old.simpleString()} to "
                    f"{target.simpleString()}: only loss-free promotions "
                    "(byte/short/int up the integral chain, float->double, "
                    "decimal precision growth at the same scale) are "
                    "metadata-only; anything else needs a rewrite"
                )
            widened = T.StructType(
                [
                    T.StructField(
                        f.name,
                        target if f.name == phys else f.dataType,
                        f.nullable,
                        f.metadata,
                    )
                    for f in cur.fields
                ]
            )
            # widened tables REQUIRE readers that resolve the committed
            # schema against narrower footers — a footer-merging reader
            # would crash (or mistype) on mixed int/long files. Stamp
            # the reader feature so old engine builds fail fast by name
            # instead (the Delta table-features contract).
            newprops = dict(props)
            proto = dict(newprops.get(self._PROTOCOL_KEY) or {})
            proto["reader_features"] = sorted(
                set(proto.get("reader_features") or []) | {"typeWidening"}
            )
            newprops[self._PROTOCOL_KEY] = proto
            try:
                return self._try_commit(
                    base + 1,
                    "widen_column",
                    [],
                    [],
                    widened.json(),
                    props=newprops,
                )
            except CommitConflict:
                continue
        raise CommitConflict(f"widen_column lost {max_retries} commit races")

    # ---- metadata tables (Iceberg .files / DESCRIBE HISTORY / DETAIL) ---

    def files(self, as_of: int | None = None) -> DataFrame:
        """The live manifest as a queryable DataFrame — Iceberg's
        ``.files`` metadata table: one row per live data file with its
        record count, on-disk size, masked-row count, and the footer
        stats JSON. Built from the log plus driver-side ``stat()``
        calls — no data file is opened, so it stays cheap at any table
        size (cost scales with file COUNT, like any planner pass)."""
        live, _, _, _, dvs = self._resolve_state(as_of)
        rows = []
        for p, stats in sorted(live.items()):
            n = stats.get("#rows")
            try:
                size = os.path.getsize(os.path.join(self.path, p))
            except OSError:
                size = None
            rows.append(
                (
                    p,
                    n[0] if n else None,
                    size,
                    _dv_count(dvs.get(p)),
                    json.dumps(stats),
                )
            )
        schema = (
            "path string, record_count long, size_bytes long,"
            " masked_rows long, stats string"
        )
        return self.spark.createDataFrame(rows, schema)

    def partitions(self, as_of: int | None = None) -> DataFrame:
        """Iceberg's ``.partitions`` metadata table, derived from
        manifest stats: one row per partition value tuple of the
        DECLARED spec with file/record/size/masked-row totals. This
        table stores no per-file partition tuple (Iceberg does), so
        the value is RECOVERED from footer stats: a file belongs to a
        partition when the transform of its [min, max] bounds agrees
        (range-clustered writes make that the common case — each file
        holds one value); a file whose bounds straddle values reports
        partition NULL (honest "mixed" bucket, never a wrong value).
        ``bucket(n, col)`` transforms are hash-valued and can never be
        recovered from value bounds — their component is always NULL.
        Log + stat metadata only; zero data reads."""
        spec = self.properties(as_of).get("partition_spec") or []
        colmap = self._colmap(as_of)
        rev = {lg: ph for ph, lg in colmap.items() if lg}

        def part_value(stats: dict, one: str):
            m = self._TRANSFORM_RE.match(one)
            kind, col = (
                (m.group(1).lower(), m.group(2).strip()) if m else (None, one)
            )
            if kind == "bucket":
                return None  # hash transform: unrecoverable from bounds
            if kind == "truncate":
                w_s, col = col.split(",", 1)
                width, col = int(w_s), col.strip()
            phys = rev.get(col, col)
            rng = stats.get(phys)
            if rng is None:
                return None

            def apply(v):
                if kind is None:
                    return v
                if kind == "truncate":
                    if isinstance(v, int):
                        return v - (v % width)
                    return str(v)[:width]
                s = str(v)  # date/timestamp stats ride as ISO strings
                cut = {"years": 4, "months": 7, "days": 10, "hours": 13}[kind]
                return s[:cut]

            lo, hi = apply(rng[0]), apply(rng[1])
            return str(lo) if lo == hi else None

        live, _, _, _, dvs = self._resolve_state(as_of)
        agg: dict[tuple, list] = {}
        for p, stats in sorted(live.items()):
            key = tuple(part_value(stats, s) for s in spec)
            row = agg.setdefault(key, [0, 0, 0, 0])
            row[0] += 1
            n = stats.get("#rows")
            row[1] += n[0] if n else 0
            try:
                row[2] += os.path.getsize(os.path.join(self.path, p))
            except OSError:
                pass
            row[3] += _dv_count(dvs.get(p))
        rows = [
            (
                json.dumps(dict(zip([str(s) for s in spec], key))),
                v[0],
                v[1],
                v[2],
                v[3],
            )
            for key, v in sorted(agg.items(), key=lambda kv: str(kv[0]))
        ]
        return self.spark.createDataFrame(
            rows,
            "partition string, file_count long, record_count long,"
            " size_bytes long, masked_rows long",
        )

    def history_df(self) -> DataFrame:
        """DESCRIBE HISTORY as a DataFrame: one row per commit with
        operation, timestamp, add/remove/vector action counts, ROW
        metrics (Delta's operationMetrics: rows the commit's added and
        removed files carry, from manifest ``#rows`` — a pure-layout
        commit shows equal numbers), and the idempotency txn if any.
        Log-only (no data reads): removed files' counts come from the
        stats they were LIVE under, folded commit by commit."""

        def _n(stats: dict | None) -> int:
            n = (stats or {}).get("#rows")
            return int(n[0]) if n else 0

        live_stats: dict[str, dict] = {}
        rows = []
        for c in self.history():
            rows_removed = sum(_n(live_stats.get(p)) for p in c.remove)
            for p in c.remove:
                live_stats.pop(p, None)
            rows_added = 0
            for a in c.add:
                if a["path"] not in live_stats:  # re-stamping an
                    # already-live file (row-tracking backfill) moves
                    # no rows — a metadata-only commit reports 0/0
                    rows_added += _n(a.get("stats"))
                live_stats[a["path"]] = a.get("stats", {})
            rows.append(
                (
                    c.version,
                    c.op,
                    float(c.ts),
                    len(c.add),
                    len(c.remove),
                    len(c.dv or ()),
                    rows_added,
                    rows_removed,
                    c.txn["app"] if c.txn else None,
                    c.txn["batch_id"] if c.txn else None,
                )
            )
        return self.spark.createDataFrame(
            rows,
            "version long, operation string, timestamp double, n_added"
            " long, n_removed long, n_dv long, rows_added long,"
            " rows_removed long, txn_app string, txn_batch_id long",
        )

    def detail(self, as_of: int | None = None) -> dict:
        """DESCRIBE DETAIL: one metadata-only summary dict (file and
        row counts, total bytes, DV state, schema column names,
        properties, ref counts)."""
        live, schema, _, props, dvs = self._resolve_state(as_of)
        size = 0
        for p in live:
            try:
                size += os.path.getsize(os.path.join(self.path, p))
            except OSError:
                pass
        colmap = dict(props.get("colmap") or {})
        cols = [
            colmap.get(f["name"], f["name"])
            for f in json.loads(schema)["fields"]
        ] if schema else []
        cols = [c for c in cols if c != ""]
        return {
            "location": self.path,
            "num_files": len(live),
            "size_bytes": size,
            "num_rows": self.row_count(as_of),
            "num_deletion_vectors": len(dvs),
            "columns": cols,
            "clustering_columns": list(props.get(self._CLUSTERING_KEY) or []),
            "isolation_level": props.get("isolationLevel")
            or "write_serializable",
            "properties": props,
            "num_tags": len(self.tags()),
            "num_branches": len(self.branches()),
            "latest_version": self.latest_version(),
        }

    # ---- named refs: tags and write-audit-publish branches --------------

    _REF_NAME_RE = re.compile(r"^[A-Za-z0-9][A-Za-z0-9_.-]*$")

    @classmethod
    def _check_ref_name(cls, name: str) -> None:
        if not cls._REF_NAME_RE.match(name):
            raise ValueError(f"invalid ref name {name!r}")

    def create_tag(self, name: str, version: int | None = None) -> int:
        """Iceberg-style TAG: an immutable named pointer at a snapshot
        (``prod-2026-08-14``-shaped release marks). Stored in the same
        log store via put-if-absent, so tag creation is atomic and a
        name can never be re-pointed; commit resolution ignores ref
        objects (strict digit-stem filter). Read back with
        ``snapshot(as_of=t.tag_version(name))``. Tags do NOT pin
        vacuum retention (same as Iceberg, where expire_snapshots
        honors refs — here the retain_versions window must cover the
        tagged version; documented trade)."""
        self._check_ref_name(name)
        latest = self.latest_version()
        v = latest if version is None else version
        if not 0 <= v <= latest:
            raise ValueError(f"version {v} does not exist (latest {latest})")
        try:
            self.log.put_if_absent(
                f"tag-{name}.ref",
                json.dumps({"version": v, "ts": time.time()}).encode(),
            )
        except FileExistsError:
            raise ValueError(f"tag {name!r} already exists") from None
        return v

    def tag_version(self, name: str) -> int:
        self._check_ref_name(name)
        try:
            return json.loads(self.log.read(f"tag-{name}.ref"))["version"]
        except (FileNotFoundError, KeyError):
            raise ValueError(f"no tag {name!r}") from None

    def tags(self) -> dict[str, int]:
        out = {}
        for n in self.log.list_names():
            if n.startswith("tag-") and n.endswith(".ref"):
                out[n[4:-4]] = json.loads(self.log.read(n))["version"]
        return out

    def _branch_store(self, name: str, log_store: LogStore | None) -> LogStore:
        return log_store or LocalFSLogStore(
            os.path.join(self.path, f"_branch_{name}")
        )

    def create_branch(
        self, name: str, *, log_store: LogStore | None = None
    ) -> "AcidTable":
        """Write-audit-publish (Iceberg WAP / Nessie branch): an
        isolated commit log seeded with the current snapshot, SHARING
        the table's data directory. Writes to the returned handle
        (append / update / delete / merge — the full verb set) are
        invisible to main-table readers until ``publish_branch`` folds
        the branch's net effect back as one atomic commit; until then
        the branch is the audit surface (query it, run checks, walk
        away by simply never publishing).

        The branch seed carries the base's live set BY PATH (no data
        copied), plus schema, properties (constraints keep enforcing
        on branch writes), and deletion vectors. Caveats: txn
        watermarks do NOT carry (stream into main, not a branch).
        Main-table ``vacuum`` folds every live branch's log into its
        keep sets (default LocalFS branch backend), so unpublished
        branch files and sidecars survive arbitrarily long —
        ``drop_branch`` releases the hold. A branch log on a CUSTOM
        ``log_store`` backend is invisible to vacuum: there the old
        rule stands — don't vacuum main while such a branch sits
        unpublished longer than ``grace_seconds``."""
        self._check_ref_name(name)
        base = self.latest_version()
        if base < 0:
            raise ValueError(f"table {self.path} has no commits to branch")
        try:
            self.log.put_if_absent(
                f"branch-{name}.ref",
                json.dumps({"base": base, "ts": time.time()}).encode(),
            )
        except FileExistsError:
            raise ValueError(f"branch {name!r} already exists") from None
        live, schema, _, props, dvs = self._resolve_state(base)
        br = AcidTable(
            self.spark,
            self.path,
            log_store=self._branch_store(name, log_store),
            checkpoint_interval=self.checkpoint_interval,
            bloom_cols=self.bloom_cols,
            bloom_bits=self.bloom_bits,
        )
        br._try_commit(
            0,
            "branch",
            [{"path": p, "stats": s} for p, s in sorted(live.items())],
            [],
            schema,
            props=props,
            dv=[
                {"path": p, "del": dvs[p], "n": _dv_count(dvs[p])}
                for p in sorted(dvs)
            ],
        )
        return br

    def branch(
        self, name: str, *, log_store: LogStore | None = None
    ) -> "AcidTable":
        """Reopen a branch created by ``create_branch`` (pass the same
        ``log_store`` if the branch lives on a non-default backend)."""
        self._check_ref_name(name)
        self._branch_base(name)  # existence check
        return AcidTable(
            self.spark,
            self.path,
            log_store=self._branch_store(name, log_store),
            checkpoint_interval=self.checkpoint_interval,
            bloom_cols=self.bloom_cols,
            bloom_bits=self.bloom_bits,
        )

    def _branch_ref_slot(self, name: str) -> int:
        """Highest rebase slot for a branch ref (0 = the original).
        Rebases can't overwrite the ref (LogStore is put-if-absent
        only), so each rebase claims the next ``branch-<name>.ref.<k>``
        slot — the CAS doubles as the rebase race arbiter."""
        top = -1
        prefix = f"branch-{name}.ref"
        for n in self.log.list_names():
            if n == prefix:
                top = max(top, 0)
            elif n.startswith(prefix + "."):
                try:
                    top = max(top, int(n[len(prefix) + 1:]))
                except ValueError:
                    continue
        return top

    def _branch_base(self, name: str) -> int:
        slot = self._branch_ref_slot(name)
        if slot < 0:
            raise ValueError(f"no branch {name!r}")
        ref = f"branch-{name}.ref" + ("" if slot == 0 else f".{slot}")
        try:
            base = json.loads(self.log.read(ref))["base"]
        except (FileNotFoundError, KeyError):
            raise ValueError(f"no branch {name!r}") from None
        if base is None:  # drop_branch tombstone claimed the top slot
            raise ValueError(f"branch {name!r} was dropped")
        return base

    def branches(self) -> dict[str, int]:
        """{branch name: base version} for every registered branch
        (a rebased branch reports its CURRENT base; dropped branches
        are omitted)."""
        names = set()
        for n in self.log.list_names():
            if n.startswith("branch-") and ".ref" in n:
                names.add(n[7 : n.index(".ref")])
        out = {}
        for n in sorted(names):
            try:
                out[n] = self._branch_base(n)
            except ValueError:
                continue  # tombstoned by drop_branch
        return out

    def drop_branch(self, name: str) -> None:
        """Retire a branch ref (after ``publish_branch``, or to abandon
        an audit). The LogStore is put-if-absent-only, so the drop is a
        TOMBSTONE: the next ref slot records ``base: null``, after
        which ``branches()`` omits the name and ``vacuum`` stops
        protecting the branch's unpublished files — the step that lets
        a published/abandoned WAP branch's data actually reclaim. The
        name stays reserved (re-creating it would rebind the dead
        slots). Racing a concurrent ``rebase_branch`` for the slot is
        resolved by the same CAS: exactly one wins."""
        self._branch_base(name)  # raises for missing or already-dropped
        slot = self._branch_ref_slot(name)
        try:
            self.log.put_if_absent(
                f"branch-{name}.ref.{slot + 1}",
                json.dumps({"base": None, "ts": time.time()}).encode(),
            )
        except FileExistsError:
            raise CommitConflict(
                f"concurrent rebase/drop of branch {name!r} won the ref slot"
            ) from None

    def publish_branch(
        self, name: str, *, log_store: LogStore | None = None
    ) -> int:
        """Fold a branch's net effect back into the main log as ONE
        atomic commit (the WAP publish / Iceberg fast-forward). The
        publish is computed as a state DIFF — branch live set vs the
        base snapshot — so N branch commits (including compactions
        that only reshuffled layout) collapse into a single
        add/remove/dv action list, and files the branch carried
        untouched are never mentioned, let alone read.

        Strictly fast-forward: if the MAIN log advanced past the
        branch's base (any commit — data, properties, another
        publish), publishing raises ``CommitConflict`` and the branch
        must be re-created from the new head (rebase is the caller's
        policy decision: replay, or diff-and-reapply via MERGE). This
        is the conservative Iceberg fast_forward contract — never
        silently interleave audited state with unaudited writes."""
        base = self._branch_base(name)
        br = self.branch(name, log_store=log_store)
        live_b, schema_b, _, props_b, dvs_b = br._resolve_state(None)
        live_base, _, _, props_base, dvs_base = self._resolve_state(base)
        adds = [
            {"path": p, "stats": s}
            for p, s in sorted(live_b.items())
            if p not in live_base
        ]
        removes = sorted(p for p in live_base if p not in live_b)
        dv_entries = []
        for p in sorted(live_b):
            old = dvs_base.get(p, "") if p in live_base else ""
            new = dvs_b.get(p, "")
            if new != old:
                dv_entries.append(
                    {"path": p, "del": new,
                     "n": _dv_count(new)}
                )
        cur = self.latest_version()
        if cur != base:
            raise CommitConflict(
                f"publish of branch {name!r} requires fast-forward: main is"
                f" at v{cur}, branch based on v{base} — rebase_branch() it"
                " onto the new head (or re-branch and replay)"
            )
        return self._try_commit(
            base + 1,
            "publish",
            adds,
            removes,
            schema_b,
            props=props_b if props_b != props_base else None,
            dv=dv_entries,
        )

    def rebase_branch(
        self, name: str, *, log_store: LogStore | None = None
    ) -> int:
        """Re-point a branch whose base main has advanced past: apply
        the branch's NET diff (vs its old base) on top of the current
        main head as ONE branch commit, then advance the branch ref —
        after which ``publish_branch`` fast-forwards cleanly. The git
        rebase shape, done at snapshot granularity: N branch commits
        collapse to one replayed diff, and no data file is read or
        rewritten (log surgery only).

        Three-way conflict rules (conservative — a conflict raises
        with the offending files/keys rather than guessing):

        * a file the branch removed/rewrote or re-vectored that main
          no longer carries live (main rewrote or deleted it), or
          whose deletion vector main changed differently, is a
          write-write conflict — both sides edited the same rows'
          container;
        * branch file ADDS never conflict (fresh paths);
        * a property key both sides changed from the base to different
          values conflicts — except ``protocol``, whose feature lists
          are unioned (feature stamps are monotone);
        * a schema both sides changed differently conflicts.

        Returns the new base (= main head at rebase time). Concurrent
        rebases of the same branch race on the ref slot's
        put-if-absent — exactly one wins."""
        old_base = self._branch_base(name)
        head = self.latest_version()
        if head == old_base:
            return old_base  # already based on head
        br = self.branch(name, log_store=log_store)
        live_b, schema_b, _, props_b, dvs_b = br._resolve_state(None)
        live_base, schema_base, _, props_base, dvs_base = self._resolve_state(
            old_base
        )
        live_m, schema_m, _, props_m, dvs_m = self._resolve_state(head)

        adds = {p: s for p, s in live_b.items() if p not in live_base}
        removes = {p for p in live_base if p not in live_b}
        dv_changed = {
            p: dvs_b.get(p, "")
            for p in live_b
            if p in live_base and dvs_b.get(p, "") != dvs_base.get(p, "")
        }
        conflicts = []
        for p in sorted(removes | set(dv_changed)):
            if p not in live_m:
                conflicts.append(f"file {p}: rewritten/deleted by main")
            elif dvs_m.get(p, "") != dvs_base.get(p, ""):
                conflicts.append(f"file {p}: deletion vector changed by main")

        merged_props = dict(props_m)
        for k in sorted(set(props_b) | set(props_base)):
            b_v, base_v = props_b.get(k), props_base.get(k)
            if b_v == base_v:
                continue  # branch didn't change it: main's value stands
            m_v = props_m.get(k)
            if k == self._PROTOCOL_KEY:
                merged_props[k] = {
                    kind: sorted(
                        set((b_v or {}).get(kind) or [])
                        | set((m_v or {}).get(kind) or [])
                    )
                    for kind in ("reader_features", "writer_features")
                }
                continue
            if m_v != base_v and m_v != b_v:
                conflicts.append(f"property {k!r}: changed by both sides")
                continue
            if b_v is None:
                merged_props.pop(k, None)
            else:
                merged_props[k] = b_v

        if schema_b != schema_base and schema_m != schema_base and (
            schema_m != schema_b
        ):
            conflicts.append("schema: changed by both sides")
        target_schema = schema_b if schema_b != schema_base else schema_m

        if conflicts:
            raise ValueError(
                f"rebase of branch {name!r} onto v{head} conflicts:\n  "
                + "\n  ".join(conflicts)
            )

        target_live = {
            p: s for p, s in live_m.items() if p not in removes
        }
        target_live.update(adds)
        target_dvs = {p: v for p, v in dvs_m.items() if p in target_live}
        for p, v in dv_changed.items():
            if p in target_live:
                if v:
                    target_dvs[p] = v
                else:
                    target_dvs.pop(p, None)

        # one branch commit transitioning branch state -> target
        commit_adds = [
            {"path": p, "stats": s}
            for p, s in sorted(target_live.items())
            if p not in live_b
        ]
        commit_removes = sorted(p for p in live_b if p not in target_live)
        dv_entries = [
            {
                "path": p,
                "del": target_dvs.get(p, ""),
                "n": _dv_count(target_dvs.get(p)),
            }
            for p in sorted(target_live)
            if target_dvs.get(p, "") != (dvs_b.get(p, "") if p in live_b else "")
        ]
        br._try_commit(
            br.latest_version() + 1,
            "rebase",
            commit_adds,
            commit_removes,
            target_schema,
            props=merged_props,
            dv=dv_entries,
        )
        slot = self._branch_ref_slot(name) + 1
        try:
            self.log.put_if_absent(
                f"branch-{name}.ref.{slot}",
                json.dumps({"base": head, "ts": time.time()}).encode(),
            )
        except FileExistsError:
            raise CommitConflict(
                f"concurrent rebase of branch {name!r} won the ref slot"
            ) from None
        return head

    def cherry_pick(
        self,
        name: str,
        version: int,
        *,
        log_store: LogStore | None = None,
        max_retries: int = 5,
    ) -> int:
        """Apply ONE branch commit's effect onto the current main head
        (Iceberg's ``cherrypick_snapshot``) — the surgical complement
        of ``publish_branch`` (all-or-nothing) and ``rebase_branch``
        (move the whole branch): pick just the audited commit you
        want, leave the rest of the branch unpublished. Pure log
        surgery — branches share the data directory, so the commit's
        files are re-referenced, never copied.

        Conflict rules (same conservatism as rebase): every file the
        commit removes must still be live on main with the SAME
        deletion vector the branch saw at that commit's parent, and
        every vector the commit sets must target such a file — i.e.
        main must not have diverged on the rows this commit touched.
        A schema change rides along only if the commit itself changed
        the schema; otherwise main's schema stands. Commit properties
        do NOT ride (pick one change, not the branch's config)."""
        br = self.branch(name, log_store=log_store)
        if version < 0 or version > br.latest_version():
            raise ValueError(
                f"branch {name!r} has no commit v{version}"
            )
        c = br._read_commit(version)
        parent_dvs = (
            br._resolve_state(version - 1)[4] if version > 0 else {}
        )
        parent_schema = (
            br._resolve_state(version - 1)[1] if version > 0 else None
        )
        touched = set(c.remove) | {e["path"] for e in c.dv or ()}
        for _ in range(max_retries):
            head = self.latest_version()
            live_m, schema_m, _, _, dvs_m = self._resolve_state(head)
            conflicts = []
            for p in sorted(touched):
                if p not in live_m:
                    if p in {a["path"] for a in c.add}:
                        continue  # the commit itself introduces it
                    conflicts.append(f"file {p}: not live on main")
                elif dvs_m.get(p, "") != parent_dvs.get(p, ""):
                    conflicts.append(
                        f"file {p}: deletion vector diverged on main"
                    )
            if conflicts:
                raise ValueError(
                    f"cherry-pick of {name!r}@v{version} onto v{head} "
                    "conflicts:\n  " + "\n  ".join(conflicts)
                )
            dup = [a["path"] for a in c.add if a["path"] in live_m]
            if dup:
                raise ValueError(
                    f"cherry-pick of {name!r}@v{version}: file(s) already "
                    f"live on main (picked twice?): {dup[:3]}"
                )
            schema = (
                c.schema_json
                if parent_schema is not None and c.schema_json != parent_schema
                else schema_m
            )
            try:
                return self._try_commit(
                    head + 1,
                    "cherrypick",
                    c.add,
                    c.remove,
                    schema or c.schema_json,
                    dv=c.dv,
                )
            except CommitConflict:
                continue
        raise CommitConflict(
            f"cherry-pick of {name!r}@v{version} lost {max_retries} races"
        )

    def _batch_key_ranges(self, updates: DataFrame, keys: Sequence[str]):
        """One tiny driver agg: the update batch's [min, max] per merge
        key — shared by manifest pruning (_touched_files) and by the
        rebase-time ConcurrentAppend check (a winner append is a merge
        conflict only if its stats may intersect these ranges)."""
        aggs = []
        for k in keys:
            aggs += [F.min(k).alias(f"__lo_{k}"), F.max(k).alias(f"__hi_{k}")]
        return updates.agg(*aggs).first()

    def _batch_key_ranges_checked(
        self, updates: DataFrame, keys: Sequence[str], what: str
    ):
        """``_batch_key_ranges`` AND the SQL-MERGE unique-source-key
        check (operators/upsert._assert_unique_keys) folded into ONE
        Spark job: a two-level aggregate — per-key multiplicities,
        then global min/max per key plus the max multiplicity. The
        lifecycle profile (r12) showed each MOR verb paying one small
        sequential job for each; min(k)/max(k) over the group keys
        equal the global extremes, so the returned Row is a drop-in
        ``ranges``. Raises exactly like ``_assert_unique_keys``."""
        g = updates.groupBy(*keys).agg(F.count(F.lit(1)).alias("__dup_cnt"))
        aggs = [F.max("__dup_cnt").alias("__max_cnt")]
        for k in keys:
            aggs += [F.min(k).alias(f"__lo_{k}"), F.max(k).alias(f"__hi_{k}")]
        row = g.agg(*aggs).first()
        if row["__max_cnt"] is not None and row["__max_cnt"] > 1:
            raise ValueError(
                f"multiple {what} rows share a merge key; pass "
                "dedupe_order=<ts column> to keep the latest per key, or "
                "pre-deduplicate (SQL MERGE fails on multiple matches for "
                "the same reason)"
            )
        return row

    def _touched_files(
        self,
        live: dict[str, dict],
        updates: DataFrame,
        keys: Sequence[str],
        ranges=None,
    ) -> list[str]:
        """Manifest-level pruning: a live file can be SKIPPED by the
        merge when its footer [min, max] range on ANY merge-key column
        is disjoint from the update batch's range for that column — it
        provably contains no matchable row. Files without stats for a
        key column are conservatively touched. One tiny driver agg on
        the update side; no data file is opened.

        When a key column carries per-file BLOOM stats (``bloom_cols``
        at table construction) and the batch's distinct key set is
        small (≤ ``_BLOOM_PRUNE_MAX_KEYS``), a second tier tests every
        batch value against each file's bloom: a file where ALL batch
        values provably miss is skipped. This is what makes merges
        keyed on hash-like columns (digests, uuids) prune at all —
        their [min, max] ranges are uniformly wide and the range tier
        never fires."""
        row = ranges if ranges is not None else self._batch_key_ranges(
            updates, keys
        )
        bloom_keys = [
            k
            for k in keys
            if any(f"#bloom:{k}" in st for st in live.values())
        ]
        batch_vals: dict[str, list] = {}
        if bloom_keys:
            cap = self._BLOOM_PRUNE_MAX_KEYS
            for k in bloom_keys:
                vals = [
                    r[0]
                    for r in updates.select(k).distinct().limit(cap + 1).collect()
                ]
                if len(vals) <= cap:  # bounded driver collect only
                    batch_vals[k] = vals
        touched = []
        for path, stats in live.items():
            skip = False
            for k in keys:
                rng = stats.get(k)
                ulo = _norm_stat_value(row[f"__lo_{k}"])
                uhi = _norm_stat_value(row[f"__hi_{k}"])
                try:
                    if rng is not None and ulo is not None and (
                        rng[1] < ulo or rng[0] > uhi
                    ):
                        skip = True  # disjoint on this key column
                        break
                except TypeError:
                    continue  # incomparable types: keep the file
                bloom = stats.get(f"#bloom:{k}")
                vals = batch_vals.get(k)
                # int/str batch values only: blooms hash Spark's
                # cast-to-string, and only int/str Python values are
                # guaranteed the same canonical form via str() — a
                # float/bool/Decimal batch key would probe a diverging
                # form and wrongly prune a matching file
                if bloom is not None and vals and all(
                    isinstance(v, (int, str))
                    and not isinstance(v, bool)
                    and not _bloom_may_contain(bloom, v)
                    for v in vals
                    if v is not None
                ):
                    skip = True  # every batch key provably absent
                    break
            if not skip:
                touched.append(path)
        return sorted(touched)

    def merge(
        self,
        updates: DataFrame,
        keys: Sequence[str],
        *,
        mode: str | None = None,
        dedupe_order: str | None = None,
        txn: tuple[str, int] | None = None,
        partition_by: Sequence[str] | None = None,
        auto_evolve: bool = False,
        max_retries: int = 5,
    ) -> int:
        """MERGE INTO (upsert) with snapshot-isolated copy-on-write and
        manifest-level file skipping: only live files whose footer
        min/max ranges can contain a merge key are read and rewritten
        (operators/upsert.merge_upsert); provably-unmatchable files
        stay untouched in the new snapshot. The commit removes the
        touched set + adds the rewrite atomically. A commit conflict
        re-reads the NEW snapshot and re-runs the merge — classic
        optimistic concurrency, so concurrent merges serialize instead
        of silently dropping one writer's rows.

        At 100 TB this pruning is what makes point-ish MERGE usable:
        an update batch touching one day's key range rewrites that
        day's files, not the table.

        ``txn=(app, batch_id)`` makes the merge idempotent per batch id
        (same watermark contract as ``append``) — the streaming CDC
        shape: ``foreach_batch_merge_sink`` upserts each micro-batch
        and a post-failure replay is a no-op instead of a second
        rewrite.

        ``auto_evolve=True`` is Delta's ``WITH SCHEMA EVOLUTION`` /
        ``merge.schema.autoMerge``: a batch carrying NEW columns
        widens the table schema in the SAME commit (untouched rows
        read the new column as NULL), and a batch missing committed
        columns fills NULL on its rows — full-row replace semantics.
        Without it, a column-set mismatch raises instead of silently
        evolving.

        ``mode="merge_on_read"`` is Delta's DV-based (low-shuffle)
        MERGE: matched target rows are MASKED by deletion vectors — no
        touched file is rewritten — and the (deduped) batch lands
        whole as new files, in ONE commit. Write amplification drops
        from O(touched files) to O(batch + compressed vector bytes):
        on a 100 TB table a CDC trickle that matches one row per file
        stops rewriting those files wholesale. Same logical result,
        same CDF net diff (a row replaced by an identical copy still
        cancels), same conflict rules; read cost accumulates in the
        vectors until compaction materializes them — the identical
        trade ``delete(mode="merge_on_read")`` makes. ``mode=None``
        (default) resolves the ``merge.mode`` TABLE property first
        (``ALTER TABLE t SET TBLPROPERTIES('merge.mode' =
        'merge_on_read')`` flips every writer, including SQL MERGE
        INTO), falling back to copy_on_write."""
        from data_lake_demo_spark.operators.upsert import merge_upsert

        if mode is None:
            mode = self._default_write_mode("merge.mode")
        if mode not in ("copy_on_write", "merge_on_read"):
            raise ValueError(f"unknown merge mode {mode!r}")
        self._reject_reserved_row_id(updates)
        updates = self._apply_generated(updates)
        self._enforce_constraints(updates)
        colmap = self._colmap()
        updates = self._physicalize(updates, colmap)
        keys = self._phys_names(keys, colmap)
        partition_by = self._phys_partition_by(partition_by, colmap)
        dropped = [p for p, l in colmap.items() if l == ""]
        for _ in range(max_retries):
            base = self.latest_version()
            if txn is not None:
                # watermark as-of the commit base: a replay landing
                # after this read makes our base+1 commit conflict,
                # which re-enters the check (no TOCTOU window)
                last = self.last_txn_batch(txn[0], as_of=base)
                if last is not None and txn[1] <= last:
                    return base
            live, schema_json, _, props, dvs = self._resolve_state(base)
            rt_on = self._row_tracking_on(props)
            if dedupe_order is None:
                # ranges + the unique-source-key check in ONE job
                # (r12: each was its own small sequential Spark job)
                ranges = self._batch_key_ranges_checked(
                    updates, keys, "update"
                )
            else:
                ranges = self._batch_key_ranges(updates, keys)
            touched = self._touched_files(live, updates, keys, ranges=ranges)
            if mode == "merge_on_read":
                v = self._merge_mor_attempt(
                    base, updates, keys, touched, schema_json, dvs, props,
                    dedupe_order=dedupe_order, txn=txn,
                    partition_by=partition_by, auto_evolve=auto_evolve,
                    ranges=ranges, live=live,
                    unique_keys=dedupe_order is None,
                )
                if v is not None:
                    return v
                continue  # true overlap: re-plan against the new head
            if touched:
                # committed-schema read, NOT bare spark.read.parquet:
                # heterogeneous touched footers (a widen/add_columns that
                # predates some files) must up-cast/pad at scan time or
                # the rewrite narrows the table back and strands wider
                # live files (unreadable snapshot)
                target = self._read_for_rewrite(touched, schema_json, dvs, base)
            elif schema_json is not None:
                target = self.spark.createDataFrame(
                    [], T.StructType.fromJson(json.loads(schema_json))
                )
            else:
                raise ValueError(f"table {self.path} has no commits")
            if dropped:  # the rewrite materializes column drops
                target = target.drop(*dropped)
            ups = updates
            if rt_on:
                if self._ROW_ID_COL not in target.columns:
                    target = target.withColumn(
                        self._ROW_ID_COL, F.lit(None).cast("long")
                    )
                ups = self._inherit_row_ids(updates, target, keys)
            merged = merge_upsert(
                target,
                ups,
                keys,
                dedupe_order=dedupe_order,
                allow_missing_columns=auto_evolve,
                # dedupe_order None ⇒ uniqueness already proven by the
                # combined ranges job above — don't re-run the check
                unique_keys=dedupe_order is None,
            )
            if rt_on:
                merged = self._assign_fresh_row_ids(merged, props)
            add, schema = self._stage_actions(merged, partition_by=partition_by)
            # rebase-eligible: a winner is disjoint only if it neither
            # touched our files NOR appended rows whose merge-key
            # ranges may intersect the batch's (check_adds=True — a
            # matching append would have changed the matched/
            # not-matched split, under every isolation level)
            key_filters = [
                (k, "between", (ranges[f"__lo_{k}"], ranges[f"__hi_{k}"]))
                for k in keys
                if ranges[f"__lo_{k}"] is not None
            ]
            v = self._commit_or_rebase(
                base,
                "merge",
                add,
                touched,
                # same widening guard as append: a narrow update
                # batch must not revert add_columns/widen_column
                self._evolve_schema(schema, base),
                txn=txn,
                read_filters=key_filters if len(key_filters) == len(keys)
                else [],  # a null-range key: treat any add as a match
                check_adds=True,
            )
            if v is None:
                continue
            return self._auto_maintain(v, props_hint=props)
        raise CommitConflict(f"merge lost {max_retries} commit races")

    def _merge_mor_attempt(
        self,
        base: int,
        updates: DataFrame,
        keys: Sequence[str],
        touched: list[str],
        schema_json: str | None,
        dvs: dict[str, str],
        props: dict,
        *,
        dedupe_order: str | None,
        txn: tuple[str, int] | None,
        partition_by,
        auto_evolve: bool,
        ranges=None,
        delete_col: str | None = None,
        unique_keys: bool = False,
        live: dict | None = None,
    ) -> int | None:
        """One merge-on-read MERGE attempt against ``base``: the
        matched rows' (file, row-index) coordinates become deletion
        vectors (executor-encoded, sidecar-spilled like any MOR
        delete) and the deduped batch stages as new files — commit is
        add + dv, remove NOTHING. Row tracking: matched update rows
        inherit the masked rows' ids (an update preserves identity),
        true inserts mint fresh ones — so the CDF's delete+insert pair
        shares its ``_row_id`` exactly like the copy-on-write plan.
        ``delete_col`` (the merge_apply shape) masks matched rows for
        EVERY batch key but stages only the surviving (non-delete)
        rows — a retraction is a pure mask, an unmatched delete a
        no-op. ``ranges=None`` skips key-range rebase eligibility:
        any winner add forces a re-plan (merge_apply's conservative
        contract). Returns the committed version, or None to
        re-plan."""
        from data_lake_demo_spark.operators.upsert import (
            _assert_unique_keys,
            _latest_per_key,
        )

        if schema_json is None:
            raise ValueError(f"table {self.path} has no commits")
        keys = list(keys)
        ups = updates
        if dedupe_order is not None:
            ups = _latest_per_key(ups, keys, dedupe_order)
        elif not unique_keys:
            _assert_unique_keys(ups, keys, "update")
        rt_on = self._row_tracking_on(props)
        dv_entries: list[dict] = []
        target = None
        if touched:
            if rt_on:  # live (dv-masked) rows donate ids to matches
                target = self._read_for_rewrite(
                    touched, schema_json, dvs, base
                )
            raw = self._read_files(touched, schema_json)
            hits = (
                self._with_dv_coords(raw, touched, dvs)
                .join(ups.select(*keys).distinct(), keys, "left_semi")
                .select("__fp", "__ri")
            )
            dv_entries = self._dv_entries_from(
                hits, touched, dvs,
                row_bound=self._touched_row_bound(live, touched),
            )
        if delete_col is not None:  # merge_apply: retractions are a
            ups = ups.filter(~F.col(delete_col)).drop(delete_col)  # pure mask
        # committed-schema alignment — the same unionByName contract
        # as the copy-on-write plan: batch-missing columns pad NULL,
        # new columns widen only under auto_evolve, else raise.
        # Pending column drops (colmap entry "") are excluded exactly
        # like the CoW path's target.drop(*dropped): the physical
        # column lives only in old files, and a physicalized batch can
        # never carry it — aligning against it would NULL-pad forever
        # (auto_evolve) or spuriously raise (strict).
        colmap_a = dict(props.get("colmap") or {})
        fields = [
            f
            for f in json.loads(schema_json)["fields"]
            if f["name"] != self._ROW_ID_COL
            and colmap_a.get(f["name"], f["name"]) != ""
        ]
        empty_t = self.spark.createDataFrame(
            [], T.StructType.fromJson({"type": "struct", "fields": fields})
        )
        out = empty_t.unionByName(ups, allowMissingColumns=auto_evolve)
        if rt_on:
            if target is not None:
                out = self._inherit_row_ids(out, target, keys)
            else:
                out = out.withColumn(
                    self._ROW_ID_COL, F.lit(None).cast("long")
                )
            out = self._assign_fresh_row_ids(out, props)
        add, schema = self._stage_actions(out, partition_by=partition_by)
        if not add and not dv_entries:
            return base  # empty batch: provably a no-op, no commit
        key_filters = []
        if ranges is not None:
            key_filters = [
                (k, "between", (ranges[f"__lo_{k}"], ranges[f"__hi_{k}"]))
                for k in keys
                if ranges[f"__lo_{k}"] is not None
            ]
            if len(key_filters) != len(keys):
                key_filters = []  # null-range key: any add is a match
        v = self._commit_or_rebase(
            base,
            "merge",
            add,
            [],
            self._evolve_schema(schema, base),
            txn=txn,
            dv=dv_entries,
            read_filters=key_filters,
            check_adds=True,
        )
        if v is None:
            return None
        return self._auto_maintain(v, props_hint=props)

    def merge_apply(
        self,
        updates: DataFrame,
        keys: Sequence[str],
        delete_col: str,
        *,
        mode: str | None = None,
        dedupe_order: str | None = None,
        txn: tuple[str, int] | None = None,
        partition_by: Sequence[str] | None = None,
        auto_evolve: bool = False,
        unique_keys: bool = False,
        max_retries: int = 5,
    ) -> int:
        """Full MERGE (WHEN MATCHED AND <delete_col> THEN DELETE /
        WHEN MATCHED THEN UPDATE / WHEN NOT MATCHED THEN INSERT) as
        ONE atomic copy-on-write commit — the CDC-apply and
        incremental-view-maintenance shape, where a single batch
        carries both upserts and retractions and applying them in two
        commits would expose a half-applied snapshot.

        Same manifest-level file skipping, optimistic retry, and
        ``txn`` exactly-once watermark as ``merge``. On a table with
        no commits yet, deletes are no-ops and the surviving upserts
        become the first snapshot.

        ``mode="merge_on_read"`` (or the ``merge.mode`` table
        property) applies the batch WITHOUT rewriting any touched
        file: every matched row masks via a deletion vector (a
        retraction is a pure mask) and only the surviving upserts
        land as new files — the cheapest possible CDC apply on a
        wide table. Falls back to copy-on-write for the seeding
        commit of an empty table."""
        from data_lake_demo_spark.operators.upsert import merge_apply

        if mode is None:
            mode = self._default_write_mode("merge.mode")
        if mode not in ("copy_on_write", "merge_on_read"):
            raise ValueError(f"unknown merge mode {mode!r}")
        self._reject_reserved_row_id(updates)
        # delete rows never land; only surviving upserts are validated
        updates = self._apply_generated(
            updates, check_df=updates.filter(~F.col(delete_col))
        )
        self._enforce_constraints(updates.filter(~F.col(delete_col)))
        colmap = self._colmap()
        updates = self._physicalize(updates, colmap)
        keys = self._phys_names(keys, colmap)
        partition_by = self._phys_partition_by(partition_by, colmap)
        dropped = [p for p, l in colmap.items() if l == ""]
        for _ in range(max_retries):
            base = self.latest_version()
            if txn is not None:
                last = self.last_txn_batch(txn[0], as_of=base)
                if last is not None and txn[1] <= last:
                    return base
            live, schema_json, _, props, dvs = self._resolve_state(base)
            rt_on = self._row_tracking_on(props)
            if dedupe_order is None and not unique_keys:
                # ranges + the unique-source-key check in ONE job;
                # _touched_files reuses the ranges instead of re-agg'ing
                ranges = self._batch_key_ranges_checked(
                    updates, keys, "update"
                )
                unique_keys = True
            else:
                ranges = self._batch_key_ranges(updates, keys)
            touched = self._touched_files(
                live, updates, keys, ranges=ranges
            )
            if mode == "merge_on_read" and schema_json is not None:
                v = self._merge_mor_attempt(
                    base, updates, keys, touched, schema_json, dvs, props,
                    dedupe_order=dedupe_order, txn=txn,
                    partition_by=partition_by, auto_evolve=auto_evolve,
                    delete_col=delete_col, unique_keys=unique_keys,
                    live=live,
                )
                if v is not None:
                    return v
                continue  # true overlap: re-plan against the new head
            if touched:
                target = self._read_for_rewrite(touched, schema_json, dvs, base)
            elif schema_json is not None:
                target = self.spark.createDataFrame(
                    [], T.StructType.fromJson(json.loads(schema_json))
                )
            else:  # first commit: surviving upserts seed the table
                target = self.spark.createDataFrame(
                    [], updates.drop(delete_col).schema
                )
            if dropped:  # the rewrite materializes column drops
                target = target.drop(*dropped)
            ups = updates
            if rt_on:
                if self._ROW_ID_COL not in target.columns:
                    target = target.withColumn(
                        self._ROW_ID_COL, F.lit(None).cast("long")
                    )
                ups = self._inherit_row_ids(updates, target, keys)
            merged = merge_apply(
                target,
                ups,
                keys,
                delete_col,
                dedupe_order=dedupe_order,
                allow_missing_columns=auto_evolve,
                unique_keys=unique_keys,
            )
            if rt_on:
                merged = self._assign_fresh_row_ids(merged, props)
            add, schema = self._stage_actions(merged, partition_by=partition_by)
            try:
                return self._try_commit(
                    base + 1,
                    "merge",
                    add,
                    touched,
                    # same widening guard as append/merge
                    self._evolve_schema(schema, base),
                    txn,
                )
            except CommitConflict:
                continue
        raise CommitConflict(f"merge_apply lost {max_retries} commit races")

    def merge_delete(
        self,
        keys_df: DataFrame,
        keys: Sequence[str],
        *,
        txn: tuple[str, int] | None = None,
        partition_by: Sequence[str] | None = None,
        max_retries: int = 5,
    ) -> int:
        """MERGE INTO ... WHEN MATCHED THEN DELETE: remove every row
        whose key appears in ``keys_df``, as snapshot-isolated
        copy-on-write with the same manifest-level file skipping as
        ``merge`` — only files whose footer key ranges overlap the
        batch are rewritten (left-anti join against the key set);
        provably-unmatchable files carry over by path. This is the
        set-valued complement of ``delete`` (which takes literal
        predicates): the CDC-apply shape for tombstone batches, and
        the GDPR-erasure shape (delete these N million user ids)
        where a literal IN-list can't scale but an anti-join does.

        ``txn=(app, batch_id)`` gives the same exactly-once replay
        contract as ``append``/``merge``."""
        colmap = self._colmap()
        keys = self._phys_names(keys, colmap)
        key_set = self._physicalize(
            keys_df, colmap
        ).select(*keys).dropDuplicates(keys)
        partition_by = self._phys_partition_by(partition_by, colmap)
        for _ in range(max_retries):
            base = self.latest_version()
            if txn is not None:
                last = self.last_txn_batch(txn[0], as_of=base)
                if last is not None and txn[1] <= last:
                    return base
            if base < 0:
                raise ValueError(f"table {self.path} has no commits")
            live, schema_json, _, _, dvs = self._resolve_state(base)
            touched = self._touched_files(live, key_set, keys)
            if not touched:
                return base  # no file can contain a matching key
            remaining = self._read_for_rewrite(
                touched, schema_json, dvs, base
            ).join(key_set, on=keys, how="left_anti")
            # join strategy stays Catalyst's call: AQE broadcasts a
            # small tombstone batch and shuffle-joins a huge one —
            # pinning broadcast here would OOM the GDPR-scale case
            add, schema = self._stage_actions(
                remaining, partition_by=partition_by
            )
            try:
                return self._try_commit(
                    base + 1, "merge_delete", add, touched, schema, txn
                )
            except CommitConflict:
                continue
        raise CommitConflict(f"merge_delete lost {max_retries} commit races")

    def foreach_batch_merge_sink(
        self,
        app: str,
        keys: Sequence[str],
        *,
        dedupe_order: str | None = None,
        partition_by: Sequence[str] | None = None,
    ):
        """``writeStream.foreachBatch`` adapter for streaming UPSERT —
        the CDC-apply shape: each micro-batch of change rows merges
        into the table (latest-per-key within the batch when
        ``dedupe_order`` is set), exactly once per batch id.
        ``partition_by`` keeps every rewrite partition-clustered, so
        the table the stream maintains stays prunable for readers AND
        for its own next merge."""

        def sink(batch_df: DataFrame, batch_id: int) -> None:
            self.merge(
                batch_df,
                keys,
                dedupe_order=dedupe_order,
                txn=(app, int(batch_id)),
                partition_by=partition_by,
            )

        return sink

    def scd2(
        self,
        changes: DataFrame,
        key: str,
        *,
        effective_col: str = "effective_ts",
        current_col: str = "is_current",
        end_col: str = "end_ts",
        dedupe_order: str | None = None,
        mode: str | None = None,
        max_retries: int = 5,
    ) -> int:
        """Transactional SCD2 history application: the
        operators/upsert.scd2_apply rewrite (close out changed current
        rows, append new versions) committed as one atomic
        remove-all+add-all snapshot — readers never see a dimension
        with a key both closed AND still current. Full-table
        copy-on-write by default (SCD2 touches the is_current flag
        across the dimension; dimensions are small relative to facts).

        ``mode="merge_on_read"`` makes the apply O(changed keys)
        instead of O(dimension): the matched CURRENT rows mask via
        deletion vectors, and ONE add carries their closed copies plus
        the new current versions — no dimension file is rewritten.
        History rows and unchanged keys are never read or touched
        (manifest key-range pruning bounds the read to files that may
        hold a changed key). The 100 TB-dimension shape.

        Row tracking note: SCD2 rewrites the whole dimension through
        the version-history operator, and every output row — closed,
        carried, or new version — gets a FRESH row id (unique, never
        colliding: fresh bases come from the central watermark). SCD2
        has its own identity story (the business key + effective
        range), so id preservation is deliberately not threaded
        through this verb (in MOR mode untouched rows keep their ids
        for free; closed copies and new versions mint fresh)."""
        from data_lake_demo_spark.operators.upsert import scd2_apply

        if mode is None:
            mode = self._default_write_mode("scd2.mode")
        if mode not in ("copy_on_write", "merge_on_read"):
            raise ValueError(f"unknown scd2 mode {mode!r}")
        for _ in range(max_retries):
            base = self.latest_version()
            if base < 0:
                raise ValueError(f"table {self.path} has no commits")
            if mode == "merge_on_read":
                v = self._scd2_mor_attempt(
                    base, changes, key,
                    effective_col=effective_col, current_col=current_col,
                    end_col=end_col, dedupe_order=dedupe_order,
                )
                if v is not None:
                    return v
                continue  # true overlap: re-plan against the new head
            live, _ = self._resolve(base)
            new_dim = scd2_apply(
                self.snapshot(base),
                changes,
                key,
                effective_col=effective_col,
                current_col=current_col,
                end_col=end_col,
                dedupe_order=dedupe_order,
            )
            add, schema = self._stage_actions(self._physicalize(new_dim))
            try:
                return self._try_commit(base + 1, "scd2", add, live, schema)
            except CommitConflict:
                continue
        raise CommitConflict(f"scd2 lost {max_retries} commit races")

    def _scd2_mor_attempt(
        self,
        base: int,
        changes: DataFrame,
        key: str,
        *,
        effective_col: str,
        current_col: str,
        end_col: str,
        dedupe_order: str | None,
    ) -> int | None:
        """One merge-on-read SCD2 attempt against ``base``: mask the
        matched current rows, stage their closed copies + the new
        current versions, commit add + dv (remove nothing). Mirrors
        operators/upsert.scd2_apply's close-out semantics row for
        row — the suite proves snapshot equality against the
        copy-on-write plan."""
        from data_lake_demo_spark.operators.upsert import _latest_per_key

        if dedupe_order is not None:
            changes = _latest_per_key(changes, [key], dedupe_order)
        live, schema_json, _, props, dvs = self._resolve_state(base)
        if schema_json is None:
            raise ValueError(f"table {self.path} has no commits")
        colmap = self._colmap(base)
        phys_changes = self._physicalize(changes, colmap)
        phys_key = self._phys_names([key], colmap)[0]
        if dedupe_order is not None:
            ranges = self._batch_key_ranges(phys_changes, [phys_key])
        else:
            # ranges + the unique-change-key check in ONE job (the
            # _assert_unique_keys contract, message included)
            ranges = self._batch_key_ranges_checked(
                phys_changes, [phys_key], "change"
            )
        touched = self._touched_files(
            live, phys_changes, [phys_key], ranges=ranges
        )
        dv_entries: list[dict] = []
        closing = None
        if touched:
            raw = self._read_files(touched, schema_json)
            dim = self._logicalize(
                self._with_dv_coords(raw, touched, dvs),
                colmap,
                keep=("__fp", "__ri"),
            )
            if self._ROW_ID_COL in dim.columns:
                dim = dim.drop(self._ROW_ID_COL)
            matched_cur = dim.filter(F.col(current_col)).join(
                changes.select(
                    key, F.col(effective_col).alias("__new_eff")
                ),
                key,
            )
            dv_entries = self._dv_entries_from(
                matched_cur.select("__fp", "__ri"), touched, dvs,
                row_bound=self._touched_row_bound(live, touched),
            )
            closing = (
                matched_cur.drop("__fp", "__ri")
                .withColumn(end_col, F.col("__new_eff"))
                .drop("__new_eff")
                .withColumn(current_col, F.lit(False))
            )
        # new current versions (same shape rule as scd2_apply).
        # Pending column drops are excluded from the alignment struct
        # (mirrors the CoW rewrite's target.drop(*dropped)): a dropped
        # physical column would otherwise resurface under its PHYSICAL
        # name in log_struct and break the unionByName against changes
        fields = [
            f
            for f in json.loads(schema_json)["fields"]
            if f["name"] != self._ROW_ID_COL
            and colmap.get(f["name"], f["name"]) != ""
        ]
        struct = T.StructType.fromJson({"type": "struct", "fields": fields})
        log_struct = T.StructType(
            [
                T.StructField(colmap.get(f.name, f.name) or f.name, f.dataType)
                for f in struct.fields
            ]
        )
        new_rows = changes.withColumn(current_col, F.lit(True)).withColumn(
            end_col, F.lit(None).cast(log_struct[end_col].dataType)
        )
        out = (
            closing.unionByName(new_rows) if closing is not None else
            self.spark.createDataFrame([], log_struct).unionByName(new_rows)
        )
        add, schema = self._stage_actions(self._physicalize(out, colmap))
        if not add and not dv_entries:
            return base
        v = self._commit_or_rebase(
            base,
            "scd2",
            add,
            [],
            self._evolve_schema(schema, base),
            dv=dv_entries,
            read_filters=[],  # any winner add may be a changed key
            check_adds=True,
        )
        if v is None:
            return None
        return self._auto_maintain(v, props_hint=props)

    def compact(
        self, *, n_files: int = 16, filters=(), max_retries: int = 5
    ) -> int:
        """OPTIMIZE (bin-packing): rewrite the table into ``n_files``
        right-sized files as one atomic snapshot swap. The antidote to
        small-file buildup from streaming appends — a micro-batch sink
        commits a few small files per trigger, and parquet scan setup
        is per-file; periodic compaction restores scan efficiency
        without pausing ingestion (readers keep resolving consistent
        snapshots throughout).

        ``filters`` scopes the rewrite (Delta's ``OPTIMIZE WHERE``):
        only files whose stats ranges may match are rewritten; the
        rest carry over untouched — at 100 TB you compact yesterday's
        hot partition, not the table. Scoping is FILE-granular: every
        row of a touched file is preserved (the predicate selects
        files, never rows)."""
        filters = self._phys_filters(filters)
        for _ in range(max_retries):
            base = self.latest_version()
            if base < 0:
                raise ValueError(f"table {self.path} has no commits")
            if filters:
                touched, _, _ = self._pruned_live(filters, base)
            else:
                touched, _ = self._resolve(base)
            if not touched:
                return base  # nothing in scope: no commit
            _, table_schema, _, _, dvs = self._resolve_state(base)
            rows = self._read_for_rewrite(touched, table_schema, dvs, base)
            add, schema = self._stage_actions(
                rows.repartition(n_files), sized=False
            )
            commit_schema = table_schema or schema
            if self._ROW_ID_COL in rows.columns:
                # the rewrite materialized row ids: the committed
                # schema must carry the hidden column or reads lose
                # them (caught by the row-tracking property test on
                # compact-as-first-rewrite)
                d = json.loads(commit_schema)
                if not any(
                    f["name"] == self._ROW_ID_COL for f in d["fields"]
                ):
                    d["fields"].append(
                        {
                            "name": self._ROW_ID_COL,
                            "type": "long",
                            "nullable": True,
                            "metadata": {},
                        }
                    )
                    commit_schema = json.dumps(d)
            # commit the TABLE schema, not the touched subset's —
            # a scoped compact must not narrow columns that only
            # exist in untouched files
            v = self._commit_or_rebase(
                base, "compact", add, touched, commit_schema,
                read_filters=filters or None,
            )
            if v is not None:
                return v
        raise CommitConflict(f"compact lost {max_retries} commit races")

    def optimize_zorder(
        self,
        cols: Sequence[str],
        *,
        n_files: int = 16,
        filters=(),
        max_retries: int = 5,
    ) -> int:
        """OPTIMIZE ZORDER BY: rewrite the table Z-ordered on ``cols``
        (operators/zorder.zvalue — interleaved quantile-bucket bits,
        range-partitioned so each file covers a compact hyper-rectangle
        of the key space). Pure layout change committed as one atomic
        snapshot swap: same rows, but every file's footer [min, max]
        is narrow on EVERY participating column, so the manifest-level
        pruning in ``merge`` (and any engine's row-group skipping)
        becomes selective on all of them at once — the reason table
        formats pair OPTIMIZE with MERGE-heavy workloads.

        ``filters`` scopes the rewrite (Delta's ``OPTIMIZE t WHERE ...
        ZORDER BY``): only files whose stats ranges may match are
        Z-ordered; the rest carry over untouched. FILE-granular like
        scoped compact — at 100 TB you Z-order yesterday's hot
        partition, not the table."""
        from data_lake_demo_spark.operators.zorder import zvalue

        filters = self._phys_filters(filters)
        for _ in range(max_retries):
            base = self.latest_version()
            if base < 0:
                raise ValueError(f"table {self.path} has no commits")
            if filters:
                touched, _, _ = self._pruned_live(filters, base)
            else:
                touched, _ = self._resolve(base)
            if not touched:
                return base  # nothing in scope: no commit
            _, table_schema, _, props, dvs = self._resolve_state(base)
            # rewrite read carries row ids through when tracked (same
            # contract as compact, via _read_for_rewrite)
            src = self._logicalize(
                self._read_for_rewrite(touched, table_schema, dvs, base),
                self._colmap(base),
                keep=(self._ROW_ID_COL,),  # hidden id rides the rewrite
            )
            laid_out = (
                zvalue(src, list(cols))
                .repartitionByRange(n_files, "__z")
                .sortWithinPartitions("__z")
                .drop("__z")
            )
            add, schema = self._stage_actions(
                self._physicalize(laid_out), sized=False
            )
            commit_schema = table_schema or schema
            if self._ROW_ID_COL in src.columns:
                d = json.loads(commit_schema)
                if not any(
                    f["name"] == self._ROW_ID_COL for f in d["fields"]
                ):
                    d["fields"].append(
                        {
                            "name": self._ROW_ID_COL,
                            "type": "long",
                            "nullable": True,
                            "metadata": {},
                        }
                    )
                    commit_schema = json.dumps(d)
            v = self._commit_or_rebase(
                base, "optimize_zorder", add, touched, commit_schema,
                read_filters=filters or None,
            )
            if v is not None:
                return v
        raise CommitConflict(f"optimize lost {max_retries} commit races")

    _CLUSTERING_KEY = "clustering.columns"
    # deleted-rows-ratio purge threshold (Delta's OPTIMIZE heuristic,
    # cf. delta.io maxDeletedRowsRatio): set as a TABLE property so
    # EVERY writer handle participates, exactly like merge.mode
    _DV_RATIO_KEY = "optimize.maxDeletedRowsRatio"

    def set_clustering(self, cols: Sequence[str]) -> int:
        """Delta liquid clustering's declaration half (``ALTER TABLE t
        CLUSTER BY (a, b)``): record the clustering key as a table
        property in ONE metadata-only commit. Writes stay cheap and
        unclustered (the Delta model — clustering is applied by
        OPTIMIZE, not on the write path); ``optimize_cluster`` then
        incrementally lays out whatever arrived since the last run.
        ``cols=[]`` is ``CLUSTER BY NONE``. The key can be CHANGED at
        any time (unlike Z-order-baked partitioning): already-written
        zcubes stay as they are, future OPTIMIZE runs cluster new data
        by the new key — exactly why Databricks positions liquid
        clustering as the replacement for hive-partitioning layout
        decisions you can't take back."""
        cols = list(cols)
        have = self.snapshot().columns if self.latest_version() >= 0 else []
        missing = [c for c in cols if have and c not in have]
        if missing:
            raise ValueError(f"clustering columns not in table: {missing}")
        for _ in range(5):  # metadata-only: losing a race just re-reads
            base = self.latest_version()
            if base < 0:
                raise ValueError(f"table {self.path} has no commits")
            props = dict(self.properties(base))
            if cols:
                props[self._CLUSTERING_KEY] = cols
            else:
                props.pop(self._CLUSTERING_KEY, None)
            _, schema_json, _, _, _ = self._resolve_state(base)
            try:
                return self._try_commit(
                    base + 1, "set_clustering", [], [], schema_json,
                    props=props,
                )
            except CommitConflict:
                continue
        raise CommitConflict("set_clustering lost 5 commit races")

    def clustering_columns(self) -> list[str]:
        return list(self.properties().get(self._CLUSTERING_KEY) or [])

    def optimize_cluster(
        self, *, n_files: int = 16, full: bool = False, max_retries: int = 5
    ) -> int:
        """Delta liquid clustering's layout half: INCREMENTAL
        clustering of only the files no OPTIMIZE has touched yet.

        Selection is the ZCube model: every file this verb stages is
        stamped with a ``#zcube`` manifest stat (the commit version
        that formed it); candidate files are the live files WITHOUT
        the stamp — fresh appends, merge/update rewrites, compaction
        output — plus any zcube no larger (by manifest row count)
        than the running candidate set: the binary-counter merge
        rule, absorbing equal-or-smaller epochs so a steady append
        stream converges to O(log n) zcubes with O(log n) amortized
        rewrites per row. A zcube that outgrows the incoming batch is
        STABLE — never rewritten — so (unlike a full Z-order, which
        rewrites the table) the cost of keeping a 100 TB table
        clustered scales with the data that arrived since the last
        run, not the table.

        Layout within the candidate set: all-numeric keys get the
        interleaved Z-value (operators/zorder.zvalue) so every file is
        narrow on EVERY key at once; any non-numeric key falls back to
        lexicographic range clustering on the key tuple (still
        min/max-narrow on the leading keys). Either way the payoff is
        the manifest: scan/merge/delete pruning on the clustering
        columns skips whole zcubes by footer [min, max].

        No candidates → NO commit (a scheduled OPTIMIZE on a quiet
        table is free). Pure layout otherwise: row ids carry through
        (``_read_for_rewrite``), the change feed of the commit is
        empty, and streams treat it like any other rewrite commit.

        ``full=True`` (Delta's ``OPTIMIZE t FULL``) reclusters EVERY
        live file, stamped or not — the one-off you run after changing
        the clustering key, collapsing overlapping zcube epochs back
        into a single layout."""
        from data_lake_demo_spark.operators.zorder import zvalue

        cols = self.clustering_columns()
        if not cols:
            raise ValueError(
                "no clustering columns declared (set_clustering / "
                "ALTER TABLE t CLUSTER BY)"
            )
        for _ in range(max_retries):
            base = self.latest_version()
            live, table_schema, _, props, dvs = self._resolve_state(base)
            miss = [c for c in cols if c not in self.snapshot(base).columns]
            if miss:
                raise ValueError(f"clustering columns not in table: {miss}")
            fresh = [
                p
                for p, st in live.items()
                if full or "#zcube" not in (st or {})
            ]
            if not fresh:
                return base  # everything already belongs to a zcube

            def _rows_of(p: str) -> int:
                n = (live.get(p) or {}).get("#rows")
                if n:
                    return int(n[0])
                n, _ = self._file_meta(p)
                return int(n or 0)

            touched, new_rows = list(fresh), sum(map(_rows_of, fresh))
            if not full:
                cubes: dict[int, list[str]] = {}
                for p, st in live.items():
                    z = (st or {}).get("#zcube")
                    if z:
                        cubes.setdefault(int(z[0]), []).append(p)
                sized = sorted(
                    (sum(map(_rows_of, fs)), fs) for fs in cubes.values()
                )
                for cube_rows, fs in sized:  # absorb equal-or-smaller
                    if cube_rows > new_rows:
                        break
                    touched.extend(fs)
                    new_rows += cube_rows
            touched = sorted(touched)
            # the rewrite read is PHYSICAL (like compact's); clustering
            # columns are declared logical — translate before keying
            pcols = self._phys_names(cols, self._colmap(base))
            rows = self._read_for_rewrite(touched, table_schema, dvs, base)
            numeric = {
                f.name
                for f in rows.schema.fields
                if isinstance(f.dataType, T.NumericType)
            }
            if all(c in numeric for c in pcols):
                laid_out = (
                    zvalue(rows, pcols)
                    .repartitionByRange(n_files, "__z")
                    .sortWithinPartitions("__z")
                    .drop("__z")
                )
            else:
                laid_out = rows.repartitionByRange(
                    n_files, *pcols
                ).sortWithinPartitions(*pcols)
            add, schema = self._stage_actions(laid_out, sized=False)
            for a in add:
                st = dict(a.get("stats") or {})
                st["#zcube"] = [base + 1]
                a["stats"] = st
            commit_schema = table_schema or schema
            if self._ROW_ID_COL in rows.columns:
                d = json.loads(commit_schema)
                if not any(
                    f["name"] == self._ROW_ID_COL for f in d["fields"]
                ):
                    d["fields"].append(
                        {
                            "name": self._ROW_ID_COL,
                            "type": "long",
                            "nullable": True,
                            "metadata": {},
                        }
                    )
                    commit_schema = json.dumps(d)
            # note: the #zcube epoch stays base+1 on rebase — epochs
            # only need to be distinct per optimize run, and two runs
            # can share an initial target only by racing each OTHER,
            # which is an overlap (re-plan), never a rebase
            v = self._commit_or_rebase(
                base, "optimize_cluster", add, touched, commit_schema
            )
            if v is not None:
                return v
        raise CommitConflict(f"optimize lost {max_retries} commit races")

    @classmethod
    def convert_from_parquet(cls, spark: SparkSession, path: str, **kw) -> "AcidTable":
        """Delta's ``CONVERT TO DELTA``: adopt an existing directory of
        parquet files as an AcidTable IN PLACE — zero data copies,
        zero data reads. Commit 0 references the files where they sit
        (relative paths at the table root; writes keep staging under
        ``data/`` so the layouts coexist) with footer stats harvested
        driver-side, so manifest pruning works from the first query.
        From then on the directory has the full verb set: ACID
        appends, MERGE, time travel, CDF, clustering. ``vacuum``
        treats the adopted files like any other — they are deleted
        only once no retained snapshot references them.

        Listing is RECURSIVE, like Delta's CONVERT: nested
        non-hive subdirectories (multi-level Spark output, manual
        sharding) adopt with their relative paths preserved; hidden
        trees (``_``/``.`` prefixes — ``_spark_metadata`` etc.) are
        skipped. Hive-partitioned layouts (``key=value`` directory
        components at any depth) are rejected: the partition values
        live in the directory names, not the files, so adoption
        in-place would drop those columns — read +
        ``append(partition_by=...)`` migrates that shape instead
        (one copy, but the columns materialize)."""
        t = cls(spark, path, **kw)
        if t.latest_version() >= 0:
            raise ValueError(f"{path} is already an AcidTable")
        files: list[str] = []
        for root, dirs, names in os.walk(path):
            dirs[:] = sorted(d for d in dirs if not d.startswith(("_", ".")))
            part = next((d for d in dirs if "=" in d), None)
            if part is not None:
                rel = os.path.relpath(os.path.join(root, part), path)
                raise ValueError(
                    f"hive-partitioned input ({rel}/...) cannot convert "
                    "in place — partition values live in directory names; "
                    "read + append(partition_by=...) instead"
                )
            for n in sorted(names):
                if n.endswith(".parquet") and not n.startswith(("_", ".")):
                    files.append(
                        os.path.relpath(os.path.join(root, n), path)
                    )
        files.sort()
        if not files:
            raise ValueError(f"no parquet files to convert at {path}")
        schema = spark.read.parquet(
            *[os.path.join(path, f) for f in files]
        ).schema.json()
        add = []
        for f in files:
            rows, stats = t._file_meta(f)
            if rows is not None:
                stats["#rows"] = [rows]
            add.append({"path": f, "stats": stats})
        t._try_commit(0, "convert", add, [], schema)
        return t

    def clone_to(
        self,
        target_path: str,
        *,
        shallow: bool = True,
        log_store: LogStore | None = None,
        as_of: int | None = None,
    ) -> "AcidTable":
        """Delta ``CLONE``: a new, independently-writable table seeded
        from this table's snapshot. ``shallow`` (default) copies ZERO
        data — the clone's first commit references the source's live
        files by absolute path (every reader resolves them because
        path joins pass absolute components through), along with the
        snapshot's schema, properties (constraints, colmap), and
        deletion vectors. Writes to the clone stage under the CLONE's
        data dir; copy-on-write verbs progressively localize it, and
        ``reorg_purge``/``compact`` can force full independence.
        Caveat (same as Delta's): the source's ``vacuum`` doesn't know
        about clones — a shallow clone is a dev/test-against-prod
        snapshot, not an archival copy. ``shallow=False`` rewrites the
        data into the clone (one distributed copy) and severs the
        dependency."""
        live, schema, _, props, dvs = self._resolve_state(as_of)
        if schema is None:
            raise ValueError(f"table {self.path} has no commits to clone")
        clone = AcidTable(
            self.spark,
            target_path,
            log_store=log_store,
            checkpoint_interval=self.checkpoint_interval,
            bloom_cols=self.bloom_cols,
            bloom_bits=self.bloom_bits,
        )
        if clone.latest_version() >= 0:
            raise ValueError(f"target {target_path} already has commits")
        if not shallow:
            src = self.snapshot(as_of)  # logical view
            clone._try_commit(0, "clone", [], [], schema, props=props or None)
            # deep clone materializes through the normal write path so
            # colmap/constraints resolve against the cloned props
            clone.overwrite(src)
            return clone
        add = [
            {"path": os.path.abspath(os.path.join(self.path, p)), "stats": s}
            for p, s in sorted(live.items())
        ]
        dv_entries = [
            {
                "path": os.path.abspath(os.path.join(self.path, p)),
                # sidecar references absolutize like the data paths —
                # the clone resolves them without the source's root
                "del": _dv_abs(dvs[p], self.path),
                "n": _dv_count(dvs[p]),
            }
            for p in sorted(dvs)
        ]
        clone._try_commit(
            0, "clone", add, [], schema, props=props or None, dv=dv_entries
        )
        return clone

    def fsck_repair(
        self, *, dry_run: bool = False, max_retries: int = 5
    ) -> list[str]:
        """Delta's ``FSCK REPAIR TABLE``: drop manifest references to
        data files that no longer exist physically (an object store's
        partial delete, manual cleanup, a vacuumed shallow-clone
        source). One metadata-only commit removes the dead entries so
        readers stop failing immediately; the referenced rows are
        LOST — the file is gone, and pretending otherwise would be
        worse (Delta's semantics exactly). Deletion vectors keyed on
        a dropped file retire with it. Returns the dropped paths;
        ``dry_run`` lists without committing."""
        for _ in range(max_retries):
            base = self.latest_version()
            if base < 0:
                raise ValueError(f"table {self.path} has no commits")
            live, schema_json, _, _, _ = self._resolve_state(base)
            missing = sorted(
                p
                for p in live
                if not os.path.isfile(
                    p if os.path.isabs(p) else os.path.join(self.path, p)
                )
            )
            if not missing or dry_run:
                return missing
            try:
                self._try_commit(base + 1, "fsck", [], missing, schema_json)
                return missing
            except CommitConflict:
                continue
        raise CommitConflict(f"fsck_repair lost {max_retries} commit races")

    def reorg_purge(
        self,
        *,
        n_files: int = 16,
        min_dv_ratio: float | None = None,
        max_retries: int = 5,
    ) -> int:
        """Delta's ``REORG TABLE ... APPLY (PURGE)``: rewrite exactly
        the files that still carry soft-deleted state — merge-on-read
        deletion vectors, or a DROPPED physical column — and clear the
        drop entries from the column map once no live file can contain
        the column (which releases the dropped name for reuse; old
        snapshots keep their own map via time travel). Files are
        selected from manifest stats alone: a file needs purging iff
        it has a vector, its stats mention a dropped column, or it has
        no stats to prove otherwise. A clean table returns without
        committing.

        ``min_dv_ratio`` switches to the DEBT-ONLY mode (the
        ``optimize.maxDeletedRowsRatio`` auto-policy's worker): only
        files whose vector masks >= the ratio of their rows are
        rewritten; lightly-masked files keep their cheap vectors, the
        column map is untouched, and a below-threshold table is a
        provable no-op (no commit) — the property that makes the
        auto-hook idempotent."""
        for _ in range(max_retries):
            base = self.latest_version()
            if base < 0:
                raise ValueError(f"table {self.path} has no commits")
            live, schema_json, _, props, dvs = self._resolve_state(base)
            if min_dv_ratio is not None:
                dropped: list[str] = []
                touched = self._dv_debt_files(live, dvs, float(min_dv_ratio))
                new_props = None
            else:
                colmap = dict(props.get("colmap") or {})
                dropped = [p for p, l in colmap.items() if l == ""]

                def needs(p, stats):
                    if p in dvs:
                        return True
                    if not dropped:
                        return False
                    if not stats:
                        return True  # unknown layout: conservatively rewrite
                    return any(
                        d in stats or f"#null:{d}" in stats for d in dropped
                    )

                touched = sorted(
                    p for p, st in live.items() if needs(p, st)
                )
                new_props = None
                if dropped:
                    kept_map = {p: l for p, l in colmap.items() if l != ""}
                    new_props = dict(props)
                    if kept_map:
                        new_props["colmap"] = kept_map
                    else:
                        new_props.pop("colmap", None)
            if not touched and new_props is None:
                return base  # nothing soft-deleted: no commit
            add = []
            if touched:
                rows = self._read_for_rewrite(touched, schema_json, dvs, base)
                if dropped:
                    rows = rows.drop(*dropped)
                add, _ = self._stage_actions(
                    rows.repartition(min(n_files, len(touched))),
                    sized=False,
                )
            fields = [
                f
                for f in json.loads(schema_json)["fields"]
                if f["name"] not in dropped
            ]
            if (
                touched
                and self._row_tracking_on(props)
                and not any(f["name"] == self._ROW_ID_COL for f in fields)
            ):
                # the purge rewrite materialized row ids: the committed
                # schema must carry the hidden column or reads lose them
                fields.append(
                    {
                        "name": self._ROW_ID_COL,
                        "type": "long",
                        "nullable": True,
                        "metadata": {},
                    }
                )
            schema_out = json.dumps({"type": "struct", "fields": fields})
            try:
                return self._try_commit(
                    base + 1, "purge", add, touched, schema_out,
                    props=new_props,
                )
            except CommitConflict:
                continue
        raise CommitConflict(f"reorg_purge lost {max_retries} commit races")

    def vacuum(
        self,
        *,
        retain_versions: int | None = None,
        retain_hours: float | None = None,
        grace_seconds: float = 3600.0,
        dry_run: bool = False,
    ) -> list[str]:
        """Garbage-collect data files unreferenced by every retained
        snapshot. Two classes of garbage:

        - files some commit ADDED but every retained snapshot has since
          removed (superseded data past the time-travel horizon) —
          deleted unconditionally, the log proves no retained reader
          can need them;
        - staging files NO commit ever referenced — a crashed writer's
          leftovers *or an in-flight writer that staged but has not yet
          committed*. These are deleted only when older than
          ``grace_seconds`` (file-mtime), mirroring Delta's VACUUM
          retention check: without the age gate, vacuuming during a
          concurrent write would delete the writer's staged files and
          its subsequent commit would reference dead paths, bricking
          the snapshot.

        Time travel keeps working for the retained window. Returns
        deleted paths; ``dry_run=True`` (Delta's VACUUM DRY RUN)
        returns the would-delete list without touching anything.

        Retention picks whichever bound(s) the caller gives — neither
        given defaults to 10 versions:

        - ``retain_versions=n``: the last n versions stay
          time-travelable (this engine's native form);
        - ``retain_hours=h`` (Delta's native ``RETAIN n HOURS``):
          every snapshot whose COMMIT TIME is newer than the cutoff
          stays, plus the latest;
        - both: the more conservative wins (the union of the two
          retained windows) — adding a bound can only retain MORE,
          never silently shorten the other window."""
        latest = self.latest_version()
        if retain_versions is None and retain_hours is None:
            retain_versions = 10
        horizon = (
            max(latest - retain_versions + 1, 0)
            if retain_versions is not None
            else latest
        )
        if retain_hours is not None:
            cutoff = time.time() - retain_hours * 3600.0
            th = latest  # latest always survives
            for c in self.history():
                if c.ts >= cutoff:
                    th = min(th, c.version)
            horizon = min(horizon, th)
        # files (and DV sidecars) referenced by ANY retained snapshot
        referenced: set[str] = set()
        referenced_dv: set[str] = set()
        for v in range(horizon, latest + 1):
            state = self._resolve_state(v)
            referenced |= set(state[0])
            for val in state[4].values():
                rel_sc = _dv_sidecar_rel(val)
                if rel_sc:
                    referenced_dv.add(rel_sc)
        # every path the log has EVER committed (added then removed ⇒
        # provably superseded; absence ⇒ possibly in-flight)
        ever_committed: set[str] = set()
        ever_dv: set[str] = set()
        for c in self.history():
            ever_committed |= {a["path"] for a in c.add}
            for e in c.dv or ():
                rel_sc = _dv_sidecar_rel(e.get("del"))
                if rel_sc:
                    ever_dv.add(rel_sc)
        # unpublished WAP branches share the data directory but commit
        # to their OWN logs — without folding those logs in, vacuum
        # would classify a branch's data files and DV sidecars as
        # never-committed and reclaim them after grace_seconds,
        # bricking the branch before publish_branch. Every snapshot of
        # every live (non-dropped) branch is protected; drop_branch
        # releases the hold. Branch logs on a non-default LogStore
        # backend are invisible here — for those the create_branch
        # caveat (don't vacuum main while the branch is open) stands.
        for bname in self.branches():
            bdir = os.path.join(self.path, f"_branch_{bname}")
            if not os.path.isdir(bdir):
                continue  # non-default branch log backend
            try:
                bt = self.branch(bname)
                b_latest = bt.latest_version()
                for v in range(0, b_latest + 1):
                    st = bt._resolve_state(v)
                    referenced |= set(st[0])
                    for val in st[4].values():
                        rel_sc = _dv_sidecar_rel(val)
                        if rel_sc:
                            referenced_dv.add(rel_sc)
                for c in bt.history():
                    ever_committed |= {a["path"] for a in c.add}
                    for e in c.dv or ():
                        rel_sc = _dv_sidecar_rel(e.get("del"))
                        if rel_sc:
                            ever_dv.add(rel_sc)
            except Exception:
                continue  # a torn/foreign branch dir never widens deletes
        now = time.time()
        deleted = []
        # adopted files (CONVERT references them at the table root,
        # outside data/) reclaim like any other once superseded: they
        # are ever_committed by definition, so no grace gate applies.
        # Absolute paths (shallow CLONE references into the SOURCE
        # table) are never touched — they belong to another table.
        for rel in sorted(ever_committed - referenced):
            if os.path.isabs(rel) or rel.startswith(_DATA + os.sep):
                continue
            full = os.path.join(self.path, rel)
            if not os.path.isfile(full):
                continue
            if not dry_run:
                os.remove(full)
            deleted.append(rel)
        data_root = os.path.join(self.path, _DATA)
        if not os.path.isdir(data_root):
            return deleted  # converted table that has never staged a write
        for stage in sorted(os.listdir(data_root)):
            sdir = os.path.join(data_root, stage)
            for n in sorted(os.listdir(sdir)):
                rel = os.path.join(_DATA, stage, n)
                if n.endswith(".bin"):
                    # DV sidecars reclaim exactly like data files:
                    # referenced by a retained snapshot → keep;
                    # superseded (committed, no longer referenced) →
                    # delete; never committed → age-gated (possibly a
                    # writer staging ahead of its commit). A crashed
                    # writer's ``.tmp-`` leftovers fall in the last
                    # bucket via the same gate below.
                    if rel in referenced_dv:
                        continue
                    if rel not in ever_dv:
                        try:
                            age = now - os.path.getmtime(
                                os.path.join(self.path, rel)
                            )
                        except OSError:
                            continue
                        if age < grace_seconds:
                            continue
                    if not dry_run:
                        os.remove(os.path.join(self.path, rel))
                    deleted.append(rel)
                    continue
                if ".tmp-" in n:  # crashed sidecar staging
                    try:
                        age = now - os.path.getmtime(
                            os.path.join(self.path, rel)
                        )
                    except OSError:
                        continue
                    if age >= grace_seconds:
                        if not dry_run:
                            os.remove(os.path.join(self.path, rel))
                        deleted.append(rel)
                    continue
                if not n.endswith(".parquet") or rel in referenced:
                    continue
                if rel not in ever_committed:
                    try:
                        age = now - os.path.getmtime(os.path.join(self.path, rel))
                    except OSError:
                        continue  # raced with the writer finishing its own cleanup
                    if age < grace_seconds:
                        continue  # possibly an in-flight writer's staging
                if not dry_run:
                    os.remove(os.path.join(self.path, rel))
                deleted.append(rel)
            if not dry_run and not os.listdir(sdir):
                os.rmdir(sdir)
        return deleted
