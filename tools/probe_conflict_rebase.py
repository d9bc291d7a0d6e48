"""Contention probe: maintenance (optimize_cluster) racing a fleet of
appenders, with logical conflict-rebase ON (the shipped behavior) vs
FORCED re-plan (the pre-r9 behavior, emulated by making every lost
race return None from _commit_or_rebase).

The workload shape is the reference's: many parallel queue writers
(reference stack.py:62-80) plus a periodic clustering job. The metric
that matters at 100 TB is how much DATA the maintenance job re-reads
per lost race — blind optimistic retry re-runs the whole rewrite,
rebase re-commits the already-staged files.

Usage::

    PYTHONPATH=. python tools/probe_conflict_rebase.py
"""

from __future__ import annotations

import threading
import time

from pyspark.sql import SparkSession

from data_lake_demo_spark.tableformat import AcidTable, CommitConflict


def run(spark, path: str, *, legacy: bool) -> dict:
    t = AcidTable(spark, path)
    t.append(
        spark.range(50_000).selectExpr("id AS k", "id % 97 AS v")
        .repartition(8)
    )
    t.set_clustering(["k"])

    stats = {"stagings": 0, "optimize_commits": 0, "conflicts": 0}
    lock = threading.Lock()
    orig_stage = AcidTable._stage_actions
    orig_try = AcidTable._try_commit

    def counting_stage(self, *a, **kw):
        with lock:
            stats["stagings"] += 1
        return orig_stage(self, *a, **kw)

    def counting_try(self, *a, **kw):
        try:
            return orig_try(self, *a, **kw)
        except CommitConflict:
            with lock:
                stats["conflicts"] += 1
            raise

    t._stage_actions = counting_stage.__get__(t, AcidTable)
    t._try_commit = counting_try.__get__(t, AcidTable)
    if legacy:
        orig_rebase = AcidTable._commit_or_rebase

        def no_rebase(self, base, op, add, remove, schema_json, **kw):
            try:
                return orig_try(self, base + 1, op, add, remove,
                                schema_json, kw.get("txn"), dv=kw.get("dv"))
            except CommitConflict:
                with lock:
                    stats["conflicts"] += 1
                return None  # every lost race forces the caller's re-plan

        t._commit_or_rebase = no_rebase.__get__(t, AcidTable)

    done = threading.Event()
    errs: list[Exception] = []

    def appender(i: int):
        try:
            w = AcidTable(spark, path)
            for j in range(15):
                w.append(
                    spark.range(
                        1_000_000 + i * 100_000 + j * 5_000,
                        1_000_000 + i * 100_000 + j * 5_000 + 5_000,
                    ).selectExpr("id AS k", "id % 97 AS v")
                )
                time.sleep(0.2)  # spread across several optimize cycles
        except Exception as e:  # pragma: no cover
            errs.append(e)

    threads = [threading.Thread(target=appender, args=(i,)) for i in range(4)]
    t0 = time.perf_counter()
    for x in threads:
        x.start()
    opt_wall = 0.0
    while any(x.is_alive() for x in threads):
        o0 = time.perf_counter()
        try:
            t.optimize_cluster(n_files=8, max_retries=50)
            stats["optimize_commits"] += 1
        except CommitConflict:
            pass
        opt_wall += time.perf_counter() - o0
    for x in threads:
        x.join()
    done.set()
    o0 = time.perf_counter()
    t.optimize_cluster(n_files=8, max_retries=50)  # final convergence pass
    stats["optimize_commits"] += 1
    opt_wall += time.perf_counter() - o0
    total = time.perf_counter() - t0

    assert not errs, errs
    n = t.snapshot().count()
    assert n == 50_000 + 4 * 15 * 5_000, n
    live = t._resolve_state(None)[0]
    assert all("#zcube" in st for st in live.values())
    stats.update(
        total_wall=round(total, 1), optimize_wall=round(opt_wall, 1),
        rows=n, live_files=len(live),
    )
    return stats


def main() -> None:
    import tempfile

    spark = (
        SparkSession.builder.master("local[32]")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    base = tempfile.mkdtemp(prefix="conflict-probe-")
    for legacy in (False, True):
        label = "legacy re-plan" if legacy else "rebase (shipped)"
        out = run(spark, f"{base}/{'legacy' if legacy else 'rebase'}",
                  legacy=legacy)
        print(f"{label}: {out}")


if __name__ == "__main__":
    main()
