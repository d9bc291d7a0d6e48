"""Ops metrics: run log + streaming progress capture (SURVEY T7/A4).

The reference tracks pages_ingested / failures / queue-age with
CloudWatch metrics and alarms (README.md:277-297, stack.py:322-351)
and keeps per-key counters in the planner/worker
(planner.py:34-76, worker.py:267-315). Re-homed as:

- a ``runlog`` table in the lake (parquet, append-only): one row per
  (run, endpoint) with planned/written/failure counts and timings —
  queryable with plain Spark SQL (the A4 per-key counter surface);
- ``ops_summary`` — the standing A4 query over the run log;
- ``alerts`` — the alarm conditions (failures ≥ 1, zero-output run)
  as a DataFrame instead of CloudWatch alarms;
- ``ProgressListener`` — StreamingQueryListener capturing per-batch
  input row counts (the queue-depth/age analog for streams).
"""

from __future__ import annotations

import os
import uuid
from datetime import datetime, timezone

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

RUNLOG_SCHEMA = (
    "run_id string, ingestion_date string, endpoint string, "
    "pages_planned long, pages_written long, failures long, "
    "started_at timestamp, finished_at timestamp"
)


def log_run(
    spark: SparkSession,
    runlog_path: str,
    *,
    ingestion_date: str,
    per_endpoint: list[tuple[str, int, int, int]],
    started_at: datetime,
) -> str:
    """Append one row per endpoint for this run. Returns run_id."""
    run_id = uuid.uuid4().hex[:12]
    finished = datetime.now(timezone.utc)
    rows = [
        (run_id, ingestion_date, ep, planned, written, failures, started_at, finished)
        for (ep, planned, written, failures) in per_endpoint
    ]
    spark.createDataFrame(rows, RUNLOG_SCHEMA).write.mode("append").parquet(
        runlog_path
    )
    return run_id


def read_runlog(spark: SparkSession, runlog_path: str) -> DataFrame:
    return spark.read.schema(RUNLOG_SCHEMA).parquet(runlog_path)


def ops_summary(spark: SparkSession, runlog_path: str) -> DataFrame:
    """A4: per-endpoint counters across runs."""
    return (
        read_runlog(spark, runlog_path)
        .groupBy("endpoint")
        .agg(
            F.count(F.lit(1)).alias("n_runs"),
            F.sum("pages_planned").alias("pages_planned"),
            F.sum("pages_written").alias("pages_written"),
            F.sum("failures").alias("failures"),
            F.max("finished_at").alias("last_run_at"),
        )
        .orderBy("endpoint")
    )


def alerts(spark: SparkSession, runlog_path: str) -> DataFrame:
    """The reference's alarm conditions as rows: any failures, or a
    run that wrote nothing it planned (stack.py:322-351 analogs)."""
    rl = read_runlog(spark, runlog_path)
    return rl.filter(
        (F.col("failures") > 0)
        | ((F.col("pages_planned") > 0) & (F.col("pages_written") == 0))
    ).select(
        "run_id",
        "endpoint",
        "ingestion_date",
        F.when(F.col("failures") > 0, F.lit("worker_errors"))
        .otherwise(F.lit("zero_output"))
        .alias("alarm"),
        "failures",
        "pages_planned",
        "pages_written",
    )


class ProgressListener:
    """StreamingQueryListener capturing per-batch input rows AND named
    observed metrics (``df.observe`` aggregates computed in-plan per
    micro-batch) — attach with
    ``spark.streams.addListener(ProgressListener())``. ``observed``
    accumulates ``(metric_name, {col: value})`` pairs, e.g. the
    ingest stream's ``ingest_good``/``ingest_quarantine`` counters."""

    def __new__(cls):
        from pyspark.sql.streaming import StreamingQueryListener

        class _L(StreamingQueryListener):
            def __init__(self):
                self.batches: list[tuple[str, int]] = []
                self.observed: list[tuple[str, dict]] = []

            def onQueryStarted(self, event):
                pass

            def onQueryProgress(self, event):
                p = event.progress
                self.batches.append((p.name or p.id, p.numInputRows))
                try:
                    for name, row in (p.observedMetrics or {}).items():
                        self.observed.append((name, row.asDict()))
                except Exception:
                    pass  # best-effort: malformed progress never kills ingest

            def onQueryIdle(self, event):
                pass

            def onQueryTerminated(self, event):
                pass

        return _L()


def runlog_path(root: str) -> str:
    return os.path.join(root, "runlog")
