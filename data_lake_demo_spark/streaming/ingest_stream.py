"""Streaming ingestion: the reference's SQS→worker micro-batch loop
(SURVEY §2.9 T1-T5) as Structured Streaming.

Mapping:
- SQS queue of work/records  → file-source stream on a landing dir
- batch_size=2 / 2s window   → ``maxFilesPerTrigger`` (T2/T3
  back-pressure; processing-time trigger in production,
  ``availableNow`` for drain-and-stop runs)
- retry → DLQ after 5        → quarantine split: rows whose payload
  fails schema parse go to quarantine/, good rows to raw/ (T4); no
  poison row ever aborts the stream
- at-least-once + idempotent keys → the transactional file sink:
  its per-checkpoint commit log gives exactly-once file visibility
  across restarts/replays (T5) with zero custom bookkeeping — the
  engine-level upgrade of the reference's deterministic-key
  existence check (worker.py:214-221)

At scale: landing-dir listing is the only driver-side cost; parse,
validate and partitioned write run on executors, partitioned by
(source, ingestion_date) exactly like the batch path.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.streaming import StreamingQuery

from data_lake_demo_spark.model import RAW_PARTITIONS, RAW_RECORD

# landing files are JSON-lines of {endpoint, ingestion_date, page, payload:str}
LANDING_SCHEMA = T.StructType(
    [
        T.StructField("endpoint", T.StringType()),
        T.StructField("ingestion_date", T.StringType()),
        T.StructField("page", T.LongType()),
        T.StructField("payload", T.StringType()),  # JSON text of RAW_RECORD
    ]
)


def _landing_stream(spark: SparkSession, landing_dir: str, max_files_per_trigger: int):
    return (
        spark.readStream.schema(LANDING_SCHEMA)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .json(landing_dir)
        .withColumn("rec", F.from_json("payload", RAW_RECORD))
    )


def start_ingest_stream(
    spark: SparkSession,
    landing_dir: str,
    raw_dir: str,
    quarantine_dir: str,
    checkpoint_root: str,
    *,
    max_files_per_trigger: int = 2,
    available_now: bool = True,
) -> tuple[StreamingQuery, StreamingQuery]:
    """Start the good-path and quarantine streams; returns both
    queries. Exactly-once via the file sink's commit log."""
    parsed = _landing_stream(spark, landing_dir, max_files_per_trigger)
    ok_pred = F.col("rec").isNotNull() & F.col("rec.endpoint").isNotNull()

    good = parsed.filter(ok_pred).select(
        "rec.endpoint",
        "rec.date",
        "rec.page",
        "rec.fetched_at",
        "rec.items",
        F.col("rec.endpoint").alias("source"),
        "ingestion_date",
    )
    bad = parsed.filter(~ok_pred).select(
        "endpoint", "ingestion_date", "page", "payload"
    )
    # named observed metrics ride each micro-batch's progress event
    # (StreamingQueryProgress.observedMetrics) — the CloudWatch
    # pages_ingested / item-volume / quarantine counters computed
    # in-plan, no second pass over the data (metrics.ProgressListener
    # captures them)
    good = good.observe(
        "ingest_good",
        F.count(F.lit(1)).alias("pages"),
        F.sum(F.size("items")).alias("items"),
    )
    bad = bad.observe("ingest_quarantine", F.count(F.lit(1)).alias("pages"))

    def _writer(df, sub: str):
        w = (
            df.writeStream.format("json")
            .option("checkpointLocation", os.path.join(checkpoint_root, sub))
            .option("compression", "gzip")
        )
        return w.trigger(availableNow=True) if available_now else w.trigger(
            processingTime="5 seconds"
        )

    good_q = (
        _writer(good, "good")
        .partitionBy(*RAW_PARTITIONS)
        .option("path", raw_dir)
        .start()
    )
    bad_q = _writer(bad, "bad").option("path", quarantine_dir).start()
    return good_q, bad_q


def start_foreach_batch_upsert(
    spark: SparkSession,
    landing_dir: str,
    target_dir: str,
    checkpoint_root: str,
    *,
    max_files_per_trigger: int = 2,
) -> StreamingQuery:
    """T5 variant for sinks WITHOUT a transactional commit log:
    ``foreachBatch`` + batch-id ledger = exactly-once effects on an
    arbitrary sink (the pattern for JDBC/object-store/MERGE targets).

    Each micro-batch writes its rows tagged with the batch id into a
    batch-id-partitioned directory; a replayed batch (same id, after a
    crash between write and checkpoint commit) dynamically OVERWRITES
    its own partition instead of appending a duplicate — idempotent by
    construction, the same guard the reference implements per-object
    with deterministic keys + existence checks (worker.py:214-221).

    At scale the ledger write is a partition-level operation on the
    sink; the stream's state stays in the checkpoint as usual.
    """
    parsed = _landing_stream(spark, landing_dir, max_files_per_trigger)
    good = parsed.filter(F.col("rec").isNotNull()).select(
        "rec.endpoint", "rec.date", "rec.page", "rec.fetched_at", "ingestion_date"
    )

    def upsert_batch(batch_df, batch_id: int) -> None:
        (
            batch_df.withColumn("batch_id", F.lit(batch_id))
            .repartition(1)
            .write.mode("overwrite")
            # self-contained dynamic overwrite: replace ONLY this
            # batch's partition even if the session default is static
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy("batch_id")
            .parquet(target_dir)
        )

    return (
        good.writeStream.foreachBatch(upsert_batch)
        .option("checkpointLocation", os.path.join(checkpoint_root, "upsert"))
        .trigger(availableNow=True)
        .start()
    )


def start_curated_merge_stream(
    spark: SparkSession,
    landing_dir: str,
    curated_table_path: str,
    checkpoint_root: str,
    *,
    app: str = "curated_ingest",
    max_files_per_trigger: int = 2,
    cluster_by: tuple[str, ...] | None = None,
    auto_compact_files: int | None = None,
):
    """Streaming ingestion straight into an ACID curated table: each
    micro-batch of landed records is typed (the promote_curated cast)
    and MERGED into an AcidTable keyed by the reference's idempotency
    key (endpoint, date, page) — worker.py:27-28's deterministic S3
    key, upgraded from \"skip if object exists\" to a transactional
    upsert. A re-fetched page UPDATES its row instead of duplicating
    it (latest fetched_at wins within a batch), and the (app,
    batch_id) txn watermark makes post-crash batch replays no-ops —
    end-to-end exactly-once into a table readers can query mid-stream
    with snapshot isolation.

    This supersedes the plain-parquet streaming promote for the
    curated zone: the batch path (lake.promote_curated) rebuilds the
    zone wholesale; this path keeps it continuously current. At scale
    each merge rewrites only the files whose footer key ranges overlap
    the batch (manifest-level skipping in AcidTable.merge).

    ``cluster_by`` switches the curated table's layout strategy from
    hive partitioning to LIQUID CLUSTERING on the given key (the
    natural choice is the reference's own (endpoint, date) prefix,
    worker.py:27-28): the table is seeded with CLUSTER BY, and with
    ``auto_compact_files`` set the auto-compact follow-up after each
    merge CLUSTERS as it packs — streaming ingestion converges to a
    clustered, point-lookup-prunable layout with no scheduled
    OPTIMIZE job, and a racing manual OPTIMIZE simply rebases
    (logical conflict detection: appends and clustering commute).
    CLUSTER BY and partition_by are exclusive (the Delta rule).

    Returns ``(query, table)``.
    """
    from data_lake_demo_spark.tableformat import AcidTable

    parsed = _landing_stream(spark, landing_dir, max_files_per_trigger)
    curated = parsed.filter(F.col("rec").isNotNull()).select(
        F.col("rec.endpoint").alias("endpoint"),
        F.to_date("rec.date").alias("date"),
        F.col("rec.page").cast("long").alias("page"),
        F.to_timestamp("rec.fetched_at").alias("fetched_at"),
        F.col("rec.items").alias("items"),
        F.size("rec.items").cast("long").alias("item_count"),
        F.col("rec.endpoint").alias("source"),
        "ingestion_date",
    )
    table = AcidTable(
        spark, curated_table_path, auto_compact_files=auto_compact_files
    )
    if table.latest_version() < 0:
        # MERGE needs a target snapshot; seed an empty one with the
        # curated schema (an atomic, contention-free first commit)
        table.append(spark.createDataFrame([], curated.schema))
    if cluster_by and not table.clustering_columns():
        table.set_clustering(list(cluster_by))
    q = (
        curated.writeStream.foreachBatch(
            table.foreach_batch_merge_sink(
                app,
                ["endpoint", "date", "page"],
                dedupe_order="fetched_at",
                # keep rewrites clustered on the reference's partition
                # scheme (worker.py:27-28's endpoint/date prefixes) so
                # the curated zone stays prunable — a reader's
                # scan([("endpoint", "=", ...), ("date", "=", ...)])
                # and the NEXT merge both touch one partition's files.
                # Under CLUSTER BY the layout comes from clustering
                # instead (the two are exclusive, the Delta rule).
                partition_by=None if cluster_by else ["endpoint", "date"],
            )
        )
        .option("checkpointLocation", os.path.join(checkpoint_root, "curated"))
        .trigger(availableNow=True)
        .start()
    )
    return q, table


def read_raw_stream_output(spark: SparkSession, raw_dir: str):
    """Read the streamed raw zone (the sink's _spark_metadata log makes
    this an exactly-once view of committed files)."""
    return spark.read.schema(
        T.StructType(
            list(RAW_RECORD.fields)
            + [
                T.StructField("source", T.StringType()),
                T.StructField("ingestion_date", T.StringType()),
            ]
        )
    ).option("basePath", raw_dir).json(raw_dir)
