"""Incremental (streaming) near-duplicate detection.

Batch LSH dedup (operators/dedup.py) answers "which docs in THIS
corpus are near-dups of each other"; a training-data ingestion
pipeline needs the incremental form: "is this NEW document a near-dup
of anything we have EVER seen" — without rescanning the corpus.

Design: a persisted **signature store** (parquet, partitioned by the
micro-batch id that wrote it) holds the banded MinHash signatures of
every document seen so far. Each micro-batch, via ``foreachBatch``:

1. computes banded signatures for the batch's documents (the same
   ``minhash_signatures`` + ``band_signatures`` operators as batch);
2. equi-joins the batch's band rows against the store's band rows →
   candidate pairs (store doc, new doc) with estimated Jaccard from
   full-signature agreement — text is never compared or shuffled;
3. detects pairs WITHIN the batch the same way (self-join);
4. appends the pairs and then the batch's signatures, each under the
   batch-id partition with dynamic overwrite, so a replayed batch
   (crash between write and checkpoint commit) rewrites its own
   partitions instead of duplicating — the foreachBatch ledger
   pattern (see ingest_stream.start_foreach_batch_upsert).

At 100 TB the store is the only growing state and it holds 8-byte
band keys + 64×8-byte signatures per doc (≈0.5 KB/doc — three orders
of magnitude smaller than the text); the per-batch join touches only
matching band buckets.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.streaming import StreamingQuery

from data_lake_demo_spark.operators.dedup import band_signatures, minhash_signatures

DOC_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("text", T.StringType()),
    ]
)


def _est_jaccard(num_hashes: int) -> F.Column:
    # r12: expanded to a codegen integer chain, mirroring the batch
    # operator (operators/dedup.minhash_lsh_candidates) — the HOF
    # fold is CodegenFallback, interpreted per element per candidate
    # pair; integer sums are order-exact so the estimate is
    # value-identical (guide §4.1).
    from data_lake_demo_spark.functions.vector_expand import sig_agreement

    return sig_agreement("sig_a", "sig_b", num_hashes) / float(num_hashes)


def _candidates(
    left_banded: DataFrame, right_banded: DataFrame, num_hashes: int, min_jaccard: float
) -> DataFrame:
    """Band-bucket equi-join → (id_a, id_b, est_jaccard), id_a < id_b.

    Pinned to sort-merge: the store side grows without bound and a
    mis-estimated broadcast would OOM (see minhash_lsh_candidates);
    AQE demotes to broadcast when a side is genuinely small."""
    a = left_banded.alias("a").hint("merge")
    b = right_banded.alias("b")
    pairs = (
        a.join(
            b,
            (F.col("a.band_id") == F.col("b.band_id"))
            & (F.col("a.band_hash") == F.col("b.band_hash"))
            & (F.col("a.id") < F.col("b.id")),
        )
        .select(
            F.col("a.id").alias("id_a"),
            F.col("b.id").alias("id_b"),
            F.col("a.sig").alias("sig_a"),
            F.col("b.sig").alias("sig_b"),
        )
        .dropDuplicates(["id_a", "id_b"])
    )
    return pairs.select(
        "id_a", "id_b", _est_jaccard(num_hashes).alias("est_jaccard")
    ).filter(F.col("est_jaccard") >= min_jaccard)


def start_near_dup_stream(
    spark: SparkSession,
    landing_dir: str,
    signature_store: str,
    pairs_out: str,
    checkpoint_root: str,
    *,
    num_hashes: int = 64,
    bands: int = 16,
    shingle_n: int = 3,
    min_jaccard: float = 0.5,
    max_files_per_trigger: int = 1,
) -> StreamingQuery:
    """Start the incremental near-dup stream over JSON-lines documents
    ``{doc_id, text}`` landing in ``landing_dir``. Candidate pairs
    accumulate in ``pairs_out``; signatures in ``signature_store``."""

    docs = (
        spark.readStream.schema(DOC_SCHEMA)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .json(landing_dir)
    )

    def process_batch(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        sig = minhash_signatures(
            batch_df, "text", "doc_id", num_hashes=num_hashes, shingle_n=shingle_n
        )
        banded = band_signatures(sig, num_hashes=num_hashes, bands=bands)
        banded = banded.localCheckpoint(eager=True)  # computed once, reused 4×

        batch_pairs = _candidates(banded, banded, num_hashes, min_jaccard)
        try:
            store = spark.read.parquet(signature_store).drop("batch_id")
            cross_pairs = _candidates(store, banded, num_hashes, min_jaccard).union(
                _candidates(banded, store, num_hashes, min_jaccard)
            )
            all_pairs = batch_pairs.union(cross_pairs).dropDuplicates(["id_a", "id_b"])
        except Exception:  # first batch: no store yet
            all_pairs = batch_pairs

        def write(df: DataFrame, path: str) -> None:
            # write straight into this batch's partition directory:
            # overwrite of one batch dir = idempotent replay, and the
            # forced single task emits a schema-bearing parquet file
            # even for an EMPTY batch result (partitionBy would write
            # nothing, leaving the dataset unreadable until the first
            # non-empty batch). Per-batch outputs are small; at scale
            # raise the partition count per batch.
            df.repartition(1).write.mode("overwrite").parquet(
                os.path.join(path, f"batch_id={batch_id}")
            )

        write(all_pairs, pairs_out)
        write(banded, signature_store)

    return (
        docs.writeStream.foreachBatch(process_batch)
        .option("checkpointLocation", os.path.join(checkpoint_root, "near_dup"))
        .trigger(availableNow=True)
        .start()
    )
