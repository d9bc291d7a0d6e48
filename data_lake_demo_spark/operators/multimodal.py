"""Multimodal column plumbing: image/audio/video as opaque binary.

The container has no image/audio codecs, so the *decode* kernels are
stubbed (deterministic fakes clearly marked), but the Spark-side
contract is real and tested: schema, Arrow batch shape, partitioning,
and the `mapInPandas` pipeline a production decode would drop into.

At 100 TB: binary payloads ride in their parquet row groups untouched
until the decode stage; metadata predicates (media_type, byte_len)
prune row groups before any payload is materialized. The decode stage
is `mapInPandas` (Arrow-batched) so a real codec (PIL/ffmpeg) slots in
per-batch without changing the plan.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("media_type", T.StringType()),  # image|audio|video
        T.StructField("payload", T.BinaryType()),  # opaque encoded bytes
        T.StructField("byte_len", T.LongType()),
        T.StructField("meta", T.StructType(  # typed sidecar metadata
            [
                T.StructField("width", T.IntegerType()),
                T.StructField("height", T.IntegerType()),
                T.StructField("duration_ms", T.LongType()),
                T.StructField("codec", T.StringType()),
            ]
        )),
    ]
)

FEATURE_SCHEMA = (
    "media_id long, media_type string, byte_len long, feature array<float>, "
    "entropy double, n_distinct_bytes long, mean_byte double, magic string"
)


def synthetic_media(spark, n: int = 64, partitions: int = 4) -> DataFrame:
    """Deterministic fake media table exercising the real schema:
    payload bytes derive from the id (no codecs involved). Partition
    count is capped so a tiny table doesn't fan out one Arrow/Python
    worker per core downstream."""
    df = spark.range(0, n, 1, partitions).select(
        F.col("id").alias("media_id"),
        F.element_at(
            F.array(F.lit("image"), F.lit("audio"), F.lit("video")),
            (F.col("id") % 3 + 1).cast("int"),
        ).alias("media_type"),
        F.sha2(F.col("id").cast("string"), 256).cast("binary").alias("payload"),
    )
    return df.select(
        "media_id",
        "media_type",
        "payload",
        F.length("payload").cast("long").alias("byte_len"),
        F.struct(
            (F.col("media_id") % 640 + 1).cast("int").alias("width"),
            (F.col("media_id") % 480 + 1).cast("int").alias("height"),
            (F.col("media_id") * 1000 % 60000).cast("long").alias("duration_ms"),
            F.lit("fake/v1").alias("codec"),
        ).alias("meta"),
    )


def decode_and_featurize(df: DataFrame, feature_dim: int = 8) -> DataFrame:
    """The decode → feature-extract stage as `mapInPandas`.

    The byte-level features are REAL (computable on any binary column,
    codec or not): Shannon entropy of the byte histogram (log2),
    distinct-byte count, mean byte value, and the leading 4 bytes as a
    latin-1 "magic number" string — the standard corrupt-file /
    format-mismatch screens a media ingest runs before decode. Only
    the `feature` embedding remains a stub (a deterministic fold of
    payload bytes): a real extractor needs the image/audio codec this
    container lacks, and slots into the same per-batch kernel without
    touching the plan.
    """
    import numpy as np

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats, ents, nds, means, magics = [], [], [], [], []
            for payload in pdf["payload"]:
                b = bytes(payload)
                arr = np.frombuffer(b, np.uint8)
                counts = np.bincount(arr, minlength=256)
                p = counts[counts > 0] / max(len(arr), 1)
                ents.append(float(-(p * np.log2(p)).sum()) if len(arr) else 0.0)
                nds.append(int((counts > 0).sum()))
                means.append(float(arr.mean()) if len(arr) else 0.0)
                magics.append(b[:4].decode("latin1"))
                # deterministic fake "embedding" of the bytes (STUB)
                feats.append(
                    [float(sum(b[i::feature_dim]) % 1000) / 1000.0 for i in range(feature_dim)]
                )
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "media_type": pdf["media_type"],
                    "byte_len": pdf["byte_len"],
                    "feature": feats,
                    "entropy": ents,
                    "n_distinct_bytes": nds,
                    "mean_byte": means,
                    "magic": magics,
                }
            )

    return df.mapInPandas(op, schema=FEATURE_SCHEMA)


def resize_images(
    df: DataFrame, width: int = 224, height: int = 224, *, strict: bool = False
) -> DataFrame:
    """Image resize stage as ``mapInPandas``.

    STUB decode: with ``strict=True`` this raises
    ``NotImplementedError`` (no image codec in this container); the
    default non-strict path passes payload bytes through unchanged and
    rewrites the metadata to the target dimensions, so the Spark-side
    contract — schema, Arrow batching, metadata propagation — is fully
    testable and a PIL/libvips kernel slots into ``op`` per-batch
    without touching the plan.
    """
    out_schema = T.StructType(
        [
            T.StructField("media_id", T.LongType(), False),
            T.StructField("payload", T.BinaryType()),
            T.StructField("width", T.IntegerType()),
            T.StructField("height", T.IntegerType()),
            T.StructField("orig_width", T.IntegerType()),
            T.StructField("orig_height", T.IntegerType()),
        ]
    )

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        if strict:
            raise NotImplementedError(
                "real image decode requires an image codec (PIL/libvips), "
                "not available in this container"
            )
        for pdf in batches:
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "payload": pdf["payload"],  # a real kernel re-encodes here
                    "width": width,
                    "height": height,
                    "orig_width": [m["width"] for m in pdf["meta"]],
                    "orig_height": [m["height"] for m in pdf["meta"]],
                }
            )

    return df.filter(F.col("media_type") == "image").select(
        "media_id", "payload", "meta"
    ).mapInPandas(op, schema=out_schema)


def frame_sample_plan(df: DataFrame, every_ms: int = 1000) -> DataFrame:
    """Video frame-sampling *plan*: computes the frame timestamps to
    extract per video from metadata only — no payload decode. The
    payload-touching extraction would be a mapInPandas stage like
    `decode_and_featurize`."""
    return (
        df.filter(F.col("media_type") == "video")
        .select(
            "media_id",
            F.explode(
                F.sequence(
                    F.lit(0).cast("long"),
                    F.col("meta.duration_ms"),
                    F.lit(every_ms).cast("long"),
                )
            ).alias("frame_ts_ms"),
        )
    )


FRAME_FEATURE_SCHEMA = (
    "media_id long, frame_idx long, frame_ts_ms long, "
    "mean_byte double, n_distinct_bytes long"
)


def sample_frames_and_featurize(
    df: DataFrame, *, every_ms: int = 1000, frame_bytes: int = 8
) -> DataFrame:
    """Frame-sample → decode → per-frame features, end to end.

    The frame PLAN is pure JVM metadata algebra (one ``sequence`` +
    ``explode`` per video — no payload touched while planning); the
    per-frame decode runs in the same ``mapInPandas`` Arrow tier as
    ``decode_and_featurize``. STUB decode: a real ffmpeg kernel would
    seek to ``frame_ts_ms`` and decode one frame; here the "frame" is
    a deterministic ``frame_bytes`` slice of the payload at offset
    ``(frame_idx * frame_bytes) mod byte_len`` — so the byte features
    (mean, distinct count) are REAL computations on REAL bytes and the
    whole pipeline (plan fan-out, Arrow batching, per-frame stats)
    value-hashes against an oracle that rebuilds the same slices.

    At 100 TB: the explode duplicates only (media_id, payload-ref,
    frame_ts) within a partition — frames of one video stay in its
    input split, so no shuffle precedes the decode; a downstream
    per-video aggregate shuffles feature rows, never payloads.
    """
    frames = (
        df.filter(F.col("media_type") == "video")
        .select(
            "media_id",
            "payload",
            F.posexplode(
                F.sequence(
                    F.lit(0).cast("long"),
                    F.col("meta.duration_ms"),
                    F.lit(every_ms).cast("long"),
                )
            ).alias("frame_idx", "frame_ts_ms"),
        )
    )

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        for pdf in batches:
            means, nds = [], []
            for payload, idx in zip(pdf["payload"], pdf["frame_idx"]):
                b = bytes(payload)
                off = (int(idx) * frame_bytes) % max(len(b), 1)
                chunk = np.frombuffer(b[off : off + frame_bytes], np.uint8)
                means.append(float(chunk.mean()) if len(chunk) else 0.0)
                nds.append(int(len(np.unique(chunk))))
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "frame_idx": pdf["frame_idx"].astype("int64"),
                    "frame_ts_ms": pdf["frame_ts_ms"],
                    "mean_byte": means,
                    "n_distinct_bytes": nds,
                }
            )

    return frames.mapInPandas(op, schema=FRAME_FEATURE_SCHEMA)
