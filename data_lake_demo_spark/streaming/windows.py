"""Event-time streaming aggregations (SURVEY T6): watermark +
tumbling / sliding / session windows, and a custom stateful operator.

These are the streaming twins of plans/events.py — identical
aggregation logic, expressed over a ``readStream`` source, so the
batch oracle validates the semantics and the streaming tests validate
delivery (append-mode emission after watermark passage).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T


def _event_time(df: DataFrame, col: str) -> DataFrame:
    """Normalize an event-time column to TimestampType. Spark 4.x may
    infer tz-less parquet as TIMESTAMP_NTZ, which ``withWatermark``
    rejects; under a UTC session timezone the cast is instant-
    preserving (and a no-op for TimestampType)."""
    if isinstance(df.schema[col].dataType, T.TimestampNTZType):
        return df.withColumn(col, F.col(col).cast("timestamp"))
    return df


def tumbling_counts(events: DataFrame, *, watermark: str = "10 minutes") -> DataFrame:
    """Tumbling 1-hour windows; watermark bounds state (late rows
    beyond it are dropped, state is evicted — the 100 TB requirement
    for unbounded streams)."""
    return (
        _event_time(events, "ts").withWatermark("ts", watermark)
        .groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(F.count(F.lit(1)).alias("n"), F.sum("value").alias("total_value"))
        .select(F.col("w.start").alias("window_start"), "event_type", "n", "total_value")
    )


def sliding_counts(events: DataFrame, *, watermark: str = "10 minutes") -> DataFrame:
    return (
        _event_time(events, "ts").withWatermark("ts", watermark)
        .groupBy(F.window("ts", "1 hour", "30 minutes").alias("w"))
        .agg(F.count(F.lit(1)).alias("n"))
        .select(F.col("w.start").alias("window_start"), "n")
    )


def session_counts(
    events: DataFrame, *, gap: str = "30 minutes", watermark: str = "10 minutes"
) -> DataFrame:
    """Session windows with a 30-minute inactivity gap — the built-in
    streaming form of plans/events.events_sessionization."""
    return (
        _event_time(events, "ts").withWatermark("ts", watermark)
        .groupBy(F.session_window("ts", gap).alias("w"), "user_id")
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            F.col("w.start").alias("session_start"),
            F.col("w.end").alias("session_end"),
            "user_id",
            "n_events",
        )
    )


def stream_static_enrich(events: DataFrame, dim: DataFrame) -> DataFrame:
    """Stream-static join: enrich the event stream with a (broadcast)
    dimension — no state, re-resolved per micro-batch."""
    return events.join(F.broadcast(dim), "user_id", "left")


def stream_stream_purchase_attribution(
    events: DataFrame, how: str = "inner"
) -> DataFrame:
    """Stream-stream join with event-time bounds: attribute each
    purchase to a view by the same user within the preceding hour.
    Watermarks bound both join states (the 100 TB requirement — state
    eviction is what keeps an unbounded join finite). ``how`` may be
    'inner' or 'leftOuter' (outer emission waits for the watermark)."""
    views = (
        events.filter(F.col("event_type") == "view")
        .select(
            F.col("user_id").alias("v_user"),
            F.col("ts").alias("view_ts"),
            F.col("event_id").alias("view_id"),
        )
        .transform(lambda d: _event_time(d, "view_ts"))
        .withWatermark("view_ts", "2 hours")
    )
    purchases = (
        events.filter(F.col("event_type") == "purchase")
        .select("user_id", F.col("ts").alias("purchase_ts"), "event_id", "value")
        .transform(lambda d: _event_time(d, "purchase_ts"))
        .withWatermark("purchase_ts", "2 hours")
    )
    return purchases.join(
        views,
        (F.col("user_id") == F.col("v_user"))
        & (F.col("view_ts") <= F.col("purchase_ts"))
        & (F.col("view_ts") >= F.col("purchase_ts") - F.expr("INTERVAL 1 HOUR")),
        how,
    ).select("user_id", "event_id", "purchase_ts", "view_id", "view_ts", "value")


def stream_dedup(
    events: DataFrame, keys: list[str] | None = None, *, watermark: str = "1 hour"
) -> DataFrame:
    """Streaming deduplication with bounded state:
    ``dropDuplicatesWithinWatermark`` keeps a key's dedup state only
    until the watermark passes it — the at-least-once → effectively-
    exactly-once repair stage for event streams (the streaming twin of
    the reference's idempotent-key guard, worker.py:214-221)."""
    keys = keys or ["event_id"]
    return _event_time(events, "ts").withWatermark("ts", watermark).dropDuplicatesWithinWatermark(keys)


def running_user_totals(events: DataFrame) -> DataFrame:
    """Custom stateful operator via applyInPandasWithState: running
    per-user event count + value total across micro-batches."""
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    out_schema = "user_id long, n_events long, total_value double"
    state_schema = "n long, total double"

    def fn(key, pdfs, state: GroupState):
        n, total = state.get if state.exists else (0, 0.0)
        for pdf in pdfs:
            n += len(pdf)
            total += float(pdf["value"].sum())
        state.update((n, total))
        import pandas as pd

        yield pd.DataFrame(
            {"user_id": [key[0]], "n_events": [n], "total_value": [total]}
        )

    return events.groupBy("user_id").applyInPandasWithState(
        fn,
        outputStructType=out_schema,
        stateStructType=state_schema,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def stream_pack_sequences(
    docs: DataFrame,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    ctx_tokens: int = 2048,
    n_shards: int = 8,
) -> DataFrame:
    """Incremental sequence packing: the streaming twin of
    operators/corpus.pack_sequences, as a custom stateful operator
    (applyInPandasWithState). State per shard is ONE long — the
    cumulative token count — so a 1000-shard corpus carries 8 KB of
    state total while packing unbounded document streams; each
    micro-batch appends (doc, shard, pack_id) rows as soon as its
    documents arrive.

    Matches the batch operator exactly when documents arrive in id
    order per shard (the planner contract for backfills); within a
    micro-batch documents are sorted by id before packing.
    """
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    out_schema = "shard long, doc_id long, n_tokens long, pack_id long"
    state_schema = "cum long"

    def fn(key, pdfs, state: GroupState):
        import pandas as pd

        (cum,) = state.get if state.exists else (0,)
        shards, ids, toks, packs = [], [], [], []
        for pdf in pdfs:
            for doc_id, n in (
                pdf.sort_values("doc_id")[["doc_id", "n_tokens"]].itertuples(
                    index=False
                )
            ):
                shards.append(key[0])
                ids.append(int(doc_id))
                toks.append(int(n))
                packs.append(cum // ctx_tokens)
                cum += int(n)
        state.update((cum,))
        yield pd.DataFrame(
            {"shard": shards, "doc_id": ids, "n_tokens": toks, "pack_id": packs}
        )

    prepped = docs.select(
        F.col(id_col).alias("doc_id"),
        F.pmod(F.col(id_col), F.lit(n_shards)).alias("shard"),
        F.size(F.split(F.trim(F.col(text_col)), r"\s+")).cast("long").alias(
            "n_tokens"
        ),
    )
    return prepped.groupBy("shard").applyInPandasWithState(
        fn,
        outputStructType=out_schema,
        stateStructType=state_schema,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def daily_approx_users(events: DataFrame, *, watermark: str = "10 minutes") -> DataFrame:
    """Streaming COUNT DISTINCT via mergeable HLL sketches — the
    streaming twin of plans/events.events_hll_daily_users. Exact
    distinct over an unbounded stream needs per-key user sets in
    state; the sketch keeps state at ~2.5 KB per open day regardless
    of user cardinality, and partial sketches merge across
    micro-batches exactly like map-side combine in batch."""
    return (
        _event_time(events, "ts").withWatermark("ts", watermark)
        .groupBy(F.window("ts", "1 day").alias("w"))
        .agg(F.hll_sketch_agg("user_id").alias("sk"))
        .select(
            F.col("w.start").alias("day"),
            F.hll_sketch_estimate("sk").alias("approx_users"),
        )
    )
