"""Event-stream analytics over the ``events`` fixture (batch form).

These are the batch equivalents of the streaming operators in
SURVEY.md §2.9 (T6: tumbling/sliding/session windows, event-time
semantics); ``data_lake_demo_spark.streaming`` runs the same logic as
Structured Streaming queries. Batch form is what the DuckDB oracle
can check.

Timestamp parity note: ``events.ts`` is nanosecond-precision parquet.
Our loader truncates to µs (Spark's native resolution); every oracle
query applies ``CAST(ts AS TIMESTAMP)`` so DuckDB truncates ns→µs
identically before any comparison or bucketing.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import Window as W
from pyspark.sql import functions as F

from data_lake_demo_spark.functions.vector import quantize
from data_lake_demo_spark.operators.asof import asof_join
from data_lake_demo_spark.operators.timeseries import gap_fill, lttb_downsample
from data_lake_demo_spark.plans.relational import _sql_qsum, qsum
from data_lake_demo_spark.sources.testdata import load_table


def events_tumbling_hourly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tumbling 1-hour event-time windows (T6). ``F.window`` is
    epoch-aligned, identical to date_trunc('hour')."""
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(F.count(F.lit(1)).alias("n"), qsum(F.col("value"), "total_value"))
        .select(
            F.col("w.start").alias("window_start"),
            "event_type",
            "n",
            "total_value",
        )
        .orderBy("window_start", "event_type")
    )


TUMBLING_SQL = f"""
SELECT date_trunc('hour', CAST(ts AS TIMESTAMP)) AS window_start,
       event_type, count(*) AS n, {_sql_qsum('value', 'total_value')}
FROM events
GROUP BY 1, 2 ORDER BY window_start, event_type
"""


def events_sliding_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sliding windows: 1 hour long, every 30 minutes. Each event lands
    in exactly 2 windows; Spark expands them JVM-side."""
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.groupBy(F.window("ts", "1 hour", "30 minutes").alias("w"))
        .agg(F.count(F.lit(1)).alias("n"), qsum(F.col("value"), "total_value"))
        .select(F.col("w.start").alias("window_start"), "n", "total_value")
        .orderBy("window_start")
    )


SLIDING_SQL = f"""
WITH slotted AS (
  SELECT unnest([time_bucket(INTERVAL '30 minutes', CAST(ts AS TIMESTAMP)),
                 time_bucket(INTERVAL '30 minutes', CAST(ts AS TIMESTAMP))
                   - INTERVAL '30 minutes']) AS window_start,
         value
  FROM events)
SELECT window_start, count(*) AS n, {_sql_qsum('value', 'total_value')}
FROM slotted GROUP BY 1 ORDER BY window_start
"""


def events_sessionization(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch sessionization: per-user sessions split on >30 min gaps
    (lag + cumulative flag — one shuffle on user_id). The streaming
    twin is ``F.session_window`` (streaming/windows.py)."""
    ev = load_table(spark, sf_dir, "events")
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    wrun = w.rowsBetween(W.unboundedPreceding, W.currentRow)
    # cast via TIMESTAMP first: numeric casts on TIMESTAMP_NTZ are
    # illegal in Spark 4.x, and this stays a no-op for TimestampType
    ts_s = F.col("ts").cast("timestamp").cast("long")
    gap = ts_s - F.lag(ts_s).over(w)
    sessions = (
        ev.withColumn("new_session", F.when(gap.isNull() | (gap > 1800), 1).otherwise(0))
        .withColumn("session_id", F.sum("new_session").over(wrun))
    )
    return (
        sessions.groupBy("user_id", "session_id")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.min("ts").alias("session_start"),
            (
                F.max(F.col("ts").cast("timestamp").cast("long"))
                - F.min(F.col("ts").cast("timestamp").cast("long"))
            ).alias("duration_s"),
        )
        .orderBy("user_id", "session_id")
    )


SESSIONIZATION_SQL = """
WITH t AS (
  SELECT user_id, event_id, CAST(ts AS TIMESTAMP) AS ts,
         CASE WHEN lag(CAST(ts AS TIMESTAMP)) OVER w IS NULL
                OR CAST(floor(epoch(CAST(ts AS TIMESTAMP))) AS BIGINT)
                   - CAST(floor(epoch(lag(CAST(ts AS TIMESTAMP)) OVER w)) AS BIGINT) > 1800
              THEN 1 ELSE 0 END AS new_session
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY CAST(ts AS TIMESTAMP), event_id)),
 s AS (
  SELECT user_id, ts,
         CAST(sum(new_session) OVER (PARTITION BY user_id
                                     ORDER BY ts, event_id
                                     ROWS UNBOUNDED PRECEDING) AS BIGINT) AS session_id
  FROM t)
SELECT user_id, session_id, count(*) AS n_events,
       min(ts) AS session_start,
       CAST(floor(epoch(max(ts))) AS BIGINT) - CAST(floor(epoch(min(ts))) AS BIGINT) AS duration_s
FROM s GROUP BY user_id, session_id ORDER BY user_id, session_id
"""


def events_json_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSON payload extraction (SURVEY F5): pull ``k`` out of the
    ``props`` JSON column, bucket it, aggregate."""
    ev = load_table(spark, sf_dir, "events")
    k = F.get_json_object("props", "$.k").cast("long")
    return (
        ev.select("event_id", k.alias("k"), "value")
        .withColumn("k_bucket", (F.col("k") / 10).cast("long"))
        .groupBy("k_bucket")
        .agg(F.count(F.lit(1)).alias("n"), qsum(F.col("value"), "total_value"))
        .orderBy("k_bucket")
    )


JSON_EXTRACT_SQL = f"""
SELECT CAST(floor(CAST(json_extract_string(props, '$.k') AS BIGINT) / 10.0) AS BIGINT)
         AS k_bucket,
       count(*) AS n, {_sql_qsum('value', 'total_value')}
FROM events GROUP BY 1 ORDER BY k_bucket
"""


def events_daily_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-day conditional counts across the event funnel (manual
    pivot; the streaming twin aggregates the same per window)."""
    ev = load_table(spark, sf_dir, "events")
    day = F.date_trunc("day", F.col("ts")).alias("day")
    return (
        ev.groupBy(day)
        .agg(
            F.sum(F.when(F.col("event_type") == "view", 1).otherwise(0)).alias("views"),
            F.sum(F.when(F.col("event_type") == "click", 1).otherwise(0)).alias("clicks"),
            F.sum(F.when(F.col("event_type") == "purchase", 1).otherwise(0)).alias(
                "purchases"
            ),
            F.sum(F.when(F.col("event_type") == "signup", 1).otherwise(0)).alias(
                "signups"
            ),
            F.sum(F.when(F.col("event_type") == "error", 1).otherwise(0)).alias("errors"),
        )
        .orderBy("day")
    )


DAILY_FUNNEL_SQL = """
SELECT date_trunc('day', CAST(ts AS TIMESTAMP)) AS day,
       CAST(sum(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END) AS BIGINT) AS views,
       CAST(sum(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) AS BIGINT) AS clicks,
       CAST(sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS BIGINT) AS purchases,
       CAST(sum(CASE WHEN event_type = 'signup' THEN 1 ELSE 0 END) AS BIGINT) AS signups,
       CAST(sum(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END) AS BIGINT) AS errors
FROM events GROUP BY 1 ORDER BY day
"""


def events_asof_last_view(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join (custom operator, SURVEY §2.13 family): for every
    purchase, the timestamp of the same user's latest view at-or-before
    the purchase. One shuffle on user_id — see operators/asof.py."""
    ev = load_table(spark, sf_dir, "events")
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "user_id", "event_id", "ts"
    )
    views = ev.filter(F.col("event_type") == "view").select(
        "user_id", F.col("ts").alias("view_ts")
    )
    joined = asof_join(
        purchases,
        views.select("user_id", "view_ts", F.col("view_ts").alias("vts")),
        on=["user_id"],
        left_time="ts",
        right_time="vts",
        value_cols=["view_ts"],
        suffix="",
    )
    return joined.select(
        "user_id",
        "event_id",
        F.col("ts").alias("purchase_ts"),
        F.col("view_ts").alias("last_view_ts"),
    ).orderBy("user_id", "event_id")


ASOF_SQL = """
SELECT p.user_id, p.event_id,
       CAST(p.ts AS TIMESTAMP) AS purchase_ts,
       (SELECT max(CAST(v.ts AS TIMESTAMP)) FROM events v
        WHERE v.user_id = p.user_id AND v.event_type = 'view'
          AND CAST(v.ts AS TIMESTAMP) <= CAST(p.ts AS TIMESTAMP)) AS last_view_ts
FROM events p
WHERE p.event_type = 'purchase'
ORDER BY p.user_id, p.event_id
"""


def events_scd2_point_in_time(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Point-in-time (SCD2-interval) enrichment — the feature-store
    idiom that prevents training-data leakage: an SCD2 dimension is
    derived from the event stream itself (every ``signup`` bumps the
    user's tier; ``valid_from``/``valid_to`` intervals via a lead
    window, the same shape operators/upsert.scd2_apply maintains on
    tables), and each purchase joins the tier THAT WAS VALID at its
    event time — never a later one. Interval join per user; purchases
    before any signup surface with tier 0, not dropped.

    Scale shape: the dimension is the signup slice (small vs the
    stream); the join shuffles both sides once on user_id and the
    interval predicate evaluates inside the sort-merge join. At a
    1000-executor scale the dimension side is broadcastable."""
    from pyspark.sql import Window as W

    ev = load_table(spark, sf_dir, "events")
    wd = W.partitionBy("user_id").orderBy("ts", "event_id")
    dim = (
        ev.filter(F.col("event_type") == "signup")
        .select("user_id", "ts", "event_id")
        .withColumn("tier", F.row_number().over(wd))
        .withColumn("valid_to", F.lead("ts").over(wd))
        .select(
            F.col("user_id").alias("d_user"),
            F.col("ts").alias("valid_from"),
            "valid_to",
            "tier",
        )
    )
    purch = ev.filter(F.col("event_type") == "purchase").select(
        "user_id", "event_id", "ts"
    )
    joined = purch.join(
        dim,
        (F.col("user_id") == F.col("d_user"))
        & (F.col("valid_from") <= F.col("ts"))
        & (F.col("valid_to").isNull() | (F.col("ts") < F.col("valid_to"))),
        "left",
    )
    return joined.select(
        "user_id",
        "event_id",
        F.col("ts").alias("purchase_ts"),
        F.coalesce("tier", F.lit(0)).cast("long").alias("tier"),
    ).orderBy("user_id", "event_id")


SCD2_PIT_SQL = """
WITH s AS (
  SELECT user_id, CAST(ts AS TIMESTAMP) AS vf, event_id,
         row_number() OVER (PARTITION BY user_id
             ORDER BY CAST(ts AS TIMESTAMP), event_id) AS tier,
         lead(CAST(ts AS TIMESTAMP)) OVER (PARTITION BY user_id
             ORDER BY CAST(ts AS TIMESTAMP), event_id) AS vt
  FROM events WHERE event_type = 'signup'),
p AS (SELECT user_id, event_id, CAST(ts AS TIMESTAMP) AS pts
      FROM events WHERE event_type = 'purchase')
SELECT p.user_id, p.event_id, p.pts AS purchase_ts,
       CAST(coalesce(s.tier, 0) AS BIGINT) AS tier
FROM p LEFT JOIN s
  ON p.user_id = s.user_id AND s.vf <= p.pts
     AND (s.vt IS NULL OR p.pts < s.vt)
ORDER BY p.user_id, p.event_id
"""


def events_daily_from_hourly_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hypertable-style continuous aggregate: daily stats computed by
    COMPOSING the hourly rollup's decomposable partials (count /
    quantized sum / min / max) — the oracle aggregates raw events
    directly, proving rollup-of-rollup ≡ direct aggregation."""
    from data_lake_demo_spark.operators.rollup_time import rollup_to, time_rollup

    ev = load_table(spark, sf_dir, "events")
    hourly = time_rollup(ev, interval="1 hour", group_cols=["event_type"])
    daily = rollup_to(hourly, interval="1 day", group_cols=["event_type"])
    return daily.select(
        F.col("bucket_start").alias("day"),
        "event_type",
        "n",
        "total_value",
        "value_min",
        "value_max",
    ).orderBy("day", "event_type")


ROLLUP_COMPOSE_SQL = f"""
SELECT date_trunc('day', CAST(ts AS TIMESTAMP)) AS day, event_type,
       count(*) AS n,
       {_sql_qsum('value', 'total_value')},
       min(value) AS value_min, max(value) AS value_max
FROM events GROUP BY 1, 2 ORDER BY day, event_type
"""


def events_daily_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Day-over-day cohort retention: per activity day, distinct active
    users and the fraction who return the next day. The corpus reduces
    to distinct (user_id, day) pairs FIRST (map-side distinct of two
    compact columns), so the self-join and both aggregations shuffle
    16-byte rows regardless of raw event volume."""
    ev = load_table(spark, sf_dir, "events")
    days = ev.select(
        "user_id", F.date_trunc("day", F.col("ts")).alias("day")
    ).distinct()
    prev = days.select(
        "user_id", (F.col("day") - F.expr("INTERVAL 1 DAY")).alias("day")
    )
    returned = days.join(prev, ["user_id", "day"], "left_semi")
    act = days.groupBy("day").agg(F.count(F.lit(1)).alias("active_users"))
    ret = returned.groupBy("day").agg(F.count(F.lit(1)).alias("returned_users"))
    n_ret = F.coalesce(F.col("returned_users"), F.lit(0)).cast("long")
    return (
        act.join(ret, "day", "left")
        .select(
            "day",
            "active_users",
            n_ret.alias("returned_users"),
            (n_ret / F.col("active_users")).alias("retention_rate"),
        )
        .orderBy("day")
    )


def events_rolling_7d_active(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rolling 7-day distinct active users per day (window ENDS on the
    labeled day). Shape: distinct (user, day) pairs explode into the 7
    window-days each contributes to, then one distinct-count per day —
    a bounded ×7 expansion of 16-byte pairs plus one shuffle, instead
    of a day-spine range join (whose skewed many-to-many explosion is
    the usual scale trap for sliding distinct counts)."""
    ev = load_table(spark, sf_dir, "events")
    pairs = ev.select(
        "user_id", F.date_trunc("day", F.col("ts")).alias("day")
    ).distinct()
    contrib = pairs.select(
        "user_id",
        F.explode(
            F.sequence(
                F.col("day"),
                F.col("day") + F.expr("INTERVAL 6 DAY"),
                F.expr("INTERVAL 1 DAY"),
            )
        ).alias("win_day"),
    )
    return (
        contrib.groupBy("win_day")
        .agg(F.count_distinct("user_id").alias("active_7d"))
        .orderBy("win_day")
    )


ROLLING_7D_SQL = """
WITH pairs AS (
  SELECT DISTINCT user_id, date_trunc('day', CAST(ts AS TIMESTAMP)) AS day
  FROM events),
contrib AS (
  SELECT user_id,
         unnest(generate_series(day, day + INTERVAL 6 DAY, INTERVAL 1 DAY))
           AS win_day
  FROM pairs)
SELECT win_day, count(DISTINCT user_id) AS active_7d
FROM contrib GROUP BY 1 ORDER BY win_day
"""


RETENTION_SQL = """
WITH days AS (
  SELECT DISTINCT user_id, date_trunc('day', CAST(ts AS TIMESTAMP)) AS day
  FROM events),
ret AS (
  SELECT a.day, count(*) AS returned_users
  FROM days a JOIN days b
    ON a.user_id = b.user_id AND b.day = a.day + INTERVAL 1 DAY
  GROUP BY a.day),
act AS (SELECT day, count(*) AS active_users FROM days GROUP BY day)
SELECT act.day, active_users,
       CAST(COALESCE(returned_users, 0) AS BIGINT) AS returned_users,
       CAST(COALESCE(returned_users, 0) AS DOUBLE) / active_users
         AS retention_rate
FROM act LEFT JOIN ret USING (day) ORDER BY day
"""


def events_hll_daily_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Daily distinct users via DataSketches HLL partials: one sketch
    per (hour), merged into days with ``hll_union_agg`` — the
    COUNT DISTINCT twin of the decomposable rollup above. At 100 TB
    this is the only shape that re-aggregates: exact distinct counts
    can't compose across buckets (a user active in two hours must not
    double-count), so a continuous aggregate must store mergeable
    sketches (~2.5 KB each at lgK=12, ±1.6% rel. error) instead of
    counts. Rows-only driver check (no SQL oracle can reproduce the
    sketch); tests pin the estimate against exact distinct and the
    union-of-hourly ≡ direct-daily merge property."""
    ev = load_table(spark, sf_dir, "events")
    hourly = ev.groupBy(
        F.date_trunc("hour", F.col("ts")).alias("hour")
    ).agg(F.hll_sketch_agg("user_id").alias("sk"))
    return (
        hourly.groupBy(F.date_trunc("day", F.col("hour")).alias("day"))
        .agg(F.hll_union_agg("sk").alias("sk"))
        .select("day", F.hll_sketch_estimate("sk").alias("approx_users"))
        .orderBy("day")
    )


def events_hll_daily_users_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXACT daily distinct users — the oracle-checked twin of
    ``events_hll_daily_users`` (same pattern as count-min's exact
    oracle, countmin.py): the sketch variant stays rows-only (its
    DataSketches binary has no SQL equivalent) while this row proves
    the day bucketing + distinct semantics end-to-end, and the pytest
    bound pins |sketch − exact| ≤ 2% per day between the two."""
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.groupBy(F.date_trunc("day", F.col("ts")).alias("day"))
        .agg(F.count_distinct("user_id").alias("n_users"))
        .orderBy("day")
    )


HLL_EXACT_SQL = """
SELECT date_trunc('day', CAST(ts AS TIMESTAMP)) AS day,
       count(DISTINCT user_id) AS n_users
FROM events GROUP BY 1 ORDER BY day
"""


def events_histogram_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mergeable-histogram quantile estimation — the third leg of the
    sketch triad (HLL = distincts, count-min = frequencies, fixed-bin
    histogram = quantiles). Per-HOUR (day, bin) counts are the
    mergeable partial; daily histograms are the SUM of their hours
    (the continuous-aggregate rollup shape), and p50/p95/p99 read off
    the cumulative histogram as the upper edge of the first bin whose
    cumulative count crosses q·total. Every step is deterministic
    relational algebra, so unlike t-digest sketches the estimate
    itself is FULLY oracle-checked — a green row proves the partials
    merge identically to a direct build (the oracle computes daily
    directly, never via hours).

    At 100 TB: the partial is O(days × bins) rows regardless of event
    count, pre-aggregated map-side; the quantile read is a window over
    that tiny table. Bin width trades accuracy for state like any
    fixed-size sketch (width 1.0 here ⇒ estimate ≤ 1.0 above truth)."""
    ev = load_table(spark, sf_dir, "events").filter(F.col("value").isNotNull())
    hourly = (
        ev.groupBy(
            F.date_trunc("hour", F.col("ts")).alias("hour"),
            F.date_trunc("day", F.col("ts")).alias("day"),
            F.floor(F.col("value")).cast("long").alias("bin"),
        ).agg(F.count(F.lit(1)).alias("c"))
    )
    daily = hourly.groupBy("day", "bin").agg(F.sum("c").alias("c"))
    wcum = W.partitionBy("day").orderBy("bin").rowsBetween(
        W.unboundedPreceding, W.currentRow
    )
    cum = daily.withColumn("cum", F.sum("c").over(wcum)).withColumn(
        "total", F.sum("c").over(W.partitionBy("day"))
    )

    def est(q: float):
        return F.min(
            F.when(F.col("cum") >= F.lit(q) * F.col("total"), F.col("bin") + 1)
        ).cast("double")

    return (
        cum.groupBy("day")
        .agg(
            F.max("total").alias("n_events"),
            est(0.5).alias("p50_est"),
            est(0.95).alias("p95_est"),
            est(0.99).alias("p99_est"),
        )
        .orderBy("day")
    )


HISTOGRAM_QUANTILES_SQL = """
WITH daily AS (
  SELECT date_trunc('day', CAST(ts AS TIMESTAMP)) AS day,
         CAST(floor(value) AS BIGINT) AS bin, count(*) AS c
  FROM events WHERE value IS NOT NULL GROUP BY 1, 2),
cum AS (
  SELECT day, bin, c,
         sum(c) OVER (PARTITION BY day ORDER BY bin
                      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum,
         sum(c) OVER (PARTITION BY day) AS total
  FROM daily)
SELECT day,
       CAST(max(total) AS BIGINT) AS n_events,
       CAST(min(CASE WHEN cum >= 0.5 * total THEN bin + 1 END) AS DOUBLE) AS p50_est,
       CAST(min(CASE WHEN cum >= 0.95 * total THEN bin + 1 END) AS DOUBLE) AS p95_est,
       CAST(min(CASE WHEN cum >= 0.99 * total THEN bin + 1 END) AS DOUBLE) AS p99_est
FROM cum GROUP BY day ORDER BY day
"""


def countmin_event_type_freq(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Count-min sketch frequency estimates for every event type
    (operators/countmin.py): build a 4x1024 counter table in one
    hash-only shuffle, then estimate each key distributed (broadcast
    join + min over depth counters). The oracle is the EXACT group
    count — count-min never undercounts, and at this key cardinality
    vs width the collision probability is ~0, so a green row certifies
    the sketch's exactness envelope end-to-end (bounds and merge laws
    are pytest-pinned in tests/test_operators.py)."""
    from data_lake_demo_spark.operators.countmin import (
        count_min_build,
        count_min_estimate,
    )

    ev = load_table(spark, sf_dir, "events")
    sketch = count_min_build(ev, "event_type")
    keys = ev.select("event_type").distinct()
    return count_min_estimate(sketch, keys, "event_type").orderBy("event_type")


COUNTMIN_FREQ_SQL = """
SELECT event_type, count(*) AS est FROM events GROUP BY event_type
ORDER BY event_type
"""


def events_hourly_anomalies(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Operational anomaly scoring: z-score of each (event_type, hour)
    count against that type's all-hours baseline. The variance is
    computed from INTEGER sums (n·Σx² − (Σx)² over n·(n−1)) so the
    aggregate is order-independent and the z-scores value-hash across
    engines; the alarm flag is |z| ≥ 2 (the reference's CloudWatch
    anomaly alarms re-expressed as a relational query,
    stack.py:322-351)."""
    ev = load_table(spark, sf_dir, "events")
    hourly = ev.groupBy(
        F.col("event_type"),
        F.date_trunc("hour", F.col("ts")).alias("hour"),
    ).agg(F.count(F.lit(1)).alias("n"))
    stats = hourly.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("nh"),
        F.sum("n").alias("sx"),
        F.sum(F.col("n") * F.col("n")).alias("sx2"),
    )
    nh, sx, sx2 = F.col("nh"), F.col("sx"), F.col("sx2")
    var = (nh.cast("double") * sx2 - (sx * sx).cast("double")) / (
        nh.cast("double") * (nh - 1).cast("double")
    )
    z = (F.col("n") - sx.cast("double") / nh.cast("double")) / F.sqrt(var)
    return (
        hourly.join(F.broadcast(stats), "event_type")
        .filter((nh > 1) & (nh.cast("double") * sx2 > (sx * sx).cast("double")))
        .select(
            "event_type",
            "hour",
            "n",
            quantize(z, 1_000_000).alias("z"),
            (F.abs(z) >= 2.0).alias("is_anomaly"),
        )
        .orderBy("event_type", "hour")
    )


ANOMALY_SQL = """
WITH hourly AS (
  SELECT event_type, date_trunc('hour', CAST(ts AS TIMESTAMP)) AS hour,
         count(*) AS n
  FROM events GROUP BY 1, 2),
stats AS (
  SELECT event_type, count(*) AS nh,
         CAST(sum(n) AS BIGINT) AS sx, CAST(sum(n * n) AS BIGINT) AS sx2
  FROM hourly GROUP BY 1)
SELECT event_type, hour, n,
       floor(((n - CAST(sx AS DOUBLE) / CAST(nh AS DOUBLE))
              / sqrt((CAST(nh AS DOUBLE) * sx2 - CAST(sx * sx AS DOUBLE))
                     / (CAST(nh AS DOUBLE) * CAST(nh - 1 AS DOUBLE))))
             * 1000000 + 0.5) / 1000000 AS z,
       abs((n - CAST(sx AS DOUBLE) / CAST(nh AS DOUBLE))
           / sqrt((CAST(nh AS DOUBLE) * sx2 - CAST(sx * sx AS DOUBLE))
                  / (CAST(nh AS DOUBLE) * CAST(nh - 1 AS DOUBLE)))) >= 2.0
         AS is_anomaly
FROM hourly JOIN stats USING (event_type)
WHERE nh > 1 AND CAST(nh AS DOUBLE) * sx2 > CAST(sx * sx AS DOUBLE)
ORDER BY event_type, hour
"""


def events_gap_fill(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-series gap fill + LOCF + linear interpolation (the
    TimescaleDB ``time_bucket_gapfill``/``locf``/``interpolate``
    family): hourly value sums for a sparse event slice (5% of users,
    two event types — sparse at every SF), densified to every hour of
    each type's span, with carry-forward and epoch-axis interpolation
    across the gaps. The grid explode is JVM-side ``sequence``; output
    is O(keys x span) small rows; bucket sums use the integer-quantized
    fold so values hash across engines."""
    ev = load_table(spark, sf_dir, "events").where(
        F.col("event_type").isin("purchase", "signup")
        & (F.col("user_id") % 20 == 0)
    )
    b = ev.groupBy(
        "event_type", F.date_trunc("hour", F.col("ts")).alias("bucket")
    ).agg(F.count(F.lit(1)).alias("n"), qsum(F.col("value"), "total_value"))
    filled = gap_fill(b, ["event_type"], "bucket", "total_value", step="1 hour")
    return filled.select(
        "event_type",
        "bucket",
        F.coalesce(F.col("n"), F.lit(0)).cast("bigint").alias("n"),
        F.col("is_gap").cast("int").alias("is_gap"),
        quantize(F.col("locf_total_value"), 1_000_000).alias("locf_value"),
        quantize(F.col("interp_total_value"), 1_000_000).alias("interp_value"),
    ).orderBy("event_type", "bucket")


GAP_FILL_SQL = f"""
WITH f AS (
  SELECT event_type, date_trunc('hour', CAST(ts AS TIMESTAMP)) AS bucket,
         count(*) AS n, {_sql_qsum('value', 'total_value')}
  FROM events
  WHERE event_type IN ('purchase', 'signup') AND user_id % 20 = 0
  GROUP BY 1, 2),
s AS (SELECT event_type, min(bucket) AS lo, max(bucket) AS hi
      FROM f GROUP BY 1),
g AS (SELECT event_type,
             unnest(generate_series(lo, hi, INTERVAL 1 HOUR)) AS bucket
      FROM s),
j AS (SELECT g.event_type, g.bucket, f.n, f.total_value
      FROM g LEFT JOIN f
        ON f.event_type = g.event_type AND f.bucket = g.bucket),
w AS (SELECT *,
  last_value(total_value IGNORE NULLS) OVER (
    PARTITION BY event_type ORDER BY bucket
    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS pv,
  last_value(CASE WHEN total_value IS NOT NULL THEN bucket END IGNORE NULLS)
    OVER (PARTITION BY event_type ORDER BY bucket
    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS pt,
  first_value(total_value IGNORE NULLS) OVER (
    PARTITION BY event_type ORDER BY bucket
    ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS nv,
  first_value(CASE WHEN total_value IS NOT NULL THEN bucket END IGNORE NULLS)
    OVER (PARTITION BY event_type ORDER BY bucket
    ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS nt
  FROM j)
SELECT event_type, bucket,
  CAST(coalesce(n, 0) AS BIGINT) AS n,
  CAST(total_value IS NULL AS INTEGER) AS is_gap,
  floor(pv * 1000000 + 0.5) / 1000000 AS locf_value,
  floor(CASE WHEN total_value IS NOT NULL THEN total_value
             WHEN nv IS NULL THEN pv
             ELSE pv + (nv - pv) * (epoch(bucket) - epoch(pt))
                               / (epoch(nt) - epoch(pt)) END
        * 1000000 + 0.5) / 1000000 AS interp_value
FROM w ORDER BY event_type, bucket
"""


def events_window_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ClickHouse-style windowFunnel (operators/timeseries.
    window_funnel): per user, the deepest view→click→purchase level
    reached with the whole chain inside a 6-hour window of its first
    step. The operator is a single groupBy(user) + codegen fold over
    the time-sorted step events (O(events) per user, one shuffle);
    the ORACLE spells the equivalent existential — k-way self-joins
    per level — which is the formulation that can't scale but
    perfectly specifies the semantics. A green row proves the
    max-chain-start greedy equals the existential on real data."""
    from data_lake_demo_spark.operators.timeseries import window_funnel

    ev = load_table(spark, sf_dir, "events")
    return (
        window_funnel(
            ev,
            user_col="user_id",
            ts_col="ts",
            event_col="event_type",
            steps=["view", "click", "purchase"],
            window_us=21_600_000_000,
        )
        .select(F.col("user").alias("user_id"), "funnel_level")
        .orderBy("user_id")
    )


WINDOW_FUNNEL_SQL = """
WITH e AS (
  SELECT user_id, epoch_us(CAST(ts AS TIMESTAMP)) AS us, event_type
  FROM events WHERE event_type IN ('view', 'click', 'purchase')),
lvl1 AS (SELECT DISTINCT user_id FROM e WHERE event_type = 'view'),
lvl2 AS (
  SELECT DISTINCT v.user_id
  FROM e v JOIN e c ON c.user_id = v.user_id
  WHERE v.event_type = 'view' AND c.event_type = 'click'
    AND c.us >= v.us AND c.us - v.us <= 21600000000),
lvl3 AS (
  SELECT DISTINCT v.user_id
  FROM e v
  JOIN e c ON c.user_id = v.user_id
  JOIN e p ON p.user_id = v.user_id
  WHERE v.event_type = 'view' AND c.event_type = 'click'
    AND p.event_type = 'purchase'
    AND c.us >= v.us AND p.us >= c.us AND p.us - v.us <= 21600000000),
u AS (SELECT DISTINCT user_id FROM e)
SELECT u.user_id,
       CASE WHEN l3.user_id IS NOT NULL THEN 3
            WHEN l2.user_id IS NOT NULL THEN 2
            WHEN l1.user_id IS NOT NULL THEN 1
            ELSE 0 END AS funnel_level
FROM u
LEFT JOIN lvl1 l1 ON l1.user_id = u.user_id
LEFT JOIN lvl2 l2 ON l2.user_id = u.user_id
LEFT JOIN lvl3 l3 ON l3.user_id = u.user_id
ORDER BY u.user_id
"""


def events_cusum_alarms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUSUM drift detection (operators/timeseries.cusum_alarms) over
    each event type's hourly value series: the sequential recursion
    S_t = max(0, S_{t-1} + x_t − μ − k) recast as prefix-sum minus
    running-min — one window, integer milli arithmetic, so the whole
    detector value-hashes. Alarms = hours where the statistic exceeds
    h (k and h in milli-units of the hourly sums)."""
    from data_lake_demo_spark.operators.timeseries import cusum_alarms

    ev = load_table(spark, sf_dir, "events")
    hourly = ev.groupBy(
        "event_type", F.date_trunc("hour", F.col("ts")).alias("hour")
    ).agg(
        (F.sum(F.floor(F.col("value") * 1000 + F.lit(0.5))) / 1000.0)
        .alias("hourly_value")
    )
    return cusum_alarms(
        hourly,
        ["event_type"],
        "hourly_value",
        "hour",
        drift_milli=2_000,
        threshold_milli=40_000,
    ).orderBy("event_type", "hour")


CUSUM_SQL = """
WITH h AS (
  SELECT event_type, date_trunc('hour', CAST(ts AS TIMESTAMP)) AS hour,
         sum(CAST(floor(value * 1000 + 0.5) AS BIGINT))
           / CAST(1000 AS DOUBLE) AS hourly_value
  FROM events GROUP BY 1, 2),
m AS (
  SELECT event_type, hour,
         CAST(floor(hourly_value * 1000 + 0.5) AS BIGINT) AS x_milli
  FROM h),
d AS (
  SELECT event_type, hour,
         x_milli
           - CAST(floor(avg(x_milli) OVER (PARTITION BY event_type) + 0.5)
                  AS BIGINT)
           - 2000 AS y
  FROM m),
p AS (
  SELECT event_type, hour,
         CAST(sum(y) OVER (PARTITION BY event_type ORDER BY hour) AS BIGINT)
           AS pf
  FROM d),
s AS (
  SELECT event_type, hour,
         pf - least(CAST(0 AS BIGINT),
                    min(pf) OVER (PARTITION BY event_type ORDER BY hour))
           AS cusum_milli
  FROM p)
SELECT event_type, hour, cusum_milli FROM s
WHERE cusum_milli > 40000 ORDER BY event_type, hour
"""


def events_lttb_downsample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LTTB downsampling (Steinarsson's largest-triangle-three-buckets,
    the dashboard/visualization standard) of each event type's hourly
    value series to 24 representative points, via the parallel
    neighbor-centroid variant in operators/timeseries.lttb_downsample.
    y is the INTEGER milli-unit hourly sum and x the hour index, so the
    triangle-area argmax is exact BIGINT arithmetic that value-hashes;
    the oracle replays the same election in SQL."""
    ev = load_table(spark, sf_dir, "events")
    hourly = ev.groupBy(
        "event_type", F.date_trunc("hour", F.col("ts")).alias("hour")
    ).agg(
        F.sum(F.floor(F.col("value") * 1000 + F.lit(0.5)))
        .cast("bigint")
        .alias("total_milli")
    )
    return lttb_downsample(
        hourly, ["event_type"], "hour", "total_milli", n_out=24,
        x_unit_seconds=3600,
    ).orderBy("event_type", "bkt")


LTTB_SQL = """
WITH h AS (
  SELECT event_type, date_trunc('hour', CAST(ts AS TIMESTAMP)) AS hour,
         CAST(sum(CAST(floor(value * 1000 + 0.5) AS BIGINT)) AS BIGINT) AS y
  FROM events GROUP BY 1, 2),
p AS (
  SELECT event_type, hour, y,
         row_number() OVER (PARTITION BY event_type ORDER BY hour) AS rn,
         count(*) OVER (PARTITION BY event_type) AS n,
         CAST(floor((CAST(epoch(hour) AS BIGINT)
                     - min(CAST(epoch(hour) AS BIGINT))
                         OVER (PARTITION BY event_type))
                    / CAST(3600 AS DOUBLE)) AS BIGINT) AS xi
  FROM h),
p2 AS (SELECT *, ((rn - 1) * 24) // n AS bkt FROM p),
b AS (SELECT event_type, bkt,
             CAST(sum(xi) AS BIGINT) AS sx, CAST(sum(y) AS BIGINT) AS sy,
             CAST(count(*) AS BIGINT) AS cnt
      FROM p2 GROUP BY 1, 2),
nbr AS (SELECT event_type, bkt,
               lag(sx) OVER w AS sxa, lag(sy) OVER w AS sya,
               lag(cnt) OVER w AS na,
               lead(sx) OVER w AS sxb, lead(sy) OVER w AS syb,
               lead(cnt) OVER w AS nb
        FROM b WINDOW w AS (PARTITION BY event_type ORDER BY bkt)),
j AS (SELECT p2.*, nbr.sxa, nbr.sya, nbr.na, nbr.sxb, nbr.syb, nbr.nb
      FROM p2 JOIN nbr USING (event_type, bkt)),
sc AS (SELECT *,
              abs((sxa - na * xi) * (syb - nb * y)
                  - (sxb - nb * xi) * (sya - na * y)) AS score
       FROM j),
pick AS (SELECT *, row_number() OVER (
           PARTITION BY event_type, bkt
           ORDER BY CASE WHEN bkt = 0 THEN rn
                         WHEN bkt = 23 THEN -rn
                         ELSE -coalesce(score, 0) END, rn) AS pk
         FROM sc)
SELECT event_type, CAST(bkt AS BIGINT) AS bkt, hour, y AS total_milli
FROM pick WHERE pk = 1 ORDER BY event_type, bkt
"""


def events_kmv_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Day-over-day retention from KMV (bottom-k) sketches
    (operators/kmv.py) — the sketch family HLL can't cover: KMV
    supports set INTERSECTION estimates via shared minima, so
    "how many of yesterday's users returned" is answered from two
    64-long sketches instead of a user-level self-join. The sketch
    build is the two-tier salted min-k (no per-day window funnel);
    estimates are single IEEE divisions on exactly-representable
    integers, so every value hashes across engines. Compare
    events_daily_retention (exact twin, user-level join)."""
    from data_lake_demo_spark.operators.kmv import (
        kmv_distinct_est,
        kmv_intersect_est,
        kmv_sketch,
    )

    K = 32
    ev = load_table(spark, sf_dir, "events").select(
        F.date_trunc("day", F.col("ts")).alias("day"), "user_id"
    )
    sk = kmv_sketch(ev, "user_id", ["day"], k=K)
    a, b = sk.alias("a"), sk.alias("b")
    return (
        a.join(b, F.expr("b.day = a.day + INTERVAL 1 DAY"))
        .select(
            F.col("a.day").alias("day"),
            kmv_distinct_est(F.col("a.kmv"), F.col("a.n_keys"), K).alias(
                "users_est"
            ),
            kmv_intersect_est(F.col("a.kmv"), F.col("b.kmv"), K).alias(
                "retained_est"
            ),
        )
        .orderBy("day")
    )


EVENTS_KMV_RETENTION_SQL = """
WITH h AS (
  SELECT DISTINCT date_trunc('day', CAST(ts AS TIMESTAMP)) AS day,
         CAST(('0x' || substr(md5(CAST(user_id AS VARCHAR))::VARCHAR, 1, 14)) AS BIGINT) AS h
  FROM events),
ranked AS (SELECT day, h, row_number() OVER (PARTITION BY day ORDER BY h) AS r FROM h),
sk AS (SELECT day, list_sort(list(h)) AS kmv, count(*) AS n_keys
       FROM ranked WHERE r <= 32 GROUP BY day),
pairs AS (
  SELECT a.day, a.kmv AS ka, a.n_keys AS na, b.kmv AS kb
  FROM sk a JOIN sk b ON b.day = a.day + INTERVAL 1 DAY),
est AS (
  SELECT day,
         CASE WHEN na < 32 THEN na
              ELSE floor(CAST(31 * 72057594037927936 AS DOUBLE) / ka[32])::BIGINT END AS users_est,
         list_sort(list_distinct(ka || kb)) AS u, ka, kb
  FROM pairs)
SELECT day, users_est,
       floor(
         len(list_filter(u[1:32], x -> list_contains(ka, x) AND list_contains(kb, x)))
         * (CASE WHEN len(u) >= 32
                 THEN CAST(31 * 72057594037927936 AS DOUBLE) / u[32]
                 ELSE CAST(len(u) AS DOUBLE) END)
         / least(len(u), 32))::BIGINT AS retained_est
FROM est ORDER BY day
"""


QUERIES = {
    "countmin_event_type_freq": countmin_event_type_freq,
    "events_gap_fill": events_gap_fill,
    "events_lttb_downsample": events_lttb_downsample,
    "events_window_funnel": events_window_funnel,
    "events_cusum_alarms": events_cusum_alarms,
    "events_hourly_anomalies": events_hourly_anomalies,
    "events_daily_retention": events_daily_retention,
    "events_kmv_retention": events_kmv_retention,
    "events_hll_daily_users": events_hll_daily_users,
    "events_hll_daily_users_exact": events_hll_daily_users_exact,
    "events_histogram_quantiles": events_histogram_quantiles,
    "events_rolling_7d_active": events_rolling_7d_active,
    "events_daily_from_hourly_rollup": events_daily_from_hourly_rollup,
    "events_tumbling_hourly": events_tumbling_hourly,
    "events_sliding_windows": events_sliding_windows,
    "events_sessionization": events_sessionization,
    "events_json_extract": events_json_extract,
    "events_daily_funnel": events_daily_funnel,
    "events_asof_last_view": events_asof_last_view,
    "events_scd2_point_in_time": events_scd2_point_in_time,
}

ORACLE = {
    "countmin_event_type_freq": COUNTMIN_FREQ_SQL,
    "events_gap_fill": GAP_FILL_SQL,
    "events_lttb_downsample": LTTB_SQL,
    "events_window_funnel": WINDOW_FUNNEL_SQL,
    "events_cusum_alarms": CUSUM_SQL,
    "events_hourly_anomalies": ANOMALY_SQL,
    "events_daily_retention": RETENTION_SQL,
    "events_kmv_retention": EVENTS_KMV_RETENTION_SQL,
    "events_hll_daily_users_exact": HLL_EXACT_SQL,
    "events_histogram_quantiles": HISTOGRAM_QUANTILES_SQL,
    "events_rolling_7d_active": ROLLING_7D_SQL,
    "events_daily_from_hourly_rollup": ROLLUP_COMPOSE_SQL,
    "events_tumbling_hourly": TUMBLING_SQL,
    "events_sliding_windows": SLIDING_SQL,
    "events_sessionization": SESSIONIZATION_SQL,
    "events_json_extract": JSON_EXTRACT_SQL,
    "events_daily_funnel": DAILY_FUNNEL_SQL,
    "events_asof_last_view": ASOF_SQL,
    "events_scd2_point_in_time": SCD2_PIT_SQL,
}

