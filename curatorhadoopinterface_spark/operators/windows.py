"""Window functions (SURVEY.md section 2C: win_rank, win_lag_lead,
win_running_sum, win_range_frame, topk_per_group).

Scale notes: every window here partitions by a real key (nation /
customer / user), never a global ORDER BY over the whole table — a
partitionless window would funnel 100 TB through one task. Order keys
always include a unique tiebreaker so ranks are deterministic across
engines and partition counts.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession, Window

from curatorhadoopinterface_spark.operators import query
from curatorhadoopinterface_spark.session import load_table


@query(
    "win_rank",
    oracle="""
    SELECT c_custkey,
           c_nationkey,
           ROW_NUMBER()  OVER w AS rn,
           RANK()        OVER w AS rnk,
           DENSE_RANK()  OVER w AS drnk,
           NTILE(4)      OVER w AS quartile
    FROM customer
    WINDOW w AS (PARTITION BY c_nationkey ORDER BY c_acctbal DESC, c_custkey)
    """,
)
def win_rank(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer")
    w = Window.partitionBy("c_nationkey").orderBy(F.col("c_acctbal").desc(), F.col("c_custkey"))
    return c.select(
        "c_custkey",
        "c_nationkey",
        F.row_number().over(w).alias("rn"),
        F.rank().over(w).alias("rnk"),
        F.dense_rank().over(w).alias("drnk"),
        F.ntile(4).over(w).alias("quartile"),
    )


@query(
    "win_lag_lead",
    oracle="""
    SELECT event_id,
           user_id,
           LAG(event_type)  OVER w AS prev_type,
           LEAD(event_type) OVER w AS next_type,
           ROUND(value - COALESCE(LAG(value) OVER w, 0.0), 2) AS delta
    FROM events
    WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    """,
)
def win_lag_lead(spark: SparkSession, sf_dir: str) -> DataFrame:
    # "next annotation stage" sequencing analogue (A11, JobHandler job
    # chaining) — per-key ordered neighbor access.
    e = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    return e.select(
        "event_id",
        "user_id",
        F.lag("event_type").over(w).alias("prev_type"),
        F.lead("event_type").over(w).alias("next_type"),
        F.round(F.col("value") - F.coalesce(F.lag("value").over(w), F.lit(0.0)), 2).alias("delta"),
    )


@query(
    "win_running_sum",
    oracle="""
    SELECT o_custkey,
           o_orderkey,
           ROUND(SUM(o_totalprice) OVER (
               PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 2) AS running_spend,
           COUNT(*) OVER (
               PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS order_seq
    FROM orders
    """,
)
def win_running_sum(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    w = (
        Window.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return o.select(
        "o_custkey",
        "o_orderkey",
        F.round(F.sum("o_totalprice").over(w), 2).alias("running_spend"),
        F.count(F.lit(1)).over(w).alias("order_seq"),
    )


@query(
    "win_range_frame",
    oracle="""
    SELECT event_id,
           ROUND(SUM(value) OVER (
               PARTITION BY user_id ORDER BY CAST(FLOOR(epoch(ts)) AS BIGINT)
               RANGE BETWEEN 600 PRECEDING AND CURRENT ROW), 2) AS sum_10min
    FROM events
    """,
)
def win_range_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    # value-range frame over the event-time axis (10-minute trailing
    # window) — the batch twin of the streaming sliding window.
    e = load_table(spark, sf_dir, "events").withColumn(
        "ts_sec", F.unix_timestamp("ts")
    )
    w = Window.partitionBy("user_id").orderBy("ts_sec").rangeBetween(-600, 0)
    return e.select(
        "event_id",
        F.round(F.sum("value").over(w), 2).alias("sum_10min"),
    )


@query(
    "topk_per_group",
    oracle="""
    SELECT * FROM (
        SELECT o_custkey, o_orderkey, o_totalprice,
               ROW_NUMBER() OVER (
                   PARTITION BY o_custkey
                   ORDER BY o_totalprice DESC, o_orderkey) AS rn
        FROM orders)
    WHERE rn <= 3
    """,
)
def topk_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    # first-10-words-preview analogue (RecordTools.java:211-228) — per-key
    # top-k. row_number + filter lets Spark push a per-partition top-k
    # (WindowGroupLimit) instead of a full sort.
    o = load_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey"))
    return (
        o.select("o_custkey", "o_orderkey", "o_totalprice", F.row_number().over(w).alias("rn"))
        .filter(F.col("rn") <= 3)
    )


@query(
    "sessionize_events",
    oracle="""
    WITH g AS (
        SELECT user_id, event_id, value, epoch_us(ts) AS ts_us,
               CASE WHEN LAG(epoch_us(ts)) OVER w IS NULL
                      OR epoch_us(ts) - LAG(epoch_us(ts)) OVER w > 28800000000
                    THEN 1 ELSE 0 END AS is_new
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ), s AS (
        SELECT *, CAST(SUM(is_new) OVER (
                    PARTITION BY user_id ORDER BY ts_us, event_id
                    ROWS UNBOUNDED PRECEDING) AS BIGINT) AS session_id
        FROM g
    )
    SELECT user_id, session_id,
           COUNT(*) AS n_events,
           ROUND(SUM(value), 2) AS sum_value,
           (MAX(ts_us) - MIN(ts_us)) // 1000000 AS dur_sec
    FROM s GROUP BY user_id, session_id
    """,
)
def sessionize_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch sessionization (gaps-and-islands): an 8-hour silence starts
    a new session; one summary row per (user, session). The batch twin
    of ``stream_session`` (F.session_window) and the classic training-
    data-pipeline op for behavioral corpora.

    Scale shape: ONE shuffle on user_id feeds both window passes and the
    final aggregate (same partitioning key reused across stages); the
    micros arithmetic stays integer, JVM-side, inside whole-stage
    codegen. Skewed users would be the only hazard — AQE skew handling
    applies because it is a plain hash partition on the group key.
    """
    e = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    ts_us = F.unix_micros(F.col("ts"))
    gap = ts_us - F.unix_micros(F.lag("ts").over(w))
    is_new = F.when(gap.isNull() | (gap > 28_800_000_000), 1).otherwise(0)
    sess = (
        e.select("user_id", "event_id", "value", "ts", ts_us.alias("ts_us"), is_new.alias("is_new"))
        .select(
            "user_id",
            "event_id",
            "value",
            "ts_us",
            # second window keeps the FIRST window's exact sort keys
            # (ts, event_id — ts_us is order-equivalent but Spark can't
            # know that), so one Sort serves both window passes
            F.sum("is_new")
            .over(
                Window.partitionBy("user_id")
                .orderBy("ts", "event_id")
                .rowsBetween(Window.unboundedPreceding, Window.currentRow)
            )
            .cast("long")
            .alias("session_id"),
        )
    )
    return sess.groupBy("user_id", "session_id").agg(
        F.count("*").alias("n_events"),
        F.round(F.sum("value"), 2).alias("sum_value"),
        F.expr("(MAX(ts_us) - MIN(ts_us)) div 1000000").alias("dur_sec"),
    )


@query(
    "ts_spine_fill",
    oracle="""
    WITH e AS (
        SELECT user_id, DATE_TRUNC('hour', ts) AS h FROM events),
    bounds AS (
        SELECT user_id, MIN(h) AS h0, MAX(h) AS h1 FROM e GROUP BY user_id),
    spine AS (
        SELECT user_id, UNNEST(GENERATE_SERIES(h0, h1, INTERVAL 1 HOUR)) AS h
        FROM bounds),
    cnt AS (
        SELECT user_id, h, COUNT(*) AS n FROM e GROUP BY user_id, h),
    filled AS (
        SELECT s.user_id, s.h, COALESCE(c.n, 0) AS n
        FROM spine s LEFT JOIN cnt c ON c.user_id = s.user_id AND c.h = s.h),
    marked AS (
        SELECT user_id, n,
               ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY h)
             - ROW_NUMBER() OVER (PARTITION BY user_id, n = 0 ORDER BY h) AS grp
        FROM filled),
    gaps AS (
        SELECT user_id, COUNT(*) AS gap_len
        FROM marked WHERE n = 0 GROUP BY user_id, grp),
    agg AS (
        SELECT user_id,
               COUNT(*) AS total_hours,
               SUM(CASE WHEN n > 0 THEN 1 ELSE 0 END) AS active_hours
        FROM filled GROUP BY user_id)
    SELECT a.user_id, a.total_hours, a.active_hours,
           COALESCE(g.longest, 0) AS longest_gap_hours
    FROM agg a
    LEFT JOIN (SELECT user_id, MAX(gap_len) AS longest
               FROM gaps GROUP BY user_id) g
      ON g.user_id = a.user_id
    """,
)
def ts_spine_fill(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-spine densification: per user, materialize EVERY hour
    between their first and last event (`sequence` generates the spine
    array-locally — no cross join against a calendar table), left-join
    the real hourly counts, zero-fill, then run gaps-and-islands over
    the dense series to find the longest inactive streak. Gap-filling
    is the step every time-series feature pipeline needs and naive SQL
    gets wrong (aggregating raw events can't see hours with NO rows).

    Scale shape: the spine explodes from per-user bounds (2 timestamps
    per user), so its pre-explode input is tiny; the left join and both
    window passes share the user_id hash partitioning, and all three
    window/group steps run on the SAME exchange. Spine width is bounded
    by the retention window (720 rows/user/month), not event volume —
    at 100 TB of events the filled series is usually SMALLER than the
    raw table. The compact (user_id, hour) projection is repartitioned
    by user_id ONCE up front: both aggregates, the spine join, and both
    window passes are clustered on user_id (subset co-partitioning), so
    the only other shuffles are the runtime-reused copy of that same
    exchange (AQE ReusedExchange) on the second branch."""
    e = load_table(spark, sf_dir, "events").select(
        "user_id", F.date_trunc("hour", "ts").alias("h")
    ).repartition("user_id")
    bounds = e.groupBy("user_id").agg(F.min("h").alias("h0"), F.max("h").alias("h1"))
    spine = bounds.select(
        "user_id",
        F.explode(F.expr("sequence(h0, h1, interval 1 hour)")).alias("h"),
    )
    cnt = e.groupBy("user_id", "h").agg(F.count(F.lit(1)).alias("n"))
    filled = spine.join(cnt, ["user_id", "h"], "left").select(
        "user_id", "h", F.coalesce("n", F.lit(0)).alias("n")
    )
    rn_all = F.row_number().over(Window.partitionBy("user_id").orderBy("h"))
    rn_state = F.row_number().over(
        Window.partitionBy("user_id", F.col("n") == 0).orderBy("h")
    )
    marked = filled.select("user_id", "n", (rn_all - rn_state).alias("grp"))
    gaps = (
        marked.filter(F.col("n") == 0)
        .groupBy("user_id", "grp")
        .agg(F.count(F.lit(1)).alias("gap_len"))
    )
    longest = gaps.groupBy("user_id").agg(F.max("gap_len").alias("longest"))
    agg = filled.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("total_hours"),
        F.sum((F.col("n") > 0).cast("long")).alias("active_hours"),
    )
    return agg.join(longest, "user_id", "left").select(
        "user_id",
        "total_hours",
        "active_hours",
        F.coalesce("longest", F.lit(0).cast("long")).alias("longest_gap_hours"),
    )


@query(
    "win_time_range",
    oracle="""
    SELECT event_id, user_id, ts,
           ROUND(SUM(value) OVER (
               PARTITION BY user_id ORDER BY ts
               RANGE BETWEEN INTERVAL 1 HOUR PRECEDING AND CURRENT ROW), 4)
               AS hour_sum,
           COUNT(*) OVER (
               PARTITION BY user_id ORDER BY ts
               RANGE BETWEEN INTERVAL 1 HOUR PRECEDING AND CURRENT ROW)
               AS hour_events
    FROM events
    """,
)
def win_time_range(spark: SparkSession, sf_dir: str) -> DataFrame:
    """True time-INTERVAL range frame: each event's trailing-hour sum and
    count per user — the moving-window metric expressed on the event
    clock itself (win_range_frame's epoch-seconds cast is the portable
    fallback; this is the native interval-frame form, same physical
    plan: one user_id exchange + one in-partition sort serving both
    window functions).

    Frames are value-based, so ties in ts fall in the same frame for
    every peer row — deterministic regardless of sort stability, which
    is why no tiebreak column is needed (a ROWS frame would need one).
    """
    e = load_table(spark, sf_dir, "events")
    e.createOrReplaceTempView("__events_wtr")
    return spark.sql(
        """
        SELECT event_id, user_id, ts,
               ROUND(SUM(value) OVER (
                   PARTITION BY user_id ORDER BY ts
                   RANGE BETWEEN INTERVAL 1 HOUR PRECEDING AND CURRENT ROW), 4)
                   AS hour_sum,
               COUNT(*) OVER (
                   PARTITION BY user_id ORDER BY ts
                   RANGE BETWEEN INTERVAL 1 HOUR PRECEDING AND CURRENT ROW)
                   AS hour_events
        FROM __events_wtr
        """
    )


@query(
    "win_activity_streaks",
    oracle="""
    WITH days AS (
        SELECT DISTINCT user_id, CAST(ts AS DATE) AS d FROM events),
    grouped AS (
        SELECT user_id, d,
               d - CAST(ROW_NUMBER() OVER (
                   PARTITION BY user_id ORDER BY d) AS INTEGER) AS grp
        FROM days),
    streaks AS (
        SELECT user_id, COUNT(*) AS len, MIN(d) AS streak_start
        FROM grouped GROUP BY user_id, grp)
    SELECT user_id,
           MAX(len) AS longest_streak,
           COUNT(*) AS n_streaks,
           MIN(streak_start) AS first_active
    FROM streaks GROUP BY user_id
    """,
)
def win_activity_streaks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Longest consecutive-day activity streak per user — the date-minus-
    row_number trick: consecutive dates share (d - rank), so streaks
    fall out of a plain group-by with no self-join and no iteration
    (the gaps-and-islands identity sessionize_events applies to time
    gaps, here applied to the calendar).

    Scale shape: one distinct pass collapses events to (user, day) —
    partial-aggregated, typically 100-1000x smaller than the event
    stream — then ONE user_id sort exchange serves the ranking window
    and both group-bys.
    """
    e = load_table(spark, sf_dir, "events")
    days = e.select("user_id", F.to_date("ts").alias("d")).distinct()
    w = Window.partitionBy("user_id").orderBy("d")
    grouped = days.withColumn(
        "grp", F.date_sub(F.col("d"), F.row_number().over(w))
    )
    streaks = grouped.groupBy("user_id", "grp").agg(
        F.count(F.lit(1)).alias("len"), F.min("d").alias("streak_start")
    )
    return streaks.groupBy("user_id").agg(
        F.max("len").alias("longest_streak"),
        F.count(F.lit(1)).alias("n_streaks"),
        F.min("streak_start").alias("first_active"),
    )


@query(
    "ts_resample_ohlc",
    oracle="""
    WITH ranked AS (
        SELECT event_type, DATE_TRUNC('hour', ts) AS bar_hour, value,
               ROW_NUMBER() OVER (
                   PARTITION BY event_type, DATE_TRUNC('hour', ts)
                   ORDER BY ts, event_id) AS rn_a,
               ROW_NUMBER() OVER (
                   PARTITION BY event_type, DATE_TRUNC('hour', ts)
                   ORDER BY ts DESC, event_id DESC) AS rn_d
        FROM events)
    SELECT event_type, bar_hour,
           MAX(CASE WHEN rn_a = 1 THEN value END) AS open,
           MAX(value)                             AS high,
           MIN(value)                             AS low,
           MAX(CASE WHEN rn_d = 1 THEN value END) AS close,
           COUNT(*)                               AS n_events,
           CAST(ROUND(SUM(CAST(value AS DECIMAL(18,2))), 2) AS DOUBLE)
                                                  AS volume
    FROM ranked GROUP BY event_type, bar_hour
    """,
)
def ts_resample_ohlc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-series downsampling to hourly OHLC bars: per (event_type,
    hour) emit the first/highest/lowest/last value plus count and exact
    volume — the resample step every metrics/feature pipeline runs to
    turn raw event streams into fixed-frequency training series.

    Determinism: open/close come from ROW_NUMBER over (ts, event_id)
    (event_id is unique, so ties are impossible); high/low are MIN/MAX
    over per-row doubles (order-safe); volume sums as DECIMAL(18,2)
    (house money rule), rounded before the double cast.

    Plan shape: both rank windows and the final group-by share the
    (event_type, hour) hash partitioning — ONE shuffle of a 4-column
    projection serves all three; the two intra-partition sort orders
    are local sorts, not exchanges. Output cardinality is bounded by
    |types| x |hours in retention| — independent of event volume, so at
    100 TB the bars table stays tiny while the scan parallelizes freely.
    """
    e = load_table(spark, sf_dir, "events").select(
        "event_type",
        F.date_trunc("hour", "ts").alias("bar_hour"),
        "ts",
        "event_id",
        "value",
    )
    wa = Window.partitionBy("event_type", "bar_hour").orderBy("ts", "event_id")
    wd = Window.partitionBy("event_type", "bar_hour").orderBy(
        F.desc("ts"), F.desc("event_id")
    )
    ranked = e.select(
        "event_type",
        "bar_hour",
        "value",
        F.row_number().over(wa).alias("rn_a"),
        F.row_number().over(wd).alias("rn_d"),
    )
    return ranked.groupBy("event_type", "bar_hour").agg(
        F.max(F.when(F.col("rn_a") == 1, F.col("value"))).alias("open"),
        F.max("value").alias("high"),
        F.min("value").alias("low"),
        F.max(F.when(F.col("rn_d") == 1, F.col("value"))).alias("close"),
        F.count(F.lit(1)).alias("n_events"),
        F.round(F.sum(F.col("value").cast("decimal(18,2)")), 2)
        .cast("double")
        .alias("volume"),
    )


ATTR_WINDOW_HOURS = 72


@query(
    "attribution_last_touch",
    oracle=f"""
    WITH ordered AS (
        SELECT user_id, ts, event_id, event_type, value,
               LAST_VALUE(CASE WHEN event_type IN ('click','view','signup')
                               THEN event_type END IGNORE NULLS) OVER w
                   AS last_touch_type,
               LAST_VALUE(CASE WHEN event_type IN ('click','view','signup')
                               THEN ts END IGNORE NULLS) OVER w
                   AS last_touch_ts
        FROM events
        WHERE event_type <> 'error'
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
                     ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING))
    SELECT COALESCE(CASE WHEN last_touch_ts >=
                              ts - INTERVAL {ATTR_WINDOW_HOURS} HOUR
                         THEN last_touch_type END, 'organic') AS touch_type,
           COUNT(*) AS n_purchases,
           CAST(ROUND(SUM(CAST(value AS DECIMAL(18,2))), 2) AS DOUBLE)
               AS attributed_value
    FROM ordered
    WHERE event_type = 'purchase'
    GROUP BY 1
    """,
)
def attribution_last_touch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Last-touch attribution: each purchase credits the user's most
    recent PRIOR touch event (click/view/signup) within {ATTR_WINDOW_HOURS}
    hours, else 'organic' — the revenue-attribution rollup every event
    pipeline feeds back to acquisition.

    The as-of semantics use the union-sort shape (join_asof precedent):
    ONE (user_id)-partitioned window pass carries the last non-null
    touch forward — no purchases-x-touches self-join, so cost is one
    sort of the filtered events, not quadratic in per-user activity.
    'Prior' is strict (ROWS ... 1 PRECEDING) under the total
    (ts, event_id) order, so a touch sharing a purchase's timestamp
    attributes deterministically in both engines.

    Exactness: attributed revenue sums as DECIMAL(18,2) (house money
    rule), rounded before the double cast; the recency gate is an exact
    timestamp-interval compare (micros). The error-event filter pushes
    to the scan; the final census is a tiny second aggregate.
    """
    e = load_table(spark, sf_dir, "events").filter(
        F.col("event_type") != "error"
    )
    is_touch = F.col("event_type").isin("click", "view", "signup")
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    ordered = e.select(
        "event_type",
        "ts",
        "value",
        F.last(F.when(is_touch, F.col("event_type")), ignorenulls=True)
        .over(w)
        .alias("last_touch_type"),
        F.last(F.when(is_touch, F.col("ts")), ignorenulls=True)
        .over(w)
        .alias("last_touch_ts"),
    )
    return (
        ordered.filter(F.col("event_type") == "purchase")
        .select(
            F.coalesce(
                F.when(
                    F.col("last_touch_ts")
                    >= F.col("ts") - F.expr(f"INTERVAL {ATTR_WINDOW_HOURS} HOURS"),
                    F.col("last_touch_type"),
                ),
                F.lit("organic"),
            ).alias("touch_type"),
            "value",
        )
        .groupBy("touch_type")
        .agg(
            F.count(F.lit(1)).alias("n_purchases"),
            F.round(F.sum(F.col("value").cast("decimal(18,2)")), 2)
            .cast("double")
            .alias("attributed_value"),
        )
    )


# -- telemetry duplicate suppression (debounce) census ------------------------

DEBOUNCE_US = 60_000_000  # two same-key events within 60s = retransmit


@query(
    "events_dedup_window",
    oracle=f"""
    WITH g AS (
        SELECT event_type, value,
               CASE WHEN epoch_us(ts) - LAG(epoch_us(ts)) OVER w
                         <= {DEBOUNCE_US}
                    THEN 1 ELSE 0 END AS suppressed
        FROM events
        WINDOW w AS (PARTITION BY user_id, event_type ORDER BY ts, event_id))
    SELECT event_type,
           COUNT(*) AS n_events,
           SUM(suppressed) AS n_suppressed,
           COUNT(*) - SUM(suppressed) AS n_kept,
           CAST(ROUND(SUM(CASE WHEN suppressed = 0
                               THEN CAST(value AS DECIMAL(18,2))
                               ELSE CAST(0 AS DECIMAL(18,2)) END), 2)
                AS DOUBLE) AS kept_value
    FROM g GROUP BY event_type ORDER BY event_type
    """,
)
def events_dedup_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Telemetry retransmit suppression (debounce): an event within 60s
    of the PREVIOUS event of the same (user, type) key is a duplicate —
    the at-least-once-delivery cleanup pass every event pipeline runs
    before metrics (the batch twin of stream_dedup's watermark
    semantics, with an explicit census instead of a dropped-row dump).

    Scale shape: ONE shuffle on (user_id, event_type) feeds the lag
    window; the census regroups by type (5 groups). The gap test is
    integer micros (epoch_us both sides); the kept-value sum is exact
    DECIMAL rounded before the double cast (house money rule — a 2dp
    double-sum round flips cents at 100x).
    """
    e = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id", "event_type").orderBy("ts", "event_id")
    gap = F.unix_micros(F.col("ts")) - F.unix_micros(F.lag("ts").over(w))
    g = e.select(
        "event_type",
        "value",
        F.when(gap <= DEBOUNCE_US, 1).otherwise(0).alias("suppressed"),
    )
    zero = F.lit(0).cast("decimal(18,2)")
    return (
        g.groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum("suppressed").alias("n_suppressed"),
            (F.count(F.lit(1)) - F.sum("suppressed")).alias("n_kept"),
            F.round(
                F.sum(
                    F.when(
                        F.col("suppressed") == 0,
                        F.col("value").cast("decimal(18,2)"),
                    ).otherwise(zero)
                ),
                2,
            )
            .cast("double")
            .alias("kept_value"),
        )
        .orderBy("event_type")
    )


# -- time-series gap census (availability monitor) ----------------------------

GAP_OVER_US = 600_000_000  # a silence > 10 min counts as an outage gap
_GAP_BUCKET_US = 3_600_000_000  # 1-hour shards for the two-level plan


@query(
    "ts_gap_census",
    oracle=f"""
    WITH g AS (
        SELECT event_type,
               epoch_us(ts) - LAG(epoch_us(ts)) OVER (
                   PARTITION BY event_type ORDER BY ts, event_id) AS gap_us
        FROM events)
    SELECT event_type,
           COUNT(*) + 1 AS n_events,
           SUM(CASE WHEN gap_us > {GAP_OVER_US} THEN 1 ELSE 0 END)
               AS n_gaps_over,
           MAX(gap_us) AS max_gap_us
    FROM g WHERE gap_us IS NOT NULL
    GROUP BY event_type ORDER BY event_type
    """,
)
def ts_gap_census(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-stream silence/outage census: for every event type, how many
    inter-event gaps exceed 10 minutes and the longest silence — the
    data-freshness monitor a feed pipeline alarms on.

    Scale-first decomposition (the reason this is NOT one global window
    per type): a window partitioned by event_type alone puts an entire
    stream's history in ONE task — the classic low-cardinality-window
    trap. Instead, adjacent-pair gaps split exactly into (a) intra-shard
    gaps inside 1-hour buckets — a window over (type, hour), millions of
    bounded partitions — and (b) boundary gaps between consecutive
    non-empty shards, a lag over the per-shard min/max SUMMARY table
    (|types| x |hours| rows). The union is precisely the global window's
    gap multiset, at any scale, with no unbounded partition anywhere.
    The oracle replays the single-window form — same multiset, so the
    equivalence is value-checked, not asserted. All arithmetic is
    integer micros."""
    e = load_table(spark, sf_dir, "events")
    ts_us = F.unix_micros(F.col("ts"))
    base = e.select(
        "event_type",
        "event_id",
        ts_us.alias("ts_us"),
        (ts_us.cast("bigint") - (ts_us.cast("bigint") % _GAP_BUCKET_US)).alias(
            "bucket"
        ),
    )
    w_in = Window.partitionBy("event_type", "bucket").orderBy(
        "ts_us", "event_id"
    )
    intra = base.select(
        "event_type",
        (F.col("ts_us") - F.lag("ts_us").over(w_in)).alias("gap_us"),
    ).filter(F.col("gap_us").isNotNull())
    shard = base.groupBy("event_type", "bucket").agg(
        F.min("ts_us").alias("bmin"), F.max("ts_us").alias("bmax")
    )
    w_b = Window.partitionBy("event_type").orderBy("bucket")
    boundary = shard.select(
        "event_type",
        (F.col("bmin") - F.lag("bmax").over(w_b)).alias("gap_us"),
    ).filter(F.col("gap_us").isNotNull())
    gaps = intra.unionByName(boundary)
    return (
        gaps.groupBy("event_type")
        .agg(
            (F.count(F.lit(1)) + 1).alias("n_events"),
            F.sum(
                F.when(F.col("gap_us") > GAP_OVER_US, 1).otherwise(0)
            ).alias("n_gaps_over"),
            F.max("gap_us").alias("max_gap_us"),
        )
        .orderBy("event_type")
    )


_DECAY_MAX_SHIFT = 40  # cents >> 40 is always 0 at these magnitudes
_DECAY_TOP = 15


@query(
    "score_time_decay",
    oracle=f"""
    WITH anchor AS (SELECT MAX(o_orderdate) AS mx FROM orders),
    scored AS (
        SELECT o.o_custkey,
               CAST(FLOOR(o.o_totalprice * 100 + 0.5) AS BIGINT)
               // (CAST(1 AS BIGINT) <<
                   CAST(LEAST(DATE_DIFF('day', CAST(o.o_orderdate AS DATE),
                                        CAST(a.mx AS DATE)) // 7,
                              {_DECAY_MAX_SHIFT}) AS INT)) AS decayed,
               o.o_orderdate
        FROM orders o CROSS JOIN anchor a)
    SELECT o_custkey,
           COUNT(*) AS n_orders,
           SUM(decayed) AS decayed_cents,
           MAX(o_orderdate) AS last_order
    FROM scored
    GROUP BY o_custkey
    ORDER BY decayed_cents DESC, o_custkey
    LIMIT {_DECAY_TOP}
    """,
)
def score_time_decay(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TIME-DECAYED customer scoring with exact halving weights: each
    order contributes its revenue halved once per week of age (anchor
    = the corpus' newest order date), so the score is a recency-
    weighted lifetime value — the feature-engineering staple behind
    churn/propensity models, in the exact-integer idiom: cents >>
    weeks is a floor-division by a power of two, bit-identical in
    both engines, no float decay factor to drift (the ts_ewma
    discipline applied per-entity instead of per-day).

    Scale shape: the anchor is a 1-row broadcast; decay is a per-row
    scalar; the per-customer rollup partial-aggregates before its
    exchange and the top-15 is a TakeOrdered — no global sort, no
    window over the corpus. At 100 TB the decay shift also acts as a
    natural sparsifier: rows older than ~40 half-lives contribute
    exactly 0 and can be pruned at scan time with a date predicate."""
    o = load_table(spark, sf_dir, "orders")
    anchor = o.agg(F.max("o_orderdate").alias("mx"))
    scored = o.join(F.broadcast(anchor)).select(
        "o_custkey",
        "o_orderdate",
        F.expr(
            f"cast(floor(o_totalprice * 100 + 0.5) as bigint)"
            f" div shiftleft(1L, cast(least("
            f"datediff(cast(mx as date), cast(o_orderdate as date)) div 7,"
            f" {_DECAY_MAX_SHIFT}) as int))"
        ).alias("decayed"),
    )
    return (
        scored.groupBy("o_custkey")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.sum("decayed").alias("decayed_cents"),
            F.max("o_orderdate").alias("last_order"),
        )
        .orderBy(F.desc("decayed_cents"), F.asc("o_custkey"))
        .limit(_DECAY_TOP)
    )


# --------------------------------------------------------------------------
# attribution_position: U-shaped (40/20/40) multi-touch attribution
# --------------------------------------------------------------------------
@query(
    "attribution_position",
    oracle="""
    WITH base AS (
        SELECT user_id, ts, event_id, event_type,
               CAST(FLOOR(value * 100 + 0.5) AS BIGINT) AS cents
        FROM events
        WHERE event_type IN ('click', 'view', 'signup', 'purchase')),
    j AS (
        SELECT *, COUNT(CASE WHEN event_type = 'purchase' THEN 1 END)
               OVER (PARTITION BY user_id ORDER BY ts, event_id
                     ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
                   AS journey
        FROM base),
    t AS (
        SELECT user_id, journey, event_type,
               ROW_NUMBER() OVER (PARTITION BY user_id, journey
                                  ORDER BY ts, event_id) AS rn,
               COUNT(*) OVER (PARTITION BY user_id, journey) AS n
        FROM j WHERE event_type <> 'purchase'),
    p AS (
        SELECT user_id, journey, cents FROM j
        WHERE event_type = 'purchase'),
    credit AS (
        SELECT t.event_type AS touch_type,
               CASE WHEN t.n = 1 THEN 1000
                    WHEN t.n = 2 THEN 500
                    WHEN t.rn = 1 THEN 400
                    WHEN t.rn = t.n THEN 400 + 200 % (t.n - 2)
                    ELSE 200 // (t.n - 2) END AS permille,
               p.cents
        FROM t JOIN p ON t.user_id = p.user_id AND t.journey = p.journey),
    org AS (
        SELECT 'organic' AS touch_type, 1000 AS permille, p.cents
        FROM p LEFT JOIN (SELECT DISTINCT user_id, journey FROM t) tt
          ON p.user_id = tt.user_id AND p.journey = tt.journey
        WHERE tt.user_id IS NULL)
    SELECT touch_type, COUNT(*) AS n_credits,
           SUM(cents * permille // 1000) AS credited_cents
    FROM (SELECT * FROM credit UNION ALL SELECT * FROM org)
    GROUP BY touch_type ORDER BY touch_type
    """,
)
def attribution_position(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Position-based (U-shaped) multi-touch attribution — the rung
    above attribution_last_touch: each purchase's credit splits 40%
    to the journey's FIRST touch, 40% to the LAST, and 20% shared
    equally across the middle (1 touch -> 100%, 2 -> 50/50). A
    'journey' is the run of touch events since the user's previous
    purchase (the standard conversion-journey reset), so every touch
    is credited at most once and unconverted trailing journeys earn
    nothing; touchless purchases report as 'organic'.

    Exactness: credits are integer per-mille with the middle-share
    remainder (200 mod (n-2)) pinned to the LAST touch — fully
    deterministic in both engines, no float splits; money is integer
    cents, credited as cents*permille div 1000 per touch.

    Scale shape: ONE (user_id) exchange feeds the journey-numbering
    window, the per-journey position window, and the touches-to-
    purchase equi-join (all co-partitioned on the user key); the
    census is a |touch types|-row partial-agged rollup. No
    purchases-x-touches cross product at any activity level."""
    e = load_table(spark, sf_dir, "events").filter(
        F.col("event_type").isin("click", "view", "signup", "purchase")
    )
    base = e.select(
        "user_id",
        "ts",
        "event_id",
        "event_type",
        F.floor(F.col("value") * 100 + 0.5).cast("bigint").alias("cents"),
    )
    wj = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    j = base.withColumn(
        "journey",
        F.count(
            F.when(F.col("event_type") == "purchase", F.lit(1))
        ).over(wj),
    )
    wt = Window.partitionBy("user_id", "journey").orderBy("ts", "event_id")
    wn = Window.partitionBy("user_id", "journey")
    t = (
        j.filter(F.col("event_type") != "purchase")
        .select(
            "user_id",
            "journey",
            "event_type",
            F.row_number().over(wt).alias("rn"),
            F.count(F.lit(1)).over(wn).alias("n"),
        )
    )
    p = j.filter(F.col("event_type") == "purchase").select(
        "user_id", "journey", "cents"
    )
    credit = (
        t.join(p, ["user_id", "journey"])
        .select(
            F.col("event_type").alias("touch_type"),
            F.expr(
                "case when n = 1 then 1000"
                " when n = 2 then 500"
                " when rn = 1 then 400"
                " when rn = n then 400 + 200 % (n - 2)"
                " else 200 div (n - 2) end"
            ).alias("permille"),
            "cents",
        )
    )
    org = (
        p.join(t.select("user_id", "journey").distinct(),
               ["user_id", "journey"], "left_anti")
        .select(
            F.lit("organic").alias("touch_type"),
            F.lit(1000).alias("permille"),
            "cents",
        )
    )
    return (
        credit.unionByName(org)
        .groupBy("touch_type")
        .agg(
            F.count(F.lit(1)).alias("n_credits"),
            F.sum(F.expr("cents * permille div 1000")).alias(
                "credited_cents"
            ),
        )
        .orderBy("touch_type")
    )
