"""Streaming operator tests (SURVEY.md section 2C streaming rows).

Semantics checks at sf0.001: each streaming query's drained result must
equal the equivalent batch computation run in the same Spark session —
the in-process analogue of the driver's DuckDB oracle, proving the
micro-batch + state-store path computes the same answer as the batch
plan (the reference's verifyRecords pattern, CuratorClient.java:660-853).
"""

from __future__ import annotations

import pyspark.sql.functions as F


def _canon(df):
    return sorted(tuple(r) for r in df.collect())


def test_stream_window_agg_matches_batch(spark, sf_dir):
    from curatorhadoopinterface_spark.session import load_table
    from curatorhadoopinterface_spark.streaming.ops import stream_window_agg

    got = stream_window_agg(spark, sf_dir)
    ev = load_table(spark, sf_dir, "events")
    want = ev.groupBy(
        F.date_trunc("hour", "ts").alias("win_start"), "event_type"
    ).agg(F.count("*").alias("n"), F.round(F.sum("value"), 4).alias("total"))
    assert _canon(got) == _canon(want)


def test_stream_session_matches_islands(spark, sf_dir):
    from curatorhadoopinterface_spark.session import load_table
    from curatorhadoopinterface_spark.streaming.ops import stream_session

    got = stream_session(spark, sf_dir)
    ev = load_table(spark, sf_dir, "events")
    ev.createOrReplaceTempView("ev_sess_batch")
    want = spark.sql(
        """
        WITH o AS (
            SELECT user_id, ts, value,
                   CASE WHEN LAG(ts) OVER w IS NULL
                             OR ts > LAG(ts) OVER w + INTERVAL 30 MINUTES
                        THEN 1 ELSE 0 END AS new_s
            FROM ev_sess_batch
            WINDOW w AS (PARTITION BY user_id ORDER BY ts)),
        s AS (SELECT *, SUM(new_s) OVER (PARTITION BY user_id ORDER BY ts) AS sid
              FROM o)
        SELECT user_id, MIN(ts) AS session_start,
               MAX(ts) + INTERVAL 30 MINUTES AS session_end,
               COUNT(*) AS n_events, ROUND(SUM(value), 4) AS total_value
        FROM s GROUP BY user_id, sid
        """
    )
    assert _canon(got) == _canon(want)


def test_stream_watermark_emits_only_closed_windows(spark, sf_dir):
    from curatorhadoopinterface_spark.session import load_table
    from curatorhadoopinterface_spark.streaming.ops import stream_watermark

    got = stream_watermark(spark, sf_dir)
    ev = load_table(spark, sf_dir, "events")
    max_ts = ev.agg(F.max("ts")).first()[0]
    starts = {r["win_start"] for r in got.select("win_start").distinct().collect()}
    assert starts, "no closed windows emitted"
    import datetime

    for ws in starts:
        assert ws + datetime.timedelta(hours=1) <= max_ts - datetime.timedelta(hours=1)


def test_stream_dedup_is_distinct(spark, sf_dir):
    from curatorhadoopinterface_spark.session import load_table
    from curatorhadoopinterface_spark.streaming.ops import stream_dedup

    got = stream_dedup(spark, sf_dir)
    ev = load_table(spark, sf_dir, "events")
    want = ev.select("user_id", "event_type").distinct()
    assert _canon(got) == _canon(want)
