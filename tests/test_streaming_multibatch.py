"""Multi-batch streaming semantics: watermark advancement ACROSS
micro-batches and late-data drop — the behavior a single-batch drain
can't show. Files are fed one per micro-batch (maxFilesPerTrigger=1,
arrival order forced via mtime), so the watermark advances between
batches exactly as it would on a live stream.
"""

from __future__ import annotations

import os
import time
from datetime import datetime

import pyspark.sql.functions as F


def _ts(s: str) -> datetime:
    return datetime.fromisoformat(s)


def _write_batch(spark, rows, path, mtime):
    """Land one arrival as a PLAIN parquet file in the watched dir (the
    file stream source does not recurse into per-write subdirs)."""
    import glob
    import shutil

    rows = [(i, _ts(t), v) for i, t, v in rows]
    df = spark.createDataFrame(rows, "event_id long, ts timestamp, value double")
    staging = path + ".staging"
    df.coalesce(1).write.mode("overwrite").parquet(staging)
    part = glob.glob(os.path.join(staging, "part-*.parquet"))[0]
    os.makedirs(os.path.dirname(path), exist_ok=True)
    shutil.copyfile(part, path)
    shutil.rmtree(staging)
    os.utime(path, (mtime, mtime))


def test_watermark_drops_late_rows_across_batches(spark, tmp_path):
    base = str(tmp_path / "stream_src")
    t0 = time.time() - 1000
    # batch 1: ten events in the 00:00 hour window
    _write_batch(
        spark,
        [(i, f"2024-01-01 00:{i:02d}:00", 1.0) for i in range(10)],
        f"{base}/b1.parquet",
        t0,
    )
    # batch 2: one event at 05:00 -> watermark advances to 04:00,
    # closing (and emitting) the 00:00 window
    _write_batch(
        spark,
        [(100, "2024-01-01 05:00:00", 1.0)],
        f"{base}/b2.parquet",
        t0 + 10,
    )
    # batch 3: buffer batch — watermark updates propagate to the filter
    # with a one-batch delay, so the advancement from b2 takes effect here
    _write_batch(
        spark,
        [(150, "2024-01-01 05:30:00", 1.0)],
        f"{base}/b3.parquet",
        t0 + 20,
    )
    # batch 4: a LATE event back in the 00:00 window — older than the
    # in-force watermark (04:00), must be dropped, not re-emitted
    _write_batch(
        spark,
        [(200, "2024-01-01 00:15:00", 1.0)],
        f"{base}/b4.parquet",
        t0 + 30,
    )

    src = (
        spark.readStream.schema("event_id long, ts timestamp, value double")
        .option("maxFilesPerTrigger", "1")
        .option("latestFirst", "false")
        .parquet(base)
    )
    agg = (
        src.withWatermark("ts", "1 hour")
        .groupBy(F.window("ts", "1 hour").alias("win"))
        .agg(F.count("*").alias("n"))
        .select(F.col("win.start").alias("win_start"), "n")
    )
    q = (
        agg.writeStream.format("memory")
        .queryName("t_late")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    assert q.exception() is None
    got: dict[str, list[int]] = {}
    for r in spark.table("t_late").collect():
        got.setdefault(r["win_start"].isoformat(), []).append(r["n"])

    # the 00:00 window was emitted exactly ONCE, WITHOUT the late row
    # (10, not 11, and no second emission from the dropped row)
    assert got == {"2024-01-01T00:00:00": [10]}, got


def test_multibatch_dedup_keeps_first_arrival(spark, tmp_path):
    """Stateful dedup across batches: a key re-arriving in a later
    micro-batch is suppressed by state, not re-emitted."""
    base = str(tmp_path / "dedup_src")
    t0 = time.time() - 1000
    _write_batch(
        spark,
        [(1, "2024-01-01 00:00:00", 1.0), (2, "2024-01-01 00:01:00", 2.0)],
        f"{base}/b1.parquet",
        t0,
    )
    _write_batch(
        spark,
        [(1, "2024-01-01 00:30:00", 99.0), (3, "2024-01-01 00:31:00", 3.0)],
        f"{base}/b2.parquet",
        t0 + 10,
    )
    src = (
        spark.readStream.schema("event_id long, ts timestamp, value double")
        .option("maxFilesPerTrigger", "1")
        .parquet(base)
    )
    dd = (
        src.withWatermark("ts", "1 hour")
        .dropDuplicates(["event_id"])
        .select("event_id", "value")
    )
    q = (
        dd.writeStream.format("memory")
        .queryName("t_dd_mb")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    assert q.exception() is None
    rows = {r["event_id"]: r["value"] for r in spark.table("t_dd_mb").collect()}
    # event 1's SECOND arrival (value 99) was suppressed by state
    assert rows == {1: 1.0, 2: 2.0, 3: 3.0}, rows
