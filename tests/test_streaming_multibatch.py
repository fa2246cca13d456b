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
from curatorhadoopinterface_spark.io import proc_scratch


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


def test_stream_stream_join_state_across_batches_and_eviction(spark, tmp_path):
    """Join state must SURVIVE to the next micro-batch (an error arriving
    in batch 1 joins a click arriving in batch 2) and be EVICTED once the
    watermark passes (a click far older than the in-force watermark finds
    nothing, and emits nothing). This is the bounded-memory contract a
    100 TB/day stream-stream join runs on."""
    base = str(tmp_path / "ssj_src")
    t0 = time.time() - 1000
    # batch 1: an error for user 1 at 00:00 (enters error-side state)
    _write_batch(
        spark, [(10, "2024-01-01 00:00:00", 1.0)], f"{base}/errors/b1.parquet", t0
    )
    _write_batch(
        spark, [(0, "2024-01-01 00:00:00", 0.0)], f"{base}/clicks/b0.parquet", t0
    )
    # batch 2: a click for user 1 at 00:30 -> joins the batch-1 error
    _write_batch(
        spark, [(20, "2024-01-01 00:30:00", 1.0)], f"{base}/clicks/b2.parquet", t0 + 10
    )
    # batch 3: both sides jump to 08:00 -> watermark (delay 1h) advances
    # past 00:00 on both sides; the 00:00 error is evicted from state
    _write_batch(
        spark, [(30, "2024-01-01 08:00:00", 1.0)], f"{base}/errors/b3.parquet", t0 + 20
    )
    _write_batch(
        spark, [(40, "2024-01-01 08:00:00", 1.0)], f"{base}/clicks/b3.parquet", t0 + 20
    )
    # batch 4: another advance so the new watermark is in force
    _write_batch(
        spark, [(50, "2024-01-01 09:00:00", 1.0)], f"{base}/clicks/b4.parquet", t0 + 30
    )
    # batch 5: a LATE click back at 00:45 — the matching error's state is
    # gone, so no pair may be emitted for it
    _write_batch(
        spark, [(60, "2024-01-01 00:45:00", 1.0)], f"{base}/clicks/b5.parquet", t0 + 40
    )

    def side(sub, id_alias, ts_alias):
        return (
            spark.readStream.schema("event_id long, ts timestamp, value double")
            .option("maxFilesPerTrigger", "1")
            .option("latestFirst", "false")
            .parquet(f"{base}/{sub}")
            .select(
                F.col("event_id").alias(id_alias),
                F.lit(1).alias(f"user_{sub}"),
                F.col("ts").alias(ts_alias),
            )
            .withWatermark(ts_alias, "1 hour")
        )

    clicks = side("clicks", "click_id", "click_ts")
    errors = side("errors", "error_id", "error_ts")
    j = clicks.join(
        errors,
        F.expr(
            "user_clicks = user_errors AND "
            "error_ts BETWEEN click_ts - INTERVAL 1 HOUR AND click_ts"
        ),
    ).select("click_id", "error_id")
    q = (
        j.writeStream.format("memory")
        .queryName("t_ssj_mb")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)
    assert q.exception() is None
    pairs = {(r["click_id"], r["error_id"]) for r in spark.table("t_ssj_mb").collect()}
    assert (20, 10) in pairs, f"cross-batch join pair missing: {pairs}"
    assert (60, 10) not in pairs, f"evicted state was re-joined: {pairs}"
    # the 08:00/09:00 clicks may legitimately pair with the 08:00 error
    unexpected = pairs - {(20, 10), (40, 30), (50, 30), (0, 10)}
    assert not unexpected, f"unexpected pairs: {unexpected}"


def test_parquet_sink_exactly_once_across_restart(spark, tmp_path):
    """Exactly-once across a query RESTART on the same checkpoint: rows
    committed by run 1 are not re-emitted by run 2, files added between
    runs are picked up once, and the _spark_metadata log hides any
    uncommitted files from batch readers."""
    src_dir = str(tmp_path / "sink_src")
    out = str(tmp_path / "sink_out")
    ckpt = str(tmp_path / "sink_ckpt")
    t0 = time.time() - 1000
    _write_batch(
        spark,
        [(1, "2024-01-01 00:00:00", 1.0), (2, "2024-01-01 00:01:00", 2.0)],
        f"{src_dir}/b1.parquet",
        t0,
    )
    _write_batch(
        spark, [(3, "2024-01-01 00:02:00", 3.0)], f"{src_dir}/b2.parquet", t0 + 10
    )

    def run_once():
        src = spark.readStream.schema(
            "event_id long, ts timestamp, value double"
        ).option("maxFilesPerTrigger", "1").parquet(src_dir)
        q = (
            src.select("event_id", "value")
            .writeStream.format("parquet")
            .option("path", out)
            .option("checkpointLocation", ckpt)
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(300)
        assert q.exception() is None

    run_once()
    first = sorted(r["event_id"] for r in spark.read.parquet(out).collect())
    assert first == [1, 2, 3]
    # between runs: one more file lands
    _write_batch(
        spark, [(4, "2024-01-01 00:03:00", 4.0)], f"{src_dir}/b3.parquet", t0 + 20
    )
    run_once()
    back = spark.read.parquet(out).collect()
    ids = sorted(r["event_id"] for r in back)
    # 1-3 appear exactly once (no reprocessing), 4 exactly once (no loss)
    assert ids == [1, 2, 3, 4], ids


def test_stream_stream_join_state_rows_evicted_metrics(spark, tmp_path):
    """Direct state-store evidence (not just join results): the progress
    metrics must show rows REMOVED from the join state once the
    watermark passes them, and the final resident row count must drop
    below its peak. This is the observable bounded-memory guarantee —
    at 100 TB/day the numRowsTotal curve is what you alert on."""
    base = str(tmp_path / "ssj_metrics")
    t0 = time.time() - 1000
    # batch 1: five errors at 00:00-00:04 (enter error-side state)
    _write_batch(
        spark,
        [(i, f"2024-01-01 00:0{i}:00", 1.0) for i in range(5)],
        f"{base}/errors/b1.parquet",
        t0,
    )
    _write_batch(
        spark, [(0, "2024-01-01 00:00:00", 0.0)], f"{base}/clicks/b0.parquet", t0
    )
    # batch 2: both sides jump to 08:00 -> watermark (1h delay) = 07:00,
    # far past the batch-1 rows -> they must be evicted
    _write_batch(
        spark, [(30, "2024-01-01 08:00:00", 1.0)], f"{base}/errors/b2.parquet", t0 + 10
    )
    _write_batch(
        spark, [(40, "2024-01-01 08:00:00", 1.0)], f"{base}/clicks/b2.parquet", t0 + 10
    )
    # batch 3: one more advance so eviction runs with the 07:00 watermark
    _write_batch(
        spark, [(50, "2024-01-01 09:00:00", 1.0)], f"{base}/clicks/b3.parquet", t0 + 20
    )

    def side(sub, id_alias, ts_alias):
        return (
            spark.readStream.schema("event_id long, ts timestamp, value double")
            .option("maxFilesPerTrigger", "1")
            .option("latestFirst", "false")
            .parquet(f"{base}/{sub}")
            .select(
                F.col("event_id").alias(id_alias),
                F.lit(1).alias(f"user_{sub}"),
                F.col("ts").alias(ts_alias),
            )
            .withWatermark(ts_alias, "1 hour")
        )

    j = side("clicks", "click_id", "click_ts").join(
        side("errors", "error_id", "error_ts"),
        F.expr(
            "user_clicks = user_errors AND "
            "error_ts BETWEEN click_ts - INTERVAL 1 HOUR AND click_ts"
        ),
    ).select("click_id", "error_id")
    q = (
        j.writeStream.format("memory")
        .queryName("t_ssj_metrics")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)
    assert q.exception() is None
    prog = [p for p in q.recentProgress if p.get("stateOperators")]
    assert prog, "no state-operator progress recorded"
    totals = [p["stateOperators"][0]["numRowsTotal"] for p in prog]
    removed = sum(p["stateOperators"][0]["numRowsRemoved"] for p in prog)
    # rows really left the store...
    assert removed >= 5, (totals, removed)
    # ...and the resident count came DOWN off its peak
    assert totals[-1] < max(totals), totals


def test_stream_contamination_matches_batch_pass_and_ran_multibatch(spark):
    """The quarantine store drained from the stream must flag EXACTLY
    the docs the batch contamination pass reports (same shingles, same
    eval slice), and the run must actually have been multi-batch
    (one commit per staged file under availableNow)."""
    import os
    import tempfile

    from curatorhadoopinterface_spark.operators.curation import (
        contamination_ngram,
    )
    from curatorhadoopinterface_spark.streaming.ops import stream_contamination

    sf_dir = "/root/testdata/sf0.001"
    census = {r["lang"]: r for r in stream_contamination(spark, sf_dir).collect()}
    batch = contamination_ngram(spark, sf_dir).collect()
    base = proc_scratch("stream_contam")
    store = spark.read.parquet(os.path.join(base, "store"))
    got_docs = {r["doc_id"] for r in store.select("doc_id").distinct().collect()}
    want_docs = {r["doc_id"] for r in batch}
    assert got_docs == want_docs and want_docs
    # per-doc hit counts agree with the batch report too
    got_hits = {
        r["doc_id"]: r["n"]
        for r in store.groupBy("doc_id").count().withColumnRenamed("count", "n").collect()
    }
    assert got_hits == {r["doc_id"]: r["n_contaminated"] for r in batch}
    assert sum(r["n_hits"] for r in census.values()) == sum(got_hits.values())
    commits = os.listdir(os.path.join(base, "ckpt", "commits"))
    assert len([c for c in commits if not c.startswith(".")]) >= 4
