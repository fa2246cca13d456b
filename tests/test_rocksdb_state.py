"""RocksDB state store under real multi-batch stateful queries.

SCALE.md names RocksDBStateStoreProvider as the knob for state growth
(key cardinality beyond executor heap: dedup keys, session windows,
custom accumulators spill to local SSD instead of OOMing the JVM).
These tests prove the claim runs: the same stateful plans produce
IDENTICAL results under the default HDFS-backed provider and under
RocksDB, with state carried across micro-batches (maxFilesPerTrigger=1).
"""

from __future__ import annotations

import glob
import os
import shutil
import time
from contextlib import contextmanager
from datetime import datetime

import pandas as pd
from pyspark.sql.types import StructType

ROCKSDB = (
    "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider"
)
_PROVIDER_KEY = "spark.sql.streaming.stateStore.providerClass"


@contextmanager
def _state_provider(spark, provider: str | None):
    old = spark.conf.get(_PROVIDER_KEY, None)
    try:
        if provider is None:
            spark.conf.unset(_PROVIDER_KEY)
        else:
            spark.conf.set(_PROVIDER_KEY, provider)
        yield
    finally:
        if old is None:
            spark.conf.unset(_PROVIDER_KEY)
        else:
            spark.conf.set(_PROVIDER_KEY, old)


def _write_batch(spark, rows, path, mtime):
    rows = [(k, datetime.fromisoformat(t), v) for k, t, v in rows]
    df = spark.createDataFrame(rows, "user_id long, ts timestamp, value double")
    staging = path + ".staging"
    df.coalesce(1).write.mode("overwrite").parquet(staging)
    part = glob.glob(os.path.join(staging, "part-*.parquet"))[0]
    os.makedirs(os.path.dirname(path), exist_ok=True)
    shutil.copyfile(part, path)
    shutil.rmtree(staging)
    os.utime(path, (mtime, mtime))


def _feed_three_batches(spark, base):
    t0 = time.time() - 1000
    _write_batch(
        spark,
        [(1, "2024-01-01 00:00:00", 1.0), (2, "2024-01-01 00:01:00", 2.0)],
        f"{base}/b1.parquet",
        t0,
    )
    _write_batch(
        spark,
        [(1, "2024-01-01 01:00:00", 3.0), (3, "2024-01-01 01:01:00", 4.0)],
        f"{base}/b2.parquet",
        t0 + 10,
    )
    _write_batch(
        spark,
        [(1, "2024-01-01 02:00:00", 5.0), (2, "2024-01-01 02:01:00", 6.0)],
        f"{base}/b3.parquet",
        t0 + 20,
    )


def _src(spark, base):
    return (
        spark.readStream.schema("user_id long, ts timestamp, value double")
        .option("maxFilesPerTrigger", "1")
        .option("latestFirst", "false")
        .parquet(base)
    )


def _drain(df, name, output_mode):
    q = (
        df.writeStream.format("memory")
        .queryName(name)
        .outputMode(output_mode)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)
    if q.exception() is not None:
        raise q.exception()
    return df.sparkSession.table(name)


def _stateful_count(spark, base, name):
    """applyInPandasWithState accumulator (the stream_stateful_count
    plan shape) — per-user (count, sum) carried across micro-batches."""
    out_t = StructType.fromDDL("user_id bigint, n_events bigint, total double")
    st_t = StructType.fromDDL("cnt bigint, tot double")

    def track(key, pdfs, state):
        cnt, tot = state.get if state.exists else (0, 0.0)
        for pdf in pdfs:
            cnt += len(pdf)
            tot += float(pdf["value"].sum())
        state.update((cnt, tot))
        yield pd.DataFrame(
            {"user_id": [key[0]], "n_events": [cnt], "total": [round(tot, 4)]}
        )

    res = _src(spark, base).groupBy("user_id").applyInPandasWithState(
        track, out_t, st_t, "update", "NoTimeout"
    )
    rows = _drain(res, name, "update").collect()
    # update mode re-emits a key per batch it appears in: the final
    # emission per key is the accumulated state
    final = {}
    for r in sorted(rows, key=lambda r: r.n_events):
        final[r.user_id] = (r.n_events, r.total)
    return final


def test_rocksdb_stateful_accumulator_matches_default(spark, tmp_path):
    base = str(tmp_path / "src")
    _feed_three_batches(spark, base)
    with _state_provider(spark, None):
        default_res = _stateful_count(spark, base, "rocks_default_acc")
    with _state_provider(spark, ROCKSDB):
        rocks_res = _stateful_count(spark, base, "rocks_rocksdb_acc")
    expected = {1: (3, 9.0), 2: (2, 8.0), 3: (1, 4.0)}
    assert default_res == expected
    assert rocks_res == expected


def test_rocksdb_streaming_dedup_matches_default(spark, tmp_path):
    """dropDuplicates state (the stream_dedup plan shape) under RocksDB:
    first arrival wins across batches, kept set == DISTINCT."""
    base = str(tmp_path / "src")
    _feed_three_batches(spark, base)

    def run(name):
        out = (
            _src(spark, base)
            .withWatermark("ts", "10 hours")
            .dropDuplicates(["user_id"])
            .select("user_id")
        )
        return sorted(r.user_id for r in _drain(out, name, "append").collect())

    with _state_provider(spark, None):
        assert run("rocks_default_dedup") == [1, 2, 3]
    with _state_provider(spark, ROCKSDB):
        assert run("rocks_rocksdb_dedup") == [1, 2, 3]
