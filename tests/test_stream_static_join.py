"""Multi-batch stream-static join semantics: the static dimension is
re-read EACH micro-batch, so a dim update between batches is reflected
in rows that arrive after it — the slowly-changing-dimension behavior a
single-batch drain can't show.
"""

from __future__ import annotations

import os
import time

import pyspark.sql.functions as F


def _write_parquet_file(df, path, mtime):
    import glob
    import shutil

    staging = path + ".staging"
    df.coalesce(1).write.mode("overwrite").parquet(staging)
    part = glob.glob(os.path.join(staging, "part-*.parquet"))[0]
    os.makedirs(os.path.dirname(path), exist_ok=True)
    shutil.copyfile(part, path)
    shutil.rmtree(staging)
    os.utime(path, (mtime, mtime))


def test_dim_update_between_batches_is_picked_up(spark, tmp_path):
    src = str(tmp_path / "events_src")
    dim_dir = str(tmp_path / "dim")
    ckpt = str(tmp_path / "ckpt")
    out_rows = []
    t0 = time.time() - 1000

    # two event files -> two micro-batches (maxFilesPerTrigger=1)
    ev = spark.createDataFrame(
        [(1, 10), (2, 20)], "event_id long, user_id long"
    )
    _write_parquet_file(ev.filter("event_id = 1"), f"{src}/b1.parquet", t0)
    _write_parquet_file(ev.filter("event_id = 2"), f"{src}/b2.parquet", t0 + 10)

    def write_dim(seg_for_10: str):
        spark.createDataFrame(
            [(10, seg_for_10), (20, "B")], "c_custkey long, c_mktsegment string"
        ).write.mode("overwrite").parquet(dim_dir)

    write_dim("A0")

    def on_batch(batch_df, batch_id):
        # fresh dim read per batch (the stream_static_join contract)
        dim = F.broadcast(batch_df.sparkSession.read.parquet(dim_dir))
        joined = batch_df.join(dim, batch_df["user_id"] == dim["c_custkey"])
        out_rows.extend(
            (r["event_id"], r["c_mktsegment"]) for r in joined.collect()
        )
        if batch_id == 0:
            # dim changes BETWEEN batches: user 10's segment is renamed
            write_dim("A1")

    schema = spark.read.parquet(src).schema
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(src)
    )
    q = (
        stream.writeStream.foreachBatch(on_batch)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)
    assert q.exception() is None

    got = dict(out_rows)
    # batch 1 (event 1, user 10) saw the original dim; batch 2 (event 2,
    # user 20) ran after the update — and had the update been invisible,
    # a third batch with user 10 would still say A0, so drive one more
    assert got[1] == "A0"
    assert got[2] == "B"

    # third arrival for user 10 after the dim update -> must see A1
    _write_parquet_file(
        spark.createDataFrame([(3, 10)], "event_id long, user_id long"),
        f"{src}/b3.parquet",
        t0 + 20,
    )
    q2 = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(src)
        .writeStream.foreachBatch(on_batch)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q2.awaitTermination(300)
    assert q2.exception() is None
    got = dict(out_rows)
    assert got[3] == "A1"


def test_stream_static_join_matches_batch_truth(spark, sf_dir):
    from curatorhadoopinterface_spark.operators import all_queries
    from curatorhadoopinterface_spark.session import load_table

    out = {
        r["segment"]: r
        for r in all_queries()["stream_static_join"](spark, sf_dir).collect()
    }
    ev = load_table(spark, sf_dir, "events")
    cust = load_table(spark, sf_dir, "customer")
    truth = {
        r["segment"]: r
        for r in ev.join(cust, ev["user_id"] == cust["c_custkey"])
        .groupBy(F.col("c_mktsegment").alias("segment"))
        .agg(
            F.count("*").alias("n_events"),
            F.round(F.sum("value"), 4).alias("total_value"),
            F.round(F.max("value"), 4).alias("max_value"),
        )
        .collect()
    }
    assert set(out) == set(truth)
    for seg, t in truth.items():
        r = out[seg]
        assert (r["n_events"], r["total_value"], r["max_value"]) == (
            t["n_events"],
            t["total_value"],
            t["max_value"],
        )
