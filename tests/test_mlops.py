"""Semantics of the embedding-ML operators (operators/mlops.py) and the
streaming merge-on-read upsert (streaming/ops.py stream_upsert_store).
"""

from __future__ import annotations

import os
import tempfile

import pyspark.sql.functions as F

from curatorhadoopinterface_spark.operators.mlops import (
    QBITS_MAX,
    TOP_K,
    emb_quantize,
    kmeans_lloyd,
    sim_ivf_nprobe,
)
from curatorhadoopinterface_spark.operators.similarity import sim_ivf_topk, sim_topk
from curatorhadoopinterface_spark.session import load_table
from curatorhadoopinterface_spark.io import proc_scratch


def test_kmeans_lloyd_partitions_corpus(spark, sf_dir):
    out = kmeans_lloyd(spark, sf_dir).collect()
    emb = load_table(spark, sf_dir, "embeddings")
    n_total = emb.count()
    labels = {r["label"] for r in emb.select("label").distinct().collect()}
    assert sum(r["n_points"] for r in out) == n_total  # exact partition
    assert {r["cluster"] for r in out} <= labels
    for r in out:
        assert r["n_points"] > 0
        assert r["drift"] >= 0.0


def test_emb_quantize_error_bound(spark, sf_dir):
    out = emb_quantize(spark, sf_dir).collect()
    emb = load_table(spark, sf_dir, "embeddings")
    # worst-case reconstruction error of half-up rounding is half a step
    # of the WIDEST dimension
    span = (
        emb.select(F.posexplode(F.expr("transform(embedding, x -> cast(x as double))")).alias("i", "v"))
        .groupBy("i")
        .agg((F.max("v") - F.min("v")).alias("w"))
        .agg(F.max("w").alias("mw"))
        .collect()[0]["mw"]
    )
    bound = span / QBITS_MAX / 2 + 1e-9
    assert out and all(0 <= r["max_abs_err"] <= bound for r in out)
    assert all(r["total_code"] > 0 and r["n_vecs"] > 0 for r in out)


def _recall_vs_exact(spark, sf_dir, approx_fn) -> float:
    exact = {
        (r["query_id"], r["neighbor_id"])
        for r in sim_topk(spark, sf_dir).collect()
    }
    approx = {
        (r["query_id"], r["neighbor_id"])
        for r in approx_fn(spark, sf_dir).collect()
    }
    return len(exact & approx) / len(exact)


def test_ivf_nprobe2_recall_not_worse_than_nprobe1(spark, sf_dir):
    r2 = _recall_vs_exact(spark, sf_dir, sim_ivf_nprobe)
    r1 = _recall_vs_exact(spark, sf_dir, sim_ivf_topk)
    assert r2 >= r1  # the second probe can only add candidates
    per_q = {}
    for r in sim_ivf_nprobe(spark, sf_dir).collect():
        per_q.setdefault(r["query_id"], []).append(r["rk"])
    for ranks in per_q.values():
        assert sorted(ranks) == list(range(1, TOP_K + 1))


def test_stream_upsert_store_is_multi_batch(spark, sf_dir):
    from curatorhadoopinterface_spark.streaming.ops import stream_upsert_store

    out = stream_upsert_store(spark, sf_dir)
    users = out.count()
    # the op stages 4 files with maxFilesPerTrigger=1: the delta log it
    # leaves behind must hold MORE partials than users — proof that
    # several foreachBatch appends really happened before compaction
    store = os.path.join(proc_scratch("stream_upsert"), "store")
    deltas = spark.read.parquet(store)
    assert deltas.count() > users
    assert deltas.select("user_id").distinct().count() == users
    # compaction agrees with a direct batch aggregate
    truth = (
        load_table(spark, sf_dir, "events")
        .groupBy("user_id")
        .agg(F.count("*").alias("n_events"))
    )
    got = {(r["user_id"], r["n_events"]) for r in out.select("user_id", "n_events").collect()}
    assert got == {(r["user_id"], r["n_events"]) for r in truth.collect()}
