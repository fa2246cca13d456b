"""Record store: memoization anti-join, staleness, cascade invalidation,
view-count upsert (SURVEY.md A18-A23)."""

import pyspark.sql.functions as F
import pytest

from curatorhadoopinterface_spark.io import records_from_texts
from curatorhadoopinterface_spark.plans.incremental import (
    RecordStore,
    remove_stale_views,
    stale_views_col,
    view_count_col,
)
from curatorhadoopinterface_spark.plans.provide import provide


@pytest.fixture()
def store_path(tmp_path):
    return str(tmp_path / "record_store")


def test_store_roundtrip_and_hit_skip(spark, corpus, store_path):
    store = RecordStore(spark, store_path)
    annotated = store.provide_incremental(corpus, "POS")
    assert annotated.count() == corpus.count()
    stored = store.load()
    assert stored.count() == corpus.count()
    # second run: all cache hits, same results
    again = store.provide_incremental(corpus, "POS")
    assert again.count() == corpus.count()
    a = {r.identifier: r.label_views["pos"] for r in annotated.collect()}
    b = {r.identifier: r.label_views["pos"] for r in again.collect()}
    assert a == b


def test_incremental_annotates_only_new(spark, corpus, store_path):
    store = RecordStore(spark, store_path)
    store.provide_incremental(corpus, "TOKEN")
    extended = records_from_texts(
        spark, ["Completely new document text here."]
    ).unionByName(corpus.select("identifier", "raw_text", "whitespaced"))
    out = store.provide_incremental(extended, "TOKEN")
    assert out.count() == corpus.count() + 1
    assert store.load().count() == corpus.count() + 1


def test_upsert_keeps_richer_record(spark, corpus, store_path):
    store = RecordStore(spark, store_path)
    rich = provide(corpus, "POS")  # tokens+pos
    store.write_full(rich)
    poor = provide(corpus, "TOKEN")  # tokens only
    store.upsert(poor)
    stored = store.load()
    # the stored copies keep their pos view (poor had FEWER views)
    assert all("pos" in r.label_views for r in stored.collect())


def test_stale_version_detected_and_cascaded(spark, corpus):
    ann = provide(corpus, "CHUNK")
    # age the pos view: enginepos-1.0 -> enginepos-0.9 (A22 stimulus,
    # FIXTURES.md corpus_annotated spec)
    aged = ann.withColumn(
        "label_views",
        F.expr(
            """transform_values(label_views, (k, v) -> IF(k = 'pos',
                 named_struct('labels', v.labels, 'source', 'enginepos-0.9',
                              'score', v.score), v))"""
        ),
    )
    stale = aged.select(stale_views_col(aged).alias("s")).collect()
    assert all(r.s == ["pos"] for r in stale)
    cleaned = remove_stale_views(aged)
    for r in cleaned.collect():
        views = set(r.label_views.keys())
        assert "pos" not in views  # stale dropped
        assert "chunk" not in views  # cascaded (chunk requires pos)
        assert "tokens" in views  # untouched upstream survives


def test_fresh_versions_not_invalidated(spark, corpus):
    ann = provide(corpus, "CHUNK")
    cleaned = remove_stale_views(ann)
    for r in cleaned.collect():
        assert {"tokens", "pos", "chunk"} <= set(r.label_views.keys())


def test_view_count(spark, corpus):
    ann = provide(corpus, "POS")
    counts = ann.select(view_count_col(ann).alias("n")).collect()
    assert all(r.n == 2 for r in counts)  # tokens + pos


def test_store_compaction_reduces_files_and_preserves_content(spark, sf_dir):
    import glob
    import os

    from curatorhadoopinterface_spark.io import scratch_dir
    from curatorhadoopinterface_spark.operators.incremental_q import (
        store_compaction,
    )

    out = store_compaction(spark, sf_dir).collect()
    base = scratch_dir("store_compact", sf_dir)
    before = glob.glob(f"{base}/bucket=*/part-*.parquet")
    after = glob.glob(f"{base}_compacted/bucket=*/part-*.parquet")
    buckets = {os.path.basename(os.path.dirname(p)) for p in after}
    # every bucket compacts to exactly ONE file
    assert len(after) == len(buckets)
    # the appends left strictly more files than buckets
    assert len(before) > len(after)
    # content preserved: compacted census equals the pre-compaction one
    import pyspark.sql.functions as F

    pre = {
        (r["bucket"], r["n_records"], r["total_tokens"])
        for r in spark.read.parquet(base)
        .groupBy("bucket")
        .agg(F.count("*").alias("n_records"), F.sum("n_tokens").alias("total_tokens"))
        .collect()
    }
    post = {(r["bucket"], r["n_records"], r["total_tokens"]) for r in out}
    assert pre == post
