"""shard_manifest is an INTEGRITY artifact: recomputing it from a
written-and-re-read shard must reproduce it exactly, and any payload
corruption must change the checksum — the two properties the sidecar
exists to provide. The oracle sweep proves Spark==DuckDB; these prove
the manifest means what it claims."""

import pyspark.sql.functions as F

from curatorhadoopinterface_spark.operators.sources import shard_manifest
from curatorhadoopinterface_spark.session import load_table

SF_DIR = "/root/testdata/sf0.001"


def _manifest_rows(df):
    return {
        (r["lang"], r["source"]): (
            r["n_rows"],
            r["total_chars"],
            r["min_doc_id"],
            r["max_doc_id"],
            r["content_checksum"],
        )
        for r in df.collect()
    }


def test_manifest_survives_write_readback_and_repartition(spark, tmp_path):
    """The checksum is order-independent: a partitioned write (which
    reorders rows across files) then a re-read under a different
    partitioning must reproduce the manifest bit-for-bit."""
    want = _manifest_rows(shard_manifest(spark, SF_DIR))
    out = str(tmp_path / "shards")
    d = load_table(spark, SF_DIR, "documents")
    d.repartition(7).write.mode("overwrite").partitionBy("lang").parquet(out)
    back = spark.read.parquet(out)
    term = F.conv(
        F.substring(
            F.md5(F.concat_ws(":", F.col("doc_id").cast("string"), "text")),
            1,
            7,
        ),
        16,
        10,
    ).cast("bigint")
    got = _manifest_rows(
        back.groupBy("lang", "source").agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.sum("n_chars").alias("total_chars"),
            F.min("doc_id").alias("min_doc_id"),
            F.max("doc_id").alias("max_doc_id"),
            F.sum(term).alias("content_checksum"),
        )
    )
    assert got == want and want


def test_manifest_detects_single_row_corruption(spark):
    """Flipping one character of one document's text must change that
    shard's checksum and ONLY that shard's checksum."""
    d = load_table(spark, SF_DIR, "documents")
    victim = d.orderBy("doc_id").limit(1).collect()[0]
    corrupted = d.withColumn(
        "text",
        F.when(
            F.col("doc_id") == victim["doc_id"],
            F.concat(F.lit("X"), F.expr("substring(text, 2)")),
        ).otherwise(F.col("text")),
    )
    term = F.conv(
        F.substring(
            F.md5(F.concat_ws(":", F.col("doc_id").cast("string"), "text")),
            1,
            7,
        ),
        16,
        10,
    ).cast("bigint")

    def sums(df):
        return {
            (r["lang"], r["source"]): r["c"]
            for r in df.groupBy("lang", "source")
            .agg(F.sum(term).alias("c"))
            .collect()
        }

    clean, dirty = sums(d), sums(corrupted)
    changed = {k for k in clean if clean[k] != dirty[k]}
    assert changed == {(victim["lang"], victim["source"])}
