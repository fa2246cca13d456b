"""Sources & sinks (SURVEY.md section 2A rows A1-A5, A28).

The reference ingests either a directory of raw ``.txt`` files
(CuratorClient.java:406-429) or a directory of Thrift-serialized Records
(CuratorClient.java:299-339), and writes one serialized record per
document named ``<sha1>.txt`` (CuratorClient.java:473-496). Here a corpus
is Parquet (one row per document) and raw-text ingestion builds Record
rows with reproducible SHA-1 identifiers (Identifier.java:63-70).
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from curatorhadoopinterface_spark.functions.hashing import record_identifier


def read_text_corpus(spark: SparkSession, path: str, whitespaced: bool = False) -> DataFrame:
    """A3 raw-text ingestion: one Record per file, empty views, empty
    texts refused (CuratorClient.java:527-536 ``addToInputList``).

    ``wholetext=True`` keeps one row per file like the reference's
    one-record-per-file model; Spark packs small files into size-based
    splits, fixing the reference's task-per-document granularity
    (DirectoryInputFormat.java:17-19).
    """
    raw = spark.read.text(path, wholetext=True).withColumnRenamed("value", "raw_text")
    return (
        raw.filter(F.length(F.col("raw_text")) > 0)
        .withColumn("whitespaced", F.lit(whitespaced))
        .withColumn("identifier", record_identifier(F.col("raw_text"), F.col("whitespaced")))
        .withColumn("label_views", F.lit(None).cast("map<string,struct<labels:array<struct<start:int,ending:int,label:string,score:double,source:string,attributes:map<string,string>>>,source:string,score:double>>"))
        .select("identifier", "raw_text", "whitespaced", "label_views")
    )


def records_from_texts(spark: SparkSession, texts: list[str], whitespaced: bool = False) -> DataFrame:
    """Build blank Records from in-memory texts (RecordTools.generateNew,
    RecordTools.java:49-78): empty view maps, reproducible identifier."""
    df = spark.createDataFrame([(t,) for t in texts], "raw_text string")
    return (
        df.filter(F.length("raw_text") > 0)
        .withColumn("whitespaced", F.lit(whitespaced))
        .withColumn("identifier", record_identifier(F.col("raw_text"), F.col("whitespaced")))
        .select("identifier", "raw_text", "whitespaced")
    )


def write_corpus(df: DataFrame, path: str, mode: str = "overwrite", partition_by: list[str] | None = None) -> None:
    """A5 sink. ``overwrite`` replaces the reference's output-dir rotation
    (CuratorJob.java:119-142). ``partition_by`` enables partition pruning
    at scale (e.g. by source / date / hash prefix, SURVEY.md M7)."""
    writer = df.write.mode(mode)
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    writer.parquet(path)


def roundtrip_check(spark: SparkSession, df: DataFrame, path: str) -> bool:
    """Write-then-read-back equality, the reference's post-write check
    (HadoopCuratorClient.java:83-104): re-read and diff must be empty.

    Set ops reject MapType columns, so rows are canonicalized to JSON
    first (parquet stores maps as ordered entry lists, so entry order —
    and hence the JSON — survives the round-trip)."""
    write_corpus(df, path)
    back = spark.read.parquet(path)

    def canon(d: DataFrame) -> DataFrame:
        return d.select(F.to_json(F.struct(*sorted(d.columns))).alias("js"))

    a, b = canon(df), canon(back)
    return a.exceptAll(b).isEmpty() and b.exceptAll(a).isEmpty()
