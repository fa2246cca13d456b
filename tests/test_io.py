"""IO: raw ingestion filters empty docs, serialization round-trip
(A3/A5; CuratorClient.java:527-536, HadoopCuratorClient.java:83-104)."""

import pyspark.sql.functions as F

from curatorhadoopinterface_spark.io import records_from_texts, roundtrip_check, write_corpus
from curatorhadoopinterface_spark.plans.provide import provide


def test_empty_text_filtered(spark):
    df = records_from_texts(spark, ["hello", "", "world"])
    assert df.count() == 2


def test_duplicate_text_same_identifier(spark):
    df = records_from_texts(spark, ["same text", "same text"])
    ids = [r.identifier for r in df.collect()]
    assert ids[0] == ids[1]
    assert df.dropDuplicates(["identifier"]).count() == 1


def test_annotated_roundtrip(spark, corpus, tmp_path):
    ann = provide(corpus, "VERB_SRL")
    assert roundtrip_check(spark, ann, str(tmp_path / "rt"))


def test_partitioned_write(spark, corpus, tmp_path):
    out = str(tmp_path / "part")
    df = corpus.withColumn("bucket", F.substring("identifier", 1, 1))
    write_corpus(df, out, partition_by=["bucket"])
    back = spark.read.parquet(out)
    assert back.count() == corpus.count()
