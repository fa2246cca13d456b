"""Source/sink declared queries (SURVEY.md section 2C rows
``scan_text_corpus`` and ``write_parquet``).

- scan_text_corpus re-expresses A3 raw-text ingestion
  (src/.../CuratorClient.java:406-429 ``createRecordsFromRawInputFiles``):
  build Record rows with content-hash identifiers and empty view maps,
  refusing empty text (CuratorClient.java:527-536 ``addToInputList``).
  The reference identifier is SHA-1 of ``"FLAG:"+whitespaced+":"+text``
  (src/edu/illinois/cs/cogcomp/archive/Identifier.java:63-70); DuckDB has
  no sha1, so THIS declared query uses the same construction under
  sha256 to stay fully value-checked — the true SHA-1 path lives in
  ``io.read_text_corpus`` and is pinned against hashlib in
  tests/test_io.py.

- write_parquet is A5, the serialize sink + read-back verification
  (src/.../CuratorClient.java:473-496 write, HadoopCuratorClient.java:83-104
  post-write re-read check): write the corpus to parquet, read it back,
  return the re-read rows — the oracle compares them to the original
  table, which IS the round-trip equality check.
"""

from __future__ import annotations

import os
import shutil
import tempfile

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from curatorhadoopinterface_spark.operators import query
from curatorhadoopinterface_spark.session import load_table


@query(
    "scan_text_corpus",
    oracle="""
    SELECT sha256('FLAG:false:' || text) AS identifier,
           text AS raw_text,
           false AS whitespaced,
           LEN(text) AS n_chars
    FROM documents
    WHERE LEN(text) > 0
    """,
)
def scan_text_corpus(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Raw-corpus ingestion: text -> Record rows with content-hash
    identifiers, empty-text rows refused. One narrow projection over the
    scan — ingestion at 100 TB is bounded by read bandwidth, not CPU."""
    d = load_table(spark, sf_dir, "documents")
    return (
        d.filter(F.length("text") > 0)
        .select(
            F.sha2(F.concat(F.lit("FLAG:false:"), F.col("text")), 256).alias(
                "identifier"
            ),
            F.col("text").alias("raw_text"),
            F.lit(False).alias("whitespaced"),
            F.length("text").alias("n_chars"),
        )
    )


@query(
    "write_parquet",
    oracle="SELECT doc_id, text, lang, source, n_chars FROM documents",
)
def write_parquet(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Parquet sink + read-back: write the corpus out, return the
    re-read rows. Matching the oracle (the original table) is exactly
    the reference's post-write round-trip verification
    (HadoopCuratorClient.java:93-97). Scratch output lands in a temp dir
    outside the repo and is removed on the next call."""
    out = os.path.join(tempfile.gettempdir(), "curatorhadoopinterface_spark_write_parquet")
    shutil.rmtree(out, ignore_errors=True)
    d = load_table(spark, sf_dir, "documents")
    d.write.mode("overwrite").parquet(out)
    return spark.read.parquet(out)
