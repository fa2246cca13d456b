"""UDF surface (SURVEY.md section 2C rows udf_scalar / udaf_grouped / udtf).

The reference IS a UDF framework — annotator dispatch
(modified_files_in_curator/.../CuratorHandler.java:911-961 ``transform``)
runs arbitrary per-document code under MapReduce. The engine's equivalent
surface is the Arrow-vectorized Python path, exercised here end-to-end in
its three shapes:

- scalar:   ``@pandas_udf`` — Arrow batches in, Series out, fused into
  the surrounding whole-stage-codegen plan as a BatchEvalPython stage;
- grouped:  ``groupBy().applyInPandas`` — the MultiRecord / cross-record
  shape (curator.thrift:46-53 ``MultiRecord``): one pandas frame per
  group, one shuffle on the grouping key;
- tabular:  ``mapInPandas`` — 1→N row expansion per partition with no
  shuffle at all (the per-document fan-out every annotator performs).

Each query computes something a built-in could also compute — that is
deliberate: the oracle replays it in SQL, proving the Python path is
value-identical to the JVM path, which is exactly the guarantee an
annotator UDF needs before you trust it at 100 TB. Determinism: floats
are rounded in-UDF before they leave Python.

Scale notes: Arrow transfer is ~10-100x a row-at-a-time Python UDF
(pickled per row); batch size rides
``spark.sql.execution.arrow.maxRecordsPerBatch``. applyInPandas requires
each GROUP to fit in one worker's memory — group by low-cardinality,
bounded keys (here: event_type) or pre-bucket heavy keys.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import (
    DoubleType,
    StructType,
)

from curatorhadoopinterface_spark.operators import query
from curatorhadoopinterface_spark.session import load_table


@query(
    "udf_scalar",
    oracle="""
    SELECT l_orderkey, l_linenumber,
           FLOOR(l_extendedprice * (1 - l_discount) * (1 + l_tax) * 100 + 0.5) / 100
               AS charge
    FROM lineitem
    WHERE l_shipdate >= DATE '1995-01-01'
    """,
)
def udf_scalar(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Arrow scalar pandas_udf computing the TPC-H charge expression.
    The filter stays JVM-side (pushed to the parquet scan); only the
    projected batch crosses the Arrow boundary."""

    @F.pandas_udf(DoubleType())
    def charge(price: pd.Series, disc: pd.Series, tax: pd.Series) -> pd.Series:
        # half-up via floor(x*100+0.5)/100: the oracle runs the SAME IEEE
        # expression, so no rounding-mode divergence is possible
        return np.floor(price * (1.0 - disc) * (1.0 + tax) * 100 + 0.5) / 100

    li = load_table(spark, sf_dir, "lineitem")
    return li.filter(F.col("l_shipdate") >= F.lit("1995-01-01").cast("date")).select(
        "l_orderkey",
        "l_linenumber",
        charge("l_extendedprice", "l_discount", "l_tax").alias("charge"),
    )


@query(
    "udaf_grouped",
    oracle="""
    SELECT event_type,
           COUNT(*) AS n,
           ROUND(SUM(value), 4) AS total,
           ROUND(AVG(value), 4) AS mean,
           ROUND(MAX(value) - MIN(value), 4) AS spread
    FROM events GROUP BY event_type
    """,
)
def udaf_grouped(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Grouped-map UDAF via applyInPandas: one pandas frame per
    event_type (the MultiRecord shape, curator.thrift:46-53). One shuffle
    on the 5-value grouping key; each group is bounded so the
    frame-per-group contract holds at any corpus size."""
    out_schema = StructType.fromDDL(
        "event_type string, n bigint, total double, mean double, spread double"
    )

    def summarize(pdf: pd.DataFrame) -> pd.DataFrame:
        v = pdf["value"]
        return pd.DataFrame(
            {
                "event_type": [pdf["event_type"].iloc[0]],
                "n": [len(pdf)],
                "total": [round(v.sum(), 4)],
                "mean": [round(v.mean(), 4)],
                "spread": [round(v.max() - v.min(), 4)],
            }
        )

    ev = load_table(spark, sf_dir, "events").select("event_type", "value")
    return ev.groupBy("event_type").applyInPandas(summarize, out_schema)


@query(
    "udtf_explode",
    oracle="""
    SELECT doc_id,
           UNNEST(STRING_SPLIT(text, ' ')) AS word,
           LEN(UNNEST(STRING_SPLIT(text, ' '))) AS word_len
    FROM documents
    """,
)
def udtf_explode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Table-valued 1→N expansion via mapInPandas: per-document fan-out
    with zero shuffle — the tokenizer-annotator dataflow shape
    (CuratorReducer.java:74-202 reduce loop, vectorized). Batches stream
    through the Python worker; nothing is collected."""
    out_schema = StructType.fromDDL("doc_id bigint, word string, word_len int")

    def explode_words(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            words = pdf["text"].str.split(" ")
            n = words.str.len()
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"].repeat(n).values,
                    "word": [w for ws in words for w in ws],
                }
            ).assign(word_len=lambda d: d["word"].str.len().astype("int32"))

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    return docs.mapInPandas(explode_words, out_schema)
