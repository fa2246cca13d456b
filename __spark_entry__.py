"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash -> CORRECTNESS_r{N}.json).

Queries are registered by the operator modules in
``curatorhadoopinterface_spark/operators/`` (SURVEY.md section 2C is the
inventory); this file only exposes the merged registry.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from curatorhadoopinterface_spark import operators as _ops


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0.

    Pricing-summary scan+filter+groupBy over ``lineitem`` (the TPC-H Q1
    shape): parquet scan with predicate pushdown, hash aggregate with
    map-side partial aggregation — the plan a 100 TB scan wants.
    """
    from curatorhadoopinterface_spark.operators.relational import flagship_pricing_summary

    return flagship_pricing_summary(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md section 2C."""
    return _ops.all_queries()


def oracle_sql() -> dict[str, str]:
    """DuckDB-equivalent SQL per query (omitted => rows-only check)."""
    return _ops.all_oracles()
