"""Declared-query registry (SURVEY.md section 2C inventory).

Every implemented operator registers a named query (Spark builder) and,
when SQL-expressible, a DuckDB oracle string. ``__spark_entry__.py``
exposes the merged registry to the driver's correctness harness.

Registration contract (driver compare sorts columns by name and hashes
values): every computed/aggregate column is aliased identically in the
Spark builder and the oracle SQL, and double-valued aggregates are
rounded in BOTH so floating-point summation order can't flip the hash.
"""

from __future__ import annotations

import importlib
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]

QUERIES: dict[str, QueryFn] = {}
ORACLE: dict[str, str] = {}

_MODULES = (
    "curatorhadoopinterface_spark.operators.relational",
    "curatorhadoopinterface_spark.operators.analytics",
    "curatorhadoopinterface_spark.operators.advanced",
    "curatorhadoopinterface_spark.operators.windows",
    "curatorhadoopinterface_spark.operators.scalars",
    "curatorhadoopinterface_spark.operators.spans",
    "curatorhadoopinterface_spark.operators.dedup",
    "curatorhadoopinterface_spark.operators.similarity",
    "curatorhadoopinterface_spark.operators.textstats",
    "curatorhadoopinterface_spark.operators.udfs",
    "curatorhadoopinterface_spark.operators.multimodal",
    "curatorhadoopinterface_spark.operators.sources",
    "curatorhadoopinterface_spark.operators.incremental_q",
    "curatorhadoopinterface_spark.operators.curation",
    "curatorhadoopinterface_spark.operators.mlops",
    "curatorhadoopinterface_spark.operators.retrieval",
    "curatorhadoopinterface_spark.operators.stats",
    "curatorhadoopinterface_spark.operators.quality",
    "curatorhadoopinterface_spark.streaming.ops",
)


def query(name: str, oracle: str | None = None) -> Callable[[QueryFn], QueryFn]:
    """Register ``fn`` as declared query ``name`` with an optional DuckDB
    oracle. Queries without an oracle get the driver's weaker rows-only
    check (reserved for genuinely non-SQL-expressible ops)."""

    def deco(fn: QueryFn) -> QueryFn:
        if name in QUERIES:
            raise ValueError(f"duplicate query name: {name}")
        QUERIES[name] = fn
        if oracle is not None:
            ORACLE[name] = oracle
        return fn

    return deco


def load_all() -> None:
    """Import every operator module so registrations run."""
    for mod in _MODULES:
        importlib.import_module(mod)


def all_queries() -> dict[str, QueryFn]:
    load_all()
    return dict(QUERIES)


def all_oracles() -> dict[str, str]:
    load_all()
    return dict(ORACLE)
