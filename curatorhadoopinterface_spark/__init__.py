"""PySpark-native analytics engine with the query & data-processing
capabilities of the reference NLP-annotation dataflow system
(ILCogCompCuratorToHadoop/CuratorHadoopInterface).

The reference (see SURVEY.md) is a Hadoop MapReduce harness that runs a
dependency-resolved pipeline of NLP annotation operators over a corpus of
documents, with content-hash memoization and version-based staleness.
This package re-expresses that as idiomatic PySpark:

- a corpus is a DataFrame of ``Record`` rows (``schema.py``),
- each annotation mode is a DataFrame -> DataFrame operator backed by an
  Arrow ``pandas_udf`` (``annotators/``),
- the JobHandler's chained MapReduce jobs collapse into one lazy Catalyst
  plan driven by a topological planner over the mode DAG (``plans/``),
- the Curator archive becomes a content-hash-keyed Parquet record store
  with anti-join incremental recompute (``plans/incremental.py``),
- and the full relational surface (SURVEY.md section 2C) is exposed as
  declared queries (``operators/``) checked against a DuckDB oracle.
"""

from curatorhadoopinterface_spark.session import get_spark, load_tables

__all__ = ["get_spark", "load_tables"]
__version__ = "0.1.0"
