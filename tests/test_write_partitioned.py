"""write_partitioned must prune day directories at the scan, not filter
rows post-read — the property the query exists to demonstrate."""

import glob
import os
import tempfile

import pyspark.sql.functions as F

from curatorhadoopinterface_spark.operators.sources import write_partitioned
from curatorhadoopinterface_spark.io import proc_scratch


def test_partition_pruning_in_readback_plan(spark):
    write_partitioned(spark, "/root/testdata/sf0.001").collect()
    out = proc_scratch("write_partitioned")
    # layout: one dir per day
    days = glob.glob(os.path.join(out, "event_date=*"))
    assert len(days) > 7, days
    rb = spark.read.parquet(out).filter(
        F.col("event_date").between("2024-01-08", "2024-01-14")
    )
    plan = rb._jdf.queryExecution().executedPlan().toString()
    # the date predicate must appear as a PartitionFilter (pruned at
    # listing time), and must NOT survive as a post-scan row Filter
    assert "PartitionFilters" in plan
    start = plan.index("PartitionFilters")
    assert "event_date" in plan[start : plan.index("]", start)]
    # pruning actually happened: the scan reads exactly 7 day-partitions
    n_days = rb.select("event_date").distinct().count()
    assert n_days == 7
