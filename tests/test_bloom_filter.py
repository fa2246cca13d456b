"""Runtime Bloom-filter join pruning (spark.sql.optimizer.runtime.
bloomFilter.*): the row-level runtime filter that complements dynamic
partition pruning — the build side's join keys are bloom-aggregated and
pushed into the probe side's scan as might_contain(), pruning shuffle
input BEFORE the join. Enabled by default in Spark 4; the injection
thresholds (10 GB probe scan) are sized for clusters, so the test lowers
them in a try/finally window. Semantics must be UNCHANGED — the pruned
plan's result is compared against the plain join."""

import pyspark.sql.functions as F

from curatorhadoopinterface_spark.session import load_table

SF = "/root/testdata/sf0.01"


def test_bloom_filter_injects_and_preserves_results(spark):
    app_key = (
        "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold"
    )
    bcast_key = "spark.sql.autoBroadcastJoinThreshold"
    old_app = spark.conf.get(app_key)
    old_bcast = spark.conf.get(bcast_key)

    def build():
        li = load_table(spark, SF, "lineitem")
        o = (
            load_table(spark, SF, "orders")
            .filter(F.col("o_orderpriority") == "1-URGENT")
            .select("o_orderkey")
        )
        return (
            li.join(o, F.col("l_orderkey") == F.col("o_orderkey"))
            .groupBy("l_returnflag")
            .agg(
                F.count(F.lit(1)).alias("n"),
                F.round(F.sum("l_quantity"), 2).alias("q"),
            )
        )

    try:
        # probe side must shuffle (bloom filters never inject under a
        # broadcast join — the dim is already driver-local there)
        spark.conf.set(bcast_key, "-1")
        spark.conf.set(app_key, "1KB")
        pruned = build()
        got = {tuple(r) for r in pruned.collect()}
        plan = pruned._jdf.queryExecution().executedPlan().toString()
        assert "might_contain" in plan, plan[:2000]
    finally:
        spark.conf.set(app_key, old_app)
        spark.conf.set(bcast_key, old_bcast)

    plain = {tuple(r) for r in build().collect()}
    assert got == plain
