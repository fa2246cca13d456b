"""AQE skew-join splitting: SCALE.md names AQE as the first line of
defense for hot keys (salting second — join_salted_skew). This pins the
claim: a planted 90%-one-key fact actually triggers
SortMergeJoin(skew=true) with a split AQEShuffleRead, and the result is
unchanged. Thresholds are lowered in a try/finally window (the defaults
are sized for executor-scale partitions, invisible on toy data)."""

import pyspark.sql.functions as F


def _fact_dim(spark):
    fact = spark.range(0, 2_000_000).select(
        F.when(F.col("id") % 10 != 0, 0).otherwise(F.col("id")).alias("k"),
        (F.col("id") % 97).cast("double").alias("v"),
    )
    dim = spark.range(0, 200_000).select(
        F.col("id").alias("k"), (F.col("id") % 7).alias("grp")
    )
    return fact, dim


def test_aqe_splits_planted_skew_and_preserves_results(spark):
    confs = {
        "spark.sql.autoBroadcastJoinThreshold": "-1",
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes": "1MB",
        "spark.sql.adaptive.advisoryPartitionSizeInBytes": "1MB",
    }
    old = {k: spark.conf.get(k) for k in confs}
    fact, dim = _fact_dim(spark)
    try:
        for k, v in confs.items():
            spark.conf.set(k, v)
        j = fact.join(dim, "k").groupBy("grp").agg(F.round(F.sum("v"), 4).alias("s"))
        skewed = {tuple(r) for r in j.collect()}
        plan = j._jdf.queryExecution().executedPlan().toString()
        assert "skew=true" in plan, plan[:1500]
        assert "skewed" in plan  # AQEShuffleRead coalesced and skewed
    finally:
        for k, v in old.items():
            spark.conf.set(k, v)
    plain = {
        tuple(r)
        for r in fact.join(dim, "k")
        .groupBy("grp")
        .agg(F.round(F.sum("v"), 4).alias("s"))
        .collect()
    }
    assert skewed == plain
