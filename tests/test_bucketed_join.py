"""Bucketed co-located join (SCALE.md / SURVEY.md M7): pre-bucketing
both fact tables on the join key removes the per-query shuffle — the
physical plan must show a join over bucketed scans with NO Exchange on
either side. At 100 TB this converts every recurring orders-lineitem
join from a full-corpus shuffle into a local merge."""

from __future__ import annotations

import io
from contextlib import redirect_stdout

import pytest
import pyspark.sql.functions as F


@pytest.fixture(scope="module")
def bucketed_tables(spark, sf_dir, tmp_path_factory):
    wh = str(tmp_path_factory.mktemp("bucketed_wh"))
    from curatorhadoopinterface_spark.session import load_table

    load_table(spark, sf_dir, "orders").write.bucketBy(8, "o_orderkey").sortBy(
        "o_orderkey"
    ).option("path", f"{wh}/b_orders").mode("overwrite").saveAsTable("b_orders")
    load_table(spark, sf_dir, "lineitem").write.bucketBy(8, "l_orderkey").sortBy(
        "l_orderkey"
    ).option("path", f"{wh}/b_lineitem").mode("overwrite").saveAsTable("b_lineitem")
    yield "b_orders", "b_lineitem"
    spark.sql("DROP TABLE IF EXISTS b_orders")
    spark.sql("DROP TABLE IF EXISTS b_lineitem")


def _plan(df) -> str:
    buf = io.StringIO()
    with redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def test_bucketed_join_has_no_shuffle(spark, sf_dir, bucketed_tables):
    import re

    o, li = bucketed_tables
    joined = (
        spark.table(o)
        # hint forces the merge join the planner would pick on big facts
        # (these sf0.001 tables fall under the broadcast threshold)
        .join(spark.table(li).hint("merge"), F.col("o_orderkey") == F.col("l_orderkey"))
        .groupBy("o_orderpriority")
        .agg(F.count("*").alias("n"))
    )
    plan = _plan(joined)
    assert "SortMergeJoin" in plan, plan
    # exactly ONE exchange in the whole plan — the group-by's. The join
    # itself consumed the 8-bucket layout with no shuffle on either side.
    exchanges = re.findall(r"\(\d+\) Exchange", plan)
    assert len(exchanges) == 1, plan

    # and the answer matches the unbucketed join
    from curatorhadoopinterface_spark.session import load_table

    want = (
        load_table(spark, sf_dir, "orders")
        .join(
            load_table(spark, sf_dir, "lineitem"),
            F.col("o_orderkey") == F.col("l_orderkey"),
        )
        .groupBy("o_orderpriority")
        .agg(F.count("*").alias("n"))
    )
    assert sorted(map(tuple, joined.collect())) == sorted(map(tuple, want.collect()))
