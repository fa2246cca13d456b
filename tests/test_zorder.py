"""Z-order layout: the multi-dimensional data-skipping claim, measured
from actual parquet row-group footers (not asserted from theory)."""

import glob
import os

import pyspark.sql.functions as F

SF = "/root/testdata/sf0.01"


def _rowgroup_ranges(path_glob, cols):
    """[(path, rg, {col: (min, max)})] from parquet footers."""
    import pyarrow.parquet as pq

    out = []
    for p in glob.glob(path_glob):
        md = pq.ParquetFile(p).metadata
        idx = {md.schema.column(i).name: i for i in range(md.num_columns)}
        for rg in range(md.num_row_groups):
            stats = {}
            for c in cols:
                s = md.row_group(rg).column(idx[c]).statistics
                stats[c] = (s.min, s.max)
            out.append(stats)
    return out


def test_zorder_prunes_on_both_dimensions(spark):
    from curatorhadoopinterface_spark.io import scratch_dir
    from curatorhadoopinterface_spark.operators.sources import write_zorder
    from curatorhadoopinterface_spark.session import load_table

    write_zorder(spark, SF).collect()
    zdir = scratch_dir("write_zorder", SF)

    # linear baseline: the SAME rows sorted by ts only (write_sorted's
    # layout discipline applied to events)
    lindir = scratch_dir("write_zorder_linear", SF)
    e = load_table(spark, SF, "events").select("event_id", "user_id", "ts", "value")
    (
        e.repartitionByRange(16, "ts")
        .sortWithinPartitions("ts")
        .write.mode("overwrite")
        .parquet(lindir)
    )

    # box predicate: narrow USER slice, all of time — the axis a linear
    # time sort cannot skip on
    lo, hi = 100, 300

    def candidate_fraction(d):
        rgs = _rowgroup_ranges(os.path.join(d, "*.parquet"), ["user_id"])
        assert rgs, d
        hits = sum(1 for s in rgs if not (s["user_id"][1] < lo or s["user_id"][0] > hi))
        return hits / len(rgs), len(rgs)

    z_frac, z_n = candidate_fraction(zdir)
    l_frac, l_n = candidate_fraction(lindir)
    # enough row groups on both sides for the comparison to mean something
    assert z_n >= 8 and l_n >= 8, (z_n, l_n)
    # time-sorted: every row group spans ~all users -> ~no pruning
    assert l_frac > 0.9, (l_frac, l_n)
    # z-order: most row groups exclude the user slice via min/max stats
    assert z_frac <= 0.5, (z_frac, z_n)

    # and correctness: the layouts hold identical data
    zc = spark.read.parquet(zdir).agg(
        F.count("*"), F.sum("user_id"), F.round(F.sum("value"), 2)
    ).collect()[0]
    lc = spark.read.parquet(lindir).agg(
        F.count("*"), F.sum("user_id"), F.round(F.sum("value"), 2)
    ).collect()[0]
    assert tuple(zc) == tuple(lc)


def test_zorder_readback_pushes_user_filter(spark):
    from curatorhadoopinterface_spark.io import scratch_dir

    zdir = scratch_dir("write_zorder", SF)
    if not os.path.isdir(zdir):
        from curatorhadoopinterface_spark.operators.sources import write_zorder

        write_zorder(spark, SF).collect()
    rb = spark.read.parquet(zdir).filter(F.col("user_id").between(100, 300))
    plan = rb._jdf.queryExecution().executedPlan().toString()
    assert "PushedFilters" in plan
    start = plan.index("PushedFilters")
    assert "user_id" in plan[start : plan.index("]", start)]
