"""Per-stage profile of declared queries: flags stages where wall time
concentrates in FEW tasks (the 1-partition/1-core trap) or where a
stage dominates the query.

Usage: python tools/stageprobe.py [--sf-dir D] [--top K] name [name ...]
Prints per query: total sec, then the top-K new stages by executor run
time with (numTasks, executorRunTime_ms, input_mb, shuffle_read_mb).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _stages(spark):
    store = spark.sparkContext._jsc.sc().statusStore()
    gw = spark.sparkContext._gateway
    seq = store.stageList(
        gw.jvm.java.util.ArrayList(), False, False,
        gw.new_array(gw.jvm.double, 0), gw.jvm.java.util.ArrayList(),
    )
    out = {}
    for i in range(seq.size()):
        s = seq.apply(i)
        out[(s.stageId(), s.attemptId())] = {
            "tasks": s.numCompleteTasks(),
            "run_ms": s.executorRunTime(),
            "cpu_ms": s.executorCpuTime() // 1_000_000,
            "input_mb": round(s.inputBytes() / 1e6, 1),
            "sr_mb": round(s.shuffleReadBytes() / 1e6, 1),
            "name": s.name(),
        }
    return out


def main() -> None:
    args = sys.argv[1:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    top = 6
    names = []
    i = 0
    while i < len(args):
        if args[i] == "--sf-dir":
            sf_dir = args[i + 1]; i += 2
        elif args[i] == "--top":
            top = int(args[i + 1]); i += 2
        else:
            names.append(args[i]); i += 1

    from curatorhadoopinterface_spark.session import get_spark
    import __spark_entry__ as entrymod

    spark = get_spark("stageprobe")
    spark.sparkContext.setLogLevel("ERROR")
    qs = entrymod.queries()
    qs["flagship_pricing_summary"](spark, sf_dir).write.mode("overwrite").format("noop").save()
    spark.range(64).repartition(64).mapInPandas(
        lambda it: (pdf for pdf in it), "id long"
    ).write.mode("overwrite").format("noop").save()

    for name in names:
        if name not in qs:
            print(f"== {name}: unknown"); continue
        # warm once so codegen/jit doesn't pollute the profiled run
        qs[name](spark, sf_dir).write.mode("overwrite").format("noop").save()
        before = _stages(spark)
        t0 = time.time()
        qs[name](spark, sf_dir).write.mode("overwrite").format("noop").save()
        wall = time.time() - t0
        time.sleep(0.4)
        after = _stages(spark)
        new = {k: v for k, v in after.items() if k not in before}
        rows = sorted(new.values(), key=lambda v: -v["run_ms"])
        tot_run = sum(v["run_ms"] for v in new.values())
        print(f"== {name}: wall={wall:.2f}s stages={len(new)} sum_run={tot_run/1000:.2f}s")
        for v in rows[:top]:
            print(f"   tasks={v['tasks']:>3} run={v['run_ms']/1000:6.2f}s cpu={v['cpu_ms']/1000:6.2f}s in={v['input_mb']:>7} srd={v['sr_mb']:>6} {v['name'][:70]}")
        sys.stdout.flush()


if __name__ == "__main__":
    main()
