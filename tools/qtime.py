"""Isolated per-query timing + plan capture (optimization rounds).

Usage:
  python tools/qtime.py [--runs N] [--plan-dir DIR] [--sf-dir DIR] name [name ...]

Times each named declared query end-to-end with the noop sink (guide
1.4), min over N runs (default 3), after one untimed warm-up of the
session's JVM/Arrow paths. Optionally writes .explain("formatted") to
<plan-dir>/<name>.txt. Prints one JSON line per query:
  {"name": ..., "min": s, "runs": [s, ...], "stages": n,
   "shuffle_read_mb": x, "shuffle_write_mb": x}
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _stage_snapshot(spark) -> dict:
    try:
        store = spark.sparkContext._jsc.sc().statusStore()
        gw = spark.sparkContext._gateway
        seq = store.stageList(
            gw.jvm.java.util.ArrayList(),
            False,
            False,
            gw.new_array(gw.jvm.double, 0),
            gw.jvm.java.util.ArrayList(),
        )
        out = {}
        for i in range(seq.size()):
            s = seq.apply(i)
            out[(s.stageId(), s.attemptId())] = (
                s.shuffleReadBytes(),
                s.shuffleWriteBytes(),
            )
        return out
    except Exception:
        return {}


def main() -> None:
    args = sys.argv[1:]
    runs = 3
    plan_dir = None
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    names = []
    i = 0
    while i < len(args):
        if args[i] == "--runs":
            runs = int(args[i + 1]); i += 2
        elif args[i] == "--plan-dir":
            plan_dir = args[i + 1]; i += 2
        elif args[i] == "--sf-dir":
            sf_dir = args[i + 1]; i += 2
        else:
            names.append(args[i]); i += 1

    from curatorhadoopinterface_spark.session import get_spark
    import __spark_entry__ as entrymod

    spark = get_spark("qtime")
    spark.sparkContext.setLogLevel("ERROR")
    qs = entrymod.queries()

    # warm JVM + Python worker pool outside any timed window
    qs["flagship_pricing_summary"](spark, sf_dir).write.mode("overwrite").format("noop").save()
    spark.range(64).repartition(64).mapInPandas(
        lambda it: (pdf for pdf in it), "id long"
    ).write.mode("overwrite").format("noop").save()

    if plan_dir:
        os.makedirs(plan_dir, exist_ok=True)

    for name in names:
        if name not in qs:
            print(json.dumps({"name": name, "error": "unknown query"}))
            continue
        if plan_dir:
            df = qs[name](spark, sf_dir)
            with open(os.path.join(plan_dir, f"{name}.txt"), "w") as fh:
                fh.write(df._sc._jvm.PythonSQLUtils.explainString(
                    df._jdf.queryExecution(), "formatted"))
        samples = []
        plan_s = []
        fp = None
        for r in range(runs):
            spark.sparkContext.setJobDescription(f"qtime:{name}#{r}")
            before = _stage_snapshot(spark) if r == runs - 1 else None
            t0 = time.time()
            df = qs[name](spark, sf_dir)
            tb = time.time()
            # force analysis+optimization+physical planning (driver-side,
            # per-run cost) separately from execution
            df._jdf.queryExecution().executedPlan()
            t1 = time.time()
            df.write.mode("overwrite").format("noop").save()
            samples.append(round(time.time() - t0, 3))
            plan_s.append((round(tb - t0, 3), round(t1 - tb, 3)))
            if before is not None:
                time.sleep(0.4)
                after = _stage_snapshot(spark)
                new = {k: v for k, v in after.items() if k not in before}
                fp = {
                    "stages": len(new),
                    "shuffle_read_mb": round(sum(v[0] for v in new.values()) / 1e6, 2),
                    "shuffle_write_mb": round(sum(v[1] for v in new.values()) / 1e6, 2),
                }
            spark.sparkContext.setJobDescription(None)
        row = {"name": name, "min": min(samples), "runs": samples,
               "build_plan_s": plan_s}
        if fp:
            row.update(fp)
        print(json.dumps(row), flush=True)


if __name__ == "__main__":
    main()
