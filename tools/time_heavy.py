"""Engine-side scale-curve timing: run queries end-to-end (noop sink,
no collect) at a given SF dir and print min-of-N wall times — used to
record the sf10 -> sf30 growth ratio for the heavyweight queries in
SCALE.md (one data point can't distinguish linear from n log n from
quadratic-with-small-constant; two can, against the 3x data ratio).

Usage: python -u tools/time_heavy.py <sf_dir> [n_runs] [query ...]
"""

from __future__ import annotations

import json
import sys
import time

sys.path.insert(0, "/root/repo")

DEFAULT = [
    "graph_degree_distribution",
    "text_boilerplate",
    "query_bm25_prf",
    "orders_backlog",
    "dedup_containment_census",
]


def main() -> None:
    sf_dir = sys.argv[1]
    n_runs = int(sys.argv[2]) if len(sys.argv) > 2 else 2
    names = sys.argv[3:] or DEFAULT

    import __spark_entry__ as m
    from curatorhadoopinterface_spark.session import get_spark

    spark = get_spark("time-heavy")
    spark.sparkContext.setLogLevel("ERROR")
    qs = m.queries()
    out = {}
    for name in names:
        samples = []
        for _ in range(n_runs):
            t0 = time.time()
            qs[name](spark, sf_dir).write.mode("overwrite").format("noop").save()
            samples.append(round(time.time() - t0, 1))
        out[name] = {"min": min(samples), "samples": samples}
        print(f"{name}: {out[name]}", flush=True)
    print(json.dumps({"sf_dir": sf_dir, "times": out}))


if __name__ == "__main__":
    main()
