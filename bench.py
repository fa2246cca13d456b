"""Benchmark harness (driver contract).

Runs the headline queries at $SPARK_GRAFT_SF_DIR (default
/root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints ONE JSON
line: {"metric": ..., "value": total_sec, "unit": "sec",
"queries": {name: sec, ...}, "sf": ...}.

Each query is forced end-to-end with a noop sink (full computation, no
driver collect — the 100 TB-honest way to measure).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

HEADLINE = [
    "flagship_pricing_summary",
    "flagship_local_supplier_volume",
    "scan_parquet",
    "join_broadcast",
    "join_sortmerge",
    "join_asof",
    "agg_groupby",
    "agg_cube",
    "win_running_sum",
    "topk_per_group",
    "str_funcs",
    "math_funcs",
]

# extensions appended as they land (dedup/similarity/text analysis/
# streaming/UDF surface/multimodal)
OPTIONAL = [
    "dedup_minhash",
    "sim_topk",
    "text_stats",
    "annotate_pipeline",
    "stream_window_agg",
    "udtf_explode",
    "mm_decode_features",
    "sessionize_events",
    "text_vocab",
    "text_tfidf",
    "sample_stratified",
    "dedup_clusters",
    "corpus_cleanup",
    "index_inverted",
    "agg_entropy",
    "ts_spine_fill",
    "having_topk",
    "agg_median_mode",
    "agg_collect_list",
    "dedup_fuzzy_edit",
    "win_percentiles",
    "agg_approx_quantile",
    "graph_pagerank",
]


def run_one(qfn, spark, sf_dir: str) -> float:
    """Best of two end-to-end runs: a single sample on a shared machine
    sees 2-4x spikes from unrelated load; min-of-2 reports the
    operator's actual cost."""
    best = float("inf")
    for _ in range(2):
        t0 = time.time()
        df = qfn(spark, sf_dir)
        df.write.mode("overwrite").format("noop").save()
        best = min(best, time.time() - t0)
    return best


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]

    from curatorhadoopinterface_spark.session import get_spark
    import __spark_entry__ as entrymod

    spark = get_spark("bench")
    spark.sparkContext.setLogLevel("ERROR")
    qs = entrymod.queries()

    # warm the JVM/codegen paths outside the measured window
    qs["flagship_pricing_summary"](spark, sf_dir).write.mode("overwrite").format("noop").save()
    # ... and the Python-worker/Arrow path (daemon + worker fork per core
    # is a one-time session cost, not an operator cost)
    spark.range(64).repartition(64).mapInPandas(
        lambda it: (pdf for pdf in it), "id long"
    ).write.mode("overwrite").format("noop").save()

    names = HEADLINE + [n for n in OPTIONAL if n in qs]
    times: dict[str, float] = {}
    for name in names:
        if name not in qs:
            continue
        times[name] = round(run_one(qs[name], spark, sf_dir), 3)

    total = round(sum(times.values()), 3)
    print(
        json.dumps(
            {
                "metric": "headline_suite_total",
                "value": total,
                "unit": "sec",
                "queries": times,
                "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
            }
        )
    )


if __name__ == "__main__":
    main()
