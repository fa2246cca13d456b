"""sf10 -> sf30 growth-ratio measurement, contention-paired.

Unlike two sequential tools/time_heavy.py sweeps, this runner times
each query's sf10 and sf30 rungs BACK-TO-BACK in one Spark session, so
whatever else the machine is doing (e.g. a live oracle sweep) loads
both rungs of a ratio roughly equally — the RATIO vs the 3x data ratio
is the signal, not the absolute seconds (the round-6
graph_degree_distribution lesson: compare like with like).

Usage: python -u tools/growth_ratio.py <sf10_dir> <sf30_dir> \
           [n_runs] [--fork] [query ...]
Writes growth_ratio.json {query: {sf10: s, sf30: s, ratio: r}}; an
existing artifact's rows are kept (same-name rows overwritten), so
subset runs at different n_runs merge into one table.

--fork runs EACH query in its own subprocess (one fresh Spark session
per query, both rungs inside it so the contention pairing holds).
Round-8 lesson: a single long session accumulates shuffle files and
localCheckpoint blocks in its blockmgr dir ACROSS queries — the r8
first run piled 62 GB of dead blocks from graph_triangles/kcore sf30
and ENOSPC'd the disk, producing fake rung deaths. Per-query processes
free the blockmgr at exit, bounding scratch to one query's worth.
"""

from __future__ import annotations

import json
import sys
import time

sys.path.insert(0, "/root/repo")

DEFAULT = [
    "dedup_cascade",
    "dedup_minhash",
    "dedup_minhash_tuning",
    "dedup_incremental_minhash",
    "index_inverted",
    "shuffle_deterministic",
    "text_vocab_growth",
    "graph_copurchase_topk",
    "sim_knn_graph",
    "emb_covariance",
    "graph_triangles",
    "graph_kcore",
    "dedup_clusters",
    "graph_community_lpa",
    "text_ngram_novelty",
    "dedup_allpairs_prefix",
    # controls with known round-6 verdicts (linear / flat)
    "orders_backlog",
    "dedup_containment_classes",
]


def main() -> None:
    argv = list(sys.argv[1:])
    fork = "--fork" in argv
    if fork:
        argv.remove("--fork")
    sf10 = argv[0] if len(argv) > 0 else "/tmp/sf10_seed42"
    sf30 = argv[1] if len(argv) > 1 else "/tmp/sf30_seed42"
    n_runs = int(argv[2]) if len(argv) > 2 else 1
    names = argv[3:] or DEFAULT

    if fork:  # one subprocess (= one Spark session + blockmgr) per query
        import os
        import subprocess

        # artifact lives at the repo root wherever the checkout is, and
        # a crashed per-query run must be attributable (r8 ADVICE: a
        # silent nonzero exit left no row, indistinguishable from
        # never-ran)
        repo_root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
        crashed: dict[str, int] = {}
        for name in names:
            r = subprocess.run(
                [sys.executable, "-u", __file__, sf10, sf30, str(n_runs), name],
                cwd=repo_root,
            )
            if r.returncode != 0:
                crashed[name] = r.returncode
                print(f"[growth] {name}: subprocess exited {r.returncode} "
                      f"(no row written for this run)", flush=True)
        if crashed:
            print(f"[growth] crashed queries: {crashed}", flush=True)
        return

    import __spark_entry__ as m
    from curatorhadoopinterface_spark.session import get_spark

    spark = get_spark("growth-ratio")
    spark.sparkContext.setLogLevel("ERROR")
    qs = m.queries()
    out: dict[str, dict] = {}
    try:  # merge-resume: keep prior rows, overwrite re-run names
        with open("growth_ratio.json") as fh:
            prior = json.load(fh)
        out.update(
            {k: v for k, v in prior.get("times", {}).items() if k in qs}
        )
    except (OSError, ValueError):
        pass
    warm_dir = "/root/testdata/sf0.1"
    for name in names:
        row: dict = {}
        # per-query codegen warmup at a tiny SF: the generated code is
        # identical across sf dirs, so this takes the compile cost out
        # of the first timed rung (otherwise sf10 reads artificially
        # slow and the ratio reads artificially LOW)
        try:
            qs[name](spark, warm_dir).write.mode("overwrite").format(
                "noop"
            ).save()
        except Exception:
            pass
        for key, sf_dir in (("sf10", sf10), ("sf30", sf30)):
            samples = []
            for _ in range(n_runs):
                t0 = time.time()
                try:
                    qs[name](spark, sf_dir).write.mode("overwrite").format(
                        "noop"
                    ).save()
                except Exception as exc:  # record the rung death, move on
                    row[f"{key}_error"] = str(exc).splitlines()[0][:200]
                    break
                samples.append(round(time.time() - t0, 1))
            if samples:
                row[key] = min(samples)
        if "sf10" in row and "sf30" in row:
            row["ratio"] = round(row["sf30"] / max(row["sf10"], 0.1), 2)
        row["n_runs"] = n_runs
        out[name] = row
        print(f"{name}: {row}", flush=True)
        with open("growth_ratio.json", "w") as fh:
            json.dump({"n_runs": n_runs, "times": out}, fh, indent=1)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
