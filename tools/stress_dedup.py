"""Measured scale-stress for the dedup family (SCALE.md evidence).

Runs dedup_minhash / dedup_simhash_hamming / dedup_clusters at 1x, Kx/2
and Kx document volume (Kx dirs built by tools/make_stress_sf.py, which
replicates every text K times -> K-sized exact-duplicate clusters on top
of the base corpus), and records MEASURED (not asserted):

  - wall time (best of 2)
  - stage count + total shuffle read bytes (AppStatusStore delta)
  - LSH candidate-pair count vs the all-pairs quadratic baseline
  - verified output rows

Sub-quadratic evidence: candidates / C(n_docs, 2) must SHRINK as the
corpus grows — the LSH join keys collisions, never the cross product.
(The planted exact-duplicate clusters themselves grow their pair count
as K^2 by construction; the claim under test is about the join's
candidate volume relative to all-pairs, not about the fixture's
duplicate density.)

Usage: python tools/stress_dedup.py [base_sf_dir] [K]
       (defaults /root/testdata/sf0.1 10; prints a markdown table)
"""

from __future__ import annotations

import json
import math
import os
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def stage_snapshot(spark):
    from bench import _stage_snapshot

    return _stage_snapshot(spark)


def run_measured(spark, fn, sf_dir):
    best, stages, shuffle_read = float("inf"), 0, 0
    n_rows = 0
    for i in range(2):
        before = stage_snapshot(spark)
        t0 = time.time()
        df = fn(spark, sf_dir)
        df.write.mode("overwrite").format("noop").save()
        dt = time.time() - t0
        time.sleep(0.4)
        after = stage_snapshot(spark)
        if dt < best:
            best = dt
            new = {k: v for k, v in after.items() if k not in before}
            stages = len(new)
            shuffle_read = sum(v[0] for v in new.values())
    return {"sec": round(best, 2), "stages": stages, "shuffle_mb": round(shuffle_read / 1e6, 2)}


def make_jittered(base: str, out: str, k: int, step: int = 5) -> None:
    """K copies of documents.parquet where every 5th word of each copy
    is replaced by a copy-specific token — shingle Jaccard between
    copies drops to ~0.2, far below the verify threshold, so copies are
    NOT near-duplicates of each other. True near-dup pairs then grow
    LINEARLY in K (each copy keeps its own internal near-dups) and the
    candidate count isolates LSH join growth instead of the planted
    quadratic of exact replication."""
    import pandas as pd

    os.makedirs(out, exist_ok=True)
    src = pd.read_parquet(f"{base}/documents.parquet")
    stride = 10 ** len(str(int(src["doc_id"].max())))
    copies = []
    for c in range(k):
        cp = src.copy()
        cp["doc_id"] = cp["doc_id"] + c * stride
        if c > 0:
            # replacement tokens are unique PER DOC (not per copy), so
            # jitter introduces no new cross-doc shingle collisions
            cp["text"] = [
                " ".join(
                    f"cp{c}d{d}w{j}" if j % step == 0 else w
                    for j, w in enumerate(t.split(" "))
                )
                for d, t in zip(cp["doc_id"], cp["text"])
            ]
            cp["n_chars"] = cp["text"].str.len()
        copies.append(cp)
    pd.concat(copies, ignore_index=True).to_parquet(f"{out}/documents.parquet")


def main() -> None:
    base = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    k = int(sys.argv[2]) if len(sys.argv) > 2 else 10
    jitter = "--jitter" in sys.argv

    if jitter:
        step = 2 if "--heavy" in sys.argv else 5
        dirs = [("1x", base)]
        for kk in sorted({max(2, k // 2), k}):
            out = f"/tmp/sf_jitter{step}_{kk}x"
            if not os.path.isdir(out):
                make_jittered(base, out, kk, step)
            dirs.append((f"{kk}x", out))
        run_suite(dirs)
        return

    dirs = [("1x", base)]
    for kk in sorted({max(2, k // 2), k}):
        out = f"/tmp/sf_stress_{kk}x"
        if not os.path.isdir(out):
            subprocess.run(
                [sys.executable, os.path.join(os.path.dirname(__file__), "make_stress_sf.py"), base, out, str(kk)],
                check=True,
                capture_output=True,
            )
        dirs.append((f"{kk}x", out))
    run_suite(dirs)


def run_suite(dirs) -> None:
    from curatorhadoopinterface_spark.operators.dedup import (
        dedup_clusters,
        dedup_minhash,
        dedup_simhash_hamming,
        minhash_candidates,
    )
    from curatorhadoopinterface_spark.session import get_spark, load_table

    spark = get_spark("stress-dedup", cpus=32)
    spark.sparkContext.setLogLevel("ERROR")

    rows = []
    for label, d in dirs:
        n_docs = load_table(spark, d, "documents").count()
        allpairs = n_docs * (n_docs - 1) // 2
        cands = minhash_candidates(spark, d).count()
        out_pairs = dedup_minhash(spark, d).count()
        mh = run_measured(spark, dedup_minhash, d)
        sh = run_measured(spark, dedup_simhash_hamming, d)
        cl = run_measured(spark, dedup_clusters, d)
        rows.append(
            {
                "scale": label,
                "n_docs": n_docs,
                "allpairs": allpairs,
                "candidates": cands,
                "cand_frac": cands / allpairs,
                "verified_pairs": out_pairs,
                "minhash": mh,
                "simhash_hamming": sh,
                "clusters": cl,
            }
        )
        print(json.dumps(rows[-1]), flush=True)

    print("\n| scale | docs | all-pairs | LSH candidates | cand/all-pairs | verified | minhash s / stages / shufMB | simhash s | clusters s |")
    print("|---|---|---|---|---|---|---|---|---|")
    for r in rows:
        m, s, c = r["minhash"], r["simhash_hamming"], r["clusters"]
        print(
            f"| {r['scale']} | {r['n_docs']:,} | {r['allpairs']:.2e} | "
            f"{r['candidates']:,} | {r['cand_frac']:.2e} | {r['verified_pairs']:,} | "
            f"{m['sec']} / {m['stages']} / {m['shuffle_mb']} | {s['sec']} | {c['sec']} |"
        )
    # growth exponent: candidates ~ n^a  (a < 2 == sub-quadratic, measured)
    if len(rows) >= 2:
        a = math.log(rows[-1]["candidates"] / rows[0]["candidates"]) / math.log(
            rows[-1]["n_docs"] / rows[0]["n_docs"]
        )
        print(f"\nmeasured candidate growth exponent: n^{a:.2f} (2.00 = quadratic)")


if __name__ == "__main__":
    main()
