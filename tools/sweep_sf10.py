"""Round-5 100x rung: full-registry sweep at sf10 minus the documented
exclusions, in family-sized chunks so partial progress survives a kill.

Exclusions (each named, never silent — SCALE.md policy):
  - dedup_semantic: fixed-k fixture is out-of-contract above ~10x by
    design; dedup_semantic_scaledk is the in-contract form and IS swept.
  - raw-row-dump queries whose sf10 output is tens of millions of rows
    (scan_parquet 34M, join_asof/join_asof_tolerance 10M, ws_tokenize
    ~50M token rows, join_outer/join_outer_full 15M): the strict
    compare's collect+canon would measure result canonicalization, not
    engine work. Their ENGINE plans are exercised at sf10 through the
    summary-output queries that share their scans/joins, and each is
    value-exact at sf1 (202/202 round-4 full sweep).

Usage: python -u tools/sweep_sf10.py [sf_dir]    (default /tmp/sf10_seed42)
Prints one [PASS]/[FAIL] line per query (verify_local's format) plus a
final tally.
"""

from __future__ import annotations

import subprocess
import sys

sys.path.insert(0, "/root/repo")

EXCLUDE = {
    "dedup_semantic",
    # graph_link_prediction: the ENGINE runs sf10 in ~60 s (deg-capped
    # wedge join, partial-agged pair counts, spill bounded), but the
    # DuckDB ORACLE materializes the co-purchase self-join + HAVING and
    # the full wedge join before aggregating — >60 GB of temp spill at
    # sf10, disk exhaustion (measured twice, killed at 99% disk). An
    # oracle planning limit, not an engine one: value-exact at sf1 and
    # sf0.01; engine invariants at sf10 via engine_check_sf10
    # 'link_prediction' (candidates are never existing edges, common
    # > 0, jaccard <= 1000 permille).
    "graph_link_prediction",
    # dedup_clusters: the ENGINE's label propagation is linear in edges,
    # but the DuckDB ORACLE replays it as a recursive reachability CTE —
    # quadratic rows per component, and make_stress_sf's planted
    # mega-duplicate clusters push that past ~90 GB at 100x (measured,
    # killed at 88 GB RES). Engine-side green at 30x/179s (SCALE.md);
    # oracle-checked through sf3. An oracle limit, not an engine one.
    "dedup_clusters",
    "scan_parquet",
    "scan_text_corpus",
    "scan_binary_records",
    "scan_thrift_records",
    "join_asof",
    "join_asof_tolerance",
    # join_asof_nearest: same raw-dump class as join_asof (one row per
    # event, 10M at sf10); value-exact at sf1 (10x, 1M rows) and the
    # plan is the identical union-sort exchange join_asof exercises.
    "join_asof_nearest",
    # dedup_minhash_recall: the ground-truth side is an AUDIT-only
    # sample x corpus exact verify (10% x all) — quadratic by intent;
    # at sf10 that is 50k x 500k set intersections on BOTH engines.
    # The production candidate machinery it measures IS swept at sf10
    # (dedup_minhash, dedup_clusters census). Value-exact through sf0.1.
    "dedup_minhash_recall",
    "join_outer",
    "join_outer_full",
    "ws_tokenize",
    # math_funcs / udf_scalar: per-row scalar dumps over lineitem — 60M
    # rows (3.3 GiB serialized for math_funcs) breach driver
    # maxResultSize; the same expressions are value-exact at sf1 and
    # scan-local by plan audit.
    "math_funcs",
    "udf_scalar",
    # dedup_embed_cosine: the raw near-dup PAIR dump is ~10M rows at
    # sf10 (measured ~8-25% of 88.6M candidates) and the oracle-side
    # pair materialization exceeded 80 GB RSS (killed). The IDENTICAL
    # join plan is swept at sf10 through dedup_embed_cosine_census
    # (O(1) census output); the pair dump stays value-exact at sf1.
    "dedup_embed_cosine",
    # dedup_keep_best: same ORACLE limit as dedup_clusters (documented
    # above) — the DuckDB side replays connected components as a
    # recursive reachability CTE, quadratic rows per planted
    # mega-cluster (>100 GB RSS at 100x, killed twice). The engine's
    # linear label propagation is the dedup_clusters machinery already
    # engine-green at 30x; dedup_keep_best is oracle-checked through
    # sf1 (SCALE.md round-5 rung).
    "dedup_keep_best",
}

CHUNK = 12


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/sf10_seed42"
    import __spark_entry__ as m

    names = [n for n in sorted(m.queries()) if n not in EXCLUDE]
    print(f"sweeping {len(names)} queries at {sf_dir} "
          f"({len(EXCLUDE)} documented exclusions)", flush=True)
    n_pass = n_fail = 0
    for i in range(0, len(names), CHUNK):
        chunk = names[i : i + CHUNK]
        r = subprocess.run(
            [sys.executable, "-u", "tools/verify_local.py", sf_dir, *chunk],
            capture_output=True,
            text=True,
            cwd="/root/repo",
        )
        for ln in (r.stdout + r.stderr).replace("\r", "\n").splitlines():
            if ln.startswith("[PASS]") or ln.startswith("[WEAK]"):
                n_pass += 1
                print(ln, flush=True)
            elif ln.startswith("[FAIL]"):
                n_fail += 1
                print(ln, flush=True)
        if r.returncode != 0 and "[FAIL]" not in r.stdout:
            print(f"[CHUNK-ERROR] {chunk}: rc={r.returncode} "
                  f"{r.stderr[-500:]}", flush=True)
    print(f"\nsf10 rung: {n_pass} pass, {n_fail} fail "
          f"of {len(names)} swept", flush=True)


if __name__ == "__main__":
    main()
