"""Build a key-shifted K× stress dataset from an existing SF dir.

Usage: python tools/make_stress_sf.py [src_sf_dir] [out_dir] [K]
       (defaults: /root/testdata/sf0.1  /tmp/sf_stress  5)

Each fact/entity table is unioned K times with every key column shifted
by ``copy * stride`` so foreign keys stay consistent copy-locally and
all keys stay globally unique. Text/payload columns repeat — which is
exactly what makes this a good dedup/similarity stress (duplicate
mega-clusters) on top of a volume stress. Dims (region, nation) are
kept single-copy so FK targets remain valid.

DuckDB writes the parquet, which yields TIMESTAMP_NTZ event times —
deliberately kept: it regression-tests the NTZ handling in
session.load_table / streaming.events_stream.

The oracle gate runs the same SQL on the same files, so
``python tools/verify_local.py <out_dir>`` is a full correctness sweep
at K× volume.
"""

from __future__ import annotations

import os
import sys

import duckdb

# key columns to shift, per table (copy-local FK consistency)
SHIFT: dict[str, list[str]] = {
    "customer": ["c_custkey"],
    "supplier": ["s_suppkey"],
    "part": ["p_partkey"],
    "orders": ["o_orderkey", "o_custkey"],
    "lineitem": ["l_orderkey", "l_partkey", "l_suppkey"],
    "events": ["event_id", "user_id"],
    "documents": ["doc_id"],
    "embeddings": ["vec_id"],
}
SINGLE_COPY = ("region", "nation")


def main() -> None:
    src = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    out = sys.argv[2] if len(sys.argv) > 2 else "/tmp/sf_stress"
    k = int(sys.argv[3]) if len(sys.argv) > 3 else 5
    os.makedirs(out, exist_ok=True)
    con = duckdb.connect()

    for t in SINGLE_COPY:
        con.sql(
            f"COPY (SELECT * FROM '{src}/{t}.parquet') TO '{out}/{t}.parquet'"
        )
        print(f"{t}: 1x copy")

    for t, keys in SHIFT.items():
        cols = [
            c[0]
            for c in con.sql(f"describe SELECT * FROM '{src}/{t}.parquet'").fetchall()
        ]
        # stride: next power of 10 above max key (readable shifted ids)
        maxkey = con.sql(
            f"SELECT MAX({keys[0]}) FROM '{src}/{t}.parquet'"
        ).fetchone()[0]
        stride = 10 ** len(str(int(maxkey)))
        selects = []
        for copy in range(k):
            proj = ", ".join(
                f"{c} + {copy * stride} AS {c}" if c in keys else c for c in cols
            )
            selects.append(f"SELECT {proj} FROM '{src}/{t}.parquet'")
        union = " UNION ALL ".join(selects)
        con.sql(f"COPY ({union}) TO '{out}/{t}.parquet'")
        n = con.sql(f"SELECT COUNT(*) FROM '{out}/{t}.parquet'").fetchone()[0]
        print(f"{t}: {k}x -> {n} rows (stride {stride})")


if __name__ == "__main__":
    main()
