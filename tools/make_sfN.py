#!/usr/bin/env python3
"""Synthesize an N-times replica scale probe from the driver's sf0.1 tables.

Generalizes tools/make_sf1.py (fixed 10x) to an arbitrary replica factor:
fact tables are replicated FACTOR times with a 10^7 id stride per replica
(base keys top out below 10^6, so keys stay corpus-unique up to ~900
replicas); dimension tables are copied once, so fact->dim joins fan out
FACTOR-fold like a real scale-up. Text/content is NOT varied per replica:
cross-replica exact duplication is the worst case for the dedup family,
which is exactly what a scale probe should stress.

This is a PERFORMANCE fixture only - correctness gates always run against
the driver's own testdata.

Usage: python3 tools/make_sfN.py FACTOR [out_dir]
       (e.g. FACTOR=100 -> a "sf10-equivalent" probe in /root/repo/.bench/sf10)
"""
import os, sys
import duckdb

SRC = "/root/testdata/sf0.1"
STRIDE = 10_000_000

# table -> columns to offset per replica (same map as make_sf1.py)
OFFSETS = {
    "documents": ["doc_id"],
    "embeddings": ["vec_id"],
    "events": ["event_id", "user_id"],
    "orders": ["o_orderkey", "o_custkey"],
    "customer": ["c_custkey"],
    "lineitem": ["l_orderkey"],
}
DIMS = ["region", "nation", "supplier", "part"]


def main(factor, out_dir):
    assert 2 <= factor <= 900, f"factor {factor} out of the unique-key range"
    os.makedirs(out_dir, exist_ok=True)
    con = duckdb.connect()
    for t, keys in OFFSETS.items():
        cols = [c[0] for c in con.execute(
            f"DESCRIBE SELECT * FROM read_parquet('{SRC}/{t}.parquet')").fetchall()]
        sel = ", ".join(
            f"{c} + r.r * {STRIDE} AS {c}" if c in keys else c for c in cols)
        con.execute(f"""
            COPY (SELECT {sel}
                  FROM read_parquet('{SRC}/{t}.parquet'), range({factor}) AS r(r)
                  ORDER BY r.r)
            TO '{out_dir}/{t}.parquet' (FORMAT PARQUET)""")
        n = con.execute(f"SELECT COUNT(*) FROM read_parquet('{out_dir}/{t}.parquet')").fetchone()[0]
        print(f"{t}: {n} rows")
    for t in DIMS:
        con.execute(f"""
            COPY (SELECT * FROM read_parquet('{SRC}/{t}.parquet'))
            TO '{out_dir}/{t}.parquet' (FORMAT PARQUET)""")
        print(f"{t}: copied")


if __name__ == "__main__":
    factor = int(sys.argv[1])
    main(factor, sys.argv[2] if len(sys.argv) > 2 else f"/root/repo/.bench/sf{factor // 10}")
