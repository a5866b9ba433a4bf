#!/usr/bin/env python3
"""Synthesize a 10x scale probe (sf1) from the driver's sf0.1 tables.

Fact tables are replicated 10x with a 10^7 id stride per replica (keys stay
corpus-unique; intra-replica joins stay valid); dimension tables are copied
once, so fact->dim joins fan out 10x like a real scale-up. Text/content is
NOT varied per replica: cross-replica exact duplication is the worst case
for the dedup family, which is exactly what a scale probe should stress.

This is a PERFORMANCE fixture only (VERDICT r6 #7) - correctness gates
always run against the driver's own testdata.

Usage: python3 tools/make_sf1.py [out_dir]   (default /root/repo/.bench/sf1)
"""
import os, sys
import duckdb

SRC = "/root/testdata/sf0.1"
STRIDE = 10_000_000

# table -> columns to offset per replica
OFFSETS = {
    "documents": ["doc_id"],
    "embeddings": ["vec_id"],
    "events": ["event_id", "user_id"],
    "orders": ["o_orderkey", "o_custkey"],
    "customer": ["c_custkey"],
    "lineitem": ["l_orderkey"],
}
DIMS = ["region", "nation", "supplier", "part"]


def main(out_dir):
    os.makedirs(out_dir, exist_ok=True)
    con = duckdb.connect()
    for t, keys in OFFSETS.items():
        cols = [c[0] for c in con.execute(
            f"DESCRIBE SELECT * FROM read_parquet('{SRC}/{t}.parquet')").fetchall()]
        sel = ", ".join(
            f"{c} + r.r * {STRIDE} AS {c}" if c in keys else c for c in cols)
        con.execute(f"""
            COPY (SELECT {sel}
                  FROM read_parquet('{SRC}/{t}.parquet'), range(10) AS r(r)
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
    main(sys.argv[1] if len(sys.argv) > 1 else "/root/repo/.bench/sf1")
