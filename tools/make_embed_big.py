#!/usr/bin/env python3
"""Generate a multi-GB high-dimensional embedding fixture (verdict r13
ask 4): the grouped-cross replication constant (2G x packed corpus,
REVIEW_r13 §6) was untestable because every existing fixture sits >=30x
under the traffic bind. This produces an `embeddings` table big enough
that the packed DISTINCT corpus is hundreds of MB to GB, so 2G x |C| is
multi-GB and the replication term is measurable against the kernel.

Deterministic and seedless-stable (splitmix64 on the vector index), no
numpy dependency games: vectors are unit-normalized pseudo-gaussians via
Box-Muller on splitmix streams. Duplication factor `dup` repeats each
distinct vector under distinct vec_ids — the exact-collapse stage eats
the copies, so kernel work scales with n_distinct while scan/collapse
traffic scales with n_rows (the 100 TB crawl shape).

Usage: python3 tools/make_embed_big.py N_DISTINCT DIM DUP OUT_DIR
  e.g.  python3 tools/make_embed_big.py 500000 256 4 /root/repo/.bench/embed_big

Writes OUT_DIR/embeddings.parquet with the standard schema
(vec_id: long, embedding: array<float> DIM-dim, label: int).
Other tables are NOT written - point probes at it with
SPARK_GRAFT_BENCH_ONLY on embedding-only queries, or call the operators
directly.
"""
import math
import os
import sys

import pyarrow as pa
import pyarrow.parquet as pq


def splitmix64(x):
    x = (x + 0x9E3779B97F4A7C15) & 0xFFFFFFFFFFFFFFFF
    x = ((x ^ (x >> 30)) * 0xBF58476D1CE4E5B9) & 0xFFFFFFFFFFFFFFFF
    x = ((x ^ (x >> 27)) * 0x94D049BB133111EB) & 0xFFFFFFFFFFFFFFFF
    return x ^ (x >> 31)


def main():
    n_distinct, dim, dup = int(sys.argv[1]), int(sys.argv[2]), int(sys.argv[3])
    out = sys.argv[4]
    os.makedirs(out, exist_ok=True)
    path = os.path.join(out, "embeddings.parquet")
    writer = None
    batch_rows = 50_000
    try:
        import numpy as np

        def sm64(x):
            # vectorized splitmix64 over a uint64 ndarray
            with np.errstate(over="ignore"):
                x = x + np.uint64(0x9E3779B97F4A7C15)
                x = (x ^ (x >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)
                x = (x ^ (x >> np.uint64(27))) * np.uint64(0x94D049BB133111EB)
                return x ^ (x >> np.uint64(31))

        def gen_block(lo, hi):
            # two splitmix streams -> Box-Muller pairs, unit-normalized rows
            n = hi - lo
            half = (dim + 1) // 2
            base = (np.arange(lo, hi, dtype=np.uint64) * np.uint64(dim))[:, None]
            j2 = np.arange(0, 2 * half, 2, dtype=np.uint64)[None, :]
            s1 = sm64(base + j2)
            s2 = sm64(base + j2 + np.uint64(1))
            u1 = np.clip((s1 >> np.uint64(11)).astype(np.float64) / float(1 << 53),
                         1e-12, 1.0)
            u2 = (s2 >> np.uint64(11)).astype(np.float64) / float(1 << 53)
            r = np.sqrt(-2.0 * np.log(u1))
            cols = np.empty((n, 2 * half), dtype=np.float64)
            cols[:, 0::2] = r * np.cos(2 * math.pi * u2)
            cols[:, 1::2] = r * np.sin(2 * math.pi * u2)
            v = cols[:, :dim].astype(np.float32)
            norms = np.sqrt((v.astype(np.float64) ** 2).sum(axis=1))
            norms[norms == 0] = 1.0
            return (v / norms[:, None]).astype(np.float32)
    except ImportError:
        sys.exit("numpy required (driver-side tooling environment has it)")

    total = n_distinct * dup
    row_id = 0
    for lo in range(0, n_distinct, batch_rows):
        hi = min(lo + batch_rows, n_distinct)
        block = gen_block(lo, hi)
        # dup copies of each distinct vector, vec_ids striped so copies of
        # one vector are spread across the id space (worst case for any
        # locality assumption in the collapse)
        for d in range(dup):
            ids = [int(i) + d * n_distinct for i in range(lo, hi)]
            arr = pa.FixedSizeListArray.from_arrays(
                pa.array(block.reshape(-1), type=pa.float32()), dim)
            # standard schema uses variable list<float>
            arr = arr.cast(pa.list_(pa.float32()))
            tab = pa.table({
                "vec_id": pa.array(ids, type=pa.int64()),
                "embedding": arr,
                "label": pa.array([i % 20 for i in range(lo, hi)],
                                  type=pa.int32()),
            })
            if writer is None:
                writer = pq.ParquetWriter(path, tab.schema)
            writer.write_table(tab)
            row_id += hi - lo
        print(f"\r{row_id}/{total} rows", end="", flush=True)
    if writer:
        writer.close()
    print(f"\nwrote {path}: {total} rows ({n_distinct} distinct x {dup}), "
          f"{dim}-dim, ~{total * dim * 4 / 1e9:.2f} GB of vector payload")


if __name__ == "__main__":
    main()
