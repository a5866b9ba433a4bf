#!/usr/bin/env python3
"""Prototype + measurement harness for the >64x embedding decade family.

make_sfN.py --distinct replica r applies: rotation by r, then the r-th
Walsh sign pattern. Both depend only on r mod 64, so replicas r and r+64
carry IDENTICAL vectors — the factor-100 fixture saturates at 64 distinct
isometry classes (round-14 verdict, Missing #1).

Candidate extension (backward-compatible: identical to the old family for
r < 64): replica r = a + 64*b (a = r % 64, b = r // 64) applies
  rotation t(r) = (a + 17*b) % 64            (17 invertible mod 64)
  sign   c(j)  = walsh(a, j) XOR walsh(b, (j + r) % 64)
i.e. the old Walsh pattern times a SHIFTED Walsh pattern indexed by the
decade block. Still a signed permutation = exact isometry, distinct for
r < 4096, and the second factor breaks the period-64 repetition.

This harness measures, on the REAL sf0.1 embedding corpus, the thing the
fixture must guarantee: the number of cross-replica qualifying pairs
(cosine >= threshold) is ZERO, so the near-dup pair set is exactly
FACTOR isometric copies of the base pair set (linear in FACTOR).
Exhaustive blocked-matmul count over all factor*n vectors — no sampling.
"""
import sys
import numpy as np
import duckdb

SRC = "/root/testdata/sf0.1/embeddings.parquet"
THRESH = 0.4


def load():
    con = duckdb.connect()
    rows = con.execute(
        f"SELECT embedding FROM read_parquet('{SRC}') ORDER BY vec_id").fetchall()
    X = np.array([r[0] for r in rows], dtype=np.float32)
    return X


def walsh_matrix(d):
    # W[r, j] = +-1 with sign (-1)^popcount(j & r)
    j = np.arange(d)
    r = np.arange(d)[:, None]
    pop = np.zeros((d, d), dtype=np.int64)
    v = j & r
    while v.any():
        pop += v & 1
        v >>= 1
    return np.where(pop % 2 == 1, -1.0, 1.0).astype(np.float32)


def transform(X, r, d, family):
    a, b = r % d, r // d
    if family == "old":
        rot, sign_a, sign_b, shift = r % d, r % d, 0, 0
    else:
        rot = (a + 17 * b) % d
        sign_a, sign_b, shift = a, b, r % d
    W = walsh_matrix(d)
    j = np.arange(d)
    sign = W[sign_a, j] * W[sign_b, (j + shift) % d]
    # y_j = sign(j) * x_{(j + rot) % d}  (matches the SQL: embedding[1+((i-1+r)%d)])
    return (sign[None, :] * X[:, (j + rot) % d]).astype(np.float32)


def count_pairs(Y, thresh, chunk=2048):
    """Exact count of unordered pairs i<j with cosine >= thresh.

    Counts ALL ordered hits then removes the diagonal and halves — one
    fused comparison per chunk, no index-grid temporaries.
    """
    import time
    n = Y.shape[0]
    norms = np.linalg.norm(Y, axis=1)
    Yn = np.ascontiguousarray(Y / norms[:, None])
    ordered = 0
    diag = 0
    t0 = time.time()
    for s in range(0, n, chunk):
        e = min(n, s + chunk)
        G = Yn[s:e] @ Yn.T  # (e-s, n)
        ordered += int((G >= thresh).sum())
        d = G[np.arange(e - s), np.arange(s, e)]
        diag += int((d >= thresh).sum())
        if s // chunk % 16 == 0:
            print(f"  chunk {s}/{n} {time.time()-t0:.1f}s", flush=True)
    return (ordered - diag) // 2


def main():
    factor = int(sys.argv[1]) if len(sys.argv) > 1 else 100
    family = sys.argv[2] if len(sys.argv) > 2 else "new"
    X = load()
    n, d = X.shape
    base = count_pairs(X, THRESH)
    print(f"corpus n={n} d={d}; base qualifying pairs (t>={THRESH}): {base}")
    Ys = [transform(X, r, d, family) for r in range(factor)]
    A = np.vstack(Ys)
    # distinct vectors across the whole fixture
    uniq = np.unique(A.round(decimals=7), axis=0).shape[0]
    base_uniq = np.unique(X.round(decimals=7), axis=0).shape[0]
    print(f"family={family} factor={factor}: distinct vectors {uniq} "
          f"(expect {factor * base_uniq} = {factor} x {base_uniq})")
    total = count_pairs(A, THRESH)
    cross = total - factor * base
    print(f"total qualifying pairs: {total}; expected within-replica "
          f"{factor * base}; CROSS-REPLICA EXCESS: {cross}")


if __name__ == "__main__":
    main()
