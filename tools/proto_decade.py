#!/usr/bin/env python3
"""Prototype + measurement harness for the >64x embedding decade family.

make_sfN.py --distinct replica r applies: rotation by r, then the r-th
Walsh sign pattern. Both depend only on r mod 64, so replicas r and r+64
carry IDENTICAL vectors — the factor-100 fixture saturates at 64 distinct
isometry classes (round-14 verdict, Missing #1).

Shipped family (round 16; backward-compatible: identical to the old
family for r < 64, and to the round-15 family for r < 128 — every
committed fixture): replica r = a + 64*b (a = r % 64, b = r // 64)
applies
  rotation t(r) = (a + 17*b) % 64            (17 invertible mod 64)
  sign   c(j)  = walsh(a, j) XOR walsh(b, (j*q + a) % 64),
                 q = 5 for b >= 2 else 1
i.e. the old Walsh pattern times a j-SCRAMBLED Walsh pattern indexed by
the decade block. Still a signed permutation = exact isometry, and
pairwise distinct for ALL r < 4096 (`isocheck` mode, exhaustive). The
round-15 form (q = 1, a pure shift) was NOT distinct: (a, b) collides
with (a-4, b+4) whenever a = 4 mod 8 (round-15 ADVICE; first pair r=4
vs r=256, 160 pairs under 4096) — `isocheck` reproduces that census
and verifies the generator SQL against this prototype bit-exactly.

This harness measures, on the REAL sf0.1 embedding corpus, the thing the
fixture must guarantee: the number of cross-replica qualifying pairs
(cosine >= threshold) is ZERO, so the near-dup pair set is exactly
FACTOR isometric copies of the base pair set (linear in FACTOR).
Exhaustive blocked-matmul count over all factor*n vectors — no sampling.
"""
import os
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
    j = np.arange(d)
    W = walsh_matrix(d)
    if family == "old":
        rot = r % d
        sign = W[r % d, j]
    elif family == "r15":
        # the round-15 form (q=1): collides from r=256 (round-15 ADVICE)
        rot = (a + 17 * b) % d
        sign = W[a, j] * W[b, (j + a) % d]
    else:  # "new" = the round-16 fix: q=5 j-scramble in the b-term for b >= 2
        rot = (a + 17 * b) % d
        q = 5 if b >= 2 else 1
        sign = W[a, j] * W[b, (j * q + a) % d]
    # y_j = sign(j) * x_{(j + rot) % d}  (matches the SQL: embedding[1+((i-1+rot)%d)])
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


def iso_keys(d, family, n=None):
    """(rotation, sign-vector) key per replica — two replicas carry
    identical vectors on a generic corpus iff their keys are equal."""
    j = np.arange(d)
    W = walsh_matrix(d)
    keys = []
    for r in range(n if n is not None else d * d):
        a, b = r % d, r // d
        if family == "r15":
            rot = (a + 17 * b) % d
            sign = W[a, j] * W[b, (j + a) % d]
        else:
            rot = (a + 17 * b) % d
            q = 5 if b >= 2 else 1
            sign = W[a, j] * W[b, (j * q + a) % d]
        keys.append((rot, tuple(int(s) for s in sign)))
    return keys


def isocheck():
    """Exhaustive distinctness + SQL parity for the replica family.

    1. All r < dim^2 isometry keys pairwise distinct for the shipped
       (round-16, q=5) family; the round-15 (q=1) family's collision
       census is reproduced for the record (expect 160 pairs, first
       r=4 vs r=256 — round-15 ADVICE).
    2. The committed band r < 2*dim is bit-identical between the two
       families (every committed fixture has b <= 1, where q = 1).
    3. The generator's DuckDB SQL reproduces the prototype transform
       bit-exactly on the real corpus for replicas spanning b = 0..5,
       including both halves of the first r15 collision pair.
    """
    d = 64
    for family, expect_ok in (("r15", False), ("new", True)):
        keys = iso_keys(d, family)
        seen, colls = {}, []
        for r, k in enumerate(keys):
            if k in seen:
                colls.append((seen[k], r))
            else:
                seen[k] = r
        print(f"{family}: {len(colls)} collision pairs under {d*d}"
              + (f", first {colls[0]}" if colls else ""))
        assert (len(colls) == 0) == expect_ok, (family, len(colls))
        if family == "r15":
            assert colls[0] == (4, 256), colls[0]
    k15 = iso_keys(d, "r15", n=2 * d)
    k16 = iso_keys(d, "new", n=2 * d)
    assert k15 == k16, "committed band r < 128 must be bit-identical"
    print(f"committed band r < {2*d}: bit-identical between families")
    # SQL parity on the real corpus
    import importlib.util
    spec = importlib.util.spec_from_file_location(
        "make_sfN", os.path.join(os.path.dirname(__file__), "make_sfN.py"))
    gen = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(gen)
    sql_expr = gen.DISTINCT_EXPRS["embeddings"]["embedding"]
    X = load()
    n, dd = X.shape
    assert dd == d, (dd, d)
    con = duckdb.connect()
    for r in (0, 1, 63, 64, 99, 4, 256, 257, 320):
        got = con.execute(
            f"SELECT {sql_expr} FROM read_parquet('{SRC}'), "
            f"(SELECT {r} AS r) AS r ORDER BY vec_id").fetchall()
        Y_sql = np.array([row[0] for row in got], dtype=np.float32)
        Y_py = transform(X, r, d, "new")
        assert np.array_equal(Y_sql, Y_py), f"SQL != prototype at r={r}"
        print(f"r={r}: SQL == prototype ({n} vectors, bit-exact)")
    print("isocheck PASS")


def main():
    if len(sys.argv) > 1 and sys.argv[1] == "isocheck":
        isocheck()
        return
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
