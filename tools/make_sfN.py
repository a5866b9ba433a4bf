#!/usr/bin/env python3
"""Synthesize an N-times scale probe from the driver's sf0.1 tables.

Generalizes tools/make_sf1.py (fixed 10x) to an arbitrary factor, in two
modes:

REPLICA mode (default): fact tables are replicated FACTOR times with a
10^7 id stride per replica; dimension tables are copied once, so
fact->dim joins fan out FACTOR-fold like a real scale-up. Text/content
is NOT varied per replica: cross-replica exact duplication is the worst
case for the dedup family. This makes any operator whose OUTPUT is
per-pair/per-cluster grow quadratically in FACTOR by contract - that is
the fixture measuring the dedup operators' skew resilience, not a flaw.

DISTINCT mode (--distinct): the corpus grows by NEW distinct content
instead of duplication. Each document replica r >= 1 suffixes every
word with "_q<r>" (deterministic, seedless), so its shingle set shares
nothing across replicas while the WITHIN-replica similarity structure
is preserved - near-dup/containment/fuzzy pair outputs grow LINEARLY in
FACTOR, which is what lets the probe separate an operator's compute
scaling from its output contract (the replica fixture cannot: there the
pair-census tail is quadratic by construction). n_chars is recomputed
for the transformed text. Embedding replica r is the base vector
CIRCULARLY ROTATED by r components and SIGN-FLIPPED by the r-th Walsh
pattern (component i negated iff popcount(i & r) is odd): both are
isometries, so dot products, norms, and hence every within-replica
cosine relation are preserved EXACTLY, while cross-replica dot products
cancel term-wise - the near-dup pair set becomes FACTOR isometric
copies of the base pair set, linear in FACTOR. (Two naive forms fail
here and were measured failing: a small additive offset makes every
replica a near-duplicate of its base, 19.8x for 10x data on x4; plain
rotation leaves these structured synthetic vectors correlated above
the 0.4 threshold - 1958 qualifying cross-replica pairs vs 920 base
pairs. Walsh patterns are pairwise-orthogonal for r < 64; past 64
replicas the patterns repeat and cross-replica pairs reappear, so cap
distinct mode at factor 64.) Other fact tables carry
no content, so distinct mode replicates them exactly as replica mode
does.

Key math: base keys top out below 10^6 and the stride is 10^7, so keys
stay corpus-unique for any factor; the <= 900 bound below is only a
conservative sanity cap (900 * 10^7 still sits far inside BIGINT),
nothing breaks at 901.

This is a PERFORMANCE fixture only - correctness gates always run
against the driver's own testdata.

Usage: python3 tools/make_sfN.py FACTOR [out_dir] [--distinct]
       Default out_dir is /root/repo/.bench/sfx{FACTOR}[d] - named by the
       factor itself so two factors can never silently overwrite each
       other (the old sf{FACTOR//10} default collided within a decade;
       the round-9 fixtures sf1/sf10/sf50 made with it are kept as-is).
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

# --distinct content rewrites (r = replica index; r=0 keeps the original)
DISTINCT_EXPRS = {
    "documents": {
        "text": ("CASE WHEN r.r = 0 THEN text ELSE array_to_string("
                 "list_transform(string_split(text, ' '), "
                 "x -> x || '_q' || r.r), ' ') END"),
        # recomputed over the transformed text
        "n_chars": ("CASE WHEN r.r = 0 THEN n_chars ELSE strlen("
                    "array_to_string(list_transform(string_split(text, ' '), "
                    "x -> x || '_q' || r.r), ' ')) END"),
    },
    "embeddings": {
        # rotation by r + Walsh sign pattern r (both isometries; see header)
        "embedding": ("CASE WHEN r.r = 0 THEN embedding ELSE "
                      "list_transform(range(1, len(embedding) + 1), "
                      "i -> CAST(CASE WHEN bit_count(CAST((i - 1) AS BIGINT) "
                      "& CAST(r.r AS BIGINT)) % 2 = 1 THEN -1 ELSE 1 END "
                      "AS FLOAT) * embedding[1 + ((i - 1 + r.r) % len(embedding))]) "
                      "END"),
    },
}


def main(factor, out_dir, distinct):
    assert 2 <= factor <= 900, f"factor {factor} out of the sanity cap (see header)"
    if distinct and factor > 64:
        # Walsh sign patterns repeat past the embedding dimensionality, so
        # the embedding table saturates at 64 distinct isometry classes:
        # replicas r and r+64 carry IDENTICAL vectors (under new ids).
        # The TEXT axis ("_q<r>" suffixes) stays fully distinct at any
        # factor — a >64 fixture is valid for the text/dedup families and
        # INVALID for the embedding family (probe embeddings on <=64).
        print(f"WARNING: factor {factor} > 64 — embeddings saturate at 64 "
              "distinct isometry classes (exact duplicates across the "
              "excess replicas); use this fixture for TEXT families only")
    if os.path.isdir(out_dir) and os.listdir(out_dir):
        raise SystemExit(f"refusing to overwrite non-empty {out_dir} - "
                         "remove it or pass an explicit fresh out_dir")
    os.makedirs(out_dir, exist_ok=True)
    con = duckdb.connect()
    for t, keys in OFFSETS.items():
        rewrites = DISTINCT_EXPRS.get(t, {}) if distinct else {}
        cols = [c[0] for c in con.execute(
            f"DESCRIBE SELECT * FROM read_parquet('{SRC}/{t}.parquet')").fetchall()]
        sel = ", ".join(
            f"{c} + r.r * {STRIDE} AS {c}" if c in keys
            else f"{rewrites[c]} AS {c}" if c in rewrites
            else c for c in cols)
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
    args = [a for a in sys.argv[1:] if a != "--distinct"]
    distinct = "--distinct" in sys.argv[1:]
    factor = int(args[0])
    default = f"/root/repo/.bench/sfx{factor}{'d' if distinct else ''}"
    main(factor, args[1] if len(args) > 1 else default, distinct)
