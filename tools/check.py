#!/usr/bin/env python3
"""Local replica of the driver's correctness gate: run Verify's oracle_sql.json
in DuckDB over the raw testdata tables and compare against the engine's parquet
dumps (columns sorted by name, values repr-hashed, row order preserved).

Canonicalization goes through the DataFrame path (``cursor.df()``), NOT
``fetchall()``: DuckDB materializes HUGEINT (the type of SUM over any integer)
as float64 in a dataframe but as Python int via fetchall, so only the dataframe
path is faithful to the driver's dtype-sensitive repr-hash. Round 1 shipped 11
hash failures that fetchall() masked locally."""
import sys, os, json, glob, hashlib
import duckdb

def canon(rows):
    return "\n".join(",".join(repr(c) for c in row) for row in rows)

def h16(rows):
    return hashlib.md5(canon(rows).encode()).hexdigest()[:16]

def df_rows(cur):
    """Columns + rows via the dtype-faithful dataframe path.

    ``to_numpy().tolist()`` converts numpy scalars to plain Python values while
    preserving the dtype distinction that matters: a HUGEINT column arrives as
    float64 and reprs as ``3.0``, an int64 column reprs as ``3``."""
    df = cur.df()
    return list(df.columns), [tuple(r) for r in df.to_numpy().tolist()]

def main(sf_dir, out_dir):
    con = duckdb.connect()
    for p in glob.glob(f"{sf_dir}/*.parquet"):
        t = os.path.basename(p)[:-8]
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_ok = n_bad = 0
    for name in sorted(oracle):
        sql = oracle[name]
        try:
            cols, rows = df_rows(con.execute(sql))
            order = sorted(range(len(cols)), key=lambda i: cols[i])
            orows = [tuple(r[i] for i in order) for r in rows]
        except Exception as e:
            print(f"FAIL {name}: oracle error: {e}")
            n_bad += 1
            continue
        pdir = f"{out_dir}/{name}"
        files = sorted(glob.glob(f"{pdir}/*.parquet"))  # deterministic multi-file order
        if not files:
            print(f"FAIL {name}: no engine output at {pdir}")
            n_bad += 1
            continue
        cols2, rows2 = df_rows(con.execute(f"SELECT * FROM read_parquet({files!r})"))
        order2 = sorted(range(len(cols2)), key=lambda i: cols2[i])
        srows = [tuple(r[i] for i in order2) for r in rows2]
        if sorted(cols) != sorted(cols2):
            print(f"FAIL {name}: schema mismatch oracle={sorted(cols)} engine={sorted(cols2)}")
            n_bad += 1
        elif h16(orows) == h16(srows):
            print(f"ok   {name}: rows={len(rows)} hash={h16(orows)}")
            n_ok += 1
        else:
            print(f"FAIL {name}: hash mismatch rows oracle={len(orows)} engine={len(srows)}")
            for i, (a, b) in enumerate(zip(orows, srows)):
                if a != b:
                    print(f"  first diff row {i}:\n   oracle: {a}\n   engine: {b}")
                    break
            n_bad += 1
    print(f"\n{n_ok} ok, {n_bad} fail")
    return 1 if n_bad else 0

if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
