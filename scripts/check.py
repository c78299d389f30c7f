#!/usr/bin/env python3
"""Local pre-check mimicking the driver's DuckDB oracle compare.

Usage: python3 scripts/check.py <sfDir> <verifyOutDir>
Reads <out>/<name>/ parquet + <out>/oracle_sql.json, runs each oracle in
DuckDB with views over <sfDir>/*.parquet, and value-compares
(rows sorted, columns sorted by name, floats to 9 sig figs).
"""
import sys, json, glob, os
import duckdb

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()

def canon(df):
    import pandas as pd
    df = df.reindex(sorted(df.columns), axis=1)
    def norm(v):
        if v is None or v != v:
            return "NULL"
        if isinstance(v, float):
            return f"{v:.9g}"
        return str(v)
    rows = sorted(tuple(norm(v) for v in row) for row in df.itertuples(index=False, name=None))
    return rows

def main(sf_dir, out_dir, only=None):
    con = duckdb.connect()
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        if os.path.isdir(p):  # Spark-written table: a directory of parts
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}/*.parquet'")
        elif os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_ok = n_bad = 0
    for name in sorted(oracle):
        if only and name not in only:
            continue
        res_dir = f"{out_dir}/{name}"
        files = glob.glob(f"{res_dir}/*.parquet")
        if not files:
            print(f"FAIL {name}: no result parquet"); n_bad += 1; continue
        try:
            got = con.execute(f"SELECT * FROM '{res_dir}/*.parquet'").df()
            want = con.execute(oracle[name]).df()
        except Exception as e:
            print(f"FAIL {name}: {e}"); n_bad += 1; continue
        cg, cw = canon(got), canon(want)
        # dtype *kind* must match too — the driver hashes raw values, so
        # an int64 Spark column vs a float64 (HUGEINT) oracle column is a
        # driver-side hash mismatch even when the normalized strings agree
        kinds_g = {c: got[c].dtype.kind for c in got.columns}
        kinds_w = {c: want[c].dtype.kind for c in want.columns}
        if sorted(got.columns) != sorted(want.columns):
            print(f"FAIL {name}: columns {sorted(got.columns)} vs {sorted(want.columns)}"); n_bad += 1
        elif kinds_g != kinds_w:
            bad = {c: (kinds_g[c], kinds_w[c]) for c in kinds_g if kinds_g[c] != kinds_w.get(c)}
            print(f"FAIL {name}: dtype kinds differ {bad}"); n_bad += 1
        elif cg != cw:
            diff = [i for i, (a, b) in enumerate(zip(cg, cw)) if a != b][:3]
            print(f"FAIL {name}: {len(cg)} vs {len(cw)} rows; first diffs:")
            for i in diff:
                print(f"   got  {cg[i]}\n   want {cw[i]}")
            if len(cg) != len(cw):
                only_g = [r for r in cg if r not in set(map(tuple, cw))][:2]
                only_w = [r for r in cw if r not in set(map(tuple, cg))][:2]
                print(f"   only-got {only_g}\n   only-want {only_w}")
            n_bad += 1
        else:
            print(f"OK   {name} ({len(cg)} rows)"); n_ok += 1
    # queries with no oracle → rows-only
    for res_dir in sorted(glob.glob(f"{out_dir}/*/")):
        name = os.path.basename(res_dir.rstrip("/"))
        if only and name not in only:
            continue
        if name not in oracle:
            n = con.execute(f"SELECT count(*) FROM '{res_dir}/*.parquet'").fetchone()[0]
            print(f"ROWS {name}: {n}")
    print(f"== {n_ok} ok, {n_bad} bad ==")
    return 1 if n_bad else 0

if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2],
                  set(sys.argv[3].split(",")) if len(sys.argv) > 3 else None))
