#!/usr/bin/env python3
"""Local replica of the driver's correctness gate.

Usage: python3 scripts/check_oracle.py <verify_out_dir> [sf_dir]

Reads each <out_dir>/<name>/ parquet (Spark result) and oracle_sql.json,
runs the oracle SQL in DuckDB against the sf parquet tables, and compares:
columns sorted by name, rows sorted by all columns, exact value equality.
"""
import sys, json, glob, os
import duckdb
import pandas as pd

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()

def norm(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    df = df.sort_values(by=list(df.columns), kind="mergesort", na_position="first")
    return df.reset_index(drop=True)

def main():
    out_dir = sys.argv[1]
    sf_dir = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.01"
    con = duckdb.connect()
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        if os.path.exists(p):
            con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")
    with open(f"{out_dir}/oracle_sql.json") as f:
        oracle = json.load(f)
    n_pass = n_fail = 0
    for name, sql in sorted(oracle.items()):
        spark_files = glob.glob(f"{out_dir}/{name}/*.parquet")
        if not spark_files:
            print(f"FAIL {name}: no spark output")
            n_fail += 1
            continue
        try:
            spark_df = pd.concat([pd.read_parquet(p) for p in spark_files])
            duck_df = con.sql(sql).df()
        except Exception as e:
            print(f"FAIL {name}: {str(e).splitlines()[0][:200]}")
            n_fail += 1
            continue
        s, d = norm(spark_df), norm(duck_df)
        if list(s.columns) != list(d.columns):
            print(f"FAIL {name}: columns spark={list(s.columns)} duck={list(d.columns)}")
            n_fail += 1
            continue
        if len(s) != len(d):
            print(f"FAIL {name}: rows spark={len(s)} duck={len(d)}")
            n_fail += 1
            continue
        mismatch = None
        for c in s.columns:
            sv, dv = s[c], d[c]
            try:
                eq = (sv.isna() & dv.isna()) | (sv == dv)
            except Exception:
                eq = sv.astype(str) == dv.astype(str)
            if not eq.all():
                i = int((~eq).idxmax())
                mismatch = f"col {c} row {i}: spark={sv[i]!r} duck={dv[i]!r} (dtypes {sv.dtype}/{dv.dtype})"
                break
            if str(sv.dtype) != str(dv.dtype):
                print(f"  note {name}.{c}: dtype spark={sv.dtype} duck={dv.dtype} (values equal)")
        if mismatch:
            print(f"FAIL {name}: {mismatch}")
            n_fail += 1
        else:
            print(f"PASS {name} ({len(s)} rows, {len(s.columns)} cols)")
            n_pass += 1
    # queries without oracle entries -> rows-only
    for d in sorted(glob.glob(f"{out_dir}/*/")):
        name = os.path.basename(d.rstrip("/"))
        if name not in oracle:
            files = glob.glob(f"{d}/*.parquet")
            rows = sum(len(pd.read_parquet(p)) for p in files) if files else 0
            print(f"ROWS-ONLY {name}: {rows} rows")
    print(f"== {n_pass} pass / {n_fail} fail ==")
    sys.exit(1 if n_fail else 0)

if __name__ == "__main__":
    main()
