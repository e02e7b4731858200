#!/usr/bin/env python3
"""Local emulation of the driver's DuckDB-oracle correctness gate.

Usage: python3 tools/check_oracle.py <sfDir> <verifyOutDir>

Reads each <verifyOutDir>/<name>/ parquet (Spark output), runs the
corresponding SQL from oracle_sql.json in DuckDB over the parquet tables
in <sfDir>, sorts columns by name, and compares row-by-row.
"""
import json, sys, glob, os
import duckdb
import pandas as pd

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

def canon(df):
    df = df.reindex(sorted(df.columns), axis=1)
    # normalize dtypes: ints -> int64, floats -> float64
    for c in df.columns:
        if pd.api.types.is_integer_dtype(df[c]):
            df[c] = df[c].astype("int64")
        elif pd.api.types.is_float_dtype(df[c]):
            df[c] = df[c].astype("float64")
        elif df[c].dtype == object:
            df[c] = df[c].astype(str)
    return df.reset_index(drop=True)

def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")
    oracle = json.load(open(os.path.join(out_dir, "oracle_sql.json")))
    n_pass = n_fail = 0
    for name in sorted(oracle):
        sql = oracle[name]
        spark_files = glob.glob(os.path.join(out_dir, name, "*.parquet"))
        if not spark_files:
            print(f"FAIL {name}: no spark output")
            n_fail += 1
            continue
        try:
            got = canon(pd.concat([pd.read_parquet(f) for f in sorted(spark_files)]))
            want = canon(con.execute(sql).df())
        except Exception as e:
            print(f"FAIL {name}: {e}")
            n_fail += 1
            continue
        if list(got.columns) != list(want.columns):
            print(f"FAIL {name}: columns {list(got.columns)} != {list(want.columns)}")
            n_fail += 1
            continue
        if len(got) != len(want):
            print(f"FAIL {name}: rows {len(got)} != {len(want)}")
            n_fail += 1
            continue
        eq = got.equals(want)
        if not eq:
            # locate first mismatch for diagnostics
            diff_cols = [c for c in got.columns if not got[c].equals(want[c])]
            msg = []
            for c in diff_cols[:3]:
                neq = got[c] != want[c]
                if pd.api.types.is_float_dtype(got[c]):
                    neq = ~((got[c] == want[c]) | (got[c].isna() & want[c].isna()))
                idx = neq[neq].index[:3].tolist()
                msg.append(f"{c}@{idx}: got={got[c].iloc[idx].tolist()} want={want[c].iloc[idx].tolist()}")
            print(f"FAIL {name}: value mismatch in {diff_cols}; {'; '.join(msg)}")
            n_fail += 1
        else:
            print(f"PASS {name} ({len(got)} rows)")
            n_pass += 1
    # rows-only queries (in output but not oracle)
    for d in sorted(glob.glob(os.path.join(out_dir, "*"))):
        name = os.path.basename(d)
        if os.path.isdir(d) and name not in oracle:
            files = glob.glob(os.path.join(d, "*.parquet"))
            n = sum(len(pd.read_parquet(f)) for f in files) if files else 0
            print(f"ROWS {name}: {n} rows {'PASS' if n > 0 else 'FAIL'}")
            if n > 0: n_pass += 1
            else: n_fail += 1
    print(f"\n{n_pass} passed, {n_fail} failed")
    sys.exit(1 if n_fail else 0)

if __name__ == "__main__":
    main()
