#!/usr/bin/env python3
"""Local emulation of the driver's DuckDB-oracle correctness gate.

Usage: python3 tools/check.py <sfDir> <verifyOutDir>

Reads <verifyOutDir>/oracle_sql.json, runs each SQL in DuckDB with views
over <sfDir>/*.parquet, loads the Spark result parquet from
<verifyOutDir>/<name>/, and compares after sorting columns by name and
rows by all values. Exact match required (floats compared exactly first,
then with tolerance reported separately).
"""
import sys, os, json, math
import duckdb
import pandas as pd

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    # normalize timestamps/dates to strings for stable compare
    for c in df.columns:
        if str(df[c].dtype).startswith("datetime") or df[c].dtype == object:
            df[c] = df[c].astype(str)
        if str(df[c].dtype) == 'float32':
            df[c] = df[c].astype('float64')
    return df.sort_values(by=list(df.columns)).reset_index(drop=True)


def compare(name, spark_df, duck_df):
    a, b = canon(spark_df), canon(duck_df)
    if list(a.columns) != list(b.columns):
        return f"SCHEMA mismatch: spark={list(a.columns)} duck={list(b.columns)}"
    if len(a) != len(b):
        return f"ROWS mismatch: spark={len(a)} duck={len(b)}"
    for c in a.columns:
        av, bv = a[c], b[c]
        # the driver hashes values: an int64 column on one side vs float64 on
        # the other ("0" vs "0.0") hash-mismatches even when numerically
        # equal (DuckDB HUGEINT sums surface as float64 in pandas) — treat
        # dtype-kind skew as a failure like the driver would
        if {av.dtype.kind, bv.dtype.kind} == {'i', 'f'}:
            return (f"DTYPE-HASH-RISK col={c}: spark={av.dtype} duck={bv.dtype}"
                    " (int vs float hashes differently even if values equal)")
        if av.dtype.kind == 'f' or bv.dtype.kind == 'f':
            av = av.astype(float); bv = bv.astype(float)
            both_nan = av.isna() & bv.isna()
            eq = (av == bv) | both_nan
            if not eq.all():
                bad = (~eq).idxmax()
                close = ((av - bv).abs() < 1e-9) | both_nan
                tag = "EXACT-float mismatch (within 1e-9)" if close.all() else "FLOAT mismatch"
                return (f"{tag} col={c} row={bad}: spark={av[bad]!r} duck={bv[bad]!r}")
        else:
            if not (av.astype(str) == bv.astype(str)).all():
                bad = (av.astype(str) != bv.astype(str)).idxmax()
                return f"VALUE mismatch col={c} row={bad}: spark={av[bad]!r} duck={bv[bad]!r}"
    return None


def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    con = duckdb.connect()
    for t in TABLES:
        p = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")
    with open(os.path.join(out_dir, "oracle_sql.json")) as f:
        oracles = json.load(f)
    n_pass = n_fail = 0
    for name, sql in sorted(oracles.items()):
        spark_path = os.path.join(out_dir, name)
        if not os.path.exists(spark_path):
            print(f"FAIL {name}: no spark output dir"); n_fail += 1; continue
        try:
            spark_df = pd.read_parquet(spark_path)
        except Exception as e:
            print(f"FAIL {name}: cannot read spark parquet: {e}"); n_fail += 1; continue
        try:
            duck_df = con.execute(sql).df()
        except Exception as e:
            print(f"FAIL {name}: duckdb error: {e}"); n_fail += 1; continue
        err = compare(name, spark_df, duck_df)
        if err:
            print(f"FAIL {name}: {err}"); n_fail += 1
        else:
            print(f"PASS {name} ({len(spark_df)} rows)"); n_pass += 1
    print(f"== {n_pass} pass / {n_fail} fail ==")
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
