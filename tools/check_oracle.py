#!/usr/bin/env python3
"""Local stand-in for the driver's DuckDB oracle compare.

Usage: check_oracle.py <sfDir> <verifyOutDir>
Reads <verifyOutDir>/oracle_sql.json, registers each parquet table from
<sfDir> as a DuckDB view, runs each oracle SQL, and compares to the
Spark result parquet at <verifyOutDir>/<name>/ — columns sorted by
name, rows sorted, exact value compare (with float tolerance report).
"""
import sys, os, json, glob
import duckdb
import pandas as pd

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()

def normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)]
    # stringify timestamps so ns/us units don't matter locally
    for c in df.columns:
        if pd.api.types.is_datetime64_any_dtype(df[c]):
            df[c] = df[c].astype("datetime64[us]")
    return df.sort_values(by=list(df.columns), ignore_index=True)

def main(sf_dir, out_dir):
    con = duckdb.connect()
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_pass = n_fail = 0
    spark_dirs = {os.path.basename(d) for d in glob.glob(f"{out_dir}/*") if os.path.isdir(d)}
    for name in sorted(spark_dirs):
        files = glob.glob(f"{out_dir}/{name}/*.parquet")
        if not files:
            print(f"NOOUT {name}: spark wrote no parquet"); n_fail += 1; continue
        got = con.execute(f"SELECT * FROM read_parquet('{out_dir}/{name}/*.parquet')").df()
        if name not in oracle:
            print(f"ROWS  {name}: {len(got)} rows (no oracle)")
            continue
        try:
            exp = con.execute(oracle[name]).df()
        except Exception as e:
            print(f"SQLERR {name}: {e}"); n_fail += 1; continue
        g, e = normalize(got), normalize(exp)
        if list(g.columns) != list(e.columns):
            print(f"SCHEMA {name}: spark={list(g.columns)} oracle={list(e.columns)}"); n_fail += 1; continue
        if len(g) != len(e):
            print(f"ROWCNT {name}: spark={len(g)} oracle={len(e)}"); n_fail += 1; continue
        try:
            pd.testing.assert_frame_equal(g, e, check_dtype=False, check_exact=True)
            # a 0==0 row match proves nothing — flag it so vacuous
            # queries (e.g. joins whose date ranges never overlap)
            # get noticed instead of silently "passing"
            tag = "PASS  " if len(g) > 0 else "VACUO "
            print(f"{tag}{name} ({len(g)} rows)"); n_pass += 1
        except AssertionError as ex:
            try:
                pd.testing.assert_frame_equal(g, e, check_dtype=False, rtol=1e-9)
                print(f"NEAR  {name}: exact hash would FAIL, but within 1e-9: {str(ex).splitlines()[0]}")
                n_fail += 1
            except AssertionError:
                print(f"VALUE {name}: {str(ex).splitlines()[-1][:200]}"); n_fail += 1
    print(f"\n{n_pass} pass, {n_fail} fail, {len(spark_dirs)-n_pass-n_fail} rows-only")

if __name__ == "__main__":
    main(sys.argv[1], sys.argv[2])
