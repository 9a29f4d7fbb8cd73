#!/usr/bin/env python3
"""Local replica of the driver's correctness gate: run graft.Verify output
against the DuckDB oracle (oracle_sql.json) over the same parquet tables.
Usage: python3 tools/check.py <sfDir> <verifyOutDir> [query ...]
Optional query names restrict the compare to that subset — for fast
single-oracle iteration and for resuming an interrupted full pass.
(Developer tooling only — mirrors what the driver does per round.)"""
import sys, json, glob, os
import duckdb
import pandas as pd

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    for c in df.columns:
        if str(df[c].dtype).startswith("datetime64"):
            df[c] = df[c].astype("datetime64[us]")
        if df[c].dtype == object:
            df[c] = df[c].astype(str)
    return df.reset_index(drop=True)

def main(sf_dir, out_dir, only=()):
    con = duckdb.connect()
    # Scale-corpus runs (target/sf1, target/sf10) need DuckDB bounded:
    # an uncapped connection spills to the source drive's free space and
    # an unbounded memory_limit OOM-killed concurrent gate runs at the
    # 100x corpus. All optional — the driver's sf0.01 gate needs none.
    def esc(v):  # SQL-string-literal escape: paths may contain quotes
        return v.replace("'", "''")
    if os.environ.get("CHECK_DUCKDB_MEMORY"):
        con.sql(f"SET memory_limit='{esc(os.environ['CHECK_DUCKDB_MEMORY'])}'")
    if os.environ.get("CHECK_DUCKDB_TEMPDIR"):
        con.sql(f"SET temp_directory='{esc(os.environ['CHECK_DUCKDB_TEMPDIR'])}'")
    if os.environ.get("CHECK_DUCKDB_TEMPCAP"):
        con.sql(
            f"SET max_temp_directory_size='{esc(os.environ['CHECK_DUCKDB_TEMPCAP'])}'")
    if os.environ.get("CHECK_DUCKDB_THREADS"):
        con.sql(f"SET threads={int(os.environ['CHECK_DUCKDB_THREADS'])}")
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        if os.path.isdir(p):
            # Spark-written table (graft.Synth output): directory of parts
            con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{p}/*.parquet'")
        elif os.path.exists(p):
            con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    if only:
        missing = [q for q in only if q not in oracle]
        if missing:
            print(f"FAIL unknown queries: {missing}"); return 1
        oracle = {q: oracle[q] for q in only}
    n_ok = n_bad = 0
    for name, sql in sorted(oracle.items()):
        spark_path = f"{out_dir}/{name}"
        files = glob.glob(f"{spark_path}/*.parquet")
        if not files:
            print(f"FAIL {name}: no spark output"); n_bad += 1; continue
        try:
            got = canon(con.sql(f"SELECT * FROM read_parquet({files!r})").df())
            want = canon(con.sql(sql).df())
        except Exception as e:
            print(f"FAIL {name}: oracle error: {e}"); n_bad += 1; continue
        if list(got.columns) != list(want.columns):
            print(f"FAIL {name}: columns {list(got.columns)} vs {list(want.columns)}")
            n_bad += 1; continue
        if len(got) != len(want):
            print(f"FAIL {name}: rows {len(got)} vs {len(want)}"); n_bad += 1; continue
        eq = got.equals(want)
        if not eq:
            # show first differing rows
            diff = (got != want) & ~(got.isna() & want.isna())
            bad_rows = diff.any(axis=1)
            idx = list(got.index[bad_rows])[:3]
            print(f"FAIL {name}: {bad_rows.sum()} differing rows; first at {idx}")
            for i in idx:
                print("  spark:", got.loc[i].to_dict())
                print("  duck :", want.loc[i].to_dict())
            n_bad += 1
        else:
            print(f"OK   {name}: {len(got)} rows")
            n_ok += 1
    print(f"== {n_ok} ok, {n_bad} fail")
    return 1 if n_bad else 0

if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2], tuple(sys.argv[3:])))
