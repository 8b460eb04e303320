#!/usr/bin/env python3
"""Local pre-validation mirroring the driver's correctness gate:
run graft.Verify output (parquet per query) against the DuckDB oracle
on the same sf-dir tables; compare schema / row count / sorted values.

Usage: python3 tools/check.py <sfDir> <verifyOutDir>
"""
import sys, json, glob, os, time
import duckdb
import pandas as pd

def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    # normalize for stable sort/compare
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].astype(str)
    return df.sort_values(by=list(df.columns), ignore_index=True)

def main(sf_dir, out_dir, only=None):
    con = duckdb.connect()
    for t in ["region","nation","customer","supplier","part","orders",
              "lineitem","events","documents","embeddings"]:
        p = f"{sf_dir}/{t}.parquet"
        if os.path.isdir(p):  # Spark-written table (gensf1 output)
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}/*.parquet'")
        elif os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    names = sorted(d for d in os.listdir(out_dir)
                   if os.path.isdir(f"{out_dir}/{d}"))
    if only:
        names = [n for n in names if n in only]
    n_pass = n_fail = 0
    for name in names:
        t0 = time.time()
        files = glob.glob(f"{out_dir}/{name}/*.parquet")
        if not files:
            print(f"FAIL {name}: no spark output"); n_fail += 1; continue
        got = pd.concat([pd.read_parquet(f) for f in files])
        if name not in oracle:
            print(f"SKIP {name}: rows-only ({len(got)} rows)")
            continue
        try:
            exp = con.execute(oracle[name]).df()
        except Exception as e:
            print(f"FAIL {name}: oracle error {e}"); n_fail += 1; continue
        g, e = canon(got), canon(exp)
        if list(g.columns) != list(e.columns):
            print(f"FAIL {name}: columns {list(g.columns)} vs {list(e.columns)}")
            n_fail += 1; continue
        if len(g) != len(e):
            print(f"FAIL {name}: rows {len(g)} vs {len(e)}"); n_fail += 1; continue
        # dtype KIND must match (int vs float): the driver hashes the
        # materialized values, so DuckDB HUGEINT->float64 ("1.0") vs
        # Spark int64 ("1") is a real failure even when values are ==.
        # Width differences (int32 vs int64) are fine, kind flips aren't.
        kind_bad = [c for c in g.columns
                    if g[c].dtype.kind != e[c].dtype.kind]
        if kind_bad:
            print(f"FAIL {name}: dtype-kind mismatch {[(c, str(g[c].dtype), str(e[c].dtype)) for c in kind_bad]}")
            n_fail += 1; continue
        try:
            pd.testing.assert_frame_equal(g, e, check_dtype=False,
                                          check_exact=True)
            print(f"PASS {name} ({len(g)} rows, {time.time()-t0:.1f}s oracle)"); n_pass += 1
        except AssertionError as ex:
            print(f"FAIL {name}: value mismatch\n{str(ex)[:500]}")
            n_fail += 1
    print(f"\n{n_pass} pass, {n_fail} fail, {len(names)} total")
    sys.exit(1 if n_fail else 0)

if __name__ == "__main__":
    # optional 3rd arg: comma-separated query-name subset
    main(sys.argv[1], sys.argv[2],
         set(sys.argv[3].split(",")) if len(sys.argv) > 3 else None)
