#!/usr/bin/env python3
"""Local replica of the driver's correctness gate: load each Verify output parquet,
run the corresponding oracle SQL in DuckDB over the same sf dir, and compare
(row count, schema, and value hash after sorting columns by name and rows by value).

Usage: python3 tools/compare.py <sfDir> <verifyOutDir> [queryName ...]
(extra args restrict the compare to just those queries — the local iteration loop)
"""
import json, sys, glob, os
import duckdb
import pandas as pd

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()

def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    # normalize ints to int64 where possible, floats stay floats
    df = df.sort_values(by=list(df.columns), ignore_index=True)
    return df

def main(sf_dir, out_dir, only=None):
    con = duckdb.connect()
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    if only:
        oracle = {k: v for k, v in oracle.items() if k in only}
    n_pass = n_fail = 0
    for name, sql in sorted(oracle.items()):
        res_dir = f"{out_dir}/{name}"
        files = glob.glob(f"{res_dir}/*.parquet")
        if not files:
            print(f"FAIL {name}: no spark output"); n_fail += 1; continue
        try:
            spark_df = pd.concat([pd.read_parquet(f) for f in files], ignore_index=True)
        except Exception as e:
            print(f"FAIL {name}: cannot read spark output: {e}"); n_fail += 1; continue
        try:
            duck_df = con.execute(sql).df()
        except Exception as e:
            print(f"FAIL {name}: oracle error: {e}"); n_fail += 1; continue
        ok = True
        msgs = []
        if len(spark_df) != len(duck_df):
            ok = False; msgs.append(f"rows {len(spark_df)} vs {len(duck_df)}")
        if sorted(spark_df.columns) != sorted(duck_df.columns):
            ok = False; msgs.append(f"cols {sorted(spark_df.columns)} vs {sorted(duck_df.columns)}")
        if ok:
            a, b = canon(spark_df), canon(duck_df)
            try:
                sa = a.astype(str).values.tolist()
                sb = b.astype(str).values.tolist()
                if sa != sb:
                    ok = False
                    for i, (ra, rb) in enumerate(zip(sa, sb)):
                        if ra != rb:
                            msgs.append(f"first diff row {i}: spark={ra} duck={rb}")
                            break
                # dtype check (informational)
                da, db = list(map(str, a.dtypes)), list(map(str, b.dtypes))
                if da != db:
                    msgs.append(f"NOTE dtypes differ: {list(zip(a.columns, da, db))}")
            except Exception as e:
                ok = False; msgs.append(f"compare error: {e}")
        if ok:
            n_pass += 1
            print(f"PASS {name} ({len(spark_df)} rows)" + ("  " + "; ".join(msgs) if msgs else ""))
        else:
            n_fail += 1
            print(f"FAIL {name}: " + "; ".join(msgs))
    print(f"\n{n_pass} pass / {n_fail} fail")
    return 1 if n_fail else 0

if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2], set(sys.argv[3:]) or None))
