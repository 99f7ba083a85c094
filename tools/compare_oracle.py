#!/usr/bin/env python3
"""Local mimic of the driver's correctness gate: run Verify output
against DuckDB oracle SQL on the same parquet tables and compare
(columns sorted by name, values hashed row-wise after sorting)."""
import sys, json, glob
import duckdb
import pandas as pd

sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
out_dir = sys.argv[2] if len(sys.argv) > 2 else "/tmp/verify_out"

con = duckdb.connect()
import os
for t in ["region","nation","customer","supplier","part","orders",
          "lineitem","events","documents","embeddings"]:
    # driver fixtures are single files; SynthData corpora are Spark
    # parquet directories — accept both layouts
    p = f"{sf_dir}/{t}.parquet"
    src = f"{p}/*.parquet" if os.path.isdir(p) else p
    con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{src}'")

oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
ok = fail = 0
import time
for name, sql in sorted(oracle.items()):
    t0 = time.time()
    try:
        spark_df = pd.concat([pd.read_parquet(f) for f in
                              sorted(glob.glob(f"{out_dir}/{name}/*.parquet"))],
                             ignore_index=True)
    except Exception as e:
        print(f"FAIL {name}: no spark output ({e})"); fail += 1; continue
    try:
        duck_df = con.execute(sql).fetchdf()
    except Exception as e:
        print(f"FAIL {name}: oracle error: {str(e)[:200]}"); fail += 1; continue
    s = spark_df.reindex(sorted(spark_df.columns), axis=1)
    d = duck_df.reindex(sorted(duck_df.columns), axis=1)
    if list(s.columns) != list(d.columns):
        print(f"FAIL {name}: columns {list(s.columns)} vs {list(d.columns)}")
        fail += 1; continue
    if len(s) != len(d):
        print(f"FAIL {name}: rows {len(s)} vs {len(d)}"); fail += 1; continue
    s = s.sort_values(by=list(s.columns)).reset_index(drop=True)
    d = d.sort_values(by=list(d.columns)).reset_index(drop=True)
    # normalize dtypes for compare
    mismatch = None
    for c in s.columns:
        sv, dv = s[c], d[c]
        try:
            if sv.dtype.kind in "fc" or dv.dtype.kind in "fc":
                import numpy as np
                if not np.allclose(sv.astype(float), dv.astype(float),
                                   rtol=0, atol=0, equal_nan=True):
                    # exact compare, since both sides round
                    diffs = (sv.astype(float) != dv.astype(float))
                    mismatch = f"col {c}: {int(diffs.sum())} diffs, e.g. {sv[diffs].head(3).tolist()} vs {dv[diffs].head(3).tolist()}"
                    break
            else:
                if not sv.astype(str).equals(dv.astype(str)):
                    diffs = (sv.astype(str) != dv.astype(str))
                    mismatch = f"col {c}: {int(diffs.sum())} diffs, e.g. {sv[diffs].head(3).tolist()} vs {dv[diffs].head(3).tolist()}"
                    break
        except Exception as e:
            mismatch = f"col {c}: compare error {e}"; break
    if mismatch:
        print(f"FAIL {name}: {mismatch}"); fail += 1
    else:
        print(f"OK   {name} ({len(s)} rows, {time.time()-t0:.1f}s)", flush=True); ok += 1

print(f"\n{ok} ok, {fail} fail")
sys.exit(1 if fail else 0)
