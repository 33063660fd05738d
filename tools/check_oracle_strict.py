#!/usr/bin/env python3
"""DEV-ONLY strict harness: mimics the most hostile plausible driver compare —
Spark parquet read via pandas/pyarrow (decimals -> decimal.Decimal objects,
timestamps -> tz-aware), oracle via DuckDB .df() (decimals -> float64) — then
str()-compares cell-by-cell. A query passes ONLY if its rendering is identical
under this asymmetric read, which in practice requires every non-integer
column to be a bit-exact double on both sides.

Usage: python3 tools/check_oracle_strict.py /root/testdata/sf0.01 /tmp/v01
"""
import sys, json, glob, os
import duckdb
import pandas as pd

sf_dir, out_dir = sys.argv[1], sys.argv[2]
con = duckdb.connect()
for t in ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]:
    con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")

oracle = json.load(open(os.path.join(out_dir, "oracle_sql.json")))
ok = fail = 0
failed = []
for name, sql in sorted(oracle.items()):
    pdir = os.path.join(out_dir, name)
    files = sorted(glob.glob(os.path.join(pdir, "*.parquet")))
    if not files:
        print(f"FAIL {name}: no spark output"); fail += 1; failed.append(name); continue
    try:
        got = pd.concat([pd.read_parquet(f) for f in files], ignore_index=True)
        exp = con.execute(sql).df()
    except Exception as e:
        print(f"FAIL {name}: {e}"); fail += 1; failed.append(name); continue
    gc, ec = sorted(got.columns), sorted(exp.columns)
    if gc != ec:
        print(f"FAIL {name}: columns {gc} != {ec}"); fail += 1; failed.append(name); continue
    g = got[gc].astype(str).reset_index(drop=True)
    e = exp[gc].astype(str).reset_index(drop=True)
    if len(g) != len(e):
        print(f"FAIL {name}: rows {len(g)} != {len(e)}"); fail += 1; failed.append(name); continue
    if not g.equals(e):
        neq = (g.values != e.values)
        import numpy as np
        idx = np.argwhere(neq)
        r, c = idx[0]
        print(f"FAIL {name}: {neq.sum()} cell diffs; e.g. row {r} col {gc[c]}: "
              f"spark={g.iloc[r, c]!r} duckdb={e.iloc[r, c]!r} "
              f"(spark dtype={got[gc[c]].dtype}, duckdb dtype={exp[gc[c]].dtype})")
        fail += 1; failed.append(name); continue
    ok += 1

print(f"\n{ok} ok, {fail} fail, {len(oracle)} oracle-checked")
if failed:
    print("failed:", " ".join(failed))
sys.exit(1 if fail else 0)
