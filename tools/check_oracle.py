#!/usr/bin/env python3
"""DEV-ONLY harness (not part of the engine): mimics the driver's DuckDB
oracle compare so query/SQL pairs can be iterated locally before a round
submission. Usage:
    sbt "runMain graft.Verify /root/testdata/sf0.01 /tmp/verify_out"
    python3 tools/check_oracle.py /root/testdata/sf0.01 /tmp/verify_out
"""
import sys, json, glob, os
import duckdb

sf_dir, out_dir = sys.argv[1], sys.argv[2]
con = duckdb.connect()
for t in ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]:
    con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")

oracle = json.load(open(os.path.join(out_dir, "oracle_sql.json")))
ok = fail = 0
for name, sql in sorted(oracle.items()):
    pdir = os.path.join(out_dir, name)
    files = glob.glob(os.path.join(pdir, "*.parquet"))
    if not files:
        print(f"FAIL {name}: no spark output"); fail += 1; continue
    try:
        got = con.execute(f"SELECT * FROM read_parquet('{pdir}/*.parquet')").df()
        exp = con.execute(sql).df()
    except Exception as e:
        print(f"FAIL {name}: {e}"); fail += 1; continue
    gc, ec = sorted(got.columns), sorted(exp.columns)
    if gc != ec:
        print(f"FAIL {name}: columns {gc} != {ec}"); fail += 1; continue
    g, e = got[gc].astype(str), exp[gc].astype(str)
    if len(g) != len(e):
        print(f"FAIL {name}: rows {len(g)} != {len(e)}"); fail += 1; continue
    if not g.reset_index(drop=True).equals(e.reset_index(drop=True)):
        neq = (g.values != e.values)
        print(f"FAIL {name}: {neq.sum()} cell diffs; first rows:")
        import numpy as np
        r, c = np.argwhere(neq)[0]
        print(f"  row {r} col {gc[c]}: spark={g.iloc[r, c]!r} duckdb={e.iloc[r, c]!r}")
        fail += 1; continue
    print(f"ok   {name} ({len(g)} rows)"); ok += 1

# rows-only queries (no oracle): report counts
for pdir in sorted(glob.glob(os.path.join(out_dir, "q*"))):
    name = os.path.basename(pdir)
    if name in oracle or not os.path.isdir(pdir):
        continue
    n = con.execute(f"SELECT count(*) FROM read_parquet('{pdir}/*.parquet')").fetchone()[0]
    print(f"rows {name}: {n}{'  (!! EMPTY)' if n == 0 else ''}")
print(f"\n{ok} ok, {fail} fail, {len(oracle)} oracle-checked")
sys.exit(1 if fail else 0)
