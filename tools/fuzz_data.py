#!/usr/bin/env python3
"""Seeded data-shape perturbations of a testdata SF directory, for running
the FULL oracle suite (Verify + check_oracle_strict) on data the fixtures
never exercised. The environment sweeps (SF / cores / state store) vary the
EXECUTION; this varies the DATA — null density, tie mass, sample shape —
while keeping every schema byte-compatible (DuckDB COPY round-trip, no
pandas type coercion).

Variants (all deterministic: hash-based filters, no RNG):
  nulls  — events: ~25% of surviving user_ids nulled (salted hash,
           independent of the 40% row-sample hash), other fact tables
           sampled; dims untouched. Exercises the null-key guards
           (kmv, cuped, sessionization drops, null sort order).
  ties   — events: every value rounded to one of 8 bands and each row
           duplicated once under a fresh event_id; orders: totalprice
           rounded to 100s. Exercises midrank/tie-correction/dedup paths
           (rank-sum ties3, KS steps, first/last determinism).
  sparse — every fact table cut to a few percent (events 3%, orders 5%,
           lineitem 5%, documents 10%, embeddings 10%). Exercises the
           empty/degenerate-group guards (zero-arm tests, thin bootstrap,
           empty quantile groups) through the REAL oracle pipeline.
  oneday — only the corpus's first calendar day of events survives (other
           tables untouched). Degenerate time axis: single-day series,
           zero drift pairs, one-day retention/DAU windows.
  skew   — half of all events reassigned to user 1 (hash-selected).
           One giant per-user window partition / session / basket:
           exercises the skew paths' CORRECTNESS (salting, per-user
           windows, funnel chains) under a pathological key distribution.
  shuffled — every table rewritten in hash order (same rows, scrambled
           file order). Any operator that accidentally leans on the
           at-rest row order (instead of an explicit ORDER BY / window
           order) hash-mismatches here.

Usage: python3 tools/fuzz_data.py <src_sf_dir> <out_dir> <variant>
Then:  sbt 'runMain graft.Verify <out_dir> /tmp/vfz'
       python3 tools/check_oracle_strict.py <out_dir> /tmp/vfz
"""
import sys, os
import duckdb

src, out, variant = sys.argv[1], sys.argv[2], sys.argv[3]
os.makedirs(out, exist_ok=True)
con = duckdb.connect()

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

def copy(sql: str, table: str) -> None:
    con.execute(f"COPY ({sql}) TO '{out}/{table}.parquet' (FORMAT PARQUET)")

def src_tbl(t: str) -> str:
    return f"read_parquet('{src}/{t}.parquet')"

# deterministic "p%" row filter: stable under row order, no RNG
def keep(expr: str, pct: int) -> str:
    return f"(hash({expr}) % 100) < {pct}"

for t in TABLES:
    s = src_tbl(t)
    if variant == "nulls":
        if t == "events":
            # salt the null-selection hash so it draws independently of the
            # row-sample hash (unsalted, the 10% set was a strict subset of
            # the 40% sample: every nulled row survived -> 25% density and
            # the two knobs could not vary independently)
            copy(f"""SELECT event_id, ts,
                       CASE WHEN {keep("'null:' || CAST(event_id AS VARCHAR)", 25)}
                            THEN NULL ELSE user_id END AS user_id,
                       event_type, value, props
                     FROM {s} WHERE {keep('event_id', 40)}""", t)
        elif t == "orders":
            copy(f"SELECT * FROM {s} WHERE {keep('o_orderkey', 50)}", t)
        elif t == "lineitem":
            copy(f"SELECT * FROM {s} WHERE {keep('l_orderkey', 50)}", t)
        elif t == "documents":
            copy(f"SELECT * FROM {s} WHERE {keep('doc_id', 60)}", t)
        elif t == "embeddings":
            copy(f"SELECT * FROM {s} WHERE {keep('vec_id', 60)}", t)
        else:
            copy(f"SELECT * FROM {s}", t)
    elif variant == "ties":
        if t == "events":
            # band values to 8 levels and double every row (fresh ids):
            # maximal tie mass for the rank/dedup/min_by determinism paths
            base = (f"SELECT event_id, ts, user_id, event_type, "
                    f"CAST(CAST(value AS DECIMAL(18,2)) - (CAST(value AS DECIMAL(18,2)) % 25) AS DOUBLE) AS value, props "
                    f"FROM {s} WHERE {keep('event_id', 50)}")
            mx = con.execute(f"SELECT max(event_id) FROM {s}").fetchone()[0]
            copy(f"SELECT * FROM ({base}) UNION ALL "
                 f"SELECT event_id + {mx}, ts, user_id, event_type, value, props "
                 f"FROM ({base})", t)
        elif t == "orders":
            copy(f"""SELECT o_orderkey, o_custkey, o_orderstatus,
                       CAST(CAST(o_totalprice AS DECIMAL(18,2))
                         - (CAST(o_totalprice AS DECIMAL(18,2)) % 100) AS DOUBLE) AS o_totalprice,
                       o_orderdate, o_orderpriority
                     FROM {s} WHERE {keep('o_orderkey', 50)}""", t)
        else:
            copy(f"SELECT * FROM {s}", t)
    elif variant == "sparse":
        pct = {"events": ("event_id", 3), "orders": ("o_orderkey", 5),
               "lineitem": ("l_orderkey", 5), "documents": ("doc_id", 10),
               "embeddings": ("vec_id", 10)}
        if t in pct:
            key, p = pct[t]
            copy(f"SELECT * FROM {s} WHERE {keep(key, p)}", t)
        else:
            copy(f"SELECT * FROM {s}", t)
    elif variant == "skew":
        if t == "events":
            copy(f"""SELECT event_id, ts,
                       CASE WHEN {keep('event_id', 50)} THEN 1 ELSE user_id END AS user_id,
                       event_type, value, props
                     FROM {s}""", t)
        else:
            copy(f"SELECT * FROM {s}", t)
    elif variant == "shuffled":
        key = {"region": "r_regionkey", "nation": "n_nationkey",
               "customer": "c_custkey", "supplier": "s_suppkey",
               "part": "p_partkey", "orders": "o_orderkey",
               "lineitem": "l_orderkey * 8 + l_linenumber",
               "events": "event_id", "documents": "doc_id",
               "embeddings": "vec_id"}[t]
        copy(f"SELECT * FROM {s} ORDER BY hash({key})", t)
    elif variant == "oneday":
        if t == "events":
            copy(f"""SELECT * FROM {s}
                     WHERE epoch(date_trunc('second', ts)) <
                       (SELECT min(epoch(date_trunc('second', ts))) // 86400 * 86400 + 86400
                        FROM {s})""", t)
        else:
            copy(f"SELECT * FROM {s}", t)
    else:
        raise SystemExit(f"unknown variant {variant}")

print(f"[fuzz] wrote {variant} variant of {src} to {out}")
