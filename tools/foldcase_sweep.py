#!/usr/bin/env python3
"""BMP completeness audit for Cols.foldCase (r14 verdict task 6).

Reads the parquet written by `runMain graft.tools.FoldSweep <parquet>`
(one row per BMP codepoint x {single, ctx} form, with Spark's lower()
and foldCase() outputs), runs the BYTE-IDENTICAL chain in DuckDB
(utf8proc semantics), and reports:

  1. fold divergences  — codepoints where DuckDB's
       lower(translate(replace(replace(s,'ß','ss'),'ẞ','ss'),'İıΣςᲉⰯꟀꟇꟉꟋꟌꟐꟖꟘꟚꟜꟵ','iiσσᲊⱟꟁꟈꟊɤꟍꟑꟗꟙꟛƛꟶ'))
     differs from Spark's foldCase(s). These are REAL remaining
     cross-engine hash hazards: fix by extending the pre-substitution
     chain (engine + all 21 oracle mirrors) or document exclusion.
  2. lower divergences — codepoints where plain lower() differs between
     the engines (informational: the classes the fold exists to guard;
     any entry NOT covered by (1) is already neutralized by the chain).

Writes a JSON artifact for the COVERAGE ledger and exits non-zero iff
fold divergences exist.

Usage: python3 tools/foldcase_sweep.py <sweep_parquet_dir> <out_json>
"""
import json
import sys
import unicodedata

import duckdb

src, out = sys.argv[1], sys.argv[2]
con = duckdb.connect()

q = f"""
WITH s AS (
  SELECT cp, form, s, lowered, folded,
    lower(s) AS duck_lowered,
    lower(translate(replace(replace(s,'ß','ss'),'ẞ','ss'),'İıΣςᲉⰯꟀꟇꟉꟋꟌꟐꟖꟘꟚꟜꟵ','iiσσᲊⱟꟁꟈꟊɤꟍꟑꟗꟙꟛƛꟶ'))
      AS duck_folded
  FROM read_parquet('{src}/*.parquet'))
SELECT cp, form, s, lowered, folded, duck_lowered, duck_folded,
  (folded != duck_folded) AS fold_div,
  (lowered != duck_lowered) AS lower_div
FROM s WHERE folded != duck_folded OR lowered != duck_lowered
ORDER BY cp, form
"""
rows = con.execute(q).fetchall()
total = con.execute(
    f"SELECT count(*) FROM read_parquet('{src}/*.parquet')").fetchone()[0]


def cpname(cp: int) -> str:
    try:
        return unicodedata.name(chr(cp))
    except ValueError:
        return "<unassigned>"


fold_div, lower_div = [], []
for cp, form, s, lowered, folded, dl, df, fd, ld in rows:
    entry = {
        "cp": f"U+{cp:04X}", "name": cpname(cp), "form": form,
        "spark_lower": lowered, "duck_lower": dl,
        "spark_fold": folded, "duck_fold": df,
    }
    if fd:
        fold_div.append(entry)
    elif ld:
        lower_div.append(entry)

summary = {
    "rows_swept": total,
    "fold_divergent": len(fold_div),
    "lower_divergent_guarded": len(lower_div),
    "fold_divergences": fold_div,
    "lower_divergences_guarded_by_fold": lower_div[:200],
}
with open(out, "w") as f:
    json.dump(summary, f, ensure_ascii=False, indent=1)

print(f"[foldsweep] {total} rows swept; "
      f"{len(fold_div)} FOLD divergences (must be 0), "
      f"{len(lower_div)} lower() divergences already guarded by the chain")
for e in fold_div[:40]:
    print("  FOLD-DIV", e["cp"], e["name"], e["form"],
          repr(e["spark_fold"]), "vs", repr(e["duck_fold"]))
sys.exit(1 if fold_div else 0)
