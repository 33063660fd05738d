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
  text   — documents perturbed INSIDE the ASCII case-folding contract
           (the r12 Unicode boundary stays out of scope): hash-bucketed
           classes get punctuation-glued tokens, repeated internal
           whitespace (empty tokens under the corpus's single-space
           split rule), empty-string and single-character docs,
           upper/mixed-case ASCII, and leading/trailing padding;
           n_chars is recomputed so the length invariant holds.
           Exercises tokenizer/shingle/vocab/quality paths on the
           shapes real corpora carry.
  unicode — documents injected with the Unicode case-folding probe
           classes (Turkish İ/ı, Greek Σ/final-ς, German ß/ẞ, plus the
           r15 BMP-sweep version-skew capitals: Cyrillic TJE, Glagolitic
           CAUDATE CHRIVI, Latin Ext-D OLD POLISH O / S WITH STROKE /
           MIDDLE SCOTS S / LAMBDA WITH STROKE / REVERSED HALF H — JDK
           lowercases these, utf8proc passes through) by hash bucket,
           n_chars recomputed. Plain lower() is engine-defined
           on these (Spark/Java vs DuckDB/utf8proc); the pinned
           Cols.foldCase chain must keep every text query hash-exact.
  megadup — ~30% of documents collapse onto ONE boilerplate template and
           another ~10% onto its Title-Case twin (same foldCase
           fingerprint → one ~40% mega duplicate cluster, the hot-fp
           shape the dedup/bias-audit family must survive without a
           single-task funnel); n_chars recomputed. The r14 `skew`
           variant only skews events.user_id — this is the documents-side
           analogue.
  scale  — synthetic scale-up gate (r12 verdict #1): events, documents
           and embeddings replicated xN (4th arg, default 16; orders+
           lineitem x4 with consistent orderkey offsets) under FRESH ids.
           Replicas are hash-salted so candidate densities stay
           realistic instead of forming xN exact-dup clusters: each
           replica remaps ~70% of document tokens to replica-suffixed
           forms (vocabulary grows with the corpus, near-dup/containment
           posting lists stay sf-shaped), embeddings get per-dimension
           deterministic noise (replicas are NOT mutual cosine
           near-dups), and event user_ids shift to a fresh user range
           per replica (per-user session volume stays realistic).

Usage: python3 tools/fuzz_data.py <src_sf_dir> <out_dir> <variant> [scale_factor]
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
    # the scale variant writes small row groups: a 100 TB corpus arrives as
    # thousands of files/row groups, and DuckDB's 122,880-row default packs
    # the whole amplified table into a handful (events x16 = 13, documents
    # and embeddings = ONE) — which silently serializes every scan's
    # stage-1 onto one core and makes the gate measure the file layout, not
    # the plan. ~32 groups per table ≈ one split per local[32] core.
    rg = ""
    if variant == "scale":
        n = con.execute(f"SELECT count(*) FROM ({sql})").fetchone()[0]
        rg = f", ROW_GROUP_SIZE {max(2048, n // 32)}"
    con.execute(f"COPY ({sql}) TO '{out}/{table}.parquet' (FORMAT PARQUET{rg})")

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
            # event_type nulls draw from a THIRD salt (r13 verdict #1: the
            # typeMixDrift null-mass gap was latent precisely because this
            # variant only ever nulled user_ids) — ~10% of surviving rows
            # lose their type, independently of the user_id nulling
            copy(f"""SELECT event_id, ts,
                       CASE WHEN {keep("'null:' || CAST(event_id AS VARCHAR)", 25)}
                            THEN NULL ELSE user_id END AS user_id,
                       CASE WHEN {keep("'nulltype:' || CAST(event_id AS VARCHAR)", 10)}
                            THEN NULL ELSE event_type END AS event_type,
                       value, props
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
    elif variant == "text":
        if t == "documents":
            # hash-bucketed perturbation classes, all ASCII, n_chars kept
            # true to the perturbed text (the corpus invariant)
            copy(f"""WITH p AS (
                       SELECT doc_id, lang, source,
                         CASE (hash('text:' || CAST(doc_id AS VARCHAR)) % 100)
                           WHEN 0 THEN ''
                           WHEN 1 THEN ''
                           WHEN 2 THEN ''
                           WHEN 3 THEN ''
                           WHEN 4 THEN ''
                           WHEN 5 THEN 'x'
                           WHEN 6 THEN 'x'
                           WHEN 7 THEN 'x'
                           WHEN 8 THEN 'x'
                           WHEN 9 THEN '.'
                           ELSE CASE
                             WHEN (hash('text:' || CAST(doc_id AS VARCHAR)) % 100) < 25
                               THEN replace(text, ' ', ', ') || '!!!'
                             WHEN (hash('text:' || CAST(doc_id AS VARCHAR)) % 100) < 37
                               THEN replace(text, ' ', '   ')
                             WHEN (hash('text:' || CAST(doc_id AS VARCHAR)) % 100) < 52
                               THEN upper(text)
                             WHEN (hash('text:' || CAST(doc_id AS VARCHAR)) % 100) < 62
                               THEN '  ' || text || ' '
                             WHEN (hash('text:' || CAST(doc_id AS VARCHAR)) % 100) < 72
                               THEN upper(substr(text, 1, length(text) // 2))
                                    || substr(text, length(text) // 2 + 1)
                             WHEN (hash('text:' || CAST(doc_id AS VARCHAR)) % 100) < 80
                               THEN text || ' contact admin@corp-mail.com at 192.168.10.20 or 555-867-5309 ref 987-65-4320 via 2001:db8::ff00 and ::1 acct DE89370400440532013000.'
                             ELSE text END
                         END AS text
                       FROM {s})
                     SELECT doc_id, text, lang, source,
                       CAST(length(text) AS BIGINT) AS n_chars
                     FROM p""", t)
        else:
            copy(f"SELECT * FROM {s}", t)
    elif variant == "unicode":
        if t == "documents":
            # inject exactly the probe classes the pinned fold covers
            # (Turkish İ/ı, Greek Σ/ς, German ß) into hash-bucketed docs —
            # plain lower() is engine-defined on these (Java vs utf8proc);
            # Cols.foldCase must make every text query hash-exact anyway.
            # n_chars recomputed in codepoints (both engines' length()).
            copy(f"""WITH p AS (
                       SELECT doc_id, lang, source,
                         CASE (hash('uni:' || CAST(doc_id AS VARCHAR)) % 10)
                           WHEN 0 THEN replace(text, 'i', 'İ')
                           WHEN 1 THEN replace(text, 'i', 'ı')
                           WHEN 2 THEN replace(text, 's', 'ß')
                           WHEN 3 THEN replace(text, 's', 'ς')
                           WHEN 4 THEN replace(text, 's', 'Σ')
                           WHEN 5 THEN 'İstanbul ışık straße grüße Σοφία τέλος ' || text
                           WHEN 6 THEN upper(replace(text, 'ss', 'ß'))
                           WHEN 7 THEN 'Ᲊilde Ⱟlag Ꟁpole Ƛambda Ꟶalf Ꟊhort Ꟗcots ' || text
                           ELSE text END AS text
                       FROM {s})
                     SELECT doc_id, text, lang, source,
                       CAST(length(text) AS BIGINT) AS n_chars
                     FROM p""", t)
        else:
            copy(f"SELECT * FROM {s}", t)
    elif variant == "megadup":
        if t == "documents":
            # one giant duplicate cluster: 30% exact template + 10% its
            # Title-Case twin (identical under foldCase fingerprints, so
            # the exact-dedup family sees ONE ~40% hot fingerprint while
            # the raw-text paths still see two distinct strings)
            tmpl = ("subscribe to our newsletter for updates terms of "
                    "service apply all rights reserved contact support "
                    "for help")
            twin = ("Subscribe To Our Newsletter For Updates Terms Of "
                    "Service Apply All Rights Reserved Contact Support "
                    "For Help")
            copy(f"""WITH p AS (
                       SELECT doc_id, lang, source,
                         CASE
                           WHEN (hash('mega:' || CAST(doc_id AS VARCHAR)) % 100) < 30
                             THEN '{tmpl}'
                           WHEN (hash('mega:' || CAST(doc_id AS VARCHAR)) % 100) < 40
                             THEN '{twin}'
                           ELSE text END AS text
                       FROM {s})
                     SELECT doc_id, text, lang, source,
                       CAST(length(text) AS BIGINT) AS n_chars
                     FROM p""", t)
        else:
            copy(f"SELECT * FROM {s}", t)
    elif variant == "scale":
        amp = int(sys.argv[4]) if len(sys.argv) > 4 else 16
        if t == "events":
            mx = con.execute(f"SELECT max(event_id)+1, max(user_id)+1 FROM {s}").fetchone()
            copy(f"""SELECT e.event_id + k.k * {mx[0]} AS event_id, e.ts,
                       e.user_id + k.k * {mx[1]} AS user_id,
                       e.event_type, e.value, e.props
                     FROM {s} e CROSS JOIN (SELECT unnest(range({amp})) AS k) k""", t)
        elif t == "documents":
            mx = con.execute(f"SELECT max(doc_id)+1 FROM {s}").fetchone()[0]
            copy(f"""WITH p AS (
                       SELECT d.doc_id + k.k * {mx} AS doc_id, d.lang, d.source,
                         CASE WHEN k.k = 0 THEN d.text ELSE
                           list_aggregate(list_transform(string_split(d.text, ' '),
                             w -> CASE WHEN hash(w || ':' || CAST(k.k AS VARCHAR)) % 10 < 7
                                       THEN w || 'r' || CAST(k.k AS VARCHAR) ELSE w END),
                             'string_agg', ' ')
                         END AS text
                       FROM {s} d CROSS JOIN (SELECT unnest(range({amp})) AS k) k)
                     SELECT doc_id, text, lang, source,
                       CAST(length(text) AS BIGINT) AS n_chars
                     FROM p""", t)
        elif t == "embeddings":
            mx = con.execute(f"SELECT max(vec_id)+1 FROM {s}").fetchone()[0]
            copy(f"""SELECT e.vec_id + k.k * {mx} AS vec_id,
                       CASE WHEN k.k = 0 THEN e.embedding ELSE
                         list_transform(e.embedding, (x, i) -> CAST(x +
                           (CAST(hash(CAST(e.vec_id AS VARCHAR) || ':' ||
                              CAST(k.k AS VARCHAR) || ':' || CAST(i AS VARCHAR))
                              % 1000 AS DOUBLE) / 1000.0 - 0.5) / 2.0 AS FLOAT))
                       END AS embedding, e.label
                     FROM {s} e CROSS JOIN (SELECT unnest(range({amp})) AS k) k""", t)
        elif t == "orders":
            mx = con.execute(f"SELECT max(o_orderkey)+1 FROM {s}").fetchone()[0]
            copy(f"""SELECT o.o_orderkey + k.k * {mx} AS o_orderkey, o.o_custkey,
                       o.o_orderstatus, o.o_totalprice, o.o_orderdate, o.o_orderpriority
                     FROM {s} o CROSS JOIN (SELECT unnest(range(4)) AS k) k""", t)
        elif t == "lineitem":
            mx = con.execute(
                f"SELECT max(o_orderkey)+1 FROM {src_tbl('orders')}").fetchone()[0]
            copy(f"""SELECT l.* REPLACE (l.l_orderkey + k.k * {mx} AS l_orderkey)
                     FROM {s} l CROSS JOIN (SELECT unnest(range(4)) AS k) k""", t)
        else:
            copy(f"SELECT * FROM {s}", t)
    else:
        raise SystemExit(f"unknown variant {variant}")

print(f"[fuzz] wrote {variant} variant of {src} to {out}")
