#!/usr/bin/env python3
"""Local stand-in for the driver's DuckDB oracle compare.

Usage: python3 tools/compare_oracle.py <sfDir> <verifyOut> [name...]

For each query dir under verifyOut: read the Spark parquet result, run the
matching oracle_sql.json entry in DuckDB (tables registered as views over
<sfDir>/*.parquet), sort columns by name and rows by all columns, and compare
cell-by-cell (exact for non-floats, 1e-9 rel for floats).

Also lints COLUMN TYPES: the DuckDB-evaluated oracle's result types must
match the Spark parquet's types (as DuckDB reads them). A silent promotion
(e.g. DuckDB windowed sum(BIGINT) -> HUGEINT while Spark emits BIGINT) is
invisible to the value compare at any tolerance but breaks the driver's
type-sensitive hash — exactly how a46_weighted_median slipped in round 10.
Type names are normalized only across widths that hash identically on the
driver side (float widths); integer-width diffs FAIL.
"""
import json, math, sys, glob, os
import duckdb

sfdir, outdir = sys.argv[1], sys.argv[2]
names = sys.argv[3:]

con = duckdb.connect()
for p in glob.glob(f"{sfdir}/*.parquet"):
    t = os.path.basename(p)[:-8]
    con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")

oracle = json.load(open(f"{outdir}/oracle_sql.json"))

def canon(rows, cols):
    idx = sorted(range(len(cols)), key=lambda i: cols[i])
    out = []
    for r in rows:
        out.append(tuple(r[i] for i in idx))
    def key(t):
        return tuple((x is None, str(x)) for x in t)
    return sorted(out, key=key), [cols[i] for i in idx]

def eq(a, b):
    if a is None and b is None: return True
    if isinstance(a, float) or isinstance(b, float):
        try:
            fa, fb = float(a), float(b)
        except (TypeError, ValueError):
            return False
        if math.isnan(fa) and math.isnan(fb): return True
        return abs(fa - fb) <= 1e-9 * max(1.0, abs(fa), abs(fb))
    return str(a) == str(b)

def norm_type(t):
    """Normalize a DuckDB type name for the parity lint.

    Only classes VERIFIED driver-hash-benign are folded together (each class
    below was observed across the full green CORRECTNESS_r10 set, i.e. the
    driver's hash already treats them as equal). Integer widths are NEVER
    folded: HUGEINT vs BIGINT is the a46 failure mode this lint exists for.
    """
    t = str(t)
    # float widths: Spark float[] columns read as FLOAT, DuckDB arithmetic
    # yields DOUBLE; values compare equal and the driver hashes the value.
    t = t.replace("FLOAT", "DOUBLE").replace("REAL", "DOUBLE")
    # timezone flavor: Spark session TZ is UTC and testdata timestamps are
    # naive; TIMESTAMP WITH TIME ZONE vs TIMESTAMP carry identical instants.
    t = t.replace("TIMESTAMP WITH TIME ZONE", "TIMESTAMP")
    return t

fails = 0
type_diffs = 0
for qdir in sorted(glob.glob(f"{outdir}/*/")):
    name = os.path.basename(qdir.rstrip("/"))
    if names and not any(name.startswith(n) for n in names): continue
    if name not in oracle:
        print(f"{name}: NO ORACLE (rows-only)")
        continue
    try:
        # ONE relation per side serves both the type lint (columns/types,
        # readable pre-fetch) and the value compare (fetchall) — the oracle
        # SQL runs once, not once per purpose.
        s_rel = con.sql(f"SELECT * FROM '{qdir}*.parquet'")
        s_cols = list(s_rel.columns)
        s_types = {c: str(t) for c, t in zip(s_rel.columns, s_rel.types)}
        s_rows = s_rel.fetchall()
        o_rel = con.sql(oracle[name])
        o_cols = list(o_rel.columns)
        o_types = {c: str(t) for c, t in zip(o_rel.columns, o_rel.types)}
        o_rows = o_rel.fetchall()
    except Exception as e:
        print(f"{name}: ERROR {e}")
        fails += 1
        continue
    # a query fails AT MOST ONCE for dtype drift, however many columns
    # drifted — `fails` counts failing QUERIES, `type_diffs` counts columns
    q_type_bad = False
    for c in sorted(set(s_types) & set(o_types)):
        if norm_type(s_types[c]) != norm_type(o_types[c]):
            print(f"{name}: TYPE MISMATCH col {c}: "
                  f"spark={s_types[c]} oracle={o_types[c]}")
            type_diffs += 1
            q_type_bad = True
    if q_type_bad:
        fails += 1
    sr, sc = canon(s_rows, s_cols)
    orr, oc = canon(o_rows, o_cols)
    if sc != oc:
        print(f"{name}: SCHEMA MISMATCH spark={sc} oracle={oc}")
        fails += 1
        continue
    if len(sr) != len(orr):
        print(f"{name}: ROWS MISMATCH spark={len(sr)} oracle={len(orr)}")
        fails += 1
        continue
    bad = None
    for i, (a, b) in enumerate(zip(sr, orr)):
        if not all(eq(x, y) for x, y in zip(a, b)):
            bad = (i, a, b)
            break
    if bad:
        print(f"{name}: VALUE MISMATCH row {bad[0]}\n  spark : {bad[1]}\n  oracle: {bad[2]}")
        fails += 1
    else:
        print(f"{name}: OK ({len(sr)} rows)")
print(f"\n{'FAIL' if fails else 'ALL OK'} "
      f"({fails} failing, {type_diffs} dtype diffs)")
sys.exit(1 if fails else 0)
