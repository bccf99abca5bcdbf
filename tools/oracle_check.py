#!/usr/bin/env python3
"""Local mirror of the driver's correctness gate: run Verify output vs DuckDB.

Usage: python3 tools/oracle_check.py <sfDir> <verifyOutDir>

For each <name>.parquet in verifyOutDir with an entry in oracle_sql.json:
run the SQL in DuckDB over views named after the sfDir tables, then compare
row count, column names, and values (columns sorted by name, rows sorted by
all columns). Floats compared to 1e-9 relative tolerance to spot borderline
cases before the driver's exact hash does.
"""
import glob
import hashlib
import json
import math
import os
import sys

import duckdb
import pyarrow.parquet as pq

# Canonical type classes: a driver hashing (type, value) pairs will diverge on
# HUGEINT-vs-BIGINT even when every value stringifies identically, so surface
# type-class mismatches as failures here rather than on the driver.
def type_class(t):
    t = str(t).lower()
    # HUGEINT is its own class: the driver's canonicalization (pandas) turns
    # int128 into float64, so "same value" still hash-mismatches (round 4's
    # q87/q139). int32-vs-int64 is tolerated (q17/q62/q66 are driver-green):
    # both stringify identically.
    if any(k in t for k in ("hugeint",)):
        return "int128"
    if any(k in t for k in ("bigint", "int64", "long", "int32", "integer",
                            "int8", "int16", "tinyint", "smallint")) or t == "int":
        return "int"
    if any(k in t for k in ("double", "float64", "real", "float")):
        return "float"
    if "decimal" in t:
        return "decimal"
    if "bool" in t:
        return "bool"
    if any(k in t for k in ("timestamp",)):
        return "timestamp"
    if "date" in t:
        return "date"
    if any(k in t for k in ("varchar", "string", "utf8", "large_string")):
        return "str"
    if "list" in t or "array" in t:
        return "array"
    return t

def exact_hash(col_types, rows):
    # value-blind-hasher mirror: column order = sorted names (done by caller),
    # types + NULL markers + stringified values, rows pre-sorted by caller
    h = hashlib.sha256()
    h.update(("|".join(col_types) + "\n").encode())
    for r in rows:
        h.update(("\x1f".join("\x00" if x is None else str(x) for x in r)
                  + "\n").encode())
    return h.hexdigest()[:16]

def canon(rows):
    def key(r):
        return tuple((x is None, str(x)) for x in r)
    return sorted(rows, key=key)  # sorts by stringified key, keeps original values

def vals_eq(a, b):
    if a is None or b is None:
        return a is None and b is None
    if isinstance(a, float) or isinstance(b, float):
        try:
            fa, fb = float(a), float(b)
        except (TypeError, ValueError):
            return str(a) == str(b)
        if math.isnan(fa) or math.isnan(fb):
            return math.isnan(fa) and math.isnan(fb)
        if fa == fb:
            return True
        return abs(fa - fb) <= 1e-9 * max(abs(fa), abs(fb))
    return str(a) == str(b)

def main(sf_dir, out_dir):
    con = duckdb.connect()
    # q45's oracle casts naive ts to TIMESTAMPTZ using the session zone; pin it
    # to UTC so the compare matches the Spark UTC session on any host
    con.execute("SET TimeZone='UTC'")
    for p in glob.glob(os.path.join(sf_dir, "*.parquet")):
        t = os.path.basename(p)[:-len(".parquet")]
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    with open(os.path.join(out_dir, "oracle_sql.json")) as f:
        oracle = json.load(f)
    names = sorted(d for d in os.listdir(out_dir)
                   if os.path.isdir(os.path.join(out_dir, d)))
    n_pass = n_fail = n_noorc = 0
    for name in names:
        files = glob.glob(os.path.join(out_dir, name, "*.parquet"))
        tbl = pq.read_table(files[0]) if len(files) == 1 else pq.read_table(os.path.join(out_dir, name))
        spark_cols = sorted(tbl.column_names)
        spark_rows = canon(list(zip(*[tbl.column(c).to_pylist() for c in spark_cols])) if spark_cols else [])
        if name not in oracle:
            n_noorc += 1
            print(f"  [rows-only] {name}: {len(spark_rows)} rows")
            continue
        try:
            rel = con.sql(oracle[name])
            ora_cols_raw = list(rel.columns)
            ora_types_raw = [str(t) for t in rel.types]
            ora_all = rel.fetchall()
        except Exception as e:
            n_fail += 1
            print(f"  [FAIL-sql ] {name}: oracle SQL error: {e}")
            continue
        order = sorted(range(len(ora_cols_raw)), key=lambda i: ora_cols_raw[i])
        ora_cols = [ora_cols_raw[i] for i in order]
        ora_types = [type_class(ora_types_raw[i]) for i in order]
        ora_rows = canon([tuple(r[i] for i in order) for r in ora_all])
        if spark_cols != ora_cols:
            n_fail += 1
            print(f"  [FAIL-cols] {name}: spark={spark_cols} oracle={ora_cols}")
            continue
        spark_types = [type_class(tbl.schema.field(c).type) for c in spark_cols]
        if spark_types != ora_types:
            n_fail += 1
            diffs = [f"{c}: spark={s} oracle={o}" for c, s, o in
                     zip(spark_cols, spark_types, ora_types) if s != o]
            print(f"  [FAIL-type] {name}: {'; '.join(diffs)}")
            continue
        if len(spark_rows) != len(ora_rows):
            n_fail += 1
            print(f"  [FAIL-rows] {name}: spark={len(spark_rows)} oracle={len(ora_rows)}")
            continue
        bad = None
        for i, (sr, orow) in enumerate(zip(spark_rows, ora_rows)):
            for c, (sv, ov) in enumerate(zip(sr, orow)):
                if not vals_eq(sv, ov):
                    bad = (i, spark_cols[c], sv, ov)
                    break
            if bad:
                break
        if bad:
            n_fail += 1
            print(f"  [FAIL-val ] {name}: row {bad[0]} col {bad[1]}: spark={bad[2]!r} oracle={bad[3]!r}")
        else:
            n_pass += 1
            hs = exact_hash(spark_types, spark_rows)
            ho = exact_hash(ora_types, ora_rows)
            tag = "" if hs == ho else f"  HASH-DIFF spark={hs} oracle={ho}"
            print(f"  [pass     ] {name}: {len(spark_rows)} rows h={hs}{tag}")
    print(f"== {n_pass} pass, {n_fail} fail, {n_noorc} rows-only ==")
    return 1 if n_fail else 0

if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
