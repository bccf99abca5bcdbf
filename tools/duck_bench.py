#!/usr/bin/env python3
"""DuckDB proxy benchmark: time every SparkEntry.oracleSql query over the
same parquet tables the engine reads — the methodology of docs/PERF.md.

Usage: python3 tools/duck_bench.py <sfDir> <oracle_sql.json> [runs]

Prints one JSON line {"total": sec, "queries": {name: sec}} (min of N runs,
default 2, warm file cache). Run it SERIALIZED with the Spark bench — never
concurrently — or both numbers measure core contention, not plans.
"""
import json
import sys
import time

import duckdb

def main():
    sf_dir = sys.argv[1]
    oracle_path = sys.argv[2]
    runs = int(sys.argv[3]) if len(sys.argv) > 3 else 2
    sql = json.load(open(oracle_path))
    con = duckdb.connect()
    con.execute("PRAGMA threads=32")
    con.execute("SET TimeZone='UTC'")
    for t in ["region", "nation", "customer", "supplier", "part", "orders",
              "lineitem", "events", "documents", "embeddings"]:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    out, total = {}, 0.0
    for name in sorted(sql):
        best = None
        for _ in range(runs):
            t0 = time.time()
            try:
                con.execute(sql[name]).fetchall()
                dt = time.time() - t0
                best = dt if best is None else min(best, dt)
            except Exception as e:
                print(f"[duck] {name} FAILED: {e}", file=sys.stderr)
                best = -1.0
                break
        out[name] = round(best, 4)
        if best > 0:
            total += best
    print(json.dumps({"total": round(total, 2), "queries": out}))

if __name__ == "__main__":
    main()
