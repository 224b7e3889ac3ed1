#!/usr/bin/env python3
"""Time each oracle SQL in DuckDB against a parquet table dir.

Usage: python3 tools/bench_duckdb.py <sf_dir> <oracle_sql.json> [threads]

Each query is fully materialized (CREATE TEMP TABLE AS) to match the Spark
bench's noop-sink full-evaluation semantics. Prints one JSON line.
"""
import json
import os
import sys
import time

import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def main():
    sf_dir, oracle_path = sys.argv[1], sys.argv[2]
    threads = int(sys.argv[3]) if len(sys.argv) > 3 else 32
    con = duckdb.connect()
    con.execute(f"SET threads={threads}")
    for t in TABLES:
        p = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.isdir(p):
            con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{p}/*.parquet'")
        elif os.path.exists(p):
            con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")
    with open(oracle_path) as f:
        oracles = json.load(f)
    times = {}
    errs = {}
    for name in sorted(oracles):
        t0 = time.time()
        try:
            con.execute(f"CREATE OR REPLACE TEMP TABLE _bench AS ({oracles[name]})")
            times[name] = round(time.time() - t0, 3)
        except Exception as e:
            errs[name] = str(e).split("\n")[0][:200]
    print(json.dumps({
        "total": round(sum(times.values()), 2),
        "queries": times, "errors": errs,
        "sf": sf_dir, "threads": threads}))
    if errs:
        sys.exit(1)


if __name__ == "__main__":
    main()
