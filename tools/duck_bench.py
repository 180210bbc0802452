#!/usr/bin/env python3
"""Single-node yardstick: time every oracle SQL from a Verify dump in
DuckDB (warm, min of N runs, all cores) — the comparison row for
BASELINE.md's head-to-head table.

Usage: python3 tools/duck_bench.py <sfDir> <verifyOutDir> [runs=2]
"""
import json
import os
import sys
import time

import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    runs = int(sys.argv[3]) if len(sys.argv) > 3 else 2
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")
    oracle = json.load(open(os.path.join(out_dir, "oracle_sql.json")))
    times = {}
    for name in sorted(oracle):
        best = None
        try:
            con.execute(oracle[name]).fetchall()  # warm (IO + plan cache)
            for _ in range(runs):
                t0 = time.perf_counter()
                con.execute(oracle[name]).fetchall()
                dt = time.perf_counter() - t0
                best = dt if best is None else min(best, dt)
        except Exception as e:
            print(f"ERR   {name}: {e}")
            continue
        times[name] = best
        print(f"{best:8.3f}  {name}")
    print(f"\ntotal {sum(times.values()):.3f}s over {len(times)} queries")
    print(json.dumps({k: round(v, 4) for k, v in times.items()}))


if __name__ == "__main__":
    main()
