#!/usr/bin/env python3
"""Time each oracle SQL in DuckDB — the practical BENCH baseline.

Usage: python3 scripts/oracle_bench.py <sfDir> <verifyOutDir> [repeats=2]

Reads oracle_sql.json from <verifyOutDir> (produced by graft.Verify), runs
each query `repeats` times against DuckDB views over <sfDir>/*.parquet, and
prints per-query best-of times plus the suite total. Compare against the
per-query map Bench.scala prints. Dev tooling only.
"""
import json
import sys
import time

import duckdb

TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    repeats = int(sys.argv[3]) if len(sys.argv) > 3 else 2
    with open(f"{out_dir}/oracle_sql.json") as f:
        oracle_sql = json.load(f)
    con = duckdb.connect()
    con.execute("SET threads TO 32")
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")
    times = {}
    for name in sorted(oracle_sql):
        best = None
        for _ in range(repeats):
            t0 = time.perf_counter()
            try:
                con.execute(oracle_sql[name]).fetchall()
            except Exception as e:  # noqa: BLE001
                print(f"ERR   {name}: {e}")
                best = -1.0
                break
            dt = time.perf_counter() - t0
            best = dt if best is None else min(best, dt)
        times[name] = best
        print(f"{best:8.3f}  {name}")
    ok = {k: v for k, v in times.items() if v >= 0}
    errs = sorted(k for k, v in times.items() if v < 0)
    print(f"\nTOTAL {sum(ok.values()):.3f}s over {len(ok)} queries"
          + (f" ({len(errs)} ERRORED: {errs})" if errs else ""))
    print(json.dumps({k: round(v, 3) for k, v in ok.items()}))


if __name__ == "__main__":
    main()
