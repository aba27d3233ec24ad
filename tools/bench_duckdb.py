#!/usr/bin/env python3
"""Time the DuckDB oracle suite — the equal-work baseline for graft.Bench.

Usage: python3 tools/bench_duckdb.py <sfDir> <oracleSqlJson> [runs]

Runs every oracle SQL from <oracleSqlJson> (dumped by graft.Verify, so
trained-constant oracles are inlined for the SAME data dir) against the
parquet tables in <sfDir>, best-of-<runs> per query (default 2),
threads=32 to mirror the Spark local[32] setup. Prints a per-query JSON
map and a total line, and writes the map to target/duckdb_queries.json.

Driver-side tooling only (duckdb is not a library dependency).
"""
import json
import sys
import time
from pathlib import Path

import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def main():
    sf_dir = sys.argv[1]
    oracle_path = sys.argv[2]
    runs = int(sys.argv[3]) if len(sys.argv) > 3 else 2
    oracles = json.load(open(oracle_path))

    con = duckdb.connect()
    con.execute("SET threads TO 32")
    for t in TABLES:
        p = Path(sf_dir) / f"{t}.parquet"
        if p.exists():
            con.execute(
                f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")

    best = {}
    # interleaved passes, same reasoning as graft.Bench: consecutive
    # runs of one query land inside the same contention burst
    # optional per-query wall guard for large-SF runs (0 = none):
    # a timed-out query records the elapsed wall time as its cost
    limit = float(sys.argv[4]) if len(sys.argv) > 4 else 0.0
    for _ in range(runs):
        for name in sorted(oracles):
            timer = None
            if limit > 0:
                import threading
                timer = threading.Timer(limit, con.interrupt)
                timer.start()
            t0 = time.perf_counter()
            try:
                con.execute(oracles[name]).fetchall()
            except Exception as e:
                dt = time.perf_counter() - t0
                print(f"[duckdb-bench] {name} FAILED after {dt:.1f}s: {e}",
                      file=sys.stderr)
                if timer is not None:
                    timer.cancel()
                if name not in best or dt < best[name]:
                    best[name] = dt
                continue
            finally:
                if timer is not None:
                    timer.cancel()
            dt = time.perf_counter() - t0
            if name not in best or dt < best[name]:
                best[name] = dt

    total = sum(best.values())
    out = {"metric": "duckdb_total", "value": round(total, 3), "unit": "sec",
           "n": len(best), "runs": runs, "sf": Path(sf_dir).name,
           "queries": {k: round(v, 3) for k, v in sorted(best.items())}}
    Path("target").mkdir(exist_ok=True)
    Path("target/duckdb_queries.json").write_text(json.dumps(out) + "\n")
    print(json.dumps({k: round(v, 3) for k, v in
                      sorted(best.items(), key=lambda kv: -kv[1])[:10]}))
    print(json.dumps({"metric": "duckdb_total", "value": round(total, 3),
                      "unit": "sec", "n": len(best), "sf": Path(sf_dir).name}))


if __name__ == "__main__":
    main()
