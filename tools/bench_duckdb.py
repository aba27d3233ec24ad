#!/usr/bin/env python3
"""Time the DuckDB oracle suite — the equal-work baseline for graft.Bench.

Usage: python3 tools/bench_duckdb.py <sfDir> <oracleSqlJson> [runs]

Runs every oracle SQL from <oracleSqlJson> (dumped by graft.Verify, so
trained-constant oracles are inlined for the SAME data dir) against the
parquet tables in <sfDir>, best-of-<runs> per query (default 2),
threads=32 to mirror the Spark local[32] setup. Prints a per-query JSON
map and a total line, and writes the map to target/duckdb_queries.json.

Set ISOLATE=1 to run every (pass, query) in a fresh subprocess: a query
that OOMs or gets killed can then not poison the interpreter running
the remaining queries (the sf10 failure mode — one MemoryError cascades
into bogus "bad allocation" failures for every later query on the
shared connection). Isolation also lets the parent kill a wedged query
outright instead of relying on con.interrupt() being honored. Each
worker caps DuckDB at MEMLIMIT (default 80GB) and spills to an
on-disk temp dir bounded at TMPCAP (default 40GB) so a runaway spill
cannot fill the root filesystem.

Driver-side tooling only (duckdb is not a library dependency).
"""
import json
import os
import subprocess
import sys
import time
from pathlib import Path

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def spill_dir():
    """The on-disk spill dir this script OWNS and may delete wholesale.

    A user-supplied DUCK_TMP gets a fixed 'duck_spill' leaf appended, so
    clean_spill()'s rmtree can never recurse into a shared/pre-existing
    directory (DUCK_TMP=/tmp would otherwise delete all of /tmp).
    """
    base = os.environ.get("DUCK_TMP")
    return str(Path(base) / "duck_spill") if base else "/tmp/duck_spill"


def connect(sf_dir):
    import duckdb
    con = duckdb.connect()
    con.execute("SET threads TO 32")
    con.execute(f"SET memory_limit='{os.environ.get('MEMLIMIT', '80GB')}'")
    tmp = spill_dir()
    Path(tmp).mkdir(parents=True, exist_ok=True)
    con.execute(f"SET temp_directory='{tmp}'")
    con.execute(
        f"SET max_temp_directory_size='{os.environ.get('TMPCAP', '40GB')}'")
    for t in TABLES:
        p = Path(sf_dir) / f"{t}.parquet"
        if p.exists():
            con.execute(
                f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    return con


def worker(sf_dir, oracle_path, name):
    """Run ONE query once; print its wall time (query only, not setup)."""
    sql = json.load(open(oracle_path))[name]
    con = connect(sf_dir)
    t0 = time.perf_counter()
    con.execute(sql).fetchall()
    print(json.dumps({"t": time.perf_counter() - t0}))


def clean_spill():
    """Drop leaked spill files from killed workers (best-effort).

    Only ever removes spill_dir() — a leaf this script created — never a
    user-supplied DUCK_TMP directly (which may be a shared dir).
    """
    import shutil
    shutil.rmtree(spill_dir(), ignore_errors=True)


def isolated_pass(sf_dir, oracle_path, names, limit, best, errors):
    for name in names:
        if name in errors:
            continue  # OOM/timeout is deterministic; keep pass-1 cost
        t0 = time.perf_counter()
        try:
            r = subprocess.run(
                [sys.executable, __file__, sf_dir, oracle_path,
                 "--one", name],
                capture_output=True, text=True,
                timeout=limit if limit > 0 else None)
            if r.returncode != 0:
                raise RuntimeError(r.stderr.strip().splitlines()[-1]
                                   if r.stderr.strip() else
                                   f"exit {r.returncode}")
            dt = json.loads(r.stdout.strip().splitlines()[-1])["t"]
        except Exception as e:
            dt = time.perf_counter() - t0
            msg = ("timeout" if isinstance(e, subprocess.TimeoutExpired)
                   else str(e))
            print(f"[duckdb-bench] {name} FAILED after {dt:.1f}s: {msg}",
                  file=sys.stderr)
            # a killed worker leaks its on-disk spill (DuckDB only cleans
            # temp_directory on graceful close) — round 10 left 33 GB
            # behind after 4 timeouts and the NEXT bench died disk-full
            clean_spill()
            errors[name] = msg
            if name not in best or dt < best[name]:
                best[name] = dt
            continue
        if name not in best or dt < best[name]:
            best[name] = dt
            errors.pop(name, None)


def main():
    if "--one" in sys.argv:
        worker(sys.argv[1], sys.argv[2], sys.argv[sys.argv.index("--one") + 1])
        return
    sf_dir = sys.argv[1]
    oracle_path = sys.argv[2]
    runs = int(sys.argv[3]) if len(sys.argv) > 3 else 2
    oracles = json.load(open(oracle_path))

    best = {}
    errors = {}
    # interleaved passes, same reasoning as graft.Bench: consecutive
    # runs of one query land inside the same contention burst
    # optional per-query wall guard for large-SF runs (0 = none):
    # a timed-out query records the elapsed wall time as its cost
    limit = float(sys.argv[4]) if len(sys.argv) > 4 else 0.0

    if os.environ.get("ISOLATE") == "1":
        for _ in range(runs):
            isolated_pass(sf_dir, oracle_path, sorted(oracles), limit,
                          best, errors)
        finish(best, errors, runs, sf_dir)
        return

    con = connect(sf_dir)
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
    finish(best, errors, runs, sf_dir)


def finish(best, errors, runs, sf_dir):
    clean_spill()
    total = sum(best.values())
    out = {"metric": "duckdb_total", "value": round(total, 3), "unit": "sec",
           "n": len(best), "runs": runs, "sf": Path(sf_dir).name,
           "queries": {k: round(v, 3) for k, v in sorted(best.items())}}
    if errors:
        out["errors"] = errors
    Path("target").mkdir(exist_ok=True)
    Path("target/duckdb_queries.json").write_text(json.dumps(out) + "\n")
    print(json.dumps({k: round(v, 3) for k, v in
                      sorted(best.items(), key=lambda kv: -kv[1])[:10]}))
    print(json.dumps({"metric": "duckdb_total", "value": round(total, 3),
                      "unit": "sec", "n": len(best), "errs": len(errors),
                      "sf": Path(sf_dir).name}))


if __name__ == "__main__":
    main()
