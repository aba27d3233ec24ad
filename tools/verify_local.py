#!/usr/bin/env python3
"""Local stand-in for the driver's correctness gate: run graft.Verify
output against DuckDB executing SparkEntry.oracleSql on the same tables.

Usage: python3 tools/verify_local.py <sfDir> <outDir>
(run `sbt "runMain graft.Verify <sfDir> <outDir>"` first)

Mimics the driver: loads each <outDir>/<name> parquet, runs the oracle
SQL with each table registered as a view over <sfDir>/<table>.parquet,
sorts columns by name, and compares row-by-row (exact, bitwise for
floats). Queries without oracle SQL get a rows-only check.
"""
import sys, json, glob, math
import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings"]

def canon(rows, cols):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = []
    for r in rows:
        out.append(tuple(r[i] for i in order))
    return [cols[i] for i in order], out

def eq(a, b):
    if isinstance(a, float) and isinstance(b, float):
        if math.isnan(a) and math.isnan(b):
            return True
        return a == b  # exact: determinism contract says bit-identical
    return a == b

def main(sf_dir, out_dir):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    results = {}
    for d in sorted(glob.glob(f"{out_dir}/*/")):
        name = d.rstrip("/").split("/")[-1]
        files = glob.glob(f"{d}/*.parquet")
        if not files:
            results[name] = "NO_OUTPUT"
            continue
        got = con.execute(
            f"SELECT * FROM read_parquet({files!r})").fetchall()
        got_cols = [x[0] for x in con.description]
        if name not in oracle:
            # rows==0 fails: driver's smoke contract is rows>0
            results[name] = (f"ROWS_ONLY rows={len(got)}" if len(got) > 0
                             else "ROWS_ONLY_EMPTY rows=0")
            continue
        try:
            exp = con.execute(oracle[name]).fetchall()
            exp_cols = [x[0] for x in con.description]
        except Exception as e:
            results[name] = f"ORACLE_SQL_ERROR: {str(e)[:200]}"
            continue
        # Typed check: the driver hashes TYPED values, so BIGINT-vs-HUGEINT
        # (DuckDB SUM over ints) mismatches even when every value is equal.
        got_types = dict(
            (r[0], r[1]) for r in
            con.execute(f"DESCRIBE SELECT * FROM read_parquet({files!r})").fetchall())
        exp_types = dict(
            (r[0], r[1]) for r in
            con.execute(f"DESCRIBE {oracle[name]}").fetchall())
        type_diffs = {c: (got_types.get(c), exp_types.get(c))
                      for c in set(got_types) | set(exp_types)
                      if got_types.get(c) != exp_types.get(c)}
        gc, gr = canon(got, got_cols)
        ec, er = canon(exp, exp_cols)
        if gc != ec:
            results[name] = f"SCHEMA_MISMATCH spark={gc} duckdb={ec}"
        elif type_diffs:
            results[name] = f"TYPE_MISMATCH {type_diffs} (spark, duckdb)"
        elif len(gr) != len(er):
            results[name] = f"ROWCOUNT_MISMATCH spark={len(gr)} duckdb={len(er)}"
        else:
            bad = None
            for i, (g, e) in enumerate(zip(gr, er)):
                if not all(eq(x, y) for x, y in zip(g, e)):
                    bad = (i, g, e)
                    break
            if bad:
                results[name] = f"VALUE_MISMATCH row={bad[0]} spark={bad[1]} duckdb={bad[2]}"
            else:
                results[name] = f"MATCH rows={len(gr)}" + \
                    (" (EMPTY!)" if len(gr) == 0 else "")
    npass = sum(1 for v in results.values() if v.startswith(("MATCH", "ROWS_ONLY")))
    for k in sorted(results):
        print(f"{'PASS' if results[k].startswith(('MATCH','ROWS_ONLY')) else 'FAIL':4} {k}: {results[k]}")
    print(f"\n{npass}/{len(results)} pass")
    return 0 if npass == len(results) else 1

if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
