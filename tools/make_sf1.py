#!/usr/bin/env python3
"""Build an sf1-scale (default 10x sf0.1) bench dataset by key-offset
replication — the sf1 crossover experiment's input.

Usage: python3 tools/make_sf1.py [srcDir] [outDir] [factor]

Mirrors the round-5 8x corpus experiment's construction: N copies of
every fact table with per-copy key offsets (referential integrity holds
within each copy), and DISJOINT per-copy token vocabularies for
`documents` (copy i>0 suffixes every token with "x{i}") so the true
near-duplicate structure is exactly N independent copies — pair counts
scale Nx, not N^2x, the realistic constant-dup-rate regime. Dimensions
(region, nation) stay fixed, like TPC-H scaling. `events.ts` keeps its
TIMESTAMP(NANOS) physical type (pyarrow passthrough) — the Spark side
reads it as long ns via nanosAsLong and DuckDB reads it us-truncated,
same as the driver-generated originals.

`events.ts` is SHIFTED per copy (copy i adds i*(span+1day)) so a bigger
factor extends the event history instead of densifying a fixed window —
the constant-event-rate regime a real stream has. Without the shift,
every copy lands in the SAME time range: per-hour event density grows
with the factor, so any time-range join's true pair count grows
quadratically in the factor (measured: q31 grew 15x for 10x data at
factor 100 on the unshifted axis — an artifact of the generator, not
the plan; 3.4x once shifted).

Driver-side tooling only (pyarrow is not a library dependency).
"""
import sys
from pathlib import Path

import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

SRC = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
OUT = sys.argv[2] if len(sys.argv) > 2 else "/tmp/sf1"
FACTOR = int(sys.argv[3]) if len(sys.argv) > 3 else 10

# key column -> stride source table (stride = max+1 of the owning table,
# computed below so every FK uses its referenced table's stride)
KEYED = {
    "customer": {"c_custkey": "customer"},
    "supplier": {"s_suppkey": "supplier"},
    "part": {"p_partkey": "part"},
    "orders": {"o_orderkey": "orders", "o_custkey": "customer"},
    "lineitem": {"l_orderkey": "orders", "l_partkey": "part",
                 "l_suppkey": "supplier"},
    "events": {"event_id": "events", "user_id": "events:user_id"},
    "documents": {"doc_id": "documents"},
    "embeddings": {"vec_id": "embeddings"},
}
OWN_KEY = {"customer": "c_custkey", "supplier": "s_suppkey",
           "part": "p_partkey", "orders": "o_orderkey",
           "events": "event_id", "documents": "doc_id",
           "embeddings": "vec_id"}


def main():
    Path(OUT).mkdir(parents=True, exist_ok=True)
    tables = {t: pq.read_table(f"{SRC}/{t}.parquet")
              for t in ["region", "nation", "customer", "supplier", "part",
                        "orders", "lineitem", "events", "documents",
                        "embeddings"]}
    strides = {}
    for t, key in OWN_KEY.items():
        strides[t] = pc.max(tables[t][key]).as_py() + 1
    strides["events:user_id"] = pc.max(tables["events"]["user_id"]).as_py() + 1

    for name in ["region", "nation"]:  # fixed dimensions
        pq.write_table(tables[name], f"{OUT}/{name}.parquet")
        print(f"{name}: {tables[name].num_rows} rows (dimension, 1x)")

    # per-copy time shift: whole span + 1 day, so copies are adjacent but
    # non-overlapping segments of one longer history; the day gap is
    # expressed in the ts column's OWN unit (driver data is us; the
    # docstring's nanos note describes the legacy physical type only)
    ts_type = tables["events"].schema.field("ts").type
    unit_per_s = {"s": 1, "ms": 10**3, "us": 10**6, "ns": 10**9}[ts_type.unit]
    ts_min = pc.min(tables["events"]["ts"]).cast(pa.int64()).as_py()
    ts_max = pc.max(tables["events"]["ts"]).cast(pa.int64()).as_py()
    ts_stride = (ts_max - ts_min) + 24 * 3600 * unit_per_s

    for name, keys in KEYED.items():
        src = tables[name]
        copies = []
        for i in range(FACTOR):
            t = src
            for col, stride_of in keys.items():
                idx = t.schema.get_field_index(col)
                shifted = pc.add(t[col], i * strides[stride_of])
                t = t.set_column(idx, t.schema.field(idx),
                                 shifted.cast(t.schema.field(idx).type))
            if name == "events" and i > 0:
                ti = t.schema.get_field_index("ts")
                tstype = t.schema.field(ti).type
                shifted_ts = pc.add(t["ts"].cast(pa.int64()),
                                    i * ts_stride).cast(tstype)
                t = t.set_column(ti, t.schema.field(ti), shifted_ts)
            if name == "documents" and i > 0:
                texts = [" ".join(tok + f"x{i}" for tok in s.split(" "))
                         for s in t["text"].to_pylist()]
                ti = t.schema.get_field_index("text")
                t = t.set_column(ti, t.schema.field(ti), pa.array(texts))
                ni = t.schema.get_field_index("n_chars")
                t = t.set_column(ni, t.schema.field(ni), pa.array(
                    [len(s) for s in texts], type=t.schema.field(ni).type))
            copies.append(t)
        out = pa.concat_tables(copies)
        # Row-group SIZE matters for scan parallelism: pyarrow's default
        # (1M rows/group) left documents/embeddings as ONE row group up
        # to sf10 — a parquet scan cannot split inside a row group, so
        # every text-column scan ran single-task in Spark no matter the
        # core count (round-11 find: p09's "scan floor" was one core
        # decoding 56 MB). A production corpus has thousands of groups;
        # target ~32 groups per table (the local core count), bounded to
        # sane parquet sizes, so local measurements exercise the
        # parallel-scan shape both engines would see at scale.
        rg = min(1_048_576, max(8_192, out.num_rows // 32))
        pq.write_table(out, f"{OUT}/{name}.parquet", row_group_size=rg)
        print(f"{name}: {src.num_rows} -> {out.num_rows} rows (rg={rg})")


if __name__ == "__main__":
    main()
