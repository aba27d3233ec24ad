#!/usr/bin/env python3
"""Streaming variant of make_sf1.py for large factors (sf60/sf100).

make_sf1.py holds all FACTOR copies in memory before one concat+write;
at factor 1000 (sf100 from sf0.1) that is ~120 GB of arrow buffers and
does not fit the box. This variant keeps the SAME construction —
per-copy key offsets, disjoint per-copy token vocabularies for
`documents`, per-copy time shift for `events`, ~32+ row groups per
table — but writes incrementally through a ParquetWriter, buffering
only up to one row group's worth of copies at a time. Peak memory is
one row group (≤1 Mi rows), not the whole table.

Usage: python3 tools/make_big.py [srcDir] [outDir] [factor]

Driver-side tooling only (pyarrow is not a library dependency).
"""
import sys
from pathlib import Path

import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

SRC = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
OUT = sys.argv[2] if len(sys.argv) > 2 else "/tmp/sf100"
FACTOR = int(sys.argv[3]) if len(sys.argv) > 3 else 1000

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
        print(f"{name}: {tables[name].num_rows} rows (dimension, 1x)", flush=True)

    ts_type = tables["events"].schema.field("ts").type
    unit_per_s = {"s": 1, "ms": 10**3, "us": 10**6, "ns": 10**9}[ts_type.unit]
    ts_min = pc.min(tables["events"]["ts"]).cast(pa.int64()).as_py()
    ts_max = pc.max(tables["events"]["ts"]).cast(pa.int64()).as_py()
    ts_stride = (ts_max - ts_min) + 24 * 3600 * unit_per_s

    for name, keys in KEYED.items():
        src = tables[name]
        total = src.num_rows * FACTOR
        rg = min(1_048_576, max(8_192, total // 32))
        writer = pq.ParquetWriter(f"{OUT}/{name}.parquet", src.schema)
        buffered, buffered_rows = [], 0

        def flush():
            nonlocal buffered, buffered_rows
            if not buffered:
                return
            chunk = pa.concat_tables(buffered).combine_chunks()
            # split into rg-row groups ourselves: write_table on the
            # writer honors row_group_size per call
            writer.write_table(chunk, row_group_size=rg)
            buffered, buffered_rows = [], 0

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
            buffered.append(t)
            buffered_rows += t.num_rows
            if buffered_rows >= rg:
                flush()
        flush()
        writer.close()
        print(f"{name}: {src.num_rows} -> {total} rows (rg={rg})", flush=True)


if __name__ == "__main__":
    main()
