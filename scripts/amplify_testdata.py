#!/usr/bin/env python3
"""Amplify the driver-generated sf0.1 tables to an sf1-scale dataset.

The correctness gate compares Spark vs DuckDB on IDENTICAL parquet files, so
the comparison stays valid on any input; this produces a 10x dataset with
key-shifted copies so id-domain cardinalities scale linearly (a plain
row-duplication would instead give every doc 9 identical clones and turn the
dedup operators quadratic by construction).

- BIGINT id domains shift by k * 10_000_000 per copy k (keys never collide:
  every base id is far below 10M)
- INTEGER nation/region keys shift by k * 100
- document text gets a per-copy suffix, so the near-duplicate graph is 10
  disjoint copies of the base graph (linear scaling), while exact token
  statistics still change per copy
- pyarrow (not a SQL engine rewrite) preserves physical types exactly —
  notably events.ts keeps the source vintage's physical type (timestamp[ns]
  or timestamp[us]); the Spark side normalizes either to epoch-nanos longs
  at the loader (Tables.normalizeTs + the nanosAsLong session conf)

Usage: python3 scripts/amplify_testdata.py [SRC] [DST] [COPIES]
Tooling only — not part of the library.
"""
import sys

import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

SRC = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
DST = sys.argv[2] if len(sys.argv) > 2 else "/tmp/testdata_sf1"
COPIES = int(sys.argv[3]) if len(sys.argv) > 3 else 10
BIG = 10_000_000
SMALL = 100

SHIFTS = {
    "region": {"r_regionkey": SMALL},
    "nation": {"n_nationkey": SMALL, "n_regionkey": SMALL},
    "customer": {"c_custkey": BIG, "c_nationkey": SMALL},
    "supplier": {"s_suppkey": BIG, "s_nationkey": SMALL},
    "part": {"p_partkey": BIG},
    "orders": {"o_orderkey": BIG, "o_custkey": BIG},
    "lineitem": {"l_orderkey": BIG, "l_partkey": BIG, "l_suppkey": BIG},
    "events": {"event_id": BIG, "user_id": BIG},
    "documents": {"doc_id": BIG},
    "embeddings": {"vec_id": BIG},
}


def main() -> None:
    import os

    os.makedirs(DST, exist_ok=True)
    for t, sh in SHIFTS.items():
        base = pq.read_table(f"{SRC}/{t}.parquet")
        parts = []
        for k in range(COPIES):
            cols = []
            for name in base.column_names:
                col = base.column(name)
                if name in sh and k > 0:
                    col = pc.add(col, pa.scalar(k * sh[name], type=col.type))
                if t == "documents" and name == "text" and k > 0:
                    col = pc.binary_join_element_wise(col, pa.scalar(f"c{k}"), " ")
                cols.append(col)
            parts.append(pa.table(dict(zip(base.column_names, cols)), schema=base.schema))
        out = pa.concat_tables(parts)
        pq.write_table(out, f"{DST}/{t}.parquet")
        print(t, base.num_rows, "->", out.num_rows)


if __name__ == "__main__":
    main()
