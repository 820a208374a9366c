#!/usr/bin/env python3
"""Dev-only: build the 8x scale-probe fixture (BASELINE.md scale probe)
by disjoint-key union of sf0.1 x8. Same methodology as the round-8 probe:
copies are byte-identical except the primary keys, which are offset per
copy so exact-key operators see 8x distinct entities while content-hash
operators (near-dup, semantic dedup) see designed cross-copy duplicates.
Usage: python3 tools/make_sfbig.py [srcDir] [outDir] [copies]
"""
import os
import sys

import duckdb

src = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
out = sys.argv[2] if len(sys.argv) > 2 else "/tmp/sfbig"
n = int(sys.argv[3]) if len(sys.argv) > 3 else 8
os.makedirs(out, exist_ok=True)
con = duckdb.connect()

# key offset per copy: comfortably past every key in the source
OFF = 10_000_000


def build(table, select_tpl):
    parts = " UNION ALL ".join(
        select_tpl.format(i=i) for i in range(n))
    con.execute(
        f"COPY ({parts}) TO '{out}/{table}.parquet' (FORMAT PARQUET)")
    rows = con.execute(
        f"SELECT COUNT(*) FROM read_parquet('{out}/{table}.parquet')"
    ).fetchone()[0]
    print(f"{table}: {rows} rows")


for t in ("region", "nation", "customer", "supplier", "part", "orders"):
    p = f"{src}/{t}.parquet"
    if os.path.exists(p):
        con.execute(f"COPY (SELECT * FROM read_parquet('{p}')) TO "
                    f"'{out}/{t}.parquet' (FORMAT PARQUET)")

build("lineitem",
      "SELECT * REPLACE (l_partkey + {i}*" + str(OFF) + " AS l_partkey, "
      "l_suppkey + {i}*" + str(OFF) + " AS l_suppkey, "
      "l_orderkey + {i}*" + str(OFF) + " AS l_orderkey) "
      f"FROM read_parquet('{src}/lineitem.parquet')")
build("documents",
      "SELECT * REPLACE (doc_id + {i}*" + str(OFF) + " AS doc_id) "
      f"FROM read_parquet('{src}/documents.parquet')")
build("embeddings",
      "SELECT * REPLACE (vec_id + {i}*" + str(OFF) + " AS vec_id) "
      f"FROM read_parquet('{src}/embeddings.parquet')")
# events must keep parquet TIMESTAMP(NANOS) — graft.Tables reads ts via
# nanosAsLong — and DuckDB's COPY downcasts to micros, so rewrite with
# pyarrow instead.
import pyarrow as pa  # noqa: E402
import pyarrow.parquet as pq  # noqa: E402
import pyarrow.compute as pc  # noqa: E402

ev = pq.read_table(f"{src}/events.parquet")
copies = []
for i in range(n):
    t = ev
    for key in ("event_id", "user_id"):
        idx = t.schema.get_field_index(key)
        t = t.set_column(idx, key, pc.add(t[key], i * OFF))
    copies.append(t)
pq.write_table(pa.concat_tables(copies), f"{out}/events.parquet",
               use_deprecated_int96_timestamps=False,
               coerce_timestamps=None)
print(f"events: {sum(c.num_rows for c in copies)} rows")
