#!/usr/bin/env python3
"""Dev-only: build the 8x scale-probe fixture (BASELINE.md scale probe)
by disjoint-key union of sf0.1 x8. Same methodology as the round-8 probe:
copies are byte-identical except the primary keys, which are offset per
copy so exact-key operators see 8x distinct entities while content-hash
operators (near-dup, semantic dedup) see designed cross-copy duplicates.
Usage: python3 tools/make_sfbig.py [srcDir] [outDir] [copies] [--skew]

--skew (round-12, verdict task 3) builds the Zipf-skew variant of the
same fixture — identical row counts, three deliberately hot keys:
  * lineitem: copies 0..n-2 rewrite l_linestatus to 'Z', so ONE
    chromosome holds (n-1)/n of all Hi-C contacts (87.5% at n=8; the
    plain fixture's worst chr holds 50%) — stresses the per-chromosome
    KR routing and any chr-keyed aggregation;
  * events: user_id % 10 < 3 collapses to ONE hot user (~30% of all
    events in a single sessionize/window partition);
  * documents: doc_id % 10 < 3 get a fixed 20-token boilerplate
    PREFIX (~30% of the corpus shares every boilerplate window/shingle
    — the span-dedup win_md5 and n-gram inverted-index skew bomb).
"""
import os
import sys

import duckdb

src = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
out = sys.argv[2] if len(sys.argv) > 2 else "/tmp/sfbig"
skew = "--skew" in sys.argv
# --hotorder (round-17 cont., TPC-H family probe): collapse ~30 % of all
# lineitem rows into ONE orderkey (key 1 — an F-status 1996 order, so it
# passes Q21's status filter and Q12's date band) — the hot-JOIN-key bomb
# for every orderkey-grained operator (Q12/Q18/Q21 joins, semi/anti
# probes, per-order aggregates). Distinct from --skew, which heats
# chr/user/document content keys but leaves orderkeys uniform.
hotorder = "--hotorder" in sys.argv
argv = [a for a in sys.argv if a not in ("--skew", "--hotorder")]
n = int(argv[3]) if len(argv) > 3 else 8
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

ls_skew = ("CASE WHEN {i} < " + str(n - 1) +
           " THEN 'Z' ELSE l_linestatus END AS l_linestatus, ") \
    if skew else ""
ok_expr = ("CASE WHEN l_orderkey % 10 < 3 THEN 1 "
           "ELSE l_orderkey + {i}::BIGINT*" + str(OFF) + " END AS l_orderkey"
           ) if hotorder else ("l_orderkey + {i}::BIGINT*" + str(OFF) +
                               " AS l_orderkey")
build("lineitem",
      "SELECT * REPLACE (" + ls_skew +
      "l_partkey + {i}::BIGINT*" + str(OFF) + " AS l_partkey, "
      "l_suppkey + {i}::BIGINT*" + str(OFF) + " AS l_suppkey, " +
      ok_expr + ") "
      f"FROM read_parquet('{src}/lineitem.parquet')")
BOILER = ("terms of service privacy policy all rights reserved "
          "subscribe to our newsletter for updates click here to "
          "accept cookies and continue ")  # 20 tokens, > W=8 windows
doc_skew = ("CASE WHEN doc_id % 10 < 3 THEN '" + BOILER +
            "' || text ELSE text END AS text, ") if skew else ""
build("documents",
      "SELECT * REPLACE (" + doc_skew +
      "doc_id + {i}::BIGINT*" + str(OFF) + " AS doc_id) "
      f"FROM read_parquet('{src}/documents.parquet')")
build("embeddings",
      "SELECT * REPLACE (vec_id + {i}::BIGINT*" + str(OFF) + " AS vec_id) "
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
    if skew:
        # ~30% of ALL events collapse onto one hot user (id 777):
        # source user_ids are uniform, so % 10 < 3 selects ~30% in
        # every copy (the per-copy offset is a multiple of 10)
        import numpy as np
        uidx = t.schema.get_field_index("user_id")
        uid = t["user_id"].combine_chunks().to_numpy(zero_copy_only=False)
        t = t.set_column(uidx, "user_id",
                         pa.array(np.where(uid % 10 < 3, 777, uid),
                                  type=t.schema.field(uidx).type))
    copies.append(t)
pq.write_table(pa.concat_tables(copies), f"{out}/events.parquet",
               use_deprecated_int96_timestamps=False,
               coerce_timestamps=None)
print(f"events: {sum(c.num_rows for c in copies)} rows")
