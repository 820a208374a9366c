#!/usr/bin/env python3
"""Dev-only replica of the driver's correctness gate: run Verify's parquet
dumps against the DuckDB oracle SQL and diff exactly. Usage:
    python3 tools/check.py <sfDir> <verifyOutDir> [query ...]
"""
import glob
import json
import os
import sys

import duckdb
import pyarrow.parquet as pq

TABLES = ("region nation customer supplier part orders lineitem events "
          "documents embeddings").split()


def main():
    sfdir, outdir = sys.argv[1], sys.argv[2]
    only = set(sys.argv[3:])
    con = duckdb.connect()
    for t in TABLES:
        p = f"{sfdir}/{t}.parquet"
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    oracle = json.load(open(f"{outdir}/oracle_sql.json"))
    failures = 0
    for name in sorted(oracle):
        if only and name not in only:
            continue
        sql = oracle[name]
        files = sorted(glob.glob(f"{outdir}/{name}/*.parquet"))
        if not files:
            print(f"FAIL {name}: no spark output")
            failures += 1
            continue
        got = pq.read_table(files).to_pandas()
        try:
            exp = con.execute(sql).df()
        except Exception as e:
            print(f"FAIL {name}: oracle error: {e}")
            failures += 1
            continue
        g = got[sorted(got.columns)]
        x = exp[sorted(exp.columns)]
        if list(g.columns) != list(x.columns):
            print(f"FAIL {name}: cols {list(g.columns)} vs {list(x.columns)}")
            failures += 1
            continue
        if len(g) != len(x):
            print(f"FAIL {name}: rows {len(g)} vs {len(x)}")
            failures += 1
            continue
        ok = True
        for c in g.columns:
            a = g[c].reset_index(drop=True)
            b = x[c].reset_index(drop=True)
            # The driver hashes values dtype-sensitively: a DuckDB HUGEINT
            # (SUM(BIGINT) in a CTE) surfaces as float64/object and breaks
            # the hash even when values compare equal element-wise (has
            # bitten q_events_sessionize, scd2, q_tpch_q18). Driver-green
            # history shows int-width mismatches (int32 vs int64) and
            # date-as-object vs datetime64 are benign; an INTEGER column
            # on one side vs float/object on the other is the killer.
            da, db = str(a.dtype), str(b.dtype)
            ints = {"int8", "int16", "int32", "int64",
                    "uint8", "uint16", "uint32", "uint64"}
            floats = {"float32", "float64"}  # duckdb .df() is always f64
            # spark float vs oracle int is benign too: toPandas renders
            # a NULLABLE integer column as float64 while DuckDB keeps a
            # non-null BIGINT as int64; the HUGEINT signature is the
            # opposite orientation (spark int, oracle float/object)
            benign = (da == db
                      or (da in ints and db in ints)
                      or (da in floats and db in floats)
                      or (da in floats and db in ints)
                      or (da.startswith("datetime64") and db == "object")
                      or (da == "object" and db.startswith("datetime64")))
            if not benign:
                print(f"FAIL {name}.{c}: hash-breaking dtype mismatch "
                      f"{da} (spark) vs {db} (oracle) — HUGEINT class? "
                      f"CAST the oracle's final projection")
                ok = False
                continue
            try:
                neq = ~((a == b) | (a.isna() & b.isna()))
                bad = int(neq.sum())
            except Exception as e:
                print(f"FAIL {name}.{c}: compare error {e} "
                      f"(dtypes {a.dtype} vs {b.dtype})")
                ok = False
                continue
            if bad:
                ok = False
                idx = list(neq[neq].index[:3])
                print(f"FAIL {name}.{c}: {bad} diffs "
                      f"(dtypes {a.dtype}/{b.dtype}), e.g. "
                      f"{[(i, a[i], b[i]) for i in idx]}")
        if ok:
            print(f"ok   {name} ({len(g)} rows)")
        else:
            failures += 1
    declared = len([n for n in oracle if not only or n in only])
    print(f"{'ALL GREEN' if failures == 0 else f'{failures} FAILURES'} "
          f"({declared} oracle queries)")
    sys.exit(1 if failures else 0)


if __name__ == "__main__":
    main()
