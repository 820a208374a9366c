#!/usr/bin/env python3
"""Dev-only: exact value diff of two Verify output dirs (the full-surface
partition-count determinism sweep). Rows are compared as sorted tuples so
only genuine value differences count.
Usage: python3 tools/diff_verify.py <dirA> <dirB>
"""
import glob
import os
import sys

import pyarrow.parquet as pq

a, b = sys.argv[1], sys.argv[2]
names = sorted(os.path.basename(p) for p in glob.glob(f"{a}/q_*"))
bad = 0
for n in names:
    fa = sorted(glob.glob(f"{a}/{n}/*.parquet"))
    fb = sorted(glob.glob(f"{b}/{n}/*.parquet"))
    if not fa or not fb:
        print(f"MISSING {n}: {len(fa)} vs {len(fb)} files")
        bad += 1
        continue
    ta = pq.read_table(fa).to_pandas()
    tb = pq.read_table(fb).to_pandas()
    if list(ta.columns) != list(tb.columns):
        print(f"DIFF {n}: columns {list(ta.columns)} vs {list(tb.columns)}")
        bad += 1
        continue
    ra = sorted(map(repr, ta.itertuples(index=False, name=None)))
    rb = sorted(map(repr, tb.itertuples(index=False, name=None)))
    if ra != rb:
        k = sum(1 for x, y in zip(ra, rb) if x != y) + abs(len(ra) - len(rb))
        print(f"DIFF {n}: {len(ra)} vs {len(rb)} rows, {k} differing")
        bad += 1
print(f"{len(names)} queries compared, {bad} with diffs")
sys.exit(1 if bad else 0)
