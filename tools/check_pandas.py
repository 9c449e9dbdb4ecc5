#!/usr/bin/env python3
"""Pandas-path replica of the driver's correctness gate.

Usage: python3 tools/check_pandas.py <verify_out_dir> <sf_dir>

Same comparison as tools/check.py but materializes BOTH sides through
DuckDB's pandas conversion (`.df()`) before comparing, so it is
sensitive to dtype-level divergence the fetchall replica cannot see —
e.g. a HUGEINT oracle column becoming float64 while the Spark dump is
int64 (the t_repetition round-13 failure mechanism). If this passes,
a driver that hashes pandas/arrow frames passes too.
"""
import json
import math
import sys

import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def canon_frame(df):
    df = df[sorted(df.columns)]

    def canon(v):
        # numpy scalars keep their dtype through itertuples: repr()
        # distinguishes int64(3) from float64(3.0) exactly as a
        # dtype-sensitive hash would
        if isinstance(v, float) and math.isnan(v):
            return "NaN"
        if hasattr(v, "item"):
            v = v.item()
        if isinstance(v, float) and math.isnan(v):
            return "NaN"
        return f"{type(v).__name__}:{v!r}"

    rows = [tuple(canon(v) for v in row)
            for row in df.itertuples(index=False, name=None)]
    return sorted(rows)


def main(out_dir, sf_dir):
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_pass = n_fail = 0
    for name, sql in sorted(oracle.items()):
        try:
            got = con.sql(
                f"SELECT * FROM '{out_dir}/{name}/*.parquet'").df()
            exp = con.sql(sql).df()
        except Exception as e:
            print(f"FAIL {name}: error {e}")
            n_fail += 1
            continue
        if sorted(got.columns) != sorted(exp.columns):
            print(f"FAIL {name}: cols {sorted(got.columns)} != "
                  f"{sorted(exp.columns)}")
            n_fail += 1
            continue
        grows, erows = canon_frame(got), canon_frame(exp)
        if len(grows) != len(erows):
            print(f"FAIL {name}: rows {len(grows)} != {len(erows)}")
            n_fail += 1
            continue
        if grows != erows:
            bad = next(i for i, (a, b) in enumerate(zip(grows, erows))
                       if a != b)
            print(f"FAIL {name}: first dtype-sensitive diff at "
                  f"sorted-row {bad}:")
            print(f"  got      {grows[bad]}")
            print(f"  expected {erows[bad]}")
            n_fail += 1
            continue
        print(f"PASS {name} ({len(grows)} rows)")
        n_pass += 1
    print(f"== {n_pass} pass / {n_fail} fail ==")
    return 1 if n_fail else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
