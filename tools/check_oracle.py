#!/usr/bin/env python3
"""Local development mimic of the driver's correctness gate.

Usage: python3 tools/check_oracle.py <sfDir> <verifyOutDir>

Reads each <name>/ parquet result written by graft.Verify, runs the
corresponding oracle SQL from oracle_sql.json in DuckDB over the same
parquet tables, sorts columns by name and rows by all values, and
compares cell-by-cell (exact for ints/strings, bit-exact for floats).
"""
import json
import math
import sys

import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def canon(df):
    df = df[sorted(df.columns)]
    df = df.sort_values(by=list(df.columns), kind="mergesort").reset_index(drop=True)
    return df


def cmp_cell(a, b):
    if a is None and b is None:
        return True
    try:
        if isinstance(a, float) or isinstance(b, float):
            if isinstance(a, float) and isinstance(b, float) and math.isnan(a) and math.isnan(b):
                return True
            return a == b
    except TypeError:
        pass
    return a == b


def main(sf_dir, out_dir):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_pass = n_fail = 0
    for name, sql in sorted(oracle.items()):
        try:
            got = con.sql(f"SELECT * FROM '{out_dir}/{name}/*.parquet'").df()
            want = con.sql(sql).df()
            g, w = canon(got), canon(want)
            if list(g.columns) != list(w.columns):
                print(f"FAIL {name}: columns {list(g.columns)} != {list(w.columns)}")
                n_fail += 1
                continue
            if len(g) != len(w):
                print(f"FAIL {name}: rows {len(g)} != {len(w)}")
                n_fail += 1
                continue
            # dtype check (schema match)
            dt_mismatch = [(c, str(g[c].dtype), str(w[c].dtype))
                           for c in g.columns if str(g[c].dtype) != str(w[c].dtype)]
            bad = None
            for i in range(len(g)):
                for c in g.columns:
                    if not cmp_cell(g[c].iloc[i], w[c].iloc[i]):
                        bad = (i, c, g[c].iloc[i], w[c].iloc[i])
                        break
                if bad:
                    break
            if bad:
                print(f"FAIL {name}: row {bad[0]} col {bad[1]}: got {bad[2]!r} want {bad[3]!r}")
                n_fail += 1
            elif dt_mismatch:
                # Driver-strict: its hash compare is dtype-sensitive, so a
                # dtype mismatch (e.g. DuckDB HUGEINT -> float64 vs Spark
                # int64 from an uncast sum()) IS a failure, not a warning.
                print(f"FAIL {name}: values match but dtypes differ: {dt_mismatch}")
                n_fail += 1
            else:
                print(f"PASS {name} ({len(g)} rows)")
                n_pass += 1
        except Exception as e:
            print(f"FAIL {name}: {type(e).__name__}: {e}")
            n_fail += 1
    print(f"== {n_pass} pass, {n_fail} fail")
    return 1 if n_fail else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
