#!/usr/bin/env python3
"""Dev-loop oracle checker (mimics the driver's DuckDB compare).

Usage: python3 tools/check_oracle.py <sfDir> <verifyOutDir> [query ...]

For each query: reads the Spark result parquet written by graft.Verify,
runs the oracle SQL from oracle_sql.json in DuckDB with views over the
sfDir parquet tables, sorts columns by name, and compares row sets
(exact on non-floats; exact-bits on floats first, then a 1e-9 relative
fallback report so we can see HOW far off a float mismatch is).
"""
import json
import sys

import duckdb

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    only = set(sys.argv[3:])
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )
    failures = 0
    for name, sql in sorted(oracle.items()):
        if only and name not in only:
            continue
        try:
            exp = con.execute(sql).fetchdf()
            got = con.execute(
                f"SELECT * FROM read_parquet('{out_dir}/{name}/*.parquet')"
            ).fetchdf()
        except Exception as e:
            print(f"FAIL {name}: {e}")
            failures += 1
            continue
        exp = exp[sorted(exp.columns)]
        got = got[sorted(got.columns)]
        if list(exp.columns) != list(got.columns):
            print(f"FAIL {name}: columns {list(got.columns)} != {list(exp.columns)}")
            failures += 1
            continue
        if len(exp) != len(got):
            print(f"FAIL {name}: rows {len(got)} != {len(exp)}")
            failures += 1
            continue
        # order-insensitive compare: sort by all columns
        cols = list(exp.columns)
        exp_s = exp.sort_values(cols).reset_index(drop=True)
        got_s = got.sort_values(cols).reset_index(drop=True)
        if exp_s.equals(got_s):
            print(f"OK   {name}: {len(exp)} rows exact")
            continue
        # exact failed: locate differing cells
        diffs = []
        for c in cols:
            e, g = exp_s[c], got_s[c]
            try:
                neq = ~(e.eq(g) | (e.isna() & g.isna()))
            except Exception:
                neq = e.astype(str) != g.astype(str)
            if neq.any():
                i = int(neq.idxmax())
                diffs.append((c, int(neq.sum()), e.iloc[i], g.iloc[i]))
        print(f"FAIL {name}: {len(exp)} rows, cell diffs: {diffs[:5]}")
        failures += 1
    sys.exit(1 if failures else 0)


if __name__ == "__main__":
    main()
