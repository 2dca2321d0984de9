#!/usr/bin/env python3
"""Local mimic of the driver's t2 correctness gate.

Usage:  python3 tools/check_oracle.py <verify_out_dir> <sf_dir>

Reads each <name>/ parquet result written by graft.Verify, runs the matching
SQL from oracle_sql.json in DuckDB over the sf_dir parquet tables, sorts
columns by name and rows by all columns, and compares cell-by-cell (exact for
ints/strings, tiny relative tolerance reported separately for floats so we
can see WHERE float drift would appear even though the real driver hashes
exactly).

This is builder-side tooling only — the engine itself has no Python.
"""
import json
import math
import sys

import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings"]


def canon(rows, cols):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = [tuple(r[i] for i in order) for r in rows]
    out.sort(key=lambda t: tuple((x is None, str(x)) for x in t))
    return [cols[i] for i in order], out


def cells_equal(a, b):
    if a is None or b is None:
        return a is None and b is None, False
    if isinstance(a, float) or isinstance(b, float):
        if a == b:
            return True, False
        if math.isclose(a, b, rel_tol=1e-9, abs_tol=1e-12):
            return True, True  # equal only within tolerance -> float drift!
        return False, False
    return a == b, False


def main():
    out_dir, sf_dir = sys.argv[1], sys.argv[2]
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")
    # subset Verify runs write oracle_sql.subset.json (never clobbering a
    # full dir's oracle_sql.json); prefer it when present
    import os
    subset = f"{out_dir}/oracle_sql.subset.json"
    oracle = json.load(open(subset if os.path.exists(subset) else f"{out_dir}/oracle_sql.json"))
    failures = 0
    for name, sql in sorted(oracle.items()):
        try:
            got = con.sql(f"SELECT * FROM read_parquet('{out_dir}/{name}/*.parquet')")
            got_cols, got_rows = canon(got.fetchall(), got.columns)
            exp = con.sql(sql)
            exp_cols, exp_rows = canon(exp.fetchall(), exp.columns)
        except Exception as e:
            print(f"FAIL  {name}: {e}")
            failures += 1
            continue
        if got_cols != exp_cols:
            print(f"FAIL  {name}: columns {got_cols} != {exp_cols}")
            failures += 1
            continue
        if len(got_rows) != len(exp_rows):
            print(f"FAIL  {name}: {len(got_rows)} rows != {len(exp_rows)}")
            failures += 1
            continue
        bad = drift = 0
        first_bad = None
        for gr, er in zip(got_rows, exp_rows):
            for g, e in zip(gr, er):
                ok, drifted = cells_equal(g, e)
                if not ok:
                    bad += 1
                    if first_bad is None:
                        first_bad = (gr, er)
                elif drifted:
                    drift += 1
        if bad:
            print(f"FAIL  {name}: {bad} mismatched cells; first: got={first_bad[0]} exp={first_bad[1]}")
            failures += 1
        elif drift:
            print(f"DRIFT {name}: exact rows but {drift} cells only equal within 1e-9 "
                  f"(driver hashes exactly -> would FAIL)")
            failures += 1
        else:
            print(f"OK    {name}: {len(got_rows)} rows")
    print(f"\n{len(oracle) - failures}/{len(oracle)} queries match")
    sys.exit(1 if failures else 0)


if __name__ == "__main__":
    main()
