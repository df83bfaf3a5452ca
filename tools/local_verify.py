#!/usr/bin/env python3
"""Local stand-in for the driver's DuckDB-oracle correctness check.

Usage: python3 tools/local_verify.py <sfDir> <verifyOutDir>

Loads each <verifyOutDir>/<name>/ parquet result (written by graft.Verify),
runs the matching oracle SQL from oracle_sql.json in DuckDB over the same
sfDir parquet tables, and compares schemas + values (sorted rows, columns
sorted by name, small float tolerance reported separately from exact match).
"""
import json
import math
import sys

import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def norm(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return v
    return v


def rows_key(rows):
    return sorted([tuple(repr(norm(v)) for v in r) for r in rows])


def close(a, b):
    if a == b:
        return True
    try:
        fa, fb = float(a), float(b)
        if math.isnan(fa) and math.isnan(fb):
            return True
        return abs(fa - fb) <= 1e-9 * max(1.0, abs(fa), abs(fb))
    except (TypeError, ValueError):
        return False


def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    con = duckdb.connect()
    for t in TABLES:
        # driver testdata tables are single parquet FILES; staged
        # scale-probe corpora are Spark-written DIRECTORIES of parts
        path = f"{sf_dir}/{t}.parquet"
        import os
        if os.path.isdir(path):
            path = f"{path}/*.parquet"
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{path}'")
    oracles = json.load(open(f"{out_dir}/oracle_sql.json"))
    # optional extra args: check only these entries (matches graft.Verify's
    # subset invocation for local iteration)
    only = set(sys.argv[3:])
    if only:
        oracles = {k: v for k, v in oracles.items() if k in only}
    n_pass = n_fail = 0
    for name, sql in sorted(oracles.items()):
        try:
            spark_rel = con.sql(f"SELECT * FROM '{out_dir}/{name}/*.parquet'")
            spark_cols = sorted(spark_rel.columns)
            spark_rows = con.sql(
                f"SELECT {', '.join(spark_cols)} FROM spark_rel").fetchall()
        except Exception as e:
            print(f"FAIL {name}: spark result unreadable: {e}")
            n_fail += 1
            continue
        try:
            oracle_rel = con.sql(sql)
            ocols = sorted(oracle_rel.columns)
            oracle_rows = con.sql(
                f"SELECT {', '.join(ocols)} FROM oracle_rel").fetchall()
        except Exception as e:
            print(f"FAIL {name}: oracle sql error: {e}")
            n_fail += 1
            continue
        if [c.lower() for c in spark_cols] != [c.lower() for c in ocols]:
            print(f"FAIL {name}: column mismatch spark={spark_cols} oracle={ocols}")
            n_fail += 1
            continue
        if len(spark_rows) != len(oracle_rows):
            print(f"FAIL {name}: rowcount spark={len(spark_rows)} oracle={len(oracle_rows)}")
            n_fail += 1
            continue
        sk, ok = rows_key(spark_rows), rows_key(oracle_rows)
        if sk == ok:
            print(f"PASS {name} ({len(spark_rows)} rows, exact)")
            n_pass += 1
            continue
        # exact repr mismatch — check row-wise with float tolerance
        ssorted = sorted(spark_rows, key=lambda r: tuple(repr(norm(v)) for v in r))
        osorted = sorted(oracle_rows, key=lambda r: tuple(repr(norm(v)) for v in r))
        bad = None
        for sr, orow in zip(ssorted, osorted):
            if not all(close(a, b) for a, b in zip(sr, orow)):
                bad = (sr, orow)
                break
        if bad is None:
            print(f"NEAR {name} ({len(spark_rows)} rows, float-tolerance only "
                  f"— would FAIL an exact hash compare)")
            n_fail += 1
        else:
            print(f"FAIL {name}: value mismatch e.g. spark={bad[0]} oracle={bad[1]}")
            n_fail += 1
    print(f"\n{n_pass} pass / {n_fail} fail "
          f"(queries with no oracle: rows-only, not checked here)")


if __name__ == "__main__":
    main()
