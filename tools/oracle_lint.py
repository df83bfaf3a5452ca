#!/usr/bin/env python3
"""Oracle-SQL result-type lint.

The driver hash-compares DuckDB oracle values against Spark parquet
values EXACTLY. DuckDB silently widens integer aggregates to HUGEINT
(SUM over BIGINT) and some arithmetic to DECIMAL — types Spark never
produces, so the hash mismatches even when the numbers are equal. That
trap has fired twice (tx05 round 2, cp04 rounds 5-6, each costing a red
round). This lint DESCRIBEs every oracle query and fails on any
HUGEINT/DECIMAL/UHUGEINT column so the mismatch is caught at
build time, not in the round report.

Usage:
    python3 tools/oracle_lint.py <sfDir> <oracle_sql.json>

A fresh oracle_sql.json without a full verify run:
    sbt -batch "runMain graft.Verify /root/testdata/sf0.001 /tmp/lintdump __sql_only__"
"""
import json
import sys

import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

BAD_TYPES = ("HUGEINT", "UHUGEINT", "DECIMAL")


def main():
    sf_dir, oracle_json = sys.argv[1], sys.argv[2]
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    oracles = json.load(open(oracle_json))
    n_bad = n_err = 0
    for name, sql in sorted(oracles.items()):
        try:
            cols = con.sql(f"DESCRIBE {sql}").fetchall()
        except Exception as e:
            print(f"ERROR {name}: oracle sql does not plan: {e}")
            n_err += 1
            continue
        bad = [(c, ty) for c, ty, *_ in cols
               if any(b in ty.upper() for b in BAD_TYPES)]
        if bad:
            n_bad += 1
            for c, ty in bad:
                print(f"LINT {name}: column '{c}' is {ty} — Spark never "
                      f"produces this; CAST it (BIGINT/DOUBLE) in the oracle")
    print(f"\n{len(oracles)} oracles checked: {n_bad} with banned result "
          f"types, {n_err} unplannable")
    sys.exit(1 if (n_bad or n_err) else 0)


if __name__ == "__main__":
    main()
