#!/usr/bin/env python3
"""Tiered DuckDB-oracle replay for staged scale corpora (the 100x gate).

Same compare semantics as local_verify.py, plus:
  - a PER-ORACLE wall-clock timeout (each oracle runs in a child
    process; a blown budget kills the child and records ORACLE_TIMEOUT
    instead of wedging the whole gate -- the 30x full replay took
    ~70 min, and several anchors are quadratic-by-design at 100x);
  - a --skip list of entry names excluded up front (the documented
    anchor tier), each recorded as SKIPPED so the report accounts for
    every dumped entry;
  - machine-readable one-line-per-entry output for VERIFY_SF10.md.

Usage:
  python3 tools/tiered_verify.py <sfDir> <verifyOutDir> \
      [--timeout SECONDS] [--skip name1,name2,...] [only names...]
"""
import json
import math
import multiprocessing as mp
import os
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


def check_one(sf_dir, out_dir, name, sql, q):
    """Child process: run one oracle + compare; put a result line."""
    try:
        con = duckdb.connect()
        for t in TABLES:
            path = f"{sf_dir}/{t}.parquet"
            if os.path.isdir(path):
                path = f"{path}/*.parquet"
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{path}'")
        try:
            spark_rel = con.sql(f"SELECT * FROM '{out_dir}/{name}/*.parquet'")
            spark_cols = sorted(spark_rel.columns)
            spark_rows = con.sql(
                f"SELECT {', '.join(spark_cols)} FROM spark_rel").fetchall()
        except Exception as e:
            q.put(f"SPARK_MISSING {name}: {e}")
            return
        try:
            oracle_rel = con.sql(sql)
            ocols = sorted(oracle_rel.columns)
            oracle_rows = con.sql(
                f"SELECT {', '.join(ocols)} FROM oracle_rel").fetchall()
        except Exception as e:
            q.put(f"ORACLE_ERR {name}: {e}")
            return
        if [c.lower() for c in spark_cols] != [c.lower() for c in ocols]:
            q.put(f"FAIL {name}: column mismatch spark={spark_cols} "
                  f"oracle={ocols}")
            return
        if len(spark_rows) != len(oracle_rows):
            q.put(f"FAIL {name}: rowcount spark={len(spark_rows)} "
                  f"oracle={len(oracle_rows)}")
            return
        if rows_key(spark_rows) == rows_key(oracle_rows):
            q.put(f"PASS {name} ({len(spark_rows)} rows, exact)")
            return
        ssorted = sorted(spark_rows,
                         key=lambda r: tuple(repr(norm(v)) for v in r))
        osorted = sorted(oracle_rows,
                         key=lambda r: tuple(repr(norm(v)) for v in r))
        for sr, orow in zip(ssorted, osorted):
            if not all(close(a, b) for a, b in zip(sr, orow)):
                q.put(f"FAIL {name}: value mismatch e.g. spark={sr} "
                      f"oracle={orow}")
                return
        q.put(f"NEAR {name} ({len(spark_rows)} rows, float-tolerance only)")
    except Exception as e:  # pragma: no cover - defensive
        q.put(f"ORACLE_ERR {name}: {e}")


def main():
    args = sys.argv[1:]
    sf_dir, out_dir = args[0], args[1]
    timeout = 600.0
    skip = set()
    only = []
    i = 2
    while i < len(args):
        if args[i] == "--timeout":
            timeout = float(args[i + 1]); i += 2
        elif args[i] == "--skip":
            skip = set(args[i + 1].split(",")); i += 2
        else:
            only.append(args[i]); i += 1
    oracles = json.load(open(f"{out_dir}/oracle_sql.json"))
    if only:
        oracles = {k: v for k, v in oracles.items() if k in set(only)}
    counts = {}
    for name, sql in sorted(oracles.items()):
        if name in skip:
            line = f"SKIPPED {name}: excluded anchor tier (see report)"
        elif not os.path.isdir(f"{out_dir}/{name}"):
            line = f"NOT_DUMPED {name}"
        else:
            q = mp.Queue()
            p = mp.Process(target=check_one,
                           args=(sf_dir, out_dir, name, sql, q))
            p.start()
            p.join(timeout)
            if p.is_alive():
                p.terminate()
                p.join()
                line = f"ORACLE_TIMEOUT {name}: > {timeout:.0f}s"
            else:
                line = q.get() if not q.empty() else \
                    f"ORACLE_ERR {name}: child died without result"
        print(line, flush=True)
        counts[line.split()[0]] = counts.get(line.split()[0], 0) + 1
    print("\nSUMMARY " + json.dumps(counts))


if __name__ == "__main__":
    main()
