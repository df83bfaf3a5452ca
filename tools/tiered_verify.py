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
  - a SLICED tier for giant result frames (> --bigrows rows, default
    2M): materializing + Python-sorting a 60M-row frame is the real
    sf10 bottleneck, not the oracle SQL itself. Both sides get an
    identical deterministic md5 row-hash over the NON-FLOAT columns
    (each side hashes its own values, so a slice is the same logical
    rows on both sides; float columns are excluded from the hash and
    compared with the usual tolerance inside the slice), the exact
    TOTAL rowcounts are compared, and the hash-prefix slice (sized to
    <= ~500k rows) is compared exactly. Reported as PASS_SLICED /
    NEAR_SLICED so the report distinguishes the tier.
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


def compare_fetched(name, spark_rows, oracle_rows, label=""):
    if rows_key(spark_rows) == rows_key(oracle_rows):
        return f"PASS{label} {name} ({len(spark_rows)} rows, exact)"
    ssorted = sorted(spark_rows,
                     key=lambda r: tuple(repr(norm(v)) for v in r))
    osorted = sorted(oracle_rows,
                     key=lambda r: tuple(repr(norm(v)) for v in r))
    for sr, orow in zip(ssorted, osorted):
        if not all(close(a, b) for a, b in zip(sr, orow)):
            return (f"FAIL {name}: value mismatch e.g. spark={sr} "
                    f"oracle={orow}")
    return f"NEAR{label} {name} ({len(spark_rows)} rows, float-tolerance only)"


def check_one(sf_dir, out_dir, name, sql, q, bigrows, tmp):
    """Child process: run one oracle + compare; put a result line."""
    try:
        con = duckdb.connect()
        # sharded gate runs several instances side by side: cap each
        # child so concurrent oracles share the box instead of each
        # assuming it owns it (DuckDB defaults to all cores / 80% RAM)
        threads = os.environ.get("TIERED_VERIFY_THREADS")
        if threads:
            con.execute(f"SET threads TO {int(threads)}")
        memlim = os.environ.get("TIERED_VERIFY_MEMLIMIT")
        if memlim:
            con.execute(f"SET memory_limit = '{memlim}'")
        if os.environ.get("TIERED_VERIFY_NOORDER"):
            # giant CTE chains: don't buffer rows to preserve input
            # order DuckDB is otherwise contractually bound to — every
            # compare here sorts or bag-compares anyway
            con.execute("SET preserve_insertion_order = false")
        # each child spills to its OWN temp dir: the default is the
        # relative ".tmp", which concurrent shards share — one child
        # cleaning up removes another's live spill file and the victim
        # aborts (uncaught duckdb::IOException -> "child died")
        os.makedirs(tmp, exist_ok=True)
        con.execute(f"SET temp_directory = '{tmp}'")
        for t in TABLES:
            path = f"{sf_dir}/{t}.parquet"
            if os.path.isdir(path):
                path = f"{path}/*.parquet"
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{path}'")
        try:
            spark_rel = con.sql(f"SELECT * FROM '{out_dir}/{name}/*.parquet'")
            spark_cols = sorted(spark_rel.columns)
            scount = con.sql("SELECT count(*) FROM spark_rel").fetchone()[0]
        except Exception as e:
            q.put(f"SPARK_MISSING {name}: {e}")
            return
        # ---- EXCEPT tier: frames whose TEXT payload is too large to
        # materialize twice into Python tuples (fetchall + rows_key
        # repr-copies ≈ 4× the payload; a 500k-row full-text frame
        # OOM-kills the child). When the schema has no float column the
        # bag compare runs entirely inside DuckDB: equal counts plus an
        # empty EXCEPT ALL in one direction IS bag equality, bit-exact.
        # the strlen probe itself scans every column CAST to VARCHAR —
        # skip it for small frames that will take the fetchall path
        # regardless (ADVICE r12: pure overhead at the 237-entry
        # surface); 50k rows x even 10 KB/row sits far under bigbytes
        textbytes = 0 if (scount > bigrows or scount < 50_000) else con.sql(
            "SELECT coalesce(sum(" + " + ".join(
                [f"coalesce(strlen(CAST({c} AS VARCHAR)), 0)"
                 for c in spark_cols]) + "), 0) FROM spark_rel"
        ).fetchone()[0]
        bigbytes = int(os.environ.get("TIERED_VERIFY_BIGBYTES",
                                      800_000_000))
        if scount <= bigrows and textbytes > bigbytes:
            try:
                con.execute(f"CREATE TEMP TABLE oracle_t AS {sql}")
            except Exception as e:
                q.put(f"ORACLE_ERR {name}: {e}")
                return
            otypes = con.sql("DESCRIBE oracle_t").fetchall()
            ocols = sorted(r[0] for r in otypes)
            if [c.lower() for c in spark_cols] != [c.lower() for c in ocols]:
                q.put(f"FAIL {name}: column mismatch spark={spark_cols} "
                      f"oracle={ocols}")
                return
            if any(t in str(r[1]).upper()
                   for r in otypes for t in ("FLOAT", "DOUBLE", "REAL")):
                q.put(f"ORACLE_ERR {name}: text frame too large for "
                      f"fetchall but schema has float columns - no "
                      f"exact in-db compare available")
                return
            ocount = con.sql("SELECT count(*) FROM oracle_t").fetchone()[0]
            if scount != ocount:
                q.put(f"FAIL {name}: rowcount spark={scount} "
                      f"oracle={ocount}")
                return
            sel = ", ".join(ocols)
            extra = con.sql(
                f"SELECT count(*) FROM (SELECT {sel} FROM spark_rel "
                f"EXCEPT ALL SELECT {sel} FROM oracle_t)").fetchone()[0]
            if extra:
                q.put(f"FAIL {name}: {extra} spark rows not in oracle "
                      f"(EXCEPT ALL tier)")
                return
            q.put(f"PASS_EXCEPT {name} ({scount} rows, exact: equal "
                  f"counts + empty EXCEPT ALL, in-db)")
            return
        if scount <= bigrows:
            spark_rows = con.sql(
                f"SELECT {', '.join(spark_cols)} FROM spark_rel").fetchall()
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
            q.put(compare_fetched(name, spark_rows, oracle_rows))
            return
        # ---- SLICED tier: giant frame. Materialize the oracle once,
        # compare exact total counts, then compare a deterministic
        # md5-prefix slice of both sides exactly.
        try:
            con.execute(f"CREATE TEMP TABLE oracle_t AS {sql}")
        except Exception as e:
            q.put(f"ORACLE_ERR {name}: {e}")
            return
        ocols = sorted(r[0] for r in con.sql("DESCRIBE oracle_t").fetchall())
        if [c.lower() for c in spark_cols] != [c.lower() for c in ocols]:
            q.put(f"FAIL {name}: column mismatch spark={spark_cols} "
                  f"oracle={ocols}")
            return
        ocount = con.sql("SELECT count(*) FROM oracle_t").fetchone()[0]
        if scount != ocount:
            q.put(f"FAIL {name}: rowcount spark={scount} oracle={ocount}")
            return
        # non-float columns drive the slice hash (each engine renders
        # its own floats, so float text must not pick the slice)
        types = {r[0]: str(r[1]) for r in con.sql("DESCRIBE oracle_t")
                 .fetchall()}
        hashcols = [c for c in ocols
                    if not any(t in types[c].upper()
                               for t in ("FLOAT", "DOUBLE", "REAL"))]
        if not hashcols:
            q.put(f"PASS_COUNTONLY {name} ({scount} rows; all-float schema"
                  f" - slice hash undefined, counts exact)")
            return
        expr = ("md5(concat_ws('|', " + ", ".join(
            f"coalesce(CAST({c} AS VARCHAR), chr(1))" for c in hashcols)
            + "))")
        depth = 1
        while scount / (16 ** depth) > 500_000:
            depth += 1
        prefix = "0" * depth
        sel = ", ".join(ocols)
        spark_rows = con.sql(
            f"SELECT {sel} FROM spark_rel "
            f"WHERE {expr} LIKE '{prefix}%'").fetchall()
        oracle_rows = con.sql(
            f"SELECT {sel} FROM oracle_t "
            f"WHERE {expr} LIKE '{prefix}%'").fetchall()
        if len(spark_rows) != len(oracle_rows):
            q.put(f"FAIL {name}: slice rowcount spark={len(spark_rows)} "
                  f"oracle={len(oracle_rows)} (prefix '{prefix}')")
            return
        res = compare_fetched(name, spark_rows, oracle_rows, "_SLICED")
        if res.startswith(("PASS", "NEAR")):
            res += (f" [total {scount} rows count-exact; slice=md5 prefix "
                    f"'{prefix}' = {len(spark_rows)} rows]")
        q.put(res)
    except Exception as e:  # pragma: no cover - defensive
        q.put(f"ORACLE_ERR {name}: {e}")


def main():
    args = sys.argv[1:]
    sf_dir, out_dir = args[0], args[1]
    timeout = 600.0
    bigrows = 2_000_000
    skip = set()
    only = []
    i = 2
    while i < len(args):
        if args[i] == "--timeout":
            timeout = float(args[i + 1]); i += 2
        elif args[i] == "--bigrows":
            bigrows = int(args[i + 1]); i += 2
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
            # parent-generated UNIQUE spill dir (uuid, not child pid):
            # with several shard instances sharing out_dir, OS pid
            # reuse could otherwise let one shard's post-exit cleanup
            # delete another shard's live spill dir (ADVICE r12)
            import uuid
            tmp = f"{out_dir}/.duckdb_tmp_{name}_{uuid.uuid4().hex[:8]}"
            p = mp.Process(target=check_one,
                           args=(sf_dir, out_dir, name, sql, q, bigrows,
                                 tmp))
            p.start()
            p.join(timeout)
            if p.is_alive():
                p.terminate()
                p.join()
                line = f"ORACLE_TIMEOUT {name}: > {timeout:.0f}s"
            else:
                line = q.get() if not q.empty() else \
                    f"ORACLE_ERR {name}: child died without result"
            # a timeout-killed child leaves its spill files behind —
            # reclaim them before the next entry needs the disk
            import shutil
            shutil.rmtree(tmp, ignore_errors=True)
        print(line, flush=True)
        counts[line.split()[0]] = counts.get(line.split()[0], 0) + 1
    print("\nSUMMARY " + json.dumps(counts))


if __name__ == "__main__":
    main()
