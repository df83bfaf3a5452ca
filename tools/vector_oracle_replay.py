#!/usr/bin/env python3
"""Independent exact replay for the brute-force VECTOR oracles at
giant scale factors.

dc03_semantic_decon_lsh / dc03r_decon_recall's DuckDB oracles compute
an exact max-cosine of every (sliced) corpus vector against the WHOLE
label-0 set with interpreted list lambdas — ~0.9e9 / 3.6e9 64-dim
cosines at the 100x staging, far past any per-oracle time budget (the
30x gate still replayed them in SQL; 100x is where the interpreted
form dies). The math itself is a blocked unit-vector matmul: numpy
does it in seconds, with the SAME brute-force independence from the
engine under test (no LSH, no banding, no Spark).

Semantics mirror the SQL oracle exactly:
  dc03 : corpus = label<>0 AND vec_id%4==1; bench = label==0
         n_exact_drops_audit = #{mc >= 0.35}
         n_strong_audit      = #{round(mc,6) >= 0.9}
         (+ four constant booleans, as published)
  dc03r: corpus = label<>0 (all); bench = label==0
         n_strong = #{mc >= 0.9}; within_bound = 1

Counts are integers; a cosine would have to sit within ~1e-12 of the
threshold for summation-order noise to flip one, and the comparison
below fails loudly on any count mismatch.

Usage: python3 tools/vector_oracle_replay.py <sfDir> <verifyOutDir>
"""
import sys

import duckdb
import numpy as np


def load(sf_dir):
    con = duckdb.connect()
    path = f"{sf_dir}/embeddings.parquet"
    import os
    glob = f"{path}/*.parquet" if os.path.isdir(path) else path
    rows = con.sql(
        f"SELECT vec_id, label, embedding FROM '{glob}'").fetchnumpy()
    vec_id = rows["vec_id"].astype(np.int64)
    label = rows["label"].astype(np.int64)
    emb = np.stack([np.asarray(e, dtype=np.float64)
                    for e in rows["embedding"]])
    return vec_id, label, emb


def round_half_away(x, decimals):
    """Round half AWAY from zero, matching DuckDB round() and Spark
    round() — np.round is banker's rounding (half to even), which
    could flip a count on a cosine landing exactly on a 6-decimal
    half-boundary near a threshold (ADVICE r12)."""
    scale = 10.0 ** decimals
    return np.sign(x) * np.floor(np.abs(x) * scale + 0.5) / scale


def max_cosine(corpus, bench, block=8192):
    # a zero-norm embedding would yield NaN cosines that compare False
    # against every threshold — a silent undercount; fail loudly
    # instead (the SQL oracle's divide-by-zero may behave differently)
    cn = np.linalg.norm(corpus, axis=1, keepdims=True)
    bn = np.linalg.norm(bench, axis=1, keepdims=True)
    assert cn.min() > 0 and bn.min() > 0, \
        "zero-norm embedding in the corpus/bench — cosine undefined"
    cu = corpus / cn
    bu = bench / bn
    out = np.empty(len(cu))
    for i in range(0, len(cu), block):
        out[i:i + block] = (cu[i:i + block] @ bu.T).max(axis=1)
    return out


def spark_row(out_dir, name):
    con = duckdb.connect()
    rel = con.sql(f"SELECT * FROM '{out_dir}/{name}/*.parquet'")
    cols = rel.columns
    return dict(zip(cols, rel.fetchone()))


def check(name, expect, got):
    if expect == got:
        print(f"PASS_NUMPY {name} (1 rows, exact: {got})")
        return True
    print(f"FAIL {name}: spark={expect} numpy={got}")
    return False


def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    vec_id, label, emb = load(sf_dir)
    bench = emb[label == 0]
    ok = True

    # every check is conditional on its dump existing, so the tool
    # replays whatever subset the Verify invocation produced (full
    # sweeps and targeted scale gates alike)
    import os

    if os.path.isdir(f"{out_dir}/dc03_semantic_decon_lsh"):
        mask = (label != 0) & (vec_id % 4 == 1)
        mc = max_cosine(emb[mask], bench)
        got = {"n_exact_drops_audit": int((mc >= 0.35).sum()),
               "n_strong_audit": int((round_half_away(mc, 6) >= 0.9).sum()),
               "nonempty_ok": True, "precision_ok": True,
               "sim_bounded_ok": True, "recall_bound_ok": True}
        sp = spark_row(out_dir, "dc03_semantic_decon_lsh")
        ok &= check("dc03_semantic_decon_lsh",
                    {k: sp[k] for k in got}, got)

    if os.path.isdir(f"{out_dir}/dc03r_decon_recall"):
        mc = max_cosine(emb[label != 0], bench)
        got = {"n_strong": int((mc >= 0.9).sum()), "within_bound": 1}
        sp = spark_row(out_dir, "dc03r_decon_recall")
        ok &= check("dc03r_decon_recall", {k: sp[k] for k in got}, got)

    # dc05 (r14): same quarter-slice counts as dc03 plus the
    # selectivity-serve booleans (constants in the oracle; the
    # Spark-side audit computes them for real).
    if os.path.isdir(f"{out_dir}/dc05_decon_selective"):
        mask = (label != 0) & (vec_id % 4 == 1)
        mc = max_cosine(emb[mask], bench)
        got = {"n_exact_drops_audit": int((mc >= 0.35).sum()),
               "n_strong_audit": int((round_half_away(mc, 6) >= 0.9).sum()),
               "nonempty_ok": True, "precision_ok": True,
               "sim_bounded_ok": True, "recall_ok": True,
               "pruned_ok": True}
        sp = spark_row(out_dir, "dc05_decon_selective")
        ok &= check("dc05_decon_selective", {k: sp[k] for k in got}, got)

    # dc06 (r15): the auto-crossover serve. Exact-side scalars are the
    # same quarter-slice counts (bench replication cannot change a max
    # or a count — replicas carry identical embeddings); the crossover
    # booleans are constants in the oracle, computed for real in-plan.
    if os.path.isdir(f"{out_dir}/dc06_decon_auto"):
        mask = (label != 0) & (vec_id % 4 == 1)
        mc = max_cosine(emb[mask], bench)
        got = {"n_exact_drops_audit": int((mc >= 0.35).sum()),
               "n_strong_audit": int((round_half_away(mc, 6) >= 0.9).sum()),
               "nonempty_ok": True, "precision_ok": True,
               "sim_bounded_ok": True, "recall_ok": True,
               "pruned_ok": True, "crossed_ok": True,
               "auto_selective_ok": True}
        sp = spark_row(out_dir, "dc06_decon_auto")
        ok &= check("dc06_decon_auto", {k: sp[k] for k in got}, got)

    sys.exit(0 if ok else 1)


if __name__ == "__main__":
    main()
