#!/usr/bin/env python3
"""Compare two Bench runs (BENCH_QUERIES.json format) and flag entries
whose time grew super-linearly versus the data-scale ratio.

Usage: python3 tools/compare_bench.py <base.json> <scaled.json> <data_ratio>

An entry is flagged when scaled/base > data_ratio * SLACK. Sub-second
base times are noisy (JVM/stage-scheduling floor dominates), so entries
with base < FLOOR get the floor substituted as the denominator.
"""
import json
import sys

SLACK = 2.0   # host-stall variance band documented across rounds
FLOOR = 0.30  # seconds: below this, base time is scheduling noise


def main():
    base_f, scaled_f, ratio = sys.argv[1], sys.argv[2], float(sys.argv[3])
    base = json.load(open(base_f))["queries"]
    scaled = json.load(open(scaled_f))["queries"]
    rows = []
    for name, t1 in sorted(scaled.items()):
        t0 = base.get(name)
        if t0 is None or t1 is None:
            rows.append((name, t0, t1, None, "MISSING/FAILED"))
            continue
        eff = t1 / max(t0, FLOOR)
        flag = "SUPER-LINEAR" if eff > ratio * SLACK else ""
        rows.append((name, t0, t1, eff, flag))
    w = max(len(r[0]) for r in rows)
    n_flag = 0
    for name, t0, t1, eff, flag in rows:
        if flag:
            n_flag += 1
        print(f"{name:<{w}}  base={t0 if t0 is not None else '—':>7}  "
              f"scaled={t1 if t1 is not None else '—':>7}  "
              f"x={f'{eff:.1f}' if eff is not None else '—':>6}  {flag}")
    total0 = sum(v for v in base.values() if v)
    total1 = sum(v for v in scaled.values() if v)
    print(f"\ntotals: base={total0:.1f}s scaled={total1:.1f}s "
          f"ratio={total1 / total0:.2f} (data ratio {ratio}); "
          f"{n_flag} flagged of {len(rows)}")


if __name__ == "__main__":
    main()
