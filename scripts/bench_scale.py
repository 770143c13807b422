"""Scaling measurement: run bench.py at two scale factors and report
the per-query scaling exponent alpha = log(t_hi/t_lo) / log(sf_hi/sf_lo).

alpha <= ~1 means the query scales (sub)linearly in rows; alpha >> 1
flags super-linear work (the thing a 100 TB deployment cannot absorb).
Fixed per-query overhead (driver planning, Arrow worker spin-up) makes
tiny-denominator queries read as alpha < 0.5 — those are reported but
not scaling signals.

Usage:
    python scripts/bench_scale.py <lo.json> <hi.json> [ratio]

where each JSON is one bench.py output line and ratio is the row-count
ratio between the two runs (default 10).
"""

from __future__ import annotations

import json
import math
import sys


def main():
    lo = json.load(open(sys.argv[1]))
    hi = json.load(open(sys.argv[2]))
    ratio = float(sys.argv[3]) if len(sys.argv) > 3 else 10.0
    rows = []
    for name, t_lo in lo["queries"].items():
        t_hi = hi["queries"].get(name)
        if t_hi is None:
            continue
        alpha = math.log(max(t_hi, 1e-6) / max(t_lo, 1e-6)) / math.log(ratio)
        rows.append((name, t_lo, t_hi, alpha))
    rows.sort(key=lambda r: -r[3])
    print(f"| query | t(sf={lo.get('sf')}) | t(sf={hi.get('sf')}) | alpha |")
    print("| --- | --- | --- | --- |")
    for name, t_lo, t_hi, alpha in rows:
        print(f"| {name} | {t_lo:.3f} | {t_hi:.3f} | {alpha:+.2f} |")
    worst = [r for r in rows if r[3] > 1.15 and r[2] > 0.5]
    print()
    print(f"total: {lo['value']:.2f}s -> {hi['value']:.2f}s "
          f"(x{hi['value'] / lo['value']:.2f} at x{ratio:.0f} rows)")
    # the headline that survives the output-quadratic gates (VERDICT
    # r10 item 3): at sf >= 1 those gates' wall is qualifying-pair
    # volume, not engine work, so this is the round-comparable number
    lo_x, hi_x = lo.get("value_excl_quadratic"), hi.get("value_excl_quadratic")
    if lo_x and hi_x:
        print(f"total_excl_quadratic: {lo_x:.2f}s -> {hi_x:.2f}s "
              f"(x{hi_x / lo_x:.2f} at x{ratio:.0f} rows)")
    if worst:
        print("SUPER-LINEAR (alpha > 1.15 and t_hi > 0.5s):")
        for name, t_lo, t_hi, alpha in worst:
            print(f"  {name}: {t_lo:.3f}s -> {t_hi:.3f}s (alpha {alpha:.2f})")
    else:
        print("no query scales super-linearly (alpha <= 1.15 everywhere that matters)")


if __name__ == "__main__":
    main()
