"""Per-decade scale report: compare two BENCH_SELF-style JSONs
(sf0.1 vs sf1) and print per-query ratios + the suite ratio.

Usage: python tools/sf1_ratio_report.py BENCH_sf01.json BENCH_sf1.json
"""

import json
import sys


def main():
    with open(sys.argv[1]) as f:
        a = json.load(f)
    with open(sys.argv[2]) as f:
        b = json.load(f)
    qa, qb = a["queries"], b["queries"]
    common = [k for k in qa if k in qb and qa[k] > 0]
    ratios = {k: qb[k] / qa[k] for k in common}
    total_a = sum(qa[k] for k in common)
    total_b = sum(qb[k] for k in common)
    print(f"{'query':32s} {'sf0.1':>8s} {'sf1':>8s} {'ratio':>7s}")
    for k in sorted(common, key=lambda k: -ratios[k]):
        print(f"{k:32s} {qa[k]:8.2f} {qb[k]:8.2f} {ratios[k]:7.2f}")
    print(f"\nqueries compared: {len(common)}")
    print(f"suite total: {total_a:.1f}s -> {total_b:.1f}s "
          f"= {total_b / total_a:.2f}x per decade")
    med = sorted(ratios.values())[len(ratios) // 2]
    print(f"median per-query ratio: {med:.2f}x")
    over = [k for k in common if ratios[k] > 4.0]
    print(f"rows >4x/decade: {len(over)}: "
          + ", ".join(f"{k} ({ratios[k]:.1f}x)" for k in sorted(
              over, key=lambda k: -ratios[k])))


if __name__ == "__main__":
    main()
