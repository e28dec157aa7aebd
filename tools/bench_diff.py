#!/usr/bin/env python3
"""Compare two Bench full-map JSON files (per-query medians).

Usage: bench_diff.py OLD.json NEW.json [ratio_threshold]

Prints queries whose median changed by more than the threshold in
either direction, plus totals — the cross-round regression sweep the
judge reads. Sub-0.2 s medians are noise in this sandbox and are
skipped unless they crossed 1 s.
"""
import json
import sys


def main() -> None:
    old = json.load(open(sys.argv[1]))
    new = json.load(open(sys.argv[2]))
    thr = float(sys.argv[3]) if len(sys.argv) > 3 else 2.0
    oq, nq = old["queries"], new["queries"]
    common = sorted(set(oq) & set(nq))
    print(f"old total {old['value']:.1f}s/{len(oq)}q   "
          f"new total {new['value']:.1f}s/{len(nq)}q   "
          f"common {len(common)}")
    ratios = []
    for name in common:
        a, b = oq[name], nq[name]
        if a <= 0:
            continue
        r = b / a
        ratios.append(r)
        small = a < 0.2 and b < 1.0
        if (r >= thr or r <= 1 / thr) and not small:
            print(f"  {name:28s} {a:8.3f}s -> {b:8.3f}s   {r:5.2f}x")
    ratios.sort()
    if ratios:
        print(f"median ratio {ratios[len(ratios) // 2]:.3f}  "
              f"p90 {ratios[int(len(ratios) * 0.9)]:.3f}")
    only_new = sorted(set(nq) - set(oq))
    if only_new:
        tot = sum(nq[n] for n in only_new)
        print(f"new-only queries: {len(only_new)} ({tot:.1f}s total)")


if __name__ == "__main__":
    main()
