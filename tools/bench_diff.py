#!/usr/bin/env python3
"""Compare two Bench full-map JSON files (per-query medians).

Usage: bench_diff.py OLD.json NEW.json [ratio_threshold]

Prints queries whose median changed by more than the threshold in
either direction, plus totals — the cross-round regression sweep the
judge reads. Sub-0.2 s medians are noise in this sandbox and are
skipped unless they crossed 1 s.

Driver BENCH_r{N}.json files carry only the top-10 compact map (the
driver captures ~2 KB of stdout tail, and 400+ query entries cannot
fit), so when a file's "queries" map is PARTIAL (n_queries >
len(queries)) this script resolves the full per-query record
automatically: first the committed same-round sibling
BENCH_LOCAL_r{N}.json, then bench_full.json (the copy graft.Bench
always writes next to the driver artifact). Driver files alone are
therefore enough — the full map travels in the repo, keyed by round.
"""
import json
import os
import re
import sys


def load_full(path: str) -> dict:
    rec = json.load(open(path))
    nq = rec.get("n_queries")
    if not nq or nq <= len(rec.get("queries", {})):
        return rec
    # partial compact record: resolve the full-map sibling
    d = os.path.dirname(path) or "."
    cands = []
    m = re.search(r"BENCH_r(\d+)\.json$", os.path.basename(path))
    if m:
        cands.append(os.path.join(d, f"BENCH_LOCAL_r{m.group(1)}.json"))
    cands.append(os.path.join(d, "bench_full.json"))
    for c in cands:
        if not os.path.exists(c):
            continue
        full = json.load(open(c))
        # A genuine full map must cover the compact record's declared
        # n_queries — an equally-compact sibling (e.g. a stale partial
        # BENCH_LOCAL) must NOT be silently accepted as "full".
        if len(full.get("queries", {})) >= nq:
            print(f"note: {os.path.basename(path)} is compact "
                  f"({len(rec.get('queries', {}))}/{nq} queries) -> "
                  f"using {os.path.basename(c)}")
            return full
    print(f"warning: {path} holds only {len(rec.get('queries', {}))} of "
          f"{nq} queries and no full-map sibling was found")
    return rec


def main() -> None:
    old = load_full(sys.argv[1])
    new = load_full(sys.argv[2])
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
