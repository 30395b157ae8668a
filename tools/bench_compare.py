#!/usr/bin/env python3
"""Canary-normalized round-over-round bench comparison.

Usage: bench_compare.py OLD_BENCH.json NEW_BENCH.json [threshold]

Both inputs are `graft.Bench` output objects (the committed
BENCH_OUT.json form). Per-query times are divided by each run's canary
ratio (host-noise adjustment — see Bench.scala's canary doc) before
comparing, so a uniformly loaded host does not read as a regression.
The divisor is the canary-BASKET median (`canary_basket.ratio_median`,
~5 cheap plan-stable queries) when the artifact carries it — a single
query's GC spike then cannot skew every comparison, which is exactly
what happened to the two r10 runs of identical code (q01-only ratios
1.28 vs 3.119) — falling back to the legacy single-q01 `canary.ratio`
for pre-r11 artifacts. Queries whose normalized time moved more than
`threshold`× (default 1.5) in either direction are listed — those are
the MicroBench candidates per the per-round isolated-measurement
protocol.

Local dev tool only — NOT part of the shipped library.
"""
import json, sys

def load(path):
    d = json.load(open(path))
    basket = d.get("canary_basket", {}).get("ratio_median")
    ratio = basket or d.get("canary", {}).get("ratio", 1.0) or 1.0
    src = "basket" if basket else "q01"
    return d, ratio, src

def main(old_path, new_path, threshold=1.5):
    old, r_old, s_old = load(old_path)
    new, r_new, s_new = load(new_path)
    print(f"old: total={old['value']:.1f}s canary={r_old} ({s_old})  "
          f"normalized={old['value']/r_old:.1f}s")
    print(f"new: total={new['value']:.1f}s canary={r_new} ({s_new})  "
          f"normalized={new['value']/r_new:.1f}s")
    oq, nq = old["queries"], new["queries"]
    movers = []
    for name in sorted(set(oq) & set(nq)):
        o, n = oq[name] / r_old, nq[name] / r_new
        if o <= 0:
            continue
        f = n / o
        if f > threshold or f < 1 / threshold:
            movers.append((f, name, o, n))
    added = sorted(set(nq) - set(oq))
    gone = sorted(set(oq) - set(nq))
    if added:
        print(f"new queries ({len(added)}): {', '.join(added)}")
    if gone:
        print(f"removed queries ({len(gone)}): {', '.join(gone)}")
    if movers:
        print(f"\nnormalized movers beyond {threshold}x "
              f"(MicroBench these):")
        for f, name, o, n in sorted(movers, reverse=True):
            print(f"  {name:34s} {o:6.2f}s -> {n:6.2f}s  ({f:.2f}x)")
    else:
        print(f"\nno per-query move beyond {threshold}x (canary-normalized)")
    return 0

if __name__ == "__main__":
    t = float(sys.argv[3]) if len(sys.argv) > 3 else 1.5
    sys.exit(main(sys.argv[1], sys.argv[2], t))
