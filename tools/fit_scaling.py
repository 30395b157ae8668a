#!/usr/bin/env python3
"""Fit per-query scaling exponents from MicroBench sweeps over the
ScaleDataGen series and write BENCH_SCALING.json.

Usage:
  python3 tools/fit_scaling.py out.json sf1:path1.json sf2:path2.json ...

Each input is a MICROBENCH_OUT.json produced by `runMain graft.MicroBench`
with SPARK_GRAFT_SF_DIR pointed at the matching ScaleDataGen output dir.

For every query the report carries min-of-N seconds per sf, the
pairwise log-log slope between consecutive sf points, and `exponent`,
the least-squares slope over all points. Reading guide: per-query
fixed overhead (job submit, codegen, stage scheduling — a few hundred
ms at this harness's scales) dominates at the small end and biases the
all-points slope DOWN, so the top pairwise slope (largest data, where
overhead is most amortized) is the scale-honest number; `exponent_top`
repeats it for machine consumption. A query is flagged super-linear
when exponent_top exceeds its DECLARED bound: 1.25 by default (n·log n
across one decade is ~1.08; 1.25 leaves room for measurement noise
before it means quadratic work), or a per-query entry in
DECLARED_BOUNDS for the operators whose documented algorithm is
super-linear by design — the flag exists to catch a slope the CODE
does not declare, not to re-litigate the algorithm choice. Each
query's bound is emitted in its JSON entry so the artifact shows which
contract it was judged against.

Exemption: q01_pricing_summary is EXEMPT from the super-linear flag —
it rides along in every sweep as the host-noise canary (see
Bench.CanaryQuery), not as a scaling subject, and its sub-second
runtimes are dominated by JVM state rather than data volume (observed
min-of-7 spread 0.315–0.847 s on identical code). Its exponent is
still reported; the exempt list is emitted in the JSON so the
carve-out is visible in the artifact.
"""

EXEMPT = ["q01_pricing_summary"]  # canary, not a scaling subject

# Slope a linear-intended operator must stay under (n·log n + noise).
DEFAULT_BOUND = 1.25

# Operators whose DOCUMENTED algorithm is super-linear by design.
# q68: exact triangle counting via the degree-oriented intersect is
# the textbook O(m^1.5) bound (Graphs.scala scaladoc) — the carried
# O(√m) neighbor arrays make shuffle volume m^1.5 too, so the honest
# expected slope over one decade is 1.5 (measured 1.42 at sf1→10);
# 1.65 leaves the same noise margin the default enjoys. A quadratic
# DEFECT would still trip it at ~2.0.
# q104: the EXACT Jaccard join's candidate count is corpus-determined;
# the synthetic corpus draws from a 30-word vocab (≤27k distinct
# 3-gram shingles), so past ~sf1 the shingle space is saturated and
# candidates grow ~N² — expected slope approaches 2 in the saturated
# decade (measured 1.83 at sf1→10, streamed compute, zero candidate
# materialization after the r11 inline-verify fix; the pre-saturation
# decades measure 0.8-0.9, the Heaps-law-corpus behavior). Bound 2.1:
# anything above means work BEYOND the declared candidate set.
DECLARED_BOUNDS = {"q68_triangles": 1.65,
                   "q104_jaccard_join_exact": 2.1}

# Pre-saturation (non-top) decade bounds for declared-bound queries
# whose super-linearity is a TOP-decade regime, not the algorithm at
# every scale. The r11 advisor's point: q104's 2.1 top bound admits
# both the fixed streamed shape (1.83) and a reintroduced quadratic
# candidate-set shuffle (~1.9-2.0) — the top-decade flag alone cannot
# catch the exact regression round 11 fixed (PlanInvariantsSpec's
# exchange count pins it structurally). But q104's PRE-saturation
# decades measure 0.8-0.9 (Heaps-law-corpus behavior), so checking
# those against the default 1.25 restores slope-level teeth: a
# quadratic defect inflates every decade, not just the saturated one.
# q68 intentionally does NOT get the 1.25 default pre-bound — its
# m^1.5 is the algorithm at ALL decades (measured 1.2-1.4 pre-top),
# so the entry below applies its declared 1.65 to every pair slope.
PRE_BOUNDS = {"q104_jaccard_join_exact": DEFAULT_BOUND,
              "q68_triangles": 1.65}

import json
import math
import sys


def main() -> None:
    out_path = sys.argv[1]
    series = []
    for arg in sys.argv[2:]:
        sf, path = arg.split(":", 1)
        with open(path) as f:
            series.append((float(sf), json.load(f)))
    series.sort(key=lambda p: p[0])
    sfs = [sf for sf, _ in series]

    queries = sorted(
        set.union(*[set(doc["queries"]) for _, doc in series]))
    report = {}
    flagged = []
    flagged_pre = []
    for q in queries:
        pts = [(sf, doc["queries"][q]["min"]) for sf, doc in series
               if q in doc["queries"]]
        if len(pts) < 2:
            continue
        qsfs = [sf for sf, _ in pts]
        mins = [t for _, t in pts]
        pair_slopes = [
            round(math.log(mins[i + 1] / mins[i]) /
                  math.log(qsfs[i + 1] / qsfs[i]), 3)
            for i in range(len(mins) - 1)
        ]
        # least-squares slope over all points
        lx = [math.log(s) for s in qsfs]
        ly = [math.log(t) for t in mins]
        mx, my = sum(lx) / len(lx), sum(ly) / len(ly)
        slope = (sum((x - mx) * (y - my) for x, y in zip(lx, ly)) /
                 sum((x - mx) ** 2 for x in lx))
        bound = DECLARED_BOUNDS.get(q, DEFAULT_BOUND)
        entry = {
            "sec_by_sf": {str(sf): round(t, 4) for sf, t in zip(qsfs, mins)},
            "pair_slopes": pair_slopes,
            "exponent": round(slope, 3),
            "exponent_top": pair_slopes[-1],
            "bound": bound,
        }
        if q not in EXEMPT and pair_slopes[-1] > bound:
            entry["flag"] = "super-linear"
            flagged.append(q)
        # declared-bound queries also get their NON-top decades
        # checked (see PRE_BOUNDS): default-bound queries already had
        # every decade implicitly covered by exponent_top plus the
        # series sweep, but a declared top bound must not grant the
        # pre-saturation decades a free pass.
        pre_bound = PRE_BOUNDS.get(q)
        if (q not in EXEMPT and pre_bound is not None
                and len(pair_slopes) > 1
                and max(pair_slopes[:-1]) > pre_bound):
            entry["pre_bound"] = pre_bound
            entry["flag_pre"] = "super-linear-pre-saturation"
            flagged_pre.append(q)
            # flagged_super_linear stays the UNION (emptiness is the
            # round gate); flagged_super_linear_pre says which check
            # fired for entries that only tripped pre-saturation.
            if q not in flagged:
                flagged.append(q)
        elif pre_bound is not None:
            entry["pre_bound"] = pre_bound
        report[q] = entry

    doc = {
        "series": [
            {"sf": sf, "n": d.get("n"), "cpus": d.get("cpus"),
             "dir": d.get("sf"), "canary": d.get("canary")}
            for sf, d in series
        ],
        "threshold_exponent_top": DEFAULT_BOUND,
        "declared_bounds": DECLARED_BOUNDS,
        "pre_saturation_bounds": PRE_BOUNDS,
        "exempt": EXEMPT,
        "flagged_super_linear": flagged,
        "flagged_super_linear_pre": flagged_pre,
        "queries": report,
    }
    with open(out_path, "w") as f:
        json.dump(doc, f, indent=1, sort_keys=False)
        f.write("\n")
    w = max(len(q) for q in report)
    print(f"{'query'.ljust(w)}  " +
          "  ".join(f"t@{sf}".rjust(8) for sf in sfs) +
          "   slopes        exp_top")
    for q in sorted(report):
        e = report[q]
        times = "  ".join(
            f"{e['sec_by_sf'][str(sf)]:8.3f}" if str(sf) in e["sec_by_sf"]
            else " " * 8 for sf in sfs)
        flag = "  <-- SUPER-LINEAR" if "flag" in e else ""
        print(f"{q.ljust(w)}  {times}   {e['pair_slopes']}"
              f"  {e['exponent_top']:+.3f}{flag}")
    print(f"\nflagged: {flagged or 'none'} -> {out_path}")


if __name__ == "__main__":
    main()
