#!/usr/bin/env python3
"""Combine N full-bench recordings into the round-close headline
(round-11 verdict item 5): the same-code noise band across whole runs
(+-8% on this host) is larger than most real per-round deltas, so the
stable round-over-round figure is the SUM OF PER-ENTRY MEDIANS across
the runs, not the median of run totals. Emits both, plus the raw run
totals, and the per-entry median map for BASELINE.md.

Usage: bench_median.py run1.json run2.json [run3.json ...]
"""
import json, sys
from statistics import median

runs = [json.load(open(p)) for p in sys.argv[1:]]
if len(runs) < 2:
    sys.exit("need >= 2 bench recordings")
names = set(runs[0]["queries"])
for r in runs[1:]:
    if set(r["queries"]) != names:
        sys.exit("runs cover different query sets: "
                 f"{sorted(names ^ set(r['queries']))[:5]}")
bad = sorted(n for n in names
             if any(r["queries"][n] < 0 for r in runs))
if bad:
    sys.exit(f"failed queries present: {bad[:5]}")
med = {n: round(median(r["queries"][n] for r in runs), 3)
       for n in sorted(names)}
totals = [round(sum(r["queries"].values()), 1) for r in runs]
out = {
    "metric": "sum_of_medians",
    "value": round(sum(med.values()), 1),
    "unit": "sec",
    "n_queries": len(med),
    "n_runs": len(runs),
    "raw_run_totals": totals,
    "queries_median": med,
}
print(json.dumps(out))
