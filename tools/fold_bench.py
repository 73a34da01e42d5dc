#!/usr/bin/env python3
"""Fold N Bench artifacts into a per-query floor file (min of medians).

The committed BENCH_SELF_r{N}.json is the round's regression baseline;
folding captures taken at different hours keeps one bursty window from
flooring rows above their true cost (VERDICT r15 next #8: 20+ r15 rows
floored above the judge's clean rerun because the capture day was bursty).

Usage: python3 tools/fold_bench.py OUT.json IN1.json IN2.json [...]
Each IN is a Bench artifact (full per-query form). OUT records, per query,
the MIN of the inputs' medians, plus which capture it came from in
"sources" and per-file totals in "capture_totals".
"""
import json
import sys


def main() -> None:
    out_path, *ins = sys.argv[1:]
    if not ins:
        sys.exit("need at least one input artifact")
    arts = []
    for p in ins:
        with open(p) as f:
            arts.append((p, json.load(f)))
    queries: dict[str, float] = {}
    sources: dict[str, str] = {}
    for p, a in arts:
        for q, v in a["queries"].items():
            if q not in queries or v < queries[q]:
                queries[q] = v
                sources[q] = p
    base = arts[0][1]
    out = {
        "metric": "total",
        "value": round(sum(queries.values()), 3),
        "unit": "sec",
        "n": len(queries),
        "reps": f"folded-min of {len(arts)} captures (see capture_totals)",
        "sf": base.get("sf"),
        "cpus": base.get("cpus"),
        "errors": {},
        "capture_totals": {
            p: round(sum(a["queries"].values()), 3) for p, a in arts
        },
        "queries": {q: queries[q] for q in sorted(queries)},
        "sources": {q: sources[q] for q in sorted(sources)},
    }
    with open(out_path, "w") as f:
        json.dump(out, f, indent=None, separators=(",", ":"))
    print(f"{out_path}: {len(queries)} queries, total {out['value']} s "
          f"from {len(arts)} captures")


if __name__ == "__main__":
    main()
