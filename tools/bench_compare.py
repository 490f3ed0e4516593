#!/usr/bin/env python3
"""Compare two bench.json artifacts honestly (dev/judge tool).

Host epochs drift 1.1-1.5x on identical code (SURVEY §8), so raw totals
across runs mislead. This tool reports:
  - per-query ratios over the common query set (median = the host-drift
    estimate; a UNIFORM median ≈ host, scattered outliers ≈ plans),
  - the calibration-anchor ratio (fixed-plan cpu/shuffle/scan probes,
    present since round 9) as an independent drift estimate,
  - the new run's total NORMALIZED by the calibration ratio, i.e. what
    the total would read on the old run's host.

Usage: python3 tools/bench_compare.py <old_bench.json> <new_bench.json>
"""
import json
import re
import statistics
import sys


def load(path):
    """Accept either a raw Bench artifact or the driver's wrapper
    (BENCH_r*.json: our JSON line inside a possibly-FRONT-TRUNCATED
    'tail' string). Falls back to regex-scraping "q_*":sec pairs, which
    survives truncation (partial query set, missing total)."""
    with open(path) as f:
        d = json.load(f)
    if "queries" in d:
        return d
    if isinstance(d.get("parsed"), dict) and "queries" in d["parsed"]:
        return d["parsed"]
    tail = d.get("tail", "")
    m = re.search(r'\{"metric".*?\}\s*$', tail, re.S)
    if m:
        try:
            return json.loads(m.group(0))
        except json.JSONDecodeError:
            pass
    qs = {k: float(v) for k, v in re.findall(r'"(q_\w+)":(-?[0-9.]+)', tail)}
    cal = {k: [float(a), float(b)] for k, a, b in re.findall(
        r'"(cal_\w+)":\[([0-9.]+),([0-9.]+)\]', tail)}
    out = {"queries": qs, "value": sum(v for v in qs.values() if v > 0)}
    if cal:
        out["calibration"] = cal
    print(f"note: {path} scraped from a (possibly truncated) driver tail — "
          f"{len(qs)} queries recovered, total recomputed from them")
    return out


def main(old_path, new_path):
    old, new = load(old_path), load(new_path)
    oq = {k: v for k, v in old["queries"].items() if v > 0}
    nq = {k: v for k, v in new["queries"].items() if v > 0}
    common = sorted(set(oq) & set(nq))
    if not common:
        print("no common queries")
        return 1
    ratios = {k: nq[k] / oq[k] for k in common}
    med = statistics.median(ratios.values())
    print(f"common queries: {len(common)}  "
          f"(old-only {len(set(oq)-set(nq))}, new-only {len(set(nq)-set(oq))})")
    print(f"old sum (common): {sum(oq[k] for k in common):8.1f}s   "
          f"new sum (common): {sum(nq[k] for k in common):8.1f}s")
    if len(ratios) >= 2:
        qs = statistics.quantiles(list(ratios.values()), n=4)
        print(f"per-query ratio median: {med:.3f}  "
              f"(p25 {qs[0]:.3f}, p75 {qs[2]:.3f})")
    else:
        print(f"per-query ratio (single common query): {med:.3f}")

    cal_ratio = None
    if "calibration" in old and "calibration" in new:
        pairs = []
        for k in set(old["calibration"]) & set(new["calibration"]):
            o = min(old["calibration"][k])
            n = min(new["calibration"][k])
            if o > 0:
                pairs.append(n / o)
        if pairs:
            cal_ratio = statistics.median(pairs)
            print(f"calibration-anchor ratio (new/old host): {cal_ratio:.3f}")
            print(f"new total {new['value']:.1f}s -> "
                  f"{new['value'] / cal_ratio:.1f}s normalized to the old host")
    else:
        print("calibration block missing in one artifact (pre-round-9) — "
              "falling back to the per-query median as the drift estimate")
        if ("calibration" in old) != ("calibration" in new):
            print("CAVEAT: the calibration block arrived in round 9 TOGETHER "
                  "with the switch from count()-forcing to the noop sink; "
                  "count()-forced artifacts let Catalyst prune measure "
                  "columns, under-measuring projection-heavy queries 10-40x "
                  "on identical plans (SURVEY §8). Per-query numbers across "
                  "this boundary compare MEASUREMENT REGIMES, not plans — "
                  "treat any 'regression' against the pre-r9 side as "
                  "unattributed until re-measured under noop forcing.")
        print(f"new total {new['value']:.1f}s -> "
              f"{new['value'] / med:.1f}s normalized by the common-query median")

    # outliers AFTER removing the host factor: the real plan deltas
    norm = cal_ratio if cal_ratio else med
    flagged = [(k, ratios[k] / norm, oq[k], nq[k]) for k in common
               if ratios[k] / norm > 1.5 and nq[k] > 0.4]
    if flagged:
        print("\nhost-normalized regressions >1.5x (investigate these):")
        for k, r, o, n in sorted(flagged, key=lambda x: -x[1]):
            print(f"  {k:26s} {o:6.2f}s -> {n:6.2f}s   ({r:.2f}x normalized)")
    else:
        print("\nno host-normalized per-query regression > 1.5x")
    return 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
