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

Usage: python3 tools/bench_compare.py <old> <new>
  where each side is a bench.json / BENCH_r*.json path, or a git spec
  "rev:path" (e.g. HEAD~3:bench.json) read via `git show`.

A BENCH_r{N}.json argument automatically prefers the FULL bench.json
committed by that round's driver commit ("round N: ..."), because the
driver wrapper front-truncates its 'tail' and recovers only a fraction
of the query set (round 12; the r11 judge had to diff 265 queries by
hand). The truncated-tail scrape remains the fallback.
"""
import json
import os
import re
import statistics
import subprocess
import sys


def git_show(repo_dir, spec):
    """Return the parsed JSON blob at a git `rev:path` spec, or None."""
    try:
        out = subprocess.run(["git", "-C", repo_dir or ".", "show", spec],
                             capture_output=True, text=True, timeout=30)
        if out.returncode == 0 and out.stdout.strip():
            return json.loads(out.stdout)
    except Exception:
        pass
    return None


def round_artifact(repo_dir, n):
    """The full bench.json committed by the driver's "round N:" commit —
    but ONLY if that commit actually changed bench.json (round-12
    review: a round commit that didn't refresh it would otherwise
    silently serve a stale prior-round artifact)."""
    try:
        out = subprocess.run(["git", "-C", repo_dir or ".", "log",
                              "--format=%H %s"],
                             capture_output=True, text=True, timeout=30)
        if out.returncode != 0:
            return None
        for line in out.stdout.splitlines():
            h, _, subj = line.partition(" ")
            if subj.startswith(f"round {n}:"):
                chg = subprocess.run(
                    ["git", "-C", repo_dir or ".", "show", "--name-only",
                     "--format=", h],
                    capture_output=True, text=True, timeout=30)
                if chg.returncode != 0 or \
                        "bench.json" not in chg.stdout.split():
                    print(f"note: the round-{n} commit did not change "
                          "bench.json — falling back to the wrapper tail")
                    return None
                return git_show(repo_dir, f"{h}:bench.json")
    except Exception:
        pass
    return None


def load(path):
    """Accept a raw Bench artifact, the driver's wrapper (BENCH_r*.json:
    our JSON line inside a possibly-FRONT-TRUNCATED 'tail' string), or a
    git "rev:path" spec (either artifact flavor). BENCH_r{N}.json
    prefers the round-N commit's full bench.json; the tail scrape
    (which survives truncation with a partial query set) is the
    fallback."""
    if not os.path.exists(path) and re.match(r"^[^:]+:.+", path):
        repo = os.path.dirname(path.split(":", 1)[1]) or "."
        d = git_show(".", path) or git_show(repo, path)
        if d is None:
            sys.exit(f"cannot read git spec {path}")
        print(f"note: {path} read via git show")
        # fall through to the same wrapper unwrapping as file paths (a
        # rev:BENCH_rN.json spec is a wrapper, not a raw artifact)
    else:
        m = re.search(r"BENCH_r0*(\d+)\.json$", path)
        if m:
            full = round_artifact(os.path.dirname(path), int(m.group(1)))
            if full is not None and "queries" in full:
                print(f"note: {path} -> full bench.json from the round-"
                      f"{int(m.group(1))} commit ({len(full['queries'])} "
                      "queries; the wrapper tail is truncated)")
                return full
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
    # Round-11 artifacts carry three q_* sections (queries/pass1/pass2):
    # a flat scrape would keep the LAST match per key — pass-2 timings
    # instead of the min, and a -1 failure in "queries" silently
    # resurrected by a valid pass-2 number. When both pass sections
    # survived the (front-)truncation, reconstruct the minima from them
    # (complete, since they sit at the END of the line); otherwise fall
    # back to the flat scrape, which is correct for pre-r11 single-
    # section artifacts.
    def section(name):
        m = re.search('"' + name + r'":\{(.*?)\}', tail, re.S)
        if not m:
            return None
        return {k: float(v) for k, v in re.findall(
            r'"(q_\w+)":(-?[0-9.]+(?:[eE][-+]?[0-9]+)?)', m.group(1))}
    p1, p2 = section("pass1"), section("pass2")
    p3 = section("pass3") or {}
    if p1 is not None and p2 is not None:
        # round 16 (ADVICE r15 #1): fold the targeted third pass into the
        # min reconstruction — a rescued row's reported min can come from
        # pass3, and a pass1/pass2-only rebuild would diverge from the
        # artifact's own queries section for exactly those rows
        def min3(k):
            cands = [p1[k], p2[k]] + \
                ([p3[k]] if k in p3 and p3[k] > 0 else [])
            return min(c for c in cands if c > 0)
        qs = {k: (-1.0 if p1[k] < 0 or p2[k] < 0 else min3(k))
              for k in set(p1) & set(p2)}
    elif p2 is not None or p1 is not None:
        # only one pass section survived the truncation: its timings are
        # internally consistent single-pass numbers (-1 semantics intact),
        # unlike a flat scrape that would mix sections per key
        qs = dict(p2 if p2 is not None else p1)
        print(f"note: {path} kept only one complete pass section — "
              f"single-pass timings, not min-of-passes")
        p1 = p2 = None
    else:
        qs = {k: float(v) for k, v in re.findall(
            r'"(q_\w+)":(-?[0-9.]+(?:[eE][-+]?[0-9]+)?)', tail)}
    cal = {k: [float(x) for x in vs.split(",")] for k, vs in re.findall(
        r'"(cal_\w+)":\[([0-9.eE+,\-]+)\]', tail)}
    out = {"queries": qs, "value": sum(v for v in qs.values() if v > 0)}
    if p1 is not None:
        out["pass1"], out["pass2"] = p1, p2
    if cal:
        out["calibration"] = cal
    un = re.search(r'"unstable":\[([^\]]*)\]', tail)
    if un:
        out["unstable"] = re.findall(r'"(q_\w+)"', un.group(1))
    # round 13: "deviant" sits at the FRONT of the line (truncated first),
    # so if it survived, the by-name parse is safe; the flat q_* fallback
    # above can never see it (it only runs when even pass1/pass2 — which
    # sit later in the line — are gone)
    dv = re.search(r'"deviant":\{([^}]*)\}', tail)
    if dv:
        out["deviant"] = {k: float(v) for k, v in re.findall(
            r'"(q_\w+)":([0-9.]+)', dv.group(1))}
    fx = re.search(r'"fixture":\{([^}]*)\}', tail)
    if fx:
        out["fixture"] = {k: int(v) for k, v in re.findall(
            r'"(\w+)":([0-9]+)', fx.group(1))}
    fc = re.search(r'"fixture_changed":(true|false|null)', tail)
    if fc and fc.group(1) != "null":
        out["fixture_changed"] = fc.group(1) == "true"
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
    # round 14: artifacts self-report a normalized headline (raw `value`
    # re-expressed in THEIR OWN reference artifact's host timescale) —
    # print both so a turbulent epoch is readable at a glance without
    # this tool recomputing it. Round 15 (VERDICT r14 #1): the headline
    # is the POPULATION estimator (median per-query ratio vs the
    # reference, unstable rows excluded); the anchor-bridge estimate is
    # carried alongside as normalized_total_anchor, and
    # norm_disagreement=true marks epochs where the two diverge >10%
    # (trust neither alone there — read the deviant section).
    # NOTE (ADVICE r14): normalized_total sums only SUCCEEDED queries,
    # while raw `value` sums failed ones as -1.0 — on an erroring epoch
    # the two fields cover different populations by design (errors are
    # named in `errors` and poison `value` loudly).
    for label, art in (("old", old), ("new", new)):
        norm = art.get("normalized_total")
        anchor = art.get("normalized_total_anchor")
        pop = art.get("normalized_total_population")
        if norm is not None and norm > 0:
            extra = (f", anchor-bridge {anchor:.1f}s"
                     if isinstance(anchor, (int, float)) and anchor > 0
                     else "")
            flag = " [ESTIMATORS DISAGREE >10%]" \
                if art.get("norm_disagreement") else ""
            print(f"{label} headline: raw {art['value']:.1f}s, "
                  f"self-normalized {norm:.1f}s (vs its own reference)"
                  f"{extra}{flag}")
        elif art.get("norm_disagreement") and \
                isinstance(anchor, (int, float)) and \
                isinstance(pop, (int, float)):
            # round 16 (ADVICE r15 #2): the artifact WITHHOLDS the
            # headline when its two estimators diverge >10% — print both
            # so the reader judges, instead of trusting either alone
            print(f"{label} headline WITHHELD (estimators disagree >10%): "
                  f"raw {art['value']:.1f}s, anchor-bridge {anchor:.1f}s, "
                  f"population {pop:.1f}s — read the deviant section")
        # round 15 (VERDICT r14 #6): the artifact attributes the
        # streaming per-query init floor explicitly — stream_floor is
        # the trivial fresh-checkpoint drain (cal_stream min), a LOWER
        # BOUND on each q_stream_* row's init overhead (stateful
        # flavors pay RocksDB init on top); stream_floor_total is the
        # part of the raw streaming subtotal safely attributable to
        # init rather than plan work
        floor_total = art.get("stream_floor_total")
        if isinstance(floor_total, (int, float)) and floor_total > 0:
            print(f"{label} streaming floor: "
                  f"{art.get('stream_floor', -1):.2f}s trivial-drain init x "
                  f"{art.get('stream_query_count', 0)} stream queries "
                  f"= >={floor_total:.1f}s of the raw total is init, not work")
        # round 16 (VERDICT r15 #5): the stateful anchor bounds the
        # RocksDB flavors' EXTRA init above the trivial drain — additive
        # to stream_floor_total, never over-subtracting (clamped at 0)
        st_extra = art.get("stream_stateful_extra_total")
        if isinstance(st_extra, (int, float)) and st_extra >= 0 and \
                art.get("stream_stateful_query_count", 0) > 0:
            print(f"{label} stateful-stream extra: "
                  f"{art.get('stream_stateful_floor', -1):.2f}s RocksDB "
                  f"no-op drain x {art.get('stream_stateful_query_count', 0)} "
                  f"stateful queries = >={st_extra:.1f}s further init "
                  f"beyond the trivial floor")
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
            o = min([x for x in old["calibration"][k] if x > 0], default=0)
            n = min([x for x in new["calibration"][k] if x > 0], default=0)
            if o > 0 and n > 0:
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

    # outliers AFTER removing the host factor: the real plan deltas.
    # Round 11: when both artifacts carry per-pass timings (pass1/pass2)
    # and 3-element anchor arrays ([before, mid, after]), each query is
    # normalized by the anchor bracket of the PASS that produced its min
    # — single-query flags are then attributed by the tool even when the
    # host drifted WITHIN a run (the r10 q_bloom_fpr case, argued by
    # hand because only run-level anchors existed).
    norm = cal_ratio if cal_ratio else med
    ob, nb = pass_brackets(old), pass_brackets(new)
    per_pass = ob is not None and nb is not None
    if per_pass:
        print("per-pass anchors present in both artifacts: flags below use "
              "the anchor bracket of each query's min pass")

    def norm_for(k):
        if per_pass:
            po, pn = pass_of(old, k), pass_of(new, k)
            if po and pn:
                rs = [nb[pn][a] / ob[po][a]
                      for a in set(ob[po]) & set(nb[pn])
                      if ob[po][a] and nb[pn][a] and ob[po][a] > 0]
                if rs:
                    return statistics.median(rs)
        return norm

    # round 12: the artifact names its own unreliably-measured queries
    # (pass disagreement >2x) — a "regression" on one of those is a
    # measurement artifact until re-run, so it is reported separately,
    # not as a plan delta
    # round 13: the artifact also self-flags ANCHOR-RELATIVE deviation vs
    # its pre-run reference artifact ("deviant": query -> min / (ref_min
    # x cal ratio)) — the correlated-noise catcher pass-disagreement
    # can't be. Surface it, and treat deviant queries like unstable ones
    # in the regression report (measurement artifact until re-run —
    # unless the code actually changed, which the committer knows).
    for label, art in (("old", old), ("new", new)):
        dev = art.get("deviant")
        if dev:
            print(f"\n{label} artifact self-flagged anchor-relative deviation "
                  "(min vs ref_min x cal ratio):")
            for k, r in sorted(dev.items(), key=lambda x: -x[1]):
                print(f"  {k:26s} {r:.2f}x off its own prediction")
    # round 13: fixture fingerprints — a regenerated corpus shifts
    # per-query costs with no code change, so flag cross-fixture compares
    of, nf = old.get("fixture"), new.get("fixture")
    if of and nf and of != nf:
        diff = sorted(k for k in set(of) | set(nf) if of.get(k) != nf.get(k))
        print(f"\nWARNING: the two artifacts measured DIFFERENT fixture bytes "
              f"({', '.join(diff)}) — per-query deltas include fixture drift, "
              "not just code/host")
    for label, art in (("old", old), ("new", new)):
        if art.get("fixture_changed") is True:
            print(f"note: {label} artifact self-reports its reference was a "
                  "different fixture (its deviant flags include fixture drift)")
    unstable = set(old.get("unstable", [])) | set(new.get("unstable", []))
    unstable |= set(old.get("deviant", {})) | set(new.get("deviant", {}))
    # round 15: a query counts as a regression only if BOTH estimators
    # agree — the anchor bracket of its min pass AND the per-query
    # population median. The anchor bridge alone mis-reads turbulent
    # epochs (r14: anchors 1.36x vs population 1.03x) and then flags
    # sub-second noise as 1.8x "regressions" on identical code; a real
    # plan delta moves one query against BOTH yardsticks, since a single
    # query can't move the population median.
    # round 16 (ADVICE r15 #3): the population yardstick excludes
    # self-flagged unstable/deviant rows (they are measurement noise by
    # the artifacts' own account) and is only TRUSTED when enough clean
    # rows back it — on a small-subset compare (e.g. two BenchOne runs)
    # every ratio ≈ the median including the regressed query itself, so
    # the population gate can never fire; fall back to the anchor-only
    # gate there, with a printed caveat.
    clean_ratios = [v for k, v in ratios.items() if k not in unstable]
    med_clean = statistics.median(clean_ratios) if clean_ratios else med
    MIN_POPULATION = 5
    pop_gate = len(clean_ratios) >= MIN_POPULATION
    if not pop_gate:
        print(f"\nCAVEAT: only {len(clean_ratios)} clean common queries — "
              "too few for a population yardstick; the regression gate "
              "below is ANCHOR-ONLY (expect more noise flags)")
    flagged = [(k, ratios[k] / norm_for(k), oq[k], nq[k]) for k in common]
    flagged = [f for f in flagged
               if f[1] > 1.5 and f[3] > 0.4 and
               (not pop_gate or ratios[f[0]] / med_clean > 1.5)]
    solid = [f for f in flagged if f[0] not in unstable]
    shaky = [f for f in flagged if f[0] in unstable]
    gate_desc = ("BOTH the anchor and population estimators" if pop_gate
                 else "the anchor estimator (population gate skipped)")
    if solid:
        print(f"\nhost-normalized regressions >1.5x by {gate_desc} "
              "(investigate these):")
        for k, r, o, n in sorted(solid, key=lambda x: -x[1]):
            print(f"  {k:26s} {o:6.2f}s -> {n:6.2f}s   ({r:.2f}x anchor-normalized, "
                  f"{ratios[k] / med_clean:.2f}x population-normalized)")
    else:
        print(f"\nno per-query regression > 1.5x by {gate_desc} "
              "(outside self-flagged unstable queries)")
    if shaky:
        print("flagged but SELF-REPORTED UNSTABLE/DEVIANT in one artifact "
              "(pass disagreement or anchor-relative deviation >2x — "
              "re-measure before believing):")
        for k, r, o, n in sorted(shaky, key=lambda x: -x[1]):
            print(f"  {k:26s} {o:6.2f}s -> {n:6.2f}s   ({r:.2f}x normalized)")
    return 0


def pass_brackets(art):
    """Per-pass anchor levels from a 3-element calibration block:
    pass 1 is bracketed by [before, mid], pass 2 by [mid, after].
    Returns {1: {anchor: level}, 2: {anchor: level}} or None when the
    artifact predates per-pass anchors (2-element arrays / no pass1)."""
    cal = art.get("calibration")
    if not cal or "pass1" not in art or "pass2" not in art:
        return None
    if any(len(v) != 3 for v in cal.values()):
        return None

    def lvl(a, b):
        vals = [x for x in (a, b) if x > 0]
        return sum(vals) / len(vals) if vals else None

    return {1: {k: lvl(v[0], v[1]) for k, v in cal.items()},
            2: {k: lvl(v[1], v[2]) for k, v in cal.items()}}


def pass_of(art, k):
    """Which pass produced this query's reported min (1 or 2), or None.

    None also when the reported min came from the targeted THIRD pass
    (round 16, ADVICE r15 #1): pass3 runs after calAfter, outside any
    anchor bracket, so a rescued row has no per-pass anchor level — the
    caller falls back to the run-level norm for it."""
    p1, p2 = art.get("pass1", {}).get(k), art.get("pass2", {}).get(k)
    if p1 is None or p2 is None:
        return None
    q = art.get("queries", {}).get(k)
    valid12 = [p for p in (p1, p2) if p > 0]
    if q is not None and valid12 and q > 0 and q < min(valid12) - 1e-9:
        return None  # min rescued by pass3 — no bracket applies
    if p1 < 0:
        return 2
    if p2 < 0:
        return 1
    return 1 if p1 <= p2 else 2


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
