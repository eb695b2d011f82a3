#!/usr/bin/env python3
"""Compare two bench.json artifacts the way the protocol intends.

Usage: python3 tools/bench_diff.py BASE.json NEW.json [--threshold 2.0]

Round-4 ADVICE #5: a query retired after 1 of N passes contributes a
1-sample "median" to the headline total, silently changing the total's
statistical meaning between runs. This tool:

  - ratios per-query MEDIANS only for queries with FULL pass counts in
    both runs (short-sampled / flaky queries are listed, not ratioed);
  - normalizes by the CANARY ratio (machine state moves every query
    uniformly; plans move queries individually);
  - carries each run's own stall adjudication: a >threshold entry whose
    NEW run shows stalled>0 is labeled rescued-stall, one in
    slow_confirmed is labeled confirmed — anything else is a candidate
    regression.

Exit code 1 iff any canary-normalized candidate regression exceeds the
threshold.
"""
import json
import statistics
import sys


def load(path):
    with open(path) as f:
        d = json.load(f)
    # driver BENCH_r{N}.json artifacts wrap the bench line under "parsed"
    if "queries" not in d and isinstance(d.get("parsed"), dict):
        d = d["parsed"]
    if "queries" not in d:
        sys.exit(f"{path}: no 'queries' map (a driver artifact whose 'parsed' "
                 "is null carries only a truncated 'tail' — use the in-repo "
                 "bench.json / bench_rN_local.json runs instead)")
    return d


def canary_level(d):
    # median of measured-pass canary samples; supports both the round-4
    # flat list and the round-5 per-pass-arrays shape. Skip the warm-up
    # pass (index 0) — it carries session-init cost.
    c = d.get("canary", [])
    if c and isinstance(c[0], list):
        samples = [x for p in c[1:] for x in p]
    else:
        samples = c[1:]
    return statistics.median(samples) if samples else None


def main():
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    thr = 2.0
    for a in sys.argv[1:]:
        if a.startswith("--threshold"):
            thr = float(a.split("=", 1)[1]) if "=" in a else thr
    base, new = load(args[0]), load(args[1])

    passes_b = base.get("n_passes", {})
    passes_n = new.get("n_passes", {})
    full_b = base.get("passes")
    full_n = new.get("passes")
    stalled = new.get("stalled", {})
    slow = set(new.get("slow_confirmed", []))

    cb, cn = canary_level(base), canary_level(new)
    machine = (cn / cb) if (cb and cn) else 1.0
    print(f"canary: base={cb} new={cn} machine-ratio={machine:.2f} "
          f"(ratios below are canary-normalized)")

    common = sorted(set(base["queries"]) & set(new["queries"]))
    short = [q for q in common
             if passes_b.get(q, full_b) != full_b or passes_n.get(q, full_n) != full_n]
    if short:
        print(f"excluded (short-sampled in either run): {short}")

    regressions = []
    for q in common:
        if q in short:
            continue
        r = new["queries"][q] / base["queries"][q] / machine
        if r > thr:
            tag = ("rescued-stall" if stalled.get(q, 0) > 0 else
                   "confirmed-slow" if q in slow else "REGRESSION?")
            regressions.append((q, r, tag))
    # Totals over the COMMON, fully-sampled subset ONLY (round-7 VERDICT
    # "What's wrong" #1: summing each artifact's own full map next to
    # "over N queries" read as a 1.69x regression when the true common-set
    # ratio was 0.91 — queries present in only one run must not enter the
    # comparable-totals line).
    comparable = [q for q in common if q not in short]
    total_b = sum(base["queries"][q] for q in comparable)
    total_n = sum(new["queries"][q] for q in comparable)
    print(f"comparable totals: base={total_b:.2f}s new={total_n:.2f}s "
          f"raw-ratio={total_n / total_b:.2f} canary-normalized={total_n / total_b / machine:.2f} "
          f"over {len(comparable)} queries")
    for q, r, tag in sorted(regressions, key=lambda t: -t[1]):
        print(f"  {q}: {r:.2f}x [{tag}] base={base['queries'][q]} new={new['queries'][q]} "
              f"stalled={stalled.get(q, 0)} best={new.get('best', {}).get(q)}")
    hard = [t for t in regressions if t[2] == "REGRESSION?"]
    if not regressions:
        print(f"no query exceeds {thr}x (canary-normalized)")
    sys.exit(1 if hard else 0)


if __name__ == "__main__":
    main()
