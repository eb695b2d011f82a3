#!/usr/bin/env python3
"""Scale-gate orchestrator: the scripted form of the round-11 manual loop.

Runs the driver-style correctness gate over a Verify dump at 10x/100x
staging, ONE ORACLE PER SUBPROCESS (round-9 lesson: a blown-up oracle
poisons a shared DuckDB buffer manager), N processes in parallel, and
merges the per-query artifacts taking each part's OWN query only
(round-11 caution: `--only` runs still emit no_oracle rows for every
other present output).

Round-13 widening: queries whose Spark output exceeds --agg-threshold rows
(the prior gate's blanket exclusion — 36 queries at 100x) are gated in
selfcheck's --agg mode (count + per-column decimal sums) instead of being
skipped, so every registered query gets an artifact row: pass / agg_pass /
fail / oracle_timeout / oracle_oom.

Usage:
  python3 tools/scale_gate.py <sfDir> <verifyOutDir> --json OUT.json \
      [--shards 4] [--timeout-sec 600] [--agg-threshold 200000] \
      [--unordered] [--exclude q1,q2] [--mem 24GB]
"""
import argparse
import concurrent.futures as cf
import json
import os
import pathlib
import subprocess
import sys
import time

HERE = pathlib.Path(__file__).resolve().parent


def spark_rows(verify_dir, name):
    """Row count from parquet footers only — no data read."""
    import pyarrow.parquet as pq
    import glob as g
    return sum(pq.ParquetFile(f).metadata.num_rows
               for f in g.glob(f"{verify_dir}/{name}/*.parquet"))


def run_once(sf_dir, verify_dir, name, mode, timeout_sec, unordered, mem):
    part = f"{verify_dir}/.gate_{name}.json"
    cmd = [sys.executable, str(HERE / "selfcheck.py"), sf_dir, verify_dir,
           "--only", name, "--json", part, "--timeout-sec", str(timeout_sec)]
    if mode == "agg":
        cmd.append("--agg")
    elif unordered:
        cmd.append("--unordered")
    env = dict(os.environ, SELFCHECK_MEM=mem)
    # hard wall: timeout-sec bounds the ORACLE; give the process itself
    # 3x for parquet IO + interpreter startup, then declare it wedged
    try:
        p = subprocess.run(cmd, capture_output=True, text=True, env=env,
                           timeout=3 * timeout_sec + 120)
    except subprocess.TimeoutExpired:
        return {"status": "gate_wedged", "rows": None,
                "detail": f"subprocess exceeded {3 * timeout_sec + 120}s"}
    try:
        rec = json.load(open(part))["queries"][name]
    except Exception as e:
        rec = {"status": "gate_error", "rows": None,
               "detail": f"rc={p.returncode} {e}; tail={p.stdout[-300:]!r}"}
    finally:
        try:
            os.remove(part)
        except OSError:
            pass
    return rec


# statuses that mean "the FULL compare was intractable here", after which the
# agg fallback still extracts a verdict (round-16 VERDICT #3) — a plain fail
# is a genuine mismatch and must NOT be retried away
INTRACTABLE = ("oracle_timeout", "oracle_oom", "gate_wedged", "gate_error")


def run_one(sf_dir, verify_dir, name, mode, timeout_sec, unordered, mem):
    t0 = time.time()
    if mode == "full_then_agg":
        rec = run_once(sf_dir, verify_dir, name, "full", timeout_sec,
                       unordered, mem)
        if rec["status"] in INTRACTABLE:
            first = rec["status"]
            rec = run_once(sf_dir, verify_dir, name, "agg", timeout_sec,
                           unordered, mem)
            rec["fallback_from"] = first
    else:
        rec = run_once(sf_dir, verify_dir, name, mode, timeout_sec,
                       unordered, mem)
    return name, rec, time.time() - t0


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("sf_dir")
    ap.add_argument("verify_dir")
    ap.add_argument("--json", required=True)
    ap.add_argument("--shards", type=int, default=4)
    ap.add_argument("--timeout-sec", type=float, default=600)
    ap.add_argument("--agg-threshold", type=int, default=200_000)
    ap.add_argument("--full-first-threshold", type=int, default=5_000_000,
                    help="rows up to which the full (hash) compare is tried "
                         "FIRST, falling back to --agg only if the oracle "
                         "times out / OOMs (round-16 VERDICT #3); above "
                         "this, straight to agg")
    ap.add_argument("--unordered", action="store_true")
    ap.add_argument("--exclude", default="",
                    help="comma-separated: skip entirely, recorded as excluded_manual")
    ap.add_argument("--mem", default="24GB",
                    help="per-process DuckDB memory_limit (shards run concurrently)")
    args = ap.parse_args()

    oracle = json.load(open(f"{args.verify_dir}/oracle_sql.json"))
    exclude = set(filter(None, args.exclude.split(",")))
    report, order = {}, []
    for name in sorted(oracle):
        if name in exclude:
            report[name] = {"status": "excluded_manual", "rows": None}
            continue
        rows = spark_rows(args.verify_dir, name)
        if rows <= args.agg_threshold:
            mode = "full"
        elif rows <= args.full_first_threshold:
            mode = "full_then_agg"
        else:
            mode = "agg"
        order.append((rows, name, mode))
    # largest first: the slow tail starts immediately, shards stay busy
    order.sort(reverse=True)
    n_by = {m: sum(1 for r in order if r[2] == m)
            for m in ("full", "full_then_agg", "agg")}
    print(f"{len(order)} queries (modes {n_by}, agg threshold "
          f"{args.agg_threshold}, full-first to {args.full_first_threshold}), "
          f"{args.shards} shards, oracle budget {args.timeout_sec:.0f}s, "
          f"mem {args.mem}")

    t0 = time.time()
    with cf.ThreadPoolExecutor(max_workers=args.shards) as ex:
        futs = {ex.submit(run_one, args.sf_dir, args.verify_dir, name, mode,
                          args.timeout_sec, args.unordered, args.mem): (name, mode)
                for rows, name, mode in order}
        for fut in cf.as_completed(futs):
            name, rec, sec = fut.result()
            report[name] = rec
            print(f"  [{time.time() - t0:7.1f}s] {rec['status']:>14} {name} ({sec:.0f}s)")

    # queries registered but without oracle SQL (rows-only)
    for d in sorted(os.listdir(args.verify_dir)):
        p = f"{args.verify_dir}/{d}"
        if d not in report and os.path.isdir(p) and d not in oracle:
            report[d] = {"status": "no_oracle", "rows": spark_rows(args.verify_dir, d)}

    counts = {}
    for rec in report.values():
        counts[rec["status"]] = counts.get(rec["status"], 0) + 1
    summary = {"mode": "agg-widened " + ("unordered" if args.unordered else "ordered"),
               "sf_dir": args.sf_dir, "verify_dir": args.verify_dir,
               "agg_threshold": args.agg_threshold,
               "timeout_sec": args.timeout_sec,
               "counts": counts, "queries": report}
    with open(args.json, "w") as f:
        json.dump(summary, f, indent=1)
    print(f"\n{json.dumps(counts)}  -> {args.json}")
    sys.exit(1 if counts.get("fail") or counts.get("gate_error")
             or counts.get("gate_wedged") else 0)


if __name__ == "__main__":
    main()
