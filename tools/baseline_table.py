#!/usr/bin/env python3
"""Render the BASELINE.md operative per-query table from a Bench artifact.

Usage: python3 tools/baseline_table.py bench.json > table.md
Emits the `| query | sec (median of N) | spread | shuffle write MB |` rows
sorted by query name — derived from the artifact, never typed (the same
anti-drift discipline as tools/stamp_counts.py).
"""
import json
import sys

d = json.load(open(sys.argv[1]))
n = d.get("passes", "?")
print(f"| query | sec (median of {n}) | spread | shuffle write MB |")
print("|---|---|---|---|")
for q in sorted(d["queries"]):
    sec = d["queries"][q]
    sp = d.get("spread", {}).get(q, 0.0)
    sw = d.get("shuffle_write_mb", {}).get(q, 0.0)
    print(f"| {q} | {sec:.2f} | {sp:.2f} | {sw:.1f} |")
