#!/usr/bin/env python3
"""Common-set comparison of two BENCH_DETAIL-style name->seconds maps.

Usage: python3 tools/bench_diff.py OLD.json NEW.json [topN]

Prints the common-query totals, the per-query ratio distribution, and
the largest regressions/improvements — the round-over-round signal the
driver's truncated stdout line cannot carry.
"""
import json
import sys

old = json.load(open(sys.argv[1]))
new = json.load(open(sys.argv[2]))
top_n = int(sys.argv[3]) if len(sys.argv) > 3 else 10

common = sorted(k for k in old if k in new
                and old[k] is not None and new[k] is not None)
t_old = sum(old[k] for k in common)
t_new = sum(new[k] for k in common)
print(f"common queries: {len(common)}")
print(f"common-set total: {t_old:.1f}s -> {t_new:.1f}s "
      f"({t_new / t_old - 1:+.1%} vs old)" if t_old else "n/a")
only_old = sorted(k for k in old if k not in new)
only_new = sorted(k for k in new if k not in old)
if only_new:
    extra = sum(new[k] for k in only_new if new[k] is not None)
    print(f"new-only: {len(only_new)} queries, {extra:.1f}s")
if only_old:
    print(f"dropped: {only_old}")

diffs = sorted(common, key=lambda k: new[k] - old[k])
print(f"\nlargest regressions (new - old, top {top_n}):")
for k in reversed(diffs[-top_n:]):
    print(f"  {k}: {old[k]:.2f} -> {new[k]:.2f} ({new[k] - old[k]:+.2f}s)")
print(f"\nlargest improvements (top {top_n}):")
for k in diffs[:top_n]:
    print(f"  {k}: {old[k]:.2f} -> {new[k]:.2f} ({new[k] - old[k]:+.2f}s)")
