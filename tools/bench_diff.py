#!/usr/bin/env python3
"""Diff two bench artifacts (BENCH_FULL.json / BENCH_HISTORY.jsonl
lines) per query: prints added/removed queries and the largest
regressions/improvements, using each artifact's isolated readings
where present (they supersede contaminated interleaved medians).

Usage: python3 tools/bench_diff.py OLD.json NEW.json [topN]
Each file may be a one-line JSON artifact or a JSONL history (the
LAST line is used).
"""
import json, sys

def load(path):
    with open(path) as f:
        lines = [l for l in f.read().splitlines() if l.strip()]
    d = json.loads(lines[-1])
    q = dict(d.get("queries", {}))
    q.update(d.get("isolated", {}))  # isolated readings win
    return d, q

old_d, old_q = load(sys.argv[1])
new_d, new_q = load(sys.argv[2])
top = int(sys.argv[3]) if len(sys.argv) > 3 else 15

added = sorted(set(new_q) - set(old_q))
removed = sorted(set(old_q) - set(new_q))
shared = sorted(set(new_q) & set(old_q))

print(f"old total {old_d['value']:9.1f}s  ({len(old_q)} queries)")
print(f"new total {new_d['value']:9.1f}s  ({len(new_q)} queries)")
if added:
    s = sum(new_q[k] for k in added)
    print(f"added ({len(added)}, {s:.1f}s): " + ", ".join(
        f"{k}={new_q[k]:.2f}" for k in sorted(added, key=lambda k: -new_q[k])))
if removed:
    print(f"removed ({len(removed)}): " + ", ".join(removed))
so = sum(old_q[k] for k in shared)
sn = sum(new_q[k] for k in shared)
print(f"shared {len(shared)}: {so:.1f}s -> {sn:.1f}s ({sn/so:.3f}x)")
deltas = sorted(((new_q[k] - old_q[k], k) for k in shared))
print("top regressions:")
for d, k in deltas[::-1][:top]:
    if d <= 0: break
    print(f"  {k:36s} {old_q[k]:7.2f} -> {new_q[k]:7.2f}  (+{d:.2f})")
print("top improvements:")
for d, k in deltas[:top]:
    if d >= 0: break
    print(f"  {k:36s} {old_q[k]:7.2f} -> {new_q[k]:7.2f}  ({d:.2f})")
