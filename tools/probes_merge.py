#!/usr/bin/env python3
"""Fold PROBES_LOG.jsonl (appended by graft.ScaleProbe per measurement)
into PROBES.json, the machine-readable probe-exponent registry
(query -> [{factor, exponent, round?, date?, t1?, tN?}]).

Latest record wins per (query, factor). Run after a probe session:
    python3 tools/probes_merge.py [--round N]
"""
import json, os, sys

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
rnd = None
if "--round" in sys.argv:
    rnd = int(sys.argv[sys.argv.index("--round") + 1])

reg = {}
reg_path = f"{ROOT}/PROBES.json"
if os.path.exists(reg_path):
    reg = json.load(open(reg_path))

log_path = f"{ROOT}/PROBES_LOG.jsonl"
if not os.path.exists(log_path):
    print("no PROBES_LOG.jsonl; nothing to merge"); sys.exit(0)

merged = 0
for line in open(log_path):
    line = line.strip()
    if not line:
        continue
    r = json.loads(line)
    entry = {"factor": r["factor"], "exponent": r["exponent"],
             "date": r.get("date")}
    if rnd is not None:
        entry["round"] = rnd
    if "t1" in r:
        entry["t1"] = r["t1"]
    if "tN" in r:
        entry["tN"] = r["tN"]
    lst = reg.setdefault(r["query"], [])
    lst[:] = [e for e in lst if e.get("factor") != r["factor"]]
    lst.append(entry)
    merged += 1

json.dump(dict(sorted(reg.items())), open(reg_path, "w"), indent=1)
os.rename(log_path, log_path + ".merged")
print(f"merged {merged} records into PROBES.json "
      f"({len(reg)} queries); log rotated to PROBES_LOG.jsonl.merged")
