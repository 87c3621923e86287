#!/usr/bin/env python3
"""Port the reference's golden fixture modules (pure data) to JSON test
resources. Each fixture module carries one person's data at successive
pipeline stages; we dump every top-level data attribute with datetimes
as ISO strings. Source: /root/reference/tests/*.py (data only, no code).
"""
import datetime, importlib.util, json, os, sys

SRC = "/root/reference/tests"
DST = "/root/repo/src/test/resources/fixtures"

MODULES = [
    "emp_job_entries_1082441", "emp_job_entries_3262322",
    "emp_job_entries_4604830", "emp_job_entries_5150075",
    "employee_jobs_0903070", "employee_jobs_1217312",
    "employee_jobs_1717940", "employee_jobs_1732812",
    "employee_jobs_2110507", "employee_jobs_8000397",
    "fake357_aff_job_entries", "fake531_aff_job_entries",
    "fake531_aff_job_entries_2", "fake531_aff_job_entries_3",
    "poi_jobs_2898289", "poi_jobs_2927554", "poi_jobs_5231388",
    "poi_jobs_5491169", "poi_jobs_5575725",
]

def conv(o):
    if isinstance(o, datetime.datetime):
        return o.strftime("%Y-%m-%dT%H:%M:%S")
    if isinstance(o, dict):
        return {k: conv(v) for k, v in o.items()}
    if isinstance(o, (list, tuple)):
        return [conv(x) for x in o]
    return o

os.makedirs(DST, exist_ok=True)
for name in MODULES:
    spec = importlib.util.spec_from_file_location(name, f"{SRC}/{name}.py")
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    out = {}
    for attr in dir(mod):
        if attr.startswith("_") or attr == "datetime":
            continue
        val = getattr(mod, attr)
        if isinstance(val, (list, dict, bool, str, int)):
            out[attr] = conv(val)
    with open(f"{DST}/{name}.json", "w") as f:
        json.dump(out, f, indent=1, sort_keys=True)
    print(name, list(out.keys()))
