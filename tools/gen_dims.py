#!/usr/bin/env python3
"""Reconstruct the dimension tables (dept→org, jobcode→defaults) implied
by the reference fixtures' golden outputs. The reference tests ran these
against a live Oracle DB; the dims here are the minimal rows consistent
with every fixture's `jobs` stage (pre-staff-type-fold).

Rules (from employee_job.py/poi_job.py/affiliate_job.py):
- job_description / employment_type always come straight from defaults.
- emp/poi: staff_type default observable only on active jobs (ended →
  forced 'nonacademic'); visibility default observable when active and
  um_campus in TXXX/DXXX; profiled default observable when active.
- affiliate: staff_type/visibility/profiled always from defaults.
Unobservable defaults fall back to nonacademic/Restricted/false.
"""
import json, glob, os

DST = "/root/repo/src/test/resources/fixtures"
dept_org = {}
jc = {"emp": {}, "poi": {}, "aff": {}}

def kind_of(path):
    b = os.path.basename(path)
    if b.startswith(("emp_job", "employee_jobs")): return "emp"
    if b.startswith("poi_jobs"): return "poi"
    if "aff_job" in b: return "aff"
    return None

for path in sorted(glob.glob(f"{DST}/*.json")):
    kind = kind_of(path)
    if not kind: continue
    data = json.load(open(path))
    for job in data.get("jobs", []):
        code = job["affiliation_id"]
        dept_org[job["deptid"]] = job["org_id"]
        d = jc[kind].setdefault(code, {
            "jobcode": code,
            "pure_job_description": job["job_description"],
            "default_employed_as": job["employment_type"],
            "default_staff_type": None, "default_visibility": None,
            "default_profiled": None, "default_profiled_overrideable": False,
        })
        active = job["end_date"] is None
        if kind == "aff":
            d["default_staff_type"] = job["staff_type"]
            d["default_visibility"] = job["visibility"]
            d["default_profiled"] = job["profiled"]
        elif active:
            d["default_staff_type"] = job["staff_type"]
            d["default_profiled"] = job["profiled"]
            if job["um_campus"] in ("TXXX", "DXXX"):
                d["default_visibility"] = job["visibility"]

for kind in jc:
    for d in jc[kind].values():
        d["default_staff_type"] = d["default_staff_type"] or "nonacademic"
        d["default_visibility"] = d["default_visibility"] or "Restricted"
        if d["default_profiled"] is None: d["default_profiled"] = False

out = {
    "dept_org": [{"deptid": k, "pure_org_id": v} for k, v in sorted(dept_org.items())],
    "emp_jobcodes": sorted(jc["emp"].values(), key=lambda d: d["jobcode"]),
    "poi_jobcodes": sorted(jc["poi"].values(), key=lambda d: d["jobcode"]),
    "aff_jobcodes": sorted(jc["aff"].values(), key=lambda d: d["jobcode"]),
}
json.dump(out, open(f"{DST}/dims.json", "w"), indent=1, sort_keys=True)
print({k: len(v) for k, v in out.items()})
