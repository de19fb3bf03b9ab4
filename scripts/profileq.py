"""Per-query profiler: build-time vs execute-time split + per-job breakdown.

Usage:
    python scripts/profileq.py z_graph_pagerank [--runs 2]

For each named query it reports:
  - build_s:   wall time of REGISTRY[name].spark(spark, sf_dir) — the
    driver-side plan construction (py4j chatter, analysis triggers)
  - exec_s:    wall time of .collect()
  - the per-job timeline of the measured run (description, duration,
    stages, shuffle read/write bytes) from the UI REST API

The UI is forced on for this script only; bench.py is untouched.
"""

from __future__ import annotations

import json
import os
import sys
import time
import urllib.request
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

os.environ.setdefault("SPARK_GRAFT_UI", "true")


def _rest(app_url: str, path: str):
    with urllib.request.urlopen(app_url + path, timeout=10) as r:
        return json.loads(r.read())


def main() -> None:
    argv, names, runs = sys.argv[1:], [], 2
    i = 0
    while i < len(argv):
        if argv[i].startswith("--runs"):
            if "=" in argv[i]:
                runs = int(argv[i].split("=", 1)[1])
            else:
                i += 1
                runs = int(argv[i])
        else:
            names.append(argv[i])
        i += 1
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    from bonobo_sqlalchemy_spark.queries import REGISTRY
    from bonobo_sqlalchemy_spark.session import get_spark

    spark = get_spark(app_name="profileq")
    sc = spark.sparkContext
    ui = sc.uiWebUrl
    app_id = sc.applicationId
    base = f"{ui}/api/v1/applications/{app_id}"

    for name in names:
        spec = REGISTRY[name]
        # warm runs
        for _ in range(runs):
            spec.spark(spark, sf_dir).collect()
        jobs_before = {j["jobId"] for j in _rest(base, "/jobs")}
        sc.setJobDescription(f"profileq:{name}")
        t0 = time.perf_counter()
        df = spec.spark(spark, sf_dir)
        t1 = time.perf_counter()
        df.collect()
        t2 = time.perf_counter()
        sc.setJobDescription(None)
        jobs = [j for j in _rest(base, "/jobs") if j["jobId"] not in jobs_before]
        jobs.sort(key=lambda j: j["jobId"])
        print(f"\n=== {name}: build={t1 - t0:.3f}s exec={t2 - t1:.3f}s "
              f"total={t2 - t0:.3f}s jobs={len(jobs)}")
        # stage metrics for shuffle volumes
        stages = {s["stageId"]: s for s in _rest(base, "/stages")}
        for j in jobs:
            try:
                st = time.strptime(j["submissionTime"][:19], "%Y-%m-%dT%H:%M:%S")
                en = time.strptime(j["completionTime"][:19], "%Y-%m-%dT%H:%M:%S")
                dur = time.mktime(en) - time.mktime(st)
            except Exception:
                dur = -1
            # sub-second precision from the GMT ms fields when present
            try:
                sub = (
                    int(j["completionTime"][20:23]) - int(j["submissionTime"][20:23])
                ) / 1000.0
                dur += sub
            except Exception:
                pass
            sread = swrite = 0
            for sid in j.get("stageIds", []):
                s = stages.get(sid)
                if s:
                    sread += s.get("shuffleReadBytes", 0)
                    swrite += s.get("shuffleWriteBytes", 0)
            desc = (j.get("description") or j.get("name", ""))[:90]
            print(f"  job {j['jobId']:>5} {dur:6.2f}s tasks={j.get('numTasks', 0):>4} "
                  f"sread={sread / 1e6:8.2f}MB swrite={swrite / 1e6:8.2f}MB  {desc}")


if __name__ == "__main__":
    main()
