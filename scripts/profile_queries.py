"""Per-query profiling harness for the optimization rounds (guide §1).

For each target query: warm up at sf0.001 (bench-identical), run the
bench-identical steady measurement (`.count()`, best of 2) under a job
group, then attribute wall-clock to jobs/stages via the Spark UI REST
API (the profiling session enables the UI; bench sessions keep it off).
Dumps `.explain("formatted")` per query to plans/<tag>/<q>_<suffix>.txt.

Usage: python scripts/profile_queries.py [--plans-tag r12 --suffix before]
           [query ...]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time
import urllib.request

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from parkour_spark.queries import QUERIES  # noqa: E402
from parkour_spark.session import build_session  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
WARMUP_SF_DIR = os.environ.get("SPARK_GRAFT_WARMUP_SF_DIR", "/root/testdata/sf0.001")
UI_PORT = 4050


def rest(path: str):
    with urllib.request.urlopen(
        f"http://localhost:{UI_PORT}/api/v1/{path}", timeout=10
    ) as r:
        return json.load(r)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--plans-tag", default=None, help="plans/<tag>/ dir to write explains")
    ap.add_argument("--suffix", default="before")
    ap.add_argument("--runs", type=int, default=2)
    ap.add_argument("queries", nargs="*")
    args = ap.parse_args()
    targets = args.queries
    if not targets:
        import bench

        targets = bench.HEADLINE
    spark = build_session(
        "parkour_spark_profile",
        extra_conf={"spark.ui.enabled": "true", "spark.ui.port": str(UI_PORT)},
    )
    sc = spark.sparkContext
    app_id = sc.applicationId
    spark.range(1).count()
    for name in targets:
        try:
            QUERIES[name](spark, WARMUP_SF_DIR).count()
        except Exception as e:
            print(f"# warmup {name} failed: {e}", file=sys.stderr)
    report = {}
    here = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    plans_dir = None
    if args.plans_tag:
        plans_dir = os.path.join(here, "plans", args.plans_tag)
        os.makedirs(plans_dir, exist_ok=True)
    for name in targets:
        sc.setJobGroup(f"prof:{name}", name)
        best, best_first = float("inf"), None
        for _ in range(args.runs):
            t0 = time.perf_counter()
            df = QUERIES[name](spark, SF_DIR)
            n = df.count()
            dt = time.perf_counter() - t0
            if best_first is None:
                best_first = dt
            best = min(best, dt)
        sc.setJobGroup("", "")
        # attribute: jobs in this group
        jobs = [
            j
            for j in rest(f"applications/{app_id}/jobs?status=succeeded")
            if j.get("jobGroup") == f"prof:{name}"
        ]
        jobs.sort(key=lambda j: j["jobId"])
        job_rows = []
        for j in jobs:
            sub = j.get("submissionTime", "")
            comp = j.get("completionTime", "")
            dur = None
            try:
                from datetime import datetime

                fmt = "%Y-%m-%dT%H:%M:%S.%f%Z"
                dur = (
                    datetime.strptime(comp.replace("GMT", ""), "%Y-%m-%dT%H:%M:%S.%f")
                    - datetime.strptime(sub.replace("GMT", ""), "%Y-%m-%dT%H:%M:%S.%f")
                ).total_seconds()
            except Exception:
                pass
            job_rows.append(
                {
                    "jobId": j["jobId"],
                    "desc": (j.get("description") or j.get("name", ""))[:100],
                    "sec": dur,
                    "stages": j.get("stageIds", []),
                }
            )
        stage_rows = {}
        for s in rest(f"applications/{app_id}/stages?status=COMPLETE"):
            stage_rows[s["stageId"]] = {
                "name": s.get("name", "")[:80],
                "tasks": s.get("numCompleteTasks"),
                "runMs": s.get("executorRunTime"),
                "cpuMs": (s.get("executorCpuTime") or 0) // 1_000_000,
                "inMB": round((s.get("inputBytes") or 0) / 1e6, 1),
                "shRdMB": round((s.get("shuffleReadBytes") or 0) / 1e6, 2),
                "shWrMB": round((s.get("shuffleWriteBytes") or 0) / 1e6, 2),
            }
        report[name] = {
            "steady_sec": round(best, 3),
            "first_sec": round(best_first, 3),
            "rows": n,
            "n_jobs_total_runs": len(jobs),
            "jobs": job_rows,
        }
        print(f"== {name}: steady {best:.3f}s first {best_first:.3f}s rows={n} jobs(all runs)={len(jobs)}")
        for j in job_rows:
            print(f"   job {j['jobId']:>4} {str(j['sec']):>8}s  {j['desc']}")
            for sid in j["stages"]:
                s = stage_rows.get(sid)
                if s:
                    print(
                        f"      stage {sid:>4} tasks={s['tasks']:>3} run={s['runMs']:>6}ms "
                        f"cpu={s['cpuMs']:>6}ms in={s['inMB']:>8}MB shR={s['shRdMB']:>8}MB "
                        f"shW={s['shWrMB']:>8}MB  {s['name']}"
                    )
        if plans_dir:
            try:
                df = QUERIES[name](spark, SF_DIR)
                plan = df._sc._jvm.PythonSQLUtils.explainString(
                    df._jdf.queryExecution(), "formatted"
                )
            except Exception:
                import contextlib
                import io

                buf = io.StringIO()
                with contextlib.redirect_stdout(buf):
                    QUERIES[name](spark, SF_DIR).explain("formatted")
                plan = buf.getvalue()
            with open(os.path.join(plans_dir, f"{name}_{args.suffix}.txt"), "w") as f:
                f.write(plan)
    out = os.path.join(here, f"PROFILE_{args.suffix}.json")
    with open(out, "w") as f:
        json.dump(report, f, indent=1)
    print(f"# wrote {out}")
    spark.stop()


if __name__ == "__main__":
    main()
