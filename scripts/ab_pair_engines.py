"""Same-session alternating A/B: pair-explode engine column vs arrow.

Measures bench-identical .count() wall + per-stage executor CPU via the
UI REST API for the three pair-explode-heavy entries. Prints per-rep
walls and per-(query, engine) stage tables for the fastest rep.
"""
import functools
import json
import sys
import time
import urllib.request

sys.path.insert(0, "/root/repo")

import parkour_spark.operators.dedup as D
from parkour_spark.queries import QUERIES
from parkour_spark.session import build_session

UI = 4051
TARGETS = ["dedup_ngram_jaccard_capped", "dedup_prefix_filter", "dedup_minhash_lsh"]
SF = "/root/testdata/sf0.1"
WARM = "/root/testdata/sf0.001"
REPS = 4

orig_bp = D._bucket_pairs
orig_pf = D.prefix_filter_pairs


def set_engine(eng):
    D._bucket_pairs = functools.partial(orig_bp, engine=eng)
    D.prefix_filter_pairs = functools.partial(orig_pf, engine=eng)


def rest(app, path):
    with urllib.request.urlopen(
        f"http://localhost:{UI}/api/v1/applications/{app}/{path}", timeout=10
    ) as r:
        return json.load(r)


def main():
    spark = build_session(
        "ab_pairs",
        extra_conf={"spark.ui.enabled": "true", "spark.ui.port": str(UI)},
    )
    sc = spark.sparkContext
    app = sc.applicationId
    for eng in ("column", "arrow"):
        set_engine(eng)
        for q in TARGETS:
            QUERIES[q](spark, WARM).count()
    walls = {}
    for rep in range(REPS):
        for eng in ("column", "arrow"):
            set_engine(eng)
            for q in TARGETS:
                sc.setJobGroup(f"ab:{q}:{eng}:{rep}", q)
                spark.catalog.clearCache()
                t0 = time.perf_counter()
                QUERIES[q](spark, SF).count()
                dt = time.perf_counter() - t0
                walls.setdefault((q, eng), []).append(round(dt, 3))
                sc.setJobGroup("", "")
    jobs = rest(app, "jobs?status=succeeded")
    stages = {s["stageId"]: s for s in rest(app, "stages?status=COMPLETE")}
    # per (q, eng, rep): stage ids
    per = {}
    for j in jobs:
        g = j.get("jobGroup") or ""
        if not g.startswith("ab:"):
            continue
        _, q, eng, rep = g.split(":")
        per.setdefault((q, eng, int(rep)), []).extend(j.get("stageIds", []))
    print("== walls (s) ==")
    for q in TARGETS:
        for eng in ("column", "arrow"):
            w = walls[(q, eng)]
            print(f"{q:32} {eng:6} {w} min={min(w)}")
    print("\n== stage CPU for fastest rep of each side ==")
    for q in TARGETS:
        for eng in ("column", "arrow"):
            w = walls[(q, eng)]
            rep = w.index(min(w))
            sids = sorted(set(per.get((q, eng, rep), [])))
            tot_cpu = tot_run = 0
            rows = []
            for sid in sids:
                s = stages.get(sid)
                if not s:
                    continue
                cpu = (s.get("executorCpuTime") or 0) // 1_000_000
                run = s.get("executorRunTime") or 0
                tot_cpu += cpu
                tot_run += run
                rows.append(
                    (sid, s.get("numCompleteTasks"), run, cpu,
                     round((s.get("shuffleReadBytes") or 0) / 1e6, 2),
                     round((s.get("shuffleWriteBytes") or 0) / 1e6, 2),
                     s.get("name", "")[:70])
                )
            print(f"\n-- {q} [{eng}] rep={rep} wall={min(w)}s "
                  f"TOTAL run={tot_run}ms cpu={tot_cpu}ms")
            for r in rows:
                print(f"   st{r[0]:>5} t={r[1]:>3} run={r[2]:>7} cpu={r[3]:>7} "
                      f"shR={r[4]:>8} shW={r[5]:>8}  {r[6]}")
    spark.stop()


if __name__ == "__main__":
    main()
