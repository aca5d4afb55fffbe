"""MaxScore wall-clock crossover at SERVING scale (r12 extra wave).

Every round since r11 recorded the honest caveat that the MaxScore
rows at sf1 (10× sf0.1) prove the MECHANISM — rows provably never
scored — while "wall-clock crossover needs serving-scale postings":
at sf1 the fixed per-job latencies dominate the sub-second postings
scans, so early termination cannot pay for its extra θ-search jobs.
This script MEASURES the crossover instead of asserting it: it
replicates the sf0.1 documents ×REPLICAS (default 100 — an
sf10-equivalent corpus, one decade above the soak, same
stride-and-suffix replica scheme as scripts/soak_sf1.py so df
structure scales exactly ×R), builds the text index once, and times
the steady-state serving latency of

  probe_plain      — text_index_probe_bm25, full scoring
  probe_maxscore   — text_index_probe_bm25_maxscore, NO stats_out
                     (the skip-audit counters run extra jobs; the
                     timed row is the honest serving configuration —
                     the skip is audited once, untimed, afterwards)
  multi_plain      — the 4-query batched probe (soak batch)
  multi_maxscore   — the same batch with per-query MaxScore, again
                     without the audit jobs in the timed runs

each RUNS times after one untimed warm-up (steady-state serving is
the claim; the warm-up covers codegen + file-listing caches and its
time is reported as "cold"). Output: one JSON line + the artifact
path given by --out (default BENCH_serving_scale_run.json at the
repo root — NOT the committed BENCH_serving_scale.json, which is a
hand-curated two-scale envelope {what, scales: {x100, x400},
headline, disclosed_runs} assembled from two recorded runs of this
script; a re-run must never clobber it — the r11 lesson about
clobbered recorded artifacts). Two full timed passes run
back-to-back and both are embedded, so every run carries its own
same-protocol reproduction.

Usage: python scripts/serving_scale_maxscore.py [--keep] [--out PATH]
Env: SPARK_GRAFT_SERVING_REPLICAS (default 100),
     SPARK_GRAFT_SERVING_DIR (default /tmp/parkour_serving_scale),
     SPARK_GRAFT_SOAK_SRC (default /root/testdata/sf0.1).
"""

import json
import os
import shutil
import sys
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F

from parkour_spark.session import build_session

SRC = os.environ.get("SPARK_GRAFT_SOAK_SRC", "/root/testdata/sf0.1")
DST = os.environ.get("SPARK_GRAFT_SERVING_DIR", "/tmp/parkour_serving_scale")
REPLICAS = int(os.environ.get("SPARK_GRAFT_SERVING_REPLICAS", "100"))
RUNS = 3

TERMS = ("dup", "hash", "scan")
MULTI_QUERIES = [
    (0, ("dup", "hash", "scan")),
    (1, ("dup", "join")),
    (2, ("dup", "scan")),
    (3, ("hash", "scan")),
]


def _loadavg():
    with open("/proc/loadavg") as f:
        one = float(f.read().split()[0])
    return {"loadavg_1m": one, "cpus": os.cpu_count()}


def materialize(spark) -> None:
    docs = spark.read.parquet(f"{SRC}/documents.parquet")
    doc_stride = docs.agg(F.max("doc_id")).first()[0] + 1
    reps = spark.range(REPLICAS).select(F.col("id").alias("rep"))
    big = docs.crossJoin(F.broadcast(reps)).select(
        (F.col("doc_id") + F.col("rep") * F.lit(doc_stride)).alias("doc_id"),
        F.concat(
            F.col("text"), F.lit(" rep"), F.col("rep").cast("string")
        ).alias("text"),
    )
    big.write.mode("overwrite").parquet(f"{DST}/documents.parquet")


def build_index(spark) -> float:
    from parkour_spark.operators.textindex import text_index_build

    docs = spark.read.parquet(f"{DST}/documents.parquet")
    t0 = time.perf_counter()
    text_index_build(docs, f"{DST}/text_index", n_buckets=16)
    return time.perf_counter() - t0


def _probe_plain(spark):
    from parkour_spark.operators.textindex import text_index_probe_bm25

    return text_index_probe_bm25(spark, f"{DST}/text_index", TERMS, k=10)


def _probe_maxscore(spark):
    from parkour_spark.operators.textindex import (
        text_index_probe_bm25_maxscore,
    )

    return text_index_probe_bm25_maxscore(
        spark, f"{DST}/text_index", TERMS, k=10
    )


def _multi_plain(spark):
    from parkour_spark.operators.textindex import (
        text_index_probe_bm25_multi,
    )

    return text_index_probe_bm25_multi(
        spark, f"{DST}/text_index", MULTI_QUERIES, k=10
    )


def _multi_maxscore(spark):
    from parkour_spark.operators.textindex import (
        text_index_probe_bm25_multi_maxscore,
    )

    return text_index_probe_bm25_multi_maxscore(
        spark, f"{DST}/text_index", MULTI_QUERIES, k=10
    )


ROWS = {
    "probe_plain": _probe_plain,
    "probe_maxscore": _probe_maxscore,
    "multi_plain": _multi_plain,
    "multi_maxscore": _multi_maxscore,
}


def timed_pass(spark) -> dict:
    out = {}
    for name, fn in ROWS.items():
        cold0 = time.perf_counter()
        fn(spark).collect()  # warm-up: codegen + listing caches
        cold = time.perf_counter() - cold0
        runs = []
        for _ in range(RUNS):
            t0 = time.perf_counter()
            n = len(fn(spark).collect())
            runs.append(round(time.perf_counter() - t0, 3))
        out[name] = {"cold": round(cold, 3), "runs": runs,
                     "steady": min(runs), "rows": n}
        print(f"  {name}: steady={min(runs)}s runs={runs} "
              f"cold={round(cold, 3)}s rows={n}", file=sys.stderr)
    return out


def audit_skips(spark) -> dict:
    """Untimed: assert no fallback fired and collect the provable
    per-row skip counters (these schedule extra count jobs — which is
    exactly why they are NOT inside the timed serving runs)."""
    from parkour_spark.operators.textindex import (
        text_index_probe_bm25_maxscore,
        text_index_probe_bm25_multi_maxscore,
    )

    st: dict = {}
    got = text_index_probe_bm25_maxscore(
        spark, f"{DST}/text_index", TERMS, k=10, stats_out=st
    )
    plain = _probe_plain(spark)
    assert st["fallback"] is None, st
    assert sorted(map(tuple, got.collect())) == sorted(
        map(tuple, plain.collect())
    ), "maxscore != plain at serving scale"
    mst: dict = {}
    mgot = text_index_probe_bm25_multi_maxscore(
        spark, f"{DST}/text_index", MULTI_QUERIES, k=10, stats_out=mst
    )
    assert mst["fallback"] is None, mst
    assert sorted(map(tuple, mgot.collect())) == sorted(
        map(tuple, _multi_plain(spark).collect())
    ), "multi maxscore != multi plain at serving scale"
    return {
        "single": {
            "essential": st["essential"],
            "rows_skipped_lower_bound": st["rows_skipped_lower_bound"],
        },
        "multi_per_query": {
            str(q): {
                "essential": s["essential"],
                "rows_skipped_lower_bound": s.get(
                    "rows_skipped_lower_bound"
                ),
            }
            for q, s in sorted(mst["per_query"].items())
        },
    }


def main() -> None:
    keep = "--keep" in sys.argv
    out_path = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "BENCH_serving_scale_run.json",
    )
    if "--out" in sys.argv:
        out_path = sys.argv[sys.argv.index("--out") + 1]
    load0 = _loadavg()
    spark = build_session(app_name="serving-scale-maxscore")
    t0 = time.perf_counter()
    if not os.path.exists(f"{DST}/text_index/meta"):
        print(f"materializing ×{REPLICAS} corpus → {DST}", file=sys.stderr)
        materialize(spark)
        build_s = build_index(spark)
    else:
        build_s = None  # reusing a kept index (--keep from a prior run)
    n_docs = spark.read.parquet(f"{DST}/documents.parquet").count()
    n_post = spark.read.parquet(f"{DST}/text_index/postings").count()
    print(f"corpus: {n_docs} docs, {n_post} postings rows", file=sys.stderr)
    print("pass 1 (recording):", file=sys.stderr)
    pass1 = timed_pass(spark)
    print("pass 2 (reproduction):", file=sys.stderr)
    pass2 = timed_pass(spark)
    skips = audit_skips(spark)
    payload = {
        "metric": "serving_scale_maxscore",
        "replicas": REPLICAS,
        "n_docs": n_docs,
        "n_postings": n_post,
        "index_build_s": None if build_s is None else round(build_s, 2),
        "load_start": load0,
        "load_end": _loadavg(),
        "rows": pass1,
        "reproduction": pass2,
        "skips": skips,
        "speedup_single": round(
            pass1["probe_plain"]["steady"]
            / pass1["probe_maxscore"]["steady"],
            3,
        ),
        "speedup_multi": round(
            pass1["multi_plain"]["steady"]
            / pass1["multi_maxscore"]["steady"],
            3,
        ),
        "total_s": round(time.perf_counter() - t0, 1),
    }
    with open(out_path, "w") as f:
        json.dump(payload, f, indent=1)
    print(json.dumps({k: payload[k] for k in (
        "metric", "replicas", "n_postings", "speedup_single",
        "speedup_multi", "load_start",
    )}))
    if not keep:
        shutil.rmtree(DST, ignore_errors=True)
    spark.stop()


if __name__ == "__main__":
    main()
