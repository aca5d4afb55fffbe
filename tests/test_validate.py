"""Validation/profiling semantics (operators/validate.py) on hand-built
frames with known nulls, dupes, and range violations — plus the
single-scan plan property that makes an N-check suite affordable."""

import pytest
from pyspark.sql import functions as F

from parkour_spark.operators import validate as V


@pytest.fixture(scope="module")
def frame(spark):
    return spark.createDataFrame(
        [
            (1, 10.0, "A"),
            (2, -5.0, "B"),
            (2, 99.0, None),
            (3, None, "Z"),
        ],
        "id long, amount double, code string",
    )


def test_checks_count_violations_exactly(spark, frame):
    out = {
        r["constraint"]: (r["violations"], r["status"])
        for r in V.validate(
            frame,
            [
                V.not_null("code"),
                V.in_range("amount", 0.0, 50.0),
                V.in_set("code", ["A", "B"]),
            ],
            unique_cols=["id"],
        ).collect()
    }
    assert out["not_null(code)"] == (1, "fail")
    # -5 out of range, 99 out of range, NULL counts as violation
    assert out["in_range(amount,0.0,50.0)"] == (3, "fail")
    # NULL and 'Z' not in set
    assert out["in_set(code)"] == (2, "fail")
    assert out["unique(id)"] == (1, "fail")
    rows = V.validate(frame, [V.not_null("id")]).collect()
    assert rows[0]["violations"] == 0 and rows[0]["status"] == "pass"
    assert rows[0]["n_rows"] == 4


def test_ref_integrity_counts_orphans(spark, frame):
    parent = spark.createDataFrame([(1,), (2,)], "pk long")
    out = V.ref_integrity(frame, "id", parent, "pk").collect()[0]
    assert out["violations"] == 1  # id=3 has no parent
    assert out["status"] == "fail"


def test_profile_columns_values(spark, frame):
    prof = {
        r["column"]: r
        for r in V.profile_columns(
            frame, numeric_cols=["amount"], string_cols=["code"]
        ).collect()
    }
    a = prof["amount"]
    assert (a["n_rows"], a["n_null"], a["n_distinct"]) == (4, 1, 3)
    assert a["min_val"] == "-5.0" and a["max_val"] == "99.0"
    c = prof["code"]
    assert (c["n_null"], c["n_distinct"]) == (1, 3)
    assert c["min_val"] == "A" and c["max_val"] == "Z"


def test_row_level_suite_is_single_scan(spark, frame):
    # N row-level checks + uniqueness = ONE scan of the input (the agg
    # carries every conditional sum; count-distinct adds an Expand, not
    # a second scan)
    df = V.validate(
        frame,
        [V.not_null("code"), V.in_range("amount", 0, 50), V.in_set("code", ["A"])],
        unique_cols=["id"],
    )
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Scan ExistingRDD") <= 1, plan


def test_winsorize_clamps_and_counts(spark):
    from parkour_spark.operators.validate import winsorize, winsorize_bounds
    from pyspark.sql import functions as F

    df = spark.createDataFrame(
        [(i, float(v)) for i, v in enumerate([1, 2, 3, 4, 5, 6, 7, 8, 9, 1000])],
        "id long, v double",
    )
    bounds = winsorize_bounds(df, "v", "id", 0.1, 0.9)
    b = bounds.collect()[0]
    assert (b["lo"], b["hi"]) == (1.0, 9.0)  # rank ceil(0.1*10)=1, ceil(0.9*10)=9
    out = winsorize(df, "v", bounds, out_col="w")
    rows = {r["id"]: (r["w"], r["__hi_clamped"]) for r in out.collect()}
    assert rows[9] == (9.0, True)       # the outlier clamps to hi
    assert rows[4] == (5.0, False)      # interior untouched
    assert sum(1 for w, c in rows.values() if c) == 1


# ---------------------------------------------------------------------------
# mad_profile
# ---------------------------------------------------------------------------


def test_mad_profile_hand_computed(spark):
    from parkour_spark.operators.validate import mad_profile

    # group a: values 1..9 plus outlier 1000 → n=10, lower median at
    # rank (10+1)//2 = 5 → 5; |x-5| = 4,3,2,1,0,1,2,3,4,995 → sorted
    # devs 0,1,1,2,2,3,3,4,4,995, lower median rank 5 → 2; outliers
    # |x-5| > 6 → only 1000.
    rows = [("a", v) for v in list(range(1, 10)) + [1000]]
    # group b: constant column → median=7, MAD=0, every row ties, no
    # outliers (0 > 0 false).
    rows += [("b", 7)] * 4
    df = spark.createDataFrame(rows, ["g", "x"])
    out = {r.g: r for r in mad_profile(df, "x", "g", k=3).collect()}
    a = out["a"]
    assert (a.n, a.median, a.mad, a.n_outliers) == (10, 5, 2, 1)
    b = out["b"]
    assert (b.n, b.median, b.mad, b.n_outliers) == (4, 7, 0, 0)


def test_mad_profile_layout_invariant(spark):
    from parkour_spark.operators.validate import mad_profile

    rows = [("g", (i * 37) % 101) for i in range(200)]
    df = spark.createDataFrame(rows, ["g", "x"])
    r1 = mad_profile(df, "x", "g").collect()
    r2 = mad_profile(df.repartition(13), "x", "g").collect()
    assert sorted(map(tuple, r1)) == sorted(map(tuple, r2))


def test_mad_profile_detects_planted_rate_spike(spark):
    """Spike-detection composition: a planted 100x hour is the only
    outlier, and the spike does NOT drag the median/MAD thresholds
    (the robustness property a mean/stddev detector lacks)."""
    from parkour_spark.operators.validate import mad_profile

    # 23 normal hours at counts 9..11, one spike hour at 1000
    rows = [("click", h, 9 + (h % 3)) for h in range(23)] + [("click", 23, 1000)]
    hourly = spark.createDataFrame(rows, ["event_type", "h", "cnt"])
    r = mad_profile(hourly, "cnt", "event_type", k=3).collect()[0]
    assert r.n == 24
    assert r.median == 10 and r.mad == 1  # untouched by the spike
    assert r.n_outliers == 1
