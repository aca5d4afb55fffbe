"""As-of join and range join unit tests (operators.asof)."""

from pyspark.sql import functions as F

from parkour_spark.operators.asof import asof_join, range_join

TRADES = [(1, 10, "t1"), (1, 20, "t2"), (2, 15, "t3")]  # key, time, id
QUOTES = [(1, 5, 100.0), (1, 10, 101.0), (1, 18, 102.0), (2, 99, 103.0)]


def _dfs(spark):
    left = spark.createDataFrame(TRADES, ["k", "t", "trade_id"])
    right = spark.createDataFrame(QUOTES, ["k", "qt", "px"])
    return left, right


def test_asof_backward(spark):
    left, right = _dfs(spark)
    got = {r["trade_id"]: r["px"] for r in
           asof_join(left, right, ["k"], "t", "qt", ["px"]).collect()}
    # t1@10 → quote@10 (equal time included); t2@20 → quote@18; t3@15 → none
    assert got == {"t1": 101.0, "t2": 102.0, "t3": None}


def test_asof_backward_strict(spark):
    left, right = _dfs(spark)
    got = {r["trade_id"]: r["px"] for r in
           asof_join(left, right, ["k"], "t", "qt", ["px"], strict=True).collect()}
    # strict: t1@10 → quote@5
    assert got == {"t1": 100.0, "t2": 102.0, "t3": None}


def test_asof_forward(spark):
    left, right = _dfs(spark)
    got = {r["trade_id"]: r["px"] for r in
           asof_join(left, right, ["k"], "t", "qt", ["px"], direction="forward").collect()}
    # t1@10 → quote@10; t2@20 → none after; t3@15 → quote@99
    assert got == {"t1": 101.0, "t2": None, "t3": 103.0}


def test_asof_preserves_left_rowcount(spark):
    left, right = _dfs(spark)
    assert asof_join(left, right, ["k"], "t", "qt", ["px"]).count() == len(TRADES)


def test_range_join_basic(spark):
    left = spark.createDataFrame([(1, 3.0), (2, 7.5), (3, 20.0)], ["id", "v"])
    right = spark.createDataFrame(
        [(0.0, 5.0, "low"), (5.0, 10.0, "mid"), (10.0, 15.0, "high")],
        ["lo", "hi", "band"],
    )
    got = {r["id"]: r["band"] for r in
           range_join(left, right, "v", "lo", "hi").collect()}
    assert got == {1: "low", 2: "mid"}  # 20.0 falls outside all bands


def test_range_join_boundaries(spark):
    left = spark.createDataFrame([(1, 5.0), (2, 10.0)], ["id", "v"])
    right = spark.createDataFrame([(5.0, 10.0, "m")], ["lo", "hi", "band"])
    got = {r["id"]: r["band"] for r in range_join(left, right, "v", "lo", "hi").collect()}
    assert got == {1: "m"}  # [lo, hi): 5.0 in, 10.0 out


def test_range_join_wide_interval(spark):
    """Interval spanning many buckets still matches (explode covers all)."""
    left = spark.createDataFrame([(1, 42.0)], ["id", "v"])
    right = spark.createDataFrame([(0.0, 100.0, "all")], ["lo", "hi", "band"])
    got = range_join(left, right, "v", "lo", "hi", bucket_width=7.0).collect()
    assert len(got) == 1 and got[0]["band"] == "all"


def test_range_join_with_keys(spark):
    left = spark.createDataFrame([("a", 3.0), ("b", 3.0)], ["g", "v"])
    right = spark.createDataFrame([("a", 0.0, 5.0, "x")], ["g", "lo", "hi", "band"])
    got = [(r["g"], r["band"]) for r in
           range_join(left, right, "v", "lo", "hi", on=["g"]).collect()]
    assert got == [("a", "x")]
