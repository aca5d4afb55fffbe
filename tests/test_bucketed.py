"""Bucketed co-located join tests: correctness AND the plan property
that justifies bucketing (no shuffle Exchange in the join)."""

import re

import pytest
from pyspark.sql import functions as F

from parkour_spark.sources.bucketed import cobucket_join, read_bucketed, write_bucketed


def _shuffles(df) -> int:
    plan = df._jdf.queryExecution().executedPlan().toString()
    return len(re.findall(r"Exchange (hash|range)partitioning", plan))


@pytest.fixture(scope="module")
def bucketed_tables(spark, tmp_path_factory):
    warehouse = spark.conf.get("spark.sql.warehouse.dir", None)
    left = spark.range(0, 1000).select(
        F.col("id").alias("k"), (F.col("id") % 7).alias("lv")
    )
    right = spark.range(0, 500).select(
        F.col("id").alias("k"), (F.col("id") % 3).alias("rv")
    )
    write_bucketed(left, "t_left_b", "k", num_buckets=4, sort_cols="k")
    write_bucketed(right, "t_right_b", "k", num_buckets=4, sort_cols="k")
    yield "t_left_b", "t_right_b"
    spark.sql("DROP TABLE IF EXISTS t_left_b")
    spark.sql("DROP TABLE IF EXISTS t_right_b")


def test_cobucket_join_correct(spark, bucketed_tables):
    lt, rt = bucketed_tables
    got = cobucket_join(spark, lt, rt, "k")
    assert got.count() == 500
    sample = {r["k"]: (r["lv"], r["rv"]) for r in got.where(F.col("k") < 5).collect()}
    assert sample[4] == (4 % 7, 4 % 3)


def test_cobucket_join_no_shuffle(spark, bucketed_tables):
    """The point of bucketing: the join requires zero Exchange."""
    lt, rt = bucketed_tables
    # disable auto-broadcast so the test exercises the sort-merge path a
    # 100 TB fact-fact join would take
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = cobucket_join(spark, lt, rt, "k")
        assert _shuffles(joined) == 0, joined._jdf.queryExecution().executedPlan().toString()
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)


def test_bucketed_groupby_no_shuffle(spark, bucketed_tables):
    """groupBy on the bucket key also rides the bucket distribution."""
    lt, _ = bucketed_tables
    agg = read_bucketed(spark, lt).groupBy("k").agg(F.sum("lv").alias("s"))
    assert _shuffles(agg) == 0, agg._jdf.queryExecution().executedPlan().toString()


def test_unbucketed_join_does_shuffle(spark, bucketed_tables):
    """Control: the same join on bucket-less data shuffles — proving the
    previous assertions measure the bucket spec, not AQE."""
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        l_plain = spark.range(0, 1000).select(
            F.col("id").alias("k"), (F.col("id") % 7).alias("lv")
        )
        r_plain = spark.range(0, 500).select(
            F.col("id").alias("k"), (F.col("id") % 3).alias("rv")
        )
        joined = l_plain.join(r_plain, "k")
        assert _shuffles(joined) >= 1
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)
