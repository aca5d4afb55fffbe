"""Salted join and time-bucket tests."""

import datetime

import pytest
from pyspark.sql import functions as F

from parkour_spark.functions.timeops import time_bucket, time_bucket_start_end
from parkour_spark.operators.joins import salted_join


def _sides(spark):
    left = spark.createDataFrame(
        [(1, "a"), (1, "b"), (2, "c"), (3, "d")], ["k", "lv"]
    )
    right = spark.createDataFrame([(1, "X"), (1, "Y"), (2, "Z")], ["k", "rv"])
    return left, right


def test_salted_join_matches_plain_inner(spark):
    left, right = _sides(spark)
    plain = sorted(map(tuple, left.join(right, "k").select("k", "lv", "rv").collect()))
    salted = sorted(
        map(
            tuple,
            salted_join(left, right, "k", num_salts=4, hot_keys="all")
            .select("k", "lv", "rv")
            .collect(),
        )
    )
    assert salted == plain


def test_salted_join_matches_plain_left(spark):
    left, right = _sides(spark)
    plain = sorted(
        map(tuple, left.join(right, "k", "left").select("k", "lv", "rv").collect())
    )
    salted = sorted(
        map(
            tuple,
            salted_join(left, right, "k", num_salts=4, how="left", hot_keys="all")
            .select("k", "lv", "rv")
            .collect(),
        )
    )
    assert salted == plain


def test_salted_join_auto_no_hot_keys_is_plain_join(spark):
    """No skew detected → the plan IS the plain join: no salt column,
    no right-side replication (the round-1 always-on salting cost 4× a
    plain join for nothing)."""
    left, right = _sides(spark)
    joined = salted_join(left, right, "k", num_salts=4)  # auto, nothing hot
    plan = joined._jdf.queryExecution().executedPlan().toString()
    assert "__salt" not in plan
    plain = sorted(map(tuple, left.join(right, "k").select("k", "lv", "rv").collect()))
    got = sorted(map(tuple, joined.select("k", "lv", "rv").collect()))
    assert got == plain


def test_salted_join_explicit_hot_keys_row_identical(spark):
    """Forced hot key → hot branch salted (salt machinery in the plan),
    cold branch plain, union row-identical to the plain join."""
    left, right = _sides(spark)
    joined = salted_join(left, right, "k", num_salts=4, hot_keys=[1])
    plan = joined._jdf.queryExecution().executedPlan().toString()
    assert "__salt" in plan
    plain = sorted(map(tuple, left.join(right, "k").select("k", "lv", "rv").collect()))
    got = sorted(map(tuple, joined.select("k", "lv", "rv").collect()))
    assert got == plain


def test_salted_join_rejects_right_join(spark):
    left, right = _sides(spark)
    with pytest.raises(ValueError):
        salted_join(left, right, "k", how="right")


def test_time_bucket_boundaries(spark):
    ts = [
        datetime.datetime(2024, 1, 1, 0, 0, 0),
        datetime.datetime(2024, 1, 1, 0, 14, 59, 999999),
        datetime.datetime(2024, 1, 1, 0, 15, 0),
    ]
    df = spark.createDataFrame([(t,) for t in ts], ["ts"])
    got = [r["b"] for r in df.select(time_bucket("ts", 900).alias("b")).collect()]
    assert got[0] == got[1] == datetime.datetime(2024, 1, 1, 0, 0, 0)
    assert got[2] == datetime.datetime(2024, 1, 1, 0, 15, 0)


def test_time_bucket_start_end(spark):
    df = spark.createDataFrame([(datetime.datetime(2024, 1, 1, 0, 7, 30),)], ["ts"])
    s, e = time_bucket_start_end("ts", 900)
    row = df.select(s.alias("s"), e.alias("e")).first()
    assert row["s"] == datetime.datetime(2024, 1, 1, 0, 0, 0)
    assert row["e"] == datetime.datetime(2024, 1, 1, 0, 15, 0)
