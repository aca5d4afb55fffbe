"""CDC operators: MERGE emulation and SCD2 history."""

from pyspark.sql import functions as F

from parkour_spark.operators.cdc import merge_upsert, scd2_from_events


def _target(spark):
    return spark.createDataFrame(
        [(1, "a", 10.0), (2, "b", 20.0), (3, "c", 30.0)], ["k", "name", "v"]
    )


def test_merge_upsert_replaces_and_inserts(spark):
    updates = spark.createDataFrame([(2, "b2", 25.0), (9, "new", 99.0)], ["k", "name", "v"])
    got = {r["k"]: (r["name"], r["v"]) for r in merge_upsert(_target(spark), updates, ["k"]).collect()}
    assert got == {1: ("a", 10.0), 2: ("b2", 25.0), 3: ("c", 30.0), 9: ("new", 99.0)}


def test_merge_upsert_idempotent(spark):
    """Re-applying the same CDC batch changes nothing — the exactly-once
    property downstream consumers rely on."""
    updates = spark.createDataFrame([(2, "b2", 25.0)], ["k", "name", "v"])
    once = merge_upsert(_target(spark), updates, ["k"])
    twice = merge_upsert(once, updates, ["k"])
    assert sorted(map(tuple, once.collect())) == sorted(map(tuple, twice.collect()))


def test_merge_upsert_plan_keeps_target_unshuffled(spark):
    updates = spark.createDataFrame([(2, "b2", 25.0)], ["k", "name", "v"])
    plan = (
        merge_upsert(_target(spark), updates, ["k"])
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "BroadcastHashJoin" in plan and "LeftAnti" in plan, plan


def test_scd2_versions_and_current_flag(spark):
    changes = spark.createDataFrame(
        [(1, "2024-01-01", "bronze"), (1, "2024-03-01", "silver"),
         (1, "2024-06-01", "gold"), (2, "2024-02-01", "bronze")],
        ["cust", "ts", "tier"],
    )
    rows = scd2_from_events(changes, ["cust"], "ts", ["tier"]).collect()
    hist = {(r["cust"], r["tier"]): (r["valid_from"], r["valid_to"], r["is_current"]) for r in rows}
    assert hist[(1, "bronze")] == ("2024-01-01", "2024-03-01", False)
    assert hist[(1, "silver")] == ("2024-03-01", "2024-06-01", False)
    assert hist[(1, "gold")] == ("2024-06-01", None, True)
    assert hist[(2, "bronze")] == ("2024-02-01", None, True)
