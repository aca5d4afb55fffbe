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


def test_pit_enrich_versions_gaps_and_pre_history(spark):
    """PIT semantics: version in force at the fact ts; NULL past the
    open version's start; facts inside a GAP (deleted key) get NULL
    rather than a dead version carried forward."""
    from pyspark.sql import functions as F

    from parkour_spark.operators.cdc import pit_enrich

    dim = spark.createDataFrame(
        [
            (1, "v1", 100, 200),
            (1, "v2", 200, 300),   # [200, 300) then a GAP
            (1, "v3", 400, None),  # open
            (2, "w1", 50, None),
        ],
        "k int, attr string, vfrom long, vto long",
    )
    facts = spark.createDataFrame(
        [(10, 1, 150), (11, 1, 200), (12, 1, 350), (13, 1, 400),
         (14, 1, 99), (15, 2, 1000), (16, 3, 10)],
        "fid int, k int, ts long",
    )
    got = {
        r.fid: r.attr
        for r in pit_enrich(
            facts, dim, ["k"], "ts", valid_from="vfrom", valid_to="vto"
        ).collect()
    }
    assert got[10] == "v1"      # mid-interval
    assert got[11] == "v2"      # boundary: from inclusive, to exclusive
    assert got[12] is None      # inside the gap — no dead-version carry
    assert got[13] == "v3"      # open version start
    assert got[14] is None      # before history
    assert got[15] == "w1"      # open version, other key
    assert got[16] is None      # unknown key survives (left join)
    assert len(got) == 7
