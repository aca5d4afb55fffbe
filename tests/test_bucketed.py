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


def test_ivf_cells_partition_pruned_on_disk(spark, tmp_path):
    """The persistent IVF deployment: the assigned corpus written
    partitioned by cell, a probe reading only its cells' directories —
    the scan must show PartitionFilters and skip non-probed cells."""
    import pyspark.sql.functions as F

    from parkour_spark.operators.similarity import ivf_assign_arrow

    rows = [(i, [float((i * 7 + d) % 13) - 6.0 for d in range(8)]) for i in range(200)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    cents = [(c, [1.0 if d == c else 0.0 for d in range(8)]) for c in range(4)]
    path = str(tmp_path / "ivf_index")
    ivf_assign_arrow(df, cents, "embedding", "cell").write.partitionBy("cell").parquet(path)

    probe = spark.read.parquet(path).where(F.col("cell").isin(0, 1))
    plan = probe._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan and "cell" in plan.split("PartitionFilters")[1][:120]
    # pruning is real: only the probed cells' rows are read
    all_cells = {r["cell"] for r in probe.select("cell").distinct().collect()}
    assert all_cells <= {0, 1}
