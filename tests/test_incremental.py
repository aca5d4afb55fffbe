"""Incremental aggregate maintenance + skew profiling semantics."""

import pytest
from pyspark.sql import functions as F

from parkour_spark.dataset import load_table
from parkour_spark.operators.incremental import agg_state, finalize, merge_states
from parkour_spark.operators.validate import skew_profile

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def events(spark):
    return load_table(spark, SF_DIR, "events")


def _rows(df):
    return sorted(map(tuple, df.collect()))


def test_three_way_split_equals_full(events):
    """State merges must be batch-boundary-independent: any partition of
    the data into batches finalizes to the full recompute."""
    hour = F.date_format(F.date_trunc("hour", "ts"), "yyyy-MM-dd HH").alias("h")
    full = finalize(agg_state(events.select(hour, "value"), ["h"], "value"))
    parts = [
        events.where(F.col("event_id") % 3 == i).select(hour, "value")
        for i in range(3)
    ]
    merged = agg_state(parts[0], ["h"], "value")
    for p in parts[1:]:
        merged = merge_states(merged, agg_state(p, ["h"], "value"), ["h"])
    assert _rows(finalize(merged)) == _rows(full)


def test_merge_commutes(events):
    hour = F.date_format(F.date_trunc("hour", "ts"), "yyyy-MM-dd HH").alias("h")
    a = agg_state(events.where(F.col("event_id") % 2 == 0).select(hour, "value"),
                  ["h"], "value")
    b = agg_state(events.where(F.col("event_id") % 2 == 1).select(hour, "value"),
                  ["h"], "value")
    assert _rows(merge_states(a, b, ["h"])) == _rows(merge_states(b, a, ["h"]))


def test_batch_only_groups_survive(spark):
    a = agg_state(
        spark.createDataFrame([("x", 1.0)], "k string, v double"), ["k"], "v"
    )
    b = agg_state(
        spark.createDataFrame([("y", 2.0), ("x", 3.0)], "k string, v double"),
        ["k"], "v",
    )
    out = {r["k"]: (r["n"], r["total"]) for r in finalize(merge_states(a, b, ["k"])).collect()}
    assert out == {"x": (2, 4.0), "y": (1, 2.0)}


def test_skew_profile_exact_top_and_ratio(spark, events):
    prof = skew_profile(events, "user_id", top_n=3).collect()
    exact = dict(
        events.groupBy("user_id").count().orderBy(F.col("count").desc(), "user_id")
        .limit(3).collect()
    )
    assert {r["key"]: r["cnt"] for r in prof} == exact
    total = events.count()
    for r in prof:
        assert r["total_rows"] == total
        assert r["share_bp"] == r["cnt"] * 10000 // total
    # uniform single-key corpus: max == mean exactly
    one = spark.range(100).select(F.lit("k").alias("k"))
    r = skew_profile(one, "k", top_n=1).collect()[0]
    assert r["skew_ratio_bp"] == 10000


def test_streaming_rollup_multi_batch_equals_batch(spark, events):
    """The streaming merge must traverse MULTIPLE batches (versioned
    snapshots) and still finalize to the batch recompute."""
    import os
    import tempfile

    from parkour_spark.streaming.windows import (
        incremental_rollup_stream,
        read_stream,
    )

    src = tempfile.mkdtemp(prefix="t_incstream_src_")
    state = tempfile.mkdtemp(prefix="t_incstream_state_")
    # 4 files -> 4 micro-batches at max_files=1
    events.repartition(4).write.mode("overwrite").parquet(src)
    stream = read_stream(spark, src, events.schema, max_files=1)
    hour = F.date_format(F.date_trunc("hour", "ts"), "yyyy-MM-dd HH").alias("h")
    got = incremental_rollup_stream(stream.select(hour, "value"), state, ["h"], "value")
    want = finalize(agg_state(events.select(hour, "value"), ["h"], "value"))
    assert _rows(got) == _rows(want)
    snaps = [d for d in os.listdir(state) if d.startswith("v")]
    assert len(snaps) >= 2, snaps
