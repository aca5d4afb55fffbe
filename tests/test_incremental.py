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


def test_streaming_rollup_restart_resumes_from_snapshot(spark, events):
    """A RESTARTED query (same state_base + checkpoint) must merge new
    data into the discovered pre-crash snapshot, not start fresh: run
    over half the files, then add the rest and run a NEW query — the
    final rollup equals the full recompute, and the second run's
    batch ids continue past the first run's snapshots."""
    import os
    import tempfile

    from parkour_spark.streaming.windows import (
        incremental_rollup_stream,
        read_stream,
    )

    src = tempfile.mkdtemp(prefix="t_increstart_src_")
    state = tempfile.mkdtemp(prefix="t_increstart_state_")
    hour = F.date_format(F.date_trunc("hour", "ts"), "yyyy-MM-dd HH").alias("h")
    first = events.where(F.col("event_id") % 2 == 0)
    second = events.where(F.col("event_id") % 2 == 1)
    first.repartition(2).write.mode("overwrite").parquet(src)
    stream = read_stream(spark, src, events.schema, max_files=1)
    incremental_rollup_stream(stream.select(hour, "value"), state, ["h"], "value")
    snaps_before = {d for d in os.listdir(state) if d.startswith("v")}
    assert snaps_before, "first run wrote no snapshots"
    # "crash" over; more source files arrive, a fresh query restarts
    # from the same checkpoint and must NOT reprocess the first files
    second.repartition(2).write.mode("append").parquet(src)
    stream2 = read_stream(spark, src, events.schema, max_files=1)
    got = incremental_rollup_stream(
        stream2.select(hour, "value"), state, ["h"], "value"
    )
    want = finalize(agg_state(events.select(hour, "value"), ["h"], "value"))
    assert _rows(got) == _rows(want)
    snaps_after = {d for d in os.listdir(state) if d.startswith("v")}
    new = {int(s[1:]) for s in snaps_after - snaps_before}
    assert new and min(new) > max(int(s[1:]) for s in snaps_before)


def test_streaming_rollup_replayed_batch_not_double_merged(spark, events):
    """Idempotence guard: if a batch's snapshot is already committed
    (crash after write, before offset commit), replaying it must skip
    the merge — totals stay exactly the full recompute, not doubled."""
    import os
    import shutil
    import tempfile

    from parkour_spark.streaming.windows import (
        incremental_rollup_stream,
        read_stream,
    )

    src = tempfile.mkdtemp(prefix="t_increplay_src_")
    state = tempfile.mkdtemp(prefix="t_increplay_state_")
    hour = F.date_format(F.date_trunc("hour", "ts"), "yyyy-MM-dd HH").alias("h")
    events.repartition(2).write.mode("overwrite").parquet(src)
    stream = read_stream(spark, src, events.schema, max_files=1)
    incremental_rollup_stream(stream.select(hour, "value"), state, ["h"], "value")
    # simulate crash-after-snapshot-before-offset-commit: drop the last
    # batch's offset commit so a restarted query replays that batch
    commits = os.path.join(state, "_checkpoint", "commits")
    last = max((f for f in os.listdir(commits) if f.isdigit()), key=int)
    os.remove(os.path.join(commits, last))
    crc = os.path.join(commits, f".{last}.crc")
    if os.path.exists(crc):
        os.remove(crc)
    stream2 = read_stream(spark, src, events.schema, max_files=1)
    got = incremental_rollup_stream(
        stream2.select(hour, "value"), state, ["h"], "value"
    )
    want = finalize(agg_state(events.select(hour, "value"), ["h"], "value"))
    assert _rows(got) == _rows(want)
