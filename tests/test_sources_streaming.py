"""Sources, sinks (dux), streaming, multimodal, pipeline tests —
mirrors the reference's I/O round-trip test suite (SURVEY §5:
io/{text,mem,range,sample,mux,dux,dseq}_test.clj)."""

import os

import pytest
from pyspark.sql import functions as F

from parkour_spark.dataset import Dataset, load_table
from parkour_spark.plans.pipeline import Pipeline, broadcast_value, execute
from parkour_spark.sources import custom, dux, readers


def test_range_dseq_golden(spark):
    """range/dseq goldens: (range 10) and (range 5 100 7)
    (test/parkour/io/range_test.clj:8-22)."""
    assert [r.value for r in readers.range_dseq(spark, 10).collect()] == list(range(10))
    got = sorted(r.value for r in readers.range_dseq(spark, 5, 100, 7, nper=5).collect())
    assert got == list(range(5, 100, 7))


def test_range_nper_partitions(spark):
    df = readers.range_dseq(spark, 0, 100, 1, nper=10)
    assert df.rdd.getNumPartitions() == 10


def test_mem_dseq_roundtrip(spark):
    """mem/dseq records golden (io/mem_test.clj:13-18)."""
    rows = [("foo", 9), ("bar", 8), ("baz", 7), ("quux", 6)]
    got = sorted(tuple(r) for r in readers.mem_dseq(spark, rows, "w string, n long").collect())
    assert got == sorted(rows)


def test_mem_dseq_nper(spark):
    df = readers.mem_dseq(spark, [(i,) for i in range(10)], "x long", nper=2)
    assert df.rdd.getNumPartitions() == 5


def test_text_dseq(spark, tmp_path):
    p = str(tmp_path / "t.txt")
    with open(p, "w") as f:
        f.write("apple banana\ncarrot\n")
    df = readers.text_dseq(spark, p)
    assert sorted(r.value for r in df.collect()) == ["apple banana", "carrot"]
    off = readers.text_dseq_with_offsets(spark, p)
    # TRUE byte offsets since r3 (sources/textfmt.py): carrot starts at
    # byte 13 = len("apple banana\n")
    assert sorted(tuple(r) for r in off.collect()) == [(0, "apple banana"), (13, "carrot")]


def test_sample_dseq_seeded(spark):
    df = spark.range(1000)
    a = readers.sample_dseq(df, 0.1, seed=7).collect()
    b = readers.sample_dseq(df, 0.1, seed=7).collect()
    assert [r.id for r in a] == [r.id for r in b]
    assert 50 < len(a) < 200


def test_mux_heterogeneous_union(spark, tmp_path):
    """multiplex_test.clj:12-33 — text ∪ structured, discriminated."""
    p = str(tmp_path / "m.txt")
    with open(p, "w") as f:
        f.write("apple\nbanana\ncarrot\n")
    text = readers.text_dseq(spark, p)
    mem = readers.mem_dseq(spark, [("applez",), ("bananaz",), ("carrotz",)], "value string")
    out = readers.mux_dseq(text, mem, tags=["text", "mem"])
    got = sorted((r["source"], r["value"]) for r in out.collect())
    assert got == [("mem", "applez"), ("mem", "bananaz"), ("mem", "carrotz"),
                   ("text", "apple"), ("text", "banana"), ("text", "carrot")]


def test_fn_source(spark):
    """input-format! analog: split fn + record fn (mapreduce.clj:194-223)."""
    df = custom.fn_source(
        spark,
        splits=[(0, 5), (5, 10)],
        read_split=lambda s: [(i, i * i) for i in range(s[0], s[1])],
        schema="x long, sq long",
    )
    assert sorted((r.x, r.sq) for r in df.collect()) == [(i, i * i) for i in range(10)]
    assert df.rdd.getNumPartitions() == 2


def test_dux_named_outputs(spark, tmp_path):
    """dux named outputs + read-back (graph_test.clj:170-183 even/odd)."""
    df = spark.range(10).select(F.col("id"))
    outs = dux.write_named(
        df,
        {
            "even": (lambda d: d.where(F.col("id") % 2 == 0), Dataset(spark, str(tmp_path / "even"))),
            "odd": (lambda d: d.where(F.col("id") % 2 == 1), Dataset(spark, str(tmp_path / "odd"))),
        },
    )
    assert sorted(r.id for r in outs["even"].read().collect()) == [0, 2, 4, 6, 8]
    assert sorted(r.id for r in outs["odd"].read().collect()) == [1, 3, 5, 7, 9]


def test_dux_partitioned_routing(spark, tmp_path):
    """dux/prefix-* → partitionBy(route_col) (dux_test.clj:18-46)."""
    df = spark.createDataFrame([("a", 1), ("b", 2), ("a", 3)], ["k", "v"])
    out = dux.write_partitioned(df, Dataset(spark, str(tmp_path / "routed")), ["k"])
    dirs = sorted(d for d in os.listdir(tmp_path / "routed") if d.startswith("k="))
    assert dirs == ["k=a", "k=b"]
    assert sorted((r.k, r.v) for r in out.read().collect()) == [("a", 1), ("a", 3), ("b", 2)]


def test_dux_prefix_exact_file_names(spark, tmp_path):
    """EXACT dux/prefix-* naming (dux_test.clj:39-45 first-letter test):
    the reference expects files {a,b,c}-m-00000 — prefix from the data,
    task number suffixed — and the content reads back whole."""
    words = ["apple", "banana", "apple", "carrot", "banana", "apple"]
    df = (
        spark.createDataFrame([(w,) for w in words], ["word"])
        .withColumn("pfx", F.substring("word", 1, 1))
        .coalesce(1)  # one task, like the reference's single-split input
    )
    sink = Dataset(spark, str(tmp_path / "fl"), fmt="csv")
    out = dux.write_prefixed(df, sink, "pfx")
    files = sorted(
        f for f in os.listdir(tmp_path / "fl") if not f.startswith(("_", "."))
    )
    assert files == ["a-m-00000", "b-m-00000", "c-m-00000"]
    got = sorted(r[0] for r in out.read().collect())
    assert got == sorted(words)


def test_dux_prefix_multi_task_numbering(spark, tmp_path):
    """Several tasks writing the same prefix must yield consecutive
    per-prefix file numbers, never collisions."""
    df = (
        spark.createDataFrame([(f"w{i}", "a") for i in range(8)], ["word", "pfx"])
        .repartition(4)
    )
    sink = Dataset(spark, str(tmp_path / "mt"), fmt="csv")
    out = dux.write_prefixed(df, sink, "pfx")
    files = sorted(
        f for f in os.listdir(tmp_path / "mt") if not f.startswith(("_", "."))
    )
    assert files == [f"a-m-{i:05d}" for i in range(len(files))] and len(files) >= 2
    assert out.read().count() == 8


def test_pipeline_end_to_end(spark, tmp_path):
    """pg/input→map→reduce→output→re-input round-trip (graph.clj)."""
    lines = spark.createDataFrame([("a b a",), ("b c",)], ["value"])
    p = (
        Pipeline.input(lines)
        .map(lambda df: df.select(F.explode(F.split("value", " ")).alias("w")))
        .reduce(["w"], F.count("*").alias("n"))
        .output(Dataset(spark, str(tmp_path / "wc")))
    )
    assert sorted(tuple(r) for r in p.collect()) == [("a", 2), ("b", 2), ("c", 1)]


def test_pipeline_parallel_execute(spark):
    a = Pipeline.input(spark.range(5)).reduce([], F.sum("id").alias("s"))
    b = Pipeline.input(spark.range(10)).reduce([], F.count("*").alias("n"))
    ra, rb = execute(a, b)
    assert ra[0]["s"] == 10 and rb[0]["n"] == 10


def test_broadcast_value_filter(spark):
    """dval broadcast-filter pattern (dval_test.clj:12-46)."""
    words = broadcast_value(spark, {"blue", "baz"})
    df = spark.createDataFrame([("blue",), ("red",), ("baz",)], ["w"])
    got = sorted(
        r.w for r in df.rdd.filter(lambda row: row.w in words.value).toDF().collect()
    )
    assert got == ["baz", "blue"]


def test_streaming_tumbling_matches_batch(spark, sf_dir):
    from parkour_spark.streaming.windows import read_stream, run_to_completion, tumbling_agg
    import tempfile

    ev = load_table(spark, sf_dir, "events")
    tmp = tempfile.mkdtemp(prefix="stream_test_")
    ev.write.mode("overwrite").parquet(tmp)
    agg = tumbling_agg(
        read_stream(spark, tmp, ev.schema, max_files=2),
        "ts", "1 hour", ["event_type"], [F.count("*").alias("n")],
    )
    got = run_to_completion(agg, "complete")
    batch = ev.groupBy(F.window("ts", "1 hour"), "event_type").agg(F.count("*").alias("n"))
    assert sorted((str(r["window"]), r["event_type"], r["n"]) for r in got.collect()) == sorted(
        (str(r["window"]), r["event_type"], r["n"]) for r in batch.collect()
    )


def test_streaming_session_window(spark, sf_dir):
    from parkour_spark.streaming.windows import read_stream, run_to_completion, session_agg
    import tempfile

    ev = load_table(spark, sf_dir, "events")
    tmp = tempfile.mkdtemp(prefix="stream_sess_")
    ev.write.mode("overwrite").parquet(tmp)
    agg = session_agg(
        read_stream(spark, tmp, ev.schema, max_files=5),
        "ts", "30 minutes", ["user_id"], [F.count("*").alias("n")],
    )
    got = run_to_completion(agg, "complete")
    # session counts must sum to total events per user
    per_user = {r["user_id"]: r["total"] for r in
                got.groupBy("user_id").agg(F.sum("n").alias("total")).collect()}
    expect = {r["user_id"]: r["n"] for r in
              ev.groupBy("user_id").agg(F.count("*").alias("n")).collect()}
    assert per_user == expect


def test_stateful_apply_running_count(spark, sf_dir):
    """applyInPandasWithState: per-user running event count."""
    import tempfile

    import pandas as pd
    from pyspark.sql.streaming.state import GroupStateTimeout

    from parkour_spark.streaming.windows import read_stream

    ev = load_table(spark, sf_dir, "events").select("user_id", "event_id")
    tmp = tempfile.mkdtemp(prefix="stream_state_")
    ev.write.mode("overwrite").parquet(tmp)

    def count_events(key, pdfs, state):
        total = state.get[0] if state.exists else 0
        for pdf in pdfs:
            total += len(pdf)
        state.update((total,))
        yield pd.DataFrame({"user_id": [key[0]], "n": [total]})

    stream = read_stream(spark, tmp, ev.schema, max_files=10)
    out = stream.groupBy("user_id").applyInPandasWithState(
        count_events, "user_id long, n long", "n long", "update",
        GroupStateTimeout.NoTimeout,
    )
    q = out.writeStream.outputMode("update").format("memory").queryName("state_t").start()
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    final = spark.sql("SELECT user_id, max(n) AS n FROM state_t GROUP BY user_id")
    got = {r["user_id"]: r["n"] for r in final.collect()}
    expect = {r["user_id"]: r["cnt"] for r in
              ev.groupBy("user_id").agg(F.count("*").alias("cnt")).collect()}
    assert got == expect


def test_multimodal_plumbing(spark):
    from parkour_spark.operators import multimodal as MM

    blobs = spark.createDataFrame(
        [(1, b"hello"), (2, b"world"), (3, None)], "media_id long, payload binary"
    )
    fp = {r.media_id: r.fp for r in MM.binary_fingerprint(blobs).collect()}
    assert fp[1] == "5d41402abc4b2a76b9719d911017c592"  # md5("hello")
    assert fp[3] is None
    feats = {r.media_id: r.features for r in MM.decode_image_features(blobs).collect()}
    assert len(feats[1]) == 16 and feats[3] is None
    assert feats[1] == MM.decode_image_features(blobs).collect()[0].features  # deterministic


def test_multimodal_resize_plumbing(spark):
    from parkour_spark.operators import multimodal as MM

    blobs = spark.createDataFrame(
        [(1, b"hello"), (2, b"world"), (3, None)], "media_id long, payload binary"
    )
    rows = {r.media_id: r for r in MM.resize_images(blobs, 16, 16).collect()}
    assert set(rows) == {1, 2, 3}
    assert rows[1].width == 16 and rows[1].height == 16
    assert rows[3].payload is None  # null passthrough
    again = {r.media_id: r.payload for r in MM.resize_images(blobs, 16, 16).collect()}
    assert rows[1].payload == again[1]  # deterministic stub
    assert rows[1].payload != rows[2].payload


def test_multimodal_frame_sampling(spark):
    from pyspark.sql import Row

    from parkour_spark.operators import multimodal as MM

    videos = spark.createDataFrame(
        [
            Row(media_id=1, payload=b"vid-a", meta={"duration_ms": 3500}),
            Row(media_id=2, payload=b"vid-b", meta={"duration_ms": 900}),
            Row(media_id=3, payload=None, meta={"duration_ms": 5000}),
        ],
        "media_id long, payload binary, meta map<string,long>",
    )
    frames = MM.sample_video_frames(videos, every_ms=1000).collect()
    by_id = {}
    for r in frames:
        by_id.setdefault(r.media_id, []).append(r)
    # 3500ms @ 1000ms → frames at 0,1000,2000,3000; 900ms → one frame; null skipped
    assert len(by_id[1]) == 4 and [r.frame_ms for r in sorted(by_id[1], key=lambda x: x.frame_idx)] == [0, 1000, 2000, 3000]
    assert len(by_id[2]) == 1
    assert 3 not in by_id
    assert all(r.frame is not None for r in frames)


def test_dataset_roundtrip_and_introspection(spark, tmp_path):
    ds = Dataset(spark, str(tmp_path / "ds"))
    df = spark.range(5)
    back = ds.write(df)
    assert sorted(r.id for r in back.read().collect()) == [0, 1, 2, 3, 4]
    assert len(back.input_files()) >= 1
    # counters ride the write job (reference counters-on-dseq metadata)
    assert back.metrics["rows_written"] == 5


def test_write_observe_custom_counters(spark, tmp_path):
    from pyspark.sql import functions as F

    ds = Dataset(spark, str(tmp_path / "obs"))
    df = spark.range(10).withColumn("even", (F.col("id") % 2 == 0).cast("int"))
    back = ds.write(df, observe=[F.sum("even").alias("n_even")])
    assert back.metrics == {"rows_written": 10, "n_even": 5}

    from parkour_spark.plans.pipeline import Pipeline

    pl = Pipeline.input(df).output(Dataset(spark, str(tmp_path / "obs2")))
    assert pl.metrics["rows_written"] == 10


def test_streaming_heavy_hitters_mg_state(spark):
    """Stateful streaming Misra-Gries: hot keys surface with the MG
    lower-bound guarantee after a multi-batch replay, state stays
    fixed-size."""
    import tempfile

    from parkour_spark.streaming.windows import read_stream, streaming_heavy_hitters

    rows = (
        [("g1", "hot") for _ in range(60)]
        + [("g1", f"cold{i}") for i in range(100)]
        + [("g2", "other") for _ in range(40)]
        + [("g2", f"z{i}") for i in range(50)]
    )
    df = spark.createDataFrame(rows, ["grp", "k"])
    tmp = tempfile.mkdtemp(prefix="stream_mg_")
    # several files -> several micro-batches with max_files=1
    df.repartition(4).write.mode("overwrite").parquet(tmp)

    stream = read_stream(spark, tmp, df.schema, max_files=1)
    out = streaming_heavy_hitters(stream, "grp", "k", k=16, emit_top=5)
    q = (
        out.writeStream.outputMode("update").format("memory")
        .queryName("mg_stream_t").start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    # last emission per group = rows from the final batch that touched it
    import collections

    final = spark.sql(
        "SELECT grp, key, cnt_lb, n FROM mg_stream_t"
    ).collect()
    # take the emission with the max n per group (the latest fold)
    best = {}
    for r in final:
        if r.grp not in best or r.n > best[r.grp][1]:
            best[r.grp] = ({}, r.n)
    for r in final:
        if r.n == best[r.grp][1]:
            best[r.grp][0][r.key] = r.cnt_lb
    g1, n1 = best["g1"]
    assert n1 == 160
    # MG bound: true(hot)=60, lb >= 60 - ceil(160/17)
    assert "hot" in g1 and g1["hot"] >= 60 - (160 // 17 + 1)
    g2, n2 = best["g2"]
    assert n2 == 90 and "other" in g2
    assert g2["other"] >= 40 - (90 // 17 + 1)


def test_streaming_time_weighted_matches_batch(spark, tmp_path):
    """Multi-batch stateful TWAP replay == the batch operator, with
    state bounded by the user dimension."""
    from parkour_spark.operators.behavior import time_weighted_value
    from parkour_spark.streaming.windows import (
        read_stream,
        run_to_completion,
        streaming_time_weighted,
        write_time_ordered_replay,
    )

    ev = spark.createDataFrame(
        [
            (i, 1 + i % 3, f"2024-01-01 00:00:{i:02d}.25", float(i + 1))
            for i in range(30)
        ],
        "event_id long, user_id long, ts string, value double",
    ).withColumn("ts", F.col("ts").cast("timestamp_ntz"))
    path = str(tmp_path / "twa_replay")
    write_time_ordered_replay(ev, "ts", path, n_slices=5)
    stream = read_stream(spark, path, ev.schema, max_files=1)
    metrics = {}
    out = run_to_completion(
        streaming_time_weighted(stream), output_mode="update",
        metrics_out=metrics,
    )
    final = {
        r.user_id: (r.n_events, r.held_us, r.vsum_centi_us)
        for r in out.groupBy("user_id")
        .agg(F.max(F.struct("n_events", "held_us", "vsum_centi_us")).alias("f"))
        .select("user_id", "f.*")
        .collect()
    }
    batch = {
        r.user_id: (r.n_events, r.held_us, r.vsum_centi_us)
        for r in time_weighted_value(ev).collect()
    }
    assert final == batch
    assert len(metrics["progress"]) >= 3  # genuinely multi-batch
    assert metrics["max_state_rows"] == 3  # one state row per user
