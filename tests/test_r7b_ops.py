"""Round-7 second batch: contrastive pairs from dedup components,
percentile-rank normalization, streaming PSI drift monitor."""

import math

import pytest
from pyspark.sql import functions as F


# ------------------------------------------------------------------
# contrastive_pairs
# ------------------------------------------------------------------

def _survivors(spark):
    # component 1: docs 1,2,3 (best = 2); component 2: docs 4,5
    # (best = 5); singleton: 6
    rows = [
        (1, 10, 50, False),
        (2, 10, 90, True),
        (3, 10, 70, False),
        (4, 40, 80, True),
        (5, 40, 60, False),
        (6, 60, 99, True),
    ]
    return spark.createDataFrame(
        rows, "doc_id long, component long, quality_bp long, is_survivor boolean"
    )


def test_contrastive_pairs_anchor_every_nonsurvivor(spark):
    from parkour_spark.operators.graph import contrastive_pairs

    got = {
        (r.anchor_id, r.positive_id, r.component)
        for r in contrastive_pairs(_survivors(spark)).collect()
    }
    assert got == {(1, 2, 10), (3, 2, 10), (5, 4, 40)}


def test_contrastive_pairs_singletons_contribute_nothing(spark):
    from parkour_spark.operators.graph import contrastive_pairs

    anchors = [r.anchor_id for r in contrastive_pairs(_survivors(spark)).collect()]
    assert 6 not in anchors


def test_contrastive_pairs_end_to_end_from_dedup(spark):
    from parkour_spark.operators.dedup import minhash_dedup_pairs
    from parkour_spark.operators.graph import contrastive_pairs, dedup_survivors_by

    base = "the quick brown fox jumps over the lazy dog again and again"
    docs = spark.createDataFrame(
        [
            (1, base + " alpha"),
            (2, base + " beta"),
            (3, "completely different text about spark partitions and shuffles"),
        ],
        "doc_id long, text string",
    )
    pairs = minhash_dedup_pairs(docs, threshold=0.5)
    scored = docs.select(
        "doc_id", (F.length("text")).cast("long").alias("quality")
    )
    out = contrastive_pairs(
        dedup_survivors_by(scored, pairs, "doc_id", "quality")
    ).collect()
    # docs 1 and 2 are near-dups; doc 2's text sorts after but scores
    # equal length? lengths differ: " alpha"=6 vs " beta"=5 -> doc 1 best
    assert {(r.anchor_id, r.positive_id) for r in out} == {(2, 1)}


# ------------------------------------------------------------------
# percentile_rank_bp
# ------------------------------------------------------------------

def test_percentile_rank_bp_values(spark):
    from parkour_spark.operators.validate import percentile_rank_bp

    df = spark.createDataFrame(
        [(i, s) for i, s in enumerate([10, 10, 20, 30])], "id long, s long"
    )
    got = {r.id: r.percentile_bp for r in percentile_rank_bp(df, "s").collect()}
    # cum: 10->2, 20->3, 30->4 of n=4
    assert got == {0: 5000, 1: 5000, 2: 7500, 3: 10000}


def test_percentile_rank_bp_null_passthrough_and_plan(spark):
    from parkour_spark.operators.validate import percentile_rank_bp

    df = spark.createDataFrame([(0, None), (1, 5)], "id long, s long")
    out = percentile_rank_bp(df, "s")
    got = {r.id: r.percentile_bp for r in out.collect()}
    assert got == {0: None, 1: 10000}
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "row_number" not in plan
    assert "BroadcastHashJoin" in plan or "BroadcastNestedLoopJoin" in plan


# ------------------------------------------------------------------
# streaming PSI monitor
# ------------------------------------------------------------------

def _replayed(spark, tmp_path, values_by_slice):
    import datetime

    rows = []
    t0 = datetime.datetime(2024, 1, 1)
    i = 0
    for vals in values_by_slice:
        for v in vals:
            rows.append((i, t0 + datetime.timedelta(seconds=i), float(v)))
            i += 1
    df = spark.createDataFrame(rows, "event_id long, ts timestamp, value double")
    from parkour_spark.streaming.windows import write_time_ordered_replay

    path = str(tmp_path / "psi_replay")
    write_time_ordered_replay(
        df, ["ts", "event_id"], path, n_slices=len(values_by_slice),
        slice_col="slice_id",
    )
    return path, spark.read.parquet(path).schema


def test_streaming_psi_flags_drifted_slice(spark, tmp_path):
    from parkour_spark.streaming.windows import streaming_psi_monitor

    # reference: uniform over [0, 10); slice 1 matches, slice 2 is all
    # mass at the top bucket — drifted
    ref = {b: 10 for b in range(10)}
    path, schema = _replayed(
        spark, tmp_path,
        [[b + 0.5 for b in range(10)] * 2, [9.5] * 20],
    )
    rows = {
        r.slice_id: r.psi_micro
        for r in streaming_psi_monitor(
            spark, path, schema, ref, "value", 0.0, 10.0, 10
        ).collect()
    }
    assert set(rows) == {1, 2}
    assert rows[1] == 0  # identical shape to reference
    assert rows[2] > 500_000  # way past the 0.25 action threshold


def test_streaming_psi_matches_batch_psi_stat(spark, tmp_path):
    from parkour_spark.operators.validate import histogram, psi_stat
    from parkour_spark.streaming.windows import streaming_psi_monitor

    vals_a = [1.0, 2.0, 2.0, 7.0, 8.0] * 4
    vals_b = [0.5, 0.5, 3.0, 9.0] * 5
    ref_vals = [float(v % 10) for v in range(40)]
    ref_df = spark.createDataFrame([(v,) for v in ref_vals], "value double")
    ref = {
        r["bucket"]: r["n"]
        for r in histogram(ref_df, "value", 0.0, 10.0, 10).collect()
    }
    path, schema = _replayed(spark, tmp_path, [vals_a, vals_b])
    got = {
        r.slice_id: r.psi_micro
        for r in streaming_psi_monitor(
            spark, path, schema, ref, "value", 0.0, 10.0, 10
        ).collect()
    }
    for sid, vals in ((1, vals_a), (2, vals_b)):
        batch_df = spark.createDataFrame([(v,) for v in vals], "value double")
        want = psi_stat(batch_df, ref_df, "value", 0.0, 10.0, 10).collect()[0]
        assert got[sid] == want["psi_micro"], sid


def test_streaming_psi_rejects_slice_bleed(spark, tmp_path):
    from parkour_spark.streaming.windows import streaming_psi_monitor

    path, schema = _replayed(spark, tmp_path, [[1.0] * 5, [2.0] * 5])
    with pytest.raises(Exception, match="slice bleed"):
        # max_files=2 pulls both slice files into one micro-batch
        streaming_psi_monitor(
            spark, path, schema, {0: 1}, "value", 0.0, 10.0, 10, max_files=2
        ).collect()


def test_replay_writer_keeps_slice_column(spark, tmp_path):
    from parkour_spark.streaming.windows import write_time_ordered_replay

    df = spark.range(12).select(
        F.col("id").alias("event_id"),
        F.timestamp_seconds(F.col("id")).alias("ts"),
    )
    path = str(tmp_path / "slices")
    write_time_ordered_replay(df, ["ts", "event_id"], path, 3, slice_col="slice_id")
    back = spark.read.parquet(path)
    counts = {
        r.slice_id: r.n
        for r in back.groupBy("slice_id").agg(F.count("*").alias("n")).collect()
    }
    assert counts == {1: 4, 2: 4, 3: 4}
    # slices are contiguous in event time
    spans = back.groupBy("slice_id").agg(
        F.min("event_id").alias("lo"), F.max("event_id").alias("hi")
    ).collect()
    spans = sorted((r.slice_id, r.lo, r.hi) for r in spans)
    assert spans == [(1, 0, 3), (2, 4, 7), (3, 8, 11)]


# ------------------------------------------------------------------
# streaming covariance cells
# ------------------------------------------------------------------

def test_streaming_covariance_equals_batch(spark, tmp_path):
    import numpy as np

    from parkour_spark.operators.pca import covariance_cells
    from parkour_spark.streaming.windows import streaming_covariance_cells

    rng = np.random.default_rng(11)
    x = rng.normal(size=(30, 4)).astype(np.float32)
    df = spark.createDataFrame(
        [(i, [float(v) for v in row]) for i, row in enumerate(x)],
        "vec_id long, embedding array<float>",
    )
    path = str(tmp_path / "cov_stream")
    df.repartition(3).write.mode("overwrite").parquet(path)
    want = {
        (r.i, r.j): r.s for r in covariance_cells(df, "embedding").collect()
    }
    got = {
        (r.i, r.j): r.s
        for r in streaming_covariance_cells(
            spark, path, spark.read.parquet(path).schema, "embedding"
        ).collect()
    }
    assert got == want


# ------------------------------------------------------------------
# perceptual dHash
# ------------------------------------------------------------------

def _ppm(pixels):
    # pixels: 8 rows x 9 cols of (r, g, b)
    flat = bytearray()
    for row in pixels:
        for (r, g, b) in row:
            flat += bytes([r, g, b])
    return b"P6 9 8 255\n" + bytes(flat)


def test_dhash64_matches_hand_bits():
    from parkour_spark.operators.imagecodec import dhash64

    # gray strictly increasing along each row -> every gradient bit 1
    pixels = [[(c * 20, c * 20, c * 20) for c in range(9)] for _ in range(8)]
    assert dhash64(_ppm(pixels)) == -1  # all 64 bits set, signed
    # strictly decreasing -> all bits 0
    pixels = [[(200 - c * 20,) * 3 for c in range(9)] for _ in range(8)]
    assert dhash64(_ppm(pixels)) == 0


def test_dhash64_stable_under_upscale():
    from parkour_spark.operators.imagecodec import (
        dhash64, decode_image, encode_png, resize_bilinear,
    )

    import numpy as np

    rng = np.random.default_rng(3)
    img = rng.integers(0, 256, size=(8, 9, 3), dtype=np.uint8)
    base = _ppm([[tuple(int(v) for v in img[r, c]) for c in range(9)] for r in range(8)])
    up = encode_png(resize_bilinear(decode_image(base), 36, 32))
    h0, h1 = dhash64(base), dhash64(up)
    ham = bin((h0 ^ h1) & (2**64 - 1)).count("1")
    assert ham <= 8  # perceptually identical content stays close


def test_perceptual_dhash_fallback_is_deterministic(spark):
    from parkour_spark.operators.multimodal import perceptual_dhash

    blobs = spark.createDataFrame(
        [(1, b"not an image"), (2, b"not an image"), (3, None)],
        "media_id long, payload binary",
    )
    rows = {r.media_id: (r.dhash, r.decodable) for r in perceptual_dhash(blobs).collect()}
    assert rows[1] == rows[2]  # same bytes, same stand-in hash
    assert not rows[1][1] and not rows[3][1]
    assert rows[3][0] is not None


def test_dhash_near_dup_finds_planted_and_no_join_in_plan(spark):
    from parkour_spark.operators.multimodal import dhash_near_dup

    # 0/1 differ in 2 bits; 2 shares a band with nothing within radius
    h0 = 0x1111_2222_3333_4444
    h1 = h0 ^ 0b11  # hamming 2
    h2 = 0x1111_9999_AAAA_CCCC  # shares band 3 (0x1111) with h0/h1, ham >> 8
    hashes = spark.createDataFrame(
        [(0, h0), (1, h1), (2, h2)], "media_id long, dhash long"
    )
    out = dhash_near_dup(hashes, max_hamming=8, bands=4)
    assert {(r.id_a, r.id_b, r.hamming) for r in out.collect()} == {(0, 1, 2)}
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "SortMergeJoin" not in plan and "Cartesian" not in plan, plan


# ------------------------------------------------------------------
# audio fingerprint
# ------------------------------------------------------------------

def _wav(samples, rate=8000):
    import struct

    pcm = struct.pack(f"<{len(samples)}h", *samples)
    fmt = struct.pack("<HHIIHH", 1, 1, rate, rate * 2, 2, 16)
    body = (b"WAVE" + b"fmt " + struct.pack("<I", len(fmt)) + fmt
            + b"data" + struct.pack("<I", len(pcm)) + pcm)
    return b"RIFF" + struct.pack("<I", len(body)) + body


def test_energy_fingerprint_monotone_contours():
    from parkour_spark.operators.audiocodec import energy_fingerprint64

    # strictly rising loudness -> every delta bit 1; falling -> 0
    rising = [((f * 100) + 50) * s for f in range(65) for s in ([1, -1] * 5)]
    falling = [(6500 - f * 100 + 50) * s for f in range(65) for s in ([1, -1] * 5)]
    assert energy_fingerprint64(_wav(rising)) == -1
    assert energy_fingerprint64(_wav(falling)) == 0


def test_energy_fingerprint_gain_invariant_ordering():
    from parkour_spark.operators.audiocodec import energy_fingerprint64

    import numpy as np

    rng = np.random.default_rng(5)
    base = rng.integers(-8000, 8000, size=650).tolist()
    doubled = [max(-32768, min(32767, 2 * v)) for v in base]
    # a clean 2x gain preserves every energy ordering -> same bits
    assert energy_fingerprint64(_wav(base)) == energy_fingerprint64(_wav(doubled))


def test_audio_fingerprint_fallback_and_near_dup_reuse(spark):
    from parkour_spark.operators.multimodal import audio_fingerprint, dhash_near_dup

    import numpy as np

    rng = np.random.default_rng(9)
    base = rng.integers(-8000, 8000, size=650).tolist()
    tweaked = list(base)
    tweaked[7] += 5  # tiny edit: energies barely move
    blobs = spark.createDataFrame(
        [(1, _wav(base)), (2, _wav(tweaked)), (3, b"mp3 junk")],
        "media_id long, payload binary",
    )
    fps = audio_fingerprint(blobs)
    rows = {r.media_id: (r.afp, r.decodable) for r in fps.collect()}
    assert rows[1][1] and rows[2][1] and not rows[3][1]
    pairs = dhash_near_dup(
        fps.select("media_id", F.col("afp").alias("dhash")),
        max_hamming=8, bands=4,
    ).collect()
    assert {(r.id_a, r.id_b) for r in pairs} == {(1, 2)}


# ------------------------------------------------------------------
# component-safe split (near-dup leakage)
# ------------------------------------------------------------------

def test_component_safe_split_keeps_dups_together(spark, sf_dir):
    from parkour_spark.queries import QUERIES
    from parkour_spark.operators.dedup import minhash_dedup_pairs
    from parkour_spark.operators.graph import connected_components
    from parkour_spark.functions.sampling import split_assign
    from parkour_spark.dataset import load_table

    docs = load_table(spark, sf_dir, "documents")
    pairs = minhash_dedup_pairs(docs, threshold=0.8)
    cc = connected_components(docs.select("doc_id"), pairs, "doc_id")
    split = split_assign(
        F.col("component").cast("string"),
        {"train": 0.8, "val": 0.1, "test": 0.1},
    )
    per_comp = (
        cc.select(F.col("component"), split.alias("split"))
        .groupBy("component")
        .agg(F.countDistinct("split").alias("n_splits"))
        .agg(F.max("n_splits").alias("mx"))
        .collect()[0]["mx"]
    )
    assert per_comp == 1  # no component straddles a split boundary
    # and the registry entry's totals cover every doc exactly once
    out = QUERIES["component_safe_split_counts"](spark, sf_dir).collect()
    assert sum(r.n_docs for r in out) == docs.count()


# ------------------------------------------------------------------
# join-size preflight
# ------------------------------------------------------------------

def test_join_size_preflight_exact_cardinality(spark):
    from parkour_spark.operators.validate import join_size_preflight

    a = spark.createDataFrame(
        [(1,), (1,), (2,), (3,)], "k long"
    )
    b = spark.createDataFrame(
        [(1,), (1,), (1,), (3,), (9,)], "k long"
    )
    row = join_size_preflight(a, "k", b, "k").collect()[0]
    # key 1: 2*3=6, key 3: 1*1=1; key 2/9 unmatched
    assert (row.n_a, row.n_b) == (4, 5)
    assert (row.matched_keys, row.join_rows, row.max_key_rows) == (2, 7, 6)
    assert row.top_keys == "1:6,3:1"
    # exactness: matches the actual join
    assert a.join(b, "k").count() == row.join_rows


def test_join_size_preflight_disjoint_keys(spark):
    from parkour_spark.operators.validate import join_size_preflight

    a = spark.createDataFrame([(1,)], "k long")
    b = spark.createDataFrame([(2,)], "k long")
    row = join_size_preflight(a, "k", b, "k").collect()[0]
    assert (row.matched_keys, row.join_rows, row.max_key_rows) == (0, 0, 0)
    assert row.top_keys == ""


# ------------------------------------------------------------------
# equal-frequency binning + target encoding
# ------------------------------------------------------------------

def test_quantile_bounds_and_equifreq_bins(spark):
    from parkour_spark.operators.validate import equifreq_bins, quantile_bounds

    df = spark.createDataFrame([(float(i),) for i in range(1, 101)], "v double")
    row = quantile_bounds(df, "v", [0.25, 0.5, 0.975]).collect()[0]
    assert (row["q_25"], row["q_50"], row["q_97_5"]) == (25.0, 50.0, 98.0)
    out = equifreq_bins(df, "v", 4)
    counts = {
        r.bin: r.n for r in
        out.groupBy("bin").agg(F.count("*").alias("n")).collect()
    }
    assert counts == {0: 25, 1: 25, 2: 25, 3: 25}


def test_equifreq_bins_ties_share_a_bin_and_nulls_pass(spark):
    from parkour_spark.operators.validate import equifreq_bins

    df = spark.createDataFrame(
        [(1.0,)] * 90 + [(2.0,)] * 10 + [(None,)], "v double"
    )
    rows = equifreq_bins(df, "v", 10).collect()
    bins = {r.v: r.bin for r in rows}
    assert bins[1.0] == 0 and bins[2.0] == 9 and bins[None] is None


def test_target_encoding_shrinks_rare_categories(spark):
    from parkour_spark.operators.validate import target_encoding

    rows = [("common", 10.0)] * 100 + [("rare", 1000.0)]
    df = spark.createDataFrame(rows, "k string, v double")
    out = {r.key: r for r in target_encoding(df, "k", "v", m=20).collect()}
    prior = (100 * 10_000_000 + 1_000_000_000) / 101
    want_rare = round((1_000_000_000 + 20 * prior) / 21)
    want_common = round((1_000_000_000 + 20 * prior) / 120)
    assert out["rare"].enc_micro == want_rare
    assert out["common"].enc_micro == want_common
    # shrinkage pulls BOTH toward the prior, the rare one much harder:
    # rare moves ~68% of the way from its raw mean to the prior, the
    # common one ~17%
    raw_rare, raw_common = 1_000_000_000, 10_000_000
    assert abs(out["rare"].enc_micro - prior) < abs(raw_rare - prior) / 2
    assert abs(out["common"].enc_micro - raw_common) < abs(prior - raw_common) / 4


# ------------------------------------------------------------------
# minhash index append
# ------------------------------------------------------------------

def test_minhash_index_append_equals_combined_build(spark, tmp_path):
    from parkour_spark.operators.dedup import (
        minhash_index_append, minhash_index_build,
    )

    texts = [
        (i, f"doc number {i} about spark shuffles and partitions topic {i % 4}")
        for i in range(30)
    ]
    docs = spark.createDataFrame(texts, "doc_id long, text string")
    a = docs.where(F.col("doc_id") < 20)
    b = docs.where(F.col("doc_id") >= 20)

    p_inc = str(tmp_path / "inc")
    minhash_index_build(a, p_inc, max_bucket=200)
    minhash_index_append(b, p_inc, max_bucket=200)
    p_full = str(tmp_path / "full")
    minhash_index_build(docs, p_full, max_bucket=200)

    for table in ("sigs", "bands"):
        inc = sorted(
            map(tuple, spark.read.parquet(f"{p_inc}/{table}").collect())
        )
        full = sorted(
            map(tuple, spark.read.parquet(f"{p_full}/{table}").collect())
        )
        assert inc == full, table


def test_minhash_index_append_reapplies_cap_globally(spark, tmp_path):
    from parkour_spark.operators.dedup import (
        minhash_index_append, minhash_index_build,
    )

    # identical texts share every band key; cap=3: ok at 3 members,
    # overfull (dropped) once the append pushes membership to 5
    same = "exactly the same boilerplate text shared by every document here"
    a = spark.createDataFrame(
        [(i, same) for i in range(3)], "doc_id long, text string"
    )
    b = spark.createDataFrame(
        [(i, same) for i in range(3, 5)], "doc_id long, text string"
    )
    path = str(tmp_path / "cap")
    minhash_index_build(a, path, max_bucket=3)
    assert spark.read.parquet(f"{path}/bands").count() > 0
    minhash_index_append(b, path, max_bucket=3)
    # all five docs share the buckets -> every bucket now overfull
    assert spark.read.parquet(f"{path}/bands").count() == 0
    # the signatures themselves are all retained
    assert spark.read.parquet(f"{path}/sigs").count() == 5


# ------------------------------------------------------------------
# round-7 self-review edge guards
# ------------------------------------------------------------------

def test_ndcg_no_positives_yields_null_not_div_by_zero(spark):
    from parkour_spark.operators.validate import ndcg_at_k

    df = spark.createDataFrame(
        [(i, 10 - i, False) for i in range(5)], "id long, s long, y boolean"
    )
    r = ndcg_at_k(df, "s", "y", "id", k=3).collect()[0]
    # Spark's sequence(1, 0) is the DESCENDING [1, 0]; without the
    # guard the r=0 term divides by log2(1) = 0
    assert r["n_pos"] == 0
    assert r["idcg_micro"] is None and r["ndcg"] is None
    assert r["dcg_micro"] == 0


def test_pca_components_empty_raises_clearly(spark):
    from parkour_spark.operators.pca import pca_components

    df = spark.createDataFrame([], "vec_id long, embedding array<float>")
    with pytest.raises(ValueError, match="at least 2 rows"):
        pca_components(df, "embedding")


def test_quantile_bounds_rejects_bad_qs(spark):
    from parkour_spark.operators.validate import equifreq_bins, quantile_bounds

    df = spark.createDataFrame([(1.0,)], "v double")
    with pytest.raises(ValueError, match="non-empty"):
        quantile_bounds(df, "v", [])
    with pytest.raises(ValueError, match="distinct"):
        quantile_bounds(df, "v", [0.5, 0.5])
    with pytest.raises(ValueError, match="n_bins"):
        equifreq_bins(df, "v", 1)


def test_percentile_rank_bp_rejects_column_clash(spark):
    from parkour_spark.operators.validate import percentile_rank_bp

    df = spark.createDataFrame([(1, 2)], "s long, percentile_bp long")
    with pytest.raises(ValueError, match="already"):
        percentile_rank_bp(df, "s")


def test_dhash_near_dup_rejects_non_divisor_bands(spark):
    from parkour_spark.operators.multimodal import dhash_near_dup

    hashes = spark.createDataFrame([(1, 7)], "media_id long, dhash long")
    with pytest.raises(ValueError, match="divide 64"):
        dhash_near_dup(hashes, bands=5)


def test_energy_fingerprint_rejects_bad_frames():
    from parkour_spark.operators.audiocodec import energy_fingerprint64

    with pytest.raises(ValueError, match="frames"):
        energy_fingerprint64(b"RIFF", frames=100)
