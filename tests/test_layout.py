"""Z-order layout (operators/layout.py): the clustering property that
drives file skipping, measured from parquet footers — the exact stats
any reader prunes with."""

import tempfile

import pytest
from pyspark.sql import functions as F

from parkour_spark.operators.layout import (
    files_hit_by_box,
    quantize,
    write_zordered,
    zorder_key,
)

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def li(spark):
    from parkour_spark.dataset import load_table

    return load_table(spark, SF_DIR, "lineitem")


def test_zorder_key_interleaves(spark):
    df = spark.createDataFrame([(0b101, 0b011)], "a long, b long")
    # a bits land at odd positions, b bits at even ones
    got = df.select(zorder_key("a", "b", bits=3).alias("z")).collect()[0]["z"]
    assert got == (1 << 5) | (1 << 1) | (1 << 2) | (1 << 0)


def test_quantize_clamps_and_bins(spark):
    df = spark.createDataFrame([(-5.0,), (0.0,), (99.9,), (250.0,)], "x double")
    vals = [
        r["q"] for r in df.select(quantize("x", 0.0, 100.0, bits=2).alias("q")).collect()
    ]
    assert vals == [0, 0, 3, 3]


def test_zorder_beats_single_dim_sort_on_other_dim(spark, li):
    # the claim that matters at 100 TB: after z-ordering on (p, s), a
    # box on s ALONE still prunes; a layout sorted only by p cannot.
    zdir = tempfile.mkdtemp(prefix="parkour_ztest_")
    sdir = tempfile.mkdtemp(prefix="parkour_stest_")
    # quantize BOTH dims to the same bit width first: interleaving raw
    # unbalanced widths (8-bit partkey vs 4-bit suppkey) degenerates to
    # a partkey sort — the z-key's top bits would all be partkey's
    cells = li.withColumn("__q1", quantize("l_partkey", 0, 199, bits=4)).withColumn(
        "__q2", quantize("l_suppkey", 0, 9, bits=4)
    )
    write_zordered(cells, zdir, "__q1", "__q2", bits=4, n_files=16)
    (
        li.repartitionByRange(16, "l_partkey")
        .sortWithinPartitions("l_partkey")
        .write.mode("overwrite")
        .parquet(sdir)
    )
    # suppkey domain at sf0.001 is 0..9; box = 2 of 10 values
    z_hit, z_total = files_hit_by_box(zdir, "l_partkey", 0, 10**9, "l_suppkey", 2, 3)
    s_hit, s_total = files_hit_by_box(sdir, "l_partkey", 0, 10**9, "l_suppkey", 2, 3)
    assert s_hit == s_total, (s_hit, s_total)  # 1-d sort: no pruning on s
    assert z_hit <= z_total // 2, (z_hit, z_total)  # z-order: most files skipped


def test_zorder_roundtrip_preserves_rows(spark, li):
    zdir = tempfile.mkdtemp(prefix="parkour_zrt_")
    write_zordered(li, zdir, "l_partkey", "l_suppkey", bits=8, n_files=8)
    back = spark.read.parquet(zdir)
    assert back.count() == li.count()
    a = li.groupBy().agg(F.sum("l_extendedprice").alias("s")).collect()[0]["s"]
    b = back.groupBy().agg(F.sum("l_extendedprice").alias("s")).collect()[0]["s"]
    assert abs(a - b) < 1e-6
    assert "__z" not in back.columns
