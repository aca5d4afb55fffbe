"""File-level Arrow compaction (r12, r11 verdict #5): the per-cell
concat fold behind ivf/ivfpq_index_compact — row identity across
build+append and streaming layouts, canonical one-file-per-cell
output, and the honest fallbacks."""

from pyspark.sql import functions as F

from parkour_spark import fs as pfs
from parkour_spark.operators.indexcommon import arrow_concat_partition_tree


def _write_partitioned(spark, rows, dest, extra_part=None):
    df = spark.createDataFrame(rows, "vec_id long, v double, cell long")
    w = df.repartition("cell").write.mode("append")
    if extra_part is not None:
        df = df.withColumn("batch", F.lit(extra_part))
        w = (
            df.repartition("cell")
            .write.mode("append")
            .partitionBy("batch", "cell")
        )
        w.parquet(dest)
        return
    w.partitionBy("cell").parquet(dest)


def _rows(df):
    return sorted((r.vec_id, r.v, r.cell) for r in df.collect())


def test_arrow_fold_build_plus_appends_row_identity(spark, tmp_path):
    src = str(tmp_path / "src")
    dest = str(tmp_path / "dest")
    rows = [(i, float(i) * 0.5, i % 3) for i in range(30)]
    _write_partitioned(spark, rows[:20], src)
    _write_partitioned(spark, rows[20:], src)  # append: 2 file sets/cell
    stored = spark.read.parquet(src)
    assert arrow_concat_partition_tree(
        spark, stored.inputFiles(), "cell", dest
    )
    out = spark.read.parquet(dest)
    assert _rows(out) == _rows(stored)
    # canonical layout: exactly one data file per cell
    for c in (0, 1, 2):
        files = [
            p
            for p in pfs.glob_paths(spark, f"{dest}/cell={c}/*")
            if p.endswith(".parquet")
        ]
        assert len(files) == 1, files


def test_arrow_fold_drops_streaming_batch_level(spark, tmp_path):
    """batch=N/cell=C trees fold to cell=C — the batch level is
    directory-encoded, so the file-level concat erases it exactly as
    the Spark column selection did."""
    src = str(tmp_path / "src")
    dest = str(tmp_path / "dest")
    rows = [(i, float(i), i % 2) for i in range(20)]
    _write_partitioned(spark, rows[:10], src, extra_part=0)
    _write_partitioned(spark, rows[10:], src, extra_part=1)
    stored = spark.read.parquet(src)
    assert "batch" in stored.columns
    assert arrow_concat_partition_tree(
        spark, stored.inputFiles(), "cell", dest
    )
    out = spark.read.parquet(dest)
    assert "batch" not in out.columns
    assert _rows(out) == _rows(stored.drop("batch"))


def test_arrow_fold_refuses_unpartitioned_layout(spark, tmp_path):
    src = str(tmp_path / "src")
    spark.createDataFrame(
        [(1, 1.0, 0)], "vec_id long, v double, cell long"
    ).write.parquet(src)
    stored = spark.read.parquet(src)
    assert not arrow_concat_partition_tree(
        spark, stored.inputFiles(), "cell", str(tmp_path / "dest")
    )
    assert not pfs.exists(spark, str(tmp_path / "dest"))


def test_ivf_compact_arrow_path_identity_after_streaming(spark, tmp_path):
    """End-to-end: ivf build + appends → compact (Arrow path) keeps
    every row and the probe contract (covered more broadly by the r10
    compaction identity suite, rerun green under the Arrow fold)."""
    import numpy as np

    from parkour_spark.operators.similarity import (
        ivf_index_build,
        ivf_index_append,
        ivf_index_compact,
    )

    rng = np.random.default_rng(3)
    d, k = 8, 4
    cents = [(i, rng.normal(size=d).tolist()) for i in range(k)]
    base = spark.createDataFrame(
        [(i, rng.normal(size=d).tolist()) for i in range(40)],
        "vec_id long, embedding array<double>",
    )
    extra = spark.createDataFrame(
        [(100 + i, rng.normal(size=d).tolist()) for i in range(10)],
        "vec_id long, embedding array<double>",
    )
    idx = str(tmp_path / "ivf")
    ivf_index_build(base, cents, idx)
    ivf_index_append(extra, cents, idx)
    before = sorted(
        (r.vec_id, r.cell, round(r.cnorm, 9))
        for r in spark.read.parquet(idx).collect()
    )
    ivf_index_compact(spark, idx)
    after = sorted(
        (r.vec_id, r.cell, round(r.cnorm, 9))
        for r in spark.read.parquet(idx).collect()
    )
    assert before == after
    for c in {cell for _, cell, _ in before}:
        files = [
            p
            for p in pfs.glob_paths(spark, f"{idx}/cell={c}/*")
            if p.endswith(".parquet")
        ]
        assert len(files) == 1
