"""fs utilities (reference fs.clj parity): glob, existence, sizing,
scoped temp dirs — all through Hadoop FS so they hold on any scheme."""

from parkour_spark import fs
from parkour_spark.dataset import Dataset


def test_glob_and_exists(spark, tmp_path):
    ds = Dataset(spark, str(tmp_path / "t1"))
    ds.write(spark.range(10))
    hits = fs.glob_paths(spark, str(tmp_path / "t1" / "*.parquet"))
    assert hits and all(h.endswith(".parquet") for h in hits)
    assert fs.exists(spark, str(tmp_path / "t1"))
    assert not fs.exists(spark, str(tmp_path / "nope"))
    assert fs.glob_paths(spark, str(tmp_path / "nope" / "*")) == []


def test_content_size_and_delete(spark, tmp_path):
    ds = Dataset(spark, str(tmp_path / "t2"))
    ds.write(spark.range(100))
    assert fs.content_size(spark, str(tmp_path / "t2")) > 0
    assert fs.delete(spark, str(tmp_path / "t2"))
    assert not fs.exists(spark, str(tmp_path / "t2"))


def test_temp_dir_scoped_cleanup(spark, tmp_path):
    with fs.temp_dir(spark, base=str(tmp_path / "scratch")) as p:
        Dataset(spark, p + "/out").write(spark.range(5))
        assert fs.exists(spark, p + "/out")
        kept = p
    assert not fs.exists(spark, kept)


def test_hash_sample_stable_under_repartitioning(spark):
    """Content-hash sampling: identical membership at any partition
    count (seeded sample() cannot promise this)."""
    from parkour_spark.functions.sampling import hash_sample, split_assign
    from pyspark.sql import functions as F

    df = spark.range(1000).select(F.col("id").alias("doc_id"))
    picks = [
        sorted(r["doc_id"] for r in hash_sample(df.repartition(p), "doc_id", 0.2).collect())
        for p in (1, 4, 13)
    ]
    assert picks[0] == picks[1] == picks[2]
    assert 100 < len(picks[0]) < 300  # ~20%

    splits = df.select(
        "doc_id", split_assign("doc_id", {"train": 0.8, "val": 0.1, "test": 0.1}).alias("s")
    )
    counts = {r["s"]: r["n"] for r in splits.groupBy("s").agg(F.count("*").alias("n")).collect()}
    assert set(counts) == {"train", "val", "test"}
    assert counts["train"] > counts["val"] and counts["train"] > counts["test"]
