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
