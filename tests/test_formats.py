"""Source/sink format coverage: parquet is the native interchange
(SURVEY §2.4); csv/tsv/json/orc/text round-trip through the same
Dataset/read_any surface. Avro (the reference's preferred format) is an
external Spark module not shipped here — the reader is gated and the
gating behavior itself is tested."""

import pytest
from pyspark.sql import functions as F

from parkour_spark.sources.readers import read_any

ROWS = [(1, "alpha", 1.5), (2, "beta", -3.0), (3, "gamma", 0.25)]
SCHEMA = "id long, name string, score double"


@pytest.fixture(scope="module")
def df(spark):
    return spark.createDataFrame(ROWS, SCHEMA)


def _roundtrip(spark, df, path, fmt, **opts):
    df.write.mode("overwrite").format(fmt).options(**opts).save(path)
    back = read_any(spark, path, fmt=fmt, **opts)
    return back


def test_parquet_roundtrip(spark, df, tmp_path):
    back = _roundtrip(spark, df, str(tmp_path / "p"), "parquet")
    assert sorted(map(tuple, back.collect())) == ROWS


def test_orc_roundtrip(spark, df, tmp_path):
    back = _roundtrip(spark, df, str(tmp_path / "o"), "orc")
    assert sorted(map(tuple, back.collect())) == ROWS


def test_json_roundtrip(spark, df, tmp_path):
    back = _roundtrip(spark, df, str(tmp_path / "j"), "json")
    back = back.select("id", "name", "score")  # json loses column order
    assert sorted(map(tuple, back.collect())) == ROWS


def test_tsv_roundtrip(spark, df, tmp_path):
    """TAB-separated text — the reference's text/dsink shape
    (io/text.clj:22-35)."""
    path = str(tmp_path / "t")
    df.write.mode("overwrite").options(sep="\t", header="true").csv(path)
    back = (
        read_any(spark, path, fmt="csv", sep="\t", header="true", inferSchema="true")
        .select("id", "name", "score")
    )
    assert sorted(map(tuple, back.collect())) == ROWS


def test_text_lines_roundtrip(spark, tmp_path):
    path = str(tmp_path / "lines")
    spark.createDataFrame([("one",), ("two",)], "value string").write.mode(
        "overwrite"
    ).text(path)
    back = read_any(spark, path, fmt="text")
    assert sorted(r["value"] for r in back.collect()) == ["one", "two"]


def test_avro_gated(spark, df, tmp_path):
    """spark-avro is an external module; absent here. A deployment adds
    --packages org.apache.spark:spark-avro and read_any(fmt='avro')
    works unchanged — meanwhile the failure is a clean AnalysisException,
    not a crash."""
    from pyspark.errors import AnalysisException

    with pytest.raises(AnalysisException, match="avro"):
        df.write.mode("overwrite").format("avro").save(str(tmp_path / "a"))
