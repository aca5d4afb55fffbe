"""File-backed side inputs (dcpath/load-dval analog) and error-path
parity: the reference asserts task exceptions propagate with their cause
(test/parkour/graph_test.clj:197-210) and that nil/empty inputs behave
(graph_test.clj:184-195)."""

import pandas as pd
import pytest
from pyspark.sql import functions as F, types as T

from parkour_spark.operators.agg import apply_grouped
from parkour_spark.plans.pipeline import Pipeline
from parkour_spark.sources.dval import dcpath, load_dval, read_dval_file


# ---------------------------------------------------------------------------
# File-backed dvals
# ---------------------------------------------------------------------------


def test_dcpath_file_readable_inside_task(spark, tmp_path):
    p = tmp_path / "stopwords.txt"
    p.write_text("the\na\nan\n")
    name = dcpath(spark, str(p))

    def strip_stopwords(pdf_iter):
        with read_dval_file(name) as fh:
            stop = set(fh.read().split())
        for pdf in pdf_iter:
            out = pdf[~pdf["w"].isin(stop)]
            yield out

    df = spark.createDataFrame([("the",), ("quick",), ("a",), ("fox",)], ["w"])
    got = sorted(
        r["w"]
        for r in df.mapInPandas(
            strip_stopwords, schema=T.StructType([T.StructField("w", T.StringType())])
        ).collect()
    )
    assert got == ["fox", "quick"]


def test_load_dval_lazy_parse_in_udf_closure(spark, tmp_path):
    p = tmp_path / "weights.tsv"
    p.write_text("a\t2\nb\t3\n")
    weights = load_dval(
        spark,
        str(p),
        lambda path: {
            k: int(v) for k, v in (ln.split("\t") for ln in open(path).read().splitlines())
        },
    )

    def apply_weights(pdf_iter):
        w = weights()  # parsed from the executor-local copy, once
        for pdf in pdf_iter:
            yield pd.DataFrame({"k": pdf["k"], "scaled": [w[k] * x for k, x in zip(pdf["k"], pdf["x"])]})

    df = spark.createDataFrame([("a", 10), ("b", 10)], ["k", "x"])
    schema = T.StructType(
        [T.StructField("k", T.StringType()), T.StructField("scaled", T.LongType())]
    )
    got = {r["k"]: r["scaled"] for r in df.mapInPandas(apply_weights, schema=schema).collect()}
    assert got == {"a": 20, "b": 30}


# ---------------------------------------------------------------------------
# Error-path parity
# ---------------------------------------------------------------------------


def test_failing_udf_propagates_cause(spark):
    """A task-side exception must surface to the driver with its message
    (reference: graph_test.clj:197-210 asserts the cause chain)."""

    def boom(key, pdf):
        raise RuntimeError("dedup exploded on purpose")

    df = spark.createDataFrame([(1, 2.0), (1, 3.0)], ["k", "v"])
    schema = T.StructType(
        [T.StructField("k", T.LongType()), T.StructField("v", T.DoubleType())]
    )
    with pytest.raises(Exception, match="dedup exploded on purpose"):
        apply_grouped(df, ["k"], boom, schema).collect()


def test_failing_pipeline_map_propagates(spark):
    def bad(df):
        return df.select(F.col("does_not_exist"))

    df = spark.createDataFrame([(1,)], ["k"])
    with pytest.raises(Exception, match="does_not_exist|UNRESOLVED_COLUMN"):
        Pipeline.input(df).map(bad).collect()


def test_empty_input_flows_through(spark):
    """Empty inputs produce empty (not failing) outputs across grouped
    agg, window, and the dedup family (graph_test.clj:184-195)."""
    from parkour_spark.operators.dedup import exact_dedup, minhash_dedup_pairs

    empty = spark.createDataFrame([], "doc_id long, text string")
    assert exact_dedup(empty).count() == 0
    assert minhash_dedup_pairs(empty).count() == 0
    agg = empty.groupBy("text").agg(F.count("*").alias("n"))
    assert agg.count() == 0


def test_null_text_documents_survive_dedup(spark):
    df = spark.createDataFrame(
        [(1, None), (2, "hello world"), (3, "hello world")],
        "doc_id long, text string",
    )
    from parkour_spark.operators.dedup import exact_dedup

    out = {r["keep_id"]: r["n_dups"] for r in exact_dedup(df).collect()}
    assert out[2] == 2  # the two identical docs collapse
    assert 1 in out  # the null-text doc neither crashes nor merges
