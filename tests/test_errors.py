"""Error-path parity with the reference's task-failure semantics
(/root/reference/test/parkour/graph_test.clj:184-210): a failing task
function must surface through the Pipeline's terminal action as a
Python exception CARRYING THE ORIGINAL CAUSE MESSAGE (the reference
asserts `.getCause ex-data` round-trips through job submission), and
degenerate inputs (missing path, empty source) must fail — or no-op —
cleanly."""

import tempfile

import pytest
from pyspark.sql import functions as F
from pyspark.errors.exceptions.captured import AnalysisException, PythonException

from parkour_spark.dataset import Dataset
from parkour_spark.plans.pipeline import Pipeline, execute


def _make_bad_batch():
    # defined inside a function so cloudpickle serializes it BY VALUE:
    # a module-level fn in tests/ pickles by reference and the worker
    # can't import the test module
    def bad_batch(batches):
        raise RuntimeError("Exception expected: from-task")
        yield  # pragma: no cover — marks this as a generator

    return bad_batch


def test_map_pandas_task_exception_carries_cause(spark):
    """bad-mapper analog (graph_test.clj:198-210): the task function's
    own message must ride the exception the driver raises."""
    p = (
        Pipeline.input(spark.createDataFrame([(1,), (2,)], ["x"]))
        .map_pandas(_make_bad_batch(), "x long")
    )
    with pytest.raises(PythonException, match="Exception expected: from-task"):
        p.collect()


def test_reduce_apply_task_exception_carries_cause(spark):
    def bad_group(pdf):
        raise ValueError("Exception expected: from-reducer")

    p = (
        Pipeline.input(spark.createDataFrame([(1, 2), (1, 3)], ["k", "v"]))
        .reduce_apply(["k"], bad_group, "k long, v long")
    )
    with pytest.raises(PythonException, match="Exception expected: from-reducer"):
        p.collect()


def test_task_exception_through_output(spark):
    """The write path (pg/output analog) must propagate task failures
    identically to collect() — and leave no committed output behind."""
    import os

    out = tempfile.mkdtemp(prefix="t_err_out_") + "/sink"
    p = (
        Pipeline.input(spark.createDataFrame([(1,), (2,)], ["x"]))
        .map_pandas(_make_bad_batch(), "x long")
    )
    with pytest.raises(PythonException, match="Exception expected: from-task"):
        p.output(Dataset(spark, path=out))
    assert not os.path.exists(os.path.join(out, "_SUCCESS"))


def test_missing_input_path_fails_cleanly(spark):
    """Reading a nonexistent path must raise AnalysisException naming
    the path — not surface later as an opaque executor error."""
    ds = Dataset(spark, path="/nonexistent/parkour/input")
    with pytest.raises(AnalysisException, match="nonexistent"):
        Pipeline.input(ds).map(lambda df: df.select("*")).collect()


def test_pathless_dataset_read_errors(spark):
    with pytest.raises(ValueError, match="neither"):
        Dataset(spark).read()


def test_empty_source_runs_cleanly(spark):
    """noop-input-graph analog (graph_test.clj:212+): an empty source
    flows through map/reduce stages and yields an empty result, not an
    error."""
    empty = spark.createDataFrame([], "x long")
    p = (
        Pipeline.input(empty)
        .map(lambda df: df.where(F.col("x") > 0))
        .reduce(["x"], F.count("*").alias("n"))
    )
    assert p.collect() == []


def test_execute_propagates_leaf_failure(spark):
    """pg/execute over parallel leaves: one failing leaf must raise in
    the caller with its cause, not be swallowed by the thread pool."""
    good = Pipeline.input(spark.createDataFrame([(1,)], ["x"]))
    bad = (
        Pipeline.input(spark.createDataFrame([(1,)], ["x"]))
        .map_pandas(_make_bad_batch(), "x long")
    )
    with pytest.raises(PythonException, match="Exception expected: from-task"):
        execute(good, bad)
