"""Job-graph pipeline API — the `parkour.graph` analog.

The reference builds a DAG of MapReduce jobs with
`(-> (pg/input dseq) (pg/map #'f) (pg/partition ...) (pg/combine #'c)
(pg/reduce #'r) (pg/output dsink) (pg/execute))`
(/root/reference/src/clojure/parkour/graph.clj:97-293,450-465).

Spark-first translation: a `Pipeline` wraps a DataFrame and mirrors the
staged API, but *stages compose lazily into one Catalyst plan* — there is
no per-stage job materialization unless `.output()` is called. `execute`
on multiple leaves runs independent actions concurrently (the reference
runs independent jobs via futures, graph.clj:21-31).
"""

from __future__ import annotations

from concurrent.futures import ThreadPoolExecutor
from typing import Callable, Sequence

from pyspark.sql import Column, DataFrame, SparkSession

from parkour_spark.dataset import Dataset


class Pipeline:
    """Fluent staged dataflow over a DataFrame. Each method returns a new
    Pipeline (immutable chaining, like the reference's node maps)."""

    def __init__(self, df: DataFrame):
        self.df = df
        self.metrics: dict | None = None

    # -- stage analogs -----------------------------------------------------
    @staticmethod
    def input(src: "DataFrame | Dataset") -> "Pipeline":
        """`pg/input` (graph.clj:97-109)."""
        return Pipeline(src.read() if isinstance(src, Dataset) else src)

    def map(self, fn: Callable[[DataFrame], DataFrame]) -> "Pipeline":
        """`pg/map` (graph.clj:157-178): any narrow transform — select /
        filter / withColumn / explode / mapInPandas. Receives and returns
        a DataFrame so Catalyst sees through it."""
        return Pipeline(fn(self.df))

    def map_pandas(self, fn: Callable, schema) -> "Pipeline":
        """Arbitrary per-batch map task (collfn adapter analog,
        mapreduce.clj:107-123) — Arrow-batched iterator of pandas frames."""
        return Pipeline(self.df.mapInPandas(fn, schema=schema))

    def partition(self, num: int | None = None, *exprs) -> "Pipeline":
        """`pg/partition` (graph.clj:200-237): explicit repartition. In
        Spark this is usually unnecessary (groupBy/join shuffle
        implicitly); exposed for co-location control."""
        df = self.df.repartition(num, *exprs) if num else self.df.repartition(*exprs)
        return Pipeline(df)

    def reduce(self, keys: Sequence[str], *aggs: Column) -> "Pipeline":
        """`pg/combine`+`pg/reduce` (graph.clj:239-258): builtin aggs get
        map-side partial aggregation automatically (the combiner)."""
        return Pipeline(self.df.groupBy(*keys).agg(*aggs))

    def reduce_apply(self, keys: Sequence[str], fn: Callable, schema) -> "Pipeline":
        """Arbitrary-function reduce task over grouped input
        (doc/mr-detailed.md:151-177)."""
        return Pipeline(self.df.groupBy(*keys).applyInPandas(fn, schema=schema))

    def sort(self, *order) -> "Pipeline":
        return Pipeline(self.df.orderBy(*order))

    def sql(self, query: str, name: str = "this", **views) -> "Pipeline":
        """Full-SQL stage (r7 verdict #7): run ANSI SQL with this
        pipeline's DataFrame registered as temp view `name` (default
        `this`) plus any keyword arguments — DataFrame, Dataset, or
        Pipeline — registered under their keyword. The SQL text becomes
        part of the SAME Catalyst plan as the fluent stages around it
        (views are metadata, not materialization), so
        `pipeline.sql("SELECT ... FROM this JOIN dim ...", dim=d)` is
        exactly as optimizable as the DataFrame spelling."""
        spark = self.df.sparkSession
        self.df.createOrReplaceTempView(name)
        for vname, v in views.items():
            if isinstance(v, Pipeline):
                v.df.createOrReplaceTempView(vname)
            elif isinstance(v, Dataset):
                v.read().createOrReplaceTempView(vname)
            else:
                v.createOrReplaceTempView(vname)
        return Pipeline(spark.sql(query))

    # -- materialization ---------------------------------------------------
    def output(self, sink: Dataset, mode: str = "overwrite", observe=None) -> "Pipeline":
        """`pg/output` (graph.clj:267-293): write, then *re-input* — the
        returned Pipeline reads back what was written, exactly the
        reference's dsink→dseq round-trip. Write-job counters
        (rows_written + any `observe` aggregates) surface on the
        returned Pipeline's `.metrics` (reference graph.clj:384-389)."""
        written = sink.write(self.df, mode=mode, observe=observe)
        out = Pipeline(written.read())
        out.metrics = written.metrics
        return out

    def collect(self) -> list:
        return self.df.collect()


def execute(*pipelines: Pipeline, max_workers: int = 4) -> list[list]:
    """`pg/execute` on a multi-leaf graph (graph.clj:450-465): run
    independent leaf actions concurrently (Spark's scheduler interleaves
    their stages; shared lineage is recomputed unless cached)."""
    with ThreadPoolExecutor(max_workers=max_workers) as pool:
        return list(pool.map(lambda p: p.collect(), pipelines))


def broadcast_value(spark: SparkSession, value):
    """dval analog (/root/reference/src/clojure/parkour/io/dval.clj:93-122):
    driver value → task-visible broadcast handle (`.value` task-side)."""
    return spark.sparkContext.broadcast(value)
