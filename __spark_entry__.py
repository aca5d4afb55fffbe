"""Driver contract for the spark-graft builder (PySpark target).

`entry(spark)` — flagship query smoke check on sf0.001.
`queries()` — name → (spark, sf_dir) → DataFrame, one per implemented
operator from SURVEY.md §2 (registry: parkour_spark/queries.py).
`oracle_sql()` — matching DuckDB SQL for the correctness gate.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from parkour_spark.queries import ORACLES, QUERIES


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: TPC-H-Q1-style pricing summary on sf0.001."""
    return QUERIES["q1_pricing_summary"](spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return dict(QUERIES)


def oracle_sql() -> dict[str, str]:
    return dict(ORACLES)
