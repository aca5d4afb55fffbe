"""Aggregation operators — grouped reduce, distinct, counters, top-k.

Reference patterns covered (SURVEY §2.6):
- combiner/partial aggregation (graph.clj:239-248) → Catalyst partial+final
  HashAggregate, automatic for every builtin agg used here.
- `ptb/keyvalgroups-r` generic grouped reduce (toolbox.clj:41-46)
  → `group_reduce` (builtin aggs) / `apply_grouped` (arbitrary fns).
- word count (examples/parkour/example/word_count.clj:9-22).
- distinct via `:keygroups` (test/parkour/word_count_test.clj:61-86).
- `pr/reduce-by` sort-aggregation (reducers.clj:35-53) → groupBy.agg.
- counters (mapreduce.clj:341-349) → `df.observe` / accumulators.

SCALE: every builtin agg here compiles to partial (map-side) + final
aggregation — the combiner the reference makes users write by hand is
free. `apply_grouped` is the arbitrary-function escape hatch; it shuffles
full rows, so prefer builtin aggs in the hot path.
"""

from __future__ import annotations

from typing import Callable, Sequence

from pyspark.sql import Column, DataFrame, Observation, functions as F

from parkour_spark.operators.sort import explode_fast


def group_reduce(df: DataFrame, keys: Sequence[str], *aggs: Column) -> DataFrame:
    """Grouped reduce with builtin (combiner-safe) aggregates.

    The Spark analog of attaching `pg/combine` + `pg/reduce`
    (graph.clj:239-258): partial aggregation happens map-side
    automatically, so this is the preferred 100 TB aggregation path.
    """
    return df.groupBy(*keys).agg(*aggs)


def apply_grouped(df: DataFrame, keys: Sequence[str], fn: Callable, schema) -> DataFrame:
    """Arbitrary per-group function (reduce task with `:keyvalgroups`
    shape, doc/mr-detailed.md:151-177). Arrow-batched; the group arrives
    as a pandas DataFrame.

    SCALE: a single group must fit in executor memory. For larger groups
    restructure as builtin aggs or window functions.
    """
    return df.groupBy(*keys).applyInPandas(fn, schema=schema)


def word_count(lines: DataFrame, text_col: str = "value") -> DataFrame:
    """The reference's canonical query
    (examples/parkour/example/word_count.clj:9-22): tokenize, explode,
    count per word. Filter drops empty tokens from leading/trailing
    whitespace."""
    words = explode_fast(
        lines, F.split(F.col(text_col), r"\s+"), "word"
    ).filter(F.col("word") != "")
    return words.groupBy("word").agg(F.count("*").alias("n"))


def distinct_keys(df: DataFrame, *cols: str) -> DataFrame:
    """Distinct via grouped keys (`:keygroups` reducer pattern,
    word_count_test.clj:61-86)."""
    return df.select(*cols).distinct() if cols else df.distinct()


def top_k(df: DataFrame, order: Sequence[Column], k: int) -> DataFrame:
    """Global top-k. Spark executes orderBy+limit as TakeOrderedAndProject
    — per-partition heaps + driver merge, no global sort shuffle."""
    return df.orderBy(*order).limit(k)


def top_k_per_group(df: DataFrame, keys: Sequence[str], order: Sequence[Column], k: int) -> DataFrame:
    """Top-k within each group via ranked window (single shuffle on keys)."""
    from pyspark.sql import Window

    w = Window.partitionBy(*keys).orderBy(*order)
    return (
        df.withColumn("__rank", F.row_number().over(w))
        .filter(F.col("__rank") <= k)
        .drop("__rank")
    )


def counted(df: DataFrame, name: str, *metrics: Column) -> tuple[DataFrame, Observation]:
    """Job counters (reference counters, mapreduce.clj:341-349;
    asserted in test/parkour/graph_test.clj:54-56). Metrics are collected
    as a side effect of the next action on the returned DataFrame."""
    obs = Observation(name)
    return df.observe(obs, *metrics), obs


def cooccurrence_pairs(
    df: DataFrame,
    group_col: str,
    item_col: str,
    min_count: int = 2,
    max_items_per_group: int | None = None,
) -> DataFrame:
    """Frequent co-occurrence mining (the market-basket / co-purchase /
    co-click primitive): unordered item pairs appearing together in at
    least `min_count` groups. Returns (item_a, item_b, n_groups) with
    item_a < item_b.

    SCALE: one group-keyed aggregate collects each group's DISTINCT
    item set (sorted — a deterministic array), pairs explode SCAN-SIDE
    from that array (fanout |items|²/2 per group — baskets are small by
    nature), and the pair partial-agg is the only other shuffle. No
    self-join. `max_items_per_group` is the df-cap analog for
    crawler/bot baskets: a group with more items than the cap is
    dropped whole (its pairs say nothing about preference and its
    quadratic fanout dominates everything), same discipline as the
    Jaccard df cap and source_overlap's group cap."""
    sets = (
        df.select(F.col(group_col).alias("__g"), F.col(item_col).alias("__i"))
        .groupBy("__g")
        .agg(F.array_sort(F.collect_set("__i")).alias("__is"))
    )
    if max_items_per_group is not None:
        sets = sets.where(F.size("__is") <= max_items_per_group)
    combos = F.expr(
        "flatten(transform(__is, (a, i) -> "
        "transform(slice(__is, i + 2, size(__is)), "
        "b -> struct(a AS item_a, b AS item_b))))"
    )
    return (
        sets.select(F.explode(combos).alias("__p"))
        .select(F.col("__p.item_a"), F.col("__p.item_b"))
        .groupBy("item_a", "item_b")
        .agg(F.count("*").cast("long").alias("n_groups"))
        .where(F.col("n_groups") >= min_count)
    )
