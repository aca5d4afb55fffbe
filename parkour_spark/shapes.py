"""The 9 tuple "shapes" — logical views over key/value datasets.

Reference: /root/reference/src/clojure/parkour/mapreduce/source.clj:318-397
(doc: /root/reference/doc/mr-detailed.md:151-177). Task functions there see
the shuffle stream reshaped as one of: `:keyvals :keys :vals :keygroups
:valgroups :keyvalgroups :keykeyvalgroups :keykeygroups :keysgroups`.

Spark-first mapping: each shape is a declarative DataFrame transform, so
Catalyst still sees the whole plan (pushdown, partial aggregation). The
grouped shapes use `collect_list`; `sort_array` makes group contents
deterministic (the reference's reduce stream arrives key-sorted).

SCALE NOTE: `collect_list` materializes a group in executor memory — fine
for bounded groups (the reference's tests), wrong for unbounded ones. For
streaming-within-group semantics at 100 TB use
`operators.group_reduce.apply_grouped` (applyInPandas iterator) instead;
that is the engine's scale path and is benchmarked separately.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

# Map/reduce-side simple shapes ------------------------------------------------


def keyvals(df: DataFrame, key: str = "key", val: str = "value") -> DataFrame:
    """`:keyvals` — (k, v) pairs, identity view (source.clj:346-354)."""
    return df.select(key, val)


def keys_shape(df: DataFrame, key: str = "key") -> DataFrame:
    """`:keys` (source.clj:326-334)."""
    return df.select(key)


def vals_shape(df: DataFrame, val: str = "value") -> DataFrame:
    """`:vals` (source.clj:336-344)."""
    return df.select(val)


# Reduce-side grouped shapes ---------------------------------------------------


def keygroups(df: DataFrame, key: str = "key") -> DataFrame:
    """`:keygroups` — distinct grouping keys (source.clj:356-358)."""
    return df.select(key).distinct()


def valgroups(df: DataFrame, key: str = "key", val: str = "value") -> DataFrame:
    """`:valgroups` — per-group value collections (source.clj:360-363)."""
    return df.groupBy(key).agg(F.sort_array(F.collect_list(val)).alias("values")).select("values")


def keyvalgroups(df: DataFrame, key: str = "key", val: str = "value") -> DataFrame:
    """`:keyvalgroups` — (group-key, [v...]) (source.clj:365-368)."""
    return df.groupBy(key).agg(F.sort_array(F.collect_list(val)).alias("values"))


def keykeyvalgroups(df: DataFrame, group_key: str, key: str, val: str) -> DataFrame:
    """`:keykeyvalgroups` — (group-key, [(k,v)...]), full keys retained
    (source.clj:370-373); the secondary-sort view."""
    return df.groupBy(group_key).agg(
        F.sort_array(F.collect_list(F.struct(key, val))).alias("pairs")
    )


def keykeygroups(df: DataFrame, group_key: str, key: str) -> DataFrame:
    """`:keykeygroups` — (group-key, [k...]) (source.clj:375-378)."""
    return df.groupBy(group_key).agg(F.sort_array(F.collect_list(key)).alias("keys"))


def keysgroups(df: DataFrame, group_key: str, key: str) -> DataFrame:
    """`:keysgroups` — [k...] per group, group key dropped (source.clj:380-383)."""
    return keykeygroups(df, group_key, key).select("keys")


# Sink shapes ------------------------------------------------------------------


def sink_as(df: DataFrame, shape: str, key: str = "key", val: str = "value") -> DataFrame:
    """Output shapes `:keys/:vals/:keyvals/:none`
    (/root/reference/src/clojure/parkour/mapreduce/sink.clj:112-142)."""
    if shape == "keyvals":
        return df.select(key, val)
    if shape == "keys":
        return df.select(key)
    if shape == "vals":
        return df.select(val)
    if shape == "none":
        return df.select()
    raise ValueError(f"unknown sink shape: {shape}")
