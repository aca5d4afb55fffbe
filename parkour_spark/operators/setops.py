"""Set operations & heterogeneous union (mux analog).

Reference: union = mux multiplexing of dseqs
(/root/reference/src/clojure/parkour/io/mux.clj:54-61, tested
test/parkour/multiplex_test.clj:12-33). Intersect/except are absent in
the reference; Spark builtins complete the set algebra (SURVEY §2.9).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def union_all(*dfs: DataFrame, by_name: bool = True, allow_missing: bool = True) -> DataFrame:
    """Multiplex union of N datasets (mux/dseq). Schemas are aligned by
    column name; columns missing on one side become nulls — the Spark
    equivalent of mux's independent per-source sub-configurations."""
    out = dfs[0]
    for df in dfs[1:]:
        out = out.unionByName(df, allowMissingColumns=allow_missing) if by_name else out.union(df)
    return out


def union_tagged(sources: dict[str, DataFrame], tag_col: str = "source") -> DataFrame:
    """Union with a source-discriminator column — the multiplex_test
    pattern (text ∪ avro, discriminated by origin)."""
    tagged = [df.withColumn(tag_col, F.lit(name)) for name, df in sources.items()]
    return union_all(*tagged)


def intersect(a: DataFrame, b: DataFrame) -> DataFrame:
    return a.intersect(b)


def except_all(a: DataFrame, b: DataFrame) -> DataFrame:
    return a.exceptAll(b)


def except_distinct(a: DataFrame, b: DataFrame) -> DataFrame:
    return a.subtract(b)
