"""Round-3 regression tests for the round-2 advice items: short-doc
bigram guard, native-type connected components, scoped Arrow batch-size
conf."""

from pyspark.sql import Row, functions as F

from parkour_spark.functions.text import bigrams, tokens
from parkour_spark.operators.graph import connected_components, dedup_survivors


def test_bigrams_short_docs_empty(spark):
    # Spark's sequence(1, 0) is the DESCENDING [1, 0]; unguarded, 0/1-
    # token docs emit two spurious null-partnered pairs each, inflating
    # any bigram denominator (PMI). bigrams() must map them to [].
    df = spark.createDataFrame(
        [("",), ("  ",), ("one",), ("a b",), ("a b c",)], ["text"]
    ).select(bigrams(tokens(F.col("text"))).alias("p"))
    sizes = [r["p"] for r in df.select(F.size("p").alias("p")).collect()]
    assert sizes == [0, 0, 0, 1, 2]
    pairs = df.select(F.explode("p").alias("q")).select("q.w1", "q.w2").collect()
    assert sorted((r["w1"], r["w2"]) for r in pairs) == [("a", "b"), ("a", "b"), ("b", "c")]


def test_connected_components_string_ids(spark):
    # String doc ids are first-class for corpus dedup; the old long-cast
    # silently produced all-NULL components (r2 advice).
    nodes = spark.createDataFrame([Row(id=x) for x in "abcdefg"])
    edges = spark.createDataFrame(
        [Row(id_a="a", id_b="b"), Row(id_a="b", id_b="c"), Row(id_a="e", id_b="f")]
    )
    got = {
        r["n"]: r["component"]
        for r in connected_components(nodes, edges).collect()
    }
    assert got == {"a": "a", "b": "a", "c": "a", "d": "d", "e": "e", "f": "e", "g": "g"}
    surv = {
        r["doc_id"]: r["is_survivor"]
        for r in dedup_survivors(nodes.select(F.col("id").alias("doc_id")), edges).collect()
    }
    assert surv == {"a": True, "b": False, "c": False, "d": True, "e": True, "f": False, "g": True}


def test_connected_components_long_ids_unchanged(spark):
    nodes = spark.createDataFrame([Row(id=i) for i in range(6)])
    edges = spark.createDataFrame([Row(id_a=0, id_b=1), Row(id_a=1, id_b=2), Row(id_a=4, id_b=5)])
    got = {r["n"]: r["component"] for r in connected_components(nodes, edges).collect()}
    assert got == {0: 0, 1: 0, 2: 0, 3: 3, 4: 4, 5: 4}


def test_blob_batch_size_scoped(spark):
    from parkour_spark.operators.multimodal import blob_batch_size

    key = "spark.sql.execution.arrow.maxRecordsPerBatch"
    try:
        before = spark.conf.get(key)
    except Exception:
        before = None
    with blob_batch_size(spark, 7):
        assert spark.conf.get(key) == "7"
    try:
        after = spark.conf.get(key)
    except Exception:
        after = None
    assert after == before


def test_rebatch_for_blobs_no_silent_mutation(spark):
    from parkour_spark.operators.multimodal import rebatch_for_blobs

    key = "spark.sql.execution.arrow.maxRecordsPerBatch"
    try:
        before = spark.conf.get(key)
    except Exception:
        before = None
    df = spark.range(10)
    out = rebatch_for_blobs(df, num_partitions=2)
    assert out.rdd.getNumPartitions() == 2
    try:
        after = spark.conf.get(key)
    except Exception:
        after = None
    assert after == before  # no max_records_per_batch → no conf touched
