"""Golden tests mirroring the reference's test strategy (SURVEY §5):
pure-function goldens + per-operator checks through a real local session.

Reference fixtures reproduced verbatim:
- word-count-input (dev-resources/word-count-input.txt golden
  {"apple": 3, "banana": 2, "carrot": 1})
- base-data kv pairs (test/parkour/mapreduce/source_test.clj:13-14)
- join-left/join-right (test/parkour/join_test.clj golden)
"""

import pytest
from pyspark.sql import Row, functions as F

from parkour_spark import shapes as SH
from parkour_spark.operators import agg as A
from parkour_spark.operators import joins as J
from parkour_spark.operators import setops as S
from parkour_spark.operators import sort as SRT

WORD_LINES = ["apple banana apple", "carrot banana", "apple"]
BASE_DATA = [("a", 1), ("a", 2), ("b", 3), ("c", 4), ("c", 5), ("c", 6), ("d", 7)]
JOIN_LEFT = [(0, "foo"), (1, "bar"), (2, "baz")]
JOIN_RIGHT = [(0, "blue"), (0, "red"), (0, "green"), (1, "blue"), (2, "red"), (2, "green")]


@pytest.fixture(scope="module")
def kv(spark):
    return spark.createDataFrame(BASE_DATA, ["key", "value"])


def test_word_count_golden(spark):
    lines = spark.createDataFrame([(l,) for l in WORD_LINES], ["value"])
    got = {r["word"]: r["n"] for r in A.word_count(lines).collect()}
    assert got == {"apple": 3, "banana": 2, "carrot": 1}


def test_distinct_golden(spark):
    lines = spark.createDataFrame([(l,) for l in WORD_LINES], ["value"])
    words = lines.select(F.explode(F.split("value", r"\s+")).alias("word"))
    got = sorted(r["word"] for r in A.distinct_keys(words).collect())
    assert got == ["apple", "banana", "carrot"]


# -- the 9 shapes vs the reference's goldens (source_test.clj:42-100) -------


def test_shape_keys(kv):
    assert sorted(r[0] for r in SH.keys_shape(kv).collect()) == list("aabcccd")


def test_shape_vals(kv):
    assert sorted(r[0] for r in SH.vals_shape(kv).collect()) == [1, 2, 3, 4, 5, 6, 7]


def test_shape_keygroups(kv):
    assert sorted(r[0] for r in SH.keygroups(kv).collect()) == ["a", "b", "c", "d"]


def test_shape_valgroups(kv):
    got = sorted(tuple(r[0]) for r in SH.valgroups(kv).collect())
    assert got == [(1, 2), (3,), (4, 5, 6), (7,)]


def test_shape_keyvalgroups(kv):
    got = {r["key"]: tuple(r["values"]) for r in SH.keyvalgroups(kv).collect()}
    assert got == {"a": (1, 2), "b": (3,), "c": (4, 5, 6), "d": (7,)}


def test_shape_keykeyvalgroups(kv):
    df = kv.select(F.col("key").alias("gk"), F.col("key"), F.col("value"))
    got = {r["gk"]: tuple((p["key"], p["value"]) for p in r["pairs"])
           for r in SH.keykeyvalgroups(df, "gk", "key", "value").collect()}
    assert got == {"a": (("a", 1), ("a", 2)), "b": (("b", 3),),
                   "c": (("c", 4), ("c", 5), ("c", 6)), "d": (("d", 7),)}


def test_shape_keysgroups(kv):
    df = kv.select(F.col("key").alias("gk"), F.col("value").alias("k2"))
    got = sorted(tuple(r["keys"]) for r in SH.keysgroups(df, "gk", "k2").collect())
    assert got == [(1, 2), (3,), (4, 5, 6), (7,)]


def test_sink_as(kv):
    assert SH.sink_as(kv, "keys").columns == ["key"]
    assert SH.sink_as(kv, "vals").columns == ["value"]
    assert SH.sink_as(kv, "keyvals").columns == ["key", "value"]


# -- joins vs reference golden (join_test.clj:78-93) ------------------------


def test_equi_join_golden(spark):
    left = spark.createDataFrame(JOIN_LEFT, ["id", "lval"])
    right = spark.createDataFrame(JOIN_RIGHT, ["id", "rval"])
    got = sorted(tuple(r) for r in J.equi_join(left, right, "id").collect())
    assert got == [(0, "foo", "blue"), (0, "foo", "green"), (0, "foo", "red"),
                   (1, "bar", "blue"), (2, "baz", "green"), (2, "baz", "red")]


def test_broadcast_join_same_result(spark):
    left = spark.createDataFrame(JOIN_LEFT, ["id", "lval"])
    right = spark.createDataFrame(JOIN_RIGHT, ["id", "rval"])
    a = sorted(tuple(r) for r in J.broadcast_join(left, right, "id").collect())
    b = sorted(tuple(r) for r in J.equi_join(left, right, "id").collect())
    assert a == b


def test_semi_anti(spark):
    left = spark.createDataFrame(JOIN_LEFT + [(9, "zap")], ["id", "lval"])
    right = spark.createDataFrame(JOIN_RIGHT, ["id", "rval"])
    semi = sorted(r["id"] for r in J.semi_join(left, right, "id").collect())
    anti = sorted(r["id"] for r in J.anti_join(left, right, "id").collect())
    assert semi == [0, 1, 2] and anti == [9]


def test_cogroup_apply(spark):
    import pandas as pd

    left = spark.createDataFrame(JOIN_LEFT, ["id", "lval"])
    right = spark.createDataFrame(JOIN_RIGHT, ["id", "rval"])

    def fn(l: pd.DataFrame, r: pd.DataFrame) -> pd.DataFrame:
        if l.empty:
            return pd.DataFrame(columns=["id", "n"])
        return pd.DataFrame([{"id": int(l["id"].iloc[0]), "n": len(r)}])

    got = {r["id"]: r["n"] for r in
           J.cogroup_apply(left, right, ["id"], fn, "id long, n long").collect()}
    assert got == {0: 3, 1: 1, 2: 2}


def test_secondary_sort_collect(spark):
    df = spark.createDataFrame(
        [("a", 3, "x"), ("a", 1, "y"), ("a", 2, "z"), ("b", 1, "q")], ["g", "s", "p"]
    )
    got = {r["g"]: list(r["sorted_payloads"]) for r in
           J.secondary_sort_collect(df, "g", "s", "p").collect()}
    assert got == {"a": ["y", "z", "x"], "b": ["q"]}


# -- set ops, sort, indexing ------------------------------------------------


def test_union_tagged(spark):
    a = spark.createDataFrame([(1,)], ["x"])
    b = spark.createDataFrame([(2,)], ["x"])
    got = sorted(tuple(r) for r in S.union_tagged({"a": a, "b": b}).collect())
    assert got == [(1, "a"), (2, "b")]


def test_zip_with_index_sorted(spark):
    df = spark.createDataFrame([("c",), ("a",), ("b",)], ["name"]).repartition(3)
    got = {r["name"]: r["idx"] for r in SRT.zip_with_index(df, "idx", order=[F.col("name")]).collect()}
    assert got == {"a": 0, "b": 1, "c": 2}


def test_top_k(spark):
    df = spark.createDataFrame([(i,) for i in range(100)], ["x"])
    got = [r["x"] for r in A.top_k(df, [F.col("x").desc()], 3).collect()]
    assert got == [99, 98, 97]


def test_counted_observation(spark):
    df = spark.createDataFrame([(i,) for i in range(10)], ["x"])
    counted_df, obs = A.counted(df, "m", F.count(F.lit(1)).alias("n"), F.sum("x").alias("s"))
    counted_df.collect()
    assert obs.get == {"n": 10, "s": 45}


def test_partition_by_fn(spark):
    df = spark.createDataFrame([(i,) for i in range(20)], ["x"])
    out = SRT.partition_by_fn(df, 4, lambda row: row.x % 4)
    parts = out.withColumn("pid", F.spark_partition_id()).collect()
    by_pid = {}
    for r in parts:
        by_pid.setdefault(r["pid"], set()).add(r["x"] % 4)
    assert all(len(v) == 1 for v in by_pid.values())


def test_cluster_conf_policy():
    """Deployment conf policy: shuffle ceiling scales with cores, scan
    splits bounded, broadcast threshold raised (the engine leans on
    broadcasting probe/eval tables), speculation on for the
    straggler-sensitive LSH family."""
    from parkour_spark.session import cluster_conf

    conf = cluster_conf(total_cores=8000)
    assert conf["spark.sql.shuffle.partitions"] == "24000"
    assert conf["spark.sql.files.maxPartitionBytes"] == "128m"
    assert int(conf["spark.sql.autoBroadcastJoinThreshold"]) == 256 * 1024 * 1024
    assert conf["spark.speculation"] == "true"
    # streaming state must be RocksDB-backed at cluster scale: the
    # default in-memory provider holds every state row on-heap
    assert conf["spark.sql.streaming.stateStore.providerClass"].endswith(
        "RocksDBStateStoreProvider"
    )


def test_cluster_conf_state_store_round_trips(spark):
    """The RocksDB provider conf is a runtime-settable SQL conf — it
    must survive a set/get round-trip on a live session (i.e. the key
    is real, not a typo'd no-op)."""
    from parkour_spark.session import cluster_conf

    key = "spark.sql.streaming.stateStore.providerClass"
    prev = spark.conf.get(key)
    try:
        spark.conf.set(key, cluster_conf(total_cores=64)[key])
        assert spark.conf.get(key).endswith("RocksDBStateStoreProvider")
    finally:
        spark.conf.set(key, prev)


def test_sf_cache_lru_eviction():
    """Driver-side index caches are bounded: LRU of 4, most recently
    USED survives — a service touching many corpora can't grow driver
    memory without limit."""
    from parkour_spark.queries import _SfLRU

    c = _SfLRU()
    for i in range(4):
        c[f"sf{i}"] = i
    assert c["sf0"] == 0  # refresh sf0's recency
    c["sf4"] = 4  # evicts sf1 (least recently used), not sf0
    assert set(c) == {"sf0", "sf2", "sf3", "sf4"}
    c["sf2"] = 22  # overwrite refreshes, no eviction
    assert set(c) == {"sf0", "sf2", "sf3", "sf4"} and c["sf2"] == 22
