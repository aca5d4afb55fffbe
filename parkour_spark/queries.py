"""Query registry: every operator from SURVEY §2 (plus the LLM-pipeline
operator family) as a named (spark_fn, oracle_sql) pair.

Each entry's Spark side dogfoods the engine's operator modules; the
oracle side is the ANSI-SQL equivalent DuckDB runs on the same parquet
tables. Column names and value formatting are mirrored exactly (the
driver hash-compares sorted values).

Cross-engine determinism rules used throughout:
- aggregates of doubles → round(. , 2..4); per-row arithmetic mirrored
  expression-for-expression so IEEE results are identical.
- timestamps → formatted strings.
- grouped collections (tuple shapes) → sorted, comma-joined strings.
- hashing → md5 (bit-identical in both engines).
"""

from __future__ import annotations

from typing import Callable

from pyspark.sql import DataFrame, SparkSession, Window, functions as F

from parkour_spark.dataset import load_table
from parkour_spark.functions.text import (
    EN_STOPWORDS,
    avg_token_len,
    fingerprint,
    langid_en,
    quality_score,
    token_count,
    tokens,
)
from parkour_spark.operators import agg as A
from parkour_spark.operators import corpus as C
from parkour_spark.operators import dedup as D
from parkour_spark.operators import joins as J
from parkour_spark.operators import setops as S
from parkour_spark.operators import similarity as SIM
from parkour_spark.operators import sort as SRT
from parkour_spark import shapes as SH

QueryFn = Callable[[SparkSession, str], DataFrame]
QUERIES: dict[str, QueryFn] = {}
ORACLES: dict[str, str] = {}


class _SfLRU(dict):
    """Per-sf_dir driver-side cache for fitted index artifacts
    (centroids, codebooks, eval refs — all k×d-small), bounded so a
    long-lived service process touching many corpora can't grow driver
    memory without limit. LRU of 4: the gate/bench touch at most two
    sf_dirs, so eviction never fires there and behavior is identical."""

    MAX = 4

    def __getitem__(self, key):
        val = super().__getitem__(key)
        # refresh recency (dict preserves insertion order)
        super().__delitem__(key)
        super().__setitem__(key, val)
        return val

    def __setitem__(self, key, val):
        if key in self:
            super().__delitem__(key)
        super().__setitem__(key, val)
        while len(self) > self.MAX:
            old = next(iter(self))
            old_val = dict.__getitem__(self, old)
            super().__delitem__(old)
            self._evicted(old, old_val)

    def _evicted(self, key, val):  # hook for caches owning disk artifacts
        pass


class _SfLRUDirs(_SfLRU):
    """_SfLRU whose values are temp directory paths: eviction removes
    the directory so a long-lived process doesn't leak disk either."""

    def _evicted(self, key, val):
        import shutil

        shutil.rmtree(val, ignore_errors=True)


def query(name: str, oracle: str | None = None):
    def deco(fn: QueryFn) -> QueryFn:
        QUERIES[name] = fn
        if oracle is not None:
            ORACLES[name] = oracle
        return fn

    return deco


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return load_table(spark, sf_dir, name)


# ===========================================================================
# §2.6 Aggregations
# ===========================================================================


@query(
    "word_count",
    """
    SELECT word, count(*) AS n
    FROM (SELECT unnest(string_split_regex(trim(text), '\\s+')) AS word
          FROM documents)
    WHERE word <> ''
    GROUP BY word
    """,
)
def q_word_count(spark, sf_dir):
    """The reference's canonical query (word_count.clj:9-22)."""
    docs = _t(spark, sf_dir, "documents").select(F.col("text").alias("value"))
    return A.word_count(docs)


@query(
    "distinct_tokens",
    """
    SELECT DISTINCT word FROM (
      SELECT unnest(string_split_regex(trim(text), '\\s+')) AS word FROM documents)
    WHERE word <> ''
    """,
)
def q_distinct_tokens(spark, sf_dir):
    """Distinct via `:keygroups` (word_count_test.clj:61-86)."""
    docs = _t(spark, sf_dir, "documents")
    words = SRT.explode_fast(docs, tokens("text"), "word")
    return A.distinct_keys(words, "word")


@query(
    "q1_pricing_summary",
    """
    SELECT l_returnflag, l_linestatus,
           round(sum(l_quantity), 2)                          AS sum_qty,
           round(sum(l_extendedprice), 2)                     AS sum_base_price,
           round(sum(l_extendedprice * (1 - l_discount)), 2)  AS sum_disc_price,
           round(avg(l_quantity), 4)                          AS avg_qty,
           count(*)                                           AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
    GROUP BY l_returnflag, l_linestatus
    """,
)
def q_q1(spark, sf_dir):
    """TPC-H Q1 shape: scan + filter (pushed to parquet) + grouped
    partial/final aggregation — the combiner pattern (graph.clj:239-248)."""
    li = _t(spark, sf_dir, "lineitem")
    return A.group_reduce(
        li.where(F.col("l_shipdate") <= F.lit("1998-09-02 00:00:00").cast("timestamp")),
        ["l_returnflag", "l_linestatus"],
        F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
        F.round(F.sum("l_extendedprice"), 2).alias("sum_base_price"),
        F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias("sum_disc_price"),
        F.round(F.avg("l_quantity"), 4).alias("avg_qty"),
        F.count("*").alias("count_order"),
    )


@query(
    "top_customers",
    """
    SELECT c_custkey, c_name, round(sum(o_totalprice), 2) AS revenue
    FROM customer JOIN orders ON c_custkey = o_custkey
    GROUP BY c_custkey, c_name
    ORDER BY revenue DESC, c_custkey
    LIMIT 10
    """,
)
def q_top_customers(spark, sf_dir):
    """Global top-k (SURVEY §2.8): TakeOrderedAndProject, no full sort."""
    cust, orders = _t(spark, sf_dir, "customer"), _t(spark, sf_dir, "orders")
    rev = J.equi_join(cust, orders, cust.c_custkey == orders.o_custkey).groupBy(
        "c_custkey", "c_name"
    ).agg(F.round(F.sum("o_totalprice"), 2).alias("revenue"))
    return SRT.total_sort(rev, F.col("revenue").desc(), F.col("c_custkey")).limit(10)


@query(
    "orders_per_priority_pivot",
    """
    SELECT o_orderpriority,
           count(*) FILTER (WHERE o_orderstatus = 'O') AS O,
           count(*) FILTER (WHERE o_orderstatus = 'F') AS F,
           count(*) FILTER (WHERE o_orderstatus = 'P') AS P
    FROM orders GROUP BY o_orderpriority
    """,
)
def q_pivot(spark, sf_dir):
    """Pivot (Spark builtin; absent in reference, SURVEY §2.6 note)."""
    orders = _t(spark, sf_dir, "orders")
    p = orders.groupBy("o_orderpriority").pivot("o_orderstatus", ["O", "F", "P"]).count()
    return p.select(
        "o_orderpriority",
        F.coalesce("O", F.lit(0)).alias("O"),
        F.coalesce("F", F.lit(0)).alias("F"),
        F.coalesce("P", F.lit(0)).alias("P"),
    )


@query(
    "range_mod_agg",
    """
    SELECT "range" % 7 AS bucket, count(*) AS n, sum("range")::BIGINT AS total
    FROM range(0, 100000) GROUP BY 1
    """,
)
def q_range(spark, sf_dir):
    """Synthetic range source (io/range.clj:28-42) + agg."""
    return (
        spark.range(0, 100000)
        .select((F.col("id") % 7).alias("bucket"), F.col("id"))
        .groupBy("bucket")
        .agg(F.count("*").alias("n"), F.sum("id").alias("total"))
    )


# ===========================================================================
# §2.7 Joins
# ===========================================================================


@query(
    "customer_order_stats",
    """
    SELECT c_custkey, c_name, count(*) AS n_orders,
           round(sum(o_totalprice), 2) AS total_spent,
           round(max(o_totalprice), 2) AS max_order
    FROM customer JOIN orders ON c_custkey = o_custkey
    GROUP BY c_custkey, c_name
    """,
)
def q_customer_orders(spark, sf_dir):
    """Reduce-side equi-join (join_test.clj:19-76) + grouped agg."""
    cust, orders = _t(spark, sf_dir, "customer"), _t(spark, sf_dir, "orders")
    return J.equi_join(cust, orders, cust.c_custkey == orders.o_custkey).groupBy(
        "c_custkey", "c_name"
    ).agg(
        F.count("*").alias("n_orders"),
        F.round(F.sum("o_totalprice"), 2).alias("total_spent"),
        F.round(F.max("o_totalprice"), 2).alias("max_order"),
    )


@query(
    "region_customer_counts",
    """
    SELECT r_name, count(*) AS n_customers
    FROM customer
    JOIN nation ON c_nationkey = n_nationkey
    JOIN region ON n_regionkey = r_regionkey
    GROUP BY r_name
    """,
)
def q_broadcast_join(spark, sf_dir):
    """Map-side broadcast join chain (dval pattern, doc/dvals.md:10-14):
    both dims broadcast; the fact table never shuffles for the join."""
    cust = _t(spark, sf_dir, "customer")
    nation = _t(spark, sf_dir, "nation")
    region = _t(spark, sf_dir, "region")
    joined = J.broadcast_join(
        J.broadcast_join(cust, nation, cust.c_nationkey == nation.n_nationkey),
        region,
        F.col("n_regionkey") == region.r_regionkey,
    )
    return joined.groupBy("r_name").agg(F.count("*").alias("n_customers"))


@query(
    "customers_without_urgent_orders",
    """
    SELECT c_custkey, c_name FROM customer
    WHERE c_custkey NOT IN
        (SELECT o_custkey FROM orders WHERE o_orderpriority = '1-URGENT')
    """,
)
def q_anti_join(spark, sf_dir):
    cust, orders = _t(spark, sf_dir, "customer"), _t(spark, sf_dir, "orders")
    return J.anti_join(
        cust.select("c_custkey", "c_name"),
        orders.where(F.col("o_orderpriority") == "1-URGENT").select(
            F.col("o_custkey").alias("c_custkey")
        ),
        "c_custkey",
    )


@query(
    "active_automobile_customers",
    """
    SELECT c_custkey, c_name FROM customer
    WHERE c_mktsegment = 'AUTOMOBILE'
      AND c_custkey IN (SELECT o_custkey FROM orders)
    """,
)
def q_semi_join(spark, sf_dir):
    cust, orders = _t(spark, sf_dir, "customer"), _t(spark, sf_dir, "orders")
    return J.semi_join(
        cust.where(F.col("c_mktsegment") == "AUTOMOBILE").select("c_custkey", "c_name"),
        orders.select(F.col("o_custkey").alias("c_custkey")),
        "c_custkey",
    )


@query(
    "cogroup_order_stats",
    """
    SELECT c_custkey, count(o_orderkey) AS n_orders,
           coalesce(round(max(o_totalprice), 2), -1.0) AS max_order
    FROM customer LEFT JOIN orders ON c_custkey = o_custkey
    GROUP BY c_custkey
    """,
)
def q_cogroup(spark, sf_dir):
    """Arbitrary-function co-group (graph_test.clj:98-126 →
    cogroup().applyInPandas): per key the fn sees both sides' rows."""
    import pandas as pd

    cust = _t(spark, sf_dir, "customer").select("c_custkey")
    orders = _t(spark, sf_dir, "orders").select(
        F.col("o_custkey").alias("c_custkey"), "o_orderkey", "o_totalprice"
    )

    def stats(left: "pd.DataFrame", right: "pd.DataFrame") -> "pd.DataFrame":
        if left.empty:
            return pd.DataFrame(columns=["c_custkey", "n_orders", "max_order"])
        key = int(left["c_custkey"].iloc[0])
        n = len(right)
        mx = round(float(right["o_totalprice"].max()), 2) if n else -1.0
        return pd.DataFrame([{"c_custkey": key, "n_orders": n, "max_order": mx}])

    return J.cogroup_apply(
        cust, orders, ["c_custkey"], stats, "c_custkey long, n_orders long, max_order double"
    )


@query(
    "top3_orders_per_customer",
    """
    SELECT o_custkey, o_orderkey, rank FROM (
      SELECT o_custkey, o_orderkey,
             row_number() OVER (PARTITION BY o_custkey
                                ORDER BY o_totalprice DESC, o_orderkey) AS rank
      FROM orders)
    WHERE rank <= 3
    """,
)
def q_topk_per_group(spark, sf_dir):
    orders = _t(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey"))
    return (
        orders.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= 3)
        .select("o_custkey", "o_orderkey", "rank")
    )


# ===========================================================================
# §2.3 The 9 tuple shapes (lineitem: group=l_orderkey, key=l_linenumber,
#      val=l_partkey)
# ===========================================================================

_SHAPE_ORACLES = {
    "shape_keys": "SELECT l_orderkey AS key FROM lineitem",
    "shape_vals": "SELECT l_linenumber AS value FROM lineitem",
    "shape_keyvals": "SELECT l_orderkey AS key, l_linenumber AS value FROM lineitem",
    "shape_keygroups": "SELECT DISTINCT l_orderkey AS key FROM lineitem",
    "shape_valgroups": """
        SELECT string_agg(l_linenumber, ',' ORDER BY l_linenumber) AS values
        FROM lineitem GROUP BY l_orderkey""",
    "shape_keyvalgroups": """
        SELECT l_orderkey AS key,
               string_agg(l_linenumber, ',' ORDER BY l_linenumber) AS values
        FROM lineitem GROUP BY l_orderkey""",
    "shape_keykeyvalgroups": """
        SELECT l_orderkey AS key,
               string_agg(l_linenumber || ':' || l_partkey, ','
                          ORDER BY l_linenumber, l_partkey) AS pairs
        FROM lineitem GROUP BY l_orderkey""",
    "shape_keykeygroups": """
        SELECT l_orderkey AS key,
               string_agg(l_linenumber, ',' ORDER BY l_linenumber) AS keys
        FROM lineitem GROUP BY l_orderkey""",
    "shape_keysgroups": """
        SELECT string_agg(l_linenumber, ',' ORDER BY l_linenumber) AS keys
        FROM lineitem GROUP BY l_orderkey""",
}


def _join_longs(arr) -> F.Column:
    return F.concat_ws(",", F.transform(arr, lambda x: x.cast("string")))


def _shape_query(name: str):
    @query(name, _SHAPE_ORACLES[name])
    def fn(spark, sf_dir, _name=name):
        li = _t(spark, sf_dir, "lineitem").select(
            F.col("l_orderkey").alias("key"), F.col("l_linenumber").alias("value"),
            F.col("l_partkey").alias("value2"),
        )
        if _name == "shape_keys":
            return SH.keys_shape(li)
        if _name == "shape_vals":
            return SH.vals_shape(li)
        if _name == "shape_keyvals":
            return SH.keyvals(li)
        if _name == "shape_keygroups":
            return SH.keygroups(li)
        if _name == "shape_valgroups":
            return SH.valgroups(li).select(_join_longs("values").alias("values"))
        if _name == "shape_keyvalgroups":
            return SH.keyvalgroups(li).select("key", _join_longs("values").alias("values"))
        if _name == "shape_keykeyvalgroups":
            g = SH.keykeyvalgroups(li, "key", "value", "value2")
            pairs = F.concat_ws(
                ",",
                F.transform(
                    F.col("pairs"),
                    lambda s: F.concat_ws(":", s["value"].cast("string"), s["value2"].cast("string")),
                ),
            )
            return g.select("key", pairs.alias("pairs"))
        if _name == "shape_keykeygroups":
            return SH.keykeygroups(li, "key", "value").select("key", _join_longs("keys").alias("keys"))
        if _name == "shape_keysgroups":
            return SH.keysgroups(li, "key", "value").select(_join_longs("keys").alias("keys"))
        raise ValueError(_name)

    return fn


for _n in _SHAPE_ORACLES:
    _shape_query(_n)


# ===========================================================================
# §2.8 Sorts / secondary sort / sampling / matrixify indexing
# ===========================================================================


@query(
    "secondary_sort_orders",
    """
    SELECT o_custkey,
           string_agg(strftime(o_orderdate, '%Y-%m-%d %H:%M:%S'), ','
                      ORDER BY strftime(o_orderdate, '%Y-%m-%d %H:%M:%S')) AS dates
    FROM orders GROUP BY o_custkey
    """,
)
def q_secondary_sort(spark, sf_dir):
    """Secondary sort (grouping-schema trick, join_test.clj:63-66):
    per-group values ordered by a non-group key."""
    orders = _t(spark, sf_dir, "orders").select(
        "o_custkey", F.date_format("o_orderdate", "yyyy-MM-dd HH:mm:ss").alias("d")
    )
    return orders.groupBy("o_custkey").agg(
        F.concat_ws(",", F.sort_array(F.collect_list("d"))).alias("dates")
    )


@query(
    "matrixify",
    """
    WITH edges AS (
      SELECT s_name, p_name, round(sum(l_quantity), 2) AS w
      FROM lineitem
      JOIN supplier ON l_suppkey = s_suppkey
      JOIN part ON l_partkey = p_partkey
      GROUP BY s_name, p_name
    ),
    rows_idx AS (
      SELECT s_name, dense_rank() OVER (ORDER BY s_name) - 1 AS row_idx FROM (SELECT DISTINCT s_name FROM edges)
    ),
    cols_idx AS (
      SELECT p_name, dense_rank() OVER (ORDER BY p_name) - 1 AS col_idx FROM (SELECT DISTINCT p_name FROM edges)
    )
    SELECT row_idx, col_idx, w
    FROM edges JOIN rows_idx USING (s_name) JOIN cols_idx USING (p_name)
    """,
)
def q_matrixify(spark, sf_dir):
    """The reference's flagship multi-job example (matrixify.clj:67-92):
    relabel a weighted edge list with dense global indexes. The
    reference's two-phase count+offset jobs become `zip_with_index`
    (distributed count-per-partition + offset), not a single-partition
    window."""
    li = _t(spark, sf_dir, "lineitem")
    sup = _t(spark, sf_dir, "supplier")
    part = _t(spark, sf_dir, "part")
    # Aggregate on the integer keys FIRST (map-side partial agg over the
    # fact table), then broadcast-join names onto the ~|edges| aggregated
    # rows — the fact table never flows through a join. A second tiny agg
    # by name keeps exact semantics even if names ever collide across
    # keys. persist: the edge list is consumed three times (row index,
    # column index, final join).
    partial = li.groupBy("l_suppkey", "l_partkey").agg(F.sum("l_quantity").alias("__qty"))
    edges = (
        partial.join(
            F.broadcast(sup.select("s_suppkey", "s_name")),
            partial.l_suppkey == sup.s_suppkey,
        )
        .join(
            F.broadcast(part.select("p_partkey", "p_name")),
            partial.l_partkey == part.p_partkey,
        )
        .groupBy("s_name", "p_name")
        .agg(F.round(F.sum("__qty"), 2).alias("w"))
    ).persist()
    # The two dimension-index builds are independent jobs — overlap them
    # (each is zip_with_index: range-sort + per-partition counts).
    from concurrent.futures import ThreadPoolExecutor

    with ThreadPoolExecutor(max_workers=2) as pool:
        f_rows = pool.submit(
            SRT.zip_with_index,
            edges.select("s_name").distinct(), "row_idx", [F.col("s_name")],
        )
        f_cols = pool.submit(
            SRT.zip_with_index,
            edges.select("p_name").distinct(), "col_idx", [F.col("p_name")],
        )
        rows_idx, cols_idx = f_rows.result(), f_cols.result()
    return (
        edges.join(F.broadcast(rows_idx), "s_name")
        .join(F.broadcast(cols_idx), "p_name")
        .select("row_idx", "col_idx", "w")
    )


@query(
    "running_user_total",
    """
    SELECT event_id, user_id,
           round(sum(value) OVER (PARTITION BY user_id ORDER BY ts, event_id), 2) AS running
    FROM events
    """,
)
def q_running_total(spark, sf_dir):
    """`pr/reductions` running accumulation (reducers.clj:22-33) as a
    window aggregate."""
    ev = _t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    return ev.select("event_id", "user_id", F.round(F.sum("value").over(w), 2).alias("running"))


# ===========================================================================
# §2.9 Set operations
# ===========================================================================


@query(
    "ordered_positive_custkeys",
    """
    SELECT o_custkey AS custkey FROM orders
    INTERSECT
    SELECT c_custkey FROM customer WHERE c_acctbal > 0
    """,
)
def q_intersect(spark, sf_dir):
    orders = _t(spark, sf_dir, "orders").select(F.col("o_custkey").alias("custkey"))
    cust = _t(spark, sf_dir, "customer").where(F.col("c_acctbal") > 0).select(
        F.col("c_custkey").alias("custkey")
    )
    return S.intersect(orders, cust)


@query(
    "parts_never_bulk_ordered",
    """
    SELECT p_partkey FROM part
    EXCEPT
    SELECT l_partkey FROM lineitem WHERE l_quantity >= 45
    """,
)
def q_except(spark, sf_dir):
    part = _t(spark, sf_dir, "part").select("p_partkey")
    li = (
        _t(spark, sf_dir, "lineitem")
        .where(F.col("l_quantity") >= 45)
        .select(F.col("l_partkey").alias("p_partkey"))
    )
    return S.except_distinct(part, li)


@query(
    "union_tagged_names",
    """
    SELECT 'region' AS source, r_name AS name FROM region
    UNION ALL
    SELECT 'nation' AS source, n_name AS name FROM nation
    """,
)
def q_union_tagged(spark, sf_dir):
    """Heterogeneous-source multiplex union with discriminator
    (multiplex_test.clj:12-33)."""
    region = _t(spark, sf_dir, "region").select(F.col("r_name").alias("name"))
    nation = _t(spark, sf_dir, "nation").select(F.col("n_name").alias("name"))
    return S.union_tagged({"region": region, "nation": nation}).select("source", "name")


# ===========================================================================
# Events: windows & sessionization (streaming-surface batch equivalents)
# ===========================================================================


@query(
    "events_hourly",
    """
    SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H') AS hour, event_type,
           count(*) AS n, round(sum(value), 2) AS total
    FROM events GROUP BY 1, 2
    """,
)
def q_events_hourly(spark, sf_dir):
    """Tumbling window aggregation (batch form of the streaming surface)."""
    ev = _t(spark, sf_dir, "events")
    return ev.groupBy(
        F.date_format(F.date_trunc("hour", "ts"), "yyyy-MM-dd HH").alias("hour"),
        "event_type",
    ).agg(F.count("*").alias("n"), F.round(F.sum("value"), 2).alias("total"))


@query(
    "user_sessions",
    """
    SELECT user_id, count(*) AS n_events,
           (1 + sum(CASE WHEN gap > 1800 THEN 1 ELSE 0 END))::BIGINT AS n_sessions
    FROM (
      SELECT user_id,
             epoch(ts) - lag(epoch(ts)) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS gap
      FROM events)
    GROUP BY user_id
    """,
)
def q_sessions(spark, sf_dir):
    """Sessionization: lag-gap > 30 min starts a new session."""
    ev = _t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    gaps = ev.select(
        "user_id",
        (F.unix_timestamp("ts") - F.lag(F.unix_timestamp("ts")).over(w)).alias("gap"),
    )
    return gaps.groupBy("user_id").agg(
        F.count("*").alias("n_events"),
        (1 + F.sum(F.when(F.col("gap") > 1800, 1).otherwise(0))).alias("n_sessions"),
    )


# ===========================================================================
# Deeper analytics: multi-join, cube/rollup, exact percentile, windows
# ===========================================================================


@query(
    "q3_shipping_priority",
    """
    SELECT o_orderkey,
           round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue,
           strftime(o_orderdate, '%Y-%m-%d') AS orderdate, o_orderpriority
    FROM customer
    JOIN orders ON c_custkey = o_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    WHERE c_mktsegment = 'BUILDING'
      AND o_orderdate < TIMESTAMP '1998-03-15 00:00:00'
      AND l_shipdate > TIMESTAMP '1998-03-15 00:00:00'
    GROUP BY o_orderkey, strftime(o_orderdate, '%Y-%m-%d'), o_orderpriority
    ORDER BY revenue DESC, o_orderkey
    LIMIT 10
    """,
)
def q_q3(spark, sf_dir):
    """TPC-H Q3 shape: selective dim filter → two joins → agg → top-k.
    Catalyst broadcast-joins the filtered customer side; the lineitem
    date filter pushes to the parquet scan."""
    cust = _t(spark, sf_dir, "customer").where(F.col("c_mktsegment") == "BUILDING")
    orders = _t(spark, sf_dir, "orders").where(
        F.col("o_orderdate") < F.lit("1998-03-15 00:00:00").cast("timestamp")
    )
    li = _t(spark, sf_dir, "lineitem").where(
        F.col("l_shipdate") > F.lit("1998-03-15 00:00:00").cast("timestamp")
    )
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .groupBy(
            "o_orderkey",
            F.date_format("o_orderdate", "yyyy-MM-dd").alias("orderdate"),
            "o_orderpriority",
        )
        .agg(
            F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias(
                "revenue"
            )
        )
        .select("o_orderkey", "revenue", "orderdate", "o_orderpriority")
        .orderBy(F.col("revenue").desc(), F.col("o_orderkey"))
        .limit(10)
    )


@query(
    "rollup_returnflag_status",
    """
    SELECT l_returnflag, l_linestatus, count(*) AS n,
           round(sum(l_quantity), 2) AS qty
    FROM lineitem GROUP BY ROLLUP (l_returnflag, l_linestatus)
    """,
)
def q_rollup(spark, sf_dir):
    """Grouping sets (absent in reference; Spark builtin, SURVEY §2.6)."""
    li = _t(spark, sf_dir, "lineitem")
    return li.rollup("l_returnflag", "l_linestatus").agg(
        F.count("*").alias("n"), F.round(F.sum("l_quantity"), 2).alias("qty")
    )


@query(
    "cube_priority_status",
    """
    SELECT o_orderpriority, o_orderstatus, count(*) AS n
    FROM orders GROUP BY CUBE (o_orderpriority, o_orderstatus)
    """,
)
def q_cube(spark, sf_dir):
    orders = _t(spark, sf_dir, "orders")
    return orders.cube("o_orderpriority", "o_orderstatus").agg(F.count("*").alias("n"))


@query(
    "price_quantiles_by_segment",
    """
    WITH ranked AS (
      SELECT c_mktsegment, o_totalprice, o_orderkey,
             row_number() OVER (PARTITION BY c_mktsegment
                                ORDER BY o_totalprice, o_orderkey) AS rn,
             count(*) OVER (PARTITION BY c_mktsegment) AS n
      FROM orders JOIN customer ON o_custkey = c_custkey)
    SELECT c_mktsegment,
           round(max(CASE WHEN rn = CAST(ceil(0.5 * n) AS BIGINT)
                          THEN o_totalprice END), 2) AS p50,
           round(max(CASE WHEN rn = CAST(ceil(0.9 * n) AS BIGINT)
                          THEN o_totalprice END), 2) AS p90
    FROM ranked GROUP BY c_mktsegment
    """,
)
def q_quantiles(spark, sf_dir):
    """Exact discrete (rank-based) quantiles — value at rank ⌈q·n⌉, so
    both engines pick the same stored double (interpolated quantiles
    differ across engines in final ulps). The 100 TB default is
    `approx_percentile` (t-digest sketch, one pass, mergeable); exact
    rank selection is the oracle-checkable form."""
    orders = _t(spark, sf_dir, "orders")
    cust = _t(spark, sf_dir, "customer")
    joined = orders.join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
    w = Window.partitionBy("c_mktsegment").orderBy("o_totalprice", "o_orderkey")
    wc = Window.partitionBy("c_mktsegment")
    ranked = joined.select(
        "c_mktsegment",
        "o_totalprice",
        F.row_number().over(w).alias("rn"),
        F.count("*").over(wc).alias("n"),
    )
    pick = lambda q: F.round(
        F.max(
            F.when(
                F.col("rn") == F.ceil(F.lit(q) * F.col("n")).cast("bigint"),
                F.col("o_totalprice"),
            )
        ),
        2,
    )
    return ranked.groupBy("c_mktsegment").agg(pick(0.5).alias("p50"), pick(0.9).alias("p90"))


@query(
    "orders_above_customer_avg",
    """
    SELECT o_custkey, count(*) AS n_above
    FROM (
      SELECT o_custkey, o_totalprice,
             avg(o_totalprice) OVER (PARTITION BY o_custkey) AS cavg
      FROM orders)
    WHERE o_totalprice > cavg
    GROUP BY o_custkey
    """,
)
def q_above_avg(spark, sf_dir):
    """Window aggregate + filter (the reference would need a two-job
    self-co-group; one shuffle here)."""
    orders = _t(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey")
    return (
        orders.withColumn("cavg", F.avg("o_totalprice").over(w))
        .where(F.col("o_totalprice") > F.col("cavg"))
        .groupBy("o_custkey")
        .agg(F.count("*").alias("n_above"))
    )


@query(
    "asof_purchase_view",
    """
    SELECT p.event_id, p.user_id, v.event_id AS view_event_id
    FROM (SELECT * FROM events WHERE event_type = 'purchase') p
    ASOF LEFT JOIN (SELECT * FROM events WHERE event_type = 'view') v
      ON p.user_id = v.user_id AND p.ts >= v.ts
    """,
)
def q_asof(spark, sf_dir):
    """As-of join (operators.asof): each purchase matched to the user's
    most recent prior view. Union-sort implementation — one shuffle on
    user_id, no pandas, no per-key materialization."""
    from parkour_spark.operators.asof import asof_join

    from parkour_spark.functions.timeops import epoch_micros

    ev = _t(spark, sf_dir, "events")
    purchases = ev.where(F.col("event_type") == "purchase").select(
        "event_id", "user_id", epoch_micros("ts").alias("t_us")
    )
    views = ev.where(F.col("event_type") == "view").select(
        F.col("event_id").alias("view_event_id"),
        "user_id",
        epoch_micros("ts").alias("vt_us"),
    )
    return asof_join(
        purchases, views, ["user_id"], "t_us", "vt_us", ["view_event_id"]
    ).select("event_id", "user_id", "view_event_id")


@query(
    "range_join_quantity_bands",
    """
    WITH bands AS (
      SELECT "range" * 5 AS lo, ("range" + 1) * 5 AS hi,
             'b' || "range" AS band
      FROM range(0, 11))
    SELECT band, count(*) AS n
    FROM lineitem JOIN bands ON l_quantity >= lo AND l_quantity < hi
    GROUP BY band
    """,
)
def q_range_join(spark, sf_dir):
    """Range join (operators.asof.range_join): bucketized interval join —
    equi-join on bucket + residual filter, never a nested loop over the
    fact table."""
    from parkour_spark.operators.asof import range_join

    li = _t(spark, sf_dir, "lineitem")
    bands = spark.range(0, 11).select(
        (F.col("id") * 5).cast("double").alias("lo"),
        ((F.col("id") + 1) * 5).cast("double").alias("hi"),
        F.concat(F.lit("b"), F.col("id")).alias("band"),
    )
    joined = range_join(li, bands, "l_quantity", "lo", "hi", bucket_width=5.0)
    return joined.groupBy("band").agg(F.count("*").alias("n"))


@query(
    "json_props_sum",
    """
    SELECT event_type,
           sum(CAST(json_extract_string(props, '$.k') AS BIGINT))::BIGINT AS k_total,
           count(*) AS n
    FROM events GROUP BY event_type
    """,
)
def q_json_props(spark, sf_dir):
    """Semi-structured column handling: JSON path extraction JVM-side
    (get_json_object), no Python."""
    ev = _t(spark, sf_dir, "events")
    return ev.groupBy("event_type").agg(
        F.sum(F.get_json_object("props", "$.k").cast("bigint")).alias("k_total"),
        F.count("*").alias("n"),
    )


@query(
    "order_gaps",
    """
    SELECT o_custkey, count(*) AS n_gaps, sum(gap_secs)::BIGINT AS total_gap_secs
    FROM (
      SELECT o_custkey,
             CAST(epoch(o_orderdate) AS BIGINT)
               - lag(CAST(epoch(o_orderdate) AS BIGINT))
               OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
               AS gap_secs
      FROM orders)
    WHERE gap_secs IS NOT NULL
    GROUP BY o_custkey
    """,
)
def q_order_gaps(spark, sf_dir):
    """lead/lag window family: inter-order gaps per customer (exact
    integer seconds — no float accumulation)."""
    orders = _t(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    gaps = orders.select(
        "o_custkey",
        (F.unix_timestamp("o_orderdate") - F.lag(F.unix_timestamp("o_orderdate")).over(w)).alias(
            "gap_secs"
        ),
    ).where(F.col("gap_secs").isNotNull())
    return gaps.groupBy("o_custkey").agg(
        F.count("*").alias("n_gaps"), F.sum("gap_secs").alias("total_gap_secs")
    )


@query(
    "events_user_counts",
    """
    SELECT event_type, count(DISTINCT user_id) AS n_users, count(*) AS n
    FROM events GROUP BY event_type
    """,
)
def q_user_counts(spark, sf_dir):
    """Exact distinct-count (the approximate path at 100 TB is
    approx_count_distinct/HLL — sketch algorithms differ across engines,
    so the oracle uses exact)."""
    ev = _t(spark, sf_dir, "events")
    return ev.groupBy("event_type").agg(
        F.countDistinct("user_id").alias("n_users"), F.count("*").alias("n")
    )


@query(
    "q5_local_supplier_revenue",
    """
    SELECT n_name, round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
    FROM customer
    JOIN orders ON c_custkey = o_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    JOIN supplier ON l_suppkey = s_suppkey
    JOIN nation ON s_nationkey = n_nationkey
    JOIN region ON n_regionkey = r_regionkey
    WHERE c_nationkey = s_nationkey
    GROUP BY n_name
    """,
)
def q_q5(spark, sf_dir):
    """TPC-H-Q5-shaped 6-way join (local-supplier revenue by nation):
    Catalyst handles join ordering; the three dimension tables broadcast,
    the customer⋈orders⋈lineitem chain shuffles on its keys, and the
    local-supplier predicate (c_nationkey = s_nationkey) applies as a
    post-join filter."""
    cust = _t(spark, sf_dir, "customer")
    orders = _t(spark, sf_dir, "orders")
    li = _t(spark, sf_dir, "lineitem")
    sup = _t(spark, sf_dir, "supplier")
    nation = _t(spark, sf_dir, "nation")
    region = _t(spark, sf_dir, "region")
    joined = (
        cust.join(orders, cust.c_custkey == orders.o_custkey)
        .join(li, orders.o_orderkey == li.l_orderkey)
        .join(F.broadcast(sup), li.l_suppkey == sup.s_suppkey)
        .join(F.broadcast(nation), sup.s_nationkey == nation.n_nationkey)
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
        .where(cust.c_nationkey == sup.s_nationkey)
    )
    return joined.groupBy("n_name").agg(
        F.round(F.sum(li.l_extendedprice * (1 - li.l_discount)), 2).alias("revenue")
    )


@query(
    "orders_per_quarter",
    """
    SELECT strftime(date_trunc('quarter', o_orderdate), '%Y-%m') AS quarter,
           count(*) AS n, round(sum(o_totalprice), 2) AS total
    FROM orders GROUP BY 1
    """,
)
def q_orders_per_quarter(spark, sf_dir):
    """Calendar-grain date arithmetic (date_trunc quarter) — the fixed-
    grain complement of the arbitrary-width time_bucket."""
    orders = _t(spark, sf_dir, "orders")
    return orders.groupBy(
        F.date_format(F.date_trunc("quarter", "o_orderdate"), "yyyy-MM").alias("quarter")
    ).agg(F.count("*").alias("n"), F.round(F.sum("o_totalprice"), 2).alias("total"))


_SQL_CORRELATED = """
    SELECT c_mktsegment, count(*) AS n_above
    FROM customer c
    WHERE c_acctbal > (SELECT avg(c_acctbal) FROM customer
                       WHERE c_mktsegment = c.c_mktsegment)
    GROUP BY c_mktsegment
"""


@query("sql_correlated_subquery", _SQL_CORRELATED)
def q_sql_correlated(spark, sf_dir):
    """Full-SQL surface (dataset.register_views + spark.sql): the
    IDENTICAL ANSI string runs on both engines — here a correlated
    scalar subquery, which Catalyst decorrelates into an aggregate +
    join. The reference has no SQL at all; exposing Spark SQL over the
    same tables is the engine's query-language parity story."""
    from parkour_spark.dataset import register_views

    register_views(spark, sf_dir, ("customer",))
    return spark.sql(_SQL_CORRELATED)


_SQL_WINDOW_TOPK = """
    SELECT c_mktsegment, c_custkey, c_acctbal, rk FROM (
      SELECT c_mktsegment, c_custkey, c_acctbal,
             CAST(row_number() OVER (PARTITION BY c_mktsegment
                                     ORDER BY c_acctbal DESC, c_custkey)
                  AS BIGINT) AS rk
      FROM customer) t
    WHERE rk <= 3
"""


@query("sql_window_topk", _SQL_WINDOW_TOPK)
def q_sql_window_topk(spark, sf_dir):
    """Identical-ANSI window function through the USER SQL affordance
    (Pipeline.sql — r7 verdict #7): the pipeline's own DataFrame is
    registered as the view the SQL names, and the SAME string runs on
    DuckDB. Partitioned rank (no global window), total-order
    tie-break, BIGINT-cast rank per the oracle-determinism rules."""
    from parkour_spark.plans.pipeline import Pipeline

    return (
        Pipeline.input(_t(spark, sf_dir, "customer"))
        .sql(_SQL_WINDOW_TOPK, name="customer")
        .df
    )


_SQL_GROUPING_SETS = """
    SELECT coalesce(o_orderpriority, 'ALL') AS priority,
           coalesce(o_orderstatus, 'ALL') AS status,
           count(*) AS n,
           CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT)
             AS total_cents
    FROM orders
    GROUP BY GROUPING SETS ((o_orderpriority, o_orderstatus),
                            (o_orderpriority), ())
"""


@query("sql_grouping_sets", _SQL_GROUPING_SETS)
def q_sql_grouping_sets(spark, sf_dir):
    """Identical-ANSI GROUPING SETS through the USER SQL affordance
    (Dataset.view — r7 verdict #7): a path-backed user Dataset becomes
    SQL-addressable with one call, and the SAME string (multi-grain
    rollup in one shuffle via Catalyst's Expand) runs on DuckDB.
    Integer cents per the oracle-determinism rules; both columns are
    non-null so the coalesce labels are unambiguous."""
    from parkour_spark.dataset import Dataset

    Dataset(spark, path=f"{sf_dir}/orders.parquet").view("orders")
    return spark.sql(_SQL_GROUPING_SETS)


_SQL_RUNNING_TOTAL = """
    SELECT user_id, event_id,
           CAST(sum(CAST(floor(value) AS BIGINT)) OVER (
             PARTITION BY user_id ORDER BY ts, event_id
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
             AS BIGINT) AS running_floor_value
    FROM events
"""


@query("sql_running_total", _SQL_RUNNING_TOTAL)
def q_sql_running_total(spark, sf_dir):
    """Identical-ANSI running-total window frame (register_views +
    spark.sql): per-user cumulative sum with an explicit ROWS frame and
    a (ts, event_id) total order — integer-exact (floored values) so
    the cumulative sums hash identically on both engines. Partitioned
    by user_id: no global window, scales with the user dimension."""
    from parkour_spark.dataset import register_views

    register_views(spark, sf_dir, ("events",))
    return spark.sql(_SQL_RUNNING_TOTAL)


_SQL_STAR_JOIN = """
    SELECT r_name AS region, n_name AS nation,
           count(*) AS n_orders,
           CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT)
             AS revenue_cents
    FROM orders
    JOIN customer ON o_custkey = c_custkey
    JOIN nation ON c_nationkey = n_nationkey
    JOIN region ON n_regionkey = r_regionkey
    GROUP BY r_name, n_name
"""


@query("sql_star_join", _SQL_STAR_JOIN)
def q_sql_star_join(spark, sf_dir):
    """Identical-ANSI broadcast star join through the USER SQL surface
    (register_views + spark.sql — r8 verdict #8: the join family is
    where user SQL meets the optimizer): the orders fact joins three
    progressively smaller dims. Catalyst broadcasts every dim side
    (all under the autoBroadcastJoinThreshold), so the fact table is
    scanned ONCE with zero fact-side shuffles before the final
    partial-agg — at 100 TB the orders scan streams through three
    broadcast hash joins executor-side, and only (region, nation)
    partial aggregates shuffle. Integer cents per the
    oracle-determinism rules."""
    from parkour_spark.dataset import register_views

    register_views(
        spark, sf_dir, ("orders", "customer", "nation", "region")
    )
    return spark.sql(_SQL_STAR_JOIN)


_SQL_EXISTS_SEMI = """
    SELECT c_mktsegment AS segment, count(*) AS n_customers
    FROM customer c
    WHERE EXISTS (SELECT 1 FROM orders o
                  WHERE o.o_custkey = c.c_custkey
                    AND o.o_orderpriority = '1-URGENT')
    GROUP BY c_mktsegment
"""


@query("sql_exists_semi", _SQL_EXISTS_SEMI)
def q_sql_exists_semi(spark, sf_dir):
    """Identical-ANSI correlated EXISTS through the USER SQL surface
    (Pipeline.sql — r8 verdict #8): Catalyst rewrites the correlated
    predicate into a LEFT SEMI join (RewritePredicateSubquery), so the
    user's declarative EXISTS gets the same plan as the DataFrame
    semi-join entry (`active_automobile_customers`) — one equi-join
    that keeps only the probe side's columns, never materializing the
    match multiplicity. The priority filter pushes into the orders
    scan before the join."""
    from parkour_spark.plans.pipeline import Pipeline

    from parkour_spark.dataset import register_views

    register_views(spark, sf_dir, ("orders",))
    return (
        Pipeline.input(_t(spark, sf_dir, "customer"))
        .sql(_SQL_EXISTS_SEMI, name="customer")
        .df
    )


_SQL_NOT_EXISTS_ANTI = """
    SELECT c_mktsegment AS segment, count(*) AS n_customers
    FROM customer c
    WHERE NOT EXISTS (SELECT 1 FROM orders o
                      WHERE o.o_custkey = c.c_custkey
                        AND o.o_orderpriority = '1-URGENT')
    GROUP BY c_mktsegment
"""


@query("sql_not_exists_anti", _SQL_NOT_EXISTS_ANTI)
def q_sql_not_exists_anti(spark, sf_dir):
    """Identical-ANSI NOT EXISTS through the USER SQL surface
    (register_views + spark.sql): the anti-join complement of
    `sql_exists_semi` — Catalyst plans a LEFT ANTI join, the
    declarative form of `customers_without_urgent_orders`. Together
    the pair pins that BOTH subquery polarities survive the rewrite
    with cross-engine-identical results (NULL-handling in anti joins
    is the classic engine-divergence trap; o_custkey is non-null
    here, the well-defined case)."""
    from parkour_spark.dataset import register_views

    register_views(spark, sf_dir, ("customer", "orders"))
    return spark.sql(_SQL_NOT_EXISTS_ANTI)


@query(
    "approx_user_counts",
    """
    SELECT event_type,
           count(DISTINCT user_id) AS n_users,
           true AS sketch_ok,
           count(*) AS n
    FROM events GROUP BY event_type
    """,
)
def q_approx_user_counts(spark, sf_dir):
    """HyperLogLog distinct-count sketch (approx_count_distinct) — the
    100 TB path for `events_user_counts`: mergeable fixed-size sketch
    instead of an exact distinct shuffle. HLL register layouts differ
    across engines, so the ESTIMATE can't be hash-compared; the query
    is bound-checked instead (same pattern as approx_price_quantiles):
    it emits the exact distinct count (true cross-engine value check)
    plus `sketch_ok` = estimate within 3×rsd of exact, pinned to `true`
    by the oracle. Production uses the sketch alone — the exact count
    here exists only for verification."""
    ev = _t(spark, sf_dir, "events")
    agged = ev.groupBy("event_type").agg(
        F.approx_count_distinct("user_id", rsd=0.02).alias("__approx"),
        F.count_distinct("user_id").alias("n_users"),
        F.count("*").alias("n"),
    )
    ok = (
        F.abs(F.col("__approx").cast("double") - F.col("n_users"))
        <= F.lit(3 * 0.02) * F.col("n_users")
    )
    return agged.select("event_type", "n_users", ok.alias("sketch_ok"), "n")


@query(
    "approx_price_quantiles",
    """
    SELECT c_mktsegment,
           CAST(round(CAST(quantile_cont(o_totalprice, 0.25) AS DECIMAL(18,3)), 2) AS DOUBLE) AS p25,
           CAST(round(CAST(quantile_cont(o_totalprice, 0.50) AS DECIMAL(18,3)), 2) AS DOUBLE) AS p50,
           CAST(round(CAST(quantile_cont(o_totalprice, 0.75) AS DECIMAL(18,3)), 2) AS DOUBLE) AS p75,
           true AS sketch_ok,
           count(*) AS n
    FROM orders JOIN customer ON o_custkey = c_custkey
    GROUP BY c_mktsegment
    """,
)
def q_approx_quantiles(spark, sf_dir):
    """Mergeable quantile sketch (approx_percentile) — the 100 TB path
    for `price_quantiles_by_segment` (exact rank selection doesn't
    scale). Sketch register layouts differ across engines, so the sketch
    VALUES can't be hash-compared; instead (r2 verdict) the query is
    bound-checked: it emits the EXACT interpolated percentiles (Spark's
    `percentile` ≡ DuckDB's `quantile_cont` — a true cross-engine value
    check) plus `sketch_ok` = every approx_percentile estimate within
    0.5% of its exact value, which the oracle pins to `true`. The exact
    computation exists only for verification; production uses the
    mergeable sketch alone."""
    cust = _t(spark, sf_dir, "customer")
    orders = _t(spark, sf_dir, "orders")
    joined = orders.join(
        cust.select(F.col("c_custkey").alias("o_custkey"), "c_mktsegment"),
        "o_custkey",
    )
    agged = joined.groupBy("c_mktsegment").agg(
        F.percentile("o_totalprice", F.lit([0.25, 0.5, 0.75])).alias("__ex"),
        F.approx_percentile("o_totalprice", [0.25, 0.5, 0.75], 10000).alias("__q"),
        F.count("*").alias("n"),
    )
    within = [
        (
            F.abs(F.col("__q")[i] - F.col("__ex")[i])
            <= F.lit(0.005) * F.abs(F.col("__ex")[i])
        )
        for i in range(3)
    ]
    # Scalar columns (not array<double>) so downstream canonicalizers can
    # sort/hash the result row-wise. The interpolated midpoint can land
    # exactly on a x.xx5 two-decimal rounding boundary, where the
    # engines' (1-ulp-apart) doubles round in opposite directions; the
    # decimal(18,3) cast first absorbs that — its 1e-3 rounding decision
    # sits 6 orders of magnitude away from the 1e-9 interpolation noise.
    def _p(i):
        return F.round(F.col("__ex")[i].cast("decimal(18,3)"), 2).cast("double")

    return agged.select(
        "c_mktsegment",
        _p(0).alias("p25"),
        _p(1).alias("p50"),
        _p(2).alias("p75"),
        (within[0] & within[1] & within[2]).alias("sketch_ok"),
        "n",
    )


@query(
    "salted_join_agg",
    """
    SELECT o_orderpriority, count(*) AS n, round(sum(l_extendedprice), 2) AS total
    FROM lineitem JOIN orders ON l_orderkey = o_orderkey
    GROUP BY o_orderpriority
    """,
)
def q_salted_join(spark, sf_dir):
    """Skew-aware salted join (operators.joins.salted_join): a sampled
    frequency pre-pass detects hot keys; only those are salted across
    num_salts shuffle partitions, everything else takes the plain-join
    plan (zero replication overhead when, as here, no key is skewed).
    Row-identical to the plain join either way, so the oracle is the
    unsalted SQL; the forced-hot path is plan- and row-asserted in
    tests/test_joins.py."""
    li = _t(spark, sf_dir, "lineitem")
    orders = _t(spark, sf_dir, "orders").select(
        F.col("o_orderkey").alias("l_orderkey"), "o_orderpriority"
    )
    joined = J.salted_join(li, orders, "l_orderkey", num_salts=8)
    return joined.groupBy("o_orderpriority").agg(
        F.count("*").alias("n"), F.round(F.sum("l_extendedprice"), 2).alias("total")
    )


@query(
    "time_bucket_rollup",
    """
    SELECT make_timestamp((floor(epoch_us(ts) / 900000000) * 900000000)::BIGINT) AS bucket,
           event_type, count(*) AS n, round(sum(value), 2) AS total
    FROM events GROUP BY bucket, event_type
    """,
)
def q_time_bucket(spark, sf_dir):
    """Hypertable-style rollup (functions.timeops.time_bucket):
    arbitrary-width (15 min) buckets via exact microsecond arithmetic —
    one shuffle, map-side partial agg."""
    from parkour_spark.functions.timeops import time_bucket

    ev = _t(spark, sf_dir, "events")
    return ev.groupBy(
        time_bucket("ts", 900).alias("bucket"), "event_type"
    ).agg(F.count("*").alias("n"), F.round(F.sum("value"), 2).alias("total"))


@query(
    "grouping_sets_priority_status",
    """
    SELECT coalesce(o_orderpriority, '(all)') AS priority,
           coalesce(o_orderstatus, '(all)') AS status,
           count(*) AS n
    FROM orders
    GROUP BY GROUPING SETS ((o_orderpriority), (o_orderstatus), ())
    """,
)
def q_grouping_sets(spark, sf_dir):
    """Explicit GROUPING SETS (beyond rollup/cube): per-priority,
    per-status, and grand-total rows in one pass."""
    orders = _t(spark, sf_dir, "orders")
    return (
        orders.groupingSets(
            [["o_orderpriority"], ["o_orderstatus"], []],
            "o_orderpriority",
            "o_orderstatus",
        )
        .agg(F.count("*").alias("n"))
        .select(
            F.coalesce("o_orderpriority", F.lit("(all)")).alias("priority"),
            F.coalesce("o_orderstatus", F.lit("(all)")).alias("status"),
            F.col("n"),
        )
    )


@query(
    "order_price_ranks",
    """
    SELECT o_orderkey,
           ntile(4) OVER w AS quartile,
           round(percent_rank() OVER w, 6) AS pr,
           round(cume_dist() OVER w, 6) AS cd
    FROM orders
    WINDOW w AS (PARTITION BY o_orderpriority ORDER BY o_totalprice, o_orderkey)
    """,
)
def q_price_ranks(spark, sf_dir):
    """Ranking-window family: ntile / percent_rank / cume_dist per
    priority group."""
    orders = _t(spark, sf_dir, "orders")
    w = Window.partitionBy("o_orderpriority").orderBy("o_totalprice", "o_orderkey")
    return orders.select(
        "o_orderkey",
        F.ntile(4).over(w).alias("quartile"),
        F.round(F.percent_rank().over(w), 6).alias("pr"),
        F.round(F.cume_dist().over(w), 6).alias("cd"),
    )


# ===========================================================================
# Streaming (Structured Streaming over a finite file source, full oracle)
# ===========================================================================


@query(
    "streaming_events_hourly",
    """
    SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H') AS hour, event_type,
           count(*) AS n, round(sum(value), 2) AS total
    FROM events GROUP BY 1, 2
    """,
)
def q_streaming_hourly(spark, sf_dir):
    """The tumbling-window streaming aggregation, driven to completion
    over a finite file source (memory sink, complete mode) — result is
    provably identical to the batch query, which is the oracle."""
    import tempfile

    from parkour_spark.streaming.windows import read_stream, run_to_completion, tumbling_agg

    ev = _t(spark, sf_dir, "events")
    tmp = tempfile.mkdtemp(prefix="parkour_stream_")
    ev.write.mode("overwrite").parquet(tmp)
    stream = read_stream(spark, tmp, ev.schema, max_files=4)
    agg = tumbling_agg(
        stream,
        "ts",
        "1 hour",
        ["event_type"],
        [F.count("*").alias("n"), F.round(F.sum("value"), 2).alias("total")],
    )
    result = run_to_completion(agg, output_mode="complete")
    return result.select(
        F.date_format(F.col("window.start"), "yyyy-MM-dd HH").alias("hour"),
        "event_type",
        "n",
        "total",
    )


@query(
    "streaming_sliding_30m",
    """
    WITH w AS (
      SELECT make_timestamp(((floor(epoch_us(ts) / 1800000000) * 1800000000)
                             - off)::BIGINT) AS wstart,
             event_type, value
      FROM events, (SELECT unnest([0, 1800000000]) AS off) offs)
    SELECT strftime(wstart, '%Y-%m-%d %H:%M') AS wstart, event_type,
           count(*) AS n, round(sum(value), 2) AS total
    FROM w GROUP BY 1, 2
    """,
)
def q_streaming_sliding(spark, sf_dir):
    """Sliding-window streaming aggregation (1 h window, 30 min slide)
    driven over a finite file source. Each event lands in exactly
    window/slide = 2 epoch-aligned windows; the oracle materializes both
    window starts per event and aggregates — provably the same
    assignment Spark's F.window(ts, w, s) makes."""
    import tempfile

    from parkour_spark.streaming.windows import read_stream, run_to_completion, sliding_agg

    ev = _t(spark, sf_dir, "events")
    tmp = tempfile.mkdtemp(prefix="parkour_stream_")
    ev.write.mode("overwrite").parquet(tmp)
    stream = read_stream(spark, tmp, ev.schema, max_files=4)
    agg = sliding_agg(
        stream,
        "ts",
        "1 hour",
        "30 minutes",
        ["event_type"],
        [F.count("*").alias("n"), F.round(F.sum("value"), 2).alias("total")],
    )
    result = run_to_completion(agg, output_mode="complete")
    return result.select(
        F.date_format(F.col("window.start"), "yyyy-MM-dd HH:mm").alias("wstart"),
        "event_type",
        "n",
        "total",
    )


@query(
    "streaming_session_30m",
    """
    WITH g AS (
      SELECT user_id, ts, value, event_id,
             CASE WHEN lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL
                  OR epoch_us(ts) - lag(epoch_us(ts)) OVER (PARTITION BY user_id ORDER BY ts, event_id)
                     >= 1800000000
                  THEN 1 ELSE 0 END AS new_s
      FROM events),
    s AS (SELECT user_id, ts, value,
                 sum(new_s) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                  ROWS UNBOUNDED PRECEDING) AS sid
          FROM g)
    SELECT user_id, strftime(min(ts), '%Y-%m-%d %H:%M:%S') AS session_start,
           count(*) AS n, round(sum(value), 2) AS total
    FROM s GROUP BY user_id, sid
    """,
)
def q_streaming_session(spark, sf_dir):
    """Session-window streaming aggregation (30 min inactivity gap) per
    user over a finite file source. Oracle is the batch gaps-and-islands
    rewrite; a new session starts when the gap is >= the timeout
    (Spark's session windows are [start, last+gap) — an event at exactly
    last+gap does not overlap, hence >=)."""
    import tempfile

    from parkour_spark.streaming.windows import read_stream, run_to_completion, session_agg

    ev = _t(spark, sf_dir, "events")
    tmp = tempfile.mkdtemp(prefix="parkour_stream_")
    ev.write.mode("overwrite").parquet(tmp)
    stream = read_stream(spark, tmp, ev.schema, max_files=4)
    agg = session_agg(
        stream,
        "ts",
        "30 minutes",
        ["user_id"],
        [F.count("*").alias("n"), F.round(F.sum("value"), 2).alias("total")],
    )
    result = run_to_completion(agg, output_mode="complete")
    return result.select(
        "user_id",
        F.date_format(F.col("session_window.start"), "yyyy-MM-dd HH:mm:ss").alias(
            "session_start"
        ),
        "n",
        "total",
    )


@query(
    "streaming_stateful_user_counts",
    """
    SELECT user_id, count(*) AS n_events FROM events GROUP BY user_id
    """,
)
def q_streaming_stateful(spark, sf_dir):
    """Custom stateful streaming operator (applyInPandasWithState): a
    per-user running event counter carried across micro-batches — the
    reference's arbitrary-function reduce task on an unbounded stream.
    The per-micro-batch state evolution is not SQL, but its FINAL state
    over the finite replay is exactly the batch per-user count — that
    batch SQL is the oracle (r2 verdict promoted it from the test-level
    assertion in tests/test_sources_streaming.py to the driver gate)."""
    import pandas as pd
    import tempfile

    from parkour_spark.streaming.windows import read_stream, run_to_completion, stateful_apply

    ev = _t(spark, sf_dir, "events")
    tmp = tempfile.mkdtemp(prefix="parkour_stream_")
    ev.write.mode("overwrite").parquet(tmp)
    stream = read_stream(spark, tmp, ev.schema, max_files=8)

    def count_updates(key, pdf_iter, state):
        seen = state.get[0] if state.exists else 0
        for pdf in pdf_iter:
            seen += len(pdf)
        state.update((seen,))
        yield pd.DataFrame({"user_id": [key[0]], "n_events": [seen]})

    counted = stateful_apply(
        stream.select("user_id", "event_id"),
        ["user_id"],
        count_updates,
        "user_id bigint, n_events bigint",
        "n bigint",
        output_mode="update",
    )
    result = run_to_completion(counted, output_mode="update")
    # memory sink in update mode keeps every emitted row; the final
    # count per user is the max across micro-batch emissions
    return result.groupBy("user_id").agg(F.max("n_events").alias("n_events"))


# ===========================================================================
# Multimodal (binary payload plumbing; codecs stubbed — see operators.multimodal)
# ===========================================================================


@query(
    "multimodal_fingerprint",
    """
    SELECT doc_id AS media_id, md5(text) AS fp FROM documents
    """,
)
def q_multimodal_fp(spark, sf_dir):
    """Binary-payload exact-dedup fingerprint: documents' text bytes
    stand in for blobs (no codec in this container); md5 runs JVM-side
    over the binary column — blobs never shuffle."""
    from parkour_spark.operators.multimodal import binary_fingerprint

    blobs = _t(spark, sf_dir, "documents").select(
        F.col("doc_id").alias("media_id"), F.encode("text", "UTF-8").alias("payload")
    )
    return binary_fingerprint(blobs).select("media_id", "fp")


@query(
    "multimodal_features",
    """
    WITH h AS (SELECT doc_id AS media_id, sha256(text) AS hx FROM documents),
    f AS (SELECT media_id,
                 list_transform(range(1, 17), i ->
                   CAST(CAST('0x' || substr(hx, CAST(2*i-1 AS INT), 2) AS INT)
                        / 255.0 AS FLOAT)) AS fs
          FROM h)
    SELECT media_id,
           len(fs) AS n_features,
           round(CAST(fs[1] AS DOUBLE), 6) AS f0,
           round(list_sum(list_transform(fs, x -> CAST(x AS DOUBLE))), 6)
             AS feature_sum
    FROM f
    """,
)
def q_multimodal_features(spark, sf_dir):
    """Arrow-batched decode→features over mapInPandas. The decode step
    is a deterministic sha256-seeded stub (no image codec ships in this
    container) — which makes it ORACLE-ABLE: DuckDB's sha256 reproduces
    the fake decoder byte-for-byte (hex pairs → byte/255.0 → float32),
    so the full mapInPandas plumbing (schema, Arrow batching, null
    handling) is hash-verified cross-engine, not just rows-counted
    (r2 verdict). The feature VECTOR is projected to scalars (dim,
    first component, checksum) because downstream canonicalizers
    sort/hash row values — an array column is unhashable there (driver
    r01 err on approx_price_quantiles)."""
    from parkour_spark.operators.multimodal import decode_image_features

    blobs = _t(spark, sf_dir, "documents").select(
        F.col("doc_id").alias("media_id"), F.encode("text", "UTF-8").alias("payload")
    )
    feats = decode_image_features(blobs)
    return feats.select(
        "media_id",
        F.size("features").alias("n_features"),
        # cast BEFORE round: round() on a raw float32 stays float32, whose
        # repr ("0.00392200006172061") diverges from the oracle's double
        F.round(F.col("features")[0].cast("double"), 6).alias("f0"),
        F.round(F.aggregate("features", F.lit(0.0), lambda a, x: a + x), 6).alias(
            "feature_sum"
        ),
    )


# ===========================================================================
# LLM-pipeline: text analysis
# ===========================================================================

_STOP_SQL = ", ".join(f"'{w}'" for w in EN_STOPWORDS)
_TOKS_SQL = "list_filter(string_split_regex(lower(trim(text)), '\\s+'), x -> x <> '')"


@query(
    "token_stats",
    f"""
    SELECT doc_id,
           len({_TOKS_SQL}) AS n_tokens,
           length(text) AS n_chars,
           round(list_sum(list_transform({_TOKS_SQL}, t -> length(t)))::DOUBLE
                 / len({_TOKS_SQL}), 4) AS avg_tok_len
    FROM documents
    """,
)
def q_token_stats(spark, sf_dir):
    docs = _t(spark, sf_dir, "documents")
    return docs.select(
        "doc_id",
        token_count("text").alias("n_tokens"),
        F.length("text").alias("n_chars"),
        F.round(avg_token_len("text"), 4).alias("avg_tok_len"),
    )


@query(
    "lang_id",
    f"""
    SELECT doc_id,
           CASE WHEN len(list_filter({_TOKS_SQL}, x -> x IN ({_STOP_SQL})))::DOUBLE
                     / len({_TOKS_SQL}) >= 0.05
                THEN 'en' ELSE 'unk' END AS lang_pred
    FROM documents
    """,
)
def q_lang_id(spark, sf_dir):
    docs = _t(spark, sf_dir, "documents")
    return docs.select("doc_id", langid_en("text").alias("lang_pred"))


@query(
    "quality_scores",
    f"""
    SELECT doc_id,
           (least(length(text) * 8, 4000)
            + CASE WHEN len({_TOKS_SQL}) > 0
                   THEN floor(3000.0 * least(len(list_filter({_TOKS_SQL},
                                x -> x IN ({_STOP_SQL}))) * 10, len({_TOKS_SQL}))
                              / len({_TOKS_SQL}))
                   ELSE 0 END
            + CASE WHEN list_sum(list_transform({_TOKS_SQL}, t -> length(t)))::DOUBLE
                        / len({_TOKS_SQL}) BETWEEN 3.0 AND 10.0
                   THEN 3000 ELSE 0 END) / 10000.0 AS quality
    FROM documents
    """,
)
def q_quality(spark, sf_dir):
    docs = _t(spark, sf_dir, "documents")
    return docs.select("doc_id", quality_score("text").alias("quality"))


@query(
    "doc_fingerprints",
    """
    SELECT doc_id, md5(regexp_replace(lower(trim(text)), '\\s+', ' ', 'g')) AS fp
    FROM documents
    """,
)
def q_fingerprints(spark, sf_dir):
    docs = _t(spark, sf_dir, "documents")
    return docs.select("doc_id", fingerprint("text").alias("fp"))


@query(
    "subword_token_count",
    """
    SELECT doc_id,
           len(regexp_extract_all(text, ' ?[A-Za-z]+| ?[0-9]+| ?[^A-Za-z0-9\\s]+')) AS n_subwords,
           len(regexp_extract_all(text, '\\S+')) AS n_ws_tokens
    FROM documents
    """,
)
def q_subword_count(spark, sf_dir):
    """BPE-ish token counting (functions.text.subword_count): GPT-2-style
    pre-tokenizer runs counted JVM-side with regexp_count — the LLM
    token-budget proxy, next to the plain whitespace count."""
    from parkour_spark.functions.text import subword_count

    docs = _t(spark, sf_dir, "documents")
    return docs.select(
        "doc_id",
        subword_count("text").alias("n_subwords"),
        token_count("text").alias("n_ws_tokens"),
    )


@query(
    "lang_id_ngram",
    """
    SELECT doc_id,
           CASE WHEN len(regexp_extract_all(lower(text),
                    '(the|and|ing|ion|ent|her|for|tha|hat|ere)')) * 20.0
                     / greatest(length(text), 1) >= 1.0
                THEN 'en' ELSE 'unk' END AS lang_pred
    FROM documents
    """,
)
def q_lang_id_ngram(spark, sf_dir):
    """Character-trigram language ID (functions.text.langid_ngram):
    density of frequent English trigrams — the n-gram-profile heuristic,
    complementing the stopword-ratio variant in `lang_id`."""
    from parkour_spark.functions.text import langid_ngram

    docs = _t(spark, sf_dir, "documents")
    return docs.select("doc_id", langid_ngram("text").alias("lang_pred"))


@query(
    "winnow_fingerprints",
    """
    WITH norm AS (
      SELECT doc_id, regexp_replace(lower(trim(text)), '\\s+', ' ', 'g') AS nt
      FROM documents),
    grams AS (
      SELECT doc_id,
             list_transform(range(1, greatest(length(nt) - 7, 1) + 1),
               i -> ('0x' || substr(md5(substr(nt, i, 8)), 1, 8))::BIGINT) AS g
      FROM norm),
    fps AS (
      SELECT doc_id,
             list_distinct(list_transform(range(1, greatest(len(g) - 7, 1) + 1),
               j -> list_min(g[j:j+7]))) AS fp_set
      FROM grams)
    SELECT doc_id, unnest(fp_set) AS fp FROM fps
    """,
)
def q_winnow(spark, sf_dir):
    """Winnowing fingerprints (functions.text.kgram_hashes +
    winnow_select): k=8 char-gram rolling hashes, w=8 window minima,
    exploded to (doc_id, fp) — substring-overlap detection becomes an
    equi-join on fp."""
    from parkour_spark.functions.text import (
        normalize_text,
        winnow_text_arrow,
    )
    from parkour_spark.operators.sort import widen_scan

    docs = widen_scan(_t(spark, sf_dir, "documents"))
    normed = docs.select(F.col("doc_id"), normalize_text("text").alias("__nt"))
    # fused kgram+winnow (r13): result-identical to kgram_hashes →
    # winnow_pos_arrow (r12) → winnow_select — see winnow_text_arrow
    fps = winnow_text_arrow(normed, "doc_id", "__nt", k=8, w=8, out="__fps",
                            positions=False)
    # explode_outer, NOT explode: plain explode adds a size(arr)>0 filter
    # that predicate-pushdown rewrites below the staged projections,
    # inlining the whole three-stage lambda pipeline into one giant
    # Filter expression (compile explosion). The fp set is never empty,
    # so the two are semantically identical here.
    return fps.select("doc_id", F.explode_outer("__fps").alias("fp"))


# ===========================================================================
# LLM-pipeline: dedup
# ===========================================================================


@query(
    "dedup_exact",
    """
    SELECT md5(regexp_replace(lower(trim(text)), '\\s+', ' ', 'g')) AS fp,
           min(doc_id) AS keep_id, count(*) AS n_dups
    FROM documents GROUP BY 1
    """,
)
def q_dedup_exact(spark, sf_dir):
    return D.exact_dedup(_t(spark, sf_dir, "documents"))


_DTOKS_SQL = f"list_distinct({_TOKS_SQL})"
# 3-gram word shingles over the token list (mirrors functions.text.shingles)
_SHINGLES_SQL = (
    f"list_distinct(list_transform(range(1, greatest(len({_TOKS_SQL}) - 3, 0) + 2), "
    f"i -> array_to_string(list_slice({_TOKS_SQL}, i, i + 2), ' ')))"
)


def _minhash_oracle(num_hashes: int = 12, bands: int = 4, threshold: float = 0.8) -> str:
    from parkour_spark.operators.dedup import MINHASH_P, minhash_params

    rpb = num_hashes // bands
    # mirrors operators.dedup.minhash_signature: one md5 per shingle,
    # x = hex[1:8] mod P, sig_i = min((a_i*x + b_i) mod P)
    x = f"(('0x' || substr(md5(x), 1, 8))::BIGINT % {MINHASH_P})"
    sig_cols = ",\n       ".join(
        f"list_min(list_transform(t, x -> ({a} * {x} + {b}) % {MINHASH_P})) AS sig_{i}"
        for i, (a, b) in enumerate(minhash_params(num_hashes))
    )
    band_keys = ", ".join(
        "'" + str(b) + "|' || " + " || '|' || ".join(f"sig_{b * rpb + r}" for r in range(rpb))
        for b in range(bands)
    )
    return f"""
    WITH toks AS (SELECT doc_id, {_SHINGLES_SQL} AS t FROM documents),
    sigs AS (SELECT doc_id, {sig_cols} FROM toks),
    bands AS (SELECT doc_id, unnest([{band_keys}]) AS band_key FROM sigs),
    cand AS (
      SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
      FROM bands a JOIN bands b USING (band_key)
      WHERE a.doc_id < b.doc_id
    )
    SELECT id_a, id_b,
           round(len(list_intersect(ta.t, tb.t))::DOUBLE
                 / len(list_distinct(list_concat(ta.t, tb.t))), 4) AS jaccard
    FROM cand
    JOIN toks ta ON cand.id_a = ta.doc_id
    JOIN toks tb ON cand.id_b = tb.doc_id
    WHERE len(list_intersect(ta.t, tb.t))::DOUBLE
          / len(list_distinct(list_concat(ta.t, tb.t))) >= {threshold}
    """


@query("dedup_minhash_lsh", _minhash_oracle())
def q_minhash(spark, sf_dir):
    """MinHash+LSH near-dup on 3-gram shingles: md5-min signatures →
    banded buckets → equi-join candidates → exact Jaccard verify
    (operators.dedup)."""
    return D.minhash_dedup_pairs(_t(spark, sf_dir, "documents"), threshold=0.8)


@query(
    "dedup_ngram_jaccard",
    f"""
    WITH toks AS (SELECT doc_id, {_SHINGLES_SQL} AS t FROM documents),
    ex AS (SELECT doc_id, len(t) AS n, unnest(t) AS tok FROM toks),
    shared AS (
      SELECT a.doc_id AS id_a, b.doc_id AS id_b, a.n AS n_a, b.n AS n_b,
             count(*) AS ns
      FROM ex a JOIN ex b USING (tok)
      WHERE a.doc_id < b.doc_id
      GROUP BY 1, 2, 3, 4)
    SELECT id_a, id_b, round(ns::DOUBLE / (n_a + n_b - ns), 4) AS jaccard
    FROM shared WHERE ns::DOUBLE / (n_a + n_b - ns) >= 0.8
    """,
)
def q_ngram_jaccard(spark, sf_dir):
    """Exact all-pairs 3-gram-shingle Jaccard ≥ 0.8 via shingle inverted
    index — |A∩B| from a token equi-join, never cartesian. The oracle
    mirrors the inverted-index rewrite (an earlier brute-force oracle
    was itself O(n²) and timed out at sf0.1 — the oracle must scale with
    the operator it checks)."""
    return D.ngram_jaccard_pairs(_t(spark, sf_dir, "documents"), threshold=0.8)


@query(
    "dedup_ngram_jaccard_capped",
    f"""
    WITH toks AS (SELECT doc_id, {_SHINGLES_SQL} AS t FROM documents),
    ex AS (SELECT doc_id, unnest(t) AS tok FROM toks),
    rare AS (SELECT tok FROM (SELECT tok, count(*) AS df FROM ex GROUP BY tok)
             WHERE df <= 50),
    rex AS (SELECT doc_id, tok FROM ex JOIN rare USING (tok)),
    cand AS (SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
             FROM rex a JOIN rex b USING (tok) WHERE a.doc_id < b.doc_id),
    scored AS (
      SELECT id_a, id_b,
             len(list_intersect(ta.t, tb.t))::DOUBLE
               / len(list_distinct(list_concat(ta.t, tb.t))) AS jac
      FROM cand
      JOIN toks ta ON cand.id_a = ta.doc_id
      JOIN toks tb ON cand.id_b = tb.doc_id)
    SELECT id_a, id_b, round(jac, 4) AS jaccard FROM scored WHERE jac >= 0.8
    """,
)
def q_ngram_jaccard_capped(spark, sf_dir):
    """df-capped candidate generation for shingle Jaccard
    (dedup.ngram_jaccard_pairs_capped): candidates must share a RARE
    shingle (df ≤ 50), bounding the inverted-index fan-out to
    cap · Σ df (linear in corpus size) instead of Σ df² — the scale
    path for the 100× blow-up the uncapped join showed at the r3 sf1
    soak. Scores stay EXACT (full-set verify on candidates only); the
    oracle mirrors the df filter so the recall condition is identical
    cross-engine. Capped equals uncapped output at sf0.01 (asserted in
    tests/test_r3_fixes.py)."""
    return D.ngram_jaccard_pairs_capped(
        _t(spark, sf_dir, "documents"), threshold=0.8, max_df=50
    )


@query(
    "dedup_prefix_filter",
    f"""
    WITH toks AS (SELECT doc_id, {_SHINGLES_SQL} AS t FROM documents),
    ex AS (SELECT doc_id, len(t) AS n, unnest(t) AS tok FROM toks),
    dfs AS (SELECT tok, count(*)::BIGINT AS df FROM ex GROUP BY tok),
    ranked AS (
      SELECT doc_id, n, tok,
             row_number() OVER (PARTITION BY doc_id ORDER BY df, tok) AS pos
      FROM ex JOIN dfs USING (tok)),
    pref AS (SELECT doc_id, tok FROM ranked
             WHERE pos <= n - ((4 * n + 4) // 5) + 1),
    cand AS (SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
             FROM pref a JOIN pref b USING (tok) WHERE a.doc_id < b.doc_id),
    scored AS (
      SELECT id_a, id_b,
             len(list_intersect(ta.t, tb.t))::DOUBLE
               / len(list_distinct(list_concat(ta.t, tb.t))) AS jac
      FROM cand
      JOIN toks ta ON cand.id_a = ta.doc_id
      JOIN toks tb ON cand.id_b = tb.doc_id)
    SELECT id_a, id_b, round(jac, 4) AS jaccard FROM scored WHERE jac >= 0.8
    """,
)
def q_prefix_filter(spark, sf_dir):
    """EXACT prefix-filtering similarity self-join (SSJoin/PPJoin
    class, dedup.prefix_filter_pairs): candidates must share a token
    within each doc's rarest-first PREFIX of length n − ⌈0.8·n⌉ + 1 —
    provably complete (no recall caveat, unlike the df-capped path)
    while the quadratic join fan-out concentrates on each doc's
    globally rarest shingles. Threshold is the rational 4/5, so every
    prefix boundary is integer arithmetic in both engines; output
    equals the uncapped inverted-index join exactly (asserted in
    tests/test_prefix_filter.py)."""
    return D.prefix_filter_pairs(
        _t(spark, sf_dir, "documents"), threshold_num=4, threshold_den=5
    )


def _simhash_oracle(bits: int = 16, max_hamming: int = 3) -> str:
    hexpos = "0123456789abcdef"
    nib = lambda i: f"(strpos('{hexpos}', substr(md5(t), {i}, 1)) - 1)"
    th = f"({nib(1)} * 4096 + {nib(2)} * 256 + {nib(3)} * 16 + {nib(4)})"
    votes = ",\n      ".join(
        f"CASE WHEN list_sum(list_transform(th, h -> CASE WHEN (h & {1 << b}) != 0 THEN 1 ELSE -1 END)) > 0"
        f" THEN {1 << b} ELSE 0 END AS v{b}"
        for b in range(bits)
    )
    total = " + ".join(f"v{b}" for b in range(bits))
    return f"""
    WITH sh AS (SELECT doc_id, {_SHINGLES_SQL} AS s FROM documents),
    th AS (SELECT doc_id, list_transform(s, t -> {th}) AS th FROM sh),
    votes AS (SELECT doc_id, {votes} FROM th),
    sigs AS (SELECT doc_id, ({total})::BIGINT AS sig FROM votes)
    SELECT a.doc_id AS id_a, b.doc_id AS id_b,
           bit_count(xor(a.sig, b.sig)) AS hamming
    FROM sigs a JOIN sigs b ON a.doc_id < b.doc_id
    WHERE bit_count(xor(a.sig, b.sig)) <= {max_hamming}
    """


@query("dedup_simhash", _simhash_oracle())
def q_simhash(spark, sf_dir):
    """SimHash near-dup on 3-gram shingles: 16-bit majority-vote
    signatures, pigeonhole-blocked candidate join (4 blocks × 4 bits
    guarantees every pair at Hamming ≤ 3 shares a block), exact Hamming
    check. The oracle brute-forces all pairs — identical result set."""
    return D.simhash_pairs(_t(spark, sf_dir, "documents"))


@query(
    "embedding_neardup",
    """
    SELECT a.vec_id AS id_a, b.vec_id AS id_b,
           round(list_dot_product(a.embedding::DOUBLE[], b.embedding::DOUBLE[])
                 / (sqrt(list_dot_product(a.embedding::DOUBLE[], a.embedding::DOUBLE[]))
                    * sqrt(list_dot_product(b.embedding::DOUBLE[], b.embedding::DOUBLE[]))), 4) AS cos
    FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
    WHERE list_dot_product(a.embedding::DOUBLE[], b.embedding::DOUBLE[])
          / (sqrt(list_dot_product(a.embedding::DOUBLE[], a.embedding::DOUBLE[]))
             * sqrt(list_dot_product(b.embedding::DOUBLE[], b.embedding::DOUBLE[]))) >= 0.4
    """,
)
def q_embedding_neardup(spark, sf_dir):
    return D.embedding_neardup_pairs(_t(spark, sf_dir, "embeddings"), threshold=0.4)


_EMB_BLOCKED_SQL = """
    WITH base AS (
      SELECT vec_id, list_transform(embedding, x -> x::DOUBLE) AS v FROM embeddings
    ),
    copies AS (
      SELECT vec_id + 1000000 AS vec_id,
             list_transform(range(len(v)), j -> v[j+1] + 0.15 * v[((j+1) % len(v)) + 1]) AS v
      FROM base
    ),
    corpus AS (SELECT * FROM base UNION ALL SELECT * FROM copies)
    SELECT a.vec_id AS id_a, b.vec_id AS id_b,
           round(list_dot_product(a.v, b.v)
                 / (sqrt(list_dot_product(a.v, a.v)) * sqrt(list_dot_product(b.v, b.v))), 4) AS cos
    FROM corpus a JOIN corpus b ON a.vec_id < b.vec_id
    WHERE list_dot_product(a.v, b.v)
          / (sqrt(list_dot_product(a.v, a.v)) * sqrt(list_dot_product(b.v, b.v))) >= 0.9
    """


@query("embedding_neardup_blocked", _EMB_BLOCKED_SQL)
def q_embedding_neardup_blocked(spark, sf_dir):
    """Scale path for embedding near-dup, r4 rework: banding is now
    DERIVED from corpus stats (`embedding_neardup_pairs_auto` →
    `bands_for_corpus`) instead of fixed — the r3 sf1 soak measured the
    fixed 64×4 banding at ~100× pair work at 10× rows (87s; 98% of
    RANDOM pairs collided in some band). Auto-sizing holds expected
    random-bucket occupancy ~constant as n grows, so pair work stays
    ~linear; signatures run Arrow-side (numpy matmul) since the derived
    plane count is in the hundreds.

    The query runs at a genuine near-dup threshold (cos 0.9) over a
    corpus with PLANTED near-duplicates — each vector unioned with a
    deterministic perturbed copy (v + 0.15·rotate(v,1), cos ≈ 0.989;
    the raw synthetic embeddings have no pairs above cos 0.6, and below
    ~0.7 cosine-LSH selectivity per bit (2p)⁻¹ collapses toward 1, so a
    0.4-threshold "blocked" query was structurally all-pairs). The
    oracle mirrors the derivation exactly and brute-forces all pairs;
    recall margin at the planted cos (miss < 1e-13 per pair under the
    derived banding) makes blocked ≡ exact deterministic, not lucky."""
    emb = _t(spark, sf_dir, "embeddings").select(
        "vec_id",
        F.expr("transform(embedding, x -> cast(x as double))").alias("embedding"),
    )
    copies = emb.select(
        (F.col("vec_id") + F.lit(1000000)).alias("vec_id"),
        F.expr(
            "transform(sequence(0, size(embedding) - 1),"
            " j -> embedding[j] + 0.15D * embedding[(j + 1) % size(embedding)])"
        ).alias("embedding"),
    )
    corpus = emb.unionByName(copies)
    return D.embedding_neardup_pairs_auto(corpus, threshold=0.9)


# ===========================================================================
# LLM-pipeline: similarity search
# ===========================================================================


@query(
    "knn_cosine",
    """
    WITH q AS (SELECT vec_id AS query_id, embedding FROM embeddings WHERE vec_id < 5),
    c AS (SELECT vec_id, embedding FROM embeddings WHERE vec_id >= 5),
    scored AS (
      SELECT q.query_id, c.vec_id,
             round(list_dot_product(c.embedding::DOUBLE[], q.embedding::DOUBLE[])
                   / (sqrt(list_dot_product(c.embedding::DOUBLE[], c.embedding::DOUBLE[]))
                      * sqrt(list_dot_product(q.embedding::DOUBLE[], q.embedding::DOUBLE[]))), 4) AS cos
      FROM c, q)
    SELECT query_id, vec_id, rank, cos FROM (
      SELECT *, row_number() OVER (PARTITION BY query_id ORDER BY cos DESC, vec_id) AS rank
      FROM scored)
    WHERE rank <= 10
    """,
)
def q_knn(spark, sf_dir):
    """Brute-force cosine top-k: broadcast queries, one corpus scan, JVM
    Column-expression math (operators.similarity)."""
    emb = _t(spark, sf_dir, "embeddings")
    queries = emb.where(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("query_vec")
    )
    corpus = emb.where(F.col("vec_id") >= 5)
    return SIM.brute_force_topk(corpus, queries, k=10).select(
        "query_id", "vec_id", "rank", "cos"
    )


def _cos_sql(a: str, b: str) -> str:
    return (
        f"(list_dot_product({a}::DOUBLE[], {b}::DOUBLE[])"
        f" / (sqrt(list_dot_product({a}::DOUBLE[], {a}::DOUBLE[]))"
        f" * sqrt(list_dot_product({b}::DOUBLE[], {b}::DOUBLE[]))))"
    )


_LSH_PLANES: dict[str, list] = _SfLRU()
_LSH_N_PLANES = 8


@query(
    "lsh_topk_planted",
    f"""
    WITH pl AS (
      SELECT vec_id - 5 AS pid, embedding::DOUBLE[] AS pv
      FROM embeddings WHERE vec_id >= 5 AND vec_id < {5 + _LSH_N_PLANES}),
    q0 AS (SELECT vec_id AS query_id, embedding::DOUBLE[] AS v
           FROM embeddings WHERE vec_id < 5),
    q AS (SELECT query_id,
                 list_transform(range(1, len(v) + 1),
                                j -> v[j] + 0.15 * v[(j % len(v)) + 1]) AS qvec
          FROM q0),
    c AS (SELECT vec_id, embedding::DOUBLE[] AS cvec
          FROM embeddings WHERE vec_id >= 5),
    cb AS (
      SELECT vec_id, cvec,
             CAST(sum(CASE WHEN list_dot_product(cvec, pv) >= 0
                           THEN (1::BIGINT << ({_LSH_N_PLANES - 1} - pid))
                           ELSE 0 END) AS BIGINT) AS bucket
      FROM c CROSS JOIN pl GROUP BY vec_id, cvec),
    qb AS (
      SELECT query_id, qvec,
             CAST(sum(CASE WHEN list_dot_product(qvec, pv) >= 0
                           THEN (1::BIGINT << ({_LSH_N_PLANES - 1} - pid))
                           ELSE 0 END) AS BIGINT) AS bucket
      FROM q CROSS JOIN pl GROUP BY query_id, qvec),
    scored AS (
      SELECT qb.query_id, cb.vec_id,
             round(list_dot_product(cb.cvec, qb.qvec)
                   / (sqrt(list_dot_product(cb.cvec, cb.cvec))
                      * sqrt(list_dot_product(qb.qvec, qb.qvec))), 4) AS cos
      FROM qb JOIN cb USING (bucket))
    SELECT query_id, vec_id, rank, cos FROM (
      SELECT *, row_number() OVER (PARTITION BY query_id
                                   ORDER BY cos DESC, vec_id) AS rank
      FROM scored)
    WHERE rank <= 10
    """,
)
def q_lsh_topk_planted(spark, sf_dir):
    """LSH-bucketed ANN (operators.similarity.lsh_topk) — the last
    ANN-ladder rung to get an oracle entry (r5 verdict #6). Queries are
    planted perturbations (v + 0.15·rotate(v,1), cos ≈ 0.989) of the
    first 5 corpus vectors, so the expected rank-1 hit is known by
    construction; hyperplanes are DATA rows (vec_id 5..12, the same
    derive-from-rows trick the IVF oracle uses for centroids) so DuckDB
    replays the exact bucketing: bit_i = sign(v·plane_i) packed
    MSB-first. Candidates come only from the query's bucket — the
    bucket-pruned equi-join that replaces the brute-force cross join at
    scale; the oracle replays bucketing + rerank, making the
    approximation itself hash-verified, not just its recall."""
    emb = _t(spark, sf_dir, "embeddings")
    if sf_dir not in _LSH_PLANES:
        rows = (
            emb.where(
                (F.col("vec_id") >= 5) & (F.col("vec_id") < 5 + _LSH_N_PLANES)
            )
            .orderBy("vec_id")
            .select("embedding")
            .collect()
        )
        _LSH_PLANES[sf_dir] = [[float(x) for x in r[0]] for r in rows]
    queries = emb.where(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("query_id"),
        F.expr(
            "transform(sequence(0, size(embedding) - 1),"
            " j -> cast(embedding[j] as double)"
            "      + 0.15D * cast(embedding[(j + 1) % size(embedding)] as double))"
        ).alias("query_vec"),
    )
    corpus = emb.where(F.col("vec_id") >= 5).select(
        "vec_id",
        F.expr("transform(embedding, x -> cast(x as double))").alias("embedding"),
    )
    return SIM.lsh_topk(corpus, queries, _LSH_PLANES[sf_dir], k=10).select(
        "query_id", "vec_id", "rank", "cos"
    )


def _ivf_oracle(n_cent: int = 16, nprobe: int = 4, k: int = 10) -> str:
    return f"""
    WITH cent AS (SELECT vec_id AS cid, embedding AS cvec FROM embeddings
                  WHERE vec_id >= 5 AND vec_id < {5 + n_cent}),
    q AS (SELECT vec_id AS query_id, embedding AS qvec FROM embeddings WHERE vec_id < 5),
    c AS (SELECT vec_id, embedding FROM embeddings WHERE vec_id >= 5),
    assign AS (
      SELECT vec_id, cid FROM (
        SELECT c.vec_id, cent.cid,
               row_number() OVER (PARTITION BY c.vec_id
                 ORDER BY {_cos_sql('c.embedding', 'cent.cvec')} DESC, cent.cid) AS rn
        FROM c CROSS JOIN cent) WHERE rn = 1),
    probes AS (
      SELECT query_id, cid FROM (
        SELECT q.query_id, cent.cid,
               row_number() OVER (PARTITION BY q.query_id
                 ORDER BY {_cos_sql('q.qvec', 'cent.cvec')} DESC, cent.cid) AS rn
        FROM q CROSS JOIN cent) WHERE rn <= {nprobe}),
    scored AS (
      SELECT p.query_id, c.vec_id,
             round({_cos_sql('c.embedding', 'q.qvec')}, 4) AS cos
      FROM probes p JOIN assign a USING (cid)
      JOIN c ON a.vec_id = c.vec_id
      JOIN q ON p.query_id = q.query_id)
    SELECT query_id, vec_id, rank, cos FROM (
      SELECT *, row_number() OVER (PARTITION BY query_id ORDER BY cos DESC, vec_id) AS rank
      FROM scored)
    WHERE rank <= {k}
    """


# Centroid cache: a production IVF index computes its coarse quantizer
# once (k-means job), not per query — re-collecting 16 vectors per call
# would charge every query one extra Spark job for static data.
_IVF_CENTS: dict[str, list] = _SfLRU()


def _ivf_centroids(spark, sf_dir):
    if sf_dir not in _IVF_CENTS:
        emb = _t(spark, sf_dir, "embeddings")
        _IVF_CENTS[sf_dir] = [
            (int(r["vec_id"]), [float(x) for x in r["embedding"]])
            for r in emb.where((F.col("vec_id") >= 5) & (F.col("vec_id") < 21))
            .select("vec_id", "embedding")
            .collect()
        ]
    return _IVF_CENTS[sf_dir]


def _ivf_query(spark, sf_dir, assign_engine):
    emb = _t(spark, sf_dir, "embeddings")
    cents = _ivf_centroids(spark, sf_dir)
    queries = emb.where(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("query_vec")
    )
    corpus = emb.where(F.col("vec_id") >= 5)
    return SIM.ivf_topk(
        corpus, queries, cents, k=10, nprobe=4, assign_engine=assign_engine
    ).select("query_id", "vec_id", "rank", "cos")


@query("ivf_topk_cosine", _ivf_oracle())
def q_ivf(spark, sf_dir):
    """IVF approximate nearest neighbor (operators.similarity.ivf_topk):
    the 100 TB scale path for similarity search. Corpus vectors are
    assigned to inverted lists scan-side (centroids inlined as literals —
    no join, no shuffle); queries probe their nprobe nearest cells via a
    broadcast equi-join. Assignment uses the default Arrow/BLAS engine
    (one NumPy matmul per batch — r2 verdict flipped this to default;
    the interpreted-HOF column variant is ~1.6× slower). Centroids are
    deterministic seed vectors (vec_id 5..20) so DuckDB reproduces the
    identical result; a real deployment plugs k-means centroids into
    the same plan."""
    return _ivf_query(spark, sf_dir, assign_engine="arrow")


@query("ivf_topk_cosine_column", _ivf_oracle())
def q_ivf_column(spark, sf_dir):
    """Same IVF plan with the corpus assignment as a pure-JVM Column
    expression (similarity.ivf_assign) — kept for fold-order-exact
    oracle parity and zero-Python deployments. Same oracle as
    ivf_topk_cosine: the result set is identical (assignment argmax and
    candidate cosines agree; verified cross-engine, not assumed)."""
    return _ivf_query(spark, sf_dir, assign_engine="column")


# ===========================================================================
# Round 2 additions: streaming dedup, k-means, end-to-end corpus prep
# ===========================================================================


@query(
    "streaming_dedup",
    """
    SELECT event_id, event_type FROM events
    """,
)
def q_streaming_dedup(spark, sf_dir):
    """Streaming exact dedup (streaming.windows.stream_dedup /
    dropDuplicates): idempotent ingest for at-least-once delivery —
    repeated event_ids collapse to one row across micro-batches. Over
    the finite replay the deduped stream equals the distinct batch rows
    (event_id is unique in the data, so the oracle is the plain
    projection; the operator's state machinery is what is under test)."""
    import tempfile

    from parkour_spark.streaming.windows import read_stream, run_to_completion, stream_dedup

    ev = _t(spark, sf_dir, "events")
    tmp = tempfile.mkdtemp(prefix="parkour_stream_")
    ev.write.mode("overwrite").parquet(tmp)
    stream = read_stream(spark, tmp, ev.schema, max_files=8)
    deduped = stream_dedup(stream.select("event_id", "event_type"), ["event_id"])
    return run_to_completion(deduped, output_mode="append")


_KMEANS_ASSIGN = """
{out} AS (
  SELECT vec_id, v, cell FROM (
    SELECT e.vec_id, e.v, c.cell,
           row_number() OVER (PARTITION BY e.vec_id
                              ORDER BY list_cosine_similarity(e.v, c.c) DESC,
                                       c.cell) AS rn
    FROM emb e CROSS JOIN {cents} c) WHERE rn = 1)"""

_KMEANS_UPDATE = """
{out} AS (
  SELECT cell, list(m ORDER BY idx) AS c FROM (
    SELECT cell, idx, avg(val) AS m FROM (
      SELECT cell, unnest(v) AS val, unnest(range(1, len(v)+1)) AS idx
      FROM {assigned})
    GROUP BY cell, idx) GROUP BY cell)"""

# Lloyd's k=8 × 3 iterations, UNROLLED as plain CTEs (fixed iteration
# count ⇒ no recursion needed): init = hash-sampled seeds (the 8
# vectors with smallest (md5(vec_id), vec_id) — r4: replaces
# first-k-by-id, which seeds from one neighborhood on id-sorted
# corpora), assignment = row_number argmax over
# list_cosine_similarity with ties to the lowest cell — exactly
# kmeans_fit + ivf_assign_arrow. Engines differ only in float fold
# order (~1e-15), absorbed by the 6-decimal round and irrelevant to
# argmax assignments.
# Shared CTE prefix: emb (doubles), c0 (init), a1/c1..a3/c3 (3 Lloyd's
# rounds), af (final full-corpus assignment to c3).
_KMEANS_CTES = (
    """
    emb AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
    c0 AS (SELECT row_number() OVER (ORDER BY md5(vec_id::VARCHAR), vec_id) - 1 AS cell, v AS c
           FROM (SELECT vec_id, v FROM emb ORDER BY md5(vec_id::VARCHAR), vec_id LIMIT 8)),"""
    + ",".join(
        _KMEANS_ASSIGN.format(out=f"a{i}", cents=f"c{i-1}")
        + ","
        + _KMEANS_UPDATE.format(out=f"c{i}", assigned=f"a{i}")
        for i in (1, 2, 3)
    )
    + ","
    + _KMEANS_ASSIGN.format(out="af", cents="c3")
)

_KMEANS_ORACLE = (
    "WITH "
    + _KMEANS_CTES
    + """
    SELECT af.cell AS cid, count(*) AS n_members,
           round(sqrt(list_sum(list_transform(c3.c, x -> x*x))), 6) AS centroid_norm
    FROM af JOIN c3 ON af.cell = c3.cell
    GROUP BY af.cell, c3.c
    """
)


@query("kmeans_centroids", _KMEANS_ORACLE)
def q_kmeans(spark, sf_dir):
    """Distributed Lloyd's k-means over the embeddings corpus
    (operators.kmeans.kmeans_fit): per iteration one scan-side
    assignment pass + NumPy partial (cell, count, sum) statistics per
    Arrow batch, folded in-plan. Deterministic by construction
    (hash-sampled init = k smallest (md5(id), id) — engine- and
    layout-independent, fixed iteration count, and an EXACT
    decimal-arithmetic element fold (r12) — order-independent, so the
    centroids are bit-identical run-to-run regardless of Spark's
    combine order), so the DuckDB oracle replays the SAME
    Lloyd's — k=8 × 3 iterations unrolled as CTEs with cosine argmax
    assignment (r2 verdict: promote from rows-only to a full oracle).
    Monotone-inertia and ivf-integration stay asserted in
    tests/test_kmeans.py. Returns one row per centroid:
    (cid, n_members, centroid_norm)."""
    from parkour_spark.functions.vector import norm as vnorm
    from parkour_spark.operators.kmeans import kmeans_fit
    from parkour_spark.operators.similarity import ivf_assign_arrow

    emb = _t(spark, sf_dir, "embeddings")
    cents = kmeans_fit(emb, k=8, max_iters=3)
    assigned = ivf_assign_arrow(emb.select("vec_id", "embedding"), cents, "embedding", "cell")
    sizes = assigned.groupBy("cell").agg(F.count("*").alias("n_members"))
    cent_df = spark.createDataFrame(
        [(cid, v) for cid, v in cents], "cell long, centroid array<double>"
    ).select("cell", F.round(vnorm("centroid"), 6).alias("centroid_norm"))
    return (
        sizes.join(cent_df, "cell")
        .select(F.col("cell").alias("cid"), "n_members", "centroid_norm")
    )


_IVF_KMEANS_ORACLE = (
    "WITH "
    + _KMEANS_CTES
    + f""",
    cent AS (SELECT cell AS cid, c AS cvec FROM c3),
    q AS (SELECT vec_id AS query_id, v AS qvec FROM emb WHERE vec_id < 5),
    probes AS (
      SELECT query_id, cid FROM (
        SELECT q.query_id, cent.cid,
               row_number() OVER (PARTITION BY q.query_id
                 ORDER BY {_cos_sql('q.qvec', 'cent.cvec')} DESC, cent.cid) AS rn
        FROM q CROSS JOIN cent) WHERE rn <= 2),
    scored AS (
      SELECT p.query_id, e.vec_id,
             round({_cos_sql('e.v', 'q.qvec')}, 4) AS cos
      FROM probes p JOIN af a ON p.cid = a.cell
      JOIN emb e ON a.vec_id = e.vec_id
      JOIN q ON p.query_id = q.query_id)
    SELECT query_id, vec_id, rank, cos FROM (
      SELECT *, row_number() OVER (PARTITION BY query_id
                                   ORDER BY cos DESC, vec_id) AS rank
      FROM scored)
    WHERE rank <= 10
    """
)

# Fitted-quantizer cache, same rationale as _IVF_CENTS: a production IVF
# index runs its k-means job once, not per query batch.
_KMEANS_IVF_CENTS: dict[str, list] = _SfLRU()


@query("ivf_kmeans_topk", _IVF_KMEANS_ORACLE)
def q_ivf_kmeans(spark, sf_dir):
    """END-TO-END learned-quantizer ANN (r2 verdict #7): kmeans_fit's
    centroids feed ivf_topk directly — the production IVF shape (train
    the coarse quantizer, assign the corpus, probe per query) as one
    pipeline instead of the seed-vector stand-in. Deterministic by the
    kmeans_centroids argument (seeded init, fixed rounds, sorted
    combine), so the oracle replays Lloyd's in DuckDB CTEs and runs the
    same probe/re-rank SQL on its centroids."""
    from parkour_spark.operators.kmeans import kmeans_fit

    emb = _t(spark, sf_dir, "embeddings")
    if sf_dir not in _KMEANS_IVF_CENTS:
        _KMEANS_IVF_CENTS[sf_dir] = kmeans_fit(emb, k=8, max_iters=3)
    cents = _KMEANS_IVF_CENTS[sf_dir]
    queries = emb.where(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("query_vec")
    )
    return SIM.ivf_topk(emb, queries, cents, k=10, nprobe=2).select(
        "query_id", "vec_id", "rank", "cos"
    )


def _pq_oracle(m: int = 4, ksub: int = 8, iters: int = 2, dim: int = 64,
               k: int = 10, corpus_where: str | None = None) -> str:
    """Full PQ pipeline replay: shared hash-sampled seeds, per-subspace
    L2 Lloyd's unrolled (assignment = row_number argmin over
    list_distance with ties to the lowest cell; update = per-dim avg,
    cells that empty keep their previous centroid — exactly
    operators.pq.pq_train), then ADC scoring through the learned codes.

    `corpus_where` restricts the SCORED corpus only (training always
    runs over the full table) — the r10 persisted-index delete leg:
    codebooks are fixed at build, delete(B) scores exactly the
    survivors, so the oracle is the same replay with `e` filtered."""
    dsub = dim // m
    parts = [
        "emb AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings)",
        f"""seeds AS (
      SELECT row_number() OVER (ORDER BY md5(vec_id::VARCHAR), vec_id) - 1 AS cell, v
      FROM (SELECT vec_id, v FROM emb
            ORDER BY md5(vec_id::VARCHAR), vec_id LIMIT {ksub}))""",
    ]
    for s in range(m):
        lo, hi = s * dsub + 1, (s + 1) * dsub
        parts.append(
            f"s{s}_e AS (SELECT vec_id, v[{lo}:{hi}] AS v FROM emb)"
        )
        parts.append(
            f"s{s}_c0 AS (SELECT cell, v[{lo}:{hi}] AS c FROM seeds)"
        )
        for i in range(1, iters + 1):
            parts.append(
                f"""s{s}_a{i} AS (
      SELECT vec_id, v, cell FROM (
        SELECT e.vec_id, e.v, c.cell,
               row_number() OVER (PARTITION BY e.vec_id
                 ORDER BY list_distance(e.v, c.c) ASC, c.cell) AS rn
        FROM s{s}_e e CROSS JOIN s{s}_c{i-1} c) WHERE rn = 1)"""
            )
            parts.append(
                f"""s{s}_c{i} AS (
      SELECT cell, list(mv ORDER BY idx) AS c FROM (
        SELECT cell, idx, avg(val) AS mv FROM (
          SELECT cell, unnest(v) AS val, unnest(range(1, len(v)+1)) AS idx
          FROM s{s}_a{i})
        GROUP BY cell, idx) GROUP BY cell
      UNION ALL
      SELECT cell, c FROM s{s}_c{i-1}
      WHERE cell NOT IN (SELECT DISTINCT cell FROM s{s}_a{i}))"""
            )
        parts.append(
            f"""s{s}_af AS (
      SELECT vec_id, cell FROM (
        SELECT e.vec_id, c.cell,
               row_number() OVER (PARTITION BY e.vec_id
                 ORDER BY list_distance(e.v, c.c) ASC, c.cell) AS rn
        FROM s{s}_e e CROSS JOIN s{s}_c{iters} c) WHERE rn = 1)"""
        )
    joins = " ".join(
        f"JOIN s{s}_af a{s} ON e.vec_id = a{s}.vec_id "
        f"JOIN s{s}_c{iters} cb{s} ON a{s}.cell = cb{s}.cell"
        for s in range(m)
    )
    dots = " + ".join(
        f"list_dot_product(q.qv[{s * dsub + 1}:{(s + 1) * dsub}], cb{s}.c)"
        for s in range(m)
    )
    norms = " + ".join(
        f"list_dot_product(cb{s}.c, cb{s}.c)" for s in range(m)
    )
    return (
        "WITH "
        + ",\n    ".join(parts)
        + f""",
    q AS (SELECT vec_id AS query_id, v AS qv,
                 sqrt(list_dot_product(v, v)) AS qn
          FROM emb WHERE vec_id < 5),
    scored AS (
      SELECT q.query_id, e.vec_id,
             round(({dots}) / (q.qn * sqrt({norms})), 4) AS adc_cos
      FROM emb e {joins}
      CROSS JOIN q{" WHERE " + corpus_where if corpus_where else ""})
    SELECT query_id, vec_id, rank, adc_cos FROM (
      SELECT *, row_number() OVER (PARTITION BY query_id
                                   ORDER BY adc_cos DESC, vec_id) AS rank
      FROM scored)
    WHERE rank <= {k}
    """
    )


def _l2_lloyd_ctes(prefix: str, src: str, seeds: str, lo: int, hi: int,
                   iters: int) -> str:
    """L2 Lloyd's rounds over `src` (vec_id, v) sliced to [lo, hi],
    seeded from `seeds` (same slice), keep-old on empty cells —
    mirrors operators.pq's training exactly. Emits {prefix}_c{iters}
    (codebook) and {prefix}_af (final assignment)."""
    parts = [
        f"{prefix}_e AS (SELECT vec_id, v[{lo}:{hi}] AS v FROM {src})",
        f"{prefix}_c0 AS (SELECT cell, v[{lo}:{hi}] AS c FROM {seeds})",
    ]
    for i in range(1, iters + 1):
        parts.append(
            f"""{prefix}_a{i} AS MATERIALIZED (
      SELECT vec_id, v, cell FROM (
        SELECT e.vec_id, e.v, c.cell,
               row_number() OVER (PARTITION BY e.vec_id
                 ORDER BY list_distance(e.v, c.c) ASC, c.cell) AS rn
        FROM {prefix}_e e CROSS JOIN {prefix}_c{i-1} c) WHERE rn = 1)"""
        )
        parts.append(
            f"""{prefix}_c{i} AS MATERIALIZED (
      SELECT cell, list(mv ORDER BY idx) AS c FROM (
        SELECT cell, idx, avg(val) AS mv FROM (
          SELECT cell, unnest(v) AS val, unnest(range(1, len(v)+1)) AS idx
          FROM {prefix}_a{i})
        GROUP BY cell, idx) GROUP BY cell
      UNION ALL
      SELECT cell, c FROM {prefix}_c{i-1}
      WHERE cell NOT IN (SELECT DISTINCT cell FROM {prefix}_a{i}))"""
        )
    parts.append(
        f"""{prefix}_af AS MATERIALIZED (
      SELECT vec_id, cell FROM (
        SELECT e.vec_id, c.cell,
               row_number() OVER (PARTITION BY e.vec_id
                 ORDER BY list_distance(e.v, c.c) ASC, c.cell) AS rn
        FROM {prefix}_e e CROSS JOIN {prefix}_c{iters} c) WHERE rn = 1)"""
    )
    return ",\n    ".join(parts)


def _ivfpq_oracle(k_coarse: int = 8, m: int = 4, ksub: int = 8, iters: int = 2,
                  dim: int = 64, nprobe: int = 2, k: int = 10,
                  corpus_where: str | None = None,
                  refine_from: int | None = None) -> str:
    """Full IVF-PQ replay: L2 coarse Lloyd's over raw vectors →
    residuals → per-subspace L2 Lloyd's over residuals → probe nprobe
    nearest cells per query → ADC distance through residual codes.

    `corpus_where` restricts the SCORED corpus only (both quantizer
    trainings replay over the full table) — the r10 persisted-index
    delete leg: quantizers are fixed at build, delete(B) scores
    exactly the survivors."""
    dsub = dim // m
    parts = [
        "emb AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings)",
        f"""seeds AS (
      SELECT row_number() OVER (ORDER BY md5(vec_id::VARCHAR), vec_id) - 1 AS cell, v
      FROM (SELECT vec_id, v FROM emb
            ORDER BY md5(vec_id::VARCHAR), vec_id LIMIT {k_coarse}))""",
        _l2_lloyd_ctes("g", "emb", "seeds", 1, dim, iters),
        f"""res AS MATERIALIZED (
      SELECT e.vec_id, a.cell AS gcell,
             list_transform(range(1, {dim} + 1), i -> e.v[i] - c.c[i]) AS v
      FROM emb e JOIN g_af a ON e.vec_id = a.vec_id
      JOIN g_c{iters} c ON a.cell = c.cell)""",
        f"""rseeds AS (
      SELECT row_number() OVER (ORDER BY md5(vec_id::VARCHAR), vec_id) - 1 AS cell, v
      FROM (SELECT vec_id, v FROM res
            ORDER BY md5(vec_id::VARCHAR), vec_id LIMIT {ksub}))""",
    ]
    for s in range(m):
        parts.append(
            _l2_lloyd_ctes(f"r{s}", "res", "rseeds",
                           s * dsub + 1, (s + 1) * dsub, iters)
        )
    joins = " ".join(
        f"JOIN r{s}_af a{s} ON e.vec_id = a{s}.vec_id "
        f"JOIN r{s}_c{iters} cb{s} ON a{s}.cell = cb{s}.cell"
        for s in range(m)
    )
    d2 = " + ".join(
        f"""list_sum(list_transform(range(1, {dsub} + 1),
          i -> (qr.qres[{s * dsub} + i] - cb{s}.c[i])
             * (qr.qres[{s * dsub} + i] - cb{s}.c[i])))"""
        for s in range(m)
    )
    middle = f""",
    q AS (SELECT vec_id AS query_id, v AS qv FROM emb WHERE vec_id < 5),
    probes AS (
      SELECT query_id, cell FROM (
        SELECT q.query_id, c.cell,
               row_number() OVER (PARTITION BY q.query_id
                 ORDER BY list_distance(q.qv, c.c) ASC, c.cell) AS rn
        FROM q CROSS JOIN g_c{iters} c) WHERE rn <= {nprobe}),
    qres AS (
      SELECT p.query_id, p.cell,
             list_transform(range(1, {dim} + 1), i -> q.qv[i] - c.c[i]) AS qres
      FROM probes p JOIN q USING (query_id)
      JOIN g_c{iters} c ON p.cell = c.cell),
    scored AS (
      SELECT qr.query_id, e.vec_id, round({d2}, 4) AS adc_d2
      FROM qres qr
      JOIN g_af ga ON ga.cell = qr.cell
      JOIN emb e ON e.vec_id = ga.vec_id
      {joins}{" WHERE " + corpus_where if corpus_where else ""})"""
    if refine_from is None:
        tail = f"""
    SELECT query_id, vec_id, rank, adc_d2 FROM (
      SELECT *, row_number() OVER (PARTITION BY query_id
                                   ORDER BY adc_d2 ASC, vec_id) AS rank
      FROM scored)
    WHERE rank <= {k}
    """
    else:
        # FAISS-style refine replay: ADC top-refine_from per query,
        # exact L2 re-rank over the candidates' true vectors
        tail = f""",
    cand AS (
      SELECT query_id, vec_id FROM (
        SELECT *, row_number() OVER (PARTITION BY query_id
                                     ORDER BY adc_d2 ASC, vec_id) AS rank
        FROM scored)
      WHERE rank <= {refine_from}),
    refined AS (
      SELECT c.query_id, c.vec_id,
             round(list_sum(list_transform(range(1, {dim} + 1),
               i -> (q.qv[i] - e.v[i]) * (q.qv[i] - e.v[i]))), 4)
               AS exact_d2
      FROM cand c JOIN q USING (query_id) JOIN emb e USING (vec_id))
    SELECT query_id, vec_id, rank, exact_d2 FROM (
      SELECT *, row_number() OVER (PARTITION BY query_id
                                   ORDER BY exact_d2 ASC, vec_id) AS rank
      FROM refined)
    WHERE rank <= {k}
    """
    # refine's cand CTE chains onto scored, so the tail opens with a
    # comma in that branch — middle ends the WITH list either way
    return "WITH " + ",\n    ".join(parts) + middle + tail


# Trained-codebook cache, same rationale as _IVF_CENTS: a production PQ
# index trains once, encodes once, then serves queries.
_PQ_CODEBOOKS: dict[str, list] = _SfLRU()
_IVFPQ_INDEX: dict[str, tuple] = _SfLRU()


@query("ivfpq_topk_l2", _ivfpq_oracle())
def q_ivfpq(spark, sf_dir):
    """IVF-PQ search (operators.pq.ivfpq_topk — the FAISS IndexIVFPQ
    architecture): L2 coarse quantizer (k=8) partitions the corpus into
    inverted lists; product codes are learned over RESIDUALS (which
    concentrate near the origin — far tighter than raw-vector codes);
    queries probe nprobe=2 cells and score candidates by ADC with
    per-(query, cell) distance tables. One scan-side Arrow pass
    assigns+encodes+scores; the corpus never shuffles. Deterministic
    end-to-end (shared hash-sampled seeds at both quantizer levels,
    fixed rounds, argmin ties to lowest cell), so the oracle replays
    coarse training → residuals → residual-PQ training → probe → ADC
    as generated CTEs."""
    from parkour_spark.operators.pq import ivfpq_topk, kmeans_l2, pq_train, residual_df

    emb = _t(spark, sf_dir, "embeddings")
    if sf_dir not in _IVFPQ_INDEX:
        coarse = kmeans_l2(emb, k=8, iters=2)
        res = residual_df(emb, coarse).select(
            "vec_id", F.col("res").alias("embedding")
        )
        cbs = pq_train(res, m=4, ksub=8, iters=2)
        _IVFPQ_INDEX[sf_dir] = (coarse, cbs)
    coarse, cbs = _IVFPQ_INDEX[sf_dir]
    queries = [
        (int(r["vec_id"]), [float(x) for x in r["embedding"]])
        for r in emb.where(F.col("vec_id") < 5).select("vec_id", "embedding").collect()
    ]
    return ivfpq_topk(emb, coarse, cbs, queries, k=10, nprobe=2)


@query("pq_adc_topk", _pq_oracle())
def q_pq_adc(spark, sf_dir):
    """Product-quantization ANN (operators.pq): train m=4 × ksub=8 L2
    codebooks (one corpus pass per Lloyd's iteration, all subspaces at
    once), then answer 5 queries by asymmetric distance computation —
    candidates scored through their m codes via per-query lookup tables,
    corpus never shuffled. Deterministic end-to-end (hash-sampled shared
    seeds, fixed rounds, argmin ties to lowest cell, sorted partial
    combine), so the oracle replays training + encoding + ADC in DuckDB
    CTEs. Completes the quantization ladder next to ivf_topk_cosine and
    quantized_embeddings."""
    from parkour_spark.operators.pq import pq_adc_topk, pq_train

    emb = _t(spark, sf_dir, "embeddings")
    if sf_dir not in _PQ_CODEBOOKS:
        _PQ_CODEBOOKS[sf_dir] = pq_train(emb, m=4, ksub=8, iters=2)
    cbs = _PQ_CODEBOOKS[sf_dir]
    qrows = (
        emb.where(F.col("vec_id") < 5).select("vec_id", "embedding").collect()
    )
    queries = [
        (int(r["vec_id"]), [float(x) for x in r["embedding"]]) for r in qrows
    ]
    return pq_adc_topk(emb, cbs, queries, k=10)


@query(
    "corpus_prep",
    f"""
    WITH scored AS (
      SELECT doc_id, text,
             (least(length(text) * 8, 4000)
              + CASE WHEN len({_TOKS_SQL}) > 0
                     THEN floor(3000.0 * least(len(list_filter({_TOKS_SQL},
                                  x -> x IN ({_STOP_SQL}))) * 10, len({_TOKS_SQL}))
                                / len({_TOKS_SQL}))
                     ELSE 0 END
              + CASE WHEN list_sum(list_transform({_TOKS_SQL}, t -> length(t)))::DOUBLE
                          / len({_TOKS_SQL}) BETWEEN 3.0 AND 10.0
                     THEN 3000 ELSE 0 END) / 10000.0 AS quality,
             CASE WHEN len(list_filter({_TOKS_SQL}, x -> x IN ({_STOP_SQL})))::DOUBLE
                       / len({_TOKS_SQL}) >= 0.05
                  THEN 'en' ELSE 'unk' END AS lang_pred,
             md5(regexp_replace(lower(trim(text)), '\\s+', ' ', 'g')) AS fp
      FROM documents),
    kept AS (SELECT * FROM scored WHERE quality >= 0.5 AND lang_pred = 'en'),
    canon AS (SELECT fp, min(doc_id) AS keep_id FROM kept GROUP BY fp)
    SELECT k.doc_id, round(k.quality, 4) AS quality,
           len(regexp_extract_all(k.text, ' ?[A-Za-z]+| ?[0-9]+| ?[^A-Za-z0-9\\s]+'))
             AS n_subwords
    FROM kept k JOIN canon c ON k.doc_id = c.keep_id
    """,
)
def q_corpus_prep(spark, sf_dir):
    """End-to-end training-data prep in ONE Catalyst plan: quality
    scoring + language ID + whole-doc fingerprint computed in a single
    scan-side projection, low-quality/non-English rows filtered, exact
    near-dup losers dropped (min doc_id per fingerprint — one shuffle),
    and the survivors tagged with their BPE-ish subword token count.
    The composition is the point: each stage is the already-verified
    operator, fused by Catalyst into scan → project → filter → one
    aggregation → self-semi-join, with column pruning ensuring only
    (doc_id, text) are ever read."""
    from parkour_spark.functions.text import EN_STOPWORDS, subword_count, tokens

    docs = _t(spark, sf_dir, "documents")
    # Stage the token array ONCE: quality + language both read it, and
    # an expression referenced from several consumers would otherwise be
    # inlined per consumer by CollapseProject (the regex split is the
    # expensive part — 4 copies per row without staging).
    staged = docs.select(
        "doc_id", "text", tokens(F.lower(F.col("text"))).alias("__toks")
    )
    t = F.col("__toks")
    n_tok = F.size(t)
    n_stop = F.size(F.filter(t, lambda x: x.isin(*EN_STOPWORDS)))
    len_bp = F.least(F.length("text") * 8, F.lit(4000))
    stop_bp = F.when(
        n_tok > 0, F.floor(F.lit(3000.0) * F.least(n_stop * 10, n_tok) / n_tok)
    ).otherwise(F.lit(0))
    atl = F.aggregate(t, F.lit(0).cast("double"), lambda acc, x: acc + F.length(x)) / n_tok
    atl_bp = F.when((atl >= 3.0) & (atl <= 10.0), F.lit(3000)).otherwise(F.lit(0))
    scored = staged.select(
        "doc_id",
        "text",
        ((len_bp + stop_bp + atl_bp) / F.lit(10000.0)).alias("quality"),
        F.when(n_stop.cast("double") / n_tok >= 0.05, F.lit("en"))
        .otherwise(F.lit("unk"))
        .alias("lang_pred"),
        fingerprint("text").alias("fp"),
    )
    kept = scored.where((F.col("quality") >= 0.5) & (F.col("lang_pred") == "en"))
    # survivor = min doc_id per fingerprint, decided by a window over fp:
    # ONE shuffle and one pass over the scored lineage (a groupBy +
    # semi-join would evaluate the scoring expressions twice)
    w_fp = Window.partitionBy("fp")
    return (
        kept.withColumn("__keep", F.min("doc_id").over(w_fp))
        .where(F.col("doc_id") == F.col("__keep"))
        .select(
            "doc_id",
            F.round("quality", 4).alias("quality"),
            subword_count("text").alias("n_subwords"),
        )
    )


_DEDUP_GROUPS_TAIL = """
    SELECT n AS doc_id, min(m) AS component,
           (n = min(m)) AS is_survivor
    FROM reach GROUP BY n
    """


def _dedup_groups_oracle(
    threshold: float = 0.8, tail: str = _DEDUP_GROUPS_TAIL
) -> str:
    from parkour_spark.operators.dedup import MINHASH_P, minhash_params

    # pairs CTE = the dedup_minhash_lsh oracle's candidate+verify chain
    num_hashes, bands = 12, 4
    rpb = num_hashes // bands
    x = f"(('0x' || substr(md5(x), 1, 8))::BIGINT % {MINHASH_P})"
    sig_cols = ",\n       ".join(
        f"list_min(list_transform(t, x -> ({a} * {x} + {b}) % {MINHASH_P})) AS sig_{i}"
        for i, (a, b) in enumerate(minhash_params(num_hashes))
    )
    band_keys = ", ".join(
        "'" + str(b) + "|' || " + " || '|' || ".join(f"sig_{b * rpb + r}" for r in range(rpb))
        for b in range(bands)
    )
    return f"""
    WITH RECURSIVE toks AS (SELECT doc_id, {_SHINGLES_SQL} AS t FROM documents),
    sigs AS (SELECT doc_id, {sig_cols} FROM toks),
    bands AS (SELECT doc_id, unnest([{band_keys}]) AS band_key FROM sigs),
    cand AS (
      SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
      FROM bands a JOIN bands b USING (band_key)
      WHERE a.doc_id < b.doc_id
    ),
    pairs AS (
      SELECT id_a, id_b FROM cand
      JOIN toks ta ON cand.id_a = ta.doc_id
      JOIN toks tb ON cand.id_b = tb.doc_id
      WHERE len(list_intersect(ta.t, tb.t))::DOUBLE
            / len(list_distinct(list_concat(ta.t, tb.t))) >= {threshold}
    ),
    edges AS (SELECT id_a AS a, id_b AS b FROM pairs
              UNION SELECT id_b, id_a FROM pairs),
    reach(n, m) AS (
      SELECT doc_id, doc_id FROM documents
      UNION
      SELECT r.n, e.b FROM reach r JOIN edges e ON r.m = e.a
    )
    {tail}"""


@query("dedup_groups", _dedup_groups_oracle())
def q_dedup_groups(spark, sf_dir):
    """Near-dup GROUPS, not just pairs: MinHash-LSH pairs → connected
    components (operators.graph, min-label propagation, one join+agg
    per round with checkpointed lineage) → keep the min doc_id per
    component. The oracle closes the same pair set transitively with a
    recursive CTE — result is the full corpus mapping with the
    keep/drop decision per doc."""
    from parkour_spark.operators.graph import dedup_survivors

    docs = _t(spark, sf_dir, "documents")
    pairs = D.minhash_dedup_pairs(docs, threshold=0.8)
    return dedup_survivors(docs.select("doc_id"), pairs)


@query("dedup_groups_bigstar", _dedup_groups_oracle())
def q_dedup_groups_bigstar(spark, sf_dir):
    """Same near-dup grouping computed by large-star/small-star
    alternation (operators.graph.connected_components_bigstar, Kiveris
    et al.) — the O(log n)-round path for DEEP components (spam
    clusters, template farms) where min-label propagation's
    O(diameter) rounds blow up. Identical oracle to dedup_groups: both
    must produce the same transitive closure (a 1200-hop-chain round
    bound is asserted in tests/test_r3_fixes.py)."""
    from parkour_spark.operators.graph import connected_components_bigstar

    docs = _t(spark, sf_dir, "documents")
    pairs = D.minhash_dedup_pairs(docs, threshold=0.8)
    cc = connected_components_bigstar(docs.select("doc_id"), pairs, node_col="doc_id")
    return cc.select(
        F.col("n").alias("doc_id"),
        "component",
        (F.col("n") == F.col("component")).alias("is_survivor"),
    )


_CC_BASE_DIRS: dict[str, str] = _SfLRUDirs()


@query("cc_delta_update_groups", _dedup_groups_oracle())
def q_cc_delta_update(spark, sf_dir):
    """Incremental component maintenance (graph.cc_delta_update): the
    near-dup components are built on the content-hash bottom 80% of
    docs, then the top 20% arrives as an ingest batch — its nodes and
    every pair touching it fold into the EXISTING labels through a
    batch-sized contracted CC (existing components participate as one
    super-node each; the corpus-sized component table is never
    shuffled, only scanned through broadcast joins). The oracle is the
    full-corpus transitive closure — the same oracle as dedup_groups —
    so a green row IS the proof that delta(CC(A), B) ≡ CC(A ∪ B),
    exactly the minhash_probe_after_append pattern for the graph
    index.

    The BASE state (existing component table + the batch's candidate
    edges) is computed once per corpus version and PERSISTED
    (_SfLRUDirs, the same discipline as every persisted-index entry):
    in production the component table IS durable state a fold updates
    — rebuilding it inside every timed call would bill the amortized
    base build as recurring fold cost (r9: this entry joined the bench
    headline, where that distinction is the measurement)."""
    import tempfile

    from parkour_spark.functions.sampling import hash_bucket
    from parkour_spark.operators.graph import (
        cc_delta_update,
        connected_components,
    )

    docs = _t(spark, sf_dir, "documents")
    bkt = hash_bucket(F.col("doc_id"), 100)
    if sf_dir not in _CC_BASE_DIRS:
        tmp = tempfile.mkdtemp(prefix="parkour_cc_base_")
        pairs = D.minhash_dedup_pairs(docs, threshold=0.8)
        ba = hash_bucket(F.col("id_a"), 100)
        bb = hash_bucket(F.col("id_b"), 100)
        connected_components(
            docs.where(bkt < 80).select("doc_id"),
            pairs.where((ba < 80) & (bb < 80)),
            node_col="doc_id",
        ).select(F.col("n").alias("doc_id"), "component").write.parquet(
            tmp + "/comps"
        )
        pairs.where((ba >= 80) | (bb >= 80)).write.parquet(tmp + "/edges")
        _CC_BASE_DIRS[sf_dir] = tmp
    base = _CC_BASE_DIRS[sf_dir]
    cc = cc_delta_update(
        spark.read.parquet(base + "/comps"),
        docs.where(bkt >= 80).select("doc_id"),
        spark.read.parquet(base + "/edges"),
        node_col="doc_id",
    )
    return cc.select(
        F.col("n").alias("doc_id"),
        "component",
        (F.col("n") == F.col("component")).alias("is_survivor"),
    )


@query(
    "rolling_30d_spend",
    """
    SELECT o_orderkey, o_custkey,
           round(sum(o_totalprice) OVER (
             PARTITION BY o_custkey ORDER BY epoch(o_orderdate)
             RANGE BETWEEN 2592000 PRECEDING AND CURRENT ROW), 2) AS spend_30d
    FROM orders
    """,
)
def q_rolling_30d(spark, sf_dir):
    """RANGE-frame window family (vs the ROWS frames elsewhere): each
    order's trailing-30-day customer spend. The frame is VALUE-based —
    all orders within 30×86400 seconds, however many rows that is —
    which Spark expresses as rangeBetween over epoch seconds; one
    shuffle on the partition key, sort within, single pass."""
    orders = _t(spark, sf_dir, "orders")
    w = (
        Window.partitionBy("o_custkey")
        .orderBy(F.unix_timestamp("o_orderdate"))
        .rangeBetween(-30 * 86400, 0)
    )
    return orders.select(
        "o_orderkey",
        "o_custkey",
        F.round(F.sum("o_totalprice").over(w), 2).alias("spend_30d"),
    )


@query(
    "merge_upsert_orders",
    """
    WITH updates AS (
      SELECT o_orderkey, o_custkey, o_orderstatus,
             round(o_totalprice * 1.1, 2) AS o_totalprice,
             o_orderdate, o_orderpriority
      FROM orders WHERE o_orderkey % 97 = 0
      UNION ALL
      SELECT o_orderkey + 100000000, o_custkey, 'N', round(o_totalprice, 2),
             o_orderdate, o_orderpriority
      FROM orders WHERE o_orderkey % 293 = 0),
    base AS (SELECT o_orderkey, o_custkey, o_orderstatus,
                    round(o_totalprice, 2) AS o_totalprice,
                    o_orderdate, o_orderpriority FROM orders)
    SELECT * FROM updates
    UNION ALL
    SELECT b.* FROM base b ANTI JOIN updates u ON b.o_orderkey = u.o_orderkey
    """,
)
def q_merge_upsert(spark, sf_dir):
    """MERGE INTO emulation (operators.cdc.merge_upsert): a synthetic
    CDC batch (10% price corrections + some fresh orders) merged into
    the orders table — matched rows replaced, new rows inserted, one
    anti-join + union, target scanned once with the update batch
    broadcast."""
    from parkour_spark.operators.cdc import merge_upsert

    cols = [
        "o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice",
        "o_orderdate", "o_orderpriority",
    ]
    orders = _t(spark, sf_dir, "orders").select(
        *[F.round("o_totalprice", 2).alias("o_totalprice") if c == "o_totalprice" else c
          for c in cols]
    )
    corrections = (
        _t(spark, sf_dir, "orders")
        .where(F.col("o_orderkey") % 97 == 0)
        .select(
            "o_orderkey", "o_custkey", "o_orderstatus",
            F.round(F.col("o_totalprice") * 1.1, 2).alias("o_totalprice"),
            "o_orderdate", "o_orderpriority",
        )
    )
    inserts = (
        _t(spark, sf_dir, "orders")
        .where(F.col("o_orderkey") % 293 == 0)
        .select(
            (F.col("o_orderkey") + 100000000).alias("o_orderkey"),
            "o_custkey", F.lit("N").alias("o_orderstatus"),
            F.round("o_totalprice", 2).alias("o_totalprice"),
            "o_orderdate", "o_orderpriority",
        )
    )
    return merge_upsert(orders, corrections.unionByName(inserts), ["o_orderkey"])


@query(
    "scd2_customer_orders",
    """
    SELECT o_custkey, o_orderkey, round(o_totalprice, 2) AS o_totalprice,
           strftime(o_orderdate, '%Y-%m-%d') AS valid_from,
           strftime(lead(o_orderdate) OVER w, '%Y-%m-%d') AS valid_to,
           lead(o_orderdate) OVER w IS NULL AS is_current
    FROM orders
    WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
    """,
)
def q_scd2(spark, sf_dir):
    """Type-2 SCD history (operators.cdc.scd2_from_events): each
    customer's order stream becomes versioned rows with
    [valid_from, valid_to) and is_current — one window pass, single
    shuffle on the business key."""
    from parkour_spark.operators.cdc import scd2_from_events

    orders = _t(spark, sf_dir, "orders")
    hist = scd2_from_events(
        orders, ["o_custkey"], "o_orderdate",
        ["o_orderkey", "o_totalprice"], order_tiebreak=["o_orderkey"],
    )
    return hist.select(
        "o_custkey", "o_orderkey", F.round("o_totalprice", 2).alias("o_totalprice"),
        F.date_format("valid_from", "yyyy-MM-dd").alias("valid_from"),
        F.date_format("valid_to", "yyyy-MM-dd").alias("valid_to"),
        "is_current",
    )


@query(
    "unpivot_lineitem_measures",
    """
    SELECT measure, round(avg(value), 4) AS avg_value, count(*) AS n
    FROM (
      SELECT 'quantity' AS measure, l_quantity AS value FROM lineitem
      UNION ALL SELECT 'extendedprice', l_extendedprice FROM lineitem
      UNION ALL SELECT 'discount', l_discount FROM lineitem
      UNION ALL SELECT 'tax', l_tax FROM lineitem)
    GROUP BY measure
    """,
)
def q_unpivot(spark, sf_dir):
    """Unpivot/melt (the inverse of the pivot family): wide numeric
    measures to long (measure, value) form via DataFrame.unpivot — a
    single Expand node, one pass, no join — then a tiny aggregate. The
    oracle expresses the same reshape as UNION ALL."""
    li = _t(spark, sf_dir, "lineitem")
    long = li.unpivot(
        ids=[],
        values=["l_quantity", "l_extendedprice", "l_discount", "l_tax"],
        variableColumnName="measure",
        valueColumnName="value",
    ).select(
        F.expr("substring(measure, 3)").alias("measure"),  # drop 'l_' prefix
        "value",
    )
    return long.groupBy("measure").agg(
        F.round(F.avg("value"), 4).alias("avg_value"), F.count("*").alias("n")
    )


@query(
    "dataset_split_counts",
    """
    WITH b AS (
      SELECT doc_id,
             ('0x' || substr(md5(doc_id::VARCHAR), 1, 8))::BIGINT % 100 AS bucket,
             len(list_filter(string_split_regex(lower(trim(text)), '\\s+'), x -> x <> '')) AS n_toks
      FROM documents)
    SELECT CASE WHEN bucket < 80 THEN 'train'
                WHEN bucket < 90 THEN 'val' ELSE 'test' END AS split,
           count(*) AS n_docs, sum(n_toks)::BIGINT AS total_tokens
    FROM b GROUP BY 1
    """,
)
def q_dataset_split(spark, sf_dir):
    """Deterministic train/val/test split (functions.sampling): content-
    hash bucketing (md5 mod 100) assigns every document to a split as a
    pure function of its id — reproducible across runs, engines, and
    partitionings, unlike seeded `sample()` whose membership shifts with
    file splits. Scan-side expression, no shuffle before the count."""
    from parkour_spark.functions.sampling import split_assign
    from parkour_spark.functions.text import token_count

    docs = _t(spark, sf_dir, "documents")
    return (
        docs.select(
            split_assign("doc_id", {"train": 0.8, "val": 0.1, "test": 0.1}).alias("split"),
            token_count("text").alias("n_toks"),
        )
        .groupBy("split")
        .agg(F.count("*").alias("n_docs"), F.sum("n_toks").alias("total_tokens"))
    )


@query(
    "tfidf_top_terms",
    f"""
    WITH toks AS (SELECT doc_id, unnest(list_distinct({_TOKS_SQL})) AS term FROM documents),
    n_docs AS (SELECT count(*) AS n FROM documents),
    tf AS (
      SELECT doc_id, term, count(*) AS tf FROM (
        SELECT doc_id, unnest({_TOKS_SQL}) AS term FROM documents)
      GROUP BY doc_id, term),
    df AS (SELECT term, count(*) AS df FROM toks GROUP BY term),
    scored AS (
      SELECT tf.doc_id, tf.term,
             round(tf.tf * ln((SELECT n FROM n_docs) / df.df::DOUBLE), 6) AS tfidf
      FROM tf JOIN df USING (term))
    SELECT doc_id, term, tfidf FROM (
      SELECT *, row_number() OVER (PARTITION BY doc_id
                ORDER BY tfidf DESC, term) AS rk
      FROM scored)
    WHERE rk <= 3
    """,
)
def q_tfidf(spark, sf_dir):
    """TF-IDF keyword extraction: per-doc term frequency × log inverse
    document frequency, top-3 terms per doc (ties by term). Plan shape:
    one explode + two aggregations; the document-frequency table is tiny
    (vocabulary-sized) and broadcasts into the scoring join, so the
    exploded term list shuffles once for tf and once for the ranking
    window — at corpus scale the vocabulary side never drives a
    shuffle. ln() is IEEE-identical across engines."""
    docs = _t(spark, sf_dir, "documents")
    from parkour_spark.functions.text import tokens

    terms = SRT.explode_fast(
        docs, tokens(F.lower(F.col("text"))), "term", keep=["doc_id"]
    )
    tf = terms.groupBy("doc_id", "term").agg(F.count("*").alias("tf"))
    # SINGLE-PASS (r2 verdict): df = count over a window keyed by term
    # on tf itself — tf has exactly one row per (doc, term), so the
    # window count IS the document frequency, and the corpus is
    # tokenized exactly once (the old broadcast-join formulation
    # duplicated the tf subtree, and lambda exprIds defeat
    # ReusedExchange canonicalization). n_docs rides in as a broadcast
    # 1-row aggregate over a zero-column scan (parquet row-group counts)
    # instead of a driver count() action.
    w_df = Window.partitionBy("term")
    n_docs = docs.agg(F.count("*").alias("n_docs"))
    scored = (
        tf.withColumn("df", F.count("*").over(w_df))
        .crossJoin(F.broadcast(n_docs))
        .select(
            "doc_id",
            "term",
            F.round(
                F.col("tf") * F.log(F.col("n_docs").cast("double") / F.col("df")), 6
            ).alias("tfidf"),
        )
    )
    w = Window.partitionBy("doc_id").orderBy(F.col("tfidf").desc(), "term")
    return (
        scored.withColumn("rk", F.row_number().over(w))
        .where(F.col("rk") <= 3)
        .select("doc_id", "term", "tfidf")
    )


@query(
    "pmi_collocations",
    f"""
    WITH toks AS (SELECT doc_id, {_TOKS_SQL} AS t FROM documents),
    uni AS (SELECT unnest(t) AS w FROM toks),
    ucnt AS (SELECT w, count(*) AS c FROM uni GROUP BY w),
    n_uni AS (SELECT count(*) AS n FROM uni),
    big AS (
      SELECT t[i] AS w1, t[i+1] AS w2
      FROM toks, unnest(range(1, greatest(len(t), 1))) AS r(i)),
    bcnt AS (SELECT w1, w2, count(*) AS c12 FROM big GROUP BY w1, w2),
    n_big AS (SELECT count(*) AS n FROM big)
    SELECT w1, w2, c12,
           round(ln((c12::DOUBLE / (SELECT n FROM n_big))
                 / ((u1.c::DOUBLE / (SELECT n FROM n_uni))
                    * (u2.c::DOUBLE / (SELECT n FROM n_uni)))), 6) AS pmi
    FROM bcnt JOIN ucnt u1 ON bcnt.w1 = u1.w JOIN ucnt u2 ON bcnt.w2 = u2.w
    WHERE c12 >= 5
    ORDER BY pmi DESC, w1, w2 LIMIT 20
    """,
)
def q_pmi(spark, sf_dir):
    """Pointwise-mutual-information bigram collocations: adjacent token
    pairs scored by ln(P(w1,w2)/(P(w1)P(w2))), min count 5, global
    top-20. Bigrams come from one scan-side transform (no self-join);
    the unigram table is vocabulary-sized and broadcasts into the
    scoring join — corpus-scale shape: explode once, aggregate, join
    small."""
    from parkour_spark.functions.text import bigrams, tokens

    docs = _t(spark, sf_dir, "documents")
    toked = docs.select(tokens(F.lower(F.col("text"))).alias("t"))
    # SINGLE corpus pass (r2 verdict: the old shape re-tokenized the
    # corpus 5×): unigrams ride as (w, NULL) marker structs next to the
    # bigram structs in one explode; one groupBy yields the combined
    # collocation count table. That table is AGGREGATED
    # (vocabulary-sized, not corpus-sized), so persisting it is the
    # scale-safe way to let unigram counts, bigram counts, and both
    # totals all derive from it without re-reading the corpus —
    # ReusedExchange can't dedupe the subtrees (lambda exprIds defeat
    # plan canonicalization), a cache hit on the analyzed plan can.
    # bigrams() guards 0/1-token docs (Spark's sequence(1,0) is the
    # DESCENDING [1,0] and would emit spurious null pairs — r2 advice).
    uni_structs = F.transform(
        F.col("t"),
        lambda w: F.struct(w.alias("w1"), F.lit(None).cast("string").alias("w2")),
    )
    stream = SRT.explode_fast(
        toked, F.concat(uni_structs, bigrams(F.col("t"))), "p"
    ).select("p.w1", "p.w2")
    # Session-scoped cache, intentional and BOUNDED (r3 advice,
    # adjudicated by measurement): CacheManager dedupes persist() by
    # canonicalized plan, so repeated invocations (bench 3×, soak,
    # oracle gate) reuse ONE vocabulary-sized entry per sf_dir — cached
    # RDD count measured flat across rounds, no accumulation.
    cnt = stream.groupBy("w1", "w2").agg(F.count("*").alias("c")).persist()
    ucnt = cnt.where(F.col("w2").isNull()).select(F.col("w1").alias("w"), "c")
    bcnt_all = cnt.where(F.col("w2").isNotNull()).select(
        "w1", "w2", F.col("c").alias("c12")
    )
    totals = cnt.agg(
        F.sum(F.when(F.col("w2").isNull(), F.col("c"))).alias("n_uni"),
        F.sum(F.when(F.col("w2").isNotNull(), F.col("c"))).alias("n_big"),
    )
    bcnt = bcnt_all.where(F.col("c12") >= 5)
    u1 = ucnt.select(F.col("w").alias("w1"), F.col("c").alias("c1"))
    u2 = ucnt.select(F.col("w").alias("w2"), F.col("c").alias("c2"))
    pmi = F.log(
        (F.col("c12") / F.col("n_big").cast("double"))
        / (
            (F.col("c1") / F.col("n_uni").cast("double"))
            * (F.col("c2") / F.col("n_uni").cast("double"))
        )
    )
    return (
        bcnt.join(F.broadcast(u1), "w1")
        .join(F.broadcast(u2), "w2")
        .crossJoin(F.broadcast(totals))
        .select("w1", "w2", "c12", F.round(pmi, 6).alias("pmi"))
        .orderBy(F.col("pmi").desc(), "w1", "w2")
        .limit(20)
    )


@query(
    "streaming_enriched_counts",
    """
    SELECT c_mktsegment, count(*) AS n, round(sum(value), 2) AS total
    FROM events JOIN customer ON user_id = c_custkey
    GROUP BY c_mktsegment
    """,
)
def q_streaming_enriched(spark, sf_dir):
    """Stream-static join: the event stream enriches against a static
    dimension (broadcast per micro-batch — no stream state, no stream
    shuffle before the aggregate). The finite replay provably equals
    the batch join, which is the oracle."""
    import tempfile

    from parkour_spark.streaming.windows import read_stream, run_to_completion

    ev = _t(spark, sf_dir, "events")
    cust = _t(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("user_id"), "c_mktsegment"
    )
    tmp = tempfile.mkdtemp(prefix="parkour_stream_")
    ev.write.mode("overwrite").parquet(tmp)
    stream = read_stream(spark, tmp, ev.schema, max_files=8)
    enriched = stream.join(F.broadcast(cust), "user_id")
    agg = enriched.groupBy("c_mktsegment").agg(
        F.count("*").alias("n"), F.round(F.sum("value"), 2).alias("total")
    )
    return run_to_completion(agg, output_mode="complete")


@query(
    "streaming_stream_join",
    """
    SELECT p.event_id, v.event_id AS view_event_id, p.user_id
    FROM events p JOIN events v
      ON p.user_id = v.user_id
     AND p.event_type = 'purchase' AND v.event_type = 'view'
     AND v.ts BETWEEN p.ts - INTERVAL 30 MINUTE AND p.ts
    """,
)
def q_streaming_stream_join(spark, sf_dir):
    """Stream-STREAM join (streaming.windows.stream_stream_join): each
    purchase matches every view by the same user in the preceding 30
    minutes — both sides are unbounded streams buffering state, with
    eviction driven by the interval predicate (the streaming analog of
    the as-of/range join family). Over the finite replay the result
    equals the batch interval join, which is the oracle.

    r4 (r3 verdict #4): the replay is written TIME-ORDERED
    (write_time_ordered_replay — sequential single-file appends in
    contiguous time slices, consumed oldest-first at one file per
    trigger), so the query runs with a REALISTIC 1-hour watermark and
    bounded state — later batches never deliver rows older than
    earlier ones, so the tight watermark loses nothing while state
    actually evicts (peak state-rows asserted well below the unbounded
    count in tests/test_r4_fixes.py). Replaces the r3 span-covering
    "800 days" workaround for unordered parquet-part replays."""
    import tempfile

    from parkour_spark.streaming.windows import (
        read_stream,
        run_to_completion,
        stream_stream_join,
        write_time_ordered_replay,
    )

    ev = _t(spark, sf_dir, "events")
    tmp = tempfile.mkdtemp(prefix="parkour_stream_")
    write_time_ordered_replay(ev, "ts", tmp, n_slices=8)
    purchases = read_stream(spark, tmp, ev.schema, max_files=1).where(
        F.col("event_type") == "purchase"
    ).select("event_id", F.col("ts").alias("p_ts"), "user_id")
    views = read_stream(spark, tmp, ev.schema, max_files=1).where(
        F.col("event_type") == "view"
    ).select(
        F.col("event_id").alias("view_event_id"),
        F.col("ts").alias("v_ts"),
        F.col("user_id").alias("v_user_id"),
    )
    cond = (
        (F.col("user_id") == F.col("v_user_id"))
        & (F.col("v_ts") >= F.col("p_ts") - F.expr("INTERVAL 30 MINUTES"))
        & (F.col("v_ts") <= F.col("p_ts"))
    )
    joined = stream_stream_join(
        purchases, views, cond, "p_ts", "v_ts", watermark="1 hour"
    )
    result = run_to_completion(
        joined.select("event_id", "view_event_id", "user_id"), output_mode="append"
    )
    return result


# ===========================================================================
# Corpus-prep operators (operators/corpus.py): decontamination, LM quality,
# BM25 retrieval, chunking, sequence packing, stratified sampling — the
# beyond-reference training-data-pipeline family (SURVEY §7 step 6).
# ===========================================================================

# 4-gram word shingles (mirrors functions.text.shingles(n=4)): 4 tokens per
# window; docs shorter than 4 tokens collapse to one whole-doc shingle.
_NGRAM4_SQL = (
    f"list_distinct(list_transform(range(1, greatest(len({_TOKS_SQL}) - 4, 0) + 2), "
    f"i -> array_to_string(list_slice({_TOKS_SQL}, i, i + 3), ' ')))"
)

_HB_SQL = "('0x' || substr(md5(doc_id::VARCHAR), 1, 8))::BIGINT"


@query(
    "decontaminate_ngram_overlap",
    f"""
    WITH b AS (SELECT doc_id, text, {_HB_SQL} % 100 AS bkt FROM documents),
    ev AS (SELECT DISTINCT unnest({_NGRAM4_SQL}) AS ngram FROM b WHERE bkt >= 95),
    tr AS (SELECT doc_id, unnest({_NGRAM4_SQL}) AS ngram FROM b WHERE bkt < 95)
    SELECT doc_id, count(*) AS n_shared_ngrams
    FROM tr JOIN ev USING (ngram) GROUP BY doc_id
    """,
)
def q_decontaminate(spark, sf_dir):
    """Benchmark decontamination (operators.corpus.ngram_contamination):
    the held-out eval set = the content-hash top-5% bucket of documents
    (deterministic, engine-independent membership); every training doc
    sharing a distinct token 4-gram with ANY eval doc is reported with
    its collision count — the standard n-gram-overlap train/test
    decontamination check.

    SCALE: eval n-grams are distinct + broadcast (benchmarks are small
    by construction); the corpus explodes scan-side into the broadcast
    join, so the only corpus shuffle is the per-doc hit count.
    `decontaminate()` anti-joins the same table to emit the clean
    corpus."""
    from parkour_spark.functions.sampling import hash_bucket

    docs = _t(spark, sf_dir, "documents")
    bkt = hash_bucket(F.col("doc_id"), 100)
    return C.ngram_contamination(
        docs.where(bkt < 95), docs.where(bkt >= 95), n=4
    )


@query(
    "unigram_lm_scores",
    f"""
    WITH terms AS (SELECT doc_id, unnest({_TOKS_SQL}) AS term FROM documents),
    tf AS (SELECT doc_id, term, count(*) AS tf FROM terms GROUP BY doc_id, term),
    cw AS (SELECT term, sum(tf)::BIGINT AS c_w FROM tf GROUP BY term),
    tot AS (SELECT sum(tf)::BIGINT AS n_total FROM tf),
    per AS (
      SELECT tf.doc_id,
             sum(round(ln(cw.c_w::DOUBLE / (SELECT n_total FROM tot)) * 1e6)::BIGINT
                 * tf.tf)::BIGINT AS sum_micro,
             sum(tf.tf)::BIGINT AS n_toks
      FROM tf JOIN cw USING (term) GROUP BY tf.doc_id)
    SELECT doc_id, n_toks,
           round(sum_micro::DOUBLE / n_toks)::BIGINT AS avg_logprob_micro
    FROM per
    """,
)
def q_unigram_lm(spark, sf_dir):
    """Unigram-LM quality scoring (operators.corpus.unigram_logprob):
    per-doc mean token log-probability under the corpus's own unigram
    distribution — the classic cheap LM-quality filter. Integer
    micro-nat arithmetic makes the additive aggregate order-independent
    and bit-identical across engines (the float-sum 1-ulp tie class
    cannot occur). Single corpus pass: corpus term counts ride a
    vocabulary-keyed window over the tf table itself (the
    tfidf_top_terms single-pass technique); N is a broadcast 1-row
    aggregate."""
    return C.unigram_logprob(_t(spark, sf_dir, "documents"))


_BM25_TERMS = ("hash", "join", "scan")


@query(
    "bm25_search",
    f"""
    WITH base AS (
      SELECT doc_id, len({_TOKS_SQL})::BIGINT AS dl, unnest({_TOKS_SQL}) AS term
      FROM documents),
    tf AS (SELECT doc_id, dl, term, count(*) AS tf FROM base
           WHERE term IN ('hash', 'join', 'scan') GROUP BY doc_id, dl, term),
    wdf AS (SELECT *, count(*) OVER (PARTITION BY term) AS df FROM tf),
    tot AS (SELECT count(*) AS n_docs,
                   (SELECT sum(len({_TOKS_SQL}))::BIGINT FROM documents) AS n_total
            FROM documents),
    scored AS (
      SELECT doc_id,
             round(ln(1 + (n_docs - df + 0.5) / (df + 0.5))
                   * ((tf * 2.2) / (tf + 1.2 * (0.25 + 0.75 * dl / (n_total::DOUBLE / n_docs))))
                   * 1e6)::BIGINT AS term_micro
      FROM wdf, tot)
    SELECT doc_id, count(*)::BIGINT AS n_qterms, sum(term_micro)::BIGINT AS score_micro
    FROM scored GROUP BY doc_id
    ORDER BY score_micro DESC, doc_id LIMIT 10
    """,
)
def q_bm25(spark, sf_dir):
    """Okapi BM25 top-10 retrieval (operators.corpus.bm25_topk) for a
    literal query-term set (k1=1.2, b=0.75). Per-term scores are
    rounded to integer micro-units BEFORE the per-doc sum, so the
    aggregate is order-independent; rank-10 ties break by doc_id.

    SCALE: the query-term filter is applied scan-side under the explode
    (broadcast literal IN-list), so the only corpus shuffle carries
    query-term postings, not the full corpus; doc length comes from the
    scan projection (size(tokens)), not a second pass."""
    return C.bm25_topk(_t(spark, sf_dir, "documents"), _BM25_TERMS, k=10)


@query(
    "doc_chunks",
    """
    SELECT doc_id, i AS chunk_idx, md5(substr(text, (i * 90 + 1)::INT, 120)) AS chunk_md5
    FROM documents,
         unnest(range(0, greatest((len(text) - 120 + 89) // 90, 0) + 1)) AS r(i)
    """,
)
def q_doc_chunks(spark, sf_dir):
    """Fixed-size overlapping chunking (operators.corpus.
    chunk_documents): 120-char windows at stride 90 (30-char overlap),
    last chunk short, every doc ≥1 chunk — the training/RAG window
    extraction op. Registered output carries md5(chunk) for a compact
    cross-engine artifact. Pure scan-side sequence+substr explode —
    zero shuffle at any scale."""
    return C.chunk_documents(_t(spark, sf_dir, "documents"), size=120, stride=90)


@query(
    "pack_sequences",
    f"""
    WITH RECURSIVE b AS (
      SELECT bucket, doc_id, n_toks,
             row_number() OVER (PARTITION BY bucket ORDER BY doc_id) AS rn
      FROM (SELECT {_HB_SQL} % 8 AS bucket, doc_id,
                   len({_TOKS_SQL})::BIGINT AS n_toks FROM documents)),
    walk AS (
      SELECT bucket, rn, n_toks, 0::BIGINT AS seq_id, n_toks AS fill
      FROM b WHERE rn = 1
      UNION ALL
      SELECT b.bucket, b.rn, b.n_toks,
             CASE WHEN w.fill + b.n_toks > 256 THEN w.seq_id + 1 ELSE w.seq_id END,
             CASE WHEN w.fill + b.n_toks > 256 THEN b.n_toks ELSE w.fill + b.n_toks END
      FROM b JOIN walk w ON b.bucket = w.bucket AND b.rn = w.rn + 1)
    SELECT bucket::INT AS bucket, seq_id, count(*)::BIGINT AS n_docs,
           sum(n_toks)::BIGINT AS seq_tokens
    FROM walk GROUP BY bucket, seq_id
    """,
)
def q_pack_sequences(spark, sf_dir):
    """Greedy sequence packing (operators.corpus.pack_sequences): fill
    256-token training sequences first-fit in deterministic doc-id
    order, parallelized across 8 content-hash buckets — each bucket's
    sequential fold runs independently in one Arrow batch
    (applyInPandas), O(1) state per bucket; docs over budget occupy a
    sequence alone. The oracle replays the identical fold as a
    per-bucket recursive CTE, proving the distributed packing is
    deterministic and partition-layout-independent.

    SCALE: bucket count is the parallelism knob (pure function of the
    id); per-bucket state is one integer, so 100 TB packs with bucket
    count sized to the cluster, no global sort, no driver state."""
    return C.pack_sequences(
        _t(spark, sf_dir, "documents"), budget=256, n_buckets=8
    )


@query(
    "stratified_sample_lang",
    f"""
    WITH b AS (SELECT lang, {_HB_SQL} % 100 AS bkt,
                      len({_TOKS_SQL})::BIGINT AS n_toks FROM documents)
    SELECT lang, count(*)::BIGINT AS n_docs, sum(n_toks)::BIGINT AS total_tokens
    FROM b WHERE bkt < CASE WHEN lang = 'en' THEN 50 ELSE 20 END
    GROUP BY lang
    """,
)
def q_stratified_sample(spark, sf_dir):
    """Stratified quota sampling (operators.corpus.stratified_sample):
    keep 50% of English docs and 20% of every other language — the
    training-mix rebalancing op — with membership decided by content
    hash of the id (reproducible across runs/engines/partitionings,
    unlike `sampleBy`'s seeded-but-layout-dependent Bernoulli draw).
    Scan-side filter; the aggregate is only the verification summary."""
    from parkour_spark.functions.text import token_count

    docs = _t(spark, sf_dir, "documents")
    kept = C.stratified_sample(docs, "lang", "doc_id", {"en": 0.5}, default=0.2)
    return kept.groupBy("lang").agg(
        F.count("*").alias("n_docs"),
        F.sum(token_count("text")).alias("total_tokens"),
    )


# ===========================================================================
# LLM-pipeline round 4b: repetition filters, PII, line dedup, mixture stats
# ===========================================================================

@query(
    "repetition_profile",
    f"""
    WITH tok AS (SELECT doc_id, {_TOKS_SQL} AS t FROM documents),
    ex AS (SELECT doc_id, unnest(t) AS tk, generate_subscripts(t, 1) AS i FROM tok),
    marks AS (
      SELECT doc_id, i,
             CASE WHEN lag(tk) OVER (PARTITION BY doc_id ORDER BY i) = tk
                  THEN 0 ELSE 1 END AS new_run
      FROM ex),
    islands AS (
      SELECT doc_id, sum(new_run) OVER (PARTITION BY doc_id ORDER BY i) AS rid
      FROM marks),
    runs AS (
      SELECT doc_id, max(cnt)::BIGINT AS max_run FROM (
        SELECT doc_id, rid, count(*) AS cnt FROM islands GROUP BY 1, 2)
      GROUP BY doc_id),
    bg AS (
      SELECT doc_id, t[i] || ' ' || t[i + 1] AS bgk
      FROM tok, unnest(range(1, len(t))) AS r(i)
      WHERE len(t) >= 2),
    topbg AS (
      SELECT doc_id, max(cnt)::BIGINT AS top_cnt FROM (
        SELECT doc_id, bgk, count(*) AS cnt FROM bg GROUP BY 1, 2)
      GROUP BY doc_id)
    SELECT tok.doc_id,
           CASE WHEN len(t) > 0
                THEN floor(10000 * len(list_distinct(t)) / len(t))::BIGINT
                ELSE 10000 END AS distinct_bp,
           coalesce(runs.max_run, 0)::BIGINT AS max_run,
           CASE WHEN len(t) >= 2
                THEN floor(10000 * topbg.top_cnt / (len(t) - 1))::BIGINT
                ELSE 0 END AS top_bigram_bp,
           (CASE WHEN len(t) > 0
                 THEN floor(10000 * len(list_distinct(t)) / len(t))::BIGINT
                 ELSE 10000 END >= 2000
            AND coalesce(runs.max_run, 0) <= 4
            AND CASE WHEN len(t) >= 2
                     THEN floor(10000 * topbg.top_cnt / (len(t) - 1))::BIGINT
                     ELSE 0 END <= 1500) AS passes
    FROM tok
    LEFT JOIN runs USING (doc_id)
    LEFT JOIN topbg USING (doc_id)
    """,
)
def q_repetition_profile(spark, sf_dir):
    """Gopher-style repetition quality profile
    (functions.text.distinct_token_ratio_bp / max_token_run /
    top_bigram_share_bp): per-doc distinct-token ratio, longest
    identical-token run, and most-frequent-bigram share, plus the
    composite pass flag (the MassiveText-style repetition filter).

    SCALE: everything is a scan-side Column fold over the staged token
    array — zero shuffle, no explode; the bigram mode is the longest run
    in the SORTED bigram array. The oracle states the identical
    quantities relationally (unnest → windows/groups)."""
    from parkour_spark.functions.text import (
        distinct_token_ratio_bp,
        max_token_run,
        top_bigram_share_bp,
        tokens,
    )

    docs = _t(spark, sf_dir, "documents")
    toked = docs.select("doc_id", tokens(F.lower(F.col("text"))).alias("__t"))
    prof = toked.select(
        "doc_id",
        distinct_token_ratio_bp(F.col("__t")).alias("distinct_bp"),
        max_token_run(F.col("__t")).alias("max_run"),
        top_bigram_share_bp(F.col("__t")).alias("top_bigram_bp"),
    )
    return prof.withColumn(
        "passes",
        (F.col("distinct_bp") >= 2000)
        & (F.col("max_run") <= 4)
        & (F.col("top_bigram_bp") <= 1500),
    )


# Deterministic planted PII: the synthetic corpus has none, so docs with
# doc_id % 3 == 0 get a suffix carrying one email, one IPv4, and one
# SSN-shaped id — identical expression in both engines, making the
# detector/redactor outputs non-vacuous and hash-checkable.
_PII_SUFFIX_SQL = (
    "CASE WHEN doc_id % 3 = 0 THEN text || ' contact user' || doc_id::VARCHAR"
    " || '@mail.example.com from 10.' || (doc_id % 200)::VARCHAR"
    " || '.0.1 ref 123-45-' || lpad((doc_id % 10000)::VARCHAR, 4, '0')"
    " ELSE text END"
)
_PII_EMAIL_SQL = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
_PII_IPV4_SQL = r"\b[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\b"
_PII_IDNUM_SQL = r"\b[0-9]{3}-[0-9]{2}-[0-9]{4}\b"


@query(
    "pii_scrub",
    f"""
    WITH base AS (SELECT doc_id, {_PII_SUFFIX_SQL} AS text FROM documents)
    SELECT doc_id,
           len(regexp_extract_all(text, '{_PII_EMAIL_SQL}'))::BIGINT AS n_email,
           len(regexp_extract_all(text, '{_PII_IPV4_SQL}'))::BIGINT AS n_ipv4,
           len(regexp_extract_all(text, '{_PII_IDNUM_SQL}'))::BIGINT AS n_idnum,
           md5(regexp_replace(regexp_replace(regexp_replace(text,
               '{_PII_EMAIL_SQL}', '<EMAIL>', 'g'),
               '{_PII_IPV4_SQL}', '<IP>', 'g'),
               '{_PII_IDNUM_SQL}', '<ID>', 'g')) AS redacted_md5
    FROM base
    """,
)
def q_pii_scrub(spark, sf_dir):
    """PII detection + redaction (functions.text.pii_counts/redact_pii)
    over a corpus with deterministically planted emails / IPv4s / id
    numbers (every doc_id % 3 == 0). Emits per-doc match counts and the
    md5 of the redacted text — byte-for-byte cross-engine (patterns are
    restricted to the RE2 ∩ java.util.regex common subset; replacement
    order is fixed email → ip → id).

    SCALE: pure scan-side regexp Columns, zero shuffle."""
    from parkour_spark.functions.text import pii_counts, redact_pii

    docs = _t(spark, sf_dir, "documents")
    planted = docs.select(
        "doc_id",
        F.when(
            F.col("doc_id") % 3 == 0,
            F.concat(
                F.col("text"),
                F.lit(" contact user"),
                F.col("doc_id").cast("string"),
                F.lit("@mail.example.com from 10."),
                (F.col("doc_id") % 200).cast("string"),
                F.lit(".0.1 ref 123-45-"),
                F.lpad((F.col("doc_id") % 10000).cast("string"), 4, "0"),
            ),
        ).otherwise(F.col("text")).alias("text"),
    )
    staged = planted.select("doc_id", pii_counts("text").alias("__p"), F.col("text"))
    return staged.select(
        "doc_id",
        F.col("__p.n_email").alias("n_email"),
        F.col("__p.n_ipv4").alias("n_ipv4"),
        F.col("__p.n_idnum").alias("n_idnum"),
        F.md5(redact_pii("text")).alias("redacted_md5"),
    )


# A fixed 10-token boilerplate line prepended to every even doc — the
# cross-document duplicate that line_dedup must strip everywhere except
# its globally-first occurrence.
_BOILER = "subscribe to our newsletter for more updates and exclusive offers"


@query(
    "line_dedup_boiler",
    f"""
    WITH base AS (
      SELECT doc_id,
             CASE WHEN doc_id % 2 = 0 THEN '{_BOILER} ' || text ELSE text END AS text
      FROM documents),
    tok AS (SELECT doc_id, {_TOKS_SQL} AS t FROM base),
    segs AS (
      SELECT doc_id, i AS line_idx,
             array_to_string(t[(i * 10 + 1):((i + 1) * 10)], ' ') AS line
      FROM tok, unnest(range(greatest(ceil(len(t) / 10)::BIGINT, 1))) AS r(i)),
    flagged AS (
      SELECT doc_id, line_idx, line,
             row_number() OVER (PARTITION BY line ORDER BY doc_id, line_idx) = 1
               AS keep
      FROM segs)
    SELECT doc_id, count(*)::BIGINT AS n_lines,
           sum(keep::INT)::BIGINT AS n_kept,
           md5(coalesce(string_agg(CASE WHEN keep THEN line END, ' '
                                   ORDER BY line_idx), '')) AS kept_md5
    FROM flagged GROUP BY doc_id
    """,
)
def q_line_dedup(spark, sf_dir):
    """Corpus-level exact line dedup (operators.corpus.line_dedup), the
    C4 boilerplate filter: a fixed 10-token boilerplate line is planted
    at the head of every even doc; dedup keeps only its globally-first
    occurrence (lowest (doc, position)) and every unique line, then
    reports per-doc kept counts + the md5 of the reassembled text.

    SCALE: first-occurrence via groupBy(line).min(struct) — map-side
    partial agg, so a line present in half the corpus ships one
    candidate per upstream partition instead of a corpus-sized hot key;
    the residual probe-side skew on the join back is AQE skew-join
    territory."""
    docs = _t(spark, sf_dir, "documents")
    planted = docs.select(
        "doc_id",
        F.when(
            F.col("doc_id") % 2 == 0, F.concat(F.lit(_BOILER + " "), F.col("text"))
        ).otherwise(F.col("text")).alias("text"),
    )
    return C.line_dedup(planted, line_tokens=10)


@query(
    "source_mixture_weights",
    f"""
    WITH per AS (
      SELECT source, count(*)::BIGINT AS n_docs,
             sum(len({_TOKS_SQL}))::BIGINT AS n_tokens
      FROM documents GROUP BY source),
    mx AS (SELECT max(n_tokens) AS m FROM per)
    SELECT source, n_docs, n_tokens,
           floor(1e6 * pow(n_tokens::DOUBLE / (SELECT m FROM mx), 0.5))::BIGINT
             AS weight_micro
    FROM per
    """,
)
def q_source_mixture(spark, sf_dir):
    """Training-mix temperature weights
    (operators.corpus.source_mixture_weights): per-source token counts
    → weight ∝ tokens^0.5, normalized by the LARGEST source so the
    float path is pow(ratio-of-exact-integers) with no cross-row float
    accumulation (a float sum's addition order is engine-dependent; a
    max of integers is not). One aggregate; the per-source table is
    tiny at any scale."""
    return C.source_mixture_weights(_t(spark, sf_dir, "documents"))


@query(
    "vocab_head_coverage",
    f"""
    WITH terms AS (SELECT unnest({_TOKS_SQL}) AS term FROM documents),
    vocab AS (SELECT term, count(*)::BIGINT AS cnt FROM terms GROUP BY term),
    tot AS (SELECT sum(cnt)::BIGINT AS total FROM vocab),
    ranked AS (
      SELECT term, cnt,
             row_number() OVER (ORDER BY cnt DESC, term) AS rank,
             sum(cnt) OVER (ORDER BY cnt DESC, term
                            ROWS UNBOUNDED PRECEDING)::BIGINT AS cum
      FROM vocab)
    SELECT rank::INT AS rank, term, cnt,
           floor(1000000 * cum / (SELECT total FROM tot))::BIGINT AS cum_micro
    FROM ranked WHERE rank <= 100
    """,
)
def q_vocab_head(spark, sf_dir):
    """Zipf head profile (operators.corpus.vocab_head_coverage): top-100
    terms by corpus frequency with integer cumulative coverage in
    micro-units — the statistic behind tokenizer vocabulary sizing and
    stopword cutoffs. One tokenize pass + one vocabulary-sized
    aggregate; ranking runs on the head rows only."""
    return C.vocab_head_coverage(_t(spark, sf_dir, "documents"), top_n=100)


@query(
    "mixture_resampled_counts",
    f"""
    WITH per AS (
      SELECT source, count(*)::BIGINT AS n_before,
             sum(len({_TOKS_SQL}))::BIGINT AS n_tokens
      FROM documents GROUP BY source),
    mn AS (SELECT min(n_tokens) AS m FROM per),
    rates AS (
      SELECT source, n_before,
             floor(1e6 * pow((SELECT m FROM mn)::DOUBLE / n_tokens, 0.5))::BIGINT
               AS rate_micro
      FROM per),
    kept AS (
      SELECT d.source, r.n_before, r.rate_micro
      FROM documents d JOIN rates r USING (source)
      WHERE ('0x' || substr(md5(d.doc_id::VARCHAR), 1, 8))::BIGINT % 1000000
              < r.rate_micro)
    SELECT source, n_before, rate_micro, count(*) AS n_after
    FROM kept GROUP BY source, n_before, rate_micro
    """,
)
def q_mixture_resampled(spark, sf_dir):
    """Temperature resampling applied (operators.corpus.
    resample_by_mixture): source_mixture_weights turned into an actual
    downsampled corpus — each source keeps rate (min_tokens/tokens)^0.5
    of its docs by content hash, realizing token shares ∝ tokens^0.5.
    The rate table is source-sized (broadcast at any scale); membership
    is a scan-side hash test. Artifact: per-source before/after counts
    and the integer micro-rate, all engine-exact."""
    docs = _t(spark, sf_dir, "documents")
    kept = C.resample_by_mixture(docs)
    before = docs.groupBy("source").agg(F.count("*").alias("n_before"))
    return (
        kept.groupBy("source", "rate_micro")
        .agg(F.count("*").alias("n_after"))
        .join(F.broadcast(before), "source")
        .select("source", "n_before", "rate_micro", "n_after")
    )


@query(
    "leakage_safe_split_counts",
    """
    WITH b AS (
      SELECT source,
             ('0x' || substr(md5(source), 1, 8))::BIGINT % 100 AS bucket
      FROM documents)
    SELECT CASE WHEN bucket < 80 THEN 'train'
                WHEN bucket < 90 THEN 'val' ELSE 'test' END AS split,
           count(*) AS n_docs, count(DISTINCT source) AS n_sources
    FROM b GROUP BY 1
    """,
)
def q_leakage_safe_split(spark, sf_dir):
    """Group-integrity train/val/test split: the hash runs on the GROUP
    key (source), so every document of a source lands in the same split
    — the leakage-safe variant of dataset_split_counts (near-duplicate
    or same-origin docs straddling train/test is the classic eval
    contamination). Scan-side expression; granularity is inherently
    group-level (a source is atomic)."""
    from parkour_spark.functions.sampling import split_assign

    docs = _t(spark, sf_dir, "documents")
    return (
        docs.select(
            split_assign("source", {"train": 0.8, "val": 0.1, "test": 0.1}).alias(
                "split"
            ),
            "source",
        )
        .groupBy("split")
        .agg(
            F.count("*").alias("n_docs"),
            F.countDistinct("source").alias("n_sources"),
        )
    )


# ===========================================================================
# Semantic dedup (SemDeDup-style: k-means cluster blocking)
# ===========================================================================

# Planted-near-dup corpus in DuckDB terms: every vector unioned with its
# deterministic perturbed copy (v + 0.15·rotate(v,1) — same expression as
# embedding_neardup_blocked; DuckDB lists are 1-based, Spark subscripts
# 0-based, hence the +1 shifts).
_SEMDEDUP_EMB = """
    emb AS (
      SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings
      UNION ALL
      SELECT vec_id + 1000000,
             list_transform(range(len(embedding)),
               j -> embedding[j + 1]::DOUBLE
                    + 0.15 * embedding[((j + 1) % len(embedding)) + 1]::DOUBLE)
      FROM embeddings)"""


def _lloyd_ctes(k: int, iters: int) -> str:
    """Lloyd's unrolled over the current `emb` CTE: c0 = hash-sampled
    init (k smallest (md5(id), id)), a{i}/c{i} per round, af = final
    assignment — the parameterized twin of _KMEANS_CTES."""
    parts = [
        f"""
    c0 AS (SELECT row_number() OVER (ORDER BY md5(vec_id::VARCHAR), vec_id) - 1 AS cell, v AS c
           FROM (SELECT vec_id, v FROM emb ORDER BY md5(vec_id::VARCHAR), vec_id LIMIT {k}))"""
    ]
    for i in range(1, iters + 1):
        parts.append(_KMEANS_ASSIGN.format(out=f"a{i}", cents=f"c{i-1}"))
        parts.append(_KMEANS_UPDATE.format(out=f"c{i}", assigned=f"a{i}"))
    parts.append(_KMEANS_ASSIGN.format(out="af", cents=f"c{iters}"))
    return ",".join(parts)


_SEMDEDUP_ORACLE = (
    "WITH "
    + _SEMDEDUP_EMB
    + ","
    + _lloyd_ctes(k=8, iters=2)
    + f"""
    SELECT id_a, id_b, round(cos, 4) AS cos FROM (
      SELECT x.vec_id AS id_a, y.vec_id AS id_b,
             {_cos_sql('x.v', 'y.v')} AS cos
      FROM af x JOIN af y ON x.cell = y.cell AND x.vec_id < y.vec_id)
    WHERE cos >= 0.9
    """
)

# Fitted-quantizer cache (same rationale as _KMEANS_IVF_CENTS: the
# k-means job runs once per corpus, not once per invocation).
_SEMDEDUP_CENTS: dict[str, list] = _SfLRU()


@query("semantic_dedup_kmeans", _SEMDEDUP_ORACLE)
def q_semantic_dedup(spark, sf_dir):
    """SemDeDup-style semantic dedup (operators.dedup.
    semantic_dedup_pairs): k-means cluster blocking over a corpus with
    planted near-duplicates (each vector ∪ its deterministic perturbed
    copy, cos ≈ 0.989), exact in-cluster cosine ≥ 0.9.

    The oracle replays the IDENTICAL pipeline in DuckDB — hash-sampled
    init, Lloyd's k=8 × 2 rounds unrolled as CTEs, argmax assignment,
    in-cluster pairs — because cluster-boundary recall loss is part of
    SemDeDup's contract: a planted pair split across clusters must be
    missing from BOTH engines, so brute-force would be the wrong
    oracle.

    SCALE: assignment is one Arrow matmul per batch (centroids ride in
    the plan, no shuffle); in-cluster pair work is Σ_c n_c², bounded by
    choosing k ∝ corpus size (the SemDeDup recipe) plus the max_cluster
    backstop; candidate pairs reuse the single-shuffle bucket-pair
    shape."""
    from parkour_spark.operators.kmeans import kmeans_fit

    emb = _t(spark, sf_dir, "embeddings").select(
        "vec_id",
        F.expr("transform(embedding, x -> cast(x as double))").alias("embedding"),
    )
    copies = emb.select(
        (F.col("vec_id") + F.lit(1000000)).alias("vec_id"),
        F.expr(
            "transform(sequence(0, size(embedding) - 1),"
            " j -> embedding[j] + 0.15D * embedding[(j + 1) % size(embedding)])"
        ).alias("embedding"),
    )
    corpus = emb.unionByName(copies)
    if sf_dir not in _SEMDEDUP_CENTS:
        _SEMDEDUP_CENTS[sf_dir] = kmeans_fit(corpus, k=8, max_iters=2)
    return D.semantic_dedup_pairs(
        corpus, threshold=0.9, centroids=_SEMDEDUP_CENTS[sf_dir]
    )


_SEMDEDUP_GROUPS_ORACLE = (
    "WITH RECURSIVE "
    + _SEMDEDUP_EMB
    + ","
    + _lloyd_ctes(k=8, iters=2)
    + f""",
    pairs AS (
      SELECT x.vec_id AS id_a, y.vec_id AS id_b
      FROM af x JOIN af y ON x.cell = y.cell AND x.vec_id < y.vec_id
      WHERE {_cos_sql('x.v', 'y.v')} >= 0.9),
    edges AS (SELECT id_a AS a, id_b AS b FROM pairs
              UNION SELECT id_b, id_a FROM pairs),
    reach(n, m) AS (
      SELECT vec_id, vec_id FROM emb
      UNION
      SELECT r.n, e.b FROM reach r JOIN edges e ON r.m = e.a
    )
    SELECT n AS vec_id, min(m) AS component, (n = min(m)) AS is_survivor
    FROM reach GROUP BY n
    """
)


@query("semantic_dedup_groups", _SEMDEDUP_GROUPS_ORACLE)
def q_semantic_dedup_groups(spark, sf_dir):
    """End of the semantic-dedup pipeline: cluster-blocked cosine pairs
    → connected components → keep the min vec_id per component
    (operators.graph.dedup_survivors over semantic_dedup_pairs). The
    oracle closes the same blocked pair set transitively with a
    recursive CTE, so the keep/drop decision for every corpus vector is
    hash-checked end-to-end (train quantizer → assign → block → verify
    → group → survive)."""
    from parkour_spark.operators.graph import dedup_survivors
    from parkour_spark.operators.kmeans import kmeans_fit

    emb = _t(spark, sf_dir, "embeddings").select(
        "vec_id",
        F.expr("transform(embedding, x -> cast(x as double))").alias("embedding"),
    )
    copies = emb.select(
        (F.col("vec_id") + F.lit(1000000)).alias("vec_id"),
        F.expr(
            "transform(sequence(0, size(embedding) - 1),"
            " j -> embedding[j] + 0.15D * embedding[(j + 1) % size(embedding)])"
        ).alias("embedding"),
    )
    corpus = emb.unionByName(copies)
    if sf_dir not in _SEMDEDUP_CENTS:
        _SEMDEDUP_CENTS[sf_dir] = kmeans_fit(corpus, k=8, max_iters=2)
    pairs = D.semantic_dedup_pairs(
        corpus, threshold=0.9, centroids=_SEMDEDUP_CENTS[sf_dir]
    )
    return dedup_survivors(corpus.select("vec_id"), pairs, node_col="vec_id")


# ===========================================================================
# Incremental ingest: delta dedup + streaming quality gate
# ===========================================================================

@query(
    "dedup_delta_ingest",
    f"""
    WITH b AS (SELECT doc_id, text, {_HB_SQL} % 100 AS bkt FROM documents),
    tn AS (SELECT doc_id, {_SHINGLES_SQL} AS t FROM b WHERE bkt >= 90),
    toc AS (SELECT doc_id, {_SHINGLES_SQL} AS t FROM b WHERE bkt < 90),
    exn AS (SELECT doc_id, unnest(t) AS tok FROM tn),
    exo AS (SELECT doc_id, unnest(t) AS tok FROM toc),
    rare AS (SELECT tok FROM (SELECT tok, count(*) AS df FROM exo GROUP BY tok)
             WHERE df <= 50),
    cand AS (
      SELECT DISTINCT n.doc_id AS id_new, o.doc_id AS id_old
      FROM exn n JOIN (SELECT doc_id, tok FROM exo JOIN rare USING (tok)) o
      USING (tok)),
    scored AS (
      SELECT id_new, id_old,
             len(list_intersect(a.t, c.t))::DOUBLE
               / len(list_distinct(list_concat(a.t, c.t))) AS jac
      FROM cand
      JOIN tn a ON cand.id_new = a.doc_id
      JOIN toc c ON cand.id_old = c.doc_id)
    SELECT id_new, id_old, round(jac, 4) AS jaccard
    FROM scored WHERE jac >= 0.8
    """,
)
def q_dedup_delta(spark, sf_dir):
    """Incremental ingest dedup (operators.dedup.ngram_jaccard_delta):
    the content-hash top-10% of documents plays the INCOMING batch, the
    rest the EXISTING corpus; pairs are (new, old) only — the new batch
    probes the corpus's df-capped shingle bucket index, which is the
    production shape (index precomputed once; probe fan-out ∝ new-batch
    shingles · cap, independent of corpus self-pair volume)."""
    from parkour_spark.functions.sampling import hash_bucket

    docs = _t(spark, sf_dir, "documents")
    bkt = hash_bucket(F.col("doc_id"), 100)
    return D.ngram_jaccard_delta(
        docs.where(bkt >= 90), docs.where(bkt < 90), threshold=0.8, max_df=50
    )


_MINHASH_INDEX_DIRS: dict[str, str] = _SfLRUDirs()


def _minhash_probe_oracle(
    num_hashes: int = 12, bands: int = 4, threshold: float = 0.8, cap: int = 200
) -> str:
    import math

    from parkour_spark.operators.dedup import MINHASH_P, minhash_params

    rpb = num_hashes // bands
    min_matches = math.ceil(threshold * num_hashes - 1e-9)
    # signature chain identical to _minhash_oracle (hash-green since r2)
    x = f"(('0x' || substr(md5(x), 1, 8))::BIGINT % {MINHASH_P})"
    sig_cols = ",\n       ".join(
        f"list_min(list_transform(t, x -> ({a} * {x} + {b}) % {MINHASH_P})) AS sig_{i}"
        for i, (a, b) in enumerate(minhash_params(num_hashes))
    )
    band_keys = ", ".join(
        "'" + str(b) + "|' || " + " || '|' || ".join(f"sig_{b * rpb + r}" for r in range(rpb))
        for b in range(bands)
    )
    match_sum = " + ".join(
        f"CASE WHEN sa.sig_{i} = sb.sig_{i} THEN 1 ELSE 0 END"
        for i in range(num_hashes)
    )
    return f"""
    WITH b AS (SELECT doc_id, text, {_HB_SQL} % 100 AS bkt FROM documents),
    toks AS (SELECT doc_id, bkt, {_SHINGLES_SQL} AS t FROM b),
    sigs AS (SELECT doc_id, bkt, {sig_cols} FROM toks),
    bandx AS (SELECT doc_id, bkt, unnest([{band_keys}]) AS band_key FROM sigs),
    oldb AS (SELECT doc_id, band_key FROM bandx WHERE bkt < 90),
    ok AS (SELECT band_key FROM oldb GROUP BY band_key HAVING count(*) <= {cap}),
    newb AS (SELECT doc_id, band_key FROM bandx WHERE bkt >= 90),
    cand AS (
      SELECT DISTINCT n.doc_id AS id_new, o.doc_id AS id_old
      FROM newb n
      JOIN (SELECT oldb.doc_id, oldb.band_key
            FROM oldb JOIN ok USING (band_key)) o
      USING (band_key)),
    m AS (
      SELECT id_new, id_old, ({match_sum})::BIGINT AS sig_matches
      FROM cand
      JOIN sigs sa ON sa.doc_id = cand.id_new
      JOIN sigs sb ON sb.doc_id = cand.id_old)
    SELECT id_new, id_old, sig_matches,
           round(sig_matches / {float(num_hashes)}, 4) AS est_jaccard
    FROM m WHERE sig_matches >= {min_matches}
    """


@query("minhash_probe_persisted", _minhash_probe_oracle())
def q_minhash_probe_persisted(spark, sf_dir):
    """Probe-only MinHash near-dup against a PERSISTED band index
    (dedup.minhash_index_build / minhash_probe_delta) — completes the
    persisted-index trio (substring fps, embedding IVF, document
    minhash). The content-hash top-10% of documents plays the incoming
    batch, the rest the indexed corpus; verification is SIGNATURE-only
    (agreement fraction, the unbiased MinHash Jaccard estimator), so
    corpus text is read exactly once — at build. The index is cached
    per corpus version like the IVF/z-order layouts: rebuilding per
    call would bill the amortized build as recurring probe cost."""
    import tempfile

    from parkour_spark.functions.sampling import hash_bucket

    docs = _t(spark, sf_dir, "documents")
    bkt = hash_bucket(F.col("doc_id"), 100)
    if sf_dir not in _MINHASH_INDEX_DIRS:
        tmp = tempfile.mkdtemp(prefix="parkour_mhidx_")
        D.minhash_index_build(docs.where(bkt < 90), tmp, max_bucket=200)
        _MINHASH_INDEX_DIRS[sf_dir] = tmp
    return D.minhash_probe_delta(
        spark, docs.where(bkt >= 90), _MINHASH_INDEX_DIRS[sf_dir], threshold=0.8
    )


@query(
    "streaming_quality_ingest",
    f"""
    WITH scored AS (
      SELECT source,
             (least(length(text) * 8, 4000)
              + CASE WHEN len({_TOKS_SQL}) > 0
                     THEN floor(3000.0 * least(len(list_filter({_TOKS_SQL},
                                  x -> x IN ({_STOP_SQL}))) * 10, len({_TOKS_SQL}))
                                / len({_TOKS_SQL}))
                     ELSE 0 END
              + CASE WHEN list_sum(list_transform({_TOKS_SQL}, t -> length(t)))::DOUBLE
                          / len({_TOKS_SQL}) BETWEEN 3.0 AND 10.0
                     THEN 3000 ELSE 0 END) / 10000.0 AS quality,
             len({_TOKS_SQL})::BIGINT AS n_toks
      FROM documents)
    SELECT source, count(*)::BIGINT AS n_docs, sum(n_toks)::BIGINT AS total_tokens
    FROM scored WHERE quality >= 0.5 GROUP BY source
    """,
)
def q_streaming_quality(spark, sf_dir):
    """Quality-gated streaming ingest: the corpus replayed as a file
    stream, quality-scored scan-side per micro-batch, low-quality docs
    dropped BEFORE any state, per-source running totals in complete
    mode. Over the finite replay the running aggregate equals the batch
    filter+group — the oracle. Production swaps the memory sink for a
    real one and keeps the same plan; the gate costs zero shuffle
    because the filter is a per-row projection."""
    import tempfile

    from parkour_spark.functions.text import quality_score, token_count
    from parkour_spark.streaming.windows import read_stream, run_to_completion

    docs = _t(spark, sf_dir, "documents")
    tmp = tempfile.mkdtemp(prefix="parkour_stream_q_")
    docs.write.mode("overwrite").parquet(tmp)
    stream = read_stream(spark, tmp, docs.schema, max_files=4)
    gated = stream.where(quality_score("text") >= 0.5)
    agg = gated.groupBy("source").agg(
        F.count("*").alias("n_docs"),
        F.sum(token_count("text")).alias("total_tokens"),
    )
    return run_to_completion(agg, output_mode="complete")


@query(
    "winnow_overlap_pairs",
    """
    WITH norm AS (
      SELECT doc_id, regexp_replace(lower(trim(text)), '\\s+', ' ', 'g') AS nt
      FROM documents),
    grams AS (
      SELECT doc_id,
             list_transform(range(1, greatest(length(nt) - 7, 1) + 1),
               i -> ('0x' || substr(md5(substr(nt, i, 8)), 1, 8))::BIGINT) AS g
      FROM norm),
    fps AS (
      SELECT doc_id,
             list_distinct(list_transform(range(1, greatest(len(g) - 7, 1) + 1),
               j -> list_min(g[j:j+7]))) AS fp_set
      FROM grams),
    ex AS (SELECT doc_id, unnest(fp_set) AS fp FROM fps),
    rare AS (SELECT fp FROM (SELECT fp, count(*) AS df FROM ex GROUP BY fp)
             WHERE df BETWEEN 2 AND 50)
    SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*)::BIGINT AS n_shared
    FROM (SELECT doc_id, fp FROM ex JOIN rare USING (fp)) a
    JOIN (SELECT doc_id, fp FROM ex JOIN rare USING (fp)) b USING (fp)
    WHERE a.doc_id < b.doc_id
    GROUP BY 1, 2 HAVING count(*) >= 3
    """,
)
def q_winnow_overlap(spark, sf_dir):
    """Substring-overlap pairs from winnowing fingerprints
    (operators.dedup.winnow_overlap_pairs): docs sharing >= 3 selected
    k-gram fingerprints, with boilerplate fps (df > 50) dropped — the
    plagiarism/containment detector that completes the winnowing
    pipeline (fingerprints -> shared-fp ranking), never pairwise over
    documents."""
    return D.winnow_overlap_pairs(_t(spark, sf_dir, "documents"))


# Shared CTE chain for the substring-dedup family: winnowed (fp, pos)
# occurrences → df-capped fp-bucket pairs → constant-delta runs → spans.
_SUBSTR_SPAN_CTES = """
    norm AS (
      SELECT doc_id, regexp_replace(lower(trim(text)), '\\s+', ' ', 'g') AS nt
      FROM documents),
    grams AS (
      SELECT doc_id,
             list_transform(range(1, greatest(length(nt) - 7, 1) + 1),
               i -> ('0x' || substr(md5(substr(nt, i, 8)), 1, 8))::BIGINT) AS g
      FROM norm),
    fpp AS (
      SELECT doc_id,
             list_transform(range(1, greatest(len(g) - 7, 1) + 1),
               j -> {'fp': list_min(g[j:j+7]),
                     'pos': j - 1 + list_position(g[j:j+7], list_min(g[j:j+7]))}) AS ps
      FROM grams),
    occ AS (
      SELECT DISTINCT doc_id, u.fp AS fp, u.pos AS pos
      FROM (SELECT doc_id, unnest(ps) AS u FROM fpp)),
    capped AS (
      SELECT fp FROM occ GROUP BY fp
      HAVING count(DISTINCT doc_id) BETWEEN 2 AND 50 AND count(*) <= 200),
    pairs AS (
      SELECT a.doc_id AS id_a, b.doc_id AS id_b, a.pos AS pos_a,
             a.pos - b.pos AS delta
      FROM occ a JOIN capped USING (fp) JOIN occ b USING (fp)
      WHERE a.doc_id < b.doc_id),
    runs AS (
      SELECT *, CASE WHEN pos_a - lag(pos_a) OVER
                       (PARTITION BY id_a, id_b, delta ORDER BY pos_a) <= 8
                     THEN 0 ELSE 1 END AS brk
      FROM pairs),
    runid AS (
      SELECT *, sum(brk) OVER (PARTITION BY id_a, id_b, delta ORDER BY pos_a
                               ROWS UNBOUNDED PRECEDING) AS run
      FROM runs),
    spans AS (
      SELECT id_a, id_b, delta, run, min(pos_a) AS a_start,
             max(pos_a) + 7 AS a_end, count(*) AS n_fps
      FROM runid GROUP BY 1, 2, 3, 4),
    spansout AS (
      SELECT id_a, id_b, a_start, a_end, a_start - delta AS b_start,
             a_end - a_start + 1 AS span_len, n_fps
      FROM spans
      WHERE a_end - a_start + 1 >= 20)
"""


@query(
    "substring_dedup_spans",
    f"""
    WITH {_SUBSTR_SPAN_CTES}
    SELECT * FROM spansout
    """,
)
def q_substring_spans(spark, sf_dir):
    """EXACT-substring overlap spans (operators.dedup.
    substring_overlap_spans) — the distributed stand-in for
    suffix-array substring dedup (Lee et al. 2022): verbatim shared
    substrings appear as runs of shared winnowing fingerprints at
    constant position offset; runs segment at position gaps > w and
    each run flags a [a_start, a_end] char span (and its b_start
    mirror). Candidates come from ONE df-capped fingerprint-bucket
    shuffle + a window pass — no suffix array, no global sort, no
    all-pairs. The oracle replays the identical construction (same
    tie-break: first minimum per window in both engines). 182 spans at
    sf0.01 — real boilerplate overlap in the corpus, plus a planted
    long-overlap recall test in tests/test_dedup_spans.py."""
    return D.substring_overlap_spans(_t(spark, sf_dir, "documents"))


@query(
    "substring_dedup_clean",
    f"""
    WITH {_SUBSTR_SPAN_CTES},
    iv AS (
      SELECT DISTINCT id_b AS doc_id, b_start AS s, b_start + span_len - 1 AS e
      FROM spansout),
    isl AS (
      SELECT *, CASE WHEN s > max(e) OVER (PARTITION BY doc_id ORDER BY s, e
                       ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) + 1
                     THEN 1 ELSE 0 END AS brk2
      FROM iv),
    isl2 AS (
      SELECT *, sum(brk2) OVER (PARTITION BY doc_id ORDER BY s, e
                                ROWS UNBOUNDED PRECEDING) AS isl
      FROM isl),
    merged AS (
      SELECT doc_id, isl, min(s) AS s, max(e) AS e, count(*) AS n
      FROM isl2 GROUP BY 1, 2),
    segs AS (
      SELECT doc_id, s, e,
             coalesce(lag(e) OVER (PARTITION BY doc_id ORDER BY s) + 1, 1)
               AS seg_start
      FROM merged),
    perdoc AS (
      SELECT g.doc_id,
             string_agg(substr(n.nt, g.seg_start::INT, (g.s - g.seg_start)::INT),
                        '' ORDER BY g.s) AS head,
             max(g.e) AS last_e
      FROM segs g JOIN norm n USING (doc_id)
      GROUP BY 1),
    stats AS (
      -- CASTs: HUGEINT sums -> float64 under the driver's pandas fetch
      SELECT doc_id, CAST(sum(e - s + 1) AS BIGINT) AS removed_chars,
             CAST(sum(n) AS BIGINT) AS n_spans
      FROM merged GROUP BY 1),
    cleaned AS (
      SELECT n.doc_id,
             CASE WHEN p.doc_id IS NULL THEN n.nt
                  ELSE p.head || substr(n.nt, (p.last_e + 1)::INT) END AS clean,
             coalesce(st.removed_chars, 0) AS removed_chars,
             coalesce(st.n_spans, 0) AS n_spans
      FROM norm n
      LEFT JOIN perdoc p USING (doc_id)
      LEFT JOIN stats st USING (doc_id))
    SELECT doc_id, md5(clean) AS clean_md5, length(clean) AS clean_len,
           removed_chars, n_spans
    FROM cleaned
    """,
)
def q_substring_clean(spark, sf_dir):
    """Apply half of substring dedup (operators.dedup.
    substring_dedup_apply): every flagged span's higher-doc-id copy is
    cut from the normalized text (keep-first-occurrence, matching the
    exact/near-dup family's policy); overlapping spans merge via the
    gaps-and-islands window before cutting so removal is well-defined.
    Output fingerprints the cleaned text (md5) rather than carrying
    it. The oracle replays detection + merge + cut end-to-end —
    string surgery is exact across engines because both cut the same
    normalized text at the same offsets."""
    docs = _t(spark, sf_dir, "documents")
    return D.substring_dedup_apply(docs, D.substring_overlap_spans(docs))


def _substring_delta_oracle(max_df: int = 50) -> str:
    """The substring-delta DuckDB replay (winnow → df-capped corpus
    lists → fp equi-join → constant-delta run segmentation),
    parameterized on the df cap so the persisted-index entries can
    replay non-default builds (the read-repair entry builds with an
    ample cap to isolate the tombstone mechanism from cap
    resurrection)."""
    return f"""
    WITH b AS (SELECT doc_id, text, {_HB_SQL} % 100 AS bkt FROM documents),
    norm AS (
      SELECT doc_id, bkt,
             regexp_replace(lower(trim(text)), '\\s+', ' ', 'g') AS nt
      FROM b),
    grams AS (
      SELECT doc_id, bkt,
             list_transform(range(1, greatest(length(nt) - 7, 1) + 1),
               i -> ('0x' || substr(md5(substr(nt, i, 8)), 1, 8))::BIGINT) AS g
      FROM norm),
    fpp AS (
      SELECT doc_id, bkt,
             list_transform(range(1, greatest(len(g) - 7, 1) + 1),
               j -> {{'fp': list_min(g[j:j+7]),
                      'pos': j - 1 + list_position(g[j:j+7], list_min(g[j:j+7]))}}) AS ps
      FROM grams),
    occ AS (
      SELECT DISTINCT doc_id, bkt, u.fp AS fp, u.pos AS pos
      FROM (SELECT doc_id, bkt, unnest(ps) AS u FROM fpp)),
    occ_new AS (SELECT doc_id, fp, pos FROM occ WHERE bkt >= 90),
    occ_old AS (SELECT doc_id, fp, pos FROM occ WHERE bkt < 90),
    capped AS (
      SELECT fp FROM occ_old GROUP BY fp
      HAVING count(DISTINCT doc_id) <= {max_df}
         AND count(*) <= {4 * max_df}),
    pairs AS (
      SELECT n.doc_id AS id_new, o.doc_id AS id_old, n.pos AS pos_new,
             n.pos - o.pos AS delta
      FROM occ_new n
      JOIN (SELECT * FROM occ_old JOIN capped USING (fp)) o USING (fp)),
    runs AS (
      SELECT *, CASE WHEN pos_new - lag(pos_new) OVER
                       (PARTITION BY id_new, id_old, delta ORDER BY pos_new) <= 8
                     THEN 0 ELSE 1 END AS brk
      FROM pairs),
    runid AS (
      SELECT *, sum(brk) OVER (PARTITION BY id_new, id_old, delta ORDER BY pos_new
                               ROWS UNBOUNDED PRECEDING) AS run
      FROM runs),
    spans AS (
      SELECT id_new, id_old, delta, run, min(pos_new) AS new_start,
             max(pos_new) + 7 AS new_end, count(*) AS n_fps
      FROM runid GROUP BY 1, 2, 3, 4)
    SELECT id_new, id_old, new_start, new_end, new_start - delta AS old_start,
           new_end - new_start + 1 AS span_len, n_fps
    FROM spans
    WHERE new_end - new_start + 1 >= 20
    """


@query("substring_spans_delta", _substring_delta_oracle())
def q_substring_delta(spark, sf_dir):
    """Ingest-shape substring spans (operators.dedup.
    substring_spans_delta): the content-hash top-10% of documents plays
    the incoming batch, the rest the corpus; the batch probes the
    corpus's df-capped positioned-fingerprint index by equi-join —
    probe fan-out ∝ batch fps · cap, the corpus never self-pairs. The
    df cap is a CORPUS property (no lower bound: a fingerprint unique
    to one corpus doc still serves probes). Same constant-delta run
    segmentation as the in-batch detector."""
    from parkour_spark.functions.sampling import hash_bucket

    docs = _t(spark, sf_dir, "documents")
    bkt = hash_bucket(F.col("doc_id"), 100)
    return D.substring_spans_delta(docs.where(bkt >= 90), docs.where(bkt < 90))


@query(
    "quantized_embeddings",
    """
    WITH dims AS (
      SELECT generate_subscripts(embedding, 1) AS dim, unnest(embedding) AS val
      FROM embeddings),
    stats AS (SELECT dim, min(val)::DOUBLE AS mn, max(val)::DOUBLE AS mx
              FROM dims GROUP BY dim),
    mnmx AS (SELECT list(mn ORDER BY dim) AS mn, list(mx ORDER BY dim) AS mx
             FROM stats),
    v AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
    coded AS (
      SELECT vec_id, v, mn, mx,
             list_transform(range(1, len(v) + 1), i ->
               CASE WHEN mx[i] > mn[i]
                    THEN least(greatest(floor((v[i] - mn[i])
                                 / ((mx[i] - mn[i]) / 256)), 0), 255)::BIGINT
                    ELSE 0 END) AS codes
      FROM v CROSS JOIN mnmx),
    errs AS (
      SELECT vec_id, codes,
             list_transform(range(1, len(v) + 1), i ->
               CASE WHEN mx[i] > mn[i]
                    THEN pow(v[i] - (mn[i] + (codes[i] + 0.5)
                             * ((mx[i] - mn[i]) / 256)), 2)
                    ELSE pow(v[i] - mn[i], 2) END) AS e2,
             len(v) AS d
      FROM coded)
    SELECT vec_id,
           md5(array_to_string(list_transform(codes, c -> c::VARCHAR), ',')) AS codes_md5,
           floor(list_reduce(e2, (x, y) -> x + y) / d * 1e6)::BIGINT AS mse_micro
    FROM errs
    """,
)
def q_quantize(spark, sf_dir):
    """Scalar int8 quantization of the embedding corpus
    (operators.similarity.quantize_embeddings): per-dim min/max stats
    (order-independent — the reason min/max and not mean/std), codes =
    floor((x-min)/scale) clamped, md5 of the code array + integer
    micro-MSE against dequantized midpoints. The stats pass is one
    posexplode + partial-agg groupBy; coding is scan-side zip_with."""
    from parkour_spark.operators.similarity import quantize_embeddings

    return quantize_embeddings(_t(spark, sf_dir, "embeddings"))


@query(
    "bigram_lm_scores",
    f"""
    WITH toked AS (SELECT doc_id, {_TOKS_SQL} AS t FROM documents),
    bg AS (SELECT doc_id, t[i] AS w1, t[i + 1] AS w2
           FROM toked, unnest(range(1, len(t))) AS r(i)
           WHERE len(t) >= 2),
    tf AS (SELECT doc_id, w1, w2, count(*) AS tf FROM bg GROUP BY 1, 2, 3),
    c12 AS (SELECT w1, w2, sum(tf)::BIGINT AS c12 FROM tf GROUP BY 1, 2),
    c1 AS (SELECT w1, sum(tf)::BIGINT AS c1 FROM tf GROUP BY 1),
    v AS (SELECT count(*)::BIGINT AS v FROM
          (SELECT w1 AS w FROM tf UNION SELECT w2 FROM tf)),
    per AS (
      SELECT tf.doc_id,
             sum(round(ln((c12.c12 + 1)::DOUBLE / (c1.c1 + (SELECT v FROM v)))
                       * 1e6)::BIGINT * tf.tf)::BIGINT AS sum_micro,
             sum(tf.tf)::BIGINT AS n_bigrams
      FROM tf JOIN c12 USING (w1, w2) JOIN c1 USING (w1)
      GROUP BY tf.doc_id)
    SELECT doc_id, n_bigrams,
           round(sum_micro::DOUBLE / n_bigrams)::BIGINT AS avg_logprob_micro
    FROM per
    """,
)
def q_bigram_lm(spark, sf_dir):
    """Bigram-LM quality scoring (operators.corpus.bigram_lm_scores):
    per-doc mean log P(w2|w1) under the corpus's own add-1-smoothed
    bigram model — catches shuffled/templated text whose TRANSITIONS
    are rare even when its vocabulary is common (the step unigram LM
    cannot take). Single corpus pass; conditional counts are windows
    over the one (doc, w1, w2) tf table; vocabulary size broadcasts."""
    return C.bigram_lm_scores(_t(spark, sf_dir, "documents"))


@query(
    "hashed_doc_knn",
    f"""
    WITH terms AS (SELECT doc_id, unnest({_TOKS_SQL}) AS term FROM documents),
    dimmed AS (SELECT doc_id,
                      ('0x' || substr(md5(term), 1, 8))::BIGINT % 64 AS dim
               FROM terms),
    counts AS (SELECT doc_id, dim, count(*) AS cnt FROM dimmed GROUP BY 1, 2),
    grid AS (SELECT d.doc_id, r.dim FROM (SELECT doc_id FROM documents) d,
             (SELECT unnest(range(0, 64)) AS dim) r),
    filled AS (SELECT g.doc_id, g.dim, coalesce(c.cnt, 0)::DOUBLE AS v
               FROM grid g LEFT JOIN counts c USING (doc_id, dim)),
    vecs AS (SELECT doc_id, list(v ORDER BY dim) AS vec FROM filled GROUP BY doc_id),
    q AS (SELECT doc_id AS query_id, vec AS qv FROM vecs WHERE doc_id < 3),
    c AS (SELECT doc_id, vec FROM vecs WHERE doc_id >= 3),
    scored AS (
      SELECT query_id, doc_id, round({_cos_sql('vec', 'qv')}, 4) AS cos
      FROM c, q)
    SELECT query_id, doc_id, rank, cos FROM (
      SELECT *, row_number() OVER (PARTITION BY query_id
                                   ORDER BY cos DESC, doc_id) AS rank
      FROM scored)
    WHERE rank <= 5
    """,
)
def q_hashed_doc_knn(spark, sf_dir):
    """Model-free text retrieval end-to-end: feature-hashed tf vectors
    (operators.corpus.hashed_doc_vectors, the hashing trick — token
    counts land in md5(token) % 64 dims) feed the SAME brute-force
    cosine top-k used for real embeddings. Integer counts make every
    dot/norm exact, so rankings are engine-independent with no float
    tie class. Demonstrates that the similarity family (kNN here; IVF,
    quantization, semantic dedup identically) composes with derived
    vectors, not just shipped embeddings."""
    vecs = C.hashed_doc_vectors(_t(spark, sf_dir, "documents"), dims=64)
    queries = vecs.where(F.col("doc_id") < 3).select(
        F.col("doc_id").alias("query_id"), F.col("vec").alias("query_vec")
    )
    corpus = vecs.where(F.col("doc_id") >= 3)
    return SIM.brute_force_topk(
        corpus, queries, k=5, corpus_id="doc_id", corpus_vec="vec"
    ).select("query_id", "doc_id", "rank", "cos")


def _pagerank_oracle(iters: int = 3) -> str:
    from parkour_spark.operators.dedup import MINHASH_P, minhash_params

    # pairs CTE chain = the dedup_minhash_lsh oracle (same graph as
    # dedup_groups), then integer-micro PageRank unrolled.
    num_hashes, bands = 12, 4
    rpb = num_hashes // bands
    x = f"(('0x' || substr(md5(x), 1, 8))::BIGINT % {MINHASH_P})"
    sig_cols = ",\n       ".join(
        f"list_min(list_transform(t, x -> ({a} * {x} + {b}) % {MINHASH_P})) AS sig_{i}"
        for i, (a, b) in enumerate(minhash_params(num_hashes))
    )
    band_keys = ", ".join(
        "'" + str(b) + "|' || " + " || '|' || ".join(f"sig_{b * rpb + r}" for r in range(rpb))
        for b in range(bands)
    )
    rounds = []
    for i in range(1, iters + 1):
        p = f"r{i-1}"
        rounds.append(f"""
    r{i} AS (
      SELECT {p}.n, (150000 + coalesce(s.in_sum, 0))::BIGINT AS r
      FROM {p} LEFT JOIN (
        SELECT e.b AS n2,
               sum(round(0.85 * {p}.r / deg.deg)::BIGINT)::BIGINT AS in_sum
        FROM edges e JOIN {p} ON e.a = {p}.n JOIN deg ON e.a = deg.a
        GROUP BY e.b) s ON {p}.n = s.n2)""")
    return f"""
    WITH toks AS (SELECT doc_id, {_SHINGLES_SQL} AS t FROM documents),
    sigs AS (SELECT doc_id, {sig_cols} FROM toks),
    bands AS (SELECT doc_id, unnest([{band_keys}]) AS band_key FROM sigs),
    cand AS (
      SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
      FROM bands a JOIN bands b USING (band_key)
      WHERE a.doc_id < b.doc_id),
    pairs AS (
      SELECT id_a, id_b FROM cand
      JOIN toks ta ON cand.id_a = ta.doc_id
      JOIN toks tb ON cand.id_b = tb.doc_id
      WHERE len(list_intersect(ta.t, tb.t))::DOUBLE
            / len(list_distinct(list_concat(ta.t, tb.t))) >= 0.8),
    edges AS (SELECT id_a AS a, id_b AS b FROM pairs
              UNION SELECT id_b, id_a FROM pairs),
    deg AS (SELECT a, count(*) AS deg FROM edges GROUP BY a),
    r0 AS (SELECT doc_id AS n, 1000000::BIGINT AS r FROM documents),
    {",".join(rounds)}
    SELECT n AS doc_id, r AS rank_micro FROM r{iters}
    """


@query("pagerank_dedup_graph", _pagerank_oracle())
def q_pagerank(spark, sf_dir):
    """Distributed PageRank (operators.graph.pagerank) over the
    near-dup pair graph (the same MinHash graph dedup_groups closes):
    centrality inside dup clusters = the most-connected canonical
    document, the alternative to min-id survivor choice. Integer
    micro-rank trajectory (per-edge contributions rounded BEFORE the
    neighbor sum) makes all 3 iterations engine-exact, so the oracle
    unrolls them as CTEs. Same join primitive and per-round
    checkpointing as connected components."""
    from parkour_spark.operators.graph import pagerank

    docs = _t(spark, sf_dir, "documents")
    pairs = D.minhash_dedup_pairs(docs, threshold=0.8)
    return pagerank(docs.select("doc_id"), pairs, node_col="doc_id", iters=3)


# ===========================================================================
# TPC-H-adapted plan-shape coverage (beyond the reference's own queries)
# ===========================================================================
# The reference ships word-count-class examples; an analytics engine
# claiming its workload also needs the canonical warehouse plan shapes.
# Each query below is the standard TPC-H shape adapted to the driver's
# schema subset (no partsupp; lineitem lacks shipmode/shipinstruct/
# commitdate), chosen so each exercises a DISTINCT physical plan:
# scan-only agg (q6), nation-pair decode join (q7), outer-join-free
# top-k with a selective fact filter (q10), conditional aggregation
# (q14), having-over-join (q18), disjunctive pushdown (q19).


@query(
    "q6_forecast_revenue",
    """
    SELECT round(sum(l_extendedprice * l_discount), 2) AS revenue,
           count(*) AS n
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND l_shipdate < TIMESTAMP '1997-01-01 00:00:00'
      AND l_discount BETWEEN 0.05 AND 0.07
      AND l_quantity < 24
    """,
)
def q_q6(spark, sf_dir):
    """TPC-H Q6 shape: pure scan + conjunctive filter + global agg —
    zero joins, zero wide shuffle (partial agg per partition, 1-row
    merge). At 100 TB this is the pushdown litmus test: all four
    predicates reach the parquet scan (PushedFilters) and only the
    4 referenced columns are read (ReadSchema); asserted in
    tests/test_plans.py."""
    li = _t(spark, sf_dir, "lineitem")
    return (
        li.where(
            (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp"))
            & (F.col("l_discount") >= 0.05)
            & (F.col("l_discount") <= 0.07)
            & (F.col("l_quantity") < 24)
        )
        .agg(
            F.round(F.sum(F.col("l_extendedprice") * F.col("l_discount")), 2).alias(
                "revenue"
            ),
            F.count("*").alias("n"),
        )
    )


@query(
    "q7_volume_shipping",
    """
    SELECT cn.n_name AS cust_nation, sn.n_name AS supp_nation,
           year(l_shipdate) AS l_year,
           round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
    FROM lineitem
    JOIN orders ON l_orderkey = o_orderkey
    JOIN customer ON o_custkey = c_custkey
    JOIN supplier ON l_suppkey = s_suppkey
    JOIN nation cn ON c_nationkey = cn.n_nationkey
    JOIN nation sn ON s_nationkey = sn.n_nationkey
    WHERE cn.n_nationkey <> sn.n_nationkey
      AND cn.n_nationkey < 4 AND sn.n_nationkey < 4
    GROUP BY cn.n_name, sn.n_name, year(l_shipdate)
    """,
)
def q_q7(spark, sf_dir):
    """TPC-H Q7 shape (cross-nation shipping volume): the fact chain
    shuffles once per join key; BOTH nation decodes broadcast (the same
    dim table twice under different aliases), and the nation-pair
    predicates apply against the broadcast rows — so the selective
    nation filter never costs a shuffle. Group-by on derived year."""
    li = _t(spark, sf_dir, "lineitem")
    orders = _t(spark, sf_dir, "orders")
    cust = _t(spark, sf_dir, "customer")
    sup = _t(spark, sf_dir, "supplier")
    nation = _t(spark, sf_dir, "nation")
    cn = nation.where(F.col("n_nationkey") < 4).select(
        F.col("n_nationkey").alias("cn_key"), F.col("n_name").alias("cust_nation")
    )
    sn = nation.where(F.col("n_nationkey") < 4).select(
        F.col("n_nationkey").alias("sn_key"), F.col("n_name").alias("supp_nation")
    )
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(sup), li.l_suppkey == sup.s_suppkey)
        .join(F.broadcast(cn), cust.c_nationkey == F.col("cn_key"))
        .join(F.broadcast(sn), sup.s_nationkey == F.col("sn_key"))
        .where(F.col("cn_key") != F.col("sn_key"))
        .groupBy(
            "cust_nation", "supp_nation", F.year("l_shipdate").alias("l_year")
        )
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("revenue")
        )
    )


@query(
    "q8_market_share",
    """
    WITH vol AS (
      SELECT year(o_orderdate) AS o_year,
             CAST(round(l_extendedprice * (1 - l_discount) * 100) AS BIGINT)
               AS cents,
             sn.n_name AS supp_nation
      FROM lineitem
      JOIN part ON l_partkey = p_partkey
      JOIN orders ON l_orderkey = o_orderkey
      JOIN customer ON o_custkey = c_custkey
      JOIN nation cn ON c_nationkey = cn.n_nationkey
      JOIN region ON cn.n_regionkey = r_regionkey
      JOIN supplier ON l_suppkey = s_suppkey
      JOIN nation sn ON s_nationkey = sn.n_nationkey
      WHERE p_type = 'PROMO' AND r_name = 'ASIA'
        AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
        AND o_orderdate < TIMESTAMP '1998-01-01 00:00:00')
    SELECT o_year,
           round(CAST(sum(CASE WHEN supp_nation = 'NATION_2'
                               THEN cents ELSE 0 END) AS BIGINT)
                 / CAST(sum(cents) AS BIGINT), 6) AS mkt_share
    FROM vol GROUP BY o_year
    """,
)
def q_q8(spark, sf_dir):
    """TPC-H Q8 shape (national market share), adapted to the testdata
    schema (no partsupp; p_type/r_name stand in for the spec's
    literals): what fraction of ASIA customers' PROMO-part purchase
    volume was supplied by NATION_2, per year. Physical shape: the
    selective p_type filter broadcasts a PRUNED part build side into
    the lineitem scan; orders↔lineitem is the one fact-fact shuffle;
    customer→nation→region and supplier→nation decode via broadcast, so
    region/nation predicates never cost an exchange. Volume sums
    integer cents (order-independent — exact under any partitioning);
    the share divides two exact integers, so the rounded double is
    deterministic at any parallelism."""
    li = _t(spark, sf_dir, "lineitem")
    part = _t(spark, sf_dir, "part").where(F.col("p_type") == "PROMO")
    orders = _t(spark, sf_dir, "orders").where(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1998-01-01").cast("timestamp"))
    )
    cust = _t(spark, sf_dir, "customer")
    sup = _t(spark, sf_dir, "supplier")
    nation = _t(spark, sf_dir, "nation")
    region = _t(spark, sf_dir, "region").where(F.col("r_name") == "ASIA")
    cn = nation.join(
        F.broadcast(region), nation.n_regionkey == region.r_regionkey
    ).select(F.col("n_nationkey").alias("cn_key"))
    sn = nation.select(
        F.col("n_nationkey").alias("sn_key"), F.col("n_name").alias("supp_nation")
    )
    cents = F.round(F.col("l_extendedprice") * (1 - F.col("l_discount")) * 100).cast(
        "bigint"
    )
    vol = (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(cn), cust.c_nationkey == F.col("cn_key"))
        .join(F.broadcast(sup), li.l_suppkey == sup.s_suppkey)
        .join(F.broadcast(sn), sup.s_nationkey == F.col("sn_key"))
        .select(
            F.year("o_orderdate").alias("o_year"),
            cents.alias("cents"),
            "supp_nation",
        )
    )
    return vol.groupBy("o_year").agg(
        F.round(
            F.sum(
                F.when(F.col("supp_nation") == "NATION_2", F.col("cents")).otherwise(
                    F.lit(0)
                )
            )
            / F.sum("cents"),
            6,
        ).alias("mkt_share")
    )


@query(
    "q10_returned_items",
    """
    SELECT c_custkey, c_name,
           round(sum(CAST(round(l_extendedprice * (1 - l_discount) * 100) AS BIGINT))
                 / 100.0, 2) AS revenue,
           round(c_acctbal, 2) AS acctbal, n_name
    FROM customer
    JOIN orders ON c_custkey = o_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    JOIN nation ON c_nationkey = n_nationkey
    WHERE o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND o_orderdate < TIMESTAMP '1996-04-01 00:00:00'
      AND l_returnflag = 'R'
    GROUP BY c_custkey, c_name, round(c_acctbal, 2), n_name
    ORDER BY revenue DESC, c_custkey
    LIMIT 20
    """,
)
def q_q10(spark, sf_dir):
    """TPC-H Q10 shape (returned-item reporting): selective fact
    filters (quarter of orders, returnflag = 'R') push to both scans
    BEFORE the join, nation broadcasts, and the top-20 runs as
    TakeOrderedAndProject (per-partition heap + driver merge, never a
    global sort) — the at-scale top-k shape. Revenue sums integer
    cents (per-row round BEFORE the aggregate) so the total is
    addition-order-independent: a plain double sum here landed on a
    .xx5 rounding tie between engines at sf0.01."""
    cust = _t(spark, sf_dir, "customer")
    orders = _t(spark, sf_dir, "orders").where(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1996-04-01").cast("timestamp"))
    )
    li = _t(spark, sf_dir, "lineitem").where(F.col("l_returnflag") == "R")
    nation = _t(spark, sf_dir, "nation")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
        .groupBy(
            "c_custkey",
            "c_name",
            F.round("c_acctbal", 2).alias("acctbal"),
            "n_name",
        )
        .agg(
            F.round(
                F.sum(
                    F.round(
                        F.col("l_extendedprice") * (1 - F.col("l_discount")) * 100
                    ).cast("long")
                )
                / 100.0,
                2,
            ).alias("revenue")
        )
        .select("c_custkey", "c_name", "revenue", "acctbal", "n_name")
        .orderBy(F.col("revenue").desc(), F.col("c_custkey"))
        .limit(20)
    )


@query(
    "q14_promo_effect",
    """
    SELECT round(100.0 * sum(CASE WHEN p_type = 'PROMO'
                                  THEN l_extendedprice * (1 - l_discount)
                                  ELSE 0 END)
                 / sum(l_extendedprice * (1 - l_discount)), 4) AS promo_pct,
           count(*) AS n
    FROM lineitem JOIN part ON l_partkey = p_partkey
    WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
      AND l_shipdate < TIMESTAMP '1997-02-01 00:00:00'
    """,
)
def q_q14(spark, sf_dir):
    """TPC-H Q14 shape (promotion effect): conditional aggregation —
    one filtered fact scan broadcast-joined to part, CASE inside both
    sums so the ratio needs exactly one pass; no groupBy shuffle at
    all (global partial agg → 1-row merge)."""
    li = _t(spark, sf_dir, "lineitem").where(
        (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-02-01").cast("timestamp"))
    )
    part = _t(spark, sf_dir, "part")
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .agg(
            F.round(
                100.0
                * F.sum(F.when(F.col("p_type") == "PROMO", rev).otherwise(0.0))
                / F.sum(rev),
                4,
            ).alias("promo_pct"),
            F.count("*").alias("n"),
        )
    )


@query(
    "q18_large_volume_customers",
    """
    SELECT c_custkey, o_orderkey,
           strftime(o_orderdate, '%Y-%m-%d') AS orderdate,
           round(o_totalprice, 2) AS totalprice,
           round(sum(l_quantity), 2) AS total_qty
    FROM customer
    JOIN orders ON c_custkey = o_custkey
    JOIN lineitem ON o_orderkey = l_orderkey
    WHERE o_orderkey IN (
      SELECT l_orderkey FROM lineitem GROUP BY l_orderkey
      HAVING sum(l_quantity) > 150)
    GROUP BY c_custkey, o_orderkey, strftime(o_orderdate, '%Y-%m-%d'),
             round(o_totalprice, 2)
    ORDER BY totalprice DESC, o_orderkey
    LIMIT 20
    """,
)
def q_q18(spark, sf_dir):
    """TPC-H Q18 shape (large-volume customers): HAVING-derived key set
    semi-joined back into the fact chain. The aggregate that computes
    the >150 keys reuses the same lineitem scan; Spark plans the IN as
    a LeftSemi join on l_orderkey — at scale the qualifying-key side is
    tiny (orders with >150 units), so AQE converts it to broadcast."""
    cust = _t(spark, sf_dir, "customer")
    orders = _t(spark, sf_dir, "orders")
    li = _t(spark, sf_dir, "lineitem")
    big = (
        li.groupBy("l_orderkey")
        .agg(F.sum("l_quantity").alias("__qty"))
        .where(F.col("__qty") > 150)
        .select("l_orderkey")
    )
    return (
        li.join(big.withColumnRenamed("l_orderkey", "__bk"),
                F.col("l_orderkey") == F.col("__bk"), "left_semi")
        .join(orders, F.col("l_orderkey") == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .groupBy(
            "c_custkey",
            "o_orderkey",
            F.date_format("o_orderdate", "yyyy-MM-dd").alias("orderdate"),
            F.round("o_totalprice", 2).alias("totalprice"),
        )
        .agg(F.round(F.sum("l_quantity"), 2).alias("total_qty"))
        .select("c_custkey", "o_orderkey", "orderdate", "totalprice", "total_qty")
        .orderBy(F.col("totalprice").desc(), F.col("o_orderkey"))
        .limit(20)
    )


@query(
    "q19_disjunctive_predicates",
    """
    SELECT round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue,
           count(*) AS n
    FROM lineitem JOIN part ON p_partkey = l_partkey
    WHERE (p_brand = 'Brand#1' AND p_size BETWEEN 1 AND 15
           AND l_quantity >= 1 AND l_quantity <= 11)
       OR (p_brand = 'Brand#2' AND p_size BETWEEN 1 AND 25
           AND l_quantity >= 10 AND l_quantity <= 20)
       OR (p_brand = 'Brand#3' AND p_size BETWEEN 1 AND 35
           AND l_quantity >= 20 AND l_quantity <= 30)
    """,
)
def q_q19(spark, sf_dir):
    """TPC-H Q19 shape (disjunctive mixed-table predicates): the OR
    spans both tables, so no single branch can be pushed whole —
    Catalyst instead derives the DOMAIN disjunctions per side
    (p_brand IN (..) / p_size <= 35 on part; l_quantity 1..30 on
    lineitem) and pushes those below the join, leaving the full
    disjunction as the post-join filter. Part broadcasts."""
    li = _t(spark, sf_dir, "lineitem")
    part = _t(spark, sf_dir, "part")
    j = li.join(F.broadcast(part), part.p_partkey == li.l_partkey)
    q = F.col("l_quantity")
    cond = (
        ((F.col("p_brand") == "Brand#1") & F.col("p_size").between(1, 15)
         & (q >= 1) & (q <= 11))
        | ((F.col("p_brand") == "Brand#2") & F.col("p_size").between(1, 25)
           & (q >= 10) & (q <= 20))
        | ((F.col("p_brand") == "Brand#3") & F.col("p_size").between(1, 35)
           & (q >= 20) & (q <= 30))
    )
    return j.where(cond).agg(
        F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias(
            "revenue"
        ),
        F.count("*").alias("n"),
    )


@query(
    "q4_priority_check",
    """
    SELECT o_orderpriority, count(*) AS order_count
    FROM orders
    WHERE o_orderdate >= TIMESTAMP '1996-07-01 00:00:00'
      AND o_orderdate < TIMESTAMP '1996-10-01 00:00:00'
      AND EXISTS (SELECT 1 FROM lineitem
                  WHERE l_orderkey = o_orderkey AND l_returnflag = 'R')
    GROUP BY o_orderpriority
    ORDER BY o_orderpriority
    """,
)
def q_q4(spark, sf_dir):
    """TPC-H Q4 shape (order priority checking): EXISTS against the fact
    table planned as a LeftSemi join — lineitem is filtered (returnflag)
    and projected to its join key BEFORE the semi-join, so the probe side
    carries one bigint column; the date window pushes to the orders scan.
    Distinct from q18: here the semi-join input is a filtered raw scan,
    not a HAVING-derived aggregate."""
    orders = _t(spark, sf_dir, "orders").where(
        (F.col("o_orderdate") >= F.lit("1996-07-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1996-10-01").cast("timestamp"))
    )
    li = _t(spark, sf_dir, "lineitem").where(F.col("l_returnflag") == "R").select(
        "l_orderkey"
    )
    return (
        orders.join(li, orders.o_orderkey == li.l_orderkey, "left_semi")
        .groupBy("o_orderpriority")
        .agg(F.count("*").alias("order_count"))
        .orderBy("o_orderpriority")
    )


@query(
    "q13_order_count_distribution",
    """
    SELECT c_count, count(*) AS custdist
    FROM (SELECT c_custkey, count(o_orderkey) AS c_count
          FROM customer LEFT OUTER JOIN orders
            ON c_custkey = o_custkey AND o_orderpriority <> '1-URGENT'
          GROUP BY c_custkey)
    GROUP BY c_count
    ORDER BY custdist DESC, c_count DESC
    """,
)
def q_q13(spark, sf_dir):
    """TPC-H Q13 shape (customer order-count distribution): the filter
    lives in the JOIN CONDITION of a left outer join — customers with
    only urgent orders must still appear with c_count = 0, so the
    predicate cannot move to a WHERE (that would turn the outer join
    inner). count(o_orderkey) (not count(*)) makes the unmatched rows
    count 0. Two stacked aggregations: per-customer, then the
    distribution over counts (second groupBy input is customer-sized,
    trivially small relative to the fact)."""
    cust = _t(spark, sf_dir, "customer").select("c_custkey")
    orders = _t(spark, sf_dir, "orders").select("o_custkey", "o_orderkey",
                                                "o_orderpriority")
    per_cust = (
        cust.join(
            orders,
            (cust.c_custkey == orders.o_custkey)
            & (orders.o_orderpriority != "1-URGENT"),
            "left",
        )
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return (
        per_cust.groupBy("c_count")
        .agg(F.count("*").alias("custdist"))
        .orderBy(F.col("custdist").desc(), F.col("c_count").desc())
    )


@query(
    "q15_top_supplier",
    """
    WITH rev AS (
      SELECT l_suppkey,
             sum(CAST(round(l_extendedprice * (1 - l_discount) * 100) AS BIGINT))
               AS rev_c
      FROM lineitem
      WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
        AND l_shipdate < TIMESTAMP '1996-04-01 00:00:00'
      GROUP BY l_suppkey)
    SELECT s_suppkey, s_name, round(rev_c / 100.0, 2) AS total_revenue
    FROM supplier JOIN rev ON s_suppkey = l_suppkey
    WHERE rev_c = (SELECT max(rev_c) FROM rev)
    ORDER BY s_suppkey
    """,
)
def q_q15(spark, sf_dir):
    """TPC-H Q15 shape (top supplier): the revenue "view" is computed
    once, and the max is a 1-row aggregate over it broadcast back as the
    selection predicate — argmax-by-join, never a global sort. Revenue
    accumulates in integer cents (per-row round before the sum) so the
    max comparison is exact in both engines; a double-sum tie here is
    the classic cross-engine flake."""
    li = _t(spark, sf_dir, "lineitem").where(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1996-04-01").cast("timestamp"))
    )
    rev = li.groupBy("l_suppkey").agg(
        F.sum(
            F.round(F.col("l_extendedprice") * (1 - F.col("l_discount")) * 100)
            .cast("long")
        ).alias("rev_c")
    )
    mx = rev.agg(F.max("rev_c").alias("__mx"))
    sup = _t(spark, sf_dir, "supplier")
    return (
        rev.join(F.broadcast(mx), F.col("rev_c") == F.col("__mx"))
        .join(sup, F.col("l_suppkey") == sup.s_suppkey)
        .select(
            "s_suppkey",
            "s_name",
            F.round(F.col("rev_c") / 100.0, 2).alias("total_revenue"),
        )
        .orderBy("s_suppkey")
    )


@query(
    "q17_small_quantity_revenue",
    """
    WITH pavg AS (
      SELECT l_partkey,
             sum(CAST(l_quantity AS BIGINT)) AS sum_qty,
             count(*) AS cnt
      FROM lineitem GROUP BY l_partkey)
    SELECT round(sum(CAST(round(l_extendedprice * 100) AS BIGINT)) / 700.0, 2)
             AS avg_yearly,
           count(*) AS n
    FROM lineitem
    JOIN part ON p_partkey = l_partkey
    JOIN pavg USING (l_partkey)
    WHERE p_brand = 'Brand#1'
      AND CAST(l_quantity AS BIGINT) * 5 * cnt < sum_qty
    """,
)
def q_q17(spark, sf_dir):
    """TPC-H Q17 shape (small-quantity-order revenue): correlated scalar
    subquery avg(l_quantity) per part, decorrelated as
    aggregate-then-rejoin on the fact's own key. The threshold
    l_quantity < 0.2 * avg is evaluated as the INTEGER cross-multiply
    qty * 5 * cnt < sum_qty (quantities are integral in this corpus), so
    the boundary can't flip on a last-ulp division difference between
    engines. Revenue accumulates in integer cents (per-row round before
    the sum, the q15/q22/q1 convention) so the order-dependent double
    sum can't disagree at a half-cent rounding boundary either. Part is
    a broadcast filter; the per-part aggregate shuffles on the same key
    the rejoin uses, so AQE plans one exchange."""
    li = _t(spark, sf_dir, "lineitem")
    part = _t(spark, sf_dir, "part").where(F.col("p_brand") == "Brand#1").select(
        "p_partkey"
    )
    pavg = li.groupBy("l_partkey").agg(
        F.sum(F.col("l_quantity").cast("long")).alias("sum_qty"),
        F.count("*").alias("cnt"),
    ).withColumnRenamed("l_partkey", "__pk")
    return (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .join(pavg, F.col("l_partkey") == F.col("__pk"))
        .where(F.col("l_quantity").cast("long") * 5 * F.col("cnt") < F.col("sum_qty"))
        .agg(
            F.round(
                F.sum(F.round(F.col("l_extendedprice") * 100).cast("long")) / 700.0,
                2,
            ).alias("avg_yearly"),
            F.count("*").alias("n"),
        )
    )


@query(
    "q21_waiting_supplier",
    """
    SELECT s_name, count(*) AS numwait
    FROM supplier
    JOIN lineitem l1 ON s_suppkey = l1.l_suppkey
    WHERE l1.l_returnflag = 'R'
      AND EXISTS (SELECT 1 FROM lineitem l2
                  WHERE l2.l_orderkey = l1.l_orderkey
                    AND l2.l_suppkey <> l1.l_suppkey)
      AND NOT EXISTS (SELECT 1 FROM lineitem l3
                      WHERE l3.l_orderkey = l1.l_orderkey
                        AND l3.l_suppkey <> l1.l_suppkey
                        AND l3.l_returnflag = 'R')
    GROUP BY s_name
    ORDER BY numwait DESC, s_name
    LIMIT 20
    """,
)
def q_q21(spark, sf_dir):
    """TPC-H Q21 shape (suppliers who kept orders waiting): EXISTS and
    NOT EXISTS against the SAME fact table — a LeftSemi and a LeftAnti
    self-join, both equi on l_orderkey with the inequality
    (l2.l_suppkey <> l1.l_suppkey) as the residual join condition. The
    probe sides project to (orderkey, suppkey) before joining; the anti
    side additionally pre-filters to returnflag 'R'. Sized for scale:
    three shuffles on the same key, no aggregation-derived key sets."""
    sup = _t(spark, sf_dir, "supplier")
    li = _t(spark, sf_dir, "lineitem").select("l_orderkey", "l_suppkey",
                                              "l_returnflag")
    l1 = li.where(F.col("l_returnflag") == "R")
    l2 = li.select(F.col("l_orderkey").alias("l2_ok"),
                   F.col("l_suppkey").alias("l2_sk"))
    l3 = li.where(F.col("l_returnflag") == "R").select(
        F.col("l_orderkey").alias("l3_ok"), F.col("l_suppkey").alias("l3_sk")
    )
    waiting = (
        l1.join(
            l2,
            (F.col("l_orderkey") == F.col("l2_ok"))
            & (F.col("l_suppkey") != F.col("l2_sk")),
            "left_semi",
        )
        .join(
            l3,
            (F.col("l_orderkey") == F.col("l3_ok"))
            & (F.col("l_suppkey") != F.col("l3_sk")),
            "left_anti",
        )
    )
    return (
        waiting.join(F.broadcast(sup), F.col("l_suppkey") == sup.s_suppkey)
        .groupBy("s_name")
        .agg(F.count("*").alias("numwait"))
        .orderBy(F.col("numwait").desc(), F.col("s_name"))
        .limit(20)
    )


@query(
    "q22_sales_opportunity",
    """
    WITH bal AS (
      SELECT sum(CAST(round(c_acctbal * 100) AS BIGINT)) AS sum_c,
             count(*) AS cnt
      FROM customer WHERE c_acctbal > 0.0)
    SELECT c_nationkey AS cntry, count(*) AS numcust,
           round(sum(CAST(round(c_acctbal * 100) AS BIGINT)) / 100.0, 2)
             AS totacctbal
    FROM customer, bal
    WHERE CAST(round(c_acctbal * 100) AS BIGINT) * cnt > sum_c
      AND NOT EXISTS (SELECT 1 FROM orders
                      WHERE o_custkey = c_custkey
                        AND o_orderpriority = '1-URGENT')
    GROUP BY c_nationkey
    ORDER BY c_nationkey
    """,
)
def q_q22(spark, sf_dir):
    """TPC-H Q22 shape (global sales opportunity): a scalar aggregate
    subquery (average positive balance) gates the outer scan, plus a
    NOT EXISTS anti-join against a filtered orders projection (this
    corpus has no order-less customers, so the lapse criterion is "no
    urgent order" to keep the artifact non-trivial — 75 customers over
    23 nations at sf0.01). The average test is the integer
    cross-multiply cents * cnt > sum_cents — exact in both engines, no
    division. The 1-row aggregate broadcasts; the anti-join is the only
    shuffle."""
    cust = _t(spark, sf_dir, "customer")
    bal = cust.where(F.col("c_acctbal") > 0.0).agg(
        F.sum(F.round(F.col("c_acctbal") * 100).cast("long")).alias("sum_c"),
        F.count("*").alias("cnt"),
    )
    orders = (
        _t(spark, sf_dir, "orders")
        .where(F.col("o_orderpriority") == "1-URGENT")
        .select("o_custkey")
    )
    return (
        cust.join(F.broadcast(bal))
        .where(
            F.round(F.col("c_acctbal") * 100).cast("long") * F.col("cnt")
            > F.col("sum_c")
        )
        .join(orders, cust.c_custkey == orders.o_custkey, "left_anti")
        .groupBy(F.col("c_nationkey").alias("cntry"))
        .agg(
            F.count("*").alias("numcust"),
            F.round(
                F.sum(F.round(F.col("c_acctbal") * 100).cast("long")) / 100.0, 2
            ).alias("totacctbal"),
        )
        .orderBy("cntry")
    )


# ===========================================================================
# Sketches (operators/sketch.py): count-min + bloom runtime join filter
# ===========================================================================

_CMS_W, _CMS_D, _CMS_T = 2048, 3, 45
_CMS_BUCKET = (
    "(('0x' || substr(md5({seed}::VARCHAR || ':' || {key}::VARCHAR), 1, 8))"
    f"::BIGINT % {_CMS_W})"
)


@query(
    "cms_heavy_hitters",
    f"""
    WITH seeds AS (SELECT unnest([0, 1, 2]) AS seed),
    cells AS (
      SELECT seed, {_CMS_BUCKET.format(seed='seed', key='l_partkey')} AS bucket,
             count(*) AS cnt
      FROM lineitem, seeds GROUP BY 1, 2),
    exact AS (
      SELECT l_partkey, count(*) AS n FROM lineitem
      GROUP BY l_partkey HAVING count(*) >= {_CMS_T}),
    est AS (
      SELECT e.l_partkey, min(c.cnt) AS estimate
      FROM (SELECT l_partkey, unnest([0, 1, 2]) AS seed FROM exact) e
      JOIN cells c
        ON c.seed = e.seed
       AND c.bucket = {_CMS_BUCKET.format(seed='e.seed', key='e.l_partkey')}
      GROUP BY e.l_partkey)
    SELECT exact.l_partkey, estimate, n
    FROM exact JOIN est ON exact.l_partkey = est.l_partkey
    """,
)
def q_cms_heavy_hitters(spark, sf_dir):
    """Count-min-sketch heavy hitters over lineitem part keys (count ≥
    45): the sketch is width×depth = 2048×3 cells regardless of input
    size, candidates come from qualifying seed-0 buckets (one-sided —
    no heavy hitter can be lost), and the key dictionary is never
    collected. estimate ≥ n for every row by construction; with 2000
    keys in 2048 buckets the collisions that make estimate > n are
    real and engine-exact (md5 bucketing, integer counts)."""
    from parkour_spark.operators.sketch import cms_heavy_hitters

    li = _t(spark, sf_dir, "lineitem")
    return cms_heavy_hitters(li, "l_partkey", width=_CMS_W, depth=_CMS_D,
                             threshold=_CMS_T)


_BLOOM_M, _BLOOM_K = 4096, 3
_BLOOM_POS = (
    "(('0x' || substr(md5({seed}::VARCHAR || ':' || {key}::VARCHAR), 1, 8))"
    f"::BIGINT % {_BLOOM_M})"
)


@query(
    "bloom_filtered_join_agg",
    f"""
    WITH dim AS (SELECT p_partkey FROM part WHERE p_brand = 'Brand#1'),
    seeds AS (SELECT unnest([0, 1, 2]) AS seed),
    bits AS (
      SELECT DISTINCT seed, {_BLOOM_POS.format(seed='seed', key='p_partkey')} AS pos
      FROM dim, seeds),
    cand AS (
      SELECT * FROM lineitem l
      WHERE EXISTS (SELECT 1 FROM bits b WHERE b.seed = 0
                    AND b.pos = {_BLOOM_POS.format(seed='0', key='l.l_partkey')})
        AND EXISTS (SELECT 1 FROM bits b WHERE b.seed = 1
                    AND b.pos = {_BLOOM_POS.format(seed='1', key='l.l_partkey')})
        AND EXISTS (SELECT 1 FROM bits b WHERE b.seed = 2
                    AND b.pos = {_BLOOM_POS.format(seed='2', key='l.l_partkey')})),
    joined AS (
      SELECT l_extendedprice, l_discount FROM cand
      JOIN dim ON cand.l_partkey = dim.p_partkey)
    SELECT (SELECT count(*) FROM cand) AS n_candidates,
           count(*) AS n_joined,
           round(sum(CAST(round(l_extendedprice * (1 - l_discount) * 100)
                          AS BIGINT)) / 100.0, 2) AS revenue
    FROM joined
    """,
)
def q_bloom_filtered_join(spark, sf_dir):
    """Bloom-prefiltered big-big join: the dim (Brand#1 parts) is
    MODELED as non-broadcastable (final join hinted merge), but its
    bloom bit table (≤ 213 of 4096 positions) broadcasts fine — the
    fact side sheds ~93% of rows scan-side via 3 broadcast semi-joins
    BEFORE the shuffle, which is the whole 100 TB win. n_candidates
    (bloom survivors incl. false positives) is engine-exact because
    the bit positions are md5-derived; the merge join then removes the
    FPs, so revenue matches the plain join. Integer-cents revenue."""
    from parkour_spark.operators.sketch import bloom_bits, bloom_prefilter

    li = _t(spark, sf_dir, "lineitem")
    dim = _t(spark, sf_dir, "part").where(F.col("p_brand") == "Brand#1").select(
        "p_partkey"
    )
    bits = bloom_bits(dim, "p_partkey", m=_BLOOM_M, k=_BLOOM_K)
    cand = bloom_prefilter(li, bits, "l_partkey", m=_BLOOM_M, k=_BLOOM_K).persist()
    joined = cand.join(dim.hint("merge"), cand.l_partkey == dim.p_partkey)
    n_cand = cand.select(F.count("*").alias("n_candidates"))
    return (
        joined.agg(
            F.count("*").alias("n_joined"),
            F.round(
                F.sum(
                    F.round(
                        F.col("l_extendedprice") * (1 - F.col("l_discount")) * 100
                    ).cast("long")
                )
                / 100.0,
                2,
            ).alias("revenue"),
        )
        .crossJoin(F.broadcast(n_cand))
        .select("n_candidates", "n_joined", "revenue")
    )


_HLL_P = 8
_HLL_M = 1 << _HLL_P
# Inlined with full double precision so neither engine re-derives it:
# alpha_m * m^2 for m=256 (Flajolet et al. 2007).
_HLL_ALPHA_MM = repr((0.7213 / (1 + 1.079 / _HLL_M)) * _HLL_M * _HLL_M)
_HLL_RHO = """
      CASE WHEN substr(w, lz + 1, 1) = '' THEN 65
           ELSE 4 * lz
                + CASE WHEN substr(w, lz + 1, 1) = '1' THEN 3
                       WHEN substr(w, lz + 1, 1) IN ('2', '3') THEN 2
                       WHEN substr(w, lz + 1, 1) IN ('4', '5', '6', '7') THEN 1
                       ELSE 0 END
                + 1
      END"""


@query(
    "hll_distinct_orders",
    f"""
    WITH h AS (
      SELECT ('0x' || substr(md5(l_orderkey::VARCHAR), 1, 8))::BIGINT % {_HLL_M}
               AS bucket,
             substr(md5(l_orderkey::VARCHAR), 9, 16) AS w
      FROM lineitem),
    lzs AS (
      SELECT bucket, w, length(regexp_extract(w, '^(0*)', 1)) AS lz FROM h),
    regs0 AS (
      SELECT bucket, max({_HLL_RHO}) AS rho FROM lzs GROUP BY bucket),
    regs AS (
      SELECT r.range AS bucket, coalesce(regs0.rho, 0) AS rho
      FROM range({_HLL_M}) r LEFT JOIN regs0 ON r.range = regs0.bucket),
    agg AS (
      SELECT sum(CAST(pow(2, 64 - rho) AS DECIMAL(38,0))) AS S,
             -- CAST: sum(int) is HUGEINT in DuckDB, which the driver's
             -- pandas fetch coerces to float64 ("256.0" != Spark's "256")
             CAST(sum(CASE WHEN rho = 0 THEN 1 ELSE 0 END) AS BIGINT)
               AS n_zero_buckets,
             md5(string_agg(rho::VARCHAR, ',' ORDER BY bucket)) AS registers_fp
      FROM regs),
    est AS (
      SELECT n_zero_buckets, registers_fp,
             round(CASE WHEN ({_HLL_ALPHA_MM} * pow(2, 64) / CAST(S AS DOUBLE))
                             <= 2.5 * {_HLL_M}
                         AND n_zero_buckets > 0
                        THEN {_HLL_M}.0 * ln({_HLL_M}.0 / n_zero_buckets)
                        ELSE {_HLL_ALPHA_MM} * pow(2, 64) / CAST(S AS DOUBLE)
                   END, 2) AS estimate
      FROM agg)
    SELECT {_HLL_M} AS m, n_zero_buckets, registers_fp, estimate,
           (SELECT count(DISTINCT l_orderkey) FROM lineitem) AS exact_distinct,
           abs(estimate - (SELECT count(DISTINCT l_orderkey) FROM lineitem))
             <= 0.195 * (SELECT count(DISTINCT l_orderkey) FROM lineitem)
             AS within_3sigma
    FROM est
    """,
)
def q_hll_distinct(spark, sf_dir):
    """Engine-exact HyperLogLog over lineitem order keys
    (operators.sketch.hll_registers/hll_estimate): m = 256 registers
    built by md5 string arithmetic — bit-for-bit reproducible in any
    engine, unlike builtin HLL sketches whose layouts are mutually
    opaque (Spark's approx_count_distinct vs DuckDB's approx sketch;
    the existing approx_user_counts entry can only pin a bounds flag).
    Registers ride partial aggregation (max is associative) and merge
    across corpora by element-wise max; the harmonic sum accumulates
    exactly in decimal(38,0) so the estimate is identical cross-engine.
    The artifact hash-compares the WHOLE sketch (registers_fp), the
    estimate, the exact count, and a 3-sigma bound flag."""
    from parkour_spark.operators.sketch import hll_estimate, hll_registers

    li = _t(spark, sf_dir, "lineitem")
    regs = hll_registers(li, "l_orderkey", p=_HLL_P)
    est = hll_estimate(regs, p=_HLL_P)
    exact = li.agg(
        F.countDistinct("l_orderkey").alias("exact_distinct")
    )
    return (
        est.crossJoin(F.broadcast(exact))
        .select(
            "m",
            "n_zero_buckets",
            "registers_fp",
            "estimate",
            "exact_distinct",
            (
                F.abs(F.col("estimate") - F.col("exact_distinct"))
                <= 0.195 * F.col("exact_distinct")
            ).alias("within_3sigma"),
        )
    )


@query(
    "incremental_hourly_rollup",
    """
    WITH m AS (
      SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H') AS hour,
             CAST(round(value * 1000000) AS BIGINT) AS vm
      FROM events)
    SELECT hour, count(*) AS n,
           round(sum(vm) / 1000000.0, 4) AS total,
           round(sum(vm) / count(*) / 1000000.0, 6) AS avg,
           round(min(vm) / 1000000.0, 4) AS vmin,
           round(max(vm) / 1000000.0, 4) AS vmax
    FROM m GROUP BY hour
    """,
)
def q_incremental_rollup(spark, sf_dir):
    """Incremental aggregate maintenance (operators.incremental): the
    hourly rollup is maintained as a STATE table of algebraic partial
    aggregates — history is sketched once, each new batch is sketched
    at O(batch) and merged at O(state rows), never rescanning history.
    The correctness claim IS the oracle comparison: state(days 1-26) ⊕
    state(days 27+) finalizes to exactly the full recompute (integer
    micro-unit measures make merged states bit-identical regardless of
    batch boundaries). Same partial-agg contract Spark applies within a
    job, lifted to storage."""
    from parkour_spark.operators.incremental import (
        agg_state,
        finalize,
        merge_states,
    )

    ev = _t(spark, sf_dir, "events")
    cutoff = F.lit("2024-01-27 00:00:00").cast("timestamp")
    hour = F.date_format(F.date_trunc("hour", "ts"), "yyyy-MM-dd HH").alias("hour")
    hist = agg_state(ev.where(F.col("ts") < cutoff).select(hour, "value"),
                     ["hour"], "value")
    batch = agg_state(ev.where(F.col("ts") >= cutoff).select(hour, "value"),
                      ["hour"], "value")
    return finalize(merge_states(hist, batch, ["hour"]))


@query(
    "format_roundtrip_orders",
    """
    SELECT o_orderpriority, count(*) AS n,
           round(sum(CAST(round(o_totalprice * 100) AS BIGINT)) / 100.0, 2)
             AS total
    FROM orders GROUP BY o_orderpriority
    """,
)
def q_format_roundtrip(spark, sf_dir):
    """Interchange-format parity INSIDE the correctness gate (the
    csv/json/orc roundtrips were previously test-only): orders is
    written out as headered CSV (text/dsink) and read back through the
    schema'd CSV reader (text/dseq + seqf surface, sources.readers.
    read_any) with the timestamp format pinned; the aggregate over the
    round-tripped rows must equal the oracle over the ORIGINAL parquet
    — any row loss, type drift, or formatting asymmetry in the
    format path breaks the hash. Integer-cents money so the proof is
    exact."""
    import tempfile

    from parkour_spark.sources.readers import read_any

    orders = _t(spark, sf_dir, "orders")
    tmp = tempfile.mkdtemp(prefix="parkour_fmt_rt_")
    (
        orders.write.mode("overwrite")
        .option("header", "true")
        .option("timestampFormat", "yyyy-MM-dd HH:mm:ss.SSSSSS")
        .csv(tmp)
    )
    back = read_any(
        spark,
        tmp,
        fmt="csv",
        header="true",
        timestampFormat="yyyy-MM-dd HH:mm:ss.SSSSSS",
        schema=orders.schema,
    )
    return back.groupBy("o_orderpriority").agg(
        F.count("*").alias("n"),
        F.round(
            F.sum(F.round(F.col("o_totalprice") * 100).cast("long")) / 100.0, 2
        ).alias("total"),
    )


def _roundtrip_agg(back):
    return back.groupBy("o_orderpriority").agg(
        F.count("*").alias("n"),
        F.round(
            F.sum(F.round(F.col("o_totalprice") * 100).cast("long")) / 100.0, 2
        ).alias("total"),
        F.countDistinct("o_orderdate").alias("n_dates"),
    )


_RT_ORACLE = """
    SELECT o_orderpriority, count(*) AS n,
           round(sum(CAST(round(o_totalprice * 100) AS BIGINT)) / 100.0, 2)
             AS total,
           count(DISTINCT o_orderdate) AS n_dates
    FROM orders GROUP BY o_orderpriority
    """


@query("orc_roundtrip_orders", _RT_ORACLE)
def q_orc_roundtrip(spark, sf_dir):
    """ORC interchange parity in the gate (read_any fmt=orc — the
    columnar exchange format the Hadoop ecosystem the reference lived
    in actually used): orders → ORC → read-back aggregate including a
    DISTINCT over the round-tripped timestamps must hash-match the
    oracle over the original parquet."""
    import tempfile

    from parkour_spark.sources.readers import read_any

    orders = _t(spark, sf_dir, "orders")
    tmp = tempfile.mkdtemp(prefix="parkour_orc_rt_")
    orders.write.mode("overwrite").format("orc").save(tmp)
    return _roundtrip_agg(read_any(spark, tmp, fmt="orc", schema=orders.schema))


@query("json_roundtrip_orders", _RT_ORACLE)
def q_json_roundtrip(spark, sf_dir):
    """JSON-lines interchange parity in the gate: orders → JSONL with a
    pinned timestamp format → schema'd read-back; the aggregate must
    hash-match the oracle over the original parquet — any row loss,
    type drift, or timestamp formatting asymmetry breaks the hash."""
    import tempfile

    from parkour_spark.sources.readers import read_any

    fmt = "yyyy-MM-dd HH:mm:ss.SSSSSS"
    orders = _t(spark, sf_dir, "orders")
    tmp = tempfile.mkdtemp(prefix="parkour_json_rt_")
    orders.write.mode("overwrite").option("timestampFormat", fmt).json(tmp)
    return _roundtrip_agg(
        read_any(
            spark, tmp, fmt="json", schema=orders.schema, timestampFormat=fmt
        )
    )


@query(
    "avro_roundtrip_orders",
    """
    SELECT o_orderpriority, count(*) AS n,
           round(sum(CAST(round(o_totalprice * 100) AS BIGINT)) / 100.0, 2)
             AS total,
           count(DISTINCT o_orderdate) AS n_dates
    FROM orders GROUP BY o_orderpriority
    """,
)
def q_avro_roundtrip(spark, sf_dir):
    """Avro dseq/dsink round-trip INSIDE the correctness gate — the
    r3/r4 "environment-forced" gap closed: sources/avrofmt.py is a
    pure-Python Avro 1.11 Object Container File reader/writer behind
    the PySpark DataSource API (spark-avro jar preferred when present,
    absent in this container). Orders write out as deflate-compressed
    OCF (one file per task) and read back through the header-derived
    schema; the aggregate — including a DISTINCT over the round-tripped
    timestamp-micros column — must hash-match the oracle over the
    ORIGINAL parquet. Spec compliance is pinned separately by
    hand-assembled byte goldens in tests/test_avro.py."""
    import tempfile

    from parkour_spark.sources.avrofmt import read_avro, write_avro

    orders = _t(spark, sf_dir, "orders")
    tmp = tempfile.mkdtemp(prefix="parkour_avro_rt_") + "/orders"
    write_avro(orders, tmp, codec="deflate")
    back = read_avro(spark, tmp)
    return back.groupBy("o_orderpriority").agg(
        F.count("*").alias("n"),
        F.round(
            F.sum(F.round(F.col("o_totalprice") * 100).cast("long")) / 100.0, 2
        ).alias("total"),
        F.countDistinct("o_orderdate").alias("n_dates"),
    )


@query(
    "seqf_roundtrip_orders",
    """
    SELECT o_orderpriority, count(*) AS n,
           sum(o_orderkey)::BIGINT AS key_sum,
           min(o_orderkey) AS key_min, max(o_orderkey) AS key_max
    FROM orders GROUP BY o_orderpriority
    """,
)
def q_seqf_roundtrip(spark, sf_dir):
    """SequenceFile dseq/dsink round-trip INSIDE the correctness gate —
    SURVEY §2.4's one remaining partial row closed (r11 verdict #7;
    reference io/seqf.clj:12-32). Orders' (o_orderkey LongWritable,
    o_orderpriority Text) pairs write through `write_seqf` (core
    Spark's own Hadoop binding — one sequence file per task) and read
    back through the PURE-PYTHON v6 reader (`parkour_seqf` DataSource,
    forced here so the gate exercises the spec implementation, not
    just the JVM echo); the aggregate over the round-tripped pairs
    must hash-match the oracle over the ORIGINAL parquet. Both
    directions of Hadoop↔Python byte compatibility are pinned
    separately in tests/test_seqfile.py."""
    import tempfile

    from parkour_spark.sources.seqfile import (
        register_seqf_source,
        write_seqf,
    )

    orders = _t(spark, sf_dir, "orders")
    tmp = tempfile.mkdtemp(prefix="parkour_seqf_rt_") + "/orders"
    write_seqf(
        orders.select("o_orderkey", "o_orderpriority"), tmp
    )
    register_seqf_source(spark)
    back = spark.read.format("parkour_seqf").option("path", tmp).load()
    return back.groupBy(
        F.col("value").alias("o_orderpriority")
    ).agg(
        F.count("*").alias("n"),
        F.sum("key").cast("long").alias("key_sum"),
        F.min("key").alias("key_min"),
        F.max("key").alias("key_max"),
    )


@query(
    "multimodal_resize",
    """
    SELECT doc_id AS media_id, 64 AS width, 64 AS height,
           sha256(text || ':64x64') || sha256(text || ':64x64') AS payload_hex
    FROM documents
    """,
)
def q_multimodal_resize(spark, sf_dir):
    """Image resize plumbing (operators.multimodal.resize_images): the
    Arrow-batched mapInPandas shape — schema, null passthrough, no blob
    shuffle — with the codec slot filled by the deterministic sha256
    stub (no image library in this container; production passes
    PIL/libvips). The stub makes it ORACLE-ABLE: the fake 64×64 output
    is the payload's dim-keyed sha256 digest tiled to 64 bytes, which
    DuckDB reproduces byte-for-byte (unhex of the doubled hex digest),
    so the whole transform is hash-verified, not rows-counted."""
    from parkour_spark.operators.multimodal import resize_images

    blobs = _t(spark, sf_dir, "documents").select(
        F.col("doc_id").alias("media_id"),
        F.encode("text", "UTF-8").alias("payload"),
    )
    return resize_images(blobs, 64, 64).select(
        "media_id", "width", "height",
        F.lower(F.hex("payload")).alias("payload_hex"),
    )


@query(
    "multimodal_frame_sample",
    """
    WITH v AS (
      SELECT doc_id AS media_id, text,
             (1 + doc_id % 5)::BIGINT AS n_frames
      FROM documents),
    f AS (
      SELECT media_id, text, unnest(range(0, n_frames)) AS frame_idx FROM v)
    SELECT media_id, frame_idx::INT AS frame_idx,
           (frame_idx * 1000)::BIGINT AS frame_ms,
           sha256(text || ':frame' || frame_idx::VARCHAR) AS frame_hex
    FROM f
    """,
)
def q_multimodal_frames(spark, sf_dir):
    """Video frame-sampling plumbing
    (operators.multimodal.sample_video_frames): the row-EXPANDING
    (UDTF-shaped) Pandas transform — one output row per sampled frame,
    emitted incrementally, frame count derived from typed metadata
    (duration_ms = 1s..5s by doc id here, every_ms = 1000). The codec
    slot is the deterministic sha256 stub (no video library; production
    passes ffmpeg/pyav), so the DuckDB oracle replays the expansion and
    every frame's bytes exactly."""
    from parkour_spark.operators.multimodal import sample_video_frames

    videos = _t(spark, sf_dir, "documents").select(
        F.col("doc_id").alias("media_id"),
        F.encode("text", "UTF-8").alias("payload"),
        F.create_map(
            F.lit("duration_ms"),
            (1000 + (F.col("doc_id") % 5) * 1000).cast("long"),
        ).alias("meta"),
    )
    return sample_video_frames(videos, every_ms=1000).select(
        "media_id", "frame_idx", "frame_ms",
        F.lower(F.hex("frame")).alias("frame_hex"),
    )


@query(
    "winsorized_price_stats",
    """
    WITH ranked AS (
      SELECT o_totalprice,
             row_number() OVER (ORDER BY o_totalprice, o_orderkey) AS rn,
             count(*) OVER () AS n
      FROM orders),
    b AS (
      SELECT max(CASE WHEN rn = CAST(ceil(0.05 * n) AS BIGINT)
                      THEN o_totalprice END) AS lo,
             max(CASE WHEN rn = CAST(ceil(0.95 * n) AS BIGINT)
                      THEN o_totalprice END) AS hi
      FROM ranked),
    clamped AS (
      SELECT least(greatest(o_totalprice, b.lo), b.hi) AS v,
             o_totalprice < b.lo AS cl, o_totalprice > b.hi AS ch
      FROM orders, b)
    SELECT count(*) AS n,
           -- CASTs: sum(int) is HUGEINT in DuckDB -> float64 under the
           -- driver's pandas fetch, mismatching Spark's int64 rendering
           CAST(sum(CASE WHEN cl THEN 1 ELSE 0 END) AS BIGINT)
             AS n_clamped_lo,
           CAST(sum(CASE WHEN ch THEN 1 ELSE 0 END) AS BIGINT)
             AS n_clamped_hi,
           round(sum(CAST(round(v * 100) AS BIGINT)) / 100.0, 2) AS total_clamped,
           (SELECT round(lo, 2) FROM b) AS lo,
           (SELECT round(hi, 2) FROM b) AS hi
    FROM clamped
    """,
)
def q_winsorized(spark, sf_dir):
    """Outlier-robust normalization (operators.validate.winsorize):
    bounds at exact rank-based p05/p95 (value at rank ⌈q·n⌉ — the
    cross-engine-exact quantile form), then a scan-side clamp with
    observable clamp rates. The bounds are a broadcast 1-row aggregate;
    the clamp never shuffles. Clamped totals accumulate in integer
    cents."""
    from parkour_spark.operators.validate import winsorize, winsorize_bounds

    orders = _t(spark, sf_dir, "orders")
    bounds = winsorize_bounds(orders, "o_totalprice", "o_orderkey", 0.05, 0.95)
    clamped = winsorize(orders, "o_totalprice", bounds, out_col="__v")
    lo_hi = bounds.select(
        F.round("lo", 2).alias("lo"), F.round("hi", 2).alias("hi")
    )
    return (
        clamped.agg(
            F.count("*").alias("n"),
            F.sum(F.when(F.col("__lo_clamped"), 1).otherwise(0)).alias(
                "n_clamped_lo"
            ),
            F.sum(F.when(F.col("__hi_clamped"), 1).otherwise(0)).alias(
                "n_clamped_hi"
            ),
            F.round(
                F.sum(F.round(F.col("__v") * 100).cast("long")) / 100.0, 2
            ).alias("total_clamped"),
        )
        .crossJoin(F.broadcast(lo_hi))
        .select("n", "n_clamped_lo", "n_clamped_hi", "total_clamped", "lo", "hi")
    )


@query(
    "gapfilled_hourly_events",
    """
    WITH ev AS (
      SELECT event_type,
             (floor(epoch_us(ts) / 3600000000) * 3600)::BIGINT AS bucket,
             CAST(round(value * 1000000) AS BIGINT) AS vm
      FROM events),
    agg AS (
      SELECT event_type, bucket, count(*) AS n,
             -- CAST: HUGEINT sum -> float64 under the driver's pandas fetch
             CAST(sum(vm) AS BIGINT) AS vsum_micro
      FROM ev GROUP BY 1, 2),
    spine AS (
      SELECT t.event_type,
             unnest(generate_series(b.lo, b.hi, 3600)) AS bucket
      FROM (SELECT DISTINCT event_type FROM ev) t,
           (SELECT min(bucket) AS lo, max(bucket) AS hi FROM agg) b)
    SELECT s.event_type, s.bucket,
           coalesce(a.n, 0) AS n, coalesce(a.vsum_micro, 0) AS vsum_micro
    FROM spine s LEFT JOIN agg a USING (event_type, bucket)
    """,
)
def q_gapfilled_hourly(spark, sf_dir):
    """Gap-filled hourly rollup (operators.intervals.fill_time_gaps):
    every (event_type, hour) in the global span appears, silent hours
    as explicit zeros — the dense spine downstream window math (moving
    averages, deltas) requires. The spine generates from a broadcast
    1-row (min, max) aggregate via sequence/explode — never a driver
    loop — and joins on the key the rollup already shuffles by.
    Integer-second buckets and micro-unit sums keep it engine-exact."""
    from parkour_spark.functions.timeops import epoch_micros
    from parkour_spark.operators.intervals import fill_time_gaps

    ev = _t(spark, sf_dir, "events")
    bucket = (F.floor(epoch_micros("ts") / 3_600_000_000) * 3600).cast("long")
    agg = ev.groupBy("event_type", bucket.alias("bucket")).agg(
        F.count("*").alias("n"),
        F.sum(F.round(F.col("value") * 1_000_000).cast("long")).alias("vsum_micro"),
    )
    return fill_time_gaps(
        agg, "bucket", ["event_type"], {"n": "zero", "vsum_micro": "zero"}, 3600
    )


@query(
    "corpus_snapshot_diff",
    """
    WITH hb AS (
      SELECT doc_id, text,
             ('0x' || substr(md5(doc_id::VARCHAR), 1, 8))::BIGINT % 100 AS b
      FROM documents),
    new AS (
      SELECT doc_id,
             CASE WHEN b BETWEEN 5 AND 9 THEN text || ' v2' ELSE text END AS text
      FROM hb WHERE b >= 5
      UNION ALL
      SELECT doc_id + 1000000 AS doc_id, text FROM hb WHERE b BETWEEN 10 AND 12),
    o AS (SELECT doc_id, md5(text) AS fo FROM documents),
    n AS (SELECT doc_id, md5(text) AS fn FROM new),
    j AS (SELECT coalesce(o.doc_id, n.doc_id) AS doc_id,
                 o.doc_id IS NULL AS absent_old, n.doc_id IS NULL AS absent_new,
                 fo, fn
          FROM o FULL OUTER JOIN n ON o.doc_id = n.doc_id)
    SELECT CASE WHEN absent_old THEN 'added'
                WHEN absent_new THEN 'removed'
                WHEN fo IS NOT DISTINCT FROM fn THEN 'unchanged'
                ELSE 'changed' END AS status,
           count(*) AS n
    FROM j GROUP BY 1
    """,
)
def q_corpus_snapshot_diff(spark, sf_dir):
    """Snapshot diff (operators.cdc.snapshot_diff): classify every doc
    across two corpus versions as added/removed/changed/unchanged by
    comparing md5 content fingerprints — the diff join carries two
    hashes per id, never two documents, which is what makes it viable
    at 100 TB. The synthetic v2 corpus drops a 5% hash slice, edits the
    next 5%, and adds 3% new ids (deterministic content-hash slices,
    mirrored in the oracle); the output feeds incremental pipelines
    (changed ∪ added → ngram_jaccard_delta, removed → index cleanup)."""
    from parkour_spark.functions.sampling import hash_bucket
    from parkour_spark.operators.cdc import snapshot_diff

    docs = _t(spark, sf_dir, "documents").select("doc_id", "text")
    hb = hash_bucket(F.col("doc_id"), 100)
    kept = docs.where(hb >= 5)
    edited = kept.select(
        "doc_id",
        F.when(hb.between(5, 9), F.concat(F.col("text"), F.lit(" v2")))
        .otherwise(F.col("text"))
        .alias("text"),
    )
    added = docs.where(hb.between(10, 12)).select(
        (F.col("doc_id") + 1000000).alias("doc_id"), "text"
    )
    new = edited.unionByName(added)
    return (
        snapshot_diff(docs, new, "doc_id", "text")
        .groupBy("status")
        .agg(F.count("*").alias("n"))
    )


_SEMDECON_REFS: dict[str, list] = _SfLRU()


def _semdecon_refs(spark, sf_dir):
    """Eval-set stand-in: perturbed copies (v + 0.15·rotate(v,1), the
    planted-near-dup construction) of every 20th corpus vector — 25
    refs at sf0.01. Driver-side fetch of the ref rows only (benchmark
    sets are small by construction, same adjudication as the IVF probe
    set); the perturbation is plain double arithmetic mirrored
    exactly by the oracle's list_transform."""
    if sf_dir not in _SEMDECON_REFS:
        emb = _t(spark, sf_dir, "embeddings")
        rows = (
            emb.where(F.col("vec_id") % 20 == 0)
            .select("vec_id", "embedding")
            .collect()
        )
        refs = []
        for r in rows:
            v = [float(x) for x in r["embedding"]]
            n = len(v)
            refs.append(
                (int(r["vec_id"]), [v[i] + 0.15 * v[(i + 1) % n] for i in range(n)])
            )
        _SEMDECON_REFS[sf_dir] = refs
    return _SEMDECON_REFS[sf_dir]


@query(
    "semantic_decontamination",
    f"""
    WITH emb AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
    refs AS (
      SELECT vec_id AS ref_id,
             list_transform(range(1, len(v) + 1),
                            i -> v[i] + 0.15 * v[(i % len(v)) + 1]) AS rv
      FROM emb WHERE vec_id % 20 = 0),
    ranked AS (
      SELECT e.vec_id, r.ref_id, {_cos_sql('e.v', 'r.rv')} AS c,
             row_number() OVER (PARTITION BY e.vec_id
               ORDER BY {_cos_sql('e.v', 'r.rv')} DESC, r.ref_id) AS rn
      FROM emb e CROSS JOIN refs r)
    SELECT vec_id, ref_id AS nearest_ref, round(c, 4) AS max_cos
    FROM ranked WHERE rn = 1 AND round(c, 4) >= 0.9
    """,
)
def q_semantic_decontamination(spark, sf_dir):
    """SEMANTIC benchmark decontamination (the embedding-space
    complement to decontaminate_ngram_overlap): flag training vectors
    whose cosine to ANY eval-set vector crosses the near-dup threshold.
    The eval set is small by construction (benchmarks are thousands of
    items), so it inlines as a plan literal and the whole comparison is
    one corpus scan — no join, no shuffle
    (similarity.max_cosine_vs_set); eval sets too large to inline go
    through the LSH bucket join instead. Eval refs here are planted
    perturbed copies (cos ≈ 0.989) of every 20th corpus vector, so
    exactly their sources must flag — recall 25/25 with zero false
    positives at sf0.01, pinned by the oracle replaying the identical
    construction."""
    emb = _t(spark, sf_dir, "embeddings")
    refs = _semdecon_refs(spark, sf_dir)
    flagged = SIM.max_cosine_vs_set(emb.select("vec_id", "embedding"), refs)
    return flagged.where(F.col("max_cos") >= 0.9).select(
        "vec_id", "nearest_ref", "max_cos"
    )


@query(
    "model_quality_scores",
    f"""
    WITH tok AS (
      SELECT doc_id, length(text) AS n_chars, {_TOKS_SQL} AS t FROM documents)
    SELECT doc_id,
           (-6000000 + 50000 * len(t) + 2000 * n_chars
            + 300 * (CASE WHEN len(t) > 0
                          THEN floor(10000.0 * len(list_distinct(t)) / len(t))
                          ELSE 10000 END))::BIGINT AS z_micro,
           (-6000000 + 50000 * len(t) + 2000 * n_chars
            + 300 * (CASE WHEN len(t) > 0
                          THEN floor(10000.0 * len(list_distinct(t)) / len(t))
                          ELSE 10000 END)) > 0 AS passes
    FROM tok
    """,
)
def q_model_quality(spark, sf_dir):
    """Model-based quality filtering plumbing
    (operators.corpus.linear_quality_scores): a fixed linear model over
    scan-side integer features — the deployment shape of a trained
    quality classifier, where only the weight constants change. Scores
    are the raw decision value z in integer micro-units (sigmoid is
    monotone, so z > 0 ⟺ p > 0.5 without evaluating exp, whose
    last-ulp behavior differs across libm implementations) — exact in
    any engine. 94 of 500 docs pass at sf0.01."""
    return C.linear_quality_scores(_t(spark, sf_dir, "documents"))


@query(
    "streaming_incremental_rollup",
    """
    WITH m AS (
      SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H') AS hour,
             CAST(round(value * 1000000) AS BIGINT) AS vm
      FROM events)
    SELECT hour, count(*) AS n,
           round(sum(vm) / 1000000.0, 4) AS total,
           round(sum(vm) / count(*) / 1000000.0, 6) AS avg,
           round(min(vm) / 1000000.0, 4) AS vmin,
           round(max(vm) / 1000000.0, 4) AS vmax
    FROM m GROUP BY hour
    """,
)
def q_streaming_incremental(spark, sf_dir):
    """Streaming form of incremental_hourly_rollup
    (streaming.windows.incremental_rollup_stream): the events replay
    arrives in micro-batches; foreachBatch sketches each batch into an
    algebraic partial state and merges it into a VERSIONED persisted
    snapshot — per-batch cost O(batch)+O(state rows), history never
    re-read, crash-resumable from the last snapshot. Over the finite
    replay the final snapshot finalizes to exactly the batch recompute
    (the oracle), whatever the batch boundaries were — the same
    boundary-independence the batch operator's tests pin."""
    import tempfile

    from parkour_spark.streaming.windows import (
        incremental_rollup_stream,
        read_stream,
    )

    ev = _t(spark, sf_dir, "events")
    src = tempfile.mkdtemp(prefix="parkour_incstream_src_")
    state = tempfile.mkdtemp(prefix="parkour_incstream_state_")
    ev.write.mode("overwrite").parquet(src)
    stream = read_stream(spark, src, ev.schema, max_files=4)
    hour = F.date_format(F.date_trunc("hour", "ts"), "yyyy-MM-dd HH").alias("hour")
    return incremental_rollup_stream(
        stream.select(hour, "value"), state, ["hour"], "value"
    )


@query(
    "key_skew_profile",
    """
    WITH counts AS (
      SELECT l_partkey AS key, count(*) AS cnt FROM lineitem GROUP BY 1),
    tot AS (
      -- CAST: sum(int) is HUGEINT in DuckDB -> float64 under the driver's
      -- pandas fetch; BIGINT keeps total_rows and the // results int64
      SELECT CAST(sum(cnt) AS BIGINT) AS total_rows, count(*) AS n_keys,
             max(cnt) AS max_cnt
      FROM counts)
    SELECT key, cnt,
           (cnt * 10000) // total_rows AS share_bp,
           n_keys, total_rows,
           (max_cnt * n_keys * 10000) // total_rows AS skew_ratio_bp
    FROM counts, tot
    ORDER BY cnt DESC, key
    LIMIT 5
    """,
)
def q_key_skew_profile(spark, sf_dir):
    """Key-skew pre-flight (operators.validate.skew_profile) over
    lineitem part keys: top-5 heaviest keys with exact counts and
    basis-point shares plus the max/mean skew ratio — the diagnostic a
    planner consults before choosing salting vs plain shuffle. One
    partial-agg'd count shuffle; totals broadcast; ratios in exact
    integer division."""
    from parkour_spark.operators.validate import skew_profile

    li = _t(spark, sf_dir, "lineitem")
    return skew_profile(li, "l_partkey", top_n=5)


# ===========================================================================
# Data layout (operators/layout.py): z-order clustering + file skipping
# ===========================================================================

# Written-layout cache: path of the z-ordered copy per corpus dir.
_ZORDER_LAYOUTS: dict[str, str] = _SfLRUDirs()


@query(
    "zorder_pruned_scan",
    """
    SELECT count(*) AS n,
           round(sum(l_quantity), 2) AS qty,
           round(sum(CAST(round(l_extendedprice * (1 - l_discount) * 100)
                          AS BIGINT)) / 100.0, 2) AS revenue
    FROM lineitem
    WHERE l_partkey BETWEEN 10 AND 30 AND l_suppkey BETWEEN 1 AND 3
    """,
)
def q_zorder_pruned_scan(spark, sf_dir):
    """Write lineitem z-ordered on (l_partkey, l_suppkey), read it back
    through a 2-d box predicate. The result is layout-INDEPENDENT (the
    oracle is the plain filter+agg over the original table); what the
    layout buys is file skipping, asserted quantitatively in
    tests/test_layout.py (footer-stats pruning: z-order bounds files
    hit on a single-dim box where a 1-d sort layout reads everything).
    Quantization bounds come from a broadcast 1-row aggregate — no
    driver collect, so the same code runs at any corpus size.

    The written layout is cached per corpus (same rationale as
    _IVF_CENTS / _PQ_CODEBOOKS): a layout is fixed at WRITE time and
    amortized over every later scan — production pays the one range
    shuffle once, then every query is the pruned read measured here.
    Re-writing per invocation would benchmark the amortized cost as if
    it recurred."""
    import tempfile

    from parkour_spark.operators.layout import write_zordered

    li = _t(spark, sf_dir, "lineitem")
    if sf_dir not in _ZORDER_LAYOUTS:
        b = li.agg(
            F.max("l_partkey").alias("__p_hi"), F.max("l_suppkey").alias("__s_hi")
        )
        cells = (
            li.crossJoin(F.broadcast(b))
            .withColumn(
                "__c1", F.floor(F.col("l_partkey") * 256 / (F.col("__p_hi") + 1))
            )
            .withColumn(
                "__c2", F.floor(F.col("l_suppkey") * 256 / (F.col("__s_hi") + 1))
            )
            .drop("__p_hi", "__s_hi")
        )
        tmp = tempfile.mkdtemp(prefix="parkour_zorder_")
        write_zordered(cells, tmp, "__c1", "__c2", bits=8, n_files=16)
        _ZORDER_LAYOUTS[sf_dir] = tmp
    back = spark.read.parquet(_ZORDER_LAYOUTS[sf_dir]).where(
        F.col("l_partkey").between(10, 30) & F.col("l_suppkey").between(1, 3)
    )
    return back.agg(
        F.count("*").alias("n"),
        F.round(F.sum("l_quantity"), 2).alias("qty"),
        F.round(
            F.sum(
                F.round(
                    F.col("l_extendedprice") * (1 - F.col("l_discount")) * 100
                ).cast("long")
            )
            / 100.0,
            2,
        ).alias("revenue"),
    )


# ===========================================================================
# BPE tokenizer training (operators/bpe.py)
# ===========================================================================


_BPE_PROLOGUE = """
    WITH words AS (
      SELECT word, count(*) AS wc FROM (
        SELECT unnest(string_split_regex(trim(text), '\\s+')) AS word
        FROM documents)
      WHERE word <> '' GROUP BY word),
    v0 AS (SELECT word, wc,
           regexp_replace(word, '(.)', '<\\1>', 'g') AS s FROM words),
"""


def _bpe_rounds_sql(n_merges: int) -> tuple[str, str]:
    """Unroll the BPE merge trajectory as CTE rounds. The sentinel
    string representation makes each merge a plain `replace`, whose
    left-to-right non-overlapping semantics are identical in Spark and
    DuckDB — so the WHOLE trajectory (not just the final table) is
    engine-exact. Returns (rounds_ctes, merge_table_select)."""
    parts, sels, prev = [], [], "v0"
    for i in range(1, n_merges + 1):
        parts.append(f"""
p{i} AS (
  SELECT syms[i] AS lhs, syms[i+1] AS rhs, CAST(sum(wc) AS BIGINT) AS c
  FROM (SELECT wc, string_split(trim(s, '<>'), '><') AS syms FROM {prev}),
       unnest(range(1, len(syms))) AS t(i)
  GROUP BY 1, 2),
b{i} AS (SELECT lhs, rhs, c FROM p{i} ORDER BY c DESC, lhs, rhs LIMIT 1),
v{i} AS (SELECT word, wc,
         replace(s, '<' || b.lhs || '><' || b.rhs || '>',
                 '<' || b.lhs || b.rhs || '>') AS s
         FROM {prev}, b{i} b)""")
        sels.append(f"SELECT {i} AS step, lhs, rhs, c AS pair_count FROM b{i}")
        prev = f"v{i}"
    return ",".join(parts), " UNION ALL ".join(sels)


def _bpe_oracle(n_merges: int) -> str:
    rounds, merge_table = _bpe_rounds_sql(n_merges)
    return _BPE_PROLOGUE + rounds + "\n    " + merge_table


_BPE_MERGES = 5


@query("bpe_train_merges", _bpe_oracle(_BPE_MERGES))
def q_bpe_train(spark, sf_dir):
    """Distributed BPE training over the corpus vocabulary: one corpus
    scan to (word, count), then 5 merge rounds on the vocab-sized table
    (pair-count shuffle + 1-row argmax + broadcast-scalar replace per
    round — the vocabulary itself is never collected). Greedy-replace
    merge semantics are engine-exact (see operators/bpe.py), so the
    oracle replays the full trajectory as unrolled CTEs."""
    from parkour_spark.operators.bpe import bpe_train

    docs = _t(spark, sf_dir, "documents")
    words = (
        docs.select(F.explode(F.split(F.trim("text"), r"\s+")).alias("word"))
        .where(F.col("word") != "")
        .groupBy("word")
        .agg(F.count("*").alias("wc"))
    )
    return bpe_train(words, n_merges=_BPE_MERGES)


@query(
    "bpe_vocab_segmentation",
    _BPE_PROLOGUE
    + _bpe_rounds_sql(_BPE_MERGES)[0]
    + f"""
    SELECT word, wc, s AS segmented,
           len(string_split(trim(s, '<>'), '><')) AS n_tokens
    FROM v{_BPE_MERGES}
    """,
)
def q_bpe_segment(spark, sf_dir):
    """The learned merges APPLIED back to the vocabulary: per-word
    segmentation string + token count after 5 merges — the encoder-side
    half of BPE (zero shuffles beyond training: replaces are
    scan-side). Shares the training trajectory with bpe_train_merges."""
    from parkour_spark.operators.bpe import bpe_segment, bpe_train, vocab_from_words

    docs = _t(spark, sf_dir, "documents")
    words = (
        docs.select(F.explode(F.split(F.trim("text"), r"\s+")).alias("word"))
        .where(F.col("word") != "")
        .groupBy("word")
        .agg(F.count("*").alias("wc"))
    )
    merges = [
        (r["lhs"], r["rhs"])
        for r in bpe_train(words, n_merges=_BPE_MERGES).collect()
    ]
    seg = bpe_segment(vocab_from_words(words), merges)
    return seg.select("word", "wc", F.col("s").alias("segmented"), "n_tokens")


# ===========================================================================
# Data-quality validation + profiling (operators/validate.py)
# ===========================================================================


@query(
    "validate_orders_constraints",
    """
    WITH base AS (SELECT count(*) AS n FROM orders)
    SELECT 'not_null(o_custkey)' AS constraint,
           (SELECT count(*) FROM orders WHERE o_custkey IS NULL) AS violations,
           n AS n_rows,
           CASE WHEN (SELECT count(*) FROM orders WHERE o_custkey IS NULL) = 0
                THEN 'pass' ELSE 'fail' END AS status FROM base
    UNION ALL
    SELECT 'in_range(o_totalprice,0.01,1000000)',
           (SELECT count(*) FROM orders
            WHERE o_totalprice IS NULL
               OR o_totalprice < 0.01 OR o_totalprice > 1000000),
           n,
           CASE WHEN (SELECT count(*) FROM orders
                      WHERE o_totalprice IS NULL
                         OR o_totalprice < 0.01 OR o_totalprice > 1000000) = 0
                THEN 'pass' ELSE 'fail' END FROM base
    UNION ALL
    SELECT 'in_set(o_orderstatus)',
           (SELECT count(*) FROM orders
            WHERE o_orderstatus IS NULL
               OR o_orderstatus NOT IN ('F', 'O', 'P')),
           n,
           CASE WHEN (SELECT count(*) FROM orders
                      WHERE o_orderstatus IS NULL
                         OR o_orderstatus NOT IN ('F', 'O', 'P')) = 0
                THEN 'pass' ELSE 'fail' END FROM base
    UNION ALL
    SELECT 'unique(o_orderkey)',
           (SELECT count(o_orderkey) - count(DISTINCT o_orderkey) FROM orders),
           n,
           CASE WHEN (SELECT count(o_orderkey) - count(DISTINCT o_orderkey)
                      FROM orders) = 0 THEN 'pass' ELSE 'fail' END FROM base
    UNION ALL
    SELECT 'ref_integrity(o_custkey->c_custkey)',
           (SELECT count(*) FROM orders o WHERE NOT EXISTS
             (SELECT 1 FROM customer c WHERE c.c_custkey = o.o_custkey)),
           n,
           CASE WHEN (SELECT count(*) FROM orders o WHERE NOT EXISTS
                       (SELECT 1 FROM customer c
                        WHERE c.c_custkey = o.o_custkey)) = 0
                THEN 'pass' ELSE 'fail' END FROM base
    UNION ALL
    SELECT 'shipdate_after_orderdate',
           (SELECT count(*) FROM lineitem l JOIN orders o
             ON l.l_orderkey = o.o_orderkey
            WHERE l.l_shipdate < o.o_orderdate),
           (SELECT count(*) FROM lineitem l JOIN orders o
             ON l.l_orderkey = o.o_orderkey),
           CASE WHEN (SELECT count(*) FROM lineitem l JOIN orders o
                       ON l.l_orderkey = o.o_orderkey
                      WHERE l.l_shipdate < o.o_orderdate) = 0
                THEN 'pass' ELSE 'fail' END
    """,
)
def q_validate_orders(spark, sf_dir):
    """Deequ-style constraint suite: every row-level check + uniqueness
    compiles into ONE aggregate pass over orders (asserted in
    tests/test_plans.py); referential integrity is a broadcast
    anti-join; the cross-table date invariant runs on the joined pair.
    The suite deliberately includes a FAILING constraint
    (shipdate_after_orderdate — ~half the synthetic rows violate it)
    so the artifact proves violations are counted, not just zeroed."""
    from parkour_spark.operators import validate as V

    orders = _t(spark, sf_dir, "orders")
    cust = _t(spark, sf_dir, "customer")
    li = _t(spark, sf_dir, "lineitem")
    suite = V.validate(
        orders,
        [
            V.not_null("o_custkey"),
            V.in_range("o_totalprice", 0.01, 1000000),
            V.in_set("o_orderstatus", ["F", "O", "P"]),
        ],
        unique_cols=["o_orderkey"],
    )
    fk = V.ref_integrity(orders, "o_custkey", cust, "c_custkey")
    pair = li.join(orders, li.l_orderkey == orders.o_orderkey)
    cross = V.validate(
        pair,
        [V.expression("shipdate_after_orderdate",
                      F.col("l_shipdate") < F.col("o_orderdate"))],
    )
    return suite.unionByName(fk).unionByName(cross)


@query(
    "profile_order_columns",
    """
    WITH base AS (SELECT count(*) AS n FROM orders)
    SELECT 'o_totalprice' AS "column", n AS n_rows,
           (SELECT count(*) FROM orders WHERE o_totalprice IS NULL) AS n_null,
           (SELECT count(DISTINCT o_totalprice) FROM orders) AS n_distinct,
           (SELECT round(min(o_totalprice), 4)::VARCHAR FROM orders) AS min_val,
           (SELECT round(max(o_totalprice), 4)::VARCHAR FROM orders) AS max_val
    FROM base
    UNION ALL
    SELECT 'o_custkey', n,
           (SELECT count(*) FROM orders WHERE o_custkey IS NULL),
           (SELECT count(DISTINCT o_custkey) FROM orders),
           (SELECT round(min(o_custkey)::DOUBLE, 4)::VARCHAR FROM orders),
           (SELECT round(max(o_custkey)::DOUBLE, 4)::VARCHAR FROM orders)
    FROM base
    UNION ALL
    SELECT 'o_orderpriority', n,
           (SELECT count(*) FROM orders WHERE o_orderpriority IS NULL),
           (SELECT count(DISTINCT o_orderpriority) FROM orders),
           (SELECT min(o_orderpriority) FROM orders),
           (SELECT max(o_orderpriority) FROM orders)
    FROM base
    UNION ALL
    SELECT 'o_orderstatus', n,
           (SELECT count(*) FROM orders WHERE o_orderstatus IS NULL),
           (SELECT count(DISTINCT o_orderstatus) FROM orders),
           (SELECT min(o_orderstatus) FROM orders),
           (SELECT max(o_orderstatus) FROM orders)
    FROM base
    """,
)
def q_profile_orders(spark, sf_dir):
    """Column profiling (discovery-side twin of the validation suite):
    nulls / distincts / min / max for 4 columns in ONE aggregate pass,
    emitted tall. Doubles round to 4 places before string formatting so
    the profile is engine-comparable."""
    from parkour_spark.operators.validate import profile_columns

    orders = _t(spark, sf_dir, "orders")
    return profile_columns(
        orders,
        numeric_cols=["o_totalprice", "o_custkey"],
        string_cols=["o_orderpriority", "o_orderstatus"],
    )


# ===========================================================================
# Triangle counting (operators/graph.py) over the near-dup graph
# ===========================================================================


def _neardup_pairs_ctes() -> str:
    """The dedup_minhash_lsh pair graph as a reusable CTE prefix
    (toks → sigs → bands → cand → pairs) — same construction as the
    pagerank oracle."""
    from parkour_spark.operators.dedup import MINHASH_P, minhash_params

    num_hashes, bands = 12, 4
    rpb = num_hashes // bands
    x = f"(('0x' || substr(md5(x), 1, 8))::BIGINT % {MINHASH_P})"
    sig_cols = ",\n       ".join(
        f"list_min(list_transform(t, x -> ({a} * {x} + {b}) % {MINHASH_P})) AS sig_{i}"
        for i, (a, b) in enumerate(minhash_params(num_hashes))
    )
    band_keys = ", ".join(
        "'" + str(b) + "|' || " + " || '|' || ".join(f"sig_{b * rpb + r}" for r in range(rpb))
        for b in range(bands)
    )
    return f"""
    toks AS (SELECT doc_id, {_SHINGLES_SQL} AS t FROM documents),
    sigs AS (SELECT doc_id, {sig_cols} FROM toks),
    bands AS (SELECT doc_id, unnest([{band_keys}]) AS band_key FROM sigs),
    cand AS (
      SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
      FROM bands a JOIN bands b USING (band_key)
      WHERE a.doc_id < b.doc_id),
    pairs AS (
      SELECT id_a, id_b FROM cand
      JOIN toks ta ON cand.id_a = ta.doc_id
      JOIN toks tb ON cand.id_b = tb.doc_id
      WHERE len(list_intersect(ta.t, tb.t))::DOUBLE
            / len(list_distinct(list_concat(ta.t, tb.t))) >= 0.8)"""


@query(
    "triangle_counts_dedup_graph",
    f"""
    WITH {_neardup_pairs_ctes()},
    e AS (SELECT DISTINCT least(id_a, id_b) AS a, greatest(id_a, id_b) AS b
          FROM pairs WHERE id_a <> id_b),
    deg AS (SELECT n, count(*) AS d FROM (
      SELECT a AS n FROM e UNION ALL SELECT b FROM e) GROUP BY n),
    ranked AS (
      SELECT CASE WHEN (da.d < db.d) OR (da.d = db.d AND e.a < e.b)
                  THEN e.a ELSE e.b END AS lo,
             CASE WHEN (da.d < db.d) OR (da.d = db.d AND e.a < e.b)
                  THEN e.b ELSE e.a END AS hi
      FROM e JOIN deg da ON e.a = da.n JOIN deg db ON e.b = db.n),
    wedges AS (
      SELECT w1.lo AS a, w1.hi AS b, w2.hi AS c
      FROM ranked w1 JOIN ranked w2 ON w1.lo = w2.lo
      WHERE w1.hi < w2.hi),
    tri AS (
      SELECT a, b, c FROM wedges
      WHERE EXISTS (SELECT 1 FROM ranked r
                    WHERE least(r.lo, r.hi) = wedges.b
                      AND greatest(r.lo, r.hi) = wedges.c))
    SELECT node, count(*) AS n_triangles FROM (
      SELECT unnest([a, b, c]) AS node FROM tri)
    GROUP BY node
    """,
)
def q_triangle_counts(spark, sf_dir):
    """Per-node triangle counts (operators.graph.triangle_count) over
    the MinHash near-dup graph: triangle density separates tight dup
    cliques from chains of borderline matches — a cluster-quality
    signal CC alone can't give. Degree-ordered edge orientation bounds
    wedge fan-out by ~sqrt(2m) so the self-join never goes quadratic
    on a hot node; each triangle is enumerated exactly once at its
    lowest-ranked corner."""
    from parkour_spark.operators.graph import triangle_count

    docs = _t(spark, sf_dir, "documents")
    pairs = D.minhash_dedup_pairs(docs, threshold=0.8)
    return triangle_count(pairs)


# ===========================================================================
# Interval algebra, k-core, sorted-neighborhood blocking, histogram
# ===========================================================================


@query(
    "merged_event_intervals",
    """
    WITH iv AS (
      -- floor, not ::BIGINT: DuckDB casts double->bigint by ROUNDING,
      -- Spark's unix_timestamp floors sub-second epochs
      SELECT user_id, CAST(floor(epoch(ts)) AS BIGINT) AS start_s,
             CAST(floor(epoch(ts)) AS BIGINT)
               + CAST(round(value * 60) AS BIGINT) AS end_s
      FROM events),
    flagged AS (
      SELECT user_id, start_s, end_s,
             CASE WHEN start_s > max(end_s) OVER (
               PARTITION BY user_id ORDER BY start_s, end_s
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
             THEN 1 ELSE 0 END AS new_run
      FROM iv),
    runs AS (
      SELECT user_id, start_s, end_s,
             sum(new_run) OVER (
               PARTITION BY user_id ORDER BY start_s, end_s
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS run
      FROM flagged),
    merged AS (
      SELECT user_id, min(start_s) AS start_s, max(end_s) AS end_s
      FROM runs GROUP BY user_id, run)
    SELECT user_id, count(*) AS n_runs,
           -- CAST: HUGEINT sum -> float64 under the driver's pandas fetch
           CAST(sum(end_s - start_s) AS BIGINT) AS covered_s,
           max(end_s - start_s) AS longest_s
    FROM merged GROUP BY user_id
    """,
)
def q_merged_intervals(spark, sf_dir):
    """Per-user interval coverage (operators.intervals): each event
    spans [ts, ts + value·60s]; overlapping spans coalesce via the
    two-window distributed sweep (new-run flag against the running max
    end, then run-id prefix sum) — one shuffle, every user's sweep
    independent. Integer-second endpoints keep both engines exact."""
    from parkour_spark.operators.intervals import coverage_stats, merge_intervals

    ev = _t(spark, sf_dir, "events")
    iv = ev.select(
        "user_id",
        F.unix_timestamp("ts").alias("start_s"),
        (F.unix_timestamp("ts") + F.round(F.col("value") * 60).cast("long")).alias(
            "end_s"
        ),
    )
    return coverage_stats(merge_intervals(iv))


_KCORE_K, _KCORE_ITERS = 2, 6


def _kcore_oracle() -> str:
    rounds = []
    prev = "e0"
    # MATERIALIZED is load-bearing: each round references the previous
    # one 3x; inlined CTEs would expand the pair graph 3^iters times
    # (observed as fd exhaustion re-opening the parquet per copy)
    for i in range(1, _KCORE_ITERS + 1):
        rounds.append(f"""
    d{i} AS MATERIALIZED (SELECT n, count(*) AS d FROM (
      SELECT a AS n FROM {prev} UNION ALL SELECT b FROM {prev}) GROUP BY n),
    e{i} AS MATERIALIZED (SELECT a, b FROM {prev}
             WHERE a IN (SELECT n FROM d{i} WHERE d >= {_KCORE_K})
               AND b IN (SELECT n FROM d{i} WHERE d >= {_KCORE_K}))""")
        prev = f"e{i}"
    return f"""
    WITH {_neardup_pairs_ctes()},
    e0 AS MATERIALIZED (
      SELECT DISTINCT least(id_a, id_b) AS a, greatest(id_a, id_b) AS b
      FROM pairs WHERE id_a <> id_b),
    {",".join(rounds)}
    SELECT node, count(*) AS degree FROM (
      SELECT a AS node FROM {prev} UNION ALL SELECT b FROM {prev})
    GROUP BY node HAVING count(*) >= {_KCORE_K}
    """


@query("kcore_dedup_graph", _kcore_oracle())
def q_kcore(spark, sf_dir):
    """k-core of the near-dup graph (k=2): the dense nucleus of each
    duplicate cluster after peeling chains and borderline tails —
    fixed-iteration peeling (degree agg + semi-join per round, the
    same primitives as CC), replayed exactly by unrolled oracle CTEs.
    A test asserts one more round is a no-op at this setting, so the
    fixed depth is converged, not truncated."""
    from parkour_spark.operators.graph import kcore

    docs = _t(spark, sf_dir, "documents")
    pairs = D.minhash_dedup_pairs(docs, threshold=0.8)
    return kcore(pairs, k=_KCORE_K, iters=_KCORE_ITERS)


def _lpa_oracle(rounds: int = 4) -> str:
    """Synchronous LPA unrolled: neighbor-label counts → (count DESC,
    label ASC) argmax per node → coalesce to previous label, per round.
    MATERIALIZED rounds for the same reason as the kcore oracle (each
    round is referenced twice by the next)."""
    parts = [
        """e AS MATERIALIZED (
      SELECT id_a AS a, id_b AS b FROM pairs WHERE id_a <> id_b
      UNION
      SELECT id_b AS a, id_a AS b FROM pairs WHERE id_a <> id_b
      UNION
      SELECT doc_id AS a, doc_id AS b FROM documents)""",
        "l0 AS MATERIALIZED (SELECT doc_id AS n, doc_id AS lbl FROM documents)",
    ]
    for i in range(1, rounds + 1):
        parts.append(
            f"""b{i} AS MATERIALIZED (
      SELECT a, lbl FROM (
        SELECT a, lbl, row_number() OVER (PARTITION BY a
          ORDER BY cnt DESC, lbl) AS rn
        FROM (SELECT e.a, l.lbl, count(*) AS cnt
              FROM e JOIN l{i-1} l ON e.b = l.n GROUP BY 1, 2))
      WHERE rn = 1)"""
        )
        parts.append(
            f"""l{i} AS MATERIALIZED (
      SELECT l.n, coalesce(b.lbl, l.lbl) AS lbl
      FROM l{i-1} l LEFT JOIN b{i} b ON l.n = b.a)"""
        )
    return (
        f"WITH {_neardup_pairs_ctes()},\n    "
        + ",\n    ".join(parts)
        + f"""
    SELECT lbl AS label, count(*) AS n_members
    FROM l{rounds} GROUP BY lbl
    """
    )


@query("label_propagation_communities", _lpa_oracle())
def q_label_propagation(spark, sf_dir):
    """Community detection over the near-dup graph
    (operators.graph.label_propagation): synchronous LPA with
    self-votes, 4 rounds, ties to the smallest label — splits
    weakly-bridged duplicate clusters at sparse cuts where connected
    components (pure reachability) would merge them through one
    accidental pair. Deterministic (synchronous updates, fixed rounds,
    (count, label) argmax), so the oracle unrolls the rounds over the
    shared MinHash pair-graph CTE prefix. One vote-count shuffle + one
    partially-aggregated min(struct) argmax per round (r12 — no window
    sort, no per-round membership join). Artifact: per-community
    member counts."""
    from parkour_spark.operators.graph import label_propagation

    docs = _t(spark, sf_dir, "documents")
    pairs = D.minhash_dedup_pairs(docs, threshold=0.8)
    labels = label_propagation(
        docs.select("doc_id"), pairs, node_col="doc_id", rounds=4
    )
    return labels.groupBy("label").agg(F.count("*").alias("n_members"))



@query(
    "sorted_neighborhood_candidates",
    """
    WITH keyed AS (
      SELECT doc_id AS id,
             md5(regexp_replace(lower(trim(text)), '\\s+', ' ', 'g')) AS k
      FROM documents),
    blocked AS (SELECT id, k, substr(k, 1, 2) AS blk FROM keyed),
    neigh AS (
      SELECT id, k, blk,
             lead(id, 1) OVER w AS nid1, lead(k, 1) OVER w AS nk1,
             lead(id, 2) OVER w AS nid2, lead(k, 2) OVER w AS nk2
      FROM blocked
      WINDOW w AS (PARTITION BY blk ORDER BY k, id)),
    pairs AS (
      SELECT least(id, nid1) AS id_a, greatest(id, nid1) AS id_b,
             least(k, nk1) AS key_a, greatest(k, nk1) AS key_b
      FROM neigh WHERE nid1 IS NOT NULL
      UNION
      SELECT least(id, nid2), greatest(id, nid2),
             least(k, nk2), greatest(k, nk2)
      FROM neigh WHERE nid2 IS NOT NULL)
    SELECT id_a, id_b, key_a, key_b,
           CASE WHEN key_a = key_b THEN 1 ELSE 0 END AS exact_dup
    FROM pairs
    """,
)
def q_sorted_neighborhood(spark, sf_dir):
    """Sorted-neighborhood blocking (the ER-classic complement to LSH):
    candidates = docs within 3 positions in fingerprint order WITHIN
    each 2-hex-char block — per-block windows, no global sort
    bottleneck, lead() columns instead of a self-join. Exact dups (the
    planted fingerprint-identical docs) sort adjacent, so the
    neighborhood provably catches them: `exact_dup` marks pairs whose
    keys match."""
    from parkour_spark.functions.text import fingerprint
    from parkour_spark.operators.dedup import sorted_neighborhood_pairs

    docs = _t(spark, sf_dir, "documents").select(
        "doc_id", fingerprint("text").alias("fp")
    )
    pairs = sorted_neighborhood_pairs(
        docs, "fp", window=3, block_chars=2, id_col="doc_id"
    )
    return pairs.withColumn(
        "exact_dup",
        F.when(F.col("key_a") == F.col("key_b"), F.lit(1)).otherwise(F.lit(0)),
    )


@query(
    "price_histogram",
    """
    WITH b AS (
      SELECT greatest(0, least(19,
               CAST(floor((o_totalprice - 0) * 20 / (600000 - 0)) AS INT)))
             AS bucket
      FROM orders WHERE o_totalprice IS NOT NULL)
    SELECT bucket, count(*) AS n,
           round(0 + bucket * 600000.0 / 20, 4) AS lo,
           round(0 + (bucket + 1) * 600000.0 / 20, 4) AS hi
    FROM b GROUP BY bucket
    """,
)
def q_price_histogram(spark, sf_dir):
    """Equi-width price histogram (operators.validate.histogram): one
    partial-agg'd scan, at most 20 rows shuffle; outliers clamp into
    the edge buckets instead of silently vanishing."""
    from parkour_spark.operators.validate import histogram

    orders = _t(spark, sf_dir, "orders")
    return histogram(orders, "o_totalprice", lo=0, hi=600000, n_buckets=20)


# ===========================================================================
# Behavioral event analytics (operators/behavior.py)
# ===========================================================================


@query(
    "funnel_view_click_purchase",
    """
    WITH r1 AS (
      SELECT user_id AS u, min(ts) AS t FROM events
      WHERE event_type = 'view' GROUP BY user_id),
    r2 AS (
      SELECT e.user_id AS u, min(e.ts) AS t
      FROM events e JOIN r1 ON e.user_id = r1.u
      WHERE e.event_type = 'click' AND e.ts >= r1.t
      GROUP BY e.user_id),
    r3 AS (
      SELECT e.user_id AS u, min(e.ts) AS t
      FROM events e JOIN r2 ON e.user_id = r2.u
      WHERE e.event_type = 'purchase' AND e.ts >= r2.t
      GROUP BY e.user_id)
    SELECT 1 AS step, 'view' AS step_name, (SELECT count(*) FROM r1) AS n_users
    UNION ALL
    SELECT 2, 'click', (SELECT count(*) FROM r2)
    UNION ALL
    SELECT 3, 'purchase', (SELECT count(*) FROM r3)
    """,
)
def q_funnel(spark, sf_dir):
    """Exact sequential funnel view → click → purchase: per step a
    type-filtered scan joined to the previous reach table — the
    SEQUENTIAL definition (earliest qualifying event after the prior
    step), not the min-per-type shortcut that miscounts users who did
    a later step first. Counts are non-increasing by construction."""
    from parkour_spark.operators.behavior import funnel

    ev = _t(spark, sf_dir, "events")
    return funnel(ev, ["view", "click", "purchase"])


@query(
    "retention_weekly_cohorts",
    """
    WITH active AS (
      SELECT DISTINCT user_id AS u,
             CAST(floor(epoch(ts)) AS BIGINT) // (86400 * 7) AS w
      FROM events),
    first AS (SELECT u, min(w) AS w0 FROM active GROUP BY u)
    SELECT w0 AS cohort_week, (w - w0) AS week_offset,
           count(DISTINCT active.u) AS n_users
    FROM active JOIN first ON active.u = first.u
    GROUP BY w0, (w - w0)
    """,
)
def q_retention(spark, sf_dir):
    """Weekly retention matrix: cohort = each user's first active
    integer epoch-week; one distinct (user, week) pass + one user-keyed
    join — the 100 TB event table collapses to user-week grain before
    anything joins. Integer week arithmetic, calendar-independent."""
    from parkour_spark.operators.behavior import retention_cohorts

    ev = _t(spark, sf_dir, "events")
    return retention_cohorts(ev)


@query(
    "event_transition_matrix",
    """
    WITH ordered AS (
      SELECT user_id, event_type,
             lag(event_type) OVER (
               PARTITION BY user_id ORDER BY ts, event_id) AS prev_type
      FROM events)
    SELECT prev_type, event_type AS next_type, count(*) AS n
    FROM ordered WHERE prev_type IS NOT NULL
    GROUP BY prev_type, event_type
    """,
)
def q_transitions(spark, sf_dir):
    """Empirical Markov transition table of event types per user: one
    lag window over the deterministic (ts, event_id) order + one pair
    aggregate. Same-timestamp rows are ordered by id — an analytics
    answer that depends on partition order is not an answer."""
    from parkour_spark.operators.behavior import transition_matrix

    ev = _t(spark, sf_dir, "events")
    return transition_matrix(ev)


@query(
    "fuzzy_join_part_names",
    """
    WITH d0 AS (
      SELECT p_partkey, p_name,
             ('0x' || substr(md5(p_partkey::VARCHAR), 1, 8))::BIGINT
               % (length(p_name) - 1) + 2 AS pos
      FROM part),
    dirty AS (
      SELECT p_partkey,
             substr(p_name, 1, pos - 1) || substr(p_name, pos + 1) AS dname
      FROM d0),
    reg AS (SELECT DISTINCT p_name AS rname FROM part),
    lb AS (
      SELECT p_partkey, dname, unnest(
        list_sort(list_distinct(list_transform(
          range(1, greatest(length(dname) - 2, 1) + 1),
          i -> ('0x' || substr(md5(substr(dname, i, 3)), 1, 8))::BIGINT)))[1:2]
        ) AS block
      FROM dirty),
    rb0 AS (
      SELECT rname, unnest(
        list_sort(list_distinct(list_transform(
          range(1, greatest(length(rname) - 2, 1) + 1),
          i -> ('0x' || substr(md5(substr(rname, i, 3)), 1, 8))::BIGINT)))[1:2]
        ) AS block
      FROM reg),
    rb AS (SELECT * FROM rb0
           QUALIFY count(*) OVER (PARTITION BY block) <= 1000),
    cand AS (SELECT DISTINCT p_partkey, dname, rname
             FROM lb JOIN rb USING (block))
    SELECT p_partkey, dname AS dirty_name, rname AS match_name,
           levenshtein(dname, rname) AS dist
    FROM cand WHERE levenshtein(dname, rname) <= 1
    """,
)
def q_fuzzy_join(spark, sf_dir):
    """Blocked fuzzy join (operators.joins.fuzzy_join) — entity
    resolution of a DIRTY name column against a clean registry: every
    part name is deterministically corrupted (one char dropped at a
    content-hash position), then matched back to the distinct-name
    registry within Levenshtein distance 1. Candidates come from the
    min-gram-hash blocking equi-join (2 probes), NEVER all-pairs, and
    the oracle replays the blocking exactly — so the approximate
    candidate generation itself is hash-verified, recall guaranteed by
    construction (the true original is 1 deletion away)."""
    part = _t(spark, sf_dir, "part")
    hb = "cast(conv(substring(md5(cast(p_partkey as string)), 1, 8), 16, 10) as bigint)"
    dirty = (
        part.select("p_partkey", "p_name")
        .withColumn("__pos", F.expr(f"{hb} % (length(p_name) - 1) + 2"))
        .select(
            "p_partkey",
            F.expr(
                "concat(substring(p_name, 1, __pos - 1),"
                " substring(p_name, __pos + 1))"
            ).alias("dname"),
        )
    )
    reg = part.select(F.col("p_name").alias("rname")).distinct()
    return J.fuzzy_join(
        dirty, reg, ("p_partkey", "dname"), ("rname", "rname"), max_dist=1
    ).select(
        F.col("l_id").alias("p_partkey"),
        F.col("l_val").alias("dirty_name"),
        F.col("r_val").alias("match_name"),
        "dist",
    )


@query(
    "weighted_sample_by_source",
    """
    WITH k AS (
      SELECT source, doc_id,
             ln(((('0x' || substr(md5(doc_id::VARCHAR), 1, 8))::BIGINT % 1024)
                 + 0.5) / 1024.0) / n_chars AS pri
      FROM documents WHERE n_chars > 0)
    SELECT source, doc_id, rank FROM (
      SELECT source, doc_id,
             row_number() OVER (PARTITION BY source
                                ORDER BY pri DESC, doc_id) AS rank
      FROM k)
    WHERE rank <= 5
    """,
)
def q_weighted_sample(spark, sf_dir):
    """Deterministic A-ES weighted sampling (operators.corpus.
    weighted_sample): 5 docs per source, inclusion probability
    proportional to n_chars, priorities ln(u)/w with u a content-hash
    dyadic uniform — reproducible across engines/partitionings (the
    oracle replays the exact priorities; cross-libm 1-ulp drift cannot
    reorder priorities separated by the 1024-level u grid; equal
    (u, w) ties break on doc_id in both engines)."""
    docs = _t(spark, sf_dir, "documents")
    return C.weighted_sample(
        docs, "doc_id", "n_chars", 5, group_col="source"
    ).select("source", "doc_id", "rank")


@query(
    "dsir_importance_weights",
    f"""
    WITH toks AS (SELECT doc_id, unnest({_TOKS_SQL}) AS term FROM documents),
    occ AS (SELECT doc_id,
                   ('0x' || substr(md5(term), 1, 8))::BIGINT % 4096 AS b
            FROM toks),
    tocc AS (SELECT b FROM occ JOIN documents USING (doc_id)
             WHERE source IN ('src0', 'src1')),
    rc AS (SELECT b, count(*)::BIGINT AS c_r FROM occ GROUP BY b),
    tc AS (SELECT b, count(*)::BIGINT AS c_t FROM tocc GROUP BY b),
    tot AS (SELECT (SELECT sum(c_r) FROM rc)::BIGINT AS n_r,
                   (SELECT coalesce(sum(c_t), 0) FROM tc)::BIGINT AS n_t),
    lr AS (
      SELECT rc.b,
             round((ln((coalesce(tc.c_t, 0) + 1)::DOUBLE / (tot.n_t + 4096))
                    - ln((rc.c_r + 1)::DOUBLE / (tot.n_r + 4096)))
                   * 1e6)::BIGINT AS lr_micro
      FROM rc LEFT JOIN tc USING (b) CROSS JOIN tot)
    SELECT occ.doc_id, count(*)::BIGINT AS n_toks,
           sum(lr.lr_micro)::BIGINT AS logweight_micro
    FROM occ JOIN lr USING (b)
    GROUP BY occ.doc_id
    """,
)
def q_dsir(spark, sf_dir):
    """DSIR importance weights (operators.corpus.dsir_importance, Xie
    et al. 2023): hashed-unigram target-vs-raw LM log-ratio per doc,
    target = the src0/src1 slice standing in for a high-quality
    domain. Bucket log-ratios are integer micro-nats computed ONCE in
    the 4096-row broadcast table; per-doc sums are integer — order-
    independent under any partitioning. The raw corpus shuffles once
    (the per-doc aggregate); the vocabulary never drives a shuffle."""
    docs = _t(spark, sf_dir, "documents")
    target = docs.where(F.col("source").isin("src0", "src1"))
    return C.dsir_importance(docs, target)


@query(
    "last_touch_attribution",
    """
    WITH sub AS (
      SELECT user_id, event_id, ts, event_type FROM events
      WHERE event_type IN ('click', 'view', 'purchase')),
    seq AS (
      SELECT *,
             last_value(CASE WHEN event_type IN ('click', 'view')
                             THEN event_type END IGNORE NULLS)
               OVER (PARTITION BY user_id ORDER BY ts, event_id
                     ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
               AS lt_ty,
             last_value(CASE WHEN event_type IN ('click', 'view')
                             THEN ts END IGNORE NULLS)
               OVER (PARTITION BY user_id ORDER BY ts, event_id
                     ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
               AS lt_t
      FROM sub),
    conv AS (
      SELECT CASE WHEN lt_t >= ts - INTERVAL 7 DAY THEN lt_ty END AS ty,
             user_id
      FROM seq WHERE event_type = 'purchase')
    SELECT coalesce(ty, 'none') AS touch_type,
           count(*)::BIGINT AS conversions,
           count(DISTINCT user_id)::BIGINT AS n_users
    FROM conv GROUP BY coalesce(ty, 'none')
    """,
)
def q_last_touch(spark, sf_dir):
    """Last-touch attribution (operators.behavior.
    last_touch_attribution): every purchase attributed to the user's
    most recent click/view within 7 days. One user-keyed window pass
    carries the last touch forward (running last_value IGNORE NULLS
    over the deterministic (ts, event_id) order) — no self-join, no
    per-conversion probe; the event scan collapses scan-side to the
    three relevant types before the single shuffle."""
    from parkour_spark.operators.behavior import last_touch_attribution

    ev = _t(spark, sf_dir, "events")
    attr = last_touch_attribution(ev, attribution_window="7 DAYS")
    return attr.groupBy(
        F.coalesce(F.col("touch_type"), F.lit("none")).alias("touch_type")
    ).agg(
        F.count("*").alias("conversions"),
        F.countDistinct("user_id").alias("n_users"),
    )


@query(
    "jl_projection_fingerprint",
    """
    WITH v AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
    p AS (
      SELECT vec_id,
             list_transform(range(0, 16), j ->
               list_reduce(
                 list_transform(range(1, len(v) + 1),
                   i -> v[i] * (CASE WHEN ('0x' || substr(md5(j || ':' || (i - 1)),
                                            1, 8))::BIGINT % 2 = 0
                                THEN 1 ELSE -1 END)),
                 (a, b) -> a + b) / sqrt(16.0)) AS proj
      FROM v)
    SELECT vec_id,
           md5(array_to_string(list_transform(proj,
                 x -> round(x * 10000)::BIGINT::VARCHAR), ',')) AS proj_md5,
           round(list_reduce(list_transform(proj, x -> x * x),
                             (a, b) -> a + b) * 1e6)::BIGINT AS norm2_micro
    FROM p
    """,
)
def q_jl_projection(spark, sf_dir):
    """Johnson-Lindenstrauss random projection (operators.similarity.
    random_projection): 64-d embeddings -> 16-d with a deterministic
    content-hash Rademacher matrix (sign(j,i) = parity of md5("j:i") —
    jl_matrix re-derives it in Python, the oracle in SQL, so the WHOLE
    projection is hash-verified, not just its statistics). Output: the
    projected vector fingerprinted in integer deci-milli units + its
    squared norm in micro units. Pure scan-side Column math: the
    matrix rides the plan as literals, zero shuffle."""
    emb = _t(spark, sf_dir, "embeddings")
    dim = len(emb.select("embedding").first()[0])
    proj = SIM.random_projection(emb, SIM.jl_matrix(dim, 16))
    return proj.select(
        "vec_id",
        F.md5(
            F.concat_ws(
                ",",
                F.expr(
                    "transform(proj, x -> cast(cast(round(x * 10000) as bigint)"
                    " as string))"
                ),
            )
        ).alias("proj_md5"),
        F.expr(
            "cast(round(aggregate(proj, 0D, (a, x) -> a + x * x) * 1e6)"
            " as bigint)"
        ).alias("norm2_micro"),
    )


@query(
    "lsh_multiprobe_topk",
    f"""
    WITH pl AS (
      SELECT vec_id - 5 AS pid, embedding::DOUBLE[] AS pv
      FROM embeddings WHERE vec_id >= 5 AND vec_id < {5 + _LSH_N_PLANES}),
    q0 AS (SELECT vec_id AS query_id, embedding::DOUBLE[] AS v
           FROM embeddings WHERE vec_id < 5),
    q AS (SELECT query_id,
                 list_transform(range(1, len(v) + 1),
                                j -> v[j] + 0.35 * v[(j % len(v)) + 1]) AS qvec
          FROM q0),
    c AS (SELECT vec_id, embedding::DOUBLE[] AS cvec
          FROM embeddings WHERE vec_id >= 5),
    cb AS (
      SELECT vec_id, cvec,
             CAST(sum(CASE WHEN list_dot_product(cvec, pv) >= 0
                           THEN (1::BIGINT << ({_LSH_N_PLANES - 1} - pid))
                           ELSE 0 END) AS BIGINT) AS bucket
      FROM c CROSS JOIN pl GROUP BY vec_id, cvec),
    qb0 AS (
      SELECT query_id, qvec,
             CAST(sum(CASE WHEN list_dot_product(qvec, pv) >= 0
                           THEN (1::BIGINT << ({_LSH_N_PLANES - 1} - pid))
                           ELSE 0 END) AS BIGINT) AS bucket
      FROM q CROSS JOIN pl GROUP BY query_id, qvec),
    qb AS (
      SELECT query_id, qvec, unnest(
        list_prepend(bucket,
          list_transform(range(0, {_LSH_N_PLANES}),
                         b -> xor(bucket, 1::BIGINT << b)))) AS bucket
      FROM qb0),
    scored AS (
      SELECT qb.query_id, cb.vec_id,
             round(list_dot_product(cb.cvec, qb.qvec)
                   / (sqrt(list_dot_product(cb.cvec, cb.cvec))
                      * sqrt(list_dot_product(qb.qvec, qb.qvec))), 4) AS cos
      FROM qb JOIN cb USING (bucket))
    SELECT query_id, vec_id, rank, cos FROM (
      SELECT *, row_number() OVER (PARTITION BY query_id
                                   ORDER BY cos DESC, vec_id) AS rank
      FROM scored)
    WHERE rank <= 10
    """,
)
def q_lsh_multiprobe(spark, sf_dir):
    """Multi-probe LSH ANN (operators.similarity.lsh_topk with
    probe_bits=1, Lv et al. 2007): each query also probes all 8
    Hamming-1 neighbor buckets — recall that a single flipped sign bit
    would lose, WITHOUT a second hash table (the corpus stays bucketed
    once; probe fan-out multiplies only the broadcast query side).
    Queries are stronger perturbations (0.35, cos ≈ 0.95) than the
    single-probe entry's, so bit flips actually occur; the oracle
    replays bucketing + probing + rerank exactly."""
    emb = _t(spark, sf_dir, "embeddings")
    if sf_dir not in _LSH_PLANES:
        rows = (
            emb.where(
                (F.col("vec_id") >= 5) & (F.col("vec_id") < 5 + _LSH_N_PLANES)
            )
            .orderBy("vec_id")
            .select("embedding")
            .collect()
        )
        _LSH_PLANES[sf_dir] = [[float(x) for x in r[0]] for r in rows]
    queries = emb.where(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("query_id"),
        F.expr(
            "transform(sequence(0, size(embedding) - 1),"
            " j -> cast(embedding[j] as double)"
            "      + 0.35D * cast(embedding[(j + 1) % size(embedding)] as double))"
        ).alias("query_vec"),
    )
    corpus = emb.where(F.col("vec_id") >= 5).select(
        "vec_id",
        F.expr("transform(embedding, x -> cast(x as double))").alias("embedding"),
    )
    return SIM.lsh_topk(
        corpus, queries, _LSH_PLANES[sf_dir], k=10, probe_bits=1
    ).select("query_id", "vec_id", "rank", "cos")


# ===========================================================================
# LLM-pipeline: hard-negative mining, domain caps, deterministic heavy
# hitters, distributed least-squares (round 6 additions)
# ===========================================================================


@query(
    "hard_negative_mining",
    """
    WITH q AS (SELECT vec_id AS query_id, embedding, label AS qlabel,
                      vec_id AS pos
               FROM embeddings WHERE vec_id < 8),
    c AS (SELECT vec_id, embedding, label FROM embeddings),
    scored AS (
      SELECT q.query_id, c.vec_id,
             round(list_dot_product(c.embedding::DOUBLE[], q.embedding::DOUBLE[])
                   / (sqrt(list_dot_product(c.embedding::DOUBLE[], c.embedding::DOUBLE[]))
                      * sqrt(list_dot_product(q.embedding::DOUBLE[], q.embedding::DOUBLE[]))), 4) AS cos
      FROM c, q
      WHERE c.label <> q.qlabel AND c.vec_id <> q.pos)
    SELECT query_id, vec_id, rank, cos FROM (
      SELECT *, row_number() OVER (PARTITION BY query_id ORDER BY cos DESC, vec_id) AS rank
      FROM scored)
    WHERE rank <= 5
    """,
)
def q_hard_negative_mining(spark, sf_dir):
    """Hard-negative mining (similarity.hard_negatives): per query, the
    5 most-cosine-similar corpus vectors that are neither the gold
    positive nor same-label (in-batch false-negative filtering) — the
    DPR/Contriever negative-selection step, broadcast-query shape."""
    emb = _t(spark, sf_dir, "embeddings")
    queries = emb.where(F.col("vec_id") < 8).select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("query_vec"),
        F.col("label").alias("query_label"),
        F.col("vec_id").alias("positive_id"),
    )
    return SIM.hard_negatives(emb, queries, k=5).select(
        "query_id", "vec_id", "rank", "cos"
    )


@query(
    "per_source_quota",
    """
    SELECT doc_id, source, n_chars FROM (
      SELECT doc_id, source, n_chars,
             row_number() OVER (PARTITION BY source
                                ORDER BY n_chars DESC, doc_id) AS rk
      FROM documents)
    WHERE rk <= 20
    """,
)
def q_per_source_quota(spark, sf_dir):
    """Domain/source cap (corpus.quota_cap): at most 20 docs per source,
    keeping the longest (deterministic doc_id tie-break) — the
    RefinedWeb-style guard against one site dominating the mix."""
    docs = _t(spark, sf_dir, "documents").select("doc_id", "source", "n_chars")
    return C.quota_cap(docs, "source", "n_chars", "doc_id", n=20)


@query(
    "mg_heavy_tokens",
    """
    WITH toks AS (SELECT unnest(string_split_regex(trim(text), '\\s+')) AS token
                  FROM documents),
    tk AS (SELECT token FROM toks WHERE token <> '')
    SELECT token, count(*)::BIGINT AS n
    FROM tk
    GROUP BY token
    HAVING count(*) >= greatest(100, (SELECT count(*) FROM tk) // 100)
    """,
)
def q_mg_heavy_tokens(spark, sf_dir):
    """Deterministic heavy hitters via mergeable Misra-Gries summaries
    (sketch.mg_heavy_hitters): per-partition MG(256) folds + driver
    merge + exact broadcast-verify. The MG guarantee (miss => count <=
    n/257) makes the output EXACTLY `HAVING count >= threshold` at
    threshold = max(100, n//100) — the oracle states that equality."""
    from parkour_spark.operators import sketch as SK

    docs = _t(spark, sf_dir, "documents")
    toks = docs.select(F.explode(tokens("text")).alias("token"))
    n_total = toks.count()
    thr = max(100, n_total // 100)
    return SK.mg_heavy_hitters(toks, "token", k=256, threshold=thr).select(
        "token", F.col("n").cast("long").alias("n")
    )


@query(
    "linreg_moments_docstats",
    """
    WITH f AS (
      SELECT len(list_filter(string_split_regex(trim(text), '\\s+'),
                             t -> t <> '')) AS x,
             length(text) AS y
      FROM documents)
    SELECT 0 AS i, -1 AS j, sum(y)::BIGINT AS s FROM f
    UNION ALL SELECT 0, 0, count(*)::BIGINT FROM f
    UNION ALL SELECT 0, 1, sum(x)::BIGINT FROM f
    UNION ALL SELECT 1, -1, sum(x * y)::BIGINT FROM f
    UNION ALL SELECT 1, 1, sum(x * x)::BIGINT FROM f
    """,
)
def q_linreg_moments(spark, sf_dir):
    """Distributed least-squares sufficient statistics
    (regress.moment_matrix): exact int64 normal-equation moments for
    chars ~ intercept + tokens, one scan, one 1-row shuffle; the d x d
    solve itself is driver-side numpy (regress.fit_linear, pytest-pinned
    against lstsq on the collected rows)."""
    from parkour_spark.operators import regress as R

    docs = _t(spark, sf_dir, "documents")
    return R.moment_matrix(docs, [token_count("text")], F.length("text"))


@query(
    "training_shards_manifest",
    """
    WITH d AS (
      SELECT ('0x' || substr(md5(doc_id::VARCHAR), 1, 8))::BIGINT % 16 AS shard,
             len(list_filter(string_split_regex(trim(text), '\\s+'),
                             t -> t <> ''))::BIGINT AS nt,
             ('0x' || substr(md5(doc_id::VARCHAR || ':' || text), 1, 15))::BIGINT AS fp
      FROM documents)
    SELECT shard, count(*)::BIGINT AS n_docs, sum(nt)::BIGINT AS n_tokens,
           bit_xor(fp)::BIGINT AS content_fp
    FROM d GROUP BY shard
    """,
)
def q_training_shards_manifest(spark, sf_dir):
    """Training-shard manifest (corpus.shard_manifest): content-hash
    shard assignment + per-shard doc/token counts and an XOR content
    fingerprint — order-independent, constant-width, partial-agg-safe.
    The data-loader contract for serving a prepared corpus."""
    docs = _t(spark, sf_dir, "documents")
    return C.shard_manifest(docs, n_shards=16)


@query(
    "label_centroid_sums",
    """
    WITH e AS (SELECT label, list_transform(embedding, x -> x::DOUBLE) AS v
               FROM embeddings),
    x AS (SELECT label, unnest(v) AS val, unnest(range(len(v))) AS pos FROM e)
    SELECT label, pos, sum(floor(val * 1e6)::BIGINT)::BIGINT AS sum_micro,
           count(*)::BIGINT AS n
    FROM x GROUP BY label, pos
    """,
)
def q_label_centroid_sums(spark, sf_dir):
    """Per-class centroid sufficient statistics
    (kmeans.grouped_centroids): exact integer micro-unit element sums
    per (label, position) — associative, so the only shuffle carries
    labels x dims x partitions cells. The class-prototype primitive."""
    from parkour_spark.operators import kmeans as K

    emb = _t(spark, sf_dir, "embeddings")
    return K.grouped_centroids(emb, "label", "embedding").select(
        F.col("grp").alias("label"),
        F.col("pos").cast("long").alias("pos"),
        "sum_micro",
        "n",
    )


_IVF_INDEX_DIRS: dict[str, str] = _SfLRUDirs()


@query("ivf_probe_persisted_topk", _ivf_oracle())
def q_ivf_probe_persisted(spark, sf_dir):
    """Probe-only IVF against a PERSISTED index
    (similarity.ivf_index_build / ivf_probe_topk): the ingest/serving
    path. The index is built once per corpus version (cached here like
    the z-order layout — rebuilding per call would bill the amortized
    cost as recurring), written partitionBy(cell); the query batch's
    probed cells apply as a STATIC partition filter so the scan opens
    only those cells' files. Same oracle as ivf_topk_cosine: the
    persisted path must return the identical result set."""
    import tempfile

    emb = _t(spark, sf_dir, "embeddings")
    cents = _ivf_centroids(spark, sf_dir)
    if sf_dir not in _IVF_INDEX_DIRS:
        tmp = tempfile.mkdtemp(prefix="parkour_ivfidx_")
        SIM.ivf_index_build(emb.where(F.col("vec_id") >= 5), cents, tmp)
        _IVF_INDEX_DIRS[sf_dir] = tmp
    queries = emb.where(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("query_vec")
    )
    return SIM.ivf_probe_topk(
        spark, _IVF_INDEX_DIRS[sf_dir], queries, cents, k=10, nprobe=4
    ).select("query_id", "vec_id", "rank", "cos")


@query(
    "hll_distinct_users_by_type",
    f"""
    WITH h AS (
      SELECT event_type AS grp,
             ('0x' || substr(md5(user_id::VARCHAR), 1, 8))::BIGINT % {_HLL_M}
               AS bucket,
             substr(md5(user_id::VARCHAR), 9, 16) AS w
      FROM events),
    lzs AS (
      SELECT grp, bucket, w, length(regexp_extract(w, '^(0*)', 1)) AS lz FROM h),
    regs0 AS (
      SELECT grp, bucket, max({_HLL_RHO}) AS rho FROM lzs GROUP BY grp, bucket),
    grps AS (SELECT DISTINCT event_type AS grp FROM events),
    regs AS (
      SELECT g.grp, r.range AS bucket, coalesce(regs0.rho, 0) AS rho
      FROM grps g CROSS JOIN range({_HLL_M}) r
      LEFT JOIN regs0 ON regs0.grp = g.grp AND r.range = regs0.bucket),
    agg AS (
      SELECT grp,
             sum(CAST(pow(2, 64 - rho) AS DECIMAL(38,0))) AS S,
             CAST(sum(CASE WHEN rho = 0 THEN 1 ELSE 0 END) AS BIGINT)
               AS n_zero_buckets,
             md5(string_agg(rho::VARCHAR, ',' ORDER BY bucket)) AS registers_fp
      FROM regs GROUP BY grp),
    ex AS (SELECT event_type AS grp, count(DISTINCT user_id) AS exact_distinct
           FROM events GROUP BY event_type),
    est AS (
      SELECT grp, n_zero_buckets, registers_fp,
             round(CASE WHEN ({_HLL_ALPHA_MM} * pow(2, 64) / CAST(S AS DOUBLE))
                             <= 2.5 * {_HLL_M}
                         AND n_zero_buckets > 0
                        THEN {_HLL_M}.0 * ln({_HLL_M}.0 / n_zero_buckets)
                        ELSE {_HLL_ALPHA_MM} * pow(2, 64) / CAST(S AS DOUBLE)
                   END, 2) AS estimate
      FROM agg)
    SELECT est.grp, {_HLL_M} AS m, n_zero_buckets, registers_fp, estimate,
           ex.exact_distinct,
           abs(estimate - ex.exact_distinct) <= 0.195 * ex.exact_distinct
             AS within_3sigma
    FROM est JOIN ex ON est.grp = ex.grp
    """,
)
def q_hll_by_type(spark, sf_dir):
    """Per-group engine-exact HyperLogLog
    (sketch.hll_registers_by/hll_estimate_by): distinct users per event
    type at a FIXED per-group cost — the COUNT(DISTINCT ...) GROUP BY
    killer replaced by groups x m register cells that ride partial
    aggregation and merge by element-wise max across corpora. The whole
    per-group sketch hash-compares (registers_fp), plus the exact count
    and a 3-sigma bound flag computed identically in both engines."""
    from parkour_spark.operators.sketch import hll_estimate_by, hll_registers_by

    ev = _t(spark, sf_dir, "events")
    regs = hll_registers_by(ev, "event_type", "user_id", p=_HLL_P)
    est = hll_estimate_by(regs, p=_HLL_P)
    exact = ev.groupBy(F.col("event_type").alias("grp")).agg(
        F.countDistinct("user_id").alias("exact_distinct")
    )
    return est.join(exact, "grp").select(
        "grp", "m", "n_zero_buckets", "registers_fp", "estimate",
        "exact_distinct",
        (
            F.abs(F.col("estimate") - F.col("exact_distinct"))
            <= 0.195 * F.col("exact_distinct")
        ).alias("within_3sigma"),
    )


@query(
    "token_drift_sources",
    f"""
    WITH ta AS (SELECT unnest({_TOKS_SQL}) AS tok FROM documents
                WHERE length(source) = 4),
    tb AS (SELECT unnest({_TOKS_SQL}) AS tok FROM documents
           WHERE length(source) = 5),
    ca AS (SELECT ('0x' || substr(md5(tok), 1, 8))::BIGINT % 4096 AS b,
                  count(*)::BIGINT AS c_a
           FROM ta GROUP BY 1),
    cb AS (SELECT ('0x' || substr(md5(tok), 1, 8))::BIGINT % 4096 AS b,
                  count(*)::BIGINT AS c_b
           FROM tb GROUP BY 1),
    tot AS (SELECT (SELECT coalesce(sum(c_a), 0) FROM ca)::BIGINT AS n_a,
                   (SELECT coalesce(sum(c_b), 0) FROM cb)::BIGINT AS n_b),
    joined AS (
      SELECT coalesce(ca.b, cb.b) AS b, coalesce(c_a, 0) AS c_a,
             coalesce(c_b, 0) AS c_b
      FROM ca FULL JOIN cb ON ca.b = cb.b),
    terms AS (
      SELECT
        round(((c_a + 1)::DOUBLE / (tot.n_a + 4096))
              * ln(((c_a + 1)::DOUBLE / (tot.n_a + 4096))
                   / ((c_b + 1)::DOUBLE / (tot.n_b + 4096))) * 1e9)::BIGINT AS kab,
        round(((c_b + 1)::DOUBLE / (tot.n_b + 4096))
              * ln(((c_b + 1)::DOUBLE / (tot.n_b + 4096))
                   / ((c_a + 1)::DOUBLE / (tot.n_a + 4096))) * 1e9)::BIGINT AS kba,
        round(abs(((c_a + 1)::DOUBLE / (tot.n_a + 4096))
                  - ((c_b + 1)::DOUBLE / (tot.n_b + 4096))) * 0.5 * 1e9)::BIGINT AS tv
      FROM joined CROSS JOIN tot),
    agg AS (SELECT sum(kab)::BIGINT AS skab, sum(kba)::BIGINT AS skba,
                   sum(tv)::BIGINT AS stv, count(*)::BIGINT AS n_obs
            FROM terms)
    SELECT tot.n_a AS n_toks_a, tot.n_b AS n_toks_b,
           agg.n_obs AS n_buckets_obs,
           (skab + (4096 - n_obs)
              * round((1.0 / (tot.n_a + 4096))
                      * ln((1.0 / (tot.n_a + 4096)) / (1.0 / (tot.n_b + 4096)))
                      * 1e9)::BIGINT)::BIGINT AS kl_ab_nano,
           (skba + (4096 - n_obs)
              * round((1.0 / (tot.n_b + 4096))
                      * ln((1.0 / (tot.n_b + 4096)) / (1.0 / (tot.n_a + 4096)))
                      * 1e9)::BIGINT)::BIGINT AS kl_ba_nano,
           (stv + (4096 - n_obs)
              * round(abs((1.0 / (tot.n_a + 4096)) - (1.0 / (tot.n_b + 4096)))
                      * 0.5 * 1e9)::BIGINT)::BIGINT AS tv_nano
    FROM agg CROSS JOIN tot
    """,
)
def q_token_drift(spark, sf_dir):
    """Corpus distribution drift (corpus.token_drift): smoothed
    KL (both directions) + total variation between the hashed-unigram
    token distributions of two corpus slices (sources src0-9 vs
    src10-19 standing in for two snapshots) — integer nano-nat sums
    over a bounded 4096-bucket table, the ingest-monitoring primitive.
    Unobserved buckets contribute the closed-form smoothed term once
    via the observed count; both engines add it identically."""
    docs = _t(spark, sf_dir, "documents")
    a = docs.where(F.length("source") == 4)
    b = docs.where(F.length("source") == 5)
    return C.token_drift(a, b)


@query(
    "class_top_terms_source",
    f"""
    WITH t AS (SELECT source, unnest({_TOKS_SQL}) AS term FROM documents),
    ctf AS (SELECT source, term, count(*)::BIGINT AS c
            FROM t GROUP BY source, term),
    ft AS (SELECT term, sum(c)::BIGINT AS ft FROM ctf GROUP BY term),
    a AS (SELECT sum(c)::BIGINT::DOUBLE / count(DISTINCT source) AS avg_toks
          FROM ctf),
    scored AS (
      SELECT ctf.source, ctf.term,
             round(ctf.c * ln(1.0 + (SELECT avg_toks FROM a) / ft.ft::DOUBLE),
                   6) AS ctfidf
      FROM ctf JOIN ft USING (term))
    SELECT source, term, ctfidf, rank FROM (
      SELECT *, row_number() OVER (PARTITION BY source
                ORDER BY ctfidf DESC, term) AS rank
      FROM scored)
    WHERE rank <= 5
    """,
)
def q_class_top_terms(spark, sf_dir):
    """c-TF-IDF slice labeling (corpus.class_top_terms, Grootendorst
    2022): each source scored as one concatenated pseudo-document,
    top-5 most distinctive terms per source by
    ctf · ln(1 + avg_class_tokens / global_term_count). One corpus
    explode, one (class, term) shuffle; the global term-frequency table
    rides a window over that same aggregate (single-pass trick), never
    a second corpus shuffle."""
    docs = _t(spark, sf_dir, "documents")
    return C.class_top_terms(docs, class_col="source", k=5)


@query(
    "quality_auc_langid",
    f"""
    WITH q AS (
      SELECT (least(length(text) * 8, 4000)
              + CASE WHEN len({_TOKS_SQL}) > 0
                     THEN floor(3000.0 * least(len(list_filter({_TOKS_SQL},
                                  x -> x IN ({_STOP_SQL}))) * 10, len({_TOKS_SQL}))
                                / len({_TOKS_SQL}))
                     ELSE 0 END
              + CASE WHEN list_sum(list_transform({_TOKS_SQL}, t -> length(t)))::DOUBLE
                          / len({_TOKS_SQL}) BETWEEN 3.0 AND 10.0
                     THEN 3000 ELSE 0 END)::BIGINT AS s,
             CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS y
      FROM documents),
    cells AS (SELECT s, sum(y)::BIGINT AS np, sum(1 - y)::BIGINT AS nn
              FROM q GROUP BY s),
    cum AS (
      SELECT s, np, nn,
             coalesce(sum(nn) OVER (ORDER BY s
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS cnb
      FROM cells),
    agg AS (
      SELECT sum(np)::BIGINT AS n_pos, sum(nn)::BIGINT AS n_neg,
             sum(np * (2 * cnb + nn))::BIGINT AS u2
      FROM cum)
    SELECT n_pos, n_neg, u2,
           round(u2 / (2.0 * n_pos * n_neg), 6) AS auc
    FROM agg
    """,
)
def q_quality_auc(spark, sf_dir):
    """Exact ROC AUC of the composite quality score as a predictor of
    lang='en' (validate.auc_rank_sum): the quality-filter evaluation
    primitive, via the Mann–Whitney rank-sum identity with exact ½
    midrank tie credit. No global row sort — the corpus reduces to
    per-distinct-basis-point (npos, nneg) cells in one shuffle
    (≤10⁴ rows regardless of corpus size, because quality_bp is an
    integer), and the only ordered pass windows over that tiny table.
    All rank arithmetic integer (u2 = 2·U exact); one division at the
    end."""
    from parkour_spark.functions.text import quality_bp
    from parkour_spark.operators import validate as V

    docs = _t(spark, sf_dir, "documents")
    scored = docs.select(
        quality_bp(F.col("text")).alias("score_bp"),
        (F.col("lang") == "en").alias("is_en"),
    )
    return V.auc_rank_sum(scored, "score_bp", "is_en")


@query(
    "quality_calibration_bins",
    f"""
    WITH q AS (
      SELECT (least(length(text) * 8, 4000)
              + CASE WHEN len({_TOKS_SQL}) > 0
                     THEN floor(3000.0 * least(len(list_filter({_TOKS_SQL},
                                  x -> x IN ({_STOP_SQL}))) * 10, len({_TOKS_SQL}))
                                / len({_TOKS_SQL}))
                     ELSE 0 END
              + CASE WHEN list_sum(list_transform({_TOKS_SQL}, t -> length(t)))::DOUBLE
                          / len({_TOKS_SQL}) BETWEEN 3.0 AND 10.0
                     THEN 3000 ELSE 0 END) / 10000.0 AS s,
             CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS y
      FROM documents),
    rows_b AS (
      SELECT least(greatest(floor((s - 0.0) / 0.1)::BIGINT, 0), 9) AS bin,
             y, round(s * 1000000.0)::BIGINT AS s_micro
      FROM q)
    SELECT bin, count(*)::BIGINT AS n, sum(y)::BIGINT AS n_pos,
           sum(s_micro)::BIGINT AS sum_score_micro,
           round(sum(y) / count(*)::DOUBLE, 6) AS pos_rate,
           round(sum(s_micro)::BIGINT / (count(*) * 1000000.0), 6) AS mean_score
    FROM rows_b GROUP BY bin
    """,
)
def q_quality_calibration(spark, sf_dir):
    """Reliability-diagram bins for the quality score against lang='en'
    (validate.calibration_bins): the calibration complement to
    quality_auc_langid — AUC measures ranking, this measures whether
    the score's magnitude is probability-faithful. One scan, a 10-row
    shuffle; per-bin means from exact integer micro-unit sums (order-
    independent, engine-exact)."""
    from parkour_spark.functions.text import quality_score
    from parkour_spark.operators import validate as V

    docs = _t(spark, sf_dir, "documents")
    scored = docs.select(
        quality_score(F.col("text")).alias("q"),
        (F.col("lang") == "en").alias("is_en"),
    )
    return V.calibration_bins(scored, "q", "is_en", bins=10)


@query(
    "langid_kappa_agreement",
    f"""
    WITH j AS (
      SELECT CASE WHEN len({_TOKS_SQL}) > 0
                   AND len(list_filter({_TOKS_SQL}, x -> x IN ({_STOP_SQL})))::DOUBLE
                       / len({_TOKS_SQL}) >= 0.05
                  THEN 1 ELSE 0 END AS p,
             CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS t
      FROM documents),
    cells AS (
      SELECT sum(p * t)::BIGINT AS tp, sum(p * (1 - t))::BIGINT AS fp,
             sum((1 - p) * t)::BIGINT AS fn, sum((1 - p) * (1 - t))::BIGINT AS tn
      FROM j)
    SELECT tp, fp, fn, tn,
           round((tp + tn) / (tp + fp + fn + tn)::DOUBLE, 6) AS po,
           round(((tp + fp)::DOUBLE * (tp + fn)::DOUBLE
                  + (fn + tn)::DOUBLE * (fp + tn)::DOUBLE)
                 / ((tp + fp + fn + tn)::DOUBLE * (tp + fp + fn + tn)::DOUBLE),
                 6) AS pe,
           round(((tp + tn) / (tp + fp + fn + tn)::DOUBLE
                  - ((tp + fp)::DOUBLE * (tp + fn)::DOUBLE
                     + (fn + tn)::DOUBLE * (fp + tn)::DOUBLE)
                    / ((tp + fp + fn + tn)::DOUBLE
                       * (tp + fp + fn + tn)::DOUBLE))
                 / (1 - ((tp + fp)::DOUBLE * (tp + fn)::DOUBLE
                         + (fn + tn)::DOUBLE * (fp + tn)::DOUBLE)
                        / ((tp + fp + fn + tn)::DOUBLE
                           * (tp + fp + fn + tn)::DOUBLE)),
                 6) AS kappa
    FROM cells
    """,
)
def q_langid_kappa(spark, sf_dir):
    """Cohen's kappa between the stopword-ratio language heuristic
    (langid_en) and the ground-truth lang column
    (validate.kappa_agreement): the label-QA primitive — agreement
    beyond chance, with the exact integer confusion matrix alongside.
    One partial-agg scan; a single row shuffles."""
    from parkour_spark.functions.text import langid_en
    from parkour_spark.operators import validate as V

    docs = _t(spark, sf_dir, "documents")
    j = docs.select(
        (langid_en(F.col("text")) == "en").alias("pred_en"),
        (F.col("lang") == "en").alias("is_en"),
    )
    return V.kappa_agreement(j, "pred_en", "is_en")


def _hll_regs_sql(src: str) -> str:
    """Dense m-register CTE body over `src` (a CTE providing column k)."""
    return f"""(
      SELECT r.range AS bucket, coalesce(mx.rho, 0) AS rho
      FROM range({_HLL_M}) r LEFT JOIN (
        SELECT bucket, max({_HLL_RHO}) AS rho FROM (
          SELECT bucket, w, length(regexp_extract(w, '^(0*)', 1)) AS lz
          FROM (
            SELECT ('0x' || substr(md5(k::VARCHAR), 1, 8))::BIGINT % {_HLL_M}
                     AS bucket,
                   substr(md5(k::VARCHAR), 9, 16) AS w
            FROM {src})) GROUP BY bucket) mx
      ON r.range = mx.bucket)"""


_HLL_EST_SQL = f"""(
      SELECT round(CASE WHEN ({_HLL_ALPHA_MM} * pow(2, 64)
                              / CAST(sum(CAST(pow(2, 64 - rho) AS DECIMAL(38,0)))
                                     AS DOUBLE)) <= 2.5 * {_HLL_M}
                          AND sum(CASE WHEN rho = 0 THEN 1 ELSE 0 END) > 0
                         THEN {_HLL_M}.0
                              * ln({_HLL_M}.0
                                   / sum(CASE WHEN rho = 0 THEN 1 ELSE 0 END))
                         ELSE {_HLL_ALPHA_MM} * pow(2, 64)
                              / CAST(sum(CAST(pow(2, 64 - rho) AS DECIMAL(38,0)))
                                     AS DOUBLE)
                    END, 2) AS estimate
      FROM REGS)"""


@query(
    "hll_overlap_orderkeys",
    f"""
    WITH ka AS (SELECT l_orderkey AS k FROM lineitem WHERE l_orderkey % 2 = 0),
    kb AS (SELECT l_orderkey AS k FROM lineitem WHERE l_orderkey % 3 = 0),
    ra AS {_hll_regs_sql('ka')},
    rb AS {_hll_regs_sql('kb')},
    ru AS (
      SELECT ra.bucket, greatest(ra.rho, rb.rho) AS rho
      FROM ra JOIN rb ON ra.bucket = rb.bucket),
    ea AS {_HLL_EST_SQL.replace('REGS', 'ra')},
    eb AS {_HLL_EST_SQL.replace('REGS', 'rb')},
    eu AS {_HLL_EST_SQL.replace('REGS', 'ru')}
    SELECT ea.estimate AS est_a, eb.estimate AS est_b,
           eu.estimate AS est_union,
           round(ea.estimate + eb.estimate - eu.estimate, 2) AS est_intersect,
           (SELECT count(DISTINCT l_orderkey) FROM lineitem
            WHERE l_orderkey % 6 = 0)::BIGINT AS exact_intersect,
           abs(ea.estimate + eb.estimate - eu.estimate
               - (SELECT count(DISTINCT l_orderkey) FROM lineitem
                  WHERE l_orderkey % 6 = 0))
             <= 0.2 * eu.estimate AS within_bound
    FROM ea CROSS JOIN eb CROSS JOIN eu
    """,
)
def q_hll_overlap(spark, sf_dir):
    """Sketch set algebra (sketch.hll_merge / hll_intersect_estimate):
    |A∩B| by inclusion–exclusion over engine-exact HLL registers —
    audience overlap with NO distinct-join; each side is one scan into
    256 mergeable cells (union = element-wise max, exact on sketches).
    A = even order keys, B = multiples of 3 (true overlap = multiples
    of 6), alongside the exact count and the IE error-bound flag
    (error compounds with |A∪B|/|A∩B| — the standard IE caveat the
    bound documents)."""
    from parkour_spark.operators.sketch import hll_intersect_estimate

    li = _t(spark, sf_dir, "lineitem")
    a = li.where(F.col("l_orderkey") % 2 == 0)
    b = li.where(F.col("l_orderkey") % 3 == 0)
    est = hll_intersect_estimate(a, b, "l_orderkey", p=_HLL_P)
    exact = li.where(F.col("l_orderkey") % 6 == 0).agg(
        F.countDistinct("l_orderkey").alias("exact_intersect")
    )
    return est.crossJoin(F.broadcast(exact)).select(
        "est_a",
        "est_b",
        "est_union",
        "est_intersect",
        "exact_intersect",
        (
            F.abs(F.col("est_intersect") - F.col("exact_intersect"))
            <= 0.2 * F.col("est_union")
        ).alias("within_bound"),
    )


@query(
    "ks_price_urgent_vs_rest",
    """
    WITH a AS (SELECT o_totalprice AS x FROM orders
               WHERE o_orderpriority = '1-URGENT'),
    b AS (SELECT o_totalprice AS x FROM orders
          WHERE o_orderpriority <> '1-URGENT'),
    ca AS (SELECT x, count(*)::BIGINT AS c FROM a GROUP BY x),
    cb AS (SELECT x, count(*)::BIGINT AS c FROM b GROUP BY x),
    m AS (
      SELECT coalesce(ca.x, cb.x) AS x,
             coalesce(ca.c, 0) AS cca, coalesce(cb.c, 0) AS ccb
      FROM ca FULL OUTER JOIN cb ON ca.x = cb.x),
    cums AS (
      SELECT sum(cca) OVER (ORDER BY x ROWS BETWEEN UNBOUNDED PRECEDING
                            AND CURRENT ROW) AS cumA,
             sum(ccb) OVER (ORDER BY x ROWS BETWEEN UNBOUNDED PRECEDING
                            AND CURRENT ROW) AS cumB
      FROM m),
    tot AS (
      SELECT cumA, cumB, max(cumA) OVER () AS na, max(cumB) OVER () AS nb
      FROM cums)
    SELECT max(na)::BIGINT AS n_a, max(nb)::BIGINT AS n_b,
           max(abs(cumA * nb - cumB * na))::BIGINT AS ks_num,
           round(max(abs(cumA * nb - cumB * na))::BIGINT
                 / (max(na) * max(nb))::DOUBLE, 6) AS ks
    FROM tot
    """,
)
def q_ks_price(spark, sf_dir):
    """Exact two-sample Kolmogorov–Smirnov drift statistic
    (validate.ks_statistic) between urgent and non-urgent order price
    distributions — the numeric-column complement to
    token_drift_sources. All-integer supremum arithmetic (D's numerator
    max|cumA·n_b − cumB·n_a| is exact, division once at the end), so
    both engines agree on where the supremum lands; one shuffle per
    side to distinct-value cells, ordered window over the merged
    distinct-value table only. Quantize continuous columns first at
    unbounded cardinality (same guidance as auc_rank_sum)."""
    from parkour_spark.operators import validate as V

    orders = _t(spark, sf_dir, "orders")
    a = orders.where(F.col("o_orderpriority") == "1-URGENT").select("o_totalprice")
    b = orders.where(F.col("o_orderpriority") != "1-URGENT").select("o_totalprice")
    return V.ks_statistic(a, b, "o_totalprice")


@query(
    "bootstrap_ci_order_price",
    """
    WITH rows_x AS (
      SELECT o_orderkey AS id,
             round(o_totalprice * 1000000.0)::BIGINT AS xm
      FROM orders),
    reps AS (
      SELECT r.range AS r, xm,
             (('0x' || substr(md5(id::VARCHAR || ':' || r.range::VARCHAR),
                              1, 8))::BIGINT)::DOUBLE / 4294967296.0 AS u
      FROM rows_x CROSS JOIN range(50) r),
    ks AS (SELECT r, xm, CASE WHEN u < 0.36787944117144233 THEN 0 WHEN u < 0.7357588823428847 THEN 1 WHEN u < 0.9196986029286058 THEN 2 WHEN u < 0.9810118431238462 THEN 3 WHEN u < 0.9963401531726562 THEN 4 WHEN u < 0.9994058151824182 THEN 5 ELSE 6 END AS k FROM reps),
    ests AS (
      SELECT r, sum(k * xm)::BIGINT::DOUBLE
                / (sum(k)::BIGINT * 1000000.0) AS est
      FROM ks GROUP BY r),
    ranked AS (
      SELECT est, row_number() OVER (ORDER BY est, r) AS rk FROM ests),
    ci AS (
      SELECT max(CASE WHEN rk = 2 THEN est END) AS lo,
             max(CASE WHEN rk = 49 THEN est END) AS hi
      FROM ranked),
    pt AS (
      SELECT count(*)::BIGINT AS n,
             sum(xm)::BIGINT::DOUBLE / (count(*) * 1000000.0) AS pm
      FROM rows_x)
    SELECT n, round(pm, 6) AS point_mean, round(lo, 6) AS ci_lo,
           round(hi, 6) AS ci_hi, 50::BIGINT AS b
    FROM pt CROSS JOIN ci
    """,
)
def q_bootstrap_ci(spark, sf_dir):
    """Deterministic Poisson-bootstrap CI on the mean order price
    (validate.bootstrap_ci, Chamandy et al. 2012): per-row Poisson(1)
    replicate weights DERIVED from md5(id:replicate) through the fixed
    inverse-CDF ladder — error bars on a corpus metric in one scan with
    only b=50 partial-agg cells shuffling, replayable on any engine or
    partition layout. Rank-based CI over the replicate means (no
    interpolation); replicate means from exact integer micro-unit
    sums."""
    from parkour_spark.operators import validate as V

    orders = _t(spark, sf_dir, "orders")
    return V.bootstrap_ci(orders, "o_totalprice", "o_orderkey", b=50)


@query(
    "gopher_quality_flags",
    f"""
    WITH base AS (
      SELECT doc_id,
             list_filter(string_split_regex(trim(text), '\\s+'),
                         x -> x <> '') AS w,
             list_distinct({_TOKS_SQL}) AS lw,
             length(regexp_replace(trim(text), '\\s+', '', 'g'))::BIGINT
               AS word_chars,
             (length(text) - length(replace(text, '#', '')))::BIGINT
               + ((length(text) - length(replace(text, '...', ''))) // 3)
                 ::BIGINT AS n_symbols,
             string_split(text, chr(10)) AS lines
      FROM documents),
    m AS (
      SELECT doc_id,
             len(w)::BIGINT AS n_words,
             word_chars,
             len(list_filter(w, t -> regexp_matches(t, '[a-zA-Z]')))::BIGINT
               AS n_alpha_words,
             n_symbols,
             len(list_intersect(lw, ['the','be','to','of','and','that',
                                     'have','with']))::BIGINT AS n_stop_hits,
             len(lines)::BIGINT AS n_lines,
             len(list_filter(lines, l -> starts_with(ltrim(l), '-')
                 OR starts_with(ltrim(l), '*')
                 OR starts_with(ltrim(l), '•')))::BIGINT AS n_bullet,
             len(list_filter(lines, l -> rtrim(l) LIKE '%...'))::BIGINT
               AS n_ellipsis_end
      FROM base)
    SELECT doc_id, n_words, word_chars, n_alpha_words, n_symbols,
           n_stop_hits,
           (n_words >= 50 AND n_words <= 100000) AS ok_words,
           (3 * n_words <= word_chars AND word_chars <= 10 * n_words)
             AS ok_mean_len,
           (10 * n_symbols <= n_words) AS ok_symbols,
           (5 * n_alpha_words >= 4 * n_words) AS ok_alpha,
           (10 * n_bullet <= 9 * n_lines) AS ok_bullets,
           (10 * n_ellipsis_end <= 3 * n_lines) AS ok_ellipsis,
           (n_stop_hits >= 2) AS ok_stop,
           ((n_words >= 50 AND n_words <= 100000)
            AND (3 * n_words <= word_chars AND word_chars <= 10 * n_words)
            AND (10 * n_symbols <= n_words)
            AND (5 * n_alpha_words >= 4 * n_words)
            AND (10 * n_bullet <= 9 * n_lines)
            AND (10 * n_ellipsis_end <= 3 * n_lines)
            AND (n_stop_hits >= 2)) AS passes
    FROM m
    """,
)
def q_gopher_quality(spark, sf_dir):
    """The Gopher quality-filter rule set (Rae et al. 2021 §A1.1,
    corpus.gopher_quality): word-count band, mean-word-length band,
    symbol-to-word ratio, alphabetic-word fraction, bullet/ellipsis
    line fractions, and the 8-word stop-set rule — the standard
    pre-training heuristic filter, one scan, zero shuffles. Every
    threshold is a SCALED-INTEGER comparison (3·n ≤ chars ≤ 10·n etc.),
    so no float exists anywhere in the flags; the oracle replays every
    rule including the line splits."""
    from parkour_spark.operators.corpus import gopher_quality

    return gopher_quality(_t(spark, sf_dir, "documents"))


@query(
    "robust_outlier_profile",
    """
    WITH cells AS (
      SELECT o_orderpriority AS g, round(o_totalprice * 100)::BIGINT AS x,
             count(*)::BIGINT AS c
      FROM orders GROUP BY 1, 2),
    z AS (
      SELECT g, x,
             sum(c) OVER (PARTITION BY g ORDER BY x
                          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               AS cum,
             sum(c) OVER (PARTITION BY g) AS n
      FROM cells),
    med AS (
      SELECT g, max(n)::BIGINT AS n,
             min(CASE WHEN cum >= (n + 1) // 2 THEN x END)::BIGINT AS med
      FROM z GROUP BY g),
    dev AS (
      SELECT cells.g, abs(x - med) AS dx, sum(c)::BIGINT AS c
      FROM cells JOIN med ON cells.g = med.g GROUP BY 1, 2),
    dz AS (
      SELECT g, dx,
             sum(c) OVER (PARTITION BY g ORDER BY dx
                          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               AS cum,
             sum(c) OVER (PARTITION BY g) AS n
      FROM dev),
    mad AS (
      SELECT g, min(CASE WHEN cum >= (n + 1) // 2 THEN dx END)::BIGINT AS mad
      FROM dz GROUP BY g),
    outl AS (
      SELECT cells.g,
             sum(CASE WHEN abs(x - med) > 3 * mad THEN c ELSE 0 END)::BIGINT
               AS n_out
      FROM cells JOIN med ON cells.g = med.g JOIN mad ON cells.g = mad.g
      GROUP BY 1)
    SELECT med.g AS o_orderpriority, med.n AS n, med.med AS median,
           mad.mad AS mad, outl.n_out AS n_outliers
    FROM med JOIN mad ON med.g = mad.g JOIN outl ON med.g = outl.g
    """,
)
def q_robust_outliers(spark, sf_dir):
    """Per-priority MAD robust outlier profile (validate.mad_profile)
    on order prices in integer cents: lower median, median absolute
    deviation, and |x − med| > 3·MAD outlier counts — the
    corrupt-batch-proof complement to winsorized_price_stats (rank
    trim) and key_skew_profile (count skew). All-integer medians at
    rank ⌈(n+1)/2⌉ over per-group distinct-value cells; both engines
    agree on every median and every outlier by construction."""
    from parkour_spark.operators.validate import mad_profile

    orders = _t(spark, sf_dir, "orders").select(
        "o_orderpriority",
        F.round(F.col("o_totalprice") * 100).cast("long").alias("cents"),
    )
    return mad_profile(orders, "cents", "o_orderpriority", k=3)


_QBP_SQL = (
    f"(least(length(text) * 8, 4000)"
    f" + CASE WHEN len({_TOKS_SQL}) > 0"
    f" THEN floor(3000.0 * least(len(list_filter({_TOKS_SQL},"
    f" x -> x IN ({_STOP_SQL}))) * 10, len({_TOKS_SQL}))"
    f" / len({_TOKS_SQL})) ELSE 0 END"
    f" + CASE WHEN list_sum(list_transform({_TOKS_SQL}, t -> length(t)))::DOUBLE"
    f" / len({_TOKS_SQL}) BETWEEN 3.0 AND 10.0"
    f" THEN 3000 ELSE 0 END)::BIGINT"
)


@query(
    "dedup_keep_best",
    _dedup_groups_oracle(
        tail=f"""
    , comp AS (SELECT n AS doc_id, min(m) AS component FROM reach GROUP BY n),
    q AS (SELECT doc_id, {_QBP_SQL} AS quality_bp FROM documents),
    r AS (
      SELECT comp.doc_id, component, quality_bp,
             row_number() OVER (PARTITION BY component
                                ORDER BY quality_bp DESC, comp.doc_id) AS rk
      FROM comp JOIN q USING (doc_id))
    SELECT doc_id, component, quality_bp, (rk = 1) AS is_survivor FROM r
    """
    ),
)
def q_dedup_keep_best(spark, sf_dir):
    """Keep-BEST near-dup survivor policy (graph.dedup_survivors_by):
    MinHash-LSH pairs → connected components → survivor = the
    highest-quality_bp member per component (min-id tie break — a total
    order). The production alternative to dedup_groups' min-id policy:
    duplicate clusters keep their best-quality member, at the cost of
    one component-keyed window — no extra corpus scan. Oracle replays
    the full chain: signatures, bands, verify, recursive-CTE closure,
    quality basis points, and the argmax."""
    from parkour_spark.functions.text import quality_bp
    from parkour_spark.operators.graph import dedup_survivors_by

    docs = _t(spark, sf_dir, "documents")
    pairs = D.minhash_dedup_pairs(docs, threshold=0.8)
    scored = docs.select("doc_id", quality_bp(F.col("text")).alias("quality_bp"))
    return dedup_survivors_by(scored, pairs, "doc_id", "quality_bp")


@query(
    "corpus_shuffle_order",
    """
    SELECT doc_id,
           (row_number() OVER (
              ORDER BY md5('shuffle-v1:' || doc_id::VARCHAR), doc_id)
            - 1)::BIGINT AS shuffle_pos
    FROM documents
    """,
)
def q_shuffle_order(spark, sf_dir):
    """Deterministic global training order (corpus.shuffle_order):
    dense 0-based rank under md5(seed:id) — a reproducible
    pseudo-random permutation any engine derives identically (epoch
    reshuffle = change the seed). Spark side uses the two-phase
    matrixify rank (range-partition sort + per-partition counts +
    driver prefix-sum), never a single-partition window; the oracle's
    row_number is the semantic spec."""
    from parkour_spark.operators.corpus import shuffle_order

    return shuffle_order(_t(spark, sf_dir, "documents"))


@query(
    "token_budget_sample",
    f"""
    WITH scored AS (
      SELECT source, doc_id,
             md5('budget-v1:' || doc_id::VARCHAR) AS k,
             len({_TOKS_SQL})::BIGINT AS n_tokens
      FROM documents),
    cum AS (
      SELECT source, doc_id, n_tokens,
             sum(n_tokens) OVER (PARTITION BY source ORDER BY k, doc_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)::BIGINT
               AS cum_tokens
      FROM scored)
    SELECT source, doc_id, n_tokens, cum_tokens
    FROM cum WHERE cum_tokens <= 2000
    """,
)
def q_token_budget(spark, sf_dir):
    """Per-source token-budget subsampling (corpus.token_budget_sample):
    the maximal prefix of the deterministic md5(seed:id) order whose
    cumulative token count stays ≤ 2000 per source — "give me N tokens
    per source" with a layout-independent, re-runnable doc selection.
    Scan-side token counts; one group-keyed window shuffle."""
    from parkour_spark.operators.corpus import token_budget_sample

    return token_budget_sample(
        _t(spark, sf_dir, "documents"), budget_tokens=2000
    )


@query(
    "quality_avg_precision",
    f"""
    WITH q AS (
      SELECT doc_id, {_QBP_SQL} AS s,
             CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS y
      FROM documents),
    ranked AS (
      SELECT y, row_number() OVER (ORDER BY s DESC, doc_id) AS rk,
             sum(y) OVER (ORDER BY s DESC, doc_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
      FROM q),
    t AS (SELECT sum(CASE WHEN y = 1
                          THEN (1000000 * cum) // rk ELSE 0 END)::BIGINT
            AS ap_micro_sum
          FROM ranked),
    a AS (SELECT sum(y)::BIGINT AS n_pos, count(*)::BIGINT AS n FROM ranked)
    SELECT n_pos, n, ap_micro_sum,
           round(ap_micro_sum / (n_pos * 1000000)::DOUBLE, 6) AS ap
    FROM a CROSS JOIN t
    """,
)
def q_avg_precision(spark, sf_dir):
    """Exact average precision of the quality score predicting
    lang='en' (validate.average_precision) — the PR-side evaluation
    complement to quality_auc_langid: AP penalizes false positives at
    the top of the ranking, which ROC AUC hides on imbalanced corpora.
    Deterministic (score desc, doc_id) total order; every per-position
    term is the integer (10⁶·cum_pos) div rank, so the sum is
    order-independent and engine-exact. Runs on evaluation slices by
    design (one global sort window — see docstring)."""
    from parkour_spark.functions.text import quality_bp
    from parkour_spark.operators.validate import average_precision

    docs = _t(spark, sf_dir, "documents").select(
        "doc_id",
        quality_bp(F.col("text")).alias("s"),
        (F.col("lang") == "en").cast("int").alias("y"),
    )
    return average_precision(docs, "s", "y", "doc_id")


@query(
    "mutual_knn_components",
    f"""
    WITH RECURSIVE e AS (SELECT vec_id, embedding FROM embeddings),
    scored AS (
      SELECT a.vec_id AS q, b.vec_id AS n,
             round({_cos_sql('a.embedding', 'b.embedding')}, 4) AS cos
      FROM e a JOIN e b ON a.vec_id <> b.vec_id),
    topk AS (
      SELECT q, n, cos FROM (
        SELECT *, row_number() OVER (PARTITION BY q
                                     ORDER BY cos DESC, n) AS rk
        FROM scored)
      WHERE rk <= 5),
    mut AS (
      SELECT t1.q AS id_a, t1.n AS id_b
      FROM topk t1 JOIN topk t2 ON t1.q = t2.n AND t1.n = t2.q
      WHERE t1.q < t1.n),
    edges AS (SELECT id_a AS a, id_b AS b FROM mut
              UNION SELECT id_b, id_a FROM mut),
    reach(x, m) AS (
      SELECT vec_id, vec_id FROM embeddings
      UNION
      SELECT r.x, ed.b FROM reach r JOIN edges ed ON r.m = ed.a
    )
    SELECT x AS vec_id, min(m) AS component,
           (x = min(m)) AS is_rep
    FROM reach GROUP BY x
    """,
)
def q_mutual_knn(spark, sf_dir):
    """Mutual-kNN clustering (similarity.mutual_knn_edges →
    graph.connected_components): a pair is an edge iff EACH vector is
    in the other's cosine top-5 (the symmetric requirement prunes
    non-reciprocating hub vectors), then components give the semantic
    clusters. Exact top-k here is the eval-scale baseline (all-pairs);
    at corpus scale the top-k stage swaps for the IVF probe while the
    mutual join and closure — both top-k-output-sized — are unchanged.
    Oracle replays scoring, ranking, the mutual join, and the
    recursive closure."""
    from parkour_spark.operators.graph import connected_components
    from parkour_spark.operators.similarity import mutual_knn_edges

    emb = _t(spark, sf_dir, "embeddings")
    edges = mutual_knn_edges(emb, k=5)
    cc = connected_components(emb.select("vec_id"), edges, node_col="vec_id")
    return cc.select(
        F.col("n").alias("vec_id"),
        "component",
        (F.col("n") == F.col("component")).alias("is_rep"),
    )


@query(
    "token_entropy_profile",
    f"""
    WITH t AS (SELECT doc_id, {_TOKS_SQL} AS toks FROM documents),
    ex AS (SELECT doc_id, len(toks)::BIGINT AS n, unnest(toks) AS tok FROM t),
    c AS (SELECT doc_id, n, tok, count(*)::BIGINT AS c
          FROM ex GROUP BY 1, 2, 3),
    e AS (SELECT doc_id,
                 sum(round(1000000.0 * c / n * ln(n::DOUBLE / c))::BIGINT)
                   ::BIGINT AS entropy_micro_nats
          FROM c GROUP BY doc_id)
    SELECT t.doc_id, len(t.toks)::BIGINT AS n_tokens,
           coalesce(e.entropy_micro_nats, 0)::BIGINT AS entropy_micro_nats
    FROM t LEFT JOIN e USING (doc_id)
    """,
)
def q_token_entropy(spark, sf_dir):
    """Per-doc token-distribution Shannon entropy in integer micro-nats
    (functions.text.token_entropy_micronats): the degenerate-text /
    keyword-stuffing signal that count ratios miss. ZERO shuffle — the
    per-token counts are run lengths in the sorted token array, so the
    whole statistic is a scan-side Column fold (the oracle states the
    same sum relationally); per-term integer rounding makes the sum
    order-independent and engine-exact."""
    from parkour_spark.functions.text import token_entropy_micronats, tokens

    docs = _t(spark, sf_dir, "documents")
    toks = tokens(F.lower(F.col("text")))
    return docs.select(
        "doc_id",
        F.size(toks).cast("long").alias("n_tokens"),
        token_entropy_micronats(toks).alias("entropy_micro_nats"),
    )


@query(
    "event_rate_spikes",
    """
    WITH hourly AS (
      SELECT event_type AS g, date_trunc('hour', ts) AS h,
             count(*)::BIGINT AS x
      FROM events GROUP BY 1, 2),
    cells AS (SELECT g, x, count(*)::BIGINT AS c FROM hourly GROUP BY 1, 2),
    z AS (
      SELECT g, x,
             sum(c) OVER (PARTITION BY g ORDER BY x
                          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               AS cum,
             sum(c) OVER (PARTITION BY g) AS n
      FROM cells),
    med AS (
      SELECT g, max(n)::BIGINT AS n,
             min(CASE WHEN cum >= (n + 1) // 2 THEN x END)::BIGINT AS med
      FROM z GROUP BY g),
    dev AS (
      SELECT cells.g, abs(x - med) AS dx, sum(c)::BIGINT AS c
      FROM cells JOIN med ON cells.g = med.g GROUP BY 1, 2),
    dz AS (
      SELECT g, dx,
             sum(c) OVER (PARTITION BY g ORDER BY dx
                          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               AS cum,
             sum(c) OVER (PARTITION BY g) AS n
      FROM dev),
    mad AS (
      SELECT g, min(CASE WHEN cum >= (n + 1) // 2 THEN dx END)::BIGINT AS mad
      FROM dz GROUP BY g),
    outl AS (
      SELECT cells.g,
             sum(CASE WHEN abs(x - med) > 3 * mad THEN c ELSE 0 END)::BIGINT
               AS n_out
      FROM cells JOIN med ON cells.g = med.g JOIN mad ON cells.g = mad.g
      GROUP BY 1)
    SELECT med.g AS event_type, med.n AS n, med.med AS median,
           mad.mad AS mad, outl.n_out AS n_outliers
    FROM med JOIN mad ON med.g = mad.g JOIN outl ON med.g = outl.g
    """,
)
def q_event_rate_spikes(spark, sf_dir):
    """Ingest-rate spike detection (validate.mad_profile over hourly
    event counts, per event_type): hours whose count deviates more
    than 3·MAD from the per-type median hourly rate — the robust
    monitor that a spike itself cannot drag (a mean/σ detector's
    threshold inflates with the anomaly it is hunting). Pure
    composition: the tumbling-window count feeds the same all-integer
    distinct-cell median machinery as robust_outlier_profile; the
    hourly-count table is already tiny, so every downstream pass is
    cells-sized."""
    from parkour_spark.operators.validate import mad_profile

    ev = _t(spark, sf_dir, "events")
    hourly = ev.groupBy(
        F.col("event_type"), F.date_trunc("hour", "ts").alias("h")
    ).agg(F.count("*").alias("cnt"))
    return mad_profile(hourly, "cnt", "event_type", k=3)


# shared by the two Naive Bayes entries: hashed-unigram occurrence +
# the full label × bucket smoothed log-likelihood grid (mirrors
# operators.classify.nb_train at n_buckets=256, alpha=1 on `lang`)
_NB_MODEL_CTES = f"""
    tr AS (SELECT lang AS label,
                  ('0x' || substr(md5(tok), 1, 8))::BIGINT % 256 AS bucket
           FROM (SELECT lang, unnest({_TOKS_SQL}) AS tok FROM documents)),
    nbc AS (SELECT label, bucket, count(*)::BIGINT AS cnt
            FROM tr GROUP BY 1, 2),
    nbt AS (SELECT label, sum(cnt)::BIGINT AS n_tok FROM nbc GROUP BY 1),
    nbgrid AS (SELECT nbt.label, nbt.n_tok, r.range::BIGINT AS bucket
               FROM nbt, range(256) r),
    nbmodel AS (
      SELECT g.label, g.bucket, coalesce(nbc.cnt, 0)::BIGINT AS cnt,
             round(ln((coalesce(nbc.cnt, 0) + 1)::DOUBLE / (g.n_tok + 256))
                   * 1000000.0)::BIGINT AS ll_micro
      FROM nbgrid g LEFT JOIN nbc
        ON g.label = nbc.label AND g.bucket = nbc.bucket)
"""


@query(
    "nb_lang_model",
    f"""
    WITH {_NB_MODEL_CTES}
    SELECT label, bucket, cnt, ll_micro FROM nbmodel
    """,
)
def q_nb_lang_model(spark, sf_dir):
    """Multinomial Naive Bayes TRAIN over hashed unigrams
    (operators.classify.nb_train): the fastText-style learned
    quality/domain classifier slot of a data pipeline, here fit on the
    `lang` label. The model is the FULL label × 256-bucket grid of
    smoothed log-likelihoods in integer micro-nats — labels × n_buckets
    rows NO MATTER the corpus size (the hashing trick bounds the
    feature space; the vocabulary never drives a shuffle), so it
    broadcasts into any scoring pass. Oracle replays tokenize → bucket
    hash → counts → grid → add-1-smoothed ln cells."""
    from parkour_spark.operators.classify import nb_train

    docs = _t(spark, sf_dir, "documents")
    model, _ = nb_train(docs, "lang", n_buckets=256, alpha=1)
    return model


@query(
    "nb_lang_scores",
    f"""
    WITH {_NB_MODEL_CTES},
    nbocc AS (SELECT doc_id,
                     ('0x' || substr(md5(tok), 1, 8))::BIGINT % 256 AS bucket
              FROM (SELECT doc_id, unnest({_TOKS_SQL}) AS tok
                    FROM documents)),
    nbdb AS (SELECT doc_id, bucket, count(*)::BIGINT AS c
             FROM nbocc GROUP BY 1, 2),
    nbpri0 AS (SELECT lang AS label, count(*)::BIGINT AS n_docs
               FROM documents GROUP BY 1),
    nbpri AS (SELECT label,
                     round(ln(n_docs::DOUBLE / (SELECT sum(n_docs)
                                                FROM nbpri0))
                           * 1000000.0)::BIGINT AS prior_micro
              FROM nbpri0),
    nbper AS (SELECT nbdb.doc_id, m.label,
                     sum(nbdb.c * m.ll_micro)::BIGINT AS s
              FROM nbdb JOIN nbmodel m USING (bucket) GROUP BY 1, 2),
    nbbase AS (SELECT d.doc_id, p.label, p.prior_micro
               FROM (SELECT doc_id FROM documents) d, nbpri p),
    nbsc AS (SELECT b.doc_id, b.label,
                    (b.prior_micro + coalesce(nbper.s, 0))::BIGINT
                      AS score_micro
             FROM nbbase b LEFT JOIN nbper
               ON b.doc_id = nbper.doc_id AND b.label = nbper.label),
    nbr AS (SELECT doc_id, label, score_micro,
                   row_number() OVER (PARTITION BY doc_id
                                      ORDER BY score_micro DESC, label)
                     AS rn
            FROM nbsc)
    SELECT doc_id, label AS pred_label, score_micro FROM nbr WHERE rn = 1
    """,
)
def q_nb_lang_scores(spark, sf_dir):
    """Multinomial Naive Bayes SCORE (operators.classify.nb_score):
    every document classified against the lang model trained by
    nb_lang_model — argmax label under the total order (score desc,
    label asc) plus its integer micro-nat log-posterior, so the
    prediction is deterministic and engine-exact (per-cell micro-nat
    rounding BEFORE the additive aggregates; zero-token docs score on
    the prior alone). SCALE: the model broadcasts; the corpus explode
    collapses scan-side to per-doc bucket counts; the only corpus-keyed
    exchanges are two partial aggs and the doc-keyed argmax window.
    Train and score share the corpus here (the gate checks the
    computation, not generalization — same honesty note as
    quality_auc_langid)."""
    from parkour_spark.operators.classify import nb_score, nb_train

    docs = _t(spark, sf_dir, "documents")
    model, priors = nb_train(docs, "lang", n_buckets=256, alpha=1)
    return nb_score(docs, model, priors, n_buckets=256)


@query(
    "per_source_top_percent",
    f"""
    WITH q AS (SELECT source, doc_id, {_QBP_SQL} AS quality_bp
               FROM documents),
    r AS (SELECT source, doc_id, quality_bp,
                 row_number() OVER (PARTITION BY source
                                    ORDER BY quality_bp DESC, doc_id)
                   ::BIGINT AS rk,
                 count(*) OVER (PARTITION BY source)::BIGINT AS n
          FROM q)
    SELECT source, doc_id, quality_bp, rk, n
    FROM r WHERE rk * 5 <= n * 1 + 4
    """,
)
def q_per_source_top_percent(spark, sf_dir):
    """Per-source adaptive top-20% quality filter
    (corpus.top_percent_by): keep the best ceil(n/5) docs of EACH
    source by (quality_bp desc, doc_id) — the CCNet-style per-bucket
    relative cut, the complement to per_source_quota's absolute cap.
    The threshold is the RATIONAL 1/5 applied in integer arithmetic
    (kept ⟺ rk·5 ≤ n·1 + 4), so every ceil boundary is engine-exact —
    no float percentile anywhere. One source-keyed window shuffle;
    rank and group count share the partitioning."""
    from parkour_spark.functions.text import quality_bp
    from parkour_spark.operators.corpus import top_percent_by

    docs = _t(spark, sf_dir, "documents").select(
        "source", "doc_id", quality_bp(F.col("text")).alias("quality_bp")
    )
    return top_percent_by(
        docs, "source", "quality_bp", "doc_id", p_num=1, p_den=5
    )


@query(
    "source_overlap_matrix",
    f"""
    WITH sh AS (SELECT source AS g, unnest({_SHINGLES_SQL}) AS s
                FROM documents),
    g1 AS (SELECT DISTINCT g,
                  ('0x' || substr(md5(s), 1, 8))::BIGINT AS gram
           FROM sh),
    dfc AS (SELECT gram FROM g1 GROUP BY gram HAVING count(*) <= 15),
    g2 AS (SELECT g1.g, g1.gram FROM g1 JOIN dfc USING (gram)),
    tot AS (SELECT g, count(*)::BIGINT AS n_grams FROM g2 GROUP BY g),
    p AS (SELECT a.g AS src_a, b.g AS src_b, count(*)::BIGINT AS shared
          FROM g2 a JOIN g2 b ON a.gram = b.gram AND a.g < b.g
          GROUP BY 1, 2)
    SELECT p.src_a, p.src_b, p.shared, ta.n_grams AS n_a,
           tb.n_grams AS n_b
    FROM p JOIN tot ta ON p.src_a = ta.g JOIN tot tb ON p.src_b = tb.g
    """,
)
def q_source_overlap_matrix(spark, sf_dir):
    """Cross-source contamination matrix (corpus.source_overlap): for
    every source pair, the count of distinct 3-token shingles present
    in both, plus each side's distinct total (Jaccard is one division
    away; output stays all-integer and engine-exact). The "which
    sources share boilerplate / leaked content" diagnostic behind
    mixture design and dedup triage. The max_groups_per_gram=15 cap is
    the df-cap analog: shingles in >15 of the 20 sources are universal
    boilerplate that says nothing about PAIRWISE contamination, and
    dropping them bounds per-gram join fanout. SCALE: text collapses
    scan-side to distinct (source, gram32) — the corpus never shuffles
    its text; the gram-keyed self-join fans out at most groups² per
    gram."""
    from parkour_spark.operators.corpus import source_overlap

    docs = _t(spark, sf_dir, "documents")
    return source_overlap(docs, k=3, max_groups_per_gram=15)


@query(
    "time_weighted_value_user",
    """
    WITH s AS (SELECT user_id, event_id, epoch_us(ts)::BIGINT AS us,
                      round(value * 100)::BIGINT AS vc
               FROM events),
    d AS (SELECT user_id, us, vc,
                 lead(us) OVER (PARTITION BY user_id
                                ORDER BY us, event_id) - us AS dur
          FROM s)
    SELECT user_id, count(*)::BIGINT AS n_events,
           coalesce(sum(dur), 0)::BIGINT AS held_us,
           coalesce(sum(vc * dur), 0)::BIGINT AS vsum_centi_us,
           CASE WHEN coalesce(sum(dur), 0) > 0
                THEN coalesce(sum(vc * dur), 0)::DOUBLE
                     / coalesce(sum(dur), 0)
           END AS twa_centi
    FROM d GROUP BY user_id
    """,
)
def q_time_weighted_value(spark, sf_dir):
    """Per-user time-weighted average of a last-observation-held value
    (behavior.time_weighted_value — TWAP/metering semantics): each
    event's value held until the user's next event, the final event
    holding nothing. Exact integer arithmetic end-to-end: epoch MICROS
    (no epoch()-double rounding), per-row centi-unit values rounded
    BEFORE the multiply, order-independent integer sums, one IEEE
    division at the end; interval order is the total order (ts,
    event_id). SCALE: ONE user-keyed shuffle (the lead window) feeding
    a partial aggregate — nothing downstream exceeds the user
    dimension."""
    from parkour_spark.operators.behavior import time_weighted_value

    return time_weighted_value(_t(spark, sf_dir, "events"))


@query(
    "rrf_hybrid_retrieval",
    f"""
    WITH base AS (
      SELECT doc_id, len({_TOKS_SQL})::BIGINT AS dl,
             unnest({_TOKS_SQL}) AS term
      FROM documents),
    tf AS (SELECT doc_id, dl, term, count(*) AS tf FROM base
           WHERE term IN ('hash', 'join', 'scan') GROUP BY doc_id, dl, term),
    wdf AS (SELECT *, count(*) OVER (PARTITION BY term) AS df FROM tf),
    tot AS (SELECT count(*) AS n_docs,
                   (SELECT sum(len({_TOKS_SQL}))::BIGINT FROM documents)
                     AS n_total
            FROM documents),
    bm_sc AS (
      SELECT doc_id,
             sum(round(ln(1 + (n_docs - df + 0.5) / (df + 0.5))
                   * ((tf * 2.2) / (tf + 1.2 * (0.25 + 0.75 * dl
                        / (n_total::DOUBLE / n_docs)))) * 1e6)::BIGINT)
               ::BIGINT AS score_micro
      FROM wdf, tot GROUP BY doc_id),
    bm AS (SELECT doc_id,
                  row_number() OVER (ORDER BY score_micro DESC, doc_id)
                    ::BIGINT AS rank
           FROM bm_sc QUALIFY rank <= 20),
    terms AS (SELECT doc_id, unnest({_TOKS_SQL}) AS term FROM documents),
    dimmed AS (SELECT doc_id,
                      ('0x' || substr(md5(term), 1, 8))::BIGINT % 64 AS dim
               FROM terms),
    counts AS (SELECT doc_id, dim, count(*) AS cnt FROM dimmed
               GROUP BY 1, 2),
    grid AS (SELECT d.doc_id, r.dim FROM (SELECT doc_id FROM documents) d,
             (SELECT unnest(range(0, 64)) AS dim) r),
    filled AS (SELECT g.doc_id, g.dim, coalesce(c.cnt, 0)::DOUBLE AS v
               FROM grid g LEFT JOIN counts c USING (doc_id, dim)),
    vecs AS (SELECT doc_id, list(v ORDER BY dim) AS vec FROM filled
             GROUP BY doc_id),
    qterms AS (SELECT unnest(['hash', 'join', 'scan']) AS term),
    qdim AS (SELECT ('0x' || substr(md5(term), 1, 8))::BIGINT % 64 AS dim,
                    count(*)::DOUBLE AS c
             FROM qterms GROUP BY 1),
    qfill AS (SELECT r.dim, coalesce(q.c, 0) AS c
              FROM (SELECT unnest(range(0, 64)) AS dim) r
              LEFT JOIN qdim q USING (dim)),
    qvec AS (SELECT list(c ORDER BY dim) AS qv FROM qfill),
    vsc AS (SELECT doc_id, round({_cos_sql('vec', 'qv')}, 4) AS cos
            FROM vecs, qvec),
    vr AS (SELECT doc_id,
                  row_number() OVER (ORDER BY cos DESC, doc_id)::BIGINT
                    AS rank
           FROM vsc QUALIFY rank <= 20),
    fused AS (
      SELECT doc_id, count(*)::BIGINT AS n_systems,
             sum(round(1000000000.0 / (60 + rank))::BIGINT)::BIGINT
               AS rrf_nano
      FROM (SELECT * FROM bm UNION ALL SELECT * FROM vr)
      GROUP BY doc_id)
    SELECT doc_id, n_systems, rrf_nano,
           row_number() OVER (ORDER BY rrf_nano DESC, doc_id)::BIGINT
             AS fused_rank
    FROM fused QUALIFY fused_rank <= 10
    """,
)
def q_rrf_hybrid(spark, sf_dir):
    """Hybrid retrieval via reciprocal-rank fusion
    (similarity.rrf_fuse, Cormack et al. 2009): BM25 top-20 for the
    literal query terms fused with dense top-20 cosine over the
    feature-hashed doc vectors (the same model-free vectors as
    hashed_doc_knn; the query embeds by hashing its own terms) —
    score(d) = Σ 1/(60 + rank_s(d)) in integer nano-units, argsorted
    under (rrf_nano desc, doc_id). The standard lexical+dense
    hybrid-search combiner, consuming only RANKS so incomparable score
    scales cannot skew the blend. SCALE: both retrievers do the corpus
    work; everything downstream of them is Σk rows. Oracle replays
    both retrieval chains and the fusion end-to-end."""
    import hashlib

    from parkour_spark.operators.similarity import rrf_fuse

    docs = _t(spark, sf_dir, "documents")
    bm = C.bm25_topk(docs, _BM25_TERMS, k=20)
    bm_ranked = bm.select(
        "doc_id",
        F.row_number()
        .over(Window.orderBy(F.col("score_micro").desc(), F.col("doc_id")))
        .alias("rank"),
    )
    buckets: dict[int, float] = {}
    for t in _BM25_TERMS:
        d = int(hashlib.md5(t.encode()).hexdigest()[:8], 16) % 64
        buckets[d] = buckets.get(d, 0.0) + 1.0
    qvec = [buckets.get(d, 0.0) for d in range(64)]
    queries = spark.createDataFrame(
        [(0, qvec)], "query_id long, query_vec array<double>"
    )
    vecs = C.hashed_doc_vectors(docs, dims=64)
    vr = SIM.brute_force_topk(
        vecs, queries, k=20, corpus_id="doc_id", corpus_vec="vec"
    ).select("doc_id", "rank")
    return rrf_fuse(
        {"bm25": bm_ranked, "dense": vr}, id_col="doc_id", topk=10
    )


@query(
    "embedding_label_outliers",
    """
    WITH el AS (SELECT label, vec_id,
                       generate_subscripts(embedding, 1) AS pos,
                       unnest(CAST(embedding AS DOUBLE[])) AS v
                FROM embeddings),
    qm AS (SELECT label, vec_id, pos, floor(v * 1000000.0)::BIGINT AS qm
           FROM el),
    s AS (SELECT label, pos, sum(qm)::BIGINT AS sum_micro,
                 count(*)::BIGINT AS n
          FROM qm GROUP BY 1, 2),
    c AS (SELECT label, pos,
                 round(sum_micro::DOUBLE / n)::BIGINT AS cm
          FROM s),
    d AS (SELECT qm.label, qm.vec_id,
                 sum((qm.qm - c.cm) * (qm.qm - c.cm))::BIGINT AS d2
          FROM qm JOIN c ON qm.label = c.label AND qm.pos = c.pos
          GROUP BY 1, 2),
    hourly AS (SELECT label AS g, (d2 // 100000000)::BIGINT AS x FROM d),
    cells AS (SELECT g, x, count(*)::BIGINT AS c FROM hourly GROUP BY 1, 2),
    z AS (
      SELECT g, x,
             sum(c) OVER (PARTITION BY g ORDER BY x
                          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               AS cum,
             sum(c) OVER (PARTITION BY g) AS n
      FROM cells),
    med AS (
      SELECT g, max(n)::BIGINT AS n,
             min(CASE WHEN cum >= (n + 1) // 2 THEN x END)::BIGINT AS med
      FROM z GROUP BY g),
    dev AS (
      SELECT cells.g, abs(x - med) AS dx, sum(c)::BIGINT AS c
      FROM cells JOIN med ON cells.g = med.g GROUP BY 1, 2),
    dz AS (
      SELECT g, dx,
             sum(c) OVER (PARTITION BY g ORDER BY dx
                          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               AS cum,
             sum(c) OVER (PARTITION BY g) AS n
      FROM dev),
    mad AS (
      SELECT g, min(CASE WHEN cum >= (n + 1) // 2 THEN dx END)::BIGINT AS mad
      FROM dz GROUP BY g),
    outl AS (
      SELECT cells.g,
             sum(CASE WHEN abs(x - med) > 3 * mad THEN c ELSE 0 END)::BIGINT
               AS n_out
      FROM cells JOIN med ON cells.g = med.g JOIN mad ON cells.g = mad.g
      GROUP BY 1)
    SELECT med.g AS label, med.n AS n, med.med AS median,
           mad.mad AS mad, outl.n_out AS n_outliers
    FROM med JOIN mad ON med.g = mad.g JOIN outl ON med.g = outl.g
    """,
)
def q_embedding_label_outliers(spark, sf_dir):
    """Per-label embedding outlier profile — the mislabeled-point /
    corrupt-vector detector: distance of every embedding to its OWN
    label centroid, robust-profiled per label (kmeans.grouped_centroids
    → integer scaled distances → validate.mad_profile). Exactness
    chain: per-element floor(v·1e6) micro-units, integer-exact centroid
    sufficient statistics, micro-unit centroid via ONE rounded
    division, then d2 = Σ(q−c)² and the all-integer MAD machinery over
    d2 div 1e8 (quantized so the distinct-cell table stays bounded —
    the ks_statistic/auc guidance applied to distances). SCALE: one
    posexplode partial-agg for the sums (labels × dims cells), the
    centroid table broadcasts, the per-vec distance is one (label,
    vec) partial agg, and MAD windows over distance cells only."""
    from parkour_spark.operators.kmeans import grouped_centroids
    from parkour_spark.operators.validate import mad_profile

    emb = _t(spark, sf_dir, "embeddings")
    sums = grouped_centroids(emb, "label", "embedding")
    cents = sums.select(
        F.col("grp").alias("label"),
        "pos",
        F.round(F.col("sum_micro").cast("double") / F.col("n"))
        .cast("long")
        .alias("cm"),
    )
    qm = emb.select(
        "label",
        "vec_id",
        F.posexplode(
            F.expr("transform(embedding, x -> cast(x as double))")
        ).alias("pos", "v"),
    ).select(
        "label",
        "vec_id",
        "pos",
        F.floor(F.col("v") * 1e6).cast("long").alias("qm"),
    )
    d = (
        qm.join(F.broadcast(cents), ["label", "pos"])
        .groupBy("label", "vec_id")
        .agg(
            F.sum((F.col("qm") - F.col("cm")) * (F.col("qm") - F.col("cm")))
            .alias("d2")
        )
    )
    x = d.select("label", F.expr("d2 div 100000000").alias("dist_q"))
    return mad_profile(x, "dist_q", "label", k=3)


@query(
    "interleaved_training_order",
    """
    WITH g AS (SELECT source,
                      (row_number() OVER (ORDER BY source) - 1)::BIGINT
                        AS group_rank
               FROM (SELECT DISTINCT source FROM documents)),
    ng AS (SELECT count(*)::BIGINT AS n FROM g),
    p AS (SELECT doc_id, source,
                 (row_number() OVER (
                    PARTITION BY source
                    ORDER BY md5('interleave-v1:' || doc_id::VARCHAR),
                             doc_id) - 1)::BIGINT AS pos_in_group
          FROM documents)
    SELECT p.doc_id, p.source, p.pos_in_group, g.group_rank,
           (p.pos_in_group * ng.n + g.group_rank)::BIGINT AS order_key
    FROM p JOIN g USING (source), ng
    """,
)
def q_interleaved_order(spark, sf_dir):
    """Mixture-balanced epoch construction (corpus.interleave_by_group):
    round-robin interleave across sources — position i of EVERY source
    orders before position i+1 of any source, so no source clumps
    anywhere in the training stream; within a source the order is
    md5(seed:id) (epoch reshuffle = new seed). The order key is
    ARITHMETIC (pos·n_groups + group_rank): one source-keyed window +
    a broadcast groups table — no global sort anywhere (shuffle_order
    is the dense-rank alternative when 0..n−1 is the contract)."""
    from parkour_spark.operators.corpus import interleave_by_group

    docs = _t(spark, sf_dir, "documents").select("doc_id", "source")
    return interleave_by_group(docs).select(
        "doc_id", "source", "pos_in_group", "group_rank", "order_key"
    )


@query(
    "dedup_impact_by_source",
    _dedup_groups_oracle(
        tail="""
    , comp AS (SELECT n AS doc_id, min(m) AS component FROM reach GROUP BY n),
    csize AS (SELECT component, count(*)::BIGINT AS sz
              FROM comp GROUP BY component),
    j AS (SELECT d.source, d.n_chars, comp.doc_id, comp.component, csize.sz
          FROM comp JOIN documents d USING (doc_id)
          JOIN csize USING (component))
    SELECT source,
           count(*)::BIGINT AS n_docs,
           sum(CASE WHEN sz > 1 THEN 1 ELSE 0 END)::BIGINT AS n_dup_docs,
           sum(CASE WHEN doc_id <> component THEN 1 ELSE 0 END)::BIGINT
             AS n_removed,
           sum(CASE WHEN doc_id <> component THEN n_chars ELSE 0 END)
             ::BIGINT AS chars_removed
    FROM j GROUP BY source
    """
    ),
)
def q_dedup_impact(spark, sf_dir):
    """Dedup impact report (the audit table a dedup run ships with):
    per source — docs, docs in any near-dup cluster, docs a keep-first
    policy removes (non-minimum members), and the chars that removal
    reclaims. Pure composition over the MinHash-LSH pair graph and its
    connected components (min-id survivor = the component id itself),
    joined back to scan-side source/n_chars; cluster sizes come from a
    component-keyed aggregate, never a corpus re-scan. Oracle replays
    the full chain: signatures → bands → verify → recursive closure →
    sizes → per-source rollup."""
    from parkour_spark.operators.graph import connected_components

    docs = _t(spark, sf_dir, "documents")
    pairs = D.minhash_dedup_pairs(docs, threshold=0.8)
    cc = connected_components(
        docs.select("doc_id"), pairs, node_col="doc_id"
    ).select(F.col("n").alias("doc_id"), "component")
    csize = cc.groupBy("component").agg(F.count("*").alias("sz"))
    j = (
        cc.join(csize, "component")
        .join(docs.select("doc_id", "source", "n_chars"), "doc_id")
    )
    return j.groupBy("source").agg(
        F.count("*").cast("long").alias("n_docs"),
        F.sum(F.when(F.col("sz") > 1, 1).otherwise(0))
        .cast("long")
        .alias("n_dup_docs"),
        F.sum(F.when(F.col("doc_id") != F.col("component"), 1).otherwise(0))
        .cast("long")
        .alias("n_removed"),
        F.sum(
            F.when(
                F.col("doc_id") != F.col("component"), F.col("n_chars")
            ).otherwise(0)
        )
        .cast("long")
        .alias("chars_removed"),
    )


@query(
    "token_budget_waterfill",
    f"""
    WITH c AS (SELECT source, sum(len({_TOKS_SQL}))::BIGINT AS n
               FROM documents GROUP BY source),
    t AS (SELECT count(*)::BIGINT AS s, sum(n)::BIGINT AS total,
                 max(n)::BIGINT AS nmax
          FROM c),
    b AS (SELECT s, total, nmax, (total * 1) // 3 AS b FROM t),
    w AS (SELECT source, n,
                 row_number() OVER (ORDER BY n, source)::BIGINT AS r,
                 sum(n) OVER (ORDER BY n, source
                              ROWS BETWEEN UNBOUNDED PRECEDING
                              AND CURRENT ROW)::BIGINT AS p
          FROM c),
    f AS (SELECT w.*, b.s, b.b,
                 CASE WHEN (p - n) + (s - r + 1) * n <= b
                      THEN 1 ELSE 0 END AS ok
          FROM w, b),
    agg AS (SELECT sum(ok)::BIGINT AS k,
                   coalesce(max(CASE WHEN ok = 1 THEN p END), 0)::BIGINT
                     AS pk
            FROM f),
    lvl AS (SELECT CASE WHEN agg.k >= b.s THEN b.nmax
                        ELSE (b.b - agg.pk) // (b.s - agg.k)
                   END::BIGINT AS tau
            FROM agg, b)
    SELECT c.source, c.n AS n_tokens,
           least(c.n, lvl.tau)::BIGINT AS allocated
    FROM c, lvl
    """,
)
def q_waterfill(spark, sf_dir):
    """Water-filling token-budget allocation
    (corpus.water_filling_allocation) at budget = 1/3 of total corpus
    tokens: the max-min-fair per-source cap — small sources keep
    everything, over-represented sources are cut at the common water
    line τ. All-integer: feasibility of each level is monotone, so
    k* = a conditional count, τ = one integer division, every boundary
    engine-exact. SCALE: one corpus partial-agg scan produces the
    groups table; every window and aggregate after that is
    groups-sized. Feeds quota_cap / token_budget_sample as the
    per-source budget input."""
    from parkour_spark.operators.corpus import water_filling_allocation

    docs = _t(spark, sf_dir, "documents")
    counts = docs.groupBy("source").agg(
        F.sum(token_count(F.col("text"))).cast("long").alias("n_tokens")
    )
    return water_filling_allocation(counts, budget_num=1, budget_den=3)


@query(
    "fd_violation_report",
    """
    WITH cells AS (SELECT source, lang, count(*)::BIGINT AS c
                   FROM documents GROUP BY 1, 2),
    r AS (SELECT source, lang, c,
                 row_number() OVER (PARTITION BY source
                                    ORDER BY c DESC, lang) AS rn,
                 sum(c) OVER (PARTITION BY source)::BIGINT AS n
          FROM cells)
    SELECT source, n, lang AS majority_rhs, c AS n_majority,
           (n - c)::BIGINT AS n_violations
    FROM r WHERE rn = 1
    """,
)
def q_fd_violations(spark, sf_dir):
    """Approximate-FD violation report (validate.fd_violations) for
    source → lang: per source, the majority language, its support, and
    the deviating rows — the schema-drift / ingest-corruption triage
    table (an exact dependency reads n_violations = 0 everywhere).
    SCALE: rows partial-agg to distinct (lhs, rhs) cells in ONE
    shuffle; majority pick and per-lhs total share a single cell-table
    window."""
    from parkour_spark.operators.validate import fd_violations

    return fd_violations(_t(spark, sf_dir, "documents"), "source", "lang")


@query(
    "benford_price_profile",
    """
    WITH v AS (SELECT round(o_totalprice * 100)::BIGINT AS v
               FROM orders),
    d AS (SELECT substr(v::VARCHAR, 1, 1)::BIGINT AS digit
          FROM v WHERE v > 0),
    obs AS (SELECT digit, count(*)::BIGINT AS n_obs FROM d GROUP BY digit),
    t AS (SELECT sum(n_obs)::BIGINT AS t FROM obs)
    SELECT digit, n_obs,
           round(t * log10(1.0 + 1.0 / digit) * 1000000.0)::BIGINT
             AS expected_micro
    FROM obs, t
    """,
)
def q_benford(spark, sf_dir):
    """Benford first-digit profile (validate.benford_profile) over
    order totals — the fabricated-data / unit-corruption screen.
    Leading digit comes from the INTEGER cent value's decimal
    rendering (integer-to-string is exact in every engine; float
    log10 at powers of ten is not); the expected Benford count ships
    as integer micro-rows next to the observed count. One scan + one
    9-cell aggregate."""
    from parkour_spark.operators.validate import benford_profile

    return benford_profile(_t(spark, sf_dir, "orders"), "o_totalprice")


@query(
    "streaming_time_weighted",
    """
    WITH s AS (SELECT user_id, event_id, epoch_us(ts)::BIGINT AS us,
                      round(value * 100)::BIGINT AS vc
               FROM events),
    d AS (SELECT user_id, us, vc,
                 lead(us) OVER (PARTITION BY user_id
                                ORDER BY us, event_id) - us AS dur
          FROM s)
    SELECT user_id, count(*)::BIGINT AS n_events,
           coalesce(sum(dur), 0)::BIGINT AS held_us,
           coalesce(sum(vc * dur), 0)::BIGINT AS vsum_centi_us,
           CASE WHEN coalesce(sum(dur), 0) > 0
                THEN coalesce(sum(vc * dur), 0)::DOUBLE
                     / coalesce(sum(dur), 0)
           END AS twa_centi
    FROM d GROUP BY user_id
    """,
)
def q_streaming_twa(spark, sf_dir):
    """Streaming TWAP (streaming.windows.streaming_time_weighted): the
    per-user time-weighted value maintained as FIVE LONGS of state per
    key across micro-batches (applyInPandasWithState) — live metering
    on an unbounded stream with state that never grows. The finite
    time-ordered replay's final emission equals the batch operator
    bit-for-bit (same integer micro/centi arithmetic), so the batch SQL
    is the oracle — the same promotion pattern as
    streaming_stateful_user_counts."""
    import tempfile

    from parkour_spark.streaming.windows import (
        read_stream,
        run_to_completion,
        streaming_time_weighted,
        write_time_ordered_replay,
    )

    ev = _t(spark, sf_dir, "events")
    tmp = tempfile.mkdtemp(prefix="parkour_stream_twa_")
    write_time_ordered_replay(ev, "ts", tmp, n_slices=8)
    stream = read_stream(spark, tmp, ev.schema, max_files=1)
    out = run_to_completion(
        streaming_time_weighted(stream), output_mode="update"
    )
    # update-mode memory sink keeps every emission; the final state per
    # user is the row with the largest n_events (emissions are monotone)
    final = (
        out.groupBy("user_id")
        .agg(
            F.max(
                F.struct("n_events", "held_us", "vsum_centi_us")
            ).alias("__f")
        )
        .select("user_id", "__f.n_events", "__f.held_us",
                "__f.vsum_centi_us")
    )
    return final.withColumn(
        "twa_centi",
        F.when(
            F.col("held_us") > 0,
            F.col("vsum_centi_us").cast("double") / F.col("held_us"),
        ),
    )


@query(
    "copurchase_part_pairs",
    """
    WITH s AS (SELECT l_orderkey,
                      list_sort(list_distinct(list(l_partkey))) AS its
               FROM lineitem GROUP BY l_orderkey),
    e AS (SELECT l_orderkey, unnest(its) AS i FROM s),
    p AS (SELECT a.i AS item_a, b.i AS item_b
          FROM e a JOIN e b
            ON a.l_orderkey = b.l_orderkey AND a.i < b.i)
    SELECT item_a, item_b, count(*)::BIGINT AS n_groups
    FROM p GROUP BY 1, 2 HAVING count(*) >= 2
    """,
)
def q_copurchase(spark, sf_dir):
    """Frequent co-purchase mining (agg.cooccurrence_pairs over
    lineitem baskets): unordered part pairs bought together in ≥2
    orders — the market-basket primitive behind "customers also
    bought". One order-keyed collect_set aggregate; pairs explode
    SCAN-SIDE from each basket's sorted distinct-item array (baskets
    are ≤7 items in this schema — fanout bounded per group, no
    self-join); the pair partial-agg is the only other shuffle. The
    oracle replays the same pair semantics relationally."""
    from parkour_spark.operators.agg import cooccurrence_pairs

    li = _t(spark, sf_dir, "lineitem")
    return cooccurrence_pairs(
        li, "l_orderkey", "l_partkey", min_count=2
    )


@query(
    "cusum_event_drift",
    """
    WITH hourly AS (
      SELECT event_type AS g, date_trunc('hour', ts) AS hr,
             count(*)::BIGINT AS x
      FROM events GROUP BY 1, 2),
    cells AS (SELECT g, x, count(*)::BIGINT AS c FROM hourly GROUP BY 1, 2),
    z AS (
      SELECT g, x,
             sum(c) OVER (PARTITION BY g ORDER BY x
                          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               AS cum,
             sum(c) OVER (PARTITION BY g) AS n
      FROM cells),
    med AS (
      SELECT g, min(CASE WHEN cum >= (n + 1) // 2 THEN x END)::BIGINT AS med
      FROM z GROUP BY g),
    dev AS (
      SELECT cells.g, abs(x - med) AS dx, sum(c)::BIGINT AS c
      FROM cells JOIN med ON cells.g = med.g GROUP BY 1, 2),
    dz AS (
      SELECT g, dx,
             sum(c) OVER (PARTITION BY g ORDER BY dx
                          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               AS cum,
             sum(c) OVER (PARTITION BY g) AS n
      FROM dev),
    mad AS (
      SELECT g, min(CASE WHEN cum >= (n + 1) // 2 THEN dx END)::BIGINT AS mad
      FROM dz GROUP BY g),
    ref AS (SELECT med.g, med.med AS k, (5 * mad.mad)::BIGINT AS thr
            FROM med JOIN mad ON med.g = mad.g),
    p AS (
      SELECT hourly.g, hr, thr,
             sum(x - k) OVER (PARTITION BY hourly.g ORDER BY hr
                              ROWS BETWEEN UNBOUNDED PRECEDING
                              AND CURRENT ROW)::BIGINT AS p
      FROM hourly JOIN ref ON hourly.g = ref.g),
    s AS (
      SELECT g, thr,
             (p - least(0, min(p) OVER (PARTITION BY g ORDER BY hr
                        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)))
               ::BIGINT AS s
      FROM p)
    SELECT g AS event_type, count(*)::BIGINT AS n_points,
           max(s)::BIGINT AS max_cusum,
           sum(CASE WHEN s > thr THEN 1 ELSE 0 END)::BIGINT
             AS n_alarm_points
    FROM s GROUP BY g
    """,
)
def q_cusum_drift(spark, sf_dir):
    """CUSUM rate-drift detection (validate.cusum_profile over hourly
    per-type event counts): the SUSTAINED-shift monitor — a 20% rate
    creep never crosses event_rate_spikes' 3·MAD point threshold but
    accumulates linearly here. Reference k = the robust hourly median,
    threshold h = 5·MAD (both from the same all-integer cell
    machinery); the sequential recurrence max(0, S+x−k) is computed
    closed-form as P − min(0, running-min P) — two windows over the
    same per-type hourly ordering, no state, every value integer.
    SCALE: the ordered windows run over HOURLY cells, never events."""
    from parkour_spark.operators.validate import cusum_profile, mad_profile

    ev = _t(spark, sf_dir, "events")
    hourly = ev.groupBy(
        F.col("event_type"), F.date_trunc("hour", "ts").alias("hr")
    ).agg(F.count("*").cast("long").alias("x"))
    prof = mad_profile(hourly, "x", "event_type", k=3)
    ref = prof.select(
        "event_type",
        F.col("median").alias("k"),
        (F.lit(5) * F.col("mad")).cast("long").alias("h"),
    )
    return cusum_profile(hourly, "x", "hr", "event_type", ref)


@query(
    "linear_attribution_credits",
    """
    WITH convs AS (
      SELECT user_id, event_id AS conv, epoch_us(ts)::BIGINT AS cus
      FROM events WHERE event_type = 'purchase'),
    touches AS (
      SELECT user_id, event_type, epoch_us(ts)::BIGINT AS tus
      FROM events WHERE event_type IN ('view', 'click')),
    pairs AS (
      SELECT t.event_type, c.conv
      FROM touches t JOIN convs c ON t.user_id = c.user_id
      WHERE t.tus > c.cus - 21600000000 AND t.tus <= c.cus),
    credited AS (
      SELECT event_type,
             round(1000000.0 / count(*) OVER (PARTITION BY conv))::BIGINT
               AS credit
      FROM pairs)
    SELECT event_type, count(*)::BIGINT AS n_touchpoints,
           sum(credit)::BIGINT AS credit_micro
    FROM credited GROUP BY event_type
    """,
)
def q_linear_attribution(spark, sf_dir):
    """Equal-credit multi-touch attribution
    (behavior.linear_attribution): views/clicks inside each purchase's
    6-hour lookback split that conversion's credit equally — the
    companion to last_touch_attribution (one winner) for budget
    allocation across channels. Per-pair integer micro-credits rounded
    BEFORE the sum keep totals engine-exact. SCALE: both sides are
    type-filtered scan-side; the user-keyed join moves only the
    attribution slice; the conversion-keyed count windows over the
    PAIR table."""
    from parkour_spark.operators.behavior import linear_attribution

    return linear_attribution(
        _t(spark, sf_dir, "events"),
        conversion_type="purchase",
        touch_types=["view", "click"],
        lookback_s=21600,
    )


@query(
    "pit_enriched_purchases",
    """
    WITH dim AS (
      SELECT user_id, value AS plan_value,
             epoch_us(ts)::BIGINT AS vfrom,
             lead(epoch_us(ts)::BIGINT) OVER (
               PARTITION BY user_id ORDER BY ts, event_id) AS vto
      FROM events WHERE event_type = 'signup'),
    facts AS (
      SELECT event_id, user_id, epoch_us(ts)::BIGINT AS fus
      FROM events WHERE event_type = 'purchase')
    SELECT f.event_id, f.user_id, f.fus AS purchase_us,
           d.plan_value, d.vfrom AS valid_from_us
    FROM facts f LEFT JOIN dim d
      ON f.user_id = d.user_id
     AND f.fus >= d.vfrom AND (d.vto IS NULL OR f.fus < d.vto)
    """,
)
def q_pit_enrich(spark, sf_dir):
    """Point-in-time enrichment (cdc.pit_enrich): each purchase joined
    to the signup-stream SCD2 version (cdc.scd2_from_events) in force
    AT ITS OWN TIMESTAMP — the feature-store / leakage-free-training
    temporal join ("no attribute from the future"; purchases before a
    user's first version keep NULLs instead of silently dropping).
    Timestamps compare as exact integer epoch micros. SCALE: the
    business-key equi-join bounds fanout at each key's version count;
    one key shuffle per side."""
    from parkour_spark.functions.timeops import epoch_micros
    from parkour_spark.operators.cdc import pit_enrich, scd2_from_events

    ev = _t(spark, sf_dir, "events")
    dim = scd2_from_events(
        ev.where(F.col("event_type") == "signup").select(
            "user_id",
            "event_id",
            F.col("value").alias("plan_value"),
            epoch_micros(F.col("ts")).alias("us"),
        ),
        key_cols=["user_id"],
        ts_col="us",
        attr_cols=["plan_value"],
        order_tiebreak=["event_id"],
    ).select(
        "user_id", "plan_value",
        F.col("valid_from").alias("vfrom"),
        F.col("valid_to").alias("vto"),
    )
    facts = ev.where(F.col("event_type") == "purchase").select(
        "event_id", "user_id", epoch_micros(F.col("ts")).alias("purchase_us")
    )
    out = pit_enrich(
        facts, dim, ["user_id"], "purchase_us",
        valid_from="vfrom", valid_to="vto",
    )
    return out.select(
        "event_id", "user_id", "purchase_us", "plan_value",
        F.col("vfrom").alias("valid_from_us"),
    )


# ===========================================================================
# Round 7: PCA moments, drift/eval statistics, privacy, graph cohesion
# ===========================================================================


@query(
    "embedding_covariance_cells",
    """
    WITH q AS (
      SELECT vec_id,
             list_transform(CAST(embedding AS DOUBLE[]),
                            x -> CAST(floor(x * 1000) AS BIGINT)) AS q
      FROM embeddings
      WHERE embedding IS NOT NULL AND len(embedding) > 0),
    d AS (SELECT vec_id, generate_subscripts(q, 1) AS k, unnest(q) AS v
          FROM q),
    xx AS (
      SELECT CAST(a.k - 1 AS INT) AS i, CAST(b.k - 1 AS INT) AS j,
             CAST(sum(a.v * b.v) AS BIGINT) AS s
      FROM d a JOIN d b ON a.vec_id = b.vec_id AND a.k <= b.k
      GROUP BY 1, 2),
    sums AS (
      SELECT CAST(k - 1 AS INT) AS i, CAST(-1 AS INT) AS j,
             CAST(sum(v) AS BIGINT) AS s
      FROM d GROUP BY 1),
    cnt AS (SELECT CAST(-1 AS INT) AS i, CAST(-1 AS INT) AS j,
                   count(*)::BIGINT AS s FROM q)
    SELECT i, j, s FROM xx
    UNION ALL SELECT i, j, s FROM sums
    UNION ALL SELECT i, j, s FROM cnt
    """,
)
def q_covariance_cells(spark, sf_dir):
    """Exact integer second-moment cells of the embedding corpus
    (operators.pca.covariance_cells) — the PCA/whitening prerequisite.
    X'X = Σ_partitions (X_p)'(X_p), so each Arrow batch folds to one
    d×d NumPy int64 matmul inside mapInPandas and only batches×O(d²)
    cells ever shuffle; the groupBy is the single Exchange. Components
    quantize with floor(double(x)·1000) — no rounding tie exists, both
    engines agree bit-for-bit."""
    from parkour_spark.operators.pca import covariance_cells

    return covariance_cells(_t(spark, sf_dir, "embeddings"), "embedding")


@query(
    "psi_price_drift",
    """
    WITH a AS (SELECT o_totalprice AS x FROM orders
               WHERE o_orderpriority = '1-URGENT'),
    b AS (SELECT o_totalprice AS x FROM orders
          WHERE o_orderpriority <> '1-URGENT'),
    ca AS (
      SELECT CAST(least(greatest(floor((x - 0.0) * 20 / (400000.0 - 0.0)),
                                 0), 19) AS INT) AS bucket,
             count(*) AS n
      FROM a WHERE x IS NOT NULL GROUP BY 1),
    cb AS (
      SELECT CAST(least(greatest(floor((x - 0.0) * 20 / (400000.0 - 0.0)),
                                 0), 19) AS INT) AS bucket,
             count(*) AS n
      FROM b WHERE x IS NOT NULL GROUP BY 1),
    spine AS (SELECT unnest(range(0, 20)) AS bucket),
    cells AS (
      SELECT coalesce(ca.n, 0) AS na, coalesce(cb.n, 0) AS nb
      FROM spine LEFT JOIN ca USING (bucket) LEFT JOIN cb USING (bucket)),
    tot AS (SELECT CAST(sum(na) AS BIGINT) AS n_a,
                   CAST(sum(nb) AS BIGINT) AS n_b FROM cells),
    terms AS (
      SELECT n_a, n_b,
             CAST(round(((na + 1) / (n_a + 20) - (nb + 1) / (n_b + 20))
                        * ln(((na + 1) / (n_a + 20))
                             / ((nb + 1) / (n_b + 20))) * 1e6) AS BIGINT)
               AS term
      FROM cells, tot)
    SELECT max(n_a) AS n_a, max(n_b) AS n_b,
           CAST(sum(term) AS BIGINT) AS psi_micro,
           round(CAST(sum(term) AS BIGINT) / 1e6, 6) AS psi
    FROM terms
    """,
)
def q_psi_drift(spark, sf_dir):
    """Population Stability Index (operators.validate.psi_stat)
    between urgent and non-urgent order prices — the drift gate a
    100 TB ingest runs between the reference corpus and each batch.
    Two histogram-shaped partial-agg scans reduce both sides to ≤20
    cells; the add-1-smoothed terms round to micro-units before the
    sum over the FULL bucket spine (empty-both buckets still
    contribute when sample sizes differ). No row moves for the
    comparison."""
    from parkour_spark.operators import validate as V

    orders = _t(spark, sf_dir, "orders")
    a = orders.where(F.col("o_orderpriority") == "1-URGENT")
    b = orders.where(F.col("o_orderpriority") != "1-URGENT")
    return V.psi_stat(a, b, "o_totalprice", 0.0, 400000.0, 20)


@query(
    "quality_ndcg_langid",
    f"""
    WITH scored AS (
      SELECT doc_id, {_QBP_SQL} AS s,
             CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS y
      FROM documents),
    ranked AS (
      SELECT y, row_number() OVER (ORDER BY s DESC, doc_id) AS r
      FROM scored),
    agg AS (
      SELECT count(*)::BIGINT AS n, CAST(sum(y) AS BIGINT) AS n_pos,
             CAST(coalesce(sum(CASE WHEN y = 1 AND r <= 100
               THEN CAST(round(1e6 / log2(r + 1)) AS BIGINT) END), 0)
               AS BIGINT) AS dcg_micro
      FROM ranked),
    ideal AS (
      SELECT CAST(sum(CAST(round(1e6 / log2(r + 1)) AS BIGINT)) AS BIGINT)
               AS idcg_micro
      FROM (SELECT unnest(range(1, least(100, (SELECT n_pos FROM agg))
                                   + 1)) AS r))
    SELECT 100::BIGINT AS k, n, n_pos, dcg_micro, idcg_micro,
           round(dcg_micro / CAST(idcg_micro AS DOUBLE), 6) AS ndcg
    FROM agg, ideal
    """,
)
def q_ndcg_langid(spark, sf_dir):
    """Exact binary nDCG@100 of the composite quality score against
    lang='en' (operators.validate.ndcg_at_k) — the position-discounted
    companion to quality_auc_langid/quality_avg_precision. Per-position
    gains round to integer micro-units before both sums
    (order-independent, engine-exact); the ideal arm is a sequence
    explode over min(k, n_pos) rows. Eval-slice contract: the ranking
    window is the documented average_precision shape."""
    from parkour_spark.functions.text import quality_bp
    from parkour_spark.operators import validate as V

    docs = _t(spark, sf_dir, "documents")
    scored = docs.select(
        "doc_id",
        quality_bp(F.col("text")).alias("score_bp"),
        (F.col("lang") == "en").alias("is_en"),
    )
    return V.ndcg_at_k(scored, "score_bp", "is_en", "doc_id", k=100)


@query(
    "mi_source_lang",
    """
    WITH cells AS (
      SELECT source AS x, lang AS y, count(*) AS c
      FROM documents GROUP BY 1, 2),
    mx AS (SELECT x, sum(c) AS cx FROM cells GROUP BY 1),
    my AS (SELECT y, sum(c) AS cy FROM cells GROUP BY 1),
    tot AS (SELECT CAST(sum(c) AS BIGINT) AS n FROM cells)
    SELECT max(n) AS n, count(*)::BIGINT AS n_cells,
           CAST(sum(CAST(round((c / n)
             * ln((CAST(c AS DOUBLE) * n)
                  / (CAST(cx AS DOUBLE) * cy)) * 1e6) AS BIGINT))
             AS BIGINT) AS mi_micro,
           round(CAST(sum(CAST(round((c / n)
             * ln((CAST(c AS DOUBLE) * n)
                  / (CAST(cx AS DOUBLE) * cy)) * 1e6) AS BIGINT))
             AS BIGINT) / 1e6, 6) AS mi
    FROM cells JOIN mx USING (x) JOIN my USING (y), tot
    """,
)
def q_mi_source_lang(spark, sf_dir):
    """Mutual information between source and language
    (operators.validate.mutual_information) — the slice-diagnostics
    primitive: high MI on a split/sample column is a leakage smell;
    near-zero MI says the mixture is balanced. One partial-agg shuffle
    to the contingency cells; margins are aggregates OVER the cell
    table; integer micro-nat terms before the sum."""
    from parkour_spark.operators import validate as V

    return V.mutual_information(
        _t(spark, sf_dir, "documents"), "source", "lang"
    )


@query(
    "pseudonymized_user_counts",
    """
    SELECT substr(md5('r7-salt:' || user_id::VARCHAR), 1, 16) AS pseudo_id,
           count(*)::BIGINT AS n_events,
           count(DISTINCT event_type)::BIGINT AS n_types,
           CAST(sum(CAST(round(value * 1000000) AS BIGINT)) AS BIGINT)
             AS value_micro
    FROM events
    GROUP BY 1
    """,
)
def q_pseudonymized_users(spark, sf_dir):
    """Per-user activity rollup under salted pseudonymization
    (functions.text.pseudonymize): the raw user id never leaves the
    scan — analytics join/group on the stable salted token, and
    rotating the salt unlinks releases. Pure Column md5 (JVM-side,
    zero Python); the rollup is one partial-agg'd shuffle keyed by
    the pseudonym (same cardinality as user_id — no skew change)."""
    from parkour_spark.functions.text import pseudonymize

    ev = _t(spark, sf_dir, "events")
    return (
        ev.select(
            pseudonymize(F.col("user_id"), "r7-salt", 16).alias("pseudo_id"),
            "event_type",
            F.round(F.col("value") * 1000000).cast("long").alias("__vm"),
        )
        .groupBy("pseudo_id")
        .agg(
            F.count("*").cast("long").alias("n_events"),
            F.countDistinct("event_type").cast("long").alias("n_types"),
            F.sum("__vm").cast("long").alias("value_micro"),
        )
    )


@query(
    "negative_sampling_vocab",
    f"""
    WITH terms AS (SELECT unnest({_TOKS_SQL}) AS term FROM documents),
    vocab AS (SELECT term, count(*)::BIGINT AS cnt FROM terms GROUP BY 1),
    mx AS (SELECT max(cnt) AS mx FROM vocab),
    top AS (SELECT term, cnt FROM vocab ORDER BY cnt DESC, term LIMIT 200)
    SELECT term, cnt,
           CAST(floor(1e6 * pow(CAST(cnt AS DOUBLE) / mx, 0.75)) AS BIGINT)
             AS weight_micro
    FROM top, mx
    """,
)
def q_negative_sampling(spark, sf_dir):
    """word2vec unigram^(3/4) negative-sampling table
    (operators.corpus.negative_sampling_weights), top-200 terms:
    MAX-normalized (integer max, never a float sum normalizer — the
    source_mixture_weights discipline) so the table replays
    bit-for-bit; the head extraction is orderBy+limit
    (TakeOrderedAndProject), never a full-vocabulary rank."""
    return C.negative_sampling_weights(
        _t(spark, sf_dir, "documents"),
        alpha_num=3,
        alpha_den=4,
        top_n=200,
    )


@query(
    "clustering_coefficient_dedup",
    f"""
    WITH {_neardup_pairs_ctes()},
    e AS (SELECT DISTINCT least(id_a, id_b) AS a, greatest(id_a, id_b) AS b
          FROM pairs WHERE id_a <> id_b),
    deg AS (SELECT n AS node, count(*)::BIGINT AS degree FROM (
      SELECT a AS n FROM e UNION ALL SELECT b FROM e) GROUP BY n),
    ranked AS (
      SELECT CASE WHEN (da.degree < db.degree)
                    OR (da.degree = db.degree AND e.a < e.b)
                  THEN e.a ELSE e.b END AS lo,
             CASE WHEN (da.degree < db.degree)
                    OR (da.degree = db.degree AND e.a < e.b)
                  THEN e.b ELSE e.a END AS hi
      FROM e JOIN deg da ON e.a = da.node JOIN deg db ON e.b = db.node),
    wedges AS (
      SELECT w1.lo AS a, w1.hi AS b, w2.hi AS c
      FROM ranked w1 JOIN ranked w2 ON w1.lo = w2.lo
      WHERE w1.hi < w2.hi),
    tri AS (
      SELECT a, b, c FROM wedges
      WHERE EXISTS (SELECT 1 FROM ranked r
                    WHERE least(r.lo, r.hi) = wedges.b
                      AND greatest(r.lo, r.hi) = wedges.c)),
    tcount AS (
      SELECT node, count(*)::BIGINT AS t FROM (
        SELECT unnest([a, b, c]) AS node FROM tri) GROUP BY node)
    SELECT deg.node, deg.degree,
           coalesce(t, 0)::BIGINT AS n_triangles,
           CASE WHEN deg.degree >= 2
                THEN CAST((2000000 * coalesce(t, 0))
                          // (deg.degree * (deg.degree - 1)) AS BIGINT)
                ELSE 0 END AS lcc_micro
    FROM deg LEFT JOIN tcount USING (node)
    """,
)
def q_clustering_coefficient(spark, sf_dir):
    """Per-node local clustering coefficient over the MinHash near-dup
    graph (operators.graph.clustering_coefficient): lcc → 1 marks true
    duplicate cliques, a high-degree node with lcc → 0 is boilerplate
    stitching unrelated docs — the edge-cut signal before dedup_groups
    merges its whole neighborhood. Degree-ordered triangle counting
    (wedge fan-out ~sqrt(2m)-bounded) + one node-sized join; the ratio
    is exact integer div in micro-units."""
    from parkour_spark.operators.graph import clustering_coefficient

    docs = _t(spark, sf_dir, "documents")
    pairs = D.minhash_dedup_pairs(docs, threshold=0.8)
    return clustering_coefficient(pairs)


@query(
    "contrastive_pairs_dedup",
    _dedup_groups_oracle(
        tail=f"""
    , comp AS (SELECT n AS doc_id, min(m) AS component FROM reach GROUP BY n),
    q AS (SELECT doc_id, {_QBP_SQL} AS quality_bp FROM documents),
    r AS (
      SELECT comp.doc_id, component, quality_bp,
             row_number() OVER (PARTITION BY component
                                ORDER BY quality_bp DESC, comp.doc_id) AS rk
      FROM comp JOIN q USING (doc_id))
    SELECT a.doc_id AS anchor_id, p.doc_id AS positive_id, a.component
    FROM r a JOIN r p ON a.component = p.component
    WHERE a.rk > 1 AND p.rk = 1
    """
    ),
)
def q_contrastive_pairs(spark, sf_dir):
    """(anchor, positive) contrastive-training pairs from the
    keep-best dedup chain (graph.contrastive_pairs): near-duplicates
    are organic positives, and each cluster's highest-quality survivor
    is the cleanest exemplar — so every non-survivor anchors exactly
    one pair with its component's survivor. One component-keyed join
    over the node-sized component table on top of dedup_keep_best's
    chain; fan-out per component = members − 1 by construction. Oracle
    replays signatures → bands → verify → recursive closure →
    quality argmax → the pair join."""
    from parkour_spark.functions.text import quality_bp
    from parkour_spark.operators.graph import contrastive_pairs, dedup_survivors_by

    docs = _t(spark, sf_dir, "documents")
    pairs = D.minhash_dedup_pairs(docs, threshold=0.8)
    scored = docs.select("doc_id", quality_bp(F.col("text")).alias("quality_bp"))
    return contrastive_pairs(dedup_survivors_by(scored, pairs, "doc_id", "quality_bp"))


@query(
    "quality_percentile_docs",
    f"""
    WITH q AS (SELECT doc_id, {_QBP_SQL} AS score_bp FROM documents),
    cells AS (SELECT score_bp, count(*) AS c FROM q GROUP BY 1),
    cum AS (
      SELECT score_bp,
             sum(c) OVER (ORDER BY score_bp
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
      FROM cells),
    tot AS (SELECT count(*)::BIGINT AS n FROM q)
    SELECT doc_id, score_bp,
           CAST((10000 * cum) // n AS BIGINT) AS percentile_bp
    FROM q JOIN cum USING (score_bp), tot
    """,
)
def q_quality_percentile(spark, sf_dir):
    """Percentile-rank normalization of the quality score
    (validate.percentile_rank_bp): floor(10⁴·|rows ≤ score|/n) per doc
    — the mixture-invariant filter knob ("top 20%" survives corpus
    growth; a fixed threshold does not). NO global row sort: the
    corpus reduces to per-distinct-basis-point cells (≤10⁴ rows by
    quality_bp's integer construction), the cumulative window runs
    over that cell table, and rows get their percentile via a
    broadcast join back onto the scan."""
    from parkour_spark.functions.text import quality_bp
    from parkour_spark.operators.validate import percentile_rank_bp

    docs = _t(spark, sf_dir, "documents")
    scored = docs.select("doc_id", quality_bp(F.col("text")).alias("score_bp"))
    return percentile_rank_bp(scored, "score_bp")


@query(
    "streaming_psi_by_slice",
    """
    WITH sliced AS (
      SELECT value,
             ntile(6) OVER (ORDER BY ts, event_id) AS slice_id
      FROM events),
    bexpr AS (
      SELECT slice_id,
             CAST(least(greatest(floor((value - 0.0) * 20
                                       / (500.0 - 0.0)), 0), 19) AS INT)
               AS b
      FROM sliced WHERE value IS NOT NULL),
    bh AS (SELECT slice_id, b, count(*) AS n FROM bexpr GROUP BY 1, 2),
    bt AS (SELECT slice_id, CAST(sum(n) AS BIGINT) AS nb
           FROM bh GROUP BY 1),
    refh AS (
      SELECT CAST(least(greatest(floor((value - 0.0) * 20
                                       / (500.0 - 0.0)), 0), 19) AS INT)
               AS b,
             count(*) AS n
      FROM events WHERE value IS NOT NULL GROUP BY 1),
    reft AS (SELECT CAST(sum(n) AS BIGINT) AS nr FROM refh),
    spine AS (
      SELECT s.slice_id, t.b
      FROM (SELECT DISTINCT slice_id FROM sliced) s,
           unnest(range(0, 20)) AS t(b)),
    cells AS (
      SELECT spine.slice_id,
             coalesce(bh.n, 0) AS cb, coalesce(refh.n, 0) AS cr
      FROM spine
      LEFT JOIN bh ON spine.slice_id = bh.slice_id AND spine.b = bh.b
      LEFT JOIN refh ON spine.b = refh.b),
    terms AS (
      SELECT cells.slice_id, bt.nb,
             CAST(round(((cb + 1) / (nb + 20) - (cr + 1) / (nr + 20))
                        * ln(((cb + 1) / (nb + 20))
                             / ((cr + 1) / (nr + 20))) * 1e6) AS BIGINT)
               AS term
      FROM cells JOIN bt USING (slice_id), reft)
    SELECT slice_id, max(nb) AS n,
           CAST(sum(term) AS BIGINT) AS psi_micro
    FROM terms GROUP BY slice_id
    """,
)
def q_streaming_psi(spark, sf_dir):
    """Streaming distribution-drift monitor
    (streaming.windows.streaming_psi_monitor): the events table
    replayed as 6 time-ordered micro-batches, each scoring its
    value-histogram PSI against the full-corpus reference histogram —
    one (slice, n, psi_micro) alert row per batch, NO state store (the
    reference is a broadcast-constant artifact). A streaming entry
    with a FULL SQL oracle: the total (ts, event_id) replay order
    makes the slice assignment itself replayable (ntile), and the
    per-bucket micro-unit terms match psi_stat bit-for-bit."""
    import tempfile

    from parkour_spark.operators.validate import histogram
    from parkour_spark.streaming.windows import (
        streaming_psi_monitor,
        write_time_ordered_replay,
    )

    ev = _t(spark, sf_dir, "events").select("event_id", "ts", "value")
    tmp = tempfile.mkdtemp(prefix="parkour_stream_psi_")
    write_time_ordered_replay(
        ev, ["ts", "event_id"], tmp, n_slices=6, slice_col="slice_id"
    )
    ref = {
        r["bucket"]: r["n"]
        for r in histogram(ev, "value", 0.0, 500.0, 20).collect()
    }
    schema = spark.read.parquet(tmp).schema
    return streaming_psi_monitor(
        spark, tmp, schema, ref, "value", 0.0, 500.0, 20
    )


# The streaming covariance entry reuses the batch covariance oracle
# verbatim: integer cell addition is associative, so the incremental
# index over the replayed stream must equal the batch computation
# bit-for-bit.
_COVARIANCE_ORACLE = ORACLES["embedding_covariance_cells"]


@query("streaming_covariance_cells", _COVARIANCE_ORACLE)
def q_streaming_covariance(spark, sf_dir):
    """Incrementally-maintained PCA moment cells
    (streaming.windows.streaming_covariance_cells): the embedding
    corpus replayed as 4 micro-batches, each folding to its own O(d²)
    integer cell block merged into ONE carried d×d grid — the
    streaming index-maintenance form of embedding_covariance_cells
    (refresh whitening/PCA as the corpus grows, never re-reading it).
    Exactness is structural: integer cell addition is associative, so
    the final emission equals the batch operator — the SAME DuckDB
    oracle gates both entries."""
    import tempfile

    from parkour_spark.streaming.windows import streaming_covariance_cells

    emb = _t(spark, sf_dir, "embeddings")
    tmp = tempfile.mkdtemp(prefix="parkour_stream_cov_")
    emb.repartition(4).write.mode("overwrite").parquet(tmp)
    schema = spark.read.parquet(tmp).schema
    return streaming_covariance_cells(spark, tmp, schema, "embedding")


@query("streaming_covariance_snapshots", _COVARIANCE_ORACLE)
def q_streaming_covariance_snapshots(spark, sf_dir):
    """PERSISTED-state covariance maintainer
    (streaming.windows.streaming_covariance_snapshots — r7 verdict
    #5's snapshot variant): the same 4-batch replay folded into
    durable versioned parquet snapshots through the
    incremental_rollup_stream recovery skeleton (checkpointed offsets,
    merge base discovered from the highest committed snapshot,
    idempotent replays). Integer cell addition is associative, so the
    final snapshot equals the batch operator — the SAME DuckDB oracle
    now gates the batch, driver-local-stream, and durable-snapshot
    forms."""
    import tempfile

    from parkour_spark.streaming.windows import (
        streaming_covariance_snapshots,
    )

    emb = _t(spark, sf_dir, "embeddings")
    tmp = tempfile.mkdtemp(prefix="parkour_stream_covsnap_")
    emb.repartition(4).write.mode("overwrite").parquet(tmp)
    schema = spark.read.parquet(tmp).schema
    state = tempfile.mkdtemp(prefix="parkour_covsnap_state_")
    return streaming_covariance_snapshots(
        spark, tmp, schema, state, "embedding"
    )


def _mg_replay_sql(n_slices: int, k: int, emit_top: int) -> str:
    """Unroll the streaming Misra-Gries fold as DuckDB CTE stages — one
    (sum ∪ batch → rank → subtract (k+1)-th largest → keep positive)
    block per replay slice, emitting each slice's top `emit_top` for
    the groups PRESENT in that slice (the state op only fires for
    groups the trigger delivered). Exactly replayable because the
    operator's fold is a pure function of each batch's multiset and
    the (ts, event_id) total order pins the slice assignment."""
    nine = k + 1
    stages, emits = [], []
    prev = (
        "s0 AS (SELECT NULL::VARCHAR AS g, NULL::VARCHAR AS key,"
        " NULL::BIGINT AS c WHERE false)"
    )
    stages.append(prev)
    for t in range(1, n_slices + 1):
        stages.append(
            f"""
    b{t} AS (SELECT g, key, count(*)::BIGINT AS c
             FROM sliced WHERE t = {t} GROUP BY 1, 2),
    p{t} AS (SELECT g, key, sum(c)::BIGINT AS c FROM (
               SELECT g, key, c FROM s{t - 1}
               UNION ALL SELECT g, key, c FROM b{t}) GROUP BY 1, 2),
    r{t} AS (SELECT g, key, c, row_number() OVER (
               PARTITION BY g ORDER BY c DESC, key) AS rk FROM p{t}),
    c{t} AS (SELECT g, coalesce(max(CASE WHEN rk = {nine} THEN c END),
                                0)::BIGINT AS cut
             FROM r{t} GROUP BY g),
    s{t} AS (SELECT r{t}.g, r{t}.key, (r{t}.c - cut)::BIGINT AS c
             FROM r{t} JOIN c{t} ON r{t}.g = c{t}.g
             WHERE r{t}.c - cut > 0),
    n{t} AS (SELECT g, count(*)::BIGINT AS n
             FROM sliced WHERE t <= {t} GROUP BY 1),
    e{t} AS (SELECT s{t}.g, s{t}.key, s{t}.c AS cnt_lb, n{t}.n,
                    row_number() OVER (PARTITION BY s{t}.g
                                       ORDER BY s{t}.c DESC, s{t}.key)
                      AS rk
             FROM s{t} JOIN n{t} ON s{t}.g = n{t}.g
             WHERE s{t}.g IN (SELECT g FROM b{t}))"""
        )
        emits.append(
            f"SELECT g AS event_type, key, cnt_lb, n FROM e{t}"
            f" WHERE rk <= {emit_top}"
        )
    return (
        """
    WITH sliced AS (
      SELECT event_type AS g, user_id::VARCHAR AS key,
             ntile("""
        + str(n_slices)
        + """) OVER (ORDER BY ts, event_id) AS t
      FROM events),
    """
        + ",".join(stages)
        + "\n    "
        + "\n    UNION ALL ".join(emits)
    )


@query("streaming_heavy_hitters", _mg_replay_sql(4, 8, 5))
def q_streaming_heavy_hitters(spark, sf_dir):
    """Stateful streaming heavy hitters
    (streaming.windows.streaming_heavy_hitters): one mergeable
    Misra-Gries(8) summary per event_type maintained across 4
    time-ordered micro-batches (applyInPandasWithState — fixed-size
    state on an unbounded stream), each trigger emitting its groups'
    top-5 candidates with MG lower-bound counts. A streaming entry
    with a FULL SQL oracle over the complete emission TRACE: the fold
    is decrement-once-per-batch (a pure function of each batch's
    multiset — chunk/row-order independent), the (ts, event_id) total
    replay order pins the slice assignment, and the oracle unrolls the
    identical fold per slice (r6/r7 verdict: the batch
    `mg_heavy_tokens` sibling's oracle promotion, completed)."""
    import tempfile

    from parkour_spark.streaming.windows import (
        read_stream,
        run_to_completion,
        streaming_heavy_hitters,
        write_time_ordered_replay,
    )

    ev = _t(spark, sf_dir, "events").select(
        "event_id", "ts", "event_type", "user_id"
    )
    tmp = tempfile.mkdtemp(prefix="parkour_stream_hh_")
    write_time_ordered_replay(ev, ["ts", "event_id"], tmp, n_slices=4)
    schema = spark.read.parquet(tmp).schema
    stream = read_stream(spark, tmp, schema, max_files=1)
    hh = streaming_heavy_hitters(
        stream, "event_type", "user_id", k=8, emit_top=5
    )
    return run_to_completion(hh, output_mode="update")


def _ppm_9x8(mid: int) -> bytes:
    """Deterministic 9×8 P6 test image for media id `mid`: 40 base
    templates (mid % 40) with a 3-level single-pixel perturbation
    (mid // 40 % 3 — shifts ≤2 of the 64 gradient bits), so
    same-template images are planted near-duplicates under dHash and
    cross-template images are far. Pure integer arithmetic — the
    DuckDB oracle recomputes every gray value from this formula, which
    makes the REAL decode→resize→luma→gradient path hash-verifiable
    without a SQL image decoder."""
    t, j = mid % 40, (mid // 40) % 3
    px = bytearray()
    for k in range(72):
        for ch in range(3):
            v = (t * 2654435761 + k * 40503 + ch * 97) % 256
            if ch == 0 and k == 31:
                v = (v + j * 8) % 256
            px.append(v)
    return b"P6 9 8 255\n" + bytes(px)


def _dhash_blobs(spark, sf_dir):
    import pandas as _pd

    docs = _t(spark, sf_dir, "documents").select(
        F.col("doc_id").alias("media_id")
    )

    def build(batches):
        for pdf in batches:
            yield _pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "payload": [_ppm_9x8(int(m)) for m in pdf["media_id"]],
                }
            )

    return SRT.widen_scan(docs).mapInPandas(
        build, "media_id long, payload binary"
    )


_DHASH_SQL = """
    ids AS (SELECT doc_id AS media_id, doc_id % 40 AS t,
                   (doc_id // 40) % 3 AS j
            FROM documents),
    px AS (
      SELECT media_id, r.r, c.c,
             (299 * (CASE WHEN r.r * 9 + c.c = 31
                          THEN ((t * 2654435761 + (r.r*9 + c.c) * 40503)
                                % 256 + j * 8) % 256
                          ELSE (t * 2654435761 + (r.r*9 + c.c) * 40503) % 256
                     END)
              + 587 * ((t * 2654435761 + (r.r*9 + c.c) * 40503 + 97) % 256)
              + 114 * ((t * 2654435761 + (r.r*9 + c.c) * 40503 + 194) % 256))
             // 1000 AS gray
      FROM ids, unnest(range(0, 8)) AS r(r), unnest(range(0, 9)) AS c(c)),
    bits AS (
      SELECT a.media_id, a.r * 8 + a.c AS idx,
             CASE WHEN b.gray > a.gray THEN 1 ELSE 0 END AS bit
      FROM px a JOIN px b ON a.media_id = b.media_id AND a.r = b.r
                         AND b.c = a.c + 1
      WHERE a.c < 8),
    hash AS (
      SELECT media_id,
             CAST(sum(CASE WHEN idx = 0 AND bit = 1
                           THEN -9223372036854775808
                           WHEN idx > 0
                           THEN bit * (1::BIGINT << (63 - idx))
                           ELSE 0 END) AS BIGINT) AS dhash
      FROM bits GROUP BY media_id)"""


@query(
    "multimodal_dhash",
    f"""
    WITH {_DHASH_SQL}
    SELECT media_id, dhash, TRUE AS decodable FROM hash
    """,
)
def q_multimodal_dhash(spark, sf_dir):
    """Perceptual image hashing (multimodal.perceptual_dhash): REAL
    P6 decode → identity-exact 9×8 bilinear → integer ITU-601 luma →
    gradient-sign bits packed into a signed long, Arrow-batched over
    the blob scan (hashes leave the scan; blobs never shuffle). The
    test images are formula-generated, so the oracle recomputes every
    gray value and the packed hash arithmetically — the whole codec
    path is hash-verified, not trusted."""
    from parkour_spark.operators.multimodal import perceptual_dhash

    return perceptual_dhash(_dhash_blobs(spark, sf_dir))


@query(
    "multimodal_dhash_dedup_decode",
    f"""
    WITH {_DHASH_SQL}
    SELECT media_id, dhash, TRUE AS decodable FROM hash
    """,
)
def q_multimodal_dhash_dedup_decode(spark, sf_dir):
    """Dedup-first codec fast path (multimodal.decode_distinct — r7
    verdict #8): md5-fingerprint every blob JVM-side, run the REAL
    dHash decode ONCE per DISTINCT payload, fan results back by
    fingerprint. The blob fixture has only 120 distinct images
    (40 templates × 3 perturbations) across the whole corpus, so this
    path decodes 120 payloads where `multimodal_dhash` decodes one per
    row — and the oracle is the SAME arithmetic hash check, pinning
    row-for-row equality of the two paths."""
    from parkour_spark.operators.multimodal import (
        decode_distinct,
        perceptual_dhash,
    )

    return decode_distinct(_dhash_blobs(spark, sf_dir), perceptual_dhash)


@query(
    "multimodal_dhash_neardup",
    f"""
    WITH {_DHASH_SQL},
    bandtab AS (
      SELECT media_id, dhash, t.i,
             (dhash >> (16 * t.i)) & 65535 AS bv
      FROM hash, unnest(range(0, 4)) AS t(i)),
    okband AS (
      SELECT i, bv FROM bandtab GROUP BY i, bv
      HAVING count(*) > 1 AND count(*) <= 1000),
    cand AS (
      SELECT DISTINCT a.media_id AS id_a, b.media_id AS id_b,
                      a.dhash AS ha, b.dhash AS hb
      FROM bandtab a
      JOIN okband o ON o.i = a.i AND o.bv = a.bv
      JOIN bandtab b ON a.i = b.i AND a.bv = b.bv
                    AND a.media_id < b.media_id)
    SELECT id_a, id_b,
           CAST(bit_count(xor(ha, hb)) AS BIGINT) AS hamming
    FROM cand WHERE bit_count(xor(ha, hb)) <= 8
    """,
)
def q_multimodal_dhash_neardup(spark, sf_dir):
    """Image near-duplicate pairs (multimodal.dhash_near_dup): the
    SimHash band scheme on the 64-bit perceptual hash — 4 × 16-bit
    band keys (pigeonhole-complete for Hamming ≤ 3, recall-bounded
    blocking above), same-bucket candidates with the df-cap analog,
    verify = bit_count(xor) ≤ 8. Planted structure: 40 image
    templates × 3 single-pixel variants ⇒ same-template pairs sit
    within Hamming 4, cross-template pairs are far. Candidates come
    from the band buckets — never all pairs; blobs never shuffle."""
    from parkour_spark.operators.multimodal import dhash_near_dup, perceptual_dhash

    hashes = perceptual_dhash(_dhash_blobs(spark, sf_dir))
    return dhash_near_dup(hashes, max_hamming=8, bands=4)


def _wav_650(mid: int) -> bytes:
    """Deterministic 650-sample 16-bit mono PCM WAV for media id
    `mid`: 30 loudness-contour templates (mid % 30) with a 3-level
    single-sample perturbation (mid // 30 % 3) — the audio analog of
    `_ppm_9x8`, pure integer arithmetic so the oracle recomputes every
    frame energy and the packed fingerprint."""
    import struct as _struct

    t, j = mid % 30, (mid // 30) % 3
    s = []
    for k in range(650):
        u = (t * 7919 + k * 2654435761) % 65536
        if k == 7:
            u = (u + j * 20411) % 65536
        s.append(u - 32768)
    pcm = _struct.pack("<650h", *s)
    fmt = _struct.pack("<HHIIHH", 1, 1, 8000, 16000, 2, 16)
    body = (
        b"WAVE"
        + b"fmt " + _struct.pack("<I", len(fmt)) + fmt
        + b"data" + _struct.pack("<I", len(pcm)) + pcm
    )
    return b"RIFF" + _struct.pack("<I", len(body)) + body


@query(
    "multimodal_audio_fingerprint",
    """
    WITH ids AS (SELECT doc_id AS media_id, doc_id % 30 AS t,
                        (doc_id // 30) % 3 AS j
                 FROM documents),
    samples AS (
      SELECT media_id, k.k, k.k // 10 AS f,
             (CASE WHEN k.k = 7
                   THEN ((t * 7919 + k.k * 2654435761) % 65536
                         + j * 20411) % 65536
                   ELSE (t * 7919 + k.k * 2654435761) % 65536
              END - 32768) AS s
      FROM ids, unnest(range(0, 650)) AS k(k)),
    energies AS (
      SELECT media_id, f, CAST(sum(s * s) AS BIGINT) AS e
      FROM samples GROUP BY 1, 2),
    bits AS (
      SELECT a.media_id, a.f AS idx,
             CASE WHEN b.e > a.e THEN 1 ELSE 0 END AS bit
      FROM energies a JOIN energies b
        ON a.media_id = b.media_id AND b.f = a.f + 1
      WHERE a.f < 64),
    fp AS (
      SELECT media_id,
             CAST(sum(CASE WHEN idx = 0 AND bit = 1
                           THEN -9223372036854775808
                           WHEN idx > 0
                           THEN bit * (1::BIGINT << (63 - idx))
                           ELSE 0 END) AS BIGINT) AS afp
      FROM bits GROUP BY media_id)
    SELECT media_id, afp, TRUE AS decodable FROM fp
    """,
)
def q_multimodal_audio_fp(spark, sf_dir):
    """Audio fingerprinting (multimodal.audio_fingerprint): REAL
    RIFF/WAV PCM decode → exact integer sample recovery → 65
    frame-energy cells → 64 delta-sign bits packed signed, Arrow-
    batched over the blob scan. FFT-free on purpose: the whole path is
    integer arithmetic, so the oracle recomputes every frame energy
    from the generating formula — the codec path is hash-verified like
    `multimodal_dhash`, and `dhash_near_dup` consumes the output
    unchanged for banded-Hamming audio near-dedup."""
    import pandas as _pd

    from parkour_spark.operators.multimodal import audio_fingerprint

    docs = _t(spark, sf_dir, "documents").select(
        F.col("doc_id").alias("media_id")
    )

    def build(batches):
        for pdf in batches:
            yield _pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "payload": [_wav_650(int(m)) for m in pdf["media_id"]],
                }
            )

    blobs = SRT.widen_scan(docs).mapInPandas(
        build, "media_id long, payload binary"
    )
    return audio_fingerprint(blobs)


@query(
    "component_safe_split_counts",
    _dedup_groups_oracle(
        tail="""
    , comp AS (SELECT n AS doc_id, min(m) AS component FROM reach GROUP BY n),
    b AS (
      SELECT doc_id, component,
             ('0x' || substr(md5(component::VARCHAR), 1, 8))::BIGINT % 100
               AS bucket
      FROM comp)
    SELECT CASE WHEN bucket < 80 THEN 'train'
                WHEN bucket < 90 THEN 'val' ELSE 'test' END AS split,
           count(*)::BIGINT AS n_docs,
           count(DISTINCT component)::BIGINT AS n_components
    FROM b GROUP BY 1
    """
    ),
)
def q_component_safe_split(spark, sf_dir):
    """NEAR-DUP-leakage-safe train/val/test split: the split hash runs
    on the connected-component id of the MinHash near-dup graph, so a
    document and ALL its near-duplicates land in the same split —
    `leakage_safe_split_counts` protects same-SOURCE leakage, this
    protects same-CONTENT leakage (near-copies straddling train/test
    inflate eval, the memorization-measurement bug). Singleton docs are
    their own component, so unaffected rows split exactly like a plain
    doc-hash split. One CC pass over the pair graph + a scan-side
    split expression; the oracle replays signatures → bands → verify →
    recursive closure → the hash split."""
    from parkour_spark.functions.sampling import split_assign

    docs = _t(spark, sf_dir, "documents")
    pairs = D.minhash_dedup_pairs(docs, threshold=0.8)
    from parkour_spark.operators.graph import connected_components

    cc = connected_components(docs.select("doc_id"), pairs, "doc_id")
    split = split_assign(
        F.col("component").cast("string"),
        {"train": 0.8, "val": 0.1, "test": 0.1},
    )
    return (
        cc.select(F.col("n").alias("doc_id"), "component")
        .select("doc_id", "component", split.alias("split"))
        .groupBy("split")
        .agg(
            F.count("*").cast("long").alias("n_docs"),
            F.countDistinct("component").cast("long").alias("n_components"),
        )
    )


@query(
    "join_size_preflight_orders",
    """
    WITH ca AS (SELECT o_orderkey AS k, count(*) AS ca
                FROM orders GROUP BY 1),
    cb AS (SELECT l_orderkey AS k, count(*) AS cb
           FROM lineitem GROUP BY 1),
    prod AS (SELECT ca.k, CAST(ca.ca * cb.cb AS BIGINT) AS rows_
             FROM ca JOIN cb ON ca.k = cb.k),
    top AS (SELECT k, rows_ FROM prod
            ORDER BY rows_ DESC, k LIMIT 5),
    tops AS (SELECT string_agg(k::VARCHAR || ':' || rows_::VARCHAR, ','
                               ORDER BY rows_ DESC, k::VARCHAR) AS top_keys
             FROM top)
    SELECT (SELECT count(*) FROM orders)::BIGINT AS n_a,
           (SELECT count(*) FROM lineitem)::BIGINT AS n_b,
           count(*)::BIGINT AS matched_keys,
           CAST(coalesce(sum(rows_), 0) AS BIGINT) AS join_rows,
           CAST(coalesce(max(rows_), 0) AS BIGINT) AS max_key_rows,
           coalesce((SELECT top_keys FROM tops), '') AS top_keys
    FROM prod
    """,
)
def q_join_preflight(spark, sf_dir):
    """Join-size pre-flight (validate.join_size_preflight): the EXACT
    orders ⋈ lineitem output cardinality from the two key-count tables
    — Σ_k cnt_A(k)·cnt_B(k) — plus the largest single key's
    contribution (the straggler bound that decides whether to salt)
    and the top contributors. skew_profile says whether ONE side is
    skewed; this says what the JOIN multiplies that skew into, before
    any row-sized shuffle is spent. Key-sized tables only."""
    from parkour_spark.operators.validate import join_size_preflight

    return join_size_preflight(
        _t(spark, sf_dir, "orders"), "o_orderkey",
        _t(spark, sf_dir, "lineitem"), "l_orderkey",
    )


@query(
    "equifreq_price_bins",
    """
    WITH cells AS (
      SELECT o_totalprice AS v, count(*) AS c FROM orders
      WHERE o_totalprice IS NOT NULL GROUP BY 1),
    cum AS (
      SELECT v, sum(c) OVER (ORDER BY v
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
      FROM cells),
    tot AS (SELECT CAST(sum(c) AS BIGINT) AS n FROM cells),
    edges AS (
      SELECT t.q,
             min(CASE WHEN cum >= CAST(ceil(t.q * n / 10.0) AS BIGINT)
                      THEN v END) AS edge
      FROM cum, tot, unnest(range(1, 10)) AS t(q)
      GROUP BY 1),
    binned AS (
      SELECT o_orderkey,
             (SELECT count(*) FROM edges
              WHERE o_totalprice > edge)::INT AS bin
      FROM orders WHERE o_totalprice IS NOT NULL)
    SELECT bin, count(*)::BIGINT AS n_rows
    FROM binned GROUP BY bin
    """,
)
def q_equifreq_bins(spark, sf_dir):
    """Equal-frequency price binning (validate.equifreq_bins /
    quantile_bounds): exact rank-quantile decile edges from the
    distinct-value cell table (one cumulative cell window — the
    winsorize_bounds machinery generalized to k picks in one
    aggregate), broadcast as a 1-row artifact, then a scan-side
    comparison fold assigns bins. Equi-WIDTH histograms collapse on
    heavy-tailed prices; these bins hold ~n/10 rows each by
    construction. Output: per-bin counts (the balance check)."""
    from parkour_spark.operators.validate import equifreq_bins

    orders = _t(spark, sf_dir, "orders")
    return (
        equifreq_bins(orders, "o_totalprice", 10)
        .groupBy("bin")
        .agg(F.count("*").cast("long").alias("n_rows"))
    )


@query(
    "target_encoding_event_value",
    """
    WITH cat AS (
      SELECT event_type AS key, count(*)::BIGINT AS n,
             CAST(sum(CAST(round(value * 1000000) AS BIGINT)) AS BIGINT)
               AS sum_micro
      FROM events GROUP BY 1),
    tot AS (SELECT CAST(sum(n) AS BIGINT) AS tn,
                   CAST(sum(sum_micro) AS BIGINT) AS ts
            FROM cat)
    SELECT key, n, sum_micro,
           CAST(round((sum_micro + 20 * (ts / CAST(tn AS DOUBLE)))
                      / (n + 20)) AS BIGINT) AS enc_micro
    FROM cat, tot
    """,
)
def q_target_encoding(spark, sf_dir):
    """Smoothed target-encoding table (validate.target_encoding):
    enc(type) = (Σ value + m·prior)/(n + m), m = 20 — the Bayesian-
    average shrinkage that stops rare categories from memorizing their
    few labels. Targets accumulate in integer micro-units BEFORE any
    division; one partial-agg shuffle to the category table, the prior
    a broadcast 1-row aggregate over it; the category-sized result is
    the broadcast artifact training joins back onto the scan."""
    from parkour_spark.operators.validate import target_encoding

    return target_encoding(_t(spark, sf_dir, "events"), "event_type", "value", 20)


@query("minhash_probe_after_append", _minhash_probe_oracle())
def q_minhash_probe_after_append(spark, sf_dir):
    """Index-lifecycle equivalence, gate-pinned: build the MinHash
    index on the content-hash bottom 80% of documents, APPEND the next
    10% (dedup.minhash_index_append — batch pays only its own
    signature scan; the band table re-derives from stored longs so the
    bucket cap stays a global property), then probe with the top 10%.
    The oracle is the COMBINED-BUILD probe (index = bkt < 90), so a
    green row IS the proof that append(B) onto build(A) ≡
    build(A ∪ B) — the guarantee that makes incremental index
    maintenance safe to operate."""
    import tempfile

    from parkour_spark.functions.sampling import hash_bucket

    docs = _t(spark, sf_dir, "documents")
    bkt = hash_bucket(F.col("doc_id"), 100)
    key = (sf_dir, "append")
    if key not in _MINHASH_INDEX_DIRS:
        tmp = tempfile.mkdtemp(prefix="parkour_mhidx_app_")
        D.minhash_index_build(docs.where(bkt < 80), tmp, max_bucket=200)
        D.minhash_index_append(
            docs.where((bkt >= 80) & (bkt < 90)), tmp, max_bucket=200
        )
        _MINHASH_INDEX_DIRS[key] = tmp
    return D.minhash_probe_delta(
        spark, docs.where(bkt >= 90), _MINHASH_INDEX_DIRS[key], threshold=0.8
    )


# ===========================================================================
# Round-8 evaluation/mixture primitives: inter-annotator agreement,
# score calibration, importance-weight effective sample size, Zipf fit.
# ===========================================================================

_KAPPA_SQL = """
    WITH pairs AS (
      SELECT lang AS a,
             CASE WHEN doc_id % 10 = 0 THEN 'xx' ELSE lang END AS b
      FROM documents),
    cells AS (SELECT a, b, count(*)::BIGINT AS c FROM pairs GROUP BY 1, 2),
    ra AS (SELECT a, sum(c)::BIGINT AS r FROM cells GROUP BY 1),
    rb AS (SELECT b, sum(c)::BIGINT AS r FROM cells GROUP BY 1),
    s AS (SELECT coalesce(sum(ra.r * rb.r), 0)::BIGINT AS s
          FROM ra JOIN rb ON ra.a = rb.b),
    base AS (SELECT sum(c)::BIGINT AS n,
                    coalesce(sum(CASE WHEN a = b THEN c END), 0)::BIGINT
                      AS agree
             FROM cells)
    SELECT n, agree, s AS s_chance,
           CAST(round((agree::DOUBLE * n - s)
                      / nullif(n::DOUBLE * n - s, 0) * 1e6) AS BIGINT)
             AS kappa_micro,
           round(CAST(round((agree::DOUBLE * n - s)
                            / nullif(n::DOUBLE * n - s, 0) * 1e6) AS BIGINT)
                 / 1e6, 6) AS kappa
    FROM base, s
"""


@query("kappa_lang_annotators", _KAPPA_SQL)
def q_kappa_lang(spark, sf_dir):
    """Inter-annotator agreement (validate.cohens_kappa): the corpus
    lang labels against a synthetic second annotator that disagrees on
    every 10th doc — chance-corrected agreement from three exact int64
    aggregates over the contingency cells (n, agree, Σ row·col), one
    division at the end. The label-QA primitive for comparing two
    labeling runs / heuristic-vs-model taggers."""
    from parkour_spark.operators.validate import cohens_kappa

    docs = _t(spark, sf_dir, "documents").select(
        F.col("lang").alias("a"),
        F.when(F.col("doc_id") % 10 == 0, F.lit("xx"))
        .otherwise(F.col("lang"))
        .alias("b"),
    )
    return cohens_kappa(docs, "a", "b")


_CALIB_SRC_SQL = """
      SELECT least(value / 500.0, 1.0) AS sc,
             CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS lb
      FROM events WHERE value IS NOT NULL
"""


@query(
    "ece_purchase_value",
    f"""
    WITH s AS ({_CALIB_SRC_SQL}),
    cells AS (
      SELECT least(greatest(floor((sc - 0.0) / 0.1)::BIGINT, 0), 9)
               AS bin,
             count(*)::BIGINT AS n,
             sum(lb)::BIGINT AS n_pos,
             CAST(sum(CAST(round(sc * 1e6) AS BIGINT)) AS BIGINT)
               AS sum_score_micro
      FROM s GROUP BY 1)
    SELECT CAST(sum(n) AS BIGINT) AS n,
           count(*)::BIGINT AS n_bins_used,
           CAST(round(sum(abs(1000000 * n_pos - sum_score_micro))
                      / nullif(CAST(sum(n) AS DOUBLE), 0)) AS BIGINT)
             AS ece_micro,
           round(CAST(round(sum(abs(1000000 * n_pos - sum_score_micro))
                            / nullif(CAST(sum(n) AS DOUBLE), 0)) AS BIGINT)
                 / 1e6, 6) AS ece
    FROM cells
    """,
)
def q_ece(spark, sf_dir):
    """One-row expected calibration error
    (validate.expected_calibration_error — rides the EXISTING
    calibration_bins cells, the quality_calibration_bins machinery):
    Σ_bins |10⁶·pos_b − sum_score_micro_b| / n, every term an exact
    int64, one division. Event value rescaled to a [0, 1]
    "purchase-propensity score" against the actual purchase label —
    the one-number summary the reliability diagram rolls up to."""
    from parkour_spark.operators.validate import expected_calibration_error

    ev = (
        _t(spark, sf_dir, "events")
        .where(F.col("value").isNotNull())
        .select(
            F.least(F.col("value") / 500.0, F.lit(1.0)).alias("sc"),
            (F.col("event_type") == "purchase").alias("lb"),
        )
    )
    return expected_calibration_error(ev, "sc", "lb", bins=10)


@query(
    "ess_event_value_by_type",
    """
    SELECT event_type AS "group",
           count(*)::BIGINT AS n,
           CAST(sum(CAST(floor(value * 1000) AS BIGINT)) AS BIGINT)
             AS s1_milli,
           CAST(sum(CAST(floor(value * 1000) AS BIGINT)
                    * CAST(floor(value * 1000) AS BIGINT)) AS BIGINT)
             AS s2_milli2,
           CAST(round(1000.0 * CAST(sum(CAST(floor(value * 1000) AS BIGINT))
                                    AS BIGINT)
                      * CAST(sum(CAST(floor(value * 1000) AS BIGINT))
                             AS BIGINT)
                      / nullif(CAST(CAST(sum(CAST(floor(value * 1000)
                                               AS BIGINT)
                                           * CAST(floor(value * 1000)
                                                  AS BIGINT)) AS BIGINT)
                                    AS DOUBLE), 0)) AS BIGINT) AS ess_milli,
           CAST(round(1000000.0 * CAST(sum(CAST(floor(value * 1000)
                                             AS BIGINT)) AS BIGINT)
                      * CAST(sum(CAST(floor(value * 1000) AS BIGINT))
                             AS BIGINT)
                      / nullif(CAST(CAST(sum(CAST(floor(value * 1000)
                                               AS BIGINT)
                                           * CAST(floor(value * 1000)
                                                  AS BIGINT)) AS BIGINT)
                                    AS DOUBLE), 0)
                      / count(*)) AS BIGINT) AS ess_ratio_micro
    FROM events WHERE value IS NOT NULL
    GROUP BY event_type
    """,
)
def q_ess_by_type(spark, sf_dir):
    """Importance-weight effective sample size (validate.importance_ess):
    Kish ESS = (Σw)²/Σw² per event_type with event value as the weight
    — the mixture-reweighting diagnostic that flags a slice whose
    weights collapsed onto a few rows. Milli-quantized exact integer
    sums, one double division; one partial-agg shuffle."""
    from parkour_spark.operators.validate import importance_ess

    ev = _t(spark, sf_dir, "events")
    return importance_ess(ev, "value", "event_type")


_ZIPF_SQL = f"""
    WITH terms AS (SELECT unnest({_TOKS_SQL}) AS term FROM documents),
    vocab AS (SELECT term, count(*)::BIGINT AS cnt FROM terms
              GROUP BY term),
    ranked AS (SELECT cnt, row_number() OVER (ORDER BY cnt DESC, term)
                      AS rank
               FROM vocab),
    pts AS (SELECT CAST(round(ln(rank::DOUBLE) * 1e6) AS BIGINT) AS x,
                   CAST(round(ln(cnt::DOUBLE) * 1e6) AS BIGINT) AS y
            FROM ranked WHERE rank <= 100),
    m AS (SELECT count(*)::BIGINT AS n_terms,
                 CAST(sum(x) AS BIGINT) AS sx,
                 CAST(sum(y) AS BIGINT) AS sy,
                 CAST(sum(x * x) AS BIGINT) AS sxx,
                 CAST(sum(x * y) AS BIGINT) AS sxy
          FROM pts)
    SELECT n_terms, sx, sy, sxx, sxy,
           CAST(round((n_terms::DOUBLE * sxy - sx::DOUBLE * sy)
                      / nullif(n_terms::DOUBLE * sxx - sx::DOUBLE * sx, 0)
                      * 1e6) AS BIGINT) AS slope_micro,
           CAST(round((sy::DOUBLE * sxx - sx::DOUBLE * sxy)
                      / nullif(n_terms::DOUBLE * sxx - sx::DOUBLE * sx, 0))
                AS BIGINT) AS intercept_micro
    FROM m
"""


@query("zipf_slope_docs", _ZIPF_SQL)
def q_zipf_slope(spark, sf_dir):
    """Zipf-law fit (corpus.zipf_slope): least-squares slope of
    ln(freq) vs ln(rank) over the top-100 vocabulary head — integer
    micro-log per term, five exact int64 moments, closed-form solve in
    two double divisions. Natural corpora sit near −1; boilerplate
    flattens the head. Rides vocab_head_coverage's TakeOrdered head —
    no full-vocabulary sort."""
    from parkour_spark.operators.corpus import zipf_slope

    return zipf_slope(_t(spark, sf_dir, "documents"), top_n=100)


@query(
    "attrition_docs_pipeline",
    f"""
    WITH d AS (
      SELECT n_chars >= 100 AS p0,
             lang = 'en' AS p1,
             n_chars <= 20000 AS p2,
             len({_TOKS_SQL}) >= 10 AS p3
      FROM documents),
    w AS (
      SELECT count(*)::BIGINT AS n,
             sum(CASE WHEN p0 THEN 1 ELSE 0 END)::BIGINT AS a0,
             sum(CASE WHEN p0 THEN 1 ELSE 0 END)::BIGINT AS s0,
             sum(CASE WHEN p1 THEN 1 ELSE 0 END)::BIGINT AS a1,
             sum(CASE WHEN p0 AND p1 THEN 1 ELSE 0 END)::BIGINT AS s1,
             sum(CASE WHEN p2 THEN 1 ELSE 0 END)::BIGINT AS a2,
             sum(CASE WHEN p0 AND p1 AND p2 THEN 1 ELSE 0 END)::BIGINT AS s2,
             sum(CASE WHEN p3 THEN 1 ELSE 0 END)::BIGINT AS a3,
             sum(CASE WHEN p0 AND p1 AND p2 AND p3 THEN 1 ELSE 0 END)::BIGINT
               AS s3
      FROM d)
    SELECT 0 AS stage_idx, 'input' AS stage, n AS n_pass, n AS n_surviving,
           10000::BIGINT AS retained_bp FROM w
    UNION ALL SELECT 1, 'min_chars', a0, s0,
           CAST(floor(10000 * s0 / CAST(n AS DOUBLE)) AS BIGINT) FROM w
    UNION ALL SELECT 2, 'lang_en', a1, s1,
           CAST(floor(10000 * s1 / CAST(n AS DOUBLE)) AS BIGINT) FROM w
    UNION ALL SELECT 3, 'max_chars', a2, s2,
           CAST(floor(10000 * s2 / CAST(n AS DOUBLE)) AS BIGINT) FROM w
    UNION ALL SELECT 4, 'min_tokens', a3, s3,
           CAST(floor(10000 * s3 / CAST(n AS DOUBLE)) AS BIGINT) FROM w
    """,
)
def q_attrition(spark, sf_dir):
    """Corpus-prep attrition report (validate.filter_attrition): the
    ordered length → language → length-cap → token-count filter chain
    over documents, ONE aggregate pass emitting per-stage standalone
    selectivity (n_pass) and cumulative survival (n_surviving,
    retained_bp) — the table every data-prep run publishes so a
    mixture change is a diff, not a mystery."""
    from parkour_spark.functions.text import token_count
    from parkour_spark.operators.validate import filter_attrition

    docs = _t(spark, sf_dir, "documents")
    return filter_attrition(
        docs,
        [
            ("min_chars", F.col("n_chars") >= 100),
            ("lang_en", F.col("lang") == "en"),
            ("max_chars", F.col("n_chars") <= 20000),
            ("min_tokens", token_count("text") >= 10),
        ],
    )


_IVF_APPEND_DIRS: dict[str, str] = _SfLRUDirs()


@query("ivf_probe_after_append", _ivf_oracle())
def q_ivf_probe_after_append(spark, sf_dir):
    """IVF index-lifecycle equivalence, gate-pinned
    (similarity.ivf_index_append): build the partitioned inverted-list
    index on the content-hash bottom 80% of the corpus, APPEND the
    remaining 20% (the batch pays only its own Arrow assignment scan;
    existing lists are never rewritten; the persisted _ivf_meta
    quantizer guard rejects a different centroid set), then probe with
    the standard query batch. The oracle is the full-corpus IVF
    replay — the same oracle as ivf_topk_cosine — so a green row IS
    the proof that append(B) onto build(A) ≡ build(A ∪ B) for the
    embedding index, completing the build/append/probe trio
    (substring, minhash, IVF) with an append leg each."""
    import tempfile

    from parkour_spark.functions.sampling import hash_bucket
    from parkour_spark.operators.similarity import (
        ivf_index_append,
        ivf_index_build,
        ivf_probe_topk,
    )

    emb = _t(spark, sf_dir, "embeddings")
    cents = _ivf_centroids(spark, sf_dir)
    queries = emb.where(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("query_vec"),
    )
    corpus = emb.where(F.col("vec_id") >= 5)
    bkt = hash_bucket(F.col("vec_id"), 100)
    if sf_dir not in _IVF_APPEND_DIRS:
        tmp = tempfile.mkdtemp(prefix="parkour_ivfidx_app_")
        ivf_index_build(corpus.where(bkt < 80), cents, tmp)
        ivf_index_append(corpus.where(bkt >= 80), cents, tmp)
        _IVF_APPEND_DIRS[sf_dir] = tmp
    return ivf_probe_topk(
        spark, _IVF_APPEND_DIRS[sf_dir], queries, cents, k=10, nprobe=4
    ).select("query_id", "vec_id", "rank", "cos")


@query("streaming_component_stream", _dedup_groups_oracle())
def q_streaming_components(spark, sf_dir):
    """Streaming near-dup component maintenance
    (streaming.windows.streaming_component_maintainer): the corpus's
    MinHash candidate pairs replayed as 4 micro-batches of edges, each
    folding into the PERSISTED (node, component) snapshot through a
    batch-sized contracted CC (cc_delta_update on the
    incremental_rollup_stream recovery skeleton). Exactness is
    ORDER-INSENSITIVE — components of a union of edge sets do not
    depend on arrival order and each fold preserves connectivity — so
    the final table equals batch CC over all pairs and the SAME
    full-closure oracle as dedup_groups gates the entry. Isolated docs
    join back as singletons, exactly the batch keep-policy shape."""
    import tempfile

    from parkour_spark.streaming.windows import (
        streaming_component_maintainer,
    )

    docs = _t(spark, sf_dir, "documents")
    pairs = D.minhash_dedup_pairs(docs, threshold=0.8).select(
        "id_a", "id_b"
    )
    tmp = tempfile.mkdtemp(prefix="parkour_stream_cc_")
    pairs.repartition(4).write.mode("overwrite").parquet(tmp)
    schema = spark.read.parquet(tmp).schema
    state = tempfile.mkdtemp(prefix="parkour_cc_state_")
    comps = streaming_component_maintainer(spark, tmp, schema, state)
    return (
        docs.select("doc_id")
        # no broadcast hint: the component table is node-sized (could be
        # corpus-scale in production) — let AQE pick the join strategy
        .join(comps.withColumnRenamed("id", "doc_id"), "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce("component", F.col("doc_id")).alias("component"),
            (
                F.coalesce("component", F.col("doc_id")) == F.col("doc_id")
            ).alias("is_survivor"),
        )
    )


@query(
    "llr_collocations_docs",
    f"""
    WITH toks AS (SELECT {_TOKS_SQL} AS t FROM documents),
    big AS (
      SELECT t[i] AS w1, t[i+1] AS w2
      FROM toks, unnest(range(1, greatest(len(t), 1))) AS r(i)),
    cells AS (SELECT w1, w2, count(*)::BIGINT AS c12 FROM big
              GROUP BY 1, 2),
    rt AS (SELECT w1, sum(c12)::BIGINT AS r1 FROM cells GROUP BY 1),
    ct AS (SELECT w2, sum(c12)::BIGINT AS c1 FROM cells GROUP BY 1),
    nn AS (SELECT CAST(sum(c12) AS BIGINT) AS n FROM cells),
    j AS (
      SELECT cells.w1, cells.w2, c12, r1, c1, n,
             (n - r1)::BIGINT AS r2, (n - c1)::BIGINT AS c2,
             (r1 - c12)::BIGINT AS k12, (c1 - c12)::BIGINT AS k21,
             (n - r1 - c1 + c12)::BIGINT AS k22
      FROM cells
      JOIN rt ON cells.w1 = rt.w1
      JOIN ct ON cells.w2 = ct.w2, nn
      WHERE c12 >= 5),
    s AS (
      SELECT w1, w2, c12,
             (CASE WHEN c12 > 0 THEN CAST(round(2.0 * c12
                * ln((c12::DOUBLE * n) / (r1::DOUBLE * c1)) * 1e6)
                AS BIGINT) ELSE 0 END
            + CASE WHEN k12 > 0 THEN CAST(round(2.0 * k12
                * ln((k12::DOUBLE * n) / (r1::DOUBLE * c2)) * 1e6)
                AS BIGINT) ELSE 0 END
            + CASE WHEN k21 > 0 THEN CAST(round(2.0 * k21
                * ln((k21::DOUBLE * n) / (r2::DOUBLE * c1)) * 1e6)
                AS BIGINT) ELSE 0 END
            + CASE WHEN k22 > 0 THEN CAST(round(2.0 * k22
                * ln((k22::DOUBLE * n) / (r2::DOUBLE * c2)) * 1e6)
                AS BIGINT) ELSE 0 END)::BIGINT AS llr_micro
      FROM j)
    SELECT w1, w2, c12, llr_micro,
           round(llr_micro / 1e6, 6) AS llr
    FROM s ORDER BY llr_micro DESC, w1, w2 LIMIT 20
    """,
)
def q_llr_collocations(spark, sf_dir):
    """Dunning G² collocations (corpus.llr_collocations): the
    significance-tested complement to pmi_collocations — the 2×2
    bigram contingency's log-likelihood ratio, per-cell integer
    micro-units before the 4-term sum, ranked by the exact integer
    with a (w1, w2) tie-break. One tokenize pass to the bigram cell
    table; margins broadcast; TakeOrdered head."""
    from parkour_spark.operators.corpus import llr_collocations

    return llr_collocations(_t(spark, sf_dir, "documents"))


@query(
    "golden_record_customers",
    """
    WITH src AS (
      SELECT o_custkey, o_orderdate, o_orderkey, o_orderstatus,
             CASE WHEN o_orderkey % 3 = 0 THEN NULL
                  ELSE o_orderpriority END AS prio
      FROM orders),
    g AS (
      SELECT o_custkey AS entity, count(*)::BIGINT AS n_records,
             max({'h': o_orderstatus IS NOT NULL, 'o': o_orderdate,
                  'k': o_orderkey, 'v': o_orderstatus}).v
               AS o_orderstatus_golden,
             max({'h': prio IS NOT NULL, 'o': o_orderdate,
                  'k': o_orderkey, 'v': prio}).v AS prio_golden
      FROM src GROUP BY 1)
    SELECT entity, n_records, o_orderstatus_golden, prio_golden FROM g
    """,
)
def q_golden_record(spark, sf_dir):
    """Survivorship / golden-record merge (cdc.golden_record): per
    customer, each field independently carries the latest NON-NULL
    value by (o_orderdate, o_orderkey) — the priority field is
    deterministically sparsified (every 3rd order) so the gate
    actually exercises the fall-back-past-null behavior row-level
    keep-latest gets wrong. One partial-agg shuffle, k struct-max
    aggregates in the same pass, no window."""
    from parkour_spark.operators.cdc import golden_record

    orders = _t(spark, sf_dir, "orders").select(
        "o_custkey",
        "o_orderdate",
        "o_orderkey",
        "o_orderstatus",
        F.when(F.col("o_orderkey") % 3 == 0, F.lit(None))
        .otherwise(F.col("o_orderpriority"))
        .alias("prio"),
    )
    return golden_record(
        orders, "o_custkey", "o_orderdate", "o_orderkey",
        ["o_orderstatus", "prio"],
    )


@query(
    "corpus_diff_versions",
    """
    WITH old AS (
      SELECT doc_id, md5(text) AS fp, source FROM documents
      WHERE doc_id % 13 <> 0),
    new AS (
      SELECT doc_id,
             md5(CASE WHEN doc_id % 7 = 0 THEN text || ' v2' ELSE text END)
               AS fp,
             source
      FROM documents
      UNION ALL
      SELECT doc_id + (SELECT max(doc_id) + 1 FROM documents),
             md5(text || ' clone'), source
      FROM documents WHERE doc_id % 11 = 0),
    j AS (
      SELECT coalesce(new.source, old.source) AS "group",
             CASE WHEN old.fp IS NULL THEN 'added'
                  WHEN new.fp IS NULL THEN 'removed'
                  WHEN old.fp = new.fp THEN 'unchanged'
                  ELSE 'changed' END AS status
      FROM old FULL OUTER JOIN new ON old.doc_id = new.doc_id)
    SELECT "group", status, count(*)::BIGINT AS n_docs
    FROM j GROUP BY 1, 2
    """,
)
def q_corpus_diff(spark, sf_dir):
    """Corpus version diff (corpus.corpus_diff): the OLD version drops
    every 13th doc, the NEW version rewrites every 7th doc's text and
    clones every 11th doc under fresh ids — per source, exact counts
    of added / removed / changed / unchanged. Both sides reduce to
    (id, md5, source) projections scan-side (text never shuffles), one
    full-outer id join, one partial-agg count — the data-versioning
    report a pipeline change ships with."""
    from parkour_spark.operators.corpus import corpus_diff

    docs = _t(spark, sf_dir, "documents")
    max_id = docs.agg(F.max("doc_id")).first()[0] + 1
    old = docs.where(F.col("doc_id") % 13 != 0)
    new = docs.select(
        "doc_id",
        F.when(
            F.col("doc_id") % 7 == 0, F.concat(F.col("text"), F.lit(" v2"))
        )
        .otherwise(F.col("text"))
        .alias("text"),
        "source",
    ).unionByName(
        docs.where(F.col("doc_id") % 11 == 0).select(
            (F.col("doc_id") + F.lit(max_id)).alias("doc_id"),
            F.concat(F.col("text"), F.lit(" clone")).alias("text"),
            "source",
        )
    )
    return corpus_diff(old, new)


# ===========================================================================
# Round-9: index DELETE legs — probe-after-delete ≡ build(A ∖ B) for all
# three persisted indexes (r8 verdict #2), completing the
# build/append/delete/probe lifecycle. Each entry builds the index on
# (corpus ∪ junk) where the junk docs/vectors are near-identical copies
# of corpus rows — guaranteed to pollute probe results if the delete
# failed to remove them — then deletes the junk and probes. The oracle
# is the SURVIVORS-ONLY build (the same oracle the plain persisted-probe
# entry uses), so a green row IS the identity proof.
# ===========================================================================

_MINHASH_DELETE_DIRS: dict[str, str] = _SfLRUDirs()


@query("minhash_probe_after_delete", _minhash_probe_oracle())
def q_minhash_probe_after_delete(spark, sf_dir):
    """Index-lifecycle DELETE leg, gate-pinned
    (dedup.minhash_index_delete): build the MinHash index on the
    content-hash bottom 90% of documents PLUS exact-copy junk docs
    (bkt < 10 re-idded — identical signatures, so they would
    certainly surface as extra id_old matches and can push shared band
    buckets over the cap), DELETE the junk ids (r11: an O(|B|)
    tombstone-ledger append), COMPACT (the physical reconciliation
    that re-derives bands/ from the survivors — cap resurrection is a
    compaction property under the ledger contract, and this entry's
    junk is DESIGNED to cross cap boundaries, so probing the
    un-reconciled window here would be data-dependent), then probe
    with the top 10%. The oracle is the junk-free build — green ⇒
    delete(B)+compact from build(A ∪ B) ≡ build(A) INCLUDING
    resurrection. The pure read-repair window is pinned by the
    hypothesis property (test_r11_property) and the r9 unit tests."""
    import tempfile

    from parkour_spark.functions.sampling import hash_bucket

    docs = _t(spark, sf_dir, "documents")
    bkt = hash_bucket(F.col("doc_id"), 100)
    junk = docs.where(bkt < 10).select(
        (F.col("doc_id") + F.lit(900_000_000)).alias("doc_id"), "text"
    )
    if sf_dir not in _MINHASH_DELETE_DIRS:
        tmp = tempfile.mkdtemp(prefix="parkour_mhidx_del_")
        D.minhash_index_build(
            docs.where(bkt < 90).select("doc_id", "text").unionByName(junk),
            tmp,
            max_bucket=200,
        )
        D.minhash_index_delete(
            spark, junk.select("doc_id"), tmp, max_bucket=200
        )
        D.minhash_index_compact(spark, tmp)
        _MINHASH_DELETE_DIRS[sf_dir] = tmp
    return D.minhash_probe_delta(
        spark, docs.where(bkt >= 90), _MINHASH_DELETE_DIRS[sf_dir],
        threshold=0.8,
    )


_IVF_DELETE_DIRS: dict[str, str] = _SfLRUDirs()


@query("ivf_probe_after_delete", _ivf_oracle())
def q_ivf_probe_after_delete(spark, sf_dir):
    """IVF index-lifecycle DELETE leg, gate-pinned
    (similarity.ivf_index_delete): build the partitioned inverted-list
    index on the corpus PLUS exact-copy junk vectors (100 corpus
    embeddings re-idded — identical cosines, so they would displace
    genuine top-k rows), DELETE the junk (partition-pruned rewrite of
    ONLY the affected cells via dynamic overwrite; emptied cells
    removed outright), then probe the standard query batch. The oracle
    is the full-corpus IVF replay — the same oracle as ivf_topk — so a
    green row proves delete(B) from build(A ∪ B) ≡ build(A) for the
    embedding index."""
    import tempfile

    from parkour_spark.operators.similarity import (
        ivf_index_build,
        ivf_index_delete,
        ivf_probe_topk,
    )

    emb = _t(spark, sf_dir, "embeddings")
    cents = _ivf_centroids(spark, sf_dir)
    queries = emb.where(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("query_vec"),
    )
    corpus = emb.where(F.col("vec_id") >= 5)
    junk = corpus.where(F.col("vec_id") < 105).select(
        (F.col("vec_id") + F.lit(1_000_000)).alias("vec_id"),
        "embedding",
        "label",
    )
    if sf_dir not in _IVF_DELETE_DIRS:
        tmp = tempfile.mkdtemp(prefix="parkour_ivfidx_del_")
        ivf_index_build(corpus.unionByName(junk), cents, tmp)
        ivf_index_delete(junk, cents, tmp)
        _IVF_DELETE_DIRS[sf_dir] = tmp
    return ivf_probe_topk(
        spark, _IVF_DELETE_DIRS[sf_dir], queries, cents, k=10, nprobe=4
    ).select("query_id", "vec_id", "rank", "cos")


_SUBSTR_DELETE_DIRS: dict[str, str] = _SfLRUDirs()


@query("substring_probe_after_delete", ORACLES["substring_spans_delta"])
def q_substring_probe_after_delete(spark, sf_dir):
    """Substring index-lifecycle DELETE leg, gate-pinned
    (dedup.substring_index_delete + substring_index_compact): build
    the persisted fingerprint index (occ/ + lists/ + meta/) on the
    content-hash bottom 90% of documents PLUS exact-copy junk docs
    (bkt < 10 re-idded — identical fingerprints, so they would surface
    as extra id_old spans AND push shared fps over the df cap), DELETE
    the junk ids (r11: O(|B|) tombstone-ledger append), COMPACT (the
    physical reconciliation that re-derives the df-capped lists from
    the survivors — which RESURRECTS fps whose df fell back under the
    cap; under the ledger contract resurrection is a compaction
    property, the documented staleness window), then probe with the
    top 10% through substring_probe_persisted. The oracle is the
    junk-free delta replay — green ⇒ delete(B)+compact from
    build(A ∪ B) ≡ build(A) INCLUDING cap resurrection. The pure
    read-repair window (delete, no compact) is gate-pinned by
    `substring_probe_delete_readrepair` on cap-safe data."""
    import tempfile

    from parkour_spark.functions.sampling import hash_bucket

    docs = _t(spark, sf_dir, "documents")
    bkt = hash_bucket(F.col("doc_id"), 100)
    junk = docs.where(bkt < 10).select(
        (F.col("doc_id") + F.lit(900_000_000)).alias("doc_id"), "text"
    )
    if sf_dir not in _SUBSTR_DELETE_DIRS:
        tmp = tempfile.mkdtemp(prefix="parkour_subidx_del_")
        D.substring_index_build(
            docs.where(bkt < 90).select("doc_id", "text").unionByName(junk),
            tmp,
        )
        D.substring_index_delete(spark, junk.select("doc_id"), tmp)
        D.substring_index_compact(spark, tmp)
        _SUBSTR_DELETE_DIRS[sf_dir] = tmp
    return D.substring_probe_persisted(
        spark, docs.where(bkt >= 90), _SUBSTR_DELETE_DIRS[sf_dir]
    )


@query(
    "substring_probe_delete_readrepair", _substring_delta_oracle(5000)
)
def q_substring_probe_delete_readrepair(spark, sf_dir):
    """The substring PURE READ-REPAIR window, gate-pinned (r11): build
    the index with an AMPLE df cap (5000 — nothing organic crosses it,
    so cap resurrection cannot confound what this entry isolates) on
    the bottom-90% docs PLUS exact-copy junk (bkt<10 re-idded — their
    fingerprints would surface as extra id_old spans), tombstone-DELETE
    the junk, and probe WITHOUT compacting: the ledger anti-join alone
    must make the probe ≡ the junk-free build (the oracle replays the
    junk-free corpus with the same ample cap). This is the O(|B|)
    delete's everyday serving state — the cap-resurrection window that
    `substring_probe_after_delete` closes with compaction is the ONLY
    delta between the two entries."""
    import tempfile

    from parkour_spark.functions.sampling import hash_bucket

    docs = _t(spark, sf_dir, "documents")
    bkt = hash_bucket(F.col("doc_id"), 100)
    junk = docs.where(bkt < 10).select(
        (F.col("doc_id") + F.lit(900_000_000)).alias("doc_id"), "text"
    )
    key = (sf_dir, "sub_readrepair")
    if key not in _R10_INDEX_DIRS:
        tmp = tempfile.mkdtemp(prefix="parkour_subidx_rr_")
        D.substring_index_build(
            docs.where(bkt < 90).select("doc_id", "text").unionByName(junk),
            tmp,
            max_df=5000,
        )
        D.substring_index_delete(
            spark, junk.select("doc_id"), tmp, max_df=5000
        )
        _R10_INDEX_DIRS[key] = tmp
    return D.substring_probe_persisted(
        spark, docs.where(bkt >= 90), _R10_INDEX_DIRS[key]
    )


# ===========================================================================
# Round-9: baseline JPEG as the REAL expensive codec (r8 verdict #5) —
# operators/jpegcodec.py, from the public T.81/JFIF specs. The corpus
# maps every document to one of 120 distinct 16×16 JPEG payloads
# (deterministic LCG pattern, encoded once per pattern), the exact
# mirror/hotlink duplication shape web media corpora show — the setting
# where decode_distinct's decode-once-per-distinct-blob economics pay.
# ===========================================================================

_JPEG_PATTERNS = 120


def _jpeg_pattern(seed: int, size: int = 16):
    """Deterministic size×size RGB test image: per-seed low-frequency
    sinusoid mixture (frequency/phase/amplitude derived from the seed)
    — smooth like real photographs, so baseline JPEG at q85
    reconstructs it within a tight MAE bound (pure per-pixel noise
    would be the codec's pathological worst case, not its workload),
    while the 120 seeds still produce 120 byte-distinct payloads
    (pinned in tests/test_jpegcodec.py). The gate entries use the
    16×16 default; the sf1 soak uses 48×48 thumbnails for realistic
    per-payload decode work (frequencies scale with size, so the
    image CONTENT is resolution-scaled, not higher-frequency)."""
    import numpy as _np

    fx = 1 + seed % 3
    fy = 1 + (seed // 3) % 4
    amp = 60.0 + ((seed // 12) % 5) * 12.0
    phase = (seed // 60) * _np.pi / 2 + seed * 0.05
    y, x = _np.mgrid[0:size, 0:size].astype(_np.float64)
    r = 127.5 + amp * _np.sin(
        2 * _np.pi * (fx * x + fy * y) / size + phase
    )
    g = 127.5 + amp * _np.sin(
        2 * _np.pi * (fy * x - fx * y) / size - phase
    )
    b = 127.5 + (x + y - (size - 1.0)) * (4.0 + fx) * 16.0 / size
    return (
        _np.clip(_np.stack([r, g, b], axis=-1), 0, 255)
        .round()
        .astype(_np.uint8)
    )


def _jpeg_payload_cached(size: int = 16):
    """Per-process encode cache: the payload is a pure function of the
    pattern seed, so each executor encodes each of the 120 patterns at
    most once regardless of corpus size."""
    import functools

    from parkour_spark.operators.jpegcodec import encode_jpeg

    @functools.lru_cache(maxsize=_JPEG_PATTERNS)
    def enc(seed: int) -> bytes:
        return encode_jpeg(_jpeg_pattern(seed, size), quality=85)

    return enc


def _jpeg_blobs(spark, sf_dir):
    import pandas as _pd

    docs = _t(spark, sf_dir, "documents").select(
        F.col("doc_id").alias("media_id")
    )

    def build(batches):
        enc = _jpeg_payload_cached()
        for pdf in batches:
            yield _pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "payload": [
                        enc(int(m) % _JPEG_PATTERNS)
                        for m in pdf["media_id"]
                    ],
                }
            )

    return SRT.widen_scan(docs).mapInPandas(
        build, "media_id long, payload binary"
    )


@query(
    "multimodal_jpeg_roundtrip",
    """
    SELECT doc_id AS media_id, doc_id % 120 AS pattern,
           16 AS width, 16 AS height, TRUE AS ok
    FROM documents
    """,
)
def q_multimodal_jpeg_roundtrip(spark, sf_dir):
    """Baseline-JPEG encode→decode roundtrip over the whole corpus
    (operators/jpegcodec.py — sequential DCT + Annex-K Huffman, built
    from the public T.81 spec): every row's payload is DECODED with the
    real entropy decoder + IDCT, and `ok` pins dims AND mean absolute
    error vs the regenerated original ≤ 8 (lossy-codec bound at q85).
    DCT/Huffman aren't SQL-expressible, so the oracle checks the
    SQL-derivable fields exactly and the codec invariants as pinned
    booleans (the approx_user_counts bound-check pattern); the codec's
    bit-level behavior is separately golden-pinned in
    tests/test_jpegcodec.py. Arrow-batched mapInPandas, blobs never
    shuffle."""
    import pandas as _pd

    from parkour_spark.operators.multimodal import rebatch_for_blobs

    blobs = _jpeg_blobs(spark, sf_dir)

    def work(batches):
        import numpy as _np

        from parkour_spark.operators.jpegcodec import decode_jpeg

        for pdf in batches:
            out = {"media_id": [], "pattern": [], "width": [],
                   "height": [], "ok": []}
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                seed = int(mid) % _JPEG_PATTERNS
                try:
                    img = decode_jpeg(bytes(payload))
                    orig = _jpeg_pattern(seed)
                    mae = float(
                        _np.abs(
                            img.astype(_np.int64)
                            - orig.astype(_np.int64)
                        ).mean()
                    )
                    ok = img.shape == (16, 16, 3) and mae <= 8.0
                    h, w = img.shape[0], img.shape[1]
                except ValueError:
                    ok, h, w = False, -1, -1
                out["media_id"].append(int(mid))
                out["pattern"].append(seed)
                out["width"].append(w)
                out["height"].append(h)
                out["ok"].append(ok)
            yield _pd.DataFrame(out)

    return rebatch_for_blobs(blobs).mapInPandas(
        work,
        "media_id long, pattern long, width int, height int, ok boolean",
    )


@query(
    "multimodal_jpeg_dedup_agree",
    """
    SELECT doc_id AS media_id, doc_id % 120 AS pattern, TRUE AS paths_agree
    FROM documents
    """,
)
def q_multimodal_jpeg_dedup_agree(spark, sf_dir):
    """Dedup-first JPEG decode identity, gate-pinned: the per-row dhash
    path (every payload decoded — 1 expensive JPEG decode per ROW) and
    the dedup-first path (decode_distinct — 1 decode per DISTINCT
    payload, 120 here) must agree on every row's hash; `paths_agree` is
    the null-safe equality, pinned TRUE across the corpus. This is the
    wall-clock-relevant codec for the dedup-first economics (r8 verdict
    #5 — the PNG/PPM codecs were too cheap for the decode-count win to
    show as time; scripts/soak_sf1.py measures the ratio at 10×)."""
    from parkour_spark.operators.multimodal import (
        decode_distinct,
        perceptual_dhash,
    )

    blobs = _jpeg_blobs(spark, sf_dir).persist()
    per_row = perceptual_dhash(blobs).select(
        "media_id", F.col("dhash").alias("__h1")
    )
    dedup = decode_distinct(blobs, perceptual_dhash).select(
        "media_id", F.col("dhash").alias("__h2")
    )
    return (
        per_row.join(dedup, "media_id")
        .select(
            "media_id",
            (F.col("media_id") % _JPEG_PATTERNS).alias("pattern"),
            F.col("__h1").eqNullSafe(F.col("__h2")).alias("paths_agree"),
        )
    )


# ===========================================================================
# Round-9 additions (second wave): privacy audit, probabilistic record
# linkage, ANN recall evaluation — the release-gate operators a corpus
# publishes alongside its content (SURVEY §7.6 MDM/eval families).
# ===========================================================================


@query(
    "k_anonymity_docs",
    """
    WITH base AS (
      SELECT lang, source, doc_id % 7 AS sens FROM documents),
    cells AS (
      SELECT lang, source, sens, count(*) AS c
      FROM base GROUP BY 1, 2, 3),
    classes AS (
      SELECT lang, source, sum(c) AS n, count(*) AS l
      FROM cells GROUP BY 1, 2)
    SELECT sum(n)::BIGINT AS n_rows,
           count(*)::BIGINT AS n_classes,
           min(n)::BIGINT AS min_class_size,
           sum(CASE WHEN n < 5 THEN 1 ELSE 0 END)::BIGINT
             AS n_violating_classes,
           sum(CASE WHEN n < 5 THEN n ELSE 0 END)::BIGINT AS rows_at_risk,
           min(l)::BIGINT AS min_l_diversity,
           sum(CASE WHEN l < 3 THEN 1 ELSE 0 END)::BIGINT
             AS n_low_diversity_classes,
           sum(CASE WHEN l < 3 THEN n ELSE 0 END)::BIGINT
             AS rows_low_diversity
    FROM classes
    """,
)
def q_k_anonymity(spark, sf_dir):
    """k-anonymity + l-diversity audit (validate.k_anonymity_report,
    Sweeney 2002 / Machanavajjhala 2007): (lang, source) as the
    quasi-identifier, a synthetic 7-way category as the sensitive
    attribute — the privacy release-gate a corpus export runs before
    leaving the pipeline. Exact one-row report; the class table
    (distinct quasi-combinations) is the only shuffle, identifier-
    domain-sized, never row-sized."""
    from parkour_spark.operators.validate import k_anonymity_report

    base = _t(spark, sf_dir, "documents").select(
        "lang", "source", (F.col("doc_id") % 7).alias("sens")
    )
    return k_anonymity_report(
        base, ["lang", "source"], k=5, sensitive_col="sens", l_threshold=3
    )


def _fs_oracle() -> str:
    from parkour_spark.operators.linkage import fs_weights_micro

    wn_a, wn_d = fs_weights_micro(0.9, 0.001)
    wp_a, wp_d = fs_weights_micro(0.95, 0.2)
    wb_a, wb_d = fs_weights_micro(0.9, 0.01)
    hi, lo = 5_000_000, 0
    return f"""
    WITH a AS (
      SELECT c_custkey AS id_a, c_nationkey AS blk,
             c_name AS name_a, c_mktsegment AS phone_a,
             CAST(round(c_acctbal * 100) AS BIGINT) AS bal_a
      FROM customer),
    blocks_ok AS (
      SELECT blk FROM a GROUP BY blk HAVING count(*) <= 1000),
    b AS (
      SELECT c_custkey + 10000000 AS id_b, c_nationkey AS blk,
             CASE WHEN c_custkey % 3 = 0 THEN c_name || ' jr'
                  ELSE c_name END AS name_b,
             CASE WHEN c_custkey % 4 = 0 THEN NULL
                  ELSE c_mktsegment END AS phone_b,
             CAST(round(c_acctbal * 100) AS BIGINT)
               + CASE WHEN c_custkey % 5 = 0 THEN 1 ELSE 0 END AS bal_b
      FROM customer),
    pairs AS (
      SELECT id_a, id_b, name_a, name_b, phone_a, phone_b, bal_a, bal_b
      FROM (SELECT a.* FROM a JOIN blocks_ok USING (blk)) a
      JOIN b USING (blk)),
    scored AS (
      SELECT id_a, id_b,
             (CASE WHEN name_a IS NULL OR name_b IS NULL THEN 0
                   WHEN name_a = name_b THEN {wn_a} ELSE {wn_d} END
              + CASE WHEN phone_a IS NULL OR phone_b IS NULL THEN 0
                     WHEN phone_a = phone_b THEN {wp_a} ELSE {wp_d} END
              + CASE WHEN bal_a IS NULL OR bal_b IS NULL THEN 0
                     WHEN bal_a = bal_b THEN {wb_a} ELSE {wb_d} END
             )::BIGINT AS score_micro
      FROM pairs)
    SELECT id_a, id_b, score_micro,
           CASE WHEN score_micro >= {hi} THEN 'match'
                WHEN score_micro <= {lo} THEN 'non_match'
                ELSE 'possible' END AS decision
    FROM scored
    WHERE score_micro > {lo}
    """


@query("fs_linkage_customers", _fs_oracle())
def q_fs_linkage(spark, sf_dir):
    """Fellegi–Sunter probabilistic record linkage
    (operators.linkage, JASA 1969 — the model behind Splink/Zingg):
    the customer table linked against a deterministically-corrupted
    re-crawl of itself (every 3rd name suffixed, every 4th segment
    dropped, every 5th balance off by a cent), blocked on nationkey,
    scored with integer micro-nat log-likelihood weights and
    classified match/possible/non_match. Output keeps pairs above the
    non-match floor (the review queue + auto-links; the quadratic
    rejected mass stays unsent). Engine-exact by the inlined-integer-
    weight discipline; blocking bounds candidates at Σ_b |A_b|·|B_b|,
    with the hot-block cap every candidate generator here carries."""
    from parkour_spark.operators.linkage import blocked_pairs, fs_score

    cust = _t(spark, sf_dir, "customer")
    a = cust.select(
        F.col("c_custkey").alias("id"),
        F.col("c_nationkey").alias("blk"),
        F.col("c_name").alias("name"),
        F.col("c_mktsegment").alias("seg"),
        F.round(F.col("c_acctbal") * 100).cast("long").alias("bal"),
    )
    b = cust.select(
        (F.col("c_custkey") + 10_000_000).alias("id"),
        F.col("c_nationkey").alias("blk"),
        F.when(
            F.col("c_custkey") % 3 == 0, F.concat(F.col("c_name"), F.lit(" jr"))
        )
        .otherwise(F.col("c_name"))
        .alias("name"),
        F.when(F.col("c_custkey") % 4 == 0, F.lit(None).cast("string"))
        .otherwise(F.col("c_mktsegment"))
        .alias("seg"),
        (
            F.round(F.col("c_acctbal") * 100).cast("long")
            + F.when(F.col("c_custkey") % 5 == 0, 1).otherwise(0)
        ).alias("bal"),
    )
    pairs = blocked_pairs(a, b, "blk", id_col="id", max_block=1000)
    scored = fs_score(
        pairs,
        {"name": (0.9, 0.001), "seg": (0.95, 0.2), "bal": (0.9, 0.01)},
        match_threshold_micro=5_000_000,
        non_match_threshold_micro=0,
    )
    return scored.where(F.col("score_micro") > 0).select(
        "id_a", "id_b", "score_micro", "decision"
    )


def _ivf_recall_oracle() -> str:
    from textwrap import dedent

    ivf = _ivf_oracle()
    exact = """
    WITH q AS (SELECT vec_id AS query_id, embedding FROM embeddings WHERE vec_id < 5),
    c AS (SELECT vec_id, embedding FROM embeddings WHERE vec_id >= 5),
    scored AS (
      SELECT q.query_id, c.vec_id,
             round(list_dot_product(c.embedding::DOUBLE[], q.embedding::DOUBLE[])
                   / (sqrt(list_dot_product(c.embedding::DOUBLE[], c.embedding::DOUBLE[]))
                      * sqrt(list_dot_product(q.embedding::DOUBLE[], q.embedding::DOUBLE[]))), 4) AS cos
      FROM c, q)
    SELECT query_id, vec_id FROM (
      SELECT *, row_number() OVER (PARTITION BY query_id ORDER BY cos DESC, vec_id) AS rank
      FROM scored)
    WHERE rank <= 10
    """
    return dedent(f"""
    SELECT e.query_id,
           count(i.vec_id)::BIGINT AS n_hits,
           CAST(floor(10000.0 * count(i.vec_id) / count(*)) AS BIGINT)
             AS recall_bp
    FROM ({exact}) e
    LEFT JOIN ({ivf}) i
      ON e.query_id = i.query_id AND e.vec_id = i.vec_id
    GROUP BY e.query_id
    """)


@query("ivf_recall_at_k", _ivf_recall_oracle())
def q_ivf_recall(spark, sf_dir):
    """ANN quality evaluation: per-query recall@10 of the IVF probe
    path against the brute-force exact top-10 — the number an ANN
    deployment tracks when tuning nprobe/cells (recall_bp in exact
    basis points, so the comparison is integer-exact). Both arms are
    the engine's own operators; the join is top-k-output-sized (the
    corpus is scanned once per arm, nothing row-sized shuffles). At
    100 TB the exact arm runs on an evaluation SAMPLE of queries —
    the standard recall-estimation protocol — while the IVF arm is
    the production path."""
    emb = _t(spark, sf_dir, "embeddings")
    cents = _ivf_centroids(spark, sf_dir)
    queries = emb.where(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("query_vec"),
    )
    corpus = emb.where(F.col("vec_id") >= 5)
    exact = SIM.brute_force_topk(corpus, queries, k=10).select(
        "query_id", "vec_id"
    )
    approx = SIM.ivf_topk(
        corpus, queries, cents, k=10, nprobe=4, assign_engine="arrow"
    ).select("query_id", "vec_id", F.lit(1).alias("__hit"))
    return (
        exact.join(approx, ["query_id", "vec_id"], "left")
        .groupBy("query_id")
        .agg(
            F.sum(F.coalesce("__hit", F.lit(0))).cast("long").alias("n_hits"),
            F.count(F.lit(1)).alias("__k"),
        )
        .select(
            "query_id",
            "n_hits",
            F.floor(F.lit(10000.0) * F.col("n_hits") / F.col("__k"))
            .cast("long")
            .alias("recall_bp"),
        )
    )


_SUBSTR_APPEND_DIRS: dict[str, str] = _SfLRUDirs()


@query("substring_probe_after_append", ORACLES["substring_spans_delta"])
def q_substring_probe_after_append(spark, sf_dir):
    """Substring index-lifecycle APPEND leg, gate-pinned
    (dedup.substring_index_append): build the persisted fingerprint
    index on the content-hash bottom 80% of documents, APPEND the next
    10% (the batch pays only its own winnowed scan; the probe lists
    re-derive from stored occurrences with the df cap re-applied
    globally — a batch pushing a fp over the cap drops it exactly as a
    fresh build would), then probe with the top 10% through
    substring_probe_persisted. The oracle is the combined-build delta
    replay (index = bkt < 90), so a green row IS the proof that
    append(B) onto build(A) ≡ build(A ∪ B) for the text index —
    matching the minhash/IVF append legs, so all three persisted
    indexes now gate-pin BOTH lifecycle mutations."""
    import tempfile

    from parkour_spark.functions.sampling import hash_bucket

    docs = _t(spark, sf_dir, "documents")
    bkt = hash_bucket(F.col("doc_id"), 100)
    if sf_dir not in _SUBSTR_APPEND_DIRS:
        tmp = tempfile.mkdtemp(prefix="parkour_subidx_app_")
        D.substring_index_build(
            docs.where(bkt < 80).select("doc_id", "text"), tmp
        )
        D.substring_index_append(
            docs.where((bkt >= 80) & (bkt < 90)).select("doc_id", "text"),
            tmp,
        )
        _SUBSTR_APPEND_DIRS[sf_dir] = tmp
    return D.substring_probe_persisted(
        spark, docs.where(bkt >= 90), _SUBSTR_APPEND_DIRS[sf_dir]
    )


def _mdm_oracle() -> str:
    from parkour_spark.operators.linkage import fs_weights_micro

    wn_a, wn_d = fs_weights_micro(0.9, 0.001)
    wp_a, wp_d = fs_weights_micro(0.95, 0.2)
    wb_a, wb_d = fs_weights_micro(0.9, 0.01)
    hi = 5_000_000
    return f"""
    WITH RECURSIVE recs AS (
      SELECT c_custkey AS rid, c_nationkey AS blk, c_name AS name,
             c_mktsegment AS seg,
             CAST(round(c_acctbal * 100) AS BIGINT) AS bal, 1 AS version
      FROM customer
      UNION ALL
      SELECT c_custkey + 10000000, c_nationkey,
             CASE WHEN c_custkey % 3 = 0 THEN c_name || ' jr'
                  ELSE c_name END,
             CASE WHEN c_custkey % 4 = 0 THEN NULL
                  ELSE c_mktsegment END,
             CAST(round(c_acctbal * 100) AS BIGINT)
               + CASE WHEN c_custkey % 5 = 0 THEN 1 ELSE 0 END, 2
      FROM customer),
    blocks_ok AS (
      SELECT blk FROM recs WHERE version = 1
      GROUP BY blk HAVING count(*) <= 1000),
    scored AS (
      SELECT a.rid AS id_a, b.rid AS id_b,
             (CASE WHEN a.name IS NULL OR b.name IS NULL THEN 0
                   WHEN a.name = b.name THEN {wn_a} ELSE {wn_d} END
              + CASE WHEN a.seg IS NULL OR b.seg IS NULL THEN 0
                     WHEN a.seg = b.seg THEN {wp_a} ELSE {wp_d} END
              + CASE WHEN a.bal IS NULL OR b.bal IS NULL THEN 0
                     WHEN a.bal = b.bal THEN {wb_a} ELSE {wb_d} END
             )::BIGINT AS score_micro
      FROM (SELECT recs.* FROM recs JOIN blocks_ok USING (blk)
            WHERE version = 1) a
      JOIN (SELECT * FROM recs WHERE version = 2) b USING (blk)),
    matches AS (SELECT id_a, id_b FROM scored
                WHERE score_micro >= {hi}),
    edges AS (SELECT id_a AS a, id_b AS b FROM matches
              UNION SELECT id_b, id_a FROM matches),
    reach(n, m) AS (
      SELECT rid, rid FROM recs
      UNION
      SELECT r.n, e.b FROM reach r JOIN edges e ON r.m = e.a),
    comp AS (SELECT n AS rid, min(m) AS entity FROM reach GROUP BY n),
    j AS (SELECT comp.entity, recs.* FROM recs JOIN comp USING (rid))
    SELECT entity, count(*)::BIGINT AS n_records,
           (max(struct_pack(h := name IS NOT NULL, o := version,
                            k := rid, v := name))).v AS name_golden,
           (max(struct_pack(h := seg IS NOT NULL, o := version,
                            k := rid, v := seg))).v AS seg_golden,
           (max(struct_pack(h := bal IS NOT NULL, o := version,
                            k := rid, v := bal))).v AS bal_golden
    FROM j GROUP BY entity
    """


@query("mdm_golden_pipeline", _mdm_oracle())
def q_mdm_golden_pipeline(spark, sf_dir):
    """End-to-end MDM: Fellegi–Sunter linkage (operators.linkage) →
    connected components over the auto-link matches (operators.graph)
    → golden-record survivorship per resolved entity
    (operators.cdc.golden_record) — the full entity-resolution
    pipeline a master-data system runs, composed from three
    already-gated operators and gated AS A WHOLE against a recursive-
    closure SQL replay (the composition is where subtle contract
    mismatches hide — id namespaces, NULL-field fallback, singleton
    handling — so the chain gets its own oracle). The corrupted twins
    link to their originals (except the custkey%15 double-corruptions,
    which stay singleton entities on BOTH sides); the golden record
    takes the newest non-null per FIELD, so a twin's dropped segment
    falls back to the original's value while its newer name wins —
    exactly what row-level keep-latest gets wrong.

    SCALE: linkage candidates are block-bounded, the component table
    is node-sized, and survivorship is ONE partial-agg shuffle of k
    struct-max aggregates — no stage touches row-pair volume beyond
    the blocked candidates."""
    from parkour_spark.operators.cdc import golden_record
    from parkour_spark.operators.graph import connected_components
    from parkour_spark.operators.linkage import blocked_pairs, fs_score

    cust = _t(spark, sf_dir, "customer")
    a = cust.select(
        F.col("c_custkey").alias("id"),
        F.col("c_nationkey").alias("blk"),
        F.col("c_name").alias("name"),
        F.col("c_mktsegment").alias("seg"),
        F.round(F.col("c_acctbal") * 100).cast("long").alias("bal"),
    )
    b = cust.select(
        (F.col("c_custkey") + 10_000_000).alias("id"),
        F.col("c_nationkey").alias("blk"),
        F.when(
            F.col("c_custkey") % 3 == 0,
            F.concat(F.col("c_name"), F.lit(" jr")),
        )
        .otherwise(F.col("c_name"))
        .alias("name"),
        F.when(F.col("c_custkey") % 4 == 0, F.lit(None).cast("string"))
        .otherwise(F.col("c_mktsegment"))
        .alias("seg"),
        (
            F.round(F.col("c_acctbal") * 100).cast("long")
            + F.when(F.col("c_custkey") % 5 == 0, 1).otherwise(0)
        ).alias("bal"),
    )
    matches = fs_score(
        blocked_pairs(a, b, "blk", id_col="id", max_block=1000),
        {"name": (0.9, 0.001), "seg": (0.95, 0.2), "bal": (0.9, 0.01)},
        match_threshold_micro=5_000_000,
        non_match_threshold_micro=0,
    ).where(F.col("decision") == "match").select("id_a", "id_b")
    records = a.withColumn("version", F.lit(1)).unionByName(
        b.withColumn("version", F.lit(2))
    )
    comps = connected_components(
        records.select("id"), matches, node_col="id"
    )
    merged = records.join(
        comps.withColumnRenamed("n", "id"), "id"
    ).withColumnRenamed("component", "ent")
    return (
        golden_record(
            merged.withColumnRenamed("ent", "entity_key"),
            "entity_key",
            "version",
            "id",
            ["name", "seg", "bal"],
        )
        .select(
            F.col("entity").alias("entity"),
            "n_records",
            "name_golden",
            "seg_golden",
            "bal_golden",
        )
    )


def _fs_tf_oracle() -> str:
    from parkour_spark.operators.linkage import fs_weights_micro

    _, wn_d = fs_weights_micro(0.9, 0.001)
    _, wp_d = fs_weights_micro(0.95, 0.2)
    wb_a, wb_d = fs_weights_micro(0.9, 0.01)
    hi, lo = 5_000_000, 0
    return f"""
    WITH n_ref AS (SELECT count(*)::DOUBLE AS n FROM customer),
    wname AS (
      SELECT c_name AS value,
             CAST(round(1e6 * ln(0.9 * n / count(*))) AS BIGINT) AS w
      FROM customer, n_ref GROUP BY c_name, n),
    wseg AS (
      SELECT c_mktsegment AS value,
             CAST(round(1e6 * ln(0.95 * n / count(*))) AS BIGINT) AS w
      FROM customer, n_ref GROUP BY c_mktsegment, n),
    a AS (
      SELECT c_custkey AS id_a, c_nationkey AS blk,
             c_name AS name_a, c_mktsegment AS seg_a,
             CAST(round(c_acctbal * 100) AS BIGINT) AS bal_a
      FROM customer),
    blocks_ok AS (
      SELECT blk FROM a GROUP BY blk HAVING count(*) <= 1000),
    b AS (
      SELECT c_custkey + 10000000 AS id_b, c_nationkey AS blk,
             CASE WHEN c_custkey % 3 = 0 THEN c_name || ' jr'
                  ELSE c_name END AS name_b,
             CASE WHEN c_custkey % 4 = 0 THEN NULL
                  ELSE c_mktsegment END AS seg_b,
             CAST(round(c_acctbal * 100) AS BIGINT)
               + CASE WHEN c_custkey % 5 = 0 THEN 1 ELSE 0 END AS bal_b
      FROM customer),
    pairs AS (
      SELECT id_a, id_b, name_a, name_b, seg_a, seg_b, bal_a, bal_b
      FROM (SELECT a.* FROM a JOIN blocks_ok USING (blk)) a
      JOIN b USING (blk)),
    scored AS (
      SELECT id_a, id_b,
             (CASE WHEN name_a IS NULL OR name_b IS NULL THEN 0
                   WHEN name_a = name_b
                   THEN coalesce((SELECT w FROM wname
                                  WHERE wname.value = name_a), 6802395)
                   ELSE {wn_d} END
              + CASE WHEN seg_a IS NULL OR seg_b IS NULL THEN 0
                     WHEN seg_a = seg_b
                     THEN coalesce((SELECT w FROM wseg
                                    WHERE wseg.value = seg_a), 1558145)
                     ELSE {wp_d} END
              + CASE WHEN bal_a IS NULL OR bal_b IS NULL THEN 0
                     WHEN bal_a = bal_b THEN {wb_a} ELSE {wb_d} END
             )::BIGINT AS score_micro
      FROM pairs)
    SELECT id_a, id_b, score_micro,
           CASE WHEN score_micro >= {hi} THEN 'match'
                WHEN score_micro <= {lo} THEN 'non_match'
                ELSE 'possible' END AS decision
    FROM scored
    WHERE score_micro > {lo}
    """


@query("fs_linkage_tf_customers", _fs_tf_oracle())
def q_fs_linkage_tf(spark, sf_dir):
    """Term-frequency-adjusted Fellegi–Sunter linkage
    (operators.linkage.fs_tf_weights — Splink's headline refinement):
    the same corrupted-twin corpus as fs_linkage_customers, but
    agreement on name and segment scores the VALUE's own weight —
    round(1e6·ln(m·n/cnt_v)) from the master table's term frequencies
    — so agreeing on a unique name is near-conclusive (≈7.21 vs the
    global 6.80 micro-nats) while agreeing on one of five common
    segments stays weak, each segment by its actual share. The weight
    tables are value-domain-sized broadcast artifacts; the scorer adds
    one broadcast hash join per TF field and keeps the exact-int64
    score, so the oracle replays every pair bit-for-bit (F.log →
    micro-round is the nb_train cross-engine discipline)."""
    from parkour_spark.operators.linkage import (
        blocked_pairs,
        fs_score,
        fs_tf_weights,
    )

    cust = _t(spark, sf_dir, "customer")
    a = cust.select(
        F.col("c_custkey").alias("id"),
        F.col("c_nationkey").alias("blk"),
        F.col("c_name").alias("name"),
        F.col("c_mktsegment").alias("seg"),
        F.round(F.col("c_acctbal") * 100).cast("long").alias("bal"),
    )
    b = cust.select(
        (F.col("c_custkey") + 10_000_000).alias("id"),
        F.col("c_nationkey").alias("blk"),
        F.when(
            F.col("c_custkey") % 3 == 0,
            F.concat(F.col("c_name"), F.lit(" jr")),
        )
        .otherwise(F.col("c_name"))
        .alias("name"),
        F.when(F.col("c_custkey") % 4 == 0, F.lit(None).cast("string"))
        .otherwise(F.col("c_mktsegment"))
        .alias("seg"),
        (
            F.round(F.col("c_acctbal") * 100).cast("long")
            + F.when(F.col("c_custkey") % 5 == 0, 1).otherwise(0)
        ).alias("bal"),
    )
    tf = {
        "name": fs_tf_weights(cust.select(F.col("c_name").alias("name")), "name", 0.9),
        "seg": fs_tf_weights(cust.select(F.col("c_mktsegment").alias("seg")), "seg", 0.95),
    }
    scored = fs_score(
        blocked_pairs(a, b, "blk", id_col="id", max_block=1000),
        {"name": (0.9, 0.001), "seg": (0.95, 0.2), "bal": (0.9, 0.01)},
        match_threshold_micro=5_000_000,
        non_match_threshold_micro=0,
        tf_weights=tf,
    )
    return scored.where(F.col("score_micro") > 0).select(
        "id_a", "id_b", "score_micro", "decision"
    )


@query(
    "multimodal_gif_frames",
    """
    WITH v AS (SELECT doc_id AS media_id, 1 + doc_id % 5 AS n_frames
               FROM documents),
    fr AS (SELECT media_id, unnest(range(0, n_frames)) AS frame_idx FROM v),
    px AS (SELECT media_id, frame_idx, unnest(range(0, 72)) AS p FROM fr),
    s AS (SELECT media_id, frame_idx,
                 sum((media_id * 2654435761 + frame_idx * 97 + p * 40503)
                     % 256)::BIGINT AS gray_sum
          FROM px GROUP BY 1, 2)
    SELECT media_id, frame_idx::INT AS frame_idx,
           (frame_idx * 1000)::BIGINT AS frame_ms, gray_sum
    FROM s
    """,
)
def q_multimodal_gif_frames(spark, sf_dir):
    """REAL video-frame sampling end to end (operators.gifcodec — a
    from-scratch GIF89a LZW codec — through
    multimodal.sample_video_frames): every doc becomes an animated GIF
    of 1 + doc_id%5 formula frames; the row-expanding UDTF-shaped
    transform derives the duration from the CONTAINER BYTES
    (gif_duration_ms — crawled metadata lies, the container doesn't),
    extracts each sampled frame with the real LZW decoder
    (gif_frame_codec → PNG), and the per-frame gray sums are computed
    from the DECODED pixels. GIF is lossless (palette indices decode
    bit-exactly), so the oracle recomputes every pixel arithmetically —
    the whole encode → LZW → sub-blocks → decode → PNG → decode chain
    is hash-verified, not trusted. Blobs never shuffle; frames emit
    incrementally inside the scan."""
    import pandas as _pd

    from parkour_spark.operators.multimodal import (
        gif_frame_codec,
        rebatch_for_blobs,
        sample_video_frames,
    )

    docs = _t(spark, sf_dir, "documents").select(
        F.col("doc_id").alias("media_id")
    )

    def build(batches):
        import numpy as _np

        from parkour_spark.operators.gifcodec import encode_gif

        pal = _np.stack([_np.arange(256)] * 3, axis=1).astype(_np.uint8)
        for pdf in batches:
            payloads = []
            for mid in pdf["media_id"]:
                mid = int(mid)
                n = 1 + mid % 5
                frames = [
                    (
                        (
                            mid * 2654435761
                            + k * 97
                            + _np.arange(72, dtype=_np.int64) * 40503
                        )
                        % 256
                    )
                    .astype(_np.uint8)
                    .reshape(8, 9)
                    for k in range(n)
                ]
                payloads.append(encode_gif(frames, pal, delay_cs=100))
            yield _pd.DataFrame(
                {"media_id": pdf["media_id"], "payload": payloads}
            )

    blobs = SRT.widen_scan(docs).mapInPandas(
        build, "media_id long, payload binary"
    ).withColumn("meta", F.lit(None).cast("map<string,long>"))

    from parkour_spark.operators.gifcodec import gif_duration_ms

    frames = sample_video_frames(
        rebatch_for_blobs(blobs),
        every_ms=1000,
        codec=gif_frame_codec,
        duration_fn=gif_duration_ms,
    )

    def gray_sum(batches):
        import numpy as _np

        from parkour_spark.operators.imagecodec import decode_image

        for pdf in batches:
            sums = [
                int(
                    decode_image(bytes(fr))[:, :, 0]
                    .astype(_np.int64)
                    .sum()
                )
                for fr in pdf["frame"]
            ]
            out = pdf[["media_id", "frame_idx", "frame_ms"]].copy()
            out["gray_sum"] = sums
            yield out

    return frames.mapInPandas(
        gray_sum,
        "media_id long, frame_idx int, frame_ms long, gray_sum long",
    )


_STREAM_MH_DIRS: dict[str, str] = _SfLRUDirs()


@query("streaming_minhash_ingest_probe", _minhash_probe_oracle())
def q_streaming_minhash_ingest(spark, sf_dir):
    """EXACTLY-ONCE streaming index ingestion, gate-pinned
    (streaming.windows.streaming_minhash_ingest): the content-hash
    bottom 90% of documents replays as a 4-batch file stream, each
    micro-batch's signatures landing as an atomically-published
    `sigs/batch=<id>/` partition (the directory IS the commit marker —
    a replayed batch skips, a torn write never occupies the name; the
    r9 artifact contract applied to an index instead of a snapshot),
    with the band table re-derived per batch. The probe (top 10%) runs
    against the drained index and the oracle is the COMBINED-BUILD
    probe — a green row proves ingest(Σ batches) ≡ build(all), the
    streaming analog of the append-leg identity, which is what makes
    continuous index maintenance safe to operate."""
    import tempfile

    from parkour_spark.functions.sampling import hash_bucket
    from parkour_spark.streaming.windows import streaming_minhash_ingest

    docs = _t(spark, sf_dir, "documents")
    bkt = hash_bucket(F.col("doc_id"), 100)
    if sf_dir not in _STREAM_MH_DIRS:
        src = tempfile.mkdtemp(prefix="parkour_mh_stream_src_")
        corpus = docs.where(bkt < 90).select("doc_id", "text")
        corpus.repartition(4).write.mode("overwrite").parquet(src)
        schema = spark.read.parquet(src).schema
        idx = tempfile.mkdtemp(prefix="parkour_mh_stream_idx_")
        streaming_minhash_ingest(
            spark, src, schema, idx, max_bucket=200
        )
        _STREAM_MH_DIRS[sf_dir] = idx
    return D.minhash_probe_delta(
        spark, docs.where(bkt >= 90), _STREAM_MH_DIRS[sf_dir],
        threshold=0.8,
    )


@query(
    "blocking_quality_customers",
    """
    WITH b AS (
      SELECT c_custkey + 10000000 AS id_b,
             CASE WHEN c_custkey % 4 = 0 THEN NULL
                  ELSE c_mktsegment END AS blk
      FROM customer),
    a AS (SELECT c_custkey AS id_a, c_mktsegment AS blk FROM customer),
    blocks_ok AS (
      SELECT blk FROM a GROUP BY blk HAVING count(*) <= 100000),
    cand AS (
      SELECT DISTINCT id_a, id_b
      FROM (SELECT a.* FROM a JOIN blocks_ok USING (blk)) a
      JOIN b USING (blk)),
    truth AS (SELECT c_custkey AS id_a, c_custkey + 10000000 AS id_b
              FROM customer),
    n AS (SELECT count(*)::BIGINT AS n FROM customer),
    agg AS (
      SELECT (SELECT count(*) FROM cand)::BIGINT AS n_candidates,
             (SELECT count(*) FROM truth)::BIGINT AS n_true,
             (SELECT count(*) FROM cand JOIN truth
              USING (id_a, id_b))::BIGINT AS n_found,
             (SELECT n * n FROM n)::BIGINT AS total)
    SELECT n_candidates, n_true, n_found,
           (10000 * n_found) // n_true AS pc_bp,
           (10000 * (total - n_candidates)) // total AS rr_bp
    FROM agg
    """,
)
def q_blocking_quality(spark, sf_dir):
    """Blocking-scheme evaluation (linkage.blocking_quality — pair
    completeness + reduction ratio, the two numbers a blocking scheme
    is tuned by): the corrupted-twin corpus blocked on the B side's
    SEGMENT, which is NULL on every 4th twin — so the twins whose
    segment was nulled (≈25%) never become candidates, and PC prices
    that miss exactly, while the 5-segment blocking eliminates ~80% of
    the quadratic space. The report prices
    the trade a finer second blocking pass would close; everything is
    exact counts + basis points."""
    from parkour_spark.operators.linkage import (
        blocked_pairs,
        blocking_quality,
    )

    cust = _t(spark, sf_dir, "customer")
    a = cust.select(
        F.col("c_custkey").alias("id"),
        F.col("c_mktsegment").alias("blk"),
    )
    b = cust.select(
        (F.col("c_custkey") + 10_000_000).alias("id"),
        F.when(F.col("c_custkey") % 4 == 0, F.lit(None).cast("string"))
        .otherwise(F.col("c_mktsegment"))
        .alias("blk"),
    )
    cand = blocked_pairs(a, b, "blk", id_col="id", max_block=100_000)
    truth = cust.select(
        F.col("c_custkey").alias("id_a"),
        (F.col("c_custkey") + 10_000_000).alias("id_b"),
    )
    n = cust.count()
    return blocking_quality(cand, truth, n, n)


_STREAM_IVF_DIRS: dict[str, str] = _SfLRUDirs()


@query("streaming_ivf_ingest_probe", _ivf_oracle())
def q_streaming_ivf_ingest(spark, sf_dir):
    """EXACTLY-ONCE streaming IVF ingestion, gate-pinned
    (streaming.windows.streaming_ivf_ingest): the embedding corpus
    replays as a 4-batch file stream, each batch's assigned vectors
    landing as an atomically-published batch=<id>/cell=<c> partition
    tree (the batch directory is the commit marker — replays skip,
    torn writes never occupy the name). The probe is the UNCHANGED
    ivf_probe_topk over the same root: underscore paths are invisible,
    and the static cell filter prunes files across batch directories —
    partition pruning composes with the ingest layout. The oracle is
    the full-corpus IVF replay, so a green row proves
    ingest(Σ batches) ≡ build(all) for the embedding index — the
    streaming leg that completes the lifecycle symmetry with the
    document index."""
    import tempfile

    from parkour_spark.operators.similarity import ivf_probe_topk
    from parkour_spark.streaming.windows import streaming_ivf_ingest

    emb = _t(spark, sf_dir, "embeddings")
    cents = _ivf_centroids(spark, sf_dir)
    queries = emb.where(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("query_vec"),
    )
    corpus = emb.where(F.col("vec_id") >= 5)
    if sf_dir not in _STREAM_IVF_DIRS:
        src = tempfile.mkdtemp(prefix="parkour_ivf_stream_src_")
        corpus.repartition(4).write.mode("overwrite").parquet(src)
        schema = spark.read.parquet(src).schema
        idx = tempfile.mkdtemp(prefix="parkour_ivf_stream_idx_")
        streaming_ivf_ingest(spark, src, schema, idx, cents)
        _STREAM_IVF_DIRS[sf_dir] = idx
    return ivf_probe_topk(
        spark, _STREAM_IVF_DIRS[sf_dir], queries, cents, k=10, nprobe=4
    ).select("query_id", "vec_id", "rank", "cos")


@query("minhash_probe_after_compact", _minhash_probe_oracle())
def q_minhash_probe_after_compact(spark, sf_dir):
    """Compaction identity, gate-pinned (dedup.minhash_index_compact):
    build the index on the content-hash bottom 80%, append the next
    10% (two file sets in sigs/), COMPACT the signature table into a
    handful of files, then probe with the top 10%. The oracle is the
    combined-build probe — a green row proves compaction changes ZERO
    rows while fixing the small-files growth that append/streaming
    ingest accumulate (the footer-read soup concern at ingest rates of
    many batches per hour)."""
    import tempfile

    from parkour_spark.functions.sampling import hash_bucket

    docs = _t(spark, sf_dir, "documents")
    bkt = hash_bucket(F.col("doc_id"), 100)
    key = (sf_dir, "compact")
    if key not in _MINHASH_INDEX_DIRS:
        tmp = tempfile.mkdtemp(prefix="parkour_mhidx_cmp_")
        D.minhash_index_build(docs.where(bkt < 80), tmp, max_bucket=200)
        D.minhash_index_append(
            docs.where((bkt >= 80) & (bkt < 90)), tmp, max_bucket=200
        )
        D.minhash_index_compact(spark, tmp, n_files=4)
        _MINHASH_INDEX_DIRS[key] = tmp
    return D.minhash_probe_delta(
        spark, docs.where(bkt >= 90), _MINHASH_INDEX_DIRS[key],
        threshold=0.8,
    )


_STREAM_SUB_DIRS: dict[str, str] = _SfLRUDirs()


@query("streaming_substring_ingest_probe", ORACLES["substring_spans_delta"])
def q_streaming_substring_ingest(spark, sf_dir):
    """EXACTLY-ONCE streaming substring-index ingestion, gate-pinned
    (streaming.windows.streaming_substring_ingest): the content-hash
    bottom 90% of documents replays as a 4-batch file stream, each
    batch's positioned fingerprints landing as an atomically-published
    occ/batch=<id> partition with the probe lists re-derived per batch
    (cap applied to the full membership). The probe (top 10%) runs
    through the unchanged substring_probe_persisted and the oracle is
    the combined-build delta replay — ingest(Σ batches) ≡ build(all),
    closing the streaming leg for ALL THREE persisted indexes."""
    import tempfile

    from parkour_spark.functions.sampling import hash_bucket
    from parkour_spark.streaming.windows import (
        streaming_substring_ingest,
    )

    docs = _t(spark, sf_dir, "documents")
    bkt = hash_bucket(F.col("doc_id"), 100)
    if sf_dir not in _STREAM_SUB_DIRS:
        src = tempfile.mkdtemp(prefix="parkour_sub_stream_src_")
        docs.where(bkt < 90).select("doc_id", "text").repartition(
            4
        ).write.mode("overwrite").parquet(src)
        schema = spark.read.parquet(src).schema
        idx = tempfile.mkdtemp(prefix="parkour_sub_stream_idx_")
        streaming_substring_ingest(spark, src, schema, idx)
        _STREAM_SUB_DIRS[sf_dir] = idx
    return D.substring_probe_persisted(
        spark, docs.where(bkt >= 90), _STREAM_SUB_DIRS[sf_dir]
    )


# ===========================================================================
# r10: persisted PQ index lifecycle (operators/pq.py) — r9 verdict #2:
# bring PQ up to the house standard the other three persisted indexes
# set (build/append/delete/probe, codebooks + codes persisted via the
# artifacts contract; reference anchor: the dseq/dsink write-then-read-
# back contract, /root/reference/src/clojure/parkour/io/dsink.clj:14-44)
# ===========================================================================


class _SfLRUDirsWide(_SfLRUDirs):
    """_SfLRUDirs sized for the r10 index-entry family: ~24 (sf_dir,
    tag) keys live in ONE process during a full-registry gate run, and
    the default MAX=4 would evict (rmtree) an index dir after four
    later entries ran — forcing rebuilds on any re-invocation and
    leaving a latent hazard for not-yet-materialized DataFrames that
    still reference the dir (r10 review). 48 bounds disk at two
    sf_dirs x 24 tags while never evicting mid-run."""

    MAX = 48


_R10_INDEX_DIRS: dict = _SfLRUDirsWide()


def _pq_queries(spark, sf_dir):
    emb = _t(spark, sf_dir, "embeddings")
    return [
        (int(r["vec_id"]), [float(x) for x in r["embedding"]])
        for r in emb.where(F.col("vec_id") < 5)
        .select("vec_id", "embedding")
        .collect()
    ]


def _pq_trained(spark, sf_dir):
    from parkour_spark.operators.pq import pq_train

    if sf_dir not in _PQ_CODEBOOKS:
        _PQ_CODEBOOKS[sf_dir] = pq_train(
            _t(spark, sf_dir, "embeddings"), m=4, ksub=8, iters=2
        )
    return _PQ_CODEBOOKS[sf_dir]


@query("pq_probe_persisted", _pq_oracle())
def q_pq_probe_persisted(spark, sf_dir):
    """ADC top-k served ENTIRELY from the persisted PQ index
    (pq.pq_index_build + pq_probe_adc): codebooks train once (the
    cached quantizer every PQ entry shares), build persists codes/ +
    meta/, and the probe reads ONLY the stored m-longs-per-row codes —
    vectors are never re-read at query time, which is the point of PQ
    at 100 TB (the corpus serves from ~m bytes/vector of I/O). Probe
    arithmetic is exactly pq_adc_topk's on exactly pq_encode's codes,
    so the same full-replay oracle gates both: a green row proves
    probe(build(A)) ≡ in-line ADC over A."""
    import tempfile

    from parkour_spark.operators.pq import pq_index_build, pq_probe_adc

    emb = _t(spark, sf_dir, "embeddings")
    cbs = _pq_trained(spark, sf_dir)
    key = (sf_dir, "pq")
    if key not in _R10_INDEX_DIRS:
        tmp = tempfile.mkdtemp(prefix="parkour_pqidx_")
        pq_index_build(emb, cbs, tmp)
        _R10_INDEX_DIRS[key] = tmp
    return pq_probe_adc(spark, _R10_INDEX_DIRS[key], _pq_queries(spark, sf_dir), k=10)


@query("pq_probe_after_append", _pq_oracle())
def q_pq_probe_after_append(spark, sf_dir):
    """Append identity for the PQ index: build on vec_id % 10 != 7,
    append the rest (encoded with the PERSISTED codebooks — the batch
    pays only its own encode scan), probe. Codes are per-row pure
    given the stored quantizer, so append(B) onto build(A) ≡
    build(A ∪ B) — the oracle is the full-corpus replay, same as the
    build leg. A green row is the license to run continuous ingest
    against the compressed index without rebuilds."""
    import tempfile

    from parkour_spark.operators.pq import (
        pq_index_append,
        pq_index_build,
        pq_probe_adc,
    )

    emb = _t(spark, sf_dir, "embeddings")
    cbs = _pq_trained(spark, sf_dir)
    key = (sf_dir, "pq_append")
    if key not in _R10_INDEX_DIRS:
        tmp = tempfile.mkdtemp(prefix="parkour_pqidx_app_")
        pq_index_build(emb.where(F.col("vec_id") % 10 != 7), cbs, tmp)
        pq_index_append(
            emb.where(F.col("vec_id") % 10 == 7), tmp, codebooks=cbs
        )
        _R10_INDEX_DIRS[key] = tmp
    return pq_probe_adc(spark, _R10_INDEX_DIRS[key], _pq_queries(spark, sf_dir), k=10)


@query(
    "pq_probe_after_delete",
    _pq_oracle(corpus_where="e.vec_id % 10 <> 7"),
)
def q_pq_probe_after_delete(spark, sf_dir):
    """Delete identity for the PQ index (the retire leg): build on the
    full corpus, physically remove vec_id % 10 == 7 (one broadcast
    anti-join rewrite of the codes table — vectors never re-read,
    published atomically), probe. delete(B) from build(A) ≡
    build(A ∖ B) because codes are per-row pure and the codebooks are
    fixed at build — the oracle is the same replay with the SCORED
    corpus filtered to the survivors (training unfiltered, exactly as
    the persisted quantizer behaves). Query ids (vec_id < 5) are not
    in the delete set, so every query still scores the surviving
    corpus."""
    import tempfile

    from parkour_spark.operators.pq import (
        pq_index_build,
        pq_index_delete,
        pq_probe_adc,
    )

    emb = _t(spark, sf_dir, "embeddings")
    cbs = _pq_trained(spark, sf_dir)
    key = (sf_dir, "pq_delete")
    if key not in _R10_INDEX_DIRS:
        tmp = tempfile.mkdtemp(prefix="parkour_pqidx_del_")
        pq_index_build(emb, cbs, tmp)
        pq_index_delete(
            spark, emb.where(F.col("vec_id") % 10 == 7).select("vec_id"), tmp
        )
        _R10_INDEX_DIRS[key] = tmp
    return pq_probe_adc(spark, _R10_INDEX_DIRS[key], _pq_queries(spark, sf_dir), k=10)


# ===========================================================================
# r10: compaction symmetry (r9 verdict #3) — every persisted index now
# gate-pins probe-after-compact ≡ probe-before
# ===========================================================================


@query("ivf_probe_after_compact", _ivf_oracle())
def q_ivf_probe_after_compact(spark, sf_dir):
    """IVF compaction identity, gate-pinned (similarity.
    ivf_index_compact): build the inverted-list index on the
    content-hash bottom 80% of the corpus, append the rest (extra file
    sets inside the cell partitions), COMPACT into the canonical
    one-file-set-per-cell build layout (stored rows rewritten;
    assignment never recomputed; quantizer record carried across the
    atomic whole-root swap), then probe. The oracle is the full-corpus
    IVF replay — a green row proves compaction changes ZERO rows while
    restoring the layout that keeps probe-time partition pruning
    opening O(probed cells) files instead of O(probed cells × ingest
    batches)."""
    import tempfile

    from parkour_spark.functions.sampling import hash_bucket
    from parkour_spark.operators.similarity import (
        ivf_index_append,
        ivf_index_build,
        ivf_index_compact,
        ivf_probe_topk,
    )

    emb = _t(spark, sf_dir, "embeddings")
    cents = _ivf_centroids(spark, sf_dir)
    queries = emb.where(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("query_vec"),
    )
    corpus = emb.where(F.col("vec_id") >= 5)
    bkt = hash_bucket(F.col("vec_id"), 100)
    key = (sf_dir, "ivf_compact")
    if key not in _R10_INDEX_DIRS:
        tmp = tempfile.mkdtemp(prefix="parkour_ivfidx_cmp_")
        ivf_index_build(corpus.where(bkt < 80), cents, tmp)
        ivf_index_append(corpus.where(bkt >= 80), cents, tmp)
        ivf_index_compact(spark, tmp)
        _R10_INDEX_DIRS[key] = tmp
    return ivf_probe_topk(
        spark, _R10_INDEX_DIRS[key], queries, cents, k=10, nprobe=4
    ).select("query_id", "vec_id", "rank", "cos")


@query("substring_probe_after_compact", ORACLES["substring_spans_delta"])
def q_substring_probe_after_compact(spark, sf_dir):
    """Substring-index compaction identity, gate-pinned
    (dedup.substring_index_compact — implemented in r9, tests only;
    this entry closes the r9 verdict's 'not gate-pinned' gap): build
    on the content-hash bottom 80% of documents, append the next 10%
    (second file set in occ/), COMPACT the occurrence table into a
    handful of files (exact row preservation, atomic publish; lists/
    is derived state and stays valid), then probe the top 10% through
    substring_probe_persisted. The oracle is the combined-build delta
    replay — a green row proves probe-after-compact ≡ probe-before."""
    import tempfile

    from parkour_spark.functions.sampling import hash_bucket

    docs = _t(spark, sf_dir, "documents")
    bkt = hash_bucket(F.col("doc_id"), 100)
    key = (sf_dir, "sub_compact")
    if key not in _R10_INDEX_DIRS:
        tmp = tempfile.mkdtemp(prefix="parkour_subidx_cmp_")
        D.substring_index_build(
            docs.where(bkt < 80).select("doc_id", "text"), tmp
        )
        D.substring_index_append(
            docs.where((bkt >= 80) & (bkt < 90)).select("doc_id", "text"),
            tmp,
        )
        D.substring_index_compact(spark, tmp, n_files=4)
        _R10_INDEX_DIRS[key] = tmp
    return D.substring_probe_persisted(
        spark, docs.where(bkt >= 90), _R10_INDEX_DIRS[key]
    )


# ===========================================================================
# r10: streaming ingest → compact → probe, end-to-end (r9 verdict #4) —
# the full five-leg lifecycle (build/append/delete/ingest/compact) is
# what a production index actually runs; one gated entry per index
# pins the whole pipeline against the batch-build oracle
# ===========================================================================


@query("minhash_ingest_compact_probe", _minhash_probe_oracle())
def q_minhash_ingest_compact_probe(spark, sf_dir):
    """END-TO-END index pipeline for the document MinHash index: the
    content-hash bottom 90% of documents streams in as a 4-batch
    exactly-once ingest (one atomically-published sigs/batch=<id>
    partition per micro-batch), the drained index is COMPACTED (the
    per-batch file sets fold into 4 files, batch column dropped, band
    table untouched — it is wholesale-derived state), and the top 10%
    probes the result. The oracle is the combined-build probe, so ONE
    green row proves the composition ingest(Σ batches) → compact ≡
    build(all) — the operating loop a continuously-maintained index
    actually runs, not just its legs in isolation."""
    import tempfile

    from parkour_spark.functions.sampling import hash_bucket
    from parkour_spark.streaming.windows import streaming_minhash_ingest

    docs = _t(spark, sf_dir, "documents")
    bkt = hash_bucket(F.col("doc_id"), 100)
    key = (sf_dir, "mh_icp")
    if key not in _R10_INDEX_DIRS:
        src = tempfile.mkdtemp(prefix="parkour_mh_icp_src_")
        docs.where(bkt < 90).select("doc_id", "text").repartition(
            4
        ).write.mode("overwrite").parquet(src)
        schema = spark.read.parquet(src).schema
        idx = tempfile.mkdtemp(prefix="parkour_mh_icp_idx_")
        streaming_minhash_ingest(spark, src, schema, idx, max_bucket=200)
        D.minhash_index_compact(spark, idx, n_files=4)
        _R10_INDEX_DIRS[key] = idx
    return D.minhash_probe_delta(
        spark, docs.where(bkt >= 90), _R10_INDEX_DIRS[key], threshold=0.8
    )


@query("ivf_ingest_compact_probe", _ivf_oracle())
def q_ivf_ingest_compact_probe(spark, sf_dir):
    """END-TO-END pipeline for the embedding IVF index: the corpus
    streams in as a 4-batch exactly-once ingest (one published
    batch=<id>/cell=<c> subtree per micro-batch), the drained root is
    COMPACTED into the canonical one-file-set-per-cell build layout
    (ivf_index_compact — rows rewritten, assignment never recomputed,
    quantizer carried), and the standard query batch probes the
    result. Oracle = the full-corpus IVF replay: one green row proves
    ingest → compact ≡ build for the embedding index, with the
    compacted layout restoring O(probed cells) file opens per query
    batch."""
    import tempfile

    from parkour_spark.operators.similarity import (
        ivf_index_compact,
        ivf_probe_topk,
    )
    from parkour_spark.streaming.windows import streaming_ivf_ingest

    emb = _t(spark, sf_dir, "embeddings")
    cents = _ivf_centroids(spark, sf_dir)
    queries = emb.where(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("query_vec"),
    )
    corpus = emb.where(F.col("vec_id") >= 5)
    key = (sf_dir, "ivf_icp")
    if key not in _R10_INDEX_DIRS:
        src = tempfile.mkdtemp(prefix="parkour_ivf_icp_src_")
        corpus.repartition(4).write.mode("overwrite").parquet(src)
        schema = spark.read.parquet(src).schema
        idx = tempfile.mkdtemp(prefix="parkour_ivf_icp_idx_")
        streaming_ivf_ingest(spark, src, schema, idx, cents)
        ivf_index_compact(spark, idx)
        _R10_INDEX_DIRS[key] = idx
    return ivf_probe_topk(
        spark, _R10_INDEX_DIRS[key], queries, cents, k=10, nprobe=4
    ).select("query_id", "vec_id", "rank", "cos")


@query("substring_ingest_compact_probe", ORACLES["substring_spans_delta"])
def q_substring_ingest_compact_probe(spark, sf_dir):
    """END-TO-END pipeline for the substring fingerprint index: 4-batch
    exactly-once ingest of the content-hash bottom 90% (one published
    occ/batch=<id> partition per micro-batch, probe lists re-derived
    per batch), COMPACT the occurrence table (batch file sets fold
    into 4 files; lists/ is wholesale-derived state and stays valid),
    probe the top 10% through substring_probe_persisted. Oracle = the
    combined-build delta replay: ingest → compact ≡ build for the text
    index, completing the five-leg lifecycle
    (build/append/delete/ingest/compact) symmetry across all three
    streaming-fed indexes."""
    import tempfile

    from parkour_spark.functions.sampling import hash_bucket
    from parkour_spark.streaming.windows import streaming_substring_ingest

    docs = _t(spark, sf_dir, "documents")
    bkt = hash_bucket(F.col("doc_id"), 100)
    key = (sf_dir, "sub_icp")
    if key not in _R10_INDEX_DIRS:
        src = tempfile.mkdtemp(prefix="parkour_sub_icp_src_")
        docs.where(bkt < 90).select("doc_id", "text").repartition(
            4
        ).write.mode("overwrite").parquet(src)
        schema = spark.read.parquet(src).schema
        idx = tempfile.mkdtemp(prefix="parkour_sub_icp_idx_")
        streaming_substring_ingest(spark, src, schema, idx)
        D.substring_index_compact(spark, idx, n_files=4)
        _R10_INDEX_DIRS[key] = idx
    return D.substring_probe_persisted(
        spark, docs.where(bkt >= 90), _R10_INDEX_DIRS[key]
    )


# ===========================================================================
# r10: batch-greedy BPE training (operators/bpe.py — r9 verdict #5)
# ===========================================================================


def _bpe_batched_oracle(n_rounds: int, batch: int) -> str:
    """Replay of bpe_train_batched's trajectory: per round — pair
    counts over the current vocab, the (count DESC, lhs, rhs)-ranked
    top slice, the NOT-EXISTS symbol-conflict filter (select a pair
    iff it shares no symbol with any higher-ranked top-slice pair),
    and the selected merges applied in rank order via a recursive-CTE
    replace chain (replace's left-to-right non-overlapping semantics
    are identical in Spark and DuckDB, so the whole trajectory is
    engine-exact)."""
    parts, sels, prev = [], [], "v0"
    for r in range(1, n_rounds + 1):
        parts.append(f"""
t{r} AS (
  SELECT lhs, rhs, c, row_number() OVER (ORDER BY c DESC, lhs, rhs) AS rk
  FROM (
    SELECT syms[i] AS lhs, syms[i+1] AS rhs, CAST(sum(wc) AS BIGINT) AS c
    FROM (SELECT wc, string_split(trim(s, '<>'), '><') AS syms FROM {prev}),
         unnest(range(1, len(syms))) AS u(i)
    GROUP BY 1, 2)
  ORDER BY c DESC, lhs, rhs LIMIT {batch}),
s{r} AS (
  SELECT lhs, rhs, c, CAST(row_number() OVER (ORDER BY rk) AS INT) AS rk
  FROM t{r} t
  WHERE NOT EXISTS (
    SELECT 1 FROM t{r} u WHERE u.rk < t.rk
      AND (u.lhs IN (t.lhs, t.rhs) OR u.rhs IN (t.lhs, t.rhs)
           OR (u.lhs || u.rhs) IN (t.lhs, t.rhs)))),
a{r} AS (
  SELECT word, wc, s, 0 AS j FROM {prev}
  UNION ALL
  SELECT a.word, a.wc,
         replace(a.s, '<' || b.lhs || '><' || b.rhs || '>',
                 '<' || b.lhs || b.rhs || '>') AS s,
         a.j + 1
  FROM a{r} a JOIN s{r} b ON b.rk = a.j + 1),
v{r} AS (
  SELECT word, wc, s FROM a{r}
  WHERE j = (SELECT count(*) FROM s{r}))""")
        sels.append(
            f"SELECT {r} AS round, rk, lhs, rhs, c AS pair_count FROM s{r}"
        )
        prev = f"v{r}"
    merged = " UNION ALL ".join(sels)
    return (
        _BPE_PROLOGUE.replace("WITH words", "WITH RECURSIVE words")
        + ",".join(parts)
        + f"""
    SELECT CAST(row_number() OVER (ORDER BY round, rk) AS INT) AS step,
           round, rk, lhs, rhs, pair_count
    FROM ({merged})
    """
    )


_BPE_BATCH_ROUNDS, _BPE_BATCH_M = 3, 6


@query(
    "bpe_train_merges_scaled",
    _bpe_batched_oracle(_BPE_BATCH_ROUNDS, _BPE_BATCH_M),
)
def q_bpe_train_batched(spark, sf_dir):
    """Batch-greedy BPE training (operators/bpe.bpe_train_batched —
    the scale path): 3 rounds × up-to-6 merges each over the corpus
    vocabulary. Each round pays ONE vocab-sized pair-count shuffle and
    one batch-row driver fetch, then applies its pairwise
    symbol-disjoint selection scan-side in rank order — so the round
    count (the only per-merge serial cost) is ~n_merges/batch instead
    of n_merges, which is what makes a 30k-merge production vocabulary
    trainable. The oracle replays the full batched trajectory
    (top-slice, conflict filter, recursive replace chain) in DuckDB —
    exact, not invariant-checked."""
    from parkour_spark.operators.bpe import bpe_train_batched

    docs = _t(spark, sf_dir, "documents")
    words = (
        docs.select(F.explode(F.split(F.trim("text"), r"\s+")).alias("word"))
        .where(F.col("word") != "")
        .groupBy("word")
        .agg(F.count("*").alias("wc"))
    )
    return bpe_train_batched(
        words, n_rounds=_BPE_BATCH_ROUNDS, batch=_BPE_BATCH_M
    )


# ===========================================================================
# r10 late additions (lead the r11 (a) class): PQ streaming ingest +
# compaction legs — the fourth index reaches full five-leg ×
# end-to-end symmetry with the other three
# ===========================================================================


@query("pq_probe_after_compact", _pq_oracle())
def q_pq_probe_after_compact(spark, sf_dir):
    """PQ compaction identity, gate-pinned (pq.pq_index_compact):
    build on vec_id % 10 != 7 with the shared trained codebooks,
    append the rest (second file set in codes/), COMPACT the codes
    table into 4 files (exact row preservation, atomic publish), then
    probe. Oracle = the full-corpus PQ replay — compaction changes
    ZERO rows, matching the minhash/ivf/substring compaction
    guarantees for the fourth index."""
    import tempfile

    from parkour_spark.operators.pq import (
        pq_index_append,
        pq_index_build,
        pq_index_compact,
        pq_probe_adc,
    )

    emb = _t(spark, sf_dir, "embeddings")
    cbs = _pq_trained(spark, sf_dir)
    key = (sf_dir, "pq_compact")
    if key not in _R10_INDEX_DIRS:
        tmp = tempfile.mkdtemp(prefix="parkour_pqidx_cmp_")
        pq_index_build(emb.where(F.col("vec_id") % 10 != 7), cbs, tmp)
        pq_index_append(emb.where(F.col("vec_id") % 10 == 7), tmp)
        pq_index_compact(spark, tmp, n_files=4)
        _R10_INDEX_DIRS[key] = tmp
    return pq_probe_adc(
        spark, _R10_INDEX_DIRS[key], _pq_queries(spark, sf_dir), k=10
    )


@query("streaming_pq_ingest_probe", _pq_oracle())
def q_streaming_pq_ingest(spark, sf_dir):
    """EXACTLY-ONCE streaming PQ ingestion, gate-pinned
    (streaming.windows.streaming_pq_ingest): the embedding corpus
    replays as a 4-batch file stream, each batch Arrow-encoded against
    the FIXED persisted codebooks and landing as an
    atomically-published codes/batch=<id> partition (the directory is
    the commit marker — replays skip, torn writes never occupy the
    name; codes are the index's ONLY state, so — like IVF and unlike
    minhash/substring — the skip path has no derived table to catch
    up). The probe is the unchanged pq_probe_adc over the same root
    (the batch column rides the schema, ignored by the probe), and the
    oracle is the full-corpus PQ replay: ingest(Σ batches) ≡
    build(all) for the fourth persisted index — streaming-leg symmetry
    complete across the whole index family."""
    import tempfile

    from parkour_spark.operators.pq import pq_probe_adc
    from parkour_spark.streaming.windows import streaming_pq_ingest

    emb = _t(spark, sf_dir, "embeddings")
    cbs = _pq_trained(spark, sf_dir)
    key = (sf_dir, "pq_stream")
    if key not in _R10_INDEX_DIRS:
        src = tempfile.mkdtemp(prefix="parkour_pq_stream_src_")
        emb.select("vec_id", "embedding").repartition(4).write.mode(
            "overwrite"
        ).parquet(src)
        schema = spark.read.parquet(src).schema
        idx = tempfile.mkdtemp(prefix="parkour_pq_stream_idx_")
        streaming_pq_ingest(spark, src, schema, idx, cbs)
        _R10_INDEX_DIRS[key] = idx
    return pq_probe_adc(
        spark, _R10_INDEX_DIRS[key], _pq_queries(spark, sf_dir), k=10
    )


@query("pq_ingest_compact_probe", _pq_oracle())
def q_pq_ingest_compact_probe(spark, sf_dir):
    """END-TO-END pipeline for the PQ index: 4-batch exactly-once
    streaming ingest (codes/batch=<id> commit-marker dirs), drain,
    COMPACT into the canonical flat codes table, probe from stored
    codes. Oracle = the full-corpus PQ replay: ingest → compact ≡
    build for the fourth index — all four persisted indexes now gate
    the composed operating loop, not just its legs."""
    import tempfile

    from parkour_spark.operators.pq import pq_index_compact, pq_probe_adc
    from parkour_spark.streaming.windows import streaming_pq_ingest

    emb = _t(spark, sf_dir, "embeddings")
    cbs = _pq_trained(spark, sf_dir)
    key = (sf_dir, "pq_icp")
    if key not in _R10_INDEX_DIRS:
        src = tempfile.mkdtemp(prefix="parkour_pq_icp_src_")
        emb.select("vec_id", "embedding").repartition(4).write.mode(
            "overwrite"
        ).parquet(src)
        schema = spark.read.parquet(src).schema
        idx = tempfile.mkdtemp(prefix="parkour_pq_icp_idx_")
        streaming_pq_ingest(spark, src, schema, idx, cbs)
        pq_index_compact(spark, idx, n_files=4)
        _R10_INDEX_DIRS[key] = idx
    return pq_probe_adc(
        spark, _R10_INDEX_DIRS[key], _pq_queries(spark, sf_dir), k=10
    )


# ===========================================================================
# r10 late additions: persisted IVF-PQ composite index (operators/pq.py)
# — the FAISS IndexIVFPQ serving architecture as an artifact: partition
# pruning from the coarse quantizer × m-byte candidates from the codes
# ===========================================================================


def _ivfpq_quantizers(spark, sf_dir):
    from parkour_spark.operators.pq import kmeans_l2, pq_train, residual_df

    emb = _t(spark, sf_dir, "embeddings")
    if sf_dir not in _IVFPQ_INDEX:
        coarse = kmeans_l2(emb, k=8, iters=2)
        res = residual_df(emb, coarse).select(
            "vec_id", F.col("res").alias("embedding")
        )
        cbs = pq_train(res, m=4, ksub=8, iters=2)
        _IVFPQ_INDEX[sf_dir] = (coarse, cbs)
    return _IVFPQ_INDEX[sf_dir]


@query("ivfpq_probe_persisted", _ivfpq_oracle())
def q_ivfpq_probe_persisted(spark, sf_dir):
    """IVF-PQ served ENTIRELY from the persisted composite index
    (pq.ivfpq_index_build + ivfpq_probe_topk): both quantizers train
    once (the cached pair ivfpq_topk_l2 shares), ONE assign+encode
    scan persists residual codes partitionBy(cell), and the probe
    opens ONLY the nprobe probed cells' code files (static partition
    filter from the persisted coarse centroids) scoring candidates
    through stored codes — vectors are never read at query time. The
    two scale levers compose: partition pruning cuts the candidate set
    to probed lists, PQ cuts each candidate to m longs of I/O.
    Arithmetic is exactly ivfpq_topk's on exactly its codes, so the
    same full-replay oracle gates both."""
    import tempfile

    from parkour_spark.operators.pq import ivfpq_index_build, ivfpq_probe_topk

    emb = _t(spark, sf_dir, "embeddings")
    coarse, cbs = _ivfpq_quantizers(spark, sf_dir)
    key = (sf_dir, "ivfpq")
    if key not in _R10_INDEX_DIRS:
        tmp = tempfile.mkdtemp(prefix="parkour_ivfpqidx_")
        ivfpq_index_build(emb, coarse, cbs, tmp)
        _R10_INDEX_DIRS[key] = tmp
    queries = _pq_queries(spark, sf_dir)
    return ivfpq_probe_topk(
        spark, _R10_INDEX_DIRS[key], queries, k=10, nprobe=2
    )


@query("ivfpq_probe_refined", _ivfpq_oracle(refine_from=30))
def q_ivfpq_probe_refined(spark, sf_dir):
    """FAISS-style REFINE over the persisted composite index (r11,
    pq.ivfpq_probe_refined — the IndexRefineFlat serving shape): the
    ADC top-30 candidates per query come from the stored residual
    codes (partition-pruned, vectors never read), then ONLY those
    candidates are re-ranked by exact L2 over true vectors fetched
    with a candidate-sized semi-join. The standard accuracy knob —
    exact ordering on the candidate set at ≤ nq·k' vector-row I/O
    instead of a corpus scan. The oracle replays the full two-level
    training + ADC, takes the same top-30, and re-ranks with the same
    index-ordered exact-distance sum (round-4, ties to lowest id)."""
    import tempfile

    from parkour_spark.operators.pq import (
        ivfpq_index_build,
        ivfpq_probe_refined,
    )

    emb = _t(spark, sf_dir, "embeddings")
    coarse, cbs = _ivfpq_quantizers(spark, sf_dir)
    key = (sf_dir, "ivfpq")
    if key not in _R10_INDEX_DIRS:
        tmp = tempfile.mkdtemp(prefix="parkour_ivfpqidx_")
        ivfpq_index_build(emb, coarse, cbs, tmp)
        _R10_INDEX_DIRS[key] = tmp
    return ivfpq_probe_refined(
        spark,
        _R10_INDEX_DIRS[key],
        emb,
        _pq_queries(spark, sf_dir),
        k=10,
        kprime=30,
        nprobe=2,
    )


@query("ivfpq_probe_after_append", _ivfpq_oracle())
def q_ivfpq_probe_after_append(spark, sf_dir):
    """Append identity for the composite index: build on
    vec_id % 10 != 7 (quantizers fixed), append the rest — encoded
    with the PERSISTED quantizers in one batch-sized scan — then
    probe. Codes are per-row pure given both quantizers, so
    append(B) ≡ build(A ∪ B); the oracle is the full-corpus replay."""
    import tempfile

    from parkour_spark.operators.pq import (
        ivfpq_index_append,
        ivfpq_index_build,
        ivfpq_probe_topk,
    )

    emb = _t(spark, sf_dir, "embeddings")
    coarse, cbs = _ivfpq_quantizers(spark, sf_dir)
    key = (sf_dir, "ivfpq_append")
    if key not in _R10_INDEX_DIRS:
        tmp = tempfile.mkdtemp(prefix="parkour_ivfpqidx_app_")
        ivfpq_index_build(
            emb.where(F.col("vec_id") % 10 != 7), coarse, cbs, tmp
        )
        ivfpq_index_append(
            emb.where(F.col("vec_id") % 10 == 7), tmp,
            coarse=coarse, codebooks=cbs,
        )
        _R10_INDEX_DIRS[key] = tmp
    queries = _pq_queries(spark, sf_dir)
    return ivfpq_probe_topk(
        spark, _R10_INDEX_DIRS[key], queries, k=10, nprobe=2
    )


@query(
    "ivfpq_probe_after_delete",
    _ivfpq_oracle(corpus_where="e.vec_id % 10 <> 7"),
)
def q_ivfpq_probe_after_delete(spark, sf_dir):
    """Delete identity for the composite index: build on the full
    corpus, physically retire vec_id % 10 == 7 (rows with their
    vectors — coarse assignment addresses exactly the affected lists,
    partition-pruned dynamic-overwrite rewrite, emptied cells
    removed), probe. delete(B) ≡ build(A ∖ B); the oracle filters the
    SCORED corpus to the survivors while both quantizer trainings
    replay unfiltered — exactly how fixed persisted quantizers behave.
    Query ids (vec_id < 5) are outside the delete set."""
    import tempfile

    from parkour_spark.operators.pq import (
        ivfpq_index_build,
        ivfpq_index_delete,
        ivfpq_probe_topk,
    )

    emb = _t(spark, sf_dir, "embeddings")
    coarse, cbs = _ivfpq_quantizers(spark, sf_dir)
    key = (sf_dir, "ivfpq_delete")
    if key not in _R10_INDEX_DIRS:
        tmp = tempfile.mkdtemp(prefix="parkour_ivfpqidx_del_")
        ivfpq_index_build(emb, coarse, cbs, tmp)
        ivfpq_index_delete(
            emb.where(F.col("vec_id") % 10 == 7).select(
                "vec_id", "embedding"
            ),
            tmp,
        )
        _R10_INDEX_DIRS[key] = tmp
    queries = _pq_queries(spark, sf_dir)
    return ivfpq_probe_topk(
        spark, _R10_INDEX_DIRS[key], queries, k=10, nprobe=2
    )


# ===========================================================================
# r10 late additions: persisted full-text retrieval index
# (operators/textindex.py) — the FIFTH persisted-index family: build
# once (one corpus tokenize), serve BM25 from term-bucketed postings
# ===========================================================================


def _bm25_idx_oracle(
    where: str | None = None,
    k: int = 10,
    require_all: bool = False,
    max_df: int | None = None,
    terms: tuple = ("hash", "join", "scan"),
) -> str:
    """The bm25_search replay, parameterized with an optional document
    filter (the delete leg scores exactly the survivor corpus — df, N,
    and avgdl all shift as a survivor build, because the index derives
    them from stored membership) and the r10 retrieval options:
    `max_df` drops query terms whose df exceeds it BEFORE scoring (the
    stopword guard), `require_all` keeps only docs matching every
    requested-and-uncapped term (classic conjunctive AND)."""
    w = f"WHERE {where}" if where else ""
    cap = f"WHERE df <= {max_df}" if max_df is not None else ""
    tlist = ", ".join(f"'{t}'" for t in sorted(terms))
    nreq = (
        f"(SELECT {len(terms)} - count(*) FROM (SELECT DISTINCT term "
        f"FROM wdf WHERE df > {max_df}))"
        if max_df is not None
        else str(len(terms))
    )
    having = (
        f"HAVING count(*) = {nreq}" if require_all else ""
    )
    return f"""
    WITH docs_f AS (SELECT * FROM documents {w}),
    base AS (
      SELECT doc_id, len({_TOKS_SQL})::BIGINT AS dl, unnest({_TOKS_SQL}) AS term
      FROM docs_f),
    tf AS (SELECT doc_id, dl, term, count(*) AS tf FROM base
           WHERE term IN ({tlist}) GROUP BY doc_id, dl, term),
    wdf AS (SELECT *, count(*) OVER (PARTITION BY term) AS df FROM tf),
    wdf_c AS (SELECT * FROM wdf {cap}),
    tot AS (SELECT count(*) AS n_docs,
                   (SELECT sum(len({_TOKS_SQL}))::BIGINT FROM docs_f) AS n_total
            FROM docs_f),
    scored AS (
      SELECT doc_id,
             round(ln(1 + (n_docs - df + 0.5) / (df + 0.5))
                   * ((tf * 2.2) / (tf + 1.2 * (0.25 + 0.75 * dl / (n_total::DOUBLE / n_docs))))
                   * 1e6)::BIGINT AS term_micro
      FROM wdf_c, tot)
    SELECT doc_id, count(*)::BIGINT AS n_qterms, sum(term_micro)::BIGINT AS score_micro
    FROM scored GROUP BY doc_id {having}
    ORDER BY score_micro DESC, doc_id LIMIT {k}
    """


@query("text_probe_persisted", _bm25_idx_oracle())
def q_text_probe_persisted(spark, sf_dir):
    """BM25 served ENTIRELY from the persisted inverted index
    (textindex.text_index_build + text_index_probe_bm25): one corpus
    tokenize at build writes term-bucketed postings with denormalized
    doc lengths; the probe's terms hash to their buckets DRIVER-SIDE
    and apply as a static partition filter, df derives from the
    query-term postings slice, stats ride in as a broadcast 1-row
    table — the corpus text appears nowhere in the probe plan.
    Identical scoring expressions to the inline bm25_topk on identical
    inputs, so the SAME ANSI oracle gates both (probe ≡ inline, an
    identity — the bm25_search entry is the inline twin)."""
    import tempfile

    from parkour_spark.operators.textindex import (
        text_index_build,
        text_index_probe_bm25,
    )

    docs = _t(spark, sf_dir, "documents")
    key = (sf_dir, "text")
    if key not in _R10_INDEX_DIRS:
        tmp = tempfile.mkdtemp(prefix="parkour_textidx_")
        text_index_build(docs, tmp, n_buckets=16)
        _R10_INDEX_DIRS[key] = tmp
    return text_index_probe_bm25(
        spark, _R10_INDEX_DIRS[key], _BM25_TERMS, k=10
    )


@query(
    "bm25_conjunctive_capped",
    _bm25_idx_oracle(require_all=True, max_df=395),
)
def q_bm25_conjunctive_capped(spark, sf_dir):
    """The r10 retrieval options, registry-gated on the INLINE path
    (r10 verdict #4): `max_df=395` caps the highest-df query term out
    of scoring (the stopword guard — chosen so it BITES on this corpus:
    one of the three terms exceeds it, two do not), and
    `require_all=True` then keeps only docs matching every surviving
    term (classic conjunctive AND; the required count excludes capped
    terms, so a capped stopword cannot make conjunctive queries
    unanswerable). The oracle replays both options in SQL."""
    return C.bm25_topk(
        _t(spark, sf_dir, "documents"),
        _BM25_TERMS,
        k=10,
        require_all=True,
        max_df=395,
    )


@query(
    "text_probe_conjunctive_capped",
    _bm25_idx_oracle(require_all=True, max_df=395),
)
def q_text_probe_conjunctive_capped(spark, sf_dir):
    """The same conjunctive+capped options served from the PERSISTED
    index (probe ≡ inline is an identity under every option
    combination — both paths score through the one shared
    corpus.bm25_score_topk tail, so this entry and
    `bm25_conjunctive_capped` share their oracle verbatim). Reuses the
    full-corpus index `text_probe_persisted` builds; df for the cap
    derives from the query-term postings slice exactly as inline."""
    import tempfile

    from parkour_spark.operators.textindex import (
        text_index_build,
        text_index_probe_bm25,
    )

    docs = _t(spark, sf_dir, "documents")
    key = (sf_dir, "text")
    if key not in _R10_INDEX_DIRS:
        tmp = tempfile.mkdtemp(prefix="parkour_textidx_")
        text_index_build(docs, tmp, n_buckets=16)
        _R10_INDEX_DIRS[key] = tmp
    return text_index_probe_bm25(
        spark,
        _R10_INDEX_DIRS[key],
        _BM25_TERMS,
        k=10,
        require_all=True,
        max_df=395,
    )


_MULTI_QUERY_SETS = [
    (0, ("hash", "join", "scan")),
    (1, ("dup", "scan")),
    (2, ("hash", "zz_absent_term")),
]


def _bm25_multi_oracle(query_sets, k: int = 10) -> str:
    """Replay of the BATCHED probe: ONE tf/df derivation over the
    union of all queries' terms (df per term is query-independent), a
    (query_id, term) VALUES map selecting each query's postings, and a
    per-query row_number top-k — mirroring
    textindex.text_index_probe_bm25_multi expression-for-expression."""
    all_terms = sorted({t for _, terms in query_sets for t in terms})
    tlist = ", ".join(f"'{t}'" for t in all_terms)
    qvals = ", ".join(
        f"({qid}, '{t}')" for qid, terms in query_sets for t in sorted(set(terms))
    )
    return f"""
    WITH base AS (
      SELECT doc_id, len({_TOKS_SQL})::BIGINT AS dl, unnest({_TOKS_SQL}) AS term
      FROM documents),
    tf AS (SELECT doc_id, dl, term, count(*) AS tf FROM base
           WHERE term IN ({tlist}) GROUP BY doc_id, dl, term),
    wdf AS (SELECT *, count(*) OVER (PARTITION BY term) AS df FROM tf),
    qmap(query_id, term) AS (VALUES {qvals}),
    tot AS (SELECT count(*) AS n_docs,
                   (SELECT sum(len({_TOKS_SQL}))::BIGINT FROM documents) AS n_total
            FROM documents),
    scored AS (
      SELECT q.query_id, doc_id,
             round(ln(1 + (n_docs - df + 0.5) / (df + 0.5))
                   * ((tf * 2.2) / (tf + 1.2 * (0.25 + 0.75 * dl / (n_total::DOUBLE / n_docs))))
                   * 1e6)::BIGINT AS term_micro
      FROM wdf w JOIN qmap q USING (term), tot),
    agg AS (
      SELECT query_id, doc_id, count(*)::BIGINT AS n_qterms,
             sum(term_micro)::BIGINT AS score_micro
      FROM scored GROUP BY 1, 2)
    SELECT query_id, doc_id, n_qterms, score_micro, rank FROM (
      SELECT *, row_number() OVER (PARTITION BY query_id
                                   ORDER BY score_micro DESC, doc_id) AS rank
      FROM agg)
    WHERE rank <= {k}
    """


@query("text_probe_multi_batch", _bm25_multi_oracle(_MULTI_QUERY_SETS))
def q_text_probe_multi_batch(spark, sf_dir):
    """A BATCH of BM25 queries served from ONE partition-pruned
    postings scan (textindex.text_index_probe_bm25_multi, r11) — the
    serving-throughput pattern: the union of the three queries' terms
    prunes buckets/terms once, df derives per term (query-independent),
    each query selects its postings via a broadcast (query_id, term)
    map, and one query-partitioned window takes each top-k. One query
    mixes in a term absent from the whole corpus (scores ride on the
    remaining term, the single-probe semantics). Restricted to one
    query the result is row-identical to text_index_probe_bm25
    (test-pinned); the oracle replays the batch with a VALUES map."""
    import tempfile

    from parkour_spark.operators.textindex import (
        text_index_build,
        text_index_probe_bm25_multi,
    )

    docs = _t(spark, sf_dir, "documents")
    key = (sf_dir, "text")
    if key not in _R10_INDEX_DIRS:
        tmp = tempfile.mkdtemp(prefix="parkour_textidx_")
        text_index_build(docs, tmp, n_buckets=16)
        _R10_INDEX_DIRS[key] = tmp
    return text_index_probe_bm25_multi(
        spark, _R10_INDEX_DIRS[key], _MULTI_QUERY_SETS, k=10
    )


_MULTI_MS_QUERY_SETS = [
    (0, ("dup", "hash", "scan")),
    (1, ("dup", "join")),
    (2, ("hash", "scan")),
]


@query(
    "text_probe_multi_maxscore",
    _bm25_multi_oracle(_MULTI_MS_QUERY_SETS),
)
def q_text_probe_multi_maxscore(spark, sf_dir):
    """Batched BM25 serving WITH per-query MaxScore early termination
    (textindex.text_index_probe_bm25_multi_maxscore, r12 — r11 verdict
    #3): the two serving wins composed. The batch amortizes ONE
    partition-pruned postings scan over all three queries; each query
    then skips scoring its high-df non-essential terms outside its
    essential-candidate set, with the θ-search for ALL queries run in
    lockstep (one job per geometric prefix round — O(log max_terms)
    jobs for the whole batch, the single-query probe's bound paid
    once). Queries 0 and 1 mix the rare 'dup' with stopword-adjacent
    terms (the runtime asserts their per-query skips really happened);
    query 2 is uniform-ub and scores everything — per-query exactness
    never depends on the skip landing. The oracle is the same
    FULL-scoring batched replay that gates the plain multi probe:
    exact top-k per query, provably cheaper for the skewed ones."""
    import tempfile

    from parkour_spark.operators.textindex import (
        text_index_build,
        text_index_probe_bm25_multi_maxscore,
    )

    docs = _t(spark, sf_dir, "documents")
    key = (sf_dir, "text")
    if key not in _R10_INDEX_DIRS:
        tmp = tempfile.mkdtemp(prefix="parkour_textidx_")
        text_index_build(docs, tmp, n_buckets=16)
        _R10_INDEX_DIRS[key] = tmp
    stats: dict = {}
    out = text_index_probe_bm25_multi_maxscore(
        spark,
        _R10_INDEX_DIRS[key],
        _MULTI_MS_QUERY_SETS,
        k=10,
        stats_out=stats,
    )
    assert stats["fallback"] is None, stats
    pq = stats["per_query"]
    assert pq[0]["essential"] == ["dup"], stats
    assert pq[0]["rows_skipped_lower_bound"] > 0, stats
    assert pq[1]["essential"] == ["dup"], stats
    assert pq[1]["rows_skipped_lower_bound"] > 0, stats
    return out


@query(
    "text_probe_maxscore",
    _bm25_idx_oracle(terms=("dup", "hash", "scan")),
)
def q_text_probe_maxscore(spark, sf_dir):
    """MaxScore early termination served from the persisted index
    (textindex.text_index_probe_bm25_maxscore, r10 verdict #4): the
    query mixes ONE rare term ('dup' — ~5% of docs) with two
    stopword-adjacent terms (~80% each), the shape where scoring every
    posting is mostly waste. The probe takes 'dup' as the essential
    set from the persisted termstats upper bounds, proves the k-th
    best dup-only partial score exceeds the non-essential bound, and
    scores the high-df terms ONLY for dup's candidate docs — the
    runtime asserts the skip really happened (thousands of postings
    rows never scored at sf0.1) AND that no fallback fired, then the
    gate pins the result against the FULL-scoring oracle: exact top-k,
    provably cheaper."""
    import tempfile

    from parkour_spark.operators.textindex import (
        text_index_build,
        text_index_probe_bm25_maxscore,
    )

    docs = _t(spark, sf_dir, "documents")
    key = (sf_dir, "text")
    if key not in _R10_INDEX_DIRS:
        tmp = tempfile.mkdtemp(prefix="parkour_textidx_")
        text_index_build(docs, tmp, n_buckets=16)
        _R10_INDEX_DIRS[key] = tmp
    stats: dict = {}
    out = text_index_probe_bm25_maxscore(
        spark,
        _R10_INDEX_DIRS[key],
        ("dup", "hash", "scan"),
        k=10,
        stats_out=stats,
    )
    # the early-termination claim is part of the entry: no fallback,
    # 'dup' alone essential, and a real row skip — not just equal rows
    assert stats["fallback"] is None, stats
    assert stats["essential"] == ["dup"], stats
    assert stats["rows_skipped_lower_bound"] > 0, stats
    return out


@query("text_probe_after_append", _bm25_idx_oracle())
def q_text_probe_after_append(spark, sf_dir):
    """Append identity for the text index: build on the content-hash
    bottom 80% of documents, append the rest (the batch pays only its
    own tokenize; stats re-derive from full stored membership; df is
    probe-derived so there is no inverted-table rebuild at all), then
    probe. append(B) ≡ build(A∪B) — the oracle is the full-corpus
    replay."""
    import tempfile

    from parkour_spark.functions.sampling import hash_bucket
    from parkour_spark.operators.textindex import (
        text_index_append,
        text_index_build,
        text_index_probe_bm25,
    )

    docs = _t(spark, sf_dir, "documents")
    bkt = hash_bucket(F.col("doc_id"), 100)
    key = (sf_dir, "text_append")
    if key not in _R10_INDEX_DIRS:
        tmp = tempfile.mkdtemp(prefix="parkour_textidx_app_")
        text_index_build(docs.where(bkt < 80), tmp, n_buckets=16)
        text_index_append(docs.where(bkt >= 80), tmp, n_buckets=16)
        _R10_INDEX_DIRS[key] = tmp
    return text_index_probe_bm25(
        spark, _R10_INDEX_DIRS[key], _BM25_TERMS, k=10
    )


@query(
    "text_probe_maxscore_after_append",
    _bm25_idx_oracle(terms=("dup", "hash", "scan")),
)
def q_text_probe_maxscore_after_append(spark, sf_dir):
    """MaxScore early termination SURVIVING an append (r12, r11
    verdict #4): the termstats table is maintained incrementally
    through text_index_append (the batch's per-term df/max_tf/min_dl
    merge monotonically into the stored table, staged before and
    renamed in after the postings land — a crash leaves it absent,
    never stale), so the appended index serves early-terminated probes
    WITHOUT waiting for a compact. The entry asserts no fallback fired
    and the row skip is real on the build+append index, then the gate
    pins the result against the FULL-corpus full-scoring oracle —
    under r11 this same probe fell back to plain scoring."""
    import tempfile

    from parkour_spark.functions.sampling import hash_bucket
    from parkour_spark.operators.textindex import (
        text_index_append,
        text_index_build,
        text_index_probe_bm25_maxscore,
    )

    docs = _t(spark, sf_dir, "documents")
    bkt = hash_bucket(F.col("doc_id"), 100)
    key = (sf_dir, "text_append")
    if key not in _R10_INDEX_DIRS:
        tmp = tempfile.mkdtemp(prefix="parkour_textidx_app_")
        text_index_build(docs.where(bkt < 80), tmp, n_buckets=16)
        text_index_append(docs.where(bkt >= 80), tmp, n_buckets=16)
        _R10_INDEX_DIRS[key] = tmp
    stats: dict = {}
    out = text_index_probe_bm25_maxscore(
        spark,
        _R10_INDEX_DIRS[key],
        ("dup", "hash", "scan"),
        k=10,
        stats_out=stats,
    )
    assert stats["fallback"] is None, stats  # survived the append
    assert stats["essential"] == ["dup"], stats
    assert stats["rows_skipped_lower_bound"] > 0, stats
    return out


@query(
    "text_probe_after_delete",
    _bm25_idx_oracle(where="doc_id % 10 <> 7"),
)
def q_text_probe_after_delete(spark, sf_dir):
    """Delete identity for the text index: build on the full corpus,
    retire doc_id % 10 == 7 via the r11 O(|B|) tombstone ledger
    (postings/doclen untouched; stats re-derived net of the ledger),
    probe through the read-repair anti-join. The oracle replays BM25
    over the SURVIVORS ONLY — df, N, and avgdl all shift exactly as a
    survivor build would, because df derives AFTER the ledger
    anti-join and stats subtract it. delete(B) ≡ build(A∖B), idf
    shifts included, with no table rewrite anywhere."""
    import tempfile

    from parkour_spark.operators.textindex import (
        text_index_build,
        text_index_delete,
        text_index_probe_bm25,
    )

    docs = _t(spark, sf_dir, "documents")
    key = (sf_dir, "text_delete")
    if key not in _R10_INDEX_DIRS:
        tmp = tempfile.mkdtemp(prefix="parkour_textidx_del_")
        text_index_build(docs, tmp, n_buckets=16)
        text_index_delete(
            spark, docs.where(F.col("doc_id") % 10 == 7).select("doc_id"), tmp
        )
        _R10_INDEX_DIRS[key] = tmp
    return text_index_probe_bm25(
        spark, _R10_INDEX_DIRS[key], _BM25_TERMS, k=10
    )


@query(
    "text_probe_maxscore_after_delete",
    _bm25_idx_oracle(where="doc_id % 10 <> 7", terms=("dup", "hash", "scan")),
)
def q_text_probe_maxscore_after_delete(spark, sf_dir):
    """MaxScore early termination SURVIVING a delete (r12 extra wave —
    the last lifecycle leg where it died): `text_index_delete(...,
    maintain_termstats=True)` stages a survivor-exact df decrement
    from one column-pruned postings scan (max_tf/min_dl stay as
    still-valid bounds) and renames it in after the ledger lands, and
    the probe now serves a PENDING tombstone ledger by anti-joining
    every slice — θ passes included — instead of falling back. The
    entry asserts no fallback fired and the row skip is real on the
    deleted index; the gate pins the rows against the SURVIVOR-corpus
    full-scoring oracle (df, N, avgdl all shifted as a survivor
    build). Under r11 this probe fell back to plain scoring until the
    next compact."""
    import tempfile

    from parkour_spark.operators.textindex import (
        text_index_build,
        text_index_delete,
        text_index_probe_bm25_maxscore,
    )

    docs = _t(spark, sf_dir, "documents")
    key = (sf_dir, "text_delete_ms")
    if key not in _R10_INDEX_DIRS:
        tmp = tempfile.mkdtemp(prefix="parkour_textidx_delms_")
        text_index_build(docs, tmp, n_buckets=16)
        text_index_delete(
            spark,
            docs.where(F.col("doc_id") % 10 == 7).select("doc_id"),
            tmp,
            maintain_termstats=True,
        )
        _R10_INDEX_DIRS[key] = tmp
    stats: dict = {}
    out = text_index_probe_bm25_maxscore(
        spark,
        _R10_INDEX_DIRS[key],
        ("dup", "hash", "scan"),
        k=10,
        stats_out=stats,
    )
    assert stats["fallback"] is None, stats  # survived the delete
    assert stats["essential"] == ["dup"], stats
    assert stats["rows_skipped_lower_bound"] > 0, stats
    return out


@query("text_ingest_compact_probe", _bm25_idx_oracle())
def q_text_ingest_compact_probe(spark, sf_dir):
    """END-TO-END pipeline for the text index: 4-batch exactly-once
    streaming ingest (the doclen+postings pair commits on the postings
    marker; stats re-derive per batch), drain, COMPACT back to one
    term-sorted file set per bucket, probe. Oracle = the full-corpus
    BM25 replay: ingest → compact ≡ build for the fifth index family —
    all five persisted indexes now gate the composed operating loop."""
    import tempfile

    from parkour_spark.operators.textindex import (
        text_index_compact,
        text_index_probe_bm25,
    )
    from parkour_spark.streaming.windows import streaming_text_ingest

    docs = _t(spark, sf_dir, "documents")
    key = (sf_dir, "text_icp")
    if key not in _R10_INDEX_DIRS:
        src = tempfile.mkdtemp(prefix="parkour_text_icp_src_")
        docs.select("doc_id", "text").repartition(4).write.mode(
            "overwrite"
        ).parquet(src)
        schema = spark.read.parquet(src).schema
        idx = tempfile.mkdtemp(prefix="parkour_text_icp_idx_")
        streaming_text_ingest(spark, src, schema, idx, n_buckets=16)
        text_index_compact(spark, idx)
        _R10_INDEX_DIRS[key] = idx
    return text_index_probe_bm25(
        spark, _R10_INDEX_DIRS[key], _BM25_TERMS, k=10
    )


@query(
    "text_stream_then_maxscore_probe",
    _bm25_idx_oracle(terms=("dup", "hash", "scan")),
)
def q_text_stream_then_maxscore_probe(spark, sf_dir):
    """MaxScore served from a STREAMING-ONLY index with NO compact
    (r12): streaming_text_ingest maintains the termstats table through
    every micro-batch via the staged stage→invalidate→publish→rename
    protocol — the first batch CREATES it from its own stats, later
    batches merge monotonically — so early termination works the
    moment the stream drains. The 4-batch replay covers the full
    corpus; the entry asserts no fallback fired and the row skip is
    real, and the gate pins the result against the FULL-scoring
    oracle. Under r11 every streaming batch invalidated the table and
    this probe fell back until a compact ran."""
    import tempfile

    from parkour_spark.operators.textindex import (
        text_index_probe_bm25_maxscore,
    )
    from parkour_spark.streaming.windows import streaming_text_ingest

    docs = _t(spark, sf_dir, "documents")
    key = (sf_dir, "text_stream_ms")
    if key not in _R10_INDEX_DIRS:
        src = tempfile.mkdtemp(prefix="parkour_text_sms_src_")
        docs.select("doc_id", "text").repartition(4).write.mode(
            "overwrite"
        ).parquet(src)
        idx = tempfile.mkdtemp(prefix="parkour_text_sms_idx_")
        streaming_text_ingest(
            spark, src, spark.read.parquet(src).schema, idx, n_buckets=16
        )
        _R10_INDEX_DIRS[key] = idx
    stats: dict = {}
    out = text_index_probe_bm25_maxscore(
        spark,
        _R10_INDEX_DIRS[key],
        ("dup", "hash", "scan"),
        k=10,
        stats_out=stats,
    )
    assert stats["fallback"] is None, stats  # alive without a compact
    assert stats["essential"] == ["dup"], stats
    assert stats["rows_skipped_lower_bound"] > 0, stats
    return out


# ===========================================================================
# r12: streaming ingest ONTO a built root (r11 verdict #6) — the r11
# house contract required streaming into a fresh root because build
# writes `part=*/` while streaming writes `batch=N/part=*/` and Spark
# rejects mixed partition depths. indexcommon.ensure_batch_layout
# normalizes a built/compacted table with PURE RENAMES (everything
# moves under batch=-1/ — no byte read or rewritten), and every
# streaming ingest now runs it first, so build → stream → probe
# composes. One gated entry per doc-keyed family pins
# probe(build(A) then stream(B)) ≡ probe(build(A ∪ B)).
# ===========================================================================


@query("text_build_then_stream_probe", _bm25_idx_oracle())
def q_text_build_then_stream_probe(spark, sf_dir):
    """BM25 probe on an index BUILT on the content-hash bottom 80% of
    documents and then STREAM-INGESTED the rest (4-batch exactly-once
    replay onto the normalized root — postings/doclen move under
    batch=-1/ with renames before the first micro-batch). The oracle
    is the FULL-corpus replay: build ∘ stream ≡ build(all), the
    composition the r11 layout contract forbade."""
    import tempfile

    from parkour_spark.functions.sampling import hash_bucket
    from parkour_spark.operators.textindex import (
        text_index_build,
        text_index_probe_bm25,
    )
    from parkour_spark.streaming.windows import streaming_text_ingest

    docs = _t(spark, sf_dir, "documents")
    bkt = hash_bucket(F.col("doc_id"), 100)
    key = (sf_dir, "text_bts")
    if key not in _R10_INDEX_DIRS:
        idx = tempfile.mkdtemp(prefix="parkour_text_bts_idx_")
        text_index_build(docs.where(bkt < 80), idx, n_buckets=16)
        src = tempfile.mkdtemp(prefix="parkour_text_bts_src_")
        docs.where(bkt >= 80).select("doc_id", "text").repartition(
            4
        ).write.mode("overwrite").parquet(src)
        streaming_text_ingest(
            spark, src, spark.read.parquet(src).schema, idx, n_buckets=16
        )
        _R10_INDEX_DIRS[key] = idx
    return text_index_probe_bm25(
        spark, _R10_INDEX_DIRS[key], _BM25_TERMS, k=10
    )


@query("minhash_build_then_stream_probe", _minhash_probe_oracle())
def q_minhash_build_then_stream_probe(spark, sf_dir):
    """MinHash delta probe on an index BUILT on the content-hash
    bottom 45% and STREAM-INGESTED up to the bottom 90% (sigs/ moves
    under batch=-1/ with renames before the first micro-batch; the
    band table re-derives over the full membership per batch, caps
    included). Probe = the top 10%; the oracle is the same
    combined-build replay that gates every minhash lifecycle leg —
    build ∘ stream ≡ build(all)."""
    import tempfile

    from parkour_spark.functions.sampling import hash_bucket
    from parkour_spark.streaming.windows import streaming_minhash_ingest

    docs = _t(spark, sf_dir, "documents")
    bkt = hash_bucket(F.col("doc_id"), 100)
    key = (sf_dir, "mh_bts")
    if key not in _R10_INDEX_DIRS:
        idx = tempfile.mkdtemp(prefix="parkour_mh_bts_idx_")
        D.minhash_index_build(
            docs.where(bkt < 45).select("doc_id", "text"), idx
        )
        src = tempfile.mkdtemp(prefix="parkour_mh_bts_src_")
        docs.where((bkt >= 45) & (bkt < 90)).select(
            "doc_id", "text"
        ).repartition(4).write.mode("overwrite").parquet(src)
        streaming_minhash_ingest(
            spark, src, spark.read.parquet(src).schema, idx, max_bucket=200
        )
        _R10_INDEX_DIRS[key] = idx
    return D.minhash_probe_delta(
        spark, docs.where(bkt >= 90), _R10_INDEX_DIRS[key], threshold=0.8
    )


@query(
    "substring_build_then_stream_probe", ORACLES["substring_spans_delta"]
)
def q_substring_build_then_stream_probe(spark, sf_dir):
    """Substring-span probe on an index BUILT on the content-hash
    bottom 45% and STREAM-INGESTED up to the bottom 90% (occ/ moves
    under batch=-1/ before the first micro-batch; lists/ re-derives
    per batch with the df cap applied to the full membership). Probe =
    the top 10% through the unchanged substring_probe_persisted;
    oracle = the combined-build delta replay — build ∘ stream ≡
    build(all) for the third doc-keyed family."""
    import tempfile

    from parkour_spark.functions.sampling import hash_bucket
    from parkour_spark.streaming.windows import streaming_substring_ingest

    docs = _t(spark, sf_dir, "documents")
    bkt = hash_bucket(F.col("doc_id"), 100)
    key = (sf_dir, "sub_bts")
    if key not in _R10_INDEX_DIRS:
        idx = tempfile.mkdtemp(prefix="parkour_sub_bts_idx_")
        D.substring_index_build(
            docs.where(bkt < 45).select("doc_id", "text"), idx
        )
        src = tempfile.mkdtemp(prefix="parkour_sub_bts_src_")
        docs.where((bkt >= 45) & (bkt < 90)).select(
            "doc_id", "text"
        ).repartition(4).write.mode("overwrite").parquet(src)
        streaming_substring_ingest(
            spark, src, spark.read.parquet(src).schema, idx
        )
        _R10_INDEX_DIRS[key] = idx
    return D.substring_probe_persisted(
        spark, docs.where(bkt >= 90), _R10_INDEX_DIRS[key]
    )


@query("ivfpq_probe_after_compact", _ivfpq_oracle())
def q_ivfpq_probe_after_compact(spark, sf_dir):
    """IVF-PQ compaction identity: build on vec_id % 10 != 7, append
    the rest (extra file sets inside the cell partitions), COMPACT
    back to one co-located file set per cell (rows rewritten, never
    re-encoded, quantizer pair carried across the atomic whole-root
    swap), probe. Oracle = the full-corpus two-level replay —
    compaction changes ZERO rows for the composite index too."""
    import tempfile

    from parkour_spark.operators.pq import (
        ivfpq_index_append,
        ivfpq_index_build,
        ivfpq_index_compact,
        ivfpq_probe_topk,
    )

    emb = _t(spark, sf_dir, "embeddings")
    coarse, cbs = _ivfpq_quantizers(spark, sf_dir)
    key = (sf_dir, "ivfpq_compact")
    if key not in _R10_INDEX_DIRS:
        tmp = tempfile.mkdtemp(prefix="parkour_ivfpqidx_cmp_")
        ivfpq_index_build(
            emb.where(F.col("vec_id") % 10 != 7), coarse, cbs, tmp
        )
        ivfpq_index_append(emb.where(F.col("vec_id") % 10 == 7), tmp)
        ivfpq_index_compact(spark, tmp)
        _R10_INDEX_DIRS[key] = tmp
    queries = _pq_queries(spark, sf_dir)
    return ivfpq_probe_topk(
        spark, _R10_INDEX_DIRS[key], queries, k=10, nprobe=2
    )


@query("ivfpq_ingest_compact_probe", _ivfpq_oracle())
def q_ivfpq_ingest_compact_probe(spark, sf_dir):
    """END-TO-END pipeline for the composite index: 4-batch
    exactly-once streaming ingest (residual codes, batch=<id>/cell=<c>
    commit-marker trees, quantizer pair fixed), drain, COMPACT into
    the canonical cell= layout, probe from stored codes with static
    cell pruning. Oracle = the full two-level-training replay: ingest
    → compact ≡ build for the sixth index family — every persisted
    index now gates the composed operating loop."""
    import tempfile

    from parkour_spark.operators.pq import (
        ivfpq_index_compact,
        ivfpq_probe_topk,
    )
    from parkour_spark.streaming.windows import streaming_ivfpq_ingest

    emb = _t(spark, sf_dir, "embeddings")
    coarse, cbs = _ivfpq_quantizers(spark, sf_dir)
    key = (sf_dir, "ivfpq_icp")
    if key not in _R10_INDEX_DIRS:
        src = tempfile.mkdtemp(prefix="parkour_ivfpq_icp_src_")
        emb.select("vec_id", "embedding").repartition(4).write.mode(
            "overwrite"
        ).parquet(src)
        schema = spark.read.parquet(src).schema
        idx = tempfile.mkdtemp(prefix="parkour_ivfpq_icp_idx_")
        streaming_ivfpq_ingest(spark, src, schema, idx, coarse, cbs)
        ivfpq_index_compact(spark, idx)
        _R10_INDEX_DIRS[key] = idx
    queries = _pq_queries(spark, sf_dir)
    return ivfpq_probe_topk(
        spark, _R10_INDEX_DIRS[key], queries, k=10, nprobe=2
    )
