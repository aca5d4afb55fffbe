"""Join operators — equi, broadcast, semi/anti, co-group, secondary sort.

The reference has no native join; it documents patterns (SURVEY §2.7):
- reduce-side secondary-sort equi-join (test/parkour/join_test.clj:19-76)
- job-graph co-group join (test/parkour/graph_test.clj:98-126)
- map-side broadcast join via dvals (doc/dvals.md:10-14)

Spark-first: `df.join` lets Catalyst choose broadcast-hash / shuffled-hash
/ sort-merge; we only *hint* where we know the cardinality (dimension
tables → broadcast). Co-group keeps the reference's arbitrary-function
power via `cogroup().applyInPandas`.

SCALE: equi-joins shuffle both sides on the key unless one side is
broadcast. `broadcast_join` must only be used when the small side fits in
executor memory (~10s of MB serialized); AQE converts sort-merge to
broadcast at runtime when a side turns out small. Skewed keys are split
by AQE skew-join (enabled in session defaults).
"""

from __future__ import annotations

from typing import Callable, Sequence

from pyspark.sql import DataFrame, functions as F


def equi_join(
    left: DataFrame, right: DataFrame, on, how: str = "inner"
) -> DataFrame:
    """Reduce-side equi-join analog (join_test.clj:19-76). `how` extends
    the reference's inner-only pattern with Spark's full set:
    inner/left/right/outer/left_semi/left_anti/cross."""
    return left.join(right, on=on, how=how)


def broadcast_join(big: DataFrame, small: DataFrame, on, how: str = "inner") -> DataFrame:
    """Map-side join via broadcast (dval pattern, doc/dvals.md:10-14):
    the small side ships to every task, no shuffle of the big side."""
    return big.join(F.broadcast(small), on=on, how=how)


def semi_join(left: DataFrame, right: DataFrame, on) -> DataFrame:
    """EXISTS — rows of `left` with a match in `right`."""
    return left.join(right, on=on, how="left_semi")


def anti_join(left: DataFrame, right: DataFrame, on) -> DataFrame:
    """NOT EXISTS — rows of `left` without a match in `right`."""
    return left.join(right, on=on, how="left_anti")


def cogroup_apply(
    left: DataFrame,
    right: DataFrame,
    keys: Sequence[str],
    fn: Callable,
    schema,
) -> DataFrame:
    """Co-group with an arbitrary per-key function — the general form of
    the reference's mux co-group reducer (graph_test.clj:98-126): both
    sides shuffled on `keys`, the function sees (left_pdf, right_pdf) per
    key as pandas DataFrames.

    SCALE: both groups for one key must fit in memory; for pure equi-join
    semantics prefer `equi_join` (streaming sort-merge)."""
    return (
        left.groupBy(*keys)
        .cogroup(right.groupBy(*keys))
        .applyInPandas(fn, schema=schema)
    )


def secondary_sort_collect(
    df: DataFrame, group_key: str, sort_key: str, payload: str
) -> DataFrame:
    """Secondary sort, materialized form: per group, the payloads ordered
    by `sort_key` (reference grouping-schema `:order \"ignore\"` trick,
    join_test.clj:63-66 / io/avro.clj:95-99).

    Implemented as sort_array(collect_list(struct(sort, payload))) — one
    shuffle, partial-aggregated. For unbounded groups use
    `secondary_sorted_partitions`."""
    return df.groupBy(group_key).agg(
        F.transform(
            F.sort_array(F.collect_list(F.struct(sort_key, payload))),
            lambda s: s[payload],
        ).alias("sorted_payloads")
    )


def secondary_sorted_partitions(df: DataFrame, group_key: str, *sort_keys: str) -> DataFrame:
    """Secondary sort, streaming form: partition by group key, sort rows
    within partitions by (group, sort...) — the exact physical shape of
    the reference's shuffle (partition by subset, sort by full key,
    doc/serialization.md:49-53). Downstream mapInPandas/mapPartitions
    consumers see each group's rows contiguous and ordered without
    materializing the group."""
    return df.repartition(group_key).sortWithinPartitions(group_key, *sort_keys)


def detect_hot_keys(
    df: DataFrame,
    keys: Sequence[str],
    hot_row_threshold: int = 1_000_000,
    sample_fraction: float = 0.001,
    max_hot_keys: int = 1000,
) -> list:
    """Estimate which join-key values exceed `hot_row_threshold` rows via
    a seeded sample — cost is one small agg over ~fraction of the data,
    not a full groupBy-count of the corpus. Returns at most
    `max_hot_keys` Rows (hot keys are, by definition, few). A key is
    flagged when its sampled count implies an estimated total ≥
    threshold."""
    min_sampled = max(1, int(hot_row_threshold * sample_fraction))
    # Project the key columns BEFORE sampling: Catalyst does not prune
    # columns through a Sample node, so sample-then-group scans every
    # column (measured 4-5× slower on a wide fact table).
    return (
        df.select(*keys)
        .sample(fraction=sample_fraction, seed=42)
        .groupBy(*keys)
        .count()
        .where(F.col("count") >= min_sampled)
        .orderBy(F.col("count").desc())
        .limit(max_hot_keys)
        .drop("count")
        .collect()
    )


def salted_join(
    left: DataFrame,
    right: DataFrame,
    on: str | list[str],
    num_salts: int = 16,
    how: str = "inner",
    hot_keys: str | Sequence | None = "auto",
    hot_row_threshold: int = 1_000_000,
    sample_fraction: float = 0.001,
) -> DataFrame:
    """Skew-aware equi-join, row-identical to the plain join (so the
    oracle is the unsalted SQL).

    Salting replicates the right side once per salt and spreads each hot
    key over num_salts shuffle partitions — the cure for a single key
    that exceeds one task. But replication × num_salts is real shuffle
    volume, so it is applied ONLY to detected-hot keys:

    - `hot_keys="auto"` (default): a sampled frequency pre-pass
      (`detect_hot_keys`) finds keys estimated over `hot_row_threshold`
      rows. No hot keys → the plan IS the plain join (zero salt
      overhead; AQE still handles mild sort-merge skew).
    - `hot_keys=[...]`: caller-known hot key values (list of scalars for
      a single key column, or Rows/tuples for composite keys).
    - `hot_keys="all"`: legacy uniform salting of every key — explicit
      opt-in, pays replication on the whole join.
    - `hot_keys=None` / empty: plain join.

    When hot keys exist, the left splits hot/cold by broadcast
    semi/anti join against the (tiny) hot-key table; the cold branch
    joins plain, the hot branch joins salted, results union. Only
    inner/left joins: replicating the right side would duplicate its
    unmatched rows under right/full semantics."""
    if how not in ("inner", "left"):
        raise ValueError(f"salted_join supports inner/left, got {how}")
    keys = [on] if isinstance(on, str) else list(on)

    def _salted(l_side: DataFrame, r_side: DataFrame) -> DataFrame:
        salt = F.pmod(
            F.xxhash64(*[F.col(c) for c in l_side.columns]), F.lit(num_salts)
        ).cast("int")
        l_salted = l_side.withColumn("__salt", salt)
        r_salted = r_side.withColumn(
            "__salt", F.explode(F.sequence(F.lit(0), F.lit(num_salts - 1)))
        )
        return l_salted.join(r_salted, keys + ["__salt"], how).drop("__salt")

    if hot_keys == "all":
        return _salted(left, right)
    if hot_keys == "auto":
        # Size gate before paying the detection scan: a key can only
        # overwhelm a task if the input is at least ~one shuffle
        # partition's worth of data per potential hot key. If Catalyst's
        # size estimate says the whole left side fits comfortably across
        # the shuffle (≤ maxPartitionBytes × shuffle.partitions), no key
        # can exceed a task — plain join, zero pre-pass. At 100 TB the
        # gate always passes and detection runs.
        spark = left.sparkSession
        try:
            size = int(left._jdf.queryExecution().optimizedPlan().stats().sizeInBytes())
            raw = spark.conf.get("spark.sql.files.maxPartitionBytes", "134217728")
            s = raw.strip().lower().removesuffix("b")
            mult = {"k": 2**10, "m": 2**20, "g": 2**30}
            part_bytes = int(s[:-1]) * mult[s[-1]] if s[-1:] in mult else int(s)
            cap = part_bytes * int(spark.conf.get("spark.sql.shuffle.partitions", "200"))
            if size <= cap:
                return left.join(right, keys, how)
        except Exception:
            pass  # stats unavailable → fall through to detection
        hot_keys = detect_hot_keys(
            left, keys, hot_row_threshold=hot_row_threshold, sample_fraction=sample_fraction
        )
    if not hot_keys:
        return left.join(right, keys, how)

    spark = left.sparkSession
    rows = [
        tuple(k) if isinstance(k, (tuple, list)) or hasattr(k, "__fields__") else (k,)
        for k in hot_keys
    ]
    hot_df = spark.createDataFrame(rows, schema=left.select(*keys).schema)
    cold = left.join(F.broadcast(hot_df), keys, "left_anti").join(right, keys, how)
    hot = _salted(
        left.join(F.broadcast(hot_df), keys, "left_semi"),
        right.join(F.broadcast(hot_df), keys, "left_semi"),
    )
    return cold.unionByName(hot)


def _min_gram_keys(s_col: str, ngram: int, probes: int):
    """The `probes` smallest n-gram hashes of a string — its blocking
    keys for fuzzy joins. Two strings within a small edit distance
    share most n-grams, so with high probability they share their
    MINIMUM gram hash (minhash on the gram set); extra probes cover
    the case where an edit hits the minimal gram. Pure Column HOFs —
    codegen'd, no Python. Hash = first 8 md5 hex chars (the engine's
    cross-verifiable content hash, functions/sampling.hash_bucket)."""
    n1 = ngram - 1
    return F.expr(
        f"slice(array_sort(array_distinct(transform("
        f"sequence(1, greatest(length({s_col}) - {n1}, 1)),"
        f" i -> cast(conv(substring(md5(substring({s_col}, i, {ngram})),"
        f" 1, 8), 16, 10) as bigint)))), 1, {probes})"
    )


def fuzzy_join(
    left: DataFrame,
    right: DataFrame,
    left_on: tuple[str, str],
    right_on: tuple[str, str],
    max_dist: int = 2,
    ngram: int = 3,
    probes: int = 2,
    max_block: int = 1000,
) -> DataFrame:
    """Approximate string-equality join (entity resolution / record
    linkage): `left_on`/`right_on` are (id_col, string_col) pairs;
    returns (l_id, r_id, l_val, r_val, dist) for every candidate pair
    within Levenshtein distance `max_dist`.

    Distributed shape — the classic blocking design: candidates come
    from an EQUI-join on min-gram blocking keys (each side emits its
    `probes` smallest n-gram hashes), never an all-pairs comparison;
    the exact Levenshtein filter (JVM built-in, codegen'd) runs only
    inside blocks. `max_block` df-caps pathological blocks on the
    right (registry) side — a gram that is minimal for thousands of
    registry strings is boilerplate, same rationale as the dedup
    family's df caps. At 100 TB: one shuffle per side on the block
    key + the pair distinct; block occupancy, not |L|x|R|, bounds the
    comparison count.

    Approximation contract: a pair is missed only if every one of its
    shared grams' hashes is displaced from BOTH probe sets by the
    edits — recall rises with `probes` (probes >= max_dist + 1 makes
    a miss require an adversarial hash layout)."""
    l_id, l_col = left_on
    r_id, r_col = right_on
    from pyspark.sql import Window

    lb = left.select(
        F.col(l_id).alias("l_id"), F.col(l_col).alias("l_val")
    ).withColumn("__block", F.explode(_min_gram_keys("l_val", ngram, probes)))
    rb = right.select(
        F.col(r_id).alias("r_id"), F.col(r_col).alias("r_val")
    ).withColumn("__block", F.explode(_min_gram_keys("r_val", ngram, probes)))
    rb = rb.withColumn(
        "__occ", F.count("*").over(Window.partitionBy("__block"))
    ).where(F.col("__occ") <= max_block).drop("__occ")
    cand = (
        lb.join(rb, "__block")
        .select("l_id", "l_val", "r_id", "r_val")
        .distinct()
    )
    return cand.withColumn("dist", F.levenshtein("l_val", "r_val")).where(
        F.col("dist") <= max_dist
    )
