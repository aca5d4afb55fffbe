"""Prefix-filtering exact similarity join (dedup.prefix_filter_pairs):
completeness vs the uncapped inverted-index join, candidate reduction,
prefix-length arithmetic, and threshold validation."""

import pytest
from pyspark.sql import functions as F

from parkour_spark.operators import dedup as D

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def docs(spark):
    return spark.read.parquet(f"{SF}/documents.parquet")


def _pairs(df):
    return {(r.id_a, r.id_b, r.jaccard) for r in df.collect()}


def test_completeness_equals_uncapped_join(docs):
    # The prefix filter is EXACT: its output must equal the full
    # inverted-index join's (same pairs, same scores) — the lemma says
    # every qualifying pair shares a prefix token, so no pair may drop.
    exact = _pairs(D.ngram_jaccard_pairs(docs, threshold=0.8))
    pref = _pairs(D.prefix_filter_pairs(docs, threshold_num=4, threshold_den=5))
    assert pref == exact
    assert exact, "fixture corpus has no near-dup pairs; test is vacuous"


def test_candidate_reduction(spark, docs):
    # The point of the prefix: candidate pairs from prefix buckets must
    # be a strict subset of candidates from ALL token buckets.
    from parkour_spark.operators.dedup import (
        _bucket_pairs,
        _explode_fast,
        _feature_sets,
    )

    ts = _feature_sets(docs, "text", "doc_id", 3).withColumn("__n", F.size("toks"))
    ex = _explode_fast(ts, "toks", "tok", keep=["doc_id", "__n"])
    all_cand = _bucket_pairs(
        ex.withColumnRenamed("tok", "band_key"), "doc_id", max_bucket=None
    ).count()

    from pyspark.sql import Window

    dfs = ex.groupBy("tok").agg(F.count("*").alias("__df"))
    pref = (
        ex.join(dfs, "tok")
        .withColumn(
            "__pos",
            F.row_number().over(Window.partitionBy("doc_id").orderBy("__df", "tok")),
        )
        .where(F.col("__pos") <= F.col("__n") - F.expr("(4 * __n + 4) div 5") + 1)
        .select("doc_id", F.col("tok").alias("band_key"))
    )
    pref_cand = D._bucket_pairs(pref, "doc_id", max_bucket=None).count()
    assert pref_cand < all_cand, (pref_cand, all_cand)


def test_prefix_length_arithmetic(spark):
    # n − ⌈t·n⌉ + 1 at t = 4/5 over the sizes that matter: a doc of n
    # distinct shingles keeps max(1, n − ceil(0.8 n) + 1) prefix tokens.
    import math

    for n in [1, 2, 3, 4, 5, 6, 10, 11, 99, 100]:
        spark_side = n - (4 * n + 4) // 5 + 1
        assert spark_side == n - math.ceil(0.8 * n) + 1


def test_threshold_one_means_exact_duplicate_prefix(spark):
    # t = 1 → prefix length 1: only the single rarest shingle indexes.
    df = spark.createDataFrame(
        [
            (1, "alpha beta gamma delta epsilon zeta"),
            (2, "alpha beta gamma delta epsilon zeta"),
            (3, "completely different text with other words entirely here"),
        ],
        ["doc_id", "text"],
    )
    out = D.prefix_filter_pairs(df, threshold_num=1, threshold_den=1).collect()
    assert [(r.id_a, r.id_b, r.jaccard) for r in out] == [(1, 2, 1.0)]


def test_invalid_threshold_rejected(docs):
    with pytest.raises(ValueError):
        D.prefix_filter_pairs(docs, threshold_num=0, threshold_den=5)
    with pytest.raises(ValueError):
        D.prefix_filter_pairs(docs, threshold_num=6, threshold_den=5)


# ---------------------------------------------------------------------------
# keep-best survivor policy (graph.dedup_survivors_by)
# ---------------------------------------------------------------------------


def test_keep_best_picks_highest_score_not_min_id(spark):
    from parkour_spark.operators.graph import dedup_survivors_by

    nodes = spark.createDataFrame(
        [(1, 10), (2, 99), (3, 50), (7, 5), (9, 5)],
        ["doc_id", "score"],
    )
    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (7, 9)], ["id_a", "id_b"]
    )
    out = {r.doc_id: r for r in dedup_survivors_by(nodes, pairs).collect()}
    # cluster {1,2,3}: best score 99 → id 2 survives, NOT min-id 1
    assert out[2].is_survivor and not out[1].is_survivor and not out[3].is_survivor
    # cluster {7,9}: tied scores → min id 7 survives
    assert out[7].is_survivor and not out[9].is_survivor
    # exactly one survivor per component
    comps = {}
    for r in out.values():
        comps.setdefault(r.component, 0)
        comps[r.component] += r.is_survivor
    assert all(v == 1 for v in comps.values())


def test_prefix_filter_plan_shape(spark, docs):
    """Plan guards: candidates must come from bucket collection (an
    aggregate building collect_list buckets — collect_set on the
    Column engine), and the plan may contain no nested-loop or
    cartesian join anywhere — the exactness must not be bought with an
    all-pairs physical plan. (The printed tree repeats the persisted
    candidate lineage per consumer, so exchange COUNTS are pinned on
    the spans/capped siblings whose plans are linear; here we pin the
    join strategy.)"""
    plan = (
        D.prefix_filter_pairs(docs)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan
    assert "collect_list" in plan
