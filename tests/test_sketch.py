"""Semantic guarantees of the sketch operators (operators/sketch.py):
count-min one-sided error, heavy-hitter completeness, bloom
no-false-negatives — each against exact recomputation on the same data.
"""

import pytest
from pyspark.sql import functions as F

from parkour_spark.operators.sketch import (
    bloom_bits,
    bloom_prefilter,
    cms_build,
    cms_estimate,
    cms_heavy_hitters,
)

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def lineitem(spark):
    from parkour_spark.dataset import load_table

    df = load_table(spark, SF_DIR, "lineitem").persist()
    yield df
    # shared session: a lingering cached scan would substitute
    # InMemoryRelation into other modules' plan-shape assertions
    df.unpersist()


def test_cms_estimate_never_undercounts(spark, lineitem):
    # one-sided error: estimate(key) >= true count for EVERY key
    exact = lineitem.groupBy("l_partkey").agg(F.count("*").alias("n"))
    cms = cms_build(lineitem, "l_partkey", width=512, depth=3)
    est = cms_estimate(cms, exact.select("l_partkey"), "l_partkey", width=512, depth=3)
    bad = exact.join(est, "l_partkey").where(F.col("estimate") < F.col("n")).count()
    assert bad == 0


def test_cms_sketch_size_is_fixed(spark, lineitem):
    # the summary is at most width*depth cells regardless of input size
    cms = cms_build(lineitem, "l_partkey", width=128, depth=3)
    assert cms.count() <= 128 * 3


def test_cms_heavy_hitters_complete_and_sound(spark, lineitem):
    t = 8
    hh = cms_heavy_hitters(lineitem, "l_partkey", width=512, depth=3, threshold=t)
    got = {r["l_partkey"]: (r["estimate"], r["n"]) for r in hh.collect()}
    truth = {
        r["l_partkey"]: r["n"]
        for r in lineitem.groupBy("l_partkey")
        .agg(F.count("*").alias("n"))
        .where(F.col("n") >= t)
        .collect()
    }
    # complete (no heavy hitter lost), sound (exact counts right),
    # one-sided (estimate >= exact)
    assert set(got) == set(truth)
    for k, (est, n) in got.items():
        assert n == truth[k]
        assert est >= n


def test_bloom_prefilter_no_false_negatives(spark, lineitem):
    dim = lineitem.select(F.col("l_partkey").alias("p_partkey")).distinct().limit(40)
    bits = bloom_bits(dim, "p_partkey", m=1024, k=3)
    cand = bloom_prefilter(lineitem, bits, "l_partkey", m=1024, k=3)
    # every truly-matching row survives the prefilter
    true_rows = lineitem.join(
        dim, lineitem.l_partkey == dim.p_partkey, "left_semi"
    ).count()
    surviving_true = cand.join(
        dim, cand.l_partkey == dim.p_partkey, "left_semi"
    ).count()
    assert surviving_true == true_rows
    # and the prefilter actually prunes (not a pass-through)
    assert cand.count() < lineitem.count()


def test_bloom_bits_table_is_small(spark, lineitem):
    dim = lineitem.select(F.col("l_partkey").alias("p_partkey")).distinct()
    bits = bloom_bits(dim, "p_partkey", m=256, k=3)
    assert bits.count() <= 256 * 3
