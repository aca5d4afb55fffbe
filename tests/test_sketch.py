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


# --- HyperLogLog -----------------------------------------------------------


def test_hll_estimate_within_bounds(spark, lineitem):
    from parkour_spark.operators.sketch import hll_estimate, hll_registers

    regs = hll_registers(lineitem, "l_orderkey", p=8)
    assert regs.count() == 256
    est = hll_estimate(regs, p=8).collect()[0]
    exact = lineitem.select("l_orderkey").distinct().count()
    # standard error 1.04/sqrt(256) = 6.5%; 3 sigma
    assert abs(est["estimate"] - exact) <= 0.195 * exact, (est["estimate"], exact)


def test_hll_registers_merge_by_max(spark, lineitem):
    """The mergeability contract: registers of a union = element-wise
    max of per-part registers — what lets disjoint corpora (or shards)
    be sketched independently and combined."""
    from parkour_spark.operators.sketch import hll_registers

    a = lineitem.where(F.col("l_orderkey") % 2 == 0)
    b = lineitem.where(F.col("l_orderkey") % 2 == 1)
    whole = {
        r["bucket"]: r["rho"]
        for r in hll_registers(lineitem, "l_orderkey", p=6).collect()
    }
    ra = {r["bucket"]: r["rho"] for r in hll_registers(a, "l_orderkey", p=6).collect()}
    rb = {r["bucket"]: r["rho"] for r in hll_registers(b, "l_orderkey", p=6).collect()}
    merged = {k: max(ra[k], rb[k]) for k in ra}
    assert merged == whole


def test_hll_linear_counting_small_range(spark):
    """Tiny cardinality lands in the linear-counting regime (raw ≤ 2.5m
    with empty buckets) and must still estimate well there."""
    from parkour_spark.operators.sketch import hll_estimate, hll_registers

    small = spark.range(20).select(F.col("id").alias("k"))
    est = hll_estimate(hll_registers(small, "k", p=8), p=8).collect()[0]
    assert est["n_zero_buckets"] > 0
    assert abs(est["estimate"] - 20) <= 3, est["estimate"]


def test_hll_duplicates_dont_move_registers(spark, lineitem):
    """COUNT(DISTINCT) semantics: replicating every row leaves the
    sketch identical (max over identical hashes)."""
    from parkour_spark.operators.sketch import hll_registers

    tripled = lineitem.unionAll(lineitem).unionAll(lineitem)
    a = sorted(map(tuple, hll_registers(lineitem, "l_orderkey", p=6).collect()))
    b = sorted(map(tuple, hll_registers(tripled, "l_orderkey", p=6).collect()))
    assert a == b


def test_hll_rho_matches_integer_reference(spark):
    """The string-arithmetic rho (leading zero hex digits × 4 + CASE)
    must equal the integer definition: 1 + leading-zero-bits of the
    64-bit value in md5 hex chars 9..24, for every bucket's max."""
    import hashlib

    from parkour_spark.operators.sketch import hll_registers

    n, p = 5000, 4
    m = 1 << p
    df = spark.range(n).select(F.col("id").alias("k"))
    got = {r["bucket"]: r["rho"] for r in hll_registers(df, "k", p=p).collect()}
    ref = {b: 0 for b in range(m)}
    for i in range(n):
        h = hashlib.md5(str(i).encode()).hexdigest()
        bucket = int(h[:8], 16) % m
        w = int(h[8:24], 16)
        rho = 65 if w == 0 else (64 - w.bit_length()) + 1
        ref[bucket] = max(ref[bucket], rho)
    assert got == ref


def test_hll_by_group_merges_and_matches_global_per_group(spark):
    """Grouped registers for group g == global registers over g's rows,
    and registers from disjoint halves merge by element-wise max."""
    from parkour_spark.operators.sketch import (
        hll_estimate_by, hll_registers, hll_registers_by,
    )

    rows = [(f"g{i % 2}", f"u{i % 37}") for i in range(200)]
    df = spark.createDataFrame(rows, ["g", "u"])
    grouped = hll_registers_by(df, "g", "u", p=4)
    for g in ("g0", "g1"):
        sub = hll_registers(df.where(F.col("g") == g), "u", p=4)
        want = {(r.bucket, r.rho) for r in sub.collect()}
        got = {(r.bucket, r.rho)
               for r in grouped.where(F.col("grp") == g).collect()}
        assert got == want
    # mergeability: max-merge of half registers == full registers
    h1 = hll_registers_by(df.where(F.col("u") < "u2"), "g", "u", p=4)
    h2 = hll_registers_by(df.where(~(F.col("u") < "u2")), "g", "u", p=4)
    merged = {
        (r.grp, r.bucket): r.rho
        for r in h1.unionByName(h2)
        .groupBy("grp", "bucket")
        .agg(F.max("rho").alias("rho"))
        .collect()
    }
    full = {(r.grp, r.bucket): r.rho for r in grouped.collect()}
    assert merged == full


def test_hll_by_group_estimates_reasonable(spark):
    from parkour_spark.operators.sketch import hll_estimate_by, hll_registers_by

    rows = [("a", f"u{i}") for i in range(300)] + [("b", f"v{i}") for i in range(30)]
    df = spark.createDataFrame(rows, ["g", "u"])
    est = {r.grp: (r.estimate, r.n_zero_buckets)
           for r in hll_estimate_by(hll_registers_by(df, "g", "u", p=8), p=8).collect()}
    assert abs(est["a"][0] - 300) <= 0.2 * 300
    assert abs(est["b"][0] - 30) <= 0.2 * 30
