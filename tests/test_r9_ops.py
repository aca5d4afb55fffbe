"""Round-9 second-wave operators: k-anonymity/l-diversity audit,
Fellegi–Sunter record linkage, ANN recall evaluation."""

import pytest
from pyspark.sql import functions as F


# ------------------------------------------------------------------
# k-anonymity / l-diversity (validate.k_anonymity_report)
# ------------------------------------------------------------------


def _people(spark):
    rows = [
        # (zip, age_band, disease) — classic Sweeney-style fixture
        ("02138", "20s", "flu"),
        ("02138", "20s", "flu"),
        ("02138", "20s", "cold"),      # class size 3, l=2
        ("02139", "30s", "flu"),       # class size 1 -> k-violation
        ("02140", "40s", "cold"),
        ("02140", "40s", "cold"),
        ("02140", "40s", "cold"),
        ("02140", "40s", "cold"),      # class size 4, l=1 -> homogeneity
    ]
    return spark.createDataFrame(rows, "zip string, age string, dx string")


def test_k_anonymity_counts_exact(spark):
    from parkour_spark.operators.validate import k_anonymity_report

    r = k_anonymity_report(
        _people(spark), ["zip", "age"], k=3, sensitive_col="dx",
        l_threshold=2,
    ).collect()[0]
    assert r.n_rows == 8 and r.n_classes == 3
    assert r.min_class_size == 1
    assert r.n_violating_classes == 1 and r.rows_at_risk == 1
    assert r.min_l_diversity == 1
    # the size-4 all-'cold' class AND the singleton (l=1) both leak
    assert r.n_low_diversity_classes == 2
    assert r.rows_low_diversity == 5


def test_k_anonymity_without_sensitive(spark):
    from parkour_spark.operators.validate import k_anonymity_report

    r = k_anonymity_report(_people(spark), ["zip"], k=4).collect()[0]
    assert r.n_classes == 3
    assert r.n_violating_classes == 2  # sizes 3 and 1 are < 4
    assert r.rows_at_risk == 4
    assert "min_l_diversity" not in r.asDict()


def test_k_anonymity_nulls_group_together(spark):
    from parkour_spark.operators.validate import k_anonymity_report

    df = spark.createDataFrame(
        [(None, "a"), (None, "a"), ("z", "a")], "q string, s string"
    )
    r = k_anonymity_report(df, ["q"], k=2).collect()[0]
    assert r.n_classes == 2 and r.n_violating_classes == 1

    with pytest.raises(ValueError, match="quasi col"):
        k_anonymity_report(df, [], k=2)


# ------------------------------------------------------------------
# Fellegi–Sunter linkage (operators.linkage)
# ------------------------------------------------------------------


def test_fs_weights_micro_values_and_validation():
    import math

    from parkour_spark.operators.linkage import fs_weights_micro

    wa, wd = fs_weights_micro(0.9, 0.001)
    assert wa == round(1e6 * math.log(900.0))
    assert wd == round(1e6 * math.log(0.1 / 0.999))
    with pytest.raises(ValueError, match="likelier under a match"):
        fs_weights_micro(0.1, 0.5)
    with pytest.raises(ValueError, match="in \\(0, 1\\)"):
        fs_weights_micro(1.0, 0.5)


def test_fs_score_hand_computed(spark):
    from parkour_spark.operators.linkage import (
        blocked_pairs,
        fs_score,
        fs_weights_micro,
    )

    a = spark.createDataFrame(
        [(1, "b1", "ann", "x"), (2, "b1", "bob", "y")],
        "id long, blk string, name string, tag string",
    )
    b = spark.createDataFrame(
        [(11, "b1", "ann", "x"), (12, "b1", "ann", None)],
        "id long, blk string, name string, tag string",
    )
    pairs = blocked_pairs(a, b, "blk")
    scored = fs_score(
        pairs,
        {"name": (0.9, 0.01), "tag": (0.8, 0.1)},
        match_threshold_micro=6_000_000,
        non_match_threshold_micro=-1_000_000,
    )
    got = {
        (r.id_a, r.id_b): (r.score_micro, r.decision)
        for r in scored.collect()
    }
    wn_a, wn_d = fs_weights_micro(0.9, 0.01)
    wt_a, wt_d = fs_weights_micro(0.8, 0.1)
    assert got[(1, 11)] == (wn_a + wt_a, "match")
    assert got[(1, 12)] == (wn_a + 0, "possible")      # NULL tag scores 0
    assert got[(2, 11)] == (wn_d + wt_d, "non_match")
    assert len(got) == 4


def test_blocked_pairs_caps_hot_blocks(spark):
    from parkour_spark.operators.linkage import blocked_pairs

    a = spark.createDataFrame(
        [(i, "hot" if i < 5 else "cold", f"n{i}") for i in range(7)],
        "id long, blk string, name string",
    )
    pairs = blocked_pairs(a, a, "blk", max_block=3)
    blocks = {r.id_a for r in pairs.collect()}
    assert blocks == {5, 6}  # the 5-member hot block was dropped

    with pytest.raises(ValueError, match="exceed"):
        from parkour_spark.operators.linkage import fs_score

        fs_score(
            pairs, {"name": (0.9, 0.01)},
            match_threshold_micro=0, non_match_threshold_micro=0,
        )


def test_fs_linkage_gate_entry_recovers_true_pairs(spark, sf_dir):
    from parkour_spark.queries import QUERIES

    out = QUERIES["fs_linkage_customers"](spark, sf_dir).collect()
    true_links = [r for r in out if r.id_b - r.id_a == 10_000_000]
    keys = [
        r.c_custkey
        for r in spark.read.parquet(f"{sf_dir}/customer.parquet")
        .select("c_custkey")
        .collect()
    ]
    # a twin drops below the floor exactly when BOTH name and balance
    # are corrupted (custkey divisible by 15): w_name_dis + w_bal_dis
    # outweighs the segment term in every variant
    expected = [k for k in keys if k % 15 != 0]
    assert sorted(r.id_a for r in true_links) == sorted(expected)
    # ...and the uncorrupted-name majority auto-links as 'match'
    assert sum(1 for r in true_links if r.decision == "match") > len(keys) // 2


# ------------------------------------------------------------------
# ANN recall evaluation (ivf_recall_at_k)
# ------------------------------------------------------------------


def test_ivf_recall_bounds_and_exactness(spark, sf_dir):
    from parkour_spark.queries import QUERIES

    rows = QUERIES["ivf_recall_at_k"](spark, sf_dir).collect()
    assert len(rows) == 5  # one per query
    for r in rows:
        assert 0 <= r.n_hits <= 10
        assert r.recall_bp == (10000 * r.n_hits) // 10
    # nprobe=4 of 16 cells must beat trivial recall (exactness of the
    # recall ARITHMETIC is what the sf0.01 oracle gate pins; the sparse
    # sf0.001 corpus scatters neighbors across more cells, so the bound
    # here is deliberately loose)
    assert sum(r.n_hits for r in rows) >= 10


# ------------------------------------------------------------------
# end-to-end MDM pipeline (linkage → CC → golden record)
# ------------------------------------------------------------------


def test_mdm_golden_field_level_survivorship(spark, sf_dir):
    """Per-FIELD survivorship across the resolved entity: the newer
    twin's name wins where corrupted (' jr'), but its dropped segment
    falls back to the original's value — the behavior row-level
    keep-latest gets wrong."""
    from parkour_spark.queries import QUERIES

    golden = {
        r.entity: r for r in QUERIES["mdm_golden_pipeline"](spark, sf_dir).collect()
    }
    cust = {
        r.c_custkey: r
        for r in spark.read.parquet(f"{sf_dir}/customer.parquet").collect()
    }
    # FALLBACK: twin links (name+bal agree) but dropped its segment —
    # the golden segment falls back past the newer NULL to v1's value
    fallback = [k for k in cust if k % 4 == 0 and k % 3 != 0 and k % 20 != 0]
    assert fallback
    for k in fallback[:5]:
        g = golden[k]  # entity id = min(rid) = original custkey
        assert g.n_records == 2
        assert g.name_golden == cust[k].c_name
        assert g.seg_golden == cust[k].c_mktsegment     # fallback past NULL
    # NEWEST WINS: twin links (name+seg agree) with a corrected balance
    # — the golden balance is the newer version's value
    newest = [
        k for k in cust if k % 5 == 0 and k % 3 != 0 and k % 4 != 0
    ]
    assert newest
    for k in newest[:5]:
        g = golden[k]
        assert g.n_records == 2
        assert g.bal_golden == round(cust[k].c_acctbal * 100) + 1
    # a name-corrupted twin scores below the auto-match threshold
    # (possible, not match) and stays its own singleton entity —
    # clerical-review territory, never silently merged
    lonely = [k for k in cust if k % 3 == 0]
    for k in lonely[:3]:
        assert golden[k].n_records == 1
        assert golden[k + 10_000_000].n_records == 1


# ------------------------------------------------------------------
# term-frequency-adjusted linkage (linkage.fs_tf_weights)
# ------------------------------------------------------------------


def test_fs_tf_weights_values(spark):
    import math

    from parkour_spark.operators.linkage import fs_tf_weights

    recs = spark.createDataFrame(
        [("ann",), ("ann",), ("ann",), ("zoe",), (None,)], "name string"
    )
    w = {r.value: r.w_micro for r in fs_tf_weights(recs, "name", 0.9).collect()}
    # NULLs excluded from both counts and total (n = 4)
    assert w["ann"] == round(1e6 * math.log(0.9 * 4 / 3))
    assert w["zoe"] == round(1e6 * math.log(0.9 * 4 / 1))
    assert w["zoe"] > w["ann"]  # rare-value agreement counts for more
    import pytest as _pytest

    with _pytest.raises(ValueError, match="in \\(0, 1\\)"):
        fs_tf_weights(recs, "name", 1.5)


def test_fs_score_tf_rare_vs_common_and_fallback(spark):
    import math

    from parkour_spark.operators.linkage import (
        blocked_pairs,
        fs_score,
        fs_tf_weights,
        fs_weights_micro,
    )

    ref = spark.createDataFrame(
        [("ann",)] * 9 + [("zoe",)], "name string"
    )
    tf = fs_tf_weights(ref, "name", 0.9)
    a = spark.createDataFrame(
        [(1, "b", "ann"), (2, "b", "zoe"), (3, "b", "new")],
        "id long, blk string, name string",
    )
    pairs = blocked_pairs(a, a, "blk")
    scored = {
        (r.id_a, r.id_b): r.score_micro
        for r in fs_score(
            pairs, {"name": (0.9, 0.001)}, 10_000_000, -10_000_000,
            tf_weights={"name": tf},
        ).collect()
    }
    w_ann = round(1e6 * math.log(0.9 * 10 / 9))
    w_zoe = round(1e6 * math.log(0.9 * 10 / 1))
    wa, wd = fs_weights_micro(0.9, 0.001)
    assert scored[(1, 1)] == w_ann      # common value: weak agreement
    assert scored[(2, 2)] == w_zoe      # rare value: strong agreement
    assert scored[(3, 3)] == wa         # unseen value: global fallback
    assert scored[(1, 2)] == wd         # disagreement: global weight
    assert w_zoe > w_ann  # rarity orders the TF weights


def test_blocking_quality_hand_computed(spark):
    from parkour_spark.operators.linkage import blocking_quality

    cand = spark.createDataFrame(
        [(1, 11), (2, 12), (3, 99), (3, 99)], "id_a long, id_b long"
    )
    truth = spark.createDataFrame(
        [(1, 11), (2, 12), (4, 14), (5, 15)], "id_a long, id_b long"
    )
    r = blocking_quality(cand, truth, 10, 10).collect()[0]
    assert r.n_candidates == 3   # duplicates collapse
    assert r.n_true == 4 and r.n_found == 2
    assert r.pc_bp == 5000       # half the true matches survive blocking
    assert r.rr_bp == (10000 * 97) // 100


def test_blocking_quality_gate_entry_values(spark, sf_dir):
    from parkour_spark.queries import QUERIES

    r = QUERIES["blocking_quality_customers"](spark, sf_dir).collect()[0]
    keys = [
        x.c_custkey
        for x in spark.read.parquet(f"{sf_dir}/customer.parquet")
        .select("c_custkey")
        .collect()
    ]
    # a twin is blocked out exactly when its segment was NULLed
    expected_found = sum(1 for k in keys if k % 4 != 0)
    assert r.n_true == len(keys)
    assert r.n_found == expected_found
    assert r.pc_bp == (10000 * expected_found) // len(keys)
    assert 0 < r.rr_bp < 10000
