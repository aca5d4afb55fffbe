"""Round-6 third-batch operators: Naive Bayes classifier, per-group
top-percent filter, cross-source overlap matrix, time-weighted value."""

import math

import pytest

from pyspark.sql import Row, functions as F

from parkour_spark.operators.behavior import time_weighted_value
from parkour_spark.operators.classify import nb_score, nb_train
from parkour_spark.operators.corpus import source_overlap, top_percent_by


# --------------------------------------------------------------------------
# Naive Bayes
# --------------------------------------------------------------------------

def _nb_docs(spark):
    # two classes with disjoint vocabulary — NB must separate perfectly
    rows = []
    for i in range(8):
        rows.append(Row(doc_id=i, label="sport", text="goal match team goal"))
    for i in range(8, 12):
        rows.append(Row(doc_id=i, label="math", text="lemma proof theorem"))
    rows.append(Row(doc_id=12, label="sport", text="   "))  # tokenless
    return spark.createDataFrame(rows)


def test_nb_model_is_full_grid(spark):
    docs = _nb_docs(spark)
    model, priors = nb_train(docs, "label", n_buckets=32)
    rows = model.collect()
    assert len(rows) == 2 * 32  # full label × bucket grid, zeros included
    assert {r.label for r in rows} == {"sport", "math"}
    # smoothing floor: zero-count cells all share ln(1 / (n_tok + 32))
    by_label_floor = {}
    for r in rows:
        if r.cnt == 0:
            by_label_floor.setdefault(r.label, set()).add(r.ll_micro)
    assert all(len(v) == 1 for v in by_label_floor.values())
    pri = {r.label: r.n_docs for r in priors.collect()}
    assert pri == {"sport": 9, "math": 4}


def test_nb_zero_token_label_kept(spark):
    """Regression (r11 verdict "What's wrong #1"): a label whose
    training docs are ALL empty must still hold a full smoothing-floor
    grid in the model and be considered at scoring. Falsifying example
    found by hypothesis: [('L1', []), ('L1', []), ('L0', ['alpha'])] —
    with n_buckets=16, correct NB gives L1 (prior ln(2/3) + one floor
    cell ln(1/16) = -3178054 μ) over L0 (ln(1/3) + ln(2/17) =
    -3238678 μ)."""
    docs = spark.createDataFrame(
        [(0, "L1", ""), (1, "L1", ""), (2, "L0", "alpha")],
        ["doc_id", "label", "text"],
    )
    model, priors = nb_train(docs, "label", n_buckets=16)
    rows = model.collect()
    assert len(rows) == 2 * 16  # BOTH labels hold a full grid
    floor = {r.ll_micro for r in rows if r.label == "L1"}
    assert floor == {round(__import__("math").log(1 / 16) * 1e6)}
    got = {
        r.doc_id: (r.pred_label, r.score_micro)
        for r in nb_score(docs, model, priors, n_buckets=16).collect()
    }
    assert got[2] == ("L1", -3178054), got[2]


def test_nb_score_separates_disjoint_vocab(spark):
    docs = _nb_docs(spark)
    model, priors = nb_train(docs, "label", n_buckets=32)
    pred = {
        r.doc_id: r.pred_label
        for r in nb_score(docs, model, priors, n_buckets=32).collect()
    }
    assert len(pred) == 13  # tokenless doc is kept
    for i in range(8):
        assert pred[i] == "sport"
    for i in range(8, 12):
        assert pred[i] == "math"
    # zero-token doc falls back to the larger prior
    assert pred[12] == "sport"


def test_nb_score_micro_nats_match_replica(spark):
    """Exact integer cross-check of one doc's score against a driver
    replica of the same hashed-count arithmetic."""
    import hashlib

    docs = _nb_docs(spark)
    n_b = 32
    model, priors = nb_train(docs, "label", n_buckets=n_b)
    got = {
        (r.doc_id, r.pred_label): r.score_micro
        for r in nb_score(docs, model, priors, n_buckets=n_b).collect()
    }

    def bucket(tok):
        return int(hashlib.md5(tok.encode()).hexdigest()[:8], 16) % n_b

    # replica for doc 0 under label "sport"
    toks = "goal match team goal".split()
    counts = {"goal": 0, "match": 0, "team": 0, "lemma": 0, "proof": 0,
              "theorem": 0}
    for i in range(8):
        for t in ["goal", "match", "team", "goal"]:
            counts[t] += 1
    n_tok = sum(v for k, v in counts.items() if k in ("goal", "match", "team"))
    score = round(math.log(9 / 13) * 1e6)
    for t in toks:
        cell = round(math.log((counts[t] + 1) / (n_tok + n_b)) * 1e6)
        score += cell
    assert got[(0, "sport")] == score


def test_nb_score_layout_invariant(spark):
    docs = _nb_docs(spark)
    model, priors = nb_train(docs, "label", n_buckets=32)
    a = sorted(map(tuple, nb_score(docs, model, priors, n_buckets=32).collect()))
    b = sorted(
        map(
            tuple,
            nb_score(docs.repartition(7), model, priors, n_buckets=32).collect(),
        )
    )
    assert a == b


# --------------------------------------------------------------------------
# top_percent_by
# --------------------------------------------------------------------------

def test_top_percent_ceil_boundaries(spark):
    rows = [Row(g="a", id=i, score=100 - i) for i in range(5)]  # n=5 → keep 1
    rows += [Row(g="b", id=i, score=50 + i) for i in range(4)]  # n=4 → keep 1
    rows += [Row(g="c", id=i, score=i) for i in range(11)]      # n=11 → keep 3
    df = spark.createDataFrame(rows)
    kept = top_percent_by(df, "g", "score", "id", p_num=1, p_den=5).collect()
    by_g = {}
    for r in kept:
        by_g.setdefault(r.g, []).append(r)
    assert len(by_g["a"]) == 1 and by_g["a"][0].id == 0  # best score=100
    assert len(by_g["b"]) == 1 and by_g["b"][0].id == 3  # best score=53
    assert len(by_g["c"]) == 3  # ceil(11/5) = 3: scores 10, 9, 8
    assert sorted(r.id for r in by_g["c"]) == [8, 9, 10]


def test_top_percent_tie_breaks_on_id(spark):
    rows = [Row(g="a", id=i, score=7) for i in range(10)]  # all tied
    df = spark.createDataFrame(rows)
    kept = top_percent_by(df, "g", "score", "id", p_num=1, p_den=5)
    assert sorted(r.id for r in kept.collect()) == [0, 1]  # lowest ids win


def test_top_percent_single_exchange(spark):
    rows = [Row(g="a", id=i, score=i) for i in range(10)]
    df = spark.createDataFrame(rows)
    plan = top_percent_by(df, "g", "score", "id", 1, 5)._jdf.queryExecution(
    ).executedPlan().toString()
    assert plan.count("Exchange") == 1  # rank + count share the partitioning


# --------------------------------------------------------------------------
# source_overlap
# --------------------------------------------------------------------------

def test_source_overlap_counts(spark):
    # 3-token docs → one shingle each; a∩b = {x}, a∩c = {}, b∩c = {y}
    rows = [
        Row(doc_id=0, source="a", text="x x x"),
        Row(doc_id=1, source="a", text="q q q"),
        Row(doc_id=2, source="b", text="x x x"),
        Row(doc_id=3, source="b", text="y y y"),
        Row(doc_id=4, source="c", text="y y y"),
        Row(doc_id=5, source="c", text="z z z"),
    ]
    df = spark.createDataFrame(rows)
    got = {
        (r.src_a, r.src_b): (r.shared, r.n_a, r.n_b)
        for r in source_overlap(df, k=3).collect()
    }
    assert got[("a", "b")] == (1, 2, 2)
    assert got[("b", "c")] == (1, 2, 2)
    assert ("a", "c") not in got  # no shared grams → no row


def test_source_overlap_cap_drops_universal_grams(spark):
    # gram "w w w" is in all 3 sources; cap=2 must drop it everywhere
    rows = []
    for i, s in enumerate(["a", "b", "c"]):
        rows.append(Row(doc_id=2 * i, source=s, text="w w w"))
    rows.append(Row(doc_id=6, source="a", text="x x x"))
    rows.append(Row(doc_id=7, source="b", text="x x x"))
    df = spark.createDataFrame(rows)
    got = {
        (r.src_a, r.src_b): (r.shared, r.n_a, r.n_b)
        for r in source_overlap(df, k=3, max_groups_per_gram=2).collect()
    }
    # only the x-gram survives; totals count capped grams only
    assert got == {("a", "b"): (1, 1, 1)}


# --------------------------------------------------------------------------
# time_weighted_value
# --------------------------------------------------------------------------

def test_time_weighted_value_hand_computed(spark):
    rows = [
        # user 1: 10.00 held 2s, then 30.00 held 1s → twa = (1000*2e6
        # + 3000*1e6) / 3e6 = 5e9/3e6
        Row(event_id=1, user_id=1, ts="2024-01-01 00:00:00", value=10.0),
        Row(event_id=2, user_id=1, ts="2024-01-01 00:00:02", value=30.0),
        Row(event_id=3, user_id=1, ts="2024-01-01 00:00:03", value=99.0),
        # user 2: single event — nothing held
        Row(event_id=4, user_id=2, ts="2024-01-01 00:00:00", value=5.0),
    ]
    df = spark.createDataFrame(rows).withColumn(
        "ts", F.col("ts").cast("timestamp_ntz")
    )
    got = {r.user_id: r for r in time_weighted_value(df).collect()}
    u1 = got[1]
    assert u1.n_events == 3
    assert u1.held_us == 3_000_000
    assert u1.vsum_centi_us == 1000 * 2_000_000 + 3000 * 1_000_000
    assert u1.twa_centi == pytest.approx(u1.vsum_centi_us / u1.held_us)
    u2 = got[2]
    assert u2.n_events == 1 and u2.held_us == 0 and u2.twa_centi is None


def test_time_weighted_value_equal_ts_orders_by_id(spark):
    # two events at the same instant: order must follow event_id, so
    # the value held across the 5s gap is the HIGHER id's value
    rows = [
        Row(event_id=2, user_id=1, ts="2024-01-01 00:00:00", value=7.0),
        Row(event_id=1, user_id=1, ts="2024-01-01 00:00:00", value=3.0),
        Row(event_id=3, user_id=1, ts="2024-01-01 00:00:05", value=1.0),
    ]
    df = spark.createDataFrame(rows).withColumn(
        "ts", F.col("ts").cast("timestamp_ntz")
    )
    r = time_weighted_value(df).collect()[0]
    assert r.vsum_centi_us == 700 * 5_000_000  # id=2's value holds the gap
    assert r.held_us == 5_000_000


def test_time_weighted_value_single_shuffle(spark):
    rows = [
        Row(event_id=i, user_id=i % 3, ts="2024-01-01 00:00:0%d" % (i % 10),
            value=float(i))
        for i in range(12)
    ]
    df = spark.createDataFrame(rows).withColumn(
        "ts", F.col("ts").cast("timestamp_ntz")
    )
    plan = time_weighted_value(df)._jdf.queryExecution().executedPlan(
    ).toString()
    assert plan.count("Exchange") == 1  # window and agg share user keying


# --------------------------------------------------------------------------
# rrf_fuse
# --------------------------------------------------------------------------

def test_rrf_fuse_hand_computed(spark):
    from parkour_spark.operators.similarity import rrf_fuse

    a = spark.createDataFrame(
        [(10, 1), (11, 2), (12, 3)], "doc_id long, rank long"
    )
    b = spark.createDataFrame(
        [(11, 1), (10, 2), (13, 3)], "doc_id long, rank long"
    )
    got = {r.doc_id: r for r in rrf_fuse({"a": a, "b": b}).collect()}
    r61 = round(1e9 / 61)
    r62 = round(1e9 / 62)
    r63 = round(1e9 / 63)
    assert got[10].rrf_nano == r61 + r62 and got[10].n_systems == 2
    assert got[11].rrf_nano == r62 + r61
    assert got[12].rrf_nano == r63 and got[12].n_systems == 1
    # 10 and 11 tie exactly; id breaks the tie
    assert got[10].fused_rank == 1 and got[11].fused_rank == 2
    assert {got[12].fused_rank, got[13].fused_rank} == {3, 4}


def test_rrf_fuse_topk_cut(spark):
    from parkour_spark.operators.similarity import rrf_fuse

    a = spark.createDataFrame(
        [(i, i + 1) for i in range(30)], "doc_id long, rank long"
    )
    out = rrf_fuse({"a": a}, topk=5).collect()
    assert sorted(r.doc_id for r in out) == [0, 1, 2, 3, 4]


# --------------------------------------------------------------------------
# embedding_label_outliers composition (planted outlier)
# --------------------------------------------------------------------------

def test_embedding_outlier_planted(spark):
    from parkour_spark.operators.kmeans import grouped_centroids
    from parkour_spark.operators.validate import mad_profile

    rows = [(i, [1.0, 1.0], 0) for i in range(9)]
    rows.append((9, [50.0, -50.0], 0))  # the planted corruption
    emb = spark.createDataFrame(
        rows, "vec_id long, embedding array<double>, label int"
    )
    sums = grouped_centroids(emb, "label", "embedding")
    cents = sums.select(
        F.col("grp").alias("label"), "pos",
        F.round(F.col("sum_micro").cast("double") / F.col("n"))
        .cast("long").alias("cm"),
    )
    qm = emb.select(
        "label", "vec_id",
        F.posexplode(F.expr("transform(embedding, x -> cast(x as double))"))
        .alias("pos", "v"),
    ).select(
        "label", "vec_id", "pos",
        F.floor(F.col("v") * 1e6).cast("long").alias("qm"),
    )
    d = (
        qm.join(F.broadcast(cents), ["label", "pos"])
        .groupBy("label", "vec_id")
        .agg(F.sum((F.col("qm") - F.col("cm"))
                   * (F.col("qm") - F.col("cm"))).alias("d2"))
    )
    x = d.select("label", F.expr("d2 div 100000000").alias("dist_q"))
    prof = mad_profile(x, "dist_q", "label", k=3).collect()[0]
    # 9 identical vectors pin median/MAD near the inlier distance; the
    # planted vector's distance is astronomically past 3*MAD
    assert prof.n == 10
    assert prof.n_outliers == 1


# --------------------------------------------------------------------------
# interleave_by_group
# --------------------------------------------------------------------------

def test_interleave_round_robin_property(spark):
    from parkour_spark.operators.corpus import interleave_by_group

    rows = [Row(doc_id=i, source=f"s{i % 3}") for i in range(30)]
    df = spark.createDataFrame(rows)
    out = interleave_by_group(df).collect()
    assert len(out) == 30
    # order keys are unique and round-robin: sorted by order_key, every
    # consecutive block of 3 holds all 3 sources
    by_key = sorted(out, key=lambda r: r.order_key)
    assert len({r.order_key for r in out}) == 30
    for blk in range(10):
        srcs = {r.source for r in by_key[3 * blk: 3 * blk + 3]}
        assert srcs == {"s0", "s1", "s2"}
    # arithmetic key structure
    for r in out:
        assert r.order_key == r.pos_in_group * 3 + r.group_rank


def test_interleave_seed_reshuffles_and_layout_invariant(spark):
    from parkour_spark.operators.corpus import interleave_by_group

    rows = [Row(doc_id=i, source=f"s{i % 3}") for i in range(30)]
    df = spark.createDataFrame(rows)
    a = {r.doc_id: r.order_key for r in interleave_by_group(df).collect()}
    b = {
        r.doc_id: r.order_key
        for r in interleave_by_group(df.repartition(7)).collect()
    }
    c = {
        r.doc_id: r.order_key
        for r in interleave_by_group(df, seed="epoch-2").collect()
    }
    assert a == b          # layout-independent
    assert a != c          # new seed permutes within groups
    assert sorted(a.values()) == sorted(c.values())  # same key space


def test_interleave_uneven_groups_leave_holes_not_collisions(spark):
    from parkour_spark.operators.corpus import interleave_by_group

    rows = [Row(doc_id=i, source="big") for i in range(8)]
    rows += [Row(doc_id=100, source="small")]
    df = spark.createDataFrame(rows)
    out = interleave_by_group(df).collect()
    keys = [r.order_key for r in out]
    assert len(set(keys)) == len(keys)  # injective despite uneven sizes
    small = [r for r in out if r.source == "small"][0]
    assert small.pos_in_group == 0  # the lone doc sits in round 0


# --------------------------------------------------------------------------
# water_filling_allocation
# --------------------------------------------------------------------------

def _waterfill_ref(ns, budget):
    """Driver replica: max integer tau with sum(min(n, tau)) <= budget."""
    if sum(ns) <= budget:
        return {i: n for i, n in enumerate(ns)}
    lo, hi = 0, max(ns)
    while lo < hi:
        mid = (lo + hi + 1) // 2
        if sum(min(n, mid) for n in ns) <= budget:
            lo = mid
        else:
            hi = mid - 1
    return {i: min(n, lo) for i, n in enumerate(ns)}


def test_waterfill_matches_binary_search_replica(spark):
    from parkour_spark.operators.corpus import water_filling_allocation

    cases = [
        ([10, 20, 30, 100], 60),
        ([10, 20, 30, 100], 5),      # below even the uniform floor
        ([10, 20, 30, 100], 1000),   # budget >= total: full allocation
        ([7], 3),
        ([5, 5, 5, 5], 11),
        ([1, 2, 3, 4, 5, 6, 7, 8, 9], 20),
        ([1000000, 1, 1, 1], 50),
    ]
    for ns, b in cases:
        df = spark.createDataFrame(
            [(f"g{i}", n) for i, n in enumerate(ns)],
            "source string, n_tokens long",
        )
        got = {
            r.source: r.allocated
            for r in water_filling_allocation(df, budget_tokens=b).collect()
        }
        ref = _waterfill_ref(ns, b)
        want = {f"g{i}": v for i, v in ref.items()}
        assert got == want, (ns, b, got, want)
        assert sum(got.values()) <= b or sum(ns) <= b


def test_waterfill_small_groups_keep_everything(spark):
    from parkour_spark.operators.corpus import water_filling_allocation

    df = spark.createDataFrame(
        [("tiny", 3), ("huge", 10_000)], "source string, n_tokens long"
    )
    got = {
        r.source: r.allocated
        for r in water_filling_allocation(df, budget_tokens=103).collect()
    }
    assert got == {"tiny": 3, "huge": 100}


# --------------------------------------------------------------------------
# fd_violations / benford_profile
# --------------------------------------------------------------------------

def test_fd_violations_counts_and_ties(spark):
    from parkour_spark.operators.validate import fd_violations

    rows = [Row(x="a", y="en")] * 3 + [Row(x="a", y="fr")]
    rows += [Row(x="b", y="de")] * 2 + [Row(x="b", y="zh")] * 2  # tie
    rows += [Row(x="c", y="es")]  # exact FD
    df = spark.createDataFrame(rows)
    got = {r.x: r for r in fd_violations(df, "x", "y").collect()}
    assert (got["a"].majority_rhs, got["a"].n_majority,
            got["a"].n_violations) == ("en", 3, 1)
    # tie broken by rhs asc: "de" < "zh"
    assert (got["b"].majority_rhs, got["b"].n_violations) == ("de", 2)
    assert got["c"].n_violations == 0 and got["c"].n == 1


def test_benford_digits_and_expected(spark):
    import math

    from parkour_spark.operators.validate import benford_profile

    # values 1.00..9.00 → one per digit; 0 and negatives excluded
    rows = [Row(v=float(i)) for i in range(10)] + [Row(v=-5.0)]
    df = spark.createDataFrame(rows)
    got = {r.digit: r for r in benford_profile(df, "v").collect()}
    assert sorted(got) == list(range(1, 10))
    assert all(got[d].n_obs == 1 for d in got)
    for d in range(1, 10):
        assert got[d].expected_micro == round(
            9 * math.log10(1 + 1 / d) * 1e6
        )


def test_benford_leading_digit_of_cents(spark):
    from parkour_spark.operators.validate import benford_profile

    # 0.07 → 7 cents → digit 7; 123.45 → 12345 → digit 1
    df = spark.createDataFrame([Row(v=0.07), Row(v=123.45)])
    got = {r.digit: r.n_obs for r in benford_profile(df, "v").collect()}
    assert got == {7: 1, 1: 1}


# --------------------------------------------------------------------------
# plan-shape guards for the new operators
# --------------------------------------------------------------------------

def test_source_overlap_plan_has_no_join_on_grams(spark):
    """The pair stage must be the collect_set + scan-side combo explode,
    never a gram-keyed self-join (and never a cartesian product)."""
    from parkour_spark.operators.corpus import source_overlap

    rows = [Row(doc_id=i, source=f"s{i % 3}", text="a b c d e")
            for i in range(9)]
    df = spark.createDataFrame(rows)
    plan = source_overlap(df, k=3)._jdf.queryExecution().executedPlan(
    ).toString()
    assert "SortMergeJoin" not in plan
    assert "CartesianProduct" not in plan
    # the only joins left are the two broadcast totals attachments
    assert plan.count("BroadcastHashJoin") == 2


def test_nb_score_plan_no_cartesian_and_model_broadcasts(spark):
    from parkour_spark.operators.classify import nb_score, nb_train

    docs = _nb_docs(spark)
    model, priors = nb_train(docs, "label", n_buckets=32)
    plan = nb_score(docs, model, priors, n_buckets=32)._jdf.queryExecution(
    ).executedPlan().toString()
    assert "CartesianProduct" not in plan
    # the model join into per-doc bucket counts is a broadcast, never a
    # shuffle join keyed on the corpus
    assert "BroadcastHashJoin" in plan


def test_interleave_plan_no_corpus_global_sort(spark):
    """The corpus-side window must be source-partitioned; only the tiny
    distinct-groups table may pass through a single partition."""
    from parkour_spark.operators.corpus import interleave_by_group

    rows = [Row(doc_id=i, source=f"s{i % 3}") for i in range(30)]
    df = spark.createDataFrame(rows)
    plan = interleave_by_group(df)._jdf.queryExecution().executedPlan(
    ).toString()
    # the in-group position window partitions by source
    assert "partitionBy=[source" in plan.replace(" ", "")[:100000] or \
        "hashpartitioning(source" in plan


# --------------------------------------------------------------------------
# cooccurrence_pairs
# --------------------------------------------------------------------------

def test_cooccurrence_hand_computed_and_cap(spark):
    from parkour_spark.operators.agg import cooccurrence_pairs

    rows = [
        Row(g=1, i="a"), Row(g=1, i="b"), Row(g=1, i="c"),
        Row(g=2, i="a"), Row(g=2, i="b"),
        Row(g=3, i="a"), Row(g=3, i="b"), Row(g=3, i="a"),  # dup item
        Row(g=4, i="x"), Row(g=4, i="y"),
    ]
    df = spark.createDataFrame(rows)
    got = {
        (r.item_a, r.item_b): r.n_groups
        for r in cooccurrence_pairs(df, "g", "i", min_count=2).collect()
    }
    assert got == {("a", "b"): 3}  # (a,c),(b,c),(x,y) appear once only
    # cap drops oversized baskets whole
    capped = {
        (r.item_a, r.item_b): r.n_groups
        for r in cooccurrence_pairs(
            df, "g", "i", min_count=2, max_items_per_group=2
        ).collect()
    }
    assert capped == {("a", "b"): 2}  # basket 1 (3 items) dropped


def test_cooccurrence_plan_no_self_join(spark):
    from parkour_spark.operators.agg import cooccurrence_pairs

    rows = [Row(g=i % 4, i=f"p{i % 5}") for i in range(20)]
    df = spark.createDataFrame(rows)
    plan = cooccurrence_pairs(df, "g", "i")._jdf.queryExecution(
    ).executedPlan().toString()
    assert "SortMergeJoin" not in plan and "Join" not in plan


# --------------------------------------------------------------------------
# cusum_profile
# --------------------------------------------------------------------------

def test_cusum_matches_sequential_recurrence(spark):
    from parkour_spark.operators.validate import cusum_profile

    series = {
        "a": [5, 5, 6, 9, 9, 9, 5, 5],   # sustained +4 shift mid-way
        "b": [5, 5, 5, 5, 5, 5, 5, 5],   # flat: S stays 0
    }
    rows = [
        Row(g=g, t=i, x=v)
        for g, vs in series.items()
        for i, v in enumerate(vs)
    ]
    df = spark.createDataFrame(rows)
    ref = spark.createDataFrame(
        [("a", 5, 6), ("b", 5, 6)], "g string, k long, h long"
    )
    got = {r.g: r for r in cusum_profile(df, "x", "t", "g", ref).collect()}

    def seq(vs, k, h):
        s, mx, alarms = 0, 0, 0
        for v in vs:
            s = max(0, s + v - k)
            mx = max(mx, s)
            alarms += s > h
        return mx, alarms

    for g in series:
        mx, al = seq(series[g], 5, 6)
        assert (got[g].max_cusum, got[g].n_alarm_points) == (mx, al), g
    # the drift case actually alarms; the flat case never does
    assert got["a"].n_alarm_points > 0
    assert got["b"].max_cusum == 0 and got["b"].n_alarm_points == 0


def test_cusum_resets_after_excess_drains(spark):
    from parkour_spark.operators.validate import cusum_profile

    # spike then long drought: max(0, ...) must clamp at zero, so the
    # closed form (P - min(0, running-min P)) must not go negative
    rows = [Row(g="a", t=i, x=v)
            for i, v in enumerate([20, 0, 0, 0, 0, 10])]
    df = spark.createDataFrame(rows)
    ref = spark.createDataFrame([("a", 5, 100)], "g string, k long, h long")
    r = cusum_profile(df, "x", "t", "g", ref).collect()[0]
    # sequential: 15, 10, 5, 0, 0, 5 -> max 15, never negative
    assert r.max_cusum == 15 and r.n_alarm_points == 0


# --------------------------------------------------------------------------
# linear_attribution
# --------------------------------------------------------------------------

def test_linear_attribution_hand_computed(spark):
    from parkour_spark.operators.behavior import linear_attribution

    rows = [
        # user 1: view@0s, click@10s, purchase@20s -> each touch 1/2
        Row(event_id=1, user_id=1, event_type="view",
            ts="2024-01-01 00:00:00", value=0.0),
        Row(event_id=2, user_id=1, event_type="click",
            ts="2024-01-01 00:00:10", value=0.0),
        Row(event_id=3, user_id=1, event_type="purchase",
            ts="2024-01-01 00:00:20", value=1.0),
        # user 2: one view inside, one view OUTSIDE the 60s lookback
        Row(event_id=4, user_id=2, event_type="view",
            ts="2024-01-01 00:00:00", value=0.0),
        Row(event_id=5, user_id=2, event_type="view",
            ts="2024-01-01 00:10:00", value=0.0),
        Row(event_id=6, user_id=2, event_type="purchase",
            ts="2024-01-01 00:10:30", value=1.0),
        # user 3: conversion with no touches -> contributes nothing
        Row(event_id=7, user_id=3, event_type="purchase",
            ts="2024-01-01 00:00:00", value=1.0),
    ]
    df = spark.createDataFrame(rows).withColumn(
        "ts", F.col("ts").cast("timestamp_ntz")
    )
    got = {
        r.event_type: (r.n_touchpoints, r.credit_micro)
        for r in linear_attribution(
            df, "purchase", ["view", "click"], lookback_s=60
        ).collect()
    }
    # user 1's two touches split 1e6; user 2's in-window view gets 1e6
    assert got["view"] == (2, 500000 + 1000000)
    assert got["click"] == (1, 500000)
