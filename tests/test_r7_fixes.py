"""Round-7 fixes: the two r6 plan-shape rewrites (winsorize_bounds,
vocab_head_coverage), the five r6 ADVICE items, and the avro
aware-timestamp round-trip regression the r5→r6 fix implied."""

import datetime

import pytest
from pyspark.sql import functions as F, types as T


def _physical(df):
    return df._jdf.queryExecution().executedPlan().toString()


# ------------------------------------------------------------------
# winsorize_bounds: distinct-cell cumulative pick, never a full-table
# single-partition rank (r6 verdict #2)
# ------------------------------------------------------------------

def test_winsorize_bounds_windows_over_cells_not_rows(spark):
    from parkour_spark.operators.validate import winsorize_bounds

    df = spark.range(1000).select(
        F.col("id"), (F.col("id") % 10).cast("double").alias("v")
    )
    plan = _physical(winsorize_bounds(df, "v", "id", 0.1, 0.9)).splitlines()
    # no full-table rank anywhere
    assert not any("row_number" in ln for ln in plan), "\n".join(plan)
    # the window's input must be the post-aggregate (value, cnt) cell
    # table: a KEYED HashAggregate sits below the Window in its subtree
    wi = next(i for i, ln in enumerate(plan) if "Window [sum" in ln)
    below = plan[wi + 1 :]
    assert any(
        "HashAggregate(keys=[" in ln and "keys=[]" not in ln for ln in below
    ), "\n".join(plan)


def test_winsorize_bounds_values_match_rank_pick(spark):
    from parkour_spark.operators.validate import winsorize_bounds

    # heavy ties: rank-⌈q·n⌉ semantics must survive the cell rewrite
    vals = [1.0] * 5 + [2.0] * 3 + [3.0] * 2  # n=10
    df = spark.createDataFrame(
        [(i, v) for i, v in enumerate(vals)], "id long, v double"
    )
    row = winsorize_bounds(df, "v", "id", 0.25, 0.95).collect()[0]
    # rank ceil(.25*10)=3 -> 1.0 ; rank ceil(.95*10)=10 -> 3.0
    assert (row["lo"], row["hi"]) == (1.0, 3.0)


def test_winsorize_bounds_ignores_nulls(spark):
    from parkour_spark.operators.validate import winsorize_bounds

    df = spark.createDataFrame(
        [(0, None), (1, 10.0), (2, 20.0), (3, 30.0), (4, 40.0)],
        "id long, v double",
    )
    row = winsorize_bounds(df, "v", "id", 0.5, 1.0).collect()[0]
    # NULL excluded: n=4, rank 2 -> 20.0, rank 4 -> 40.0
    assert (row["lo"], row["hi"]) == (20.0, 40.0)


# ------------------------------------------------------------------
# vocab_head_coverage: TakeOrderedAndProject head, never a
# full-vocabulary rank window (r6 verdict #3)
# ------------------------------------------------------------------

def test_vocab_head_plan_is_take_ordered(spark):
    from parkour_spark.operators.corpus import vocab_head_coverage

    docs = spark.createDataFrame(
        [(1, "a a a b b c"), (2, "a b d")], "doc_id long, text string"
    )
    plan = _physical(vocab_head_coverage(docs, top_n=2))
    assert "TakeOrderedAndProject" in plan, plan


def test_vocab_head_values_unchanged(spark):
    from parkour_spark.operators.corpus import vocab_head_coverage

    docs = spark.createDataFrame(
        [(1, "a a a b b c"), (2, "a b d")], "doc_id long, text string"
    )
    rows = {
        r["rank"]: (r["term"], r["cnt"], r["cum_micro"])
        for r in vocab_head_coverage(docs, top_n=2).collect()
    }
    # 9 tokens total: a=4, b=3, c=1, d=1
    assert rows[1] == ("a", 4, 444444)
    assert rows[2] == ("b", 3, 777777)


# ------------------------------------------------------------------
# linear_attribution: credit window keyed by (user, conversion) so
# per-user-unique event ids never merge across users (r6 ADVICE)
# ------------------------------------------------------------------

def test_linear_attribution_per_user_event_ids_do_not_merge(spark):
    from parkour_spark.operators.behavior import linear_attribution

    t0 = datetime.datetime(2024, 1, 1, 12, 0, 0)
    s = lambda secs: t0 + datetime.timedelta(seconds=secs)  # noqa: E731
    # both users reuse event_id=1 for their conversion; u1 has ONE
    # touch, u2 has TWO — merged windows would split u1's credit 3 ways
    rows = [
        ("u1", 10, "click", s(0)),
        ("u1", 1, "buy", s(5)),
        ("u2", 20, "click", s(0)),
        ("u2", 21, "view", s(1)),
        ("u2", 1, "buy", s(5)),
    ]
    ev = spark.createDataFrame(
        rows, "user_id string, event_id long, event_type string, ts timestamp"
    )
    out = {
        r["event_type"]: (r["n_touchpoints"], r["credit_micro"])
        for r in linear_attribution(
            ev, "buy", ["click", "view"], lookback_s=60
        ).collect()
    }
    # u1's click: full credit (1e6); u2's click+view: half each
    assert out["click"] == (2, 1_000_000 + 500_000)
    assert out["view"] == (1, 500_000)


# ------------------------------------------------------------------
# hard_negatives: NULL corpus labels stay eligible (r6 ADVICE)
# ------------------------------------------------------------------

def test_hard_negatives_keeps_unlabeled_corpus_rows(spark):
    from parkour_spark.operators.similarity import hard_negatives

    corpus = spark.createDataFrame(
        [(1, [1.0, 0.0], "pos"), (2, [0.9, 0.1], None), (3, [0.0, 1.0], "neg")],
        "vec_id long, embedding array<double>, label string",
    )
    queries = spark.createDataFrame(
        [(100, [1.0, 0.0], "pos", 1)],
        "query_id long, query_vec array<double>, query_label string, positive_id long",
    )
    got = {
        r["vec_id"]
        for r in hard_negatives(corpus, queries, k=5).collect()
    }
    # id=1 excluded (same label + gold doc); the UNLABELED id=2 must
    # appear — under a plain != it was silently dropped
    assert got == {2, 3}


# ------------------------------------------------------------------
# fit_linear: clear error on empty input (r6 ADVICE)
# ------------------------------------------------------------------

def test_fit_linear_empty_input_raises_value_error(spark):
    from parkour_spark.operators.regress import fit_linear

    df = spark.createDataFrame([], "x double, y double")
    with pytest.raises(ValueError, match="empty input"):
        fit_linear(df, ["x"], "y")


# ------------------------------------------------------------------
# pit_enrich: fact/dim attribute name collision raises (r6 ADVICE)
# ------------------------------------------------------------------

def test_pit_enrich_name_collision_raises(spark):
    from parkour_spark.operators.cdc import pit_enrich

    facts = spark.createDataFrame(
        [(1, datetime.datetime(2024, 1, 2), "from-facts")],
        "k long, ts timestamp, segment string",
    )
    dim = spark.createDataFrame(
        [(1, datetime.datetime(2024, 1, 1), None, "from-dim")],
        "k long, valid_from timestamp, valid_to timestamp, segment string",
    )
    with pytest.raises(ValueError, match="segment"):
        pit_enrich(facts, dim, ["k"], "ts")


# ------------------------------------------------------------------
# avro: aware-timestamp instant round-trip (r5 ADVICE fix regression)
# ------------------------------------------------------------------

def test_avro_timestamp_round_trip_instant_equality(spark, tmp_path):
    from parkour_spark.sources import avrofmt as A

    instants = [
        datetime.datetime(2024, 3, 1, 12, 34, 56, 789012),
        datetime.datetime(1969, 12, 31, 23, 59, 59, 1),  # pre-epoch
        None,
    ]
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(instants)],
        T.StructType(
            [
                T.StructField("id", T.LongType(), False),
                T.StructField("ts", T.TimestampType(), True),
            ]
        ),
    )
    path = str(tmp_path / "ts_roundtrip")
    A.write_avro(df, path)
    back = {r["id"]: r["ts"] for r in A.read_avro(spark, path).collect()}
    # the session is UTC-pinned, so collected naive datetimes ARE the
    # UTC instants: equality here is instant equality
    for i, t in enumerate(instants):
        assert back[i] == t, (i, back[i], t)
