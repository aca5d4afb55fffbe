"""Behavioral analytics semantics (operators/behavior.py): the
sequential-funnel correctness case the min-per-type shortcut gets
wrong, retention offsets, and deterministic transition ordering."""

from datetime import datetime

import pytest
from pyspark.sql import functions as F

from parkour_spark.operators.behavior import (
    funnel,
    retention_cohorts,
    transition_matrix,
)


def _ev(spark, rows):
    return spark.createDataFrame(
        rows, "event_id long, user_id long, event_type string, ts timestamp"
    )


def _t(s):
    return datetime.fromisoformat(s)


def test_funnel_counts_sequential_completion(spark):
    ev = _ev(
        spark,
        [
            # user 1 completes in order
            (1, 1, "view", _t("2024-01-01 10:00")),
            (2, 1, "click", _t("2024-01-01 11:00")),
            (3, 1, "purchase", _t("2024-01-01 12:00")),
            # user 2 clicks BEFORE viewing and never after -> stops at view
            (4, 2, "click", _t("2024-01-01 09:00")),
            (5, 2, "view", _t("2024-01-01 10:00")),
            # user 3 clicked before AND after view -> the shortcut that
            # compares min-per-type times would drop them; sequential
            # semantics must count them through click
            (6, 3, "click", _t("2024-01-01 08:00")),
            (7, 3, "view", _t("2024-01-01 09:00")),
            (8, 3, "click", _t("2024-01-01 10:00")),
        ],
    )
    got = {r["step_name"]: r["n_users"] for r in funnel(
        ev, ["view", "click", "purchase"]).collect()}
    assert got == {"view": 3, "click": 2, "purchase": 1}


def test_funnel_equal_timestamps_count(spark):
    # at-or-after: same-instant next step counts
    ev = _ev(
        spark,
        [
            (1, 1, "view", _t("2024-01-01 10:00")),
            (2, 1, "click", _t("2024-01-01 10:00")),
        ],
    )
    got = {r["step_name"]: r["n_users"] for r in funnel(ev, ["view", "click"]).collect()}
    assert got == {"view": 1, "click": 1}


def test_retention_offsets(spark):
    d0, d7, d21 = "2024-01-01 00:00", "2024-01-08 00:00", "2024-01-22 00:00"
    ev = _ev(
        spark,
        [
            (1, 1, "view", _t(d0)),
            (2, 1, "view", _t(d7)),
            (3, 1, "view", _t(d21)),
            (4, 2, "view", _t(d7)),
        ],
    )
    rows = {
        (r["cohort_week"], r["week_offset"]): r["n_users"]
        for r in retention_cohorts(ev).collect()
    }
    # user1 cohort week W, offsets 0/1/3; user2 cohort W+1, offset 0
    offsets = sorted(k[1] for k in rows if rows[k] >= 1)
    assert offsets == [0, 0, 1, 3]


def test_transition_matrix_orders_ties_by_id(spark):
    ev = _ev(
        spark,
        [
            (1, 1, "a", _t("2024-01-01 10:00")),
            (2, 1, "b", _t("2024-01-01 10:00")),  # same ts: id breaks tie
            (3, 1, "c", _t("2024-01-01 11:00")),
        ],
    )
    got = {
        (r["prev_type"], r["next_type"]): r["n"]
        for r in transition_matrix(ev).collect()
    }
    assert got == {("a", "b"): 1, ("b", "c"): 1}


def test_last_touch_attribution_planted(spark):
    """Planted user journeys: latest in-window touch wins; ties break
    by event_id; out-of-window and touchless conversions unattributed."""
    from datetime import datetime, timedelta

    from parkour_spark.operators.behavior import last_touch_attribution

    t0 = datetime(2025, 1, 10, 12, 0, 0)
    rows = [
        # u1: view then click then purchase -> click (most recent)
        (1, t0, 1, "view"), (2, t0 + timedelta(hours=1), 1, "click"),
        (3, t0 + timedelta(hours=2), 1, "purchase"),
        # u2: touch 10 days before purchase -> outside 7-day window
        (4, t0, 2, "click"), (5, t0 + timedelta(days=10), 2, "purchase"),
        # u3: conversion with no touches at all
        (6, t0, 3, "purchase"),
        # u4: same-timestamp touches -> higher event_id wins (ts, id order)
        (7, t0, 4, "view"), (8, t0, 4, "click"),
        (9, t0 + timedelta(minutes=5), 4, "purchase"),
    ]
    ev = spark.createDataFrame(rows, ["event_id", "ts", "user_id", "event_type"])
    got = {
        r.user_id: r
        for r in last_touch_attribution(ev, attribution_window="7 DAYS").collect()
    }
    assert got[1].touch_type == "click"
    assert got[2].touch_type is None and got[2].touch_ts is None
    assert got[3].touch_type is None
    assert got[4].touch_type == "click"
    # one shuffle shape: no join in the plan
    plan = (
        last_touch_attribution(ev)._jdf.queryExecution().executedPlan().toString()
    )
    assert "Join" not in plan
