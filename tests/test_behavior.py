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
