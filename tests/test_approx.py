"""Sketch-based approximate aggregations: estimates verified against
their exact oracle-checked twins within error bounds."""

from pyspark.sql import functions as F

from parkour_spark.queries import QUERIES

SF_DIR = "/root/testdata/sf0.001"


def test_approx_user_counts_within_rsd(spark):
    # the query now emits the exact distinct count plus a sketch_ok
    # bound flag (the sketch estimate itself can't hash-compare across
    # engines); assert the flag holds and the exact side matches the
    # exact twin query
    got = {
        r["event_type"]: (r["n_users"], r["sketch_ok"])
        for r in QUERIES["approx_user_counts"](spark, SF_DIR).collect()
    }
    exact = {
        r["event_type"]: r["n_users"]
        for r in QUERIES["events_user_counts"](spark, SF_DIR).collect()
    }
    assert set(got) == set(exact)
    for et, n in exact.items():
        assert got[et][0] == n
        assert got[et][1] is True, (et, got[et])


def test_approx_quantiles_ordered_and_bounded(spark):
    rows = QUERIES["approx_price_quantiles"](spark, SF_DIR).collect()
    assert rows
    for r in rows:
        q1, q2, q3 = r["p25"], r["p50"], r["p75"]
        assert q1 <= q2 <= q3
        assert q1 > 0
