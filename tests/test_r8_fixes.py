"""Round-8 ADVICE fixes: NULL-safe mutual information margins, minhash
index parameter guard, join pre-flight empty-match contract."""

import math
import shutil

import pytest
from pyspark.sql import functions as F


# ------------------------------------------------------------------
# mutual_information: NULL categories count as regular values
# ------------------------------------------------------------------

def test_mi_null_categories_count_as_values(spark):
    """r7 ADVICE: the margin equi-joins dropped NULL-keyed cells while
    n still counted their rows. With eqNullSafe margins, a NULL x
    category contributes its exact per-cell terms and n_cells agrees
    with the contingency table."""
    from parkour_spark.operators.validate import mutual_information

    counts = {(None, "c"): 20, (None, "d"): 10, ("a", "c"): 5, ("a", "d"): 15}
    rows = [(x, y) for (x, y), c in counts.items() for _ in range(c)]
    df = spark.createDataFrame(rows, "x string, y string")
    r = mutual_information(df, "x", "y").collect()[0]
    n = 50
    cx = {None: 30, "a": 20}
    cy = {"c": 25, "d": 25}
    want = sum(
        round((c / n) * math.log(c * n / (cx[x] * cy[y])) * 1e6)
        for (x, y), c in counts.items()
    )
    assert r["n"] == n
    assert r["n_cells"] == 4  # the NULL cells are IN the statistic
    assert r["mi_micro"] == want


def test_mi_all_null_column(spark):
    """Degenerate: a constant (all-NULL) column carries zero
    information — one cell per y value, MI = 0 exactly."""
    from parkour_spark.operators.validate import mutual_information

    rows = [(None, "c")] * 10 + [(None, "d")] * 10
    df = spark.createDataFrame(rows, "x string, y string")
    r = mutual_information(df, "x", "y").collect()[0]
    assert r["n"] == 20 and r["n_cells"] == 2 and r["mi_micro"] == 0


# ------------------------------------------------------------------
# minhash index: persisted build parameters gate append/probe
# ------------------------------------------------------------------

def _corpus(spark):
    return spark.createDataFrame(
        [
            (0, "the quick brown fox jumps over the lazy dog today"),
            (1, "an entirely different document about spark tungsten"),
        ],
        ["doc_id", "text"],
    )


def test_minhash_append_param_mismatch_raises(spark, tmp_path):
    from parkour_spark.operators.dedup import (
        minhash_index_append,
        minhash_index_build,
    )

    idx = str(tmp_path / "idx")
    minhash_index_build(_corpus(spark), idx)
    batch = spark.createDataFrame(
        [(100, "a fresh batch document that shares nothing")],
        ["doc_id", "text"],
    )
    with pytest.raises(ValueError, match="num_hashes"):
        minhash_index_append(batch, idx, num_hashes=16)
    with pytest.raises(ValueError, match="ngram_n"):
        minhash_index_append(batch, idx, ngram_n=4)
    with pytest.raises(ValueError, match="max_bucket"):
        minhash_index_append(batch, idx, max_bucket=50)
    # matching parameters still append fine
    minhash_index_append(batch, idx)


def test_minhash_probe_param_mismatch_raises_but_not_max_bucket(
    spark, tmp_path
):
    """Probe validates the hash family; max_bucket is a BUILD-side cap
    and intentionally unchecked at probe."""
    from parkour_spark.operators.dedup import (
        minhash_index_build,
        minhash_probe_delta,
    )

    idx = str(tmp_path / "idx")
    minhash_index_build(_corpus(spark), idx)
    batch = spark.createDataFrame(
        [(100, "the quick brown fox jumps over the lazy dog today")],
        ["doc_id", "text"],
    )
    with pytest.raises(ValueError, match="bands"):
        minhash_probe_delta(spark, batch, idx, bands=6).collect()
    got = minhash_probe_delta(spark, batch, idx).collect()
    assert any(r.id_new == 100 and r.id_old == 0 for r in got)


def test_minhash_legacy_index_without_meta_skips_check(spark, tmp_path):
    """An index persisted before meta/ existed carries no parameter
    record — append proceeds (documented legacy behavior) instead of
    refusing to touch the index."""
    from parkour_spark.operators.dedup import (
        minhash_index_append,
        minhash_index_build,
    )

    idx = tmp_path / "idx"
    minhash_index_build(_corpus(spark), str(idx))
    shutil.rmtree(idx / "meta")
    batch = spark.createDataFrame(
        [(100, "a fresh batch document that shares nothing")],
        ["doc_id", "text"],
    )
    minhash_index_append(batch, str(idx))
    n = spark.read.parquet(str(idx / "sigs")).count()
    assert n == 3
