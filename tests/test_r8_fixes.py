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


# ------------------------------------------------------------------
# SQL surface as a user affordance (r7 verdict #7)
# ------------------------------------------------------------------

def test_dataset_view_makes_user_data_sql_addressable(spark, tmp_path):
    from parkour_spark.dataset import Dataset

    df = spark.createDataFrame(
        [(1, "a"), (2, "b"), (3, "a")], "id long, grp string"
    )
    ds = Dataset(spark, str(tmp_path / "t")).write(df)
    name = ds.view("user_table")
    assert name == "user_table"
    got = spark.sql(
        "SELECT grp, count(*) AS n FROM user_table GROUP BY grp"
    ).collect()
    assert {(r.grp, r.n) for r in got} == {("a", 2), ("b", 1)}


def test_pipeline_sql_stage_with_keyword_views(spark):
    from parkour_spark.dataset import Dataset
    from parkour_spark.plans.pipeline import Pipeline

    facts = spark.createDataFrame(
        [(1, 10), (2, 20), (1, 5)], "k long, v long"
    )
    dim = Dataset.from_df(
        spark.createDataFrame([(1, "one"), (2, "two")], "k long, label string")
    )
    out = Pipeline.input(facts).sql(
        "SELECT d.label, sum(t.v) AS total "
        "FROM this t JOIN d ON t.k = d.k GROUP BY d.label",
        d=dim,
    )
    assert {(r.label, r.total) for r in out.df.collect()} == {
        ("one", 15),
        ("two", 20),
    }
    # the SQL stage composes with further fluent stages
    assert out.sort("label").collect()[0].label == "one"


def test_pipeline_sql_accepts_pipeline_and_dataframe_views(spark):
    from parkour_spark.plans.pipeline import Pipeline

    a = Pipeline.input(spark.createDataFrame([(1,)], "x long"))
    b = spark.createDataFrame([(1, "hit")], "x long, tag string")
    out = a.sql(
        "SELECT t.x, other.tag FROM this t JOIN other ON t.x = other.x",
        other=b,
    )
    rows = out.collect()
    assert len(rows) == 1 and rows[0].tag == "hit"


# ------------------------------------------------------------------
# Dedup-first codec fast path (r7 verdict #8)
# ------------------------------------------------------------------

def test_decode_distinct_equals_per_row_path(spark):
    """decode_distinct(df, codec) is row-for-row identical to
    codec(df) — including NULL payloads and undecodable bytes — while
    decoding each distinct payload exactly once."""
    from parkour_spark.operators.multimodal import (
        decode_distinct,
        perceptual_dhash,
    )

    ppm = b"P6 2 2 255\n" + bytes(range(12))
    rows = [
        (0, ppm), (1, ppm), (2, ppm),              # 3 copies, 1 decode
        (3, b"not an image"), (4, b"not an image"),  # undecodable dupes
        (5, None), (6, None),                       # null payloads
        (7, b"P6 2 2 255\n" + bytes(range(100, 112))),  # unique image
    ]
    df = spark.createDataFrame(rows, "media_id long, payload binary")

    per_row = {r.media_id: (r.dhash, r.decodable)
               for r in perceptual_dhash(df).collect()}
    deduped = {r.media_id: (r.dhash, r.decodable)
               for r in decode_distinct(df, perceptual_dhash).collect()}
    assert deduped == per_row and len(deduped) == 8

    # the decode really runs once per distinct payload: count Python
    # decode invocations through a counting wrapper
    calls = spark.sparkContext.accumulator(0)

    def counting_codec(d):
        import pandas as _pd

        def work(batches):
            for pdf in batches:
                for _ in pdf["payload"]:
                    calls.add(1)
                yield _pd.DataFrame(
                    {"media_id": pdf["media_id"],
                     "n_bytes": [len(p) if p is not None else -1
                                 for p in pdf["payload"]]}
                )

        return d.mapInPandas(work, "media_id long, n_bytes long")

    out = decode_distinct(df, counting_codec).collect()
    assert len(out) == 8
    assert calls.value == 4  # ppm, "not an image", None, unique image


def test_minhash_corrupt_meta_is_not_silently_skipped(spark, tmp_path):
    """A PRESENT-but-unreadable meta/ must raise, not silently disable
    the parameter guard (only a MISSING meta — a pre-guard index —
    skips)."""
    import pathlib

    from parkour_spark.operators.dedup import (
        minhash_index_append,
        minhash_index_build,
    )

    idx = tmp_path / "idx"
    minhash_index_build(_corpus(spark), str(idx))
    for f in (idx / "meta").iterdir():
        f.unlink()
    pathlib.Path(idx / "meta" / "part-corrupt.parquet").write_bytes(
        b"not parquet at all"
    )
    batch = spark.createDataFrame(
        [(100, "a fresh batch document that shares nothing")],
        ["doc_id", "text"],
    )
    with pytest.raises(Exception):
        minhash_index_append(batch, str(idx))
