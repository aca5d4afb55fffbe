"""r11 ADVICE closures (r12): the meta-less-compact refusal for the
capped dedup indexes, and the auto-compact threshold that keeps
compliance deletes from retaining retired bytes indefinitely."""

import pytest
from pyspark.sql import functions as F

from parkour_spark import fs as pfs
from parkour_spark.operators.indexcommon import (
    pending_tombstone_count,
    read_tombstones,
)


def _docs(spark, n=30):
    rows = [
        (i, f"the quick brown doc {i} shares plenty of overlapping text")
        for i in range(n)
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_minhash_compact_refuses_metaless_pending_ledger(spark, tmp_path):
    """r11 ADVICE: reconciling a pending ledger with meta/ unreadable
    would clear the ledger while bands/ keeps the retired ids — the
    compact must refuse instead, leaving the ledger (and the probes'
    read repair) intact."""
    from parkour_spark.operators.dedup import (
        minhash_index_build,
        minhash_index_compact,
        minhash_index_delete,
    )

    idx = str(tmp_path / "mh")
    minhash_index_build(_docs(spark), idx)
    minhash_index_delete(
        spark, spark.createDataFrame([(3,)], "doc_id long"), idx
    )
    pfs.delete(spark, idx + "/meta")
    with pytest.raises(ValueError, match="pending tombstone ledger"):
        minhash_index_compact(spark, idx)
    assert read_tombstones(spark, idx) is not None  # ledger survived


def test_substring_compact_refuses_metaless_pending_ledger(spark, tmp_path):
    from parkour_spark.operators.dedup import (
        substring_index_build,
        substring_index_compact,
        substring_index_delete,
    )

    idx = str(tmp_path / "ss")
    substring_index_build(_docs(spark), idx)
    substring_index_delete(
        spark, spark.createDataFrame([(3,)], "doc_id long"), idx
    )
    pfs.delete(spark, idx + "/meta")
    with pytest.raises(ValueError, match="pending tombstone ledger"):
        substring_index_compact(spark, idx)
    assert read_tombstones(spark, idx) is not None


def test_metaless_compact_without_ledger_still_folds(spark, tmp_path):
    """No pending ledger → the meta-less compact stays a legal pure
    small-files fold (legacy-index tolerance unchanged)."""
    from parkour_spark.operators.dedup import (
        minhash_index_build,
        minhash_index_compact,
    )

    idx = str(tmp_path / "mh")
    minhash_index_build(_docs(spark), idx)
    pfs.delete(spark, idx + "/meta")
    minhash_index_compact(spark, idx)  # must not raise


def test_text_delete_auto_compact_threshold(spark, tmp_path):
    """auto_compact_threshold: once the pending ledger exceeds N ids,
    the delete runs the family compact inline — the retired bytes are
    physically gone and the ledger is clear (the compliance path)."""
    from parkour_spark.artifacts import ids_remaining
    from parkour_spark.operators.textindex import (
        text_index_build,
        text_index_delete,
    )

    idx = str(tmp_path / "tx")
    text_index_build(_docs(spark), idx, n_buckets=4)
    retire = spark.createDataFrame([(1,), (2,)], "doc_id long")
    text_index_delete(spark, retire, idx, auto_compact_threshold=5)
    assert pending_tombstone_count(spark, idx) == 2  # under: deferred
    more = spark.createDataFrame([(i,) for i in range(3, 8)], "doc_id long")
    text_index_delete(spark, more, idx, auto_compact_threshold=5)
    assert pending_tombstone_count(spark, idx) == 0  # over: reconciled
    assert ids_remaining(
        spark, idx + "/doclen", "doc_id", [1, 2, 3, 4, 5, 6, 7]
    ) == []


def test_minhash_delete_auto_compact_threshold(spark, tmp_path):
    from parkour_spark.artifacts import ids_remaining
    from parkour_spark.operators.dedup import (
        minhash_index_build,
        minhash_index_delete,
    )

    idx = str(tmp_path / "mh")
    minhash_index_build(_docs(spark), idx)
    retire = spark.createDataFrame([(i,) for i in range(4)], "doc_id long")
    minhash_index_delete(spark, retire, idx, auto_compact_threshold=2)
    assert pending_tombstone_count(spark, idx) == 0
    assert ids_remaining(spark, idx + "/sigs", "doc_id", [0, 1, 2, 3]) == []


def test_substring_delete_auto_compact_threshold(spark, tmp_path):
    from parkour_spark.artifacts import ids_remaining
    from parkour_spark.operators.dedup import (
        substring_index_build,
        substring_index_delete,
    )

    idx = str(tmp_path / "ss")
    substring_index_build(_docs(spark), idx)
    retire = spark.createDataFrame([(i,) for i in range(4)], "doc_id long")
    substring_index_delete(spark, retire, idx, auto_compact_threshold=2)
    assert pending_tombstone_count(spark, idx) == 0
    assert ids_remaining(spark, idx + "/occ", "doc_id", [0, 1, 2, 3]) == []
