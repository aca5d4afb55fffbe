"""Round-10: persisted IVF-PQ composite index (operators/pq.py). The
gate entries pin probe/append/delete against the full replay oracle at
sf0.01; these tests pin the mechanics on a small synthetic corpus:
probe ≡ inline ivfpq_topk, append ≡ build(A∪B), delete ≡ build(A∖B)
with physical removal and emptied-cell cleanup, compact identity, and
the two-quantizer guard."""

import os

import numpy as np
import pytest
from pyspark.sql import functions as F

from parkour_spark.operators.pq import (
    ivfpq_index_append,
    ivfpq_index_build,
    ivfpq_index_compact,
    ivfpq_index_delete,
    ivfpq_probe_topk,
    ivfpq_topk,
    kmeans_l2,
    pq_train,
    read_ivfpq_meta,
    residual_df,
)


def _emb(spark, ids, d=8, seed=5):
    rows = []
    for i in ids:
        rng = np.random.RandomState(seed + i)
        rows.append((i, [float(x) for x in rng.randn(d)]))
    return spark.createDataFrame(rows, "vec_id long, embedding array<double>")


def _rows(df):
    return sorted(
        (r.query_id, r.vec_id, r.rank, r.adc_d2) for r in df.collect()
    )


@pytest.fixture(scope="module")
def setup(spark):
    emb = _emb(spark, range(48))
    coarse = kmeans_l2(emb, k=4, iters=2)
    res = residual_df(emb, coarse).select(
        "vec_id", F.col("res").alias("embedding")
    )
    cbs = pq_train(res, m=4, ksub=4, iters=2)
    queries = [
        (int(r.vec_id), [float(x) for x in r.embedding])
        for r in emb.where(F.col("vec_id") < 3).collect()
    ]
    return emb, coarse, cbs, queries


def test_probe_equals_inline(spark, setup, tmp_path):
    emb, coarse, cbs, queries = setup
    idx = str(tmp_path / "idx")
    ivfpq_index_build(emb, coarse, cbs, idx)
    probe = ivfpq_probe_topk(spark, idx, queries, k=5, nprobe=2)
    inline = ivfpq_topk(emb, coarse, cbs, queries, k=5, nprobe=2)
    assert _rows(probe) == _rows(inline)
    s_coarse, s_cbs, id_col = read_ivfpq_meta(spark, idx)
    assert s_coarse == coarse and s_cbs == cbs and id_col == "vec_id"


def test_append_equals_combined_build(spark, setup, tmp_path):
    emb, coarse, cbs, queries = setup
    inc, full = str(tmp_path / "inc"), str(tmp_path / "full")
    ivfpq_index_build(emb.where(F.col("vec_id") % 3 != 0), coarse, cbs, inc)
    ivfpq_index_append(emb.where(F.col("vec_id") % 3 == 0), inc)
    ivfpq_index_build(emb, coarse, cbs, full)
    assert _rows(ivfpq_probe_topk(spark, inc, queries, k=5)) == _rows(
        ivfpq_probe_topk(spark, full, queries, k=5)
    )


def test_delete_equals_survivor_build(spark, setup, tmp_path):
    emb, coarse, cbs, queries = setup
    idx, surv = str(tmp_path / "idx"), str(tmp_path / "surv")
    dead = emb.where(F.col("vec_id") % 4 == 3)
    ivfpq_index_build(emb, coarse, cbs, idx)
    ivfpq_index_delete(dead, idx)
    ivfpq_index_build(emb.where(F.col("vec_id") % 4 != 3), coarse, cbs, surv)
    assert _rows(ivfpq_probe_topk(spark, idx, queries, k=5)) == _rows(
        ivfpq_probe_topk(spark, surv, queries, k=5)
    )
    stored = {r.vec_id for r in spark.read.parquet(idx).collect()}
    assert stored.isdisjoint({r.vec_id for r in dead.collect()})


def test_delete_removes_emptied_cell_dirs(spark, setup, tmp_path):
    emb, coarse, cbs, _q = setup
    idx = str(tmp_path / "idx")
    ivfpq_index_build(emb, coarse, cbs, idx)
    # retire EVERYTHING: every cell empties, every cell dir must go
    ivfpq_index_delete(emb.select("vec_id", "embedding"), idx)
    assert not any(d.startswith("cell=") for d in os.listdir(idx))


def test_compact_preserves_rows_and_probe(spark, setup, tmp_path):
    emb, coarse, cbs, queries = setup
    idx = str(tmp_path / "idx")
    ivfpq_index_build(emb.where(F.col("vec_id") % 3 != 0), coarse, cbs, idx)
    ivfpq_index_append(emb.where(F.col("vec_id") % 3 == 0), idx)
    before = _rows(ivfpq_probe_topk(spark, idx, queries, k=5))
    stored_before = sorted(
        (r.vec_id, tuple(r.codes), int(r.cell))
        for r in spark.read.parquet(idx).collect()
    )
    ivfpq_index_compact(spark, idx)
    cells = [d for d in os.listdir(idx) if d.startswith("cell=")]
    assert cells
    for c in cells:
        files = [
            f
            for f in os.listdir(os.path.join(idx, c))
            if f.endswith(".parquet")
        ]
        assert len(files) == 1, (c, files)
    stored_after = sorted(
        (r.vec_id, tuple(r.codes), int(r.cell))
        for r in spark.read.parquet(idx).collect()
    )
    assert stored_before == stored_after
    assert _rows(ivfpq_probe_topk(spark, idx, queries, k=5)) == before


def test_quantizer_guards_raise(spark, setup, tmp_path):
    emb, coarse, cbs, queries = setup
    idx = str(tmp_path / "idx")
    ivfpq_index_build(emb, coarse, cbs, idx)
    other_coarse = kmeans_l2(emb, k=4, iters=1)
    assert other_coarse != coarse
    with pytest.raises(ValueError, match="quantizer mismatch"):
        ivfpq_index_append(emb.limit(1), idx, coarse=other_coarse,
                           codebooks=cbs)
    other_cbs = pq_train(emb, m=4, ksub=4, iters=1)
    with pytest.raises(ValueError, match="codebook mismatch"):
        ivfpq_index_append(emb.limit(1), idx, coarse=coarse,
                           codebooks=other_cbs)
    with pytest.raises(ValueError, match="no IVF-PQ index meta"):
        ivfpq_probe_topk(spark, str(tmp_path / "nope"), queries)


def test_streaming_ingest_then_compact_equals_build(spark, setup, tmp_path):
    """2-batch exactly-once ingest of residual codes ≡ build (probe
    identity); the terminal compact folds the batch tree into the
    canonical cell= layout with the probe unchanged."""
    from parkour_spark.operators.pq import ivfpq_index_compact
    from parkour_spark.streaming.windows import streaming_ivfpq_ingest

    emb, coarse, cbs, queries = setup
    src = str(tmp_path / "src")
    emb.repartition(2).write.parquet(src)
    schema = spark.read.parquet(src).schema
    idx = str(tmp_path / "idx")
    streaming_ivfpq_ingest(spark, src, schema, idx, coarse, cbs)
    assert any(d.startswith("batch=") for d in os.listdir(idx))
    full = str(tmp_path / "full")
    ivfpq_index_build(emb, coarse, cbs, full)
    want = _rows(ivfpq_probe_topk(spark, full, queries, k=5))
    assert _rows(ivfpq_probe_topk(spark, idx, queries, k=5)) == want
    ivfpq_index_compact(spark, idx)
    assert not any(d.startswith("batch=") for d in os.listdir(idx))
    assert _rows(ivfpq_probe_topk(spark, idx, queries, k=5)) == want


def test_delete_everything_probes_empty(spark, setup, tmp_path):
    """The emptied-tree state for the composite index: probe returns
    empty with the right schema, delete/compact are no-op-safe, and
    append restores a fresh-build state."""
    emb, coarse, cbs, queries = setup
    idx = str(tmp_path / "idx")
    sub = emb.where(F.col("vec_id") >= 10)
    ivfpq_index_build(sub, coarse, cbs, idx)
    ivfpq_index_delete(sub.select("vec_id", "embedding"), idx)
    got = ivfpq_probe_topk(spark, idx, queries, k=5)
    assert got.collect() == []
    assert got.columns == ["query_id", "vec_id", "rank", "adc_d2"]
    ivfpq_index_delete(sub.limit(2).select("vec_id", "embedding"), idx)
    ivfpq_index_compact(spark, idx)
    refill = emb.where(F.col("vec_id") < 10)
    ivfpq_index_append(refill, idx)
    ref = str(tmp_path / "ref")
    ivfpq_index_build(refill, coarse, cbs, ref)
    assert _rows(ivfpq_probe_topk(spark, idx, queries, k=5)) == _rows(
        ivfpq_probe_topk(spark, ref, queries, k=5)
    )
