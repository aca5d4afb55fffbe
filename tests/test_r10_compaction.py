"""Round-10: IVF index compaction (similarity.ivf_index_compact — r9
verdict #3) and the streaming-tree canonicalization it performs. The
gated entries pin probe-after-compact ≡ probe at sf0.01; these tests
pin the layout mechanics: exact row preservation, quantizer carry,
batch-tree folding, and lifecycle composition on the compacted root."""

import os

import numpy as np
import pytest
from pyspark.sql import functions as F

from parkour_spark.operators.similarity import (
    ivf_index_append,
    ivf_index_build,
    ivf_index_compact,
    ivf_index_delete,
    ivf_probe_topk,
)


def _emb(spark, ids, d=6, seed=3):
    rng = np.random.RandomState(seed)
    rows = []
    for i in ids:
        rng2 = np.random.RandomState(seed + i)
        rows.append((i, [float(x) for x in rng2.randn(d)]))
    return spark.createDataFrame(rows, "vec_id long, embedding array<double>")


def _cents(d=6):
    rng = np.random.RandomState(11)
    return [(c, [float(x) for x in rng.randn(d)]) for c in range(3)]


def _stored(spark, path):
    return sorted(
        (r.vec_id, int(r.cell), round(float(r.cnorm), 12))
        for r in spark.read.parquet(path).collect()
    )


def _probe(spark, path, queries_df, cents):
    df = ivf_probe_topk(spark, path, queries_df, cents, k=5, nprobe=2)
    return sorted(
        (r.query_id, r.vec_id, r.rank, r.cos) for r in df.collect()
    )


@pytest.fixture()
def queries_df(spark):
    return _emb(spark, range(3)).select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("query_vec"),
    )


def test_compact_after_append_preserves_rows_and_probe(
    spark, tmp_path, queries_df
):
    cents = _cents()
    idx = str(tmp_path / "idx")
    ivf_index_build(_emb(spark, range(3, 30)), cents, idx)
    ivf_index_append(_emb(spark, range(30, 45)), cents, idx)
    before_rows = _stored(spark, idx)
    before_probe = _probe(spark, idx, queries_df, cents)
    ivf_index_compact(spark, idx)
    assert _stored(spark, idx) == before_rows
    assert _probe(spark, idx, queries_df, cents) == before_probe
    # canonical layout: one co-located file set per cell, meta carried
    cells = [d for d in os.listdir(idx) if d.startswith("cell=")]
    assert cells
    for c in cells:
        files = [
            f for f in os.listdir(os.path.join(idx, c))
            if f.endswith(".parquet")
        ]
        assert len(files) == 1, (c, files)
    # the quantizer guard still validates (record carried across swap)
    ivf_index_append(_emb(spark, range(45, 48)), cents, idx)


def test_compact_folds_streaming_batch_tree(spark, tmp_path, queries_df):
    """A streaming-ingested root (batch=<id>/cell=<c> subtrees) folds
    into the canonical cell= layout with identical rows, and the full
    batch lifecycle (append, delete, probe) composes on the result."""
    from parkour_spark.streaming.windows import streaming_ivf_ingest

    cents = _cents()
    src = str(tmp_path / "src")
    corpus = _emb(spark, range(3, 40))
    corpus.repartition(3).write.parquet(src)
    schema = spark.read.parquet(src).schema
    idx = str(tmp_path / "idx")
    streaming_ivf_ingest(spark, src, schema, idx, cents)
    assert any(d.startswith("batch=") for d in os.listdir(idx))

    before_rows = _stored(spark, idx)
    before_probe = _probe(spark, idx, queries_df, cents)
    ivf_index_compact(spark, idx)
    assert not any(d.startswith("batch=") for d in os.listdir(idx))
    assert _stored(spark, idx) == before_rows
    assert _probe(spark, idx, queries_df, cents) == before_probe

    # post-compact the root is indistinguishable from a built index:
    # append new rows, delete some, and match a fresh survivor build
    ivf_index_append(_emb(spark, range(40, 50)), cents, idx)
    dead = _emb(spark, range(3, 40)).where(F.col("vec_id") % 5 == 0)
    ivf_index_delete(dead, cents, idx)
    ref = str(tmp_path / "ref")
    survivors = list(range(3, 40)) + list(range(40, 50))
    survivors = [i for i in survivors if not (3 <= i < 40 and i % 5 == 0)]
    ivf_index_build(_emb(spark, survivors), cents, ref)
    assert _stored(spark, idx) == _stored(spark, ref)
    assert _probe(spark, idx, queries_df, cents) == _probe(
        spark, ref, queries_df, cents
    )


def test_compact_without_meta_raises(spark, tmp_path):
    bare = str(tmp_path / "bare")
    _emb(spark, range(5)).write.parquet(bare)
    with pytest.raises(ValueError, match="no _ivf_meta"):
        ivf_index_compact(spark, bare)


def test_ivf_delete_everything_probes_empty(spark, tmp_path, queries_df):
    """Retiring EVERY vector leaves a tree with only _ivf_meta — the
    probe must return an empty result with the probe schema (not a
    schema-inference crash), delete/compact must be no-op-safe, and an
    append brings the index back to a fresh-build state (r10,
    generalized from the hypothesis-found text-index case)."""
    cents = _cents()
    idx = str(tmp_path / "idx")
    corpus = _emb(spark, range(3, 20))
    ivf_index_build(corpus, cents, idx)
    ivf_index_delete(corpus, cents, idx)
    got = ivf_probe_topk(spark, idx, queries_df, cents, k=5, nprobe=2)
    assert got.collect() == []
    assert got.columns == ["query_id", "vec_id", "cos", "rank"]
    # idempotent on the emptied tree
    ivf_index_delete(corpus.limit(2), cents, idx)
    ivf_index_compact(spark, idx)
    # refill via append == fresh build
    refill = _emb(spark, range(30, 40))
    ivf_index_append(refill, cents, idx)
    ref = str(tmp_path / "ref")
    ivf_index_build(refill, cents, ref)
    assert _probe(spark, idx, queries_df, cents) == _probe(
        spark, ref, queries_df, cents
    )
