"""Streaming ingest onto a BUILT (or compacted) index root (r12, r11
verdict #6): ensure_batch_layout normalizes the build layout with pure
renames (batch=-1), so stream-into-existing composes — pinned here as
probe(build(A) then stream(B)) ≡ probe(build(A ∪ B)) per family."""

from pyspark.sql import functions as F

from parkour_spark import fs as pfs
from parkour_spark.operators.indexcommon import ensure_batch_layout


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def _corpus(spark, n=24, tag=""):
    return _docs(
        spark,
        [
            (
                i,
                f"shared overlapping body of document {i} {tag} "
                f"with plenty of common tokens to hash and shingle",
            )
            for i in range(n)
        ],
    )


def _stage_src(spark, tmp_path, df, name):
    src = str(tmp_path / name)
    df.coalesce(1).write.parquet(src)
    return src, spark.read.parquet(src).schema


def test_ensure_batch_layout_moves_and_is_idempotent(spark, tmp_path):
    t = str(tmp_path / "tbl")
    spark.createDataFrame(
        [(1, 0), (2, 1)], "id long, cell long"
    ).repartition("cell").write.partitionBy("cell").parquet(t)
    assert ensure_batch_layout(spark, t)  # moved cell=* under batch=-1
    assert pfs.exists(spark, t + "/batch=-1/cell=0")
    assert not ensure_batch_layout(spark, t)  # idempotent
    got = spark.read.parquet(t)
    assert sorted((r.id, r.cell, r.batch) for r in got.collect()) == [
        (1, 0, -1),
        (2, 1, -1),
    ]
    assert not ensure_batch_layout(spark, str(tmp_path / "absent"))


def test_text_build_then_stream_probe_identity(spark, tmp_path):
    from parkour_spark.operators.textindex import (
        text_index_build,
        text_index_probe_bm25,
    )
    from parkour_spark.streaming.windows import streaming_text_ingest

    base = _corpus(spark, 20)
    extra = _docs(
        spark, [(100 + i, f"streamed rare{i} shared body") for i in range(4)]
    )
    idx = str(tmp_path / "idx")
    ref = str(tmp_path / "ref")
    text_index_build(base, idx, n_buckets=4)
    src, schema = _stage_src(spark, tmp_path, extra, "src")
    streaming_text_ingest(spark, src, schema, idx, n_buckets=4)
    text_index_build(base.unionByName(extra), ref, n_buckets=4)
    terms = ["shared", "rare1", "common"]
    got = sorted(
        (r.doc_id, r.n_qterms, r.score_micro)
        for r in text_index_probe_bm25(spark, idx, terms, k=8).collect()
    )
    want = sorted(
        (r.doc_id, r.n_qterms, r.score_micro)
        for r in text_index_probe_bm25(spark, ref, terms, k=8).collect()
    )
    assert got == want


def test_minhash_build_then_stream_probe_identity(spark, tmp_path):
    from parkour_spark.operators.dedup import (
        minhash_index_build,
        minhash_probe_delta,
    )
    from parkour_spark.streaming.windows import streaming_minhash_ingest

    base = _corpus(spark, 20)
    extra = _corpus(spark, 4, tag="streamed").withColumn(
        "doc_id", F.col("doc_id") + 100
    )
    idx = str(tmp_path / "idx")
    ref = str(tmp_path / "ref")
    minhash_index_build(base, idx)
    src, schema = _stage_src(spark, tmp_path, extra, "src")
    streaming_minhash_ingest(spark, src, schema, idx)
    minhash_index_build(base.unionByName(extra), ref)
    dup_text = (
        "shared overlapping body of document 3  "
        "with plenty of common tokens to hash and shingle"
    )
    probe = _docs(spark, [(999, dup_text)])
    got = sorted(
        (r.id_new, r.id_old, r.sig_matches)
        for r in minhash_probe_delta(spark, probe, idx).collect()
    )
    want = sorted(
        (r.id_new, r.id_old, r.sig_matches)
        for r in minhash_probe_delta(spark, probe, ref).collect()
    )
    assert got == want
    assert got  # non-vacuous


def test_substring_build_then_stream_probe_identity(spark, tmp_path):
    from parkour_spark.operators.dedup import (
        substring_index_build,
        substring_probe_persisted,
    )
    from parkour_spark.streaming.windows import streaming_substring_ingest

    base = _corpus(spark, 20)
    extra = _corpus(spark, 4, tag="streamed").withColumn(
        "doc_id", F.col("doc_id") + 100
    )
    idx = str(tmp_path / "idx")
    ref = str(tmp_path / "ref")
    substring_index_build(base, idx)
    src, schema = _stage_src(spark, tmp_path, extra, "src")
    streaming_substring_ingest(spark, src, schema, idx)
    substring_index_build(base.unionByName(extra), ref)
    probe = _docs(
        spark,
        [(999, "shared overlapping body of document 3 streamed with")],
    )
    def rows(path):
        return sorted(
            tuple(r) for r in substring_probe_persisted(
                spark, probe, path
            ).collect()
        )

    got, want = rows(idx), rows(ref)
    assert got == want
    assert got


def test_ivf_build_then_stream_probe_identity(spark, tmp_path):
    import numpy as np

    from parkour_spark.operators.similarity import (
        ivf_index_build,
        ivf_probe_topk,
    )
    from parkour_spark.streaming.windows import streaming_ivf_ingest

    rng = np.random.default_rng(5)
    d, k = 8, 4
    cents = [(i, rng.normal(size=d).tolist()) for i in range(k)]
    base = spark.createDataFrame(
        [(i, rng.normal(size=d).tolist()) for i in range(30)],
        "vec_id long, embedding array<double>",
    )
    extra = spark.createDataFrame(
        [(100 + i, rng.normal(size=d).tolist()) for i in range(6)],
        "vec_id long, embedding array<double>",
    )
    idx = str(tmp_path / "idx")
    ref = str(tmp_path / "ref")
    ivf_index_build(base, cents, idx)
    src = str(tmp_path / "src")
    extra.coalesce(1).write.parquet(src)
    streaming_ivf_ingest(
        spark, src, spark.read.parquet(src).schema, idx, cents
    )
    ivf_index_build(base.unionByName(extra), cents, ref)
    queries = spark.createDataFrame(
        [(0, rng.normal(size=d).tolist())],
        "query_id long, query_vec array<double>",
    )

    def rows(path):
        return sorted(
            tuple(r)
            for r in ivf_probe_topk(
                spark, path, queries, cents, k=5, nprobe=2
            ).collect()
        )

    got, want = rows(idx), rows(ref)
    assert got == want
    assert got
