"""Round-11 hardening (r10 ADVICE):

1. pq_probe_adc / pq_index_compact read codes/ via
   artifacts.read_parquet_or_none — a streaming-layout codes tree with
   zero committed batches (or an emptied partitioned tree) yields the
   probe-schema empty result / a compact no-op instead of a
   schema-inference AnalysisException.
2. The streaming-ingest replayed-batch catch-up rewrite runs ONCE per
   ingest run (driver-side latch), not once per replayed batch — a
   wiped/rebuilt checkpoint replaying N committed batches pays one
   derived-table rewrite, not N.
3. corpus.bm25_score_topk is the single shared scoring tail for the
   inline path and the persisted-index probe (probe ≡ inline is a
   gate-pinned identity; two verbatim copies could drift).
"""

import os

from pyspark.sql import functions as F

from parkour_spark import fs as pfs
from parkour_spark.artifacts import write_params


def _docs(spark, ids_texts):
    return spark.createDataFrame(ids_texts, "doc_id long, text string")


# ------------------------------------------------------------------
# 1. PQ empty-codes-tree tolerance
# ------------------------------------------------------------------


def _stage_empty_codes_index(spark, tmp_path):
    """meta/ committed, codes/ holding only a torn batch dir with no
    data files — the state of a streaming-fed PQ index whose every
    batch write crashed before publish (zero committed batches)."""
    idx = str(tmp_path / "pqidx")
    codebooks = [[(0, [0.0]), (1, [1.0])], [(0, [0.0]), (1, [2.0])]]
    from parkour_spark.operators.pq import _codebooks_record

    write_params(
        spark,
        idx + "/meta",
        {
            "m": 2,
            "ksub": 2,
            "dsub": 1,
            "id_col": "vec_id",
            "codebooks": _codebooks_record(codebooks),
        },
    )
    os.makedirs(idx + "/codes/batch=0")  # torn dir, no parquet inside
    return idx


def test_pq_probe_adc_empty_codes_tree_returns_empty(spark, tmp_path):
    from parkour_spark.operators.pq import pq_probe_adc

    idx = _stage_empty_codes_index(spark, tmp_path)
    out = pq_probe_adc(spark, idx, [(1, [0.5, 0.5])], k=3)
    assert out.columns == ["query_id", "vec_id", "rank", "adc_cos"]
    assert out.count() == 0


def test_pq_index_compact_empty_codes_tree_noops(spark, tmp_path):
    from parkour_spark.artifacts import read_params
    from parkour_spark.operators.pq import pq_index_compact

    idx = _stage_empty_codes_index(spark, tmp_path)
    pq_index_compact(spark, idx)  # must not raise
    assert read_params(spark, idx + "/meta") is not None, "meta survives"


# ------------------------------------------------------------------
# 2. once-per-run catch-up latch
# ------------------------------------------------------------------


def test_minhash_multi_batch_replay_rewrites_bands_once(
    spark, tmp_path, monkeypatch
):
    """TWO committed sigs batches, bands/ missing, a fresh checkpoint
    that replays both: the catch-up rewrite must run exactly once (the
    rewrite re-derives from ALL stored rows, so one run covers every
    replayed batch)."""
    from parkour_spark.operators import dedup as D
    from parkour_spark.operators.dedup import minhash_signature
    from parkour_spark.streaming.windows import streaming_minhash_ingest

    idx = str(tmp_path / "idx")
    for b, ids in ((0, [1, 2]), (1, [3, 4])):
        batch = _docs(
            spark,
            [(i, "the quick brown fox jumps over the lazy dog " + "x" * i)
             for i in ids],
        )
        sig = minhash_signature(batch, "text", "doc_id", 12, 3)
        sig.select(
            "doc_id",
            F.array(*[F.col(f"sig_{i}") for i in range(12)]).alias("sigs"),
        ).write.parquet(idx + f"/sigs/batch={b}")
    assert not pfs.exists(spark, idx + "/bands")

    calls = []
    real = D._write_band_index

    def counting(*a, **kw):
        calls.append(1)
        return real(*a, **kw)

    monkeypatch.setattr(D, "_write_band_index", counting)

    # source with two files + max_files=1 → two micro-batches, ids 0
    # and 1 — both hit the committed-dir skip path
    src = str(tmp_path / "src")
    _docs(spark, [(98, "replay one")]).coalesce(1).write.parquet(src)
    _docs(spark, [(99, "replay two")]).coalesce(1).write.mode(
        "append"
    ).parquet(src)
    schema = spark.read.parquet(src).schema
    streaming_minhash_ingest(spark, src, schema, idx)

    stored_ids = {
        r.doc_id for r in spark.read.parquet(idx + "/sigs").collect()
    }
    assert stored_ids == {1, 2, 3, 4}, "replays not double-appended"
    assert pfs.exists(spark, idx + "/bands"), "derived table caught up"
    assert len(calls) == 1, f"rewrite ran {len(calls)}x, want once per run"


# ------------------------------------------------------------------
# 3. shared BM25 scoring tail
# ------------------------------------------------------------------


def test_probe_and_inline_share_one_scoring_tail():
    """Mechanical pin: the persisted probe calls corpus.bm25_score_topk
    (no private copy of the scoring block survives in textindex)."""
    import inspect

    from parkour_spark.operators import textindex

    src = inspect.getsource(textindex.text_index_probe_bm25)
    assert "bm25_score_topk" in src
    assert "withColumn(\"df\"" not in src.replace("'", '"')
