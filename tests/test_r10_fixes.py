"""Round-10 robustness fixes (r9 ADVICE):

1. artifacts.publish_swap — a committed copy of the artifact exists at
   every point of the swap protocol; a failed rename never destroys
   both the old and the new copy.
2. streaming index ingest — the replayed-batch skip path re-runs the
   idempotent derived-table rewrite (bands/ for minhash, lists/ for
   substring), so a crash between the batch publish and the rewrite
   can't leave the derived table permanently lagging.
3. jpegcodec — 0xFF fill bytes before markers are accepted (T.81
   B.1.1.2), truncated/malformed payloads surface as ValueError at the
   decode boundary, and the foreign-restart-placement retry zeroes the
   aborted MCU's coefficients before re-decoding.
"""

import numpy as np
import pytest
from pyspark.sql import functions as F

from parkour_spark import artifacts as A
from parkour_spark import fs as pfs
from parkour_spark.operators.jpegcodec import decode_jpeg, encode_jpeg


def _write_rows(spark, rows):
    def fn(tmp):
        spark.createDataFrame(rows, "k long, v string").write.parquet(tmp)

    return fn


# ------------------------------------------------------------------
# 1. publish_swap failure safety
# ------------------------------------------------------------------


def test_publish_swap_failed_final_rename_restores_and_keeps_tmp(
    spark, tmp_path, monkeypatch
):
    """If the rename-new-in fails, the previous version must be
    restored in place AND the fully-written new copy left on disk for
    recovery — the old order (delete-old, rename, finally-delete-tmp)
    destroyed both copies here."""
    final = str(tmp_path / "art")
    A.publish_dir(spark, final, _write_rows(spark, [(1, "old")]))
    real_rename = pfs.rename

    def flaky(spark_, src, dst):
        if "__publish-" in src and dst == final:
            return False  # the new copy refuses to land
        return real_rename(spark_, src, dst)

    monkeypatch.setattr(pfs, "rename", flaky)
    with pytest.raises(IOError, match="recovery"):
        A.publish_swap(spark, final, _write_rows(spark, [(2, "new")]))
    monkeypatch.undo()

    got = spark.read.parquet(final).collect()
    assert [(r.k, r.v) for r in got] == [(1, "old")], "old version restored"
    tmps = [p for p in tmp_path.iterdir() if "__publish-" in p.name]
    assert len(tmps) == 1, "new contents left for recovery"
    got_new = spark.read.parquet(str(tmps[0])).collect()
    assert [(r.k, r.v) for r in got_new] == [(2, "new")]


def test_publish_swap_failed_aside_rename_leaves_artifact_unchanged(
    spark, tmp_path, monkeypatch
):
    """If even the rename-old-aside fails, the committed artifact is
    untouched and the temp is cleaned up (a committed copy exists, so
    there is nothing to recover)."""
    final = str(tmp_path / "art")
    A.publish_dir(spark, final, _write_rows(spark, [(1, "old")]))
    real_rename = pfs.rename

    def flaky(spark_, src, dst):
        if src == final:
            return False  # old copy refuses to move aside
        return real_rename(spark_, src, dst)

    monkeypatch.setattr(pfs, "rename", flaky)
    with pytest.raises(IOError, match="unchanged"):
        A.publish_swap(spark, final, _write_rows(spark, [(2, "new")]))
    monkeypatch.undo()

    got = spark.read.parquet(final).collect()
    assert [(r.k, r.v) for r in got] == [(1, "old")]
    assert [p.name for p in tmp_path.iterdir()] == ["art"], "no leaked dirs"


def test_publish_swap_success_leaves_single_clean_dir(spark, tmp_path):
    """Happy path end state is unchanged by the reordering: new
    contents under the final name, no aside/temp leftovers."""
    final = str(tmp_path / "art")
    A.publish_dir(spark, final, _write_rows(spark, [(1, "old")]))
    A.publish_swap(spark, final, _write_rows(spark, [(2, "new")]))
    got = spark.read.parquet(final).collect()
    assert [(r.k, r.v) for r in got] == [(2, "new")]
    assert [p.name for p in tmp_path.iterdir()] == ["art"]


# ------------------------------------------------------------------
# 2. streaming ingest replay catch-up
# ------------------------------------------------------------------


def _docs(spark, ids_texts):
    return spark.createDataFrame(ids_texts, "doc_id long, text string")


def test_minhash_ingest_replay_rebuilds_lagging_bands(spark, tmp_path):
    """Simulate a crash between the sigs publish and the band rewrite:
    sigs/batch=0 is committed (with _SUCCESS) but bands/ does not
    exist. The replayed batch must take the skip path AND re-derive
    bands/ from the stored signatures — previously it returned early
    and the batch's docs were invisible to probes forever."""
    from parkour_spark.operators.dedup import (
        minhash_probe_delta,
        minhash_signature,
    )
    from parkour_spark.streaming.windows import streaming_minhash_ingest

    committed = _docs(
        spark,
        [(i, "the quick brown fox jumps over the lazy dog " + "x" * i)
         for i in range(1, 5)],
    )
    idx = str(tmp_path / "idx")
    # pre-stage the committed batch dir exactly as the crashed run left it
    sig = minhash_signature(committed, "text", "doc_id", 12, 3)
    sig.select(
        "doc_id",
        F.array(*[F.col(f"sig_{i}") for i in range(12)]).alias("sigs"),
    ).write.parquet(idx + "/sigs/batch=0")
    assert not pfs.exists(spark, idx + "/bands")

    # the replay delivers DIFFERENT rows under the same batch id — the
    # committed dir must win (exactly-once), and bands must appear
    src = str(tmp_path / "src")
    _docs(spark, [(99, "replay payload that must be ignored")]).coalesce(
        1
    ).write.parquet(src)
    schema = spark.read.parquet(src).schema
    streaming_minhash_ingest(spark, src, schema, idx)

    stored_ids = {
        r.doc_id for r in spark.read.parquet(idx + "/sigs").collect()
    }
    assert stored_ids == {1, 2, 3, 4}, "replayed rows not double-appended"
    assert pfs.exists(spark, idx + "/bands"), "derived table caught up"
    # probes now see the committed batch's docs
    probe = minhash_probe_delta(
        spark,
        _docs(spark, [(100, "the quick brown fox jumps over the lazy dog x")]),
        idx,
        threshold=0.5,
    )
    assert probe.count() > 0


def test_substring_ingest_replay_rebuilds_lagging_lists(spark, tmp_path):
    """The substring analog: occ/batch=0 committed, lists/ missing —
    the skip path must re-derive lists/."""
    from parkour_spark.operators.dedup import _positioned_occurrences
    from parkour_spark.streaming.windows import streaming_substring_ingest

    committed = _docs(
        spark,
        [(i, "shared window fingerprint payload body " + str(i))
         for i in range(1, 4)],
    )
    idx = str(tmp_path / "idx")
    occ = _positioned_occurrences(committed, "text", "doc_id", 8, 8)
    occ.write.parquet(idx + "/occ/batch=0")
    assert not pfs.exists(spark, idx + "/lists")

    src = str(tmp_path / "src")
    _docs(spark, [(99, "replay payload that must be ignored")]).coalesce(
        1
    ).write.parquet(src)
    schema = spark.read.parquet(src).schema
    streaming_substring_ingest(spark, src, schema, idx)

    stored_ids = {
        r.doc_id for r in spark.read.parquet(idx + "/occ").collect()
    }
    assert stored_ids == {1, 2, 3}, "replayed rows not double-appended"
    assert pfs.exists(spark, idx + "/lists"), "derived table caught up"


# ------------------------------------------------------------------
# 3. jpegcodec hardening
# ------------------------------------------------------------------


def _gradient_rgb(h=32, w=32):
    x = np.linspace(0, 255, w)
    y = np.linspace(0, 255, h)
    base = ((x[None, :] + y[:, None]) / 2).astype(np.uint8)
    return np.stack([base, base // 2, 255 - base], axis=-1)


def test_fill_bytes_before_markers_accepted():
    """T.81 B.1.1.2 permits any number of 0xFF fill bytes before a
    marker code; some encoders emit them. Decode must skip them and
    produce identical pixels."""
    good = encode_jpeg(_gradient_rgb(), 90)
    base = decode_jpeg(good)
    for marker in (b"\xff\xdb", b"\xff\xc4", b"\xff\xc0", b"\xff\xda"):
        at = good.index(marker)
        padded = good[:at] + b"\xff\xff" + good[at:]
        assert (decode_jpeg(padded) == base).all(), marker


def test_truncated_payloads_raise_value_error():
    """Truncation anywhere — header, segment, scan — must surface as
    ValueError (the undecodable-row contract the multimodal operators'
    except-handlers rely on), never IndexError/struct.error."""
    good = encode_jpeg(_gradient_rgb(), 90)
    for cut in (3, 5, 20, len(good) // 2, len(good) - 4):
        with pytest.raises(ValueError):
            decode_jpeg(good[:cut])


def test_foreign_restart_placement_decodes_exactly():
    """A stream whose RSTn placement diverges from its DRI header (the
    foreign-encoder case that reaches the _RestartMarker retry):
    re-decoding the interrupted MCU must start from zeroed
    coefficients, so the result equals the correctly-headered decode
    bit-for-bit — stale ACs from the aborted parse must not survive."""
    rgb = _gradient_rgb(40, 40)
    enc = encode_jpeg(rgb, 90, restart_interval=2)
    base = decode_jpeg(enc)
    # patch the DRI interval (restarts now appear "unexpectedly" early)
    at = enc.index(b"\xff\xdd\x00\x04")
    for claimed in (5, 7, 0xFFF0):
        patched = (
            enc[: at + 4]
            + int(claimed).to_bytes(2, "big")
            + enc[at + 6 :]
        )
        assert (decode_jpeg(patched) == base).all(), claimed


def test_undeclared_table_references_raise_value_error():
    """r10 review: a scan referencing an undeclared Huffman table (or
    a component absent from SOF0) hits a dict lookup — must surface as
    ValueError for the undecodable-row handlers, not KeyError."""
    good = encode_jpeg(_gradient_rgb(16, 16), 90)
    # SOS component spec: [ns, (cs, dc<<4|ac) x ns, ...] — point the
    # first component at DC/AC table 3, which no DHT declared
    at = good.index(b"\xff\xda")
    cs_tab_at = at + 2 + 2 + 1 + 1  # marker, len, ns, cs
    patched = good[:cs_tab_at] + b"\x33" + good[cs_tab_at + 1:]
    with pytest.raises(ValueError):
        decode_jpeg(patched)
    # component id in SOS absent from SOF0
    cs_at = at + 2 + 2 + 1
    patched2 = good[:cs_at] + b"\x77" + good[cs_at + 1:]
    with pytest.raises(ValueError):
        decode_jpeg(patched2)
