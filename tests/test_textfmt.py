"""True-byte-offset text source + exact n-lines-per-split (sources/
textfmt.py) — closes the two text-source deltas vs the reference
(io/text.clj byte offsets, io/nline.clj NLineInputFormat semantics)."""

from __future__ import annotations

import pytest

from parkour_spark.sources.textfmt import (
    _read_range,
    nline_dseq,
    register_text_source,
    text_offsets_dseq,
)


def _ground_truth(raw: bytes) -> list[tuple[int, str]]:
    out, off = [], 0
    for line in raw.splitlines(keepends=True):
        out.append((off, line.rstrip(b"\r\n").decode()))
        off += len(line)
    return out


@pytest.fixture()
def textfile(tmp_path):
    raw = b"".join(
        f"line {i} {'x' * (i % 17)}\n".encode() for i in range(200)
    ) + b"no trailing newline"
    p = tmp_path / "data.txt"
    p.write_bytes(raw)
    return str(p), raw


def test_byte_offsets_exact(spark, textfile):
    path, raw = textfile
    got = sorted(
        (r["offset"], r["value"]) for r in text_offsets_dseq(spark, path).collect()
    )
    assert got == _ground_truth(raw)


def test_byte_offsets_split_boundaries(spark, textfile):
    # tiny split_size forces many mid-line split boundaries; every line
    # must still appear exactly once with its true offset
    path, raw = textfile
    got = sorted(
        (r["offset"], r["value"])
        for r in text_offsets_dseq(spark, path, split_size=64).collect()
    )
    assert got == _ground_truth(raw)


def test_read_range_unit_boundaries(textfile):
    # per-split reader honors the TextInputFormat ownership contract at
    # EVERY possible boundary: concatenating all splits = the file
    path, raw = textfile
    truth = _ground_truth(raw)
    for cut in range(0, len(raw) + 7, 7):
        a = list(_read_range(path, 0, min(cut, len(raw))))
        b = list(_read_range(path, min(cut, len(raw)), len(raw)))
        assert a + b == truth, f"boundary {cut}"


def test_nline_exact_split_sizes(spark, textfile):
    path, raw = textfile
    df = nline_dseq(spark, path, 32)
    got = sorted((r["offset"], r["value"]) for r in df.collect())
    assert got == _ground_truth(raw)
    # 201 lines → splits of exactly 32 lines + one remainder of 9
    sizes = sorted(
        df.rdd.mapPartitions(lambda it: [sum(1 for _ in it)]).collect(),
        reverse=True,
    )
    sizes = [s for s in sizes if s > 0]
    assert sizes == [32, 32, 32, 32, 32, 32, 9]


def test_register_idempotent(spark):
    assert register_text_source(spark)
    assert register_text_source(spark)
