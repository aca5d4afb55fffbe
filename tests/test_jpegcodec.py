"""From-scratch baseline JPEG codec (operators/jpegcodec.py, T.81
sequential DCT/Huffman): roundtrip accuracy, determinism goldens,
restart markers, error paths, and integration with decode_image."""

import hashlib

import numpy as np
import pytest

from parkour_spark.operators.jpegcodec import (
    _build_codes,
    _build_decode_table,
    _extend,
    _magnitude,
    decode_jpeg,
    encode_jpeg,
)


def _gradient_rgb(h=48, w=48):
    x = np.linspace(0, 255, w)
    y = np.linspace(0, 255, h)
    base = ((x[None, :] + y[:, None]) / 2).astype(np.uint8)
    return np.stack([base, base // 2, 255 - base], axis=-1)


def test_roundtrip_smooth_image_close():
    rgb = _gradient_rgb()
    for q, tol in ((75, 3.0), (90, 2.5), (95, 2.0)):
        dec = decode_jpeg(encode_jpeg(rgb, q))
        assert dec.shape == rgb.shape
        mae = np.abs(dec.astype(int) - rgb.astype(int)).mean()
        assert mae <= tol, (q, mae)


def test_flat_image_exact():
    flat = np.full((16, 16, 3), 77, np.uint8)
    assert (decode_jpeg(encode_jpeg(flat, 90)) == flat).all()


def test_grayscale_and_odd_dimensions():
    x = np.linspace(0, 255, 41)
    g = ((x[None, :] + np.linspace(0, 255, 45)[:, None]) / 2).astype(np.uint8)
    dec = decode_jpeg(encode_jpeg(g, 90))
    assert dec.shape == (45, 41, 1)
    assert np.abs(dec[..., 0].astype(int) - g.astype(int)).mean() <= 2.5
    # (H, W, 1) input treated as grayscale
    dec2 = decode_jpeg(encode_jpeg(g[..., None], 90))
    assert (dec2 == dec).all()


def test_encode_decode_deterministic_golden():
    """Same array + quality → byte-identical encode and array-identical
    decode — pinned by md5 goldens so a platform/numpy drift shows up
    loudly (the gate oracles rely on codec determinism)."""
    rgb = _gradient_rgb(32, 32)
    e1, e2 = encode_jpeg(rgb, 90), encode_jpeg(rgb, 90)
    assert e1 == e2
    assert hashlib.md5(e1).hexdigest() == "bc10c4e546000bfb8dab8b8f1ea2bb06"
    d = decode_jpeg(e1)
    assert (
        hashlib.md5(d.tobytes()).hexdigest()
        == "39e273e28718ab536055bc4c26d2d739"
    )


def test_restart_markers_decode_identically():
    rgb = _gradient_rgb(40, 40)
    plain = decode_jpeg(encode_jpeg(rgb, 90))
    for ri in (1, 2, 5, 7):
        with_rst = decode_jpeg(encode_jpeg(rgb, 90, restart_interval=ri))
        assert (plain == with_rst).all(), ri


def test_magnitude_extend_inverse():
    for v in list(range(-300, 301)) + [-2047, 2047]:
        size, bits = _magnitude(v)
        assert _extend(bits, size) == v


def test_huffman_tables_are_mutually_inverse():
    from parkour_spark.operators.jpegcodec import AC_LUM_BITS, AC_LUM_VALS

    enc = _build_codes(AC_LUM_BITS, AC_LUM_VALS)
    dec = _build_decode_table(AC_LUM_BITS, AC_LUM_VALS)
    assert len(enc) == sum(AC_LUM_BITS)
    for sym, (code, length) in enc.items():
        assert dec[(length, code)] == sym
    # prefix-free: no code is a prefix of a longer one
    codes = sorted(
        (length, code) for code, length in enc.values()
    )
    as_bits = {format(c, f"0{n}b") for n, c in codes}
    for b in as_bits:
        for other in as_bits:
            assert b == other or not other.startswith(b) or len(b) == len(other)


def test_unsupported_and_corrupt_inputs_raise():
    rgb = _gradient_rgb(16, 16)
    good = encode_jpeg(rgb, 90)
    with pytest.raises(ValueError, match="SOI"):
        decode_jpeg(b"not a jpeg at all")
    # flip SOF0 to SOF2 (progressive) — must refuse, not garble
    sof_at = good.index(b"\xff\xc0")
    prog = good[:sof_at + 1] + b"\xc2" + good[sof_at + 2:]
    with pytest.raises(ValueError, match="non-baseline"):
        decode_jpeg(prog)
    # truncation inside the scan
    with pytest.raises(Exception):
        decode_jpeg(good[: len(good) // 2])


def test_decode_image_routes_jpeg():
    from parkour_spark.operators.imagecodec import (
        decode_image,
        dhash64,
        sniff_format,
    )

    rgb = _gradient_rgb(24, 24)
    j = encode_jpeg(rgb, 90)
    assert sniff_format(j) == "jpeg"
    out = decode_image(j)
    assert out.shape == (24, 24, 3)
    assert isinstance(dhash64(j), int)


def test_jpeg_payloads_flow_through_decode_distinct(spark):
    """The dedup-first path is codec-agnostic: JPEG payloads dedup by
    md5 and decode once per distinct blob, row-for-row identical to the
    per-row path."""
    from parkour_spark.operators.multimodal import (
        decode_distinct,
        perceptual_dhash,
    )

    rgb_a = encode_jpeg(_gradient_rgb(16, 16), 90)
    rgb_b = encode_jpeg(255 - _gradient_rgb(16, 16), 90)
    rows = [(i, rgb_a if i % 2 else rgb_b) for i in range(10)]
    df = spark.createDataFrame(rows, "media_id long, payload binary")
    per_row = sorted(map(tuple, perceptual_dhash(df).collect()))
    deduped = sorted(
        map(tuple, decode_distinct(df, perceptual_dhash).collect())
    )
    assert per_row == deduped
    assert len({h for _, h, _ in per_row}) == 2


def test_jpeg_corpus_patterns_distinct_and_within_bound():
    """All 120 corpus patterns (queries._jpeg_pattern) are byte-distinct
    after encoding (decode_distinct economics rely on exactly 120
    distinct payloads) and reconstruct within the gate entry's MAE
    bound — deterministic, so this can never flake."""
    from parkour_spark.queries import _JPEG_PATTERNS, _jpeg_pattern

    payloads = set()
    worst = 0.0
    for seed in range(_JPEG_PATTERNS):
        orig = _jpeg_pattern(seed)
        enc = encode_jpeg(orig, 85)
        payloads.add(enc)
        dec = decode_jpeg(enc)
        worst = max(
            worst, float(np.abs(dec.astype(int) - orig.astype(int)).mean())
        )
    assert len(payloads) == _JPEG_PATTERNS
    assert worst <= 8.0
    # the soak's 48x48 thumbnail variant stays byte-distinct too
    big = {encode_jpeg(_jpeg_pattern(s, 48), 85) for s in range(_JPEG_PATTERNS)}
    assert len(big) == _JPEG_PATTERNS
