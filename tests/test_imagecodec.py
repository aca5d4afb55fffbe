"""Pure-numpy image codec (operators/imagecodec.py): spec goldens (a
hand-assembled PNG the encoder didn't write), PNG filter coverage,
PPM/BMP decode from hand-built bytes, bilinear resize math, and the
multimodal integration (real images through resize_images /
decode_image_features on Spark; fakes only for undecodable bytes)."""

import struct
import zlib

import numpy as np
import pytest

from parkour_spark.operators import imagecodec as IC


def _grad(h, w, c=3):
    img = np.zeros((h, w, c), dtype=np.uint8)
    for i in range(c):
        img[:, :, i] = (np.arange(w)[None, :] * 7 + np.arange(h)[:, None] * 13 + i) % 256
    return img


def test_png_roundtrip_exact():
    img = _grad(13, 17)
    assert np.array_equal(IC.decode_png(IC.encode_png(img)), img)
    gray = _grad(9, 5, 1)
    assert np.array_equal(IC.decode_png(IC.encode_png(gray)), gray)
    rgba = _grad(6, 8, 4)
    assert np.array_equal(IC.decode_png(IC.encode_png(rgba)), rgba)


def test_png_decode_hand_assembled_golden():
    """A 2x2 RGB PNG assembled byte-by-byte (stored-block zlib, filter
    0) — the decoder must parse a file the encoder never produced."""
    pixels = bytes([255, 0, 0, 0, 255, 0, 0, 0, 255, 255, 255, 0])
    raw = b"\x00" + pixels[:6] + b"\x00" + pixels[6:]  # filter byte per row
    idat = zlib.compress(raw, 0)  # stored blocks — deterministic
    ihdr = struct.pack(">IIBBBBB", 2, 2, 8, 2, 0, 0, 0)

    def chunk(t, d):
        return struct.pack(">I", len(d)) + t + d + struct.pack(
            ">I", zlib.crc32(t + d) & 0xFFFFFFFF
        )

    png = IC.PNG_MAGIC + chunk(b"IHDR", ihdr) + chunk(b"IDAT", idat) + chunk(b"IEND", b"")
    img = IC.decode_png(png)
    assert img.shape == (2, 2, 3)
    assert img[0, 0].tolist() == [255, 0, 0]
    assert img[0, 1].tolist() == [0, 255, 0]
    assert img[1, 0].tolist() == [0, 0, 255]
    assert img[1, 1].tolist() == [255, 255, 0]


def test_png_all_filters_decode():
    """Sub/Up/Average/Paeth (1-4) rows must reconstruct exactly: build
    the filtered stream by applying each filter's forward transform to
    known pixel rows, then decode."""
    rows = [
        np.array([10, 20, 30, 40, 50, 60], dtype=np.uint8),   # filter 1
        np.array([15, 25, 35, 45, 55, 65], dtype=np.uint8),   # filter 2
        np.array([100, 110, 120, 130, 140, 150], dtype=np.uint8),  # 3
        np.array([5, 250, 90, 17, 200, 3], dtype=np.uint8),   # filter 4
    ]
    c = 3
    stream = b""
    prev = np.zeros(6, dtype=np.uint8)
    for f, line in zip((1, 2, 3, 4), rows):
        enc = np.zeros(6, dtype=np.uint8)
        for x in range(0, 6, c):
            left = line[x - c : x] if x else np.zeros(c, dtype=np.uint8)
            up = prev[x : x + c]
            ul = prev[x - c : x] if x else np.zeros(c, dtype=np.uint8)
            cur = line[x : x + c]
            if f == 1:
                enc[x : x + c] = cur - left
            elif f == 2:
                enc[x : x + c] = cur - up
            elif f == 3:
                enc[x : x + c] = cur - ((left.astype(np.uint16) + up) // 2).astype(np.uint8)
            else:
                enc[x : x + c] = cur - IC._paeth(left, up, ul)
        stream += bytes([f]) + enc.tobytes()
        prev = line

    def chunk(t, d):
        return struct.pack(">I", len(d)) + t + d + struct.pack(
            ">I", zlib.crc32(t + d) & 0xFFFFFFFF
        )

    ihdr = struct.pack(">IIBBBBB", 2, 4, 8, 2, 0, 0, 0)
    png = (
        IC.PNG_MAGIC
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(stream))
        + chunk(b"IEND", b"")
    )
    got = IC.decode_png(png)
    assert np.array_equal(got.reshape(4, 6), np.stack(rows))


def test_png_crc_corruption_detected():
    img = IC.encode_png(_grad(4, 4))
    bad = bytearray(img)
    bad[40] ^= 0xFF  # somewhere in IDAT
    with pytest.raises(ValueError, match="CRC"):
        IC.decode_png(bytes(bad))


def test_ppm_and_pgm_decode():
    img = _grad(3, 4)
    ppm = b"P6\n# a comment\n4 3\n255\n" + img.tobytes()
    assert np.array_equal(IC.decode_pnm(ppm), img)
    gray = _grad(2, 5, 1)
    pgm = b"P5 5 2 255\n" + gray.tobytes()
    assert np.array_equal(IC.decode_pnm(pgm), gray)


def test_bmp_decode_hand_built():
    """2x2 24-bit bottom-up BMP, rows padded to 4 bytes, BGR order."""
    px = {  # (row from TOP, col) -> RGB
        (0, 0): (255, 0, 0), (0, 1): (0, 255, 0),
        (1, 0): (0, 0, 255), (1, 1): (9, 8, 7),
    }
    rows = b""
    for y in (1, 0):  # bottom-up storage
        row = b""
        for x in (0, 1):
            r, g, b = px[(y, x)]
            row += bytes([b, g, r])
        rows += row + b"\x00\x00"  # pad 6 -> 8 bytes
    header = (
        b"BM" + struct.pack("<IHHI", 54 + len(rows), 0, 0, 54)
        + struct.pack("<IiiHHIIiiII", 40, 2, 2, 1, 24, 0, len(rows), 0, 0, 0, 0)
    )
    img = IC.decode_bmp(header + rows)
    for (y, x), rgb in px.items():
        assert tuple(img[y, x]) == rgb


def test_bilinear_resize_math():
    # identity resize is exact
    img = _grad(8, 6)
    assert np.array_equal(IC.resize_bilinear(img, 6, 8), img)
    # 2x upscale of a 2x1 gradient: midpoints interpolate linearly
    two = np.array([[[0], [100]]], dtype=np.uint8)  # 1 row, 2 cols
    up = IC.resize_bilinear(two, 4, 1)
    assert up[0, :, 0].tolist() == [0, 25, 75, 100]
    # constant image stays constant at any size
    const = np.full((5, 7, 3), 42, dtype=np.uint8)
    assert (IC.resize_bilinear(const, 13, 3) == 42).all()


def test_resize_payload_end_to_end():
    img = _grad(16, 16)
    out = IC.resize_payload(IC.encode_png(img), 8, 8)
    dec = IC.decode_png(out)
    assert dec.shape == (8, 8, 3)
    # downscale of a linear gradient stays a near-linear gradient
    assert abs(int(dec[0, 7, 0]) - int(img[0, 15, 0])) <= 8


def test_multimodal_real_codec_integration(spark):
    from parkour_spark.operators.multimodal import (
        decode_image_features,
        resize_images,
    )

    png = IC.encode_png(_grad(12, 10))
    rows = [
        (1, bytearray(png)),            # real PNG -> real resample
        (2, bytearray(b"not an image")),  # fake path
        (3, None),                       # null passthrough
    ]
    df = spark.createDataFrame(rows, "media_id long, payload binary")
    out = {r.media_id: r for r in resize_images(df, 6, 6).collect()}
    dec = IC.decode_png(bytes(out[1].payload))
    assert dec.shape == (6, 6, 3)
    assert out[3].payload is None
    assert out[2].payload is not None and bytes(out[2].payload)[:8] != IC.PNG_MAGIC
    feats = {r.media_id: r.features for r in decode_image_features(df).collect()}
    # real stats: first channel mean of the gradient is in (0, 1)
    assert feats[1] is not None and 0.0 < feats[1][0] < 1.0
    assert len(feats[1]) == 16 and len(feats[2]) == 16
    assert feats[3] is None
