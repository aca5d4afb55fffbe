"""From-scratch GIF89a codec (operators/gifcodec.py): LZW roundtrip,
lossless frame extraction, container-derived duration, error paths, and
the real frame-sampling integration."""

import hashlib

import numpy as np
import pytest

from parkour_spark.operators.gifcodec import (
    encode_gif,
    gif_duration_ms,
    gif_frame,
    gif_n_frames,
    lzw_decode,
    lzw_encode,
)

GRAY = np.stack([np.arange(256)] * 3, axis=1).astype(np.uint8)


def _frames(n=3, h=8, w=9, seed=5):
    return [
        ((np.arange(h * w) * (k + seed) + 7 * k) % 256)
        .astype(np.uint8)
        .reshape(h, w)
        for k in range(n)
    ]


def test_lzw_roundtrip_including_dict_reset():
    rng = np.random.default_rng(11)
    for n in (0, 1, 255, 256, 5000, 20000):
        data = bytes(rng.integers(0, 256, n, dtype=np.uint8))
        assert lzw_decode(lzw_encode(data)) == data, n
    # highly repetitive data exercises long dictionary chains + KwKwK
    rep = b"abcabcabc" * 3000
    assert lzw_decode(lzw_encode(rep)) == rep


def test_frames_roundtrip_lossless():
    frames = _frames(4)
    g = encode_gif(frames, GRAY, delay_cs=25)
    assert gif_n_frames(g) == 4
    assert gif_duration_ms(g) == 4 * 250
    for k, fr in enumerate(frames):
        rgb = gif_frame(g, k)
        assert rgb.shape == (8, 9, 3)
        # grayscale palette: every channel equals the index plane
        for c in range(3):
            assert (rgb[..., c] == fr).all()


def test_arbitrary_palette_maps_exactly():
    pal = ((np.arange(256)[:, None] * np.array([3, 5, 7])) % 256).astype(
        np.uint8
    )
    fr = (np.arange(72) % 256).astype(np.uint8).reshape(8, 9)
    rgb = gif_frame(encode_gif([fr], pal), 0)
    assert (rgb == pal[fr]).all()


def test_deterministic_golden():
    g1 = encode_gif(_frames(2), GRAY, delay_cs=10)
    g2 = encode_gif(_frames(2), GRAY, delay_cs=10)
    assert g1 == g2
    assert hashlib.md5(g1).hexdigest() == "19145df39bbe9daebc0d84058790d95d"


def test_error_paths():
    g = encode_gif(_frames(2), GRAY)
    with pytest.raises(ValueError, match="missing header"):
        gif_frame(b"not a gif", 0)
    with pytest.raises(ValueError, match="out of range"):
        gif_frame(g, 5)
    with pytest.raises(ValueError, match="at least one frame"):
        encode_gif([], GRAY)
    with pytest.raises(ValueError, match="canvas size"):
        encode_gif([_frames(1)[0], np.zeros((4, 4), np.uint8)], GRAY)
    with pytest.raises(Exception):
        gif_frame(g[: len(g) // 2], 1)  # truncated container


def test_decode_image_routes_gif_first_frame():
    from parkour_spark.operators.imagecodec import decode_image, sniff_format

    frames = _frames(3)
    g = encode_gif(frames, GRAY)
    assert sniff_format(g) == "gif"
    assert (decode_image(g)[..., 0] == frames[0]).all()


def test_sample_video_frames_with_real_codec(spark):
    """End-to-end: container-derived duration + real LZW extraction —
    frame count follows the BYTES (metadata says nothing here), and
    every extracted frame decodes to the exact encoded plane."""
    from parkour_spark.operators.gifcodec import gif_duration_ms as dur
    from parkour_spark.operators.imagecodec import decode_image
    from parkour_spark.operators.multimodal import (
        gif_frame_codec,
        sample_video_frames,
    )

    rows = []
    payloads = {}
    for mid, n in ((1, 2), (2, 4)):
        frames = _frames(n, seed=mid)
        payloads[mid] = frames
        rows.append((mid, encode_gif(frames, GRAY, delay_cs=100), None))
    df = spark.createDataFrame(
        rows, "media_id long, payload binary, meta map<string,long>"
    )
    out = sample_video_frames(
        df, every_ms=1000, codec=gif_frame_codec, duration_fn=dur
    ).collect()
    assert sorted((r.media_id, r.frame_idx) for r in out) == [
        (1, 0), (1, 1), (2, 0), (2, 1), (2, 2), (2, 3),
    ]
    for r in out:
        got = decode_image(bytes(r.frame))[..., 0]
        assert (got == payloads[r.media_id][r.frame_idx]).all()
    # an undecodable payload yields no frames instead of failing the scan
    bad = spark.createDataFrame(
        [(9, b"junk bytes", None)],
        "media_id long, payload binary, meta map<string,long>",
    )
    assert (
        sample_video_frames(
            bad, codec=gif_frame_codec, duration_fn=dur
        ).count()
        == 0
    )


def test_lzw_flush_at_width_boundary_roundtrips():
    """r10 regression (hypothesis-found): a stream whose dictionary
    crosses 2^width exactly at the final flush must emit EOI at the
    WIDENED width (giflib's after-every-code check) — the r9 encoder
    widened only after table adds, so the decoder (correctly already
    at the wider code size) read EOI past the end of the stream."""
    from parkour_spark.operators.gifcodec import lzw_decode, lzw_encode

    # the minimal falsifying example: 11 symbols, mcs=2 — ten novel
    # pairs put the table at exactly 16 entries when the flush emits
    data = bytes([0, 2, 1, 1, 0, 0, 3, 2, 0, 1, 2])
    assert lzw_decode(lzw_encode(data, 2), 2) == data
    # neighborhood sweep: every flush offset around the boundary, all
    # small code sizes
    for mcs in (2, 3, 4):
        lim = 1 << mcs
        for n in range(0, 64):
            seq = bytes((i * 7 + 3) % lim for i in range(n))
            assert lzw_decode(lzw_encode(seq, mcs), mcs) == seq, (mcs, n)
