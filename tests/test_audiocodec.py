"""WAV PCM codec (operators/audiocodec.py): hand-built-byte decode
golden, 8/16-bit + multichannel, round-trip, resample math, feature
sanity on synthesized tones, and the Spark integration."""

import struct

import numpy as np
import pytest

from parkour_spark.operators import audiocodec as AC


def _tone(freq, rate=8000, secs=0.5):
    t = np.arange(int(rate * secs)) / rate
    return np.sin(2 * np.pi * freq * t)


def test_decode_hand_built_wav():
    """4-sample mono 16-bit WAV assembled byte-by-byte."""
    pcm = struct.pack("<4h", 0, 16384, -16384, 32767)
    fmt = struct.pack("<HHIIHH", 1, 1, 8000, 16000, 2, 16)
    body = (b"WAVE" + b"fmt " + struct.pack("<I", 16) + fmt
            + b"data" + struct.pack("<I", len(pcm)) + pcm)
    wav = b"RIFF" + struct.pack("<I", len(body)) + body
    samples, rate = AC.decode_wav(wav)
    assert rate == 8000 and samples.shape == (4, 1)
    assert np.allclose(samples[:, 0], [0, 0.5, -0.5, 32767 / 32768], atol=1e-4)


def test_roundtrip_16bit_stereo():
    x = np.stack([_tone(440), _tone(220)], axis=1)
    back, rate = AC.decode_wav(AC.encode_wav(x, 8000))
    assert rate == 8000 and back.shape == x.shape
    assert np.abs(back - x).max() < 1.5 / 32768


def test_8bit_decode():
    raw = bytes([128, 255, 0, 128])
    fmt = struct.pack("<HHIIHH", 1, 1, 8000, 8000, 1, 8)
    body = (b"WAVE" + b"fmt " + struct.pack("<I", 16) + fmt
            + b"data" + struct.pack("<I", 4) + raw)
    wav = b"RIFF" + struct.pack("<I", len(body)) + body
    samples, _ = AC.decode_wav(wav)
    assert np.allclose(samples[:, 0], [0.0, 127 / 128, -1.0, 0.0])


def test_resample_linear_math():
    x = np.array([0.0, 1.0])[:, None]
    up = AC.resample_linear(x, 1000, 4000)
    assert up.shape[0] == 8
    assert np.allclose(up[:, 0], np.linspace(0, 1, 8))
    same = AC.resample_linear(x, 1000, 1000)
    assert np.array_equal(same, x)


def test_features_tone_vs_silence():
    loud = AC.audio_stats(AC.encode_wav(_tone(440) * 0.9, 8000))
    quiet = AC.audio_stats(AC.encode_wav(np.zeros(4000), 8000))
    assert abs(loud[0] - 0.5) < 1e-3        # duration
    assert loud[1] > 0.5 and quiet[1] == 0  # rms
    assert loud[2] > 0.85 and quiet[2] == 0  # peak
    assert loud[3] > 0.05                    # zcr of a 440 Hz tone
    # a high tone concentrates energy in higher bands than a low tone
    low = AC.audio_stats(AC.encode_wav(_tone(50), 8000))
    high = AC.audio_stats(AC.encode_wav(_tone(3000), 8000))
    lo_centroid = sum(i * b for i, b in enumerate(low[4:]))
    hi_centroid = sum(i * b for i, b in enumerate(high[4:]))
    assert hi_centroid > lo_centroid + 1


def test_non_pcm_rejected():
    fmt = struct.pack("<HHIIHH", 3, 1, 8000, 32000, 4, 32)  # IEEE float
    body = (b"WAVE" + b"fmt " + struct.pack("<I", 16) + fmt
            + b"data" + struct.pack("<I", 0))
    wav = b"RIFF" + struct.pack("<I", len(body)) + body
    with pytest.raises(ValueError, match="PCM"):
        AC.decode_wav(wav)


def test_multimodal_audio_integration(spark):
    from parkour_spark.operators.multimodal import decode_audio_features

    wav = AC.encode_wav(_tone(440) * 0.8, 8000)
    rows = [(1, bytearray(wav)), (2, bytearray(b"RIFFjunk")), (3, None)]
    df = spark.createDataFrame(rows, "media_id long, payload binary")
    got = {r.media_id: r.features for r in decode_audio_features(df).collect()}
    assert got[3] is None
    assert len(got[1]) == 12 and abs(got[1][0] - 0.5) < 1e-3 and got[1][1] > 0.5
    assert len(got[2]) == 12  # fake path, still total
