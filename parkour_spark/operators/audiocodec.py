"""Pure-Python/numpy audio codec — the audio analog of imagecodec.py:
REAL decode / feature-extract / resample for RIFF WAV PCM (8/16-bit,
any channel count), which needs nothing beyond struct + numpy.
Compressed audio (MP3/AAC/OPUS) stays honestly out of scope — entropy
decoders don't ship here; `sniff_wav` lets callers route those to a
library codec in production.

Features are the classic cheap descriptors a corpus pipeline filters
on: duration, RMS loudness, peak, zero-crossing rate, and an 8-band
log-spaced spectral energy profile (numpy rFFT) — enough for
silence/clipping/bandwidth screens before any expensive model runs.

SCALE: decode runs inside Arrow-batched `mapInPandas`
(operators/multimodal.py) — embarrassingly parallel, no shuffle.
"""

from __future__ import annotations

import struct

import numpy as np


def sniff_wav(payload: bytes) -> bool:
    return payload[:4] == b"RIFF" and payload[8:12] == b"WAVE"


def decode_wav(payload: bytes) -> tuple[np.ndarray, int]:
    """WAV → (float64 samples in [-1, 1] of shape (n, channels), rate).
    PCM 8-bit unsigned / 16-bit signed little-endian."""
    if not sniff_wav(payload):
        raise ValueError("not a RIFF/WAVE file")
    pos, fmt, data = 12, None, None
    while pos + 8 <= len(payload):
        cid = payload[pos : pos + 4]
        (size,) = struct.unpack("<I", payload[pos + 4 : pos + 8])
        body = payload[pos + 8 : pos + 8 + size]
        if cid == b"fmt ":
            audio_fmt, channels, rate, _br, _ba, bits = struct.unpack(
                "<HHIIHH", body[:16]
            )
            if audio_fmt != 1:
                raise ValueError(f"only PCM WAV supported (fmt={audio_fmt})")
            if bits not in (8, 16):
                raise ValueError(f"only 8/16-bit PCM supported (bits={bits})")
            fmt = (channels, rate, bits)
        elif cid == b"data":
            data = body
        pos += 8 + size + (size & 1)  # chunks pad to even
    if fmt is None or data is None:
        raise ValueError("WAV missing fmt/data chunk")
    channels, rate, bits = fmt
    if bits == 16:
        x = np.frombuffer(data, dtype="<i2").astype(np.float64) / 32768.0
    else:
        x = (np.frombuffer(data, dtype=np.uint8).astype(np.float64) - 128.0) / 128.0
    n = len(x) // channels
    return x[: n * channels].reshape(n, channels), rate


def encode_wav(samples: np.ndarray, rate: int) -> bytes:
    """(n, channels) floats in [-1, 1] → 16-bit PCM WAV bytes."""
    if samples.ndim == 1:
        samples = samples[:, None]
    n, channels = samples.shape
    pcm = np.clip(np.rint(samples * 32767.0), -32768, 32767).astype("<i2").tobytes()
    fmt = struct.pack("<HHIIHH", 1, channels, rate, rate * channels * 2, channels * 2, 16)
    body = (
        b"WAVE"
        + b"fmt " + struct.pack("<I", len(fmt)) + fmt
        + b"data" + struct.pack("<I", len(pcm)) + pcm
    )
    return b"RIFF" + struct.pack("<I", len(body)) + body


def resample_linear(samples: np.ndarray, rate: int, new_rate: int) -> np.ndarray:
    """Linear-interpolation resample (sample-center alignment) — the
    cheap, deterministic choice for rate normalization; exact at
    identity."""
    if rate == new_rate:
        return samples.copy()
    if samples.ndim == 1:
        samples = samples[:, None]
    n = samples.shape[0]
    m = max(1, int(round(n * new_rate / rate)))
    pos = np.arange(m) * (n - 1) / max(1, m - 1) if m > 1 else np.zeros(1)
    i0 = np.floor(pos).astype(np.int64)
    i1 = np.minimum(i0 + 1, n - 1)
    frac = (pos - i0)[:, None]
    return samples[i0] * (1 - frac) + samples[i1] * frac


def audio_stats(payload: bytes, bands: int = 8) -> list[float]:
    """[duration_s, rms, peak, zero_crossing_rate, band_0..band_{b-1}]
    — mono-mixed; spectral bands are log-spaced rFFT energy densities
    normalized to sum 1 (silence-safe)."""
    samples, rate = decode_wav(payload)
    mono = samples.mean(axis=1)
    n = len(mono)
    dur = n / rate
    rms = float(np.sqrt((mono**2).mean())) if n else 0.0
    peak = float(np.abs(mono).max()) if n else 0.0
    zcr = float((np.signbit(mono[1:]) != np.signbit(mono[:-1])).mean()) if n > 1 else 0.0
    if n == 0:  # valid WAV, empty data chunk: rfft raises on length 0
        return [dur, rms, peak, zcr] + [0.0] * bands
    spec = np.abs(np.fft.rfft(mono)) ** 2
    edges = np.unique(
        np.geomspace(1, max(2, len(spec) - 1), bands + 1).astype(np.int64)
    )
    banded = np.zeros(bands)
    for i in range(min(bands, len(edges) - 1)):
        banded[i] = spec[edges[i] : edges[i + 1]].sum()
    total = banded.sum()
    if total > 0:
        banded = banded / total
    return [dur, rms, peak, zcr] + [float(b) for b in banded]


def energy_fingerprint64(payload: bytes, frames: int = 65) -> int:
    """64-bit audio fingerprint from frame-energy deltas (the
    time-domain analog of the image dHash — FFT-free on purpose, so
    the whole path stays integer-exact and a SQL oracle can replicate
    it): channel-0 PCM samples recover their EXACT integer values
    (decode_wav's /32768 and /128 are power-of-two divisions, so
    s = rint(x·32768) is lossless for both 8- and 16-bit sources),
    the first ⌊n/frames⌋·frames samples split into `frames` equal
    windows, E_f = Σ s² per window (int64 — |s| ≤ 2¹⁵ bounds a frame
    at 2³⁰·len), and bit f = E_{f+1} > E_f, packed MSB-first into a
    signed 64-bit int. Two clips with the same loudness CONTOUR match
    within a few Hamming bits regardless of absolute gain steps that
    preserve ordering."""
    if not (2 <= frames <= 65):
        raise ValueError(
            f"energy_fingerprint64: frames must be in [2, 65] (the hash "
            f"packs frames-1 <= 64 bits), got {frames}"
        )
    x, _rate = decode_wav(payload)
    s = np.rint(x[:, 0] * 32768.0).astype(np.int64)
    per = len(s) // frames
    if per == 0:
        raise ValueError(f"need ≥{frames} samples, got {len(s)}")
    e = (s[: per * frames] ** 2).reshape(frames, per).sum(axis=1)
    bits = e[1:] > e[:-1]
    val = 0
    for b in bits:
        val = (val << 1) | int(b)
    return val - (1 << 64) if val >= (1 << 63) else val
