"""Pure-Python/numpy image codec — upgrades the multimodal codec slot
from "deterministic stub" to a REAL decode → resize → encode path for
the uncompressed/zlib formats the standard library can carry:

- PNG decode (spec 1.2): zlib inflate + per-row unfilter (filters 0-4
  incl. Paeth), 8-bit gray / gray+alpha / RGB / RGBA, non-interlaced.
- PNG encode: filter-0 rows, zlib deflate, CRC-checked chunks.
- PPM/PGM (P6/P5 binary) and BMP (24-bit BI_RGB) decode.
- Bilinear resize, fully vectorized numpy (no per-pixel Python loop).

Baseline JPEG (sequential DCT + Huffman) lives in the sibling
jpegcodec module (r9, from the public T.81/JFIF specs) and is routed
through `decode_image` here; progressive JPEG / WEBP / video stay
honestly out of scope — `sniff_format` lets callers route those to a
library codec in production while these modules serve the formats they
genuinely implement. Everything is deterministic, so the
multimodal gate entries remain exactly reproducible.

SCALE: decode/resize runs inside Arrow-batched `mapInPandas`
(operators/multimodal.py) — embarrassingly parallel, no shuffle, blobs
never leave their task.
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

PNG_MAGIC = b"\x89PNG\r\n\x1a\n"

_CHANNELS = {0: 1, 2: 3, 4: 2, 6: 4}  # PNG color type -> samples/pixel


def sniff_format(payload: bytes) -> str | None:
    """'png' | 'jpeg' | 'gif' | 'ppm' | 'pgm' | 'bmp' | None."""
    if payload[:8] == PNG_MAGIC:
        return "png"
    if payload[:2] == b"\xff\xd8":
        return "jpeg"
    if payload[:6] in (b"GIF89a", b"GIF87a"):
        return "gif"
    if payload[:2] == b"P6":
        return "ppm"
    if payload[:2] == b"P5":
        return "pgm"
    if payload[:2] == b"BM":
        return "bmp"
    return None


# ---------------------------------------------------------------------------
# PNG
# ---------------------------------------------------------------------------


def _paeth(a, b, c):
    p = a.astype(np.int32) + b - c
    pa, pb, pc = np.abs(p - a), np.abs(p - b), np.abs(p - c)
    out = np.where((pa <= pb) & (pa <= pc), a, np.where(pb <= pc, b, c))
    return out.astype(np.uint8)


def decode_png(payload: bytes) -> np.ndarray:
    """PNG → uint8 array of shape (H, W, C). 8-bit, non-interlaced."""
    if payload[:8] != PNG_MAGIC:
        raise ValueError("not a PNG")
    pos, w = 8, None
    idat = bytearray()
    while pos < len(payload):
        (length,) = struct.unpack(">I", payload[pos : pos + 4])
        ctype = payload[pos + 4 : pos + 8]
        data = payload[pos + 8 : pos + 8 + length]
        expect = struct.unpack(">I", payload[pos + 8 + length : pos + 12 + length])[0]
        if zlib.crc32(ctype + data) & 0xFFFFFFFF != expect:
            raise ValueError(f"PNG chunk {ctype!r} CRC mismatch")
        if ctype == b"IHDR":
            w, h, bitdepth, color, _comp, _filt, interlace = struct.unpack(
                ">IIBBBBB", data
            )
            if bitdepth != 8:
                raise ValueError(f"only 8-bit PNGs supported (got {bitdepth})")
            if color not in _CHANNELS:
                raise ValueError(f"unsupported PNG color type {color}")
            if interlace:
                raise ValueError("interlaced PNGs not supported")
            c = _CHANNELS[color]
        elif ctype == b"IDAT":
            idat.extend(data)
        elif ctype == b"IEND":
            break
        pos += 12 + length
    if w is None:
        raise ValueError("PNG missing IHDR")
    raw = zlib.decompress(bytes(idat))
    stride = w * c
    if len(raw) != h * (stride + 1):
        raise ValueError("PNG pixel data size mismatch")
    raw = np.frombuffer(raw, dtype=np.uint8).reshape(h, stride + 1)
    filters, rows = raw[:, 0], raw[:, 1:]
    out = np.zeros((h, stride), dtype=np.uint8)
    zero = np.zeros(stride, dtype=np.uint8)
    for y in range(h):
        f, cur = filters[y], rows[y]
        prior = out[y - 1] if y else zero
        if f == 0:
            line = cur.copy()
        elif f == 2:  # Up
            line = cur + prior
        else:
            # filters 1/3/4 have an intra-row left dependency → per-row
            # sequential over PIXELS (vector ops across channels)
            line = np.zeros(stride, dtype=np.uint8)
            for x in range(0, stride, c):
                left = line[x - c : x] if x else zero[:c]
                up = prior[x : x + c]
                ul = prior[x - c : x] if x else zero[:c]
                cc = cur[x : x + c]
                if f == 1:  # Sub
                    line[x : x + c] = cc + left
                elif f == 3:  # Average
                    line[x : x + c] = cc + (
                        (left.astype(np.uint16) + up) // 2
                    ).astype(np.uint8)
                elif f == 4:  # Paeth
                    line[x : x + c] = cc + _paeth(left, up, ul)
                else:
                    raise ValueError(f"bad PNG filter {f}")
        out[y] = line
    return out.reshape(h, w, c)


def encode_png(img: np.ndarray) -> bytes:
    """uint8 (H, W) or (H, W, C) → PNG bytes (filter 0, zlib level 6)."""
    if img.ndim == 2:
        img = img[:, :, None]
    h, w, c = img.shape
    color = {1: 0, 2: 4, 3: 2, 4: 6}[c]
    ihdr = struct.pack(">IIBBBBB", w, h, 8, color, 0, 0, 0)
    rows = np.concatenate(
        [np.zeros((h, 1), dtype=np.uint8), img.reshape(h, w * c)], axis=1
    )
    idat = zlib.compress(rows.tobytes(), 6)

    def chunk(ctype: bytes, data: bytes) -> bytes:
        return (
            struct.pack(">I", len(data))
            + ctype
            + data
            + struct.pack(">I", zlib.crc32(ctype + data) & 0xFFFFFFFF)
        )

    return (
        PNG_MAGIC + chunk(b"IHDR", ihdr) + chunk(b"IDAT", idat) + chunk(b"IEND", b"")
    )


# ---------------------------------------------------------------------------
# PPM / PGM / BMP
# ---------------------------------------------------------------------------


def _pnm_header(payload: bytes):
    """Parse P5/P6 header (whitespace + comments), return (w, h, offset)."""
    toks, pos = [], 2
    while len(toks) < 3:
        while pos < len(payload) and payload[pos : pos + 1].isspace():
            pos += 1
        if payload[pos : pos + 1] == b"#":
            while payload[pos : pos + 1] not in (b"\n", b""):
                pos += 1
            continue
        start = pos
        while pos < len(payload) and not payload[pos : pos + 1].isspace():
            pos += 1
        toks.append(int(payload[start:pos]))
    w, h, maxval = toks
    if maxval != 255:
        raise ValueError("only 8-bit PNM supported")
    return w, h, pos + 1


def decode_pnm(payload: bytes) -> np.ndarray:
    kind = payload[:2]
    c = {b"P6": 3, b"P5": 1}.get(kind)
    if c is None:
        raise ValueError("not a binary PPM/PGM")
    w, h, off = _pnm_header(payload)
    return (
        np.frombuffer(payload, dtype=np.uint8, count=h * w * c, offset=off)
        .reshape(h, w, c)
        .copy()
    )


def decode_bmp(payload: bytes) -> np.ndarray:
    """24-bit uncompressed (BI_RGB) BMP → (H, W, 3) RGB."""
    if payload[:2] != b"BM":
        raise ValueError("not a BMP")
    (data_off,) = struct.unpack("<I", payload[10:14])
    w, h = struct.unpack("<ii", payload[18:26])
    bpp, comp = struct.unpack("<HI", payload[28:34])
    if bpp != 24 or comp != 0:
        raise ValueError("only 24-bit uncompressed BMP supported")
    flip = h > 0
    h = abs(h)
    stride = (w * 3 + 3) & ~3  # rows pad to 4 bytes
    rows = np.frombuffer(
        payload, dtype=np.uint8, count=h * stride, offset=data_off
    ).reshape(h, stride)
    img = rows[:, : w * 3].reshape(h, w, 3)[:, :, ::-1]  # BGR → RGB
    return (img[::-1] if flip else img).copy()


def decode_image(payload: bytes) -> np.ndarray:
    fmt = sniff_format(payload)
    if fmt == "png":
        return decode_png(payload)
    if fmt == "jpeg":
        from parkour_spark.operators.jpegcodec import decode_jpeg

        return decode_jpeg(payload)
    if fmt == "gif":
        # first frame — the still-image view of an animated container
        from parkour_spark.operators.gifcodec import gif_frame

        return gif_frame(payload, 0)
    if fmt in ("ppm", "pgm"):
        return decode_pnm(payload)
    if fmt == "bmp":
        return decode_bmp(payload)
    raise ValueError("unsupported image format")


# ---------------------------------------------------------------------------
# Resize
# ---------------------------------------------------------------------------


def resize_bilinear(img: np.ndarray, width: int, height: int) -> np.ndarray:
    """Vectorized bilinear resample to (height, width, C) — pixel-center
    alignment (the OpenCV/PIL default), exact at identity."""
    h, w = img.shape[:2]
    if img.ndim == 2:
        img = img[:, :, None]
    ys = (np.arange(height) + 0.5) * h / height - 0.5
    xs = (np.arange(width) + 0.5) * w / width - 0.5
    y0 = np.clip(np.floor(ys).astype(np.int64), 0, h - 1)
    x0 = np.clip(np.floor(xs).astype(np.int64), 0, w - 1)
    y1, x1 = np.minimum(y0 + 1, h - 1), np.minimum(x0 + 1, w - 1)
    wy = np.clip(ys - y0, 0.0, 1.0)[:, None, None]
    wx = np.clip(xs - x0, 0.0, 1.0)[None, :, None]
    f = img.astype(np.float64)
    top = f[y0][:, x0] * (1 - wx) + f[y0][:, x1] * wx
    bot = f[y1][:, x0] * (1 - wx) + f[y1][:, x1] * wx
    out = top * (1 - wy) + bot * wy
    return np.clip(np.rint(out), 0, 255).astype(np.uint8)


def resize_payload(payload: bytes, width: int, height: int) -> bytes:
    """decode → bilinear resize → PNG encode (the codec signature
    resize_images expects). Raises ValueError on unsupported formats —
    callers decide whether to fall back."""
    return encode_png(resize_bilinear(decode_image(payload), width, height))


def image_stats(payload: bytes, bins: int = 8) -> list[float]:
    """Real feature vector: per-channel mean/std (0-1) + a `bins`-bucket
    gray histogram (density) — the classic cheap image descriptor."""
    img = decode_image(payload).astype(np.float64)
    c = img.shape[2]
    means = [float(img[:, :, i].mean() / 255.0) for i in range(c)]
    stds = [float(img[:, :, i].std() / 255.0) for i in range(c)]
    while len(means) < 4:
        means.append(0.0)
        stds.append(0.0)
    gray = img.mean(axis=2)
    hist, _ = np.histogram(gray, bins=bins, range=(0, 255.0))
    dens = (hist / max(1, gray.size)).tolist()
    return means + stds + [float(x) for x in dens]


def grayscale_int(img: np.ndarray) -> np.ndarray:
    """Integer ITU-R 601 luma: (299·R + 587·G + 114·B) // 1000 — exact
    integer arithmetic so a SQL oracle can replicate every gray value
    bit-for-bit (a float dot product could differ in the last ulp)."""
    if img.ndim == 2:
        return img.astype(np.int64)
    if img.shape[2] == 1:
        return img[:, :, 0].astype(np.int64)
    r = img[:, :, 0].astype(np.int64)
    g = img[:, :, 1].astype(np.int64)
    b = img[:, :, 2].astype(np.int64)
    return (299 * r + 587 * g + 114 * b) // 1000


def dhash64(payload: bytes) -> int:
    """64-bit difference hash (dHash, the standard cheap perceptual
    image fingerprint): decode → bilinear 9×8 (identity-exact when the
    source is already 9×8) → integer grayscale → bit(r, c) =
    gray(r, c+1) > gray(r, c), packed row-major MSB-first into a
    SIGNED 64-bit int (Spark LongType). Near-duplicate images differ
    in a few gradient signs — Hamming distance on this hash is the
    image analog of SimHash on text."""
    img = decode_image(payload)
    if img.shape[:2] != (8, 9):
        img = resize_bilinear(img, 9, 8)
    gray = grayscale_int(img)
    bits = (gray[:, 1:] > gray[:, :-1]).reshape(-1)
    val = 0
    for b in bits:
        val = (val << 1) | int(b)
    return val - (1 << 64) if val >= (1 << 63) else val
