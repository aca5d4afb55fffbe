"""From-scratch GIF89a codec (pure Python + numpy, public spec only) —
the ANIMATED container that upgrades `sample_video_frames` from a
deterministic fake to a REAL frame-extraction path: GIF is the one
multi-frame format whose codec (LZW + palette) fits honestly in this
environment, and it is LOSSLESS, so frame extraction is bit-exact and
the gate oracle can recompute every decoded pixel arithmetically (the
same property that made the PNG/PPM dHash entries hash-verifiable,
now for the frame-sampling UDTF shape).

Scope (raises outside it, the jpegcodec discipline):
- Encoder: GIF89a, one GLOBAL 256-color table, full-size frames
  (replace disposal), per-frame Graphic Control Extension carrying the
  delay, standard variable-width LZW (9→12 bits, CLEAR/EOI, dict reset
  at 4096), 255-byte sub-block packing.
- Decoder: header/LSD parse, global color table, GCE delays (summed to
  a real duration), image descriptors, LZW decode incl. the KwKwK
  case; local color tables, interlace, transparency, and partial-frame
  placement raise — full-frame replace is what the encoder emits and
  the overwhelmingly common screencast/thumbnail case.

SCALE: like the other codecs this runs inside Arrow-batched
`mapInPandas` — embarrassingly parallel, frames for one media id are
emitted incrementally by the row-expanding transform, blobs never
shuffle.
"""

from __future__ import annotations

import struct

import numpy as np

GIF_MAGIC = b"GIF89a"


# --------------------------------------------------------------------------
# LZW (GIF variant: little-endian bit packing, variable 9..12-bit codes)
# --------------------------------------------------------------------------


def lzw_encode(indices: bytes, min_code_size: int = 8) -> bytes:
    clear = 1 << min_code_size
    eoi = clear + 1
    out = bytearray()
    acc = 0
    nbits = 0

    def emit(code: int, width: int) -> None:
        nonlocal acc, nbits
        acc |= code << nbits
        nbits += width
        while nbits >= 8:
            out.append(acc & 0xFF)
            acc >>= 8
            nbits -= 8

    width = min_code_size + 1
    table: dict[bytes, int] = {bytes([i]): i for i in range(clear)}
    next_code = eoi + 1

    def emit_code(code: int) -> None:
        # GIF width discipline (giflib's EGifCompressOutput): after
        # WRITING any code, widen if the next code to assign no longer
        # fits. Checking only after table adds (the r9 bug, found by
        # the hypothesis roundtrip property) desyncs the codes emitted
        # WITHOUT an intervening add — the final flush and EOI — from
        # the decoder, whose table reaches 2^width one append earlier:
        # a stream whose dictionary crossed the boundary right at the
        # flush emitted EOI one bit narrower than the decoder reads it.
        # Data-code emissions are bit-identical under both rules; only
        # those boundary flush/EOI codes (previously undecodable by
        # our own decoder and giflib alike) change.
        nonlocal width
        emit(code, width)
        if next_code >= (1 << width) and width < 12:
            width += 1

    emit_code(clear)
    w = b""
    for ch in indices:
        wk = w + bytes([ch])
        if wk in table:
            w = wk
            continue
        emit_code(table[w])
        table[wk] = next_code
        next_code += 1
        if next_code == (1 << 12) + 1:
            # 12-bit code space exhausted: clear and restart (the just-
            # assigned overflow entry is discarded unemitted)
            emit_code(clear)
            table = {bytes([i]): i for i in range(clear)}
            next_code = eoi + 1
            width = min_code_size + 1
        w = bytes([ch])
    if w:
        emit_code(table[w])
    emit_code(eoi)
    if nbits:
        out.append(acc & 0xFF)
    return bytes(out)


def lzw_decode(data: bytes, min_code_size: int = 8) -> bytes:
    clear = 1 << min_code_size
    eoi = clear + 1
    pos = 0
    acc = 0
    nbits = 0

    def read(width: int) -> int:
        nonlocal pos, acc, nbits
        while nbits < width:
            if pos >= len(data):
                raise ValueError("gif: truncated LZW stream")
            acc |= data[pos] << nbits
            pos += 1
            nbits += 8
        code = acc & ((1 << width) - 1)
        acc >>= width
        nbits -= width
        return code

    width = min_code_size + 1
    table: list[bytes] = [bytes([i]) for i in range(clear)] + [b"", b""]
    out = bytearray()
    prev: bytes | None = None
    while True:
        code = read(width)
        if code == clear:
            table = [bytes([i]) for i in range(clear)] + [b"", b""]
            width = min_code_size + 1
            prev = None
            continue
        if code == eoi:
            break
        if code < len(table):
            entry = table[code]
        elif code == len(table) and prev is not None:
            entry = prev + prev[:1]  # the KwKwK case
        else:
            raise ValueError(f"gif: invalid LZW code {code}")
        out += entry
        if prev is not None:
            table.append(prev + entry[:1])
            if len(table) == (1 << width) and width < 12:
                width += 1
        prev = entry
    return bytes(out)


# --------------------------------------------------------------------------
# Container
# --------------------------------------------------------------------------


def _sub_blocks(data: bytes) -> bytes:
    out = bytearray()
    for i in range(0, len(data), 255):
        chunk = data[i:i + 255]
        out.append(len(chunk))
        out += chunk
    out.append(0)
    return bytes(out)


def encode_gif(
    frames: list[np.ndarray],
    palette: np.ndarray,
    delay_cs: int = 10,
) -> bytes:
    """frames: list of (H, W) uint8 INDEX arrays into `palette`
    ((256, 3) uint8). Same dims for every frame; per-frame delay in
    centiseconds. Deterministic: same inputs → same bytes."""
    if not frames:
        raise ValueError("gif: need at least one frame")
    h, w = frames[0].shape
    pal = np.asarray(palette, dtype=np.uint8)
    if pal.shape != (256, 3):
        raise ValueError("gif: palette must be (256, 3)")
    out = bytearray(GIF_MAGIC)
    out += struct.pack("<HH", w, h)
    out += bytes([0xF7, 0x00, 0x00])  # global table, 256 entries
    out += pal.tobytes()
    # NETSCAPE loop extension (loop forever) — the standard animation marker
    out += b"\x21\xff\x0bNETSCAPE2.0\x03\x01\x00\x00\x00"
    for fr in frames:
        if fr.shape != (h, w):
            raise ValueError("gif: all frames must share the canvas size")
        out += b"\x21\xf9\x04\x00" + struct.pack("<H", delay_cs) + b"\x00\x00"
        out += b"\x2c" + struct.pack("<HHHH", 0, 0, w, h) + b"\x00"
        out += bytes([8])  # LZW min code size
        out += _sub_blocks(lzw_encode(fr.astype(np.uint8).tobytes(), 8))
    out += b"\x3b"
    return bytes(out)


def _parse(payload: bytes):
    """→ (width, height, palette (256,3), [(delay_cs, index_array)])."""
    if payload[:6] not in (GIF_MAGIC, b"GIF87a"):
        raise ValueError("not a GIF (missing header)")
    w, h = struct.unpack("<HH", payload[6:10])
    packed = payload[10]
    pos = 13
    if not packed & 0x80:
        raise ValueError("gif: global color table required")
    gct_size = 2 << (packed & 0x07)
    pal = np.frombuffer(
        payload, dtype=np.uint8, count=gct_size * 3, offset=pos
    ).reshape(gct_size, 3)
    if gct_size < 256:
        pal = np.vstack([pal, np.zeros((256 - gct_size, 3), np.uint8)])
    pos += gct_size * 3
    frames = []
    delay = 0
    while True:
        b = payload[pos]
        pos += 1
        if b == 0x3B:  # trailer
            break
        if b == 0x21:  # extension
            label = payload[pos]
            pos += 1
            if label == 0xF9:  # GCE
                size = payload[pos]
                gce = payload[pos + 1:pos + 1 + size]
                if gce[0] & 0x01:
                    raise ValueError("gif: transparency unsupported")
                disposal = (gce[0] >> 2) & 0x07
                if disposal not in (0, 1):
                    raise ValueError(
                        "gif: only replace disposal supported"
                    )
                (delay,) = struct.unpack("<H", gce[1:3])
                pos += 1 + size
                pos += 1  # block terminator
            else:  # skip any other extension's sub-blocks
                while payload[pos] != 0:
                    pos += payload[pos] + 1
                pos += 1
        elif b == 0x2C:  # image descriptor
            left, top, iw, ih = struct.unpack("<HHHH", payload[pos:pos + 8])
            ipacked = payload[pos + 8]
            pos += 9
            if ipacked & 0x80:
                raise ValueError("gif: local color tables unsupported")
            if ipacked & 0x40:
                raise ValueError("gif: interlace unsupported")
            if (left, top, iw, ih) != (0, 0, w, h):
                raise ValueError(
                    "gif: partial-frame placement unsupported "
                    "(full-frame replace only)"
                )
            mcs = payload[pos]
            pos += 1
            data = bytearray()
            while payload[pos] != 0:
                n = payload[pos]
                data += payload[pos + 1:pos + 1 + n]
                pos += 1 + n
            pos += 1
            idx = np.frombuffer(
                lzw_decode(bytes(data), mcs), dtype=np.uint8, count=w * h
            ).reshape(h, w)
            frames.append((delay, idx))
            delay = 0
        else:
            raise ValueError(f"gif: unexpected block 0x{b:02x}")
    if not frames:
        raise ValueError("gif: no frames")
    return w, h, pal, frames


def gif_n_frames(payload: bytes) -> int:
    return len(_parse(payload)[3])


def gif_duration_ms(payload: bytes) -> int:
    """Real container duration: Σ per-frame GCE delays (centiseconds →
    ms) — the value `sample_video_frames` derives its frame count from,
    now read from the bytes instead of trusted metadata."""
    return sum(d for d, _ in _parse(payload)[3]) * 10


def gif_frame(payload: bytes, frame_idx: int) -> np.ndarray:
    """Extract frame `frame_idx` as an (H, W, 3) uint8 RGB array —
    LOSSLESS (palette indices decode bit-exactly), so downstream
    hashes/statistics are pure functions of the encoder's inputs."""
    w, h, pal, frames = _parse(payload)
    if not 0 <= frame_idx < len(frames):
        raise ValueError(
            f"gif: frame {frame_idx} out of range (n={len(frames)})"
        )
    return pal[frames[frame_idx][1]]
