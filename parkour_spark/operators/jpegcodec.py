"""From-scratch baseline JPEG codec (ITU-T T.81 sequential DCT, Huffman)
in pure Python + numpy — the REAL expensive codec the dedup-first decode
path's economics need (r8 verdict #5): PNG/PPM decode is nearly free, so
`decode_distinct`'s decode-each-distinct-blob-once win only showed up in
accumulator counts; JPEG entropy decoding + IDCT is genuinely costly per
payload, so paying it per DISTINCT blob instead of per row is a direct
wall-clock multiplier (measured in scripts/soak_sf1.py).

Implements, from the public spec only (T.81 Annex F/K + JFIF 1.02):
- Encoder: JFIF headers, Annex-K quantization tables scaled by the
  libjpeg quality formula, level shift, 8×8 forward DCT (orthonormal
  matrix form, vectorized over all blocks), zigzag, DC-difference +
  AC run-length Huffman with the Annex-K typical tables, byte stuffing.
  4:4:4 sampling (one block per component per MCU) for 3-channel RGB
  input; single-component for grayscale.
- Decoder: marker parse (APPn/COM skipped, DQT/DHT/SOF0/SOS/DRI), the
  inverse entropy decode (bit reader with 0xFF00 unstuffing and RSTn
  restart handling), dequantize, inverse zigzag, vectorized IDCT,
  +128 level shift, clamp, YCbCr→RGB (JFIF/BT.601 fixed-point-free
  float math, rounded once at the end — deterministic).

Progressive, arithmetic coding, 12-bit, and subsampled chroma stay out
of scope (SOF2/SOFn other than SOF0 raise) — sequential baseline is the
overwhelmingly common web case and the only profile every decoder must
support. Everything is deterministic: same bytes in, same array out, on
every platform (pure integer + float64 numpy, no SIMD-variant paths).

SCALE: like the PNG path, this runs inside Arrow-batched `mapInPandas`
(operators/multimodal.py) — embarrassingly parallel, no shuffle, blobs
never leave their task.
"""

from __future__ import annotations

import struct

import numpy as np

# --------------------------------------------------------------------------
# Annex K tables
# --------------------------------------------------------------------------

QUANT_LUM = np.array([
    16, 11, 10, 16, 24, 40, 51, 61,
    12, 12, 14, 19, 26, 58, 60, 55,
    14, 13, 16, 24, 40, 57, 69, 56,
    14, 17, 22, 29, 51, 87, 80, 62,
    18, 22, 37, 56, 68, 109, 103, 77,
    24, 35, 55, 64, 81, 104, 113, 92,
    49, 64, 78, 87, 103, 121, 120, 101,
    72, 92, 95, 98, 112, 100, 103, 99,
], dtype=np.int64)

QUANT_CHROM = np.array([
    17, 18, 24, 47, 99, 99, 99, 99,
    18, 21, 26, 66, 99, 99, 99, 99,
    24, 26, 56, 99, 99, 99, 99, 99,
    47, 66, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
], dtype=np.int64)

# (bits[1..16], values) — T.81 Annex K.3
DC_LUM_BITS = [0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0]
DC_LUM_VALS = list(range(12))
DC_CHROM_BITS = [0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0]
DC_CHROM_VALS = list(range(12))

AC_LUM_BITS = [0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D]
AC_LUM_VALS = [
    0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12, 0x21, 0x31, 0x41,
    0x06, 0x13, 0x51, 0x61, 0x07, 0x22, 0x71, 0x14, 0x32, 0x81, 0x91,
    0xA1, 0x08, 0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0, 0x24,
    0x33, 0x62, 0x72, 0x82, 0x09, 0x0A, 0x16, 0x17, 0x18, 0x19, 0x1A,
    0x25, 0x26, 0x27, 0x28, 0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38,
    0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49, 0x4A, 0x53,
    0x54, 0x55, 0x56, 0x57, 0x58, 0x59, 0x5A, 0x63, 0x64, 0x65, 0x66,
    0x67, 0x68, 0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78, 0x79,
    0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89, 0x8A, 0x92, 0x93,
    0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5,
    0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6, 0xB7,
    0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7, 0xC8, 0xC9,
    0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1,
    0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF1, 0xF2,
    0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA,
]
AC_CHROM_BITS = [0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 0x77]
AC_CHROM_VALS = [
    0x00, 0x01, 0x02, 0x03, 0x11, 0x04, 0x05, 0x21, 0x31, 0x06, 0x12,
    0x41, 0x51, 0x07, 0x61, 0x71, 0x13, 0x22, 0x32, 0x81, 0x08, 0x14,
    0x42, 0x91, 0xA1, 0xB1, 0xC1, 0x09, 0x23, 0x33, 0x52, 0xF0, 0x15,
    0x62, 0x72, 0xD1, 0x0A, 0x16, 0x24, 0x34, 0xE1, 0x25, 0xF1, 0x17,
    0x18, 0x19, 0x1A, 0x26, 0x27, 0x28, 0x29, 0x2A, 0x35, 0x36, 0x37,
    0x38, 0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49, 0x4A,
    0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59, 0x5A, 0x63, 0x64, 0x65,
    0x66, 0x67, 0x68, 0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78,
    0x79, 0x7A, 0x82, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89, 0x8A,
    0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3,
    0xA4, 0xA5, 0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5,
    0xB6, 0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7,
    0xC8, 0xC9, 0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9,
    0xDA, 0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF2,
    0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA,
]

# zigzag order: ZIGZAG[i] = raster index of the i-th zigzag position
ZIGZAG = np.array([
    0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63,
], dtype=np.int64)
UNZIGZAG = np.argsort(ZIGZAG)

# orthonormal 8-point DCT-II matrix: forward F = C @ X @ C.T
_C = np.zeros((8, 8))
for _u in range(8):
    _a = np.sqrt(0.5) if _u == 0 else 1.0
    for _x in range(8):
        _C[_u, _x] = 0.5 * _a * np.cos((2 * _x + 1) * _u * np.pi / 16.0)


def _scaled_quant(base: np.ndarray, quality: int) -> np.ndarray:
    """libjpeg quality scaling: 1..100 → per-entry clamp to [1, 255]."""
    q = min(max(int(quality), 1), 100)
    scale = 5000 // q if q < 50 else 200 - 2 * q
    t = (base * scale + 50) // 100
    return np.clip(t, 1, 255).astype(np.int64)


# --------------------------------------------------------------------------
# Huffman code construction (T.81 Annex C)
# --------------------------------------------------------------------------


def _build_codes(bits: list[int], vals: list[int]) -> dict[int, tuple[int, int]]:
    """symbol → (code, length), canonical per Annex C."""
    out: dict[int, tuple[int, int]] = {}
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            out[vals[k]] = (code, length)
            code += 1
            k += 1
        code <<= 1
    return out


def _build_decode_table(bits: list[int], vals: list[int]) -> dict[tuple[int, int], int]:
    """(length, code) → symbol, the decoder-side view of Annex C."""
    table: dict[tuple[int, int], int] = {}
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            table[(length, code)] = vals[k]
            code += 1
            k += 1
        code <<= 1
    return table


def _magnitude(v: int) -> tuple[int, int]:
    """(size, amplitude bits) for a DC diff / AC coefficient per F.1.2:
    negative values store (v + 2^size - 1) in `size` bits."""
    if v == 0:
        return 0, 0
    size = int(abs(v)).bit_length()
    bits = v if v > 0 else v + (1 << size) - 1
    return size, bits


def _extend(bits: int, size: int) -> int:
    """Inverse of _magnitude (T.81 F.2.2.1 EXTEND)."""
    if size == 0:
        return 0
    if bits < (1 << (size - 1)):
        return bits - (1 << size) + 1
    return bits


# --------------------------------------------------------------------------
# Encoder
# --------------------------------------------------------------------------


class _BitWriter:
    def __init__(self) -> None:
        self.out = bytearray()
        self.acc = 0
        self.nbits = 0

    def write(self, code: int, length: int) -> None:
        self.acc = (self.acc << length) | (code & ((1 << length) - 1))
        self.nbits += length
        while self.nbits >= 8:
            b = (self.acc >> (self.nbits - 8)) & 0xFF
            self.out.append(b)
            if b == 0xFF:  # byte stuffing
                self.out.append(0x00)
            self.nbits -= 8
        self.acc &= (1 << self.nbits) - 1

    def flush(self) -> None:
        if self.nbits:
            pad = 8 - self.nbits
            self.write((1 << pad) - 1, pad)  # 1-fill per spec


def _blocks_of(plane: np.ndarray) -> np.ndarray:
    """(H, W) float plane → (n_blocks, 8, 8), edge-replicated to a
    multiple of 8 (replication keeps block boundaries smooth — less
    ringing than zero padding), raster block order."""
    h, w = plane.shape
    bh, bw = -(-h // 8), -(-w // 8)
    padded = np.pad(plane, ((0, bh * 8 - h), (0, bw * 8 - w)), mode="edge")
    return (
        padded.reshape(bh, 8, bw, 8).transpose(0, 2, 1, 3).reshape(-1, 8, 8)
    )


def _rgb_to_ycbcr(img: np.ndarray) -> np.ndarray:
    r = img[..., 0].astype(np.float64)
    g = img[..., 1].astype(np.float64)
    b = img[..., 2].astype(np.float64)
    y = 0.299 * r + 0.587 * g + 0.114 * b
    cb = -0.168736 * r - 0.331264 * g + 0.5 * b + 128.0
    cr = 0.5 * r - 0.418688 * g - 0.081312 * b + 128.0
    return np.stack([y, cb, cr], axis=-1)


def _encode_scan(
    comps: list[np.ndarray],
    quants: list[np.ndarray],
    dc_codes: list[dict],
    ac_codes: list[dict],
    restart_interval: int = 0,
) -> bytes:
    """Entropy-code quantized zigzag blocks: comps[c] is (n_blocks, 64)
    int. 4:4:4 — each MCU takes block i of every component in turn.
    With a restart interval, RSTn markers (cycling D0..D7) are emitted
    every `restart_interval` MCUs and DC predictors reset — the
    byte-aligned resync points a parallel/fault-tolerant decoder
    needs."""
    w = _BitWriter()
    pred = [0] * len(comps)
    n_mcu = comps[0].shape[0]
    rst = 0
    for i in range(n_mcu):
        if restart_interval and i and i % restart_interval == 0:
            w.flush()
            w.out += bytes([0xFF, 0xD0 + rst])
            rst = (rst + 1) % 8
            pred = [0] * len(comps)
        for c, zz in enumerate(comps):
            block = zz[i]
            # DC
            diff = int(block[0]) - pred[c]
            pred[c] = int(block[0])
            size, bits = _magnitude(diff)
            code, length = dc_codes[c][size]
            w.write(code, length)
            if size:
                w.write(bits, size)
            # AC: run-length of zeros + (run, size)
            run = 0
            for k in range(1, 64):
                v = int(block[k])
                if v == 0:
                    run += 1
                    continue
                while run > 15:
                    zc, zl = ac_codes[c][0xF0]  # ZRL
                    w.write(zc, zl)
                    run -= 16
                size, bits = _magnitude(v)
                code, length = ac_codes[c][run * 16 + size]
                w.write(code, length)
                w.write(bits, size)
                run = 0
            if run:
                ec, el = ac_codes[c][0x00]  # EOB
                w.write(ec, el)
    w.flush()
    return bytes(w.out)


def _seg(marker: int, payload: bytes) -> bytes:
    return struct.pack(">HH", marker, len(payload) + 2) + payload


def _dht_payload(tc: int, th: int, bits: list[int], vals: list[int]) -> bytes:
    return bytes([tc * 16 + th]) + bytes(bits) + bytes(vals)


def encode_jpeg(
    img: np.ndarray, quality: int = 90, restart_interval: int = 0
) -> bytes:
    """uint8 array (H, W, 3) RGB or (H, W)/(H, W, 1) grayscale →
    baseline JFIF bytes. Deterministic: same array + quality +
    restart_interval → same bytes."""
    img = np.asarray(img)
    if img.ndim == 3 and img.shape[2] == 1:
        img = img[..., 0]
    gray = img.ndim == 2
    h, w = img.shape[:2]
    if gray:
        planes = [img.astype(np.float64)]
        quants = [_scaled_quant(QUANT_LUM, quality)]
        qids = [0]
        dc_tabs = [(DC_LUM_BITS, DC_LUM_VALS)]
        ac_tabs = [(AC_LUM_BITS, AC_LUM_VALS)]
    else:
        ycc = _rgb_to_ycbcr(img)
        planes = [ycc[..., 0], ycc[..., 1], ycc[..., 2]]
        ql = _scaled_quant(QUANT_LUM, quality)
        qc = _scaled_quant(QUANT_CHROM, quality)
        quants = [ql, qc, qc]
        qids = [0, 1, 1]
        dc_tabs = [
            (DC_LUM_BITS, DC_LUM_VALS),
            (DC_CHROM_BITS, DC_CHROM_VALS),
            (DC_CHROM_BITS, DC_CHROM_VALS),
        ]
        ac_tabs = [
            (AC_LUM_BITS, AC_LUM_VALS),
            (AC_CHROM_BITS, AC_CHROM_VALS),
            (AC_CHROM_BITS, AC_CHROM_VALS),
        ]

    zz_comps = []
    for plane, q in zip(planes, quants):
        blocks = _blocks_of(plane) - 128.0
        coeffs = np.einsum("ux,nxy,vy->nuv", _C, blocks, _C)
        qz = np.round(coeffs / q.reshape(8, 8)).astype(np.int64)
        zz_comps.append(qz.reshape(-1, 64)[:, ZIGZAG])

    dc_codes = [_build_codes(*t) for t in dc_tabs]
    ac_codes = [_build_codes(*t) for t in ac_tabs]
    scan = _encode_scan(
        zz_comps, quants, dc_codes, ac_codes, restart_interval
    )

    out = bytearray(b"\xff\xd8")  # SOI
    out += _seg(0xFFE0, b"JFIF\x00\x01\x02\x00\x00\x01\x00\x01\x00\x00")
    # DQT (zigzag order per spec)
    ql_z = bytes(int(x) for x in quants[0][ZIGZAG])
    out += _seg(0xFFDB, b"\x00" + ql_z)
    if not gray:
        qc_z = bytes(int(x) for x in quants[1][ZIGZAG])
        out += _seg(0xFFDB, b"\x01" + qc_z)
    # SOF0
    ncomp = 1 if gray else 3
    sof = struct.pack(">BHHB", 8, h, w, ncomp)
    for c in range(ncomp):
        sof += bytes([c + 1, 0x11, qids[c]])
    out += _seg(0xFFC0, sof)
    # DHT
    out += _seg(0xFFC4, _dht_payload(0, 0, *dc_tabs[0]))
    out += _seg(0xFFC4, _dht_payload(1, 0, *ac_tabs[0]))
    if not gray:
        out += _seg(0xFFC4, _dht_payload(0, 1, *dc_tabs[1]))
        out += _seg(0xFFC4, _dht_payload(1, 1, *ac_tabs[1]))
    if restart_interval:
        out += _seg(0xFFDD, struct.pack(">H", restart_interval))
    # SOS
    sos = bytes([ncomp])
    for c in range(ncomp):
        tab = 0 if c == 0 else 0x11
        sos += bytes([c + 1, tab])
    sos += b"\x00\x3f\x00"
    out += _seg(0xFFDA, sos)
    out += scan
    out += b"\xff\xd9"  # EOI
    return bytes(out)


# --------------------------------------------------------------------------
# Decoder
# --------------------------------------------------------------------------


class _BitReader:
    """Scan-section bit reader with 0xFF00 unstuffing; restart markers
    are surfaced via `at_marker` so the MCU loop can reset DC
    predictors."""

    def __init__(self, data: bytes, pos: int) -> None:
        self.data = data
        self.pos = pos
        self.acc = 0
        self.nbits = 0

    def _fill(self) -> None:
        d = self.data
        b = d[self.pos]
        if b == 0xFF:
            nxt = d[self.pos + 1]
            if nxt == 0x00:
                self.pos += 2
            elif 0xD0 <= nxt <= 0xD7:  # RSTn handled by caller
                raise _RestartMarker()
            else:
                raise ValueError(f"unexpected marker 0xFF{nxt:02x} in scan")
        else:
            self.pos += 1
        self.acc = (self.acc << 8) | b
        self.nbits += 8

    def read_bit(self) -> int:
        if self.nbits == 0:
            self._fill()
        self.nbits -= 1
        return (self.acc >> self.nbits) & 1

    def read_bits(self, n: int) -> int:
        v = 0
        for _ in range(n):
            v = (v << 1) | self.read_bit()
        return v

    def at_restart(self) -> bool:
        """True when an RSTn marker sits at the current byte position
        (any partial-byte padding bits already consumed into acc are
        exactly what an encoder discards before a restart)."""
        d, p = self.data, self.pos
        return p + 1 < len(d) and d[p] == 0xFF and 0xD0 <= d[p + 1] <= 0xD7

    def skip_restart(self) -> None:
        """Consume an RSTn marker and realign to a byte boundary."""
        self.acc = 0
        self.nbits = 0
        assert self.at_restart()
        self.pos += 2


class _RestartMarker(Exception):
    pass


def _read_symbol(r: _BitReader, table: dict[tuple[int, int], int]) -> int:
    code = 0
    for length in range(1, 17):
        code = (code << 1) | r.read_bit()
        sym = table.get((length, code))
        if sym is not None:
            return sym
    raise ValueError("invalid Huffman code in scan")


def decode_jpeg(payload: bytes) -> np.ndarray:
    """Baseline JFIF bytes → uint8 array (H, W, 3) RGB or (H, W, 1)
    grayscale. Sequential DCT / Huffman / 8-bit / 4:4:4 or single
    component only (SOF0; anything else raises ValueError).

    Every malformed-input failure mode surfaces as ValueError: a
    truncated payload hits a bytes-index or struct bound internally
    (IndexError / struct.error), which would escape the `except
    ValueError` undecodable-row handlers in the multimodal operators
    and fail a whole task on one bad external blob (r9 ADVICE) — so
    they are normalized here, at the decode boundary."""
    try:
        return _decode_jpeg(payload)
    except (IndexError, KeyError, struct.error) as exc:
        # KeyError (r10 review): a scan referencing an undeclared
        # Huffman/quant table or a component absent from SOF0 indexes
        # into the table dicts — malformed input, same contract
        raise ValueError(f"truncated or malformed JPEG: {exc}") from exc


def _decode_jpeg(payload: bytes) -> np.ndarray:
    if payload[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG (missing SOI)")
    pos = 2
    quants: dict[int, np.ndarray] = {}
    dc_tables: dict[int, dict] = {}
    ac_tables: dict[int, dict] = {}
    frame = None
    restart_interval = 0

    while True:
        if payload[pos] != 0xFF:
            raise ValueError(f"expected marker at byte {pos}")
        # T.81 B.1.1.2: a marker may be preceded by any number of 0xFF
        # fill bytes, and some encoders emit them — skip the fill so
        # the byte after the LAST 0xFF is read as the marker code
        # (r9 ADVICE; previously 0xFFFF here raised).
        while payload[pos + 1] == 0xFF:
            pos += 1
        marker = payload[pos + 1]
        pos += 2
        if marker == 0xD9:  # EOI
            raise ValueError("reached EOI without a scan")
        if marker in (0x01,) or 0xD0 <= marker <= 0xD7:
            continue  # standalone markers
        (seglen,) = struct.unpack(">H", payload[pos:pos + 2])
        body = payload[pos + 2:pos + seglen]
        pos += seglen
        if marker == 0xDB:  # DQT — possibly several tables per segment
            i = 0
            while i < len(body):
                pq, tq = body[i] >> 4, body[i] & 0x0F
                if pq != 0:
                    raise ValueError("16-bit quant tables unsupported")
                zz = np.frombuffer(body[i + 1:i + 65], dtype=np.uint8)
                tbl = np.zeros(64, dtype=np.int64)
                tbl[ZIGZAG] = zz
                quants[tq] = tbl
                i += 65
        elif marker == 0xC4:  # DHT
            i = 0
            while i < len(body):
                tc, th = body[i] >> 4, body[i] & 0x0F
                bits = list(body[i + 1:i + 17])
                n = sum(bits)
                vals = list(body[i + 17:i + 17 + n])
                tab = _build_decode_table(bits, vals)
                (dc_tables if tc == 0 else ac_tables)[th] = tab
                i += 17 + n
        elif marker == 0xC0:  # SOF0 baseline
            prec, h, w, ncomp = struct.unpack(">BHHB", body[:6])
            if prec != 8:
                raise ValueError("only 8-bit precision supported")
            comps = []
            for c in range(ncomp):
                cid, hv, tq = body[6 + 3 * c:9 + 3 * c]
                if hv != 0x11:
                    raise ValueError(
                        "subsampled chroma unsupported (4:4:4 only)"
                    )
                comps.append((cid, tq))
            frame = (h, w, comps)
        elif marker in (0xC1, 0xC2, 0xC3, 0xC5, 0xC6, 0xC7,
                        0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF):
            raise ValueError(
                f"non-baseline frame (SOF{marker - 0xC0}) unsupported"
            )
        elif marker == 0xDD:  # DRI
            (restart_interval,) = struct.unpack(">H", body[:2])
        elif marker == 0xDA:  # SOS — entropy data follows
            if frame is None:
                raise ValueError("SOS before SOF0")
            ns = body[0]
            scan_tabs = []
            for c in range(ns):
                cs, tabs = body[1 + 2 * c], body[2 + 2 * c]
                scan_tabs.append((cs, tabs >> 4, tabs & 0x0F))
            return _decode_scan(
                payload, pos, frame, scan_tabs, quants,
                dc_tables, ac_tables, restart_interval,
            )
        # else: APPn / COM — skipped


def _decode_scan(
    payload, pos, frame, scan_tabs, quants, dc_tables, ac_tables,
    restart_interval,
) -> np.ndarray:
    h, w, comps = frame
    ncomp = len(comps)
    bh, bw = -(-h // 8), -(-w // 8)
    n_mcu = bh * bw
    r = _BitReader(payload, pos)
    zz = [np.zeros((n_mcu, 64), dtype=np.int64) for _ in range(ncomp)]
    pred = [0] * ncomp
    tab_by_comp = {cs: (dc_id, ac_id) for cs, dc_id, ac_id in scan_tabs}

    i = 0
    while i < n_mcu:
        if restart_interval and i and i % restart_interval == 0:
            # consume the expected marker ONLY if it is actually there
            # — a foreign stream whose restart placement diverges from
            # its DRI header simply continues with entropy data here,
            # and its early restarts reach the _RestartMarker retry
            # below instead (r9 ADVICE)
            if r.at_restart():
                r.skip_restart()
                pred = [0] * ncomp
        try:
            for c in range(ncomp):
                cid, _tq = comps[c]
                dc_id, ac_id = tab_by_comp[cid]
                dct, act = dc_tables[dc_id], ac_tables[ac_id]
                size = _read_symbol(r, dct)
                diff = _extend(r.read_bits(size), size)
                pred[c] += diff
                zz[c][i, 0] = pred[c]
                k = 1
                while k < 64:
                    rs = _read_symbol(r, act)
                    run, size = rs >> 4, rs & 0x0F
                    if size == 0:
                        if run == 15:  # ZRL
                            k += 16
                            continue
                        break  # EOB
                    k += run
                    if k > 63:
                        raise ValueError("AC run past block end")
                    zz[c][i, k] = _extend(r.read_bits(size), size)
                    k += 1
            i += 1
        except _RestartMarker:
            # Foreign encoder placed RSTn where our DRI arithmetic did
            # not expect one. The aborted parse may already have
            # written DC/AC coefficients into this MCU's rows — zero
            # them before re-decoding, or stale nonzero ACs would
            # survive wherever the re-decoded MCU has zeros (the AC
            # loop writes only nonzero positions; r9 ADVICE). pred is
            # fully reset below, which IS the post-restart state —
            # partial pred updates from the aborted parse are
            # overwritten, not accumulated.
            for c in range(ncomp):
                zz[c][i, :] = 0
            r.skip_restart()
            pred = [0] * ncomp

    planes = []
    for c in range(ncomp):
        _cid, tq = comps[c]
        q = quants[tq].astype(np.float64)
        # zz[:, UNZIGZAG] is already raster order — dequantize with the
        # raster-order table directly (permuting q again would pair
        # low-frequency coefficients with high-frequency step sizes)
        coeffs = (zz[c][:, UNZIGZAG] * q).reshape(-1, 8, 8)
        pix = np.einsum("xu,nuv,yv->nxy", _C.T, coeffs, _C.T) + 128.0
        full = (
            pix.reshape(bh, bw, 8, 8).transpose(0, 2, 1, 3)
            .reshape(bh * 8, bw * 8)[:h, :w]
        )
        planes.append(full)

    if ncomp == 1:
        out = np.clip(np.round(planes[0]), 0, 255).astype(np.uint8)
        return out[..., None]
    y, cb, cr = planes
    r_ = y + 1.402 * (cr - 128.0)
    g_ = y - 0.344136 * (cb - 128.0) - 0.714136 * (cr - 128.0)
    b_ = y + 1.772 * (cb - 128.0)
    rgb = np.stack([r_, g_, b_], axis=-1)
    return np.clip(np.round(rgb), 0, 255).astype(np.uint8)
