"""REAL baseline JPEG codec — pure numpy + stdlib, no imaging library.

Closes the LAST loud decoder stub in the multimodal family (reference
parity target: main.py has no media path at all; this module exists for
the 100 TB training-data extension surface, where JPEG is the dominant
image container). The round-9 PNG codec proved the pattern (container
parsing + stdlib entropy layer); JPEG adds the lossy-DCT layer the PNG
stub note said "genuinely requires an imaging library" — it does not:
baseline sequential JPEG is Annex-K Huffman tables + an 8x8 orthonormal
DCT, both exactly expressible in numpy.

Supported subset (the encoder's own output, i.e. the common baseline
web case):

- baseline sequential DCT (SOF0), 8-bit samples
- grayscale (1 component) and YCbCr 4:4:4 (3 components, all sampling
  factors 1x1) — chroma SUBSAMPLED payloads raise ``ValueError`` naming
  the feature, as do progressive (SOF2), arithmetic coding, 12-bit,
  and restart intervals (DRI): loud rejection, never garbage pixels
  (the PNG corruption discipline)
- standard Annex K quantization + Huffman tables, libjpeg quality
  scaling in the encoder

Determinism: encoding is exact integer arithmetic after one float64
DCT + round (numpy IEEE ops — bit-stable across runs/partitions);
decoding is the exact inverse entropy path + one float64 IDCT + clip.
The lossy step is the quantizer ROUND, not any platform-dependent
math, so encode(decode(encode(x))) is byte-stable.

Performance shape: the DCT/IDCT and color transforms are vectorized
over ALL blocks at once (numpy einsum over a (n_blocks, 8, 8) tensor);
only the entropy coder is a per-symbol Python loop — bounded by the
payload's coefficient count, fine inside mapInPandas thumbnail batches
(the PNG Paeth-row caveat verbatim; register an imaging lib via
``register_decoder`` for megapixel rasters).
"""

from __future__ import annotations

import struct

import numpy as np

# --------------------------------------------------------------------------
# Constants: zigzag, Annex K quantization + Huffman tables
# --------------------------------------------------------------------------

ZIGZAG = np.array([
    0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63,
], dtype=np.int64)

#: Annex K.1 luminance / K.2 chrominance base quantization tables
#: (natural row-major order).
QUANT_LUMA = np.array([
    16, 11, 10, 16, 24, 40, 51, 61,
    12, 12, 14, 19, 26, 58, 60, 55,
    14, 13, 16, 24, 40, 57, 69, 56,
    14, 17, 22, 29, 51, 87, 80, 62,
    18, 22, 37, 56, 68, 109, 103, 77,
    24, 35, 55, 64, 81, 104, 113, 92,
    49, 64, 78, 87, 103, 121, 120, 101,
    72, 92, 95, 98, 112, 100, 103, 99,
], dtype=np.int64)

QUANT_CHROMA = np.array([
    17, 18, 24, 47, 99, 99, 99, 99,
    18, 21, 26, 66, 99, 99, 99, 99,
    24, 26, 56, 99, 99, 99, 99, 99,
    47, 66, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
], dtype=np.int64)

#: Annex K.3 standard Huffman specs: (BITS[1..16], HUFFVAL).
DC_LUMA_BITS = [0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0]
DC_LUMA_VALS = list(range(12))
DC_CHROMA_BITS = [0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0]
DC_CHROMA_VALS = list(range(12))

AC_LUMA_BITS = [0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D]
AC_LUMA_VALS = [
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
AC_CHROMA_BITS = [0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 0x77]
AC_CHROMA_VALS = [
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

#: orthonormal 8-point DCT-II matrix — exactly JPEG's FDCT scaling
#: (1/4 C(u)C(v) == the orthonormal c_u c_v for N = 8).
_K = np.arange(8, dtype=np.float64)
DCT_T = np.cos((2 * _K[None, :] + 1) * _K[:, None] * np.pi / 16) * 0.5
DCT_T[0, :] = 1.0 / (2.0 * np.sqrt(2.0))


def quality_tables(quality: int) -> tuple[np.ndarray, np.ndarray]:
    """libjpeg quality scaling of the Annex K base tables."""
    if not 1 <= quality <= 100:
        raise ValueError("quality must be in [1, 100]")
    scale = 5000 // quality if quality < 50 else 200 - 2 * quality
    ql = np.clip((QUANT_LUMA * scale + 50) // 100, 1, 255)
    qc = np.clip((QUANT_CHROMA * scale + 50) // 100, 1, 255)
    return ql.astype(np.int64), qc.astype(np.int64)


# --------------------------------------------------------------------------
# Huffman code construction (C.2) — shared by encoder and decoder
# --------------------------------------------------------------------------


def _huff_codes(bits: list[int], vals: list[int]) -> dict[int, tuple[int, int]]:
    """symbol -> (code, length) per the canonical BITS/HUFFVAL recipe."""
    out: dict[int, tuple[int, int]] = {}
    code, k = 0, 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            out[vals[k]] = (code, length)
            code += 1
            k += 1
        code <<= 1
    return out


def _huff_lookup(bits: list[int], vals: list[int]) -> dict[tuple[int, int], int]:
    """(length, code) -> symbol, for the bit-serial decoder."""
    return {
        (length, code): sym
        for sym, (code, length) in _huff_codes(bits, vals).items()
    }


# --------------------------------------------------------------------------
# Bit I/O with 0xFF byte stuffing
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
            byte = (self.acc >> (self.nbits - 8)) & 0xFF
            self.out.append(byte)
            if byte == 0xFF:
                self.out.append(0x00)  # byte stuffing
            self.nbits -= 8
        self.acc &= (1 << self.nbits) - 1

    def flush(self) -> bytes:
        if self.nbits:
            pad = 8 - self.nbits
            self.write((1 << pad) - 1, pad)  # 1-fill per spec
        return bytes(self.out)


class _BitReader:
    def __init__(self, data: bytes) -> None:
        self.data = data
        self.pos = 0
        self.acc = 0
        self.nbits = 0

    def read_bit(self) -> int:
        if self.nbits == 0:
            if self.pos >= len(self.data):
                raise ValueError("truncated JPEG entropy stream")
            byte = self.data[self.pos]
            self.pos += 1
            if byte == 0xFF:
                if self.pos >= len(self.data):
                    raise ValueError("truncated JPEG entropy stream")
                marker = self.data[self.pos]
                self.pos += 1
                if marker != 0x00:
                    raise ValueError(
                        f"unexpected marker 0xFF{marker:02X} in entropy"
                        " stream (restart intervals are unsupported)"
                    )
            self.acc = byte
            self.nbits = 8
        self.nbits -= 1
        return (self.acc >> self.nbits) & 1

    def read_bits(self, n: int) -> int:
        v = 0
        for _ in range(n):
            v = (v << 1) | self.read_bit()
        return v

    def read_symbol(self, lookup: dict[tuple[int, int], int]) -> int:
        code = 0
        for length in range(1, 17):
            code = (code << 1) | self.read_bit()
            sym = lookup.get((length, code))
            if sym is not None:
                return sym
        raise ValueError("invalid Huffman code in JPEG entropy stream")


def _extend(value: int, size: int) -> int:
    """F.2.2.1 EXTEND: map the raw `size` low bits to a signed value."""
    if size == 0:
        return 0
    return value if value >= (1 << (size - 1)) else value - (1 << size) + 1


def _category(v: int) -> int:
    return int(v).bit_length() if v >= 0 else int(-v).bit_length()


# --------------------------------------------------------------------------
# Encoder
# --------------------------------------------------------------------------


def _rgb_to_ycbcr(px: np.ndarray) -> np.ndarray:
    r, g, b = px[..., 0], px[..., 1], px[..., 2]
    y = 0.299 * r + 0.587 * g + 0.114 * b
    cb = -0.168736 * r - 0.331264 * g + 0.5 * b + 128.0
    cr = 0.5 * r - 0.418688 * g - 0.081312 * b + 128.0
    return np.stack([y, cb, cr], axis=-1)


def _ycbcr_to_rgb(px: np.ndarray) -> np.ndarray:
    y, cb, cr = px[..., 0], px[..., 1], px[..., 2]
    r = y + 1.402 * (cr - 128.0)
    g = y - 0.344136 * (cb - 128.0) - 0.714136 * (cr - 128.0)
    b = y + 1.772 * (cb - 128.0)
    return np.stack([r, g, b], axis=-1)


def _blocks(plane: np.ndarray) -> tuple[np.ndarray, int, int]:
    """Pad (edge-replicate) to 8-multiples and tile into
    (n_blocks, 8, 8) in MCU raster order."""
    h, w = plane.shape
    ph, pw = (-h) % 8, (-w) % 8
    padded = np.pad(plane, ((0, ph), (0, pw)), mode="edge")
    bh, bw = padded.shape[0] // 8, padded.shape[1] // 8
    tiles = padded.reshape(bh, 8, bw, 8).transpose(0, 2, 1, 3).reshape(-1, 8, 8)
    return tiles, bh, bw


def _quantize_plane(plane: np.ndarray, qtab: np.ndarray) -> np.ndarray:
    """(n_blocks, 64) zigzagged quantized coefficients for one plane."""
    tiles, _, _ = _blocks(plane.astype(np.float64) - 128.0)
    coef = np.einsum("ij,njk,lk->nil", DCT_T, tiles, DCT_T)
    q = np.round(coef / qtab.reshape(8, 8)).astype(np.int64)
    return q.reshape(-1, 64)[:, ZIGZAG]


def _encode_block(
    w: _BitWriter,
    zz: np.ndarray,
    prev_dc: int,
    dc_codes: dict[int, tuple[int, int]],
    ac_codes: dict[int, tuple[int, int]],
) -> int:
    diff = int(zz[0]) - prev_dc
    s = _category(diff)
    code, length = dc_codes[s]
    w.write(code, length)
    if s:
        w.write(diff if diff > 0 else diff + (1 << s) - 1, s)
    run = 0
    last_nz = int(np.max(np.nonzero(zz)[0])) if np.any(zz[1:]) else 0
    for i in range(1, last_nz + 1):
        v = int(zz[i])
        if v == 0:
            run += 1
            continue
        while run > 15:
            zrl, zl = ac_codes[0xF0]
            w.write(zrl, zl)
            run -= 16
        s = _category(v)
        code, length = ac_codes[(run << 4) | s]
        w.write(code, length)
        w.write(v if v > 0 else v + (1 << s) - 1, s)
        run = 0
    if last_nz < 63:
        eob, el = ac_codes[0x00]
        w.write(eob, el)
    return int(zz[0])


def _seg(marker: int, payload: bytes) -> bytes:
    return struct.pack(">BBH", 0xFF, marker, len(payload) + 2) + payload


def _dht(tc: int, th: int, bits: list[int], vals: list[int]) -> bytes:
    return bytes([(tc << 4) | th] + bits + vals)


def encode_jpeg(pixels: np.ndarray, quality: int = 90) -> bytes:
    """Encode a uint8 (h, w) grayscale or (h, w, 3) RGB array as a
    baseline JFIF JPEG (4:4:4, standard tables, libjpeg quality
    scaling)."""
    px = np.asarray(pixels)
    if px.dtype != np.uint8:
        raise ValueError("encode_jpeg expects uint8 pixels")
    gray = px.ndim == 2
    if not gray and (px.ndim != 3 or px.shape[2] != 3):
        raise ValueError("encode_jpeg expects (h, w) gray or (h, w, 3) RGB")
    h, w = px.shape[:2]
    ql, qc = quality_tables(quality)

    if gray:
        planes = [px.astype(np.float64)]
    else:
        ycc = _rgb_to_ycbcr(px.astype(np.float64))
        planes = [ycc[..., 0], ycc[..., 1], ycc[..., 2]]

    zz_planes = [
        _quantize_plane(p, ql if ci == 0 else qc)
        for ci, p in enumerate(planes)
    ]

    out = bytearray(b"\xff\xd8")  # SOI
    out += _seg(0xE0, b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00")
    out += _seg(0xDB, bytes([0]) + bytes(int(v) for v in ql[ZIGZAG]))
    if not gray:
        out += _seg(0xDB, bytes([1]) + bytes(int(v) for v in qc[ZIGZAG]))
    ncomp = 1 if gray else 3
    sof = struct.pack(">BHHB", 8, h, w, ncomp)
    for c in range(ncomp):
        sof += bytes([c + 1, 0x11, 0 if c == 0 else 1])
    out += _seg(0xC0, sof)
    out += _seg(0xC4, _dht(0, 0, DC_LUMA_BITS, DC_LUMA_VALS))
    out += _seg(0xC4, _dht(1, 0, AC_LUMA_BITS, AC_LUMA_VALS))
    if not gray:
        out += _seg(0xC4, _dht(0, 1, DC_CHROMA_BITS, DC_CHROMA_VALS))
        out += _seg(0xC4, _dht(1, 1, AC_CHROMA_BITS, AC_CHROMA_VALS))
    sos = bytes([ncomp])
    for c in range(ncomp):
        sos += bytes([c + 1, 0x00 if c == 0 else 0x11])
    sos += bytes([0, 63, 0])
    out += _seg(0xDA, sos)

    dc_l = _huff_codes(DC_LUMA_BITS, DC_LUMA_VALS)
    ac_l = _huff_codes(AC_LUMA_BITS, AC_LUMA_VALS)
    dc_c = _huff_codes(DC_CHROMA_BITS, DC_CHROMA_VALS)
    ac_c = _huff_codes(AC_CHROMA_BITS, AC_CHROMA_VALS)
    wtr = _BitWriter()
    prev = [0] * ncomp
    n_blocks = zz_planes[0].shape[0]
    for bi in range(n_blocks):
        for ci in range(ncomp):
            prev[ci] = _encode_block(
                wtr,
                zz_planes[ci][bi],
                prev[ci],
                dc_l if ci == 0 else dc_c,
                ac_l if ci == 0 else ac_c,
            )
    out += wtr.flush()
    out += b"\xff\xd9"  # EOI
    return bytes(out)


# --------------------------------------------------------------------------
# Decoder
# --------------------------------------------------------------------------


def decode_jpeg(payload: bytes) -> dict:
    """REAL baseline JPEG decode for the subset documented in the
    module docstring. Returns {width, height, channels, pixels};
    pixels is (h, w) uint8 for grayscale, (h, w, 3) for color.
    Unsupported features raise ``ValueError`` naming them."""
    if not payload.startswith(b"\xff\xd8"):
        raise ValueError("not a JPEG payload (missing SOI)")
    pos, n = 2, len(payload)
    qtabs: dict[int, np.ndarray] = {}
    huff: dict[tuple[int, int], dict[tuple[int, int], int]] = {}
    comps: list[dict] = []
    h = w = None
    scan_comps: list[dict] = []
    scan_start = None

    while pos + 2 <= n:
        if payload[pos] != 0xFF:
            raise ValueError("corrupt JPEG: expected marker")
        # B.1.1.2: any number of 0xFF fill bytes may precede a marker.
        while pos + 1 < n and payload[pos + 1] == 0xFF:
            pos += 1
        if pos + 1 >= n:
            raise ValueError("truncated JPEG: fill bytes run to EOF")
        marker = payload[pos + 1]
        if marker == 0xD9:
            break
        # Standalone (length-less) markers allowed between segments:
        # TEM (0x01) and RSTn (0xD0-0xD7). Other encoders may emit
        # them; skip the 2 marker bytes and continue scanning.
        if marker == 0x01 or 0xD0 <= marker <= 0xD7:
            pos += 2
            continue
        if pos + 4 > n:
            raise ValueError("truncated JPEG segment header")
        seglen = struct.unpack(">H", payload[pos + 2 : pos + 4])[0]
        body = payload[pos + 4 : pos + 2 + seglen]
        if len(body) != seglen - 2:
            raise ValueError("truncated JPEG segment")
        if marker == 0xDB:
            bpos = 0
            while bpos < len(body):
                pq, tq = body[bpos] >> 4, body[bpos] & 0x0F
                if pq != 0:
                    raise ValueError("16-bit quantization tables unsupported")
                tab = np.zeros(64, dtype=np.int64)
                tab[ZIGZAG] = np.frombuffer(
                    body[bpos + 1 : bpos + 65], dtype=np.uint8
                ).astype(np.int64)
                qtabs[tq] = tab
                bpos += 65
        elif marker == 0xC4:
            bpos = 0
            while bpos < len(body):
                tc, th = body[bpos] >> 4, body[bpos] & 0x0F
                bits = list(body[bpos + 1 : bpos + 17])
                nv = sum(bits)
                vals = list(body[bpos + 17 : bpos + 17 + nv])
                huff[(tc, th)] = _huff_lookup(bits, vals)
                bpos += 17 + nv
        elif marker == 0xC0:
            prec, h, w, nc = struct.unpack(">BHHB", body[:6])
            if prec != 8:
                raise ValueError(f"{prec}-bit JPEG unsupported")
            if nc not in (1, 3):
                raise ValueError(f"{nc}-component JPEG unsupported")
            for c in range(nc):
                cid, samp, tq = body[6 + 3 * c : 9 + 3 * c]
                if samp != 0x11:
                    raise ValueError(
                        "chroma-subsampled JPEG unsupported (sampling"
                        f" factor 0x{samp:02X}; this codec is 4:4:4)"
                    )
                comps.append({"id": cid, "tq": tq})
        elif marker in (0xC1, 0xC2, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA,
                        0xCB, 0xCD, 0xCE, 0xCF):
            raise ValueError(
                f"non-baseline JPEG (SOF marker 0xFF{marker:02X})"
                " unsupported — baseline sequential (SOF0) only"
            )
        elif marker == 0xDD:
            raise ValueError("restart intervals (DRI) unsupported")
        elif marker == 0xDA:
            ns = body[0]
            for c in range(ns):
                cid, tables = body[1 + 2 * c], body[2 + 2 * c]
                comp = next(
                    (k for k in comps if k["id"] == cid), None
                )
                if comp is None:
                    raise ValueError("SOS references unknown component")
                scan_comps.append(
                    {**comp, "dc": tables >> 4, "ac": tables & 0x0F}
                )
            scan_start = pos + 2 + seglen
            break
        pos += 2 + seglen

    if h is None or scan_start is None:
        raise ValueError("truncated JPEG: missing SOF0 or SOS")

    # locate EOI so the bit reader never walks past the scan
    end = payload.rfind(b"\xff\xd9")
    if end < scan_start:
        raise ValueError("truncated JPEG: missing EOI")
    rdr = _BitReader(payload[scan_start:end])

    bh, bw = -(-h // 8), -(-w // 8)
    nc = len(scan_comps)
    coefs = [
        np.zeros((bh * bw, 64), dtype=np.int64) for _ in range(nc)
    ]
    prev = [0] * nc
    for bi in range(bh * bw):
        for ci, sc in enumerate(scan_comps):
            dc_lut = huff.get((0, sc["dc"]))
            ac_lut = huff.get((1, sc["ac"]))
            if dc_lut is None or ac_lut is None:
                raise ValueError("SOS references undefined Huffman table")
            s = rdr.read_symbol(dc_lut)
            diff = _extend(rdr.read_bits(s), s) if s else 0
            prev[ci] += diff
            blk = coefs[ci][bi]
            blk[0] = prev[ci]
            k = 1
            while k < 64:
                rs = rdr.read_symbol(ac_lut)
                if rs == 0x00:  # EOB
                    break
                run, size = rs >> 4, rs & 0x0F
                if size == 0:
                    if run != 15:
                        raise ValueError("invalid AC run/size symbol")
                    k += 16  # ZRL
                    # ZRL past the block end is as corrupt as a long
                    # run: reject loudly (module discipline — never
                    # silently drop trailing coefficients). k == 64 is
                    # legal only as the loop's natural exit.
                    if k > 64:
                        raise ValueError("AC coefficient index overflow")
                    continue
                k += run
                if k > 63:
                    raise ValueError("AC coefficient index overflow")
                blk[k] = _extend(rdr.read_bits(size), size)
                k += 1

    planes = []
    for ci, sc in enumerate(scan_comps):
        q = qtabs.get(sc["tq"])
        if q is None:
            raise ValueError("component references undefined quant table")
        # coefs are in ZIGZAG order, q in natural order: dezigzag
        # FIRST, then dequantize in natural order (multiplying before
        # the scatter would pair coefficients with permuted steps)
        dez = np.zeros((bh * bw, 64), dtype=np.float64)
        dez[:, ZIGZAG] = coefs[ci]
        dez *= q[None, :]
        tiles = dez.reshape(-1, 8, 8)
        spat = np.einsum("ji,njk,kl->nil", DCT_T, tiles, DCT_T) + 128.0
        plane = (
            spat.reshape(bh, bw, 8, 8)
            .transpose(0, 2, 1, 3)
            .reshape(bh * 8, bw * 8)[:h, :w]
        )
        planes.append(plane)

    if nc == 1:
        pixels = np.clip(np.round(planes[0]), 0, 255).astype(np.uint8)
    else:
        ycc = np.stack(planes, axis=-1)
        pixels = np.clip(np.round(_ycbcr_to_rgb(ycc)), 0, 255).astype(
            np.uint8
        )
    return {
        "width": int(w),
        "height": int(h),
        "channels": 1 if nc == 1 else 3,
        "pixels": pixels,
    }
