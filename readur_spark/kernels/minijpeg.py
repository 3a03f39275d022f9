"""Baseline JPEG codec (ITU-T T.81 sequential DCT, Huffman), stdlib +
numpy — no imaging library.

Why it exists: the reference decodes JPEG scans via the Rust ``image``
crate before OCR (/root/reference/src/ocr/enhanced.rs:214 ``image::open``,
src/ingestion/document_ingestion.rs:356-408 EXIF auto-rotate on JPEG);
this container has no PIL, so the JPEG leg of the multimodal decode was a
flagged stub until now. This module implements the actual standard:

* decoder: baseline sequential (SOF0/1) AND progressive (SOF2, T.81
  G.1.2: spectral selection + successive approximation, DC/AC
  first+refinement scans, EOB runs), 8-bit, grayscale / YCbCr (4:4:4,
  4:2:2, 4:2:0), standard or custom Huffman + quant tables, restart
  markers, byte unstuffing;
* encoder: grayscale or RGB→YCbCr, 4:4:4 or 4:2:0 (``subsample=True``),
  Annex-K example tables quality-scaled per the IJG recipe — used to
  synthesize deterministic test/bench fixtures in-container and to
  exercise the decoder's subsampled-MCU walk. ``jpeg_encode_progressive``
  emits a multi-scan SOF2 stream (DC first+refine, spectrally split AC
  first+refine) whose dequantized coefficients are bit-identical to the
  baseline encoder's — the progressive decoder is tested by exact
  array equality against the baseline decode of the same image.

JPEG is lossy: the roundtrip contract is PSNR, not equality (tested
>30 dB at q=90 on noise, much higher on smooth content). Not supported
(raise ``JpegError``): arithmetic coding, 12-bit, hierarchical (SOF3+),
CMYK/Adobe 4-component scans.
"""

from __future__ import annotations

import struct

import numpy as np


class JpegError(ValueError):
    pass


# --------------------------------------------------------------------------
# Tables (T.81 Annex K)
# --------------------------------------------------------------------------

ZIGZAG = np.array(
    [
        0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
        12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
        35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
        58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63,
    ],
    dtype=np.int32,
)

_Q_LUMA = np.array(
    [
        16, 11, 10, 16, 24, 40, 51, 61,
        12, 12, 14, 19, 26, 58, 60, 55,
        14, 13, 16, 24, 40, 57, 69, 56,
        14, 17, 22, 29, 51, 87, 80, 62,
        18, 22, 37, 56, 68, 109, 103, 77,
        24, 35, 55, 64, 81, 104, 113, 92,
        49, 64, 78, 87, 103, 121, 120, 101,
        72, 92, 95, 98, 112, 100, 103, 99,
    ],
    dtype=np.int32,
)

_Q_CHROMA = np.array(
    [
        17, 18, 24, 47, 99, 99, 99, 99,
        18, 21, 26, 66, 99, 99, 99, 99,
        24, 26, 56, 99, 99, 99, 99, 99,
        47, 66, 99, 99, 99, 99, 99, 99,
        99, 99, 99, 99, 99, 99, 99, 99,
        99, 99, 99, 99, 99, 99, 99, 99,
        99, 99, 99, 99, 99, 99, 99, 99,
        99, 99, 99, 99, 99, 99, 99, 99,
    ],
    dtype=np.int32,
)

# (bits, values) per Annex K: DC luma, AC luma, DC chroma, AC chroma
_DC_LUMA_BITS = [0, 0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0]
_DC_LUMA_VALS = list(range(12))
_DC_CHROMA_BITS = [0, 0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0]
_DC_CHROMA_VALS = list(range(12))
_AC_LUMA_BITS = [0, 0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D]
_AC_LUMA_VALS = [
    0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12, 0x21, 0x31, 0x41, 0x06,
    0x13, 0x51, 0x61, 0x07, 0x22, 0x71, 0x14, 0x32, 0x81, 0x91, 0xA1, 0x08,
    0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0, 0x24, 0x33, 0x62, 0x72,
    0x82, 0x09, 0x0A, 0x16, 0x17, 0x18, 0x19, 0x1A, 0x25, 0x26, 0x27, 0x28,
    0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38, 0x39, 0x3A, 0x43, 0x44, 0x45,
    0x46, 0x47, 0x48, 0x49, 0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59,
    0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68, 0x69, 0x6A, 0x73, 0x74, 0x75,
    0x76, 0x77, 0x78, 0x79, 0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89,
    0x8A, 0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3,
    0xA4, 0xA5, 0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6,
    0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7, 0xC8, 0xC9,
    0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1, 0xE2,
    0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF1, 0xF2, 0xF3, 0xF4,
    0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA,
]
_AC_CHROMA_BITS = [0, 0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 0x77]
_AC_CHROMA_VALS = [
    0x00, 0x01, 0x02, 0x03, 0x11, 0x04, 0x05, 0x21, 0x31, 0x06, 0x12, 0x41,
    0x51, 0x07, 0x61, 0x71, 0x13, 0x22, 0x32, 0x81, 0x08, 0x14, 0x42, 0x91,
    0xA1, 0xB1, 0xC1, 0x09, 0x23, 0x33, 0x52, 0xF0, 0x15, 0x62, 0x72, 0xD1,
    0x0A, 0x16, 0x24, 0x34, 0xE1, 0x25, 0xF1, 0x17, 0x18, 0x19, 0x1A, 0x26,
    0x27, 0x28, 0x29, 0x2A, 0x35, 0x36, 0x37, 0x38, 0x39, 0x3A, 0x43, 0x44,
    0x45, 0x46, 0x47, 0x48, 0x49, 0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58,
    0x59, 0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68, 0x69, 0x6A, 0x73, 0x74,
    0x75, 0x76, 0x77, 0x78, 0x79, 0x7A, 0x82, 0x83, 0x84, 0x85, 0x86, 0x87,
    0x88, 0x89, 0x8A, 0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A,
    0xA2, 0xA3, 0xA4, 0xA5, 0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4,
    0xB5, 0xB6, 0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7,
    0xC8, 0xC9, 0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA,
    0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF2, 0xF3, 0xF4,
    0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA,
]


def _build_codes(bits: list[int], vals: list[int]) -> dict[int, tuple[int, int]]:
    """symbol → (code, length) canonical Huffman assignment (T.81 C.2)."""
    out: dict[int, tuple[int, int]] = {}
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(bits[length]):
            out[vals[k]] = (code, length)
            code += 1
            k += 1
        code <<= 1
    return out


def _build_decode_map(bits: list[int], vals: list[int]) -> dict[tuple[int, int], int]:
    """(length, code) → symbol."""
    return {(l, c): s for s, (c, l) in _build_codes(bits, vals).items()}


# orthonormal DCT-II basis
_C = np.zeros((8, 8))
for _k in range(8):
    for _n in range(8):
        _C[_k, _n] = np.cos((2 * _n + 1) * _k * np.pi / 16.0) * (
            np.sqrt(0.125) if _k == 0 else 0.5
        )


def _quality_scale(table: np.ndarray, quality: int) -> np.ndarray:
    """IJG quality scaling."""
    quality = min(100, max(1, quality))
    scale = 5000 // quality if quality < 50 else 200 - quality * 2
    q = (table * scale + 50) // 100
    return np.clip(q, 1, 255).astype(np.int32)


# --------------------------------------------------------------------------
# Encoder
# --------------------------------------------------------------------------


class _BitWriter:
    def __init__(self):
        self.buf = bytearray()
        self.acc = 0
        self.nbits = 0

    def write(self, code: int, length: int):
        self.acc = (self.acc << length) | (code & ((1 << length) - 1))
        self.nbits += length
        while self.nbits >= 8:
            self.nbits -= 8
            b = (self.acc >> self.nbits) & 0xFF
            self.buf.append(b)
            if b == 0xFF:
                self.buf.append(0x00)  # byte stuffing

    def flush(self):
        if self.nbits:
            pad = 8 - self.nbits
            self.write((1 << pad) - 1, pad)  # pad with 1s


def _magnitude(v: int) -> tuple[int, int]:
    """(size, amplitude bits) per T.81 F.1.2.1."""
    if v == 0:
        return 0, 0
    a = abs(v)
    size = a.bit_length()
    bits = v if v > 0 else v + (1 << size) - 1
    return size, bits


def _encode_component(
    blocks: np.ndarray, qtab: np.ndarray, dc_codes, ac_codes, writer, dc_pred: int
) -> int:
    """Encode one component's 8×8 blocks (n, 8, 8), returns new DC pred."""
    q2d = qtab.reshape(8, 8)
    for blk in blocks:
        coeffs = _C @ (blk - 128.0) @ _C.T
        quant = np.round(coeffs / q2d).astype(np.int32)
        zz = quant.flatten()[ZIGZAG]
        # DC
        diff = int(zz[0]) - dc_pred
        dc_pred = int(zz[0])
        size, bits = _magnitude(diff)
        code, length = dc_codes[size]
        writer.write(code, length)
        if size:
            writer.write(bits, size)
        # AC
        run = 0
        last_nz = int(np.max(np.nonzero(zz)[0])) if np.any(zz[1:]) else 0
        for i in range(1, 64):
            v = int(zz[i])
            if v == 0:
                if i > last_nz:
                    break
                run += 1
                if run == 16:
                    code, length = ac_codes[0xF0]  # ZRL
                    writer.write(code, length)
                    run = 0
                continue
            size, bits = _magnitude(v)
            code, length = ac_codes[(run << 4) | size]
            writer.write(code, length)
            writer.write(bits, size)
            run = 0
        if last_nz < 63:
            code, length = ac_codes[0x00]  # EOB
            writer.write(code, length)
    return dc_pred


def _blocks_of(plane: np.ndarray) -> np.ndarray:
    """Pad to 8-multiples (edge replicate) and return (n, 8, 8) in raster
    block order."""
    h, w = plane.shape
    ph, pw = (h + 7) // 8 * 8, (w + 7) // 8 * 8
    padded = np.pad(plane.astype(np.float64), ((0, ph - h), (0, pw - w)), mode="edge")
    return (
        padded.reshape(ph // 8, 8, pw // 8, 8).transpose(0, 2, 1, 3).reshape(-1, 8, 8)
    )


def _dht_segment(tc_th: int, bits: list[int], vals: list[int]) -> bytes:
    payload = bytes([tc_th]) + bytes(bits[1:17]) + bytes(vals)
    return b"\xff\xc4" + struct.pack(">H", len(payload) + 2) + payload


def _dqt_segment(tq: int, table: np.ndarray) -> bytes:
    payload = bytes([tq]) + bytes(int(x) for x in table.flatten()[ZIGZAG])
    return b"\xff\xdb" + struct.pack(">H", len(payload) + 2) + payload


def jpeg_encode(arr: np.ndarray, quality: int = 90, subsample: bool = False) -> bytes:
    """Encode (H,W) grayscale or (H,W,3) RGB uint8 as baseline JPEG
    (Annex-K tables quality-scaled). ``subsample=True`` emits 4:2:0
    (2x2 luma blocks + mean-pooled chroma per MCU — the common camera
    layout, exercising the decoder's upsampling path)."""
    arr = np.asarray(arr, dtype=np.uint8)
    gray = arr.ndim == 2
    h, w = arr.shape[0], arr.shape[1]
    qy = _quality_scale(_Q_LUMA, quality).reshape(8, 8)
    qc = _quality_scale(_Q_CHROMA, quality).reshape(8, 8)

    out = bytearray(b"\xff\xd8")  # SOI
    out += _dqt_segment(0, qy)
    if not gray:
        out += _dqt_segment(1, qc)
    # SOF0
    ncomp = 1 if gray else 3
    sof = bytes([8]) + struct.pack(">HH", h, w) + bytes([ncomp])
    y_sampling = 0x22 if (subsample and not gray) else 0x11
    sof += bytes([1, y_sampling, 0])  # comp 1 sampling, qtable 0
    if not gray:
        sof += bytes([2, 0x11, 1]) + bytes([3, 0x11, 1])
    out += b"\xff\xc0" + struct.pack(">H", len(sof) + 2) + sof
    # DHT
    out += _dht_segment(0x00, _DC_LUMA_BITS, _DC_LUMA_VALS)
    out += _dht_segment(0x10, _AC_LUMA_BITS, _AC_LUMA_VALS)
    if not gray:
        out += _dht_segment(0x01, _DC_CHROMA_BITS, _DC_CHROMA_VALS)
        out += _dht_segment(0x11, _AC_CHROMA_BITS, _AC_CHROMA_VALS)
    # SOS
    sos = bytes([ncomp, 1, 0x00])
    if not gray:
        sos += bytes([2, 0x11, 3, 0x11])
    sos += bytes([0, 63, 0])
    out += b"\xff\xda" + struct.pack(">H", len(sos) + 2) + sos

    dc_y = _build_codes(_DC_LUMA_BITS, _DC_LUMA_VALS)
    ac_y = _build_codes(_AC_LUMA_BITS, _AC_LUMA_VALS)
    writer = _BitWriter()
    if gray:
        _encode_component(_blocks_of(arr), qy.flatten(), dc_y, ac_y, writer, 0)
    else:
        dc_c = _build_codes(_DC_CHROMA_BITS, _DC_CHROMA_VALS)
        ac_c = _build_codes(_AC_CHROMA_BITS, _AC_CHROMA_VALS)
        r = arr[:, :, 0].astype(np.float64)
        g = arr[:, :, 1].astype(np.float64)
        b = arr[:, :, 2].astype(np.float64)
        y = 0.299 * r + 0.587 * g + 0.114 * b
        cb = -0.168736 * r - 0.331264 * g + 0.5 * b + 128.0
        cr = 0.5 * r - 0.418688 * g - 0.081312 * b + 128.0
        q2y, q2c = qy.astype(np.float64), qc.astype(np.float64)
        if subsample:
            # 4:2:0: MCU = 2x2 luma blocks + one mean-pooled block each of
            # Cb/Cr; planes edge-padded to 16-multiples
            ph, pw = (h + 15) // 16 * 16, (w + 15) // 16 * 16
            yp = np.pad(y, ((0, ph - h), (0, pw - w)), mode="edge")
            cbp = np.pad(cb, ((0, ph - h), (0, pw - w)), mode="edge")
            crp = np.pad(cr, ((0, ph - h), (0, pw - w)), mode="edge")
            cb2 = cbp.reshape(ph // 2, 2, pw // 2, 2).mean(axis=(1, 3))
            cr2 = crp.reshape(ph // 2, 2, pw // 2, 2).mean(axis=(1, 3))
            py = pcb = pcr = 0
            for my in range(ph // 16):
                for mx in range(pw // 16):
                    for byi in range(2):
                        for bxi in range(2):
                            blk = yp[
                                my * 16 + byi * 8 : my * 16 + byi * 8 + 8,
                                mx * 16 + bxi * 8 : mx * 16 + bxi * 8 + 8,
                            ]
                            py = _encode_component(
                                blk[None, :, :], q2y, dc_y, ac_y, writer, py
                            )
                    cblk = cb2[my * 8 : my * 8 + 8, mx * 8 : mx * 8 + 8]
                    pcb = _encode_component(cblk[None, :, :], q2c, dc_c, ac_c, writer, pcb)
                    rblk = cr2[my * 8 : my * 8 + 8, mx * 8 : mx * 8 + 8]
                    pcr = _encode_component(rblk[None, :, :], q2c, dc_c, ac_c, writer, pcr)
        else:
            # 4:4:4 interleaved: one block of each component per MCU
            by, bcb, bcr = (_blocks_of(p) for p in (y, cb, cr))
            py = pcb = pcr = 0
            for i in range(len(by)):
                py = _encode_component(by[i : i + 1], q2y, dc_y, ac_y, writer, py)
                pcb = _encode_component(bcb[i : i + 1], q2c, dc_c, ac_c, writer, pcb)
                pcr = _encode_component(bcr[i : i + 1], q2c, dc_c, ac_c, writer, pcr)
    writer.flush()
    out += writer.buf
    out += b"\xff\xd9"  # EOI
    return bytes(out)


# --------------------------------------------------------------------------
# Decoder
# --------------------------------------------------------------------------


class _BitReader:
    """MSB-first bit reader over the entropy-coded segment with 0xFF00
    unstuffing; stops at markers (RSTn handled by the caller)."""

    def __init__(self, data: bytes, pos: int):
        self.data = data
        self.pos = pos
        self.acc = 0
        self.nbits = 0

    def _fill(self):
        d = self.data
        while self.nbits <= 24:
            if self.pos >= len(d):
                self.acc = (self.acc << 8) | 0
                self.nbits += 8
                continue
            b = d[self.pos]
            if b == 0xFF:
                nxt = d[self.pos + 1] if self.pos + 1 < len(d) else 0xD9
                if nxt == 0x00:
                    self.pos += 2
                else:
                    # marker: feed zeros (decoder loop handles RST/EOI)
                    self.acc = (self.acc << 8) | 0
                    self.nbits += 8
                    continue
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

    def align_to_marker(self):
        """Drop buffered bits and skip to just after the next RST marker."""
        self.acc = 0
        self.nbits = 0
        d = self.data
        while self.pos + 1 < len(d):
            if d[self.pos] == 0xFF and 0xD0 <= d[self.pos + 1] <= 0xD7:
                self.pos += 2
                return
            self.pos += 1


def _decode_huff(reader: _BitReader, table: dict[tuple[int, int], int]) -> int:
    code = 0
    for length in range(1, 17):
        code = (code << 1) | reader.read_bit()
        sym = table.get((length, code))
        if sym is not None:
            return sym
    raise JpegError("invalid Huffman code")


def _extend(bits: int, size: int) -> int:
    if size == 0:
        return 0
    return bits if bits >= (1 << (size - 1)) else bits - (1 << size) + 1


def jpeg_decode(data: bytes) -> np.ndarray:
    """Decode baseline JPEG to (H,W) uint8 (grayscale input) or (H,W,3)
    RGB. Raises JpegError on progressive/arithmetic/unsupported."""
    if not data.startswith(b"\xff\xd8"):
        raise JpegError("not a JPEG")
    pos = 2
    qtables: dict[int, np.ndarray] = {}
    htables: dict[int, dict] = {}
    frame = None
    restart_interval = 0
    coefs = None  # progressive: per-component zigzag coefficient store
    n = len(data)
    while pos + 4 <= n:
        if data[pos] != 0xFF:
            pos += 1
            continue
        marker = data[pos + 1]
        if marker in (0x01,) or 0xD0 <= marker <= 0xD7:
            pos += 2
            continue
        (seglen,) = struct.unpack(">H", data[pos + 2 : pos + 4])
        seg = data[pos + 4 : pos + 2 + seglen]
        if marker == 0xDB:  # DQT
            o = 0
            while o < len(seg):
                pq, tq = seg[o] >> 4, seg[o] & 0xF
                o += 1
                if pq:
                    raise JpegError("16-bit quant tables unsupported")
                t = np.zeros(64, dtype=np.int32)
                t[ZIGZAG] = np.frombuffer(seg[o : o + 64], dtype=np.uint8)
                qtables[tq] = t.reshape(8, 8)
                o += 64
        elif marker == 0xC4:  # DHT
            o = 0
            while o < len(seg):
                tc_th = seg[o]
                bits = [0] + list(seg[o + 1 : o + 17])
                nv = sum(bits)
                vals = list(seg[o + 17 : o + 17 + nv])
                htables[tc_th] = _build_decode_map(bits, vals)
                o += 17 + nv
        elif marker in (0xC0, 0xC1, 0xC2):  # SOF0/1 baseline, SOF2 progressive
            prec = seg[0]
            if prec != 8:
                raise JpegError(f"{prec}-bit precision unsupported")
            h, w = struct.unpack(">HH", seg[1:5])
            ncomp = seg[5]
            comps = []
            for i in range(ncomp):
                cid, hv, tq = seg[6 + 3 * i : 9 + 3 * i]
                comps.append({"id": cid, "h": hv >> 4, "v": hv & 0xF, "tq": tq})
            frame = {"h": h, "w": w, "comps": comps, "progressive": marker == 0xC2}
        elif marker in (0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF):
            raise JpegError("only baseline and progressive DCT JPEG supported")
        elif marker == 0xDD:  # DRI
            (restart_interval,) = struct.unpack(">H", seg[:2])
        elif marker == 0xDA:  # SOS
            if frame is None:
                raise JpegError("SOS before SOF")
            ns = seg[0]
            scan = []
            for i in range(ns):
                cs, tdta = seg[1 + 2 * i : 3 + 2 * i]
                comp = next(c for c in frame["comps"] if c["id"] == cs)
                scan.append({**comp, "td": tdta >> 4, "ta": tdta & 0xF})
            if not frame["progressive"]:
                return _decode_scan(
                    data, pos + 2 + seglen, frame, scan, qtables, htables,
                    restart_interval,
                )
            ss, se = seg[1 + 2 * ns], seg[2 + 2 * ns]
            ahal = seg[3 + 2 * ns]
            if coefs is None:
                coefs = _alloc_coefs(frame)
            pos = _decode_scan_prog(
                data, pos + 2 + seglen, frame, scan, htables, coefs,
                ss, se, ahal >> 4, ahal & 0xF, restart_interval,
            )
            continue
        elif marker == 0xD9:
            break
        pos += 2 + seglen
    if coefs is not None:
        return _finish_progressive(frame, coefs, qtables)
    raise JpegError("no scan found")


def _decode_scan(data, pos, frame, scan, qtables, htables, restart_interval):
    h, w = frame["h"], frame["w"]
    hmax = max(c["h"] for c in scan)
    vmax = max(c["v"] for c in scan)
    mcux = (w + 8 * hmax - 1) // (8 * hmax)
    mcuy = (h + 8 * vmax - 1) // (8 * vmax)
    planes = {}
    for c in scan:
        pw, ph = mcux * 8 * c["h"], mcuy * 8 * c["v"]
        planes[c["id"]] = np.zeros((ph, pw), dtype=np.float64)
    reader = _BitReader(data, pos)
    preds = {c["id"]: 0 for c in scan}
    mcu_count = 0
    for my in range(mcuy):
        for mx in range(mcux):
            if restart_interval and mcu_count and mcu_count % restart_interval == 0:
                reader.align_to_marker()
                preds = {c["id"]: 0 for c in scan}
            for c in scan:
                dc_tab = htables.get(0x00 | c["td"])
                ac_tab = htables.get(0x10 | c["ta"])
                q = qtables[c["tq"]].astype(np.float64)
                for by in range(c["v"]):
                    for bx in range(c["h"]):
                        zz = np.zeros(64, dtype=np.float64)
                        size = _decode_huff(reader, dc_tab)
                        diff = _extend(reader.read_bits(size), size) if size else 0
                        preds[c["id"]] += diff
                        zz[0] = preds[c["id"]]
                        i = 1
                        while i < 64:
                            sym = _decode_huff(reader, ac_tab)
                            if sym == 0x00:  # EOB
                                break
                            if sym == 0xF0:  # ZRL
                                i += 16
                                continue
                            run, size = sym >> 4, sym & 0xF
                            i += run
                            if i > 63:
                                raise JpegError("AC coefficient overflow")
                            zz[i] = _extend(reader.read_bits(size), size)
                            i += 1
                        blk = np.zeros(64, dtype=np.float64)
                        blk[ZIGZAG] = zz
                        coeffs = blk.reshape(8, 8) * q
                        pix = _C.T @ coeffs @ _C + 128.0
                        y0 = (my * c["v"] + by) * 8
                        x0 = (mx * c["h"] + bx) * 8
                        planes[c["id"]][y0 : y0 + 8, x0 : x0 + 8] = pix
            mcu_count += 1

    return _assemble_image(frame, scan, planes)


def _assemble_image(frame, comps, planes):
    """Crop component planes to subsampled sizes, upsample to full
    resolution, and color-convert — shared by the baseline one-shot scan
    and the progressive multi-scan finish."""
    h, w = frame["h"], frame["w"]
    hmax = max(c["h"] for c in comps)
    vmax = max(c["v"] for c in comps)
    out_planes = []
    for c in comps:
        cw = (w * c["h"] + hmax - 1) // hmax
        ch = (h * c["v"] + vmax - 1) // vmax
        p = planes[c["id"]][:ch, :cw]
        if c["h"] != hmax or c["v"] != vmax:
            p = np.repeat(np.repeat(p, vmax // c["v"], axis=0), hmax // c["h"], axis=1)
            p = p[:h, :w]
        else:
            p = p[:h, :w]
        out_planes.append(p)
    if len(out_planes) == 1:
        return np.clip(np.round(out_planes[0]), 0, 255).astype(np.uint8)
    if len(out_planes) != 3:
        raise JpegError(f"{len(out_planes)}-component scans unsupported")
    y, cb, cr = out_planes
    r = y + 1.402 * (cr - 128.0)
    g = y - 0.344136 * (cb - 128.0) - 0.714136 * (cr - 128.0)
    b = y + 1.772 * (cb - 128.0)
    return np.clip(np.round(np.stack([r, g, b], axis=2)), 0, 255).astype(np.uint8)


# --------------------------------------------------------------------------
# Progressive decoding (T.81 G.1.2): scans accumulate quantized
# coefficients per component; IDCT happens once at the end.
# --------------------------------------------------------------------------


def _frame_geometry(frame):
    hmax = max(c["h"] for c in frame["comps"])
    vmax = max(c["v"] for c in frame["comps"])
    mcux = (frame["w"] + 8 * hmax - 1) // (8 * hmax)
    mcuy = (frame["h"] + 8 * vmax - 1) // (8 * vmax)
    return hmax, vmax, mcux, mcuy


def _alloc_coefs(frame):
    """Zigzag-order coefficient planes, one (block_rows, block_cols, 64)
    int32 array per component, padded to the interleaved MCU grid (a
    superset of the non-interleaved grid, so every scan type fits)."""
    hmax, vmax, mcux, mcuy = _frame_geometry(frame)
    return {
        c["id"]: np.zeros((mcuy * c["v"], mcux * c["h"], 64), dtype=np.int32)
        for c in frame["comps"]
    }


def _next_marker_pos(data: bytes, pos: int) -> int:
    """First real marker (not stuffing, not RSTn) at/after ``pos``."""
    n = len(data)
    while pos + 1 < n:
        if data[pos] == 0xFF:
            nxt = data[pos + 1]
            if nxt == 0x00 or 0xD0 <= nxt <= 0xD7:
                pos += 2
                continue
            return pos
        pos += 1
    return n


def _noninterleaved_blocks(frame, c):
    """Block-grid dims for a single-component (non-interleaved) scan:
    ceil(component size / 8) per T.81 A.2.2."""
    hmax, vmax, _, _ = _frame_geometry(frame)
    cw = (frame["w"] * c["h"] + hmax - 1) // hmax
    ch = (frame["h"] * c["v"] + vmax - 1) // vmax
    return (ch + 7) // 8, (cw + 7) // 8


def _decode_scan_prog(
    data, pos, frame, scan, htables, coefs, ss, se, ah, al, restart_interval
):
    """One progressive scan: DC first / DC refine (interleaved or not) or
    AC first / AC refine (always single-component per T.81 G.1.1.1.1).
    Mutates ``coefs`` in place; returns the position of the next marker."""
    reader = _BitReader(data, pos)
    state = {"eobrun": 0, "preds": {c["id"]: 0 for c in scan}}

    def _restart():
        reader.align_to_marker()
        state["eobrun"] = 0
        state["preds"] = {c["id"]: 0 for c in scan}

    if ss == 0:
        if se != 0:
            raise JpegError("progressive scan mixes DC and AC")
        if len(scan) > 1:  # interleaved MCU walk
            hmax, vmax, mcux, mcuy = _frame_geometry(frame)
            unit = 0
            for my in range(mcuy):
                for mx in range(mcux):
                    if restart_interval and unit and unit % restart_interval == 0:
                        _restart()
                    for c in scan:
                        for by in range(c["v"]):
                            for bx in range(c["h"]):
                                blk = coefs[c["id"]][my * c["v"] + by, mx * c["h"] + bx]
                                _dc_prog_block(reader, htables, c, blk, ah, al, state)
                    unit += 1
        else:  # single-component DC scan: walk the component's own grid
            c = scan[0]
            bh, bw = _noninterleaved_blocks(frame, c)
            unit = 0
            for byy in range(bh):
                for bxx in range(bw):
                    if restart_interval and unit and unit % restart_interval == 0:
                        _restart()
                    _dc_prog_block(
                        reader, htables, c, coefs[c["id"]][byy, bxx], ah, al, state
                    )
                    unit += 1
    else:
        if len(scan) != 1:
            raise JpegError("progressive AC scan must be non-interleaved")
        c = scan[0]
        bh, bw = _noninterleaved_blocks(frame, c)
        ac_tab = htables.get(0x10 | c["ta"])
        unit = 0
        for byy in range(bh):
            for bxx in range(bw):
                if restart_interval and unit and unit % restart_interval == 0:
                    _restart()
                blk = coefs[c["id"]][byy, bxx]
                if ah == 0:
                    _ac_first_block(reader, ac_tab, blk, ss, se, al, state)
                else:
                    _ac_refine_block(reader, ac_tab, blk, ss, se, al, state)
                unit += 1
    return _next_marker_pos(data, reader.pos)


def _dc_prog_block(reader, htables, c, blk, ah, al, state):
    if ah == 0:  # first scan: Huffman diff in the point-transformed domain
        dc_tab = htables.get(0x00 | c["td"])
        size = _decode_huff(reader, dc_tab)
        diff = _extend(reader.read_bits(size), size) if size else 0
        state["preds"][c["id"]] += diff
        blk[0] = state["preds"][c["id"]] << al
    else:  # refinement: one raw bit per block
        if reader.read_bit():
            blk[0] |= 1 << al


def _ac_first_block(reader, ac_tab, blk, ss, se, al, state):
    if state["eobrun"] > 0:
        state["eobrun"] -= 1
        return
    k = ss
    while k <= se:
        sym = _decode_huff(reader, ac_tab)
        r, s = sym >> 4, sym & 0xF
        if s:
            k += r
            if k > se:
                raise JpegError("AC coefficient overflow")
            blk[k] = _extend(reader.read_bits(s), s) << al
            k += 1
        else:
            if r != 15:
                state["eobrun"] = (1 << r) - 1
                if r:
                    state["eobrun"] += reader.read_bits(r)
                return
            k += 16  # ZRL
    return


def _ac_refine_block(reader, ac_tab, blk, ss, se, al, state):
    """T.81 G.1.2.3 / the classic refinement walk: newly-nonzero
    coefficients arrive with runs counted over ZERO-HISTORY positions
    only; already-nonzero coefficients passed over receive one correction
    bit each; EOB runs cover whole blocks but still carry correction
    bits for their nonzero coefficients."""
    p1, m1 = 1 << al, -1 << al

    def correct(k):
        if reader.read_bit() and not (blk[k] & p1):
            blk[k] += p1 if blk[k] > 0 else m1

    k = ss
    if state["eobrun"] == 0:
        while k <= se:
            sym = _decode_huff(reader, ac_tab)
            r, s = sym >> 4, sym & 0xF
            newval = 0
            if s:
                if s != 1:
                    raise JpegError("invalid refinement magnitude")
                newval = p1 if reader.read_bit() else m1
            else:
                if r != 15:
                    state["eobrun"] = 1 << r
                    if r:
                        state["eobrun"] += reader.read_bits(r)
                    break  # rest of band handled by the EOB sweep below
                # r == 15: ZRL — skip 16 zero-history positions
            while k <= se:
                if blk[k] != 0:
                    correct(k)
                else:
                    if r == 0:
                        break
                    r -= 1
                k += 1
            if newval and k <= se:
                blk[k] = newval
            k += 1
    if state["eobrun"] > 0:
        while k <= se:  # EOB-covered remainder: correction bits only
            if blk[k] != 0:
                correct(k)
            k += 1
        state["eobrun"] -= 1


def _finish_progressive(frame, coefs, qtables):
    """Dequantize + IDCT every component's accumulated coefficients and
    assemble (vectorized over all blocks at once)."""
    planes = {}
    for c in frame["comps"]:
        zz = coefs[c["id"]]
        bh, bw = zz.shape[0], zz.shape[1]
        nat = np.zeros((bh, bw, 64), dtype=np.float64)
        nat[:, :, ZIGZAG] = zz
        q = qtables[c["tq"]].astype(np.float64).reshape(64)
        blocks = (nat * q).reshape(bh, bw, 8, 8)
        # per-block 2-D matmuls in the baseline's exact association order
        # ((_C.T @ coeffs) @ _C): batched/einsum contractions use different
        # BLAS summation orders and flip borderline-.5 pixels by one
        pix = np.empty_like(blocks)
        for iy in range(bh):
            for ix in range(bw):
                pix[iy, ix] = _C.T @ blocks[iy, ix] @ _C
        pix += 128.0
        planes[c["id"]] = pix.transpose(0, 2, 1, 3).reshape(bh * 8, bw * 8)
    return _assemble_image(frame, frame["comps"], planes)


# --------------------------------------------------------------------------
# Progressive encoder (SOF2) — fixture generator whose dequantized
# coefficients are bit-identical to the baseline encoder's, so the
# progressive decoder is testable by exact equality against baseline.
# --------------------------------------------------------------------------

# Flat custom Huffman tables valid for EVERY progressive scan: unlike the
# Annex-K baseline tables they include the EOBn symbols (r<<4, size 0) that
# progressive AC scans require. All symbols sit at one code length (the
# all-ones code stays unused per T.81 C.2) — compression ratio is not the
# point of a fixture encoder, validity and coverage are.
_PROG_DC_BITS = [0] * 17
_PROG_DC_BITS[4] = 14
_PROG_DC_VALS = list(range(14))
_PROG_AC_VALS = (
    [n << 4 for n in range(15)]           # EOB0..EOB14
    + [0xF0]                               # ZRL
    + [(r << 4) | s for r in range(16) for s in range(1, 14)]
)
_PROG_AC_BITS = [0] * 17
_PROG_AC_BITS[8] = len(_PROG_AC_VALS)  # 224 symbols, 2^8=256 codes


def _quantized_zigzag(plane: np.ndarray, q2d: np.ndarray) -> np.ndarray:
    """(n_blocks, 64) zigzag-ordered quantized coefficients — the same
    DCT/round pipeline as the baseline `_encode_component`, vectorized."""
    blocks = _blocks_of(plane)
    # per-block matmuls in the baseline encoder's exact association order:
    # batched/einsum contractions sum in a different order and can flip a
    # borderline-.5 quantization, breaking coefficient-exact parity
    out = np.empty((len(blocks), 64), dtype=np.int32)
    for i, blk in enumerate(blocks):
        coeffs = _C @ (blk - 128.0) @ _C.T
        out[i] = np.round(coeffs / q2d).astype(np.int32).reshape(64)[ZIGZAG]
    return out


def _pt_ac(v: int, al: int) -> int:
    """AC point transform: magnitude shift with truncation toward zero
    (T.81 G.1.2.2) — NOT an arithmetic shift for negatives."""
    return v >> al if v >= 0 else -((-v) >> al)


def _emit_eobrun(writer: "_BitWriter", ac_codes, st: dict) -> None:
    if st["eobrun"] > 0:
        nbits = st["eobrun"].bit_length() - 1
        code, length = ac_codes[nbits << 4]
        writer.write(code, length)
        if nbits:
            writer.write(st["eobrun"] - (1 << nbits), nbits)
        for b in st["pending"]:
            writer.write(b, 1)
        st["eobrun"] = 0
        st["pending"] = []


def _encode_dc_scan_prog(writer, dc_codes, comps_zz, al, refine: bool):
    """Interleaved (or single-component) DC scan. First pass: Huffman diff
    coding in the >>Al domain (arithmetic shift per T.81 for DC); refine:
    one raw bit per block, the next lower bit of the two's-complement."""
    n = len(comps_zz[0])
    preds = [0] * len(comps_zz)
    for i in range(n):
        for ci, zz in enumerate(comps_zz):
            v = int(zz[i, 0])
            if refine:
                writer.write((v >> al) & 1, 1)
                continue
            t = v >> al
            diff = t - preds[ci]
            preds[ci] = t
            size, bits = _magnitude(diff)
            code, length = dc_codes[size]
            writer.write(code, length)
            if size:
                writer.write(bits, size)


def _encode_ac_first(writer, ac_codes, zz, ss, se, al):
    """AC first scan over band [ss, se]: baseline-style run/size coding of
    the point-transformed coefficients plus EOB-run accumulation across
    all-zero bands."""
    st = {"eobrun": 0, "pending": []}
    for i in range(len(zz)):
        band = [_pt_ac(int(zz[i, k]), al) for k in range(ss, se + 1)]
        nz = [j for j, v in enumerate(band) if v]
        if not nz:
            st["eobrun"] += 1
            if st["eobrun"] == 0x7FFF:
                _emit_eobrun(writer, ac_codes, st)
            continue
        _emit_eobrun(writer, ac_codes, st)
        run = 0
        last = nz[-1]
        for j in range(last + 1):
            v = band[j]
            if v == 0:
                run += 1
                if run == 16:
                    code, length = ac_codes[0xF0]
                    writer.write(code, length)
                    run = 0
                continue
            size, bits = _magnitude(v)
            code, length = ac_codes[(run << 4) | size]
            writer.write(code, length)
            writer.write(bits, size)
            run = 0
        if last < se - ss:
            st["eobrun"] += 1
    _emit_eobrun(writer, ac_codes, st)


def _encode_ac_refine(writer, ac_codes, zz, ss, se, al):
    """AC refinement scan (T.81 G.1.2.3): newly-nonzero coefficients coded
    with zero-history run lengths + sign bit; already-nonzero coefficients
    contribute buffered correction bits; trailing zero bands fold into EOB
    runs that carry their correction bits."""
    st = {"eobrun": 0, "pending": []}
    for i in range(len(zz)):
        band = zz[i, ss : se + 1]
        absv = [abs(int(v)) >> al for v in band]
        eobj = max((j for j, t in enumerate(absv) if t == 1), default=-1)
        r = 0
        br: list[int] = []
        for j, t in enumerate(absv):
            if t == 0:
                r += 1
                continue
            while r > 15 and j <= eobj:
                _emit_eobrun(writer, ac_codes, st)
                code, length = ac_codes[0xF0]
                writer.write(code, length)
                r -= 16
                for b in br:
                    writer.write(b, 1)
                br = []
            if t > 1:  # nonzero history: correction bit, buffered
                br.append(t & 1)
                continue
            # t == 1: newly nonzero this scan
            _emit_eobrun(writer, ac_codes, st)
            code, length = ac_codes[(r << 4) | 1]
            writer.write(code, length)
            writer.write(1 if int(band[j]) >= 0 else 0, 1)
            for b in br:
                writer.write(b, 1)
            br = []
            r = 0
        if r > 0 or br:
            st["eobrun"] += 1
            st["pending"].extend(br)
            if st["eobrun"] == 0x7FFF:
                _emit_eobrun(writer, ac_codes, st)
    _emit_eobrun(writer, ac_codes, st)


def jpeg_encode_progressive(arr: np.ndarray, quality: int = 90) -> bytes:
    """Encode (H,W) grayscale or (H,W,3) RGB uint8 as progressive JPEG
    (SOF2, 4:4:4). Scan script exercises every decode mode: interleaved DC
    first (Al=1) + DC refine, then per-component AC first with the luma
    spectrum split in two bands (spectral selection) at Al=1, then the
    matching AC refinement scans — i.e. successive approximation AND
    spectral selection, with EOB runs throughout."""
    arr = np.asarray(arr, dtype=np.uint8)
    gray = arr.ndim == 2
    h, w = arr.shape[0], arr.shape[1]
    qy = _quality_scale(_Q_LUMA, quality).reshape(8, 8)
    qc = _quality_scale(_Q_CHROMA, quality).reshape(8, 8)
    ncomp = 1 if gray else 3

    out = bytearray(b"\xff\xd8")
    out += _dqt_segment(0, qy)
    if not gray:
        out += _dqt_segment(1, qc)
    sof = bytes([8]) + struct.pack(">HH", h, w) + bytes([ncomp])
    sof += bytes([1, 0x11, 0])
    if not gray:
        sof += bytes([2, 0x11, 1]) + bytes([3, 0x11, 1])
    out += b"\xff\xc2" + struct.pack(">H", len(sof) + 2) + sof
    out += _dht_segment(0x00, _PROG_DC_BITS, _PROG_DC_VALS)
    out += _dht_segment(0x10, _PROG_AC_BITS, _PROG_AC_VALS)
    dc_codes = _build_codes(_PROG_DC_BITS, _PROG_DC_VALS)
    ac_codes = _build_codes(_PROG_AC_BITS, _PROG_AC_VALS)

    if gray:
        comps = [_quantized_zigzag(arr.astype(np.float64), qy.astype(np.float64))]
    else:
        r = arr[:, :, 0].astype(np.float64)
        g = arr[:, :, 1].astype(np.float64)
        b = arr[:, :, 2].astype(np.float64)
        y = 0.299 * r + 0.587 * g + 0.114 * b
        cb = -0.168736 * r - 0.331264 * g + 0.5 * b + 128.0
        cr = 0.5 * r - 0.418688 * g - 0.081312 * b + 128.0
        q2y, q2c = qy.astype(np.float64), qc.astype(np.float64)
        comps = [
            _quantized_zigzag(y, q2y),
            _quantized_zigzag(cb, q2c),
            _quantized_zigzag(cr, q2c),
        ]

    def emit_scan(fn, comp_list, ss, se, ah, al):
        sos = bytes([len(comp_list)])
        for ci in comp_list:
            sos += bytes([ci + 1, 0x00])
        sos += bytes([ss, se, (ah << 4) | al])
        out.extend(b"\xff\xda" + struct.pack(">H", len(sos) + 2) + sos)
        writer = _BitWriter()
        fn(writer)
        writer.flush()
        out.extend(writer.buf)

    AL = 1
    all_comps = list(range(ncomp))
    emit_scan(
        lambda W: _encode_dc_scan_prog(W, dc_codes, comps, AL, False),
        all_comps, 0, 0, 0, AL,
    )
    emit_scan(
        lambda W: _encode_dc_scan_prog(W, dc_codes, comps, 0, True),
        all_comps, 0, 0, AL, 0,
    )
    for ci in all_comps:
        for ss, se in ([(1, 5), (6, 63)] if ci == 0 else [(1, 63)]):
            emit_scan(
                lambda W, ci=ci, ss=ss, se=se: _encode_ac_first(
                    W, ac_codes, comps[ci], ss, se, AL
                ),
                [ci], ss, se, 0, AL,
            )
    for ci in all_comps:
        for ss, se in ([(1, 5), (6, 63)] if ci == 0 else [(1, 63)]):
            emit_scan(
                lambda W, ci=ci, ss=ss, se=se: _encode_ac_refine(
                    W, ac_codes, comps[ci], ss, se, 0
                ),
                [ci], ss, se, AL, 0,
            )
    out += b"\xff\xd9"
    return bytes(out)
