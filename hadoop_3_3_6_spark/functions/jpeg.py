"""Baseline JPEG (JFIF) codec — pure numpy, implementing the PUBLIC
ITU-T T.81 specification (baseline sequential DCT, Huffman entropy
coding, Annex K reference tables).  No library code is translated;
like the PNG/WAV/Y4M codecs in ``multimodal.py`` this exists so the
distributed media pipeline exercises a REAL lossy-image path in an
environment without PIL/opencv (reference media-through-MR pattern:
hadoop-streaming binary payload jobs, HT/hadoop-streaming/.../
StreamJob.java:1).

Scope (documented): baseline DCT only — 8-bit samples, Huffman coding,
1x1/2x1/1x2/2x2 sampling factors, restart intervals on decode.  No
progressive mode, no arithmetic coding, no 12-bit.  The encoder always
emits 4:4:4 with the Annex K tables; the decoder handles subsampled
streams from other baseline encoders too.

Validation: encoder→decoder roundtrip PSNR on structured images plus
marker-level structural asserts (tests/test_jpeg.py).  External
conformance against libjpeg requires PIL, absent here — the wire
format follows the spec text (marker layout per B.2, entropy coding
per F.1.2, byte stuffing per F.1.2.3).
"""

from __future__ import annotations

import struct

import numpy as np

# --- DCT ------------------------------------------------------------------

_A = np.zeros((8, 8))
for _u in range(8):
    _c = np.sqrt(0.5) if _u == 0 else 1.0
    for _x in range(8):
        _A[_u, _x] = 0.5 * _c * np.cos((2 * _x + 1) * _u * np.pi / 16)


def _fdct(block: np.ndarray) -> np.ndarray:
    return _A @ block @ _A.T


def _idct(coef: np.ndarray) -> np.ndarray:
    return _A.T @ coef @ _A


# --- Annex K reference tables (public spec constants) ---------------------

QUANT_LUMA = np.array([
    16, 11, 10, 16, 24, 40, 51, 61,
    12, 12, 14, 19, 26, 58, 60, 55,
    14, 13, 16, 24, 40, 57, 69, 56,
    14, 17, 22, 29, 51, 87, 80, 62,
    18, 22, 37, 56, 68, 109, 103, 77,
    24, 35, 55, 64, 81, 104, 113, 92,
    49, 64, 78, 87, 103, 121, 120, 101,
    72, 92, 95, 98, 112, 100, 103, 99,
]).reshape(8, 8)

QUANT_CHROMA = np.array([
    17, 18, 24, 47, 99, 99, 99, 99,
    18, 21, 26, 66, 99, 99, 99, 99,
    24, 26, 56, 99, 99, 99, 99, 99,
    47, 66, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
]).reshape(8, 8)

# zigzag index order (spec figure 5): _ZIGZAG[k] = (row, col) of the
# k-th coefficient in scan order
_ZZ = sorted(((r, c) for r in range(8) for c in range(8)),
             key=lambda rc: (rc[0] + rc[1], rc[0] if (rc[0] + rc[1]) % 2 else rc[1]))
_ZZ_ROWS = np.array([r for r, _ in _ZZ])
_ZZ_COLS = np.array([c for _, c in _ZZ])

# Annex K.3 Huffman specifications: (bits[1..16], huffval)
DC_LUMA_BITS = [0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0]
DC_LUMA_VALS = list(range(12))
DC_CHROMA_BITS = [0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0]
DC_CHROMA_VALS = list(range(12))
AC_LUMA_BITS = [0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D]
AC_LUMA_VALS = [
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
AC_CHROMA_BITS = [0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 0x77]
AC_CHROMA_VALS = [
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


def _canonical_codes(bits: list[int], vals: list[int]) -> dict[int, tuple[int, int]]:
    """symbol -> (code, length) per the spec's canonical assignment
    (C.2: codes of each length assigned in huffval order)."""
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


def _decode_table(bits: list[int], vals: list[int]) -> dict[tuple[int, int], int]:
    """(length, code) -> symbol for the decoder."""
    return {(ln, c): s for s, (c, ln) in _canonical_codes(bits, vals).items()}


# --- bit I/O --------------------------------------------------------------


class _BitWriter:
    def __init__(self):
        self.buf = bytearray()
        self.acc = 0
        self.nbits = 0

    def write(self, code: int, length: int) -> None:
        self.acc = (self.acc << length) | (code & ((1 << length) - 1))
        self.nbits += length
        while self.nbits >= 8:
            self.nbits -= 8
            byte = (self.acc >> self.nbits) & 0xFF
            self.buf.append(byte)
            if byte == 0xFF:  # byte stuffing (F.1.2.3)
                self.buf.append(0x00)

    def flush(self) -> bytes:
        if self.nbits:
            pad = 8 - self.nbits
            self.write((1 << pad) - 1, pad)  # pad with 1-bits per spec
        return bytes(self.buf)


class _BitReader:
    def __init__(self, data: bytes):
        self.data = data
        self.pos = 0
        self.acc = 0
        self.nbits = 0

    def _fill(self) -> None:
        while self.nbits <= 24:
            if self.pos >= len(self.data):
                self.acc = (self.acc << 8) | 0xFF  # pad past end
                self.nbits += 8
                continue
            b = self.data[self.pos]
            if b == 0xFF:
                nxt = self.data[self.pos + 1] if self.pos + 1 < len(self.data) else 0xD9
                if nxt == 0x00:
                    self.pos += 2  # stuffed FF
                elif 0xD0 <= nxt <= 0xD7:
                    break  # restart marker: leave for sync()
                else:
                    break  # EOI or next segment
            else:
                self.pos += 1
            self.acc = (self.acc << 8) | b
            self.nbits += 8

    def read_bit(self) -> int:
        if self.nbits == 0:
            self._fill()
            if self.nbits == 0:
                return 1
        self.nbits -= 1
        return (self.acc >> self.nbits) & 1

    def receive(self, n: int) -> int:
        v = 0
        for _ in range(n):
            v = (v << 1) | self.read_bit()
        return v

    def sync_restart(self) -> None:
        """Drop pad bits and consume an RSTn marker (E.2.4)."""
        self.acc = 0
        self.nbits = 0
        while self.pos + 1 < len(self.data):
            if self.data[self.pos] == 0xFF and 0xD0 <= self.data[self.pos + 1] <= 0xD7:
                self.pos += 2
                return
            self.pos += 1


def _huff_decode(reader: _BitReader, table: dict[tuple[int, int], int]) -> int:
    code = 0
    for length in range(1, 17):
        code = (code << 1) | reader.read_bit()
        sym = table.get((length, code))
        if sym is not None:
            return sym
    raise ValueError("invalid Huffman code")


def _extend(v: int, t: int) -> int:
    """DIFF/coefficient sign extension (spec F.2.2.1 EXTEND)."""
    return v - (1 << t) + 1 if t and v < (1 << (t - 1)) else v


def _category(v: int) -> int:
    return int(v).bit_length() if v >= 0 else int(-v).bit_length()


# --- encoder --------------------------------------------------------------


def _rgb_to_ycbcr(arr: np.ndarray) -> np.ndarray:
    a = arr.astype(np.float64)
    r, g, b = a[..., 0], a[..., 1], a[..., 2]
    return np.stack([
        0.299 * r + 0.587 * g + 0.114 * b,
        -0.168736 * r - 0.331264 * g + 0.5 * b + 128.0,
        0.5 * r - 0.418688 * g - 0.081312 * b + 128.0,
    ], axis=-1)


def _ycbcr_to_rgb(y: np.ndarray, cb: np.ndarray, cr: np.ndarray) -> np.ndarray:
    r = y + 1.402 * (cr - 128.0)
    g = y - 0.344136 * (cb - 128.0) - 0.714136 * (cr - 128.0)
    b = y + 1.772 * (cb - 128.0)
    return np.clip(np.stack([r, g, b], axis=-1).round(), 0, 255).astype(np.uint8)


def _scaled_quant(table: np.ndarray, quality: int) -> np.ndarray:
    """IJG-published quality scaling of the Annex K tables."""
    quality = min(100, max(1, quality))
    scale = 5000 // quality if quality < 50 else 200 - 2 * quality
    q = (table * scale + 50) // 100
    return np.clip(q, 1, 255).astype(np.int32)


def _encode_block(coefs: np.ndarray, dc_codes, ac_codes, pred: int, w: _BitWriter) -> int:
    zz = coefs[_ZZ_ROWS, _ZZ_COLS].astype(int)
    diff = int(zz[0]) - pred
    t = _category(diff)
    code, ln = dc_codes[t]
    w.write(code, ln)
    if t:
        w.write(diff if diff >= 0 else diff + (1 << t) - 1, t)
    run = 0
    last_nz = max((k for k in range(1, 64) if zz[k]), default=0)
    for k in range(1, last_nz + 1):
        v = int(zz[k])
        if v == 0:
            run += 1
            continue
        while run > 15:
            code, ln = ac_codes[0xF0]  # ZRL
            w.write(code, ln)
            run -= 16
        t = _category(v)
        code, ln = ac_codes[(run << 4) | t]
        w.write(code, ln)
        w.write(v if v >= 0 else v + (1 << t) - 1, t)
        run = 0
    if last_nz < 63:
        code, ln = ac_codes[0x00]  # EOB
        w.write(code, ln)
    return int(zz[0])


def encode_jpeg(
    arr: np.ndarray,
    quality: int = 85,
    subsampling: str = "444",
    restart_interval: int = 0,
    grayscale: bool = False,
) -> bytes:
    """Encode an (h, w, 3) uint8 RGB array as a baseline JFIF JPEG
    (Annex K Huffman tables, quality-scaled Annex K quant tables).

    ``subsampling``: "444" (one block per component per MCU) or "420"
    (2x2 luma blocks + one block each for 2x2-mean-downsampled
    chroma).  ``restart_interval``: emit a DRI marker and RSTn markers
    every N MCUs (0 = none) — the error-resilience feature long scans
    use; also exercises the decoder's restart resync path.
    ``grayscale``: encode the luma plane only (1-component frame)."""
    if subsampling not in ("444", "420"):
        raise ValueError("subsampling must be '444' or '420'")
    h, w = arr.shape[:2]
    ycc = _rgb_to_ycbcr(arr)
    qy, qc = _scaled_quant(QUANT_LUMA, quality), _scaled_quant(QUANT_CHROMA, quality)
    dc_l = _canonical_codes(DC_LUMA_BITS, DC_LUMA_VALS)
    dc_c = _canonical_codes(DC_CHROMA_BITS, DC_CHROMA_VALS)
    ac_l = _canonical_codes(AC_LUMA_BITS, AC_LUMA_VALS)
    ac_c = _canonical_codes(AC_CHROMA_BITS, AC_CHROMA_VALS)

    if grayscale:
        mcu = 8
        ycc = np.pad(ycc, ((0, -h % 8), (0, -w % 8), (0, 0)), mode="edge")
        planes = [ycc[..., 0]]
        layout = [(0, 1, 1)]
        samp = [0x11]
    elif subsampling == "444":
        mcu = 8
        ycc = np.pad(ycc, ((0, -h % 8), (0, -w % 8), (0, 0)), mode="edge")
        planes = [ycc[..., 0], ycc[..., 1], ycc[..., 2]]
        layout = [(0, 1, 1), (1, 1, 1), (2, 1, 1)]  # (plane, hsamp, vsamp)
        samp = [0x11, 0x11, 0x11]
    else:
        mcu = 16
        ycc = np.pad(ycc, ((0, -h % 16), (0, -w % 16), (0, 0)), mode="edge")
        y = ycc[..., 0]
        # 2x2 mean downsample for chroma
        cb = ycc[..., 1].reshape(ycc.shape[0] // 2, 2, ycc.shape[1] // 2, 2).mean(axis=(1, 3))
        cr = ycc[..., 2].reshape(ycc.shape[0] // 2, 2, ycc.shape[1] // 2, 2).mean(axis=(1, 3))
        planes = [y, cb, cr]
        layout = [(0, 2, 2), (1, 1, 1), (2, 1, 1)]
        samp = [0x22, 0x11, 0x11]

    bw = _BitWriter()
    preds = [0, 0, 0]
    tables = [(qy, dc_l, ac_l), (qc, dc_c, ac_c), (qc, dc_c, ac_c)]
    scan_parts: list[bytes] = []
    n_mcu = 0
    rst = 0
    for by in range(0, ycc.shape[0], mcu):
        for bx in range(0, ycc.shape[1], mcu):
            if restart_interval and n_mcu and n_mcu % restart_interval == 0:
                scan_parts.append(bw.flush())
                scan_parts.append(bytes([0xFF, 0xD0 + rst]))
                rst = (rst + 1) % 8
                bw = _BitWriter()
                preds = [0, 0, 0]
            for ci, (pi, hs, vs) in enumerate(layout):
                q, dcc, acc_ = tables[ci]
                plane = planes[pi]
                # block origin in this plane: full-res for Y, half for chroma-420
                scale = mcu // (8 * hs)
                py, px = by // scale, bx // scale
                for ry in range(vs):
                    for rx in range(hs):
                        block = plane[py + ry * 8 : py + ry * 8 + 8, px + rx * 8 : px + rx * 8 + 8] - 128.0
                        coefs = np.round(_fdct(block) / q).astype(np.int32)
                        preds[ci] = _encode_block(coefs, dcc, acc_, preds[ci], bw)
            n_mcu += 1
    scan_parts.append(bw.flush())
    scan = b"".join(scan_parts)

    nc = len(layout)
    out = bytearray(b"\xff\xd8")  # SOI
    out += b"\xff\xe0" + struct.pack(">H", 16) + b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00"
    for tid, q in ((0, qy), (1, qc))[: 1 if nc == 1 else 2]:
        out += b"\xff\xdb" + struct.pack(">HB", 67, tid)
        out += bytes(int(q[r, c]) for r, c in _ZZ)
    out += b"\xff\xc0" + struct.pack(">HBHHB", 8 + 3 * nc, 8, h, w, nc)
    for i, (cid, tq) in enumerate(((1, 0), (2, 1), (3, 1))[:nc]):
        out += bytes([cid, samp[i], tq])
    huff_specs = (
        (0x00, DC_LUMA_BITS, DC_LUMA_VALS),
        (0x10, AC_LUMA_BITS, AC_LUMA_VALS),
        (0x01, DC_CHROMA_BITS, DC_CHROMA_VALS),
        (0x11, AC_CHROMA_BITS, AC_CHROMA_VALS),
    )[: 2 if nc == 1 else 4]
    for tc_th, bits, vals in huff_specs:
        out += b"\xff\xc4" + struct.pack(">HB", 3 + 16 + len(vals), tc_th)
        out += bytes(bits) + bytes(vals)
    if restart_interval:
        out += b"\xff\xdd" + struct.pack(">HH", 4, restart_interval)
    out += b"\xff\xda" + struct.pack(">HB", 6 + 2 * nc, nc)
    for cid, tdta in ((1, 0x00), (2, 0x11), (3, 0x11))[:nc]:
        out += bytes([cid, tdta])
    out += b"\x00\x3f\x00"  # Ss=0 Se=63 Ah/Al=0
    out += scan
    out += b"\xff\xd9"  # EOI
    return bytes(out)


# --- decoder --------------------------------------------------------------


def decode_jpeg(data: bytes) -> np.ndarray:
    """Decode a baseline sequential JPEG into an (h, w, 3) uint8 RGB
    array (grayscale streams replicate to 3 channels).  Supports
    Huffman baseline with sampling factors up to 2x2 and restart
    intervals; raises ValueError on progressive/arithmetic streams."""
    if data[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG (no SOI)")
    pos = 2
    quant: dict[int, np.ndarray] = {}
    dc_tabs: dict[int, dict] = {}
    ac_tabs: dict[int, dict] = {}
    frame = None
    restart = 0
    while pos < len(data):
        if data[pos] != 0xFF:
            pos += 1
            continue
        if pos + 1 >= len(data):
            # stream ends on a lone 0xFF (reachable via a truncated
            # fill-byte run): honor the decoder's ValueError contract
            raise ValueError("truncated JPEG: stream ends inside a marker")
        marker = data[pos + 1]
        if marker == 0xFF:
            # optional fill byte before a marker (B.1.1.2: any number
            # of 0xFF fill bytes may precede the marker code) — skip
            # ONE fill byte and re-test, instead of misreading the
            # second 0xFF as a marker code and its payload as a length
            pos += 1
            continue
        pos += 2
        if marker in (0xD8, 0x01) or 0xD0 <= marker <= 0xD7:
            continue
        if marker == 0xD9:
            break
        (seglen,) = struct.unpack_from(">H", data, pos)
        seg = data[pos + 2 : pos + seglen]
        if marker == 0xDB:
            o = 0
            while o < len(seg):
                pq, tq = seg[o] >> 4, seg[o] & 0xF
                o += 1
                if pq:
                    vals = np.array(struct.unpack_from(f">{64}H", seg, o)); o += 128
                else:
                    vals = np.frombuffer(seg[o : o + 64], dtype=np.uint8).astype(np.int32); o += 64
                t = np.zeros((8, 8), dtype=np.int32)
                t[_ZZ_ROWS, _ZZ_COLS] = vals
                quant[tq] = t
        elif marker == 0xC4:
            o = 0
            while o < len(seg):
                tc, th = seg[o] >> 4, seg[o] & 0xF
                bits = list(seg[o + 1 : o + 17])
                nv = sum(bits)
                vals = list(seg[o + 17 : o + 17 + nv])
                (dc_tabs if tc == 0 else ac_tabs)[th] = _decode_table(bits, vals)
                o += 17 + nv
        elif marker == 0xC0 or marker == 0xC1:
            prec, fh, fw, nc = seg[0], *struct.unpack_from(">HH", seg, 1), seg[5]
            if prec != 8:
                # B.2.2: baseline is 8-bit only; a 12-bit extended
                # stream must fail loudly, not decode to garbage
                raise ValueError(
                    f"unsupported sample precision {prec} (baseline is 8-bit)"
                )
            comps = []
            for i in range(nc):
                cid, hv, tq = seg[6 + 3 * i : 9 + 3 * i]
                comps.append({"id": cid, "h": hv >> 4, "v": hv & 0xF, "tq": tq})
            frame = {"h": fh, "w": fw, "comps": comps}
        elif marker in (0xC2, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF):
            raise ValueError("only baseline sequential Huffman JPEG is supported")
        elif marker == 0xDD:
            (restart,) = struct.unpack_from(">H", seg, 0)
        elif marker == 0xDA:
            if frame is None:
                raise ValueError("SOS before SOF")
            ns = seg[0]
            if ns < len(frame["comps"]):
                # A.2.3: a scan covering fewer components than the
                # frame is NON-interleaved (per-component MCU grid,
                # multiple scans) — decoding it on the interleaved MCU
                # grid would silently return a partial image
                raise ValueError(
                    "non-interleaved multi-scan baseline stream is not "
                    "supported (single interleaved scan only)"
                )
            scan_sel = []
            for i in range(ns):
                cs, tt = seg[1 + 2 * i], seg[2 + 2 * i]
                comp = next(c for c in frame["comps"] if c["id"] == cs)
                scan_sel.append((comp, tt >> 4, tt & 0xF))
            return _decode_scan(data, pos + seglen, frame, scan_sel, quant, dc_tabs, ac_tabs, restart)
        pos += seglen
    raise ValueError("no scan data found")


def _decode_scan(data, pos, frame, scan_sel, quant, dc_tabs, ac_tabs, restart):
    h, w = frame["h"], frame["w"]
    hmax = max(c["h"] for c in frame["comps"])
    vmax = max(c["v"] for c in frame["comps"])
    mcux = -(-w // (8 * hmax))
    mcuy = -(-h // (8 * vmax))
    planes = {
        c["id"]: np.zeros((mcuy * c["v"] * 8, mcux * c["h"] * 8)) for c in frame["comps"]
    }
    reader = _BitReader(data[pos:])
    preds = {c["id"]: 0 for c in frame["comps"]}
    n_mcu = 0
    for my in range(mcuy):
        for mx in range(mcux):
            if restart and n_mcu and n_mcu % restart == 0:
                reader.sync_restart()
                preds = {k: 0 for k in preds}
            for comp, td, ta in scan_sel:
                dct, act = dc_tabs[td], ac_tabs[ta]
                q = quant[comp["tq"]]
                for by in range(comp["v"]):
                    for bx in range(comp["h"]):
                        zz = np.zeros(64, dtype=np.int64)
                        t = _huff_decode(reader, dct)
                        diff = _extend(reader.receive(t), t) if t else 0
                        preds[comp["id"]] += diff
                        zz[0] = preds[comp["id"]]
                        k = 1
                        while k < 64:
                            rs = _huff_decode(reader, act)
                            r, s = rs >> 4, rs & 0xF
                            if s == 0:
                                if r == 15:
                                    k += 16
                                    continue
                                break  # EOB
                            k += r
                            if k > 63:
                                raise ValueError("AC index overflow")
                            zz[k] = _extend(reader.receive(s), s)
                            k += 1
                        coefs = np.zeros((8, 8))
                        coefs[_ZZ_ROWS, _ZZ_COLS] = zz
                        block = _idct(coefs * q) + 128.0
                        py = (my * comp["v"] + by) * 8
                        px = (mx * comp["h"] + bx) * 8
                        planes[comp["id"]][py : py + 8, px : px + 8] = block
            n_mcu += 1
    out_planes = []
    for c in frame["comps"]:
        p = planes[c["id"]]
        if c["h"] < hmax or c["v"] < vmax:  # nearest-neighbor chroma upsample
            p = np.repeat(np.repeat(p, vmax // c["v"], axis=0), hmax // c["h"], axis=1)
        out_planes.append(p[:h, :w])
    if len(out_planes) == 1:
        y = np.clip(out_planes[0].round(), 0, 255).astype(np.uint8)
        return np.stack([y, y, y], axis=-1)
    return _ycbcr_to_rgb(out_planes[0], out_planes[1], out_planes[2])
