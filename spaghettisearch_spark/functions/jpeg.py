"""Pure-stdlib+numpy baseline JPEG codec (ITU-T T.81 sequential DCT).

The last honest-raise slot in the media decode path
(multimodal.real_decode) held "JPEG needs PIL". This module removes it:
a real baseline decoder — marker parse, DQT/DHT/SOF0/SOS/DRI, canonical
Huffman, byte-unstuffing + restart markers, dequant + dezigzag +
float IDCT, chroma upsampling for any (h, v) sampling factors including
4:2:0 and 4:2:2, JFIF YCbCr -> RGB — plus a matching encoder (4:4:4,
Annex K standard tables scaled by a quality knob) so tests can
round-trip without external fixtures. JPEG is lossy: tests assert
bounded reconstruction error, not bit equality (the PNG/BMP/GIF/WAV
codecs next door cover the bit-exact contracts).

Progressive (SOF2), arithmetic coding, and 12-bit precision raise
NotImplementedError honestly.

No Spark here — pure functions, imported by operators/multimodal.py the
same way porter2 is imported by the tokenizer.
"""

from __future__ import annotations

import struct

import numpy as np

# ---------------------------------------------------------------------------
# shared constants
# ---------------------------------------------------------------------------

ZIGZAG = np.array(
    [
        0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
        12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
        35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
        58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63,
    ],
    dtype=np.int64,
)

# Annex K quantization tables (luminance, chrominance)
STD_LUMA_Q = np.array(
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
    dtype=np.int64,
)
STD_CHROMA_Q = np.array(
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
    dtype=np.int64,
)

# Annex K Huffman specs: (bits[1..16] counts, values)
STD_DC_LUMA = (
    [0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0],
    list(range(12)),
)
STD_DC_CHROMA = (
    [0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0],
    list(range(12)),
)
STD_AC_LUMA = (
    [0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D],
    [
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
    ],
)
STD_AC_CHROMA = (
    [0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 0x77],
    [
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
    ],
)


def _dct_matrix() -> np.ndarray:
    """Orthonormal 8-point DCT-II matrix A: block_dct = A @ b @ A.T."""
    a = np.zeros((8, 8))
    for u in range(8):
        c = np.sqrt(0.125) if u == 0 else 0.5
        for x in range(8):
            a[u, x] = c * np.cos((2 * x + 1) * u * np.pi / 16.0)
    return a


_A = _dct_matrix()


def _huff_codes(bits, values):
    """Canonical Huffman: [(length, code)] aligned with values."""
    codes = []
    code = 0
    for ln in range(1, 17):
        for _ in range(bits[ln - 1]):
            codes.append((ln, code))
            code += 1
        code <<= 1
    if len(codes) != len(values):
        raise ValueError("malformed Huffman spec")
    return codes


# ---------------------------------------------------------------------------
# encoder (baseline, 4:4:4)
# ---------------------------------------------------------------------------


class _BitWriter:
    def __init__(self):
        self.out = bytearray()
        self.acc = 0
        self.n = 0

    def write(self, code: int, length: int) -> None:
        self.acc = (self.acc << length) | (code & ((1 << length) - 1))
        self.n += length
        while self.n >= 8:
            b = (self.acc >> (self.n - 8)) & 0xFF
            self.out.append(b)
            if b == 0xFF:  # byte stuffing
                self.out.append(0x00)
            self.n -= 8
        self.acc &= (1 << self.n) - 1

    def flush(self) -> None:
        if self.n:
            pad = 8 - self.n
            self.write((1 << pad) - 1, pad)  # pad with 1-bits per spec

    def marker(self, m: int) -> None:
        """Flush to a byte boundary and emit a raw (unstuffed) marker."""
        self.flush()
        self.out += bytes([0xFF, m])


def _category(v: int) -> int:
    return int(v).bit_length() if v > 0 else int(-v).bit_length()


def _enc_value(v: int) -> tuple[int, int]:
    """(category, appended bits) for a DC diff / AC coefficient."""
    cat = _category(v)
    if v >= 0:
        return cat, v
    return cat, v + (1 << cat) - 1


def _pad_plane(c: np.ndarray, ph: int, pw: int) -> np.ndarray:
    """Edge-replicate a component plane to (ph, pw)."""
    h, w = c.shape
    p = np.empty((ph, pw))
    p[:h, :w] = c
    if ph > h:
        p[h:, :w] = c[h - 1:h, :]
    if pw > w:
        p[:, w:] = p[:, w - 1:w]
    return p


def _encode_block(bwr, blk, q, dc_tab, ac_tab, pred_dc: int) -> int:
    """DCT + quantize + Huffman one 8x8 block; returns the new DC."""
    coef = _A @ blk @ _A.T
    qz = np.round(coef.reshape(64)[ZIGZAG] / q[ZIGZAG]).astype(np.int64)
    diff = int(qz[0]) - pred_dc
    cat, bits = _enc_value(diff)
    ln, code = dc_tab[cat]
    bwr.write(code, ln)
    if cat:
        bwr.write(bits, cat)
    run = 0
    last_nz = int(np.max(np.nonzero(qz)[0])) if np.any(qz) else 0
    for i in range(1, 64):
        v = int(qz[i])
        if v == 0:
            if i > last_nz:
                ln, code = ac_tab[0x00]  # EOB
                bwr.write(code, ln)
                break
            run += 1
            continue
        while run > 15:
            ln, code = ac_tab[0xF0]  # ZRL
            bwr.write(code, ln)
            run -= 16
        cat, bits = _enc_value(v)
        ln, code = ac_tab[(run << 4) | cat]
        bwr.write(code, ln)
        bwr.write(bits, cat)
        run = 0
    return int(qz[0])


def encode_jpeg(
    pixels: np.ndarray,
    quality: int = 85,
    subsample: bool | str = False,
    restart_interval: int = 0,
) -> bytes:
    """Baseline JFIF JPEG from HxWx3 (or HxW grayscale) uint8 RGB.
    ``subsample`` is False (4:4:4), True or "420" (2x2 luma blocks per
    MCU, chroma averaged 2x2), or "422" (2x1 luma blocks, chroma
    averaged horizontally); ``restart_interval=N`` emits RSTn markers
    every N MCUs — these exist mainly so the DECODER's sampling/restart
    paths are exercised by streams this module can synthesize itself."""
    px = np.asarray(pixels, dtype=np.uint8)
    gray = px.ndim == 2
    if gray:
        px = px[:, :, None]
    h, w, ch = px.shape
    if ch not in (1, 3):
        raise ValueError("encode_jpeg wants HxWx3 RGB or HxW grayscale")
    if not (1 <= quality <= 100):
        raise ValueError("quality in [1, 100]")
    if subsample is True:
        subsample = "420"
    if subsample not in (False, "420", "422"):
        raise ValueError("subsample: False, True/'420', or '422'")
    if ch == 1:
        subsample = False
    # quality-scaled Annex K tables (IJG convention)
    scale = 5000 // quality if quality < 50 else 200 - 2 * quality
    qt = []
    for base in (STD_LUMA_Q, STD_CHROMA_Q):
        t = np.clip((base * scale + 50) // 100, 1, 255)
        qt.append(t.astype(np.int64))
    # color transform
    f = px.astype(np.float64)
    if ch == 3:
        r, g, b = f[:, :, 0], f[:, :, 1], f[:, :, 2]
        comps = [
            0.299 * r + 0.587 * g + 0.114 * b,
            -0.168736 * r - 0.331264 * g + 0.5 * b + 128.0,
            0.5 * r - 0.418688 * g - 0.081312 * b + 128.0,
        ]
    else:
        comps = [f[:, :, 0]]
    n_comp = len(comps)
    if subsample == "420":
        samp = [(2, 2)] + [(1, 1)] * (n_comp - 1)
        # chroma 2x2 mean (edge-replicate odd dims first)
        for i in (1, 2):
            c = _pad_plane(comps[i], -(-h // 2) * 2, -(-w // 2) * 2)
            comps[i] = 0.25 * (
                c[0::2, 0::2] + c[0::2, 1::2] + c[1::2, 0::2] + c[1::2, 1::2]
            )
    elif subsample == "422":
        samp = [(2, 1)] + [(1, 1)] * (n_comp - 1)
        # chroma horizontal mean only
        for i in (1, 2):
            c = _pad_plane(comps[i], h, -(-w // 2) * 2)
            comps[i] = 0.5 * (c[:, 0::2] + c[:, 1::2])
    else:
        samp = [(1, 1)] * n_comp
    hmax = max(s[0] for s in samp)
    vmax = max(s[1] for s in samp)
    mcux, mcuy = -(-w // (8 * hmax)), -(-h // (8 * vmax))
    planes = []
    for ci, c in enumerate(comps):
        sh, sv = samp[ci]
        planes.append(
            _pad_plane(c, mcuy * sv * 8, mcux * sh * 8) - 128.0
        )
    qidx = [0] + [1] * (n_comp - 1)

    enc_tables = []
    for spec in (STD_DC_LUMA, STD_AC_LUMA, STD_DC_CHROMA, STD_AC_CHROMA):
        codes = _huff_codes(*spec)
        enc_tables.append({v: c for v, c in zip(spec[1], codes)})
    dc_enc = [enc_tables[0], enc_tables[2]]
    ac_enc = [enc_tables[1], enc_tables[3]]

    bwr = _BitWriter()
    pred = [0] * n_comp
    n_mcu = 0
    rst = 0
    for my in range(mcuy):
        for mx in range(mcux):
            if restart_interval and n_mcu and n_mcu % restart_interval == 0:
                bwr.marker(0xD0 + rst)
                rst = (rst + 1) % 8
                pred = [0] * n_comp
            n_mcu += 1
            for ci in range(n_comp):
                sh, sv = samp[ci]
                ti = 0 if ci == 0 else 1
                for by in range(sv):
                    for bx in range(sh):
                        y0 = (my * sv + by) * 8
                        x0 = (mx * sh + bx) * 8
                        blk = planes[ci][y0:y0 + 8, x0:x0 + 8]
                        pred[ci] = _encode_block(
                            bwr, blk, qt[qidx[ci]],
                            dc_enc[ti], ac_enc[ti], pred[ci],
                        )
    bwr.flush()

    def seg(marker: int, payload: bytes) -> bytes:
        return struct.pack(">HH", marker, len(payload) + 2) + payload

    out = bytearray(b"\xff\xd8")  # SOI
    out += seg(
        0xFFE0, b"JFIF\x00" + struct.pack(">BBBHHBB", 1, 1, 0, 72, 72, 0, 0)
    )
    for tid in range(min(n_comp, 2)):
        out += seg(
            0xFFDB, bytes([tid]) + bytes(int(x) for x in qt[tid][ZIGZAG])
        )
    sof = struct.pack(">BHHB", 8, h, w, n_comp)
    for ci in range(n_comp):
        sof += bytes([ci + 1, (samp[ci][0] << 4) | samp[ci][1], qidx[ci]])
    out += seg(0xFFC0, sof)
    for tclass_tid, spec in (
        ((0, 0), STD_DC_LUMA), ((1, 0), STD_AC_LUMA),
        ((0, 1), STD_DC_CHROMA), ((1, 1), STD_AC_CHROMA),
    ):
        if n_comp == 1 and tclass_tid[1] == 1:
            continue
        tclass, tid = tclass_tid
        out += seg(
            0xFFC4,
            bytes([(tclass << 4) | tid])
            + bytes(spec[0])
            + bytes(spec[1]),
        )
    if restart_interval:
        out += seg(0xFFDD, struct.pack(">H", restart_interval))
    sos = bytes([n_comp])
    for ci in range(n_comp):
        ti = 0 if ci == 0 else 1
        sos += bytes([ci + 1, (ti << 4) | ti])
    sos += bytes([0, 63, 0])
    out += seg(0xFFDA, sos)
    out += bwr.out
    out += b"\xff\xd9"  # EOI
    return bytes(out)


# ---------------------------------------------------------------------------
# decoder (baseline sequential, any sampling factors)
# ---------------------------------------------------------------------------


class _BitReader:
    """MSB-first reader over entropy-coded data with 0xFF00 unstuffing;
    stops at any non-RST marker (the caller handles RST alignment)."""

    def __init__(self, data: bytes, pos: int):
        self.d = data
        self.pos = pos
        self.acc = 0
        self.n = 0

    def _fill(self) -> None:
        if self.pos + 1 >= len(self.d):
            raise ValueError("truncated JPEG entropy stream")
        b = self.d[self.pos]
        if b == 0xFF:
            nxt = self.d[self.pos + 1]
            if nxt == 0x00:
                self.pos += 2
            elif 0xD0 <= nxt <= 0xD7:
                raise _RestartMarker(nxt)
            else:
                raise ValueError("unexpected marker inside entropy data")
        else:
            self.pos += 1
        self.acc = (self.acc << 8) | b
        self.n += 8

    def bit(self) -> int:
        if self.n == 0:
            self._fill()
        self.n -= 1
        return (self.acc >> self.n) & 1

    def bits(self, k: int) -> int:
        v = 0
        for _ in range(k):
            v = (v << 1) | self.bit()
        return v

    def align_after_rst(self) -> None:
        # discard the pad bits of the current partial byte, then consume
        # exactly one RSTn marker — anything else means the stream and
        # the declared restart interval disagree
        self.n = 0
        self.acc = 0
        if self.pos + 2 > len(self.d):
            # a stream truncated exactly at a restart boundary must hit
            # the codec wrappers' ValueError contract, not IndexError
            raise ValueError("truncated JPEG entropy stream")
        if self.d[self.pos] != 0xFF or not (
            0xD0 <= self.d[self.pos + 1] <= 0xD7
        ):
            raise ValueError("expected restart marker at interval boundary")
        self.pos += 2


class _RestartMarker(Exception):
    def __init__(self, marker: int):
        self.marker = marker


class _HuffTree:
    """Canonical Huffman decode via (first_code, first_index) per length
    — O(code length) per symbol, no dict of every prefix."""

    def __init__(self, bits, values):
        if len(bits) != 16 or sum(bits) != len(values):
            raise ValueError("malformed DHT segment")
        self.values = values
        self.min_code = [0] * 17
        self.max_code = [-1] * 17
        self.val_ptr = [0] * 17
        code = 0
        k = 0
        for ln in range(1, 17):
            if bits[ln - 1]:
                self.val_ptr[ln] = k
                self.min_code[ln] = code
                code += bits[ln - 1]
                k += bits[ln - 1]
                self.max_code[ln] = code - 1
            code <<= 1

    def read(self, br: _BitReader) -> int:
        code = 0
        for ln in range(1, 17):
            code = (code << 1) | br.bit()
            if self.max_code[ln] >= 0 and code <= self.max_code[ln]:
                if code >= self.min_code[ln]:
                    return self.values[
                        self.val_ptr[ln] + code - self.min_code[ln]
                    ]
        raise ValueError("invalid Huffman code")


def _extend(v: int, cat: int) -> int:
    if cat == 0:
        return 0
    return v if v >= (1 << (cat - 1)) else v - (1 << cat) + 1


def decode_jpeg(payload: bytes) -> np.ndarray:
    """Baseline sequential JPEG -> HxWx3 uint8 RGB (grayscale inputs
    replicate to 3 channels). Supports any sampling factors (4:4:4,
    4:2:0, 4:2:2, ...), restart intervals, multiple DQT/DHT segments.
    Progressive/arithmetic/12-bit raise NotImplementedError."""
    if payload[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG payload (no SOI)")
    pos = 2
    qt: dict[int, np.ndarray] = {}
    huff: dict[tuple[int, int], _HuffTree] = {}
    comps = None  # list of (cid, h, v, tq)
    h = w = 0
    restart = 0
    while True:
        if pos + 4 > len(payload):
            raise ValueError("truncated JPEG (no scan reached)")
        if payload[pos] != 0xFF:
            raise ValueError("marker expected")
        marker = payload[pos + 1]
        pos += 2
        if marker == 0xD9:  # EOI
            raise ValueError("JPEG contains no scan")
        (seg_len,) = struct.unpack_from(">H", payload, pos)
        if pos + seg_len > len(payload):
            raise ValueError("truncated JPEG segment")
        seg = payload[pos + 2:pos + seg_len]
        if marker == 0xDB:  # DQT (possibly several tables per segment)
            i = 0
            while i < len(seg):
                prec, tid = seg[i] >> 4, seg[i] & 0x0F
                if prec != 0:
                    raise NotImplementedError("16-bit DQT not supported")
                tbl = np.zeros(64, dtype=np.int64)
                tbl[ZIGZAG] = np.frombuffer(seg, np.uint8, 64, i + 1)
                qt[tid] = tbl
                i += 65
        elif marker == 0xC4:  # DHT
            i = 0
            while i < len(seg):
                tclass, tid = seg[i] >> 4, seg[i] & 0x0F
                bits = list(seg[i + 1:i + 17])
                n = sum(bits)
                values = list(seg[i + 17:i + 17 + n])
                huff[(tclass, tid)] = _HuffTree(bits, values)
                i += 17 + n
        elif marker == 0xC0 or marker == 0xC1:  # SOF0/1 baseline
            prec, h, w, nc = struct.unpack_from(">BHHB", seg, 0)
            if prec != 8:
                raise NotImplementedError("only 8-bit precision")
            comps = []
            for ci in range(nc):
                cid, hv, tq = seg[6 + ci * 3:9 + ci * 3]
                comps.append((cid, hv >> 4, hv & 0x0F, tq))
        elif marker in (0xC2, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB,
                        0xCD, 0xCE, 0xCF):
            raise NotImplementedError(
                "only baseline sequential JPEG (SOF0/1) is supported"
            )
        elif marker == 0xDD:  # DRI
            (restart,) = struct.unpack_from(">H", seg, 0)
        elif marker == 0xDA:  # SOS
            if comps is None:
                raise ValueError("SOS before SOF")
            ns = seg[0]
            scan = []
            for si in range(ns):
                cs, tt = seg[1 + si * 2:3 + si * 2]
                for c in comps:
                    if c[0] == cs:
                        scan.append((c, tt >> 4, tt & 0x0F))
                        break
                else:
                    raise ValueError("scan references unknown component")
            data_pos = pos + seg_len
            return _decode_scan(
                payload, data_pos, scan, qt, huff, h, w, restart
            )
        # APPn / COM / others: skip
        pos += seg_len


def _decode_scan(payload, pos, scan, qt, huff, h, w, restart):
    hmax = max(c[0][1] for c in scan)
    vmax = max(c[0][2] for c in scan)
    mcux = -(-w // (8 * hmax))
    mcuy = -(-h // (8 * vmax))
    planes = []
    for (cid, ch, cv, tq), _td, _ta in scan:
        planes.append(np.zeros((mcuy * cv * 8, mcux * ch * 8)))
    pred = [0] * len(scan)
    br = _BitReader(payload, pos)
    n_mcu = 0
    for my in range(mcuy):
        for mx in range(mcux):
            if restart and n_mcu and n_mcu % restart == 0:
                # reader may stop early on the RST; resync either way
                br.align_after_rst()
                pred = [0] * len(scan)
            n_mcu += 1
            try:
                for si, ((cid, ch, cv, tq), td, ta) in enumerate(scan):
                    dct = huff[(0, td)]
                    act = huff[(1, ta)]
                    q = qt[tq]
                    for by in range(cv):
                        for bx in range(ch):
                            zz = np.zeros(64, dtype=np.int64)
                            cat = dct.read(br)
                            if cat > 11:
                                raise ValueError("bad DC category")
                            diff = _extend(br.bits(cat), cat)
                            pred[si] += diff
                            zz[0] = pred[si]
                            i = 1
                            while i < 64:
                                rs = act.read(br)
                                r, s = rs >> 4, rs & 0x0F
                                if s == 0:
                                    if r == 15:
                                        i += 16
                                        continue
                                    break  # EOB
                                i += r
                                if i > 63:
                                    raise ValueError("AC run past block")
                                zz[i] = _extend(br.bits(s), s)
                                i += 1
                            coef = np.zeros(64)
                            # zz[i] is the i-th ZIGZAG-order coefficient,
                            # i.e. natural position ZIGZAG[i] — so its
                            # quantizer is q[ZIGZAG[i]] (q is stored in
                            # natural order), mirroring the encoder's
                            # coef[ZIGZAG] / q[ZIGZAG]
                            coef[ZIGZAG] = zz * q[ZIGZAG]
                            blk = _A.T @ coef.reshape(8, 8) @ _A + 128.0
                            y0 = (my * cv + by) * 8
                            x0 = (mx * ch + bx) * 8
                            planes[si][y0:y0 + 8, x0:x0 + 8] = blk
            except _RestartMarker:
                raise ValueError("restart marker misaligned with DRI")
    # upsample each component to full resolution and crop
    full = []
    for si, ((cid, ch, cv, tq), _td, _ta) in enumerate(scan):
        p = planes[si]
        if ch != hmax or cv != vmax:
            p = np.repeat(np.repeat(p, vmax // cv, axis=0), hmax // ch, axis=1)
        full.append(p[:h, :w])
    if len(full) == 1:
        y = np.clip(np.round(full[0]), 0, 255).astype(np.uint8)
        return np.stack([y] * 3, axis=-1)
    y, cb, cr = full[0], full[1] - 128.0, full[2] - 128.0
    r = y + 1.402 * cr
    g = y - 0.344136 * cb - 0.714136 * cr
    b = y + 1.772 * cb
    rgb = np.stack([r, g, b], axis=-1)
    return np.clip(np.round(rgb), 0, 255).astype(np.uint8)
