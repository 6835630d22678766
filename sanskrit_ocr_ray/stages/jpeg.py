"""Pure-Python JPEG codec (ITU T.81 sequential + progressive DCT, numpy only).

Makes ``image/jpeg`` a REAL media type next to ``image/png``
(stages/png.py) and raw8: the multimodal pipelines carry images as opaque
binary payloads, and this codec decodes them in-sandbox without PIL/cv2.

Scope (everything a *baseline* JFIF file uses):
- encoder: 8-bit grayscale or RGB, quality 1-100 (libjpeg quant scaling),
  4:4:4 or 4:2:0 chroma subsampling, restart intervals optional, standard
  Annex-K huffman tables;
- decoder: baseline sequential (SOF0), 1- or 3-component, any of the
  2^k x 2^l sampling factor combinations the encoder can emit (4:4:4,
  4:2:2, 4:2:0), restart markers, 0xFF00 byte unstuffing, unknown APPn /
  COM chunks skipped.

Progressive (SOF2) is supported on BOTH sides per ITU T.81 Annex G:
- decoder: spectral selection + successive approximation, interleaved
  and single-component DC scans, non-interleaved AC scans, EOB runs,
  AC/DC refinement passes, restart markers (the algorithms mirror
  T.81 G.2 / the well-known libjpeg decode_mcu_{DC,AC}_{first,refine}
  structure, which is the de-facto conformance reference);
- encoder: ``progressive=True`` emits a libjpeg-style scan script
  (DC at Al=1 + refine; per-component AC bands at Al=2 refined 2->1->0)
  with flat fixed Huffman tables that include the EOBn symbols Annex K
  lacks.

Arithmetic coding, 12-bit precision, hierarchical and CMYK raise
``ValueError`` so actor-pool stages quarantine the row per SURVEY.md M11.
JPEG is lossy: tests assert PSNR bounds and exactness on flat blocks, not
bit equality; progressive-vs-sequential decode of the same image asserts
EXACT pixel equality (same quantized coefficients, different
serialization — tests/test_jpeg.py).
"""

from __future__ import annotations

import struct

import numpy as np

# ---------------------------------------------------------------------------
# constants (ITU T.81 Annex K)
# ---------------------------------------------------------------------------

ZIGZAG = np.array([
     0,  1,  8, 16,  9,  2,  3, 10, 17, 24, 32, 25, 18, 11,  4,  5,
    12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13,  6,  7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63,
], dtype=np.int64)
UNZIGZAG = np.argsort(ZIGZAG)

Q_LUM = np.array([
    16, 11, 10, 16, 24, 40, 51, 61,
    12, 12, 14, 19, 26, 58, 60, 55,
    14, 13, 16, 24, 40, 57, 69, 56,
    14, 17, 22, 29, 51, 87, 80, 62,
    18, 22, 37, 56, 68, 109, 103, 77,
    24, 35, 55, 64, 81, 104, 113, 92,
    49, 64, 78, 87, 103, 121, 120, 101,
    72, 92, 95, 98, 112, 100, 103, 99,
], dtype=np.int64)
Q_CHROMA = np.array([
    17, 18, 24, 47, 99, 99, 99, 99,
    18, 21, 26, 66, 99, 99, 99, 99,
    24, 26, 56, 99, 99, 99, 99, 99,
    47, 66, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
], dtype=np.int64)

# huffman specs: (BITS counts per code length 1..16, HUFFVAL symbols)
HUFF_DC_LUM = (
    [0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0],
    list(range(12)),
)
HUFF_DC_CHR = (
    [0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0],
    list(range(12)),
)
HUFF_AC_LUM = (
    [0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D],
    [
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
    ],
)
HUFF_AC_CHR = (
    [0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 0x77],
    [
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
    ],
)

# Flat fixed-length Huffman specs for progressive scans: Annex K's AC
# tables lack the EOBn symbols (r<<4 for r=1..14) progressive EOB runs
# need, and per-scan optimized tables are overkill for a baseline codec.
# All DC symbols at 4 bits (12 codes, max 11 != the all-ones code) and
# all AC symbols at 8 bits (176 codes, max 175) are canonically valid.
_FLAT_DC = ([0, 0, 0, 12] + [0] * 12, list(range(12)))
_FLAT_AC = (
    [0, 0, 0, 0, 0, 0, 0, 176] + [0] * 8,
    sorted([r << 4 for r in range(15)] + [0xF0]
           + [(r << 4) | s for r in range(16) for s in range(1, 11)]),
)

# orthonormal 8x8 DCT-II matrix: dct2(B) = D @ B @ D.T; idct = D.T @ C @ D
_D = np.zeros((8, 8))
for _k in range(8):
    for _n in range(8):
        _D[_k, _n] = np.cos(np.pi * (2 * _n + 1) * _k / 16.0)
_D *= np.sqrt(2.0 / 8.0)
_D[0] *= np.sqrt(0.5)


def _quant_tables(quality: int) -> tuple[np.ndarray, np.ndarray]:
    q = min(max(int(quality), 1), 100)
    scale = 5000 // q if q < 50 else 200 - 2 * q
    lum = np.clip((Q_LUM * scale + 50) // 100, 1, 255)
    chr_ = np.clip((Q_CHROMA * scale + 50) // 100, 1, 255)
    return lum, chr_


def _canonical_codes(bits: list[int], vals: list[int]) -> dict[int, tuple[int, int]]:
    """symbol -> (code, length) from a T.81 (BITS, HUFFVAL) spec."""
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
    """(length, code) -> symbol lookup for the bit-serial decoder."""
    out: dict[tuple[int, int], int] = {}
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            out[(length, code)] = vals[k]
            code += 1
            k += 1
        code <<= 1
    return out


def _category(v: int) -> int:
    return int(v).bit_length() if v >= 0 else int(-v).bit_length()


# ---------------------------------------------------------------------------
# encoder
# ---------------------------------------------------------------------------


class _BitWriter:
    def __init__(self) -> None:
        self.buf = bytearray()
        self.acc = 0
        self.n = 0

    def put(self, code: int, length: int) -> None:
        self.acc = (self.acc << length) | (code & ((1 << length) - 1))
        self.n += length
        while self.n >= 8:
            self.n -= 8
            byte = (self.acc >> self.n) & 0xFF
            self.buf.append(byte)
            if byte == 0xFF:
                self.buf.append(0x00)  # byte stuffing
        self.acc &= (1 << self.n) - 1

    def flush(self) -> None:
        if self.n:
            self.put(0x7F, 7 - ((self.n - 1) % 8) + 1)  # pad with 1-bits
        self.acc, self.n = 0, 0


def _encode_block(w: _BitWriter, zz: np.ndarray, pred: int,
                  dc: dict, ac: dict) -> int:
    dc_val = int(zz[0])
    diff = dc_val - pred
    s = _category(diff)
    code, length = dc[s]
    w.put(code, length)
    if s:
        w.put(diff if diff > 0 else diff + (1 << s) - 1, s)
    run = 0
    last_nz = int(np.nonzero(zz[1:])[0][-1]) + 1 if np.any(zz[1:]) else 0
    for i in range(1, last_nz + 1):
        v = int(zz[i])
        if v == 0:
            run += 1
            continue
        while run > 15:
            code, length = ac[0xF0]  # ZRL
            w.put(code, length)
            run -= 16
        s = _category(v)
        code, length = ac[(run << 4) | s]
        w.put(code, length)
        w.put(v if v > 0 else v + (1 << s) - 1, s)
        run = 0
    if last_nz < 63:
        code, length = ac[0x00]  # EOB
        w.put(code, length)
    return dc_val


def _blocks_of(plane: np.ndarray) -> np.ndarray:
    """(H, W) float plane, H/W multiples of 8 → (n, 8, 8) blocks row-major."""
    h, w = plane.shape
    return (
        plane.reshape(h // 8, 8, w // 8, 8).transpose(0, 2, 1, 3).reshape(-1, 8, 8)
    )


# --- progressive scan emitters (T.81 Annex G; structure mirrors the
# libjpeg encode_mcu_{DC,AC}_{first,refine} reference algorithms) ---


def _emit_dc_val(w: _BitWriter, coef0: int, pred: int, ah: int, al: int,
                 dc: dict) -> int:
    v = coef0 >> al  # arithmetic shift = T.81 DC point transform
    if ah:  # refinement: one raw bit per block
        w.put(v & 1, 1)
        return pred
    diff = v - pred
    s = _category(diff)
    code, length = dc[s]
    w.put(code, length)
    if s:
        w.put(diff if diff > 0 else diff + (1 << s) - 1, s)
    return v


def _emit_prog_dc_scan(w: _BitWriter, comps_in: tuple, comp_zz: list,
                       comp_nb: list, hs: list, ah: int, al: int,
                       dc: dict) -> None:
    preds = [0] * len(comps_in)
    if len(comps_in) > 1:
        # interleaved: same MCU traversal as the sequential encoder
        y_zz, y_bw = comp_zz[0]
        mcus_x = y_bw // hs[0][1]
        mcus_y = (y_zz.shape[0] // y_bw) // hs[0][0]
        for my in range(mcus_y):
            for mx in range(mcus_x):
                for si, ci in enumerate(comps_in):
                    zz, bw = comp_zz[ci]
                    for by in range(hs[ci][0]):
                        for bx in range(hs[ci][1]):
                            idx = (my * hs[ci][0] + by) * bw + mx * hs[ci][1] + bx
                            preds[si] = _emit_dc_val(
                                w, int(zz[idx][0]), preds[si], ah, al, dc)
    else:
        ci = comps_in[0]
        zz, bw = comp_zz[ci]
        nbh, nbw = comp_nb[ci]
        for row in range(nbh):
            for col in range(nbw):
                preds[0] = _emit_dc_val(
                    w, int(zz[row * bw + col][0]), preds[0], ah, al, dc)


class _ProgACEncoder:
    """Entropy state for one progressive AC scan: the EOB-run counter,
    the correction bits owed to the pending EOB run (``be``), and the
    correction bits buffered inside the current block since the last
    emitted symbol (``br``) — the split matters because the decoder
    reads ``be`` right after the EOBn code but ``br`` only after the
    next ZRL / newly-significant symbol."""

    def __init__(self, w: _BitWriter, ac: dict) -> None:
        self.w, self.ac = w, ac
        self.eobrun = 0
        self.be: list[int] = []
        self.br: list[int] = []

    def _flush_br(self) -> None:
        for b in self.br:
            self.w.put(b, 1)
        self.br = []

    def emit_eobrun(self) -> None:
        if self.eobrun:
            nb = self.eobrun.bit_length() - 1
            code, length = self.ac[nb << 4]
            self.w.put(code, length)
            if nb:
                self.w.put(self.eobrun & ((1 << nb) - 1), nb)
            self.eobrun = 0
            for b in self.be:
                self.w.put(b, 1)
            self.be = []

    def _end_block(self, pending: bool) -> None:
        if pending:
            self.eobrun += 1
            self.be.extend(self.br)
            self.br = []
            if self.eobrun == 0x7FFF:
                self.emit_eobrun()

    def first_block(self, zz: np.ndarray, ss: int, se: int, al: int) -> None:
        n = se - ss + 1
        t = [0] * n
        last = -1
        for i in range(n):
            v = int(zz[ss + i])
            # AC point transform: magnitude shift, sign reapplied
            m = (abs(v) >> al)
            if m:
                t[i] = m if v >= 0 else -m
                last = i
        if last < 0:
            self._end_block(True)
            return
        self.emit_eobrun()
        r = 0
        for i in range(last + 1):
            v = t[i]
            if v == 0:
                r += 1
                continue
            while r > 15:
                code, length = self.ac[0xF0]
                self.w.put(code, length)
                r -= 16
            s = _category(v)
            code, length = self.ac[(r << 4) | s]
            self.w.put(code, length)
            self.w.put(v if v > 0 else v + (1 << s) - 1, s)
            r = 0
        self._end_block(last < n - 1)

    def refine_block(self, zz: np.ndarray, ss: int, se: int, al: int) -> None:
        n = se - ss + 1
        a = [0] * n
        sign = [1] * n
        eob = -1
        for i in range(n):
            v = int(zz[ss + i])
            a[i] = abs(v) >> al
            if v < 0:
                sign[i] = -1
            if a[i] == 1:
                eob = i  # last NEWLY-significant coefficient
        r = 0
        for i in range(n):
            t = a[i]
            if t == 0:
                r += 1
                continue
            # emit required ZRLs unless they can fold into the EOB run
            while r > 15 and i <= eob:
                self.emit_eobrun()
                code, length = self.ac[0xF0]
                self.w.put(code, length)
                r -= 16
                self._flush_br()
            if t > 1:  # already nonzero: just owes a correction bit
                self.br.append(t & 1)
                continue
            # newly significant at this precision
            self.emit_eobrun()
            code, length = self.ac[(r << 4) | 1]
            self.w.put(code, length)
            self.w.put(1 if sign[i] > 0 else 0, 1)
            self._flush_br()
            r = 0
        self._end_block(r > 0 or bool(self.br))


def _encode_progressive_scans(comp_zz: list, comp_nb: list, hs: list,
                              color: bool) -> bytes:
    """DHT + SOS + entropy bytes for a libjpeg-style progressive script:
    DC of all components at Al=1 plus a refinement pass, and per-component
    AC bands at Al=2 refined 2→1→0 (the luma band split 1-5 / 6-63)."""
    out = bytearray()
    for tc_th, (bits, vals) in ((0x00, _FLAT_DC), (0x10, _FLAT_AC)):
        payload = bytes([tc_th]) + bytes(bits) + bytes(vals)
        out += b"\xFF\xC4" + struct.pack(">H", 2 + len(payload)) + payload
    dc = _canonical_codes(*_FLAT_DC)
    ac = _canonical_codes(*_FLAT_AC)
    if color:
        script = [
            ((0, 1, 2), 0, 0, 0, 1),
            ((0,), 1, 5, 0, 2), ((0,), 6, 63, 0, 2),
            ((1,), 1, 63, 0, 2), ((2,), 1, 63, 0, 2),
            ((0,), 1, 5, 2, 1), ((0,), 6, 63, 2, 1),
            ((1,), 1, 63, 2, 1), ((2,), 1, 63, 2, 1),
            ((0,), 1, 5, 1, 0), ((0,), 6, 63, 1, 0),
            ((1,), 1, 63, 1, 0), ((2,), 1, 63, 1, 0),
            ((0, 1, 2), 0, 0, 1, 0),
        ]
    else:
        script = [
            ((0,), 0, 0, 0, 1),
            ((0,), 1, 5, 0, 2), ((0,), 6, 63, 0, 2),
            ((0,), 1, 5, 2, 1), ((0,), 6, 63, 2, 1),
            ((0,), 1, 5, 1, 0), ((0,), 6, 63, 1, 0),
            ((0,), 0, 0, 1, 0),
        ]
    for comps_in, ss, se, ah, al in script:
        sos = bytes([len(comps_in)])
        for ci in comps_in:
            sos += bytes([ci + 1, 0x00])  # flat tables: td=0, ta=0
        sos += bytes([ss, se, (ah << 4) | al])
        out += b"\xFF\xDA" + struct.pack(">H", 2 + len(sos)) + sos
        wtr = _BitWriter()
        if ss == 0:
            _emit_prog_dc_scan(wtr, comps_in, comp_zz, comp_nb, hs, ah, al, dc)
        else:
            enc = _ProgACEncoder(wtr, ac)
            zz, bw = comp_zz[comps_in[0]]
            nbh, nbw = comp_nb[comps_in[0]]
            for row in range(nbh):
                for col in range(nbw):
                    blk = zz[row * bw + col]
                    if ah == 0:
                        enc.first_block(blk, ss, se, al)
                    else:
                        enc.refine_block(blk, ss, se, al)
            enc.emit_eobrun()
        wtr.flush()
        out += wtr.buf
    return bytes(out)


def jpeg_encode(img: np.ndarray, quality: int = 85, subsample: str = "444",
                progressive: bool = False) -> bytes:
    """Encode (H, W) grayscale or (H, W, 3) RGB uint8 to JFIF.

    ``progressive=True`` emits an SOF2 stream with a libjpeg-style scan
    script (spectral selection + successive approximation); the quantized
    coefficients are identical to the sequential encoding, only the
    serialization differs."""
    arr = np.asarray(img)
    if arr.dtype != np.uint8 or arr.ndim not in (2, 3):
        raise ValueError("expected (H, W) or (H, W, 3) uint8")
    color = arr.ndim == 3
    if color and arr.shape[2] != 3:
        raise ValueError("color images must have 3 channels")
    if subsample not in ("444", "420"):
        raise ValueError("subsample must be '444' or '420'")
    h, w = arr.shape[:2]
    if h == 0 or w == 0:
        raise ValueError("empty image")
    qlum, qchr = _quant_tables(quality)
    qlum8 = qlum.reshape(8, 8).astype(np.float64)
    qchr8 = qchr.reshape(8, 8).astype(np.float64)

    if color:
        rgb = arr.astype(np.float64)
        y = 0.299 * rgb[..., 0] + 0.587 * rgb[..., 1] + 0.114 * rgb[..., 2]
        cb = -0.168736 * rgb[..., 0] - 0.331264 * rgb[..., 1] + 0.5 * rgb[..., 2] + 128.0
        cr = 0.5 * rgb[..., 0] - 0.418688 * rgb[..., 1] - 0.081312 * rgb[..., 2] + 128.0
    else:
        y, cb, cr = arr.astype(np.float64), None, None

    sub = 2 if (color and subsample == "420") else 1
    hs = [(sub, sub), (1, 1), (1, 1)] if color else [(1, 1)]
    mcu_h, mcu_w = 8 * hs[0][0], 8 * hs[0][1]

    def pad_to(p: np.ndarray, mh: int, mw: int) -> np.ndarray:
        ph = (mh - p.shape[0] % mh) % mh
        pw = (mw - p.shape[1] % mw) % mw
        return np.pad(p, ((0, ph), (0, pw)), mode="edge")

    planes = [pad_to(y, mcu_h, mcu_w)]
    if color:
        if sub == 2:
            cbp = pad_to(cb, mcu_h, mcu_w)
            crp = pad_to(cr, mcu_h, mcu_w)
            cbp = cbp.reshape(cbp.shape[0] // 2, 2, cbp.shape[1] // 2, 2).mean(axis=(1, 3))
            crp = crp.reshape(crp.shape[0] // 2, 2, crp.shape[1] // 2, 2).mean(axis=(1, 3))
        else:
            cbp, crp = pad_to(cb, 8, 8), pad_to(cr, 8, 8)
        planes += [cbp, crp]

    # quantized zigzag coefficients per component, blocks in row-major order
    comp_zz = []
    for ci, p in enumerate(planes):
        qt = qlum8 if ci == 0 else qchr8
        b = _blocks_of(p - 128.0)
        coef = np.einsum("ij,njk,lk->nil", _D, b, _D)
        zz = np.round(coef / qt).astype(np.int64).reshape(-1, 64)[:, ZIGZAG]
        comp_zz.append((zz, p.shape[1] // 8))

    # per-component non-interleaved block grids (ceil of TRUE pixel dims,
    # not the MCU-padded storage) for progressive single-component scans
    comp_dims = [(h, w)]
    if color:
        cdim = ((h + sub - 1) // sub, (w + sub - 1) // sub)
        comp_dims += [cdim, cdim]
    comp_nb = [((ph + 7) // 8, (pw + 7) // 8) for ph, pw in comp_dims]

    # headers
    out = bytearray(b"\xFF\xD8")  # SOI
    out += b"\xFF\xE0" + struct.pack(">H", 16) + b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00"
    out += b"\xFF\xDB" + struct.pack(">H", 67) + b"\x00" + bytes(qlum.tolist())
    if color:
        out += b"\xFF\xDB" + struct.pack(">H", 67) + b"\x01" + bytes(qchr.tolist())
    ncomp = 3 if color else 1
    sof = struct.pack(">BHHB", 8, h, w, ncomp)
    for ci in range(ncomp):
        hv = (hs[ci][1] << 4) | hs[ci][0]
        sof += struct.pack(">BBB", ci + 1, hv, 0 if ci == 0 else 1)
    out += (b"\xFF\xC2" if progressive else b"\xFF\xC0")
    out += struct.pack(">H", 2 + len(sof)) + sof
    if progressive:
        out += _encode_progressive_scans(comp_zz, comp_nb, hs, color)
        out += b"\xFF\xD9"  # EOI
        return bytes(out)
    for tc_th, (bits, vals) in (
        ((0x00, HUFF_DC_LUM), (0x10, HUFF_AC_LUM), (0x01, HUFF_DC_CHR), (0x11, HUFF_AC_CHR))
        if color
        else ((0x00, HUFF_DC_LUM), (0x10, HUFF_AC_LUM))
    ):
        payload = bytes([tc_th]) + bytes(bits) + bytes(vals)
        out += b"\xFF\xC4" + struct.pack(">H", 2 + len(payload)) + payload
    sos = bytes([ncomp])
    for ci in range(ncomp):
        sos += bytes([ci + 1, 0x00 if ci == 0 else 0x11])
    sos += b"\x00\x3F\x00"
    out += b"\xFF\xDA" + struct.pack(">H", 2 + len(sos)) + sos

    dc_lum = _canonical_codes(*HUFF_DC_LUM)
    ac_lum = _canonical_codes(*HUFF_AC_LUM)
    dc_chr = _canonical_codes(*HUFF_DC_CHR)
    ac_chr = _canonical_codes(*HUFF_AC_CHR)
    wtr = _BitWriter()
    preds = [0] * ncomp
    y_zz, y_bw = comp_zz[0]
    mcus_x = (planes[0].shape[1]) // mcu_w
    mcus_y = (planes[0].shape[0]) // mcu_h
    for my in range(mcus_y):
        for mx in range(mcus_x):
            for by in range(hs[0][0]):
                for bx in range(hs[0][1]):
                    idx = (my * hs[0][0] + by) * y_bw + mx * hs[0][1] + bx
                    preds[0] = _encode_block(wtr, y_zz[idx], preds[0], dc_lum, ac_lum)
            for ci in (1, 2) if color else ():
                c_zz, c_bw = comp_zz[ci]
                idx = my * c_bw + mx
                preds[ci] = _encode_block(wtr, c_zz[idx], preds[ci], dc_chr, ac_chr)
    wtr.flush()
    out += wtr.buf
    out += b"\xFF\xD9"  # EOI
    return bytes(out)


# ---------------------------------------------------------------------------
# decoder
# ---------------------------------------------------------------------------


class _BitReader:
    """Entropy-segment bit reader with 0xFF00 unstuffing + RST handling."""

    def __init__(self, data: bytes, pos: int) -> None:
        self.data = data
        self.pos = pos
        self.acc = 0
        self.n = 0

    def _fill(self) -> None:
        d = self.data
        while self.n <= 24:
            if self.pos >= len(d):
                self.acc = (self.acc << 8) | 0xFF  # pad past end
                self.n += 8
                continue
            b = d[self.pos]
            if b == 0xFF:
                nxt = d[self.pos + 1] if self.pos + 1 < len(d) else 0xD9
                if nxt == 0x00:
                    self.pos += 2
                else:
                    # a real marker: pad — caller handles RST/EOI via sync()
                    self.acc = (self.acc << 8) | 0xFF
                    self.n += 8
                    continue
            else:
                self.pos += 1
            self.acc = (self.acc << 8) | b
            self.n += 8

    def bits(self, k: int) -> int:
        if k == 0:
            return 0
        if self.n < k:
            self._fill()
        self.n -= k
        v = (self.acc >> self.n) & ((1 << k) - 1)
        self.acc &= (1 << self.n) - 1
        return v

    def huff(self, table: dict[tuple[int, int], int]) -> int:
        code = 0
        for length in range(1, 17):
            code = (code << 1) | self.bits(1)
            sym = table.get((length, code))
            if sym is not None:
                return sym
        raise ValueError("invalid huffman code")

    def sync_restart(self) -> None:
        """Consume a restart marker at the current byte position."""
        self.acc, self.n = 0, 0  # discard pad bits
        d = self.data
        while self.pos + 1 < len(d) and d[self.pos] == 0xFF and d[self.pos + 1] == 0xFF:
            self.pos += 1
        if self.pos + 1 < len(d) and d[self.pos] == 0xFF and 0xD0 <= d[self.pos + 1] <= 0xD7:
            self.pos += 2
        else:
            raise ValueError("expected restart marker")


def _extend(v: int, s: int) -> int:
    return v if v >= (1 << (s - 1)) else v - (1 << s) + 1


def _next_marker(data: bytes, p: int) -> int:
    """Advance past entropy-coded bytes to the next real marker."""
    n = len(data)
    while p + 1 < n:
        if data[p] != 0xFF:
            p += 1
        elif data[p + 1] == 0x00:
            p += 2  # stuffed data byte
        elif data[p + 1] == 0xFF:
            p += 1  # fill byte
        elif 0xD0 <= data[p + 1] <= 0xD7:
            p += 2  # restart marker inside entropy data
        else:
            return p
    return n


def _decode_seq_scan(rdr: _BitReader, scomps: list, htabs: dict,
                     mcus_x: int, mcus_y: int, restart: int) -> None:
    """Baseline sequential interleaved scan (T.81 F.2)."""
    preds = [0] * len(scomps)
    n_mcu = 0
    for my in range(mcus_y):
        for mx in range(mcus_x):
            if restart and n_mcu and n_mcu % restart == 0:
                rdr.sync_restart()
                preds = [0] * len(scomps)
            for ci, (c, td, ta) in enumerate(scomps):
                dct = htabs.get(0x00 | td)
                act = htabs.get(0x10 | ta)
                if dct is None or act is None:
                    raise ValueError("missing huffman table")
                for by in range(c["v"]):
                    for bx in range(c["h"]):
                        zz = c["zz"][(my * c["v"] + by) * c["bw"] + mx * c["h"] + bx]
                        s = rdr.huff(dct)
                        diff = _extend(rdr.bits(s), s) if s else 0
                        preds[ci] += diff
                        zz[0] = preds[ci]
                        k = 1
                        while k < 64:
                            rs = rdr.huff(act)
                            r, sz = rs >> 4, rs & 0xF
                            if sz == 0:
                                if r == 15:
                                    k += 16
                                    continue
                                break  # EOB
                            k += r
                            if k > 63:
                                raise ValueError("AC run past block end")
                            zz[k] = _extend(rdr.bits(sz), sz)
                            k += 1
            n_mcu += 1


def _prog_ac_first(rdr: _BitReader, zz: np.ndarray, act: dict,
                   ss: int, se: int, al: int, eobrun: int) -> int:
    """Progressive AC first scan for one block (T.81 G.2 / libjpeg
    decode_mcu_AC_first). Returns the updated EOB-run counter."""
    if eobrun > 0:
        return eobrun - 1
    k = ss
    while k <= se:
        rs = rdr.huff(act)
        r, s = rs >> 4, rs & 0xF
        if s == 0:
            if r != 15:
                eb = 1 << r
                if r:
                    eb += rdr.bits(r)
                return eb - 1  # the run includes this block
            k += 16  # ZRL
            continue
        k += r
        if k > se:
            raise ValueError("AC run past band end")
        zz[k] = _extend(rdr.bits(s), s) << al
        k += 1
    return 0


def _prog_ac_refine(rdr: _BitReader, zz: np.ndarray, act: dict,
                    ss: int, se: int, al: int, eobrun: int) -> int:
    """Progressive AC refinement for one block (T.81 G.2 / libjpeg
    decode_mcu_AC_refine): newly-significant coefficients arrive as
    run/1 symbols + sign; already-nonzero coefficients consume one
    correction bit each as the scan passes over them."""
    p1, m1 = 1 << al, -(1 << al)

    def _correct(k: int) -> None:
        v = int(zz[k])
        if rdr.bits(1) and not (abs(v) >> al) & 1:
            zz[k] = v + (p1 if v >= 0 else m1)

    k = ss
    if eobrun == 0:
        while k <= se:
            rs = rdr.huff(act)
            r, s = rs >> 4, rs & 0xF
            newval = 0
            if s == 0:
                if r != 15:
                    eobrun = 1 << r
                    if r:
                        eobrun += rdr.bits(r)
                    break
                # ZRL: skip 16 zero-history coefficients below
            elif s == 1:
                newval = p1 if rdr.bits(1) else m1
            else:
                raise ValueError("bad AC refinement symbol")
            while k <= se:
                if int(zz[k]) != 0:
                    _correct(k)
                else:
                    if r == 0:
                        break
                    r -= 1
                k += 1
            if newval:
                if k > se:
                    raise ValueError("AC refinement run past band end")
                zz[k] = newval
            k += 1
    if eobrun > 0:
        while k <= se:  # finish the band under the EOB run
            if int(zz[k]) != 0:
                _correct(k)
            k += 1
        eobrun -= 1
    return eobrun


def _decode_prog_scan(rdr: _BitReader, scomps: list, htabs: dict,
                      ss: int, se: int, ah: int, al: int,
                      mcus_x: int, mcus_y: int, restart: int) -> None:
    """One progressive scan: DC (interleaved or single-component) or a
    single-component AC band, first pass or refinement."""
    if ss == 0:  # DC scan
        if se != 0:
            raise ValueError("progressive DC scan must have Se=0")
        dctabs = []
        for _c, td, _ta in scomps:
            t = htabs.get(0x00 | td)
            if ah == 0 and t is None:
                raise ValueError("missing huffman table")
            dctabs.append(t)
        preds = [0] * len(scomps)

        def dc_block(si: int, zz: np.ndarray) -> None:
            if ah == 0:
                s = rdr.huff(dctabs[si])
                diff = _extend(rdr.bits(s), s) if s else 0
                preds[si] += diff
                zz[0] = preds[si] << al
            elif rdr.bits(1):
                # two's-complement OR appends the refinement bit for
                # positive and negative values alike
                zz[0] = int(zz[0]) | (1 << al)

        if len(scomps) > 1:  # interleaved over the MCU grid
            n_mcu = 0
            for my in range(mcus_y):
                for mx in range(mcus_x):
                    if restart and n_mcu and n_mcu % restart == 0:
                        rdr.sync_restart()
                        preds = [0] * len(scomps)
                    for si, (c, _td, _ta) in enumerate(scomps):
                        for by in range(c["v"]):
                            for bx in range(c["h"]):
                                idx = (my * c["v"] + by) * c["bw"] + mx * c["h"] + bx
                                dc_block(si, c["zz"][idx])
                    n_mcu += 1
        else:  # non-interleaved over the component's own block grid
            c = scomps[0][0]
            n_blk = 0
            for row in range(c["nbh"]):
                for col in range(c["nbw"]):
                    if restart and n_blk and n_blk % restart == 0:
                        rdr.sync_restart()
                        preds = [0]
                    dc_block(0, c["zz"][row * c["bw"] + col])
                    n_blk += 1
        return
    # AC scan: always non-interleaved, single component
    if len(scomps) != 1:
        raise ValueError("progressive AC scans must be single-component")
    c, _td, ta = scomps[0]
    act = htabs.get(0x10 | ta)
    if act is None:
        raise ValueError("missing huffman table")
    eobrun = 0
    n_blk = 0
    for row in range(c["nbh"]):
        for col in range(c["nbw"]):
            if restart and n_blk and n_blk % restart == 0:
                rdr.sync_restart()
                eobrun = 0
            zz = c["zz"][row * c["bw"] + col]
            if ah == 0:
                eobrun = _prog_ac_first(rdr, zz, act, ss, se, al, eobrun)
            else:
                eobrun = _prog_ac_refine(rdr, zz, act, ss, se, al, eobrun)
            n_blk += 1


def jpeg_decode(data: bytes) -> np.ndarray:
    """Decode JFIF bytes → (H, W) uint8 grayscale or (H, W, 3) RGB.

    Supports baseline sequential (SOF0) and progressive (SOF2) streams;
    progressive scans accumulate into per-component coefficient arrays
    and reconstruction runs once after the last scan.
    """
    if len(data) < 4 or data[:2] != b"\xFF\xD8":
        raise ValueError("not a JPEG stream (missing SOI)")
    pos = 2
    qtabs: dict[int, np.ndarray] = {}
    htabs: dict[int, dict[tuple[int, int], int]] = {}
    frame = None
    comps: list[dict] = []
    restart = 0
    progressive = False
    scans_seen = False
    hmax = vmax = 1
    mcus_x = mcus_y = 0
    while pos + 4 <= len(data):
        if data[pos] != 0xFF:
            raise ValueError("marker expected")
        marker = data[pos + 1]
        if marker == 0xD9:  # EOI
            break
        if 0xD0 <= marker <= 0xD7:  # stray restart marker between scans
            pos += 2
            continue
        (size,) = struct.unpack_from(">H", data, pos + 2)
        body = data[pos + 4 : pos + 2 + size]
        if len(body) != size - 2:
            raise ValueError("truncated segment")
        if marker == 0xDB:  # DQT
            p = 0
            while p < len(body):
                pq, tq = body[p] >> 4, body[p] & 0xF
                if pq != 0:
                    raise ValueError("16-bit quant tables unsupported")
                qtabs[tq] = np.frombuffer(body[p + 1 : p + 65], dtype=np.uint8).astype(np.float64)
                p += 65
        elif marker == 0xC4:  # DHT
            p = 0
            while p < len(body):
                tcth = body[p]
                bits = list(body[p + 1 : p + 17])
                nv = sum(bits)
                vals = list(body[p + 17 : p + 17 + nv])
                htabs[tcth] = _decode_table(bits, vals)
                p += 17 + nv
        elif marker in (0xC0, 0xC2):  # SOF0 baseline / SOF2 progressive
            progressive = marker == 0xC2
            prec, fh, fw, nc = struct.unpack_from(">BHHB", body, 0)
            if prec != 8:
                raise ValueError("only 8-bit precision supported")
            comps = []
            for ci in range(nc):
                cid, hv, tq = body[6 + 3 * ci : 9 + 3 * ci]
                comps.append({"id": cid, "h": hv >> 4, "v": hv & 0xF, "tq": tq})
            frame = {"h": fh, "w": fw, "comps": comps}
            hmax = max(c["h"] for c in comps)
            vmax = max(c["v"] for c in comps)
            if hmax < 1 or vmax < 1 or hmax > 2 or vmax > 2:
                raise ValueError("sampling factors beyond 2 unsupported")
            mcu_w, mcu_h = 8 * hmax, 8 * vmax
            mcus_x = (fw + mcu_w - 1) // mcu_w
            mcus_y = (fh + mcu_h - 1) // mcu_h
            for c in comps:
                c["bw"] = mcus_x * c["h"]
                c["bh"] = mcus_y * c["v"]
                c["zz"] = np.zeros((c["bh"] * c["bw"], 64), dtype=np.int64)
                # non-interleaved scans traverse the component's OWN
                # block grid (ceil of its true pixel dims), not the
                # MCU-padded storage grid
                cw = (fw * c["h"] + hmax - 1) // hmax
                ch = (fh * c["v"] + vmax - 1) // vmax
                c["nbw"] = (cw + 7) // 8
                c["nbh"] = (ch + 7) // 8
        elif marker in (0xC1, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB,
                        0xCD, 0xCE, 0xCF):
            raise ValueError(f"unsupported SOF 0x{marker:02X}")
        elif marker == 0xDD:  # DRI
            (restart,) = struct.unpack_from(">H", body, 0)
        elif marker == 0xDA:  # SOS
            if frame is None:
                raise ValueError("SOS before SOF")
            ns = body[0]
            byid = {c["id"]: c for c in comps}
            scomps = []
            for si in range(ns):
                cs, tdta = body[1 + 2 * si], body[2 + 2 * si]
                if cs not in byid:
                    raise ValueError("scan references unknown component")
                scomps.append((byid[cs], tdta >> 4, tdta & 0xF))
            ss, se = body[1 + 2 * ns], body[2 + 2 * ns]
            ahal = body[3 + 2 * ns]
            ah, al = ahal >> 4, ahal & 0xF
            rdr = _BitReader(data, pos + 2 + size)
            if progressive:
                _decode_prog_scan(rdr, scomps, htabs, ss, se, ah, al,
                                  mcus_x, mcus_y, restart)
            else:
                if len(scomps) != len(comps):
                    raise ValueError("partial scans unsupported")
                if ss != 0 or se != 63 or ah != 0 or al != 0:
                    raise ValueError("bad baseline scan header")
                _decode_seq_scan(rdr, scomps, htabs, mcus_x, mcus_y, restart)
            scans_seen = True
            pos = _next_marker(data, rdr.pos)
            continue
        # APPn / COM / others: skip
        pos = pos + 2 + size
    if frame is None or not scans_seen:
        raise ValueError("missing SOF/SOS")
    fh, fw = frame["h"], frame["w"]

    planes = []
    for c in comps:
        qt = qtabs.get(c["tq"])
        if qt is None:
            raise ValueError("missing quant table")
        coef = (c["zz"] * qt[None, :])[:, UNZIGZAG].reshape(-1, 8, 8)
        blocks = np.einsum("ji,njk,kl->nil", _D, coef, _D) + 128.0
        bh, bw = c["bh"], c["bw"]
        plane = (
            blocks.reshape(bh, bw, 8, 8).transpose(0, 2, 1, 3).reshape(bh * 8, bw * 8)
        )
        # upsample to full resolution by pixel repetition
        ry, rx = vmax // c["v"], hmax // c["h"]
        if ry > 1 or rx > 1:
            plane = np.repeat(np.repeat(plane, ry, axis=0), rx, axis=1)
        planes.append(plane[:fh, :fw])
    if len(planes) == 1:
        return np.clip(np.round(planes[0]), 0, 255).astype(np.uint8)
    y, cb, cr = planes
    r = y + 1.402 * (cr - 128.0)
    g = y - 0.344136 * (cb - 128.0) - 0.714136 * (cr - 128.0)
    b = y + 1.772 * (cb - 128.0)
    return np.clip(np.round(np.stack([r, g, b], axis=-1)), 0, 255).astype(np.uint8)
